package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.{functions => F}

/** Blocked edit-distance fuzzy deduplication — the record-linkage tier
  * between EXACT/normalized dedup ([[Dedup]]) and shingled near-dedup
  * (MinHash-LSH): catches single-typo duplicates ("acme corp" vs
  * "acme crop") that normalization misses and that are too short for
  * shingle statistics to separate. Classic blocking design (Fellegi &
  * Sunter record linkage; Christen 2012 survey): candidates must share
  * a cheap deterministic BLOCK KEY (lowercased prefix), so comparison
  * cost is Σ blockSize² instead of n² — then a length-band prefilter
  * (|len₁−len₂| ≤ d is NECESSARY for edit distance ≤ d, and prunes
  * before any quadratic work) and finally the exact thresholded
  * Levenshtein (`levenshtein(s₁, s₂, d)` — O(d·len) early-exit, not
  * the full O(len²) table).
  *
  * Blocking recall is the documented tradeoff: a typo INSIDE the
  * prefix moves the record to another block and the pair is missed —
  * standard practice is multi-pass blocking (run again with a suffix
  * or phonetic key and union), which composes here as
  * `fuzzyPairs(..., blocker = x)` unioned per pass since every pass is
  * deterministic.
  *
  * Scale shape: ONE shuffle of (block, id, s) per side keyed by the
  * short block key; no global sort; the quadratic stays inside a
  * block. Mega-blocks are the skew risk — `maxBlockSize` SKIPS blocks
  * above the cap (deterministic, mirrored by the oracle, the
  * documented recall/throughput dial exactly like the capped LSH
  * family; size the cap from [[graft.analysis.DataAudit]]'s
  * keySkewReport on the block key).
  *
  * (Reference analog: none — whylogs has no record-linkage surface;
  * this extends the beyond-reference dedup family.)
  */
object FuzzyDedup {

  /** Candidate duplicate pairs `(id1, id2, s1, s2, dist)` with
    * `id1 < id2` and `dist = levenshtein(s1, s2) ≤ maxDist`, blocked
    * by the first `prefixLen` chars of `lower(s)`. NULL strings drop.
    * With `maxBlockSize = Some(cap)`, blocks holding more than `cap`
    * strings are skipped entirely (deterministic recall cut). */
  def fuzzyPairs(df: DataFrame, idCol: String, strCol: String, maxDist: Int,
      prefixLen: Int = 2, maxBlockSize: Option[Int] = None): DataFrame = {
    require(maxDist >= 1, "maxDist must be >= 1")
    require(prefixLen >= 1, "prefixLen must be >= 1")
    val base0 = df
      .select(F.col(idCol).cast("long").as("__id"), F.col(strCol).as("__s"))
      .filter(F.col("__s").isNotNull)
      .withColumn("__blk", F.lower(F.substring(F.col("__s"), 1, prefixLen)))
      .withColumn("__l", F.length(F.col("__s")).cast("long"))
    val base = maxBlockSize match {
      case None => base0
      case Some(cap) =>
        // bounded block-size table (one groupBy of the short key) —
        // broadcast back so the skip is a map-side filter, no extra
        // shuffle of the data rows
        val sizes = base0.groupBy("__blk").agg(F.count(F.lit(1)).as("__bc"))
          .filter(F.col("__bc") <= cap).drop("__bc")
        base0.join(F.broadcast(sizes), Seq("__blk"))
    }
    val a = base.select(F.col("__blk"), F.col("__id").as("id1"),
      F.col("__s").as("s1"), F.col("__l").as("l1"))
    val b = base.select(F.col("__blk"), F.col("__id").as("id2"),
      F.col("__s").as("s2"), F.col("__l").as("l2"))
    a.join(b, Seq("__blk"))
      .filter(F.col("id1") < F.col("id2") &&
        F.abs(F.col("l1") - F.col("l2")) <= maxDist)
      .withColumn("dist",
        F.levenshtein(F.col("s1"), F.col("s2"), maxDist).cast("long"))
      .filter(F.col("dist") =!= -1L)
      .select("id1", "id2", "s1", "s2", "dist")
  }

  /** Fuzzy matching against a STATIC reference index — the
    * cross-table form of [[fuzzyPairs]] (incoming records vs a master
    * table, the record-linkage deployment shape): same block key,
    * length band, and thresholded Levenshtein, but probe and index are
    * different tables and ids never compare. STATELESS per probe row
    * given the index, so the same join runs on a Structured Streaming
    * probe frame (stream–static join, append mode) — fuzzy linkage AT
    * INGESTION. Returns `(id, index_id, s, index_s, dist)`. */
  def matchIndex(probe: DataFrame, idCol: String, strCol: String,
      index: DataFrame, indexIdCol: String, indexStrCol: String,
      maxDist: Int, prefixLen: Int = 2): DataFrame = {
    require(maxDist >= 1, "maxDist must be >= 1")
    require(prefixLen >= 1, "prefixLen must be >= 1")
    def prep(df: DataFrame, id: String, s: String, idOut: String, sOut: String) =
      df.select(F.col(id).cast("long").as(idOut), F.col(s).as(sOut))
        .filter(F.col(sOut).isNotNull)
        .withColumn("__blk" + idOut, F.lower(F.substring(F.col(sOut), 1, prefixLen)))
        .withColumn("__l" + idOut, F.length(F.col(sOut)).cast("long"))
    val p = prep(probe, idCol, strCol, "id", "s")
    val ix = prep(index, indexIdCol, indexStrCol, "index_id", "index_s")
    p.join(ix, F.col("__blkid") === F.col("__blkindex_id"))
      .filter(F.abs(F.col("__lid") - F.col("__lindex_id")) <= maxDist)
      .withColumn("dist",
        F.levenshtein(F.col("s"), F.col("index_s"), maxDist).cast("long"))
      .filter(F.col("dist") =!= -1L)
      .select("id", "index_id", "s", "index_s", "dist")
  }

  /** Greedy keep-min-id election over [[fuzzyPairs]]: drop every row
    * that has ANY fuzzy match with a smaller id — the same
    * deterministic first-wins rule as exact dedup's keep-min, without
    * transitive closure (a chain a~b~c with a≁c drops BOTH b and c:
    * each matches a smaller id). Returns the kept rows of `df`. */
  def dedupApply(df: DataFrame, idCol: String, strCol: String, maxDist: Int,
      prefixLen: Int = 2, maxBlockSize: Option[Int] = None): DataFrame = {
    val losers = fuzzyPairs(df, idCol, strCol, maxDist, prefixLen, maxBlockSize)
      .select(F.col("id2").as("__loser")).distinct()
    df.join(losers, F.col(idCol).cast("long") === F.col("__loser"), "left_anti")
  }
}
