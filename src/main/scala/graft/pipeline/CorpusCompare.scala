package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.{functions => F}

/** Corpus-to-corpus comparison operators for training-data curation:
  * snapshot diffs between two corpus versions, content-overlap /
  * containment measurement between sources, bottom-k minhash containment
  * of an eval set inside a training corpus, and code-likeness statistics
  * for source-code filtering.
  *
  * These extend the dedup/decontamination family (Dedup.scala,
  * Decontaminate.scala) from "find duplicates within one corpus" to
  * "compare two corpora" — the audit a data refresh or an eval release
  * needs at 100 TB.
  *
  * Scale: every operator reduces documents to fixed-width hashes before
  * any join or exchange; no text payload crosses a shuffle.
  */
object CorpusCompare {

  /** Content hash used for diff/overlap. md5 keeps the DuckDB oracle
    * bit-exact; production callers can pass `F.xxhash64(_)` for an
    * 8-byte codegen'd hash — both are collision-safe at corpus scale
    * (2^-64 per pair) and the operators only compare for equality. */
  def md5Hash(c: Column): Column = F.md5(c)

  /** Snapshot diff between two corpus versions keyed by `idCol`:
    * classifies every id as added / removed / changed / unchanged by
    * comparing a content hash, then aggregates counts per (status,
    * group). `groupCol` is taken from whichever side has the row
    * (v2 wins for changed/unchanged).
    *
    * Scale: both sides project to (id, group, hash) BEFORE the full
    * outer join — the shuffle ships ~40 bytes/row regardless of
    * document size, and the join key is the corpus id, so the exchange
    * is the minimal one any versioned diff needs. Output is bounded by
    * 4 × |groups|.
    */
  def diff(v1: DataFrame, v2: DataFrame, idCol: String, groupCol: String,
      contentCol: String, hash: Column => Column = md5Hash): DataFrame = {
    def prep(df: DataFrame, tag: String): DataFrame =
      df.select(F.col(idCol).as(s"id_$tag"),
        F.col(groupCol).as(s"grp_$tag"),
        hash(F.col(contentCol)).as(s"h_$tag"))
    val a = prep(v1, "a")
    val b = prep(v2, "b")
    val joined = a.join(b, F.col("id_a") === F.col("id_b"), "full_outer")
    val status = F.when(F.col("id_a").isNull, "added")
      .when(F.col("id_b").isNull, "removed")
      .when(F.col("h_a") === F.col("h_b"), "unchanged")
      .otherwise("changed")
    joined.select(status.as("status"),
        F.coalesce(F.col("grp_b"), F.col("grp_a")).as("source"))
      .groupBy("status", "source")
      .agg(F.count(F.lit(1)).as("n_docs"))
  }

  /** Content overlap between two corpora on DISTINCT content hashes:
    * |A|, |B|, |A∩B|, Jaccard, and both containments (each a single
    * divide of exact integer counts).
    *
    * Scale: one union scan → (hash, inA, inB) → groupBy(hash) with
    * map-side combine → a single-row reduction. The only exchange keys
    * on the 16-byte hash; distinct-set semantics come from the groupBy,
    * never from a join.
    */
  def overlap(a: DataFrame, b: DataFrame, contentCol: String,
      hash: Column => Column = md5Hash): DataFrame = {
    val ha = a.select(hash(F.col(contentCol)).as("h"),
      F.lit(1).as("in_a"), F.lit(0).as("in_b"))
    val hb = b.select(hash(F.col(contentCol)).as("h"),
      F.lit(0).as("in_a"), F.lit(1).as("in_b"))
    val flags = ha.unionByName(hb)
      .groupBy("h")
      .agg(F.max("in_a").as("in_a"), F.max("in_b").as("in_b"))
    flags.agg(
        F.sum("in_a").cast("long").as("n_a"),
        F.sum("in_b").cast("long").as("n_b"),
        F.sum(F.col("in_a") * F.col("in_b")).cast("long").as("n_common"),
        F.count(F.lit(1)).as("n_union"))
      .select(F.col("n_a"), F.col("n_b"), F.col("n_common"),
        (F.col("n_common").cast("double") / F.col("n_union").cast("double"))
          .as("jaccard"),
        (F.col("n_common").cast("double") / F.col("n_a").cast("double"))
          .as("containment_a"),
        (F.col("n_common").cast("double") / F.col("n_b").cast("double"))
          .as("containment_b"))
  }

  /** Per-document bottom-k minhash containment of `eval` inside `train`:
    * for each eval document, the fraction of its k smallest shingle
    * hashes that appear anywhere in the training corpus's shingle set —
    * an unbiased estimate of shingle containment C(doc, train), the
    * decontamination score of Broder's bottom-k sketch family.
    *
    * Hashing is md5 over `salt ++ shingle` (oracle-exact); shingles are
    * `shingleWidth`-gram word windows via [[Dedup.shingles]].
    *
    * Scale: the eval side explodes to k rows per doc (k≈16); the train
    * side reduces to DISTINCT shingle hashes (map-side combined). The
    * single shuffle joins 16·|eval| probe rows against the distinct
    * train shingle set on an 8-byte prefix key — the train set is huge
    * at 100 TB but the join is a plain shuffle hash join that AQE can
    * skew-split; nothing is ever broadcast or collected.
    */
  def containmentBottomK(eval: DataFrame, train: DataFrame, idCol: String,
      textCol: String, k: Int = 16, shingleWidth: Int = 3,
      salt: String = "cont:"): DataFrame = {
    val sh = Dedup.shingles(F.col(textCol), shingleWidth)
    val hashed = F.transform(sh, g => F.md5(F.concat(F.lit(salt), g)))
    // bottom-k distinct hashes of the doc: sort ascending, take k
    val bottomK = F.slice(F.array_sort(hashed), 1, k)
    val probes = eval
      .select(F.col(idCol).as("doc_id"), F.explode(bottomK).as("h"),
        F.size(sh).as("n_shingles"))
    val trainSet = train
      .select(F.explode(F.transform(
        Dedup.shingles(F.col(textCol), shingleWidth),
        g => F.md5(F.concat(F.lit(salt), g)))).as("h"))
      .distinct()
      .withColumn("hit", F.lit(1))
    probes.join(trainSet, Seq("h"), "left")
      .groupBy("doc_id")
      .agg(F.count(F.lit(1)).as("k_used"),
        F.sum(F.coalesce(F.col("hit"), F.lit(0))).cast("long").as("k_hit"))
      .withColumn("containment",
        F.col("k_hit").cast("double") / F.col("k_used").cast("double"))
  }

  /** Code-likeness statistics per group (source-code filtering signals à
    * la StarCoder data prep): line counts, indented-line fraction,
    * brace/semicolon density per character, and mean line length — all
    * exact integer sums with one divide per ratio.
    *
    * Scale: pure map-side per-document arithmetic followed by a groupBy
    * on the (low-cardinality) group column; the shuffle carries six
    * longs per group partial.
    */
  def codeStats(df: DataFrame, groupCol: String, textCol: String): DataFrame = {
    val txt = F.col(textCol)
    val lines = F.split(txt, "\n", -1)
    val nLines = F.size(lines)
    val nIndented = F.size(F.filter(lines, l =>
      l.startsWith(" ") || l.startsWith("\t")))
    def occurrences(ch: String): Column =
      F.length(txt) - F.length(F.regexp_replace(txt, java.util.regex.Pattern.quote(ch), ""))
    val perDoc = df.select(
      F.col(groupCol).as("source"),
      F.length(txt).as("chars"),
      nLines.as("lines"),
      nIndented.as("indented"),
      (occurrences("{") + occurrences("}")).as("braces"),
      occurrences(";").as("semis"))
    perDoc.groupBy("source").agg(
        F.count(F.lit(1)).as("n_docs"),
        F.sum("chars").as("total_chars"),
        F.sum("lines").as("total_lines"),
        F.sum("indented").as("indented_lines"),
        F.sum("braces").as("brace_chars"),
        F.sum("semis").as("semi_chars"))
      .select(F.col("source"), F.col("n_docs"), F.col("total_chars"),
        F.col("total_lines"),
        (F.col("indented_lines").cast("double") /
          F.col("total_lines").cast("double")).as("indent_frac"),
        (F.col("brace_chars").cast("double") /
          F.col("total_chars").cast("double")).as("brace_density"),
        (F.col("semi_chars").cast("double") /
          F.col("total_chars").cast("double")).as("semi_density"),
        (F.col("total_chars").cast("double") /
          F.col("total_lines").cast("double")).as("mean_line_len"))
  }
}
