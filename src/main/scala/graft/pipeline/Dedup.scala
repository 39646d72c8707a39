package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.{functions => F}

/** Deduplication operators for training-data pipelines.
  *
  * All stages are expression-only (codegen'd, no UDFs): shingling and
  * signatures are per-row higher-order-function computations (no shuffle);
  * candidate generation is one shuffle on the band/bucket key; verification
  * joins only candidate pairs. At 100 TB the cost is dominated by the one
  * band-bucket exchange, which is the minimum any LSH scheme needs.
  */
object Dedup {

  /** Exact dedup: content hash + per-hash duplicate stats via window
    * functions (one shuffle on the hash). `keep` marks the canonical row. */
  def exact(df: DataFrame, textCol: String, idCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val h = F.md5(F.col(textCol))
    val w = Window.partitionBy("text_hash")
    df.withColumn("text_hash", h)
      .withColumn("dup_count", F.count(F.lit(1)).over(w))
      .withColumn("keep",
        F.row_number().over(w.orderBy(F.col(idCol))) === 1)
      .select(F.col(idCol), F.col("text_hash"), F.col("dup_count"), F.col("keep"))
  }

  /** Distinct word n-gram shingles of `textCol` (lowercased), as an array
    * column — the input to MinHash / Jaccard. */
  def shingles(textCol: Column, n: Int = 3): Column = {
    val words = F.split(F.lower(F.trim(textCol)), "\\s+")
    val count = F.size(words) - (n - 1)
    // Guard count<=0: sequence(1, 0) would run DESCENDING and index out of
    // range; short documents yield an empty shingle set instead.
    val idx = F.when(count > 0, F.sequence(F.lit(1), count))
      .otherwise(F.array().cast("array<int>"))
    F.array_distinct(
      F.transform(idx, i => F.concat_ws(" ", F.slice(words, i, F.lit(n)))))
  }

  /** MinHash signature (P permutations) of a shingle-array column, computed
    * per row with codegen'd HOFs: permutation i is xxhash64(shingle, i), so
    * no modular-arithmetic permutations and no shuffle. */
  def minHashSignature(shingleCol: Column, numPerm: Int = 64): Column =
    F.transform(F.sequence(F.lit(0), F.lit(numPerm - 1)),
      i => F.array_min(F.transform(shingleCol, s => F.xxhash64(s, i))))

  /** LSH banding: hash each of `bands` signature slices; docs sharing any
    * band hash are candidates. */
  def bandHashes(sigCol: Column, bands: Int, rows: Int): Column =
    F.transform(F.sequence(F.lit(0), F.lit(bands - 1)),
      b => F.xxhash64(F.concat_ws(",", F.slice(sigCol, b * rows + 1, F.lit(rows)))))

  /** Full MinHash-LSH near-dup pipeline: returns candidate pairs with their
    * exact shingle-set Jaccard, filtered at `threshold`.
    * Shape: shingle→sign→band (map-only) → explode bands → self-join on
    * (band, hash) → distinct pairs → verify by exact Jaccard on the two
    * shingle arrays. Bucket sizes are capped implicitly by banding; for
    * adversarial skew add a salt on the band key. */
  def minHashNearDups(
      df: DataFrame, textCol: String, idCol: String,
      numPerm: Int = 64, bands: Int = 16, threshold: Double = 0.5): DataFrame = {
    val rows = numPerm / bands
    val withSig = df.select(
      F.col(idCol).as("doc_id"),
      shingles(F.col(textCol)).as("sh"))
      .withColumn("sig", minHashSignature(F.col("sh"), numPerm))
      .withColumn("bands", bandHashes(F.col("sig"), bands, rows))
    val banded = withSig.select(F.col("doc_id"), F.col("sh"),
      F.posexplode(F.col("bands")).as(Seq("band", "bh")))
    val l = banded.select(F.col("band"), F.col("bh"),
      F.col("doc_id").as("a"), F.col("sh").as("sha"))
    val r = banded.select(F.col("band"), F.col("bh"),
      F.col("doc_id").as("b"), F.col("sh").as("shb"))
    val pairs = l.join(r, Seq("band", "bh"))
      .filter(F.col("a") < F.col("b"))
      .select("a", "b", "sha", "shb")
      .dropDuplicates("a", "b")
    pairs
      .withColumn("jaccard", jaccard(F.col("sha"), F.col("shb")))
      .filter(F.col("jaccard") >= threshold)
      .select("a", "b", "jaccard")
  }

  /** Exact Jaccard similarity of two (distinct-element) array columns. */
  def jaccard(a: Column, b: Column): Column = {
    val inter = F.size(F.array_intersect(a, b))
    val union = F.size(F.array_union(a, b))
    F.when(union === 0, 0.0).otherwise(inter.cast("double") / union.cast("double"))
  }

  /** 64-bit SimHash over token hashes, per row via HOFs: bit b of the
    * signature is the majority vote of bit b across token xxhash64 values.
    * Pure expression (codegen'd): map-only, no shuffle, no UDF. */
  def withSimHash(df: DataFrame, textCol: String, out: String = "simhash"): DataFrame = {
    df.withColumn("__token_hashes",
        F.transform(F.split(F.lower(F.trim(F.col(textCol))), "\\s+"), t => F.xxhash64(t)))
      .withColumn(out, F.expr(
        """aggregate(sequence(0, 63), 0L,
          |  (acc, b) -> acc + if(
          |    2 * size(filter(__token_hashes, h -> getbit(h, b) = 1)) >= size(__token_hashes),
          |    shiftleft(1L, b), 0L))""".stripMargin))
      .drop("__token_hashes")
  }

  /** Hamming distance between two 64-bit signatures. */
  def hamming64(a: Column, b: Column): Column = F.bit_count(a.bitwiseXOR(b))
}
