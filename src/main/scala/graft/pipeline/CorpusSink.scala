package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.{functions => F}

/** Curated-corpus SINK — the last mile between the curation pipeline
  * and a training job: write the corpus as `numShards` deterministic,
  * reproducibly-ordered, gzip-compressed line shards plus a MANIFEST
  * (per-shard row count + order-independent content digest), then
  * verify any copy of the output against that manifest byte-for-byte.
  *
  * Sharding and order come from [[Sampling.deterministicShuffle]]
  * (md5-keyed shard + within-shard position), so two runs over the
  * same rows — on any cluster size or partitioning — produce the SAME
  * shard files in the SAME line order: a training job can resume,
  * re-run, or spot-check against the manifest.
  *
  * Scale shape: ONE hash exchange on `shard` + a within-partition sort
  * (bounded by corpus/numShards rows — size numShards to thousands at
  * 100 TB so each sort stays executor-local), then the `partitionBy`
  * text writer streams each shard to its own `shard=N/` file. The
  * manifest is computed by READING THE WRITTEN FILES BACK (one extra
  * scan of the compressed output) rather than re-running the upstream
  * lineage: it certifies what is actually ON DISK, which is what a
  * consumer verifies against. No global sort, no driver state beyond
  * the numShards-row manifest.
  *
  * (Reference analog: none — whylogs profiles data it is given; this
  * completes the LLM-pipeline arc: curate → shard → verify → train.)
  */
object CorpusSink {

  /** One line's digest contribution: the first 14 hex chars of its md5
    * as a BIGINT — a 56-bit value whose per-shard BIT_XOR is an
    * order-independent content digest with an identical ANSI-SQL
    * spelling (`CAST('0x' || substr(md5(line), 1, 14) AS BIGINT)`). */
  def lineDigest(line: Column): Column =
    F.conv(F.substring(F.md5(line), 1, 14), 16, 10).cast("long")

  /** Write `line` (keyed by the UNIQUE `key`, which seeds the
    * deterministic shard+order) as `numShards` gzip text shards under
    * `path` (`shard=N/part-*.txt.gz`, lines in deterministic `pos`
    * order) plus `path/_manifest` (JSON rows `shard, n_rows, digest` —
    * the underscore prefix keeps it invisible to Spark readers of
    * `path`). Returns the manifest DataFrame. */
  def writeCorpusShards(df: DataFrame, line: Column, key: Column,
      path: String, numShards: Int, salt: String = "shuffle"): DataFrame = {
    require(numShards >= 1, s"numShards must be >= 1, got $numShards")
    // An embedded CR/LF would split one corpus row into two file lines,
    // and a NULL line would be written as an EMPTY line (the text
    // writer's NULL rendering) — in both cases the manifest, computed
    // from the WRITTEN files, would then CERTIFY the mutated output.
    // Fail LOUDLY during the write pass instead (zero extra scans):
    // `line.rlike(..)` is NULL for a NULL line and `when` would fall
    // through to `otherwise`, so NULL needs its own branch.
    val checked = F.when(line.isNull,
      F.raise_error(F.concat(F.lit("corpus line is NULL near key="),
        key.cast("string"))))
      .when(line.rlike("[\\r\\n]"),
      F.raise_error(F.concat(F.lit("corpus line contains CR/LF near key="),
        key.cast("string")))).otherwise(line)
    Sampling.deterministicShuffle(
        df.select(checked.as("line"), key.as("__k")), F.col("__k"), numShards, salt)
      .repartition(numShards, F.col("shard"))
      .sortWithinPartitions("shard", "pos")
      .select("line", "shard")
      .write.mode("overwrite").partitionBy("shard")
      .option("compression", "gzip").text(path)
    val man = manifestOf(readShards(df.sparkSession, path))
    man.coalesce(1).write.mode("overwrite").json(path + "/_manifest")
    man
  }

  /** Read a shard directory back as `(shard, line)` — gzip decode and
    * `shard=N` partition discovery are the text source's own. An
    * all-rows-filtered corpus writes NO shard directories (partition
    * discovery then finds no `shard` column) — that legitimate edge
    * yields an empty frame, not an UNRESOLVED_COLUMN crash. */
  def readShards(spark: SparkSession, path: String): DataFrame = {
    val raw = spark.read.text(path)
    if (!raw.columns.contains("shard"))
      raw.select(F.lit(0).cast("int").as("shard"),
        F.col("value").as("line")).where(F.lit(false))
    else
      raw.select(F.col("shard").cast("int").as("shard"),
        F.col("value").as("line"))
  }

  /** Per-shard `(shard, n_rows, digest)` of a `(shard, line)` frame. */
  def manifestOf(shards: DataFrame): DataFrame =
    shards.groupBy("shard").agg(
      F.count(F.lit(1)).as("n_rows"),
      F.bit_xor(lineDigest(F.col("line"))).as("digest"))

  /** Verify a shard directory against its stored manifest: recompute
    * each shard's row count and content digest FROM THE FILES and
    * compare — `(shard, n_rows, digest, manifest_match)`. A missing
    * shard on either side is a mismatch row, never a silent drop. */
  def verifyShards(spark: SparkSession, path: String): DataFrame = {
    val got = manifestOf(readShards(spark, path))
    // explicit schema: an EMPTY manifest (empty corpus) has nothing to
    // infer from, and inference would throw instead of verifying
    val manSchema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("shard",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("n_rows",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("digest",
        org.apache.spark.sql.types.LongType)))
    val man = spark.read.schema(manSchema).json(path + "/_manifest")
      .select(F.col("shard").cast("int").as("m_shard"),
        F.col("n_rows").cast("long").as("m_rows"),
        F.col("digest").cast("long").as("m_digest"))
    got.join(man, got("shard") === man("m_shard"), "full_outer")
      .select(
        F.coalesce(got("shard"), F.col("m_shard")).as("shard"),
        got("n_rows"), got("digest"),
        F.coalesce(got("n_rows") === F.col("m_rows") &&
          got("digest") === F.col("m_digest"), F.lit(false)).as("manifest_match"))
  }
}
