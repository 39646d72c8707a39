package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Bucketed parquet storage for shuffle-free co-located joins — the
  * layout a 100 TB corpus wants for its hot join keys (doc_id joins
  * between text, metadata, embedding, and dedup-verdict tables; repeated
  * profile-store joins on dataset keys).
  *
  * Writing both sides bucketed by the join key into the session catalog
  * lets every subsequent equi-join on that key run with ZERO exchanges:
  * each task reads bucket i of both sides (`spark.sql.sources.
  * bucketing.enabled`, on by default), so the join cost is a local
  * sort-merge per bucket no matter how many times the tables are
  * re-joined. The shuffle is paid ONCE at write time — the right trade
  * whenever a table participates in more joins than it has rewrites.
  * (PlanSpec pins the no-exchange property.)
  *
  * Spark's bucketing needs the table catalog (bucket metadata lives in
  * the table definition, not the parquet footers), hence saveAsTable
  * rather than a bare parquet path. The default in-memory catalog works;
  * a real deployment points `spark.sql.warehouse.dir` (+ optionally a
  * Hive metastore) at durable storage.
  */
object Bucketed {

  /** Write `df` bucketed (and sorted) by `keys` into `numBuckets` buckets
    * as managed table `name`, replacing it if present. Sorting within
    * buckets makes the later merge side of each per-bucket join a plain
    * streamed merge. */
  def write(df: DataFrame, name: String, numBuckets: Int, keys: Seq[String]): Unit = {
    require(keys.nonEmpty, "bucketing needs at least one key column")
    df.write.mode("overwrite")
      .bucketBy(numBuckets, keys.head, keys.tail: _*)
      .sortBy(keys.head, keys.tail: _*)
      .format("parquet")
      .saveAsTable(name)
  }

  def table(spark: SparkSession, name: String): DataFrame = spark.table(name)

  /** Shuffle-free equi-join of two tables previously written by [[write]]
    * with the same `numBuckets` and `keys`. This is just a plain join —
    * the method exists to name the pattern; the zero-exchange plan is a
    * property of the storage, not the operator. */
  def join(spark: SparkSession, left: String, right: String, keys: Seq[String]): DataFrame =
    table(spark, left).join(table(spark, right), keys)
}
