package graft
import org.apache.spark.sql.{functions => F}
import org.apache.spark.sql.SparkSession
import graft.pipeline.Dedup

/** Temporary stage-timing probe for the near-dup pipeline. */
object Probe2 {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    docs.count()
    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[stage] $label ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    val ids = docs.select(F.col("doc_id"), Dedup.shingleIds(F.col("text")).as("ids"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    time("shingle+persist") { ids.count() }
    val banded = ids.select(F.col("doc_id"),
      F.posexplode(Dedup.bandHashes(F.col("ids"), 64, 32)).as(Seq("band", "bh")))
    val l = banded.select(F.col("band"), F.col("bh"), F.col("doc_id").as("a"))
    val r = banded.select(F.col("band"), F.col("bh"), F.col("doc_id").as("b"))
    val pairs = l.join(r, Seq("band", "bh"))
      .filter(F.col("a") < F.col("b")).select("a", "b").dropDuplicates("a", "b")
    val p = time("band-join+dedup") { pairs.localCheckpoint(true) }
    println("pairs=" + p.count())
    val joined = p
      .join(ids.select(F.col("doc_id").as("a"), F.col("ids").as("ia")), Seq("a"))
      .join(ids.select(F.col("doc_id").as("b"), F.col("ids").as("ib")), Seq("b"))
      .withColumn("jaccard", Dedup.jaccard(F.col("ia"), F.col("ib")))
      .filter(F.col("jaccard") >= 0.5).select("a", "b", "jaccard")
    time("refetch+jaccard") { joined.count() }
    spark.stop()
  }
}
