package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.{functions => F}

/** Round-20 optimization probe (dev tool, not part of the driver
  * contract): measures scan partitioning and isolates suspected
  * single-core hot paths with/without a parallelizing repartition.
  * Usage: sbt "runMain graft.ProbeR20 [caseName ...]" */
object ProbeR20 {
  def time[A](label: String)(f: => A): A = {
    val t0 = System.nanoTime()
    val r = f
    println(f"[probe] $label%-48s ${(System.nanoTime() - t0) / 1e9}%8.3f s")
    r
  }
  def noop(df: DataFrame): Unit =
    df.write.format("noop").mode("overwrite").save()

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.codegen.cache.maxEntries", "5000")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val want = args.toSet
    def on(c: String) = want.isEmpty || want.contains(c)

    if (on("parts")) {
      for (t <- Seq("part", "documents", "embeddings", "lineitem", "events", "orders")) {
        val df = spark.read.parquet(s"$sfDir/$t.parquet")
        println(s"[probe] $t scan partitions = ${df.rdd.getNumPartitions}")
      }
    }

    if (on("fuzzy")) {
      val part = spark.read.parquet(s"$sfDir/part.parquet")
      val indexDf = part.select(F.col("p_partkey").as("ix_id"),
        F.lower(F.col("p_name")).as("ix_s"))
      def probeDf = part
        .filter(F.col("p_partkey") % 5 === 0)
        .select((F.col("p_partkey") + 1000000L).as("probe_id"),
          F.concat(F.substring(F.lower(F.col("p_name")), 1, 2),
            F.expr("substring(lower(p_name), 4)")).as("probe_s"))
      // batch equivalent of streaming_fuzzy_match's per-microbatch work
      time("matchIndex batch as-is") {
        noop(graft.pipeline.FuzzyDedup.matchIndex(
          probeDf, "probe_id", "probe_s", indexDf, "ix_id", "ix_s", maxDist = 1))
      }
      time("matchIndex batch, probe repartitioned") {
        noop(graft.pipeline.FuzzyDedup.matchIndex(
          probeDf.repartition(spark.sparkContext.defaultParallelism),
          "probe_id", "probe_s", indexDf, "ix_id", "ix_s", maxDist = 1))
      }
      time("matchIndex batch, probe repartitioned (2nd)") {
        noop(graft.pipeline.FuzzyDedup.matchIndex(
          probeDf.repartition(spark.sparkContext.defaultParallelism),
          "probe_id", "probe_s", indexDf, "ix_id", "ix_s", maxDist = 1))
      }
    }

    if (on("lshrecall")) {
      val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
      import graft.pipeline.Similarity
      time("cosineNearDupExact as-is") {
        noop(Similarity.cosineNearDupExact(emb, "vec_id", "embedding", tau = 0.4))
      }
      time("cosineNearDupExact repartitioned") {
        noop(Similarity.cosineNearDupExact(
          emb.repartition(spark.sparkContext.defaultParallelism),
          "vec_id", "embedding", tau = 0.4))
      }
      time("cosineNearDupLsh as-is") {
        noop(Similarity.cosineNearDupLsh(emb, "vec_id", "embedding",
          tau = 0.4, bitsPerBand = 4, bands = 64))
      }
      time("cosineNearDupLsh repartitioned") {
        noop(Similarity.cosineNearDupLsh(
          emb.repartition(spark.sparkContext.defaultParallelism),
          "vec_id", "embedding", tau = 0.4, bitsPerBand = 4, bands = 64))
      }
    }

    spark.stop()
  }
}
