package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.{functions => F}
import org.apache.spark.sql.streaming.Trigger

/** Dev measurement tool for round 21 (guide §1: measure first).
  *
  * Mode "stream": run a representative stateful streaming query
  * (exactKeepers over the documents file-source) twice and print each
  * micro-batch's durationMs breakdown (addBatch / getBatch /
  * walCommit / stateStore metrics) with the checkpoint on (a) the
  * default temp location (java.io.tmpdir) and (b) the session's
  * spark.local.dir — isolating the checkpoint medium's share of the
  * micro-batch floor.
  *
  * Mode "phases:<query>": time a registered query's construction vs
  * first action (count), twice.
  */
object ProbeR21 {
  def main(args: Array[String]): Unit = {
    val mode = args.headOption.getOrElse("stream")
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val localDir = sys.env.get("SPARK_GRAFT_LOCAL_DIR").getOrElse("/dev/shm/graft_spark_local")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.local.dir", localDir)
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.codegen.cache.maxEntries", "5000")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    try spark.read.parquet(s"$sfDir/lineitem.parquet").count() catch { case _: Throwable => () }

    if (mode == "stream") {
      val raw = spark.read.parquet(s"$sfDir/documents.parquet")
      def run(tag: String, ckpt: Option[String]): Unit = {
        val sdf = spark.readStream.schema(raw.schema)
          .parquet(graft.api.StandardQueries.streamableDir(s"$sfDir/documents.parquet"))
        val qn = "probe_" + java.util.UUID.randomUUID().toString.replace("-", "")
        val t0 = System.nanoTime()
        val w0 = graft.streaming.DedupStream.exactKeepers(sdf, "text", "doc_id")
          .writeStream.format("memory").queryName(qn).outputMode("complete")
          .trigger(Trigger.AvailableNow())
        val w = ckpt.fold(w0)(c => w0.option("checkpointLocation", c))
        val q = w.start()
        q.awaitTermination()
        val total = (System.nanoTime() - t0) / 1e9
        println(f"[probe] $tag total=$total%.3f s")
        q.recentProgress.foreach { p =>
          println(s"[probe] $tag batch=${p.batchId} durationMs=${p.durationMs}")
        }
        spark.sql(s"DROP TABLE IF EXISTS $qn")
      }
      for (i <- 0 until 3) {
        run(s"tmpckpt#$i", None)
        val d = java.nio.file.Files.createDirectories(java.nio.file.Paths.get(
          localDir, "probeckpt_" + java.util.UUID.randomUUID().toString.replace("-", "")))
        run(s"shmckpt#$i", Some(d.toString))
      }
    } else if (mode == "fuzzy") {
      // Where do streaming_fuzzy_match's 3.7 s go? Replicate the query,
      // dump per-batch durationMs and the micro-batch physical plan.
      val part = spark.read.parquet(s"$sfDir/part.parquet")
      for (i <- 0 until 3) {
        val indexDf = part.select(F.col("p_partkey").as("ix_id"),
          F.lower(F.col("p_name")).as("ix_s"))
        val sdf = spark.readStream.schema(part.schema)
          .parquet(graft.api.StandardQueries.streamableDir(s"$sfDir/part.parquet"))
          .filter(F.col("p_partkey") % 5 === 0)
          .select((F.col("p_partkey") + 1000000L).as("probe_id"),
            F.concat(F.substring(F.lower(F.col("p_name")), 1, 2),
              F.expr("substring(lower(p_name), 4)")).as("probe_s"))
        val qn = "fzp_" + java.util.UUID.randomUUID().toString.replace("-", "")
        val t0 = System.nanoTime()
        val q = graft.pipeline.FuzzyDedup.matchIndex(
            sdf, "probe_id", "probe_s", indexDf, "ix_id", "ix_s", maxDist = 1)
          .writeStream.format("memory").queryName(qn)
          .trigger(Trigger.AvailableNow())
          .start()
        q.awaitTermination()
        val t1 = System.nanoTime()
        val c = spark.table(qn).orderBy("id", "index_id").count()
        val t2 = System.nanoTime()
        println(f"[probe] fuzzy#$i stream=${(t1 - t0) / 1e9}%.3f collect=${(t2 - t1) / 1e9}%.3f rows=$c")
        q.recentProgress.foreach { p =>
          println(s"[probe] fuzzy#$i batch=${p.batchId} rows=${p.numInputRows} durationMs=${p.durationMs}")
        }
        if (i == 0) {
          try {
            val se = q.asInstanceOf[org.apache.spark.sql.streaming.StreamingQuery]
            val m = se.getClass.getMethods.find(_.getName == "lastExecution")
            m.foreach { mm =>
              val le = mm.invoke(se)
              if (le != null) println("[probe] lastExecution plan:\n" +
                le.asInstanceOf[org.apache.spark.sql.execution.QueryExecution].executedPlan.toString.take(6000))
            }
          } catch { case e: Throwable => println("[probe] plan dump failed: " + e) }
        }
        spark.sql(s"DROP TABLE IF EXISTS $qn")
      }
    } else if (mode == "segplans") {
      // Evidence trail for the r21 segmented-collect widen: the
      // declared surface of merge_profiles / why1_roundtrip / ... is a
      // driver-built LocalTableScan, so the plan that actually changed
      // is the INTERNAL segmented aggregate profileSegmented collects.
      // Dump it unwidened (= profileSegmentedDF, the lazy surface) and
      // as the collect path now plans it (same select + the gated
      // Par.widenIfAtLeast + groupBy, from public pieces).
      val li = spark.read.parquet(s"$sfDir/lineitem.parquet")
        .withColumn("__part", F.col("l_orderkey") % 3)
      val liNumeric = Seq("l_orderkey", "l_partkey", "l_suppkey", "l_linenumber",
        "l_quantity", "l_extendedprice", "l_discount", "l_tax")
      val in = li.select((F.col("__part") +: liNumeric.map(F.col)): _*)
      val p = new graft.api.Profiler()
      val before = p.profileSegmentedDF(in, Seq("__part"))
      val aggs = p.aggColumns(in.schema, Some(liNumeric))
      val sel = in.select((Seq("__part") ++ liNumeric).map(F.col): _*)
      val after = graft.core.Par.widenIfAtLeast(sel, 4L << 20)
        .groupBy(F.col("__part").cast("string").as("segment___part"))
        .agg(aggs.head, aggs.tail: _*)
      val dir = java.nio.file.Paths.get("plans", "r21")
      java.nio.file.Files.createDirectories(dir)
      def dump(df: org.apache.spark.sql.DataFrame, f: String): Unit =
        java.nio.file.Files.writeString(dir.resolve(f),
          df.queryExecution.explainString(org.apache.spark.sql.execution.FormattedMode))
      dump(before, "profile_segmented_collect_internal_before.txt")
      dump(after, "profile_segmented_collect_internal_after.txt")
      println("[probe] wrote segmented collect internal plans")
    } else if (mode == "readcost") {
      // How much of each query's construction is spark.read.parquet
      // metadata (listing + footer/schema reads), warm?
      for (i <- 0 until 3) {
        val t0 = System.nanoTime()
        for (_ <- 0 until 20) spark.read.parquet(s"$sfDir/lineitem.parquet")
        val t1 = System.nanoTime()
        println(f"[probe] readcost#$i 20x read.parquet = ${(t1 - t0) / 1e9}%.3f s (${(t1 - t0) / 20e6}%.1f ms each)")
        val sch = spark.read.parquet(s"$sfDir/lineitem.parquet").schema
        val t2 = System.nanoTime()
        for (_ <- 0 until 20) spark.read.schema(sch).parquet(s"$sfDir/lineitem.parquet")
        val t3 = System.nanoTime()
        println(f"[probe] readcost#$i 20x with explicit schema = ${(t3 - t2) / 1e9}%.3f s (${(t3 - t2) / 20e6}%.1f ms each)")
      }
    } else if (mode.startsWith("phases:")) {
      val name = mode.stripPrefix("phases:")
      for (i <- 0 until 3) {
        val t0 = System.nanoTime()
        val df = SparkEntry.queries(name)(spark, sfDir)
        val t1 = System.nanoTime()
        df.count()
        val t2 = System.nanoTime()
        println(f"[probe] $name#$i construct=${(t1 - t0) / 1e9}%.3f count=${(t2 - t1) / 1e9}%.3f")
      }
    }
    spark.stop()
  }
}
