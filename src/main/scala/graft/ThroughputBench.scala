package graft

import org.apache.spark.sql.{functions => F}
import org.apache.spark.sql.SparkSession

import graft.api.Profiler
import graft.core.MetricConfig

/** Steady-state profiler throughput harness — the committed, re-runnable
  * source of SURVEY §8's cells/s figure (previously measured ad-hoc in
  * round 10 and unreproducible since).
  *
  * Method: replicate 8 mixed-type lineitem columns to ~4.8M rows, cache
  * and materialize (this benches the profiler's aggregation, not parquet
  * IO), then run the FULL default profile (counts/types/distribution/
  * cardinality/frequent-items on every column) `passes` times and report
  * the best pass: `cells_per_sec = rows × 8 / best_seconds`. The best-of
  * discipline matches `Bench`: first passes pay codegen + JIT, and a
  * long-lived cluster session is the representative setting.
  *
  * Baseline for comparison (BASELINE.md): the reference's whylogs-on-
  * Spark run implies ~5.5M cells/s/vCPU; divide this harness's number by
  * `cores` for the per-core figure.
  */
object ThroughputBench {
  def main(args: Array[String]): Unit = {
    val loadBefore = PerfStamp.loadAvg()
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val targetRows = sys.env.getOrElse("SPARK_GRAFT_TP_ROWS", "4800000").toLong
    // JIT reaches steady state around pass 5-6 on a fresh JVM (measured:
    // 3.6/1.2/0.92/0.81/0.73/0.73/0.66 s) — 3 passes underreport ~30%
    val passes = math.max(1, sys.env.getOrElse("SPARK_GRAFT_TP_PASSES", "8").toInt)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.codegen.cache.maxEntries", "5000")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val base = spark.read.parquet(s"$sfDir/lineitem.parquet")
      .select("l_orderkey", "l_partkey", "l_suppkey", "l_quantity",
        "l_extendedprice", "l_discount", "l_returnflag", "l_shipdate")
    val baseRows = base.count()
    val copies = math.max(1L, (targetRows + baseRows - 1) / baseRows).toInt
    // explode a per-row sequence rather than N self-unions: one scan, and
    // the repartition spreads the replicated rows across all cores (the
    // fixture is a single-split file)
    val frame = base
      .withColumn("rep", F.explode(F.sequence(F.lit(1), F.lit(copies))))
      .drop("rep")
      .repartition(cpus * 2)
      .cache()
    val rows = frame.count() // materialize the cache before timing
    val cols = frame.schema.fields.length

    val profiler = new Profiler(MetricConfig())
    val times = (0 until passes).map { _ =>
      val t0 = System.nanoTime()
      profiler.profileDF(frame).collect()
      (System.nanoTime() - t0) / 1e9
    }
    val best = times.min
    val cellsPerSec = rows.toDouble * cols / best
    spark.stop() // before printing: stray executor log lines break parses

    def jarr(xs: Seq[Double]) = xs.map(t => f"$t%.4f").mkString("[", ",", "]")
    val load = PerfStamp.fields(loadBefore, PerfStamp.loadAvg())
    val json =
      s"""{"metric":"cells_per_sec","value":${cellsPerSec.round},"unit":"cells/sec","rows":$rows,"cols":$cols,"cores":$cpus,"best_sec":${f"$best%.4f"},"passes":${jarr(times)},$load,"sf":"$sfDir"}"""
    val out = java.nio.file.Paths.get(
      sys.env.getOrElse("SPARK_GRAFT_TP_OUT", "target/throughput.json"))
    try {
      Option(out.getParent).foreach(java.nio.file.Files.createDirectories(_))
      java.nio.file.Files.writeString(out, json + "\n")
    } catch { case e: Throwable =>
      System.err.println(s"[throughput] could not write $out: ${e.getMessage}")
    }
    println(json)
  }
}
