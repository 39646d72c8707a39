package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.{functions => F}

import graft.api.Profiler
import graft.core.{MetricConfig, Namespace, ResolverSpec}

/** Dev probe: per-metric-family cost attribution on the ThroughputBench
  * frame. Test scope, not shipped. */
object TpProbe {
  def main(args: Array[String]): Unit = {
    val cpus = 32
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val base = spark.read.parquet("/root/testdata/sf0.1/lineitem.parquet")
      .select("l_orderkey", "l_partkey", "l_suppkey", "l_quantity",
        "l_extendedprice", "l_discount", "l_returnflag", "l_shipdate")
    val n = base.count()
    val copies = math.max(1L, (4800000L + n - 1) / n).toInt
    val frame = base.withColumn("rep", F.explode(F.sequence(F.lit(1), F.lit(copies))))
      .drop("rep").repartition(cpus * 2).cache()
    val rows = frame.count()
    import Namespace._
    val subsets: Seq[(String, Seq[String])] = Seq(
      "counts" -> Seq(Counts), "types" -> Seq(Types), "ints" -> Seq(Ints),
      "dist" -> Seq(Distribution), "card" -> Seq(Cardinality),
      "fi" -> Seq(FrequentItems),
      "all" -> Seq(Counts, Types, Distribution, Ints, Cardinality, FrequentItems))
    subsets.foreach { case (name, ms) =>
      val p = new Profiler(MetricConfig(), ResolverSpec(byKind = _ => ms))
      val t = (0 until 6).map { _ =>
        val t0 = System.nanoTime()
        p.profileDF(frame).collect()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"[tp] $name%-8s best ${t.min}%.3f s  passes ${t.map(x => f"$x%.2f").mkString(",")}")
    }
    println(s"[tp] rows=$rows")
    spark.stop()
  }
}
