package graft.tools

import org.apache.spark.sql.SparkSession

/** Ad-hoc query runner for development (test scope — not shipped):
  * `sbt "Test/runMain graft.tools.Adhoc <sfDir> <query> [query...]"`
  * prints each registered query's result. */
object Adhoc {
  def main(args: Array[String]): Unit = {
    val dir = args.head
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    args.tail.foreach { q =>
      val t0 = System.nanoTime()
      val df = graft.SparkEntry.queries(q)(spark, dir)
      df.show(20, truncate = false)
      println(f"[$q] ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    spark.stop()
  }
}
