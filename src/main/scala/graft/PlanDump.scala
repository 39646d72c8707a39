package graft

import org.apache.spark.sql.SparkSession

/** Dev tool: dump `.explain("formatted")` of registered queries to
  * plans/<tag>/<name>_<suffix>.txt for the optimization-round evidence
  * trail. Usage:
  *   sbt "runMain graft.PlanDump <tag> <suffix> q1,q2,..."
  * Streaming queries execute their stream inside the closure; the dumped
  * plan is of the DataFrame the query RETURNS (the declared surface). */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val Array(tag, suffix, names) = args.take(3)
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = java.nio.file.Paths.get("plans", tag)
    java.nio.file.Files.createDirectories(dir)
    for (name <- names.split(",").map(_.trim).filter(_.nonEmpty)) {
      try {
        val df = SparkEntry.queries(name)(spark, sfDir)
        val txt = df.queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode)
        java.nio.file.Files.writeString(dir.resolve(s"${name}_$suffix.txt"), txt)
        println(s"[plandump] wrote $name")
      } catch { case e: Throwable =>
        System.err.println(s"[plandump] $name FAILED: ${e.getMessage}")
      }
    }
    spark.stop()
  }
}
