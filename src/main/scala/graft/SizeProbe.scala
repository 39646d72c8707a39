package graft
import org.apache.spark.sql.{SparkSession, functions => F}
object SizeProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.ui.enabled","false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.1"
    def est(name: String, df: org.apache.spark.sql.DataFrame): Unit =
      println(f"$name%-30s ${df.queryExecution.optimizedPlan.stats.sizeInBytes}")
    val li = spark.read.parquet(s"$dir/lineitem.parquet")
    val liNumeric = Seq("l_quantity","l_extendedprice","l_discount","l_tax",
      "l_orderkey","l_partkey","l_linenumber").filter(li.columns.contains)
    est("lineitem full", li)
    est("lineitem select-all", li.select(li.columns.map(F.col):_*))
    est("lineitem numeric", li.select(liNumeric.map(F.col):_*))
    est("lineitem num+2str", li.select((liNumeric ++ Seq("l_returnflag","l_linestatus")).map(F.col):_*))
    est("customer", spark.read.parquet(s"$dir/customer.parquet"))
    est("documents", spark.read.parquet(s"$dir/documents.parquet"))
    est("events", spark.read.parquet(s"$dir/events.parquet"))
    spark.stop()
  }
}
