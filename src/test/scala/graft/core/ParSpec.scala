package graft.core

import graft.SparkSpec
import org.apache.spark.sql.{functions => F}

class ParSpec extends SparkSpec {
  import spark.implicits._

  test("widen raises a below-core-count input to defaultParallelism") {
    val n = spark.sparkContext.defaultParallelism
    val one = Seq(1, 2, 3).toDF("x").coalesce(1)
    assert(one.rdd.getNumPartitions === 1)
    val w = Par.widen(one)
    assert(w.rdd.getNumPartitions === n)
    // round-robin repartition: same rows, any order
    assert(w.collect().map(_.getInt(0)).sorted.toSeq === Seq(1, 2, 3))
  }

  test("widen is a no-op (no exchange) when partitioning is already wide") {
    val n = spark.sparkContext.defaultParallelism
    val wide = spark.range(100).toDF("x").repartition(n + 3)
    val w = Par.widen(wide)
    // same object — no extra repartition node planned
    assert(w eq wide)
    assert(w.rdd.getNumPartitions === n + 3)
  }

  test("widen does not change aggregation results over a one-file scan") {
    val li = table("lineitem").select("l_quantity", "l_orderkey")
    val a = li.agg(F.sum("l_quantity"), F.count(F.lit(1))).head
    val b = Par.widen(li).agg(F.sum("l_quantity"), F.count(F.lit(1))).head
    assert(a === b)
  }

  test("widenStream repartitions a streaming frame without touching .rdd") {
    val dir = java.nio.file.Files.createTempDirectory("parstream").toString
    spark.range(10).toDF("id").coalesce(1).write.mode("overwrite").parquet(dir)
    val sdf = spark.readStream
      .schema(spark.read.parquet(dir).schema).parquet(dir)
    val w = Par.widenStream(sdf)
    assert(w.isStreaming)
    val qn = "par_" + java.util.UUID.randomUUID().toString.replace("-", "")
    val q = w.groupBy().count()
      .writeStream.format("memory").queryName(qn).outputMode("complete")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    assert(spark.table(qn).head.getLong(0) === 10L)
  }
}
