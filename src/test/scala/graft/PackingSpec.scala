package graft

import org.apache.spark.sql.{functions => F}

import graft.pipeline.{Packing, TextAnalysis}

/** Distributed prefix-sum packing vs a driver-side cumulative sum. */
class PackingSpec extends SparkSpec {

  test("offsets equal the driver-side prefix sum regardless of input partitioning") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    val rows = (0L until 3000L).map(i => (i, rnd.nextInt(900).toLong))
    for (parts <- Seq(1, 4, 17)) {
      val df = rows.toDF("id", "ntok").repartition(parts, F.col("id"))
      val got = Packing.withOffsets(df, "id", F.col("ntok"), capacity = 128L)
        .select("id", "offset", "chunk_id")
        .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
      var acc = 0L
      rows.foreach { case (id, n) =>
        assert(got(id) == ((acc, acc / 128L)), s"id=$id parts=$parts")
        acc += n
      }
    }
  }

  test("zero-length and NULL-count docs take zero width") {
    import spark.implicits._
    val df = Seq((1L, Some(10L)), (2L, None), (3L, Some(0L)), (4L, Some(5L)))
      .toDF("id", "ntok")
    val got = Packing.withOffsets(df, "id", F.col("ntok"), capacity = 8L)
      .select("id", "n_tokens", "offset")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sortBy(_._1)
    assert(got.toSeq == Seq((1L, 10L, 0L), (2L, 0L, 10L), (3L, 0L, 10L), (4L, 5L, 10L)))
  }

  test("documents fixture: chunks cover the stream contiguously") {
    val out = Packing.withOffsets(table("documents"), "doc_id",
      TextAnalysis.tokenCount(F.col("text")), capacity = 512L)
      .select("doc_id", "n_tokens", "offset")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sortBy(_._1)
    out.sliding(2).foreach {
      case Array((_, n, o), (_, _, o2)) => assert(o2 == o + n)
      case _ =>
    }
    assert(out.head._3 == 0L)
  }
}
