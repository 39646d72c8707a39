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

  test("chunkTokens: window starts, overlap, short tail, single and empty docs") {
    import spark.implicits._
    val docs = Seq(
      (1L, (1 to 10).map(i => s"t$i").mkString(" ")), // 10 toks: window 4 stride 3
      (2L, "a b c"),                                  // fits one window
      (3L, "")                                        // empty -> one empty chunk
    ).toDF("doc_id", "text")
    val got = Packing.chunkTokens(docs, "text", window = 4, stride = 3)
      .select("doc_id", "chunk_idx", "n_chunk_tokens", "chunk_text")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
      .sortBy(r => (r._1, r._2))
    // doc 1: starts 0,3,6 -> nc = floor((10-4+2)/3)+1 = 3 windows
    val d1 = got.filter(_._1 == 1L)
    assert(d1.map(_._4).toSeq === Seq(
      "t1 t2 t3 t4", "t4 t5 t6 t7", "t7 t8 t9 t10"))
    assert(d1.map(_._3).toSeq === Seq(4L, 4L, 4L))
    // consecutive windows overlap by window - stride = 1 token
    assert(d1(0)._4.split(" ").last === d1(1)._4.split(" ").head)
    val d2 = got.filter(_._1 == 2L)
    assert(d2.toSeq === Seq((2L, 0L, 3L, "a b c")))
    val d3 = got.filter(_._1 == 3L)
    assert(d3.toSeq === Seq((3L, 0L, 0L, "")))
    // shorter tail: 11 tokens, window 4, stride 3 -> starts 0,3,6,9; last has 2
    val tail = Packing.chunkTokens(
      Seq((9L, (1 to 11).map("w" + _).mkString(" "))).toDF("doc_id", "text"),
      "text", 4, 3)
      .select("doc_id", "chunk_idx", "n_chunk_tokens")
      .collect().map(r => (r.getLong(1), r.getLong(2))).sortBy(_._1)
    assert(tail.toSeq === Seq((0L, 4L), (1L, 4L), (2L, 4L), (3L, 2L)))
  }

  test("chunkTokens preserves the original casing of training text") {
    import spark.implicits._
    val got = Packing.chunkTokens(
      Seq((1L, "The Quick BROWN fox")).toDF("doc_id", "text"), "text", 4, 4)
      .select("chunk_text").as[String].head()
    assert(got === "The Quick BROWN fox")
  }
}
