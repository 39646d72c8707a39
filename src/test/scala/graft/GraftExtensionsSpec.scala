package graft

import org.apache.spark.sql.{functions => F, SparkSession}

import graft.pipeline.Dedup

/** SQL surface: registered functions plan the same expressions as the
  * Column API. */
class GraftExtensionsSpec extends SparkSpec {

  private def registered: SparkSession = { GraftFunctions.register(spark); spark }

  test("scalar functions match the Column API bit-for-bit") {
    val s = registered
    table("documents").limit(100).createOrReplaceTempView("docs_ext")
    val viaSql = s.sql(
      """SELECT doc_id,
        |  shingle_ids(filter(split(lower(trim(text)), '\\s+'), w -> length(w) > 0), 3) AS ids,
        |  simhash64(transform(filter(split(lower(trim(text)), '\\s+'), w -> length(w) > 0), t -> xxhash64(t))) AS sh,
        |  rolling_min_hash(text, 16) AS fp
        |FROM docs_ext""".stripMargin)
    val viaCol = table("documents").limit(100).select(
      F.col("doc_id"),
      Dedup.shingleIds(F.col("text"), 3).as("ids"),
      graft.functions.MinHash.simhash64(
        F.transform(Dedup.tokens(F.col("text")), t => F.xxhash64(t))).as("sh"),
      graft.functions.Fingerprints.rolling_min_hash(F.col("text"), 16).as("fp"))
    assert(viaSql.exceptAll(viaCol).isEmpty && viaCol.exceptAll(viaSql).isEmpty)
  }

  test("sketch aggregates work from SQL with partial/final planning") {
    val s = registered
    table("lineitem").createOrReplaceTempView("li_ext")
    val row = s.sql(
      """SELECT cardinality_agg(l_returnflag).estimate AS est,
        |       distribution_agg(CAST(l_quantity AS DOUBLE)).n AS n,
        |       frequent_items_agg(l_linestatus).items[0].value AS top_item
        |FROM li_ext""".stripMargin).head
    val exact = table("lineitem").agg(
      F.countDistinct("l_returnflag"), F.count(F.lit(1))).head
    // 3 distinct: HLL coupon-range estimate carries a ~1e-8 correction term
    assert(math.abs(row.getDouble(0) - exact.getLong(0).toDouble) < 1e-6)
    assert(row.getLong(1) == exact.getLong(1))
    assert(Set("O", "F").contains(row.getString(2)))
  }

  test("top_k_agg from SQL returns best-first pairs") {
    val s = registered
    val top = s.sql(
      """SELECT top_k_agg(CAST(l_extendedprice AS DOUBLE), l_orderkey, 3) AS t
        |FROM parquet.`/root/testdata/sf0.001/lineitem.parquet`""".stripMargin)
      .select(F.explode(F.col("t")).as("p")).select("p.score")
      .collect().map(_.getDouble(0)).toSeq
    val expected = table("lineitem")
      .orderBy(F.col("l_extendedprice").desc).limit(3)
      .select(F.col("l_extendedprice").cast("double"))
      .collect().map(_.getDouble(0)).toSeq
    assert(top == expected)
  }

  test("bloom_agg from SQL builds the same bitset as the Column API") {
    val s = registered
    table("documents").createOrReplaceTempView("docs_bloom_ext")
    val sqlBits = s.sql(
      """SELECT bloom_agg(
        |  CASE WHEN text IS NULL THEN NULL
        |       ELSE array(CAST(pmod(xxhash64(0, text), 4096) AS INT),
        |                  CAST(pmod(xxhash64(1, text), 4096) AS INT)) END, 4096) AS b
        |FROM docs_bloom_ext""".stripMargin)
      .select(F.col("b")).head.getSeq[Long](0)
    val apiBits = graft.pipeline.Dedup.bloomBuild(
        table("documents"),
        graft.pipeline.Dedup.bloomPositionsXx(F.col("text"), 2, 4096), 4096)
      .select("bloom").head.getSeq[Long](0)
    assert(sqlBits == apiBits)
  }

  test("integer-literal arguments are enforced") {
    val s = registered
    table("documents").limit(5).createOrReplaceTempView("docs_ext2")
    val e = intercept[Exception] {
      s.sql("SELECT rolling_min_hash(text, doc_id) FROM docs_ext2").collect()
    }
    assert(e.getMessage.contains("integer literal"))
  }

  test("spark.sql.extensions wiring injects the same registry") {
    val ext = new GraftExtensions()
    val prev = SparkSession.getActiveSession
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    try {
      val s2 = SparkSession.builder().master("local[2]")
        .withExtensions(ext).getOrCreate()
      val r = s2.sql("SELECT simhash64(array(CAST(1 AS BIGINT), CAST(-1 AS BIGINT)))").head
      assert(!r.isNullAt(0))
    } finally {
      prev.foreach { p =>
        SparkSession.setActiveSession(p); SparkSession.setDefaultSession(p)
      }
    }
  }

  test("unicode_normalize from SQL: forms, default NFC, literal-arg enforcement") {
    val s = registered
    val decomposed = "e\u0301"
    val composed = "\u00e9"
    val r = s.sql(
      s"""SELECT unicode_normalize('$decomposed') AS nfc,
         |  unicode_normalize('$decomposed', 'NFD') AS nfd,
         |  unicode_normalize('\ufb01', 'NFKC') AS nfkc""".stripMargin).head
    assert(r.getString(0) == composed)
    assert(r.getString(1) == decomposed)
    assert(r.getString(2) == "fi")
    assertThrows[Exception] { s.sql("SELECT unicode_normalize('x', 'NFX')").collect() }
  }
}
