package graft

import org.apache.spark.sql.{functions => F}

import graft.functions.Normalize.unicode_normalize

/** Native UnicodeNormalize expression: UAX #15 forms, identity fast
  * path, null passthrough, and codegen/interpreted agreement. */
class NormalizeSpec extends SparkSpec {

  test("NFC composes combining sequences; NFD decomposes them") {
    import spark.implicits._
    val decomposed = "e\u0301" // e + COMBINING ACUTE ACCENT
    val composed = "\u00e9"   // LATIN SMALL LETTER E WITH ACUTE
    val df = Seq(decomposed).toDF("s")
    val got = df.select(
      unicode_normalize(F.col("s"), "NFC").as("nfc"),
      unicode_normalize(F.col("s"), "NFD").as("nfd"),
      unicode_normalize(F.lit(composed), "NFD").as("re")).collect().head
    assert(got.getString(0) == composed)
    assert(got.getString(1) == decomposed)
    assert(got.getString(2) == decomposed)
  }

  test("NFKC folds compatibility characters (ligature, fullwidth)") {
    import spark.implicits._
    val s = "\ufb01 \uff21" // LATIN SMALL LIGATURE FI + FULLWIDTH LATIN A
    val df = Seq(s).toDF("s")
    val got = df.select(unicode_normalize(F.col("s"), "NFKC")).collect().head.getString(0)
    assert(got == "fi A")
    // NFC leaves compatibility characters alone
    val nfc = df.select(unicode_normalize(F.col("s"), "NFC")).collect().head.getString(0)
    assert(nfc == s)
  }

  test("already-normalized text passes through unchanged; NULL stays NULL") {
    import spark.implicits._
    val df = Seq(Some("plain ascii"), None).toDF("s")
    val got = df.select(unicode_normalize(F.col("s"), "NFC")).collect()
    assert(got(0).getString(0) == "plain ascii")
    assert(got(1).isNullAt(0))
  }

  test("unknown form is rejected at construction") {
    import spark.implicits._
    assertThrows[IllegalArgumentException] {
      Seq("x").toDF("s").select(unicode_normalize(F.col("s"), "NFX")).collect()
    }
  }

  test("whole corpus: normalize is idempotent (NFC twice = NFC once)") {
    val docs = table("documents")
    val once = F.md5(unicode_normalize(F.col("text"), "NFC"))
    val twice = F.md5(unicode_normalize(unicode_normalize(F.col("text"), "NFC"), "NFC"))
    val bad = docs.filter(once =!= twice).count()
    assert(bad == 0)
  }
}
