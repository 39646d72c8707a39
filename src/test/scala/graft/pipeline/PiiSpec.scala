package graft.pipeline

import org.apache.spark.sql.Row

import graft.SparkSpec

class PiiSpec extends SparkSpec {

  private def scanOne(text: String): Map[String, Int] = {
    import spark.implicits._
    val row = Pii.scan(Seq(text).toDF("text"), "text")
      .select("pii_email", "pii_phone", "pii_ipv4", "pii_card", "pii_total")
      .collect()(0)
    Seq("email", "phone", "ipv4", "card", "total").zipWithIndex
      .map { case (k, i) => k -> row.getInt(i) }.toMap
  }

  test("scan: each class counted, clean text all-zero") {
    assert(scanOne("write to jane.doe+spam@sub.example.co.uk today")("email") == 1)
    assert(scanOne("call 25-989-741-2988 or 415.555.0199")("phone") == 2)
    assert(scanOne("server at 10.0.42.7 and 192.168.1.255")("ipv4") == 2)
    assert(scanOne("card 4111 1111 1111 1111 on file")("card") == 1)
    val clean = scanOne("an entirely unremarkable sentence with number 42 in it")
    assert(clean("total") == 0, s"clean text flagged: $clean")
  }

  test("scan: mixed text sums into pii_total") {
    val got = scanOne("a@b.io, 10.1.2.3, dial 123-456-7890")
    assert(got("email") == 1 && got("ipv4") == 1 && got("phone") == 1)
    assert(got("total") == 3)
  }

  test("redact: replaces every occurrence with its class token") {
    import spark.implicits._
    val out = Pii.redact(
      Seq("mail a@b.io or c@d.io, host 10.0.0.1").toDF("text"), "text")
      .select("redacted").collect()(0).getString(0)
    assert(out == "mail [EMAIL] or [EMAIL], host [IPV4]")
  }

  test("redact: email precedence keeps one token, no digit leftovers") {
    import spark.implicits._
    val out = Pii.redact(Seq("reach 415.555.0199@example.com now").toDF("text"), "text")
      .select("redacted").collect()(0).getString(0)
    assert(out == "reach [EMAIL] now", s"got: $out")
  }

  test("summary: corpus-level incidence over a known fixture") {
    import spark.implicits._
    val docs = Seq(
      "a@b.io and c@d.io",          // 2 email hits, 1 doc
      "host 10.0.0.1",              // 1 ipv4
      "nothing to see here",
      "dial 123-456-7890").toDF("text").repartition(3)
    val r: Row = Pii.summary(docs, "text").collect()(0)
    val cols = Pii.summary(docs, "text").columns.zipWithIndex.toMap
    assert(r.getLong(cols("docs")) == 4L)
    assert(r.getLong(cols("docs_with_pii")) == 3L)
    assert(r.getLong(cols("docs_email")) == 1L && r.getLong(cols("hits_email")) == 2L)
    assert(r.getLong(cols("docs_ipv4")) == 1L && r.getLong(cols("hits_ipv4")) == 1L)
    assert(r.getLong(cols("docs_phone")) == 1L && r.getLong(cols("hits_phone")) == 1L)
    assert(r.getLong(cols("docs_card")) == 0L && r.getLong(cols("hits_card")) == 0L)
  }

  test("scan stays a map-only plan: no exchange, single codegen stage") {
    val scanned = Pii.scan(table("documents"), "text")
    val plan = scanned.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"PII scan must not shuffle:\n$plan")
  }
}
