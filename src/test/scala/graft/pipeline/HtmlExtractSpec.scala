package graft.pipeline

import graft.SparkSpec
import org.apache.spark.sql.{functions => F}

class HtmlExtractSpec extends SparkSpec {
  import spark.implicits._

  private def blocksOf(html: String) =
    HtmlExtract.blocks(Seq((1L, html)).toDF("doc_id", "html"), "html", Seq("doc_id"))
      .orderBy("block_idx").collect()

  test("block segmentation: block tags split, inline tags don't") {
    val rows = blocksOf(
      "<div>one <b>bold</b> two three four five six seven eight nine ten</div>" +
        "<p>second block of mostly prose text here to pass the length rule ok</p>")
    assert(rows.length == 2)
    assert(rows(0).getAs[String]("text") ==
      "one bold two three four five six seven eight nine ten")
    assert(rows(0).getAs[Long]("n_words") == 11)
    assert(rows.map(_.getAs[String]("label")).toSeq == Seq("content", "content"))
  }

  test("entity decode and whitespace collapse") {
    val rows = blocksOf("<p>a &amp;&nbsp; b &lt;tag&gt;   c &quot;q&#39;s&quot;</p>")
    assert(rows.head.getAs[String]("text") == "a & b <tag> c \"q's\"")
  }

  test("link density: anchor text chars over visible chars") {
    val rows = blocksOf("<p>read <a href=\"/x\">this link</a> now</p>")
    val r = rows.head
    assert(r.getAs[String]("text") == "read this link now")
    assert(r.getAs[Long]("link_chars") == 9) // "this link"
    assert(r.getAs[Long]("n_chars") == 18)
    assert(r.getAs[Double]("link_density") == 9.0 / 18.0)
    assert(r.getAs[String]("label") == "boilerplate") // 4 words, dense links
  }

  test("classification thresholds: exactly-10 words and exactly-0.25 density pass") {
    val ten = (1 to 10).map(i => s"w$i").mkString(" ") // 10 words, no links
    assert(blocksOf(s"<p>$ten</p>").head.getAs[String]("label") == "content")
    val nine = (1 to 9).map(i => s"w$i").mkString(" ")
    assert(blocksOf(s"<p>$nine</p>").head.getAs[String]("label") == "boilerplate")
    // 10 words, link text exactly a quarter of the visible chars
    // visible = "aaaaaaa" + 9 more words; construct 40 chars, 10 link chars
    val words = Seq("aaaaaaaaaa") ++ (1 to 9).map(_ => "abc") // 10 words total
    val html = s"<p><a href='/'>${words.head}</a> ${words.tail.mkString(" ")}</p>"
    val r = blocksOf(html).head
    assert(r.getAs[Long]("link_chars") == 10)
    val d = r.getAs[Double]("link_density")
    assert(r.getAs[String]("label") == (if (d <= 0.25) "content" else "boilerplate"))
  }

  test("stopword counting is exact and case-sensitive") {
    val rows = blocksOf("<p>The the a cat of it IT extra words to reach ten total</p>")
    // lowercase matches only: the, a, of, it, to = 5
    assert(rows.head.getAs[Long]("stop_words") == 5)
  }

  test("empty and whitespace-only blocks are dropped; indices re-rank") {
    val rows = blocksOf("<div>   </div><p>first real block with enough words here to count ok</p><br><p>x</p>")
    assert(rows.length == 2)
    assert(rows.map(_.getAs[Long]("block_idx")).toSeq == Seq(1L, 2L))
    assert(rows(0).getAs[String]("text").startsWith("first real"))
    assert(rows(1).getAs[String]("text") == "x")
  }

  test("extractText: content blocks joined in page order; empty pages absent") {
    val df = Seq(
      (1L, "<p>one two three four five six seven eight nine ten</p>" +
        "<nav><a href='/'>Home</a></nav>" +
        "<p>eleven twelve thirteen fourteen fifteen sixteen seventeen eighteen nineteen twenty</p>"),
      (2L, "<nav><a href='/'>Only boilerplate</a></nav>")).toDF("doc_id", "html")
    val got = HtmlExtract.extractText(df, "html", Seq("doc_id")).collect()
    assert(got.length == 1)
    val r = got.head
    assert(r.getAs[Long]("doc_id") == 1L)
    assert(r.getAs[Long]("n_blocks") == 2L)
    assert(r.getAs[String]("text") ==
      "one two three four five six seven eight nine ten " +
        "eleven twelve thirteen fourteen fifteen sixteen seventeen eighteen nineteen twenty")
  }

  test("extractTextColumn (inline) == extractText (explode path) on varied pages") {
    val pages = Seq(
      (1L, "<p>one two three four five six seven eight nine ten</p>" +
        "<nav><a href='/'>Home</a> <a href='/x'>X</a></nav>" +
        "<p>a second long paragraph with enough words to pass the cut here</p>"),
      (2L, "<nav><a href='/'>Only boilerplate</a></nav>"),
      (3L, "<div>middle block with a <a href='/l'>link</a> plus words to hit the count</div>"),
      (4L, ""),
      (5L, "<p>entities &amp; stay intact with plenty of extra words to pass the rule</p>"))
      .toDF("doc_id", "html")
    val explodePath = HtmlExtract.extractText(pages, "html", Seq("doc_id"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3))).toSet
    val inlinePath = pages.select(F.col("doc_id"),
        HtmlExtract.extractTextColumn(F.col("html")).as("x"))
      .filter(F.col("x.n_blocks") > 0)
      .select(F.col("doc_id"), F.col("x.text"), F.col("x.n_blocks"), F.col("x.n_chars"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3))).toSet
    assert(inlinePath == explodePath)
    assert(inlinePath.map(_._1) == Set(1L, 3L, 5L))
  }

  test("multiple key columns pass through") {
    val df = Seq((1L, "web", "<p>enough words to make this block count as real content</p>"))
      .toDF("doc_id", "source", "html")
    val rows = HtmlExtract.blocks(df, "html", Seq("doc_id", "source")).collect()
    assert(rows.head.getAs[String]("source") == "web")
  }

  private def decodeOne(s: String): String =
    Seq(Tuple1(s)).toDF("s")
      .select(graft.functions.HtmlEntities.decodeNumericEntities(F.col("s")))
      .head().getString(0)

  test("numeric character references: decimal, hex, case, and per-form digit caps") {
    assert(decodeOne("A&#39;B") == "A'B")
    assert(decodeOne("q&#8217;s &#x2019; &#X2019;") == "q’s ’ ’")
    assert(decodeOne("&#169;&#xA9;") == "©©")
    // astral plane: appendCodePoint must emit the surrogate pair
    assert(decodeOne("&#x1F600;") == new String(Character.toChars(0x1F600)))
    assert(decodeOne("&#128512;") == new String(Character.toChars(128512)))
    // maximal-run rule: an 8-digit run never decodes even if a ';' follows
    assert(decodeOne("&#00000039;") == "&#00000039;")
    assert(decodeOne("&#x0010FFFF;") == "&#x0010FFFF;")
    // 7 decimal digits / 6 hex digits are the caps and do decode
    assert(decodeOne("&#1114111;") == new String(Character.toChars(0x10FFFF)))
    assert(decodeOne("&#x10FFFF;") == new String(Character.toChars(0x10FFFF)))
  }

  test("numeric character references: invalid forms stay literal") {
    for (s <- Seq("&#0;", "&#xD800;", "&#xDFFF;", "&#55296;", "&#1114112;",
        "&#;", "&#x;", "&#12", "&#x1F", "&# 39;", "&#-5;", "tail&#"))
      assert(decodeOne(s) == s, s)
    // adjacent and overlapping starts
    assert(decodeOne("&#&#39;") == "&#'")
    assert(decodeOne("&&#38;") == "&&")
  }

  test("visibleText: numeric decode runs before named entities (no double decode)") {
    val rows = blocksOf("<p>one two three four five six seven eight nine " +
      "&amp;#39; q&#8217;s &#x2019;</p>")
    // &amp;#39; -> literal "&#39;" (the numeric pass sees no "&#" there;
    // &amp; decodes LAST); raw numeric forms decode to the curly quote
    assert(rows.head.getAs[String]("text") ==
      "one two three four five six seven eight nine &#39; q’s ’")
  }

  test("visibleText: numeric-recombination &#38;#39; stays a literal &#39; (no double decode)") {
    // the numeric pass decodes &#38; to '&', recombining with the
    // trailing '#39;' into the string "&#39;" — the named chain must
    // NOT decode that output (it carries no &#39; entry), so both
    // amp-escape spellings land on the same literal
    val rows = blocksOf("<p>one two three four five six seven eight nine " +
      "&#38;#39; and &amp;#39; agree; plain &#39; decodes</p>")
    assert(rows.head.getAs[String]("text") ==
      "one two three four five six seven eight nine &#39; and &#39; agree; plain ' decodes")
  }

  test("decodeNumericEntities: null passes through, no-entity string unchanged") {
    val out = Seq(Tuple1(null.asInstanceOf[String]), Tuple1("plain text"))
      .toDF("s")
      .select(graft.functions.HtmlEntities.decodeNumericEntities(F.col("s")).as("d"))
      .collect()
    assert(out(0).isNullAt(0))
    assert(out(1).getString(0) == "plain text")
  }

  test("metaRobots / robotsNoindex / metaCharset: wild-spelling variants") {
    import spark.implicits._
    def policy(html: String) = {
      val r = Seq(Tuple1(html)).toDF("h")
        .select(HtmlExtract.metaRobots(F.col("h")).as("r"),
          HtmlExtract.robotsNoindex(F.col("h")).as("n"),
          HtmlExtract.metaCharset(F.col("h")).as("c"))
        .head()
      (r.getString(0), r.getBoolean(1), r.getString(2))
    }
    // canonical spelling
    assert(policy("<meta name=\"robots\" content=\"noindex,nofollow\"><meta charset=\"UTF-8\">") ==
      ("noindex,nofollow", true, "utf-8"))
    // reversed attribute order, case-folded directives, self-closing tag
    assert(policy("<meta content=\"NOINDEX\" name=\"robots\" />") ==
      ("noindex", true, null))
    // 'none' shorthand; http-equiv charset; single quotes
    assert(policy("<meta name='robots' content='none'>" +
      "<meta http-equiv='Content-Type' content='text/html; charset=iso-8859-1'>") ==
      ("none", true, "iso-8859-1"))
    // index is NOT noindex; unquoted html5 charset
    assert(policy("<meta name=\"robots\" content=\"index, follow\"><meta charset=utf-8>") ==
      ("index, follow", false, "utf-8"))
    // http-equiv charset with REVERSED attribute order (content first)
    assert(policy("<meta content=\"text/html; charset=Windows-1252\" http-equiv=\"Content-Type\">") ==
      (null, false, "windows-1252"))
    // no declarations at all
    assert(policy("<html><body>plain</body></html>") == (null, false, null))
    // a BODY mentioning robots is not a directive
    assert(policy("<p>set meta name robots content noindex</p>") == (null, false, null))
  }

  test("Http.charsetOf: header charset param, quoted and bare; absent is NULL") {
    import spark.implicits._
    val got = Seq("text/html; charset=UTF-8", "text/html;charset=\"latin-1\"",
      "text/plain", null.asInstanceOf[String]).map(Tuple1(_)).toDF("ct")
      .select(graft.functions.Http.charsetOf(F.col("ct"))).collect()
      .map(r => if (r.isNullAt(0)) null else r.getString(0))
    assert(got.toSeq == Seq("utf-8", "latin-1", null, null))
  }
}
