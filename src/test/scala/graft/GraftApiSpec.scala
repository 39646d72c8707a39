package graft

import org.apache.spark.sql.{functions => F}

import graft.api.Graft

/** The why.*-style facade + drift overrides. */
class GraftApiSpec extends SparkSpec {

  test("log / logMultiple / logSegmented / write+read") {
    val li = table("lineitem")
    val r = Graft.log(li)
    assert(r.view.columns("l_quantity").counts.get.n == li.count())

    val multi = Graft.logMultiple(Map("nation" -> table("nation"), "region" -> table("region")))
    assert(multi("nation").view.columns.contains("n_name"))
    assert(multi("region").view.columns.contains("r_name"))

    val seg = Graft.logSegmented(li, Seq("l_returnflag"))
    assert(seg.merged.columns("l_quantity").counts.get.n == li.count())

    val path = java.nio.file.Files.createTempDirectory(
      java.nio.file.Paths.get("target"), "graft-api-").toString + "/p.bin"
    Graft.write(r, path)
    assert(Graft.read(path).view.summaryRows == r.view.summaryRows)
  }

  test("drift overrides force the chosen algorithm per column") {
    import graft.analysis.Drift
    val li = table("lineitem")
    val p = new graft.api.Profiler()
    val a = p.profile(li.filter(F.col("l_orderkey") % 2 === 0))
    val b = p.profile(li.filter(F.col("l_orderkey") % 2 =!= 0))
    val defaults = Drift.scores(a, b)
    assert(defaults.filter(_.column == "l_quantity").map(_.algorithm).toSet ==
      Set("ks", "hellinger"))
    val forced = Drift.scores(a, b, overrides = Map("l_quantity" -> "hellinger"))
    assert(forced.filter(_.column == "l_quantity").map(_.algorithm) == Seq("hellinger"))
  }
}
