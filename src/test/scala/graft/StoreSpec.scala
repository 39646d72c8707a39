package graft

import java.nio.file.Files

import org.apache.spark.sql.{functions => F}

import graft.api.{Profiler, ProfileStore}
import graft.profile.ProfileSerde

/** Profile serde + parquet store. */
class StoreSpec extends SparkSpec {

  private def tmpDir(): String =
    Files.createTempDirectory(
      java.nio.file.Paths.get("target"), "store-spec-").toString

  test("GRFT1 serde round-trips every metric summary exactly") {
    val li = table("lineitem")
    val view = new Profiler().profile(li)
    val back = ProfileSerde.fromBytes(ProfileSerde.toBytes(view))
    assert(back.columns.keySet == view.columns.keySet)
    assert(back.summaryRows == view.summaryRows)
    // sketch payloads stay usable after the round trip
    val c = "l_quantity"
    val d0 = view.columns(c).distribution.get
    val d1 = back.columns(c).distribution.get
    assert(d1.sketch.getMaxItem == d0.sketch.getMaxItem)
    assert(view.columns("l_returnflag").frequentItems.get.items ==
      back.columns("l_returnflag").frequentItems.get.items)
  }

  test("store write/readMerged over a date range equals the whole profile") {
    val li = table("lineitem")
    val p = new Profiler()
    val store = new ProfileStore(spark, tmpDir())
    val day0 = java.time.Instant.parse("2024-03-01T00:00:00Z").toEpochMilli
    (0 until 3).foreach { i =>
      store.write(p.profile(li.filter(F.col("l_orderkey") % 3 === i)),
        "li", day0 + i * 86400000L)
    }
    val merged = store.readMerged("li", day0, day0 + 2 * 86400000L)
    val whole = p.profile(li)
    for (c <- whole.columns.keys) {
      assert(merged.columns(c).counts == whole.columns(c).counts, c)
      assert(merged.columns(c).ints == whole.columns(c).ints, c)
      (merged.columns(c).distribution, whole.columns(c).distribution) match {
        case (Some(m), Some(w)) =>
          assert(m.n == w.n, c); assert(m.min == w.min, c); assert(m.max == w.max, c)
          assert(math.abs(m.mean - w.mean) < 1e-9 * math.max(1.0, math.abs(w.mean)), c)
        case (m, w) => assert(m.isEmpty == w.isEmpty, c)
      }
    }
    // date-range pruning: a window covering only day 0 sees 1/3 of rows
    val d0only = store.readMerged("li", day0, day0)
    assert(d0only.columns("l_orderkey").counts.get.n < whole.columns("l_orderkey").counts.get.n)
  }

  test("segmented distributed write + readSegments") {
    val li = table("lineitem")
    val p = new Profiler()
    val store = new ProfileStore(spark, tmpDir())
    val seg = p.profileSegmentedDF(li, Seq("l_returnflag"))
    val ts = java.time.Instant.parse("2024-03-05T00:00:00Z").toEpochMilli
    store.writeSegmented(seg, 1, "li_seg", ts)
    val segs = store.readSegments("li_seg", ts, ts)
    val expected = li.select("l_returnflag").distinct()
      .collect().map(_.getString(0)).toSet
    assert(segs.keySet == expected)
    val totalN = segs.values.map(_.columns("l_quantity").counts.get.n).sum
    assert(totalN == li.count())
  }
}
