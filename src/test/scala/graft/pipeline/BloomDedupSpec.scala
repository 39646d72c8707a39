package graft.pipeline

import org.apache.spark.sql.{functions => F}

import graft.SparkSpec

/** Bloom-filter membership dedup: build/probe semantics, the
  * no-false-negative guarantee, OR-merge partitioning invariance, and a
  * forced-false-positive case at a deliberately tiny bitset. */
class BloomDedupSpec extends SparkSpec {
  import spark.implicits._

  private def keysDF(keys: Seq[String]) = keys.toDF("k")

  test("no false negatives: every inserted key probes maybe_dup") {
    val ref = keysDF((1 to 200).map(i => s"doc-$i"))
    val pos = Dedup.bloomPositionsMd5(F.col("k"), 4, 4)
    val bloom = Dedup.bloomBuild(ref, pos, 65536)
    val probed = Dedup.bloomProbe(ref, pos, bloom)
    assert(probed.filter(!F.col("maybe_dup")).count() === 0L)
    assert(bloom.select("n_items").as[Long].head() === 200L)
  }

  test("fresh keys at a right-sized bitset probe clean (16^4 bits, 200 keys)") {
    val ref = keysDF((1 to 200).map(i => s"doc-$i"))
    val fresh = keysDF((1 to 200).map(i => s"new-$i"))
    val pos = Dedup.bloomPositionsMd5(F.col("k"), 4, 4)
    val bloom = Dedup.bloomBuild(ref, pos, 65536)
    // ~800 of 65536 bits set → P(single FP) ≈ (800/65536)^4 ≈ 2e-8;
    // over 200 probes still ≈ 4e-6. A hit here means broken semantics,
    // not bad luck.
    assert(Dedup.bloomProbe(fresh, pos, bloom)
      .filter(F.col("maybe_dup")).count() === 0L)
  }

  test("tiny bitset forces false positives but never false negatives") {
    val ref = keysDF((1 to 300).map(i => s"doc-$i"))
    val fresh = keysDF((1 to 100).map(i => s"new-$i"))
    // 64 bits, 300 keys × 2 hashes → essentially all bits set
    val pos2 = Dedup.bloomPositionsXx(F.col("k"), 2, 64)
    val bloom = Dedup.bloomBuild(ref, pos2, 64)
    assert(Dedup.bloomProbe(ref, pos2, bloom)
      .filter(!F.col("maybe_dup")).count() === 0L)
    val fp = Dedup.bloomProbe(fresh, pos2, bloom)
      .filter(F.col("maybe_dup")).count()
    assert(fp > 0L, "saturated 64-bit bloom must collide fresh keys")
  }

  test("OR-merge is partitioning-invariant (1 vs 7 partitions, xx mode)") {
    val keys = (1 to 500).map(i => s"doc-$i")
    val pos = Dedup.bloomPositionsXx(F.col("k"), 4, 4096)
    val one = Dedup.bloomBuild(keysDF(keys).coalesce(1), pos, 4096)
      .select("bloom").as[Seq[Long]].head()
    val many = Dedup.bloomBuild(keysDF(keys).repartition(7), pos, 4096)
      .select("bloom").as[Seq[Long]].head()
    assert(one === many)
  }

  test("null keys are skipped, not inserted") {
    val ref = Seq(Some("a"), None, Some("b"), None).toDF("k")
    val pos = Dedup.bloomPositionsMd5(F.col("k"), 4, 4)
    val bloom = Dedup.bloomBuild(ref, pos, 65536)
    assert(bloom.select("n_items").as[Long].head() === 2L)
    val probed = Dedup.bloomProbe(keysDF(Seq("a", "b", "c")), pos, bloom)
      .orderBy("k").select("maybe_dup").as[Boolean].collect()
    assert(probed.toSeq === Seq(true, true, false))
  }

  test("md5 positions match hand-derived hex substrings") {
    val got = keysDF(Seq("hello"))
      .select(Dedup.bloomPositionsMd5(F.col("k"), 3, 4).as("p"))
      .as[Seq[Int]].head()
    val exp = (0 until 3).map { i =>
      val md = java.security.MessageDigest.getInstance("MD5")
        .digest(s"$i:hello".getBytes("UTF-8"))
      val hex = md.map("%02x".format(_)).mkString.take(4)
      Integer.parseInt(hex, 16)
    }
    assert(got === exp)
  }

  test("sharded ≡ per-shard single blooms at equal per-shard bits") {
    // the sharded table is by construction a union of independent
    // blooms, one per key shard; a probe must get EXACTLY the verdict
    // of the single bloom built over its shard's keys alone
    val ref = keysDF((1 to 400).map(i => s"doc-$i"))
    val fresh = keysDF((1 to 400).map(i => s"new-$i"))
    val all = ref.unionByName(fresh)
    val pos = Dedup.bloomPositionsMd5(F.col("k"), 4, 3) // 4096 bits: some FPs
    val shard = Dedup.bloomShardMd5(F.col("k"), 4)
    val table = Dedup.bloomBuildSharded(ref, shard, pos, 4096)
    val got = Dedup.bloomProbeSharded(all, shard, pos, table)
      .select("k", "maybe_dup").as[(String, Boolean)].collect().toMap
    for (s <- 0 until 4) {
      val single = Dedup.bloomBuild(ref.filter(shard === s), pos, 4096)
      val exp = Dedup.bloomProbe(all.filter(shard === s), pos, single)
        .select("k", "maybe_dup").as[(String, Boolean)].collect().toMap
      assert(exp.nonEmpty, s"empty shard $s breaks the parity claim")
      exp.foreach { case (k, v) => assert(got(k) === v, s"key $k shard $s") }
    }
    // and the union covers every probe exactly once
    assert(got.size === 800)
  }

  test("sharded: no false negatives, n_items partitions the key count") {
    val ref = keysDF((1 to 300).map(i => s"doc-$i"))
    val pos = Dedup.bloomPositionsMd5(F.col("k"), 4, 4)
    val shard = Dedup.bloomShardMd5(F.col("k"), 8)
    val table = Dedup.bloomBuildSharded(ref, shard, pos, 65536)
    assert(table.agg(F.sum("n_items")).as[Long].head() === 300L)
    assert(table.count() <= 8L)
    val probed = Dedup.bloomProbeSharded(ref, shard, pos, table)
    assert(probed.filter(!F.col("maybe_dup")).count() === 0L)
    // a probe routed to a shard with no bloom row flags false, not null
    val empty = Dedup.bloomBuildSharded(
      ref.filter(F.lit(false)), shard, pos, 65536)
    val missed = Dedup.bloomProbeSharded(ref, shard, pos, empty)
    assert(missed.filter(F.col("maybe_dup")).count() === 0L)
    assert(missed.filter(F.col("maybe_dup").isNull).count() === 0L)
  }

  test("BloomKeyer: keyed build/probe ≡ raw sharded calls, both modes") {
    val ref = keysDF((1 to 300).map(i => s"doc-$i"))
    val all = ref.unionByName(keysDF((1 to 100).map(i => s"new-$i")))
    // md5 mode replays the raw md5-derived calls verdict-for-verdict
    val km = Dedup.BloomKeyer.md5(numShards = 4, numHashes = 4, hexChars = 3)
    assert(km.numBits === 4096)
    val keyedM = Dedup.bloomProbeKeyed(all, F.col("k"), km,
        Dedup.bloomBuildKeyed(ref, F.col("k"), km))
      .select("k", "maybe_dup").as[(String, Boolean)].collect().toMap
    val pos = Dedup.bloomPositionsMd5(F.col("k"), 4, 3)
    val shard = Dedup.bloomShardMd5(F.col("k"), 4)
    val rawM = Dedup.bloomProbeSharded(all, shard, pos,
        Dedup.bloomBuildSharded(ref, shard, pos, 4096))
      .select("k", "maybe_dup").as[(String, Boolean)].collect().toMap
    assert(keyedM === rawM)
    // xx mode: no false negatives, shard routing covers all shards
    val kx = Dedup.BloomKeyer.xx(numShards = 4, numHashes = 4, numBits = 65536)
    val tableX = Dedup.bloomBuildKeyed(ref, F.col("k"), kx)
    assert(tableX.agg(F.sum("n_items")).as[Long].head() === 300L)
    val probedX = Dedup.bloomProbeKeyed(ref, F.col("k"), kx, tableX)
    assert(probedX.filter(!F.col("maybe_dup")).count() === 0L)
  }

  test("probe frames carrying a `bloom` column stay unambiguous; reserved names require") {
    val km = Dedup.BloomKeyer.md5(numShards = 2)
    val ref = keysDF((1 to 50).map(i => s"doc-$i"))
    val table = Dedup.bloomBuildKeyed(ref, F.col("k"), km)
    // a user column named `bloom` (or `shard`) must not collide with
    // the join's internal columns
    val probe = ref.withColumn("bloom", F.lit("user data"))
      .withColumn("shard", F.lit(9))
    val out = Dedup.bloomProbeKeyed(probe, F.col("k"), km, table)
    assert(out.columns.toSeq === Seq("k", "bloom", "shard", "maybe_dup"))
    assert(out.filter(!F.col("maybe_dup")).count() === 0L)
    assert(out.select("bloom").distinct().as[String].collect().toSeq === Seq("user data"))
    // only the internal __-prefixed names are reserved — and loudly
    val bad = ref.withColumn("__shard", F.lit(1))
    val e = intercept[IllegalArgumentException] {
      Dedup.bloomProbeKeyed(bad, F.col("k"), km, table)
    }
    assert(e.getMessage.contains("__shard"))
  }

  test("bloomShardMd5 is stable, in-range, and md5-derived") {
    val got = keysDF(Seq("hello"))
      .select(Dedup.bloomShardMd5(F.col("k"), 7).as("s")).as[Int].head()
    val md = java.security.MessageDigest.getInstance("MD5")
      .digest("shard:hello".getBytes("UTF-8"))
    val exp = (Integer.parseInt(md.map("%02x".format(_)).mkString.take(7), 16) % 7 + 7) % 7
    assert(got === exp)
    val shards = keysDF((1 to 500).map(i => s"k$i"))
      .select(Dedup.bloomShardMd5(F.col("k"), 4).as("s")).distinct()
      .as[Int].collect().toSet
    assert(shards === Set(0, 1, 2, 3))
  }
}
