package graft

import org.apache.spark.sql.{functions => F}

import graft.pipeline.Sampling

/** Deterministic hash sampling vs a JVM-side md5 re-computation. */
class SamplingSpec extends SparkSpec {

  private def md5hex8(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).take(4).map("%02x".format(_)).mkString

  test("thresholdHex: exact hex boundaries") {
    assert(Sampling.thresholdHex(0.5) == "80000000")
    assert(Sampling.thresholdHex(0.25) == "40000000")
    assert(Sampling.thresholdHex(0.125) == "20000000")
    assert(Sampling.thresholdHex(0.0) == "00000000")
    assert(Sampling.thresholdHex(1.0) == "g")
    // the cumulative split boundaries baked into the sample_split oracle
    val total = 0.8 + 0.1 + 0.1
    assert(Sampling.thresholdHex(0.8 / total) == "cccccccd")
    assert(Sampling.thresholdHex(0.8 / total + 0.1 / total) == "e6666666")
  }

  test("hashSample matches JVM md5 recomputation and nests by rate") {
    import spark.implicits._
    val df = (0L until 5000L).toDF("k").repartition(7)
    val got25 = Sampling.hashSample(df, F.col("k"), 0.25, "s1")
      .collect().map(_.getLong(0)).toSet
    val expected = (0L until 5000L)
      .filter(k => md5hex8(s"s1:$k") < "40000000").toSet
    assert(got25 == expected)
    // threshold-monotone: p=0.25 sample is a subset of the p=0.5 sample
    val got50 = Sampling.hashSample(df, F.col("k"), 0.5, "s1")
      .collect().map(_.getLong(0)).toSet
    assert(got25.subsetOf(got50))
    // rate lands near p (fixed keys, so this is a regression pin)
    assert(math.abs(got25.size / 5000.0 - 0.25) < 0.02)
    // a different salt decorrelates the draw
    val other = Sampling.hashSample(df, F.col("k"), 0.25, "s2")
      .collect().map(_.getLong(0)).toSet
    assert(other != got25)
  }

  test("stratifiedHashSample applies per-stratum thresholds; NULL strata get default") {
    import spark.implicits._
    val rows = (0L until 3000L).map(k =>
      (k, if (k % 3 == 0) "en" else if (k % 3 == 1) "zh" else null))
    val df = rows.toDF("k", "lang").repartition(5)
    val got = Sampling.stratifiedHashSample(df, F.col("k"), F.col("lang"),
      Map("en" -> 0.5, "zh" -> 0.125), defaultFraction = 0.25, salt = "g")
      .collect().map(_.getLong(0)).toSet
    val expected = rows.filter { case (k, lang) =>
      val thr = lang match {
        case "en" => "80000000"; case "zh" => "20000000"; case _ => "40000000"
      }
      md5hex8(s"g:$k") < thr
    }.map(_._1).toSet
    assert(got == expected)
  }

  test("hashSplit is total, deterministic, and weight-proportional") {
    import spark.implicits._
    val df = (0L until 4000L).toDF("k").repartition(6)
    val got = df.withColumn("split",
      Sampling.hashSplit(F.col("k"), "sp", Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1)))
      .groupBy("split").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got.values.sum == 4000L)
    assert(got.keySet == Set("train", "val", "test"))
    assert(math.abs(got("train") / 4000.0 - 0.8) < 0.03)
    // every key keeps its split on a recomputation with different partitioning
    val again = df.repartition(13).withColumn("split",
      Sampling.hashSplit(F.col("k"), "sp", Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1)))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val first = df.withColumn("split",
      Sampling.hashSplit(F.col("k"), "sp", Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1)))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(again == first)
  }

  test("NULL keys are never sampled") {
    import spark.implicits._
    val df = Seq(Some(1L), None, Some(2L)).toDF("k")
    val n = Sampling.hashSample(df, F.col("k"), 1.0 - 1e-9, "s").count()
    assert(n == 2L)
  }

  private def md5long15(s: String): Long = {
    val hex = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString.take(15)
    java.lang.Long.parseLong(hex, 16)
  }

  test("balancedSample matches the JVM modular-threshold recomputation exactly") {
    import spark.implicits._
    // strata a:500, b:1000, c:1500 → n_min = 500
    val rows = (0L until 3000L).map(k =>
      (k, if (k % 6 == 0) "a" else if (k % 6 <= 2) "b" else "c"))
    val df = rows.toDF("k", "s").repartition(7)
    val got = Sampling.balancedSample(df, F.col("k"), F.col("s"), salt = "bt")
      .collect().map(r => r.getLong(0)).toSet
    val nBy = rows.groupBy(_._2).map { case (s, g) => s -> g.size.toLong }
    val nMin = nBy.values.min
    val expected = rows.filter { case (k, s) =>
      md5long15(s"bt:$k") % nBy(s) < nMin
    }.map(_._1).toSet
    assert(got == expected)
    // each stratum lands near n_min; the smallest is kept whole
    val byStratum = rows.filter(r => expected.contains(r._1)).groupBy(_._2)
      .map { case (s, g) => s -> g.size }
    assert(byStratum("a") == 500)
    assert(math.abs(byStratum("b") - 500) < 60 && math.abs(byStratum("c") - 500) < 60)
  }

  test("temperatureSample: α endpoints and the α=0.5 threshold, JVM-recomputed") {
    import spark.implicits._
    val rows = (0L until 3000L).map(k =>
      (k, if (k % 6 == 0) "a" else if (k % 6 <= 2) "b" else "c"))
    val df = rows.toDF("k", "s").repartition(7)
    // α=0: everything kept
    assert(Sampling.temperatureSample(df, F.col("k"), F.col("s"),
      alpha = 0.0, salt = "t").count() == 3000L)
    // α=1: identical selected set to balancedSample
    val bal = Sampling.balancedSample(df, F.col("k"), F.col("s"), salt = "t")
      .collect().map(_.getLong(0)).toSet
    val t1 = Sampling.temperatureSample(df, F.col("k"), F.col("s"),
      alpha = 1.0, salt = "t").collect().map(_.getLong(0)).toSet
    assert(t1 == bal)
    // α=0.5: exact JVM recomputation of the sqrt thresholds
    val nBy = rows.groupBy(_._2).map { case (s, g) => s -> g.size.toLong }
    val nMin = nBy.values.min
    val thr = nBy.map { case (s, n) =>
      s -> math.floor(math.sqrt(nMin.toDouble / n) * n).toLong
    }
    val got = Sampling.temperatureSample(df, F.col("k"), F.col("s"),
      alpha = 0.5, salt = "t").collect().map(_.getLong(0)).toSet
    val expected = rows.filter { case (k, s) =>
      md5long15(s"t:$k") % nBy(s) < thr(s)
    }.map(_._1).toSet
    assert(got == expected)
    // monotone in α: hotter (lower α) keeps a superset
    assert(bal.subsetOf(got))
  }

  test("balancedSample refuses an id-like strata column instead of collecting it") {
    import spark.implicits._
    val df = (0L until 200L).map(k => (k, s"id$k")).toDF("k", "s")
    val e = intercept[IllegalArgumentException] {
      Sampling.balancedSample(df, F.col("k"), F.col("s"), maxStrata = 50)
    }
    assert(e.getMessage.contains("strata"))
    // and the guard is a bound on the collect, not a wrong answer under it
    assert(Sampling.balancedSample(df, F.col("k"), F.col("s"), maxStrata = 200)
      .count() == 200L)
  }

  test("NULL strata neither survive nor drag other strata's rates down") {
    import spark.implicits._
    // stratum a: 100 rows, b: 50 rows, null: 2 rows — if the null group
    // leaked into the counts, nMin would be 2 and both real strata
    // would collapse to ~2 rows while the null rows are dropped anyway
    val rows = (0L until 100L).map(k => (k, Option("a"))) ++
      (100L until 150L).map(k => (k, Option("b"))) ++
      Seq((900L, None: Option[String]), (901L, None))
    val df = rows.toDF("k", "s").repartition(5)
    val got = Sampling.balancedSample(df, F.col("k"), F.col("s"), salt = "nz")
      .collect().map(r => (r.getLong(0), r.getString(1)))
    assert(got.forall(_._2 != null), "null-strata rows must be dropped")
    // nMin is 50 (stratum b), not 2: b survives whole, a keeps ~half
    assert(got.count(_._2 == "b") == 50)
    assert(got.count(_._2 == "a") > 25,
      s"stratum a collapsed to ${got.count(_._2 == "a")} rows — null group leaked into nMin")
    val t = Sampling.temperatureSample(
      df, F.col("k"), F.col("s"), alpha = 0.5, salt = "nz")
      .collect().map(r => (r.getLong(0), r.getString(1)))
    assert(t.forall(_._2 != null))
    assert(t.count(_._2 == "b") == 50)
    assert(t.count(_._2 == "a") > 25)
  }

  test("capPerKey: exact cap per key, under-cap keys whole, partitioning-invariant") {
    import spark.implicits._
    // domain a: 40 rows, b: 3 rows, c: 1 row; cap 5
    val rows = (0L until 40L).map(k => (k, "a")) ++
      (100L until 103L).map(k => (k, "b")) ++ Seq((200L, "c"))
    val df = rows.toDF("id", "dom")
    val got = Sampling.capPerKey(df.repartition(7), F.col("dom"), F.col("id"), 5)
      .collect().map(r => (r.getLong(0), r.getString(1)))
    assert(got.count(_._2 == "a") == 5)
    assert(got.count(_._2 == "b") == 3)
    assert(got.count(_._2 == "c") == 1)
    // deterministic: a different partitioning selects the same rows
    val again = Sampling.capPerKey(df.repartition(2), F.col("dom"), F.col("id"), 5)
      .collect().map(r => (r.getLong(0), r.getString(1)))
    assert(got.toSet == again.toSet)
    // a different salt redraws the over-cap key's survivors
    val resalted = Sampling.capPerKey(df, F.col("dom"), F.col("id"), 5, salt = "x")
      .collect().map(r => (r.getLong(0), r.getString(1)))
    assert(resalted.count(_._2 == "a") == 5)
    assert(resalted.filter(_._2 == "a").toSet != got.filter(_._2 == "a").toSet,
      "re-salting should redraw the surviving set")
  }

  test("mixtureWeights: feasible budget, epoch cap, explicit budget") {
    import spark.implicits._
    // a: 100 tokens over 2 rows, b: 50 tokens over 1 row
    val df = Seq(("a", 60L), ("a", 40L), ("b", 50L), ("zzz", 999L))
      .toDF("dom", "toks")
    def run(budget: Option[Double]) =
      Sampling.mixtureWeights(df, F.col("dom"), F.col("toks"),
        targets = Map("a" -> 0.5, "b" -> 0.5), budget = budget, maxEpochs = 4.0)
        .collect().map(r => r.getString(0) ->
          (r.getDouble(1), r.getDouble(2), r.getDouble(3), r.getDouble(4), r.getBoolean(5)))
        .toMap
    // feasible budget = min(100*4/0.5, 50*4/0.5) = 400:
    // b (the scarce domain) runs at exactly the epoch cap, a at 2
    val feas = run(None)
    assert(feas.keySet === Set("a", "b")) // unlisted 'zzz' excluded
    assert(feas("a") === ((100.0, 0.5, 200.0, 2.0, false)))
    assert(feas("b") === ((50.0, 0.5, 200.0, 4.0, false)))
    // explicit over-feasible budget: both clipped at maxEpochs, flagged
    val over = run(Some(1000.0))
    assert(over("a") === ((100.0, 0.5, 500.0, 4.0, true)))
    assert(over("b") === ((50.0, 0.5, 500.0, 4.0, true)))
  }

  test("applyMixture: full copies, fractional draw, drop, default pass-through") {
    import spark.implicits._
    val rows = (0L until 400L).map { i =>
      (i, Seq("up2", "up14", "down", "gone", "other")((i % 5L).toInt))
    }
    val df = rows.toDF("id", "dom")
    val rates = Map("up2" -> 2.0, "up14" -> 1.4, "down" -> 0.4, "gone" -> 0.0)
    val got = Sampling.applyMixture(df, F.col("dom"), F.col("id"), rates)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getInt(2)))
    val byDom = got.groupBy(_._2)
    // rate 2.0: EVERY row exactly twice, epochs {0, 1}
    assert(byDom("up2").length === 160)
    assert(byDom("up2").groupBy(_._1).forall(_._2.map(_._3).sorted.sameElements(Seq(0, 1))))
    // rate 1.4: epoch 0 keeps all 80 rows; epoch 1 is a proper hash subset
    val up14ByEpoch = byDom("up14").groupBy(_._3).map { case (e, g) => e -> g.length }
    assert(up14ByEpoch(0) === 80)
    assert(up14ByEpoch.getOrElse(1, 0) > 0 && up14ByEpoch(1) < 80)
    // rate 0.4: a proper subset at epoch 0 only
    assert(byDom("down").forall(_._3 == 0))
    assert(byDom("down").nonEmpty && byDom("down").length < 80)
    // rate 0: nothing survives; unlisted: exactly once at epoch 0
    assert(!byDom.contains("gone"))
    assert(byDom("other").length === 80 && byDom("other").forall(_._3 == 0))
    // deterministic under repartitioning
    val again = Sampling.applyMixture(df.repartition(7), F.col("dom"), F.col("id"), rates)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getInt(2)))
    assert(got.toSet === again.toSet)
    // fractional draws at different epochs are decorrelated (salted per epoch):
    // the epoch-1 survivor set of up14 is not the epoch-0 survivor set of down
    val e1Up = byDom("up14").filter(_._3 == 1).map(_._1 % 5).toSet
    assert(e1Up.nonEmpty)
  }

  test("deterministicShuffle: a true permutation, shard-local contiguous positions") {
    import spark.implicits._
    val df = (1L to 1000L).toDF("id")
    val out = Sampling.deterministicShuffle(df, F.col("id"), numShards = 8)
      .select("id", "shard", "pos")
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))
    // every row exactly once
    assert(out.map(_._1).sorted.toSeq === (1L to 1000L))
    // positions are 1..n within each shard, no gaps or dups
    out.groupBy(_._2).foreach { case (shard, rows) =>
      assert(rows.map(_._3).sorted.toSeq === (1L to rows.length),
        s"shard $shard positions not contiguous")
    }
    // shards all in range and reasonably spread (md5 uniformity: each of
    // 8 shards gets ~125 of 1000; a shard under 60 means broken hashing)
    val sizes = out.groupBy(_._2).view.mapValues(_.length).toMap
    assert(sizes.keySet.subsetOf((0 until 8).toSet))
    assert(sizes.size === 8 && sizes.values.forall(_ > 60), s"skewed: $sizes")
    // the order differs from insertion order (it IS a shuffle)
    val shard0 = out.filter(_._2 == 0).sortBy(_._3).map(_._1)
    assert(shard0.toSeq !== shard0.sorted.toSeq)
  }

  test("balancedShards: global serpentine over the top-k, hand-checked") {
    import spark.implicits._
    // 10 docs all inside topK: weights 100..91 rank in descending
    // order, serpentine over 3 shards deals 0,1,2,2,1,0,0,1,2,2
    val df = (0L until 10L).map(i => (i, 100L - i)).toDF("id", "w")
    val got = graft.pipeline.Sampling
      .balancedShards(df, F.col("id"), F.col("w"), numShards = 3)
      .collect().map(r => r.getLong(0) -> r.getInt(2)).toMap
    assert(got === Map(0L -> 0, 1L -> 1, 2L -> 2, 3L -> 2, 4L -> 1,
      5L -> 0, 6L -> 0, 7L -> 1, 8L -> 2, 9L -> 2))
  }

  test("balancedShards: near-equal totals on an outlier-skewed corpus, partitioning-invariant") {
    import spark.implicits._
    // adversarial indivisible skew: 21 huge docs (~38% of total weight)
    // over a 2000-doc small tail — equal-count dealing bottoms out at
    // ~1.25 imbalance here; the deficit-quota tail counterweights it
    val rows = (0L until 2000L).map(i =>
      (i, if (i % 97 == 0) 5000L + i else 10L + i % 50))
    val df = rows.toDF("id", "w")
    val assigned = graft.pipeline.Sampling
      .balancedShards(df, F.col("id"), F.col("w"), numShards = 8)
    val totals = assigned.groupBy("shard").agg(F.sum("w").as("t"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(totals.keySet === (0 until 8).toSet)
    val (mx, mn) = (totals.values.max.toDouble, totals.values.min.toDouble)
    // residual is the binomial tail draw: sd ~ w_mean * sqrt(n/S) ~ 2%
    // of a shard's total at n = 2000 (and ~sqrt(n) smaller at corpus
    // scale); 1.15 leaves ~2 sd of headroom over the measured 1.105
    assert(mx / mn < 1.15, s"imbalance ${mx / mn}: $totals")
    // bit-identical under a different input partitioning
    val re = graft.pipeline.Sampling
      .balancedShards(df.repartition(13), F.col("id"), F.col("w"), numShards = 8)
      .collect().map(r => r.getLong(0) -> r.getInt(2)).toMap
    val base = assigned.collect().map(r => r.getLong(0) -> r.getInt(2)).toMap
    assert(re === base)
  }

  test("deterministicShuffle is partitioning-invariant and salt-sensitive") {
    import spark.implicits._
    val df = (1L to 300L).toDF("id")
    def run(d: org.apache.spark.sql.DataFrame, salt: String) =
      Sampling.deterministicShuffle(d, F.col("id"), 4, salt)
        .select("id", "shard", "pos")
        .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).sortBy(_._1)
    val a = run(df.coalesce(1), "shuffle")
    val b = run(df.repartition(7), "shuffle")
    assert(a.toSeq === b.toSeq)
    val c = run(df, "epoch1")
    assert(a.toSeq !== c.toSeq, "a different salt must give a different permutation")
  }
}
