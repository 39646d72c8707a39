package graft

import org.apache.datasketches.common.ArrayOfStringsSerDe
import org.apache.datasketches.frequencies.ItemsSketch
import org.apache.datasketches.hll.HllSketch
import org.apache.datasketches.kll.KllDoublesSketch
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

import graft.profile._

/** Property tests: arbitrary profiles survive all three binary containers
  * (GRFT1 native, WHY1 reference-v1, v0 legacy) with their mergeable
  * state intact — serialization must never be the component that breaks
  * the monoid at scale. */
class SerdePropertySpec extends AnyFunSuite {

  /** Deterministic sample loop (no scalatestplus bridge in the offline
    * cache): 60 seeded draws per property. */
  private def forAll[T](g: Gen[T])(f: T => Unit): Unit =
    (0 until 60).foreach { i =>
      g.apply(Gen.Parameters.default, Seed(i.toLong)).foreach(f)
    }

  private def forAll[A, B](ga: Gen[A], gb: Gen[B])(f: (A, B) => Unit): Unit =
    (0 until 60).foreach { i =>
      for {
        a <- ga.apply(Gen.Parameters.default, Seed(i.toLong))
        b <- gb.apply(Gen.Parameters.default, Seed((i + 1000).toLong))
      } f(a, b)
    }

  private val genCounts: Gen[CountsSummary] = for {
    n <- Gen.chooseNum(0L, 1000000L)
    nulls <- Gen.chooseNum(0L, n)
    nan <- Gen.chooseNum(0L, 100L)
    inf <- Gen.chooseNum(0L, 10L)
    t <- Gen.chooseNum(0L, n)
  } yield CountsSummary(n, nulls, nan, inf, t)

  private val genTypes: Gen[TypeCountsSummary] = for {
    a <- Gen.chooseNum(0L, 9999L); b <- Gen.chooseNum(0L, 9999L)
    c <- Gen.chooseNum(0L, 9999L); d <- Gen.chooseNum(0L, 9999L)
    e <- Gen.chooseNum(0L, 9999L)
  } yield TypeCountsSummary(a, b, c, d, e, 0L)

  private val genInts: Gen[IntsSummary] = for {
    present <- Gen.oneOf(true, false)
    lo <- Gen.chooseNum(-100000L, 100000L)
    hi <- Gen.chooseNum(lo, 200000L)
  } yield if (present) IntsSummary(Some(lo), Some(hi)) else IntsSummary(None, None)

  private val genDist: Gen[DistributionSummary] = for {
    vals <- Gen.nonEmptyListOf(Gen.chooseNum(-1e6, 1e6))
  } yield {
    val sk = KllDoublesSketch.newHeapInstance(128)
    vals.foreach(sk.update)
    val mean = vals.sum / vals.size
    val m2 = vals.map(v => (v - mean) * (v - mean)).sum
    DistributionSummary(vals.size, mean, m2, Some(vals.min), Some(vals.max),
      Seq.empty, Seq.empty, sk.toByteArray)
  }

  private val genColumn: Gen[ColumnProfileView] = for {
    counts <- Gen.option(genCounts)
    types <- Gen.option(genTypes)
    ints <- Gen.option(genInts)
    dist <- Gen.option(genDist)
    card <- Gen.option(Gen.nonEmptyListOf(Gen.chooseNum(0L, 5000L)).map { xs =>
      val h = new HllSketch(12); xs.foreach(h.update)
      CardinalitySummary(h.getEstimate, h.getLowerBound(1), h.getUpperBound(1),
        h.toCompactByteArray)
    })
    fi <- Gen.option(Gen.nonEmptyListOf(Gen.alphaNumStr.suchThat(_.nonEmpty)).map { ss =>
      val s = new ItemsSketch[String](64); ss.foreach(s.update)
      FrequentItemsSummary(FrequentItemsSummary.topItems(s, 32),
        s.toByteArray(new ArrayOfStringsSerDe))
    })
  } yield ColumnProfileView(counts, types, ints, dist, card, fi)

  private val genWeights: Gen[FeatureWeights] = for {
    n <- Gen.chooseNum(0, 6)
    ks <- Gen.listOfN(n, Gen.identifier.suchThat(_.nonEmpty)).map(_.distinct)
    vs <- Gen.listOfN(ks.size, Gen.chooseNum(-1e6, 1e6))
    md <- Gen.mapOf(Gen.zip(Gen.identifier.suchThat(_.nonEmpty), Gen.alphaNumStr))
  } yield FeatureWeights(ks.zip(vs).toMap, md)

  private val genView: Gen[DatasetProfileView] = for {
    nCols <- Gen.chooseNum(0, 5)
    names <- Gen.listOfN(nCols, Gen.identifier.suchThat(_.nonEmpty)).map(_.distinct)
    cols <- Gen.sequence[List[(String, ColumnProfileView)], (String, ColumnProfileView)](
      names.map(n => genColumn.map(n -> _)))
    ts <- Gen.option(Gen.chooseNum(1L, 4102444800000L))
    fw <- Gen.option(genWeights)
  } yield DatasetProfileView(cols.toMap, ts, featureWeights = fw)

  /** The fields every container must preserve exactly. */
  private def essence(v: DatasetProfileView): Map[String, Any] =
    v.columns.toSeq.sortBy(_._1).flatMap { case (name, c) =>
      Seq(
        s"$name/counts" -> c.counts,
        s"$name/types" -> c.types,
        s"$name/ints" -> c.ints,
        s"$name/dist" -> c.distribution.map(d => (d.n, d.mean, d.m2, d.min, d.max)),
        s"$name/kll" -> c.distribution.map(_.kll.toSeq),
        s"$name/hll" -> c.cardinality.map(_.hll.toSeq),
        s"$name/fi" -> c.frequentItems.map(_.items))
    }.toMap

  test("GRFT1 round-trips arbitrary profiles exactly") {
    forAll(genView) { v =>
      val back = ProfileSerde.fromBytes(ProfileSerde.toBytes(v))
      assert(essence(back) == essence(v))
      // GRFT1 is the full-fidelity container: feature weights too
      assert(back.featureWeights == v.featureWeights)
    }
  }

  test("WHY1 round-trips arbitrary profiles exactly") {
    forAll(genView) { v =>
      val back = Why1.fromBytes(Why1.toBytes(v))
      assert(essence(back) == essence(v))
      assert(back.datasetTimestampMs == v.datasetTimestampMs)
    }
  }

  test("v0 container round-trips the metric state it models") {
    forAll(genView) { v =>
      val back = MigrationV0.fromV0Bytes(MigrationV0.toV0Bytes(v))
      v.columns.toSeq.sortBy(_._1).foreach { case (name, c) =>
        val g = back.columns(name)
        // CountersV0 has no nan/inf fields (v0_messages.proto:9-14) —
        // they are structurally lost, as in the reference migration
        c.counts.foreach(x => assert(g.counts.contains(x.copy(nan = 0, inf = 0))))
        c.types.foreach(x => assert(g.types.contains(x)))
        c.ints.foreach(x => assert(g.ints.contains(x)))
        c.distribution.foreach { d =>
          val gd = g.distribution.get
          assert(gd.n == d.n && gd.mean == d.mean && gd.m2 == d.m2)
          assert(gd.kll.toSeq == d.kll.toSeq)
        }
        c.frequentItems.foreach(f => assert(g.frequentItems.get.items == f.items))
      }
    }
  }

  test("merge commutes with WHY1 serde on arbitrary profile pairs") {
    forAll(genView, genView) { (a, b) =>
      val direct = a.merge(b)
      val viaBytes = Why1.fromBytes(Why1.toBytes(a)).merge(Why1.fromBytes(Why1.toBytes(b)))
      assert(essence(viaBytes) == essence(direct))
    }
  }
}
