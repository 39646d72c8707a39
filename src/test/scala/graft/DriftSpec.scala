package graft

import org.apache.datasketches.kll.KllDoublesSketch
import org.scalatest.funsuite.AnyFunSuite

import graft.analysis.Drift
import graft.profile.DistributionSummary

/** Pins the drift special functions to published table values, and the
  * KS p-value behavior around the reference's category thresholds —
  * the asymptotic-vs-`kstwo` divergence documented at `Drift.scala:26-31`. */
class DriftSpec extends AnyFunSuite {

  test("Kolmogorov survival function matches published table values") {
    // Q(λ) = 2 Σ (−1)^{j−1} e^{−2j²λ²}; classical two-sided KS table
    val table = Seq(
      0.5 -> 0.9639, // far left tail
      1.0 -> 0.2700,
      1.358 -> 0.0500, // α = 0.05 critical value
      1.628 -> 0.0100) // α = 0.01 critical value
    table.foreach { case (lambda, expected) =>
      assert(math.abs(Drift.kolmogorovSf(lambda) - expected) < 5e-4,
        s"Q($lambda) = ${Drift.kolmogorovSf(lambda)}, expected ~$expected")
    }
    assert(Drift.kolmogorovSf(0.0) == 1.0)
    assert(Drift.kolmogorovSf(5.0) < 1e-10)
  }

  test("chi-square survival function matches published critical values") {
    assert(math.abs(Drift.chi2Sf(3.841, 1) - 0.05) < 1e-3)
    assert(math.abs(Drift.chi2Sf(5.991, 2) - 0.05) < 1e-3)
    assert(math.abs(Drift.chi2Sf(2.706, 1) - 0.10) < 1e-3)
    assert(math.abs(Drift.chi2Sf(9.210, 2) - 0.01) < 1e-3)
    assert(Drift.chi2Sf(0.0, 3) == 1.0)
  }

  private def summaryOf(values: Seq[Double]): DistributionSummary = {
    val sk = KllDoublesSketch.newHeapInstance(1024)
    values.foreach(sk.update)
    val mean = values.sum / values.size
    val m2 = values.map(v => (v - mean) * (v - mean)).sum
    DistributionSummary(values.size, mean, m2,
      Some(values.min), Some(values.max), Seq.empty, Seq.empty, sk.toByteArray)
  }

  test("KS: identical samples give D=0, p=1; disjoint samples give D=1, p~0") {
    val a = summaryOf((1 to 500).map(_.toDouble))
    val same = Drift.ks(a, summaryOf((1 to 500).map(_.toDouble)))
    assert(same._1 == 0.0 && same._2 == 1.0)
    val far = Drift.ks(a, summaryOf((10001 to 10500).map(_.toDouble)))
    assert(far._1 == 1.0 && far._2 < 1e-10)
  }

  test("KS p-value categorisation boundary sits at the documented D*") {
    // With Ne = n·m/(n+m), the asymptotic p crosses 0.05 where
    // (√Ne + 0.12 + 0.11/√Ne)·D = 1.358. For n = m = 200 (Ne = 100) that
    // is D* = 1.358 / 10.131 ≈ 0.13404 — the only region where the
    // asymptotic formula and scipy's kstwo can categorise differently
    // (divergence ≲ 1e-3 in p for Ne ≳ 50, Drift.scala:26-31).
    val sqrtNe = math.sqrt(200.0 * 200.0 / 400.0)
    val scale = sqrtNe + 0.12 + 0.11 / sqrtNe
    val dStar = 1.358 / scale
    assert(Drift.kolmogorovSf(scale * (dStar - 0.01)) > 0.05)
    assert(Drift.kolmogorovSf(scale * (dStar + 0.01)) < 0.05)
  }
}
