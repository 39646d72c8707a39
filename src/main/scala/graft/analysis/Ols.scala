package graft.analysis

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.{functions => F}

/** Closed-form ordinary least squares — the trainable regressor whose
  * FIT is hash-exact (the normal-equation sufficient statistics are
  * integer sums, the solve is one fixed scalar expression tree), the
  * regression counterpart of [[graft.pipeline.NaiveBayes]]: fit a
  * document-quality / length / cost model over corpus features in ONE
  * aggregation pass, no iterations, no learning rate.
  *
  * `y = b0 + b1·x1 + b2·x2` via Cramer's rule on the 3×3 normal
  * equations. The inputs must be INTEGER-VALUED columns (counts,
  * lengths — the corpus-feature case): all nine sufficient statistics
  * (`n, Σx1, Σx2, Σy, Σx1², Σx1x2, Σx2², Σx1y, Σx2y, Σy²`) then
  * accumulate as BIGINTs — exact under any partitioning and fold
  * order — and the determinant arithmetic on top is a single scalar
  * IEEE expression tree both engines evaluate identically. The classic
  * float-sum formulation is partitioning-dependent; this one is
  * reproducible to the bit.
  *
  * Scale shape: ONE map-side-combined aggregate over the corpus (ten
  * longs per partition ride the exchange), then a driver-free scalar
  * select. Caller must keep `Σ x²` within Long range (|x| ≤ ~3e6 at
  * 1e9 rows — comfortably true for per-document count features; the
  * aggregate overflows loudly via ANSI mode rather than silently
  * wrapping when violated).
  *
  * (Reference analog: whylogs profiles regression OUTPUTS
  * (`model_performance_metrics.py` regression branch); this trains
  * the model those metrics would then monitor.)
  */
object Ols {

  /** Fit `yCol = b0 + b1·x1Col + b2·x2Col` over integer-valued
    * columns. Returns ONE row:
    * `(n, b0, b1, b2, r2)` — coefficients and the coefficient of
    * determination, every double produced by the same expression tree
    * a SQL oracle replays bit-for-bit. Requires n ≥ 3 and a
    * non-singular design (feature columns with spread and not
    * collinear): a singular design makes the determinant zero, which
    * fails loudly as an ANSI DIVIDE_BY_ZERO (the Spark 4 default)
    * rather than emitting silent NaN coefficients. */
  def fit2(df: DataFrame, yCol: String, x1Col: String, x2Col: String): DataFrame = {
    val y = F.col(yCol).cast("long")
    val x1 = F.col(x1Col).cast("long")
    val x2 = F.col(x2Col).cast("long")
    // NULL rows are DROPPED, not silently half-counted: `count(*)` sees
    // every row while `sum` skips NULLs, so without this filter a single
    // NULL feature skews n against the sufficient statistics and the
    // coefficients are wrong with no error. Complete-case analysis is
    // the only consistent closed-form choice.
    val complete = df.filter(
      F.col(yCol).isNotNull && F.col(x1Col).isNotNull && F.col(x2Col).isNotNull)
    val sums = complete.agg(
      F.count(F.lit(1)).as("n"),
      F.sum(x1).as("s1"), F.sum(x2).as("s2"), F.sum(y).as("sy"),
      F.sum(x1 * x1).as("s11"), F.sum(x1 * x2).as("s12"),
      F.sum(x2 * x2).as("s22"), F.sum(x1 * y).as("s1y"),
      F.sum(x2 * y).as("s2y"), F.sum(y * y).as("syy"))
    def d(name: String): Column = F.col(name).cast("double")
    val (n, s1, s2, sy) = (d("n"), d("s1"), d("s2"), d("sy"))
    val (s11, s12, s22) = (d("s11"), d("s12"), d("s22"))
    val (s1y, s2y, syy) = (d("s1y"), d("s2y"), d("syy"))
    val det = n * (s11 * s22 - s12 * s12) - s1 * (s1 * s22 - s12 * s2) +
      s2 * (s1 * s12 - s11 * s2)
    val det0 = sy * (s11 * s22 - s12 * s12) - s1 * (s1y * s22 - s12 * s2y) +
      s2 * (s1y * s12 - s11 * s2y)
    val det1 = n * (s1y * s22 - s12 * s2y) - sy * (s1 * s22 - s12 * s2) +
      s2 * (s1 * s2y - s1y * s2)
    val det2 = n * (s11 * s2y - s1y * s12) - s1 * (s1 * s2y - s1y * s2) +
      sy * (s1 * s12 - s11 * s2)
    val b0 = det0 / det
    val b1 = det1 / det
    val b2 = det2 / det
    val sse = syy - (b0 * sy + b1 * s1y + b2 * s2y)
    val sst = syy - sy * sy / n
    sums.select(F.col("n"), b0.as("b0"), b1.as("b1"), b2.as("b2"),
      (F.lit(1.0) - sse / sst).as("r2"))
  }
}
