package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftx.{columnExpr, exprColumn}
import org.apache.spark.sql.types.{DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** Document fingerprinting: minimum rolling polynomial hash over all
  * byte windows of length `window` (a 1-fingerprint winnowing scheme —
  * two documents sharing any `window`-byte run can collide to the same
  * fingerprint, which is the property near-dup detection samples).
  *
  * Native Catalyst expression with codegen so it runs inside whole-stage
  * codegen rather than as a boxed UDF.
  */
case class RollingMinHash(child: Expression, window: Int)
  extends UnaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "rolling_min_hash"

  override def nullSafeEval(input: Any): Any =
    FingerprintUtil.rollingMinHash(input.asInstanceOf[UTF8String], window)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.FingerprintUtil.rollingMinHash($c, $window)")

  override protected def withNewChildInternal(newChild: Expression): RollingMinHash =
    copy(child = newChild)
}

object FingerprintUtil {
  /** Min over all windows of a base-257 polynomial rolling hash of the
    * UTF-8 bytes (mod 2^64 via natural long wraparound). Deterministic,
    * allocation-free. */
  def rollingMinHash(s: UTF8String, window: Int): Long = {
    val bytes = s.getBytes
    val n = bytes.length
    if (n == 0) return 0L
    val w = math.min(window, n)
    // precompute base^(w-1)
    var basePow = 1L
    var i = 0
    while (i < w - 1) { basePow *= 257L; i += 1 }
    var h = 0L
    i = 0
    while (i < w) { h = h * 257L + (bytes(i) & 0xffL); i += 1 }
    // The first window enters the pool mixed, like every later one —
    // otherwise fingerprints are biased toward position 0.
    var min = fmix64(h)
    i = w
    while (i < n) {
      h = (h - (bytes(i - w) & 0xffL) * basePow) * 257L + (bytes(i) & 0xffL)
      // final mix so min isn't dominated by high-byte structure
      val mixed = fmix64(h)
      if (mixed < min) min = mixed
      i += 1
    }
    min
  }

  /** MurmurHash3 finalizer (public-domain mixing constants). */
  def fmix64(x0: Long): Long = {
    var x = x0
    x ^= x >>> 33
    x *= 0xff51afd7ed558ccdL
    x ^= x >>> 33
    x *= 0xc4ceb9fe1a85ec53L
    x ^= x >>> 33
    x
  }
}

/** Column wrappers for the custom expressions. */
object Fingerprints {
  def rolling_min_hash(c: Column, window: Int = 16): Column =
    exprColumn(RollingMinHash(columnExpr(c), window))
}
