package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftx.{columnExpr, exprColumn}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}

/** Native MinHash expressions over 64-bit shingle-id arrays.
  *
  * These exist for a load-bearing reason, not style: the HOF formulation
  * (`transform(sequence(0, P-1), p -> array_min(transform(ids, ...)))`)
  * references the shingle pipeline once *lexically*, so CollapseProject
  * happily inlines it into the lambda — and at runtime the lambda body is
  * re-evaluated per element, recomputing the entire shingling P (or P×B)
  * times per row. A single native expression computes all P permutation
  * minima in one pass over the ids: O(|ids| × P) long arithmetic, no
  * re-evaluation, codegen-friendly via a static call.
  *
  * Permutation p of id = fmix64(id + p · φ64) (golden-ratio increment +
  * murmur finalizer — standard public mixing constants).
  */
case class MinHashSignature(child: Expression, numPerm: Int) extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "minhash_signature"

  override def nullSafeEval(input: Any): Any =
    MinHashUtil.signature(input.asInstanceOf[ArrayData], numPerm)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val util = "graft.functions.MinHashUtil"
    nullSafeCodeGen(ctx, ev, c => {
      s"""
         |${ev.value} = $util.signature($c, $numPerm);
         |${ev.isNull} = ${ev.value} == null;
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): MinHashSignature =
    copy(child = newChild)
}

/** LSH band hashes straight from the shingle-id array (one pass: perm
  * minima then per-band combination). Returns NULL for an empty id array
  * so empty documents generate no candidate rows (a quadratic bucket of
  * empties otherwise — explode skips nulls). */
case class MinHashBands(child: Expression, numPerm: Int, bands: Int) extends UnaryExpression {
  require(numPerm % bands == 0, "numPerm must be divisible by bands")
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "minhash_bands"

  override def nullSafeEval(input: Any): Any =
    MinHashUtil.bandHashes(input.asInstanceOf[ArrayData], numPerm, bands)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val util = "graft.functions.MinHashUtil"
    nullSafeCodeGen(ctx, ev, c => {
      s"""
         |${ev.value} = $util.bandHashes($c, $numPerm, $bands);
         |${ev.isNull} = ${ev.value} == null;
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): MinHashBands =
    copy(child = newChild)
}

object MinHashUtil {
  private final val Phi64 = 0x9e3779b97f4a7c15L
  /** Seed used by Spark's `xxhash64` function. */
  private final val XxSeed = 42L
  private final val Sep = org.apache.spark.unsafe.types.UTF8String.fromString(" ")

  /** One-pass distinct shingle ids over a token array; empty/short input
    * yields an EMPTY array (not NULL — empty docs must not collide),
    * mirroring `Dedup.shingles`' `count <= 0` guard. */
  def shingleIds(toks: ArrayData, n: Int): ArrayData = {
    import org.apache.spark.sql.catalyst.expressions.XXH64
    import org.apache.spark.unsafe.types.UTF8String
    val count = toks.numElements() - (n - 1)
    if (count <= 0) return new GenericArrayData(Array.emptyLongArray)
    val out = new Array[Long](count)
    var m = 0
    // open-addressing set, capacity = pow2 >= 2*count (load <= 0.5)
    var cap = 4
    while (cap < count * 2) cap <<= 1
    val mask = cap - 1
    val table = new Array[Long](cap)
    val used = new Array[Boolean](cap)
    val parts = new Array[UTF8String](n)
    var i = 0
    while (i < count) {
      var j = 0
      while (j < n) { parts(j) = toks.getUTF8String(i + j); j += 1 }
      val h = XXH64.hashUTF8String(UTF8String.concatWs(Sep, parts: _*), XxSeed)
      var slot = (h ^ (h >>> 32)).toInt & mask
      var dup = false
      var open = false
      while (!dup && !open) {
        if (!used(slot)) open = true
        else if (table(slot) == h) dup = true
        else slot = (slot + 1) & mask
      }
      if (!dup) {
        used(slot) = true; table(slot) = h
        out(m) = h; m += 1
      }
      i += 1
    }
    new GenericArrayData(java.util.Arrays.copyOf(out, m))
  }

  /** Non-distinct positional shingle hashes; element i = hash of the
    * n-gram at token offset i. Same hashing as [[shingleIds]] (xxhash64
    * of the space-joined gram, Spark's seed). */
  def posShingleHashes(toks: ArrayData, n: Int): ArrayData = {
    import org.apache.spark.sql.catalyst.expressions.XXH64
    import org.apache.spark.unsafe.types.UTF8String
    val count = toks.numElements() - (n - 1)
    if (count <= 0) return new GenericArrayData(Array.emptyLongArray)
    val out = new Array[Long](count)
    val parts = new Array[UTF8String](n)
    var i = 0
    while (i < count) {
      var j = 0
      while (j < n) { parts(j) = toks.getUTF8String(i + j); j += 1 }
      out(i) = XXH64.hashUTF8String(UTF8String.concatWs(Sep, parts: _*), XxSeed)
      i += 1
    }
    new GenericArrayData(out)
  }

  /** Non-distinct positional shingle STRINGS (the grams themselves),
    * for callers that hash with a replayable idiom (md5-prefix) instead
    * of [[posShingleHashes]]'s xxhash64. One pass: the HOF formulation
    * (`transform(sequence..., i -> concat_ws(slice(words, i, n)))`)
    * re-evaluates the tokenizer subtree once per gram after
    * CollapseProject inlines it — O(len²) char work per document. */
  def posShingleStrings(toks: ArrayData, n: Int): ArrayData = {
    import org.apache.spark.unsafe.types.UTF8String
    val count = toks.numElements() - (n - 1)
    if (count <= 0) return new GenericArrayData(Array.empty[Any])
    val out = new Array[Any](count)
    val parts = new Array[UTF8String](n)
    var i = 0
    while (i < count) {
      var j = 0
      while (j < n) { parts(j) = toks.getUTF8String(i + j); j += 1 }
      out(i) = UTF8String.concatWs(Sep, parts: _*)
      i += 1
    }
    new GenericArrayData(out)
  }

  /** Winnowing selection (Schleimer/Wilkerson/Aiken): the sorted distinct
    * minima of every `window`-wide sliding window over the positional
    * gram hashes — monotonic-deque, O(len) total. Edge semantics match
    * the HOF formulation it replaces: empty input → empty; fewer hashes
    * than `window` → the single global minimum. Input longs must be
    * non-null (hashes of non-null grams). */
  def winnowSelect(hs: ArrayData, window: Int): ArrayData = {
    val m = hs.numElements()
    if (m == 0) return new GenericArrayData(Array.emptyLongArray)
    val a = hs.toLongArray()
    if (m < window) {
      var mn = a(0); var i = 1
      while (i < m) { if (a(i) < mn) mn = a(i); i += 1 }
      return new GenericArrayData(Array(mn))
    }
    val nw = m - window + 1
    val mins = new Array[Long](nw)
    val dq = new Array[Int](m)
    var head = 0; var tail = 0 // live deque indices: [head, tail)
    var i = 0
    while (i < m) {
      while (tail > head && a(dq(tail - 1)) >= a(i)) tail -= 1
      dq(tail) = i; tail += 1
      if (dq(head) <= i - window) head += 1
      if (i >= window - 1) mins(i - window + 1) = a(dq(head))
      i += 1
    }
    java.util.Arrays.sort(mins)
    var w = 1; var r = 1
    while (r < nw) {
      if (mins(r) != mins(w - 1)) { mins(w) = mins(r); w += 1 }
      r += 1
    }
    new GenericArrayData(java.util.Arrays.copyOf(mins, w))
  }

  private def permMins(ids: ArrayData, numPerm: Int): Array[Long] = {
    val n = ids.numElements()
    val mins = Array.fill(numPerm)(Long.MaxValue)
    var i = 0
    while (i < n) {
      val id = ids.getLong(i)
      var p = 0
      while (p < numPerm) {
        val h = FingerprintUtil.fmix64(id + p * Phi64)
        if (h < mins(p)) mins(p) = h
        p += 1
      }
      i += 1
    }
    mins
  }

  /** NULL for an empty id set — an all-MaxValue signature would make
    * every empty document an exact duplicate of every other. */
  def signature(ids: ArrayData, numPerm: Int): ArrayData =
    if (ids.numElements() == 0) null
    else new GenericArrayData(permMins(ids, numPerm))

  def bandHashes(ids: ArrayData, numPerm: Int, bands: Int): ArrayData = {
    if (ids.numElements() == 0) return null
    val mins = permMins(ids, numPerm)
    val rows = numPerm / bands
    val out = new Array[Long](bands)
    var b = 0
    while (b < bands) {
      var h = 1125899906842597L
      var r = 0
      while (r < rows) {
        h = FingerprintUtil.fmix64(h ^ mins(b * rows + r))
        r += 1
      }
      out(b) = h
      b += 1
    }
    new GenericArrayData(out)
  }

  /** 64-bit SimHash from token hashes: bit b of the output is the
    * majority vote of bit b across the hashes — one pass, replacing a
    * 64×-re-evaluating HOF fold. NULL for empty input (the majority vote
    * of zero tokens would set every bit, colliding all empty docs). */
  def simHash(tokenHashes: ArrayData): java.lang.Long = {
    val n = tokenHashes.numElements()
    if (n == 0) return null
    val votes = new Array[Int](64)
    var i = 0
    while (i < n) {
      val h = tokenHashes.getLong(i)
      var b = 0
      while (b < 64) {
        if (((h >>> b) & 1L) == 1L) votes(b) += 1
        b += 1
      }
      i += 1
    }
    var sig = 0L
    var b = 0
    while (b < 64) {
      if (2 * votes(b) >= n) sig |= (1L << b)
      b += 1
    }
    sig
  }
}

/** SimHash expression over an array<long> of token hashes; NULL for
  * empty input. */
case class SimHash64(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def prettyName: String = "simhash64"

  override def nullSafeEval(input: Any): Any =
    MinHashUtil.simHash(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val util = "graft.functions.MinHashUtil"
    val res = ctx.freshName("simhash")
    nullSafeCodeGen(ctx, ev, c => {
      s"""
         |java.lang.Long $res = $util.simHash($c);
         |${ev.isNull} = $res == null;
         |${ev.value} = ${ev.isNull} ? -1L : $res.longValue();
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): SimHash64 =
    copy(child = newChild)
}

/** Positionful sibling of [[ShingleIds]]: element i is the xxhash64 of
  * the word n-gram starting at token i — NOT deduplicated, position
  * order preserved, so `posexplode` recovers (position, gram-hash) pairs
  * with no struct building. Exists for the same CollapseProject reason
  * as [[ShingleIds]]: the HOF formulation re-tokenizes the document once
  * per gram (measured 5.6 s for 250k grams at sf0.1; this expression
  * does the same in one pass per row). Short/empty input yields an
  * EMPTY array. */
case class PosShingleHashes(child: Expression, n: Int) extends UnaryExpression {
  require(n > 0, "shingle size must be positive")
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "pos_shingle_hashes"

  override def nullSafeEval(input: Any): Any =
    MinHashUtil.posShingleHashes(input.asInstanceOf[ArrayData], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val util = "graft.functions.MinHashUtil"
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $util.posShingleHashes($c, $n);")
  }

  override protected def withNewChildInternal(newChild: Expression): PosShingleHashes =
    copy(child = newChild)
}

/** Distinct 64-bit shingle ids straight from a token array: the id of a
  * window is `xxhash64(concat_ws(" ", window))` — bit-identical to the
  * HOF formulation (`array_distinct(transform(shingles, xxhash64))`,
  * kept as the semantics oracle in PipelineSpec) but ONE pass: the HOF
  * version runs three interpreted lambda layers per row (slice +
  * concat_ws per window, distinct, hash) and dominated the near-dup
  * pipeline's map cost (~3.4 s of dedup_near's 6 s at sf0.1). Distinct
  * is on the id value via an open-addressing probe; first-occurrence
  * order is preserved, matching array_distinct. */
case class ShingleIds(child: Expression, n: Int) extends UnaryExpression {
  require(n > 0, "shingle size must be positive")
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "shingle_ids"

  override def nullSafeEval(input: Any): Any =
    MinHashUtil.shingleIds(input.asInstanceOf[ArrayData], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val util = "graft.functions.MinHashUtil"
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $util.shingleIds($c, $n);")
  }

  override protected def withNewChildInternal(newChild: Expression): ShingleIds =
    copy(child = newChild)
}

/** Positional n-gram STRINGS from a token array — the material for a
  * replayable (md5-idiom) winnowing hash. One pass; short/empty input
  * yields an EMPTY array. Exists for the same CollapseProject reason as
  * [[ShingleIds]]: a HOF gram builder re-tokenizes per gram. */
case class PosShingleStrings(child: Expression, n: Int) extends UnaryExpression {
  require(n > 0, "shingle size must be positive")
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "pos_shingle_strings"

  override def nullSafeEval(input: Any): Any =
    MinHashUtil.posShingleStrings(input.asInstanceOf[ArrayData], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val util = "graft.functions.MinHashUtil"
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $util.posShingleStrings($c, $n);")
  }

  override protected def withNewChildInternal(newChild: Expression): PosShingleStrings =
    copy(child = newChild)
}

/** Winnowing selection over positional gram hashes: sorted distinct
  * sliding-window minima in one O(len) deque pass. The child is
  * evaluated ONCE — the HOF formulation
  * (`transform(sequence(1, nw), j -> array_min(slice(ghs, j, w)))`)
  * re-evaluates the whole gram-hash subtree per window position after
  * CollapseProject, O(len²) hashing per document (the shape that put
  * doc_winnowing at 925 s on the 100× probe). */
case class WinnowSelect(child: Expression, window: Int) extends UnaryExpression {
  require(window > 0, "window must be positive")
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "winnow_select"

  override def nullSafeEval(input: Any): Any =
    MinHashUtil.winnowSelect(input.asInstanceOf[ArrayData], window)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val util = "graft.functions.MinHashUtil"
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $util.winnowSelect($c, $window);")
  }

  override protected def withNewChildInternal(newChild: Expression): WinnowSelect =
    copy(child = newChild)
}

/** Column wrappers. */
object MinHash {
  def minhash_signature(ids: Column, numPerm: Int): Column =
    exprColumn(MinHashSignature(columnExpr(ids), numPerm))
  def minhash_bands(ids: Column, numPerm: Int, bands: Int): Column =
    exprColumn(MinHashBands(columnExpr(ids), numPerm, bands))
  def simhash64(tokenHashes: Column): Column =
    exprColumn(SimHash64(columnExpr(tokenHashes)))
  def shingle_ids(tokens: Column, n: Int): Column =
    exprColumn(ShingleIds(columnExpr(tokens), n))
  def pos_shingle_hashes(tokens: Column, n: Int): Column =
    exprColumn(PosShingleHashes(columnExpr(tokens), n))
  def pos_shingle_strings(tokens: Column, n: Int): Column =
    exprColumn(PosShingleStrings(columnExpr(tokens), n))
  def winnow_select(gramHashes: Column, window: Int): Column =
    exprColumn(WinnowSelect(columnExpr(gramHashes), window))
}
