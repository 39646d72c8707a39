package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftx.{columnExpr, exprColumn}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Production-vocabulary BPE encoding: apply a learned merge table to a
  * token array in ONE native pass per document.
  *
  * [[graft.pipeline.TextAnalysis.bpeSegment]] folds one
  * `regexp_replace` per merge into the Column tree — exactly right for
  * the oracle-scale table (each merge is one lookahead-free replace both
  * regex engines evaluate identically) but unplannable at a real 32k-merge
  * vocabulary (32k chained regex nodes). This expression computes the SAME
  * function from the merge table directly:
  *
  * The fold's semantics are "for each merge in rank order, one greedy
  * left-to-right non-overlapping pass over the symbol sequence". This
  * expression replays that LITERALLY but skips the no-op passes: it keeps
  * a cursor `lastApplied` and repeatedly (a) scans the current symbols for
  * the MINIMUM-rank adjacent pair with rank > lastApplied, (b) merges all
  * its occurrences in one greedy pass, (c) advances the cursor. Ranks are
  * visited in strictly increasing order exactly once each — identical to
  * the fold for ANY merge table (no rank-consistency assumption needed;
  * a recreated lower-rank adjacency is ignored just as the fold ignores
  * it). Cost per word is O(applied-passes × word-length) hash lookups —
  * independent of vocabulary size, so a 32k- or 100k-merge table encodes
  * a 100 TB corpus in one map-only scan with the table held ONCE per
  * executor as a codegen reference object (never 32k plan nodes).
  *
  * Input: the pre-tokenized word array (the `[a-z0-9]+` pre-tokenization
  * cut, as training). Output: the document's BPE symbols in order,
  * words flattened. Native ≡ fold is pinned by spec on trained tables,
  * adversarial runs, and rank-inconsistent synthetic tables, and the
  * `bpe_encode_native` query hash-matches the same DuckDB oracle that
  * replays training + fold encoding end to end.
  *
  * (Reference analog: whylogs has no tokenizer trainer; this extends the
  * trainable family's BPE arc to production inference scale.)
  */
case class BpeEncodeTokens(child: Expression, merges: Seq[(String, String)],
    symWidth: Int = 1)
  extends UnaryExpression {
  require(symWidth >= 1, "symWidth must be >= 1")

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "bpe_encode_tokens"

  @transient private lazy val table: BpeTable = BpeTable.build(merges)

  override def nullSafeEval(input: Any): Any =
    BpeEncodeUtil.encode(input.asInstanceOf[ArrayData], table, symWidth)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val tableRef = ctx.addReferenceObj("bpeTable", table, classOf[BpeTable].getName)
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.BpeEncodeUtil.encode($c, $tableRef, $symWidth);")
  }

  override protected def withNewChildInternal(newChild: Expression): BpeEncodeTokens =
    copy(child = newChild)
}

/** The merge table in lookup form: pair → ALL of its 0-based ranks,
  * ascending. Keys join the two symbols with a space (cannot occur
  * inside an `[a-z0-9]+`-derived symbol, so the joined key is
  * collision-free). One instance per expression, shared across rows
  * via the codegen reference array. */
final class BpeTable(val ranks: java.util.HashMap[String, Array[Int]])
  extends Serializable {
  /** Smallest rank of (s1, s2) STRICTLY ABOVE `after`, or Int.MaxValue.
    * A pair listed twice in the merge table applies at BOTH positions
    * in the fold — and the later application need not be a no-op,
    * because the pair's symbols can be (re)created by merges ranked in
    * between — so the table keeps every rank, not just the first. */
  def rankAfter(s1: String, s2: String, after: Int): Int = {
    val rs = ranks.get(s1 + " " + s2)
    if (rs eq null) return Int.MaxValue
    var i = 0
    while (i < rs.length) {
      if (rs(i) > after) return rs(i)
      i += 1
    }
    Int.MaxValue
  }
  def isEmpty: Boolean = ranks.isEmpty
}

object BpeTable {
  def build(merges: Seq[(String, String)]): BpeTable = {
    val m = new java.util.HashMap[String, scala.collection.mutable.ArrayBuffer[Int]](
      merges.size * 2)
    merges.zipWithIndex.foreach { case ((s1, s2), i) =>
      m.computeIfAbsent(s1 + " " + s2,
        _ => new scala.collection.mutable.ArrayBuffer[Int](1)) += i
    }
    val out = new java.util.HashMap[String, Array[Int]](m.size * 2)
    m.forEach((k, v) => { out.put(k, v.toArray); () })
    new BpeTable(out)
  }
}

object BpeEncodeUtil {

  /** Encode every word in `toks` against `table`; returns the flattened
    * symbol array. Null elements inside the token array are skipped
    * (cannot arise from the tokenizer, but ArrayData permits them).
    * `symWidth` is the initial-symbol width in chars: 1 for the default
    * per-char alphabet, 2 for the byte-level hex-pair alphabet (tokens
    * arrive as lowercase-hex UTF-8; a trailing short chunk is kept
    * whole, defensively — hex strings are always even). */
  def encode(toks: ArrayData, table: BpeTable, symWidth: Int = 1): ArrayData = {
    val nw = toks.numElements()
    val out = new scala.collection.mutable.ArrayBuffer[UTF8String](nw * 2)
    var wi = 0
    while (wi < nw) {
      if (!toks.isNullAt(wi)) {
        encodeWord(toks.getUTF8String(wi).toString, table, out, symWidth)
      }
      wi += 1
    }
    new GenericArrayData(out.toArray[Any])
  }

  private def encodeWord(
      w: String,
      table: BpeTable,
      out: scala.collection.mutable.ArrayBuffer[UTF8String],
      symWidth: Int): Unit = {
    val n = w.length
    if (n == 0) return
    // initial symbols: `symWidth`-char chunks (width 1 equals
    // training's "(.)" split; width 2 equals the byte-mode "(..)"
    // hex-pair split)
    val n0 = (n + symWidth - 1) / symWidth
    var syms = new Array[String](n0)
    var i = 0
    while (i < n0) {
      syms(i) = w.substring(i * symWidth, math.min((i + 1) * symWidth, n))
      i += 1
    }
    var len = n0
    if (!table.isEmpty) {
      var lastApplied = -1
      var continue = true
      while (continue && len > 1) {
        // (a) minimum present rank STRICTLY ABOVE the cursor — the fold
        // never revisits an already-applied merge
        var best = Int.MaxValue
        i = 0
        while (i < len - 1) {
          val r = table.rankAfter(syms(i), syms(i + 1), lastApplied)
          if (r < best) best = r
          i += 1
        }
        if (best == Int.MaxValue) continue = false
        else {
          // (b) one greedy left-to-right non-overlapping pass for this
          // rank — after merging (i, i+1) the scan resumes at i+2, the
          // regexp_replace continuation semantics
          val next = new Array[String](len)
          var o = 0
          i = 0
          while (i < len) {
            if (i < len - 1 && table.rankAfter(syms(i), syms(i + 1), lastApplied) == best) {
              next(o) = syms(i) + syms(i + 1)
              o += 1
              i += 2
            } else {
              next(o) = syms(i)
              o += 1
              i += 1
            }
          }
          syms = next
          len = o
          lastApplied = best
        }
      }
    }
    i = 0
    while (i < len) { out += UTF8String.fromString(syms(i)); i += 1 }
  }
}

/** Column wrapper. */
object BpeEncode {
  def bpe_encode_tokens(tokens: Column, merges: Seq[(String, String)],
      symWidth: Int = 1): Column =
    exprColumn(BpeEncodeTokens(columnExpr(tokens), merges, symWidth))
}
