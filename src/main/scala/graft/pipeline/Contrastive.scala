package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.{functions => F}

import graft.analysis.Bootstrap

/** Contrastive-triplet mining — the training-pair construction an
  * embedding-model pipeline runs downstream of dedup/matching:
  * (anchor, positive) pairs come from ANY upstream matcher
  * (MinHash-LSH, fuzzy linkage, same-source adjacency); the NEGATIVE
  * is drawn deterministically per pair via the shared
  * [[graft.analysis.Bootstrap.minstdUniform]] integer recurrence and a
  * two-exclusion index bijection — so the sampled triplet set is a
  * pure function of the pair set (reproducible across runs, engines,
  * and partitionings; no RNG, no rejection loop).
  *
  * The bijection: with a dense id universe `0..n−1`, draw
  * `n0 = floor(u·(n−2))` over the n−2 valid targets, then shift past
  * the anchor and positive in index order (`n0 ≥ min → +1`, then
  * `≥ max → +1`) — EXACTLY uniform over the universe minus both, zero
  * collisions by construction (the standard sample-excluding-k trick),
  * versus hash-retry schemes that are only probabilistically
  * collision-free.
  *
  * Scale shape: map-only over the pair table (two comparisons + one
  * multiply per row); the universe size is one count. Non-dense id
  * spaces: dense-rank ids first (one range exchange) — the contract is
  * documented, not silently assumed (`require` guards n ≥ 3).
  *
  * (Reference analog: none — beyond-reference LLM-pipeline surface,
  * downstream of [[Dedup]]/[[FuzzyDedup]] and upstream of embedding
  * training.)
  */
object Contrastive {

  /** `(anchor, pos)` pairs → `(anchor, pos, neg)` with `neg` drawn
    * deterministically and uniformly from `0..n−1` minus both pair
    * members. Pairs with NULL or equal members drop. */
  def tripletsFromPairs(pairs: DataFrame, aCol: String, bCol: String,
      n: Long): DataFrame = {
    require(n >= 3, s"need a universe of >= 3 ids, got $n")
    val a = F.col(aCol).cast("long")
    val b = F.col(bCol).cast("long")
    val u = Bootstrap.minstdUniform(a, b)
    val n0 = F.floor(u * F.lit((n - 2).toDouble)).cast("long")
    val lo = F.least(a, b)
    val hi = F.greatest(a, b)
    val n1 = n0 + F.when(n0 >= lo, 1L).otherwise(0L)
    val n2 = n1 + F.when(n1 >= hi, 1L).otherwise(0L)
    pairs
      .filter(a.isNotNull && b.isNotNull && a =!= b)
      .select(a.as("anchor"), b.as("pos"), n2.as("neg"))
  }
}
