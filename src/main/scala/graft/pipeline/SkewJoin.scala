package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.{functions => F}

/** Hot-key-resilient equi-join — SALTING as a library operator, the
  * standard fix when one join key carries a disproportionate share of
  * a 100 TB fact table (AQE skew-join splits oversized PARTITIONS at
  * runtime, but a single mega-KEY still lands every row in one task's
  * sort-merge stream; salting splits the KEY itself).
  *
  * Mechanics: every big-side row gets a salt in `[0, saltFactor)` that
  * is NOT a function of the join key (a key-derived salt would re-fuse
  * the hot key), the small side fans out `saltFactor` ways, and the
  * join runs on `(key, salt)` — a hot key's rows now hash to
  * `saltFactor` distinct reducers. The RESULT is provably independent
  * of the salt values: each big row matches exactly the one fanned
  * copy of each small match, so the output multiset equals the plain
  * join's (spec-pinned, and `salted_join_agg` hash-matches a plain-join
  * oracle).
  *
  * Costs to weigh at scale: the small side shuffles ×saltFactor (keep
  * it dimension-sized) and map-side combine on the pre-join key is
  * lost. Only `inner` and `left` joins are valid — replicating the
  * small side breaks right/full multiplicity.
  *
  * (Preflight: size saltFactor from [[graft.analysis.DataAudit]]
  * `keySkewReport` — share of the top key ≈ how many ways it must
  * split.)
  */
object SkewJoin {

  def saltedJoin(big: DataFrame, small: DataFrame, key: String,
      saltFactor: Int, joinType: String = "inner"): DataFrame = {
    require(saltFactor >= 1, s"saltFactor must be >= 1, got $saltFactor")
    require(Seq("inner", "left", "left_outer", "leftouter").contains(joinType),
      s"salting replicates the small side — only inner/left joins are valid, got $joinType")
    // row-id salt, not key-derived: result-invariant, spreads hot keys
    val saltedBig = big.withColumn("__salt",
      F.pmod(F.monotonically_increasing_id(), F.lit(saltFactor.toLong)).cast("int"))
    val fanned = small.withColumn("__salt",
      F.explode(F.array((0 until saltFactor).map(i => F.lit(i)): _*)))
    saltedBig.join(fanned, Seq(key, "__salt"), joinType).drop("__salt")
  }
}
