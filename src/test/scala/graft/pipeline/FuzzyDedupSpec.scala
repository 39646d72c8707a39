package graft.pipeline

import graft.SparkSpec

class FuzzyDedupSpec extends SparkSpec {
  import spark.implicits._

  private def pairsOf(rows: Seq[(Long, String)], maxDist: Int = 1,
      prefixLen: Int = 2, cap: Option[Int] = None) =
    FuzzyDedup.fuzzyPairs(rows.toDF("id", "s"), "id", "s", maxDist, prefixLen, cap)
      .orderBy("id1", "id2")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(4)))

  test("pairs within a block at <= maxDist; id1 < id2; exact dups are dist 0") {
    val got = pairsOf(Seq(1L -> "apple", 2L -> "appl", 3L -> "apply",
      4L -> "apple", 5L -> "orange"))
    // apple~appl (del), apple~apply (sub), appl~apply (ins),
    // apple~apple dist 0, appl/apply vs second apple symmetric
    assert(got.toSet == Set((1L, 2L, 1L), (1L, 3L, 1L), (1L, 4L, 0L),
      (2L, 3L, 1L), (2L, 4L, 1L), (3L, 4L, 1L)))
  }

  test("blocking: a typo inside the prefix is missed (documented recall cut)") {
    assert(pairsOf(Seq(1L -> "kitten", 2L -> "sitten")).isEmpty)
    // same pair under a 1-char block IS found (multi-pass blocking hook)
    assert(pairsOf(Seq(1L -> "kitten", 2L -> "kittex")).toSet == Set((1L, 2L, 1L)))
  }

  test("length band: len diff beyond maxDist never reaches levenshtein") {
    assert(pairsOf(Seq(1L -> "ab", 2L -> "abcd")).isEmpty)
    // within band but above threshold: excluded by the -1 sentinel
    assert(pairsOf(Seq(1L -> "abcx", 2L -> "abyz")).isEmpty)
  }

  test("maxBlockSize skips oversized blocks deterministically") {
    val rows = Seq(1L -> "aaa", 2L -> "aab", 3L -> "aac", // block "aa" size 3
      10L -> "zzz", 11L -> "zzx") // block "zz" size 2
    assert(pairsOf(rows, cap = Some(2)).toSet == Set((10L, 11L, 1L)))
    assert(pairsOf(rows, cap = Some(3)).size == 4) // all 3 aa-pairs + zz pair
  }

  test("NULL strings drop; case-insensitive block, case-sensitive distance") {
    val got = pairsOf(Seq(1L -> "Apple", 2L -> "apple", 3L -> null))
    // block lower("Ap") == "ap"; levenshtein("Apple","apple") = 1
    assert(got.toSet == Set((1L, 2L, 1L)))
  }

  test("fuzzyPairsMulti: suffix pass recovers the planted prefix typo; union is deterministic") {
    // kitten/sitten: the edit is in the FIRST char -> prefix blocks
    // "ki"/"si" differ (single pass provably misses, pinned above);
    // suffix block "ne" (reversed prefix of "nettik"/"nettis") matches
    val rows = Seq(1L -> "kitten", 2L -> "sitten",
      3L -> "apple", 4L -> "appl", 5L -> "orange").toDF("id", "s")
    def multi() = FuzzyDedup.fuzzyPairsMulti(rows, "id", "s", maxDist = 1)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(4))).toSet
    val got = multi()
    // prefix-only pairs (apple~appl) AND the prefix-typo pair both present
    assert(got == Set((1L, 2L, 1L), (3L, 4L, 1L)))
    assert(multi() == got) // pass-union determinism
    // a pair found by BOTH passes (edit in the middle) appears once
    val both = FuzzyDedup.fuzzyPairsMulti(
      Seq(1L -> "abcxde", 2L -> "abcyde").toDF("id", "s"), "id", "s", 1)
      .collect()
    assert(both.length == 1)
  }

  test("fuzzyPairsMulti: per-pass maxBlockSize; custom blocker seq") {
    // prefix block "aa" has 3 members (over cap 2) but suffix blocks
    // ("ba"/"ca"/"ba") stay small: the suffix pass still finds aab~aac? no —
    // suffixes "ba"/"ca" differ; aaa~aab share suffix? "aa"/"ba" differ.
    // So cap 2 with both passes finds only what small blocks allow.
    val rows = Seq(1L -> "aaa", 2L -> "aab", 3L -> "aac",
      10L -> "zzz", 11L -> "zzx").toDF("id", "s")
    val capped = FuzzyDedup.fuzzyPairsMulti(rows, "id", "s", 1,
      maxBlockSize = Some(2))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // prefix pass: aa-block skipped, zz kept -> (10,11);
    // suffix pass: blocks are reversed prefixes, all size <= 2;
    // "zzz"~"zzx" reversed are "zz*"/"xz*" -> different suffix blocks,
    // but aaa~aab reversed "aa"/"ba" differ too; only (10,11) survives
    assert(capped == Set((10L, 11L)))
    // single custom blocker (1-char prefix) finds kitten~sitten? no —
    // 'k' vs 's'; a CONSTANT blocker does (degenerate single block)
    val const = FuzzyDedup.fuzzyPairsMulti(
      Seq(1L -> "kitten", 2L -> "sitten").toDF("id", "s"), "id", "s", 1,
      blockers = Seq(_ => org.apache.spark.sql.functions.lit("all")))
      .collect()
    assert(const.length == 1)
  }

  test("matchIndex: cross-table linkage; probe ids never self-compare; band holds") {
    val index = Seq(1L -> "apple", 2L -> "orange", 3L -> "banana").toDF("iid", "is")
    val probe = Seq(10L -> "appl", 11L -> "orangee", 12L -> "pear", 13L -> "banana")
      .toDF("pid", "ps")
    val got = FuzzyDedup.matchIndex(probe, "pid", "ps", index, "iid", "is", 1)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(4))).toSet
    // appl~apple 1, orangee~orange 1, banana~banana 0; pear matches nothing
    assert(got == Set((10L, 1L, 1L), (11L, 2L, 1L), (13L, 3L, 0L)))
  }

  test("matchIndex: maxBlockSize skips oversized INDEX blocks; probe fan-out bounded") {
    // index block "ap" holds 3 entries (over cap 2) -> skipped entirely;
    // block "or" holds 1 -> kept. The probe aimed at the hot block gets
    // nothing (deterministic recall cut); the cool-block probe matches.
    val index = Seq(1L -> "apple", 2L -> "appel", 3L -> "apples",
      4L -> "orange").toDF("iid", "is")
    val probe = Seq(10L -> "appl", 11L -> "orangee").toDF("pid", "ps")
    val capped = FuzzyDedup.matchIndex(probe, "pid", "ps", index, "iid", "is",
        maxDist = 1, maxBlockSize = Some(2))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(capped == Set((11L, 4L)))
    // uncapped control: the hot-block probe matches apple and appel
    val open = FuzzyDedup.matchIndex(probe, "pid", "ps", index, "iid", "is", 1)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(open == Set((10L, 1L), (10L, 2L), (11L, 4L)))
  }

  test("dedupApply: any smaller-id match drops the row; chains drop both followers") {
    // a~b (1 edit), b~c (1 edit), a~c (2 edits): b and c both drop
    val df = Seq(1L -> "abcde", 2L -> "abcdx", 3L -> "abcxx", 9L -> "unrelated")
      .toDF("id", "s")
    val kept = FuzzyDedup.dedupApply(df, "id", "s", maxDist = 1)
      .collect().map(_.getLong(0)).toSet
    assert(kept == Set(1L, 9L))
  }
}
