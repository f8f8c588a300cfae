package graft

import org.apache.spark.sql.functions._

import graft.operators.EntityResolution

class EntityResolutionSpec extends SparkSpec {
  import spark.implicits._

  private def df(rows: (Long, String)*) = rows.toDF("id", "name")

  test("nameDictionary normalizes, counts, and takes min-id reps") {
    val d = EntityResolution.nameDictionary(
      df((3L, "  Cold   Anvil "), (1L, "cold anvil"), (2L, "Hot Gear"),
        (4L, "   ")),
      "id", "name")
    val got = d.orderBy("nm").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(got.toSeq === Seq(("cold anvil", 2L, 1L), ("hot gear", 1L, 2L)))
  }

  test("fuzzyMatchPairs: prefix block, suffix block, and nothing else") {
    val d = df(
      (1L, "cold anvil"), (2L, "old anvil"),   // suffix-blocked, dist 1
      (3L, "cold bolt"),                        // prefix-blocks with 1, dist 4 (> 3)
      (4L, "warm plate"), (5L, "warm plates"),  // prefix-blocked, dist 1
      (6L, "zzz unrelated"))
    val out = EntityResolution.fuzzyMatchPairs(d, "id", "name")
      .orderBy("nm_a", "nm_b").collect()
      .map(r => (r.getString(0), r.getString(1), r.getInt(2)))
    assert(out.toSeq === Seq(
      ("cold anvil", "old anvil", 1),
      ("warm plate", "warm plates", 1)))
  }

  test("fuzzyMatchPairs: pair caught by BOTH keys is emitted once") {
    // same prefix-3 AND same suffix-3 → the distinct must collapse the
    // duplicate candidate before the levenshtein filter
    val d = df((1L, "maple red"), (2L, "maples red"))
    val out = EntityResolution.fuzzyMatchPairs(d, "id", "name").collect()
    assert(out.length === 1 && out.head.getAs[Int]("dist") === 1)
  }

  test("fuzzyMatchPairs: block-size cap drops the adversarial block whole") {
    val bloat = (1L to 20L).map(i => (i, s"aaa filler $i"))
    val d = df(bloat :+ (100L -> "zzz zok") :+ (101L -> "zzz zk"): _*)
    val out = EntityResolution.fuzzyMatchPairs(d, "id", "name",
      maxDist = 3, blockLen = 3, maxBlockSize = 10).collect()
    // the 20-name "aaa" prefix block is dropped; the zzz pair survives
    assert(out.map(r => (r.getString(0), r.getString(1))).toSeq ===
      Seq(("zzz zk", "zzz zok")))
  }

  test("resolveEntities: transitive closure + singletons keep their rep") {
    val d = df(
      (5L, "cold anvil"), (2L, "old anvil"), (9L, "bold anvil"),
      // chain: cold↔old (1), old↔bold (1), cold↔bold (1) — one entity, rep 2
      (7L, "lonely name"))
    val out = EntityResolution.resolveEntities(d, "id", "name")
      .orderBy("nm").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(out.toSeq === Seq(
      ("bold anvil", 2L, 1L), ("cold anvil", 2L, 1L),
      ("lonely name", 7L, 1L), ("old anvil", 2L, 1L)))
  }

  test("sortedNeighborhood: window-bounded neighbor pairs with gaps") {
    val d = df(
      (1L, "cart one"), (2L, "cart onne"), (3L, "cart oone"),
      (4L, "zz far away"))
    // sorted: "cart one" < "cart onne" < "cart oone" < "zz far away"
    val out = EntityResolution.sortedNeighborhoodPairs(d, "id", "name",
        windowSize = 3)
      .orderBy("nm_a", "nm_b").collect()
      .map(r => (r.getString(0), r.getString(1), r.getInt(2), r.getInt(3)))
    assert(out.toSeq === Seq(
      ("cart one", "cart onne", 1, 1),
      ("cart one", "cart oone", 1, 2),
      ("cart onne", "cart oone", 1, 1)))
    // windowSize 2 drops the gap-2 pair
    val w2 = EntityResolution.sortedNeighborhoodPairs(d, "id", "name",
      windowSize = 2).collect()
    assert(w2.length === 2)
  }

  test("sortedNeighborhood: multi-partition execution matches single-partition") {
    // 26 names, forced across 5 range partitions — including ranges
    // SHORTER than windowSize-1, the case a boundary-strip formulation
    // would miss (a pair spanning two ranges ahead); the global-index
    // equi-join must find every pair a 1-partition run finds
    val names = ('a' to 'z').map(c => s"$c$c name x")
    val d = df(names.zipWithIndex.map { case (n, i) => ((i + 1).toLong, n) }: _*)
    def run(p: Int) = EntityResolution.sortedNeighborhoodPairs(
        d, "id", "name", windowSize = 4, maxDist = 3,
        numPartitions = Some(p))
      .orderBy("nm_a", "nm_b").collect()
      .map(r => (r.getString(0), r.getString(1), r.getInt(2), r.getInt(3)))
      .toSeq
    val multi = run(5)
    assert(multi === run(1))
    // every adjacent pair within dist 3 exists: 25 gap-1 + 0 gap-2/3
    // (distinct letters differ in 2 positions of an 9-char string → the
    // gap-1 distance is 2; gap-2+ pairs still differ by 2 — all kept)
    assert(multi.count(_._4 == 1) === 25)
    assert(multi.size === 25 + 24 + 23)
  }

  test("resolveEntities: no matches → every name its own entity") {
    val d = df((1L, "alpha one"), (2L, "beta two"), (3L, "gamma three"))
    val out = EntityResolution.resolveEntities(d, "id", "name")
      .orderBy("nm").collect().map(r => (r.getString(0), r.getLong(1)))
    assert(out.toSeq ===
      Seq(("alpha one", 1L), ("beta two", 2L), ("gamma three", 3L)))
  }
}
