package graft

import graft.operators.Graph
import org.apache.spark.sql.functions._

/** Integer PageRank: fixed points, hand-computed rounds, mass accounting,
  * and layout invariance of the iterative path. */
class GraphSpec extends GraftSuite {
  import spark.implicits._

  test("regular graphs are a fixed point: uniform rank stays exactly 1e6") {
    // 2-cycle and a triangle — every node gives and receives its full share
    val edges = Seq(
      (1L, 2L), (2L, 1L),
      (10L, 11L), (11L, 12L), (12L, 10L))
      .toDF("src", "dst")
    val out = Graph.pageRank(edges, iters = 4).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out.values.forall(_ == Graph.RankUnit),
      s"regular graph must hold the uniform fixed point exactly: $out")
  }

  test("star graph: hand-computed integer ranks after one round") {
    // center 1 <-> leaves 2,3,4 (symmetrized): center outdeg 3, leaves 1
    // round 1: center gets 150000 + 85*(3*1000000) DIV 100 = 2700000
    //          each leaf gets 150000 + 85*(1000000 DIV 3) DIV 100
    //            = 150000 + 85*333333 DIV 100 = 150000 + 283333 = 433333
    val edges = Seq((1L, 2L), (1L, 3L), (1L, 4L), (2L, 1L), (3L, 1L), (4L, 1L))
      .toDF("src", "dst")
    val out = Graph.pageRank(edges, iters = 1).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out == Map(1L -> 2700000L, 2L -> 433333L, 3L -> 433333L,
      4L -> 433333L), s"got $out")
  }

  test("rank mass is conserved up to integer truncation, never created") {
    val out = SparkEntry.queries("q_pagerank")(spark, sf)
    val n = out.count()
    val total = out.agg(sum($"rank")).head().getLong(0)
    val seeded = n * Graph.RankUnit
    assert(total <= seeded, "truncation can only lose mass")
    // each node loses < 100 units to the damping DIV plus < outdeg*1
    // per share DIV per round; bound generously
    assert(total > seeded - n * 2000L * Graph.PageRankIters,
      s"lost too much mass: $total of $seeded over $n nodes")
  }

  test("pageRank is layout-invariant: bit-identical ranks after repartition") {
    val pairs = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 1L), (1L, 3L))
    val edges = (pairs ++ pairs.map(_.swap)).toDF("src", "dst")
    val a = canon(Graph.pageRank(edges, iters = 5))
    val b = canon(Graph.pageRank(edges.repartition(7), iters = 5))
    assert(a == b, "integer ranks must not depend on partitioning")
  }

  test("personalized pageRank: mass stays near the seed, zero-rank tail dropped") {
    // path graph 1-2-3-4 symmetrized, seed = {1}: after 1 round only
    // node 2 received mass (seed's single out-edge), node 1 keeps the
    // restart mass; 3 and 4 unreached -> filtered out
    val pairs = Seq((1L, 2L), (2L, 3L), (3L, 4L))
    val edges = (pairs ++ pairs.map(_.swap)).toDF("src", "dst")
    val seeds = Seq(1L).toDF("node")
    val r1 = Graph.personalizedPageRank(edges, seeds, iters = 1)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val unit = Graph.RankUnit
    assert(r1 == Map(
      1L -> unit * 15 / 100, // restart mass only (2 had rank 0)
      2L -> (unit * 85 / 100))) // 85% of the seed's whole rank
    // more rounds reach further; total mass never exceeds seeded mass
    val r3 = Graph.personalizedPageRank(edges, seeds, iters = 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(r3.keySet == Set(1L, 2L, 3L, 4L))
    assert(r3.values.sum <= unit,
      "personalized mass is seeded once and only damped")
    // synchronous finite iteration oscillates on a path (mass waves
    // outward and reflects), so per-node ordering past the first hop is
    // round-parity-dependent — the stable claim is that the seed's
    // neighborhood dominates the tail
    assert(r3(2L) > r3(3L) && r3(2L) > r3(4L),
      "the seed-adjacent node must outrank the tail")
    // layout-invariance (the pageRank integer-iteration argument)
    assert(canon(Graph.personalizedPageRank(edges, seeds, iters = 3)) ==
      canon(Graph.personalizedPageRank(edges.repartition(5), seeds, iters = 3)))
  }

  test("broadcast and shuffled-hash per-round plans emit bit-identical results") {
    // the BroadcastNodeLimit size switch picks the plan automatically at
    // runtime; this pins that BOTH plans — the small-graph broadcast and
    // the 100-TB shuffle-on-src Pregel shape — compute the same integer
    // iteration, so the switch is plan-only (and CORRECTNESS rows are
    // immune to where the threshold lands)
    val pairs = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 1L), (1L, 3L),
      (5L, 1L), (2L, 5L))
    val edges = (pairs ++ pairs.map(_.swap)).toDF("src", "dst")
    assert(canon(Graph.pageRank(edges, broadcastRanks = Some(true))) ==
      canon(Graph.pageRank(edges, broadcastRanks = Some(false))))
    assert(canon(Graph.labelPropagation(edges, broadcastLabels = Some(true))) ==
      canon(Graph.labelPropagation(edges, broadcastLabels = Some(false))))
    val directed = pairs.toDF("src", "dst")
    assert(canon(Graph.hits(directed, broadcastScores = Some(true))) ==
      canon(Graph.hits(directed, broadcastScores = Some(false))))
    val seeds = Seq(1L).toDF("node")
    assert(canon(Graph.bfsDepth(edges, seeds, broadcastFrontier = Some(true))) ==
      canon(Graph.bfsDepth(edges, seeds, broadcastFrontier = Some(false))))
  }

  test("hub outranks leaves in the interaction graph") {
    val out = SparkEntry.queries("q_pagerank")(spark, sf).collect()
    val (custs, supps) = out.partition(_.getLong(0) < Graph.SupplierOffset)
    assert(custs.nonEmpty && supps.nonEmpty)
    // suppliers are few and highly connected -> their mean rank must
    // exceed the customer mean (structural sanity, not a tuned number)
    def mean(rs: Array[org.apache.spark.sql.Row]) =
      rs.map(_.getLong(1)).sum.toDouble / rs.length
    assert(mean(supps) > mean(custs),
      s"supplier hubs should outrank customers: ${mean(supps)} vs ${mean(custs)}")
  }

  test("label propagation: disjoint cliques converge to their minimum id") {
    def sym(pairs: (Long, Long)*) =
      (pairs ++ pairs.map(p => (p._2, p._1))).toDF("src", "dst")
    val edges = sym((1L, 2L), (2L, 3L), (1L, 3L),
      (10L, 11L), (11L, 12L), (10L, 12L))
    val out = Graph.labelPropagation(edges, iters = 3).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out == Map(1L -> 1L, 2L -> 1L, 3L -> 1L,
      10L -> 10L, 11L -> 10L, 12L -> 10L), s"got $out")
  }

  test("label propagation is layout-invariant and tie-breaks deterministically") {
    val edges = Seq((1L, 2L), (2L, 1L), (3L, 2L), (2L, 3L), (4L, 2L), (2L, 4L))
      .toDF("src", "dst")
    val a = canon(Graph.labelPropagation(edges, iters = 4))
    val b = canon(Graph.labelPropagation(edges.repartition(5), iters = 4))
    assert(a == b, "LPA must be bit-identical on any partitioning")
  }

  private def sym(pairs: Seq[(Long, Long)]) =
    (pairs ++ pairs.map(_.swap)).toDF("src", "dst")

  test("k-core peel: clique survives, chain peels, rounds cascade") {
    // triangle {1,2,3} is a 2-core; chain 3-4-5 peels from the tail:
    // round 1 drops 5 (deg 1), round 2 drops 4 — a 2-round cascade
    val edges = sym(Seq((1L, 2L), (2L, 3L), (1L, 3L), (3L, 4L), (4L, 5L)))
    val r1 = Graph.kcorePeel(edges, k = 2, rounds = 1)
      .select($"src").distinct().as[Long].collect().toSet
    assert(r1 == Set(1L, 2L, 3L, 4L), s"round 1 must drop only node 5: $r1")
    val r2 = Graph.kcorePeel(edges, k = 2, rounds = 2)
      .select($"src").distinct().as[Long].collect().toSet
    assert(r2 == Set(1L, 2L, 3L), s"round 2 must peel node 4: $r2")
    // fixpoint: a further round changes nothing on the surviving clique
    val r3 = Graph.kcorePeel(edges, k = 2, rounds = 3)
      .select($"src").distinct().as[Long].collect().toSet
    assert(r3 == r2)
  }

  test("k-core converged: fixpoint on the chain graph, empty when k exceeds the core") {
    val edges = sym(Seq((1L, 2L), (2L, 3L), (1L, 3L), (3L, 4L), (4L, 5L)))
    // fixpoint = the triangle (needs 2 peel rounds; batched polling must
    // detect the round-3 no-change and stop)
    val core = Graph.kcoreConverged(edges, k = 2)
      .select($"src").distinct().as[Long].collect().toSet
    assert(core == Set(1L, 2L, 3L), s"2-core fixpoint must be the triangle: $core")
    // k above the max core peels everything; empty must terminate cleanly
    assert(Graph.kcoreConverged(edges, k = 3).count() == 0L)
  }

  test("k-core converged matches fixed-round peel at the fixture's fixpoint distance") {
    // the q_kcore threshold frame on the sf fixture, replayed here
    val pairs = Tables.orders(spark, sf)
      .join(Tables.lineitem(spark, sf), $"o_orderkey" === $"l_orderkey")
      .select($"o_custkey".as("a"),
        ($"l_suppkey" + Graph.SupplierOffset).as("b")).distinct()
    val edges = pairs.select($"a".as("src"), $"b".as("dst"))
      .unionByName(pairs.select($"b".as("src"), $"a".as("dst")))
      .localCheckpoint(true)
    val k = 2
    val converged = canon(Graph.kcoreConverged(edges, k))
    // measured fixpoint distance: find the first round count where the
    // fixed-round peel stops changing, and require converged == that
    var r = 1
    var prev = canon(Graph.kcorePeel(edges, k, r))
    var cur = canon(Graph.kcorePeel(edges, k, r + 1))
    while (prev != cur && r < 20) { r += 1; prev = cur; cur = canon(Graph.kcorePeel(edges, k, r + 1)) }
    assert(prev == cur, "fixture fixpoint not reached within 20 rounds")
    assert(converged == cur,
      s"kcoreConverged must equal the fixed-round peel at its fixpoint (distance $r)")
  }

  test("k-core query: output degrees bounded by originals, peel monotone on fixture") {
    val out = SparkEntry.queries("q_kcore")(spark, sf).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      assert(r.getLong(2) <= r.getLong(1),
        s"core degree exceeds original at node ${r.getLong(0)}")
    }
    // the peel must actually bite on the fixture (some node dropped or
    // some degree reduced) — otherwise the gate is vacuous
    val full = Tables.orders(spark, sf)
      .join(Tables.lineitem(spark, sf), $"o_orderkey" === $"l_orderkey")
      .select($"o_custkey".as("a"),
        ($"l_suppkey" + Graph.SupplierOffset).as("b")).distinct()
    val nNodes = full.select($"a").unionByName(full.select($"b".as("a")))
      .distinct().count()
    assert(out.length < nNodes || out.exists(r => r.getLong(2) < r.getLong(1)),
      "3-round peel changed nothing — fixture makes the query vacuous")
  }

  test("assortativity: symmetric marginals, |r| <= 1, star graph hits -1") {
    val r = SparkEntry.queries("q_assortativity")(spark, sf).collect()(0)
    assert(r.getLong(1) == r.getLong(2), "Σdeg_src must equal Σdeg_dst")
    assert(r.getLong(4) == r.getLong(5), "Σdeg² marginals must match")
    val a = r.getDouble(6)
    assert(a >= -1.0 && a <= 1.0)
    // a bipartite interaction graph is disassortative
    assert(a < 0, s"customer-supplier graph should be disassortative: $a")
    // closed form: a perfect star has assortativity -1
    val star = sym((2L to 6L).map(i => (1L, i)))
    val deg = star.groupBy($"src").agg(count(lit(1)).as("d"))
      .select($"src".as("node"), $"d")
    val stats = star
      .join(deg.select($"node".as("src"), $"d".as("dx")), Seq("src"))
      .join(deg.select($"node".as("dst"), $"d".as("dy")), Seq("dst"))
      .agg(count(lit(1)).as("n"), sum($"dx").as("sx"), sum($"dy").as("sy"),
        sum($"dx" * $"dy").as("sxy"), sum($"dx" * $"dx").as("sxx"),
        sum($"dy" * $"dy").as("syy")).collect()(0)
    val (n, sx, sy, sxy, sxx, syy) = (stats.getLong(0).toDouble,
      stats.getLong(1).toDouble, stats.getLong(2).toDouble,
      stats.getLong(3).toDouble, stats.getLong(4).toDouble,
      stats.getLong(5).toDouble)
    val corr = (n * sxy - sx * sy) /
      (math.sqrt(n * sxx - sx * sx) * math.sqrt(n * syy - sy * sy))
    assert(math.abs(corr - (-1.0)) < 1e-12, s"star assortativity: $corr")
  }

  // ------------------------------------------------------------------- q_hits
  test("hits: hand-graph known answer after two integer rounds") {
    import graft.operators.Graph
    // h1 -> {a1, a2}, h2 -> {a1}
    val edges = Seq((1L, 10L), (1L, 11L), (2L, 10L)).toDF("src", "dst")
    val got = Graph.hits(edges).collect()
      .map(r => (r.getString(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(got(("hub", 1L)) == 1000000L)
    assert(got(("hub", 2L)) == 625000L)
    assert(got(("auth", 10L)) == 1000000L)
    assert(got(("auth", 11L)) == 600000L)
  }

  test("q_hits: scores bounded by the unit, each side max-normalized") {
    val rows = SparkEntry.queries("q_hits")(spark, sf).collect()
    val bySide = rows.groupBy(_.getString(0))
    assert(bySide.keySet == Set("hub", "auth"))
    bySide.foreach { case (side, rs) =>
      val scores = rs.map(_.getLong(2))
      assert(scores.max == graft.operators.Graph.HitsUnit, side)
      assert(scores.forall(v => v > 0L && v <= graft.operators.Graph.HitsUnit))
    }
  }

  // --------------------------------------------------------------- q_bfs_depth
  test("bfsDepth: hand chain gets exact hop distances, cut at maxDepth") {
    import graft.operators.Graph
    // undirected chain 1-2-3-4-5, seeded at 1
    val pairs = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L))
    val edges = (pairs ++ pairs.map(_.swap)).toDF("src", "dst")
    val seeds = Seq(1L).toDF("node")
    val got = Graph.bfsDepth(edges, seeds).collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(got == Map(1L -> 0, 2L -> 1, 3L -> 2, 4L -> 3),
      "node 5 is beyond maxDepth and must be omitted")
  }

  test("q_bfs_depth: seeds at depth 0, depths within bound") {
    import graft.operators.Graph
    val rows = SparkEntry.queries("q_bfs_depth")(spark, sf).collect()
    val depth0 = rows.filter(_.getInt(1) == 0).map(_.getLong(0)).sorted
    assert(depth0.nonEmpty && depth0.forall(_ <= Graph.BfsSeedMaxKey))
    assert(rows.forall(r => r.getInt(1) >= 0 && r.getInt(1) <= Graph.BfsMaxDepth))
  }

  // ------------------------------------------------------------- q_degree_dist
  test("q_degree_dist: CCDF starts at 1e6, non-increasing, nodes conserved") {
    val rows = SparkEntry.queries("q_degree_dist")(spark, sf).collect()
    assert(rows.nonEmpty)
    assert(rows.head.getLong(3) == 1000000L, "smallest bucket sees all nodes")
    val ccdfs = rows.map(_.getLong(3))
    assert(ccdfs.zip(ccdfs.tail).forall { case (a, b) => a >= b })
    assert(rows.map(_.getLong(1)).sum ==
      SparkEntry.queries("q_pagerank")(spark, sf).count(),
      "bucket node counts must sum to the graph's node count")
  }
  // -------------------------------------------------------------- q_modularity
  test("modularityScore: two-clique and one-community closed forms") {
    import graft.operators.Graph
    // two disjoint triangles, communities = the triangles:
    // Q = 2 * (3/6 - (6/12)^2) = 0.5; per-community contrib = |E|*6 - 36
    val tri = Seq((1L,2L),(2L,3L),(1L,3L),(10L,11L),(11L,12L),(10L,12L))
    val edges = tri.flatMap { case (a,b) => Seq((a,b),(b,a)) }
      .toDF("src", "dst")
    val comm = Seq(1L->0L, 2L->0L, 3L->0L, 10L->1L, 11L->1L, 12L->1L)
      .toDF("node", "comm")
    val out = Graph.modularityScore(edges, comm).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3),
        r.getDouble(4))).toMap
    assert(out(0L) == ((6L, 6L, 12L*6-36, 0.25)))
    assert(out(1L) == ((6L, 6L, 12L*6-36, 0.25)))
    assert(out(-1L)._4 == 0.5, "two equal cliques have Q = 1/2")

    // everything in ONE community: Q = 0 identically
    val one = Seq(1L->0L, 2L->0L, 3L->0L, 10L->0L, 11L->0L, 12L->0L)
      .toDF("node", "comm")
    val q1 = Graph.modularityScore(edges, one).collect()
      .filter(_.getLong(0) == -1L).head
    assert(q1.getLong(3) == 0L && q1.getDouble(4) == 0.0,
      "single-community modularity must be exactly zero")
  }

  test("q_modularity: total row is consistent and bounded") {
    val rows = SparkEntry.queries("q_modularity")(spark, sf).collect()
    val total = rows.filter(_.getLong(0) == -1L)
    assert(total.length == 1)
    val parts = rows.filter(_.getLong(0) >= 0L)
    assert(parts.map(_.getLong(3)).sum == total.head.getLong(3),
      "community contributions must sum to the total")
    val q = total.head.getDouble(4)
    assert(q > -0.5 && q < 1.0, s"modularity out of theoretical range: $q")
  }
  // ---------------------------------------------------------- q_resource_alloc
  test("q_resource_alloc: weighted wedge scores replayed in Scala") {
    import graft.operators.Graph
    val pairs = Tables.orders(spark, sf)
      .join(Tables.lineitem(spark, sf), $"o_orderkey" === $"l_orderkey")
      .select($"o_custkey", $"l_suppkey").distinct()
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val bySupp = pairs.groupBy(_._2).view.mapValues(_.map(_._1).distinct).toMap
    val scores = collection.mutable.Map[(Long, Long), (Long, Long)]()
    bySupp.foreach { case (_, custs0) =>
      val custs = custs0.sorted
      val d = custs.length.toLong
      if (d >= 2 && d <= Graph.MaxFanout) {
        val w = 1000000000L / d
        for (i <- custs.indices; j <- i + 1 until custs.length) {
          val k = (custs(i), custs(j))
          val (c, a) = scores.getOrElse(k, (0L, 0L))
          scores(k) = (c + 1, a + w)
        }
      }
    }
    val expected = scores.toSeq
      .sortBy { case ((u, v), (_, a)) => (-a, u, v) }.take(50)
    val rows = SparkEntry.queries("q_resource_alloc")(spark, sf).collect()
    assert(rows.length == expected.length)
    rows.zip(expected).foreach { case (r, ((u, v), (c, a))) =>
      assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)) ==
        ((u, v, c, a)))
    }
    // the inverse-log weight must be non-constant: pairs with the same
    // common-neighbor count must land different AA scores somewhere
    val byCount = scores.values.groupBy(_._1).view.mapValues(_.map(_._2).toSet)
    assert(byCount.exists(_._2.size > 1),
      "every equal-count pair scored identically — weight vacuous")
  }
  // -------------------------------------------------------------- q_conductance
  test("q_conductance: cut identities and the modularity frame agree") {
    val rows = SparkEntry.queries("q_conductance")(spark, sf).collect()
    assert(rows.nonEmpty)
    val mod = SparkEntry.queries("q_modularity")(spark, sf).collect()
      .filter(_.getLong(0) >= 0L)
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    rows.foreach { r =>
      val (c, dC, e2, cut, phi) = (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4))
      assert(cut == dC - e2, s"cut identity at $c")
      assert(mod(c) == ((dC, e2)), s"frames disagree at $c")
      assert(phi >= 0L && phi <= 1000000L, s"phi out of range at $c")
    }
    // nations trade globally: every nation community is mostly boundary
    assert(rows.forall(_.getLong(4) > 500000L),
      "bipartite trade graph should have high-conductance nation cuts")
  }
}
