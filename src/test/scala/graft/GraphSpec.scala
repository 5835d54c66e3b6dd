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
}
