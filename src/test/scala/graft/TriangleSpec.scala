package graft

import graft.operators.Graph
import org.apache.spark.sql.functions._

/** Triangle counting: hand-computed graphs, orientation invariance, and
  * the degree-oriented wedge formulation's exactness. */
class TriangleSpec extends GraftSuite {
  import spark.implicits._

  private def counts(edges: Seq[(Long, Long)]): Map[Long, Long] =
    Graph.triangleCounts(edges.toDF("u", "v")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("triangle, path, and star: hand-computed per-node counts") {
    // K3 — every node in exactly 1 triangle
    assert(counts(Seq((1L, 2L), (2L, 3L), (1L, 3L))) ==
      Map(1L -> 1L, 2L -> 1L, 3L -> 1L))
    // path a-b-c — no triangle, but all nodes present with 0
    assert(counts(Seq((1L, 2L), (2L, 3L))) ==
      Map(1L -> 0L, 2L -> 0L, 3L -> 0L))
    // star center-leaves — no triangle
    assert(counts(Seq((9L, 1L), (9L, 2L), (9L, 3L))) ==
      Map(9L -> 0L, 1L -> 0L, 2L -> 0L, 3L -> 0L))
  }

  test("K4: each node sits in C(3,2)=3 triangles") {
    val k4 = for (a <- 1L to 4L; b <- (a + 1) to 4L) yield (a, b)
    assert(counts(k4) == (1L to 4L).map(_ -> 3L).toMap)
  }

  test("duplicate edges, reversed orientation, self-loops are normalized") {
    val messy = Seq((1L, 2L), (2L, 1L), (2L, 3L), (3L, 2L), (3L, 1L),
      (1L, 1L), (2L, 2L))
    assert(counts(messy) == Map(1L -> 1L, 2L -> 1L, 3L -> 1L))
  }

  test("two triangles sharing an edge: shared nodes count both") {
    // {1,2,3} and {2,3,4} share edge 2-3
    val g = Seq((1L, 2L), (2L, 3L), (1L, 3L), (2L, 4L), (3L, 4L))
    assert(counts(g) == Map(1L -> 1L, 2L -> 2L, 3L -> 2L, 4L -> 1L))
  }

  test("q_triangle_count: 3*total triangle incidences, zeros preserved") {
    val out = SparkEntry.queries("q_triangle_count")(spark, sf)
    val incidences = out.agg(sum($"n_tri")).head().getLong(0)
    assert(incidences % 3 == 0,
      s"per-node counts must sum to 3x the triangle total, got $incidences")
    assert(incidences > 0, "co-purchase graph at sf0.001 should close triangles")
  }
}
