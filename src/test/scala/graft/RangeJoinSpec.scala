package graft

import graft.operators.RangeJoin
import org.apache.spark.sql.functions._

/** Bucketed range join: agreement with the naive theta join, multi-match
  * semantics, and the equi-join (not nested-loop) plan shape. */
class RangeJoinSpec extends GraftSuite {
  import spark.implicits._

  private def points = Seq(
    (1L, 0.0), (2L, 5.0), (3L, 10.0), (4L, 19.999), (5L, 20.0),
    (6L, 37.5), (7L, 99.9), (8L, 100.0), (9L, 150.0))
    .toDF("pid", "x")

  // Overlapping intervals, boundary-aligned and not.
  private def intervals = Seq(
    ("a", 0.0, 20.0), ("b", 20.0, 100.0), ("c", 10.0, 40.0),
    ("d", 0.0, 200.0), ("e", 150.0, 160.0))
    .toDF("iv", "lo", "hi")

  test("bucketed point-in-interval matches the naive theta join") {
    val bucketed = RangeJoin.pointInInterval(points, "x", intervals, "lo", "hi",
      bucketWidth = 15.0)
    val naive = points.join(intervals, $"x" >= $"lo" && $"x" < $"hi")
    assertSameRows(
      bucketed.select($"pid", $"iv"),
      naive.select($"pid", $"iv"))
  }

  test("multi-match: a point inside k overlapping intervals yields k rows") {
    val out = RangeJoin.pointInInterval(points, "x", intervals, "lo", "hi", 15.0)
      .filter($"pid" === 3L).select($"iv").as[String].collect().sorted
    assert(out.toSeq == Seq("a", "c", "d")) // x=10 ∈ [0,20), [10,40), [0,200)
  }

  test("boundary semantics: lo inclusive, hi exclusive") {
    val out = RangeJoin.pointInInterval(points, "x", intervals, "lo", "hi", 15.0)
      .filter($"pid" === 5L).select($"iv").as[String].collect().sorted
    assert(out.toSeq == Seq("b", "c", "d")) // x=20.0 excluded from [0,20), in [20,100) and [10,40)
  }

  test("q_range_join plans an equi hash join, never a nested loop") {
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val plan = SparkEntry.queries("q_range_join")(spark, sf)
        .queryExecution.executedPlan.toString
      assert(!plan.contains("BroadcastNestedLoopJoin") && !plan.contains("CartesianProduct"),
        s"range join fell back to a nested loop:\n$plan")
      assert(plan.contains("HashJoin"), s"expected hash equi-join on bucket id:\n$plan")
    } finally spark.conf.set("spark.sql.adaptive.enabled", "true")
  }

  test("pointInInterval with no intervals yields no matches") {
    val pts = Seq((1L, 5.0)).toDF("pid", "x")
    val none = Seq.empty[(String, Double, Double)].toDF("iv", "lo", "hi")
    assert(RangeJoin.pointInInterval(pts, "x", none, "lo", "hi", 10.0).count() == 0)
  }
}
