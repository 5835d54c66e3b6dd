package graft

import graft.operators.AsOf
import org.apache.spark.sql.functions._

/** As-of join: brute-force agreement and the join-free plan shape. */
class AsOfSpec extends GraftSuite {
  import spark.implicits._

  test("asof join matches a brute-force latest-at-or-before lookup") {
    val left = Seq(
      (1L, 10L, "a"), (1L, 20L, "b"), (1L, 5L, "c"),
      (2L, 15L, "d"), (3L, 9L, "e"))
      .toDF("key", "lt", "tag")
    val right = Seq(
      (1L, 10L, 100.0), (1L, 15L, 150.0), (2L, 1L, 7.0), (4L, 2L, 9.0))
      .toDF("key", "rt", "v")
    val out = AsOf.asofJoin(left, right, "key", "lt", "rt", Seq("v"))
      .select($"key", $"lt", $"tag", $"v")
      .collect().map(r => (r.getString(2), if (r.isNullAt(3)) null else r.getDouble(3))).toMap
    assert(out("a") == 100.0) // rt=10 <= lt=10 (inclusive)
    assert(out("b") == 150.0) // latest of 10, 15
    assert(out("c") == null)  // no right row at or before 5
    assert(out("d") == 7.0)
    assert(out("e") == null)  // key has no right rows at all
  }

  test("asof join plans with NO join operator — one key shuffle, linear pass") {
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val plan = SparkEntry.queries("q_asof_join")(spark, sf)
        .queryExecution.executedPlan.toString
      assert(!plan.contains("Join"), s"expected join-free union+window plan:\n$plan")
      assert(plan.contains("Window"), s"expected window carry-forward:\n$plan")
    } finally spark.conf.set("spark.sql.adaptive.enabled", "true")
  }

  test("q_asof_join: every event gets its user's latest completed hour or null") {
    val df = SparkEntry.queries("q_asof_join")(spark, sf)
    assert(df.count() == Tables.events(spark, sf).count())
    // a user's chronologically first event can have no completed prior hour
    assert(df.filter($"prev_hour_total".isNull).count() > 0)
  }

  test("forward asof attaches the earliest at-or-after row, inclusive at ties") {
    import graft.operators.AsOf
    val left = Seq((1L, 5L, 10L), (1L, 9L, 11L), (2L, 1L, 12L))
      .toDF("k", "t", "lid")
    val right = Seq((1L, 3L, "r3"), (1L, 7L, "r7"), (1L, 9L, "r9"))
      .toDF("k", "rt", "v")
    val out = AsOf.asofJoinForward(left, right, "k", "t", "rt", Seq("v"))
      .select($"lid", $"v").collect()
      .map(r => r.getLong(0) -> Option(r.getString(1))).toMap
    assert(out(10L).contains("r7"), "t=5 must see the NEXT right row (7)")
    assert(out(11L).contains("r9"), "equal timestamps are inclusive (>=)")
    assert(out(12L).isEmpty, "keys with no right rows stay null, not dropped")
  }
}
