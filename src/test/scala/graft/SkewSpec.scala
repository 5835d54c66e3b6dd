package graft

import graft.operators.Skew
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Salted two-phase top-k per key: result-identical to the plain window,
  * including under a pathological hot key. */
class SkewSpec extends GraftSuite {
  import spark.implicits._

  test("salted top-k equals the plain-window top-k on shipped data") {
    val o = Tables.orders(spark, sf)
    val salted = Skew.saltedTopKPerKey(o, "o_custkey",
      Seq($"o_totalprice".desc, $"o_orderkey".asc), $"o_orderkey", 3, 8)
      .select($"o_custkey", $"o_orderkey", $"rank")
    val w = Window.partitionBy($"o_custkey").orderBy($"o_totalprice".desc, $"o_orderkey".asc)
    val plain = o.withColumn("rank", row_number().over(w)).filter($"rank" <= 3)
      .select($"o_custkey", $"o_orderkey", $"rank")
    assertSameRows(salted, plain)
  }

  test("salted top-k survives a hot key (99% of rows on one key)") {
    // one key with 50k rows, 100 uniform keys with 5 rows each
    val hot = spark.range(50000).select(
      lit(0L).as("key"), $"id".as("uid"), (lit(50000) - $"id").cast("double").as("score"))
    val tail = spark.range(500).select(
      ($"id" % 100 + 1).as("key"), ($"id" + 100000).as("uid"), rand(7).as("score"))
    val df = hot.unionByName(tail)
    val salted = Skew.saltedTopKPerKey(df, "key",
      Seq($"score".desc, $"uid".asc), $"uid", 5, 16)
      .select($"key", $"uid", $"rank")
    val w = Window.partitionBy($"key").orderBy($"score".desc, $"uid".asc)
    val plain = df.withColumn("rank", row_number().over(w)).filter($"rank" <= 5)
      .select($"key", $"uid", $"rank")
    assertSameRows(salted, plain)
    // the hot key's phase-2 input is bounded: saltBuckets * k, not 50k
    assert(salted.filter($"key" === 0).count() == 5)
  }

  test("plain-window top-k plans a WindowGroupLimit (rank pushdown proven)") {
    // the mechanism that makes the UNSALTED top-k-per-key viable at scale:
    // Spark's InferWindowGroupLimit keeps only k rows per key on the map
    // side BEFORE the window shuffle, so the exchange carries ~k·keys rows
    // instead of the full table. The salted path (above) remains the answer
    // for a single hot key; this proves the default path isn't naive either.
    val w = Window.partitionBy($"o_custkey").orderBy($"o_totalprice".desc, $"o_orderkey".asc)
    val topk = Tables.orders(spark, sf)
      .withColumn("rank", row_number().over(w)).filter($"rank" <= 3)
    topk.queryExecution.toRdd.count()
    // node-collect can't reach inside materialized AQE stages, but the
    // executed plan's treeString renders stage interiors — assert there
    val plan = topk.queryExecution.executedPlan.toString
    assert("WindowGroupLimit .*Partial".r.findFirstIn(plan).isDefined,
      s"expected a PARTIAL (pre-shuffle) WindowGroupLimit in:\n$plan")
    assert("WindowGroupLimit .*Final".r.findFirstIn(plan).isDefined,
      s"expected a FINAL WindowGroupLimit in:\n$plan")
  }

  test("AQE splits a skewed join partition (skewJoin proven, not just claimed)") {
    // Skew.scala documents that AQE covers skewed JOINS (the salted path
    // covers windows) — prove it: a join whose shuffle puts ~97% of the
    // left side on one key must come out of AQE as a skew-join with the
    // hot partition split, not one straggler reducer.
    import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
    import org.apache.spark.sql.execution.joins.SortMergeJoinExec
    val keys = Seq(
      "spark.sql.adaptive.skewJoin.enabled",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes",
      "spark.sql.autoBroadcastJoinThreshold")
    val saved = keys.map(k => k -> spark.conf.getOption(k)).toMap
    spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
    spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
    spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "262144")
    spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "65536")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val left = spark.range(200000).select(
        when($"id" < 195000, lit(0L)).otherwise($"id" % 64 + 1).as("key"),
        concat(lit("payload-"), $"id".cast("string"),
          lit("x" * 64)).as("payload"))
      val right = spark.range(65).select($"id".as("key"), lit("dim").as("d"))
      val joined = left.join(right, "key")
      val n = joined.queryExecution.toRdd.count()
      assert(n == 200000L)
      val finalPlan = joined.queryExecution.executedPlan match {
        case a: AdaptiveSparkPlanExec => a.executedPlan
        case p => p
      }
      // the join sits inside a QueryStageExec, whose wrapped plan is not
      // in `children` — collect the stages' plans explicitly
      val stagePlans = finalPlan +: finalPlan.collect {
        case qs: org.apache.spark.sql.execution.adaptive.QueryStageExec => qs.plan
      }
      val skewJoins = stagePlans.flatMap(_.collect {
        case j: SortMergeJoinExec if j.isSkewJoin => j
      })
      assert(skewJoins.nonEmpty,
        s"expected AQE to mark the join as skew-optimized; final plan:\n$finalPlan")
    } finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  test("join-size prediction is exact on the real join") {
    // the query ships ONLY the formula (the driver's DuckDB oracle
    // materializes the real join); this spec is the Spark-side twin of
    // that check, on the fixture-bounded join
    val predicted = SparkEntry.queries("q_join_size")(spark, sf)
      .collect().head.getLong(0)
    val actual = Tables.orders(spark, sf)
      .join(Tables.lineitem(spark, sf),
        org.apache.spark.sql.functions.col("o_orderkey") ===
          org.apache.spark.sql.functions.col("l_orderkey"))
      .count()
    assert(predicted == actual,
      s"Σ n_a·n_b must equal the joined row count: $predicted vs $actual")
    assert(predicted == Tables.lineitem(spark, sf).count(),
      "orderkey is unique in orders, so the join size IS the lineitem count")
  }

  test("skew report: accounting identities against recomputed key stats") {
    import org.apache.spark.sql.functions._
    val rows = SparkEntry.queries("q_skew_report")(spark, sf).collect()
    assert(rows.map(_.getString(0)).toSeq ==
      Seq("l_orderkey", "l_partkey", "l_suppkey"))
    val li = Tables.lineitem(spark, sf)
    val n = li.count()
    rows.foreach { r =>
      val (nd, mx, ppm) = (r.getLong(1), r.getLong(2), r.getLong(3))
      assert(nd == li.select(col(r.getString(0))).distinct().count(),
        s"distinct-key count must match: $r")
      assert(mx >= n / nd, s"max key >= mean by pigeonhole: $r")
      assert(ppm == mx * 1000000L / n, s"share must be max/total in ppm: $r")
    }
  }
}
