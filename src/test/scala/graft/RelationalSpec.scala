package graft

import graft.operators.Relational
import org.apache.spark.sql.functions._

/** Specs for the relational parity operators (SURVEY.md §2) — semantics
  * and plan-shape (pushdown/broadcast) checks the oracle can't express. */
class RelationalSpec extends GraftSuite {
  import spark.implicits._

  private def run(name: String) =
    SparkEntry.queries(name)(spark, sf)

  // (the all-queries rows smoke check lives in RowCheckSpec, which also
  // knows the empty-by-design disagreement gates — not duplicated here)

  test("flagship entry returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every query name has distinct, snake_case identity") {
    val names = SparkEntry.all.map(_.name)
    assert(names.distinct.size == names.size)
    names.foreach(n => assert(n.matches("[a-z0-9_]+"), s"bad name $n"))
  }

  test("latest-per-key: join and window formulations agree (modulo ties)") {
    // window dedups ties; join keeps them — dedup the join side the same
    // way before comparing (SURVEY.md §2.5).
    val viaJoin = run("q_latest_per_key_join")
      .withColumn("rn", row_number().over(
        org.apache.spark.sql.expressions.Window
          .partitionBy($"custkey").orderBy($"orderkey".desc)))
      .filter($"rn" === 1).drop("rn")
    val viaWindow = run("q_latest_per_key_window")
    assertSameRows(viaJoin, viaWindow)
  }

  test("point lookup pushes the predicate into the parquet scan") {
    val plan = run("q_point_lookup").queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters: [IsNotNull(c_custkey), EqualTo(c_custkey,42)]"),
      s"predicate not pushed:\n$plan")
  }

  test("point lookup prunes columns at the scan (ReadSchema)") {
    val plan = run("q_point_lookup").queryExecution.executedPlan.toString
    val readSchema = plan.linesIterator.mkString("\n")
    // only the 5 selected columns should be read
    assert(readSchema.contains("c_custkey") && !readSchema.contains("c_phone"),
      s"column pruning failed:\n$plan")
  }

  test("dimension-enrichment join broadcasts both dims (no fact shuffle)") {
    val plan = run("q_left_join_enrich").queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), s"expected broadcast joins:\n$plan")
    assert(!plan.contains("SortMergeJoin"), s"unexpected SMJ for dim join:\n$plan")
  }

  test("topk plans as TakeOrderedAndProject (no full global sort)") {
    val plan = run("q_topk").queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"), s"top-k not heap-based:\n$plan")
  }

  test("union entity-vs-avg: missing column becomes null in the avg row") {
    val rows = run("q_union_entity_vs_avg").collect()
    assert(rows.length == 2)
    val avgRow = rows.find(_.getString(0) == "Segment Average").get
    assert(avgRow.isNullAt(avgRow.fieldIndex("nationkey")))
  }

  test("unpivot emits (entity, metric, value) long form, 2 metrics per row") {
    val df = run("q_unpivot_compare")
    assert(df.columns.toSeq == Seq("entity", "metric", "value"))
    val counts = df.groupBy($"entity").count().collect()
    assert(counts.forall(_.getLong(1) == 2))
  }

  test("schema normalization is idempotent and matches the reference rule") {
    // reference rule: lower, spaces->_, strip non [a-z0-9_] (retrieval.py:23)
    assert(Relational.normalizeName("C CustKey") == "c_custkey")
    assert(Relational.normalizeName("Acct Bal!") == "acct_bal")
    val once = Relational.normalizeName("Total Debt ($)")
    assert(Relational.normalizeName(once) == once)
  }

  test("cast conform: non-numeric string casts to null (ANSI off), try_cast parity") {
    val df = run("q_cast_conform")
    assert(df.filter($"prio_num".isNotNull).count() == 0) // all 'N-XXX' priorities
    assert(df.schema("total_price").dataType.typeName == "double")
  }

  test("derived ratios: div-by-zero guarded to null, not error/inf") {
    val df = spark.range(1).select(
      (lit(1.0) / when(lit(0.0) === 0, lit(null)).otherwise(lit(0.0))).as("x"))
    assert(df.collect()(0).isNullAt(0))
  }

  test("json extract agrees with get_json_object formulation") {
    val viaRegex = run("q_json_extract").select($"event_id", $"k")
    val viaJson = Tables.events(spark, sf).select(
      $"event_id",
      get_json_object($"props", "$.k").cast("int").as("k"))
    assertSameRows(viaRegex, viaJson)
  }

  test("event window agg: hour buckets partition the event stream exactly") {
    val df = run("q_event_window_agg")
    val total = df.agg(sum($"n")).collect()(0).getLong(0)
    assert(total == Tables.events(spark, sf).count())
  }

  test("pivot round-trips the unpivot (wide == source)") {
    val wide = run("q_pivot_attrs")
    val src = Tables.customer(spark, sf).select(
      $"c_custkey".as("custkey"), $"c_mktsegment".as("mktsegment"),
      $"c_name".as("name"), $"c_nationkey".cast("string").as("nationkey"))
    assertSameRows(wide, src)
  }

  test("pivot with explicit values schedules no distinct-collection job") {
    // groupBy().pivot(col) without values triggers an eager collect of
    // distinct attrs — the explicit list keeps the plan a single agg
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val exchanges = run("q_pivot_status").queryExecution.executedPlan.collect {
        case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec => e
      }
      // Spark's two-phase pivot: agg by (month, status), pivot-agg by
      // month, final orderBy sort — exactly 3 exchanges, none of them a
      // driver-side distinct-values collection
      assert(exchanges.size <= 3, s"too many exchanges: ${exchanges.size}")
    } finally spark.conf.set("spark.sql.adaptive.enabled", "true")
  }

  test("full outer join keeps both unmatched sides with coalesced keys") {
    val df = run("q_outer_join_align")
    assert(df.filter($"custkey".isNull || $"month".isNull).count() == 0,
      "using-join keys must be coalesced, never null")
    assert(df.filter($"order_total".isNull).count() > 0, "lineitem-only months expected")
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("FullOuter"), s"expected full outer join:\n$plan")
  }

  test("date window anchor is broadcast, not shuffled") {
    val plan = run("q_date_window").queryExecution.executedPlan.toString
    assert(plan.contains("Broadcast"), s"anchor row not broadcast:\n$plan")
  }

  test("approx distinct stays within its advertised tolerance") {
    val rows = run("q_approx_distinct").collect()
    assert(rows.nonEmpty)
    rows.foreach(r => assert(r.getBoolean(2), s"estimate out of tolerance: $r"))
  }

  test("sliding windows double-count each event exactly (size/slide = 2)") {
    import org.apache.spark.sql.functions._
    val slid = run("q_sliding_window")
      .agg(sum(col("n"))).collect().head.getLong(0)
    val events = Tables.events(spark, sf).count()
    assert(slid == 2 * events,
      s"1h/30min hopping windows must hold each event twice: $slid vs $events")
  }
  // -------------------------------------------------------------- q_tpch_q3/q5
  test("tpch q3: date filters push to both scans; top-k plans without global sort") {
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val plan = SparkEntry.queries("q_tpch_q3")(spark, sf)
        .queryExecution.executedPlan.toString
      assert("PushedFilters: \\[[^\\]]*o_orderdate".r.findFirstIn(plan).isDefined,
        s"order-date filter must reach the orders scan:\n$plan")
      assert("PushedFilters: \\[[^\\]]*l_shipdate".r.findFirstIn(plan).isDefined,
        s"ship-date filter must reach the lineitem scan:\n$plan")
      assert(plan.contains("TakeOrderedAndProject"),
        s"top-10 must plan as TakeOrderedAndProject:\n$plan")
    } finally spark.conf.set("spark.sql.adaptive.enabled", "true")
  }

  test("tpch q5: snowflake dims broadcast; revenue ordering holds") {
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val df = SparkEntry.queries("q_tpch_q5")(spark, sf)
      val plan = df.queryExecution.executedPlan.toString
      assert("BroadcastHashJoin".r.findAllIn(plan).length >= 3,
        s"supplier/customer/nation dims should broadcast:\n$plan")
      val rows = df.collect()
      assert(rows.nonEmpty)
      val revs = rows.map(_.getDouble(1))
      assert(revs.zip(revs.tail).forall { case (a, b) => a >= b })
    } finally spark.conf.set("spark.sql.adaptive.enabled", "true")
  }
}
