package graft

import graft.operators.Analytics
import graft.functions.{TextFunctions, TextImpl}
import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String

/** Windowed analytics, rollup, decontamination, and hash sampling. */
class AnalyticsSpec extends GraftSuite {
  import spark.implicits._

  // ------------------------------------------------------- word n-gram hashes
  test("wordNGramSet at n=3 equals the trigram shingle set") {
    val texts = Seq("a b c d e f", "one two three", "x", "", "a a a a")
    texts.foreach { t =>
      val s = UTF8String.fromString(t)
      assert(TextImpl.wordNGramSet(s, 3).toLongArray().toSeq ==
        TextImpl.triGramSet(s).toLongArray().toSeq, s"text: '$t'")
    }
  }

  test("wordNGramSet: distinct n-grams hash distinctly, shared ones equal") {
    val a = TextImpl.wordNGramSet(UTF8String.fromString("p q r s t u v w x"), 8)
    val b = TextImpl.wordNGramSet(UTF8String.fromString("Z p q r s t u v w x Z"), 8)
    // overlapping window "p q r s t u v w" / "q r s t u v w x" hashes agree
    val shared = a.toLongArray().toSet.intersect(b.toLongArray().toSet)
    assert(shared.size == 2)
    // short text falls back to one whole-text hash
    assert(TextImpl.wordNGramSet(UTF8String.fromString("a b"), 8).numElements() == 1)
  }

  test("word_ngram_hashes codegen path equals the JVM implementation") {
    val df = Tables.documents(spark, sf).limit(20)
      .select($"text", TextFunctions.wordNgramHashes($"text", 8).as("g"))
    df.collect().foreach { r =>
      val expect = TextImpl.wordNGramSet(
        UTF8String.fromString(r.getString(0)), 8).toLongArray().toSeq
      assert(r.getSeq[Long](1) == expect)
    }
  }

  // ------------------------------------------------------------ decontaminate
  test("decontaminate removes exactly the docs sharing an n-gram") {
    val bench = Seq((100L, "the quick brown fox jumps over the lazy dog"))
      .toDF("doc_id", "text")
    val cand = Seq(
      (1L, "prefix words the quick brown fox jumps over the lazy dog suffix"),
      (2L, "a completely different document with no overlap at all here"),
      (3L, "short text"), // < n words: can never be contaminated
      (4L, "quick brown fox jumps over the lazy dog and keeps running on"))
      .toDF("doc_id", "text")
    val kept = Analytics.decontaminate(cand, bench, "text", "doc_id", n = 8)
      .select($"doc_id").as[Long].collect().sorted
    assert(kept.toSeq == Seq(2L, 3L))
  }

  test("decontaminate plans broadcast semi + anti joins, no shuffle of the corpus") {
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val plan = SparkEntry.queries("q_decontaminate")(spark, sf)
        .queryExecution.executedPlan.toString
      assert(plan.contains("BroadcastHashJoin") || plan.contains("BroadcastExchange"),
        s"expected broadcast joins:\n$plan")
      assert(!plan.contains("SortMergeJoin"),
        s"corpus must not shuffle for decontamination:\n$plan")
    } finally spark.conf.set("spark.sql.adaptive.enabled", "true")
  }

  // -------------------------------------------------------------- rolling avg
  test("rolling 3-month average and MoM delta on a hand-checked frame") {
    val rows = SparkEntry.queries("q_rolling_avg")(spark, sf)
      .filter($"o_custkey" === 1L).collect()
    assert(rows.nonEmpty)
    // first month: rolling avg == month total, delta null
    val first = rows.head
    assert(first.getDouble(2) == first.getDouble(3))
    assert(first.isNullAt(4))
    // every subsequent rolling avg is the mean of <= 3 trailing totals
    rows.sliding(3).foreach { w =>
      val frame = w.map(_.getDouble(2))
      val expect = frame.sum / frame.length
      assert(math.abs(w.last.getDouble(3) - expect) < 1e-6)
    }
  }

  // --------------------------------------------------------------- rollup agg
  test("rollup emits detail, subtotal, and grand-total levels consistently") {
    val out = SparkEntry.queries("q_rollup_agg")(spark, sf).collect()
    val grand = out.filter(r => r.isNullAt(0) && r.isNullAt(1))
    assert(grand.length == 1)
    val detail = out.filter(r => !r.isNullAt(0) && !r.isNullAt(1))
    val subtotals = out.filter(r => !r.isNullAt(0) && r.isNullAt(1))
    assert(grand.head.getLong(2) == detail.map(_.getLong(2)).sum)
    assert(subtotals.map(_.getLong(2)).sum == detail.map(_.getLong(2)).sum)
    // one shuffle: Expand feeds a single aggregate, no union of jobs
    val plan = SparkEntry.queries("q_rollup_agg")(spark, sf)
      .queryExecution.executedPlan.toString
    assert(plan.contains("Expand"), s"rollup should plan via Expand:\n$plan")
  }

  // ------------------------------------------------------------ multi-join agg
  test("5-way join: dimension chain broadcasts, date filter reaches the scan") {
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val qe = SparkEntry.queries("q_multi_join_agg")(spark, sf).queryExecution
      val plan = qe.executedPlan.toString
      val broadcasts = "BroadcastHashJoin".r.findAllIn(plan).length
      assert(broadcasts >= 3, s"region/nation/customer/orders chain should broadcast:\n$plan")
      assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoopJoin"))
      assert("PushedFilters: \\[[^\\]]*o_orderdate".r.findFirstIn(plan).isDefined,
        s"date window must push to the orders scan:\n$plan")
    } finally spark.conf.set("spark.sql.adaptive.enabled", "true")
  }

  // -------------------------------------------------------------- hash sample
  test("hash sampling is deterministic and stratified") {
    val q = SparkEntry.queries("q_hash_sample")(spark, sf)
    assertSameRows(q, SparkEntry.queries("q_hash_sample")(spark, sf))
    val docs = Tables.documents(spark, sf)
    val total = docs.groupBy($"lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val kept = q.groupBy($"lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    // en downsampled to ~16%, others ~50% — allow generous sf0.001 noise
    val enRate = kept.getOrElse("en", 0L).toDouble / total("en")
    assert(enRate > 0.02 && enRate < 0.35, s"en rate $enRate")
    val otherKept = kept.filter(_._1 != "en").values.sum.toDouble
    val otherTotal = total.filter(_._1 != "en").values.sum.toDouble
    val otherRate = otherKept / otherTotal
    assert(otherRate > 0.3 && otherRate < 0.7, s"other rate $otherRate")
  }

  test("decontaminate with an empty benchmark keeps every candidate") {
    val bench = Seq.empty[(Long, String)].toDF("doc_id", "text")
    val cand = Seq((1L, "some words repeated here over and over again ok"),
                   (2L, "short")).toDF("doc_id", "text")
    val kept = Analytics.decontaminate(cand, bench, "text", "doc_id", n = 8)
    assert(kept.count() == 2)
  }

  test("decontaminate benchmark-only n-grams never remove non-matching docs") {
    val bench = Seq((9L, "a b c d e f g h")).toDF("doc_id", "text")
    val cand = Seq((1L, "h g f e d c b a")).toDF("doc_id", "text") // reversed: no shared 8-gram
    assert(Analytics.decontaminate(cand, bench, "text", "doc_id", 8).count() == 1)
  }

  test("resample+ffill: dense spine, gaps carried forward, no null fills") {
    val out = SparkEntry.queries("q_resample_ffill")(spark, sf).collect()
    assert(out.nonEmpty)
    assert(out.forall(!_.isNullAt(3)), "first spine month always has data")
    // per key: months strictly increasing and contiguous
    out.groupBy(_.getLong(0)).foreach { case (_, rows) =>
      val months = rows.map(_.getString(1)).sorted
      val (y0, m0) = (months.head.take(4).toInt, months.head.drop(5).toInt)
      val expected = months.indices.map { i =>
        val t = y0 * 12 + (m0 - 1) + i
        f"${t / 12}%04d-${t % 12 + 1}%02d"
      }
      assert(months.toSeq == expected, s"spine not contiguous: ${months.take(5).toSeq}...")
    }
    // gap rows repeat the previous non-gap value
    out.groupBy(_.getLong(0)).foreach { case (_, rows) =>
      val sorted = rows.sortBy(_.getString(1))
      sorted.sliding(2).foreach {
        case Array(prev, cur) if cur.getBoolean(2) =>
          assert(cur.getDouble(3) == prev.getDouble(3), "gap must carry previous fill")
        case _ =>
      }
    }
  }

  test("ewma: matches a direct per-customer reimplementation; one Window op") {
    val df = SparkEntry.queries("q_ewma")(spark, sf)
    val rows = df.collect()
    assert(rows.nonEmpty)
    // direct reimplementation: group rows per customer in month order,
    // recompute the 16-term weighted sum in plain Scala longs
    val horizon = graft.operators.Analytics.EwmaHorizon
    rows.groupBy(_.getLong(0)).foreach { case (_, rs) =>
      val series = rs.sortBy(_.getString(1)).toIndexedSeq
      series.zipWithIndex.foreach { case (r, t) =>
        var (num, den) = (0L, 0L)
        for (j <- 0 until math.min(horizon, t + 1)) {
          val w = 1L << (horizon - 1 - j)
          num += series(t - j).getLong(2) * w
          den += w
        }
        assert(r.getLong(3) == num, s"num mismatch at $r")
        assert(r.getLong(4) == den, s"den mismatch at $r")
        assert(r.getDouble(5) == num.toDouble / den)
      }
    }
    // all 16 lags share one window spec → exactly one Window operator
    // (AQE's plan string prints Final AND Initial sections — count only
    // the final one)
    val plan = df.queryExecution.executedPlan.toString
      .split("== Initial Plan ==")(0)
    val windowOps = "(?m)^\\s*[+:*-]*\\s*Window ".r.findAllIn(plan).size
    assert(windowOps <= 1, s"expected a single Window operator:\n$plan")
  }

  test("ewma responds faster to a level shift than the flat rolling mean") {
    // planted series: 10 months at 100 cents then a jump to 10100 —
    // recency weighting must close most of the gap in the first month
    import org.apache.spark.sql.functions.col
    val rows = (0 until 10).map(m => (1L, f"2020-${m + 1}%02d", 100L)) ++
      Seq((1L, "2020-11", 10100L))
    val monthly = rows.toDF("o_custkey", "month", "cents")
    // reuse the operator's weighting directly via a local recompute of the
    // final row: half the weight mass sits on the newest point
    val horizon = graft.operators.Analytics.EwmaHorizon
    var (num, den) = (0L, 0L)
    val series = rows.map(_._3)
    val t = series.size - 1
    for (j <- 0 until math.min(horizon, t + 1)) {
      val w = 1L << (horizon - 1 - j)
      num += series(t - j) * w
      den += w
    }
    val ewmaLast = num.toDouble / den
    val rollingLast = (series.takeRight(3).sum).toDouble / 3
    assert(ewmaLast > 5000, s"ewma $ewmaLast should jump with the signal")
    assert(rollingLast < ewmaLast, "flat 3-month mean lags the ewma")
  }

  test("interpolation: gaps equal the exact linear value; real points keep theirs") {
    import org.apache.spark.sql.types.{DecimalType, DoubleType}
    // independent recomputation of the monthly totals (same exact-decimal
    // routing), so non-gap rows are checked against ground truth — a
    // formula error mirrored into the oracle SQL can't hide here
    val truth = Tables.orders(spark, sf)
      .groupBy($"o_custkey", date_format($"o_orderdate", "yyyy-MM").as("month"))
      .agg(sum($"o_totalprice".cast(DecimalType(28, 2))).cast(DoubleType).as("t"))
      .collect().map(r => (r.getLong(0), r.getString(1)) -> r.getDouble(2)).toMap
    val rows = SparkEntry.queries("q_interpolate")(spark, sf).collect()
      .groupBy(_.getLong(0))
    var gaps = 0
    rows.foreach { case (key, rs) =>
      val sorted = rs.sortBy(_.getString(1))
      sorted.zipWithIndex.foreach { case (r, i) =>
        if (!r.getBoolean(2)) {
          assert(r.getDouble(3) == truth((key, r.getString(1))),
            s"real point $key/${r.getString(1)} altered")
        } else {
          gaps += 1
          val pi = (i - 1 to 0 by -1).find(j => !sorted(j).getBoolean(2)).get
          val ni = (i + 1 until sorted.length).find(j => !sorted(j).getBoolean(2)).get
          val (pv, nv) = (sorted(pi).getDouble(3), sorted(ni).getDouble(3))
          val expect = pv + (nv - pv) * (i - pi) / (ni - pi)
          assert(math.abs(r.getDouble(3) - expect) <= math.ulp(expect),
            s"gap $key/${r.getString(1)}: got ${r.getDouble(3)}, expect $expect")
        }
      }
    }
    assert(gaps > 0, "data must contain gaps for this test to mean anything")
  }

  test("cube: every grouping set present; subtotals re-aggregate the detail") {
    val out = SparkEntry.queries("q_cube_agg")(spark, sf).collect()
    val byGid = out.groupBy(_.getLong(2))
    assert(byGid.keySet == Set(0L, 1L, 2L, 3L),
      s"CUBE over 2 keys must emit 4 grouping sets, got ${byGid.keySet}")
    // grand total (gid=3) equals the sum of the detail level (gid=0)
    val detailN = byGid(0L).map(_.getLong(3)).sum
    val grandN = byGid(3L).map(_.getLong(3)).sum
    assert(byGid(3L).size == 1 && detailN == grandN,
      s"grand total must re-aggregate detail: $detailN vs $grandN")
    // per-status subtotal rows (gid=1: priority nulled) match detail sums
    val perStatusDetail = byGid(0L).groupBy(_.getString(0))
      .view.mapValues(_.map(_.getLong(3)).sum).toMap
    val perStatusSub = byGid(1L).map(r => r.getString(0) -> r.getLong(3)).toMap
    assert(perStatusSub == perStatusDetail,
      s"per-status subtotals diverge: $perStatusSub vs $perStatusDetail")
  }

  test("seasonality: integer index consistent across columns; months complete") {
    val out = SparkEntry.queries("q_seasonality")(spark, sf).collect()
    assert(out.map(_.getInt(0)).toSeq == (1 to 12),
      "all 12 calendar months must appear in order")
    val overall = out.map(_.getLong(4)).distinct
    assert(overall.length == 1, s"overall average must be one constant: $overall")
    out.foreach { r =>
      val (n, cents, avg, idx) =
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(5))
      assert(avg == cents / n, s"avg_cents must be integer cents/n in row $r")
      assert(idx == avg * 1000000L / overall.head,
        s"index_ppm must be exact integer ppm in row $r")
    }
  }

  test("range window: trailing-30-day sum matches a direct per-row recompute") {
    val rows = SparkEntry.queries("q_range_window")(spark, sf).collect()
      .map(r => (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    val byCust = rows.groupBy(_._1)
    rows.take(500).foreach { case (cust, day, _, trail) =>
      val expect = byCust(cust)
        .filter(t => t._2 >= day - 29 && t._2 <= day).map(_._3).sum
      assert(trail == expect,
        s"trailing sum for cust=$cust day=$day: got $trail want $expect")
    }
    // RANGE vs ROWS distinction: same-day peers must share the same frame
    val peers = rows.groupBy(t => (t._1, t._2)).filter(_._2.length > 1)
    peers.foreach { case ((c, d), g) =>
      assert(g.map(_._4).distinct.length == 1,
        s"same-day orders for cust=$c day=$d must see identical trailing sums")
    }
  }

  test("equi-depth histogram: depths within 1, bounds nest, mass adds up") {
    val out = SparkEntry.queries("q_equidepth_hist")(spark, sf).collect()
    out.groupBy(_.getString(0)).foreach { case (seg, bs) =>
      assert(bs.map(_.getInt(1)).sorted.toSeq == (1 to 10),
        s"$seg must have buckets 1..10")
      val ns = bs.map(_.getLong(2))
      assert(ns.max - ns.min <= 1, s"$seg depths must differ by at most 1: $ns")
      val ordered = bs.sortBy(_.getInt(1))
      ordered.sliding(2).foreach { case Array(a, b) =>
        assert(a.getDouble(4) <= b.getDouble(3),
          s"$seg bucket bounds must not overlap")
      case _ => ()
      }
    }
  }

  test("collocations: support floor holds and pair counts bound unigram counts") {
    val rows = SparkEntry.queries("q_collocations")(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (np, n1, n2) = (r.getLong(2), r.getLong(3), r.getLong(4))
      assert(np >= 5, s"support floor: $r")
      assert(np <= n1 && np <= n2, s"a pair can't outnumber its words: $r")
    }
    val lifts = rows.map(_.getLong(5)).toSeq
    assert(lifts == lifts.sorted.reverse, "must rank by lift desc")
  }

  test("basket rules: confidence bounded by 1e6, pair support bounds item support") {
    val rows = SparkEntry.queries("q_basket_rules")(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (np, na, nb) = (r.getLong(2), r.getLong(3), r.getLong(4))
      assert(np <= na && np <= nb, s"pair can't outnumber its items: $r")
      assert(r.getLong(6) <= 1000000L && r.getLong(7) <= 1000000L,
        s"confidence is a probability in ppm: $r")
      assert(r.getLong(0) < r.getLong(1),
        s"pairs are canonical a < b: $r")
    }
  }

  test("forecast backtest: every priority series backtests the same window") {
    val rows = SparkEntry.queries("q_forecast_backtest")(spark, sf).collect()
    assert(rows.length == 5)
    val ns = rows.map(_.getLong(1))
    assert(ns.forall(_ > 12),
      "every priority must have a year-deep backtest window")
    assert(ns.max - ns.min <= 12,
      s"sibling series may differ only by sparse-month gaps: ${ns.toSeq}")
    rows.foreach { r =>
      assert(r.getLong(2) >= 0 && r.getLong(3) >= 0, s"MAE is nonnegative: $r")
    }
  }

  test("clv: discounting never exceeds nominal spend, factors stay positive") {
    val rows = SparkEntry.queries("q_clv")(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (spend, clv) = (r.getLong(1), r.getLong(2))
      assert(clv <= spend, s"a discount factor <= 1 cannot inflate value: $r")
      assert(clv > 0 && spend > 0, s"positive spend must keep positive CLV: $r")
      // 80 months at 1%/month still retains > 40% of value
      assert(clv * 5 >= spend * 2, s"discount deeper than the horizon allows: $r")
    }
  }

  test("time-weighted average: accounting identity and value bounds") {
    val rows = SparkEntry.queries("q_time_weighted_avg")(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (wt, days, twa) = (r.getDouble(1), r.getLong(2), r.getDouble(4))
      assert(days > 0, s"spans must carry positive duration: $r")
      assert(twa == wt / days, s"twa must be the single division: $r")
    }
  }

  test("islands: events partition into islands, gap law holds at boundaries") {
    import graft.operators.Analytics
    val out = SparkEntry.queries("q_islands")(spark, sf).collect()
    val perUser = out.groupBy(_.getLong(0))
    val events = Tables.events(spark, sf).count()
    assert(out.map(_.getLong(2)).sum == events,
      "islands must partition every event")
    val gapUs = Analytics.IslandGapMin * 60L * 1000000L
    perUser.foreach { case (_, rows) =>
      val sorted = rows.sortBy(_.getLong(1))
      assert(sorted.map(_.getLong(1)).toSeq == (1L to sorted.length).toSeq,
        "island ids must be contiguous per user")
      sorted.sliding(2).foreach {
        case Array(a, b) =>
          assert(b.getLong(3) - a.getLong(4) > gapUs,
            s"consecutive islands must be separated by more than the gap: $a | $b")
        case _ => ()
      }
      sorted.foreach(r => assert(r.getLong(4) >= r.getLong(3),
        s"island end must not precede start: $r"))
    }
  }

  test("debounce: kept + dropped = total, every type accounted") {
    val rows = SparkEntry.queries("q_debounce")(spark, sf).collect()
    assert(rows.length == 5, "all five event types must appear")
    rows.foreach { r =>
      assert(r.getLong(1) == r.getLong(2) + r.getLong(3),
        s"retention accounting must close: $r")
      assert(r.getLong(2) >= 1, s"each (user, type) keeps its first event: $r")
    }
  }

  // ----------------------------------------------------------------- q_markov
  test("q_markov: row totals close and transitions == events - users") {
    val rows = SparkEntry.queries("q_markov")(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.groupBy(_.getString(0)).foreach { case (_, rs) =>
      assert(rs.map(_.getLong(2)).sum == rs.head.getLong(3),
        "transition counts must sum to the from-state row total")
    }
    rows.foreach(r => assert(r.getLong(4) >= 0L && r.getLong(4) <= 1000000L))
    val ev = Tables.events(spark, sf)
    val expected = ev.count() - ev.select("user_id").distinct().count()
    assert(rows.map(_.getLong(2)).sum == expected,
      "every consecutive pair contributes exactly one transition")
  }

  // ------------------------------------------------------------------ q_cusum
  test("q_cusum: statistic recomputed in Scala from the monthly series") {
    import org.apache.spark.sql.types.DecimalType
    val rows = SparkEntry.queries("q_cusum")(spark, sf).collect()
    assert(rows.nonEmpty)
    val monthly = Tables.orders(spark, sf)
      .join(Tables.customer(spark, sf), $"o_custkey" === $"c_custkey")
      .groupBy($"c_mktsegment",
        date_format($"o_orderdate", "yyyy-MM").as("month"))
      .agg((sum($"o_totalprice".cast(DecimalType(28, 2))) * 100)
        .cast("long").as("cents"))
      .collect()
      .groupBy(_.getString(0))
    rows.foreach { r =>
      val series = monthly(r.getString(0))
        .map(x => (x.getString(1), x.getLong(2))).sortBy(_._1)
      val n = series.size.toLong
      val s = series.map(_._2).sum
      var prefix = 0L
      val ds = series.zipWithIndex.map { case ((m, c), idx) =>
        prefix += c
        (m, math.abs(n * prefix - (idx + 1L) * s))
      }
      val dmax = ds.map(_._2).max
      val cpMonth = ds.filter(_._2 == dmax).map(_._1).min
      assert(r.getLong(1) == n && r.getLong(2) == s)
      assert(r.getLong(3) == dmax, s"cusum_max for ${r.getString(0)}")
      assert(r.getString(4) == cpMonth, s"cp_month for ${r.getString(0)}")
    }
  }

  // ------------------------------------------------------------ q_kmv_distinct
  test("q_kmv_distinct: sketch replayed in Scala from the raw pairs") {
    import graft.operators.Analytics
    val rows = SparkEntry.queries("q_kmv_distinct")(spark, sf).collect()
    assert(rows.length > 1 && rows.exists(_.getString(0) == "__union__"))
    val pairs = Tables.orders(spark, sf)
      .select($"o_orderpriority", $"o_custkey").distinct().collect()
      .map(r => (r.getString(0), r.getLong(1)))
    val byGrp = pairs.groupBy(_._1).view
      .mapValues(_.map(_._2).distinct).toMap +
      ("__union__" -> pairs.map(_._2).distinct) +
      ("__small__" -> pairs.map(_._2).distinct
        .filter(_ < Analytics.SmallGroupBound))
    // the planted small group must actually exercise the fallback branch
    assert(byGrp("__small__").nonEmpty &&
      byGrp("__small__").length < Analytics.KmvK)
    rows.foreach { r =>
      val members = byGrp(r.getString(0))
      val hashes = members.map(m =>
        TextImpl.md5Lower64(UTF8String.fromString(s"kmv:$m")) & Long.MaxValue)
        .sorted
      assert(r.getLong(1) == members.length.toLong, r.getString(0))
      if (members.length < Analytics.KmvK) {
        // sketch-not-full rule: no k-th minimum, estimate == exact
        assert(r.isNullAt(2), s"kth_min must be null for ${r.getString(0)}")
        assert(r.getLong(3) == members.length.toLong &&
          r.getLong(4) == 0L, s"small-sketch fallback for ${r.getString(0)}")
      } else {
        val kth = hashes(Analytics.KmvK - 1)
        val est = (Long.MaxValue / kth) * (Analytics.KmvK - 1)
        assert(r.getLong(2) == kth, s"kth_min for ${r.getString(0)}")
        assert(r.getLong(3) == est, s"est for ${r.getString(0)}")
        assert(math.abs(r.getLong(4)) < 600000L,
          s"KMV k=64 estimate off by >60%: $r")
      }
    }
  }

  // --------------------------------------------------------------------- q_acf
  test("q_acf: exact integer replay from the monthly series") {
    val monthly = Tables.orders(spark, sf)
      .groupBy(date_format($"o_orderdate", "yyyy-MM").as("month"))
      .agg((sum($"o_totalprice".cast("decimal(28,2)")) * 100)
        .cast("long").as("cents"))
      .collect().map(r => (r.getString(0), r.getLong(1))).sortBy(_._1)
    val n = monthly.length
    val s0 = monthly.map(_._2).sum
    val ndx = monthly.map { case (_, c) => BigInt(n) * c - s0 }
    val den = ndx.map(x => x * x).sum
    val rows = SparkEntry.queries("q_acf")(spark, sf).collect()
    assert(rows.length == Analytics.AcfMaxLag)
    rows.foreach { r =>
      val k = r.getInt(0)
      val num = (0 until n - k).map(i => ndx(i) * ndx(i + k)).sum
      assert(r.getLong(1) == n.toLong && r.getLong(2) == (n - k).toLong)
      assert(r.getString(3) == num.toString, s"num at lag $k")
      assert(r.getString(4) == den.toString, s"den at lag $k")
      val acf = r.getDouble(5)
      assert(acf >= -1.0 && acf <= 1.0, s"acf out of range at lag $k")
    }
  }

  // --------------------------------------------------------------- q_count_min
  test("q_count_min: overestimate-only, exact counts, real collisions") {
    val wc = Tables.documents(spark, sf)
      .select(explode(split($"text", " ", -1)).as("word"))
      .groupBy($"word").agg(count(lit(1)).as("c"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val top = wc.toSeq.sortBy { case (w, c) => (-c, w) }
      .take(Analytics.CmProbeK)
    val rows = SparkEntry.queries("q_count_min")(spark, sf).collect()
    assert(rows.length == top.length)
    val byWord = rows.map(r => r.getString(0) ->
      (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(byWord.keySet == top.map(_._1).toSet, "probe set = exact top-K")
    byWord.foreach { case (w, (exact, est, over)) =>
      assert(exact == wc(w), s"exact count for $w")
      assert(est >= exact && over == est - exact,
        s"CM must never under-count: $w")
    }
    // the deliberately-undersized width must produce a measured collision
    assert(rows.exists(_.getLong(3) > 0L),
      "w=32 over a 31-word vocab must collide somewhere")
  }

  // ---------------------------------------------------------------- q_survival
  test("q_survival: Kaplan-Meier replayed in Scala from order months") {
    val per = Tables.orders(spark, sf)
      .groupBy($"o_custkey")
      .agg(min(months_between(date_trunc("month", $"o_orderdate"),
          to_date(lit("1995-01-01"))).cast("long")).as("f"),
        max(months_between(date_trunc("month", $"o_orderdate"),
          to_date(lit("1995-01-01"))).cast("long")).as("l"))
      .collect().map(r => (r.getLong(1), r.getLong(2)))
    val mMax = per.map(_._2).max
    val durations = per.map { case (f, l) =>
      (l - f, l <= mMax - Analytics.SurvivalHorizonMonths) }
    val grid = durations.groupBy(_._1).map { case (t, xs) =>
      (t, xs.length.toLong, xs.count(_._2).toLong) }.toSeq.sortBy(_._1)
    val nRisk = grid.map(_._1).map(t =>
      t -> grid.filter(_._1 >= t).map(_._2).sum).toMap
    val rows = SparkEntry.queries("q_survival")(spark, sf).collect()
    assert(rows.length == grid.length)
    var prev = 1000000L
    rows.sortBy(_.getLong(0)).foreach { r =>
      val t = r.getLong(0)
      val sPpm = r.getLong(4)
      // replay the fold: identical truncating sequence
      val expected = grid.filter(_._1 <= t).foldLeft(1000000L) {
        case (acc, (u, _, e)) => acc * (nRisk(u) - e) / nRisk(u)
      }
      assert(r.getLong(1) == nRisk(t), s"n_risk at t=$t")
      assert(sPpm == expected, s"s_ppm at t=$t")
      assert(sPpm <= prev, s"survival must be non-increasing at t=$t")
      prev = sPpm
    }
    // censoring must actually occur (customers active near the horizon)
    assert(rows.exists(_.getLong(3) > 0L), "no censored customers — vacuous")
  }
  // ------------------------------------------------------------- q_decile_share
  test("q_decile_share: shares sum to ~1e6, deciles partition customers") {
    val rows = SparkEntry.queries("q_decile_share")(spark, sf).collect()
    assert(rows.length == 10)
    assert(rows.map(_.getLong(0)).toSeq == (0L to 9L))
    val nCust = Tables.orders(spark, sf)
      .select($"o_custkey").distinct().count()
    assert(rows.map(_.getLong(1)).sum == nCust, "deciles partition customers")
    // bucket sizes from the idx*10 DIV n cut differ by at most 1
    val sizes = rows.map(_.getLong(1))
    assert(sizes.max - sizes.min <= 1)
    val shareSum = rows.map(_.getLong(3)).sum
    assert(shareSum > 999990L && shareSum <= 1000000L,
      s"ppm shares must sum to 1e6 minus truncation: $shareSum")
    assert(rows.map(_.getLong(4)).toList ==
      rows.map(_.getLong(3)).scanLeft(0L)(_ + _).tail.toList,
      "cumulative share must prefix-sum the shares")
    // concentration: the top decile must out-earn the bottom decile
    assert(rows.last.getLong(2) > rows.head.getLong(2))
  }

  // ---------------------------------------------------------------------- q_rfm
  test("q_rfm: quintile scores replayed from value histograms") {
    val per = Tables.orders(spark, sf)
      .groupBy($"o_custkey")
      .agg(max($"o_orderdate").as("last"),
        count(lit(1)).as("f"),
        (sum($"o_totalprice".cast("decimal(28,2)")) * 100)
          .cast("long").as("m"))
      .collect()
    // o_orderdate surfaces as Date or LocalDateTime depending on how the
    // fixture generation typed it — normalize either to LocalDate
    def localDate(v: Any): java.time.LocalDate = v match {
      case d: java.sql.Date => d.toLocalDate
      case t: java.time.LocalDateTime => t.toLocalDate
      case t: java.sql.Timestamp => t.toLocalDateTime.toLocalDate
      case other => sys.error(s"unexpected date type: ${other.getClass}")
    }
    val maxDate = per.map(r => localDate(r.get(1))).max(
      Ordering.by((d: java.time.LocalDate) => d.toEpochDay))
    val rfm = per.map { r =>
      val days = java.time.temporal.ChronoUnit.DAYS.between(
        localDate(r.get(1)), maxDate)
      (days, r.getLong(2), r.getLong(3))
    }
    val n = rfm.length.toLong
    def quint(vs: Seq[Long]): Map[Long, Long] = {
      val cnt = vs.groupBy(identity).view.mapValues(_.size.toLong).toMap
      val sorted = cnt.keys.toSeq.sorted
      val below = sorted.scanLeft(0L)((a, v) => a + cnt(v))
      sorted.zip(below).map { case (v, b) => v -> b * 5L / n }.toMap
    }
    val (qr, qf, qm) =
      (quint(rfm.map(_._1).toSeq), quint(rfm.map(_._2).toSeq), quint(rfm.map(_._3).toSeq))
    val expected = rfm.groupBy { case (r, f, m) =>
      (5L - qr(r), qf(f) + 1L, qm(m) + 1L) }
      .map { case (k, xs) => k -> (xs.length.toLong, xs.map(_._3).sum) }
    val rows = SparkEntry.queries("q_rfm")(spark, sf).collect()
    assert(rows.length == expected.size)
    rows.foreach { r =>
      val k = (r.getLong(0), r.getLong(1), r.getLong(2))
      assert(expected(k) == ((r.getLong(3), r.getLong(4))), s"segment $k")
      assert(k._1 >= 1 && k._1 <= 5 && k._2 >= 1 && k._2 <= 5 &&
        k._3 >= 1 && k._3 <= 5)
    }
  }
  // --------------------------------------------------------------- q_burstiness
  test("q_burstiness: gap statistics replayed; bounded in (-1, 1)") {
    val evs = Tables.events(spark, sf)
      .select($"event_type", unix_micros($"ts").as("us"), $"event_id")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val rows = SparkEntry.queries("q_burstiness")(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val t = r.getString(0)
      val sorted = evs.filter(_._1 == t).sortBy(e => (e._2, e._3)).map(_._2)
      val gaps = sorted.zip(sorted.tail).map { case (a, b) => b - a }
      assert(r.getLong(1) == gaps.length.toLong, s"n for $t")
      assert(r.getLong(2) == gaps.sum, s"sum_us for $t")
      assert(r.getLong(3) == gaps.sum / gaps.length, s"mean for $t")
      val b = r.getDouble(4)
      assert(b > -1.0 && b < 1.0, s"burstiness out of range for $t: $b")
    }
  }

  // -------------------------------------------------------------------- q_peaks
  test("q_peaks: every reported month strictly dominates its +-2 window") {
    val monthly = Tables.orders(spark, sf)
      .groupBy(date_format($"o_orderdate", "yyyy-MM").as("month"))
      .agg((sum($"o_totalprice".cast("decimal(28,2)")) * 100)
        .cast("long").as("cents"))
      .collect().map(r => (r.getString(0), r.getLong(1))).sortBy(_._1)
    val expected = (2 until monthly.length - 2).filter { i =>
      val c = monthly(i)._2
      Seq(i - 2, i - 1, i + 1, i + 2).forall(j => c > monthly(j)._2)
    }.map(i => monthly(i)._1).toSet
    val rows = SparkEntry.queries("q_peaks")(spark, sf).collect()
    assert(rows.map(_.getString(0)).toSet == expected)
    assert(rows.forall(_.getLong(3) > 0L), "prominence must be positive")
    assert(expected.nonEmpty, "fixture has no peaks — vacuous")
  }

  // ---------------------------------------------------------- q_weekday_profile
  test("q_weekday_profile: 7 days partition the orders; indexes bracket 1e6") {
    val rows = SparkEntry.queries("q_weekday_profile")(spark, sf).collect()
    assert(rows.length == 7 && rows.map(_.getLong(0)).toSeq == (0L to 6L))
    assert(rows.map(_.getLong(1)).sum == Tables.orders(spark, sf).count())
    // some day must be above average and some below (non-degenerate)
    val idx = rows.map(_.getLong(4))
    assert(idx.exists(_ > 1000000L) && idx.exists(_ < 1000000L))
  }
  // -------------------------------------------------------------- q_price_index
  test("q_price_index: base month pinned at 1e6; arithmetic replayed") {
    val grid = Tables.lineitem(spark, sf)
      .join(Tables.orders(spark, sf), $"l_orderkey" === $"o_orderkey")
      .groupBy($"l_partkey", date_format($"o_orderdate", "yyyy-MM").as("m"))
      .agg(((sum($"l_extendedprice".cast("decimal(28,2)")) * 100)
        .cast("long")).as("ec"), sum($"l_quantity".cast("long")).as("q"))
      .collect()
      .map(r => ((r.getLong(0), r.getString(1)), (r.getLong(2), r.getLong(3))))
      .toMap
    val unit = grid.view.mapValues { case (ec, q) => ec / q }.toMap
    val base = grid.keys.map(_._2).min
    val basePart = grid.collect { case ((p, m), (_, q)) if m == base =>
      p -> (unit((p, base)), q) }.toMap
    val months = grid.keys.map(_._2).toSeq.distinct.sorted
    val expected = months.map { m =>
      val common = grid.keys.collect { case (p, `m`) if basePart.contains(p) => p }
      val costT = common.map(p => unit((p, m)) * basePart(p)._2).sum
      val cost0 = common.map(p => basePart(p)._1 * basePart(p)._2).sum
      m -> (common.size.toLong, costT, cost0, costT * 1000000L / cost0)
    }.toMap
    val rows = SparkEntry.queries("q_price_index")(spark, sf).collect()
    assert(rows.length == months.length)
    rows.foreach { r =>
      assert(expected(r.getString(0)) ==
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))),
        s"month ${r.getString(0)}")
    }
    val baseRow = rows.find(_.getString(0) == base).get
    assert(baseRow.getLong(4) == 1000000L, "base month must index at 1e6")
  }
  // -------------------------------------------------------------- q_lorenz_gini
  test("q_lorenz_gini: closed-form replay; agrees with the decile curve") {
    val cents = Tables.orders(spark, sf)
      .groupBy($"o_custkey")
      .agg((sum($"o_totalprice".cast("decimal(28,2)")) * 100)
        .cast("long").as("c"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val sorted = cents.sortBy { case (id, c) => (c, id) }.map(_._2)
    val n = sorted.length.toLong
    val sx = sorted.map(BigInt(_)).sum
    val srx = sorted.zipWithIndex.map { case (x, i) => BigInt(i + 1) * x }.sum
    val gini = math.rint(((2.0 * srx.toDouble - (n + 1.0) * sx.toDouble) /
      (n.toDouble * sx.toDouble)) * 1e9) / 1e9
    val r = SparkEntry.queries("q_lorenz_gini")(spark, sf).collect().head
    assert(r.getLong(0) == n && r.getLong(1) == sx.toLong)
    assert(math.abs(r.getDouble(2) - gini) < 2e-9, s"${r.getDouble(2)} vs $gini")
    assert(r.getDouble(2) > 0.0 && r.getDouble(2) < 1.0)
  }

  // ---------------------------------------------------------------------- q_hhi
  test("q_hhi: replayed per segment; bracketed by [1/n, 1]") {
    val per = Tables.orders(spark, sf)
      .join(Tables.customer(spark, sf), $"o_custkey" === $"c_custkey")
      .groupBy($"c_mktsegment", $"o_custkey")
      .agg((sum($"o_totalprice".cast("decimal(28,2)")) * 100)
        .cast("long").as("c"))
      .collect().map(r => (r.getString(0), r.getLong(2)))
    val rows = SparkEntry.queries("q_hhi")(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val xs = per.filter(_._1 == r.getString(0)).map(_._2)
      val sx = xs.map(BigInt(_)).sum
      val sxx = xs.map(x => BigInt(x) * x).sum
      val hhi = math.rint(sxx.toDouble / (sx.toDouble * sx.toDouble) * 1e9) / 1e9
      assert(r.getLong(1) == xs.length.toLong && r.getLong(2) == sx.toLong)
      assert(math.abs(r.getDouble(3) - hhi) < 2e-9, r.getString(0))
      assert(r.getDouble(3) >= 1.0 / xs.length && r.getDouble(3) <= 1.0)
    }
  }
  // ------------------------------------------------------- q_seasonal_decompose
  test("q_seasonal_decompose: parts re-add exactly; seasonal sums near zero") {
    val rows = SparkEntry.queries("q_seasonal_decompose")(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getLong(1) == r.getLong(2) + r.getLong(3) + r.getLong(4),
        s"decomposition must re-add at ${r.getString(0)}")
    }
    val nMonths = Tables.orders(spark, sf)
      .select(date_format($"o_orderdate", "yyyy-MM")).distinct().count()
    assert(rows.length == nMonths - 12,
      "trend defined exactly where the full 13-month window exists")
    // month-of-year seasonal means of the detrended series sum to ~0
    // (each truncated toward zero -> |sum over 12 moys| < 12)
    val seasonalByMoy = rows.map(r => r.getString(0).substring(5) -> r.getLong(3))
      .distinct
    assert(math.abs(seasonalByMoy.map(_._2).sum) <
      12L * (rows.map(_.getLong(1)).max / 100L),
      "seasonal components should roughly cancel")
    assert(seasonalByMoy.map(_._2).exists(_ > 0L) &&
      seasonalByMoy.map(_._2).exists(_ < 0L),
      "seasonality must have both signs - vacuous otherwise")
  }
}
