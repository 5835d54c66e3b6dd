package graft

import org.apache.spark.sql.functions._

/** Indicators family: every indicator replayed driver-side from raw
  * ticks in plain Scala (independent of both the Spark plan and the
  * DuckDB oracle formulation), plus the BIGINT envelopes the exact
  * arithmetic depends on. */
class IndicatorsSpec extends GraftSuite {

  private def run(name: String) = SparkEntry.queries(name)(spark, sf)

  /** Driver-side bar replay: (type, day) -> (open, high, low, close,
    * nTicks, notional) from raw ticks ordered by (us, event_id). */
  private lazy val refBars: Map[(String, String), (Long, Long, Long, Long, Long, Long)] = {
    val ticks = Tables.events(spark, sf)
      .select(col("event_type"), date_format(col("ts"), "yyyy-MM-dd").as("day"),
        unix_micros(col("ts")).as("us"), col("event_id"),
        round(col("value") * 100).cast("long").as("cents"))
      .collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    ticks.groupBy(t => (t._1, t._2)).map { case (k, ts) =>
      val sorted = ts.sortBy(t => (t._3, t._4))
      k -> (sorted.head._5, ts.map(_._5).max, ts.map(_._5).min,
        sorted.last._5, ts.size.toLong, ts.map(_._5).sum)
    }
  }

  /** Per-type day-ordered close series from the replayed bars. */
  private lazy val closes: Map[String, Seq[(String, Long)]] =
    refBars.toSeq.map { case ((t, d), b) => (t, d, b._4) }
      .groupBy(_._1)
      .map { case (t, xs) => t -> xs.sortBy(_._2).map(x => (x._2, x._3)) }

  test("q_ohlc: bars equal the driver-side tick replay, grid is complete") {
    val rows = run("q_ohlc").collect()
    assert(rows.length == refBars.size)
    rows.foreach { r =>
      val k = (r.getAs[String]("event_type"), r.getAs[String]("day"))
      val b = refBars(k)
      assert(r.getAs[Long]("open_cents") == b._1, s"open at $k")
      assert(r.getAs[Long]("high_cents") == b._2, s"high at $k")
      assert(r.getAs[Long]("low_cents") == b._3, s"low at $k")
      assert(r.getAs[Long]("close_cents") == b._4, s"close at $k")
      assert(r.getAs[Long]("n_ticks") == b._5, s"volume at $k")
      assert(r.getAs[Long]("notional_cents") == b._6, s"notional at $k")
      assert(b._3 <= b._1 && b._1 <= b._2 && b._3 <= b._4 && b._4 <= b._2,
        s"OHLC ordering violated at $k")
    }
  }

  test("q_vwap: exact division identity and a full driver-side replay cell") {
    val rows = run("q_vwap").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (notional, qty) =
        (r.getAs[Long]("notional_cents"), r.getAs[Long]("qty_total"))
      assert(qty > 0)
      assert(r.getAs[Long]("vwap_cents") == notional / qty)
    }
    // independent replay of one (flag, month) cell from raw lineitem
    val probe = rows.head
    val (flag, month) =
      (probe.getAs[String]("l_returnflag"), probe.getAs[String]("month"))
    val cell = Tables.lineitem(spark, sf)
      .filter(col("l_returnflag") === flag &&
        date_format(col("l_shipdate"), "yyyy-MM") === month)
      .select(round(col("l_extendedprice") * 100).cast("long"),
        col("l_quantity").cast("long"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(probe.getAs[Long]("n_lines") == cell.length.toLong)
    assert(probe.getAs[Long]("notional_cents") == cell.map(_._1).sum)
    assert(probe.getAs[Long]("qty_total") == cell.map(_._2).sum)
  }

  test("q_max_drawdown: running-peak replay picks the same trough") {
    val rows = run("q_max_drawdown").collect()
    assert(rows.length == closes.size)
    rows.foreach { r =>
      val t = r.getAs[String]("event_type")
      var runMax = Long.MinValue
      val dd = closes(t).map { case (day, c) =>
        runMax = math.max(runMax, c)
        val ppm = if (runMax == 0) 0L else (runMax - c) * 1000000L / runMax
        (day, runMax, c, runMax - c, ppm)
      }
      // earliest day wins ties: the first occurrence of the max ppm
      val first = dd.find(_._5 == dd.map(_._5).max).get
      assert(r.getAs[String]("trough_day") == first._1)
      assert(r.getAs[Long]("peak_cents") == first._2)
      assert(r.getAs[Long]("trough_cents") == first._3)
      assert(r.getAs[Long]("max_dd_cents") == first._4)
      assert(r.getAs[Long]("max_dd_ppm") == first._5)
    }
  }

  test("q_rsi: 14-diff window sums replay exactly, ppm in range") {
    val rows = run("q_rsi").collect()
    val expectedRows = closes.valuesIterator.map(s => math.max(0, s.size - 14)).sum
    assert(rows.length == expectedRows,
      s"one row per full 14-diff window: ${rows.length} vs $expectedRows")
    rows.foreach { r =>
      val (t, day) = (r.getAs[String]("event_type"), r.getAs[String]("day"))
      val series = closes(t)
      val i = series.indexWhere(_._1 == day)
      val diffs = (i - 13 to i).map(j => series(j)._2 - series(j - 1)._2)
      val gain = diffs.map(d => math.max(d, 0L)).sum
      val loss = diffs.map(d => math.max(-d, 0L)).sum
      if (gain + loss == 0) assert(r.isNullAt(r.fieldIndex("rsi_ppm")))
      else {
        val ppm = r.getAs[Long]("rsi_ppm")
        assert(ppm == gain * 1000000L / (gain + loss), s"rsi at ($t,$day)")
        assert(ppm >= 0L && ppm <= 1000000L)
      }
    }
  }

  test("q_bollinger: integer breach test replays, envelope holds") {
    val rows = run("q_bollinger").collect()
    rows.foreach { r =>
      val (t, day) = (r.getAs[String]("event_type"), r.getAs[String]("day"))
      val series = closes(t)
      val i = series.indexWhere(_._1 == day)
      assert(i >= 19, "only full 20-day frames are emitted")
      val frame = (i - 19 to i).map(j => series(j)._2)
      val (x, s20, q20) = (frame.last, frame.sum, frame.map(c => c * c).sum)
      assert(r.getAs[Long]("mean_millicents") == s20 * 50)
      val var400 = q20 * 20 - s20 * s20
      assert(r.getAs[Long]("var_x400_cents2") == var400)
      assert(var400 >= 0, "integer variance is non-negative")
      val dev = x * 20 - s20
      val breach = dev * dev > var400 * 4
      assert(r.getAs[Long]("breach_up") == (if (breach && dev > 0) 1L else 0L))
      assert(r.getAs[Long]("breach_down") == (if (breach && dev < 0) 1L else 0L))
      // BIGINT envelope: every term < 2^41 at the asserted price bound
      frame.foreach(c => assert(c >= 0 && c < 100000L,
        s"price envelope (< 1e5 cents) violated at ($t,$day): $c"))
    }
  }

  test("q_tick_rule: sign carry-forward replays tick by tick") {
    val rows = run("q_tick_rule").collect()
    assert(rows.length == refBars.size, "one row per (instrument, day)")
    // driver-side replay of the Lee-Ready classification
    val ticks = Tables.events(spark, sf)
      .select(col("event_type"), date_format(col("ts"), "yyyy-MM-dd").as("day"),
        unix_micros(col("ts")).as("us"), col("event_id"),
        round(col("value") * 100).cast("long").as("cents"))
      .collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3), r.getLong(4)))
      .groupBy(t => (t._1, t._2))
    rows.foreach { r =>
      val k = (r.getAs[String]("event_type"), r.getAs[String]("day"))
      val sorted = ticks(k).sortBy(t => (t._3, t._4)).map(_._5)
      var lastSign = 0L
      val signs = sorted.zipWithIndex.map { case (c, i) =>
        if (i > 0 && c > sorted(i - 1)) lastSign = 1L
        else if (i > 0 && c < sorted(i - 1)) lastSign = -1L
        lastSign
      }
      val (buy, sell, neutral) =
        (signs.count(_ == 1L), signs.count(_ == -1L), signs.count(_ == 0L))
      assert(r.getAs[Long]("n_buy") == buy.toLong, s"buys at $k")
      assert(r.getAs[Long]("n_sell") == sell.toLong, s"sells at $k")
      assert(r.getAs[Long]("n_neutral") == neutral.toLong, s"neutral at $k")
      assert(r.getAs[Long]("signed_notional_cents") ==
        signs.zip(sorted).map { case (s0, c) => s0 * c }.sum, s"signed at $k")
      if (buy + sell > 0) {
        // Spark DIV truncates toward zero, like Scala / on Longs
        assert(r.getAs[Long]("imbalance_ppm") ==
          (buy - sell).toLong * 1000000L / (buy + sell), s"imbalance at $k")
      } else assert(r.isNullAt(r.fieldIndex("imbalance_ppm")))
    }
  }

  test("q_stream_ohlc: streaming min_by/max_by bars equal the batch ranks") {
    // three formulations of the same bars: streaming agg state here,
    // batch ROW_NUMBER in q_ohlc, DuckDB ROW_NUMBER in the shared oracle
    assertSameRows(run("q_stream_ohlc"), run("q_ohlc"))
  }

  /** Per-type day-ordered (day, high, low, close) from the replayed bars. */
  private lazy val hlc: Map[String, Seq[(String, Long, Long, Long)]] =
    refBars.toSeq.map { case ((t, d), b) => (t, d, b._2, b._3, b._4) }
      .groupBy(_._1)
      .map { case (t, xs) =>
        t -> xs.sortBy(_._2).map(x => (x._2, x._3, x._4, x._5))
      }

  test("q_triple_barrier: first-hit scan replays bar by bar") {
    val rows = run("q_triple_barrier").collect()
    val h = operators.Indicators.Horizon
    val expected = hlc.valuesIterator.map(s => math.max(0, s.size - h)).sum
    assert(rows.length == expected, "one row per bar with a full horizon")
    rows.foreach { r =>
      val (t, day) = (r.getAs[String]("event_type"), r.getAs[String]("day"))
      val series = hlc(t)
      val i = series.indexWhere(_._1 == day)
      val entry = series(i)._4
      val up = entry + entry * operators.Indicators.BarrierPpm / 1000000L
      val dn = entry - entry * operators.Indicators.BarrierPpm / 1000000L
      assert(r.getAs[Long]("entry_cents") == entry)
      assert(r.getAs[Long]("up_cents") == up)
      assert(r.getAs[Long]("down_cents") == dn)
      // forward scan: first bar whose high/low crosses a barrier
      val hit = (1 to h).iterator.map { k =>
        val (_, hi, lo, _) = series(i + k)
        if (hi >= up && lo <= dn) Some((k, 0L, "ambiguous"))
        else if (hi >= up) Some((k, 1L, "up"))
        else if (lo <= dn) Some((k, -1L, "down"))
        else None
      }.collectFirst { case Some(x) => x }
      hit match {
        case Some((k, label, outcome)) =>
          assert(r.getAs[Long]("label") == label, s"label at ($t,$day)")
          assert(r.getAs[String]("outcome") == outcome, s"outcome at ($t,$day)")
          assert(r.getAs[Long]("days_to_hit") == k.toLong, s"days at ($t,$day)")
        case None =>
          assert(r.getAs[Long]("label") == 0L)
          assert(r.getAs[String]("outcome") == "timeout")
          assert(r.isNullAt(r.fieldIndex("days_to_hit")))
      }
    }
  }

  test("q_embargo_split: roles partition each fold, embargo bites, mass conserves") {
    val rows = run("q_embargo_split").collect()
    val days = closes.head._2.map(_._1).size
    val folds = operators.Indicators.Folds.toInt
    val emb = operators.Indicators.EmbargoDays
    assert(rows.length == folds * days, "one row per (fold, day)")
    val totalEvents = Tables.events(spark, sf).count()
    (0 until folds).foreach { f =>
      val fr = rows.filter(_.getAs[Long]("fold") == f.toLong)
      // event mass is identical in every fold's view
      assert(fr.map(_.getAs[Long]("n_events")).sum == totalEvents)
      val lo = f.toLong * days / folds
      val hi = (f + 1).toLong * days / folds
      fr.foreach { r =>
        val idx = r.getAs[Long]("idx")
        val expected =
          if (idx >= lo && idx < hi) "test"
          else if (idx >= lo - emb && idx < hi + emb) "purged"
          else "train"
        assert(r.getAs[String]("role") == expected, s"role at fold=$f idx=$idx")
      }
      assert(fr.count(_.getAs[String]("role") == "test") == (hi - lo).toInt)
      // the embargo must actually bite: interior folds purge both sides
      val purged = fr.count(_.getAs[String]("role") == "purged")
      assert(purged > 0, s"fold $f purged nothing — embargo is dead code")
    }
  }

  test("q_candle_patterns: every flag replays from the bar pairs") {
    val rows = run("q_candle_patterns").collect()
    assert(rows.length == refBars.size)
    val byType = refBars.toSeq.map { case ((t, d), b) => (t, d, b._1, b._2, b._3, b._4) }
      .groupBy(_._1)
      .map { case (t, xs) => t -> xs.sortBy(_._2) }
    rows.foreach { r =>
      val (t, day) = (r.getAs[String]("event_type"), r.getAs[String]("day"))
      val series = byType(t)
      val i = series.indexWhere(_._2 == day)
      val (_, _, o, hi0, lo0, c) = series(i)
      assert(r.getAs[Long]("doji") ==
        (if (math.abs(c - o) * 10 <= hi0 - lo0) 1L else 0L))
      if (i == 0) {
        assert(r.getAs[Long]("bull_engulf") == 0L)
        assert(r.getAs[Long]("bear_engulf") == 0L)
        assert(r.getAs[Long]("gap_up") == 0L)
        assert(r.getAs[Long]("gap_down") == 0L)
      } else {
        val (_, _, po, ph, pl, pc) = series(i - 1)
        assert(r.getAs[Long]("bull_engulf") ==
          (if (pc < po && c > o && o <= pc && c >= po) 1L else 0L))
        assert(r.getAs[Long]("bear_engulf") ==
          (if (pc > po && c < o && o >= pc && c <= po) 1L else 0L))
        assert(r.getAs[Long]("gap_up") == (if (lo0 > ph) 1L else 0L))
        assert(r.getAs[Long]("gap_down") == (if (hi0 < pl) 1L else 0L))
      }
    }
  }

  test("q_var_es: VaR is the exact k-th order statistic, ES its exact mean") {
    val rows = run("q_var_es").collect()
    assert(rows.length == closes.size)
    rows.foreach { r =>
      val t = r.getAs[String]("event_type")
      val diffs = closes(t).sliding(2).map(p => (p(1)._2 - p(0)._2, p(1)._1)).toSeq
      val n = diffs.size
      val k = (n * 5 + 99) / 100
      val worst = diffs.sortBy(identity).take(k)
      assert(r.getAs[Long]("n_days") == n.toLong)
      assert(r.getAs[Long]("k") == k.toLong)
      assert(r.getAs[Long]("var_cents") == worst.map(_._1).max)
      assert(r.getAs[Long]("es_millicents") == {
        val s0 = worst.map(_._1).sum
        // Scala / truncates toward zero like both engines' DIV
        s0 * 1000L / k
      })
      assert(r.getAs[Long]("var_cents") <= 0 ||
        diffs.count(_._1 < 0) < k, "95% VaR should sit in the loss tail")
    }
  }

  test("q_amihud: per-day ratio and mean replay exactly") {
    val rows = run("q_amihud").collect()
    assert(rows.length == refBars.size / 30) // one per instrument
    val notional: Map[(String, String), Long] =
      refBars.map { case (k, b) => k -> b._6 }
    rows.foreach { r =>
      val t = r.getAs[String]("event_type")
      val series = closes(t)
      val ratios = series.sliding(2).map { p =>
        val adx = math.abs(p(1)._2 - p(0)._2)
        (adx, adx * 1000000000L / notional((t, p(1)._1)))
      }.toSeq
      assert(r.getAs[Long]("n_days") == ratios.size.toLong)
      assert(r.getAs[Long]("sum_abs_diff_cents") == ratios.map(_._1).sum)
      assert(r.getAs[Long]("amihud_ppb") ==
        ratios.map(_._2).sum / ratios.size)
      // envelope: |diff| < 1e5 keeps the x1e9 product far inside BIGINT
      ratios.foreach(x => assert(x._1 < 100000L))
    }
  }

  test("q_beta: sufficient statistics replay in BigInt, envelope holds") {
    val rows = run("q_beta").collect()
    assert(rows.length == closes.size)
    // replay diffs and the all-instruments market frame
    val diffs: Map[String, Seq[(String, Long)]] = closes.map { case (t, s) =>
      t -> s.sliding(2).map(p => (p(1)._1, p(1)._2 - p(0)._2)).toSeq
    }
    val market: Map[String, Long] = diffs.values.flatten
      .groupBy(_._1).collect {
        case (day, xs) if xs.size == closes.size => day -> xs.map(_._2).sum
      }
    rows.foreach { r =>
      val t = r.getAs[String]("event_type")
      val xs = diffs(t).filter(d => market.contains(d._1))
      val n = BigInt(xs.size)
      val sx = BigInt(xs.map(_._2).sum)
      val sm = BigInt(xs.map(d => market(d._1)).sum)
      val sxm = xs.map(d => BigInt(d._2) * BigInt(market(d._1))).sum
      val smm = xs.map(d => BigInt(market(d._1)).pow(2)).sum
      assert(r.getAs[Long]("n_days") == n.toLong)
      assert(r.getAs[Long]("sum_diff_cents") == sx.toLong)
      val den = n * smm - sm * sm
      assert(den > 0, "market variance must be positive on the fixtures")
      // BigInt / truncates toward zero — same as Spark DIV and DuckDB //
      val beta = (n * sxm - sx * sm) * 1000 / den
      assert(r.getAs[Long]("beta_milli") == beta.toLong)
      assert(r.getAs[Long]("alpha_millicents") ==
        ((sx * 1000 - beta * sm) / n).toLong)
      // envelope: |diff| < 1e5 and n <= 31 days keep every stat < 2^54,
      // so the *1000 numerator stays far inside BIGINT
      xs.foreach(d => assert(math.abs(d._2) < 100000L, "diff envelope"))
      assert((n * sxm - sx * sm).abs * 1000 < BigInt(Long.MaxValue))
      assert(beta.abs < 1000000L, "|beta| < 1000 sanity envelope")
    }
  }
}
