package graft

import org.apache.spark.sql.functions._

/** Risk & microstructure family: every statistic replayed driver-side
  * from raw ticks in plain Scala over BigInt (independent of both the
  * Spark plan and the DuckDB oracle formulation), plus the BIGINT
  * envelopes the exact arithmetic depends on — in particular the < 2⁵²
  * bound under every isqrt (so the BIGINT→DOUBLE conversion is exact and
  * floor(sqrt(double)) equals the exact integer square root). */
class Indicators2Spec extends GraftSuite {

  private def run(name: String) = SparkEntry.queries(name)(spark, sf)

  /** Exact integer square root by Newton iteration on BigInt — the
    * independent twin of the engines' floor(sqrt(double)). */
  private def isqrtExact(v: BigInt): BigInt = {
    require(v >= 0)
    if (v < 2) v
    else {
      var x = BigInt(math.sqrt(v.toDouble).toLong + 1)
      var prev = BigInt(-1)
      while (x != prev) { prev = x; x = (x + v / x) / 2 }
      while (x * x > v) x -= 1
      while ((x + 1) * (x + 1) <= v) x += 1
      x
    }
  }

  private val Env52 = BigInt(1) << 52

  /** isqrt arg must be exactly representable as a double AND the double
    * floor path must agree with the exact integer root. */
  private def assertIsqrtEnvelope(v: BigInt, site: String): Unit = {
    assert(v >= 0 && v < Env52, s"isqrt envelope violated at $site: $v")
    assert(BigInt(math.floor(math.sqrt(v.toDouble)).toLong) == isqrtExact(v),
      s"double sqrt path diverges from exact isqrt at $site: $v")
  }

  /** Truncate-toward-zero BigInt division matching SQL DIV. */
  private def tdiv(a: BigInt, b: BigInt): BigInt = a / b

  /** Driver-side bar replay (the IndicatorsSpec recipe): per (type, day)
    * (close, high, low, notional) from ticks ordered by (us, event_id). */
  private lazy val refBars: Map[String, Seq[(String, Long, Long, Long, Long)]] = {
    val ticks = Tables.events(spark, sf)
      .select(col("event_type"), date_format(col("ts"), "yyyy-MM-dd").as("day"),
        unix_micros(col("ts")).as("us"), col("event_id"),
        round(col("value") * 100).cast("long").as("cents"))
      .collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    ticks.groupBy(t => (t._1, t._2)).toSeq.map { case ((tpe, day), ts) =>
      val sorted = ts.sortBy(t => (t._3, t._4))
      (tpe, day, sorted.last._5, ts.map(_._5).max, ts.map(_._5).min,
        ts.map(_._5).sum)
    }.groupBy(_._1).map { case (tpe, rows) =>
      tpe -> rows.sortBy(_._2).map(r => (r._2, r._3, r._4, r._5, r._6))
    } // type -> day-ordered (day, close, high, low, notional)
  }

  /** Tick count per (type, day) bar, for the OBV volume replay. */
  private lazy val ticksPerBar: Map[(String, String), Long] =
    Tables.events(spark, sf)
      .select(col("event_type"), date_format(col("ts"), "yyyy-MM-dd").as("day"))
      .collect()
      .map(r => (r.getString(0), r.getString(1)))
      .groupBy(identity).map { case (k, xs) => k -> xs.length.toLong }

  /** Day-ordered close diffs per instrument. */
  private lazy val refDiffs: Map[String, Seq[Long]] =
    refBars.map { case (t, bs) =>
      t -> bs.map(_._2).sliding(2).filter(_.size == 2)
        .map(p => p(1) - p(0)).toSeq
    }

  test("q_sharpe: driver replay + isqrt envelope") {
    val rows = run("q_sharpe").collect()
    assert(rows.length == refDiffs.size)
    rows.foreach { r =>
      val xs = refDiffs(r.getAs[String]("event_type")).map(BigInt(_))
      val n = BigInt(xs.size)
      val sx = xs.sum
      val sxx = xs.map(x => x * x).sum
      val sdd = xs.filter(_ < 0).map(x => x * x).sum
      assertIsqrtEnvelope(n * sxx - sx * sx, "sharpe")
      assertIsqrtEnvelope(n * sdd, "sortino")
      assert(BigInt(r.getAs[Long]("n_days")) == n)
      assert(BigInt(r.getAs[Long]("sum_diff_cents")) == sx)
      val denS = isqrtExact(n * sxx - sx * sx)
      val denD = isqrtExact(n * sdd)
      if (denS == 0) assert(r.isNullAt(r.fieldIndex("sharpe_milli")))
      else assert(BigInt(r.getAs[Long]("sharpe_milli")) == tdiv(sx * 1000, denS))
      if (denD == 0) assert(r.isNullAt(r.fieldIndex("sortino_milli")))
      else assert(BigInt(r.getAs[Long]("sortino_milli")) == tdiv(sx * 1000, denD))
    }
  }

  test("q_realized_vol: driver replay, both estimators") {
    val rows = run("q_realized_vol").collect()
    assert(rows.length == refBars.size)
    rows.foreach { r =>
      val t = r.getAs[String]("event_type")
      val rv = refDiffs(t).map(x => BigInt(x) * BigInt(x)).sum
      val rng = refBars(t).map(b => BigInt(b._3 - b._4)).map(d => d * d).sum
      assertIsqrtEnvelope(rv, "rvol")
      assertIsqrtEnvelope(rng, "range_vol")
      assert(BigInt(r.getAs[Long]("n_days")) == BigInt(refBars(t).size))
      assert(BigInt(r.getAs[Long]("n_diffs")) == BigInt(refDiffs(t).size))
      assert(BigInt(r.getAs[Long]("rv_cents2")) == rv)
      assert(BigInt(r.getAs[Long]("range_cents2")) == rng)
      assert(BigInt(r.getAs[Long]("rvol_cents")) == isqrtExact(rv))
      assert(BigInt(r.getAs[Long]("range_vol_cents")) == isqrtExact(rng))
    }
  }

  test("q_roll_spread: driver replay; NULL exactly when cov_num >= 0") {
    val rows = run("q_roll_spread").collect()
    rows.foreach { r =>
      val xs = refDiffs(r.getAs[String]("event_type")).map(BigInt(_))
      val pairs = xs.sliding(2).filter(_.size == 2).map(p => (p(1), p(0))).toSeq
      val n = BigInt(pairs.size)
      val sx = pairs.map(_._1).sum
      val sy = pairs.map(_._2).sum
      val sxy = pairs.map(p => p._1 * p._2).sum
      val covNum = n * sxy - sx * sy
      assert(BigInt(r.getAs[Long]("n_pairs")) == n)
      assert(BigInt(r.getAs[Long]("cov_num")) == covNum)
      if (covNum >= 0) assert(r.isNullAt(r.fieldIndex("roll_spread_millicents")))
      else {
        assertIsqrtEnvelope(-covNum, "roll")
        assert(BigInt(r.getAs[Long]("roll_spread_millicents")) ==
          tdiv(2000 * isqrtExact(-covNum), n))
      }
    }
  }

  test("q_kyle_lambda: driver replay + scaled-numerator envelope") {
    val rows = run("q_kyle_lambda").collect()
    rows.foreach { r =>
      val t = r.getAs[String]("event_type")
      val bs = refBars(t)
      val obs = bs.sliding(2).filter(_.size == 2).map { p =>
        (BigInt((p(1)._2 - p(0)._2).abs), BigInt(p(1)._5 / 1000))
      }.toSeq // (|diff| cents, notional kilocents) per post-first day
      val n = BigInt(obs.size)
      val sy = obs.map(_._1).sum
      val sv = obs.map(_._2).sum
      val syv = obs.map(o => o._1 * o._2).sum
      val svv = obs.map(o => o._2 * o._2).sum
      val num = n * syv - sy * sv
      val den = n * svv - sv * sv
      assert((num * 1000).abs < (BigInt(1) << 62), "kyle numerator envelope")
      assert(den >= 0 && den < (BigInt(1) << 62), "kyle denominator envelope")
      assert(BigInt(r.getAs[Long]("n_days")) == n)
      assert(BigInt(r.getAs[Long]("sum_abs_diff_cents")) == sy)
      if (den == 0) assert(r.isNullAt(r.fieldIndex("lambda_milli_per_kc")))
      else {
        val lam = tdiv(num * 1000, den)
        assert(BigInt(r.getAs[Long]("lambda_milli_per_kc")) == lam)
        assert(BigInt(r.getAs[Long]("intercept_millicents")) ==
          tdiv(sy * 1000 - lam * sv, n))
      }
    }
  }

  test("q_underwater: driver spell replay; identities vs q_max_drawdown") {
    val rows = run("q_underwater").collect()
    assert(rows.length == refBars.size)
    rows.foreach { r =>
      val closes = refBars(r.getAs[String]("event_type")).map(_._2)
      var peak = Long.MinValue
      var spells = Seq.empty[Int]
      var cur = 0
      closes.foreach { c =>
        peak = math.max(peak, c)
        if (c < peak) cur += 1
        else { if (cur > 0) spells :+= cur; cur = 0 }
      }
      if (cur > 0) spells :+= cur
      assert(r.getAs[Long]("n_spells") == spells.size.toLong)
      assert(r.getAs[Long]("days_underwater") == spells.sum.toLong)
      assert(r.getAs[Long]("max_spell_days") ==
        (if (spells.isEmpty) 0L else spells.max.toLong))
    }
  }

  test("q_rebalance_turnover: driver replay of weights, turnover, gate") {
    val rows = run("q_rebalance_turnover").collect()
    val nInst = refBars.size
    // gated day -> total close; weights per (day, type); day-ordered
    val byDay = refBars.toSeq
      .flatMap { case (t, bs) => bs.map(b => (b._1, t, b._2)) }
      .groupBy(_._1).filter(_._2.size == nInst)
    val gatedDays = byDay.keys.toSeq.sorted
    val weights: Map[(String, String), Long] = byDay.flatMap {
      case (day, xs) =>
        val total = xs.map(_._3).sum
        xs.map(x => (day, x._2) -> x._3 * 1000000L / total)
    }
    val expected = gatedDays.sliding(2).filter(_.size == 2).map { p =>
      val (prev, day) = (p(0), p(1))
      val total = byDay(day).map(_._3).sum
      val ws = byDay(day).map(x => weights((day, x._2)))
      val turnover = byDay(day).map(x =>
        math.abs(weights((day, x._2)) - weights((prev, x._2)))).sum
      (day, total, ws.max, turnover)
    }.toSeq
    assert(rows.length == expected.size)
    rows.zip(expected).foreach { case (r, (day, total, maxW, to)) =>
      assert(r.getAs[String]("day") == day)
      assert(r.getAs[Long]("total_cents") == total)
      assert(r.getAs[Long]("max_weight_ppm") == maxW)
      assert(r.getAs[Long]("turnover_ppm") == to)
    }
  }

  test("q_rescaled_range: driver replay of nd grid, range, and R/S") {
    val rows = run("q_rescaled_range").collect()
    assert(rows.length == refDiffs.size)
    rows.foreach { r =>
      val xs = refDiffs(r.getAs[String]("event_type")).map(BigInt(_))
      val n = BigInt(xs.size)
      val sx = xs.sum
      val sxx = xs.map(x => x * x).sum
      val prefixes = xs.scanLeft(BigInt(0))(_ + _).tail
      val nds = prefixes.zipWithIndex.map { case (p, i) =>
        n * p - BigInt(i + 1) * sx
      }
      val rn = nds.max - nds.min
      val varNum = n * sxx - sx * sx
      assertIsqrtEnvelope(varNum, "rescaled_range")
      assert(BigInt(r.getAs[Long]("n_days")) == n)
      assert(BigInt(r.getAs[Long]("rn")) == rn)
      if (varNum == 0) assert(r.isNullAt(r.fieldIndex("rs_milli")))
      else assert(BigInt(r.getAs[Long]("rs_milli")) ==
        tdiv(rn * 1000, isqrtExact(varNum)))
    }
  }

  test("q_anova: driver replay; balanced design; staged-division envelope") {
    val rows = run("q_anova").collect()
    assert(rows.length == 1)
    val r = rows.head
    // replay: gated (full-roster) days, consecutive-day diffs per type
    val types = refBars.keys.toSeq.sorted
    val gatedDays = refBars.values.flatMap(_.map(_._1))
      .groupBy(identity).filter(_._2.size == types.size).keys.toSeq.sorted
    val closes: Map[(String, String), Long] = refBars.flatMap {
      case (t, bs) => bs.map(b => (t, b._1) -> b._2)
    }
    val groups: Map[String, Seq[BigInt]] = types.map { t =>
      t -> gatedDays.sliding(2).filter(_.size == 2)
        .map(p => BigInt(closes((t, p(1))) - closes((t, p(0))))).toSeq
    }.toMap
    val g = BigInt(types.size)
    val ns = groups.values.map(_.size).toSet
    assert(ns.size == 1, "gate must balance the design")
    val n = BigInt(ns.head)
    val nTotal = g * n
    val sgs = types.map(t => groups(t).sum)
    val s = sgs.sum
    val q = groups.values.flatten.map(x => x * x).sum
    val sumSg2 = sgs.map(x => x * x).sum
    val ssbNum = nTotal * sumSg2 - n * s * s
    val sswNum = n * nTotal * q - nTotal * sumSg2
    // staged-division envelope: every intermediate < 2^62
    assert(ssbNum.abs < (BigInt(1) << 62) && sswNum.abs < (BigInt(1) << 62))
    assert((tdiv(ssbNum, g - 1) * 1000).abs < (BigInt(1) << 62))
    assert(BigInt(r.getAs[Long]("g")) == g)
    assert(BigInt(r.getAs[Long]("n_min")) == n && BigInt(r.getAs[Long]("n_max")) == n)
    assert(BigInt(r.getAs[Long]("ssb_num")) == ssbNum)
    assert(BigInt(r.getAs[Long]("ssw_num")) == sswNum)
    val msw = tdiv(sswNum, nTotal - g)
    if (msw == 0) assert(r.isNullAt(r.fieldIndex("f_milli")))
    else assert(BigInt(r.getAs[Long]("f_milli")) ==
      tdiv(tdiv(ssbNum, g - 1) * 1000, msw))
    // sums of squares are non-negative by construction
    assert(ssbNum >= 0 && sswNum >= 0)
  }

  test("q_obv: driver replay of signed flow and the running sum") {
    val rows = run("q_obv").collect()
    val expected = refBars.flatMap { case (t, bs) =>
      var obv = 0L
      bs.zipWithIndex.map { case ((day, close, _, _, _), i) =>
        val nTicks = ticksPerBar((t, day))
        val flow =
          if (i == 0) 0L
          else math.signum(close - bs(i - 1)._2).toLong * nTicks
        obv += flow
        (t, day) -> (nTicks, flow, obv)
      }
    }
    assert(rows.length == expected.size)
    rows.foreach { r =>
      val (n, flow, obv) =
        expected((r.getAs[String]("event_type"), r.getAs[String]("day")))
      assert(r.getAs[Long]("n_ticks") == n)
      assert(r.getAs[Long]("signed_flow") == flow)
      assert(r.getAs[Long]("obv") == obv)
    }
  }

  test("q_atr: driver replay of the true range and its 14-day window") {
    val rows = run("q_atr").collect()
    val trs: Map[String, Seq[(String, Long)]] = refBars.map { case (t, bs) =>
      t -> bs.sliding(2).filter(_.size == 2).map { p =>
        val (prev, cur) = (p(0), p(1))
        val tr = math.max(cur._3 - cur._4,
          math.max(math.abs(cur._3 - prev._2), math.abs(cur._4 - prev._2)))
        (cur._1, tr)
      }.toSeq
    }
    val expected = trs.flatMap { case (t, xs) =>
      xs.zipWithIndex.collect { case ((day, _), i) if i >= 13 =>
        (t, day) -> (xs(i)._2, xs.slice(i - 13, i + 1).map(_._2).sum * 1000L / 14L)
      }
    }
    assert(rows.length == expected.size)
    rows.foreach { r =>
      val (tr, atr) =
        expected((r.getAs[String]("event_type"), r.getAs[String]("day")))
      assert(r.getAs[Long]("tr_cents") == tr)
      assert(r.getAs[Long]("atr_milli") == atr)
    }
  }

  test("q_stoch: driver replay; %K in [0, 1e6]; %D exact thirds") {
    val rows = run("q_stoch").collect()
    val ks: Map[String, Seq[(String, Option[Long])]] = refBars.map {
      case (t, bs) =>
        t -> bs.zipWithIndex.collect { case ((day, close, _, _, _), i) if i >= 13 =>
          val win = bs.slice(i - 13, i + 1)
          val lo = win.map(_._4).min
          val hi = win.map(_._3).max
          (day, if (hi == lo) None else Some((close - lo) * 1000000L / (hi - lo)))
        }.toSeq
    }
    val expected = ks.flatMap { case (t, xs) =>
      xs.zipWithIndex.map { case ((day, k), i) =>
        val d = if (i >= 2 && k.isDefined && xs(i - 1)._2.isDefined &&
            xs(i - 2)._2.isDefined)
          Some((k.get + xs(i - 1)._2.get + xs(i - 2)._2.get) / 3L)
        else None
        (t, day) -> (k, d)
      }
    }
    assert(rows.length == expected.size)
    rows.foreach { r =>
      val (k, d) =
        expected((r.getAs[String]("event_type"), r.getAs[String]("day")))
      k match {
        case Some(v) =>
          assert(r.getAs[Long]("k_ppm") == v)
          assert(v >= 0 && v <= 1000000L)
        case None => assert(r.isNullAt(r.fieldIndex("k_ppm")))
      }
      d match {
        case Some(v) => assert(r.getAs[Long]("d_ppm") == v)
        case None => assert(r.isNullAt(r.fieldIndex("d_ppm")))
      }
    }
  }

  test("q_macd: driver replay of both dyadic EMAs and the signal thirds") {
    import graft.operators.Indicators2.{MacdHorizon => H}
    val wFast = (0 until H).map(j => 1L << (H - 1 - j))
    val wSlow = (0 until H).map(j =>
      math.pow(3, j).toLong * math.pow(4, H - 1 - j).toLong)
    val rows = run("q_macd").collect()
    val expected: Map[(String, String), (BigInt, Option[BigInt])] =
      refBars.flatMap { case (t, bs) =>
        val closes = bs.map(b => (b._1, BigInt(b._2)))
        val macds = closes.indices.collect { case i if i >= H - 1 =>
          def ema(ws: Seq[Long]): BigInt = {
            val num = (0 until H).map(j => closes(i - j)._2 * ws(j)).sum
            tdiv(num * 1000, BigInt(ws.sum))
          }
          (closes(i)._1, ema(wFast) - ema(wSlow))
        }
        macds.zipWithIndex.map { case ((day, m), i) =>
          val sig = if (i >= 2)
            Some(tdiv(m + macds(i - 1)._2 + macds(i - 2)._2, 3))
          else None
          (t, day) -> (m, sig)
        }
      }
    assert(rows.length == expected.size)
    rows.foreach { r =>
      val (m, sig) =
        expected((r.getAs[String]("event_type"), r.getAs[String]("day")))
      assert(BigInt(r.getAs[Long]("macd_milli")) == m)
      sig match {
        case Some(v) => assert(BigInt(r.getAs[Long]("signal_milli")) == v)
        case None => assert(r.isNullAt(r.fieldIndex("signal_milli")))
      }
    }
  }

  test("q_sql_face_sharpe: the SQL spelling is bit-identical to the column API") {
    assertSameRows(run("q_sharpe"), run("q_sql_face_sharpe"))
  }

  test("q_pair_corr: driver replay over common days; full upper triangle") {
    val rows = run("q_pair_corr").collect()
    val diffsByDay: Map[String, Map[String, Long]] = refBars.map { case (t, bs) =>
      t -> bs.sliding(2).filter(_.size == 2)
        .map(p => p(1)._1 -> (p(1)._2 - p(0)._2)).toMap
    }
    val types = refBars.keys.toSeq.sorted
    val expectedPairs = for {
      i <- types.indices; j <- (i + 1) until types.size
    } yield (types(i), types(j))
    assert(rows.map(r => (r.getString(0), r.getString(1))).toSet ==
      expectedPairs.toSet)
    rows.foreach { r =>
      val (da, db) = (diffsByDay(r.getAs[String]("a")), diffsByDay(r.getAs[String]("b")))
      val common = da.keySet.intersect(db.keySet).toSeq.sorted
      val xs = common.map(d => BigInt(da(d)))
      val ys = common.map(d => BigInt(db(d)))
      val n = BigInt(common.size)
      val (sx, sy) = (xs.sum, ys.sum)
      val sxy = xs.zip(ys).map(p => p._1 * p._2).sum
      val sxx = xs.map(x => x * x).sum
      val syy = ys.map(y => y * y).sum
      assertIsqrtEnvelope(n * sxx - sx * sx, "pair_corr x")
      assertIsqrtEnvelope(n * syy - sy * sy, "pair_corr y")
      assert(BigInt(r.getAs[Long]("n_days")) == n)
      val den = isqrtExact(n * sxx - sx * sx) * isqrtExact(n * syy - sy * sy)
      if (den == 0) assert(r.isNullAt(r.fieldIndex("corr_milli")))
      else assert(BigInt(r.getAs[Long]("corr_milli")) ==
        tdiv((n * sxy - sx * sy) * 1000, den))
    }
  }
}
