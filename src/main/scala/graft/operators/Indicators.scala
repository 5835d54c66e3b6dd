package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.{NamedQuery, Tables}

/** Market-indicator family (round 9) — the technical-analysis layer a
  * financial dashboard computes over a tick stream, which the reference
  * stops just short of: it serves monthly close averages and trends
  * (reference `Frontend.py:71-79`); these are the standard indicators
  * one screen further (OHLC candles, VWAP, max drawdown, RSI, Bollinger
  * breaches, market beta). Ticks are the `events` table (event_type =
  * instrument, value = price); VWAP runs on lineitem, the one table with
  * both price and quantity.
  *
  * Exactness discipline: prices are exact BIGINT cents; every indicator
  * is integer arithmetic over them (multiply-then-DIV ppm/milli ratios,
  * variance via n·Σx² − (Σx)² — never a float mean or stddev), so each
  * row hash-compares with the DuckDB oracle on any partitioning. Both
  * engines truncate BIGINT division toward zero (q_cuped precedent), so
  * signed ratios (beta, alpha) are safe.
  *
  * Scale shape, shared: the daily-bar sub-plan aggregates ticks down to
  * the (instrument, day) grid FIRST — one keyed exchange whose groups
  * are bounded by per-day arrival rate, with the open/close row_numbers
  * riding the same (instrument, day) hash partitioning as the rollup
  * (one shuffle, not two). Every window after that runs over the
  * calendar-bounded bar grid (30 days × |instruments| here), never over
  * raw ticks — at 100 TB the bars frame is still tiny (days × symbols),
  * which is what makes per-symbol unbounded-preceding windows (drawdown)
  * safe: the window's partition is a calendar axis, not a data axis. */
object Indicators {

  /** Daily OHLC bars per instrument: ticks → (instrument, day) grid.
    * Open/close are exact order statistics — row_number over the unique
    * (tick micros, event_id) key, ascending and descending — so bars are
    * deterministic under any partitioning even if two ticks share a
    * microsecond. */
  private[operators] def bars(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val ticks = Tables.events(s, dir).select(
      $"event_type",
      date_format($"ts", "yyyy-MM-dd").as("day"),
      unix_micros($"ts").as("us"),
      $"event_id",
      round($"value" * 100).cast("long").as("cents"))
    val wA = Window.partitionBy($"event_type", $"day")
      .orderBy($"us", $"event_id")
    val wD = Window.partitionBy($"event_type", $"day")
      .orderBy($"us".desc, $"event_id".desc)
    ticks
      .withColumn("ra", row_number().over(wA))
      .withColumn("rd", row_number().over(wD))
      .groupBy($"event_type", $"day")
      .agg(
        max(when($"ra" === 1, $"cents")).as("open_cents"),
        max($"cents").as("high_cents"),
        min($"cents").as("low_cents"),
        max(when($"rd" === 1, $"cents")).as("close_cents"),
        count(lit(1)).as("n_ticks"),
        sum($"cents").as("notional_cents"))
  }

  /** DuckDB mirror of [[bars]] as a CTE prefix: `t` (ticks + the two
    * row_numbers) and `bars`. */
  private[operators] val barsSqlCte =
    """WITH t AS (
      |  SELECT event_type, strftime(ts, '%Y-%m-%d') AS day,
      |    epoch_us(ts) AS us, event_id,
      |    CAST(round(value * 100) AS BIGINT) AS cents,
      |    ROW_NUMBER() OVER (
      |      PARTITION BY event_type, strftime(ts, '%Y-%m-%d')
      |      ORDER BY epoch_us(ts), event_id) AS ra,
      |    ROW_NUMBER() OVER (
      |      PARTITION BY event_type, strftime(ts, '%Y-%m-%d')
      |      ORDER BY epoch_us(ts) DESC, event_id DESC) AS rd
      |  FROM events),
      |bars AS (
      |  SELECT event_type, day,
      |    MAX(CASE WHEN ra = 1 THEN cents END) AS open_cents,
      |    MAX(cents) AS high_cents,
      |    MIN(cents) AS low_cents,
      |    MAX(CASE WHEN rd = 1 THEN cents END) AS close_cents,
      |    COUNT(*) AS n_ticks,
      |    CAST(SUM(cents) AS BIGINT) AS notional_cents
      |  FROM t GROUP BY 1, 2)""".stripMargin

  // -------------------------------------------------------------- q_ohlc
  /** The daily candle table itself — the dashboard's price chart. */
  private def ohlc(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    bars(s, dir).orderBy($"event_type", $"day")
  }

  /** Public: q_stream_ohlc (EventStream.scala) reuses this oracle — the
    * streaming plan computes the same bars via min_by/max_by streaming
    * state, a genuinely different formulation than this ROW_NUMBER
    * spelling, so their agreement is differential evidence. */
  val ohlcSql: String =
    s"""$barsSqlCte
       |SELECT event_type, day, open_cents, high_cents, low_cents,
       |  close_cents, n_ticks, notional_cents
       |FROM bars ORDER BY event_type, day""".stripMargin

  // -------------------------------------------------------- q_bars_nmin
  /** Intraday resample width (minutes) and its microsecond equivalent —
    * 15-minute bars, the step between [[bars]]' daily candles and the
    * reference dashboard's monthly trend (`Frontend.py:71-79`).
    * Buckets are epoch-aligned (`us DIV BucketUs`), identical to
    * Structured Streaming's `window(ts, "15 minutes")` assignment, so
    * the streaming sibling (`q_stream_bars_nmin`) lands on the same
    * grid cells. */
  val BarMinutes = 15
  val BucketUs: Long = BarMinutes * 60L * 1000000L

  /** Intraday n-minute OHLC bars WITH GAP-FILLING — the resample
    * operation every charting/feature pipeline needs: ticks roll up to
    * per-(instrument, 15-min bucket) bars exactly as [[bars]] does per
    * day, then each instrument's grid densifies to EVERY bucket between
    * its first and last active one. Empty buckets emit n_ticks = 0 and
    * NULL OHLC (the honest accounting), plus `close_ffill_cents` — the
    * last known close carried forward, the standard fill a charting
    * layer draws — and an `is_gap` flag.
    *
    * Scale shape: ticks → bars is ONE keyed exchange on (instrument,
    * bucket), the open/close row_numbers riding the same hash
    * partitioning as the rollup (the [[bars]] plan). Everything after
    * runs on the calendar-bounded bar grid (instruments × buckets —
    * tiny at any data scale); the dense grid generates from a 2-column
    * per-instrument (first, last) frame via `sequence` (no join against
    * raw ticks), and the forward-fill window partitions per instrument
    * over the calendar axis, the q_max_drawdown precedent. */
  private def barsNmin(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val ticks = Tables.events(s, dir).select(
      $"event_type",
      expr(s"unix_micros(ts) DIV $BucketUs").as("bucket"),
      unix_micros($"ts").as("us"),
      $"event_id",
      round($"value" * 100).cast("long").as("cents"))
    val wA = Window.partitionBy($"event_type", $"bucket")
      .orderBy($"us", $"event_id")
    val wD = Window.partitionBy($"event_type", $"bucket")
      .orderBy($"us".desc, $"event_id".desc)
    val nbars = ticks
      .withColumn("ra", row_number().over(wA))
      .withColumn("rd", row_number().over(wD))
      .groupBy($"event_type", $"bucket")
      .agg(
        max(when($"ra" === 1, $"cents")).as("open_cents"),
        max($"cents").as("high_cents"),
        min($"cents").as("low_cents"),
        max(when($"rd" === 1, $"cents")).as("close_cents"),
        count(lit(1)).as("n_ticks"),
        sum($"cents").as("notional_cents"))
    val grid = nbars.groupBy($"event_type")
      .agg(min($"bucket").as("b0"), max($"bucket").as("b1"))
      .select($"event_type", explode(sequence($"b0", $"b1")).as("bucket"))
    val wf = Window.partitionBy($"event_type").orderBy($"bucket")
      .rowsBetween(Window.unboundedPreceding, 0)
    grid.join(nbars, Seq("event_type", "bucket"), "left")
      .withColumn("close_ffill_cents",
        last($"close_cents", ignoreNulls = true).over(wf))
      .select($"event_type",
        date_format(timestamp_micros($"bucket" * BucketUs), "yyyy-MM-dd HH:mm")
          .as("bucket_start"),
        coalesce($"n_ticks", lit(0L)).as("n_ticks"),
        $"open_cents", $"high_cents", $"low_cents", $"close_cents",
        $"notional_cents", $"close_ffill_cents",
        when($"open_cents".isNull, 1L).otherwise(0L).as("is_gap"))
      .orderBy($"event_type", $"bucket_start")
  }

  /** DuckDB mirror of the 15-minute bar sub-plan as a CTE prefix
    * (`nt`/`nbars`) — shared by `q_bars_nmin` and the streaming
    * sibling's oracle (`EventStream.barsNminSql`). */
  private[graft] val barsNminSqlCte =
    s"""WITH nt AS (
       |  SELECT event_type, epoch_us(ts) // $BucketUs AS bucket,
       |    epoch_us(ts) AS us, event_id,
       |    CAST(round(value * 100) AS BIGINT) AS cents,
       |    ROW_NUMBER() OVER (
       |      PARTITION BY event_type, epoch_us(ts) // $BucketUs
       |      ORDER BY epoch_us(ts), event_id) AS ra,
       |    ROW_NUMBER() OVER (
       |      PARTITION BY event_type, epoch_us(ts) // $BucketUs
       |      ORDER BY epoch_us(ts) DESC, event_id DESC) AS rd
       |  FROM events),
       |nbars AS (
       |  SELECT event_type, bucket,
       |    MAX(CASE WHEN ra = 1 THEN cents END) AS open_cents,
       |    MAX(cents) AS high_cents,
       |    MIN(cents) AS low_cents,
       |    MAX(CASE WHEN rd = 1 THEN cents END) AS close_cents,
       |    COUNT(*) AS n_ticks,
       |    CAST(SUM(cents) AS BIGINT) AS notional_cents
       |  FROM nt GROUP BY 1, 2)""".stripMargin

  private val barsNminSql =
    s"""$barsNminSqlCte,
       |grid AS (
       |  SELECT event_type, unnest(generate_series(b0, b1)) AS bucket
       |  FROM (SELECT event_type, MIN(bucket) AS b0, MAX(bucket) AS b1
       |        FROM nbars GROUP BY 1)),
       |filled AS (
       |  SELECT g.event_type, g.bucket, b.open_cents, b.high_cents,
       |    b.low_cents, b.close_cents, COALESCE(b.n_ticks, 0) AS n_ticks,
       |    b.notional_cents
       |  FROM grid g LEFT JOIN nbars b
       |    ON b.event_type = g.event_type AND b.bucket = g.bucket)
       |SELECT event_type,
       |  strftime(make_timestamp(bucket * $BucketUs), '%Y-%m-%d %H:%M')
       |    AS bucket_start,
       |  n_ticks, open_cents, high_cents, low_cents, close_cents,
       |  notional_cents,
       |  last_value(close_cents IGNORE NULLS) OVER (
       |    PARTITION BY event_type ORDER BY bucket
       |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
       |    AS close_ffill_cents,
       |  CASE WHEN open_cents IS NULL THEN 1 ELSE 0 END AS is_gap
       |FROM filled ORDER BY event_type, bucket""".stripMargin

  // -------------------------------------------------------------- q_vwap
  /** Monthly volume-weighted average price per return flag over
    * lineitem — the one fixture table with both price and quantity
    * (l_extendedprice is already price × qty, the VWAP numerator).
    * vwap_cents = Σ(extended cents) DIV Σ(qty): exact floor division of
    * two exact sums. Scale shape: ONE keyed aggregation with map-side
    * partials; nothing else. */
  private def vwap(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.lineitem(s, dir)
      .select($"l_returnflag",
        date_format($"l_shipdate", "yyyy-MM").as("month"),
        round($"l_extendedprice" * 100).cast("long").as("ext_cents"),
        $"l_quantity".cast("long").as("qty"))
      .groupBy($"l_returnflag", $"month")
      .agg(sum($"ext_cents").as("notional_cents"),
        sum($"qty").as("qty_total"),
        count(lit(1)).as("n_lines"))
      .withColumn("vwap_cents", expr("notional_cents DIV qty_total"))
      .select($"l_returnflag", $"month", $"n_lines", $"qty_total",
        $"notional_cents", $"vwap_cents")
      .orderBy($"l_returnflag", $"month")
  }

  private val vwapSql =
    """WITH l AS (
      |  SELECT l_returnflag, strftime(l_shipdate, '%Y-%m') AS month,
      |    CAST(round(l_extendedprice * 100) AS BIGINT) AS ext_cents,
      |    CAST(l_quantity AS BIGINT) AS qty
      |  FROM lineitem)
      |SELECT l_returnflag, month, COUNT(*) AS n_lines,
      |  CAST(SUM(qty) AS BIGINT) AS qty_total,
      |  CAST(SUM(ext_cents) AS BIGINT) AS notional_cents,
      |  CAST(SUM(ext_cents) // SUM(qty) AS BIGINT) AS vwap_cents
      |FROM l GROUP BY 1, 2
      |ORDER BY l_returnflag, month""".stripMargin

  // ------------------------------------------------------ q_max_drawdown
  /** Maximum drawdown per instrument: running peak of the daily close,
    * worst peak-to-close drop in ppm of the peak, and the day it
    * bottomed (ties broken to the earliest day via the unique
    * (dd_ppm DESC, day ASC) rank). The unbounded-preceding running max
    * is safe because it runs over the calendar-bounded bar grid, not
    * ticks (object scaladoc). */
  private def maxDrawdown(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val wRun = Window.partitionBy($"event_type").orderBy($"day")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val withDd = bars(s, dir)
      .withColumn("run_max", max($"close_cents").over(wRun))
      .withColumn("dd_cents", $"run_max" - $"close_cents")
      .withColumn("dd_ppm",
        coalesce(expr("dd_cents * 1000000 DIV nullif(run_max, 0)"), lit(0L)))
    withDd
      .withColumn("rk", row_number().over(
        Window.partitionBy($"event_type").orderBy($"dd_ppm".desc, $"day")))
      .filter($"rk" === 1)
      .select($"event_type", $"day".as("trough_day"),
        $"run_max".as("peak_cents"), $"close_cents".as("trough_cents"),
        $"dd_cents".as("max_dd_cents"), $"dd_ppm".as("max_dd_ppm"))
      .orderBy($"event_type")
  }

  private val maxDrawdownSql =
    s"""$barsSqlCte,
       |dd AS (
       |  SELECT event_type, day, close_cents,
       |    MAX(close_cents) OVER (PARTITION BY event_type ORDER BY day
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS run_max
       |  FROM bars),
       |dd2 AS (
       |  SELECT event_type, day, close_cents, run_max,
       |    run_max - close_cents AS dd_cents,
       |    COALESCE((run_max - close_cents) * 1000000
       |      // NULLIF(run_max, 0), 0) AS dd_ppm
       |  FROM dd),
       |rk AS (
       |  SELECT *, ROW_NUMBER() OVER (PARTITION BY event_type
       |    ORDER BY dd_ppm DESC, day) AS rk
       |  FROM dd2)
       |SELECT event_type, day AS trough_day, run_max AS peak_cents,
       |  close_cents AS trough_cents, dd_cents AS max_dd_cents,
       |  dd_ppm AS max_dd_ppm
       |FROM rk WHERE rk = 1 ORDER BY event_type""".stripMargin

  // --------------------------------------------------------------- q_rsi
  /** 14-day RSI (simple-average Cutler form, the window-expressible
    * one): per instrument-day with a full 14-diff history,
    * rsi_ppm = Σgain · 1e6 DIV (Σgain + Σloss) — gains/losses are exact
    * close-to-close cent diffs. A 14-day window where every diff is
    * zero yields NULL in both engines (0/0 has no RSI). */
  private def rsi(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val wo = Window.partitionBy($"event_type").orderBy($"day")
    val w14 = wo.rowsBetween(-13, 0)
    bars(s, dir)
      .withColumn("prev", lag($"close_cents", 1).over(wo))
      .filter($"prev".isNotNull)
      .withColumn("gain", greatest($"close_cents" - $"prev", lit(0L)))
      .withColumn("loss", greatest($"prev" - $"close_cents", lit(0L)))
      .withColumn("n14", count(lit(1)).over(w14))
      .withColumn("sum_gain", sum($"gain").over(w14))
      .withColumn("sum_loss", sum($"loss").over(w14))
      .filter($"n14" === 14)
      .select($"event_type", $"day", $"close_cents",
        expr("sum_gain * 1000000 DIV nullif(sum_gain + sum_loss, 0)")
          .as("rsi_ppm"))
      .orderBy($"event_type", $"day")
  }

  private val rsiSql =
    s"""$barsSqlCte,
       |d AS (
       |  SELECT event_type, day, close_cents,
       |    LAG(close_cents) OVER (PARTITION BY event_type ORDER BY day)
       |      AS prev
       |  FROM bars),
       |g AS (
       |  SELECT event_type, day, close_cents,
       |    GREATEST(close_cents - prev, 0) AS gain,
       |    GREATEST(prev - close_cents, 0) AS loss
       |  FROM d WHERE prev IS NOT NULL),
       |w AS (
       |  SELECT event_type, day, close_cents,
       |    COUNT(*) OVER w14 AS n14,
       |    CAST(SUM(gain) OVER w14 AS BIGINT) AS sum_gain,
       |    CAST(SUM(loss) OVER w14 AS BIGINT) AS sum_loss
       |  FROM g
       |  WINDOW w14 AS (PARTITION BY event_type ORDER BY day
       |    ROWS BETWEEN 13 PRECEDING AND CURRENT ROW))
       |SELECT event_type, day, close_cents,
       |  sum_gain * 1000000 // NULLIF(sum_gain + sum_loss, 0) AS rsi_ppm
       |FROM w WHERE n14 = 14
       |ORDER BY event_type, day""".stripMargin

  // --------------------------------------------------------- q_bollinger
  /** 20-day Bollinger band breaches without a single float: with
    * S = Σclose and Q = Σclose² over the 20-day frame,
    * |close − μ| > 2σ  ⟺  (20·close − S)² > 4·(20·Q − S²) — all exact
    * BIGINT (close ≤ ~5.7e4 cents ⟹ every term < 2^41). The reported
    * mean is exact in millicents (S·50, since n is pinned to 20), and
    * 400·σ² = 20·Q − S² rides along as var_x400_cents2. */
  private def bollinger(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val w20 = Window.partitionBy($"event_type").orderBy($"day")
      .rowsBetween(-19, 0)
    bars(s, dir)
      .withColumn("n20", count(lit(1)).over(w20))
      .withColumn("s20", sum($"close_cents").over(w20))
      .withColumn("q20", sum($"close_cents" * $"close_cents").over(w20))
      .filter($"n20" === 20)
      .withColumn("dev20", $"close_cents" * 20 - $"s20")
      .withColumn("var400", $"q20" * 20 - $"s20" * $"s20")
      .select($"event_type", $"day", $"close_cents",
        ($"s20" * 50).as("mean_millicents"),
        $"var400".as("var_x400_cents2"),
        when($"dev20" > 0 && $"dev20" * $"dev20" > $"var400" * 4, 1L)
          .otherwise(0L).as("breach_up"),
        when($"dev20" < 0 && $"dev20" * $"dev20" > $"var400" * 4, 1L)
          .otherwise(0L).as("breach_down"))
      .orderBy($"event_type", $"day")
  }

  private val bollingerSql =
    s"""$barsSqlCte,
       |w AS (
       |  SELECT event_type, day, close_cents,
       |    COUNT(*) OVER w20 AS n20,
       |    CAST(SUM(close_cents) OVER w20 AS BIGINT) AS s20,
       |    CAST(SUM(close_cents * close_cents) OVER w20 AS BIGINT) AS q20
       |  FROM bars
       |  WINDOW w20 AS (PARTITION BY event_type ORDER BY day
       |    ROWS BETWEEN 19 PRECEDING AND CURRENT ROW)),
       |b AS (
       |  SELECT event_type, day, close_cents, s20,
       |    close_cents * 20 - s20 AS dev20,
       |    q20 * 20 - s20 * s20 AS var400
       |  FROM w WHERE n20 = 20)
       |SELECT event_type, day, close_cents,
       |  s20 * 50 AS mean_millicents,
       |  var400 AS var_x400_cents2,
       |  CASE WHEN dev20 > 0 AND dev20 * dev20 > var400 * 4
       |    THEN 1 ELSE 0 END AS breach_up,
       |  CASE WHEN dev20 < 0 AND dev20 * dev20 > var400 * 4
       |    THEN 1 ELSE 0 END AS breach_down
       |FROM b ORDER BY event_type, day""".stripMargin

  // -------------------------------------------------------------- q_beta
  /** Market beta per instrument from daily close DIFFS (cents — diffs,
    * not ratio returns, keep the arithmetic in a provable BIGINT
    * envelope: |diff| < 1e5 cents and ≤ 29 grid days ⟹ every sufficient
    * statistic < 2^54; IndicatorsSpec asserts the envelope per
    * fixture). The market move m is the cross-sectional diff sum over
    * days where ALL instruments trade. β̂ in milli:
    * (n·Σxm − Σx·Σm)·1000 DIV (n·Σm² − (Σm)²), and the regression
    * intercept α̂ = (Σx − β̂·Σm)/n in millicents rides along — both
    * truncate-toward-zero in both engines.
    *
    * Scale shape: diffs live on the bar grid; the market frame is one
    * day-keyed rollup of that grid joined back on day (grid-sized, not
    * data-sized); the sufficient statistics are one instrument-keyed
    * aggregation. */
  private def beta(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val wo = Window.partitionBy($"event_type").orderBy($"day")
    val diffs = bars(s, dir)
      .withColumn("prev", lag($"close_cents", 1).over(wo))
      .filter($"prev".isNotNull)
      .select($"event_type", $"day", ($"close_cents" - $"prev").as("x"))
    // "all instruments traded" gate without a driver action or BNLJ:
    // the 1-row distinct-instrument count broadcast-EQUI-joins the
    // day-keyed market frame on n_traded = n_instruments
    val cnt = diffs.select($"event_type").distinct()
      .agg(count(lit(1)).as("n_instruments"))
    val market = diffs.groupBy($"day")
      .agg(sum($"x").as("m"), count(lit(1)).as("n_traded"))
      .join(broadcast(cnt), $"n_traded" === $"n_instruments")
      .select($"day", $"m")
    diffs.join(market, "day")
      .groupBy($"event_type")
      .agg(count(lit(1)).as("n_days"),
        sum($"x").as("sx"),
        sum($"m").as("sm"),
        sum($"x" * $"m").as("sxm"),
        sum($"m" * $"m").as("smm"))
      .withColumn("beta_milli", expr(
        "(n_days * sxm - sx * sm) * 1000 DIV nullif(n_days * smm - sm * sm, 0)"))
      .withColumn("alpha_millicents",
        expr("(sx * 1000 - beta_milli * sm) DIV n_days"))
      .select($"event_type", $"n_days", $"sx".as("sum_diff_cents"),
        $"beta_milli", $"alpha_millicents")
      .orderBy($"event_type")
  }

  private val betaSql =
    s"""$barsSqlCte,
       |d AS (
       |  SELECT event_type, day,
       |    close_cents - LAG(close_cents) OVER (
       |      PARTITION BY event_type ORDER BY day) AS x
       |  FROM bars),
       |diffs AS (SELECT * FROM d WHERE x IS NOT NULL),
       |mkt AS (
       |  SELECT day, CAST(SUM(x) AS BIGINT) AS m
       |  FROM diffs GROUP BY day
       |  HAVING COUNT(*) = (SELECT COUNT(DISTINCT event_type) FROM diffs)),
       |stats AS (
       |  SELECT event_type, COUNT(*) AS n_days,
       |    CAST(SUM(x) AS BIGINT) AS sx, CAST(SUM(m) AS BIGINT) AS sm,
       |    CAST(SUM(x * m) AS BIGINT) AS sxm, CAST(SUM(m * m) AS BIGINT) AS smm
       |  FROM diffs JOIN mkt USING (day)
       |  GROUP BY event_type),
       |b AS (
       |  SELECT *, (n_days * sxm - sx * sm) * 1000
       |    // NULLIF(n_days * smm - sm * sm, 0) AS beta_milli
       |  FROM stats)
       |SELECT event_type, n_days, sx AS sum_diff_cents, beta_milli,
       |  (sx * 1000 - beta_milli * sm) // n_days AS alpha_millicents
       |FROM b ORDER BY event_type""".stripMargin

  // --------------------------------------------------------- q_tick_rule
  /** Lee–Ready tick rule, the classic trade-sign classifier: within each
    * (instrument, day), an uptick is a buy (+1), a downtick a sell (−1),
    * and a zero-tick inherits the LAST non-zero sign (the day's first
    * tick and any leading zero-run stay neutral, 0). Reported per
    * instrument-day: the buy/sell/neutral split, the signed notional,
    * and the order-flow imbalance (buy − sell as ppm of classified
    * ticks).
    *
    * The carry-forward is `last(chg ignore nulls)` over the running
    * prefix of the SAME (instrument, day)-partitioned tick order the
    * bars use — one window partitioning shared by lag, carry and the
    * final rollup, groups bounded by per-day arrival rate (object
    * scaladoc), never a history-sized axis. */
  private def tickRule(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val w = Window.partitionBy($"event_type", $"day")
      .orderBy($"us", $"event_id")
    val wRun = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    Tables.events(s, dir)
      .select($"event_type",
        date_format($"ts", "yyyy-MM-dd").as("day"),
        unix_micros($"ts").as("us"), $"event_id",
        round($"value" * 100).cast("long").as("cents"))
      .withColumn("prev", lag($"cents", 1).over(w))
      .withColumn("chg",
        when($"cents" > $"prev", lit(1L)).when($"cents" < $"prev", lit(-1L)))
      .withColumn("sign",
        coalesce(last($"chg", ignoreNulls = true).over(wRun), lit(0L)))
      .groupBy($"event_type", $"day")
      .agg(
        sum(when($"sign" === 1L, 1L).otherwise(0L)).as("n_buy"),
        sum(when($"sign" === -1L, 1L).otherwise(0L)).as("n_sell"),
        sum(when($"sign" === 0L, 1L).otherwise(0L)).as("n_neutral"),
        sum($"sign" * $"cents").as("signed_notional_cents"))
      .withColumn("imbalance_ppm",
        expr("(n_buy - n_sell) * 1000000 DIV nullif(n_buy + n_sell, 0)"))
      .select($"event_type", $"day", $"n_buy", $"n_sell", $"n_neutral",
        $"signed_notional_cents", $"imbalance_ppm")
      .orderBy($"event_type", $"day")
  }

  private val tickRuleSql =
    """WITH t AS (
      |  SELECT event_type, strftime(ts, '%Y-%m-%d') AS day,
      |    epoch_us(ts) AS us, event_id,
      |    CAST(round(value * 100) AS BIGINT) AS cents
      |  FROM events),
      |c AS (
      |  SELECT event_type, day, us, event_id, cents,
      |    CASE WHEN cents > LAG(cents) OVER w THEN 1
      |         WHEN cents < LAG(cents) OVER w THEN -1 END AS chg
      |  FROM t
      |  WINDOW w AS (PARTITION BY event_type, day ORDER BY us, event_id)),
      |sgn AS (
      |  SELECT event_type, day, cents,
      |    COALESCE(LAST_VALUE(chg IGNORE NULLS) OVER (
      |      PARTITION BY event_type, day ORDER BY us, event_id
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 0) AS sign
      |  FROM c),
      |agg AS (
      |  SELECT event_type, day,
      |    CAST(SUM(CASE WHEN sign = 1 THEN 1 ELSE 0 END) AS BIGINT)
      |      AS n_buy,
      |    CAST(SUM(CASE WHEN sign = -1 THEN 1 ELSE 0 END) AS BIGINT)
      |      AS n_sell,
      |    CAST(SUM(CASE WHEN sign = 0 THEN 1 ELSE 0 END) AS BIGINT)
      |      AS n_neutral,
      |    CAST(SUM(sign * cents) AS BIGINT) AS signed_notional_cents
      |  FROM sgn GROUP BY 1, 2)
      |SELECT event_type, day, n_buy, n_sell, n_neutral,
      |  signed_notional_cents,
      |  (n_buy - n_sell) * 1000000 // NULLIF(n_buy + n_sell, 0)
      |    AS imbalance_ppm
      |FROM agg ORDER BY event_type, day""".stripMargin

  // ----------------------------------------------------- q_triple_barrier
  /** Triple-barrier labeling (López de Prado, *Advances in Financial
    * ML* ch. 3) — the label-generation step of a financial training-data
    * pipeline: entering at each day's close, the label is the FIRST
    * barrier hit over the next `Horizon` bars — upper (+2%), lower
    * (−2%), or the time barrier (timeout → 0). A bar whose high and low
    * cross BOTH price barriers is 'ambiguous' (the intraday path is
    * unobserved at bar resolution) and labels 0 — the deterministic
    * resolution both engines share. Barriers are exact: ±(entry ×
    * 20000 DIV 1e6) cents.
    *
    * Scale shape: `Horizon` LEADs over the per-instrument bar grid (one
    * partitioned window pass), then row-local CASE logic — the horizon
    * scan never joins or re-shuffles. */
  val BarrierPpm = 20000L
  val Horizon = 5

  private def tripleBarrier(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val wo = Window.partitionBy($"event_type").orderBy($"day")
    val leaded = (1 to Horizon).foldLeft(
      bars(s, dir).select($"event_type", $"day", $"high_cents",
        $"low_cents", $"close_cents".as("entry"))) { (d, k) =>
      d.withColumn(s"h$k", lead($"high_cents", k).over(wo))
        .withColumn(s"l$k", lead($"low_cents", k).over(wo))
    }
    val hits = leaded
      .filter(col(s"h$Horizon").isNotNull)
      .withColumn("up", expr(s"entry + (entry * $BarrierPpm) DIV 1000000"))
      .withColumn("dn", expr(s"entry - (entry * $BarrierPpm) DIV 1000000"))
      .selectExpr(Seq("event_type", "day", "entry", "up", "dn") ++
        (1 to Horizon).map(k =>
          s"""CASE WHEN h$k >= up AND l$k <= dn THEN 0
             | WHEN h$k >= up THEN 1
             | WHEN l$k <= dn THEN -1 END AS hit$k""".stripMargin): _*)
    hits.selectExpr("event_type", "day",
      "entry AS entry_cents", "up AS up_cents", "dn AS down_cents",
      s"CAST(COALESCE(${(1 to Horizon).map(k => s"hit$k").mkString(", ")}, 0) AS BIGINT) AS label",
      s"""CASE WHEN COALESCE(${(1 to Horizon).map(k => s"hit$k").mkString(", ")}) IS NULL THEN 'timeout'
         | WHEN COALESCE(${(1 to Horizon).map(k => s"hit$k").mkString(", ")}) = 0 THEN 'ambiguous'
         | WHEN COALESCE(${(1 to Horizon).map(k => s"hit$k").mkString(", ")}) = 1 THEN 'up'
         | ELSE 'down' END AS outcome""".stripMargin,
      s"""CAST(CASE ${(1 to Horizon).map(k =>
        s"WHEN hit$k IS NOT NULL THEN $k").mkString(" ")}
         | END AS BIGINT) AS days_to_hit""".stripMargin)
      .orderBy($"event_type", $"day")
  }

  private val tripleBarrierSql = {
    val hitCases = (1 to Horizon).map(k =>
      s"""    CASE WHEN h$k >= up AND l$k <= dn THEN 0
         |         WHEN h$k >= up THEN 1
         |         WHEN l$k <= dn THEN -1 END AS hit$k""".stripMargin)
      .mkString(",\n")
    val coal = (1 to Horizon).map(k => s"hit$k").mkString(", ")
    val dth = (1 to Horizon).map(k => s"WHEN hit$k IS NOT NULL THEN $k")
      .mkString(" ")
    s"""$barsSqlCte,
       |led AS (
       |  SELECT event_type, day, close_cents AS entry,
       |    close_cents + (close_cents * $BarrierPpm) // 1000000 AS up,
       |    close_cents - (close_cents * $BarrierPpm) // 1000000 AS dn,
       |${(1 to Horizon).map(k =>
        s"""    LEAD(high_cents, $k) OVER w AS h$k,
           |    LEAD(low_cents, $k) OVER w AS l$k""".stripMargin)
        .mkString(",\n")}
       |  FROM bars
       |  WINDOW w AS (PARTITION BY event_type ORDER BY day)),
       |hits AS (
       |  SELECT event_type, day, entry, up, dn,
       |$hitCases
       |  FROM led WHERE h$Horizon IS NOT NULL)
       |SELECT event_type, day, entry AS entry_cents, up AS up_cents,
       |  dn AS down_cents,
       |  CAST(COALESCE($coal, 0) AS BIGINT) AS label,
       |  CASE WHEN COALESCE($coal) IS NULL THEN 'timeout'
       |       WHEN COALESCE($coal) = 0 THEN 'ambiguous'
       |       WHEN COALESCE($coal) = 1 THEN 'up'
       |       ELSE 'down' END AS outcome,
       |  CAST(CASE $dth END AS BIGINT) AS days_to_hit
       |FROM hits ORDER BY event_type, day""".stripMargin
  }

  // ------------------------------------------------------ q_embargo_split
  /** Purged k-fold split with embargo (López de Prado ch. 7) — the
    * leakage-safe train/test assignment for serially-correlated
    * (financial) data: the day grid splits into `Folds` contiguous test
    * ranges, and for each fold every train day within `EmbargoDays` of
    * the test range is PURGED (features computed over lookback windows
    * would straddle the boundary). One row per (fold, day) with the
    * day's event mass, so downstream mixture accounting is exact.
    *
    * Scale shape: the grid is calendar-bounded (30 rows here), so the
    * day-index rank is an audited global window over a grid frame —
    * audited-global-window(q_embargo_split) — and the fold fan-out is a
    * row-local explode(sequence), never a join. At 100 TB only the
    * per-day event counts (one keyed agg) touch data volume. */
  val Folds = 3L
  val EmbargoDays = 2L

  private def embargoSplit(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val dayCounts = Tables.events(s, dir)
      .groupBy(date_format($"ts", "yyyy-MM-dd").as("day"))
      .agg(count(lit(1)).as("n_events"))
    dayCounts
      // audited-global-window(q_embargo_split): calendar day grid
      .withColumn("idx",
        row_number().over(Window.orderBy($"day")).cast("long") - 1)
      .withColumn("n_days", count(lit(1)).over(Window.partitionBy()))
      .withColumn("fold", explode(sequence(lit(0L), lit(Folds - 1))))
      .withColumn("lo", expr(s"fold * n_days DIV $Folds"))
      .withColumn("hi", expr(s"(fold + 1) * n_days DIV $Folds"))
      .withColumn("role",
        when($"idx" >= $"lo" && $"idx" < $"hi", "test")
          .when($"idx" >= $"lo" - EmbargoDays && $"idx" < $"hi" + EmbargoDays,
            "purged")
          .otherwise("train"))
      .select($"fold", $"day", $"idx", $"n_events", $"role")
      .orderBy($"fold", $"day")
  }

  private val embargoSplitSql =
    s"""WITH d AS (
       |  SELECT strftime(ts, '%Y-%m-%d') AS day, COUNT(*) AS n_events
       |  FROM events GROUP BY 1),
       |g AS (
       |  SELECT day, n_events,
       |    CAST(ROW_NUMBER() OVER (ORDER BY day) AS BIGINT) - 1 AS idx,
       |    COUNT(*) OVER () AS n_days
       |  FROM d),
       |f AS (
       |  SELECT g.*, CAST(fold AS BIGINT) AS fold
       |  FROM g CROSS JOIN (SELECT unnest([${(0L until Folds).mkString(", ")}]) AS fold)),
       |r AS (
       |  SELECT fold, day, idx, n_events,
       |    fold * n_days // $Folds AS lo,
       |    (fold + 1) * n_days // $Folds AS hi
       |  FROM f)
       |SELECT fold, day, idx, n_events,
       |  CASE WHEN idx >= lo AND idx < hi THEN 'test'
       |       WHEN idx >= lo - $EmbargoDays AND idx < hi + $EmbargoDays
       |         THEN 'purged'
       |       ELSE 'train' END AS role
       |FROM r ORDER BY fold, day""".stripMargin

  // ---------------------------------------------------- q_candle_patterns
  /** Candlestick pattern flags per bar — doji (body ≤ 10% of range),
    * bullish/bearish engulfing vs the previous bar's body, and
    * gap-up/gap-down vs the previous bar's range. Pure integer
    * comparisons over the bar grid + one LAG pass; a first bar (no
    * previous) flags 0 on every prev-dependent pattern (NULL comparisons
    * fall to the CASE ELSE in both engines). */
  private def candlePatterns(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val wo = Window.partitionBy($"event_type").orderBy($"day")
    bars(s, dir)
      .withColumn("po", lag($"open_cents", 1).over(wo))
      .withColumn("pc", lag($"close_cents", 1).over(wo))
      .withColumn("ph", lag($"high_cents", 1).over(wo))
      .withColumn("pl", lag($"low_cents", 1).over(wo))
      .select($"event_type", $"day", $"open_cents", $"close_cents",
        when(abs($"close_cents" - $"open_cents") * 10 <=
          $"high_cents" - $"low_cents", 1L).otherwise(0L).as("doji"),
        when($"pc" < $"po" && $"close_cents" > $"open_cents" &&
          $"open_cents" <= $"pc" && $"close_cents" >= $"po", 1L)
          .otherwise(0L).as("bull_engulf"),
        when($"pc" > $"po" && $"close_cents" < $"open_cents" &&
          $"open_cents" >= $"pc" && $"close_cents" <= $"po", 1L)
          .otherwise(0L).as("bear_engulf"),
        when($"low_cents" > $"ph", 1L).otherwise(0L).as("gap_up"),
        when($"high_cents" < $"pl", 1L).otherwise(0L).as("gap_down"))
      .orderBy($"event_type", $"day")
  }

  private val candlePatternsSql =
    s"""$barsSqlCte,
       |p AS (
       |  SELECT event_type, day, open_cents, close_cents, high_cents,
       |    low_cents,
       |    LAG(open_cents) OVER w AS po,
       |    LAG(close_cents) OVER w AS pc,
       |    LAG(high_cents) OVER w AS ph,
       |    LAG(low_cents) OVER w AS pl
       |  FROM bars
       |  WINDOW w AS (PARTITION BY event_type ORDER BY day))
       |SELECT event_type, day, open_cents, close_cents,
       |  CAST(CASE WHEN abs(close_cents - open_cents) * 10 <=
       |    high_cents - low_cents THEN 1 ELSE 0 END AS BIGINT) AS doji,
       |  CAST(CASE WHEN pc < po AND close_cents > open_cents
       |    AND open_cents <= pc AND close_cents >= po
       |    THEN 1 ELSE 0 END AS BIGINT) AS bull_engulf,
       |  CAST(CASE WHEN pc > po AND close_cents < open_cents
       |    AND open_cents >= pc AND close_cents <= po
       |    THEN 1 ELSE 0 END AS BIGINT) AS bear_engulf,
       |  CAST(CASE WHEN low_cents > ph THEN 1 ELSE 0 END AS BIGINT)
       |    AS gap_up,
       |  CAST(CASE WHEN high_cents < pl THEN 1 ELSE 0 END AS BIGINT)
       |    AS gap_down
       |FROM p ORDER BY event_type, day""".stripMargin

  // -------------------------------------------------------------- q_var_es
  /** Historical VaR and expected shortfall at 95% — exact order
    * statistics, no quantile interpolation: over each instrument's
    * daily close diffs, k = ⌈0.05·n⌉ (integer ceil-div), VaR is the
    * k-th worst diff (a row_number pick on the unique (diff, day) key)
    * and ES is the exact mean of the k worst in millicents (Σ·1000
    * DIV k). Scale shape: one per-instrument rank window over the
    * calendar-bounded bar grid + the instrument-keyed rollup. */
  private def varEs(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val wo = Window.partitionBy($"event_type").orderBy($"day")
    val wRank = Window.partitionBy($"event_type").orderBy($"x", $"day")
    bars(s, dir)
      .withColumn("prev", lag($"close_cents", 1).over(wo))
      .filter($"prev".isNotNull)
      .select($"event_type", $"day", ($"close_cents" - $"prev").as("x"))
      .withColumn("rk", row_number().over(wRank).cast("long"))
      .withColumn("n",
        count(lit(1)).over(Window.partitionBy($"event_type")))
      .withColumn("k", expr("(n * 5 + 99) DIV 100"))
      .filter($"rk" <= $"k")
      .groupBy($"event_type")
      .agg(max($"n").as("n_days"), max($"k").as("k"),
        max($"x").as("var_cents"),
        expr("sum(x) * 1000 DIV max(k)").as("es_millicents"))
      .select($"event_type", $"n_days", $"k", $"var_cents",
        $"es_millicents")
      .orderBy($"event_type")
  }

  private val varEsSql =
    s"""$barsSqlCte,
       |d AS (
       |  SELECT event_type, day,
       |    close_cents - LAG(close_cents) OVER (
       |      PARTITION BY event_type ORDER BY day) AS x
       |  FROM bars),
       |r AS (
       |  SELECT event_type, day, x,
       |    CAST(ROW_NUMBER() OVER (PARTITION BY event_type
       |      ORDER BY x, day) AS BIGINT) AS rk,
       |    COUNT(*) OVER (PARTITION BY event_type) AS n
       |  FROM d WHERE x IS NOT NULL)
       |SELECT event_type, CAST(MAX(n) AS BIGINT) AS n_days,
       |  CAST(MAX((n * 5 + 99) // 100) AS BIGINT) AS k,
       |  MAX(x) AS var_cents,
       |  CAST(SUM(x) AS BIGINT) * 1000 // MAX((n * 5 + 99) // 100)
       |    AS es_millicents
       |FROM r WHERE rk <= (n * 5 + 99) // 100
       |GROUP BY event_type ORDER BY event_type""".stripMargin

  // -------------------------------------------------------------- q_amihud
  /** Amihud (2002) illiquidity — mean over days of |Δclose| per unit of
    * traded notional, the classic price-impact-per-volume proxy: per
    * day, |x|·1e9 DIV notional_cents (exact — |x| < 1e5 keeps the ×1e9
    * product < 1e14); per instrument, the exact integer mean of the
    * daily ratios. Scale shape: the diff window over the bar grid, one
    * instrument-keyed rollup. */
  private def amihud(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val wo = Window.partitionBy($"event_type").orderBy($"day")
    bars(s, dir)
      .withColumn("prev", lag($"close_cents", 1).over(wo))
      .filter($"prev".isNotNull)
      .select($"event_type", $"day",
        abs($"close_cents" - $"prev").as("adx"), $"notional_cents")
      .withColumn("illiq_ppb", expr("adx * 1000000000 DIV notional_cents"))
      .groupBy($"event_type")
      .agg(count(lit(1)).as("n_days"),
        sum($"adx").as("sum_abs_diff_cents"),
        expr("sum(illiq_ppb) DIV count(1)").as("amihud_ppb"))
      .orderBy($"event_type")
  }

  private val amihudSql =
    s"""$barsSqlCte,
       |d AS (
       |  SELECT event_type, day, notional_cents,
       |    abs(close_cents - LAG(close_cents) OVER (
       |      PARTITION BY event_type ORDER BY day)) AS adx
       |  FROM bars),
       |r AS (
       |  SELECT event_type, adx,
       |    adx * 1000000000 // notional_cents AS illiq_ppb
       |  FROM d WHERE adx IS NOT NULL)
       |SELECT event_type, COUNT(*) AS n_days,
       |  CAST(SUM(adx) AS BIGINT) AS sum_abs_diff_cents,
       |  CAST(SUM(illiq_ppb) AS BIGINT) // COUNT(*) AS amihud_ppb
       |FROM r GROUP BY event_type ORDER BY event_type""".stripMargin

  val all: Seq[NamedQuery] = Seq(
    NamedQuery("q_ohlc", ohlc, Some(ohlcSql), bench = true),
    NamedQuery("q_bars_nmin", barsNmin, Some(barsNminSql), bench = true),
    NamedQuery("q_vwap", vwap, Some(vwapSql), bench = true),
    NamedQuery("q_max_drawdown", maxDrawdown, Some(maxDrawdownSql),
      bench = true),
    NamedQuery("q_rsi", rsi, Some(rsiSql), bench = true),
    NamedQuery("q_bollinger", bollinger, Some(bollingerSql), bench = true),
    NamedQuery("q_beta", beta, Some(betaSql), bench = true),
    NamedQuery("q_tick_rule", tickRule, Some(tickRuleSql), bench = true),
    NamedQuery("q_triple_barrier", tripleBarrier, Some(tripleBarrierSql),
      bench = true),
    NamedQuery("q_embargo_split", embargoSplit, Some(embargoSplitSql),
      bench = true),
    NamedQuery("q_candle_patterns", candlePatterns, Some(candlePatternsSql),
      bench = true),
    NamedQuery("q_var_es", varEs, Some(varEsSql), bench = true),
    NamedQuery("q_amihud", amihud, Some(amihudSql), bench = true))
}
