package graft.operators

import graft.LineageCut._
import graft.{NamedQuery, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Round-6 analytics wave: rank-based dependence (Kendall τ), robust
  * trend (Theil–Sen), randomness diagnostics (Wald–Wolfowitz runs),
  * lagged cross-correlation, least-squares changepoint, sweep-line
  * concurrency, and relational division.
  *
  * The time-series members all follow the q_acf contract: ONE
  * corpus-scale aggregation collapses the fact table to the
  * calendar-month grid (bounded by data lifetime — thousands of rows at
  * any corpus size), and everything after runs on that tiny frame with
  * exact integer/DECIMAL arithmetic; floats appear only in a final
  * division (or IEEE-exact sqrt) on bit-identical operands, rounded at
  * 9dp for output. Unpartitioned windows here are over the month grid
  * or its pair grid — audited in UnpartitionedWindowAudit. */
object AnalyticsExtra {

  private val d38 = DecimalType(38, 0)

  /** Monthly revenue cents + order count — the shared bounded series. */
  private def monthly(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.orders(s, dir)
      .groupBy(date_format($"o_orderdate", "yyyy-MM").as("month"))
      .agg((sum($"o_totalprice".cast(DecimalType(28, 2))) * 100)
        .cast("long").as("cents"),
        count(lit(1)).as("n_orders"))
  }

  private val monthlySql =
    """SELECT strftime(o_orderdate, '%Y-%m') AS month,
      |    CAST(SUM(CAST(o_totalprice AS DECIMAL(28,2))) * 100 AS BIGINT)
      |      AS cents,
      |    COUNT(*) AS n_orders
      |  FROM orders GROUP BY 1""".stripMargin

  // -------------------------------------------------------------- q_kendall_tau
  // audited-global-window(q_kendall_tau): frame = month grid (pair frame is calendar^2-bounded) — bound audited in PlanAuditSpec/UnpartitionedWindowAudit
  // audited-bnlj(q_kendall_tau): build side = calendar^2-bounded month-pair frame — audited in PlanAuditSpec/BnljAudit
  /** Kendall rank correlation between monthly revenue and monthly order
    * volume — the tie-robust alternative to Pearson/Spearman (q_correlation /
    * q_spearman): do high-volume months tend to be high-revenue months?
    * All pair classification is exact 64-bit sign arithmetic (concordant,
    * discordant, ties split by axis), and τ_a = (C − D) / n_pairs is the
    * one output division. Pair enumeration is the month grid joined to
    * itself on i < j — calendar², bounded by construction (80 months →
    * 3 160 pairs; even a century of data is ~720k pairs), with the small
    * side broadcast so no cartesian plans. */
  private def kendallTau(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val m = monthly(s, dir)
      .withColumn("i", row_number().over(Window.orderBy($"month")))
      .select($"i", $"cents", $"n_orders")
    val pairs = m.select($"i", $"cents".as("xa"), $"n_orders".as("ya"))
      .join(broadcast(m.select($"i".as("j"), $"cents".as("xb"),
        $"n_orders".as("yb"))), $"j" > $"i")
    val dx = signum($"xb" - $"xa")
    val dy = signum($"yb" - $"ya")
    pairs
      .agg(count(lit(1)).as("n_pairs"),
        sum(when(dx * dy > 0, 1L).otherwise(0L)).as("concordant"),
        sum(when(dx * dy < 0, 1L).otherwise(0L)).as("discordant"),
        sum(when(dx === 0 && dy =!= 0, 1L).otherwise(0L)).as("ties_x"),
        sum(when(dy === 0 && dx =!= 0, 1L).otherwise(0L)).as("ties_y"),
        sum(when(dx === 0 && dy === 0, 1L).otherwise(0L)).as("ties_xy"))
      .withColumn("tau_a",
        round(($"concordant" - $"discordant").cast("double") / $"n_pairs", 9))
  }

  private val kendallTauSql =
    s"""WITH monthly AS ($monthlySql),
      |m AS (
      |  SELECT ROW_NUMBER() OVER (ORDER BY month) AS i, cents, n_orders
      |  FROM monthly),
      |p AS (
      |  SELECT sign(b.cents - a.cents) AS dx,
      |    sign(b.n_orders - a.n_orders) AS dy
      |  FROM m a JOIN m b ON b.i > a.i)
      |SELECT COUNT(*) AS n_pairs,
      |  CAST(SUM(CASE WHEN dx * dy > 0 THEN 1 ELSE 0 END) AS BIGINT)
      |    AS concordant,
      |  CAST(SUM(CASE WHEN dx * dy < 0 THEN 1 ELSE 0 END) AS BIGINT)
      |    AS discordant,
      |  CAST(SUM(CASE WHEN dx = 0 AND dy <> 0 THEN 1 ELSE 0 END) AS BIGINT)
      |    AS ties_x,
      |  CAST(SUM(CASE WHEN dy = 0 AND dx <> 0 THEN 1 ELSE 0 END) AS BIGINT)
      |    AS ties_y,
      |  CAST(SUM(CASE WHEN dx = 0 AND dy = 0 THEN 1 ELSE 0 END) AS BIGINT)
      |    AS ties_xy,
      |  round(CAST(SUM(CASE WHEN dx * dy > 0 THEN 1 ELSE 0 END)
      |    - SUM(CASE WHEN dx * dy < 0 THEN 1 ELSE 0 END) AS DOUBLE)
      |    / COUNT(*), 9) AS tau_a
      |FROM p""".stripMargin

  // --------------------------------------------------------------- q_theil_sen
  // audited-global-window(q_theil_sen): frame = month grid + calendar^2-bounded slope-pair rank — bound audited in PlanAuditSpec/UnpartitionedWindowAudit
  // audited-bnlj(q_theil_sen): build side = calendar^2-bounded month-pair frame — audited in PlanAuditSpec/BnljAudit
  /** Theil–Sen robust trend: the LOWER MEDIAN of all pairwise slopes of
    * the monthly revenue series — outlier-months can't drag it the way
    * they drag an OLS fit. Each slope is one IEEE division of exact
    * integers (Δcents / Δmonth-index), ordering is (slope, i, j) so
    * exactly-tied slopes break deterministically, and the lower median
    * (row (n+1) DIV 2) avoids averaging two doubles. Same bounded
    * calendar² pair frame as q_kendall_tau. */
  private def theilSen(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val m = monthly(s, dir)
      .withColumn("i", row_number().over(Window.orderBy($"month")))
      .select($"i", $"cents")
    val slopes = m.select($"i", $"cents".as("xa"))
      .join(broadcast(m.select($"i".as("j"), $"cents".as("xb"))), $"j" > $"i")
      .select($"i", $"j",
        (($"xb" - $"xa").cast("double") / ($"j" - $"i")).as("slope"))
    val ranked = slopes
      .withColumn("r", row_number().over(Window.orderBy($"slope", $"i", $"j")))
      .withColumn("n_pairs", count(lit(1)).over(Window.partitionBy()))
    ranked.filter($"r" === expr("(n_pairs + 1) DIV 2"))
      .select($"n_pairs", $"i", $"j",
        round($"slope", 9).as("slope_cents_per_month"))
  }

  private val theilSenSql =
    s"""WITH monthly AS ($monthlySql),
      |m AS (
      |  SELECT ROW_NUMBER() OVER (ORDER BY month) AS i, cents FROM monthly),
      |slopes AS (
      |  SELECT a.i AS i, b.i AS j,
      |    CAST(b.cents - a.cents AS DOUBLE) / (b.i - a.i) AS slope
      |  FROM m a JOIN m b ON b.i > a.i),
      |ranked AS (
      |  SELECT i, j, slope,
      |    ROW_NUMBER() OVER (ORDER BY slope, i, j) AS r,
      |    COUNT(*) OVER () AS n_pairs
      |  FROM slopes)
      |SELECT n_pairs, i, j, round(slope, 9) AS slope_cents_per_month
      |FROM ranked WHERE r = (n_pairs + 1) // 2""".stripMargin

  // --------------------------------------------------------------- q_runs_test
  // audited-global-window(q_runs_test): frame = month grid lag/run scan — bound audited in PlanAuditSpec/UnpartitionedWindowAudit
  /** Wald–Wolfowitz runs test on the signs of month-over-month revenue
    * changes: is the up/down sequence random, trending (few long runs),
    * or mean-reverting (many short runs)? Runs, n⁺ and n⁻ are exact
    * integers off the month grid (zero-changes excluded, standard
    * practice); the expected-runs reference 1 + 2n⁺n⁻/(n⁺+n⁻) is the one
    * output division. */
  private def runsTest(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val w = Window.orderBy($"month")
    val signs = monthly(s, dir)
      .withColumn("diff", $"cents" - lag($"cents", 1).over(w))
      .filter($"diff".isNotNull && $"diff" =!= 0)
      .withColumn("sgn", signum($"diff"))
    val runs = signs
      .withColumn("prev_sgn", lag($"sgn", 1).over(Window.orderBy($"month")))
      .withColumn("new_run",
        when($"prev_sgn".isNull || $"sgn" =!= $"prev_sgn", 1L).otherwise(0L))
    runs.agg(
        sum(when($"sgn" > 0, 1L).otherwise(0L)).as("n_up"),
        sum(when($"sgn" < 0, 1L).otherwise(0L)).as("n_down"),
        sum($"new_run").as("n_runs"))
      .withColumn("expected_runs",
        round(lit(1.0) + lit(2.0) * $"n_up" * $"n_down" /
          ($"n_up" + $"n_down"), 9))
  }

  private val runsTestSql =
    s"""WITH monthly AS ($monthlySql),
      |d AS (
      |  SELECT month, cents - lag(cents) OVER (ORDER BY month) AS diff
      |  FROM monthly),
      |s AS (
      |  SELECT month, sign(diff) AS sgn FROM d
      |  WHERE diff IS NOT NULL AND diff <> 0),
      |r AS (
      |  SELECT sgn, lag(sgn) OVER (ORDER BY month) AS prev_sgn FROM s)
      |SELECT CAST(SUM(CASE WHEN sgn > 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_up,
      |  CAST(SUM(CASE WHEN sgn < 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_down,
      |  CAST(SUM(CASE WHEN prev_sgn IS NULL OR sgn <> prev_sgn THEN 1 ELSE 0 END)
      |    AS BIGINT) AS n_runs,
      |  round(1.0 + 2.0 * SUM(CASE WHEN sgn > 0 THEN 1 ELSE 0 END)
      |    * SUM(CASE WHEN sgn < 0 THEN 1 ELSE 0 END)
      |    / (SUM(CASE WHEN sgn > 0 THEN 1 ELSE 0 END)
      |       + SUM(CASE WHEN sgn < 0 THEN 1 ELSE 0 END)), 9)
      |    AS expected_runs
      |FROM r""".stripMargin

  // --------------------------------------------------------------- q_cross_corr
  // audited-global-window(q_cross_corr): frame = month grid (q_acf shape) — bound audited in PlanAuditSpec/UnpartitionedWindowAudit
  // audited-bnlj(q_cross_corr): build side = 1-row global-aggregate broadcast — audited in PlanAuditSpec/BnljAudit
  /** Lagged cross-correlation between monthly order VOLUME and monthly
    * REVENUE — does volume lead revenue, or move with it? The q_acf
    * n-scaling makes mean-centering division-free (ndx = n·x − Σx is an
    * exact integer), numerator and both denominators are exact DECIMAL
    * sums emitted as digit-exact strings, and the correlation is
    * num / sqrt(denx·deny) computed on doubles — IEEE sqrt is correctly
    * rounded, so bit-identical operands give a bit-identical result in
    * both engines. Lags 0..6 on the bounded month grid. */
  val CcfMaxLag = 6

  private def crossCorr(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val d19 = DecimalType(19, 0)
    val m = monthly(s, dir)
      .withColumn("i", row_number().over(Window.orderBy($"month")))
      .withColumn("n", count(lit(1)).over(Window.partitionBy()))
      .withColumn("sx", sum($"cents").over(Window.partitionBy()))
      .withColumn("sy", sum($"n_orders").over(Window.partitionBy()))
      .select($"i", $"n",
        ($"n" * $"cents" - $"sx").cast(d19).as("ndx"),
        ($"n" * $"n_orders" - $"sy").cast(d19).as("ndy"))
    val den = m.agg(
      sum($"ndx" * $"ndx").cast(d38).as("denx"),
      sum($"ndy" * $"ndy").cast(d38).as("deny"),
      max($"n").as("n_months"))
    val a = m.select($"i", $"ndy".as("ndy_a"))
      .withColumn("lag_k", explode(sequence(lit(0), lit(CcfMaxLag))))
    val num = a.join(m.select($"i".as("j"), $"ndx".as("ndx_b")),
        $"j" === $"i" + $"lag_k")
      .groupBy($"lag_k")
      .agg(count(lit(1)).as("n_pairs"),
        sum($"ndy_a" * $"ndx_b").cast(d38).as("num"))
    num.crossJoin(broadcast(den))
      .select($"lag_k", $"n_months", $"n_pairs",
        $"num".cast("string").as("num"),
        $"denx".cast("string").as("denx"),
        $"deny".cast("string").as("deny"),
        round($"num".cast("double") /
          sqrt($"denx".cast("double") * $"deny".cast("double")), 9).as("ccf"))
      .orderBy($"lag_k")
  }

  private val crossCorrSql =
    s"""WITH monthly AS ($monthlySql),
      |m AS (
      |  SELECT ROW_NUMBER() OVER (ORDER BY month) AS i,
      |    COUNT(*) OVER () AS n,
      |    CAST(COUNT(*) OVER () * cents - SUM(cents) OVER ()
      |      AS DECIMAL(19,0)) AS ndx,
      |    CAST(COUNT(*) OVER () * n_orders - SUM(n_orders) OVER ()
      |      AS DECIMAL(19,0)) AS ndy
      |  FROM monthly),
      |den AS (
      |  SELECT CAST(SUM(ndx * ndx) AS DECIMAL(38,0)) AS denx,
      |    CAST(SUM(ndy * ndy) AS DECIMAL(38,0)) AS deny,
      |    MAX(n) AS n_months FROM m),
      |num AS (
      |  SELECT lag_k, COUNT(*) AS n_pairs,
      |    CAST(SUM(a.ndy * b.ndx) AS DECIMAL(38,0)) AS num
      |  FROM m a
      |  CROSS JOIN (SELECT unnest(generate_series(0, $CcfMaxLag)) AS lag_k)
      |  JOIN m b ON b.i = a.i + lag_k
      |  GROUP BY lag_k)
      |SELECT lag_k, n_months, n_pairs,
      |  CAST(num AS VARCHAR) AS num,
      |  CAST(denx AS VARCHAR) AS denx, CAST(deny AS VARCHAR) AS deny,
      |  round(CAST(num AS DOUBLE)
      |    / sqrt(CAST(denx AS DOUBLE) * CAST(deny AS DOUBLE)), 9) AS ccf
      |FROM num CROSS JOIN den ORDER BY lag_k""".stripMargin

  // -------------------------------------------------------------- q_changepoint
  // audited-global-window(q_changepoint): frame = month grid prefix sums + splits argmin — bound audited in PlanAuditSpec/UnpartitionedWindowAudit
  /** Least-squares single changepoint: the split of the monthly revenue
    * series that minimizes pooled SSE — "when did the level shift?",
    * the offline complement to q_cusum's sequential detector. Prefix
    * sums S_k and SS_k are exact DECIMAL off the month grid;
    * SSE(k) = (SS_k − S_k²/k) + (SS_rest − S_rest²/(n−k)) is evaluated
    * in doubles from those exact operands with an identical expression
    * tree in both engines, and the argmin breaks ties on the earliest
    * month. Output re-states the two segment means as exact integer
    * cents (truncating DIV). */
  private def changepoint(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val w = Window.orderBy($"month")
    val grid = monthly(s, dir)
      .withColumn("k", row_number().over(w))
      .withColumn("n", count(lit(1)).over(Window.partitionBy()))
      .withColumn("s1", sum($"cents".cast(d38)).over(w))
      .withColumn("ss1",
        sum(($"cents".cast(d38) * $"cents").cast(d38)).over(w))
      .withColumn("st", sum($"cents".cast(d38)).over(Window.partitionBy()))
      .withColumn("sst",
        sum(($"cents".cast(d38) * $"cents").cast(d38))
          .over(Window.partitionBy()))
      .filter($"k" < $"n")
    val sse = grid.select($"month", $"k", $"n", $"s1", $"st",
      (($"ss1".cast("double") -
        $"s1".cast("double") * $"s1".cast("double") / $"k") +
        (($"sst" - $"ss1").cast("double") -
          ($"st" - $"s1").cast("double") * ($"st" - $"s1").cast("double") /
            ($"n" - $"k"))).as("sse_split"),
      ($"sst".cast("double") -
        $"st".cast("double") * $"st".cast("double") / $"n").as("sse_total"))
    sse.withColumn("r",
        row_number().over(Window.orderBy($"sse_split", $"month")))
      .filter($"r" === 1)
      .select($"month".as("split_month"), $"k".as("n_left"),
        ($"n" - $"k").as("n_right"),
        // integral DIV, not double division: once prefix sums pass
        // ~2^53 cents a double quotient can round across an integer
        // boundary and diverge from the oracle's exact floor
        expr("CAST(s1 AS BIGINT) DIV k").as("mean_left_cents"),
        expr("CAST(st - s1 AS BIGINT) DIV (n - k)")
          .as("mean_right_cents"),
        round($"sse_total", 6).as("sse_total"),
        round($"sse_split", 6).as("sse_split"))
  }

  private val changepointSql =
    s"""WITH monthly AS ($monthlySql),
      |g AS (
      |  SELECT month,
      |    ROW_NUMBER() OVER (ORDER BY month) AS k,
      |    COUNT(*) OVER () AS n,
      |    SUM(CAST(cents AS DECIMAL(38,0))) OVER (ORDER BY month) AS s1,
      |    SUM(CAST(CAST(cents AS DECIMAL(38,0)) * cents AS DECIMAL(38,0)))
      |      OVER (ORDER BY month) AS ss1,
      |    SUM(CAST(cents AS DECIMAL(38,0))) OVER () AS st,
      |    SUM(CAST(CAST(cents AS DECIMAL(38,0)) * cents AS DECIMAL(38,0)))
      |      OVER () AS sst
      |  FROM monthly),
      |sse AS (
      |  SELECT month, k, n, s1, st,
      |    (CAST(ss1 AS DOUBLE)
      |      - CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE) / k)
      |    + (CAST(sst - ss1 AS DOUBLE)
      |      - CAST(st - s1 AS DOUBLE) * CAST(st - s1 AS DOUBLE) / (n - k))
      |      AS sse_split,
      |    CAST(sst AS DOUBLE)
      |      - CAST(st AS DOUBLE) * CAST(st AS DOUBLE) / n AS sse_total
      |  FROM g WHERE k < n)
      |SELECT month AS split_month, k AS n_left, n - k AS n_right,
      |  CAST(CAST(s1 AS BIGINT) // k AS BIGINT) AS mean_left_cents,
      |  CAST(CAST(st - s1 AS BIGINT) // (n - k) AS BIGINT)
      |    AS mean_right_cents,
      |  round(sse_total, 6) AS sse_total, round(sse_split, 6) AS sse_split
      |FROM sse
      |QUALIFY ROW_NUMBER() OVER (ORDER BY sse_split, month) = 1""".stripMargin

  // ------------------------------------------------------------ q_max_concurrent
  /** Sweep-line concurrency: per day, the peak number of simultaneously
    * active users (interval = [first event, last event] per user-day,
    * end exclusive at +1µs) and the earliest instant it is reached.
    * Boundaries aggregate to one row per (day, instant) — starts and
    * ends counted separately so tie instants are deterministic (an
    * interval ending exactly at t is inactive at t) — and the running
    * sum partitions BY DAY, so every window frame is day-bounded: no
    * global sweep, no unpartitioned window, scales with days ×
    * per-day activity. */
  private def maxConcurrent(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val iv = Tables.events(s, dir)
      .groupBy($"user_id", to_date($"ts").as("day"))
      .agg(min(unix_micros($"ts")).as("st"),
        (max(unix_micros($"ts")) + 1).as("en"))
    val bounds = iv.select($"day", $"st".as("t"), lit(1L).as("starts"), lit(0L).as("ends"))
      .unionAll(iv.select($"day", $"en".as("t"), lit(0L).as("starts"), lit(1L).as("ends")))
      .groupBy($"day", $"t")
      .agg(sum($"starts").as("ns"), sum($"ends").as("ne"))
    val w = Window.partitionBy($"day").orderBy($"t")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val conc = bounds
      .withColumn("concurrent", sum($"ns" - $"ne").over(w))
    conc.withColumn("r", row_number().over(
        Window.partitionBy($"day").orderBy($"concurrent".desc, $"t")))
      .filter($"r" === 1)
      .select(date_format($"day", "yyyy-MM-dd").as("day"),
        $"concurrent".as("max_concurrent"), $"t".as("at_us"))
      .orderBy($"day")
  }

  private val maxConcurrentSql =
    """WITH iv AS (
      |  SELECT user_id, CAST(ts AS DATE) AS day,
      |    MIN(epoch_us(ts)) AS st, MAX(epoch_us(ts)) + 1 AS en
      |  FROM events GROUP BY 1, 2),
      |b AS (
      |  SELECT day, t, SUM(ns) AS ns, SUM(ne) AS ne FROM (
      |    SELECT day, st AS t, 1 AS ns, 0 AS ne FROM iv
      |    UNION ALL
      |    SELECT day, en AS t, 0 AS ns, 1 AS ne FROM iv)
      |  GROUP BY day, t),
      |c AS (
      |  SELECT day, t,
      |    SUM(ns - ne) OVER (PARTITION BY day ORDER BY t
      |      ROWS UNBOUNDED PRECEDING) AS concurrent
      |  FROM b)
      |SELECT strftime(day, '%Y-%m-%d') AS day,
      |  CAST(concurrent AS BIGINT) AS max_concurrent, t AS at_us
      |FROM c
      |QUALIFY ROW_NUMBER() OVER (PARTITION BY day
      |  ORDER BY concurrent DESC, t) = 1
      |ORDER BY day""".stripMargin

  // ------------------------------------------------------------- q_rel_division
  /** Relational division — "suppliers who ship EVERY brand in the PROMO
    * segment": the classic universal-quantifier join, expressed as
    * coverage counting (distinct brands shipped per supplier == total
    * distinct PROMO brands) rather than double NOT EXISTS — one
    * aggregation instead of two correlated anti-joins. The part dim
    * filter broadcasts; lineitem collapses to distinct (supplier,
    * brand) — at most |suppliers|·|brands| rows — before the count; the
    * required-brand total is a single-row broadcast. */
  private def relDivision(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val promoParts = Tables.part(s, dir)
      .filter($"p_type" === "PROMO").select($"p_partkey", $"p_brand")
    val req = promoParts.agg(countDistinct($"p_brand").as("n_required"))
    val cover = Tables.lineitem(s, dir).select($"l_suppkey", $"l_partkey")
      .join(broadcast(promoParts), $"l_partkey" === $"p_partkey")
      .groupBy($"l_suppkey")
      .agg(countDistinct($"p_brand").as("n_brands"))
    cover.crossJoin(broadcast(req))
      .filter($"n_brands" === $"n_required")
      .join(broadcast(Tables.supplier(s, dir).select($"s_suppkey", $"s_name")),
        $"l_suppkey" === $"s_suppkey")
      .select($"s_suppkey", $"s_name", $"n_brands")
      .orderBy($"s_suppkey")
  }

  private val relDivisionSql =
    """WITH promo AS (
      |  SELECT p_partkey, p_brand FROM part WHERE p_type = 'PROMO'),
      |req AS (SELECT COUNT(DISTINCT p_brand) AS n_required FROM promo),
      |cover AS (
      |  SELECT l_suppkey, COUNT(DISTINCT p_brand) AS n_brands
      |  FROM lineitem JOIN promo ON l_partkey = p_partkey
      |  GROUP BY l_suppkey)
      |SELECT s_suppkey, s_name, n_brands
      |FROM cover CROSS JOIN req
      |JOIN supplier ON l_suppkey = s_suppkey
      |WHERE n_brands = n_required
      |ORDER BY s_suppkey""".stripMargin

  // ---------------------------------------------------------------- q_ols_trend
  // audited-global-window(q_ols_trend): frame = month grid index + sufficient statistics — bound audited in PlanAuditSpec/UnpartitionedWindowAudit
  /** Ordinary-least-squares trend of the monthly revenue series — the
    * parametric complement to q_theil_sen (and its sanity anchor: the
    * two slopes should roughly agree unless outlier months dominate).
    * Every sufficient statistic (n, Σi, Σi², Σx, Σx², Σix) is an exact
    * integer/DECIMAL off the month grid; slope numerator/denominator
    * and the R² pieces are emitted as digit-exact strings, and the
    * three rounded outputs are computed with identical double
    * expression trees in both engines. */
  private def olsTrend(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val m = monthly(s, dir)
      .withColumn("i", row_number().over(Window.orderBy($"month")).cast("long"))
    val stats = m.agg(
      count(lit(1)).as("n"),
      sum($"i").as("si"),
      sum($"i" * $"i").as("sii"),
      sum($"cents".cast(d38)).cast(d38).as("sx"),
      sum(($"cents".cast(d38) * $"cents").cast(d38)).cast(d38).as("sxx"),
      sum(($"i".cast(d38) * $"cents").cast(d38)).cast(d38).as("six"))
    stats.select(
        $"n",
        ($"n" * $"six" - $"si" * $"sx").cast(d38).as("num"),
        ($"n" * $"sii" - $"si" * $"si").as("den"),
        ($"n" * $"sxx" - $"sx" * $"sx").cast(d38).as("sxx_n"),
        $"si", $"sx")
      .select($"n",
        $"num".cast("string").as("num"), $"den", $"sxx_n".cast("string").as("sxx_n"),
        round($"num".cast("double") / $"den", 9).as("slope_cents_per_month"),
        round(($"sx".cast("double") * $"den" - $"num".cast("double") * $"si") /
          ($"n".cast("double") * $"den"), 6).as("intercept_cents"),
        round($"num".cast("double") * $"num".cast("double") /
          ($"den".cast("double") * $"sxx_n".cast("double")), 9).as("r2"))
  }

  private val olsTrendSql =
    s"""WITH monthly AS ($monthlySql),
      |m AS (
      |  SELECT CAST(ROW_NUMBER() OVER (ORDER BY month) AS BIGINT) AS i,
      |    cents FROM monthly),
      |st AS (
      |  SELECT COUNT(*) AS n, CAST(SUM(i) AS BIGINT) AS si,
      |    CAST(SUM(i * i) AS BIGINT) AS sii,
      |    CAST(SUM(CAST(cents AS DECIMAL(38,0))) AS DECIMAL(38,0)) AS sx,
      |    CAST(SUM(CAST(CAST(cents AS DECIMAL(38,0)) * cents
      |      AS DECIMAL(38,0))) AS DECIMAL(38,0)) AS sxx,
      |    CAST(SUM(CAST(CAST(i AS DECIMAL(38,0)) * cents
      |      AS DECIMAL(38,0))) AS DECIMAL(38,0)) AS six
      |  FROM m),
      |d AS (
      |  SELECT n, CAST(n * six - si * sx AS DECIMAL(38,0)) AS num,
      |    CAST(n * sii - si * si AS BIGINT) AS den,
      |    CAST(n * sxx - sx * sx AS DECIMAL(38,0)) AS sxx_n, si, sx
      |  FROM st)
      |SELECT n, CAST(num AS VARCHAR) AS num, den,
      |  CAST(sxx_n AS VARCHAR) AS sxx_n,
      |  round(CAST(num AS DOUBLE) / den, 9) AS slope_cents_per_month,
      |  round((CAST(sx AS DOUBLE) * den - CAST(num AS DOUBLE) * si)
      |    / (CAST(n AS DOUBLE) * den), 6) AS intercept_cents,
      |  round(CAST(num AS DOUBLE) * CAST(num AS DOUBLE)
      |    / (CAST(den AS DOUBLE) * CAST(sxx_n AS DOUBLE)), 9) AS r2
      |FROM d""".stripMargin

  // ------------------------------------------------------------- q_mann_kendall
  // audited-global-window(q_mann_kendall): frame = month grid (calendar^2-bounded pair frame) — bound audited in PlanAuditSpec/UnpartitionedWindowAudit
  // audited-bnlj(q_mann_kendall): build side = calendar^2-bounded month-pair frame — audited in PlanAuditSpec/BnljAudit
  /** Mann–Kendall trend test on monthly revenue: S = Σ_{i<j}
    * sign(x_j − x_i) with the tie-corrected variance
    * 18·Var = n(n−1)(2n+5) − Σ_t t(t−1)(2t+5) — the nonparametric
    * "is there a monotone trend" standard. S, n and 18·Var are exact
    * integers (var18 stays in int64 up to ~10⁶ months); the
    * continuity-corrected z = (S ∓ 1)/sqrt(var18/18) is the one float,
    * IEEE-exact from identical operands. Same bounded calendar² pair
    * frame as q_kendall_tau. */
  private def mannKendall(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val m = monthly(s, dir)
      .withColumn("i", row_number().over(Window.orderBy($"month")))
      .select($"i", $"cents")
    val sStat = m.select($"i", $"cents".as("xa"))
      .join(broadcast(m.select($"i".as("j"), $"cents".as("xb"))), $"j" > $"i")
      .agg(sum(signum($"xb" - $"xa").cast("long")).as("s_stat"),
        count(lit(1)).as("n_pairs"))
    val ties = m.groupBy($"cents").agg(count(lit(1)).as("t"))
      .agg(coalesce(sum(when($"t" > 1,
          $"t" * ($"t" - 1) * ($"t" * 2 + 5))), lit(0L)).as("tie_term"),
        sum($"t").as("n"))
    sStat.crossJoin(broadcast(ties))
      .select($"n", $"n_pairs", $"s_stat",
        ($"n" * ($"n" - 1) * ($"n" * 2 + 5) - $"tie_term").as("var18"))
      .withColumn("z", round(
        when($"s_stat" > 0, ($"s_stat" - 1).cast("double"))
          .when($"s_stat" < 0, ($"s_stat" + 1).cast("double"))
          .otherwise(lit(0.0)) / sqrt($"var18" / lit(18.0)), 9))
  }

  private val mannKendallSql =
    s"""WITH monthly AS ($monthlySql),
      |m AS (
      |  SELECT ROW_NUMBER() OVER (ORDER BY month) AS i, cents FROM monthly),
      |sp AS (
      |  SELECT CAST(SUM(sign(b.cents - a.cents)) AS BIGINT) AS s_stat,
      |    COUNT(*) AS n_pairs
      |  FROM m a JOIN m b ON b.i > a.i),
      |ties AS (
      |  SELECT CAST(COALESCE(SUM(CASE WHEN t > 1
      |      THEN t * (t - 1) * (2 * t + 5) ELSE 0 END), 0) AS BIGINT)
      |      AS tie_term,
      |    CAST(SUM(t) AS BIGINT) AS n
      |  FROM (SELECT COUNT(*) AS t FROM m GROUP BY cents))
      |SELECT n, n_pairs, s_stat,
      |  CAST(n * (n - 1) * (2 * n + 5) - tie_term AS BIGINT) AS var18,
      |  round((CASE WHEN s_stat > 0 THEN CAST(s_stat - 1 AS DOUBLE)
      |    WHEN s_stat < 0 THEN CAST(s_stat + 1 AS DOUBLE)
      |    ELSE 0.0 END) / sqrt(var18 / 18.0), 9) AS z
      |FROM sp CROSS JOIN ties""".stripMargin

  // ---------------------------------------------------------------- q_wilcoxon
  // audited-global-window(q_wilcoxon): frame = month grid + |diff| value-grid midranks — bound audited in PlanAuditSpec/UnpartitionedWindowAudit
  /** Wilcoxon signed-rank on year-over-year monthly revenue: pair month
    * m with m+12, rank |diff| with midranks, sum ranks by diff sign —
    * "did revenue shift YoY" without assuming normality. Midranks are
    * made integer-exact by the ×2 trick (2·midrank = 2·cum_below +
    * count + 1 — the q_spearman histogram recipe), so W⁺, W⁻ and the
    * null expectation n(n+1)/2 (already ×2-scaled) are exact integers;
    * there is no float anywhere. Zero diffs drop per standard
    * practice. */
  private def wilcoxon(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val m = monthly(s, dir)
      .withColumn("i", row_number().over(Window.orderBy($"month")))
      .select($"i", $"cents")
    val diffs = m.select($"i", $"cents".as("xa"))
      .join(broadcast(m.select(($"i" - 12).as("i"), $"cents".as("xb"))), "i")
      .select(($"xb" - $"xa").as("d"))
      .filter($"d" =!= 0)
      .select($"d", abs($"d").as("ad"))
    val hist = diffs.groupBy($"ad").agg(count(lit(1)).as("cnt"))
      .withColumn("cum", sum($"cnt").over(Window.orderBy($"ad")))
      .select($"ad", (($"cum" - $"cnt") * 2 + $"cnt" + 1).as("midrank2"))
    diffs.join(broadcast(hist), "ad")
      .agg(
        sum(when($"d" > 0, 1L).otherwise(0L)).as("n_pos"),
        sum(when($"d" < 0, 1L).otherwise(0L)).as("n_neg"),
        sum(when($"d" > 0, $"midrank2").otherwise(0L)).as("w2_plus"),
        sum(when($"d" < 0, $"midrank2").otherwise(0L)).as("w2_minus"))
      .withColumn("n", $"n_pos" + $"n_neg")
      .withColumn("expected2", expr("n * (n + 1) DIV 2"))
      .select($"n", $"n_pos", $"n_neg", $"w2_plus", $"w2_minus", $"expected2")
  }

  private val wilcoxonSql =
    s"""WITH monthly AS ($monthlySql),
      |m AS (
      |  SELECT ROW_NUMBER() OVER (ORDER BY month) AS i, cents FROM monthly),
      |diffs AS (
      |  SELECT b.cents - a.cents AS d, abs(b.cents - a.cents) AS ad
      |  FROM m a JOIN m b ON b.i = a.i + 12
      |  WHERE b.cents <> a.cents),
      |hist AS (
      |  SELECT ad,
      |    2 * (SUM(cnt) OVER (ORDER BY ad) - cnt) + cnt + 1 AS midrank2
      |  FROM (SELECT ad, COUNT(*) AS cnt FROM diffs GROUP BY ad)),
      |agg AS (
      |  SELECT
      |    CAST(SUM(CASE WHEN d > 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_pos,
      |    CAST(SUM(CASE WHEN d < 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_neg,
      |    CAST(SUM(CASE WHEN d > 0 THEN midrank2 ELSE 0 END) AS BIGINT)
      |      AS w2_plus,
      |    CAST(SUM(CASE WHEN d < 0 THEN midrank2 ELSE 0 END) AS BIGINT)
      |      AS w2_minus
      |  FROM diffs JOIN hist USING (ad))
      |SELECT n_pos + n_neg AS n, n_pos, n_neg, w2_plus, w2_minus,
      |  CAST((n_pos + n_neg) * (n_pos + n_neg + 1) // 2 AS BIGINT)
      |    AS expected2
      |FROM agg""".stripMargin

  // -------------------------------------------------------------- q_partial_corr
  // audited-global-window(q_partial_corr): frame = month grid (q_acf shape, 3 series) — bound audited in PlanAuditSpec/UnpartitionedWindowAudit
  /** Partial correlation r_xy·z of monthly revenue (x) and order count
    * (y) controlling for shipped quantity (z) — "do revenue and volume
    * co-move beyond what shipping activity explains?" All three
    * pairwise Pearson correlations come from the q_acf n-scaled exact
    * integer sums (the n² factors cancel); the partial
    * (r_xy − r_xz·r_yz)/√((1−r_xz²)(1−r_yz²)) is evaluated on those
    * bit-identical doubles. The two fact tables each collapse to the
    * month grid in one aggregation; the grids inner-join on month. */
  private def partialCorr(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val d19 = DecimalType(19, 0)
    val qtyMonthly = Tables.lineitem(s, dir)
      .groupBy(date_format($"l_shipdate", "yyyy-MM").as("month"))
      .agg((sum($"l_quantity".cast(DecimalType(28, 2))) * 100)
        .cast("long").as("qty_h"))
    val joined = monthly(s, dir).join(qtyMonthly, "month")
    val m = joined
      .withColumn("n", count(lit(1)).over(Window.partitionBy()))
      .withColumn("sx", sum($"cents").over(Window.partitionBy()))
      .withColumn("sy", sum($"n_orders").over(Window.partitionBy()))
      .withColumn("sz", sum($"qty_h").over(Window.partitionBy()))
      .select($"n",
        ($"n" * $"cents" - $"sx").cast(d19).as("ndx"),
        ($"n" * $"n_orders" - $"sy").cast(d19).as("ndy"),
        ($"n" * $"qty_h" - $"sz").cast(d19).as("ndz"))
    val sums = m.agg(max($"n").as("n_months"),
      sum($"ndx" * $"ndy").cast(d38).as("sxy"),
      sum($"ndx" * $"ndz").cast(d38).as("sxz"),
      sum($"ndy" * $"ndz").cast(d38).as("syz"),
      sum($"ndx" * $"ndx").cast(d38).as("sxx"),
      sum($"ndy" * $"ndy").cast(d38).as("syy"),
      sum($"ndz" * $"ndz").cast(d38).as("szz"))
    val rxy = $"sxy".cast("double") /
      sqrt($"sxx".cast("double") * $"syy".cast("double"))
    val rxz = $"sxz".cast("double") /
      sqrt($"sxx".cast("double") * $"szz".cast("double"))
    val ryz = $"syz".cast("double") /
      sqrt($"syy".cast("double") * $"szz".cast("double"))
    sums.select($"n_months",
      round(rxy, 9).as("r_xy"), round(rxz, 9).as("r_xz"),
      round(ryz, 9).as("r_yz"),
      round((rxy - rxz * ryz) /
        sqrt((lit(1.0) - rxz * rxz) * (lit(1.0) - ryz * ryz)), 9)
        .as("r_xy_given_z"))
  }

  private val partialCorrSql =
    s"""WITH monthly AS ($monthlySql),
      |qm AS (
      |  SELECT strftime(l_shipdate, '%Y-%m') AS month,
      |    CAST(SUM(CAST(l_quantity AS DECIMAL(28,2))) * 100 AS BIGINT)
      |      AS qty_h
      |  FROM lineitem GROUP BY 1),
      |j AS (SELECT * FROM monthly JOIN qm USING (month)),
      |m AS (
      |  SELECT COUNT(*) OVER () AS n,
      |    CAST(COUNT(*) OVER () * cents - SUM(cents) OVER ()
      |      AS DECIMAL(19,0)) AS ndx,
      |    CAST(COUNT(*) OVER () * n_orders - SUM(n_orders) OVER ()
      |      AS DECIMAL(19,0)) AS ndy,
      |    CAST(COUNT(*) OVER () * qty_h - SUM(qty_h) OVER ()
      |      AS DECIMAL(19,0)) AS ndz
      |  FROM j),
      |sums AS (
      |  SELECT MAX(n) AS n_months,
      |    CAST(SUM(ndx * ndy) AS DECIMAL(38,0)) AS sxy,
      |    CAST(SUM(ndx * ndz) AS DECIMAL(38,0)) AS sxz,
      |    CAST(SUM(ndy * ndz) AS DECIMAL(38,0)) AS syz,
      |    CAST(SUM(ndx * ndx) AS DECIMAL(38,0)) AS sxx,
      |    CAST(SUM(ndy * ndy) AS DECIMAL(38,0)) AS syy,
      |    CAST(SUM(ndz * ndz) AS DECIMAL(38,0)) AS szz
      |  FROM m)
      |SELECT n_months,
      |  round(CAST(sxy AS DOUBLE)
      |    / sqrt(CAST(sxx AS DOUBLE) * CAST(syy AS DOUBLE)), 9) AS r_xy,
      |  round(CAST(sxz AS DOUBLE)
      |    / sqrt(CAST(sxx AS DOUBLE) * CAST(szz AS DOUBLE)), 9) AS r_xz,
      |  round(CAST(syz AS DOUBLE)
      |    / sqrt(CAST(syy AS DOUBLE) * CAST(szz AS DOUBLE)), 9) AS r_yz,
      |  round((CAST(sxy AS DOUBLE)
      |      / sqrt(CAST(sxx AS DOUBLE) * CAST(syy AS DOUBLE))
      |    - (CAST(sxz AS DOUBLE)
      |      / sqrt(CAST(sxx AS DOUBLE) * CAST(szz AS DOUBLE)))
      |      * (CAST(syz AS DOUBLE)
      |      / sqrt(CAST(syy AS DOUBLE) * CAST(szz AS DOUBLE))))
      |    / sqrt((1.0 - (CAST(sxz AS DOUBLE)
      |        / sqrt(CAST(sxx AS DOUBLE) * CAST(szz AS DOUBLE)))
      |        * (CAST(sxz AS DOUBLE)
      |        / sqrt(CAST(sxx AS DOUBLE) * CAST(szz AS DOUBLE))))
      |      * (1.0 - (CAST(syz AS DOUBLE)
      |        / sqrt(CAST(syy AS DOUBLE) * CAST(szz AS DOUBLE)))
      |        * (CAST(syz AS DOUBLE)
      |        / sqrt(CAST(syy AS DOUBLE) * CAST(szz AS DOUBLE))))), 9)
      |    AS r_xy_given_z
      |FROM sums""".stripMargin

  // -------------------------------------------------------------- q_ship_latency
  /** Order-to-ship latency distribution per order priority — the
    * operational SLA view: how many days from order to each line's
    * shipment, summarized as n / min / exact lower median / max / mean.
    * The median is an order statistic off the per-priority lag-day
    * HISTOGRAM (lag days are calendar-bounded, ~120 distinct values),
    * so no per-row ranking and every window partitions by priority —
    * nothing unbounded, nothing single-task. Mean is exact-sum/count. */
  private def shipLatency(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val lags = Tables.lineitem(s, dir).select($"l_orderkey", $"l_shipdate")
      .join(Tables.orders(s, dir)
        .select($"o_orderkey", $"o_orderdate", $"o_orderpriority"),
        $"l_orderkey" === $"o_orderkey")
      .select($"o_orderpriority",
        datediff($"l_shipdate", $"o_orderdate").as("lag_days"))
    val hist = lags.groupBy($"o_orderpriority", $"lag_days")
      .agg(count(lit(1)).as("cnt"))
    val w = Window.partitionBy($"o_orderpriority").orderBy($"lag_days")
    val wAll = Window.partitionBy($"o_orderpriority")
    hist
      .withColumn("cum", sum($"cnt").over(w))
      .withColumn("n", sum($"cnt").over(wAll))
      .withColumn("sum_lag", sum($"lag_days" * $"cnt").over(wAll))
      .withColumn("min_days", min($"lag_days").over(wAll))
      .withColumn("max_days", max($"lag_days").over(wAll))
      .filter($"cum" * 2 >= $"n" && ($"cum" - $"cnt") * 2 < $"n")
      .select($"o_orderpriority", $"n", $"min_days",
        $"lag_days".as("median_days"), $"max_days",
        round($"sum_lag".cast("double") / $"n", 9).as("mean_days"))
      .orderBy($"o_orderpriority")
  }

  private val shipLatencySql =
    """WITH lags AS (
      |  SELECT o_orderpriority,
      |    date_diff('day', o_orderdate, l_shipdate) AS lag_days
      |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey),
      |hist AS (
      |  SELECT o_orderpriority, lag_days, COUNT(*) AS cnt
      |  FROM lags GROUP BY 1, 2),
      |x AS (
      |  SELECT o_orderpriority, lag_days, cnt,
      |    SUM(cnt) OVER (PARTITION BY o_orderpriority ORDER BY lag_days)
      |      AS cum,
      |    SUM(cnt) OVER (PARTITION BY o_orderpriority) AS n,
      |    SUM(lag_days * cnt) OVER (PARTITION BY o_orderpriority)
      |      AS sum_lag,
      |    MIN(lag_days) OVER (PARTITION BY o_orderpriority) AS min_days,
      |    MAX(lag_days) OVER (PARTITION BY o_orderpriority) AS max_days
      |  FROM hist)
      |SELECT o_orderpriority, CAST(n AS BIGINT) AS n, min_days,
      |  lag_days AS median_days, max_days,
      |  round(CAST(sum_lag AS DOUBLE) / n, 9) AS mean_days
      |FROM x
      |WHERE cum * 2 >= n AND (cum - cnt) * 2 < n
      |ORDER BY o_orderpriority""".stripMargin

  // -------------------------------------------------------------- q_latency_tail
  /** Tail latency per order priority — the p95/p99 the SLA dashboard
    * actually watches (q_ship_latency's median says how it usually
    * goes; the tail says how badly it can go). Exact lower-quantile
    * order statistics off the same calendar-bounded lag-day histogram:
    * p_q = smallest lag with 100·cum ≥ q·n — pure integer
    * cross-multiplication, no interpolation, no float. All windows
    * partition by priority. */
  private def latencyTail(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val lags = Tables.lineitem(s, dir).select($"l_orderkey", $"l_shipdate")
      .join(Tables.orders(s, dir)
        .select($"o_orderkey", $"o_orderdate", $"o_orderpriority"),
        $"l_orderkey" === $"o_orderkey")
      .select($"o_orderpriority",
        datediff($"l_shipdate", $"o_orderdate").as("lag_days"))
    val hist = lags.groupBy($"o_orderpriority", $"lag_days")
      .agg(count(lit(1)).as("cnt"))
    val w = Window.partitionBy($"o_orderpriority").orderBy($"lag_days")
    hist
      .withColumn("cum", sum($"cnt").over(w))
      .withColumn("n",
        sum($"cnt").over(Window.partitionBy($"o_orderpriority")))
      .groupBy($"o_orderpriority")
      .agg(max($"n").as("n"),
        min(when($"cum" * 100 >= $"n" * 95, $"lag_days")).as("p95_days"),
        min(when($"cum" * 100 >= $"n" * 99, $"lag_days")).as("p99_days"),
        max($"lag_days").as("max_days"))
      .orderBy($"o_orderpriority")
  }

  private val latencyTailSql =
    """WITH lags AS (
      |  SELECT o_orderpriority,
      |    date_diff('day', o_orderdate, l_shipdate) AS lag_days
      |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey),
      |hist AS (
      |  SELECT o_orderpriority, lag_days, COUNT(*) AS cnt
      |  FROM lags GROUP BY 1, 2),
      |x AS (
      |  SELECT o_orderpriority, lag_days, cnt,
      |    SUM(cnt) OVER (PARTITION BY o_orderpriority ORDER BY lag_days)
      |      AS cum,
      |    SUM(cnt) OVER (PARTITION BY o_orderpriority) AS n
      |  FROM hist)
      |SELECT o_orderpriority, CAST(MAX(n) AS BIGINT) AS n,
      |  MIN(CASE WHEN cum * 100 >= n * 95 THEN lag_days END) AS p95_days,
      |  MIN(CASE WHEN cum * 100 >= n * 99 THEN lag_days END) AS p99_days,
      |  MAX(lag_days) AS max_days
      |FROM x
      |GROUP BY o_orderpriority
      |ORDER BY o_orderpriority""".stripMargin

  // -------------------------------------------------------- q_seasonal_anomalies
  // audited-global-window(q_seasonal_anomalies): frame = month grid + residual value histogram — bound audited in PlanAuditSpec/UnpartitionedWindowAudit
  // audited-bnlj(q_seasonal_anomalies): build side = 1-row global-aggregate broadcast — audited in PlanAuditSpec/BnljAudit
  /** Seasonally-adjusted anomaly detection: months whose decomposition
    * RESIDUAL (cents − trend − seasonal, the exact q_seasonal_decompose
    * remainder) breaks its own Tukey fences — "was this month odd after
    * accounting for trend and seasonality", which raw-value fences
    * (q_iqr_fences) can't ask. Quartiles are exact lower order
    * statistics off the residual histogram (4·cum ≥ n / ≥ 3n), the
    * 1.5·IQR step is `iqr + iqr DIV 2` so fences stay exact integers.
    * Everything runs on the bounded month grid. */
  private def seasonalAnomalies(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val m0 = monthly(s, dir)
    val w13 = Window.orderBy($"month").rowsBetween(-6, 6)
    val trended = m0
      .withColumn("win_n", count(lit(1)).over(w13))
      .withColumn("trend", expr("sum(cents) OVER (ORDER BY month " +
        "ROWS BETWEEN 6 PRECEDING AND 6 FOLLOWING) DIV 13"))
      .filter($"win_n" === 13)
      .withColumn("detr", $"cents" - $"trend")
      .withColumn("moy", substring($"month", 6, 2))
    val seasonal = trended.groupBy($"moy")
      .agg(sum($"detr").as("sd"), count(lit(1)).as("cnt"))
      .select($"moy", expr("sd DIV cnt").as("seasonal"))
    val resid = trended.join(broadcast(seasonal), Seq("moy"))
      .select($"month", $"cents",
        ($"cents" - $"trend" - $"seasonal").as("residual"))
    val hist = resid.groupBy($"residual").agg(count(lit(1)).as("cnt"))
      .withColumn("cum", sum($"cnt").over(Window.orderBy($"residual")))
      .withColumn("n", sum($"cnt").over(Window.partitionBy()))
    val fences = hist.agg(
        min(when($"cum" * 4 >= $"n", $"residual")).as("q1"),
        min(when($"cum" * 4 >= $"n" * 3, $"residual")).as("q3"))
      .select($"q1", $"q3",
        ($"q1" - expr("(q3 - q1) + (q3 - q1) DIV 2")).as("lo_fence"),
        ($"q3" + expr("(q3 - q1) + (q3 - q1) DIV 2")).as("hi_fence"))
    resid.crossJoin(broadcast(fences))
      .filter($"residual" < $"lo_fence" || $"residual" > $"hi_fence")
      .select($"month", $"cents", $"residual", $"lo_fence", $"hi_fence",
        when($"residual" < $"lo_fence", "LOW").otherwise("HIGH").as("side"))
      .orderBy($"month")
  }

  private val seasonalAnomaliesSql =
    s"""WITH monthly AS ($monthlySql),
      |t AS (
      |  SELECT month, cents,
      |    COUNT(*) OVER (ORDER BY month
      |      ROWS BETWEEN 6 PRECEDING AND 6 FOLLOWING) AS win_n,
      |    CAST(SUM(cents) OVER (ORDER BY month
      |      ROWS BETWEEN 6 PRECEDING AND 6 FOLLOWING) AS BIGINT) // 13
      |      AS trend
      |  FROM monthly),
      |tr AS (
      |  SELECT month, cents, trend, cents - trend AS detr,
      |    substring(month, 6, 2) AS moy
      |  FROM t WHERE win_n = 13),
      |seas AS (
      |  SELECT moy, CAST(SUM(detr) AS BIGINT) // COUNT(*) AS seasonal
      |  FROM tr GROUP BY 1),
      |resid AS (
      |  SELECT month, cents, cents - trend - seasonal AS residual
      |  FROM tr JOIN seas USING (moy)),
      |hist AS (
      |  SELECT residual, COUNT(*) AS cnt,
      |    SUM(COUNT(*)) OVER (ORDER BY residual) AS cum,
      |    SUM(COUNT(*)) OVER () AS n
      |  FROM resid GROUP BY residual),
      |f AS (
      |  SELECT q1, q3,
      |    q1 - ((q3 - q1) + (q3 - q1) // 2) AS lo_fence,
      |    q3 + ((q3 - q1) + (q3 - q1) // 2) AS hi_fence
      |  FROM (SELECT
      |    MIN(CASE WHEN cum * 4 >= n THEN residual END) AS q1,
      |    MIN(CASE WHEN cum * 4 >= n * 3 THEN residual END) AS q3
      |  FROM hist))
      |SELECT month, cents, residual, lo_fence, hi_fence,
      |  CASE WHEN residual < lo_fence THEN 'LOW' ELSE 'HIGH' END AS side
      |FROM resid CROSS JOIN f
      |WHERE residual < lo_fence OR residual > hi_fence
      |ORDER BY month""".stripMargin

  // ------------------------------------------------------------- q_active_users
  /** DAU / WAU / MAU — the engagement trinity: per activity day, how
    * many distinct users acted that day, in the trailing 7 days, and in
    * the trailing 30. Exact distinct counts via the (user, day) frame
    * fanned out to the day grid it contributes to (≤7 / ≤30 grid rows
    * per user-day — linear, never quadratic), then one distinct-count
    * per grid day. All integers; the day grid is calendar-bounded. */
  private def activeUsers(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val userDay = Tables.events(s, dir)
      .select($"user_id", to_date($"ts").as("uday")).distinct()
    val grid = userDay.select($"uday".as("day")).distinct()
    // row-local fan-out (explode of a <=7/<=30-element day sequence) +
    // EQUI-join against the active-day grid: cost is O(user-days x
    // window), never the O(user-days x |grid|) a range-condition
    // nested-loop join would pay on a multi-year grid
    def trailing(windowDays: Int): DataFrame = userDay
      .select($"user_id", explode(expr(
        s"sequence(uday, date_add(uday, ${windowDays - 1}))")).as("day"))
      .join(grid, "day")
      .groupBy($"day").agg(countDistinct($"user_id").as(s"au_$windowDays"))
    val wau = trailing(7).withColumnRenamed("au_7", "wau")
    val mau = trailing(30).withColumnRenamed("au_30", "mau")
    val dau = userDay.groupBy($"uday".as("day"))
      .agg(countDistinct($"user_id").as("dau"))
    dau.join(wau, "day").join(mau, "day")
      .select(date_format($"day", "yyyy-MM-dd").as("day"),
        $"dau", $"wau", $"mau")
      .orderBy($"day")
  }

  private val activeUsersSql =
    """WITH ud AS (
      |  SELECT DISTINCT user_id, CAST(ts AS DATE) AS uday FROM events),
      |grid AS (SELECT DISTINCT uday AS day FROM ud),
      |dau AS (
      |  SELECT uday AS day, COUNT(DISTINCT user_id) AS dau
      |  FROM ud GROUP BY 1),
      |wau AS (
      |  SELECT day, COUNT(DISTINCT user_id) AS wau
      |  FROM ud JOIN grid ON day >= uday AND day <= uday + INTERVAL 6 DAY
      |  GROUP BY 1),
      |mau AS (
      |  SELECT day, COUNT(DISTINCT user_id) AS mau
      |  FROM ud JOIN grid ON day >= uday AND day <= uday + INTERVAL 29 DAY
      |  GROUP BY 1)
      |SELECT strftime(day, '%Y-%m-%d') AS day, dau, wau, mau
      |FROM dau JOIN wau USING (day) JOIN mau USING (day)
      |ORDER BY day""".stripMargin

  // -------------------------------------------------------- q_conversion_latency
  // audited-global-window(q_conversion_latency): frame = latency-minute grid (calendar-span-bounded) — bound audited in PlanAuditSpec/UnpartitionedWindowAudit
  // audited-bnlj(q_conversion_latency): build side = 1-row global-aggregate broadcast — audited in PlanAuditSpec/BnljAudit
  /** Signup→purchase conversion latency: per user, first signup to the
    * first purchase at-or-after it; summarized as conversion rate (ppm,
    * integer DIV) and the latency distribution in MINUTES — exact lower
    * median and p90 off the latency-minute histogram (calendar-bounded:
    * the grid can never exceed the corpus' time span in minutes,
    * regardless of user count), mean as exact-sum/count. Two keyed
    * aggregations to per-user firsts, one histogram pass. */
  private def conversionLatency(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val ev = Tables.events(s, dir)
    val signup = ev.filter($"event_type" === "signup")
      .groupBy($"user_id").agg(min(unix_micros($"ts")).as("st"))
    val purchase = ev.filter($"event_type" === "purchase")
      .select($"user_id", unix_micros($"ts").as("pt"))
      .join(signup, "user_id")
      .filter($"pt" >= $"st")
      .groupBy($"user_id").agg(min($"pt").as("pt"), min($"st").as("st"))
    val lat = purchase.select(expr("(pt - st) DIV 60000000").as("lat_min"))
    val hist = lat.groupBy($"lat_min").agg(count(lit(1)).as("cnt"))
      .withColumn("cum", sum($"cnt").over(Window.orderBy($"lat_min")))
      .withColumn("n", sum($"cnt").over(Window.partitionBy()))
    val dist = hist.agg(
      max($"n").as("n_converted"),
      min(when($"cum" * 2 >= $"n", $"lat_min")).as("median_min"),
      min(when($"cum" * 10 >= $"n" * 9, $"lat_min")).as("p90_min"),
      max($"lat_min").as("max_min"),
      sum($"lat_min" * $"cnt").as("sum_min"))
    val nUsers = signup.agg(count(lit(1)).as("n_signup"))
    dist.crossJoin(broadcast(nUsers))
      .select($"n_signup", $"n_converted",
        expr("n_converted * 1000000 DIV n_signup").as("conversion_ppm"),
        $"median_min", $"p90_min", $"max_min",
        round($"sum_min".cast("double") / $"n_converted", 9).as("mean_min"))
  }

  private val conversionLatencySql =
    """WITH su AS (
      |  SELECT user_id, MIN(epoch_us(ts)) AS st
      |  FROM events WHERE event_type = 'signup' GROUP BY 1),
      |pu AS (
      |  SELECT e.user_id, MIN(epoch_us(e.ts)) AS pt, MIN(st) AS st
      |  FROM events e JOIN su ON e.user_id = su.user_id
      |  WHERE e.event_type = 'purchase' AND epoch_us(e.ts) >= st
      |  GROUP BY 1),
      |lat AS (SELECT (pt - st) // 60000000 AS lat_min FROM pu),
      |hist AS (
      |  SELECT lat_min, COUNT(*) AS cnt,
      |    SUM(COUNT(*)) OVER (ORDER BY lat_min) AS cum,
      |    SUM(COUNT(*)) OVER () AS n
      |  FROM lat GROUP BY lat_min),
      |dist AS (
      |  SELECT CAST(MAX(n) AS BIGINT) AS n_converted,
      |    MIN(CASE WHEN cum * 2 >= n THEN lat_min END) AS median_min,
      |    MIN(CASE WHEN cum * 10 >= n * 9 THEN lat_min END) AS p90_min,
      |    MAX(lat_min) AS max_min,
      |    CAST(SUM(lat_min * cnt) AS BIGINT) AS sum_min
      |  FROM hist),
      |nu AS (SELECT COUNT(*) AS n_signup FROM su)
      |SELECT n_signup, n_converted,
      |  CAST(n_converted * 1000000 // n_signup AS BIGINT) AS conversion_ppm,
      |  median_min, p90_min, max_min,
      |  round(CAST(sum_min AS DOUBLE) / n_converted, 9) AS mean_min
      |FROM dist CROSS JOIN nu""".stripMargin

  // ------------------------------------------------------------ q_data_freshness
  // audited-bnlj(q_data_freshness): build side = 1-row global-aggregate broadcast — audited in PlanAuditSpec/BnljAudit
  /** Feed freshness — the first page of every ingest-ops dashboard: per
    * event feed (event_type), its last event time and how many minutes
    * stale it is against the freshest feed. Exact integer minutes; one
    * keyed aggregation plus a single-row broadcast of the global max. */
  private def dataFreshness(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val perFeed = Tables.events(s, dir)
      .groupBy($"event_type")
      .agg(count(lit(1)).as("n_events"),
        max(unix_micros($"ts")).as("last_us"))
    val global = perFeed.agg(max($"last_us").as("max_us"))
    perFeed.crossJoin(broadcast(global))
      .select($"event_type", $"n_events",
        date_format(timestamp_micros($"last_us"), "yyyy-MM-dd HH:mm:ss")
          .as("last_event"),
        expr("(max_us - last_us) DIV 60000000").as("staleness_min"))
      .orderBy($"event_type")
  }

  private val dataFreshnessSql =
    """WITH pf AS (
      |  SELECT event_type, COUNT(*) AS n_events,
      |    MAX(epoch_us(ts)) AS last_us
      |  FROM events GROUP BY 1),
      |g AS (SELECT MAX(last_us) AS max_us FROM pf)
      |SELECT event_type, n_events,
      |  strftime(make_timestamp(last_us), '%Y-%m-%d %H:%M:%S') AS last_event,
      |  CAST((max_us - last_us) // 60000000 AS BIGINT) AS staleness_min
      |FROM pf CROSS JOIN g
      |ORDER BY event_type""".stripMargin

  // -------------------------------------------------------- q_repurchase_gap
  /** Repurchase cadence: days between a customer's consecutive orders,
    * summarized per market segment — the retention metric behind
    * "how often do BUILDING customers come back?". Per-customer gaps
    * come from a lag window PARTITIONED BY customer (scale-safe); the
    * per-segment summary takes exact lower median / p90 off the
    * segment's gap-day histogram (calendar-bounded grid) and an exact
    * integer mean numerator. */
  private def repurchaseGap(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val wc = Window.partitionBy($"o_custkey").orderBy($"o_orderdate", $"o_orderkey")
    val gaps = Tables.orders(s, dir)
      .select($"o_custkey", $"o_orderdate", $"o_orderkey")
      .withColumn("prev", lag($"o_orderdate", 1).over(wc))
      .filter($"prev".isNotNull)
      .select($"o_custkey", datediff($"o_orderdate", $"prev").as("gap_days"))
      .join(broadcast(Tables.customer(s, dir)
        .select($"c_custkey", $"c_mktsegment")), $"o_custkey" === $"c_custkey")
    val hist = gaps.groupBy($"c_mktsegment", $"gap_days")
      .agg(count(lit(1)).as("cnt"))
    val ws = Window.partitionBy($"c_mktsegment").orderBy($"gap_days")
    val wAll = Window.partitionBy($"c_mktsegment")
    hist
      .withColumn("cum", sum($"cnt").over(ws))
      .withColumn("n", sum($"cnt").over(wAll))
      .groupBy($"c_mktsegment")
      .agg(max($"n").as("n_gaps"),
        min(when($"cum" * 2 >= $"n", $"gap_days")).as("median_days"),
        min(when($"cum" * 10 >= $"n" * 9, $"gap_days")).as("p90_days"),
        sum($"gap_days" * $"cnt").as("sum_days"))
      .select($"c_mktsegment", $"n_gaps", $"median_days", $"p90_days",
        round($"sum_days".cast("double") / $"n_gaps", 9).as("mean_days"))
      .orderBy($"c_mktsegment")
  }

  private val repurchaseGapSql =
    """WITH g AS (
      |  SELECT o_custkey,
      |    date_diff('day', lag(o_orderdate) OVER w, o_orderdate) AS gap_days
      |  FROM orders
      |  WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)),
      |j AS (
      |  SELECT c_mktsegment, gap_days FROM g
      |  JOIN customer ON o_custkey = c_custkey
      |  WHERE gap_days IS NOT NULL),
      |hist AS (
      |  SELECT c_mktsegment, gap_days, COUNT(*) AS cnt,
      |    SUM(COUNT(*)) OVER (PARTITION BY c_mktsegment ORDER BY gap_days)
      |      AS cum,
      |    SUM(COUNT(*)) OVER (PARTITION BY c_mktsegment) AS n
      |  FROM j GROUP BY 1, 2)
      |SELECT c_mktsegment, CAST(MAX(n) AS BIGINT) AS n_gaps,
      |  MIN(CASE WHEN cum * 2 >= n THEN gap_days END) AS median_days,
      |  MIN(CASE WHEN cum * 10 >= n * 9 THEN gap_days END) AS p90_days,
      |  round(CAST(SUM(gap_days * cnt) AS DOUBLE) / MAX(n), 9) AS mean_days
      |FROM hist
      |GROUP BY c_mktsegment
      |ORDER BY c_mktsegment""".stripMargin

  // ---------------------------------------------------- q_discount_elasticity
  // audited-bnlj(q_discount_elasticity): build side = 1-row global-aggregate broadcast — audited in PlanAuditSpec/BnljAudit
  /** Discount elasticity profile: how order-line quantity responds to
    * the discount level — the pricing view TPC-H Q6/Q19 only sample.
    * One row per discount value (the domain is a fixed price-book
    * grid): line count, exact quantity sum, and a quantity INDEX in
    * exact ppm — this band's mean quantity over the corpus mean,
    * computed as one DECIMAL cross-multiplication (no float division
    * decides the index). */
  private def discountElasticity(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val byBand = Tables.lineitem(s, dir)
      .groupBy($"l_discount")
      .agg(count(lit(1)).as("n_lines"),
        (sum($"l_quantity".cast(DecimalType(28, 2))) * 100)
          .cast("long").as("qty_h"))
    val tot = byBand.agg(sum($"n_lines").as("n_tot"), sum($"qty_h").as("qty_tot"))
    byBand.crossJoin(broadcast(tot))
      .select($"l_discount", $"n_lines",
        ($"qty_h".cast(DoubleType) / 100).as("sum_qty"),
        // integral DIV on DECIMAL(38) operands — exact in Spark; the
        // oracle routes the same product through HUGEINT (DuckDB's //
        // on decimals silently degrades to double)
        expr("(CAST(qty_h AS DECIMAL(38,0)) * n_tot * 1000000) DIV " +
          "(CAST(qty_tot AS DECIMAL(38,0)) * n_lines)").as("qty_index_ppm"))
      .orderBy($"l_discount")
  }

  private val discountElasticitySql =
    """WITH b AS (
      |  SELECT l_discount, COUNT(*) AS n_lines,
      |    CAST(SUM(CAST(l_quantity AS DECIMAL(28,2))) * 100 AS BIGINT)
      |      AS qty_h
      |  FROM lineitem GROUP BY 1),
      |t AS (SELECT CAST(SUM(n_lines) AS BIGINT) AS n_tot,
      |             CAST(SUM(qty_h) AS BIGINT) AS qty_tot FROM b)
      |SELECT l_discount, n_lines,
      |  CAST(qty_h AS DOUBLE) / 100 AS sum_qty,
      |  CAST((CAST(qty_h AS HUGEINT) * n_tot * 1000000)
      |    // (CAST(qty_tot AS HUGEINT) * n_lines) AS BIGINT)
      |    AS qty_index_ppm
      |FROM b CROSS JOIN t
      |ORDER BY l_discount""".stripMargin

  // ------------------------------------------------------------ q_order_size_dist
  /** Order-size distribution: how many orders have k lines — TPC-H
    * Q13's silhouette turned on the order itself (no zero bucket:
    * every order has ≥1 line). One orderkey aggregation, one count-grid
    * histogram; grid bounded by the line-count domain (~7). */
  private def orderSizeDist(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.lineitem(s, dir)
      .groupBy($"l_orderkey").agg(count(lit(1)).as("n_lines"))
      .groupBy($"n_lines").agg(count(lit(1)).as("n_orders"))
      .orderBy($"n_lines")
  }

  private val orderSizeDistSql =
    """SELECT n_lines, COUNT(*) AS n_orders
      |FROM (SELECT l_orderkey, COUNT(*) AS n_lines
      |      FROM lineitem GROUP BY 1)
      |GROUP BY n_lines ORDER BY n_lines""".stripMargin

  // -------------------------------------------------------- q_late_lines_trend
  /** Service-level trend: per ship month, the share of lines shipped
    * more than 90 days after their order date, in exact ppm — is
    * fulfillment getting better or worse? The month axis is the
    * calendar-bounded grid; lateness is decided row-local at the join,
    * the ppm by integer DIV. One fact-fact shuffle on the order key. */
  private def lateLinesTrend(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.lineitem(s, dir).select($"l_orderkey", $"l_shipdate")
      .join(Tables.orders(s, dir).select($"o_orderkey", $"o_orderdate"),
        $"l_orderkey" === $"o_orderkey")
      .groupBy(date_format($"l_shipdate", "yyyy-MM").as("ship_month"))
      .agg(count(lit(1)).as("n_lines"),
        sum(when($"l_shipdate" > $"o_orderdate" + expr("INTERVAL 90 DAYS"), 1L)
          .otherwise(0L)).as("n_late"))
      .withColumn("late_ppm", expr("n_late * 1000000 DIV n_lines"))
      .orderBy($"ship_month")
  }

  private val lateLinesTrendSql =
    """SELECT strftime(l_shipdate, '%Y-%m') AS ship_month,
      |  COUNT(*) AS n_lines,
      |  CAST(SUM(CASE WHEN l_shipdate > o_orderdate + INTERVAL 90 DAY
      |    THEN 1 ELSE 0 END) AS BIGINT) AS n_late,
      |  CAST(SUM(CASE WHEN l_shipdate > o_orderdate + INTERVAL 90 DAY
      |    THEN 1 ELSE 0 END) * 1000000 // COUNT(*) AS BIGINT) AS late_ppm
      |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      |GROUP BY 1 ORDER BY ship_month""".stripMargin

  // ------------------------------------------------- q_customer_concentration
  // audited-bnlj(q_customer_concentration): build side = 1-row global-aggregate broadcast — audited in PlanAuditSpec/BnljAudit
  /** Revenue concentration: what share of total order revenue do the
    * top 10 customers hold, in exact ppm — the "how dependent are we on
    * our whales" number next to q_hhi's index and q_decile_share's
    * curve. Top-k by exact DECIMAL cents (TakeOrderedAndProject — no
    * global sort), the share one integer cross-multiplication against
    * the broadcast total. */
  val ConcentrationTopK = 10

  private def customerConcentration(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val perCust = Tables.orders(s, dir)
      .groupBy($"o_custkey")
      .agg((sum($"o_totalprice".cast(DecimalType(28, 2))) * 100)
        .cast("long").as("cents"))
    val total = perCust.agg(sum($"cents").as("tot_cents"),
      count(lit(1)).as("n_customers"))
    val top = perCust.orderBy($"cents".desc, $"o_custkey")
      .limit(ConcentrationTopK)
      .agg(sum($"cents").as("top_cents"), count(lit(1)).as("k"))
    top.crossJoin(broadcast(total))
      .select($"k", $"n_customers", $"top_cents", $"tot_cents",
        expr("top_cents * 1000000 DIV tot_cents").as("top_share_ppm"))
  }

  private val customerConcentrationSql =
    s"""WITH pc AS (
      |  SELECT o_custkey,
      |    CAST(SUM(CAST(o_totalprice AS DECIMAL(28,2))) * 100 AS BIGINT)
      |      AS cents
      |  FROM orders GROUP BY 1),
      |t AS (SELECT CAST(SUM(cents) AS BIGINT) AS tot_cents,
      |             COUNT(*) AS n_customers FROM pc),
      |top AS (
      |  SELECT CAST(SUM(cents) AS BIGINT) AS top_cents, COUNT(*) AS k
      |  FROM (SELECT cents FROM pc ORDER BY cents DESC, o_custkey
      |        LIMIT $ConcentrationTopK))
      |SELECT k, n_customers, top_cents, tot_cents,
      |  CAST(top_cents * 1000000 // tot_cents AS BIGINT) AS top_share_ppm
      |FROM top CROSS JOIN t""".stripMargin

  // -------------------------------------------------------- q_new_vs_returning
  /** New-vs-returning revenue split per month — the growth dashboard's
    * first question: is this month's revenue acquisition or retention?
    * An order is NEW when it falls in its customer's first active
    * month. One custkey aggregation for first months, one custkey
    * shuffle to classify (no broadcast of a customer-sized frame), one
    * month-grid rollup; the share is exact ppm. */
  private def newVsReturning(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val first = Tables.orders(s, dir)
      .groupBy($"o_custkey".as("ck"))
      .agg(min(date_format($"o_orderdate", "yyyy-MM")).as("first_month"))
    Tables.orders(s, dir)
      .select($"o_custkey", $"o_totalprice",
        date_format($"o_orderdate", "yyyy-MM").as("month"))
      .join(first, $"o_custkey" === $"ck")
      .withColumn("is_new", ($"month" === $"first_month").cast("long"))
      .groupBy($"month")
      .agg(count(lit(1)).as("n_orders"),
        sum($"is_new").as("n_new"),
        (sum(when($"is_new" === 1, $"o_totalprice")
          .otherwise(lit(0.0)).cast(DecimalType(28, 2))) * 100)
          .cast("long").as("new_cents"),
        (sum($"o_totalprice".cast(DecimalType(28, 2))) * 100)
          .cast("long").as("total_cents"))
      .select($"month", $"n_orders", $"n_new",
        ($"n_orders" - $"n_new").as("n_returning"),
        $"new_cents", $"total_cents",
        expr("new_cents * 1000000 DIV total_cents").as("new_share_ppm"))
      .orderBy($"month")
  }

  private val newVsReturningSql =
    """WITH f AS (
      |  SELECT o_custkey AS ck,
      |    MIN(strftime(o_orderdate, '%Y-%m')) AS first_month
      |  FROM orders GROUP BY 1),
      |o AS (
      |  SELECT strftime(o_orderdate, '%Y-%m') AS month, o_totalprice,
      |    CASE WHEN strftime(o_orderdate, '%Y-%m') = first_month
      |      THEN 1 ELSE 0 END AS is_new
      |  FROM orders JOIN f ON o_custkey = ck)
      |SELECT month, COUNT(*) AS n_orders,
      |  CAST(SUM(is_new) AS BIGINT) AS n_new,
      |  CAST(COUNT(*) - SUM(is_new) AS BIGINT) AS n_returning,
      |  CAST(SUM(CASE WHEN is_new = 1 THEN CAST(o_totalprice AS DECIMAL(28,2))
      |    ELSE CAST(0.0 AS DECIMAL(28,2)) END) * 100 AS BIGINT) AS new_cents,
      |  CAST(SUM(CAST(o_totalprice AS DECIMAL(28,2))) * 100 AS BIGINT)
      |    AS total_cents,
      |  CAST(CAST(SUM(CASE WHEN is_new = 1
      |      THEN CAST(o_totalprice AS DECIMAL(28,2))
      |      ELSE CAST(0.0 AS DECIMAL(28,2)) END) * 100 AS BIGINT) * 1000000
      |    // CAST(SUM(CAST(o_totalprice AS DECIMAL(28,2))) * 100 AS BIGINT)
      |    AS BIGINT) AS new_share_ppm
      |FROM o GROUP BY month ORDER BY month""".stripMargin

  // ------------------------------------------------------------- q_cohort_ltv
  /** Cohort lifetime-value matrix: customers grouped by first-order
    * month, revenue tracked by months-since-acquisition — the
    * complement of q_cohort_retention's headcount view (who still
    * ORDERS vs what they still SPEND). Cumulative cents per (cohort,
    * age) via an age-ordered window PARTITIONED BY COHORT (frame
    * bounded by the calendar), plus each age's cumulative share of the
    * cohort's lifetime revenue in exact ppm. */
  private def cohortLtv(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val mIdx = (c: org.apache.spark.sql.Column) =>
      year(c) * 12 + month(c)
    val first = Tables.orders(s, dir)
      .groupBy($"o_custkey".as("ck"))
      .agg(min($"o_orderdate").as("first_date"))
      .select($"ck", date_format($"first_date", "yyyy-MM").as("cohort"),
        mIdx($"first_date").as("c_idx"))
    val cells = Tables.orders(s, dir)
      .select($"o_custkey", $"o_totalprice", $"o_orderdate")
      .join(first, $"o_custkey" === $"ck")
      .groupBy($"cohort",
        (mIdx($"o_orderdate") - $"c_idx").cast("long").as("age_months"))
      .agg((sum($"o_totalprice".cast(DecimalType(28, 2))) * 100)
        .cast("long").as("cents"))
    val w = Window.partitionBy($"cohort").orderBy($"age_months")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wAll = Window.partitionBy($"cohort")
    cells
      .withColumn("cum_cents", sum($"cents").over(w))
      .withColumn("lifetime_cents", sum($"cents").over(wAll))
      .select($"cohort", $"age_months", $"cents", $"cum_cents",
        expr("cum_cents * 1000000 DIV lifetime_cents").as("ltv_share_ppm"))
      .orderBy($"cohort", $"age_months")
  }

  private val cohortLtvSql =
    """WITH f AS (
      |  SELECT o_custkey AS ck, MIN(o_orderdate) AS first_date
      |  FROM orders GROUP BY 1),
      |fc AS (
      |  SELECT ck, strftime(first_date, '%Y-%m') AS cohort,
      |    EXTRACT(year FROM first_date) * 12 + EXTRACT(month FROM first_date)
      |      AS c_idx
      |  FROM f),
      |cells AS (
      |  SELECT cohort,
      |    CAST(EXTRACT(year FROM o_orderdate) * 12
      |      + EXTRACT(month FROM o_orderdate) - c_idx AS BIGINT)
      |      AS age_months,
      |    CAST(SUM(CAST(o_totalprice AS DECIMAL(28,2))) * 100 AS BIGINT)
      |      AS cents
      |  FROM orders JOIN fc ON o_custkey = ck
      |  GROUP BY 1, 2)
      |SELECT cohort, age_months, cents,
      |  CAST(SUM(cents) OVER (PARTITION BY cohort ORDER BY age_months
      |    ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_cents,
      |  CAST(CAST(SUM(cents) OVER (PARTITION BY cohort ORDER BY age_months
      |      ROWS UNBOUNDED PRECEDING) AS BIGINT) * 1000000
      |    // CAST(SUM(cents) OVER (PARTITION BY cohort) AS BIGINT)
      |    AS BIGINT) AS ltv_share_ppm
      |FROM cells
      |ORDER BY cohort, age_months""".stripMargin

  // -------------------------------------------------------------- q_abc_analysis
  // audited-bnlj(q_abc_analysis): build side = 1-row global-aggregate broadcast — audited in PlanAuditSpec/BnljAudit
  /** ABC inventory classification: parts ranked by revenue, classified
    * A (first 80% of cumulative revenue), B (next 15%), C (the tail) —
    * the classic Pareto cut. The interesting part at scale is the
    * CUMULATIVE SUM OVER A PART-SIZED FRAME: a plain
    * `sum() over (order by revenue)` serializes through one task, so
    * this runs the Corpus.globalIndex recipe generalized to prefix
    * sums — range-repartition by (revenue desc, partkey), per-partition
    * cents totals broadcast as offsets, in-partition cumulative windows
    * PARTITIONED BY __pid. Class boundaries are exact integer
    * cross-multiplications; output is the 3-row class summary. */
  private def abcAnalysis(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val perPart = Tables.lineitem(s, dir)
      .groupBy($"l_partkey")
      .agg((sum(($"l_extendedprice" * (lit(1) - $"l_discount"))
        .cast(DecimalType(28, 4))) * 10000).cast("long").as("tenths_mil"))
    // distributed prefix sum: range layout pinned once (the globalIndex
    // localCheckpoint contract), per-partition offsets broadcast back
    val parts = perPart
      .repartitionByRange((-$"tenths_mil").asc, $"l_partkey".asc)
      .withColumn("__pid", spark_partition_id())
      .lineageCut(true)
    val offsets = parts.groupBy($"__pid")
      .agg(sum($"tenths_mil").as("__p_cents"))
      .withColumn("__offset",
        coalesce(sum($"__p_cents").over(
          Window.orderBy($"__pid")
            .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .drop("__p_cents")
    val wIn = Window.partitionBy($"__pid")
      .orderBy((-$"tenths_mil").asc, $"l_partkey".asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val cum = parts
      .withColumn("__in_cum", sum($"tenths_mil").over(wIn))
      .join(broadcast(offsets), Seq("__pid"))
      .select($"l_partkey", $"tenths_mil",
        ($"__in_cum" + $"__offset").as("cum"))
    val total = perPart.agg(sum($"tenths_mil").as("tot"))
    cum.crossJoin(broadcast(total))
      .withColumn("abc_class",
        when($"cum" * 100 <= $"tot" * 80, "A")
          .when($"cum" * 100 <= $"tot" * 95, "B")
          .otherwise("C"))
      .groupBy($"abc_class")
      .agg(count(lit(1)).as("n_parts"),
        sum($"tenths_mil").as("class_tenths_mil"))
      .withColumn("revenue", round($"class_tenths_mil".cast("double") / 10000, 4))
      .drop("class_tenths_mil")
      .orderBy($"abc_class")
  }

  private val abcAnalysisSql =
    """WITH pp AS (
      |  SELECT l_partkey,
      |    CAST(SUM(CAST(l_extendedprice * (1 - l_discount)
      |      AS DECIMAL(28,4))) * 10000 AS BIGINT) AS tenths_mil
      |  FROM lineitem GROUP BY 1),
      |c AS (
      |  SELECT l_partkey, tenths_mil,
      |    SUM(tenths_mil) OVER (ORDER BY tenths_mil DESC, l_partkey
      |      ROWS UNBOUNDED PRECEDING) AS cum,
      |    SUM(tenths_mil) OVER () AS tot
      |  FROM pp)
      |SELECT CASE WHEN cum * 100 <= tot * 80 THEN 'A'
      |            WHEN cum * 100 <= tot * 95 THEN 'B'
      |            ELSE 'C' END AS abc_class,
      |  COUNT(*) AS n_parts,
      |  round(CAST(SUM(tenths_mil) AS DOUBLE) / 10000, 4) AS revenue
      |FROM c
      |GROUP BY 1 ORDER BY abc_class""".stripMargin

  // ----------------------------------------------------------------- q_fill_rate
  /** Order fill rate per month: the share of orders whose EVERY line
    * shipped within 90 days — the order-level SLA (q_late_lines_trend
    * counts lines; a customer experiences ORDERS). The universal
    * quantifier collapses to one order-level aggregate (max ship lag ≤
    * bound decides), bucketed by order month; the rate is exact ppm. */
  private def fillRate(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val perOrder = Tables.lineitem(s, dir).select($"l_orderkey", $"l_shipdate")
      .join(Tables.orders(s, dir)
        .select($"o_orderkey", $"o_orderdate"), $"l_orderkey" === $"o_orderkey")
      .groupBy($"o_orderkey",
        date_format($"o_orderdate", "yyyy-MM").as("order_month"))
      .agg(max(datediff($"l_shipdate", $"o_orderdate")).as("max_lag"))
    perOrder.groupBy($"order_month")
      .agg(count(lit(1)).as("n_orders"),
        sum(when($"max_lag" <= 90, 1L).otherwise(0L)).as("n_filled"))
      .withColumn("fill_ppm", expr("n_filled * 1000000 DIV n_orders"))
      .orderBy($"order_month")
  }

  private val fillRateSql =
    """WITH po AS (
      |  SELECT o_orderkey, strftime(o_orderdate, '%Y-%m') AS order_month,
      |    MAX(date_diff('day', o_orderdate, l_shipdate)) AS max_lag
      |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      |  GROUP BY 1, 2)
      |SELECT order_month, COUNT(*) AS n_orders,
      |  CAST(SUM(CASE WHEN max_lag <= 90 THEN 1 ELSE 0 END) AS BIGINT)
      |    AS n_filled,
      |  CAST(SUM(CASE WHEN max_lag <= 90 THEN 1 ELSE 0 END) * 1000000
      |    // COUNT(*) AS BIGINT) AS fill_ppm
      |FROM po GROUP BY 1 ORDER BY order_month""".stripMargin

  // ----------------------------------------------------------------- q_skewness
  /** Third-moment skewness of the monthly revenue distribution — are
    * revenue months symmetric around their mean, or tail-heavy? Raw
    * power sums Σx, Σx², Σx³ are exact DECIMAL(38) over the month grid
    * with x in DOLLARS (cents DIV 100): |x| < 2·10¹² keeps x³ inside 38
    * digits with the month count to spare, and a raise_error guard
    * fails loudly (the q_curriculum overflow contract) instead of
    * silently truncating if a corpus ever breaches it. The central-
    * moment combination and g₁ = m₃/m₂^{3/2} evaluate in doubles from
    * those exact operands — identical expression trees both engines,
    * sqrt IEEE-exact. */
  private def skewness(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val bound = 2000000000000L // 2e12 dollars/month: x^3 < 10^37
    val grid = monthly(s, dir)
      .select(expr("cents DIV 100").as("x0"))
      .select(when(abs($"x0") >= bound,
          expr(s"raise_error('q_skewness: |monthly dollars| >= $bound " +
            "overflows the exact DECIMAL(38) cube — rescale the unit')"))
        .otherwise($"x0").as("x"))
    val sums = grid.agg(
      count(lit(1)).as("n"),
      sum($"x".cast(d38)).cast(d38).as("s1"),
      sum(($"x".cast(d38) * $"x").cast(d38)).cast(d38).as("s2"),
      sum((($"x".cast(d38) * $"x").cast(d38) * $"x").cast(d38)).cast(d38)
        .as("s3"))
    val nD = $"n".cast("double")
    val m2 = $"s2".cast("double") - $"s1".cast("double") * $"s1".cast("double") / nD
    val m3 = $"s3".cast("double") -
      lit(3.0) * $"s1".cast("double") * $"s2".cast("double") / nD +
      lit(2.0) * $"s1".cast("double") * $"s1".cast("double") *
        $"s1".cast("double") / (nD * nD)
    sums.select($"n",
      $"s1".cast("string").as("s1"), $"s2".cast("string").as("s2"),
      $"s3".cast("string").as("s3"),
      round((m3 / nD) / ((m2 / nD) * sqrt(m2 / nD)), 9).as("skewness"))
  }

  private val skewnessSql =
    s"""WITH monthly AS ($monthlySql),
      |g AS (SELECT cents // 100 AS x FROM monthly),
      |sums AS (
      |  SELECT COUNT(*) AS n,
      |    CAST(SUM(CAST(x AS DECIMAL(38,0))) AS DECIMAL(38,0)) AS s1,
      |    CAST(SUM(CAST(CAST(x AS DECIMAL(38,0)) * x AS DECIMAL(38,0)))
      |      AS DECIMAL(38,0)) AS s2,
      |    CAST(SUM(CAST(CAST(CAST(x AS DECIMAL(38,0)) * x
      |      AS DECIMAL(38,0)) * x AS DECIMAL(38,0))) AS DECIMAL(38,0)) AS s3
      |  FROM g)
      |SELECT n, CAST(s1 AS VARCHAR) AS s1, CAST(s2 AS VARCHAR) AS s2,
      |  CAST(s3 AS VARCHAR) AS s3,
      |  round(((CAST(s3 AS DOUBLE)
      |      - 3.0 * CAST(s1 AS DOUBLE) * CAST(s2 AS DOUBLE) / CAST(n AS DOUBLE)
      |      + 2.0 * CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE)
      |        * CAST(s1 AS DOUBLE)
      |        / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE))) / CAST(n AS DOUBLE))
      |    / (((CAST(s2 AS DOUBLE)
      |        - CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE))
      |        / CAST(n AS DOUBLE))
      |      * sqrt((CAST(s2 AS DOUBLE)
      |        - CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE))
      |        / CAST(n AS DOUBLE))), 9) AS skewness
      |FROM sums""".stripMargin

  // ---------------------------------------------------------------- q_holt
  /** Holt linear (double) exponential smoothing over the monthly
    * revenue grid — level + trend with fixed alpha = 0.3, beta = 0.2 —
    * computed as a SEQUENTIAL FOLD inside one row: the calendar-bounded
    * month grid collects into a sorted array and `aggregate` (the
    * codegen'd HOF) folds the recurrence l' = a*y + (1-a)(l+b),
    * b' = B(l'-l) + (1-B)b left to right. The oracle replays the same
    * fold as a recursive CTE with the IDENTICAL expression tree —
    * +,*,- only (no transcendentals), so the doubles agree bit-for-bit
    * before the final 6dp display round. Init: l1 = y1, b1 = 0.
    *
    * Scale shape: one orders aggregation to the month grid (map-side
    * partials), then a single-row fold over a frame bounded by data
    * lifetime in months — the idiomatic Spark shape for inherently
    * sequential small-state recurrences (collect the BOUNDED grid, fold
    * in one task) instead of a serialized global window. */
  private def holt(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    monthly(s, dir)
      .agg(sort_array(collect_list(struct($"month", $"cents"))).as("ms"))
      .select(expr("transform(ms, x -> CAST(x.cents AS DOUBLE))").as("ys"))
      .select(size($"ys").cast("long").as("n_months"),
        expr(
          "aggregate(ys, named_struct('l', 0.0D, 'b', 0.0D, 'i', 0), " +
            "(a, y) -> IF(a.i = 0, named_struct('l', y, 'b', 0.0D, 'i', 1), " +
            "named_struct(" +
            "'l', 0.3D * y + 0.7D * (a.l + a.b), " +
            "'b', 0.2D * ((0.3D * y + 0.7D * (a.l + a.b)) - a.l) + 0.8D * a.b, " +
            "'i', a.i + 1)))").as("h"))
      // floor-scaled milli-cents, NOT round(x, 6): the folded doubles
      // are bit-identical across engines, but round() is not — Spark
      // rounds the double's SHORTEST DECIMAL representation (BigDecimal
      // .valueOf) while DuckDB rounds the binary value, and they split
      // on representations near a rounding boundary (observed at sf0.01
      // on the forecast sum). floor of identical doubles is identical.
      .select($"n_months",
        floor($"h.l" * 1000).cast("long").as("level_mcents"),
        floor($"h.b" * 1000).cast("long").as("trend_mcents"),
        floor(($"h.l" + $"h.b") * 1000).cast("long").as("forecast_next_mcents"))
  }

  private val holtSql =
    s"""WITH RECURSIVE monthly AS ($monthlySql),
       |g AS (
       |  SELECT CAST(cents AS DOUBLE) AS y,
       |    ROW_NUMBER() OVER (ORDER BY month) AS idx
       |  FROM monthly),
       |n AS (SELECT COUNT(*) AS c FROM g),
       |holt(idx, l, b) AS (
       |  SELECT 1, y, 0.0e0 FROM g WHERE idx = 1
       |  UNION ALL
       |  SELECT h.idx + 1,
       |    0.3e0 * t.y + 0.7e0 * (h.l + h.b),
       |    0.2e0 * ((0.3e0 * t.y + 0.7e0 * (h.l + h.b)) - h.l) + 0.8e0 * h.b
       |  FROM holt h JOIN g t ON t.idx = h.idx + 1)
       |SELECT (SELECT c FROM n) AS n_months,
       |  CAST(floor(l * 1000) AS BIGINT) AS level_mcents,
       |  CAST(floor(b * 1000) AS BIGINT) AS trend_mcents,
       |  CAST(floor((l + b) * 1000) AS BIGINT) AS forecast_next_mcents
       |FROM holt WHERE idx = (SELECT c FROM n)""".stripMargin

  // ------------------------------------------------------------ q_event_path
  /** Sequential-pattern (CEP-lite) detection: complete view -> click ->
    * purchase paths per user where each step follows the previous
    * within PathStepMinutes (4h) — the MATCH_RECOGNIZE-style query Spark
    * lacks natively, composed as CHAINED INTERVAL EQUI-JOINS (user_id
    * equality + bounded time distance), the formulation that shuffles
    * on the user key and never degenerates into a time-cross-product.
    * Emits each path with its step ids and total latency in exact
    * microseconds.
    *
    * Scale shape: two user-keyed joins over type-filtered slices (each
    * a pushed-filter scan), candidate growth bounded by per-user
    * activity within the step window; at 100 TB the same plan runs as
    * the stream-stream interval-join chain (q_stream_interval_join is
    * step one of this exact pattern). */
  /** 4h per step: the fixture's per-user event cadence is ~hourly at
    * the gate scale, so minutes-scale windows are vacuous — 240 gives a
    * small non-empty path set at sf0.01 and a dense one at sf0.1. */
  val PathStepMinutes = 240

  private def eventPath(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val e = Tables.events(s, dir)
    def slice(t: String, idAs: String, tsAs: String) =
      e.filter($"event_type" === t)
        .select($"user_id", $"event_id".as(idAs), $"ts".as(tsAs))
    val v = slice("view", "view_id", "view_ts")
    val c = slice("click", "click_id", "click_ts")
    val p = slice("purchase", "purchase_id", "purchase_ts")
    val step = expr(s"INTERVAL $PathStepMinutes MINUTES")
    v.join(c, Seq("user_id"))
      .filter($"click_ts" >= $"view_ts" && $"click_ts" <= $"view_ts" + step)
      .join(p, Seq("user_id"))
      .filter($"purchase_ts" >= $"click_ts" &&
        $"purchase_ts" <= $"click_ts" + step)
      .select($"user_id", $"view_id", $"click_id", $"purchase_id",
        (unix_micros($"purchase_ts") - unix_micros($"view_ts"))
          .as("path_latency_us"))
      .orderBy($"view_id", $"click_id", $"purchase_id")
  }

  private val eventPathSql =
    s"""SELECT v.user_id, v.event_id AS view_id, c.event_id AS click_id,
       |  p.event_id AS purchase_id,
       |  epoch_us(p.ts) - epoch_us(v.ts) AS path_latency_us
       |FROM events v
       |JOIN events c ON c.user_id = v.user_id
       |  AND v.event_type = 'view' AND c.event_type = 'click'
       |  AND c.ts >= v.ts AND c.ts <= v.ts + INTERVAL $PathStepMinutes MINUTE
       |JOIN events p ON p.user_id = v.user_id
       |  AND p.event_type = 'purchase'
       |  AND p.ts >= c.ts AND p.ts <= c.ts + INTERVAL $PathStepMinutes MINUTE
       |ORDER BY view_id, click_id, purchase_id""".stripMargin

  val all: Seq[NamedQuery] = Seq(
    NamedQuery("q_ship_latency", shipLatency, Some(shipLatencySql), bench = true),
    NamedQuery("q_latency_tail", latencyTail, Some(latencyTailSql), bench = true),
    NamedQuery("q_seasonal_anomalies", seasonalAnomalies,
      Some(seasonalAnomaliesSql), bench = true),
    NamedQuery("q_active_users", activeUsers, Some(activeUsersSql), bench = true),
    NamedQuery("q_conversion_latency", conversionLatency,
      Some(conversionLatencySql), bench = true),
    NamedQuery("q_data_freshness", dataFreshness, Some(dataFreshnessSql),
      bench = true),
    NamedQuery("q_repurchase_gap", repurchaseGap, Some(repurchaseGapSql),
      bench = true),
    NamedQuery("q_discount_elasticity", discountElasticity,
      Some(discountElasticitySql), bench = true),
    NamedQuery("q_order_size_dist", orderSizeDist, Some(orderSizeDistSql),
      bench = true),
    NamedQuery("q_late_lines_trend", lateLinesTrend, Some(lateLinesTrendSql),
      bench = true),
    NamedQuery("q_customer_concentration", customerConcentration,
      Some(customerConcentrationSql), bench = true),
    NamedQuery("q_new_vs_returning", newVsReturning, Some(newVsReturningSql),
      bench = true),
    NamedQuery("q_cohort_ltv", cohortLtv, Some(cohortLtvSql), bench = true),
    NamedQuery("q_abc_analysis", abcAnalysis, Some(abcAnalysisSql), bench = true),
    NamedQuery("q_fill_rate", fillRate, Some(fillRateSql), bench = true),
    NamedQuery("q_skewness", skewness, Some(skewnessSql), bench = true),
    NamedQuery("q_kendall_tau", kendallTau, Some(kendallTauSql), bench = true),
    NamedQuery("q_theil_sen", theilSen, Some(theilSenSql), bench = true),
    NamedQuery("q_runs_test", runsTest, Some(runsTestSql), bench = true),
    NamedQuery("q_cross_corr", crossCorr, Some(crossCorrSql), bench = true),
    NamedQuery("q_changepoint", changepoint, Some(changepointSql), bench = true),
    NamedQuery("q_event_path", eventPath, Some(eventPathSql), bench = true),
    NamedQuery("q_holt", holt, Some(holtSql), bench = true),
    NamedQuery("q_max_concurrent", maxConcurrent, Some(maxConcurrentSql), bench = true),
    NamedQuery("q_rel_division", relDivision, Some(relDivisionSql), bench = true),
    NamedQuery("q_ols_trend", olsTrend, Some(olsTrendSql), bench = true),
    NamedQuery("q_mann_kendall", mannKendall, Some(mannKendallSql), bench = true),
    NamedQuery("q_wilcoxon", wilcoxon, Some(wilcoxonSql), bench = true),
    NamedQuery("q_partial_corr", partialCorr, Some(partialCorrSql), bench = true))
}
