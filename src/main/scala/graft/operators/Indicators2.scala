package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.NamedQuery

/** Risk & microstructure family (round 10) — the portfolio/risk screen
  * one step past Indicators' technical-analysis layer. The reference
  * dashboard serves per-company monthly trends (reference
  * `Frontend.py:71-79`); a risk desk built on the same tick feed needs
  * the summary statistics OF those series: risk-adjusted return
  * (Sharpe/Sortino), realized volatility, effective spread (Roll 1984),
  * price impact (Kyle-lambda-style regression slope), underwater-spell
  * accounting, and the cross-instrument correlation matrix.
  *
  * Exactness discipline (inherited from [[Indicators]]): prices are
  * BIGINT cents, every statistic is integer arithmetic over cleared
  * denominators — variance as n·Σx² − (Σx)², covariance as
  * n·Σxy − Σx·Σy — with ONE extra primitive this family adds: the
  * integer square root isqrt(v) = CAST(FLOOR(SQRT(CAST(v AS DOUBLE))) AS
  * BIGINT). That is cross-engine deterministic because (a) v < 2⁵² so
  * the BIGINT→DOUBLE conversion is exact, and (b) IEEE-754 sqrt is
  * correctly rounded in both JVMs and DuckDB, so both engines floor the
  * SAME double (the q_correlation / q_cross_corr "IEEE-exact sqrt on
  * bit-identical operands" argument, here floored to an integer instead
  * of rounded to 9 decimals). Indicators2Spec asserts the < 2⁵² envelope
  * per fixture for every isqrt argument.
  *
  * Scale shape, shared: everything runs over the calendar-bounded daily
  * bar grid ([[Indicators.bars]] — ticks collapse in ONE keyed exchange,
  * windows ride the grid). Each statistic is then one instrument-keyed
  * aggregation; q_pair_corr's self-join is day-keyed over the grid, so
  * its per-day match set is |instruments|² — a symbol-roster bound, not
  * a data bound. Tick volume enters each statistic through the bar
  * grid, so every downstream frame is roster × calendar sized; note
  * that queries joining DIFFERENTLY-PROJECTED branches of the grid
  * (q_pair_corr's self-join, the roster/gate branches of q_underwater /
  * q_rebalance_turnover / q_anova) re-run the tick→bar aggregation per
  * branch — diverged column pruning defeats exchange reuse (the
  * q_tfidf lesson) — so the tick scan count is the branch count, a
  * small constant, while all O(data) growth stays in that one keyed
  * rollup per branch. */
object Indicators2 {

  /** Day-ordered close diffs per instrument (cents), the shared series:
    * one partitioned LAG over the bar grid. */
  private def diffs(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val wo = Window.partitionBy($"event_type").orderBy($"day")
    Indicators.bars(s, dir)
      .withColumn("prev", lag($"close_cents", 1).over(wo))
      .filter($"prev".isNotNull)
      .select($"event_type", $"day", ($"close_cents" - $"prev").as("x"))
  }

  /** DuckDB mirror of [[diffs]], appended to [[Indicators.barsSqlCte]]:
    * CTEs `d0` (lagged) and `diffs` (non-null rows). */
  private val diffsSqlCte =
    s"""${Indicators.barsSqlCte},
       |d0 AS (
       |  SELECT event_type, day,
       |    close_cents - LAG(close_cents) OVER (
       |      PARTITION BY event_type ORDER BY day) AS x
       |  FROM bars),
       |diffs AS (SELECT * FROM d0 WHERE x IS NOT NULL)""".stripMargin

  /** The isqrt spelling both engines share (see object scaladoc). */
  private def isqrtSql(v: String): String =
    s"CAST(FLOOR(SQRT(CAST($v AS DOUBLE))) AS BIGINT)"

  // ------------------------------------------------------------ q_sharpe
  /** Sharpe and Sortino ratios per instrument on daily close diffs
    * (cents — diffs, not ratio returns, keep the BIGINT envelope
    * provable). Clearing n from mean/σ:
    *   sharpe  = (Σx/n) / (√(n·Σx²−(Σx)²)/n) = Σx / √(n·Σx²−(Σx)²)
    *   sortino = Σx / √(n·Σmin(x,0)²)      (downside deviation)
    * both emitted in milli via the exact isqrt; NULL when the deviation
    * is zero (a flat series has no risk-adjusted return — both engines
    * agree via NULLIF). Signed numerators truncate toward zero in both
    * engines (q_cuped precedent). */
  private def sharpe(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    diffs(s, dir)
      .groupBy($"event_type")
      .agg(count(lit(1)).as("n_days"),
        sum($"x").as("sx"),
        sum($"x" * $"x").as("sxx"),
        sum(when($"x" < 0, $"x" * $"x").otherwise(lit(0L))).as("sdd"))
      .withColumn("sharpe_milli", expr(
        s"sx * 1000 DIV nullif(${isqrtSql("n_days * sxx - sx * sx")}, 0)"))
      .withColumn("sortino_milli", expr(
        s"sx * 1000 DIV nullif(${isqrtSql("n_days * sdd")}, 0)"))
      .select($"event_type", $"n_days", $"sx".as("sum_diff_cents"),
        $"sharpe_milli", $"sortino_milli")
      .orderBy($"event_type")
  }

  private[operators] val sharpeSql =
    s"""$diffsSqlCte,
       |stats AS (
       |  SELECT event_type, COUNT(*) AS n_days,
       |    CAST(SUM(x) AS BIGINT) AS sx,
       |    CAST(SUM(x * x) AS BIGINT) AS sxx,
       |    CAST(SUM(CASE WHEN x < 0 THEN x * x ELSE 0 END) AS BIGINT) AS sdd
       |  FROM diffs GROUP BY event_type)
       |SELECT event_type, n_days, sx AS sum_diff_cents,
       |  sx * 1000 // NULLIF(${isqrtSql("n_days * sxx - sx * sx")}, 0)
       |    AS sharpe_milli,
       |  sx * 1000 // NULLIF(${isqrtSql("n_days * sdd")}, 0)
       |    AS sortino_milli
       |FROM stats ORDER BY event_type""".stripMargin

  // ------------------------------------------------------ q_realized_vol
  /** Realized volatility per instrument, two estimators side by side:
    * close-to-close (Σ diff² over the day grid, realized variance in
    * cents²; vol = isqrt) and the high-low range analogue
    * (Σ (high−low)² — the Parkinson estimator's exact-integer range
    * core, without its 1/(4·ln2) float constant, so the column stays a
    * provable BIGINT). First bar of each instrument has no diff (COUNT
    * of diffs rides along); range sums cover ALL bars. */
  private def realizedVol(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val wo = Window.partitionBy($"event_type").orderBy($"day")
    Indicators.bars(s, dir)
      .withColumn("prev", lag($"close_cents", 1).over(wo))
      .withColumn("x", $"close_cents" - $"prev")
      .withColumn("rng", $"high_cents" - $"low_cents")
      .groupBy($"event_type")
      .agg(count(lit(1)).as("n_days"),
        count($"x").as("n_diffs"),
        coalesce(sum($"x" * $"x"), lit(0L)).as("rv_cents2"),
        sum($"rng" * $"rng").as("range_cents2"))
      .withColumn("rvol_cents", expr(isqrtSql("rv_cents2")))
      .withColumn("range_vol_cents", expr(isqrtSql("range_cents2")))
      .orderBy($"event_type")
  }

  private val realizedVolSql =
    s"""${Indicators.barsSqlCte},
       |b AS (
       |  SELECT event_type,
       |    close_cents - LAG(close_cents) OVER (
       |      PARTITION BY event_type ORDER BY day) AS x,
       |    high_cents - low_cents AS rng
       |  FROM bars),
       |stats AS (
       |  SELECT event_type, COUNT(*) AS n_days, COUNT(x) AS n_diffs,
       |    COALESCE(CAST(SUM(x * x) AS BIGINT), 0) AS rv_cents2,
       |    CAST(SUM(rng * rng) AS BIGINT) AS range_cents2
       |  FROM b GROUP BY event_type)
       |SELECT event_type, n_days, n_diffs, rv_cents2,
       |  range_cents2, ${isqrtSql("rv_cents2")} AS rvol_cents,
       |  ${isqrtSql("range_cents2")} AS range_vol_cents
       |FROM stats ORDER BY event_type""".stripMargin

  // ------------------------------------------------------- q_roll_spread
  /** Roll (1984) implied effective spread: bid-ask bounce makes
    * consecutive price changes negatively autocorrelated, and
    * spread = 2·√(−cov(Δp_t, Δp_{t−1})). Cleared covariance over the
    * n consecutive-diff pairs: cov_num = n·Σ(x_t·x_{t−1}) − Σx_t·Σx_{t−1}
    * (= n²·cov), so spread = 2·√(−cov_num)/n — emitted in millicents as
    * 2000·isqrt(−cov_num) DIV n. NULL when cov_num ≥ 0 (the estimator is
    * undefined under positive autocorrelation — Roll's own convention;
    * surfacing the NULL is the honest accounting, the q_good_turing
    * precedent). */
  private def rollSpread(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val wo = Window.partitionBy($"event_type").orderBy($"day")
    diffs(s, dir)
      .withColumn("xp", lag($"x", 1).over(wo))
      .filter($"xp".isNotNull)
      .groupBy($"event_type")
      .agg(count(lit(1)).as("n_pairs"),
        sum($"x").as("sx"),
        sum($"xp").as("sy"),
        sum($"x" * $"xp").as("sxy"))
      .withColumn("cov_num", expr("n_pairs * sxy - sx * sy"))
      .withColumn("roll_spread_millicents", expr(
        s"CASE WHEN cov_num < 0 THEN 2000 * ${isqrtSql("-cov_num")} DIV n_pairs END"))
      .select($"event_type", $"n_pairs", $"cov_num",
        $"roll_spread_millicents")
      .orderBy($"event_type")
  }

  private val rollSpreadSql =
    s"""$diffsSqlCte,
       |p0 AS (
       |  SELECT event_type, x,
       |    LAG(x) OVER (PARTITION BY event_type ORDER BY day) AS xp
       |  FROM diffs),
       |p AS (SELECT * FROM p0 WHERE xp IS NOT NULL),
       |stats AS (
       |  SELECT event_type, COUNT(*) AS n_pairs,
       |    CAST(SUM(x) AS BIGINT) AS sx,
       |    CAST(SUM(xp) AS BIGINT) AS sy,
       |    CAST(SUM(x * xp) AS BIGINT) AS sxy
       |  FROM p GROUP BY event_type)
       |SELECT event_type, n_pairs,
       |  n_pairs * sxy - sx * sy AS cov_num,
       |  CASE WHEN n_pairs * sxy - sx * sy < 0
       |    THEN 2000 * ${isqrtSql("-(n_pairs * sxy - sx * sy)")} // n_pairs
       |  END AS roll_spread_millicents
       |FROM stats ORDER BY event_type""".stripMargin

  // ------------------------------------------------------ q_kyle_lambda
  /** Price impact per instrument: the OLS slope of |Δclose| (cents) on
    * daily traded notional (KILOcents — notional_cents DIV 1000 keeps
    * n·Σv² inside the BIGINT envelope at every shipped scale;
    * Indicators2Spec asserts it). The Kyle-lambda-style regression the
    * day grid supports without trade signs — the signed-flow variant
    * would need per-tick sides (q_tick_rule is the per-tick half).
    * λ̂ in milli(cents per kilocent):
    * (n·Σyv − Σy·Σv)·1000 DIV (n·Σv² − (Σv)²); the intercept rides along
    * in millicents (the q_beta α̂ shape). */
  private def kyleLambda(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val wo = Window.partitionBy($"event_type").orderBy($"day")
    Indicators.bars(s, dir)
      .withColumn("prev", lag($"close_cents", 1).over(wo))
      .filter($"prev".isNotNull)
      .select($"event_type",
        abs($"close_cents" - $"prev").as("y"),
        expr("notional_cents DIV 1000").as("v"))
      .groupBy($"event_type")
      .agg(count(lit(1)).as("n_days"),
        sum($"y").as("sy"),
        sum($"v").as("sv"),
        sum($"y" * $"v").as("syv"),
        sum($"v" * $"v").as("svv"))
      .withColumn("lambda_milli_per_kc", expr(
        "(n_days * syv - sy * sv) * 1000" +
          " DIV nullif(n_days * svv - sv * sv, 0)"))
      .withColumn("intercept_millicents", expr(
        "(sy * 1000 - lambda_milli_per_kc * sv) DIV n_days"))
      .select($"event_type", $"n_days", $"sy".as("sum_abs_diff_cents"),
        $"lambda_milli_per_kc", $"intercept_millicents")
      .orderBy($"event_type")
  }

  private val kyleLambdaSql =
    s"""${Indicators.barsSqlCte},
       |b0 AS (
       |  SELECT event_type,
       |    ABS(close_cents - LAG(close_cents) OVER (
       |      PARTITION BY event_type ORDER BY day)) AS y,
       |    notional_cents // 1000 AS v
       |  FROM bars),
       |b AS (SELECT * FROM b0 WHERE y IS NOT NULL),
       |stats AS (
       |  SELECT event_type, COUNT(*) AS n_days,
       |    CAST(SUM(y) AS BIGINT) AS sy, CAST(SUM(v) AS BIGINT) AS sv,
       |    CAST(SUM(y * v) AS BIGINT) AS syv,
       |    CAST(SUM(v * v) AS BIGINT) AS svv
       |  FROM b GROUP BY event_type)
       |SELECT event_type, n_days, sy AS sum_abs_diff_cents,
       |  (n_days * syv - sy * sv) * 1000
       |    // NULLIF(n_days * svv - sv * sv, 0) AS lambda_milli_per_kc,
       |  (sy * 1000 - ((n_days * syv - sy * sv) * 1000
       |    // NULLIF(n_days * svv - sv * sv, 0)) * sv) // n_days
       |    AS intercept_millicents
       |FROM stats ORDER BY event_type""".stripMargin

  // -------------------------------------------------------- q_underwater
  /** Underwater-spell accounting per instrument — the duration half of
    * q_max_drawdown's magnitude: a day is underwater when its close sits
    * strictly below the running peak; consecutive underwater days form a
    * spell (gaps-and-islands on the day index, the q_islands pattern).
    * Emits spell count, total underwater days, and the longest spell;
    * instruments never underwater keep a zero row via the left join from
    * the instrument roster (both engines agree on the COALESCE). */
  private def underwater(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val wo = Window.partitionBy($"event_type").orderBy($"day")
    val flagged = Indicators.bars(s, dir)
      .withColumn("run_max", max($"close_cents").over(
        wo.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .withColumn("idx", row_number().over(wo))
      .filter($"close_cents" < $"run_max")
    val spells = flagged
      .withColumn("grp", $"idx" - row_number().over(wo))
      .groupBy($"event_type", $"grp")
      .agg(count(lit(1)).as("len"))
    val perInst = spells.groupBy($"event_type")
      .agg(count(lit(1)).as("n_spells"),
        sum($"len").as("days_underwater"),
        max($"len").as("max_spell_days"))
    Indicators.bars(s, dir).select($"event_type").distinct()
      .join(perInst, Seq("event_type"), "left")
      .select($"event_type",
        coalesce($"n_spells", lit(0L)).as("n_spells"),
        coalesce($"days_underwater", lit(0L)).as("days_underwater"),
        coalesce($"max_spell_days", lit(0L)).as("max_spell_days"))
      .orderBy($"event_type")
  }

  private val underwaterSql =
    s"""${Indicators.barsSqlCte},
       |m AS (
       |  SELECT event_type, day, close_cents,
       |    MAX(close_cents) OVER (PARTITION BY event_type ORDER BY day
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS run_max,
       |    ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY day) AS idx
       |  FROM bars),
       |u AS (
       |  SELECT event_type, idx,
       |    ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY day) AS rn2
       |  FROM m WHERE close_cents < run_max),
       |g AS (
       |  SELECT event_type, idx - rn2 AS grp, COUNT(*) AS len
       |  FROM u GROUP BY 1, 2),
       |agg AS (
       |  SELECT event_type, COUNT(*) AS n_spells,
       |    CAST(SUM(len) AS BIGINT) AS days_underwater,
       |    MAX(len) AS max_spell_days
       |  FROM g GROUP BY event_type),
       |inst AS (SELECT DISTINCT event_type FROM bars)
       |SELECT inst.event_type,
       |  COALESCE(n_spells, 0) AS n_spells,
       |  COALESCE(days_underwater, 0) AS days_underwater,
       |  COALESCE(max_spell_days, 0) AS max_spell_days
       |FROM inst LEFT JOIN agg USING (event_type)
       |ORDER BY event_type""".stripMargin

  // --------------------------------------------------------- q_pair_corr
  /** Cross-instrument correlation matrix (upper triangle) of daily close
    * diffs — the risk screen's diversification view. Pairs align on
    * common days via a day-keyed self-join of the diff grid (per-day
    * match set = |instruments|², a symbol-roster bound); Pearson in
    * milli with BOTH deviations under the exact isqrt:
    * (n·Σxy − Σx·Σy)·1000 DIV (isqrt(n·Σx²−(Σx)²)·isqrt(n·Σy²−(Σy)²)).
    * The floored denominators can push |corr| a hair past 1000 — the
    * statistic is the deterministic integer form, not a float estimate.
    * NULL when either side is flat (NULLIF). */
  private def pairCorr(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val d = diffs(s, dir)
    val l = d.select($"event_type".as("a"), $"day", $"x".as("xa"))
    val r = d.select($"event_type".as("b"), $"day", $"x".as("xb"))
    l.join(r, Seq("day"))
      .filter($"a" < $"b")
      .groupBy($"a", $"b")
      .agg(count(lit(1)).as("n_days"),
        sum($"xa").as("sx"),
        sum($"xb").as("sy"),
        sum($"xa" * $"xb").as("sxy"),
        sum($"xa" * $"xa").as("sxx"),
        sum($"xb" * $"xb").as("syy"))
      .withColumn("corr_milli", expr(
        s"(n_days * sxy - sx * sy) * 1000 DIV nullif(" +
          s"${isqrtSql("n_days * sxx - sx * sx")} * " +
          s"${isqrtSql("n_days * syy - sy * sy")}, 0)"))
      .select($"a", $"b", $"n_days", $"corr_milli")
      .orderBy($"a", $"b")
  }

  private val pairCorrSql =
    s"""$diffsSqlCte,
       |j AS (
       |  SELECT l.event_type AS a, r.event_type AS b, l.x AS xa, r.x AS xb
       |  FROM diffs l JOIN diffs r ON l.day = r.day
       |  WHERE l.event_type < r.event_type),
       |stats AS (
       |  SELECT a, b, COUNT(*) AS n_days,
       |    CAST(SUM(xa) AS BIGINT) AS sx, CAST(SUM(xb) AS BIGINT) AS sy,
       |    CAST(SUM(xa * xb) AS BIGINT) AS sxy,
       |    CAST(SUM(xa * xa) AS BIGINT) AS sxx,
       |    CAST(SUM(xb * xb) AS BIGINT) AS syy
       |  FROM j GROUP BY a, b)
       |SELECT a, b, n_days,
       |  (n_days * sxy - sx * sy) * 1000 // NULLIF(
       |    ${isqrtSql("n_days * sxx - sx * sx")} *
       |    ${isqrtSql("n_days * syy - sy * sy")}, 0) AS corr_milli
       |FROM stats ORDER BY a, b""".stripMargin

  // ------------------------------------------------ q_rebalance_turnover
  /** Equal-notional portfolio drift: on days where the FULL instrument
    * roster trades (the q_beta broadcast-equi gate — no driver action,
    * no BNLJ), each instrument's index weight is close·1e6 DIV
    * Σcloses(day); the day's turnover is Σ|w − w_prev| across
    * instruments between consecutive full-roster days (what an
    * equal-weight rebalancer would trade, in ppm of the book), with the
    * max weight as the concentration gauge. The first gated day has no
    * predecessor and drops — both engines agree via the WHERE on the
    * lag. Weights are exact: close ≤ 1e5 cents keeps close·1e6 < 2⁵³.
    *
    * Scale shape: one day-keyed rollup of the bar grid, the 1-row
    * roster count broadcast back as an equi-join gate, one grid join,
    * one instrument-partitioned lag, one day-keyed rollup. */
  private def rebalanceTurnover(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val b = Indicators.bars(s, dir)
      .select($"event_type", $"day", $"close_cents")
    val cnt = b.select($"event_type").distinct()
      .agg(count(lit(1)).as("n_inst"))
    val gated = b.groupBy($"day")
      .agg(sum($"close_cents").as("total_cents"),
        count(lit(1)).as("n_traded"))
      .join(broadcast(cnt), $"n_traded" === $"n_inst")
      .select($"day", $"total_cents")
    val w = b.join(gated, "day")
      .withColumn("w_ppm", expr("close_cents * 1000000 DIV total_cents"))
      .withColumn("pw", lag($"w_ppm", 1).over(
        Window.partitionBy($"event_type").orderBy($"day")))
    w.filter($"pw".isNotNull)
      .groupBy($"day")
      .agg(max($"total_cents").as("total_cents"),
        max($"w_ppm").as("max_weight_ppm"),
        sum(abs($"w_ppm" - $"pw")).as("turnover_ppm"))
      .orderBy($"day")
  }

  private val rebalanceTurnoverSql =
    s"""${Indicators.barsSqlCte},
       |cnt AS (SELECT COUNT(DISTINCT event_type) AS n_inst FROM bars),
       |gated AS (
       |  SELECT day, CAST(SUM(close_cents) AS BIGINT) AS total_cents
       |  FROM bars GROUP BY day
       |  HAVING COUNT(*) = (SELECT n_inst FROM cnt)),
       |w AS (
       |  SELECT b.event_type, b.day, g.total_cents,
       |    b.close_cents * 1000000 // g.total_cents AS w_ppm
       |  FROM bars b JOIN gated g USING (day)),
       |lagged AS (
       |  SELECT event_type, day, total_cents, w_ppm,
       |    LAG(w_ppm) OVER (PARTITION BY event_type ORDER BY day) AS pw
       |  FROM w)
       |SELECT day, MAX(total_cents) AS total_cents,
       |  MAX(w_ppm) AS max_weight_ppm,
       |  CAST(SUM(ABS(w_ppm - pw)) AS BIGINT) AS turnover_ppm
       |FROM lagged WHERE pw IS NOT NULL
       |GROUP BY day ORDER BY day""".stripMargin

  // ----------------------------------------------------- q_rescaled_range
  /** Rescaled range (the Hurst R/S core) per instrument over the full
    * diff series, fully integer: with prefix sums P_k = Σ_{i≤k} x_i, the
    * mean-adjusted cumulative deviation scaled by n is
    * n·D_k = n·P_k − k·Σx (exact BIGINT — no rational mean), the scaled
    * range Rn = max_k(n·D_k) − min_k(n·D_k), and since n²·σ² =
    * n·Σx²−(Σx)², the ratio clears to R/S = Rn / isqrt(n·Σx²−(Σx)²) —
    * emitted in milli. A pure random walk keeps R/S ~ √n; persistent
    * series push it up — the diagnostic a curation pipeline runs before
    * trusting a trend model. Windows are instrument-partitioned
    * (unbounded-preceding over the calendar-bounded diff grid). */
  private def rescaledRange(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val wRun = Window.partitionBy($"event_type").orderBy($"day")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wAll = Window.partitionBy($"event_type")
    val d = diffs(s, dir)
      .withColumn("p", sum($"x").over(wRun))
      .withColumn("k", count(lit(1)).over(wRun))
      .withColumn("n", count(lit(1)).over(wAll))
      .withColumn("sx", sum($"x").over(wAll))
      .withColumn("sxx", sum($"x" * $"x").over(wAll))
      .withColumn("nd", $"n" * $"p" - $"k" * $"sx")
    d.groupBy($"event_type")
      .agg(max($"n").as("n_days"),
        max($"sx").as("sum_diff_cents"),
        (max($"nd") - min($"nd")).as("rn"),
        max($"n" * $"sxx" - $"sx" * $"sx").as("var_num"))
      .withColumn("rs_milli",
        expr(s"rn * 1000 DIV nullif(${isqrtSql("var_num")}, 0)"))
      .select($"event_type", $"n_days", $"rn", $"rs_milli")
      .orderBy($"event_type")
  }

  private val rescaledRangeSql =
    s"""$diffsSqlCte,
       |pre AS (
       |  SELECT event_type, day, x,
       |    CAST(SUM(x) OVER (PARTITION BY event_type ORDER BY day
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS p,
       |    ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY day) AS k,
       |    COUNT(*) OVER (PARTITION BY event_type) AS n,
       |    CAST(SUM(x) OVER (PARTITION BY event_type) AS BIGINT) AS sx,
       |    CAST(SUM(x * x) OVER (PARTITION BY event_type) AS BIGINT) AS sxx
       |  FROM diffs),
       |nd AS (
       |  SELECT event_type, n, sx, sxx, n * p - k * sx AS nd
       |  FROM pre),
       |stats AS (
       |  SELECT event_type, MAX(n) AS n_days, MAX(sx) AS sum_diff_cents,
       |    MAX(nd) - MIN(nd) AS rn,
       |    MAX(n * sxx - sx * sx) AS var_num
       |  FROM nd GROUP BY event_type)
       |SELECT event_type, n_days, rn,
       |  rn * 1000 // NULLIF(${isqrtSql("var_num")}, 0) AS rs_milli
       |FROM stats ORDER BY event_type""".stripMargin

  // ---------------------------------------------------------------- q_obv
  /** On-balance volume per instrument-day: daily tick volume signed by
    * the close-to-close direction (+1/−1/0 — the bar-resolution tick
    * rule), accumulated from the series start. The running sum is an
    * instrument-partitioned unbounded-preceding window over the
    * calendar-bounded bar grid (the q_max_drawdown argument). First day
    * has no direction and contributes zero flow in both engines
    * (COALESCE on the lag's null). */
  private def obv(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val wo = Window.partitionBy($"event_type").orderBy($"day")
    Indicators.bars(s, dir)
      .withColumn("prev", lag($"close_cents", 1).over(wo))
      .withColumn("flow", coalesce(
        signum($"close_cents" - $"prev").cast("long") * $"n_ticks",
        lit(0L)))
      .withColumn("obv", sum($"flow").over(
        wo.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .select($"event_type", $"day", $"n_ticks", $"flow".as("signed_flow"),
        $"obv")
      .orderBy($"event_type", $"day")
  }

  private val obvSql =
    s"""${Indicators.barsSqlCte},
       |f AS (
       |  SELECT event_type, day, n_ticks,
       |    COALESCE(CAST(SIGN(close_cents - LAG(close_cents) OVER (
       |      PARTITION BY event_type ORDER BY day)) AS BIGINT)
       |      * n_ticks, 0) AS signed_flow
       |  FROM bars)
       |SELECT event_type, day, n_ticks, signed_flow,
       |  CAST(SUM(signed_flow) OVER (PARTITION BY event_type ORDER BY day
       |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
       |    AS obv
       |FROM f ORDER BY event_type, day""".stripMargin

  // ---------------------------------------------------------------- q_atr
  /** 14-day average true range (Wilder's TR, simple-average form — the
    * window-expressible one, the q_rsi convention): TR = greatest of
    * (high−low, |high−prev_close|, |low−prev_close|), so gap days count
    * their overnight jump; atr_milli = ΣTR·1000 DIV 14 over the full
    * 14-TR window only (the n14 gate). All cents arithmetic, exact. */
  private def atr(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val wo = Window.partitionBy($"event_type").orderBy($"day")
    val w14 = wo.rowsBetween(-13, 0)
    Indicators.bars(s, dir)
      .withColumn("prev", lag($"close_cents", 1).over(wo))
      .filter($"prev".isNotNull)
      .withColumn("tr", greatest(
        $"high_cents" - $"low_cents",
        abs($"high_cents" - $"prev"),
        abs($"low_cents" - $"prev")))
      .withColumn("n14", count(lit(1)).over(w14))
      .withColumn("sum_tr", sum($"tr").over(w14))
      .filter($"n14" === 14)
      .select($"event_type", $"day", $"tr".as("tr_cents"),
        expr("sum_tr * 1000 DIV 14").as("atr_milli"))
      .orderBy($"event_type", $"day")
  }

  private val atrSql =
    s"""${Indicators.barsSqlCte},
       |t0 AS (
       |  SELECT event_type, day, high_cents, low_cents,
       |    LAG(close_cents) OVER (
       |      PARTITION BY event_type ORDER BY day) AS prev
       |  FROM bars),
       |tr AS (
       |  SELECT event_type, day,
       |    GREATEST(high_cents - low_cents,
       |      ABS(high_cents - prev), ABS(low_cents - prev)) AS tr
       |  FROM t0 WHERE prev IS NOT NULL),
       |w AS (
       |  SELECT event_type, day, tr,
       |    COUNT(*) OVER w14 AS n14,
       |    CAST(SUM(tr) OVER w14 AS BIGINT) AS sum_tr
       |  FROM tr
       |  WINDOW w14 AS (PARTITION BY event_type ORDER BY day
       |    ROWS BETWEEN 13 PRECEDING AND CURRENT ROW))
       |SELECT event_type, day, tr AS tr_cents,
       |  sum_tr * 1000 // 14 AS atr_milli
       |FROM w WHERE n14 = 14 ORDER BY event_type, day""".stripMargin

  // -------------------------------------------------------------- q_stoch
  /** 14-day stochastic oscillator: %K = (close − min₁₄(low))·1e6 DIV
    * (max₁₄(high) − min₁₄(low)) in ppm (NULL on a degenerate flat
    * window — both engines via NULLIF), %D its 3-day simple average in
    * ppm by exact thirds ((k + k₋₁ + k₋₂) DIV 3) — NULL on each
    * instrument's first two rows where a lag is missing (null
    * propagates identically through + and DIV in both engines). The
    * n14 gate keeps partial head windows out (q_rsi convention). */
  private def stoch(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val wo = Window.partitionBy($"event_type").orderBy($"day")
    val w14 = wo.rowsBetween(-13, 0)
    val k = Indicators.bars(s, dir)
      .withColumn("n14", count(lit(1)).over(w14))
      .withColumn("lo14", min($"low_cents").over(w14))
      .withColumn("hi14", max($"high_cents").over(w14))
      .filter($"n14" === 14)
      .withColumn("k_ppm", expr(
        "(close_cents - lo14) * 1000000 DIV nullif(hi14 - lo14, 0)"))
    k.withColumn("k1", lag($"k_ppm", 1).over(wo))
      .withColumn("k2", lag($"k_ppm", 2).over(wo))
      .withColumn("d_ppm", expr("(k_ppm + k1 + k2) DIV 3"))
      .select($"event_type", $"day", $"k_ppm", $"d_ppm")
      .orderBy($"event_type", $"day")
  }

  private val stochSql =
    s"""${Indicators.barsSqlCte},
       |w AS (
       |  SELECT event_type, day, close_cents,
       |    COUNT(*) OVER w14 AS n14,
       |    MIN(low_cents) OVER w14 AS lo14,
       |    MAX(high_cents) OVER w14 AS hi14
       |  FROM bars
       |  WINDOW w14 AS (PARTITION BY event_type ORDER BY day
       |    ROWS BETWEEN 13 PRECEDING AND CURRENT ROW)),
       |k AS (
       |  SELECT event_type, day,
       |    (close_cents - lo14) * 1000000 // NULLIF(hi14 - lo14, 0) AS k_ppm
       |  FROM w WHERE n14 = 14),
       |kk AS (
       |  SELECT event_type, day, k_ppm,
       |    LAG(k_ppm, 1) OVER (PARTITION BY event_type ORDER BY day) AS k1,
       |    LAG(k_ppm, 2) OVER (PARTITION BY event_type ORDER BY day) AS k2
       |  FROM k)
       |SELECT event_type, day, k_ppm,
       |  (k_ppm + k1 + k2) // 3 AS d_ppm
       |FROM kk ORDER BY event_type, day""".stripMargin

  // --------------------------------------------------------------- q_macd
  /** MACD on the daily closes, in the exact-integer EWMA family of
    * q_ewma (`Analytics.scala`): the classical α = 2/13 vs 2/27 pair has
    * no finite integer form, so this is the DEFINED dyadic variant —
    * fast EMA α = 1/2, slow EMA α = 1/4, both truncated at
    * [[MacdHorizon]] bars. With α = a/d the truncated weights clear to
    * integers w_j = a·(d−a)^j·d^(H−1−j) (fast: 2^(7−j); slow:
    * 3^j·4^(7−j)), so each EMA is Σ lag_j·w_j over ONE shared window
    * spec (a single Window operator, the q_ewma plan shape) and
    * ema_milli = num·1000 DIV den is bit-identical cross-engine.
    * macd_milli = fast − slow flips sign on momentum reversals; the
    * signal line is the 3-day exact-thirds average (the q_stoch %D
    * convention), NULL while a lag is missing. Both weight tables are
    * interpolated into engine AND oracle from the same Scala constants
    * (the q_embargo_split desync lesson). Full-horizon rows only. */
  val MacdHorizon = 8

  private def macdWeights(a: Long, d: Long): Seq[Long] =
    (0 until MacdHorizon).map(j =>
      a * math.pow(d - a, j).toLong * math.pow(d, MacdHorizon - 1 - j).toLong)

  private val WFast = macdWeights(1, 2)
  private val WSlow = macdWeights(1, 4)

  private def macd(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val wo = Window.partitionBy($"event_type").orderBy($"day")
    val lagged = (1 until MacdHorizon).foldLeft(
        Indicators.bars(s, dir).select($"event_type", $"day", $"close_cents")) {
        (d, j) => d.withColumn(s"l$j", lag($"close_cents", j).over(wo))
      }
      .withColumn("n8", count(lit(1)).over(
        wo.rowsBetween(1 - MacdHorizon, 0)))
    lagged.filter($"n8" === MacdHorizon)
      // the SAME numSql/denSqlTotal text the oracle interpolates
      .withColumn("macd_milli", expr(
        s"(${numSql(WFast)}) * 1000 DIV ${denSqlTotal(WFast)}" +
          s" - (${numSql(WSlow)}) * 1000 DIV ${denSqlTotal(WSlow)}"))
      .withColumn("m1", lag($"macd_milli", 1).over(wo))
      .withColumn("m2", lag($"macd_milli", 2).over(wo))
      .withColumn("signal_milli", expr("(macd_milli + m1 + m2) DIV 3"))
      .select($"event_type", $"day", $"macd_milli", $"signal_milli")
      .orderBy($"event_type", $"day")
  }

  /** `close_cents·w0 + lag_1·w1 + …` as SQL text — the SAME string feeds
    * the Spark expr and the DuckDB oracle (LAG(close_cents, j) OVER the
    * instrument-day window), so the weight table cannot desync. */
  private def numSql(ws: Seq[Long]): String =
    (0 until MacdHorizon).map { j =>
      val t = if (j == 0) "close_cents"
        else s"COALESCE(l$j, 0)"
      s"$t * ${ws(j)}"
    }.mkString(" + ")

  /** At full horizon every lag exists, so the denominator is the plain
    * weight total (the n8 gate has already dropped partial windows). */
  private def denSqlTotal(ws: Seq[Long]): String = ws.sum.toString

  private val macdSql =
    s"""${Indicators.barsSqlCte},
       |lags AS (
       |  SELECT event_type, day, close_cents,
       |${(1 until MacdHorizon).map(j =>
      s"    LAG(close_cents, $j) OVER (PARTITION BY event_type ORDER BY day) AS l$j")
      .mkString(",\n")},
       |    COUNT(*) OVER (PARTITION BY event_type ORDER BY day
       |      ROWS BETWEEN ${MacdHorizon - 1} PRECEDING AND CURRENT ROW) AS n8
       |  FROM bars),
       |m AS (
       |  SELECT event_type, day,
       |    (${numSql(WFast)}) * 1000 // ${denSqlTotal(WFast)}
       |      - (${numSql(WSlow)}) * 1000 // ${denSqlTotal(WSlow)} AS macd_milli
       |  FROM lags WHERE n8 = $MacdHorizon)
       |SELECT event_type, day, macd_milli,
       |  (macd_milli
       |    + LAG(macd_milli, 1) OVER (PARTITION BY event_type ORDER BY day)
       |    + LAG(macd_milli, 2) OVER (PARTITION BY event_type ORDER BY day))
       |    // 3 AS signal_milli
       |FROM m ORDER BY event_type, day""".stripMargin

  // -------------------------------------------------------------- q_anova
  /** One-way ANOVA across instruments on daily close diffs — "do the
    * instruments share a mean daily move?", the multi-group member the
    * two-sample tests (q_mann_whitney, q_ks_test, q_ab_test) were
    * missing. Balanced BY CONSTRUCTION: diffs are taken between
    * consecutive FULL-ROSTER days (the q_beta broadcast-equi gate), so
    * every group has exactly (gated days − 1) observations and the sums
    * of squares clear to integers:
    *   n·N·SSB = N·ΣS_g² − n·S²   (ssb_num)
    *   n·N·SSW = n·N·Q − N·ΣS_g²  (ssw_num)
    * with S_g/Q the per-group sum / global sum of squares. F in milli
    * by STAGED truncating division (identical order in both engines):
    * msb = ssb_num DIV (G−1), msw = ssw_num DIV (N−G), f_milli =
    * msb·1000 DIV msw — staging keeps every intermediate < 2⁶² where
    * the single-division spelling would overflow (Indicators2Spec
    * asserts the envelope). One summary row; group count and balanced n
    * ride along so the hash pins the design, not just the statistic. */
  private def anova(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val b = Indicators.bars(s, dir)
      .select($"event_type", $"day", $"close_cents")
    val cnt = b.select($"event_type").distinct()
      .agg(count(lit(1)).as("n_inst"))
    val gated = b.groupBy($"day").agg(count(lit(1)).as("n_traded"))
      .join(broadcast(cnt), $"n_traded" === $"n_inst")
      .select($"day")
    val d = b.join(gated, "day")
      .withColumn("prev", lag($"close_cents", 1).over(
        Window.partitionBy($"event_type").orderBy($"day")))
      .filter($"prev".isNotNull)
      .select($"event_type", ($"close_cents" - $"prev").as("x"))
    val grp = d.groupBy($"event_type")
      .agg(count(lit(1)).as("n_g"), sum($"x").as("sg"),
        sum($"x" * $"x").as("qg"))
    grp.agg(count(lit(1)).as("g"),
        min($"n_g").as("n_min"), max($"n_g").as("n_max"),
        sum($"sg").as("s"), sum($"qg").as("q"),
        sum($"sg" * $"sg").as("sum_sg2"))
      .withColumn("n_total", $"g" * $"n_max")
      .withColumn("ssb_num",
        expr("n_total * sum_sg2 - n_max * s * s"))
      .withColumn("ssw_num",
        expr("n_max * n_total * q - n_total * sum_sg2"))
      .withColumn("f_milli", expr(
        "(ssb_num DIV nullif(g - 1, 0)) * 1000" +
          " DIV nullif(ssw_num DIV nullif(n_total - g, 0), 0)"))
      .select($"g", $"n_min", $"n_max", $"ssb_num", $"ssw_num", $"f_milli")
  }

  private val anovaSql =
    s"""${Indicators.barsSqlCte},
       |cnt AS (SELECT COUNT(DISTINCT event_type) AS n_inst FROM bars),
       |gated AS (
       |  SELECT day FROM bars GROUP BY day
       |  HAVING COUNT(*) = (SELECT n_inst FROM cnt)),
       |d0 AS (
       |  SELECT b.event_type,
       |    b.close_cents - LAG(b.close_cents) OVER (
       |      PARTITION BY b.event_type ORDER BY b.day) AS x
       |  FROM bars b JOIN gated g USING (day)),
       |d AS (SELECT * FROM d0 WHERE x IS NOT NULL),
       |grp AS (
       |  SELECT event_type, COUNT(*) AS n_g,
       |    CAST(SUM(x) AS BIGINT) AS sg,
       |    CAST(SUM(x * x) AS BIGINT) AS qg
       |  FROM d GROUP BY event_type),
       |tot AS (
       |  SELECT COUNT(*) AS g, MIN(n_g) AS n_min, MAX(n_g) AS n_max,
       |    CAST(SUM(sg) AS BIGINT) AS s, CAST(SUM(qg) AS BIGINT) AS q,
       |    CAST(SUM(sg * sg) AS BIGINT) AS sum_sg2
       |  FROM grp),
       |w AS (
       |  SELECT g, n_min, n_max, g * n_max AS n_total, s, q, sum_sg2
       |  FROM tot)
       |SELECT g, n_min, n_max,
       |  n_total * sum_sg2 - n_max * s * s AS ssb_num,
       |  n_max * n_total * q - n_total * sum_sg2 AS ssw_num,
       |  ((n_total * sum_sg2 - n_max * s * s) // NULLIF(g - 1, 0)) * 1000
       |    // NULLIF((n_max * n_total * q - n_total * sum_sg2)
       |              // NULLIF(n_total - g, 0), 0) AS f_milli
       |FROM w""".stripMargin

  val all: Seq[NamedQuery] = Seq(
    NamedQuery("q_sharpe", sharpe, Some(sharpeSql), bench = true),
    NamedQuery("q_realized_vol", realizedVol, Some(realizedVolSql),
      bench = true),
    NamedQuery("q_roll_spread", rollSpread, Some(rollSpreadSql),
      bench = true),
    NamedQuery("q_kyle_lambda", kyleLambda, Some(kyleLambdaSql),
      bench = true),
    NamedQuery("q_underwater", underwater, Some(underwaterSql),
      bench = true),
    NamedQuery("q_pair_corr", pairCorr, Some(pairCorrSql), bench = true),
    NamedQuery("q_rebalance_turnover", rebalanceTurnover,
      Some(rebalanceTurnoverSql), bench = true),
    NamedQuery("q_rescaled_range", rescaledRange, Some(rescaledRangeSql),
      bench = true),
    NamedQuery("q_anova", anova, Some(anovaSql), bench = true),
    NamedQuery("q_macd", macd, Some(macdSql), bench = true),
    NamedQuery("q_obv", obv, Some(obvSql), bench = true),
    NamedQuery("q_atr", atr, Some(atrSql), bench = true),
    NamedQuery("q_stoch", stoch, Some(stochSql), bench = true))
}
