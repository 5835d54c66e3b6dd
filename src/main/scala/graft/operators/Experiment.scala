package graft.operators

import graft.{NamedQuery, Tables}
import graft.functions.TextFunctions
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Experimentation & uncertainty quantification — the two ops a
  * measurement pipeline runs after q_ab_test's difference-in-means:
  * distribution-free prediction intervals (split conformal) and
  * pre-period variance reduction (CUPED). Both stay EXACT-INTEGER where
  * textbook formulations go float: the conformal quantile is a pure
  * order statistic (rank arithmetic, no interpolation) and CUPED's θ
  * computes from centered integer sums quantized to ppm with the same
  * DIV order on both engines. */
object Experiment {

  // ------------------------------------------------ q_conformal_interval
  // audited-global-window(q_conformal_interval): frame = residual-value histogram (cents-domain-bounded, the q_seasonal_anomalies shape) — bound audited in PlanAuditSpec/UnpartitionedWindowAudit
  // audited-bnlj(q_conformal_interval): build side = 1-row (n_cal, qhat) aggregate — audited in PlanAuditSpec/BnljAudit
  /** Split-conformal prediction interval: events split
    * calibration/test by an md5 coin; the "model" is the
    * calibration-split per-user mean (floor DIV — any real model slots
    * in, exchangeability is what matters); q̂ is the
    * ⌈(n_cal+1)(1−α)⌉-th smallest calibration residual — computed
    * DISTRIBUTEDLY as the least residual value whose cumulative count
    * reaches the rank, over the cents-domain-bounded residual-value
    * histogram (no global sort of raw rows); test-split coverage of
    * |y−ŷ| ≤ q̂ then lands ≥ 1−α in expectation — the
    * distribution-free guarantee, measured not assumed. Test events of
    * users absent from calibration have no prediction and are excluded
    * (reported via n_test).
    *
    * Scale shape: one user-keyed aggregation for the model, one
    * user-keyed join back, a value-histogram aggregation whose
    * cumulative window runs over the BOUNDED cents domain, and a 1-row
    * q̂ broadcast onto the test scan. */
  val ConformalAlphaPct = 10 // 90% target coverage

  private def conformalInterval(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val e = Tables.events(s, dir)
      .select($"user_id", $"event_id",
        round($"value" * 100).cast("long").as("cents"),
        (TextFunctions.md5Lower64(concat(lit("conf:"),
          $"event_id".cast("string")))
          .bitwiseAND(lit(Long.MaxValue)) % 2 === 0).as("is_cal"))
    val model = e.filter($"is_cal")
      .groupBy($"user_id")
      .agg(expr("sum(cents) DIV count(1)").as("yhat"))
    val scored = e.join(model, Seq("user_id"))
      .select($"event_id", $"is_cal", abs($"cents" - $"yhat").as("resid"))
    val calHist = scored.filter($"is_cal")
      .groupBy($"resid").agg(count(lit(1)).as("c"))
      .select($"resid", $"c",
        sum($"c").over(Window.orderBy($"resid")).as("cum"),
        sum($"c").over(Window.partitionBy()).as("n_cal"))
    // rank k = ceil((n_cal + 1) * (1 - alpha)) via integer ceil-div
    val qhat = calHist
      .filter($"cum" >= expr(
        s"((n_cal + 1) * ${100 - ConformalAlphaPct} + 99) DIV 100"))
      .agg(min($"resid").as("qhat_cents"), max($"n_cal").as("n_cal"))
    scored.filter(!$"is_cal")
      .crossJoin(broadcast(qhat))
      .agg(max($"n_cal").as("n_cal"),
        count(lit(1)).as("n_test"),
        max($"qhat_cents").as("qhat_cents"),
        sum(($"resid" <= $"qhat_cents").cast("long")).as("n_covered"))
      .select($"n_cal", $"n_test", $"qhat_cents", $"n_covered",
        expr("n_covered * 1000000 DIV n_test").as("coverage_ppm"))
  }

  private val conformalIntervalSql =
    s"""WITH e AS (
       |  SELECT user_id, event_id, CAST(round(value * 100) AS BIGINT) AS cents,
       |    CAST(md5_number_lower('conf:' || CAST(event_id AS VARCHAR))
       |      & 9223372036854775807::UBIGINT AS BIGINT) % 2 = 0 AS is_cal
       |  FROM events),
       |model AS (
       |  SELECT user_id, CAST(SUM(cents) // COUNT(*) AS BIGINT) AS yhat
       |  FROM e WHERE is_cal GROUP BY user_id),
       |scored AS (
       |  SELECT e.event_id, e.is_cal,
       |    CAST(abs(e.cents - m.yhat) AS BIGINT) AS resid
       |  FROM e JOIN model m ON e.user_id = m.user_id),
       |hist AS (
       |  SELECT resid, COUNT(*) AS c FROM scored WHERE is_cal GROUP BY resid),
       |cumhist AS (
       |  SELECT resid,
       |    CAST(SUM(c) OVER (ORDER BY resid) AS BIGINT) AS cum,
       |    CAST(SUM(c) OVER () AS BIGINT) AS n_cal
       |  FROM hist),
       |qhat AS (
       |  SELECT MIN(resid) AS qhat_cents, MAX(n_cal) AS n_cal
       |  FROM cumhist
       |  WHERE cum >= ((n_cal + 1) * ${100 - ConformalAlphaPct} + 99) // 100)
       |SELECT q.n_cal, COUNT(*) AS n_test, q.qhat_cents,
       |  CAST(SUM(CASE WHEN s.resid <= q.qhat_cents THEN 1 ELSE 0 END)
       |    AS BIGINT) AS n_covered,
       |  CAST(SUM(CASE WHEN s.resid <= q.qhat_cents THEN 1 ELSE 0 END)
       |    AS BIGINT) * 1000000 // COUNT(*) AS coverage_ppm
       |FROM scored s CROSS JOIN qhat q
       |WHERE NOT s.is_cal
       |GROUP BY q.n_cal, q.qhat_cents""".stripMargin

  // ------------------------------------------------------------- q_cuped
  // audited-bnlj(q_cuped): build sides = 1-row mean and 1-row theta aggregates — audited in PlanAuditSpec/BnljAudit
  /** CUPED variance reduction: each user's post-period metric y is
    * adjusted by its pre-period covariate x — y_adj = y − θ(x − x̄) with
    * θ = Σ(x−x̄)(y−ȳ) / Σ(x−x̄)² — shrinking the metric variance the
    * A/B test must overcome without biasing the treatment contrast
    * (E[x] is treatment-independent: x predates assignment). Exactness:
    * means are floor-DIV, θ is CENTERED integer sums quantized to ppm
    * (centering keeps every product within bigint at any fixture
    * scale), adjustments carry milli-dollar units end to end; treatment
    * is the planted md5 coin so both engines replay the assignment.
    *
    * Scale shape: one user-keyed aggregation builds (x, y); the means
    * and θ are 1-row broadcasts back onto the user frame; the readout
    * is a 2-row keyed aggregate. */
  val CupedSplit = "2024-01-16 00:00:00"

  private def cuped(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val split = lit(CupedSplit).cast("timestamp")
    val per = Tables.events(s, dir)
      .select($"user_id",
        when($"ts" < split, round($"value").cast("long")).otherwise(0L).as("xd"),
        when($"ts" >= split, round($"value").cast("long")).otherwise(0L).as("yd"))
      .groupBy($"user_id")
      .agg(sum($"xd").as("x"), sum($"yd").as("y"))
      .select($"user_id", $"x", $"y",
        (TextFunctions.md5Lower64(concat(lit("cuped:"),
          $"user_id".cast("string")))
          .bitwiseAND(lit(Long.MaxValue)) % 2).as("treat"))
    val means = per.agg(expr("sum(x) DIV count(1)").as("xbar"),
      count(lit(1)).as("n_users"))
    val centered = per.crossJoin(broadcast(means))
    // θ := Σ(x−x̄f)·y / Σ(x−x̄f)² with the FLOORED mean x̄f — a fully
    // deterministic estimator (identical integers on both engines);
    // it differs from the textbook centered covariance only by the
    // floor residual Σ(x−x̄f) ∈ [0, n) times ȳ, statistically
    // negligible and — unlike a float covariance — bit-replayable
    val theta = centered
      .agg(sum(($"x" - $"xbar") * $"y").as("sxy"),
        sum(($"x" - $"xbar") * ($"x" - $"xbar")).as("sxx"))
      .select(expr("sxy * 1000000 DIV sxx").as("theta_ppm"))
    centered.crossJoin(broadcast(theta))
      .select($"treat", $"y",
        ($"y" * 1000 - expr("theta_ppm * (x - xbar) DIV 1000"))
          .as("y_adj_milli"))
      .groupBy($"treat")
      .agg(count(lit(1)).as("n"),
        sum($"y").as("sum_y"),
        expr("sum(y) * 1000 DIV count(1)").as("mean_y_milli"),
        expr("sum(y_adj_milli) DIV count(1)").as("mean_y_adj_milli"))
      .orderBy($"treat")
  }

  private val cupedSql =
    s"""WITH per AS (
       |  SELECT user_id,
       |    CAST(SUM(CASE WHEN ts < TIMESTAMP '$CupedSplit'
       |      THEN CAST(round(value) AS BIGINT) ELSE 0 END) AS BIGINT) AS x,
       |    CAST(SUM(CASE WHEN ts >= TIMESTAMP '$CupedSplit'
       |      THEN CAST(round(value) AS BIGINT) ELSE 0 END) AS BIGINT) AS y,
       |    CAST(md5_number_lower('cuped:' || CAST(user_id AS VARCHAR))
       |      & 9223372036854775807::UBIGINT AS BIGINT) % 2 AS treat
       |  FROM events GROUP BY user_id),
       |means AS (
       |  SELECT CAST(SUM(x) AS BIGINT) // COUNT(*) AS xbar FROM per),
       |theta AS (
       |  SELECT CAST(SUM((x - xbar) * y) AS BIGINT) * 1000000
       |      // CAST(SUM((x - xbar) * (x - xbar)) AS BIGINT) AS theta_ppm
       |  FROM per CROSS JOIN means)
       |SELECT treat, COUNT(*) AS n, CAST(SUM(y) AS BIGINT) AS sum_y,
       |  CAST(SUM(y) AS BIGINT) * 1000 // COUNT(*) AS mean_y_milli,
       |  CAST(SUM(y * 1000 - theta_ppm * (x - xbar) // 1000) AS BIGINT)
       |    // COUNT(*) AS mean_y_adj_milli
       |FROM per CROSS JOIN means CROSS JOIN theta
       |GROUP BY treat ORDER BY treat""".stripMargin

  // ----------------------------------------------------- q_uplift_bands
  /** Uplift readout by activity band — the heterogeneous-treatment-
    * effect table behind a Qini curve: users band by PRE-period
    * activity (fixed-width count bands — band count is bounded by the
    * per-user event rate, which the fixture holds constant across
    * scales, so no user-sized global ranking is ever needed), treatment
    * is the md5 coin, outcome is any POST-period purchase, and each
    * band reports treated/control conversion ppm and their difference.
    * Banding on a pre-period covariate keeps the split
    * treatment-independent — the same leakage discipline as
    * q_churn_features' temporal split.
    *
    * Scale shape: one user-keyed aggregation (map-side partials), one
    * band-keyed rollup over a rate-bounded band axis; zero windows,
    * zero joins. */
  val UpliftBandWidth = 10L

  private def upliftBands(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val split = lit(CupedSplit).cast("timestamp")
    val per = Tables.events(s, dir)
      .select($"user_id",
        ($"ts" < split).cast("long").as("pre"),
        ($"ts" >= split && $"event_type" === "purchase")
          .cast("long").as("post_purchase"))
      .groupBy($"user_id")
      .agg(sum($"pre").as("n_pre"), max($"post_purchase").as("converted"))
      .select($"user_id",
        expr(s"n_pre DIV $UpliftBandWidth").as("band"), $"converted",
        (TextFunctions.md5Lower64(concat(lit("uplift:"),
          $"user_id".cast("string")))
          .bitwiseAND(lit(Long.MaxValue)) % 2).as("treat"))
    per.groupBy($"band")
      .agg(sum(($"treat" === 1).cast("long")).as("n_t"),
        sum(($"treat" === 0).cast("long")).as("n_c"),
        sum(when($"treat" === 1, $"converted").otherwise(0L)).as("conv_t"),
        sum(when($"treat" === 0, $"converted").otherwise(0L)).as("conv_c"))
      .select($"band", $"n_t", $"n_c", $"conv_t", $"conv_c",
        expr("conv_t * 1000000 DIV nullif(n_t, 0)").as("rate_t_ppm"),
        expr("conv_c * 1000000 DIV nullif(n_c, 0)").as("rate_c_ppm"))
      .select($"band", $"n_t", $"n_c", $"conv_t", $"conv_c",
        $"rate_t_ppm", $"rate_c_ppm",
        ($"rate_t_ppm" - $"rate_c_ppm").as("uplift_ppm"))
      .orderBy($"band")
  }

  private val upliftBandsSql =
    s"""WITH per AS (
       |  SELECT user_id,
       |    CAST(SUM(CASE WHEN ts < TIMESTAMP '$CupedSplit'
       |      THEN 1 ELSE 0 END) AS BIGINT) // $UpliftBandWidth AS band,
       |    CAST(MAX(CASE WHEN ts >= TIMESTAMP '$CupedSplit'
       |      AND event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT)
       |      AS converted,
       |    CAST(md5_number_lower('uplift:' || CAST(user_id AS VARCHAR))
       |      & 9223372036854775807::UBIGINT AS BIGINT) % 2 AS treat
       |  FROM events GROUP BY user_id),
       |b AS (
       |  SELECT band,
       |    CAST(SUM(CASE WHEN treat = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_t,
       |    CAST(SUM(CASE WHEN treat = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_c,
       |    CAST(SUM(CASE WHEN treat = 1 THEN converted ELSE 0 END)
       |      AS BIGINT) AS conv_t,
       |    CAST(SUM(CASE WHEN treat = 0 THEN converted ELSE 0 END)
       |      AS BIGINT) AS conv_c
       |  FROM per GROUP BY band)
       |SELECT band, n_t, n_c, conv_t, conv_c,
       |  conv_t * 1000000 // nullif(n_t, 0) AS rate_t_ppm,
       |  conv_c * 1000000 // nullif(n_c, 0) AS rate_c_ppm,
       |  conv_t * 1000000 // nullif(n_t, 0)
       |    - conv_c * 1000000 // nullif(n_c, 0) AS uplift_ppm
       |FROM b ORDER BY band""".stripMargin

  // ---------------------------------------------------- q_policy_replay
  /** Offline policy evaluation by the replay (exact-match) estimator:
    * each logged event carries an md5-UNIFORM logged action and a
    * reward that depends on whether the action hit the user's planted
    * preferred arm; a candidate policy is evaluated by averaging reward
    * over exactly those events where the log happened to play the
    * policy's action — unbiased when logging is uniform (Li et al.'s
    * replay method), and every quantity here is an exact integer. The
    * row reports the candidate's matched value against the logging
    * policy's overall value; the planted preference makes the expected
    * ordering verifiable (the candidate targets each user's preferred
    * arm, so its replay value must exceed the behavior value —
    * spec-asserted).
    *
    * Scale shape: one scan, row-local action/reward arithmetic inside
    * codegen, one global aggregate — zero shuffles beyond the final
    * 1-row reduce. */
  val PolicyArms = 4

  private def policyReplay(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    def h(tag: String) = TextFunctions
      .md5Lower64(concat(lit(tag), $"event_id".cast("string")))
      .bitwiseAND(lit(Long.MaxValue))
    val e = Tables.events(s, dir)
      .select($"user_id", $"event_id",
        round($"value" * 100).cast("long").as("cents"))
      .select($"user_id", $"cents",
        (h("act:") % PolicyArms).as("logged_action"),
        ($"user_id" % PolicyArms).as("preferred"))
      // reward: full cents when the logged action hit the user's
      // preferred arm, a quarter otherwise — action-dependent by
      // construction, deterministic on both engines
      .select($"user_id", $"logged_action", $"preferred",
        when($"logged_action" === $"preferred", $"cents")
          .otherwise(expr("cents DIV 4")).as("reward"))
      // candidate policy: play the user's preferred arm
      .withColumn("pi_action", $"preferred")
    e.agg(
      count(lit(1)).as("n_logged"),
      sum(($"logged_action" === $"pi_action").cast("long")).as("n_matched"),
      sum($"reward").as("behavior_total"),
      sum(when($"logged_action" === $"pi_action", $"reward").otherwise(0L))
        .as("matched_total"))
      .select($"n_logged", $"n_matched",
        expr("n_matched * 1000000 DIV n_logged").as("match_ppm"),
        expr("behavior_total * 1000 DIV n_logged").as("behavior_millicents"),
        expr("matched_total * 1000 DIV nullif(n_matched, 0)")
          .as("policy_millicents"))
  }

  private val policyReplaySql =
    s"""WITH e AS (
       |  SELECT user_id,
       |    CAST(md5_number_lower('act:' || CAST(event_id AS VARCHAR))
       |      & 9223372036854775807::UBIGINT AS BIGINT) % $PolicyArms
       |      AS logged_action,
       |    user_id % $PolicyArms AS preferred,
       |    CAST(round(value * 100) AS BIGINT) AS cents
       |  FROM events),
       |r AS (
       |  SELECT user_id, logged_action, preferred,
       |    CASE WHEN logged_action = preferred THEN cents
       |         ELSE cents // 4 END AS reward,
       |    preferred AS pi_action
       |  FROM e)
       |SELECT COUNT(*) AS n_logged,
       |  CAST(SUM(CASE WHEN logged_action = pi_action THEN 1 ELSE 0 END)
       |    AS BIGINT) AS n_matched,
       |  CAST(SUM(CASE WHEN logged_action = pi_action THEN 1 ELSE 0 END)
       |    AS BIGINT) * 1000000 // COUNT(*) AS match_ppm,
       |  CAST(SUM(reward) AS BIGINT) * 1000 // COUNT(*)
       |    AS behavior_millicents,
       |  CAST(SUM(CASE WHEN logged_action = pi_action THEN reward
       |    ELSE 0 END) AS BIGINT) * 1000
       |    // nullif(CAST(SUM(CASE WHEN logged_action = pi_action
       |      THEN 1 ELSE 0 END) AS BIGINT), 0) AS policy_millicents
       |FROM r""".stripMargin

  val all: Seq[NamedQuery] = Seq(
    NamedQuery("q_conformal_interval", conformalInterval,
      Some(conformalIntervalSql), bench = true),
    NamedQuery("q_cuped", cuped, Some(cupedSql), bench = true),
    NamedQuery("q_uplift_bands", upliftBands, Some(upliftBandsSql),
      bench = true),
    NamedQuery("q_policy_replay", policyReplay, Some(policyReplaySql),
      bench = true))
}
