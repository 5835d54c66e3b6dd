package graft.operators

import graft.{NamedQuery, Tables}
import graft.functions.TextFunctions
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Post-training (RLHF / preference-optimization) data construction —
  * the ops between "a pile of scored model responses" and "a DPO/GRPO
  * training set": preference-pair assembly with margin gating,
  * best-of-N selection with its sampling regret, group-relative
  * advantage normalization, a transitivity audit of the preference
  * graph, and a phase-annealed mixture schedule. The fixture carries no
  * prompt/response table, so `user_id` plays the prompt id and each
  * user's events are its scored responses (reward = value in cents) —
  * the q_churn_features / q_pref_bias convention: every downstream
  * number is exact-integer and replayable by any engine.
  *
  * All constructions are layout-invariant by design (argmax keys are
  * made unique before max_by; ranks carry full deterministic tie-break
  * orders) — a preference dataset that changes under repartitioning is
  * an irreproducible experiment. */
object PostTrain {

  // -------------------------------------------------------- q_dpo_pairs
  /** DPO pair construction: per prompt, chosen = the highest-reward
    * response, rejected = the lowest, kept only when the pair separates
    * by at least MarginCents (low-margin pairs teach a reward model
    * noise) and the prompt has >= 2 responses. Argmax/argmin run on a
    * COLLAPSED key (cents·1e12 ∓ event_id) so ties in reward resolve to
    * the smallest event id deterministically — max_by/arg_max with a
    * tied key is engine-unspecified, the bug this construction removes.
    * Key-validity envelope (PostTrainSpec asserts it per fixture): the
    * collapse is faithful iff event_id < 1e12 (else a large id
    * outweighs a real 1-cent reward gap — the inversion bug) and
    * |cents| < ~9.2e6 (else cents·1e12 overflows Long). Shipped
    * fixtures sit ≥ 4 decades inside both bounds (event_id ≤ ~1e8 on
    * the synthetic sf1 corpus, cents ≤ ~6e4).
    *
    * Scale shape: ONE prompt-keyed aggregation with map-side partials
    * (max_by/min_by/count combine associatively); no window, no join. */
  val MarginCents = 200L

  private def dpoPairs(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.events(s, dir)
      .select($"user_id", $"event_id",
        round($"value" * 100).cast("long").as("cents"))
      .groupBy($"user_id")
      .agg(count(lit(1)).as("n_responses"),
        expr("max_by(event_id, cents * 1000000000000 - event_id)").as("chosen_id"),
        expr("min_by(event_id, cents * 1000000000000 + event_id)").as("rejected_id"),
        max($"cents").as("chosen_cents"),
        min($"cents").as("rejected_cents"))
      .filter($"n_responses" >= 2 &&
        ($"chosen_cents" - $"rejected_cents") >= MarginCents)
      .select($"user_id".as("prompt_id"), $"n_responses",
        $"chosen_id", $"rejected_id", $"chosen_cents", $"rejected_cents",
        ($"chosen_cents" - $"rejected_cents").as("margin_cents"))
      .orderBy($"prompt_id")
  }

  private val dpoPairsSql =
    s"""WITH e AS (
       |  SELECT user_id, event_id, CAST(round(value * 100) AS BIGINT) AS cents
       |  FROM events),
       |p AS (
       |  SELECT user_id, COUNT(*) AS n_responses,
       |    arg_max(event_id, cents * 1000000000000 - event_id) AS chosen_id,
       |    arg_min(event_id, cents * 1000000000000 + event_id) AS rejected_id,
       |    MAX(cents) AS chosen_cents, MIN(cents) AS rejected_cents
       |  FROM e GROUP BY user_id)
       |SELECT user_id AS prompt_id, n_responses, chosen_id, rejected_id,
       |  chosen_cents, rejected_cents,
       |  chosen_cents - rejected_cents AS margin_cents
       |FROM p
       |WHERE n_responses >= 2
       |  AND chosen_cents - rejected_cents >= $MarginCents
       |ORDER BY prompt_id""".stripMargin

  // -------------------------------------------------------- q_best_of_n
  /** Best-of-N selection with its sampling regret: the selector only
    * sees each prompt's FIRST BestN responses in event-time order (the
    * N that were actually sampled), picks the best of those, and the
    * regret column reports how many cents the full response pool would
    * have added — the quantity an inference-time compute budget trades
    * away. Selecting over the first-N (not the global max) is the
    * subtlety this op encodes; a global argmax silently overstates
    * best-of-N quality.
    *
    * Scale shape: one prompt-partitioned row_number window (single
    * keyed shuffle), then two prompt-keyed aggregations joined on the
    * key — both with map-side partials. */
  val BestN = 4

  private def bestOfN(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val e = Tables.events(s, dir)
      .select($"user_id", $"event_id", unix_micros($"ts").as("us"),
        round($"value" * 100).cast("long").as("cents"))
    val w = Window.partitionBy($"user_id").orderBy($"us", $"event_id")
    val sampled = e
      .withColumn("rn", row_number().over(w))
      .filter($"rn" <= BestN)
      .groupBy($"user_id")
      .agg(count(lit(1)).as("n_sampled"),
        expr("max_by(event_id, cents * 1000000000000 - event_id)").as("best_id"),
        max($"cents").as("best_cents"))
    val full = e.groupBy($"user_id")
      .agg(count(lit(1)).as("n_responses"),
        max($"cents").as("global_best_cents"))
    full.join(sampled, Seq("user_id"))
      .select($"user_id", $"n_responses", $"n_sampled", $"best_id",
        $"best_cents", $"global_best_cents",
        ($"global_best_cents" - $"best_cents").as("regret_cents"))
      .orderBy($"user_id")
  }

  private val bestOfNSql =
    s"""WITH e AS (
       |  SELECT user_id, event_id, epoch_us(ts) AS us,
       |    CAST(round(value * 100) AS BIGINT) AS cents
       |  FROM events),
       |r AS (
       |  SELECT user_id, event_id, cents,
       |    ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY us, event_id) AS rn
       |  FROM e),
       |sampled AS (
       |  SELECT user_id, COUNT(*) AS n_sampled,
       |    arg_max(event_id, cents * 1000000000000 - event_id) AS best_id,
       |    MAX(cents) AS best_cents
       |  FROM r WHERE rn <= $BestN GROUP BY user_id),
       |onefull AS (
       |  SELECT user_id, COUNT(*) AS n_responses,
       |    MAX(cents) AS global_best_cents
       |  FROM e GROUP BY user_id)
       |SELECT f.user_id, n_responses, n_sampled, best_id, best_cents,
       |  global_best_cents, global_best_cents - best_cents AS regret_cents
       |FROM onefull f JOIN sampled s ON f.user_id = s.user_id
       |ORDER BY f.user_id""".stripMargin

  // -------------------------------------------------- q_grpo_advantage
  /** Group-relative advantage normalization (the GRPO/RLOO data step):
    * each response's reward is re-expressed relative to its OWN
    * prompt's response group — (a) mean-centered cents against the
    * group's floor-mean (sum DIV n: same truncation both engines), and
    * (b) a rank-based advantage mapping the group's (cents, event_id)
    * order onto [-1e6, +1e6] ppm exactly: (2·(r−1)·1e6) DIV (n−1) − 1e6.
    * Rank advantages are what make reward scales comparable across
    * prompts without estimating a variance (and stay exact-integer
    * where a z-score would drag in sqrt). Groups of one are dropped —
    * no counterfactual, no gradient.
    *
    * Scale shape: both window specs share the prompt partition key, so
    * Catalyst plans ONE shuffle on user_id and evaluates count/sum/rank
    * in the same window stage; output is row-per-response (linear). */
  private def grpoAdvantage(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val wp = Window.partitionBy($"user_id")
    val wo = Window.partitionBy($"user_id").orderBy($"cents", $"event_id")
    Tables.events(s, dir)
      .select($"user_id", $"event_id",
        round($"value" * 100).cast("long").as("cents"))
      .select($"user_id", $"event_id", $"cents",
        count(lit(1)).over(wp).as("n_group"),
        sum($"cents").over(wp).as("sum_cents"),
        row_number().over(wo).cast("long").as("r"))
      .filter($"n_group" >= 2)
      .select($"user_id", $"event_id", $"cents", $"n_group",
        expr("cents - sum_cents DIV n_group").as("adv_cents"),
        expr("(2 * (r - 1) * 1000000) DIV (n_group - 1) - 1000000")
          .as("rank_adv_ppm"))
      .orderBy($"event_id")
  }

  private val grpoAdvantageSql =
    """WITH e AS (
      |  SELECT user_id, event_id, CAST(round(value * 100) AS BIGINT) AS cents
      |  FROM events),
      |g AS (
      |  SELECT user_id, event_id, cents,
      |    COUNT(*) OVER (PARTITION BY user_id) AS n_group,
      |    CAST(SUM(cents) OVER (PARTITION BY user_id) AS BIGINT) AS sum_cents,
      |    ROW_NUMBER() OVER (PARTITION BY user_id
      |                       ORDER BY cents, event_id) AS r
      |  FROM e)
      |SELECT user_id, event_id, cents, n_group,
      |  cents - (sum_cents // n_group) AS adv_cents,
      |  (2 * (r - 1) * 1000000) // (n_group - 1) - 1000000 AS rank_adv_ppm
      |FROM g WHERE n_group >= 2 ORDER BY event_id""".stripMargin

  // ---------------------------------------------- q_pref_transitivity
  // audited-bnlj(q_pref_transitivity): build side = 1-row decided-pair-count aggregate — audited in PlanAuditSpec/BnljAudit
  /** Transitivity audit of the preference graph — the consistency check
    * run before fitting Bradley–Terry/Elo to comparison data: over the
    * SAME planted arena as q_leaderboard (identical md5 trial stream,
    * so the three ops audit one dataset), majority-direct each model
    * pair (ties undecided), then count cyclic triads (i beats j beats k
    * beats i) among the complete ones. A preference corpus with heavy
    * cyclicity cannot be explained by ANY scalar strength — the number
    * this row measures is the fraction the fit will get wrong.
    *
    * Scale shape: the trial stream aggregates once to a models²-bounded
    * pair frame (map-side partials); triad assembly is three broadcast
    * equi-joins over that ≤ C(models,2)-row frame — the corpus-sized
    * side never re-shuffles. */
  private def prefTransitivity(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    def h(tag: String) = TextFunctions
      .md5Lower64(concat(lit(tag), $"id".cast("string")))
      .bitwiseAND(lit(Long.MaxValue))
    val t = s.range(Annotate.NumTrials)
      .withColumn("a", h("ma:") % Annotate.NumModels)
      .withColumn("b",
        ($"a" + 1 + h("mb:") % (Annotate.NumModels - 1)) % Annotate.NumModels)
      .withColumn("p_a_win",
        greatest(least(lit(50) + lit(6) * ($"b" - $"a"), lit(95)), lit(5)))
      .withColumn("a_won", h("w:") % 100 < $"p_a_win")
    val edges = t
      .select(least($"a", $"b").as("i"), greatest($"a", $"b").as("j"),
        when(($"a" < $"b" && $"a_won") || ($"a" > $"b" && !$"a_won"), 1L)
          .otherwise(0L).as("lo_won"))
      .groupBy($"i", $"j")
      .agg(sum($"lo_won").as("wins_lo"),
        (count(lit(1)) - sum($"lo_won")).as("wins_hi"))
      .select($"i", $"j",
        when($"wins_lo" > $"wins_hi", 1L)
          .when($"wins_lo" < $"wins_hi", -1L).otherwise(0L).as("d"))
    val tri = edges.as("e1")
      .join(edges.as("e2"), col("e2.i") === col("e1.j"))
      .join(edges.as("e3"),
        col("e3.i") === col("e1.i") && col("e3.j") === col("e2.j"))
      .select(col("e1.d").as("d1"), col("e2.d").as("d2"), col("e3.d").as("d3"))
    val triAgg = tri.agg(
      count(lit(1)).as("n_triads"),
      sum(($"d1" =!= 0 && $"d2" =!= 0 && $"d3" =!= 0).cast("long"))
        .as("n_complete"),
      sum((($"d1" === 1 && $"d2" === 1 && $"d3" === -1) ||
        ($"d1" === -1 && $"d2" === -1 && $"d3" === 1)).cast("long"))
        .as("n_cyclic"))
    val decided = edges.agg(sum(($"d" =!= 0).cast("long")).as("n_decided_pairs"))
    triAgg.crossJoin(broadcast(decided))
      .select($"n_decided_pairs", $"n_triads", $"n_complete", $"n_cyclic",
        expr("n_cyclic * 1000000 DIV nullif(n_complete, 0)").as("cyclic_ppm"))
  }

  private val prefTransitivitySql =
    s"""WITH t0 AS (
       |  SELECT i AS id,
       |    CAST(md5_number_lower('ma:' || CAST(i AS VARCHAR))
       |      & 9223372036854775807::UBIGINT AS BIGINT)
       |      % ${Annotate.NumModels} AS a,
       |    CAST(md5_number_lower('mb:' || CAST(i AS VARCHAR))
       |      & 9223372036854775807::UBIGINT AS BIGINT) AS hb,
       |    CAST(md5_number_lower('w:' || CAST(i AS VARCHAR))
       |      & 9223372036854775807::UBIGINT AS BIGINT) % 100 AS roll
       |  FROM range(0, ${Annotate.NumTrials}) AS r(i)),
       |t1 AS (
       |  SELECT id, a,
       |    (a + 1 + hb % ${Annotate.NumModels - 1}) % ${Annotate.NumModels} AS b,
       |    roll FROM t0),
       |t AS (
       |  SELECT id, a, b,
       |    roll < greatest(least(50 + 6 * (b - a), 95), 5) AS a_won
       |  FROM t1),
       |edges AS (
       |  SELECT i, j,
       |    CASE WHEN wins_lo > wins_hi THEN 1
       |         WHEN wins_lo < wins_hi THEN -1 ELSE 0 END AS d
       |  FROM (
       |    SELECT least(a, b) AS i, greatest(a, b) AS j,
       |      CAST(SUM(CASE WHEN (a < b AND a_won) OR (a > b AND NOT a_won)
       |        THEN 1 ELSE 0 END) AS BIGINT) AS wins_lo,
       |      COUNT(*) - CAST(SUM(CASE WHEN (a < b AND a_won)
       |        OR (a > b AND NOT a_won) THEN 1 ELSE 0 END) AS BIGINT)
       |        AS wins_hi
       |    FROM t GROUP BY 1, 2)),
       |tri AS (
       |  SELECT e1.d AS d1, e2.d AS d2, e3.d AS d3
       |  FROM edges e1
       |  JOIN edges e2 ON e2.i = e1.j
       |  JOIN edges e3 ON e3.i = e1.i AND e3.j = e2.j),
       |ta AS (
       |  SELECT CAST(COUNT(*) AS BIGINT) AS n_triads,
       |    CAST(SUM(CASE WHEN d1 != 0 AND d2 != 0 AND d3 != 0
       |      THEN 1 ELSE 0 END) AS BIGINT) AS n_complete,
       |    CAST(SUM(CASE WHEN (d1 = 1 AND d2 = 1 AND d3 = -1)
       |      OR (d1 = -1 AND d2 = -1 AND d3 = 1)
       |      THEN 1 ELSE 0 END) AS BIGINT) AS n_cyclic
       |  FROM tri),
       |dp AS (
       |  SELECT CAST(SUM(CASE WHEN d != 0 THEN 1 ELSE 0 END) AS BIGINT)
       |    AS n_decided_pairs FROM edges)
       |SELECT n_decided_pairs, n_triads, n_complete, n_cyclic,
       |  n_cyclic * 1000000 // nullif(n_complete, 0) AS cyclic_ppm
       |FROM ta CROSS JOIN dp""".stripMargin

  // -------------------------------------------------------- q_mix_anneal
  // audited-bnlj(q_mix_anneal): build side = 1-row corpus-totals aggregate — audited in PlanAuditSpec/BnljAudit
  /** Phase-annealed mixture schedule — the two-distribution curriculum
    * used in pretraining data plans (start on the corpus's NATURAL
    * source mix, anneal linearly to UNIFORM over AnnealPhases phases):
    * per phase, each source's weight interpolates in exact integer ppm,
    * and a per-phase character budget is allocated by LARGEST-REMAINDER
    * rounding — floor quotas plus one extra char to the highest
    * remainders (ties to the lexically-smallest source) — so every
    * phase's allocations sum to the budget EXACTLY. Naive
    * floor-and-forget leaves up to S−1 budget unspent per phase;
    * independent rounding overshoots. The anneal endpoints are exact by
    * construction: phase 0 reproduces the natural ppm, the final phase
    * lands on uniform ppm bit-for-bit.
    *
    * Scale shape: the corpus reduces to one source-keyed aggregate
    * (map-side partials) before anything else; the schedule frame is
    * sources×phases rows with phase-partitioned windows — bounded by
    * the source roster, never by corpus rows. */
  val AnnealPhases = 5
  val PhaseBudgetChars = 1000000L

  private def mixAnneal(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val per = Tables.documents(s, dir)
      .groupBy($"source").agg(sum($"n_chars").as("c"))
    val tot = per.agg(sum($"c").as("ctot"), count(lit(1)).as("s_cnt"))
    val wPhase = Window.partitionBy($"phase")
    val wRank = Window.partitionBy($"phase").orderBy($"rem".desc, $"source")
    per.crossJoin(broadcast(tot))
      .select($"source", $"c", $"ctot", $"s_cnt",
        explode(expr(s"sequence(0, ${AnnealPhases - 1})")).as("phase0"))
      .select($"source", $"phase0".cast("long").as("phase"),
        expr(s"(c * 1000000 DIV ctot) + (((1000000 DIV s_cnt)" +
          s" - (c * 1000000 DIV ctot)) * phase0) DIV ${AnnealPhases - 1}")
          .as("w_ppm"))
      .select($"phase", $"source", $"w_ppm",
        expr(s"($PhaseBudgetChars * w_ppm) DIV sum(w_ppm) OVER" +
          s" (PARTITION BY phase)").as("base"),
        expr(s"($PhaseBudgetChars * w_ppm) % sum(w_ppm) OVER" +
          s" (PARTITION BY phase)").as("rem"))
      .select($"phase", $"source", $"w_ppm", $"base",
        (lit(PhaseBudgetChars) - sum($"base").over(wPhase)).as("leftover"),
        row_number().over(wRank).cast("long").as("rk"))
      .select($"phase", $"source", $"w_ppm",
        ($"base" + when($"rk" <= $"leftover", 1L).otherwise(0L))
          .as("alloc_chars"))
      .orderBy($"phase", $"source")
  }

  private val mixAnnealSql =
    s"""WITH per AS (
       |  SELECT source, CAST(SUM(n_chars) AS BIGINT) AS c
       |  FROM documents GROUP BY source),
       |tot AS (
       |  SELECT CAST(SUM(c) AS BIGINT) AS ctot, CAST(COUNT(*) AS BIGINT)
       |    AS s_cnt FROM per),
       |w AS (
       |  SELECT CAST(p AS BIGINT) AS phase, source,
       |    (c * 1000000 // ctot) + (((1000000 // s_cnt)
       |      - (c * 1000000 // ctot)) * p) // ${AnnealPhases - 1} AS w_ppm
       |  FROM per CROSS JOIN tot
       |  CROSS JOIN unnest(generate_series(0, ${AnnealPhases - 1})) t(p)),
       |b AS (
       |  SELECT phase, source, w_ppm,
       |    ($PhaseBudgetChars * w_ppm)
       |      // SUM(w_ppm) OVER (PARTITION BY phase) AS base,
       |    ($PhaseBudgetChars * w_ppm)
       |      % SUM(w_ppm) OVER (PARTITION BY phase) AS rem
       |  FROM w),
       |r AS (
       |  SELECT phase, source, w_ppm, base,
       |    $PhaseBudgetChars - SUM(base) OVER (PARTITION BY phase) AS leftover,
       |    ROW_NUMBER() OVER (PARTITION BY phase
       |                       ORDER BY rem DESC, source) AS rk
       |  FROM b)
       |SELECT phase, source, w_ppm,
       |  CAST(base + CASE WHEN rk <= leftover THEN 1 ELSE 0 END AS BIGINT)
       |    AS alloc_chars
       |FROM r ORDER BY phase, source""".stripMargin

  val all: Seq[NamedQuery] = Seq(
    NamedQuery("q_dpo_pairs", dpoPairs, Some(dpoPairsSql), bench = true),
    NamedQuery("q_best_of_n", bestOfN, Some(bestOfNSql), bench = true),
    NamedQuery("q_grpo_advantage", grpoAdvantage, Some(grpoAdvantageSql),
      bench = true),
    NamedQuery("q_pref_transitivity", prefTransitivity,
      Some(prefTransitivitySql), bench = true),
    NamedQuery("q_mix_anneal", mixAnneal, Some(mixAnnealSql), bench = true))
}
