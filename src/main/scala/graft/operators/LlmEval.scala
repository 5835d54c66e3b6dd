package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.{NamedQuery, Tables}
import graft.functions.TextFunctions

/** Post-training GENERATION-EVAL and SFT-prep operators (round 9) —
  * the accounting a post-training pipeline runs over sampled model
  * responses, modeled on the events table (task/prompt = user_id,
  * attempt/response = event, success = a 'purchase' event, reward =
  * exact cents). All public algorithms: the unbiased pass@k estimator
  * (Chen et al. 2021, HumanEval), top-quantile rejection sampling
  * (Llama-2-style SFT data selection), KTO's desirable/undesirable
  * split accounting (Ethayarajh et al. 2024), and multi-turn dialogue
  * linearization for SFT packing.
  *
  * Exactness discipline: every estimator is integer-exact in ppm
  * (multiply-then-DIV over BIGINT), order statistics are unique-key
  * row_numbers (reward desc, event_id asc), and the dialogue digest is
  * the cross-engine md5-lower64 — so every row hash-compares against
  * the DuckDB oracle on any partitioning. */
object LlmEval {

  // --------------------------------------------------------- q_pass_at_k
  /** Exact pass@k per task: n attempts, c successes, pass@k =
    * 1 − C(n−c,k)/C(n,k) — the UNBIASED HumanEval estimator, computed
    * as an exact falling-factorial ratio in ppm: the binomial ratio
    * telescopes to Π_{i<k}(n−c−i)/(n−i), so the numerator/denominator
    * products stay in BIGINT (envelope: (n−c)^k · 1e6 < 2^63 — holds
    * to n ≈ 1900 at k = 4; shipped fixtures peak at ~100 attempts per
    * task, LlmEvalSpec asserts the envelope per fixture). Tasks with
    * n < k drop (the estimator is undefined there — HumanEval's
    * n ≥ k requirement).
    *
    * Scale shape: one task-keyed aggregation with map-side partials;
    * the combinatorics are row-local post-agg arithmetic. */
  val PassK = 4

  private def passAtK(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.events(s, dir)
      .groupBy($"user_id".as("task_id"))
      .agg(count(lit(1)).as("n_attempts"),
        sum(($"event_type" === "purchase").cast("long")).as("n_solved"))
      .filter($"n_attempts" >= PassK)
      .selectExpr("task_id", "n_attempts", "n_solved",
        "n_solved * 1000000 DIV n_attempts AS pass1_ppm",
        s"""CASE WHEN n_attempts - n_solved < $PassK THEN 1000000
           | ELSE 1000000 -
           |   ((n_attempts - n_solved) * (n_attempts - n_solved - 1)
           |    * (n_attempts - n_solved - 2) * (n_attempts - n_solved - 3))
           |   * 1000000
           |   DIV (n_attempts * (n_attempts - 1)
           |        * (n_attempts - 2) * (n_attempts - 3))
           | END AS pass4_ppm""".stripMargin)
      .orderBy($"task_id")
  }

  private val passAtKSql =
    s"""WITH t AS (
       |  SELECT user_id AS task_id, COUNT(*) AS n_attempts,
       |    CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
       |      AS BIGINT) AS n_solved
       |  FROM events GROUP BY user_id)
       |SELECT task_id, n_attempts, n_solved,
       |  n_solved * 1000000 // n_attempts AS pass1_ppm,
       |  CASE WHEN n_attempts - n_solved < $PassK THEN 1000000
       |   ELSE 1000000 -
       |     ((n_attempts - n_solved) * (n_attempts - n_solved - 1)
       |      * (n_attempts - n_solved - 2) * (n_attempts - n_solved - 3))
       |     * 1000000
       |     // (n_attempts * (n_attempts - 1)
       |        * (n_attempts - 2) * (n_attempts - 3))
       |   END AS pass4_ppm
       |FROM t WHERE n_attempts >= $PassK
       |ORDER BY task_id""".stripMargin

  // ------------------------------------------------ q_rejection_sampling
  /** Top-quantile rejection sampling — keep each prompt's top-quarter
    * responses by reward (⌈n/4⌉, so every prompt keeps ≥ 1): the
    * Llama-2-style SFT selection step between best-of-1 and
    * best-of-n. Ranks are unique keys (cents DESC, event_id ASC), so
    * the accepted set and its cutoff (the LAST accepted response's
    * reward — an exact order statistic) are deterministic under ties
    * on any partitioning.
    *
    * Scale shape: ONE prompt-partitioned rank window (the
    * q_grpo_advantage exchange shape) + the prompt-keyed rollup; no
    * global window, no join. */
  private def rejectionSampling(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val w = Window.partitionBy($"user_id")
      .orderBy($"cents".desc, $"event_id")
    Tables.events(s, dir)
      .select($"user_id", $"event_id",
        round($"value" * 100).cast("long").as("cents"))
      .withColumn("rk", row_number().over(w).cast("long"))
      .withColumn("n", count(lit(1)).over(Window.partitionBy($"user_id")))
      .filter($"rk" <= ($"n" + 3) / 4)
      .groupBy($"user_id".as("prompt_id"))
      .agg(max($"n").as("n_responses"),
        count(lit(1)).as("n_accepted"),
        min($"cents").as("cutoff_cents"),
        sum($"cents").as("sum_accepted_cents"))
      .selectExpr("prompt_id", "n_responses", "n_accepted", "cutoff_cents",
        "sum_accepted_cents",
        "n_accepted * 1000000 DIV n_responses AS acceptance_ppm")
      .orderBy($"prompt_id")
  }

  private val rejectionSamplingSql =
    """WITH r AS (
      |  SELECT user_id, event_id, CAST(round(value * 100) AS BIGINT) AS cents,
      |    CAST(ROW_NUMBER() OVER (PARTITION BY user_id
      |      ORDER BY CAST(round(value * 100) AS BIGINT) DESC, event_id)
      |      AS BIGINT) AS rk,
      |    COUNT(*) OVER (PARTITION BY user_id) AS n
      |  FROM events)
      |SELECT user_id AS prompt_id, MAX(n) AS n_responses,
      |  COUNT(*) AS n_accepted, MIN(cents) AS cutoff_cents,
      |  CAST(SUM(cents) AS BIGINT) AS sum_accepted_cents,
      |  COUNT(*) * 1000000 // MAX(n) AS acceptance_ppm
      |FROM r WHERE rk <= (n + 3) // 4
      |GROUP BY user_id
      |ORDER BY prompt_id""".stripMargin

  // ------------------------------------------------------- q_kto_pairs
  // audited-bnlj(q_kto_pairs): build side = 1-row global reference-reward frame — audited in PlanAuditSpec/BnljAudit
  /** KTO dataset accounting: responses split desirable/undesirable
    * against the GLOBAL reference reward (exact integer mean cents —
    * KTO's reference point is corpus-level, not per-prompt, which is
    * what distinguishes it from the DPO pair construction), and each
    * prompt reports its split plus the per-example loss weights KTO
    * balances with (1e6 DIV its side's count; NULL when a side is
    * empty — those prompts contribute one-sided signal).
    *
    * Scale shape: one global 1-row aggregate broadcast back (the
    * q_filter_funnel shape), one prompt-keyed aggregation. */
  private def ktoPairs(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val ev = Tables.events(s, dir)
      .select($"user_id", round($"value" * 100).cast("long").as("cents"))
    val ref = ev.agg(
      expr("sum(cents) DIV count(1)").as("ref_cents"))
    ev.crossJoin(broadcast(ref))
      .groupBy($"user_id".as("prompt_id"))
      .agg(max($"ref_cents").as("ref_cents"),
        sum(($"cents" >= $"ref_cents").cast("long")).as("n_desirable"),
        sum(($"cents" < $"ref_cents").cast("long")).as("n_undesirable"))
      .selectExpr("prompt_id", "ref_cents", "n_desirable", "n_undesirable",
        "n_desirable * 1000000 DIV (n_desirable + n_undesirable)" +
          " AS desirable_ppm",
        "1000000 DIV NULLIF(n_desirable, 0) AS w_desirable_ppm",
        "1000000 DIV NULLIF(n_undesirable, 0) AS w_undesirable_ppm")
      .orderBy($"prompt_id")
  }

  private val ktoPairsSql =
    """WITH e AS (
      |  SELECT user_id, CAST(round(value * 100) AS BIGINT) AS cents
      |  FROM events),
      |ref AS (SELECT CAST(SUM(cents) AS BIGINT) // COUNT(*) AS ref_cents
      |        FROM e)
      |SELECT user_id AS prompt_id, MAX(ref_cents) AS ref_cents,
      |  CAST(SUM(CASE WHEN cents >= ref_cents THEN 1 ELSE 0 END) AS BIGINT)
      |    AS n_desirable,
      |  CAST(SUM(CASE WHEN cents < ref_cents THEN 1 ELSE 0 END) AS BIGINT)
      |    AS n_undesirable,
      |  CAST(SUM(CASE WHEN cents >= ref_cents THEN 1 ELSE 0 END) AS BIGINT)
      |    * 1000000 // (CAST(SUM(CASE WHEN cents >= ref_cents THEN 1 ELSE 0
      |                             END) AS BIGINT)
      |                + CAST(SUM(CASE WHEN cents < ref_cents THEN 1 ELSE 0
      |                             END) AS BIGINT)) AS desirable_ppm,
      |  1000000 // NULLIF(CAST(SUM(CASE WHEN cents >= ref_cents
      |    THEN 1 ELSE 0 END) AS BIGINT), 0) AS w_desirable_ppm,
      |  1000000 // NULLIF(CAST(SUM(CASE WHEN cents < ref_cents
      |    THEN 1 ELSE 0 END) AS BIGINT), 0) AS w_undesirable_ppm
      |FROM e CROSS JOIN ref
      |GROUP BY user_id
      |ORDER BY prompt_id""".stripMargin

  // --------------------------------------------------- q_dialog_flatten
  /** Multi-turn dialogue linearization for SFT: each user's event
    * stream becomes ONE training sample — turns ordered by event time
    * (event_id breaks sub-microsecond ties), serialized as
    * `type:cents` joined with '|', fingerprinted with the cross-engine
    * md5-lower64. The digest is the point: a linearization whose turn
    * ORDER differs between engines (the classic collect_list
    * nondeterminism) hash-fails immediately — order-sensitivity is
    * exactly what this row gates.
    *
    * Scale shape: one user-keyed aggregation; the sort is per-group
    * over that user's own turns (sort_array over collected structs —
    * no window, no global sort); the transcript never leaves the row
    * (only its digest and length do). */
  private def dialogFlatten(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.events(s, dir)
      .select($"user_id", unix_micros($"ts").as("us"), $"event_id",
        concat($"event_type", lit(":"),
          round($"value" * 100).cast("long").cast("string")).as("turn"))
      .groupBy($"user_id")
      .agg(count(lit(1)).as("n_turns"),
        (max($"us") - min($"us")).as("span_us"),
        array_join(
          transform(
            sort_array(collect_list(struct($"us", $"event_id", $"turn"))),
            x => x.getField("turn")),
          "|").as("transcript"))
      .select($"user_id", $"n_turns", $"span_us",
        length($"transcript").cast("long").as("n_chars"),
        TextFunctions.md5Lower64($"transcript")
          .bitwiseAND(lit(Long.MaxValue)).as("transcript_digest"))
      .orderBy($"user_id")
  }

  private val dialogFlattenSql =
    """WITH t AS (
      |  SELECT user_id, epoch_us(ts) AS us, event_id,
      |    event_type || ':' ||
      |      CAST(CAST(round(value * 100) AS BIGINT) AS VARCHAR) AS turn
      |  FROM events),
      |f AS (
      |  SELECT user_id, COUNT(*) AS n_turns,
      |    MAX(us) - MIN(us) AS span_us,
      |    string_agg(turn, '|' ORDER BY us, event_id) AS transcript
      |  FROM t GROUP BY user_id)
      |SELECT user_id, n_turns, span_us,
      |  CAST(length(transcript) AS BIGINT) AS n_chars,
      |  CAST(md5_number_lower(transcript)
      |    & 9223372036854775807::UBIGINT AS BIGINT) AS transcript_digest
      |FROM f ORDER BY user_id""".stripMargin

  val all: Seq[NamedQuery] = Seq(
    NamedQuery("q_pass_at_k", passAtK, Some(passAtKSql), bench = true),
    NamedQuery("q_rejection_sampling", rejectionSampling,
      Some(rejectionSamplingSql), bench = true),
    NamedQuery("q_kto_pairs", ktoPairs, Some(ktoPairsSql), bench = true),
    NamedQuery("q_dialog_flatten", dialogFlatten, Some(dialogFlattenSql),
      bench = true))
}
