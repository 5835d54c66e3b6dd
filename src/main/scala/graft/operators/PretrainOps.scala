package graft.operators

import graft.{NamedQuery, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Round-7 pretraining-pipeline operators: the document FILTER FUNNEL
  * (ordered drop rules with per-rule accounting — the C4/Gopher-style
  * hygiene pass every corpus runs before mixing) and SPAN CORRUPTION
  * (the denoising-objective input/target construction — T5-style masked
  * spans with incremental sentinels). Both are row-local transforms:
  * documents never shuffle; the funnel's only exchange is a ≤5-row
  * rule-grid aggregation, span corruption has none at all.
  *
  * Reference scope note: the reference (pandas/Streamlit,
  * `cleaning.py:21-88`) has no corpus layer; these extend the engine's
  * LLM-data-pipeline surface per SURVEY §2.10+.
  */
object PretrainOps {

  // ------------------------------------------------------------ q_filter_funnel
  // audited-bnlj(q_filter_funnel): build side = 1-row total frame + <=4-row rule-grid drops frame — audited in PlanAuditSpec/BnljAudit
  /** Ordered rule funnel over documents with exact per-rule accounting:
    * each document is charged to the FIRST rule it fails (sequential
    * semantics — the order pipelines actually apply), and the output is
    * one row per rule with n_in / n_dropped / n_out. Rules are pure
    * row-local integer predicates (cross-multiplied ratios — no
    * floats):
    *   1 min_words    word count >= 20
    *   2 max_words    word count <= 80
    *   3 avg_word_len mean word length in [2, 12] (2·nw <= chars-(nw-1) <= 12·nw)
    *   4 digit_ratio  digits <= 20% of chars (5·n_digits <= n_chars)
    *
    * Scale shape: one corpus pass computes each doc's first-fail rule
    * index (codegen'd string ops, no UDF); one tiny aggregation by that
    * index (<=5 groups, map-side partials); the funnel cumulative runs
    * on the broadcast <=5-row drops frame via a triangular join — no
    * unpartitioned window, no second corpus pass. */
  private def filterFunnel(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val rules = Seq((1L, "min_words"), (2L, "max_words"),
      (3L, "avg_word_len"), (4L, "digit_ratio")).toDF("rule_idx", "rule")
    val flagged = Tables.documents(s, dir)
      .select(
        size(split($"text", " ", -1)).cast("long").as("nw"),
        length($"text").cast("long").as("nc"),
        length(regexp_replace($"text", "[^0-9]", "")).cast("long").as("nd"))
      // alpha = non-separator chars, assuming single-space separation
      .withColumn("alpha", $"nc" - ($"nw" - 1))
      .select(
        when($"nw" < 20, 1L)
          .when($"nw" > 80, 2L)
          .when($"alpha" < $"nw" * 2 || $"alpha" > $"nw" * 12, 3L)
          .when($"nd" * 5 > $"nc", 4L)
          .otherwise(0L).as("first_fail"))
    val drops = flagged.filter($"first_fail" > 0)
      .groupBy($"first_fail").agg(count(lit(1)).as("n_dropped"))
    val total = flagged.agg(count(lit(1)).as("n_total"))
    // triangular join on the <=5-row broadcast drops frame: n_in(r) =
    // total - drops charged to earlier rules
    rules
      .crossJoin(broadcast(total))
      .join(broadcast(drops), $"first_fail" <= $"rule_idx", "left")
      .groupBy($"rule_idx", $"rule", $"n_total")
      .agg(
        coalesce(sum(when($"first_fail" < $"rule_idx", $"n_dropped")), lit(0L))
          .as("dropped_before"),
        coalesce(sum(when($"first_fail" === $"rule_idx", $"n_dropped")), lit(0L))
          .as("n_dropped"))
      .select($"rule_idx", $"rule",
        ($"n_total" - $"dropped_before").as("n_in"), $"n_dropped",
        ($"n_total" - $"dropped_before" - $"n_dropped").as("n_out"))
      .orderBy($"rule_idx")
  }

  private[operators] val filterFunnelSql =
    """WITH flags AS (
      |  SELECT CASE
      |    WHEN nw < 20 THEN 1
      |    WHEN nw > 80 THEN 2
      |    WHEN alpha < nw * 2 OR alpha > nw * 12 THEN 3
      |    WHEN nd * 5 > nc THEN 4
      |    ELSE 0 END AS first_fail
      |  FROM (
      |    SELECT len(string_split(text, ' ')) AS nw,
      |      length(text) AS nc,
      |      length(text) - (len(string_split(text, ' ')) - 1) AS alpha,
      |      length(regexp_replace(text, '[^0-9]', '', 'g')) AS nd
      |    FROM documents)),
      |drops AS (
      |  SELECT first_fail, COUNT(*) AS n_dropped FROM flags
      |  WHERE first_fail > 0 GROUP BY first_fail),
      |total AS (SELECT COUNT(*) AS n_total FROM flags),
      |rules(rule_idx, rule) AS (VALUES
      |  (1, 'min_words'), (2, 'max_words'),
      |  (3, 'avg_word_len'), (4, 'digit_ratio'))
      |SELECT CAST(r.rule_idx AS BIGINT) AS rule_idx, r.rule,
      |  CAST(t.n_total - COALESCE(SUM(CASE WHEN d.first_fail < r.rule_idx
      |    THEN d.n_dropped END), 0) AS BIGINT) AS n_in,
      |  CAST(COALESCE(SUM(CASE WHEN d.first_fail = r.rule_idx
      |    THEN d.n_dropped END), 0) AS BIGINT) AS n_dropped,
      |  CAST(t.n_total - COALESCE(SUM(CASE WHEN d.first_fail <= r.rule_idx
      |    THEN d.n_dropped END), 0) AS BIGINT) AS n_out
      |FROM rules r CROSS JOIN total t
      |LEFT JOIN drops d ON d.first_fail <= r.rule_idx
      |GROUP BY r.rule_idx, r.rule, t.n_total
      |ORDER BY rule_idx""".stripMargin

  // ---------------------------------------------------------- q_span_corruption
  /** T5-style span corruption, fully deterministic: tokens group into
    * 3-token spans, every 5th span (span % 5 == 0 → 20% token mask
    * rate) is replaced in the INPUT by an incremental sentinel
    * `<extra_id_k>`, and the TARGET is the sentinel-delimited
    * concatenation of the masked spans — the exact input/target pair a
    * denoising objective trains on. Determinism by position (not RNG)
    * keeps the construction replayable by the oracle and identical
    * across engines, partitionings, and retries — the property a
    * 100 TB preprocessing job needs for idempotent re-runs.
    *
    * Scale shape: pure row-local array HOFs (transform/filter/
    * array_join over the token list) — zero shuffles, zero UDFs, whole
    * row stays inside codegen. */
  private def spanCorruption(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val sentinel =
      "concat('<extra_id_', CAST(((i - 1) div 3) div 5 AS STRING), '>')"
    Tables.documents(s, dir)
      .select($"doc_id", split($"text", " ", -1).as("__w"))
      .select($"doc_id",
        size($"__w").cast("long").as("n_tokens"),
        expr("CAST(size(filter(sequence(1, size(__w))," +
          " i -> ((i - 1) div 3) % 5 = 0)) AS BIGINT)").as("n_masked"),
        expr("array_join(filter(transform(sequence(1, size(__w)), i -> " +
          "CASE WHEN ((i - 1) div 3) % 5 = 0 THEN " +
          s"  CASE WHEN (i - 1) % 3 = 0 THEN $sentinel ELSE NULL END " +
          "ELSE __w[i - 1] END), x -> x IS NOT NULL), ' ')").as("input_text"),
        expr("array_join(filter(transform(sequence(1, size(__w)), i -> " +
          "CASE WHEN ((i - 1) div 3) % 5 = 0 THEN " +
          s"  CASE WHEN (i - 1) % 3 = 0 THEN concat($sentinel, ' ', __w[i - 1]) " +
          "       ELSE __w[i - 1] END " +
          "ELSE NULL END), x -> x IS NOT NULL), ' ')").as("target_text"))
      .orderBy($"doc_id")
  }

  private val spanCorruptionSql =
    """WITH w AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents)
      |SELECT doc_id,
      |  CAST(len(t) AS BIGINT) AS n_tokens,
      |  CAST(len(list_filter(generate_series(1, len(t)),
      |    i -> ((i - 1) // 3) % 5 = 0)) AS BIGINT) AS n_masked,
      |  array_to_string(list_filter(list_transform(generate_series(1, len(t)),
      |    i -> CASE WHEN ((i - 1) // 3) % 5 = 0 THEN
      |           CASE WHEN (i - 1) % 3 = 0
      |             THEN '<extra_id_' || CAST(((i - 1) // 3) // 5 AS VARCHAR) || '>'
      |             ELSE NULL END
      |         ELSE t[i] END), x -> x IS NOT NULL), ' ') AS input_text,
      |  array_to_string(list_filter(list_transform(generate_series(1, len(t)),
      |    i -> CASE WHEN ((i - 1) // 3) % 5 = 0 THEN
      |           CASE WHEN (i - 1) % 3 = 0
      |             THEN '<extra_id_' || CAST(((i - 1) // 3) // 5 AS VARCHAR)
      |                  || '> ' || t[i]
      |             ELSE t[i] END
      |         ELSE NULL END), x -> x IS NOT NULL), ' ') AS target_text
      |FROM w ORDER BY doc_id""".stripMargin

  val all: Seq[NamedQuery] = Seq(
    NamedQuery("q_filter_funnel", filterFunnel, Some(filterFunnelSql),
      bench = true),
    NamedQuery("q_span_corruption", spanCorruption, Some(spanCorruptionSql),
      bench = true))
}
