package graft.operators

import graft.{NamedQuery, Tables}
import graft.LineageCut._
import graft.functions.TextFunctions
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Supervised-dataset construction — the step between curated tables
  * and a trainable matrix: temporally-sound label/feature windows
  * (churn prediction) and deterministic negative sampling for implicit-
  * feedback interaction data. Both are exact-integer, layout-invariant
  * constructions: a training set that changes under repartitioning is
  * an irreproducible experiment. */
object MlData {

  // ---------------------------------------------------- q_churn_features
  /** Churn-label construction with a leakage-sound temporal split: the
    * fixture's 30-day event window divides into a FEATURE period (days
    * 1–23) and a LABEL period (the last 7 days); features aggregate
    * ONLY the feature period (count, active days, purchase count,
    * cents, recency in minutes to the cutoff) and the label is "no
    * events in the label period". Computing features strictly before
    * the label window is the discipline that keeps the label out of
    * the features — the classic leakage bug this query's shape
    * prevents. Cutoff = fixed calendar instant (the fixture window is
    * 2024-01-01..31 at every sf).
    *
    * Scale shape: one user-keyed aggregation with map-side partials
    * over row-local period flags; no window, no join. */
  val ChurnCutoff = "2024-01-24 00:00:00"

  private def churnFeatures(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val cutoff = lit(ChurnCutoff).cast("timestamp")
    Tables.events(s, dir)
      .select($"user_id", $"ts", $"event_type",
        round($"value" * 100).cast("long").as("cents"),
        ($"ts" < cutoff).cast("long").as("feat"))
      .groupBy($"user_id")
      .agg(
        sum($"feat").as("n_events"),
        countDistinct(when($"feat" === 1,
          date_format($"ts", "yyyy-MM-dd"))).as("n_active_days"),
        sum(when($"feat" === 1 && $"event_type" === "purchase", 1L)
          .otherwise(0L)).as("n_purchases"),
        coalesce(sum(when($"feat" === 1, $"cents")), lit(0L)).as("feat_cents"),
        max(when($"feat" === 1, unix_micros($"ts"))).as("last_feat_us"),
        max(when($"feat" === 0, 1L).otherwise(0L)).as("active_in_label"))
      .select($"user_id", $"n_events", $"n_active_days", $"n_purchases",
        $"feat_cents",
        ((unix_micros(lit(ChurnCutoff).cast("timestamp")) - $"last_feat_us")
          / lit(60000000L)).cast("long").as("recency_min"),
        (lit(1L) - $"active_in_label").as("churned"))
      .orderBy($"user_id")
  }

  private val churnFeaturesSql =
    s"""SELECT user_id,
       |  CAST(SUM(CASE WHEN ts < TIMESTAMP '$ChurnCutoff' THEN 1 ELSE 0 END)
       |    AS BIGINT) AS n_events,
       |  COUNT(DISTINCT CASE WHEN ts < TIMESTAMP '$ChurnCutoff'
       |    THEN strftime(ts, '%Y-%m-%d') END) AS n_active_days,
       |  CAST(SUM(CASE WHEN ts < TIMESTAMP '$ChurnCutoff'
       |      AND event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT)
       |    AS n_purchases,
       |  CAST(COALESCE(SUM(CASE WHEN ts < TIMESTAMP '$ChurnCutoff'
       |    THEN CAST(round(value * 100) AS BIGINT) END), 0) AS BIGINT)
       |    AS feat_cents,
       |  (epoch_us(TIMESTAMP '$ChurnCutoff')
       |    - MAX(CASE WHEN ts < TIMESTAMP '$ChurnCutoff'
       |          THEN epoch_us(ts) END)) // 60000000 AS recency_min,
       |  1 - MAX(CASE WHEN ts >= TIMESTAMP '$ChurnCutoff' THEN 1 ELSE 0 END)
       |    AS churned
       |FROM events GROUP BY user_id ORDER BY user_id""".stripMargin

  // -------------------------------------------------- q_negative_sampling
  // audited-bnlj(q_negative_sampling): build side = 1-row part-count broadcast — audited in PlanAuditSpec/BnljAudit
  /** Deterministic negative sampling for implicit-feedback training
    * (the recsys/embedding-model data op): positives are the DISTINCT
    * (customer, part) purchase interactions; each positive draws
    * NegPerPos pseudo-random candidate parts (md5 of the triple — same
    * draw on any partitioning or engine) and candidates that are
    * themselves positives for that customer are REMOVED by an
    * anti-join, not silently kept — the correctness step naive modular
    * sampling skips. Emits label=1 positives and label=0 surviving
    * negatives.
    *
    * Scale shape: positives aggregate once; negatives are a row-local
    * explode (xNegPerPos) followed by ONE anti-join on the interaction
    * key — the interaction frame is the big side and shuffles once;
    * the part-count frame is a 1-row broadcast. */
  val NegPerPos = 2

  private def negativeSampling(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    // eager lineage cut: pos is consumed THREE times (the candidate
    // explode, the anti-join's right side, the final union's positive
    // arm) and each consumer otherwise re-plans the orders⋈lineitem
    // distinct from the file scan (round-13 profile; guide §2.4)
    val pos = Tables.orders(s, dir)
      .join(Tables.lineitem(s, dir), $"o_orderkey" === $"l_orderkey")
      .select($"o_custkey".as("custkey"), $"l_partkey".as("partkey"))
      .distinct()
      .lineageCut(true)
    val nParts = Tables.part(s, dir).agg(count(lit(1)).as("n_parts"))
    val cand = pos.crossJoin(broadcast(nParts))
      .select($"custkey", $"partkey",
        explode(expr(s"sequence(1, $NegPerPos)")).as("k"), $"n_parts")
      .select($"custkey",
        (TextFunctions.md5Lower64(concat_ws(":",
          lit("neg"), $"custkey", $"partkey", $"k"))
          .bitwiseAND(lit(Long.MaxValue)) % $"n_parts").as("partkey"))
    val negatives = cand
      .join(pos, Seq("custkey", "partkey"), "left_anti")
      .distinct()
    pos.select($"custkey", $"partkey", lit(1L).as("label"))
      .unionByName(negatives.select($"custkey", $"partkey", lit(0L).as("label")))
      .orderBy($"custkey", $"partkey", $"label")
  }

  private val negativeSamplingSql =
    s"""WITH pos AS (
       |  SELECT DISTINCT o_custkey AS custkey, l_partkey AS partkey
       |  FROM orders JOIN lineitem ON o_orderkey = l_orderkey),
       |np AS (SELECT COUNT(*) AS n_parts FROM part),
       |cand AS (
       |  SELECT DISTINCT custkey,
       |    CAST(md5_number_lower('neg:' || CAST(custkey AS VARCHAR) || ':'
       |        || CAST(partkey AS VARCHAR) || ':' || CAST(k AS VARCHAR))
       |      & ${Long.MaxValue}::UBIGINT AS BIGINT) % np.n_parts AS partkey
       |  FROM pos CROSS JOIN np
       |  CROSS JOIN unnest(generate_series(1, $NegPerPos)) t(k)),
       |negs AS (
       |  SELECT c.custkey, c.partkey FROM cand c
       |  WHERE NOT EXISTS (SELECT 1 FROM pos p
       |    WHERE p.custkey = c.custkey AND p.partkey = c.partkey))
       |SELECT custkey, partkey, CAST(1 AS BIGINT) AS label FROM pos
       |UNION ALL
       |SELECT custkey, partkey, CAST(0 AS BIGINT) AS label FROM negs
       |ORDER BY custkey, partkey, label""".stripMargin

  // ------------------------------------------------------ q_rate_smoothing
  // audited-bnlj(q_rate_smoothing): build side = 1-row global-prior broadcast — audited in PlanAuditSpec/BnljAudit
  /** Empirical-Bayes rate shrinkage — the standard CTR-feature
    * treatment for sparse keys: each user's raw purchase rate shrinks
    * toward the global prior with SmoothK pseudo-events, so a 2-event
    * user doesn't swing between 0 and 500000 ppm. All exact integer
    * ppm: prior = global purchases*1e6 DIV events; smoothed =
    * (purchases*1e6 + K*prior) DIV (n + K) — same DIV order both
    * engines, layout-invariant.
    *
    * Scale shape: one user aggregation (map-side partials) + a 1-row
    * global-prior broadcast. */
  val SmoothK = 20L

  private def rateSmoothing(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val per = Tables.events(s, dir)
      .groupBy($"user_id")
      .agg(count(lit(1)).as("n_events"),
        sum(($"event_type" === "purchase").cast("long")).as("n_purchases"))
    val prior = per.agg(
      expr("CAST(sum(n_purchases) * 1000000 DIV sum(n_events) AS BIGINT)")
        .as("prior_ppm"))
    per.crossJoin(broadcast(prior))
      .select($"user_id", $"n_events", $"n_purchases", $"prior_ppm",
        expr("n_purchases * 1000000 DIV n_events").as("raw_ppm"),
        expr(s"(n_purchases * 1000000 + $SmoothK * prior_ppm)" +
          s" DIV (n_events + $SmoothK)").as("smoothed_ppm"))
      .orderBy($"user_id")
  }

  private val rateSmoothingSql =
    s"""WITH per AS (
       |  SELECT user_id, COUNT(*) AS n_events,
       |    CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
       |      AS BIGINT) AS n_purchases
       |  FROM events GROUP BY user_id),
       |prior AS (
       |  SELECT CAST(SUM(n_purchases) * 1000000 // SUM(n_events) AS BIGINT)
       |    AS prior_ppm FROM per)
       |SELECT user_id, n_events, n_purchases, prior_ppm,
       |  n_purchases * 1000000 // n_events AS raw_ppm,
       |  (n_purchases * 1000000 + $SmoothK * prior_ppm)
       |    // (n_events + $SmoothK) AS smoothed_ppm
       |FROM per CROSS JOIN prior ORDER BY user_id""".stripMargin

  // ----------------------------------------------------- q_class_balance
  // audited-bnlj(q_class_balance): build side = 1-row min-class-count aggregate — audited in PlanAuditSpec/BnljAudit
  /** Majority-class downsampling to a bounded imbalance ratio: each
    * language's documents cap at ⌈1.5 × the minority-class count⌉;
    * within a class, survivors are the lowest md5 ranks (the
    * deterministic-lottery discipline — the kept set is a pure function
    * of doc ids, not of layout or arrival order). The row is the
    * per-class accounting table: before, cap, kept, kept-ppm.
    *
    * Scale shape: one class-keyed count (map-side partials), a 1-row
    * min broadcast, one class-partitioned rank window (per-class rows
    * are corpus-share-bounded, and the window carries only
    * (lang, doc_id, hash)), one class-keyed rollup. */
  val BalanceRatioPct = 150L

  private def classBalance(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val docs = Tables.documents(s, dir)
      .select($"lang", $"doc_id",
        TextFunctions.md5Lower64(concat(lit("bal:"),
          $"doc_id".cast("string")))
          .bitwiseAND(lit(Long.MaxValue)).as("h"))
    val counts = docs.groupBy($"lang").agg(count(lit(1)).as("n_before"))
    val cap = counts
      .agg(min($"n_before").as("min_n"))
      .select(expr(s"(min_n * $BalanceRatioPct + 99) DIV 100").as("cap"))
    val ranked = docs
      .withColumn("rn", row_number().over(
        org.apache.spark.sql.expressions.Window
          .partitionBy($"lang").orderBy($"h", $"doc_id")).cast("long"))
    ranked.crossJoin(broadcast(cap))
      .select($"lang", ($"rn" <= $"cap").cast("long").as("kept"), $"cap")
      .groupBy($"lang")
      .agg(count(lit(1)).as("n_before"), max($"cap").as("cap"),
        sum($"kept").as("n_kept"))
      .select($"lang", $"n_before", $"cap", $"n_kept",
        expr("n_kept * 1000000 DIV n_before").as("kept_ppm"))
      .orderBy($"lang")
  }

  private val classBalanceSql =
    s"""WITH docs AS (
       |  SELECT lang, doc_id,
       |    CAST(md5_number_lower('bal:' || CAST(doc_id AS VARCHAR))
       |      & 9223372036854775807::UBIGINT AS BIGINT) AS h
       |  FROM documents),
       |cap AS (
       |  SELECT (MIN(n) * $BalanceRatioPct + 99) // 100 AS cap
       |  FROM (SELECT lang, COUNT(*) AS n FROM docs GROUP BY lang)),
       |ranked AS (
       |  SELECT lang,
       |    ROW_NUMBER() OVER (PARTITION BY lang ORDER BY h, doc_id) AS rn
       |  FROM docs)
       |SELECT r.lang, COUNT(*) AS n_before, MAX(c.cap) AS cap,
       |  CAST(SUM(CASE WHEN r.rn <= c.cap THEN 1 ELSE 0 END) AS BIGINT)
       |    AS n_kept,
       |  CAST(SUM(CASE WHEN r.rn <= c.cap THEN 1 ELSE 0 END) AS BIGINT)
       |    * 1000000 // COUNT(*) AS kept_ppm
       |FROM ranked r CROSS JOIN cap c
       |GROUP BY r.lang ORDER BY r.lang""".stripMargin

  val all: Seq[NamedQuery] = Seq(
    NamedQuery("q_class_balance", classBalance, Some(classBalanceSql),
      bench = true),
    NamedQuery("q_churn_features", churnFeatures, Some(churnFeaturesSql),
      bench = true),
    NamedQuery("q_rate_smoothing", rateSmoothing, Some(rateSmoothingSql),
      bench = true),
    NamedQuery("q_negative_sampling", negativeSampling,
      Some(negativeSamplingSql), bench = true))
}
