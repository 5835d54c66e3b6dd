package graft.operators

import graft.{NamedQuery, Tables}
import graft.functions.TextFunctions
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Model-evaluation operators — the metric plumbing a training pipeline
  * runs after a filter/classifier is fit: confusion-matrix precision/
  * recall/F1, threshold-free ranking quality (AUC), and score
  * calibration. The fixture carries no model outputs, so a binary
  * classifier is PLANTED by id arithmetic (the q_label_vote precedent):
  * the true label is doc_id % 2 and the score is an md5-derived ppm
  * value boosted for positives, so scores correlate with labels without
  * being perfect — every cell of every metric is replayable from doc_id
  * alone by both engines, and all three queries stay non-degenerate
  * (both classes, both error kinds, every score decile populated).
  *
  * Scale design (100 TB of scored examples):
  *  - every query first reduces the corpus row-locally to (label,
  *    pred) / (score, label) / (bucket, label), then aggregates with
  *    map-side partials — the only shuffle carries the reduced key
  *    space, never the corpus;
  *  - AUC deliberately uses the RANK-SUM identity over the score
  *    histogram (one cumulative window on the distinct-score frame),
  *    not the O(n_pos·n_neg) pairwise join — the formulation that
  *    survives a billion scored rows;
  *  - everything is integer ppm with identical truncating-DIV order on
  *    both engines (the q_lm_surprisal recipe), so results are
  *    bit-stable on any partitioning. */
object Eval {

  /** Classifier decision threshold, in score ppm. */
  val Threshold = 450000L

  private def planted(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val noise = TextFunctions
      .md5Lower64(concat(lit("scr:"), $"doc_id".cast("string")))
      .bitwiseAND(lit(Long.MaxValue))
    Tables.documents(s, dir).select(
      $"doc_id",
      ($"doc_id" % 2).as("label"),
      (noise % 600000L + ($"doc_id" % 2) * 300000L).as("score_ppm"))
  }

  private val plantedSql =
    s"""SELECT doc_id, doc_id % 2 AS label,
       |    CAST(md5_number_lower('scr:' || CAST(doc_id AS VARCHAR))
       |      & ${Long.MaxValue}::UBIGINT AS BIGINT) % 600000
       |    + (doc_id % 2) * 300000 AS score_ppm
       |  FROM documents""".stripMargin

  // ---------------------------------------------------------------- q_confusion
  /** Per-class confusion-matrix metrics at the fixed threshold: support,
    * predicted count, true positives, and precision/recall/F1 in exact
    * ppm (F1 = 2·P·R DIV (P+R) — same division order both engines). */
  private def confusion(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val scored = planted(s, dir)
      .select($"label", ($"score_ppm" >= Threshold).cast("long").as("pred"))
    val cells = scored.groupBy($"label", $"pred").agg(count(lit(1)).as("n"))
    val wide = cells.agg(
      sum(when($"label" === 1 && $"pred" === 1, $"n").otherwise(0L)).as("tp1"),
      sum(when($"label" === 0 && $"pred" === 1, $"n").otherwise(0L)).as("fp1"),
      sum(when($"label" === 1 && $"pred" === 0, $"n").otherwise(0L)).as("fn1"),
      sum(when($"label" === 0 && $"pred" === 0, $"n").otherwise(0L)).as("tn1"))
    val pos = wide.select(lit(1L).as("class"), ($"tp1" + $"fn1").as("support"),
      ($"tp1" + $"fp1").as("n_pred"), $"tp1".as("tp"))
    val neg = wide.select(lit(0L).as("class"), ($"tn1" + $"fp1").as("support"),
      ($"tn1" + $"fn1").as("n_pred"), $"tn1".as("tp"))
    pos.unionByName(neg)
      .withColumn("precision_ppm", expr("tp * 1000000 DIV n_pred"))
      .withColumn("recall_ppm", expr("tp * 1000000 DIV support"))
      .withColumn("f1_ppm",
        expr("2 * precision_ppm * recall_ppm DIV (precision_ppm + recall_ppm)"))
      .orderBy($"class")
  }

  private val confusionSql =
    s"""WITH scored AS (
       |  SELECT label,
       |    CASE WHEN score_ppm >= $Threshold THEN 1 ELSE 0 END AS pred
       |  FROM ($plantedSql)),
       |wide AS (
       |  SELECT
       |    CAST(SUM(CASE WHEN label = 1 AND pred = 1 THEN 1 ELSE 0 END)
       |      AS BIGINT) AS tp1,
       |    CAST(SUM(CASE WHEN label = 0 AND pred = 1 THEN 1 ELSE 0 END)
       |      AS BIGINT) AS fp1,
       |    CAST(SUM(CASE WHEN label = 1 AND pred = 0 THEN 1 ELSE 0 END)
       |      AS BIGINT) AS fn1,
       |    CAST(SUM(CASE WHEN label = 0 AND pred = 0 THEN 1 ELSE 0 END)
       |      AS BIGINT) AS tn1
       |  FROM scored),
       |cls AS (
       |  SELECT 1 AS class, tp1 + fn1 AS support, tp1 + fp1 AS n_pred,
       |    tp1 AS tp FROM wide
       |  UNION ALL
       |  SELECT 0, tn1 + fp1, tn1 + fn1, tn1 FROM wide),
       |m AS (
       |  SELECT class, support, n_pred, tp,
       |    tp * 1000000 // n_pred AS precision_ppm,
       |    tp * 1000000 // support AS recall_ppm
       |  FROM cls)
       |SELECT class, support, n_pred, tp, precision_ppm, recall_ppm,
       |  2 * precision_ppm * recall_ppm // (precision_ppm + recall_ppm)
       |    AS f1_ppm
       |FROM m ORDER BY class""".stripMargin

  // ---------------------------------------------------------------------- q_auc
  // audited-global-window(q_auc): frame = integer-ppm score grid, <=1e6+1 distinct rows hard ceiling — bound audited in PlanAuditSpec/UnpartitionedWindowAudit
  /** Threshold-free ranking quality: AUC via the rank-sum identity
    * 2U = 2·ΣR_pos − n_pos(n_pos+1), with tied scores handled exactly
    * through doubled average ranks (a value group at cumulative offset
    * c with n members contributes 2c + n + 1 per member). Equals the
    * Mann–Whitney pairwise count — the q_mann_whitney identity — but
    * computed in one cumulative window over the score HISTOGRAM. */
  private def auc(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val hist = planted(s, dir)
      .groupBy($"score_ppm")
      .agg(count(lit(1)).as("n"), sum($"label").cast("long").as("n_pos"))
    val wc = Window.orderBy($"score_ppm")
      .rowsBetween(Window.unboundedPreceding, -1)
    val contrib = hist
      .withColumn("c", coalesce(sum($"n").over(wc), lit(0L)))
      .select(
        sum($"n_pos" * (lit(2L) * $"c" + $"n" + 1L)).as("r2_pos"),
        sum($"n_pos").as("np"), sum($"n" - $"n_pos").as("nn"))
    contrib
      .select($"np".as("n_pos"), $"nn".as("n_neg"),
        ($"r2_pos" - $"np" * ($"np" + 1L)).as("u2"))
      .withColumn("auc_ppm", expr("u2 * 1000000 DIV (2 * n_pos * n_neg)"))
  }

  private val aucSql =
    s"""WITH hist AS (
       |  SELECT score_ppm, COUNT(*) AS n,
       |    CAST(SUM(label) AS BIGINT) AS n_pos
       |  FROM ($plantedSql) GROUP BY 1),
       |cum AS (
       |  SELECT n, n_pos,
       |    COALESCE(CAST(SUM(n) OVER (ORDER BY score_ppm
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS BIGINT),
       |      0) AS c
       |  FROM hist),
       |agg AS (
       |  SELECT CAST(SUM(n_pos * (2 * c + n + 1)) AS BIGINT) AS r2_pos,
       |    CAST(SUM(n_pos) AS BIGINT) AS np,
       |    CAST(SUM(n - n_pos) AS BIGINT) AS nn
       |  FROM cum)
       |SELECT np AS n_pos, nn AS n_neg,
       |  r2_pos - np * (np + 1) AS u2,
       |  (r2_pos - np * (np + 1)) * 1000000 // (2 * np * nn) AS auc_ppm
       |FROM agg""".stripMargin

  // -------------------------------------------------------------- q_calibration
  /** Reliability diagram in exact integers: decile buckets of the score,
    * per bucket the empirical positive rate vs the bucket midpoint — a
    * calibrated scorer has gap ≈ 0; the planted one is deliberately
    * mis-calibrated and the audit must say exactly how much. */
  private def calibration(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    planted(s, dir)
      .groupBy(expr("score_ppm DIV 100000").as("bucket"))
      .agg(count(lit(1)).as("n"), sum($"label").cast("long").as("n_pos"))
      .withColumn("pos_rate_ppm", expr("n_pos * 1000000 DIV n"))
      .withColumn("mid_ppm", $"bucket" * 100000L + 50000L)
      .withColumn("gap_ppm", $"pos_rate_ppm" - $"mid_ppm")
      .orderBy($"bucket")
  }

  private val calibrationSql =
    s"""WITH b AS (
       |  SELECT score_ppm // 100000 AS bucket, COUNT(*) AS n,
       |    CAST(SUM(label) AS BIGINT) AS n_pos
       |  FROM ($plantedSql) GROUP BY 1)
       |SELECT bucket, n, n_pos,
       |  n_pos * 1000000 // n AS pos_rate_ppm,
       |  bucket * 100000 + 50000 AS mid_ppm,
       |  n_pos * 1000000 // n - (bucket * 100000 + 50000) AS gap_ppm
       |FROM b ORDER BY bucket""".stripMargin

  // --------------------------------------------------------------------- q_lift
  // audited-global-window(q_lift): frame = decile axis — bound audited in PlanAuditSpec/UnpartitionedWindowAudit
  // audited-bnlj(q_lift): build side = 1-row global-aggregate broadcast — audited in PlanAuditSpec/BnljAudit
  /** Cumulative gain / lift curve — "if I take the top-k% by score, what
    * fraction of the positives do I capture, and how much better than
    * random is that?" Deciles DESCENDING by score; per decile the
    * cumulative capture rate and lift vs the base rate, all in exact
    * ppm. With the mis-calibrated-but-discriminative plant, the top
    * decile's lift must exceed 1× and the full-curve terminal lift is
    * exactly 1000000 (everything captured = base rate), which the spec
    * pins.
    *
    * Scale shape: same histogram reduction as q_auc (score deciles ×
    * label counts map-side), then windows over the 9-row bucket frame.
    * The triple product cum_pos·tot_n·10⁶ stays in a long below ~10⁹
    * rows; beyond that route it through DECIMAL (q_winsorize recipe). */
  private def lift(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val b = planted(s, dir)
      .groupBy(expr("score_ppm DIV 100000").as("bucket"))
      .agg(count(lit(1)).as("n"), sum($"label").cast("long").as("n_pos"))
    val wc = Window.orderBy($"bucket".desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    b.crossJoin(broadcast(
        b.agg(sum($"n").as("tot_n"), sum($"n_pos").as("tot_pos"))))
      .withColumn("cum_n", sum($"n").over(wc))
      .withColumn("cum_pos", sum($"n_pos").over(wc))
      .select($"bucket", $"cum_n", $"cum_pos",
        expr("cum_pos * 1000000 DIV tot_pos").as("capture_ppm"),
        expr("(cum_pos * tot_n * 1000000) DIV (cum_n * tot_pos)")
          .as("lift_ppm"))
      .orderBy($"bucket".desc)
  }

  private val liftSql =
    s"""WITH b AS (
       |  SELECT score_ppm // 100000 AS bucket, COUNT(*) AS n,
       |    CAST(SUM(label) AS BIGINT) AS n_pos
       |  FROM ($plantedSql) GROUP BY 1),
       |t AS (SELECT CAST(SUM(n) AS BIGINT) AS tot_n,
       |             CAST(SUM(n_pos) AS BIGINT) AS tot_pos FROM b),
       |c AS (
       |  SELECT bucket,
       |    CAST(SUM(n) OVER w AS BIGINT) AS cum_n,
       |    CAST(SUM(n_pos) OVER w AS BIGINT) AS cum_pos
       |  FROM b
       |  WINDOW w AS (ORDER BY bucket DESC
       |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))
       |SELECT bucket, cum_n, cum_pos,
       |  cum_pos * 1000000 // tot_pos AS capture_ppm,
       |  (cum_pos * tot_n * 1000000) // (cum_n * tot_pos) AS lift_ppm
       |FROM c CROSS JOIN t
       |ORDER BY bucket DESC""".stripMargin

  // ------------------------------------------------------------------ q_ab_test
  /** Two-proportion A/B test — the experiment readout a data pipeline
    * runs on any gated rollout. Arm and outcome are PLANTED by id
    * arithmetic (the q_confusion precedent): arm = doc_id % 2, and the
    * conversion draw is an md5-ppm uniform with the treatment arm's
    * threshold lifted by [[AbPlantedLiftPpm]] — so the true effect is
    * known, both engines replay every count exactly, and the z-score
    * (pooled two-proportion, one fixed 9dp-rounded double sequence over
    * exact integer counts) lands on a pinned value. Counts, realized
    * rates, and the realized lift are exact ppm.
    *
    * Scale shape: the corpus reduces row-locally to (arm, converted)
    * and aggregates with map-side partials — one 1-row output. */
  /** Planted at 15pp over a 20% base: large enough to clear two-
    * proportion sampling noise even at sf0.001 (±~3.6pp at n=250/arm),
    * so the positive-lift and z>0 assertions hold at every fixture sf. */
  val AbBaseRatePpm = 200000L
  val AbPlantedLiftPpm = 150000L

  private def abTest(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val draw = TextFunctions
      .md5Lower64(concat(lit("ab:"), $"doc_id".cast("string")))
      .bitwiseAND(lit(Long.MaxValue)) % 1000000L
    val scored = Tables.documents(s, dir).select(
      ($"doc_id" % 2).as("arm"),
      (draw < lit(AbBaseRatePpm) + ($"doc_id" % 2) * AbPlantedLiftPpm)
        .cast("long").as("conv"))
    val wide = scored.agg(
      sum(when($"arm" === 0, 1L).otherwise(0L)).as("n_a"),
      sum(when($"arm" === 1, 1L).otherwise(0L)).as("n_b"),
      sum(when($"arm" === 0, $"conv").otherwise(0L)).as("conv_a"),
      sum(when($"arm" === 1, $"conv").otherwise(0L)).as("conv_b"))
    val Seq(na, nb, ca, cb) = Seq("n_a", "n_b", "conv_a", "conv_b")
      .map(c => col(c).cast("double"))
    val pPool = (ca + cb) / (na + nb)
    val z = (cb / nb - ca / na) /
      sqrt(pPool * (lit(1.0) - pPool) * (lit(1.0) / na + lit(1.0) / nb))
    wide.select($"n_a", $"n_b", $"conv_a", $"conv_b",
      expr("conv_a * 1000000 DIV n_a").as("rate_a_ppm"),
      expr("conv_b * 1000000 DIV n_b").as("rate_b_ppm"),
      expr("conv_b * 1000000 DIV n_b - conv_a * 1000000 DIV n_a")
        .as("lift_ppm"),
      round(z, 9).as("z_score"))
  }

  private val abTestSql =
    s"""WITH scored AS (
       |  SELECT doc_id % 2 AS arm,
       |    CASE WHEN CAST(md5_number_lower('ab:' || CAST(doc_id AS VARCHAR))
       |        & ${Long.MaxValue}::UBIGINT AS BIGINT) % 1000000
       |      < $AbBaseRatePpm + (doc_id % 2) * $AbPlantedLiftPpm
       |    THEN 1 ELSE 0 END AS conv
       |  FROM documents),
       |wide AS (
       |  SELECT
       |    CAST(SUM(CASE WHEN arm = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_a,
       |    CAST(SUM(CASE WHEN arm = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_b,
       |    CAST(SUM(CASE WHEN arm = 0 THEN conv ELSE 0 END) AS BIGINT)
       |      AS conv_a,
       |    CAST(SUM(CASE WHEN arm = 1 THEN conv ELSE 0 END) AS BIGINT)
       |      AS conv_b
       |  FROM scored)
       |SELECT n_a, n_b, conv_a, conv_b,
       |  conv_a * 1000000 // n_a AS rate_a_ppm,
       |  conv_b * 1000000 // n_b AS rate_b_ppm,
       |  conv_b * 1000000 // n_b - conv_a * 1000000 // n_a AS lift_ppm,
       |  round((CAST(conv_b AS DOUBLE) / n_b - CAST(conv_a AS DOUBLE) / n_a)
       |    / sqrt((CAST(conv_a AS DOUBLE) + conv_b) / (n_a + n_b)
       |        * (1.0 - (CAST(conv_a AS DOUBLE) + conv_b) / (n_a + n_b))
       |        * (1.0 / n_a + 1.0 / n_b)), 9) AS z_score
       |FROM wide""".stripMargin

  // ------------------------------------------------------------------ q_did
  /** Difference-in-differences — the panel-data readout for rollouts
    * that can't randomize (the A/B test's observational sibling):
    * treatment = odd user_id, the period boundary is the fixture
    * window's midpoint (events span exactly 2024-01-01..31 at every
    * sf), the metric is purchase value in exact cents. The estimate is
    * the classic (post−pre) gap of the treated minus the same gap for
    * control; all four cell means are integer-cents floors (exact DIV)
    * and the DiD itself is a difference of those integers — replayed
    * exactly by the oracle with no float anywhere.
    *
    * Scale shape: row-local flags, ONE global aggregation with
    * map-side partials, 1-row output. */
  val DidCutoff = "2024-01-16 00:00:00"

  private def did(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val cells = Tables.events(s, dir)
      .filter($"event_type" === "purchase")
      .select(($"user_id" % 2).as("treated"),
        ($"ts" >= lit(DidCutoff).cast("timestamp")).cast("long").as("post"),
        round($"value" * 100).cast("long").as("cents"))
      .agg(
        sum(when($"treated" === 0 && $"post" === 0, 1L).otherwise(0L)).as("n_pre_c"),
        sum(when($"treated" === 0 && $"post" === 1, 1L).otherwise(0L)).as("n_post_c"),
        sum(when($"treated" === 1 && $"post" === 0, 1L).otherwise(0L)).as("n_pre_t"),
        sum(when($"treated" === 1 && $"post" === 1, 1L).otherwise(0L)).as("n_post_t"),
        sum(when($"treated" === 0 && $"post" === 0, $"cents").otherwise(0L)).as("s_pre_c"),
        sum(when($"treated" === 0 && $"post" === 1, $"cents").otherwise(0L)).as("s_post_c"),
        sum(when($"treated" === 1 && $"post" === 0, $"cents").otherwise(0L)).as("s_pre_t"),
        sum(when($"treated" === 1 && $"post" === 1, $"cents").otherwise(0L)).as("s_post_t"))
    cells.select(
      $"n_pre_c", $"n_post_c", $"n_pre_t", $"n_post_t",
      expr("s_pre_c DIV n_pre_c").as("mean_pre_c_cents"),
      expr("s_post_c DIV n_post_c").as("mean_post_c_cents"),
      expr("s_pre_t DIV n_pre_t").as("mean_pre_t_cents"),
      expr("s_post_t DIV n_post_t").as("mean_post_t_cents"),
      expr("(s_post_t DIV n_post_t - s_pre_t DIV n_pre_t)" +
        " - (s_post_c DIV n_post_c - s_pre_c DIV n_pre_c)").as("did_cents"))
  }

  private val didSql =
    s"""WITH cells AS (
       |  SELECT
       |    CAST(SUM(CASE WHEN t = 0 AND p = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_pre_c,
       |    CAST(SUM(CASE WHEN t = 0 AND p = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_post_c,
       |    CAST(SUM(CASE WHEN t = 1 AND p = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_pre_t,
       |    CAST(SUM(CASE WHEN t = 1 AND p = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_post_t,
       |    CAST(SUM(CASE WHEN t = 0 AND p = 0 THEN c ELSE 0 END) AS BIGINT) AS s_pre_c,
       |    CAST(SUM(CASE WHEN t = 0 AND p = 1 THEN c ELSE 0 END) AS BIGINT) AS s_post_c,
       |    CAST(SUM(CASE WHEN t = 1 AND p = 0 THEN c ELSE 0 END) AS BIGINT) AS s_pre_t,
       |    CAST(SUM(CASE WHEN t = 1 AND p = 1 THEN c ELSE 0 END) AS BIGINT) AS s_post_t
       |  FROM (
       |    SELECT user_id % 2 AS t,
       |      CASE WHEN ts >= TIMESTAMP '$DidCutoff' THEN 1 ELSE 0 END AS p,
       |      CAST(round(value * 100) AS BIGINT) AS c
       |    FROM events WHERE event_type = 'purchase'))
       |SELECT n_pre_c, n_post_c, n_pre_t, n_post_t,
       |  s_pre_c // n_pre_c AS mean_pre_c_cents,
       |  s_post_c // n_post_c AS mean_post_c_cents,
       |  s_pre_t // n_pre_t AS mean_pre_t_cents,
       |  s_post_t // n_post_t AS mean_post_t_cents,
       |  (s_post_t // n_post_t - s_pre_t // n_pre_t)
       |    - (s_post_c // n_post_c - s_pre_c // n_pre_c) AS did_cents
       |FROM cells""".stripMargin

  // ------------------------------------------------------------------ q_ndcg
  // audited-bnlj(q_ndcg): build side = 1-row scaled-DCG frame — audited in PlanAuditSpec/BnljAudit
  /** NDCG@10 with EXACT integer arithmetic: graded relevance is planted
    * as label·(1 + doc_id % 3) ∈ {0..3} (so it correlates with the
    * planted ranker score like a real judgment set), the ranker is the
    * shared `planted` score, and the discount is the reciprocal-rank
    * variant 1/(i+1) scaled by L = lcm(2..11) = 27720 — making DCG and
    * IDCG exact integers and NDCG an exact ppm DIV. The log2 discount
    * is deliberately avoided: ln's last ulp is libm-dependent (the
    * q_bm25 odds-ratio precedent), while this variant needs no float
    * anywhere.
    *
    * Scale shape: two TakeOrderedAndProject top-10s (ranker order and
    * ideal order), each collapsed into ONE row via sort_array +
    * posexplode — no unpartitioned window, corpus reduces row-locally. */
  val NdcgK = 10
  /** lcm(2..11): scales 1/(i+1) for i = 1..10 to exact integers. */
  val NdcgScale = 27720L

  /** Scaled DCG of a ≤k-row (sortkey, rel) frame: positions come from
    * sort_array over the single collected row (k-bounded), discount =
    * NdcgScale/(pos+1), gain = 2^rel − 1 (exact shiftleft). */
  private def scaledDcg(top: DataFrame, out: String): DataFrame = {
    import top.sparkSession.implicits._
    top.agg(sort_array(collect_list(struct($"skey", $"doc_id", $"rel")))
        .as("a"))
      .select(posexplode($"a"))
      .select(($"pos" + 1).as("i"), $"col.rel".as("rel"))
      .agg(coalesce(sum(
        (expr("CAST(shiftleft(1, CAST(rel AS INT)) AS BIGINT)") - 1L) *
          expr(s"$NdcgScale DIV (i + 1)")), lit(0L)).as(out))
  }

  private def ndcg(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val graded = planted(s, dir)
      .select($"doc_id", $"score_ppm",
        ($"label" * (lit(1L) + $"doc_id" % 3)).as("rel"))
    val byScore = graded
      .select((-$"score_ppm").as("skey"), $"doc_id", $"rel")
      .orderBy($"skey", $"doc_id").limit(NdcgK)
    val byRel = graded
      .select((-$"rel").as("skey"), $"doc_id", $"rel")
      .orderBy($"skey", $"doc_id").limit(NdcgK)
    scaledDcg(byScore, "dcg_scaled")
      .crossJoin(scaledDcg(byRel, "idcg_scaled"))
      .select($"dcg_scaled", $"idcg_scaled",
        expr("dcg_scaled * 1000000 DIV idcg_scaled").as("ndcg_ppm"))
  }

  private val ndcgSql =
    s"""WITH graded AS (
       |  SELECT doc_id, score_ppm, label * (1 + doc_id % 3) AS rel
       |  FROM (
       |    SELECT doc_id, doc_id % 2 AS label,
       |      CAST(md5_number_lower('scr:' || CAST(doc_id AS VARCHAR))
       |        & ${Long.MaxValue}::UBIGINT AS BIGINT) % 600000
       |      + (doc_id % 2) * 300000 AS score_ppm
       |    FROM documents)),
       |by_score AS (
       |  SELECT rel, ROW_NUMBER() OVER (ORDER BY score_ppm DESC, doc_id) AS i
       |  FROM graded ORDER BY score_ppm DESC, doc_id LIMIT $NdcgK),
       |by_rel AS (
       |  SELECT rel, ROW_NUMBER() OVER (ORDER BY rel DESC, doc_id) AS i
       |  FROM graded ORDER BY rel DESC, doc_id LIMIT $NdcgK),
       |d AS (
       |  SELECT CAST(COALESCE(SUM(((1 << rel) - 1) * ($NdcgScale // (i + 1))), 0)
       |    AS BIGINT) AS dcg_scaled FROM by_score),
       |i AS (
       |  SELECT CAST(COALESCE(SUM(((1 << rel) - 1) * ($NdcgScale // (i + 1))), 0)
       |    AS BIGINT) AS idcg_scaled FROM by_rel)
       |SELECT d.dcg_scaled, i.idcg_scaled,
       |  d.dcg_scaled * 1000000 // i.idcg_scaled AS ndcg_ppm
       |FROM d CROSS JOIN i""".stripMargin

  // ------------------------------------------------------------ q_multiclass
  /** Per-class precision/recall/F1 over the embeddings table's REAL
    * 10-class label column — the multiclass readout next to
    * q_confusion's binary one. The classifier is planted as "true label
    * shifted to the next class for an md5-selected ~20% of rows", so
    * every class has both error kinds and all 100 confusion cells are
    * replayable from vec_id alone. All metrics exact ppm, identical DIV
    * order both engines (macro aggregation is spec-side — the row
    * contract stays one-class-per-row).
    *
    * Scale shape: row-local (label, pred) projection, one 10×10-bounded
    * aggregation with map-side partials, metrics on the 10-row frame. */
  val MulticlassErrPpm = 200000L

  private def multiclass(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val noise = TextFunctions
      .md5Lower64(concat(lit("mc:"), $"vec_id".cast("string")))
      .bitwiseAND(lit(Long.MaxValue)) % 1000000L
    val scored = Tables.embeddings(s, dir).select(
      $"label".cast("long").as("label"),
      pmod($"label" + (noise < MulticlassErrPpm).cast("long"), lit(10L))
        .as("pred"))
    val perClass = scored.groupBy($"label").agg(count(lit(1)).as("support"))
      .join(scored.groupBy($"pred".as("label"))
        .agg(count(lit(1)).as("n_pred")), Seq("label"), "full_outer")
      .join(scored.filter($"label" === $"pred")
        .groupBy($"label").agg(count(lit(1)).as("tp")), Seq("label"), "full_outer")
      .select($"label",
        coalesce($"support", lit(0L)).as("support"),
        coalesce($"n_pred", lit(0L)).as("n_pred"),
        coalesce($"tp", lit(0L)).as("tp"))
    perClass
      .withColumn("precision_ppm", expr("tp * 1000000 DIV NULLIF(n_pred, 0)"))
      .withColumn("recall_ppm", expr("tp * 1000000 DIV NULLIF(support, 0)"))
      .withColumn("f1_ppm", expr(
        "2 * precision_ppm * recall_ppm DIV NULLIF(precision_ppm + recall_ppm, 0)"))
      .orderBy($"label")
  }

  private val multiclassSql =
    s"""WITH scored AS (
       |  SELECT CAST(label AS BIGINT) AS label,
       |    (label + CASE WHEN CAST(md5_number_lower('mc:' ||
       |        CAST(vec_id AS VARCHAR)) & ${Long.MaxValue}::UBIGINT AS BIGINT)
       |        % 1000000 < $MulticlassErrPpm THEN 1 ELSE 0 END) % 10 AS pred
       |  FROM embeddings),
       |sup AS (SELECT label, COUNT(*) AS support FROM scored GROUP BY label),
       |prd AS (SELECT pred AS label, COUNT(*) AS n_pred FROM scored GROUP BY pred),
       |tps AS (SELECT label, COUNT(*) AS tp FROM scored
       |        WHERE label = pred GROUP BY label),
       |cls AS (
       |  SELECT COALESCE(s.label, p.label, t.label) AS label,
       |    COALESCE(s.support, 0) AS support,
       |    COALESCE(p.n_pred, 0) AS n_pred,
       |    COALESCE(t.tp, 0) AS tp
       |  FROM sup s
       |  FULL OUTER JOIN prd p ON s.label = p.label
       |  FULL OUTER JOIN tps t ON COALESCE(s.label, p.label) = t.label),
       |m AS (
       |  SELECT label, support, n_pred, tp,
       |    tp * 1000000 // NULLIF(n_pred, 0) AS precision_ppm,
       |    tp * 1000000 // NULLIF(support, 0) AS recall_ppm
       |  FROM cls)
       |SELECT label, support, n_pred, tp, precision_ppm, recall_ppm,
       |  2 * precision_ppm * recall_ppm
       |    // NULLIF(precision_ppm + recall_ppm, 0) AS f1_ppm
       |FROM m ORDER BY label""".stripMargin

  val all: Seq[NamedQuery] = Seq(
    NamedQuery("q_ab_test", abTest, Some(abTestSql), bench = true),
    NamedQuery("q_did", did, Some(didSql), bench = true),
    NamedQuery("q_multiclass", multiclass, Some(multiclassSql), bench = true),
    NamedQuery("q_ndcg", ndcg, Some(ndcgSql), bench = true),
    NamedQuery("q_lift", lift, Some(liftSql), bench = true),
    NamedQuery("q_confusion", confusion, Some(confusionSql), bench = true),
    NamedQuery("q_auc", auc, Some(aucSql), bench = true),
    NamedQuery("q_calibration", calibration, Some(calibrationSql),
      bench = true))
}
