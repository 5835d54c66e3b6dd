package graft.operators

import graft.LineageCut._
import graft.{NamedQuery, Tables}
import graft.functions.TextFunctions
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Annotation aggregation — the label-plumbing half of an RLHF /
  * supervised-fine-tuning data pipeline: several annotators label each
  * document, and the pipeline must resolve them to one training label
  * (majority vote with a deterministic tie-break) while surfacing
  * agreement statistics that gate annotator quality.
  *
  * The fixture carries no annotation table, so annotators are PLANTED
  * by id arithmetic (the q_pii_redact precedent): a true label is
  * doc_id % 4, and each of the 3 annotators flips it ~20% of the time
  * to a deterministic md5-derived wrong label. Every downstream number
  * — votes, majority, tie-breaks, agreement — is replayable by any
  * engine from doc_id alone, so the whole resolution logic is
  * hash-pinned by the oracle, including the tie path (three distinct
  * labels → smallest wins), which genuinely occurs in the plant.
  *
  * Scale shape: entirely row-local integer arithmetic inside
  * whole-stage codegen — zero shuffle. A real deployment would first
  * pivot an (item, annotator, label) table into this wide shape: one
  * keyed aggregation, map-side partial, the shape q_pivot_attrs
  * already covers. */
object Annotate {

  val NumAnnotators = 3
  val NumClasses = 4

  /** Deterministic planted label for one annotator: flip the true label
    * with probability 2/10, choosing one of the other classes by hash. */
  private def plantLabel(a: Int): Column = {
    val t = col("doc_id") % NumClasses
    val noise = TextFunctions
      .md5Lower64(concat(lit(s"lab:$a:"), col("doc_id").cast("string")))
      .bitwiseAND(lit(Long.MaxValue))
    when(noise % 10 < 2,
      (t + 1 + noise % (NumClasses - 1)) % NumClasses).otherwise(t)
  }

  private def plantLabelSql(a: Int): String =
    s"""CASE WHEN CAST(md5_number_lower('lab:$a:' || CAST(doc_id AS VARCHAR))
       | & 9223372036854775807::UBIGINT AS BIGINT) % 10 < 2
       | THEN (doc_id % $NumClasses + 1
       |   + CAST(md5_number_lower('lab:$a:' || CAST(doc_id AS VARCHAR))
       |     & 9223372036854775807::UBIGINT AS BIGINT) % ${NumClasses - 1})
       |   % $NumClasses
       | ELSE doc_id % $NumClasses END""".stripMargin.replace("\n", "")

  // -------------------------------------------------------------- q_label_vote
  private def labelVote(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.documents(s, dir)
      .select($"doc_id", plantLabel(1).as("l1"), plantLabel(2).as("l2"),
        plantLabel(3).as("l3"))
      .select($"doc_id", $"l1", $"l2", $"l3",
        // any pair agreeing is a majority of 3; all-distinct ties break
        // to the smallest label (deterministic, engine-free)
        when($"l1" === $"l2" || $"l1" === $"l3", $"l1")
          .when($"l2" === $"l3", $"l2")
          .otherwise(least($"l1", $"l2", $"l3")).as("majority"),
        (($"l1" === $"l2").cast("long") + ($"l1" === $"l3").cast("long") +
          ($"l2" === $"l3").cast("long")).as("n_agree_pairs"))
      .select($"doc_id", $"l1", $"l2", $"l3", $"majority", $"n_agree_pairs",
        ($"n_agree_pairs" === 3).as("unanimous"),
        ($"majority" === $"doc_id" % NumClasses).as("majority_correct"))
      .orderBy($"doc_id")
  }

  private val labelVoteSql =
    s"""WITH l AS (
       |  SELECT doc_id, ${plantLabelSql(1)} AS l1, ${plantLabelSql(2)} AS l2,
       |    ${plantLabelSql(3)} AS l3
       |  FROM documents),
       |v AS (
       |  SELECT doc_id, l1, l2, l3,
       |    CASE WHEN l1 = l2 OR l1 = l3 THEN l1
       |         WHEN l2 = l3 THEN l2
       |         ELSE least(l1, l2, l3) END AS majority,
       |    CAST((CASE WHEN l1 = l2 THEN 1 ELSE 0 END)
       |      + (CASE WHEN l1 = l3 THEN 1 ELSE 0 END)
       |      + (CASE WHEN l2 = l3 THEN 1 ELSE 0 END) AS BIGINT)
       |      AS n_agree_pairs
       |  FROM l)
       |SELECT doc_id, l1, l2, l3, majority, n_agree_pairs,
       |  n_agree_pairs = 3 AS unanimous,
       |  majority = doc_id % $NumClasses AS majority_correct
       |FROM v ORDER BY doc_id""".stripMargin

  // --------------------------------------------------------------- q_pref_bias
  /** Preference-data length-bias audit — the reward-hacking check run
    * on RLHF comparison data: if "chosen" responses are systematically
    * longer than "rejected" ones, a reward model trained on the pairs
    * learns length, not quality. Pairs are planted by id arithmetic
    * (doc i vs doc i+250, choice biased 7/10 toward the longer text
    * with an md5 coin), and the audit recomputes the bias from the
    * resolved pairs: chosen-longer ppm and total/mean chosen-minus-
    * rejected length delta, all integer.
    *
    * Scale shape: one equi-join on a derived pair key over slim
    * (doc_id, n_chars) projections, then a single-row aggregate —
    * map-side partials, nothing corpus-sized survives the join. */
  private def prefBias(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val docs = Tables.documents(s, dir).select($"doc_id", $"n_chars")
    val a = docs.filter($"doc_id" < 250)
      .select($"doc_id".as("pair_id"), $"n_chars".as("len_a"))
    val b = docs.filter($"doc_id" >= 250)
      .select(($"doc_id" - 250).as("pair_id"), $"n_chars".as("len_b"))
    val noise = TextFunctions
      .md5Lower64(concat(lit("pref:"), $"pair_id".cast("string")))
      .bitwiseAND(lit(Long.MaxValue))
    val pairs = a.join(b, Seq("pair_id"))
      .withColumn("pick_longer", noise % 10 < 7)
      .withColumn("coin", noise % 2 === 0)
      .withColumn("chosen_len",
        when($"len_a" === $"len_b", when($"coin", $"len_a").otherwise($"len_b"))
          .when($"pick_longer", greatest($"len_a", $"len_b"))
          .otherwise(least($"len_a", $"len_b")))
      .withColumn("rejected_len",
        $"len_a" + $"len_b" - $"chosen_len")
    pairs.agg(
      count(lit(1)).as("n_pairs"),
      sum(($"chosen_len" > $"rejected_len").cast("long"))
        .as("n_chosen_longer"),
      sum($"chosen_len" - $"rejected_len").as("total_len_delta"))
      .select($"n_pairs", $"n_chosen_longer",
        expr("n_chosen_longer * 1000000 DIV n_pairs").as("chosen_longer_ppm"),
        $"total_len_delta",
        expr("total_len_delta * 1000 DIV n_pairs").as("mean_delta_millichars"))
  }

  private val prefBiasSql =
    """WITH a AS (
      |  SELECT doc_id AS pair_id, n_chars AS len_a FROM documents
      |  WHERE doc_id < 250),
      |b AS (
      |  SELECT doc_id - 250 AS pair_id, n_chars AS len_b FROM documents
      |  WHERE doc_id >= 250),
      |p AS (
      |  SELECT a.pair_id, len_a, len_b,
      |    CAST(md5_number_lower('pref:' || CAST(a.pair_id AS VARCHAR))
      |      & 9223372036854775807::UBIGINT AS BIGINT) AS noise
      |  FROM a JOIN b ON a.pair_id = b.pair_id),
      |c AS (
      |  SELECT pair_id, len_a, len_b,
      |    CASE WHEN len_a = len_b THEN
      |           CASE WHEN noise % 2 = 0 THEN len_a ELSE len_b END
      |         WHEN noise % 10 < 7 THEN greatest(len_a, len_b)
      |         ELSE least(len_a, len_b) END AS chosen_len
      |  FROM p),
      |d AS (
      |  SELECT pair_id, chosen_len,
      |    len_a + len_b - chosen_len AS rejected_len
      |  FROM c)
      |SELECT count(*) AS n_pairs,
      |  CAST(SUM(CASE WHEN chosen_len > rejected_len THEN 1 ELSE 0 END)
      |    AS BIGINT) AS n_chosen_longer,
      |  CAST(SUM(CASE WHEN chosen_len > rejected_len THEN 1 ELSE 0 END)
      |    AS BIGINT) * 1000000 // count(*) AS chosen_longer_ppm,
      |  CAST(SUM(chosen_len - rejected_len) AS BIGINT) AS total_len_delta,
      |  CAST(SUM(chosen_len - rejected_len) AS BIGINT) * 1000 // count(*)
      |    AS mean_delta_millichars
      |FROM d""".stripMargin

  // ------------------------------------------------------------- q_leaderboard
  /** Pairwise-comparison leaderboard — arena-style evaluation
    * aggregation: planted matches between 8 "models" where the
    * lower-numbered model is genuinely stronger (win probability
    * 50 + 6·(b − a) percent, md5 dice), aggregated to per-model games,
    * wins, and integer win-ppm, ranked deterministically. The planted
    * strength ordering must be RECOVERED by the ranking — an end-to-end
    * check that match explosion, per-side attribution, and the ranking
    * cut all compose correctly.
    *
    * Scale shape: trials generate distributively (spark.range), each
    * match contributes two slim (model, won) rows via union, and one
    * keyed aggregation produces the 8-row leaderboard — map-side
    * partials throughout. */
  val NumModels = 8
  val NumTrials = 5000L

  private def leaderboard(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    def h(tag: String) = TextFunctions
      .md5Lower64(concat(lit(tag), $"id".cast("string")))
      .bitwiseAND(lit(Long.MaxValue))
    val t = s.range(NumTrials)
      .withColumn("a", h("ma:") % NumModels)
      .withColumn("b", ($"a" + 1 + h("mb:") % (NumModels - 1)) % NumModels)
      .withColumn("p_a_win",
        greatest(least(lit(50) + lit(6) * ($"b" - $"a"), lit(95)), lit(5)))
      .withColumn("a_won", h("w:") % 100 < $"p_a_win")
    val sides = t.select($"a".as("model"), $"a_won".cast("long").as("won"))
      .unionByName(
        t.select($"b".as("model"), (!$"a_won").cast("long").as("won")))
    sides.groupBy($"model")
      .agg(count(lit(1)).as("games"), sum($"won").as("wins"))
      .select($"model", $"games", $"wins",
        expr("wins * 1000000 DIV games").as("win_ppm"))
      .orderBy($"win_ppm".desc, $"model")
  }

  private val leaderboardSql =
    s"""WITH t0 AS (
       |  SELECT i AS id,
       |    CAST(md5_number_lower('ma:' || CAST(i AS VARCHAR))
       |      & 9223372036854775807::UBIGINT AS BIGINT) % $NumModels AS a,
       |    CAST(md5_number_lower('mb:' || CAST(i AS VARCHAR))
       |      & 9223372036854775807::UBIGINT AS BIGINT) AS hb,
       |    CAST(md5_number_lower('w:' || CAST(i AS VARCHAR))
       |      & 9223372036854775807::UBIGINT AS BIGINT) % 100 AS roll
       |  FROM range(0, $NumTrials) AS r(i)),
       |t1 AS (
       |  SELECT id, a, (a + 1 + hb % ${NumModels - 1}) % $NumModels AS b,
       |    roll FROM t0),
       |t AS (
       |  SELECT id, a, b,
       |    roll < greatest(least(50 + 6 * (b - a), 95), 5) AS a_won
       |  FROM t1),
       |sides AS (
       |  SELECT a AS model, CASE WHEN a_won THEN 1 ELSE 0 END AS won FROM t
       |  UNION ALL
       |  SELECT b, CASE WHEN a_won THEN 0 ELSE 1 END FROM t)
       |SELECT model, count(*) AS games, CAST(SUM(won) AS BIGINT) AS wins,
       |  CAST(SUM(won) AS BIGINT) * 1000000 // count(*) AS win_ppm
       |FROM sides GROUP BY model
       |ORDER BY win_ppm DESC, model""".stripMargin

  // ------------------------------------------------------------------ q_kappa
  /** Pairwise Cohen's kappa between the three annotators — the
    * chance-corrected agreement statistic that gates annotator quality
    * (raw agreement alone rewards always-majority-class annotators;
    * kappa subtracts the agreement their marginals would produce by
    * chance). One row per annotator pair: n, raw agreements, observed
    * agreement po, chance agreement pe = Σ_c p_a(c)·p_b(c), and kappa =
    * (po − pe)/(1 − pe) — all RATIONAL in the counts, so ppm
    * quantization with integer DIV is exact and bit-identical
    * cross-engine (both engines truncate integer division toward zero,
    * so the pipeline stays exact even for negative kappas).
    *
    * Scale shape: labels are row-local; the pair unpivot (3 rows/doc)
    * feeds two keyed aggregations — agreements by pair, marginal counts
    * by (pair, class) — both with map-side partials; everything after
    * is arithmetic over ≤ pairs×classes rows. */
  private def kappa(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val l = Tables.documents(s, dir)
      .select($"doc_id", plantLabel(1).as("l1"), plantLabel(2).as("l2"),
        plantLabel(3).as("l3"))
    val pairs = l.select($"doc_id", explode(array(
        struct(lit("1-2").as("pair"), $"l1".as("la"), $"l2".as("lb")),
        struct(lit("1-3").as("pair"), $"l1".as("la"), $"l3".as("lb")),
        struct(lit("2-3").as("pair"), $"l2".as("la"), $"l3".as("lb"))))
        .as("p"))
      .select($"p.pair".as("pair"), $"p.la".as("la"), $"p.lb".as("lb"))
    val agree = pairs.groupBy($"pair")
      .agg(count(lit(1)).as("n"),
        sum(($"la" === $"lb").cast("long")).as("n_agree"))
    val margA = pairs.groupBy($"pair", $"la".as("cls"))
      .agg(count(lit(1)).as("ca"))
    val margB = pairs.groupBy($"pair", $"lb".as("cls"))
      .agg(count(lit(1)).as("cb"))
    val peNum = margA.join(margB, Seq("pair", "cls"), "inner")
      .groupBy($"pair").agg(sum($"ca" * $"cb").as("pe_num"))
    agree.join(peNum, Seq("pair"))
      .select($"pair", $"n", $"n_agree",
        expr("n_agree * 1000000 DIV n").as("po_ppm"),
        expr("pe_num * 1000000 DIV (n * n)").as("pe_ppm"))
      .select($"pair", $"n", $"n_agree", $"po_ppm", $"pe_ppm",
        expr("(po_ppm - pe_ppm) * 1000000 DIV (1000000 - pe_ppm)")
          .as("kappa_ppm"))
      .orderBy($"pair")
  }

  private val kappaSql =
    s"""WITH l AS (
       |  SELECT doc_id, ${plantLabelSql(1)} AS l1, ${plantLabelSql(2)} AS l2,
       |    ${plantLabelSql(3)} AS l3
       |  FROM documents),
       |p AS (
       |  SELECT '1-2' AS pair, l1 AS la, l2 AS lb FROM l
       |  UNION ALL SELECT '1-3', l1, l3 FROM l
       |  UNION ALL SELECT '2-3', l2, l3 FROM l),
       |agree AS (
       |  SELECT pair, COUNT(*) AS n,
       |    CAST(SUM(CASE WHEN la = lb THEN 1 ELSE 0 END) AS BIGINT) AS n_agree
       |  FROM p GROUP BY pair),
       |ma AS (SELECT pair, la AS cls, CAST(COUNT(*) AS BIGINT) AS ca
       |       FROM p GROUP BY 1, 2),
       |mb AS (SELECT pair, lb AS cls, CAST(COUNT(*) AS BIGINT) AS cb
       |       FROM p GROUP BY 1, 2),
       |pe AS (
       |  SELECT ma.pair, CAST(SUM(ca * cb) AS BIGINT) AS pe_num
       |  FROM ma JOIN mb ON ma.pair = mb.pair AND ma.cls = mb.cls
       |  GROUP BY ma.pair),
       |k AS (
       |  SELECT agree.pair, n, n_agree,
       |    n_agree * 1000000 // n AS po_ppm,
       |    pe_num * 1000000 // (n * n) AS pe_ppm
       |  FROM agree JOIN pe ON agree.pair = pe.pair)
       |SELECT pair, n, n_agree, po_ppm, pe_ppm,
       |  (po_ppm - pe_ppm) * 1000000 // (1000000 - pe_ppm) AS kappa_ppm
       |FROM k ORDER BY pair""".stripMargin

  // ----------------------------------------------------------- q_bradley_terry
  /** Bradley–Terry strength fit over the planted arena matches — the
    * model behind arena-style LLM leaderboards: per-model latent
    * strengths s_i such that P(i beats j) = s_i/(s_i + s_j), fit by the
    * standard MM iteration (Hunter 2004): s_i ← W_i / Σ_j n_ij/(s_i +
    * s_j), renormalized to Σs = models·1e6 each round. The iteration
    * runs in INTEGER MICRO-UNITS — per-opponent terms at 1e12 scale,
    * identical DIV order in both engines — so 5 rounds are replayed
    * bit-exactly by the unrolled oracle CTE chain; a drifted strength
    * at any model after any round fails the hash compare. Recovers the
    * planted ordering (strength strictly decreasing in model id —
    * spec-asserted), which win-ppm alone only recovers when the match
    * graph is balanced.
    *
    * Scale shape: the heavy step is the one keyed aggregation of trials
    * to per-pair (n, wins) counts with map-side partials; iterations
    * run over the models²-sized pair frame with the strengths frame
    * broadcast per round (leaderboards have ≤ 1e5 entrants — dwarfed
    * by the match volume that feeds them). Each round's 8-row result is
    * localCheckpoint'd so the lineage stays flat. */
  val BtIters = 5
  val BtUnit = 1000000L

  private def bradleyTerry(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    def h(tag: String) = TextFunctions
      .md5Lower64(concat(lit(tag), $"id".cast("string")))
      .bitwiseAND(lit(Long.MaxValue))
    val t = s.range(NumTrials)
      .withColumn("a", h("ma:") % NumModels)
      .withColumn("b", ($"a" + 1 + h("mb:") % (NumModels - 1)) % NumModels)
      .withColumn("p_a_win",
        greatest(least(lit(50) + lit(6) * ($"b" - $"a"), lit(95)), lit(5)))
      .withColumn("a_won", h("w:") % 100 < $"p_a_win")
    val sides = t.select($"a".as("model"), $"a_won".cast("long").as("won"))
      .unionByName(
        t.select($"b".as("model"), (!$"a_won").cast("long").as("won")))
    val wtot = sides.groupBy($"model")
      .agg(count(lit(1)).as("games"), sum($"won").as("wins"))
    // directed per-opponent match counts (m vs o), both orientations
    val directed = t
      .select(least($"a", $"b").as("i"), greatest($"a", $"b").as("j"))
      .groupBy($"i", $"j").agg(count(lit(1)).as("n"))
    val both = directed.select($"i".as("m"), $"j".as("o"), $"n")
      .unionByName(directed.select($"j".as("m"), $"i".as("o"), $"n"))
      .lineageCut(true)
    // Round cost is broadcast-build-bound, not data-bound (measured:
    // q_leaderboard shares the trials prefix at 0.83s; each MM round
    // added ~0.35s, and neither removing the checkpoints — 3.5s, the
    // sm/so double-consumption recomputes 2^5 subtrees, the differing
    // projections defeat exchange reuse — nor halving them (3.2s)
    // helped). What does help: strengths carries `wins` along on the
    // m side, so the third per-round broadcast join (wtot) disappears
    // — measured 2.6s → 2.2s over the five rounds. The renormalization
    // total is a global window over the models-roster frame (8 rows by
    // construction — the roster-bounded class of the window audit; it
    // sits behind the round's localCheckpoint, so the registered plan
    // the audit walks ends at the checkpoint scan).
    var strengths = wtot
      .select($"model", lit(BtUnit).as("s"), $"wins")
      .lineageCut(true)
    for (_ <- 1 to BtIters) {
      val sm = strengths.select($"model".as("m"), $"s".as("sm"), $"wins")
      val so = strengths.select($"model".as("o"), $"s".as("so"))
      val raw = both
        .join(broadcast(sm), Seq("m")).join(broadcast(so), Seq("o"))
        .groupBy($"m")
        .agg(sum(expr("n * 1000000000000 DIV (sm + so)")).as("denom"),
          max($"wins").as("wins"))
        .select($"m".as("model"),
          expr("wins * 1000000000000 DIV denom").as("s_raw"), $"wins")
      strengths = raw
        .withColumn("tot",
          sum($"s_raw").over(Window.partitionBy()))
        .select($"model",
          expr(s"s_raw * (${NumModels * BtUnit}) DIV tot").as("s"),
          $"wins")
        .lineageCut(true)
    }
    wtot.join(strengths.select($"model", $"s"), Seq("model"))
      .select($"model", $"games", $"wins", $"s".as("strength_micro"))
      .orderBy($"strength_micro".desc, $"model")
  }

  private val bradleyTerrySql = {
    def iter(k: Int): String =
      s"""raw$k AS (
         |  SELECT d.m AS model,
         |    MAX(wt.wins) * 1000000000000
         |      // SUM(d.n * 1000000000000 // (si.s + sj.s)) AS s_raw
         |  FROM directed d
         |  JOIN s${k - 1} si ON si.model = d.m
         |  JOIN s${k - 1} sj ON sj.model = d.o
         |  JOIN wtot wt ON wt.model = d.m
         |  GROUP BY d.m),
         |s$k AS (
         |  SELECT model,
         |    CAST(s_raw * ${NumModels * BtUnit}
         |      // (SUM(s_raw) OVER ()) AS BIGINT) AS s
         |  FROM raw$k)""".stripMargin
    s"""WITH t0 AS (
       |  SELECT i AS id,
       |    CAST(md5_number_lower('ma:' || CAST(i AS VARCHAR))
       |      & 9223372036854775807::UBIGINT AS BIGINT) % $NumModels AS a,
       |    CAST(md5_number_lower('mb:' || CAST(i AS VARCHAR))
       |      & 9223372036854775807::UBIGINT AS BIGINT) AS hb,
       |    CAST(md5_number_lower('w:' || CAST(i AS VARCHAR))
       |      & 9223372036854775807::UBIGINT AS BIGINT) % 100 AS roll
       |  FROM range(0, $NumTrials) AS r(i)),
       |t1 AS (
       |  SELECT id, a, (a + 1 + hb % ${NumModels - 1}) % $NumModels AS b,
       |    roll FROM t0),
       |t AS (
       |  SELECT id, a, b,
       |    roll < greatest(least(50 + 6 * (b - a), 95), 5) AS a_won
       |  FROM t1),
       |sides AS (
       |  SELECT a AS model, CASE WHEN a_won THEN 1 ELSE 0 END AS won FROM t
       |  UNION ALL
       |  SELECT b, CASE WHEN a_won THEN 0 ELSE 1 END FROM t),
       |wtot AS (
       |  SELECT model, count(*) AS games, CAST(SUM(won) AS BIGINT) AS wins
       |  FROM sides GROUP BY model),
       |pairs AS (
       |  SELECT least(a, b) AS i, greatest(a, b) AS j,
       |    CAST(COUNT(*) AS BIGINT) AS n
       |  FROM t GROUP BY 1, 2),
       |directed AS (
       |  SELECT i AS m, j AS o, n FROM pairs
       |  UNION ALL SELECT j, i, n FROM pairs),
       |s0 AS (SELECT model, CAST($BtUnit AS BIGINT) AS s FROM wtot),
       |${(1 to BtIters).map(iter).mkString(",\n")}
       |SELECT wtot.model, games, wins, s AS strength_micro
       |FROM wtot JOIN s$BtIters USING (model)
       |ORDER BY strength_micro DESC, model""".stripMargin
  }

  val all: Seq[NamedQuery] = Seq(
    NamedQuery("q_bradley_terry", bradleyTerry, Some(bradleyTerrySql),
      bench = true),
    NamedQuery("q_kappa", kappa, Some(kappaSql), bench = true),
    NamedQuery("q_label_vote", labelVote, Some(labelVoteSql), bench = true),
    NamedQuery("q_pref_bias", prefBias, Some(prefBiasSql), bench = true),
    NamedQuery("q_leaderboard", leaderboard, Some(leaderboardSql),
      bench = true))
}
