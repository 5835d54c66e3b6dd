package graft.operators

import graft.LineageCut._
import graft.{NamedQuery, Tables}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Distribution statistics and quality-cutoff filtering over `documents`
  * — the shapes a corpus-curation pipeline runs before training: profile
  * the length distribution per stratum, cut below a percentile, surface
  * each document's most distinctive terms.
  *
  * Scale design (100 TB):
  *  - exact percentiles aggregate per group: one shuffle keyed by the
  *    stratum, percentile state per key is the group's value multiset —
  *    fine for per-language strata (dozens of keys, bounded groups); for
  *    percentiles over billions of rows per key, approx_percentile (GK
  *    sketch, mergeable, bounded memory) is the drop-in (spec-asserted
  *    within-epsilon here);
  *  - the cutoff filter re-joins the tiny per-stratum threshold frame by
  *    broadcast — the corpus itself never shuffles to be filtered;
  *  - term rarity explodes words once, aggregates (word -> doc freq)
  *    partially map-side, and broadcasts the document-frequency table
  *    back; ranking is integer-only (df, tf, word) so results are
  *    bit-stable on any cluster and any float library. */
object Quality {

  // ------------------------------------------------------------ q_quantile_stats
  /** Per-language quartiles + p99 of document length (exact percentile,
    * linear interpolation — rounded to 4dp so the last-ulp of the
    * interpolation arithmetic can't flake cross-engine comparison). */
  private def quantileStats(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.documents(s, dir)
      .groupBy($"lang")
      .agg(
        round(expr("percentile(n_chars, 0.25)"), 4).as("q1"),
        round(expr("percentile(n_chars, 0.5)"), 4).as("median"),
        round(expr("percentile(n_chars, 0.75)"), 4).as("q3"),
        round(expr("percentile(n_chars, 0.99)"), 4).as("p99"),
        count(lit(1)).as("n_docs"))
      .orderBy($"lang")
  }

  private val quantileStatsSql =
    """SELECT lang,
      |  round(quantile_cont(n_chars, 0.25), 4) AS q1,
      |  round(quantile_cont(n_chars, 0.5), 4) AS median,
      |  round(quantile_cont(n_chars, 0.75), 4) AS q3,
      |  round(quantile_cont(n_chars, 0.99), 4) AS p99,
      |  COUNT(*) AS n_docs
      |FROM documents GROUP BY lang ORDER BY lang""".stripMargin

  // ------------------------------------------------------------ q_quality_cutoff
  /** Keep only documents at or above their language's p75 length — the
    * aggregate-then-broadcast-back cutoff shape. Emits per-language
    * kept-counts with the threshold applied. */
  private def qualityCutoff(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val docs = Tables.documents(s, dir)
    val thresholds = docs.groupBy($"lang")
      .agg(round(expr("percentile(n_chars, 0.75)"), 4).as("p75"))
    docs.join(broadcast(thresholds), Seq("lang"))
      .filter($"n_chars" >= $"p75")
      .groupBy($"lang")
      .agg(first($"p75").as("p75"), count(lit(1)).as("n_kept"),
        min($"n_chars").as("min_kept_chars"))
      .orderBy($"lang")
  }

  private val qualityCutoffSql =
    """WITH t AS (
      |  SELECT lang, round(quantile_cont(n_chars, 0.75), 4) AS p75
      |  FROM documents GROUP BY lang)
      |SELECT d.lang, MIN(t.p75) AS p75, COUNT(*) AS n_kept,
      |  MIN(d.n_chars) AS min_kept_chars
      |FROM documents d JOIN t USING (lang)
      |WHERE d.n_chars >= t.p75
      |GROUP BY d.lang ORDER BY d.lang""".stripMargin

  // --------------------------------------------------------- q_source_terms
  /** Top-5 most DISCRIMINATIVE words per ingest source — the grouped
    * tf-idf readout a corpus datasheet prints per slice ("what is this
    * source about"): within each source rank words by source-frequency
    * ascending (a word appearing in fewer sources is more distinctive),
    * ties by in-source token count desc then word — the q_rare_terms
    * integer-deterministic recipe lifted from document grain to source
    * grain (for a given tf, tf-idf is monotone in the frequency, so no
    * float score is needed at all).
    *
    * Scale shape: tokens pre-aggregate map-side to (source, word)
    * counts; the source-frequency frame is vocabulary-sized and
    * broadcasts; the top-k window partitions BY SOURCE (never global).
    * >= 4-char words, as in q_rare_terms. */
  private def sourceTerms(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val words = Tables.documents(s, dir)
      .select($"source", explode(split($"text", " ", -1)).as("word"))
      .filter(length($"word") >= 4)
    val tf = words.groupBy($"source", $"word").agg(count(lit(1)).as("tf"))
    val sf = tf.groupBy($"word").agg(count(lit(1)).as("sf"))
    val w = Window.partitionBy($"source")
      .orderBy($"sf".asc, $"tf".desc, $"word".asc)
    tf.join(broadcast(sf), Seq("word"))
      .withColumn("rank", row_number().over(w))
      .filter($"rank" <= 5)
      .select($"source", $"rank", $"word", $"tf", $"sf")
      .orderBy($"source", $"rank")
  }

  private val sourceTermsSql =
    """WITH words AS (
      |  SELECT source, unnest(string_split(text, ' ')) AS word
      |  FROM documents),
      |tf AS (
      |  SELECT source, word, COUNT(*) AS tf FROM words
      |  WHERE length(word) >= 4 GROUP BY source, word),
      |sf AS (SELECT word, COUNT(*) AS sf FROM tf GROUP BY word),
      |r AS (
      |  SELECT t.source, t.word, t.tf, s.sf,
      |    ROW_NUMBER() OVER (PARTITION BY t.source
      |      ORDER BY s.sf ASC, t.tf DESC, t.word ASC) AS rank
      |  FROM tf t JOIN sf s USING (word))
      |SELECT source, rank, word, tf, sf FROM r
      |WHERE rank <= 5 ORDER BY source, rank""".stripMargin

  // --------------------------------------------------------------- q_rare_terms
  /** Top-3 most distinctive words per document: rank by corpus document
    * frequency ascending (rarest first) — the integer-deterministic core
    * of tf-idf (for a given term frequency, tf-idf is monotone in df).
    * Ties break by in-document frequency desc, then word. Restricted to
    * words of >= 4 chars so stopword-ish tokens don't dominate. */
  private def rareTerms(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val words = Tables.documents(s, dir)
      .select($"doc_id", explode(split($"text", " ", -1)).as("word"))
      .filter(length($"word") >= 4)
    val tf = words.groupBy($"doc_id", $"word").agg(count(lit(1)).as("tf"))
    val df = tf.groupBy($"word").agg(count(lit(1)).as("df"))
    val w = Window.partitionBy($"doc_id")
      .orderBy($"df".asc, $"tf".desc, $"word".asc)
    tf.join(broadcast(df), Seq("word"))
      .withColumn("rank", row_number().over(w))
      .filter($"rank" <= 3)
      .select($"doc_id", $"rank", $"word", $"tf", $"df")
      .orderBy($"doc_id", $"rank")
  }

  private val rareTermsSql =
    """WITH words AS (
      |  SELECT doc_id, unnest(string_split(text, ' ')) AS word FROM documents),
      |tf AS (
      |  SELECT doc_id, word, COUNT(*) AS tf FROM words
      |  WHERE length(word) >= 4 GROUP BY 1, 2),
      |df AS (SELECT word, COUNT(*) AS df FROM tf GROUP BY 1),
      |ranked AS (
      |  SELECT tf.doc_id, tf.word, tf.tf, df.df,
      |    row_number() OVER (PARTITION BY tf.doc_id
      |      ORDER BY df.df ASC, tf.tf DESC, tf.word ASC) AS rank
      |  FROM tf JOIN df USING (word))
      |SELECT doc_id, rank, word, tf, df FROM ranked
      |WHERE rank <= 3 ORDER BY doc_id, rank""".stripMargin

  // ----------------------------------------------------------------- q_winsorize
  /** Winsorized per-priority order totals — the robust-aggregate
    * companion to the percentile profile: values are clamped to the
    * [p05, p95] bounds, then re-aggregated, so a handful of outliers
    * can't dominate a group statistic. The bounds are kth-smallest ORDER
    * STATISTICS (row_number over the value sort, k = ceil(n·p)), not
    * interpolated percentiles: an order statistic is an actual data
    * value, so both engines agree bit-exactly with no rounding, and
    * ceil(n·p) comes from the same IEEE product on both sides. Clipped
    * sums route through DECIMAL (Exact rationale) so the re-aggregation
    * is partitioning-invariant.
    *
    * Scale: the exact bound costs one per-group sort — the oracle-exact
    * baseline shape; at billions of rows per group, approx_percentile
    * (mergeable GK sketch, one pass) is the drop-in for the bounds and
    * the clip/re-aggregate stays identical (same exact-vs-approx split
    * q_quantile_stats asserts). */
  private def winsorize(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    import graft.functions.Exact.dsum
    val o = Tables.orders(s, dir)
      .select($"o_orderpriority".as("priority"), $"o_totalprice".as("v"))
    val ws = Window.partitionBy($"priority").orderBy($"v")
    val wn = Window.partitionBy($"priority")
    val ranked = o.select($"priority", $"v",
      row_number().over(ws).as("rn"), count(lit(1)).over(wn).as("n"))
    val bounds = ranked.groupBy($"priority").agg(
      max(when($"rn" === ceil($"n" * 0.05), $"v")).as("lo"),
      max(when($"rn" === ceil($"n" * 0.95), $"v")).as("hi"))
    o.join(broadcast(bounds), Seq("priority"))
      .groupBy($"priority")
      .agg(
        min($"lo").as("lo"), min($"hi").as("hi"),
        sum(when($"v" < $"lo", 1L).otherwise(0L)).as("n_below"),
        sum(when($"v" > $"hi", 1L).otherwise(0L)).as("n_above"),
        count(lit(1)).as("n"),
        dsum(least(greatest($"v", $"lo"), $"hi")).as("winsorized_total"))
      .orderBy($"priority")
  }

  private val winsorizeSql = {
    import graft.functions.Exact.sqlDsum
    s"""WITH o AS (
       |  SELECT o_orderpriority AS priority, o_totalprice AS v FROM orders),
       |ranked AS (
       |  SELECT priority, v,
       |    row_number() OVER (PARTITION BY priority ORDER BY v) AS rn,
       |    COUNT(*) OVER (PARTITION BY priority) AS n
       |  FROM o),
       |bounds AS (
       |  SELECT priority,
       |    MAX(CASE WHEN rn = ceil(n * 0.05) THEN v END) AS lo,
       |    MAX(CASE WHEN rn = ceil(n * 0.95) THEN v END) AS hi
       |  FROM ranked GROUP BY priority)
       |SELECT priority, MIN(lo) AS lo, MIN(hi) AS hi,
       |  CAST(SUM(CASE WHEN v < lo THEN 1 ELSE 0 END) AS BIGINT) AS n_below,
       |  CAST(SUM(CASE WHEN v > hi THEN 1 ELSE 0 END) AS BIGINT) AS n_above,
       |  COUNT(*) AS n,
       |  ${sqlDsum("least(greatest(v, lo), hi)")} AS winsorized_total
       |FROM o JOIN bounds USING (priority)
       |GROUP BY priority ORDER BY priority""".stripMargin
  }

  // --------------------------------------------------------------- q_mad_outliers
  /** Robust outlier detection via Median Absolute Deviation — the
    * break-down-resistant alternative to mean±3σ (one wild value moves a
    * mean; it cannot move a median). Per group: median and MAD as
    * kth-smallest ORDER STATISTICS (the q_winsorize exactness recipe —
    * actual data values, zero interpolation/rounding, bit-stable
    * cross-engine), then count values outside
    * median ± 3 · (1.4826 · MAD), the normal-consistent 3σ-equivalent.
    *
    * The k-th smallest VALUE is well-defined under ties even though
    * row_number's tie order isn't — which is exactly why the bound is an
    * order statistic and not an average-of-middle-two median.
    *
    * Scale: two per-group sorts (values, then deviations) — the
    * oracle-exact baseline; at billions of rows per group the bounds
    * swap to approx_percentile and the flagging pass is unchanged
    * (q_quantile_stats asserts that exact-vs-approx split). */
  /** Kernel: per-group (median, mad, n, n_outliers) for any
    * (group, value) frame. */
  def madProfile(df: DataFrame, groupCol: String, valueCol: String): DataFrame = {
    val g = col(groupCol)
    val o = df.select(g, col(valueCol).as("__v"))
    val wv = Window.partitionBy(g).orderBy(col("__v"))
    val wn = Window.partitionBy(g)
    val med = o.select(g, col("__v"),
        row_number().over(wv).as("__rn"), count(lit(1)).over(wn).as("__n"))
      .groupBy(g)
      .agg(max(when(col("__rn") === ceil(col("__n") * 0.5), col("__v")))
        .as("median"))
    val dev = o.join(broadcast(med), Seq(groupCol))
      .withColumn("__d", abs(col("__v") - col("median")))
    val wd = Window.partitionBy(g).orderBy(col("__d"))
    val mad = dev.select(g, col("__d"),
        row_number().over(wd).as("__rn"), count(lit(1)).over(wn).as("__n"))
      .groupBy(g)
      .agg(max(when(col("__rn") === ceil(col("__n") * 0.5), col("__d")))
        .as("mad"))
    dev.join(broadcast(mad), Seq(groupCol))
      .groupBy(g)
      .agg(
        min(col("median")).as("median"), min(col("mad")).as("mad"),
        count(lit(1)).as("n"),
        sum(when(col("__d") > col("mad") * 4.4478, 1L).otherwise(0L))
          .as("n_outliers"))
  }

  private def madOutliers(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    madProfile(
      Tables.orders(s, dir)
        .select($"o_orderpriority".as("priority"), $"o_totalprice".as("v")),
      "priority", "v")
      .orderBy($"priority")
  }

  private val madOutliersSql =
    """WITH o AS (
      |  SELECT o_orderpriority AS priority, o_totalprice AS v FROM orders),
      |rv AS (
      |  SELECT priority, v,
      |    row_number() OVER (PARTITION BY priority ORDER BY v) AS rn,
      |    COUNT(*) OVER (PARTITION BY priority) AS n
      |  FROM o),
      |med AS (
      |  SELECT priority, MAX(CASE WHEN rn = ceil(n * 0.5) THEN v END) AS median
      |  FROM rv GROUP BY priority),
      |dev AS (
      |  SELECT priority, median, abs(v - median) AS d
      |  FROM o JOIN med USING (priority)),
      |rd AS (
      |  SELECT priority, d,
      |    row_number() OVER (PARTITION BY priority ORDER BY d) AS rn,
      |    COUNT(*) OVER (PARTITION BY priority) AS n
      |  FROM dev),
      |mad AS (
      |  SELECT priority, MAX(CASE WHEN rn = ceil(n * 0.5) THEN d END) AS mad
      |  FROM rd GROUP BY priority)
      |SELECT priority, MIN(median) AS median, MIN(mad) AS mad,
      |  COUNT(*) AS n,
      |  CAST(SUM(CASE WHEN d > mad * 4.4478 THEN 1 ELSE 0 END) AS BIGINT)
      |    AS n_outliers
      |FROM dev JOIN mad USING (priority)
      |GROUP BY priority ORDER BY priority""".stripMargin

  // --------------------------------------------------------------- q_standardize
  /** Per-group feature scaling — z-score and min-max — the featurization
    * step before any learned quality classifier or embedding model sees
    * tabular signals. PARTITIONING-INVARIANT like q_correlation: the
    * per-group moments (n, Σx, Σx²) are exact DECIMAL sums, min/max are
    * exact, and each row's scaled values are then a fixed IEEE sequence
    * (sub, div, sqrt) over bit-identical doubles — reproducible on any
    * cluster layout and in any engine, zero rounding in the oracle.
    *
    * Scale shape: one aggregation keyed by the group (partial map-side
    * combine — five numbers per group cross the wire), then the tiny
    * stats frame broadcast-joins back onto the fact side. The facts are
    * NEVER shuffled: contrast a window formulation, which would move
    * every row to sort it inside its group just to attach group stats. */
  def standardize(df: DataFrame, groupCol: String, valueCol: String,
      scale: Int = 2): DataFrame = {
    import org.apache.spark.sql.functions.broadcast
    val g = col(groupCol)
    val x = col(valueCol)
    val stats = df.groupBy(g).agg(
      count(x).as("__n"),
      graft.functions.Exact.dsum(x, scale).as("__sx"),
      graft.functions.Exact.dsum(x * x, 2 * scale).as("__sxx"),
      min(x).as("__min"),
      max(x).as("__max"))
    val n = col("__n").cast("double")
    val mean = col("__sx") / n
    // sample stddev from exact sufficient statistics
    val sd = sqrt((n * col("__sxx") - col("__sx") * col("__sx")) /
      (n * (n - lit(1.0))))
    df.join(broadcast(stats), groupCol)
      .withColumn("z_score", (x - mean) / sd)
      .withColumn("min_max",
        (x - col("__min")) / (col("__max") - col("__min")))
      .drop("__n", "__sx", "__sxx", "__min", "__max")
  }

  private def standardizeQuery(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    standardize(Tables.customer(s, dir), "c_mktsegment", "c_acctbal")
      .select($"c_custkey", $"c_mktsegment", $"c_acctbal",
        $"z_score", $"min_max")
      .orderBy($"c_custkey")
  }

  private val standardizeSql = {
    import graft.functions.Exact.sqlDsum
    s"""WITH stats AS (
       |  SELECT c_mktsegment, COUNT(c_acctbal) AS n,
       |    ${sqlDsum("c_acctbal")} AS sx,
       |    ${sqlDsum("c_acctbal * c_acctbal", 4)} AS sxx,
       |    MIN(c_acctbal) AS mn, MAX(c_acctbal) AS mx
       |  FROM customer GROUP BY c_mktsegment)
       |SELECT c_custkey, c_mktsegment, c_acctbal,
       |  (c_acctbal - sx / CAST(n AS DOUBLE))
       |    / sqrt((CAST(n AS DOUBLE) * sxx - sx * sx)
       |           / (CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) - 1.0))) AS z_score,
       |  (c_acctbal - mn) / (mx - mn) AS min_max
       |FROM customer JOIN stats USING (c_mktsegment)
       |ORDER BY c_custkey""".stripMargin
  }

  // ------------------------------------------------------------------ q_drift_tvd
  // audited-global-window(q_drift_tvd): frame = shared histogram bucket axis — bound audited in PlanAuditSpec/UnpartitionedWindowAudit
  /** Distribution-drift detection between two eras of the order stream:
    * per price band, era counts and rates, plus the per-band rate gap —
    * the ingredients of total-variation distance (TVD = Σ|p_a - p_b|/2),
    * the drift alarm a long-running ingest pipeline runs on every new
    * batch. INTEGER throughout: counts are longs, rates are ppm via
    * integer DIV against window grand totals, the gap is an absolute
    * difference of ppms — bit-identical on any partitioning and engine
    * (a float KL/PSI would be neither). One scan, one shuffle to ~20
    * band rows; the window totals run over those bands, not the facts. */
  val DriftEraSplit = "1998-07-01"
  val DriftBandWidth = 25000

  private def driftTvd(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.orders(s, dir)
      .groupBy(floor($"o_totalprice" / DriftBandWidth).cast("long").as("band"))
      .agg(
        sum(when($"o_orderdate" < to_timestamp(lit(DriftEraSplit)), 1L)
          .otherwise(0L)).as("n_a"),
        sum(when($"o_orderdate" >= to_timestamp(lit(DriftEraSplit)), 1L)
          .otherwise(0L)).as("n_b"))
      .withColumn("rate_a_ppm", expr("n_a * 1000000 DIV sum(n_a) OVER ()"))
      .withColumn("rate_b_ppm", expr("n_b * 1000000 DIV sum(n_b) OVER ()"))
      .withColumn("gap_ppm", abs($"rate_a_ppm" - $"rate_b_ppm"))
      .orderBy($"band")
  }

  private val driftTvdSql =
    s"""WITH bands AS (
       |  SELECT CAST(floor(o_totalprice / $DriftBandWidth) AS BIGINT) AS band,
       |    CAST(SUM(CASE WHEN o_orderdate < TIMESTAMP '$DriftEraSplit'
       |                  THEN 1 ELSE 0 END) AS BIGINT) AS n_a,
       |    CAST(SUM(CASE WHEN o_orderdate >= TIMESTAMP '$DriftEraSplit'
       |                  THEN 1 ELSE 0 END) AS BIGINT) AS n_b
       |  FROM orders GROUP BY 1)
       |SELECT band, n_a, n_b,
       |  CAST(n_a * 1000000 // SUM(n_a) OVER () AS BIGINT) AS rate_a_ppm,
       |  CAST(n_b * 1000000 // SUM(n_b) OVER () AS BIGINT) AS rate_b_ppm,
       |  CAST(abs(n_a * 1000000 // SUM(n_a) OVER ()
       |         - n_b * 1000000 // SUM(n_b) OVER ()) AS BIGINT) AS gap_ppm
       |FROM bands ORDER BY band""".stripMargin

  // ------------------------------------------------------------ q_code_detect
  /** Heuristic code-vs-prose detection — the corpus-routing signal every
    * LLM data pipeline needs (code goes to the code mix with different
    * dedup/quality rules; prose goes to the text mix). Features are the
    * standard cheap ones: indented-line ratio, code-symbol character
    * ratio, and language-keyword hits; the verdict is a fixed threshold
    * over them. Code documents are PLANTED by id arithmetic (the
    * q_pii_redact precedent — the fixture is pure prose, so a Python-ish
    * snippet is appended to every doc_id % 7 == 0 doc); the detector
    * must flag exactly those 1/7 and nothing else, so both the feature
    * extraction and the thresholds are on the hook in both directions.
    *
    * Exactness: every feature is integer (counts and ppm via integer
    * division); keyword occurrences count via the length-difference
    * trick, engine-portable with zero regex dialect risk.
    *
    * Scale shape: entirely row-local chained string ops inside
    * whole-stage codegen — scan-speed at 100 TB, zero shuffle. */
  private def codeDetect(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    def occurrences(t: org.apache.spark.sql.Column, kw: String) =
      (length(t) - length(replace(t, lit(kw), lit("")))) / kw.length
    val planted = when($"doc_id" % 7 === 0,
      concat($"text", lit("\ndef f"), ($"doc_id" % 10).cast("string"),
        lit("(x):\n    return x + "), ($"doc_id" % 10).cast("string"),
        lit(";"))).otherwise($"text")
    Tables.documents(s, dir)
      .select($"doc_id", planted.as("t"))
      .select($"doc_id",
        size(split($"t", "\n", -1)).cast("long").as("n_lines"),
        size(filter(split($"t", "\n", -1),
          l => l.startsWith("    ") || l.startsWith("\t")))
          .cast("long").as("indent_lines"),
        (length($"t") -
          length(regexp_replace($"t", "[{}();=<>\\[\\]]", "")))
          .cast("long").as("sym_chars"),
        length($"t").cast("long").as("n_chars"),
        (occurrences($"t", "def ") + occurrences($"t", "return") +
          occurrences($"t", "import ")).cast("long").as("kw_hits"))
      .select($"doc_id", $"n_lines", $"indent_lines", $"sym_chars",
        $"kw_hits",
        expr("indent_lines * 1000000 DIV n_lines").as("indent_ppm"),
        expr("sym_chars * 1000000 DIV n_chars").as("sym_ppm"))
      .withColumn("is_code",
        $"kw_hits" > 0 && ($"indent_ppm" > 100000 || $"sym_ppm" > 5000))
      .orderBy($"doc_id")
  }

  private val codeDetectSql =
    """WITH d AS (
      |  SELECT doc_id, CASE WHEN doc_id % 7 = 0 THEN
      |    text || chr(10) || 'def f' || CAST(doc_id % 10 AS VARCHAR)
      |      || '(x):' || chr(10) || '    return x + '
      |      || CAST(doc_id % 10 AS VARCHAR) || ';'
      |    ELSE text END AS t
      |  FROM documents),
      |f AS (
      |  SELECT doc_id,
      |    CAST(len(split(t, chr(10))) AS BIGINT) AS n_lines,
      |    CAST(len(list_filter(split(t, chr(10)),
      |      l -> l LIKE '    %' OR l LIKE chr(9) || '%')) AS BIGINT)
      |      AS indent_lines,
      |    CAST(length(t) - length(regexp_replace(t, '[{}();=<>\[\]]', '',
      |      'g')) AS BIGINT) AS sym_chars,
      |    CAST(length(t) AS BIGINT) AS n_chars,
      |    CAST((length(t) - length(replace(t, 'def ', ''))) // 4
      |      + (length(t) - length(replace(t, 'return', ''))) // 6
      |      + (length(t) - length(replace(t, 'import ', ''))) // 7
      |      AS BIGINT) AS kw_hits
      |  FROM d)
      |SELECT doc_id, n_lines, indent_lines, sym_chars, kw_hits,
      |  indent_lines * 1000000 // n_lines AS indent_ppm,
      |  sym_chars * 1000000 // n_chars AS sym_ppm,
      |  kw_hits > 0 AND (indent_lines * 1000000 // n_lines > 100000
      |    OR sym_chars * 1000000 // n_chars > 5000) AS is_code
      |FROM f ORDER BY doc_id""".stripMargin

  // --------------------------------------------------------- q_quantile_approx
  /** Driver-visible gate for the APPROX percentile path — the mergeable
    * sketch that replaces exact per-group percentiles at corpus scale
    * (exact state is the group's whole value multiset; the GK sketch is
    * bounded-memory and partial-aggregates map-side). The claim that
    * matters is the rank-error contract, so the query emits per-language
    * BOOLEANS: the approx p50/p99 of doc length must lie inside the
    * exact value band at p ± 5pp — a conservative envelope over the
    * rank-error contract (≤ n/accuracy = 1% of ranks) that stays robust
    * where interpolated band-edge values and discrete element ranks
    * disagree by one position (observed at the tighter ±1% band).
    * Expected answer is TRUE everywhere — any sketch regression becomes
    * a hash mismatch (the q_fingerprint recipe). Raw approx values stay
    * spec-covered (QualitySpec within-epsilon assertion). */
  private def quantileApprox(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.documents(s, dir)
      .groupBy($"lang")
      .agg(
        expr("approx_percentile(n_chars, array(0.5D, 0.99D), 100)").as("ap"),
        expr("percentile(n_chars, array(0.45D, 0.55D, 0.94D, 1.0D))").as("ex"))
      .select($"lang",
        ($"ap".getItem(0) >= $"ex".getItem(0) &&
          $"ap".getItem(0) <= $"ex".getItem(1)).as("p50_in_rank_band"),
        ($"ap".getItem(1) >= $"ex".getItem(2) &&
          $"ap".getItem(1) <= $"ex".getItem(3)).as("p99_in_rank_band"))
      .orderBy($"lang")
  }

  private val quantileApproxSql =
    """SELECT lang, TRUE AS p50_in_rank_band, TRUE AS p99_in_rank_band
      |FROM (SELECT DISTINCT lang FROM documents) ORDER BY lang""".stripMargin

  // ------------------------------------------------------------------ q_gini
  /** Per-source Gini impurity of the language mix — the label-purity
    * statistic a corpus-routing pipeline tracks per ingest source: a
    * source whose documents are all one language scores 0; a uniform
    * 5-language source scores 800000 ppm (1 − 5·(1/5)²). Gini is used
    * here (not entropy) deliberately: it is a RATIONAL function of the
    * counts, so integer ppm quantization (`1e6 − 1e6·Σc² DIV n²`) is
    * exact and bit-identical cross-engine — an entropy would drag in
    * logarithms and float merge order.
    *
    * Scale shape: one keyed aggregation to (source, lang) counts with
    * map-side partials, then a per-source rollup of those tiny rows —
    * nothing corpus-sized survives the first shuffle. */
  private def giniQuery(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.documents(s, dir)
      .groupBy($"source", $"lang").agg(count(lit(1)).as("c"))
      .groupBy($"source")
      .agg(sum($"c").as("n_docs"), count(lit(1)).as("n_langs"),
        sum($"c" * $"c").as("ssq"), max($"c").as("cmax"))
      .select($"source", $"n_docs", $"n_langs",
        (lit(1000000L) - expr("ssq * 1000000 DIV (n_docs * n_docs)"))
          .as("gini_ppm"),
        expr("cmax * 1000000 DIV n_docs").as("majority_ppm"))
      .orderBy($"source")
  }

  private val giniSql =
    """WITH c AS (
      |  SELECT source, lang, COUNT(*) AS c FROM documents GROUP BY 1, 2),
      |g AS (
      |  SELECT source, CAST(SUM(c) AS BIGINT) AS n_docs,
      |    COUNT(*) AS n_langs, CAST(SUM(c * c) AS BIGINT) AS ssq,
      |    CAST(MAX(c) AS BIGINT) AS cmax
      |  FROM c GROUP BY source)
      |SELECT source, n_docs, n_langs,
      |  1000000 - ssq * 1000000 // (n_docs * n_docs) AS gini_ppm,
      |  cmax * 1000000 // n_docs AS majority_ppm
      |FROM g ORDER BY source""".stripMargin

  // --------------------------------------------------------------- q_ks_test
  // audited-global-window(q_ks_test): frame = metric-value grid (capped doc metrics) — bound audited in PlanAuditSpec/UnpartitionedWindowAudit
  // audited-bnlj(q_ks_test): build side = 1-row global-aggregate broadcast — audited in PlanAuditSpec/BnljAudit
  /** Two-sample Kolmogorov–Smirnov statistic between the length
    * distributions of two sources (lexicographic min vs max) — the
    * order-statistic drift test that complements q_drift_tvd's binned
    * TVD: KS needs no bin choice and is sensitive to location shifts
    * the equal-width bands can smear. EXACT: D = max|F_a − F_b| is
    * evaluated as max|cum_a·m − cum_b·n| over the distinct values — an
    * integer numerator over the implicit denominator n·m, so the
    * statistic is bit-identical on any partitioning (the float CDF
    * subtraction never happens).
    *
    * Scale shape: one keyed aggregation to per-distinct-value counts
    * (map-side partials; distinct lengths are bounded by the length
    * cap, not the corpus), then the running sums over that small frame.
    * The un-partitioned window is over distinct VALUES only — for a
    * continuous measure one would pre-quantize to a fixed grid first,
    * same plan shape. */
  private def ksTest(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val docs = Tables.documents(s, dir)
    val ab = docs.agg(min($"source").as("sa"), max($"source").as("sb"))
    val perX = docs.crossJoin(broadcast(ab))
      .filter($"source" === $"sa" || $"source" === $"sb")
      .groupBy($"sa", $"sb", $"n_chars".as("x"))
      .agg(
        sum(when($"source" === $"sa", 1L).otherwise(0L)).as("ca"),
        sum(when($"source" === $"sb", 1L).otherwise(0L)).as("cb"))
    val wCum = Window.orderBy($"x")
    val wAll = Window.partitionBy()
    perX
      .withColumn("cum_a", sum($"ca").over(wCum))
      .withColumn("cum_b", sum($"cb").over(wCum))
      .withColumn("n_a", sum($"ca").over(wAll))
      .withColumn("n_b", sum($"cb").over(wAll))
      .groupBy($"sa".as("src_a"), $"sb".as("src_b"))
      .agg(max($"n_a").as("n_a"), max($"n_b").as("n_b"),
        max(abs($"cum_a" * $"n_b" - $"cum_b" * $"n_a")).as("d_num"))
      .select($"src_a", $"src_b", $"n_a", $"n_b", $"d_num",
        expr("d_num * 1000000 DIV (n_a * n_b)").as("d_ppm"))
  }

  private val ksTestSql =
    """WITH ab AS (
      |  SELECT MIN(source) AS sa, MAX(source) AS sb FROM documents),
      |x AS (
      |  SELECT sa, sb, n_chars AS x,
      |    CAST(SUM(CASE WHEN source = sa THEN 1 ELSE 0 END) AS BIGINT) AS ca,
      |    CAST(SUM(CASE WHEN source = sb THEN 1 ELSE 0 END) AS BIGINT) AS cb
      |  FROM documents, ab WHERE source IN (sa, sb) GROUP BY 1, 2, 3),
      |c AS (
      |  SELECT sa, sb,
      |    CAST(SUM(ca) OVER (ORDER BY x) AS BIGINT) AS cum_a,
      |    CAST(SUM(cb) OVER (ORDER BY x) AS BIGINT) AS cum_b,
      |    CAST(SUM(ca) OVER () AS BIGINT) AS n_a,
      |    CAST(SUM(cb) OVER () AS BIGINT) AS n_b
      |  FROM x)
      |SELECT sa AS src_a, sb AS src_b, MAX(n_a) AS n_a, MAX(n_b) AS n_b,
      |  MAX(abs(cum_a * n_b - cum_b * n_a)) AS d_num,
      |  MAX(abs(cum_a * n_b - cum_b * n_a)) * 1000000
      |    // (MAX(n_a) * MAX(n_b)) AS d_ppm
      |FROM c GROUP BY sa, sb""".stripMargin

  // ----------------------------------------------------------- q_pareto_front
  /** Pareto-frontier (skyline) data selection per language: the
    * documents not dominated on (length, quality) — the shape used to
    * pick "longest at each quality level" exemplars without a scalar
    * trade-off weight. Quality is a planted md5 score (q_pii_redact
    * precedent) so the frontier is engine-replayable. Dominance: a
    * beats b iff ≥ on both axes and > on at least one; equal points
    * don't dominate each other, so duplicated frontier coordinates all
    * survive (exercised by the plant: 1000 quality levels over ~300
    * lengths force same-x collisions).
    *
    * Scale shape: the classic O(n²) NOT-EXISTS skyline is replaced by
    * the sort-scan identity — a point is on the 2-D frontier iff its
    * quality equals the max at its length AND strictly exceeds the
    * running max over all greater lengths. One per-(lang, x) pre-agg
    * (map-side partials) shrinks the window input to distinct lengths,
    * then one windowed scan per lang; the corpus joins back by
    * broadcast against the tiny frontier frame. */
  private def paretoFront(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val pts = Tables.documents(s, dir)
      .select($"doc_id", $"lang", $"n_chars",
        (graft.functions.TextFunctions
          .md5Lower64(concat(lit("pq:"), $"doc_id".cast("string")))
          .bitwiseAND(lit(Long.MaxValue)) % 1000).as("quality"))
    val perX = pts.groupBy($"lang", $"n_chars").agg(max($"quality").as("ymax"))
    val wPrev = Window.partitionBy($"lang").orderBy($"n_chars".desc)
      .rowsBetween(Window.unboundedPreceding, -1)
    val sky = perX
      .withColumn("cm_prev", max($"ymax").over(wPrev))
      .filter($"ymax" > coalesce($"cm_prev", lit(-1L)))
      .select($"lang".as("s_lang"), $"n_chars".as("s_x"), $"ymax")
    pts.join(broadcast(sky),
        $"lang" === $"s_lang" && $"n_chars" === $"s_x" &&
          $"quality" === $"ymax")
      .select($"doc_id", $"lang", $"n_chars", $"quality")
      .orderBy($"lang", $"n_chars", $"doc_id")
  }

  private val paretoFrontSql =
    """WITH pts AS (
      |  SELECT doc_id, lang, n_chars,
      |    CAST(md5_number_lower('pq:' || CAST(doc_id AS VARCHAR))
      |      & 9223372036854775807::UBIGINT AS BIGINT) % 1000 AS quality
      |  FROM documents),
      |perx AS (
      |  SELECT lang, n_chars, MAX(quality) AS ymax
      |  FROM pts GROUP BY 1, 2),
      |sky AS (
      |  SELECT lang, n_chars, ymax,
      |    MAX(ymax) OVER (PARTITION BY lang ORDER BY n_chars DESC
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS cm_prev
      |  FROM perx)
      |SELECT p.doc_id, p.lang, p.n_chars, p.quality
      |FROM pts p JOIN sky s
      |  ON p.lang = s.lang AND p.n_chars = s.n_chars AND p.quality = s.ymax
      |WHERE s.ymax > COALESCE(s.cm_prev, -1)
      |ORDER BY p.lang, p.n_chars, p.doc_id""".stripMargin

  // ------------------------------------------------------------- q_readability
  /** Flesch reading-ease scoring in exact integer milli-points — the
    * classic readability family (Flesch 1948) with the syllable counter
    * replaced by the standard vowel-group heuristic (maximal [aeiouy]
    * runs), the same proxy rule-based readability libraries use. All
    * three inputs are integer counts from one regex pass each, and the
    * score 206.835 − 1.015·(W/S) − 84.6·(Syll/W) is quantized as
    * 206835 − (1015·W) DIV S − (84600·Syll) DIV W with every division
    * operand positive, so truncating DIV agrees bit-exactly across
    * engines (the q_lm_surprisal integer-quantization recipe).
    *
    * Scale shape: row-local (three codegen'd regex passes per document,
    * no shuffle) — at 100 TB this runs at scan speed and composes into
    * the q_llm_corpus funnel as one more per-doc signal. */
  private def readability(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val words = size(split($"text", " ", -1))
    val sents =
      greatest(size(regexp_extract_all($"text", lit("[.!?]+"), lit(0))), lit(1))
    val syll = greatest(
      size(regexp_extract_all(lower($"text"), lit("[aeiouy]+"), lit(0))), lit(1))
    Tables.documents(s, dir)
      .select($"doc_id", $"lang",
        words.as("n_words"), sents.as("n_sents"), syll.as("n_syll"))
      .select($"doc_id", $"lang", $"n_words", $"n_sents", $"n_syll",
        (lit(206835L) - expr("(1015 * CAST(n_words AS BIGINT)) DIV n_sents")
          - expr("(84600 * CAST(n_syll AS BIGINT)) DIV n_words"))
          .as("flesch_milli"))
      .withColumn("band",
        when($"flesch_milli" >= 60000L, "easy")
          .when($"flesch_milli" >= 30000L, "medium")
          .otherwise("hard"))
      .orderBy($"doc_id")
  }

  private val readabilitySql =
    """WITH c AS (
      |  SELECT doc_id, lang,
      |    len(string_split(text, ' ')) AS n_words,
      |    GREATEST(len(regexp_extract_all(text, '[.!?]+')), 1) AS n_sents,
      |    GREATEST(len(regexp_extract_all(lower(text), '[aeiouy]+')), 1)
      |      AS n_syll
      |  FROM documents),
      |f AS (
      |  SELECT doc_id, lang, n_words, n_sents, n_syll,
      |    206835 - (1015 * CAST(n_words AS BIGINT)) // n_sents
      |           - (84600 * CAST(n_syll AS BIGINT)) // n_words AS flesch_milli
      |  FROM c)
      |SELECT doc_id, lang, n_words, n_sents, n_syll, flesch_milli,
      |  CASE WHEN flesch_milli >= 60000 THEN 'easy'
      |       WHEN flesch_milli >= 30000 THEN 'medium'
      |       ELSE 'hard' END AS band
      |FROM f ORDER BY doc_id""".stripMargin

  // ------------------------------------------------------------ q_mann_whitney
  // audited-bnlj(q_mann_whitney): build side = 1-row global-aggregate broadcast — audited in PlanAuditSpec/BnljAudit
  /** Mann–Whitney U between every source pair's length distributions —
    * the nonparametric two-sample test (does source A stochastically
    * dominate source B?) that complements q_ks_test's sup-norm drift
    * statistic. Instead of per-pair re-ranking, U is computed from the
    * pairwise-comparison identity U = #{x>y} + ½#{x=y} over the two
    * sources' VALUE HISTOGRAMS, kept in doubled units (u2 = 2U) so ties
    * stay integer-exact. Effect size is the common-language statistic
    * u2 / (2·n_a·n_b) in exact ppm.
    *
    * Scale shape: the corpus reduces to per-source value histograms in
    * one map-side-partial aggregation (value-grid sized); the pair
    * computation is a broadcast inequality join between histogram
    * frames. n_a·n_b stays in a long up to ~2·10⁹ docs per source —
    * beyond that, route u2 through DECIMAL (the q_winsorize recipe). */
  private def mannWhitney(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val hist = Tables.documents(s, dir)
      .groupBy($"source", $"n_chars").agg(count(lit(1)).as("c"))
    val sizes = hist.groupBy($"source").agg(sum($"c").cast("long").as("n"))
    val a = hist.select($"source".as("src_a"), $"n_chars".as("va"), $"c".as("ca"))
    val b = hist.select($"source".as("src_b"), $"n_chars".as("vb"), $"c".as("cb"))
    val u2 = a.join(broadcast(b),
        $"src_a" < $"src_b" && $"va" >= $"vb")
      .select($"src_a", $"src_b",
        (when($"va" > $"vb", lit(2L)).otherwise(lit(1L)) * $"ca" * $"cb")
          .as("contrib"))
      .groupBy($"src_a", $"src_b").agg(sum($"contrib").as("u2"))
    u2
      .join(broadcast(sizes.select($"source".as("src_a"), $"n".as("n_a"))),
        Seq("src_a"))
      .join(broadcast(sizes.select($"source".as("src_b"), $"n".as("n_b"))),
        Seq("src_b"))
      .select($"src_a", $"src_b", $"n_a", $"n_b", $"u2",
        expr("u2 * 1000000 DIV (2 * n_a * n_b)").as("effect_ppm"))
      .orderBy($"src_a", $"src_b")
  }

  private val mannWhitneySql =
    """WITH hist AS (
      |  SELECT source, n_chars, COUNT(*) AS c
      |  FROM documents GROUP BY 1, 2),
      |sz AS (SELECT source, CAST(SUM(c) AS BIGINT) AS n
      |       FROM hist GROUP BY 1),
      |u AS (
      |  SELECT a.source AS src_a, b.source AS src_b,
      |    CAST(SUM((CASE WHEN a.n_chars > b.n_chars THEN 2 ELSE 1 END)
      |        * a.c * b.c) AS BIGINT) AS u2
      |  FROM hist a JOIN hist b
      |    ON a.source < b.source AND a.n_chars >= b.n_chars
      |  GROUP BY 1, 2)
      |SELECT src_a, src_b, sa.n AS n_a, sb.n AS n_b, u2,
      |  u2 * 1000000 // (2 * sa.n * sb.n) AS effect_ppm
      |FROM u
      |JOIN sz sa ON u.src_a = sa.source
      |JOIN sz sb ON u.src_b = sb.source
      |ORDER BY src_a, src_b""".stripMargin

  // --------------------------------------------------------- q_weighted_median
  /** Weighted median of unit price per return flag, weighted by
    * quantity — the order statistic that answers "at what price does
    * half the VOLUME sit?" (a plain median weights a 1-unit line equal
    * to a 50-unit line). Prices route through exact DECIMAL cents; the
    * median is the smallest price whose doubled cumulative weight
    * reaches the group total (lower weighted median — a pure order
    * statistic, zero interpolation, so the oracle needs zero rounding).
    *
    * Scale shape: pre-aggregate to (group, price-cents) collapsing ties
    * map-side — the cumulative window then runs on the distinct-price
    * grid, not the fact table; per-task window state is one group's
    * grid slice. */
  private def weightedMedian(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val grid = Tables.lineitem(s, dir)
      .select($"l_returnflag",
        ($"l_extendedprice".cast(DecimalType(18, 2)) * 100)
          .cast("long").as("price_cents"),
        $"l_quantity".cast("long").as("w"))
      .groupBy($"l_returnflag", $"price_cents").agg(sum($"w").as("w"))
    val wOrd = Window.partitionBy($"l_returnflag").orderBy($"price_cents")
    val wAll = Window.partitionBy($"l_returnflag")
    grid
      .withColumn("cumw", sum($"w").over(wOrd))
      .withColumn("total_w", sum($"w").over(wAll))
      .filter($"cumw" * 2 >= $"total_w")
      .groupBy($"l_returnflag")
      .agg(min($"price_cents").as("median_cents"),
        max($"total_w").as("total_qty"))
      .orderBy($"l_returnflag")
  }

  private val weightedMedianSql =
    """WITH grid AS (
      |  SELECT l_returnflag,
      |    CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT)
      |      AS price_cents,
      |    CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS w
      |  FROM lineitem GROUP BY 1, 2),
      |c AS (
      |  SELECT l_returnflag, price_cents,
      |    CAST(SUM(w) OVER (PARTITION BY l_returnflag ORDER BY price_cents)
      |      AS BIGINT) AS cumw,
      |    CAST(SUM(w) OVER (PARTITION BY l_returnflag) AS BIGINT) AS total_w
      |  FROM grid)
      |SELECT l_returnflag, MIN(price_cents) AS median_cents,
      |  MAX(total_w) AS total_qty
      |FROM c WHERE cumw * 2 >= total_w
      |GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin

  // --------------------------------------------------------------- q_spearman
  // audited-global-window(q_spearman): frame = value grid (mann-whitney fallback documented) — bound audited in PlanAuditSpec/UnpartitionedWindowAudit
  /** Spearman rank correlation between per-customer order count and
    * total spend — the monotone-association statistic that is robust to
    * the heavy-tailed spend distribution a Pearson r is distorted by.
    * Ties use AVERAGE ranks kept in DOUBLED units (the q_mann_whitney
    * trick): for value v, 2·avgrank(v) = 2·cum_below(v) + cnt(v) + 1 —
    * an exact integer derived from the VALUE HISTOGRAM, so no global
    * row ranking ever happens. Sufficient statistics (Σr2x·r2y, Σr2x²,
    * Σr2y²) are exact integer sums routed through DECIMAL(19)×DECIMAL(19)
    * products, partitioning-invariant at any n; the final rho is one
    * fixed double sequence rounded to 9dp (the q_assortativity recipe).
    *
    * Scale shape: one fact aggregation to the per-customer frame, two
    * histogram aggregations (value-grid sized), cumulative windows over
    * the DISTINCT-VALUE frames only (for a grid too large even for
    * that, the mann-whitney histogram inequality-join spelling of the
    * rank sum is the drop-in), then broadcast rank maps joined back and
    * one global map-side-partial aggregate. */
  private def spearman(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val per = Tables.orders(s, dir)
      .groupBy($"o_custkey")
      .agg(count(lit(1)).as("x"),
        (sum($"o_totalprice".cast(DecimalType(28, 2))) * 100)
          .cast("long").as("y"))
    def rank2(df: DataFrame, v: String): DataFrame = {
      val w = Window.orderBy(col(v))
      df.groupBy(col(v)).agg(count(lit(1)).as("cnt"))
        .withColumn("cum", sum($"cnt").over(w))
        .select(col(v), ($"cum" * 2 - $"cnt" + 1).as(s"r2$v"))
    }
    val ranked = per
      .join(broadcast(rank2(per, "x")), Seq("x"))
      .join(broadcast(rank2(per, "y")), Seq("y"))
    val d19 = DecimalType(19, 0)
    val stats = ranked.agg(
      count(lit(1)).as("n"),
      sum($"r2x".cast(d19) * $"r2y".cast(d19)).as("sxy"),
      sum($"r2x".cast(d19) * $"r2x".cast(d19)).as("sxx"),
      sum($"r2y".cast(d19) * $"r2y".cast(d19)).as("syy"),
      sum($"r2x".cast(d19)).as("sx"), sum($"r2y".cast(d19)).as("sy"))
    val nd = col("n").cast("double")
    val Seq(sx, sy, sxy, sxx, syy) =
      Seq("sx", "sy", "sxy", "sxx", "syy").map(c => col(c).cast("double"))
    // doubled ranks are ≤ 2n, so Σr2² ≤ 4n³ fits a BIGINT to n ≈ 1.3e6
    // groups — past that, emit the DECIMAL sums as exact strings (the
    // q_acf recipe); the fixture's group grids stay far below the bound
    stats.select($"n", $"sxy".cast("long").as("sxy"),
      $"sxx".cast("long").as("sxx"),
      $"syy".cast("long").as("syy"),
      round((nd * sxy - sx * sy) /
        (sqrt(nd * sxx - sx * sx) * sqrt(nd * syy - sy * sy)), 9)
        .as("spearman_rho"))
  }

  private val spearmanSql =
    """WITH per AS (
      |  SELECT o_custkey, CAST(COUNT(*) AS BIGINT) AS x,
      |    CAST(SUM(CAST(o_totalprice AS DECIMAL(28,2))) * 100 AS BIGINT) AS y
      |  FROM orders GROUP BY 1),
      |rx AS (
      |  SELECT x, 2 * SUM(cnt) OVER (ORDER BY x) - cnt + 1 AS r2x
      |  FROM (SELECT x, CAST(COUNT(*) AS BIGINT) AS cnt FROM per GROUP BY 1)),
      |ry AS (
      |  SELECT y, 2 * SUM(cnt) OVER (ORDER BY y) - cnt + 1 AS r2y
      |  FROM (SELECT y, CAST(COUNT(*) AS BIGINT) AS cnt FROM per GROUP BY 1)),
      |ranked AS (
      |  SELECT r2x, r2y FROM per JOIN rx USING (x) JOIN ry USING (y)),
      |t AS (
      |  SELECT COUNT(*) AS n,
      |    SUM(CAST(r2x AS DECIMAL(19,0)) * CAST(r2y AS DECIMAL(19,0))) AS sxy,
      |    SUM(CAST(r2x AS DECIMAL(19,0)) * CAST(r2x AS DECIMAL(19,0))) AS sxx,
      |    SUM(CAST(r2y AS DECIMAL(19,0)) * CAST(r2y AS DECIMAL(19,0))) AS syy,
      |    SUM(CAST(r2x AS DECIMAL(19,0))) AS sx,
      |    SUM(CAST(r2y AS DECIMAL(19,0))) AS sy
      |  FROM ranked)
      |SELECT n, CAST(sxy AS BIGINT) AS sxy,
      |  CAST(sxx AS BIGINT) AS sxx, CAST(syy AS BIGINT) AS syy,
      |  round((CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
      |      - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
      |    / (sqrt(CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
      |        - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
      |       * sqrt(CAST(n AS DOUBLE) * CAST(syy AS DOUBLE)
      |        - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE))), 9) AS spearman_rho
      |FROM t""".stripMargin

  // ------------------------------------------------------------------ q_simpson
  /** Simpson diversity per source over the language mix — the
    * "probability two random docs differ" companion to q_gini's
    * impurity: D = 1 − Σ c·(c−1) / (n·(n−1)) uses the UNBIASED
    * small-sample form (sampling without replacement), so unlike gini's
    * plug-in Σ(c/n)² it is exact for tiny sources and the two statistics
    * genuinely differ (a 1-doc lang adds zero to Simpson's numerator but
    * not gini's). Rational in the counts → exact integer ppm, no
    * entropy logs (the q_gini design note).
    *
    * Scale shape: identical to q_gini — one keyed aggregation to
    * (source, lang) counts, then a per-source rollup of tiny rows. */
  private def simpson(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.documents(s, dir)
      .groupBy($"source", $"lang").agg(count(lit(1)).as("c"))
      .groupBy($"source")
      .agg(sum($"c").as("n_docs"), count(lit(1)).as("n_langs"),
        sum($"c" * ($"c" - 1)).as("pairs_same"))
      .filter($"n_docs" >= 2)
      .select($"source", $"n_docs", $"n_langs",
        (lit(1000000L) -
          expr("pairs_same * 1000000 DIV (n_docs * (n_docs - 1))"))
          .as("simpson_ppm"))
      .orderBy($"source")
  }

  private val simpsonSql =
    """WITH c AS (
      |  SELECT source, lang, COUNT(*) AS c FROM documents GROUP BY 1, 2),
      |g AS (
      |  SELECT source, CAST(SUM(c) AS BIGINT) AS n_docs,
      |    COUNT(*) AS n_langs,
      |    CAST(SUM(c * (c - 1)) AS BIGINT) AS pairs_same
      |  FROM c GROUP BY source)
      |SELECT source, n_docs, n_langs,
      |  1000000 - pairs_same * 1000000 // (n_docs * (n_docs - 1))
      |    AS simpson_ppm
      |FROM g WHERE n_docs >= 2 ORDER BY source""".stripMargin

  // --------------------------------------------------------- q_quantile_transform
  // audited-global-window(q_quantile_transform): frame = metric-value grid — bound audited in PlanAuditSpec/UnpartitionedWindowAudit
  /** Quantile (rank) transform of document length — the feature scaling
    * that makes any heavy-tailed feature uniform on [0, 1] (here ppm):
    * q(v) = cum_below(v) / n, derived from the VALUE HISTOGRAM exactly
    * like q_spearman's ranks (ties share one quantile, no per-row
    * ranking, no interpolation). Completes the scaling family:
    * q_standardize (z-score), q_winsorize (clamp), this (rank).
    *
    * Scale shape: one histogram aggregation (value-grid sized), the
    * cumulative window over the grid only, a broadcast map-back onto
    * the corpus scan. */
  private def quantileTransform(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val hist = Tables.documents(s, dir)
      .groupBy($"n_chars").agg(count(lit(1)).as("cnt"))
      .withColumn("cum", sum($"cnt").over(Window.orderBy($"n_chars")))
      .withColumn("n", sum($"cnt").over(Window.partitionBy()))
      .select($"n_chars", expr("(cum - cnt) * 1000000 DIV n").as("q_ppm"))
    Tables.documents(s, dir)
      .join(broadcast(hist), Seq("n_chars"))
      .select($"doc_id", $"n_chars", $"q_ppm")
      .orderBy($"doc_id")
  }

  private val quantileTransformSql =
    """WITH hist AS (
      |  SELECT n_chars,
      |    CAST(((SUM(cnt) OVER (ORDER BY n_chars)) - cnt) * 1000000
      |      // (SUM(cnt) OVER ()) AS BIGINT) AS q_ppm
      |  FROM (SELECT n_chars, CAST(COUNT(*) AS BIGINT) AS cnt
      |        FROM documents GROUP BY 1))
      |SELECT d.doc_id, d.n_chars, h.q_ppm
      |FROM documents d JOIN hist h USING (n_chars)
      |ORDER BY d.doc_id""".stripMargin

  // ---------------------------------------------------------------- q_iqr_fences
  /** Tukey IQR outlier fences per market segment over customer spend —
    * the box-plot rule (q1 − 1.5·IQR, q3 + 1.5·IQR) next to
    * q_mad_outliers' MAD rule. Quartiles are EXACT lower order
    * statistics off the per-segment value histogram (smallest v with
    * 4·cum ≥ k·n — no interpolation, deterministic under ties), and
    * 1.5·IQR is spelled iqr + iqr DIV 2 so the fence is an exact
    * integer on both engines. Flagged counts come from one broadcast
    * join of the 5-row fence frame back onto the per-customer spend.
    *
    * Scale shape: one fact aggregation to per-(segment, customer)
    * cents; histogram + cumulative windows on the per-segment value
    * grids; one fences-sized broadcast join and rollup. */
  private def iqrFences(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val per = Tables.orders(s, dir)
      .join(broadcast(Tables.customer(s, dir)
        .select($"c_custkey", $"c_mktsegment")), $"o_custkey" === $"c_custkey")
      .groupBy($"c_mktsegment", $"o_custkey")
      .agg((sum($"o_totalprice".cast(DecimalType(28, 2))) * 100)
        .cast("long").as("cents"))
      // two consumers (fence derivation, outlier count) — materialize
      // the customers-sized frame once (the q_price_index recipe)
      .lineageCut(true)
    val hist = per.groupBy($"c_mktsegment", $"cents")
      .agg(count(lit(1)).as("cnt"))
      .withColumn("cum", sum($"cnt").over(
        Window.partitionBy($"c_mktsegment").orderBy($"cents")))
      .withColumn("n", sum($"cnt").over(Window.partitionBy($"c_mktsegment")))
    def orderStat(mult: Int, of: Int): Column =
      min(when($"cum" * of >= $"n" * mult, $"cents"))
    val fences = hist.groupBy($"c_mktsegment")
      .agg(max($"n").as("n_customers"),
        orderStat(1, 4).as("q1"), orderStat(2, 4).as("q2"),
        orderStat(3, 4).as("q3"))
      .withColumn("iqr", $"q3" - $"q1")
      .withColumn("lo", $"q1" - ($"iqr" + expr("iqr DIV 2")))
      .withColumn("hi", $"q3" + ($"iqr" + expr("iqr DIV 2")))
    per.join(broadcast(fences), Seq("c_mktsegment"))
      .groupBy($"c_mktsegment")
      .agg(max($"n_customers").as("n_customers"),
        max($"q1").as("q1"), max($"q2").as("q2"), max($"q3").as("q3"),
        max($"lo").as("fence_lo"), max($"hi").as("fence_hi"),
        sum(when($"cents" < $"lo" || $"cents" > $"hi", 1L).otherwise(0L))
          .as("n_outliers"))
      .orderBy($"c_mktsegment")
  }

  private val iqrFencesSql =
    """WITH per AS (
      |  SELECT c_mktsegment, o_custkey,
      |    CAST(SUM(CAST(o_totalprice AS DECIMAL(28,2))) * 100 AS BIGINT)
      |      AS cents
      |  FROM orders JOIN customer ON o_custkey = c_custkey
      |  GROUP BY 1, 2),
      |hist AS (
      |  SELECT c_mktsegment, cents,
      |    CAST(SUM(cnt) OVER (PARTITION BY c_mktsegment ORDER BY cents)
      |      AS BIGINT) AS cum,
      |    CAST(SUM(cnt) OVER (PARTITION BY c_mktsegment) AS BIGINT) AS n
      |  FROM (SELECT c_mktsegment, cents, CAST(COUNT(*) AS BIGINT) AS cnt
      |        FROM per GROUP BY 1, 2)),
      |f AS (
      |  SELECT c_mktsegment, MAX(n) AS n_customers,
      |    MIN(CASE WHEN cum * 4 >= n THEN cents END) AS q1,
      |    MIN(CASE WHEN cum * 2 >= n THEN cents END) AS q2,
      |    MIN(CASE WHEN cum * 4 >= n * 3 THEN cents END) AS q3
      |  FROM hist GROUP BY 1),
      |f2 AS (
      |  SELECT *, q3 - q1 AS iqr,
      |    q1 - ((q3 - q1) + (q3 - q1) // 2) AS lo,
      |    q3 + ((q3 - q1) + (q3 - q1) // 2) AS hi
      |  FROM f)
      |SELECT per.c_mktsegment, MAX(n_customers) AS n_customers,
      |  MAX(q1) AS q1, MAX(q2) AS q2, MAX(q3) AS q3,
      |  MAX(lo) AS fence_lo, MAX(hi) AS fence_hi,
      |  CAST(SUM(CASE WHEN cents < lo OR cents > hi THEN 1 ELSE 0 END)
      |    AS BIGINT) AS n_outliers
      |FROM per JOIN f2 USING (c_mktsegment)
      |GROUP BY per.c_mktsegment ORDER BY per.c_mktsegment""".stripMargin

  val all: Seq[NamedQuery] = Seq(
    NamedQuery("q_iqr_fences", iqrFences, Some(iqrFencesSql), bench = true),
    NamedQuery("q_quantile_transform", quantileTransform,
      Some(quantileTransformSql), bench = true),
    NamedQuery("q_simpson", simpson, Some(simpsonSql), bench = true),
    NamedQuery("q_spearman", spearman, Some(spearmanSql), bench = true),
    NamedQuery("q_mann_whitney", mannWhitney, Some(mannWhitneySql),
      bench = true),
    NamedQuery("q_weighted_median", weightedMedian, Some(weightedMedianSql),
      bench = true),
    NamedQuery("q_readability", readability, Some(readabilitySql),
      bench = true),
    NamedQuery("q_gini", giniQuery, Some(giniSql), bench = true),
    NamedQuery("q_ks_test", ksTest, Some(ksTestSql), bench = true),
    NamedQuery("q_pareto_front", paretoFront, Some(paretoFrontSql),
      bench = true),
    NamedQuery("q_quantile_approx", quantileApprox, Some(quantileApproxSql),
      bench = true),
    NamedQuery("q_code_detect", codeDetect, Some(codeDetectSql),
      bench = true),
    NamedQuery("q_drift_tvd", driftTvd, Some(driftTvdSql), bench = true),
    NamedQuery("q_standardize", standardizeQuery, Some(standardizeSql),
      bench = true),
    NamedQuery("q_mad_outliers", madOutliers, Some(madOutliersSql), bench = true),
    NamedQuery("q_quantile_stats", quantileStats, Some(quantileStatsSql), bench = true),
    NamedQuery("q_quality_cutoff", qualityCutoff, Some(qualityCutoffSql), bench = true),
    NamedQuery("q_rare_terms", rareTerms, Some(rareTermsSql), bench = true),
    NamedQuery("q_source_terms", sourceTerms, Some(sourceTermsSql),
      bench = true),
    NamedQuery("q_winsorize", winsorize, Some(winsorizeSql), bench = true))
}
