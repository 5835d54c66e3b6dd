package graft.operators

import graft.LineageCut._
import graft.{NamedQuery, Tables}
import graft.functions.Exact._
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Windowed analytics, multi-level aggregation, decontamination, and
  * deterministic sampling — the remaining shapes a financial dashboard
  * (rolling trends) and a training-data pipeline (held-out-set
  * decontamination, data-mix sampling) both need.
  *
  * Scale design (100 TB):
  *  - rolling windows partition by entity key: state per task is one
  *    frame of rows, no global sort;
  *  - rollup computes every grouping level in ONE shuffle (Expand +
  *    partial agg), not one job per level;
  *  - decontamination broadcasts the held-out shingle set (test sets are
  *    MBs even when the corpus is TBs) — the corpus never shuffles;
  *  - hash sampling is a stateless per-row predicate: deterministic,
  *    reproducible on any cluster layout, no sort, no RNG seed plumbing.
  */
object Analytics {

  // ---------------------------------------------------------------- q_rolling_avg
  /** Per-customer monthly spend with a 3-month rolling average and
    * month-over-month delta. Sums route through DECIMAL (Exact.dsum
    * rationale) so window results are partitioning-invariant; the rolling
    * mean divides an exact frame sum by the frame row count. */
  private def rollingAvg(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val monthly = Tables.orders(s, dir)
      .groupBy($"o_custkey", date_format($"o_orderdate", "yyyy-MM").as("month"))
      .agg(dsum($"o_totalprice").as("month_total"))
    val w3 = Window.partitionBy($"o_custkey").orderBy($"month").rowsBetween(-2, 0)
    val wo = Window.partitionBy($"o_custkey").orderBy($"month")
    monthly.select($"o_custkey", $"month", $"month_total",
      (sum($"month_total".cast(DecimalType(28, 2))).over(w3).cast("double") /
        count(lit(1)).over(w3)).as("rolling_avg_3m"),
      ($"month_total" - lag($"month_total", 1).over(wo)).as("mom_delta"))
      .orderBy($"o_custkey", $"month")
  }

  private val rollingAvgSql =
    s"""WITH monthly AS (
       |  SELECT o_custkey, strftime(o_orderdate, '%Y-%m') AS month,
       |    ${sqlDsum("o_totalprice")} AS month_total
       |  FROM orders GROUP BY 1, 2)
       |SELECT o_custkey, month, month_total,
       |  CAST(SUM(CAST(month_total AS DECIMAL(28,2))) OVER w3 AS DOUBLE)
       |    / COUNT(*) OVER w3 AS rolling_avg_3m,
       |  month_total - LAG(month_total) OVER wo AS mom_delta
       |FROM monthly
       |WINDOW
       |  w3 AS (PARTITION BY o_custkey ORDER BY month
       |         ROWS BETWEEN 2 PRECEDING AND CURRENT ROW),
       |  wo AS (PARTITION BY o_custkey ORDER BY month)
       |ORDER BY o_custkey, month""".stripMargin

  // --------------------------------------------------------------------- q_ewma
  /** Truncated exponential moving average (half-life = 1 month, horizon =
    * 16 months) over per-customer monthly spend — the standard
    * recency-weighted trend signal next to q_rolling_avg's flat window.
    *
    * Exactness: the recursion ewma_t = α·x_t + (1-α)·ewma_{t-1} is not
    * expressible as a window function, and its float evaluation would be
    * order-fragile anyway. With α = 1/2 the 16-term truncation is exact
    * INTEGER arithmetic instead: monthly cents (DECIMAL-routed sum × 100,
    * an exact bigint) times power-of-two weights 2^15..2^0, summed as
    * longs — the numerator stays < 2^46, so every intermediate is exact
    * in both engines and the single final division of two bit-identical
    * longs is bit-identical too. Truncation error vs the infinite
    * recursion is ≤ 2^-16 of the oldest mass — below the cents grain.
    *
    * Scale shape: one (custkey)-keyed shuffle for the monthly aggregate;
    * all 16 lags share one window spec, so they plan as a SINGLE Window
    * operator over the already-partitioned frame (no extra exchange,
    * no per-term pass). */
  val EwmaHorizon = 16

  private def ewma(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val monthly = Tables.orders(s, dir)
      .groupBy($"o_custkey", date_format($"o_orderdate", "yyyy-MM").as("month"))
      .agg((sum($"o_totalprice".cast(DecimalType(28, 2))) * 100)
        .cast("long").as("cents"))
    val wo = Window.partitionBy($"o_custkey").orderBy($"month")
    def weight(j: Int): Long = 1L << (EwmaHorizon - 1 - j)
    val num = (1 until EwmaHorizon).map(j =>
        coalesce(lag($"cents", j).over(wo), lit(0L)) * lit(weight(j)))
      .foldLeft($"cents" * lit(weight(0)))(_ + _)
    val den = (1 until EwmaHorizon).map(j =>
        when(lag($"cents", j).over(wo).isNotNull, lit(weight(j))).otherwise(lit(0L)))
      .foldLeft(lit(weight(0)).as("w0"): Column)(_ + _)
    monthly
      .select($"o_custkey", $"month", $"cents",
        num.as("ewma_num"), den.as("ewma_den"))
      .withColumn("ewma_cents", $"ewma_num".cast("double") / $"ewma_den")
      .orderBy($"o_custkey", $"month")
  }

  private val ewmaSql = {
    def weight(j: Int): Long = 1L << (EwmaHorizon - 1 - j)
    val num = (s"cents * ${weight(0)}" +: (1 until EwmaHorizon).map(j =>
        s"COALESCE(LAG(cents, $j) OVER wo, 0) * ${weight(j)}"))
      .mkString(" + ")
    val den = (s"${weight(0)}" +: (1 until EwmaHorizon).map(j =>
        s"CASE WHEN LAG(cents, $j) OVER wo IS NOT NULL THEN ${weight(j)} ELSE 0 END"))
      .mkString(" + ")
    s"""WITH monthly AS (
       |  SELECT o_custkey, strftime(o_orderdate, '%Y-%m') AS month,
       |    CAST(SUM(CAST(o_totalprice AS DECIMAL(28,2))) * 100 AS BIGINT) AS cents
       |  FROM orders GROUP BY 1, 2),
       |e AS (
       |  SELECT o_custkey, month, cents,
       |    $num AS ewma_num,
       |    $den AS ewma_den
       |  FROM monthly
       |  WINDOW wo AS (PARTITION BY o_custkey ORDER BY month))
       |SELECT o_custkey, month, cents, ewma_num, ewma_den,
       |  CAST(ewma_num AS DOUBLE) / ewma_den AS ewma_cents
       |FROM e ORDER BY o_custkey, month""".stripMargin
  }

  // ----------------------------------------------------------------- q_rollup_agg
  /** Status × priority totals at every grouping level (detail, per-status
    * subtotal, grand total) — ROLLUP plans as a single Expand + one
    * aggregation shuffle, not one job per level. */
  private def rollupAgg(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.orders(s, dir)
      .rollup($"o_orderstatus", $"o_orderpriority")
      .agg(count(lit(1)).as("n_orders"), dsum($"o_totalprice").as("total_price"))
      .orderBy(asc_nulls_first("o_orderstatus"), asc_nulls_first("o_orderpriority"))
  }

  private val rollupAggSql =
    s"""SELECT o_orderstatus, o_orderpriority,
       |  COUNT(*) AS n_orders, ${sqlDsum("o_totalprice")} AS total_price
       |FROM orders
       |GROUP BY ROLLUP (o_orderstatus, o_orderpriority)
       |ORDER BY o_orderstatus NULLS FIRST, o_orderpriority NULLS FIRST""".stripMargin

  // ------------------------------------------------------------ q_grouping_sets
  /** An EXPLICIT grouping-set list — the general form ROLLUP and CUBE
    * are sugar for: exactly (status), (priority), and the grand total,
    * WITHOUT the detail level a CUBE would add. Spark's
    * groupingSets Column API plans the same single Expand + one
    * aggregation shuffle; at 100 TB the win over three separate GROUP
    * BYs is one scan and one exchange instead of three of each. */
  private def groupingSets(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.orders(s, dir)
      .groupingSets(
        Seq(Seq($"o_orderstatus"), Seq($"o_orderpriority"), Seq.empty),
        $"o_orderstatus", $"o_orderpriority")
      .agg(grouping_id().cast("long").as("gid"),
        count(lit(1)).as("n_orders"), dsum($"o_totalprice").as("total_price"))
      .orderBy($"gid", asc_nulls_first("o_orderstatus"),
        asc_nulls_first("o_orderpriority"))
  }

  private val groupingSetsSql =
    s"""SELECT GROUPING(o_orderstatus, o_orderpriority) AS gid,
       |  o_orderstatus, o_orderpriority,
       |  COUNT(*) AS n_orders, ${sqlDsum("o_totalprice")} AS total_price
       |FROM orders
       |GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
       |ORDER BY gid, o_orderstatus NULLS FIRST, o_orderpriority NULLS FIRST""".stripMargin

  // ------------------------------------------------------------------- q_cube_agg
  /** Status × priority totals over EVERY grouping-set combination —
    * CUBE's four levels (detail, per-status, per-priority, grand total)
    * in the same single Expand + one aggregation shuffle as ROLLUP, plus
    * the `grouping_id` bitmask that distinguishes a subtotal row's NULL
    * from a genuine NULL key (the disambiguation ROLLUP output lacks). */
  private def cubeAgg(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.orders(s, dir)
      .cube($"o_orderstatus", $"o_orderpriority")
      .agg(grouping_id().cast("long").as("gid"),
        count(lit(1)).as("n_orders"), dsum($"o_totalprice").as("total_price"))
      .select($"o_orderstatus", $"o_orderpriority", $"gid", $"n_orders",
        $"total_price")
      .orderBy($"gid", asc_nulls_first("o_orderstatus"),
        asc_nulls_first("o_orderpriority"))
  }

  private val cubeAggSql =
    s"""SELECT o_orderstatus, o_orderpriority,
       |  CAST(GROUPING(o_orderstatus, o_orderpriority) AS BIGINT) AS gid,
       |  COUNT(*) AS n_orders, ${sqlDsum("o_totalprice")} AS total_price
       |FROM orders
       |GROUP BY CUBE (o_orderstatus, o_orderpriority)
       |ORDER BY gid, o_orderstatus NULLS FIRST, o_orderpriority NULLS FIRST""".stripMargin

  // ---------------------------------------------------------------- q_seasonality
  // audited-global-window(q_seasonality): frame = month grid — bound audited in PlanAuditSpec/UnpartitionedWindowAudit
  /** Month-of-year seasonal index of order revenue: each calendar
    * month's average order value as parts-per-million of the overall
    * average — the classical seasonal-naive profile for a monthly
    * series. INTEGER arithmetic throughout (DECIMAL-routed cents, then
    * integer DIV at ppm grain), so the index is bit-identical on any
    * partitioning and any engine; one aggregation shuffle to 12 rows,
    * grand totals via an unpartitioned window over those 12 rows (no
    * second scan of orders). */
  private def seasonality(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val monthly = Tables.orders(s, dir)
      .groupBy(month($"o_orderdate").as("m"))
      .agg((sum($"o_totalprice".cast(DecimalType(28, 2))) * 100)
        .cast("long").as("cents"), count(lit(1)).as("n_orders"))
    monthly
      .withColumn("avg_cents", expr("cents DIV n_orders"))
      .withColumn("overall_avg_cents",
        expr("sum(cents) OVER () DIV sum(n_orders) OVER ()"))
      .withColumn("index_ppm", expr("(avg_cents * 1000000) DIV overall_avg_cents"))
      .select($"m", $"n_orders", $"cents", $"avg_cents", $"overall_avg_cents",
        $"index_ppm")
      .orderBy($"m")
  }

  private val seasonalitySql =
    s"""WITH monthly AS (
       |  SELECT CAST(month(o_orderdate) AS INT) AS m,
       |    CAST(SUM(CAST(o_totalprice AS DECIMAL(28,2))) * 100 AS BIGINT) AS cents,
       |    COUNT(*) AS n_orders
       |  FROM orders GROUP BY 1)
       |SELECT m, n_orders, cents,
       |  cents // n_orders AS avg_cents,
       |  CAST(SUM(cents) OVER () // SUM(n_orders) OVER () AS BIGINT)
       |    AS overall_avg_cents,
       |  CAST((cents // n_orders) * 1000000
       |       // (SUM(cents) OVER () // SUM(n_orders) OVER ()) AS BIGINT)
       |    AS index_ppm
       |FROM monthly ORDER BY m""".stripMargin

  // --------------------------------------------------------------- q_range_window
  /** Trailing-30-day spend per order — a RANGE frame over an integer
    * day index (every other window in this repo uses ROWS frames; range
    * frames are the shape trailing-period metrics need, and peers on
    * the same day must aggregate together, which a ROWS frame gets
    * wrong). Cents are DECIMAL-routed longs, so the trailing sum is
    * bit-identical on any partitioning; the window partitions by
    * customer — per-task state only, no global sort. */
  private def rangeWindow(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val w = Window.partitionBy($"o_custkey").orderBy($"day").rangeBetween(-29, 0)
    Tables.orders(s, dir)
      .select($"o_orderkey", $"o_custkey",
        datediff(to_date($"o_orderdate"), lit("1992-01-01")).cast("long").as("day"),
        ($"o_totalprice".cast(DecimalType(28, 2)) * 100).cast("long").as("cents"))
      .withColumn("trail30_cents", sum($"cents").over(w))
      .orderBy($"o_orderkey")
  }

  private val rangeWindowSql =
    """WITH o AS (
      |  SELECT o_orderkey, o_custkey,
      |    date_diff('day', DATE '1992-01-01', CAST(o_orderdate AS DATE)) AS day,
      |    CAST(CAST(o_totalprice AS DECIMAL(28,2)) * 100 AS BIGINT) AS cents
      |  FROM orders)
      |SELECT o_orderkey, o_custkey, day, cents,
      |  CAST(SUM(cents) OVER (PARTITION BY o_custkey ORDER BY day
      |         RANGE BETWEEN 29 PRECEDING AND CURRENT ROW) AS BIGINT)
      |    AS trail30_cents
      |FROM o ORDER BY o_orderkey""".stripMargin

  // ------------------------------------------------------------- q_equidepth_hist
  /** Equi-depth (decile) histogram of customer balances per market
    * segment: ntile(10) over a TIE-BROKEN total order (balance, custkey)
    * so bucket assignment is deterministic, then one aggregation for
    * count / bounds / exact mass per bucket. The classic stats-collection
    * shape for optimizer histograms and feature binning: a single
    * key-partitioned window pass plus one shuffle to 10 rows per group. */
  private def equidepthHist(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val w = Window.partitionBy($"c_mktsegment").orderBy($"c_acctbal", $"c_custkey")
    Tables.customer(s, dir)
      .select($"c_mktsegment", $"c_custkey", $"c_acctbal")
      .withColumn("bucket", ntile(10).over(w).cast("int"))
      .groupBy($"c_mktsegment", $"bucket")
      .agg(count(lit(1)).as("n"),
        min($"c_acctbal").as("lo"), max($"c_acctbal").as("hi"),
        dsum($"c_acctbal").as("mass"))
      .orderBy($"c_mktsegment", $"bucket")
  }

  private val equidepthHistSql =
    s"""WITH b AS (
       |  SELECT c_mktsegment, c_acctbal,
       |    CAST(ntile(10) OVER (PARTITION BY c_mktsegment
       |                         ORDER BY c_acctbal, c_custkey) AS INT) AS bucket
       |  FROM customer)
       |SELECT c_mktsegment, bucket, COUNT(*) AS n,
       |  MIN(c_acctbal) AS lo, MAX(c_acctbal) AS hi,
       |  ${sqlDsum("c_acctbal")} AS mass
       |FROM b GROUP BY 1, 2 ORDER BY c_mktsegment, bucket""".stripMargin

  // -------------------------------------------------------------- q_decontaminate
  /** Remove every candidate document sharing an 8-word shingle with the
    * held-out ("benchmark") source — the standard training-data
    * decontamination shape. The benchmark shingle set is distinct()'d and
    * broadcast (held-out sets stay small even at corpus scale); the
    * contaminated-id set is a semi-join, the removal an anti-join, so the
    * corpus text itself never enters a shuffle. */
  val ShingleWidth = 8

  /** Docs from `candidates` that share no word-n-gram with `benchmark`.
    *
    * Shingles never exist as strings: the native WordNGramHashes
    * expression emits the sorted distinct 64-bit shingle-hash set in one
    * pass over the text, so what explodes, broadcasts, and joins is
    * 8-byte longs — not ~50-char shingle strings (an order of magnitude
    * less data through every operator). Equality on 64-bit hashes instead
    * of strings admits a ~2^-64-per-pair false-positive removal —
    * negligible against the corpus sizes this targets, and removal-only
    * (never lets contamination through). */
  def decontaminate(candidates: DataFrame, benchmark: DataFrame,
                    textCol: String, idCol: String, n: Int): DataFrame = {
    // both sides filter short texts so semantics stay exactly "shares an
    // n-gram" (the native's whole-short-text fallback hash never fires);
    // word count via space count — no per-word array allocation on the
    // corpus scan (a text of >= n words has >= n-1 spaces, including the
    // empty-token convention shared with split(text, ' ', -1))
    val longEnough =
      (length(col(textCol)) - length(replace(col(textCol), lit(" "), lit("")))) >= n - 1
    val grams = graft.functions.TextFunctions.wordNgramHashes(col(textCol), n)
    val benchShingles = benchmark.filter(longEnough)
      .select(explode(grams).as("gram_hash")).distinct()
    val contaminatedIds = candidates.filter(longEnough)
      .select(col(idCol), explode(grams).as("gram_hash"))
      .join(broadcast(benchShingles), Seq("gram_hash"), "left_semi")
      .select(col(idCol)).distinct()
    candidates.join(broadcast(contaminatedIds), Seq(idCol), "left_anti")
  }

  private def decontaminateQuery(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val docs = Tables.documents(s, dir)
    decontaminate(
      candidates = docs.filter($"source" =!= "src0"),
      benchmark = docs.filter($"source" === "src0"),
      textCol = "text", idCol = "doc_id", n = ShingleWidth)
      .select($"doc_id", $"lang", $"source", $"n_chars")
      .orderBy($"doc_id")
  }

  private val decontaminateSql =
    s"""WITH g AS (
       |  SELECT doc_id, source,
       |    unnest(list_distinct(list_transform(
       |      generate_series(1, len(w) - ${ShingleWidth - 1}),
       |      i -> ${(0 until ShingleWidth).map(k => s"w[i+$k]").mkString(" || ' ' || ")}))) AS shingle
       |  FROM (SELECT doc_id, source, string_split(text, ' ') AS w FROM documents)
       |  WHERE len(w) >= $ShingleWidth),
       |bench AS (SELECT DISTINCT shingle FROM g WHERE source = 'src0')
       |SELECT d.doc_id, d.lang, d.source, d.n_chars
       |FROM documents d
       |WHERE d.source <> 'src0'
       |  AND NOT EXISTS (
       |    SELECT 1 FROM g JOIN bench USING (shingle)
       |    WHERE g.source <> 'src0' AND g.doc_id = d.doc_id)
       |ORDER BY d.doc_id""".stripMargin

  // ---------------------------------------------------------------- q_hash_sample
  /** Deterministic stratified sampling for data mixing: keep a row iff the
    * first hex byte of md5(doc_id) clears the stratum's threshold.
    * Reproducible on any cluster layout / partitioning (no RNG state), and
    * rebalancing the mix only changes thresholds, not the mechanism.
    * en is downsampled to ~16% (0x29/256), other languages kept at ~50%. */
  private def hashSample(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.documents(s, dir)
      .filter(substring(md5($"doc_id".cast("string")), 1, 2) <
        when($"lang" === "en", lit("29")).otherwise(lit("80")))
      .select($"doc_id", $"lang", $"source", $"n_chars")
      .orderBy($"doc_id")
  }

  private val hashSampleSql =
    """SELECT doc_id, lang, source, n_chars FROM documents
      |WHERE substr(md5(CAST(doc_id AS VARCHAR)), 1, 2) <
      |  CASE WHEN lang = 'en' THEN '29' ELSE '80' END
      |ORDER BY doc_id""".stripMargin

  // ---------------------------------------------- shared monthly series + spine
  /** Per-customer monthly totals and each key's dense month spine over
    * its own [min, max] span (sequence + explode — no driver-side
    * calendar). Shared by resampling and interpolation so the grid
    * semantics can't diverge between them. */
  private def monthlySpine(s: SparkSession, dir: String,
                           valueAlias: String): (DataFrame, DataFrame) = {
    import s.implicits._
    val monthly = Tables.orders(s, dir)
      .groupBy($"o_custkey".as("custkey"),
        date_format($"o_orderdate", "yyyy-MM").as("month"))
      .agg(dsum($"o_totalprice").as(valueAlias))
    // span bounds aggregate the RAW date, not the "yyyy-MM" string:
    // min/max month string == month of min/max date, but a string
    // min/max buffer forces SortAggregate (two full-table sorts); dates
    // are fixed-width so this stays a hash aggregate in the scan pass
    val spine = Tables.orders(s, dir)
      .groupBy($"o_custkey".as("custkey"))
      .agg(min($"o_orderdate").as("d0"), max($"o_orderdate").as("d1"))
      .select($"custkey", explode(sequence(
        date_trunc("month", $"d0").cast("date"),
        date_trunc("month", $"d1").cast("date"),
        expr("interval 1 month"))).as("mdate"))
      .select($"custkey", date_format($"mdate", "yyyy-MM").as("month"))
    (monthly, spine)
  }

  /** The matching DuckDB CTEs (monthly / b / spine). */
  private def monthlySpineSql(valueAlias: String): String =
    s"""monthly AS (
       |  SELECT o_custkey AS custkey, strftime(o_orderdate, '%Y-%m') AS month,
       |    ${sqlDsum("o_totalprice")} AS $valueAlias
       |  FROM orders GROUP BY 1, 2),
       |b AS (SELECT o_custkey AS custkey,
       |        CAST(date_trunc('month', min(o_orderdate)) AS DATE) AS d0,
       |        CAST(date_trunc('month', max(o_orderdate)) AS DATE) AS d1
       |      FROM orders GROUP BY 1),
       |spine AS (
       |  SELECT custkey, strftime(unnest(generate_series(d0, d1,
       |    INTERVAL 1 MONTH)), '%Y-%m') AS month
       |  FROM b)""".stripMargin

  // -------------------------------------------------------------- q_resample_ffill
  /** Resample to a dense monthly grid + forward fill — the time-series
    * gap-filling every financial pipeline needs (a ticker with no trade
    * in a month still has a last-known price): actuals left-join onto
    * the spine, and last(..., ignoreNulls) over a running window carries
    * values across gaps in one key-partitioned pass. */
  private def resampleFfill(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val (monthly, spine) = monthlySpine(s, dir, "month_total")
    val w = Window.partitionBy($"custkey").orderBy($"month")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    spine.join(monthly, Seq("custkey", "month"), "left")
      .select($"custkey", $"month",
        $"month_total".isNull.as("was_gap"),
        last($"month_total", ignoreNulls = true).over(w).as("filled"))
      .orderBy($"custkey", $"month")
  }

  private val resampleFfillSql =
    s"""WITH ${monthlySpineSql("month_total")}
       |SELECT s.custkey, s.month, m.month_total IS NULL AS was_gap,
       |  last_value(m.month_total IGNORE NULLS) OVER (
       |    PARTITION BY s.custkey ORDER BY s.month ROWS UNBOUNDED PRECEDING) AS filled
       |FROM spine s LEFT JOIN monthly m USING (custkey, month)
       |ORDER BY custkey, month""".stripMargin

  // ----------------------------------------------------------------- q_interpolate
  /** Linear interpolation across series gaps — ffill's companion when a
    * gap should trend toward the next known point instead of holding
    * flat. Same per-key spine; each gap row finds its bracketing known
    * points via IGNORE-NULLS carries from both directions (running and
    * following frames over ONE partition sort), then interpolates by
    * month offset. Emitted UNROUNDED: interpolation midpoints make exact
    * halfway values structurally common, so decimal rounding would sit on
    * tie-break boundaries; the expression shape (left-associative
    * mult-then-div on identical inputs) is the same IEEE op sequence in
    * any engine, so the raw doubles are bit-identical. */
  private def interpolate(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val (monthly, spine) = monthlySpine(s, dir, "v")
    val back = Window.partitionBy($"custkey").orderBy($"month")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    // the forward bracket is NOT an unbounded-FOLLOWING frame: Spark's
    // UnboundedFollowingWindowFunctionFrame recomputes the aggregate
    // from scratch on every row — O(rows²) per partition (measured 3× on
    // this query). A running frame over the REVERSED sort order is the
    // same value (`last` non-null walking months downward = first
    // non-null at-or-after the row) and evaluates incrementally; the
    // extra desc sort reuses the exchange, no new shuffle.
    val fwdRun = Window.partitionBy($"custkey").orderBy($"month".desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    // the grid position is the dense-spine month index, computable
    // row-local from the "yyyy-MM" key — NOT row_number(): a window rank
    // would (a) add a third Window pass and (b) sit inside the carried
    // last(CASE...) expressions, whose pre-projection splits each
    // bracket into TWO Window operators (4 sorted-partition walks where
    // 2 suffice — measured ~2.4× on this query, doubled again by the
    // final range exchange re-executing its child to sample bounds)
    val monthIdx = substring($"month", 1, 4).cast("int") * 12 +
      substring($"month", 6, 2).cast("int")
    val layered = spine.join(monthly, Seq("custkey", "month"), "left")
      .select($"custkey", $"month", $"v", monthIdx.as("midx"),
        when($"v".isNotNull, monthIdx).as("kidx"))
    val bracketed = layered.select($"custkey", $"month", $"v", $"midx",
      last($"v", ignoreNulls = true).over(back).as("prev_v"),
      last($"kidx", ignoreNulls = true).over(back).as("prev_idx"),
      last($"v", ignoreNulls = true).over(fwdRun).as("next_v"),
      last($"kidx", ignoreNulls = true).over(fwdRun).as("next_idx"))
    bracketed.select($"custkey", $"month", $"v".isNull.as("was_gap"),
      when($"v".isNotNull, $"v").otherwise(
        $"prev_v" + ($"next_v" - $"prev_v") * ($"midx" - $"prev_idx") /
          ($"next_idx" - $"prev_idx")).as("interpolated"))
      // cut BEFORE the final sort: a global orderBy's range exchange
      // samples bounds by RE-EXECUTING its child, so the whole
      // spine-join + double-window chain ran twice (round-13 profile:
      // two back-to-back ~2 s single-chain jobs); the cut makes the
      // sample pass read materialized blocks instead
      .lineageCut(true)
      .orderBy($"custkey", $"month")
  }

  private val interpolateSql =
    s"""WITH ${monthlySpineSql("v")},
       |layered AS (
       |  SELECT s.custkey, s.month, m.v,
       |    CAST(substring(s.month, 1, 4) AS INT) * 12
       |      + CAST(substring(s.month, 6, 2) AS INT) AS midx,
       |    CASE WHEN m.v IS NOT NULL THEN
       |      CAST(substring(s.month, 1, 4) AS INT) * 12
       |        + CAST(substring(s.month, 6, 2) AS INT) END AS kidx
       |  FROM spine s LEFT JOIN monthly m USING (custkey, month)),
       |bracketed AS (
       |  SELECT custkey, month, v, midx,
       |    last_value(v IGNORE NULLS) OVER back AS prev_v,
       |    last_value(kidx IGNORE NULLS) OVER back AS prev_idx,
       |    first_value(v IGNORE NULLS) OVER fwd AS next_v,
       |    first_value(kidx IGNORE NULLS) OVER fwd AS next_idx
       |  FROM layered
       |  WINDOW
       |    back AS (PARTITION BY custkey ORDER BY month ROWS UNBOUNDED PRECEDING),
       |    fwd AS (PARTITION BY custkey ORDER BY month
       |            ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING))
       |SELECT custkey, month, v IS NULL AS was_gap,
       |  CASE WHEN v IS NOT NULL THEN v ELSE
       |    prev_v + (next_v - prev_v) * (midx - prev_idx) / (next_idx - prev_idx)
       |  END AS interpolated
       |FROM bracketed ORDER BY custkey, month""".stripMargin

  // ---------------------------------------------------------------- q_correlation
  /** Pearson correlation + OLS slope of price vs quantity per return
    * flag — statistical profiling with PARTITIONING-INVARIANT results:
    * Spark's built-in `corr` is a one-pass float aggregation whose low
    * bits depend on partition order (merge order of the co-moment
    * buffers), so two runs of the same job on different cluster layouts
    * can disagree. Here the five sufficient statistics (Sx, Sy, Sxy,
    * Sxx, Syy) are exact DECIMAL sums (2dp inputs, 4dp products) —
    * deterministic on any layout — and corr/slope are a fixed
    * arithmetic sequence over their double images, rounded to 9dp in
    * the output: once a scaled sum exceeds 2^53 (Syy does at ~2e12 in
    * raw units), DuckDB's decimal→double conversion double-rounds
    * (int128→double, then ÷10^scale) where the JVM's BigDecimal
    * converts in one correctly-rounded step, so the engines' doubles
    * can differ by an ulp (~1e-15 relative; observed at sf0.001). The
    * 9dp rounding absorbs that conversion ulp with six orders of
    * margin while keeping every digit a user would read. */
  private def correlation(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val stats = Tables.lineitem(s, dir)
      .groupBy($"l_returnflag")
      .agg(
        count(lit(1)).as("n"),
        dsum($"l_quantity").as("sx"),
        dsum($"l_extendedprice").as("sy"),
        dsum($"l_quantity" * $"l_extendedprice", 4).as("sxy"),
        dsum($"l_quantity" * $"l_quantity", 4).as("sxx"),
        dsum($"l_extendedprice" * $"l_extendedprice", 4).as("syy"))
    // cast every exact DECIMAL sum to double BEFORE any arithmetic:
    // decimal×decimal products would be precision-truncated by each
    // engine's own decimal rules (observed: a 2-ulp corr disagreement at
    // sf0.001), while double×double is the identical IEEE sequence in
    // both — the sums themselves are exact, so the casts lose nothing
    // the formula's doubles could keep
    val nd = $"n".cast("double")
    val Seq(sx, sy, sxy, sxx, syy) =
      Seq("sx", "sy", "sxy", "sxx", "syy").map(c => col(c).cast("double"))
    val covN = nd * sxy - sx * sy
    stats.select($"l_returnflag", $"n",
      round(covN / (sqrt(nd * sxx - sx * sx) *
        sqrt(nd * syy - sy * sy)), 9).as("corr_qty_price"),
      round(covN / (nd * sxx - sx * sx), 9).as("slope_price_per_qty"))
      .orderBy($"l_returnflag")
  }

  private val correlationSql =
    s"""WITH t AS (
       |  SELECT l_returnflag, COUNT(*) AS n,
       |    ${sqlDsum("l_quantity")} AS sx,
       |    ${sqlDsum("l_extendedprice")} AS sy,
       |    ${sqlDsum("l_quantity * l_extendedprice", 4)} AS sxy,
       |    ${sqlDsum("l_quantity * l_quantity", 4)} AS sxx,
       |    ${sqlDsum("l_extendedprice * l_extendedprice", 4)} AS syy
       |  FROM lineitem GROUP BY l_returnflag),
       |d AS (
       |  SELECT l_returnflag, n, CAST(n AS DOUBLE) AS nd,
       |    CAST(sx AS DOUBLE) AS sx, CAST(sy AS DOUBLE) AS sy,
       |    CAST(sxy AS DOUBLE) AS sxy, CAST(sxx AS DOUBLE) AS sxx,
       |    CAST(syy AS DOUBLE) AS syy
       |  FROM t)
       |SELECT l_returnflag, n,
       |  round((nd * sxy - sx * sy)
       |    / (sqrt(nd * sxx - sx * sx)
       |       * sqrt(nd * syy - sy * sy)), 9) AS corr_qty_price,
       |  round((nd * sxy - sx * sy)
       |    / (nd * sxx - sx * sx), 9) AS slope_price_per_qty
       |FROM d ORDER BY l_returnflag""".stripMargin

  // ------------------------------------------------------------------ q_array_agg
  /** Array aggregation: collect the group's members into a value. The
    * collected list is UNORDERED in a distributed engine, so determinism
    * requires sorting before rendering — here numerically via sort_array
    * on the longs, then string-joined (lexicographic sort of stringified
    * ids would put 10 before 9). */
  private def arrayAgg(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.documents(s, dir)
      .groupBy($"lang", $"source")
      .agg(
        count(lit(1)).as("n_docs"),
        array_join(
          transform(sort_array(collect_list($"doc_id")), _.cast("string")),
          ",").as("doc_ids"))
      .orderBy($"lang", $"source")
  }

  private val arrayAggSql =
    """SELECT lang, source, COUNT(*) AS n_docs,
      |  string_agg(doc_id, ',' ORDER BY doc_id) AS doc_ids
      |FROM documents GROUP BY 1, 2 ORDER BY lang, source""".stripMargin

  // ---------------------------------------------------------------- q_window_suite
  /** The full ranking/navigation window-function surface in one query:
    * row_number, rank, dense_rank, ntile, percent_rank, cume_dist, lag,
    * lead, first_value — all over ONE window spec, so they share a
    * single (key-partitioned sort) pass; the total order includes the
    * unique orderkey tie-breaker, making every function bit-stable. */
  private def windowSuite(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val w = Window.partitionBy($"o_custkey").orderBy($"o_orderdate", $"o_orderkey")
    Tables.orders(s, dir).select(
      $"o_custkey", $"o_orderkey",
      row_number().over(w).as("rn"),
      rank().over(w).as("rnk"),
      dense_rank().over(w).as("drnk"),
      ntile(4).over(w).as("quartile"),
      round(percent_rank().over(w), 6).as("pct_rank"),
      round(cume_dist().over(w), 6).as("cume"),
      lag($"o_totalprice", 1).over(w).as("prev_price"),
      lead($"o_totalprice", 1).over(w).as("next_price"),
      first($"o_totalprice").over(w).as("first_price"))
      .orderBy($"o_custkey", $"rn")
  }

  private val windowSuiteSql =
    """SELECT o_custkey, o_orderkey,
      |  row_number() OVER w AS rn, rank() OVER w AS rnk,
      |  dense_rank() OVER w AS drnk, ntile(4) OVER w AS quartile,
      |  round(percent_rank() OVER w, 6) AS pct_rank,
      |  round(cume_dist() OVER w, 6) AS cume,
      |  lag(o_totalprice, 1) OVER w AS prev_price,
      |  lead(o_totalprice, 1) OVER w AS next_price,
      |  first_value(o_totalprice) OVER w AS first_price
      |FROM orders
      |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
      |ORDER BY o_custkey, rn""".stripMargin

  // -------------------------------------------------------------------- q_set_ops
  /** INTERSECT / EXCEPT: customers with both finished and open orders vs
    * finished-only. Both set ops plan as dedup + hash join on the same
    * key partitioning — one shuffle each side, reused across the union. */
  private def setOps(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val o = Tables.orders(s, dir)
    val f = o.filter($"o_orderstatus" === "F").select($"o_custkey")
    val open = o.filter($"o_orderstatus" === "O").select($"o_custkey")
    f.intersect(open).withColumn("set_op", lit("both"))
      .unionByName(f.except(open).withColumn("set_op", lit("f_only")))
      .orderBy($"o_custkey", $"set_op")
  }

  private val setOpsSql =
    """SELECT o_custkey, 'both' AS set_op FROM (
      |  SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
      |  INTERSECT
      |  SELECT o_custkey FROM orders WHERE o_orderstatus = 'O')
      |UNION ALL
      |SELECT o_custkey, 'f_only' AS set_op FROM (
      |  SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
      |  EXCEPT
      |  SELECT o_custkey FROM orders WHERE o_orderstatus = 'O')
      |ORDER BY o_custkey, set_op""".stripMargin

  // ------------------------------------------------------------ q_set_ops_all
  /** INTERSECT ALL / EXCEPT ALL — the MULTISET variants: occurrence
    * counts matter (min of the two sides for intersect, truncated
    * difference for except), the semantics de-duplication audits need
    * when "how many copies" is the question. Spark plans both via a
    * per-key occurrence-count aggregation + join — still one shuffle per
    * side on the same key. Emitted as per-customer occurrence counts so
    * the multiset answer is visible, not just the bag size. */
  private def setOpsAll(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val o = Tables.orders(s, dir)
    val f = o.filter($"o_orderstatus" === "F").select($"o_custkey")
    val open = o.filter($"o_orderstatus" === "O").select($"o_custkey")
    f.intersectAll(open).withColumn("set_op", lit("intersect_all"))
      .unionByName(f.exceptAll(open).withColumn("set_op", lit("except_all")))
      .groupBy($"o_custkey", $"set_op")
      .agg(count(lit(1)).as("n_occurrences"))
      .orderBy($"o_custkey", $"set_op")
  }

  private val setOpsAllSql =
    """SELECT o_custkey, set_op, COUNT(*) AS n_occurrences FROM (
      |  SELECT o_custkey, 'intersect_all' AS set_op FROM (
      |    SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
      |    INTERSECT ALL
      |    SELECT o_custkey FROM orders WHERE o_orderstatus = 'O')
      |  UNION ALL
      |  SELECT o_custkey, 'except_all' FROM (
      |    SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
      |    EXCEPT ALL
      |    SELECT o_custkey FROM orders WHERE o_orderstatus = 'O'))
      |GROUP BY 1, 2 ORDER BY o_custkey, set_op""".stripMargin

  // -------------------------------------------------------------- q_count_distinct
  /** Exact COUNT(DISTINCT) per group — plans as a two-phase expand/
    * partial-distinct aggregation, the exact companion to the HLL
    * q_approx_distinct. */
  private def countDistinct(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.orders(s, dir)
      .groupBy($"o_orderpriority")
      .agg(count_distinct($"o_custkey").as("n_customers"),
        count(lit(1)).as("n_orders"))
      .orderBy($"o_orderpriority")
  }

  private val countDistinctSql =
    """SELECT o_orderpriority, COUNT(DISTINCT o_custkey) AS n_customers,
      |  COUNT(*) AS n_orders
      |FROM orders GROUP BY 1 ORDER BY o_orderpriority""".stripMargin

  // ------------------------------------------------------------ q_multi_join_agg
  /** 5-way join at depth (TPC-H Q5 shape): region -> nation -> customer
    * -> orders -> lineitem, revenue per nation within one region and
    * date window. The dimension chain (region ⋈ nation, then customer)
    * broadcasts; only the orders ⋈ lineitem fact join shuffles, keyed on
    * orderkey; the date filter pushes to the orders scan. */
  private def multiJoinAgg(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val nations = Tables.region(s, dir).filter($"r_name" === "ASIA")
      .join(Tables.nation(s, dir), $"r_regionkey" === $"n_regionkey")
      .select($"n_nationkey", $"n_name")
    val custs = Tables.customer(s, dir)
      .join(broadcast(nations), $"c_nationkey" === $"n_nationkey")
      .select($"c_custkey", $"n_name")
    val ords = Tables.orders(s, dir)
      .filter($"o_orderdate" >= "1995-01-01" && $"o_orderdate" < "1997-01-01")
      .join(broadcast(custs), $"o_custkey" === $"c_custkey")
      .select($"o_orderkey", $"n_name")
    Tables.lineitem(s, dir)
      .join(ords, $"l_orderkey" === $"o_orderkey")
      .groupBy($"n_name")
      .agg(dsum($"l_extendedprice" * (lit(1) - $"l_discount"), 4).as("revenue"),
        count(lit(1)).as("n_items"))
      .orderBy($"revenue".desc, $"n_name")
  }

  private val multiJoinAggSql =
    s"""SELECT n.n_name, ${sqlDsum("l.l_extendedprice * (1 - l.l_discount)", 4)} AS revenue,
       |  COUNT(*) AS n_items
       |FROM region r
       |JOIN nation n ON r.r_regionkey = n.n_regionkey
       |JOIN customer c ON c.c_nationkey = n.n_nationkey
       |JOIN orders o ON o.o_custkey = c.c_custkey
       |JOIN lineitem l ON l.l_orderkey = o.o_orderkey
       |WHERE r.r_name = 'ASIA'
       |  AND o.o_orderdate >= TIMESTAMP '1995-01-01'
       |  AND o.o_orderdate < TIMESTAMP '1997-01-01'
       |GROUP BY n.n_name
       |ORDER BY revenue DESC, n_name""".stripMargin

  // ------------------------------------------------------ q_supplier_nation_share
  /** Supplier-side profit rollup (TPC-H Q9 family): lineitem enriched
    * through part, supplier, and nation — all three dimensions broadcast
    * — then one aggregation by supplier nation with a conditional
    * revenue-share ratio. Covers the part/supplier tables end-to-end. */
  private def supplierNationShare(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.lineitem(s, dir)
      .select($"l_partkey", $"l_suppkey",
        ($"l_extendedprice" * (lit(1) - $"l_discount")).as("rev"))
      .join(broadcast(Tables.part(s, dir).select($"p_partkey", $"p_type")),
        $"l_partkey" === $"p_partkey")
      .join(broadcast(Tables.supplier(s, dir).select($"s_suppkey", $"s_nationkey")),
        $"l_suppkey" === $"s_suppkey")
      .join(broadcast(Tables.nation(s, dir).select($"n_nationkey", $"n_name")),
        $"s_nationkey" === $"n_nationkey")
      .groupBy($"n_name")
      .agg(
        dsum($"rev", 4).as("revenue"),
        (dsum(when($"p_type" === "ECONOMY", $"rev"), 4) / dsum($"rev", 4))
          .as("economy_share"),
        count(lit(1)).as("n_items"))
      .orderBy($"n_name")
  }

  private val supplierNationShareSql =
    s"""SELECT n.n_name,
       |  ${sqlDsum("l.l_extendedprice * (1 - l.l_discount)", 4)} AS revenue,
       |  ${sqlDsum("CASE WHEN p.p_type = 'ECONOMY' THEN l.l_extendedprice * (1 - l.l_discount) END", 4)}
       |    / ${sqlDsum("l.l_extendedprice * (1 - l.l_discount)", 4)} AS economy_share,
       |  COUNT(*) AS n_items
       |FROM lineitem l
       |JOIN part p ON l.l_partkey = p.p_partkey
       |JOIN supplier s ON l.l_suppkey = s.s_suppkey
       |JOIN nation n ON s.s_nationkey = n.n_nationkey
       |GROUP BY n.n_name ORDER BY n_name""".stripMargin

  // ------------------------------------------------------------- q_heavy_hitters
  // audited-bnlj(q_heavy_hitters): build side = 1-row global-aggregate broadcast — audited in PlanAuditSpec/BnljAudit
  /** Exact heavy hitters via the two-pass sketch pattern: pass 1 runs the
    * native Misra-Gries typed aggregate (functions/SketchExprs.scala) —
    * bounded memory per task, candidate set guaranteed a SUPERSET of
    * every word with count > total/k — and pass 2 exact-counts only the
    * <= k candidates, so the final answer is exact and layout-independent
    * even though intermediate sketch contents are not.
    *
    * This is the formulation that finds "terms appearing in > 1% of
    * tokens" on a 100 TB corpus WITHOUT shuffling the full vocabulary:
    * pass 1 reduces each task to <= k counters (no shuffle of word
    * strings at all — one k-row summary per task merges on the driver
    * side of the agg), and pass 2's groupBy only ever shuffles rows that
    * match one of <= k broadcast candidates. The threshold compare is
    * integer (n * k > total) — no division, no float boundary. */
  val HeavyHitterK = 100

  def heavyHitters(docs: DataFrame, textCol: String, k: Int): DataFrame = {
    val words = docs.select(
      explode(split(col(textCol), " ", -1)).as("word"))
    val sketch = words.agg(
      graft.functions.SketchFunctions.misraGries(col("word"), k).as("__cands"),
      count(lit(1)).as("total"))
    // one broadcast row carries both the candidate array and the total:
    // consuming `sketch` once keeps the sketch pass a single scan
    words.crossJoin(broadcast(sketch))
      .filter(array_contains(col("__cands"), col("word")))
      .groupBy(col("word"), col("total"))
      .agg(count(lit(1)).as("n"))
      .filter(col("n") * k > col("total"))
      .select(col("word"), col("n"),
        (col("n").cast("double") / col("total")).as("freq"))
  }

  private def heavyHittersQuery(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    heavyHitters(Tables.documents(s, dir), "text", HeavyHitterK)
      .orderBy($"n".desc, $"word")
  }

  private val heavyHittersSql =
    s"""WITH w AS (SELECT unnest(string_split(text, ' ')) AS word FROM documents),
       |t AS (SELECT COUNT(*) AS total FROM w),
       |c AS (SELECT word, COUNT(*) AS n FROM w GROUP BY 1)
       |SELECT word, n, CAST(n AS DOUBLE) / (SELECT total FROM t) AS freq
       |FROM c WHERE n * $HeavyHitterK > (SELECT total FROM t)
       |ORDER BY n DESC, word""".stripMargin

  // ------------------------------------------------------------------- q_clv
  /** Discounted customer lifetime value — Σ monthly_spend(m) · d(m),
    * the classic finance aggregate, with the discount factor computed
    * EXACTLY: d(m) = (100/101)^m (≈ 1% monthly rate) evaluated as an
    * integer fold `acc · 100 DIV 101` from a parts-per-billion seed
    * (cents × ppb stays under 2^63 for any realistic monthly spend) —
    * no float pow, whose libm rounding differs across engines. The fold
    * is a row-local `aggregate(sequence(1, m), …)` over the ~tens-of-
    * months frame (DuckDB mirrors it with list_reduce), so both engines
    * run the identical integer recurrence. Spend routes cents-exact
    * through DECIMAL; the discounted product divides integers; the final
    * CLV is one exact decimal sum per customer. Shuffles: one
    * (customer, month) rollup, one customer rollup — both partial-agg'd. */
  val ClvPpbSeed = 1000000000L // d(0) in parts-per-billion

  private def clv(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val monthly = Tables.orders(s, dir)
      .groupBy($"o_custkey",
        months_between(date_trunc("month", $"o_orderdate"),
          to_date(lit("1995-01-01"))).cast("int").as("m"))
      .agg(dsum($"o_totalprice").as("spend"))
    monthly
      // m <= 0 guard: Spark's sequence(1, m) DESCENDS for m < 1 instead
      // of being empty (the oracle's range(m) IS empty there) — the fold
      // must run exactly max(m, 0) times. Months before the anchor are
      // not discounted (factor 1), the same clamp the oracle computes.
      .withColumn("d_ppb",
        expr(s"CASE WHEN m <= 0 THEN ${ClvPpbSeed}L ELSE " +
          s"aggregate(sequence(1, m), ${ClvPpbSeed}L, " +
          "(acc, x) -> acc * 100 DIV 101) END"))
      .withColumn("spend_cents", round($"spend" * 100).cast("long"))
      .withColumn("disc_cents",
        expr(s"spend_cents * d_ppb DIV ${ClvPpbSeed}L"))
      .groupBy($"o_custkey")
      .agg(
        sum($"spend_cents").as("spend_cents"),
        sum($"disc_cents").as("clv_cents"),
        count(lit(1)).as("n_months"))
      .orderBy($"o_custkey")
  }

  private val clvSql =
    s"""WITH monthly AS (
       |  SELECT o_custkey,
       |    date_diff('month', DATE '1995-01-01',
       |              date_trunc('month', o_orderdate)) AS m,
       |    ${sqlDsum("o_totalprice")} AS spend
       |  FROM orders GROUP BY 1, 2),
       |disc AS (
       |  SELECT o_custkey,
       |    CAST(round(spend * 100) AS BIGINT) AS spend_cents,
       |    list_reduce(
       |      list_prepend(CAST($ClvPpbSeed AS BIGINT), range(m)),
       |      (acc, x) -> acc * 100 // 101) AS d_ppb
       |  FROM monthly)
       |SELECT o_custkey,
       |  CAST(SUM(spend_cents) AS BIGINT) AS spend_cents,
       |  CAST(SUM(spend_cents * d_ppb // $ClvPpbSeed) AS BIGINT) AS clv_cents,
       |  COUNT(*) AS n_months
       |FROM disc GROUP BY o_custkey ORDER BY o_custkey""".stripMargin

  // ------------------------------------------------------- q_time_weighted_avg
  /** Time-weighted average order value per customer — the
    * irregular-series integration a financial pipeline uses for average
    * balances: each order's value is weighted by the number of days it
    * "stood" (until the customer's next order; the final order has no
    * horizon and is excluded, the standard left-closed convention).
    * The weighted sum routes day-weighted 2-dp products through DECIMAL
    * (Exact rationale) so the aggregation is partitioning-invariant; the
    * final average is one IEEE division on bit-identical inputs.
    * One customer-keyed window (lead) + one aggregation on the same key. */
  private def timeWeightedAvg(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val w = Window.partitionBy($"o_custkey")
      .orderBy($"o_orderdate", $"o_orderkey")
    val spans = Tables.orders(s, dir)
      .select($"o_custkey", $"o_orderdate", $"o_orderkey", $"o_totalprice")
      .withColumn("days",
        datediff(lead($"o_orderdate", 1).over(w), $"o_orderdate"))
      .filter($"days".isNotNull && $"days" > 0)
    spans.groupBy($"o_custkey")
      .agg(
        dsum($"o_totalprice" * $"days").as("weighted_total"),
        sum($"days").cast("long").as("total_days"),
        count(lit(1)).as("n_spans"))
      .withColumn("twa", $"weighted_total" / $"total_days")
      .orderBy($"o_custkey")
  }

  private val timeWeightedAvgSql =
    s"""WITH spans AS (
       |  SELECT o_custkey, o_totalprice,
       |    date_diff('day', o_orderdate,
       |      lead(o_orderdate) OVER (PARTITION BY o_custkey
       |        ORDER BY o_orderdate, o_orderkey)) AS days
       |  FROM orders)
       |SELECT o_custkey,
       |  ${sqlDsum("o_totalprice * days")} AS weighted_total,
       |  CAST(SUM(days) AS BIGINT) AS total_days,
       |  COUNT(*) AS n_spans,
       |  ${sqlDsum("o_totalprice * days")} / CAST(SUM(days) AS BIGINT) AS twa
       |FROM spans WHERE days IS NOT NULL AND days > 0
       |GROUP BY o_custkey ORDER BY o_custkey""".stripMargin

  // -------------------------------------------------------- q_forecast_backtest
  /** Forecast backtesting — the evaluation harness any demand-planning
    * pipeline needs before trusting a model: per order-priority series,
    * the mean absolute error of the two standard zero-parameter
    * baselines (naive-1 "same as last month", seasonal-naive-12 "same
    * month last year") over every backtestable month, plus which one
    * won. INTEGER CENTS end to end (the error of a float model would be
    * a different query; the harness itself must not round): monthly
    * totals are exact DECIMAL sums emitted as cents, lags are windows
    * over the months-cardinality series frame, MAE is a total DIV count.
    * Shuffles: one (priority, month) rollup of the facts; the windows
    * and the final rollup touch ~priorities × months rows. */
  private def forecastBacktest(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val monthly = Tables.orders(s, dir)
      .groupBy($"o_orderpriority".as("priority"),
        date_format($"o_orderdate", "yyyy-MM").as("month"))
      .agg(round(dsum($"o_totalprice") * 100).cast("long").as("cents"))
    val w = Window.partitionBy($"priority").orderBy($"month")
    monthly
      .withColumn("lag1", lag($"cents", 1).over(w))
      .withColumn("lag12", lag($"cents", 12).over(w))
      .filter($"lag12".isNotNull)
      .groupBy($"priority")
      .agg(
        count(lit(1)).as("n_months"),
        sum(abs($"cents" - $"lag1")).as("ae1"),
        sum(abs($"cents" - $"lag12")).as("ae12"))
      .select($"priority", $"n_months",
        expr("ae1 DIV n_months").as("mae_naive1_cents"),
        expr("ae12 DIV n_months").as("mae_seasonal_cents"),
        ($"ae12" < $"ae1").as("seasonal_wins"))
      .orderBy($"priority")
  }

  private val forecastBacktestSql = {
    s"""WITH monthly AS (
       |  SELECT o_orderpriority AS priority,
       |    strftime(o_orderdate, '%Y-%m') AS month,
       |    CAST(round(${sqlDsum("o_totalprice")} * 100) AS BIGINT) AS cents
       |  FROM orders GROUP BY 1, 2),
       |lagged AS (
       |  SELECT priority, cents,
       |    lag(cents, 1) OVER w AS lag1, lag(cents, 12) OVER w AS lag12
       |  FROM monthly WINDOW w AS (PARTITION BY priority ORDER BY month)),
       |agg AS (
       |  SELECT priority, COUNT(*) AS n_months,
       |    CAST(SUM(abs(cents - lag1)) AS BIGINT) AS ae1,
       |    CAST(SUM(abs(cents - lag12)) AS BIGINT) AS ae12
       |  FROM lagged WHERE lag12 IS NOT NULL GROUP BY 1)
       |SELECT priority, n_months,
       |  ae1 // n_months AS mae_naive1_cents,
       |  ae12 // n_months AS mae_seasonal_cents,
       |  ae12 < ae1 AS seasonal_wins
       |FROM agg ORDER BY priority""".stripMargin
  }

  // ------------------------------------------------------------ q_basket_rules
  // audited-bnlj(q_basket_rules): build side = 1-row global-aggregate broadcast — audited in PlanAuditSpec/BnljAudit
  /** Market-basket association rules over co-purchased parts: for the
    * top pairs by support, both directional confidences and the lift —
    * all in integer ppm (support·1e6 DIV basket count; confidence·1e6
    * DIV antecedent support; lift = conf·1e6 DIV consequent rate), so
    * nothing rounds differently anywhere. Pairs generate ROW-LOCALLY
    * from each order's sorted part set (the q_triangle_count build);
    * per-item supports attach by two broadcast joins on the
    * support-floored pair frame. Top 50 by (pair support, pair) — a
    * unique total order. */
  private def basketRules(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val baskets = Tables.lineitem(s, dir)
      .groupBy($"l_orderkey")
      .agg(sort_array(collect_set($"l_partkey")).as("parts"))
      .lineageCut(true)
    val nBaskets = baskets.select(count(lit(1)).as("n_baskets"))
    val itemSupport = baskets
      .select(explode($"parts").as("item"))
      .groupBy($"item").agg(count(lit(1)).as("n_item"))
    val pairSupport = baskets
      .select(explode(expr(Graph.sortedPairsExpr("parts", "a", "b"))).as("p"))
      .select($"p.a", $"p.b")
      .groupBy($"a", $"b").agg(count(lit(1)).as("n_pair"))
      .filter($"n_pair" >= 3)
    pairSupport
      .join(broadcast(itemSupport.select($"item".as("a"), $"n_item".as("n_a"))), "a")
      .join(broadcast(itemSupport.select($"item".as("b"), $"n_item".as("n_b"))), "b")
      .crossJoin(broadcast(nBaskets))
      .select($"a", $"b", $"n_pair", $"n_a", $"n_b",
        expr("n_pair * 1000000 DIV n_baskets").as("support_ppm"),
        expr("n_pair * 1000000 DIV n_a").as("conf_a_to_b_ppm"),
        expr("n_pair * 1000000 DIV n_b").as("conf_b_to_a_ppm"),
        expr("n_pair * n_baskets DIV (n_a * n_b)").as("lift"))
      .orderBy($"n_pair".desc, $"a", $"b")
      .limit(50)
  }

  private val basketRulesSql =
    """WITH baskets AS (
      |  SELECT l_orderkey, list_sort(list_distinct(list(l_partkey))) AS parts
      |  FROM lineitem GROUP BY 1),
      |n AS (SELECT COUNT(*) AS n_baskets FROM baskets),
      |items AS (
      |  SELECT item, COUNT(*) AS n_item FROM (
      |    SELECT unnest(parts) AS item FROM baskets) GROUP BY 1),
      |pairs AS (
      |  SELECT p.a, p.b, COUNT(*) AS n_pair FROM (
      |    SELECT unnest(flatten(list_transform(parts, (x, i) ->
      |      list_transform(parts[i+1:], y -> {'a': x, 'b': y})))) AS p
      |    FROM baskets) t
      |  GROUP BY 1, 2 HAVING COUNT(*) >= 3)
      |SELECT a, b, n_pair, ia.n_item AS n_a, ib.n_item AS n_b,
      |  n_pair * 1000000 // n_baskets AS support_ppm,
      |  n_pair * 1000000 // ia.n_item AS conf_a_to_b_ppm,
      |  n_pair * 1000000 // ib.n_item AS conf_b_to_a_ppm,
      |  n_pair * n_baskets // (ia.n_item * ib.n_item) AS lift
      |FROM pairs
      |JOIN items ia ON pairs.a = ia.item
      |JOIN items ib ON pairs.b = ib.item
      |CROSS JOIN n
      |ORDER BY n_pair DESC, a, b LIMIT 50""".stripMargin

  // ------------------------------------------------------------ q_mode_per_group
  /** Deterministic MODE per group — the most frequent order priority per
    * status, ties broken by the smallest value (the same argmin recipe
    * as label propagation's adoption rule; float-free, so bit-stable).
    * Two-level: (status, priority) counts partial-agg map-side, the
    * argmin window runs over status-cardinality × priority-cardinality
    * rows, never the facts. */
  private def modePerGroup(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val counts = Tables.orders(s, dir)
      .groupBy($"o_orderstatus", $"o_orderpriority")
      .agg(count(lit(1)).as("n"))
    val w = Window.partitionBy($"o_orderstatus")
      .orderBy($"n".desc, $"o_orderpriority".asc)
    counts
      .withColumn("__r", row_number().over(w))
      .filter($"__r" === 1)
      .select($"o_orderstatus", $"o_orderpriority".as("mode_priority"),
        $"n".as("mode_rows"))
      .orderBy($"o_orderstatus")
  }

  private val modePerGroupSql =
    """WITH c AS (
      |  SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n
      |  FROM orders GROUP BY 1, 2),
      |r AS (
      |  SELECT *, row_number() OVER (PARTITION BY o_orderstatus
      |    ORDER BY n DESC, o_orderpriority ASC) AS rn FROM c)
      |SELECT o_orderstatus, o_orderpriority AS mode_priority, n AS mode_rows
      |FROM r WHERE rn = 1 ORDER BY o_orderstatus""".stripMargin

  // --------------------------------------------------------- q_running_distinct
  // audited-global-window(q_running_distinct): frame = YEAR offset frame (day cum is partitioned by year) — bound audited in PlanAuditSpec/UnpartitionedWindowAudit
  /** Cumulative distinct buyers per day — the DAU/"users to date" curve.
    * Windowed COUNT(DISTINCT) does not exist in Spark (the state is a
    * set, not mergeable a row at a time); the scalable spelling is
    * FIRST-SEEN FLAGS: a user's first purchase day (one user-keyed agg),
    * daily counts of first-seens, then a running sum over the daily
    * frame. The heavy shuffle is the per-user aggregation. The running
    * sum is PARTITIONED BY YEAR with carried offsets — the day frame is
    * ~2.4k rows on the fixture but unbounded by contract (a century of
    * events = 36k rows through one window task); the year frame the
    * offset window touches IS bounded by contract (#calendar years in
    * the stream's lifetime). Same globalIndex offset-carry shape, keyed
    * on the calendar instead of spark_partition_id so both engines can
    * replay it. The oracle uses one flat cumulative window — equal by
    * associativity of the sum. */
  private def runningDistinct(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val firstSeen = Tables.events(s, dir)
      .filter($"event_type" === "purchase")
      .groupBy($"user_id")
      .agg(min(to_date($"ts")).as("day"))
    // tiny (one row per active day) but feeds two branches; materialize
    // so the per-user shuffle above runs once
    val daily = firstSeen.groupBy($"day")
      .agg(count(lit(1)).as("new_buyers"))
      .withColumn("yr", year($"day"))
      .lineageCut(true)
    val offsets = daily.groupBy($"yr")
      .agg(sum($"new_buyers").as("__n"))
      .withColumn("__offset",
        coalesce(sum($"__n").over(Window.orderBy($"yr")
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .drop("__n")
    daily
      .withColumn("__cum", sum($"new_buyers").over(
        Window.partitionBy($"yr").orderBy($"day")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .join(broadcast(offsets), Seq("yr"))
      .select(date_format($"day", "yyyy-MM-dd").as("day"),
        $"new_buyers", ($"__cum" + $"__offset").as("buyers_to_date"))
      .orderBy($"day")
  }

  private val runningDistinctSql =
    """WITH first_seen AS (
      |  SELECT user_id, MIN(CAST(ts AS DATE)) AS day
      |  FROM events WHERE event_type = 'purchase' GROUP BY 1),
      |daily AS (
      |  SELECT day, COUNT(*) AS new_buyers FROM first_seen GROUP BY 1)
      |SELECT strftime(day, '%Y-%m-%d') AS day, new_buyers,
      |  CAST(SUM(new_buyers) OVER (ORDER BY day
      |    ROWS UNBOUNDED PRECEDING) AS BIGINT) AS buyers_to_date
      |FROM daily ORDER BY day""".stripMargin

  // ------------------------------------------------------------- q_attribution
  /** Last-touch attribution: each purchase is credited to the campaign
    * (the `k` property) of the user's most recent PRECEDING view — the
    * ad-analytics shape behind every conversion report. One user-keyed
    * sort pass: last(view.k) IGNORE NULLS over rows-unbounded-preceding
    * carries the live campaign forward onto every event, purchases then
    * filter out — an as-of join with no join operator (the AsOf.scala
    * union+window recipe on a single table). Unattributed purchases
    * (no prior view) keep campaign −1: reported, never dropped.
    * Campaign ids and counts are integers; ties at equal timestamps
    * break on event_id on both engines. */
  private def attribution(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val w = Window.partitionBy($"user_id").orderBy($"ts", $"event_id")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    Tables.events(s, dir)
      .filter($"event_type".isin("view", "purchase"))
      .withColumn("k",
        regexp_extract($"props", "\"k\": ([0-9]+)", 1).cast("int"))
      .withColumn("campaign",
        last(when($"event_type" === "view", $"k"), ignoreNulls = true).over(w))
      .filter($"event_type" === "purchase")
      .groupBy(coalesce($"campaign", lit(-1)).as("campaign"))
      .agg(count(lit(1)).as("n_purchases"),
        count_distinct($"user_id").as("n_buyers"))
      .orderBy($"campaign")
  }

  private val attributionSql =
    """WITH e AS (
      |  SELECT user_id, ts, event_id, event_type,
      |    TRY_CAST(regexp_extract(props, '"k": ([0-9]+)', 1) AS INT) AS k
      |  FROM events WHERE event_type IN ('view', 'purchase')),
      |carried AS (
      |  SELECT user_id, event_type,
      |    last_value(CASE WHEN event_type = 'view' THEN k END IGNORE NULLS)
      |      OVER (PARTITION BY user_id ORDER BY ts, event_id
      |            ROWS UNBOUNDED PRECEDING) AS campaign
      |  FROM e)
      |SELECT COALESCE(campaign, -1) AS campaign,
      |  COUNT(*) AS n_purchases, COUNT(DISTINCT user_id) AS n_buyers
      |FROM carried WHERE event_type = 'purchase'
      |GROUP BY 1 ORDER BY campaign""".stripMargin

  // ----------------------------------------------------------------- q_islands
  /** Gaps-and-islands: merge each user's event stream into activity
    * islands — maximal runs where consecutive events are ≤ `IslandGapMin`
    * apart — the classic interval-union shape behind session billing,
    * uptime accounting, and validity-interval compaction. One user-keyed
    * sort pass computes BOTH window functions (gap flag via lag, island
    * id via running sum of flags — same window spec, one Exchange+Sort);
    * the per-island rollup then groups on (user, island). Timestamps
    * leave as exact epoch microseconds; span arithmetic is integer. */
  val IslandGapMin = 10

  private def islands(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val gapUs = IslandGapMin * 60L * 1000000L
    val w = Window.partitionBy($"user_id").orderBy($"ts", $"event_id")
    Tables.events(s, dir)
      .withColumn("prev_us", unix_micros(lag($"ts", 1).over(w)))
      .withColumn("is_start",
        when($"prev_us".isNull ||
          unix_micros($"ts") - $"prev_us" > gapUs, 1L).otherwise(0L))
      .withColumn("island_id", sum($"is_start").over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy($"user_id", $"island_id")
      .agg(
        count(lit(1)).as("n_events"),
        min(unix_micros($"ts")).as("start_us"),
        max(unix_micros($"ts")).as("end_us"))
      .withColumn("span_us", $"end_us" - $"start_us")
      .orderBy($"user_id", $"island_id")
  }

  private val islandsSql =
    s"""WITH flagged AS (
       |  SELECT user_id, event_id, ts,
       |    CASE WHEN lag(ts) OVER w IS NULL
       |      OR epoch_us(ts) - epoch_us(lag(ts) OVER w)
       |         > ${IslandGapMin * 60L * 1000000L}
       |      THEN 1 ELSE 0 END AS is_start
       |  FROM events
       |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
       |numbered AS (
       |  SELECT user_id, ts,
       |    CAST(SUM(is_start) OVER (PARTITION BY user_id ORDER BY ts, event_id
       |      ROWS UNBOUNDED PRECEDING) AS BIGINT) AS island_id
       |  FROM flagged)
       |SELECT user_id, island_id, COUNT(*) AS n_events,
       |  MIN(epoch_us(ts)) AS start_us, MAX(epoch_us(ts)) AS end_us,
       |  MAX(epoch_us(ts)) - MIN(epoch_us(ts)) AS span_us
       |FROM numbered GROUP BY 1, 2 ORDER BY user_id, island_id""".stripMargin

  // ----------------------------------------------------------------- q_debounce
  /** Gap-based event debouncing — the stream-hygiene pass that drops
    * same-type events re-fired within a cooldown of the PREVIOUS RAW
    * event (one lag window; the "within cooldown of the last KEPT
    * event" variant is a recursive fold, deliberately not this — the
    * lag spelling is the one that runs as a single window at scale).
    * Emits per-type retention accounting. Timestamp arithmetic is
    * integer microseconds; nothing to round. */
  val DebounceCooldownMin = 10

  private def debounce(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val w = Window.partitionBy($"user_id", $"event_type")
      .orderBy($"ts", $"event_id")
    Tables.events(s, dir)
      .withColumn("prev_ts", lag($"ts", 1).over(w))
      .withColumn("kept", $"prev_ts".isNull ||
        unix_micros($"ts") - unix_micros($"prev_ts") >
          DebounceCooldownMin * 60L * 1000000L)
      .groupBy($"event_type")
      .agg(
        count(lit(1)).as("n_total"),
        sum(when($"kept", 1L).otherwise(0L)).as("n_kept"),
        sum(when($"kept", 0L).otherwise(1L)).as("n_dropped"))
      .orderBy($"event_type")
  }

  private val debounceSql =
    s"""WITH d AS (
       |  SELECT event_type,
       |    lag(ts) OVER (PARTITION BY user_id, event_type
       |      ORDER BY ts, event_id) AS prev_ts, ts
       |  FROM events)
       |SELECT event_type, COUNT(*) AS n_total,
       |  CAST(SUM(CASE WHEN prev_ts IS NULL
       |    OR epoch_us(ts) - epoch_us(prev_ts) > ${DebounceCooldownMin * 60L * 1000000L}
       |    THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
       |  CAST(SUM(CASE WHEN prev_ts IS NULL
       |    OR epoch_us(ts) - epoch_us(prev_ts) > ${DebounceCooldownMin * 60L * 1000000L}
       |    THEN 0 ELSE 1 END) AS BIGINT) AS n_dropped
       |FROM d GROUP BY event_type ORDER BY event_type""".stripMargin

  // ------------------------------------------------------------ q_cohort_retention
  /** Cohort retention triangle: customers grouped by first-order month,
    * tracked by how many are active N months later. Retention is ppm via
    * integer DIV against the cohort size, so every cell is an integer —
    * bit-stable cross-engine.
    *
    * Scale shape: orders reduce to DISTINCT (custkey, month) first (one
    * shuffle with map-side partials, output ≤ customers × months), the
    * cohort frame is a second aggregation on the SAME custkey key (AQE
    * reuses the exchange), the custkey-keyed join never touches raw
    * orders, and the final (cohort, months_since) rollup plus the
    * cohort-size join are triangle-sized (months²) — broadcast. */
  private def cohortRetention(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val active = Tables.orders(s, dir)
      .select($"o_custkey",
        date_format($"o_orderdate", "yyyy-MM").as("month"))
      .distinct()
    val cohorts = active.groupBy($"o_custkey")
      .agg(min($"month").as("cohort_month"))
    val cells = active.join(cohorts, Seq("o_custkey"))
      .withColumn("months_since",
        months_between(
          to_date(concat($"month", lit("-01"))),
          to_date(concat($"cohort_month", lit("-01")))).cast("long"))
      .groupBy($"cohort_month", $"months_since")
      .agg(count(lit(1)).as("n_active"))
    val sizes = cohorts.groupBy($"cohort_month")
      .agg(count(lit(1)).as("cohort_n"))
    cells.join(broadcast(sizes), Seq("cohort_month"))
      .withColumn("retention_ppm",
        expr("n_active * 1000000 DIV cohort_n"))
      .select($"cohort_month", $"months_since", $"n_active", $"cohort_n",
        $"retention_ppm")
      .orderBy($"cohort_month", $"months_since")
  }

  private val cohortRetentionSql =
    """WITH active AS (
      |  SELECT DISTINCT o_custkey, strftime(o_orderdate, '%Y-%m') AS month
      |  FROM orders),
      |cohorts AS (
      |  SELECT o_custkey, MIN(month) AS cohort_month
      |  FROM active GROUP BY 1),
      |cells AS (
      |  SELECT cohort_month,
      |    date_diff('month', CAST(cohort_month || '-01' AS DATE),
      |              CAST(month || '-01' AS DATE)) AS months_since,
      |    COUNT(*) AS n_active
      |  FROM active JOIN cohorts USING (o_custkey)
      |  GROUP BY 1, 2),
      |sizes AS (
      |  SELECT cohort_month, COUNT(*) AS cohort_n FROM cohorts GROUP BY 1)
      |SELECT cohort_month, months_since, n_active, cohort_n,
      |  n_active * 1000000 // cohort_n AS retention_ppm
      |FROM cells JOIN sizes USING (cohort_month)
      |ORDER BY cohort_month, months_since""".stripMargin

  // ----------------------------------------------------------------- q_funnel
  // audited-bnlj(q_funnel): build side = 1-row global-aggregate broadcast — audited in PlanAuditSpec/BnljAudit
  /** Ordered event funnel over the event stream: signup → view → click →
    * purchase, each step's timestamp strictly after the previous step's.
    * This is the EXACT chained formulation — min(view AFTER signup), not
    * the min-per-type approximation that miscounts a user whose only
    * pre-signup view precedes a post-signup one. Emits one row per stage
    * with user counts and ppm conversion vs stage 1 (integer DIV).
    *
    * Scale shape: each stage is a user_id-keyed aggregation over the
    * slim (user, ts) projection of one event type, joined to the
    * previous stage's one-row-per-user frame on the SAME key — four
    * aggregations, all partial-agg'd map-side, no raw-event re-shuffle
    * across stages at any point. Event-time ties (ts equal to the
    * previous stage) are excluded on both engines identically: the data
    * is exactly µs-precision, which both engines compare losslessly. */
  /** Kernel: per-stage (user_id, t_prev = first completion time) frames
    * for an ordered step list over an (user_id, event_type, ts) frame —
    * stage k+1 counts only events strictly after the user's stage-k
    * completion. */
  def funnelUsers(e: DataFrame, steps: Seq[String]): Seq[(String, DataFrame)] = {
    require(steps.nonEmpty, "funnel needs at least one step")
    def stageAfter(prev: DataFrame, eventType: String): DataFrame =
      e.filter(col("event_type") === eventType)
        .join(prev, Seq("user_id"))
        .filter(col("ts") > col("t_prev"))
        .groupBy(col("user_id")).agg(min(col("ts")).as("t"))
        .select(col("user_id"), col("t").as("t_prev"))
    val first = e.filter(col("event_type") === steps.head)
      .groupBy(col("user_id")).agg(min(col("ts")).as("t_prev"))
    steps.tail.scanLeft(steps.head -> first) { case ((_, prev), step) =>
      step -> stageAfter(prev, step)
    }
  }

  private def funnel(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val e = Tables.events(s, dir).select($"user_id", $"event_type", $"ts")
    val stages = funnelUsers(e, Seq("signup", "view", "click", "purchase"))
    val counts = stages.zipWithIndex
      .map { case ((step, df), i) =>
        df.agg(count(lit(1)).as("n_users"))
          .select(lit(s"${i + 1}_$step").as("stage"), $"n_users")
      }
      .reduce(_.unionAll(_))
    val base = stages.head._2.agg(count(lit(1)).as("base_n"))
    counts.crossJoin(broadcast(base))
      .withColumn("conversion_ppm", expr("n_users * 1000000 DIV base_n"))
      .select($"stage", $"n_users", $"conversion_ppm")
      .orderBy($"stage")
  }

  private val funnelSql =
    """WITH s1 AS (
      |  SELECT user_id, MIN(ts) AS t FROM events
      |  WHERE event_type = 'signup' GROUP BY 1),
      |s2 AS (
      |  SELECT e.user_id, MIN(e.ts) AS t
      |  FROM events e JOIN s1 USING (user_id)
      |  WHERE e.event_type = 'view' AND e.ts > s1.t GROUP BY 1),
      |s3 AS (
      |  SELECT e.user_id, MIN(e.ts) AS t
      |  FROM events e JOIN s2 USING (user_id)
      |  WHERE e.event_type = 'click' AND e.ts > s2.t GROUP BY 1),
      |s4 AS (
      |  SELECT e.user_id, MIN(e.ts) AS t
      |  FROM events e JOIN s3 USING (user_id)
      |  WHERE e.event_type = 'purchase' AND e.ts > s3.t GROUP BY 1),
      |counts AS (
      |  SELECT '1_signup' AS stage, COUNT(*) AS n_users FROM s1
      |  UNION ALL SELECT '2_view', COUNT(*) FROM s2
      |  UNION ALL SELECT '3_click', COUNT(*) FROM s3
      |  UNION ALL SELECT '4_purchase', COUNT(*) FROM s4)
      |SELECT stage, n_users,
      |  n_users * 1000000 // (SELECT COUNT(*) FROM s1) AS conversion_ppm
      |FROM counts ORDER BY stage""".stripMargin

  // ----------------------------------------------------------- q_traj_dedup
  /** Behavioral-trajectory deduplication — the sequence-level dedup an
    * agent-training pipeline runs over interaction logs: a trajectory is
    * one user-day's event-type sequence in event order, and byte-equal
    * trajectories across users/days are duplicate behavior patterns
    * (training on millions of identical "view>click>purchase" traces
    * is the sequence version of duplicate documents). Reports each
    * duplicated trajectory with occurrence and distinct-user counts —
    * top 50 by (n_sessions, traj), a unique total order.
    *
    * Event order within a day is (ts, event_id) — event_id breaks
    * same-µs ties identically on both engines.
    *
    * Scale shape: ONE (user, day)-keyed aggregation builds trajectories
    * (map-side partial collect), then one slim traj-keyed count — the
    * trajectory frame is sessions-sized, carries short type strings
    * (at 100 TB: the md5 of the trajectory, same as every other digest
    * path here), and never re-touches raw events. */
  private def trajDedup(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.events(s, dir)
      .select($"user_id", to_date($"ts").as("day"), $"ts", $"event_id",
        $"event_type")
      .groupBy($"user_id", $"day")
      .agg(sort_array(collect_list(
        struct($"ts", $"event_id", $"event_type"))).as("evs"))
      .select($"user_id",
        concat_ws(">", expr("transform(evs, x -> x.event_type)")).as("traj"))
      .groupBy($"traj")
      .agg(count(lit(1)).as("n_sessions"),
        count_distinct($"user_id").as("n_users"),
        min($"user_id").as("example_user"))
      .filter($"n_sessions" >= 2)
      .orderBy($"n_sessions".desc, $"traj")
      .limit(50)
  }

  private val trajDedupSql =
    """WITH t AS (
      |  SELECT user_id, CAST(ts AS DATE) AS day,
      |    string_agg(event_type, '>' ORDER BY ts, event_id) AS traj
      |  FROM events GROUP BY user_id, CAST(ts AS DATE))
      |SELECT traj, count(*) AS n_sessions,
      |  count(DISTINCT user_id) AS n_users, min(user_id) AS example_user
      |FROM t GROUP BY traj HAVING count(*) >= 2
      |ORDER BY n_sessions DESC, traj LIMIT 50""".stripMargin

  // ------------------------------------------------------------------ q_markov
  /** First-order Markov transition matrix over per-user event sequences —
    * the behavioral summary a sequence-model pipeline extracts from
    * interaction logs (and the sanity check on synthetic trajectory
    * generators: does the generated chain match the observed one?). Each
    * user's events are ordered by (ts, event_id) — event_id breaks
    * same-µs ties identically on both engines — and every consecutive
    * pair contributes one (from_type, to_type) transition. Output: the
    * full transition-count matrix with per-from-state row totals and
    * transition probability in exact ppm (integer DIV — bit-stable).
    *
    * Scale shape: ONE window pass partitioned by user_id (per-task state
    * is one user's slim (ts, event_id, type) rows; users are the natural
    * parallelism unit and no global sort exists), then one aggregation
    * to the |types|²-sized matrix with map-side partials; the row-total
    * rejoin is matrix-sized on both sides and broadcasts. Raw events
    * shuffle exactly once (the user_id window), matching the reference's
    * per-entity processing model (cleaning.py's per-company frames). */
  private def markov(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val wu = Window.partitionBy($"user_id").orderBy($"ts", $"event_id")
    val trans = Tables.events(s, dir)
      .select($"user_id", $"ts", $"event_id", $"event_type")
      .withColumn("to_type", lead($"event_type", 1).over(wu))
      .filter($"to_type".isNotNull)
      .groupBy($"event_type".as("from_type"), $"to_type")
      .agg(count(lit(1)).as("n"))
    val totals = trans.groupBy($"from_type").agg(sum($"n").cast("long").as("row_total"))
    trans.join(broadcast(totals), Seq("from_type"))
      .select($"from_type", $"to_type", $"n", $"row_total",
        expr("n * 1000000 DIV row_total").as("p_ppm"))
      .orderBy($"from_type", $"to_type")
  }

  private val markovSql =
    """WITH seq AS (
      |  SELECT event_type AS from_type,
      |    LEAD(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id)
      |      AS to_type
      |  FROM events),
      |trans AS (
      |  SELECT from_type, to_type, COUNT(*) AS n FROM seq
      |  WHERE to_type IS NOT NULL GROUP BY 1, 2),
      |tot AS (
      |  SELECT from_type, CAST(SUM(n) AS BIGINT) AS row_total
      |  FROM trans GROUP BY 1)
      |SELECT from_type, to_type, n, row_total,
      |  n * 1000000 // row_total AS p_ppm
      |FROM trans JOIN tot USING (from_type)
      |ORDER BY from_type, to_type""".stripMargin

  // ------------------------------------------------------------------- q_cusum
  /** CUSUM changepoint statistic per market segment over the monthly
    * revenue series — the drift detector that answers "did the level
    * shift, and when?". The classic statistic max_i |Σ_{j≤i}(x_j − x̄)|
    * is made division-free by scaling with n: D_i = n·prefix_i − i·S
    * (prefix in exact DECIMAL-routed cents), so every intermediate is a
    * bit-stable integer on both engines, and the argmax month is
    * deterministic (ties broken by earliest month).
    *
    * Scale shape: one fact aggregation to (segment, month) with
    * map-side partials — the only corpus-scale step; the window pass
    * and argmax pick run on the months-per-segment-sized frame. */
  private def cusum(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val monthly = Tables.orders(s, dir)
      .join(Tables.customer(s, dir), $"o_custkey" === $"c_custkey")
      .groupBy($"c_mktsegment",
        date_format($"o_orderdate", "yyyy-MM").as("month"))
      .agg((sum($"o_totalprice".cast(DecimalType(28, 2))) * 100)
        .cast("long").as("cents"))
    val wOrd = Window.partitionBy($"c_mktsegment").orderBy($"month")
    val wAll = Window.partitionBy($"c_mktsegment")
    val scored = monthly
      .withColumn("i", row_number().over(wOrd))
      .withColumn("prefix", sum($"cents").over(wOrd))
      .withColumn("n", count(lit(1)).over(wAll))
      .withColumn("s_total", sum($"cents").over(wAll))
      .withColumn("d", abs($"n" * $"prefix" - $"i" * $"s_total"))
    val wPick = Window.partitionBy($"c_mktsegment").orderBy($"d".desc, $"month")
    scored.withColumn("rk", row_number().over(wPick))
      .filter($"rk" === 1)
      .select($"c_mktsegment", $"n".as("n_months"),
        $"s_total".as("total_cents"), $"d".as("cusum_max"),
        $"month".as("cp_month"))
      .orderBy($"c_mktsegment")
  }

  private val cusumSql =
    """WITH monthly AS (
      |  SELECT c_mktsegment, strftime(o_orderdate, '%Y-%m') AS month,
      |    CAST(SUM(CAST(o_totalprice AS DECIMAL(28,2))) * 100 AS BIGINT)
      |      AS cents
      |  FROM orders JOIN customer ON o_custkey = c_custkey
      |  GROUP BY 1, 2),
      |scored AS (
      |  SELECT c_mktsegment, month,
      |    ROW_NUMBER() OVER (PARTITION BY c_mktsegment ORDER BY month) AS i,
      |    CAST(SUM(cents) OVER (PARTITION BY c_mktsegment ORDER BY month)
      |      AS BIGINT) AS prefix,
      |    COUNT(*) OVER (PARTITION BY c_mktsegment) AS n,
      |    CAST(SUM(cents) OVER (PARTITION BY c_mktsegment) AS BIGINT)
      |      AS s_total
      |  FROM monthly),
      |d AS (
      |  SELECT c_mktsegment, month, n, s_total,
      |    ABS(n * prefix - i * s_total) AS d,
      |    ROW_NUMBER() OVER (PARTITION BY c_mktsegment
      |      ORDER BY ABS(n * prefix - i * s_total) DESC, month) AS rk
      |  FROM scored)
      |SELECT c_mktsegment, n AS n_months, s_total AS total_cents,
      |  d AS cusum_max, month AS cp_month
      |FROM d WHERE rk = 1 ORDER BY c_mktsegment""".stripMargin

  // ------------------------------------------------------------ q_kmv_distinct
  /** K-minimum-values distinct-count sketch (Bar-Yossef 2002) per
    * source vocabulary, plus the merged-union row — the mergeable
    * cardinality sketch family alongside q_approx_distinct's HLL
    * (universe: distinct customers per order priority, plus the
    * all-priorities union),
    * except HERE the whole sketch is deterministic and oracle-able:
    * hashes are md5-lower-64 (= DuckDB `md5_number_lower`), the sketch
    * IS the k smallest hash values, and the estimator
    * (M DIV h_(k)) · (k−1) is spelled with the identical truncating
    * division sequence on both engines (the first DIV keeps every
    * product inside a long). The union row demonstrates mergeability:
    * the union sketch is the k smallest over the concatenated hash
    * multisets — exactly what a 1000-executor merge would combine.
    * Emits the exact distinct count next to the estimate with the
    * signed error in ppm, so a sketch regression is a hash mismatch.
    * Groups with fewer than k distinct members have no k-th minimum;
    * per the standard KMV small-sketch rule their sketch holds every
    * value, so the estimate IS the exact count (LEFT join + fallback —
    * an inner join would silently drop them). The planted `__small__`
    * group keeps that branch driver-visible.
    *
    * Scale shape: DISTINCT (group, member) collapses map-side; ranking
    * the k minima is one window over the distinct-pair frame (per-task
    * state: one group's hash stream — at corpus scale, a min-k typed
    * aggregate makes even that O(k)); everything after is k-sized. */
  val KmvK = 64

  /** Members below this bound seed the planted `__small__` group —
    * chosen so the group has fewer than [[KmvK]] distinct members and
    * the exact-count fallback branch is driver-visible. */
  val SmallGroupBound = 50

  private def kmvDistinct(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    import graft.functions.TextFunctions
    val pairs = Tables.orders(s, dir)
      .select($"o_orderpriority".as("grp"), $"o_custkey".as("member"))
      .distinct()
    // `__small__` plants a group with < K distinct members so the
    // sketch-not-full fallback below is exercised, not just argued.
    val both = pairs.unionByName(
        pairs.select(lit("__union__").as("grp"), $"member").distinct())
      .unionByName(pairs.filter($"member" < SmallGroupBound)
        .select(lit("__small__").as("grp"), $"member").distinct())
    val hashed = both.select($"grp",
      TextFunctions.md5Lower64(concat(lit("kmv:"), $"member".cast("string")))
        .bitwiseAND(lit(Long.MaxValue)).as("h"))
    val wk = Window.partitionBy($"grp").orderBy($"h")
    val kth = hashed.withColumn("rn", row_number().over(wk))
      .filter($"rn" === KmvK)
      .select($"grp", $"h".as("kth_min"))
    val exact = both.groupBy($"grp").agg(count(lit(1)).as("exact_distinct"))
    // LEFT join + fallback: a group with < K distinct members has no
    // K-th minimum — its sketch holds every hash, so the standard KMV
    // small-sketch rule applies and the exact count IS the estimate
    // (err_ppm 0). An inner join here would silently drop such groups.
    exact.join(kth, Seq("grp"), "left")
      .select($"grp", $"exact_distinct", $"kth_min",
        when($"kth_min".isNotNull,
          expr(s"${Long.MaxValue} DIV kth_min") * (KmvK - 1))
          .otherwise($"exact_distinct").as("est_distinct"))
      .withColumn("err_ppm",
        expr("(est_distinct - exact_distinct) * 1000000 DIV exact_distinct"))
      .orderBy($"grp")
  }

  private val kmvDistinctSql =
    s"""WITH pairs AS (
       |  SELECT DISTINCT o_orderpriority AS grp, o_custkey AS member
       |  FROM orders),
       |both_v AS (
       |  SELECT grp, member FROM pairs
       |  UNION ALL SELECT DISTINCT '__union__' AS grp, member FROM pairs
       |  UNION ALL SELECT DISTINCT '__small__' AS grp, member FROM pairs
       |    WHERE member < $SmallGroupBound),
       |hashed AS (
       |  SELECT grp,
       |    CAST(md5_number_lower('kmv:' || CAST(member AS VARCHAR))
       |      & ${Long.MaxValue}::UBIGINT AS BIGINT) AS h
       |  FROM both_v),
       |kth AS (
       |  SELECT grp, h AS kth_min FROM (
       |    SELECT grp, h,
       |      ROW_NUMBER() OVER (PARTITION BY grp ORDER BY h) AS rn
       |    FROM hashed)
       |  WHERE rn = $KmvK),
       |exact AS (
       |  SELECT grp, COUNT(*) AS exact_distinct FROM both_v GROUP BY 1),
       |est AS (
       |  SELECT e.grp, e.exact_distinct, k.kth_min,
       |    COALESCE((${Long.MaxValue} // k.kth_min) * ${KmvK - 1},
       |      e.exact_distinct) AS est_distinct
       |  FROM exact e LEFT JOIN kth k ON e.grp = k.grp)
       |SELECT grp, exact_distinct, kth_min, est_distinct,
       |  (est_distinct - exact_distinct) * 1000000 // exact_distinct
       |    AS err_ppm
       |FROM est ORDER BY grp""".stripMargin

  // ---------------------------------------------------------- q_kmv_jaccard
  /** KMV SET ALGEBRA — the mergeability q_kmv_distinct demonstrates for
    * union, completed for intersection (Beyer 2007): from the two
    * per-set sketches alone (k smallest member hashes of the URGENT vs
    * HIGH customer sets), the union sketch is the k smallest of the
    * hash union, Ĵ = |S_U ∩ S_A ∩ S_B| / k_U in ppm, and the
    * intersection estimate is matches·Û DIV k_U (one division — not
    * Ĵ·Û re-rounded). Exact |A|, |B|, |A∩B| ride along with the signed
    * estimator error, so a drifted sketch is a hash mismatch, and the
    * small-sketch rule (k_U = union sketch size when |A∪B| < k → the
    * estimate degrades to exact) is the same LEFT-fallback as
    * q_kmv_distinct. Hashing and estimator spelling are byte-shared
    * with q_kmv_distinct ("kmv:" seed, md5-lower-64, (M DIV h_k)·(k−1)).
    *
    * Scale shape: the per-set sketches are one distinct-pair collapse +
    * one grp-partitioned rank; everything downstream is ≤ 2k rows. The
    * three exact counts are 1-row broadcasts crossed onto the 1-row
    * sketch frame. */
  // audited-bnlj(q_kmv_jaccard): 1-row exact-count broadcasts onto the 1-row sketch-stats frame
  // audited-global-window(q_kmv_jaccard): union-sketch rank frame = distinct hashes of two k-sketches (<= 2k rows by construction; the constant 'U' partition key folds away)
  private def kmvJaccard(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    import graft.functions.TextFunctions
    val o = Tables.orders(s, dir)
    def setOf(p: String, tag: String) = o
      .filter($"o_orderpriority" === p)
      .select(lit(tag).as("grp"), $"o_custkey".as("member")).distinct()
    val a = setOf("1-URGENT", "A")
    val b = setOf("2-HIGH", "B")
    val hashed = a.unionByName(b).select($"grp",
      TextFunctions.md5Lower64(concat(lit("kmv:"), $"member".cast("string")))
        .bitwiseAND(lit(Long.MaxValue)).as("h"))
    val wk = Window.partitionBy($"grp").orderBy($"h")
    val sk = hashed.withColumn("rn", row_number().over(wk))
      .filter($"rn" <= KmvK)
    val su = sk.select($"h").distinct()
      .withColumn("grp", lit("U"))
      .withColumn("rn", row_number().over(wk))
      .filter($"rn" <= KmvK)
    val stats = su.select($"h", $"rn")
      .join(sk.filter($"grp" === "A").select($"h", lit(1L).as("in_a")),
        Seq("h"), "left")
      .join(sk.filter($"grp" === "B").select($"h", lit(1L).as("in_b")),
        Seq("h"), "left")
      .agg(count(lit(1)).as("k_u"),
        coalesce(sum($"in_a" * $"in_b"), lit(0L)).as("matches"),
        max(when($"rn" === KmvK, $"h")).as("kth_u"))
    val ea = a.agg(count(lit(1)).as("exact_a"))
    val eb = b.agg(count(lit(1)).as("exact_b"))
    val ei = a.select($"member")
      .join(b.select($"member"), Seq("member"))
      .agg(count(lit(1)).as("exact_inter"))
    stats.crossJoin(broadcast(ea)).crossJoin(broadcast(eb))
      .crossJoin(broadcast(ei))
      .withColumn("est_union",
        when($"kth_u".isNotNull,
          expr(s"${Long.MaxValue} DIV kth_u") * (KmvK - 1))
          .otherwise($"k_u"))
      .withColumn("j_est_ppm", expr("matches * 1000000 DIV k_u"))
      .withColumn("est_inter", expr("matches * est_union DIV k_u"))
      .withColumn("j_exact_ppm", expr(
        "exact_inter * 1000000 DIV nullif(exact_a + exact_b - exact_inter, 0)"))
      .withColumn("err_ppm", expr(
        "(est_inter - exact_inter) * 1000000 DIV nullif(exact_inter, 0)"))
      .select($"exact_a", $"exact_b", $"exact_inter", $"k_u", $"matches",
        $"j_est_ppm", $"j_exact_ppm", $"est_union", $"est_inter",
        $"err_ppm")
  }

  private val kmvJaccardSql =
    s"""WITH a AS (
       |  SELECT DISTINCT 'A' AS grp, o_custkey AS member FROM orders
       |  WHERE o_orderpriority = '1-URGENT'),
       |b AS (
       |  SELECT DISTINCT 'B' AS grp, o_custkey AS member FROM orders
       |  WHERE o_orderpriority = '2-HIGH'),
       |hashed AS (
       |  SELECT grp,
       |    CAST(md5_number_lower('kmv:' || CAST(member AS VARCHAR))
       |      & ${Long.MaxValue}::UBIGINT AS BIGINT) AS h
       |  FROM (SELECT * FROM a UNION ALL SELECT * FROM b)),
       |sk AS (
       |  SELECT grp, h FROM (
       |    SELECT grp, h,
       |      ROW_NUMBER() OVER (PARTITION BY grp ORDER BY h) AS rn
       |    FROM hashed)
       |  WHERE rn <= $KmvK),
       |su AS (
       |  SELECT h, rn FROM (
       |    SELECT h, ROW_NUMBER() OVER (ORDER BY h) AS rn
       |    FROM (SELECT DISTINCT h FROM sk))
       |  WHERE rn <= $KmvK),
       |stats AS (
       |  SELECT COUNT(*) AS k_u,
       |    COALESCE(CAST(SUM(ia.one * ib.one) AS BIGINT), 0) AS matches,
       |    MAX(CASE WHEN su.rn = $KmvK THEN su.h END) AS kth_u
       |  FROM su
       |  LEFT JOIN (SELECT h, 1 AS one FROM sk WHERE grp = 'A') ia
       |    ON su.h = ia.h
       |  LEFT JOIN (SELECT h, 1 AS one FROM sk WHERE grp = 'B') ib
       |    ON su.h = ib.h),
       |exact AS (
       |  SELECT (SELECT COUNT(*) FROM a) AS exact_a,
       |    (SELECT COUNT(*) FROM b) AS exact_b,
       |    (SELECT COUNT(*) FROM a JOIN b USING (member)) AS exact_inter),
       |est AS (
       |  SELECT exact_a, exact_b, exact_inter, k_u, matches,
       |    matches * 1000000 // k_u AS j_est_ppm,
       |    exact_inter * 1000000 // NULLIF(exact_a + exact_b - exact_inter, 0)
       |      AS j_exact_ppm,
       |    COALESCE((${Long.MaxValue} // kth_u) * ${KmvK - 1}, k_u)
       |      AS est_union
       |  FROM stats CROSS JOIN exact)
       |SELECT exact_a, exact_b, exact_inter, k_u, matches, j_est_ppm,
       |  j_exact_ppm, est_union,
       |  matches * est_union // k_u AS est_inter,
       |  (matches * est_union // k_u - exact_inter) * 1000000
       |    // NULLIF(exact_inter, 0) AS err_ppm
       |FROM est""".stripMargin

  // --------------------------------------------------------------- q_bootstrap
  // audited-global-window(q_bootstrap): frame = fixed replicate count frame — bound audited in PlanAuditSpec/UnpartitionedWindowAudit
  /** Poisson bootstrap of the mean order value — the uncertainty
    * quantification a pipeline attaches to any headline statistic
    * ("mean quality score ± what?"). Classical resampling needs n draws
    * WITH replacement per replica — undistributable; the Poisson
    * bootstrap (Chamandy 2012, the web-scale standard) replaces it with
    * an independent per-row replica weight ~ Poisson(1), here a
    * DETERMINISTIC md5-driven draw from the Poisson(1) pmf quantized to
    * thousandths (0:.368, 1:.368, 2:.184, 3:.061, 4:.019) so both
    * engines produce the identical resample. Emits one row per replica
    * (effective n, DECIMAL-routed total cents, integer mean) plus the
    * replica's CI rank — the p05/p95 replica means ARE the bootstrap
    * interval.
    *
    * Scale shape: row-local explode to B=20 (replica, weight) pairs —
    * a bounded fan-out, the B-replica cost any bootstrap pays — then
    * ONE aggregation with map-side partials straight to the B-row
    * frame; the rank window runs on 20 rows. */
  val BootstrapB = 20

  private def bootstrap(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    import graft.functions.TextFunctions
    val reps = Tables.orders(s, dir)
      .select($"o_orderkey",
        ($"o_totalprice".cast(DecimalType(18, 2)) * 100)
          .cast("long").as("cents"),
        explode(sequence(lit(0), lit(BootstrapB - 1))).as("b"))
    val u = TextFunctions
      .md5Lower64(concat(lit("boot:"), $"b".cast("string"), lit(":"),
        $"o_orderkey".cast("string")))
      .bitwiseAND(lit(Long.MaxValue)) % 1000L
    val w = when(u < 368, 0L).when(u < 736, 1L).when(u < 920, 2L)
      .when(u < 981, 3L).otherwise(4L)
    val perRep = reps
      .select($"b".cast("long").as("b"), w.as("w"), ($"cents" * w).as("wc"))
      .groupBy($"b")
      .agg(sum($"w").as("n_eff"), sum($"wc").as("total_cents"))
      .withColumn("mean_cents", expr("total_cents DIV n_eff"))
    perRep
      .withColumn("ci_rank",
        row_number().over(Window.orderBy($"mean_cents", $"b")))
      .orderBy($"b")
  }

  private val bootstrapSql =
    s"""WITH reps AS (
       |  SELECT b,
       |    CASE WHEN u < 368 THEN 0 WHEN u < 736 THEN 1 WHEN u < 920 THEN 2
       |         WHEN u < 981 THEN 3 ELSE 4 END AS w,
       |    cents
       |  FROM (
       |    SELECT o_orderkey,
       |      CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)
       |        AS cents,
       |      r.b,
       |      CAST(md5_number_lower(
       |          'boot:' || CAST(r.b AS VARCHAR) || ':'
       |          || CAST(o_orderkey AS VARCHAR))
       |        & ${Long.MaxValue}::UBIGINT AS BIGINT) % 1000 AS u
       |    FROM orders
       |    CROSS JOIN (SELECT unnest(range(0, $BootstrapB)) AS b) r)),
       |agg AS (
       |  SELECT b, CAST(SUM(w) AS BIGINT) AS n_eff,
       |    CAST(SUM(cents * w) AS BIGINT) AS total_cents
       |  FROM reps GROUP BY 1)
       |SELECT b, n_eff, total_cents,
       |  total_cents // n_eff AS mean_cents,
       |  CAST(ROW_NUMBER() OVER (ORDER BY total_cents // n_eff, b) AS INT)
       |    AS ci_rank
       |FROM agg ORDER BY b""".stripMargin

  // --------------------------------------------------------------------- q_acf
  // audited-global-window(q_acf): frame = month-lag grid — bound audited in PlanAuditSpec/UnpartitionedWindowAudit
  // audited-bnlj(q_acf): build side = 1-row global-aggregate broadcast — audited in PlanAuditSpec/BnljAudit
  /** Autocorrelation function of the monthly revenue series at lags
    * 1..6 — the serial-dependence diagnostic behind seasonality and
    * forecast-model choice (q_seasonality assumes a period; the ACF is
    * what REVEALS one). Mean-centering is made division-free by the
    * q_cusum n-scaling: ndx_i = n·x_i − S is an exact integer in cents,
    * and r_k = Σ ndx_i·ndx_{i+k} / Σ ndx_i² — the n² factors cancel, so
    * both engines run identical integer sums (DECIMAL(19)×DECIMAL(19)
    * products) and one final 9dp-rounded double division (the
    * q_assortativity recipe).
    *
    * Scale shape: ONE corpus-scale aggregation collapses the fact table
    * to the months-sized series with map-side partials; the lag
    * pairing, windows, and sums all run on that tiny frame (a
    * months-grid never exceeds thousands of rows at any corpus size —
    * the single-partition window is bounded by construction). */
  val AcfMaxLag = 6

  private def acf(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val monthly = Tables.orders(s, dir)
      .groupBy(date_format($"o_orderdate", "yyyy-MM").as("month"))
      .agg((sum($"o_totalprice".cast(DecimalType(28, 2))) * 100)
        .cast("long").as("cents"))
    val w = Window.orderBy($"month")
    val d19 = DecimalType(19, 0)
    val m = monthly
      .withColumn("i", row_number().over(w))
      .withColumn("n", count(lit(1)).over(Window.partitionBy()))
      .withColumn("s_total", sum($"cents").over(Window.partitionBy()))
      .select($"i", $"n", ($"n" * $"cents" - $"s_total").cast(d19).as("ndx"))
    val den = m.agg(sum($"ndx" * $"ndx").cast(DecimalType(38, 0)).as("den"),
      max($"n").as("n_months"))
    val a = m.select($"i", $"ndx".as("ndx_a"))
      .withColumn("lag_k", explode(sequence(lit(1), lit(AcfMaxLag))))
    val num = a.join(m.select($"i".as("j"), $"ndx".as("ndx_b")),
        $"j" === $"i" + $"lag_k")
      .groupBy($"lag_k")
      .agg(count(lit(1)).as("n_pairs"),
        sum($"ndx_a" * $"ndx_b").cast(DecimalType(38, 0)).as("num"))
    // num/den exceed int64 (cents² sums): emit the exact integers as
    // STRINGS — decimal→varchar is digit-exact on both engines, where
    // decimal→pandas would lose them to a float
    num.crossJoin(broadcast(den))
      .select($"lag_k", $"n_months", $"n_pairs",
        $"num".cast("string").as("num"), $"den".cast("string").as("den"),
        round($"num".cast("double") / $"den".cast("double"), 9).as("acf"))
      .orderBy($"lag_k")
  }

  private val acfSql =
    s"""WITH monthly AS (
       |  SELECT strftime(o_orderdate, '%Y-%m') AS month,
       |    CAST(SUM(CAST(o_totalprice AS DECIMAL(28,2))) * 100 AS BIGINT)
       |      AS cents
       |  FROM orders GROUP BY 1),
       |m AS (
       |  SELECT ROW_NUMBER() OVER (ORDER BY month) AS i,
       |    COUNT(*) OVER () AS n,
       |    CAST(COUNT(*) OVER () * cents - SUM(cents) OVER ()
       |      AS DECIMAL(19,0)) AS ndx
       |  FROM monthly),
       |den AS (
       |  SELECT CAST(SUM(ndx * ndx) AS DECIMAL(38,0)) AS den,
       |    MAX(n) AS n_months FROM m),
       |num AS (
       |  SELECT lag_k, COUNT(*) AS n_pairs,
       |    CAST(SUM(a.ndx * b.ndx) AS DECIMAL(38,0)) AS num
       |  FROM m a
       |  CROSS JOIN (SELECT unnest(generate_series(1, $AcfMaxLag)) AS lag_k)
       |  JOIN m b ON b.i = a.i + lag_k
       |  GROUP BY lag_k)
       |SELECT lag_k, n_months, n_pairs,
       |  CAST(num AS VARCHAR) AS num, CAST(den AS VARCHAR) AS den,
       |  round(CAST(num AS DOUBLE) / CAST(den AS DOUBLE), 9) AS acf
       |FROM num CROSS JOIN den ORDER BY lag_k""".stripMargin

  // --------------------------------------------------------------- q_count_min
  /** Count-Min sketch (Cormode–Muthukrishnan 2005) over the corpus word
    * stream — the bounded-memory frequency table that answers "how often
    * does term X occur?" without holding the vocabulary: d=4 hash rows ×
    * w=512 buckets of summed counts, point estimate = min over rows,
    * overestimate-only by construction. Like q_kmv_distinct the whole
    * sketch is DETERMINISTIC and oracle-able: bucket hashes are
    * md5-lower-64 (= DuckDB md5_number_lower) masked non-negative mod w,
    * every cell is an exact integer sum, and the audit emits est − exact
    * (≥ 0 always — a negative value means the sketch is broken) plus the
    * error in ppm for the top-20 exact terms, so a hash-function or
    * merge regression is a driver-visible hash mismatch.
    *
    * Scale shape: the corpus reduces to (word, count) with map-side
    * partials — the only corpus-scale shuffle; the 2048-cell counter
    * frame aggregates from that and broadcasts back onto the probe
    * words. Cells sum counts, so sketches from disjoint partitions merge
    * by cell-wise addition — the mergeability a 1000-executor build
    * relies on. */
  /** Width deliberately UNDERSIZED for the fixture's 31-word vocabulary
    * (the q_bloom_fpr sizing logic): at w=512 nothing collides and the
    * overestimate column is vacuously zero; at w=32 roughly one probe in
    * seven inherits a colliding word's mass in all 4 rows, so the audit
    * measures real sketch error. Production sizing is w ≈ e/ε. */
  val CmDepth = 4
  val CmWidth = 32L
  val CmProbeK = 20

  private def countMin(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    import graft.functions.TextFunctions
    val wc = Tables.documents(s, dir)
      .select(explode(split($"text", " ", -1)).as("word"))
      .groupBy($"word").agg(count(lit(1)).as("c"))
    val hashed = wc
      .withColumn("j", explode(sequence(lit(0), lit(CmDepth - 1))))
      .withColumn("bucket",
        TextFunctions.md5Lower64(
          concat(lit("cm"), $"j".cast("string"), lit(":"), $"word"))
          .bitwiseAND(lit(Long.MaxValue)) % CmWidth)
    val counters = hashed.groupBy($"j", $"bucket").agg(sum($"c").as("cell"))
    val top = wc.orderBy($"c".desc, $"word").limit(CmProbeK)
    top
      .withColumn("j", explode(sequence(lit(0), lit(CmDepth - 1))))
      .withColumn("bucket",
        TextFunctions.md5Lower64(
          concat(lit("cm"), $"j".cast("string"), lit(":"), $"word"))
          .bitwiseAND(lit(Long.MaxValue)) % CmWidth)
      .join(broadcast(counters), Seq("j", "bucket"))
      .groupBy($"word", $"c").agg(min($"cell").as("n_est"))
      .select($"word", $"c".as("n_exact"), $"n_est",
        ($"n_est" - $"c").as("over_count"),
        expr("(n_est - c) * 1000000 DIV c").as("over_ppm"))
      .orderBy($"word")
  }

  private val countMinSql =
    s"""WITH wc AS (
       |  SELECT word, CAST(COUNT(*) AS BIGINT) AS c
       |  FROM (SELECT unnest(string_split(text, ' ')) AS word FROM documents)
       |  GROUP BY 1),
       |h AS (
       |  SELECT word, c, j,
       |    CAST(md5_number_lower('cm' || j || ':' || word)
       |      & ${Long.MaxValue}::UBIGINT AS BIGINT) % $CmWidth AS bucket
       |  FROM wc CROSS JOIN
       |    (SELECT unnest(generate_series(0, ${CmDepth - 1})) AS j)),
       |counters AS (
       |  SELECT j, bucket, CAST(SUM(c) AS BIGINT) AS cell
       |  FROM h GROUP BY 1, 2),
       |top AS (SELECT word, c FROM wc ORDER BY c DESC, word LIMIT $CmProbeK),
       |est AS (
       |  SELECT t.word, t.c, MIN(cell) AS n_est
       |  FROM top t
       |  JOIN h ON t.word = h.word
       |  JOIN counters USING (j, bucket)
       |  GROUP BY 1, 2)
       |SELECT word, c AS n_exact, n_est, n_est - c AS over_count,
       |  (n_est - c) * 1000000 // c AS over_ppm
       |FROM est ORDER BY word""".stripMargin

  // --------------------------------------------------------------- q_survival
  // audited-global-window(q_survival): frame = tenure-duration grid (calendar-bounded days) — bound audited in PlanAuditSpec/UnpartitionedWindowAudit
  // audited-bnlj(q_survival): build side = 1-row global-aggregate broadcast — audited in PlanAuditSpec/BnljAudit
  /** Kaplan–Meier customer survival curve over order activity — the
    * censoring-aware retention statistic (a naive churn rate treats
    * still-active customers as churned; KM removes them from the risk
    * set instead). A customer's duration is last-minus-first order
    * month; the event is churn (no order within the final
    * [[SurvivalHorizonMonths]] months of the corpus — later durations
    * are CENSORED). S(t) = Π_{u≤t} (1 − e_u/n_u) is evaluated as an
    * exact integer fold from a ppm seed (the q_clv recipe): each grid
    * step multiplies by (n_u − e_u) then integer-DIVs by n_u, and both
    * engines run the identical truncating sequence — the risk pair
    * (n−e, n) rides the fold PACKED into one long (n−e in the high 32
    * bits) because a fold accumulator and its list elements must share
    * one type on both engines.
    *
    * Scale shape: one fact aggregation to per-customer (first, last)
    * months, one aggregation to the duration grid; the fold runs per
    * grid row over the collected grid array (months-grid-sized, bounded
    * by construction — same contract as q_acf). */
  val SurvivalHorizonMonths = 3

  private def survival(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val m = months_between(date_trunc("month", $"o_orderdate"),
      to_date(lit("1995-01-01"))).cast("long")
    val per = Tables.orders(s, dir)
      .groupBy($"o_custkey")
      .agg(min(m).as("m_first"), max(m).as("m_last"))
    val horizon = per.agg(max($"m_last").as("m_max"))
    val durations = per.crossJoin(broadcast(horizon))
      .select(($"m_last" - $"m_first").as("t_dur"),
        ($"m_last" <= $"m_max" - SurvivalHorizonMonths).as("event"))
    val grid = durations.groupBy($"t_dur")
      .agg(count(lit(1)).as("n_at"),
        sum(when($"event", 1L).otherwise(0L)).as("e"))
      .withColumn("n_risk",
        sum($"n_at").over(Window.orderBy($"t_dur".desc)
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    val arr = grid.agg(sort_array(
      collect_list(struct($"t_dur", ($"n_risk" - $"e").as("ne"), $"n_risk".as("n"))))
      .as("a"))
    grid.crossJoin(broadcast(arr))
      .select($"t_dur", $"n_risk", $"e".as("n_events"),
        ($"n_at" - $"e").as("n_censored"),
        expr("""aggregate(
                  transform(filter(a, x -> x.t_dur <= t_dur),
                            x -> x.ne * 4294967296L + x.n),
                  CAST(1000000 AS BIGINT),
                  (acc, p) -> acc * (p DIV 4294967296L) DIV (p % 4294967296L))
             """).as("s_ppm"))
      .orderBy($"t_dur")
  }

  private val survivalSql =
    s"""WITH per AS (
       |  SELECT o_custkey,
       |    MIN(date_diff('month', DATE '1995-01-01',
       |        date_trunc('month', o_orderdate))) AS m_first,
       |    MAX(date_diff('month', DATE '1995-01-01',
       |        date_trunc('month', o_orderdate))) AS m_last
       |  FROM orders GROUP BY 1),
       |horizon AS (SELECT MAX(m_last) AS m_max FROM per),
       |durations AS (
       |  SELECT m_last - m_first AS t_dur,
       |    m_last <= m_max - $SurvivalHorizonMonths AS event
       |  FROM per CROSS JOIN horizon),
       |grid AS (
       |  SELECT t_dur, CAST(COUNT(*) AS BIGINT) AS n_at,
       |    CAST(SUM(CASE WHEN event THEN 1 ELSE 0 END) AS BIGINT) AS e
       |  FROM durations GROUP BY 1),
       |g2 AS (
       |  SELECT t_dur, n_at, e,
       |    CAST(SUM(n_at) OVER (ORDER BY t_dur DESC) AS BIGINT) AS n_risk
       |  FROM grid),
       |arr AS (
       |  SELECT list(struct_pack(t_dur := t_dur, ne := n_risk - e, n := n_risk)
       |              ORDER BY t_dur) AS a
       |  FROM g2)
       |SELECT g2.t_dur, g2.n_risk, g2.e AS n_events,
       |  g2.n_at - g2.e AS n_censored,
       |  list_reduce(
       |    list_prepend(CAST(1000000 AS BIGINT),
       |      list_transform(list_filter(a, x -> x.t_dur <= g2.t_dur),
       |                     x -> x.ne * 4294967296 + x.n)),
       |    (acc, p) -> acc * (p // 4294967296) // (p % 4294967296)) AS s_ppm
       |FROM g2 CROSS JOIN arr ORDER BY t_dur""".stripMargin

  // ------------------------------------------------------------ q_decile_share
  // audited-bnlj(q_decile_share): build side = 1-row global-aggregate broadcast — audited in PlanAuditSpec/BnljAudit
  /** Revenue concentration by customer decile — the Lorenz-curve table
    * behind "the top 10% of customers carry X% of revenue". Customers
    * rank by (spend, custkey) — a UNIQUE composite, so the decile cut is
    * deterministic — via the MULTI-KEY `Corpus.globalIndex`
    * range-partition path: no single-task global window at any corpus
    * size, and no fixed-width packed key to overflow (the tuple is
    * ordered directly, unlike the q_curriculum string key that needs an
    * overflow assert). Shares and cumulative shares are exact integer
    * ppm of DECIMAL-routed cents.
    *
    * Scale shape: one fact aggregation to per-customer spend, one range
    * repartition for the global rank, one decile rollup; the cumulative
    * window runs on the 10-row decile frame. */
  private def decileShare(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val per = Tables.orders(s, dir)
      .groupBy($"o_custkey")
      .agg((sum($"o_totalprice".cast(DecimalType(28, 2))) * 100)
        .cast("long").as("cents"))
      .select($"o_custkey", $"cents")
    val idx = Corpus.globalIndex(per, Seq($"cents", $"o_custkey")) // 1-based
    val n1 = idx.agg(count(lit(1)).as("n"))
    val deciles = idx.crossJoin(broadcast(n1))
      .withColumn("decile", expr("(global_idx - 1) * 10 DIV n"))
      .groupBy($"decile")
      .agg(count(lit(1)).as("n_customers"), sum($"cents").as("cents"))
    val tot = deciles.agg(sum($"cents").as("total_cents"))
    deciles.crossJoin(broadcast(tot))
      .withColumn("share_ppm", expr("cents * 1000000 DIV total_cents"))
      .withColumn("cum_share_ppm",
        sum($"share_ppm").over(Window.orderBy($"decile")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .select($"decile", $"n_customers", $"cents", $"share_ppm",
        $"cum_share_ppm")
      .orderBy($"decile")
  }

  private val decileShareSql =
    """WITH per AS (
      |  SELECT o_custkey,
      |    CAST(SUM(CAST(o_totalprice AS DECIMAL(28,2))) * 100 AS BIGINT)
      |      AS cents
      |  FROM orders GROUP BY 1),
      |idx AS (
      |  SELECT cents,
      |    ROW_NUMBER() OVER (ORDER BY cents, o_custkey) - 1 AS idx,
      |    COUNT(*) OVER () AS n
      |  FROM per),
      |d AS (
      |  SELECT idx * 10 // n AS decile, COUNT(*) AS n_customers,
      |    CAST(SUM(cents) AS BIGINT) AS cents
      |  FROM idx GROUP BY 1),
      |t AS (SELECT CAST(SUM(cents) AS BIGINT) AS total_cents FROM d)
      |SELECT decile, n_customers, cents,
      |  cents * 1000000 // total_cents AS share_ppm,
      |  CAST(SUM(cents * 1000000 // total_cents)
      |    OVER (ORDER BY decile) AS BIGINT) AS cum_share_ppm
      |FROM d CROSS JOIN t ORDER BY decile""".stripMargin

  // -------------------------------------------------------------------- q_rfm
  // audited-global-window(q_rfm): frame = R day-grid, F count-grid (M fallback documented) — bound audited in PlanAuditSpec/UnpartitionedWindowAudit
  // audited-bnlj(q_rfm): build side = 1-row global-aggregate broadcast — audited in PlanAuditSpec/BnljAudit
  /** RFM (recency / frequency / monetary) customer segmentation — the
    * classic retail scoring grid. Each dimension scores 1–5 by QUINTILE
    * cut from its VALUE HISTOGRAM (quintile = 5·cum_below DIV n — every
    * tie lands in one quintile, no per-row ranking; the q_spearman
    * histogram-rank recipe), recency inverted so 5 = most recent. The
    * output is the segment grid with customer counts and exact
    * DECIMAL-routed spend — at most 125 rows from any corpus size.
    *
    * Scale shape: one fact aggregation to per-customer (R, F, M); three
    * value-grid histogram frames with cumulative windows broadcast back;
    * one rollup to the segment grid. Caveat: R's day-grid and F's
    * count-grid are genuinely value-bounded, but M's grid is the
    * DISTINCT-SPEND histogram — near one row per customer, so its
    * unpartitioned cumulative window and broadcast-back stop being
    * "value-grid sized" on a large corpus. The fallback for that case is
    * the q_decile_share path: rank spend with the multi-key
    * `Corpus.globalIndex` (range-partitioned, no single-task window) and
    * cut quintiles from `(global_idx - 1) * 5 DIV n` — same scores for
    * unique spends, and ties across a quintile boundary are already
    * vanishingly rare in cents-grade money. (Same trade q_spearman
    * documents for its mann-whitney grid.) */
  private def rfm(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val maxDate = Tables.orders(s, dir).agg(max($"o_orderdate").as("dmax"))
    val per = Tables.orders(s, dir).crossJoin(broadcast(maxDate))
      .groupBy($"o_custkey")
      .agg(datediff(max($"dmax"), max($"o_orderdate")).as("r"),
        count(lit(1)).as("f"),
        (sum($"o_totalprice".cast(DecimalType(28, 2))) * 100)
          .cast("long").as("m"))
    val withN = (df: DataFrame, v: String) => {
      val w = Window.orderBy(col(v))
      df.groupBy(col(v)).agg(count(lit(1)).as("cnt"))
        .withColumn("cum", sum($"cnt").over(w))
        .withColumn("n", sum($"cnt").over(Window.partitionBy()))
        .select(col(v), expr("(cum - cnt) * 5 DIV n").as(s"q_$v"))
    }
    val scored = per
      .join(broadcast(withN(per, "r")), Seq("r"))
      .join(broadcast(withN(per, "f")), Seq("f"))
      .join(broadcast(withN(per, "m")), Seq("m"))
      .select($"o_custkey", $"m",
        (lit(5L) - $"q_r").as("r_score"),
        ($"q_f" + 1L).as("f_score"),
        ($"q_m" + 1L).as("m_score"))
    scored.groupBy($"r_score", $"f_score", $"m_score")
      .agg(count(lit(1)).as("n_customers"), sum($"m").as("cents"))
      .orderBy($"r_score", $"f_score", $"m_score")
  }

  private val rfmSql =
    """WITH dm AS (SELECT MAX(o_orderdate) AS dmax FROM orders),
      |per AS (
      |  SELECT o_custkey,
      |    date_diff('day', MAX(o_orderdate), MAX(dm.dmax)) AS r,
      |    CAST(COUNT(*) AS BIGINT) AS f,
      |    CAST(SUM(CAST(o_totalprice AS DECIMAL(28,2))) * 100 AS BIGINT)
      |      AS m
      |  FROM orders CROSS JOIN dm GROUP BY 1),
      |qr AS (
      |  SELECT r, CAST((SUM(cnt) OVER (ORDER BY r) - cnt) * 5
      |      // (SUM(cnt) OVER ()) AS BIGINT) AS q_r
      |  FROM (SELECT r, CAST(COUNT(*) AS BIGINT) AS cnt FROM per GROUP BY 1)),
      |qf AS (
      |  SELECT f, CAST((SUM(cnt) OVER (ORDER BY f) - cnt) * 5
      |      // (SUM(cnt) OVER ()) AS BIGINT) AS q_f
      |  FROM (SELECT f, CAST(COUNT(*) AS BIGINT) AS cnt FROM per GROUP BY 1)),
      |qm AS (
      |  SELECT m, CAST((SUM(cnt) OVER (ORDER BY m) - cnt) * 5
      |      // (SUM(cnt) OVER ()) AS BIGINT) AS q_m
      |  FROM (SELECT m, CAST(COUNT(*) AS BIGINT) AS cnt FROM per GROUP BY 1))
      |SELECT 5 - q_r AS r_score, q_f + 1 AS f_score, q_m + 1 AS m_score,
      |  COUNT(*) AS n_customers, CAST(SUM(m) AS BIGINT) AS cents
      |FROM per JOIN qr USING (r) JOIN qf USING (f) JOIN qm USING (m)
      |GROUP BY 1, 2, 3 ORDER BY 1, 2, 3""".stripMargin

  // -------------------------------------------------------------- q_burstiness
  /** Inter-arrival burstiness per event type — Goh–Barabási
    * B = (σ−μ)/(σ+μ) over same-type gap times: −1 for a metronome,
    * 0 for a Poisson process, →1 for heavy bursts. The gap frame is
    * exact integer µs (ordered by (ts, event_id) so same-µs ties break
    * identically cross-engine); sufficient statistics route through
    * DECIMAL(19)² products (gaps² overflow a long), and σ, μ, B are one
    * fixed 9dp-rounded double sequence at the end (the q_assortativity
    * recipe).
    *
    * Scale shape: one event_type-keyed window pass for gaps, one
    * aggregation with map-side partials to the types-sized frame. */
  private def burstiness(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val d19 = DecimalType(19, 0)
    val gaps = Tables.events(s, dir)
      .select($"event_type", unix_micros($"ts").as("us"), $"event_id")
      .withColumn("gap", $"us" - lag($"us", 1).over(
        Window.partitionBy($"event_type").orderBy($"us", $"event_id")))
      .filter($"gap".isNotNull)
    val stats = gaps.groupBy($"event_type")
      .agg(count(lit(1)).as("n"), sum($"gap").as("sum_us"),
        sum($"gap".cast(d19) * $"gap".cast(d19)).as("ssq"))
    val nd = col("n").cast("double")
    stats
      .withColumn("mean_us", expr("sum_us DIV n"))
      .withColumn("sigma",
        sqrt(nd * $"ssq".cast("double") -
          $"sum_us".cast("double") * $"sum_us".cast("double")) / nd)
      .select($"event_type", $"n", $"sum_us", $"mean_us",
        round(($"sigma" - $"sum_us".cast("double") / nd) /
          ($"sigma" + $"sum_us".cast("double") / nd), 9).as("burstiness"))
      .orderBy($"event_type")
  }

  private val burstinessSql =
    """WITH g AS (
      |  SELECT event_type,
      |    epoch_us(ts) - lag(epoch_us(ts)) OVER
      |      (PARTITION BY event_type ORDER BY epoch_us(ts), event_id)
      |      AS gap
      |  FROM events),
      |stats AS (
      |  SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n,
      |    CAST(SUM(gap) AS BIGINT) AS sum_us,
      |    SUM(CAST(gap AS DECIMAL(19,0)) * CAST(gap AS DECIMAL(19,0)))
      |      AS ssq
      |  FROM g WHERE gap IS NOT NULL GROUP BY 1)
      |SELECT event_type, n, sum_us, sum_us // n AS mean_us,
      |  round((sqrt(CAST(n AS DOUBLE) * CAST(ssq AS DOUBLE)
      |        - CAST(sum_us AS DOUBLE) * CAST(sum_us AS DOUBLE))
      |      / CAST(n AS DOUBLE)
      |      - CAST(sum_us AS DOUBLE) / CAST(n AS DOUBLE))
      |    / (sqrt(CAST(n AS DOUBLE) * CAST(ssq AS DOUBLE)
      |        - CAST(sum_us AS DOUBLE) * CAST(sum_us AS DOUBLE))
      |      / CAST(n AS DOUBLE)
      |      + CAST(sum_us AS DOUBLE) / CAST(n AS DOUBLE)), 9) AS burstiness
      |FROM stats ORDER BY event_type""".stripMargin

  // ------------------------------------------------------------------- q_peaks
  // audited-global-window(q_peaks): frame = month grid — bound audited in PlanAuditSpec/UnpartitionedWindowAudit
  /** Local maxima of the monthly revenue series — months strictly above
    * every neighbor within ±2 (the change-point family's "where are the
    * spikes" complement to q_cusum's "did the level shift"). Pure
    * integer comparisons on DECIMAL-routed cents; edge months with an
    * incomplete ±2 window are excluded by contract (their neighborhood
    * is unobserved). Prominence = cents − best neighbor, exact.
    *
    * Scale shape: one fact aggregation to the months grid; the
    * comparisons are four lag/lead columns in one window pass. */
  private def peaks(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val monthly = Tables.orders(s, dir)
      .groupBy(date_format($"o_orderdate", "yyyy-MM").as("month"))
      .agg((sum($"o_totalprice".cast(DecimalType(28, 2))) * 100)
        .cast("long").as("cents"))
    val w = Window.orderBy($"month")
    monthly
      .withColumn("p1", lag($"cents", 1).over(w))
      .withColumn("p2", lag($"cents", 2).over(w))
      .withColumn("n1", lead($"cents", 1).over(w))
      .withColumn("n2", lead($"cents", 2).over(w))
      .filter($"p1".isNotNull && $"p2".isNotNull &&
        $"n1".isNotNull && $"n2".isNotNull)
      .filter($"cents" > $"p1" && $"cents" > $"p2" &&
        $"cents" > $"n1" && $"cents" > $"n2")
      .select($"month", $"cents",
        greatest($"p1", $"p2", $"n1", $"n2").as("best_neighbor_cents"),
        ($"cents" - greatest($"p1", $"p2", $"n1", $"n2"))
          .as("prominence_cents"))
      .orderBy($"month")
  }

  private val peaksSql =
    """WITH monthly AS (
      |  SELECT strftime(o_orderdate, '%Y-%m') AS month,
      |    CAST(SUM(CAST(o_totalprice AS DECIMAL(28,2))) * 100 AS BIGINT)
      |      AS cents
      |  FROM orders GROUP BY 1),
      |x AS (
      |  SELECT month, cents,
      |    lag(cents, 1) OVER (ORDER BY month) AS p1,
      |    lag(cents, 2) OVER (ORDER BY month) AS p2,
      |    lead(cents, 1) OVER (ORDER BY month) AS n1,
      |    lead(cents, 2) OVER (ORDER BY month) AS n2
      |  FROM monthly)
      |SELECT month, cents,
      |  greatest(p1, p2, n1, n2) AS best_neighbor_cents,
      |  cents - greatest(p1, p2, n1, n2) AS prominence_cents
      |FROM x
      |WHERE p1 IS NOT NULL AND p2 IS NOT NULL
      |  AND n1 IS NOT NULL AND n2 IS NOT NULL
      |  AND cents > p1 AND cents > p2 AND cents > n1 AND cents > n2
      |ORDER BY month""".stripMargin

  // --------------------------------------------------------- q_weekday_profile
  // audited-bnlj(q_weekday_profile): build side = 1-row global-aggregate broadcast — audited in PlanAuditSpec/BnljAudit
  /** Day-of-week revenue profile — order volume and value by weekday
    * plus each day's index against the all-days average in exact ppm
    * (the seasonality-family audit at week grain; q_seasonality covers
    * month-of-year). Weekday numbering is pinned to ISO-ish 0=Sunday by
    * explicitly aligning the two engines' conventions (Spark dayofweek
    * is 1-based Sunday, DuckDB 0-based Sunday).
    *
    * Scale shape: one fact aggregation to 7 rows with map-side
    * partials; the global average is a broadcast-single-row cross. */
  private def weekdayProfile(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val byDay = Tables.orders(s, dir)
      .groupBy((dayofweek($"o_orderdate") - 1).cast("long").as("dow"))
      .agg(count(lit(1)).as("n_orders"),
        (sum($"o_totalprice".cast(DecimalType(28, 2))) * 100)
          .cast("long").as("cents"))
      .withColumn("avg_cents", expr("cents DIV n_orders"))
    val overall = byDay.agg(sum($"cents").as("tc"), sum($"n_orders").as("tn"))
    byDay.crossJoin(broadcast(overall))
      .select($"dow", $"n_orders", $"cents", $"avg_cents",
        expr("avg_cents * 1000000 DIV (tc DIV tn)").as("index_ppm"))
      .orderBy($"dow")
  }

  private val weekdayProfileSql =
    """WITH byday AS (
      |  SELECT dayofweek(o_orderdate) AS dow,
      |    CAST(COUNT(*) AS BIGINT) AS n_orders,
      |    CAST(SUM(CAST(o_totalprice AS DECIMAL(28,2))) * 100 AS BIGINT)
      |      AS cents
      |  FROM orders GROUP BY 1),
      |o AS (SELECT CAST(SUM(cents) AS BIGINT) AS tc,
      |             CAST(SUM(n_orders) AS BIGINT) AS tn FROM byday)
      |SELECT dow, n_orders, cents, cents // n_orders AS avg_cents,
      |  (cents // n_orders) * 1000000 // (tc // tn) AS index_ppm
      |FROM byday CROSS JOIN o ORDER BY dow""".stripMargin

  // -------------------------------------------------------------- q_price_index
  /** Laspeyres monthly price index over the part basket — "how much
    * would January's basket cost in month t?", the classic
    * fixed-basket inflation measure. Per (part, month) the unit price
    * is Σ extended-cents DIV Σ quantity (exact truncating division,
    * identical both engines); the index for month t sums unit_t·q₀ over
    * the COMMON part set with the base month and divides by the base
    * cost in exact ppm — so a month's index moves only on price
    * changes, never basket drift (drift is reported as n_common).
    *
    * Scale shape: one fact aggregation to the (part, month) grid with
    * map-side partials; the base-month slice broadcasts back onto the
    * grid; one months-sized rollup. */
  private def priceIndex(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    // orders is a FACT table (~1.5M rows/SF) — no forced broadcast: a
    // hint would bypass the planner's size threshold and become a
    // driver/executor OOM at large SF. The (key, date) projection is
    // slim, so AQE converts to broadcast when the measured size allows
    // and falls back to a shuffle join when it doesn't — exactly the
    // runtime decision this join needs.
    // group key is the truncated DATE, not the formatted string —
    // string keys pay per-row formatting plus wider shuffle rows; the
    // "yyyy-MM" rendering happens once on the months-sized output
    val grid = Tables.lineitem(s, dir)
      .join(Tables.orders(s, dir).select($"o_orderkey", $"o_orderdate"),
        $"l_orderkey" === $"o_orderkey")
      .groupBy($"l_partkey", date_trunc("month", $"o_orderdate").as("mt"))
      .agg(((sum($"l_extendedprice".cast(DecimalType(28, 2))) * 100)
          .cast("long")).as("ext_cents"),
        sum($"l_quantity".cast("long")).as("qty"))
      .withColumn("unit_cents", expr("ext_cents DIV qty"))
      // three consumers below (base-month scalar, base slice, the index
      // rollup) — materialize the parts×months grid once instead of
      // re-running the fact aggregation per consumer
      .lineageCut(true)
    val baseMonth = grid.agg(min($"mt").as("base_mt"))
    val base = grid.crossJoin(broadcast(baseMonth))
      .filter($"mt" === $"base_mt")
      .select($"l_partkey", $"unit_cents".as("unit0"), $"qty".as("q0"))
    grid.join(broadcast(base), Seq("l_partkey"))
      .groupBy($"mt")
      .agg(count(lit(1)).as("n_common"),
        sum($"unit_cents" * $"q0").as("cost_t"),
        sum($"unit0" * $"q0").as("cost_0"))
      .select(date_format($"mt", "yyyy-MM").as("month"), $"n_common",
        $"cost_t", $"cost_0",
        expr("cost_t * 1000000 DIV cost_0").as("index_ppm"))
      .orderBy($"month")
  }

  private val priceIndexSql =
    """WITH grid AS (
      |  SELECT l_partkey, strftime(o_orderdate, '%Y-%m') AS month,
      |    CAST(SUM(CAST(l_extendedprice AS DECIMAL(28,2))) * 100 AS BIGINT)
      |      AS ext_cents,
      |    CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS qty
      |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      |  GROUP BY 1, 2),
      |g2 AS (SELECT *, ext_cents // qty AS unit_cents FROM grid),
      |bm AS (SELECT MIN(month) AS base_month FROM g2),
      |base AS (
      |  SELECT l_partkey, unit_cents AS unit0, qty AS q0
      |  FROM g2 CROSS JOIN bm WHERE month = base_month)
      |SELECT month, COUNT(*) AS n_common,
      |  CAST(SUM(g2.unit_cents * base.q0) AS BIGINT) AS cost_t,
      |  CAST(SUM(base.unit0 * base.q0) AS BIGINT) AS cost_0,
      |  CAST(SUM(g2.unit_cents * base.q0) AS BIGINT) * 1000000
      |    // CAST(SUM(base.unit0 * base.q0) AS BIGINT) AS index_ppm
      |FROM g2 JOIN base USING (l_partkey)
      |GROUP BY month ORDER BY month""".stripMargin

  // -------------------------------------------------------------- q_lorenz_gini
  /** Gini coefficient of customer spend — the scalar inequality index
    * whose curve q_decile_share tabulates: G = (2Σ rᵢxᵢ − (n+1)Σx) /
    * (nΣx) over ascending unique ranks. Ranks come from the same
    * multi-key (cents, custkey) `globalIndex` range-partition path as
    * the decile cut (deterministic under ties, no single-task window,
    * no packed-key width to overflow);
    * the rank-weighted sums route through DECIMAL(19)² products (r·x
    * overflows a long at fixture scale already), and the final ratio is
    * one 9dp-rounded double over exact integer sums.
    *
    * Scale shape: one fact aggregation to per-customer spend, one range
    * repartition for ranks, one global aggregate with map-side
    * partials. */
  private def lorenzGini(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val d19 = DecimalType(19, 0)
    val per = Tables.orders(s, dir)
      .groupBy($"o_custkey")
      .agg((sum($"o_totalprice".cast(DecimalType(28, 2))) * 100)
        .cast("long").as("cents"))
      .select($"o_custkey", $"cents")
    val stats = Corpus.globalIndex(per, Seq($"cents", $"o_custkey"))
      .agg(count(lit(1)).as("n"),
        sum($"cents".cast(d19)).as("sx"),
        sum($"global_idx".cast(d19) * $"cents".cast(d19)).as("srx"))
    val Seq(n, sx, srx) = Seq("n", "sx", "srx").map(c => col(c).cast("double"))
    stats.select($"n".as("n_customers"),
      $"sx".cast("decimal(38,0)").cast("long").as("total_cents"),
      round((lit(2.0) * srx - (n + 1.0) * sx) / (n * sx), 9).as("gini"))
  }

  private val lorenzGiniSql =
    """WITH per AS (
      |  SELECT o_custkey,
      |    CAST(SUM(CAST(o_totalprice AS DECIMAL(28,2))) * 100 AS BIGINT)
      |      AS cents
      |  FROM orders GROUP BY 1),
      |idx AS (
      |  SELECT cents,
      |    ROW_NUMBER() OVER (ORDER BY cents, o_custkey) AS r
      |  FROM per),
      |t AS (
      |  SELECT COUNT(*) AS n,
      |    SUM(CAST(cents AS DECIMAL(19,0))) AS sx,
      |    SUM(CAST(r AS DECIMAL(19,0)) * CAST(cents AS DECIMAL(19,0)))
      |      AS srx
      |  FROM idx)
      |SELECT n AS n_customers,
      |  CAST(CAST(sx AS DECIMAL(38,0)) AS BIGINT) AS total_cents,
      |  round((2.0 * CAST(srx AS DOUBLE)
      |      - (CAST(n AS DOUBLE) + 1.0) * CAST(sx AS DOUBLE))
      |    / (CAST(n AS DOUBLE) * CAST(sx AS DOUBLE)), 9) AS gini
      |FROM t""".stripMargin

  // ---------------------------------------------------------------------- q_hhi
  /** Herfindahl–Hirschman concentration of spend within each market
    * segment — Σ(xᵢ/X)², the antitrust-style concentration scalar next
    * to q_lorenz_gini's inequality index (HHI weights the LARGEST
    * shares quadratically; Gini weights rank displacement). Squared
    * cents route through DECIMAL(19)² products; the final ratio is one
    * 9dp-rounded double over exact sums. 1/n ≤ HHI ≤ 1.
    *
    * Scale shape: one fact aggregation to per-(segment, customer)
    * spend, one segment rollup with map-side partials. */
  private def hhi(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val d19 = DecimalType(19, 0)
    val per = Tables.orders(s, dir)
      .join(broadcast(Tables.customer(s, dir)
        .select($"c_custkey", $"c_mktsegment")), $"o_custkey" === $"c_custkey")
      .groupBy($"c_mktsegment", $"o_custkey")
      .agg((sum($"o_totalprice".cast(DecimalType(28, 2))) * 100)
        .cast("long").as("cents"))
    per.groupBy($"c_mktsegment")
      .agg(count(lit(1)).as("n_customers"),
        sum($"cents".cast(d19)).as("sx"),
        sum($"cents".cast(d19) * $"cents".cast(d19)).as("sxx"))
      .select($"c_mktsegment", $"n_customers",
        $"sx".cast("decimal(38,0)").cast("long").as("total_cents"),
        round($"sxx".cast("double") /
          ($"sx".cast("double") * $"sx".cast("double")), 9).as("hhi"))
      .orderBy($"c_mktsegment")
  }

  private val hhiSql =
    """WITH per AS (
      |  SELECT c_mktsegment, o_custkey,
      |    CAST(SUM(CAST(o_totalprice AS DECIMAL(28,2))) * 100 AS BIGINT)
      |      AS cents
      |  FROM orders JOIN customer ON o_custkey = c_custkey
      |  GROUP BY 1, 2)
      |SELECT c_mktsegment, COUNT(*) AS n_customers,
      |  CAST(CAST(SUM(CAST(cents AS DECIMAL(19,0))) AS DECIMAL(38,0))
      |    AS BIGINT) AS total_cents,
      |  round(CAST(SUM(CAST(cents AS DECIMAL(19,0))
      |        * CAST(cents AS DECIMAL(19,0))) AS DOUBLE)
      |    / (CAST(SUM(CAST(cents AS DECIMAL(19,0))) AS DOUBLE)
      |       * CAST(SUM(CAST(cents AS DECIMAL(19,0))) AS DOUBLE)), 9)
      |    AS hhi
      |FROM per GROUP BY 1 ORDER BY c_mktsegment""".stripMargin

  // ------------------------------------------------------- q_seasonal_decompose
  // audited-global-window(q_seasonal_decompose): frame = month grid — bound audited in PlanAuditSpec/UnpartitionedWindowAudit
  /** Classical additive decomposition of the monthly revenue series —
    * cents = trend + seasonal + residual, the structure view behind
    * q_seasonality's index and q_forecast_backtest's baselines:
    *  - trend: centered 13-month moving average in exact integer cents
    *    (sum DIV 13), defined only where the full ±6 window exists;
    *  - seasonal: month-of-year mean of the detrended series (sum DIV
    *    count — negative-safe: both engines truncate toward zero);
    *  - residual: the exact remainder, so the three parts RE-ADD to the
    *    original cents by construction (spec-pinned).
    *
    * Scale shape: one fact aggregation to the months grid; one window
    * pass, one 12-row month-of-year aggregation broadcast back. */
  private def seasonalDecompose(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val monthly = Tables.orders(s, dir)
      .groupBy(date_format($"o_orderdate", "yyyy-MM").as("month"))
      .agg((sum($"o_totalprice".cast(DecimalType(28, 2))) * 100)
        .cast("long").as("cents"))
    val w = Window.orderBy($"month").rowsBetween(-6, 6)
    val trended = monthly
      .withColumn("win_n", count(lit(1)).over(w))
      .withColumn("trend", expr("sum(cents) OVER (ORDER BY month " +
        "ROWS BETWEEN 6 PRECEDING AND 6 FOLLOWING) DIV 13"))
      .filter($"win_n" === 13)
      .withColumn("detr", $"cents" - $"trend")
      .withColumn("moy", substring($"month", 6, 2))
    // negative-sum-safe: DIV truncates toward zero on both engines
    // (the q_kappa precedent)
    val seasonal = trended.groupBy($"moy")
      .agg(sum($"detr").as("sd"), count(lit(1)).as("cnt"))
      .select($"moy", expr("sd DIV cnt").as("seasonal"))
    trended.join(broadcast(seasonal), Seq("moy"))
      .select($"month", $"cents", $"trend", $"seasonal",
        ($"cents" - $"trend" - $"seasonal").as("residual"))
      .orderBy($"month")
  }

  private val seasonalDecomposeSql =
    """WITH monthly AS (
      |  SELECT strftime(o_orderdate, '%Y-%m') AS month,
      |    CAST(SUM(CAST(o_totalprice AS DECIMAL(28,2))) * 100 AS BIGINT)
      |      AS cents
      |  FROM orders GROUP BY 1),
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
      |  FROM tr GROUP BY 1)
      |SELECT month, cents, trend, seasonal,
      |  cents - trend - seasonal AS residual
      |FROM tr JOIN seas USING (moy)
      |ORDER BY month""".stripMargin

  // ---------------------------------------------------------------- q_cms
  /** Count-min sketch (Cormode & Muthukrishnan 2005) — the mergeable
    * FREQUENCY sketch next to the cardinality family (KMV, HLL, bloom):
    * D=4 hash rows × W=256 counters estimate per-key occurrence counts
    * with one-sided error (estimate ≥ exact always; overcount bounded
    * by collisions at 2·N/W in expectation per row, min over rows).
    * Deterministic and fully oracle-able in the KMV doctrine: row
    * hashes are md5-lower-64 of "cms<i>:<key>" (= DuckDB
    * md5_number_lower), buckets are the same AND-then-mod on both
    * engines, counters are exact integer sums — a one-count drift in
    * any of the 1024 cells, or a wrong min in any estimate, flips a
    * row and hash-fails. The universe is order rows keyed by customer
    * (frequency = orders per customer); the probe roster is the
    * bounded low-key customers.
    *
    * Scale shape (100 TB): building the sketch is ONE explode(D) →
    * partial-agg shuffle whose output is 1024 rows REGARDLESS of input
    * size — counters are sums, so executor-local sketches merge by
    * addition (the mergeability that makes CMS the streaming/
    * distributed workhorse); probing joins the bounded roster to the
    * 1024-row counter table (broadcast). */
  val CmsDepth = 4
  val CmsWidth = 256L
  val CmsProbeMaxKey = 100L

  // (probe join is equi-keyed on (i, b) — a BroadcastHashJoin of the
  // 1024-row counter table, no BNLJ, so no audit tag is needed)
  private def cms(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    import graft.functions.TextFunctions
    val keys = Tables.orders(s, dir).select($"o_custkey".as("key"))
    def bucket(i: Int, col: org.apache.spark.sql.Column) =
      TextFunctions.md5Lower64(concat(lit(s"cms$i:"), col.cast("string")))
        .bitwiseAND(lit(Long.MaxValue)) % CmsWidth
    val counters = keys
      .select(explode(array((0 until CmsDepth).map(i =>
        struct(lit(i).as("i"), bucket(i, $"key").as("b"))): _*)).as("c"))
      .groupBy($"c.i".as("i"), $"c.b".as("b"))
      .agg(count(lit(1)).as("n"))
    val exact = keys.filter($"key" < CmsProbeMaxKey)
      .groupBy($"key").agg(count(lit(1)).as("exact_n"))
    val est = exact
      .select($"key", $"exact_n",
        explode(array((0 until CmsDepth).map(i =>
          struct(lit(i).as("i"), bucket(i, $"key").as("b"))): _*)).as("p"))
      .join(broadcast(counters),
        $"p.i" === counters("i") && $"p.b" === counters("b"))
      .groupBy($"key", $"exact_n")
      .agg(min($"n").as("est_n"))
    est.select($"key", $"exact_n", $"est_n",
        ($"est_n" - $"exact_n").as("overcount"))
      .orderBy($"key")
  }

  private[operators] val cmsSql = {
    def bucketSql(iExpr: String, keyExpr: String) =
      s"CAST(md5_number_lower('cms' || $iExpr || ':' || $keyExpr)" +
        s" & ${Long.MaxValue}::UBIGINT AS BIGINT) % $CmsWidth"
    s"""WITH ks AS (SELECT o_custkey AS key FROM orders),
       |rows_i AS (SELECT UNNEST(range(0, $CmsDepth)) AS i),
       |counters AS (
       |  SELECT i, ${bucketSql("CAST(i AS VARCHAR)", "CAST(key AS VARCHAR)")} AS b,
       |    COUNT(*) AS n
       |  FROM ks CROSS JOIN rows_i GROUP BY 1, 2),
       |exact AS (
       |  SELECT key, COUNT(*) AS exact_n FROM ks
       |  WHERE key < $CmsProbeMaxKey GROUP BY 1),
       |est AS (
       |  SELECT e.key, e.exact_n, MIN(c.n) AS est_n
       |  FROM exact e CROSS JOIN rows_i r
       |  JOIN counters c ON c.i = r.i
       |    AND c.b = ${bucketSql("CAST(r.i AS VARCHAR)", "CAST(e.key AS VARCHAR)")}
       |  GROUP BY 1, 2)
       |SELECT key, exact_n, est_n, est_n - exact_n AS overcount
       |FROM est ORDER BY key""".stripMargin
  }

  val all: Seq[NamedQuery] = Seq(
    NamedQuery("q_cms", cms, Some(cmsSql), bench = true),
    NamedQuery("q_seasonal_decompose", seasonalDecompose,
      Some(seasonalDecomposeSql), bench = true),
    NamedQuery("q_lorenz_gini", lorenzGini, Some(lorenzGiniSql), bench = true),
    NamedQuery("q_hhi", hhi, Some(hhiSql), bench = true),
    NamedQuery("q_price_index", priceIndex, Some(priceIndexSql), bench = true),
    NamedQuery("q_burstiness", burstiness, Some(burstinessSql), bench = true),
    NamedQuery("q_peaks", peaks, Some(peaksSql), bench = true),
    NamedQuery("q_weekday_profile", weekdayProfile, Some(weekdayProfileSql),
      bench = true),
    NamedQuery("q_survival", survival, Some(survivalSql), bench = true),
    NamedQuery("q_decile_share", decileShare, Some(decileShareSql),
      bench = true),
    NamedQuery("q_rfm", rfm, Some(rfmSql), bench = true),
    NamedQuery("q_count_min", countMin, Some(countMinSql), bench = true),
    NamedQuery("q_acf", acf, Some(acfSql), bench = true),
    NamedQuery("q_bootstrap", bootstrap, Some(bootstrapSql), bench = true),
    NamedQuery("q_kmv_jaccard", kmvJaccard, Some(kmvJaccardSql),
      bench = true),
    NamedQuery("q_kmv_distinct", kmvDistinct, Some(kmvDistinctSql),
      bench = true),
    NamedQuery("q_cusum", cusum, Some(cusumSql), bench = true),
    NamedQuery("q_markov", markov, Some(markovSql), bench = true),
    NamedQuery("q_traj_dedup", trajDedup, Some(trajDedupSql), bench = true),
    NamedQuery("q_cohort_retention", cohortRetention, Some(cohortRetentionSql),
      bench = true),
    NamedQuery("q_funnel", funnel, Some(funnelSql), bench = true),
    NamedQuery("q_time_weighted_avg", timeWeightedAvg,
      Some(timeWeightedAvgSql), bench = true),
    NamedQuery("q_debounce", debounce, Some(debounceSql), bench = true),
    NamedQuery("q_islands", islands, Some(islandsSql), bench = true),
    NamedQuery("q_attribution", attribution, Some(attributionSql), bench = true),
    NamedQuery("q_mode_per_group", modePerGroup, Some(modePerGroupSql),
      bench = true),
    NamedQuery("q_clv", clv, Some(clvSql), bench = true),
    NamedQuery("q_basket_rules", basketRules, Some(basketRulesSql),
      bench = true),
    NamedQuery("q_forecast_backtest", forecastBacktest,
      Some(forecastBacktestSql), bench = true),
    NamedQuery("q_running_distinct", runningDistinct, Some(runningDistinctSql),
      bench = true),
    NamedQuery("q_heavy_hitters", heavyHittersQuery, Some(heavyHittersSql),
      bench = true),
    NamedQuery("q_supplier_nation_share", supplierNationShare,
      Some(supplierNationShareSql), bench = true),
    NamedQuery("q_multi_join_agg", multiJoinAgg, Some(multiJoinAggSql), bench = true),
    NamedQuery("q_rolling_avg", rollingAvg, Some(rollingAvgSql), bench = true),
    NamedQuery("q_ewma", ewma, Some(ewmaSql), bench = true),
    NamedQuery("q_rollup_agg", rollupAgg, Some(rollupAggSql), bench = true),
    NamedQuery("q_cube_agg", cubeAgg, Some(cubeAggSql), bench = true),
    NamedQuery("q_grouping_sets", groupingSets, Some(groupingSetsSql),
      bench = true),
    NamedQuery("q_seasonality", seasonality, Some(seasonalitySql), bench = true),
    NamedQuery("q_range_window", rangeWindow, Some(rangeWindowSql), bench = true),
    NamedQuery("q_equidepth_hist", equidepthHist, Some(equidepthHistSql),
      bench = true),
    NamedQuery("q_decontaminate", decontaminateQuery, Some(decontaminateSql), bench = true),
    NamedQuery("q_hash_sample", hashSample, Some(hashSampleSql), bench = true),
    NamedQuery("q_window_suite", windowSuite, Some(windowSuiteSql), bench = true),
    NamedQuery("q_array_agg", arrayAgg, Some(arrayAggSql), bench = true),
    NamedQuery("q_correlation", correlation, Some(correlationSql), bench = true),
    NamedQuery("q_resample_ffill", resampleFfill, Some(resampleFfillSql), bench = true),
    NamedQuery("q_interpolate", interpolate, Some(interpolateSql), bench = true),
    NamedQuery("q_set_ops", setOps, Some(setOpsSql), bench = true),
    NamedQuery("q_set_ops_all", setOpsAll, Some(setOpsAllSql), bench = true),
    NamedQuery("q_count_distinct", countDistinct, Some(countDistinctSql), bench = true))
}
