package graft.operators

import graft.{NamedQuery, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Data-governance audits a training-data pipeline runs before release:
  * k-anonymity over quasi-identifiers (can any row be re-identified from
  * the attribute combination it carries?) and a one-scan per-column
  * profile (the Deequ/dbt-style summary that gates ingest).
  *
  * Scale design (100 TB):
  *  - k-anonymity is two keyed aggregations (full QI, generalized QI) —
  *    each one shuffle with map-side partial counts; group-size frames
  *    are QI-cardinality-sized (tiny), so the generalization join
  *    broadcasts. The fact table never moves twice.
  *  - the profiler reads the table ONCE: all per-column null counts,
  *    min/max, and exact distinct counts in a single aggregate (Spark
  *    plans multi-distinct via one Expand + one shuffle — column-count ×
  *    row partial states, never a per-column job). At corpus scale the
  *    exact distincts swap to approx_count_distinct (mergeable HLL,
  *    one pass, no Expand) — the same exact-vs-approx split
  *    q_quantile_stats and q_approx_distinct assert elsewhere.
  */
object Audit {

  /** Group sizes below this are re-identifiable ("at risk"). */
  val KThreshold = 10

  // -------------------------------------------------------------- q_k_anonymity
  /** k-anonymity audit over the (nation, market-segment) quasi-identifier
    * pair on `customer`, with one generalization step (drop the segment):
    * per QI group, the group size under the full QI and under the
    * generalized QI, and whether each is below k. The generalized size is
    * what the group's k WOULD become after suppressing the segment —
    * the first rung of the generalization lattice a release audit climbs
    * until every group clears k. Counts and flags are integer/boolean —
    * nothing to round, bit-stable cross-engine. */
  private def kAnonymity(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val c = Tables.customer(s, dir)
    val full = c.groupBy($"c_nationkey", $"c_mktsegment")
      .agg(count(lit(1)).as("k_full"))
    val gen = c.groupBy($"c_nationkey").agg(count(lit(1)).as("k_generalized"))
    full.join(broadcast(gen), Seq("c_nationkey"))
      .select(
        $"c_nationkey", $"c_mktsegment", $"k_full",
        ($"k_full" < KThreshold).as("at_risk_full"),
        $"k_generalized",
        ($"k_generalized" < KThreshold).as("at_risk_generalized"))
      .orderBy($"c_nationkey", $"c_mktsegment")
  }

  private val kAnonymitySql =
    s"""WITH full_qi AS (
       |  SELECT c_nationkey, c_mktsegment, COUNT(*) AS k_full
       |  FROM customer GROUP BY 1, 2),
       |gen_qi AS (
       |  SELECT c_nationkey, COUNT(*) AS k_generalized
       |  FROM customer GROUP BY 1)
       |SELECT c_nationkey, c_mktsegment, k_full,
       |  k_full < $KThreshold AS at_risk_full,
       |  k_generalized,
       |  k_generalized < $KThreshold AS at_risk_generalized
       |FROM full_qi JOIN gen_qi USING (c_nationkey)
       |ORDER BY c_nationkey, c_mktsegment""".stripMargin

  // -------------------------------------------------------------- q_l_diversity
  /** l-diversity — k-anonymity's necessary complement: a group can be
    * large (k-anonymous) yet expose its members anyway if everyone in it
    * shares the same SENSITIVE value. Per (nation) QI group: group size,
    * distinct sensitive values (market segment standing in for the
    * sensitive attribute), the best-represented segment's share in ppm,
    * and the l < 3 flag. One two-level aggregation: (nation, segment)
    * counts partial-agg map-side, the nation rollup runs over
    * QI-cardinality rows. Integer counts, integer DIV share. */
  val LThreshold = 3

  private def lDiversity(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.customer(s, dir)
      .groupBy($"c_nationkey", $"c_mktsegment")
      .agg(count(lit(1)).as("n"))
      .groupBy($"c_nationkey")
      .agg(
        sum($"n").cast("long").as("k"),
        count(lit(1)).as("l_distinct"),
        max($"n").cast("long").as("top_segment_rows"))
      .select(
        $"c_nationkey", $"k", $"l_distinct",
        expr("top_segment_rows * 1000000 DIV k").as("top_segment_ppm"),
        ($"l_distinct" < LThreshold).as("at_risk"))
      .orderBy($"c_nationkey")
  }

  private val lDiversitySql =
    s"""WITH g AS (
       |  SELECT c_nationkey, c_mktsegment, COUNT(*) AS n
       |  FROM customer GROUP BY 1, 2)
       |SELECT c_nationkey,
       |  CAST(SUM(n) AS BIGINT) AS k,
       |  COUNT(*) AS l_distinct,
       |  CAST(MAX(n) * 1000000 // SUM(n) AS BIGINT) AS top_segment_ppm,
       |  COUNT(*) < $LThreshold AS at_risk
       |FROM g GROUP BY c_nationkey ORDER BY c_nationkey""".stripMargin

  // ---------------------------------------------------------- q_profile_columns
  /** One row per column of `orders`: row count, null count, exact
    * distinct count, and typed min/max — numerics (and timestamps, as
    * exact epoch-millisecond integers) in `min_num`/`max_num`, strings in
    * `min_text`/`max_text`. Keeping the numeric and string extrema in
    * separate typed columns avoids cross-engine float-to-string
    * formatting entirely: every emitted value is an integer, an input
    * double, or an input string. */
  private def profileColumns(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val o = Tables.orders(s, dir)
    val numCols = Seq("o_orderkey", "o_custkey", "o_totalprice")
    val strCols = Seq("o_orderstatus", "o_orderpriority")
    val tsCols = Seq("o_orderdate")
    // one branch per column, unioned: a single multi-distinct aggregate
    // would Expand the scan column-count× into ONE shuffle (measured
    // 3.7s at sf0.1); independent branches keep each distinct-agg the
    // cheap two-phase plan and run concurrently (measured 1.5s), at the
    // price of column-count scans of a column-pruned reader — the right
    // trade for a columnar source, where each branch reads ONLY its
    // column (ReadSchema is one field either way)
    val numeric = numCols ++ tsCols
    def branch(c: String): DataFrame = {
      val isNum = numeric.contains(c)
      // o_orderdate is TIMESTAMP_NTZ; the session pins UTC, so the LTZ
      // cast is numerically the identity and unix_millis matches
      // DuckDB's epoch_ms over the same naive value.
      val v: org.apache.spark.sql.Column =
        if (tsCols.contains(c)) unix_millis(col(c).cast("timestamp_ltz")).cast("double")
        else if (isNum) col(c).cast("double")
        else col(c)
      o.agg(
        count(lit(1)).as("n_rows"), count(col(c)).as("__nn"),
        count_distinct(col(c)).as("n_distinct"),
        min(v).as("__min"), max(v).as("__max"))
        .select(
          lit(c).as("col_name"),
          col("n_rows"),
          (col("n_rows") - col("__nn")).as("n_null"),
          col("n_distinct"),
          (if (isNum) col("__min") else lit(null).cast("double")).as("min_num"),
          (if (isNum) col("__max") else lit(null).cast("double")).as("max_num"),
          (if (isNum) lit(null).cast("string") else col("__min")).as("min_text"),
          (if (isNum) lit(null).cast("string") else col("__max")).as("max_text"))
    }
    (numeric ++ strCols).map(branch).reduce(_.unionByName(_))
      .orderBy($"col_name")
  }

  private val profileColumnsSql = {
    def num(c: String, expr: String) =
      s"""SELECT '$c' AS col_name, COUNT(*) AS n_rows,
         |  COUNT(*) - COUNT($c) AS n_null,
         |  COUNT(DISTINCT $c) AS n_distinct,
         |  MIN($expr) AS min_num, MAX($expr) AS max_num,
         |  CAST(NULL AS VARCHAR) AS min_text, CAST(NULL AS VARCHAR) AS max_text
         |FROM orders""".stripMargin
    def str(c: String) =
      s"""SELECT '$c' AS col_name, COUNT(*) AS n_rows,
         |  COUNT(*) - COUNT($c) AS n_null,
         |  COUNT(DISTINCT $c) AS n_distinct,
         |  CAST(NULL AS DOUBLE) AS min_num, CAST(NULL AS DOUBLE) AS max_num,
         |  MIN($c) AS min_text, MAX($c) AS max_text
         |FROM orders""".stripMargin
    Seq(
      num("o_orderkey", "CAST(o_orderkey AS DOUBLE)"),
      num("o_custkey", "CAST(o_custkey AS DOUBLE)"),
      num("o_totalprice", "o_totalprice"),
      num("o_orderdate", "CAST(epoch_ms(o_orderdate) AS DOUBLE)"),
      str("o_orderstatus"),
      str("o_orderpriority"))
      .mkString("", "\nUNION ALL\n", "\nORDER BY col_name")
  }

  // ---------------------------------------------------------------- q_pii_redact
  /** PII detection + masking over document text — the scrub step every
    * training-data release runs before text leaves the governed zone:
    * emails, phone numbers, and SSN-shaped ids are counted and replaced
    * with type tokens, and the redacted text is digested for the
    * downstream exact-dedup pass (PII masking BEFORE dedup, so two docs
    * differing only in the leaked identifier collapse).
    *
    * Patterns are deliberately engine-portable regex (character classes,
    * bounded repeats, \b — identical semantics in Java's engine and
    * DuckDB's RE2), and redaction order is fixed SSN → phone → email so
    * overlapping digit shapes resolve identically everywhere.
    *
    * Driver-visible gate: the fixture corpus contains no digits or '@'
    * at all (verified — detection over raw fixture text would be
    * vacuous), so deterministic PII is PLANTED by id arithmetic — doc_id
    * % 4 picks none/email/phone/SSN, the identifier embeds the doc_id —
    * and the REAL regex kernel runs over the planted text. The oracle
    * replays plant + detect + mask + digest from first principles, so a
    * missed match, a wrong replacement, or an order swap fails the hash
    * compare.
    *
    * Scale shape: row-local regex inside whole-stage codegen (compiled
    * pattern cached per task), one scan pass, zero shuffles before the
    * output sort — the ideal 100 TB operator. */
  val EmailPat = "[a-z0-9._%+-]+@[a-z0-9.-]+\\.[a-z]{2,}"
  val PhonePat = "\\b[0-9]{3}-[0-9]{4}\\b"
  val SsnPat = "\\b[0-9]{3}-[0-9]{2}-[0-9]{4}\\b"

  /** Kernel: count and mask the three PII shapes in `textCol`. */
  def redactPii(df: DataFrame, textCol: String): DataFrame = {
    val t = col(textCol)
    df
      .withColumn("n_ssns", regexp_count(t, lit(SsnPat)))
      .withColumn("n_phones",
        regexp_count(regexp_replace(t, SsnPat, "<SSN>"), lit(PhonePat)))
      .withColumn("n_emails", regexp_count(t, lit(EmailPat)))
      .withColumn(textCol,
        regexp_replace(
          regexp_replace(
            regexp_replace(t, SsnPat, "<SSN>"),
            PhonePat, "<PHONE>"),
          EmailPat, "<EMAIL>"))
  }

  private def piiRedact(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val docs = Tables.documents(s, dir)
    // plant one PII shape per doc by id arithmetic (mod-4 rotation);
    // the identifier carries the doc_id so every planted value is unique
    val planted = docs.select($"doc_id",
      concat($"text",
        when($"doc_id" % 4 === 1,
          concat(lit(" contact a"), $"doc_id", lit("@mail.com now")))
        .when($"doc_id" % 4 === 2,
          concat(lit(" call 555-"), lpad($"doc_id" % 10000, 4, "0"),
            lit(" today")))
        .when($"doc_id" % 4 === 3,
          concat(lit(" id 123-45-"), lpad($"doc_id" % 10000, 4, "0"),
            lit(" leaked")))
        .otherwise(lit(""))).as("text"))
    redactPii(planted, "text")
      .select($"doc_id", $"n_emails", $"n_phones", $"n_ssns",
        md5($"text").as("clean_md5"))
      .orderBy($"doc_id")
  }

  private val piiRedactSql =
    s"""WITH planted AS (
       |  SELECT doc_id,
       |    text || CASE CAST(doc_id % 4 AS INTEGER)
       |      WHEN 1 THEN ' contact a' || doc_id || '@mail.com now'
       |      WHEN 2 THEN ' call 555-' || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0') || ' today'
       |      WHEN 3 THEN ' id 123-45-' || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0') || ' leaked'
       |      ELSE '' END AS text
       |  FROM documents)
       |SELECT doc_id,
       |  CAST(len(regexp_extract_all(text, '$EmailPat')) AS INTEGER) AS n_emails,
       |  CAST(len(regexp_extract_all(
       |    regexp_replace(text, '$SsnPat', '<SSN>', 'g'), '$PhonePat'))
       |    AS INTEGER) AS n_phones,
       |  CAST(len(regexp_extract_all(text, '$SsnPat')) AS INTEGER) AS n_ssns,
       |  md5(regexp_replace(regexp_replace(regexp_replace(text,
       |    '$SsnPat', '<SSN>', 'g'), '$PhonePat', '<PHONE>', 'g'),
       |    '$EmailPat', '<EMAIL>', 'g')) AS clean_md5
       |FROM planted ORDER BY doc_id""".stripMargin

  // ---------------------------------------------------------- q_forget_cascade
  // audited-bnlj(q_forget_cascade): build side = 1-row global-aggregate broadcast — audited in PlanAuditSpec/BnljAudit
  /** Right-to-be-forgotten cascade audit: given a deletion-request set
    * (customers with c_custkey % 97 == 0 — a real deployment reads a
    * requests table), delete those customers, their orders, and those
    * orders' lineitems, and report per table (rows_before, rows_deleted,
    * rows_after) plus an md5-sum digest of the SURVIVING keys — the
    * digest makes "exactly the right rows remain" driver-visible, not
    * just the counts.
    *
    * Scale shape: the request list is deletion-request-sized (tiny vs
    * the corpus), so the customer and orders legs anti-join against a
    * BROADCAST request frame — the fact tables never shuffle. The
    * lineitem leg keys on deleted ORDERS (corpus-derived, possibly
    * large), so it anti-joins on a slim orderkey-only frame via the
    * regular shuffle path — the shape that still works when a bulk
    * erasure hits millions of orders. Digests sum bounded residues
    * (md5 % 1e9+7 over <= 6M rows at sf0.1 stays far under 2^63). */
  private def forgetCascade(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val customer = Tables.customer(s, dir)
    val orders = Tables.orders(s, dir)
    val lineitem = Tables.lineitem(s, dir)
    val requests = customer.filter($"c_custkey" % 97 === 0)
      .select($"c_custkey".as("req_key"))
    def digest(key: org.apache.spark.sql.Column) =
      sum(graft.functions.TextFunctions
        .md5Lower64(concat(lit("k:"), key))
        .bitwiseAND(lit(Long.MaxValue)) % 1000000007L)
    val custAfter = customer
      .join(broadcast(requests), $"c_custkey" === $"req_key", "left_anti")
    val ordDeleted = orders
      .join(broadcast(requests), $"o_custkey" === $"req_key", "left_semi")
    val ordAfter = orders
      .join(broadcast(requests), $"o_custkey" === $"req_key", "left_anti")
    // slim corpus-derived key frame: NOT broadcast by contract (a bulk
    // erasure makes it large); the anti join shuffles orderkeys only
    val delOrderKeys = ordDeleted.select($"o_orderkey".as("del_okey"))
    val lineAfter = lineitem
      .join(delOrderKeys, $"l_orderkey" === $"del_okey", "left_anti")
    def leg(tbl: String, before: DataFrame, after: DataFrame,
            key: org.apache.spark.sql.Column): DataFrame = {
      val b = before.agg(count(lit(1)).as("rows_before"))
      val a = after.agg(count(lit(1)).as("rows_after"),
        digest(key).as("survivor_digest"))
      b.crossJoin(a).select(lit(tbl).as("tbl"), $"rows_before",
        ($"rows_before" - $"rows_after").as("rows_deleted"),
        $"rows_after", $"survivor_digest")
    }
    leg("customer", customer, custAfter, $"c_custkey".cast("string"))
      .unionByName(leg("orders", orders, ordAfter,
        $"o_orderkey".cast("string")))
      // lineitem's key is composite (orderkey, linenumber)
      .unionByName(leg("lineitem", lineitem, lineAfter,
        concat($"l_orderkey".cast("string"), lit(":"),
          $"l_linenumber".cast("string"))))
      .orderBy($"tbl")
  }

  private val forgetCascadeSql =
    """WITH req AS (SELECT c_custkey FROM customer WHERE c_custkey % 97 = 0),
      |ca AS (SELECT * FROM customer WHERE c_custkey NOT IN (SELECT c_custkey FROM req)),
      |oa AS (SELECT * FROM orders WHERE o_custkey NOT IN (SELECT c_custkey FROM req)),
      |dok AS (SELECT o_orderkey FROM orders WHERE o_custkey IN (SELECT c_custkey FROM req)),
      |la AS (SELECT * FROM lineitem WHERE l_orderkey NOT IN (SELECT o_orderkey FROM dok)),
      |u AS (
      |  SELECT 'customer' AS tbl,
      |    (SELECT count(*) FROM customer) AS rows_before,
      |    (SELECT count(*) FROM ca) AS rows_after,
      |    (SELECT SUM(CAST(md5_number_lower('k:' || CAST(c_custkey AS VARCHAR))
      |       & 9223372036854775807::UBIGINT AS BIGINT) % 1000000007)
      |     FROM ca) AS survivor_digest
      |  UNION ALL
      |  SELECT 'orders',
      |    (SELECT count(*) FROM orders),
      |    (SELECT count(*) FROM oa),
      |    (SELECT SUM(CAST(md5_number_lower('k:' || CAST(o_orderkey AS VARCHAR))
      |       & 9223372036854775807::UBIGINT AS BIGINT) % 1000000007)
      |     FROM oa)
      |  UNION ALL
      |  SELECT 'lineitem',
      |    (SELECT count(*) FROM lineitem),
      |    (SELECT count(*) FROM la),
      |    (SELECT SUM(CAST(md5_number_lower('k:' || CAST(l_orderkey AS VARCHAR)
      |       || ':' || CAST(l_linenumber AS VARCHAR))
      |       & 9223372036854775807::UBIGINT AS BIGINT) % 1000000007)
      |     FROM la))
      |SELECT tbl, rows_before, rows_before - rows_after AS rows_deleted,
      |  rows_after, CAST(survivor_digest AS BIGINT) AS survivor_digest
      |FROM u ORDER BY tbl""".stripMargin

  // -------------------------------------------------------------- q_chi_square
  // audited-global-window(q_chi_square): frame = contingency-cell grid (category x category) — bound audited in PlanAuditSpec/UnpartitionedWindowAudit
  // audited-bnlj(q_chi_square): build side = 1-row global-aggregate broadcast — audited in PlanAuditSpec/BnljAudit
  /** Chi-square independence audit between ingest `source` and `lang`
    * on `documents` — the statistical dependence check behind "is this
    * source language-skewed?": the full contingency table (zero cells
    * included — they carry expected mass and belong in the statistic)
    * with each cell's observed count, expected count in milli-units,
    * and chi-square contribution in micro-units, plus the global
    * statistic as a rollup row (source = lang = '__total__'; dof is
    * (|sources|−1)(|langs|−1), derivable from the cell rows).
    * Chi-square is RATIONAL in the counts, so the whole
    * audit is integer-quantized — `term = (d² DIV (rt·ct))·1e6 DIV N`
    * with `d = O·N − rt·ct` — the identical operation order in both
    * engines, bit-stable on any partitioning. Since |d| can reach
    * min(rt,ct)·N, d² overflows a long once min(rt,ct)·N exceeds
    * ~3.0e9, so d and d² are routed through DECIMAL(38,0) on the Spark
    * side and HUGEINT in the oracle; the quotient d²/(rt·ct) is
    * bounded by N·(O−E)²/E ≤ N², so the audit is exact for any corpus
    * with N ≤ ~3e9 docs, and the DIV sequence surfaces (rather than
    * wraps) beyond that.
    *
    * Scale shape: one keyed aggregation to (source, lang) cells
    * (map-side partials); margins, the zero-cell completion cross join,
    * and the rollup all run over the cells frame — cardinality
    * |sources|×|langs|, never corpus-sized. */
  private def chiSquare(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val cells = Tables.documents(s, dir)
      .groupBy($"source", $"lang").agg(count(lit(1)).as("obs"))
    val rows = cells.groupBy($"source").agg(sum($"obs").as("rt"))
    val cols = cells.groupBy($"lang").agg(sum($"obs").as("ct"))
    val full = rows.crossJoin(cols)
      .join(cells, Seq("source", "lang"), "left")
      .na.fill(0L, Seq("obs"))
      .withColumn("n", sum($"obs").over(Window.partitionBy()))
      .withColumn("d",
        $"obs".cast(DecimalType(38, 0)) * $"n"
          - $"rt".cast(DecimalType(38, 0)) * $"ct")
      .withColumn("rc", $"rt".cast(DecimalType(38, 0)) * $"ct")
      .select($"source", $"lang", $"obs",
        expr("rc * 1000 DIV n").as("expected_milli"),
        expr("CAST(d * d DIV rc AS DECIMAL(38,0)) * 1000000 DIV n")
          .as("term_micro"))
    val total = full.agg(
      sum($"obs").as("obs"),
      sum($"expected_milli").as("expected_milli"),
      sum($"term_micro").as("term_micro"))
      .select(lit("__total__").as("source"), lit("__total__").as("lang"),
        $"obs", $"expected_milli", $"term_micro")
    full.unionByName(total).orderBy($"source", $"lang")
  }

  private val chiSquareSql =
    """WITH cells AS (
      |  SELECT source, lang, COUNT(*) AS obs FROM documents GROUP BY 1, 2),
      |r AS (SELECT source, CAST(SUM(obs) AS BIGINT) AS rt FROM cells GROUP BY 1),
      |c AS (SELECT lang, CAST(SUM(obs) AS BIGINT) AS ct FROM cells GROUP BY 1),
      |full0 AS (
      |  SELECT r.source, c.lang, COALESCE(cells.obs, 0) AS obs, rt, ct
      |  FROM r CROSS JOIN c
      |  LEFT JOIN cells ON cells.source = r.source AND cells.lang = c.lang),
      |full1 AS (
      |  SELECT source, lang, CAST(obs AS BIGINT) AS obs, rt, ct,
      |    CAST(SUM(obs) OVER () AS BIGINT) AS n
      |  FROM full0),
      |full2 AS (
      |  SELECT source, lang, obs,
      |    CAST(CAST(rt AS HUGEINT) * ct * 1000 // n AS BIGINT)
      |      AS expected_milli,
      |    CAST(((CAST(obs AS HUGEINT) * n - CAST(rt AS HUGEINT) * ct)
      |           * (CAST(obs AS HUGEINT) * n - CAST(rt AS HUGEINT) * ct)
      |           // (CAST(rt AS HUGEINT) * ct))
      |      * 1000000 // n AS BIGINT) AS term_micro
      |  FROM full1),
      |u AS (
      |  SELECT source, lang, obs, expected_milli, term_micro FROM full2
      |  UNION ALL
      |  SELECT '__total__', '__total__', CAST(SUM(obs) AS BIGINT),
      |    CAST(SUM(expected_milli) AS BIGINT), CAST(SUM(term_micro) AS BIGINT)
      |  FROM full2)
      |SELECT source, lang, obs, expected_milli, term_micro
      |FROM u ORDER BY source, lang""".stripMargin

  // -------------------------------------------------------------- q_t_closeness
  // audited-bnlj(q_t_closeness): build side = 1-row global-aggregate broadcast — audited in PlanAuditSpec/BnljAudit
  /** t-closeness — the third rung of the release-audit ladder after
    * k-anonymity and l-diversity: a group can be large AND diverse yet
    * still leak if its sensitive-value DISTRIBUTION deviates from the
    * table-wide one (an attacker learns "this nation skews AUTOMOBILE").
    * For a categorical sensitive attribute the EMD under uniform ground
    * distance is the total-variation distance, so per nation QI group we
    * emit t = ½·Σ|p_group(seg) − p_global(seg)| in exact ppm over the
    * COMPLETE segment grid (a segment absent from the group contributes
    * its full global mass). Integer ppm quantization with identical DIV
    * order on both engines — bit-stable, the q_chi_square recipe.
    *
    * Scale shape: one (nation, segment) aggregation over the fact table
    * (map-side partials, the only corpus-scale step); the grid build,
    * global marginal, and TVD rollup all run on QI×sensitive-sized
    * frames (tiny — broadcast joins). */
  val TClosenessPpm = 250000L

  private def tCloseness(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val cells = Tables.customer(s, dir)
      .groupBy($"c_nationkey", $"c_mktsegment").agg(count(lit(1)).as("obs"))
    val nations = cells.groupBy($"c_nationkey").agg(sum($"obs").cast("long").as("k"))
    val segs = cells.groupBy($"c_mktsegment").agg(sum($"obs").cast("long").as("seg_n"))
    val grand = cells.agg(sum($"obs").cast("long").as("n"))
    val grid = nations.crossJoin(broadcast(segs)).crossJoin(broadcast(grand))
      .join(cells, Seq("c_nationkey", "c_mktsegment"), "left")
      .select($"c_nationkey", $"k", $"n",
        coalesce($"obs", lit(0L)).as("obs"), $"seg_n")
    grid
      .select($"c_nationkey", $"k",
        abs(expr("obs * 1000000 DIV k") - expr("seg_n * 1000000 DIV n"))
          .as("dev_ppm"))
      .groupBy($"c_nationkey")
      .agg(max($"k").as("k"),
        expr("CAST(sum(dev_ppm) AS BIGINT) DIV 2").as("t_ppm"))
      .select($"c_nationkey", $"k", $"t_ppm",
        ($"t_ppm" > TClosenessPpm).as("at_risk"))
      .orderBy($"c_nationkey")
  }

  private val tClosenessSql =
    s"""WITH cells AS (
       |  SELECT c_nationkey, c_mktsegment, COUNT(*) AS obs
       |  FROM customer GROUP BY 1, 2),
       |nat AS (SELECT c_nationkey, CAST(SUM(obs) AS BIGINT) AS k
       |        FROM cells GROUP BY 1),
       |seg AS (SELECT c_mktsegment, CAST(SUM(obs) AS BIGINT) AS seg_n
       |        FROM cells GROUP BY 1),
       |grand AS (SELECT CAST(SUM(obs) AS BIGINT) AS n FROM cells),
       |grid AS (
       |  SELECT nat.c_nationkey, nat.k, grand.n,
       |    COALESCE(cells.obs, 0) AS obs, seg.seg_n
       |  FROM nat CROSS JOIN seg CROSS JOIN grand
       |  LEFT JOIN cells ON cells.c_nationkey = nat.c_nationkey
       |    AND cells.c_mktsegment = seg.c_mktsegment),
       |dev AS (
       |  SELECT c_nationkey, k,
       |    ABS(obs * 1000000 // k - seg_n * 1000000 // n) AS dev_ppm
       |  FROM grid)
       |SELECT c_nationkey, MAX(k) AS k,
       |  CAST(SUM(dev_ppm) AS BIGINT) // 2 AS t_ppm,
       |  CAST(SUM(dev_ppm) AS BIGINT) // 2 > $TClosenessPpm AS at_risk
       |FROM dev GROUP BY c_nationkey ORDER BY c_nationkey""".stripMargin

  val all: Seq[NamedQuery] = Seq(
    NamedQuery("q_t_closeness", tCloseness, Some(tClosenessSql), bench = true),
    NamedQuery("q_chi_square", chiSquare, Some(chiSquareSql), bench = true),
    NamedQuery("q_forget_cascade", forgetCascade, Some(forgetCascadeSql),
      bench = true),
    NamedQuery("q_k_anonymity", kAnonymity, Some(kAnonymitySql), bench = true),
    NamedQuery("q_l_diversity", lDiversity, Some(lDiversitySql), bench = true),
    NamedQuery("q_pii_redact", piiRedact, Some(piiRedactSql), bench = true),
    NamedQuery("q_profile_columns", profileColumns, Some(profileColumnsSql),
      bench = true))
}
