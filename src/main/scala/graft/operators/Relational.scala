package graft.operators

import graft.{NamedQuery, Tables}
import graft.functions.Exact._
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Relational parity queries — one per operator pattern in SURVEY.md §2,
  * realized over the shared TPC-H-ish test tables (SURVEY.md §7.0 mapping:
  * `customer.c_mktsegment` plays `industry`, `orders` month-bucketed plays
  * the monthly series, latest-order-per-customer plays the
  * latest-quarter-per-ticker pattern of the reference's `cleaning.py:62-63`).
  *
  * Scale notes (100 TB design):
  *  - dimension joins (`nation`, `region`, single-row query frames) are
  *    explicitly `broadcast()` — no shuffle of the fact side;
  *  - fact-fact joins/aggs shuffle on their natural keys once and reuse it;
  *  - every query is a single declarative plan: Catalyst pushes filters and
  *    prunes columns into the parquet scan (verified via explain in tests).
  */
object Relational {

  private def nullifZero(c: Column): Column = when(c === 0, lit(null)).otherwise(c)

  // ---------------------------------------------------------------- q_agg_basic
  /** A2-shaped multi-measure hash aggregate (TPC-H Q1 silhouette).
    * Reference: 12x AVG GROUP BY industry, Frontend.py:60-69. */
  private def aggBasic(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.lineitem(s, dir)
      .filter($"l_shipdate" <= lit(java.sql.Timestamp.valueOf("2000-09-02 00:00:00")))
      .groupBy($"l_returnflag", $"l_linestatus")
      .agg(
        dsum($"l_quantity").as("sum_qty"),
        dsum($"l_extendedprice").as("sum_base_price"),
        dsum($"l_extendedprice" * (lit(1) - $"l_discount"), 4).as("sum_disc_price"),
        dsum(($"l_extendedprice" * (lit(1) - $"l_discount")) * (lit(1) + $"l_tax"), 6).as("sum_charge"),
        davg($"l_quantity").as("avg_qty"),
        davg($"l_extendedprice").as("avg_price"),
        davg($"l_discount").as("avg_disc"),
        count(lit(1)).as("count_order"))
      .orderBy($"l_returnflag", $"l_linestatus")
  }

  private val aggBasicSql =
    s"""SELECT l_returnflag, l_linestatus,
       | ${sqlDsum("l_quantity")} AS sum_qty,
       | ${sqlDsum("l_extendedprice")} AS sum_base_price,
       | ${sqlDsum("l_extendedprice * (1 - l_discount)", 4)} AS sum_disc_price,
       | ${sqlDsum("(l_extendedprice * (1 - l_discount)) * (1 + l_tax)", 6)} AS sum_charge,
       | ${sqlDavg("l_quantity")} AS avg_qty,
       | ${sqlDavg("l_extendedprice")} AS avg_price,
       | ${sqlDavg("l_discount")} AS avg_disc,
       | COUNT(*) AS count_order
       |FROM lineitem
       |WHERE l_shipdate <= TIMESTAMP '2000-09-02 00:00:00'
       |GROUP BY l_returnflag, l_linestatus
       |ORDER BY l_returnflag, l_linestatus""".stripMargin

  // ------------------------------------------------------------ q_industry_avg
  /** Flagship: the reference's `industry_averages` (Frontend.py:60-69) —
    * entity dim LEFT JOIN periodic facts LEFT JOIN derived metrics,
    * multi-measure AVG GROUP BY segment (J5 + A2). */
  def industryAvg(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val c = Tables.customer(s, dir)
    val o = Tables.orders(s, dir)
    val l = Tables.lineitem(s, dir)
    // "financial_statements" analog: per-customer order facts
    val fs = o.groupBy($"o_custkey")
      .agg(
        dsum($"o_totalprice").as("total_spend"),
        count(lit(1)).as("n_orders"))
      .withColumnRenamed("o_custkey", "fs_custkey")
    // "ratios" analog: per-customer derived metrics from the fact table
    val r = l.join(o.select($"o_orderkey", $"o_custkey"), $"l_orderkey" === $"o_orderkey")
      .groupBy($"o_custkey")
      .agg(
        dsum($"l_extendedprice" * (lit(1) - $"l_discount"), 4).as("revenue"),
        dsum($"l_quantity").as("total_qty"))
      .withColumnRenamed("o_custkey", "r_custkey")
    c.join(fs, $"c_custkey" === $"fs_custkey", "left")
      .join(r, $"c_custkey" === $"r_custkey", "left")
      .groupBy($"c_mktsegment".as("segment"))
      .agg(
        count(lit(1)).as("n_customers"),
        davg($"c_acctbal").as("avg_acctbal"),
        davg($"total_spend").as("avg_spend"),
        iavg($"n_orders").as("avg_orders"),
        davg($"revenue", 4).as("avg_revenue"),
        davg($"total_qty").as("avg_qty"))
      .orderBy($"segment")
  }

  private[operators] val industryAvgSql =
    s"""WITH fs AS (
       |  SELECT o_custkey, ${sqlDsum("o_totalprice")} AS total_spend, COUNT(*) AS n_orders
       |  FROM orders GROUP BY o_custkey),
       |r AS (
       |  SELECT o.o_custkey, ${sqlDsum("l.l_extendedprice * (1 - l.l_discount)", 4)} AS revenue,
       |         ${sqlDsum("l.l_quantity")} AS total_qty
       |  FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
       |  GROUP BY o.o_custkey)
       |SELECT c.c_mktsegment AS segment,
       |  COUNT(*) AS n_customers,
       |  ${sqlDavg("c.c_acctbal")} AS avg_acctbal,
       |  ${sqlDavg("fs.total_spend")} AS avg_spend,
       |  ${sqlIavg("fs.n_orders")} AS avg_orders,
       |  ${sqlDavg("r.revenue", 4)} AS avg_revenue,
       |  ${sqlDavg("r.total_qty")} AS avg_qty
       |FROM customer c
       |LEFT JOIN fs ON c.c_custkey = fs.o_custkey
       |LEFT JOIN r ON c.c_custkey = r.o_custkey
       |GROUP BY c.c_mktsegment
       |ORDER BY segment""".stripMargin

  // ------------------------------------------------------------ q_point_lookup
  /** P2: point equality filter (`WHERE ticker = 'T'`, Frontend.py:28-55).
    * At scale this is a parquet scan with the predicate pushed to row
    * groups — explain shows PushedFilters: [EqualTo(c_custkey,42)]. */
  private def pointLookup(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.customer(s, dir).filter($"c_custkey" === 42)
      .select($"c_custkey", $"c_name", $"c_nationkey", $"c_acctbal", $"c_mktsegment")
  }

  private val pointLookupSql =
    """SELECT c_custkey, c_name, c_nationkey, c_acctbal, c_mktsegment
      |FROM customer WHERE c_custkey = 42""".stripMargin

  // ----------------------------------------------------- q_latest_per_key_join
  /** J1/A1: latest-row-per-group via group-max + self equi-join — the
    * reference's exact formulation (cleaning.py:62-63). Keeps ties like
    * pandas merge does. */
  private def latestPerKeyJoin(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val o = Tables.orders(s, dir)
    val latest = o.groupBy($"o_custkey").agg(max($"o_orderdate").as("max_date"))
      .withColumnRenamed("o_custkey", "m_custkey")
    o.join(latest, $"o_custkey" === $"m_custkey" && $"o_orderdate" === $"max_date")
      .select(
        $"o_custkey".as("custkey"),
        $"o_orderkey".as("orderkey"),
        date_format($"o_orderdate", "yyyy-MM").as("latest_month"),
        $"o_totalprice".as("totalprice"))
      .orderBy($"custkey", $"orderkey")
  }

  private val latestPerKeyJoinSql =
    """SELECT o.o_custkey AS custkey, o.o_orderkey AS orderkey,
      |  strftime(o.o_orderdate, '%Y-%m') AS latest_month,
      |  o.o_totalprice AS totalprice
      |FROM orders o
      |JOIN (SELECT o_custkey, max(o_orderdate) AS max_date FROM orders GROUP BY o_custkey) m
      |  ON o.o_custkey = m.o_custkey AND o.o_orderdate = m.max_date
      |ORDER BY custkey, orderkey""".stripMargin

  // --------------------------------------------------- q_latest_per_key_window
  /** J1 idiomatic alternative: row_number window (SURVEY.md §2.5) — one
    * shuffle on the partition key instead of agg + join; dedups ties
    * deterministically. The two formulations are asserted equivalent in
    * RelationalSpec. */
  private def latestPerKeyWindow(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy($"o_custkey").orderBy($"o_orderdate".desc, $"o_orderkey".desc)
    Tables.orders(s, dir)
      .withColumn("rn", row_number().over(w))
      .filter($"rn" === 1)
      .select(
        $"o_custkey".as("custkey"),
        $"o_orderkey".as("orderkey"),
        date_format($"o_orderdate", "yyyy-MM").as("latest_month"),
        $"o_totalprice".as("totalprice"))
      .orderBy($"custkey")
  }

  private val latestPerKeyWindowSql =
    """SELECT custkey, orderkey, latest_month, totalprice FROM (
      |  SELECT o_custkey AS custkey, o_orderkey AS orderkey,
      |    strftime(o_orderdate, '%Y-%m') AS latest_month,
      |    o_totalprice AS totalprice,
      |    row_number() OVER (PARTITION BY o_custkey
      |                       ORDER BY o_orderdate DESC, o_orderkey DESC) AS rn
      |  FROM orders) t
      |WHERE rn = 1 ORDER BY custkey""".stripMargin

  // ---------------------------------------------------------- q_derived_ratios
  /** F6-F8: row-level derived metrics (cleaning.py:59,82,87) with the
    * reference's silent div-by-zero tolerated via NULLIF guards (SURVEY.md
    * §7.3 risk 3). Pure row-level arithmetic — identical IEEE ops in both
    * engines, so no rounding needed. */
  private def derivedRatios(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.lineitem(s, dir).select(
      $"l_orderkey".as("orderkey"),
      $"l_linenumber".as("linenumber"),
      ($"l_extendedprice" * (lit(1) - $"l_discount")).as("revenue"),
      ($"l_extendedprice" / nullifZero($"l_quantity")).as("unit_price"),
      (($"l_extendedprice" * (lit(1) - $"l_discount")) * (lit(1) + $"l_tax") /
        nullifZero($"l_quantity" * (lit(1) - $"l_discount"))).as("charge_per_unit"))
      .orderBy($"orderkey", $"linenumber")
  }

  private val derivedRatiosSql =
    """SELECT l_orderkey AS orderkey, l_linenumber AS linenumber,
      |  l_extendedprice * (1 - l_discount) AS revenue,
      |  l_extendedprice / NULLIF(l_quantity, 0) AS unit_price,
      |  (l_extendedprice * (1 - l_discount)) * (1 + l_tax)
      |    / NULLIF(l_quantity * (1 - l_discount), 0) AS charge_per_unit
      |FROM lineitem ORDER BY orderkey, linenumber""".stripMargin

  // ------------------------------------------------------- q_monthly_avg_trend
  /** J6+A3+O1+F4: the reference's `industry_average_stock_price`
    * (Frontend.py:71-79): dim LEFT JOIN series, segment filter, AVG GROUP
    * BY month, ORDER BY month. Customers with no orders fold into a
    * sentinel bucket (explicit, instead of relying on engine NULL-ordering). */
  private def monthlyAvgTrend(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val c = Tables.customer(s, dir).filter($"c_mktsegment" === "BUILDING")
    val o = Tables.orders(s, dir)
    c.join(o, $"c_custkey" === $"o_custkey", "left")
      .groupBy(coalesce(date_format($"o_orderdate", "yyyy-MM"), lit("no-order")).as("month"))
      .agg(
        davg($"o_totalprice").as("avg_total_price"),
        count(lit(1)).as("n_rows"))
      .orderBy($"month")
  }

  private val monthlyAvgTrendSql =
    s"""SELECT COALESCE(strftime(o.o_orderdate, '%Y-%m'), 'no-order') AS month,
       |  ${sqlDavg("o.o_totalprice")} AS avg_total_price,
       |  COUNT(*) AS n_rows
       |FROM customer c LEFT JOIN orders o ON c.c_custkey = o.o_custkey
       |WHERE c.c_mktsegment = 'BUILDING'
       |GROUP BY 1 ORDER BY month""".stripMargin

  // -------------------------------------------------------------- q_date_format
  /** F4/F5: month-key derivation ("yyyy-MM") and display formatting
    * ("MMM yyyy"), retrieval.py:44,63 / Frontend.py:57-58,81-82. */
  private def dateFormatQ(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.orders(s, dir)
      .select(
        date_format($"o_orderdate", "yyyy-MM").as("month"),
        date_format($"o_orderdate", "MMM yyyy").as("display_month"))
      .distinct()
      .orderBy($"month")
  }

  private val dateFormatSql =
    """SELECT DISTINCT strftime(o_orderdate, '%Y-%m') AS month,
      |  strftime(o_orderdate, '%b %Y') AS display_month
      |FROM orders ORDER BY month""".stripMargin

  // --------------------------------------------------------------------- q_topk
  /** O1/O2: global sort + limit (top-k). Spark plans this as TakeOrderedAndProject
    * — per-partition heaps, no global shuffle of the full table. */
  private def topk(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.customer(s, dir)
      .select($"c_custkey".as("custkey"), $"c_name".as("name"), $"c_acctbal".as("acctbal"))
      .orderBy($"acctbal".desc, $"custkey")
      .limit(10)
  }

  private val topkSql =
    """SELECT c_custkey AS custkey, c_name AS name, c_acctbal AS acctbal
      |FROM customer ORDER BY acctbal DESC, custkey LIMIT 10""".stripMargin

  // --------------------------------------------------------- q_left_join_enrich
  /** J2-J4: dimension-enrichment join chain (cleaning.py:85-88). Both dims
    * are broadcast — zero shuffle of the big side at any scale. */
  private def leftJoinEnrich(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val c = Tables.customer(s, dir)
    val n = Tables.nation(s, dir)
    val r = Tables.region(s, dir)
    c.join(broadcast(n), $"c_nationkey" === $"n_nationkey", "left")
      .join(broadcast(r), $"n_regionkey" === $"r_regionkey", "left")
      .select(
        $"c_custkey".as("custkey"),
        $"c_name".as("name"),
        $"n_name".as("nation"),
        $"r_name".as("region"),
        $"c_acctbal".as("acctbal"))
      .orderBy($"custkey")
  }

  private val leftJoinEnrichSql =
    """SELECT c.c_custkey AS custkey, c.c_name AS name, n.n_name AS nation,
      |  r.r_name AS region, c.c_acctbal AS acctbal
      |FROM customer c
      |LEFT JOIN nation n ON c.c_nationkey = n.n_nationkey
      |LEFT JOIN region r ON n.n_regionkey = r.r_regionkey
      |ORDER BY custkey""".stripMargin

  // ------------------------------------------------------------ q_cast_conform
  /** P1+F10: fixed-schema conformance — projection + rename + casts,
    * including the reference's null-on-bad-cast string->double semantics
    * (cleaning.py:30,42,58,80; ANSI off <-> oracle TRY_CAST). */
  private def castConform(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.orders(s, dir).select(
      $"o_orderkey".cast(StringType).as("order_id"),
      $"o_custkey".as("cust_id"),
      $"o_totalprice".cast(DoubleType).as("total_price"),
      date_format($"o_orderdate", "yyyy-MM").as("month"),
      $"o_orderstatus".as("status"),
      expr("try_cast(o_orderpriority AS DOUBLE)").as("prio_num")) // '5-LOW' -> null
      .orderBy($"cust_id", $"order_id")
  }

  private val castConformSql =
    """SELECT CAST(o_orderkey AS VARCHAR) AS order_id, o_custkey AS cust_id,
      |  CAST(o_totalprice AS DOUBLE) AS total_price,
      |  strftime(o_orderdate, '%Y-%m') AS month,
      |  o_orderstatus AS status,
      |  TRY_CAST(o_orderpriority AS DOUBLE) AS prio_num
      |FROM orders ORDER BY cust_id, order_id""".stripMargin

  // --------------------------------------------------------------- q_union_all
  /** U1: vertical concat (retrieval.py:22,43,62). */
  private def unionAll(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val l = Tables.lineitem(s, dir)
    val a = l.filter($"l_returnflag" === "A")
      .select($"l_orderkey".as("orderkey"), $"l_linenumber".as("linenumber"), $"l_returnflag".as("flag"))
    val r = l.filter($"l_returnflag" === "R")
      .select($"l_orderkey".as("orderkey"), $"l_linenumber".as("linenumber"), $"l_returnflag".as("flag"))
    a.unionByName(r).orderBy($"orderkey", $"linenumber", $"flag")
  }

  private val unionAllSql =
    """SELECT * FROM (
      |  SELECT l_orderkey AS orderkey, l_linenumber AS linenumber, l_returnflag AS flag
      |  FROM lineitem WHERE l_returnflag = 'A'
      |  UNION ALL
      |  SELECT l_orderkey, l_linenumber, l_returnflag
      |  FROM lineitem WHERE l_returnflag = 'R') t
      |ORDER BY orderkey, linenumber, flag""".stripMargin

  // -------------------------------------------------- q_union_entity_vs_avg
  /** U2+R5: entity row UNION segment-average row, schema-aligned with a
    * missing column (Frontend.py:86-88). The positional relabel (R5) is
    * replaced by an explicit `entity` tag — SURVEY.md §7.3 risk 2. */
  private def entityVsAvgFrame(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val c = Tables.customer(s, dir)
    val spend = Tables.orders(s, dir).groupBy($"o_custkey")
      .agg(dsum($"o_totalprice").as("total_spend"))
    val enriched = c.join(spend, $"c_custkey" === $"o_custkey", "left")
    val one = enriched.filter($"c_custkey" === 42)
      .select($"c_name".as("entity"), $"c_acctbal".as("acctbal"),
        $"total_spend", $"c_nationkey".as("nationkey"))
    // the segment of customer 42, resolved relationally (no collect)
    val seg42 = c.filter($"c_custkey" === 42).select($"c_mktsegment".as("seg42"))
    val avgRow = enriched.join(broadcast(seg42), $"c_mktsegment" === $"seg42")
      .agg(davg($"c_acctbal").as("acctbal"), davg($"total_spend").as("total_spend"))
      .select(lit("Segment Average").as("entity"), $"acctbal", $"total_spend")
    one.unionByName(avgRow, allowMissingColumns = true).orderBy($"entity")
  }

  private val entityVsAvgSql =
    s"""WITH spend AS (
       |  SELECT o_custkey, ${sqlDsum("o_totalprice")} AS total_spend FROM orders GROUP BY o_custkey),
       |enriched AS (
       |  SELECT c.*, s.total_spend FROM customer c LEFT JOIN spend s ON c.c_custkey = s.o_custkey),
       |one AS (
       |  SELECT c_name AS entity, c_acctbal AS acctbal, total_spend,
       |         CAST(c_nationkey AS INT) AS nationkey
       |  FROM enriched WHERE c_custkey = 42),
       |seg AS (
       |  SELECT 'Segment Average' AS entity,
       |    ${sqlDavg("c_acctbal")} AS acctbal,
       |    ${sqlDavg("total_spend")} AS total_spend,
       |    CAST(NULL AS INT) AS nationkey
       |  FROM enriched
       |  WHERE c_mktsegment = (SELECT c_mktsegment FROM customer WHERE c_custkey = 42))
       |SELECT * FROM one UNION ALL SELECT * FROM seg ORDER BY entity""".stripMargin

  // --------------------------------------------------------- q_unpivot_compare
  /** R3: wide->long unpivot of the 2-row comparison frame (Frontend.py:96-97)
    * — Spark `unpivot`, oracle spelled as UNION ALL. */
  private def unpivotCompare(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    entityVsAvgFrame(s, dir)
      .unpivot(Array($"entity"), Array($"acctbal", $"total_spend"), "metric", "value")
      .orderBy($"entity", $"metric")
  }

  private[operators] val unpivotCompareSql =
    s"""WITH spend AS (
       |  SELECT o_custkey, ${sqlDsum("o_totalprice")} AS total_spend FROM orders GROUP BY o_custkey),
       |enriched AS (
       |  SELECT c.*, s.total_spend FROM customer c LEFT JOIN spend s ON c.c_custkey = s.o_custkey),
       |base AS (
       |  SELECT c_name AS entity, c_acctbal AS acctbal, total_spend
       |  FROM enriched WHERE c_custkey = 42
       |  UNION ALL
       |  SELECT 'Segment Average', ${sqlDavg("c_acctbal")}, ${sqlDavg("total_spend")}
       |  FROM enriched
       |  WHERE c_mktsegment = (SELECT c_mktsegment FROM customer WHERE c_custkey = 42))
       |SELECT entity, metric, value FROM (
       |  SELECT entity, 'acctbal' AS metric, acctbal AS value FROM base
       |  UNION ALL
       |  SELECT entity, 'total_spend' AS metric, total_spend AS value FROM base) t
       |ORDER BY entity, metric""".stripMargin

  // ----------------------------------------------------------- q_pivot_attrs
  /** R1: wide-attribute pivot of long (key, attr, value) rows — the
    * reference's `pd.Series(ticker.info)` → transpose ingest shape
    * (retrieval.py:16-24). Long form built by unpivot, then
    * `groupBy(key).pivot(attr, values).agg(first)`. The pivot value list
    * is EXPLICIT — at scale this skips the extra distinct-collection job
    * and pins deterministic output columns. */
  private def pivotAttrs(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val long = Tables.customer(s, dir)
      .select($"c_custkey".as("custkey"),
        $"c_name".as("name"),
        $"c_mktsegment".as("mktsegment"),
        $"c_nationkey".cast(StringType).as("nationkey"))
      .unpivot(Array($"custkey"), Array($"name", $"mktsegment", $"nationkey"),
        "attr", "value")
    long.groupBy($"custkey")
      .pivot("attr", Seq("mktsegment", "name", "nationkey"))
      .agg(first($"value"))
      .orderBy($"custkey")
  }

  private[operators] val pivotAttrsSql =
    """WITH long AS (
      |  SELECT c_custkey AS custkey, 'name' AS attr, c_name AS value FROM customer
      |  UNION ALL
      |  SELECT c_custkey, 'mktsegment', c_mktsegment FROM customer
      |  UNION ALL
      |  SELECT c_custkey, 'nationkey', CAST(c_nationkey AS VARCHAR) FROM customer)
      |SELECT custkey,
      |  MAX(CASE WHEN attr = 'mktsegment' THEN value END) AS mktsegment,
      |  MAX(CASE WHEN attr = 'name' THEN value END) AS name,
      |  MAX(CASE WHEN attr = 'nationkey' THEN value END) AS nationkey
      |FROM long GROUP BY custkey ORDER BY custkey""".stripMargin

  // ---------------------------------------------------------- q_pivot_status
  /** R2: statement-transpose analog — a (month x category) measure matrix,
    * like `quarterly_financials.transpose()` (retrieval.py:58): month rows,
    * one column per order status, exact-summed measure. */
  private def pivotStatus(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.orders(s, dir)
      .groupBy(date_format($"o_orderdate", "yyyy-MM").as("month"))
      .pivot("o_orderstatus", Seq("F", "O", "P"))
      .agg(dsum($"o_totalprice"))
      .withColumnsRenamed(Map("F" -> "total_f", "O" -> "total_o", "P" -> "total_p"))
      .orderBy($"month")
  }

  private val pivotStatusSql =
    s"""SELECT strftime(o_orderdate, '%Y-%m') AS month,
       |  ${sqlDsum("CASE WHEN o_orderstatus = 'F' THEN o_totalprice END")} AS total_f,
       |  ${sqlDsum("CASE WHEN o_orderstatus = 'O' THEN o_totalprice END")} AS total_o,
       |  ${sqlDsum("CASE WHEN o_orderstatus = 'P' THEN o_totalprice END")} AS total_p
       |FROM orders GROUP BY 1 ORDER BY month""".stripMargin

  // ------------------------------------------------------ q_outer_join_align
  /** J8: full outer join aligning two per-(key, month) fact frames on
    * their composite key — the reference's `pd.concat([financials.T,
    * balance_sheet.T], axis=1)` date-index outer alignment
    * (retrieval.py:58). Nulls where one side is absent. */
  private def outerJoinAlign(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val o = Tables.orders(s, dir)
    val a = o.groupBy($"o_custkey".as("custkey"),
        date_format($"o_orderdate", "yyyy-MM").as("month"))
      .agg(dsum($"o_totalprice").as("order_total"))
    val b = Tables.lineitem(s, dir)
      .join(o.select($"o_orderkey", $"o_custkey"), $"l_orderkey" === $"o_orderkey")
      .groupBy($"o_custkey".as("custkey"),
        date_format($"l_shipdate", "yyyy-MM").as("month"))
      .agg(dsum($"l_extendedprice" * (lit(1) - $"l_discount"), 4).as("ship_revenue"))
    a.join(b, Seq("custkey", "month"), "full")
      .orderBy($"custkey", $"month")
  }

  private val outerJoinAlignSql =
    s"""WITH a AS (
       |  SELECT o_custkey AS custkey, strftime(o_orderdate, '%Y-%m') AS month,
       |    ${sqlDsum("o_totalprice")} AS order_total
       |  FROM orders GROUP BY 1, 2),
       |b AS (
       |  SELECT o.o_custkey AS custkey, strftime(l.l_shipdate, '%Y-%m') AS month,
       |    ${sqlDsum("l.l_extendedprice * (1 - l.l_discount)", 4)} AS ship_revenue
       |  FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
       |  GROUP BY 1, 2)
       |SELECT COALESCE(a.custkey, b.custkey) AS custkey,
       |  COALESCE(a.month, b.month) AS month,
       |  a.order_total, b.ship_revenue
       |FROM a FULL JOIN b ON a.custkey = b.custkey AND a.month = b.month
       |ORDER BY custkey, month""".stripMargin

  // ---------------------------------------------------------- q_fill_missing
  /** Missing-value backfill (the reference README's manual-backfill hook,
    * SURVEY §1.2): the full-outer alignment is exactly where nulls enter
    * the pipeline — flag incomplete rows, then na.fill the measures to 0.
    * A pure projection over the join: no extra shuffle. */
  private def fillMissing(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    outerJoinAlign(s, dir)
      .withColumn("was_complete",
        $"order_total".isNotNull && $"ship_revenue".isNotNull)
      .na.fill(0.0, Seq("order_total", "ship_revenue"))
  }

  private val fillMissingSql =
    s"""WITH base AS ($outerJoinAlignSql)
       |SELECT custkey, month,
       |  COALESCE(order_total, 0) AS order_total,
       |  COALESCE(ship_revenue, 0) AS ship_revenue,
       |  (order_total IS NOT NULL AND ship_revenue IS NOT NULL) AS was_complete
       |FROM base ORDER BY custkey, month""".stripMargin

  // ------------------------------------------------------- q_schema_normalize
  /** F1: snake_case column-name normalization (retrieval.py:23,45,64) —
    * a driver-side metadata op (`toDF`), no Catalyst expression involved. */
  def normalizeName(n: String): String =
    n.toLowerCase.replace(" ", "_").replaceAll("[^a-z0-9_]", "")

  private def schemaNormalize(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val messy = Tables.customer(s, dir)
      .select($"c_custkey".as("C CustKey"), $"c_acctbal".as("Acct Bal!"))
    messy.toDF(messy.columns.toIndexedSeq.map(normalizeName): _*).orderBy($"c_custkey")
  }

  private val schemaNormalizeSql =
    """SELECT c_custkey AS c_custkey, c_acctbal AS acct_bal
      |FROM customer ORDER BY c_custkey""".stripMargin

  // ------------------------------------------------------- q_approx_distinct
  /** Sketch-based distinct counting (HLL++) — the cardinality primitive a
    * 100 TB pipeline uses instead of exact COUNT(DISTINCT) (constant
    * memory per group, one shuffle of fixed-size sketches, mergeable
    * across partitions). Estimators differ across engines, so the
    * oracle-checked contract is (exact count, estimate-within-10%): both
    * engines' HLL implementations satisfy it, and the flag hashing makes
    * a broken sketch fail the row. */
  private def approxDistinct(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.lineitem(s, dir)
      .groupBy($"l_returnflag")
      .agg(
        count_distinct($"l_partkey").as("exact_parts"),
        approx_count_distinct($"l_partkey").as("approx_raw"))
      .select($"l_returnflag", $"exact_parts",
        (abs($"approx_raw" - $"exact_parts").cast("double") / $"exact_parts" <= 0.1)
          .as("approx_within_10pct"))
      .orderBy($"l_returnflag")
  }

  private val approxDistinctSql =
    """SELECT l_returnflag, COUNT(DISTINCT l_partkey) AS exact_parts,
      |  ABS(approx_count_distinct(l_partkey) - COUNT(DISTINCT l_partkey))
      |    / CAST(COUNT(DISTINCT l_partkey) AS DOUBLE) <= 0.1 AS approx_within_10pct
      |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin

  // ---------------------------------------------------------- q_date_window
  // audited-bnlj(q_date_window): build side = 1-row global-aggregate broadcast — audited in PlanAuditSpec/BnljAudit
  /** F3: relative date-window arithmetic — the reference's
    * `today - relativedelta(years=2) .. today` fetch window
    * (retrieval.py:36-38), anchored on max(o_orderdate) instead of
    * current_date so the result is deterministic. The single-row anchor
    * is broadcast — no shuffle of the fact side. */
  private def dateWindow(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val o = Tables.orders(s, dir)
    val anchor = o.agg(max($"o_orderdate").as("max_d"))
    o.crossJoin(broadcast(anchor))
      .filter($"o_orderdate" >= add_months($"max_d", -24))
      .groupBy(date_format($"o_orderdate", "yyyy-MM").as("month"))
      .agg(count(lit(1)).as("n_orders"))
      .orderBy($"month")
  }

  private val dateWindowSql =
    """WITH anchor AS (SELECT max(o_orderdate) AS max_d FROM orders)
      |SELECT strftime(o_orderdate, '%Y-%m') AS month, COUNT(*) AS n_orders
      |FROM orders, anchor
      |WHERE o_orderdate >= max_d - INTERVAL 24 MONTH
      |GROUP BY 1 ORDER BY month""".stripMargin

  // ------------------------------------------------------- q_event_window_agg
  /** Time-bucketed aggregation over the event stream table — the batch
    * equivalent of the Structured Streaming job in graft.streaming
    * (same window spec; streaming variant covered by StreamingSpec). */
  private def eventWindowAgg(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.events(s, dir)
      .groupBy(window($"ts", "1 hour").as("w"), $"event_type")
      .agg(count(lit(1)).as("n"), dsum($"value").as("total_value"))
      .select(
        date_format($"w.start", "yyyy-MM-dd HH:mm:ss").as("window_start"),
        $"event_type", $"n", $"total_value")
      .orderBy($"window_start", $"event_type")
  }

  private val eventWindowAggSql =
    s"""SELECT strftime(time_bucket(INTERVAL '1 hour', ts), '%Y-%m-%d %H:%M:%S') AS window_start,
       |  event_type, COUNT(*) AS n, ${sqlDsum("value")} AS total_value
       |FROM events GROUP BY 1, 2 ORDER BY window_start, event_type""".stripMargin

  // ------------------------------------------------------- q_sliding_window
  /** HOPPING-window aggregation (1-hour windows every 30 minutes) — the
    * overlapping complement to q_event_window_agg's tumbling bucket:
    * each event lands in exactly size/slide = 2 windows. Spark's window()
    * expands rows to their windows ROW-LOCALLY (a generator inside the
    * scan stage), so the only shuffle is the grouped aggregation — at
    * 100 TB the cost is (size/slide)× the tumbling shuffle, linear in the
    * overlap, never a self-join. The oracle derives the same two window
    * starts per event arithmetically (bucket, bucket − 30 min). */
  private def slidingWindow(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.events(s, dir)
      .groupBy(window($"ts", "1 hour", "30 minutes").as("w"), $"event_type")
      .agg(count(lit(1)).as("n"), dsum($"value").as("total_value"))
      .select(
        date_format($"w.start", "yyyy-MM-dd HH:mm:ss").as("window_start"),
        $"event_type", $"n", $"total_value")
      .orderBy($"window_start", $"event_type")
  }

  private val slidingWindowSql =
    s"""WITH e AS (
       |  SELECT event_type, value,
       |    unnest([time_bucket(INTERVAL '30 minutes', ts),
       |            time_bucket(INTERVAL '30 minutes', ts)
       |              - INTERVAL '30 minutes']) AS w
       |  FROM events)
       |SELECT strftime(w, '%Y-%m-%d %H:%M:%S') AS window_start,
       |  event_type, COUNT(*) AS n, ${sqlDsum("value")} AS total_value
       |FROM e GROUP BY 1, 2 ORDER BY window_start, event_type""".stripMargin

  // ---------------------------------------------------------- q_json_extract
  /** Semi-structured extraction from the `props` JSON string column.
    * Spelled with regexp_extract on both sides (same RE dialect subset);
    * Spark's get_json_object variant is asserted equal in RelationalSpec. */
  private def jsonExtract(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.events(s, dir).select(
      $"event_id",
      regexp_extract($"props", "\"k\": ([0-9]+)", 1).as("k_str"),
      regexp_extract($"props", "\"k\": ([0-9]+)", 1).cast(IntegerType).as("k"))
      .orderBy($"event_id")
  }

  private val jsonExtractSql =
    """SELECT event_id, regexp_extract(props, '"k": ([0-9]+)', 1) AS k_str,
      |  TRY_CAST(regexp_extract(props, '"k": ([0-9]+)', 1) AS INT) AS k
      |FROM events ORDER BY event_id""".stripMargin

  // ---------------------------------------------------------------- inventory
  // ------------------------------------------------------------------ q_tpch_q3
  /** TPC-H Q3 (shipping priority) adapted to the fixture schema (no
    * o_shippriority column): top unshipped-revenue orders for one
    * market segment — the canonical selective-join-then-topk analytics
    * shape. Revenue routes through exact DECIMAL cents (discount
    * applied before the cast, scale 4 covers price×discount), and the
    * top-10 is deterministic (revenue desc, orderdate, orderkey).
    *
    * Scale shape: segment filter broadcasts through customer→orders;
    * both date filters push to the scans; TakeOrderedAndProject caps
    * the result — no global sort materializes. */
  private def tpchQ3(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val cust = Tables.customer(s, dir)
      .filter($"c_mktsegment" === "BUILDING").select($"c_custkey")
    val ord = Tables.orders(s, dir)
      .filter($"o_orderdate" < "1998-06-30")
      .select($"o_orderkey", $"o_custkey", $"o_orderdate")
    val li = Tables.lineitem(s, dir)
      .filter($"l_shipdate" > "1998-06-30")
      .select($"l_orderkey", $"l_extendedprice", $"l_discount")
    li.join(ord, $"l_orderkey" === $"o_orderkey")
      .join(broadcast(cust), $"o_custkey" === $"c_custkey")
      .groupBy($"l_orderkey", date_format($"o_orderdate", "yyyy-MM-dd").as("o_orderdate"))
      .agg(dsum($"l_extendedprice" * (lit(1) - $"l_discount"), 4)
        .as("revenue"))
      .orderBy($"revenue".desc, $"o_orderdate", $"l_orderkey")
      .limit(10)
  }

  private val tpchQ3Sql =
    s"""SELECT l_orderkey, strftime(o_orderdate, '%Y-%m-%d') AS o_orderdate,
      |  ${sqlDsum("l_extendedprice * (1 - l_discount)", 4)} AS revenue
      |FROM customer
      |JOIN orders ON c_custkey = o_custkey
      |JOIN lineitem ON l_orderkey = o_orderkey
      |WHERE c_mktsegment = 'BUILDING'
      |  AND o_orderdate < DATE '1998-06-30'
      |  AND l_shipdate > DATE '1998-06-30'
      |GROUP BY l_orderkey, strftime(o_orderdate, '%Y-%m-%d')
      |ORDER BY revenue DESC, o_orderdate, l_orderkey
      |LIMIT 10""".stripMargin

  // ------------------------------------------------------------------ q_tpch_q5
  /** TPC-H Q5 (local supplier volume): revenue from intra-nation trade
    * within one region and one year — the canonical snowflake join
    * (fact ⋈ 5 dimensions) with broadcast dims and exact DECIMAL
    * revenue. The c_nationkey = s_nationkey "local" constraint is the
    * interesting join predicate: it correlates two dimension paths. */
  private def tpchQ5(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val asiaNations = Tables.nation(s, dir)
      .join(broadcast(Tables.region(s, dir).filter($"r_name" === "ASIA")),
        $"n_regionkey" === $"r_regionkey")
      .select($"n_nationkey", $"n_name")
    val ord = Tables.orders(s, dir)
      .filter($"o_orderdate" >= "1997-01-01" && $"o_orderdate" < "1998-01-01")
      .select($"o_orderkey", $"o_custkey")
    Tables.lineitem(s, dir)
      .select($"l_orderkey", $"l_suppkey", $"l_extendedprice", $"l_discount")
      .join(ord, $"l_orderkey" === $"o_orderkey")
      .join(broadcast(Tables.supplier(s, dir)
        .select($"s_suppkey", $"s_nationkey")), $"l_suppkey" === $"s_suppkey")
      .join(broadcast(Tables.customer(s, dir)
        .select($"c_custkey", $"c_nationkey")), $"o_custkey" === $"c_custkey")
      .filter($"c_nationkey" === $"s_nationkey")
      .join(broadcast(asiaNations), $"s_nationkey" === $"n_nationkey")
      .groupBy($"n_name")
      .agg(dsum($"l_extendedprice" * (lit(1) - $"l_discount"), 4)
        .as("revenue"))
      .orderBy($"revenue".desc, $"n_name")
  }

  private val tpchQ5Sql =
    s"""SELECT n_name,
      |  ${sqlDsum("l_extendedprice * (1 - l_discount)", 4)} AS revenue
      |FROM lineitem
      |JOIN orders ON l_orderkey = o_orderkey
      |JOIN supplier ON l_suppkey = s_suppkey
      |JOIN customer ON o_custkey = c_custkey
      |JOIN nation ON s_nationkey = n_nationkey
      |JOIN region ON n_regionkey = r_regionkey
      |WHERE r_name = 'ASIA'
      |  AND c_nationkey = s_nationkey
      |  AND o_orderdate >= DATE '1997-01-01'
      |  AND o_orderdate < DATE '1998-01-01'
      |GROUP BY n_name
      |ORDER BY revenue DESC, n_name""".stripMargin

  val all: Seq[NamedQuery] = Seq(
    NamedQuery("q_tpch_q3", tpchQ3, Some(tpchQ3Sql), bench = true),
    NamedQuery("q_tpch_q5", tpchQ5, Some(tpchQ5Sql), bench = true),
    NamedQuery("q_agg_basic", aggBasic, Some(aggBasicSql), bench = true),
    NamedQuery("q_industry_avg", industryAvg, Some(industryAvgSql), bench = true),
    NamedQuery("q_point_lookup", pointLookup, Some(pointLookupSql), bench = true),
    NamedQuery("q_latest_per_key_join", latestPerKeyJoin, Some(latestPerKeyJoinSql), bench = true),
    NamedQuery("q_latest_per_key_window", latestPerKeyWindow, Some(latestPerKeyWindowSql), bench = true),
    NamedQuery("q_derived_ratios", derivedRatios, Some(derivedRatiosSql), bench = true),
    NamedQuery("q_monthly_avg_trend", monthlyAvgTrend, Some(monthlyAvgTrendSql), bench = true),
    NamedQuery("q_date_format", dateFormatQ, Some(dateFormatSql), bench = true),
    NamedQuery("q_topk", topk, Some(topkSql), bench = true),
    NamedQuery("q_left_join_enrich", leftJoinEnrich, Some(leftJoinEnrichSql), bench = true),
    NamedQuery("q_cast_conform", castConform, Some(castConformSql), bench = true),
    NamedQuery("q_union_all", unionAll, Some(unionAllSql), bench = true),
    NamedQuery("q_union_entity_vs_avg", entityVsAvgFrame, Some(entityVsAvgSql), bench = true),
    NamedQuery("q_unpivot_compare", unpivotCompare, Some(unpivotCompareSql), bench = true),
    NamedQuery("q_pivot_attrs", pivotAttrs, Some(pivotAttrsSql), bench = true),
    NamedQuery("q_pivot_status", pivotStatus, Some(pivotStatusSql), bench = true),
    NamedQuery("q_outer_join_align", outerJoinAlign, Some(outerJoinAlignSql), bench = true),
    NamedQuery("q_fill_missing", fillMissing, Some(fillMissingSql), bench = true),
    NamedQuery("q_schema_normalize", schemaNormalize, Some(schemaNormalizeSql), bench = true),
    NamedQuery("q_event_window_agg", eventWindowAgg, Some(eventWindowAggSql), bench = true),
    NamedQuery("q_sliding_window", slidingWindow, Some(slidingWindowSql), bench = true),
    NamedQuery("q_json_extract", jsonExtract, Some(jsonExtractSql), bench = true),
    NamedQuery("q_approx_distinct", approxDistinct, Some(approxDistinctSql), bench = true),
    NamedQuery("q_date_window", dateWindow, Some(dateWindowSql), bench = true))
}
