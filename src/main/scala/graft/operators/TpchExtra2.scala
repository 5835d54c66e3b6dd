package graft.operators

import graft.{NamedQuery, Tables}
import graft.functions.Exact._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** TPC-H wave 2 — completes the suite's applicable surface (with Q3/Q5
  * in Relational and Q4/Q6/Q10/Q14/Q15/Q17/Q18/Q22 in TpchExtra):
  * Q7/Q8/Q12/Q13/Q16/Q19/Q21 plus a Q2-spirit min-cost-supplier.
  * Q9/Q11/Q20 (partsupp-centric — the fixture has no partsupp table)
  * are implemented in TpchExtra3 via documented supplier×part
  * adaptations, completing the Q1–Q22 suite. Schema
  * adaptations per query are documented inline; the arithmetic
  * discipline is the TpchExtra one: DECIMAL-exact aggregation,
  * cross-multiplied inequalities, floats only in final output
  * divisions on bit-identical operands. */
object TpchExtra2 {

  // ------------------------------------------------------------------ q_tpch_q7
  /** TPC-H Q7 (volume shipping): cross-NATION trade flows inside one
    * region by ship year. The spec fixes two nations; on the fixture
    * (25 synthetic nations, sparse pairs at small SF) that's vacuous,
    * so the adaptation keeps the exact Q7 silhouette — supplier-nation
    * ≠ customer-nation, a two-year ship window, (supp_nation,
    * cust_nation, year) cells — over all ASIA pairs. Both nation dims
    * broadcast; the fact join shuffles once on the order key. */
  private def tpchQ7(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val asiaNations = Tables.nation(s, dir)
      .join(broadcast(Tables.region(s, dir).filter($"r_name" === "ASIA")),
        $"n_regionkey" === $"r_regionkey")
      .select($"n_nationkey", $"n_name")
    val supp = Tables.supplier(s, dir).select($"s_suppkey", $"s_nationkey")
      .join(broadcast(asiaNations), $"s_nationkey" === $"n_nationkey")
      .select($"s_suppkey", $"n_name".as("supp_nation"))
    val cust = Tables.customer(s, dir).select($"c_custkey", $"c_nationkey")
      .join(broadcast(asiaNations), $"c_nationkey" === $"n_nationkey")
      .select($"c_custkey", $"n_name".as("cust_nation"))
    val ord = Tables.orders(s, dir).select($"o_orderkey", $"o_custkey")
    Tables.lineitem(s, dir)
      .filter($"l_shipdate" >= "1996-01-01" && $"l_shipdate" < "1998-01-01")
      .select($"l_orderkey", $"l_suppkey", $"l_shipdate",
        $"l_extendedprice", $"l_discount")
      .join(ord, $"l_orderkey" === $"o_orderkey")
      .join(broadcast(supp), $"l_suppkey" === $"s_suppkey")
      .join(broadcast(cust), $"o_custkey" === $"c_custkey")
      .filter($"supp_nation" =!= $"cust_nation")
      .groupBy($"supp_nation", $"cust_nation",
        year($"l_shipdate").as("l_year"))
      .agg(dsum($"l_extendedprice" * (lit(1) - $"l_discount"), 4).as("revenue"))
      .orderBy($"supp_nation", $"cust_nation", $"l_year")
  }

  private val tpchQ7Sql =
    s"""SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
      |  CAST(EXTRACT(year FROM l_shipdate) AS INT) AS l_year,
      |  ${sqlDsum("l_extendedprice * (1 - l_discount)", 4)} AS revenue
      |FROM lineitem
      |JOIN orders ON l_orderkey = o_orderkey
      |JOIN supplier ON l_suppkey = s_suppkey
      |JOIN customer ON o_custkey = c_custkey
      |JOIN nation n1 ON s_nationkey = n1.n_nationkey
      |JOIN nation n2 ON c_nationkey = n2.n_nationkey
      |JOIN region r1 ON n1.n_regionkey = r1.r_regionkey
      |JOIN region r2 ON n2.n_regionkey = r2.r_regionkey
      |WHERE r1.r_name = 'ASIA' AND r2.r_name = 'ASIA'
      |  AND n1.n_name <> n2.n_name
      |  AND l_shipdate >= DATE '1996-01-01'
      |  AND l_shipdate < DATE '1998-01-01'
      |GROUP BY 1, 2, 3
      |ORDER BY 1, 2, 3""".stripMargin

  // ------------------------------------------------------------------ q_tpch_q8
  /** TPC-H Q8 (national market share): of the revenue ASIA customers
    * spent per order year, what share was supplied by NATION_5? Both
    * the nation slice and the total are exact DECIMAL sums per year;
    * the share is one division on those bit-identical doubles. The
    * conditional numerator aggregates in the same pass as the
    * denominator — one fact scan, one shuffle. */
  private def tpchQ8(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val asiaCust = Tables.customer(s, dir).select($"c_custkey", $"c_nationkey")
      .join(broadcast(Tables.nation(s, dir)
        .join(broadcast(Tables.region(s, dir).filter($"r_name" === "ASIA")),
          $"n_regionkey" === $"r_regionkey")
        .select($"n_nationkey")), $"c_nationkey" === $"n_nationkey")
      .select($"c_custkey")
    val suppNation = Tables.supplier(s, dir).select($"s_suppkey", $"s_nationkey")
      .join(broadcast(Tables.nation(s, dir)
        .filter($"n_name" === "NATION_5").select($"n_nationkey")),
        $"s_nationkey" === $"n_nationkey")
      .select($"s_suppkey".as("target_suppkey"))
    val ord = Tables.orders(s, dir)
      .filter($"o_orderdate" >= "1996-01-01" && $"o_orderdate" < "1998-01-01")
      .select($"o_orderkey", $"o_custkey", year($"o_orderdate").as("o_year"))
    Tables.lineitem(s, dir)
      .select($"l_orderkey", $"l_suppkey", $"l_extendedprice", $"l_discount")
      .join(ord, $"l_orderkey" === $"o_orderkey")
      .join(broadcast(asiaCust), $"o_custkey" === $"c_custkey")
      .join(broadcast(suppNation), $"l_suppkey" === $"target_suppkey", "left")
      .groupBy($"o_year")
      .agg(
        dsum(when($"target_suppkey".isNotNull,
          $"l_extendedprice" * (lit(1) - $"l_discount")).otherwise(lit(0.0)), 4)
          .as("nation_revenue"),
        dsum($"l_extendedprice" * (lit(1) - $"l_discount"), 4)
          .as("total_revenue"))
      .select($"o_year", $"nation_revenue", $"total_revenue",
        round($"nation_revenue" / $"total_revenue", 9).as("mkt_share"))
      .orderBy($"o_year")
  }

  private val tpchQ8Sql = {
    val nat = sqlDsum(
      "CASE WHEN s_nationkey = (SELECT n_nationkey FROM nation WHERE n_name = 'NATION_5') " +
        "THEN l_extendedprice * (1 - l_discount) ELSE 0.0 END", 4)
    val tot = sqlDsum("l_extendedprice * (1 - l_discount)", 4)
    s"""SELECT o_year, nation_revenue, total_revenue,
      |  round(nation_revenue / total_revenue, 9) AS mkt_share
      |FROM (
      |  SELECT CAST(EXTRACT(year FROM o_orderdate) AS INT) AS o_year,
      |    $nat AS nation_revenue, $tot AS total_revenue
      |  FROM lineitem
      |  JOIN orders ON l_orderkey = o_orderkey
      |  JOIN customer ON o_custkey = c_custkey
      |  JOIN supplier ON l_suppkey = s_suppkey
      |  JOIN nation nc ON c_nationkey = nc.n_nationkey
      |  JOIN region ON nc.n_regionkey = r_regionkey
      |  WHERE r_name = 'ASIA'
      |    AND o_orderdate >= DATE '1996-01-01'
      |    AND o_orderdate < DATE '1998-01-01'
      |  GROUP BY 1)
      |ORDER BY o_year""".stripMargin
  }

  // ----------------------------------------------------------------- q_tpch_q12
  /** TPC-H Q12 (shipping modes and order priority), adapted: the
    * fixture has no l_shipmode, so the grouping axis becomes the
    * lateness bucket the fixture CAN express — LATE (shipped >90 days
    * after the order date) vs ONTIME — preserving the query's point:
    * the priority mix inside each service class. Priority counting is
    * the spec's CASE split (1-URGENT / 2-HIGH vs rest). One fact-fact
    * join on the order key, two-row output. */
  private def tpchQ12(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val ord = Tables.orders(s, dir)
      .select($"o_orderkey", $"o_orderdate", $"o_orderpriority")
    Tables.lineitem(s, dir)
      .filter($"l_shipdate" >= "1997-01-01" && $"l_shipdate" < "1998-01-01")
      .select($"l_orderkey", $"l_shipdate")
      .join(ord, $"l_orderkey" === $"o_orderkey")
      .withColumn("ship_class",
        when($"l_shipdate" > $"o_orderdate" + expr("INTERVAL 90 DAYS"),
          "LATE").otherwise("ONTIME"))
      .groupBy($"ship_class")
      .agg(
        sum(when($"o_orderpriority".isin("1-URGENT", "2-HIGH"), 1L)
          .otherwise(0L)).as("high_line_count"),
        sum(when(!$"o_orderpriority".isin("1-URGENT", "2-HIGH"), 1L)
          .otherwise(0L)).as("low_line_count"))
      .orderBy($"ship_class")
  }

  private val tpchQ12Sql =
    """SELECT ship_class,
      |  CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
      |    THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
      |  CAST(SUM(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
      |    THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
      |FROM (
      |  SELECT o_orderpriority,
      |    CASE WHEN l_shipdate > o_orderdate + INTERVAL 90 DAY
      |      THEN 'LATE' ELSE 'ONTIME' END AS ship_class
      |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      |  WHERE l_shipdate >= DATE '1997-01-01'
      |    AND l_shipdate < DATE '1998-01-01')
      |GROUP BY ship_class
      |ORDER BY ship_class""".stripMargin

  // ----------------------------------------------------------------- q_tpch_q13
  /** TPC-H Q13 (customer distribution): how many customers placed k
    * orders, INCLUDING k = 0 — the left-outer-join-then-histogram
    * shape (the zero bucket is why it's not a plain GROUP BY). Orders
    * collapses to per-customer counts first, so the outer join carries
    * one row per customer, and the histogram is a count-grid aggregate. */
  private def tpchQ13(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val perCust = Tables.orders(s, dir)
      .groupBy($"o_custkey").agg(count(lit(1)).as("cnt"))
    Tables.customer(s, dir).select($"c_custkey")
      .join(perCust, $"c_custkey" === $"o_custkey", "left")
      .select(coalesce($"cnt", lit(0L)).as("c_count"))
      .groupBy($"c_count")
      .agg(count(lit(1)).as("custdist"))
      .orderBy($"custdist".desc, $"c_count".desc)
  }

  private val tpchQ13Sql =
    """SELECT c_count, COUNT(*) AS custdist
      |FROM (
      |  SELECT COALESCE(cnt, 0) AS c_count
      |  FROM customer
      |  LEFT JOIN (SELECT o_custkey, COUNT(*) AS cnt
      |             FROM orders GROUP BY o_custkey)
      |    ON c_custkey = o_custkey)
      |GROUP BY c_count
      |ORDER BY custdist DESC, c_count DESC""".stripMargin

  // ----------------------------------------------------------------- q_tpch_q16
  /** TPC-H Q16 (parts/supplier relationship), adapted: no partsupp
    * table, so the part–supplier relation derives from lineitem's
    * observed shipments (distinct pairs); no p_container, so the part
    * axes are (brand, type, size). One brand excluded per the spec's
    * NOT-equal, size restricted to the spec-like IN list. The distinct
    * pair projection collapses the fact table before the count. */
  private val Q16Sizes = Seq(1, 4, 9, 14, 19, 23, 36, 45)

  private def tpchQ16(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val parts = Tables.part(s, dir)
      .filter($"p_brand" =!= "Brand#1" && $"p_size".isin(Q16Sizes: _*))
      .select($"p_partkey", $"p_brand", $"p_type", $"p_size")
    Tables.lineitem(s, dir).select($"l_partkey", $"l_suppkey")
      .join(broadcast(parts), $"l_partkey" === $"p_partkey")
      .groupBy($"p_brand", $"p_type", $"p_size")
      .agg(countDistinct($"l_suppkey").as("supplier_cnt"))
      .orderBy($"supplier_cnt".desc, $"p_brand", $"p_type", $"p_size")
  }

  private val tpchQ16Sql =
    s"""SELECT p_brand, p_type, p_size,
      |  COUNT(DISTINCT l_suppkey) AS supplier_cnt
      |FROM lineitem JOIN part ON l_partkey = p_partkey
      |WHERE p_brand <> 'Brand#1'
      |  AND p_size IN (${Q16Sizes.mkString(", ")})
      |GROUP BY p_brand, p_type, p_size
      |ORDER BY supplier_cnt DESC, p_brand, p_type, p_size""".stripMargin

  // ----------------------------------------------------------------- q_tpch_q19
  /** TPC-H Q19 (discounted revenue): the disjunctive brand × size ×
    * quantity band predicate — three OR'd conjunction arms (adapted:
    * no p_container/l_shipmode arms). The classic "can the optimizer
    * keep an OR-of-ANDs from becoming a cross filter" probe: part
    * broadcasts, the whole predicate evaluates row-local post-join,
    * revenue is one exact sum. */
  private def tpchQ19(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val li = Tables.lineitem(s, dir)
      .select($"l_partkey", $"l_quantity", $"l_extendedprice", $"l_discount")
    val pt = Tables.part(s, dir).select($"p_partkey", $"p_brand", $"p_size")
    li.join(broadcast(pt), $"l_partkey" === $"p_partkey")
      .filter(
        ($"p_brand" === "Brand#12" && $"p_size".between(1, 15) &&
          $"l_quantity".between(1, 11)) ||
        ($"p_brand" === "Brand#23" && $"p_size".between(1, 25) &&
          $"l_quantity".between(10, 20)) ||
        ($"p_brand" === "Brand#34" && $"p_size".between(1, 35) &&
          $"l_quantity".between(20, 30)))
      .agg(dsum($"l_extendedprice" * (lit(1) - $"l_discount"), 4).as("revenue"),
        count(lit(1)).as("n_lines"))
  }

  private val tpchQ19Sql =
    s"""SELECT ${sqlDsum("l_extendedprice * (1 - l_discount)", 4)} AS revenue,
      |  COUNT(*) AS n_lines
      |FROM lineitem JOIN part ON l_partkey = p_partkey
      |WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 15
      |       AND l_quantity BETWEEN 1 AND 11)
      |   OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 25
      |       AND l_quantity BETWEEN 10 AND 20)
      |   OR (p_brand = 'Brand#34' AND p_size BETWEEN 1 AND 35
      |       AND l_quantity BETWEEN 20 AND 30)""".stripMargin

  // ----------------------------------------------------------------- q_tpch_q21
  /** TPC-H Q21 (suppliers who kept orders waiting), adapted: no
    * l_receiptdate/l_commitdate, so "the supplier everyone waited for"
    * becomes the supplier(s) whose line carries the LATEST ship date in
    * a finalized multi-supplier order — same silhouette (self-join of
    * lineitem through an order-level profile, EXISTS another supplier,
    * the laggard attribution) on the columns that exist. Top 20 by
    * count. The order profile (max shipdate, distinct-supplier count)
    * is one aggregation; laggard lines join back on the order key. */
  private def tpchQ21(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val fOrders = Tables.orders(s, dir)
      .filter($"o_orderstatus" === "F").select($"o_orderkey")
    val li = Tables.lineitem(s, dir)
      .select($"l_orderkey", $"l_suppkey", $"l_shipdate")
      .join(fOrders, $"l_orderkey" === $"o_orderkey")
    val profile = li.groupBy($"l_orderkey".as("ok"))
      .agg(max($"l_shipdate").as("max_ship"),
        countDistinct($"l_suppkey").as("n_supp"))
      .filter($"n_supp" >= 2)
    li.join(profile, $"l_orderkey" === $"ok" && $"l_shipdate" === $"max_ship")
      .groupBy($"l_suppkey")
      .agg(countDistinct($"l_orderkey").as("numwait"))
      .join(broadcast(Tables.supplier(s, dir).select($"s_suppkey", $"s_name")),
        $"l_suppkey" === $"s_suppkey")
      .select($"s_name", $"s_suppkey", $"numwait")
      .orderBy($"numwait".desc, $"s_suppkey")
      .limit(20)
  }

  private val tpchQ21Sql =
    """WITH l AS (
      |  SELECT l_orderkey, l_suppkey, l_shipdate
      |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      |  WHERE o_orderstatus = 'F'),
      |profile AS (
      |  SELECT l_orderkey AS ok, MAX(l_shipdate) AS max_ship,
      |    COUNT(DISTINCT l_suppkey) AS n_supp
      |  FROM l GROUP BY 1 HAVING COUNT(DISTINCT l_suppkey) >= 2)
      |SELECT s_name, s_suppkey, COUNT(DISTINCT l_orderkey) AS numwait
      |FROM l
      |JOIN profile ON l_orderkey = ok AND l_shipdate = max_ship
      |JOIN supplier ON l_suppkey = s_suppkey
      |GROUP BY s_name, s_suppkey
      |ORDER BY numwait DESC, s_suppkey
      |LIMIT 20""".stripMargin

  // ---------------------------------------------------------- q_min_cost_supplier
  /** TPC-H Q2 in spirit (minimum-cost supplier): with no partsupp
    * table, the per-(part, supplier) unit cost derives from shipments —
    * total extended price over total quantity — and the winner per part
    * is the cheapest supplier among parts served by ≥2 suppliers. The
    * unit price is an exact integer in micro-dollars (cents·10⁴ DIV
    * quantity-hundredths — cross-multiplication-free ranking, no float
    * argmin), ties break on suppkey. Aggregation collapses lineitem to
    * the (part, supplier) grid in one pass; the per-part argmin is a
    * struct-min — no window, no second shuffle of the fact table. */
  private def minCostSupplier(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val grid = Tables.lineitem(s, dir)
      .groupBy($"l_partkey", $"l_suppkey")
      .agg(
        (sum($"l_extendedprice".cast(DecimalType(28, 2))) * 100)
          .cast("long").as("cents"),
        (sum($"l_quantity".cast(DecimalType(28, 2))) * 100)
          .cast("long").as("qty_h"))
      .select($"l_partkey", $"l_suppkey",
        expr("(cents * 10000) DIV qty_h").as("unit_micros"))
    grid.groupBy($"l_partkey")
      .agg(count(lit(1)).as("n_suppliers"),
        min(struct($"unit_micros", $"l_suppkey")).as("best"))
      .filter($"n_suppliers" >= 2)
      .select($"l_partkey".as("p_partkey"),
        $"best.l_suppkey".as("s_suppkey"),
        $"best.unit_micros".as("unit_micros"), $"n_suppliers")
      .orderBy($"p_partkey")
  }

  private val minCostSupplierSql =
    """WITH grid AS (
      |  SELECT l_partkey, l_suppkey,
      |    (CAST(SUM(CAST(l_extendedprice AS DECIMAL(28,2))) * 100 AS BIGINT)
      |      * 10000)
      |      // CAST(SUM(CAST(l_quantity AS DECIMAL(28,2))) * 100 AS BIGINT)
      |      AS unit_micros
      |  FROM lineitem GROUP BY 1, 2),
      |g2 AS (
      |  SELECT l_partkey, l_suppkey, unit_micros,
      |    COUNT(*) OVER (PARTITION BY l_partkey) AS n_suppliers,
      |    ROW_NUMBER() OVER (PARTITION BY l_partkey
      |      ORDER BY unit_micros, l_suppkey) AS rn
      |  FROM grid)
      |SELECT l_partkey AS p_partkey, l_suppkey AS s_suppkey,
      |  unit_micros, n_suppliers
      |FROM g2 WHERE rn = 1 AND n_suppliers >= 2
      |ORDER BY p_partkey""".stripMargin

  val all: Seq[NamedQuery] = Seq(
    NamedQuery("q_tpch_q7", tpchQ7, Some(tpchQ7Sql), bench = true),
    NamedQuery("q_tpch_q8", tpchQ8, Some(tpchQ8Sql), bench = true),
    NamedQuery("q_tpch_q12", tpchQ12, Some(tpchQ12Sql), bench = true),
    NamedQuery("q_tpch_q13", tpchQ13, Some(tpchQ13Sql), bench = true),
    NamedQuery("q_tpch_q16", tpchQ16, Some(tpchQ16Sql), bench = true),
    NamedQuery("q_tpch_q19", tpchQ19, Some(tpchQ19Sql), bench = true),
    NamedQuery("q_tpch_q21", tpchQ21, Some(tpchQ21Sql), bench = true),
    NamedQuery("q_min_cost_supplier", minCostSupplier,
      Some(minCostSupplierSql), bench = true))
}
