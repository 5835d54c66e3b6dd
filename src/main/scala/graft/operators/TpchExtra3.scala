package graft.operators

import graft.{NamedQuery, Tables}
import graft.functions.Exact._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** TPC-H wave 3 — the three partsupp-centric queries (Q9, Q11, Q20),
  * re-expressed on the fixture's columns so the SUITE IS COMPLETE:
  * every TPC-H query 1–22 now has a running, oracle-checked
  * counterpart (Q1 as q_agg_basic's silhouette, the rest under
  * q_tpch_*). The partsupp adaptations are explicit and per-query:
  * supply cost proxies to p_retailprice (Q9), "stock value" proxies to
  * shipped-volume value (Q11), and "excess stock" proxies to shipment
  * dominance (Q20) — same join silhouettes, same aggregate discipline
  * (exact DECIMAL money, cross-multiplied share thresholds, no float
  * comparisons deciding membership). */
object TpchExtra3 {

  // ------------------------------------------------------------------ q_tpch_q9
  /** TPC-H Q9 (product-type profit), adapted: no partsupp, so line cost
    * proxies to quantity × p_retailprice (the one per-part price the
    * fixture carries); profit = revenue − cost, exact at scale 4, by
    * supplier nation × order year over PROMO-type parts (the spec's
    * p_name LIKE filter re-expressed on p_type). Part + supplier +
    * nation dims broadcast; lineitem ⋈ orders is the one fact-fact
    * shuffle. */
  private def tpchQ9(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val promoParts = Tables.part(s, dir)
      .filter($"p_type" === "PROMO")
      .select($"p_partkey", $"p_retailprice")
    val suppNation = Tables.supplier(s, dir).select($"s_suppkey", $"s_nationkey")
      .join(broadcast(Tables.nation(s, dir)
        .select($"n_nationkey", $"n_name")), $"s_nationkey" === $"n_nationkey")
      .select($"s_suppkey", $"n_name".as("nation"))
    Tables.lineitem(s, dir)
      .select($"l_orderkey", $"l_partkey", $"l_suppkey",
        $"l_quantity", $"l_extendedprice", $"l_discount")
      .join(broadcast(promoParts), $"l_partkey" === $"p_partkey")
      .join(broadcast(suppNation), $"l_suppkey" === $"s_suppkey")
      .join(Tables.orders(s, dir)
        .select($"o_orderkey", year($"o_orderdate").as("o_year")),
        $"l_orderkey" === $"o_orderkey")
      .groupBy($"nation", $"o_year")
      .agg(dsum($"l_extendedprice" * (lit(1) - $"l_discount") -
        $"l_quantity" * $"p_retailprice", 4).as("sum_profit"))
      .orderBy($"nation", $"o_year".desc)
  }

  private val tpchQ9Sql =
    s"""SELECT n_name AS nation,
      |  CAST(EXTRACT(year FROM o_orderdate) AS INT) AS o_year,
      |  ${sqlDsum("l_extendedprice * (1 - l_discount) - l_quantity * p_retailprice", 4)}
      |    AS sum_profit
      |FROM lineitem
      |JOIN part ON l_partkey = p_partkey
      |JOIN supplier ON l_suppkey = s_suppkey
      |JOIN nation ON s_nationkey = n_nationkey
      |JOIN orders ON l_orderkey = o_orderkey
      |WHERE p_type = 'PROMO'
      |GROUP BY 1, 2
      |ORDER BY nation, o_year DESC""".stripMargin

  // ----------------------------------------------------------------- q_tpch_q11
  // audited-bnlj(q_tpch_q11): build side = 1-row global-aggregate broadcast — audited in PlanAuditSpec/BnljAudit
  /** TPC-H Q11 (important stock identification), adapted: "stock value"
    * proxies to SHIPPED-VOLUME value (quantity × p_retailprice, exact
    * DECIMAL) for parts supplied from one nation; a part is "important"
    * when its value exceeds 1/500 of the nation total. The share
    * threshold is cross-multiplied (value × 500 > total) so an exact
    * decimal comparison decides membership — the spec's scalar-subquery
    * silhouette with the fraction made float-free. The nation total is
    * a single-row broadcast. */
  val Q11Nation = "NATION_3"
  val Q11Fraction = 500L

  private def tpchQ11(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val natSupp = Tables.supplier(s, dir).select($"s_suppkey", $"s_nationkey")
      .join(broadcast(Tables.nation(s, dir)
        .filter($"n_name" === Q11Nation).select($"n_nationkey")),
        $"s_nationkey" === $"n_nationkey")
      .select($"s_suppkey")
    val value = Tables.lineitem(s, dir)
      .select($"l_partkey", $"l_suppkey", $"l_quantity")
      .join(broadcast(natSupp), $"l_suppkey" === $"s_suppkey")
      .join(broadcast(Tables.part(s, dir)
        .select($"p_partkey", $"p_retailprice")),
        $"l_partkey" === $"p_partkey")
      .groupBy($"l_partkey")
      .agg(sum(($"l_quantity".cast(DecimalType(28, 2)) *
        $"p_retailprice".cast(DecimalType(28, 2))).cast(DecimalType(38, 4)))
        .as("val_dec"))
    val total = value.agg(sum($"val_dec").cast(DecimalType(38, 4)).as("tot"))
    value.crossJoin(broadcast(total))
      .filter($"val_dec" * Q11Fraction > $"tot")
      .select($"l_partkey".as("p_partkey"),
        $"val_dec".cast(DoubleType).as("part_value"))
      .orderBy($"part_value".desc, $"p_partkey")
  }

  private val tpchQ11Sql =
    s"""WITH v AS (
      |  SELECT l_partkey,
      |    CAST(SUM(CAST(CAST(l_quantity AS DECIMAL(28,2))
      |      * CAST(p_retailprice AS DECIMAL(28,2)) AS DECIMAL(38,4)))
      |      AS DECIMAL(38,4)) AS val_dec
      |  FROM lineitem
      |  JOIN supplier ON l_suppkey = s_suppkey
      |  JOIN nation ON s_nationkey = n_nationkey
      |  JOIN part ON l_partkey = p_partkey
      |  WHERE n_name = '$Q11Nation'
      |  GROUP BY l_partkey),
      |t AS (SELECT CAST(SUM(val_dec) AS DECIMAL(38,4)) AS tot FROM v)
      |SELECT l_partkey AS p_partkey, CAST(val_dec AS DOUBLE) AS part_value
      |FROM v CROSS JOIN t
      |WHERE val_dec * $Q11Fraction > tot
      |ORDER BY part_value DESC, p_partkey""".stripMargin

  // ----------------------------------------------------------------- q_tpch_q20
  /** TPC-H Q20 (potential part promotion), adapted: "supplier holding
    * excess stock of a part" proxies to "supplier who shipped MORE THAN
    * HALF of a PROMO part's total 1997 volume" among parts served by
    * ≥2 suppliers that year — the same who-dominates-supply question
    * asked of the columns that exist. Dominance is an exact decimal
    * cross-multiplication (2 × supplier volume > part total). Output:
    * each dominant supplier with how many parts they dominate. */
  private def tpchQ20(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val pv = Tables.lineitem(s, dir)
      .filter($"l_shipdate" >= "1997-01-01" && $"l_shipdate" < "1998-01-01")
      .select($"l_partkey", $"l_suppkey", $"l_quantity")
      .join(broadcast(Tables.part(s, dir)
        .filter($"p_type" === "PROMO").select($"p_partkey")),
        $"l_partkey" === $"p_partkey")
      .groupBy($"l_partkey", $"l_suppkey")
      .agg(sum($"l_quantity".cast(DecimalType(28, 2))).as("sq"))
    val tot = pv.groupBy($"l_partkey")
      .agg(sum($"sq").as("t"), count(lit(1)).as("n_supp"))
      .filter($"n_supp" >= 2)
    pv.join(tot, Seq("l_partkey"))
      .filter($"sq" * 2 > $"t")
      .groupBy($"l_suppkey")
      .agg(count(lit(1)).as("n_dominated"))
      .join(broadcast(Tables.supplier(s, dir).select($"s_suppkey", $"s_name")),
        $"l_suppkey" === $"s_suppkey")
      .select($"s_suppkey", $"s_name", $"n_dominated")
      .orderBy($"n_dominated".desc, $"s_suppkey")
  }

  private val tpchQ20Sql =
    """WITH pv AS (
      |  SELECT l_partkey, l_suppkey,
      |    SUM(CAST(l_quantity AS DECIMAL(28,2))) AS sq
      |  FROM lineitem JOIN part ON l_partkey = p_partkey
      |  WHERE p_type = 'PROMO'
      |    AND l_shipdate >= DATE '1997-01-01'
      |    AND l_shipdate < DATE '1998-01-01'
      |  GROUP BY 1, 2),
      |tot AS (
      |  SELECT l_partkey, SUM(sq) AS t, COUNT(*) AS n_supp
      |  FROM pv GROUP BY 1 HAVING COUNT(*) >= 2)
      |SELECT s_suppkey, s_name, COUNT(*) AS n_dominated
      |FROM pv JOIN tot USING (l_partkey)
      |JOIN supplier ON l_suppkey = s_suppkey
      |WHERE sq * 2 > t
      |GROUP BY 1, 2
      |ORDER BY n_dominated DESC, s_suppkey""".stripMargin

  val all: Seq[NamedQuery] = Seq(
    NamedQuery("q_tpch_q9", tpchQ9, Some(tpchQ9Sql), bench = true),
    NamedQuery("q_tpch_q11", tpchQ11, Some(tpchQ11Sql), bench = true),
    NamedQuery("q_tpch_q20", tpchQ20, Some(tpchQ20Sql), bench = true))
}
