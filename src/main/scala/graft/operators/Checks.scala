package graft.operators

import graft.{NamedQuery, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Data-quality checks — the validation layer a pipeline runs before
  * publishing a table (the reference trusts its sources blindly; a
  * production ETL can't). Each check distills to one violation COUNT so
  * the full suite is a handful of independent aggregation jobs:
  *  - unique: one groupBy on the key, sum of group sizes where n > 1;
  *  - nonNull: a single filtered count, no shuffle;
  *  - referential: left-outer join child->parent on an aliased parent
  *    key (broadcast — parent key sets are small), count of unmatched;
  *    NULL child keys match nothing, so they count as violations too;
  *  - accepted: filtered count against an allow-list literal.
  * The *DF variants are LAZY single-row frames — q_quality_checks unions
  * them so nothing executes at plan-construction time and the plan-audit
  * tooling sees the real work; the Long variants are eager conveniences
  * for assertions. Internal columns are __-prefixed aliases so checks
  * work for any user column names (including keys named "count" or
  * identical child/parent key names). */
object Checks {

  /** One-row frame: total rows participating in a duplicated `cols` key. */
  def uniqueViolationsDF(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty, "unique check needs at least one key column")
    df.groupBy(cols.map(col): _*)
      .agg(count(lit(1)).as("__n"))
      .filter(col("__n") > 1)
      .agg(coalesce(sum(col("__n")), lit(0L)).as("violations"))
  }

  def uniqueViolations(df: DataFrame, cols: Seq[String]): Long =
    uniqueViolationsDF(df, cols).collect()(0).getLong(0)

  /** One-row frame: rows with a NULL in any of `cols`. */
  def nonNullViolationsDF(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty, "non-null check needs at least one column")
    df.filter(cols.map(c => col(c).isNull).reduce(_ || _))
      .agg(count(lit(1)).as("violations"))
  }

  def nonNullViolations(df: DataFrame, cols: Seq[String]): Long =
    nonNullViolationsDF(df, cols).collect()(0).getLong(0)

  /** One-row frame: child rows whose key has no parent match (orphans);
    * NULL child keys join to nothing and are counted. */
  def referentialViolationsDF(child: DataFrame, childKey: String,
                              parent: DataFrame, parentKey: String): DataFrame = {
    val parents = broadcast(
      parent.select(col(parentKey).as("__parent_key")).distinct())
    child.select(col(childKey).as("__child_key"))
      .join(parents, col("__child_key") === col("__parent_key"), "left_outer")
      .filter(col("__parent_key").isNull)
      .agg(count(lit(1)).as("violations"))
  }

  def referentialViolations(child: DataFrame, childKey: String,
                            parent: DataFrame, parentKey: String): Long =
    referentialViolationsDF(child, childKey, parent, parentKey)
      .collect()(0).getLong(0)

  /** One-row frame: rows whose `c` is NULL or outside the allow-list. */
  def acceptedViolationsDF(df: DataFrame, c: String, allowed: Seq[String]): DataFrame =
    df.filter(col(c).isNull || !col(c).isin(allowed: _*))
      .agg(count(lit(1)).as("violations"))

  def acceptedViolations(df: DataFrame, c: String, allowed: Seq[String]): Long =
    acceptedViolationsDF(df, c, allowed).collect()(0).getLong(0)

  // ------------------------------------------------------------ q_quality_checks
  /** The suite over the shipped tables: primary-key uniqueness,
    * key non-nullness, orders->customer referential integrity, and
    * status domain membership — a LAZY union of the single-row check
    * frames. All four pass on the clean test data; ChecksSpec injects
    * violations to prove each detector fires. */
  private def qualityChecks(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val orders = Tables.orders(s, dir)
    val customer = Tables.customer(s, dir)
    def named(name: String, df: DataFrame): DataFrame =
      df.select(lit(name).as("check_name"), col("violations"))
    named("orders_pk_unique",
        uniqueViolationsDF(orders, Seq("o_orderkey")))
      .unionByName(named("orders_keys_non_null",
        nonNullViolationsDF(orders, Seq("o_orderkey", "o_custkey"))))
      .unionByName(named("orders_fk_customer",
        referentialViolationsDF(orders, "o_custkey", customer, "c_custkey")))
      .unionByName(named("orders_status_domain",
        acceptedViolationsDF(orders, "o_orderstatus", Seq("F", "O", "P"))))
      .orderBy($"check_name")
  }

  private val qualityChecksSql =
    """SELECT 'orders_fk_customer' AS check_name,
      |  (SELECT COUNT(*) FROM orders o WHERE o.o_custkey IS NULL
      |     OR NOT EXISTS (SELECT 1 FROM customer c WHERE c.c_custkey = o.o_custkey))
      |  AS violations
      |UNION ALL
      |SELECT 'orders_keys_non_null',
      |  (SELECT COUNT(*) FROM orders WHERE o_orderkey IS NULL OR o_custkey IS NULL)
      |UNION ALL
      |SELECT 'orders_pk_unique',
      |  (SELECT CAST(COALESCE(SUM(n), 0) AS BIGINT) FROM
      |    (SELECT COUNT(*) AS n FROM orders GROUP BY o_orderkey HAVING COUNT(*) > 1))
      |UNION ALL
      |SELECT 'orders_status_domain',
      |  (SELECT COUNT(*) FROM orders
      |   WHERE o_orderstatus IS NULL OR o_orderstatus NOT IN ('F', 'O', 'P'))
      |ORDER BY check_name""".stripMargin

  // ----------------------------------------------------------------- q_benford
  // audited-global-window(q_benford): frame = 9-row leading-digit grid — bound audited in PlanAuditSpec/UnpartitionedWindowAudit
  /** Benford first-digit audit over order totals — the classic
    * fabricated-amounts alarm for financial data: observed first-digit
    * rates vs Benford's log₁₀(1 + 1/d) expectation, with the per-digit
    * gap (the χ²/TVD ingredients, same integer-ppm discipline as
    * q_drift_tvd). INTEGER end to end: the first digit comes from the
    * BIGINT string form of floor(v) — never float log10, whose behavior
    * at exact powers of ten differs across engines — and the expected
    * rates are ppm constants. One row-local scan pass, one 9-row
    * aggregate; the window totals run over the 9 digit rows. */
  private val BenfordPpm = Seq(301030L, 176091L, 124939L, 96910L,
    79181L, 66947L, 57992L, 51153L, 45757L)

  private def benford(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.orders(s, dir)
      .filter($"o_totalprice" >= 1)
      .select(substring(floor($"o_totalprice").cast("long").cast("string"),
        1, 1).cast("int").as("digit"))
      .groupBy($"digit").agg(count(lit(1)).as("n"))
      .withColumn("rate_ppm", expr("n * 1000000 DIV sum(n) OVER ()"))
      .withColumn("benford_ppm",
        element_at(array(BenfordPpm.map(lit): _*), $"digit"))
      .withColumn("gap_ppm", abs($"rate_ppm" - $"benford_ppm"))
      .orderBy($"digit")
  }

  private val benfordSql =
    s"""WITH d AS (
       |  SELECT CAST(substring(CAST(CAST(floor(o_totalprice) AS BIGINT)
       |    AS VARCHAR), 1, 1) AS INT) AS digit
       |  FROM orders WHERE o_totalprice >= 1),
       |c AS (SELECT digit, COUNT(*) AS n FROM d GROUP BY 1)
       |SELECT digit, n,
       |  CAST(n * 1000000 // SUM(n) OVER () AS BIGINT) AS rate_ppm,
       |  CAST([${BenfordPpm.mkString(",")}][digit] AS BIGINT) AS benford_ppm,
       |  CAST(abs(n * 1000000 // SUM(n) OVER ()
       |         - [${BenfordPpm.mkString(",")}][digit]) AS BIGINT) AS gap_ppm
       |FROM c ORDER BY digit""".stripMargin

  // ------------------------------------------------------------- q_fd_check
  /** Functional-dependency audit — does column A determine column B?
    * The schema-inference / constraint-mining primitive (profiling
    * suites run batteries of these): for each candidate FD, report how
    * many determinant values exist, how many VIOLATE (map to >1 distinct
    * dependent value), and the worst fan-out. Three candidates keep
    * both detector directions honest: the single-table PK FD
    * o_orderkey → o_custkey (trivially holds), the CROSS-TABLE FD
    * l_orderkey → o_custkey through the lineitem⨝orders join (holds:
    * every line of an order belongs to that order's customer — one
    * equi-join shuffle on the order key feeds the same agg), and
    * o_custkey → o_orderpriority (genuinely fails: customers order at
    * many priorities).
    *
    * Scale shape: per FD one hash-agg keyed on the determinant (map-side
    * partial count-distinct via the two-level groupBy), reduced to a
    * single summary row — O(distinct determinants) shuffle, constant
    * output. */
  def fdViolations(df: DataFrame, lhs: String, rhs: String): DataFrame = {
    import df.sparkSession.implicits._
    df.groupBy(col(lhs))
      .agg(count_distinct(col(rhs)).as("n_rhs"))
      .agg(
        count(lit(1)).as("n_lhs_values"),
        sum(when($"n_rhs" > 1, 1L).otherwise(0L)).as("n_violating"),
        max($"n_rhs").as("max_fanout"))
  }

  private def fdCheck(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val orders = Tables.orders(s, dir)
    val held = fdViolations(orders, "o_orderkey", "o_custkey")
      .select(lit("o_orderkey->o_custkey").as("fd"), $"n_lhs_values",
        $"n_violating", $"max_fanout")
    val crossTable = fdViolations(
      Tables.lineitem(s, dir).select($"l_orderkey")
        .join(orders.select($"o_orderkey", $"o_custkey"),
          $"l_orderkey" === $"o_orderkey"),
      "l_orderkey", "o_custkey")
      .select(lit("l_orderkey->o_custkey").as("fd"), $"n_lhs_values",
        $"n_violating", $"max_fanout")
    val violated = fdViolations(orders, "o_custkey", "o_orderpriority")
      .select(lit("o_custkey->o_orderpriority").as("fd"), $"n_lhs_values",
        $"n_violating", $"max_fanout")
    held.unionByName(crossTable).unionByName(violated)
      .select($"fd", $"n_lhs_values", $"n_violating", $"max_fanout",
        ($"n_violating" === 0).as("holds"))
      .orderBy($"fd")
  }

  private val fdCheckSql =
    """WITH f1 AS (
      |  SELECT 'o_orderkey->o_custkey' AS fd, COUNT(*) AS n_lhs_values,
      |    SUM(CASE WHEN n_rhs > 1 THEN 1 ELSE 0 END) AS n_violating,
      |    MAX(n_rhs) AS max_fanout
      |  FROM (SELECT o_orderkey, COUNT(DISTINCT o_custkey) AS n_rhs
      |        FROM orders GROUP BY 1)),
      |f2 AS (
      |  SELECT 'o_custkey->o_orderpriority' AS fd, COUNT(*) AS n_lhs_values,
      |    SUM(CASE WHEN n_rhs > 1 THEN 1 ELSE 0 END) AS n_violating,
      |    MAX(n_rhs) AS max_fanout
      |  FROM (SELECT o_custkey, COUNT(DISTINCT o_orderpriority) AS n_rhs
      |        FROM orders GROUP BY 1)),
      |f3 AS (
      |  SELECT 'l_orderkey->o_custkey' AS fd, COUNT(*) AS n_lhs_values,
      |    SUM(CASE WHEN n_rhs > 1 THEN 1 ELSE 0 END) AS n_violating,
      |    MAX(n_rhs) AS max_fanout
      |  FROM (SELECT l_orderkey, COUNT(DISTINCT o_custkey) AS n_rhs
      |        FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      |        GROUP BY 1)),
      |u AS (SELECT * FROM f1 UNION ALL SELECT * FROM f3
      |      UNION ALL SELECT * FROM f2)
      |SELECT fd, n_lhs_values, CAST(n_violating AS BIGINT) AS n_violating,
      |  max_fanout, n_violating = 0 AS holds
      |FROM u ORDER BY fd""".stripMargin

  val all: Seq[NamedQuery] = Seq(
    NamedQuery("q_quality_checks", qualityChecks, Some(qualityChecksSql), bench = true),
    NamedQuery("q_benford", benford, Some(benfordSql), bench = true),
    NamedQuery("q_fd_check", fdCheck, Some(fdCheckSql), bench = true))
}
