package graft.operators

import graft.{NamedQuery, Tables}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Data-quality checks — the validation layer a pipeline runs before
  * publishing a table (the reference trusts its sources blindly; a
  * production ETL can't). Each check distills to one violation COUNT so
  * the full suite is a handful of independent aggregation jobs:
  *  - unique: one groupBy on the key, count of groups with n > 1;
  *  - nonNull: a single filtered count, no shuffle;
  *  - referential: left-anti join child->parent (broadcast when the
  *    parent key set is small), count of orphans;
  *  - accepted: filtered count against an allow-list literal.
  * No driver-side row iteration anywhere — every check stays a
  * distributed aggregate, so the suite costs a few scans at any scale.
  */
object Checks {

  /** Rows whose `cols` combination appears more than once. */
  def uniqueViolations(df: DataFrame, cols: Seq[String]): Long =
    df.groupBy(cols.map(col): _*).count()
      .filter(col("count") > 1)
      .agg(coalesce(sum(col("count")), lit(0L))).collect()(0).getLong(0)

  /** Rows with a NULL in any of `cols`. */
  def nonNullViolations(df: DataFrame, cols: Seq[String]): Long =
    df.filter(cols.map(c => col(c).isNull).reduce(_ || _)).count()

  /** Child rows whose key has no match in the parent (orphans). NULL
    * child keys are orphans too — count them before the null-rejecting
    * anti-join. */
  def referentialViolations(child: DataFrame, childKey: String,
                            parent: DataFrame, parentKey: String): Long = {
    val nulls = child.filter(col(childKey).isNull).count()
    nulls + child.filter(col(childKey).isNotNull)
      .join(broadcast(parent.select(col(parentKey)).distinct()),
        col(childKey) === col(parentKey), "left_anti")
      .count()
  }

  /** Rows whose `c` is NULL or outside the allow-list. */
  def acceptedViolations(df: DataFrame, c: String, allowed: Seq[String]): Long =
    df.filter(col(c).isNull || !col(c).isin(allowed: _*)).count()

  // ------------------------------------------------------------ q_quality_checks
  /** The suite over the shipped tables: primary-key uniqueness,
    * key non-nullness, orders->customer referential integrity, and
    * status domain membership. All four pass on the clean test data;
    * ChecksSpec injects violations to prove each detector fires. */
  private def qualityChecks(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val orders = Tables.orders(s, dir)
    val customer = Tables.customer(s, dir)
    val results = Seq(
      ("orders_pk_unique",
        uniqueViolations(orders, Seq("o_orderkey"))),
      ("orders_keys_non_null",
        nonNullViolations(orders, Seq("o_orderkey", "o_custkey"))),
      ("orders_fk_customer",
        referentialViolations(orders, "o_custkey", customer, "c_custkey")),
      ("orders_status_domain",
        acceptedViolations(orders, "o_orderstatus", Seq("F", "O", "P"))))
    results.toDF("check_name", "violations").orderBy($"check_name")
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
      |  (SELECT COALESCE(SUM(n), 0) FROM
      |    (SELECT COUNT(*) AS n FROM orders GROUP BY o_orderkey HAVING COUNT(*) > 1))
      |UNION ALL
      |SELECT 'orders_status_domain',
      |  (SELECT COUNT(*) FROM orders
      |   WHERE o_orderstatus IS NULL OR o_orderstatus NOT IN ('F', 'O', 'P'))
      |ORDER BY check_name""".stripMargin

  val all: Seq[NamedQuery] = Seq(
    NamedQuery("q_quality_checks", qualityChecks, Some(qualityChecksSql)))
}
