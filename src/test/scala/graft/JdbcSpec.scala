package graft

import org.apache.spark.sql.SaveMode
import org.apache.spark.sql.functions._

/** S5/S6 parity: the reference's serving layer loads each conformed table
  * into an RDBMS with replace semantics (`to_sql(..., if_exists="replace")`,
  * /root/reference/TableTransform.py:26-29) and the dashboard reads it
  * back over SQL (`pd.read_sql_query`, Frontend.py:28-79). Same round
  * trip here via Spark's JDBC source/sink against embedded Derby (the
  * only in-JVM database shipped with Spark — no network, no extra deps).
  */
class JdbcSpec extends GraftSuite {
  import spark.implicits._

  private val dbDir = s"/tmp/graft_derby/${java.util.UUID.randomUUID()}"
  private val url = s"jdbc:derby:$dbDir;create=true"
  private def jdbc(table: String) =
    spark.read.format("jdbc").option("url", url).option("dbtable", table)

  test("JDBC sink overwrite ('replace') + SQL source round-trip preserves data") {
    val customer = Tables.customer(spark, sf)
    customer.write.format("jdbc")
      .option("url", url).option("dbtable", "customer")
      .mode(SaveMode.Overwrite).save()
    val back = jdbc("customer").load()
    assert(back.count() == customer.count())
    assertSameRows(
      customer.select($"c_custkey", $"c_name", $"c_acctbal", $"c_mktsegment"),
      back.select($"c_custkey", $"c_name", $"c_acctbal", $"c_mktsegment"))
  }

  test("JDBC overwrite replaces prior contents, not appends") {
    val v1 = Seq((1L, "a"), (2L, "b")).toDF("id", "v")
    val v2 = Seq((3L, "c")).toDF("id", "v")
    v1.write.format("jdbc").option("url", url)
      .option("dbtable", "replace_t").mode(SaveMode.Overwrite).save()
    v2.write.format("jdbc").option("url", url)
      .option("dbtable", "replace_t").mode(SaveMode.Overwrite).save()
    val back = jdbc("replace_t").load()
    assert(back.count() == 1)
    assert(back.select($"id").collect()(0).getLong(0) == 3L)
  }

  test("JDBC source pushes a point-lookup predicate down to the database") {
    // dashboard point-lookup shape (Frontend.py:28-32) served from the DB:
    // the WHERE must reach Derby, not filter in Spark after a full scan
    val one = jdbc("customer").load().filter($"c_custkey" === 42)
    assert(one.count() == 1)
    val scan = one.queryExecution.executedPlan.toString
    assert(scan.contains("PushedFilters") && scan.contains("c_custkey"),
      s"predicate not pushed to JDBC source:\n$scan")
  }
}
