package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._

/** ORC round-trip: the second columnar format Spark ships natively.
  * Same data, same pushdown expectations as parquet. */
class OrcSpec extends GraftSuite {
  import spark.implicits._

  test("orc round-trips the orders table and pushes filters to the scan") {
    val dir = Files.createTempDirectory("graft_orc").toFile
    try {
      val path = dir.getAbsolutePath + "/orders"
      Tables.orders(spark, sf).write.mode("overwrite").orc(path)
      val back = spark.read.orc(path)
      assertSameRows(back, Tables.orders(spark, sf))

      val q = back.filter($"o_totalprice" > 100000.0).select($"o_orderkey")
      val plan = q.queryExecution.executedPlan.toString
      assert("PushedFilters: \\[[^\\]]*o_totalprice".r.findFirstIn(plan).isDefined,
        s"price predicate not pushed to the ORC scan:\n$plan")
      assert(plan.contains("ReadSchema") && !plan.contains("o_orderdate"),
        s"column pruning must reach the ORC scan:\n$plan")
    } finally rmTree(dir)
  }
}
