package graft

import org.apache.spark.sql.functions._

/** Co-located (bucketed) joins — the 100 TB shuffle-elimination story.
  *
  * Two fact tables bucketed by the join key at write time join with NO
  * Exchange in the plan: each task reads matching buckets from both
  * sides. At cluster scale this converts the dominant cost of a repeated
  * big-big join (full shuffle of both sides, every query) into a
  * one-time layout decision at ingest.
  */
class BucketingSpec extends GraftSuite {
  import spark.implicits._

  private val buckets = 4

  private def withBucketedTables(f: => Unit): Unit = {
    spark.sql("DROP TABLE IF EXISTS graft_bkt_orders")
    spark.sql("DROP TABLE IF EXISTS graft_bkt_customer")
    Tables.orders(spark, sf)
      .select($"o_orderkey", $"o_custkey", $"o_totalprice")
      .write.bucketBy(buckets, "o_custkey").sortBy("o_custkey")
      .mode("overwrite").saveAsTable("graft_bkt_orders")
    Tables.customer(spark, sf)
      .select($"c_custkey", $"c_name", $"c_nationkey")
      .write.bucketBy(buckets, "c_custkey").sortBy("c_custkey")
      .mode("overwrite").saveAsTable("graft_bkt_customer")
    try f finally {
      spark.sql("DROP TABLE IF EXISTS graft_bkt_orders")
      spark.sql("DROP TABLE IF EXISTS graft_bkt_customer")
    }
  }

  test("bucketed-by-key join plans with zero Exchange") {
    withBucketedTables {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      spark.conf.set("spark.sql.adaptive.enabled", "false")
      try {
        val joined = spark.table("graft_bkt_orders")
          .join(spark.table("graft_bkt_customer"),
            $"o_custkey" === $"c_custkey")
        val plan = joined.queryExecution.executedPlan.toString
        assert(!plan.contains("Exchange"),
          s"bucketed join must not shuffle:\n$plan")
        assert(plan.contains("SortMergeJoin"), s"expected SMJ:\n$plan")

        // same join unbucketed DOES shuffle — the layout is what saves it
        val unbucketed = Tables.orders(spark, sf)
          .join(Tables.customer(spark, sf), $"o_custkey" === $"c_custkey")
        assert(unbucketed.queryExecution.executedPlan.toString.contains("Exchange"))

        // and the bucketed result is the same frame
        assertSameRows(
          joined.select($"o_orderkey", $"c_name"),
          unbucketed.select($"o_orderkey", $"c_name"))
      } finally {
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
        spark.conf.set("spark.sql.adaptive.enabled", "true")
      }
    }
  }

  test("groupBy on the bucket key aggregates without an Exchange") {
    withBucketedTables {
      spark.conf.set("spark.sql.adaptive.enabled", "false")
      try {
        val agg = spark.table("graft_bkt_orders")
          .groupBy($"o_custkey").agg(count(lit(1)).as("n"))
        val plan = agg.queryExecution.executedPlan.toString
        assert(!plan.contains("Exchange"),
          s"bucket layout should satisfy the agg's distribution:\n$plan")
        assert(agg.count() ==
          Tables.orders(spark, sf).select($"o_custkey").distinct().count())
      } finally spark.conf.set("spark.sql.adaptive.enabled", "true")
    }
  }
}
