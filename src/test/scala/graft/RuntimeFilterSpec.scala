package graft

import org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain
import org.apache.spark.sql.functions._

/** Runtime bloom-filter join pruning (InjectRuntimeFilter) — the scale
  * mechanism for selective fact⋈dim joins: Spark builds a bloom filter
  * from the filtered dim side's join keys and applies it to the fact
  * scan BEFORE the shuffle, so at 100 TB the fact side ships only rows
  * that can match instead of the full table. Like SkewSpec's AQE case,
  * this proves the mechanism fires on this build rather than assuming
  * the doc-claimed default applies. */
class RuntimeFilterSpec extends GraftSuite {
  import spark.implicits._

  test("a selective dim filter injects a bloom filter on the fact side") {
    val keys = Seq(
      "spark.sql.optimizer.runtime.bloomFilter.enabled",
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold",
      "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold",
      "spark.sql.autoBroadcastJoinThreshold")
    val saved = keys.map(k => k -> spark.conf.getOption(k)).toMap
    spark.conf.set("spark.sql.optimizer.runtime.bloomFilter.enabled", "true")
    // sf0.001 scans are KBs; production thresholds (10 GB / 10 MB) are
    // scaled down proportionally so the rule sees the same shape it
    // would see on a TB-sized fact table
    spark.conf.set(
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold", "1024")
    spark.conf.set(
      "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold", "10MB")
    // force a shuffle join: broadcast joins don't need the runtime filter
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val fact = Tables.lineitem(spark, sf)
      val dim = Tables.orders(spark, sf).filter($"o_orderpriority" === "1-URGENT")
      val joined = fact.join(dim, $"l_orderkey" === $"o_orderkey")
        .select($"l_orderkey", $"l_quantity", $"o_orderpriority")
      val blooms = joined.queryExecution.optimizedPlan.collect {
        case p => p.expressions.flatMap(_.collect {
          case b: BloomFilterMightContain => b
        })
      }.flatten
      assert(blooms.nonEmpty,
        s"expected InjectRuntimeFilter to add BloomFilterMightContain; " +
          s"optimized plan:\n${joined.queryExecution.optimizedPlan}")
      // and the filtered plan returns exactly the unfiltered-join answer
      val n = joined.count()
      spark.conf.set("spark.sql.optimizer.runtime.bloomFilter.enabled", "false")
      val plainN = fact.join(dim, $"l_orderkey" === $"o_orderkey").count()
      assert(n == plainN && n > 0, s"bloom=$n plain=$plainN")
    } finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }
}
