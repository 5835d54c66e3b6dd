package graft

import graft.operators.Skew
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Salted two-phase top-k per key: result-identical to the plain window,
  * including under a pathological hot key. */
class SkewSpec extends GraftSuite {
  import spark.implicits._

  test("salted top-k equals the plain-window top-k on shipped data") {
    val o = Tables.orders(spark, sf)
    val salted = Skew.saltedTopKPerKey(o, "o_custkey",
      Seq($"o_totalprice".desc, $"o_orderkey".asc), $"o_orderkey", 3, 8)
      .select($"o_custkey", $"o_orderkey", $"rank")
    val w = Window.partitionBy($"o_custkey").orderBy($"o_totalprice".desc, $"o_orderkey".asc)
    val plain = o.withColumn("rank", row_number().over(w)).filter($"rank" <= 3)
      .select($"o_custkey", $"o_orderkey", $"rank")
    assertSameRows(salted, plain)
  }

  test("salted top-k survives a hot key (99% of rows on one key)") {
    // one key with 50k rows, 100 uniform keys with 5 rows each
    val hot = spark.range(50000).select(
      lit(0L).as("key"), $"id".as("uid"), (lit(50000) - $"id").cast("double").as("score"))
    val tail = spark.range(500).select(
      ($"id" % 100 + 1).as("key"), ($"id" + 100000).as("uid"), rand(7).as("score"))
    val df = hot.unionByName(tail)
    val salted = Skew.saltedTopKPerKey(df, "key",
      Seq($"score".desc, $"uid".asc), $"uid", 5, 16)
      .select($"key", $"uid", $"rank")
    val w = Window.partitionBy($"key").orderBy($"score".desc, $"uid".asc)
    val plain = df.withColumn("rank", row_number().over(w)).filter($"rank" <= 5)
      .select($"key", $"uid", $"rank")
    assertSameRows(salted, plain)
    // the hot key's phase-2 input is bounded: saltBuckets * k, not 50k
    assert(salted.filter($"key" === 0).count() == 5)
  }
}
