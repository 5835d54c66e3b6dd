package graft

import graft.functions.Exact
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.Prop.forAll
import org.scalacheck.Properties

/** Specs for order-independent decimal-routed aggregation — the mechanism
  * behind run-to-run-stable (and oracle-agreeing) float aggregates. */
class ExactSpec extends GraftSuite {
  import spark.implicits._

  test("dsum is invariant to partitioning (the property plain double sum lacks)") {
    val vals = (1 to 10000).map(i => (i % 997) * 0.01)
    val df1 = vals.toDF("v").repartition(1)
    val df32 = vals.toDF("v").repartition(32)
    val s1 = df1.agg(Exact.dsum($"v")).collect()(0).getDouble(0)
    val s32 = df32.agg(Exact.dsum($"v")).collect()(0).getDouble(0)
    assert(s1 == s32) // bit-exact equality, not tolerance
    assert(math.abs(s1 - vals.sum) < 1e-6)
  }

  test("davg skips nulls like AVG") {
    val df = Seq(Some(1.0), None, Some(3.0)).toDF("v")
    val r = df.agg(Exact.davg($"v")).collect()(0).getDouble(0)
    assert(r == 2.0)
  }

  test("iavg on integral column") {
    val df = Seq(1L, 2L, 4L).toDF("v")
    assert(df.agg(Exact.iavg($"v")).collect()(0).getDouble(0) == 7.0 / 3.0)
  }
}

object ExactPropertySpec extends Properties("Exact") {
  import SparkSpec.spark
  import spark.implicits._

  // each case runs a Spark job — 10 cases is plenty for this property
  override def overrideParameters(p: org.scalacheck.Test.Parameters): org.scalacheck.Test.Parameters =
    p.withMinSuccessfulTests(10)

  // 2-dp doubles in a sane range, like the test tables' prices
  private val cents = Gen.chooseNum(-1000000L, 1000000L).map(_ * 0.01)

  property("dsum equals exact rational sum for 2-dp inputs") =
    forAll(Gen.listOfN(50, cents)) { xs =>
      val spark2 = spark
      import spark2.implicits._
      xs.isEmpty || {
        val got = xs.toDF("v").agg(Exact.dsum($"v")).collect()(0).getDouble(0)
        val want = xs.map(x => BigDecimal(x).setScale(2, BigDecimal.RoundingMode.HALF_UP)).sum.toDouble
        got == want
      }
    }
}
