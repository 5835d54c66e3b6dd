package graft

import graft.operators.Checks

/** Each quality-check detector must fire on injected violations and stay
  * silent on clean data. */
class ChecksSpec extends GraftSuite {
  import spark.implicits._

  private def clean = Seq((1L, 10L, "F"), (2L, 11L, "O"), (3L, 12L, "P"))
    .toDF("id", "fk", "status")

  test("unique: duplicate keys counted as total duplicated rows") {
    assert(Checks.uniqueViolations(clean, Seq("id")) == 0)
    val dup = clean.unionByName(Seq((1L, 13L, "F")).toDF("id", "fk", "status"))
    assert(Checks.uniqueViolations(dup, Seq("id")) == 2) // both rows of key 1
  }

  test("nonNull: any null in the listed columns counts the row once") {
    assert(Checks.nonNullViolations(clean, Seq("id", "fk")) == 0)
    val withNull = clean.unionByName(
      Seq((Option.empty[java.lang.Long], Option(14L), Option("F")))
        .toDF("id", "fk", "status"))
    assert(Checks.nonNullViolations(withNull, Seq("id", "fk")) == 1)
  }

  test("referential: orphans and null keys are violations") {
    val parent = Seq(10L, 11L).toDF("pk")
    // fk=12 is an orphan
    assert(Checks.referentialViolations(clean, "fk", parent, "pk") == 1)
    val withNullFk = clean.unionByName(
      Seq((Option(4L), Option.empty[java.lang.Long], Option("F")))
        .toDF("id", "fk", "status"))
    assert(Checks.referentialViolations(withNullFk, "fk", parent, "pk") == 2)
  }

  test("accepted: out-of-domain and null values are violations") {
    assert(Checks.acceptedViolations(clean, "status", Seq("F", "O", "P")) == 0)
    val bad = clean.unionByName(Seq((4L, 15L, "X")).toDF("id", "fk", "status"))
    assert(Checks.acceptedViolations(bad, "status", Seq("F", "O", "P")) == 1)
  }

  test("q_quality_checks: clean test data passes every check") {
    val out = SparkEntry.queries("q_quality_checks")(spark, sf).collect()
    assert(out.length == 4)
    out.foreach(r => assert(r.getLong(1) == 0L,
      s"${r.getString(0)} reported ${r.getLong(1)} violations on clean data"))
  }

  test("checks survive adversarial column names (same-name FK, a column named count)") {
    // same child/parent key name — the common FK layout
    val child = Seq((1L, 10L), (2L, 99L)).toDF("id", "key")
    val parent = Seq(10L).toDF("key")
    assert(Checks.referentialViolations(child, "key", parent, "key") == 1)
    // a key column literally named "count"
    val counted = Seq(1L, 1L, 2L).toDF("count")
    assert(Checks.uniqueViolations(counted, Seq("count")) == 2)
  }

  test("the check suite is lazy: the plan is a union of live aggregates") {
    val df = SparkEntry.queries("q_quality_checks")(spark, sf)
    val plan = df.queryExecution.executedPlan.toString
    // an eager implementation would collect counts and plan a
    // LocalTableScan of 4 precomputed rows — the real checks must be in
    // the plan itself
    assert(!plan.contains("LocalTableScan"),
      s"check results were precomputed on the driver:\n$plan")
    assert(plan.contains("Union"), s"expected a union of check frames:\n$plan")
    assert(df.count() == 4)
  }

  test("empty column lists are rejected, not silently mis-counted") {
    intercept[IllegalArgumentException](Checks.uniqueViolations(clean, Seq.empty))
    intercept[IllegalArgumentException](Checks.nonNullViolations(clean, Seq.empty))
  }

  test("benford audit: digits 1-9 partition the rows, ppm accounting closes") {
    import org.apache.spark.sql.functions._
    val rows = SparkEntry.queries("q_benford")(spark, SparkSpec.sfSmoke).collect()
    assert(rows.map(_.getInt(0)).toSeq == (1 to 9),
      "every leading digit must appear on the synthetic totals")
    val n = rows.map(_.getLong(1)).sum
    val expected = Tables.orders(spark, SparkSpec.sfSmoke)
      .filter(col("o_totalprice") >= 1).count()
    assert(n == expected, "digit groups must partition the eligible rows")
    val ppm = rows.map(_.getLong(2)).sum
    assert(ppm > 1000000L - 9 && ppm <= 1000000L,
      s"integer-DIV rates must sum to 1e6 minus truncation: $ppm")
    rows.foreach(r => assert(r.getLong(4) ==
      math.abs(r.getLong(2) - r.getLong(3)), s"gap must be |rate-benford|: $r"))
  }
}
