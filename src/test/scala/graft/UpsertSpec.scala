package graft

import graft.operators.Upsert

/** MERGE semantics: replace matched wholesale, insert new, keep rest. */
class UpsertSpec extends GraftSuite {
  import spark.implicits._

  test("upsert replaces matched rows wholesale, inserts new keys, keeps the rest") {
    val existing = Seq((1L, "a", 10.0), (2L, "b", 20.0), (3L, "c", 30.0))
      .toDF("id", "name", "bal")
    val updates = Seq((2L, "B2", 99.0), (9L, "new", 1.0))
      .toDF("id", "name", "bal")
    val out = Upsert.upsert(existing, updates, "id")
      .collect().map(r => r.getLong(0) -> (r.getString(1), r.getDouble(2))).toMap
    assert(out == Map(
      1L -> ("a", 10.0), 2L -> ("B2", 99.0), 3L -> ("c", 30.0), 9L -> ("new", 1.0)))
  }

  test("an update carrying a NULL nulls the field — no per-column leak-through") {
    val existing = Seq((1L, Option("keepme"))).toDF("id", "name")
    val updates = Seq((1L, Option.empty[String])).toDF("id", "name")
    val out = Upsert.upsert(existing, updates, "id").collect()
    assert(out.length == 1 && out(0).isNullAt(1),
      "whole-row replacement must carry the update's NULL")
  }

  test("schema and key are validated") {
    val df = Seq((1L, "x")).toDF("id", "name")
    intercept[IllegalArgumentException](
      Upsert.upsert(df, df.withColumnRenamed("name", "other"), "id"))
    intercept[IllegalArgumentException](Upsert.upsert(df, df, "missing"))
  }

  test("scd2: matched keys close at the effective date and reopen; others untouched") {
    import org.apache.spark.sql.functions._
    val current = Seq(
      (1L, "a", "2020-01-01", Option.empty[String]),
      (2L, "b", "2020-01-01", Option.empty[String]),
      (3L, "c-old", "2019-01-01", Option("2020-01-01")), // closed history
      (3L, "c", "2020-01-01", Option.empty[String]))
      .toDF("id", "name", "valid_from", "valid_to")
      .select($"id", $"name", to_date($"valid_from").as("valid_from"),
        to_date($"valid_to").as("valid_to"))
    val changes = Seq((1L, "a2", "2024-06-01"))
      .toDF("id", "name", "effective")
      .select($"id", $"name", to_date($"effective").as("effective"))
    val out = Upsert.scd2(current, changes, "id", "effective")
      .collect().map(r => (r.getLong(0), r.getString(1),
        String.valueOf(r.getDate(2)), String.valueOf(r.getDate(3)))).toSet
    assert(out == Set(
      (1L, "a", "2020-01-01", "2024-06-01"),  // closed at effective
      (1L, "a2", "2024-06-01", "null"),       // new open version
      (2L, "b", "2020-01-01", "null"),        // untouched open
      (3L, "c-old", "2019-01-01", "2020-01-01"), // history passes through
      (3L, "c", "2020-01-01", "null")))
    // exactly one open version per key after application
    val opens = out.toSeq.filter(_._4 == "null").groupBy(_._1)
    assert(opens.values.forall(_.size == 1))
  }

  test("mutation batches with duplicate or NULL keys are rejected") {
    val existing = Seq((1L, "a")).toDF("id", "name")
    val dupes = Seq((2L, "x"), (2L, "y")).toDF("id", "name")
    intercept[IllegalArgumentException](Upsert.upsert(existing, dupes, "id"))
    val nulls = Seq((Option.empty[java.lang.Long], Option("x"))).toDF("id", "name")
    intercept[IllegalArgumentException](Upsert.upsert(existing, nulls, "id"))
  }

  test("scd2 rejects changes effective before the version they close") {
    import org.apache.spark.sql.functions._
    val current = Seq((1L, "a", "2020-01-01", Option.empty[String]))
      .toDF("id", "name", "valid_from", "valid_to")
      .select($"id", $"name", to_date($"valid_from").as("valid_from"),
        to_date($"valid_to").as("valid_to"))
    val early = Seq((1L, "a2", "2019-06-01")).toDF("id", "name", "effective")
      .select($"id", $"name", to_date($"effective").as("effective"))
    intercept[IllegalArgumentException](Upsert.scd2(current, early, "id", "effective"))
  }

  // ------------------------------------------------------------ point-in-time join
  test("pointInTime picks the version valid AT the event date, boundaries half-open") {
    import org.apache.spark.sql.functions._
    val dim = Seq(
      (1L, 10.0, "2020-01-01", Option("2021-01-01")),
      (1L, 20.0, "2021-01-01", Option.empty[String]),
      (2L, 99.0, "2020-01-01", Option.empty[String]))
      .toDF("k", "bal", "valid_from", "valid_to")
      .select($"k", $"bal", to_date($"valid_from").as("valid_from"),
        to_date($"valid_to").as("valid_to"))
    val facts = Seq(
      (100L, 1L, "2020-06-15"), // inside the closed version
      (101L, 1L, "2021-01-01"), // ON the boundary -> NEW version (half-open)
      (102L, 1L, "2020-12-31"), // last day of the closed version
      (103L, 1L, "2019-12-31"), // before any version -> dropped
      (104L, 2L, "2024-01-01")) // single open version
      .toDF("fid", "fk", "event")
      .select($"fid", $"fk", to_date($"event").as("event"))
    val out = Upsert.pointInTime(facts, dim, "fk", "k", "event")
      .select($"fid", $"bal")
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(out == Map(100L -> 10.0, 101L -> 20.0, 102L -> 10.0, 104L -> 99.0))
  }

  test("pointInTime plans an equi-join on the key, never a nested loop") {
    val out = SparkEntry.queries("q_scd2_pit")(spark, sf)
    val plan = out.queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin") &&
      !plan.contains("CartesianProduct"),
      s"validity predicate must ride the key equi-join as a residual:\n$plan")
    // every order matched exactly one version
    assert(out.count() == Tables.orders(spark, sf).count())
  }

  test("cdc apply: last op wins, deletes remove, updates land, inserts stay") {
    import org.apache.spark.sql.functions._
    val out = SparkEntry.queries("q_cdc_apply")(spark, sf).collect()
      .map(r => r.getLong(0) -> (r.getString(1), r.getDouble(2))).toMap
    val base = Tables.customer(spark, sf)
      .select(col("c_custkey"), col("c_acctbal")).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    base.foreach { case (k, bal) =>
      if (k % 7 == 0) assert(!out.contains(k), s"deleted key $k must vanish")
      else if (k % 5 == 0)
        assert(out(k) == ("U", bal + 1000.0), s"update must win for $k")
      else assert(out(k) == ("I", bal), s"untouched insert must survive for $k")
    }
    assert(out.keySet == base.keySet.filterNot(_ % 7 == 0),
      "no phantom keys may appear")
  }

  test("incremental agg state merge is associative and order-insensitive") {
    import org.apache.spark.sql.functions._
    val orders = Tables.orders(spark, sf)
    // three arbitrary disjoint covering slices by key residue
    val slices = (0 to 2).map(r =>
      Upsert.orderAggState(orders.filter(pmod(col("o_orderkey"), lit(3)) === r)))
    val once = Upsert.mergeAggStates(slices)
    val nested = Upsert.mergeAggStates(Seq(
      Upsert.mergeAggStates(Seq(slices(2), slices(0))), slices(1)))
    val scratch = Upsert.orderAggState(orders)
    assertSameRows(once, scratch)
    assertSameRows(nested, scratch)
  }
}
