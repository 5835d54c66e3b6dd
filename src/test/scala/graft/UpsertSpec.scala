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
}
