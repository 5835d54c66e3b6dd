package graft

import org.apache.spark.sql.functions._

/** Schema evolution across parquet batches — the drift every long-lived
  * ingest directory accumulates (the reference's per-batch part files,
  * retrieval.py:142-146, would hit this the first time the upstream API
  * adds a field): old files lack columns new files carry. */
class SchemaEvolutionSpec extends GraftSuite {
  import spark.implicits._

  test("mergeSchema unions batch schemas; missing columns read as null") {
    val dir = java.nio.file.Files.createTempDirectory("graft_evolve").toFile
    try {
      // batch 1: original schema
      Seq((1L, "a"), (2L, "b")).toDF("id", "name")
        .write.parquet(s"$dir/b1")
      // batch 2: a column was added upstream
      Seq((3L, "c", 0.5), (4L, "d", 0.7)).toDF("id", "name", "score")
        .write.parquet(s"$dir/b2")
      val merged = spark.read.option("mergeSchema", "true")
        .parquet(s"$dir/b1", s"$dir/b2")
      assert(merged.columns.sorted.toSeq == Seq("id", "name", "score"))
      assert(merged.count() == 4)
      // old rows surface the new column as null — no failure, no skew
      assert(merged.filter($"score".isNull).select($"id")
        .collect().map(_.getLong(0)).sorted.toSeq == Seq(1L, 2L))
      // and filters on the new column still prune correctly
      assert(merged.filter($"score" > 0.6).count() == 1)
    } finally rmTree(dir)
  }

  test("without mergeSchema the read uses one batch's schema (documented default)") {
    val dir = java.nio.file.Files.createTempDirectory("graft_evolve").toFile
    try {
      Seq((1L, "a")).toDF("id", "name").write.parquet(s"$dir/b1")
      Seq((2L, "b", 0.5)).toDF("id", "name", "score").write.parquet(s"$dir/b2")
      // default read picks a random file's footer — columns may silently
      // drop; the assertion documents WHY the ingest path must opt in
      val cols = spark.read.parquet(s"$dir/b1", s"$dir/b2").columns.toSet
      assert(cols == Set("id", "name") || cols == Set("id", "name", "score"))
    } finally rmTree(dir)
  }
}
