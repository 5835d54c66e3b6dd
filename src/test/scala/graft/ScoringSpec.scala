package graft

import org.apache.spark.sql.functions._

/** LM-surprisal scoring: integer-bit quantization semantics, rarity
  * monotonicity, and partitioning invariance of the integer pipeline. */
class ScoringSpec extends GraftSuite {
  import spark.implicits._

  test("rarer words never score fewer bits than common words") {
    // corpus: 'the' x 64 docs, 'zyxw' once -> zyxw's smoothed inverse
    // probability is larger, so its bit count must be >=.
    val docs = ((1 to 64).map(i => (i.toLong, "the common words"))
      :+ (100L, "zyxw the")).toDF("doc_id", "text")
      .withColumn("lang", lit("en")).withColumn("source", lit("s"))
      .withColumn("n_chars", length($"text"))
    val dir = java.nio.file.Files.createTempDirectory("scoring").toString
    docs.write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val out = SparkEntry.queries("q_lm_surprisal")(spark, dir)
    val rare = out.filter($"doc_id" === 100L)
      .select($"mean_millibits").as[Long].head()
    val common = out.filter($"doc_id" === 1L)
      .select($"mean_millibits").as[Long].head()
    assert(rare > common,
      s"rare-word doc must out-surprise common-word doc: $rare vs $common")
    rmTree(new java.io.File(dir))
  }

  test("surprisal is partitioning-invariant (integer-exact on any layout)") {
    val a = canon(SparkEntry.queries("q_lm_surprisal")(spark, sf))
    // Same computation over a deliberately reshuffled input path: rebuild
    // via the public query on a repartitioned copy of the table.
    val docs = Tables.documents(spark, sf).repartition(13, $"source")
    val dir = java.nio.file.Files.createTempDirectory("scoring2").toString
    docs.write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val b = canon(SparkEntry.queries("q_lm_surprisal")(spark, dir))
    assert(a == b)
    rmTree(new java.io.File(dir))
  }

  test("every document with at least one alphabetic token is scored") {
    val nDocs = Tables.documents(spark, sf)
      .filter(expr(s"size(regexp_extract_all(lower(text), '${graft.operators.Scoring.WordPat}', 0)) > 0"))
      .count()
    val nScored = SparkEntry.queries("q_lm_surprisal")(spark, sf).count()
    assert(nScored == nDocs)
  }
}
