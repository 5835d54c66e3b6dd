package graft

import graft.functions.{GraftFunctionRegistry, VectorFunctions}

/** The native expressions must be reachable from plain SQL (the S6
  * serving path), with identical results to the Column API. */
class FunctionRegistrySpec extends GraftSuite {
  import spark.implicits._

  GraftFunctionRegistry.register(spark)

  test("graft_cosine from SQL equals the Column API") {
    Tables.registerAll(spark, sf)
    val viaSql = spark.sql(
      """SELECT e.vec_id,
        |  round(graft_cosine(e.embedding, q.embedding), 4) AS cos_sim
        |FROM embeddings e CROSS JOIN (SELECT embedding FROM embeddings WHERE vec_id = 0) q
        |WHERE e.vec_id <> 0 ORDER BY cos_sim DESC, vec_id LIMIT 10""".stripMargin)
    val viaApi = SparkEntry.queries("q_embedding_cosine_topk")(spark, sf)
    assertSameRows(viaSql, viaApi)
  }

  test("text + sketch functions are callable from SQL and deterministic") {
    Tables.registerAll(spark, sf)
    val r = spark.sql(
      """SELECT doc_id,
        |  graft_simhash(split(text, ' ')) AS fp,
        |  size(graft_trigram_minhash(text, 16)) AS sig_len,
        |  graft_fingerprint(text, 16) AS fpr,
        |  graft_hash64(text, 7L) AS h
        |FROM documents ORDER BY doc_id LIMIT 5""".stripMargin).collect()
    assert(r.length == 5)
    assert(r.forall(_.getInt(2) == 16))
    // spot-check SQL simhash against the JVM implementation
    val doc0 = Tables.documents(spark, sf)
      .filter($"doc_id" === r(0).getLong(0)).collect()(0).getAs[String]("text")
    val arr = new org.apache.spark.sql.catalyst.util.GenericArrayData(
      doc0.split(" ", -1).map(org.apache.spark.unsafe.types.UTF8String.fromString(_)))
    assert(r(0).getLong(1) == graft.functions.TextImpl.simhash(arr))
  }

  test("GraftExtensions injects the same function set") {
    // builder-level extensions can't attach to the already-created shared
    // session; assert the injector wires every registry entry instead
    val ext = new org.apache.spark.sql.SparkSessionExtensions
    new graft.functions.GraftExtensions().apply(ext)
    // registration through the session path must cover the same names
    val names = GraftFunctionRegistry.functions.map(_._1.funcName).toSet
    assert(names.size == 19 && names.contains("graft_cosine") &&
      names.contains("graft_cdc_cuts") && names.contains("graft_pq_codes") &&
      names.contains("graft_cms_bucket") &&
      names.contains("graft_unigram_segment"))
  }

  test("round-11 natives from SQL equal the Column API spellings") {
    Tables.registerAll(spark, sf)
    // graft_pq_codes == VectorFunctions.pqCodes (shared kernel)
    val viaSql = spark.sql(
      """SELECT vec_id, graft_pq_codes(embedding, 4, 16) AS codes
        |FROM embeddings ORDER BY vec_id LIMIT 20""".stripMargin)
    val viaApi = Tables.embeddings(spark, sf)
      .select($"vec_id", VectorFunctions.pqCodes($"embedding", 4, 16).as("codes"))
      .orderBy($"vec_id").limit(20)
    assertSameRows(viaSql, viaApi)
    // graft_cms_bucket == the q_cms bucket spelling
    val sqlB = spark.sql(
      """SELECT o_custkey, graft_cms_bucket(o_custkey, 2, 256) AS b
        |FROM orders ORDER BY o_custkey LIMIT 20""".stripMargin)
    val apiB = Tables.orders(spark, sf)
      .select($"o_custkey",
        (graft.functions.TextFunctions.md5Lower64(
          org.apache.spark.sql.functions.concat(
            org.apache.spark.sql.functions.lit("cms2:"),
            $"o_custkey".cast("string")))
          .bitwiseAND(org.apache.spark.sql.functions.lit(Long.MaxValue))
          % 256L).as("b"))
      .orderBy($"o_custkey").limit(20)
    assertSameRows(sqlB, apiB)
    // graft_unigram_segment == UnigramFunctions.unigramSegment
    val vocab = Seq("ab", "a", "b", "c")
    val lit = vocab.map("'" + _ + "'").mkString("array(", ",", ")")
    val sqlSeg = spark.sql(
      s"SELECT graft_unigram_segment('abcab', $lit) AS pieces")
    val apiSeg = Seq("abcab").toDF("w").select(
      graft.functions.UnigramFunctions.unigramSegment($"w", vocab).as("pieces"))
    assertSameRows(sqlSeg, apiSeg)
    // non-constant vocab must be rejected at analysis, not fail weirdly
    val err = intercept[Exception] {
      spark.sql("SELECT graft_unigram_segment(w, array(w)) FROM (SELECT 'x' AS w)")
        .collect()
    }
    assert(err.getMessage.contains("constant") ||
      err.getMessage.contains("foldable"))
  }
}
