package graft.functions

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** SQL registration of the engine's native expressions, so the S6 serving
  * path (`spark.sql` over registered views) can call them directly —
  * `SELECT graft_cosine(a.embedding, b.embedding) ...` — with the same
  * codegen bodies as the Column API.
  *
  * Two activation modes:
  *  - `GraftExtensions` for `spark.sql.extensions` /
  *    `SparkSession.builder().withExtensions` (cluster-wide install);
  *  - `GraftFunctionRegistry.register(spark)` to add them to an existing
  *    session (tests, notebooks).
  */
object GraftFunctionRegistry {

  private def info(name: String, usage: String) =
    new ExpressionInfo(getClass.getCanonicalName, name)

  val functions: Seq[(FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression)] = Seq(
    (FunctionIdentifier("graft_cosine"),
      info("graft_cosine", "graft_cosine(a, b) - cosine similarity of two float arrays"),
      (args: Seq[Expression]) => CosineSimilarity(args(0), args(1))),
    (FunctionIdentifier("graft_lsh_bands"),
      info("graft_lsh_bands", "graft_lsh_bands(emb, numPlanes, bandBits) - banded sign-sketch"),
      (args: Seq[Expression]) => LshBands(args(0), args(1), args(2))),
    (FunctionIdentifier("graft_ivf_cells"),
      info("graft_ivf_cells", "graft_ivf_cells(emb, k, nprobe) - nearest IVF cell ids"),
      (args: Seq[Expression]) => IvfCells(args(0), args(1), args(2))),
    (FunctionIdentifier("graft_trigram_minhash"),
      info("graft_trigram_minhash", "graft_trigram_minhash(text, n) - MinHash signature"),
      (args: Seq[Expression]) => TriGramMinHash(args(0), args(1))),
    (FunctionIdentifier("graft_trigram_hashes"),
      info("graft_trigram_hashes", "graft_trigram_hashes(text) - sorted distinct 3-gram hashes"),
      (args: Seq[Expression]) => TriGramHashes(args(0))),
    (FunctionIdentifier("graft_simhash"),
      info("graft_simhash", "graft_simhash(tokens) - 64-bit SimHash of a token array"),
      (args: Seq[Expression]) => SimHash64(args(0))),
    (FunctionIdentifier("graft_hash64"),
      info("graft_hash64", "graft_hash64(s, seed) - seeded 64-bit text hash"),
      (args: Seq[Expression]) => Hash64(args(0), args(1))),
    (FunctionIdentifier("graft_fingerprint"),
      info("graft_fingerprint", "graft_fingerprint(text, window) - winnowing fingerprint"),
      (args: Seq[Expression]) => RollingFingerprint(args(0), args(1))))

  /** Add all graft functions to an existing session's registry. */
  def register(spark: SparkSession): Unit =
    functions.foreach { case (id, fnInfo, builder) =>
      spark.sessionState.functionRegistry.registerFunction(id, fnInfo, builder)
    }
}

/** `spark.sql.extensions`-installable variant. */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    GraftFunctionRegistry.functions.foreach(ext.injectFunction)
}
