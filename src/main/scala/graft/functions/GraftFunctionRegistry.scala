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
    new ExpressionInfo(getClass.getCanonicalName, null, name, usage,
      "", "", "", "misc_funcs", "4.0.0", "", "built-in")

  /** Wrap a builder with an arity check so wrong arg counts fail with a
    * clear message at analysis, not a raw IndexOutOfBounds. */
  private def arity(name: String, n: Int)(b: Seq[Expression] => Expression)
      : Seq[Expression] => Expression =
    args => {
      if (args.length != n) throw new IllegalArgumentException(
        s"$name expects $n arguments, got ${args.length}")
      b(args)
    }

  val functions: Seq[(FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression)] = Seq(
    (FunctionIdentifier("graft_cosine"),
      info("graft_cosine", "_FUNC_(a, b) - cosine similarity of two float arrays"),
      arity("graft_cosine", 2)(args => CosineSimilarity(args(0), args(1)))),
    (FunctionIdentifier("graft_lsh_bands"),
      info("graft_lsh_bands", "_FUNC_(emb, numPlanes, bandBits) - banded sign-sketch"),
      arity("graft_lsh_bands", 3)(args => LshBands(args(0), args(1), args(2)))),
    (FunctionIdentifier("graft_ivf_cells"),
      info("graft_ivf_cells", "_FUNC_(emb, k, nprobe) - nearest IVF cell ids"),
      arity("graft_ivf_cells", 3)(args => IvfCells(args(0), args(1), args(2)))),
    (FunctionIdentifier("graft_trigram_minhash"),
      info("graft_trigram_minhash", "_FUNC_(text, n) - MinHash signature"),
      arity("graft_trigram_minhash", 2)(args => TriGramMinHash(args(0), args(1)))),
    (FunctionIdentifier("graft_trigram_hashes"),
      info("graft_trigram_hashes", "_FUNC_(text) - sorted distinct 3-gram hashes"),
      arity("graft_trigram_hashes", 1)(args => TriGramHashes(args(0)))),
    (FunctionIdentifier("graft_cdc_cuts"),
      info("graft_cdc_cuts", "_FUNC_(text, window, modulus) - content-defined chunk cut positions"),
      arity("graft_cdc_cuts", 3)(args => CdcCuts(args(0), args(1), args(2)))),
    (FunctionIdentifier("graft_nfc"),
      info("graft_nfc", "_FUNC_(s) - Unicode NFC canonical composition"),
      arity("graft_nfc", 1)(args => NfcNormalize(args(0)))),
    (FunctionIdentifier("graft_simhash"),
      info("graft_simhash", "_FUNC_(tokens) - 64-bit SimHash of a token array"),
      arity("graft_simhash", 1)(args => SimHash64(args(0)))),
    (FunctionIdentifier("graft_hash64"),
      info("graft_hash64", "_FUNC_(s, seed) - seeded 64-bit text hash"),
      arity("graft_hash64", 2)(args => Hash64(args(0), args(1)))),
    (FunctionIdentifier("graft_md5_lower64"),
      info("graft_md5_lower64",
        "_FUNC_(s) - lower 64 bits of MD5 (= DuckDB md5_number_lower)"),
      arity("graft_md5_lower64", 1)(args => Md5Lower64(args(0)))),
    (FunctionIdentifier("graft_fingerprint"),
      info("graft_fingerprint", "_FUNC_(text, window) - winnowing fingerprint"),
      arity("graft_fingerprint", 2)(args => RollingFingerprint(args(0), args(1)))),
    (FunctionIdentifier("graft_word_ngram_hashes"),
      info("graft_word_ngram_hashes", "_FUNC_(text, n) - sorted distinct word n-gram hashes"),
      arity("graft_word_ngram_hashes", 2)(args => WordNGramHashes(args(0), args(1)))),
    (FunctionIdentifier("graft_int8_quant_stats"),
      info("graft_int8_quant_stats", "_FUNC_(emb) - int8 quantization (scale, max_abs_err)"),
      arity("graft_int8_quant_stats", 1)(args => Int8QuantStats(args(0)))),
    (FunctionIdentifier("graft_zorder"),
      info("graft_zorder", "_FUNC_(x, y) - Morton z-order interleave of two 16-bit buckets"),
      arity("graft_zorder", 2)(args => ZOrder2(args(0), args(1)))),
    (FunctionIdentifier("graft_deflate_len"),
      info("graft_deflate_len", "_FUNC_(s) - DEFLATE-compressed byte length (entropy proxy)"),
      arity("graft_deflate_len", 1)(args => DeflateLen(args(0)))),
    (FunctionIdentifier("graft_misra_gries"),
      info("graft_misra_gries", "_FUNC_(col, k) - Misra-Gries heavy-hitter candidate set"),
      arity("graft_misra_gries", 2)(args => {
        val k = args(1).eval() match {
          case i: Int => i
          case other => throw new IllegalArgumentException(
            s"graft_misra_gries: k must be a constant int, got $other")
        }
        MisraGriesAgg(args(0), k)
      })),
    // ---- round-11 native families, SQL-reachable since round 12 ----
    // (composed as RESOLVED catalyst trees, not via the Column API: a
    // Column→Expression bridge hands the analyzer a ColumnNodeExpression
    // wrapper that never becomes evaluable inside a function builder)
    (FunctionIdentifier("graft_pq_codes"),
      info("graft_pq_codes",
        "_FUNC_(emb, m, k) - per-subspace product-quantization code array"),
      arity("graft_pq_codes", 3)(args => {
        import org.apache.spark.sql.catalyst.expressions.{Add, Cast, CreateArray, Divide, Literal, Multiply, Size, Slice}
        import org.apache.spark.sql.types.IntegerType
        val m = constInt("graft_pq_codes", "m", args(1))
        val k = constInt("graft_pq_codes", "k", args(2))
        if (m < 1 || k < 1) throw new IllegalArgumentException(
          s"graft_pq_codes needs m, k >= 1, got ($m, $k)")
        // the VectorFunctions.pqCodes tree, spelled in catalyst:
        // sub = cast(size(emb) / m as int); code_i = element_at(
        //   ivf_cells(slice(emb, i*sub+1, sub), k, 1), 1)
        val sub = Cast(Divide(Size(args(0)), Literal(m)), IntegerType)
        CreateArray((0 until m).map { i =>
          org.apache.spark.sql.catalyst.expressions.ElementAt(
            IvfCells(
              Slice(args(0), Add(Multiply(Literal(i), sub), Literal(1)), sub),
              Literal(k), Literal(1)),
            Literal(1))
        })
      })),
    (FunctionIdentifier("graft_cms_bucket"),
      info("graft_cms_bucket",
        "_FUNC_(key, i, width) - count-min row-i bucket: md5-lower-64 of " +
          "'cms<i>:<key>', sign-masked, mod width (= the q_cms spelling)"),
      arity("graft_cms_bucket", 3)(args => {
        import org.apache.spark.sql.catalyst.expressions.{BitwiseAnd, Cast, Concat, Literal, Remainder}
        import org.apache.spark.sql.types.{LongType, StringType}
        Remainder(
          BitwiseAnd(
            Md5Lower64(Concat(Seq(
              Literal("cms"), Cast(args(1), StringType),
              Literal(":"), Cast(args(0), StringType)))),
            Literal(Long.MaxValue)),
          Cast(args(2), LongType))
      })),
    (FunctionIdentifier("graft_unigram_segment"),
      info("graft_unigram_segment",
        "_FUNC_(word, vocab) - maximal-munch segmentation against a " +
          "constant piece vocabulary (array<string> literal)"),
      arity("graft_unigram_segment", 2)(args => {
        if (!args(1).foldable) throw new IllegalArgumentException(
          "graft_unigram_segment: vocab must be a constant array<string> " +
            "(the trained vocabulary ships as a literal, like the Column " +
            "API's reference object)")
        val vocab = args(1).eval() match {
          case a: org.apache.spark.sql.catalyst.util.ArrayData =>
            a.toObjectArray(org.apache.spark.sql.types.StringType)
              .map(_.toString).toSeq
          case other => throw new IllegalArgumentException(
            s"graft_unigram_segment: vocab must be array<string>, got $other")
        }
        UnigramSegment(args(0), vocab)
      })))

  private def constInt(fn: String, arg: String, e: Expression): Int =
    e.eval() match {
      case i: Int => i
      case l: Long => l.toInt
      case other => throw new IllegalArgumentException(
        s"$fn: $arg must be a constant int, got $other")
    }

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
