package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.{NamedQuery, Tables}

/** Statistical-LM quality scoring — the CCNet/Gopher-style signal that
  * ranks documents by how "language-like" they are under an n-gram
  * language model. A document whose tokens are all common words scores
  * low surprisal; gibberish and boilerplate score high; the score feeds
  * the quality-cutoff filter the corpus funnel already has.
  *
  * Exactness design: the usual formulation (sum of float log-probs) is
  * merge-order-dependent and engine-divergent. Here the per-token
  * surprisal is QUANTIZED TO INTEGER BITS — `floor(log2((N + V) /
  * (cnt + 1)))`, the bit length of the add-one-smoothed inverse
  * probability, computed via integer division + binary-string length in
  * BOTH engines — so every sum/mean downstream is integer-exact on any
  * partitioning. The quantization is principled (surprisal in whole
  * bits, the unit information theory uses) and loses nothing for
  * filtering, which compares documents at whole-point granularity.
  *
  * Scale shape: one token-frequency aggregation over the corpus (the
  * shuffle is O(vocab) after map-side partial aggregation, not
  * O(tokens)); the vocabulary of a natural-language corpus is
  * millions of rows / tens of MB even at 100 TB — it is explicitly
  * `broadcast()` back, so the corpus-side explode never shuffles by
  * word; the final per-doc mean pre-aggregates map-side because
  * exploded tokens of one doc are partition-contiguous.
  *
  * Trained-on == scored-on here (self-surprisal); production would
  * train counts on a clean reference corpus and broadcast the same
  * (word, bits) frame — the dataflow is identical. */
object Scoring {

  /** Lowercase alphabetic word tokens — deliberately the simplest
    * cross-engine-identical tokenizer. */
  val WordPat = "[a-z]+"

  // ---------------------------------------------------------- q_lm_surprisal
  private def lmSurprisal(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val docs = Tables.documents(s, dir)
    val words = docs.select($"doc_id",
      explode(expr(s"regexp_extract_all(lower(text), '$WordPat', 0)"))
        .as("word"))
    val vocab = words.groupBy($"word").agg(count(lit(1)).as("cnt"))
    val totals = vocab.agg(
      sum($"cnt").as("n_total"), count(lit(1)).as("n_vocab"))
    val scored = vocab.crossJoin(broadcast(totals))
      .select($"word",
        (length(bin(expr("(n_total + n_vocab) DIV (cnt + 1)"))) - 1)
          .cast("long").as("bits"))
    words.join(broadcast(scored), Seq("word"))
      .groupBy($"doc_id")
      .agg(count(lit(1)).as("n_tokens"), sum($"bits").as("total_bits"))
      .select($"doc_id", $"n_tokens", $"total_bits",
        expr("total_bits * 1000 DIV n_tokens").as("mean_millibits"))
      .orderBy($"doc_id")
  }

  private val lmSurprisalSql =
    s"""WITH w AS (
       |  SELECT doc_id, unnest(regexp_extract_all(lower(text), '$WordPat')) AS word
       |  FROM documents),
       |v AS (SELECT word, COUNT(*) AS cnt FROM w GROUP BY word),
       |t AS (SELECT SUM(cnt) AS n_total, COUNT(*) AS n_vocab FROM v),
       |b AS (
       |  SELECT word,
       |    CAST(length(printf('%b',
       |      (CAST(t.n_total AS BIGINT) + t.n_vocab) // (cnt + 1))) - 1
       |      AS BIGINT) AS bits
       |  FROM v, t)
       |SELECT w.doc_id, COUNT(*) AS n_tokens,
       |  CAST(SUM(b.bits) AS BIGINT) AS total_bits,
       |  CAST(SUM(b.bits) AS BIGINT) * 1000 // COUNT(*) AS mean_millibits
       |FROM w JOIN b USING (word)
       |GROUP BY w.doc_id ORDER BY w.doc_id""".stripMargin

  val all: Seq[NamedQuery] = Seq(
    NamedQuery("q_lm_surprisal", lmSurprisal, Some(lmSurprisalSql),
      bench = true))
}
