package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.{NamedQuery, Tables}

/** Corpus term-weighting family (round 10) — the two classical
  * term-statistics screens the text-analysis layer (TextAnalysis: BM25,
  * collocations, rare terms) still lacked: per-document TF-IDF term
  * ranking (the retrieval/keyword-extraction primitive BM25 generalizes)
  * and the global Zipf rank-frequency diagnostic (the sanity check that
  * a corpus' term distribution has the long tail dedup/quality scoring
  * assume).
  *
  * Exactness: no logs — idf is the integer milli inverse document
  * frequency n_docs·1000 DIV df: a self-defined deterministic integer
  * variant of TF-IDF, not the classical statistic. The idf factor is
  * monotone in ln(N/df), so the PER-TERM idf ordering matches the
  * classical one, but a monotone transform of one factor does not
  * preserve tf·idf PRODUCT rankings — top-k terms can legitimately
  * differ from classical TF-IDF. What the oracle pins is this exact
  * integer definition, bit-for-bit. The Zipf screen reports the
  * raw rank·freq products rather than a fitted log-log slope. Every
  * column is BIGINT; ties break on term ASC in both engines.
  *
  * Scale shape: tf is one (doc, term)-keyed aggregation of the token
  * stream; df rides tf's term key (one more keyed agg — never a
  * COUNT(DISTINCT) over raw tokens); the doc count is a 1-row broadcast
  * (q_filter_funnel shape); per-doc top-3 is a doc-partitioned window.
  * The Zipf frame is TakeOrderedAndProject top-20 — the only global
  * window runs AFTER the LIMIT, over exactly 20 rows. */
object TextMining {

  /** Whitespace token stream (the q_token_count convention). */
  private def toks(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.documents(s, dir)
      .select($"doc_id", explode(split($"text", " ", -1)).as("term"))
  }

  // ------------------------------------------------------------- q_tfidf
  /** Top-3 TF-IDF terms per document: tf = in-doc term count, df = #docs
    * containing the term, idf_milli = n_docs·1000 DIV df, score =
    * tf·idf_milli. Rank ties break to the lexicographically first term.
    *
    * df is a term-PARTITIONED window count over the tf frame, not a
    * groupBy+join back: the join spelling made Catalyst column-prune the
    * df branch into a second full tokenize (two Generates, two scans of
    * the text — exchange reuse needs canonically identical subtrees and
    * pruning had diverged them). The window spelling explodes the token
    * stream ONCE: shuffle (doc_id, term) → shuffle (term) → shuffle
    * (doc_id), each over the aggregated tf frame, never raw tokens
    * twice. */
  private def tfidf(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val tf = toks(s, dir).groupBy($"doc_id", $"term")
      .agg(count(lit(1)).as("tf"))
      .withColumn("df", count(lit(1)).over(Window.partitionBy($"term")))
    val n = Tables.documents(s, dir).agg(count(lit(1)).as("n_docs"))
    // audited-bnlj(q_tfidf): 1-row global doc-count broadcast
    val scored = tf.crossJoin(broadcast(n))
      .withColumn("tfidf_milli", expr("tf * (n_docs * 1000 DIV df)"))
    val w = Window.partitionBy($"doc_id")
      .orderBy($"tfidf_milli".desc, $"term")
    scored.withColumn("rnk", row_number().over(w))
      .filter($"rnk" <= 3)
      .select($"doc_id", $"rnk", $"term", $"tf", $"df", $"tfidf_milli")
      .orderBy($"doc_id", $"rnk")
  }

  private val tfidfSql =
    """WITH toks AS (
      |  SELECT doc_id, unnest(string_split(text, ' ')) AS term
      |  FROM documents),
      |t AS (SELECT doc_id, term, COUNT(*) AS tf FROM toks GROUP BY 1, 2),
      |d AS (SELECT term, COUNT(*) AS df FROM t GROUP BY term),
      |n AS (SELECT COUNT(*) AS n_docs FROM documents),
      |s AS (
      |  SELECT t.doc_id, t.term, t.tf, d.df,
      |    t.tf * (n.n_docs * 1000 // d.df) AS tfidf_milli
      |  FROM t JOIN d USING (term) CROSS JOIN n),
      |r AS (
      |  SELECT *, ROW_NUMBER() OVER (
      |    PARTITION BY doc_id ORDER BY tfidf_milli DESC, term) AS rnk
      |  FROM s)
      |SELECT doc_id, rnk, term, tf, df, tfidf_milli
      |FROM r WHERE rnk <= 3 ORDER BY doc_id, rnk""".stripMargin

  // -------------------------------------------------------------- q_zipf
  /** Zipf rank-frequency head: the 20 most frequent terms with their
    * rank, the rank·freq product (constant under an ideal Zipf law —
    * the diagnostic, reported raw instead of as a fitted log-log slope
    * so it stays integer-exact), and each frequency as ppm of the top
    * term's. Top-20 is TakeOrderedAndProject (no global sort); the
    * ranking window runs over the 20 surviving rows only. */
  private def zipf(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val t20 = toks(s, dir).groupBy($"term")
      .agg(count(lit(1)).as("freq"))
      .orderBy($"freq".desc, $"term")
      .limit(20)
    // audited-global-window(q_zipf): frame = 20-row top-k frame after LIMIT
    val w = Window.orderBy($"freq".desc, $"term")
    t20.withColumn("rnk", row_number().over(w))
      .withColumn("top_freq", max($"freq").over(
        w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)))
      .selectExpr("rnk", "term", "freq", "rnk * freq AS rank_x_freq",
        "freq * 1000000 DIV top_freq AS ppm_of_top")
      .orderBy($"rnk")
  }

  private val zipfSql =
    """WITH toks AS (
      |  SELECT unnest(string_split(text, ' ')) AS term FROM documents),
      |c AS (SELECT term, COUNT(*) AS freq FROM toks GROUP BY term),
      |t20 AS (SELECT term, freq FROM c ORDER BY freq DESC, term LIMIT 20)
      |SELECT ROW_NUMBER() OVER (ORDER BY freq DESC, term) AS rnk,
      |  term, freq,
      |  ROW_NUMBER() OVER (ORDER BY freq DESC, term) * freq AS rank_x_freq,
      |  freq * 1000000 // MAX(freq) OVER () AS ppm_of_top
      |FROM t20 ORDER BY rnk""".stripMargin

  val all: Seq[NamedQuery] = Seq(
    NamedQuery("q_tfidf", tfidf, Some(tfidfSql), bench = true),
    NamedQuery("q_zipf", zipf, Some(zipfSql), bench = true))
}
