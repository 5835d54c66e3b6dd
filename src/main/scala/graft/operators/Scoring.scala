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
  // audited-bnlj(q_lm_surprisal): build side = 1-row global-aggregate broadcast — audited in PlanAuditSpec/BnljAudit
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

  // ---------------------------------------------------------- q_dsir_weights
  // audited-bnlj(q_dsir_weights): build side = 1-row global-aggregate broadcast — audited in PlanAuditSpec/BnljAudit
  /** DSIR-style importance weights for data selection (Xie et al. 2023):
    * score every document by how much its hashed-bigram feature
    * distribution looks like a TARGET domain versus the RAW corpus —
    * the signal used to up-sample target-like web data into a training
    * mix. Target here = the lexicographically first `source` (a real
    * deployment passes a curated reference corpus; the dataflow is
    * identical).
    *
    * Exactness: the per-feature log-likelihood ratio is quantized to
    * integer bits — `floor(log2(cnt_target + 1)) − floor(log2(cnt_raw
    * + 1))` via binary-string length — so per-doc sums are
    * partitioning-invariant integers (the q_lm_surprisal recipe).
    * Features are md5-bucketed bigrams (10k buckets), replayable by any
    * engine from the text alone.
    *
    * Scale shape: the bucket-stats frame is FIXED SIZE (10k rows) no
    * matter the corpus — aggregated with map-side partials, broadcast
    * back; the corpus-side explode never shuffles by feature. */
  val DsirBuckets = 10000

  private def dsirWeights(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val docs = Tables.documents(s, dir)
    val bigrams = docs
      .select($"doc_id", $"source",
        expr(s"regexp_extract_all(lower(text), '$WordPat', 0)").as("ws"))
      .select($"doc_id", $"source",
        explode(expr(
          """transform(slice(ws, 1, greatest(size(ws) - 1, 0)),
            |  (x, i) -> concat(x, ' ', element_at(ws, i + 2)))""".stripMargin))
          .as("bg"))
      .select($"doc_id", $"source",
        (graft.functions.TextFunctions.md5Lower64($"bg")
          .bitwiseAND(lit(Long.MaxValue)) % DsirBuckets).as("bucket"))
    val target = docs.agg(min($"source").as("target_source"))
    val stats = bigrams.crossJoin(broadcast(target))
      .groupBy($"bucket")
      .agg(
        sum(when($"source" === $"target_source", 1L).otherwise(0L)).as("cnt_t"),
        count(lit(1)).as("cnt_r"))
      .select($"bucket",
        ((length(bin($"cnt_t" + 1)) - 1) - (length(bin($"cnt_r" + 1)) - 1))
          .cast("long").as("ratio_bits"))
    bigrams.join(broadcast(stats), Seq("bucket"))
      .groupBy($"doc_id")
      .agg(count(lit(1)).as("n_bigrams"), sum($"ratio_bits").as("dsir_bits"))
      .select($"doc_id", $"n_bigrams", $"dsir_bits",
        expr("dsir_bits * 1000 DIV n_bigrams").as("mean_millibits"))
      .orderBy($"doc_id")
  }

  private val dsirWeightsSql =
    s"""WITH w AS (
       |  SELECT doc_id, source,
       |    regexp_extract_all(lower(text), '$WordPat') AS ws
       |  FROM documents),
       |bg AS (
       |  SELECT doc_id, source,
       |    unnest(list_transform(ws[1:len(ws)-1], (x, i) -> x || ' ' || ws[i+1]))
       |      AS bg
       |  FROM w WHERE len(ws) >= 2),
       |bk AS (
       |  SELECT doc_id, source,
       |    CAST((md5_number_lower(bg) & ${Long.MaxValue}::UBIGINT) % $DsirBuckets
       |      AS BIGINT) AS bucket
       |  FROM bg),
       |t AS (SELECT min(source) AS target_source FROM documents),
       |st AS (
       |  SELECT bucket,
       |    CAST(length(printf('%b', CAST(
       |      SUM(CASE WHEN source = t.target_source THEN 1 ELSE 0 END) + 1
       |      AS BIGINT))) - 1 AS BIGINT)
       |    - CAST(length(printf('%b', CAST(COUNT(*) + 1 AS BIGINT))) - 1
       |      AS BIGINT) AS ratio_bits
       |  FROM bk, t GROUP BY bucket, t.target_source)
       |SELECT bk.doc_id, COUNT(*) AS n_bigrams,
       |  CAST(SUM(st.ratio_bits) AS BIGINT) AS dsir_bits,
       |  CAST(SUM(st.ratio_bits) AS BIGINT) * 1000 // COUNT(*) AS mean_millibits
       |FROM bk JOIN st USING (bucket)
       |GROUP BY bk.doc_id ORDER BY bk.doc_id""".stripMargin

  // ------------------------------------------------------ q_target_encoding
  /** Leave-one-out target encoding — the feature-engineering transform
    * for categoricals in tabular ML: each user's market segment is
    * encoded as the purchase rate of the OTHER users in that segment
    * ((Σy − y_u) ppm DIV (n − 1)), which avoids the self-leakage plain
    * mean encoding suffers. Outcome y = "user made ≥1 purchase event";
    * category = the customer dimension's mktsegment. Exact integer ppm
    * throughout; NULL when a segment has one user (DIV by NULLIF 0).
    *
    * Scale shape: one events aggregation to user grain (map-side
    * partials), one broadcast dim join, one segment-sized aggregation
    * broadcast back — users never shuffle twice, the segment frame is
    * roster-sized. */
  private def targetEncoding(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val users = Tables.events(s, dir)
      .groupBy($"user_id")
      .agg(max(($"event_type" === "purchase").cast("long")).as("y"))
      .join(broadcast(Tables.customer(s, dir)
        .select($"c_custkey".as("user_id"), $"c_mktsegment".as("segment"))),
        Seq("user_id"))
    val seg = users.groupBy($"segment")
      .agg(count(lit(1)).as("n_seg"), sum($"y").as("sum_y"))
    users.join(broadcast(seg), Seq("segment"))
      .select($"user_id", $"segment", $"y",
        expr("(sum_y - y) * 1000000 DIV NULLIF(n_seg - 1, 0)").as("loo_ppm"))
      .orderBy($"user_id")
  }

  private val targetEncodingSql =
    """WITH users AS (
      |  SELECT e.user_id,
      |    CAST(MAX(CASE WHEN e.event_type = 'purchase' THEN 1 ELSE 0 END)
      |      AS BIGINT) AS y,
      |    ANY_VALUE(c.c_mktsegment) AS segment
      |  FROM events e JOIN customer c ON e.user_id = c.c_custkey
      |  GROUP BY e.user_id),
      |seg AS (
      |  SELECT segment, COUNT(*) AS n_seg, CAST(SUM(y) AS BIGINT) AS sum_y
      |  FROM users GROUP BY segment)
      |SELECT u.user_id, u.segment, u.y,
      |  (s.sum_y - u.y) * 1000000 // NULLIF(s.n_seg - 1, 0) AS loo_ppm
      |FROM users u JOIN seg s USING (segment)
      |ORDER BY u.user_id""".stripMargin

  // ------------------------------------------------- q_compress_ratio
  /** Compressibility-based selection signal (the Gopher pipeline's
    * "compression-ratio" filter): per-document deflate(text)/bytes in
    * ppm via the native `graft_deflate_len` expression, rolled up per
    * source with low-tail (boilerplate/repetition, < 20%) and
    * high-tail (entropy noise, > 90%) counts — the two tails a
    * curation pass drops.
    *
    * No DuckDB twin exists for zlib, so this is a rows-only driver row;
    * CompressSpec pins the semantics (monotonicity on repetition vs
    * noise, exact agreement with driver-side java.util.zip, SQL-path
    * parity through the registered function).
    *
    * Scale shape: the deflate pass is row-local inside whole-stage
    * codegen (one static call per row, thread-local Deflater); the
    * rollup is one keyed aggregation over the source vocabulary. */
  val CompressLowPpm = 200000L
  val CompressHighPpm = 900000L

  private def compressRatio(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.documents(s, dir)
      .select($"source",
        graft.functions.CompressFunctions.deflateLen($"text").as("dlen"),
        octet_length($"text").cast("long").as("nbytes"))
      .selectExpr("source",
        "dlen * 1000000 DIV greatest(nbytes, 1L) AS ratio_ppm")
      .groupBy($"source")
      .agg(count(lit(1)).as("n_docs"),
        expr("sum(ratio_ppm) DIV count(1)").as("mean_ratio_ppm"),
        min($"ratio_ppm").as("min_ratio_ppm"),
        max($"ratio_ppm").as("max_ratio_ppm"),
        sum(($"ratio_ppm" < CompressLowPpm).cast("long")).as("n_low"),
        sum(($"ratio_ppm" > CompressHighPpm).cast("long")).as("n_high"))
      .orderBy($"source")
  }

  val all: Seq[NamedQuery] = Seq(
    NamedQuery("q_compress_ratio", compressRatio, None, bench = true),
    NamedQuery("q_target_encoding", targetEncoding, Some(targetEncodingSql),
      bench = true),
    NamedQuery("q_lm_surprisal", lmSurprisal, Some(lmSurprisalSql),
      bench = true),
    NamedQuery("q_dsir_weights", dsirWeights, Some(dsirWeightsSql),
      bench = true))
}
