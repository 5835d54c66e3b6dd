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
    * No DuckDB twin exists for zlib, so the oracle PINS the measured
    * 20-row per-source rollup per shipped fixture — the LAST remaining
    * pinned-measurement oracle (the `q_ann_*_recall10` rows that shared
    * this pattern became full independent DuckDB replays of their
    * splitmix64 kernels in round 10; zlib admits no such replay):
    * level-6 raw
    * Deflater output lengths are deterministic for fixed inputs within
    * a JVM build, so the rollup is measured once per fixture, then
    * frozen — any drift in the expression, the ratio arithmetic, or
    * the tail thresholds lands as a hash-mismatched CORRECTNESS row.
    * Pins are keyed on (row count, total text bytes) — a CONTENT
    * fingerprint, not bare count, because the shipped sf0.001 and
    * sf0.01 fixtures both have 500 documents with different text; an
    * unrecognized fixture yields all-NULL measure columns → a LOUD
    * hash fail, never a silent pass. Recalibration (new fixture or JVM
    * whose zlib changes the level-6 length): run
    * `graft.Verify <sfDir> <out> q_compress_ratio`, paste the rollup
    * into `compressPins` under the new fingerprint (CompressSpec's
    * pin-coverage test fails until every shipped fixture is covered).
    * CompressSpec additionally pins the expression bit-exact against
    * driver-side java.util.zip, so a zlib change is caught in-suite.
    *
    * Scale shape: the deflate pass is row-local inside whole-stage
    * codegen (one static call per row, thread-local Deflater); the
    * rollup is one keyed aggregation over the source vocabulary. */
  val CompressLowPpm = 200000L
  val CompressHighPpm = 900000L

  /** Measured per-source rollups, keyed on the documents-table content
    * fingerprint (row count, SUM(byte length of text)) of each shipped
    * fixture. Tuple = (source, n_docs, mean/min/max ratio_ppm, n_low,
    * n_high). See the q_compress_ratio scaladoc for the recalibration
    * procedure. */
  val compressPins: Map[(Long, Long), Seq[(String, Long, Long, Long, Long, Long, Long)]] = Map(
    (500L, 153156L) -> Seq( // sf0.001
      ("src0", 25L, 515020L, 411255L, 931034L, 0L, 1L),
      ("src1", 25L, 526350L, 379576L, 915254L, 0L, 1L),
      ("src10", 25L, 544098L, 401851L, 962264L, 0L, 1L),
      ("src11", 25L, 521537L, 401129L, 903225L, 0L, 1L),
      ("src12", 25L, 501267L, 391891L, 820512L, 0L, 0L),
      ("src13", 25L, 558675L, 418947L, 896551L, 0L, 0L),
      ("src14", 25L, 496866L, 397727L, 840000L, 0L, 0L),
      ("src15", 25L, 527086L, 423963L, 865671L, 0L, 0L),
      ("src16", 25L, 524550L, 402061L, 888888L, 0L, 0L),
      ("src17", 25L, 543898L, 399621L, 866666L, 0L, 0L),
      ("src18", 25L, 536951L, 398876L, 734177L, 0L, 0L),
      ("src19", 25L, 501799L, 413934L, 642335L, 0L, 0L),
      ("src2", 25L, 566673L, 394941L, 1000000L, 0L, 2L),
      ("src3", 25L, 494794L, 399641L, 698529L, 0L, 0L),
      ("src4", 25L, 532718L, 401941L, 769230L, 0L, 0L),
      ("src5", 25L, 542644L, 402646L, 903225L, 0L, 1L),
      ("src6", 25L, 501284L, 396678L, 687500L, 0L, 0L),
      ("src7", 25L, 579899L, 415860L, 962962L, 0L, 1L),
      ("src8", 25L, 478928L, 402173L, 672727L, 0L, 0L),
      ("src9", 25L, 539793L, 401247L, 863636L, 0L, 0L)),
    (500L, 149174L) -> Seq( // sf0.01
      ("src0", 25L, 503567L, 405063L, 671641L, 0L, 0L),
      ("src1", 25L, 488655L, 402214L, 717647L, 0L, 0L),
      ("src10", 25L, 537383L, 403773L, 907407L, 0L, 1L),
      ("src11", 25L, 492415L, 404624L, 696428L, 0L, 0L),
      ("src12", 25L, 544731L, 404850L, 888888L, 0L, 0L),
      ("src13", 25L, 496845L, 411530L, 689655L, 0L, 0L),
      ("src14", 25L, 538537L, 408080L, 840579L, 0L, 0L),
      ("src15", 25L, 541911L, 394572L, 898305L, 0L, 0L),
      ("src16", 25L, 548835L, 398907L, 870967L, 0L, 0L),
      ("src17", 25L, 511394L, 406130L, 758241L, 0L, 0L),
      ("src18", 25L, 524149L, 404942L, 864406L, 0L, 0L),
      ("src19", 25L, 571203L, 395711L, 912280L, 0L, 1L),
      ("src2", 25L, 517919L, 386407L, 802469L, 0L, 0L),
      ("src3", 25L, 525721L, 400379L, 772727L, 0L, 0L),
      ("src4", 25L, 534710L, 386915L, 782608L, 0L, 0L),
      ("src5", 25L, 540147L, 407920L, 880597L, 0L, 0L),
      ("src6", 25L, 552496L, 390243L, 873015L, 0L, 0L),
      ("src7", 25L, 501904L, 412474L, 712871L, 0L, 0L),
      ("src8", 25L, 552156L, 414893L, 762886L, 0L, 0L),
      ("src9", 25L, 508504L, 409683L, 842105L, 0L, 0L)),
    (5000L, 1485576L) -> Seq( // sf0.1
      ("src0", 250L, 535168L, 389799L, 933333L, 0L, 2L),
      ("src1", 250L, 526347L, 388888L, 932203L, 0L, 3L),
      ("src10", 250L, 527539L, 392430L, 923076L, 0L, 2L),
      ("src11", 250L, 537710L, 396709L, 962264L, 0L, 3L),
      ("src12", 250L, 523598L, 388888L, 919354L, 0L, 2L),
      ("src13", 250L, 515525L, 388297L, 960000L, 0L, 2L),
      ("src14", 250L, 539067L, 370642L, 943396L, 0L, 3L),
      ("src15", 250L, 539416L, 390018L, 913793L, 0L, 1L),
      ("src16", 250L, 530260L, 390510L, 929824L, 0L, 1L),
      ("src17", 250L, 524092L, 392660L, 945454L, 0L, 1L),
      ("src18", 250L, 542951L, 388888L, 958333L, 0L, 4L),
      ("src19", 250L, 530818L, 391120L, 931034L, 0L, 2L),
      ("src2", 250L, 530716L, 388086L, 943396L, 0L, 4L),
      ("src3", 250L, 536105L, 383673L, 944444L, 0L, 4L),
      ("src4", 250L, 533920L, 379188L, 1000000L, 0L, 3L),
      ("src5", 250L, 517491L, 386524L, 962264L, 0L, 4L),
      ("src6", 250L, 527774L, 395644L, 921568L, 0L, 1L),
      ("src7", 250L, 545048L, 380333L, 958333L, 0L, 1L),
      ("src8", 250L, 511090L, 393559L, 927272L, 0L, 1L),
      ("src9", 250L, 539108L, 387523L, 913793L, 0L, 3L)))

  /** Pinned-measurement oracle: the per-source row axis comes live from
    * the documents table (DISTINCT source), the measure columns from
    * the pin row whose (count, total bytes) fingerprint matches — an
    * unrecognized fixture left-joins to NULLs and hash-fails loudly.
    * DuckDB `strlen(VARCHAR)` is byte length, = Spark `octet_length`. */
  private val compressRatioSql: String = {
    val values = compressPins.toSeq.sortBy(_._1).flatMap {
      case ((n, tb), rows) => rows.map { case (s, nd, mean, mn, mx, lo, hi) =>
        s"($n, $tb, '$s', $nd, $mean, $mn, $mx, $lo, $hi)"
      }
    }.mkString(",\n  ")
    s"""WITH k AS (SELECT count(*) AS n,
       |    CAST(SUM(strlen(text)) AS BIGINT) AS tb FROM documents),
       |pin AS (SELECT * FROM (VALUES
       |  $values)
       |  v(n, tb, source, n_docs, mean_ratio_ppm, min_ratio_ppm,
       |    max_ratio_ppm, n_low, n_high)),
       |src AS (SELECT DISTINCT source FROM documents)
       |SELECT src.source,
       |  CAST(p.n_docs AS BIGINT) AS n_docs,
       |  CAST(p.mean_ratio_ppm AS BIGINT) AS mean_ratio_ppm,
       |  CAST(p.min_ratio_ppm AS BIGINT) AS min_ratio_ppm,
       |  CAST(p.max_ratio_ppm AS BIGINT) AS max_ratio_ppm,
       |  CAST(p.n_low AS BIGINT) AS n_low,
       |  CAST(p.n_high AS BIGINT) AS n_high
       |FROM src
       |LEFT JOIN (SELECT pin.* FROM pin, k
       |           WHERE pin.n = k.n AND pin.tb = k.tb) p
       |  ON p.source = src.source
       |ORDER BY src.source""".stripMargin
  }

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
    NamedQuery("q_compress_ratio", compressRatio, Some(compressRatioSql),
      bench = true),
    NamedQuery("q_target_encoding", targetEncoding, Some(targetEncodingSql),
      bench = true),
    NamedQuery("q_lm_surprisal", lmSurprisal, Some(lmSurprisalSql),
      bench = true),
    NamedQuery("q_dsir_weights", dsirWeights, Some(dsirWeightsSql),
      bench = true))
}
