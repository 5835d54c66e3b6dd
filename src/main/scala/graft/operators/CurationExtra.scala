package graft.operators

import graft.{NamedQuery, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Round-6 curation wave — three corpus-hygiene signals a training-data
  * pipeline runs before mixing: boilerplate density (how much of each
  * document is corpus-common template text), duplicated-prefix clusters
  * (crawl mirrors and templated pages share openings long before they
  * share whole documents), and the vocabulary growth curve (Heaps-law
  * diagnostics — is the corpus still contributing new types, or only
  * repeating itself?). All three reduce the corpus to digest- or
  * word-grid-sized frames before any shuffle; every output is an exact
  * integer (ratios in ppm via integer DIV). */
object CurationExtra {

  /** Same 12-word segmentation contract as Dedup.lineDedup (SegWords) so
    * the two signals stay comparable: a segment flagged boilerplate here
    * is exactly one lineDedup would collapse. */
  val BoilerMinDf = 3

  // -------------------------------------------------------------- q_boilerplate
  /** Per-document boilerplate density: a segment is boilerplate when it
    * appears in ≥ BoilerMinDf DISTINCT documents (doc-frequency, not
    * the first-occurrence winner election of q_line_dedup — a document
    * repeating its own segment is not boilerplate by this measure).
    * Emits per doc: segment count, boilerplate-segment count, density
    * in ppm (integer DIV — exact).
    *
    * Scale shape: documents segment row-locally; the doc-frequency
    * frame groups by the 16-byte segment digest (digest + doc_id is all
    * that shuffles, never text); flagged digests broadcast back onto
    * the segment stream. At 100 TB the digest frame is the corpus'
    * distinct-segment count — the same frame incremental dedup already
    * carries. */
  private def boilerplate(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val segWords = Dedup.SegWords
    val segs = Tables.documents(s, dir)
      .select($"doc_id", split($"text", " ", -1).as("__words"))
      .select($"doc_id",
        posexplode(sequence(lit(0),
          expr(s"(size(__words) - 1) div $segWords"))).as(Seq("__i", "__s")),
        $"__words")
      .select($"doc_id",
        md5(concat_ws(" ",
          slice($"__words", $"__s" * segWords + 1, lit(segWords)))).as("seg_md5"))
    val boilerDigests = segs.groupBy($"seg_md5")
      .agg(countDistinct($"doc_id").as("df"))
      .filter($"df" >= BoilerMinDf)
      .select($"seg_md5", lit(1L).as("is_boiler"))
    segs.join(broadcast(boilerDigests), Seq("seg_md5"), "left")
      .groupBy($"doc_id")
      .agg(count(lit(1)).as("n_segs"),
        coalesce(sum($"is_boiler"), lit(0L)).as("n_boiler"))
      .withColumn("boiler_ppm", expr("n_boiler * 1000000 DIV n_segs"))
      .orderBy($"doc_id")
  }

  private val boilerplateSql = {
    val sw = Dedup.SegWords
    s"""WITH w AS (SELECT doc_id, string_split(text, ' ') AS words
      |  FROM documents),
      |segs AS (
      |  SELECT doc_id,
      |    md5(array_to_string(words[i * $sw + 1 : i * $sw + $sw], ' '))
      |      AS seg_md5
      |  FROM w, unnest(generate_series(0, (len(words) - 1) // $sw)) t(i)),
      |boiler AS (
      |  SELECT seg_md5 FROM segs GROUP BY seg_md5
      |  HAVING COUNT(DISTINCT doc_id) >= $BoilerMinDf)
      |SELECT doc_id, COUNT(*) AS n_segs,
      |  CAST(SUM(CASE WHEN seg_md5 IN (SELECT seg_md5 FROM boiler)
      |    THEN 1 ELSE 0 END) AS BIGINT) AS n_boiler,
      |  CAST(SUM(CASE WHEN seg_md5 IN (SELECT seg_md5 FROM boiler)
      |    THEN 1 ELSE 0 END) * 1000000
      |    // COUNT(*) AS BIGINT) AS boiler_ppm
      |FROM segs
      |GROUP BY doc_id
      |ORDER BY doc_id""".stripMargin
  }

  // --------------------------------------------------------------- q_prefix_dup
  /** Duplicated-prefix clusters: documents sharing their first
    * PrefixWords words — the cheap leading indicator for mirrors and
    * templated pages (full near-dup needs MinHash; a shared opening
    * needs one digest). Emits each cluster (prefix digest, member
    * count, smallest doc_id as the representative, total chars at
    * stake); singleton prefixes drop. One digest-keyed aggregation —
    * text never shuffles. */
  val PrefixWords = 8

  private def prefixDup(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.documents(s, dir)
      .select($"doc_id", $"n_chars",
        md5(concat_ws(" ",
          slice(split($"text", " ", -1), 1, PrefixWords))).as("prefix_md5"))
      .groupBy($"prefix_md5")
      .agg(count(lit(1)).as("n_docs"),
        min($"doc_id").as("rep_doc"),
        sum($"n_chars").as("total_chars"))
      .filter($"n_docs" >= 2)
      .orderBy($"n_docs".desc, $"prefix_md5")
  }

  private val prefixDupSql =
    s"""SELECT md5(array_to_string(string_split(text, ' ')[1:$PrefixWords], ' '))
      |    AS prefix_md5,
      |  COUNT(*) AS n_docs, MIN(doc_id) AS rep_doc,
      |  CAST(SUM(n_chars) AS BIGINT) AS total_chars
      |FROM documents
      |GROUP BY 1 HAVING COUNT(*) >= 2
      |ORDER BY n_docs DESC, prefix_md5""".stripMargin

  // -------------------------------------------------------------- q_vocab_growth
  // audited-global-window(q_vocab_growth): frame = <=10-row decile frame cumulative — bound audited in PlanAuditSpec/UnpartitionedWindowAudit
  // audited-bnlj(q_vocab_growth): build side = 1-row global-aggregate broadcast — audited in PlanAuditSpec/BnljAudit
  /** Vocabulary growth curve (Heaps-law diagnostic): sweep the corpus
    * in doc_id order, bucket into deciles, and count the NEW BIGRAM
    * types each decile contributes — a flattening curve says the tail
    * of the corpus repeats the head's phrasing (and dedup/mixing should
    * favor it less). Bigrams rather than unigrams because a closed
    * unigram vocabulary saturates immediately (it does on this fixture:
    * all ~31 words land in decile 0) while type growth lives in the
    * combinations. First occurrence is min(doc_id) per bigram; the
    * decile histogram and its cumulative sum run on a ≤10-row frame.
    * One corpus-scale aggregation (bigram → min doc), everything after
    * is grid-sized. */
  private def vocabGrowth(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val docs = Tables.documents(s, dir)
    val nDocs = docs.agg(count(lit(1)).as("n_docs"))
    val firstSeen = docs
      .select($"doc_id", split($"text", " ", -1).as("__w"))
      // A <2-word doc has no bigrams. Without this guard Spark's
      // sequence(1, 0) yields a DESCENDING [1, 0] (null rows via
      // out-of-bounds __w[i]) while the oracle's generate_series(1, 0)
      // is empty — a degenerate doc would flip the row count.
      .filter(size($"__w") >= 2)
      .select($"doc_id", explode(expr(
        "transform(sequence(1, size(__w) - 1)," +
          " i -> concat(__w[i - 1], ' ', __w[i]))")).as("bigram"))
      .groupBy($"bigram").agg(min($"doc_id").as("first_doc"))
    val byBucket = firstSeen.crossJoin(broadcast(nDocs))
      .select(expr("first_doc * 10 DIV n_docs").as("decile"))
      .groupBy($"decile").agg(count(lit(1)).as("new_types"))
    byBucket
      .withColumn("cum_types",
        sum($"new_types").over(
          Window.orderBy($"decile")
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .orderBy($"decile")
  }

  private val vocabGrowthSql =
    """WITH n AS (SELECT COUNT(*) AS n_docs FROM documents),
      |w AS (SELECT doc_id, string_split(text, ' ') AS words FROM documents),
      |fs AS (
      |  SELECT bigram, MIN(doc_id) AS first_doc
      |  FROM (SELECT doc_id, words[i] || ' ' || words[i + 1] AS bigram
      |        FROM w, unnest(generate_series(1, len(words) - 1)) t(i))
      |  GROUP BY bigram),
      |b AS (
      |  SELECT first_doc * 10 // n_docs AS decile, COUNT(*) AS new_types
      |  FROM fs CROSS JOIN n GROUP BY 1)
      |SELECT decile, new_types,
      |  CAST(SUM(new_types) OVER (ORDER BY decile
      |    ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_types
      |FROM b ORDER BY decile""".stripMargin

  // ----------------------------------------------------------- q_dedup_by_source
  /** Per-source duplication dashboard: for each ingest source, the
    * exact-duplicate rate (full-text digest) and the shared-prefix rate
    * (the q_prefix_dup digest) in exact ppm — which feeds are mirroring
    * which, before any cross-source dedup spends a shuffle on them.
    * Two digest aggregations per source; text never shuffles. */
  private def dedupBySource(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.documents(s, dir)
      .select($"source", md5($"text").as("text_md5"),
        md5(concat_ws(" ",
          slice(split($"text", " ", -1), 1, PrefixWords))).as("prefix_md5"))
      .groupBy($"source")
      .agg(count(lit(1)).as("n_docs"),
        countDistinct($"text_md5").as("n_unique"),
        countDistinct($"prefix_md5").as("n_unique_prefix"))
      .select($"source", $"n_docs", $"n_unique",
        expr("(n_docs - n_unique) * 1000000 DIV n_docs").as("exact_dup_ppm"),
        expr("(n_docs - n_unique_prefix) * 1000000 DIV n_docs")
          .as("prefix_dup_ppm"))
      .orderBy($"source")
  }

  private val dedupBySourceSql =
    s"""SELECT source, COUNT(*) AS n_docs,
      |  COUNT(DISTINCT md5(text)) AS n_unique,
      |  CAST((COUNT(*) - COUNT(DISTINCT md5(text))) * 1000000
      |    // COUNT(*) AS BIGINT) AS exact_dup_ppm,
      |  CAST((COUNT(*) - COUNT(DISTINCT
      |      md5(array_to_string(string_split(text, ' ')[1:$PrefixWords], ' '))))
      |    * 1000000 // COUNT(*) AS BIGINT) AS prefix_dup_ppm
      |FROM documents
      |GROUP BY source
      |ORDER BY source""".stripMargin

  val all: Seq[NamedQuery] = Seq(
    NamedQuery("q_dedup_by_source", dedupBySource, Some(dedupBySourceSql),
      bench = true),
    NamedQuery("q_boilerplate", boilerplate, Some(boilerplateSql), bench = true),
    NamedQuery("q_prefix_dup", prefixDup, Some(prefixDupSql), bench = true),
    NamedQuery("q_vocab_growth", vocabGrowth, Some(vocabGrowthSql), bench = true))
}
