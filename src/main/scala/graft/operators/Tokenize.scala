package graft.operators

import graft.LineageCut._
import graft.{NamedQuery, Tables}
import graft.functions.{BpeFunctions, BpeImpl}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Subword tokenization over `documents` — the step between curated
  * text and training sequences. Training-data pipelines need REAL
  * token counts (packing budgets, mixture weights, billing) and a
  * tokenizer whose vocabulary was learned from the corpus itself; the
  * regex pre-tokenizer in q_token_count is the cheap estimate, this is
  * the exact path.
  *
  * Scale design (100 TB):
  *  - the corpus-wide word count — the only part that touches every
  *    byte — is a standard explode → partial-agg shuffle on words;
  *  - the merge-training loop runs on the aggregated vocabulary table
  *    (bounded, driver-side) exactly like sentencepiece/HF trainers —
  *    iterative pair-merging is sequential by construction and its
  *    input is vocabulary-sized, not corpus-sized;
  *  - encoding is a native codegen expression (BpeEncode): row-local,
  *    shuffle-free, scan-speed; the learned merge table ships once per
  *    executor inside the serialized plan, not per row. */
object Tokenize {

  /** Merge-table size for the corpus tokenizer. Small by real-vocab
    * standards (32k-100k) but large enough that frequent corpus words
    * collapse to single '▁word' tokens, which is what the specs and the
    * compression assertion exercise. */
  val NumMerges = 200

  /** Driver-side vocabulary bound: the word-frequency table collected
    * for training is capped (most-frequent first, deterministic
    * count-then-word order). Truncating the rare tail only drops
    * pair counts a 2+-occurrence merge rule would likely skip anyway —
    * the standard trainer compromise. [[trainBpeDistributed]] is the
    * cap-free path; `q_bpe_train_dist` proves per shipped corpus that
    * this cap loses zero merges. */
  val MaxVocabWords = 100000

  /** Distributed word count → bounded driver table → classic BPE merge
    * loop. Deterministic for a fixed corpus on any layout. */
  def trainBpe(docs: DataFrame, numMerges: Int = NumMerges): Seq[(String, String)] = {
    import docs.sparkSession.implicits._
    val wc = docs
      .select(explode(split($"text", " ", -1)).as("w"))
      .filter(length($"w") > 0)
      .groupBy($"w").agg(count(lit(1)).as("c"))
      .orderBy($"c".desc, $"w")
      .limit(MaxVocabWords)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    BpeImpl.trainMerges(wc, numMerges)
  }

  /** Fully DISTRIBUTED BPE trainer — the no-cap 100-TB path next to
    * [[trainBpe]]'s sentencepiece-standard collected-vocab loop: the
    * per-round "count all adjacent symbol pairs" runs as a SHUFFLE-SIDE
    * aggregation over the (symbols, count) vocabulary frame, so no
    * vocabulary-sized table is ever collected and [[MaxVocabWords]]
    * does not exist on this path. The driver holds only the merge
    * table itself (≤ numMerges rows, bounded by construction) and one
    * 1-row argmax per round — the Checks.scala bounded-gate shape, the
    * same driver-barrier-per-round pattern as kcoreConverged.
    *
    * Exact-equivalence contract: identical pair counts, the same
    * (-count, left, right) tie-break (UTF8-binary vs UTF-16 ordering
    * agree on BMP symbols — all symbols here are BMP), the same
    * stop-below-2 rule, and the same left-to-right non-overlapping
    * merge application — so for any corpus whose vocabulary the cap
    * doesn't truncate, the table is BIT-IDENTICAL to [[trainBpe]]'s.
    * `q_bpe_train_dist` makes that agreement a driver-visible hash row
    * (and thereby proves the cap lost zero merges on THIS corpus at
    * every shipped scale); TokenizeSpec asserts table equality
    * in-suite.
    *
    * Scale shape: the corpus-sized work (word counting) is one
    * explode → partial-agg shuffle; each round's pair count is
    * vocabulary-sized (rounds × constant, independent of corpus bytes);
    * lineage is cut every 10 rounds with a localCheckpoint of the tiny
    * vocab frame. */
  def trainBpeDistributed(docs: DataFrame,
      numMerges: Int = NumMerges): Seq[(String, String)] = {
    val s = docs.sparkSession
    import s.implicits._
    var words = docs
      .select(explode(split($"text", " ", -1)).as("w"))
      .filter(length($"w") > 0)
      .groupBy($"w").agg(count(lit(1)).as("c"))
      .as[(String, Long)]
      .map { case (w, c) =>
        (BpeImpl.toSymbols(BpeImpl.MarkerStr + w).toSeq, c) }
      .lineageCut()
    val merges = scala.collection.mutable.ArrayBuffer.empty[(String, String)]
    var done = false
    var i = 0
    while (i < numMerges && !done) {
      val top = words.toDF("syms", "c")
        .select(explode(expr(
          """zip_with(slice(syms, 1, size(syms) - 1),
            |         slice(syms, 2, size(syms) - 1),
            |         (x, y) -> struct(x AS a, y AS b))""".stripMargin))
          .as("p"), $"c")
        .groupBy($"p.a".as("a"), $"p.b".as("b")).agg(sum($"c").as("n"))
        .orderBy($"n".desc, $"a", $"b")
        .limit(1).collect()
      if (top.isEmpty || top(0).getLong(2) < 2L) done = true
      else {
        val (a, b) = (top(0).getString(0), top(0).getString(1))
        merges += ((a, b))
        words = words.map { case (syms, c) => (mergePair(syms, a, b), c) }
        if ((i + 1) % 10 == 0) words = words.lineageCut()
      }
      i += 1
    }
    merges.toSeq
  }

  /** Left-to-right non-overlapping replacement of adjacent (a, b) with
    * the merged symbol — the single-pair specialization of
    * BpeImpl.mergeOnce, applied row-locally inside the distributed
    * trainer's per-round map. */
  private def mergePair(syms: Seq[String], a: String, b: String): Seq[String] = {
    val out = new scala.collection.mutable.ArrayBuffer[String](syms.length)
    var k = 0
    while (k < syms.length) {
      if (k < syms.length - 1 && syms(k) == a && syms(k + 1) == b) {
        out += a + b; k += 2
      } else { out += syms(k); k += 1 }
    }
    out.toSeq
  }

  // ------------------------------------------------------- q_bpe_train_dist
  /** Driver-visible trainer-equivalence gate: train BOTH ways on the
    * corpus — collected-vocab driver loop and shuffle-side distributed
    * loop — then emit, per document, whether the two merge tables are
    * identical and whether encoding under each yields the same token
    * count. The oracle knows the full expected answer (TRUE, TRUE): any
    * divergence — a pair-count mismatch, a tie-break ordering delta, a
    * vocab-cap truncation that LOSES a merge, a merge-application
    * difference — flips a cell and hash-fails. This row is also the
    * standing PROOF that [[MaxVocabWords]] loses zero merges on the
    * shipped corpora: the distributed side has no cap. */
  private def bpeTrainDist(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val docs = Tables.documents(s, dir)
    val drv = trainBpe(docs)
    val dist = trainBpeDistributed(docs)
    docs.select($"doc_id", length($"text").as("n_chars"),
      lit(drv == dist).as("tables_agree"),
      (size(BpeFunctions.bpeEncode($"text", dist)) ===
        size(BpeFunctions.bpeEncode($"text", drv))).as("tokens_agree"))
      .orderBy($"doc_id")
  }

  private val bpeTrainDistSql =
    """SELECT doc_id, length(text) AS n_chars, TRUE AS tables_agree,
      |  TRUE AS tokens_agree
      |FROM documents ORDER BY doc_id""".stripMargin

  // ------------------------------------------------------------- q_bpe_roundtrip
  /** Driver-visible gate for the whole tokenize path: train on the
    * corpus, encode every document, then put the token stream through a
    * REAL distributed round trip — posexplode to (doc_id, pos, token)
    * rows, shuffle, reassemble in token order, decode — and compare to
    * the original text. A lost, duplicated, or reordered token anywhere
    * in the explode/shuffle/re-agg path (or a merge-rule bug that makes
    * decode inexact) flips roundtrip_ok and fails the hash compare; the
    * oracle knows the full expected answer (TRUE everywhere, n_chars
    * from the raw text). */
  private def bpeRoundtrip(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val docs = Tables.documents(s, dir)
    val merges = trainBpe(docs)
    val toks = docs.select($"doc_id", $"text",
      BpeFunctions.bpeEncode($"text", merges).as("toks"))
    val rebuilt = toks
      .select($"doc_id", posexplode($"toks").as(Seq("pos", "tok")))
      .groupBy($"doc_id")
      .agg(
        count(lit(1)).as("n_tokens"),
        array_join(
          transform(array_sort(collect_list(struct($"pos", $"tok"))),
            x => x.getField("tok")), "").as("joined"))
    val decoded = substring(
      translate($"joined", BpeImpl.Marker.toString, " "), 2, Int.MaxValue)
    toks.join(rebuilt, "doc_id")
      .select($"doc_id", length($"text").as("n_chars"),
        (decoded === $"text").as("roundtrip_ok"))
      .orderBy($"doc_id")
  }

  private val bpeRoundtripSql =
    """SELECT doc_id, length(text) AS n_chars, TRUE AS roundtrip_ok
      |FROM documents ORDER BY doc_id""".stripMargin

  // ================= unigram-LM tokenizer (SentencePiece family) ======
  /** The second trainer every production corpus pipeline carries next
    * to BPE: a unigram-LM-family tokenizer — candidate piece lattice
    * over corpus substrings, iterative usage re-estimation, prune to a
    * target vocabulary, greedy decode (Kudo 2018's SentencePiece
    * pipeline shape). This is the DETERMINISTIC INTEGER variant of that
    * family, in the repo's exactness doctrine: classical soft-EM with
    * float log-probabilities is merge-order dependent and cannot be
    * replayed bit-for-bit by a second engine, so the E-step here is the
    * HARD assignment every WordPiece/SentencePiece decoder ships —
    * maximal-munch longest-match segmentation (functions/UnigramExprs)
    * — and the M-step is exact integer usage counting. Iteration is
    * meaningful through the PRUNE: candidates → segment → count →
    * prune to V1 → re-segment → count → prune to V2 → final counts,
    * so round-2 segmentations differ from round-1 exactly where the
    * vocabulary shrank (the SentencePiece shrink schedule, two rungs).
    * The DuckDB oracle replays the ENTIRE pipeline — candidate
    * generation, both prune rungs, both greedy segmentations as
    * recursive CTEs (length-ordered LEFT JOINs + COALESCE = the same
    * longest-first rule) — so a one-piece divergence anywhere
    * hash-fails.
    *
    * Scale shape (100 TB): the only corpus-sized work is the word
    * count (one explode → partial-agg shuffle, shared with trainBpe);
    * candidate generation and both EM passes run over the DISTINCT-WORD
    * frame (vocabulary-sized); the two pruned vocabularies are BOUNDED
    * (V1/V2 + alphabet) and collected like every production trainer's
    * vocab table; encoding is the row-local codegen expression — the
    * corpus never shuffles for the tokenizer. */
  val UniCandMinFreq = 2L
  /** Prune rungs, sized so pruning BITES on the shipped corpora (tens
    * of distinct words at sf0.01): round-1 keeps the top 48 multi-char
    * pieces, round-2 the top 24 — single characters are always kept
    * (coverage guarantee: the greedy scan can never strand). */
  val UniV1 = 48
  val UniV2 = 24

  /** Distinct-word counts — the corpus-sized step, one shuffle. */
  private def uniWords(docs: DataFrame): DataFrame = {
    import docs.sparkSession.implicits._
    docs.select(explode(split($"text", " ", -1)).as("w"))
      .filter(length($"w") > 0)
      .groupBy($"w").agg(count(lit(1)).as("c"))
  }

  /** All substrings of length 1..MaxPieceLen of every distinct word,
    * weighted occurrence counts (each start position counts, times the
    * word's corpus frequency) — the candidate lattice. */
  private def uniCand(words: DataFrame): DataFrame = {
    import words.sparkSession.implicits._
    words.select(explode(expr(
      s"""flatten(transform(sequence(1, length(w)), i ->
         |  transform(sequence(1, least(${graft.functions.UnigramImpl.MaxPieceLen},
         |                              length(w) - i + 1)),
         |    l -> substring(w, i, l))))""".stripMargin)).as("p"), $"c")
      .groupBy($"p").agg(sum($"c").as("cnt"))
  }

  /** Two-rung hard-EM train: returns (vocab1, vocab2), both bounded
    * and deterministically ordered (singles sorted, multis by
    * (cnt DESC, piece ASC) row-numbered to the rung size). */
  def trainUnigram(docs: DataFrame): (Seq[String], Seq[String]) = {
    import docs.sparkSession.implicits._
    val words = uniWords(docs).lineageCut()
    val cand = uniCand(words).lineageCut()
    // every character of the corpus stays in BOTH vocabularies — the
    // totality guarantee the greedy scan and the oracle's COALESCE need
    val singles = cand.filter(length($"p") === 1)
      .orderBy($"p").select($"p").collect().map(_.getString(0)).toSeq
    val multi1 = cand
      .filter(length($"p") >= 2 && $"cnt" >= UniCandMinFreq)
      .orderBy($"cnt".desc, $"p").limit(UniV1)
      .select($"p").collect().map(_.getString(0)).toSeq
    val vocab1 = singles ++ multi1
    val use1 = words.select($"c",
        explode(graft.functions.UnigramFunctions
          .unigramSegment($"w", vocab1)).as("p"))
      .groupBy($"p").agg(sum($"c").as("cnt"))
    val multi2 = use1.filter(length($"p") >= 2)
      .orderBy($"cnt".desc, $"p").limit(UniV2)
      .select($"p").collect().map(_.getString(0)).toSeq
    (vocab1, singles ++ multi2)
  }

  /** Shared oracle prefix: words → candidates → vocab1 → seg1 (greedy
    * recursion) → usage → vocab2 → seg2. The length-ordered LEFT JOIN +
    * COALESCE picks the LONGEST matching piece — exactly
    * UnigramImpl.segment's scan — and k orders pieces within a word.
    * The final COALESCE arm `substr(w, pos+1, 1)` is the native scan's
    * emit-the-character fallback for OUT-OF-ALPHABET input: unreachable
    * for the registered queries (the singles rung keeps every corpus
    * character, so v1 always matches) but it keeps the recursion TOTAL
    * if this prefix is ever replayed over text outside the training
    * corpus — without it all four joins miss, pos goes NULL, and the
    * recursion silently halts mid-word (round-11 advisor note). */
  private val uniLen = graft.functions.UnigramImpl.MaxPieceLen
  private def uniSegSql(name: String, vocab: String): String =
    s"""$name(w, c, pos, piece, k) AS (
       |  SELECT w, c, 0, CAST(NULL AS VARCHAR), 0 FROM words
       |  UNION ALL
       |  SELECT s.w, s.c,
       |    s.pos + length(COALESCE(v4.p, v3.p, v2.p, v1.p,
       |                            substr(s.w, s.pos + 1, 1))),
       |    COALESCE(v4.p, v3.p, v2.p, v1.p, substr(s.w, s.pos + 1, 1)),
       |    s.k + 1
       |  FROM $name s
       |  LEFT JOIN $vocab v4 ON length(v4.p) = 4 AND v4.p = substr(s.w, s.pos + 1, 4)
       |  LEFT JOIN $vocab v3 ON length(v3.p) = 3 AND v3.p = substr(s.w, s.pos + 1, 3)
       |  LEFT JOIN $vocab v2 ON length(v2.p) = 2 AND v2.p = substr(s.w, s.pos + 1, 2)
       |  LEFT JOIN $vocab v1 ON length(v1.p) = 1 AND v1.p = substr(s.w, s.pos + 1, 1)
       |  WHERE s.pos < length(s.w))""".stripMargin
  private val uniSqlPrefix =
    s"""WITH RECURSIVE
       |words AS (
       |  SELECT w, COUNT(*) AS c FROM (
       |    SELECT unnest(string_split(text, ' ')) AS w FROM documents)
       |  WHERE length(w) > 0 GROUP BY w),
       |cand AS (
       |  SELECT substr(w, s.i, l.j) AS p, SUM(c) AS cnt
       |  FROM words,
       |    LATERAL (SELECT UNNEST(generate_series(1, length(w))) AS i) s,
       |    LATERAL (SELECT UNNEST(generate_series(1,
       |      LEAST($uniLen, length(w) - s.i + 1))) AS j) l
       |  GROUP BY 1),
       |singles AS (SELECT p FROM cand WHERE length(p) = 1),
       |vocab1 AS (
       |  SELECT p FROM singles
       |  UNION ALL
       |  SELECT p FROM (
       |    SELECT p, ROW_NUMBER() OVER (ORDER BY cnt DESC, p) AS r
       |    FROM cand WHERE length(p) >= 2 AND cnt >= $UniCandMinFreq)
       |  WHERE r <= $UniV1),
       |${uniSegSql("seg1", "vocab1")},
       |use1 AS (
       |  SELECT piece AS p, SUM(c) AS cnt FROM seg1
       |  WHERE piece IS NOT NULL GROUP BY 1),
       |vocab2 AS (
       |  SELECT p FROM singles
       |  UNION ALL
       |  SELECT p FROM (
       |    SELECT p, ROW_NUMBER() OVER (ORDER BY cnt DESC, p) AS r
       |    FROM use1 WHERE length(p) >= 2)
       |  WHERE r <= $UniV2),
       |${uniSegSql("seg2", "vocab2")}""".stripMargin

  // ------------------------------------------------------- q_unigram_lm
  /** The trained tokenizer itself, as a driver-visible frame: every
    * final-vocabulary piece with its exact corpus usage count and the
    * number of distinct words whose segmentation uses it. A one-count
    * drift anywhere in the two EM rounds — a candidate miscount, a
    * prune-boundary tie broken differently, one wrong greedy match in
    * either segmentation pass — changes a row and hash-fails. */
  private def unigramLm(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val docs = Tables.documents(s, dir)
    val (_, vocab2) = trainUnigram(docs)
    uniWords(docs)
      .select($"w", $"c",
        explode(graft.functions.UnigramFunctions
          .unigramSegment($"w", vocab2)).as("p"))
      .groupBy($"p")
      .agg(sum($"c").as("cnt"), countDistinct($"w").as("n_words"))
      .select($"p", length($"p").as("piece_len"), $"cnt", $"n_words")
      .orderBy($"cnt".desc, $"p")
  }

  private[operators] val unigramLmSql =
    s"""$uniSqlPrefix
       |SELECT piece AS p, length(piece) AS piece_len,
       |  CAST(SUM(c) AS BIGINT) AS cnt, COUNT(DISTINCT w) AS n_words
       |FROM seg2 WHERE piece IS NOT NULL
       |GROUP BY piece ORDER BY cnt DESC, p""".stripMargin

  // ------------------------------------------------ q_unigram_roundtrip
  /** Driver-visible gate for the unigram encode path (the q_bpe_roundtrip
    * shape): per document, the exact token count under the final
    * vocabulary and whether every word's pieces concatenate back to the
    * word. The oracle REPLAYS the segmentation (string_agg over the
    * recursive CTE) rather than assuming TRUE, so n_tokens and
    * roundtrip_ok are both differential. */
  private def unigramRoundtrip(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val docs = Tables.documents(s, dir)
    val (_, vocab2) = trainUnigram(docs)
    docs.select($"doc_id", length($"text").as("n_chars"),
        explode(split($"text", " ", -1)).as("w"))
      .filter(length($"w") > 0)
      .select($"doc_id", $"n_chars", $"w",
        graft.functions.UnigramFunctions
          .unigramSegment($"w", vocab2).as("pieces"))
      .groupBy($"doc_id", $"n_chars")
      .agg(sum(size($"pieces")).as("n_tokens"),
        expr("bool_and(array_join(pieces, '') = w)").as("roundtrip_ok"))
      .select($"doc_id", $"n_chars", $"n_tokens", $"roundtrip_ok")
      .orderBy($"doc_id")
  }

  private val unigramRoundtripSql =
    s"""$uniSqlPrefix,
       |wordseg AS (
       |  SELECT w, COUNT(*) AS np,
       |    string_agg(piece, '' ORDER BY k) AS joined
       |  FROM seg2 WHERE piece IS NOT NULL GROUP BY w),
       |docw AS (
       |  SELECT doc_id, n_chars, w FROM (
       |    SELECT doc_id, length(text) AS n_chars,
       |      unnest(string_split(text, ' ')) AS w
       |    FROM documents)
       |  WHERE length(w) > 0)
       |SELECT d.doc_id, d.n_chars,
       |  CAST(SUM(ws.np) AS BIGINT) AS n_tokens,
       |  bool_and(ws.joined = d.w) AS roundtrip_ok
       |FROM docw d JOIN wordseg ws ON d.w = ws.w
       |GROUP BY d.doc_id, d.n_chars
       |ORDER BY d.doc_id""".stripMargin

  val all: Seq[NamedQuery] = Seq(
    NamedQuery("q_bpe_roundtrip", bpeRoundtrip, Some(bpeRoundtripSql),
      bench = true),
    NamedQuery("q_unigram_lm", unigramLm, Some(unigramLmSql), bench = true),
    NamedQuery("q_unigram_roundtrip", unigramRoundtrip,
      Some(unigramRoundtripSql), bench = true),
    // unbenched: the loop is rounds × constant (vocab-frame jobs), so
    // benching would time ~150 rounds of job-scheduling overhead, not
    // any data-scale work — the corpus-sized step (word count) is
    // already timed inside q_bpe_roundtrip
    NamedQuery("q_bpe_train_dist", bpeTrainDist, Some(bpeTrainDistSql)))
}
