package graft.operators

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
    * the standard trainer compromise. */
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

  val all: Seq[NamedQuery] = Seq(
    NamedQuery("q_bpe_roundtrip", bpeRoundtrip, Some(bpeRoundtripSql),
      bench = true))
}
