package graft.operators

import graft.{NamedQuery, Tables}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Document chunking and sequence packing — the two shaping steps between
  * a cleaned corpus and a training batch:
  *  - chunking splits long documents into overlapping fixed-width token
  *    windows (context-length units with stride overlap so no boundary
  *    information is lost);
  *  - packing assigns variable-length documents to fixed-capacity bins
  *    (context slots) so short documents share a sequence instead of
  *    wasting pad tokens.
  *
  * Scale design: chunking is a row-local explode — whitespace split,
  * per-chunk slice + join, no shuffle; what leaves the operator is
  * (doc_id, chunk_idx, n_tokens, md5) — a digest, never the chunk text,
  * unless the caller asks for payloads. Packing is one window cumsum per
  * stratum: bin id = floor((running_total - own_len) / capacity), a
  * streaming-friendly greedy assignment (successive-fit, not optimal
  * FFD bin packing — the standard corpus-scale tradeoff, since true FFD
  * needs a global sort + sequential state). All arithmetic is integral,
  * so results are bit-stable on any cluster. */
object Chunking {

  /** 1-based window start offsets into a `words` array attribute:
    * 1 + ceil(max(0, n - width) / stride) windows. The lambda touches
    * only size(words), so nothing expensive re-evaluates per element
    * (the HOF-recompute trap — a split() referenced inside the lambda
    * would re-split once per window after projection collapse). */
  def chunkStarts(words: Column, width: Int, stride: Int): Column = {
    require(width >= 1 && stride >= 1 && stride <= width,
      s"need 1 <= stride <= width, got width=$width stride=$stride")
    val nChunks = lit(1) + ceil(
      greatest(size(words) - width, lit(0)).cast("double") / stride).cast("int")
    transform(sequence(lit(0), nChunks - 1), i => i * stride + 1)
  }

  /** Overlapping word-window chunks of a `words` array: windows of
    * `width` words every `stride` words (stride < width ⇒ overlap).
    * Arrays shorter than one window yield one chunk. Pass a projected
    * attribute (not an inline split) so tokenization runs once per row. */
  def wordChunks(words: Column, width: Int, stride: Int): Column =
    transform(chunkStarts(words, width, stride), start =>
      concat_ws(" ", slice(words, start, lit(width))))

  // ------------------------------------------------------------------ q_chunk_docs
  /** ChunkWidth-token windows with ChunkStride offsets (overlapping),
    * one output row per chunk carrying its digest and token count — the
    * text itself stays inside the scan. Explode-first shape: the split
    * array is a projected attribute below the Generate, so each document
    * tokenizes ONCE and each chunk slices the shared array. */
  val ChunkWidth = 64
  val ChunkStride = 48

  private def chunkDocs(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.documents(s, dir)
      .select($"doc_id", split($"text", " ", -1).as("words"))
      .select($"doc_id", $"words",
        posexplode(chunkStarts($"words", ChunkWidth, ChunkStride)))
      .select($"doc_id", $"pos".as("chunk_idx"),
        size(slice($"words", $"col", lit(ChunkWidth))).as("n_tokens"),
        md5(concat_ws(" ", slice($"words", $"col", lit(ChunkWidth)))).as("chunk_md5"))
      .orderBy($"doc_id", $"chunk_idx")
  }

  private val chunkDocsSql =
    s"""WITH w AS (SELECT doc_id, string_split(text, ' ') AS words FROM documents),
       |counted AS (
       |  SELECT doc_id, words,
       |    1 + CAST(ceil(greatest(len(words) - $ChunkWidth, 0) / $ChunkStride.0) AS INT)
       |      AS n_chunks
       |  FROM w),
       |chunks AS (
       |  SELECT doc_id, i AS chunk_idx,
       |    array_to_string(
       |      words[i * $ChunkStride + 1 : i * $ChunkStride + $ChunkWidth], ' ') AS chunk
       |  FROM counted, unnest(generate_series(0, n_chunks - 1)) t(i))
       |SELECT doc_id, chunk_idx,
       |  len(string_split(chunk, ' ')) AS n_tokens, md5(chunk) AS chunk_md5
       |FROM chunks ORDER BY doc_id, chunk_idx""".stripMargin

  // -------------------------------------------------------------- q_pack_sequences
  /** Greedy sequence packing: per language, documents (ordered by id)
    * accumulate into 2048-token bins; a document starts a new bin when
    * its tokens would not start before the capacity boundary. Output is
    * one row per bin with its fill statistics. */
  val BinCapacity = 2048

  private def packSequences(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    import org.apache.spark.sql.expressions.Window
    val toks = Tables.documents(s, dir)
      .select($"doc_id", $"lang", size(split($"text", " ", -1)).as("n_tokens"))
    val w = Window.partitionBy($"lang").orderBy($"doc_id")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    toks
      .withColumn("running", sum($"n_tokens").over(w))
      // explicit floor: double->integer CASTs truncate in Spark but
      // round in DuckDB, so the naked cast would diverge at bin edges
      .withColumn("bin", floor(($"running" - $"n_tokens") / BinCapacity).cast("long"))
      .groupBy($"lang", $"bin")
      .agg(count(lit(1)).as("n_docs"), sum($"n_tokens").as("bin_tokens"))
      .orderBy($"lang", $"bin")
  }

  private val packSequencesSql =
    s"""WITH toks AS (
       |  SELECT doc_id, lang, len(string_split(text, ' ')) AS n_tokens
       |  FROM documents),
       |placed AS (
       |  SELECT lang, n_tokens,
       |    CAST(floor((SUM(n_tokens) OVER (PARTITION BY lang ORDER BY doc_id
       |            ROWS UNBOUNDED PRECEDING) - n_tokens) / $BinCapacity) AS BIGINT)
       |      AS bin
       |  FROM toks)
       |SELECT lang, bin, COUNT(*) AS n_docs, CAST(SUM(n_tokens) AS BIGINT) AS bin_tokens
       |FROM placed GROUP BY 1, 2 ORDER BY lang, bin""".stripMargin

  // ------------------------------------------------------------------------ q_vocab
  /** Vocabulary construction: corpus word frequencies, top 1000 by
    * (count desc, word) — the seed step for tokenizer training. Explode
    * + partial-aggregated count; the total order's word tie-breaker
    * keeps the cut deterministic. */
  private def vocab(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.documents(s, dir)
      .select(explode(split($"text", " ", -1)).as("word"))
      .filter($"word" =!= "")
      .groupBy($"word").agg(count(lit(1)).as("freq"))
      .orderBy($"freq".desc, $"word")
      .limit(1000)
  }

  private val vocabSql =
    """SELECT word, COUNT(*) AS freq
      |FROM (SELECT unnest(string_split(text, ' ')) AS word FROM documents)
      |WHERE word <> ''
      |GROUP BY word ORDER BY freq DESC, word LIMIT 1000""".stripMargin

  val all: Seq[NamedQuery] = Seq(
    NamedQuery("q_chunk_docs", chunkDocs, Some(chunkDocsSql), bench = true),
    NamedQuery("q_pack_sequences", packSequences, Some(packSequencesSql), bench = true),
    NamedQuery("q_vocab", vocab, Some(vocabSql), bench = true))
}
