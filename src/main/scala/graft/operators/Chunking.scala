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

  // --------------------------------------------------------------- q_cdc_chunks
  /** Content-defined chunking (the rsync/LBFS family): a breakpoint
    * falls AFTER position j wherever the hash of the trailing
    * [[CdcWindow]]-char window ≡ 0 (mod [[CdcModulus]]) — so chunk
    * boundaries are a function of CONTENT, not offsets, and an insert
    * near the head of a document re-chunks only its neighborhood
    * instead of shifting every fixed-size block. The audit chunks every
    * document, digests each chunk, and reports the per-source storage
    * dedup this buys (bytes_total vs bytes_distinct) plus the '__all__'
    * cross-source rollup (the q_kmv_distinct convention). Production
    * CDC rolls a Gear/Rabin hash in O(1) per char; here the window hash
    * is md5-lower-64 (recomputed per position — O(window) per char)
    * because that is the hash BOTH engines can replay bit-for-bit; the
    * breakpoint rule and chunk reassembly are identical either way.
    *
    * Scale shape: chunking is row-local (one pass per document inside
    * codegen); the only shuffle carries (source, chunk-digest, len)
    * rows — never the text. */
  val CdcWindow = 8
  val CdcModulus = 64L

  private def cdcChunks(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    import graft.functions.TextFunctions
    // breakpoints: window-end positions j (1-based) with hash % mod == 0;
    // cuts at j, plus the document end. text binds as a lambda variable
    // via the single-element-array trick (the q_winnow PERF NOTE).
    // cut positions via the NATIVE graft_cdc_cuts expression — the
    // per-window MD5 loop as a HOF lambda evaluates interpreted and
    // measured 47s at sf0.1; native codegen with byte-slice digests
    // runs the identical rule. Chunk reassembly is a cheap
    // chunks-per-doc-sized lambda over the bound (text, cuts) pair.
    val chunks = Tables.documents(s, dir)
      .select($"doc_id", $"source", $"text",
        TextFunctions.cdcCuts($"text", CdcWindow, CdcModulus).as("cuts"))
      .select($"doc_id", $"source", explode(
        zip_with($"cuts",
          concat(array(lit(0)), slice($"cuts", lit(1), size($"cuts") - 1)),
          (to, from) => substr($"text", from + 1, to - from))).as("chunk"))
      .filter(length($"chunk") > 0) // dup boundary at text end yields ""
    val perChunk = chunks
      .select($"source", md5($"chunk").as("d"), length($"chunk").as("len"))
    def rollup(df: DataFrame, tag: Column): DataFrame = df
      .groupBy(tag.as("source"), $"d", $"len")
      .agg(count(lit(1)).as("n"))
      .groupBy($"source")
      .agg(sum($"n").as("n_chunks"), count(lit(1)).as("n_distinct"),
        sum($"n" * $"len").as("bytes_total"), sum($"len").as("bytes_distinct"))
    rollup(perChunk, $"source")
      .unionByName(rollup(perChunk, lit("__all__")))
      .withColumn("dedup_ppm",
        expr("(bytes_total - bytes_distinct) * 1000000 DIV bytes_total"))
      .orderBy($"source")
  }

  private val cdcChunksSql =
    s"""WITH cuts AS (
       |  SELECT doc_id, source, text,
       |    list_append(
       |      list_filter(generate_series($CdcWindow, len(text)), j ->
       |        CAST(md5_number_lower(substr(text, j - ${CdcWindow - 1},
       |          $CdcWindow)) & ${Long.MaxValue}::UBIGINT AS BIGINT)
       |          % $CdcModulus = 0),
       |      len(text)) AS cuts
       |  FROM documents),
       |chunks AS (
       |  SELECT source, chunk FROM (
       |    SELECT source,
       |      unnest(list_transform(generate_series(1, len(cuts)), k ->
       |        substr(text, coalesce(cuts[k-1], 0) + 1,
       |               cuts[k] - coalesce(cuts[k-1], 0)))) AS chunk
       |    FROM cuts)
       |  WHERE len(chunk) > 0),
       |per AS (
       |  SELECT source, md5(chunk) AS d, len(chunk) AS len,
       |    CAST(COUNT(*) AS BIGINT) AS n
       |  FROM chunks GROUP BY 1, 2, 3),
       |roll AS (
       |  SELECT source, CAST(SUM(n) AS BIGINT) AS n_chunks,
       |    COUNT(*) AS n_distinct,
       |    CAST(SUM(n * len) AS BIGINT) AS bytes_total,
       |    CAST(SUM(len) AS BIGINT) AS bytes_distinct
       |  FROM per GROUP BY 1
       |  UNION ALL
       |  SELECT '__all__', CAST(SUM(n) AS BIGINT), COUNT(*),
       |    CAST(SUM(n * len) AS BIGINT), CAST(SUM(len) AS BIGINT)
       |  FROM (SELECT d, len, CAST(SUM(n) AS BIGINT) AS n
       |        FROM per GROUP BY 1, 2))
       |SELECT source, n_chunks, n_distinct, bytes_total, bytes_distinct,
       |  (bytes_total - bytes_distinct) * 1000000 // bytes_total AS dedup_ppm
       |FROM roll ORDER BY source""".stripMargin

  val all: Seq[NamedQuery] = Seq(
    NamedQuery("q_cdc_chunks", cdcChunks, Some(cdcChunksSql), bench = true),
    NamedQuery("q_chunk_docs", chunkDocs, Some(chunkDocsSql), bench = true),
    NamedQuery("q_pack_sequences", packSequences, Some(packSequencesSql), bench = true),
    NamedQuery("q_vocab", vocab, Some(vocabSql), bench = true))
}
