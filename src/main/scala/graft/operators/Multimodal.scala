package graft.operators

import graft.{NamedQuery, Tables}
import org.apache.spark.sql.{Column, DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal (binary) column handling for a training-data pipeline:
  * image/audio/video payloads are opaque `binary` columns with typed
  * metadata alongside. The decode step is STUBBED (no media codecs in
  * this container) behind a deterministic fake, but everything Spark-side
  * is real and tested: the asset schema, binary expressions on the
  * payload, and the per-partition batched decode shape (`mapPartitions`
  * over a typed Dataset — the JVM analog of `mapInPandas` batch decode:
  * one iterator per partition, so a real codec can amortize per-batch
  * init, e.g. loading a decoder context once per partition, and stream
  * rows without materializing the partition).
  */
object Multimodal {

  /** An opaque media payload + its metadata — the storage contract for
    * multimodal columns (binary stays opaque to the engine; metadata is
    * relational and prunable). */
  case class Asset(doc_id: Long, media_type: String, payload: Array[Byte])

  case class ImageMeta(doc_id: Long, media_type: String, width: Int,
                       height: Int, n_bytes: Int, fingerprint: Long)

  /** Deterministic media-type assignment across 3 modalities — a pure
    * function of doc_id, so frame/thumb frames can recompute it instead
    * of re-joining against the asset table. */
  def mediaTypeCol(docId: Column): Column =
    element_at(array(lit("image"), lit("audio"), lit("video")),
      (pmod(docId, lit(3)) + 1).cast("int"))

  /** Build an asset frame from the documents table (payload = UTF-8
    * bytes of the text — a stand-in for image bytes with the same
    * engine-side characteristics: variable-length opaque binary). */
  def assets(s: SparkSession, dir: String): Dataset[Asset] = {
    import s.implicits._
    Tables.documents(s, dir)
      .select($"doc_id", mediaTypeCol($"doc_id").as("media_type"),
        encode($"text", "UTF-8").as("payload"))
      .as[Asset]
  }

  /** STUB decoder — a real deployment plugs libjpeg/ffmpeg here. The fake
    * derives dimensions deterministically from the payload bytes so the
    * distributed plumbing is exercised end-to-end with stable results. */
  def decodeStub(payload: Array[Byte]): (Int, Int) = {
    var h = 0xcbf29ce484222325L
    var i = 0
    while (i < payload.length) { h ^= (payload(i) & 0xffL); h *= 0x100000001b3L; i += 1 }
    val m = graft.functions.TextImpl.mix64(h)
    (64 + ((m >>> 8) % 4032).toInt.abs, 64 + ((m >>> 40) % 2096).toInt.abs)
  }

  /** Per-partition batched decode: iterator-in/iterator-out, the shape a
    * real codec needs (per-partition init, streaming rows, no
    * whole-partition materialization). */
  def extractMeta(in: Dataset[Asset]): Dataset[ImageMeta] = {
    import in.sparkSession.implicits._
    in.mapPartitions { batch =>
      // per-partition decoder init would go here (once per task, not per row)
      batch.map { a =>
        val (w, h) = decodeStub(a.payload)
        var f = 0xcbf29ce484222325L
        var i = 0
        while (i < math.min(a.payload.length, 64)) {
          f ^= (a.payload(i) & 0xffL); f *= 0x100000001b3L; i += 1
        }
        ImageMeta(a.doc_id, a.media_type, w, h, a.payload.length,
          graft.functions.TextImpl.mix64(f))
      }
    }
  }

  case class Frame(doc_id: Long, frame_idx: Int, frame: Array[Byte])

  /** Frame sampling (video/audio analog): n evenly-spaced fixed-size
    * chunks of the payload — a real pipeline swaps the slicing for a
    * container demuxer; the Spark shape (typed flatMap fan-out, one row
    * per frame, binary stays opaque) is identical. */
  def sampleFrames(in: Dataset[Asset], n: Int, frameBytes: Int): Dataset[Frame] = {
    import in.sparkSession.implicits._
    in.flatMap { a =>
      val len = a.payload.length
      (0 until n).iterator.map { i =>
        val start = if (n == 1) 0 else (i.toLong * math.max(len - frameBytes, 0) / math.max(n - 1, 1)).toInt
        val end = math.min(start + frameBytes, len)
        Frame(a.doc_id, i, java.util.Arrays.copyOfRange(a.payload, math.min(start, len), end))
      }
    }
  }

  case class Thumb(doc_id: Long, thumb: Array[Byte])

  /** Resize/thumbnail stub: deterministic fixed-size downsample (every
    * len/k-th byte) standing in for an image resampler — output size is
    * constant regardless of input size, like a real thumbnail. */
  def resizeStub(in: Dataset[Asset], outBytes: Int): Dataset[Thumb] = {
    import in.sparkSession.implicits._
    in.map { a =>
      val len = a.payload.length
      val out = new Array[Byte](outBytes)
      var i = 0
      while (i < outBytes) {
        out(i) = if (len == 0) 0 else a.payload((i.toLong * len / outBytes).toInt)
        i += 1
      }
      Thumb(a.doc_id, out)
    }
  }

  // -------------------------------------------------------------- q_binary_stats
  /** Oracle-checked binary-column query: byte length and content digest of
    * each payload, plus per-modality aggregate stats — binary stays
    * opaque; only cheap metadata flows through the aggregation. */
  private def binaryStats(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    assets(s, dir).toDF()
      .groupBy($"media_type")
      .agg(
        count(lit(1)).as("n_assets"),
        sum(length($"payload")).as("total_bytes"),
        min(length($"payload")).as("min_bytes"),
        max(length($"payload")).as("max_bytes"),
        count_distinct($"payload").as("n_distinct_payloads"))
      .orderBy($"media_type")
  }

  private val binaryStatsSql =
    """WITH a AS (
      |  SELECT doc_id,
      |    ['image', 'audio', 'video'][(doc_id % 3) + 1] AS media_type,
      |    encode(text) AS payload
      |  FROM documents)
      |SELECT media_type, COUNT(*) AS n_assets,
      |  CAST(SUM(octet_length(payload)) AS BIGINT) AS total_bytes,
      |  MIN(octet_length(payload)) AS min_bytes,
      |  MAX(octet_length(payload)) AS max_bytes,
      |  COUNT(DISTINCT payload) AS n_distinct_payloads
      |FROM a GROUP BY media_type ORDER BY media_type""".stripMargin

  // -------------------------------------------------------------- q_frame_stats
  /** Oracle-checked query over the frame-sampling output: per-modality,
    * per-frame-index byte stats through the REAL `sampleFrames` fan-out
    * (typed flatMap, binary frames). The frame slicing is byte-based, so
    * the oracle recomputes it in HEX space — `hex(encode(text))` is a
    * pure-ASCII string with exactly 2 chars per byte, making character
    * `substring` arithmetic byte-exact for ANY text, multi-byte UTF-8
    * included (no chars==bytes corpus assumption). The driver-visible
    * correctness row for the multimodal plumbing beyond binaryStats. */
  val FrameCount = 4
  val FrameBytes = 32

  private def frameStats(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    // media_type is a pure function of doc_id: recompute it on the frame
    // rows instead of rescanning documents and shuffle-joining 4n frames
    sampleFrames(assets(s, dir), n = FrameCount, frameBytes = FrameBytes).toDF()
      .withColumn("media_type", mediaTypeCol($"doc_id"))
      .groupBy($"media_type", $"frame_idx")
      .agg(
        count(lit(1)).as("n_frames"),
        sum(length($"frame")).as("total_frame_bytes"),
        count_distinct($"frame").as("n_distinct_frames"))
      .orderBy($"media_type", $"frame_idx")
  }

  private val frameStatsSql =
    s"""WITH a AS (
       |  SELECT doc_id, ['image', 'audio', 'video'][(doc_id % 3) + 1] AS media_type,
       |    hex(encode(text)) AS h, octet_length(encode(text)) AS len
       |  FROM documents),
       |f0 AS (
       |  SELECT media_type, i AS frame_idx, h, len,
       |    (i * greatest(len - $FrameBytes, 0)) // ${FrameCount - 1} AS s0
       |  FROM a, generate_series(0, ${FrameCount - 1}) AS t(i)),
       |f AS (
       |  SELECT media_type, frame_idx,
       |    substring(h, 2 * s0 + 1,
       |      2 * (least(s0 + $FrameBytes, len) - s0)) AS frame_hex
       |  FROM f0)
       |SELECT media_type, frame_idx, COUNT(*) AS n_frames,
       |  CAST(SUM(length(frame_hex) // 2) AS BIGINT) AS total_frame_bytes,
       |  COUNT(DISTINCT frame_hex) AS n_distinct_frames
       |FROM f GROUP BY 1, 2 ORDER BY media_type, frame_idx""".stripMargin

  // -------------------------------------------------------------- q_media_dedup
  /** Exact media dedup — the image/audio dedup step of a multimodal
    * pipeline: assets group by PAYLOAD DIGEST within a modality, the
    * smallest doc_id is the canonical copy, duplicate groups are
    * reported with their reclaimable byte count. Only the 16-byte
    * digest (plus doc_id and the byte length) ever shuffles — payload
    * bytes stay in the scan, exactly like the text exact-dedup path;
    * at 100 TB of media that difference IS the operator. Equality by
    * digest admits the usual ~2^-128 md5-collision caveat (shared with
    * q_dedup_exact); the oracle groups by raw payload, so a collision
    * would surface as a CORRECTNESS mismatch rather than hide. */
  /** Plant ids 3× the shared offset so `id % 3` — the modality routing —
    * is preserved and the copy dedups against its original INSIDE its
    * modality group. */
  val MediaPlantOffset = 3L * graft.operators.Similarity.PlantOffset

  private def mediaDedup(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val base = assets(s, dir).toDF()
    graft.operators.Similarity.requirePlantable(
      Tables.documents(s, dir), "doc_id", "mediaDedup")
    // planted exact copies (every 10th asset) through the REAL digest
    // grouping: the fixture corpus has no exact payload duplicates within
    // a modality, so without planting the report would be vacuously empty
    val withCopies = base.unionByName(
      base.filter($"doc_id" % 10 === 0)
        .select(($"doc_id" + MediaPlantOffset).as("doc_id"),
          $"media_type", $"payload"))
    withCopies
      .select($"media_type", $"doc_id",
        md5($"payload").as("digest"), length($"payload").as("n_bytes"))
      .groupBy($"media_type", $"digest")
      .agg(
        min($"doc_id").as("keep_id"),
        count(lit(1)).as("n_copies"),
        max($"n_bytes").cast("long").as("bytes_each"))
      .filter($"n_copies" >= 2)
      .select($"media_type", $"keep_id", $"n_copies",
        ($"bytes_each" * ($"n_copies" - 1)).as("bytes_reclaimed"))
      .orderBy($"media_type", $"keep_id")
  }

  private val mediaDedupSql =
    s"""WITH a0 AS (
      |  SELECT doc_id,
      |    ['image', 'audio', 'video'][(doc_id % 3) + 1] AS media_type,
      |    encode(text) AS payload
      |  FROM documents),
      |a AS (
      |  SELECT * FROM a0
      |  UNION ALL
      |  SELECT doc_id + ${3L * graft.operators.Similarity.PlantOffset},
      |    media_type, payload
      |  FROM a0 WHERE doc_id % 10 = 0),
      |g AS (
      |  SELECT media_type, payload, MIN(doc_id) AS keep_id,
      |    COUNT(*) AS n_copies,
      |    CAST(MAX(octet_length(payload)) AS BIGINT) AS bytes_each
      |  FROM a GROUP BY 1, 2)
      |SELECT media_type, keep_id, n_copies,
      |  CAST(bytes_each * (n_copies - 1) AS BIGINT) AS bytes_reclaimed
      |FROM g WHERE n_copies >= 2
      |ORDER BY media_type, keep_id""".stripMargin

  val all: Seq[NamedQuery] = Seq(
    NamedQuery("q_binary_stats", binaryStats, Some(binaryStatsSql), bench = true),
    NamedQuery("q_frame_stats", frameStats, Some(frameStatsSql), bench = true),
    NamedQuery("q_media_dedup", mediaDedup, Some(mediaDedupSql), bench = true))
}
