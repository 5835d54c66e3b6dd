package graft.operators

import graft.LineageCut._
import graft.{NamedQuery, Tables}
import org.apache.spark.sql.{Column, DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal (binary) column handling for a training-data pipeline:
  * image/audio/video payloads are opaque `binary` columns with typed
  * metadata alongside.
  *
  * IMAGE decode and resize are REAL: the JVM ships codecs
  * (javax.imageio — PNG/JPEG/BMP/GIF) and [[decodeImage]] /
  * [[thumbnails]] run them inside the per-partition batched shape
  * (`mapPartitions` over a typed Dataset — the JVM analog of
  * `mapInPandas`: one iterator per partition, per-partition codec init,
  * streaming rows, no whole-partition materialization). MultimodalSpec
  * drives genuine PNG/JPEG bytes through the distributed path and pins
  * exact dimensions and resampled pixels.
  *
  * The FIXTURE corpus's payloads are UTF-8 text bytes (TESTDATA ships
  * no real media), so the oracle-gated queries exercise the metadata /
  * dedup / frame plumbing with [[decodeStub]] as the deterministic
  * fallback for undecodable payloads — exactly the fallback a real
  * pipeline needs for corrupt uploads anyway (`decoded=false` rows are
  * the quarantine channel, not an error). Video/audio demux would need
  * ffmpeg-class native libs the sandbox lacks; the byte-slicing frame
  * sampler stands in with the identical Spark shape.
  */
object Multimodal {

  /** An opaque media payload + its metadata — the storage contract for
    * multimodal columns (binary stays opaque to the engine; metadata is
    * relational and prunable). */
  case class Asset(doc_id: Long, media_type: String, payload: Array[Byte])

  case class ImageMeta(doc_id: Long, media_type: String, width: Int,
                       height: Int, n_bytes: Int, fingerprint: Long,
                       decoded: Boolean)

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

  /** REAL image decode via the JDK's bundled codecs (PNG/JPEG/BMP/GIF —
    * javax.imageio, no external libraries). Returns None when the bytes
    * are not a decodable image: the caller's quarantine/fallback
    * channel, exercised by every fixture payload (UTF-8 text bytes). */
  def decodeImage(payload: Array[Byte]): Option[java.awt.image.BufferedImage] =
    try Option(javax.imageio.ImageIO.read(
      new java.io.ByteArrayInputStream(payload)))
    catch { case _: java.io.IOException => None }

  /** Deterministic fallback for UNDECODABLE payloads — derives plausible
    * dimensions from the payload bytes so the distributed plumbing has
    * stable results on the media-free fixture corpus (and a real
    * pipeline's corrupt-upload rows keep flowing, flagged, instead of
    * failing the job). */
  def decodeStub(payload: Array[Byte]): (Int, Int) = {
    var h = 0xcbf29ce484222325L
    var i = 0
    while (i < payload.length) { h ^= (payload(i) & 0xffL); h *= 0x100000001b3L; i += 1 }
    val m = graft.functions.TextImpl.mix64(h)
    (64 + ((m >>> 8) % 4032).toInt.abs, 64 + ((m >>> 40) % 2096).toInt.abs)
  }

  /** Per-partition batched decode: iterator-in/iterator-out, the shape a
    * real codec needs (per-partition init, streaming rows, no
    * whole-partition materialization). Real codec first; undecodable
    * payloads flow through the stub with `decoded = false`. */
  def extractMeta(in: Dataset[Asset]): Dataset[ImageMeta] = {
    import in.sparkSession.implicits._
    in.mapPartitions { batch =>
      // per-partition codec init (once per task, not per row): in-memory
      // ImageIO only — the default disk cache would add a temp-file
      // write/read per decode on every executor
      javax.imageio.ImageIO.setUseCache(false)
      batch.map { a =>
        val (w, h, ok) = decodeImage(a.payload) match {
          case Some(img) => (img.getWidth, img.getHeight, true)
          case None =>
            val (sw, sh) = decodeStub(a.payload)
            (sw, sh, false)
        }
        var f = 0xcbf29ce484222325L
        var i = 0
        while (i < math.min(a.payload.length, 64)) {
          f ^= (a.payload(i) & 0xffL); f *= 0x100000001b3L; i += 1
        }
        ImageMeta(a.doc_id, a.media_type, w, h, a.payload.length,
          graft.functions.TextImpl.mix64(f), ok)
      }
    }
  }

  /** REAL thumbnail resize: decode → area-averaging rescale → PNG
    * re-encode, per-partition batched like extractMeta. Undecodable
    * payloads are dropped (they have no pixels to resize) — route them
    * through extractMeta's `decoded=false` channel instead. PNG output
    * keeps the result byte-deterministic (lossless encode of a
    * deterministic resample), so results are partition-invariant. */
  def thumbnails(in: Dataset[Asset], w: Int, h: Int): Dataset[Thumb] = {
    import in.sparkSession.implicits._
    in.mapPartitions { batch =>
      javax.imageio.ImageIO.setUseCache(false)
      batch.flatMap { a =>
        decodeImage(a.payload).map { img =>
          val scaled = img.getScaledInstance(w, h,
            java.awt.Image.SCALE_AREA_AVERAGING)
          val out = new java.awt.image.BufferedImage(w, h,
            java.awt.image.BufferedImage.TYPE_INT_RGB)
          val g = out.createGraphics()
          try g.drawImage(scaled, 0, 0, null) finally g.dispose()
          val buf = new java.io.ByteArrayOutputStream()
          javax.imageio.ImageIO.write(out, "png", buf)
          Thumb(a.doc_id, buf.toByteArray)
        }
      }
    }
  }

  case class AudioMeta(doc_id: Long, sample_rate: Int, channels: Int,
                       n_frames: Long, duration_ms: Long, decoded: Boolean)

  /** REAL audio decode via the JDK's bundled parsers (javax.sound.sampled
    * — WAV/AIFF/AU ship with the JVM): sample rate, channel count, frame
    * count, duration. Same per-partition batched shape and
    * `decoded=false` quarantine channel as the image path; compressed
    * formats (mp3/ogg) would need external codecs the sandbox lacks. */
  def extractAudioMeta(in: Dataset[Asset]): Dataset[AudioMeta] = {
    import in.sparkSession.implicits._
    in.mapPartitions { batch =>
      batch.map { a =>
        val parsed =
          try {
            val ais = javax.sound.sampled.AudioSystem.getAudioInputStream(
              new java.io.ByteArrayInputStream(a.payload))
            try {
              val fmt = ais.getFormat
              val frames = ais.getFrameLength
              val durMs =
                if (frames >= 0 && fmt.getFrameRate > 0)
                  (frames * 1000L / fmt.getFrameRate.toLong)
                else -1L
              Some(AudioMeta(a.doc_id, fmt.getSampleRate.toInt,
                fmt.getChannels, frames, durMs, decoded = true))
            } finally ais.close()
          } catch {
            case _: javax.sound.sampled.UnsupportedAudioFileException => None
            case _: java.io.IOException => None
          }
        parsed.getOrElse(
          AudioMeta(a.doc_id, -1, -1, -1L, -1L, decoded = false))
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

  // --------------------------------------------------------- q_media_shard_pack
  /** WebDataset-style shard assignment — the layout step between a
    * curated multimodal corpus and training: assets pack into
    * fixed-byte-budget shards in doc_id (ingest) order, shard id =
    * exclusive-prefix-bytes DIV ShardBytes (the q_pack_sequences
    * offset-chunk rule applied to bytes: an asset starting inside shard
    * k belongs to k even if it crosses the boundary — deterministic,
    * exactly SQL-replayable, and within one asset of greedy fill).
    * The part everyone gets wrong at scale is the CUMULATIVE BYTES
    * OVER AN ASSET-SIZED FRAME: this runs the distributed prefix-sum
    * recipe (range-repartition by doc_id, per-partition byte totals
    * broadcast as offsets, in-partition cumulative windows PARTITIONED
    * BY __pid) — no single-task window. Output is the shard manifest:
    * per shard its asset count, byte total, and doc_id span.
    *
    * Payload bytes never move: only (doc_id, n_bytes) enters the
    * prefix sum; the actual blob-to-tar copy is the downstream writer's
    * sequential read per shard. */
  val ShardBytes = 16384L

  private def mediaShardPack(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    import org.apache.spark.sql.expressions.Window
    val sized = assets(s, dir).toDF()
      .select($"doc_id", $"media_type", length($"payload").cast("long").as("n_bytes"))
    val parts = sized
      .repartitionByRange($"doc_id".asc)
      .withColumn("__pid", spark_partition_id())
      .lineageCut(true)
    val offsets = parts.groupBy($"__pid")
      .agg(sum($"n_bytes").as("__p_bytes"))
      .withColumn("__offset",
        coalesce(sum($"__p_bytes").over(
          Window.orderBy($"__pid")
            .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .drop("__p_bytes")
    val wIn = Window.partitionBy($"__pid").orderBy($"doc_id".asc)
      .rowsBetween(Window.unboundedPreceding, -1)
    parts
      .withColumn("__cum_in", coalesce(sum($"n_bytes").over(wIn), lit(0L)))
      .join(broadcast(offsets), Seq("__pid"))
      .withColumn("shard_id",
        expr(s"(__cum_in + __offset) DIV $ShardBytes"))
      .groupBy($"shard_id")
      .agg(count(lit(1)).as("n_assets"),
        sum($"n_bytes").as("shard_bytes"),
        min($"doc_id").as("first_doc"),
        max($"doc_id").as("last_doc"))
      .orderBy($"shard_id")
  }

  private val mediaShardPackSql =
    s"""WITH a AS (
       |  SELECT doc_id, octet_length(encode(text)) AS n_bytes
       |  FROM documents),
       |c AS (
       |  SELECT doc_id, n_bytes,
       |    COALESCE(CAST(SUM(n_bytes) OVER (ORDER BY doc_id
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS BIGINT),
       |      0) AS cum_before
       |  FROM a)
       |SELECT cum_before // $ShardBytes AS shard_id,
       |  COUNT(*) AS n_assets,
       |  CAST(SUM(n_bytes) AS BIGINT) AS shard_bytes,
       |  MIN(doc_id) AS first_doc, MAX(doc_id) AS last_doc
       |FROM c GROUP BY 1 ORDER BY shard_id""".stripMargin

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

  // ------------------------------------------------------------ q_media_neardup
  /** Segment-hash NEAR-duplicate detection for media — the banded
    * complement to q_media_dedup's exact digest grouping: each payload is
    * cut into 4 equal byte segments, each segment hashed, and two assets
    * of the same modality and byte length are near-duplicates when ≥ 3 of
    * 4 segment hashes agree (the pigeonhole recipe q_simhash_dedup uses:
    * a corruption confined to one segment CANNOT evade all four bands).
    * This is the coarse prefilter real media pipelines run before a
    * perceptual-hash verify — re-encoded thumbnails and tail-corrupted
    * uploads collide with their originals on the untouched segments.
    *
    * Driver-visible gate: every asset ≥ 64 bytes gets a planted copy
    * (id + MediaPlantOffset, modality preserved) with its LAST 8 BYTES
    * overwritten — same length, one corrupted segment — pushed through
    * the real segment/band join; the oracle recomputes the expected
    * answer from first principles in hex space (segments 1–3 equal by
    * construction; segment 4 equal iff the original tail already was the
    * corruption bytes), so a broken band join, boundary off-by-one, or
    * dropped pair fails the hash compare.
    *
    * Scale design: only (doc_id, modality, n_bytes, seg_idx, seg_hash)
    * ever shuffles — 4 slim rows per asset, payload bytes stay in the
    * scan. The band join is an equi-join keyed on (modality, n_bytes,
    * seg_idx, seg_hash); bucket sizes are content-duplicate-group-sized
    * (tiny), so no skew guard is needed, and the ≥ 3-of-4 verify is a
    * count over the joined pairs, never a payload re-read. Hash equality
    * stands in for byte equality with the usual ~2^-64 caveat
    * (q_dedup_exact rationale); the oracle compares real bytes, so a
    * collision would surface as a mismatch, not hide. */
  val NearDupMinBytes = 64
  val NearDupSegments = 4

  private def mediaNearDup(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    graft.operators.Similarity.requirePlantable(
      Tables.documents(s, dir), "doc_id", "mediaNearDup")
    val P = MediaPlantOffset
    val src = assets(s, dir).toDF()
      .withColumn("n_bytes", length($"payload"))
      .filter($"n_bytes" >= NearDupMinBytes)
    val corrupted = src.select(
      ($"doc_id" + P).as("doc_id"), $"media_type",
      concat(expr("substring(payload, 1, n_bytes - 8)"),
        encode(lit("XXXXXXXX"), "UTF-8")).as("payload"),
      $"n_bytes")
    val segs = src.unionByName(corrupted)
      .select($"doc_id", $"media_type", $"n_bytes",
        explode(array((0 until NearDupSegments).map { i =>
          struct(lit(i).as("seg_idx"),
            xxhash64(expr(s"substring(payload, ($i * n_bytes) DIV 4 + 1, " +
              s"(${i + 1} * n_bytes) DIV 4 - ($i * n_bytes) DIV 4)"))
              .as("seg_hash"))
        }: _*)).as("s"))
      .select($"doc_id", $"media_type", $"n_bytes",
        $"s.seg_idx", $"s.seg_hash")
    val pairs = segs.select($"media_type", $"n_bytes", $"seg_idx",
        $"seg_hash", $"doc_id".as("a"))
      .join(segs.select($"media_type", $"n_bytes", $"seg_idx", $"seg_hash",
        $"doc_id".as("b")),
        Seq("media_type", "n_bytes", "seg_idx", "seg_hash"))
      .filter($"a" < $"b")
      .groupBy($"a", $"b")
      .agg(count_distinct($"seg_idx").as("n_seg_matches"))
      .filter($"n_seg_matches" >= NearDupSegments - 1)
    src.select($"doc_id")
      .join(pairs.filter($"b" === $"a" + P)
        .select($"a".as("doc_id"), $"n_seg_matches"), Seq("doc_id"), "left")
      .select($"doc_id",
        coalesce($"n_seg_matches", lit(0L)).as("n_seg_matches"),
        $"n_seg_matches".isNotNull.as("found"))
      .orderBy($"doc_id")
  }

  private val mediaNearDupSql =
    s"""WITH a0 AS (
       |  SELECT doc_id, hex(encode(text)) AS h,
       |    octet_length(encode(text)) AS n
       |  FROM documents
       |  WHERE octet_length(encode(text)) >= $NearDupMinBytes)
       |SELECT doc_id,
       |  CAST(3 + CASE WHEN substring(h, 2 * (n - 8) + 1, 16)
       |                     = hex(encode('XXXXXXXX'))
       |           THEN 1 ELSE 0 END AS BIGINT) AS n_seg_matches,
       |  TRUE AS found
       |FROM a0 ORDER BY doc_id""".stripMargin

  val all: Seq[NamedQuery] = Seq(
    NamedQuery("q_binary_stats", binaryStats, Some(binaryStatsSql), bench = true),
    NamedQuery("q_frame_stats", frameStats, Some(frameStatsSql), bench = true),
    NamedQuery("q_media_shard_pack", mediaShardPack, Some(mediaShardPackSql),
      bench = true),
    NamedQuery("q_media_dedup", mediaDedup, Some(mediaDedupSql), bench = true),
    NamedQuery("q_media_neardup", mediaNearDup, Some(mediaNearDupSql),
      bench = true))
}
