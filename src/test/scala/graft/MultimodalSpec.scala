package graft

import graft.operators.Multimodal
import org.apache.spark.sql.functions._

/** Multimodal binary-column plumbing: typed asset schema, deterministic
  * stubbed decode via per-partition batched mapPartitions, and stability
  * across partitionings (what matters when a real codec replaces the
  * stub on a 1000-executor cluster). */
class MultimodalSpec extends GraftSuite {
  import spark.implicits._

  test("asset frame: opaque binary payload + typed metadata columns") {
    val a = Multimodal.assets(spark, sf)
    val schema = a.schema
    assert(schema("payload").dataType.typeName == "binary")
    assert(schema("media_type").dataType.typeName == "string")
    val docs = Tables.documents(spark, sf).count()
    assert(a.count() == docs)
    // every modality present, payload bytes equal the UTF-8 text length
    assert(a.toDF().select($"media_type").distinct().count() == 3)
    val bad = a.toDF().join(Tables.documents(spark, sf), "doc_id")
      .filter(length($"payload") =!= length(encode($"text", "UTF-8")))
    assert(bad.count() == 0)
  }

  test("stub decode is deterministic and partition-count invariant") {
    val a = Multimodal.assets(spark, sf)
    val m1 = canon(Multimodal.extractMeta(a).toDF())
    val m2 = canon(Multimodal.extractMeta(a.repartition(13)).toDF())
    assert(m1 == m2, "decode results must not depend on partitioning")
    // plausible image dimensions from the stub
    val metas = Multimodal.extractMeta(a).collect()
    assert(metas.forall(m => m.width >= 64 && m.height >= 64))
    assert(metas.forall(m => m.n_bytes > 0))
    // the fixture ships text bytes, not media: all rows take the
    // quarantine/fallback channel
    assert(metas.forall(!_.decoded))
  }

  /** A real w×h PNG (or JPEG) with a deterministic two-tone pixel
    * pattern, encoded through the JDK codec. */
  private def realImage(w: Int, h: Int, rgb: Int, fmt: String = "png"): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (x <- 0 until w; y <- 0 until h)
      img.setRGB(x, y, if ((x + y) % 2 == 0) rgb else 0x000000)
    val buf = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, fmt, buf)
    buf.toByteArray
  }

  test("REAL image decode: genuine PNG/JPEG bytes through the batched path") {
    val assets = Seq(
      Multimodal.Asset(1L, "image", realImage(17, 9, 0xff0000)),
      Multimodal.Asset(2L, "image", realImage(64, 64, 0x00ff00)),
      Multimodal.Asset(3L, "image", realImage(3, 5, 0x0000ff, fmt = "jpg")),
      Multimodal.Asset(4L, "image", "not an image at all".getBytes("UTF-8")))
      .toDS().repartition(3)
    val metas = Multimodal.extractMeta(assets).collect()
      .map(m => m.doc_id -> m).toMap
    assert(metas(1L).decoded && metas(1L).width == 17 && metas(1L).height == 9)
    assert(metas(2L).decoded && metas(2L).width == 64 && metas(2L).height == 64)
    assert(metas(3L).decoded && metas(3L).width == 3 && metas(3L).height == 5,
      "JPEG dimensions must decode exactly (lossy pixels, exact geometry)")
    assert(!metas(4L).decoded, "text bytes must take the fallback channel")
  }

  test("REAL audio decode: genuine WAV bytes yield exact format metadata") {
    import javax.sound.sampled._
    // synthesize a real 16-bit mono 8kHz WAV: 400 frames of a square wave
    def wav(rate: Float, channels: Int, frames: Int): Array[Byte] = {
      val fmt = new AudioFormat(rate, 16, channels, true, false)
      val pcm = new Array[Byte](frames * fmt.getFrameSize)
      for (i <- pcm.indices) pcm(i) = (if ((i / 64) % 2 == 0) 0x40 else -0x40).toByte
      val ais = new AudioInputStream(
        new java.io.ByteArrayInputStream(pcm), fmt, frames.toLong)
      val buf = new java.io.ByteArrayOutputStream()
      AudioSystem.write(ais, AudioFileFormat.Type.WAVE, buf)
      buf.toByteArray
    }
    val assets = Seq(
      Multimodal.Asset(1L, "audio", wav(8000f, 1, 400)),
      Multimodal.Asset(2L, "audio", wav(44100f, 2, 4410)),
      Multimodal.Asset(3L, "audio", "not audio".getBytes("UTF-8")))
      .toDS().repartition(2)
    val metas = Multimodal.extractAudioMeta(assets).collect()
      .map(m => m.doc_id -> m).toMap
    assert(metas(1L).decoded && metas(1L).sample_rate == 8000 &&
      metas(1L).channels == 1 && metas(1L).n_frames == 400 &&
      metas(1L).duration_ms == 50, metas(1L).toString)
    assert(metas(2L).decoded && metas(2L).sample_rate == 44100 &&
      metas(2L).channels == 2 && metas(2L).n_frames == 4410 &&
      metas(2L).duration_ms == 100, metas(2L).toString)
    assert(!metas(3L).decoded, "text bytes must take the fallback channel")
  }

  test("REAL thumbnail resize: decoded pixels, exact output geometry, determinism") {
    // solid-color source: every resampled pixel must stay that color
    val img = new java.awt.image.BufferedImage(64, 64,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (x <- 0 until 64; y <- 0 until 64) img.setRGB(x, y, 0xff0000)
    val buf = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", buf)
    val assets = Seq(
      Multimodal.Asset(1L, "image", buf.toByteArray),
      Multimodal.Asset(2L, "image", "undecodable".getBytes("UTF-8")))
      .toDS()
    val thumbs = Multimodal.thumbnails(assets, 8, 8).collect()
    assert(thumbs.map(_.doc_id).toSeq == Seq(1L),
      "undecodable payloads are dropped from the resize path")
    val t = javax.imageio.ImageIO.read(
      new java.io.ByteArrayInputStream(thumbs.head.thumb))
    assert(t.getWidth == 8 && t.getHeight == 8)
    for (x <- 0 until 8; y <- 0 until 8)
      assert((t.getRGB(x, y) & 0xffffff) == 0xff0000,
        s"solid red must survive area-averaging resize at ($x,$y)")
    // byte-deterministic across partitionings (lossless re-encode)
    val t2 = Multimodal.thumbnails(assets.repartition(5), 8, 8).collect()
    assert(t2.head.thumb.toSeq == thumbs.head.thumb.toSeq)
  }

  test("frame sampling: n frames per asset, frames are payload slices") {
    val a = Multimodal.assets(spark, sf)
    val frames = Multimodal.sampleFrames(a, n = 4, frameBytes = 32)
    assert(frames.count() == a.count() * 4)
    val byDoc = frames.collect().groupBy(_.doc_id)
    val payloads = a.collect().map(x => x.doc_id -> x.payload).toMap
    byDoc.foreach { case (id, fs) =>
      assert(fs.map(_.frame_idx).sorted.toSeq == (0 until 4))
      fs.foreach { f =>
        assert(f.frame.length <= 32)
        // every frame is a contiguous slice of the source payload
        val p = payloads(id)
        assert(new String(p, "UTF-8").contains(new String(f.frame, "UTF-8")))
      }
    }
  }

  test("resize stub: constant output size, deterministic across partitionings") {
    val a = Multimodal.assets(spark, sf)
    val t1 = Multimodal.resizeStub(a, 16).collect().map(t => t.doc_id -> t.thumb.toSeq).toMap
    val t2 = Multimodal.resizeStub(a.repartition(7), 16).collect()
      .map(t => t.doc_id -> t.thumb.toSeq).toMap
    assert(t1 == t2)
    assert(t1.values.forall(_.length == 16))
  }

  test("decode runs as one iterator per partition (batch shape), not per-row tasks") {
    val a = Multimodal.assets(spark, sf).repartition(4)
    val partitionBatches = a.mapPartitions(it => Iterator.single(it.size)).collect()
    assert(partitionBatches.length == 4)
    assert(partitionBatches.sum == a.count())
  }

  test("media dedup: planted copies collapse onto their original, bytes accounted") {
    import org.apache.spark.sql.functions._
    val out = SparkEntry.queries("q_media_dedup")(spark, sf).collect()
    val docs = Tables.documents(spark, sf)
    val planted = docs.filter(col("doc_id") % 10 === 0).count()
    assert(out.length == planted, "one duplicate group per planted copy")
    val bytesByDoc = docs
      .select(col("doc_id"), length(encode(col("text"), "UTF-8")).as("b"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    out.foreach { r =>
      val keep = r.getLong(1)
      assert(keep % 10 == 0, s"canonical copy must be the original: $r")
      assert(r.getLong(2) == 2, s"planted groups have exactly 2 members: $r")
      assert(r.getLong(3) == bytesByDoc(keep).toLong,
        s"reclaimed bytes must equal one payload: $r")
    }
  }

  test("media near-dup: tail corruption cannot evade the segment bands") {
    import org.apache.spark.sql.functions._
    val out = SparkEntry.queries("q_media_neardup")(spark, sf).collect()
    val eligible = Tables.documents(spark, sf)
      .filter(length(encode(col("text"), "UTF-8")) >=
        operators.Multimodal.NearDupMinBytes)
      .count()
    assert(out.length == eligible, "one verdict row per eligible asset")
    out.foreach { r =>
      assert(r.getBoolean(2), s"planted near-dup must be found: $r")
      val n = r.getLong(1)
      assert(n == 3L || n == 4L,
        s"a one-segment corruption leaves 3 of 4 segments intact: $r")
    }
  }
}
