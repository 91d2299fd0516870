package graft.ext

import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark
import graft.core.Tables

class MultimodalSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("decodeFeatures: deterministic, bytes preserved, features bounded") {
    val docs = Tables.load(spark, TestSpark.Sf, "documents")
    val media = Multimodal.asMedia(docs, "doc_id", "text")
    val f1 = Multimodal.decodeFeatures(spark, media).collect().sortBy(_.media_id)
    val f2 = Multimodal.decodeFeatures(spark, media, batchSize = 7).collect().sortBy(_.media_id)
    assert(f1.toSeq == f2.toSeq, "batch size must not affect results")
    val lens = docs.selectExpr("doc_id", "length(text) AS l").collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    f1.foreach { f =>
      assert(f.n_bytes == lens(f.media_id))
      assert(f.width >= 1 && f.width <= 1920 && f.height >= 1 && f.height <= 1080)
    }
  }

  test("frameSample: deterministic even-spaced frames covering the payload") {
    val docs = Tables.load(spark, TestSpark.Sf, "documents").limit(50)
    val media = Multimodal.asMedia(docs, "doc_id", "text")
    val frames = Multimodal.frameSample(spark, media, nFrames = 4).collect()
    val byDoc = frames.groupBy(_.media_id)
    assert(byDoc.values.forall(_.length == 4)) // all fixture docs are > 4 bytes
    byDoc.values.foreach { fs =>
      val sorted = fs.sortBy(_.frame_idx)
      assert(sorted.map(_.offset).toSeq == sorted.map(_.offset).toSeq.sorted)
      assert(sorted.forall(f => f.n_bytes > 0))
    }
    // determinism across batch sizes
    val again = Multimodal.frameSample(spark, media, nFrames = 4, batchSize = 7)
      .collect().sortBy(f => (f.media_id, f.frame_idx))
    assert(again.toSeq == frames.sortBy(f => (f.media_id, f.frame_idx)).toSeq)
  }

  test("imageFeatures: REAL decode round-trip — dims, means, aHash all from actual pixels") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val ids = (0L until 200L).toDF("id")
    val media = Multimodal.renderMedia(spark, ids, "id", nVariants = 20)
    val feats = Multimodal.imageFeatures(spark, media).collect().sortBy(_.media_id)
    assert(feats.length == 200 && feats.forall(_.decode_ok))
    // decoded dims match what renderMedia encoded for the id's variant
    feats.foreach { f =>
      val v = f.media_id % 20
      assert(f.width == 48 + (v % 4).toInt * 8 && f.height == 32 + (v % 3).toInt * 8)
      assert(f.mean_r > 0 && f.mean_r < 255 &&
        f.mean_g >= 0 && f.mean_g < 255 && f.mean_b >= 0 && f.mean_b < 255)
    }
    // deterministic across batch sizes (vectorized-decode contract)
    val again = Multimodal.imageFeatures(spark, media, batchSize = 7)
      .collect().sortBy(_.media_id)
    assert(again.toSeq == feats.toSeq)
    // perceptual grouping: same variant ⇒ same aHash even though payload
    // BYTES differ (per-id noise); different variants get distinct hashes
    val byVariant = feats.groupBy(_.media_id % 20)
    assert(byVariant.values.forall(g => g.map(_.ahash).distinct.length == 1),
      "noisy copies of one variant must agree on the perceptual hash")
    assert(byVariant.map(_._2.head.ahash).toSeq.distinct.length == 20,
      "distinct variants must not collide")
    val payloads = media.collect()
      .map(r => r.getLong(0) -> r.getAs[Array[Byte]](1).toSeq).toMap
    // the per-replica watermark guarantees EVERY same-variant pair is
    // byte-distinct, not just one sampled pair
    for (v <- 0L until 20L) {
      val group = (0 until 10).map(rep => payloads(v + rep * 20L))
      assert(group.distinct.length == group.length,
        s"variant $v replicas must all be byte-distinct")
    }
    // non-image payloads: decode_ok = false row, not a task failure
    val garbage = Seq((999L, "not a png".getBytes("UTF-8"))).toDF("media_id", "payload")
    val g = Multimodal.imageFeatures(spark, garbage).collect()
    assert(g.length == 1 && !g.head.decode_ok && g.head.ahash == 0L)
  }

  test("resizeEncode: real pixel resample — output re-decodes at the fitted size, aHash preserved") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val ids = Seq(7L, 27L).toDF("id") // same variant (7 % 20) at nVariants=20
    val media = Multimodal.renderMedia(spark, ids, "id", nVariants = 20)
    val resized = Multimodal.resizeEncode(spark, media, maxW = 28, maxH = 28)
    val back = Multimodal.imageFeatures(spark,
      resized.select(col("media_id"), col("payload"))).collect().sortBy(_.media_id)
    assert(back.forall(_.decode_ok))
    // variant 7: 48+3*8=72 wide, 32+1*8=40 tall -> fit into 28x28
    assert(back.forall(f => f.width == 28 && f.height == 15))
    // perceptual hash survives a real downscale (that is the point of aHash)
    val orig = Multimodal.imageFeatures(spark, media).collect().sortBy(_.media_id)
    assert(java.lang.Long.bitCount(orig.head.ahash ^ back.head.ahash) <= 6,
      "aHash must be stable under resize (small hamming drift allowed)")
  }

  test("audioFeatures: REAL WAV decode — format, duration, and the signal itself verified") {
    import spark.implicits._
    val ids = (0L until 64L).toDF("id")
    val media = Multimodal.renderAudioMedia(spark, ids, "id", nVariants = 16, nFrames = 2000)
    val feats = Multimodal.audioFeatures(spark, media).collect().sortBy(_.media_id)
    assert(feats.length == 64 && feats.forall(_.decode_ok))
    feats.foreach { f =>
      assert(f.sample_rate == 8000 && f.channels == 1 && f.n_frames == 2000)
      assert(math.abs(f.duration_ms - 250.0) < 1e-9)
      // two-harmonic tone at amplitudes (10000, 3000): rms = sqrt((10000^2
      // + 3000^2)/2) ≈ 7382 — the DECODED samples must reproduce it
      assert(math.abs(f.rms - 7382) < 150, s"rms ${f.rms}")
      // zero-crossing rate tracks the fundamental: zcr ≈ 2 f0 / rate
      val f0 = 220.0 + (f.media_id % 16) * 55.0
      assert(math.abs(f.zcr - 2 * f0 / 8000) < 0.02,
        s"zcr ${f.zcr} for f0 $f0")
    }
    // byte-distinct within a variant (watermark), deterministic across batches
    val payloads = media.collect().map(r => r.getLong(0) -> r.getAs[Array[Byte]](1).toSeq).toMap
    for (v <- 0L until 16L) {
      val group = (0 until 4).map(rep => payloads(v + rep * 16L))
      assert(group.distinct.length == group.length,
        s"variant $v audio replicas must all be byte-distinct")
    }
    val again = Multimodal.audioFeatures(spark, media, batchSize = 7).collect().sortBy(_.media_id)
    assert(again.toSeq == feats.toSeq)
    // garbage payload: decode_ok=false row, not a task failure
    val g = Multimodal.audioFeatures(spark,
      Seq((9L, "RIFFnope".getBytes("UTF-8"))).toDF("media_id", "payload")).collect()
    assert(g.length == 1 && !g.head.decode_ok)
  }

  test("watermark edges: tiny images don't overflow; >24-bit watermarks stay distinct") {
    // 4x4 = 16 px < 48 watermark bits: must not throw (regression — the
    // first watermark version indexed px(0..23) unguarded)
    val tiny = Multimodal.renderSyntheticPng(0, 4, 4, watermark = 0xffffffffffffL)
    assert(tiny.nonEmpty)
    // replica indices beyond 2^24 must still be byte-distinct (48 bits)
    val a = Multimodal.renderSyntheticPng(1, 48, 32, watermark = 7L)
    val b = Multimodal.renderSyntheticPng(1, 48, 32, watermark = 7L + (1L << 24))
    assert(a.toSeq != b.toSeq, "watermarks differing only above bit 24 must differ")
    val wa = Multimodal.renderSyntheticWav(1, 2000, watermark = 7L)
    val wb = Multimodal.renderSyntheticWav(1, 2000, watermark = 7L + (1L << 24))
    assert(wa.toSeq != wb.toSeq)
  }

  test("Wav codec: fuzz — random bytes never throw; random PCM round-trips exactly") {
    val rnd = new scala.util.Random(42) // deterministic fuzz corpus
    for (_ <- 0 until 300) {
      val garbage = new Array[Byte](rnd.nextInt(200))
      rnd.nextBytes(garbage)
      Multimodal.Wav.parse16(garbage) // must not throw
      // adversarial: valid magics + corrupt chunk sizes
      if (garbage.length >= 44) {
        "RIFF".getBytes.copyToArray(garbage, 0)
        "WAVE".getBytes.copyToArray(garbage, 8)
        Multimodal.Wav.parse16(garbage) // must not throw either
      }
    }
    for (_ <- 0 until 50) {
      val pcm = new Array[Byte](rnd.nextInt(500) * 2)
      rnd.nextBytes(pcm)
      val wav = Multimodal.Wav.encode16(pcm, sampleRate = 44100, channels = 2)
      val Some((rate, ch, off, len)) = Multimodal.Wav.parse16(wav)
      assert(rate == 44100 && ch == 2 && len == pcm.length)
      assert(wav.slice(off, off + len).toSeq == pcm.toSeq)
    }
  }

  test("Wav codec: bidirectional byte-interop with the JDK javax.sound codec") {
    import javax.sound.sampled._
    // OUR bytes parse through the JDK codec with identical format/frames
    val ours = Multimodal.renderSyntheticWav(variant = 3, nFrames = 500, watermark = 1)
    val ais = AudioSystem.getAudioInputStream(new java.io.ByteArrayInputStream(ours))
    assert(ais.getFormat.getSampleRate == 8000f && ais.getFormat.getChannels == 1 &&
      ais.getFormat.getSampleSizeInBits == 16 && !ais.getFormat.isBigEndian &&
      ais.getFrameLength == 500)
    val jdkPcm = ais.readAllBytes()
    // JDK-WRITTEN bytes parse through our parser with identical PCM
    val fmt = new AudioFormat(8000f, 16, 1, true, false)
    val out = new java.io.ByteArrayOutputStream()
    AudioSystem.write(new AudioInputStream(
      new java.io.ByteArrayInputStream(jdkPcm), fmt, 500L),
      AudioFileFormat.Type.WAVE, out)
    val Some((rate, ch, off, len)) = Multimodal.Wav.parse16(out.toByteArray)
    assert(rate == 8000 && ch == 1 && len == 1000)
    assert(out.toByteArray.slice(off, off + len).toSeq == jdkPcm.toSeq,
      "PCM must round-trip bit-identically through both codecs")
  }

  test("resizeFit: aspect-preserving downscale, never upscale") {
    import spark.implicits._
    val feats = Seq(
      (1L, 1920, 1080), (2L, 100, 50), (3L, 4000, 500), (4L, 500, 4000)
    ).toDF("media_id", "width", "height")
    val out = Multimodal.resizeFit(feats, 640, 480)
      .collect().map(r => r.getLong(0) -> ((r.getInt(3), r.getInt(4)))).toMap
    assert(out(1L) == ((640, 360)))   // 1920x1080 -> fit width
    assert(out(2L) == ((100, 50)))    // already fits: no upscale
    assert(out(3L) == ((640, 80)))    // extreme wide
    assert(out(4L) == ((60, 480)))    // extreme tall
  }
}
