package graft.ext

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing (extension, SURVEY.md §7.5): image/audio/
  * video as opaque `binary` columns with typed metadata, processed in
  * fixed-size batches per partition.
  *
  * The Spark-side plumbing — schemas, partition-parallel batched
  * iteration, deterministic output shapes, aspect-ratio math — is real
  * and tested. The actual media decode is STUBBED (===> `fakeDecode` /
  * `frameCrc` <===): this container has no image/audio codecs, so a
  * deterministic CRC-based fake stands in where a JNI/FFI decoder (or
  * `mapInArrow` to a Python worker running PIL/ffmpeg) would plug in.
  * Every operator is a narrow transform: no shuffles, scales linearly
  * with the corpus.
  */
object Multimodal {
  final case class MediaRow(media_id: Long, payload: Array[Byte])
  final case class MediaFeatures(media_id: Long, n_bytes: Int,
                                 width: Int, height: Int, feature_crc: Long)
  /** One sampled "frame": a deterministic byte-range of the payload. */
  final case class Frame(media_id: Long, frame_idx: Int, offset: Int,
                         n_bytes: Int, frame_crc: Long)

  /** Simulate an opaque media payload column from the documents fixture
    * (text bytes as stand-in blob) + typed metadata.
    */
  def asMedia(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.select(col(idCol).cast("long").as("media_id"),
      col(textCol).cast("binary").as("payload"))

  private def crc(bytes: Array[Byte], from: Int, len: Int): Long = {
    val c = new java.util.zip.CRC32()
    c.update(bytes, from, len)
    c.getValue
  }

  /** STUB decode: deterministic pseudo-dimensions + feature hash from a
    * CRC32 of the bytes. Replace with a real decoder; the signature
    * (bytes in, fixed-width features out) and the batched partition
    * iteration are the contract.
    */
  private def fakeDecode(payload: Array[Byte]): (Int, Int, Long) = {
    val h = crc(payload, 0, payload.length)
    (((h % 1920) + 1).toInt, ((h / 1920 % 1080) + 1).toInt, h)
  }

  /** Batched per-partition "decode": mirrors the mapInPandas/mapInArrow
    * batch shape (`batchSize` rows per decode call) so a vectorized
    * decoder drops in without changing the plan. Partition-parallel,
    * no shuffle.
    */
  def decodeFeatures(spark: SparkSession, media: DataFrame,
                     batchSize: Int = 64): Dataset[MediaFeatures] = {
    import spark.implicits._
    media.as[MediaRow].mapPartitions { it =>
      it.grouped(batchSize).flatMap { batch =>
        // one "vectorized decode call" per batch
        batch.map { r =>
          val (w, h, f) = fakeDecode(r.payload)
          MediaFeatures(r.media_id, r.payload.length, w, h, f)
        }
      }
    }
  }

  /** Frame sampling for video-like payloads: `nFrames` evenly-spaced
    * byte-ranges per payload (the stub analog of keyframe extraction).
    * Offsets are deterministic; per-frame CRC stands in for the decoded
    * frame tensor. Emits up to payload-length frames for tiny payloads.
    */
  def frameSample(spark: SparkSession, media: DataFrame, nFrames: Int,
                  batchSize: Int = 64): Dataset[Frame] = {
    import spark.implicits._
    media.as[MediaRow].mapPartitions { it =>
      it.grouped(batchSize).flatMap { batch =>
        batch.flatMap { r =>
          val len = r.payload.length
          val frames = math.min(nFrames, math.max(len, 1))
          val step = math.max(len / frames, 1)
          (0 until frames).iterator.map { i =>
            val off = math.min(i * step, math.max(len - 1, 0))
            val n = math.min(step, len - off)
            Frame(r.media_id, i, off, n,
              if (n > 0) crc(r.payload, off, n) else 0L)
          }
        }
      }
    }
  }

  /** "Resize" at the metadata level: aspect-preserving fit of decoded
    * (width, height) into a `maxW`×`maxH` box — the real geometry a
    * resize kernel would apply; the pixel transform itself is the stub.
    * Pure column arithmetic, codegen'd.
    */
  def resizeFit(features: DataFrame, maxW: Int, maxH: Int): DataFrame = {
    val scale = least(
      lit(maxW.toDouble) / col("width"),
      lit(maxH.toDouble) / col("height"),
      lit(1.0))
    features
      .withColumn("out_width", greatest(floor(col("width") * scale), lit(1)).cast("int"))
      .withColumn("out_height", greatest(floor(col("height") * scale), lit(1)).cast("int"))
  }
}
