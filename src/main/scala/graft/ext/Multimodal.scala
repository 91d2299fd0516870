package graft.ext

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing (extension, SURVEY.md §7.5): image/audio/
  * video as opaque `binary` columns with typed metadata, processed in
  * fixed-size batches per partition.
  *
  * The Spark-side plumbing — schema, partition-parallel batch iteration,
  * deterministic output shape — is real and tested. The actual media
  * decode is STUBBED (===> `fakeDecode` <===): this container has no
  * image/audio codecs, so a deterministic CRC-based fake stands in where
  * a JNI/FFI decoder (or `mapInArrow` to a Python worker) would plug in.
  */
object Multimodal {
  final case class MediaRow(media_id: Long, payload: Array[Byte])
  final case class MediaFeatures(media_id: Long, n_bytes: Int,
                                 width: Int, height: Int, feature_crc: Long)

  /** Simulate an opaque media payload column from the documents fixture
    * (text bytes as stand-in blob) + typed metadata.
    */
  def asMedia(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.select(col(idCol).cast("long").as("media_id"),
      col(textCol).cast("binary").as("payload"))

  /** STUB decode: deterministic pseudo-features from a CRC32 of the bytes.
    * Replace with a real decoder; the signature (bytes in, fixed-width
    * features out) and the batched partition iteration are the contract.
    */
  private def fakeDecode(payload: Array[Byte]): (Int, Int, Long) = {
    val crc = new java.util.zip.CRC32()
    crc.update(payload)
    val h = crc.getValue
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
}
