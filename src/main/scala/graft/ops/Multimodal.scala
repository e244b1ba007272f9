package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Typed record for a multimodal asset: opaque bytes + typed metadata. */
case class MediaAsset(
    asset_id: Long,
    kind: String,          // "image" | "audio" | "video"
    bytes: Array[Byte],
    meta_mime: String)

case class DecodedImage(
    asset_id: Long,
    width: Int,
    height: Int,
    channels: Int,
    feature: Array[Float]) // pooled feature vector

/**
 * Multimodal-column plumbing (SURVEY.md §7.1 M6): image/audio/video as
 * opaque `binary` columns with typed metadata, flowing through Spark as
 * ordinary columns — partitionable, spillable, prunable.
 *
 * The actual codecs (JPEG decode, audio resample, video frame extract)
 * are NOT in this container, so the decode kernel is a clearly-marked
 * deterministic STUB: it derives fake dimensions/features from the byte
 * content. Everything around it — schema, batch shape (mapPartitions =
 * the Scala analog of a batched `mapInPandas` kernel), partitioning,
 * column pruning — is real and tested (MultimodalSpec).
 */
object Multimodal {

  /** Wrap a text table as binary assets — stands in for reading real
    * media files; at scale this is a binaryFile / parquet-blob scan. */
  def assetsFromDocuments(doc: DataFrame): DataFrame =
    doc.select(
      col("doc_id").as("asset_id"),
      when(col("doc_id") % 3 === 0, "image")
        .when(col("doc_id") % 3 === 1, "audio")
        .otherwise("video").as("kind"),
      encode(col("text"), "utf-8").as("bytes"),
      lit("application/octet-stream").as("meta_mime"))

  /** Binary metadata extraction as pure column expressions (codegen'd):
    * byte length, content digest, head bytes. */
  def withBinaryMeta(assets: DataFrame): DataFrame =
    assets
      .withColumn("n_bytes", length(col("bytes")).cast("long"))
      .withColumn("digest", sha2(col("bytes"), 256))
      .withColumn("head_hex", lower(hex(substring(col("bytes"), 1, 8))))

  /**
   * The decoder SEAM: a real codec drops in as an implementation of this
   * trait with NO plan change — [[decodeImages]] fixes the plan shape
   * (one batched `mapPartitions` kernel: iterator in, iterator out, no
   * per-row JVM↔native round trips) and the output schema; the trait
   * only supplies the per-batch kernel body. Asserted in OpsSpec's
   * decoder-seam test with an injected fake codec.
   */
  trait ImageDecoder extends Serializable {
    def decodeBatch(batch: Iterator[MediaAsset]): Iterator[DecodedImage]
  }

  /**
   * STUB decode kernel — deterministic fake standing in for a real image
   * decoder (this container has no codec). It derives fake
   * dimensions/features from the byte content so the plumbing is
   * testable end to end.
   */
  object StubImageDecoder extends ImageDecoder {
    def decodeBatch(batch: Iterator[MediaAsset]): Iterator[DecodedImage] =
      batch.map { a =>
        // ??? real decoder goes here; deterministic fake derived from bytes:
        val n = a.bytes.length
        val w = 16 + (n % 64)
        val h = 16 + ((n / 64) % 64)
        val feature = Array.tabulate(8) { i =>
          if (n == 0) 0f
          else a.bytes(i % n).toFloat / 128f
        }
        DecodedImage(a.asset_id, w, h, 3, feature)
      }
  }

  /** Batched per-partition decode (the JVM analog of `mapInPandas`);
    * decoder defaults to the honest [[StubImageDecoder]]. */
  def decodeImages(assets: Dataset[MediaAsset],
      decoder: ImageDecoder = StubImageDecoder)(
      implicit spark: SparkSession): Dataset[DecodedImage] = {
    import spark.implicits._
    assets.mapPartitions(decoder.decodeBatch)
  }

  /** STUB frame sampler — every `stride`-th byte window stands in for
    * every N-th video frame; the slicing/explode plumbing is the real
    * shape (one output row per sampled frame, order preserved). */
  def sampleFrames(assets: DataFrame, stride: Int = 16,
      frameBytes: Int = 8): DataFrame =
    assets
      .withColumn("frame_no",
        explode(sequence(lit(0),
          greatest(expr(s"(length(bytes) - 1) div $stride"), lit(0)))))
      .withColumn("frame",
        substring_index_bytes(col("bytes"), col("frame_no"), stride,
          frameBytes))
      .select(col("asset_id"), col("frame_no").cast("long").as("frame_no"),
        lower(hex(col("frame"))).as("frame_hex"))

  private def substring_index_bytes(bytes: org.apache.spark.sql.Column,
      frameNo: org.apache.spark.sql.Column, stride: Int, len: Int) =
    expr(s"substring(bytes, CAST(frame_no * $stride + 1 AS INT), $len)")
}
