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
 * Image decode is REAL: [[ImageIoDecoder]] reads PNG/JPEG/BMP/GIF with
 * the JDK's `javax.imageio` (no extra dependency) and pools an 8-float
 * feature from the actual pixels. Audio resample and video frame
 * extraction have no in-JDK codec, so the frame sampler below remains a
 * clearly-marked byte-window stand-in; the plumbing around both —
 * schema, batch shape (mapPartitions = the Scala analog of a batched
 * `mapInPandas` kernel), partitioning, column pruning — is real and
 * tested (OpsSpec).
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
   * Real JDK image decode kernel: `javax.imageio.ImageIO` ships
   * PNG/JPEG/BMP/GIF readers in the base JDK, so decoding actual pixels
   * needs no new dependency. Undecodable bytes (wrong magic, truncated
   * stream, unsupported format) are DROPPED, mirroring the ingest
   * validity filter (OP-04): one corrupt blob must not kill a 100 TB
   * decode pass — count drops via `observe` upstream if needed.
   *
   * The pooled feature is a deterministic 8-float vector from the real
   * pixel data:
   *   [0..2] mean R, G, B in [0,1]
   *   [3..6] mean luminance (Rec. 601) of the 2×2 spatial quadrants
   *   [7]    fraction of pixels brighter than 0.5 luma
   * Pixels stream row-by-row through one reused scanline buffer, so
   * decode memory is O(width), not O(pixels), whatever the image size.
   */
  object ImageIoDecoder extends ImageDecoder {
    def decodeBatch(batch: Iterator[MediaAsset]): Iterator[DecodedImage] =
      batch.flatMap { a =>
        val img =
          try Option(javax.imageio.ImageIO.read(
            new java.io.ByteArrayInputStream(a.bytes)))
          catch { case _: java.io.IOException => None }
        img.map { im =>
          val w = im.getWidth
          val h = im.getHeight
          var sr = 0.0; var sg = 0.0; var sb = 0.0
          var bright = 0L
          val quadSum = new Array[Double](4)
          val quadN = new Array[Long](4)
          val row = new Array[Int](w)
          var y = 0
          while (y < h) {
            im.getRGB(0, y, w, 1, row, 0, w)
            val qy = if (y * 2 >= h) 2 else 0
            var x = 0
            while (x < w) {
              val rgb = row(x)
              val r = ((rgb >> 16) & 0xff) / 255.0
              val g = ((rgb >> 8) & 0xff) / 255.0
              val b = (rgb & 0xff) / 255.0
              sr += r; sg += g; sb += b
              val luma = 0.299 * r + 0.587 * g + 0.114 * b
              if (luma > 0.5) bright += 1
              val q = qy + (if (x * 2 >= w) 1 else 0)
              quadSum(q) += luma
              quadN(q) += 1
              x += 1
            }
            y += 1
          }
          val n = w.toDouble * h
          val feature = Array(
            (sr / n).toFloat, (sg / n).toFloat, (sb / n).toFloat,
            (quadSum(0) / math.max(quadN(0), 1L)).toFloat,
            (quadSum(1) / math.max(quadN(1), 1L)).toFloat,
            (quadSum(2) / math.max(quadN(2), 1L)).toFloat,
            (quadSum(3) / math.max(quadN(3), 1L)).toFloat,
            (bright / n).toFloat)
          DecodedImage(a.asset_id, w, h,
            im.getColorModel.getNumComponents, feature)
        }
      }
  }

  /** Batched per-partition decode (the JVM analog of `mapInPandas`);
    * decoder defaults to the real [[ImageIoDecoder]]. */
  def decodeImages(assets: Dataset[MediaAsset],
      decoder: ImageDecoder = ImageIoDecoder)(
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
