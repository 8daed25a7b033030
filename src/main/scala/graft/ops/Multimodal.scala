package graft.ops

import java.io.ByteArrayInputStream

import javax.imageio.ImageIO

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: media content travels as an opaque
  * `binary` column with a typed metadata struct; decode / feature
  * extraction runs partition-parallel over batches.
  *
  * Image decode is REAL: payloads with an image mime type go through the JDK's
  * `javax.imageio` (PNG/BMP/GIF/JPEG ship with the JDK — no external
  * codecs) and produce pixel-derived features (dimensions, per-channel
  * means, 16-bin luminance histogram). Non-image mime types fall back
  * to deterministic byte-level features (checksum + frame count), the
  * honest stand-in for codecs the JDK doesn't carry (audio/video).
  */
object Multimodal {

  /** The media row contract: id + opaque bytes + typed metadata. */
  case class MediaMeta(mimeType: String, sizeBytes: Long, tag: String)
  case class MediaRow(media_id: Long, content: Array[Byte], meta: MediaMeta)

  /** Decoded features. Byte-level fields are filled for every row;
    * pixel fields (`width`…`luma_hist`) are populated only when the
    * payload decodes as an image (`width == -1` otherwise, so a missing
    * codec is visible, never silently zero).
    */
  case class MediaFeatures(media_id: Long, n_bytes: Long, checksum: Long,
      n_frames: Int, mime: String, width: Int, height: Int,
      mean_r: Double, mean_g: Double, mean_b: Double, luma_hist: Array[Long])

  /** Build a media table from any (id, string-content, tag) source —
    * used by tests and as the pattern for binary ingestion.
    */
  def fromText(df: DataFrame, idCol: String = "doc_id",
      textCol: String = "text", tagCol: String = "source"): DataFrame =
    df.select(
      col(idCol).as("media_id"),
      encode(col(textCol), "UTF-8").as("content"),
      struct(
        lit("text/plain").as("mimeType"),
        octet_length(col(textCol)).cast("long").as("sizeBytes"),
        col(tagCol).as("tag")).as("meta"))

  val LumaBins = 16

  /** Pixel features via the JDK decoder: dimensions, per-channel means,
    * and a 16-bin luminance (BT.601 integer weights) histogram. Returns
    * None when the bytes don't decode (truncated file, unsupported
    * format) — the caller falls back to byte-level features rather than
    * failing the task, because at 100 TB some corrupt payloads are a
    * certainty and one bad row must not kill a 10^6-row partition.
    */
  private def imageFeatures(bytes: Array[Byte]): Option[(Int, Int, Double, Double, Double, Array[Long])] =
    try {
      val img = ImageIO.read(new ByteArrayInputStream(bytes))
      if (img == null || img.getWidth <= 0 || img.getHeight <= 0) None
      else {
        val w = img.getWidth
        val h = img.getHeight
        var sr = 0L; var sg = 0L; var sb = 0L
        val hist = new Array[Long](LumaBins)
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w) {
            val p = img.getRGB(x, y)
            val r = (p >> 16) & 0xff
            val g = (p >> 8) & 0xff
            val b = p & 0xff
            sr += r; sg += g; sb += b
            hist(((r * 299 + g * 587 + b * 114) / 1000) >> 4) += 1
            x += 1
          }
          y += 1
        }
        val n = w.toLong * h
        Some((w, h, sr.toDouble / n, sg.toDouble / n, sb.toDouble / n, hist))
      }
    } catch { case _: Exception => None }

  private val NoHist = Array.empty[Long]

  private def extract(r: MediaRow): MediaFeatures = {
    val checksum = r.content.foldLeft(0L)((acc, b) => acc * 31 + (b & 0xff))
    val img = if (r.meta.mimeType.startsWith("image/")) imageFeatures(r.content) else None
    val (w, h, mr, mg, mb, hist) =
      img.getOrElse((-1, -1, -1.0, -1.0, -1.0, NoHist))
    MediaFeatures(
      media_id = r.media_id,
      n_bytes = r.content.length.toLong,
      checksum = checksum,
      n_frames = (r.content.length + FrameBytes - 1) / FrameBytes,
      mime = r.meta.mimeType,
      width = w, height = h, mean_r = mr, mean_g = mg, mean_b = mb,
      luma_hist = hist)
  }

  /** Partition-parallel decode: one pass per executor partition, one
    * output row per media item. Images decode to pixel features;
    * everything else gets byte-level features.
    */
  def decode(media: Dataset[MediaRow]): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions(_.map(extract))
  }

  /** Batched decode mirroring the Arrow / mapInPandas contract: the
    * decoder sees an ITERATOR OF BATCHES — real codecs are vectorized
    * and amortize per-call overhead (model load, GPU transfer, JNI
    * crossing) across a batch, so the per-row shape above is the wrong
    * plumbing for them. `grouped` keeps the iterator lazy: at most one
    * batch of rows is resident per task, regardless of partition size.
    * ImageIO itself is per-image, so the batch body maps; a vectorized
    * codec would take the whole `batch` in one call — assembly,
    * laziness, and output flattening stay identical.
    */
  def decodeBatched(media: Dataset[MediaRow],
      batchSize: Int = 128): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    require(batchSize > 0)
    media.mapPartitions(_.grouped(batchSize).flatMap(_.map(extract)))
  }

  /** "Resize" plumbing: normalize every media payload to exactly
    * `targetBytes` via stride sampling (truncate/repeat for the stub) —
    * the byte-level stand-in for image resize / audio resample, which
    * is what embedding models need before batching (fixed input shape).
    * STUB: a real implementation decodes, resamples, and re-encodes;
    * the fixed-output-shape contract and per-partition batching stay.
    */
  def resizeStub(media: Dataset[MediaRow], targetBytes: Int = 256): Dataset[MediaRow] = {
    import media.sparkSession.implicits._
    require(targetBytes > 0)
    media.mapPartitions { rows =>
      rows.map { r =>
        val src = r.content
        val out = new Array[Byte](targetBytes)
        if (src.nonEmpty) {
          var i = 0
          while (i < targetBytes) {
            // stride-sample proportionally across the source payload
            out(i) = src(((i.toLong * src.length) / targetBytes).toInt)
            i += 1
          }
        }
        r.copy(content = out,
          meta = r.meta.copy(sizeBytes = targetBytes.toLong))
      }
    }
  }

  val FrameBytes = 64

  /** Frame sampling without leaving Catalyst: slice the binary column
    * into fixed-size frames and keep every `stride`-th one.
    */
  def sampleFrames(df: DataFrame, binCol: String = "content",
      stride: Int = 4): DataFrame = {
    val n = octet_length(col(binCol))
    val nFrames = ceil(n / lit(FrameBytes.toDouble)).cast("int")
    val frames = transform(sequence(lit(0), nFrames - 1),
      i => col(binCol).substr(i * FrameBytes + 1, lit(FrameBytes)))
    df.withColumn("frames",
      filter(frames, (_, i) => i % stride === 0))
  }
}
