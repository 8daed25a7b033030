package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: media content travels as an opaque
  * `binary` column with a typed metadata struct; decode / feature
  * extraction runs partition-parallel over batches.
  *
  * The actual media decode is STUBBED (no image/audio codecs in this
  * environment): [[decodeStub]] produces deterministic byte-level
  * features in place of real pixel/sample decoding. Everything around it
  * — the schema contract, the mapPartitions batch shape, frame slicing,
  * and partitioning — is real and tested; swapping in a real decoder
  * changes only the function body marked STUB below.
  */
object Multimodal {

  /** The media row contract: id + opaque bytes + typed metadata. */
  case class MediaMeta(mimeType: String, sizeBytes: Long, tag: String)
  case class MediaRow(media_id: Long, content: Array[Byte], meta: MediaMeta)
  case class MediaFeatures(media_id: Long, n_bytes: Long, checksum: Long,
      n_frames: Int, mime: String)

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

  /** Partition-parallel "decode": one pass per executor partition, one
    * output row per media item. Deterministic fake features stand in for
    * codec output. STUB: replace the body of `features` with a real
    * decoder (e.g. image dims, audio duration) — signature and batch
    * shape stay identical.
    */
  def decodeStub(media: Dataset[MediaRow]): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      rows.map { r =>
        // STUB decode: byte-fold checksum in place of real media parsing.
        val checksum = r.content.foldLeft(0L)((acc, b) => acc * 31 + (b & 0xff))
        MediaFeatures(
          media_id = r.media_id,
          n_bytes = r.content.length.toLong,
          checksum = checksum,
          n_frames = (r.content.length + FrameBytes - 1) / FrameBytes,
          mime = r.meta.mimeType)
      }
    }
  }

  /** Batched decode mirroring the Arrow / mapInPandas contract: the
    * decoder sees an ITERATOR OF BATCHES — real codecs are vectorized
    * and amortize per-call overhead (model load, GPU transfer, JNI
    * crossing) across a batch, so the per-row shape above is the wrong
    * plumbing for them. `grouped` keeps the iterator lazy: at most one
    * batch of rows is resident per task, regardless of partition size.
    * STUB: a real implementation hands the whole `batch` to the codec
    * in one call; batch assembly, laziness, and output flattening stay.
    */
  def decodeStubBatched(media: Dataset[MediaRow],
      batchSize: Int = 128): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    require(batchSize > 0)
    media.mapPartitions { rows =>
      rows.grouped(batchSize).flatMap { batch =>
        // STUB vectorized decode (same features as the per-row stub).
        batch.map { r =>
          val checksum = r.content.foldLeft(0L)((acc, b) => acc * 31 + (b & 0xff))
          MediaFeatures(r.media_id, r.content.length.toLong, checksum,
            (r.content.length + FrameBytes - 1) / FrameBytes, r.meta.mimeType)
        }
      }
    }
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
