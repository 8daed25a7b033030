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

  // ImageIO defaults to FILE-cached image input/output streams: every
  // per-row decode (createImageInputStream in headerDims/ImageIO.read)
  // AND every per-row PNG encode (ImageIO.write's createImageOutputStream)
  // creates-and-deletes a temp file in java.io.tmpdir. At corpus scale
  // that is millions of tmpfs syscalls per task, and on a shared host it
  // couples image throughput to OTHER tenants' /tmp load — the r7
  // image_ahash 0.62 s → 3.55 s swing with byte-identical code. Payloads
  // here are per-row byte arrays (bounded by MaxRasterBytes), so the
  // memory-cached stream is strictly better. JVM-global, set once at
  // object init — every image path in the engine routes through this
  // object, so executors hit it before their first decode.
  javax.imageio.ImageIO.setUseCache(false)

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

  /** Decompression-bomb budget: the largest raster a single payload may
    * allocate, in BYTES (not pixels: a 64-MPx 16-bit RGBA image is
    * ~512 MB — twice what the same pixel count costs as TYPE_INT_RGB,
    * and several such rows decode concurrently across tasks). A
    * web-crawl corpus WILL contain hostile images whose tiny compressed
    * payload declares a gigapixel canvas; `ImageIO.read` would allocate
    * the full raster and kill the executor with an OutOfMemoryError —
    * an Error, which the one-bad-row catch below does not (and must
    * not) swallow. So dimensions AND the reader's bytes-per-pixel are
    * read from the HEADER first and oversized rasters are rejected
    * before any raster exists.
    */
  val MaxRasterBytes: Long = 256L * 1024 * 1024

  /** Header-only dimensions + estimated raster bytes-per-pixel — no
    * raster allocation. None when no registered reader recognizes the
    * payload. bpp comes from the reader's declared image type (e.g. 8
    * for 16-bit RGBA), floored at 4 (TYPE_INT_RGB reality: getRGB-era
    * conversions materialize at least an int per pixel).
    */
  private def headerDims(bytes: Array[Byte]): Option[(Int, Int, Int)] =
    try {
      val iis = ImageIO.createImageInputStream(new ByteArrayInputStream(bytes))
      if (iis == null) None
      else try {
        val readers = ImageIO.getImageReaders(iis)
        if (!readers.hasNext) None
        else {
          val r = readers.next()
          try {
            r.setInput(iis)
            val bpp = try {
              val types = r.getImageTypes(0)
              if (types.hasNext)
                math.max(4, (types.next().getColorModel.getPixelSize + 7) / 8)
              else 4
            } catch { case _: Exception => 4 }
            Some((r.getWidth(0), r.getHeight(0), bpp))
          } finally r.dispose()
        }
      } finally iis.close()
    } catch { case _: Exception => None }

  /** Guarded decode: header dims first, raster only within the byte
    * budget (w · h · bytes-per-pixel ≤ [[MaxRasterBytes]]).
    */
  private def decodeImage(bytes: Array[Byte]): Option[java.awt.image.BufferedImage] =
    try {
      headerDims(bytes) match {
        case Some((w, h, bpp)) if w > 0 && h > 0 &&
            w.toLong * h * bpp <= MaxRasterBytes =>
          Option(ImageIO.read(new ByteArrayInputStream(bytes)))
        case _ => None
      }
    } catch { case _: Exception => None }

  /** Pixel features via the JDK decoder: dimensions, per-channel means,
    * and a 16-bin luminance (BT.601 integer weights) histogram. Returns
    * None when the bytes don't decode (truncated file, unsupported
    * format, or a raster past [[MaxRasterBytes]]) — the caller falls back to
    * byte-level features rather than failing the task, because at 100 TB
    * some corrupt payloads are a certainty and one bad row must not kill
    * a 10^6-row partition.
    */
  private def imageFeatures(bytes: Array[Byte]): Option[(Int, Int, Double, Double, Double, Array[Long])] =
    try {
      val img = decodeImage(bytes).orNull
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

  /** Decoded audio features. `sample_rate == -1` marks a payload the
    * JDK could not parse (wrong mime, corrupt, or a compressed format
    * outside the JDK's PCM WAV/AIFF/AU support) — visible, never
    * silently zero, mirroring the image contract.
    */
  case class AudioFeatures(media_id: Long, n_bytes: Long, mime: String,
      sample_rate: Int, channels: Int, n_samples: Long, duration_ms: Long,
      rms: Double, zero_crossings: Long)

  /** REAL audio decode for the formats the JDK carries (PCM WAV / AIFF /
    * AU via `javax.sound.sampled` — no external codecs): sample rate,
    * channel count, exact sample count, duration, RMS amplitude
    * (normalized to [0,1] full scale) and zero-crossing count — the
    * standard cheap features a speech/audio pipeline filters on before
    * any model runs (silence, clipping, wrong-rate detection).
    * Determinism: RMS accumulates integer sample squares in int64 and
    * takes one sqrt at the end; crossings are integer sign-change
    * counts over channel-0. Compressed formats (mp3/ogg/aac) have no
    * JDK decoder and fall back to `sample_rate = -1` byte features —
    * the environmental boundary, now limited to COMPRESSED audio only.
    */
  private def audioFeatures(bytes: Array[Byte]): Option[(Int, Int, Long, Long, Double, Long)] =
    try {
      val ais = javax.sound.sampled.AudioSystem.getAudioInputStream(
        new ByteArrayInputStream(bytes))
      try {
        val fmt = ais.getFormat
        val enc = fmt.getEncoding
        val ok = (enc == javax.sound.sampled.AudioFormat.Encoding.PCM_SIGNED) &&
          fmt.getSampleSizeInBits == 16 && fmt.getChannels >= 1
        if (!ok) None
        else {
          val data = ais.readAllBytes()
          val ch = fmt.getChannels
          val frameBytes = 2 * ch
          val nFrames = data.length / frameBytes
          var sumSq = 0L
          var crossings = 0L
          var prevSign = 0
          var i = 0
          while (i < nFrames) {
            val off = i * frameBytes
            // channel 0, 16-bit sample honoring the container's endianness
            val s =
              if (fmt.isBigEndian) ((data(off) << 8) | (data(off + 1) & 0xff)).toShort
              else ((data(off + 1) << 8) | (data(off) & 0xff)).toShort
            sumSq += s.toLong * s.toLong
            val sign = if (s > 0) 1 else if (s < 0) -1 else 0
            if (sign != 0) {
              if (prevSign != 0 && sign != prevSign) crossings += 1
              prevSign = sign
            }
            i += 1
          }
          val rate = math.round(fmt.getSampleRate)
          val durMs = if (rate > 0) nFrames * 1000L / rate else -1L
          val rms =
            if (nFrames == 0) 0.0
            else math.sqrt(sumSq.toDouble / nFrames) / 32768.0
          Some((rate, ch, nFrames.toLong, durMs, rms, crossings))
        }
      } finally ais.close()
    } catch { case _: Exception => None }

  /** Deterministic PCM WAV synthesis (sine tone) — the fixture
    * generator for exercising [[decodeAudio]] where no real audio
    * corpus exists: same (freq, amp, duration) in, byte-identical WAV
    * out, on any JVM (StrictMath.sin is bit-identical by spec —
    * Math.sin is only specified to 1 ulp and may use platform
    * intrinsics, so a rounding-boundary sample could flip a byte
    * across JVMs; the sample chain rounds through Int before packing).
    */
  def synthToneWav(freqHz: Double, seconds: Double, amp: Double,
      rate: Int = 8000): Array[Byte] = {
    val n = (rate * seconds).toInt
    val samples = new Array[Byte](n * 2)
    var i = 0
    while (i < n) {
      val v = (StrictMath.sin(2 * math.Pi * freqHz * i / rate) * amp * 32767).toInt.toShort
      samples(2 * i) = (v & 0xff).toByte // little-endian PCM
      samples(2 * i + 1) = ((v >> 8) & 0xff).toByte
      i += 1
    }
    pcmMonoWav(samples, n, rate)
  }

  /** Deterministic PCM WAV synthesis (SQUARE wave): +A for `halfPeriod`
    * samples, then −A, alternating, with A = trunc(amp·32767). Unlike
    * the sine fixture this one's decoded features are EXACTLY
    * closed-form — no transcendental function anywhere, so an oracle in
    * another engine reproduces them bit-for-bit from integer/IEEE
    * scalar math alone:
    *   n_samples = nSamples, duration_ms = nSamples·1000/rate,
    *   rms       = A / 32768           (every sample is ±A; the sums
    *                                    stay exact under 2^53 and
    *                                    sqrt(A²) = A exactly),
    *   crossings = floor((nSamples−1) / halfPeriod)
    *                                   (a sign flip at every block
    *                                    boundary, all samples nonzero).
    * This is the audio analogue of the solid-color PNG trick that put
    * `image_features` under a full hash-match oracle.
    */
  def synthSquareWav(halfPeriod: Int, amp: Double, nSamples: Int,
      rate: Int = 8000): Array[Byte] = {
    require(halfPeriod > 0 && nSamples > 0 && amp > 0 && amp <= 1.0)
    val a = (amp * 32767).toInt
    val samples = new Array[Byte](nSamples * 2)
    var i = 0
    while (i < nSamples) {
      val v = (if ((i / halfPeriod) % 2 == 0) a else -a).toShort
      samples(2 * i) = (v & 0xff).toByte // little-endian PCM
      samples(2 * i + 1) = ((v >> 8) & 0xff).toByte
      i += 1
    }
    pcmMonoWav(samples, nSamples, rate)
  }

  /** Burst fixture: `activeWindows` windows of constant amplitude `a`
    * followed by silence, `windows` equal windows of `windowSamples`
    * frames — every byte a pure integer function of the arguments, so
    * the [[audioHash]] of the result is closed-form (bits 0..k−1 set,
    * abs_sum = a·windowSamples·k).
    */
  def synthBurstWav(activeWindows: Int, windows: Int, windowSamples: Int,
      a: Int, rate: Int = 8000): Array[Byte] = {
    require(0 < activeWindows && activeWindows <= windows && windowSamples > 0)
    require(0 < a && a <= 32767)
    val n = windows * windowSamples
    val samples = new Array[Byte](n * 2)
    var i = 0
    while (i < n) {
      val v = (if (i / windowSamples < activeWindows) a else 0).toShort
      samples(2 * i) = (v & 0xff).toByte
      samples(2 * i + 1) = ((v >> 8) & 0xff).toByte
      i += 1
    }
    pcmMonoWav(samples, n, rate)
  }

  /** Pattern WAV for near-dup fixtures: window `w` carries constant
    * amplitude `a` iff bit `w` of `pattern` is set, silence otherwise —
    * so [[audioHash]]'s envelope reproduces `pattern` exactly (active
    * windows are above the track mean, silent below, as long as the
    * pattern is neither empty nor all `windows` bits).
    */
  def synthPatternWav(pattern: Long, windows: Int, windowSamples: Int,
      a: Int, rate: Int = 8000): Array[Byte] = {
    require(0 < windows && windows <= 64 && windowSamples > 0)
    require(0 < a && a <= 32767)
    val n = windows * windowSamples
    val samples = new Array[Byte](n * 2)
    var i = 0
    while (i < n) {
      val v = (if (((pattern >> (i / windowSamples)) & 1L) == 1L) a else 0).toShort
      samples(2 * i) = (v & 0xff).toByte
      samples(2 * i + 1) = ((v >> 8) & 0xff).toByte
      i += 1
    }
    pcmMonoWav(samples, n, rate)
  }

  case class AudioHashRow(media_id: Long, decoded: Boolean, ahash: Long, abs_sum: Long)

  /** Audio energy-envelope fingerprint — the audio analogue of
    * [[aHash]]: split the PCM frames into `windows` equal windows, sum
    * |sample| per window (exact int64), set bit w when the window's
    * energy is at least the track mean (integer cross-multiply
    * winSum·windows ≥ totalSum — no float mean). Re-encodes and small
    * edits of the same track land within a few Hamming bits, so
    * near-dup blocking reuses the pigeonhole+popcount machinery.
    * Trailing frames that don't fill a window are ignored (every
    * window must be the same width for the comparison to be fair).
    */
  def audioHash(media: Dataset[MediaRow], windows: Int = 8): Dataset[AudioHashRow] = {
    import media.sparkSession.implicits._
    require(0 < windows && windows <= 64, "hash must fit one int64")
    media.mapPartitions { rows =>
      rows.map { r =>
        val res: Option[(Long, Long)] = try {
          val ais = javax.sound.sampled.AudioSystem.getAudioInputStream(
            new ByteArrayInputStream(r.content))
          try {
            val fmt = ais.getFormat
            val ok = (fmt.getEncoding == javax.sound.sampled.AudioFormat.Encoding.PCM_SIGNED) &&
              fmt.getSampleSizeInBits == 16 && fmt.getChannels >= 1
            if (!ok) None
            else {
              val data = ais.readAllBytes()
              val ch = fmt.getChannels
              val frameBytes = 2 * ch
              val nFrames = data.length / frameBytes
              val perWin = nFrames / windows
              if (perWin == 0) None
              else {
                val winSum = new Array[Long](windows)
                var w = 0
                while (w < windows) {
                  var i = w * perWin
                  val end = i + perWin
                  var s = 0L
                  while (i < end) {
                    val off = i * frameBytes
                    val v =
                      if (fmt.isBigEndian) ((data(off) << 8) | (data(off + 1) & 0xff)).toShort
                      else ((data(off + 1) << 8) | (data(off) & 0xff)).toShort
                    s += math.abs(v.toLong)
                    i += 1
                  }
                  winSum(w) = s
                  w += 1
                }
                val total = winSum.sum
                var h = 0L
                w = 0
                while (w < windows) {
                  if (winSum(w) * windows >= total) h |= (1L << w)
                  w += 1
                }
                Some((h, total))
              }
            }
          } finally ais.close()
        } catch { case _: Exception => None }
        res match {
          case Some((h, t)) => AudioHashRow(r.media_id, decoded = true, h, t)
          case None => AudioHashRow(r.media_id, decoded = false, 0L, 0L)
        }
      }
    }
  }

  /** Containerize little-endian 16-bit mono PCM frames as WAV. */
  private def pcmMonoWav(samples: Array[Byte], nFrames: Int, rate: Int): Array[Byte] = {
    val fmt = new javax.sound.sampled.AudioFormat(rate.toFloat, 16, 1, true, false)
    val ais = new javax.sound.sampled.AudioInputStream(
      new ByteArrayInputStream(samples), fmt, nFrames.toLong)
    val bos = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(ais,
      javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
    bos.toByteArray
  }

  /** Partition-parallel audio decode: one output row per media item;
    * non-audio / undecodable payloads carry `sample_rate = -1`.
    */
  def decodeAudio(media: Dataset[MediaRow]): Dataset[AudioFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions(_.map { r =>
      val a = if (r.meta.mimeType.startsWith("audio/")) audioFeatures(r.content) else None
      val (rate, ch, n, dur, rms, zc) = a.getOrElse((-1, -1, -1L, -1L, -1.0, -1L))
      AudioFeatures(r.media_id, r.content.length.toLong, r.meta.mimeType,
        rate, ch, n, dur, rms, zc)
    })
  }

  /** Byte-level shape normalization for NON-IMAGE payloads: exactly
    * `targetBytes` out via proportional stride sampling — the honest
    * stand-in for audio resample / video re-mux (no JDK codecs).
    */
  private def strideSample(src: Array[Byte], targetBytes: Int): Array[Byte] = {
    val out = new Array[Byte](targetBytes)
    if (src.nonEmpty) {
      var i = 0
      while (i < targetBytes) {
        out(i) = src(((i.toLong * src.length) / targetBytes).toInt)
        i += 1
      }
    }
    out
  }

  /** REAL image resize: decode (header-guarded, see [[decodeImage]]) →
    * `Graphics2D.drawImage` bilinear scale to targetW×targetH →
    * re-encode PNG. Every embedding model wants a fixed input shape
    * before batching; this is the image leg. Payloads that aren't
    * decodable images (wrong mime, corrupt bytes, raster past
    * [[MaxRasterBytes]]) fall back to [[strideSample]] at targetW·targetH
    * bytes, so the fixed-output-shape contract holds for EVERY row and
    * one bad payload never kills the partition.
    *
    * Scale posture: pure per-row work behind `mapPartitions` (the
    * black-box-codec exception to functions-not-UDFs), no shuffle; the
    * output schema/meta contract is identical to the input's.
    */
  def resize(media: Dataset[MediaRow], targetW: Int = 16, targetH: Int = 16): Dataset[MediaRow] = {
    import media.sparkSession.implicits._
    require(targetW > 0 && targetH > 0)
    media.mapPartitions { rows =>
      rows.map { r =>
        val scaled: Option[Array[Byte]] =
          if (r.meta.mimeType.startsWith("image/")) {
            decodeImage(r.content).flatMap { img =>
              try {
                val dst = new java.awt.image.BufferedImage(targetW, targetH,
                  java.awt.image.BufferedImage.TYPE_INT_RGB)
                val g = dst.createGraphics()
                try {
                  g.setRenderingHint(
                    java.awt.RenderingHints.KEY_INTERPOLATION,
                    java.awt.RenderingHints.VALUE_INTERPOLATION_BILINEAR)
                  g.drawImage(img, 0, 0, targetW, targetH, null)
                } finally g.dispose()
                val bos = new java.io.ByteArrayOutputStream()
                ImageIO.write(dst, "png", bos)
                Some(bos.toByteArray)
              } catch { case _: Exception => None }
            }
          } else None
        scaled match {
          case Some(bytes) =>
            r.copy(content = bytes,
              meta = r.meta.copy(mimeType = "image/png", sizeBytes = bytes.length.toLong))
          case None =>
            // the stride-sampled bytes are NOT a decodable image anymore —
            // re-tag them so a downstream consumer trusting meta.mimeType
            // never attempts an image decode on fallback rows
            val out = strideSample(r.content, targetW * targetH)
            r.copy(content = out,
              meta = r.meta.copy(mimeType = "application/octet-stream",
                sizeBytes = out.length.toLong))
        }
      }
    }
  }

  case class AHashRow(media_id: Long, decoded: Boolean, ahash: Long, luma_sum: Long)

  /** Perceptual average-hash (aHash) — the image analogue of SimHash:
    * scale to `size`×`size`, compute integer BT.601 luma per pixel, set
    * bit i (row-major, LSB = top-left) when the pixel is at least the
    * image mean. Near-duplicate images (re-encodes, small edits,
    * rescales) land within a few bits of Hamming distance, so the
    * downstream blocking/verify is exactly [[graft.ops.Dedup.simhashNearDup]]'s
    * pigeonhole + popcount machinery over this hash.
    *
    * Exactness: the threshold is the INTEGER cross-multiply
    * luma·n ≥ Σluma (no float mean), so for fixture images whose pixels
    * are closed-form the whole 64-bit hash is computable in plain SQL.
    * The scale step is skipped when the decoded image is already
    * `size`×`size` — fixtures take that path; real images go through
    * the same bilinear scale as [[resize]].
    */
  def aHash(media: Dataset[MediaRow], size: Int = 8): Dataset[AHashRow] = {
    import media.sparkSession.implicits._
    require(size > 0 && size * size <= 64, "hash must fit one int64")
    media.mapPartitions { rows =>
      rows.map { r =>
        val res: Option[(Long, Long)] = decodeImage(r.content).flatMap { img0 =>
          try {
            val img =
              if (img0.getWidth == size && img0.getHeight == size) img0
              else {
                val dst = new java.awt.image.BufferedImage(size, size,
                  java.awt.image.BufferedImage.TYPE_INT_RGB)
                val g = dst.createGraphics()
                try {
                  g.setRenderingHint(
                    java.awt.RenderingHints.KEY_INTERPOLATION,
                    java.awt.RenderingHints.VALUE_INTERPOLATION_BILINEAR)
                  g.drawImage(img0, 0, 0, size, size, null)
                } finally g.dispose()
                dst
              }
            val n = size * size
            val luma = new Array[Long](n)
            var sum = 0L
            var y = 0
            while (y < size) {
              var x = 0
              while (x < size) {
                val p = img.getRGB(x, y)
                val l = (((p >> 16) & 0xff) * 299 + ((p >> 8) & 0xff) * 587 +
                  (p & 0xff) * 114) / 1000
                luma(y * size + x) = l; sum += l
                x += 1
              }
              y += 1
            }
            var h = 0L; var i = 0
            while (i < n) { if (luma(i) * n >= sum) h |= (1L << i); i += 1 }
            Some((h, sum))
          } catch { case _: Exception => None }
        }
        res match {
          case Some((h, s)) => AHashRow(r.media_id, decoded = true, h, s)
          case None => AHashRow(r.media_id, decoded = false, 0L, 0L)
        }
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
