package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing: media (image/audio/video) carried as opaque
  * `binary` columns with typed metadata, processed per-partition in batches.
  *
  * IMAGE decode is REAL: payloads that are valid images (BMP/PNG/JPEG —
  * anything the JDK's `javax.imageio.ImageIO` reads) are decoded to pixels
  * and brightness/sharpness are computed from actual luminance. AUDIO
  * decode is REAL too: WAV payloads go through the JDK's
  * `javax.sound.sampled.AudioSystem` and RMS/zero-crossing features come
  * from actual PCM samples. VIDEO remains a clearly-marked STUB (the
  * container has no video codec, in the JDK or otherwise): `decodeStub`
  * derives deterministic fake features from the bytes so the pipeline
  * shape is exercised end to end.
  *
  * Scale notes: media blobs dominate row size, so `repartitionForMedia`
  * targets a byte budget per partition (not a row count); feature
  * extraction is `mapPartitions` (one JVM-side batch per partition, the
  * Scala analogue of `mapInPandas` batching — and the shape a native codec
  * handle-per-partition requires); no shuffle is introduced by
  * decode/extract — only by any downstream aggregation.
  */
object Multimodal {

  // ImageIO's default temp-file disk cache would add a file create/delete
  // per decode on every executor thread — in-memory streams only
  javax.imageio.ImageIO.setUseCache(false)

  /** A media row: opaque payload + the typed metadata a catalog would hold. */
  final case class MediaRow(
      media_id: Long,
      kind: String,          // image | audio | video
      payload: Array[Byte],
      width: Int,
      height: Int,
      duration_ms: Long)

  /** Extracted features per media item (fixed-width, columnar-friendly).
    * For decodable images, `decoded_w/h` are the real pixel dimensions and
    * brightness/sharpness come from real luminance; for audio/video (and
    * undecodable payloads) they are 0 and the deterministic byte-stub. */
  final case class MediaFeatures(
      media_id: Long,
      kind: String,
      n_bytes: Long,
      checksum: Long,
      decoded_w: Int,        // 0 when not decoded
      decoded_h: Int,
      brightness: Double,    // image: mean luminance/255; else byte stub
      sharpness: Double)     // image: mean |horiz gradient|/255; else stub

  /** One sampled frame of a video payload. */
  final case class FrameSample(media_id: Long, frame_idx: Int, offset_bytes: Long,
      frame_checksum: Long)

  /** Derive a deterministic pseudo-media table from any binary payloads.
    * Used by tests and the driver queries: documents' text bytes stand in
    * for image payloads. */
  def asMedia(df: DataFrame, idCol: String, binCol: String, kind: String): DataFrame =
    df.select(
      col(idCol).cast("long").as("media_id"),
      lit(kind).as("kind"),
      col(binCol).cast("binary").as("payload"),
      (pmod(xxhash64(col(binCol)), lit(1920L)) + 1).cast("int").as("width"),
      (pmod(xxhash64(col(binCol), lit(1)), lit(1080L)) + 1).cast("int").as("height"),
      (pmod(xxhash64(col(binCol), lit(2)), lit(600000L))).as("duration_ms"))

  /** Repartition a media table by a per-partition byte budget — blobs, not
    * row counts, bound executor memory. */
  def repartitionForMedia(df: DataFrame, totalBytes: Long,
      targetPartitionBytes: Long = 128L * 1024 * 1024): DataFrame = {
    val parts = math.max(1, (totalBytes / targetPartitionBytes).toInt)
    df.repartition(parts)
  }

  /** Deterministic 8x8 grayscale BMP derived from a string: pixel i
    * (row-major) = `charAt(i % len) & 0xFF` replicated to r=g=b, written
    * through the JDK BMP encoder. Gives tests and the driver queries REAL
    * decodable image payloads whose pixel values have a closed form an
    * external oracle can recompute from the source text (BMP is lossless).
    * ASCII/BMP-plane text assumed (charAt == codepoint). */
  def encodeGrayBmp(text: String, w: Int = 8, h: Int = 8): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    val len = if (text == null) 0 else text.length
    var i = 0
    while (i < w * h) {
      val v = if (len == 0) 0 else text.charAt(i % len) & 0xFF
      img.setRGB(i % w, i / w, (v << 16) | (v << 8) | v)
      i += 1
    }
    val baos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "bmp", baos)
    baos.toByteArray
  }

  private val grayBmpUdf = udf { (t: String) => encodeGrayBmp(t) }

  /** Like [[asMedia]] but with a REAL image payload: each row carries an
    * 8x8 grayscale BMP deterministically derived from the text column. */
  def asMediaImages(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(
      col(idCol).cast("long").as("media_id"),
      lit("image").as("kind"),
      grayBmpUdf(col(textCol)).as("payload"),
      lit(8).as("width"),
      lit(8).as("height"),
      lit(0L).as("duration_ms"))

  /** REAL image decode via the JDK's ImageIO (BMP/PNG/JPEG/GIF); null when
    * the payload is not a decodable image. */
  private def decodeImage(payload: Array[Byte]): java.awt.image.BufferedImage =
    if (payload == null || payload.isEmpty) null
    else
      try javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(payload))
      catch { case _: Exception => null }

  /** True pixel features from a decoded image: brightness = mean luminance
    * ((r+g+b)/3) / 255; sharpness = mean |horizontal luminance gradient|
    * / 255 (0 for 1-pixel-wide images). */
  private def imageFeatures(img: java.awt.image.BufferedImage): (Double, Double) = {
    val w = img.getWidth
    val h = img.getHeight
    var graySum = 0.0
    var diffSum = 0.0
    var r = 0
    while (r < h) {
      var prev = 0.0
      var c = 0
      while (c < w) {
        val rgb = img.getRGB(c, r)
        val gray = (((rgb >> 16) & 0xFF) + ((rgb >> 8) & 0xFF) + (rgb & 0xFF)) / 3.0
        graySum += gray
        if (c > 0) diffSum += math.abs(gray - prev)
        prev = gray
        c += 1
      }
      r += 1
    }
    val brightness = graySum / (w * h) / 255.0
    val sharpness = if (w > 1) diffSum / (h * (w - 1)) / 255.0 else 0.0
    (brightness, sharpness)
  }

  /** STUB for audio/video (and undecodable payloads): the real codec would
    * go here (WAV/MP4) — deterministic features from the raw bytes so the
    * distributed plumbing is testable without codecs. */
  private def decodeStub(payload: Array[Byte]): (Double, Double) = {
    if (payload == null || payload.isEmpty) return (0.0, 0.0)
    var sum = 0L
    var diff = 0L
    var i = 0
    while (i < payload.length) {
      sum += (payload(i) & 0xFF)
      if (i > 0) diff += math.abs((payload(i) & 0xFF) - (payload(i - 1) & 0xFF))
      i += 1
    }
    val brightness = sum.toDouble / payload.length / 255.0
    val sharpness = if (payload.length > 1) diff.toDouble / (payload.length - 1) / 255.0 else 0.0
    (brightness, sharpness)
  }

  private def checksum64(payload: Array[Byte]): Long = {
    var h = 0xcbf29ce484222325L
    var i = 0
    while (i < payload.length) { h ^= (payload(i) & 0xFF); h *= 0x100000001b3L; i += 1 }
    h
  }

  /** Batched feature extraction: one pass per partition, rows streamed —
    * the `mapPartitions` shape that a real codec (native lib handle per
    * partition, reused across rows) requires. */
  def extractFeatures(media: DataFrame): Dataset[MediaFeatures] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select("media_id", "kind", "payload").as[(Long, String, Array[Byte])]
      .mapPartitions { it =>
        it.map { case (id, kind, payload) =>
          // image: REAL decode (ImageIO) with stub fallback for payloads
          // that aren't actually images; audio/video: stub
          val img = if (kind == "image") decodeImage(payload) else null
          val (w, h, bright, sharp) =
            if (img != null) {
              val (b, s) = imageFeatures(img)
              (img.getWidth, img.getHeight, b, s)
            } else {
              val (b, s) = decodeStub(payload)
              (0, 0, b, s)
            }
          MediaFeatures(id, kind,
            if (payload == null) 0L else payload.length.toLong,
            if (payload == null) 0L else checksum64(payload),
            w, h, bright, sharp)
        }
      }
  }

  /** 64-bit difference hash (dHash — the public perceptual-hash design)
    * from the REAL decoded pixels: grayscale, box-resample to 8x8 if
    * needed, then bit r*8+c = 1 iff gray[r][c] > gray[r][(c+1) mod 8]
    * (wrap-around column keeps the grid square; classic dHash samples a
    * 9th column). Near-duplicate images — recompressed, metadata-changed,
    * slightly edited — differ in few bits, so
    * [[graft.ops.Dedup.simhashCandidates]]'s block-trick candidate
    * machinery applies to the output unchanged (it is hash-agnostic).
    * Undecodable payloads hash to 0. Output: (id, simhash) — named for
    * direct feeding into the SimHash bucketing. */
  def imageDHash(media: DataFrame): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select("media_id", "kind", "payload").as[(Long, String, Array[Byte])]
      .mapPartitions { it =>
        it.map { case (id, kind, payload) =>
          val img = if (kind == "image") decodeImage(payload) else null
          val bits =
            if (img == null) 0L
            else {
              val g = if (img.getWidth == 8 && img.getHeight == 8) img
                else boxResample(img, 8, 8)
              var out = 0L
              var r = 0
              while (r < 8) {
                var c = 0
                while (c < 8) {
                  val a = g.getRGB(c, r); val b = g.getRGB((c + 1) % 8, r)
                  val ga = (((a >> 16) & 0xFF) + ((a >> 8) & 0xFF) + (a & 0xFF)) / 3.0
                  val gb = (((b >> 16) & 0xFF) + ((b >> 8) & 0xFF) + (b & 0xFF)) / 3.0
                  if (ga > gb) out |= (1L << (r * 8 + c))
                  c += 1
                }
                r += 1
              }
              out
            }
          (id, bits)
        }
      }.toDF("id", "simhash")
  }

  /** REAL pixel resample: box average. Each destination pixel averages its
    * source box ([c*sw/tw, (c+1)*sw/tw) x [r*sh/th, (r+1)*sh/th), floor
    * boundaries, at least one source pixel) per channel with integer floor
    * division — deterministic and platform-independent, unlike
    * Graphics2D's rendering-hint-dependent scalers, so an external oracle
    * can recompute the result pixels in closed form. */
  private[graft] def boxResample(img: java.awt.image.BufferedImage,
      tw: Int, th: Int): java.awt.image.BufferedImage = {
    val sw = img.getWidth
    val sh = img.getHeight
    val out = new java.awt.image.BufferedImage(tw, th,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    var r = 0
    while (r < th) {
      val y0 = r * sh / th
      val y1 = math.max(y0 + 1, (r + 1) * sh / th)
      var c = 0
      while (c < tw) {
        val x0 = c * sw / tw
        val x1 = math.max(x0 + 1, (c + 1) * sw / tw)
        var sr = 0; var sg = 0; var sb = 0; var n = 0
        var y = y0
        while (y < y1) {
          var x = x0
          while (x < x1) {
            val rgb = img.getRGB(x, y)
            sr += (rgb >> 16) & 0xFF; sg += (rgb >> 8) & 0xFF; sb += rgb & 0xFF
            n += 1
            x += 1
          }
          y += 1
        }
        out.setRGB(c, r, ((sr / n) << 16) | ((sg / n) << 8) | (sb / n))
        c += 1
      }
      r += 1
    }
    out
  }

  /** Resize: image payloads get a REAL decode -> box-average resample ->
    * lossless BMP re-encode; non-image kinds (and undecodable payloads)
    * keep the deterministic byte-stub downsample (audio/video codecs are
    * sanctioned stubs — no AV libs in the container). Shape-preserving:
    * one row in, one row out, no shuffle. */
  def resize(media: DataFrame, targetW: Int, targetH: Int): Dataset[MediaRow] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select("media_id", "kind", "payload", "width", "height", "duration_ms")
      .as[MediaRow]
      .mapPartitions { it =>
        it.map { m =>
          val img = if (m.kind == "image") decodeImage(m.payload) else null
          if (img != null) {
            val baos = new java.io.ByteArrayOutputStream()
            javax.imageio.ImageIO.write(boxResample(img, targetW, targetH), "bmp", baos)
            m.copy(payload = baos.toByteArray, width = targetW, height = targetH)
          } else {
            // STUB resample for payloads without a real decoder
            val srcPixels = math.max(1L, m.width.toLong * m.height)
            val dstPixels = targetW.toLong * targetH
            val ratio = math.max(1L, srcPixels / math.max(1L, dstPixels))
            val p = m.payload
            val resampled =
              if (p == null || p.isEmpty || ratio <= 1) p
              else Array.tabulate(math.max(1, (p.length / ratio).toInt))(i =>
                p((i * ratio).toInt.min(p.length - 1)))
            m.copy(payload = resampled, width = targetW, height = targetH)
          }
        }
      }
  }

  // --- audio (REAL decode: javax.sound.sampled is JDK-only) ----------------

  /** One row of real audio features: RMS amplitude and zero crossings over
    * the decoded PCM samples; 0/0 when the payload is not decodable. */
  final case class AudioFeatures(
      media_id: Long,
      n_samples: Long,
      rms: Double,            // sqrt(mean((sample-128)^2 / 128^2)), 8-bit unsigned PCM
      zero_crossings: Long)   // sign changes of (sample - 128)

  /** Deterministic unsigned-8-bit mono PCM WAV from a string: sample i =
    * charAt(i % len) & 0xFF (0 for empty text), `n` samples — the audio
    * analogue of [[encodeGrayBmp]]: a REAL decodable payload whose sample
    * values have a closed form an external oracle can recompute.
    *
    * The canonical 44-byte RIFF/WAVE container is written with plain byte
    * math, byte-identical to `AudioSystem.write`'s output for this format
    * (asserted in OpsSpec) — the JDK writer's per-call SPI lookup + stream
    * plumbing measured ~140 µs/row, which dominated the audio pipeline's
    * wall time at rehearsal scale. */
  def encodePcmWav(text: String, n: Int = 256, sampleRate: Float = 8000f): Array[Byte] = {
    val len = if (text == null) 0 else text.length
    val sr = sampleRate.toInt
    val out = new Array[Byte](44 + n)
    def w32(off: Int, v: Int): Unit = {
      out(off) = (v & 0xFF).toByte; out(off + 1) = ((v >>> 8) & 0xFF).toByte
      out(off + 2) = ((v >>> 16) & 0xFF).toByte; out(off + 3) = ((v >>> 24) & 0xFF).toByte
    }
    def w16(off: Int, v: Int): Unit = {
      out(off) = (v & 0xFF).toByte; out(off + 1) = ((v >>> 8) & 0xFF).toByte
    }
    def tag(off: Int, s: String): Unit = {
      var i = 0; while (i < 4) { out(off + i) = s.charAt(i).toByte; i += 1 }
    }
    tag(0, "RIFF"); w32(4, 36 + n); tag(8, "WAVE")
    tag(12, "fmt "); w32(16, 16)
    w16(20, 1 /*PCM*/); w16(22, 1 /*mono*/)
    w32(24, sr); w32(28, sr /*byteRate: 1 ch × 1 B/sample*/)
    w16(32, 1 /*blockAlign*/); w16(34, 8 /*bits*/)
    tag(36, "data"); w32(40, n)
    var i = 0
    while (i < n) {
      out(44 + i) = (if (len == 0) 0 else text.charAt(i % len) & 0xFF).toByte
      i += 1
    }
    out
  }

  private val pcmWavUdf = udf { (t: String) => encodePcmWav(t) }

  /** Like [[asMedia]] but with a REAL audio payload per row. */
  def asMediaAudio(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(
      col(idCol).cast("long").as("media_id"),
      lit("audio").as("kind"),
      pcmWavUdf(col(textCol)).as("payload"),
      lit(0).as("width"),
      lit(0).as("height"),
      lit(32L).as("duration_ms")) // 256 samples @ 8 kHz

  /** REAL WAV decode; null when not decodable. Returns the raw
    * unsigned-8-bit sample bytes.
    *
    * The canonical case (RIFF chunk walk to an 8-bit mono PCM `data`
    * chunk) is parsed directly — `AudioSystem.getAudioInputStream` probes
    * every registered provider per call (~150 µs/row measured, the other
    * half of the audio pipeline's hot-path cost). Anything non-canonical
    * (compressed, multi-channel, 16-bit, stray container) still goes
    * through the JDK's general decoder, so accepted inputs are unchanged:
    * the fast path is an equal-output shortcut, property-tested against
    * the AudioSystem result in OpsSpec. */
  private def decodeWav(payload: Array[Byte]): Array[Byte] =
    if (payload == null || payload.isEmpty) null
    else {
      val fast = decodeCanonicalPcmWav(payload)
      if (fast != null) fast
      else
        try {
          val ais = javax.sound.sampled.AudioSystem.getAudioInputStream(
            new java.io.ByteArrayInputStream(payload))
          try ais.readAllBytes() finally ais.close()
        } catch { case _: Exception => null }
    }

  /** RIFF walk for the canonical container only: PCM (format tag 1),
    * mono, 8-bit, `fmt ` before `data`, word-aligned chunks. Returns null
    * for anything else — the caller falls back to the general decoder, so
    * this can never widen or narrow what decodes, only speed it up. */
  private[graft] def decodeCanonicalPcmWav(p: Array[Byte]): Array[Byte] = {
    if (p.length < 44) return null
    def tag(off: Int, s: String): Boolean =
      p(off) == s.charAt(0) && p(off + 1) == s.charAt(1) &&
        p(off + 2) == s.charAt(2) && p(off + 3) == s.charAt(3)
    def u16(off: Int): Int = (p(off) & 0xFF) | ((p(off + 1) & 0xFF) << 8)
    def u32(off: Int): Long =
      (p(off) & 0xFFL) | ((p(off + 1) & 0xFFL) << 8) |
        ((p(off + 2) & 0xFFL) << 16) | ((p(off + 3) & 0xFFL) << 24)
    if (!tag(0, "RIFF") || !tag(8, "WAVE")) return null
    var off = 12
    var fmtIsCanonical = false
    while (off + 8 <= p.length) {
      val size = u32(off + 4)
      if (size > Int.MaxValue - 9) return null
      if (tag(off, "fmt ")) {
        if (size < 16 || off + 8 + 16 > p.length) return null
        fmtIsCanonical = u16(off + 8) == 1 && u16(off + 10) == 1 &&
          u16(off + 22) == 8
        if (!fmtIsCanonical) return null // non-canonical: general decoder
      } else if (tag(off, "data")) {
        if (!fmtIsCanonical) return null // data before fmt: let the JDK judge
        val n = math.min(size, (p.length - off - 8).toLong).toInt
        return java.util.Arrays.copyOfRange(p, off + 8, off + 8 + n)
      }
      off += 8 + size.toInt + (size.toInt & 1) // chunks are word-aligned
    }
    null
  }

  /** Batched REAL audio feature extraction (`mapPartitions`, no shuffle):
    * integer sum-of-squares and crossing counts keep the arithmetic exact
    * until the final double division, so the features have a closed form
    * over the source text. */
  def extractAudioFeatures(media: DataFrame): Dataset[AudioFeatures] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select("media_id", "payload").as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.map { case (id, payload) =>
          val s = decodeWav(payload)
          if (s == null || s.isEmpty) AudioFeatures(id, 0L, 0.0, 0L)
          else {
            var sumSq = 0L
            var crossings = 0L
            var prev = 0
            var i = 0
            while (i < s.length) {
              val k = (s(i) & 0xFF) - 128
              sumSq += k.toLong * k
              if (i > 0 && k * prev < 0) crossings += 1
              prev = k
              i += 1
            }
            AudioFeatures(id, s.length.toLong,
              math.sqrt(sumSq.toDouble / (128.0 * 128.0) / s.length), crossings)
          }
        }
      }
  }

  /** One analysis frame of a decoded audio payload. */
  final case class AudioFrame(media_id: Long, frame_idx: Int, n_samples: Int,
      rms: Double, zero_crossings: Long)

  /** Framed audio analysis over REAL decoded PCM — the windowed-RMS shape
    * every spectrogram/VAD pipeline starts from: frames of `frameSize`
    * samples every `hop`, per-frame RMS + zero crossings (integer-exact
    * until the final sqrt, same arithmetic as [[extractAudioFeatures]]).
    * flatMap: output cardinality is data-dependent; no shuffle. */
  def audioFrames(media: DataFrame, frameSize: Int = 64,
      hop: Int = 64): Dataset[AudioFrame] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select("media_id", "payload").as[(Long, Array[Byte])]
      .flatMap { case (id, payload) =>
        val s = decodeWav(payload)
        if (s == null || s.isEmpty) Iterator.empty
        else {
          val nFrames = 1 + (s.length - 1) / hop
          (0 until nFrames).iterator.map { f =>
            val start = f * hop
            val end = math.min(s.length, start + frameSize)
            var sumSq = 0L
            var crossings = 0L
            var prev = 0
            var i = start
            while (i < end) {
              val k = (s(i) & 0xFF) - 128
              sumSq += k.toLong * k
              if (i > start && k * prev < 0) crossings += 1
              prev = k
              i += 1
            }
            val n = end - start
            AudioFrame(id, f, n,
              math.sqrt(sumSq.toDouble / (128.0 * 128.0) / n), crossings)
          }
        }
      }
  }

  /** 64-bit audio energy-contour fingerprint from REAL decoded PCM — the
    * sign-of-energy-delta idea behind classic audio fingerprinting
    * (public design): the unsigned-8-bit samples split into up to 64
    * frames of `frameSize`; bit i = 1 iff the INTEGER frame energy (sum
    * of squared centered samples — exact) of frame i exceeds frame
    * (i+1) mod nFrames. A re-encoded copy hashes identically; a local
    * edit moves one frame's energy and flips at most its two adjacent
    * comparisons, so near-identical clips sit within small Hamming
    * distance and [[graft.ops.Dedup.simhashCandidates]]'s block-trick
    * bucketing applies unchanged. Undecodable payloads hash to 0.
    * Output: (id, simhash). */
  def audioEnergyHash(media: DataFrame, frameSize: Int = 4): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select("media_id", "kind", "payload").as[(Long, String, Array[Byte])]
      .mapPartitions { it =>
        it.map { case (id, kind, payload) =>
          val s = if (kind == "audio") decodeWav(payload) else null
          val bits =
            if (s == null || s.length < frameSize) 0L
            else {
              val nF = math.min(64, s.length / frameSize)
              val e = new Array[Long](nF)
              var f = 0
              while (f < nF) {
                var sum = 0L
                var i = f * frameSize
                val end = i + frameSize
                while (i < end) {
                  val k = (s(i) & 0xFF) - 128
                  sum += k.toLong * k
                  i += 1
                }
                e(f) = sum
                f += 1
              }
              var out = 0L
              var b = 0
              while (b < nF) {
                if (e(b) > e((b + 1) % nF)) out |= (1L << b)
                b += 1
              }
              out
            }
          (id, bits)
        }
      }.toDF("id", "simhash")
  }

  /** Frame sampling for "video" payloads: every `strideBytes` emit a frame
    * record (flatMap — output cardinality is data-dependent, like real
    * frame extraction). */
  def sampleFrames(media: DataFrame, strideBytes: Int = 64,
      maxFrames: Int = 16): Dataset[FrameSample] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select("media_id", "payload").as[(Long, Array[Byte])]
      .flatMap { case (id, payload) =>
        if (payload == null || payload.isEmpty) Iterator.empty
        else {
          val n = math.min(maxFrames, 1 + (payload.length - 1) / strideBytes)
          (0 until n).iterator.map { f =>
            val off = f.toLong * strideBytes
            val end = math.min(payload.length, off + strideBytes).toInt
            val slice = java.util.Arrays.copyOfRange(payload, off.toInt, end)
            FrameSample(id, f, off, checksum64(slice))
          }
        }
      }
  }
}
