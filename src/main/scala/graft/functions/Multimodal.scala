package graft.functions

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal columns: image/audio/video as opaque `binary` payloads with
  * typed metadata (builder prompt; schema in Schemas.mediaAssets).
  *
  * The Spark-side plumbing — schema, partition shape, batched typed
  * transforms over binary columns — is real and tested. The IMAGE codec is
  * real: `javax.imageio` (JDK built-in — PNG/JPEG/BMP/GIF) decodes,
  * feature-extracts, and resizes actual pixel data. The AUDIO codec is
  * real for the formats the JDK ships SPIs for: `javax.sound.sampled`
  * decodes WAV/AIFF/AU PCM into sample rate, channel count, duration, and
  * a 16-bin temporal RMS energy envelope. The VIDEO demuxer is real for
  * the one container+codec a plain JDK can honestly own: uncompressed
  * 24-bpp DIB AVI (pure RIFF byte parsing — `parseAvi`), giving decoded
  * dims/duration, a temporal mean-luma envelope, and true frame sampling
  * with PNG re-encode. Compressed video (mp4/mkv/webm, non-zero
  * biCompression) and any payload a codec rejects fall back to the
  * deterministic byte-level stub so the pipeline never throws on dirty
  * data; a full codec stack is still a library-dependency question, but
  * it now swaps into a proven demux-decode-sample dataflow.
  *
  * Scala note: the PySpark guidance maps `mapInPandas` batches to typed
  * `Dataset.mapPartitions` here — same execution shape (one JVM-side
  * iterator per partition, arrow-free), with case-class Encoders giving
  * columnar-compatible schemas.
  */
object Multimodal {

  /** One media row (matches Schemas.mediaAssets). */
  final case class MediaAsset(
    asset_id: Long,
    media_type: String,           // image | audio | video
    payload: Array[Byte],
    meta: MediaMeta)
  final case class MediaMeta(
    width: Option[Int], height: Option[Int],
    duration_ms: Option[Long], codec: Option[String])

  /** Decoded-feature row. For images that ImageIO decodes, `feature` is a
    * real 16-bin luminance histogram and decoded_width/height are set; for
    * audio that javax.sound decodes it is a 16-bin temporal RMS energy
    * envelope with sample_rate/duration set; otherwise the byte-histogram
    * stub with every decoded field None. */
  final case class MediaFeatures(
    asset_id: Long,
    media_type: String,
    n_bytes: Int,
    byte_entropy: Double,          // content feature from raw bytes
    feature: Array[Float],         // luma hist | RMS envelope | byte stub
    decoded_width: Option[Int],
    decoded_height: Option[Int],
    decoded_duration_ms: Option[Long],
    sample_rate: Option[Int])

  /** A really-decoded image: dimensions + 16-bin luminance histogram
    * (fractions of pixels per bin — a scale-invariant content feature). */
  final case class DecodedImage(width: Int, height: Int,
                                luminanceHist: Array[Float])

  /** REAL image decode via the JDK's javax.imageio (PNG/JPEG/BMP/GIF).
    * Returns None when the payload is not a decodable image — callers fall
    * back to the byte-level stub, so dirty corpora flow through without
    * task failures (the posture a 100 TB ingest needs: bad rows are data,
    * not exceptions). Runs fully headless; no display dependency. */
  private[graft] def decodeImage(payload: Array[Byte]): Option[DecodedImage] =
    if (payload.isEmpty) None
    else try {
      Option(javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(payload))).map { img =>
        val w = img.getWidth; val h = img.getHeight
        val hist = new Array[Int](16)
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w) {
            val rgb = img.getRGB(x, y)
            // integer Rec.601 luma; / 16 buckets 0..255 into 16 bins
            val lum = (((rgb >> 16) & 0xFF) * 299 + ((rgb >> 8) & 0xFF) * 587 +
              (rgb & 0xFF) * 114) / 1000
            hist(lum >> 4) += 1
            x += 1
          }
          y += 1
        }
        val n = math.max(w * h, 1)
        DecodedImage(w, h, hist.map(_.toFloat / n))
      }
    } catch { case _: Exception => None }

  /** REAL image resize: decode, scale with bilinear interpolation, re-encode
    * as PNG (deterministic, lossless). Non-image or undecodable payloads
    * pass through unchanged. */
  private[graft] def resizeImageBytes(payload: Array[Byte], w: Int,
                                      h: Int): Option[Array[Byte]] =
    if (payload.isEmpty) None
    else try {
      Option(javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(payload))).map { img =>
        val out = new java.awt.image.BufferedImage(
          w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
        val g = out.createGraphics()
        try {
          g.setRenderingHint(
            java.awt.RenderingHints.KEY_INTERPOLATION,
            java.awt.RenderingHints.VALUE_INTERPOLATION_BILINEAR)
          g.drawImage(img, 0, 0, w, h, null)
        } finally g.dispose()
        val bos = new java.io.ByteArrayOutputStream()
        javax.imageio.ImageIO.write(out, "png", bos)
        bos.toByteArray
      }
    } catch { case _: Exception => None }

  /** A really-decoded audio clip: stream parameters plus a 16-bin temporal
    * RMS energy envelope — the clip's time axis split into 16 equal spans,
    * each reduced to the RMS of its samples in [-1, 1]. Duration-invariant
    * shape feature: silence detection, clipping triage, and coarse
    * near-dup blocking all read straight off it. */
  final case class DecodedAudio(sampleRate: Int, channels: Int,
                                durationMs: Long, energyEnvelope: Array[Float])

  /** REAL audio decode via the JDK's javax.sound.sampled (WAV/AIFF/AU; the
    * built-in SPIs cover PCM and log-PCM encodings). Any payload the SPI
    * chain rejects — mp3/flac/ogg, which the JDK does not ship decoders
    * for, or plain garbage — returns None and callers fall back to the
    * byte-level stub: same route-don't-throw posture as images. The
    * stream is first converted to 16-bit signed PCM at its native rate so
    * 8-bit/μ-law/big-endian inputs all land in one sample-reading loop. */
  private[graft] def decodeAudio(payload: Array[Byte]): Option[DecodedAudio] =
    if (payload.isEmpty) None
    else try {
      import javax.sound.sampled.{AudioFormat, AudioSystem}
      val in = AudioSystem.getAudioInputStream(
        new java.io.ByteArrayInputStream(payload))
      try {
        val src = in.getFormat
        val target = new AudioFormat(AudioFormat.Encoding.PCM_SIGNED,
          src.getSampleRate, 16, src.getChannels, src.getChannels * 2,
          src.getSampleRate, false)
        val pcm = AudioSystem.getAudioInputStream(target, in)
        try {
          val bytes = pcm.readAllBytes()
          val channels = target.getChannels
          val frames = bytes.length / (2 * channels)
          if (frames == 0) None
          else {
            val sumSq = new Array[Double](16)
            val cnt = new Array[Long](16)
            var i = 0
            val nSamples = frames * channels
            while (i < nSamples) {
              // little-endian 16-bit signed, channels interleaved per frame
              val s = (((bytes(2 * i + 1).toInt << 8) |
                (bytes(2 * i) & 0xFF)).toShort).toDouble / 32768.0
              val bin = ((i / channels) * 16L / frames).toInt min 15
              sumSq(bin) += s * s; cnt(bin) += 1
              i += 1
            }
            val env = Array.tabulate(16) { b =>
              if (cnt(b) == 0) 0f else math.sqrt(sumSq(b) / cnt(b)).toFloat
            }
            val rate = math.round(target.getSampleRate)
            Some(DecodedAudio(rate, channels,
              frames * 1000L / math.max(rate, 1), env))
          }
        } finally pcm.close()
      } finally in.close()
    } catch { case _: Exception => None }

  /** A really-decoded video: dimensions, frame count/timing, and a 16-bin
    * temporal MEAN-LUMA envelope (the clip's time axis split into 16 equal
    * spans, each reduced to the mean Rec.601 luma of its frames,
    * normalized to [0,1]) — the video sibling of the audio RMS envelope:
    * fade/black-frame detection, brightness triage, and coarse near-dup
    * blocking read straight off it. */
  final case class DecodedVideo(width: Int, height: Int, nFrames: Int,
                                durationMs: Long, lumaEnvelope: Array[Float])

  /** Parsed uncompressed-AVI container: header-derived dims/timing plus
    * the payload byte range of each raw DIB frame (decoded lazily). */
  private[graft] final case class AviStream(
    width: Int, height: Int, usPerFrame: Long,
    frames: IndexedSeq[(Int, Int)], payload: Array[Byte]) {
    def nFrames: Int = frames.length
    def durationMs: Long = nFrames * usPerFrame / 1000L
  }

  /** REAL video demux for the one container+codec combination a plain JDK
    * can honestly own end-to-end: RIFF/AVI with an UNCOMPRESSED 24-bpp
    * DIB video stream (`biCompression = 0` — the classic raw-frame AVI).
    * Pure byte parsing of the public RIFF layout (chunk walk → `avih`
    * timing/dims, `strh`/`strf` codec check, `movi` `##db` frame
    * ranges), exactly the way the audio path owns RIFF/WAV via the JDK
    * SPI. Compressed streams (mp4/mkv/webm, AVI with any non-zero
    * biCompression) return None — the JDK ships no codec for them, and
    * callers fall back to the deterministic byte-level stub: same
    * route-don't-throw posture as images and audio. */
  private[graft] def parseAvi(payload: Array[Byte]): Option[AviStream] =
    try {
      if (payload.length < 24 || fourcc(payload, 0) != "RIFF" ||
          fourcc(payload, 8) != "AVI ") return None
      val end = math.min(payload.length.toLong, 8L + u32(payload, 4)).toInt
      var usPerFrame = 0L
      var width = 0; var height = 0
      var bitCount = -1; var compression = -1
      var lastStrhType = ""
      val frames = Vector.newBuilder[(Int, Int)]
      // Iterative chunk walk with an explicit range stack: a crafted
      // payload can nest LIST chunks ~12 bytes deep each, so recursion
      // would turn a 1 MB body into ~80k stack frames and throw
      // StackOverflowError — an Error, invisible to the Exception guard
      // below. The stack holds at most one pending range per nesting
      // level actually entered, bounded by payload size.
      var stack = List((12, end))
      while (stack.nonEmpty) {
        var (off, to) = stack.head
        stack = stack.tail
        var walking = true
        while (walking && off + 8 <= to) {
          val id = fourcc(payload, off)
          val size = u32(payload, off + 4).toInt
          val data = off + 8
          if (size < 0 || data + size > to) walking = false // malformed tail
          else {
            id match {
              case "LIST" if size >= 4 =>
                // Depth-first, in stream order (same order as the old
                // recursion — strh/strf pairing relies on it): park the
                // rest of the current range, descend into the list body.
                stack = (data + size + (size & 1), to) :: stack
                stack = (data + 4, data + size) :: stack
                walking = false
              case "avih" if size >= 40 =>
                usPerFrame = u32(payload, data)
                width = u32(payload, data + 32).toInt
                height = u32(payload, data + 36).toInt
              case "strh" if size >= 4 =>
                lastStrhType = fourcc(payload, data)
              case "strf" if lastStrhType == "vids" && size >= 20 =>
                bitCount = ((payload(data + 14) & 0xFF) |
                  ((payload(data + 15) & 0xFF) << 8))
                compression = u32(payload, data + 16).toInt
              case _ if id.length == 4 && id.substring(2) == "db" &&
                  id.take(2).forall(_.isDigit) =>
                frames += ((data, size))
              case _ => ()
            }
            off = data + size + (size & 1) // chunks pad to even offsets
          }
        }
      }
      val fs = frames.result()
      // Frame-size validation in LONG arithmetic: with header dims like
      // 40000x30000, `rowBytes * height` overflows Int to a negative
      // bound that every undersized frame passes, and the decoders then
      // read past the payload. Also reject dims no real raw-DIB AVI has
      // (>32767 px — BMP's own signed-16 legacy bound): they only occur
      // in corrupt/crafted headers.
      val rowBytesL = ((width.toLong * 3 + 3) / 4) * 4
      if (width > 0 && height > 0 && width <= 32767 && height <= 32767 &&
          usPerFrame > 0 && compression == 0 &&
          bitCount == 24 && fs.nonEmpty &&
          fs.forall { case (_, sz) => sz.toLong >= rowBytesL * height })
        Some(AviStream(width, height, usPerFrame, fs, payload))
      else None
    } catch { case _: Exception => None }

  private def fourcc(b: Array[Byte], off: Int): String =
    new String(b, off, 4, java.nio.charset.StandardCharsets.US_ASCII)

  private def u32(b: Array[Byte], off: Int): Long =
    (b(off) & 0xFFL) | ((b(off + 1) & 0xFFL) << 8) |
      ((b(off + 2) & 0xFFL) << 16) | ((b(off + 3) & 0xFFL) << 24)

  /** Decode frame `idx` of an uncompressed-DIB stream to a BufferedImage
    * (bottom-up BGR rows, 4-byte-aligned — the DIB layout). */
  private[graft] def frameImage(s: AviStream, idx: Int)
      : java.awt.image.BufferedImage = {
    val (off, _) = s.frames(idx)
    val rowBytes = ((s.width * 3 + 3) / 4) * 4
    val img = new java.awt.image.BufferedImage(
      s.width, s.height, java.awt.image.BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < s.height) {
      val base = off + (s.height - 1 - y) * rowBytes // bottom-up
      var x = 0
      while (x < s.width) {
        val p = base + x * 3
        val rgb = ((s.payload(p + 2) & 0xFF) << 16) |
          ((s.payload(p + 1) & 0xFF) << 8) | (s.payload(p) & 0xFF)
        img.setRGB(x, y, rgb)
        x += 1
      }
      y += 1
    }
    img
  }

  /** Mean Rec.601 luma of one frame, normalized to [0,1] — computed
    * straight off the DIB bytes, no image object. */
  private def frameMeanLuma(s: AviStream, idx: Int): Double = {
    val (off, _) = s.frames(idx)
    val rowBytes = ((s.width * 3 + 3) / 4) * 4
    var sum = 0L
    var y = 0
    while (y < s.height) {
      val base = off + y * rowBytes
      var x = 0
      while (x < s.width) {
        val p = base + x * 3
        sum += ((s.payload(p + 2) & 0xFF) * 299 +
          (s.payload(p + 1) & 0xFF) * 587 + (s.payload(p) & 0xFF) * 114) / 1000
        x += 1
      }
      y += 1
    }
    sum.toDouble / (s.width.toLong * s.height * 255)
  }

  /** REAL video decode (see [[parseAvi]] for the honest codec scope):
    * dims + frame timing + the 16-bin temporal mean-luma envelope.
    * Clips shorter than 16 frames leave their empty bins at 0, the same
    * convention as the audio envelope. */
  private[graft] def decodeVideo(payload: Array[Byte]): Option[DecodedVideo] =
    parseAvi(payload).map { s =>
      val sums = new Array[Double](16)
      val cnt = new Array[Long](16)
      var i = 0
      while (i < s.nFrames) {
        val bin = math.min((i * 16L / s.nFrames).toInt, 15)
        sums(bin) += frameMeanLuma(s, i); cnt(bin) += 1
        i += 1
      }
      val env = Array.tabulate(16)(b =>
        if (cnt(b) == 0) 0f else (sums(b) / cnt(b)).toFloat)
      DecodedVideo(s.width, s.height, s.nFrames, s.durationMs, env)
    }

  /** STUB decode fallback: derives a deterministic 16-dim feature from byte
    * histograms so non-decodable payloads still flow end-to-end. */
  private[functions] def decodeStub(payload: Array[Byte]): Array[Float] = {
    val hist = new Array[Int](16)
    payload.foreach(b => hist((b & 0xFF) % 16) += 1)
    val n = math.max(payload.length, 1)
    hist.map(h => h.toFloat / n)
  }

  private[functions] def byteEntropy(payload: Array[Byte]): Double = {
    if (payload.isEmpty) return 0.0
    val counts = new Array[Int](256)
    payload.foreach(b => counts(b & 0xFF) += 1)
    val n = payload.length.toDouble
    counts.filter(_ > 0).map { c =>
      val p = c / n; -p * math.log(p) / math.log(2)
    }.sum
  }

  /** Decode / feature-extract stage: one iterator per partition (the
    * `mapInPandas` batch shape). Images get the REAL ImageIO decode (16-bin
    * luminance histogram + decoded dims); audio gets the REAL javax.sound
    * decode (16-bin RMS envelope + rate/duration); everything else — and
    * payloads the codecs reject — gets the byte-level stub. Pure function
    * of the payload → deterministic, re-runnable, no driver involvement. */
  def extractFeatures(assets: Dataset[MediaAsset]): Dataset[MediaFeatures] = {
    import assets.sparkSession.implicits._
    assets.mapPartitions(_.map { a =>
      def stub = MediaFeatures(a.asset_id, a.media_type, a.payload.length,
        byteEntropy(a.payload), decodeStub(a.payload), None, None, None, None)
      a.media_type match {
        case "image" => decodeImage(a.payload).fold(stub) { img =>
          MediaFeatures(a.asset_id, a.media_type, a.payload.length,
            byteEntropy(a.payload), img.luminanceHist,
            Some(img.width), Some(img.height), None, None)
        }
        case "audio" => decodeAudio(a.payload).fold(stub) { aud =>
          MediaFeatures(a.asset_id, a.media_type, a.payload.length,
            byteEntropy(a.payload), aud.energyEnvelope, None, None,
            Some(aud.durationMs), Some(aud.sampleRate))
        }
        case "video" => decodeVideo(a.payload).fold(stub) { vid =>
          MediaFeatures(a.asset_id, a.media_type, a.payload.length,
            byteEntropy(a.payload), vid.lumaEnvelope,
            Some(vid.width), Some(vid.height), Some(vid.durationMs), None)
        }
        case _ => stub
      }
    })
  }

  /** REAL resize stage for images: decode → bilinear scale → PNG re-encode,
    * with typed metadata updated to the actual output. Rows whose payload
    * does not decode pass through unchanged (route-don't-throw). */
  def resizeImages(assets: Dataset[MediaAsset], w: Int, h: Int): Dataset[MediaAsset] = {
    import assets.sparkSession.implicits._
    assets.mapPartitions(_.map { a =>
      if (a.media_type != "image") a
      else resizeImageBytes(a.payload, w, h) match {
        case Some(bytes) => a.copy(payload = bytes,
          meta = a.meta.copy(width = Some(w), height = Some(h),
            codec = Some("png")))
        case None => a
      }
    })
  }

  /** "Resize" STUB for payloads with no real codec: truncates/pads the
    * payload deterministically while updating the typed metadata the way a
    * resize would. */
  def resizeStub(assets: Dataset[MediaAsset], w: Int, h: Int): Dataset[MediaAsset] = {
    import assets.sparkSession.implicits._
    assets.mapPartitions(_.map { a =>
      val target = math.max(1, w * h / 8)
      val resized = java.util.Arrays.copyOf(a.payload, target)
      a.copy(payload = resized,
        meta = a.meta.copy(width = Some(w), height = Some(h)))
    })
  }

  /** REAL frame-sampling stage: for videos [[parseAvi]] can demux
    * (uncompressed-DIB AVI), emit one row per `everyMs` of ACTUAL
    * stream time — (asset_id, frame_idx, ts_ms, frame_payload) with the
    * payload a lossless PNG re-encode of the decoded frame (the same
    * interchange format the image resize stage emits, so sampled frames
    * flow straight into the image pipeline). Payloads the demuxer
    * rejects fall back to the deterministic stub slicing row-for-row —
    * route, don't throw. */
  def sampleFrames(assets: Dataset[MediaAsset], everyMs: Long): DataFrame = {
    import assets.sparkSession.implicits._
    assets.filter(_.media_type == "video").flatMap { a =>
      parseAvi(a.payload) match {
        case Some(s) =>
          val n = math.max(1L,
            (s.durationMs + math.max(everyMs, 1L) - 1) / math.max(everyMs, 1L))
          (0L until n).map { i =>
            val tMs = i * everyMs
            val idx = math.min(tMs * 1000L / s.usPerFrame, s.nFrames - 1L).toInt
            val bos = new java.io.ByteArrayOutputStream()
            javax.imageio.ImageIO.write(frameImage(s, idx), "png", bos)
            (a.asset_id, idx, tMs, bos.toByteArray)
          }
        case None =>
          val dur = a.meta.duration_ms.getOrElse(0L)
          val n = math.max(1, (dur / math.max(everyMs, 1L)).toInt)
          (0 until n).map { i =>
            val sliceLen = math.max(1, a.payload.length / n)
            val from = math.min(i * sliceLen, math.max(a.payload.length - 1, 0))
            val until = math.min(from + sliceLen, a.payload.length)
            (a.asset_id, i, i * everyMs,
              java.util.Arrays.copyOfRange(a.payload, from, until))
          }
      }
    }.toDF("asset_id", "frame_idx", "ts_ms", "frame_payload")
  }

  /** Sampled video frames as IMAGE-feature rows — the bridge from the
    * demuxer into the embedding / near-dup pipeline: one row per sampled
    * frame with the same 16-bin luminance histogram the image path
    * computes, ready to hash-embed or near-dup-block like any other
    * image corpus. Decodes straight from the DIB bytes (no PNG
    * round-trip); payloads the demuxer rejects contribute no rows
    * (their asset-level stub features come from [[extractFeatures]]).
    * Pure per-row function → zero exchanges, scan-shaped at 100 TB. */
  def videoFrameFeatures(assets: Dataset[MediaAsset], everyMs: Long): DataFrame = {
    import assets.sparkSession.implicits._
    assets.filter(_.media_type == "video").flatMap { a =>
      parseAvi(a.payload).toSeq.flatMap { s =>
        val n = math.max(1L,
          (s.durationMs + math.max(everyMs, 1L) - 1) / math.max(everyMs, 1L))
        (0L until n).map { i =>
          val tMs = i * everyMs
          val idx = math.min(tMs * 1000L / s.usPerFrame, s.nFrames - 1L).toInt
          val img = frameImage(s, idx)
          val hist = new Array[Int](16)
          var y = 0
          while (y < img.getHeight) {
            var x = 0
            while (x < img.getWidth) {
              val rgb = img.getRGB(x, y)
              val lum = (((rgb >> 16) & 0xFF) * 299 +
                ((rgb >> 8) & 0xFF) * 587 + (rgb & 0xFF) * 114) / 1000
              hist(lum >> 4) += 1
              x += 1
            }
            y += 1
          }
          val np = math.max(img.getWidth * img.getHeight, 1)
          (a.asset_id, idx, tMs, s.width, s.height,
            hist.map(_.toFloat / np))
        }
      }
    }.toDF("asset_id", "frame_idx", "ts_ms", "width", "height", "luma_hist")
  }

  /** Frame-sampling stage for videos: emit one row per sampled "frame"
    * (every `everyMs` of the declared duration). Real decoders pull actual
    * frames; the stub slices the payload deterministically. Kept as the
    * equivalence reference for the [[sampleFrames]] fallback branch. */
  def sampleFramesStub(assets: Dataset[MediaAsset], everyMs: Long): DataFrame = {
    import assets.sparkSession.implicits._
    assets.filter(_.media_type == "video").flatMap { a =>
      val dur = a.meta.duration_ms.getOrElse(0L)
      val n = math.max(1, (dur / math.max(everyMs, 1L)).toInt)
      (0 until n).map { i =>
        val sliceLen = math.max(1, a.payload.length / n)
        val from = math.min(i * sliceLen, math.max(a.payload.length - 1, 0))
        val until = math.min(from + sliceLen, a.payload.length)
        (a.asset_id, i, i * everyMs,
          java.util.Arrays.copyOfRange(a.payload, from, until))
      }
    }.toDF("asset_id", "frame_idx", "ts_ms", "frame_payload")
  }

  /** Ingest a directory of media FILES into the MediaAsset schema via
    * Spark's `binaryFile` source — the missing first stage of the
    * multimodal pipeline (everything above consumes MediaAsset rows that
    * something must produce from raw files). The source gives
    * (path, modificationTime, length, content) with the bytes read
    * distributed, one task per file group — no driver-side file I/O.
    *
    * media_type derives from the file extension (image/audio/video by
    * the usual suffixes; anything else → "binary" and flows through the
    * stub path — route, don't throw). asset_id is xxhash64 of the path:
    * deterministic across re-runs and re-partitioning, collision odds at
    * corpus scale ~n²/2⁶⁵. Width/height/duration are left None here —
    * extractFeatures fills decoded dims from the actual pixels; trusting
    * file names over bytes is how corrupt corpora sneak through.
    *
    * `pathGlobFilter` pushes suffix filtering into the file listing
    * (e.g. "*.png"); at 100 TB the listing prune matters as much as the
    * scan prune. */
  def ingestBinaryFiles(spark: SparkSession, dir: String,
                        globFilter: Option[String] = None): Dataset[MediaAsset] = {
    val reader = spark.read.format("binaryFile")
    val withGlob = globFilter.fold(reader)(g => reader.option("pathGlobFilter", g))
    assetsFromBinaryFiles(withGlob.load(dir))
  }

  /** The binaryFile-row → MediaAsset projection shared by the batch and
    * streaming ingest paths (pure Column tree — codegen'd, streamable). */
  private def assetsFromBinaryFiles(df: DataFrame): Dataset[MediaAsset] = {
    import df.sparkSession.implicits._
    df.select(
        xxhash64(col("path")).as("asset_id"),
        lower(regexp_extract(col("path"), "\\.([A-Za-z0-9]+)$", 1)).as("ext"),
        col("content").as("payload"))
      .select(col("asset_id"),
        when(col("ext").isin("png", "jpg", "jpeg", "bmp", "gif"), "image")
          .when(col("ext").isin("wav", "mp3", "flac", "ogg"), "audio")
          .when(col("ext").isin("mp4", "mkv", "webm", "avi"), "video")
          .otherwise("binary").as("media_type"),
        col("payload"))
      .withColumn("meta", struct(
        lit(null).cast("int").as("width"),
        lit(null).cast("int").as("height"),
        lit(null).cast("bigint").as("duration_ms"),
        lit(null).cast("string").as("codec")))
      .as[MediaAsset]
  }

  /** The binaryFile source's fixed schema — streaming reads must declare
    * it (file stream sources do not infer). */
  private val binaryFileSchema = org.apache.spark.sql.types.StructType(Seq(
    org.apache.spark.sql.types.StructField("path",
      org.apache.spark.sql.types.StringType),
    org.apache.spark.sql.types.StructField("modificationTime",
      org.apache.spark.sql.types.TimestampType),
    org.apache.spark.sql.types.StructField("length",
      org.apache.spark.sql.types.LongType),
    org.apache.spark.sql.types.StructField("content",
      org.apache.spark.sql.types.BinaryType)))

  /** CONTINUOUS media ingest: watch `inboxDir` for new files and land them
    * in `outDir` as MediaAsset parquet. The streaming twin of
    * `ingestBinaryFiles`, built entirely from Spark's own exactly-once
    * machinery — the file source's processed-file log (checkpoint) on the
    * read side, the parquet sink's `_spark_metadata` batch commit log on
    * the write side — so a crashed-and-restarted query neither re-ingests
    * a file nor double-writes a batch, with NO per-batch rewrite of
    * existing data (each micro-batch appends only its own files; an
    * O(corpus) rewrite per batch would sink a 100 TB media crawl).
    * `maxFilesPerTrigger` bounds memory per batch — media payloads are
    * heavyweight rows. Caller stops the query. */
  def startMediaIngestStream(spark: SparkSession, inboxDir: String,
                             outDir: String, checkpointDir: String,
                             globFilter: Option[String] = None,
                             maxFilesPerTrigger: Int = 16)
      : org.apache.spark.sql.streaming.StreamingQuery = {
    val reader = spark.readStream.format("binaryFile")
      .schema(binaryFileSchema)
      .option("maxFilesPerTrigger", maxFilesPerTrigger)
    val withGlob = globFilter.fold(reader)(g => reader.option("pathGlobFilter", g))
    assetsFromBinaryFiles(withGlob.load(inboxDir)).writeStream
      .option("checkpointLocation", checkpointDir)
      .trigger(org.apache.spark.sql.streaming.Trigger.ProcessingTime("1 second"))
      .format("parquet")
      .option("path", outDir)
      .start()
  }

  /** Partition-shape guard used by ingest jobs: binary payloads make rows
    * heavyweight, so repartition by byte budget, not row count. */
  def repartitionByPayloadBytes(df: DataFrame, targetBytesPerPartition: Long): DataFrame = {
    val stats = df.agg(sum(length(col("payload"))).as("total")).first()
    val total = if (stats.isNullAt(0)) 0L else stats.getLong(0)
    val parts = math.max(1, (total / math.max(targetBytesPerPartition, 1L)).toInt)
    df.repartition(parts)
  }
}
