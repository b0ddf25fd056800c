package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal columns for the 100 TB training-data pipeline: image/audio/
  * video payloads ride as opaque `BINARY` columns with a typed metadata
  * struct, and every per-asset kernel (decode, resize, feature-extract,
  * frame-sample) runs as a `mapPartitions` batch over a typed Dataset —
  * the Scala analog of `mapInPandas` (one iterator per partition, assets
  * streamed, never collected).
  *
  * Codecs: real images (PNG/BMP/GIF/JPEG — whatever the JDK's ImageIO
  * registry handles) decode through [[ImageIoCodec]]; real audio (WAV —
  * whatever `javax.sound.sampled` handles, PCM signed/unsigned 8/16/32
  * bit) through [[WavCodec]]; the synthetic "fake"-mime assets derived
  * from `documents` (payload = text bytes, not an encoded payload) keep
  * the deterministic [[FakeCodec]]/[[FakeAudioCodec]]. Video CONTAINER
  * metadata (MP4 boxes, AVI headers) parses for real through
  * [[VideoContainer]]; video PIXELS decode for real for MJPEG-in-AVI
  * (each frame is a standalone JPEG → ImageIO); only non-MJPEG video
  * codecs (H.264/VP9/... — nothing in the JDK decodes them) keep the
  * deterministic per-frame stub.
  *
  * Scale notes: payload bytes never enter a shuffle — all kernels are
  * narrow (partition-local), so the only data movement is the initial scan.
  * Derived features (small fixed-width arrays) are what joins/groupBys see.
  * Partitioning: size input splits by bytes (`files.maxPartitionBytes`),
  * not rows — payloads dominate row width.
  */
object Multimodal {

  /** Typed asset row: the canonical multimodal schema. */
  final case class AssetMeta(width: Int, height: Int, channels: Int,
      sampleRate: Int, nFrames: Int, mime: String)
  final case class Asset(asset_id: Long, modality: String,
      content: Array[Byte], meta: AssetMeta)

  final case class DecodedImage(asset_id: Long, width: Int, height: Int,
      channels: Int, pixels: Array[Byte])
  /** Interleaved waveform in [-1, 1]. */
  final case class DecodedAudio(asset_id: Long, sampleRate: Int,
      channels: Int, samples: Array[Float])
  final case class AudioFeatures(asset_id: Long, duration_s: Double,
      rms: Double, peak: Double, zero_cross_rate: Double)
  final case class ImageFeatures(asset_id: Long, mean_rgb: Array[Double],
      histogram: Array[Double])
  final case class VideoFrame(asset_id: Long, frame_idx: Int,
      pixels: Array[Byte])
  final case class VideoInfo(asset_id: Long, format: String,
      duration_s: Double, timescale: Long, n_tracks: Int,
      width: Int, height: Int)

  /** Real image decode via the JDK-bundled `javax.imageio` (zero new
    * dependencies): bytes → BufferedImage → row-major channel-interleaved
    * RGB, the same pixel layout [[FakeCodec]] fakes, so every downstream
    * kernel (resize / features / histogram) is codec-agnostic. */
  object ImageIoCodec {
    def decode(a: Asset): DecodedImage = {
      val img = javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(a.content))
      require(img != null,
        s"asset ${a.asset_id}: payload is not a decodable image (${a.meta.mime})")
      val w = img.getWidth
      val h = img.getHeight
      // ONE bulk getRGB: the per-pixel overload re-enters the ColorModel
      // conversion machinery on every call (10-50× slower on megapixel
      // images — this loop is the decode hot path)
      val rgb = img.getRGB(0, 0, w, h, null, 0, w)
      val px = new Array[Byte](w * h * 3)
      var p = 0
      while (p < rgb.length) {
        val v = rgb(p)
        val o = p * 3
        px(o) = ((v >> 16) & 0xff).toByte
        px(o + 1) = ((v >> 8) & 0xff).toByte
        px(o + 2) = (v & 0xff).toByte
        p += 1
      }
      DecodedImage(a.asset_id, w, h, 3, px)
    }
  }

  /** Real audio decode via the JDK-bundled `javax.sound.sampled` (zero
    * new dependencies — the same move as [[ImageIoCodec]]): bytes →
    * AudioInputStream → interleaved float waveform in [-1, 1]. Handles
    * the PCM encodings WAV carries natively (signed 16/32-bit either
    * endianness, unsigned 8-bit). */
  object WavCodec {
    def decode(a: Asset): DecodedAudio = {
      val in = javax.sound.sampled.AudioSystem.getAudioInputStream(
        new java.io.ByteArrayInputStream(a.content))
      try {
        val fmt = in.getFormat
        val enc = fmt.getEncoding
        val bits = fmt.getSampleSizeInBits
        val bytes = in.readAllBytes()
        val order =
          if (fmt.isBigEndian) java.nio.ByteOrder.BIG_ENDIAN
          else java.nio.ByteOrder.LITTLE_ENDIAN
        val bb = java.nio.ByteBuffer.wrap(bytes).order(order)
        import javax.sound.sampled.AudioFormat.Encoding._
        val out = (enc, bits) match {
          case (PCM_SIGNED, 16) =>
            Array.tabulate(bytes.length / 2)(i => bb.getShort(i * 2) / 32768f)
          case (PCM_SIGNED, 32) =>
            Array.tabulate(bytes.length / 4)(i =>
              (bb.getInt(i * 4) / 2147483648.0).toFloat)
          case (PCM_UNSIGNED, 8) =>
            Array.tabulate(bytes.length)(i => ((bytes(i) & 0xff) - 128) / 128f)
          case (PCM_SIGNED, 8) =>
            Array.tabulate(bytes.length)(i => bytes(i) / 128f)
          case other =>
            throw new IllegalArgumentException(
              s"asset ${a.asset_id}: unsupported audio encoding $other")
        }
        DecodedAudio(a.asset_id, fmt.getSampleRate.toInt, fmt.getChannels, out)
      } finally in.close()
    }
  }

  /** STUB audio decoder for the synthetic corpus — deterministic waveform
    * derived from the payload hash, shaped like a real decode. */
  object FakeAudioCodec {
    def decode(a: Asset): DecodedAudio = {
      val sr = if (a.meta.sampleRate > 0) a.meta.sampleRate else 8000
      val n = math.max(256, sr / 8)
      val out = new Array[Float](n)
      var h = (java.util.Arrays.hashCode(a.content).toLong & 0xffffffffL) *
        6364136223846793005L + 1442695040888963407L
      var i = 0
      while (i < n) {
        h = h * 6364136223846793005L + 1442695040888963407L
        out(i) = ((h >>> 40).toInt / 8388608.0f) - 1.0f
        i += 1
      }
      DecodedAudio(a.asset_id, sr, 1, out)
    }
  }

  /** Mime-dispatched audio decode: real `javax.sound.sampled` for encoded
    * audio, the deterministic fake for the synthetic corpus. */
  def decodeAudioAsset(a: Asset): DecodedAudio =
    if (a.meta.mime.endsWith("/fake")) FakeAudioCodec.decode(a)
    else WavCodec.decode(a)

  /** Narrow per-partition audio decode (the mapInPandas shape). */
  def decodeAudio(assets: Dataset[Asset]): Dataset[DecodedAudio] = {
    import assets.sparkSession.implicits._
    assets.mapPartitions(_.map(decodeAudioAsset))
  }

  /** Waveform features: duration, RMS, peak, zero-crossing rate — the
    * fixed-width summary downstream filters/joins consume instead of the
    * payload (narrow, allocation-tight, payloads never shuffle). ZCR is
    * computed on channel 0 of the interleaved stream. */
  def audioFeatures(decoded: Dataset[DecodedAudio]): Dataset[AudioFeatures] = {
    import decoded.sparkSession.implicits._
    decoded.mapPartitions(_.map { a =>
      val n = a.samples.length
      val frames = n / math.max(1, a.channels)
      var sumSq = 0.0
      var peak = 0.0
      var crossings = 0L
      var prevSign = 0
      var i = 0
      while (i < n) {
        val v = a.samples(i).toDouble
        sumSq += v * v
        val av = math.abs(v)
        if (av > peak) peak = av
        if (i % a.channels == 0) { // channel 0 only for ZCR
          val sign = if (v > 0) 1 else if (v < 0) -1 else 0
          if (sign != 0 && prevSign != 0 && sign != prevSign) crossings += 1
          if (sign != 0) prevSign = sign
        }
        i += 1
      }
      AudioFeatures(a.asset_id,
        if (a.sampleRate > 0) frames.toDouble / a.sampleRate else 0.0,
        if (n > 0) math.sqrt(sumSq / n) else 0.0,
        peak,
        if (frames > 1) crossings.toDouble / (frames - 1) else 0.0)
    })
  }

  /** Mime-dispatched decode: real ImageIO for encoded images, the
    * deterministic fake for the synthetic "fake"-mime corpus. Throws on
    * an undecodable payload — use [[decodeSafe]] on untrusted corpora. */
  def decodeAsset(a: Asset): DecodedImage =
    if (a.meta.mime.endsWith("/fake")) FakeCodec.decode(a)
    else ImageIoCodec.decode(a)

  /** Skip-and-continue decode: None for payloads the codec rejects
    * (truncated download, unsupported color space, corrupt bytes). At
    * corpus scale ONE bad record must not abort the job — Spark retries a
    * deterministic per-row failure forever; quarantine instead. */
  def decodeAssetSafe(a: Asset): Option[DecodedImage] =
    try Some(decodeAsset(a)) catch { case scala.util.control.NonFatal(_) => None }

  /** STUB decoder — deterministic fake pixels in place of a real codec.
    * Pixel (y,x,c) = byte mixed from the payload hash, so decode is
    * reproducible, content-sensitive, and shaped exactly like a real
    * decode (width*height*channels bytes, row-major, channel-interleaved).
    */
  object FakeCodec {
    def decode(a: Asset): DecodedImage = {
      val m = a.meta
      val seed = java.util.Arrays.hashCode(a.content).toLong & 0xffffffffL
      val px = new Array[Byte](m.width * m.height * m.channels)
      var i = 0
      var h = seed * 6364136223846793005L + 1442695040888963407L
      while (i < px.length) {
        h = h * 6364136223846793005L + 1442695040888963407L
        px(i) = (h >>> 56).toByte
        i += 1
      }
      DecodedImage(a.asset_id, m.width, m.height, m.channels, px)
    }
  }

  /** Deterministic asset table derived from `documents` — the stand-in
    * ingest: payload = utf-8 text bytes, geometry derived from doc_id.
    * (In production this is `spark.read.format("binaryFile")` or parquet
    * with a BINARY column.) */
  def assetsFromDocuments(spark: SparkSession, sfDir: String): Dataset[Asset] = {
    import spark.implicits._
    graft.Tables.documents(spark, sfDir)
      .select(col("doc_id"), col("text"))
      .as[(Long, String)]
      .map { case (id, text) =>
        val w = 16 + (id % 4).toInt * 8 // 16..40 px wide
        val h = 16 + (id % 3).toInt * 8
        Asset(id, if (id % 5 == 0) "video" else "image",
          text.getBytes("UTF-8"),
          AssetMeta(w, h, channels = 3, sampleRate = 0,
            nFrames = if (id % 5 == 0) 8 + (id % 7).toInt else 1,
            mime = if (id % 5 == 0) "video/fake" else "image/fake"))
      }
  }

  /** Decode: narrow per-partition batch over the typed Dataset (the
    * mapInPandas shape — an iterator in, an iterator out, nothing
    * materialized per-partition). */
  def decode(assets: Dataset[Asset]): Dataset[DecodedImage] = {
    import assets.sparkSession.implicits._
    assets.mapPartitions(_.map(decodeAsset))
  }

  /** Production variant of [[decode]]: undecodable assets are dropped
    * (still narrow — flatMap over the Option). */
  def decodeSafe(assets: Dataset[Asset]): Dataset[DecodedImage] = {
    import assets.sparkSession.implicits._
    assets.mapPartitions(_.flatMap(decodeAssetSafe))
  }

  /** Nearest-neighbor resize — real resampling arithmetic over the decoded
    * (fake) pixels; the kernel a production pipeline runs before feature
    * extraction, shown partition-local and allocation-tight. */
  def resize(decoded: Dataset[DecodedImage], outW: Int, outH: Int)
      : Dataset[DecodedImage] = {
    import decoded.sparkSession.implicits._
    decoded.mapPartitions(_.map { img =>
      val out = new Array[Byte](outW * outH * img.channels)
      var y = 0
      while (y < outH) {
        val sy = y * img.height / outH
        var x = 0
        while (x < outW) {
          val sx = x * img.width / outW
          var c = 0
          while (c < img.channels) {
            out((y * outW + x) * img.channels + c) =
              img.pixels((sy * img.width + sx) * img.channels + c)
            c += 1
          }
          x += 1
        }
        y += 1
      }
      DecodedImage(img.asset_id, outW, outH, img.channels, out)
    })
  }

  /** Feature extraction: per-channel means + 8-bin luminance histogram
    * (normalized) — the fixed-width embedding that downstream dedup /
    * similarity joins consume instead of the payload. */
  def imageFeatures(decoded: Dataset[DecodedImage]): Dataset[ImageFeatures] = {
    import decoded.sparkSession.implicits._
    decoded.mapPartitions(_.map { img =>
      val nPix = img.width * img.height
      val means = new Array[Double](img.channels)
      val hist = new Array[Double](8)
      var p = 0
      while (p < nPix) {
        var lum = 0.0
        var c = 0
        while (c < img.channels) {
          val v = img.pixels(p * img.channels + c) & 0xff
          means(c) += v
          lum += v
          c += 1
        }
        hist(((lum / img.channels).toInt) >> 5) += 1
        p += 1
      }
      var c = 0
      while (c < img.channels) { means(c) /= nPix; c += 1 }
      var b = 0
      while (b < 8) { hist(b) /= nPix; b += 1 }
      ImageFeatures(img.asset_id, means, hist)
    })
  }

  /** Container-level video metadata — REAL parsing for real payloads:
    * MP4 box trees and RIFF AVI headers go through [[VideoContainer]]
    * (duration, timescale, track count, geometry from the actual bytes);
    * only the synthetic "video/fake" corpus falls back to the declared
    * meta struct. Narrow kernel (payloads never shuffle); unparseable
    * real payloads are dropped, not thrown — the [[decodeAssetSafe]]
    * quarantine discipline. */
  def videoMetadata(assets: Dataset[Asset]): Dataset[VideoInfo] = {
    import assets.sparkSession.implicits._
    assets.filter(_.modality == "video").mapPartitions(_.flatMap { a =>
      if (a.meta.mime.endsWith("/fake"))
        Some(VideoInfo(a.asset_id, "fake", a.meta.nFrames / 24.0, 24L, 1,
          a.meta.width, a.meta.height))
      else
        VideoContainer.parse(a.content).map(m =>
          VideoInfo(a.asset_id, m.format, m.durationS, m.timescale,
            m.nTracks, m.width, m.height))
    })
  }

  /** Frame sampling: every `stride`-th frame of a video asset, each frame
    * decoded independently (flatMap — one asset fans out to its sampled
    * frames, still partition-local).
    *
    * Real pixel paths: MJPEG-in-AVI payloads decode for real — each
    * sampled frame is a standalone JPEG ([[VideoContainer.mjpegFrames]])
    * through the JDK's ImageIO, the same zero-dependency move as
    * [[ImageIoCodec]] — and uncompressed BI_RGB AVI decodes losslessly
    * through [[VideoContainer.rgbFrames]]/`decodeDib` (bottom-up BGR
    * DIB rows → the codec-agnostic row-major RGB layout). Undecodable
    * frames are dropped, not thrown (the [[decodeAssetSafe]] quarantine
    * discipline). Codecs the JDK cannot decode (H.264/VP9/...) and the
    * synthetic "video/fake" corpus fall back to the deterministic stub —
    * the declared boundary. */
  def sampleFrames(assets: Dataset[Asset], stride: Int): Dataset[VideoFrame] = {
    // fail on the driver: stride=0 would throw 'step cannot be 0' inside
    // every executor task (deterministic retry-until-abort), negative
    // strides would silently emit nothing
    require(stride > 0, s"sampleFrames: stride must be positive ($stride)")
    import assets.sparkSession.implicits._

    def stubFrames(a: Asset): Iterator[VideoFrame] =
      (0 until a.meta.nFrames by stride).iterator.map { f =>
        // STUB: a real codec seeks to frame f; the fake derives frame
        // pixels from (payload, f) so frames differ deterministically.
        val frameAsset = a.copy(
          content = a.content ++ Array(f.toByte),
          meta = a.meta.copy(nFrames = 1))
        VideoFrame(a.asset_id, f, FakeCodec.decode(frameAsset).pixels)
      }

    assets.filter(_.modality == "video").mapPartitions(_.flatMap { a =>
      val jpegs =
        if (a.meta.mime.endsWith("/fake")) Vector.empty
        else VideoContainer.mjpegFrames(a.content)
      if (jpegs.nonEmpty)
        (0 until jpegs.length by stride).iterator.flatMap { f =>
          try {
            val d = ImageIoCodec.decode(Asset(a.asset_id, "image",
              jpegs(f), a.meta.copy(nFrames = 1, mime = "image/jpeg")))
            Iterator.single(VideoFrame(a.asset_id, f, d.pixels))
          } catch {
            case scala.util.control.NonFatal(_) => Iterator.empty
          }
        }
      else {
        val rgb =
          if (a.meta.mime.endsWith("/fake")) None
          else VideoContainer.rgbFrames(a.content)
        rgb match {
          case Some((w, h, topDown, dibs)) =>
            (0 until dibs.length by stride).iterator.flatMap { f =>
              try Iterator.single(VideoFrame(a.asset_id, f,
                VideoContainer.decodeDib(dibs(f), w, h, topDown)))
              catch {
                case scala.util.control.NonFatal(_) => Iterator.empty
              }
            }
          case None => stubFrames(a)
        }
      }
    })
  }

  /** Relational view of features for SQL-side consumption — the bridge
    * from the typed kernel world back to Catalyst. */
  def featureFrame(features: Dataset[ImageFeatures]): DataFrame =
    features.toDF()
      .select(col("asset_id"),
        col("mean_rgb"), col("histogram"),
        round(aggregate(col("mean_rgb"), lit(0.0), (a, v) => a + v) /
          size(col("mean_rgb")), 6).as("brightness"))
}
