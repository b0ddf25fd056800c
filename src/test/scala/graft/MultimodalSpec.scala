package graft

import graft.multimodal.Multimodal
import org.apache.spark.sql.functions._

/** Plumbing tests for the multimodal layer: the codec is a deterministic
  * stub, so assertions target what is real — schema, shapes, determinism,
  * resampling math, frame fan-out, and partition-locality.
  */
class MultimodalSpec extends SparkSpec {

  private lazy val assets = Multimodal.assetsFromDocuments(spark, sfDir)

  test("asset schema: opaque binary payload + typed metadata struct") {
    val df = assets.toDF()
    df.schema("content").dataType.typeName shouldBe "binary"
    df.schema("meta").dataType.typeName shouldBe "struct"
    assets.count() should be > 0L
    // payloads survive the round trip byte-exact
    val one = assets.filter(_.asset_id == 0L).head()
    new String(one.content, "UTF-8") shouldBe
      Tables.documents(spark, sfDir).filter(col("doc_id") === 0)
        .head().getAs[String]("text")
  }

  test("decode emits width*height*channels pixels, deterministically") {
    val d1 = Multimodal.decode(assets).collect().map(i => i.asset_id -> i).toMap
    val d2 = Multimodal.decode(assets).collect().map(i => i.asset_id -> i).toMap
    d1.keySet shouldBe d2.keySet
    d1.foreach { case (id, img) =>
      img.pixels.length shouldBe img.width * img.height * img.channels
      img.pixels.toSeq shouldBe d2(id).pixels.toSeq // reproducible
    }
  }

  test("resize produces exact target geometry and samples source pixels") {
    val resized = Multimodal.resize(Multimodal.decode(assets), 8, 8).collect()
    resized.foreach { img =>
      img.width shouldBe 8
      img.height shouldBe 8
      img.pixels.length shouldBe 8 * 8 * img.channels
    }
    // resizing to the identity geometry is a no-op
    val src = Multimodal.decode(assets.filter(_.asset_id == 1L))
    val same = Multimodal.resize(src, src.head().width, src.head().height)
    same.head().pixels.toSeq shouldBe src.head().pixels.toSeq
  }

  test("image features: channel means in [0,255], histogram sums to 1") {
    val feats = Multimodal.imageFeatures(Multimodal.decode(assets)).collect()
    feats.foreach { f =>
      f.mean_rgb.length shouldBe 3
      f.mean_rgb.foreach(m => m should (be >= 0.0 and be <= 255.0))
      f.histogram.length shouldBe 8
      math.abs(f.histogram.sum - 1.0) should be < 1e-9
    }
  }

  test("frame sampling fans out ceil(nFrames/stride) distinct frames per video") {
    val vids = assets.filter(_.modality == "video").collect()
      .map(a => a.asset_id -> a.meta.nFrames).toMap
    vids should not be empty
    val frames = Multimodal.sampleFrames(assets, stride = 2).collect()
    val byAsset = frames.groupBy(_.asset_id)
    byAsset.keySet shouldBe vids.keySet
    byAsset.foreach { case (id, fs) =>
      fs.length shouldBe (vids(id) + 1) / 2
      fs.map(_.frame_idx).toSet shouldBe (0 until vids(id) by 2).toSet
      // frames of one video differ (codec is content+frame sensitive)
      fs.map(_.pixels.toSeq).toSet.size shouldBe fs.length
    }
  }

  test("ImageIO codec decodes a real PNG byte-exactly through the Dataset kernel") {
    import spark.implicits._
    // paint a known 5x4 RGB pattern, encode it as a REAL png payload
    val (w, h) = (5, 4)
    val img = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w)
      img.setRGB(x, y, (x * 40 << 16) | (y * 60 << 8) | (x + y))
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    val asset = Multimodal.Asset(100L, "image", bos.toByteArray,
      Multimodal.AssetMeta(w, h, 3, 0, 1, "image/png"))

    val decoded = Multimodal.decode(Seq(asset).toDS()).head()
    decoded.width shouldBe w
    decoded.height shouldBe h
    decoded.channels shouldBe 3
    for (y <- 0 until h; x <- 0 until w) {
      val o = (y * w + x) * 3
      (decoded.pixels(o) & 0xff) shouldBe x * 40
      (decoded.pixels(o + 1) & 0xff) shouldBe y * 60
      (decoded.pixels(o + 2) & 0xff) shouldBe x + y
    }
    // the real decode feeds the same downstream kernels as the fake one
    val feats = Multimodal.imageFeatures(
      Multimodal.resize(Multimodal.decode(Seq(asset).toDS()), 2, 2)).head()
    feats.mean_rgb.length shouldBe 3
    math.abs(feats.histogram.sum - 1.0) should be < 1e-9
  }

  test("decodeSafe drops corrupt payloads and keeps decodable ones") {
    import spark.implicits._
    val img = new java.awt.image.BufferedImage(3, 3,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    val good = Multimodal.Asset(1L, "image", bos.toByteArray,
      Multimodal.AssetMeta(3, 3, 3, 0, 1, "image/png"))
    val corrupt = Multimodal.Asset(2L, "image",
      Array.fill[Byte](64)(0x7f), // not any image format
      Multimodal.AssetMeta(3, 3, 3, 0, 1, "image/png"))
    val out = Multimodal.decodeSafe(Seq(good, corrupt).toDS()).collect()
    out.map(_.asset_id).toSeq shouldBe Seq(1L)
    // the strict path must fail loudly on the same corpus
    an[Exception] should be thrownBy
      Multimodal.decode(Seq(corrupt).toDS()).collect()
  }

  /** Encode an interleaved [-1,1] waveform as a REAL WAV payload. */
  private def wavBytes(samples: Array[Float], sampleRate: Int,
      channels: Int, bits: Int): Array[Byte] = {
    import javax.sound.sampled._
    val fmt = new AudioFormat(sampleRate.toFloat, bits, channels,
      bits > 8, false) // WAV convention: 8-bit unsigned, else signed LE
    val bytes = new Array[Byte](samples.length * bits / 8)
    val bb = java.nio.ByteBuffer.wrap(bytes)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    samples.zipWithIndex.foreach { case (s, i) =>
      if (bits == 16) bb.putShort(i * 2, (s * 32767).toShort)
      else bytes(i) = ((s * 127).toInt + 128).toByte
    }
    val in = new AudioInputStream(new java.io.ByteArrayInputStream(bytes),
      fmt, samples.length / channels)
    val bos = new java.io.ByteArrayOutputStream()
    AudioSystem.write(in, AudioFileFormat.Type.WAVE, bos)
    bos.toByteArray
  }

  test("WAV codec decodes a real 16-bit sine through the Dataset kernel") {
    import spark.implicits._
    val (sr, hz, secs, amp) = (8000, 440.0, 0.25, 0.5)
    val n = (sr * secs).toInt
    val sine = Array.tabulate(n)(i =>
      (amp * math.sin(2 * math.Pi * hz * i / sr)).toFloat)
    val asset = Multimodal.Asset(200L, "audio", wavBytes(sine, sr, 1, 16),
      Multimodal.AssetMeta(0, 0, 1, sr, 0, "audio/wav"))

    val d = Multimodal.decodeAudio(Seq(asset).toDS()).head()
    d.sampleRate shouldBe sr
    d.channels shouldBe 1
    d.samples.length shouldBe n
    // 16-bit quantization: each sample within 1/32767 of the source
    d.samples.zip(sine).foreach { case (got, want) =>
      math.abs(got - want) should be < 2e-4f
    }

    val f = Multimodal.audioFeatures(
      Multimodal.decodeAudio(Seq(asset).toDS())).head()
    f.duration_s shouldBe (secs +- 1e-9)
    f.rms shouldBe (amp / math.sqrt(2)) +- 1e-3 // sine RMS = A/sqrt(2)
    f.peak shouldBe amp +- 1e-3
    // 440 Hz crosses zero 2*440 times/s
    f.zero_cross_rate shouldBe (2 * hz / sr) +- 0.01
  }

  test("WAV codec handles 8-bit unsigned stereo and the fake-mime corpus") {
    import spark.implicits._
    val n = 64
    val stereo = Array.tabulate(n * 2)(i =>
      if (i % 2 == 0) 0.25f else -0.25f) // L=+0.25, R=-0.25 interleaved
    val real = Multimodal.Asset(201L, "audio", wavBytes(stereo, 4000, 2, 8),
      Multimodal.AssetMeta(0, 0, 2, 4000, 0, "audio/wav"))
    val fake = Multimodal.Asset(202L, "audio", Array[Byte](1, 2, 3),
      Multimodal.AssetMeta(0, 0, 1, 8000, 0, "audio/fake"))

    val out = Multimodal.decodeAudio(Seq(real, fake).toDS()).collect()
      .map(a => a.asset_id -> a).toMap
    val r = out(201L)
    r.channels shouldBe 2
    r.samples.length shouldBe n * 2
    // 8-bit quantization: within 1/127
    r.samples.zip(stereo).foreach { case (got, want) =>
      math.abs(got - want) should be < 1e-2f
    }
    // fake decode is deterministic and in range
    val f1 = out(202L)
    val f2 = Multimodal.decodeAudio(Seq(fake).toDS()).head()
    f1.samples.toSeq shouldBe f2.samples.toSeq
    f1.samples.foreach(s => math.abs(s) should be <= 1.0f)
  }

  test("kernels are narrow: no shuffle in the decode->resize->features plan") {
    val plan = Multimodal.featureFrame(
      Multimodal.imageFeatures(
        Multimodal.resize(Multimodal.decode(assets), 8, 8)))
      .queryExecution.executedPlan.toString
    plan should not include "Exchange"
  }

  test("featureFrame exposes features relationally for downstream joins") {
    val df = Multimodal.featureFrame(
      Multimodal.imageFeatures(Multimodal.decode(assets)))
    df.columns.toSeq shouldBe Seq("asset_id", "mean_rgb", "histogram",
      "brightness")
    df.count() shouldBe assets.count()
  }

  // --- real container fixtures: MP4 box tree / RIFF AVI, byte-built ---

  private def be32(v: Long): Array[Byte] = Array(
    (v >> 24).toByte, (v >> 16).toByte, (v >> 8).toByte, v.toByte)
  private def be16(v: Int): Array[Byte] = Array((v >> 8).toByte, v.toByte)
  private def le32(v: Long): Array[Byte] = Array(
    v.toByte, (v >> 8).toByte, (v >> 16).toByte, (v >> 24).toByte)
  private def cc(s: String): Array[Byte] = s.getBytes("US-ASCII")
  private def box(typ: String, payload: Array[Byte]*): Array[Byte] = {
    val p = payload.flatten.toArray
    be32(8L + p.length) ++ cc(typ) ++ p
  }

  /** Minimal VALID MP4: ftyp + moov(mvhd v0 + trak(tkhd v0 + mdia(hdlr
    * vide))). mvhd: timescale 600, duration 1800 (3.0 s); tkhd geometry
    * 640×360 as 16.16 fixed. */
  private def mp4Bytes: Array[Byte] = {
    val mvhd = box("mvhd", Array[Byte](0, 0, 0, 0), // version 0 + flags
      be32(0), be32(0),                             // creation, modification
      be32(600), be32(1800),                        // timescale, duration
      be32(0x00010000L), be16(0x0100), be16(0),     // rate, volume, reserved
      new Array[Byte](8),                           // reserved
      new Array[Byte](36),                          // matrix
      new Array[Byte](24),                          // pre_defined
      be32(2))                                      // next_track_id
    val tkhd = box("tkhd", Array[Byte](0, 0, 0, 7),
      be32(0), be32(0), be32(1), be32(0), be32(1800), // cre, mod, id, res, dur
      new Array[Byte](8),                             // reserved
      be16(0), be16(0), be16(0), be16(0),             // layer, group, vol, res
      new Array[Byte](36),                            // matrix
      be32(640L << 16), be32(360L << 16))             // width, height (16.16)
    val hdlr = box("hdlr", Array[Byte](0, 0, 0, 0),
      be32(0), cc("vide"), new Array[Byte](12), Array[Byte](0))
    val ftyp = box("ftyp", cc("isom"), be32(512), cc("isom"), cc("iso2"))
    ftyp ++ box("moov", mvhd, box("trak", tkhd, box("mdia", hdlr)))
  }

  /** Minimal VALID AVI: RIFF(AVI  LIST(hdrl avih)): 40 ms/frame × 250
    * frames = 10.0 s, 2 streams, 320×240. */
  private def aviBytes: Array[Byte] = {
    val avih = cc("avih") ++ le32(56) ++
      le32(40000) ++ le32(0) ++ le32(0) ++ le32(0) ++ // usPerFrame..flags
      le32(250) ++ le32(0) ++ le32(2) ++ le32(0) ++   // totalFrames..sugBuf
      le32(320) ++ le32(240) ++ new Array[Byte](16)   // width, height, res
    val hdrl = cc("LIST") ++ le32(4L + avih.length) ++ cc("hdrl") ++ avih
    cc("RIFF") ++ le32(4L + hdrl.length) ++ cc("AVI ") ++ hdrl
  }

  /** AVI with a movi LIST of `00dc` MJPEG frames, each a real ImageIO
    * JPEG of a solid color. */
  private def mjpegAviBytes(colors: Seq[java.awt.Color], w: Int,
      h: Int): Array[Byte] = {
    def jpeg(c: java.awt.Color): Array[Byte] = {
      val img = new java.awt.image.BufferedImage(w, h,
        java.awt.image.BufferedImage.TYPE_INT_RGB)
      val g = img.createGraphics()
      g.setColor(c); g.fillRect(0, 0, w, h); g.dispose()
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "jpg", bos)
      bos.toByteArray
    }
    def chunk(typ: String, payload: Array[Byte]): Array[Byte] =
      cc(typ) ++ le32(payload.length.toLong) ++ payload ++
        (if (payload.length % 2 == 1) Array(0.toByte) else Array.empty[Byte])
    val avih = chunk("avih",
      le32(40000) ++ le32(0) ++ le32(0) ++ le32(0) ++
        le32(colors.length.toLong) ++ le32(0) ++ le32(1) ++ le32(0) ++
        le32(w.toLong) ++ le32(h.toLong) ++ new Array[Byte](16))
    val hdrl = cc("LIST") ++ le32(4L + avih.length) ++ cc("hdrl") ++ avih
    val frames = colors.toArray.flatMap(c => chunk("00dc", jpeg(c)))
    val movi = cc("LIST") ++ le32(4L + frames.length) ++ cc("movi") ++ frames
    cc("RIFF") ++ le32(4L + hdrl.length + movi.length) ++ cc("AVI ") ++
      hdrl ++ movi
  }

  /** Uncompressed BI_RGB AVI: strl(strh "vids"/strf BITMAPINFOHEADER
    * declaring 24-bit BI_RGB) + movi of `00db` DIB payloads built by a
    * per-pixel function (x, y, frame) → (r, g, b) — stored bottom-up,
    * BGR, rows padded to 4 bytes, exactly the on-disk layout. */
  private def rgbAviBytes(nFrames: Int, w: Int, h: Int)(
      px: (Int, Int, Int) => (Int, Int, Int)): Array[Byte] = {
    def chunk(typ: String, payload: Array[Byte]): Array[Byte] =
      cc(typ) ++ le32(payload.length.toLong) ++ payload ++
        (if (payload.length % 2 == 1) Array(0.toByte) else Array.empty[Byte])
    val stride = (w * 3 + 3) & ~3
    def dib(f: Int): Array[Byte] = {
      val out = new Array[Byte](stride * h)
      for (y <- 0 until h; x <- 0 until w) {
        val (r, g, b) = px(x, y, f)
        val o = (h - 1 - y) * stride + x * 3 // bottom-up rows
        out(o) = b.toByte; out(o + 1) = g.toByte; out(o + 2) = r.toByte
      }
      out
    }
    val strh = chunk("strh", cc("vids") ++ cc("DIB ") ++ new Array[Byte](48))
    val strf = chunk("strf",
      le32(40) ++ le32(w.toLong) ++ le32(h.toLong) ++
        Array[Byte](1, 0) ++ Array[Byte](24, 0) ++ le32(0) ++ // BI_RGB
        le32(stride.toLong * h) ++ new Array[Byte](16))
    val strl = cc("LIST") ++ le32(4L + strh.length + strf.length) ++
      cc("strl") ++ strh ++ strf
    val avih = chunk("avih",
      le32(40000) ++ le32(0) ++ le32(0) ++ le32(0) ++
        le32(nFrames.toLong) ++ le32(0) ++ le32(1) ++ le32(0) ++
        le32(w.toLong) ++ le32(h.toLong) ++ new Array[Byte](16))
    val hdrl = cc("LIST") ++ le32(4L + avih.length + strl.length) ++
      cc("hdrl") ++ avih ++ strl
    val frames = (0 until nFrames).toArray.flatMap(f => chunk("00db", dib(f)))
    val movi = cc("LIST") ++ le32(4L + frames.length) ++ cc("movi") ++ frames
    cc("RIFF") ++ le32(4L + hdrl.length + movi.length) ++ cc("AVI ") ++
      hdrl ++ movi
  }

  test("uncompressed RGB AVI frames decode losslessly, exact pixels") {
    import spark.implicits._
    import Multimodal._
    // per-pixel pattern exercises row order (y), column order (x),
    // channel order (RGB vs BGR) and frame identity (f) at once
    def pat(x: Int, y: Int, f: Int) = (x * 7 + f, y * 11 + f, x + y + f)
    val w = 10; val h = 6 // stride 30 → includes 2 pad bytes per row
    val avi = rgbAviBytes(nFrames = 4, w, h)(pat)
    val parsed = multimodal.VideoContainer.rgbFrames(avi)
    parsed should not be empty
    val (pw, ph, topDown, dibs) = parsed.get
    (pw, ph, topDown, dibs.length) shouldBe ((w, h, false, 4))
    val assets = Seq(Asset(960L, "video", avi,
      AssetMeta(0, 0, 0, 0, 0, "video/avi"))).toDS()
    val frames = sampleFrames(assets, stride = 3).collect().sortBy(_.frame_idx)
    frames.map(_.frame_idx).toSeq shouldBe Seq(0, 3)
    for (fr <- frames; y <- 0 until h; x <- 0 until w) {
      val (r, g, b) = pat(x, y, fr.frame_idx)
      val o = (y * w + x) * 3
      val got = (fr.pixels(o) & 0xff, fr.pixels(o + 1) & 0xff,
        fr.pixels(o + 2) & 0xff)
      withClue(s"frame ${fr.frame_idx} ($x,$y):") {
        got shouldBe ((r & 0xff, g & 0xff, b & 0xff))
      }
    }
    // the MJPEG path must not claim these chunks (no JPEG SOI)
    multimodal.VideoContainer.mjpegFrames(avi) shouldBe empty
  }

  test("MJPEG-in-AVI frames decode to real pixels; stride sampling holds") {
    import spark.implicits._
    import Multimodal._
    val colors = Seq(new java.awt.Color(200, 40, 90),
      new java.awt.Color(10, 180, 60), new java.awt.Color(60, 60, 220))
    val avi = mjpegAviBytes(colors, w = 32, h = 16)
    multimodal.VideoContainer.mjpegFrames(avi).length shouldBe 3
    val assets = Seq(Asset(950L, "video", avi,
      AssetMeta(0, 0, 0, 0, 0, "video/avi"))).toDS()
    val frames = sampleFrames(assets, stride = 2).collect().sortBy(_.frame_idx)
    frames.map(_.frame_idx).toSeq shouldBe Seq(0, 2)
    frames.foreach(_.pixels.length shouldBe 32 * 16 * 3)
    // JPEG is lossy: solid-color frames come back within a small delta
    def meanRgb(px: Array[Byte]): (Double, Double, Double) = {
      var r = 0.0; var g = 0.0; var b = 0.0
      var i = 0
      while (i < px.length) {
        r += px(i) & 0xff; g += px(i + 1) & 0xff; b += px(i + 2) & 0xff
        i += 3
      }
      val n = px.length / 3
      (r / n, g / n, b / n)
    }
    for ((frame, want) <- frames.zip(Seq(colors(0), colors(2)))) {
      val (r, g, b) = meanRgb(frame.pixels)
      r shouldBe want.getRed.toDouble +- 8.0
      g shouldBe want.getGreen.toDouble +- 8.0
      b shouldBe want.getBlue.toDouble +- 8.0
    }
    // non-MJPEG video (no movi JPEGs) still routes to the declared stub
    val stub = sampleFrames(Seq(Asset(951L, "video", "x".getBytes,
      AssetMeta(4, 4, 3, 0, 2, "video/fake"))).toDS(), 1).collect()
    stub.length shouldBe 2
  }

  test("MP4 box walk extracts real duration, geometry, tracks, handler") {
    val m = multimodal.VideoContainer.parse(mp4Bytes).get
    m.format shouldBe "mp4"
    m.durationS shouldBe 3.0
    m.timescale shouldBe 600L
    m.nTracks shouldBe 1
    (m.width, m.height) shouldBe ((640, 360))
    m.handlers shouldBe Seq("vide")
  }

  test("AVI header walk extracts real duration, streams, geometry") {
    val m = multimodal.VideoContainer.parse(aviBytes).get
    m.format shouldBe "avi"
    m.durationS shouldBe 10.0
    m.nTracks shouldBe 2
    (m.width, m.height) shouldBe ((320, 240))
  }

  test("container parser rejects garbage and truncation without throwing") {
    multimodal.VideoContainer.parse("not a video".getBytes) shouldBe None
    multimodal.VideoContainer.parse(Array.empty[Byte]) shouldBe None
    // truncate mid-moov: walk stops cleanly; ftyp alone yields no facts
    multimodal.VideoContainer.parse(mp4Bytes.take(40)) shouldBe None
  }

  test("videoMetadata kernel: real MP4/AVI parse + fake-corpus fallback") {
    import spark.implicits._
    import Multimodal._
    val real = Seq(
      Asset(900L, "video", mp4Bytes,
        AssetMeta(0, 0, 0, 0, 0, "video/mp4")),
      Asset(901L, "video", aviBytes,
        AssetMeta(0, 0, 0, 0, 0, "video/avi")),
      Asset(902L, "video", "corrupt".getBytes,
        AssetMeta(0, 0, 0, 0, 0, "video/mp4")), // quarantined, not thrown
      Asset(903L, "image", mp4Bytes,
        AssetMeta(0, 0, 0, 0, 0, "image/fake"))) // not a video: filtered
    val infos = videoMetadata(real.toDS()).collect().sortBy(_.asset_id)
    infos.map(_.asset_id).toSeq shouldBe Seq(900L, 901L)
    infos(0).format shouldBe "mp4"
    infos(0).duration_s shouldBe 3.0
    (infos(0).width, infos(0).height) shouldBe ((640, 360))
    infos(1).format shouldBe "avi"
    infos(1).duration_s shouldBe 10.0
    // the synthetic corpus routes through the declared fallback
    val fake = videoMetadata(assets).collect()
    fake.length should be > 0
    all(fake.map(_.format)) shouldBe "fake"
  }
}
