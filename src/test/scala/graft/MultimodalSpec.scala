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
}
