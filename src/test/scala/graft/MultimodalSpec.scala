package graft

import java.awt.image.BufferedImage
import java.io.ByteArrayOutputStream
import javax.imageio.ImageIO

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.ext.Multimodal

/** Multimodal plumbing: binary round-trips, the real javax.imageio
  * decode path on generated PNGs/JPEGs, the synthetic fallback the
  * oracle checks, and resize geometry/determinism. */
class MultimodalSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  /** A w×h image filled with one RGB color, encoded via ImageIO. */
  private def encoded(w: Int, h: Int, rgb: Int, format: String): Array[Byte] = {
    val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
    val g = img.createGraphics()
    try { g.setColor(new java.awt.Color(rgb)); g.fillRect(0, 0, w, h) }
    finally g.dispose()
    val bos = new ByteArrayOutputStream()
    ImageIO.write(img, format, bos)
    bos.toByteArray
  }

  test("decode on synthetic (non-image) bytes yields the oracle-checked header parse") {
    val r = Seq("Hello world, this is a binary stand-in!").toDF("t")
      .select(Multimodal.decode(col("t").cast("binary")).as("m"))
      .select("m.width", "m.height", "m.format", "m.n_frames", "m.mean_luma")
      .head()
    assert(r.getInt(0) == 'H'.toInt)
    assert(r.getInt(1) == 'e'.toInt)
    assert(Set("image", "audio", "video").contains(r.getString(2)))
    assert(r.getLong(3) == 39L / 16)
    assert(r.isNullAt(4), "synthetic path has no pixels, mean_luma must be null")
  }

  test("decode on a real PNG yields real geometry and mean luma") {
    // 5x3 pure red: mean_luma = 0.299 exactly under Rec.601
    val png = encoded(5, 3, 0xFF0000, "png")
    val r = Seq(png).toDF("b")
      .select(Multimodal.decode(col("b")).as("m"))
      .select("m.width", "m.height", "m.format", "m.n_frames", "m.mean_luma")
      .head()
    assert(r.getInt(0) == 5 && r.getInt(1) == 3)
    assert(r.getString(2) == "image" && r.getLong(3) == 1L)
    assert(math.abs(r.getDouble(4) - 0.299) < 1e-9)
    // mid-gray: luma = 128/255 regardless of channel weights
    val gray = encoded(4, 4, 0x808080, "png")
    val luma = Seq(gray).toDF("b")
      .select(Multimodal.decode(col("b")).getField("mean_luma")).as[Double].head()
    assert(math.abs(luma - 128.0 / 255.0) < 1e-9)
  }

  test("decode on a multi-frame GIF reports the true frame count") {
    val bos = new ByteArrayOutputStream()
    val writer = ImageIO.getImageWritersByFormatName("gif").next()
    val ios = ImageIO.createImageOutputStream(bos)
    try {
      writer.setOutput(ios)
      writer.prepareWriteSequence(null)
      for (c <- Seq(0xFF0000, 0x00FF00, 0x0000FF)) {
        val img = new BufferedImage(3, 3, BufferedImage.TYPE_INT_RGB)
        val g = img.createGraphics()
        try { g.setColor(new java.awt.Color(c)); g.fillRect(0, 0, 3, 3) }
        finally g.dispose()
        writer.writeToSequence(new javax.imageio.IIOImage(img, null, null), null)
      }
      writer.endWriteSequence()
    } finally { ios.close(); writer.dispose() }
    val gif = bos.toByteArray
    val r = Seq(gif).toDF("b")
      .select(Multimodal.decode(col("b")).as("m"))
      .select("m.width", "m.height", "m.format", "m.n_frames").head()
    assert(r.getInt(0) == 3 && r.getInt(1) == 3)
    assert(r.getString(2) == "image")
    assert(r.getLong(3) == 3L, "animated GIF must report its real frame count")
  }

  test("decode on a real JPEG yields real geometry (second JDK container)") {
    val jpg = encoded(7, 2, 0xFFFFFF, "jpg")
    val r = Seq(jpg).toDF("b")
      .select(Multimodal.decode(col("b")).as("m"))
      .select("m.width", "m.height", "m.format").head()
    assert(r.getInt(0) == 7 && r.getInt(1) == 2 && r.getString(2) == "image")
  }

  test("frame sampling strides the byte stream") {
    val frames = Seq("abcdefghijklmnopqrstuvwxyz").toDF("t")
      .select(Multimodal.sampleFrames(col("t").cast("binary"), 10).as("f"))
      .head().getSeq[String](0)
    assert(frames == Seq("61", "6b", "75")) // a, k, u
  }

  test("resize on synthetic bytes keeps the oracle md5 fingerprint, deterministic + dim-sensitive") {
    val df = Seq("media-bytes").toDF("t").select(
      Multimodal.resize(col("t").cast("binary"), 64, 64).as("a"),
      Multimodal.resize(col("t").cast("binary"), 64, 64).as("b"),
      Multimodal.resize(col("t").cast("binary"), 32, 32).as("c"),
      unhex(md5(concat(col("t").cast("binary"), lit(":64x64")))).as("oracle"))
    val r = df.head()
    assert(java.util.Arrays.equals(r.getAs[Array[Byte]](0), r.getAs[Array[Byte]](1)))
    assert(!java.util.Arrays.equals(r.getAs[Array[Byte]](0), r.getAs[Array[Byte]](2)))
    assert(java.util.Arrays.equals(r.getAs[Array[Byte]](0), r.getAs[Array[Byte]](3)),
      "synthetic resize must equal the md5 derivation q113's oracle encodes")
  }

  test("resize on a real PNG emits a real PNG at the target geometry") {
    val png = encoded(8, 8, 0x0000FF, "png")
    val out = Seq(png).toDF("b")
      .select(Multimodal.resize(col("b"), 4, 2).as("r")).head().getAs[Array[Byte]](0)
    val back = ImageIO.read(new java.io.ByteArrayInputStream(out))
    assert(back != null, "resized output must itself decode")
    assert(back.getWidth == 4 && back.getHeight == 2)
    // solid-color input stays solid through bilinear resampling
    assert((back.getRGB(0, 0) & 0xFFFFFF) == 0x0000FF)
  }

  test("corrupt image-magic bytes fall back instead of throwing (poison-object safety)") {
    val junk = Array[Byte](0x89.toByte, 'P', 'N', 'G', 1, 2, 3, 4)
    val r = Seq(junk).toDF("b")
      .select(Multimodal.decode(col("b")).as("m"))
      .select("m.width", "m.height").head()
    assert(r.getInt(0) == 0x89 && r.getInt(1) == 'P'.toInt,
      "truncated PNG must take the synthetic fallback, not kill the scan")
  }

  /** An AudioSystem-written PCM WAV with the given interleaved samples. */
  private def wav(sampleRate: Float, channels: Int, samples: Array[Short]): Array[Byte] = {
    import javax.sound.sampled.{AudioFileFormat, AudioFormat, AudioInputStream, AudioSystem}
    val bytes = new Array[Byte](samples.length * 2)
    var i = 0
    while (i < samples.length) {
      bytes(2 * i) = (samples(i) & 0xff).toByte
      bytes(2 * i + 1) = ((samples(i) >> 8) & 0xff).toByte
      i += 1
    }
    val fmt = new AudioFormat(sampleRate, 16, channels, true, false)
    val in = new AudioInputStream(
      new java.io.ByteArrayInputStream(bytes), fmt, samples.length / channels)
    val bos = new ByteArrayOutputStream()
    AudioSystem.write(in, AudioFileFormat.Type.WAVE, bos)
    bos.toByteArray
  }

  test("audio decode on a real stereo 16-bit WAV yields real format + exact RMS/peak") {
    // 44.1 kHz stereo, 4 frames = 8 samples of known amplitude
    val samples = Array[Short](1000, -1000, 2000, -2000, 3000, -3000, 4000, -4000)
    val r = Seq(wav(44100f, 2, samples)).toDF("b")
      .select(Multimodal.decodeAudio(col("b")).as("a"))
      .select("a.sample_rate", "a.channels", "a.bits", "a.n_samples", "a.rms", "a.peak")
      .head()
    assert(r.getInt(0) == 44100 && r.getInt(1) == 2 && r.getInt(2) == 16)
    assert(r.getLong(3) == 8L)
    val expectedRms = math.sqrt(samples.map(s => s.toLong * s).sum.toDouble / 8)
    assert(r.getDouble(4) == expectedRms, "RMS must be the exact-integer-sum sqrt")
    assert(r.getInt(5) == 4000)
  }

  test("audio decode on corrupt RIFF magic falls back instead of throwing (poison-object safety)") {
    val junk = "RIFF????WAVEgarbage-not-a-wav".getBytes("UTF-8")
    val r = Seq(junk).toDF("b")
      .select(Multimodal.decodeAudio(col("b")).as("a"))
      .select("a.sample_rate", "a.channels", "a.rms").head()
    assert(r.getInt(0) == 8000 + (('R'.toInt) % 8) * 1000,
      "corrupt container must take the deterministic fallback, not kill the scan")
    assert(r.isNullAt(2), "fallback path has no samples, rms must be null")
  }

  test("audio decode on non-audio bytes takes the byte-derived fallback") {
    val r = Seq("plain text document").toDF("t")
      .select(Multimodal.decodeAudio(col("t").cast("binary")).as("a"))
      .select("a.sample_rate", "a.channels", "a.bits", "a.n_samples", "a.rms").head()
    assert(r.getInt(0) == 8000 + ('p'.toInt % 8) * 1000)
    assert(r.getInt(1) == ('l'.toInt % 2) + 1)
    assert(r.getInt(2) == 16 && r.getLong(3) == "plain text document".length / 2L)
    assert(r.isNullAt(4))
  }
}
