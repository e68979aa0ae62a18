package graft.functions

import java.io.ByteArrayInputStream
import javax.sound.sampled.AudioSystem

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._

/** Real JDK audio codec for the multimodal tier — pure
  * `javax.sound.sampled` (the WAV/AIFF/AU file readers ship with every
  * JDK; no external libraries), the audio sibling of [[ImageCodec]].
  *
  * Contract: bytes that magic-sniff as a RIFF/WAVE (or AIFF `FORM`, AU
  * `.snd`) container are parsed by `AudioSystem` for real — sample rate,
  * channel count, bit depth, and frame count come from the container's
  * format chunk, and for 8/16-bit PCM payloads the PCM samples are
  * decoded to integer amplitudes for RMS/peak statistics. Anything else
  * falls back to a deterministic byte-derived stand-in (the q51 ethos:
  * value-level checkable without the container), and parse failures on
  * sniffed bytes fall back rather than throw — one corrupt object must
  * never kill a 100 TB scan.
  *
  * Determinism note: RMS is √(Σv²/n) where Σv² is accumulated as an
  * exact Long over integer sample amplitudes, so the double produced —
  * and hence the oracle comparison after round(…, 6) — is bit-stable
  * across engines and partitionings (no float accumulation order
  * anywhere). Strictly per-row scalar work; codegen calls the shared
  * eval through a reference object (repo-wide pattern), keeping the
  * surrounding stage in whole-stage codegen. */
object AudioCodec {

  /** Magic-byte sniff for the containers the JDK readers handle. */
  def looksLikeAudio(b: Array[Byte]): Boolean =
    b.length >= 12 && (
      (b(0) == 'R' && b(1) == 'I' && b(2) == 'F' && b(3) == 'F'
        && b(8) == 'W' && b(9) == 'A' && b(10) == 'V' && b(11) == 'E') ||
      (b(0) == 'F' && b(1) == 'O' && b(2) == 'R' && b(3) == 'M') ||
      (b(0) == '.' && b(1) == 's' && b(2) == 'n' && b(3) == 'd'))

  final case class WavStats(
      sampleRate: Int, channels: Int, bits: Int, nSamples: Long,
      rms: java.lang.Double, peak: java.lang.Integer)

  /** Parse + PCM-decode via AudioSystem; null when the bytes don't parse
    * (caller falls back to the synthetic path). For 8/16-bit PCM the
    * amplitude statistics are computed over every sample of every
    * channel; for other encodings (float WAV, a-law…) the format
    * metadata is still real and the statistics are null. */
  def readAudio(b: Array[Byte]): WavStats = {
    if (!looksLikeAudio(b)) return null
    try {
      val in = AudioSystem.getAudioInputStream(new ByteArrayInputStream(b))
      try {
        val fmt = in.getFormat
        val bits = fmt.getSampleSizeInBits
        val channels = fmt.getChannels
        val frames = in.getFrameLength
        val nSamples = if (frames >= 0) frames * channels else -1L
        val enc = fmt.getEncoding.toString
        val pcm = (enc == "PCM_SIGNED" || enc == "PCM_UNSIGNED") &&
          (bits == 8 || bits == 16) && nSamples > 0
        if (!pcm) {
          WavStats(fmt.getSampleRate.toInt, channels, bits,
            math.max(nSamples, 0L), null, null)
        } else {
          val data = in.readAllBytes()
          val bigEndian = fmt.isBigEndian
          val signed = enc == "PCM_SIGNED"
          var sumSq = 0L
          var peak = 0
          var n = 0L
          if (bits == 8) {
            var i = 0
            while (i < data.length) {
              val v = if (signed) data(i).toInt else (data(i) & 0xff) - 128
              sumSq += v.toLong * v; if (math.abs(v) > peak) peak = math.abs(v)
              n += 1; i += 1
            }
          } else {
            var i = 0
            while (i + 1 < data.length) {
              val raw =
                if (bigEndian) ((data(i) & 0xff) << 8) | (data(i + 1) & 0xff)
                else ((data(i + 1) & 0xff) << 8) | (data(i) & 0xff)
              val v = if (signed) raw.toShort.toInt else raw - 32768
              sumSq += v.toLong * v; if (math.abs(v) > peak) peak = math.abs(v)
              n += 1; i += 2
            }
          }
          val rms: java.lang.Double =
            if (n == 0) null else math.sqrt(sumSq.toDouble / n)
          WavStats(fmt.getSampleRate.toInt, channels, bits, n, rms,
            if (n == 0) null else Int.box(peak))
        }
      } finally in.close()
    } catch { case _: Exception => null }
  }
}

/** binary → struct<sample_rate,channels,bits,n_samples,rms,peak>: real
  * `javax.sound` parse for audio containers; deterministic byte-derived
  * stand-in for synthetic fixtures (sample_rate from byte 0, channels
  * from byte 1, 16-bit, n_samples = length/2 — rms/peak null, mirroring
  * DecodeImage's fallback shape). */
case class DecodeAudio(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StructType(Seq(
    StructField("sample_rate", IntegerType, nullable = false),
    StructField("channels", IntegerType, nullable = false),
    StructField("bits", IntegerType, nullable = false),
    StructField("n_samples", LongType, nullable = false),
    StructField("rms", DoubleType, nullable = true),
    StructField("peak", IntegerType, nullable = true)))

  override def prettyName: String = "decode_audio"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"decode_audio expects binary, got ${other.simpleString}")
  }

  /** Shared by eval and codegen. */
  def decode(bytes: Array[Byte]): GenericInternalRow = {
    val a = AudioCodec.readAudio(bytes)
    if (a != null) {
      new GenericInternalRow(Array[Any](
        a.sampleRate, a.channels, a.bits, a.nSamples,
        if (a.rms == null) null else a.rms.doubleValue(),
        if (a.peak == null) null else a.peak.intValue()))
    } else {
      def at(i: Int): Int = if (bytes.length > i) bytes(i) & 0xff else 0
      new GenericInternalRow(Array[Any](
        8000 + (at(0) % 8) * 1000, (at(1) % 2) + 1, 16,
        bytes.length.toLong / 2L, null, null))
    }
  }

  override def nullSafeEval(input: Any): Any =
    decode(input.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val self = ctx.addReferenceObj("decodeAudio", this, classOf[DecodeAudio].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $self.decode($c);")
  }

  override protected def withNewChildInternal(newChild: Expression): DecodeAudio =
    copy(child = newChild)
}
