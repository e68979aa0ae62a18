package graft.ext

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import graft.{QueryDef, Tables}

/** Multimodal-column tier: image/audio/video as opaque `binary` columns
  * with typed metadata, plus decode / resize / frame-sample /
  * feature-extract operators.
  *
  * The decode and resize steps are REAL as of round 5: pure-JDK
  * `javax.imageio` (PNG/JPEG/GIF/BMP — see
  * [[graft.functions.DecodeImage]] / [[graft.functions.ResizeImage]]).
  * Binaries that magic-sniff as an image container get real pixel stats
  * (width/height/mean-luma) and real bilinear thumbnails; anything else
  * (the synthetic text-backed fixtures) falls back to the deterministic
  * derivation the DuckDB oracle reproduces independently, so q51/q113
  * stay value-level oracle-checked while MultimodalSpec exercises the
  * real codec on generated PNGs. Audio/video containers remain opaque
  * binaries with typed metadata (the JDK ships no audio/video codec);
  * their decode seam is the same expression signature.
  *
  * Scale notes: all per-row scalar work, no shuffle — media pipelines
  * partition by file/object id and this tier preserves that; frame
  * sampling is O(bytes/stride) per row; decode is O(pixels) per real
  * image; nothing ever collects to the driver. */
object Multimodal {

  /** Byte at 1-based position `i` of a binary column, as an int 0-255.
    * (substring works positionally on BinaryType; hex→conv makes the value
    * arithmetic-friendly without a UDF.) */
  def byteAt(bin: Column, i: Column): Column =
    conv(hex(substring(bin, i, lit(1))), 16, 10).cast("int")

  /** Media decode: real `javax.imageio` pixels for image containers,
    * deterministic header parse for synthetic bytes (DecodeImage
    * scaladoc has the full contract). Returns
    * struct<width,height,format,n_frames,mean_luma>. */
  def decode(bin: Column): Column =
    org.apache.spark.sql.GraftBridge.column(
      graft.functions.DecodeImage(org.apache.spark.sql.GraftBridge.expression(bin)))

  /** Frame sampling: every `stride`-th byte as a lowercase hex "frame"
    * (the real version slices frame-aligned byte ranges — same plan
    * shape, different slice arithmetic). */
  def sampleFrames(bin: Column, stride: Int): Column =
    transform(
      sequence(lit(1), octet_length(bin), lit(stride)),
      i => lower(hex(substring(bin, i, lit(1)))))

  /** Feature extraction: mean byte value (stands in for a real per-frame
    * embedding; same aggregation shape). Native single-pass expression —
    * the HOF phrasing cost three allocations per byte. */
  def meanByte(bin: Column): Column =
    org.apache.spark.sql.GraftBridge.column(
      graft.functions.MeanByte(org.apache.spark.sql.GraftBridge.expression(bin)))

  /** Media resize: real bilinear resample + PNG re-encode for image
    * containers; synthetic bytes keep the md5((bytes || ":WxH"))
    * fingerprint q113's oracle checks (ResizeImage scaladoc). */
  def resize(bin: Column, w: Int, h: Int): Column =
    org.apache.spark.sql.GraftBridge.column(
      graft.functions.ResizeImage(
        org.apache.spark.sql.GraftBridge.expression(bin), w, h))

  // ---------------------------------------------------------------- q51
  /** Typed-metadata extraction over the binary column. Oracle computes the
    * same values from the source text (the corpus is ASCII, so byte k ==
    * ascii(char k)) — pinning Spark's binary path against an independent
    * derivation. */
  val q51 = QueryDef(
    "q51_multimodal_meta",
    (s, d) => {
      val bin = col("text").cast("binary")
      Tables.documents(s, d)
        .select(col("doc_id"),
          octet_length(bin).as("n_bytes"),
          decode(bin).as("meta"))
        .select(col("doc_id"), col("n_bytes"),
          col("meta.width").as("width"),
          col("meta.height").as("height"),
          col("meta.format").as("format"),
          col("meta.n_frames").as("n_frames"))
        .orderBy(col("doc_id"))
    },
    Some("""SELECT doc_id,
        CAST(length(text) AS INT) AS n_bytes,
        ascii(substr(text, 1, 1)) AS width,
        ascii(substr(text, 2, 1)) AS height,
        ['image','audio','video'][(ascii(substr(text, 3, 1)) % 3) + 1] AS format,
        CAST(length(text) // 16 AS BIGINT) AS n_frames
      FROM documents ORDER BY doc_id"""))

  // ---------------------------------------------------------------- q52
  /** Frame sampling + per-byte feature aggregation. Oracle derives the
    * same strided hex frames and mean byte value from the text. The frame
    * list is CSV-serialized so the driver's checker (which cannot hash
    * array-typed columns) gets a flat string to compare. */
  val q52 = QueryDef(
    "q52_frame_sample",
    (s, d) => {
      val bin = col("text").cast("binary")
      Tables.documents(s, d)
        .select(col("doc_id"),
          concat_ws(",", sampleFrames(bin, 16)).as("frames"),
          round(meanByte(bin), 6).as("mean_byte"))
        .orderBy(col("doc_id"))
    },
    Some("""SELECT doc_id,
        array_to_string([printf('%02x', ascii(substr(text, i, 1))) for i in range(1, length(text) + 1, 16)], ',') AS frames,
        round(list_avg([ascii(substr(text, i, 1)) for i in range(1, length(text) + 1)]), 6) AS mean_byte
      FROM documents ORDER BY doc_id"""))

  // ---------------------------------------------------------------- q113
  /** Resize stage over the binary column — the synthetic-path md5
    * derivation is cross-engine-stable, so the whole path (binary
    * addressing, per-target-dimension fingerprint, output bytes) is
    * value-level oracle-checked; real image containers take the real
    * bilinear+PNG path (spec-pinned in MultimodalSpec). Two target
    * geometries per row, as a thumbnail pipeline would emit. */
  val q113 = QueryDef(
    "q113_multimodal_resize",
    (s, d) => {
      val bin = col("text").cast("binary")
      Tables.documents(s, d)
        .select(col("doc_id"),
          hex(resize(bin, 64, 64)).as("resized_64x64"),
          hex(resize(bin, 32, 24)).as("resized_32x24"))
        .orderBy(col("doc_id"))
    },
    Some("""SELECT doc_id,
        upper(md5(text || ':64x64')) AS resized_64x64,
        upper(md5(text || ':32x24')) AS resized_32x24
      FROM documents ORDER BY doc_id"""),
    doc = "thumbnail/resize stage; the md5 stub makes the full binary path value-level checkable")

  /** Audio decode: real `javax.sound` parse for audio containers,
    * deterministic byte-derived stand-in otherwise (DecodeAudio scaladoc
    * has the full contract). Returns
    * struct<sample_rate,channels,bits,n_samples,rms,peak>. */
  def decodeAudio(bin: Column): Column =
    org.apache.spark.sql.GraftBridge.column(
      graft.functions.DecodeAudio(org.apache.spark.sql.GraftBridge.expression(bin)))

  // ---------------------------------------------------------------- q193
  /** REAL audio decode, oracle-checked end to end: each document's text is
    * packed in-query into a genuine RIFF/WAVE container (mono, 8 kHz,
    * 16-bit PCM; sample i = (ascii(charᵢ) − 64)·256, built with pure hex
    * string expressions + unhex — no UDF), and [[graft.functions.DecodeAudio]]
    * parses it back through `javax.sound.sampled.AudioSystem` — the real
    * production path, not the synthetic fallback. The oracle recomputes
    * sample count, RMS and peak amplitude in closed form from the text, so
    * a codec regression (endianness flip, off-by-one in the data chunk,
    * broken sign handling) hash-fails the gate. RMS crosses the oracle
    * bit-stably because Σv² is an exact integer in both engines (see
    * AudioCodec determinism note); real-world WAVs (AudioSystem-written
    * stereo fixtures, corrupt containers) are additionally pinned in
    * MultimodalSpec. Per-row scalar work only — no shuffle. */
  val q193 = QueryDef(
    "q193_audio_decode",
    (s, d) => {
      val wav = expr("""unhex(concat(
          '52494646',
          format_string('%02x%02x%02x%02x',
            (36 + 2 * length(text)) & 255,
            ((36 + 2 * length(text)) >> 8) & 255,
            ((36 + 2 * length(text)) >> 16) & 255,
            ((36 + 2 * length(text)) >> 24) & 255),
          '57415645666d74201000000001000100401f0000803e00000200100064617461',
          format_string('%02x%02x%02x%02x',
            (2 * length(text)) & 255,
            ((2 * length(text)) >> 8) & 255,
            ((2 * length(text)) >> 16) & 255,
            ((2 * length(text)) >> 24) & 255),
          array_join(transform(split(text, ''),
            c -> concat('00', lpad(hex(pmod(ascii(c) - 64, 256)), 2, '0'))), '')))""")
      Tables.documents(s, d)
        .select(col("doc_id"), decodeAudio(wav).as("a"))
        .select(col("doc_id"),
          col("a.sample_rate").as("sample_rate"),
          col("a.channels").as("channels"),
          col("a.bits").as("bits"),
          col("a.n_samples").as("n_samples"),
          round(col("a.rms"), 6).as("rms"),
          col("a.peak").as("peak"))
        .orderBy(col("doc_id"))
    },
    Some("""SELECT doc_id,
        8000 AS sample_rate, 1 AS channels, 16 AS bits,
        CAST(length(text) AS BIGINT) AS n_samples,
        round(sqrt(CAST(list_sum([
            ((ascii(substr(text, i, 1)) - 64) * 256) * ((ascii(substr(text, i, 1)) - 64) * 256)
            for i in range(1, length(text) + 1)]) AS DOUBLE) / length(text)), 6) AS rms,
        CAST(list_max([abs((ascii(substr(text, i, 1)) - 64) * 256)
            for i in range(1, length(text) + 1)]) AS INT) AS peak
      FROM documents ORDER BY doc_id"""),
    doc = "real javax.sound WAV decode over in-query-built PCM containers; RMS/peak closed-form oracle")

  val all: Seq[QueryDef] = Seq(q51, q52, q113, q193)
}
