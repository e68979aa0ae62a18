package graft.ext

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import graft.{QueryDef, Tables}

/** Multimodal-column tier: image/audio/video as opaque `binary` columns
  * with typed metadata, plus decode / frame-sample / feature-extract
  * operators.
  *
  * The container has no codec libraries, so the *decode* step is a
  * clearly-marked deterministic fake (see [[fakeDecode]]) — but every
  * piece of Spark plumbing around it is real and oracle-checked: the
  * binary column (`cast(text as binary)` stands in for real media bytes),
  * `octet_length`/`substring`-on-binary/`hex` byte access, per-byte
  * feature aggregation, and stride-based frame sampling. Swapping
  * [[fakeDecode]] for a real codec (a JNI/UDF call at the same signature:
  * binary → struct<width,height,format,n_frames>) changes nothing else in
  * the pipeline.
  *
  * Scale notes: all per-row scalar work, no shuffle — media pipelines
  * partition by file/object id and this tier preserves that; frame
  * sampling is O(bytes/stride) per row; nothing ever collects to the
  * driver. */
object Multimodal {

  /** Byte at 1-based position `i` of a binary column, as an int 0-255.
    * (substring works positionally on BinaryType; hex→conv makes the value
    * arithmetic-friendly without a UDF.) */
  def byteAt(bin: Column, i: Column): Column =
    conv(hex(substring(bin, i, lit(1))), 16, 10).cast("int")

  /** DECODE STUB — deterministic fake standing in for a real media codec.
    * Parses a fake header: width/height from the first two bytes, format
    * from byte 3 mod 3, frame count from the byte length. A real
    * implementation replaces ONLY this function with a codec UDF of the
    * same shape. */
  def fakeDecode(bin: Column): Column = struct(
    byteAt(bin, lit(1)).as("width"),
    byteAt(bin, lit(2)).as("height"),
    element_at(array(lit("image"), lit("audio"), lit("video")),
      pmod(byteAt(bin, lit(3)), lit(3)) + 1).as("format"),
    (octet_length(bin) / 16).cast("long").as("n_frames"))

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

  /** RESIZE STUB — deterministic fake: a "resized" media object is the
    * md5 of (content, w, h) so downstream schema/partitioning is real
    * while the pixel math is stubbed. */
  def fakeResize(bin: Column, w: Int, h: Int): Column =
    unhex(md5(concat(bin, lit(s":${w}x$h"))))

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
          fakeDecode(bin).as("meta"))
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
  /** Resize stage over the binary column — the stub's md5 derivation is
    * itself cross-engine-stable, so unlike most codec stand-ins the whole
    * path (binary concat, per-target-dimension addressing, output bytes)
    * is value-level oracle-checked, not just spec-pinned. Two target
    * geometries per row, as a thumbnail pipeline would emit. */
  val q113 = QueryDef(
    "q113_multimodal_resize",
    (s, d) => {
      val bin = col("text").cast("binary")
      Tables.documents(s, d)
        .select(col("doc_id"),
          hex(fakeResize(bin, 64, 64)).as("resized_64x64"),
          hex(fakeResize(bin, 32, 24)).as("resized_32x24"))
        .orderBy(col("doc_id"))
    },
    Some("""SELECT doc_id,
        upper(md5(text || ':64x64')) AS resized_64x64,
        upper(md5(text || ':32x24')) AS resized_32x24
      FROM documents ORDER BY doc_id"""),
    doc = "thumbnail/resize stage; the md5 stub makes the full binary path value-level checkable")

  val all: Seq[QueryDef] = Seq(q51, q52, q113)
}
