package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.ext.Multimodal

/** Multimodal plumbing: binary round-trips, the decode stub's typed
  * output, and resize determinism (same input+dims → same bytes). */
class MultimodalSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("fakeDecode yields the documented typed metadata struct") {
    val r = Seq("Hello world, this is a binary stand-in!").toDF("t")
      .select(Multimodal.fakeDecode(col("t").cast("binary")).as("m"))
      .select("m.width", "m.height", "m.format", "m.n_frames")
      .head()
    assert(r.getInt(0) == 'H'.toInt)
    assert(r.getInt(1) == 'e'.toInt)
    assert(Set("image", "audio", "video").contains(r.getString(2)))
    assert(r.getLong(3) == 39L / 16)
  }

  test("frame sampling strides the byte stream") {
    val frames = Seq("abcdefghijklmnopqrstuvwxyz").toDF("t")
      .select(Multimodal.sampleFrames(col("t").cast("binary"), 10).as("f"))
      .head().getSeq[String](0)
    assert(frames == Seq("61", "6b", "75")) // a, k, u
  }

  test("fakeResize is deterministic and dimension-sensitive") {
    val df = Seq("media-bytes").toDF("t").select(
      Multimodal.fakeResize(col("t").cast("binary"), 64, 64).as("a"),
      Multimodal.fakeResize(col("t").cast("binary"), 64, 64).as("b"),
      Multimodal.fakeResize(col("t").cast("binary"), 32, 32).as("c"))
    val r = df.head()
    assert(java.util.Arrays.equals(r.getAs[Array[Byte]](0), r.getAs[Array[Byte]](1)))
    assert(!java.util.Arrays.equals(r.getAs[Array[Byte]](0), r.getAs[Array[Byte]](2)))
  }
}
