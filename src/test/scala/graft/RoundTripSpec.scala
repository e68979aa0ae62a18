package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.Gen
import graft.functions.EventFunctions._

/** Property tests: encode/decode round-trips hold for arbitrary input
  * (SURVEY §5.3). Properties are evaluated through Spark columns in one
  * batched DataFrame per property — not one job per case. */
class RoundTripSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val asciiGen: Gen[String] =
    Gen.listOf(Gen.choose(' ', '~')).map(_.mkString)
  private val unicodeGen: Gen[String] =
    Gen.listOf(Gen.oneOf(Gen.alphaNumChar, Gen.oneOf('€', 'ü', '中', '☃', ' ', '&', '=', '%', '+')))
      .map(_.mkString)

  private def batchCheck(inputs: Seq[String])(roundTrip: org.apache.spark.sql.Column => org.apache.spark.sql.Column): Unit = {
    val df = inputs.toDF("x")
      .select(col("x"), roundTrip(col("x")).as("rt"))
    val bad = df.filter(!(col("x") <=> col("rt"))).collect()
    assert(bad.isEmpty, s"round-trip failed for: ${bad.take(3).mkString(", ")}")
  }

  test("F10 url_decode(url_encode(x)) == x for printable ASCII + unicode") {
    val samples = (Gen.listOfN(200, asciiGen).sample.get ++
      Gen.listOfN(200, unicodeGen).sample.get).distinct
    batchCheck(samples)(c => urlDecode(urlEncode(c)))
  }

  test("F2/F5 day string round-trips through to_date for valid epochs") {
    val epochs = Gen.listOfN(300, Gen.choose(0L, 4102444800000L)).sample.get // 1970..2100
    val df = epochs.toDF("e")
      .select(epochToDay(col("e")).as("d"))
      .select(col("d"), dateToStr(strToDate(col("d"))).as("rt"))
    assert(df.filter(col("d") =!= col("rt")).isEmpty)
  }

  test("F7/F8 to_json/from_json round-trips a string map") {
    val mapGen = Gen.mapOf(Gen.zip(Gen.identifier, asciiGen)).map(_.take(5))
    val samples = Gen.listOfN(100, mapGen).sample.get
    val df = samples.toDF("m")
      .select(col("m"), from_json(to_json(col("m")),
        org.apache.spark.sql.types.MapType(
          org.apache.spark.sql.types.StringType,
          org.apache.spark.sql.types.StringType)).as("rt"))
    // compare as sorted entry lists (map equality isn't a Spark operator)
    val bad = df
      .select(map_entries(col("m")).as("a"), map_entries(col("rt")).as("b"))
      .select(array_sort(col("a")).as("a"), array_sort(col("b")).as("b"))
      .filter(!(col("a") <=> col("b"))).count()
    assert(bad == 0L)
  }

  test("F11/F12 line format/split round-trips for any payload and 56-digit seq") {
    val payloadGen = asciiGen.suchThat(!_.startsWith(" "))
    val seqGen = Gen.listOfN(56, Gen.numChar).map(_.mkString)
    val samples = Gen.listOfN(200, Gen.zip(seqGen, payloadGen)).sample.get
    val df = samples.toDF("s", "p")
      .select(col("s"), col("p"), formatLine(col("s"), col("p")).as("line"))
      .select(col("s"), col("p"),
        lineSeqNumber(col("line")).as("s2"), linePayload(col("line")).as("p2"))
    assert(df.filter(col("s") =!= col("s2") || !(col("p") <=> col("p2"))).isEmpty)
  }
}
