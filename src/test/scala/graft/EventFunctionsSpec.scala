package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.Row
import org.scalatest.funsuite.AnyFunSuite
import graft.functions.EventFunctions._

/** Reference-pinned unit tests for the F-series scalar functions
  * (citations into /root/reference/src/kinesis3/). */
class EventFunctionsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("F4 hour truncation matches the reference's documented example " +
    "(utils.clj:53-56: 1437609280911 -> 1437606000)") {
    val out = Seq(1437609280911L).toDF("epoch")
      .select(hourStartEpoch(col("epoch")).as("h"))
      .head().getLong(0)
    assert(out == 1437606000L)
  }

  test("F2/F3 epoch formatting (utils.clj:32-40)") {
    val df = Seq(1437609280911L).toDF("epoch")
      .select(epochToDay(col("epoch")).as("d"), epochToDatetime(col("epoch")).as("dt"))
    val r = df.head()
    assert(r.getString(0) == "2015-07-22")
    assert(r.getString(1) == "2015-07-22T23:54:40")
  }

  test("F1 fallback: unparseable epoch falls back to now, not null " +
    "(utils.clj:26-30 rescue branch)") {
    val r = Seq("garbage").toDF("epoch")
      .select(epochMillisToTs(col("epoch")).as("ts"))
      .head()
    assert(!r.isNullAt(0))
  }

  test("F9 cookie parsing pins every reference edge case (db.clj:136-144)") {
    val cookie = "uid=42; sess=%2Fa%20b; theme=dark; q=a=b; bad=%zz"
    val r = Seq(cookie).toDF("c")
      .select(parseCookies(col("c")).as("m"))
      .head().getMap[String, String](0)
    assert(r("uid") == "42")
    assert(r("sess") == "/a b")     // URL-decoded value
    assert(r("theme") == "dark")    // "; " separator absorbed by key trim
    assert(r("q") == "a=b")         // '=' in value: split at FIRST '=' only
    assert(r.get("bad").flatMap(Option(_)).isEmpty) // malformed % -> NULL, not an exception
  }

  test("F11 fixed-offset 56/57 line split (utils.clj:17-19)") {
    val seq56 = "1" * 56
    val line = s"$seq56 payload here"
    val r = Seq(line).toDF("l")
      .select(lineSeqNumber(col("l")).as("s"), linePayload(col("l")).as("p"))
      .head()
    assert(r.getString(0) == seq56)
    assert(r.getString(1) == "payload here")
  }

  test("F12 line format composes with F11 split losslessly (core.clj:153)") {
    val r = Seq(("9" * 56, """{"a":1}""")).toDF("seq", "data")
      .select(formatLine(col("seq"), col("data")).as("line"))
      .select(lineSeqNumber(col("line")).as("s"), linePayload(col("line")).as("p"))
      .head()
    assert(r.getString(0) == "9" * 56)
    assert(r.getString(1) == """{"a":1}""")
  }

  test("F13 UTM extraction returns null for absent keys (db.clj:166-170)") {
    val r = Seq(Map("utm_source" -> "g")).toDF("args")
      .select(utmCols(col("args")): _*)
      .head()
    assert(r.getString(0) == "g")      // utm_source
    assert(r.isNullAt(1))              // utm_campaign absent -> null
  }

  test("F14 asVector: null -> empty array, scalar -> singleton (utils.clj:73-77)") {
    val rows = Seq(Some("x"), None).toDF("v")
      .select(asVector(col("v")).as("a"))
      .collect()
    assert(rows(0).getSeq[String](0) == Seq("x"))
    assert(rows(1).getSeq[String](0) == Seq())
  }
}
