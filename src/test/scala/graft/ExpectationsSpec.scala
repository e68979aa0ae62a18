package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.ext.Expectations

/** The data-quality gate's contracts: NULL-violates semantics, the
  * accepted/quarantined split, and rule-NAME validation — names are
  * serialized comma-joined into the quarantine column and split back
  * for the per-rule census (q314), so a name carrying ',' would
  * silently corrupt that census. */
class ExpectationsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def df = Seq(
    (1L, Some("en"), Some(200L)),   // clean
    (2L, Some("xx"), Some(200L)),   // fails lang
    (3L, Some("en"), None),         // NULL length: violates (null violates)
    (4L, None, Some(10L))           // fails both (null lang violates too)
  ).toDF("id", "lang", "len")

  private val rules = Seq(
    "lang_ok" -> col("lang").isin("en", "de"),
    "len_min" -> (col("len") >= 100L))

  test("null violates; accepted/quarantined split is exact and lossless") {
    val acc = Expectations.accepted(df, rules).select("id").as[Long].collect().toSet
    assert(acc == Set(1L))
    val quar = Expectations.quarantined(df, rules)
      .select("id", "violations").as[(Long, String)].collect().toMap
    assert(quar == Map(2L -> "lang_ok", 3L -> "len_min", 4L -> "lang_ok,len_min"))
    // split-back census is sound because names are comma-free
    val census = Expectations.quarantined(df, rules)
      .select(explode(split(col("violations"), ",")).as("rule"))
      .groupBy("rule").count().as[(String, Long)].collect().toMap
    assert(census == Map("lang_ok" -> 2L, "len_min" -> 2L))
  }

  test("rule names that would corrupt the serialized census are refused") {
    // a ',' in a name splits into phantom rules downstream — refuse at
    // the one entry point (the requireHeaderSafe lesson)
    val e = intercept[IllegalArgumentException] {
      Expectations.withViolations(df, Seq("a,b" -> col("len").isNotNull))
    }
    assert(e.getMessage.contains(","), e.getMessage)
    intercept[IllegalArgumentException] {
      Expectations.withViolations(df, Seq("  " -> col("len").isNotNull))
    }
    intercept[IllegalArgumentException] {
      Expectations.withViolations(df, Seq("" -> col("len").isNotNull))
    }
    // duplicates and the empty rule set stay refused
    intercept[IllegalArgumentException] {
      Expectations.withViolations(df, Seq("r" -> lit(true), "r" -> lit(false)))
    }
    intercept[IllegalArgumentException] {
      Expectations.withViolations(df, Nil)
    }
  }
}
