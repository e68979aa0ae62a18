package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.etl.EventPipeline

/** SURVEY §7.4 risk 6: two-level JSON schema drift must surface as NULLs,
  * never as exceptions, and known-good payloads must extract non-null. */
class EtlSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def parseOne(data: String) =
    EventPipeline.parse(Seq(("1" * 56, data)).toDF("sequenceNumber", "data")).head()

  test("known-good payload extracts every mapped field non-null") {
    val body = """{\"args\": {\"utm_source\": \"g\", \"utm_campaign\": \"c\"}, \"path\": \"/p\", \"headers\": {\"X-Forward-For\": \"1.2.3.4\", \"User-Agent\": \"UA\", \"Cookie\": \"uid=7\"}, \"id\": \"x\", \"url\": \"http://e\", \"t\": 1704103500000, \"referrer\": \"http://r\"}"""
    val r = parseOne(s"""{"epoch": 1704103500005, "body": "$body"}""")
    val nonNull = Seq("id", "ts", "received_at", "url", "path", "referrer",
      "utm_source", "utm_campaign", "args", "cookies", "orig_data", "ip", "user_agent")
    nonNull.foreach { c => assert(!r.isNullAt(r.fieldIndex(c)), s"$c must be non-null") }
    assert(r.getAs[String]("utm_source") == "g")
    assert(r.getAs[String]("ip") == "1.2.3.4")
  }

  test("malformed outer JSON -> null fields, no exception (one bad record must not kill the job)") {
    val r = parseOne("""this is not json at all {{{""")
    assert(r.getAs[String]("id") == "1" * 56, "sequence number survives")
    assert(r.isNullAt(r.fieldIndex("url")))
    assert(!r.isNullAt(r.fieldIndex("ts")), "F1 fallback: unparseable t -> now, not null")
    assert(r.getAs[String]("orig_data").startsWith("this is not json"))
  }

  test("valid envelope with malformed inner body -> inner fields null, envelope fields intact") {
    val r = parseOne("""{"epoch": 1704103500005, "body": "NOT-JSON"}""")
    assert(r.isNullAt(r.fieldIndex("url")))
    assert(r.isNullAt(r.fieldIndex("utm_source")))
    assert(!r.isNullAt(r.fieldIndex("received_at")), "outer epoch still parses")
  }

  test("missing keys (schema drift) -> nulls for absent fields only") {
    val body = """{\"url\": \"http://only-url\"}"""
    val r = parseOne(s"""{"body": "$body"}""")
    assert(r.getAs[String]("url") == "http://only-url")
    assert(r.isNullAt(r.fieldIndex("utm_source")))
    assert(r.isNullAt(r.fieldIndex("ip")))
  }

  test("registerViews: every corpus table answers plain spark.sql, events with both ts forms") {
    Tables.registerViews(spark, "/root/testdata/sf0.001")
    for (t <- Tables.names)
      assert(spark.sql(s"SELECT * FROM $t LIMIT 1").collect().length == 1, t)
    val e = spark.sql("SELECT ts, ts_ns FROM events LIMIT 1").collect()(0)
    assert(!e.isNullAt(0) && !e.isNullAt(1))
    // ad-hoc SQL sees pushdown like everything else
    val plan = spark.sql("SELECT l_orderkey FROM lineitem WHERE l_quantity > 49")
      .queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters") && plan.contains("l_quantity"), plan)
  }
}
