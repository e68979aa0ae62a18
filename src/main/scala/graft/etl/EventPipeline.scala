package graft.etl

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.functions.EventFunctions._

/** The reference's ingest hot path (src/kinesis3/db.clj:146-173) as one
  * declarative select over a raw (sequenceNumber, data) DataFrame:
  * two-level JSON parse (outer envelope, then the `body` JSON *string*),
  * header/cookie explosion, UTM extraction — schema-on-read with declared
  * StructTypes instead of cheshire's dynamic maps (SURVEY §1.2).
  *
  * Everything is a single projection: no shuffle, fully codegen'd, so the
  * parse scales linearly with input splits on a real cluster.
  */
object EventPipeline {

  /** Outer envelope (FIXTURES A.2; db.clj:148-149). `body` stays StringType —
    * it is a JSON string parsed a second time, mirroring the reference's two
    * `parse-string` calls. */
  val envelopeSchema: StructType = StructType(Seq(
    StructField("m", StringType),
    StructField("epoch", LongType),
    StructField("ip", StringType),
    StructField("time", StringType),
    StructField("ua", StringType),
    StructField("params", MapType(StringType, StringType)),
    StructField("headers", MapType(StringType, StringType)),
    StructField("host", StringType),
    StructField("srv", StringType),
    StructField("uri", StringType),
    StructField("body", StringType),
    StructField("refer", StringType)))

  /** Inner request (FIXTURES A.3; db.clj:151-153). */
  val requestSchema: StructType = StructType(Seq(
    StructField("args", MapType(StringType, StringType)),
    StructField("path", StringType),
    StructField("method", StringType),
    StructField("env", MapType(StringType, StringType)),
    StructField("headers", StructType(Seq(
      StructField("X-Forward-For", StringType),
      StructField("User-Agent", StringType),
      StructField("Host", StringType),
      StructField("Cookie", StringType)))),
    StructField("referrer", StringType),
    StructField("id", StringType),
    StructField("url", StringType),
    StructField("t", LongType),
    StructField("form", MapType(StringType, StringType)),
    StructField("user", MapType(StringType, StringType))))

  /** The `events` output schema (README.md:68-71 DDL; SURVEY §1.3). JSON
    * columns are kept as serialized JSON strings — faithful to PG `JSON`. */
  def parse(raw: DataFrame): DataFrame = parse(raw, observeMetrics = false)

  /** As [[parse]]; with `observeMetrics` the staged frame carries a
    * Dataset.observe("ingest_quality", …) aggregation — per-batch parse
    * health (rows, dead letters = outer envelope failed, missing inner
    * event time, payload bytes) measured BETWEEN the parse stages, before
    * the F1 now()-fallback erases the failure signal from the output
    * columns. observe() is an accumulator-style side channel: zero extra
    * pass, no state, readable from every QueryProgress. */
  def parse(raw: DataFrame, observeMetrics: Boolean): DataFrame = {
    // The two from_json results are STAGED as aliased columns before field
    // extraction: an unaliased expression `val` re-inlines the whole parse
    // tree at every field reference (~13 references => ~26 JSON parses per
    // row, measured 10 s/100k rows at sf0.1; staged: one parse each).
    // CollapseProject keeps the stages apart because from_json isn't cheap.
    val staged0 = raw
      .withColumn("__env", from_json(col("data").cast("string"), envelopeSchema))
      .withColumn("__req", from_json(col("__env").getField("body"), requestSchema))
    // "dead letter" = no usable envelope: from_json with a StructType is
    // PERMISSIVE — garbage parses to an all-null row, not a NULL struct —
    // so the predicate checks the fields the sink path consumes. (An
    // empty '{}' envelope counts too: nothing downstream can use it.)
    val deadLetter = col("__env").getField("epoch").isNull &&
      col("__env").getField("body").isNull &&
      col("__env").getField("m").isNull && col("__env").getField("ip").isNull
    val staged =
      if (!observeMetrics) staged0
      else staged0.observe("ingest_quality",
        count(lit(1)).as("rows"),
        sum(when(deadLetter, 1L).otherwise(0L)).as("dead_letters"),
        sum(when(col("__req").getField("t").isNull, 1L).otherwise(0L)).as("missing_ts"),
        sum(length(col("data").cast("string")).cast("long")).as("payload_bytes"))
    val env = col("__env")
    val req = col("__req")
    val cookies = parseCookies(req.getField("headers").getField("Cookie"))
    val args = req.getField("args")
    val utm: Seq[Column] = utmCols(args)
    staged.select(Seq(
      col("sequenceNumber").as("id"),
      epochMillisToTs(req.getField("t")).as("ts"),
      epochMillisToTs(env.getField("epoch")).as("received_at"),
      lit(null).cast(StringType).as("title"), // declared in DDL, never populated
      req.getField("url").as("url"),
      req.getField("path").as("path"),
      req.getField("referrer").as("referrer")) ++
      utm ++ Seq(
      to_json(args).as("args"),
      to_json(cookies).as("cookies"),
      to_json(req.getField("form")).as("form"),
      to_json(req.getField("user")).as("user_data"),
      col("data").cast("string").as("orig_data"),
      lit(null).cast(StringType).as("user_id"), // declared, never populated
      req.getField("headers").getField("X-Forward-For").as("ip"),
      req.getField("headers").getField("User-Agent").as("user_agent")): _*)
  }
}
