package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.sinks.{JdbcUpsertSink, LineFileSink}

/** K3 JDBC upsert against a real embedded Derby database: LWW semantics,
  * idempotent replay (the at-least-once contract, SURVEY §5.3), and
  * partition-parallel writes. */
class SinkSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def freshDb(name: String): String = {
    val url = s"jdbc:derby:memory:$name;create=true"
    val conn = java.sql.DriverManager.getConnection(url)
    conn.createStatement().execute(
      "CREATE TABLE events (id VARCHAR(64) PRIMARY KEY, val DOUBLE, seq BIGINT)")
    conn.close()
    url
  }

  private def readAll(url: String): Map[String, (Double, Long)] = {
    val conn = java.sql.DriverManager.getConnection(url)
    try {
      val rs = conn.createStatement().executeQuery("SELECT id, val, seq FROM events")
      val buf = scala.collection.mutable.Map[String, (Double, Long)]()
      while (rs.next()) buf(rs.getString(1)) = (rs.getDouble(2), rs.getLong(3))
      buf.toMap
    } finally conn.close()
  }

  test("upsert: delete-then-insert keyed LWW; replay is a no-op; newer batch wins") {
    import spark.implicits._
    val url = freshDb("upsert1")
    val sink = new JdbcUpsertSink(url, "events", "id")

    val b1 = Seq(("a", 1.0, 1L), ("b", 2.0, 1L), ("a", 1.5, 2L)).toDF("id", "val", "seq")
    sink.upsertBatch(b1, "seq")
    assert(readAll(url) == Map("a" -> (1.5, 2L), "b" -> (2.0, 1L)), "in-batch LWW keeps max seq")

    sink.upsertBatch(b1, "seq") // redelivery of the same batch
    assert(readAll(url) == Map("a" -> (1.5, 2L), "b" -> (2.0, 1L)), "replay is a no-op")

    val b2 = Seq(("a", 9.0, 3L), ("c", 3.0, 3L)).toDF("id", "val", "seq")
    sink.upsertBatch(b2, "seq")
    assert(readAll(url) == Map("a" -> (9.0, 3L), "b" -> (2.0, 1L), "c" -> (3.0, 3L)),
      "later batch overwrites matching ids, preserves others")
  }

  test("upsert handles a multi-partition batch") {
    import spark.implicits._
    val url = freshDb("upsert2")
    val sink = new JdbcUpsertSink(url, "events", "id")
    val big = (1 to 500).map(i => (s"k$i", i.toDouble, 1L)).toDF("id", "val", "seq")
      .repartition(8)
    sink.upsertBatch(big, "seq")
    val out = readAll(url)
    assert(out.size == 500 && out("k42") == (42.0, 1L))
  }

  test("streaming foreachBatch -> JDBC upsert: at-least-once redelivery converges") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val url = freshDb("upsert3")
    val sink = new JdbcUpsertSink(url, "events", "id")
    val input = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(String, Double, Long)]
    val q = input.toDF().toDF("id", "val", "seq")
      .writeStream
      .foreachBatch { (df: org.apache.spark.sql.DataFrame, _: Long) => sink.upsertBatch(df, "seq") }
      .outputMode("append")
      .start()
    try {
      input.addData(("a", 1.0, 1L), ("b", 2.0, 1L))
      q.processAllAvailable()
      input.addData(("a", 1.0, 1L), ("a", 5.0, 2L)) // redelivery + update in one batch
      q.processAllAvailable()
      assert(readAll(url) == Map("a" -> (5.0, 2L), "b" -> (2.0, 1L)))
    } finally q.stop()
  }

  test("line sink batch round-trip preserves every byte and partitions by date") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_sink_spec_").toString
    val raw = Seq(
      ("1" * 56, """{"x":"a b"}""", java.sql.Timestamp.valueOf("2024-02-01 00:00:00")),
      ("2" * 56, "payload with spaces", java.sql.Timestamp.valueOf("2024-02-02 00:00:00")))
      .toDF("sequenceNumber", "data", "ts")
    LineFileSink.write(raw, dir, col("ts"))
    val back = LineFileSink.read(spark, dir).orderBy("sequenceNumber").collect()
    assert(back.map(r => (r.getString(0), r.getString(1))).toSeq == Seq(
      ("1" * 56, """{"x":"a b"}"""),
      ("2" * 56, "payload with spaces")))
    assert(new java.io.File(s"$dir/year=2024/month=02/day=01").exists())
  }
}
