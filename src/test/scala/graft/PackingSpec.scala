package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Cross-checks for the batching-layer operators on adversarial shapes
  * the driver corpus cannot exercise: q107's greedy packing against a
  * sequential fold reference (giant docs spanning several windows, empty
  * docs, single-doc shards), and q106's survivor policy against a
  * brute-force pick (length ties broken by id). The corpus-shaped
  * behavior is the DuckDB oracle's job; these pin the LOGIC. */
class PackingSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("q107 packing law: chunk of a doc == floor(prefix/2048) from a sequential fold; giant docs span") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    // shard "big" contains docs far over the 2048 window; "one" has a single doc
    val rows: Seq[(String, Long, Long)] =
      (1L to 40L).map(i => ("mix", i, 1L + rnd.nextInt(3000).toLong)) ++
      Seq(("big", 1L, 9000L), ("big", 2L, 10L), ("big", 3L, 5000L)) ++
      Seq(("one", 7L, 3L), ("empty", 8L, 0L))
    val df = rows.toDF("source", "doc_id", "tokens")

    // the operator's window form
    val w = Window.partitionBy(col("source")).orderBy(col("doc_id"))
    val got = df.withColumn("cum", sum(col("tokens")).over(w))
      .withColumn("chunk_id", floor((col("cum") - col("tokens")) / 2048L))
      .select(col("source"), col("doc_id"), col("chunk_id"))
      .collect().map(r => (r.getString(0), r.getLong(1)) -> r.getLong(2)).toMap

    // sequential fold reference, per shard
    val ref = rows.groupBy(_._1).flatMap { case (src, ds) =>
      var prefix = 0L
      ds.sortBy(_._2).map { case (_, id, t) =>
        val chunk = prefix / 2048L
        prefix += t
        (src, id) -> chunk
      }
    }
    assert(got == ref)
    // a 9000-token doc starts chunk 0; the doc AFTER it starts at floor(9000/2048)=4
    assert(got(("big", 1L)) == 0L && got(("big", 2L)) == 4L)
  }

  test("q106 survivor law: longest wins, ties break to smallest doc_id; bytes audit adds up") {
    import spark.implicits._
    // clusters with ties and singletons
    val rows = Seq(
      (10L, 1L, 50L), (10L, 2L, 80L), (10L, 3L, 80L),  // tie at 80 -> doc 2
      (20L, 4L, 5L), (20L, 5L, 90L),                    // plain max -> doc 5
      (30L, 6L, 7L))                                    // singleton (filtered)
    val df = rows.toDF("cluster_id", "doc_id", "len")
    val out = df.groupBy(col("cluster_id"))
      .agg(count(lit(1)).as("n_members"),
        max_by(col("doc_id"), struct(col("len"), col("doc_id") * -1)).as("survivor_id"),
        max(col("len")).as("bytes_kept"),
        (sum(col("len")) - max(col("len"))).as("bytes_dropped"))
      .filter(col("n_members") >= 2)
      .orderBy(col("cluster_id"))
      .collect().map(r => (r.getLong(0), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(out.toSeq == Seq((10L, 2L, 80L, 130L), (20L, 5L, 90L, 5L)))
  }

  test("q273 span law: sentinel algebra n_after = n_tokens - n_masked + n_spans; islands replayed per doc; ~15% corpus mask rate") {
    val sf = "/root/testdata/sf0.001"
    val rows = graft.ext.PipelineQueries.q273.fn(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5)))
    assert(rows.nonEmpty)
    rows.foreach { case (id, nTok, nMask, nSpan, nAfter, ppm) =>
      assert(nSpan <= nMask && nMask <= nTok, s"doc $id")
      assert(nAfter == nTok - nMask + nSpan, s"doc $id")
      assert(ppm == nMask * 1000000L / nTok, s"doc $id")
      assert((nSpan == 0) == (nMask == 0), s"doc $id")
    }
    // corpus-wide realized mask rate must sit near the 15% design point
    val (tokSum, maskSum) = (rows.map(_._2).sum, rows.map(_._3).sum)
    val rate = maskSum.toDouble / tokSum
    assert(rate > 0.12 && rate < 0.18, f"realized mask rate $rate%.4f")
    // independent island replay on one real document
    import java.security.MessageDigest
    def maskedAt(docId: Long, pos: Int): Boolean = {
      val h = MessageDigest.getInstance("MD5")
        .digest(s"$docId:$pos".getBytes("UTF-8"))
        .map("%02x".format(_)).mkString.take(8)
      java.lang.Long.parseLong(h, 16) % 1000 < 150
    }
    val doc = spark.read.parquet(s"$sf/documents.parquet")
      .selectExpr("doc_id", "text").collect().head
    val (docId, nWords) = (doc.getLong(0), doc.getString(1).split(" ", -1).length)
    val flags = (0 until nWords).map(maskedAt(docId, _))
    val expMask = flags.count(identity)
    val expSpans = flags.zip(false +: flags.dropRight(1)).count { case (c, p) => c && !p }
    val got = rows.find(_._1 == docId).get
    assert(got._3 == expMask && got._4 == expSpans,
      s"doc $docId replay: engine=(${got._3},${got._4}) expected=($expMask,$expSpans)")
  }
}
