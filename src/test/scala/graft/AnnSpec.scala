package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.ext.Similarity

/** IVF ANN correctness gate. The fixture's embeddings are isotropic
  * (measured avg cosine ≈ 0 within AND across labels), so *statistical*
  * recall vs brute force is nprobe/nlist by construction for any
  * partition-pruned ANN — not a property of the implementation. What IS
  * the implementation's contract, and what this spec pins with an
  * independent driver-side reference implementation:
  *   for each query, the output is exactly the top-k by cosine among the
  *   vectors in the nprobe partitions whose centroids (per-label means)
  *   are nearest the query.
  * On real clustered corpora the same plan yields high recall; the recall
  * property belongs to the data, the probe contract belongs to us. */
class AnnSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.001"

  private def cos(a: Array[Double], b: Array[Double]): Double = {
    var d, na, nb = 0.0
    var i = 0
    while (i < a.length) { d += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i); i += 1 }
    d / (math.sqrt(na) * math.sqrt(nb))
  }

  test("IVF output == independent top-k-within-probed-partitions reference") {
    val rows = Tables.embeddings(spark, sf).collect().map { r =>
      (r.getLong(0), r.getInt(2),
        r.getSeq[Float](1).map(_.toDouble).toArray)
    }
    val byLabel = rows.groupBy(_._2)
    val centroids = byLabel.view.mapValues { vs =>
      val dim = vs.head._3.length
      val m = new Array[Double](dim)
      vs.foreach(v => (0 until dim).foreach(i => m(i) += v._3(i)))
      (0 until dim).foreach(i => m(i) /= vs.size)
      m
    }.toMap

    val queries = rows.filter(_._1 < 5)
    val expected = queries.flatMap { case (qId, _, qEmb) =>
      val probed = centroids.toSeq
        .map { case (l, c) => (l, cos(qEmb, c)) }
        .sortBy { case (l, s) => (-roundTo6(s), l) }
        .take(3).map(_._1).toSet
      rows.filter(v => probed.contains(v._2) && v._1 != qId)
        .map { case (vId, _, vEmb) => (vId, roundTo6(cos(qEmb, vEmb))) }
        .sortBy { case (vId, s) => (-s, vId) }
        .take(10).zipWithIndex
        .map { case ((vId, s), i) => (qId, (i + 1).toLong, vId, s) }
    }.toSet

    val actual = Similarity.q46.fn(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3))).toSet

    assert(expected.nonEmpty)
    assert(actual == expected,
      s"missing=${(expected -- actual).take(3)}; extra=${(actual -- expected).take(3)}")
  }

  test("q54 blocked all-pairs plan has no BroadcastNestedLoopJoin / CartesianProduct") {
    val plan = Similarity.q54.fn(spark, sf).queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan)
    assert(!plan.contains("CartesianProduct"), plan)
  }

  test("q89 LSH plan has no BroadcastNestedLoopJoin / CartesianProduct") {
    val plan = Similarity.q89.fn(spark, sf).queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan)
    assert(!plan.contains("CartesianProduct"), plan)
  }

  test("q89 LSH-found pairs are a subset of q54's exact pair set (precision 1)") {
    val exact = Similarity.q54.fn(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val lsh = Similarity.q89.fn(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(lsh.subsetOf(exact), s"extra=${(lsh -- exact).take(5)}")
  }

  test("q270 ANN label-noise census: equi-join plan (no cartesian), conservation vs node count, ppm algebra") {
    val df = Similarity.q270.fn(spark, sf)
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan.take(2000))
    assert(!plan.contains("CartesianProduct"), plan.take(2000))
    val rows = df.collect()
    assert(rows.nonEmpty)
    val nVectors = spark.read.parquet(s"$sf/embeddings.parquet").count()
    val totalN = rows.map(_.getLong(1)).sum
    // census covers exactly the vectors with >= 1 LSH candidate edge
    assert(totalN <= nVectors)
    rows.foreach { r =>
      val (n, flagged, ppm) = (r.getLong(1), r.getLong(2), r.getLong(3))
      assert(flagged <= n)
      assert(ppm == flagged * 1000000L / n, s"ppm algebra broke: $r")
    }
  }

  test("q271 retrieval MRR: 20 queries conserved, integer bounds, and rr_ppm matches a driver-side replay") {
    val rows = Similarity.q271.fn(spark, sf).collect()
    assert(rows.map(_.getLong(1)).sum == 20L, "query census must cover vec_id < 20 exactly")
    rows.foreach { r =>
      val (n, mrr, hits) = (r.getLong(1), r.getLong(2), r.getLong(3))
      assert(mrr >= 0L && mrr <= 1000000L)
      assert(hits >= 0L && hits <= 10L * n)
    }
    // independent replay of one query's reciprocal rank from raw vectors
    val vecs = spark.read.parquet(s"$sf/embeddings.parquet").collect()
      .map(r => (r.getLong(0),
        r.getSeq[Float](1).map(_.toDouble).toArray,
        r.getInt(2)))
    val (qid, qemb, qlabel) = vecs.find(_._1 == 0L).get
    val top10 = vecs.filter(_._1 != qid)
      .map { case (id, emb, lbl) => (id, lbl, roundTo6(cos(qemb, emb))) }
      .sortBy { case (id, _, sim) => (-sim, id) }
      .take(10)
    val best = top10.zipWithIndex.collectFirst { case ((_, lbl, _), i) if lbl == qlabel => i + 1L }
    val expectedRr = best.map(1000000L / _).getOrElse(0L)
    // q0's label group mean must be consistent with the replayed member:
    // recompute the whole group from the replay and compare the mean
    val groupQ = vecs.filter(v => v._1 < 20 && v._3 == qlabel).map(_._1)
    val rrs = groupQ.map { gq =>
      val (_, ge, gl) = vecs.find(_._1 == gq).get
      val t = vecs.filter(_._1 != gq)
        .map { case (id, emb, lbl) => (id, lbl, roundTo6(cos(ge, emb))) }
        .sortBy { case (id, _, sim) => (-sim, id) }.take(10)
      t.zipWithIndex.collectFirst { case ((_, lbl, _), i) if lbl == gl => 1000000L / (i + 1L) }
        .getOrElse(0L)
    }
    assert(rrs.contains(expectedRr))
    val expectedMean = rrs.sum / rrs.length
    val got = rows.find(_.getInt(0) == qlabel).get
    assert(got.getLong(2) == expectedMean,
      s"label $qlabel mrr_ppm: engine=${got.getLong(2)} replay=$expectedMean")
  }

  private def roundTo6(x: Double): Double =
    BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
}
