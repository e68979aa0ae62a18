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

  private def roundTo6(x: Double): Double =
    BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
}
