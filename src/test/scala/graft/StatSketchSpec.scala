package graft

import org.scalatest.funsuite.AnyFunSuite

/** DataFrame sketch surface (df.stat): count-min frequency estimation and
  * Bloom membership — the remaining sketch family beyond q24's HLL and
  * approx-percentile, bounds-checked against exact counts at sf0.001. */
class StatSketchSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("countMinSketch overestimates by at most eps*n (never underestimates)") {
    val df = Tables.lineitem(spark, "/root/testdata/sf0.001")
    val eps = 0.01
    val sketch = df.stat.countMinSketch("l_returnflag", eps = eps, confidence = 0.99, seed = 42)
    val exact = df.groupBy("l_returnflag").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val n = exact.values.sum
    exact.foreach { case (k, c) =>
      val est = sketch.estimateCount(k)
      assert(est >= c, s"count-min must never underestimate ($k: $est < $c)")
      assert(est <= c + (eps * n).toLong + 1, s"$k overestimate beyond eps*n: $est vs $c")
    }
  }

  test("bloomFilter contains every inserted key; false-positive rate near target") {
    val df = Tables.orders(spark, "/root/testdata/sf0.001")
    val bf = df.stat.bloomFilter("o_orderkey", expectedNumItems = 2000, fpp = 0.03)
    val keys = df.select("o_orderkey").collect().map(_.getLong(0))
    assert(keys.forall(bf.mightContain), "no false negatives, ever")
    val absent = (1000000L to 1010000L).filterNot(keys.toSet)
    val fp = absent.count(bf.mightContain).toDouble / absent.size
    assert(fp < 0.1, s"false-positive rate $fp should be near the 3% target")
  }
}
