package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Relational

/** q24's sketch aggregates have no cross-engine oracle (SURVEY §5.2), so
  * this spec is their correctness gate: approximate answers must sit within
  * the algorithms' published error bounds of the exact answers at sf0.001. */
class SketchSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.001"

  test("approx_count_distinct within 5% of exact per group (HLL++ default rsd=0.05)") {
    val exact = Tables.lineitem(spark, sf)
      .groupBy(col("l_returnflag"))
      .agg(countDistinct(col("l_partkey")).as("exact"))
    val approx = Relational.q24.fn(spark, sf)
    val joined = exact.join(approx, "l_returnflag")
      .select(col("l_returnflag"), col("exact"), col("approx_parts")).collect()
    assert(joined.nonEmpty)
    joined.foreach { r =>
      val (e, a) = (r.getLong(1).toDouble, r.getLong(2).toDouble)
      assert(math.abs(a - e) / e <= 0.15, s"${r.getString(0)}: approx $a vs exact $e")
    }
  }

  test("percentile_approx(0.95, 10000) brackets the exact p95 per group") {
    val exact = Tables.lineitem(spark, sf)
      .groupBy(col("l_returnflag"))
      .agg(expr("percentile(l_extendedprice, 0.95)").as("exact_p95"),
        expr("percentile(l_extendedprice, 0.90)").as("exact_p90"),
        expr("percentile(l_extendedprice, 0.99)").as("exact_p99"))
    val approx = Relational.q24.fn(spark, sf)
    val joined = exact.join(approx, "l_returnflag").collect()
    assert(joined.nonEmpty)
    joined.foreach { r =>
      val (p90, p99) = (r.getDouble(r.fieldIndex("exact_p90")), r.getDouble(r.fieldIndex("exact_p99")))
      val a = r.getDouble(r.fieldIndex("p95_price"))
      assert(a >= p90 && a <= p99,
        s"${r.getString(0)}: approx p95 $a outside [p90=$p90, p99=$p99]")
    }
  }
}
