package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Relational

/** q24's sketch aggregates have no value-level cross-engine oracle
  * (SURVEY §5.2): the query itself emits bound-check booleans the DuckDB
  * oracle pins TRUE. This spec keeps the tighter numeric assertions — the
  * approximate answers must sit within the algorithms' published error
  * bounds of the exact answers at sf0.001 — and pins the emitted verdicts. */
class SketchSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.001"

  test("q24 emits TRUE for every group on both sketch bound checks") {
    val rows = Relational.q24.fn(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getBoolean(r.fieldIndex("acd_within_2pct")), s"${r.getString(0)}: HLL outside 2%")
      assert(r.getBoolean(r.fieldIndex("p95_bracket_ok")), s"${r.getString(0)}: approx p95 fails sketch-consistency bracket")
    }
  }

  test("approx p95 sits at a TRUE rank in [0.93, 0.97] per group") {
    // The rank check q24 used to run in-query (at 3 lineitem passes); it
    // needs a second scan by construction, so it lives here at spec scale.
    val li = Tables.lineitem(spark, sf)
    val sk = li.groupBy(col("l_returnflag"))
      .agg(percentile_approx(col("l_extendedprice"), lit(0.95), lit(2500)).as("ap95"))
    val fracs = li.select(col("l_returnflag"), col("l_extendedprice"))
      .join(broadcast(sk), "l_returnflag")
      .groupBy(col("l_returnflag"))
      .agg((sum(when(col("l_extendedprice") <= col("ap95"), 1L).otherwise(0L))
        / count(lit(1))).as("frac_le"))
      .collect()
    assert(fracs.nonEmpty)
    fracs.foreach { r =>
      val f = r.getDouble(r.fieldIndex("frac_le"))
      assert(f >= 0.93 && f <= 0.97, s"${r.getString(0)}: true rank $f outside [0.93, 0.97]")
    }
  }

  test("approx_count_distinct(rsd=0.01) within 2% of exact per group") {
    val joined = Tables.lineitem(spark, sf)
      .groupBy(col("l_returnflag"))
      .agg(countDistinct(col("l_partkey")).as("exact"),
        approx_count_distinct(col("l_partkey"), 0.01).as("approx"))
      .collect()
    assert(joined.nonEmpty)
    joined.foreach { r =>
      val (e, a) = (r.getLong(1).toDouble, r.getLong(2).toDouble)
      assert(math.abs(a - e) / e <= 0.02, s"${r.getString(0)}: approx $a vs exact $e")
    }
  }

  test("percentile_approx(0.95, 10000) brackets the exact p95 per group") {
    val joined = Tables.lineitem(spark, sf)
      .groupBy(col("l_returnflag"))
      .agg(expr("percentile(l_extendedprice, 0.90)").as("exact_p90"),
        expr("percentile(l_extendedprice, 0.99)").as("exact_p99"),
        percentile_approx(col("l_extendedprice"), lit(0.95), lit(10000)).as("p95_price"))
      .collect()
    assert(joined.nonEmpty)
    joined.foreach { r =>
      val (p90, p99) = (r.getDouble(r.fieldIndex("exact_p90")), r.getDouble(r.fieldIndex("exact_p99")))
      val a = r.getDouble(r.fieldIndex("p95_price"))
      assert(a >= p90 && a <= p99,
        s"${r.getString(0)}: approx p95 $a outside [p90=$p90, p99=$p99]")
    }
  }
}
