package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.RangeRank

/** RangeRank's contract: identical answers to the single-partition window
  * it replaces, from a plan whose heavy sort is parallel. Ground truth here
  * IS the plain `Window.orderBy` — fine at fixture size, the thing being
  * eliminated at corpus size. */
class RangeRankSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  // deterministic fixture with ties in the order key, skewed groups, and a
  // group that fits entirely inside one range slice
  private lazy val df = (0 until 997).map { i =>
    val g = if (i % 7 == 0) "a" else if (i % 3 == 0) "b" else "c"
    (g, (i * 37) % 50, i.toLong, (i % 11).toLong + 1)
  }.toDF("g", "v", "id", "w")

  test("global row_number / total / running sum match the window ground truth") {
    val got = RangeRank.withOrderedPrefix(df, Nil,
        Seq(col("v"), col("id")), rn = Some("rn"), nTotal = Some("n"),
        weights = Seq(RangeRank.Weight("w", "cw", Some("tw"))))
      .select(col("id"), col("rn"), col("n"), col("cw"), col("tw"))
    val wOrd = Window.orderBy(col("v"), col("id"))
    val want = df.select(col("id"),
      row_number().over(wOrd).cast("long").as("rn"),
      count(lit(1)).over(Window.partitionBy()).as("n"),
      sum(col("w")).over(wOrd.rowsBetween(Window.unboundedPreceding, Window.currentRow)).as("cw"),
      sum(col("w")).over(Window.partitionBy()).as("tw"))
    assert(got.except(want).isEmpty && want.except(got).isEmpty)
  }

  test("grouped row_number / running sum match per-group window ground truth") {
    val got = RangeRank.withOrderedPrefix(df, Seq("g"),
        Seq(col("v").desc, col("id")), rn = Some("rn"), nTotal = Some("n"),
        weights = Seq(RangeRank.Weight("w", "cw", Some("tw"))))
      .select(col("g"), col("id"), col("rn"), col("n"), col("cw"), col("tw"))
    val wOrd = Window.partitionBy(col("g")).orderBy(col("v").desc, col("id"))
    val wAll = Window.partitionBy(col("g"))
    val want = df.select(col("g"), col("id"),
      row_number().over(wOrd).cast("long").as("rn"),
      count(lit(1)).over(wAll).as("n"),
      sum(col("w")).over(wOrd.rowsBetween(Window.unboundedPreceding, Window.currentRow)).as("cw"),
      sum(col("w")).over(wAll).as("tw"))
    assert(got.except(want).isEmpty && want.except(got).isEmpty)
  }

  test("ntileExpr reproduces NTILE(k) for k that divides unevenly") {
    for (k <- Seq(3, 4, 7, 997, 1000)) {
      val got = RangeRank.withOrderedPrefix(df, Nil,
          Seq(col("v"), col("id")), rn = Some("rn"), nTotal = Some("n"))
        .select(col("id"), RangeRank.ntileExpr(k, "rn", "n").as("t"))
      val want = df.select(col("id"),
        ntile(k).over(Window.orderBy(col("v"), col("id"))).as("t"))
      assert(got.except(want).isEmpty && want.except(got).isEmpty, s"k=$k")
    }
  }

  test("heavy ties straddling slice boundaries: strict-order contract still yields exact ranks") {
    // 90% of rows share ONE order-key value, so range boundaries MUST cut
    // through the tie run — the case that breaks naive two-pass ranks.
    // The helper's contract (order includes a unique tiebreaker) makes the
    // compound order strict, so local rank + offset stays exact.
    val skewed = (0 until 2000).map { i =>
      (if (i % 10 == 0) i else 7, i.toLong, (i % 5).toLong + 1)
    }.toDF("v", "id", "w")
    val got = RangeRank.withOrderedPrefix(skewed, Nil,
        Seq(col("v"), col("id")), rn = Some("rn"),
        weights = Seq(RangeRank.Weight("w", "cw")))
      .select(col("id"), col("rn"), col("cw"))
    val wOrd = Window.orderBy(col("v"), col("id"))
    val want = skewed.select(col("id"),
      row_number().over(wOrd).cast("long").as("rn"),
      sum(col("w")).over(wOrd.rowsBetween(Window.unboundedPreceding, Window.currentRow)).as("cw"))
    assert(got.except(want).isEmpty && want.except(got).isEmpty)
  }

  test("degenerate inputs: empty frame and single row pass through") {
    val empty = Seq.empty[(Int, Long)].toDF("v", "id")
    assert(RangeRank.withOrderedPrefix(empty, Nil, Seq(col("v"), col("id")),
      rn = Some("rn"), nTotal = Some("n")).count() == 0)
    val one = Seq((5, 1L)).toDF("v", "id")
    val row = RangeRank.withOrderedPrefix(one, Nil, Seq(col("v"), col("id")),
      rn = Some("rn"), nTotal = Some("n")).select("rn", "n").collect().head
    assert(row.getLong(0) == 1L && row.getLong(1) == 1L)
  }

  test("plan: the corpus-sized sort is partitioned; no empty-spec window anywhere") {
    val plan = RangeRank.withOrderedPrefix(df, Nil,
      Seq(col("v"), col("id")), rn = Some("rn"))
    val emptySpec = plan.queryExecution.optimizedPlan.collect {
      case w: org.apache.spark.sql.catalyst.plans.logical.Window
          if w.partitionSpec.isEmpty => w
    }
    assert(emptySpec.isEmpty, "RangeRank must never plan an unpartitioned window")
    // offsets come back via broadcast, not a shuffle join
    assert(plan.queryExecution.executedPlan.toString.contains("BroadcastHashJoin"))
  }
}
