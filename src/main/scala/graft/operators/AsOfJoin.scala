package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of join: enrich each left row with the latest right row whose
  * timestamp is ≤ the left row's timestamp, per key — the time-series
  * point-in-time lookup Spark has no built-in operator for.
  *
  * Implementation is the union+window formulation (no custom physical
  * operator needed): tag both sides, union by name, and take per key the
  * running `last(payload, ignoreNulls)` over (ts, tag) order — right rows
  * sort before left rows at equal timestamps, so the match is inclusive
  * (right.ts == left.ts matches), exactly ASOF JOIN's `>=` semantics.
  *
  * Scale: ONE shuffle on the key (the window), no join at all — cost is
  * a sort within each key partition, the same shape a dedicated
  * merge-based as-of physical operator would produce. Skewed keys behave
  * like any window (AQE/salting applies). Right side must be unique per
  * (key, ts) — callers dedup first (see q53's max-orderkey rule) — and
  * right payload columns must be non-null: `last(_, ignoreNulls)` is
  * evaluated per payload column, so a null payload value would let that
  * column fall back to an older right row independently of the others. */
object AsOfJoin {

  def join(
      left: DataFrame,
      right: DataFrame,
      key: String,
      leftTs: String,
      rightTs: String,
      rightPayload: Seq[String]): DataFrame = {
    val leftCols = left.columns.toSeq
    val l = left
      .withColumn("__ts", col(leftTs))
      .withColumn("__tag", lit(1))
    val r = right
      .select((col(rightTs).as("__ts") +: lit(0).as("__tag") +:
        col(key) +: rightPayload.map(col)): _*)
    val unioned = l.unionByName(r, allowMissingColumns = true)
    val w = Window.partitionBy(col(key))
      .orderBy(col("__ts"), col("__tag"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val matched = rightPayload.foldLeft(unioned) { (df, p) =>
      df.withColumn(s"__m_$p", last(col(p), ignoreNulls = true).over(w))
    }
    matched
      .filter(col("__tag") === 1)
      .select((leftCols.map(col) ++ rightPayload.map(p => col(s"__m_$p").as(p))): _*)
  }
}
