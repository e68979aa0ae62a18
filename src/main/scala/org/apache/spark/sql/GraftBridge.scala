package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Bridge into the private[sql] Column ⇄ Expression converters — the
  * supported way for an extension library to wrap a custom Catalyst
  * Expression as a user-facing Column in Spark 4's split API. */
object GraftBridge {
  def column(e: Expression): Column =
    classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression =
    classic.ExpressionUtils.expression(c)

  /** Catalyst predicate → V1 `Filter`, the protected[sql] translation the
    * optimizer itself uses before handing filters to a DSv2 source — the
    * manifest connector reuses it so its file-pruning evaluator sees
    * exactly the filters the parquet scan will see. */
  def translateFilter(e: Expression): Option[sources.Filter] =
    execution.datasources.DataSourceStrategy.translateFilter(
      e, supportNestedPredicatePushdown = true)

  /** Re-root a V1 streaming Sink's `addBatch` DataFrame as a BATCH frame
    * over the micro-batch's already-planned RDD — exactly what Spark's
    * own ForeachBatchSink does before handing the frame to user code
    * (LogicalRDD.fromDataset + ofRows); without it, any action a sink
    * takes re-plans the streaming source and fails with "Queries with
    * streaming sources must be executed with writeStream.start()". */
  def asBatchDF(df: DataFrame): DataFrame = reRoot(df, isStreaming = false)

  /** The inverse re-rooting for a V1 streaming SOURCE's `getBatch`:
    * MicroBatchExecution asserts the returned frame has
    * isStreaming=true (it splices the plan in place of the streaming
    * relation), so a batch-planned read over the micro-batch's files is
    * re-rooted over its planned RDD with the streaming bit set — the
    * same move Spark's own file/Kafka sources make via
    * `internalCreateDataFrame(..., isStreaming = true)`. */
  def asStreamingDF(df: DataFrame): DataFrame = reRoot(df, isStreaming = true)

  /** Float normalization (−0.0 → 0.0, canonical NaN) exactly as the
    * optimizer inserts on join/group keys — the manifest deletion-vector
    * fold tests key membership by UnsafeRow BYTE equality, which must
    * agree with SQL join equality on float/double key components (raw
    * bytes disagree on −0.0 vs 0.0 and NaN payloads). Identity for
    * non-float types. */
  def normalizeFloats(e: Expression): Expression =
    catalyst.optimizer.NormalizeFloatingNumbers.normalize(e)

  /** A batch DataFrame over an RDD of already-encoded InternalRows — the
    * private[sql] constructor Spark's own sources use. The manifest
    * table's SQL MERGE/UPDATE write path decodes its staged row deltas
    * (UnsafeRow bytes) DISTRIBUTED and re-enters the DataFrame API here,
    * so the copy-on-write apply never funnels rows through the driver. */
  def internalCreateDataFrame(spark: SparkSession,
      rdd: org.apache.spark.rdd.RDD[catalyst.InternalRow],
      schema: types.StructType): DataFrame =
    classic.ClassicConversions.castToImpl(spark)
      .internalCreateDataFrame(rdd, schema, isStreaming = false)

  private def reRoot(df: DataFrame, isStreaming: Boolean): DataFrame = {
    val ds = classic.ClassicConversions.castToImpl(df)
    val rdd = ds.queryExecution.toRdd
    classic.Dataset.ofRows(ds.sparkSession,
      execution.LogicalRDD.fromDataset(rdd, ds, isStreaming = isStreaming))
  }
}
