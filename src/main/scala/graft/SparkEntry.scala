package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.operators.{CoverageQueries, EventAnalytics, Relational, Scale, SubqueryQueries, TypedApi}
import graft.etl.EtlQueries
import graft.ext.{Bpe, CurationQueries, Dedup, EvalQueries, Multimodal, PipelineQueries, PrivacyQueries, Similarity, TextStats}
import graft.sinks.SinkQueries

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * All query registries are concatenated here; each module exposes
  * `all: Seq[QueryDef]` and this object is the single source of truth the
  * driver (Verify/Bench) reads. Names are asserted unique at class-load so a
  * duplicate key can never silently shadow a query.
  */
object SparkEntry {

  /** Every registered query, in registry order. */
  val registry: Seq[QueryDef] =
    Relational.all ++ EtlQueries.all ++ Dedup.all ++ Similarity.all ++
      TextStats.all ++ SinkQueries.all ++ Multimodal.all ++ CoverageQueries.all ++
      Scale.all ++ SubqueryQueries.all ++ TypedApi.all ++ PipelineQueries.all ++
      CurationQueries.all ++ EventAnalytics.all ++ PrivacyQueries.all ++ Bpe.all ++
      EvalQueries.all

  require(
    registry.map(_.name).distinct.size == registry.size,
    s"duplicate query names: ${registry.groupBy(_.name).collect { case (n, qs) if qs.size > 1 => n }.mkString(", ")}")

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    Relational.q01.fn(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    registry.map(q => q.name -> q.fn).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    registry.flatMap(q => q.oracle.map(q.name -> _)).toMap
}
