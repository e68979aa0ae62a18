package graft.sources

import org.apache.spark.sql.{Row, SparkSession}
import org.apache.spark.sql.catalyst.analysis.ResolvedTable
import org.apache.spark.sql.catalyst.plans.logical.{AnalyzeTable, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.command.LeafRunnableCommand

import graft.sinks.{ManifestStats, ManifestUpsertSink, TableStore}

/** Standard-SQL `ANALYZE TABLE t COMPUTE STATISTICS` for manifest-lake
  * catalogs — BI tooling's default stats vocabulary, aliased onto the
  * engine's own commit-time census: Spark has no v2 ANALYZE execution
  * (the stock path fails a v2 table at planning), so a resolution rule
  * rewrites the analyzed [[AnalyzeTable]] over a [[ManifestCatalog]]
  * table into [[GraftAnalyzeTableCommand]], which RECOMPUTES the
  * current version's stats sidecar from the data files' parquet footers
  * and commits it under `_manifest/v<N>.stats`.
  *
  * Ordinarily the sidecar is already exact (every commit writes it with
  * carried-line reuse), so ANALYZE is a cheap no-op refresh; its value
  * is (a) the standard vocabulary, and (b) healing tables whose sidecar
  * is missing or torn (pre-stats vintages, a crashed post-commit write)
  * — after which `SupportsReportStatistics`, metadata-only aggregates,
  * file skipping, and `CALL system.detail` all light up. Footer reads
  * fan out to executors for large file lists (the same
  * [[ManifestStats.collectAuto]] split every commit uses); `NOSCAN` is
  * accepted and identical — the census never scans data pages, only
  * footers. Partition-spec ANALYZE refuses loudly (the sidecar is
  * per-file, not per-partition). */
object GraftAnalyzeRule extends Rule[LogicalPlan] {
  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case AnalyzeTable(r: ResolvedTable, partitionSpec, _)
        if r.catalog.isInstanceOf[ManifestCatalog] =>
      if (partitionSpec.nonEmpty)
        throw new UnsupportedOperationException(
          "ANALYZE TABLE ... PARTITION is unsupported for graft-manifest tables — " +
            "the stats sidecar is per-file; analyze the whole table")
      GraftAnalyzeTableCommand(
        r.catalog.asInstanceOf[ManifestCatalog].dirOf(r.identifier))
    case org.apache.spark.sql.catalyst.plans.logical.AnalyzeColumn(
        r: ResolvedTable, columnNames, allColumns)
        if r.catalog.isInstanceOf[ManifestCatalog] =>
      GraftAnalyzeColumnsCommand(
        r.catalog.asInstanceOf[ManifestCatalog].dirOf(r.identifier),
        columnNames, allColumns)
  }
}

private[graft] final case class GraftAnalyzeTableCommand(root: String)
    extends LeafRunnableCommand {
  override def run(spark: SparkSession): Seq[Row] = {
    val m = ManifestUpsertSink.latestManifest(root).getOrElse(
      throw new IllegalArgumentException(s"no committed table at $root"))
    val stats = ManifestStats.collectAuto(m.files.map(_.path))
    TableStore.forPath(root).putString(s"$root/_manifest",
      s"v${m.version}.stats", ManifestStats.encode(stats))
    Seq.empty // ANALYZE returns no rows, like the built-in
  }
}

/** `ANALYZE TABLE t COMPUTE STATISTICS FOR [ALL] COLUMNS [...]` — the
  * COLUMN-LEVEL census the per-file sidecar cannot answer: exact
  * distinct counts (and null counts) per requested column, computed in
  * ONE aggregation pass over the LOGICAL snapshot (evolution + deletion
  * vectors folded — the planner must see the table readers see) and
  * stored per version as `_manifest/v<N>.colstats`. The connector's
  * [[org.apache.spark.sql.connector.read.SupportsReportStatistics]]
  * surfaces them as DSv2 column statistics, which is what lights up
  * Spark's COST-BASED join estimation and DP join reordering on lake
  * tables — without ndv, multi-join cardinality estimates return
  * unknown and CBO keeps the written join order (AnalyzeColumnsSpec
  * pins the flip). Exact by design: ANALYZE is an explicit maintenance
  * verb whose one full scan buys correct plans table-wide; a 100-TB
  * deployment that prefers the cheaper ±5% HLL census can swap the
  * aggregate for `approx_count_distinct` without touching the sidecar
  * format (the consumer only reads numbers). A later commit gets NO
  * colstats file — data changed, so the census goes dark rather than
  * stale, the standard warehouse contract. */
private[graft] final case class GraftAnalyzeColumnsCommand(root: String,
    columnNames: Option[Seq[String]], allColumns: Boolean)
    extends LeafRunnableCommand {
  override def run(spark: SparkSession): Seq[Row] = {
    import org.apache.spark.sql.functions._
    // Resolve the manifest ONCE and census that snapshot's own file
    // list — re-resolving the latest version for the read would let a
    // commit landing between the two store a census computed over
    // version N+1's data under vN.colstats, served as exact for N.
    val m = ManifestUpsertSink.latestManifest(root).getOrElse(
      throw new IllegalArgumentException(s"no committed table at $root"))
    val df = ManifestUpsertSink.readLogical(spark, m, m.files,
      _.drop(ManifestUpsertSink.BucketCol))
    val names: Seq[String] =
      if (allColumns) df.columns.toSeq
      else {
        val asked = columnNames.getOrElse(Seq.empty)
        val have = df.columns.toSet
        val missing = asked.filterNot(have)
        require(missing.isEmpty,
          s"ANALYZE ... FOR COLUMNS: column(s) ${missing.mkString(", ")} not in " +
            s"the table (have ${df.columns.sorted.mkString(", ")})")
        asked
      }
    require(names.nonEmpty, "ANALYZE ... FOR COLUMNS: no columns requested")
    val aggs = names.flatMap(n => Seq(
      count_distinct(col(n)).as(s"__ndv__$n"),
      sum(when(col(n).isNull, 1L).otherwise(0L)).as(s"__nulls__$n")))
    val row = df.agg(aggs.head, aggs.tail: _*).head()
    val stats = names.zipWithIndex.map { case (n, i) =>
      n -> ManifestStats.ColNdv(row.getLong(2 * i),
        if (row.isNullAt(2 * i + 1)) 0L else row.getLong(2 * i + 1))
    }.toMap
    TableStore.forPath(root).putString(s"$root/_manifest",
      s"v${m.version}.colstats", ManifestStats.encodeCol(stats))
    Seq.empty
  }
}
