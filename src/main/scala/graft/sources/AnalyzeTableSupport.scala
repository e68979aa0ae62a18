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
