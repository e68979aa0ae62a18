package graft.sources

import java.util

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.expressions.filter.Predicate
import org.apache.spark.sql.connector.read.{Scan, ScanBuilder, SupportsPushDownRequiredColumns}
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.execution.datasources.parquet.ParquetFileFormat
import org.apache.spark.sql.execution.datasources.v2.parquet.ParquetTable
import org.apache.spark.sql.internal.connector.SupportsPushDownCatalystFilters
import org.apache.spark.sql.sources.{DataSourceRegister, Filter}
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap

import graft.sinks.{ManifestStats, ManifestUpsertSink}
import graft.sinks.ManifestUpsertSink.FileEntry

/** `format("graft-manifest")` — the SQL surface for the
  * [[graft.sinks.ManifestUpsertSink]] lakehouse table: time travel, the
  * CDC feed, and FILE-LEVEL DATA SKIPPING become query-able without
  * touching the Scala API.
  *
  * {{{
  *   spark.read.format("graft-manifest").load(root)                     // latest snapshot
  *   spark.read.format("graft-manifest").option("versionAsOf", 3).load(root)  // time travel
  *   spark.read.format("graft-manifest").option("changesOf", 3).load(root)    // batch 3's CDC feed
  * }}}
  *
  * Design: the connector's jobs are MANIFEST RESOLUTION — it maps
  * (root, options) to the committed file list through the same
  * [[ManifestUpsertSink.snapshotManifest]]/[[ManifestUpsertSink.changeFiles]]
  * path the Scala API uses (one resolution code path, the two surfaces
  * cannot drift) — and FILE PRUNING: the query's pushed filters are
  * evaluated against each file's manifest-recorded bucket and stats
  * sidecar ([[ManifestStats.mayMatch]]) before the list is handed to
  * Spark's own parquet [[ParquetTable]], so a key point-lookup reads one
  * bucket's files and a clustered range predicate reads only the
  * overlapping slices. Everything hard — vectorized reads, predicate
  * pushdown INSIDE the surviving files (row-group skipping), column
  * pruning, schema merge across evolved buckets — remains the stock
  * parquet scan's; `.explain` on a manifest read shows the ordinary
  * `PushedFilters`/`ReadSchema` of a parquet scan over exactly the
  * pruned subset of the snapshot's immutable files. The `__bucket`
  * partition directory never materializes a column: data files are
  * listed as leaves (no partition inference), and bucket assignment is
  * derivable from the key, exactly as the Scala reads treat it.
  *
  * Writes stay with the sink (MERGE needs the LWW/copy-on-write
  * protocol, not a blind append), matching the Delta-OSS-on-plain-store
  * split: connector = read surface, committer = the table's owner. */
final class ManifestSource extends TableProvider with DataSourceRegister {
  import ManifestSource._

  override def shortName(): String = "graft-manifest"

  private def resolve(options: CaseInsensitiveStringMap): Resolved = {
    val root = Option(options.get("path")).getOrElse(
      throw new IllegalArgumentException(
        "graft-manifest requires a table root: .load(<root>)"))
    Option(options.get("changesOf")).map(_.toLong) match {
      case Some(v) =>
        // the change feed is plain per-version parquet: no buckets, no
        // sidecar — delegate unpruned (feeds are O(changed rows) already)
        Resolved(ManifestUpsertSink.changeFiles(root, v).map(FileEntry(-1L, _)),
          Map.empty, None)
      case None =>
        val m = ManifestUpsertSink.snapshotManifest(root,
          Option(options.get("versionAsOf")).map(_.toLong))
        Resolved(m.files, ManifestUpsertSink.loadStats(root, m.version),
          for (k <- m.keyCol; b <- m.buckets) yield (k, b))
    }
  }

  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    parquetTable(options, resolve(options).files.map(_.path), None).schema

  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table = {
    val options = new CaseInsensitiveStringMap(properties)
    new ManifestTable(options, resolve(options), schema)
  }
}

object ManifestSource {

  /** A resolved read: the snapshot's (bucket, path) entries, its stats
    * sidecar, and — when the manifest records them — the (keyCol,
    * buckets) pair that enables bucket pruning. */
  final case class Resolved(files: Seq[FileEntry],
      stats: Map[String, ManifestStats.FileStats], keyInfo: Option[(String, Int)])

  /** The stock parquet table over an explicit immutable file list — the
    * delegate that owns vectorized reads, pushdown, and schema merge. */
  private def parquetTable(options: CaseInsensitiveStringMap, paths: Seq[String],
      schema: Option[StructType]): ParquetTable = {
    val opts = new util.HashMap[String, String](options.asCaseSensitiveMap())
    // snapshots may span schema vintages until compaction unifies them
    opts.putIfAbsent("mergeSchema", "true")
    ParquetTable(s"graft-manifest:${options.get("path")}",
      SparkSession.active, new CaseInsensitiveStringMap(opts),
      paths, schema, classOf[ParquetFileFormat])
  }

  /** Thin DSv2 table: schema and capabilities come from the parquet
    * delegate; `newScanBuilder` interposes the file-pruning builder. */
  private final class ManifestTable(options: CaseInsensitiveStringMap,
      resolved: Resolved, tableSchema: StructType) extends Table with SupportsRead {

    override def name(): String = s"graft-manifest:${options.get("path")}"

    override def schema(): StructType = tableSchema

    override def capabilities(): util.Set[TableCapability] =
      util.EnumSet.of(TableCapability.BATCH_READ)

    override def newScanBuilder(caseInsensitiveOptions: CaseInsensitiveStringMap): ScanBuilder =
      new ManifestScanBuilder(caseInsensitiveOptions, resolved, tableSchema)
  }

  /** The pruning scan builder. It mirrors every pushdown call onto a
    * delegate [[ParquetTable]] scan builder over the FULL file list (so
    * `pushedFilters`/column pruning behave exactly as stock parquet), and
    * at `build()` evaluates the pushed filters against each file's
    * bucket + stats: if any file is provably filter-free, the delegate is
    * rebuilt over the surviving subset with the same pushdown state. The
    * emitted scan is an ordinary `ParquetScan` either way — Catalyst and
    * Tungsten never see a bespoke reader, only a shorter file list. */
  private final class ManifestScanBuilder(options: CaseInsensitiveStringMap,
      resolved: Resolved, tableSchema: StructType)
      extends ScanBuilder with SupportsPushDownCatalystFilters
      with SupportsPushDownRequiredColumns {

    private def delegate(paths: Seq[String]) =
      parquetTable(options, paths, Some(tableSchema)).newScanBuilder(options)

    private val full = delegate(resolved.files.map(_.path))
    private var pushedExprs: Seq[Expression] = Nil
    private var required: Option[StructType] = None

    override def pushFilters(filters: Seq[Expression]): Seq[Expression] = {
      pushedExprs = filters
      full.pushFilters(filters)
    }

    override def pushedFilters: Array[Predicate] = full.pushedFilters

    override def pruneColumns(requiredSchema: StructType): Unit = {
      required = Some(requiredSchema)
      full.pruneColumns(requiredSchema)
    }

    override def build(): Scan = {
      val v1: Seq[Filter] = pushedExprs.flatMap(GraftBridge.translateFilter)
      val kept = resolved.files.filter(e => v1.forall(
        ManifestStats.mayMatch(e.bucket, resolved.stats.get(e.path), resolved.keyInfo, _)))
      if (kept.size == resolved.files.size) full.build()
      else {
        // replay the pushdown protocol onto a builder over the pruned list
        val b = delegate(kept.map(_.path))
        if (pushedExprs.nonEmpty) b.pushFilters(pushedExprs)
        required.foreach(b.pruneColumns)
        b.build()
      }
    }
  }
}
