package graft.sources

import java.util

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.connector.catalog.Table
import org.apache.spark.sql.connector.catalog.TableProvider
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.execution.datasources.parquet.ParquetFileFormat
import org.apache.spark.sql.execution.datasources.v2.parquet.ParquetTable
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap

import graft.sinks.ManifestUpsertSink

/** `format("graft-manifest")` — the SQL surface for the
  * [[graft.sinks.ManifestUpsertSink]] lakehouse table: time travel and
  * the CDC feed become query-able without touching the Scala API.
  *
  * {{{
  *   spark.read.format("graft-manifest").load(root)                     // latest snapshot
  *   spark.read.format("graft-manifest").option("versionAsOf", 3).load(root)  // time travel
  *   spark.read.format("graft-manifest").option("changesOf", 3).load(root)    // batch 3's CDC feed
  * }}}
  *
  * Design: the connector's only job is MANIFEST RESOLUTION — it maps
  * (root, options) to the committed file list through the same
  * [[ManifestUpsertSink.snapshotFiles]]/[[ManifestUpsertSink.changeFiles]]
  * path the Scala API uses (one resolution code path, the two surfaces
  * cannot drift), then hands that list to Spark's own parquet
  * [[ParquetTable]]. Everything hard — vectorized reads, predicate
  * pushdown, column pruning, schema merge across evolved buckets — is the
  * stock parquet scan's, not reimplemented here; `.explain` on a
  * manifest read shows the ordinary `PushedFilters`/`ReadSchema` of a
  * parquet scan over exactly the snapshot's immutable files. The
  * `__bucket` partition directory never materializes a column: data
  * files are listed as leaves (no partition inference), and bucket
  * assignment is derivable from the key, exactly as the Scala reads
  * treat it.
  *
  * Writes stay with the sink (MERGE needs the LWW/copy-on-write
  * protocol, not a blind append), matching the Delta-OSS-on-plain-store
  * split: connector = read surface, committer = the table's owner. */
final class ManifestSource extends TableProvider with DataSourceRegister {
  override def shortName(): String = "graft-manifest"

  private def files(options: CaseInsensitiveStringMap): Seq[String] = {
    val root = Option(options.get("path")).getOrElse(
      throw new IllegalArgumentException(
        "graft-manifest requires a table root: .load(<root>)"))
    Option(options.get("changesOf")).map(_.toLong) match {
      case Some(v) => ManifestUpsertSink.changeFiles(root, v)
      case None =>
        ManifestUpsertSink.snapshotFiles(root,
          Option(options.get("versionAsOf")).map(_.toLong))
    }
  }

  private def table(options: CaseInsensitiveStringMap,
      schema: Option[StructType]): ParquetTable = {
    val opts = new util.HashMap[String, String](options.asCaseSensitiveMap())
    // snapshots may span schema vintages until compaction unifies them
    opts.putIfAbsent("mergeSchema", "true")
    ParquetTable(s"graft-manifest:${options.get("path")}",
      SparkSession.active, new CaseInsensitiveStringMap(opts),
      files(options), schema, classOf[ParquetFileFormat])
  }

  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    table(options, None).schema

  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table =
    table(new CaseInsensitiveStringMap(properties), Some(schema))
}
