package graft.sources

import java.util.Collections

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.procedures.{BoundProcedure, ProcedureParameter, UnboundProcedure}
import org.apache.spark.sql.connector.read.{LocalScan, Scan}
import org.apache.spark.sql.types._

import graft.sinks.ManifestUpsertSink

/** SQL `CALL` procedures for manifest-lake maintenance — the verbs a
  * warehouse operator runs on a schedule (compaction, clustering,
  * retention, rollback), exposed through Spark 4's native
  * ProcedureCatalog so a deployment needs no Scala at all:
  *
  * {{{
  *   CALL graft.system.compact('events')
  *   CALL graft.system.compact_incremental('events', 4)
  *   CALL graft.system.cluster('events', 'price', 16)
  *   CALL graft.system.zorder('events', 'price,size', 16)
  *   CALL graft.system.vacuum('events', 2)
  *   CALL graft.system.vacuum_retain('events', 168.0)   -- keep 7 days of time travel
  *   CALL graft.system.restore('events', 3)
  *   CALL graft.system.expire_partitions('events', '2024-01-01')
  *   CALL graft.system.repartition_by('events', 'day')  -- partition evolution ('' drops)
  *   CALL graft.system.clone('events', 'events_dev', false)  -- shallow fork
  *   CALL graft.system.export_symlinks('events')        -- external-reader file list
  *   CALL graft.system.history('events')                -- DESCRIBE HISTORY
  *   CALL graft.system.detail('events')                 -- DESCRIBE DETAIL
  * }}}
  *
  * Each call binds the sink from the COMMITTED manifest (keyCol /
  * buckets / partitionCol are the table's, never the caller's), runs the
  * same Scala-API operation every other surface uses, and returns one
  * row — the table's post-call (version, n_files) — so operators see the
  * effect without a second query. The namespace segment is conventional
  * ("system"); any spelling resolves. */
private[graft] object ManifestProcedures {

  private val Table = ProcedureParameter.in("table", StringType).build()

  /** `CALL graft.system.history('t')` — DESCRIBE HISTORY as a procedure:
    * one row per un-vacuumed version (commit stamp, replay-guard batch
    * id, layout pair, file count, feed/rename flags), straight off the
    * manifest log, no data files touched. */
  private def historyRows(root: String): Array[InternalRow] =
    ManifestUpsertSink.committedVersions(root)
      .flatMap(v => ManifestUpsertSink.manifestAt(root, v)).map { m =>
        new GenericInternalRow(Array[Any](
          m.version, m.ts.map(Long.box).orNull, m.batchId,
          m.keyCol.map(org.apache.spark.unsafe.types.UTF8String.fromString).orNull,
          m.buckets.map(b => Long.box(b.toLong)).orNull,
          m.partCol.map(org.apache.spark.unsafe.types.UTF8String.fromString).orNull,
          m.files.size.toLong, m.feed.isDefined, m.renames.nonEmpty,
          m.hasEvolution)): InternalRow
      }.toArray

  private val HistorySchema = StructType(Seq(
    StructField("version", LongType, nullable = false),
    StructField("ts", LongType),
    StructField("batch_id", LongType, nullable = false),
    StructField("key_col", StringType),
    StructField("buckets", LongType),
    StructField("partition_col", StringType),
    StructField("n_files", LongType, nullable = false),
    StructField("has_change_feed", BooleanType, nullable = false),
    StructField("has_renames", BooleanType, nullable = false),
    StructField("has_evolution", BooleanType, nullable = false)))

  private final case class Spec(name: String, params: Seq[ProcedureParameter],
      run: (SparkSession, String, InternalRow) => Unit)

  private def specs(tableDir: String => String): Seq[Spec] = Seq(
    Spec("compact", Seq(Table),
      (s, root, _) => sinkFor(root).compact(s)),
    // max_dv_fraction: the delete-debt policy — a bucket whose dv rows
    // exceed this fraction of its data rows rewrites even below the
    // file-count threshold (bounded merge-on-read read amplification)
    Spec("compact_incremental", Seq(Table,
        ProcedureParameter.in("min_files", IntegerType).build(),
        ProcedureParameter.in("max_dv_fraction", DoubleType)
          .defaultValue("1.0").build()),
      (s, root, in) => sinkFor(root).compactIncremental(s, in.getInt(1),
        if (in.isNullAt(2)) 1.0 else in.getDouble(2))),
    // one-verb MAINTENANCE: apply the incremental-compaction policy to
    // the table AND every live branch, so merge-on-read read-amp debt
    // (small files + dv anti-joins) stays bounded without operator
    // vigilance — the scheduled-job entry point. Policy defaults
    // (min_files=4, max_dv_fraction=0.1) override per table via
    // TBLPROPERTIES maintainMinFiles / maintainMaxDvFraction; only the
    // over-threshold buckets rewrite (compactIncremental's contract), so
    // a clean table is a cheap no-op.
    Spec("maintain", Seq(Table),
      (s, root, _) => {
        val props = {
          val p = s"$root/_catalog.properties"
          val st = graft.sinks.TableStore.forPath(root)
          if (!st.exists(p)) Map.empty[String, String]
          else st.readString(p).linesIterator.filter(_.contains('='))
            .map { l => val Array(k, v) = l.split("=", 2); k -> v }.toMap
        }
        val minFiles = props.get("maintainMinFiles").map(_.toInt).getOrElse(4)
        val maxDv = props.get("maintainMaxDvFraction").map(_.toDouble).getOrElse(0.1)
        (root +: ManifestUpsertSink.branches(root)
            .map(ManifestUpsertSink.branchRoot(root, _)))
          .foreach(r => sinkFor(r).compactIncremental(s, minFiles, maxDv))
      }),
    Spec("cluster", Seq(Table,
        ProcedureParameter.in("cols", StringType).build(),
        ProcedureParameter.in("slices", IntegerType).build()),
      (s, root, in) => sinkFor(root).compactClustered(s,
        in.getUTF8String(1).toString.split(",").map(_.trim).toSeq, in.getInt(2))),
    Spec("zorder", Seq(Table,
        ProcedureParameter.in("cols", StringType).build(),
        ProcedureParameter.in("slices", IntegerType).build()),
      (s, root, in) => sinkFor(root).compactZOrder(s,
        in.getUTF8String(1).toString.split(",").map(_.trim).toSeq, in.getInt(2))),
    Spec("vacuum", Seq(Table,
        ProcedureParameter.in("keep_versions", IntegerType).build()),
      (_, root, in) => sinkFor(root).vacuum(keepVersions = in.getInt(1))),
    // age-based retention: the horizon an SLA speaks ("keep 168 hours of
    // time travel") — resolved against the running-max commit stamps, so
    // every timestampAsOf inside the window survives the sweep
    Spec("vacuum_retain", Seq(Table,
        ProcedureParameter.in("retain_hours", DoubleType).build()),
      (_, root, in) => sinkFor(root).vacuum(keepVersions = 1,
        retainMs = Some((in.getDouble(1) * 3600 * 1000).toLong))),
    Spec("restore", Seq(Table,
        ProcedureParameter.in("version", LongType).build()),
      (s, root, in) => { sinkFor(root).restore(s, in.getLong(1)); () }),
    Spec("expire_partitions", Seq(Table,
        ProcedureParameter.in("cutoff", StringType).build()),
      (s, root, in) => sinkFor(root).dropPartitionsBefore(s,
        in.getUTF8String(1).toString)),
    // partition evolution as an epoch commit (empty col = drop the layout)
    Spec("repartition_by", Seq(Table,
        ProcedureParameter.in("partition_col", StringType).build()),
      (s, root, in) => {
        val p = Option(in.getUTF8String(1)).map(_.toString.trim).filter(_.nonEmpty)
        sinkFor(root).repartitionBy(s, p); ()
      }),
    // EXTERNAL-READER export: write a Hive-style symlink manifest of the
    // CURRENT version's data files under `_symlink/v<N>/`, so engines
    // without the connector (DuckDB, Trino, plain spark.read.parquet)
    // read a CONSISTENT snapshot by file list instead of globbing a
    // directory that mixes live and dead versions. Refuses while
    // merge-on-read deletion vectors or metadata-only evolution are live
    // — an external reader cannot fold either. `materialize => true`
    // runs the compaction FIRST (folding dvs + evolution into plain
    // files) and exports the post-compaction version, so "give external
    // readers a snapshot of this evolving table" is one call instead of
    // a compact-then-export pair that can interleave with other commits.
    Spec("export_symlinks", Seq(Table,
        ProcedureParameter.in("materialize", BooleanType)
          .defaultValue("false").build()),
      (s, root, in) => {
        val materialize = !in.isNullAt(1) && in.getBoolean(1)
        val cur = ManifestUpsertSink.latestManifest(root).getOrElse(
          throw new IllegalArgumentException(s"no committed table at $root"))
        if (materialize && (cur.dvs.nonEmpty || cur.hasEvolution))
          sinkFor(root).compact(s)
        val m = ManifestUpsertSink.latestManifest(root).get
        require(m.dvs.isEmpty,
          "cannot export: live merge-on-read deletion vectors — external readers " +
            "cannot fold them; pass materialize => true (or CALL system.compact first)")
        require(!m.hasEvolution,
          "cannot export: live metadata-only schema evolution (rename/add/drop) — " +
            "external readers cannot fold it; pass materialize => true " +
            "(or CALL system.compact first)")
        graft.sinks.TableStore.forPath(root).putString(
          s"$root/_symlink/v${m.version}", "symlink-manifest.txt",
          m.files.map(_.path).mkString("\n"))
      }),
    // zero-copy (shallow) or rewriting (deep) table fork; the target is a
    // same-catalog TABLE NAME, so the clone is immediately SQL-visible
    Spec("clone", Seq(Table,
        ProcedureParameter.in("target_table", StringType).build(),
        ProcedureParameter.in("deep", BooleanType).build()),
      (s, root, in) => {
        val target = tableDir(in.getUTF8String(1).toString)
        sinkFor(root).cloneTo(s, target, deep = in.getBoolean(2)); ()
      }),
    // NAMED TAG: a zero-copy ref pinning the CURRENT version under a
    // name — `VERSION AS OF '<name>'` time-travels to it and vacuum
    // HOLDS it past every count/age horizon until drop_tag releases it.
    // (A writable named fork — a "branch" — is `clone` with a shallow
    // copy: same zero-copy version graft, its own commit chain.)
    Spec("tag", Seq(Table,
        ProcedureParameter.in("name", StringType).build()),
      (_, root, in) => {
        val m = ManifestUpsertSink.latestManifest(root).getOrElse(
          throw new IllegalArgumentException(s"no committed table at $root"))
        ManifestUpsertSink.setTag(root, in.getUTF8String(1).toString, m.version)
      }),
    Spec("drop_tag", Seq(Table,
        ProcedureParameter.in("name", StringType).build()),
      (_, root, in) =>
        ManifestUpsertSink.dropTag(root, in.getUTF8String(1).toString)),
    // WRITABLE BRANCH: a named commit chain inside the table's own root,
    // forked zero-copy from the current snapshot — `VERSION AS OF
    // '<name>'` reads its head, `` `t@<name>` `` addresses it for every
    // verb, main's vacuum holds whatever a branch still references
    Spec("branch", Seq(Table,
        ProcedureParameter.in("name", StringType).build()),
      (_, root, in) => {
        sinkFor(root).createBranch(in.getUTF8String(1).toString); ()
      }),
    Spec("drop_branch", Seq(Table,
        ProcedureParameter.in("name", StringType).build()),
      (_, root, in) =>
        ManifestUpsertSink.dropBranch(root, in.getUTF8String(1).toString)),
    // PUBLISH: fast-forward main to a branch's head — the closing verb
    // of write-audit-publish. Replays the branch's commits (manifests,
    // change feeds, stats sidecars; branch-own files move under main's
    // root), refuses when main has committed since the fork, and
    // retires the published branch. A branch with nothing staged is a
    // no-op and stays.
    Spec("fast_forward", Seq(Table,
        ProcedureParameter.in("branch", StringType).build()),
      (_, root, in) => {
        sinkFor(root).fastForwardFrom(in.getUTF8String(1).toString); ()
      }))

  /** `CALL graft.system.detail('t')` — DESCRIBE DETAIL: the table's
    * layout and size as ONE row, straight off the manifest log and its
    * stats sidecar (file counts, sidecar row/byte totals, committed
    * layout pair, partition census) — the same commit-time metadata the
    * scan's `SupportsReportStatistics` feeds the planner, made
    * SQL-visible. Zero data files touched. */
  private def detailRows(root: String): Array[InternalRow] = {
    val m = ManifestUpsertSink.latestManifest(root).getOrElse(
      throw new IllegalArgumentException(s"no committed table at $root"))
    val stats = ManifestUpsertSink.loadStats(root, m.version)
    val covered = m.files.flatMap(f => stats.get(f.path))
    // live deletion vectors: each dv'd key exists exactly once in its
    // bucket's data and in one dv file, so subtraction is exact
    val dvRows = m.dvs.map(_.rows).sum
    val rows =
      if (covered.size == m.files.size && !m.dvInexact)
        Some(covered.map(_.rows).sum - dvRows)
      else None // uncovered file or retention-inexact dvs: never guess
    val bytes =
      if (covered.nonEmpty && covered.forall(_.bytes >= 0))
        Some(covered.map(_.bytes).sum) else None
    val partitions = m.files.flatMap(f => ManifestUpsertSink.partOf(f.path))
      .distinct.size.toLong
    val row: InternalRow = new GenericInternalRow(Array[Any](
      m.version,
      m.keyCol.map(org.apache.spark.unsafe.types.UTF8String.fromString).orNull,
      m.buckets.map(b => Long.box(b.toLong)).orNull,
      m.partCol.map(org.apache.spark.unsafe.types.UTF8String.fromString).orNull,
      m.files.size.toLong,
      rows.map(Long.box).orNull,
      bytes.map(Long.box).orNull,
      partitions,
      ManifestUpsertSink.committedVersions(root).size.toLong,
      m.renames.nonEmpty,
      m.hasEvolution,
      m.dvs.size.toLong,
      dvRows))
    Array(row)
  }

  private val DetailSchema = StructType(Seq(
    StructField("version", LongType, nullable = false),
    StructField("key_col", StringType),
    StructField("buckets", LongType),
    StructField("partition_col", StringType),
    StructField("n_files", LongType, nullable = false),
    StructField("total_rows", LongType),
    StructField("total_bytes", LongType),
    StructField("n_partitions", LongType, nullable = false),
    StructField("n_versions", LongType, nullable = false),
    StructField("has_renames", BooleanType, nullable = false),
    // any live metadata-only evolution (rename/add/drop) — true means
    // reads are folding and a CALL system.compact would materialize
    StructField("has_evolution", BooleanType, nullable = false),
    // merge-on-read delete debt: live dv sidecar files and the exact
    // deleted-key count they hold (already subtracted from total_rows)
    StructField("n_dv_files", LongType, nullable = false),
    StructField("dv_rows", LongType, nullable = false)))

  /** `CALL graft.system.col_stats('t')` — the ANALYZE ... FOR COLUMNS
    * census as rows: one (column_name, ndv, null_count) per analyzed
    * column of the CURRENT version, empty when the version was never
    * column-analyzed (the census never carries across commits — see
    * [[GraftAnalyzeColumnsCommand]]). What the planner's DSv2 column
    * statistics feed on, made SQL-visible. */
  private def colStatsRows(root: String): Array[InternalRow] = {
    val m = ManifestUpsertSink.latestManifest(root).getOrElse(
      throw new IllegalArgumentException(s"no committed table at $root"))
    ManifestUpsertSink.loadColStats(root, m.version).toSeq.sortBy(_._1).map {
      case (n, cs) =>
        new GenericInternalRow(Array[Any](
          org.apache.spark.unsafe.types.UTF8String.fromString(n),
          cs.ndv, cs.nulls)): InternalRow
    }.toArray
  }

  private val ColStatsSchema = StructType(Seq(
    StructField("column_name", StringType, nullable = false),
    StructField("ndv", LongType, nullable = false),
    StructField("null_count", LongType, nullable = false)))

  /** `CALL graft.system.tags('t')` — the named refs as rows. */
  private def tagsRows(root: String): Array[InternalRow] =
    ManifestUpsertSink.tags(root).toSeq.sortBy(_._1).map { case (n, v) =>
      new GenericInternalRow(Array[Any](
        org.apache.spark.unsafe.types.UTF8String.fromString(n), v)): InternalRow
    }.toArray

  private val TagsSchema = StructType(Seq(
    StructField("tag", StringType, nullable = false),
    StructField("version", LongType, nullable = false)))

  /** `CALL graft.system.branches('t')` — live branches with their heads. */
  private def branchesRows(root: String): Array[InternalRow] =
    ManifestUpsertSink.branches(root).map { n =>
      val head = ManifestUpsertSink
        .latestManifest(ManifestUpsertSink.branchRoot(root, n))
        .map(_.version).getOrElse(-1L)
      new GenericInternalRow(Array[Any](
        org.apache.spark.unsafe.types.UTF8String.fromString(n), head)): InternalRow
    }.toArray

  private val BranchesSchema = StructType(Seq(
    StructField("branch", StringType, nullable = false),
    StructField("head_version", LongType, nullable = false)))

  def names: Seq[String] = specs(identity).map(_.name) ++
    Seq("history", "detail", "col_stats", "tags", "branches")

  def load(tableDir: String => String, name: String): UnboundProcedure = {
    if (name == "history") return historyProcedure(tableDir)
    if (name == "branches") return rowsProcedure(tableDir, "branches",
      "live writable branches with their head versions", BranchesSchema, branchesRows)
    if (name == "tags") return rowsProcedure(tableDir, "tags",
      "named version refs as rows", TagsSchema, tagsRows)
    if (name == "detail") return rowsProcedure(tableDir, "detail",
      "table layout + sidecar size census (DESCRIBE DETAIL)", DetailSchema, detailRows)
    if (name == "col_stats") return rowsProcedure(tableDir, "col_stats",
      "ANALYZE ... FOR COLUMNS census as rows (ndv + null count per column)",
      ColStatsSchema, colStatsRows)
    val spec = specs(tableDir).find(_.name == name).getOrElse(
      throw new IllegalArgumentException(
        s"unknown procedure $name — have ${names.mkString(", ")}"))
    new UnboundProcedure {
      override def name(): String = spec.name
      override def description(): String = s"graft-manifest maintenance: ${spec.name}"
      override def bind(inputType: StructType): BoundProcedure = new BoundProcedure {
        override def name(): String = spec.name
        override def description(): String = s"graft-manifest maintenance: ${spec.name}"
        override def parameters(): Array[ProcedureParameter] = spec.params.toArray
        override def isDeterministic: Boolean = false
        override def call(input: InternalRow): java.util.Iterator[Scan] = {
          val root = tableDir(input.getUTF8String(0).toString)
          spec.run(SparkSession.active, root, input)
          // one status row: the table's post-call head — vacuum can leave
          // the same version, every other verb commits a new one
          val m = ManifestUpsertSink.latestManifest(root)
          val row: InternalRow = new GenericInternalRow(Array[Any](
            m.map(_.version).getOrElse(-1L), m.map(_.files.size.toLong).getOrElse(0L)))
          val scan: Scan = new LocalScan {
            override def rows(): Array[InternalRow] = Array(row)
            override def readSchema(): StructType = StructType(Seq(
              StructField("version", LongType, nullable = false),
              StructField("n_files", LongType, nullable = false)))
          }
          Collections.singletonList(scan).iterator()
        }
      }
    }
  }

  private def historyProcedure(tableDir: String => String): UnboundProcedure =
    rowsProcedure(tableDir, "history", "manifest log as rows (DESCRIBE HISTORY)",
      HistorySchema, historyRows)

  /** A read-only procedure returning metadata rows for one table. */
  private def rowsProcedure(tableDir: String => String, procName: String,
      desc: String, schema: StructType,
      mkRows: String => Array[InternalRow]): UnboundProcedure =
    new UnboundProcedure {
      override def name(): String = procName
      override def description(): String = desc
      override def bind(inputType: StructType): BoundProcedure = new BoundProcedure {
        override def name(): String = procName
        override def description(): String = desc
        override def parameters(): Array[ProcedureParameter] = Array(Table)
        override def isDeterministic: Boolean = false
        override def call(input: InternalRow): java.util.Iterator[Scan] = {
          val root = tableDir(input.getUTF8String(0).toString)
          val scan: Scan = new LocalScan {
            override def rows(): Array[InternalRow] = mkRows(root)
            override def readSchema(): StructType = schema
          }
          Collections.singletonList(scan).iterator()
        }
      }
    }

  /** The sink bound from the COMMITTED manifest — procedures always act
    * with the table's own layout. */
  private def sinkFor(root: String): ManifestUpsertSink = {
    val m = ManifestUpsertSink.latestManifest(root).getOrElse(
      throw new IllegalArgumentException(s"no committed table at $root"))
    val key = m.keyCol.getOrElse(throw new IllegalStateException(
      s"table at $root predates the keyCol header — maintain via the Scala API"))
    new ManifestUpsertSink(root, key, m.buckets.getOrElse(16), m.partCol)
  }
}
