package graft.sources

import org.apache.spark.sql.{DataFrame, GraftBridge, SQLContext}
import org.apache.spark.sql.connector.read.streaming.{ReadLimit, ReadMaxRows, SupportsTriggerAvailableNow, Offset => OffsetV2}
import org.apache.spark.sql.execution.streaming.{Offset, Source}
import org.apache.spark.sql.execution.streaming.runtime.LongOffset
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}

import graft.sinks.ManifestUpsertSink

/** `readStream.format("graft-manifest")` — the manifest lake table as a
  * STREAMING SOURCE with exactly-once, version-granular offsets: the
  * "lake table in the middle of two streams" topology (ingest stream →
  * table → downstream consumers) that Delta calls streaming from a
  * table, closed over this lake's own commit protocol.
  *
  * {{{
  *   spark.readStream.format("graft-manifest").load(root)         // snapshot, then follow upserts
  *   spark.readStream.format("graft-manifest")
  *     .option("changes", "true").load(root)                      // CDC rows incl. deletes, + _version
  *   spark.readStream.format("graft-manifest")
  *     .option("startingVersion", 3).load(root)                   // no snapshot: changes since v3
  *   spark.readStream.format("graft-manifest")
  *     .option("maxVersionsPerTrigger", 10).load(root)            // bounded catch-up batches
  * }}}
  *
  * `maxVersionsPerTrigger` is ADMISSION CONTROL for catch-up: after
  * downtime the backlog drains ≤ N versions per micro-batch instead of
  * one giant batch (the Delta `maxFilesPerTrigger` analogue), driven
  * through [[SupportsAdmissionControl.latestOffset]] — the engine hands
  * the checkpointed start offset to each call, so the cap is exact
  * across restarts, and `Trigger.AvailableNow` gets true multi-batch
  * drain-then-stop semantics via the [[SupportsTriggerAvailableNow]]
  * latch (the KafkaSource shape; without it a V1 source silently
  * degrades to one-batch Trigger.Once).
  *
  * OFFSET = committed manifest version (a [[LongOffset]]). Offset
  * discovery (`latestOffset`) is one manifest-dir listing plus one
  * manifest read; a micro-batch (start, end] reads exactly
  * the change feeds of versions start+1..end — immutable once committed,
  * so checkpoint-recovery replays are bit-identical and the existing
  * `keepChangeVersions` vacuum horizon is the subscriber-retention knob
  * (a vacuumed feed inside an unprocessed window fails LOUDLY rather
  * than silently skipping data). Versions with no feed — compactions,
  * re-cluster epochs, DDL — contribute no rows and cost no I/O: the
  * walk reads their manifest header only. This beats the glob-listing
  * file-source subscription ([[graft.streaming.EventStream.changesStream]])
  * at scale: offsets advance by VERSION, not by listing an ever-growing
  * `_changes/` directory every trigger.
  *
  * Two row contracts:
  *  - DEFAULT (table-follow): batch 0 is the pinned SNAPSHOT at the
  *    stream's first committed version (deterministic under replay —
  *    the version, not "whatever is latest now", is what the offset
  *    log records); each later batch emits the AFTER images of that
  *    window's upserts as table-schema rows (`from_json` of the feed's
  *    canonical image — the key is part of the image). Deletes emit
  *    nothing here: an append-only downstream has no way to retract
  *    (use changes mode, which carries them).
  *  - `changes=true` (CDC tail): the raw feed rows (key, change ∈
  *    inserted|updated|deleted, old/new hashes and images) plus the
  *    `_version` that committed them; starts at version 0 unless
  *    `startingVersion` says otherwise.
  *
  * Schema is pinned at stream start (the standard streaming contract).
  * A column-rename DDL mid-stream would silently re-name the fields
  * inside later images, so the version walk detects rename DDLs
  * structurally — a commit whose mapping changed but whose FILE LIST
  * did not is a metadata-only rename (a compaction that merely
  * MATERIALIZES the mapping rewrites every file and changes no logical
  * name, so it passes) — and fails loudly asking for a restart, after
  * which the re-pinned schema parses old and new feeds alike. Images
  * written under a PREVIOUS logical name (a `startingVersion` rewind
  * across an old rename) parse that column as null: the image is
  * canonical JSON by name, renames never rewrite history.
  *
  * Reference anchor: kinesis3 tails a stream into files
  * (/root/reference/src/kinesis3/core.clj:128-143); this source closes
  * the loop the reference never had — the files themselves, once a
  * committed table, are again a stream. */
final class ManifestStreamSource(sqlContext: SQLContext, root: String,
    changesMode: Boolean, startingVersion: Option[Long],
    maxVersionsPerTrigger: Option[Long],
    override val schema: StructType) extends Source with SupportsTriggerAvailableNow {
  import ManifestStreamSource.PreSnapshot

  private val spark = sqlContext.sparkSession

  /** The version the pinned schema reflects (latest at construction):
    * rename DDLs at or below it are HISTORY the schema already names
    * correctly; one above it invalidates the pin and must refuse. The
    * mapping and key column as of the pin back the conservative guards
    * when a version's predecessor manifest is vacuumed. */
  private val pinnedManifest = ManifestUpsertSink.latestManifest(root)
  private val pinnedAt: Long = pinnedManifest.map(_.version).getOrElse(-1L)
  // the BREAKING metadata-evolution state (renames, dropped) as of the
  // pin — either changing mid-window is the images-name-columns-the-
  // pinned-schema-can't hazard (a rename respells them, a drop silently
  // nulls a column consumers still see). A metadata-only ADD is purely
  // ADDITIVE and deliberately NOT breaking: the pinned projection is
  // stable (post-add batch columns the pin doesn't know are projected
  // away; post-add images simply carry an extra JSON field) — a live
  // stream must not die for the most common evolution. A restart
  // re-pins and picks the new column up.
  private val pinnedEvo: (Seq[(String, String)], Seq[String]) =
    pinnedManifest.map(m => (m.renames, m.droppedCols)).getOrElse((Nil, Nil))
  // shared-name column types as of the pin (schema stamp ∪ metadata-only
  // added columns — an add has a type before any file carries it) — a
  // later TYPE CHANGE of a pinned column is breaking (the pinned
  // projection would silently overflow or coerce), while name-set
  // growth is additive and passes
  private val pinnedTypes: Map[String, String] =
    pinnedManifest.map(ManifestStreamSource.allTypesOf).getOrElse(Map.empty)
  // whether the PIN itself carried a schema stamp: a post-pin commit that
  // LOSES the stamp (unionPhysSchema drops it on an unresolvable same-name
  // type conflict, e.g. a merge re-typing a column int -> string, which
  // Union coercion lets through) then carries NO types for the drift guard
  // to compare — treating the loss itself as drift closes the blind spot
  // (a pinned from_json projection would otherwise silently parse the
  // re-typed values as nulls). Pre-stamp-vintage tables (pin unstamped)
  // keep the old behavior: their commits were never stamped to begin with.
  private val pinnedStamped: Boolean = pinnedManifest.exists(_.physSchema.nonEmpty)
  private val pinnedKeyCol: Option[String] = pinnedManifest.flatMap(_.keyCol)

  /** Trigger.AvailableNow's latch: versions committed AFTER prepare are
    * not this run's problem — the engine keeps scheduling batches until
    * latestOffset stops short of new data, and the latch is what makes
    * it stop (the KafkaSource contract). */
  @volatile private var availableNowLatch: Option[Long] = None

  override def prepareForTriggerAvailableNow(): Unit =
    availableNowLatch =
      Some(ManifestUpsertSink.latestManifest(root).map(_.version).getOrElse(-1L))

  /** ADMISSION CONTROL (the engine calls this, never [[getOffset]], on a
    * [[SupportsAdmissionControl]] source): the next batch's end version =
    * start + maxVersionsPerTrigger, clamped to what exists and to the
    * AvailableNow latch. The engine hands us the true start offset —
    * checkpointed on restart — so the cap needs no source-side memory of
    * its own. The pre-snapshot sentinel start (fresh snapshot-mode
    * stream) is never capped: batch 0 is ONE pinned snapshot read, and
    * capping it would only snapshot an older version, not bound I/O. */
  override def latestOffset(start: OffsetV2, limit: ReadLimit): OffsetV2 = {
    val latest0 = ManifestUpsertSink.latestManifest(root).map(_.version)
    val latest = availableNowLatch match {
      case Some(l) => latest0.map(math.min(_, l))
      case None => latest0
    }
    latest match {
      case None => start // nothing committed yet: no progress
      case Some(lv) =>
        // the engine passes NULL (not initialOffset) before the first
        // batch of a fresh stream — anchor the arithmetic ourselves
        val startV = if (start == null) ver(initialOffset()) else ver(start)
        val cap = limit match {
          case r: ReadMaxRows => Some(r.maxRows)
          case _ => None
        }
        val endV = cap match {
          case Some(n) if startV != PreSnapshot => math.min(lv, startV + n)
          case _ => lv
        }
        if (endV <= startV && startV != PreSnapshot) start else LongOffset(endV)
    }
  }

  override def getDefaultReadLimit: ReadLimit =
    maxVersionsPerTrigger.map(ReadLimit.maxRows).getOrElse(ReadLimit.allAvailable())

  /** The TRUE latest version, uncapped — StreamingQueryProgress shows it
    * next to the admitted endOffset, so a capped catch-up's LAG is
    * observable (latestOffset − endOffset = versions still queued). */
  override def reportLatestOffset(): OffsetV2 =
    ManifestUpsertSink.latestManifest(root).map(m => LongOffset(m.version)).orNull

  /** The fresh-stream anchor for [[latestOffset]]'s arithmetic: the
    * version just below the catch-up start, or the pre-snapshot sentinel
    * for a fresh table-follow stream. The engine passes NULL as the
    * first start rather than calling this — latestOffset substitutes it
    * itself; getBatch still sees start=None for batch 0. */
  override def initialOffset(): OffsetV2 =
    LongOffset(
      if (changesMode || startingVersion.isDefined) startingVersion.getOrElse(0L) - 1L
      else PreSnapshot)

  override def deserializeOffset(json: String): OffsetV2 = LongOffset(json.trim.toLong)

  override def getOffset: Option[Offset] =
    throw new UnsupportedOperationException(
      "latestOffset(Offset, ReadLimit) drives this source") // the SupportsAdmissionControl contract

  // offsets arrive as LongOffset live and as SerializedOffset from the
  // checkpoint log on recovery — json is the common denominator
  private def ver(o: OffsetV2): Long = o match {
    case l: LongOffset => l.offset
    case other => other.json.trim.toLong
  }

  override def getBatch(start: Option[Offset], end: Offset): DataFrame = {
    val endV = ver(end)
    val batch = start match {
      case None if !changesMode && startingVersion.isEmpty =>
        // initial snapshot, pinned at endV: deterministic under replay.
        // A fully-deleted snapshot is a REAL version (every key removed)
        // — an empty batch, not an error
        if (ManifestUpsertSink.manifestAt(root, endV).exists(_.files.isEmpty)) emptyBatch
        else ManifestUpsertSink.readVersion(spark, root, endV)
      case _ =>
        val from = start.map(ver(_) + 1L)
          .orElse(startingVersion).getOrElse(0L)
        changesBetween(from, endV)
    }
    // tolerate pinned columns ABSENT from this window's physical feeds
    // (a startingVersion rewind across an old rename reads images that
    // only know the previous name): they surface as the documented
    // nulls instead of an analysis error
    val present = batch.columns.toSet
    GraftBridge.asStreamingDF(
      batch.select(schema.map(f =>
        (if (present(f.name)) col(f.name) else lit(null))
          .cast(f.dataType).as(f.name)): _*))
  }

  /** The change rows of versions [from, to] — header-only walk for
    * feed-less versions, loud failure for vacuumed ones. All versions'
    * feeds read as ONE parquet scan (a 1000-version catch-up batch must
    * not become 1000 union'd scan nodes); changes mode recovers each
    * row's `_version` by broadcast-joining the file's parent dir against
    * the driver's (dir → version) walk — ≤ one row per version, and it
    * works for staged-feed dirs (the crash-heal window) where the path
    * carries no version. */
  private[graft] def changesBetween(from: Long, to: Long): DataFrame = {
    val beforeWindow = ManifestUpsertSink.manifestAt(root, from - 1)
    // breaking evolution only — ADD COLUMN passes (see pinnedEvo)
    def evoOf(m: ManifestUpsertSink.Manifest) = (m.renames, m.droppedCols)
    // a post-pin TYPE CHANGE of any column the pin names is breaking —
    // the pinned projection would coerce wide/retyped values silently
    // (a widening overflows, a drop+re-add at a new type mis-parses) —
    // so every post-pin version's types are checked against the PIN
    // directly (name-set growth is additive and passes; the check never
    // compares whole stamps). Pre-pin backlog types are safe: the pin is
    // the newest schema, and a narrower old vintage parses INTO it.
    def typeDrift(curT: Map[String, String]): Boolean =
      pinnedTypes.exists { case (n, t) => curT.get(n).exists(_ != t) }
    var prevEvo: Option[(Seq[(String, String)], Seq[String])] =
      beforeWindow.map(evoOf)
    var prevFiles: Option[Seq[String]] = beforeWindow.map(_.files.map(_.path))
    val dirOfVersion: Seq[(String, Long)] = (from to to).flatMap { v =>
      ManifestUpsertSink.manifestAt(root, v) match {
        case None =>
          throw new IllegalStateException(
            s"streaming read needs version $v of $root but its manifest is " +
              "vacuumed or missing — size vacuum's keepVersions/keepChangeVersions " +
              "to cover live subscribers")
        case Some(m) =>
          // a commit whose rename mapping changed WITHOUT rewriting any
          // file is a rename DDL — images on its two sides carry
          // DIFFERENT logical names, and the pinned schema can only name
          // one side. Refuse when the DDL postdates the schema pin
          // (future feeds unknown to the schema) OR when this window
          // holds feeds from BEFORE it (a restart backlog spanning the
          // rename: the re-pinned schema would silently null the old
          // names). A materializing compaction changes the mapping too,
          // but rewrites every file and no logical name — it passes; a
          // restart whose window starts AT the rename passes (no
          // pre-rename feeds left to mis-parse).
          val isRenameDdl = prevEvo.exists(_ != evoOf(m)) &&
            prevFiles.exists(_ == m.files.map(_.path))
          // predecessor vacuumed → can't classify: refuse conservatively
          // when the evolution state drifted from the pin after the pin
          val unclassifiable =
            prevEvo.isEmpty && v > pinnedAt && evoOf(m) != pinnedEvo
          // post-pin type drift needs no DDL classification: ANY version
          // after the pin whose shared-name types left the pin's breaks
          // the pinned projection, whether committed by a DDL, a
          // post-widen merge, or a materializing compaction
          // post-pin stamp LOSS is drift too: an unstamped successor of a
          // stamped pin means a commit's written schema conflicted with
          // the stamp unresolvably (re-type through Union coercion) — the
          // exact silent-corruption case the type check exists to catch,
          // invisible to it because allTypesOf of an unstamped manifest
          // is empty
          if (v > pinnedAt && pinnedStamped && m.physSchema.isEmpty)
            throw new IllegalStateException(
              s"table at $root lost its schema stamp at v$v inside this stream's " +
                s"window [$from, $to] — a commit re-typed a column unresolvably; " +
                "restart the stream so the pinned schema matches the data")
          if (v > pinnedAt && typeDrift(ManifestStreamSource.allTypesOf(m)))
            throw new IllegalStateException(
              s"table at $root changed a pinned column's type (widen or re-add) " +
                s"at v$v inside this stream's window [$from, $to] — restart the " +
                "stream so the pinned schema matches the data")
          if ((isRenameDdl && (v > pinnedAt || from < v)) || unclassifiable)
            throw new IllegalStateException(
              s"table at $root changed schema (rename/drop/widen) at v$v " +
                s"inside this stream's window [$from, $to] — restart the stream " +
                "(or start at startingVersion >= the DDL) so the pinned " +
                "schema matches the images")
          // a RE-KEY (recluster to a new key column) after the pin makes
          // later feeds name their key column differently — same silent-
          // null hazard, same answer
          if (v > pinnedAt)
            for (pk <- pinnedKeyCol; mk <- m.keyCol if mk != pk)
              throw new IllegalStateException(
                s"table at $root re-keyed $pk -> $mk at v$v mid-stream — " +
                  "restart the stream to re-pin the schema")
          prevEvo = Some(evoOf(m))
          prevFiles = Some(m.files.map(_.path))
          if (m.feed.isEmpty) Nil // compaction/DDL: no row changed
          else {
            // finalize a crashed writer's staged feed FIRST, so the scan
            // reads the stable _changes path a concurrent writer's heal
            // can't rename out from under the scheduled tasks
            ManifestUpsertSink.healFeedAt(root, v)
            ManifestUpsertSink.changeFiles(root, v)
              .map(p => p.substring(0, p.lastIndexOf('/')) -> v).distinct
          }
      }
    }
    if (dirOfVersion.isEmpty) return emptyBatch
    // mergeSchema: feeds across a key-column rename carry different
    // physical key names; the merged schema exposes both (the absent
    // vintage reads null — see getBatch's tolerant align)
    val feed = spark.read.option("mergeSchema", "true")
      .parquet(dirOfVersion.map(_._1): _*)
    if (changesMode) {
      import spark.implicits._
      // match on the dir's LAST TWO path segments (`_changes/v<N>` /
      // `_stage/<tag>`) — unique within the table and immune to the
      // scheme/percent-encoding differences between input_file_name's
      // URI form and the driver walk's plain paths
      def tailSegs(p: String): String =
        p.split('/').filter(_.nonEmpty).takeRight(2).mkString("/")
      val dirs = broadcast(
        dirOfVersion.map { case (d, v) => (tailSegs(d), v) }.toDF("_dir", "_version"))
      feed
        .withColumn("_dir",
          regexp_extract(input_file_name(), "([^/]+/[^/]+)/[^/]*$", 1))
        .join(dirs, Seq("_dir"))
        .drop("_dir")
    } else
      feed.filter(col("change") =!= "deleted")
        .select(from_json(col("new_image"), schema, Map.empty[String, String]).as("r"))
        .select(schema.fieldNames.map(n => col(s"r.`$n`").as(n)): _*)
  }

  private def emptyBatch: DataFrame =
    spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)

  override def commit(end: Offset): Unit = ()
  override def stop(): Unit = ()
  override def toString: String =
    s"graft-manifest-source[$root${if (changesMode) ", changes" else ""}]"
}

object ManifestStreamSource {

  /** Sentinel start version for a fresh table-follow stream (its batch 0
    * is a snapshot, not a version range) — committed versions are ≥ 0
    * and catch-up anchors are ≥ -1, so -2 is unreachable as a real
    * offset. */
  private val PreSnapshot = -2L

  /** A version's per-column types: the schema stamp ∪ metadata-only
    * added columns (an add has a declared type before any file carries
    * it). One DDL parse per call — the mid-window type-drift guard
    * calls this once per version walked. */
  private[sources] def allTypesOf(m: ManifestUpsertSink.Manifest): Map[String, String] =
    m.physSchema.map(ddl => org.apache.spark.sql.types.StructType.fromDDL(ddl)
        .fields.map(f => f.name -> f.dataType.simpleString).toMap)
      .getOrElse(Map.empty) ++
      m.addedCols.map { case (n, t) =>
        n -> org.apache.spark.sql.types.DataType.fromDDL(t).simpleString
      }

  /** Memo for [[resolveSchema]]: every stream start calls it twice
    * (sourceSchema, then createSource — Spark forwards only a
    * USER-specified schema between the two), and each resolution is a
    * distributed footer-merge over the snapshot's files. Keyed by the
    * latest committed version, so evolution invalidates naturally. */
  private val schemaMemo =
    new java.util.concurrent.ConcurrentHashMap[(String, Boolean, Long, Option[Long]), StructType]()

  /** The stream's pinned schema: the table's logical schema (merged
    * footers under the current rename mapping) for table-follow mode;
    * the feed contract + `_version` for changes mode. Requires a table
    * with at least one committed DATA version — a FULLY-DELETED current
    * snapshot pins its schema from the newest version that still lists
    * files (deletes never change the schema), so a drained-then-refilled
    * table streams without interruption. */
  private[graft] def resolveSchema(sqlContext: SQLContext,
      root: String, changesMode: Boolean): StructType = {
    val latest = ManifestUpsertSink.latestManifest(root).getOrElse(
      throw new IllegalStateException(
        s"no committed manifest under $root — create the table, then subscribe"))
    // bounded, and keyed by the latest commit's STAMP as well as its
    // version: a table dropped and recreated at the same path reaches
    // the same version numbers with different stamps, and must never
    // inherit the old table's pinned schema
    if (schemaMemo.size > 256) schemaMemo.clear()
    schemaMemo.computeIfAbsent((root, changesMode, latest.version, latest.ts), { _ =>
      val spark = sqlContext.sparkSession
      // newest version that still lists files: the schema anchor even
      // when the CURRENT snapshot is fully deleted
      val table = latest.physSchema match {
        case Some(stamp) =>
          // the committed schema stamp pins the stream's schema with
          // ZERO file I/O (and no anchor juggling on a drained table)
          // deliberately WITHOUT the defaults fold: the stream's schema
          // feeds from_json over backlog images, and a pre-add image
          // reads the defaulted column as null — a non-nullable pinned
          // field would lie to codegen. The rewind-reads-null contract
          // is the documented one for every metadata evolution here.
          ManifestSource.applyEvolutionSchema(
            org.apache.spark.sql.types.StructType.fromDDL(stamp),
            latest.renames, latest.addedCols, latest.droppedCols)
        case None =>
          val dataFiles = ManifestUpsertSink.schemaAnchor(root, latest)
          if (dataFiles.isEmpty)
            throw new IllegalStateException(
              s"table at $root has no version with data files — nothing to pin a schema to")
          ManifestUpsertSink.applyEvolution(
            spark.read.option("mergeSchema", "true").parquet(dataFiles: _*)
              .drop("__bucket"),
            latest).schema
      }
      if (!changesMode) table
      else {
        val keyCol = latest.keyCol.getOrElse(throw new IllegalStateException(
          s"table at $root predates the keyCol manifest header — compact once to stamp it"))
        StructType(Seq(
          table(keyCol),
          StructField("change", StringType),
          StructField("old_hash", LongType),
          StructField("new_hash", LongType),
          StructField("old_image", StringType),
          StructField("new_image", StringType),
          StructField("_version", LongType)))
      }
    })
  }
}
