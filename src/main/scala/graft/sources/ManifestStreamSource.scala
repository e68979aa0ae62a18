package graft.sources

import org.apache.spark.sql.{DataFrame, GraftBridge, SQLContext}
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
  * one giant batch (the Delta `maxFilesPerTrigger` analogue, best-effort
  * across a fully-committed restart exactly like Kafka's V1 limiter).
  *
  * OFFSET = committed manifest version (a [[LongOffset]]). `getOffset`
  * is one manifest-dir listing; a micro-batch (start, end] reads exactly
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
  * inside later images, so `getBatch` compares the end version's rename
  * mapping against the start's and fails loudly asking for a restart —
  * after which the re-pinned schema parses old and new feeds alike.
  * Images written under a PREVIOUS logical name (a `startingVersion`
  * rewind across an old rename) parse that column as null: the image is
  * canonical JSON by name, renames never rewrite history.
  *
  * Reference anchor: kinesis3 tails a stream into files
  * (/root/reference/src/kinesis3/core.clj:128-143); this source closes
  * the loop the reference never had — the files themselves, once a
  * committed table, are again a stream. */
final class ManifestStreamSource(sqlContext: SQLContext, root: String,
    changesMode: Boolean, startingVersion: Option[Long],
    maxVersionsPerTrigger: Option[Long],
    override val schema: StructType) extends Source {

  private val spark = sqlContext.sparkSession

  /** Rename mapping pinned at start — see the schema-pinning contract. */
  private val startRenames: Seq[(String, String)] =
    ManifestUpsertSink.latestManifest(root).map(_.renames).getOrElse(Nil)

  /** Highest version already handed to a batch — the admission-control
    * anchor for `maxVersionsPerTrigger`. Learned from getBatch (recovery
    * replays initialize it from the checkpointed range) and from our own
    * getOffset answers; before either, catch-up modes anchor at their
    * own starting version so even batch 0 is capped. Best-effort across
    * a fully-committed restart (Kafka's V1 limiter contract): if the
    * engine hands us no recovery getBatch, the stale anchor costs at
    * most a few EMPTY micro-batches while it climbs past the committed
    * offset — `changesBetween` of an inverted range reads nothing, so
    * correctness never depends on the anchor. */
  @volatile private var lastSeenEnd: Option[Long] = None

  override def getOffset: Option[Offset] =
    ManifestUpsertSink.latestManifest(root).map { m =>
      val anchor = lastSeenEnd.orElse {
        // snapshot mode's batch 0 is ONE pinned snapshot read — capping
        // it would only snapshot an older version, not bound the I/O
        if (changesMode || startingVersion.isDefined)
          Some(startingVersion.getOrElse(0L) - 1L)
        else None
      }
      val capped = (maxVersionsPerTrigger, anchor) match {
        case (Some(cap), Some(last)) => math.min(m.version, last + cap)
        case _ => m.version
      }
      lastSeenEnd = Some(capped)
      LongOffset(capped)
    }

  // offsets arrive as LongOffset live and as SerializedOffset from the
  // checkpoint log on recovery — json is the common denominator
  private def ver(o: Offset): Long = o match {
    case l: LongOffset => l.offset
    case other => other.json.trim.toLong
  }

  override def getBatch(start: Option[Offset], end: Offset): DataFrame = {
    val endV = ver(end)
    if (lastSeenEnd.forall(_ < endV)) lastSeenEnd = Some(endV)
    for (m <- ManifestUpsertSink.manifestAt(root, endV)
         if m.renames != startRenames)
      throw new IllegalStateException(
        s"table at $root changed its column-rename mapping mid-stream " +
          s"(v$endV: ${m.renames}, stream started with $startRenames) — " +
          "restart the stream so the pinned schema matches the images")
    val batch = start match {
      case None if !changesMode && startingVersion.isEmpty =>
        // initial snapshot, pinned at endV: deterministic under replay
        ManifestUpsertSink.readVersion(spark, root, endV)
      case _ =>
        val from = start.map(ver(_) + 1L)
          .orElse(startingVersion).getOrElse(0L)
        changesBetween(from, endV)
    }
    GraftBridge.asStreamingDF(
      batch.select(schema.map(f => col(f.name).cast(f.dataType)): _*))
  }

  /** The change rows of versions [from, to] — header-only walk for
    * feed-less versions, loud failure for vacuumed ones. */
  private def changesBetween(from: Long, to: Long): DataFrame = {
    val perVersion = (from to to).flatMap { v =>
      ManifestUpsertSink.manifestAt(root, v) match {
        case None =>
          throw new IllegalStateException(
            s"streaming read needs version $v of $root but its manifest is " +
              "vacuumed or missing — size vacuum's keepVersions/keepChangeVersions " +
              "to cover live subscribers")
        case Some(m) if m.feed.isEmpty => None // compaction/DDL: no row changed
        case Some(_) =>
          val feed = spark.read.parquet(ManifestUpsertSink.changeFiles(root, v): _*)
          Some(
            if (changesMode) feed.withColumn("_version", lit(v))
            else feed.filter(col("change") =!= "deleted")
              .select(from_json(col("new_image"), schema, Map.empty[String, String]).as("r"))
              .select(schema.fieldNames.map(n => col(s"r.`$n`").as(n)): _*))
      }
    }
    if (perVersion.isEmpty)
      spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)
    else perVersion.reduce(_.unionByName(_))
  }

  override def commit(end: Offset): Unit = ()
  override def stop(): Unit = ()
  override def toString: String =
    s"graft-manifest-source[$root${if (changesMode) ", changes" else ""}]"
}

object ManifestStreamSource {

  /** The stream's pinned schema: the table's logical schema (merged
    * footers under the current rename mapping) for table-follow mode;
    * the feed contract + `_version` for changes mode. Requires a
    * committed table — there is nothing to pin a schema to before the
    * first commit (create the table, then subscribe). */
  private[sources] def resolveSchema(sqlContext: SQLContext,
      root: String, changesMode: Boolean): StructType = {
    val table = ManifestUpsertSink.read(sqlContext.sparkSession, root).schema
    if (!changesMode) table
    else {
      val keyCol = ManifestUpsertSink.latestManifest(root).flatMap(_.keyCol)
        .getOrElse(throw new IllegalStateException(
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
  }
}
