package graft

import java.nio.file.Files

import scala.collection.mutable
import scala.jdk.CollectionConverters._

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.sinks.ManifestUpsertSink

/** `readStream.format("graft-manifest")` — the lake table as a streaming
  * source: pinned initial snapshot, version-offset tailing of upserts,
  * delete visibility rules per mode, exactly-once across a checkpoint
  * restart, and the loud mid-stream-DDL guard. */
class ManifestStreamSourceSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def tmp(prefix: String): String =
    Files.createTempDirectory(prefix).toString

  /** Drain a streaming frame into a thread-safe buffer via foreachBatch —
    * the recovery-honest harness (memory sink isn't fault tolerant). */
  private def drainTo(df: DataFrame, checkpoint: String,
      buf: mutable.Buffer[Seq[Any]]): org.apache.spark.sql.streaming.StreamingQuery =
    df.writeStream
      .foreachBatch { (b: DataFrame, _: Long) =>
        val rows = b.collect().map(_.toSeq).toSeq
        buf.synchronized { buf ++= rows; () }
      }
      .option("checkpointLocation", checkpoint)
      .start()

  test("table-follow: pinned snapshot, upsert tail, silent deletes/compactions, exactly-once restart") {
    import spark.implicits._
    val root = tmp("graft_stream_src_")
    val ckpt = tmp("graft_stream_src_ckpt_")
    val sink = new ManifestUpsertSink(root, "id", buckets = 4)
    sink.upsertBatch(Seq((1L, "a", 1L), (2L, "b", 1L)).toDF("id", "p", "seq"), "seq", 0L)
    sink.upsertBatch(Seq((2L, "b2", 2L), (3L, "c", 2L)).toDF("id", "p", "seq"), "seq", 1L)

    val got = mutable.Buffer[Seq[Any]]()
    val stream = spark.readStream.format("graft-manifest").load(root)
    assert(stream.isStreaming && stream.columns.toSeq == Seq("id", "p", "seq"))
    val q = drainTo(stream.select("id", "p"), ckpt, got)
    try {
      q.processAllAvailable()
      assert(got.synchronized(got.toSet) == Set(Seq(1L, "a"), Seq(2L, "b2"), Seq(3L, "c")),
        "batch 0 is the snapshot at stream start — merged history, not per-version replays")

      // a live merge lands as that window's AFTER images only
      sink.upsertBatch(Seq((1L, "a2", 3L), (4L, "d", 3L)).toDF("id", "p", "seq"), "seq", 2L)
      q.processAllAvailable()
      assert(got.synchronized(got.size) == 5 &&
        got.synchronized(got.toSet).contains(Seq(1L, "a2")) &&
        got.synchronized(got.toSet).contains(Seq(4L, "d")))

      // deletes emit nothing in table-follow mode; compactions are
      // feed-less versions the offset walk skips at header cost
      sink.deleteKeys(Seq(3L).toDF("id"), 3L)
      sink.compact(spark)
      q.processAllAvailable()
      assert(got.synchronized(got.size) == 5, "delete + compaction add no table-follow rows")
    } finally q.stop()

    // restart from the checkpoint: ONLY versions after the committed
    // offset arrive — no snapshot replay, no re-delivered images
    val sink2 = new ManifestUpsertSink(root, "id", buckets = 4)
    sink2.upsertBatch(Seq((5L, "e", 4L)).toDF("id", "p", "seq"), "seq", 4L)
    val got2 = mutable.Buffer[Seq[Any]]()
    val q2 = drainTo(spark.readStream.format("graft-manifest").load(root)
      .select("id", "p"), ckpt, got2)
    try {
      q2.processAllAvailable()
      assert(got2.synchronized(got2.toSeq) == Seq(Seq(5L, "e")),
        "restart resumes at the committed version: exactly-once, no snapshot")
    } finally q2.stop()
  }

  test("changes mode: full CDC tail with deletes and _version stamps") {
    import spark.implicits._
    val root = tmp("graft_stream_cdc_")
    val ckpt = tmp("graft_stream_cdc_ckpt_")
    val sink = new ManifestUpsertSink(root, "id", buckets = 4)
    sink.upsertBatch(Seq((1L, "a", 1L), (2L, "b", 1L)).toDF("id", "p", "seq"), "seq", 0L)
    sink.upsertBatch(Seq((2L, "b2", 2L)).toDF("id", "p", "seq"), "seq", 1L)
    sink.deleteKeys(Seq(1L).toDF("id"), 2L)

    val got = mutable.Buffer[Seq[Any]]()
    val stream = spark.readStream.format("graft-manifest")
      .option("changes", "true").load(root)
    val q = drainTo(stream.select("id", "change", "_version"), ckpt, got)
    try {
      q.processAllAvailable()
      assert(got.synchronized(got.toSet) == Set(
        Seq(1L, "inserted", 0L), Seq(2L, "inserted", 0L),
        Seq(2L, "updated", 1L), Seq(1L, "deleted", 2L)),
        "the CDC tail replays the table's whole change history with version stamps")
      sink.upsertBatch(Seq((3L, "c", 3L)).toDF("id", "p", "seq"), "seq", 3L)
      q.processAllAvailable()
      assert(got.synchronized(got.toSet).contains(Seq(3L, "inserted", 3L)))
    } finally q.stop()
  }

  test("full topology: ingest -> lake -> IVM materialized view -> the MV's CDC as a stream") {
    import spark.implicits._
    val root = tmp("graft_topo_src_")
    val mvRoot = tmp("graft_topo_mv_")
    val mvCkpt = tmp("graft_topo_mvck_")
    val dsCkpt = tmp("graft_topo_dsck_")
    val src = new ManifestUpsertSink(root, "id", buckets = 4)
    src.upsertBatch(Seq((1L, 10.0, 1L), (2L, 20.0, 1L)).toDF("id", "v", "seq"), "seq", 0L)

    // stage 2: the IVM view maintains per-group sums into a second lake table
    val mvSink = new ManifestUpsertSink(mvRoot, "grp", buckets = 2)
    val mvQ = graft.streaming.EventStream.startMaintainedView(
      spark, root, mvSink, imageSchema = "id BIGINT, seq BIGINT, v DOUBLE",
      groupExpr = pmod(col("id"), lit(2L)), valueField = "v",
      checkpoint = mvCkpt, intervalMs = 50L)
    // stage 3: a DOWNSTREAM consumer tails the VIEW's own change feed
    // through the version-offset source — view-level deltas, no rescan
    val got = mutable.Buffer[Seq[Any]]()
    var dsQ: org.apache.spark.sql.streaming.StreamingQuery = null
    try {
      mvQ.processAllAvailable()
      dsQ = drainTo(spark.readStream.format("graft-manifest")
        .option("changes", "true").load(mvRoot)
        .select("grp", "change"), dsCkpt, got)
      dsQ.processAllAvailable()
      // the seed may drain across several MV triggers (file-source
      // latching), so pin membership, not the exact multiset
      assert(Set(Seq(0L, "inserted"), Seq(1L, "inserted"))
        .subsetOf(got.synchronized(got.toSet)),
        "the MV's seed maintenance surfaces as view-level inserts downstream")

      // a source merge ripples through: lake CDC -> IVM -> MV merge -> MV CDC
      src.upsertBatch(Seq((4L, 40.0, 2L)).toDF("id", "v", "seq"), "seq", 1L)
      mvQ.processAllAvailable()
      dsQ.processAllAvailable()
      assert(got.synchronized(got.toSet).contains(Seq(0L, "updated")),
        "a source-row merge arrives downstream as the touched group's update")

      // group death ripples as a view-level DELETE
      src.deleteKeys(Seq(1L).toDF("id"), batchId = 2L)
      mvQ.processAllAvailable()
      dsQ.processAllAvailable()
      assert(got.synchronized(got.toSet).contains(Seq(1L, "deleted")),
        "an emptied group arrives downstream as a view-level delete")
    } finally { mvQ.stop(); if (dsQ != null) dsQ.stop() }
  }

  test("maxVersionsPerTrigger bounds catch-up batches") {
    import spark.implicits._
    val root = tmp("graft_stream_rate_")
    val ckpt = tmp("graft_stream_rate_ckpt_")
    val sink = new ManifestUpsertSink(root, "id", buckets = 2)
    for (i <- 0L to 5L) // six committed versions of backlog
      sink.upsertBatch(Seq((i, s"p$i", i)).toDF("id", "p", "seq"), "seq", i)

    val perBatch = mutable.Buffer[Set[Long]]()
    val q = spark.readStream.format("graft-manifest")
      .option("changes", "true").option("startingVersion", "0")
      .option("maxVersionsPerTrigger", "2").load(root)
      .select("_version")
      .writeStream
      .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
        val vs = b.select("_version").collect().map(_.getLong(0)).toSet
        perBatch.synchronized { perBatch += vs; () }
      }
      .option("checkpointLocation", ckpt)
      .start()
    try {
      q.processAllAvailable()
      val all = perBatch.synchronized(perBatch.toSeq)
      assert(all.flatten.toSet == (0L to 5L).toSet, "the whole backlog drains")
      assert(all.forall(_.size <= 2),
        s"no batch may span more than maxVersionsPerTrigger versions: $all")
      assert(all.count(_.nonEmpty) >= 3, "six versions at cap 2 need >= 3 batches")
    } finally q.stop()
  }

  test("Trigger.AvailableNow drains the whole backlog in capped batches, then stops") {
    import spark.implicits._
    val root = tmp("graft_stream_avnow_")
    val ckpt = tmp("graft_stream_avnow_ckpt_")
    val sink = new ManifestUpsertSink(root, "id", buckets = 2)
    for (i <- 0L to 4L)
      sink.upsertBatch(Seq((i, s"p$i", i)).toDF("id", "p", "seq"), "seq", i)

    val got = mutable.Buffer[Seq[Any]]()
    val q = spark.readStream.format("graft-manifest")
      .option("changes", "true").option("startingVersion", "0")
      .option("maxVersionsPerTrigger", "2").load(root)
      .select("_version")
      .writeStream
      .foreachBatch { (b: DataFrame, _: Long) =>
        val rows = b.collect().map(_.toSeq).toSeq
        got.synchronized { got ++= rows; () }
      }
      .option("checkpointLocation", ckpt)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    assert(q.awaitTermination(120000), "AvailableNow must terminate on its own")
    assert(got.synchronized(got.map(_.head).toSet) == (0L to 4L).map(v => v: Any).toSet,
      "the batch-backfill pattern: drain EVERYTHING committed (across capped batches), then stop")
  }

  test("a vacuumed feed inside an unprocessed window fails loudly, not silently skips") {
    import spark.implicits._
    val root = tmp("graft_stream_vac_")
    val ckpt = tmp("graft_stream_vac_ckpt_")
    val sink = new ManifestUpsertSink(root, "id", buckets = 2)
    for (i <- 0L to 3L)
      sink.upsertBatch(Seq((i, s"p$i", i)).toDF("id", "p", "seq"), "seq", i)
    sink.vacuum(keepVersions = 1) // reclaims v0-v2's manifests and feeds

    val got = mutable.Buffer[Seq[Any]]()
    val q = drainTo(spark.readStream.format("graft-manifest")
      .option("changes", "true").option("startingVersion", "0").load(root)
      .select("id"), ckpt, got)
    try {
      val e = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
        q.processAllAvailable()
        q.awaitTermination(10000)
      }
      val msg = e.getMessage + Option(e.getCause).map(_.getMessage).getOrElse("")
      assert(msg.contains("vacuum"), s"the failure must name the vacuum horizon: $msg")
    } finally q.stop()
  }

  test("a multi-version catch-up batch plans ONE parquet scan, not one per version") {
    import spark.implicits._
    val root = tmp("graft_stream_plan_")
    val sink = new ManifestUpsertSink(root, "id", buckets = 2)
    for (i <- 0L to 5L)
      sink.upsertBatch(Seq((i, s"p$i", i)).toDF("id", "p", "seq"), "seq", i)

    val src = new graft.sources.ManifestStreamSource(spark.sqlContext, root,
      changesMode = true, startingVersion = Some(0L), maxVersionsPerTrigger = None,
      graft.sources.ManifestStreamSource.resolveSchema(spark.sqlContext, root, changesMode = true))
    val batch = src.changesBetween(0L, 5L)
    val leaves = batch.queryExecution.optimizedPlan.collectLeaves().map(_.nodeName)
    val scans = leaves.count(n => n.contains("Relation") && !n.contains("Local"))
    assert(scans == 1,
      s"a 6-version window must be ONE scan over all feed dirs (a 1000-version " +
        s"backlog must not build a 1000-leaf plan); leaves: $leaves")
    // and the broadcast dir->version mapping still stamps each row right
    val got = batch.select("_version", "id").as[(Long, Long)].collect().toSet
    assert(got == (0L to 5L).map(v => (v, v)).toSet)
  }

  test("CDC APPLY replication: changes stream -> applyChanges sink == exact mirror") {
    import spark.implicits._
    val srcRoot = tmp("graft_repl_src_")
    val dstRoot = tmp("graft_repl_dst_")
    val ckpt = tmp("graft_repl_ckpt_")
    val src = new ManifestUpsertSink(srcRoot, "id", buckets = 4)
    // history with the nasty orderings: update, delete, DELETE-THEN-
    // REINSERT (naive upserts-then-deletes apply would kill id=1)
    src.upsertBatch(Seq((1L, "a", 1L), (2L, "b", 1L), (3L, "c", 1L))
      .toDF("id", "p", "seq"), "seq", 0L)
    src.upsertBatch(Seq((2L, "b2", 2L)).toDF("id", "p", "seq"), "seq", 1L)
    src.deleteKeys(Seq(1L, 3L).toDF("id"), 2L)
    src.upsertBatch(Seq((1L, "back", 3L)).toDF("id", "p", "seq"), "seq", 3L)

    val imgDdl = "id BIGINT, p STRING, seq BIGINT"
    val parsed = spark.readStream.format("graft-manifest")
      .option("changes", "true").load(srcRoot)
      .select(col("id"), col("change"), col("_version"),
        from_json(col("new_image"), imgDdl, Map.empty[String, String]).getField("p").as("p"),
        from_json(col("new_image"), imgDdl, Map.empty[String, String]).getField("seq").as("seq"))
    val q = parsed.writeStream.format("graft-manifest")
      .option("applyChanges", "true")
      .option("orderCol", "_version").option("keyCol", "id").option("buckets", "4")
      .option("checkpointLocation", ckpt)
      .start(dstRoot)
    try {
      q.processAllAvailable()
      def snap(root: String): Map[Long, (String, Long)] =
        ManifestUpsertSink.read(spark, root)
          .select("id", "p", "seq").as[(Long, String, Long)]
          .collect().map { case (i, p, s) => i -> (p, s) }.toMap
      assert(snap(dstRoot) == snap(srcRoot) &&
        snap(dstRoot) == Map(1L -> ("back", 3L), 2L -> ("b2", 2L)),
        "the mirror must equal the source, including the delete-then-reinsert key")

      // live tail: more verbs ripple through the running replication
      src.upsertBatch(Seq((4L, "d", 4L)).toDF("id", "p", "seq"), "seq", 4L)
      src.deleteKeys(Seq(2L).toDF("id"), 5L)
      q.processAllAvailable()
      assert(snap(dstRoot) == snap(srcRoot) &&
        snap(dstRoot) == Map(1L -> ("back", 3L), 4L -> ("d", 4L)))

      // the mirror is a first-class lake table: its own versions + feed
      assert(ManifestUpsertSink.snapshotManifest(dstRoot, None).version >= 1L)
    } finally q.stop()
  }

  test("CDC APPLY with mergeOnRead: the mirror replicates by append + dv, still exact") {
    import spark.implicits._
    val srcRoot = tmp("graft_replm_src_")
    val dstRoot = tmp("graft_replm_dst_")
    val ckpt = tmp("graft_replm_ckpt_")
    val src = new ManifestUpsertSink(srcRoot, "id", buckets = 4)
    src.upsertBatch(Seq((1L, "a", 1L), (2L, "b", 1L), (3L, "c", 1L))
      .toDF("id", "p", "seq"), "seq", 0L)
    src.upsertBatch(Seq((2L, "b2", 2L)).toDF("id", "p", "seq"), "seq", 1L)
    src.deleteKeys(Seq(3L).toDF("id"), 2L)

    val imgDdl = "id BIGINT, p STRING, seq BIGINT"
    val parsed = spark.readStream.format("graft-manifest")
      .option("changes", "true").load(srcRoot)
      .select(col("id"), col("change"), col("_version"),
        from_json(col("new_image"), imgDdl, Map.empty[String, String]).getField("p").as("p"),
        from_json(col("new_image"), imgDdl, Map.empty[String, String]).getField("seq").as("seq"))
    val q = parsed.writeStream.format("graft-manifest")
      .option("applyChanges", "true").option("mergeOnRead", "true")
      .option("orderCol", "_version").option("keyCol", "id").option("buckets", "4")
      .option("checkpointLocation", ckpt)
      .start(dstRoot)
    try {
      q.processAllAvailable()
      def snap(root: String): Map[Long, (String, Long)] =
        ManifestUpsertSink.read(spark, root)
          .select("id", "p", "seq").as[(Long, String, Long)]
          .collect().map { case (i, p, s) => i -> (p, s) }.toMap
      assert(snap(dstRoot) == snap(srcRoot) &&
        snap(dstRoot) == Map(1L -> ("a", 1L), 2L -> ("b2", 2L)))
      // first window: every key's LAST action is an insert (or a delete
      // of a never-mirrored key) — nothing to mask, so no dv debt yet
      val m0 = ManifestUpsertSink.latestManifest(dstRoot).get
      assert(m0.dvs.isEmpty, "pure inserts need no deletion vectors")
      // live tail: an UPDATE and a DELETE of existing mirrored keys —
      // the MoR routing commits dv sidecars instead of bucket rewrites
      src.upsertBatch(Seq((1L, "a2", 3L)).toDF("id", "p", "seq"), "seq", 3L)
      src.deleteKeys(Seq(2L).toDF("id"), 4L)
      q.processAllAvailable()
      assert(snap(dstRoot) == snap(srcRoot) &&
        snap(dstRoot) == Map(1L -> ("a2", 3L)))
      val m1 = ManifestUpsertSink.latestManifest(dstRoot).get
      assert(m1.dvs.map(_.rows).sum == 2L,
        s"the update and the delete each mask one prior instance: ${m1.dvs}")
      assert(m0.files.map(_.path).toSet.subsetOf(m1.files.map(_.path).toSet),
        "the mirror's prior data files are carried, never rewritten")
      // and the debt compacts away with answers unchanged
      new ManifestUpsertSink(dstRoot, "id", 4).compact(spark)
      assert(ManifestUpsertSink.latestManifest(dstRoot).get.dvs.isEmpty)
      assert(snap(dstRoot) == Map(1L -> ("a2", 3L)))
    } finally q.stop()
  }

  test("a rename hidden by a later compaction in the same window still fails loudly") {
    import spark.implicits._
    val root = tmp("graft_stream_rc_")
    val ckpt = tmp("graft_stream_rc_ckpt_")
    val sink = new ManifestUpsertSink(root, "id", buckets = 2)
    sink.upsertBatch(Seq((1L, "a", 1L)).toDF("id", "p", "seq"), "seq", 0L)

    val got = mutable.Buffer[Seq[Any]]()
    val q = drainTo(spark.readStream.format("graft-manifest").load(root)
      .select("id"), ckpt, got)
    try {
      q.processAllAvailable()
      // rename DDL, a merge under the NEW name, then a compaction that
      // MATERIALIZES the mapping (renames == Nil again): an
      // endpoint-only guard would compare Nil == Nil and silently parse
      // the renamed images as null — the walk must still refuse
      sink.renameColumn(spark, "p", "payload")
      sink.upsertBatch(Seq((2L, "b", 2L)).toDF("id", "payload", "seq"), "seq", 1L)
      sink.compact(spark)
      val e = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
        q.processAllAvailable()
        q.awaitTermination(10000)
      }
      val msg = e.getMessage + Option(e.getCause).map(_.getMessage).getOrElse("")
      assert(msg.contains("rename"))
    } finally q.stop()

    // a RESTARTED stream (schema re-pinned under the new names) sails
    // straight through the same window, and a materializing compaction
    // alone never trips the guard
    val got2 = mutable.Buffer[Seq[Any]]()
    val ckpt2 = tmp("graft_stream_rc_ckpt2_")
    val q2 = drainTo(spark.readStream.format("graft-manifest")
      .option("startingVersion", "1").load(root)
      .select("id", "payload"), ckpt2, got2)
    try {
      q2.processAllAvailable()
      assert(got2.synchronized(got2.toSet).contains(Seq(2L, "b")),
        "post-restart, the re-pinned schema parses the post-rename images")
      val sink2 = new ManifestUpsertSink(root, "id", buckets = 2)
      sink2.compact(spark) // plain maintenance mid-stream: mapping already Nil
      sink2.upsertBatch(Seq((3L, "c", 3L)).toDF("id", "payload", "seq"), "seq", 2L)
      q2.processAllAvailable()
      assert(got2.synchronized(got2.toSet).contains(Seq(3L, "c")))
    } finally q2.stop()
  }

  test("a restart whose backlog spans a rename refuses; a mid-stream re-key refuses") {
    import spark.implicits._
    val root = tmp("graft_stream_span_")
    val ckpt = tmp("graft_stream_span_ckpt_")
    val sink = new ManifestUpsertSink(root, "id", buckets = 2)
    sink.upsertBatch(Seq((1L, "a", 1L)).toDF("id", "p", "seq"), "seq", 0L)
    // drain to v0, then stop
    val got = mutable.Buffer[Seq[Any]]()
    val q = drainTo(spark.readStream.format("graft-manifest")
      .option("changes", "true").load(root).select("id"), ckpt, got)
    try q.processAllAvailable() finally q.stop()

    // while down: a pre-rename merge, the rename, a post-rename merge,
    // and a compaction that MATERIALIZES the mapping — the hazard is the
    // BACKLOG of change-feed images spanning the rename, which no live
    // mapping can heal (images are canonical JSON by name)
    sink.upsertBatch(Seq((2L, "b", 2L)).toDF("id", "p", "seq"), "seq", 1L)
    sink.renameColumn(spark, "p", "payload")
    sink.upsertBatch(Seq((3L, "c", 3L)).toDF("id", "payload", "seq"), "seq", 2L)
    sink.compact(spark)

    // restart: the re-pinned schema names 'payload', but the backlog
    // holds v1 images that only know 'p' — refusing beats silent nulls
    val got2 = mutable.Buffer[Seq[Any]]()
    val q2 = drainTo(spark.readStream.format("graft-manifest")
      .option("changes", "true").load(root).select("id"), ckpt, got2)
    try {
      val e = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
        q2.processAllAvailable()
        q2.awaitTermination(10000)
      }
      val msg = e.getMessage + Option(e.getCause).map(_.getMessage).getOrElse("")
      assert(msg.contains("rename"), s"must refuse the spanning backlog: $msg")
    } finally q2.stop()

    // a RE-KEY mid-stream (recluster to a new key column) also refuses —
    // later feeds name their key column differently
    val root2 = tmp("graft_stream_rekey_")
    val sink2 = new ManifestUpsertSink(root2, "id", buckets = 2)
    sink2.upsertBatch(Seq((1L, 7L, "a", 1L)).toDF("id", "user", "p", "seq"), "seq", 0L)
    val got3 = mutable.Buffer[Seq[Any]]()
    val q3 = drainTo(spark.readStream.format("graft-manifest")
      .option("changes", "true").load(root2).select("id"),
      tmp("graft_stream_rekey_ckpt_"), got3)
    try {
      q3.processAllAvailable()
      val next = sink2.recluster(spark, "user", 4)
      next.upsertBatch(Seq((2L, 8L, "b", 2L)).toDF("id", "user", "p", "seq"), "seq", 1L)
      val e = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
        q3.processAllAvailable()
        q3.awaitTermination(10000)
      }
      val msg = e.getMessage + Option(e.getCause).map(_.getMessage).getOrElse("")
      assert(msg.contains("re-keyed"), s"must refuse the mid-stream re-key: $msg")
    } finally q3.stop()
  }

  test("a fully-deleted table still pins a schema, streams, and restarts") {
    import spark.implicits._
    val root = tmp("graft_stream_empty_")
    val ckpt = tmp("graft_stream_empty_ckpt_")
    val sink = new ManifestUpsertSink(root, "id", buckets = 2)
    sink.upsertBatch(Seq((1L, "a", 1L), (2L, "b", 1L)).toDF("id", "p", "seq"), "seq", 0L)
    sink.deleteKeys(Seq(1L, 2L).toDF("id"), 1L) // snapshot now lists ZERO files

    // a FRESH changes stream on the drained table: schema anchors on the
    // newest version that still lists files (deletes don't change schema)
    val got = mutable.Buffer[Seq[Any]]()
    val q = drainTo(spark.readStream.format("graft-manifest")
      .option("changes", "true").load(root).select("id", "change"), ckpt, got)
    try {
      q.processAllAvailable()
      assert(got.synchronized(got.toSet) == Set(
        Seq(1L, "inserted"), Seq(2L, "inserted"),
        Seq(1L, "deleted"), Seq(2L, "deleted")))
    } finally q.stop()

    // restart from the checkpoint while still empty, then refill live
    val got2 = mutable.Buffer[Seq[Any]]()
    val q2 = drainTo(spark.readStream.format("graft-manifest")
      .option("changes", "true").load(root).select("id", "change"), ckpt, got2)
    try {
      q2.processAllAvailable()
      assert(got2.synchronized(got2.isEmpty), "nothing new since the checkpoint")
      sink.upsertBatch(Seq((3L, "c", 2L)).toDF("id", "p", "seq"), "seq", 2L)
      q2.processAllAvailable()
      assert(got2.synchronized(got2.toSet) == Set(Seq(3L, "inserted")))
    } finally q2.stop()

    // the table-follow snapshot of a drained table is an EMPTY batch 0
    val got3 = mutable.Buffer[Seq[Any]]()
    val root2 = {
      val r = tmp("graft_stream_empty2_")
      val s = new ManifestUpsertSink(r, "id", buckets = 2)
      s.upsertBatch(Seq((9L, "z", 1L)).toDF("id", "p", "seq"), "seq", 0L)
      s.deleteKeys(Seq(9L).toDF("id"), 1L)
      r
    }
    val q3 = drainTo(spark.readStream.format("graft-manifest").load(root2)
      .select("id"), tmp("graft_stream_empty_ckpt3_"), got3)
    try {
      q3.processAllAvailable()
      assert(got3.synchronized(got3.isEmpty), "empty snapshot, not an error")
    } finally q3.stop()
  }

  test("startingVersion skips the snapshot; mid-stream rename fails loudly") {
    import spark.implicits._
    val root = tmp("graft_stream_sv_")
    val ckpt = tmp("graft_stream_sv_ckpt_")
    val sink = new ManifestUpsertSink(root, "id", buckets = 4)
    sink.upsertBatch(Seq((1L, "a", 1L)).toDF("id", "p", "seq"), "seq", 0L)
    sink.upsertBatch(Seq((2L, "b", 2L)).toDF("id", "p", "seq"), "seq", 1L)

    val got = mutable.Buffer[Seq[Any]]()
    val q = drainTo(spark.readStream.format("graft-manifest")
      .option("startingVersion", "1").load(root).select("id"), ckpt, got)
    try {
      q.processAllAvailable()
      assert(got.synchronized(got.toSeq) == Seq(Seq(2L)),
        "startingVersion=1 reads version 1's images only — no snapshot, no v0")

      // a rename DDL mid-stream re-names the fields inside later images:
      // the source must refuse rather than parse nulls
      sink.renameColumn(spark, "p", "payload")
      sink.upsertBatch(Seq((3L, "c", 3L)).toDF("id", "payload", "seq"), "seq", 2L)
      val e = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
        q.processAllAvailable()
        q.awaitTermination(10000)
      }
      assert(e.getMessage.contains("rename") || e.getCause.getMessage.contains("rename"))
    } finally q.stop()
  }

  test("mid-stream ADD COLUMN is additive-safe: the stream keeps running; DROP fail-stops") {
    import spark.implicits._
    val root = tmp("graft_stream_add_")
    val ckpt = tmp("graft_stream_add_ckpt_")
    val sink = new ManifestUpsertSink(root, "id", buckets = 2)
    sink.upsertBatch(Seq((1L, "a", 9L, 1L)).toDF("id", "p", "junk", "seq"), "seq", 0L)

    val got = mutable.Buffer[Seq[Any]]()
    val q = drainTo(spark.readStream.format("graft-manifest").load(root)
      .select("id", "p"), ckpt, got)
    try {
      q.processAllAvailable()
      // ADD COLUMN mid-stream, then merges with AND without the new
      // column: the pinned projection is stable (the unknown column is
      // projected away) — a live stream must not die for an additive DDL
      sink.addColumn(spark, "score", "double")
      sink.upsertBatch(Seq((2L, "b", 8L, 0.5, 2L))
        .toDF("id", "p", "junk", "score", "seq"), "seq", 1L)
      sink.upsertBatch(Seq((3L, "c", 7L, 3L)).toDF("id", "p", "junk", "seq"), "seq", 2L)
      q.processAllAvailable()
      assert(got.synchronized(got.toSet).map(_.head) == Set(1L, 2L, 3L),
        "the stream must keep draining across an ADD COLUMN")

      // DROP COLUMN mid-stream: the pinned schema still names `junk`,
      // and post-drop batches would silently null it — fail-stop
      sink.dropColumn(spark, "junk")
      sink.upsertBatch(Seq((4L, "d", 4L)).toDF("id", "p", "seq"), "seq", 3L)
      val e = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
        q.processAllAvailable()
        q.awaitTermination(10000)
      }
      val msg = e.getMessage + Option(e.getCause).map(_.getMessage).getOrElse("")
      assert(msg.contains("rename/drop"), s"must refuse the mid-stream drop: $msg")
    } finally q.stop()

    // a fresh stream re-pins: the new schema (score in, junk out)
    // serves the whole snapshot, mixed vintages included
    val got2 = mutable.Buffer[Seq[Any]]()
    val q2 = drainTo(spark.readStream.format("graft-manifest").load(root)
      .select("id", "score"), tmp("graft_stream_add_ckpt2_"), got2)
    try {
      q2.processAllAvailable()
      assert(got2.synchronized(got2.toSet).contains(Seq(4L, null)),
        "post-restart the re-pinned schema serves the post-drop tail")
      assert(got2.synchronized(got2.toSet).contains(Seq(2L, 0.5)),
        "the re-pinned schema reads the physically-carried added column")
    } finally q2.stop()
  }

  test("mid-stream type widening fail-stops: the pinned cast would silently overflow") {
    import spark.implicits._
    val root = tmp("graft_stream_widen_")
    val sink = new ManifestUpsertSink(root, "id", buckets = 2)
    sink.upsertBatch(Seq((1L, 10, 1L)).toDF("id", "n", "seq"), "seq", 0L)
    val got = mutable.Buffer[Seq[Any]]()
    val q = drainTo(spark.readStream.format("graft-manifest").load(root)
      .select("id", "n"), tmp("graft_stream_widen_ckpt_"), got)
    try {
      q.processAllAvailable()
      sink.widenColumn(spark, "n", "bigint")
      sink.upsertBatch(Seq((2L, Int.MaxValue.toLong + 9L, 2L))
        .toDF("id", "n", "seq"), "seq", 1L)
      val e = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
        q.processAllAvailable()
        q.awaitTermination(10000)
      }
      val msg = e.getMessage + Option(e.getCause).map(_.getMessage).getOrElse("")
      assert(msg.contains("widen"), s"must refuse the mid-stream widening: $msg")
    } finally q.stop()

    // a fresh stream re-pins wide and reads both vintages
    val got2 = mutable.Buffer[Seq[Any]]()
    val q2 = drainTo(spark.readStream.format("graft-manifest").load(root)
      .select("id", "n"), tmp("graft_stream_widen_ckpt2_"), got2)
    try {
      q2.processAllAvailable()
      assert(got2.synchronized(got2.toSet) ==
        Set(Seq(1L, 10L), Seq(2L, Int.MaxValue.toLong + 9L)),
        "the re-pinned wide schema promotes the old vintage and reads the new")
    } finally q2.stop()
  }

  /** Strip the `schema=` stamp header from one committed manifest —
    * simulates a commit whose written schema conflicted unresolvably
    * with the stamp (unionPhysSchema drops the stamp rather than guess),
    * and legacy pre-stamp vintages. */
  private def stripStamp(root: String, version: Long): Unit = {
    val p = java.nio.file.Paths.get(root, "_manifest", s"v$version.manifest")
    val kept = java.nio.file.Files.readAllLines(p).asScala
      .filterNot(_.startsWith("schema=")).asJava
    java.nio.file.Files.write(p, kept)
  }

  test("post-pin stamp LOSS fail-stops: an unstamped successor of a stamped pin is drift") {
    import spark.implicits._
    val root = tmp("graft_stream_stamploss_")
    val sink = new ManifestUpsertSink(root, "id", buckets = 2)
    sink.upsertBatch(Seq((1L, "a", 1L)).toDF("id", "p", "seq"), "seq", 0L)
    // pin a source at stamped v0, then commit v1 and strip its stamp — a
    // post-pin commit that LOST the stamp (unresolvable re-type through
    // Union coercion drops it). The type-drift guard sees an empty type
    // map for it, so the LOSS itself must be the signal; the pinned
    // from_json projection would otherwise parse re-typed values as
    // silent nulls.
    val pinned = new graft.sources.ManifestStreamSource(spark.sqlContext, root,
      changesMode = false, startingVersion = None, maxVersionsPerTrigger = None,
      graft.sources.ManifestStreamSource.resolveSchema(spark.sqlContext, root, false))
    sink.upsertBatch(Seq((2L, "b", 2L)).toDF("id", "p", "seq"), "seq", 1L)
    stripStamp(root, 1L)
    val e = intercept[IllegalStateException] { pinned.changesBetween(1L, 1L).collect() }
    assert(e.getMessage.contains("stamp"), e.getMessage)

    // vintage carve-out: a source PINNED on an unstamped table (legacy
    // pre-stamp vintage) keeps tailing unstamped commits — its commits
    // were never stamped to begin with, nothing was "lost"
    stripStamp(root, 0L)
    val legacyPin = new graft.sources.ManifestStreamSource(spark.sqlContext, root,
      changesMode = false, startingVersion = None, maxVersionsPerTrigger = None,
      graft.sources.ManifestStreamSource.resolveSchema(spark.sqlContext, root, false))
    sink.upsertBatch(Seq((3L, "c", 3L)).toDF("id", "p", "seq"), "seq", 2L)
    stripStamp(root, 2L)
    assert(legacyPin.changesBetween(2L, 2L).select("id", "p")
      .as[(Long, String)].collect().toSeq == Seq((3L, "c")),
      "an unstamped-pin stream tails unstamped commits without spurious fail-stops")
  }

  test("WAP end-to-end: a LIVE main CDC tail sees nothing while staged, everything on publish") {
    import spark.implicits._
    val root = tmp("graft_stream_wap_")
    val ckpt = tmp("graft_stream_wap_ckpt_")
    val sink = new ManifestUpsertSink(root, "id", buckets = 4)
    sink.upsertBatch(Seq((1L, "a", 1L), (2L, "b", 1L)).toDF("id", "p", "seq"), "seq", 0L)

    val got = mutable.Buffer[Seq[Any]]()
    val q = drainTo(spark.readStream.format("graft-manifest")
      .option("changes", "true").load(root)
      .select("id", "change", "_version"), ckpt, got)
    try {
      q.processAllAvailable()
      assert(got.synchronized(got.toSet) ==
        Set(Seq(1L, "inserted", 0L), Seq(2L, "inserted", 0L)))
      // STAGE on a branch — the live tail on main must see NOTHING: the
      // whole point of write-audit-publish is that unaudited commits are
      // invisible to every downstream consumer, CDC mirrors included
      val bSink = sink.createBranch("wap")
      bSink.upsertBatch(Seq((3L, "c", 2L)).toDF("id", "p", "seq"), "seq", 1L)
      bSink.deleteKeys(Seq(1L).toDF("id"), 2L)
      q.processAllAvailable()
      assert(got.synchronized(got.size) == 2,
        "staged branch commits must be invisible to main's live tail")
      // PUBLISH — the SAME live tail (no restart, same checkpoint)
      // advances through the adopted versions with their verbs intact,
      // because fast_forward replays commits + feeds rather than
      // squashing into a feed-less version the tail would skip
      sink.fastForwardFrom("wap")
      q.processAllAvailable()
      assert(got.synchronized(got.toSet) == Set(
        Seq(1L, "inserted", 0L), Seq(2L, "inserted", 0L),
        Seq(3L, "inserted", 1L), Seq(1L, "deleted", 2L)),
        s"publish must replay through the live tail: ${got.synchronized(got.toSet)}")
    } finally q.stop()
  }
}
