package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.sinks.ManifestUpsertSink

/** MERGE-ON-READ deletion vectors: a DELETE commits a tiny per-bucket
  * key-list sidecar (manifest edit + small parquet) instead of
  * rewriting the touched buckets — data files stay BYTE-IDENTICAL.
  * Every read surface folds the sidecar; rewrites (merge, compaction,
  * CoW delete) materialize and clear it; the per-bucket cap routes
  * bulk deletes back to copy-on-write. */
class ManifestDvSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def tmp(prefix: String): String =
    Files.createTempDirectory(prefix).toString

  private def seed(root: String, n: Int = 40, buckets: Int = 4): ManifestUpsertSink = {
    import spark.implicits._
    val sink = new ManifestUpsertSink(root, "id", buckets)
    sink.upsertBatch((1 to n).map(i => (i.toLong, s"p$i", 1L))
      .toDF("id", "p", "seq"), "seq", 0L)
    sink
  }

  private def fileBytes(paths: Seq[String]): Map[String, Long] =
    paths.map(p => p -> Files.size(Paths.get(p))).toMap

  test("MoR delete: data files byte-identical, manifest edit + dv sidecar only; reads fold") {
    import spark.implicits._
    val root = tmp("graft_dv_basic_")
    val sink = seed(root)
    val v0 = ManifestUpsertSink.latestManifest(root).get
    val bytesBefore = fileBytes(v0.files.map(_.path))

    sink.deleteKeysMergeOnRead(Seq(7L, 13L).toDF("id"), 1L)

    val v1 = ManifestUpsertSink.latestManifest(root).get
    assert(v1.version == v0.version + 1)
    // THE pin: the snapshot's data files are the SAME paths with the
    // SAME bytes — the delete wrote no data file
    assert(v1.files.map(_.path).toSet == v0.files.map(_.path).toSet,
      "a merge-on-read delete must not rewrite any data file")
    assert(fileBytes(v1.files.map(_.path)) == bytesBefore,
      "data files must stay byte-identical")
    assert(v1.dvs.nonEmpty && v1.dvs.map(_.rows).sum == 2L,
      s"the dv sidecar holds exactly the two deleted keys, got ${v1.dvs}")

    // Scala read folds
    val ids = sink.read(spark).select("id").as[Long].collect().toSet
    assert(!ids.contains(7L) && !ids.contains(13L) && ids.size == 38)
    // time travel: the pre-delete version still shows them
    assert(ManifestUpsertSink.readVersion(spark, root, v0.version).count() == 40)
    // CDC feed: two deleted rows with before images
    val feed = ManifestUpsertSink.readChanges(spark, root, v1.version)
    assert(feed.filter(col("change") === "deleted").count() == 2)
    assert(feed.filter(col("old_image").isNull).count() == 0)

    // DSv2 scan folds — with the key projected away (the fold fetches it
    // back internally) and with a pushed filter
    val sql = spark.read.format("graft-manifest").load(root)
    assert(sql.count() == 38)
    assert(sql.select("p").as[String].collect().toSet ==
      (1 to 40).filterNot(i => i == 7 || i == 13).map(i => s"p$i").toSet,
      "a key-pruned projection still folds the dv")
    assert(sql.filter(col("id") === 7L).count() == 0,
      "a point lookup of a dv-deleted key reads empty")
    assert(sql.filter(col("id") === 8L).count() == 1)
  }

  test("re-delete and absent-key delete are clean no-ops; zero-victim statements commit nothing") {
    import spark.implicits._
    val root = tmp("graft_dv_noop_")
    val sink = seed(root)
    sink.deleteKeysMergeOnRead(Seq(5L).toDF("id"), 1L)
    val v1 = ManifestUpsertSink.latestManifest(root).get
    // re-deleting a dv-deleted key: it is absent from `current`, so the
    // statement has zero victims and must not create a version (nor a
    // second dv entry for the key — the sidecar arithmetic stays exact)
    sink.deleteKeysMergeOnRead(Seq(5L).toDF("id"), 2L)
    sink.deleteKeysMergeOnRead(Seq(99999L).toDF("id"), 3L)
    assert(ManifestUpsertSink.latestManifest(root).get.version == v1.version,
      "zero-victim deletes must not commit")
    assert(ManifestUpsertSink.latestManifest(root).get.dvs.map(_.rows).sum == 1L)
  }

  test("a merge into a dv'd bucket materializes its dvs; compaction clears them all") {
    import spark.implicits._
    val root = tmp("graft_dv_mat_")
    val sink = seed(root)
    sink.deleteKeysMergeOnRead((1 to 10).map(_.toLong).toDF("id"), 1L)
    val v1 = ManifestUpsertSink.latestManifest(root).get
    assert(v1.dvs.map(_.rows).sum == 10L)
    // merge a batch touching SOME buckets: those buckets rewrite with the
    // dv folded (deleted keys stay gone, no dv entry remains for them)
    sink.upsertBatch(Seq((2L, "back", 2L)).toDF("id", "p", "seq"), "seq", 2L)
    val v2 = ManifestUpsertSink.latestManifest(root).get
    val touchedBucket = v2.touched.get
    assert(v2.dvs.forall(d => !touchedBucket(d.bucket)),
      "a rewritten bucket's dv entries must clear (materialized)")
    val ids2 = sink.read(spark).select("id").as[Long].collect().toSet
    assert(ids2.contains(2L), "the re-inserted key is back")
    assert((1 to 10).filterNot(_ == 2).forall(i => !ids2.contains(i.toLong)),
      "other deleted keys stay deleted across the partial materialization")
    // full compaction: all dvs materialize, rows unchanged
    sink.compact(spark)
    val v3 = ManifestUpsertSink.latestManifest(root).get
    assert(v3.dvs.isEmpty, "compact() materializes every deletion vector")
    assert(sink.read(spark).select("id").as[Long].collect().toSet == ids2)
  }

  test("metadata-only COUNT(*) subtracts dv rows and stays a LocalTableScan; MIN/MAX falls back") {
    import spark.implicits._
    val root = tmp("graft_dv_count_")
    val sink = seed(root, n = 30)
    sink.deleteKeysMergeOnRead(Seq(1L, 2L, 3L).toDF("id"), 1L)
    val df = spark.read.format("graft-manifest").load(root).agg(count(lit(1)).as("n"))
    assert(df.queryExecution.executedPlan.toString.contains("LocalTableScan"),
      s"COUNT(*) must stay sidecar-answered under dvs:\n${df.queryExecution.executedPlan}")
    assert(df.as[Long].head() == 27L)
    // MIN over a dv'd snapshot cannot trust the sidecar (the min row may
    // be deleted) — it must fall back to a real scan and still be right
    val mn = spark.read.format("graft-manifest").load(root).agg(min(col("id")))
    assert(!mn.queryExecution.executedPlan.toString.contains("LocalTableScan"))
    assert(mn.as[Long].head() == 4L)
  }

  test("per-bucket cap routes bulk deletes to copy-on-write, which materializes the backlog") {
    import spark.implicits._
    val root = tmp("graft_dv_cap_")
    val sink = seed(root, n = 100)
    sink.deleteKeysMergeOnRead(Seq(1L).toDF("id"), 1L)
    assert(ManifestUpsertSink.latestManifest(root).get.dvs.nonEmpty)
    // a delete that would push some bucket past the cap: the WHOLE
    // statement becomes a CoW delete — files rewrite, dvs clear
    sink.deleteKeysMergeOnRead((2 to 60).map(_.toLong).toDF("id"), 2L,
      maxDvRowsPerBucket = 4L)
    val v = ManifestUpsertSink.latestManifest(root).get
    assert(v.dvs.forall(d => !v.touched.get(d.bucket)),
      "rewritten buckets carry no dv entries after the CoW fallback")
    assert(sink.read(spark).count() == 40L)
    assert(sink.read(spark).select("id").as[Long].collect().toSet ==
      (61 to 100).map(_.toLong).toSet)
  }

  test("restore across dv versions: each side folds its own dvs; resurrect and re-kill") {
    import spark.implicits._
    val root = tmp("graft_dv_restore_")
    val sink = seed(root, n = 20)
    sink.deleteKeysMergeOnRead(Seq(4L, 5L).toDF("id"), 1L) // v1
    val restored = sink.restore(spark, 0L) // v2 == v0's rows
    assert(restored.read(spark).count() == 20, "restore resurrects dv-deleted rows")
    // the restore feed records the two resurrections as inserts
    val feed = ManifestUpsertSink.readChanges(spark, root, 2L)
    assert(feed.filter(col("change") === "inserted").count() == 2)
    val back = restored.restore(spark, 1L) // v3 == v1: dvs live again
    assert(back.read(spark).count() == 18, "restoring a dv version re-applies its dvs")
    assert(ManifestUpsertSink.latestManifest(root).get.dvs.map(_.rows).sum == 2L)
  }

  test("vacuum keeps dv sidecars of held versions, reclaims dropped ones, and dv'd reads survive") {
    import spark.implicits._
    val root = tmp("graft_dv_vacuum_")
    val sink = seed(root, n = 20)
    sink.deleteKeysMergeOnRead(Seq(3L).toDF("id"), 1L) // v1: dv
    sink.compact(spark) // v2: materialized
    val dvPath = {
      val v1 = ManifestUpsertSink.manifestAt(root, 1L).get
      v1.dvs.head.path
    }
    assert(Files.exists(Paths.get(dvPath)))
    sink.vacuum(keepVersions = 2) // v1 held: its dv file must survive
    assert(Files.exists(Paths.get(dvPath)),
      "a held version's dv sidecar must survive vacuum")
    assert(ManifestUpsertSink.readVersion(spark, root, 1L).count() == 19)
    sink.vacuum(keepVersions = 1) // v1 dropped: dv file reclaimed
    assert(!Files.exists(Paths.get(dvPath)),
      "a dropped version's dv sidecar is reclaimed")
    assert(sink.read(spark).count() == 19)
  }

  test("streaming across a dv delete: changes mode carries the deletion; snapshot folds dvs") {
    import spark.implicits._
    val root = tmp("graft_dv_stream_")
    val sink = seed(root, n = 10)
    sink.deleteKeysMergeOnRead(Seq(6L).toDF("id"), 1L)
    // a NEW stream's batch-0 snapshot is the dv-folded table
    val snap = new graft.sources.ManifestStreamSource(spark.sqlContext, root,
      changesMode = false, startingVersion = None, maxVersionsPerTrigger = None,
      graft.sources.ManifestStreamSource.resolveSchema(spark.sqlContext, root, false))
    // the dv commit's window carries the standard deleted feed row, so a
    // changes-mode subscriber sees the retraction like any CoW delete
    val changes = new graft.sources.ManifestStreamSource(spark.sqlContext, root,
      changesMode = true, startingVersion = Some(0L), maxVersionsPerTrigger = None,
      graft.sources.ManifestStreamSource.resolveSchema(spark.sqlContext, root, true))
    val rows = changes.changesBetween(1L, 1L)
      .select("id", "change").as[(Long, String)].collect().toSeq
    assert(rows == Seq((6L, "deleted")),
      s"the dv commit must stream as a standard deletion, got $rows")
    val snapIds = ManifestUpsertSink.readVersion(spark, root,
      ManifestUpsertSink.latestManifest(root).get.version)
      .select("id").as[Long].collect().toSet
    assert(!snapIds.contains(6L) && snapIds.size == 9)
    assert(snap.schema.fieldNames.contains("id"))
  }

  test("streaming across a MoR upsert: changes mode carries inserted/updated; snapshot folds the stack") {
    import spark.implicits._
    val root = tmp("graft_dv_stream_ups_")
    val sink = seed(root, n = 10) // v0
    sink.upsertMergeOnRead(Seq((3L, "u3", 2L), (101L, "n101", 2L))
      .toDF("id", "p", "seq"), "seq", 1L) // v1: 1 update + 1 insert
    val changes = new graft.sources.ManifestStreamSource(spark.sqlContext, root,
      changesMode = true, startingVersion = Some(0L), maxVersionsPerTrigger = None,
      graft.sources.ManifestStreamSource.resolveSchema(spark.sqlContext, root, true))
    val rows = changes.changesBetween(1L, 1L)
      .select("id", "change").as[(Long, String)].collect().toSet
    assert(rows == Set((3L, "updated"), (101L, "inserted")),
      s"the MoR upsert commit must stream standard upsert rows, got $rows")
    val snap = ManifestUpsertSink.readVersion(spark, root,
      ManifestUpsertSink.latestManifest(root).get.version)
      .select("id", "p").as[(Long, String)].collect().toMap
    assert(snap.size == 11 && snap(3L) == "u3" && snap(101L) == "n101")
  }

  test("MoR verbs on a SHALLOW CLONE: carried sequences stay monotone under the clone's commits") {
    import spark.implicits._
    val srcRoot = tmp("graft_dv_clone_mor_s_")
    val clRoot = tmp("graft_dv_clone_mor_c_")
    val sink = seed(srcRoot, n = 20) // v0
    // build HIGH carried sequences: two stacked MoR upserts on key 7
    sink.upsertMergeOnRead(Seq((7L, "u7", 2L)).toDF("id", "p", "seq"), "seq", 1L)  // v1
    sink.upsertMergeOnRead(Seq((7L, "u7b", 3L)).toDF("id", "p", "seq"), "seq", 2L) // v2
    val clone = sink.cloneTo(spark, clRoot)
    // the clone BEGINS at the source's version (not 0): its next commits'
    // sequences must exceed every carried file/dv sequence, or a clone-
    // side dv at seq 1 would silently fail to mask the carried seq-2
    // replacement file — the resurrection bug this pins
    assert(ManifestUpsertSink.latestManifest(clRoot).get.version == 2L,
      "a shallow clone forks AT the source's version to keep sequences monotone")
    // MoR DELETE of the twice-upserted key ON THE CLONE
    val clSink = new ManifestUpsertSink(clRoot, "id", 4)
    clSink.deleteKeysMergeOnRead(Seq(7L).toDF("id"), 10L)
    assert(clSink.read(spark).filter(col("id") === 7L).count() == 0,
      "the clone's dv must mask every carried instance, including the newest")
    assert(spark.read.format("graft-manifest").load(clRoot)
      .filter(col("id") === 7L).count() == 0)
    // MoR UPSERT of another carried key ON THE CLONE
    clSink.upsertMergeOnRead(Seq((9L, "c9", 9L)).toDF("id", "p", "seq"), "seq", 11L)
    val got = clSink.read(spark).select("id", "p").as[(Long, String)].collect().toMap
    assert(got.size == 19 && got(9L) == "c9" && !got.contains(7L), s"$got")
    assert(spark.read.format("graft-manifest").load(clRoot).count() == 19)
    // the SOURCE is untouched by all of it
    assert(sink.read(spark).filter(col("id") === 7L)
      .select("p").as[String].head() == "u7b")
  }

  test("deletion vectors on a COMPOSITE key: tuple identity; pruned projections still fold") {
    import spark.implicits._
    val root = tmp("graft_dv_comp_")
    val sink = new ManifestUpsertSink(root, "tenant,entity", buckets = 4)
    val rows = (1 to 20).map(i => ((i % 3).toLong, i.toLong, s"p$i", 1L))
      .toDF("tenant", "entity", "p", "seq")
    sink.upsertBatch(rows, "seq", 0L)
    // delete two TUPLES: (1, 4) and (2, 5) — entity 4 under tenant 2
    // must survive (tuple identity, the single-key trap)
    sink.deleteKeysMergeOnRead(Seq((1L, 4L), (2L, 5L)).toDF("tenant", "entity"), 1L)
    val m = ManifestUpsertSink.latestManifest(root).get
    assert(m.dvs.map(_.rows).sum == 2L)
    assert(sink.read(spark).count() == 18)
    val sql = spark.read.format("graft-manifest").load(root)
    // a projection keeping NEITHER key component: the fold scan fetches
    // both back internally, filters, projects them away
    assert(sql.select("p").as[String].collect().toSet ==
      (1 to 20).filterNot(i => i == 4 || i == 5).map(i => s"p$i").toSet)
    assert(sql.filter(col("tenant") === 1L && col("entity") === 4L).count() == 0)
    assert(sql.filter(col("tenant") === 2L && col("entity") === 4L).count() == 0,
      "(2,4) was never inserted") // i%3: entity 4 -> tenant 1 only
    assert(sql.filter(col("entity") === 4L).count() == 0)
    assert(sql.filter(col("entity") === 5L).count() == 0)
    assert(sql.filter(col("entity") === 6L).count() == 1)
  }

  test("deletion vectors survive a column rename: old-name dv files fold onto the new key") {
    import spark.implicits._
    val root = tmp("graft_dv_ren_")
    var sink = seed(root, n = 12)
    sink.deleteKeysMergeOnRead(Seq(3L, 7L).toDF("id"), 1L)
    // rename a NON-key column while dvs live: dv files carry only keys
    sink.renameColumn(spark, "p", "payload")
    assert(sink.read(spark).columns.contains("payload"))
    assert(sink.read(spark).count() == 10)
    // rename the KEY column: dv files still spell the OLD name — the
    // rename fold maps them onto the new key exactly as it maps data
    sink = sink.renameColumn(spark, "id", "key")
    assert(sink.read(spark).select("key").as[Long].collect().toSet ==
      (1 to 12).map(_.toLong).toSet -- Set(3L, 7L),
      "old-name dv sidecars keep deleting through the rename fold")
    val sql = spark.read.format("graft-manifest").load(root)
    assert(sql.count() == 10 && sql.filter(col("key") === 3L).count() == 0)
    // and post-rename dv deletes spell the new name; both vintages fold
    sink.deleteKeysMergeOnRead(Seq(8L).toDF("key"), 2L)
    assert(sink.read(spark).count() == 9)
    assert(spark.read.format("graft-manifest").load(root).count() == 9)
  }

  test("deletion vectors on a date-partitioned table: manifest edit only, partition pruning intact") {
    import spark.implicits._
    val root = tmp("graft_dv_part_")
    val sink = new ManifestUpsertSink(root, "id", buckets = 2,
      partitionCol = Some("d"))
    val rows = (1 to 20).map(i =>
      (i.toLong, java.sql.Date.valueOf(if (i <= 10) "2024-01-01" else "2024-02-01"), 1L))
      .toDF("id", "d", "seq")
    sink.upsertBatch(rows, "seq", 0L)
    val before = ManifestUpsertSink.latestManifest(root).get.files.map(_.path).toSet
    sink.deleteKeysMergeOnRead(Seq(2L, 12L).toDF("id"), 1L)
    val m = ManifestUpsertSink.latestManifest(root).get
    assert(m.files.map(_.path).toSet == before, "partitioned files untouched")
    assert(sink.read(spark).count() == 18)
    val jan = spark.read.format("graft-manifest").load(root)
      .filter(col("d") === java.sql.Date.valueOf("2024-01-01"))
    assert(jan.count() == 9)
    // retention composes: dropping January leaves February's dv live —
    // but key 2's dv now references ZERO files, so the dv row counts
    // over-estimate and the commit flags them INEXACT: the metadata-only
    // COUNT declines (a sidecar-minus-dv answer would read 8, one short)
    // and the folding scan answers the true 9
    sink.dropPartitionsBefore(spark, "2024-02-01")
    assert(ManifestUpsertSink.latestManifest(root).get.dvInexact,
      "expiring files under live dvs must flag the counts inexact")
    assert(sink.read(spark).count() == 9, "Feb rows minus the dv'd key 12")
    assert(spark.read.format("graft-manifest").load(root).count() == 9)
    // materialization clears the debt AND the flag
    sink.compact(spark)
    val m3 = ManifestUpsertSink.latestManifest(root).get
    assert(m3.dvs.isEmpty && !m3.dvInexact)
    assert(spark.read.format("graft-manifest").load(root).count() == 9)
  }

  test("a dv delete racing a disjoint-bucket merge REBASES: both effects land") {
    import spark.implicits._
    val root = tmp("graft_dv_race_")
    // keys 1 and 2 in different buckets of 4
    val k1 = 1L
    val b1 = graft.sinks.ManifestStats.bucketOf(k1, 4).get
    val k2 = (2L to 50L).find(k =>
      graft.sinks.ManifestStats.bucketOf(k, 4).get != b1).get
    val seedSink = new ManifestUpsertSink(root, "id", buckets = 4)
    seedSink.upsertBatch(Seq((k1, "a", 1L), (k2, "b", 1L)).toDF("id", "p", "seq"),
      "seq", 0L)
    // the loser: a MoR delete of k1 whose first commit attempt is
    // preempted by a merge into k2's bucket
    var fired = false
    val racedSink = new ManifestUpsertSink(root, "id", 4) {
      override protected def beforeCommit(attemptVersion: Long): Unit =
        if (!fired) {
          fired = true
          new ManifestUpsertSink(root, "id", 4).upsertBatch(
            Seq((k2, "b2", 2L)).toDF("id", "p", "seq"), "seq", 1L)
        }
    }
    racedSink.deleteKeysMergeOnRead(Seq(k1).toDF("id"), 2L)
    val got = ManifestUpsertSink.read(spark, root)
      .select("id", "p").as[(Long, String)].collect().toMap
    assert(got == Map(k2 -> "b2"),
      s"the rebased dv delete and the winning merge must both land: $got")
    assert(ManifestUpsertSink.latestManifest(root).get.dvs.map(_.rows).sum == 1L)
  }

  test("shallow clone of a dv'd table: the clone folds, evolves independently, holds dv files against source vacuum") {
    import spark.implicits._
    val srcRoot = tmp("graft_dv_clone_s_")
    val clRoot = tmp("graft_dv_clone_c_")
    val sink = seed(srcRoot, n = 20)
    sink.deleteKeysMergeOnRead(Seq(3L, 9L).toDF("id"), 1L)
    val dvPath = ManifestUpsertSink.latestManifest(srcRoot).get.dvs.head.path
    val clone = sink.cloneTo(spark, clRoot, deep = false)
    // the clone's v0 carries the dv entries: it reads the folded snapshot
    assert(clone.read(spark).count() == 18)
    assert(spark.read.format("graft-manifest").load(clRoot).count() == 18)
    // DSv2 time travel to the dv'd version reads its own dv state (while
    // the version is still retained)
    assert(spark.read.format("graft-manifest")
      .option("versionAsOf", 1).load(srcRoot).count() == 18,
      "versionAsOf a dv'd version folds that version's dvs through SQL")
    assert(spark.read.format("graft-manifest")
      .option("versionAsOf", 0).load(srcRoot).count() == 20)
    // the SOURCE compacts (materializes its dvs) and vacuums its history:
    // the dv file is only referenced by the CLONE now — the clone
    // registry must hold it, or the clone silently resurrects 2 rows
    sink.compact(spark)
    sink.vacuum(keepVersions = 1)
    assert(Files.exists(Paths.get(dvPath)),
      "a shallow clone's dv sidecar must survive the source's vacuum")
    assert(clone.read(spark).count() == 18,
      "the clone still folds its dv after the source moved on")
  }

  test("two loads of one dv'd snapshot plan EQUAL scans: exchange/scan reuse stays possible") {
    import spark.implicits._
    val root = tmp("graft_dv_eq_")
    val sink = seed(root, n = 20)
    sink.deleteKeysMergeOnRead(Seq(3L).toDF("id"), 1L)
    def scanOf(df: org.apache.spark.sql.DataFrame): Any =
      df.queryExecution.executedPlan.collectFirst {
        case b: org.apache.spark.sql.execution.datasources.v2.BatchScanExec => b.scan
      }.get
    val a = scanOf(spark.read.format("graft-manifest").load(root).select("id", "p"))
    val b = scanOf(spark.read.format("graft-manifest").load(root).select("id", "p"))
    assert(a == b && a.hashCode == b.hashCode,
      "independently-built fold scans of one snapshot must compare EQUAL — " +
        "reference equality silently disables exchange reuse for self-joins")
  }

  test("dvMaxRowsPerBucket table property: SQL DELETEs over the cap route to copy-on-write") {
    val root = tmp("graft_dv_capsql_")
    val cat = "graft_dvcap"
    spark.conf.set(s"spark.sql.catalog.$cat",
      classOf[graft.sources.ManifestCatalog].getName)
    spark.conf.set(s"spark.sql.catalog.$cat.root", root)
    spark.sql(s"""CREATE TABLE $cat.t (id BIGINT, p STRING, seq BIGINT)
      TBLPROPERTIES ('keyCol'='id', 'orderCol'='seq', 'buckets'='1',
        'mergeOnRead'='true', 'dvMaxRowsPerBucket'='2')""")
    spark.sql(s"INSERT INTO $cat.t SELECT id, concat('p', id), 0L FROM range(1, 21)")
    spark.sql(s"DELETE FROM $cat.t WHERE id IN (1, 2)") // at the cap: dv
    assert(ManifestUpsertSink.latestManifest(s"$root/t").get.dvs.map(_.rows).sum == 2L)
    spark.sql(s"DELETE FROM $cat.t WHERE id IN (3, 4)") // over: CoW materializes
    val m = ManifestUpsertSink.latestManifest(s"$root/t").get
    assert(m.dvs.isEmpty, "an over-cap DELETE routes to copy-on-write and clears the debt")
    assert(spark.sql(s"SELECT COUNT(*) FROM $cat.t").head().getLong(0) == 16L)
  }

  test("runtime filtering survives the fold scan: a dv'd fact still bucket-prunes from a join") {
    import spark.implicits._
    import graft.sources.ManifestSource.RuntimeFilterProbe
    val factRoot = tmp("graft_dv_rf_f_")
    val dimRoot = tmp("graft_dv_rf_d_")
    new ManifestUpsertSink(factRoot, "cust", buckets = 32).upsertBatch(
      (1L to 4000L).map(i => (i, i * 2.0, 0L)).toDF("cust", "v", "seq"),
      "seq", 0L)
    // dv-delete a slice: the fact now reads through the FOLD scan, which
    // must still accept the join-time IN-set and drop non-matching
    // buckets' files (a table mid-evolution must not lose DPP)
    new ManifestUpsertSink(factRoot, "cust", buckets = 32)
      .deleteKeysMergeOnRead(Seq(7L, 807L).toDF("cust"), 1L)
    new ManifestUpsertSink(dimRoot, "cust", buckets = 2).upsertBatch(
      (1L to 4000L).map(i => (i, i % 800, 0L)).toDF("cust", "seg", "seq"),
      "seq", 0L)
    val fact = spark.read.format("graft-manifest").load(factRoot)
    val dim = spark.read.format("graft-manifest").load(dimRoot).filter(col("seg") === 7)
    RuntimeFilterProbe.reset()
    val row = fact.join(dim, "cust").agg(count(lit(1)), sum("v")).head()
    val (_, before, after) = RuntimeFilterProbe.last.getOrElse(
      fail("no runtime filter reached the fold scan"))
    assert(after < before, s"join-time IN-set must prune ($after vs $before)")
    // keys ≡ 7 (mod 800): 7 and 807 are dv-deleted, 1607/2407/3207 live
    assert(row.getLong(0) == 3L && row.getDouble(1) == (1607L + 2407L + 3207L) * 2.0,
      s"the pruned fold still deletes dv'd keys: $row")
  }

  test("SQL lifecycle on a mergeOnRead table: DELETE is a manifest edit; UPDATE folds + clears") {
    val root = tmp("graft_dv_sql_")
    val cat = "graft_dvsql"
    spark.conf.set(s"spark.sql.catalog.$cat",
      classOf[graft.sources.ManifestCatalog].getName)
    spark.conf.set(s"spark.sql.catalog.$cat.root", root)
    spark.sql(s"""CREATE TABLE $cat.t (id BIGINT, p STRING, seq BIGINT)
      TBLPROPERTIES ('keyCol'='id', 'orderCol'='seq', 'buckets'='4',
        'mergeOnRead'='true')""")
    spark.sql(s"INSERT INTO $cat.t SELECT id, concat('p', id), 0L FROM range(1, 41)")
    val v0 = ManifestUpsertSink.latestManifest(s"$root/t").get
    spark.sql(s"DELETE FROM $cat.t WHERE id IN (7, 13)")
    val v1 = ManifestUpsertSink.latestManifest(s"$root/t").get
    assert(v1.files.map(_.path).toSet == v0.files.map(_.path).toSet,
      "SQL DELETE on a mergeOnRead table must not rewrite data files")
    assert(v1.dvs.map(_.rows).sum == 2L)
    assert(spark.sql(s"SELECT COUNT(*) FROM $cat.t").head().getLong(0) == 38L)
    assert(spark.sql(s"SELECT p FROM $cat.t WHERE id = 7").count() == 0)
    // a NON-key-predicate DELETE routes through the row-level rewrite —
    // on a mergeOnRead table its pure-delete verdicts ALSO commit as a
    // deletion vector: data files still byte-identical
    spark.sql(s"DELETE FROM $cat.t WHERE p = 'p21'")
    val v2 = ManifestUpsertSink.latestManifest(s"$root/t").get
    assert(v2.files.map(_.path).toSet == v0.files.map(_.path).toSet,
      "a predicate DELETE on a mergeOnRead table must not rewrite data files")
    assert(v2.dvs.map(_.rows).sum == 3L)
    assert(spark.sql(s"SELECT COUNT(*) FROM $cat.t").head().getLong(0) == 37L)
    // row-level UPDATE on a mergeOnRead table is MERGE-ON-READ too:
    // the new row images APPEND as new files, a sequence-stamped dv
    // retires the old rows, and every pre-update data file stays
    // byte-identical — trickle updates cost O(changed rows)
    val bytesBefore = v2.files.map(f => f.path -> Files.size(Paths.get(f.path))).toMap
    spark.sql(s"UPDATE $cat.t SET p = 'upd' WHERE id % 10 = 0")
    val v3 = ManifestUpsertSink.latestManifest(s"$root/t").get
    assert(v2.files.map(_.path).toSet.subsetOf(v3.files.map(_.path).toSet),
      "a MoR UPDATE appends — every prior data file is carried")
    assert(v2.files.map(_.path).forall(p => Files.size(Paths.get(p)) == bytesBefore(p)),
      "a MoR UPDATE must leave prior data files byte-identical")
    assert(v3.dvs.map(_.rows).sum == 7L,
      s"the UPDATE's dv lists its 4 replaced keys on top of the 3 deletes: ${v3.dvs}")
    assert(spark.sql(s"SELECT COUNT(*) FROM $cat.t WHERE p = 'upd'").head().getLong(0) == 4L)
    assert(spark.sql(s"SELECT COUNT(*) FROM $cat.t").head().getLong(0) == 37L)
    spark.sql(s"CALL $cat.system.compact('t')")
    assert(ManifestUpsertSink.latestManifest(s"$root/t").get.dvs.isEmpty)
    assert(spark.sql(s"SELECT COUNT(*) FROM $cat.t").head().getLong(0) == 37L)
    assert(spark.sql(s"SELECT COUNT(*) FROM $cat.t WHERE p = 'upd'").head().getLong(0) == 4L)
  }

  test("MoR UPSERT: prior files byte-identical, sequence-stamped dv, replacement row survives") {
    import spark.implicits._
    val root = tmp("graft_dv_ups_")
    val sink = seed(root) // 40 rows, 4 buckets
    val v0 = ManifestUpsertSink.latestManifest(root).get
    val bytesBefore = fileBytes(v0.files.map(_.path))

    // mixed batch: 3 updates + 2 inserts
    sink.upsertMergeOnRead(
      Seq((7L, "u7", 2L), (13L, "u13", 2L), (21L, "u21", 2L),
        (101L, "n101", 2L), (102L, "n102", 2L)).toDF("id", "p", "seq"),
      "seq", 1L)

    val v1 = ManifestUpsertSink.latestManifest(root).get
    assert(v0.files.map(_.path).toSet.subsetOf(v1.files.map(_.path).toSet),
      "a merge-on-read upsert APPENDS — every prior data file is carried")
    assert(fileBytes(v0.files.map(_.path)) == bytesBefore,
      "prior data files must stay byte-identical")
    // dv lists ONLY the replaced (existing) keys — inserts don't mask
    assert(v1.dvs.map(_.rows).sum == 3L, s"dv = the 3 updated keys, got ${v1.dvs}")
    // sequence provenance: the dv and the new files share the commit's
    // sequence; prior files are strictly older
    val newFiles = v1.files.filterNot(f => v0.files.map(_.path).contains(f.path))
    assert(newFiles.nonEmpty && newFiles.forall(_.seq == v1.version))
    assert(v1.dvs.forall(_.seq == v1.version))
    assert(v0.files.forall(f => v1.files.find(_.path == f.path).get.seq < v1.version))

    // Scala read: replacements visible, old rows masked, inserts present
    val got = sink.read(spark).select("id", "p").as[(Long, String)].collect().toMap
    assert(got.size == 42 && got(7L) == "u7" && got(13L) == "u13" &&
      got(21L) == "u21" && got(101L) == "n101" && got(8L) == "p8", s"got $got")
    // DSv2 scan (byte-path fold with interleaved sequences): same answer
    val sql = spark.read.format("graft-manifest").load(root)
    assert(sql.count() == 42)
    assert(sql.filter(col("id") === 7L).select("p").as[String].head() == "u7",
      "the replacement row must survive the dv that retires its predecessor")
    // metadata-only COUNT stays exact: Σfile rows − Σdv rows = 40+5−3
    val census = sql.agg(count(lit(1)).as("n"))
    assert(census.queryExecution.executedPlan.toString.contains("LocalTableScan"))
    assert(census.as[Long].head() == 42L)
    // CDC: 3 updated (with before images) + 2 inserted
    val feed = ManifestUpsertSink.readChanges(spark, root, v1.version)
    assert(feed.filter(col("change") === "updated").count() == 3)
    assert(feed.filter(col("change") === "inserted").count() == 2)
    // time travel: pre-upsert version unchanged
    assert(ManifestUpsertSink.readVersion(spark, root, v0.version)
      .filter(col("id") === 7L).select("p").as[String].head() == "p7")

    // STACKED upserts on the same key stay exact (each dv masks exactly
    // one live instance), and a MoR delete of an upserted key wins
    sink.upsertMergeOnRead(Seq((7L, "u7b", 3L)).toDF("id", "p", "seq"), "seq", 2L)
    assert(sink.read(spark).filter(col("id") === 7L)
      .select("p").as[String].head() == "u7b")
    assert(spark.read.format("graft-manifest").load(root).count() == 42)
    sink.deleteKeysMergeOnRead(Seq(7L).toDF("id"), 3L)
    assert(spark.read.format("graft-manifest").load(root)
      .filter(col("id") === 7L).count() == 0,
      "a MoR delete (newest sequence) masks every prior instance")
    assert(spark.read.format("graft-manifest").load(root).count() == 41)
    // compaction materializes the whole stack; answers unchanged
    sink.compact(spark)
    val vf = ManifestUpsertSink.latestManifest(root).get
    assert(vf.dvs.isEmpty)
    val after = sink.read(spark).select("id", "p").as[(Long, String)].collect().toMap
    assert(after.size == 41 && !after.contains(7L) && after(13L) == "u13")
  }

  test("MIXED statements are merge-on-read: MERGE with DELETE branch / key-moving UPDATE append + one dv") {
    val root = tmp("graft_dv_mixed_")
    val cat = "graft_dvmixed"
    spark.conf.set(s"spark.sql.catalog.$cat",
      classOf[graft.sources.ManifestCatalog].getName)
    spark.conf.set(s"spark.sql.catalog.$cat.root", root)
    spark.sql(s"""CREATE TABLE $cat.t (id BIGINT, p STRING, seq BIGINT)
      TBLPROPERTIES ('keyCol'='id', 'orderCol'='seq', 'buckets'='4',
        'mergeOnRead'='true')""")
    spark.sql(s"INSERT INTO $cat.t SELECT id, concat('p', id), 0L FROM range(1, 41)")
    val v0 = ManifestUpsertSink.latestManifest(s"$root/t").get
    val bytesBefore = fileBytes(v0.files.map(_.path))
    // MIXED MERGE: one matched UPDATE (id 7), one matched DELETE (id 13),
    // one NOT MATCHED INSERT (id 101) — the statement class that used to
    // pay copy-on-write
    spark.sql(s"""MERGE INTO $cat.t t USING (
        SELECT CAST(7 AS BIGINT) AS id, 'u7' AS p, CAST(1 AS BIGINT) AS seq
        UNION ALL SELECT CAST(13 AS BIGINT), 'dead', CAST(1 AS BIGINT)
        UNION ALL SELECT CAST(101 AS BIGINT), 'n101', CAST(1 AS BIGINT)
      ) s ON t.id = s.id
      WHEN MATCHED AND s.p = 'dead' THEN DELETE
      WHEN MATCHED THEN UPDATE SET p = s.p, seq = s.seq
      WHEN NOT MATCHED THEN INSERT *""")
    val v1 = ManifestUpsertSink.latestManifest(s"$root/t").get
    assert(v0.files.map(_.path).toSet.subsetOf(v1.files.map(_.path).toSet),
      "a mixed MoR statement APPENDS — every prior data file is carried")
    assert(fileBytes(v0.files.map(_.path)) == bytesBefore,
      "prior data files must stay byte-identical")
    assert(v1.dvs.map(_.rows).sum == 2L,
      s"ONE dv generation listing exactly the retired instances (replaced id 7 + deleted id 13): ${v1.dvs}")
    assert(spark.sql(s"SELECT COUNT(*) FROM $cat.t").head().getLong(0) == 40L,
      "metadata COUNT must stay exact: 40 - 1 deleted + 1 inserted")
    assert(spark.sql(s"SELECT p FROM $cat.t WHERE id = 7").head().getString(0) == "u7",
      "the replacement row survives the dv that retired its predecessor")
    assert(spark.sql(s"SELECT COUNT(*) FROM $cat.t WHERE id = 13").head().getLong(0) == 0L)
    assert(spark.sql(s"SELECT p FROM $cat.t WHERE id = 101").head().getString(0) == "n101")
    // combined change feed under the single version
    val feed = spark.read.format("graft-manifest")
      .option("changesOf", v1.version.toString).load(s"$root/t")
      .select("id", "change").collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(feed == Map(7L -> "updated", 13L -> "deleted", 101L -> "inserted"), s"$feed")
    // KEY-MOVING UPDATE stacks on top, still merge-on-read: the old key
    // folds away, the new key's row lands, prior files untouched
    spark.sql(s"UPDATE $cat.t SET id = id + 1000 WHERE id IN (21, 22)")
    val v2 = ManifestUpsertSink.latestManifest(s"$root/t").get
    assert(v1.files.map(_.path).toSet.subsetOf(v2.files.map(_.path).toSet),
      "a key-moving MoR UPDATE appends — every prior data file is carried")
    assert(fileBytes(v0.files.map(_.path)) == bytesBefore)
    assert(v2.dvs.map(_.rows).sum == 4L,
      s"the move retires the two vacated keys on top of the merge's two: ${v2.dvs}")
    assert(spark.sql(s"SELECT COUNT(*) FROM $cat.t").head().getLong(0) == 40L)
    assert(spark.sql(s"SELECT COUNT(*) FROM $cat.t WHERE id IN (21, 22)").head().getLong(0) == 0L)
    assert(spark.sql(s"SELECT p FROM $cat.t WHERE id = 1021").head().getString(0) == "p21",
      "the moved row reads at its new key with its old payload")
    // a key re-occupied in the SAME statement resolves as an upsert, not
    // a delete: move 30 onto 31 (31's old row retires, 30 vacates)
    spark.sql(s"UPDATE $cat.t SET id = 31, p = 'shifted', seq = 9 WHERE id = 30")
    assert(spark.sql(s"SELECT COUNT(*) FROM $cat.t").head().getLong(0) == 39L)
    assert(spark.sql(s"SELECT p FROM $cat.t WHERE id = 31").head().getString(0) == "shifted")
    // compaction clears the stacked dvs and preserves the answer
    spark.sql(s"CALL $cat.system.compact('t')")
    assert(ManifestUpsertSink.latestManifest(s"$root/t").get.dvs.isEmpty)
    assert(spark.sql(s"SELECT COUNT(*) FROM $cat.t").head().getLong(0) == 39L)
    assert(spark.sql(s"SELECT p FROM $cat.t WHERE id = 31").head().getString(0) == "shifted")
  }

  test("MoR dv commit racing a concurrent compact: rebase recomposes dvs from the WINNING chain") {
    import spark.implicits._
    val root = tmp("graft_dv_race_compact_")
    val sink = seed(root) // 40 rows
    // pre-existing dv debt in the SAME bucket the racer will touch — the
    // discriminating shape: the old code captured dvWritten =
    // cur.dvs(touched bucket) ++ new BEFORE the race, so a winning
    // compaction's materialization of that bucket's backlog got
    // re-attached by the rebase and the census under-counted forever
    val bX = graft.sinks.ManifestStats.bucketOf(1L, 4).get
    val kSame = (2L to 50L).find(k =>
      graft.sinks.ManifestStats.bucketOf(k, 4).get == bX).get
    sink.deleteKeysMergeOnRead(Seq(1L).toDF("id"), 1L)
    var fired = false
    val racedSink = new ManifestUpsertSink(root, "id", 4) {
      override protected def beforeCommit(attemptVersion: Long): Unit =
        if (!fired) {
          fired = true
          // the winner: a full compaction materializes the 1-key backlog
          new ManifestUpsertSink(root, "id", 4).compact(spark)
        }
    }
    racedSink.deleteKeysMergeOnRead(Seq(kSame).toDF("id"), 2L)
    val m = ManifestUpsertSink.latestManifest(root).get
    assert(m.dvs.map(_.rows).sum == 1L,
      s"only the racer's own dv survives the rebase (the backlog materialized): ${m.dvs}")
    assert(!m.dvInexact)
    // the invariant the advisory protects: metadata-only COUNT(*) exact
    val census = spark.read.format("graft-manifest").load(root).agg(count(lit(1)).as("n"))
    assert(census.queryExecution.executedPlan.toString.contains("LocalTableScan"))
    assert(census.as[Long].head() == 38L,
      "Σfile rows − Σdv rows must stay exact across the compact/dv race")
    assert(sink.read(spark).count() == 38L)
  }

  test("dv fold ships per-bucket via broadcast: task closure flat, readers load only their buckets") {
    import spark.implicits._
    import graft.sources.ManifestSource.DvFoldProbe
    val root = tmp("graft_dv_dist_")
    val buckets = 64
    val sink = new ManifestUpsertSink(root, "id", buckets)
    sink.upsertBatch((1L to 6400L).map(i => (i, s"p$i", 0L)).toDF("id", "p", "seq"),
      "seq", 0L)
    // dv keys spread across (almost) every bucket
    sink.deleteKeysMergeOnRead((1L to 640L).toDF("id"), 1L)
    val m = ManifestUpsertSink.latestManifest(root).get
    assert(m.dvs.map(_.bucket).distinct.size > 32, "the debt spans many buckets")
    DvFoldProbe.reset()
    // a SUM is not sidecar-answerable — it must run the real fold scan
    // (COUNT(*) would short-circuit to the metadata-only LocalTableScan)
    assert(spark.read.format("graft-manifest").load(root)
      .agg(sum(col("id"))).head().getLong(0) ==
      6400L * 6401L / 2 - 640L * 641L / 2)
    assert(DvFoldProbe.totalKeys == 640, s"fold collected ${DvFoldProbe.totalKeys}")
    // the factory (= what every task closure serializes) must carry the
    // broadcast HANDLE, not the keys: flat in dv volume
    assert(DvFoldProbe.lastFactoryBytes > 0 && DvFoldProbe.lastFactoryBytes < 64 * 1024,
      s"factory closure is ${DvFoldProbe.lastFactoryBytes} bytes — the keys are leaking into it")
    // and no single reader materialized the global set
    assert(DvFoldProbe.maxReaderKeys > 0 && DvFoldProbe.maxReaderKeys < 640,
      s"a reader loaded ${DvFoldProbe.maxReaderKeys} of 640 keys — per-bucket scoping is broken")
  }

  test("float key identity: dv byte-equality agrees with SQL equality on -0.0 (normalized both sides)") {
    import spark.implicits._
    val root = tmp("graft_dv_float_")
    val sink = new ManifestUpsertSink(root, "k", buckets = 2)
    // stored key is NEGATIVE zero
    sink.upsertBatch(Seq((-0.0, "old", 1L)).toDF("k", "p", "seq"), "seq", 0L)
    // the upsert arrives as POSITIVE zero: SQL equality says same key, so
    // the dv (written from the batch's byte form) must mask the stored
    // -0.0 row in the byte-path DSv2 fold too
    sink.upsertMergeOnRead(Seq((0.0, "new", 2L)).toDF("k", "p", "seq"), "seq", 1L)
    val scala = sink.read(spark).select("p").as[String].collect().toSet
    assert(scala == Set("new"), s"sink-side SQL fold: $scala")
    val sql = spark.read.format("graft-manifest").load(root)
      .select("p").as[String].collect().toSet
    assert(sql == Set("new"),
      s"DSv2 byte fold diverged from SQL equality on -0.0 vs 0.0: $sql")
  }

  test("INSERT INTO / save() on a mergeOnRead table is merge-on-read: appends, never rewrites") {
    import spark.implicits._
    val root = tmp("graft_dv_ins_")
    val cat = "graft_dvins"
    spark.conf.set(s"spark.sql.catalog.$cat",
      classOf[graft.sources.ManifestCatalog].getName)
    spark.conf.set(s"spark.sql.catalog.$cat.root",
      java.nio.file.Paths.get(root).getParent.toString)
    val tbl = java.nio.file.Paths.get(root).getFileName.toString
    spark.sql(s"""CREATE TABLE $cat.`$tbl` (id BIGINT, p STRING, seq BIGINT)
      TBLPROPERTIES ('keyCol'='id', 'orderCol'='seq', 'buckets'='4',
        'mergeOnRead'='true')""")
    spark.sql(s"INSERT INTO $cat.`$tbl` SELECT id, concat('p', id), 0L FROM range(1, 21)")
    val v0 = ManifestUpsertSink.latestManifest(root).get
    assert(v0.dvs.isEmpty, "a first insert has nothing to mask")
    val bytes0 = fileBytes(v0.files.map(_.path))
    // a second INSERT with 2 replaced + 2 new keys: prior files stay
    // byte-identical (the CoW merge would rewrite every touched bucket,
    // even for the brand-new keys), the dv lists only the replaced pair
    spark.sql(s"INSERT INTO $cat.`$tbl` VALUES (3, 'u3', 1), (9, 'u9', 1), " +
      "(21, 'n21', 1), (22, 'n22', 1)")
    val v1 = ManifestUpsertSink.latestManifest(root).get
    assert(v0.files.map(_.path).toSet.subsetOf(v1.files.map(_.path).toSet) &&
      fileBytes(v0.files.map(_.path)) == bytes0,
      "INSERT INTO a mergeOnRead table must append, not rewrite")
    assert(v1.dvs.map(_.rows).sum == 2L, s"only replaced keys mask: ${v1.dvs}")
    assert(spark.sql(s"SELECT COUNT(*) FROM $cat.`$tbl`").head().getLong(0) == 22L)
    assert(spark.sql(s"SELECT p FROM $cat.`$tbl` WHERE id = 3").head().getString(0) == "u3")
    assert(spark.sql(s"SELECT p FROM $cat.`$tbl` WHERE id = 4").head().getString(0) == "p4")
    // the path-based save() shares the routing via the writer option
    Seq((9L, "u9b", 2L)).toDF("id", "p", "seq").write.format("graft-manifest")
      .option("orderCol", "seq").option("mergeOnRead", "true")
      .mode("append").save(root)
    val v2 = ManifestUpsertSink.latestManifest(root).get
    assert(v1.files.map(_.path).toSet.subsetOf(v2.files.map(_.path).toSet))
    assert(v2.dvs.map(_.rows).sum == 3L)
    assert(ManifestUpsertSink.read(spark, root)
      .filter(col("id") === 9L).select("p").as[String].head() == "u9b")
  }

  test("dv-fraction compaction policy: delete debt above the threshold auto-materializes") {
    import spark.implicits._
    val root = tmp("graft_dv_policy_")
    val sink = new ManifestUpsertSink(root, "id", buckets = 1)
    sink.upsertBatch((1L to 100L).map(i => (i, s"p$i", 0L)).toDF("id", "p", "seq"),
      "seq", 0L)
    // 5% dv debt: below a 10% policy, and below any file-count threshold
    sink.deleteKeysMergeOnRead((1L to 5L).toDF("id"), 1L)
    val v1 = ManifestUpsertSink.latestManifest(root).get
    sink.compactIncremental(spark, minFilesPerBucket = 99, maxDvFraction = 0.1)
    assert(ManifestUpsertSink.latestManifest(root).get.version == v1.version,
      "below the dv fraction: no rewrite commits")
    // push the debt over 10%: the policy rewrites the bucket even though
    // the file count is far under the threshold
    sink.deleteKeysMergeOnRead((6L to 15L).toDF("id"), 2L)
    sink.compactIncremental(spark, minFilesPerBucket = 99, maxDvFraction = 0.1)
    val m = ManifestUpsertSink.latestManifest(root).get
    assert(m.dvs.isEmpty,
      s"dv debt over the fraction must materialize, got ${m.dvs}")
    assert(sink.read(spark).count() == 85L)
    // the SQL procedure speaks the same policy
    val cat = "graft_dv_policy"
    spark.conf.set(s"spark.sql.catalog.$cat",
      classOf[graft.sources.ManifestCatalog].getName)
    spark.conf.set(s"spark.sql.catalog.$cat.root",
      java.nio.file.Paths.get(root).getParent.toString)
    val tbl = java.nio.file.Paths.get(root).getFileName.toString
    sink.deleteKeysMergeOnRead((16L to 40L).toDF("id"), 3L)
    spark.sql(s"CALL $cat.system.compact_incremental('$tbl', 99, max_dv_fraction => 0.1)")
    assert(ManifestUpsertSink.latestManifest(root).get.dvs.isEmpty)
    assert(spark.sql(s"SELECT COUNT(*) FROM $cat.`$tbl`").head().getLong(0) == 60L)
  }

  test("pre-seq manifest vintages decode: sequences fall back to the path's version segment") {
    import spark.implicits._
    val root = tmp("graft_dv_legacy_")
    val sink = seed(root, n = 20)
    sink.deleteKeysMergeOnRead(Seq(3L, 9L).toDF("id"), 1L)
    // rewrite the committed manifest in the PRE-SEQ line format:
    // `bucket\tpath` and `dv\tbucket\trows\tpath`
    val mPath = Paths.get(s"$root/_manifest/v1.manifest")
    val legacy = new String(Files.readAllBytes(mPath), "UTF-8").linesIterator.map { l =>
      if (l.startsWith("dv\t")) {
        val Array(d, b, r, _, p) = l.split("\t", 5); s"$d\t$b\t$r\t$p"
      } else if (l.contains('\t')) {
        val Array(b, _, p) = l.split("\t", 3); s"$b\t$p"
      } else l
    }.mkString("\n")
    Files.write(mPath, legacy.getBytes("UTF-8"))
    // both read surfaces still fold the dv (legacy dvs apply to every
    // file in their bucket — the pre-seq protocol's invariant)
    assert(sink.read(spark).count() == 18)
    assert(spark.read.format("graft-manifest").load(root).count() == 18)
    val m = ManifestUpsertSink.latestManifest(root).get
    assert(m.files.forall(_.seq >= 0) && m.dvs.forall(_.seq > 0),
      "decode must resolve sequences from the path segments")
  }

  test("the dv fold scan stays COLUMNAR: vectorized parquet decode survives the mask") {
    import spark.implicits._
    val root = tmp("graft_dv_columnar_")
    val sink = seed(root, n = 100)
    sink.deleteKeysMergeOnRead(Seq(3L, 9L).toDF("id"), 1L)
    val df = spark.read.format("graft-manifest").load(root)
    // the fold factory must OFFER columnar (selection-mapped) batches so
    // the plan keeps the delegate's vectorized parquet decode — the r15
    // bench pinned the forced row-based reader at ~1.9× plain parquet
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("ColumnarToRow"), s"dv fold scan must stay columnar:\n$plan")
    assert(df.count() == 98)
    assert(df.agg(sum($"id")).head().getLong(0) == (1L to 100).sum - 12L)
    // MoR upsert stack (interleaved file/dv sequences → per-file masking)
    // stays columnar AND exact: the replacement row survives its own dv
    sink.upsertMergeOnRead(Seq((5L, "P5", 2L)).toDF("id", "p", "seq"), "seq", 2L)
    val df2 = spark.read.format("graft-manifest").load(root)
    assert(df2.queryExecution.executedPlan.toString.contains("ColumnarToRow"))
    assert(df2.count() == 98)
    assert(df2.where($"id" === 5L).select($"p").head().getString(0) == "P5")
    // evolution fold (rename + NOT-NULL-DEFAULT add) keeps columnar too:
    // single-source renames pass vectors through, defaults coalesce
    sink.renameColumn(spark, "p", "payload")
    sink.addColumn(spark, "grade", "BIGINT", Some("7"))
    val df3 = spark.read.format("graft-manifest").load(root)
    assert(df3.queryExecution.executedPlan.toString.contains("ColumnarToRow"),
      "rename+default fold must stay columnar")
    assert(df3.agg(sum($"grade")).head().getLong(0) == 98L * 7)
    assert(df3.where($"id" === 5L).select($"payload").head().getString(0) == "P5")
  }

  test("legacy-clone vintage: carried path seqs above the manifest version clamp — deleted rows stay dead") {
    import spark.implicits._
    val root = tmp("graft_dv_cloneclamp_")
    val sink = seed(root, n = 20)
    sink.deleteKeysMergeOnRead(Seq(3L, 9L).toDF("id"), 1L)
    // Simulate the manifest a PRE-FIX shallow clone wrote: committed at
    // a LOW version while CARRYING source data paths from a HIGHER one
    // (clone-at-v0 holding the source's data/v5-… files next to its own
    // v1 dv). Move the v0 data dir to v5 on disk and rewrite the
    // manifest in the pre-seq line format pointing at it; the dv stays
    // at v1. Path-derived decode alone would give file.seq=5 > dv.seq=1
    // — the dv would mask NOTHING and the deleted rows resurface. The
    // self-consistency clamp (file seq can never exceed the listing
    // manifest's version) restores dv-applies-to-all.
    val dataDirs = new java.io.File(s"$root/data").listFiles().map(_.getName)
    val v0dir = dataDirs.find(n => n.startsWith("v0-") && !n.endsWith("-dv")).get
    val v5dir = "v5-" + v0dir.stripPrefix("v0-")
    Files.move(Paths.get(s"$root/data/$v0dir"), Paths.get(s"$root/data/$v5dir"))
    val mPath = Paths.get(s"$root/_manifest/v1.manifest")
    val legacy = new String(Files.readAllBytes(mPath), "UTF-8").linesIterator.map { l =>
      if (l.startsWith("dv\t")) {
        val Array(d, b, r, _, p) = l.split("\t", 5); s"$d\t$b\t$r\t$p"
      } else if (l.contains('\t')) {
        val Array(b, _, p) = l.split("\t", 3)
        s"$b\t${p.replace(s"/data/$v0dir/", s"/data/$v5dir/")}"
      } else l
    }.mkString("\n")
    Files.write(mPath, legacy.getBytes("UTF-8"))
    val m = ManifestUpsertSink.latestManifest(root).get
    assert(m.files.forall(_.seq <= m.version),
      "decode must clamp path-derived file seqs above the manifest's own version")
    assert(sink.read(spark).count() == 18,
      "the clone's dv must keep masking carried files on upgrade")
    assert(spark.read.format("graft-manifest").load(root).count() == 18)
  }

  test("seqOfPath anchors to the data/v<N>- segment: a version-shaped ROOT cannot poison decode") {
    assert(ManifestUpsertSink.seqOfPath(
      "/bulk/data/v2-prod/tbl/data/v7-abc/__bucket=0/part-0.parquet").contains(7L))
    assert(ManifestUpsertSink.seqOfPath(
      "/bulk/data/v2-prod/tbl/data/v3-abc-dv/part-0.parquet").contains(3L))
    assert(ManifestUpsertSink.seqOfPath("/v4-notdata/tbl/part-0.parquet").isEmpty)
    // end-to-end: a table whose ROOT contains a data/v<N>- segment still
    // decodes pre-seq manifests from its OWN version directories
    import spark.implicits._
    val base = tmp("graft_dv_vroot_")
    val root = s"$base/data/v2-prod/tbl"
    val sink = seed(root, n = 20)
    sink.deleteKeysMergeOnRead(Seq(3L, 9L).toDF("id"), 1L)
    val mPath = Paths.get(s"$root/_manifest/v1.manifest")
    val legacy = new String(Files.readAllBytes(mPath), "UTF-8").linesIterator.map { l =>
      if (l.startsWith("dv\t")) {
        val Array(d, b, r, _, p) = l.split("\t", 5); s"$d\t$b\t$r\t$p"
      } else if (l.contains('\t')) {
        val Array(b, _, p) = l.split("\t", 3); s"$b\t$p"
      } else l
    }.mkString("\n")
    Files.write(mPath, legacy.getBytes("UTF-8"))
    val m = ManifestUpsertSink.latestManifest(root).get
    assert(m.files.forall(f => f.seq == 0L) && m.dvs.forall(_.seq == 1L),
      s"root's v2 segment must not poison seq decode: ${m.files.map(_.seq)} / ${m.dvs.map(_.seq)}")
    assert(sink.read(spark).count() == 18)
  }
}
