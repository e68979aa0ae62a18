package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.sinks.ManifestUpsertSink

/** RESTORE + CLONE on the manifest lake: rollback as a zero-copy,
  * CDC-visible commit, and zero-copy table forks with the Delta shallow
  * -clone vacuum caveat pinned in BOTH directions (clone's vacuum never
  * reaches into the source; source's vacuum CAN strand a shallow clone,
  * and deep = true is the retention-safe variant). */
class ManifestLifecycleSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def tmp(prefix: String): String =
    java.nio.file.Files.createTempDirectory(prefix).toString

  private def rows(root: String): Map[Long, (String, Long)] =
    ManifestUpsertSink.read(spark, root).select("id", "p", "seq")
      .as[(Long, String, Long)].collect().map(r => r._1 -> (r._2, r._3)).toMap

  test("restore: zero-copy rollback with a real diff feed; history intact") {
    val root = tmp("graft_restore_")
    val sink = new ManifestUpsertSink(root, "id", buckets = 4)
    val base = (1L to 20L).map(i => (i, s"v$i", 0L)).toDF("id", "p", "seq")
    sink.upsertBatch(base, "seq", 0L) // v0
    sink.upsertBatch(
      ((1L to 20L).filter(_ % 4 == 0).map(i => (i, s"upd$i", 1L)) ++
        Seq((101L, "new", 1L), (102L, "new", 1L))).toDF("id", "p", "seq"),
      "seq", 1L) // v1: update 4,8,12,16,20; insert 101,102
    sink.deleteKeys(Seq(5L, 10L, 15L, 20L).toDF("id"), 2L) // v2

    val restored = sink.restore(spark, 0L) // v3
    assert(restored eq sink, "same epoch: restore returns the same handle")

    // the snapshot IS v0 again — and its manifest references v0's files
    // verbatim (rollback = manifest op, zero data copy)
    assert(rows(root) == (1L to 20L).map(i => i -> (s"v$i", 0L)).toMap)
    val m0 = ManifestUpsertSink.snapshotManifest(root, Some(0L))
    val m3 = ManifestUpsertSink.snapshotManifest(root, Some(3L))
    assert(m3.files.map(_.path).toSet == m0.files.map(_.path).toSet,
      "restore must reference the target version's files, not rewrite them")

    // the diff feed: resurrections inserted, post-target keys deleted,
    // surviving updates reverted as updated
    val feed = spark.read.format("graft-manifest").option("changesOf", 3).load(root)
    val byChange = feed.groupBy("change").agg(collect_list(col("id")).as("ids"))
      .as[(String, Seq[Long])].collect().map(r => r._1 -> r._2.sorted).toMap
    assert(byChange("inserted") == Seq(5L, 10L, 15L, 20L), "deleted-at-v2 keys come back")
    assert(byChange("deleted") == Seq(101L, 102L), "v1's new keys go out")
    assert(byChange("updated") == Seq(4L, 8L, 12L, 16L), "surviving updates revert")

    // history is preserved: the rolled-back state stays time-travelable
    assert(ManifestUpsertSink.readVersion(spark, root, 2L)
      .filter(col("id") === 8L).select("p").as[String].head() == "upd8")

    // guards: head restore is a no-op version-wise; future/vacuumed loud
    val head = ManifestUpsertSink.snapshotManifest(root, None).version
    sink.restore(spark, head)
    assert(ManifestUpsertSink.snapshotManifest(root, None).version == head)
    intercept[IllegalArgumentException] { sink.restore(spark, head + 5) }

    // the replay guard survives the rollback: batch 2 is already
    // committed, so its redelivery must still no-op after the restore
    sink.deleteKeys(Seq(1L).toDF("id"), 2L)
    assert(rows(root).contains(1L), "redelivered pre-restore batch id must replay as a no-op")
  }

  test("restore across a recluster rolls the epoch back; across a key rename it refuses") {
    val root = tmp("graft_restore_epoch_")
    val sink = new ManifestUpsertSink(root, "id", buckets = 2)
    sink.upsertBatch((1L to 40L).map(i => (i, i % 5L, 0L)).toDF("id", "user", "seq"),
      "seq", 0L) // v0: keyed (id, 2)
    val next = sink.recluster(spark, "user", 8) // v1: keyed (user, 8)
    val back = next.restore(spark, 0L) // v2: keyed (id, 2) again
    val m = ManifestUpsertSink.snapshotManifest(root, None)
    assert(m.keyCol.contains("id") && m.buckets.contains(2),
      "restore adopts the target version's epoch pair")
    // the post-epoch handle is now stale; the returned one merges on
    intercept[IllegalStateException] {
      next.upsertBatch(Seq((41L, 1L, 1L)).toDF("id", "user", "seq"), "seq", 1L)
    }
    back.upsertBatch(Seq((41L, 1L, 1L)).toDF("id", "user", "seq"), "seq", 1L)
    assert(ManifestUpsertSink.read(spark, root).count() == 41)

    // across a KEY RENAME the per-key diff is undefined: refuse loudly
    val root2 = tmp("graft_restore_ren_")
    val s2 = new ManifestUpsertSink(root2, "id", buckets = 2)
    s2.upsertBatch(Seq((1L, "a", 0L)).toDF("id", "p", "seq"), "seq", 0L)
    val renamed = s2.renameColumn(spark, "id", "doc_id")
    val e = intercept[IllegalArgumentException] { renamed.restore(spark, 0L) }
    assert(e.getMessage.contains("key rename"), e.getMessage)
  }

  test("shallow clone: zero copy, isolated divergence, vacuum never crosses roots") {
    val srcRoot = tmp("graft_clone_src_")
    val clRoot = tmp("graft_clone_cl_")
    val src = new ManifestUpsertSink(srcRoot, "id", buckets = 4)
    src.upsertBatch((1L to 20L).map(i => (i, s"v$i", 0L)).toDF("id", "p", "seq"), "seq", 0L)

    val clone = src.cloneTo(spark, clRoot)
    val srcFiles = ManifestUpsertSink.snapshotManifest(srcRoot, None).files.map(_.path).toSet
    val clFiles = ManifestUpsertSink.snapshotManifest(clRoot, None).files.map(_.path).toSet
    assert(clFiles == srcFiles, "shallow clone references the source's files verbatim")
    assert(!java.nio.file.Files.exists(java.nio.file.Paths.get(clRoot, "data")),
      "shallow clone copies zero data bytes")
    intercept[IllegalArgumentException] { src.cloneTo(spark, clRoot) } // occupied target

    // divergent merges stay isolated under copy-on-write
    clone.upsertBatch(Seq((1L, "clone1", 1L)).toDF("id", "p", "seq"), "seq", 1L)
    src.upsertBatch(Seq((2L, "src2", 1L)).toDF("id", "p", "seq"), "seq", 1L)
    assert(rows(clRoot)(1L) == ("clone1", 1L) && rows(clRoot)(2L) == ("v2", 0L))
    assert(rows(srcRoot)(1L) == ("v1", 0L) && rows(srcRoot)(2L) == ("src2", 1L))

    // the CLONE's vacuum drops its v0 (which references source files) —
    // and must NOT delete a byte outside its own root
    clone.vacuum(keepVersions = 1)
    assert(rows(srcRoot).size == 20, "clone vacuum must never reach into the source root")
    assert(rows(clRoot).size == 20, "clone still reads (its head carries shared+own files)")

    // the Delta strand-the-clone caveat is CLOSED here: cloneTo registered
    // the clone under the source's _manifest, so the source's vacuum
    // SKIPS the files the clone still references — compact+vacuum on the
    // source leaves the clone fully readable
    src.compact(spark)
    src.vacuum(keepVersions = 1)
    assert(rows(clRoot)(3L) == ("v3", 0L) && rows(clRoot).size == 20,
      "source vacuum must skip files a registered live clone references")

    // DROPPING the clone (its manifest log gone) releases the hold: the
    // next source vacuum reclaims the shared files and the stale ref
    val clManifests = new java.io.File(clRoot, "_manifest").listFiles()
    clManifests.foreach(f => { java.nio.file.Files.delete(f.toPath); () })
    src.compact(spark)
    src.vacuum(keepVersions = 1)
    assert(!new java.io.File(srcRoot, "_manifest").listFiles()
      .exists(_.getName.startsWith("clone-")), "dropped clone's ref is swept")
    assert(rows(srcRoot).size == 20, "the source itself is unaffected")
  }

  test("cloneTo refuses nested roots (either direction)") {
    val srcRoot = tmp("graft_nest_src_")
    val src = new ManifestUpsertSink(srcRoot, "id", buckets = 2)
    src.upsertBatch(Seq((1L, "a", 0L)).toDF("id", "p", "seq"), "seq", 0L)
    // descendant of the source root — would pass the source's own-root
    // vacuum guard and get reclaimed
    val e1 = intercept[IllegalArgumentException] {
      src.cloneTo(spark, s"$srcRoot/sub")
    }
    assert(e1.getMessage.contains("nested"), e1.getMessage)
    // ancestor (with a trailing-slash spelling for the normalizer)
    val parent = srcRoot.substring(0, srcRoot.lastIndexOf('/'))
    val e2 = intercept[IllegalArgumentException] {
      src.cloneTo(spark, parent + "/")
    }
    assert(e2.getMessage.contains("nested"), e2.getMessage)
  }

  test("restore's diff feed is bucket-pruned: a single-bucket rollback reads only that bucket's files from both versions") {
    val root = tmp("graft_restore_prune_")
    val sink = new ManifestUpsertSink(root, "id", buckets = 8)
    sink.upsertBatch((1L to 400L).map(i => (i, s"v$i", 0L)).toDF("id", "p", "seq"),
      "seq", 0L) // v0: all 8 buckets
    // one bad merge touching exactly ONE key (⇒ one bucket)
    sink.upsertBatch(Seq((7L, "BAD", 1L)).toDF("id", "p", "seq"), "seq", 1L) // v1
    val m0 = ManifestUpsertSink.snapshotManifest(root, Some(0L))
    val m1 = ManifestUpsertSink.snapshotManifest(root, Some(1L))
    val touched = m1.touched.get
    assert(touched.size == 1, "one key must touch one bucket")
    // the scan-pin: the diff must read ONLY the touched bucket's files —
    // from BOTH versions — never 2× the table
    val (curSide, tgtSide) = ManifestUpsertSink.restoreDiffEntries(m1, m0, "id", 8)
    assert(curSide.nonEmpty && curSide.forall(f => touched(f.bucket)),
      s"current side must scan only bucket ${touched.head}: ${curSide.map(_.bucket).distinct}")
    assert(tgtSide.nonEmpty && tgtSide.forall(f => touched(f.bucket)),
      s"target side must scan only bucket ${touched.head}: ${tgtSide.map(_.bucket).distinct}")
    assert(curSide.size < m1.files.size && tgtSide.size < m0.files.size,
      "pruning must actually shrink the read")
    // ... and pruning must not change the feed: exactly the one revert
    sink.restore(spark, 0L) // v2
    val feed = ManifestUpsertSink.readChanges(spark, root, 2L)
      .select("id", "change").as[(Long, String)].collect().toSeq
    assert(feed == Seq((7L, "updated")), s"pruned diff feed must be exact: $feed")
    assert(rows(root)(7L) == ("v7", 0L), "the snapshot is v0 again")
    // across an epoch change pruning degrades to the full diff (bucket
    // numbers are incomparable)
    val m2 = ManifestUpsertSink.snapshotManifest(root, Some(2L))
    val reEpoch = m2.copy(buckets = Some(16))
    val (fullCur, fullTgt) = ManifestUpsertSink.restoreDiffEntries(reEpoch, m0, "id", 16)
    assert(fullCur.size == m2.files.size && fullTgt.size == m0.files.size,
      "epoch change must fall back to the unpruned diff")
  }

  test("restore across a recluster refuses when the restore key is not unique in the current snapshot") {
    val root = tmp("graft_restore_dup_")
    val sink = new ManifestUpsertSink(root, "id", buckets = 2)
    // v0 keyed by id: `user` carries DUPLICATE values by construction
    sink.upsertBatch((1L to 10L).map(i => (i, i % 3L, 0L)).toDF("id", "user", "seq"),
      "seq", 0L)
    val next = sink.recluster(spark, "user", 4) // v1 keyed by user — 3 rows survive? no:
    // recluster is a rewrite, not a dedup — all 10 rows persist, keyed by
    // user going forward; restoring to v0 (keyed by id) is fine because id
    // IS unique. Now make the CURRENT snapshot hold duplicate ids:
    // re-insert an existing id under a fresh user key
    next.upsertBatch(Seq((3L, 77L, 1L)).toDF("id", "user", "seq"), "seq", 1L) // v2
    // current snapshot now holds id=3 twice (user=0 vintage and user=77);
    // a v0 restore's per-id diff would emit conflicting rows — refuse
    val e = intercept[IllegalArgumentException] { next.restore(spark, 0L) }
    assert(e.getMessage.contains("duplicate"), e.getMessage)
    // the snapshot itself is untouched by the refusal
    assert(ManifestUpsertSink.read(spark, root).count() == 11)
  }

  test("restore with an empty row diff still commits the epoch rollback (emptied table across a recluster)") {
    val root = tmp("graft_restore_empty_")
    val sink = new ManifestUpsertSink(root, "id", buckets = 2)
    sink.upsertBatch(Seq((1L, 5L, 0L), (2L, 6L, 0L)).toDF("id", "user", "seq"), "seq", 0L)
    sink.deleteKeys(Seq(1L, 2L).toDF("id"), 1L) // v1: emptied, keyed (id,2)
    sink.upsertBatch(Seq((1L, 5L, 1L), (2L, 6L, 1L)).toDF("id", "user", "seq"), "seq", 2L) // v2
    val next = sink.recluster(spark, "user", 8) // v3: keyed (user,8)
    next.deleteKeys(Seq(5L, 6L).toDF("user"), 3L) // v4: emptied, keyed (user,8)
    // both snapshots (v4 current, v1 target) list no files — but the
    // restore MUST still roll the (keyCol, buckets) epoch back and
    // return a handle bound to it, not silently no-op
    val back = next.restore(spark, 1L) // v5
    val m = ManifestUpsertSink.manifestAt(root, 5L).get
    assert(m.files.isEmpty, "an empty-diff restore still commits (as a real, empty version)")
    assert(m.keyCol.contains("id") && m.buckets.contains(2),
      "the epoch rolls back even when no row changed")
    // the returned handle is bound to the restored epoch: a merge works
    back.upsertBatch(Seq((9L, 1L, 4L)).toDF("id", "user", "seq"), "seq", 4L)
    assert(ManifestUpsertSink.read(spark, root).count() == 1)
    // ... and the stale post-recluster handle dies loudly
    intercept[IllegalStateException] {
      next.upsertBatch(Seq((10L, 1L, 5L)).toDF("id", "user", "seq"), "seq", 5L)
    }
  }

  test("deep clone materializes its own files and survives source compact+vacuum") {
    val srcRoot = tmp("graft_dclone_src_")
    val clRoot = tmp("graft_dclone_cl_")
    val src = new ManifestUpsertSink(srcRoot, "id", buckets = 4)
    src.upsertBatch((1L to 20L).map(i => (i, s"v$i", 0L)).toDF("id", "p", "seq"), "seq", 0L)
    val clone = src.cloneTo(spark, clRoot, deep = true)
    assert(ManifestUpsertSink.snapshotManifest(clRoot, None).files
      .forall(_.path.startsWith(clRoot)), "deep clone owns every file it references")
    src.compact(spark)
    src.vacuum(keepVersions = 1)
    assert(rows(clRoot) == (1L to 20L).map(i => i -> (s"v$i", 0L)).toMap,
      "deep clone is retention-independent of the source")
    // and it is a fully functional table
    clone.upsertBatch(Seq((21L, "new", 1L)).toDF("id", "p", "seq"), "seq", 1L)
    assert(rows(clRoot).size == 21)
  }

  test("age-based vacuum: retain window holds versions an SLA promises; timestampAsOf inside the window survives") {
    val root = tmp("graft_age_")
    val sink = new ManifestUpsertSink(root, "id", buckets = 2)
    sink.upsertBatch(Seq((1L, "a", 0L)).toDF("id", "p", "seq"), "seq", 0L) // v0
    sink.upsertBatch(Seq((1L, "b", 1L)).toDF("id", "p", "seq"), "seq", 1L) // v1
    Thread.sleep(30) // let wall clock advance past v0/v1's currency window
    val midTs = System.currentTimeMillis()
    Thread.sleep(30)
    sink.upsertBatch(Seq((1L, "c", 2L)).toDF("id", "p", "seq"), "seq", 2L) // v2
    // a one-hour retain window holds EVERYTHING (all versions were
    // current within it) even though keepVersions=1 would drop v0/v1
    sink.vacuum(keepVersions = 1, retainMs = Some(3600L * 1000))
    assert(ManifestUpsertSink.committedVersions(root) == Seq(0L, 1L, 2L),
      "age hold must override the count horizon")
    // timestampAsOf inside the window still resolves (v1 was current at
    // midTs — v2 hadn't committed yet)
    assert(ManifestUpsertSink.readTimestamp(spark, root, midTs)
      .select("p").as[String].head() == "b")
    // a zero retain window imposes no age hold: count horizon applies
    sink.vacuum(keepVersions = 1, retainMs = Some(0L))
    assert(ManifestUpsertSink.committedVersions(root) == Seq(2L),
      "expired versions reclaim once outside the window")
    assert(ManifestUpsertSink.read(spark, root)
      .select("p").as[String].head() == "c")
  }

  test("SQL CALL system.vacuum_retain: the age horizon through the catalog") {
    val root = tmp("graft_agecat_")
    val cat = s"graft_agecat_${System.nanoTime()}"
    spark.conf.set(s"spark.sql.catalog.$cat",
      classOf[graft.sources.ManifestCatalog].getName)
    spark.conf.set(s"spark.sql.catalog.$cat.root", root)
    spark.sql(s"""CREATE TABLE $cat.t (id BIGINT, p STRING, seq BIGINT)
      TBLPROPERTIES ('keyCol'='id', 'orderCol'='seq', 'buckets'='2')""")
    spark.sql(s"INSERT INTO $cat.t VALUES (1, 'a', 0)") // v0
    spark.sql(s"INSERT INTO $cat.t VALUES (1, 'b', 1)") // v1
    spark.sql(s"CALL $cat.system.vacuum_retain('t', 1.0)") // 1 hour: holds all
    assert(ManifestUpsertSink.committedVersions(s"$root/t") == Seq(0L, 1L))
    spark.sql(s"CALL $cat.system.vacuum_retain('t', 0.0)") // expired: count floor
    assert(ManifestUpsertSink.committedVersions(s"$root/t") == Seq(1L))
  }
}
