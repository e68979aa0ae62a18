package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.sinks.ManifestUpsertSink
import graft.sources.ManifestCatalog

/** SQL `CALL` maintenance procedures + `TRUNCATE TABLE` on manifest-lake
  * tables: the operator surface — compaction, clustering, vacuum,
  * restore, partition expiry — reachable with zero Scala, each call
  * running the same committed Scala-API operation and returning the
  * table's post-call (version, n_files). */
class ManifestProcedureSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val catSeq = new java.util.concurrent.atomic.AtomicInteger(0)

  private def withCatalog[A](f: (String, String) => A): A = {
    val root = java.nio.file.Files.createTempDirectory("graft_proc_").toString
    val cat = s"graft_proc${catSeq.incrementAndGet()}"
    spark.conf.set(s"spark.sql.catalog.$cat", classOf[ManifestCatalog].getName)
    spark.conf.set(s"spark.sql.catalog.$cat.root", root)
    f(cat, root)
  }

  /** Batches insert DISJOINT id ranges (b*100+i). `props` lets a test
    * opt into the layouts that ACCRETE files per batch (mergeOnRead
    * appends) — the copy-on-write merge no longer does, since its
    * survivor write rebalances to one file per touched bucket. */
  private def seed(cat: String, rows: Int = 40, batches: Int = 3,
      props: String = ""): Unit = {
    spark.sql(s"""CREATE TABLE $cat.t (id BIGINT, p STRING, seq BIGINT)
      TBLPROPERTIES ('keyCol'='id', 'orderCol'='seq', 'buckets'='4'$props)""")
    for (b <- 1 to batches)
      spark.sql(s"INSERT INTO $cat.t VALUES " +
        (1 to rows).map(i => s"(${b * 100 + i}, 'b$b-$i', $b)").mkString(", "))
  }

  test("CALL compact folds per-batch files and returns the post-call (version, n_files)") {
    withCatalog { (cat, root) =>
      // merge-on-read: each INSERT appends its own per-bucket files, the
      // accretion shape compaction exists for (the CoW merge now leaves
      // exactly one file per touched bucket by construction)
      seed(cat, props = ", 'mergeOnRead'='true'")
      val before = ManifestUpsertSink.snapshotManifest(s"$root/t", None)
      assert(before.files.size > 4, "3 MoR appends leave per-batch files per touched bucket")
      val res = spark.sql(s"CALL $cat.system.compact('t')")
        .as[(Long, Long)].collect().toSeq
      val after = ManifestUpsertSink.snapshotManifest(s"$root/t", None)
      assert(res == Seq((after.version, after.files.size.toLong)),
        "the status row is the table's post-call head")
      assert(after.version == before.version + 1)
      assert(after.files.size == 4, "full compact = one file per bucket")
      assert(spark.sql(s"SELECT count(*) FROM $cat.t").as[Long].head() == 120)
    }
  }

  test("CALL vacuum reclaims history; CALL restore rolls back; both through SQL only") {
    withCatalog { (cat, root) =>
      seed(cat)
      // v0/v1/v2 = the three inserts; restore to v1 drops batch 3's keys
      spark.sql(s"CALL $cat.system.restore('t', 1)")
      assert(spark.sql(s"SELECT count(*) FROM $cat.t").as[Long].head() == 80)
      assert(spark.sql(s"SELECT count(*) FROM $cat.t WHERE id = 307").as[Long].head() == 0,
        "batch 3's keys are rolled back")
      // vacuum to the live version only: time travel past it dies
      spark.sql(s"CALL $cat.system.vacuum('t', 1)")
      intercept[Exception] {
        ManifestUpsertSink.readVersion(spark, s"$root/t", 2L).collect()
      }
      assert(spark.sql(s"SELECT count(*) FROM $cat.t").as[Long].head() == 80,
        "the live snapshot survives vacuum")
    }
  }

  test("CALL cluster/zorder rewrite the layout; expire_partitions drops old dates") {
    withCatalog { (cat, root) =>
      spark.sql(s"""CREATE TABLE $cat.ev (id BIGINT, day DATE, v DOUBLE, seq BIGINT)
        TBLPROPERTIES ('keyCol'='id', 'orderCol'='seq', 'buckets'='2', 'partCol'='day')""")
      spark.sql(s"INSERT INTO $cat.ev SELECT id, DATE'2024-01-01' + CAST(id % 4 AS INT), " +
        s"CAST(id AS DOUBLE), 0 FROM range(200)")
      spark.sql(s"CALL $cat.system.zorder('ev', 'v,id', 8)")
      assert(spark.sql(s"SELECT count(*) FROM $cat.ev").as[Long].head() == 200,
        "z-order rewrite preserves rows")
      spark.sql(s"CALL $cat.system.expire_partitions('ev', '2024-01-03')")
      val parts = ManifestUpsertSink.snapshotManifest(s"$root/ev", None)
        .files.flatMap(f => ManifestUpsertSink.partOf(f.path)).distinct.sorted
      assert(parts == Seq("2024-01-03", "2024-01-04"))
      assert(spark.sql(s"SELECT count(*) FROM $cat.ev").as[Long].head() == 100)
      // unknown procedure refuses loudly (Spark wraps the cause as
      // FAILED_TO_LOAD_ROUTINE; the cause carries the available list)
      intercept[Exception] { spark.sql(s"CALL $cat.system.nope('ev')") }
      // DESCRIBE HISTORY as a procedure: one row per committed version,
      // straight off the manifest log
      val hist = spark.sql(s"CALL $cat.system.history('ev')")
        .select("version", "n_files", "partition_col").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
      // CREATE TABLE writes only catalog properties — commits start at
      // the first INSERT: insert(v0), zorder(v1), expire(v2)
      assert(hist.length == 3, s"insert/zorder/expire = 3 versions: ${hist.toSeq}")
      assert(hist.forall(_._3 == "day"))
      assert(hist.map(_._1).toSeq == hist.map(_._1).toSeq.sorted)
    }
  }

  test("TRUNCATE TABLE: metadata-only empty version, epoch preserved, history until vacuum") {
    withCatalog { (cat, root) =>
      seed(cat, rows = 30, batches = 1)
      val before = ManifestUpsertSink.snapshotManifest(s"$root/t", None)
      val sc = spark.sparkContext
      sc.setJobGroup("trunc", "trunc")
      spark.sql(s"TRUNCATE TABLE $cat.t")
      val truncJobs = sc.statusTracker.getJobIdsForGroup("trunc").length
      sc.clearJobGroup()
      // the statement machinery may run one empty command job; the table's
      // data is provably untouched (no scan could finish in it — and the
      // manifest edit is the only filesystem effect, asserted below)
      assert(truncJobs <= 1, s"truncate must not scan the table: $truncJobs jobs")
      assert(spark.sql(s"SELECT count(*) FROM $cat.t").as[Long].head() == 0)
      val m = ManifestUpsertSink.manifestAt(s"$root/t", before.version + 1).get
      assert(m.files.isEmpty && m.keyCol == before.keyCol && m.buckets == before.buckets)
      // history intact; the next merge starts over under the same epoch
      assert(ManifestUpsertSink.readVersion(spark, s"$root/t", before.version).count() == 30)
      assert(m.partCol.isEmpty)
      spark.sql(s"INSERT INTO $cat.t VALUES (1, 'again', 9)")
      assert(spark.sql(s"SELECT p FROM $cat.t").as[String].collect().toSeq == Seq("again"))
    }
  }

  test("CALL repartition_by: partition evolution through SQL; CALL clone: SQL-visible shallow fork") {
    withCatalog { (cat, root) =>
      spark.sql(s"""CREATE TABLE $cat.t (id BIGINT, day DATE, v DOUBLE, seq BIGINT)
        TBLPROPERTIES ('keyCol'='id', 'orderCol'='seq', 'buckets'='2')""")
      spark.sql(s"""INSERT INTO $cat.t VALUES
        (1, DATE'2024-01-01', 1.0, 0), (2, DATE'2024-02-01', 2.0, 0)""")
      spark.sql(s"CALL $cat.system.repartition_by('t', 'day')")
      val m = ManifestUpsertSink.snapshotManifest(s"$root/t", None)
      assert(m.partCol.contains("day"))
      assert(m.files.forall(f => ManifestUpsertSink.partOf(f.path).isDefined))
      assert(spark.sql(s"SELECT sum(v) FROM $cat.t").as[Double].head() == 3.0)
      // expire through the evolved layout, then drop the layout again
      spark.sql(s"CALL $cat.system.expire_partitions('t', '2024-02-01')")
      assert(spark.sql(s"SELECT count(*) FROM $cat.t").as[Long].head() == 1L)
      spark.sql(s"CALL $cat.system.repartition_by('t', '')")
      assert(ManifestUpsertSink.snapshotManifest(s"$root/t", None).partCol.isEmpty)
      // shallow clone: zero copy, immediately SQL-visible, isolated
      spark.sql(s"CALL $cat.system.clone('t', 't_dev', false)")
      assert(spark.sql(s"SELECT count(*) FROM $cat.t_dev").as[Long].head() == 1L)
      spark.sql(s"DELETE FROM $cat.t WHERE id = 2")
      assert(spark.sql(s"SELECT count(*) FROM $cat.t_dev").as[Long].head() == 1L,
        "clone must not see post-fork source changes")
    }
  }

  test("CALL detail: layout + sidecar size census, zero data-file reads") {
    withCatalog { (cat, root) =>
      seed(cat, rows = 40, batches = 2)
      val sc = spark.sparkContext
      sc.setJobGroup("detail", "detail")
      val d = spark.sql(s"CALL $cat.system.detail('t')").collect().head
      sc.clearJobGroup()
      assert(sc.statusTracker.getJobIdsForGroup("detail").length <= 1,
        "DESCRIBE DETAIL must come off the manifest log, not a table scan")
      assert(d.getAs[String]("key_col") == "id")
      assert(d.getAs[Long]("buckets") == 4L)
      assert(d.getAs[Long]("total_rows") == 80L, "sidecar row totals must be exact")
      assert(d.getAs[Long]("total_bytes") > 0L, "commit-time byte sizes recorded")
      assert(d.getAs[Long]("n_versions") == 2L)
      assert(d.getAs[Long]("n_partitions") == 0L && d.getAs[String]("partition_col") == null)
      assert(!d.getAs[Boolean]("has_renames"))
      assert(!d.getAs[Boolean]("has_evolution"))
      // any metadata-only DDL flips the evolution flag; compact clears it
      spark.sql(s"ALTER TABLE $cat.t ADD COLUMN extra DOUBLE")
      assert(spark.sql(s"CALL $cat.system.detail('t')")
        .collect().head.getAs[Boolean]("has_evolution"))
      spark.sql(s"CALL $cat.system.compact('t')")
      assert(!spark.sql(s"CALL $cat.system.detail('t')")
        .collect().head.getAs[Boolean]("has_evolution"))
    }
  }

  test("CALL export_symlinks: consistent snapshot for external readers; dv/evolution refuse") {
    withCatalog { (cat, root) =>
      seed(cat, rows = 40, batches = 2)
      spark.sql(s"CALL $cat.system.export_symlinks('t')")
      val m = ManifestUpsertSink.latestManifest(s"$root/t").get
      val listed = new String(java.nio.file.Files.readAllBytes(
        java.nio.file.Paths.get(root, "t", "_symlink", s"v${m.version}",
          "symlink-manifest.txt")), "UTF-8").linesIterator.toSeq
      // the export IS the manifest's file list — an external engine
      // reading exactly these paths sees the committed snapshot
      assert(listed.toSet == m.files.map(_.path).toSet && listed.nonEmpty)
      val direct = spark.read.parquet(listed: _*).drop("__bucket")
      val viaConnector = spark.sql(s"SELECT * FROM $cat.t")
      assert(direct.count() == viaConnector.count())
      assert(direct.select("id", "p").as[(Long, String)].collect().toSet ==
        viaConnector.select("id", "p").as[(Long, String)].collect().toSet,
        "plain spark.read.parquet over the export equals the connector read")
      // a live metadata-only evolution makes the raw files unreadable as
      // the logical table: the export must refuse, not mislead
      spark.sql(s"ALTER TABLE $cat.t ADD COLUMN extra DOUBLE")
      val e = intercept[Exception] {
        spark.sql(s"CALL $cat.system.export_symlinks('t')")
      }
      assert(e.getMessage.contains("compact"), e.getMessage)
    }
  }

  test("CALL export_symlinks materialize => true: compacts the live dvs/evolution, then exports") {
    withCatalog { (cat, root) =>
      seed(cat, rows = 40, batches = 2)
      // live deletion vectors + a metadata-only add: the plain export
      // refuses (external readers can fold neither)
      new ManifestUpsertSink(s"$root/t", "id", 4)
        .deleteKeysMergeOnRead(Seq(103L, 209L).toDF("id"), 99L)
      spark.sql(s"ALTER TABLE $cat.t ADD COLUMN extra DOUBLE")
      intercept[Exception] { spark.sql(s"CALL $cat.system.export_symlinks('t')") }
      // materialize => true runs the compaction first and exports the
      // post-compaction version atomically
      spark.sql(s"CALL $cat.system.export_symlinks('t', materialize => true)")
      val m = ManifestUpsertSink.latestManifest(s"$root/t").get
      assert(m.dvs.isEmpty && !m.hasEvolution, "the export materialized first")
      val listed = new String(java.nio.file.Files.readAllBytes(
        java.nio.file.Paths.get(root, "t", "_symlink", s"v${m.version}",
          "symlink-manifest.txt")), "UTF-8").linesIterator.toSeq
      assert(listed.toSet == m.files.map(_.path).toSet && listed.nonEmpty)
      // the external read equals the connector read on a table that HAD
      // live dvs — the deleted keys are physically gone from the export
      val direct = spark.read.parquet(listed: _*).drop("__bucket")
      val viaConnector = spark.sql(s"SELECT id, p FROM $cat.t")
      assert(direct.count() == 78L && viaConnector.count() == 78L)
      assert(direct.select("id", "p").as[(Long, String)].collect().toSet ==
        viaConnector.as[(Long, String)].collect().toSet)
      // already-clean tables export without a spurious compaction commit
      val vBefore = ManifestUpsertSink.latestManifest(s"$root/t").get.version
      spark.sql(s"CALL $cat.system.export_symlinks('t', materialize => true)")
      assert(ManifestUpsertSink.latestManifest(s"$root/t").get.version == vBefore,
        "materialize on a clean table must not commit a pointless rewrite")
    }
  }

  test("named tags: zero-copy refs, VERSION AS OF by name, vacuum holds them until dropped") {
    withCatalog { (cat, root) =>
      seed(cat, rows = 10, batches = 2) // v0 (ids 101..110), v1 (+ 201..210)
      spark.sql(s"CALL $cat.system.tag('t', 'v-audit')") // pins v1
      spark.sql(s"INSERT INTO $cat.t VALUES (9001, 'x', 9)") // v2
      spark.sql(s"INSERT INTO $cat.t VALUES (9002, 'y', 9)") // v3
      // time travel BY NAME through SQL and through the reader option
      assert(spark.sql(s"SELECT COUNT(*) FROM $cat.t VERSION AS OF 'v-audit'")
        .head().getLong(0) == 20L)
      assert(spark.read.format("graft-manifest").option("versionAsOf", "v-audit")
        .load(s"$root/t").count() == 20L)
      val tagsDf = spark.sql(s"CALL $cat.system.tags('t')").collect()
        .map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(tagsDf == Map("v-audit" -> 1L), s"$tagsDf")
      // an unknown tag is loud, with the known tags listed
      val e = intercept[Exception] {
        spark.sql(s"SELECT * FROM $cat.t VERSION AS OF 'nope'").collect()
      }
      assert(e.getMessage.contains("v-audit"), e.getMessage)
      // tags are immutable refs; bad names refuse
      intercept[Exception] { spark.sql(s"CALL $cat.system.tag('t', 'v-audit')") }
      intercept[Exception] { spark.sql(s"CALL $cat.system.tag('t', '42')") }
      intercept[Exception] { spark.sql(s"CALL $cat.system.tag('t', 'a/b')") }
      // RETENTION: vacuum keep-1 would reclaim v1 — the tag HOLDS it
      spark.sql(s"CALL $cat.system.vacuum('t', 1)")
      assert(spark.sql(s"SELECT COUNT(*) FROM $cat.t VERSION AS OF 'v-audit'")
        .head().getLong(0) == 20L,
        "a tagged version must survive vacuum and stay readable")
      // drop_tag releases the hold; the next vacuum reclaims it
      spark.sql(s"CALL $cat.system.drop_tag('t', 'v-audit')")
      spark.sql(s"CALL $cat.system.vacuum('t', 1)")
      intercept[Exception] {
        spark.sql(s"SELECT * FROM $cat.t VERSION AS OF 1").collect()
      }
      assert(spark.sql(s"SELECT COUNT(*) FROM $cat.t").head().getLong(0) == 22L)
    }
  }

  test("writable branches: fork, diverge, time-travel by name, vacuum holds both chains") {
    withCatalog { (cat, root) =>
      spark.sql(s"""CREATE TABLE $cat.t (id BIGINT, p STRING, seq BIGINT)
        TBLPROPERTIES ('keyCol'='id', 'orderCol'='seq', 'buckets'='4',
          'mergeOnRead'='true')""")
      spark.sql(s"INSERT INTO $cat.t SELECT id, concat('p', id), 0L FROM range(1, 41)")
      spark.sql(s"CALL $cat.system.branch('t', 'dev')")
      val listed = spark.sql(s"CALL $cat.system.branches('t')").collect()
        .map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(listed == Map("dev" -> 0L), s"$listed")
      // a branch commit is INVISIBLE on main; main sees 40, dev sees 41
      spark.sql(s"INSERT INTO $cat.`t@dev` VALUES (9001, 'dev-only', 1)")
      assert(spark.sql(s"SELECT COUNT(*) FROM $cat.t").head().getLong(0) == 40L)
      assert(spark.sql(s"SELECT COUNT(*) FROM $cat.`t@dev`").head().getLong(0) == 41L)
      // MoR DELETE on the branch masks CARRIED rows — zero-copy fork,
      // deletion folds only on the branch's chain
      spark.sql(s"DELETE FROM $cat.`t@dev` WHERE id IN (7, 13)")
      assert(spark.sql(s"SELECT COUNT(*) FROM $cat.`t@dev`").head().getLong(0) == 39L)
      assert(spark.sql(s"SELECT COUNT(*) FROM $cat.t").head().getLong(0) == 40L,
        "a branch's deletion vector must not leak onto main")
      // main keeps evolving independently; VERSION AS OF 'dev' reads the
      // branch HEAD through the main table name
      spark.sql(s"INSERT INTO $cat.t VALUES (9002, 'main-only', 1)")
      assert(spark.sql(s"SELECT COUNT(*) FROM $cat.t").head().getLong(0) == 41L)
      assert(spark.sql(s"SELECT COUNT(*) FROM $cat.t VERSION AS OF 'dev'")
        .head().getLong(0) == 39L)
      assert(spark.sql(s"SELECT p FROM $cat.t VERSION AS OF 'dev' WHERE id = 9001")
        .head().getString(0) == "dev-only")
      // MAIN's rewrites + vacuum must NOT reclaim files the branch still
      // references: compact main (all files replaced), vacuum keep-1
      spark.sql(s"CALL $cat.system.compact('t')")
      spark.sql(s"CALL $cat.system.vacuum('t', 1)")
      assert(spark.sql(s"SELECT COUNT(*) FROM $cat.`t@dev`").head().getLong(0) == 39L,
        "vacuum on main must hold every file a live branch references")
      assert(spark.sql(s"SELECT COUNT(*) FROM $cat.t").head().getLong(0) == 41L)
      // branch verbs are full-table verbs: UPDATE + compact ON the branch
      spark.sql(s"UPDATE $cat.`t@dev` SET p = 'upd' WHERE id = 21")
      spark.sql(s"CALL $cat.system.compact('t@dev')")
      assert(spark.sql(s"SELECT p FROM $cat.`t@dev` WHERE id = 21")
        .head().getString(0) == "upd")
      assert(spark.sql(s"SELECT COUNT(*) FROM $cat.t").head().getLong(0) == 41L,
        "branch compaction must not change main")
      // CREATE TABLE on a branch name refuses with the right hint
      val e = intercept[Exception] {
        spark.sql(s"CREATE TABLE $cat.`x@y` (id BIGINT, seq BIGINT) " +
          "TBLPROPERTIES ('keyCol'='id', 'orderCol'='seq')")
      }
      assert(e.getMessage.contains("system.branch"), e.getMessage)
      // drop_branch releases the hold; the branch address dies
      spark.sql(s"CALL $cat.system.drop_branch('t', 'dev')")
      assert(spark.sql(s"CALL $cat.system.branches('t')").count() == 0)
      intercept[Exception] {
        spark.sql(s"SELECT * FROM $cat.`t@dev`").collect()
      }
      assert(spark.sql(s"SELECT COUNT(*) FROM $cat.t").head().getLong(0) == 41L)
    }
  }

  test("CALL fast_forward: write-audit-publish — branch commits replay onto main, branch retires") {
    withCatalog { (cat, root) =>
      spark.sql(s"""CREATE TABLE $cat.t (id BIGINT, p STRING, seq BIGINT)
        TBLPROPERTIES ('keyCol'='id', 'orderCol'='seq', 'buckets'='4',
          'mergeOnRead'='true')""")
      spark.sql(s"INSERT INTO $cat.t SELECT id, concat('p', id), 0L FROM range(1, 41)")
      val forkBytes = ManifestUpsertSink.latestManifest(s"$root/t").get.files.map(_.path)
        .map(p => p -> java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(p)).toSeq)
        .toMap
      spark.sql(s"CALL $cat.system.branch('t', 'wap')")
      // STAGE on the branch: insert (v1), MoR delete (v2), MoR update (v3)
      spark.sql(s"INSERT INTO $cat.`t@wap` VALUES (9001, 'staged', 1)")
      spark.sql(s"DELETE FROM $cat.`t@wap` WHERE id IN (7, 13)")
      spark.sql(s"UPDATE $cat.`t@wap` SET p = 'upd', seq = 2 WHERE id = 21")
      // AUDIT window: main still pinned at the fork
      assert(spark.sql(s"SELECT COUNT(*) FROM $cat.t").head().getLong(0) == 40L)
      // PUBLISH
      spark.sql(s"CALL $cat.system.fast_forward('t', 'wap')")
      assert(spark.sql(s"SELECT COUNT(*) FROM $cat.t").head().getLong(0) == 39L)
      assert(spark.sql(s"SELECT p FROM $cat.t WHERE id = 21").head().getString(0) == "upd")
      assert(spark.sql(s"SELECT p FROM $cat.t WHERE id = 9001").head().getString(0) == "staged")
      assert(spark.sql(s"SELECT COUNT(*) FROM $cat.t WHERE id IN (7, 13)")
        .head().getLong(0) == 0L)
      // the replay is zero-copy for carried files: the fork commit's data
      // files are byte-identical after the publish
      forkBytes.foreach { case (p, bytes) =>
        assert(java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(p)).toSeq == bytes,
          s"fast_forward must not rewrite a carried data file: $p")
      }
      // branch-own files (including the MoR delete's dv) now live under
      // MAIN's chain, outside _branches
      val headM = ManifestUpsertSink.latestManifest(s"$root/t").get
      assert(headM.version == 3L, s"main must adopt the branch HEAD, got v${headM.version}")
      assert(headM.dvs.nonEmpty, "the staged MoR delete's dv must publish")
      assert((headM.files.map(_.path) ++ headM.dvs.map(_.path))
        .forall(p => !p.contains("_branches")), "adopted paths must leave the branch root")
      // the published branch is retired
      assert(spark.sql(s"CALL $cat.system.branches('t')").count() == 0)
      intercept[Exception] { spark.sql(s"SELECT * FROM $cat.`t@wap`").collect() }
      // HISTORY survives the publish: intermediate adopted versions
      // time-travel on main
      assert(spark.sql(s"SELECT COUNT(*) FROM $cat.t VERSION AS OF 1")
        .head().getLong(0) == 41L)
      assert(spark.sql(s"SELECT COUNT(*) FROM $cat.t VERSION AS OF 2")
        .head().getLong(0) == 39L)
      // the CDC contract survives: a changes tail over the adopted window
      // replays the branch's verbs with their version stamps
      val src = new graft.sources.ManifestStreamSource(spark.sqlContext, s"$root/t",
        changesMode = true, startingVersion = Some(0L), maxVersionsPerTrigger = None,
        graft.sources.ManifestStreamSource.resolveSchema(spark.sqlContext, s"$root/t",
          changesMode = true))
      val got = src.changesBetween(1L, 3L).select("id", "change", "_version")
        .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
      assert(got == Set((9001L, "inserted", 1L), (7L, "deleted", 2L),
        (13L, "deleted", 2L), (21L, "updated", 3L)),
        s"the adopted feed must replay the staged statements: $got")
      // life goes on: main commits above the adopted head; vacuum keeps
      // the published snapshot readable
      spark.sql(s"INSERT INTO $cat.t VALUES (9002, 'after', 3)")
      spark.sql(s"CALL $cat.system.vacuum('t', 1)")
      assert(spark.sql(s"SELECT COUNT(*) FROM $cat.t").head().getLong(0) == 40L)
      assert(ManifestUpsertSink.latestManifest(s"$root/t").get.version == 4L)
    }
  }

  test("CALL fast_forward refuses a diverged main; a branch with nothing staged no-ops and stays") {
    withCatalog { (cat, root) =>
      spark.sql(s"""CREATE TABLE $cat.t (id BIGINT, p STRING, seq BIGINT)
        TBLPROPERTIES ('keyCol'='id', 'orderCol'='seq', 'buckets'='4')""")
      spark.sql(s"INSERT INTO $cat.t SELECT id, concat('p', id), 0L FROM range(1, 41)")
      spark.sql(s"CALL $cat.system.branch('t', 'dev')")
      // nothing staged: publish is a no-op and the branch SURVIVES
      spark.sql(s"CALL $cat.system.fast_forward('t', 'dev')")
      assert(spark.sql(s"CALL $cat.system.branches('t')").count() == 1)
      assert(ManifestUpsertSink.latestManifest(s"$root/t").get.version == 0L)
      // diverge both chains
      spark.sql(s"INSERT INTO $cat.t VALUES (9002, 'main-only', 1)")
      spark.sql(s"INSERT INTO $cat.`t@dev` VALUES (9001, 'dev-only', 1)")
      val e = intercept[Exception] {
        spark.sql(s"CALL $cat.system.fast_forward('t', 'dev')")
      }
      assert(e.getMessage.contains("diverged"), e.getMessage)
      // refusal is clean: both chains read on
      assert(spark.sql(s"SELECT COUNT(*) FROM $cat.t").head().getLong(0) == 41L)
      assert(spark.sql(s"SELECT COUNT(*) FROM $cat.`t@dev`").head().getLong(0) == 41L)
    }
  }

  test("CALL maintain: one verb applies the debt policy to table + branches; clean tables no-op") {
    withCatalog { (cat, root) =>
      spark.sql(s"""CREATE TABLE $cat.t (id BIGINT, p STRING, seq BIGINT)
        TBLPROPERTIES ('keyCol'='id', 'orderCol'='seq', 'buckets'='1',
          'mergeOnRead'='true')""")
      spark.sql(s"INSERT INTO $cat.t SELECT id, concat('p', id), 0L FROM range(1, 101)")
      // start from a settled layout (one file per bucket): the insert's
      // shuffle writes several part files, which IS small-file debt the
      // policy would rightly fold — this test isolates the DV policy
      spark.sql(s"CALL $cat.system.compact('t')")
      spark.sql(s"CALL $cat.system.branch('t', 'dev')")
      // 5% dv debt: under the default 10% policy — maintain must NOT
      // commit a rewrite (a clean-enough table is a cheap no-op)
      spark.sql(s"DELETE FROM $cat.t WHERE id <= 5")
      val vBefore = ManifestUpsertSink.latestManifest(s"$root/t").get.version
      spark.sql(s"CALL $cat.system.maintain('t')")
      assert(ManifestUpsertSink.latestManifest(s"$root/t").get.version == vBefore,
        "below-threshold debt must not trigger a rewrite")
      // stacked trickle deletes push main over 10% AND the branch too:
      // one maintain call settles both chains
      spark.sql(s"DELETE FROM $cat.t WHERE id > 5 AND id <= 15")
      spark.sql(s"DELETE FROM $cat.`t@dev` WHERE id <= 20")
      spark.sql(s"CALL $cat.system.maintain('t')")
      val m = ManifestUpsertSink.latestManifest(s"$root/t").get
      assert(m.dvs.isEmpty, s"over-threshold debt must materialize on main: ${m.dvs}")
      val b = ManifestUpsertSink.latestManifest(s"$root/t/_branches/dev").get
      assert(b.dvs.isEmpty, s"maintain must settle branch debt too: ${b.dvs}")
      assert(spark.sql(s"SELECT COUNT(*) FROM $cat.t").head().getLong(0) == 85L)
      assert(spark.sql(s"SELECT COUNT(*) FROM $cat.`t@dev`").head().getLong(0) == 80L)
      // per-table policy override: a 0.0 fraction rewrites ANY debt
      spark.sql(s"DELETE FROM $cat.t WHERE id = 99")
      spark.sql(s"CALL $cat.system.maintain('t')") // 1/85 ≈ 1.2% < 10%: no-op
      assert(ManifestUpsertSink.latestManifest(s"$root/t").get.dvs.nonEmpty)
      val props = s"$root/t/_catalog.properties"
      java.nio.file.Files.writeString(java.nio.file.Paths.get(props),
        java.nio.file.Files.readString(java.nio.file.Paths.get(props)) +
          "\nmaintainMaxDvFraction=0.0")
      spark.sql(s"CALL $cat.system.maintain('t')")
      assert(ManifestUpsertSink.latestManifest(s"$root/t").get.dvs.isEmpty,
        "a per-table zero-tolerance policy must settle any debt")
      assert(spark.sql(s"SELECT COUNT(*) FROM $cat.t").head().getLong(0) == 84L)
    }
  }

  test("tag creation is atomic create-if-absent: concurrent racers get exactly one winner") {
    withCatalog { (cat, root) =>
      seed(cat, rows = 5, batches = 1)
      // an exists-check + put would let several racers pass the check in
      // the same window and silently re-point the "immutable" ref; the
      // store's create-new primitive admits exactly one
      val pool = java.util.concurrent.Executors.newFixedThreadPool(8)
      val attempts = (1 to 8).map { _ =>
        pool.submit(new java.util.concurrent.Callable[Int] {
          override def call(): Int =
            try { ManifestUpsertSink.setTag(s"$root/t", "race", 0L); 1 }
            catch { case _: Exception => 0 }
        })
      }
      val wins = attempts.map(_.get()).sum
      pool.shutdown()
      assert(wins == 1, s"exactly one concurrent tag create may win (got $wins)")
      assert(ManifestUpsertSink.tagVersion(s"$root/t", "race").contains(0L))
    }
  }

  test("a corrupt tag ref ABORTS the vacuum sweep: never reclaim on a doubt") {
    withCatalog { (cat, root) =>
      seed(cat, rows = 10, batches = 3) // v0..v2
      // a torn/garbage tag ref (crashed writer, bit rot): vacuum cannot
      // know which version it held — the sweep must drop NOTHING
      java.nio.file.Files.write(
        java.nio.file.Paths.get(root, "t", "_manifest", "tag-broken.ref"),
        "not-a-version".getBytes("UTF-8"))
      spark.sql(s"CALL $cat.system.vacuum('t', 1)")
      assert(ManifestUpsertSink.committedVersions(s"$root/t") == Seq(0L, 1L, 2L),
        "an unreadable tag ref must abort the sweep, not be skipped")
      // removing the husk re-enables retention
      java.nio.file.Files.delete(
        java.nio.file.Paths.get(root, "t", "_manifest", "tag-broken.ref"))
      spark.sql(s"CALL $cat.system.vacuum('t', 1)")
      assert(ManifestUpsertSink.committedVersions(s"$root/t") == Seq(2L))
    }
  }

  test("vacuum reclaims stale symlink exports with their versions") {
    withCatalog { (cat, root) =>
      seed(cat, rows = 40, batches = 2) // v0, v1
      spark.sql(s"CALL $cat.system.export_symlinks('t')") // _symlink/v1
      spark.sql(s"INSERT INTO $cat.t VALUES (9001, 'x', 9)") // v2
      spark.sql(s"CALL $cat.system.export_symlinks('t')") // _symlink/v2
      spark.sql(s"CALL $cat.system.vacuum('t', 1)") // hold v2 only
      val base = java.nio.file.Paths.get(root, "t", "_symlink")
      assert(!java.nio.file.Files.exists(base.resolve("v1")),
        "a vacuumed version's export points at reclaimable files — it must go with it")
      assert(java.nio.file.Files.exists(
        base.resolve("v2").resolve("symlink-manifest.txt")),
        "the held version's export survives")
    }
  }

  test("ANALYZE TABLE COMPUTE STATISTICS rebuilds the sidecar; census comes back exact") {
    withCatalog { (cat, root) =>
      seed(cat, rows = 40, batches = 2)
      val m = ManifestUpsertSink.latestManifest(s"$root/t").get
      val sidecar = java.nio.file.Paths.get(root, "t", "_manifest", s"v${m.version}.stats")
      // simulate a torn/missing sidecar (pre-stats vintage, crashed
      // post-commit write): the census degrades to unknown
      java.nio.file.Files.delete(sidecar)
      assert(spark.sql(s"CALL $cat.system.detail('t')")
        .collect().head.isNullAt(
          spark.sql(s"CALL $cat.system.detail('t')").schema.fieldIndex("total_rows")),
        "a missing sidecar reports unknown rows, never a guess")
      // the standard vocabulary heals it: footer census, no data scan
      spark.sql(s"ANALYZE TABLE $cat.t COMPUTE STATISTICS")
      assert(java.nio.file.Files.exists(sidecar))
      assert(spark.sql(s"CALL $cat.system.detail('t')")
        .collect().head.getAs[Long]("total_rows") == 80L,
        "ANALYZE recomputes the exact commit-time census")
      // NOSCAN is the same footer-only census
      spark.sql(s"ANALYZE TABLE $cat.t COMPUTE STATISTICS NOSCAN")
      assert(spark.sql(s"CALL $cat.system.detail('t')")
        .collect().head.getAs[Long]("total_rows") == 80L)
    }
  }
}
