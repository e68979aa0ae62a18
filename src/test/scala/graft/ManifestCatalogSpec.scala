package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.sinks.ManifestUpsertSink
import graft.sources.ManifestCatalog

/** The lake as a SQL catalog: CREATE TABLE / INSERT INTO (= the LWW
  * MERGE) / SELECT / VERSION AS OF / RENAME / DROP all through
  * `spark.sql`, with catalog tables and path tables provably the same
  * thing underneath. */
class ManifestCatalogSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private val catSeq = new java.util.concurrent.atomic.AtomicInteger(0)

  /** Fresh catalog NAME per test (instances are cached per name by the
    * session's CatalogManager, so reusing a name would pin the first
    * test's root). Passes (catalogName, root) to the body. */
  private def withCatalog[A](f: (String, String) => A): A = {
    val root = java.nio.file.Files.createTempDirectory("graft_cat_").toString
    val cat = s"graft_t${catSeq.incrementAndGet()}"
    spark.conf.set(s"spark.sql.catalog.$cat", classOf[ManifestCatalog].getName)
    spark.conf.set(s"spark.sql.catalog.$cat.root", root)
    f(cat, root)
  }

  test("CREATE / INSERT-as-MERGE / SELECT / VERSION AS OF / RENAME / DROP through spark.sql") {
    import spark.implicits._
    withCatalog { (cat, root) =>
      spark.sql(s"""CREATE TABLE $cat.ev (id BIGINT, p STRING, seq BIGINT)
        TBLPROPERTIES ('keyCol'='id', 'orderCol'='seq', 'buckets'='4')""")
      assert(spark.sql(s"SELECT * FROM $cat.ev").count() == 0,
        "a created-but-empty table SELECTs zero rows, not an error")
      assert(spark.sql(s"SHOW TABLES IN $cat").collect().map(_.getString(1)).toSeq
        == Seq("ev"))

      spark.sql(s"INSERT INTO $cat.ev VALUES (1, 'a', 1), (2, 'b', 1)")
      Thread.sleep(25) // distinct commit stamps for the TIMESTAMP AS OF case
      // the second INSERT shares key 2: it must MERGE (LWW by seq),
      // never blind-append — the row count stays 3, not 4
      spark.sql(s"INSERT INTO $cat.ev VALUES (2, 'b2', 2), (3, 'c', 2)")
      val got = spark.sql(s"SELECT id, p FROM $cat.ev")
        .as[(Long, String)].collect().toMap
      assert(got == Map(1L -> "a", 2L -> "b2", 3L -> "c"),
        "INSERT INTO a lake table is the LWW MERGE")

      // time travel through SQL syntax
      assert(spark.sql(s"SELECT * FROM $cat.ev VERSION AS OF 0").count() == 2)
      assert(spark.sql(s"SELECT p FROM $cat.ev VERSION AS OF 0 WHERE id = 2")
        .as[String].head() == "b")
      // ... and by WALL CLOCK: the v0 commit's stamp resolves to v0
      val ts0 = ManifestUpsertSink.manifestAt(s"$root/ev", 0L).get.ts.get
      assert(spark.sql(
        s"SELECT p FROM $cat.ev TIMESTAMP AS OF timestamp_millis(${ts0}L) WHERE id = 2")
        .as[String].head() == "b",
        "TIMESTAMP AS OF the first commit's stamp reads the v0 snapshot")

      // a catalog table IS a path table: the Scala API reads it verbatim
      assert(ManifestUpsertSink.read(spark, s"$root/ev")
        .selectExpr("id", "p").as[(Long, String)].collect().toMap == got)
      val m = ManifestUpsertSink.snapshotManifest(s"$root/ev", None)
      assert(m.keyCol.contains("id") && m.buckets.contains(4))

      spark.sql(s"ALTER TABLE $cat.ev RENAME TO $cat.ev2")
      assert(spark.sql(s"SELECT count(*) FROM $cat.ev2").as[Long].head() == 3L)
      spark.sql(s"DROP TABLE $cat.ev2")
      assert(!java.nio.file.Files.exists(java.nio.file.Paths.get(root, "ev2")),
        "DROP must reclaim the table dir")
      assert(spark.sql(s"SHOW TABLES IN $cat").count() == 0)
    }
  }

  test("DELETE FROM by key through SQL: keyed copy-on-write delete with CDC feed; non-key predicates take the row-level path") {
    import spark.implicits._
    withCatalog { (cat, root) =>
      spark.sql(s"""CREATE TABLE $cat.ev (id BIGINT, p STRING, seq BIGINT)
        TBLPROPERTIES ('keyCol'='id', 'orderCol'='seq', 'buckets'='4')""")
      spark.sql(s"INSERT INTO $cat.ev VALUES (1, 'a', 1), (2, 'b', 1), (3, 'c', 1), (4, 'd', 1)")
      spark.sql(s"DELETE FROM $cat.ev WHERE id = 2")
      spark.sql(s"DELETE FROM $cat.ev WHERE id IN (4, 99)")
      assert(spark.sql(s"SELECT id FROM $cat.ev").as[Long].collect().toSet == Set(1L, 3L))
      // the SQL deletes recorded CDC feed rows with BEFORE images
      val m = ManifestUpsertSink.snapshotManifest(s"$root/ev", None)
      val feed = ManifestUpsertSink.readChanges(spark, s"$root/ev", m.version)
        .select("id", "change").as[(Long, String)].collect().toSet
      assert(feed == Set((4L, "deleted")), "absent key 99 must not enter the feed")
      // non-key predicates don't qualify for deleteWhere's metadata-only
      // path — Spark falls back to the row-level DELETE rewrite, which
      // scans the matches and routes them through the same keyed
      // copy-on-write delete (upgraded from a refusal in r12)
      spark.sql(s"DELETE FROM $cat.ev WHERE p = 'a'")
      assert(spark.sql(s"SELECT id FROM $cat.ev").as[Long].collect().toSet == Set(3L))
      val m2 = ManifestUpsertSink.snapshotManifest(s"$root/ev", None)
      val feed2 = ManifestUpsertSink.readChanges(spark, s"$root/ev", m2.version)
        .select("id", "change").as[(Long, String)].collect().toSet
      assert(feed2 == Set((1L, "deleted")), "the predicate delete records its CDC feed")
    }
  }

  test("ALTER TABLE RENAME COLUMN: metadata-only; SQL serves the mapping immediately; compact stays an optimization") {
    import spark.implicits._
    withCatalog { (cat, root) =>
      spark.sql(s"""CREATE TABLE $cat.ev (id BIGINT, p STRING, seq BIGINT)
        TBLPROPERTIES ('keyCol'='id', 'orderCol'='seq', 'buckets'='4')""")
      spark.sql(s"INSERT INTO $cat.ev VALUES (1, 'a', 1), (2, 'b', 1)")
      spark.sql(s"ALTER TABLE $cat.ev RENAME COLUMN p TO payload")
      // the committed mapping is live: SQL reads fold it IMMEDIATELY —
      // a zero-I/O rename must not make the table unreadable
      assert(spark.sql(s"SELECT payload FROM $cat.ev WHERE id = 1").as[String].head() == "a")
      assert(spark.sql(s"SELECT id, payload FROM $cat.ev ORDER BY id")
        .as[(Long, String)].collect().toSeq == Seq((1L, "a"), (2L, "b")))
      // compaction MATERIALIZES the mapping (vectorized scan returns) —
      // an optimization, no longer a read prerequisite
      spark.sql(s"CALL $cat.system.compact('ev')")
      assert(spark.sql(s"SELECT payload FROM $cat.ev WHERE id = 1").as[String].head() == "a")
      // renaming the ORDER column must keep catalog INSERTs merging,
      // INCLUDING while the mapping is live (no compact in between)
      spark.sql(s"ALTER TABLE $cat.ev RENAME COLUMN seq TO version")
      spark.sql(s"INSERT INTO $cat.ev VALUES (1, 'a2', 2)")
      assert(spark.sql(s"SELECT payload FROM $cat.ev WHERE id = 1").as[String].head() == "a2")
      // a created-but-never-written table renames instantly (declared
      // schema only — nothing to materialize)
      spark.sql(s"""CREATE TABLE $cat.empty (k BIGINT, v STRING, s BIGINT)
        TBLPROPERTIES ('keyCol'='k', 'orderCol'='s', 'buckets'='2')""")
      spark.sql(s"ALTER TABLE $cat.empty RENAME COLUMN v TO w")
      assert(spark.sql(s"SELECT w FROM $cat.empty").count() == 0)
      // non-evolution ALTERs refuse loudly
      intercept[Exception] {
        spark.sql(s"ALTER TABLE $cat.ev ALTER COLUMN payload TYPE BIGINT")
      }
    }
  }

  test("ALTER TABLE ADD/DROP COLUMN: metadata-only; SQL serves the fold immediately; UPDATE populates") {
    import spark.implicits._
    withCatalog { (cat, root) =>
      spark.sql(s"""CREATE TABLE $cat.ev (id BIGINT, p STRING, junk BIGINT, seq BIGINT)
        TBLPROPERTIES ('keyCol'='id', 'orderCol'='seq', 'buckets'='4')""")
      spark.sql(s"INSERT INTO $cat.ev VALUES (1, 'a', 9, 1), (2, 'b', 8, 1)")
      val filesBefore =
        ManifestUpsertSink.snapshotManifest(s"$root/ev", None).files.map(_.path).toSet

      // ADD COLUMN: zero data I/O, immediately SELECTable as typed nulls
      spark.sql(s"ALTER TABLE $cat.ev ADD COLUMN score DOUBLE")
      assert(ManifestUpsertSink.snapshotManifest(s"$root/ev", None)
        .files.map(_.path).toSet == filesBefore, "ADD COLUMN must rewrite nothing")
      assert(spark.sql(s"SELECT score FROM $cat.ev WHERE id = 1").as[Option[Double]].head().isEmpty)
      assert(spark.table(s"$cat.ev").schema("score").dataType
        == org.apache.spark.sql.types.DoubleType)

      // a row-level UPDATE populates it (copy-on-write of touched buckets)
      spark.sql(s"UPDATE $cat.ev SET score = 0.5 WHERE id = 2")
      assert(spark.sql(s"SELECT id, score FROM $cat.ev ORDER BY id")
        .as[(Long, Option[Double])].collect().toSeq
        == Seq((1L, None), (2L, Some(0.5))))
      // INSERT with the full evolved schema merges as ever
      spark.sql(s"INSERT INTO $cat.ev VALUES (3, 'c', 7, 2, 1.25)")
      assert(spark.sql(s"SELECT score FROM $cat.ev WHERE id = 3").as[Double].head() == 1.25)

      // DROP COLUMN: zero data I/O, the column vanishes from SQL at once
      spark.sql(s"ALTER TABLE $cat.ev DROP COLUMN junk")
      assert(!spark.table(s"$cat.ev").columns.contains("junk"))
      intercept[Exception] { spark.sql(s"SELECT junk FROM $cat.ev").collect() }
      // time travel still reads the pre-drop schema
      assert(spark.sql(s"SELECT junk FROM $cat.ev VERSION AS OF 0 WHERE id = 1")
        .as[Long].head() == 9L)
      // layout columns refuse
      intercept[Exception] { spark.sql(s"ALTER TABLE $cat.ev DROP COLUMN id") }
      intercept[Exception] { spark.sql(s"ALTER TABLE $cat.ev DROP COLUMN seq") }

      // compact materializes both; reads unchanged after
      spark.sql(s"CALL $cat.system.compact('ev')")
      assert(!ManifestUpsertSink.snapshotManifest(s"$root/ev", None).hasEvolution)
      assert(spark.sql(s"SELECT id, score FROM $cat.ev ORDER BY id")
        .as[(Long, Option[Double])].collect().toSeq
        == Seq((1L, None), (2L, Some(0.5)), (3L, Some(1.25))))

      // a created-but-never-written table evolves instantly (props only)
      spark.sql(s"""CREATE TABLE $cat.empty (k BIGINT, v STRING, s BIGINT)
        TBLPROPERTIES ('keyCol'='k', 'orderCol'='s', 'buckets'='2')""")
      spark.sql(s"ALTER TABLE $cat.empty ADD COLUMN extra STRING")
      spark.sql(s"ALTER TABLE $cat.empty DROP COLUMN v")
      assert(spark.table(s"$cat.empty").columns.toSeq == Seq("k", "s", "extra"))
    }
  }

  test("ALTER COLUMN TYPE: metadata-only widening; old vintages read promoted") {
    import spark.implicits._
    withCatalog { (cat, root) =>
      spark.sql(s"""CREATE TABLE $cat.w (id BIGINT, n INT, seq BIGINT)
        TBLPROPERTIES ('keyCol'='id', 'orderCol'='seq', 'buckets'='4')""")
      spark.sql(s"INSERT INTO $cat.w VALUES (1, 10, 1), (2, 20, 1)")
      val filesBefore =
        ManifestUpsertSink.snapshotManifest(s"$root/w", None).files.map(_.path).toSet
      spark.sql(s"ALTER TABLE $cat.w ALTER COLUMN n TYPE BIGINT")
      assert(ManifestUpsertSink.snapshotManifest(s"$root/w", None)
        .files.map(_.path).toSet == filesBefore, "widening must rewrite nothing")
      assert(spark.table(s"$cat.w").schema("n").dataType
        == org.apache.spark.sql.types.LongType)
      // an INSERT beyond Int.MaxValue proves the widened write path, and
      // the old int32 files read promoted next to it
      val big = Int.MaxValue.toLong + 5L
      spark.sql(s"INSERT INTO $cat.w VALUES (3, $big, 2)")
      assert(spark.sql(s"SELECT id, n FROM $cat.w ORDER BY id")
        .as[(Long, Long)].collect().toSeq == Seq((1L, 10L), (2L, 20L), (3L, big)))
      // lossy changes refuse
      intercept[Exception] { spark.sql(s"ALTER TABLE $cat.w ALTER COLUMN n TYPE INT") }
      intercept[Exception] { spark.sql(s"ALTER TABLE $cat.w ALTER COLUMN id TYPE DOUBLE") }
    }
  }

  test("CREATE TABLE AS SELECT: one statement creates the lake table and merges the seed") {
    import spark.implicits._
    withCatalog { (cat, root) =>
      Seq((1L, "a", 1L), (2L, "b", 1L), (2L, "b2", 2L))
        .toDF("id", "p", "seq").createOrReplaceTempView("ctas_src")
      spark.sql(s"""CREATE TABLE $cat.x
        TBLPROPERTIES ('keyCol'='id', 'orderCol'='seq', 'buckets'='4')
        AS SELECT * FROM ctas_src""")
      // the CTAS write IS the LWW merge: duplicate key 2 resolves by seq
      assert(spark.sql(s"SELECT id, p FROM $cat.x").as[(Long, String)].collect().toMap
        == Map(1L -> "a", 2L -> "b2"))
      val m = ManifestUpsertSink.snapshotManifest(s"$root/x", None)
      assert(m.keyCol.contains("id") && m.buckets.contains(4),
        "CTAS must commit the declared layout, not defaults")
      // and the table keeps merging like any created-then-inserted one
      spark.sql(s"INSERT INTO $cat.x VALUES (1, 'a2', 3)")
      assert(spark.sql(s"SELECT p FROM $cat.x WHERE id = 1").as[String].head() == "a2")
    }
  }

  test("tables built by the Scala API are visible and queryable through the catalog") {
    import spark.implicits._
    withCatalog { (cat, root) =>
      val sink = new ManifestUpsertSink(s"$root/scala_made", "id", buckets = 2)
      sink.upsertBatch(Seq((1L, "x", 1L), (2L, "y", 1L)).toDF("id", "p", "seq"), "seq", 0L)
      assert(spark.sql(s"SHOW TABLES IN $cat").collect().map(_.getString(1)).toSeq
        == Seq("scala_made"))
      assert(spark.sql(s"SELECT id, p FROM $cat.scala_made")
        .as[(Long, String)].collect().toMap == Map(1L -> "x", 2L -> "y"))
      // no _catalog.properties: INSERT has no orderCol to merge by — loud
      val e = intercept[Exception] {
        spark.sql(s"INSERT INTO $cat.scala_made VALUES (3, 'z', 2)")
      }
      assert(e.getMessage.contains("orderCol"))
    }
  }

  test("CREATE TABLE validates keyCol/orderCol; duplicate create fails; missing table raises") {
    withCatalog { (cat, _) =>
      intercept[IllegalArgumentException] {
        spark.sql(s"CREATE TABLE $cat.bad (id BIGINT) TBLPROPERTIES ('keyCol'='id')")
      }
      intercept[Exception] {
        spark.sql(s"SELECT * FROM $cat.nope").collect()
      }
      spark.sql(s"""CREATE TABLE $cat.t (id BIGINT, seq BIGINT)
        TBLPROPERTIES ('keyCol'='id', 'orderCol'='seq')""")
      intercept[Exception] {
        spark.sql(s"""CREATE TABLE $cat.t (id BIGINT, seq BIGINT)
          TBLPROPERTIES ('keyCol'='id', 'orderCol'='seq')""")
      }
    }
  }

  test("ADD COLUMN refuses NOT NULL (null-backed) and FIRST/AFTER positions, loudly") {
    withCatalog { (cat, root) =>
      spark.sql(s"""CREATE TABLE $cat.t (id BIGINT, seq BIGINT)
        TBLPROPERTIES ('keyCol'='id', 'orderCol'='seq', 'buckets'='2')""")
      spark.sql(s"INSERT INTO $cat.t VALUES (1, 0)")
      // a metadata-only add is null-backed: committing a NOT NULL column
      // would serve nulls for a column the user declared non-null
      val e1 = intercept[Exception] {
        spark.sql(s"ALTER TABLE $cat.t ADD COLUMN c INT NOT NULL")
      }
      assert(e1.getMessage.contains("null-backed"), e1.getMessage)
      // positions are silently-appended lies: refuse, don't reorder
      val e2 = intercept[Exception] {
        spark.sql(s"ALTER TABLE $cat.t ADD COLUMN c INT FIRST")
      }
      assert(e2.getMessage.contains("FIRST/AFTER"), e2.getMessage)
      // neither refusal touched the manifest
      assert(ManifestUpsertSink.latestManifest(s"$root/t").get.addedCols.isEmpty,
        "a refused ADD COLUMN must not evolve the manifest")
    }
  }

  test("ALTER validates catalog props BEFORE committing the sink DDL: both surfaces change or neither") {
    withCatalog { (cat, root) =>
      spark.sql(s"""CREATE TABLE $cat.t (id BIGINT, seq BIGINT)
        TBLPROPERTIES ('keyCol'='id', 'orderCol'='seq', 'buckets'='2')""")
      spark.sql(s"INSERT INTO $cat.t VALUES (1, 0)")
      // simulate schemaDDL drift: the declared schema already carries the
      // name about to be added (a hand-edited or drifted props file)
      val propsPath = java.nio.file.Paths.get(root, "t", "_catalog.properties")
      val drifted = new String(java.nio.file.Files.readAllBytes(propsPath), "UTF-8")
        .linesIterator.map(l =>
          if (l.startsWith("schemaDDL=")) s"$l,c INT" else l).mkString("\n")
      java.nio.file.Files.write(propsPath, drifted.getBytes("UTF-8"))
      val before = ManifestUpsertSink.latestManifest(s"$root/t").get
      val e = intercept[Exception] { spark.sql(s"ALTER TABLE $cat.t ADD COLUMN c INT") }
      assert(e.getMessage.contains("already exists"), e.getMessage)
      val after = ManifestUpsertSink.latestManifest(s"$root/t").get
      assert(after.version == before.version && after.addedCols.isEmpty,
        "a props-side validation failure must abort BEFORE the manifest evolves — " +
          "no half-applied ALTER")
    }
  }
}
