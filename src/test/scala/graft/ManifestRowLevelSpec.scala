package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.sinks.ManifestUpsertSink
import graft.sources.ManifestCatalog

/** SQL UPDATE / MERGE INTO on manifest-lake tables — the SupportsDelta
  * row-level operation: Spark's rewrites plan the matching, the sink's
  * committed MERGE/DELETE protocol applies the per-row verdicts. Pins
  * semantics (including key-moving updates and MERGE DELETE clauses),
  * CDC visibility, and the staged-delta hygiene. */
class ManifestRowLevelSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private val catSeq = new java.util.concurrent.atomic.AtomicInteger(0)

  private def withCatalog[A](f: (String, String) => A): A = {
    val root = java.nio.file.Files.createTempDirectory("graft_rlo_").toString
    val cat = s"graft_rlo${catSeq.incrementAndGet()}"
    spark.conf.set(s"spark.sql.catalog.$cat", classOf[ManifestCatalog].getName)
    spark.conf.set(s"spark.sql.catalog.$cat.root", root)
    f(cat, root)
  }

  private def seed(cat: String): Unit = {
    spark.sql(s"""CREATE TABLE $cat.t (id BIGINT, p STRING, bal DOUBLE, seq BIGINT)
      TBLPROPERTIES ('keyCol'='id', 'orderCol'='seq', 'buckets'='4')""")
    spark.sql(s"INSERT INTO $cat.t VALUES " +
      (1L to 12L).map(i => s"($i, 'p$i', ${i * 10}.0, 0)").mkString(", "))
  }

  test("UPDATE with an arbitrary predicate: matched rows rewritten in place, CDC-visible") {
    import spark.implicits._
    withCatalog { (cat, root) =>
      seed(cat)
      spark.sql(s"UPDATE $cat.t SET bal = bal * 2, p = 'upd' WHERE bal >= 100.0 AND id % 2 = 0")
      val got = spark.sql(s"SELECT id, p, bal FROM $cat.t")
        .as[(Long, String, Double)].collect().map(r => r._1 -> (r._2, r._3)).toMap
      for (i <- 1L to 12L) {
        if (i >= 10 && i % 2 == 0) assert(got(i) == ("upd", i * 20.0), s"id $i")
        else assert(got(i) == (s"p$i", i * 10.0), s"id $i untouched")
      }
      // the update went through the ordinary merge: an `updated` feed row
      // per matched key, nothing else
      val m = ManifestUpsertSink.snapshotManifest(s"$root/t", None)
      val feed = ManifestUpsertSink.readChanges(spark, s"$root/t", m.version)
        .select("id", "change").as[(Long, String)].collect().toSet
      assert(feed == Set((10L, "updated"), (12L, "updated")))
      // no staged delta survives a committed statement
      assert(!new java.io.File(s"$root/t/_stage").exists(),
        "the row-level stage dir must be cleaned up")
    }
  }

  test("UPDATE matching zero rows is a clean no-op (no new version)") {
    withCatalog { (cat, root) =>
      seed(cat)
      val before = ManifestUpsertSink.snapshotManifest(s"$root/t", None).version
      spark.sql(s"UPDATE $cat.t SET bal = 0.0 WHERE id > 1000")
      assert(ManifestUpsertSink.snapshotManifest(s"$root/t", None).version == before)
    }
  }

  test("key-moving UPDATE: SET id = id + 100 relocates rows exactly once") {
    import spark.implicits._
    withCatalog { (cat, root) =>
      seed(cat)
      // moves keys 1..3 to 101..103: the old keys must DIE (delete) and
      // the new keys appear (merge) — the delete-plus-upsert split with
      // the re-occupation anti-join deciding which old keys survive
      spark.sql(s"UPDATE $cat.t SET id = id + 100 WHERE id <= 3")
      val ids = spark.sql(s"SELECT id FROM $cat.t").as[Long].collect().toSet
      assert(ids == ((4L to 12L).toSet ++ Set(101L, 102L, 103L)))
      // chained relocation where old and new key sets OVERLAP: every row
      // moves exactly once, no row is lost to its neighbour's delete
      spark.sql(s"UPDATE $cat.t SET id = id + 1 WHERE id BETWEEN 4 AND 12")
      val ids2 = spark.sql(s"SELECT id FROM $cat.t").as[Long].collect().toSet
      assert(ids2 == ((5L to 13L).toSet ++ Set(101L, 102L, 103L)),
        s"overlapping key shift must keep all rows: $ids2")
      assert(spark.sql(s"SELECT p FROM $cat.t WHERE id = 13").as[String].head() == "p12")
    }
  }

  test("MERGE INTO: matched update + not-matched insert equals the Scala upsertBatch") {
    import spark.implicits._
    withCatalog { (cat, root) =>
      seed(cat)
      (Seq((10L, "m10", 1.5, 1L), (11L, "m11", 2.5, 1L), (50L, "new50", 9.0, 1L)))
        .toDF("id", "p", "bal", "seq").createOrReplaceTempView("rlo_src")
      spark.sql(s"""MERGE INTO $cat.t AS t USING rlo_src AS s ON t.id = s.id
        WHEN MATCHED THEN UPDATE SET *
        WHEN NOT MATCHED THEN INSERT *""")
      val got = spark.sql(s"SELECT id, p, bal FROM $cat.t")
        .as[(Long, String, Double)].collect().toSet
      // the reference result from the Scala-API protocol on a twin table
      val twin = java.nio.file.Files.createTempDirectory("graft_rlo_twin_").toString
      val sink = new ManifestUpsertSink(twin, "id", buckets = 4)
      sink.upsertBatch((1L to 12L).map(i => (i, s"p$i", i * 10.0, 0L))
        .toDF("id", "p", "bal", "seq"), "seq", 0L)
      sink.upsertBatch(spark.table("rlo_src"), "seq", 1L)
      val want = ManifestUpsertSink.read(spark, twin).select("id", "p", "bal")
        .as[(Long, String, Double)].collect().toSet
      assert(got == want, "SQL MERGE INTO == Scala upsertBatch, row for row")
    }
  }

  test("MERGE INTO with a DELETE clause and conditional actions") {
    import spark.implicits._
    withCatalog { (cat, root) =>
      seed(cat)
      Seq((1L, 0.0, 1L), (2L, 99.0, 1L), (77L, 7.0, 1L))
        .toDF("id", "bal", "seq").createOrReplaceTempView("rlo_src2")
      val before = ManifestUpsertSink.snapshotManifest(s"$root/t", None).version
      spark.sql(s"""MERGE INTO $cat.t AS t USING rlo_src2 AS s ON t.id = s.id
        WHEN MATCHED AND s.bal = 0.0 THEN DELETE
        WHEN MATCHED THEN UPDATE SET t.bal = s.bal, t.seq = s.seq
        WHEN NOT MATCHED THEN INSERT (id, p, bal, seq) VALUES (s.id, 'ins', s.bal, s.seq)""")
      val got = spark.sql(s"SELECT id, bal FROM $cat.t")
        .as[(Long, Double)].collect().toMap
      assert(!got.contains(1L), "matched-and-zero deletes")
      assert(got(2L) == 99.0, "matched updates")
      assert(got(77L) == 7.0, "not-matched inserts")
      assert(got.size == 12, s"12 keys after 1 delete + 1 insert: ${got.keySet.toSeq.sorted}")
      // ATOMICITY: the whole statement — update, delete, insert — is ONE
      // committed version with ONE combined CDC feed; no reader can ever
      // observe a half-applied intermediate (the two-commit shape this
      // pins against had exactly that crash/visibility hole)
      val head = ManifestUpsertSink.snapshotManifest(s"$root/t", None).version
      assert(head == before + 1, s"one MERGE statement = one commit ($before -> $head)")
      val feed = ManifestUpsertSink.readChanges(spark, s"$root/t", head)
        .select("id", "change").as[(Long, String)].collect().toSet
      assert(feed == Set((1L, "deleted"), (2L, "updated"), (77L, "inserted")))
    }
  }

  test("a failing MERGE aborts cleanly: no staged delta survives, the table is untouched") {
    import spark.implicits._
    withCatalog { (cat, root) =>
      seed(cat)
      val before = ManifestUpsertSink.snapshotManifest(s"$root/t", None)
      // two source rows match one target key -> Spark's MERGE cardinality
      // check throws mid-execution; the delta write must abort
      Seq((1L, 1.0, 1L), (1L, 2.0, 2L)).toDF("id", "bal", "seq")
        .createOrReplaceTempView("rlo_dup")
      intercept[Exception] {
        spark.sql(s"""MERGE INTO $cat.t AS t USING rlo_dup AS s ON t.id = s.id
          WHEN MATCHED THEN UPDATE SET t.bal = s.bal, t.seq = s.seq""")
      }
      val after = ManifestUpsertSink.snapshotManifest(s"$root/t", None)
      assert(after.version == before.version, "no commit from an aborted statement")
      assert(!new java.io.File(s"$root/t/_stage").exists(),
        "the aborted statement's staged delta must be cleaned up")
      assert(spark.sql(s"SELECT sum(bal) FROM $cat.t").as[Double].head()
        == (1L to 12L).map(_ * 10.0).sum, "rows unchanged")
    }
  }

  test("INSERT of a NULL key refuses loudly (the key is non-nullable by contract)") {
    withCatalog { (cat, root) =>
      seed(cat)
      intercept[Exception] {
        spark.sql(s"INSERT INTO $cat.t VALUES (NULL, 'x', 0.0, 9)")
      }
      assert(spark.sql(s"SELECT count(*) FROM $cat.t").collect()(0).getLong(0) == 12L,
        "a refused null-key insert must not land rows")
    }
  }

  test("MERGE INTO whose source only inserts commits a single merge version") {
    import spark.implicits._
    withCatalog { (cat, root) =>
      seed(cat)
      val before = ManifestUpsertSink.snapshotManifest(s"$root/t", None).version
      Seq((200L, 1.0, 1L)).toDF("id", "bal", "seq").createOrReplaceTempView("rlo_src3")
      spark.sql(s"""MERGE INTO $cat.t AS t USING rlo_src3 AS s ON t.id = s.id
        WHEN NOT MATCHED THEN INSERT (id, p, bal, seq) VALUES (s.id, 'x', s.bal, s.seq)""")
      val after = ManifestUpsertSink.snapshotManifest(s"$root/t", None).version
      assert(after == before + 1, "no empty delete commit when nothing died")
      assert(spark.sql(s"SELECT count(*) FROM $cat.t").as[Long].head() == 13L)
    }
  }
}
