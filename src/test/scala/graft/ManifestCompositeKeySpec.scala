package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.datasources.v2.BatchScanExec
import org.apache.spark.sql.execution.datasources.v2.parquet.ParquetScan
import org.apache.spark.sql.functions._

import graft.sinks.{ManifestStats, ManifestUpsertSink}
import graft.sources.ManifestCatalog

/** COMPOSITE KEYS on the manifest lake: `keyCol = "tenant_id,entity_id"`
  * keys the table on the TUPLE — bucket hashing, LWW, the CDC feed,
  * deletes, bucket pruning, and the SQL verbs all operate on the
  * components. The load-bearing semantic: the same entity under two
  * tenants is TWO rows, never a collision. */
class ManifestCompositeKeySpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def tmp(prefix: String): String =
    java.nio.file.Files.createTempDirectory(prefix).toString

  private def scannedFiles(df: DataFrame): Int =
    df.queryExecution.sparkPlan.collect {
      case b: BatchScanExec => b.scan match {
        case m: graft.sources.ManifestSource.ManifestScan => m.plannedFiles.length
        case p: ParquetScan => p.fileIndex.inputFiles.length
      }
    }.sum

  test("lifecycle on a (tenant, entity) key: tuple LWW, no cross-tenant collision, tuple deletes, CDC feed carries both components") {
    val root = tmp("graft_ck_")
    val sink = new ManifestUpsertSink(root, "tenant,entity", buckets = 8)
    // the same entity ids under TWO tenants — the single-key trap
    val seed = (1L to 20L).flatMap(e => Seq((1L, e, s"t1-$e", 0L), (2L, e, s"t2-$e", 0L)))
      .toDF("tenant", "entity", "p", "seq")
    sink.upsertBatch(seed, "seq", 0L)
    assert(ManifestUpsertSink.read(spark, root).count() == 40,
      "same entity under two tenants must be two rows")

    // LWW replaces exactly the addressed tuple, including within-batch dedup
    sink.upsertBatch(Seq(
      (1L, 5L, "t1-5-old", 1L), (1L, 5L, "t1-5-new", 2L), // within-batch LWW on the tuple
      (2L, 7L, "t2-7-new", 1L)).toDF("tenant", "entity", "p", "seq"), "seq", 1L)
    val rows = ManifestUpsertSink.read(spark, root)
      .select("tenant", "entity", "p").as[(Long, Long, String)].collect()
      .map(r => (r._1, r._2) -> r._3).toMap
    assert(rows((1L, 5L)) == "t1-5-new" && rows((2L, 5L)) == "t2-5")
    assert(rows((2L, 7L)) == "t2-7-new" && rows((1L, 7L)) == "t1-7")

    // the CDC feed carries BOTH key components
    val feed = ManifestUpsertSink.readChanges(spark, root, 1L)
    assert(feed.columns.take(2).toSeq == Seq("tenant", "entity"))
    assert(feed.select("tenant", "entity", "change").as[(Long, Long, String)]
      .collect().toSet == Set((1L, 5L, "updated"), (2L, 7L, "updated")))

    // tuple deletes: (1,9) dies, (2,9) survives
    sink.deleteKeys(Seq((1L, 9L)).toDF("tenant", "entity"), 2L)
    val after = ManifestUpsertSink.read(spark, root)
      .filter(col("entity") === 9L).select("tenant").as[Long].collect().toSet
    assert(after == Set(2L), "a tuple delete must not touch the other tenant's row")

    // epoch guard: the key spec (order included) is the table's identity
    intercept[IllegalStateException] {
      new ManifestUpsertSink(root, "entity,tenant", buckets = 8)
        .upsertBatch(Seq((1L, 1L, "x", 9L)).toDF("tenant", "entity", "p", "seq"), "seq", 9L)
    }
  }

  test("conjunctive-equality point lookup prunes to one bucket's files") {
    val root = tmp("graft_ck_prune_")
    val sink = new ManifestUpsertSink(root, "tenant,entity", buckets = 8)
    sink.upsertBatch((1L to 2000L).map(i => (i % 10, i, s"v$i", 0L))
      .toDF("tenant", "entity", "p", "seq"), "seq", 0L)
    val table = spark.read.format("graft-manifest").load(root)
    val total = scannedFiles(table)
    assert(total >= 8, s"all 8 buckets hold data: $total files")
    val probe = table.filter(col("tenant") === 3L && col("entity") === 13L)
    val scanned = scannedFiles(probe)
    assert(scanned <= total / 4,
      s"a pinned (tenant, entity) tuple must read ~one bucket: $scanned of $total")
    assert(probe.count() == 1, "pruning must not drop the row")
    // parity pin: the driver-side tuple hash equals the write path's
    val m = ManifestUpsertSink.snapshotManifest(root, None)
    val want = ManifestStats.bucketOfTuple(Seq(3L: java.lang.Long, 13L: java.lang.Long), 8).get
    val bucketFiles = m.files.filter(_.bucket == want).map(_.path).toSet
    val probedFiles = probe.queryExecution.sparkPlan.collect {
      case b: BatchScanExec => b.scan match {
        case m: graft.sources.ManifestSource.ManifestScan => m.plannedFiles.toSet
        // the file index reports file:/// URIs; the manifest stores plain paths
        case p: ParquetScan =>
          p.fileIndex.inputFiles.map(_.replaceFirst("^file:/*", "/")).toSet
      }
    }.flatten.toSet
    assert(probedFiles.subsetOf(bucketFiles),
      "the probe must read only the tuple's own bucket")
    // a HALF-pinned tuple cannot compute a bucket: no tuple pruning
    // (stats may still prune) but never a wrong result
    assert(table.filter(col("entity") === 13L).count() == 1)
  }

  test("SQL surface end-to-end on a composite key: CREATE/INSERT-as-MERGE/UPDATE/DELETE") {
    val root = tmp("graft_ck_sql_")
    val cat = "graft_ck_cat"
    spark.conf.set(s"spark.sql.catalog.$cat", classOf[ManifestCatalog].getName)
    spark.conf.set(s"spark.sql.catalog.$cat.root", root)
    spark.sql(s"""CREATE TABLE $cat.t (tenant BIGINT, entity BIGINT, bal DOUBLE, seq BIGINT)
      TBLPROPERTIES ('keyCol'='tenant,entity', 'orderCol'='seq', 'buckets'='4')""")
    spark.sql(s"INSERT INTO $cat.t VALUES (1, 1, 10.0, 0), (1, 2, 20.0, 0), (2, 1, 30.0, 0)")
    // INSERT merges on the TUPLE: (1,1) replaced, (2,1) untouched
    spark.sql(s"INSERT INTO $cat.t VALUES (1, 1, 11.0, 1)")
    assert(spark.sql(s"SELECT bal FROM $cat.t WHERE tenant = 1 AND entity = 1")
      .as[Double].head() == 11.0)
    assert(spark.sql(s"SELECT bal FROM $cat.t WHERE tenant = 2 AND entity = 1")
      .as[Double].head() == 30.0)
    // row-level UPDATE with the composite row identity
    spark.sql(s"UPDATE $cat.t SET bal = bal + 100.0 WHERE entity = 1")
    assert(spark.sql(s"SELECT sum(bal) FROM $cat.t").as[Double].head() == 111.0 + 130.0 + 20.0)
    // conjunctive-equality DELETE routes through the row-level path
    spark.sql(s"DELETE FROM $cat.t WHERE tenant = 1 AND entity = 1")
    assert(spark.sql(s"SELECT tenant, entity FROM $cat.t").as[(Long, Long)]
      .collect().toSet == Set((1L, 2L), (2L, 1L)))
    // MERGE INTO with both components in the ON condition
    Seq((2L, 1L, 99.0, 2L), (3L, 3L, 7.0, 2L)).toDF("tenant", "entity", "bal", "seq")
      .createOrReplaceTempView("ck_src")
    spark.sql(s"""MERGE INTO $cat.t AS t USING ck_src AS s
      ON t.tenant = s.tenant AND t.entity = s.entity
      WHEN MATCHED THEN UPDATE SET *
      WHEN NOT MATCHED THEN INSERT *""")
    assert(spark.sql(s"SELECT tenant, entity, bal FROM $cat.t")
      .as[(Long, Long, Double)].collect().toSet
      == Set((1L, 2L, 20.0), (2L, 1L, 99.0), (3L, 3L, 7.0)))
  }

  test("renaming a key component re-keys the spec; bad specs are refused") {
    val root = tmp("graft_ck_ren_")
    val sink = new ManifestUpsertSink(root, "tenant,entity", buckets = 2)
    sink.upsertBatch(Seq((1L, 1L, "a", 0L)).toDF("tenant", "entity", "p", "seq"), "seq", 0L)
    val renamed = sink.renameColumn(spark, "tenant", "org")
    assert(ManifestUpsertSink.snapshotManifest(root, None).keyCol.contains("org,entity"))
    // the old handle is dead, the returned one lives on the new spec
    intercept[IllegalStateException] {
      sink.upsertBatch(Seq((2L, 2L, "b", 1L)).toDF("tenant", "entity", "p", "seq"), "seq", 1L)
    }
    renamed.compact(spark) // materialize the rename for the connector
    renamed.upsertBatch(Seq((2L, 2L, "b", 1L)).toDF("org", "entity", "p", "seq"), "seq", 1L)
    assert(ManifestUpsertSink.read(spark, root).count() == 2)

    intercept[IllegalArgumentException] { new ManifestUpsertSink(root, "a,,b", 2) }
    intercept[IllegalArgumentException] { new ManifestUpsertSink(root, "a,a", 2) }
    intercept[IllegalArgumentException] { new ManifestUpsertSink(root, ",", 2) }
  }

  test("deep clone of a composite-key table buckets by the full tuple") {
    import spark.implicits._
    val root = java.nio.file.Files.createTempDirectory("graft_ck_clone_").toString
    val clRoot = java.nio.file.Files.createTempDirectory("graft_ck_clone_tgt_").toString
    java.nio.file.Files.delete(java.nio.file.Paths.get(clRoot))
    val sink = new ManifestUpsertSink(root, "tenant,entity", buckets = 4)
    sink.upsertBatch((1L to 20L).map(i => (i % 3, i, s"v$i", 0L))
      .toDF("tenant", "entity", "p", "seq"), "seq", 0L)
    val clone = sink.cloneTo(spark, clRoot, deep = true)
    assert(clone.read(spark).count() == 20)
    // the clone's bucketing is the write-path tuple hash: a post-clone
    // merge must land in the same buckets (a mis-bucketed clone would
    // duplicate keys on its next merge)
    clone.upsertBatch(Seq((1L, 1L, "upd", 1L)).toDF("tenant", "entity", "p", "seq"), "seq", 1L)
    assert(clone.read(spark).count() == 20, "tuple-keyed merge must replace, not append")
    assert(clone.read(spark).filter(col("p") === "upd").count() == 1)
  }
}
