package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.datasources.v2.BatchScanExec
import org.apache.spark.sql.execution.datasources.v2.parquet.ParquetScan
import org.apache.spark.sql.functions._

import graft.sinks.ManifestUpsertSink
import graft.sources.ManifestCatalog

/** DATE PARTITIONING on the manifest lake: `partitionCol` adds a
  * `__pdate=yyyy-MM-dd` directory level under each bucket — time-range
  * reads prune whole partitions through the connector BY CONSTRUCTION,
  * and retention ([[ManifestUpsertSink.dropPartitionsBefore]]) is a
  * manifest edit, not a table rewrite. The K2 date layout
  * (reference core.clj:47-50), lifted to the lake tier. */
class ManifestPartitionSpec extends AnyFunSuite {
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

  private def seed(root: String): ManifestUpsertSink = {
    val sink = new ManifestUpsertSink(root, "id", buckets = 4,
      partitionCol = Some("day"))
    val rows = (1L to 400L).map { i =>
      (i, java.sql.Date.valueOf(s"2024-01-${(i % 4 + 1).formatted("%02d")}"), s"v$i", 0L)
    }
    sink.upsertBatch(rows.toDF("id", "day", "p", "seq"), "seq", 0L)
    sink
  }

  test("partitioned layout: files land under __bucket/__pdate; merge replaces across partitions; reads are exact") {
    val root = tmp("graft_part_")
    val sink = seed(root)
    val m = ManifestUpsertSink.snapshotManifest(root, None)
    val parts = m.files.flatMap(f => ManifestUpsertSink.partOf(f.path)).distinct.sorted
    assert(parts == Seq("2024-01-01", "2024-01-02", "2024-01-03", "2024-01-04"))
    assert(m.partCol.contains("day"), "the partition column is committed layout")

    // a key MOVING to a new date: the old row (old partition, same
    // bucket) must die — copy-on-write rewrites the whole touched
    // bucket, every partition of it
    sink.upsertBatch(Seq((5L, java.sql.Date.valueOf("2024-01-04"), "moved", 1L))
      .toDF("id", "day", "p", "seq"), "seq", 1L)
    val got = ManifestUpsertSink.read(spark, root).filter(col("id") === 5L)
      .select("day", "p").as[(java.sql.Date, String)].collect().toSeq
    assert(got == Seq((java.sql.Date.valueOf("2024-01-04"), "moved")),
      s"a date-moving upsert must not leave the old partition's row: $got")
    assert(ManifestUpsertSink.read(spark, root).count() == 400)

    // the epoch guard: an unpartitioned writer on a partitioned table dies
    intercept[IllegalStateException] {
      new ManifestUpsertSink(root, "id", buckets = 4)
        .upsertBatch(Seq((9L, java.sql.Date.valueOf("2024-01-01"), "x", 2L))
          .toDF("id", "day", "p", "seq"), "seq", 2L)
    }
  }

  test("date predicates prune partitions through the connector; null dates stay conservative") {
    val root = tmp("graft_partprune_")
    seed(root)
    val table = spark.read.format("graft-manifest").load(root)
    val total = scannedFiles(table)
    // equality: one of four partitions
    val eq = table.filter(col("day") === java.sql.Date.valueOf("2024-01-02"))
    assert(scannedFiles(eq) <= total / 3,
      s"a one-day equality must prune most partitions: ${scannedFiles(eq)} of $total")
    assert(eq.count() == 100)
    // range: two of four partitions
    val range = table.filter(col("day") >= java.sql.Date.valueOf("2024-01-03"))
    assert(scannedFiles(range) <= total / 2 + 1)
    assert(range.count() == 200)
    // combined with a key lookup: partition ∩ bucket
    val point = table.filter(col("id") === 7L
      && col("day") === java.sql.Date.valueOf("2024-01-04"))
    assert(scannedFiles(point) <= total / 8 + 1,
      s"key+date pins bucket AND partition: ${scannedFiles(point)} of $total")
    assert(point.count() == 1)

    // null partition values land under the Hive default dir and are kept
    // for every predicate (no wrong pruning)
    val root2 = tmp("graft_partnull_")
    val s2 = new ManifestUpsertSink(root2, "id", buckets = 2, partitionCol = Some("day"))
    s2.upsertBatch(Seq(
      (1L, java.sql.Date.valueOf("2024-01-01"), 0L),
      (2L, null.asInstanceOf[java.sql.Date], 0L)).toDF("id", "day", "seq"), "seq", 0L)
    val t2 = spark.read.format("graft-manifest").load(root2)
    assert(t2.filter(col("day").isNull).count() == 1)
    assert(t2.filter(col("day") === java.sql.Date.valueOf("2024-01-01")).count() == 1)
    assert(t2.count() == 2)
  }

  test("dropPartitionsBefore: retention is a manifest edit — zero data read, time travel intact, vacuum reclaims, cdc opt-in") {
    val root = tmp("graft_partdrop_")
    val sink = seed(root)
    val before = ManifestUpsertSink.snapshotManifest(root, None)
    val sc = spark.sparkContext
    sc.setJobGroup("ret", "ret")
    sink.dropPartitionsBefore(spark, "2024-01-03")
    val retentionJobs = sc.statusTracker.getJobIdsForGroup("ret").length
    sc.clearJobGroup()
    assert(retentionJobs == 0, s"retention must launch NO Spark jobs (zero data I/O): $retentionJobs")
    val after = ManifestUpsertSink.snapshotManifest(root, None)
    assert(after.version == before.version + 1)
    val keptParts = after.files.flatMap(f => ManifestUpsertSink.partOf(f.path)).distinct.sorted
    assert(keptParts == Seq("2024-01-03", "2024-01-04"))
    assert(after.files.toSet.subsetOf(before.files.toSet),
      "kept entries are carried verbatim — no rewrite")
    assert(ManifestUpsertSink.read(spark, root).count() == 200)
    // time travel still reads the pre-retention snapshot
    assert(ManifestUpsertSink.readVersion(spark, root, before.version).count() == 400)
    // no-op below the oldest kept partition
    sink.dropPartitionsBefore(spark, "2024-01-02")
    assert(ManifestUpsertSink.snapshotManifest(root, None).version == after.version)
    // vacuum reclaims the dropped partitions' bytes
    sink.vacuum(keepVersions = 1)
    intercept[Exception] {
      ManifestUpsertSink.readVersion(spark, root, before.version).collect()
    }
    assert(ManifestUpsertSink.read(spark, root).count() == 200)

    // cdc = true pays the read and emits deleted images
    val root2 = tmp("graft_partdropcdc_")
    val s2 = seed(root2)
    s2.dropPartitionsBefore(spark, "2024-01-04", cdc = true)
    val v = ManifestUpsertSink.snapshotManifest(root2, None).version
    val feed = ManifestUpsertSink.readChanges(spark, root2, v)
    assert(feed.filter(col("change") === "deleted").count() == 300)
  }

  test("SQL catalog: CREATE TABLE with partCol, INSERT, pruned SELECT") {
    val root = tmp("graft_partsql_")
    val cat = "graft_part_cat"
    spark.conf.set(s"spark.sql.catalog.$cat", classOf[ManifestCatalog].getName)
    spark.conf.set(s"spark.sql.catalog.$cat.root", root)
    spark.sql(s"""CREATE TABLE $cat.ev (id BIGINT, day DATE, v DOUBLE, seq BIGINT)
      TBLPROPERTIES ('keyCol'='id', 'orderCol'='seq', 'buckets'='4', 'partCol'='day')""")
    spark.sql(s"""INSERT INTO $cat.ev VALUES
      (1, DATE'2024-01-01', 1.0, 0), (2, DATE'2024-01-02', 2.0, 0),
      (3, DATE'2024-02-01', 3.0, 0), (4, DATE'2024-02-02', 4.0, 0)""")
    assert(ManifestUpsertSink.snapshotManifest(s"$root/ev", None).partCol.contains("day"))
    val pruned = spark.sql(s"SELECT sum(v) FROM $cat.ev WHERE day >= DATE'2024-02-01'")
    assert(pruned.as[Double].head() == 7.0)
    val total = scannedFiles(spark.sql(s"SELECT * FROM $cat.ev"))
    assert(scannedFiles(spark.sql(
      s"SELECT * FROM $cat.ev WHERE day >= DATE'2024-02-01'")) < total)
  }

  test("runtime DATE pruning: a join against a filtered date dim drops other partitions' files at execution") {
    import spark.implicits._
    import graft.sources.ManifestSource.RuntimeFilterProbe
    val factRoot = java.nio.file.Files.createTempDirectory("graft_dppdate_").toString
    val dimRoot = java.nio.file.Files.createTempDirectory("graft_dppdated_").toString
    // 60 daily partitions, 2 buckets: the runtime filter arrives on the
    // PARTITION column, the __pdate analog of classic DPP
    new ManifestUpsertSink(factRoot, "id", buckets = 2,
      partitionCol = Some("day")).upsertBatch(
      (1L to 3000L).map(i => (i,
        java.sql.Date.valueOf(java.time.LocalDate.of(2024, 1, 1).plusDays(i % 60)),
        i * 1.0, 0L)).toDF("id", "day", "v", "seq"), "seq", 0L)
    new ManifestUpsertSink(dimRoot, "day", buckets = 1).upsertBatch(
      (0L until 60L).map(d => (
        java.sql.Date.valueOf(java.time.LocalDate.of(2024, 1, 1).plusDays(d)),
        if (d % 20 == 3) "promo" else "normal", 0L)).toDF("day", "kind", "seq"),
      "seq", 0L)
    val fact = spark.read.format("graft-manifest").load(factRoot)
    val dim = spark.read.format("graft-manifest").load(dimRoot)
      .filter(col("kind") === "promo") // 3 of 60 days
    RuntimeFilterProbe.reset()
    val joined = fact.join(dim, "day").agg(count(lit(1)).as("n"), sum("v").as("sv"))
    val row = joined.head()
    val (_, before, after) = RuntimeFilterProbe.last.getOrElse(
      fail("no runtime filter reached the fact scan"))
    assert(after < before,
      s"the join-time date IN-set must drop other partitions' files ($after vs $before)")
    // correctness vs plain frames
    val factDf = (1L to 3000L).map(i => (i,
      java.sql.Date.valueOf(java.time.LocalDate.of(2024, 1, 1).plusDays(i % 60)),
      i * 1.0)).toDF("id", "day", "v")
    val dimDf = (0L until 60L).map(d => (
      java.sql.Date.valueOf(java.time.LocalDate.of(2024, 1, 1).plusDays(d)),
      if (d % 20 == 3) "promo" else "normal")).toDF("day", "kind")
      .filter(col("kind") === "promo")
    val want = factDf.join(dimDf, "day").agg(count(lit(1)), sum("v")).head()
    assert(row.getLong(0) == want.getLong(0) && row.getDouble(1) == want.getDouble(1))
  }

  test("partition evolution: repartitionBy adopts a date layout as an epoch commit; history prunes under its own layout; stale writers abort") {
    import spark.implicits._
    val root = java.nio.file.Files.createTempDirectory("graft_pevo_").toString
    val sink = new ManifestUpsertSink(root, "id", buckets = 2) // UNPARTITIONED
    val rows = (1 to 8).map(i => (i.toLong,
      java.sql.Date.valueOf(f"2024-0${i % 2 + 1}%d-01"), i * 1.0, 0L))
    sink.upsertBatch(rows.toDF("id", "day", "v", "seq"), "seq", 0L) // v0
    assert(ManifestUpsertSink.snapshotManifest(root, None).files
      .forall(f => ManifestUpsertSink.partOf(f.path).isEmpty),
      "v0 files carry no partition segment")

    val parted = sink.repartitionBy(spark, Some("day")) // v1: epoch commit
    val m1 = ManifestUpsertSink.snapshotManifest(root, None)
    assert(m1.partCol.contains("day"))
    assert(m1.files.forall(f => ManifestUpsertSink.partOf(f.path).isDefined),
      "post-evolution files land under __pdate")
    // rows byte-identical across the layout change
    assert(ManifestUpsertSink.read(spark, root).select("id", "v")
      .as[(Long, Double)].collect().toMap == rows.map(r => r._1 -> r._3).toMap)

    // NEW layout prunes through the connector; OLD version time-travels
    // under its own (unpartitioned) layout — no pruning, full read
    val cur = spark.read.format("graft-manifest").load(root)
    val total = scannedFiles(cur)
    assert(scannedFiles(cur.filter(col("day") >= java.sql.Date.valueOf("2024-02-01"))) < total,
      "the evolved layout must partition-prune")
    assert(spark.read.format("graft-manifest").option("versionAsOf", 0).load(root)
      .count() == 8, "pre-evolution history reads under its own layout")

    // a writer still holding the OLD layout aborts loudly
    intercept[IllegalStateException] {
      sink.upsertBatch(Seq((9L, java.sql.Date.valueOf("2024-03-01"), 9.0, 1L))
        .toDF("id", "day", "v", "seq"), "seq", 1L)
    }
    // the returned handle continues; retention now works as a manifest edit
    parted.upsertBatch(Seq((9L, java.sql.Date.valueOf("2024-03-01"), 9.0, 1L))
      .toDF("id", "day", "v", "seq"), "seq", 1L)
    parted.dropPartitionsBefore(spark, "2024-02-01")
    assert(ManifestUpsertSink.read(spark, root).agg(min(col("day"))).head()
      .getDate(0).toString >= "2024-02-01")
    // and dropping the partition column is the same epoch move in reverse
    val flat = parted.repartitionBy(spark, None)
    assert(ManifestUpsertSink.snapshotManifest(root, None).partCol.isEmpty)
    flat.upsertBatch(Seq((10L, java.sql.Date.valueOf("2024-04-01"), 10.0, 2L))
      .toDF("id", "day", "v", "seq"), "seq", 2L)
    assert(ManifestUpsertSink.read(spark, root).count() ==
      ManifestUpsertSink.read(spark, root).select("id").distinct().count())
  }
}
