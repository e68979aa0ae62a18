package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.sinks.ManifestUpsertSink

/** `ANALYZE TABLE ... FOR COLUMNS` — the column-level (ndv) census and
  * its planner consumption: the colstats sidecar, the `col_stats`
  * procedure, DSv2 column statistics reaching catalyst attribute stats,
  * and THE point of the feature — cost-based join reordering flipping a
  * 3-table join once ndv exists (without it, intermediate join
  * cardinalities are unknown and CBO keeps the written order). */
class AnalyzeColumnsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def tmp(prefix: String): String =
    java.nio.file.Files.createTempDirectory(prefix).toString

  private def mkCatalog(name: String): String = {
    val root = tmp(s"graft_${name}_")
    spark.conf.set(s"spark.sql.catalog.$name",
      classOf[graft.sources.ManifestCatalog].getName)
    spark.conf.set(s"spark.sql.catalog.$name.root", root)
    root
  }

  test("FOR COLUMNS writes the colstats sidecar; col_stats serves it; commits fold it forward") {
    val cat = "graft_ndv_basic"
    val root = mkCatalog(cat)
    spark.sql(s"""CREATE TABLE $cat.t (id BIGINT, grp STRING, seq BIGINT)
      TBLPROPERTIES ('keyCol'='id', 'orderCol'='seq', 'buckets'='4')""")
    spark.sql(s"INSERT INTO $cat.t SELECT id, concat('g', id % 7), 0L FROM range(0, 100)")
    // unknown column refuses loudly
    val e = intercept[Exception] {
      spark.sql(s"ANALYZE TABLE $cat.t COMPUTE STATISTICS FOR COLUMNS nope")
    }
    assert(e.getMessage.contains("nope"), e.getMessage)
    spark.sql(s"ANALYZE TABLE $cat.t COMPUTE STATISTICS FOR COLUMNS id, grp")
    val got = spark.sql(s"CALL $cat.system.col_stats('t')").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
    assert(got == Seq(("grp", 7L, 0L), ("id", 100L, 0L)), s"census rows: $got")
    // the census FOLDS FORWARD across commits: the batch's HLL sketch
    // unions into the stored one, so the new version still serves ndv
    // (estimate-grade) instead of going dark until the next ANALYZE
    spark.sql(s"INSERT INTO $cat.t VALUES (100, 'g_new', 1)")
    val folded = spark.sql(s"CALL $cat.system.col_stats('t')").collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(folded.keySet == Set("id", "grp"),
      s"a commit after ANALYZE must fold the census forward, not go dark: $folded")
    assert(folded("id") >= 99L && folded("id") <= 103L,
      s"folded ndv(id) must track 101 within HLL error: $folded")
    assert(folded("grp") == 8L, // tiny cardinalities are HLL-exact
      s"folded ndv(grp) must see the new group: $folded")
    // FOR ALL COLUMNS covers everything, and ndv comes back EXACT
    spark.sql(s"ANALYZE TABLE $cat.t COMPUTE STATISTICS FOR ALL COLUMNS")
    val all = spark.sql(s"CALL $cat.system.col_stats('t')").collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(all == Map("id" -> 101L, "grp" -> 8L, "seq" -> 2L), s"$all")
  }

  test("incremental census: trickle commits fold the sketch forward; deletes carry upper bounds; compaction preserves") {
    val cat = "graft_ndv_fold"
    val root = mkCatalog(cat)
    spark.sql(s"""CREATE TABLE $cat.t (id BIGINT, grp STRING, seq BIGINT)
      TBLPROPERTIES ('keyCol'='id', 'orderCol'='seq', 'buckets'='4',
        'mergeOnRead'='true')""")
    spark.sql(s"INSERT INTO $cat.t SELECT id, concat('g', id % 7), 0L FROM range(0, 1000)")
    spark.sql(s"ANALYZE TABLE $cat.t COMPUTE STATISTICS FOR COLUMNS id, grp")
    def ndv() = spark.sql(s"CALL $cat.system.col_stats('t')").collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    // several trickle commits WITHOUT re-ANALYZE: the census keeps serving
    for (k <- 1 to 3)
      spark.sql(s"INSERT INTO $cat.t SELECT id, concat('h', id % 5), 1L " +
        s"FROM range(${1000 + 200 * (k - 1)}, ${1000 + 200 * k})")
    val afterInserts = ndv()
    assert(afterInserts.nonEmpty, "census must survive trickle inserts")
    val idNdv = afterInserts("id")
    assert(idNdv >= 1550 && idNdv <= 1650,
      s"folded ndv(id) must track 1600 within HLL error: $afterInserts")
    assert(afterInserts("grp") == 12L, s"7 g-groups + 5 h-groups: $afterInserts")
    // a MoR delete can't subtract from a sketch: the census carries as an
    // UPPER BOUND rather than going dark (estimate-grade is the contract)
    spark.sql(s"DELETE FROM $cat.t WHERE id < 10")
    val afterDelete = ndv()
    assert(afterDelete.get("id").contains(idNdv),
      s"a delete carries the census as an upper bound: $afterDelete")
    // the planner consumes the folded numbers: attribute stats still flow
    val saved = spark.conf.getOption("spark.sql.cbo.enabled")
    try {
      spark.conf.set("spark.sql.cbo.enabled", "true")
      val stats = spark.sql(s"SELECT id, grp FROM $cat.t").queryExecution
        .optimizedPlan.stats.attributeStats.toSeq
        .map { case (a, s) => a.name -> s.distinctCount.map(_.toLong) }.toMap
      assert(stats.get("id").flatten.contains(idNdv),
        s"folded ndv must reach catalyst attribute stats: $stats")
    } finally saved match {
      case Some(v) => spark.conf.set("spark.sql.cbo.enabled", v)
      case None => spark.conf.unset("spark.sql.cbo.enabled")
    }
    // compaction changes no logical row: the census carries verbatim
    spark.sql(s"CALL $cat.system.compact('t')")
    assert(ndv() == afterDelete,
      "a compaction must carry the census verbatim")
  }

  test("equi-height histograms: skewed equality selectivity that ndv alone gets WRONG") {
    val cat = "graft_hist"
    val root = mkCatalog(cat)
    spark.sql(s"""CREATE TABLE $cat.f (k BIGINT, s BIGINT, seq BIGINT)
      TBLPROPERTIES ('keyCol'='k', 'orderCol'='seq', 'buckets'='4')""")
    // SKEW: 90% of rows carry the hot key s=0; the rest spread over 1..1000
    spark.sql(s"""INSERT INTO $cat.f
      SELECT id, CASE WHEN id < 9000 THEN 0L ELSE id % 1000 + 1 END, 0L
      FROM range(0, 10000)""")
    // histograms follow stock Spark's ANALYZE gate: computed only when
    // spark.sql.statistics.histogram.enabled is on (default false)
    spark.conf.set("spark.sql.statistics.histogram.enabled", "true")
    try spark.sql(s"ANALYZE TABLE $cat.f COMPUTE STATISTICS FOR COLUMNS s")
    finally spark.conf.unset("spark.sql.statistics.histogram.enabled")
    def estimate(v: Int): Option[BigInt] = {
      val saved = spark.conf.getOption("spark.sql.cbo.enabled")
      try {
        spark.conf.set("spark.sql.cbo.enabled", "true")
        spark.sql(s"SELECT * FROM $cat.f WHERE s = $v").queryExecution
          .optimizedPlan.stats.rowCount
      } finally saved match {
        case Some(x) => spark.conf.set("spark.sql.cbo.enabled", x)
        case None => spark.conf.unset("spark.sql.cbo.enabled")
      }
    }
    // ndv alone reads EVERY equality as rows/ndv ≈ 10 — the histogram's
    // point bins carry the hot key's true mass
    val hot = estimate(0)
    val cold = estimate(500)
    assert(hot.exists(_ >= BigInt(5000)),
      s"hot-key estimate must carry the bin mass (~9000), got $hot")
    assert(cold.exists(_ <= BigInt(500)),
      s"cold-key estimate must stay small, got $cold")
    assert(hot.get > cold.get * 10,
      s"skew must separate the estimates: hot=$hot cold=$cold")
    // CONTROL: strip the histogram lines from the sidecar — ndv-only
    // estimation reads the hot and cold keys as the SAME selectivity,
    // which is exactly the misestimate the histogram exists to fix
    val v = ManifestUpsertSink.latestManifest(s"$root/f").get.version
    val sidecar = java.nio.file.Paths.get(s"$root/f/_manifest/v$v.colstats")
    java.nio.file.Files.writeString(sidecar,
      java.nio.file.Files.readAllLines(sidecar).stream()
        .filter(l => !l.startsWith("H\t")).reduce((a, b) => a + "\n" + b).get)
    val hotNoH = estimate(0)
    assert(hotNoH.exists(_ <= BigInt(50)),
      s"without the histogram the hot key reads as ~rows/ndv — tiny: $hotNoH")
    assert(hot.get > hotNoH.get * 100,
      s"the histogram must lift the hot key's estimate: $hot vs ndv-only $hotNoH")
  }

  test("numeric ndv without derivable bounds is WITHHELD (empty-interval hazard); string ndv still serves") {
    val cat = "graft_ndv_nobounds"
    val root = mkCatalog(cat)
    spark.sql(s"""CREATE TABLE $cat.t (id BIGINT, grp STRING, seq BIGINT)
      TBLPROPERTIES ('keyCol'='id', 'orderCol'='seq', 'buckets'='4')""")
    spark.sql(s"INSERT INTO $cat.t SELECT id, concat('g', id % 7), 0L FROM range(0, 100)")
    spark.sql(s"ANALYZE TABLE $cat.t COMPUTE STATISTICS FOR COLUMNS id, grp")
    def attrStats() = {
      val saved = spark.conf.getOption("spark.sql.cbo.enabled")
      try {
        spark.conf.set("spark.sql.cbo.enabled", "true")
        spark.sql(s"SELECT id, grp FROM $cat.t").queryExecution.optimizedPlan
          .stats.attributeStats.toSeq
          .map { case (a, s) => a.name -> s.distinctCount.map(_.toLong) }.toMap
      } finally saved match {
        case Some(v) => spark.conf.set("spark.sql.cbo.enabled", v)
        case None => spark.conf.unset("spark.sql.cbo.enabled")
      }
    }
    val before = attrStats()
    assert(before.get("id").flatten.contains(100L) &&
      before.get("grp").flatten.contains(7L), s"$before")
    // destroy the per-file stats sidecar: numeric min/max can no longer
    // be derived. Join estimation reads unknown numeric bounds as an
    // EMPTY interval (0-row join estimate) — serving ndv alone would
    // make the census actively worsen plans, so the numeric column must
    // vanish from DSv2 column stats; the string column (whose bounds
    // estimation ignores) keeps serving its ndv.
    val v = ManifestUpsertSink.latestManifest(s"$root/t").get.version
    java.nio.file.Files.delete(java.nio.file.Paths.get(s"$root/t/_manifest/v$v.stats"))
    val after = attrStats()
    assert(after.get("id").flatten.isEmpty,
      s"numeric ndv with unknown bounds must be withheld: $after")
    assert(after.get("grp").flatten.contains(7L),
      s"string ndv must keep serving without bounds: $after")
  }

  test("ndv census folds deletion vectors: the planner sees the LOGICAL table") {
    import spark.implicits._
    val root = tmp("graft_ndv_dv_")
    val sink = new ManifestUpsertSink(root, "id", buckets = 4)
    sink.upsertBatch((1L to 50L).map(i => (i, s"g${i % 10}", 0L))
      .toDF("id", "grp", "seq"), "seq", 0L)
    sink.deleteKeysMergeOnRead((41L to 50L).toDF("id"), 1L)
    val cat = "graft_ndv_dvc"
    spark.conf.set(s"spark.sql.catalog.$cat",
      classOf[graft.sources.ManifestCatalog].getName)
    spark.conf.set(s"spark.sql.catalog.$cat.root",
      java.nio.file.Paths.get(root).getParent.toString)
    val tbl = java.nio.file.Paths.get(root).getFileName.toString
    spark.sql(s"ANALYZE TABLE $cat.`$tbl` COMPUTE STATISTICS FOR COLUMNS id")
    val got = spark.sql(s"CALL $cat.system.col_stats('$tbl')").collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got == Map("id" -> 40L), s"dv-deleted keys must not count: $got")
    // and the census reaches the planner THROUGH the dv fold scan: the
    // dv'd table's relation stats carry the ndv (CBO sees the logical
    // table, version-keyed so it can never be stale)
    val saved = spark.conf.getOption("spark.sql.cbo.enabled")
    try {
      spark.conf.set("spark.sql.cbo.enabled", "true")
      val stats = spark.read.format("graft-manifest").load(root)
        .select("id").queryExecution.optimizedPlan.stats
      assert(stats.rowCount.exists(_ == BigInt(40)), s"$stats")
      assert(stats.attributeStats.toSeq.exists { case (a, s) =>
        a.name == "id" && s.distinctCount.exists(_ == BigInt(40)) },
        s"the fold scan must serve column stats: ${stats.attributeStats}")
    } finally saved match {
      case Some(v) => spark.conf.set("spark.sql.cbo.enabled", v)
      case None => spark.conf.unset("spark.sql.cbo.enabled")
    }
  }

  test("column stats reach catalyst, and CBO join reordering FLIPS once ndv exists") {
    val cat = "graft_ndv_cbo"
    mkCatalog(cat)
    spark.sql(s"""CREATE TABLE $cat.f (k BIGINT, j BIGINT, seq BIGINT)
      TBLPROPERTIES ('keyCol'='k', 'orderCol'='seq', 'buckets'='4')""")
    spark.sql(s"""CREATE TABLE $cat.b (k BIGINT, bv BIGINT, seq BIGINT)
      TBLPROPERTIES ('keyCol'='k', 'orderCol'='seq', 'buckets'='4')""")
    spark.sql(s"""CREATE TABLE $cat.c (j BIGINT, cv BIGINT, seq BIGINT)
      TBLPROPERTIES ('keyCol'='j', 'orderCol'='seq', 'buckets'='4')""")
    // The discriminating shape: WITHOUT column stats CBO can only order
    // by relation size, and c (50 rows) looks cheaper than b (100 rows) —
    // but f.j has ndv 5, so (f ⋈ c on j) EXPLODES to ~5000 rows, while
    // (f ⋈ b on k, ndv 5000) REDUCES to ~100. Only the ndv census can
    // see that; size-only ordering picks the wrong dimension first.
    spark.sql(s"INSERT INTO $cat.f SELECT id, id % 5, 0L FROM range(0, 5000)")
    spark.sql(s"INSERT INTO $cat.b SELECT id * 50, id * 2, 0L FROM range(0, 100)")
    spark.sql(s"INSERT INTO $cat.c SELECT id, id * 3, 0L FROM range(0, 50)")
    val q =
      s"""SELECT count(*) AS n FROM $cat.f f
         JOIN $cat.b b ON f.k = b.k
         JOIN $cat.c c ON f.j = c.j"""
    // the join tree's leaf order: table names left-to-right
    def leafOrder(sql: String): Seq[String] =
      spark.sql(sql).queryExecution.optimizedPlan.collect {
        case r: org.apache.spark.sql.execution.datasources.v2.DataSourceV2ScanRelation =>
          r.relation.table.name()
      }.map(n => n.substring(n.lastIndexOf('/') + 1))
    val cboConfs = Seq("spark.sql.cbo.enabled" -> "true",
      "spark.sql.cbo.joinReorder.enabled" -> "true")
    val saved = cboConfs.map { case (k, _) => k -> spark.conf.getOption(k) }
    try {
      cboConfs.foreach { case (k, v) => spark.conf.set(k, v) }
      // WITHOUT ndv: size-only ordering grabs the smaller-by-rows c first
      // — the cardinality-blind (and wrong) choice
      val before = leafOrder(q)
      assert(before.take(2).toSet == Set("f", "c"),
        s"without column stats CBO orders by size alone (c is smaller), got $before")
      spark.sql(s"ANALYZE TABLE $cat.f COMPUTE STATISTICS FOR COLUMNS k, j")
      spark.sql(s"ANALYZE TABLE $cat.b COMPUTE STATISTICS FOR COLUMNS k")
      spark.sql(s"ANALYZE TABLE $cat.c COMPUTE STATISTICS FOR COLUMNS j")
      // the DSv2 column stats must land in catalyst attribute stats
      val fStats = spark.sql(s"SELECT k, j FROM $cat.f").queryExecution
        .optimizedPlan.stats
      val ndvs = fStats.attributeStats.toSeq
        .map { case (a, s) => a.name -> s.distinctCount.map(_.toLong) }.toMap
      assert(ndvs.get("k").flatten.contains(5000L) &&
        ndvs.get("j").flatten.contains(5L),
        s"analyzed ndv must reach catalyst attribute stats: ${fStats.attributeStats}")
      // WITH ndv (+ the sidecar-derived key ranges — join estimation
      // zeroes on unknown numeric bounds): (f ⋈ b) estimates ~100 rows
      // vs (f ⋈ c) in the thousands, and the DP reorder joins the
      // REDUCING dimension first — the flip. (Estimates are band, not
      // exact: ANALYZE also records equi-height histograms now, and
      // histogram-based join estimation refines the pure ndv formula.)
      val fc = spark.sql(s"SELECT * FROM $cat.f f JOIN $cat.c c ON f.j = c.j")
        .queryExecution.optimizedPlan.stats.rowCount
      val fb = spark.sql(s"SELECT * FROM $cat.f f JOIN $cat.b b ON f.k = b.k")
        .queryExecution.optimizedPlan.stats.rowCount
      assert(fc.exists(_ >= BigInt(2000)) && fb.exists(_ <= BigInt(500)),
        s"join cardinality must separate the exploding and reducing dims: f⋈c=$fc f⋈b=$fb")
      val after = leafOrder(q)
      assert(after != before && after.take(2).toSet == Set("f", "b"),
        s"CBO join reordering must flip to (f ⋈ b) ⋈ c once ndv exists, got $after")
      // and the answer is unchanged
      assert(spark.sql(q).head().getLong(0) == 100L)
    } finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }
}
