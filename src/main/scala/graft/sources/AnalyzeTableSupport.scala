package graft.sources

import org.apache.spark.sql.{Row, SparkSession}
import org.apache.spark.sql.catalyst.analysis.ResolvedTable
import org.apache.spark.sql.catalyst.plans.logical.{AnalyzeTable, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.command.LeafRunnableCommand

import graft.sinks.{ManifestStats, ManifestUpsertSink, TableStore}

/** Standard-SQL `ANALYZE TABLE t COMPUTE STATISTICS` for manifest-lake
  * catalogs — BI tooling's default stats vocabulary, aliased onto the
  * engine's own commit-time census: Spark has no v2 ANALYZE execution
  * (the stock path fails a v2 table at planning), so a resolution rule
  * rewrites the analyzed [[AnalyzeTable]] over a [[ManifestCatalog]]
  * table into [[GraftAnalyzeTableCommand]], which RECOMPUTES the
  * current version's stats sidecar from the data files' parquet footers
  * and commits it under `_manifest/v<N>.stats`.
  *
  * Ordinarily the sidecar is already exact (every commit writes it with
  * carried-line reuse), so ANALYZE is a cheap no-op refresh; its value
  * is (a) the standard vocabulary, and (b) healing tables whose sidecar
  * is missing or torn (pre-stats vintages, a crashed post-commit write)
  * — after which `SupportsReportStatistics`, metadata-only aggregates,
  * file skipping, and `CALL system.detail` all light up. Footer reads
  * fan out to executors for large file lists (the same
  * [[ManifestStats.collectAuto]] split every commit uses); `NOSCAN` is
  * accepted and identical — the census never scans data pages, only
  * footers. Partition-spec ANALYZE refuses loudly (the sidecar is
  * per-file, not per-partition). */
object GraftAnalyzeRule extends Rule[LogicalPlan] {
  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case AnalyzeTable(r: ResolvedTable, partitionSpec, _)
        if r.catalog.isInstanceOf[ManifestCatalog] =>
      if (partitionSpec.nonEmpty)
        throw new UnsupportedOperationException(
          "ANALYZE TABLE ... PARTITION is unsupported for graft-manifest tables — " +
            "the stats sidecar is per-file; analyze the whole table")
      GraftAnalyzeTableCommand(
        r.catalog.asInstanceOf[ManifestCatalog].dirOf(r.identifier))
    case org.apache.spark.sql.catalyst.plans.logical.AnalyzeColumn(
        r: ResolvedTable, columnNames, allColumns)
        if r.catalog.isInstanceOf[ManifestCatalog] =>
      GraftAnalyzeColumnsCommand(
        r.catalog.asInstanceOf[ManifestCatalog].dirOf(r.identifier),
        columnNames, allColumns)
  }
}

private[graft] final case class GraftAnalyzeTableCommand(root: String)
    extends LeafRunnableCommand {
  override def run(spark: SparkSession): Seq[Row] = {
    val m = ManifestUpsertSink.latestManifest(root).getOrElse(
      throw new IllegalArgumentException(s"no committed table at $root"))
    val stats = ManifestStats.collectAuto(m.files.map(_.path))
    TableStore.forPath(root).putString(s"$root/_manifest",
      s"v${m.version}.stats", ManifestStats.encode(stats))
    Seq.empty // ANALYZE returns no rows, like the built-in
  }
}

/** `ANALYZE TABLE t COMPUTE STATISTICS FOR [ALL] COLUMNS [...]` — the
  * COLUMN-LEVEL census the per-file sidecar cannot answer: exact
  * distinct counts (and null counts) per requested column, computed in
  * ONE aggregation pass over the LOGICAL snapshot (evolution + deletion
  * vectors folded — the planner must see the table readers see) and
  * stored per version as `_manifest/v<N>.colstats`. The connector's
  * [[org.apache.spark.sql.connector.read.SupportsReportStatistics]]
  * surfaces them as DSv2 column statistics, which is what lights up
  * Spark's COST-BASED join estimation and DP join reordering on lake
  * tables — without ndv, multi-join cardinality estimates return
  * unknown and CBO keeps the written join order (AnalyzeColumnsSpec
  * pins the flip). Exact by design: ANALYZE is an explicit maintenance
  * verb whose one full scan buys correct plans table-wide. Alongside
  * the exact census it stores a MERGEABLE HLL sketch per column, so
  * later commits FOLD the census forward
  * ([[graft.sinks.ManifestUpsertSink.foldColStats]]: batch sketch
  * unioned in, estimate-grade `exact=false` entries) instead of going
  * dark — CBO inputs survive trickle writes without re-ANALYZE, and a
  * fresh ANALYZE restores exactness. */
private[graft] final case class GraftAnalyzeColumnsCommand(root: String,
    columnNames: Option[Seq[String]], allColumns: Boolean)
    extends LeafRunnableCommand {
  override def run(spark: SparkSession): Seq[Row] = {
    import org.apache.spark.sql.functions._
    // Resolve the manifest ONCE and census that snapshot's own file
    // list — re-resolving the latest version for the read would let a
    // commit landing between the two store a census computed over
    // version N+1's data under vN.colstats, served as exact for N.
    val m = ManifestUpsertSink.latestManifest(root).getOrElse(
      throw new IllegalArgumentException(s"no committed table at $root"))
    val df = ManifestUpsertSink.readLogical(spark, m, m.files,
      _.drop(ManifestUpsertSink.BucketCol))
    val names: Seq[String] =
      if (allColumns) df.columns.toSeq
      else {
        val asked = columnNames.getOrElse(Seq.empty)
        val have = df.columns.toSet
        val missing = asked.filterNot(have)
        require(missing.isEmpty,
          s"ANALYZE ... FOR COLUMNS: column(s) ${missing.mkString(", ")} not in " +
            s"the table (have ${df.columns.sorted.mkString(", ")})")
        asked
      }
    require(names.nonEmpty, "ANALYZE ... FOR COLUMNS: no columns requested")
    // exact census + a mergeable HLL sketch per column (over
    // xxhash64(value), nulls excluded — the canonical sketch input every
    // commit-time fold reuses): the sketch is what lets LATER commits
    // fold the census forward (ManifestUpsertSink.foldColStats) instead
    // of going dark until the next ANALYZE
    // ONE census pass (guide §1.2): the exact ndv/null/HLL aggregates and
    // the histogram ENDPOINT aggregates (min/max/percentiles/non-null
    // count) are independent aggregations over the same snapshot, so they
    // fuse into a single scan — only the interval-ndv pass below must
    // stay separate (its bin boundaries are data the first pass produces).
    import org.apache.spark.sql.types._
    val numBins = math.max(2, spark.sessionState.conf
      .getConfString("spark.sql.statistics.histogram.numBins", "64").toInt)
    def dbl(n: String): org.apache.spark.sql.Column = df.schema(n).dataType match {
      case DateType =>
        datediff(col(n), lit(java.sql.Date.valueOf("1970-01-01"))).cast("double")
      case TimestampType => unix_micros(col(n)).cast("double")
      case _ => col(n).cast("double")
    }
    // Histograms are gated on spark.sql.statistics.histogram.enabled —
    // stock Spark's ANALYZE contract (default FALSE: the stock command
    // computes them only when asked). They are a selectivity refinement,
    // not a correctness input, and the endpoint + interval-ndv aggregates
    // are the dominant cost of the census at scale; paying them on every
    // ANALYZE regardless of the session's own histogram setting is what
    // regressed the analyze lifecycle 1.85× at sf1.
    val histEnabled = spark.sessionState.conf
      .getConfString("spark.sql.statistics.histogram.enabled", "false").toBoolean
    val histCols = if (!histEnabled) Nil else names.filter(n =>
      df.schema(n).dataType match {
        case _: NumericType | DateType | TimestampType => true
        case _ => false
      })
    val pcts = (1 until numBins).map(i => i.toDouble / numBins)
    val aggs = names.flatMap(n => Seq(
      count_distinct(col(n)).as(s"__ndv__$n"),
      sum(when(col(n).isNull, 1L).otherwise(0L)).as(s"__nulls__$n"),
      hll_sketch_agg(when(col(n).isNotNull, xxhash64(col(n))),
        ManifestStats.HllLgK).as(s"__hll__$n"))) ++
      histCols.flatMap(n => Seq(
        min(dbl(n)).as(s"__lo__$n"),
        max(dbl(n)).as(s"__hi__$n"),
        percentile_approx(dbl(n),
          array(pcts.map(lit): _*), lit(10000)).as(s"__p__$n"),
        count(dbl(n)).as(s"__n__$n")))
    val row = df.agg(aggs.head, aggs.tail: _*).head()
    val stats = names.zipWithIndex.map { case (n, i) =>
      n -> ManifestStats.ColNdv(row.getLong(3 * i),
        if (row.isNullAt(3 * i + 1)) 0L else row.getLong(3 * i + 1),
        // an all-null column aggregates to no sketch — store the EMPTY
        // sketch so the fold contract (sketch present = foldable) holds
        Option(row.getAs[Array[Byte]](3 * i + 2)).orElse(Some(
          new org.apache.datasketches.hll.HllSketch(ManifestStats.HllLgK)
            .toCompactByteArray)))
    }.toMap
    // EQUI-HEIGHT HISTOGRAMS for range-comparable columns — the
    // selectivity input ndv+bounds cannot express: a skewed column's hot
    // key is its bins' MASS, not 1/ndv. Spark's own recipe: equi-mass
    // endpoints from approx percentiles (fused into the census pass
    // above), then one ndv-per-interval aggregation (the catalyst
    // interval sketch). Domains are catalyst-internal doubles (numeric
    // value, date days, timestamp micros) — what FilterEstimation
    // compares against.
    val withHist: Map[String, ManifestStats.ColNdv] =
      if (histCols.isEmpty) stats
      else {
        val epBase = 3 * names.size
        // endpoints per column (duplicates KEPT: a hot value collapses
        // several equi-mass endpoints onto itself — point bins are how
        // the histogram spells skew); all-null columns decline
        val endpoints: Seq[(String, Array[Double], Long)] = histCols.zipWithIndex
          .flatMap { case (n, i) =>
            val base = epBase + 4 * i
            if (row.isNullAt(base) || row.isNullAt(base + 2)) None
            else Some((n,
              (row.getDouble(base) +: row.getSeq[Double](base + 2) :+
                row.getDouble(base + 1)).toArray,
              row.getLong(base + 3)))
          }
        if (endpoints.isEmpty) stats
        else {
          import org.apache.spark.sql.GraftBridge
          import org.apache.spark.sql.catalyst.expressions.{CreateArray, Literal}
          val ndvAggs = endpoints.map { case (n, eps, _) =>
            GraftBridge.column(
              org.apache.spark.sql.catalyst.expressions.aggregate
                .ApproxCountDistinctForIntervals(
                  GraftBridge.expression(dbl(n)),
                  CreateArray(eps.toIndexedSeq.map(Literal(_))), 0.05)
                .toAggregateExpression()).as(s"__hist__$n")
          }
          val hrow = df.agg(ndvAggs.head, ndvAggs.tail: _*).head()
          val hists: Map[String, ManifestStats.EquiHist] = endpoints.zipWithIndex
            .map { case ((n, eps, nonNull), i) =>
              val ndvs = hrow.getSeq[Long](i)
              val bins = eps.toIndexedSeq.sliding(2).zip(ndvs.iterator).map {
                case (Seq(lo, hi), nd) => (lo, hi, nd)
              }.toSeq
              n -> ManifestStats.EquiHist(nonNull.toDouble / bins.size, bins)
            }.toMap
          stats.map { case (n, c) => n -> c.copy(hist = hists.get(n)) }
        }
      }
    TableStore.forPath(root).putString(s"$root/_manifest",
      s"v${m.version}.colstats", ManifestStats.encodeCol(withHist))
    Seq.empty
  }
}
