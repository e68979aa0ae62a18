package graft.operators

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.expressions.scalalang.typed
import org.apache.spark.sql.functions._
import graft.{QueryDef, Tables}

/** The typed Dataset[T] surface: case-class encoders, typed filter/map,
  * groupByKey + typed aggregators — the API tier for pipelines that want
  * compile-time row shapes (SURVEY §1.3: "expose Dataset[Event] via
  * .as[Event] at API boundaries"). The physical plans are identical to
  * the DataFrame forms (Catalyst sees through typed lambdas for encoders'
  * field accesses in the agg; the filter lambda is opaque — acceptable at
  * API boundaries, never in wide scans), so the oracle is the plain SQL. */
object TypedApi {

  /** Typed view of the orders table. */
  final case class Order(
      o_orderkey: Long,
      o_custkey: Long,
      o_orderstatus: String,
      o_totalprice: Double,
      o_orderpriority: String)

  def orders(s: SparkSession, d: String): Dataset[Order] = {
    import s.implicits._
    Tables.orders(s, d)
      .select("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice", "o_orderpriority")
      .as[Order]
  }

  // ---------------------------------------------------------------- q77
  /** groupByKey + typed aggregation over a case-class Dataset, with a
    * typed filter in front. Output re-aliased to match the SQL oracle. */
  val q77 = QueryDef(
    "q77_typed_agg",
    (s, d) => {
      import s.implicits._
      val ds = orders(s, d)
        .filter((o: Order) => o.o_orderstatus == "F" && o.o_totalprice > 1000.0)
      ds.groupByKey((o: Order) => o.o_orderpriority)
        .agg(
          typed.count[Order](_.o_orderkey).name("n"),
          typed.sumLong[Order](o => math.round(o.o_totalprice * 100)).name("cents"))
        .toDF("o_orderpriority", "n", "cents")
        .select(col("o_orderpriority"), col("n"),
          (col("cents").cast("decimal(20,0)") / 100).cast("double").as("total"))
        .orderBy(col("o_orderpriority"))
    },
    Some("""SELECT o_orderpriority, count(*) AS n,
        CAST(SUM(CAST(round(o_totalprice * 100) AS DECIMAL(20,0))) / 100 AS DOUBLE) AS total
      FROM orders
      WHERE o_orderstatus = 'F' AND o_totalprice > 1000.0
      GROUP BY o_orderpriority ORDER BY o_orderpriority"""))

  // --------------------------------------------------------------- q140
  /** Custom typed Aggregator: bounded top-k-by-score per group — the
    * SURVEY §4 "candidate custom work" item (per-group top-k WITHOUT a
    * full window sort). The aggregation buffer holds at most k entries,
    * so partial aggregation ships k rows per (group × map task) instead
    * of sorting every group member through a window — at 100 TB the
    * difference between a k-row combiner and a spilling per-group sort.
    * Determinism: ordering is (score desc, docId asc), applied in
    * reduce, merge, AND finish, so merge order cannot change the result;
    * the score is per-row arithmetic (q50's quality formula), identical
    * cross-engine. Oracle = the window formulation: both must agree row
    * for row. */
  final case class DocScore(docId: Long, score: Double)

  class TopKByScore(k: Int)
      extends org.apache.spark.sql.expressions.Aggregator[DocScore, Seq[DocScore], Seq[DocScore]] {
    private def best(xs: Seq[DocScore]): Seq[DocScore] =
      xs.sortBy(x => (-x.score, x.docId)).take(k)
    override def zero: Seq[DocScore] = Seq.empty
    override def reduce(b: Seq[DocScore], a: DocScore): Seq[DocScore] = best(b :+ a)
    override def merge(b1: Seq[DocScore], b2: Seq[DocScore]): Seq[DocScore] = best(b1 ++ b2)
    override def finish(r: Seq[DocScore]): Seq[DocScore] = best(r)
    override def bufferEncoder: org.apache.spark.sql.Encoder[Seq[DocScore]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[DocScore]]()
    override def outputEncoder: org.apache.spark.sql.Encoder[Seq[DocScore]] =
      bufferEncoder
  }

  val q140 = QueryDef(
    "q140_topk_aggregator",
    (s, d) => {
      import s.implicits._
      val scored = Tables.documents(s, d)
        .select(col("source"), col("doc_id"),
          round(graft.ext.TextStats.qualityScore(col("text")), 6).as("score"))
        .as[(String, Long, Double)]
        .map { case (src, id, sc) => (src, DocScore(id, sc)) }
      scored.groupByKey(_._1)
        .mapValues(_._2)
        .agg(new TopKByScore(3).toColumn.name("top"))
        .toDF("source", "top")
        .select(col("source"), posexplode(col("top")).as(Seq("i", "e")))
        .select(col("source"), (col("i") + 1).cast("long").as("rank"),
          col("e.docId").as("doc_id"), col("e.score").as("score"))
        .orderBy(col("source"), col("rank"))
    },
    Some("""WITH scored AS (SELECT source, doc_id,
          round(least(len(string_split(lower(text), ' '))::DOUBLE / 50.0, 1.0) * 0.4
            + (1.0 - least(length(regexp_replace(text, '[^.,;:!?]', '', 'g'))::DOUBLE
                / greatest(length(text)::DOUBLE, 1.0) * 10.0, 1.0)) * 0.3
            + (len(list_filter(string_split(lower(text), ' '),
                x -> x IN ('the','a','of','and','to')))::DOUBLE
               / len(string_split(lower(text), ' '))::DOUBLE) * 0.3, 6) AS score
        FROM documents),
      ranked AS (SELECT source, doc_id, score,
          row_number() OVER (PARTITION BY source ORDER BY score DESC, doc_id) AS rank
        FROM scored)
      SELECT source, rank, doc_id, score FROM ranked WHERE rank <= 3
      ORDER BY source, rank"""),
    doc = "typed bounded top-k Aggregator (k-row combiner, no window sort) vs window oracle")

  val all: Seq[QueryDef] = Seq(q77, q140)
}
