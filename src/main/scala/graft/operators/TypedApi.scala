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

  val all: Seq[QueryDef] = Seq(q77)
}
