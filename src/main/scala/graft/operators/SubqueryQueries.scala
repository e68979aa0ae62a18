package graft.operators

import org.apache.spark.sql.SparkSession
import graft.{QueryDef, Tables}

/** TPC-H-grade correlated-subquery patterns (Q11/Q15/Q17/Q21/Q22 shapes
  * adapted to the fixture schema), run through the SQL front end so
  * Catalyst's decorrelation machinery is the thing under test. All
  * decorrelate into join+aggregate plans — no per-row re-execution at any
  * scale. */
object SubqueryQueries {

  private def withViews(s: SparkSession, d: String): Unit = {
    Seq("orders" -> Tables.orders(s, d), "customer" -> Tables.customer(s, d),
      "lineitem" -> Tables.lineitem(s, d), "supplier" -> Tables.supplier(s, d),
      "part" -> Tables.part(s, d), "nation" -> Tables.nation(s, d))
      .foreach { case (n, df) => df.createOrReplaceTempView(s"${n}_v") }
  }

  private def sql(name: String, doc: String)(q: String): QueryDef =
    QueryDef(name,
      (s, d) => { withViews(s, d); s.sql(q.replaceAll("\\b(orders|customer|lineitem|supplier|part|nation)\\b", "$1_v")) },
      Some(q), doc)

  // ---------------------------------------------------------------- q72
  /** TPC-H Q17 shape: per-part correlated average in the predicate. */
  val q72 = sql("q72_correlated_avg", "Q17 shape")(
    """SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS total,
      |  COUNT(*) AS n
      |FROM lineitem l1 JOIN part ON p_partkey = l_partkey
      |WHERE p_size <= 5
      |  AND l_quantity < (SELECT 0.8 * avg(l_quantity) FROM lineitem l2
      |                    WHERE l2.l_partkey = l1.l_partkey)""".stripMargin)

  // ---------------------------------------------------------------- q73
  /** TPC-H Q11 shape: HAVING against a global scalar subquery. */
  val q73 = sql("q73_having_scalar", "Q11 shape")(
    """SELECT l_partkey,
      |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS value
      |FROM lineitem GROUP BY l_partkey
      |HAVING SUM(CAST(l_extendedprice AS DECIMAL(18,2))) >
      |  (SELECT 0.001 * SUM(CAST(l_extendedprice AS DECIMAL(18,2))) FROM lineitem)
      |ORDER BY value DESC, l_partkey LIMIT 50""".stripMargin)

  // ---------------------------------------------------------------- q74
  /** TPC-H Q21 shape: EXISTS and NOT EXISTS against the same table with
    * different correlations. */
  val q74 = sql("q74_multi_exists", "Q21 shape")(
    """SELECT s_name, COUNT(*) AS numwait
      |FROM supplier JOIN lineitem l1 ON s_suppkey = l1.l_suppkey
      |  JOIN orders ON o_orderkey = l1.l_orderkey
      |WHERE o_orderstatus = 'F'
      |  AND EXISTS (SELECT 1 FROM lineitem l2
      |              WHERE l2.l_orderkey = l1.l_orderkey AND l2.l_suppkey <> l1.l_suppkey)
      |  AND NOT EXISTS (SELECT 1 FROM lineitem l3
      |                  WHERE l3.l_orderkey = l1.l_orderkey AND l3.l_suppkey <> l1.l_suppkey
      |                    AND l3.l_shipdate > l1.l_shipdate)
      |GROUP BY s_name ORDER BY numwait DESC, s_name LIMIT 20""".stripMargin)

  // ---------------------------------------------------------------- q75
  /** TPC-H Q22 shape: above-average filter + anti-correlated NOT EXISTS. */
  val q75 = sql("q75_antijoin_avg", "Q22 shape")(
    """SELECT c_mktsegment, COUNT(*) AS numcust,
      |  CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS totacctbal
      |FROM customer
      |WHERE c_acctbal > (SELECT AVG(c_acctbal) FROM customer WHERE c_acctbal > 0.0)
      |  AND NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
      |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin)

  // ---------------------------------------------------------------- q76
  /** TPC-H Q15 shape: derived revenue view + max-scalar equality. */
  val q76 = sql("q76_view_max", "Q15 shape")(
    """WITH revenue AS (
      |  SELECT l_suppkey AS supplier_no,
      |    SUM(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(18,4))) AS total_rev
      |  FROM lineitem GROUP BY l_suppkey)
      |SELECT s_suppkey, s_name, CAST(total_rev AS DOUBLE) AS total_rev
      |FROM supplier JOIN revenue ON s_suppkey = supplier_no
      |WHERE total_rev = (SELECT MAX(total_rev) FROM revenue)
      |ORDER BY s_suppkey""".stripMargin)

  val all: Seq[QueryDef] = Seq(q72, q73, q74, q75, q76)
}
