package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One named query in the engine's declared inventory (SURVEY §2.B).
  *
  * @param name   stable key — shared between `SparkEntry.queries` and
  *               `SparkEntry.oracleSql`
  * @param fn     the Spark-side implementation
  * @param oracle equivalent ANSI SQL for the DuckDB oracle (column names/
  *               aliases MUST match the Spark output exactly); None for ops
  *               whose semantics aren't SQL-expressible (driver then records
  *               a weaker rows-only check)
  */
final case class QueryDef(
    name: String,
    fn: (SparkSession, String) => DataFrame,
    oracle: Option[String],
    doc: String = "")

object QueryDef {
  /** Float determinism convention used across the inventory: aggregate
    * sums of doubles go through an exact DECIMAL accumulator and are cast
    * back to DOUBLE, so Spark and DuckDB produce bit-identical values
    * regardless of summation order (IEEE double addition is not
    * associative; decimal addition is). Per-row double arithmetic is
    * order-free and needs no such treatment. */
  val FloatNote: String = "decimal-accumulator convention"
}
