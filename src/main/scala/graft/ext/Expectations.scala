package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Declarative DATA-QUALITY EXPECTATIONS over a frame — the CHECK-
  * constraint / DLT-expectations role for a training-data pipeline:
  * every row is evaluated against a named rule set and either ACCEPTED
  * or QUARANTINED with the list of rules it violated, so a corpus build
  * never silently drops rows (the quarantine table is the audit trail a
  * 100-TB ingest needs — "how many rows failed WHICH gate" is a query,
  * not a log grep).
  *
  * Violation semantics: a rule is violated unless its predicate is
  * TRUE — i.e. NULL VIOLATES. This deliberately diverges from SQL CHECK
  * (where NULL passes): a quality gate that cannot evaluate a rule on a
  * row (missing language tag, null length) must quarantine it, not wave
  * it through. The whole evaluation is one projection over codegen'd
  * column expressions — no UDFs, no shuffle; the gate runs at scan
  * speed and pushes through whatever partitioning the writer needs
  * next. Composes with the manifest lake: route [[accepted]] to the
  * main table and [[quarantined]] (violations serialized) to a sibling
  * quarantine table, both under the ordinary merge protocol.
  */
object Expectations {

  /** `df` plus a `violations: array<string>` column listing the rules
    * each row fails, in rule-declaration order (empty array = clean). */
  def withViolations(df: DataFrame, rules: Seq[(String, Column)]): DataFrame = {
    require(rules.nonEmpty, "expectations need at least one rule")
    require(rules.map(_._1).distinct.size == rules.size, "rule names must be unique")
    // the quarantine column serializes violations comma-joined and the
    // per-rule census splits them back on ',' — a rule name carrying the
    // separator (or nothing but whitespace) would silently corrupt that
    // census, so refuse it here, the one entry point (the manifest
    // header's requireHeaderSafe lesson applied to rule names)
    for (name <- rules.map(_._1))
      require(name.trim.nonEmpty && !name.contains(","),
        s"rule name '$name' is empty or contains ',' — names are serialized " +
          "comma-joined into the quarantine column and split back for the census")
    df.withColumn("violations", array_compact(array(rules.map { case (name, cond) =>
      when(!coalesce(cond, lit(false)), lit(name)).otherwise(lit(null).cast("string"))
    }: _*)))
  }

  /** Rows passing every rule, without the bookkeeping column. */
  def accepted(df: DataFrame, rules: Seq[(String, Column)]): DataFrame =
    withViolations(df, rules).filter(size(col("violations")) === 0).drop("violations")

  /** Rows failing ≥1 rule, `violations` serialized comma-joined (the
    * quarantine table's reason column — splittable back for per-rule
    * censuses). */
  def quarantined(df: DataFrame, rules: Seq[(String, Column)]): DataFrame =
    withViolations(df, rules).filter(size(col("violations")) > 0)
      .withColumn("violations", concat_ws(",", col("violations")))
}
