package graft.sinks

import java.sql.{Connection, DriverManager, PreparedStatement}
import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** K3 — last-write-wins JDBC upsert, the reference's *effective* sink
  * semantics (SURVEY §2.A note on flush-events!, db.clj:113-134: the
  * diff/retry paths are dead code; what it observably does is delete the
  * incoming ids then insert all incoming rows — LWW keyed on id).
  *
  * Spark-first redesign: the reference probes/deletes/inserts PER RECORD
  * (three round-trips each, db.clj:72,91,122 — its scalability cliff);
  * here the unit is a partition of a micro-batch: one transaction that
  * deletes the partition's ids and batch-inserts its rows. Replaying a
  * batch is a no-op (delete+insert is idempotent), which upgrades the
  * at-least-once source contract to effectively-once end-to-end.
  *
  * Use from Structured Streaming as
  * `stream.writeStream.foreachBatch { (df, id) => sink.upsertBatch(df) }`.
  *
  * Dialects (selected from the JDBC URL): engines with a native upsert
  * get one — Postgres runs a single `INSERT … ON CONFLICT (key) DO
  * UPDATE` statement per row batch (half the statements, and the
  * insert-or-update is atomic per row instead of spanning the
  * delete+insert pair inside the txn). Everything else (Derby-class)
  * keeps the portable delete+insert transaction. `jsonCols` names
  * columns holding JSON text: on Postgres they are inserted through a
  * `?::json` cast so they land as typed `json` values, the same typing
  * the reference applies via PGobject("json") wrappers
  * (db.clj:48-51,158-172); other dialects store them as plain text.
  */
class JdbcUpsertSink(url: String, table: String, keyCol: String,
    jsonCols: Set[String] = Set.empty) extends Serializable {

  /** One transaction per partition: upsert the partition's rows (dialect
    * native form, or DELETE keys + batch-INSERT). Batch is deduped to one
    * row per key first (LWW within the batch), so parallel partitions
    * never race on a key — and the Postgres path never trips "ON CONFLICT
    * cannot affect row a second time". */
  def upsertBatch(batch: DataFrame, orderCol: String): Unit = {
    val deduped = JdbcUpsertSink.lastWriteWins(batch, keyCol, col(orderCol))
    val schema = deduped.schema
    val (u, t, k, j) = (url, table, keyCol, jsonCols)
    deduped.foreachPartition { (rows: Iterator[Row]) =>
      if (rows.nonEmpty) JdbcUpsertSink.writePartition(u, t, k, j, schema, rows)
    }
  }
}

object JdbcUpsertSink {

  /** The event table's JSON-text columns (the ones the reference stores
    * as PGobject("json"), db.clj:158-172) — pass as `jsonCols` when
    * upserting the parsed-event shape into Postgres. */
  val EventJsonCols: Set[String] = Set("user_data", "cookies", "args", "form", "orig_data")

  /** LWW dedup: keep, per key, the row with the greatest orderCol.
    * orderCol should be a total order per key (e.g. the Kinesis sequence
    * number, monotone per shard); when a batch nonetheless carries two
    * rows tied on (key, orderCol), the winner is chosen by a stable
    * payload hash (greatest xxhash64 of the name-sorted row JSON) — a
    * deterministic election, so replays and different partitionings can
    * never flip which duplicate survives. One shuffle on the key;
    * map-side nothing to combine (row-level op). */
  def lastWriteWins(df: DataFrame, keyCol: String, orderCol: Column): DataFrame = {
    // `keyCol` may be a comma-separated composite spec (the manifest
    // sink's key identity) — LWW then holds per key TUPLE, one window
    // shuffle over all components
    val keys = keyCol.split(",").map(_.trim).filter(_.nonEmpty).toSeq
    val tiebreak = xxhash64(to_json(struct(df.columns.sorted.map(col): _*)))
    val w = Window.partitionBy(keys.map(col): _*).orderBy(orderCol.desc, tiebreak.desc)
    df.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .drop("__rn")
  }

  /** SQL-generation dialect. Selected from the URL, pure (no connection),
    * so specs assert the exact statements each engine receives. */
  sealed trait Dialect { def name: String }
  /** Portable delete+insert pair inside one transaction. */
  case object Generic extends Dialect { val name = "generic" }
  /** Native atomic `INSERT … ON CONFLICT DO UPDATE` + typed json casts. */
  case object Postgres extends Dialect { val name = "postgres" }
  /** Native `INSERT … ON DUPLICATE KEY UPDATE` + CAST(? AS JSON). */
  case object MySql extends Dialect { val name = "mysql" }

  def dialectFor(url: String): Dialect =
    if (url.startsWith("jdbc:postgresql:")) Postgres
    else if (url.startsWith("jdbc:mysql:") || url.startsWith("jdbc:mariadb:")) MySql
    else Generic

  def deleteSql(table: String, keyCol: String): String =
    s"DELETE FROM ${validIdent(table)} WHERE ${validIdent(keyCol)} = ?"

  def insertSql(table: String, schema: StructType): String = {
    val cols = schema.fieldNames.map(validIdent).mkString(", ")
    val qs = schema.fields.map(_ => "?").mkString(", ")
    s"INSERT INTO ${validIdent(table)} ($cols) VALUES ($qs)"
  }

  /** Postgres upsert: placeholders for `jsonCols` carry a `?::json` cast
    * (typed json storage, reference parity); every non-key column is
    * updated from EXCLUDED on conflict, or DO NOTHING when the key is the
    * whole schema (re-inserting an identical key is then a no-op). */
  def pgUpsertSql(table: String, schema: StructType, keyCol: String,
      jsonCols: Set[String]): String = {
    val cols = schema.fieldNames.map(validIdent).mkString(", ")
    val qs = schema.fieldNames
      .map(f => if (jsonCols(f)) "?::json" else "?").mkString(", ")
    val updates = schema.fieldNames.filterNot(_ == keyCol)
      .map(f => s"${validIdent(f)} = EXCLUDED.${validIdent(f)}")
    val action =
      if (updates.isEmpty) "DO NOTHING"
      else s"DO UPDATE SET ${updates.mkString(", ")}"
    s"INSERT INTO ${validIdent(table)} ($cols) VALUES ($qs) " +
      s"ON CONFLICT (${validIdent(keyCol)}) $action"
  }

  /** MySQL/MariaDB upsert: `ON DUPLICATE KEY UPDATE col = VALUES(col)`
    * (the form every 5.x/8.x server accepts); `jsonCols` placeholders go
    * through `CAST(? AS JSON)` for typed storage like the PG path.
    * Semantic caveat vs Postgres (documented, inherent to the engine):
    * MySQL fires the update on a conflict with ANY unique key, not just
    * `keyCol` — the LWW contract holds when `keyCol` is the table's one
    * unique constraint, which is the reference's events-table shape. */
  def mysqlUpsertSql(table: String, schema: StructType, keyCol: String,
      jsonCols: Set[String]): String = {
    val cols = schema.fieldNames.map(validIdent).mkString(", ")
    val qs = schema.fieldNames
      .map(f => if (jsonCols(f)) "CAST(? AS JSON)" else "?").mkString(", ")
    val updates = schema.fieldNames.filterNot(_ == keyCol)
      .map(f => s"${validIdent(f)} = VALUES(${validIdent(f)})")
    val action =
      if (updates.isEmpty) s"${validIdent(keyCol)} = ${validIdent(keyCol)}" // no-op
      else updates.mkString(", ")
    s"INSERT INTO ${validIdent(table)} ($cols) VALUES ($qs) " +
      s"ON DUPLICATE KEY UPDATE $action"
  }

  private def writePartition(
      url: String, table: String, keyCol: String, jsonCols: Set[String],
      schema: StructType, rows: Iterator[Row]): Unit = {
    val conn = DriverManager.getConnection(url)
    try {
      conn.setAutoCommit(false)
      val buf = rows.toArray
      dialectFor(url) match {
        case Postgres =>
          upsertRows(conn, pgUpsertSql(table, schema, keyCol, jsonCols), schema, buf)
        case MySql =>
          upsertRows(conn, mysqlUpsertSql(table, schema, keyCol, jsonCols), schema, buf)
        case Generic =>
          deleteKeys(conn, table, keyCol, schema, buf)
          insertRows(conn, table, schema, buf)
      }
      conn.commit()
    } catch {
      case e: Throwable => conn.rollback(); throw e
    } finally conn.close()
  }

  private def upsertRows(
      conn: Connection, sql: String, schema: StructType, rows: Array[Row]): Unit = {
    val st = conn.prepareStatement(sql)
    try {
      rows.foreach { r =>
        schema.fields.zipWithIndex.foreach { case (f, i) => setParam(st, i + 1, f.dataType, r, i) }
        st.addBatch()
      }
      st.executeBatch()
    } finally st.close()
  }

  /** Identifiers (table/column names) are interpolated into SQL text, so
    * they are validated to plain unquoted-identifier syntax — this keeps
    * the database's standard case-folding (quoting would make a lowercase
    * DataFrame schema miss a DDL-created case-folded table) while closing
    * the injection/breakage surface of raw interpolation. Schema-qualified
    * names (a.b) are allowed per part. */
  private val IdentPart = "[A-Za-z_][A-Za-z0-9_]*"
  private val IdentRe = s"$IdentPart(\\.$IdentPart)?".r
  private def validIdent(name: String): String = name match {
    case IdentRe(_*) => name
    case _ => throw new IllegalArgumentException(
      s"invalid SQL identifier for JDBC sink: '$name'")
  }

  private def deleteKeys(
      conn: Connection, table: String, keyCol: String,
      schema: StructType, rows: Array[Row]): Unit = {
    val keyIdx = schema.fieldIndex(keyCol)
    val del = conn.prepareStatement(deleteSql(table, keyCol))
    try {
      rows.foreach { r => setParam(del, 1, schema(keyIdx).dataType, r, keyIdx); del.addBatch() }
      del.executeBatch()
    } finally del.close()
  }

  private def insertRows(
      conn: Connection, table: String, schema: StructType, rows: Array[Row]): Unit = {
    val ins = conn.prepareStatement(insertSql(table, schema))
    try {
      rows.foreach { r =>
        schema.fields.zipWithIndex.foreach { case (f, i) => setParam(ins, i + 1, f.dataType, r, i) }
        ins.addBatch()
      }
      ins.executeBatch()
    } finally ins.close()
  }

  /** JDBC type code for setNull — setObject(pos, null) is
    * driver-dependent (the spec recommends setNull with a type code and
    * some drivers throw on untyped nulls). */
  private def sqlTypeFor(dt: DataType): Int = dt match {
    case LongType      => java.sql.Types.BIGINT
    case IntegerType   => java.sql.Types.INTEGER
    case DoubleType    => java.sql.Types.DOUBLE
    case FloatType     => java.sql.Types.FLOAT
    case StringType    => java.sql.Types.VARCHAR
    case TimestampType => java.sql.Types.TIMESTAMP
    case DateType      => java.sql.Types.DATE
    case BooleanType   => java.sql.Types.BOOLEAN
    case _: DecimalType => java.sql.Types.DECIMAL
    case BinaryType    => java.sql.Types.BINARY
    case _             => java.sql.Types.OTHER
  }

  private def setParam(st: PreparedStatement, pos: Int, dt: DataType, r: Row, i: Int): Unit =
    if (r.isNullAt(i)) st.setNull(pos, sqlTypeFor(dt))
    else dt match {
      case LongType      => st.setLong(pos, r.getLong(i))
      case IntegerType   => st.setInt(pos, r.getInt(i))
      case DoubleType    => st.setDouble(pos, r.getDouble(i))
      case StringType    => st.setString(pos, r.getString(i))
      case TimestampType => st.setTimestamp(pos, r.getTimestamp(i))
      case _             => st.setObject(pos, r.get(i))
    }
}
