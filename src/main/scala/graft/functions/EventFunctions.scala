package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** The reference's scalar-function surface (SURVEY §2.A F1–F14) re-expressed
  * as pure `Column` functions over built-in, codegen'd Spark expressions.
  * No UDFs in the hot path: every function here compiles into whole-stage
  * codegen, so it vectorizes identically at sf0.001 and at 100 TB.
  *
  * Reference citations (into /root/reference/):
  *  - epoch helpers: src/kinesis3/utils.clj:21-63
  *  - json helpers:  src/kinesis3/utils.clj:65-71, src/kinesis3/db.clj:148-155
  *  - cookie parse:  src/kinesis3/db.clj:136-144
  *  - url codec:     src/kinesis3/utils.clj:79-85
  *  - line split:    src/kinesis3/utils.clj:17-19
  */
object EventFunctions {

  /** F1 — epoch millis (long or numeric string) → timestamp; falls back to
    * current_timestamp on unparseable input (utils.clj:26-30 rescue branch).
    * try_cast, not cast: under ANSI mode (Spark 4 default) a plain cast of
    * garbage THROWS — one bad record must never kill an ingest job. */
  def epochMillisToTs(c: Column): Column =
    coalesce(timestamp_millis(c.try_cast("long")), current_timestamp())

  /** F2 — epoch millis → "yyyy-MM-dd" day string (utils.clj:32-35). */
  def epochToDay(c: Column): Column =
    date_format(epochMillisToTs(c), "yyyy-MM-dd")

  /** F3 — epoch millis → "yyyy-MM-dd'T'HH:mm:ss" (utils.clj:37-40). */
  def epochToDatetime(c: Column): Column =
    date_format(epochMillisToTs(c), "yyyy-MM-dd'T'HH:mm:ss")

  /** F4 — hour truncation → epoch seconds of the hour start
    * (utils.clj:51-63; doc example: 1437609280911 → 1437606000). */
  def hourStartEpoch(c: Column): Column =
    unix_timestamp(date_trunc("hour", epochMillisToTs(c)))

  /** F5 — date ⇄ string round-trip (utils.clj:42-48). */
  def dateToStr(c: Column): Column = date_format(c, "yyyy-MM-dd")
  def strToDate(c: Column): Column = to_date(c, "yyyy-MM-dd")

  /** F6 — "now" as float epoch seconds (core.clj:109-111). */
  def nowEpochSeconds: Column = unix_timestamp().cast("double")

  /** F9 — cookie string "k=v; k2=v2" → map with URL-decoded values
    * (db.clj:136-144: split ';', split '=' limit 2, trim, url-decode
    * value; malformed %-sequence → NULL value, not an exception). Native
    * ParseCookies expression: one pass per evaluation, so projections that
    * extract several keys stay cheap (the built-in str_to_map composition
    * re-evaluated per key reference — 25 s/100k rows at sf0.1). */
  def parseCookies(c: Column): Column =
    org.apache.spark.sql.GraftBridge.column(
      graft.functions.ParseCookies(org.apache.spark.sql.GraftBridge.expression(c)))

  /** F10 — URL encode/decode, UTF-8 (utils.clj:79-85). */
  def urlEncode(c: Column): Column = url_encode(c)
  def urlDecode(c: Column): Column = url_decode(c)

  /** F11 — fixed-offset split of a line-file record: chars [0,56) are the
    * Kinesis sequence number, [57,∞) the payload (utils.clj:17-19). */
  def lineSeqNumber(c: Column): Column = substring(c, 1, 56)
  def linePayload(c: Column): Column = substring(c, 58, Int.MaxValue)

  /** F12 — line-file record format "<seq> <data>" (core.clj:153 emits a
    * trailing " \n"; the writer adds it, the reader tolerates it). */
  def formatLine(seq: Column, data: Column): Column = concat_ws(" ", seq, data)

  /** F13 — UTM extraction from the parsed `args` map (db.clj:166-170). */
  val utmKeys = Seq("utm_source", "utm_campaign", "utm_medium", "utm_content", "utm_term")
  def utmCols(args: Column): Seq[Column] =
    utmKeys.map(k => element_at(args, k).as(k))

  /** F14 — scalar coercion helpers (utils.clj:73-77, 95-98). */
  def asVector(c: Column): Column = when(c.isNull, array()).otherwise(array(c))
  def isIn(c: Column, values: Seq[Any]): Column = c.isin(values: _*)
}
