package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Timezone and date helpers re-expressing the reference's scalar time
  * semantics on Catalyst built-ins (no UDFs — everything stays inside
  * whole-stage codegen).
  *
  * Reference behaviors covered:
  *  - F1 `tz_utc_to_sp` (/root/reference/src/jurimetria_pipeline.py:51-58):
  *    parse ISO string as UTC, convert to America/Sao_Paulo wall-clock,
  *    null-in → null-out, unparseable → null.
  *  - F7 hour extraction (:274-279): hour of the São Paulo wall-clock.
  *  - F8 date reformat (legacy/legacy_datajud_connector.py:65-66):
  *    dd/MM/yyyy → yyyy-MM-dd.
  *
  * Spark's TimestampType is tz-less UTC microseconds; "São Paulo wall-clock"
  * is a *derivation discipline*, not a storage property — every SP-semantic
  * value is derived explicitly with from_utc_timestamp at the point of use
  * (SURVEY.md §7.4.1). Session timezone is pinned to UTC.
  */
object TimeFns {
  val SpTz = "America/Sao_Paulo"

  /** F1: UTC instant → São Paulo wall-clock (null-safe, codegen'd). */
  def utcToSp(c: Column): Column = from_utc_timestamp(c, SpTz)

  /** F1 on raw ISO-8601 strings: unparseable → null (non-ANSI to_timestamp),
    * matching the reference's OutOfBounds/parse-failure → None behavior. */
  def parseUtcToSp(c: Column): Column = utcToSp(to_timestamp(c))

  /** F7: filing hour in São Paulo wall-clock, as LongType for oracle parity
    * (DuckDB EXTRACT(hour ...) is BIGINT). */
  def hourSp(c: Column): Column = hour(utcToSp(c)).cast("long")

  /** F8: dd/MM/yyyy string → yyyy-MM-dd string (null/unparseable → null). */
  def reformatBrDate(c: Column): Column =
    date_format(to_date(c, "dd/MM/yyyy"), "yyyy-MM-dd")

  /** Render a timestamp as a second-precision string — the only way
    * timestamps leave the engine in oracle-checked queries (sub-second
    * precision and physical type differ between engines; strings don't). */
  def tsString(c: Column): Column = date_format(c, "yyyy-MM-dd HH:mm:ss")
}
