package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Date normalize/validate (P10) — the reference's `tdei-date.ts:3-21`:
  * `UTC(date?)` renders an ISO-8601 UTC string with millisecond
  * precision and a literal `Z` (JS `Date.toISOString()`); `isValid(str)`
  * is "parses to a real timestamp".
  *
  * Pure built-in `functions` — codegen'd, no UDF. The session time zone
  * must be UTC (the engine pins it) so `date_format`'s `XXX` renders `Z`.
  */
object TdeiDate {

  private val IsoMillis = "yyyy-MM-dd'T'HH:mm:ss.SSSXXX"

  /** Timestamp column → ISO-8601 UTC string (`2024-01-02T03:04:05.678Z`). */
  def utc(ts: Column): Column = date_format(ts, IsoMillis)

  /** String column → normalized ISO UTC string, null when unparseable
    * (`try_to_timestamp` is null-on-failure even under ANSI mode).
    */
  def utcFromString(s: Column): Column = date_format(try_to_timestamp(s), IsoMillis)

  /** Validity: the reference treats "parses to a date" as valid
    * (`tdei-date.ts:8-21`).
    */
  def isValid(s: Column): Column = try_to_timestamp(s).isNotNull
}
