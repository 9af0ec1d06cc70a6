package graft.functions

import java.time.LocalDateTime
import java.time.format.{DateTimeFormatter, DateTimeFormatterBuilder}
import java.time.temporal.ChronoField._
import java.util.Locale

/** The reference's Teradata compatibility plugin
  * (presto-teradata-functions/.../TeradataStringFunctions.java,
  * TeradataDateFunctions.java + dateformat/DateFormatParser.java):
  * `index`, `char2hexint`, and the TO_CHAR/TO_DATE/TO_TIMESTAMP trio
  * over the Teradata format-token language. Token set and semantics
  * follow DateFormatParser exactly — longest-match over
  * YYYY/YY/HH24/HH/DD/MI/MM/SS (case-insensitive), everything else a
  * literal; YY uses the reference's two-digit pivot 2050 (Joda
  * appendTwoDigitYear → years 2000–2099); missing fields default to
  * 1970-01-01T00:00:00 as Joda's parseMillis does.
  */
object TeradataFns {

  private val cache =
    new java.util.concurrent.ConcurrentHashMap[String, DateTimeFormatter]()

  private def buildFormatter(fmt: String): DateTimeFormatter = {
    val b = new DateTimeFormatterBuilder
    val up = fmt.toUpperCase(Locale.ENGLISH)
    var i = 0
    var hasYear, hasMonth, hasDay, hasH24, hasH12, hasMin, hasSec = false
    while (i < fmt.length) {
      if (up.startsWith("YYYY", i)) { b.appendValue(YEAR, 4); hasYear = true; i += 4 }
      else if (up.startsWith("YY", i)) {
        b.appendValueReduced(YEAR, 2, 2, 2000); hasYear = true; i += 2
      }
      else if (up.startsWith("HH24", i)) { b.appendValue(HOUR_OF_DAY, 2); hasH24 = true; i += 4 }
      else if (up.startsWith("HH", i)) { b.appendValue(HOUR_OF_AMPM, 2); hasH12 = true; i += 2 }
      else if (up.startsWith("DD", i)) { b.appendValue(DAY_OF_MONTH, 2); hasDay = true; i += 2 }
      else if (up.startsWith("MI", i)) { b.appendValue(MINUTE_OF_HOUR, 2); hasMin = true; i += 2 }
      else if (up.startsWith("MM", i)) { b.appendValue(MONTH_OF_YEAR, 2); hasMonth = true; i += 2 }
      else if (up.startsWith("SS", i)) { b.appendValue(SECOND_OF_MINUTE, 2); hasSec = true; i += 2 }
      else { b.appendLiteral(fmt.charAt(i)); i += 1 }
    }
    // Joda parseMillis defaults every absent field to the 1970 epoch
    if (!hasYear) b.parseDefaulting(YEAR, 1970)
    if (!hasMonth) b.parseDefaulting(MONTH_OF_YEAR, 1)
    if (!hasDay) b.parseDefaulting(DAY_OF_MONTH, 1)
    if (hasH12) b.parseDefaulting(AMPM_OF_DAY, 0)
    else if (!hasH24) b.parseDefaulting(HOUR_OF_DAY, 0)
    if (!hasMin) b.parseDefaulting(MINUTE_OF_HOUR, 0)
    if (!hasSec) b.parseDefaulting(SECOND_OF_MINUTE, 0)
    b.toFormatter(Locale.ENGLISH)
  }

  private def formatter(fmt: String): DateTimeFormatter =
    cache.computeIfAbsent(fmt, buildFormatter)

  /** to_char(timestamp, fmt) — rendered in the pinned-UTC session zone
    * (the reference takes TIMESTAMP WITH TIME ZONE; see the zoned-type
    * divergence contract in COVERAGE.md).
    */
  def toChar(ts: java.sql.Timestamp, fmt: String): String =
    if (ts == null || fmt == null) null
    else formatter(fmt).format(
      ts.toInstant.atZone(java.time.ZoneOffset.UTC).toLocalDateTime)

  def toTimestampLdt(s: String, fmt: String): LocalDateTime =
    LocalDateTime.from(formatter(fmt).parse(s))

  def toTimestamp(s: String, fmt: String): java.sql.Timestamp =
    if (s == null || fmt == null) null
    else java.sql.Timestamp.from(toTimestampLdt(s, fmt).toInstant(java.time.ZoneOffset.UTC))

  def toDate(s: String, fmt: String): java.sql.Date =
    if (s == null || fmt == null) null
    else java.sql.Date.valueOf(toTimestampLdt(s, fmt).toLocalDate)

  /** char2hexint: uppercase hex of the UTF-16BE encoding. */
  def char2HexInt(s: String): String =
    if (s == null) null
    else {
      val bytes = s.getBytes(java.nio.charset.StandardCharsets.UTF_16BE)
      val sb = new StringBuilder(bytes.length * 2)
      bytes.foreach(x => sb.append(f"${x & 0xff}%02X"))
      sb.toString
    }
}
