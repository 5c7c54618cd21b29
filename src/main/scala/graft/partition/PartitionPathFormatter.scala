package graft.partition

import java.time.format.DateTimeFormatter
import java.time.temporal.WeekFields
import java.time.{ZoneId, ZonedDateTime}
import java.util.Locale

/** Partition-path template engine
  * (reference: light_transform.py:1815-1916, TOKEN_MAPPING at :1822-1833;
  * duplicated at utils/extract_data_v2/core/partition_formatter.py).
  *
  * Tokens: {YYYY} {YY} {MM} {MON} {DD} {HH} {MI} {SS} {WEEK} {QUARTER};
  * default template `year={YYYY}/month={MM}/day={DD}`. Timestamps are
  * anchored to America/Lima like the reference (TZ_LIMA, :1819) unless a
  * zone is passed explicitly.
  */
final class PartitionPathFormatter(
    formatTemplate: String = PartitionPathFormatter.DefaultFormat,
    zone: ZoneId = PartitionPathFormatter.Lima
) {
  import PartitionPathFormatter._

  validate()

  private def validate(): Unit = {
    val tokens = TokenPattern.findAllIn(formatTemplate).toList
    val bad = tokens.filterNot(TokenFormats.contains)
    require(bad.isEmpty, s"invalid partition-format token(s): ${bad.mkString(", ")}")
  }

  def formatPath(ts: ZonedDateTime): String = {
    val local = ts.withZoneSameInstant(zone)
    TokenFormats.foldLeft(formatTemplate) { case (path, (token, fmt)) =>
      if (!path.contains(token)) path
      else {
        val value = token match {
          case "{QUARTER}" => s"Q${(local.getMonthValue - 1) / 3 + 1}"
          case "{WEEK}"    =>
            // strftime %W: week of year, Monday first, zero-padded
            f"${local.get(WeekFields.of(java.time.DayOfWeek.MONDAY, 7).weekOfYear())}%02d"
          case _ => local.format(DateTimeFormatter.ofPattern(fmt, Locale.ENGLISH))
        }
        path.replace(token, value)
      }
    }
  }

  def formatPath(): String = formatPath(ZonedDateTime.now(zone))
}

object PartitionPathFormatter {
  val DefaultFormat = "year={YYYY}/month={MM}/day={DD}"
  val Lima: ZoneId = ZoneId.of("America/Lima")
  private val TokenPattern = """\{[^}]+\}""".r

  /** token → java.time pattern (None-equivalents handled in formatPath). */
  private val TokenFormats: Map[String, String] = Map(
    "{YYYY}" -> "yyyy",
    "{YY}" -> "yy",
    "{MM}" -> "MM",
    "{MON}" -> "MMM",
    "{DD}" -> "dd",
    "{HH}" -> "HH",
    "{MI}" -> "mm",
    "{SS}" -> "ss",
    "{WEEK}" -> "",     // special-cased
    "{QUARTER}" -> ""   // special-cased
  )

  private val KeyValue = """(\w+)=([^/]+)""".r

  /** Reverse parse `key=value` pairs out of a partition path
    * (light_transform.py:1884-1902).
    */
  def extractPartitionValues(path: String): Map[String, String] =
    KeyValue.findAllMatchIn(path).map(m => m.group(1) -> m.group(2)).toMap
}
