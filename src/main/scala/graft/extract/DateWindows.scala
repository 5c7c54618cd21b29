package graft.extract

import java.time.format.DateTimeFormatter
import java.time.{LocalDate, ZoneId, ZonedDateTime}

/** Incremental-window computation for the `aje_*` filter data types
  * (utils/extract_data_v2/utils/date_utils.py:48-96; duplicated at
  * query_generator.py:342-367 and extract_data_spark.py:389-420).
  *
  * The clock is a parameter — the reference's now()-relative windows are the
  * main source of non-determinism, so tests freeze it (SURVEY §7.3).
  */
object DateWindows {

  val Lima: ZoneId = ZoneId.of("America/Lima")
  /** FoxPro/Excel day-number offset shared with the DSL's DateMagic. */
  val MagicOffset = 693596
  private val Epoch1900 = LocalDate.of(1900, 1, 1)

  /** (lowerLimit, upperLimit) for a filter column of `dataType`, spanning
    * `delayIni` months back to `delayEnd` months back (both usually ≤ 0).
    *
    *   - `aje_period`               → 'YYYYMM' strings
    *   - `aje_date`/`aje_processperiod` → FoxPro day numbers, snapped to the
    *     first day of the start month / last day of the end month
    *   - anything else              → 'yyyy-MM-dd' strings
    */
  def dateLimits(
      delayIni: String,
      delayEnd: String,
      dataType: String,
      now: ZonedDateTime = ZonedDateTime.now(Lima)
  ): (String, String) = {
    val ini = delayIni.trim.replace("'", "").toIntOption.getOrElse(-2)
    val end = Option(delayEnd).map(_.trim.replace("'", "")).filter(_.nonEmpty)
      .flatMap(_.toIntOption).getOrElse(0)
    val current = now.withZoneSameInstant(Lima)
    val startDate = current.minusMonths(-1L * ini)
    val endDate = current.minusMonths(-1L * end)

    dataType match {
      case "aje_period" =>
        val fmt = DateTimeFormatter.ofPattern("yyyyMM")
        (startDate.format(fmt), endDate.format(fmt))
      case "aje_date" | "aje_processperiod" =>
        val startDay = startDate.toLocalDate.withDayOfMonth(1)
        val endDay = endDate.toLocalDate.withDayOfMonth(endDate.toLocalDate.lengthOfMonth)
        (dayNumber(startDay).toString, dayNumber(endDay).toString)
      case _ =>
        val fmt = DateTimeFormatter.ofPattern("yyyy-MM-dd")
        (startDate.format(fmt), endDate.format(fmt))
    }
  }

  /** (lowerLimit, upperLimit) for a `days_off` trailing window: NUM_DAYS
    * days back up to now, formatted per `dataType` like [[dateLimits]].
    * Day granularity means no month snapping — `aje_date` /
    * `aje_processperiod` take the exact start/end days' FoxPro numbers
    * (the reference stores NUM_DAYS without consuming it,
    * extract_data_spark.py:193 / light_transform.py:543 — this window is
    * the evidently-intended semantics, documented as an engine decision).
    */
  def trailingDays(
      numDays: Int,
      dataType: String,
      now: ZonedDateTime = ZonedDateTime.now(Lima)
  ): (String, String) = {
    val endDate = now.withZoneSameInstant(Lima)
    val startDate = endDate.minusDays(math.max(0, numDays).toLong)
    dataType match {
      case "aje_period" =>
        val fmt = DateTimeFormatter.ofPattern("yyyyMM")
        (startDate.format(fmt), endDate.format(fmt))
      case "aje_date" | "aje_processperiod" =>
        (dayNumber(startDate.toLocalDate).toString,
          dayNumber(endDate.toLocalDate).toString)
      case _ =>
        val fmt = DateTimeFormatter.ofPattern("yyyy-MM-dd")
        (startDate.format(fmt), endDate.format(fmt))
    }
  }

  /** FoxPro day number of a date: days since 1900-01-01 plus MagicOffset. */
  def dayNumber(d: LocalDate): Long =
    java.time.temporal.ChronoUnit.DAYS.between(Epoch1900, d) + MagicOffset

  def dateFromDayNumber(n: Long): LocalDate = Epoch1900.plusDays(n - MagicOffset)
}
