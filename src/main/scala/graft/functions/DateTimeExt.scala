package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** MySQL date/time functions beyond Spark's built-ins — SURVEY.md §2.8
  * date/time bucket (reference: sql/expression/function/time.go,
  * dateadd.go, datetime.go).
  *
  * All are compositions of codegen'd Spark expressions (no UDFs), so they
  * stay inside whole-stage codegen at scan speed.
  */
object DateTimeExt {

  /** 1970-01-01 in MySQL TO_DAYS day numbering (days since year 0). */
  private val EpochDayNumber = 719528

  /** TO_DAYS(date): day number since year 0 (reference time.go TO_DAYS). */
  def toDays(d: Column): Column =
    datediff(d.cast("date"), to_date(lit("1970-01-01"))) + EpochDayNumber

  /** FROM_DAYS(n): inverse of toDays. */
  def fromDays(n: Column): Column =
    date_add(to_date(lit("1970-01-01")), (n - EpochDayNumber).cast("int"))

  /** First Sunday of the year containing `jan1`. dayofweek: Sunday=1. */
  private def firstSunday(jan1: Column): Column =
    date_add(jan1, ((lit(8) - dayofweek(jan1)) % 7).cast("int"))

  /** YEARWEEK(date) in MySQL default mode 0 (weeks start Sunday; week 1 is
    * the first week with a Sunday in this year; earlier days count into the
    * last week of the previous year). */
  def yearWeek(d0: Column): Column = {
    val d = d0.cast("date")
    def yw(yearCol: Column): Column = {
      val jan1 = make_date(yearCol, lit(1), lit(1))
      val fs = firstSunday(jan1)
      yearCol * 100 + (floor(datediff(d, fs) / 7) + 1).cast("int")
    }
    val thisYearFs = firstSunday(make_date(year(d), lit(1), lit(1)))
    when(d >= thisYearFs, yw(year(d))).otherwise(yw(year(d) - 1))
  }

  /** TIMESTAMPDIFF(MONTH, a, b): complete months from a to b. */
  def timestampDiffMonths(a: Column, b: Column): Column =
    (year(b) - year(a)) * 12 + (month(b) - month(a)) -
      when(dayofmonth(b) < dayofmonth(a), 1).otherwise(0)

  /** SEC_TO_TIME(n) rendered as 'HH:MM:SS' (n < 86400). */
  def secToTime(n: Column): Column =
    format_string("%02d:%02d:%02d",
      (n / 3600).cast("int"), ((n % 3600) / 60).cast("int"), (n % 60).cast("int"))

  /** TIME_TO_SEC('HH:MM:SS'). */
  def timeToSec(t: Column): Column = {
    val p = split(t, ":")
    p.getItem(0).cast("int") * 3600 + p.getItem(1).cast("int") * 60 +
      p.getItem(2).cast("int")
  }

  /** CONVERT_TZ(ts, 'UTC', tz) — reference convert_tz; Spark-first via
    * from_utc_timestamp. */
  def convertTzFromUtc(ts: Column, tz: String): Column =
    from_utc_timestamp(ts, tz)

  /** MAKEDATE(year, dayofyear). */
  def makeDate(y: Column, doy: Column): Column =
    date_add(make_date(y, lit(1), lit(1)), (doy - 1).cast("int"))

  /** WEEK(date, mode) for the common modes:
    * 0 = Sunday-start, 0..53, week 1 contains this year's first Sunday;
    * 1 = Monday-start, 0..53, week 1 has >3 days this year (ISO-ish);
    * 3 = ISO 8601 (Monday-start, 1..53, belongs-to-year shifts).
    * Mode 3 is Spark's weekofyear; modes 0/1 derive from the first
    * week-start of the year. */
  def week(d0: Column, mode: Int): Column = {
    val d = d0.cast("date")
    mode match {
      case 3 => weekofyear(d)
      case 0 =>
        val fs = firstSunday(make_date(year(d), lit(1), lit(1)))
        when(d >= fs, (floor(datediff(d, fs) / 7) + 1).cast("int"))
          .otherwise(lit(0))
      case 1 =>
        // first Monday-start week with >=4 days in this year begins at
        // jan1 - ((dow_mon(jan1) <= 3) ? dow_mon : dow_mon - 7) days,
        // where dow_mon(jan1) = days since Monday (0=Mon..6=Sun)
        val jan1 = make_date(year(d), lit(1), lit(1))
        val dowMon = (dayofweek(jan1) + 5) % 7
        val start = date_add(jan1,
          when(dowMon <= 3, -dowMon).otherwise(lit(7) - dowMon).cast("int"))
        when(d >= start, (floor(datediff(d, start) / 7) + 1).cast("int"))
          .otherwise(lit(0))
      case m => throw new IllegalArgumentException(s"WEEK mode $m unsupported")
    }
  }

  /** GET_FORMAT(type, standard) — the MySQL constant table. */
  def getFormat(typ: String, standard: String): String =
    (typ.toUpperCase, standard.toUpperCase) match {
      case ("DATE", "ISO") => "%Y-%m-%d"
      case ("DATE", "USA") => "%m.%d.%Y"
      case ("DATE", "EUR") => "%d.%m.%Y"
      case ("DATE", "JIS") => "%Y-%m-%d"
      case ("DATE", "INTERNAL") => "%Y%m%d"
      case ("TIME", "ISO") | ("TIME", "JIS") => "%H:%i:%s"
      case ("TIME", "USA") => "%h:%i:%s %p"
      case ("TIME", "EUR") => "%H.%i.%s"
      case ("TIME", "INTERNAL") => "%H%i%s"
      case ("DATETIME", "USA") | ("DATETIME", "EUR") => "%Y-%m-%d %H.%i.%s"
      case ("DATETIME", _) => "%Y-%m-%d %H:%i:%s"
      case (t, st) => throw new IllegalArgumentException(s"GET_FORMAT($t, $st)")
    }
}
