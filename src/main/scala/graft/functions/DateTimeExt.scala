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

  /** WEEK(date, mode) — the full MySQL mode table (reference
    * sql/expression/function/time.go WEEK). Axes per mode:
    * week start (odd = Monday, even = Sunday); week-1 rule (modes 1/3/4/6:
    * the week with >=4 days this year; others: the first week fully
    * starting this year); range (modes 0/1/4/5: 0..53, days before week 1
    * give 0; modes 2/3/6/7: 1..53, those days count into the previous
    * year's last week). Modes with BOTH the >=4-days rule and the 1..53
    * range (3 and 6) also roll forward: late-December days on/after next
    * year's week-1 start are week 1 (reference time.go calcWeek: the
    * `weekYear && days >= 52*7` branch; 0..53 modes never roll —
    * WEEK('2008-12-31',1) = 53). Mode 3 is ISO 8601 = Spark's
    * weekofyear. */
  def week(d0: Column, mode: Int): Column = {
    require(mode >= 0 && mode <= 7, s"WEEK mode $mode out of range")
    val d = d0.cast("date")
    if (mode == 3) weekofyear(d)
    else {
      val mondayFirst = mode % 2 == 1
      val fourDays = Set(1, 4, 6)(mode) // (3 handled above)
      val zeroRange = Set(0, 1, 4, 5)(mode)
      def startOf(yc: Column): Column = {
        val jan1 = make_date(yc, lit(1), lit(1))
        // days since the week's first day (0..6); dayofweek: Sunday=1
        val dow =
          if (mondayFirst) (dayofweek(jan1) + 5) % 7
          else (dayofweek(jan1) + 6) % 7
        if (fourDays)
          date_add(jan1, when(dow <= 3, -dow).otherwise(lit(7) - dow).cast("int"))
        else
          date_add(jan1, ((lit(7) - dow) % 7).cast("int"))
      }
      def wk(start: Column): Column =
        (floor(datediff(d, start) / 7) + 1).cast("int")
      val s = startOf(year(d))
      val rollFwd =
        if (fourDays && !zeroRange) when(d >= startOf(year(d) + 1), lit(1))
        else when(lit(false), lit(0))
      rollFwd
        .when(d >= s, wk(s))
        .otherwise(if (zeroRange) lit(0) else wk(startOf(year(d) - 1)))
    }
  }

  /** Scalar twin of [[week]] for driver/eval-side callers (the
    * %U/%u/%V/%X date-format specs) — same mode table. */
  def weekModeInt(d: java.time.LocalDate, mode: Int): Int = {
    if (mode == 3)
      return d.get(java.time.temporal.WeekFields.ISO.weekOfWeekBasedYear)
    val mondayFirst = mode % 2 == 1
    val fourDays = Set(1, 4, 6)(mode)
    val zeroRange = Set(0, 1, 4, 5)(mode)
    def startOf(y: Int): java.time.LocalDate = {
      val jan1 = java.time.LocalDate.of(y, 1, 1)
      val dow =
        if (mondayFirst) jan1.getDayOfWeek.getValue - 1
        else jan1.getDayOfWeek.getValue % 7
      if (fourDays) {
        if (dow <= 3) jan1.minusDays(dow.toLong)
        else jan1.plusDays((7 - dow).toLong)
      } else jan1.plusDays(((7 - dow) % 7).toLong)
    }
    def wk(start: java.time.LocalDate): Int =
      (java.time.temporal.ChronoUnit.DAYS.between(start, d) / 7 + 1).toInt
    val y = d.getYear
    val s0 = startOf(y)
    if (fourDays && !zeroRange && !d.isBefore(startOf(y + 1))) 1
    else if (!d.isBefore(s0)) wk(s0)
    else if (zeroRange) 0
    else wk(startOf(y - 1))
  }

  /** The year a [[weekModeInt]] week belongs to (1..53-range modes roll
    * into the adjacent year). */
  def weekYearInt(d: java.time.LocalDate, mode: Int): Int = {
    if (mode == 3)
      return d.get(java.time.temporal.WeekFields.ISO.weekBasedYear)
    val mondayFirst = mode % 2 == 1
    val fourDays = Set(1, 4, 6)(mode)
    val zeroRange = Set(0, 1, 4, 5)(mode)
    def startOf(y: Int): java.time.LocalDate = {
      val jan1 = java.time.LocalDate.of(y, 1, 1)
      val dow =
        if (mondayFirst) jan1.getDayOfWeek.getValue - 1
        else jan1.getDayOfWeek.getValue % 7
      if (fourDays) {
        if (dow <= 3) jan1.minusDays(dow.toLong)
        else jan1.plusDays((7 - dow).toLong)
      } else jan1.plusDays(((7 - dow) % 7).toLong)
    }
    val y = d.getYear
    if (fourDays && !zeroRange && !d.isBefore(startOf(y + 1))) y + 1
    else if (!d.isBefore(startOf(y))) y
    else if (zeroRange) y
    else y - 1
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

  // ---- MySQL-lenient datetime string canonicalization ------------------
  // MySQL's str_to_datetime (reference sql/types/datetime.go
  // ConvertWithoutRangeCheck) accepts ANY punctuation as a date
  // delimiter ('2009.02.09', '2009/02/09'), delimiter-free digit runs
  // (20090209, 090209, 20090209123456), and 2-digit years (00-69 →
  // 20xx, 70-99 → 19xx). Spark's cast accepts none of these, so write
  // paths canonicalize strings to Spark-castable ISO form first;
  // strings that don't match any MySQL shape pass through unchanged
  // (the subsequent cast yields NULL and strict mode raises 1292).

  // the date-time separator is ANY non-digit in MySQL ('2009-02-09:10'),
  // not just space/T
  private val DelimDt =
    ("""^(\d{1,4})[^\dT ](\d{1,2})[^\dT ](\d{1,2})""" +
     """(?:[^\d](\d{1,2})(?:[^\d](\d{1,2})(?:[^\d.](\d{1,2})(\.\d+)?)?)?)?$""").r
  private val PackedDt = """^(\d{6}|\d{8}|\d{12}|\d{14})(\.\d+)?$""".r
  private val CastableIso =
    """^\d{4}-\d{1,2}-\d{1,2}( \d{1,2}:\d{1,2}:\d{1,2}(\.\d{1,6})?)?$""".r

  private def expandYear(y: String): Int = {
    val n = y.toInt
    if (y.length > 2) n else if (n <= 69) 2000 + n else 1900 + n
  }

  /** Canonicalize one MySQL-legal datetime string to ISO
    * "yyyy-MM-dd[ HH:mm:ss[.f]]"; anything else returns unchanged. */
  /** Explicit timezone suffix on a datetime literal — MySQL 8.0.19
    * `'2020-02-16 12:00:00 +0800 CST'` (a trailing zone NAME after the
    * offset is display-only): the value converts to the SESSION zone. */
  private val TzSuffix =
    ("""^(\d{4}-\d{1,2}-\d{1,2}[ T]\d{1,2}:\d{1,2}(?::\d{1,2}(?:\.\d+)?)?)""" +
      """\s*([+-])(\d{1,2}):?(\d{2})(?:\s+[A-Za-z]{2,5})?$""").r

  def mysqlDateStrNorm(s0: String): String = {
    val s1 = s0.trim
    val s = s1 match {
      case TzSuffix(base, sign, hh, mm) =>
        try {
          val ldt = java.time.LocalDateTime.parse(
            mysqlDateStrNorm(base).replace(' ', 'T'))
          val k = if (sign == "-") -1 else 1
          val off = java.time.ZoneOffset
            .ofHoursMinutes(k * hh.toInt, k * mm.toInt)
          val zone = java.time.ZoneId.of(
            org.apache.spark.sql.internal.SQLConf.get.sessionLocalTimeZone)
          val shifted = ldt.atOffset(off).atZoneSameInstant(zone)
            .toLocalDateTime
          f"${shifted.getYear}%04d-${shifted.getMonthValue}%02d-" +
            f"${shifted.getDayOfMonth}%02d ${shifted.getHour}%02d:" +
            f"${shifted.getMinute}%02d:${shifted.getSecond}%02d"
        } catch { case _: Exception => s1 }
      case other => other
    }
    def render(y: Int, mo: String, d: String, h: String, mi: String,
               se: String, fr: String): String = {
      val date = f"$y%04d-${mo.toInt}%02d-${d.toInt}%02d"
      if (h == null) date
      else {
        val hh = h.toInt
        val mm = if (mi == null) 0 else mi.toInt
        val ss = if (se == null) 0 else se.toInt
        // MySQL datetimes carry microseconds; digits beyond 6 ROUND
        // half-up ('.9999994' -> .999999, '.9999995' carries a second —
        // possibly out of range, which the subsequent range check nulls)
        if (fr == null) f"$date $hh%02d:$mm%02d:$ss%02d"
        else {
          val bd = BigDecimal("0" + fr)
            .setScale(6, BigDecimal.RoundingMode.HALF_UP)
          val micros = (bd * 1000000).toLongExact
          if (micros < 1000000L)
            f"$date $hh%02d:$mm%02d:$ss%02d.$micros%06d"
          else
            try {
              val c = java.time.LocalDateTime
                .of(y, mo.toInt, d.toInt, hh, mm, ss).plusSeconds(1)
              f"${c.getYear}%04d-${c.getMonthValue}%02d-${c.getDayOfMonth}%02d " +
                f"${c.getHour}%02d:${c.getMinute}%02d:${c.getSecond}%02d"
            } catch { case _: Exception => s0 }
        }
      }
    }
    s match {
      case DelimDt(y, mo, d, h, mi, se, fr) =>
        // Spark-castable ISO form passes through so valid fast-path
        // strings never round-trip a rebuild (the shape check includes
        // the ' ' time separator and a ≤6-digit fraction)
        if (CastableIso.pattern.matcher(s).matches()) s
        else render(expandYear(y), mo, d, h, mi, se, fr)
      case PackedDt(digits, fr) =>
        val yLen = if (digits.length == 8 || digits.length == 14) 4 else 2
        val y = expandYear(digits.substring(0, yLen))
        val mo = digits.substring(yLen, yLen + 2)
        val d = digits.substring(yLen + 2, yLen + 4)
        if (digits.length <= 8) render(y, mo, d, null, null, null, null)
        else render(y, mo, d, digits.substring(yLen + 4, yLen + 6),
          digits.substring(yLen + 6, yLen + 8),
          digits.substring(yLen + 8, yLen + 10), fr)
      // a digit run of any OTHER length is not a MySQL date shape —
      // Spark's cast would read '1234' as the year 1234, so emit an
      // explicitly uncastable form (CAST(1234 AS DATE) is NULL)
      case BadDigits() => "invalid-datetime:" + s
      case _ => s0
    }
  }
  private val BadDigits = """^\d+(?:\.\d+)?$""".r

  /** mysql_dtnorm(x): canonicalize a MySQL-legal datetime STRING to a
    * Spark-castable ISO form (identity for non-strings and for strings
    * matching no MySQL shape). Read-path twin of the write-path
    * canonicalization above. */
  case class MySqlDtNorm(child: org.apache.spark.sql.catalyst.expressions.Expression)
      extends org.apache.spark.sql.catalyst.expressions.UnaryExpression
      with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {
    import org.apache.spark.sql.types._
    override def dataType: DataType = child.dataType match {
      case _: StringType => StringType
      case other => other
    }
    override def nullable: Boolean = child.nullable
    override def nullSafeEval(v: Any): Any = v match {
      case u: org.apache.spark.unsafe.types.UTF8String =>
        org.apache.spark.unsafe.types.UTF8String
          .fromString(mysqlDateStrNorm(u.toString))
      case other => other
    }
    override protected def withNewChildInternal(
        c: org.apache.spark.sql.catalyst.expressions.Expression) = copy(c)
  }

  /** mysql_dt_clamp(x): NULL when a DATE/TIMESTAMP value falls outside
    * MySQL's representable datetime range [0000-01-01,
    * 9999-12-31 23:59:59.999999] (reference types/datetime.go range
    * check — date_add overflow reads NULL with a 1441 warning).
    * Type-preserving; pass-through for in-range values. */
  case class MySqlDtClamp(child: org.apache.spark.sql.catalyst.expressions.Expression)
      extends org.apache.spark.sql.catalyst.expressions.UnaryExpression
      with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {
    import org.apache.spark.sql.types._
    override def dataType: DataType = child.dataType
    override def nullable: Boolean = true
    private val minMicros = java.time.LocalDateTime.of(0, 1, 1, 0, 0)
      .toEpochSecond(java.time.ZoneOffset.UTC) * 1000000L
    private val maxMicros = java.time.LocalDateTime
      .of(9999, 12, 31, 23, 59, 59, 999999000)
      .toEpochSecond(java.time.ZoneOffset.UTC) * 1000000L + 999999L
    private val minDays = java.time.LocalDate.of(0, 1, 1).toEpochDay
    private val maxDays = java.time.LocalDate.of(9999, 12, 31).toEpochDay
    override def nullSafeEval(v: Any): Any = child.dataType match {
      case DateType =>
        val d = v.asInstanceOf[Int].toLong
        if (d < minDays || d > maxDays) null else v
      case TimestampType | TimestampNTZType =>
        val m = v.asInstanceOf[Long]
        if (m < minMicros || m > maxMicros) null else v
      case _ => v
    }
    override protected def withNewChildInternal(
        c: org.apache.spark.sql.catalyst.expressions.Expression) = copy(c)
  }
}
