package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions.date_format

/** MySQL date/time format support — SURVEY.md §2.8 date/time bucket.
  *
  * The reference implements MySQL `DATE_FORMAT` / `STR_TO_DATE` with
  * `%`-specifiers (reference: sql/expression/function/dateformat.go,
  * via its strftime dependency). Spark's `date_format` takes Java
  * DateTimeFormatter patterns, so we translate the MySQL specifier table.
  * Unsupported specifiers raise at plan time rather than silently
  * mis-formatting.
  */
object MySqlFormat {

  /** MySQL %-specifier -> Java DateTimeFormatter pattern fragment. */
  private val table: Map[Char, String] = Map(
    'Y' -> "yyyy", 'y' -> "yy",
    'M' -> "MMMM", 'b' -> "MMM", 'm' -> "MM", 'c' -> "M",
    'd' -> "dd", 'e' -> "d", 'j' -> "DDD",
    'H' -> "HH", 'k' -> "H", 'h' -> "hh", 'I' -> "hh", 'l' -> "h",
    'i' -> "mm", 'S' -> "ss", 's' -> "ss", 'f' -> "SSSSSS",
    'p' -> "a",
    'W' -> "EEEE", 'a' -> "EEE",
    'T' -> "HH:mm:ss", 'r' -> "hh:mm:ss a",
    '%' -> "%")

  /** Parse-mode overrides: MySQL numeric specifiers accept 1-2 digits
    * ('5' or '05' for %m), which Java models as the single-letter
    * pattern; the padded two-letter form is for FORMATTING only. */
  private val parseTable: Map[Char, String] = Map(
    'd' -> "d", 'm' -> "M", 'H' -> "H", 'h' -> "h", 'I' -> "h",
    'i' -> "m", 'S' -> "s", 's' -> "s")

  /** Translate a MySQL format string into a Java pattern. Literal text is
    * single-quoted so pattern letters in the input stay literal.
    * `parse`: lenient numeric widths for STR_TO_DATE. */
  def toJavaPattern(mysqlFmt: String): String = toJavaPattern(mysqlFmt, parse = false)

  def toJavaPattern(mysqlFmt: String, parse: Boolean): String = {
    val out = new StringBuilder
    var i = 0
    def literal(s: String): Unit =
      if (s.nonEmpty) out.append("'").append(s.replace("'", "''")).append("'")
    val lit = new StringBuilder
    while (i < mysqlFmt.length) {
      val c = mysqlFmt.charAt(i)
      if (c == '%' && i + 1 < mysqlFmt.length) {
        val spec = mysqlFmt.charAt(i + 1)
        val mapped =
          if (parse) parseTable.get(spec).orElse(table.get(spec))
          else table.get(spec)
        mapped match {
          case Some(p) =>
            literal(lit.result()); lit.clear()
            if (p == "%") lit.append('%') else out.append(p)
          case None =>
            throw new IllegalArgumentException(s"unsupported MySQL format %$spec")
        }
        i += 2
      } else { lit.append(c); i += 1 }
    }
    literal(lit.result())
    out.result()
  }

  /** MySQL DATE_FORMAT(col, '%Y-%m-%d ...') as a Spark Column. */
  def dateFormat(c: Column, mysqlFmt: String): Column =
    date_format(c, toJavaPattern(mysqlFmt))

  /** MySQL STR_TO_DATE(str, '%d/%m/%Y ...') — timestamp if the pattern has
    * time parts; callers cast to date for date-only patterns. */
  def strToDate(c: Column, mysqlFmt: String): Column =
    org.apache.spark.sql.functions.to_timestamp(c,
      toJavaPattern(mysqlFmt, parse = true))

  // --- SQL-text registration -----------------------------------------
  // Overrides Spark's builtin `date_format`/`str_to_date` in the session
  // registry so SQL text written against the reference dialect
  // (`DATE_FORMAT(d, '%Y-%m')`, reference
  // sql/expression/function/dateformat.go) formats correctly instead of
  // silently treating `%Y` as Java-pattern literals. Dispatch is by
  // format shape: a foldable format string containing `%` is translated
  // through the specifier table; anything else (Java patterns, dynamic
  // formats) passes through to the builtin behavior unchanged, so
  // Spark-dialect callers are unaffected.

  import org.apache.spark.sql.catalyst.expressions.{DateFormatClass, Expression, Literal, ParseToDate, ParseToTimestamp}
  import org.apache.spark.sql.types.StringType
  import org.apache.spark.unsafe.types.UTF8String

  /** (possibly-translated format expr, original MySQL format if literal) */
  private def translated(e: Expression, parse: Boolean = false)
      : (Expression, Option[String]) =
    e match {
      case Literal(s: UTF8String, _: StringType) if s.toString.contains("%") =>
        val fmt = s.toString
        (Literal(UTF8String.fromString(toJavaPattern(fmt, parse)), StringType),
          Some(fmt))
      case other => (other, None)
    }

  /** Specifiers that carry time-of-day — STR_TO_DATE yields DATETIME iff
    * one is present, DATE otherwise (reference dateformat.go result type). */
  private val timeSpecs = Set('H', 'k', 'h', 'I', 'l', 'i', 'S', 's', 'f',
    'p', 'T', 'r')

  def dateFormatExpr(es: Seq[Expression]): Expression = {
    require(es.length == 2, "date_format(expr, format)")
    es(1) match {
      case Literal(f: UTF8String, _: StringType) if f.toString.contains("%") =>
        val fmt = f.toString
        try new DateFormatClass(es(0),
          Literal(UTF8String.fromString(toJavaPattern(fmt)), StringType))
        catch {
          case _: IllegalArgumentException =>
            // specs Java patterns can't express (%D/%x/%v/%U...) take
            // the eval-mode formatter
            MySqlDateFormatEval(org.apache.spark.sql.catalyst.expressions.Cast(
              es(0), org.apache.spark.sql.types.TimestampNTZType), fmt)
        }
      case other => new DateFormatClass(es(0), other)
    }
  }

  def strToDateExpr(es: Seq[Expression]): Expression = {
    require(es.length == 2, "str_to_date(str, format)")
    es(1) match {
      case Literal(s: UTF8String, _: StringType) =>
        MySqlStrToDate(es(0), s.toString)
      case other => new ParseToTimestamp(es(0), other)
    }
  }

  /** Eval-mode DATE_FORMAT for %-specs Java patterns can't express
    * (%D ordinal day, %x/%v ISO week-year pairs, %U/%u week numbers) —
    * reference dateformat.go via strftime. Used only when the
    * translated-pattern fast path throws; the codegen'd date_format
    * keeps serving translatable formats. */
  case class MySqlDateFormatEval(child: Expression, fmt: String)
      extends org.apache.spark.sql.catalyst.expressions.UnaryExpression
      with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {
    import org.apache.spark.sql.types._
    override def dataType: DataType = StringType
    override def nullable: Boolean = true
    private def ord(n: Int): String = {
      val suf =
        if (n % 100 >= 11 && n % 100 <= 13) "th"
        else n % 10 match {
          case 1 => "st"; case 2 => "nd"; case 3 => "rd"; case _ => "th" }
      n.toString + suf
    }
    override def nullSafeEval(v: Any): Any = {
      val ldt = (v, child.dataType) match {
        case (m: Long, TimestampType | TimestampNTZType) =>
          java.time.LocalDateTime.ofEpochSecond(
            Math.floorDiv(m, 1000000L),
            (Math.floorMod(m, 1000000L) * 1000L).toInt,
            java.time.ZoneOffset.UTC)
        case (d: Int, DateType) =>
          java.time.LocalDate.ofEpochDay(d.toLong).atStartOfDay()
        case _ => return null
      }
      val sb = new StringBuilder
      var i = 0
      while (i < fmt.length) {
        val c = fmt.charAt(i)
        if (c == '%' && i + 1 < fmt.length) {
          val sp = fmt.charAt(i + 1)
          val wf = java.time.temporal.WeekFields.ISO
          sp match {
            case 'Y' => sb.append(f"${ldt.getYear}%04d")
            case 'y' => sb.append(f"${ldt.getYear % 100}%02d")
            case 'M' => sb.append(ldt.getMonth.getDisplayName(
              java.time.format.TextStyle.FULL, java.util.Locale.US))
            case 'b' => sb.append(ldt.getMonth.getDisplayName(
              java.time.format.TextStyle.SHORT, java.util.Locale.US))
            case 'm' => sb.append(f"${ldt.getMonthValue}%02d")
            case 'c' => sb.append(ldt.getMonthValue.toString)
            case 'd' => sb.append(f"${ldt.getDayOfMonth}%02d")
            case 'e' => sb.append(ldt.getDayOfMonth.toString)
            case 'D' => sb.append(ord(ldt.getDayOfMonth))
            case 'j' => sb.append(f"${ldt.getDayOfYear}%03d")
            case 'H' => sb.append(f"${ldt.getHour}%02d")
            case 'k' => sb.append(ldt.getHour.toString)
            case 'h' | 'I' =>
              val h12 = if (ldt.getHour % 12 == 0) 12 else ldt.getHour % 12
              sb.append(f"$h12%02d")
            case 'l' =>
              sb.append((if (ldt.getHour % 12 == 0) 12
                         else ldt.getHour % 12).toString)
            case 'i' => sb.append(f"${ldt.getMinute}%02d")
            case 'S' | 's' => sb.append(f"${ldt.getSecond}%02d")
            case 'f' => sb.append(f"${ldt.getNano / 1000}%06d")
            case 'p' => sb.append(if (ldt.getHour < 12) "AM" else "PM")
            case 'W' => sb.append(ldt.getDayOfWeek.getDisplayName(
              java.time.format.TextStyle.FULL, java.util.Locale.US))
            case 'a' => sb.append(ldt.getDayOfWeek.getDisplayName(
              java.time.format.TextStyle.SHORT, java.util.Locale.US))
            case 'w' => sb.append((ldt.getDayOfWeek.getValue % 7).toString)
            case 'v' => // ISO week (mode 3), 2 digits
              sb.append(f"${ldt.get(wf.weekOfWeekBasedYear)}%02d")
            case 'x' => // ISO week-year
              sb.append(f"${ldt.get(wf.weekBasedYear)}%04d")
            case 'u' => // week 0-53, Monday first (mode 1)
              sb.append(f"${DateTimeExt.weekModeInt(ldt.toLocalDate, 1)}%02d")
            case 'U' => // week 0-53, Sunday first (mode 0)
              sb.append(f"${DateTimeExt.weekModeInt(ldt.toLocalDate, 0)}%02d")
            case 'V' => // week 1-53, Sunday first (mode 2)
              sb.append(f"${DateTimeExt.weekModeInt(ldt.toLocalDate, 2)}%02d")
            case 'X' => // week-year for %V
              sb.append(f"${DateTimeExt.weekYearInt(ldt.toLocalDate, 2)}%04d")
            case 'T' => sb.append(
              f"${ldt.getHour}%02d:${ldt.getMinute}%02d:${ldt.getSecond}%02d")
            case 'r' =>
              val h12 = if (ldt.getHour % 12 == 0) 12 else ldt.getHour % 12
              sb.append(f"$h12%02d:${ldt.getMinute}%02d:${ldt.getSecond}%02d ")
              sb.append(if (ldt.getHour < 12) "AM" else "PM")
            case '%' => sb.append('%')
            case other => sb.append(other)
          }
          i += 2
        } else { sb.append(c); i += 1 }
      }
      org.apache.spark.unsafe.types.UTF8String.fromString(sb.result())
    }
    override protected def withNewChildInternal(c: Expression) =
      copy(child = c)
  }

  /** STR_TO_DATE with the reference's parse semantics
    * (sql/expression/function/str_to_date.go): unset date fields default
    * to ZERO and the zero parts normalize Go-style (month 0 → previous
    * December, day 0 → previous month's last day — STR_TO_DATE('9','%m')
    * is 0000-08-31, a time-only parse sits on -0001-11-30), %p/%r's
    * AM/PM marker is consumed but not applied, %f digits read literally
    * as microseconds, literals match case-sensitively, numeric fields
    * skip leading spaces, and trailing input garbage is ignored. A parse
    * that sets NO field at all — or a literal mismatch — is NULL. */
  case class MySqlStrToDate(child: Expression, fmt: String)
      extends org.apache.spark.sql.catalyst.expressions.UnaryExpression
      with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {
    import org.apache.spark.sql.types._

    private val hasTime: Boolean = fmt.sliding(2).exists(p =>
      p.length == 2 && p.charAt(0) == '%' && timeSpecs(p.charAt(1)))
    override def dataType: DataType =
      if (hasTime) TimestampType else DateType
    override def nullable: Boolean = true

    private val fullMonths = Seq("january", "february", "march", "april",
      "may", "june", "july", "august", "september", "october", "november",
      "december")

    override def nullSafeEval(v: Any): Any = {
      val input = v match {
        case u: UTF8String => u.toString
        case b: Array[Byte] => new String(b, "UTF-8")
        case o => String.valueOf(o)
      }
      var pos = 0
      var y = -1; var mo = -1; var d = -1; var doy = -1
      var h = -1; var mi = -1; var se = -1; var micro = -1
      var failed = false
      var hour24 = false // %p combined with a 24-hour specifier is NULL
      def skipSpaces(): Unit =
        while (pos < input.length && input.charAt(pos).isWhitespace) pos += 1
      def num(maxDigits: Int): Int = {
        skipSpaces()
        val start = pos
        while (pos < input.length && pos - start < maxDigits &&
               input.charAt(pos).isDigit) pos += 1
        if (pos == start) { failed = true; -1 }
        else input.substring(start, pos).toInt
      }
      def word(): String = {
        skipSpaces()
        val start = pos
        while (pos < input.length && input.charAt(pos).isLetter) pos += 1
        input.substring(start, pos)
      }
      def ampm(): Unit = { // consumed, NOT applied (reference behavior)
        val save = pos
        skipSpaces()
        if (pos + 1 < input.length &&
            "ap".indexOf(Character.toLowerCase(input.charAt(pos))) >= 0 &&
            Character.toLowerCase(input.charAt(pos + 1)) == 'm') pos += 2
        else pos = save
      }
      def timeTriple(): Unit = {
        h = num(2)
        if (!failed && pos < input.length && input.charAt(pos) == ':') {
          pos += 1; mi = num(2)
          if (!failed && pos < input.length && input.charAt(pos) == ':') {
            pos += 1; se = num(2)
          }
        }
      }
      var i = 0
      while (i < fmt.length && !failed) {
        val c = fmt.charAt(i)
        if (c == '%' && i + 1 < fmt.length) {
          fmt.charAt(i + 1) match {
            case 'Y' => y = num(4)
            case 'y' =>
              val yy = num(2)
              if (!failed) y = if (yy >= 70) 1900 + yy else 2000 + yy
            case 'm' | 'c' => mo = num(2)
            case 'd' | 'e' => d = num(2)
            case 'j' => doy = num(3)
            case 'H' | 'k' => hour24 = true; h = num(2)
            case 'h' | 'I' | 'l' => h = num(2)
            case 'i' => mi = num(2)
            case 'S' | 's' => se = num(2)
            case 'f' => micro = num(6)
            case 'p' => if (hour24) failed = true else ampm()
            case 'r' => timeTriple(); ampm()
            case 'T' => hour24 = true; timeTriple()
            case 'M' | 'b' =>
              val w = word().toLowerCase
              val idx = fullMonths.indexWhere(m =>
                m == w || (w.length >= 3 && m.startsWith(w)))
              if (idx < 0) failed = true else mo = idx + 1
            case 'W' | 'a' => if (word().isEmpty) failed = true
            case '%' =>
              if (pos < input.length && input.charAt(pos) == '%') pos += 1
              else failed = true
            case _ => failed = true // unsupported specifier
          }
          i += 2
        } else {
          if (c.isWhitespace) skipSpaces()
          else {
            skipSpaces()
            // literal characters match CASE-SENSITIVELY:
            // STR_TO_DATE('A09:30:17','a%h:%i:%s') is NULL while the
            // lowercase input parses (queries.go:9865-9879)
            if (pos < input.length && input.charAt(pos) == c) pos += 1
            else failed = true
          }
          i += 1
        }
      }
      val anyField = y >= 0 || mo >= 0 || d >= 0 || doy >= 0 || h >= 0 ||
        mi >= 0 || se >= 0 || micro >= 0
      if (failed || !anyField) return null
      if (mo > 12 || d > 31 || h > 23 || mi > 59 || se > 59) return null
      val year = if (y >= 0) y else 0
      val date =
        try {
          if (doy >= 1) java.time.LocalDate.ofYearDay(year, doy)
          else java.time.LocalDate.of(year, 1, 1)
            .plusMonths(math.max(mo, 0) - 1L)
            .plusDays(math.max(d, 0) - 1L)
        } catch { case _: Exception => return null }
      if (!hasTime) date.toEpochDay.toInt
      else {
        val ldt = date.atTime(math.max(h, 0), math.max(mi, 0),
          math.max(se, 0), math.max(micro, 0) * 1000)
        ldt.toEpochSecond(java.time.ZoneOffset.UTC) * 1000000L +
          ldt.getNano / 1000L
      }
    }
    override protected def withNewChildInternal(c: Expression) = copy(c, fmt)
  }

  def register(spark: org.apache.spark.sql.SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    reg.createOrReplaceTempFunction("date_format", dateFormatExpr, "scala_udf")
    reg.createOrReplaceTempFunction("str_to_date", strToDateExpr, "scala_udf")
  }
}
