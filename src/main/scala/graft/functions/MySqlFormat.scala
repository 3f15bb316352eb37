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
    new DateFormatClass(es(0), translated(es(1))._1)
  }

  def strToDateExpr(es: Seq[Expression]): Expression = {
    require(es.length == 2, "str_to_date(str, format)")
    val (fmt, orig) = translated(es(1), parse = true)
    val hasTime = orig.exists(_.sliding(2).exists(p =>
      p.length == 2 && p.charAt(0) == '%' && timeSpecs(p.charAt(1))))
    if (orig.isDefined && !hasTime) new ParseToDate(es(0), fmt)
    else new ParseToTimestamp(es(0), fmt)
  }

  def register(spark: org.apache.spark.sql.SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    reg.createOrReplaceTempFunction("date_format", dateFormatExpr, "scala_udf")
    reg.createOrReplaceTempFunction("str_to_date", strToDateExpr, "scala_udf")
  }
}
