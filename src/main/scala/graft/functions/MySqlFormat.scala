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

  /** Translate a MySQL format string into a Java pattern. Literal text is
    * single-quoted so pattern letters in the input stay literal. */
  def toJavaPattern(mysqlFmt: String): String = {
    val out = new StringBuilder
    var i = 0
    def literal(s: String): Unit =
      if (s.nonEmpty) out.append("'").append(s.replace("'", "''")).append("'")
    val lit = new StringBuilder
    while (i < mysqlFmt.length) {
      val c = mysqlFmt.charAt(i)
      if (c == '%' && i + 1 < mysqlFmt.length) {
        val spec = mysqlFmt.charAt(i + 1)
        table.get(spec) match {
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
    org.apache.spark.sql.functions.to_timestamp(c, toJavaPattern(mysqlFmt))
}
