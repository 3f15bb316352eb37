package graft.plans

import org.apache.spark.sql.{DataFrame, SparkSession}

/** SQL-text `WITH RECURSIVE` support — SURVEY.md §2.9 (reference parses
  * recursive CTEs in sql/planbuilder/cte.go:87 and executes them as a
  * working-table loop in sql/plan/recursive_cte.go).
  *
  * Spark's parser has no recursive CTEs, so the dialect layer intercepts
  * the statement shape
  *
  *   WITH RECURSIVE name [(col, ...)] AS ( term UNION [ALL] term ... ) outer
  *
  * splits the body into anchor terms (no self-reference) and recursive
  * terms (self-referencing), and drives [[RecursiveCte]]'s semi-naive
  * iteration: each step re-binds `name` as a temp view over the previous
  * delta and re-plans the recursive terms. UNION => distinct semantics,
  * UNION ALL => bag semantics (any plain UNION separator makes the whole
  * CTE distinct, matching MySQL). The parse is literal- and paren-aware;
  * statements that don't match the shape return None and flow to Spark
  * unchanged.
  */
object RecursiveSql {

  private val Head =
    """(?is)^\s*WITH\s+RECURSIVE\s+([A-Za-z_][A-Za-z0-9_]*)\s*(?:\(([^)]*)\))?\s+AS\s*\(""".r

  /** MySQL @@cte_max_recursion_depth default. */
  private val MaxDepth = 1000

  /** index just past a quoted literal starting at `i` (s(i) is the quote). */
  private def skipQuoted(s: String, i0: Int): Int = {
    val q = s.charAt(i0)
    var i = i0 + 1
    while (i < s.length) {
      if (s.charAt(i) == q) {
        if (i + 1 < s.length && s.charAt(i + 1) == q) i += 2 // doubled quote
        else return i + 1
      } else i += 1
    }
    s.length
  }

  /** Split `body` on top-level UNION [ALL|DISTINCT]; returns the terms and
    * whether every separator was UNION ALL. */
  private def splitUnions(body: String): (Seq[String], Boolean) = {
    val terms = Seq.newBuilder[String]
    var allBag = true
    var depth = 0
    var start = 0
    var i = 0
    val U = "union"
    while (i < body.length) {
      body.charAt(i) match {
        case '(' => depth += 1; i += 1
        case ')' => depth -= 1; i += 1
        case '\'' | '"' | '`' => i = skipQuoted(body, i)
        case c if depth == 0 && (c == 'u' || c == 'U') &&
            i + U.length <= body.length &&
            body.regionMatches(true, i, "UNION", 0, 5) &&
            (i == 0 || !Character.isLetterOrDigit(body.charAt(i - 1))) &&
            (i + 5 == body.length || !Character.isLetterOrDigit(body.charAt(i + 5))) =>
          terms += body.substring(start, i)
          i += 5
          val rest = body.substring(i)
          val mAll = """(?is)^\s+ALL\b""".r.findFirstMatchIn(rest)
          val mDis = """(?is)^\s+DISTINCT\b""".r.findFirstMatchIn(rest)
          if (mAll.isDefined) i += mAll.get.end
          else { allBag = false; if (mDis.isDefined) i += mDis.get.end }
          start = i
        case _ => i += 1
      }
    }
    terms += body.substring(start)
    (terms.result().map(_.trim).filter(_.nonEmpty), allBag)
  }

  /** Try to run `sql` as a recursive CTE; None when the shape doesn't match. */
  def run(spark: SparkSession, sql: String): Option[DataFrame] =
    Head.findFirstMatchIn(sql).flatMap { m =>
      val name = m.group(1)
      val cols = Option(m.group(2)).map(_.split(",").map(_.trim).toSeq)
      // matching close paren of AS (
      var depth = 1
      var i = m.end
      while (i < sql.length && depth > 0) {
        sql.charAt(i) match {
          case '(' => depth += 1; i += 1
          case ')' => depth -= 1; i += 1
          case '\'' | '"' | '`' => i = skipQuoted(sql, i)
          case _ => i += 1
        }
      }
      if (depth != 0) return None
      val body = sql.substring(m.end, i - 1)
      val outer = sql.substring(i).trim
      if (outer.isEmpty) return None

      val (terms, allBag) = splitUnions(body)
      val selfRef = ("(?i)\\b" + java.util.regex.Pattern.quote(name) + "\\b").r
      val (recTerms, anchorTerms) =
        terms.partition(t => selfRef.findFirstIn(t).isDefined)
      if (anchorTerms.isEmpty) return None

      val seedSql = anchorTerms.map(t => s"($t)").mkString(" UNION ALL ")
      var seed = spark.sql(seedSql)
      cols.foreach(cs => seed = seed.toDF(cs: _*))

      // recursive-term outputs keep the working table's column names
      // (Spark auto-names unaliased expressions like `(k + 5)`)
      val colNames = seed.columns.toSeq
      val step = (delta: DataFrame) => {
        delta.createOrReplaceTempView(name)
        recTerms.map(t => spark.sql(t).toDF(colNames: _*)).reduce(_ unionAll _)
      }
      val acc =
        if (recTerms.isEmpty) seed
        else if (allBag) RecursiveCte.unionAll(seed, step, MaxDepth)
        else RecursiveCte.unionDistinct(seed, step, MaxDepth)

      acc.createOrReplaceTempView(name)
      val result = spark.sql(outer) // analysis is eager; safe to drop after
      spark.catalog.dropTempView(name)
      Some(result)
    }
}
