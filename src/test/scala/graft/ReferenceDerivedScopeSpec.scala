package graft

import org.scalatest.funsuite.AnyFunSuite

/** Outer-scope visibility for derived tables inside subquery
  * expressions, ported from the reference's
  * enginetest/queries/derived_table_outer_scope_visibility_queries.go:
  * a derived table nested in a subquery expression can reference the
  * enclosing query's tables (MySQL 8 semantics). Spark's subquery
  * decorrelation handles the shapes below; unsupported shapes are pinned
  * with a comment where they diverge.
  */
class ReferenceDerivedScopeSpec extends AnyFunSuite {
  import SparkSpec.spark
  import spark.implicits._

  private lazy val engine: Engine = {
    Seq((1, 1, 1, 100, 100), (2, 2, 2, 200, 200))
      .toDF("a", "b", "c", "d", "e").createOrReplaceTempView("ds_t1")
    Seq((2, 2, 2, 2, 2))
      .toDF("a", "b", "c", "d", "e").createOrReplaceTempView("ds_t2")
    Seq(1, 1, 2, 3, 3, 3, 4, 5, 6, 6, 6)
      .toDF("val").createOrReplaceTempView("ds_numbers")
    new Engine(spark)
  }

  private def norm(v: Any): Any = v match {
    case null => null
    case b: Byte => BigDecimal(b.toInt)
    case s: Short => BigDecimal(s.toInt)
    case i: Int => BigDecimal(i)
    case l: Long => BigDecimal(l)
    case d: Double => BigDecimal(d)
    case d: java.math.BigDecimal => BigDecimal(d)
    case other => other
  }

  private def check(sql: String, expected: Seq[Seq[Any]]): Unit = {
    val got = engine.query(sql).collect()
      .map(r => (0 until r.length).map(i => norm(r.get(i))).toSeq).toSeq
      .sortBy(GoNorm.sortKeyRow)
    val want = expected.map(_.map(norm)).sortBy(GoNorm.sortKeyRow)
    assert(got == want, s"\nquery: $sql\ngot:  $got\nwant: $want")
  }

  test("subquery-nested derived tables see outer tables " +
      "(derived_table_outer_scope_visibility_queries.go:40-100)") {
    check(
      "SELECT * FROM ds_t1 WHERE ds_t1.d > (SELECT dt.a FROM (SELECT ds_t2.a AS a FROM ds_t2 WHERE ds_t2.b = ds_t1.b) dt)",
      Seq(Seq(2, 2, 2, 200, 200)))
    check(
      "SELECT * FROM ds_t1 HAVING ds_t1.d > (SELECT dt.a FROM (SELECT ds_t2.a AS a FROM ds_t2 WHERE ds_t2.b = ds_t1.b) dt)",
      Seq(Seq(2, 2, 2, 200, 200)))
    check(
      "SELECT (SELECT dt.z FROM (SELECT ds_t2.a AS z FROM ds_t2 WHERE ds_t2.b = ds_t1.b) dt) AS v FROM ds_t1",
      Seq(Seq(null), Seq(2)))
    check(
      "SELECT (SELECT max(dt.z) FROM (SELECT ds_t2.a AS z FROM ds_t2 WHERE ds_t2.b = ds_t1.b) dt) AS v FROM ds_t1",
      Seq(Seq(null), Seq(2)))
    check(
      "SELECT ds_t1.*, (SELECT max(dt.a) FROM (SELECT ds_t2.a AS a FROM ds_t2 WHERE ds_t2.b = ds_t1.b) dt) AS m FROM ds_t1",
      Seq(Seq(1, 1, 1, 100, 100, null), Seq(2, 2, 2, 200, 200, 2)))
    check(
      "SELECT ds_t1.a, ds_t1.b, (SELECT max(dt.a) FROM (SELECT ds_t2.a AS a FROM ds_t2 WHERE ds_t2.b = ds_t1.b) dt) AS m FROM ds_t1 GROUP BY 1, 2, 3",
      Seq(Seq(1, 1, null), Seq(2, 2, 2)))
  }
}
