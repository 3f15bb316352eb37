package graft

import org.scalatest.funsuite.AnyFunSuite

/** SQL-text JSON_TABLE Query/Expected pairs ported verbatim from the
  * reference corpus (enginetest/queries/json_table_queries.go) — the
  * table-function front door (plans/JsonTableSql): literal and
  * column-sourced documents, implicit lateral correlation against
  * preceding FROM items, joins/unions/subqueries/CTEs over JSON_TABLE,
  * and empty/NULL document edge cases.
  */
class ReferenceJsonTableCorpusSpec extends AnyFunSuite {
  import SparkSpec.spark
  import spark.implicits._

  private lazy val engine: Engine = {
    Seq(
      (0, 0, 1, 2, 3, 4), (1, 10, 11, 12, 13, 14),
      (2, 20, 21, 22, 23, 24), (3, 30, 31, 32, 33, 34))
      .toDF("pk", "c1", "c2", "c3", "c4", "c5")
      .createOrReplaceTempView("one_pk")
    Seq(1, 2, 3).toDF("i").createOrReplaceTempView("p")
    Seq(
      ("orgA", """["bob", "john"]"""), ("orgB", """["alice", "mary"]"""),
      ("orgC", """["kevin", "john"]"""), ("orgD", """["alice", "alice"]"""))
      .toDF("organization", "members").createOrReplaceTempView("organizations")
    Seq((1, """["test"]""")).toDF("i", "j").createOrReplaceTempView("tj")
    new Engine(spark)
  }

  private def norm(v: Any): Any = v match {
    case null => null
    case b: Byte => BigDecimal(b.toInt)
    case s: Short => BigDecimal(s.toInt)
    case i: Int => BigDecimal(i)
    case l: Long => BigDecimal(l)
    case f: Float => BigDecimal(f.toDouble)
    case d: Double => BigDecimal(d)
    case d: java.math.BigDecimal => BigDecimal(d)
    case other => other
  }

  private def check(sql: String, expected: Seq[Seq[Any]]): Unit = {
    val got = engine.query(sql).collect()
      .map(r => (0 until r.length).map(i => norm(r.get(i))).toSeq).toSeq
    val want = expected.map(_.map(norm))
    val ordered = sql.toLowerCase.contains("order by")
    val (g, w) =
      if (ordered) (got, want)
      else (got.sortBy(GoNorm.sortKeyRow), want.sortBy(GoNorm.sortKeyRow))
    assert(g == w, s"\nquery: $sql\ngot:  $g\nwant: $w")
  }

  test("literal documents and edge cases (json_table_queries.go:24-62,143)") {
    check("SELECT * FROM JSON_TABLE(NULL,'$[*]' COLUMNS(x int path '$.a')) as t", Seq.empty)
    check("SELECT * FROM JSON_TABLE('{}','$[*]' COLUMNS(x int path '$.a')) as t", Seq.empty)
    check("""SELECT * FROM JSON_TABLE('{"a":1}','$.b' COLUMNS(x varchar(100) path '$.a')) as tt""", Seq.empty)
    check("""SELECT * FROM JSON_TABLE('[{"a":1},{"a":2}]','$[*]' COLUMNS(x varchar(100) path '$.a')) as tt""",
      Seq(Seq("1"), Seq("2")))
    check("""SELECT * FROM JSON_TABLE('[{"a":1, "b":2},{"a":3, "b":4}]',"$[*]" COLUMNS(x int path '$.a', y int path '$.b')) as tt""",
      Seq(Seq(1, 2), Seq(3, 4)))
    check("""SELECT * FROM JSON_TABLE('[{"a":1.5, "b":2.25},{"a":3.125, "b":4.0625}]','$[*]' COLUMNS(x float path '$.a', y float path '$.b')) as tt""",
      Seq(Seq(1.5, 2.25), Seq(3.125, 4.0625)))
    check("""SELECT * FROM JSON_TABLE(concat('[{},','{}]'),'$[*]' COLUMNS(x varchar(100) path '$.a',y varchar(100) path '$.b')) as t""",
      Seq(Seq(null, null), Seq(null, null)))
    check("""select * from json_table('["foo", "bar"]', "$[*]" columns(tag text path '$')) as tags where tag like 'foo'""",
      Seq(Seq("foo")))
  }

  test("joins over JSON_TABLE (json_table_queries.go:64-98)") {
    check("""select * from JSON_TABLE('[{"a":1},{"a":2}]', '$[*]' COLUMNS(x int path '$.a')) as t1 join JSON_TABLE('[{"a":1},{"a":2}]', '$[*]' COLUMNS(x int path '$.a')) as t2""",
      Seq(Seq(1, 1), Seq(1, 2), Seq(2, 1), Seq(2, 2)))
    check("""select * from JSON_TABLE('[{"a":1},{"a":2}]', '$[*]' COLUMNS(x int path '$.a')) as t1 join one_pk order by x, pk""",
      Seq(
        Seq(1, 0, 0, 1, 2, 3, 4), Seq(1, 1, 10, 11, 12, 13, 14),
        Seq(1, 2, 20, 21, 22, 23, 24), Seq(1, 3, 30, 31, 32, 33, 34),
        Seq(2, 0, 0, 1, 2, 3, 4), Seq(2, 1, 10, 11, 12, 13, 14),
        Seq(2, 2, 20, 21, 22, 23, 24), Seq(2, 3, 30, 31, 32, 33, 34)))
    check("""select * from one_pk join JSON_TABLE('[{"a":1},{"a":2}]', '$[*]' COLUMNS(x int path '$.a')) as t1 order by x, pk""",
      Seq(
        Seq(0, 0, 1, 2, 3, 4, 1), Seq(1, 10, 11, 12, 13, 14, 1),
        Seq(2, 20, 21, 22, 23, 24, 1), Seq(3, 30, 31, 32, 33, 34, 1),
        Seq(0, 0, 1, 2, 3, 4, 2), Seq(1, 10, 11, 12, 13, 14, 2),
        Seq(2, 20, 21, 22, 23, 24, 2), Seq(3, 30, 31, 32, 33, 34, 2)))
  }

  test("union / IN-subquery / CTE over JSON_TABLE (json_table_queries.go:99-141)") {
    check("""select * from JSON_TABLE('[{"a":1},{"a":2}]', '$[*]' COLUMNS(x int path '$.a')) as t1 union select * from JSON_TABLE('[{"b":3},{"b":4}]', '$[*]' COLUMNS(y int path '$.b')) as t2""",
      Seq(Seq(1), Seq(2), Seq(3), Seq(4)))
    check("""select * from one_pk where pk in (select x from JSON_TABLE('[{"a":1},{"a":2}]', '$[*]' COLUMNS(x int path '$.a')) as t)""",
      Seq(Seq(1, 10, 11, 12, 13, 14), Seq(2, 20, 21, 22, 23, 24)))
    check("""select * from JSON_TABLE('[{"a":1},{"a":2}]', '$[*]' COLUMNS(x int path '$.a')) t1 where x in (select y from JSON_TABLE('[{"b":1},{"b":100}]', '$[*]' COLUMNS(y int path '$.b')) as t2)""",
      Seq(Seq(1)))
    check("""with c as (select jt.a from json_table('[{"a":1,"b":2,"c":3},{"a":4,"b":5,"c":6},{"a":7,"b":8,"c":9}]', '$[*]' columns (a int path '$.a')) as jt) select * from c""",
      Seq(Seq(1), Seq(4), Seq(7)))
  }

  test("lateral correlation against preceding tables (json_table_queries.go:161-274)") {
    check("select names from organizations, JSON_TABLE(members, '$[*]' columns (names varchar(100) path '$')) as jt",
      Seq(Seq("bob"), Seq("john"), Seq("alice"), Seq("mary"),
        Seq("kevin"), Seq("john"), Seq("alice"), Seq("alice")))
    check("SELECT names, COUNT(names) AS count FROM organizations, JSON_TABLE(members, '$[*]' COLUMNS (names varchar(100) path '$')) AS jt GROUP BY names ORDER BY names asc",
      Seq(Seq("alice", 3L), Seq("bob", 1L), Seq("john", 2L),
        Seq("kevin", 1L), Seq("mary", 1L)))
    check("select names from organizations o, JSON_TABLE(o.members, '$[*]' columns (names varchar(100) path '$')) as jt",
      Seq(Seq("bob"), Seq("john"), Seq("alice"), Seq("mary"),
        Seq("kevin"), Seq("john"), Seq("alice"), Seq("alice")))
    check("select o.organization, jt.names from organizations o CROSS JOIN JSON_TABLE(o.members, '$[*]' columns (names varchar(100) path '$')) as jt",
      Seq(Seq("orgA", "bob"), Seq("orgA", "john"), Seq("orgB", "alice"),
        Seq("orgB", "mary"), Seq("orgC", "kevin"), Seq("orgC", "john"),
        Seq("orgD", "alice"), Seq("orgD", "alice")))
    check("select o.organization, jt.names from organizations o NATURAL JOIN JSON_TABLE(o.members, '$[*]' columns (names varchar(100) path '$')) as jt",
      Seq(Seq("orgA", "bob"), Seq("orgA", "john"), Seq("orgB", "alice"),
        Seq("orgB", "mary"), Seq("orgC", "kevin"), Seq("orgC", "john"),
        Seq("orgD", "alice"), Seq("orgD", "alice")))
  }

  test("outer joins over JSON_TABLE (json_table_queries.go:281-305)") {
    check("""select (select jt.i from p inner join JSON_TABLE('[1,2,3]', '$[*]' columns (i int path '$')) as jt where p.i >= jt.i LIMIT 1)""",
      Seq(Seq(1)))
    check("""select * from p left join JSON_TABLE('[1,2,3]', '$[*]' columns (i int path '$')) as jt on p.i > jt.i""",
      Seq(Seq(1, null), Seq(2, 1), Seq(3, 1), Seq(3, 2)))
    check("""select * from p right join JSON_TABLE('[1,2,3]', '$[*]' columns (i int path '$')) as jt on p.i > jt.i""",
      Seq(Seq(2, 1), Seq(3, 1), Seq(3, 2), Seq(null, 3)))
  }

  test("JSON_TABLE in scalar subqueries referencing parent data (json_table_queries.go:314-326)") {
    check("select i, (select names from JSON_Table(tj.j, '$[*]' columns (names varchar(100) path '$')) jt) from tj",
      Seq(Seq(1, "test")))
    check("""select (select jt.a from tj, json_table('["abc"]', '$[*]' columns (a varchar(10) path '$')) as jt)""",
      Seq(Seq("abc")))
    check("select (select a from tj, json_table(tj.j, '$[*]' columns (a varchar(10) path '$')) as jt)",
      Seq(Seq("test")))
  }
}
