package graft

import org.scalatest.funsuite.AnyFunSuite

/** Table-function resolution/alias/scope corpus ported from the
  * reference's enginetest/queries/table_func_scripts.go (253 LoC),
  * using the same fixtures (sequence_table, simple_table_function,
  * table_func, lookup/point variants — plans/TableFuncSql).
  * The reference's ExpectedIndexes / JoinTypes planner assertions and
  * the stored-procedure block are non-portable and documented there.
  */
class ReferenceTableFuncCorpusSpec extends AnyFunSuite {
  import SparkSpec.spark

  private lazy val engine = new Engine(spark)

  private def rows(sql: String): Seq[Seq[Any]] =
    engine.query(sql).collect()
      .map(r => (0 until r.length).map(r.get).toSeq).toSeq

  test("basic table function: star, projection, aggregate, grouping, " +
      "nested args, filters, subquery wrap") {
    assert(rows("SELECT * from simple_table_function(123)") ==
      Seq(Seq("foo", 123)))
    // case-insensitive name
    assert(rows("SELECT * from simple_TABLE_function(123)") ==
      Seq(Seq("foo", 123)))
    assert(rows("SELECT count(*) c from simple_TABLE_function(123)") ==
      Seq(Seq(1L)))
    assert(rows("SELECT one from simple_TABLE_function(123)") ==
      Seq(Seq("foo")))
    assert(rows(
      "SELECT * from simple_TABLE_function(concat('f', 'o', 'o'))") ==
      Seq(Seq("foo", 123)))
    assert(rows(
      "SELECT * from simple_TABLE_function(123) where one='foo'") ==
      Seq(Seq("foo", 123)))
    assert(rows(
      "SELECT * from simple_TABLE_function(123) where one='none'") ==
      Seq.empty)
    assert(rows(
      "SELECT count(one) c from simple_TABLE_function(123) group by one") ==
      Seq(Seq(1L)))
    assert(rows(
      "SELECT * from (select * from simple_TABLE_function(123)) as tf") ==
      Seq(Seq("foo", 123)))
  }

  test("sequence_table emits 0..n-1; bare name is the default alias") {
    assert(rows("select * from sequence_table('x', 5)") ==
      Seq(Seq(0), Seq(1), Seq(2), Seq(3), Seq(4)))
    assert(rows("select sequence_table.x from sequence_table('x', 5)") ==
      Seq(Seq(0), Seq(1), Seq(2), Seq(3), Seq(4)))
    assert(rows("select * from sequence_table('x', 2) where x is not null") ==
      Seq(Seq(0), Seq(1)))
    assert(rows("select seq.x from sequence_table('x', 5) as seq") ==
      Seq(Seq(0), Seq(1), Seq(2), Seq(3), Seq(4)))
    assert(rows("select seq.x from sequence_table('x', 5) seq") ==
      Seq(Seq(0), Seq(1), Seq(2), Seq(3), Seq(4)))
  }

  test("table functions join with tables, subqueries, CTEs, EXISTS, " +
      "and laterally with a correlated count") {
    engine.runScript(
      """drop table if exists tfxy;
        |create table tfxy (x int primary key, y int);
        |insert into tfxy values (0,1), (1,2), (2,3);
        |""".stripMargin)
    assert(rows(
      "select y from table_func('z',2) join tfxy t on y = z") ==
      Seq(Seq(2)))
    assert(rows("select * from sequence_table('y',2) seq1 where y in " +
      "(select SEQ2.x from table_func('x', 1) seq2)") == Seq(Seq(1)))
    assert(rows("select x from sequence_table('x', 5) where exists " +
      "(select y from sequence_table('y', 3) where x = y)") ==
      Seq(Seq(0), Seq(1), Seq(2)))
    // correlated lateral: the count argument references the outer row
    assert(rows("select * from sequence_table('x', 3) l join lateral " +
      "(select * from sequence_table('y', l.x)) r " +
      "order by l.x, r.y") ==
      Seq(Seq(1, 0), Seq(2, 0), Seq(2, 1)))
    assert(rows("select * from sequence_table('x', 3) l where exists " +
      "(select * from sequence_table('y', l.x))") ==
      Seq(Seq(1), Seq(2)))
    assert(rows("with cte as (select seq.x from sequence_table('x', 5) " +
      "seq) select cte.x from cte") ==
      Seq(Seq(0), Seq(1), Seq(2), Seq(3), Seq(4)))
    assert(rows("select sq.x from (select seq.x from " +
      "sequence_table('x', 5) seq) sq") ==
      Seq(Seq(0), Seq(1), Seq(2), Seq(3), Seq(4)))
    assert(rows("select sq.xx from (select seq.x as xx from " +
      "sequence_table('x', 5) seq) sq") ==
      Seq(Seq(0), Seq(1), Seq(2), Seq(3), Seq(4)))
    engine.query("drop table tfxy")
  }

  test("lookup / point variants behave identically row-wise " +
      "(index-shape assertions are reference-harness diagnostics)") {
    assert(rows("select seq.x from point_lookup_table('x', 5) seq") ==
      Seq(Seq(0), Seq(1), Seq(2), Seq(3), Seq(4)))
    assert(rows("select * from lookup_sequence_table('x', 5) where x = 2") ==
      Seq(Seq(2)))
    assert(rows("select * from lookup_sequence_table('x', 5) " +
      "where x >= 1 and x <= 3") == Seq(Seq(1), Seq(2), Seq(3)))
    assert(rows("select * from point_lookup_table('x', 5) where x = 2") ==
      Seq(Seq(2)))
    assert(rows("select seq1.x, seq2.y from lookup_sequence_table('x', 5) " +
      "seq1 join lookup_sequence_table('y', 5) seq2 on seq1.x = seq2.y " +
      "order by seq1.x") ==
      Seq(Seq(0, 0), Seq(1, 1), Seq(2, 2), Seq(3, 3), Seq(4, 4)))
  }

  test("resolution errors: unknown function, unknown columns, alias " +
      "replaces the bare name, duplicate default alias is 1066") {
    assert(intercept[IllegalArgumentException] {
      engine.query("SELECT * from does_not_exist('q', 123)").collect()
    }.getMessage.contains("table function not found"))
    assert(intercept[Exception] {
      engine.query("SELECT none from simple_TABLE_function(123)").collect()
    }.getMessage.toLowerCase.contains("none"))
    assert(intercept[Exception] {
      engine.query("SELECT stf.none from simple_TABLE_function(123) as stf")
        .collect()
    }.getMessage.toLowerCase.contains("none"))
    // the alias REPLACES the function name as the table qualifier
    assert(intercept[Exception] {
      engine.query("SELECT simple_table_function.none from " +
        "simple_TABLE_function(123) stf").collect()
    }.getMessage.toLowerCase.contains("simple_table_function"))
    assert(intercept[Exception] {
      engine.query("select not_seq.x from sequence_table('x', 5) as seq")
        .collect()
    }.getMessage.toLowerCase.contains("not_seq"))
    assert(intercept[Exception] {
      engine.query("select seq.x from (select seq.x from " +
        "sequence_table('x', 5) seq) sq").collect()
    }.getMessage.toLowerCase.contains("seq"))
    // two un-aliased uses of the same function: MySQL 1066
    assert(intercept[IllegalArgumentException] {
      engine.query("select * from sequence_table('x', 5) join " +
        "sequence_table('y', 5) on x = y").collect()
    }.getMessage.contains("1066"))
  }
  test("fixture names in scalar positions or string literals are not " +
      "rewritten; FROM-list commas still are") {
    // SELECT-list comma: not a table position — the name resolves (and
    // fails) as a scalar function, never as mangled derived-table text
    val e1 = intercept[Exception] {
      engine.query("SELECT 1, sequence_table('x', 2)").collect()
    }.getMessage.toLowerCase
    assert(e1.contains("sequence_table"))
    assert(!e1.contains("explode"), s"rewrite leaked into scalar position: $e1")
    // string literal carrying a call-shaped fixture name: untouched
    assert(rows("SELECT ' from sequence_table(1, 2) ' AS s") ==
      Seq(Seq(" from sequence_table(1, 2) ")))
    assert(rows("SELECT 'a, sequence_table(1, 2)' AS s") ==
      Seq(Seq("a, sequence_table(1, 2)")))
    // comma continuing a FROM list: still a table position
    assert(rows("SELECT t.a, s.x FROM (SELECT 7 AS a) t, " +
      "sequence_table('x', 2) s ORDER BY s.x") ==
      Seq(Seq(7, 0), Seq(7, 1)))
  }

}
