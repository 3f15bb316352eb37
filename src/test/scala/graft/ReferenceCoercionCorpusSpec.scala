package graft

import org.scalatest.funsuite.AnyFunSuite

/** Portable subset of the reference's enginetest/queries/
  * collation_coercion.go: COERCIBILITY(expr) follows MySQL's syntactic
  * taxonomy — 0 explicit COLLATE, 2 column value / binary CONVERT,
  * 3 system constant, 4 string literal, 5 numeric/temporal, 6 NULL.
  * The resulting-collation assertions are partially portable: this
  * engine stores UTF-8 strings with Spark collations, so collation
  * NAMES diverge from MySQL's catalog (documented in §7.4); the
  * coercion LEVELS are the portable contract.
  */
class ReferenceCoercionCorpusSpec extends AnyFunSuite {
  import SparkSpec.spark

  private lazy val engine = new Engine(spark)

  private def co(expr: String): Int =
    engine.query(s"SELECT COERCIBILITY($expr) AS c").collect()(0).getInt(0)

  test("COERCIBILITY levels match the reference corpus rows") {
    // string literals coerce at 4
    assert(co("'26:27:28'") == 4)
    assert(co("'str'") == 4)
    // explicit COLLATE is 0
    assert(co("'str' COLLATE utf8mb4_bin") == 0)
    // numeric / boolean literals are 5
    assert(co("1001") == 5)
    assert(co("2002.5") == 5)
    assert(co("TRUE") == 5)
    assert(co("FALSE") == 5)
    // CONVERT to temporal / numeric is 5
    assert(co("CONVERT('2020-02-20 20:20:20', DATETIME)") == 5)
    assert(co("CONVERT('2020-02-20', DATE)") == 5)
    assert(co("CONVERT('34', SIGNED)") == 5)
    // CONVERT to BINARY / CHAR carries a value coercion of 2
    assert(co("CONVERT('34', BINARY)") == 2)
    // temporal functions are 5
    assert(co("CURDATE()") == 5)
    // system constants are 3
    assert(co("CURRENT_USER()") == 3)
    // NULL is 6
    assert(co("NULL") == 6)
  }

  test("COERCIBILITY of column values is 2 (temp_tbl setup shape)") {
    engine.runScript(
      """drop table if exists coz;
        |CREATE TABLE coz (v1 VARCHAR(200), v8 VARBINARY(200));
        |INSERT INTO coz VALUES ('a', 'h');
        |""".stripMargin)
    assert(engine.query("SELECT COERCIBILITY(v1) c FROM coz")
      .collect()(0).getInt(0) == 2)
    assert(engine.query("SELECT COERCIBILITY(v8) c FROM coz")
      .collect()(0).getInt(0) == 2)
    engine.query("drop table coz")
  }
}
