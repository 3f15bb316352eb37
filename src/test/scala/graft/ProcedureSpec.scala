package graft

import org.scalatest.funsuite.AnyFunSuite

/** Minimal stored-procedure surface (reference sql/plan/procedures.go):
  * CREATE PROCEDURE with IN parameters and a straight-line BEGIN…END
  * body, CALL with literal-argument substitution, DROP PROCEDURE.
  * Control flow / OUT params are rejected loudly at CREATE. */
class ProcedureSpec extends AnyFunSuite {
  import SparkSpec.spark

  test("CALL runs body statements; transactions are autocommit no-ops") {
    val e = new Engine(spark)
    e.query("CREATE TABLE proc_t (id INT PRIMARY KEY, name TEXT)")
    e.query("CREATE PROCEDURE my_proc()\nBEGIN\n  START TRANSACTION;\n" +
      "  INSERT INTO proc_t VALUES (1, 'test');\n  COMMIT;\nEND")
    e.query("CALL my_proc()")
    assert(e.query("SELECT * FROM proc_t").collect()
      .map(r => (r.getInt(0), r.getString(1))).toSeq == Seq((1, "test")))
    e.query("CREATE PROCEDURE empty_procedure()\nBEGIN\nEND")
    e.query("CALL empty_procedure()") // no-op, no error
  }

  test("IN parameters substitute; last SELECT is the result set") {
    val e = new Engine(spark)
    e.query("CREATE TABLE proc_u (id INT PRIMARY KEY, v INT)")
    e.query("INSERT INTO proc_u VALUES (1, 10), (2, 20), (3, 30)")
    e.query("CREATE PROCEDURE get_above(IN threshold INT) BEGIN " +
      "SELECT id, v FROM proc_u WHERE v > threshold ORDER BY id; END")
    val r = e.query("CALL get_above(15)").collect()
    assert(r.map(x => (x.getInt(0), x.getInt(1))).toSeq ==
      Seq((2, 20), (3, 30)))
    val bad = intercept[Exception] { e.query("CALL get_above()") }
    assert(bad.getMessage.contains("number of arguments"), bad.getMessage)
  }

  test("DROP PROCEDURE; duplicates and unsupported bodies error") {
    val e = new Engine(spark)
    e.query("CREATE PROCEDURE p1() BEGIN END")
    val dup = intercept[Exception] {
      e.query("CREATE PROCEDURE p1() BEGIN END") }
    assert(dup.getMessage.contains("already exists"))
    e.query("DROP PROCEDURE p1")
    intercept[Exception] { e.query("CALL p1()") }
    intercept[Exception] { e.query("DROP PROCEDURE p1") }
    e.query("DROP PROCEDURE IF EXISTS p1") // no error
    val cf = intercept[Exception] {
      e.query("CREATE PROCEDURE p2() BEGIN DECLARE x INT; END") }
    assert(cf.getMessage.contains("unsupported procedure body"))
    val outp = intercept[Exception] {
      e.query("CREATE PROCEDURE p3(OUT x INT) BEGIN END") }
    assert(outp.getMessage.contains("IN only"))
  }
}
