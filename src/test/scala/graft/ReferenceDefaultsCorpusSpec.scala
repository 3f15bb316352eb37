package graft

import org.scalatest.funsuite.AnyFunSuite

/** Column-DEFAULT ScriptTests ported verbatim from the reference corpus
  * (enginetest/queries/column_default_queries.go): expression defaults
  * with back/forward references between columns, type conversion of the
  * default value, REPLACE re-applying defaults, ADD/MODIFY COLUMN with
  * positioned expression defaults evaluated over existing rows, and
  * declaration-time validation (parens required around column refs,
  * incompatible literals rejected).
  */
class ReferenceDefaultsCorpusSpec extends AnyFunSuite {
  import SparkSpec.spark

  private def freshEngine = new Engine(spark)

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

  private def check(e: Engine, sql: String, expected: Seq[Seq[Any]]): Unit = {
    val got = e.query(sql).collect()
      .map(r => (0 until r.length).map(i => norm(r.get(i))).toSeq).toSeq
    val want = expected.map(_.map(norm))
    val ordered = sql.toLowerCase.contains("order by")
    val (g, w) =
      if (ordered) (got, want)
      else (got.sortBy(GoNorm.sortKeyRow), want.sortBy(GoNorm.sortKeyRow))
    assert(g == w, s"\nquery: $sql\ngot:  $g\nwant: $w")
  }

  test("default expression converts to column type (column_default_queries.go t3, t4, t9)") {
    val e = freshEngine
    e.runScript(
      """CREATE TABLE t3(pk BIGINT PRIMARY KEY, v1 VARCHAR(20) DEFAULT (GREATEST(pk, 2)));
        |INSERT INTO t3 (pk) VALUES (1), (2), (3);""".stripMargin)
    check(e, "SELECT * FROM t3", Seq(Seq(1L, "2"), Seq(2L, "2"), Seq(3L, "3")))
    e.runScript(
      """CREATE TABLE t4(pk BIGINT PRIMARY KEY, v1 BIGINT DEFAULT '4');
        |INSERT INTO t4 (pk) VALUES (1), (2);""".stripMargin)
    check(e, "SELECT * FROM t4", Seq(Seq(1L, 4L), Seq(2L, 4L)))
    e.runScript(
      """CREATE TABLE t9(pk BIGINT PRIMARY KEY, v1 LONGTEXT DEFAULT (77));
        |INSERT INTO t9 (pk) VALUES (1), (2);""".stripMargin)
    check(e, "SELECT * FROM t9", Seq(Seq(1L, "77"), Seq(2L, "77")))
    e.runScript("drop table t3; drop table t4; drop table t9")
  }

  test("back/forward references between defaults (column_default_queries.go t5-t8)") {
    val e = freshEngine
    e.runScript(
      """CREATE TABLE t5(pk BIGINT PRIMARY KEY, v1 BIGINT DEFAULT (v2), v2 BIGINT DEFAULT 7);
        |INSERT INTO t5 (pk) VALUES (1), (2);""".stripMargin)
    check(e, "SELECT * FROM t5", Seq(Seq(1L, 7L, 7L), Seq(2L, 7L, 7L)))
    e.runScript(
      """CREATE TABLE t6(pk BIGINT PRIMARY KEY, v1 BIGINT DEFAULT 9, v2 BIGINT DEFAULT (v1));
        |INSERT INTO t6 (pk) VALUES (1), (2);""".stripMargin)
    check(e, "SELECT * FROM t6", Seq(Seq(1L, 9L, 9L), Seq(2L, 9L, 9L)))
    e.runScript(
      """CREATE TABLE t7(pk BIGINT PRIMARY KEY, v1 BIGINT DEFAULT (8), v2 BIGINT DEFAULT (v1));
        |INSERT INTO t7 (pk) VALUES (1), (2);""".stripMargin)
    check(e, "SELECT * FROM t7", Seq(Seq(1L, 8L, 8L), Seq(2L, 8L, 8L)))
    // back reference to a SUPPLIED value
    e.runScript(
      """CREATE TABLE t8(pk BIGINT PRIMARY KEY, v1 BIGINT DEFAULT (v2 + 1), v2 BIGINT);
        |INSERT INTO t8 (pk, v2) VALUES (1, 4), (2, 6);""".stripMargin)
    check(e, "SELECT * FROM t8", Seq(Seq(1L, 5L, 4L), Seq(2L, 7L, 6L)))
    e.runScript("drop table t5; drop table t6; drop table t7; drop table t8")
  }

  test("REPLACE INTO re-applies defaults (column_default_queries.go t12)") {
    val e = freshEngine
    e.runScript(
      """CREATE TABLE t12(pk BIGINT PRIMARY KEY, v1 SMALLINT DEFAULT (GREATEST(pk, 2)));
        |INSERT INTO t12 (pk) VALUES (1), (2);
        |REPLACE INTO t12 (pk) VALUES (2), (3);""".stripMargin)
    check(e, "SELECT * FROM t12", Seq(Seq(1L, 2), Seq(2L, 2), Seq(3L, 3)))
    e.runScript("drop table t12")
  }

  test("ADD COLUMN with positioned expression defaults (column_default_queries.go t13-t20)") {
    val e = freshEngine
    e.runScript(
      """CREATE TABLE t13(pk BIGINT PRIMARY KEY, v1 BIGINT DEFAULT '4');
        |INSERT INTO t13 (pk) VALUES (1), (2);
        |ALTER TABLE t13 ADD COLUMN v2 BIGINT DEFAULT 5;""".stripMargin)
    check(e, "SELECT * FROM t13", Seq(Seq(1L, 4L, 5L), Seq(2L, 4L, 5L)))
    e.runScript(
      """CREATE TABLE t14(pk BIGINT PRIMARY KEY, v1 BIGINT DEFAULT (pk + 1));
        |INSERT INTO t14 (pk) VALUES (1), (2);
        |ALTER TABLE t14 ADD COLUMN v2 BIGINT DEFAULT (v1 + 2);""".stripMargin)
    check(e, "SELECT * FROM t14", Seq(Seq(1L, 2L, 4L), Seq(2L, 3L, 5L)))
    e.runScript(
      """CREATE TABLE t15(pk BIGINT PRIMARY KEY, v1 BIGINT DEFAULT (pk + 1));
        |INSERT INTO t15 (pk) VALUES (1), (2);
        |ALTER TABLE t15 ADD COLUMN v2 BIGINT DEFAULT (v1 + 2) AFTER v1;""".stripMargin)
    check(e, "SELECT * FROM t15", Seq(Seq(1L, 2L, 4L), Seq(2L, 3L, 5L)))
    e.runScript(
      """CREATE TABLE t16(pk BIGINT PRIMARY KEY, v1 BIGINT DEFAULT '4');
        |INSERT INTO t16 (pk) VALUES (1), (2);
        |ALTER TABLE t16 ADD COLUMN v2 BIGINT DEFAULT 5 FIRST;""".stripMargin)
    check(e, "SELECT * FROM t16", Seq(Seq(5L, 1L, 4L), Seq(5L, 2L, 4L)))
    e.runScript(
      """CREATE TABLE t17(pk BIGINT PRIMARY KEY, v1 BIGINT);
        |INSERT INTO t17 VALUES (1, 3), (2, 4);
        |ALTER TABLE t17 ADD COLUMN v2 BIGINT DEFAULT (v1 + 2) FIRST;""".stripMargin)
    check(e, "SELECT * FROM t17", Seq(Seq(5L, 1L, 3L), Seq(6L, 2L, 4L)))
    e.runScript(
      """CREATE TABLE t18(pk BIGINT DEFAULT (v1) PRIMARY KEY, v1 BIGINT);
        |INSERT INTO t18 (v1) VALUES (1), (2);
        |ALTER TABLE t18 ADD COLUMN v2 BIGINT DEFAULT (pk + 1) AFTER pk;""".stripMargin)
    check(e, "SELECT * FROM t18", Seq(Seq(1L, 2L, 1L), Seq(2L, 3L, 2L)))
    e.runScript(
      """CREATE TABLE t19(pk BIGINT PRIMARY KEY, v1 BIGINT DEFAULT 5);
        |INSERT INTO t19 (pk) VALUES (1), (2);
        |ALTER TABLE t19 ADD COLUMN v2 BIGINT DEFAULT (v1 - 1) AFTER pk;""".stripMargin)
    check(e, "SELECT * FROM t19", Seq(Seq(1L, 4L, 5L), Seq(2L, 4L, 5L)))
    // existing defaults keep functioning after the reshape
    e.runScript(
      """CREATE TABLE t20(pk BIGINT PRIMARY KEY, v1 BIGINT DEFAULT (pk + 10));
        |INSERT INTO t20 (pk) VALUES (1), (2);
        |ALTER TABLE t20 ADD COLUMN v2 BIGINT DEFAULT (-pk) FIRST;
        |INSERT INTO t20 (pk) VALUES (3);""".stripMargin)
    check(e, "SELECT * FROM t20",
      Seq(Seq(-1L, 1L, 11L), Seq(-2L, 2L, 12L), Seq(-3L, 3L, 13L)))
    (13 to 20).foreach(i => e.query(s"drop table t$i"))
  }

  test("DROP COLUMN referencing sibling; MODIFY repositions with new default (t21-t23)") {
    val e = freshEngine
    e.runScript(
      "CREATE TABLE t21(pk BIGINT PRIMARY KEY, v1 BIGINT DEFAULT (v2), v2 BIGINT)")
    e.query("ALTER TABLE t21 DROP COLUMN v1") // must not error
    e.runScript(
      """CREATE TABLE t22(pk BIGINT PRIMARY KEY, v1 BIGINT DEFAULT (pk + 2), v2 BIGINT DEFAULT (pk + 1));
        |INSERT INTO t22 (pk) VALUES (1), (2);
        |ALTER TABLE t22 MODIFY COLUMN v1 BIGINT DEFAULT (pk + 2) FIRST;""".stripMargin)
    check(e, "SELECT * FROM t22", Seq(Seq(3L, 1L, 2L), Seq(4L, 2L, 3L)))
    e.runScript(
      """CREATE TABLE t23(pk BIGINT PRIMARY KEY, v1 BIGINT, v2 BIGINT DEFAULT (v1 + 1));
        |INSERT INTO t23 (pk, v1) VALUES (1, 2), (2, 3);
        |ALTER TABLE t23 MODIFY COLUMN v1 BIGINT DEFAULT (pk + 5) FIRST;
        |INSERT INTO t23 (pk) VALUES (3);""".stripMargin)
    check(e, "SELECT * FROM t23 order by 1",
      Seq(Seq(2L, 1L, 3L), Seq(3L, 2L, 4L), Seq(8L, 3L, 9L)))
    e.runScript("drop table t21; drop table t22; drop table t23")
  }

  test("declaration-time validation (column_default_queries.go:505-530)") {
    val e = freshEngine
    // bare column reference needs parens
    val e1 = intercept[Exception](
      e.query("Create table t0_cd (c0 int, c1 int default c0)"))
    assert(e1.getMessage.toLowerCase.contains("parenthes"))
    // incompatible literals
    intercept[Exception](
      e.query("CREATE TABLE t999_cd(pk BIGINT PRIMARY KEY, v1 INT UNSIGNED DEFAULT -1)"))
    intercept[Exception](
      e.query("CREATE TABLE t998_cd(pk BIGINT PRIMARY KEY, v1 BIGINT DEFAULT 'hi')"))
  }
}
