package graft

import org.scalatest.funsuite.AnyFunSuite

/** REPLACE corpus ported from the reference
  * (enginetest/queries/replace_queries.go): VALUES and SET forms, column
  * reorder, whole-row replacement semantics (delete + insert, affected
  * rows = 2 when a key existed), the full-width typestable round-trip at
  * type max values, all-NULL REPLACE, and the error surface
  * (ReplaceErrorTests: wrong value counts, unknown / duplicate columns,
  * NULL into NOT NULL).
  */
class ReferenceReplaceCorpusSpec extends AnyFunSuite {
  import SparkSpec.spark

  private def freshEngine: Engine = {
    val e = new Engine(spark.newSession())
    // setup: mytable fixture (scriptgen/setup/scripts/mytable)
    e.runScript(
      """CREATE TABLE mytable (i BIGINT PRIMARY KEY, s VARCHAR(20) NOT NULL);
        |INSERT INTO mytable VALUES (1, 'first row'), (2, 'second row'), (3, 'third row');""".stripMargin)
    e
  }

  private def affected(e: Engine, sql: String): Long =
    e.query(sql).collect()(0).getLong(0)

  private def one(e: Engine, sql: String): Seq[Any] =
    e.query(sql).collect()(0).toSeq

  test("REPLACE VALUES / SET forms on existing and new keys (replace_queries.go:28-72)") {
    // existing key: delete + insert = 2 affected
    var e = freshEngine
    assert(affected(e, "REPLACE INTO mytable VALUES (1, 'first row');") == 2L)
    assert(one(e, "SELECT s FROM mytable WHERE i = 1;") == Seq("first row"))

    e = freshEngine
    assert(affected(e, "REPLACE INTO mytable SET i = 1, s = 'first row';") == 2L)
    assert(one(e, "SELECT s FROM mytable WHERE i = 1;") == Seq("first row"))

    e = freshEngine
    assert(affected(e, "REPLACE INTO mytable VALUES (1, 'new row same i');") == 2L)
    assert(one(e, "SELECT s FROM mytable WHERE i = 1;") == Seq("new row same i"))

    // column-reordered VALUES on a fresh key: plain insert = 1 affected
    e = freshEngine
    assert(affected(e, "REPLACE INTO mytable (s, i) VALUES ('x', 999);") == 1L)
    assert(one(e, "SELECT i FROM mytable WHERE s = 'x';") == Seq(999L))

    e = freshEngine
    assert(affected(e, "REPLACE INTO mytable SET s = 'x', i = 999;") == 1L)
    assert(one(e, "SELECT i FROM mytable WHERE s = 'x';") == Seq(999L))
  }

  private def typesEngine: Engine = {
    val e = new Engine(spark.newSession())
    // scriptgen/setup/scripts/typestable (JSON column held as text here;
    // blob round-trips are covered by ReferenceScriptCorpusSpec)
    e.runScript(
      """CREATE TABLE typestable (
        |  id BIGINT NOT NULL,
        |  i8 TINYINT, i16 SMALLINT, i32 INT, i64 BIGINT,
        |  u8 TINYINT UNSIGNED, u16 SMALLINT UNSIGNED,
        |  u32 INT UNSIGNED, u64 BIGINT UNSIGNED,
        |  f32 FLOAT, f64 DOUBLE,
        |  ti TIMESTAMP, da DATE, te VARCHAR(20),
        |  PRIMARY KEY (id))""".stripMargin)
    e
  }

  test("typestable REPLACE at type max values (replace_queries.go:76-121)") {
    for (form <- Seq(
        """REPLACE INTO typestable VALUES (
           999, 127, 32767, 2147483647, 9223372036854775807,
           255, 65535, 4294967295, 18446744073709551615,
           3.402823e+38, 1.7976931348623157e+308,
           '2037-04-05 12:51:36', '2231-11-07', 'random text')""",
        """REPLACE INTO typestable SET
           id = 999, i8 = 127, i16 = 32767, i32 = 2147483647,
           i64 = 9223372036854775807,
           u8 = 255, u16 = 65535, u32 = 4294967295,
           u64 = 18446744073709551615,
           f32 = 3.402823e+38, f64 = 1.7976931348623157e+308,
           ti = '2037-04-05 12:51:36', da = '2231-11-07',
           te = 'random text'""")) {
      val e = typesEngine
      assert(affected(e, form) == 1L)
      val r = one(e,
        """SELECT id, i8, i16, i32, i64, u8, u16, u32, u64,
                  CAST(ti AS CHAR) AS ti, CAST(da AS CHAR) AS da, te
           FROM typestable WHERE id = 999""")
      assert(r(0) == 999L)
      assert(Seq(r(1), r(2), r(3), r(4)).map(_.toString) ==
        Seq("127", "32767", "2147483647", "9223372036854775807"))
      assert(Seq(r(5), r(6), r(7)).map(_.toString.takeWhile(_ != '.')) ==
        Seq("255", "65535", "4294967295"))
      assert(r(8).toString.takeWhile(_ != '.') == "18446744073709551615")
      assert(r(9).toString.startsWith("2037-04-05 12:51:36"))
      assert(r(10).toString == "2231-11-07")
      assert(r(11) == "random text")
    }
  }

  test("typestable REPLACE all NULLs (replace_queries.go:150-160)") {
    for (form <- Seq(
        "REPLACE INTO typestable VALUES (999, null, null, null, null, null, null, null, null, null, null, null, null, null)",
        """REPLACE INTO typestable SET id=999, i8=null, i16=null, i32=null,
           i64=null, u8=null, u16=null, u32=null, u64=null, f32=null,
           f64=null, ti=null, da=null, te=null""")) {
      val e = typesEngine
      assert(affected(e, form) == 1L)
      val r = one(e, "SELECT * FROM typestable WHERE id = 999")
      assert(r(0) == 999L)
      assert(r.drop(1).forall(_ == null), s"expected all NULL, got $r")
    }
  }

  test("REPLACE/INSERT error surface (ReplaceErrorTests)") {
    val e = freshEngine
    val errorQueries = Seq(
      // wrong value count (MySQL 1136)
      "REPLACE INTO mytable (s, i) VALUES ('x');",
      "REPLACE INTO mytable (s) VALUES ('x', 999);",
      "REPLACE INTO mytable (i, s) VALUES (999, 'x', 'y');",
      "REPLACE INTO mytable VALUES (999);",
      "REPLACE INTO mytable VALUES (999, 'x', 'y');",
      // unknown column (1054)
      "REPLACE INTO mytable (i, s, z) VALUES (999, 'x', 999);",
      "REPLACE INTO mytable SET i = 999, s = 'x', z = 999;",
      // duplicate column (1110)
      "REPLACE INTO mytable (i, s, s) VALUES (999, 'x', 'x');",
      "REPLACE INTO mytable SET i = 999, s = 'y', s = 'y';")
    for (q <- errorQueries) {
      val ex = intercept[Exception] { e.query(q).collect() }
      assert(ex != null, s"expected error for: $q")
    }
    // explicit NULL into NOT NULL errors on a plain INSERT (1048)
    for (q <- Seq(
        "INSERT INTO mytable (i, s) VALUES (null, 'y');",
        "INSERT INTO mytable SET i = null, s = 'y';")) {
      val ex = intercept[Exception] { e.query(q).collect() }
      assert(ex != null, s"expected error for: $q")
    }
    // the fixture is untouched after all the failures
    assert(one(e, "SELECT COUNT(*) FROM mytable") == Seq(3L))
  }
}
