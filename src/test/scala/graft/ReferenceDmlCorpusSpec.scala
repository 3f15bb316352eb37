package graft

import org.scalatest.funsuite.AnyFunSuite

/** Write-query corpus ported verbatim from the reference's enginetest
  * DML suites (enginetest/queries/update_queries.go
  * UpdateWriteQueryTests, delete_queries.go DeleteTests,
  * insert_queries.go) over the setup_data fixtures. Each case runs the
  * write through the Engine's SQL-text DML dispatch, asserts MySQL's
  * matched-rows count, then asserts the post-state with the reference's
  * own SELECT. Fixtures are recreated per case — DML mutates them.
  */
class ReferenceDmlCorpusSpec extends AnyFunSuite {
  import SparkSpec.spark
  import spark.implicits._

  private lazy val engine = new Engine(spark)

  private def fresh(): Unit = {
    Seq((1L, "first row"), (2L, "second row"), (3L, "third row"))
      .toDF("i", "s").createOrReplaceTempView("mytable")
    Seq[(Long, Option[Long], Option[Int], Option[Double])](
      (1L, None, None, None), (2L, Some(2L), Some(1), None),
      (3L, None, Some(0), None), (4L, Some(4L), None, Some(4.0)),
      (5L, None, Some(1), Some(5.0)), (6L, Some(6L), Some(0), Some(6.0)))
      .toDF("i", "i2", "b", "f").createOrReplaceTempView("niltable")
    // setup_data.sg.go:170 FloattableData
    Seq((1L, 1.0f, 1.0), (2L, 1.5f, 1.5), (3L, 2.0f, 2.0),
      (4L, 2.5f, 2.5), (-1L, -1.0f, -1.0), (-2L, -1.5f, -1.5))
      .toDF("i", "f32", "f64").createOrReplaceTempView("floattable")
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

  /** WriteQueryTest: write -> matched count -> select -> expected rows. */
  private def writeCheck(write: String, matched: Long,
                         select: String, expected: Seq[Seq[Any]]): Unit = {
    fresh()
    val res = engine.query(write).collect()
    assert(res(0).getLong(0) == matched,
      s"\nwrite: $write\naffected: ${res(0).getLong(0)} want $matched")
    val got = engine.query(select).collect()
      .map(r => (0 until r.length).map(i => norm(r.get(i))).toSeq).toSeq
      .sortBy(_.mkString("|"))
    val want = expected.map(_.map(norm)).sortBy(_.mkString("|"))
    assert(got == want, s"\nwrite: $write\nselect: $select\ngot:  $got\nwant: $want")
  }

  test("UPDATE write-query cases (update_queries.go:27-130)") {
    writeCheck("UPDATE mytable SET s = 'updated';", 3,
      "SELECT * FROM mytable",
      Seq(Seq(1, "updated"), Seq(2, "updated"), Seq(3, "updated")))
    writeCheck("UPDATE mytable SET S = 'updated';", 3,
      "SELECT * FROM mytable",
      Seq(Seq(1, "updated"), Seq(2, "updated"), Seq(3, "updated")))
    writeCheck("UPDATE mytable SET s = 'updated' WHERE i > 9999;", 0,
      "SELECT * FROM mytable",
      Seq(Seq(1, "first row"), Seq(2, "second row"), Seq(3, "third row")))
    writeCheck("UPDATE mytable SET s = 'updated' WHERE i = 1;", 1,
      "SELECT * FROM mytable",
      Seq(Seq(1, "updated"), Seq(2, "second row"), Seq(3, "third row")))
    writeCheck("UPDATE mytable SET s = 'updated' WHERE i <> 9999;", 3,
      "SELECT * FROM mytable",
      Seq(Seq(1, "updated"), Seq(2, "updated"), Seq(3, "updated")))
    // sequential assignment: f32 doubles FIRST, then f64 sees the new f32
    // (reference update_queries.go:59-63 expects f64 = 3.0 * 1.5 = 4.5)
    writeCheck("UPDATE floattable SET f32 = f32 + f32, f64 = f32 * f64 WHERE i = 2;", 1,
      "SELECT * FROM floattable WHERE i = 2",
      Seq(Seq(2, 3.0, 4.5)))
    writeCheck("UPDATE floattable SET f32 = 5, f32 = 4 WHERE i = 1;", 1,
      "SELECT f32 FROM floattable WHERE i = 1",
      Seq(Seq(4.0)))
    writeCheck("UPDATE niltable SET b = NULL WHERE f IS NULL;", 3,
      "SELECT i,b FROM niltable WHERE f IS NULL",
      Seq(Seq(1, null), Seq(2, null), Seq(3, null)))
    writeCheck("UPDATE mytable SET s = 'updated' ORDER BY i ASC LIMIT 2;", 2,
      "SELECT * FROM mytable",
      Seq(Seq(1, "updated"), Seq(2, "updated"), Seq(3, "third row")))
    writeCheck("UPDATE mytable SET s = 'updated' ORDER BY i DESC LIMIT 2;", 2,
      "SELECT * FROM mytable",
      Seq(Seq(1, "first row"), Seq(2, "updated"), Seq(3, "updated")))
    writeCheck("UPDATE mytable SET s = 'updated' ORDER BY i LIMIT 1 OFFSET 1;", 1,
      "SELECT * FROM mytable",
      Seq(Seq(1, "first row"), Seq(2, "updated"), Seq(3, "third row")))
    writeCheck("UPDATE mytable SET s = _binary 'updated' WHERE i = 3;", 1,
      "SELECT * FROM mytable",
      Seq(Seq(1, "first row"), Seq(2, "second row"), Seq(3, "updated")))
  }

  test("DELETE write-query cases (delete_queries.go:25-90)") {
    writeCheck("DELETE FROM mytable;", 3, "SELECT * FROM mytable", Seq.empty)
    writeCheck("DELETE FROM mytable WHERE i = 2;", 1,
      "SELECT * FROM mytable",
      Seq(Seq(1, "first row"), Seq(3, "third row")))
    writeCheck("DELETE FROM mytable WHERE I = 2;", 1,
      "SELECT * FROM mytable",
      Seq(Seq(1, "first row"), Seq(3, "third row")))
    writeCheck("DELETE FROM mytable WHERE i < 3;", 2,
      "SELECT * FROM mytable", Seq(Seq(3, "third row")))
    writeCheck("DELETE FROM mytable WHERE i > 1;", 2,
      "SELECT * FROM mytable", Seq(Seq(1, "first row")))
    writeCheck("DELETE FROM mytable WHERE i <= 2;", 2,
      "SELECT * FROM mytable", Seq(Seq(3, "third row")))
    writeCheck("DELETE FROM mytable WHERE i >= 2;", 2,
      "SELECT * FROM mytable", Seq(Seq(1, "first row")))
    writeCheck("DELETE FROM mytable WHERE s = 'first row';", 1,
      "SELECT * FROM mytable",
      Seq(Seq(2, "second row"), Seq(3, "third row")))
    writeCheck("DELETE FROM mytable WHERE s <> 'dne';", 3,
      "SELECT * FROM mytable", Seq.empty)
    writeCheck("DELETE FROM mytable WHERE i in (2,3);", 2,
      "SELECT * FROM mytable", Seq(Seq(1, "first row")))
    writeCheck("DELETE FROM mytable WHERE s LIKE '%row';", 3,
      "SELECT * FROM mytable", Seq.empty)
    writeCheck("DELETE FROM mytable ORDER BY i ASC LIMIT 2;", 2,
      "SELECT * FROM mytable", Seq(Seq(3, "third row")))
    writeCheck("DELETE FROM mytable ORDER BY i DESC LIMIT 1;", 1,
      "SELECT * FROM mytable",
      Seq(Seq(1, "first row"), Seq(2, "second row")))
  }

  test("INSERT write-query cases (insert_queries.go shapes)") {
    writeCheck("INSERT INTO mytable VALUES (4, 'fourth row');", 1,
      "SELECT * FROM mytable",
      Seq(Seq(1, "first row"), Seq(2, "second row"), Seq(3, "third row"),
        Seq(4, "fourth row")))
    writeCheck("INSERT INTO mytable (i, s) VALUES (4, 'fourth row'), (5, 'fifth row');", 2,
      "SELECT * FROM mytable",
      Seq(Seq(1, "first row"), Seq(2, "second row"), Seq(3, "third row"),
        Seq(4, "fourth row"), Seq(5, "fifth row")))
    writeCheck("INSERT INTO mytable (s, i) VALUES ('x row', 9);", 1,
      "SELECT * FROM mytable WHERE i = 9", Seq(Seq(9, "x row")))
    writeCheck("INSERT INTO mytable SELECT i + 10, upper(s) FROM mytable;", 3,
      "SELECT count(*) FROM mytable", Seq(Seq(6)))
    // SET assignment form (insert_queries.go:71,84)
    writeCheck("INSERT INTO mytable SET s = 'x', i = 999;", 1,
      "SELECT i FROM mytable WHERE s = 'x'", Seq(Seq(999)))
    writeCheck("INSERT INTO mytable SET i = 999, s = 'x';", 1,
      "SELECT i FROM mytable WHERE s = 'x'", Seq(Seq(999)))
    // string value coerces to the BIGINT column (Convert-on-write)
    writeCheck("INSERT INTO mytable (i, s) VALUES ('42', 'coerced');", 1,
      "SELECT i FROM mytable WHERE s = 'coerced'", Seq(Seq(42)))
  }
}
