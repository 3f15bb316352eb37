package graft

import org.scalatest.funsuite.AnyFunSuite

/** Portable subset of the reference's enginetest/queries/
  * indexed_expressions_queries.go (1,714 LoC): functional-index DDL
  * parses, queries over the indexed expression stay correct through
  * every operator/ordering, joins on expressions work, the index stays
  * transparent across ALTER/INSERT/UPDATE/DELETE, and a functional
  * UNIQUE index enforces uniqueness of the EXPRESSION result (multiple
  * NULLs exempt). The reference's ExpectedIndexes plan assertions are
  * physical-index diagnostics with no Catalyst analog — Spark plans
  * scans + filters; correctness of results is the portable contract.
  */
class ReferenceIndexedExprCorpusSpec extends AnyFunSuite {
  import SparkSpec.spark

  private lazy val engine = new Engine(spark)

  private def rows(sql: String): Seq[Seq[Any]] =
    engine.query(sql).collect()
      .map(r => (0 until r.length).map(r.get).toSeq).toSeq

  test("functional index DDL parses; filtering over the expression: " +
      "IN list, all comparison operators, both orderings, IS NULL") {
    engine.runScript(
      """drop table if exists fi;
        |CREATE TABLE fi (pk INT PRIMARY KEY, name VARCHAR(100));
        |INSERT INTO fi VALUES (1,'Alice'),(2,'BOB'),(3,'Carol');
        |CREATE INDEX idx_lower ON fi ((LOWER(name)));
        |""".stripMargin)
    assert(rows("SELECT pk FROM fi WHERE LOWER(name) IN " +
      "('alice', 'bob', 'carol') ORDER BY pk") ==
      Seq(Seq(1), Seq(2), Seq(3)))
    engine.runScript(
      """drop table if exists fc;
        |CREATE TABLE fc (pk INT PRIMARY KEY, c1 INT);
        |INSERT INTO fc VALUES (1, 100), (2, 200), (3, NULL);
        |CREATE INDEX idx1 ON fc ((C1*10));
        |""".stripMargin)
    assert(rows("SELECT pk FROM fc WHERE C1*10 = 1000") == Seq(Seq(1)))
    assert(rows("SELECT pk FROM fc WHERE (c1*10) = 1000") == Seq(Seq(1)))
    assert(rows("SELECT pk FROM fc WHERE 1000 = (c1*10)") == Seq(Seq(1)))
    assert(rows("SELECT pk FROM fc WHERE c1*10 > 1000") == Seq(Seq(2)))
    assert(rows("SELECT pk FROM fc WHERE c1*10 >= 1000 ORDER BY pk") ==
      Seq(Seq(1), Seq(2)))
    assert(rows("SELECT pk FROM fc WHERE c1*10 < 2000") == Seq(Seq(1)))
    assert(rows("SELECT pk FROM fc WHERE c1*10 <> 1000") == Seq(Seq(2)))
    assert(rows("SELECT pk FROM fc WHERE c1*10 IS NULL") == Seq(Seq(3)))
    assert(rows("SELECT pk FROM fc WHERE c1*10 IS NOT NULL ORDER BY pk") ==
      Seq(Seq(1), Seq(2)))
    assert(rows("SELECT pk FROM fc WHERE c1*10 <=> NULL") == Seq(Seq(3)))
    // sorting by the indexed expression
    assert(rows("SELECT pk FROM fc WHERE c1 IS NOT NULL " +
      "ORDER BY c1*10 DESC") == Seq(Seq(2), Seq(1)))
    engine.runScript("drop table fi; drop table fc;")
  }

  test("joins on indexed expressions: arithmetic and LOWER(), index " +
      "transparent to table order") {
    engine.runScript(
      """drop table if exists ja; drop table if exists jb;
        |CREATE TABLE ja (pk INT PRIMARY KEY, c1 INT);
        |CREATE TABLE jb (pk INT PRIMARY KEY, c2 INT);
        |INSERT INTO ja VALUES (1, 10), (2, 20);
        |INSERT INTO jb VALUES (1, 100), (2, 200), (3, 300);
        |CREATE INDEX idxa ON ja ((c1*10));
        |""".stripMargin)
    assert(rows("SELECT ja.pk, jb.pk FROM ja JOIN jb ON ja.c1*10 = jb.c2 " +
      "ORDER BY ja.pk") == Seq(Seq(1, 1), Seq(2, 2)))
    assert(rows("SELECT ja.pk, jb.pk FROM jb JOIN ja ON ja.c1 * 10 = " +
      "jb.c2 ORDER BY ja.pk") == Seq(Seq(1, 1), Seq(2, 2)))
    engine.runScript(
      """drop table if exists jl; drop table if exists jr;
        |CREATE TABLE jl (pk INT PRIMARY KEY, name VARCHAR(20));
        |CREATE TABLE jr (pk INT PRIMARY KEY, lname VARCHAR(20));
        |INSERT INTO jl VALUES (1, 'Alice'), (2, 'BOB');
        |INSERT INTO jr VALUES (1, 'alice'), (2, 'bob');
        |CREATE INDEX idxl ON jl ((LOWER(name)));
        |""".stripMargin)
    assert(rows("SELECT jl.pk, jr.pk FROM jl JOIN jr ON LOWER(jl.name) = " +
      "jr.lname ORDER BY jl.pk") == Seq(Seq(1, 1), Seq(2, 2)))
    engine.runScript(
      "drop table ja; drop table jb; drop table jl; drop table jr;")
  }

  test("index stays transparent across INSERT/UPDATE/DELETE and ALTER " +
      "TABLE ADD COLUMN; DML filtered by the expression") {
    engine.runScript(
      """drop table if exists fm;
        |CREATE TABLE fm (pk INT PRIMARY KEY, c1 INT);
        |INSERT INTO fm VALUES (1, 100), (2, 200);
        |CREATE INDEX idx1 ON fm ((c1*10));
        |INSERT INTO fm VALUES (3, 300);
        |""".stripMargin)
    assert(rows("SELECT pk FROM fm WHERE c1*10 = 3000") == Seq(Seq(3)))
    engine.query("UPDATE fm SET c1 = 400 WHERE c1*10 = 3000")
    assert(rows("SELECT pk FROM fm WHERE c1*10 = 4000") == Seq(Seq(3)))
    engine.query("DELETE FROM fm WHERE c1*10 = 4000")
    assert(rows("SELECT count(*) FROM fm") == Seq(Seq(2L)))
    engine.query("ALTER TABLE fm ADD COLUMN extra VARCHAR(10)")
    assert(rows("SELECT pk FROM fm WHERE c1*10 = 1000") == Seq(Seq(1)))
    engine.query("drop table fm")
  }

  test("functional UNIQUE index enforces the expression result on " +
      "INSERT and UPDATE; multiple NULLs are exempt; DROP INDEX lifts it") {
    engine.runScript(
      """drop table if exists fu;
        |CREATE TABLE fu (pk INT PRIMARY KEY, c1 INT);
        |CREATE UNIQUE INDEX idx1 ON fu ((c1*10));
        |INSERT INTO fu VALUES (1, 100);
        |""".stripMargin)
    assert(intercept[IllegalArgumentException] {
      engine.query("INSERT INTO fu VALUES (2, 100)")
    }.getMessage.contains("duplicate unique key given: [1000]"))
    // a batch with one dup fails whole
    assert(intercept[IllegalArgumentException] {
      engine.query("INSERT INTO fu VALUES (2, 100), (3, 101)")
    }.getMessage.contains("duplicate unique key given: [1000]"))
    engine.query("INSERT INTO fu VALUES (2, 101)")
    assert(intercept[IllegalArgumentException] {
      engine.query("UPDATE fu SET c1 = 101 WHERE pk = 1")
    }.getMessage.contains("duplicate unique key given: [1010]"))
    // NULL expression results are exempt (NULL != NULL)
    engine.query("INSERT INTO fu VALUES (4, NULL), (5, NULL), (6, NULL)")
    assert(rows("SELECT pk FROM fu WHERE c1*10 IS NULL ORDER BY pk") ==
      Seq(Seq(4), Seq(5), Seq(6)))
    assert(intercept[IllegalArgumentException] {
      engine.query("INSERT INTO fu VALUES (7, 100), (8, 100)")
    }.getMessage.contains("duplicate unique key given: [1000]"))
    // declaring over an already-violating table fails and rolls back
    engine.runScript(
      """drop table if exists fv;
        |CREATE TABLE fv (pk INT PRIMARY KEY, c1 INT);
        |INSERT INTO fv VALUES (1, 100), (2, 100);
        |""".stripMargin)
    assert(intercept[IllegalArgumentException] {
      engine.query("CREATE UNIQUE INDEX idxv ON fv ((c1*10))")
    }.getMessage.contains("duplicate unique key"))
    // the failed declaration left no constraint behind
    engine.query("INSERT INTO fv VALUES (3, 100)")
    // DROP INDEX removes enforcement
    engine.query("DROP INDEX idx1 ON fu")
    engine.query("INSERT INTO fu VALUES (9, 100)")
    assert(rows("SELECT count(*) FROM fu WHERE c1 = 100") == Seq(Seq(2L)))
    engine.runScript("drop table fu; drop table fv;")
  }
  test("composite UNIQUE over mixed column + expression parts enforces " +
      "the TUPLE, not each part independently") {
    engine.runScript(
      """drop table if exists fm;
        |CREATE TABLE fm (pk INT PRIMARY KEY, a INT, b INT);
        |INSERT INTO fm VALUES (1, 1, 10), (2, 1, 20), (3, 2, 10);
        |""".stripMargin)
    // (a, (b+1)): rows 1-3 collide on one part each but never on both
    engine.query("CREATE UNIQUE INDEX idxm ON fm (a, (b+1))")
    // still acceptable: same a, different b+1 / same b+1, different a
    engine.query("INSERT INTO fm VALUES (4, 1, 30), (5, 3, 10)")
    // full-tuple duplicate rejects
    assert(intercept[IllegalArgumentException] {
      engine.query("INSERT INTO fm VALUES (6, 1, 10)")
    }.getMessage.contains("duplicate unique key"))
    // NULL in ANY part exempts the row (MySQL unique-index NULL rule)
    engine.query("INSERT INTO fm VALUES (7, NULL, 10), (8, NULL, 10), " +
      "(9, 1, NULL), (10, 1, NULL)")
    assert(rows("SELECT count(*) FROM fm") == Seq(Seq(9L)))
    // multiple expression parts: tuple semantics there too
    engine.runScript(
      """drop table if exists fm2;
        |CREATE TABLE fm2 (pk INT PRIMARY KEY, a INT, b INT);
        |INSERT INTO fm2 VALUES (1, 1, 10), (2, 1, 20);
        |CREATE UNIQUE INDEX idxm2 ON fm2 ((a*2), (b*2));
        |INSERT INTO fm2 VALUES (3, 2, 10);
        |""".stripMargin)
    assert(intercept[IllegalArgumentException] {
      engine.query("INSERT INTO fm2 VALUES (4, 1, 10)")
    }.getMessage.contains("duplicate unique key"))
    // declaring over a violating table fails and leaves no constraint
    engine.runScript(
      """drop table if exists fm3;
        |CREATE TABLE fm3 (pk INT PRIMARY KEY, a INT, b INT);
        |INSERT INTO fm3 VALUES (1, 1, 10), (2, 1, 10);
        |""".stripMargin)
    assert(intercept[IllegalArgumentException] {
      engine.query("CREATE UNIQUE INDEX idxm3 ON fm3 (a, (b+1))")
    }.getMessage.contains("duplicate unique key"))
    engine.query("INSERT INTO fm3 VALUES (3, 1, 10)")
    engine.runScript("drop table fm; drop table fm2; drop table fm3;")
  }

}
