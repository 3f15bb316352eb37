package graft

import org.scalatest.funsuite.AnyFunSuite

/** Port of logic_test_scripts.go "exists, in, all, any subquery" (the
  * sqllogictest-derived 3VL block over the c/o customer-order fixture)
  * plus the values/using-join scripts. Cases the reference itself marks
  * Skip (correlated ALL/ANY) are not ported. */
class ReferenceLogicCorpusSpec extends AnyFunSuite {
  import SparkSpec.spark

  private lazy val engine = new Engine(spark)

  private def fixture(): Unit = engine.runScript(
    """CREATE TABLE c (c_id INT PRIMARY KEY, bill TEXT);
      |CREATE TABLE o (o_id INT PRIMARY KEY, c_id INT, ship TEXT);
      |INSERT INTO c VALUES (1, 'CA'), (2, 'TX'), (3, 'MA'), (4, 'TX'), (5, NULL), (6, 'FL');
      |INSERT INTO o VALUES (10, 1, 'CA'), (20, 1, 'CA'), (30, 1, 'CA'), (40, 2, 'CA'), (50, 2, 'TX'), (60, 2, NULL), (70, 4, 'WY'), (80, 4, NULL), (90, 6, 'WA');
      |""".stripMargin)

  private def drop(): Unit =
    engine.runScript("drop table c; drop table o;")

  private def rows(sql: String): Set[(Int, Any)] =
    engine.query(sql).collect().toSet
      .map((r: org.apache.spark.sql.Row) =>
        (r.getInt(0), if (r.isNullAt(1)) null else r.getString(1)))

  test("correlated EXISTS / NOT EXISTS (logic_test_scripts.go:190)") {
    fixture()
    assert(rows(
      "SELECT * FROM c WHERE EXISTS(SELECT * FROM o WHERE o.c_id=c.c_id)") ==
      Set((1, "CA"), (2, "TX"), (4, "TX"), (6, "FL")))
    assert(rows(
      "SELECT * FROM c WHERE NOT EXISTS(SELECT * FROM o WHERE o.c_id=c.c_id)") ==
      Set((3, "MA"), (5, null)))
    assert(rows(
      "SELECT * FROM c WHERE EXISTS(SELECT * FROM o WHERE o.c_id=c.c_id) " +
      "OR NOT EXISTS(SELECT * FROM o WHERE o.c_id=c.c_id)") ==
      Set((1, "CA"), (2, "TX"), (3, "MA"), (4, "TX"), (5, null), (6, "FL")))
    assert(rows(
      "SELECT * FROM c WHERE EXISTS(SELECT * FROM o WHERE o.c_id=c.c_id " +
      "AND c.bill='TX')") == Set((2, "TX"), (4, "TX")))
    drop()
  }

  test("literal/column IN over correlated subqueries with NULL 3VL " +
      "(logic_test_scripts.go:224)") {
    fixture()
    assert(rows(
      "SELECT * FROM c WHERE 'WY' IN (SELECT ship FROM o WHERE o.c_id=c.c_id)") ==
      Set((4, "TX")))
    assert(rows(
      "SELECT * FROM c WHERE 'WY' IN (SELECT ship FROM o WHERE o.c_id=c.c_id) " +
      "OR 'WA' IN (SELECT ship FROM o WHERE o.c_id=c.c_id)") ==
      Set((4, "TX"), (6, "FL")))
    assert(rows(
      "SELECT * FROM c WHERE 'CA' IN (SELECT ship FROM o WHERE o.c_id=c.c_id) " +
      "AND 'TX' NOT IN (SELECT ship FROM o WHERE o.c_id=c.c_id)") ==
      Set((1, "CA")))
    assert(rows(
      "SELECT * FROM c WHERE bill IN (SELECT ship FROM o WHERE o.c_id=c.c_id)") ==
      Set((1, "CA"), (2, "TX")))
    assert(rows(
      "SELECT * FROM c WHERE bill NOT IN (SELECT ship FROM o WHERE o.c_id=c.c_id)") ==
      Set((3, "MA"), (5, null), (6, "FL")))
    assert(rows(
      "SELECT * FROM c WHERE bill NOT IN (SELECT ship FROM o " +
      "WHERE o.c_id=c.c_id AND ship IS NOT NULL)") ==
      Set((3, "MA"), (4, "TX"), (5, null), (6, "FL")))
    assert(rows(
      "SELECT * FROM c WHERE bill NOT IN (SELECT ship FROM o " +
      "WHERE o.c_id=c.c_id AND ship IS NULL)") ==
      Set((1, "CA"), (3, "MA"), (5, null), (6, "FL")))
    drop()
  }

  test("IN over a WITH-subquery UNION ALL chain and the same shape " +
      "through a view (logic_test_scripts.go:1042,1067)") {
    engine.runScript(
      """CREATE TABLE t_48638 (`key` INT NOT NULL, `value` INT NOT NULL, PRIMARY KEY (`key`, `value`));
        |INSERT INTO t_48638 values (1, 4);
        |INSERT INTO t_48638 values (4, 3);
        |INSERT INTO t_48638 values (3, 2);
        |INSERT INTO t_48638 values (4, 1);
        |INSERT INTO t_48638 values (1, 2);
        |INSERT INTO t_48638 values (6, 5);
        |INSERT INTO t_48638 values (7, 8);
        |""".stripMargin)
    val q =
      "SELECT * FROM t_48638 WHERE `key` IN (WITH v AS (SELECT " +
      "level1.`value` AS `value`, level1.`key` AS level1, level2.`key` " +
      "AS level2, level3.`key` AS level3 FROM t_48638 AS level2 RIGHT " +
      "JOIN (SELECT * FROM t_48638 WHERE `value` = 4) AS level1 ON " +
      "level1.`value` = level2.`key` LEFT JOIN (SELECT * FROM t_48638) " +
      "AS level3 ON level3.`key` = level2.`value`) SELECT v.level1 FROM " +
      "v WHERE v.level1 IS NOT NULL UNION ALL SELECT v.level2 FROM v " +
      "WHERE v.level2 IS NOT NULL UNION ALL SELECT v.level3 FROM v " +
      "WHERE v.level3 IS NOT NULL)"
    val want = Set((1, 2), (1, 4), (3, 2), (4, 1), (4, 3))
    def got(sql: String): Set[(Int, Int)] =
      engine.query(sql).collect().toSet
        .map((r: org.apache.spark.sql.Row) => (r.getInt(0), r.getInt(1)))
    assert(got(q) == want)
    engine.query("drop table t_48638")
  }

  test("USING join resolves shared columns once; case-insensitive " +
      "column match (logic_test_scripts.go:107,161)") {
    engine.runScript(
      """create table lj1 (a int primary key, b int);
        |create table lj2 (a int primary key, c int);
        |insert into lj1 values (1, 10), (2, 20), (3, 30);
        |insert into lj2 values (1, 100), (3, 300), (4, 400);
        |""".stripMargin)
    val got = engine.query(
      "select * from lj1 join lj2 using (a) order by a").collect()
      .map(r => (r.getInt(0), r.getInt(1), r.getInt(2))).toSeq
    assert(got == Seq((1, 10, 100), (3, 30, 300)))
    // case-variant USING column resolves too (MySQL identifiers are ci)
    val got2 = engine.query(
      "select * from lj1 join lj2 using (A) order by a").collect()
    assert(got2.length == 2)
    engine.runScript("drop table lj1; drop table lj2;")
  }
}
