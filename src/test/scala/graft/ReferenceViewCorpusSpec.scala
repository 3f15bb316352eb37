package graft

import org.scalatest.funsuite.AnyFunSuite

/** View ScriptTests ported verbatim from the reference corpus
  * (enginetest/queries/view_queries.go): existence semantics
  * (IF NOT EXISTS no-op over views AND tables, 1050 on duplicate),
  * explicit column lists renaming literal projections, original-case
  * column names, parenthesized CREATE VIEW bodies, SHOW CREATE VIEW
  * returning the stored definition independent of underlying-object
  * state, and nested views inside correlated subqueries.
  */
class ReferenceViewCorpusSpec extends AnyFunSuite {
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

  test("existing views: IF NOT EXISTS no-op, duplicate errors (view_queries.go:26)") {
    val e = freshEngine
    e.runScript(
      """create view v_ex as select 1 as one;
        |create table t_ex (i int);
        |insert into t_ex values (1);""".stripMargin)
    // IF NOT EXISTS over an existing view: silent no-op, original body kept
    e.query("create view if not exists v_ex as select 2")
    check(e, "select * from v_ex", Seq(Seq(1)))
    // IF NOT EXISTS over an existing TABLE: also a no-op
    e.query("create view if not exists t_ex as select 2")
    check(e, "select * from t_ex", Seq(Seq(1)))
    // plain duplicate CREATE VIEW is MySQL 1050
    val err = intercept[Exception](e.query("create view v_ex as select 3"))
    assert(err.getMessage.contains("already exists"))
    // OR REPLACE still replaces
    e.query("create or replace view v_ex as select 4 as four")
    check(e, "select * from v_ex", Seq(Seq(4)))
    e.runScript("drop view v_ex; drop table t_ex")
  }

  test("explicit column list renames literal columns (view_queries.go:163)") {
    val e = freshEngine
    e.runScript(
      """CREATE TABLE t_vcl (id int primary key, name varchar(10));
        |INSERT INTO t_vcl VALUES (1, 'alice'), (2, 'bob');
        |CREATE VIEW v_vcl (id, name, tag) AS SELECT id, name, 'abc' FROM t_vcl;""".stripMargin)
    check(e, "SELECT * FROM v_vcl",
      Seq(Seq(1, "alice", "abc"), Seq(2, "bob", "abc")))
    check(e, "SELECT v_vcl.tag FROM v_vcl WHERE v_vcl.tag = 'abc'",
      Seq(Seq("abc"), Seq("abc")))
    check(e, "SELECT tag FROM v_vcl WHERE tag = 'abc'",
      Seq(Seq("abc"), Seq("abc")))
    check(e, "SELECT * FROM v_vcl WHERE v_vcl.tag = 'xyz'", Seq.empty)
    // the literal's own name is NOT addressable once renamed
    intercept[Exception](e.query("SELECT v_vcl.abc FROM v_vcl").collect())
    e.runScript("drop view v_vcl; drop table t_vcl")
  }

  test("view columns retain original case (view_queries.go:407)") {
    val e = freshEngine
    e.runScript(
      """CREATE TABLE strs_vc (id int NOT NULL AUTO_INCREMENT,
        |  str varchar(15) NOT NULL, PRIMARY KEY (id));
        |CREATE VIEW caseSensitive AS SELECT id as AbCdEfG FROM strs_vc;""".stripMargin)
    assert(e.query("SELECT * from caseSensitive").columns.toSeq == Seq("AbCdEfG"))
    e.runScript("drop view caseSensitive; drop table strs_vc")
  }

  test("CREATE VIEW with parentheses around SELECT (view_queries.go:688)") {
    val e = freshEngine
    e.runScript(
      """CREATE TABLE test_table (id INT, name VARCHAR(50), active BOOLEAN);
        |INSERT INTO test_table VALUES (1, 'Alice', true), (2, 'Bob', false), (3, 'Charlie', true);""".stripMargin)
    e.query("CREATE VIEW simple_view AS (SELECT id, name FROM test_table WHERE active = true)")
    check(e, "SELECT * FROM simple_view ORDER BY id",
      Seq(Seq(1, "Alice"), Seq(3, "Charlie")))
    e.query("CREATE VIEW complex_view AS (SELECT id, name, CONCAT('user_', id) AS user_id FROM test_table WHERE active = true)")
    check(e, "SELECT * FROM complex_view ORDER BY id",
      Seq(Seq(1, "Alice", "user_1"), Seq(3, "Charlie", "user_3")))
    e.runScript("drop view simple_view; drop view complex_view; drop table test_table")
  }

  test("SHOW CREATE VIEW returns stored definition regardless of object state (view_queries.go:584)") {
    val e = freshEngine
    e.runScript(
      """CREATE TABLE t_scv (pk int PRIMARY KEY, c1 varchar(20));
        |CREATE VIEW v_scv AS SELECT * FROM t_scv;
        |DROP TABLE t_scv;""".stripMargin)
    val r1 = e.query("SHOW CREATE VIEW v_scv").collect()(0)
    assert(r1.getString(0) == "v_scv")
    assert(r1.getString(1) == "CREATE VIEW `v_scv` AS SELECT * FROM t_scv")
    assert(r1.getString(2) == "utf8mb4" && r1.getString(3) == "utf8mb4_0900_bin")
    // a view over a dropped view keeps its stored text too
    e.runScript(
      """CREATE TABLE t_chain (pk int PRIMARY KEY, c1 int);
        |CREATE VIEW v1_scv AS SELECT * FROM t_chain;
        |CREATE VIEW v2_scv AS SELECT pk FROM v1_scv;
        |DROP VIEW v1_scv;""".stripMargin)
    val r2 = e.query("SHOW CREATE VIEW v2_scv").collect()(0)
    assert(r2.getString(1) == "CREATE VIEW `v2_scv` AS SELECT pk FROM v1_scv")
    // dropped / unknown views error like a missing table
    intercept[Exception](e.query("SHOW CREATE VIEW v1_scv").collect())
    intercept[Exception](e.query("SHOW CREATE VIEW no_such_view").collect())
    e.runScript("drop view v_scv; drop view v2_scv; drop table t_chain")
  }

  test("nested views in correlated subquery (view_queries.go:638)") {
    val e = freshEngine
    e.runScript(
      """CREATE TABLE base_nv (id BIGINT, name VARCHAR(255), created_at VARCHAR(255));
        |INSERT INTO base_nv VALUES (1,'a','x'),(2,'b','y'),(3,'a','z');
        |CREATE TABLE k_nv AS SELECT id, name, created_at, ROW_NUMBER() OVER (ORDER BY id) AS sk FROM base_nv;
        |CREATE VIEW vl_nv AS SELECT id, sk FROM k_nv;
        |CREATE VIEW vr_nv AS SELECT name, created_at, sk FROM k_nv;
        |CREATE VIEW t_nv AS SELECT l.id AS id, r.name AS name, r.created_at AS created_at FROM vl_nv l LEFT JOIN vr_nv r ON l.sk = r.sk;""".stripMargin)
    check(e, "SELECT t1.id FROM t_nv t1 WHERE EXISTS (SELECT 1 FROM t_nv t5 WHERE t5.id = t1.id)",
      Seq(Seq(1L), Seq(2L), Seq(3L)))
    e.runScript("drop view t_nv; drop view vl_nv; drop view vr_nv; drop table k_nv; drop table base_nv")
  }
}
