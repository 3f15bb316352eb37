package graft

import org.scalatest.funsuite.AnyFunSuite

/** charset_collation_engine.go ports: collation-driven ORDER BY and
  * comparison differences over collated VARCHAR columns ("Sorting
  * differences", "Insert multiple character sets" — the utf16/utf8
  * introducer bytes collapse to the same UTF-8 text here, every string
  * is UTF-8 in this engine). */
class ReferenceCharsetCorpusSpec extends AnyFunSuite {
  import SparkSpec.spark

  private lazy val engine = new Engine(spark)

  test("bin vs unicode_ci collation orders case-variant strings " +
      "differently (charset_collation_engine.go 'Sorting differences')") {
    engine.runScript(
      """CREATE TABLE cst1 (v1 VARCHAR(255) COLLATE utf8mb4_0900_bin);
        |CREATE TABLE cst2 (v1 VARCHAR(255) COLLATE utf16_unicode_ci);
        |INSERT INTO cst1 VALUES ('HEY2'), ('hey1');
        |INSERT INTO cst2 VALUES ('HEY2'), ('hey1');
        |""".stripMargin)
    assert(engine.query("SELECT * FROM cst1 ORDER BY 1").collect()
      .map(_.getString(0)).toSeq == Seq("HEY2", "hey1"))
    assert(engine.query("SELECT * FROM cst2 ORDER BY 1").collect()
      .map(_.getString(0)).toSeq == Seq("hey1", "HEY2"))
    // ci equality folds case; bin does not
    assert(engine.query(
      "SELECT count(*) FROM cst2 WHERE v1 = 'HEY2' OR v1 = 'HEY1'")
      .collect()(0).getLong(0) == 2)
    assert(engine.query(
      "SELECT count(*) FROM cst1 WHERE v1 = 'HEY1'")
      .collect()(0).getLong(0) == 0)
    engine.runScript("drop table cst1; drop table cst2;")
  }

  test("case-variant charset spellings in DDL parse identically " +
      "(charset_collation_engine.go 'Character set and collation " +
      "case-insensitivity')") {
    engine.runScript(
      """CREATE TABLE csci1 (v1 VARCHAR(255) COLLATE utf16_unicode_ci, v2 VARCHAR(255) COLLATE UTF16_UNICODE_CI);
        |CREATE TABLE csci2 (v1 VARCHAR(255) CHARACTER SET utf8mb4, v2 VARCHAR(255) CHARACTER SET UTF8MB4);
        |INSERT INTO csci1 VALUES ('a', 'b');
        |INSERT INTO csci2 VALUES ('a', 'b');
        |""".stripMargin)
    assert(engine.query("SELECT * FROM csci1").collect().length == 1)
    assert(engine.query("SELECT * FROM csci2").collect().length == 1)
    engine.runScript("drop table csci1; drop table csci2;")
  }

  test("every catalog collation name resolves (sql/collations.go: the " +
      "full 286-name MySQL 8.0 catalog maps onto Spark/ICU collations)") {
    val unresolved = Engine.collationCatalog.collect {
      case (_, n, _, _, _, _, _)
          if scala.util.Try(Dialect.mapCollation(n)).isFailure => n
    }
    assert(unresolved.isEmpty,
      s"unresolvable collations: ${unresolved.mkString(", ")}")
    // an unknown name still raises MySQL 1273
    val ex = intercept[IllegalArgumentException](
      Dialect.mapCollation("utf8mb4_nonexistent_ci_xx"))
    assert(ex.getMessage.contains("1273"))
  }
}
