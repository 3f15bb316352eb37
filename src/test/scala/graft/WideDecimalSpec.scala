package graft

import org.scalatest.funsuite.AnyFunSuite

/** Wide DECIMAL (p > 38, up to MySQL's 65/30 — reference
  * sql/types/decimal.go:58) on string-backed canonical storage:
  * DDL bounds, write rounding, exact comparisons, FK matching.
  * Corpus coverage: script_queries.go "Ensure proper DECIMAL support",
  * "Ensure scale is not rounded…", "decimals with foreign keys". */
class WideDecimalSpec extends AnyFunSuite {
  import SparkSpec.spark

  test("DDL bounds: p <= 65, s <= 30, s <= p") {
    val e = new Engine(spark)
    val ex1 = intercept[Exception] {
      e.query("CREATE TABLE wd_bad1 (d DECIMAL(66,5))") }
    assert(ex1.getMessage.contains("precision"), ex1.getMessage)
    val ex2 = intercept[Exception] {
      e.query("CREATE TABLE wd_bad2 (d DECIMAL(65,31))") }
    assert(ex2.getMessage.contains("scale"), ex2.getMessage)
    val ex3 = intercept[Exception] {
      e.query("CREATE TABLE wd_bad3 (d DECIMAL(4,5))") }
    assert(ex3.getMessage.contains("M must be >= D"), ex3.getMessage)
  }

  test("writes round HALF_UP to the declared scale, stored canonically") {
    val e = new Engine(spark)
    e.query("CREATE TABLE wd (d DECIMAL(50,10))")
    e.query("INSERT INTO wd VALUES ('123.45'), " +
      "('99999999999999999999999999999999999999.12345678905'), (NULL)")
    val got = e.query("SELECT d FROM wd ORDER BY d").collect()
      .map(r => Option(r.get(0)).map(_.toString).orNull).toSeq
    assert(got.contains("123.4500000000"))
    assert(got.contains("99999999999999999999999999999999999999.1234567891"))
    assert(got.contains(null))
  }

  test("strict overflow errors; UPDATE coerces like INSERT") {
    val e = new Engine(spark)
    e.query("CREATE TABLE wd2 (i INT, d DECIMAL(40,30))")
    val ex = intercept[Exception] {
      e.query("INSERT INTO wd2 VALUES (1, '123456789012.4')") }
    assert(ex.getMessage != null)
    e.query("INSERT INTO wd2 VALUES (1, '1.5')")
    e.query("UPDATE wd2 SET d = '2.25' WHERE i = 1")
    val v = e.query("SELECT d FROM wd2").collect()(0).getString(0)
    assert(v == "2.25" + "0" * 28, v)
  }

  test("comparisons are exact past double precision") {
    val e = new Engine(spark)
    e.query("CREATE TABLE wd3 (d DECIMAL(40,20))")
    e.query("INSERT INTO wd3 VALUES ('1.19815923291839784651'), " +
      "('1.19815923291839784652')")
    // the two values collapse to ONE double; exact compare must not
    assert(e.query("SELECT COUNT(*) c FROM wd3 WHERE d = " +
      "'1.19815923291839784651'").collect()(0).getLong(0) == 1L)
    assert(e.query("SELECT COUNT(*) c FROM wd3 WHERE d < " +
      "'1.19815923291839784652'").collect()(0).getLong(0) == 1L)
    assert(e.query("SELECT COUNT(*) c FROM wd3 WHERE d IN " +
      "('1.19815923291839784652', '7')").collect()(0).getLong(0) == 1L)
    // trailing-zero-insensitive equality (decimal semantics, not text)
    assert(e.query("SELECT COUNT(*) c FROM wd3 WHERE d = " +
      "'1.198159232918397846510000'").collect()(0).getLong(0) == 1L)
  }

  test("SHOW CREATE renders the declared decimal(p,s)") {
    val e = new Engine(spark)
    e.query("CREATE TABLE wd4 (d DECIMAL(64,5) PRIMARY KEY)")
    val ddl = e.query("SHOW CREATE TABLE wd4").collect()(0).getString(1)
    assert(ddl.contains("decimal(64,5)"), ddl)
  }

  test("FK: wide child against narrow parent is representation-exact") {
    val e = new Engine(spark)
    e.query("CREATE TABLE wd_p (d DECIMAL(4,2) PRIMARY KEY)")
    e.query("INSERT INTO wd_p VALUES (1.23)")
    e.query("CREATE TABLE wd_c (d DECIMAL(65,30), " +
      "FOREIGN KEY (d) REFERENCES wd_p (d))")
    // scale-30 1.23 never matches the (4,2) parent representation
    val ex = intercept[Exception] {
      e.query("INSERT INTO wd_c VALUES ('1.23')") }
    assert(ex.getMessage != null)
    e.query("INSERT INTO wd_c VALUES (NULL)") // NULL always passes
  }

  test(">38-digit literals and argless string-literal CONVERT") {
    val e = new Engine(spark)
    val r = e.query(
      "SELECT CONVERT('1.1981592329183978465', DECIMAL) AS x").collect()
    assert(r(0).get(0).toString == "1.1981592329183978465", r(0).get(0))
    // a 59-digit bare literal must not be a parse error
    val r2 = e.query("SELECT " +
      "58567047399981325523662211357420045483361289734772861386428.89 " +
      "IS NOT NULL AS ok").collect()
    assert(r2(0).getBoolean(0))
  }
}
