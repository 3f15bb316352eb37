package graft

import org.scalatest.funsuite.AnyFunSuite

/** InnoDB row-size-limit corpus ported from the reference
  * (enginetest/queries/row_limit_queries.go): the declared row caps at
  * 65535 bytes (VARCHAR(n) = n × bytes-per-char of the table charset,
  * TEXT = 16-byte pointer, fixed types = 8), a single VARCHAR caps at
  * 65535 characters, and CREATE / ALTER ADD / ALTER MODIFY all validate
  * the spec. Inserts at exactly the declared width round-trip.
  */
class ReferenceRowLimitCorpusSpec extends AnyFunSuite {
  import SparkSpec.spark

  private val longChar = "x" * 32700

  test("row length limit: latin1 specs at the cap round-trip (row_limit_queries.go:27-60)") {
    val e = new Engine(spark.newSession())
    e.query("create table two_col (pk smallint primary key, c1 VARCHAR(32700) NOT NULL, c2 VARCHAR(32700) NOT NULL) CHARACTER SET latin1;")
    e.query(s"insert into two_col values (0, '$longChar', '$longChar')")
    assert(e.query("select pk, length(c1), length(c2) from two_col")
      .collect()(0).toSeq.map(_.toString) == Seq("0", "32700", "32700"))

    e.query("create table one_col (id int primary key, c1 VARCHAR(65486) NOT NULL) CHARACTER SET latin1;")
    e.query(s"insert into one_col values (0, '$longChar')")
    assert(e.query("select count(*) from one_col").collect()(0).getLong(0) == 1L)

    e.query("""CREATE TABLE one_ref (
        id smallint primary key,
        a VARCHAR(10000), b VARCHAR(10000), c VARCHAR(10000),
        d VARCHAR(10000), e VARCHAR(10000), f VARCHAR(10000),
        i TEXT
      ) character set latin1;""")
    val v10k = longChar.take(10000)
    e.query(s"insert into one_ref values (0,'$v10k', '$v10k','$v10k', '$v10k','$v10k', '$v10k','${longChar.take(6000)}')")
    assert(e.query("select count(*) from one_ref").collect()(0).getLong(0) == 1L)
  }

  test("row length limit errors (row_limit_queries.go:62-104)") {
    val e = new Engine(spark.newSession())
    e.query("create table t (id smallint primary key, a VARCHAR(5000), b VARCHAR(5000), c VARCHAR(5000))")

    // utf8mb4 default: adding a 4th VARCHAR(5000) overflows 65535 bytes
    intercept[Exception] { e.query("alter table t add column d VARCHAR(5000)") }
    intercept[Exception] { e.query("alter table t modify column c VARCHAR(7000)") }
    // value longer than the declared limit errors in strict mode
    intercept[Exception] { e.query(s"insert into t values (1, '$longChar', 'a', 'a')") }
    // single column overflows the row in utf8mb4 (16883 × 4 > 65535)
    intercept[Exception] { e.query("create table t1 (c1 VARCHAR(16883) NOT NULL)") }
    // single column over 65535 CHARACTERS is invalid in any charset
    intercept[Exception] { e.query("create table t1 (c1 VARCHAR(65536) NOT NULL) CHARACTER SET latin1;") }
    // seven latin1 VARCHARs + VARCHAR(6000) overflow where TEXT fit
    intercept[Exception] { e.query("""CREATE TABLE one_ref (
        id int primary key,
        a VARCHAR(10000), b VARCHAR(10000), c VARCHAR(10000),
        d VARCHAR(10000), e VARCHAR(10000), f VARCHAR(10000),
        i VARCHAR(6000)
      ) character set latin1;""") }

    // t survives the failed ALTERs: schema and writes unaffected
    e.query("insert into t values (2, 'ok', 'ok', 'ok')")
    assert(e.query("select count(*) from t").collect()(0).getLong(0) == 1L)
    // and a failed CREATE left no stale spec behind — in-cap retry works
    e.query("create table t1 (c1 VARCHAR(16383) NOT NULL)")
    assert(e.query("select count(*) from t1").collect()(0).getLong(0) == 0L)
  }
}
