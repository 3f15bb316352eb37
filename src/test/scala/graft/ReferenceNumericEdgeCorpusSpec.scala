package graft

import org.scalatest.funsuite.AnyFunSuite

/** Boundary-value and NULL-range predicate semantics, ported from the
  * reference's enginetest corpora: numeric_error_queries.go (the "range
  * key float fuzzer fail" script — equality predicates at each integer
  * type's maximum, huge-magnitude floats) and null_range_tests.go (IS
  * NULL / IS NOT NULL range composition). DECIMAL(65,30) from the
  * original script exceeds Spark's DECIMAL(38) hard cap — exercised at
  * (38,10), the documented divergence (SURVEY §1.2).
  */
class ReferenceNumericEdgeCorpusSpec extends AnyFunSuite {
  import SparkSpec.spark

  private lazy val engine = new Engine(spark)

  private def one(sql: String): Long =
    engine.query(sql).collect()(0).getLong(0)

  test("boundary-value predicates at each integer type's max " +
      "(numeric_error_queries.go)") {
    engine.runScript(
      """create table ni8 (i tinyint primary key);
        |create table ni16 (i smallint primary key);
        |create table ni32 (i int primary key);
        |create table ni64 (i bigint primary key);
        |create table nui8 (i tinyint unsigned primary key);
        |create table nui16 (i smallint unsigned primary key);
        |create table nui32 (i int unsigned primary key);
        |create table nui64 (i bigint unsigned primary key);
        |create table nfloat_pk (a int, b double, primary key(a,b));
        |create table ndec_pk (a int, b decimal(38,10), primary key(a,b));
        |insert into ni8 values (127);
        |insert into ni16 values (32767);
        |insert into ni32 values (2147483647);
        |insert into ni64 values (9223372036854775807);
        |insert into nui8 values (255);
        |insert into nui16 values (65535);
        |insert into nui32 values (4294967295);
        |insert into nui64 values (18446744073709551615);
        |insert into nfloat_pk values (1, -4e+212);
        |insert into ndec_pk values (1, 9999999999999999999999999999.9999999999);
        |""".stripMargin)
    assert(one("delete from ni8 where i = 127") == 1L)
    assert(one("delete from ni16 where i = 32767") == 1L)
    assert(one("delete from ni32 where i = 2147483647") == 1L)
    assert(one("delete from ni64 where i = 9223372036854775807") == 1L)
    assert(one("delete from nui8 where i = 255") == 1L)
    assert(one("delete from nui16 where i = 65535") == 1L)
    assert(one("delete from nui32 where i = 4294967295") == 1L)
    assert(one("delete from nui64 where i = 18446744073709551615") == 1L)
    assert(one("delete from nfloat_pk where a = 1 and b = -4e+212") == 1L)
    assert(one("delete from ndec_pk where a = 1 and " +
      "b = 9999999999999999999999999999.9999999999") == 1L)
    engine.runScript(
      "drop table ni8; drop table ni16; drop table ni32; drop table ni64; " +
      "drop table nui8; drop table nui16; drop table nui32; " +
      "drop table nui64; drop table nfloat_pk; drop table ndec_pk;")
  }

  test("IS NULL / IS NOT NULL range composition (null_range_tests.go)") {
    engine.runScript(
      """create table null_ranges (x int primary key, y int);
        |insert into null_ranges values (0,0), (1,1), (2,2), (3,null), (4,null);
        |""".stripMargin)
    def rs(sql: String): Seq[(Int, Any)] =
      engine.query(sql + " order by x").collect()
        .map(r => (r.getInt(0), r.get(1))).toSeq
    assert(rs("select * from null_ranges where y IS NULL or y < 1") ==
      Seq((0, 0), (3, null), (4, null)))
    assert(rs("select * from null_ranges where y IS NULL and y < 1") ==
      Seq.empty)
    assert(rs("select * from null_ranges where y IS NULL or y IS NOT NULL") ==
      Seq((0, 0), (1, 1), (2, 2), (3, null), (4, null)))
    assert(rs("select * from null_ranges where y IS NOT NULL") ==
      Seq((0, 0), (1, 1), (2, 2)))
    assert(rs("select * from null_ranges where y IS NULL or y = 0 or y = 1")
      == Seq((0, 0), (1, 1), (3, null), (4, null)))
    engine.query("drop table null_ranges")
  }
}
