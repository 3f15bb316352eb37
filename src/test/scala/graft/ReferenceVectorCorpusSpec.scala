package graft

import org.scalatest.funsuite.AnyFunSuite

/** VECTOR corpus ported from the reference's enginetest/queries/
  * vector_function_queries.go + vector_ddl_queries.go +
  * vector_index_queries.go (609 LoC): STRING_TO_VECTOR packs
  * little-endian float32 bytes (so HEX / TO_BASE64 / MD5 / SHA /
  * BIT_LENGTH see the serialized form), VECTOR_TO_STRING renders them
  * back, the distance family coerces binary / '[…]' text / array
  * spellings, VECTOR(n) columns validate dimension and reject bare
  * strings on write, and CREATE VECTOR INDEX enforces its column rules.
  */
class ReferenceVectorCorpusSpec extends AnyFunSuite {
  import SparkSpec.spark

  private lazy val engine = new Engine(spark)

  private def one(sql: String): Any = engine.query(sql).collect()(0).get(0)
  private def rows(sql: String): Seq[Seq[Any]] =
    engine.query(sql).collect()
      .map(r => (0 until r.length).map(r.get).toSeq).toSeq

  test("STRING_TO_VECTOR serializes little-endian float32: hex, base64, " +
      "md5, sha1, sha2, lengths (MakeVectorFunctionTest cases)") {
    assert(one("select HEX(STRING_TO_VECTOR(\"[1.0]\"))") == "0000803F")
    assert(one("select LENGTH(STRING_TO_VECTOR(\"[1.0]\"))") == 4)
    assert(one("select BIT_LENGTH(STRING_TO_VECTOR(\"[1.0]\"))") == 32)
    assert(one("select TO_BASE64(STRING_TO_VECTOR(\"[1.0]\"))") == "AACAPw==")
    assert(one("select MD5(STRING_TO_VECTOR(\"[1.0]\"))") ==
      "429d81ed2795e3c586906c6c335aa136")
    assert(one("select SHA1(STRING_TO_VECTOR(\"[1.0]\"))") ==
      "5bb96baed2a67ef718989bf7de91433ca9b9f8cf")
    assert(one("select SHA2(STRING_TO_VECTOR(\"[1.0]\"), 0)") ==
      "e00e5eb9444182f352323374ef4e08ebcb784725fdd4fd612d7730540b3e0c8c")
    assert(one("select HEX(STRING_TO_VECTOR(\"[2.0, 3.0]\"))") ==
      "0000004000004040")
    assert(one("select LENGTH(STRING_TO_VECTOR(\"[2.0, 3.0]\"))") == 8)
    assert(one("select BIT_LENGTH(STRING_TO_VECTOR(\"[2.0, 3.0]\"))") == 64)
    assert(one("select TO_BASE64(STRING_TO_VECTOR(\"[2.0, 3.0]\"))") ==
      "AAAAQAAAQEA=")
    assert(one("select MD5(STRING_TO_VECTOR(\"[2.0, 3.0]\"))") ==
      "f37b6e459e9e2d49261fe42d3a7bff07")
    assert(one("select SHA1(STRING_TO_VECTOR(\"[2.0, 3.0]\"))") ==
      "fd3352c0e141970e5b1c45d1755760d018cfe32d")
    assert(one("select SHA2(STRING_TO_VECTOR(\"[2.0, 3.0]\"), 0)") ==
      "2fd848aa90e817e10e20985de4e8ac6a09b0fe70623d6b952e46800be6b025b9")
  }

  test("conversion functions: exact bytes, aliases, text round-trip, " +
      "hex-literal input (VECTOR conversion functions block)") {
    assert(one("SELECT STRING_TO_VECTOR(\"[0.0]\")")
      .asInstanceOf[Array[Byte]].toSeq == Seq[Byte](0, 0, 0, 0))
    assert(one("SELECT STRING_TO_VECTOR(\"[123456.78e2, -8765432.0]\")")
      .asInstanceOf[Array[Byte]].toSeq ==
      Seq(0x4e, 0x61, 0x3c, 0x4b, 0xf8, 0xbf, 0x05, 0xcb).map(_.toByte))
    assert(one("SELECT HEX(TO_VECTOR(\"[1.0, 2.0]\"))") ==
      one("SELECT HEX(STRING_TO_VECTOR(\"[1.0, 2.0]\"))"))
    assert(one("SELECT HEX(VEC_FromText(\"[1.0, 2.0]\"))") ==
      one("SELECT HEX(STRING_TO_VECTOR(\"[1.0, 2.0]\"))"))
    assert(one("SELECT VECTOR_TO_STRING(STRING_TO_VECTOR(\"[1.0, 2.0]\"))")
      == "[1, 2]")
    assert(one("select VECTOR_TO_STRING(0x0000803F)") == "[1]")
    assert(one("SELECT FROM_VECTOR(TO_VECTOR(\"[1.0, 2.0]\"))") == "[1, 2]")
    assert(one("SELECT VEC_ToText(VEC_FromText(\"[1.0, 2.0]\"))") ==
      "[1, 2]")
  }

  test("distance family coerces binary / text / array spellings " +
      "(VECTOR distance functions block)") {
    assert(one("select VEC_DISTANCE('[10.0]', '[20.0]')") == 100.0)
    assert(one(
      "select VEC_DISTANCE_L2_SQUARED('[1.0, 2.0]', '[5.0, 5.0]')") == 25.0)
    assert(one(
      "select VEC_DISTANCE_EUCLIDEAN('[1.0, 2.0]', '[5.0, 5.0]')") == 5.0)
    assert(one("SELECT DISTANCE(STRING_TO_VECTOR(\"[0.0, 0.0]\"), " +
      "STRING_TO_VECTOR(\"[3.0, 4.0]\"), \"EUCLIDEAN\")") == 5.0)
    assert(one("select VEC_DISTANCE_COSINE(STRING_TO_VECTOR('[0.0, 3.0]')," +
      " '[5.0, 5.0]')") == 0.29289321881345254)
    assert(one("SELECT DISTANCE(\"[1.0, 1.0]\", " +
      "STRING_TO_VECTOR(\"[-1.0, 1.0]\"), \"COSINE\")") == 1.0)
    // ordering a json-vector column by distance
    engine.runScript(
      """drop table if exists vectors;
        |create table vectors (id int primary key, v json);
        |insert into vectors values (1, '[3.0,4.0]'), (2, '[0.0,0.0]'),
        |  (3, '[1.0,-1.0]'), (4, '[-2.0,0.0]');
        |""".stripMargin)
    assert(rows("select id from vectors order by " +
      "VEC_DISTANCE('[0.0,0.0]', v)") ==
      Seq(Seq(2), Seq(3), Seq(4), Seq(1)))
    assert(rows("select id from vectors order by " +
      "VEC_DISTANCE_L2_SQUARED('[-2.0,0.0]', v)") ==
      Seq(Seq(4), Seq(2), Seq(3), Seq(1)))
    engine.query("drop table vectors")
  }

  test("VECTOR(n) columns: insert via STRING_TO_VECTOR and hex literal, " +
      "update, render, dimension + type validation (vector_ddl corpus)") {
    engine.runScript(
      """drop table if exists tv;
        |create table tv (id int primary key, small_vec vector(2));
        |""".stripMargin)
    assert(engine.showCreateTable("tv").contains("`small_vec` vector(2)"))
    engine.query(
      "insert into tv values (1, STRING_TO_VECTOR('[1.0, 2.0]'))")
    assert(one("select VECTOR_TO_STRING(small_vec) from tv where id = 1")
      == "[1, 2]")
    engine.query("UPDATE tv SET small_vec = " +
      "STRING_TO_VECTOR('[10.0, 20.0]') WHERE id = 1")
    assert(one("select VECTOR_TO_STRING(small_vec) from tv where id = 1")
      == "[10, 20]")
    // hex-literal insert: [10.0, 10.0]
    engine.query("INSERT INTO tv VALUES (3, 0x0000204100002041)")
    assert(one("select VECTOR_TO_STRING(small_vec) from tv where id = 3")
      == "[10, 10]")
    // bare string payload: MySQL type error (explicit conversion needed)
    assert(intercept[IllegalArgumentException] {
      engine.query("INSERT INTO tv VALUES (4, '[1.0, 2.0]')")
    }.getMessage.contains("cannot be converted to 'vector'"))
    // dimension mismatches
    assert(intercept[IllegalArgumentException] {
      engine.query("INSERT INTO tv VALUES (5, STRING_TO_VECTOR('[1.0]'))")
    }.getMessage.contains("VECTOR dimension mismatch: expected 2, got 1"))
    assert(intercept[IllegalArgumentException] {
      engine.query(
        "INSERT INTO tv VALUES (5, STRING_TO_VECTOR('[1.0, 2.0, 3.0]'))")
    }.getMessage.contains("VECTOR dimension mismatch: expected 2, got 3"))
    // strict conversion errors out of STRING_TO_VECTOR itself
    assert(intercept[Exception] {
      engine.query(
        "INSERT INTO tv VALUES (6, STRING_TO_VECTOR('[1.0, invalid]'))")
        .collect()
    }.getMessage.contains("can't convert JSON to vector"))
    assert(intercept[Exception] {
      engine.query(
        "INSERT INTO tv VALUES (6, STRING_TO_VECTOR('invalid_json'))")
        .collect()
    }.getMessage.contains("can't convert JSON to vector"))
    assert(intercept[Exception] {
      engine.query("INSERT INTO tv VALUES (6, " +
        "STRING_TO_VECTOR('[1.0, \"not an array\"]'))").collect()
    }.getMessage.contains("array contained string"))
    assert(intercept[Exception] {
      engine.query("INSERT INTO tv VALUES (6, " +
        "STRING_TO_VECTOR('\"not an array\"'))").collect()
    }.getMessage.contains("expected array, got string"))
    assert(intercept[Exception] {
      engine.query("INSERT INTO tv VALUES (6, STRING_TO_VECTOR('[1e40]'))")
        .collect()
    }.getMessage.contains(
      "data cannot be converted to a valid vector: 1e+40"))
    // negative dimension is a syntax error
    assert(intercept[IllegalArgumentException] {
      engine.query("CREATE TABLE tverr (id INT PRIMARY KEY, v VECTOR(-3))")
    }.getMessage.toLowerCase.contains("syntax"))
    engine.query("drop table tv")
  }

  test("CREATE VECTOR INDEX: single vector/json column only " +
      "(vector_index_queries.go error rows)") {
    engine.runScript(
      """drop table if exists vidx;
        |create table vidx (id int primary key, j json, v vector(2));
        |insert into vidx values (1, '[4.0,3.0]',
        |  STRING_TO_VECTOR('[4.0,3.0]'));
        |""".stripMargin)
    engine.query("create vector index v_idx on vidx(v)")
    assert(engine.showIndex("vidx").exists(_._2 == "v_idx"))
    assert(intercept[IllegalArgumentException] {
      engine.query("create vector index v_idx2 on vidx(j, v)")
    }.getMessage.contains("exactly one column"))
    assert(intercept[IllegalArgumentException] {
      engine.query("create vector index v_idx2 on vidx(id)")
    }.getMessage.toLowerCase.contains("vector index"))
    // ordering by distance over the declared vector column still works
    engine.query(
      "insert into vidx values (2, '[0.0,0.0]', STRING_TO_VECTOR('[0.0,0.0]'))")
    assert(rows("select id from vidx order by VEC_DISTANCE(" +
      "STRING_TO_VECTOR('[0.0,0.0]'), v)") == Seq(Seq(2), Seq(1)))
    engine.query("drop table vidx")
  }
}
