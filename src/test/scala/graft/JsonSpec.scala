package graft

import graft.functions.{json => gj}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** MySQL-documented examples for the JSON function family (reference:
  * sql/expression/function/json/ behavior, MySQL 8.0 JSON function docs). */
class JsonSpec extends AnyFunSuite {
  import SparkSpec.spark

  private def one[T](c: org.apache.spark.sql.Column): T =
    spark.range(1).select(c.as("v")).collect()(0).getAs[T]("v")

  private val doc = """{"a":1,"b":[2,3],"c":{"d":"x"}}"""

  test("json_extract navigates keys, quoted keys, and array indices") {
    assert(one[String](gj.jsonExtract(lit(doc), lit("$.a"))) == "1")
    assert(one[String](gj.jsonExtract(lit(doc), lit("$.b[1]"))) == "3")
    assert(one[String](gj.jsonExtract(lit(doc), lit("$.c.d"))) == "\"x\"")
    assert(one[String](gj.jsonExtract(lit("""{"a b":7}"""), lit("$.\"a b\""))) == "7")
    assert(one[Any](gj.jsonExtract(lit(doc), lit("$.zz"))) == null)
    assert(one[Any](gj.jsonExtract(lit(doc), lit("bad path"))) == null)
  }

  test("json_extract wildcard paths: [*], .*, **, last, ranges, multi-path") {
    val store = """{"s":{"b":[{"p":1,"t":"a"},{"p":2,"t":"b"}],"v":{"p":3}}}"""
    // [*] over arrays; wildcard results always wrap in an array
    assert(one[String](gj.jsonExtract(lit(store), lit("$.s.b[*].p"))) == "[1,2]")
    // .* over object members (document order)
    assert(one[String](gj.jsonExtract(lit(store), lit("$.s.v.*"))) == "[3]")
    assert(one[String](gj.jsonExtract(lit(doc), lit("$.*")))
      == """[1,[2,3],{"d":"x"}]""")
    // ** recursive descent, any depth
    assert(one[String](gj.jsonExtract(lit(store), lit("$**.p"))) == "[1,2,3]")
    assert(one[String](gj.jsonExtract(lit(store), lit("$**.t"))) == """["a","b"]""")
    // trailing ** is malformed
    assert(one[Any](gj.jsonExtract(lit(store), lit("$**"))) == null)
    // [last] / [last-N] single-match forms do NOT wrap
    assert(one[String](gj.jsonExtract(lit("[10,20,30]"), lit("$[last]"))) == "30")
    assert(one[String](gj.jsonExtract(lit("[10,20,30]"), lit("$[last-2]"))) == "10")
    // ranges wrap and clip; bounds may be last-relative
    assert(one[String](gj.jsonExtract(lit("[10,20,30]"), lit("$[0 to 1]"))) == "[10,20]")
    assert(one[String](gj.jsonExtract(lit("[10,20,30]"), lit("$[1 to last]"))) == "[20,30]")
    // MySQL autowrap: a scalar behaves as a one-element array at [0]
    assert(one[String](gj.jsonExtract(lit("7"), lit("$[0]"))) == "7")
    assert(one[Any](gj.jsonExtract(lit("7"), lit("$[1]"))) == null)
    // multiple paths concatenate and wrap; empty match set is NULL
    assert(one[String](gj.jsonExtract(lit(doc), lit("$.a"), lit("$.c.d")))
      == """[1,"x"]""")
    assert(one[Any](gj.jsonExtract(lit(doc), lit("$.zz[*]"))) == null)
    // wildcard paths are rejected in write context (error -> null)
    assert(one[Any](gj.jsonSet(lit(doc), lit("$.b[*]"), lit(9))) == null)
  }

  test("json_array / json_object constructors and json_value") {
    assert(one[String](gj.jsonArray(lit(1), lit("a"), lit(2.5)))
      == """[1,"a",2.5]""")
    assert(one[String](gj.jsonArray(lit(1), lit(null).cast("int")))
      == "[1,null]")
    assert(one[String](gj.jsonObject(lit("k"), lit(1), lit("s"), lit("x")))
      == """{"k":1,"s":"x"}""")
    assert(one[Any](gj.jsonObject(lit(null).cast("string"), lit(1))) == null)
    assert(one[String](gj.jsonValue(lit(doc), lit("$.c.d"))) == "x") // unquoted
    assert(one[String](gj.jsonValue(lit(doc), lit("$.a"))) == "1")
    assert(one[Any](gj.jsonValue(lit(doc), lit("$.zz"))) == null)
  }

  test("json_array_append / json_array_insert follow MySQL examples") {
    val d = """{"a":[1,2],"b":3}"""
    assert(one[String](gj.jsonArrayAppend(lit(d), lit("$.a"), lit(9)))
      == """{"a":[1,2,9],"b":3}""")
    // appending to a scalar autowraps it
    assert(one[String](gj.jsonArrayAppend(lit(d), lit("$.b"), lit(9)))
      == """{"a":[1,2],"b":[3,9]}""")
    assert(one[String](gj.jsonArrayInsert(lit(d), lit("$.a[1]"), lit(9)))
      == """{"a":[1,9,2],"b":3}""")
    // insert past the end appends; non-index path is an error -> NULL
    assert(one[String](gj.jsonArrayInsert(lit(d), lit("$.a[9]"), lit(7)))
      == """{"a":[1,2,7],"b":3}""")
    assert(one[Any](gj.jsonArrayInsert(lit(d), lit("$.a"), lit(7))) == null)
  }

  test("json_contains_path sees wildcard matches") {
    val store = """{"s":{"b":[{"p":1},{"p":2}]}}"""
    assert(one[Boolean](gj.jsonContainsPath(lit(store), lit("one"), lit("$**.p"))))
    assert(one[Boolean](gj.jsonContainsPath(lit(store), lit("all"),
      lit("$.s.b[*].p"), lit("$.s.b[last].p"))))
    assert(!one[Boolean](gj.jsonContainsPath(lit(store), lit("one"), lit("$**.zz"))))
  }

  test("json_set / insert / replace follow MySQL mode rules") {
    assert(one[String](gj.jsonSet(lit(doc), lit("$.a"), lit(9)))
      == """{"a":9,"b":[2,3],"c":{"d":"x"}}""")
    assert(one[String](gj.jsonSet(lit(doc), lit("$.e"), lit("new")))
      == """{"a":1,"b":[2,3],"c":{"d":"x"},"e":"new"}""")
    // insert never overwrites; replace never creates
    assert(one[String](gj.jsonInsert(lit(doc), lit("$.a"), lit(9))) == doc)
    assert(one[String](gj.jsonReplace(lit(doc), lit("$.e"), lit(9))) == doc)
    // array index past end appends (MySQL)
    assert(one[String](gj.jsonSet(lit("[1,2]"), lit("$[5]"), lit(3))) == "[1,2,3]")
  }

  test("json_remove drops keys and array elements") {
    assert(one[String](gj.jsonRemove(lit(doc), lit("$.b")))
      == """{"a":1,"c":{"d":"x"}}""")
    assert(one[String](gj.jsonRemove(lit("[1,2,3]"), lit("$[1]"))) == "[1,3]")
    assert(one[String](gj.jsonRemove(lit(doc), lit("$.zz"))) == doc)
  }

  test("json_merge_patch is RFC 7396; merge_preserve concatenates") {
    assert(one[String](gj.jsonMergePatch(lit("""{"a":1,"b":2}"""), lit("""{"b":null,"c":3}""")))
      == """{"a":1,"c":3}""")
    assert(one[String](gj.jsonMergePatch(lit("""{"a":{"x":1}}"""), lit("""{"a":{"y":2}}""")))
      == """{"a":{"x":1,"y":2}}""")
    assert(one[String](gj.jsonMergePreserve(lit("""{"a":1}"""), lit("""{"a":2}""")))
      == """{"a":[1,2]}""")
    assert(one[String](gj.jsonMergePreserve(lit("[1,2]"), lit("[3]"))) == "[1,2,3]")
  }

  test("json_keys / length / depth / type") {
    assert(one[String](gj.jsonKeys(lit(doc))) == """["a","b","c"]""")
    assert(one[Any](gj.jsonKeys(lit("[1]"))) == null)
    assert(one[Int](gj.jsonLength(lit(doc))) == 3)
    assert(one[Int](gj.jsonLength(lit("[1,2,3,4]"))) == 4)
    assert(one[Int](gj.jsonLength(lit("\"str\""))) == 1)
    assert(one[Int](gj.jsonDepth(lit("{}"))) == 1)
    assert(one[Int](gj.jsonDepth(lit(doc))) == 3)
    assert(one[String](gj.jsonType(lit(doc))) == "OBJECT")
    assert(one[String](gj.jsonType(lit("[1]"))) == "ARRAY")
    assert(one[String](gj.jsonType(lit("1.5"))) == "DOUBLE")
    assert(one[String](gj.jsonType(lit("7"))) == "INTEGER")
    assert(one[String](gj.jsonType(lit("\"s\""))) == "STRING")
    assert(one[String](gj.jsonType(lit("true"))) == "BOOLEAN")
    assert(one[String](gj.jsonType(lit("null"))) == "NULL")
  }

  test("json_valid / quote / unquote") {
    assert(one[Boolean](gj.jsonValid(lit(doc))))
    assert(!one[Boolean](gj.jsonValid(lit("{bad"))))
    assert(one[String](gj.jsonQuote(lit("""a"b"""))) == """"a\"b"""")
    assert(one[String](gj.jsonUnquote(lit("\"abc\""))) == "abc")
    assert(one[String](gj.jsonUnquote(lit("[1]"))) == "[1]") // non-string passthrough
  }

  test("json_contains follows MySQL containment semantics") {
    assert(one[Boolean](gj.jsonContains(lit("[1,2,3]"), lit("2"))))
    assert(one[Boolean](gj.jsonContains(lit("[1,2,3]"), lit("[1,3]"))))
    assert(!one[Boolean](gj.jsonContains(lit("[1,2,3]"), lit("[1,9]"))))
    assert(one[Boolean](gj.jsonContains(lit("""{"a":1,"b":2}"""), lit("""{"a":1}"""))))
    assert(!one[Boolean](gj.jsonContains(lit("""{"a":1}"""), lit("""{"a":2}"""))))
    // numeric equality is value-based: 2 contains 2.0
    assert(one[Boolean](gj.jsonContains(lit("[2]"), lit("2.0"))))
  }

  test("json_contains_path one/all") {
    assert(one[Boolean](gj.jsonContainsPath(lit(doc), lit("one"), lit("$.zz"), lit("$.a"))))
    assert(!one[Boolean](gj.jsonContainsPath(lit(doc), lit("all"), lit("$.zz"), lit("$.a"))))
    assert(one[Boolean](gj.jsonContainsPath(lit(doc), lit("all"), lit("$.a"), lit("$.c.d"))))
  }

  test("json_search returns quoted path of first LIKE match") {
    assert(one[String](gj.jsonSearch(lit("""{"a":"abc","b":["xyz","abc"]}"""),
      lit("one"), lit("abc"))) == "\"$.a\"")
    assert(one[String](gj.jsonSearch(lit("""{"b":["xyz","abc"]}"""),
      lit("one"), lit("a%"))) == "\"$.b[1]\"")
    assert(one[Any](gj.jsonSearch(lit(doc), lit("one"), lit("nope"))) == null)
  }

  test("json_overlaps follows MySQL 8.0.17 semantics") {
    assert(one[Boolean](gj.jsonOverlaps(lit("[1,3,5,7]"), lit("[2,5,7]"))))
    assert(!one[Boolean](gj.jsonOverlaps(lit("[1,3]"), lit("[2,4]"))))
    assert(one[Boolean](gj.jsonOverlaps(lit("""{"a":1,"b":2}"""), lit("""{"c":3,"b":2}"""))))
    assert(!one[Boolean](gj.jsonOverlaps(lit("""{"a":1}"""), lit("""{"a":2}"""))))
    assert(one[Boolean](gj.jsonOverlaps(lit("[1,2]"), lit("2"))))
    assert(one[Boolean](gj.jsonOverlaps(lit("5"), lit("5"))))
    assert(!one[Boolean](gj.jsonOverlaps(lit("5"), lit("6"))))
  }

  test("json_pretty renders MySQL 2-space style") {
    assert(one[String](gj.jsonPretty(lit("""{"k":69}""")))
      == "{\n  \"k\": 69\n}")
    assert(one[String](gj.jsonPretty(lit("[1,2]"))) == "[\n  1,\n  2\n]")
    assert(one[String](gj.jsonPretty(lit("{}"))) == "{}")
  }

  test("SQL registration exposes the family on the session") {
    val e = new Engine(spark)
    val r = e.query("""SELECT json_set('{"a":1}', '$.b', 2) AS s,
                              json_type('[1]') AS t,
                              json_keys('{"x":1,"y":2}') AS k""").collect()(0)
    assert(r.getString(0) == """{"a":1,"b":2}""")
    assert(r.getString(1) == "ARRAY")
    assert(r.getString(2) == """["x","y"]""")
  }

  test("json_schema_valid: draft-4 keyword subset") {
    def valid(schema: String, doc: String): Boolean =
      one[Boolean](gj.jsonSchemaValid(lit(schema), lit(doc)))
    // MySQL doc example: geo point with required + range
    val geo = """{"id":"http://json-schema.org/geo","type":"object",
      "properties":{"latitude":{"type":"number","minimum":-90,"maximum":90},
                    "longitude":{"type":"number","minimum":-180,"maximum":180}},
      "required":["latitude","longitude"]}"""
    assert(valid(geo, """{"latitude":63.444697,"longitude":10.445118}"""))
    assert(!valid(geo, """{"latitude":63.444697,"longitude":310.44}"""))
    assert(!valid(geo, """{"latitude":63.444697}"""))
    // type / enum / string facets
    assert(valid("""{"type":"integer"}""", "7"))
    assert(!valid("""{"type":"integer"}""", "7.5"))
    assert(valid("""{"type":"number"}""", "7")) // integer is a number
    assert(valid("""{"enum":["a","b"]}""", "\"a\""))
    assert(!valid("""{"enum":["a","b"]}""", "\"c\""))
    assert(valid("""{"type":"string","minLength":2,"pattern":"^ab"}""", "\"abc\""))
    assert(!valid("""{"type":"string","maxLength":2}""", "\"abc\""))
    // arrays: items + uniqueItems + bounds
    assert(valid("""{"type":"array","items":{"type":"integer"},"minItems":2}""", "[1,2]"))
    assert(!valid("""{"type":"array","items":{"type":"integer"}}""", """[1,"x"]"""))
    assert(!valid("""{"type":"array","uniqueItems":true}""", "[1,1]"))
    // draft-4 boolean exclusives
    assert(!valid("""{"minimum":5,"exclusiveMinimum":true}""", "5"))
    assert(valid("""{"minimum":5}""", "5"))
    assert(!valid("""{"multipleOf":3}""", "7"))
    // combinators + additionalProperties
    assert(valid("""{"anyOf":[{"type":"string"},{"type":"integer"}]}""", "3"))
    assert(!valid("""{"not":{"type":"integer"}}""", "3"))
    assert(!valid("""{"properties":{"a":{}},"additionalProperties":false}""",
      """{"a":1,"b":2}"""))
    // nested property failure
    assert(!valid("""{"properties":{"o":{"properties":{"n":{"type":"string"}}}}}""",
      """{"o":{"n":5}}"""))
  }

  test("json_schema_validation_report pins MySQL's report shape") {
    def report(schema: String, doc: String): String =
      one[String](gj.jsonSchemaValidationReport(lit(schema), lit(doc)))
    assert(report("""{"type":"object"}""", """{"a":1}""") == """{"valid":true}""")
    val r = report(
      """{"properties":{"latitude":{"minimum":-90,"maximum":90}}}""",
      """{"latitude":120}""")
    assert(r.contains(""""valid":false"""))
    assert(r.contains(""""schema-location":"#/properties/latitude""""))
    assert(r.contains(""""document-location":"#/latitude""""))
    assert(r.contains(""""schema-failed-keyword":"maximum""""))
    assert(r.contains("failed requirement 'maximum' at JSON Schema location"))
    // invalid schema errors loudly (MySQL ER_INVALID_JSON_TYPE)
    val e = new Engine(spark)
    assertThrows[Exception] {
      e.query("SELECT json_schema_valid('[1]', '{}')").collect()
    }
    // SQL names registered
    assert(e.query(
      """SELECT json_schema_valid('{"type":"array"}', '[1]') AS v""")
      .collect()(0).getBoolean(0))
  }

  test("-> and ->> JSON path operators (json_scripts.go:724)") {
    val e = new Engine(spark)
    e.runScript(
      """create table jarr (pk int primary key, col1 JSON, col2 JSON);
        |insert into jarr values (1, JSON_OBJECT('key1', 1, 'key2', '"abc"'), JSON_ARRAY(3,10,5,17,"z"));
        |insert into jarr values (2, JSON_OBJECT('key1', 100, 'key2', 'ghi'), JSON_ARRAY(3,10,5,17,JSON_ARRAY(22,"y",66)));
        |CREATE TABLE jarr2 (i INT PRIMARY KEY, j JSON);
        |INSERT INTO jarr2 VALUES (0, '{"a": "123", "outer": {"inner": 456}}');""".stripMargin)
    def col0(sql: String): Seq[Any] =
      e.query(sql).collect().map(_.get(0)).toSeq
    assert(col0("select col1->'$.key1' from jarr order by pk") ==
      Seq("1", "100"))
    assert(col0("select col1->>'$.key2' from jarr order by pk") ==
      Seq("\"abc\"", "ghi"))
    assert(col0("select pk from jarr where col1->'$.key1' = 1") == Seq(1))
    assert(col0("""select pk from jarr where col1->>'$.key2' = '"abc"'""") ==
      Seq(1))
    assert(col0("select pk from jarr where col1->>'$.key2' = 'def'").isEmpty)
    // double-quoted paths and array indices
    assert(col0("""SELECT col2->"$[3]" FROM jarr order by pk""") ==
      Seq("17", "17"))
    assert(col0("""SELECT col2->>"$[4]" FROM jarr where pk=1""") == Seq("z"))
    // operator over a derived-table alias
    assert(col0("""SELECT k->"$.inner" from (SELECT j->"$.outer" AS k FROM jarr2) sq""") ==
      Seq("456"))
    e.runScript("drop table jarr; drop table jarr2")
  }

  test("json_value return types and json_length over table JSON " +
      "(json_scripts.go:274-390)") {
    val e = new Engine(SparkSpec.spark)
    def col0(sql: String): Seq[Any] =
      e.query(sql).collect().map(_.get(0)).toSeq
    e.runScript(
      """CREATE TABLE jxy (x bigint primary key, y JSON);
        |INSERT INTO jxy VALUES (0, CAST('["a", "b"]' AS JSON)), (1, CAST('["a", "b", "c", "d"]' AS JSON));
        |INSERT INTO jxy VALUES (2, CAST('{"a": [{"b": 1}, {"c": 2}]}' AS JSON)), (3, CAST('{"a": {"b": ["c","d"]}}' AS JSON)), (4,NULL);
        |""".stripMargin)
    assert(col0("select json_value(y, '$.a[0].b', 'signed') from jxy where x = 2")
      == Seq(1L))
    assert(col0("select json_value(y, '$.a[0].b') from jxy where x = 2")
      == Seq("1"))
    // RETURNING JSON keeps the raw subtree
    assert(col0("select json_value(y, '$.a', 'json') from jxy where x = 2")
      .map(_.toString.replaceAll("\\s", "")) == Seq("""[{"b":1},{"c":2}]"""))
    assert(col0("select json_length(y) from jxy order by x") ==
      Seq(2, 4, 1, 1, null))
    assert(col0("select json_length(json_extract(y, '$.a')) from jxy order by x")
      == Seq(null, null, 2, 1, null))
    assert(col0("select json_length(json_extract(y, '$.a.b')) from jxy where x = 3")
      == Seq(2))
    assert(col0("select json_length(y, '$.a.b') from jxy where x = 3") ==
      Seq(2))
    assert(col0("select json_length(y, '$.a[0].b') from jxy where x = 2") ==
      Seq(1))
    assert(col0("select json_length(cast('[]' as json))") == Seq(0))
    assert(col0("select json_length(cast('{}' as json))") == Seq(0))
    assert(col0("select json_length(cast('null' as json))") == Seq(1))
    assert(col0("select json_length(cast('{\"a\": []}' as json), '$.a')") ==
      Seq(0))
    e.query("drop table jxy")
  }
}
