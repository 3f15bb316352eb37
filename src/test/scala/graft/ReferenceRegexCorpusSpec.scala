package graft

import org.scalatest.funsuite.AnyFunSuite

/** Regexp-function Query/Expected pairs ported verbatim from the
  * reference corpus (enginetest/queries/regex_queries.go) over the same
  * mytable / tests fixtures (enginetest/engine_only_test.go:728).
  * Pins the MySQL argument surface Spark's builtins lack: match_type
  * flag composition (last of c/i wins), collation-driven default case
  * sensitivity, REGEXP_INSTR position/occurrence/return_option, and
  * REGEXP_REPLACE position/occurrence slicing.
  */
class ReferenceRegexCorpusSpec extends AnyFunSuite {
  import SparkSpec.spark
  import spark.implicits._

  private lazy val engine: Engine = {
    Seq((1L, "first row"), (2L, "second row"), (3L, "third row"))
      .toDF("i", "s").createOrReplaceTempView("mytable")
    // engine_only_test.go:728 regex fixture
    Seq((1, "testing", "TESTING", "ci"))
      .toDF("pk", "str", "pattern", "flags").createOrReplaceTempView("tests")
    new Engine(spark)
  }

  private def norm(v: Any): Any = v match {
    case null => null
    case b: Byte => BigDecimal(b.toInt)
    case s: Short => BigDecimal(s.toInt)
    case i: Int => BigDecimal(i)
    case l: Long => BigDecimal(l)
    case b: Boolean => BigDecimal(if (b) 1 else 0)
    case f: Float => BigDecimal(f.toDouble)
    case d: Double => BigDecimal(d)
    case d: java.math.BigDecimal => BigDecimal(d)
    case other => other
  }

  private def check(sql: String, expected: Seq[Seq[Any]]): Unit = {
    val got = engine.query(sql).collect()
      .map(r => (0 until r.length).map(i => norm(r.get(i))).toSeq).toSeq
    val want = expected.map(_.map(norm))
    val ordered = sql.toLowerCase.contains("order by")
    val (g, w) =
      if (ordered) (got, want)
      else (got.sortBy(GoNorm.sortKeyRow), want.sortBy(GoNorm.sortKeyRow))
    assert(g == w, s"\nquery: $sql\ngot:  $g\nwant: $w")
  }

  private def one(sql: String, expected: Any): Unit =
    check(sql, Seq(Seq(expected)))

  test("REGEXP_LIKE flag composition (regex_queries.go:40-58)") {
    one("SELECT REGEXP_LIKE('testing', 'TESTING')", 0)
    one("SELECT REGEXP_LIKE('testing', 'TESTING', 'c')", 0)
    one("SELECT REGEXP_LIKE('testing', 'TESTING', 'i')", 1)
    one("SELECT REGEXP_LIKE('testing', 'TESTING', 'ci')", 1)
    one("SELECT REGEXP_LIKE('testing', 'TESTING', 'ic')", 0)
  }

  test("REGEXP_LIKE over columns (regex_queries.go:60,80)") {
    one("SELECT REGEXP_LIKE(str, pattern, flags) from tests", 1)
    check("SELECT i, s, REGEXP_LIKE(s, '[a-z]+d row') FROM mytable",
      Seq(Seq(1L, "first row", 0), Seq(2L, "second row", 1),
        Seq(3L, "third row", 1)))
  }

  test("REGEXP_LIKE collation-driven default (regex_queries.go:64-72)") {
    one("SELECT REGEXP_LIKE('testing', 'TESTING' COLLATE utf8mb4_0900_ai_ci)", 1)
    one("SELECT REGEXP_LIKE('testing', 'TESTING' COLLATE utf8mb4_0900_as_cs)", 0)
    check("SELECT REGEXP_LIKE('testing' COLLATE utf8mb4_0900_ai_ci, 'TESTING') FROM mytable",
      Seq(Seq(1), Seq(1), Seq(1)))
  }

  test("REGEXP_REPLACE argument surface (regex_queries.go:88-120)") {
    one("""SELECT REGEXP_REPLACE("0123456789", "[0-4]", "X")""", "XXXXX56789")
    one("""SELECT REGEXP_REPLACE("0123456789", "[0-4]", "X", 2)""", "0XXXX56789")
    one("""SELECT REGEXP_REPLACE("0123456789", "[0-4]", "X", 2, 2)""", "01X3456789")
    one("""SELECT REGEXP_REPLACE("TEST test TEST", "[a-z]", "X", 1, 0, "i")""",
      "XXXX XXXX XXXX")
    one("""SELECT REGEXP_REPLACE("TEST test TEST", "[a-z]", "X", 1, 0, "c")""",
      "TEST XXXX TEST")
    one("""SELECT REGEXP_REPLACE(CONCAT("abc123"), "[0-4]", "X")""", "abcXXX")
    check("""SELECT * FROM mytable WHERE s LIKE REGEXP_REPLACE("123456%r1o2w", "[0-9]", "")""",
      Seq(Seq(1L, "first row"), Seq(2L, "second row"), Seq(3L, "third row")))
    check("""SELECT REGEXP_REPLACE(s, "[a-z]", "X") from mytable""",
      Seq(Seq("XXXXX XXX"), Seq("XXXXXX XXX"), Seq("XXXXX XXX")))
  }

  test("numeric REGEXP operator (regex_queries.go:124-130)") {
    one("SELECT 20 REGEXP '^[-]?2[0-9]+$'", 1)
    one("SELECT 30 REGEXP '^[-]?2[0-9]+$'", 0)
  }

  test("REGEXP_INSTR position/occurrence/return_option (regex_queries.go:2116-2144)") {
    one("SELECT REGEXP_INSTR('dog cat dog', 'dog')", 1)
    one("SELECT REGEXP_INSTR('dog cat dog', 'doggo')", 0)
    one("SELECT REGEXP_INSTR('dog cat dog', 'dog', 2)", 9)
    one("SELECT REGEXP_INSTR('dog cat dog', 'dog', 1, 2)", 9)
    one("SELECT REGEXP_INSTR('aa aaa aaaa', 'a{2}')", 1)
    one("SELECT REGEXP_INSTR('aa aaa aaaa', 'a{4}')", 8)
    one("SELECT REGEXP_INSTR('dog cat dog', 'dog', 1, -1, 0)", 1)
    one("SELECT REGEXP_INSTR('dog cat dog', 'dog', 1, 1, 1)", 4)
  }

  test("REGEXP_SUBSTR position/occurrence (regex_queries.go:2148-2160)") {
    one("SELECT REGEXP_SUBSTR('abc def ghi', '[a-z]+')", "abc")
    one("SELECT REGEXP_SUBSTR('abc def ghi', '[a-z]+', 1, 3)", "ghi")
    one("SELECT REGEXP_SUBSTR('abc def ghi', '[a-z]+', 2, 2)", "def")
    one("SELECT REGEXP_SUBSTR('abc def ghi', '[j-z]+')", null)
  }

  test("NULL propagation and bad flags") {
    one("SELECT REGEXP_LIKE(NULL, 'a')", null)
    one("SELECT REGEXP_LIKE('a', NULL)", null)
    one("SELECT REGEXP_SUBSTR(NULL, 'a')", null)
    val err = intercept[Exception] {
      engine.query("SELECT REGEXP_LIKE('a', 'a', 'z')").collect()
    }
    assert(err.getMessage.contains("3692") ||
      Option(err.getCause).exists(_.getMessage.contains("3692")),
      s"expected MySQL 3692 flag error, got: ${err.getMessage}")
  }
}
