package graft

import org.scalatest.funsuite.AnyFunSuite

/** Scalar-function Query/Expected pairs ported verbatim from the
  * reference's enginetest corpus (enginetest/queries/function_queries.go)
  * over the same mytable fixture. Pins TRUNCATE precision/coercion,
  * INSERT() position/length edge cases, EXPORT_SET/MAKE_SET bit
  * rendering, TRIM grammar forms, and TIMESTAMPDIFF unit arithmetic —
  * the reference behaviors a MySQL user actually leans on. Comparison is
  * type-loose on numerics (norm), order-sensitive only when ordered.
  */
class ReferenceFunctionCorpusSpec extends AnyFunSuite {
  import SparkSpec.spark
  import spark.implicits._

  private lazy val engine: Engine = {
    Seq((1L, "first row"), (2L, "second row"), (3L, "third row"))
      .toDF("i", "s").createOrReplaceTempView("mytable")
    // setup_data.sg.go:3908 typestable (the date/timestamp columns)
    Seq((1L, java.sql.Timestamp.valueOf("2019-12-31 12:00:00"),
      java.sql.Date.valueOf("2019-12-31")))
      .toDF("id", "ti", "da").createOrReplaceTempView("typestable")
    new Engine(spark)
  }

  private def norm(v: Any): Any = v match {
    case null => null
    case b: Byte => BigDecimal(b.toInt)
    case s: Short => BigDecimal(s.toInt)
    case i: Int => BigDecimal(i)
    case l: Long => BigDecimal(l)
    case f: Float => BigDecimal(f.toDouble)
    case d: Double => BigDecimal(d)
    case d: java.math.BigDecimal => BigDecimal(d)
    case a: Array[Byte] => a.toSeq
    case s: String => s
    // java8 datetime API (SparkSpec) and legacy expectation objects
    // meet at GoNorm's canonical display strings
    case d: java.sql.Date => GoNorm.norm(d)
    case t: java.sql.Timestamp => GoNorm.norm(t)
    case d: java.time.LocalDate => GoNorm.norm(d)
    case t: java.time.LocalDateTime => GoNorm.norm(t)
    case t: java.time.Instant => GoNorm.norm(t)
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

  test("TRUNCATE precision cases (function_queries.go:32-158)") {
    one("SELECT TRUNCATE(1.223,1)", BigDecimal("1.2"))
    one("SELECT TRUNCATE(1.999,1)", BigDecimal("1.9"))
    one("SELECT TRUNCATE(1.999,0)", BigDecimal(1))
    one("SELECT TRUNCATE(-1.999,1)", BigDecimal("-1.9"))
    one("SELECT TRUNCATE(122,-2)", BigDecimal(100))
    one("SELECT TRUNCATE(10.28*100,0)", BigDecimal(1028))
    one("SELECT TRUNCATE(NULL,1)", null)
    one("SELECT TRUNCATE(1.223,NULL)", null)
    one("SELECT TRUNCATE(0.5,0)", BigDecimal(0))
    one("SELECT TRUNCATE(-0.5,0)", BigDecimal(0))
    one("SELECT TRUNCATE(1.223,100)", BigDecimal("1.223"))
    one("SELECT TRUNCATE(1.223,-100)", BigDecimal(0))
  }

  test("INSERT string function cases (function_queries.go:256-370)") {
    one("""SELECT INSERT("Quadratic", 3, 4, "What")""", "QuWhattic")
    one("""SELECT INSERT("hello", 2, 2, "xyz")""", "hxyzlo")
    one("""SELECT INSERT("hello", 1, 2, "xyz")""", "xyzllo")
    one("""SELECT INSERT("hello", 5, 1, "xyz")""", "hellxyz")
    one("""SELECT INSERT("hello", 1, 5, "world")""", "world")
    one("""SELECT INSERT("hello", 3, 10, "world")""", "heworld")
    one("""SELECT INSERT("hello", 2, 2, "")""", "hlo")
    one("""SELECT INSERT("hello", 3, 0, "xyz")""", "hexyzllo")
    one("""SELECT INSERT("hello", 0, 2, "xyz")""", "hello")
    one("""SELECT INSERT("hello", -1, 2, "xyz")""", "hello")
    one("""SELECT INSERT("hello", 1, -1, "xyz")""", "xyz")
    one("""SELECT INSERT("hello", 3, -1, "xyz")""", "hexyz")
    one("""SELECT INSERT("hello", 2, 100, "xyz")""", "hxyz")
    one("""SELECT INSERT("hello", 10, 2, "xyz")""", "hello")
    one("""SELECT INSERT("", 1, 2, "xyz")""", "")
    one("""SELECT INSERT(NULL, 1, 2, "xyz")""", null)
    one("""SELECT INSERT("hello", NULL, 2, "xyz")""", null)
    one("""SELECT INSERT("hello", 1, NULL, "xyz")""", null)
    one("""SELECT INSERT("hello", 1, 2, NULL)""", null)
    check("""SELECT INSERT(s, 1, 5, "new") FROM mytable ORDER BY i""",
      Seq(Seq("new row"), Seq("newd row"), Seq("new row")))
    check("""SELECT INSERT(s, i, 2, "XY") FROM mytable ORDER BY i""",
      Seq(Seq("XYrst row"), Seq("sXYond row"), Seq("thXYd row")))
    check("""SELECT INSERT(s, i + 1, i, UPPER(s)) FROM mytable ORDER BY i""",
      Seq(Seq("fFIRST ROWrst row"), Seq("seSECOND ROWnd row"),
        Seq("thiTHIRD ROWrow")))
  }

  test("EXPORT_SET bit-rendering cases (function_queries.go:436-520)") {
    one("""SELECT EXPORT_SET(5, "Y", "N", ",", 4)""", "Y,N,Y,N")
    one("""SELECT EXPORT_SET(6, "1", "0", ",", 10)""", "0,1,1,0,0,0,0,0,0,0")
    one("""SELECT EXPORT_SET(0, "1", "0", ",", 4)""", "0,0,0,0")
    one("""SELECT EXPORT_SET(15, "1", "0", ",", 4)""", "1,1,1,1")
    one("""SELECT EXPORT_SET(1, "T", "F", ",", 3)""", "T,F,F")
    one("""SELECT EXPORT_SET(5, "1", "0", "|", 4)""", "1|0|1|0")
    one("""SELECT EXPORT_SET(5, "1", "0", "", 4)""", "1010")
    one("""SELECT EXPORT_SET(255, "1", "0", ",", 8)""", "1,1,1,1,1,1,1,1")
    one("""SELECT EXPORT_SET(1024, "1", "0", ",", 12)""",
      "0,0,0,0,0,0,0,0,0,0,1,0")
    one("""SELECT EXPORT_SET(5, "1", "0", ",", 1)""", "1")
    one("""SELECT EXPORT_SET(-1, "1", "0", ",", 4)""", "1,1,1,1")
    one("""SELECT EXPORT_SET(NULL, "1", "0", ",", 4)""", null)
    one("""SELECT EXPORT_SET(5, NULL, "0", ",", 4)""", null)
    one("""SELECT EXPORT_SET(5, "1", NULL, ",", 4)""", null)
    one("""SELECT EXPORT_SET(5, "1", "0", NULL, 4)""", null)
    one("""SELECT EXPORT_SET(5, "1", "0", ",", NULL)""", null)
    check("""SELECT EXPORT_SET(i, "1", "0", ",", 4) FROM mytable ORDER BY i""",
      Seq(Seq("1,0,0,0"), Seq("0,1,0,0"), Seq("1,1,0,0")))
  }

  test("MAKE_SET bit-selection cases (function_queries.go:520-600)") {
    one("""SELECT MAKE_SET(1, "a", "b", "c")""", "a")
    one("""SELECT MAKE_SET(1 | 4, "hello", "nice", "world")""", "hello,world")
    one("""SELECT MAKE_SET(0, "a", "b", "c")""", "")
    one("""SELECT MAKE_SET(3, "a", "b", "c")""", "a,b")
    one("""SELECT MAKE_SET(5, "a", "b", "c")""", "a,c")
    one("""SELECT MAKE_SET(7, "a", "b", "c")""", "a,b,c")
    one("""SELECT MAKE_SET(1024, "a", "b", "c", "d", "e", "f", "g", "h", "i", "j", "k")""",
      "k")
    one("""SELECT MAKE_SET(1025, "a", "b", "c", "d", "e", "f", "g", "h", "i", "j", "k")""",
      "a,k")
    one("""SELECT MAKE_SET(7, "a", NULL, "c")""", "a,c")
    one("""SELECT MAKE_SET(7, NULL, "b", "c")""", "b,c")
    one("""SELECT MAKE_SET(NULL, "a", "b", "c")""", null)
    one("""SELECT MAKE_SET(-1, "a", "b", "c")""", "a,b,c")
    one("""SELECT MAKE_SET(16, "a", "b", "c")""", "")
    one("""SELECT MAKE_SET(3, "", "test", "")""", ",test")
    check("""SELECT MAKE_SET(i, "first", "second", "third") FROM mytable ORDER BY i""",
      Seq(Seq("first"), Seq("second"), Seq("first,second")))
  }

  test("TRIM grammar forms (function_queries.go TRIM block)") {
    check("SELECT TRIM(mytable.s) AS s FROM mytable",
      Seq(Seq("first row"), Seq("second row"), Seq("third row")))
    check("""SELECT TRIM("row" from mytable.s) AS s FROM mytable""",
      Seq(Seq("first "), Seq("second "), Seq("third ")))
    one("""SELECT TRIM("   foo   ")""", "foo")
    one("""SELECT TRIM(" " FROM "   foo   ")""", "foo")
    one("""SELECT TRIM(LEADING " " FROM "   foo   ")""", "foo   ")
    one("""SELECT TRIM(TRAILING " " FROM "   foo   ")""", "   foo")
    one("""SELECT TRIM(BOTH " " FROM "   foo   ")""", "foo")
    one("""SELECT TRIM("bar" FROM "barfoobar")""", "foo")
    one("""SELECT TRIM(TRAILING "bar" FROM "barfoobar")""", "barfoo")
    one("""SELECT TRIM(TRAILING "foo" FROM "foo")""", "")
    one("""SELECT TRIM(LEADING "ooo" FROM TRIM("oooo"))""", "o")
    one("""SELECT TRIM(BOTH "foo" FROM TRIM("barfoobar"))""", "barfoobar")
    one("""SELECT TRIM(LEADING "bar" FROM TRIM("foobar"))""", "foobar")
  }

  test("TIMESTAMPDIFF unit arithmetic (function_queries.go TIMESTAMPDIFF block)") {
    one("SELECT TIMESTAMPDIFF(SECOND,'2007-12-31 23:59:58', '2007-12-31 00:00:00')",
      -86398)
    one("SELECT TIMESTAMPDIFF(YEAR, DATE '2011-07-05', DATE '2026-07-04')", 14)
    one("SELECT TIMESTAMPDIFF(YEAR, DATE '2026-07-04', DATE '2011-07-05')", -14)
    one("SELECT TIMESTAMPDIFF(YEAR, DATE '2026-07-05', DATE '2026-07-04')", 0)
    one("SELECT TIMESTAMPDIFF(YEAR, DATE '2025-07-04', DATE '2026-07-03')", 0)
    one("SELECT TIMESTAMPDIFF(month, DATE '2011-07-05', DATE '2026-07-04')", 179)
    one("SELECT TIMESTAMPDIFF(month, DATE '2026-07-04', DATE '2011-07-05')", -179)
    one("""select timestampdiff(month, "2000-12-25", "2020-2-20")""", 229)
    one("SELECT TIMESTAMPDIFF(quarter, DATE '2011-07-05', DATE '2026-07-04')", 59)
    one("SELECT TIMESTAMPDIFF(quarter, DATE '2026-07-04', DATE '2011-07-05')", -59)
    one("SELECT TIMESTAMPDIFF(SECOND, null, '2007-12-31 00:00:00')", null)
  }

  test("MySQL CAST targets and coercion cases (queries.go:2870-6650)") {
    one("SELECT 2.0 + CAST(5 AS DECIMAL)", BigDecimal("7.0"))
    check("SELECT DISTINCT CAST(i AS DECIMAL) from mytable",
      Seq(Seq(BigDecimal(1)), Seq(BigDecimal(2)), Seq(BigDecimal(3))))
    one("SELECT SUM( DISTINCT CAST(i AS DECIMAL)) from mytable", BigDecimal(6))
    one("SELECT MAX(CAST(NULL AS DECIMAL)) * 82", null)
    check("SELECT * FROM mytable WHERE i in (CAST(NULL AS SIGNED), 2, 3, 4)",
      Seq(Seq(3, "third row"), Seq(2, "second row")))
    check("SELECT * FROM mytable WHERE i in (1+2)",
      Seq(Seq(3, "third row")))
    one("select 0 in (1/100000)", false)
    // numeric truthiness in CASE WHEN COUNT(*) (truthy retry path)
    one("SELECT CASE WHEN COUNT( * ) THEN 10 * CAST(-19 AS SIGNED ) + CAST(82 AS DECIMAL) END",
      BigDecimal(-108))
    one("select cast(X'9876543210' as binary)",
      Seq[Byte](0x98.toByte, 0x76, 0x54, 0x32, 0x10))
    // MySQL 8 VALUES ROW() + NOT BETWEEN NULL 3VL
    check("SELECT DISTINCT * FROM (values row(7,31,27), row(79,17,38), row(78,59,26)) a (col0, col1, col2) WHERE ( + col1 + + col2 ) NOT BETWEEN NULL AND col1",
      Seq(Seq(7, 31, 27), Seq(79, 17, 38), Seq(78, 59, 26)))
    // MySQL coerces COALESCE(INT, DATE) through its permissive
    // result-type algorithm (queries.go:888): the dynamic-display
    // coalesce renders the chosen value's own form
    one("select coalesce(1, CAST('2017-08-29' AS DATE))", "1")
  }

  test("NULLIF/IFNULL/IF cases (queries.go:5191-5249)") {
    one("SELECT nullif('abc', NULL)", "abc")
    one("SELECT nullif(NULL, NULL)", null)
    one("SELECT nullif(NULL, 123)", null)
    one("SELECT nullif(123, 123)", null)
    one("SELECT nullif(123, 321)", 123)
    one("SELECT ifnull(123, NULL)", 123)
    one("SELECT ifnull(NULL, NULL)", null)
    one("SELECT ifnull(NULL, 123)", 123)
    one("SELECT ifnull(123, 123)", 123)
    one("SELECT ifnull(123, 321)", 123)
    one("""SELECT if(123 = 123, "a", "b")""", "a")
  }

  test("DATE_ADD/DATE_SUB INTERVAL arithmetic (function_queries.go:1800-1845)") {
    // DIVERGENCE: MySQL renders string-arg DATE_ADD as a string
    // ("2018-05-03"); we produce a TIMESTAMP — same instant, so the
    // corpus values are pinned through CAST(... AS DATE).
    one("SELECT CAST(DATE_ADD('2018-05-02', INTERVAL 1 day) AS DATE)",
      java.sql.Date.valueOf("2018-05-03"))
    one("SELECT CAST(DATE_ADD(DATE('2018-05-02'), INTERVAL 1 day) AS DATE)",
      java.sql.Date.valueOf("2018-05-03"))
    one("SELECT CAST(DATE_SUB('2018-05-02', INTERVAL 1 DAY) AS DATE)",
      java.sql.Date.valueOf("2018-05-01"))
    one("SELECT CAST(DATE_SUB(DATE('2018-05-02'), INTERVAL 1 DAY) AS DATE)",
      java.sql.Date.valueOf("2018-05-01"))
    one("SELECT CAST('2018-05-02' + INTERVAL 1 DAY AS DATE)",
      java.sql.Date.valueOf("2018-05-03"))
    one("SELECT CAST('2018-05-02' - INTERVAL 1 DAY AS DATE)",
      java.sql.Date.valueOf("2018-05-01"))
  }

  test("typestable interval filters (queries.go:4067-4135)") {
    check("SELECT id FROM typestable WHERE ti > '2019-12-31'", Seq(Seq(1)))
    check("SELECT id FROM typestable WHERE da = '2019-12-31'", Seq(Seq(1)))
    check("SELECT id FROM typestable WHERE ti < '2019-12-31'", Seq())
    check("SELECT id FROM typestable WHERE da < '2019-12-31'", Seq())
    check("SELECT id FROM typestable WHERE ti > date_add('2019-12-30', INTERVAL 1 day)",
      Seq(Seq(1)))
    check("SELECT id FROM typestable WHERE da > date_add('2019-12-30', INTERVAL 1 DAY)",
      Seq())
    check("SELECT id FROM typestable WHERE da >= date_add('2019-12-30', INTERVAL 1 DAY)",
      Seq(Seq(1)))
    check("SELECT id FROM typestable WHERE ti < date_add('2019-12-30', INTERVAL 1 DAY)",
      Seq())
    check("SELECT id FROM typestable WHERE da < date_add('2019-12-30', INTERVAL 1 DAY)",
      Seq())
    check("SELECT id FROM typestable WHERE da < adddate('2020-01-01', INTERVAL 1 DAY)",
      Seq(Seq(1)))
    check("SELECT id FROM typestable WHERE da < adddate('2020-01-01', 1)",
      Seq(Seq(1)))
    check("SELECT id FROM typestable WHERE ti > date_sub('2020-01-01', INTERVAL 1 DAY)",
      Seq(Seq(1)))
    check("SELECT id FROM typestable WHERE da > date_sub('2020-01-01', INTERVAL 1 DAY)",
      Seq())
    check("SELECT id FROM typestable WHERE da >= date_sub('2020-01-01', INTERVAL 1 DAY)",
      Seq(Seq(1)))
    check("SELECT id FROM typestable WHERE ti < date_sub('2020-01-01', INTERVAL 1 DAY)",
      Seq())
    check("SELECT id FROM typestable WHERE da < date_sub('2020-01-01', INTERVAL 1 DAY)",
      Seq())
    check("SELECT id FROM typestable WHERE da >= subdate('2020-01-01', INTERVAL 1 DAY)",
      Seq(Seq(1)))
    check("SELECT id FROM typestable WHERE da >= subdate('2020-01-01', 1)",
      Seq(Seq(1)))
  }

  test("string search functions (function_queries.go:1908-1960)") {
    check("SELECT instr(s, 'row') as l FROM mytable ORDER BY i",
      Seq(Seq(7), Seq(8), Seq(7)))
    check("SELECT instr(s, 'first') as l FROM mytable ORDER BY i",
      Seq(Seq(1), Seq(0), Seq(0)))
    check("SELECT instr(s, 'o') as l FROM mytable ORDER BY i",
      Seq(Seq(8), Seq(4), Seq(8)))
    check("SELECT instr(s, NULL) as l FROM mytable ORDER BY l",
      Seq(Seq(null), Seq(null), Seq(null)))
    check("""select locate("o", s) from mytable order by i""",
      Seq(Seq(8), Seq(4), Seq(8)))
    check("""select locate("o", s, 5) from mytable order by i""",
      Seq(Seq(8), Seq(9), Seq(8)))
    check("""select locate(upper("roW"), upper(s), power(10, 0)) from mytable order by i""",
      Seq(Seq(7), Seq(8), Seq(7)))
    one("select locate('a', 'abc', 0)", 0)
    check("select find_in_set('second row', s) from mytable",
      Seq(Seq(0), Seq(1), Seq(0)))
    check("select find_in_set(s, 'first row,second row,third row') from mytable",
      Seq(Seq(1), Seq(2), Seq(3)))
    // DIVERGENCE (1 ULP): Go's math.Log2(3) = 1.5849625007211563; JVM
    // StrictMath.log(3)/log(2) = 1.584962500721156
    check("select log2(i) from mytable order by i",
      Seq(Seq(0.0), Seq(1.0), Seq(1.584962500721156)))
  }

  test("CONVERT / UUID / compress cases (function_queries.go:1966-2005)") {
    one("select uuid() = uuid()", false)
    one("select instr(REPLACE(CONVERT(UUID() USING utf8mb4), '-', ''), '-')", 0)
    one("SELECT CONVERT('9999-12-31 23:59:59', DATETIME)",
      java.time.LocalDateTime.parse("9999-12-31T23:59:59"))
    one("SELECT DATETIME('9999-12-31 23:59:59')",
      java.time.LocalDateTime.parse("9999-12-31T23:59:59"))
    // DIVERGENCE: MySQL DATETIME caps at year 9999 (overflow -> NULL);
    // Spark TIMESTAMP_NTZ represents year 10000 fine. Pinned.
    one("SELECT CONVERT('10000-12-31 23:59:59', DATETIME)",
      java.time.LocalDateTime.parse("+10000-12-31T23:59:59"))
    one("SELECT CONVERT('123', SIGNED)", 123)
    // uncompress yields STRING here (MySQL: binary with utf8 payload)
    one("select uncompress(compress('thisisastring'))", "thisisastring")
    one("select length(uncompress(compress(repeat('a', 1000))))", 1000)
    one("select uncompressed_length(compress(repeat('a', 1000)))", 1000)
  }

  test("encoding / UUID binary / constructor registry tail (function_queries.go:1662, script_queries.go:3225)") {
    one("SELECT TO_BASE64('foo')", "Zm9v")
    one("SELECT FROM_BASE64('YmFy')", "bar")
    one("SELECT IS_UUID(UUID())", 1)
    one("SELECT IS_UUID('6ccd780c-baba-1026-9564-5b8c656024db')", 1)
    one("SELECT IS_UUID('abc')", 0)
    one("SELECT BIN_TO_UUID(UUID_TO_BIN('6ccd780c-baba-1026-9564-5b8c656024db'))",
      "6ccd780c-baba-1026-9564-5b8c656024db")
    one("SELECT BIN_TO_UUID(UUID_TO_BIN('6ccd780c-baba-1026-9564-5b8c656024db', 1), 1)",
      "6ccd780c-baba-1026-9564-5b8c656024db")
    one("SELECT UUID_TO_BIN(NULL)", null)
    one("SELECT HEX(UUID_TO_BIN('6ccd780c-baba-1026-9564-5b8c656024db'))",
      "6CCD780CBABA102695645B8C656024DB")
    one("SELECT TIME_TO_SEC('13:20:00')", 48000)
    // charset introducers + expression COLLATE drop to the literal
    // (charset_collation_engine.go:1085)
    one("SELECT TO_BASE64(_utf8mb4'abc' COLLATE utf8mb4_0900_bin)", "YWJj")
    one("SELECT _latin1'x'", "x")
    // explicit COLLATE maps onto Spark's native collations (reference
    // sql/collations.go resolution; charset_collation_engine.go corpus)
    one("SELECT 'a' = 'A' COLLATE utf8mb4_0900_ai_ci", true)
    one("SELECT 'é' = 'e' COLLATE utf8mb4_0900_ai_ci", true)
    one("SELECT 'a' = 'A' COLLATE utf8mb4_0900_as_cs", false)
    one("SELECT 'a' = 'A' COLLATE latin1_swedish_ci", true)
    one("SELECT 'é' = 'e' COLLATE utf8mb4_unicode_ci", true)
    one("SELECT 'a' = 'A' COLLATE utf8mb4_ja_0900_as_cs", false)
    // ORDER BY under an explicit collation: ai_ci groups case/accent
    // variants together instead of binary order
    assert(engine.query(
      "SELECT s FROM (SELECT 'b' AS s UNION ALL SELECT 'A' UNION ALL " +
      "SELECT 'á' UNION ALL SELECT 'B') v " +
      "ORDER BY s COLLATE utf8mb4_0900_ai_ci, s")
      .collect().map(_.getString(0)).toSeq === Seq("A", "á", "B", "b"))
    // Classical Latin now approximates with root UCA (round 12) —
    // it resolves instead of raising 1273
    one("SELECT 'a' = 'A' COLLATE utf8mb4_la_0900_as_cs", false)
    // a genuinely unknown collation is MySQL error 1273, not a reorder
    val err = intercept[IllegalArgumentException] {
      engine.query("SELECT 'a' COLLATE utf8mb4_zz_0900_as_cs")
    }
    assert(err.getMessage.contains("Unknown collation"))
    one("SELECT CHARSET('abc')", "utf8mb4")
    one("SELECT ST_ASTEXT(POINT(1, 2))", "POINT(1 2)")
    one("SELECT ST_ASTEXT(LINESTRING(POINT(0,0), POINT(1,2)))",
      "LINESTRING(0 0,1 2)")
    one("SELECT ST_ASTEXT(POLYGON(LINESTRING(POINT(0,0), POINT(0,2), POINT(2,2), POINT(0,0))))",
      "POLYGON((0 0,0 2,2 2,0 0))")
  }

  test("row-value (tuple) comparisons with MySQL 3VL (tuple_queries.go:31-55)") {
    // equality short-circuits on a decided FALSE even with a NULL present
    one("SELECT (1, 2) = (1, 2)", true)
    one("SELECT (1, 2) = (NULL, 2)", null)
    one("SELECT (1, 2) = (NULL, 3)", false)
    one("SELECT (0, NULL) = (0, NULL)", null)
    one("SELECT (1, 2) <> (NULL, 3)", true)
    one("SELECT (1, 2) <> (NULL, 2)", null)
    // lexicographic ordering
    one("SELECT (1, 2) < (1, 3)", true)
    one("SELECT (1, 2) < (1, 2)", false)
    one("SELECT (1, 2) <= (1, 2)", true)
    one("SELECT (2, 1) > (1, 9)", true)
    one("SELECT (1, 2) >= (NULL, 2)", null)
    one("SELECT (1, 2, 3) < (1, 2, 4)", true)
    // tuple IN value lists (and NOT IN)
    one("SELECT (1, 2) IN ((3, 4), (1, 2))", true)
    one("SELECT (1, 2) IN ((3, 4), (5, 6))", false)
    one("SELECT (1, 2) NOT IN ((3, 4), (5, 6))", true)
    // over a table, as a filter
    assert(engine.query(
      "SELECT i FROM mytable WHERE (i, s) IN ((1, 'first row'), (3, 'third row')) ORDER BY i")
      .collect().map(_.getLong(0)).toSeq == Seq(1L, 3L))
    // row-value IN subquery parses natively
    assert(engine.query(
      "SELECT count(*) FROM mytable WHERE (i, s) IN (SELECT i, s FROM mytable)")
      .collect()(0).getLong(0) == 3L)
  }

  test("JSON_TYPE / CAST AS JSON cases (json_scripts.go:50-150)") {
    one("select JSON_TYPE(CAST(1 AS JSON))", "INTEGER")
    one("""select JSON_TYPE("1")""", "INTEGER")
    one("""select JSON_TYPE(CAST("1" AS JSON))""", "INTEGER")
    one("""select JSON_TYPE("\"1\"")""", "STRING")
    one("""select JSON_TYPE(CAST("\"1\"" AS JSON))""", "STRING")
    one("""select JSON_TYPE("321.4")""", "DOUBLE")
    one("""select JSON_TYPE(CAST("321.4" AS JSON))""", "DOUBLE")
    one("""select JSON_TYPE("\"321.4\"")""", "STRING")
    one("select JSON_TYPE(CAST(1e-1 AS JSON))", "DOUBLE")
    one("""select JSON_TYPE("1e-1")""", "DOUBLE")
    one("select JSON_TYPE(CAST(1.0e-1 AS JSON))", "DOUBLE")
    one("select JSON_TYPE('[1,2]')", "ARRAY")
    one("""select JSON_TYPE('{"a":1}')""", "OBJECT")
    one("select JSON_TYPE('true')", "BOOLEAN")
    one("select JSON_TYPE('null')", "NULL")
    // DIVERGENCE: MySQL wraps a bare DECIMAL literal as a JSON DECIMAL
    // (json_scripts.go:84); this engine's JSON documents are text, so the
    // numeric re-parses as DOUBLE. Pinned.
    // unquoted 321.4 parses as a DECIMAL before wrapping (json_scripts.go)
    one("select JSON_TYPE(CAST(321.4 AS JSON))", "DECIMAL")
  }

  test("COALESCE cases (function_queries.go:376-398)") {
    one("SELECT COALESCE(NULL, NULL, NULL, 'example', NULL, 1234567890)",
      "example")
    one("SELECT COALESCE(NULL, NULL, NULL, COALESCE(NULL, 1234567890))",
      1234567890)
    one("SELECT COALESCE (NULL, NULL)", null)
  }
}
