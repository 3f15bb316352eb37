package graft

import graft.functions.{expressions => gfx}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class ExpressionsSpec extends AnyFunSuite {
  import SparkSpec.spark
  // registers the MySQL function overrides (soundex et al.) on the
  // shared session — Spark 4's Column API resolves by registry name
  new Engine(spark)

  private def one[T](c: org.apache.spark.sql.Column): T =
    spark.range(1).select(c.as("v")).collect()(0).getAs[T]("v")

  test("field returns 1-based index, 0 when absent") {
    assert(one[Int](gfx.field(lit("b"), lit("a"), lit("b"), lit("c"))) == 2)
    assert(one[Int](gfx.field(lit("z"), lit("a"), lit("b"))) == 0)
    assert(one[Int](gfx.field(lit(null).cast("string"), lit("a"))) == 0)
  }

  test("insertStr splices like MySQL INSERT()") {
    assert(one[String](gfx.insertStr(lit("Quadratic"), lit(3), lit(4), lit("What"))) == "QuWhattic")
    // out-of-range pos -> unchanged
    assert(one[String](gfx.insertStr(lit("abc"), lit(99), lit(2), lit("X"))) == "abc")
    assert(one[String](gfx.insertStr(lit("abc"), lit(0), lit(2), lit("X"))) == "abc")
  }

  test("inet_aton/inet_ntoa round-trip and MySQL edge cases") {
    assert(one[Long](gfx.inetAton(lit("10.0.5.9"))) == 167773449L)
    assert(one[String](gfx.inetNtoa(lit(167773449L))) == "10.0.5.9")
    assert(one[Any](gfx.inetAton(lit("256.1.1.1"))) == null)
    assert(one[Any](gfx.inetAton(lit("1.2.3"))) == null)
    assert(one[Any](gfx.inetAton(lit("a.b.c.d"))) == null)
  }

  test("export_set renders lowest bit first") {
    assert(one[String](gfx.exportSet(lit(5L), lit("Y"), lit("N"), lit(","), lit(4))) == "Y,N,Y,N")
    assert(one[String](gfx.exportSet(lit(6L), lit("1"), lit("0"), lit(""), lit(8))) == "01100000")
  }

  test("quoteStr escapes per MySQL QUOTE()") {
    assert(one[String](gfx.quoteStr(lit("Don't"))) == "'Don\\'t'")
    assert(one[String](gfx.quoteStr(lit("a\\b"))) == "'a\\\\b'")
  }

  test("winnowFingerprint matches the reference fold") {
    // cross-checked against python: min over 8-windows of
    // 'the quick brown fox jumps' with h = (h*31 + c) mod 2^61-1
    assert(one[Long](gfx.winnowFingerprint(lit("the quick brown fox jumps"), lit(8)))
      == 970748898268L)
    assert(one[Any](gfx.winnowFingerprint(lit("short"), lit(8))) == null)
  }

  test("accentFold is the ai_ci comparison key") {
    assert(one[String](gfx.accentFold(lit("Café"))) == "cafe")
    assert(one[String](gfx.accentFold(lit("ÀÇÉÑÖÜ"))) == "acenou")
    assert(one[String](gfx.accentFold(lit("naïve Über"))) == "naive uber")
    // already-folded text is a fixpoint
    assert(one[String](gfx.accentFold(lit("plain text 123"))) == "plain text 123")
  }

  test("makeSet joins bit-selected strings, skips NULLs") {
    assert(one[String](gfx.makeSet(lit(5L), lit("a"), lit("b"), lit("c"))) == "a,c")
    assert(one[String](gfx.makeSet(lit(0L), lit("a"))) == "")
    assert(one[String](gfx.makeSet(lit(3L), lit("a"),
      lit(null).cast("string"), lit("c"))) == "a")
    assert(one[Any](gfx.makeSet(lit(null).cast("long"), lit("a"))) == null)
  }

  test("soundex: MySQL's unabridged algorithm") {
    // MySQL SOUNDEX returns the extended-length variant — every coded
    // consonant appends ('Quadratically' -> 'Q36324'); short codes
    // still zero-pad to 4 (reference function/soundex.go). The session
    // registry override covers both SQL and Column-API callers.
    assert(one[String](soundex(lit("Quadratically"))) == "Q36324")
    assert(one[String](soundex(lit("Robert"))) == "R163")
    assert(one[String](soundex(lit("Robert"))) == one[String](soundex(lit("Rupert"))))
    assert(one[String](soundex(lit("Test String!"))) == "T2323652")
    assert(one[String](soundex(lit("!!"))) == "")
  }

  test("inet6 family: aton/ntoa round-trips, is_ipv4/is_ipv6") {
    assert(one[String](gfx.inet6Ntoa(gfx.inet6Aton(lit("fdfe::5a55:caff:fefa:9089"))))
      == "fdfe::5a55:caff:fefa:9089")
    assert(one[String](gfx.inet6Ntoa(gfx.inet6Aton(lit("10.0.5.9")))) == "10.0.5.9")
    assert(one[Any](gfx.inet6Aton(lit("not an ip"))) == null)
    assert(one[Boolean](gfx.isIpv4(lit("10.0.5.9"))))
    assert(!one[Boolean](gfx.isIpv4(lit("10.0.5.256"))))
    assert(one[Boolean](gfx.isIpv6(lit("::1"))))
    assert(!one[Boolean](gfx.isIpv6(lit("10.0.5.9"))))
  }

  test("mysqlToNumber takes the longest numeric prefix, else 0") {
    assert(one[Double](gfx.mysqlToNumber(lit("12.5abc"))) == 12.5)
    assert(one[Double](gfx.mysqlToNumber(lit("abc"))) == 0.0)
    assert(one[Double](gfx.mysqlToNumber(lit(" 42"))) == 42.0)
    assert(one[Double](gfx.mysqlToNumber(lit("1e3x"))) == 1000.0)
    assert(one[Double](gfx.mysqlToNumber(lit(".5x"))) == 0.5)
    assert(one[Double](gfx.mysqlToNumber(lit("-3.x"))) == -3.0)
    assert(one[Double](gfx.mysqlToNumber(lit("+-3"))) == 0.0)
    assert(one[Double](gfx.mysqlToNumber(lit(""))) == 0.0)
  }

  test("SQL registration makes functions usable in spark.sql") {
    gfx.register(spark)
    val r = spark.sql(
      "SELECT mysql_field('b','a','b') AS f, inet_ntoa(inet_aton('1.2.3.4')) AS ip")
      .collect()(0)
    assert(r.getInt(0) == 2 && r.getString(1) == "1.2.3.4")
  }
}
