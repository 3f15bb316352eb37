package graft

import org.scalatest.funsuite.AnyFunSuite

/** Long-tail registry functions (functions/MiscFns.scala) via SQL text —
  * MySQL-doc examples. */
class MiscFnsSpec extends AnyFunSuite {
  import SparkSpec.spark
  private lazy val e = new Engine(spark)

  private def one(sql: String): Any =
    e.query(s"SELECT $sql AS v").collect()(0).get(0)

  test("date/time tail: time, timediff, microsecond, timestampdiff") {
    assert(one("TIME(TIMESTAMP '2003-12-31 01:02:03')") == "01:02:03")
    assert(one("TIMEDIFF(TIMESTAMP '2000-01-01 00:00:00', TIMESTAMP '2000-01-01 00:00:30')")
      == "-00:00:30")
    assert(one("TIMEDIFF(TIMESTAMP '2008-12-31 23:59:59', TIMESTAMP '2008-12-30 01:01:01')")
      == "46:58:58")
    assert(one("MICROSECOND(TIMESTAMP '2019-01-01 10:10:10.123456')") == 123456)
    // bare-unit form parses natively in Spark (MySQL syntax)
    assert(one("TIMESTAMPDIFF(MONTH, DATE '2003-02-01', DATE '2003-05-01')") == 3L)
    assert(one("TIMESTAMPDIFF(MINUTE, TIMESTAMP '2003-02-01 00:00:00', TIMESTAMP '2003-02-01 00:55:30')") == 55L)
    assert(one("ADDDATE(DATE '2008-01-02', 31)").toString == "2008-02-02")
    assert(one("TO_DAYS(DATE '2007-10-07')") == 733321)
    assert(one("FROM_DAYS(733321)").toString == "2007-10-07")
    assert(one("WEEK(DATE '2008-02-20')") == 7)
    assert(one("WEEK(DATE '2008-12-31', 1)") == 53)
    assert(one("WEEKDAY(DATE '2008-02-03')") == 6) // Sunday -> 6
    assert(one("YEARWEEK(DATE '1987-01-01')") == 198652)
    assert(one("TIME_FORMAT('19:30:10', '%H %i %s')") == "19 30 10")
    assert(one("GET_FORMAT('DATE', 'EUR')") == "%d.%m.%Y")
  }

  test("string tail: mid, strcmp, ord, oct, format, quote, insert") {
    assert(one("MID('Quadratically', 5, 6)") == "ratica")
    assert(one("STRCMP('text', 'text2')") == -1)
    assert(one("STRCMP('text2', 'text')") == 1)
    assert(one("STRCMP('text', 'text')") == 0)
    assert(one("ORD('2')") == 50L)
    assert(one("ORD('é')") == 50089L) // MySQL: UTF-8 bytes big-endian
    assert(one("OCT(12)") == "14")
    assert(one("FORMAT(12332.1234, 2)") == "12,332.12")
    assert(one("QUOTE('Don''t!')") == "'Don\\'t!'")
    assert(one("INSERT('Quadratic', 3, 4, 'What')") == "QuWhattic")
    assert(one("FIELD('Bb', 'Aa', 'Bb', 'Cc')") == 2)
  }

  test("inet tail: ipv4-compat/mapped, is_ipv4/6") {
    assert(one("IS_IPV4_COMPAT(INET6_ATON('::192.168.0.1'))") == true)
    assert(one("IS_IPV4_COMPAT(INET6_ATON('::ffff:192.168.0.1'))") == false)
    assert(one("IS_IPV4_MAPPED(INET6_ATON('::ffff:192.168.0.1'))") == true)
    assert(one("IS_IPV4('10.0.1.255')") == true)
    assert(one("IS_IPV4('10.0.1.256')") == false)
    assert(one("IS_IPV6('fdfe::5a55:caff:fefa:9089')") == true)
    assert(one("IS_IPV6('10.0.1.255')") == false)
    assert(one("INET6_NTOA(INET6_ATON('::ffff:1.2.3.4'))").toString.nonEmpty)
  }

  test("vector text forms and distances") {
    // reference rendering (types/vector.go): integral float32 values
    // print bare — "[1.5, 2]", not the old to_json "[1.5,2.0]"
    assert(one("VEC_TOTEXT(VEC_FROMTEXT('[1.5, 2.0]'))") == "[1.5, 2]")
    assert(one("VEC_DISTANCE(TO_VECTOR('[0,0]'), TO_VECTOR('[3,4]'))") == 25.0)
    assert(one("VEC_DISTANCE_COSINE(TO_VECTOR('[1,0]'), TO_VECTOR('[0,1]'))") == 1.0)
  }

  test("misc: validate_password_strength tiers, is_binary, database") {
    assert(one("VALIDATE_PASSWORD_STRENGTH('abc')") == 0)
    assert(one("VALIDATE_PASSWORD_STRENGTH('abcdefg')") == 25)
    assert(one("VALIDATE_PASSWORD_STRENGTH('abcdefgh')") == 50)
    // the reference ladder (hash.go:526) gates 50->100 on ALL four
    // counters then always grants the dictionary +25+25: a password
    // missing a special char stays 50 (MySQL's docs describe a 75 tier
    // the reference doesn't implement)
    assert(one("VALIDATE_PASSWORD_STRENGTH('Abcdefg1')") == 50)
    assert(one("VALIDATE_PASSWORD_STRENGTH('Abcdef1!')") == 100)
    assert(one("IS_BINARY(CAST('x' AS BINARY))") == true)
    assert(one("IS_BINARY('x')") == false)
    assert(one("DATABASE()") != null)
  }

  test("multi-arg CHAR() concatenates code points, skipping NULLs " +
      "(string_functions.go Char)") {
    assert(one("CHAR(77, 121, 83, 81, 76)") == "MySQL")
    assert(one("CHAR(65)") == "A")
    assert(one("CHAR(77, NULL, 121)") == "My")
    assert(one("CHAR(77.3, 121.5)") == "My") // numeric args round/truncate
  }
}
