package graft

import graft.functions.DateTimeExt._
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** MySQL-doc examples for the extended date/time functions. */
class DateTimeExtSpec extends AnyFunSuite {
  import SparkSpec.spark

  private def one[T](c: org.apache.spark.sql.Column): T =
    spark.range(1).select(c.as("v")).collect()(0).getAs[T]("v")

  test("to_days / from_days match MySQL doc values") {
    assert(one[Int](toDays(lit("2007-10-07"))) == 733321)
    assert(one[Int](toDays(lit("1970-01-01"))) == 719528)
    assert(one[java.time.LocalDate](fromDays(lit(733321))).toString == "2007-10-07")
  }

  test("yearweek mode 0 matches MySQL examples") {
    assert(one[Int](yearWeek(lit("1987-01-01"))) == 198652)
    assert(one[Int](yearWeek(lit("2000-01-01"))) == 199952)
    assert(one[Int](yearWeek(lit("2024-01-07"))) == 202401)
    assert(one[Int](yearWeek(lit("2024-01-06"))) == 202353)
  }

  test("timestampdiff(MONTH) counts complete months") {
    assert(one[Int](timestampDiffMonths(
      to_date(lit("2003-02-01")), to_date(lit("2003-05-01")))) == 3)
    assert(one[Int](timestampDiffMonths(
      to_date(lit("2003-01-31")), to_date(lit("2003-02-28")))) == 0)
    assert(one[Int](timestampDiffMonths(
      to_date(lit("2003-02-28")), to_date(lit("2003-01-31")))) == -1)
  }

  test("sec_to_time / time_to_sec round-trip MySQL examples") {
    assert(one[String](secToTime(lit(2378))) == "00:39:38")
    assert(one[Int](timeToSec(lit("22:23:00"))) == 80580)
    assert(one[Int](timeToSec(secToTime(lit(80580)))) == 80580)
  }

  test("makedate builds from year + day-of-year") {
    assert(one[java.time.LocalDate](makeDate(lit(2011), lit(31))).toString == "2011-01-31")
    assert(one[java.time.LocalDate](makeDate(lit(2011), lit(32))).toString == "2011-02-01")
  }

  test("week modes 0-7 match MySQL doc examples and calcWeek semantics") {
    // MySQL doc: WEEK('2008-02-20',0)=7, WEEK('2008-02-20',1)=8,
    //            WEEK('2008-12-31',1)=53, WEEK('2000-01-01',0)=0,
    //            WEEK('2000-01-01',2)=52
    assert(one[Int](week(lit("2008-02-20"), 0)) == 7)
    assert(one[Int](week(lit("2008-02-20"), 1)) == 8)
    assert(one[Int](week(lit("2008-12-31"), 1)) == 53)
    assert(one[Int](week(lit("2000-01-01"), 0)) == 0)
    assert(one[Int](week(lit("2000-01-01"), 2)) == 52)
    // mode 3 = ISO: 2008-02-20 is ISO week 8; Dec 31 2008 rolls to week 1
    assert(one[Int](week(lit("2008-02-20"), 3)) == 8)
    assert(one[Int](week(lit("2008-12-31"), 3)) == 1)
    // modes 4-7 (derived from reference time.go calcWeek):
    // 2008: Jan 1 = Tuesday. Mode 4/6 (Sun,>=4d) week 1 starts 2007-12-30;
    // mode 5/7 (Mon, first-full-week) week 1 starts 2008-01-07.
    assert(one[Int](week(lit("2008-02-20"), 4)) == 8)
    assert(one[Int](week(lit("2008-02-20"), 5)) == 7)
    assert(one[Int](week(lit("2008-02-20"), 6)) == 8)
    assert(one[Int](week(lit("2008-02-20"), 7)) == 7)
    // 0..53-range modes never roll into next year's week 1
    assert(one[Int](week(lit("2008-12-31"), 4)) == 53)
    // 2000-01-01 (Saturday): mode 4 -> 0 (before week 1, 0-range);
    // mode 6 counts into 1999's last week
    assert(one[Int](week(lit("2000-01-01"), 4)) == 0)
    assert(one[Int](week(lit("2000-01-01"), 6)) == 52)
  }

  test("get_format returns the MySQL constant table") {
    assert(getFormat("DATE", "ISO") == "%Y-%m-%d")
    assert(getFormat("DATE", "USA") == "%m.%d.%Y")
    assert(getFormat("TIME", "USA") == "%h:%i:%s %p")
    assert(getFormat("DATETIME", "ISO") == "%Y-%m-%d %H:%i:%s")
    // the returned format feeds straight back into the %-translator
    assert(one[String](functions.MySqlFormat.dateFormat(
      to_date(lit("1997-10-04")), getFormat("DATE", "EUR"))) == "04.10.1997")
  }

  test("str_to_date parses via the %-translator") {
    assert(one[java.time.LocalDate](functions.MySqlFormat
      .strToDate(lit("04/10/1997"), "%d/%m/%Y").cast("date")).toString == "1997-10-04")
  }

  test("mysqlDateStrNorm canonicalizes every MySQL-legal write shape") {
    import functions.DateTimeExt.mysqlDateStrNorm
    // arbitrary punctuation delimiters
    assert(mysqlDateStrNorm("2009.02.09") == "2009-02-09")
    assert(mysqlDateStrNorm("2009/02/09") == "2009-02-09")
    assert(mysqlDateStrNorm("2009!2!9") == "2009-02-09")
    // delimiter-free digit runs
    assert(mysqlDateStrNorm("20090209") == "2009-02-09")
    assert(mysqlDateStrNorm("090209") == "2009-02-09")
    assert(mysqlDateStrNorm("20090209123456") == "2009-02-09 12:34:56")
    // fractions render at micro precision (digits beyond 6 round half-up)
    assert(mysqlDateStrNorm("090209123456.5") == "2009-02-09 12:34:56.500000")
    // 2-digit years: 00-69 -> 20xx, 70-99 -> 19xx
    assert(mysqlDateStrNorm("69.1.2") == "2069-01-02")
    assert(mysqlDateStrNorm("70.1.2") == "1970-01-02")
    // delimited with time part
    assert(mysqlDateStrNorm("2009.02.09 12:34:56") == "2009-02-09 12:34:56")
    assert(mysqlDateStrNorm("09.02.09 1:2:3.25") == "2009-02-09 01:02:03.250000")
    // already-ISO fast path stays byte-identical
    assert(mysqlDateStrNorm("2009-02-09") == "2009-02-09")
    assert(mysqlDateStrNorm("2009-02-09 12:34:56.123") == "2009-02-09 12:34:56.123")
    // garbage passes through unchanged (downstream cast -> NULL -> 1292)
    assert(mysqlDateStrNorm("badtime") == "badtime")
    assert(mysqlDateStrNorm("2009-02") == "2009-02")
  }
}
