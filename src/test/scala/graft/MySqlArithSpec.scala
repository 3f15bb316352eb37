package graft

import org.scalatest.funsuite.AnyFunSuite

/** MySQL arithmetic semantics (functions/MySqlArith.scala): division
  * scale chains, uint64 bit ops, temporal/bool/string operand coercion.
  * Expectations from reference enginetest/queries/queries.go:2666,
  * 3654-3790, 4005-4020. */
class MySqlArithSpec extends AnyFunSuite {
  import SparkSpec.spark
  private lazy val e = new Engine(spark)

  private def one(sql: String): Any = {
    val r = e.query(sql).collect()(0)
    r.get(0)
  }
  private def str(sql: String): String = String.valueOf(one(sql))

  test("division yields MySQL decimal scale (+4 per chain step)") {
    assert(str("select 2/4") == "0.5000")
    assert(str("select 1/2/3/4/5/6") == "0.00138888888888888888")
    assert(str("select 24/3/2*1/2/3") == "0.6666666666666667")
    assert(str("select 1/2/3%4/5/6") == "0.0055555555555556")
    assert(str("select (14620 / 9432456) / (24250 / 9432456)") == "0.60288653")
    assert(str("select 5.2/3.1/1.7/1/1/1/1/1") ==
      "0.98671726755218216294117647000")
    assert(str("select 1.677419354838709677/1.9") ==
      "0.8828522920203735142105")
    assert(str("select 0.0015 / 0.0026") == "0.57692308")
    assert(str("select 15728640/1024/1024") == "15.00000000")
    assert(str("select 1000.0 / 20.00") == "50.00000")
    // division by zero is NULL, not an error
    assert(one("select 1/0") == null)
    // float operands keep double division
    assert(one("select 1.5e0 / 2") == 0.75)
  }

  test("division scale comparisons from the queries.go block") {
    assert(one("select 1 / 3 = 0.333333333") == true ||
      one("select 1 / 3 = 0.333333333") == 1)
    assert(str("select 100 / 35600.00 * 35600.00") == "99.999973")
  }

  test("bit ops coerce operands and display as uint64") {
    assert(str("select 2.6 & -1.3") == "3")
    assert(str("select -1.5 & -3.3") == "18446744073709551612")
    assert(str("select -1.7 & 0.5") == "0")
    assert(str("select -1.7 & 1.5") == "2")
    assert(str(
      "select date('2022-11-19 11:53:45') & date('2022-11-11 11:53:45')") ==
      "20221111")
    assert(str("select '2022-11-19 11:53:45' & '2023-11-11 11:53:45'") ==
      "2022")
    assert(str("select now() ^ now()") == "0")
    assert(str("select ~0") == "18446744073709551615")
  }

  test("temporal and boolean arithmetic coerces numerically") {
    assert(str("SELECT NOW() - NOW()") == "0")
    assert(str("SELECT NOW() / NOW()") == "1.0000")
    assert(str("SELECT NOW() div NOW()") == "1")
    val r = e.query("SELECT -true, -false").collect()(0)
    assert(r.get(0) == -1 && r.get(1) == 0)
    // interval arithmetic keeps native temporal semantics
    assert(!e.query("select now() + interval 1 day").collect()(0).isNullAt(0))
  }
}
