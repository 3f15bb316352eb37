package graft

import graft.functions.{spatial => sp}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class SpatialSpec extends AnyFunSuite {
  import SparkSpec.spark

  private def one[T](c: org.apache.spark.sql.Column): T =
    spark.range(1).select(c.as("v")).collect()(0).getAs[T]("v")

  test("st_x / st_y accessors and malformed input -> null") {
    assert(one[Double](sp.stX(lit("POINT(1.5 -2)"))) == 1.5)
    assert(one[Double](sp.stY(lit("POINT(1.5 -2)"))) == -2.0)
    assert(one[Any](sp.stX(lit("LINESTRING(0 0, 1 1)"))) == null)
    assert(one[Any](sp.stX(lit("not wkt"))) == null)
  }

  test("st_distance is planar euclidean") {
    assert(one[Double](sp.stDistance(lit("POINT(0 0)"), lit("POINT(3 4)"))) == 5.0)
    assert(one[Double](sp.stDistance(lit("POINT(2 2)"), lit("POINT(2 2)"))) == 0.0)
  }

  test("st_area uses the shoelace formula (convex and concave)") {
    assert(one[Double](sp.stArea(lit("POLYGON((0 0, 4 0, 4 4, 0 4, 0 0))"))) == 16.0)
    assert(one[Double](sp.stArea(lit("POLYGON((0 0, 4 0, 0 3, 0 0))"))) == 6.0)
    // concave L-shape: 3x3 minus 2x2 notch = 5
    assert(one[Double](sp.stArea(
      lit("POLYGON((0 0, 3 0, 3 1, 1 1, 1 3, 0 3, 0 0))"))) == 5.0)
  }

  test("st_length sums linestring segments") {
    assert(one[Double](sp.stLength(lit("LINESTRING(0 0, 3 4, 3 10)"))) == 11.0)
    assert(one[Any](sp.stLength(lit("LINESTRING(1 1)"))) == null)
  }

  test("st_within ray-casting handles concave rings") {
    val concave = lit("POLYGON((0 0, 3 0, 3 1, 1 1, 1 3, 0 3, 0 0))")
    assert(one[Boolean](sp.stWithin(lit("POINT(0.5 0.5)"), concave)))
    assert(one[Boolean](sp.stWithin(lit("POINT(2.5 0.5)"), concave)))
    assert(!one[Boolean](sp.stWithin(lit("POINT(2.5 2.5)"), concave))) // in the notch
    assert(!one[Boolean](sp.stWithin(lit("POINT(5 5)"), concave)))
  }

  test("SQL registration exposes st_* on the session") {
    val e = new Engine(spark)
    val r = e.query(
      "SELECT st_distance('POINT(0 0)', 'POINT(3 4)') AS d, st_area('POLYGON((0 0, 2 0, 2 2, 0 2, 0 0))') AS a")
      .collect()(0)
    assert(r.getDouble(0) == 5.0 && r.getDouble(1) == 4.0)
  }
}
