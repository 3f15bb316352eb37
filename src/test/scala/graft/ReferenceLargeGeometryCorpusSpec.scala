package graft

import org.scalatest.funsuite.AnyFunSuite

/** Large-geometry corpus ported from the reference's
  * enginetest/queries/large_geometry_queries.go (511 LoC): geometry
  * values past 64KB serialized (5000 points, 16 bytes/point in WKB),
  * exercising constructor parsing, every accessor family, WKB
  * round-trips, comparison, UPDATE/DELETE, and the measure functions
  * over values that would take the reference's out-of-band storage
  * path. This engine carries geometry as WKT text in string columns,
  * so "large" exercises the tokenizer + constructor evaluation at the
  * same scale.
  */
class ReferenceLargeGeometryCorpusSpec extends AnyFunSuite {
  import SparkSpec.spark

  private lazy val engine = new Engine(spark)

  private val N = 5000

  private def pointList(n: Int): String =
    (0 until n).map(i => s"POINT($i,$i)").mkString(",")
  private def lineString(n: Int): String = s"LINESTRING(${pointList(n)})"
  private def polyPointList(n: Int): String =
    ((0 until n - 1).map(i => s"POINT($i,0)") :+ "POINT(0,0)").mkString(",")

  private def one(sql: String): Any =
    engine.query(sql).collect()(0).get(0)

  test("insert and select large linestring: accessors + WKB round-trip " +
      "+ swapxy + srid") {
    engine.query(
      "CREATE TABLE large_line (i int primary key, l linestring NOT NULL)")
    engine.query(s"INSERT INTO large_line VALUES (1, ${lineString(N)})")
    assert(one(
      "SELECT ST_ASWKT(ST_STARTPOINT(l)) FROM large_line WHERE i = 1") ==
      "POINT(0 0)")
    assert(one(
      "SELECT ST_ASWKT(ST_ENDPOINT(l)) FROM large_line WHERE i = 1") ==
      s"POINT(${N - 1} ${N - 1})")
    assert(one("SELECT ST_ISCLOSED(l) FROM large_line WHERE i = 1") == false)
    assert(one("SELECT ST_DIMENSION(l) FROM large_line WHERE i = 1") == 1)
    assert(one("SELECT ST_LENGTH(l) > 0 FROM large_line WHERE i = 1") == true)
    assert(one("SELECT ST_SRID(l) FROM large_line WHERE i = 1") == 0)
    // WKB round-trip preserves every point
    assert(one("SELECT ST_ASWKT(ST_STARTPOINT(ST_GEOMFROMWKB(" +
      "ST_ASWKB(l)))) FROM large_line WHERE i = 1") == "POINT(0 0)")
    assert(one("SELECT ST_ASWKT(l) LIKE 'LINESTRING(0 0,1 1,2 2,%' " +
      "FROM large_line WHERE i = 1") == true)
    // swapxy flips every coordinate pair
    assert(one("SELECT ST_ASWKT(ST_STARTPOINT(ST_SWAPXY(l))) " +
      "FROM large_line WHERE i = 1") == "POINT(0 0)")
    assert(one("SELECT ST_DIMENSION(ST_SWAPXY(l)) " +
      "FROM large_line WHERE i = 1") == 1)
    // srid setter keeps the coordinates
    assert(one("SELECT ST_SRID(ST_SRID(l, 0)) FROM large_line WHERE i = 1")
      == 0)
    assert(one("SELECT ST_ASWKT(ST_STARTPOINT(ST_SRID(l, 0))) " +
      "FROM large_line WHERE i = 1") == "POINT(0 0)")
    // point extraction round-trips exact doubles
    assert(one("SELECT ST_X(ST_STARTPOINT(l)) FROM large_line WHERE i = 1")
      == 0.0)
    assert(one("SELECT ST_Y(ST_ENDPOINT(l)) FROM large_line WHERE i = 1")
      == (N - 1).toDouble)
    // GeoJSON of a 5000-point line materializes
    assert(one("SELECT ST_ASGEOJSON(l) IS NOT NULL " +
      "FROM large_line WHERE i = 1") == true)
    engine.query("drop table large_line")
  }

  test("compare large linestrings via WKB; update and delete rows " +
      "holding large values") {
    engine.query(
      "CREATE TABLE llc (i int primary key, l linestring NOT NULL)")
    engine.query(s"INSERT INTO llc VALUES (1, ${lineString(N)})")
    engine.query(s"INSERT INTO llc VALUES (2, ${lineString(N)})")
    engine.query(s"INSERT INTO llc VALUES (3, ${lineString(N / 2)})")
    assert(one("SELECT ST_ASWKB(a.l) = ST_ASWKB(b.l) FROM llc a, llc b " +
      "WHERE a.i = 1 AND b.i = 2") == true)
    assert(one("SELECT ST_ASWKB(a.l) = ST_ASWKB(b.l) FROM llc a, llc b " +
      "WHERE a.i = 1 AND b.i = 3") == false)
    // UPDATE swaps in a different large value
    engine.query(
      s"UPDATE llc SET l = ${lineString(N + 1)} WHERE i = 1")
    assert(one("SELECT ST_ASWKT(ST_ENDPOINT(l)) FROM llc WHERE i = 1") ==
      s"POINT($N $N)")
    // DELETE removes only the targeted large row
    engine.query("DELETE FROM llc WHERE i = 2")
    assert(one("SELECT count(*) FROM llc") == 2L)
    engine.query("drop table llc")
  }

  test("large polygon / multipoint / multilinestring / multipolygon / " +
      "geometrycollection constructors, dimensions and srids") {
    engine.query(
      "CREATE TABLE lgp (i int primary key, p polygon NOT NULL)")
    engine.query(
      s"INSERT INTO lgp VALUES (1, POLYGON(LINESTRING(${polyPointList(N)})))")
    assert(one("SELECT ST_DIMENSION(p) FROM lgp WHERE i = 1") == 2)
    assert(one("SELECT ST_SRID(p) FROM lgp WHERE i = 1") == 0)
    assert(one("SELECT ST_ASWKT(p) LIKE 'POLYGON((0 0,1 0,2 0,%' " +
      "FROM lgp WHERE i = 1") == true)
    assert(one("SELECT ST_DIMENSION(ST_SWAPXY(p)) FROM lgp WHERE i = 1")
      == 2)
    engine.query(
      "CREATE TABLE lgmp (i int primary key, mp multipoint NOT NULL)")
    engine.query(
      s"INSERT INTO lgmp VALUES (1, MULTIPOINT(${pointList(N)}))")
    assert(one("SELECT ST_DIMENSION(mp) FROM lgmp WHERE i = 1") == 0)
    assert(one("SELECT ST_SRID(mp) FROM lgmp WHERE i = 1") == 0)
    assert(one("SELECT ST_ASWKT(mp) LIKE 'MULTIPOINT((0 0),(1 1),(2 2),%' " +
      "FROM lgmp WHERE i = 1") == true)
    engine.query(
      "CREATE TABLE lgml (i int primary key, ml multilinestring NOT NULL)")
    engine.query(
      s"INSERT INTO lgml VALUES (1, MULTILINESTRING(${lineString(N)}))")
    assert(one("SELECT ST_DIMENSION(ml) FROM lgml WHERE i = 1") == 1)
    assert(one("SELECT ST_ISCLOSED(ml) FROM lgml WHERE i = 1") == false)
    assert(one("SELECT ST_SRID(ml) FROM lgml WHERE i = 1") == 0)
    engine.query(
      "CREATE TABLE lgmpy (i int primary key, mp multipolygon NOT NULL)")
    engine.query(s"INSERT INTO lgmpy VALUES (1, MULTIPOLYGON(POLYGON(" +
      s"LINESTRING(${polyPointList(N)}))))")
    assert(one("SELECT ST_DIMENSION(mp) FROM lgmpy WHERE i = 1") == 2)
    assert(one("SELECT ST_SRID(mp) FROM lgmpy WHERE i = 1") == 0)
    engine.query("CREATE TABLE lggc (i int primary key, " +
      "gc geometrycollection NOT NULL)")
    engine.query(
      s"INSERT INTO lggc VALUES (1, GEOMETRYCOLLECTION(${lineString(N)}))")
    assert(one("SELECT ST_DIMENSION(gc) FROM lggc WHERE i = 1") == 1)
    assert(one("SELECT ST_SRID(gc) FROM lggc WHERE i = 1") == 0)
    engine.runScript("drop table lgp; drop table lgmp; drop table lgml; " +
      "drop table lgmpy; drop table lggc;")
  }

  test("generic geometry column accepts large values of any type") {
    engine.query(
      "CREATE TABLE lgg (i int primary key, g geometry NOT NULL)")
    engine.query(s"INSERT INTO lgg VALUES (1, ${lineString(N)})")
    engine.query(s"INSERT INTO lgg VALUES (2, POLYGON(LINESTRING(" +
      s"${polyPointList(N)})))")
    assert(one("SELECT ST_DIMENSION(g) FROM lgg WHERE i = 1") == 1)
    assert(one("SELECT ST_SRID(g) FROM lgg WHERE i = 1") == 0)
    assert(one("SELECT ST_ASWKT(g) LIKE 'LINESTRING(0 0,1 1,2 2,%' " +
      "FROM lgg WHERE i = 1") == true)
    assert(one("SELECT ST_DIMENSION(g) FROM lgg WHERE i = 2") == 2)
    engine.query("drop table lgg")
  }

  test("measures over large geometries: distance zero to self / " +
      "positive to distant, boundary intersection, perimeter, " +
      "degenerate area") {
    engine.query(
      "CREATE TABLE lgd (i int primary key, l linestring NOT NULL)")
    engine.query(s"INSERT INTO lgd VALUES (1, ${lineString(N)})")
    engine.query(
      "INSERT INTO lgd VALUES (2, LINESTRING(POINT(0,100),POINT(1,101)))")
    assert(one("SELECT ST_DISTANCE(a.l, b.l) FROM lgd a, lgd b " +
      "WHERE a.i = 1 AND b.i = 1") == 0.0)
    assert(one("SELECT ST_DISTANCE(a.l, b.l) > 0 FROM lgd a, lgd b " +
      "WHERE a.i = 1 AND b.i = 2") == true)
    engine.query(
      "CREATE TABLE lgi (i int primary key, p polygon NOT NULL)")
    engine.query(s"INSERT INTO lgi VALUES (1, POLYGON(LINESTRING(" +
      s"${polyPointList(N)})))")
    assert(one("SELECT ST_INTERSECTS(p, POINT(1,0)) FROM lgi WHERE i = 1")
      == true)
    assert(one("SELECT ST_INTERSECTS(p, POINT(0,1000)) FROM lgi WHERE i = 1")
      == false)
    assert(one("SELECT ST_PERIMETER(p) > 0 FROM lgi WHERE i = 1") == true)
    // all points on the x-axis: zero area
    assert(one("SELECT ST_AREA(p) FROM lgi WHERE i = 1") == 0.0)
    engine.runScript("drop table lgd; drop table lgi;")
  }
}
