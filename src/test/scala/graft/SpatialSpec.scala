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

  test("st_geomfromtext validates and canonicalizes WKT") {
    assert(one[String](sp.stGeomFromText(lit("  point( 1.0   2.5 ) ")))
      == "POINT(1 2.5)")
    assert(one[String](sp.stGeomFromText(lit("linestring(0 0 ,  1 1)")))
      == "LINESTRING(0 0,1 1)")
    assert(one[String](sp.stGeomFromText(
      lit("polygon((0 0, 4 0, 4 4, 0 4, 0 0),(1 1, 2 1, 2 2, 1 2, 1 1))")))
      == "POLYGON((0 0,4 0,4 4,0 4,0 0),(1 1,2 1,2 2,1 2,1 1))")
    // malformed: unclosed ring, <4 points, bad tag, arity
    assert(one[Any](sp.stGeomFromText(lit("POLYGON((0 0, 1 0, 1 1, 0 1))"))) == null)
    assert(one[Any](sp.stGeomFromText(lit("POLYGON((0 0, 1 0, 0 0))"))) == null)
    assert(one[Any](sp.stGeomFromText(lit("CIRCLE(0 0, 5)"))) == null)
    assert(one[Any](sp.stGeomFromText(lit("POINT(1 2, 3 4)"))) == null)
  }

  test("st_intersects: crossings, touches, containment, disjoint") {
    val sq = lit("POLYGON((0 0, 4 0, 4 4, 0 4, 0 0))")
    assert(one[Boolean](sp.stIntersects(sq, lit("LINESTRING(-1 2, 5 2)"))))
    assert(one[Boolean](sp.stIntersects(sq, lit("POLYGON((4 4, 6 4, 6 6, 4 6, 4 4))")))) // corner touch
    assert(one[Boolean](sp.stIntersects(sq, lit("POLYGON((1 1, 2 1, 2 2, 1 2, 1 1))")))) // contained
    assert(one[Boolean](sp.stIntersects(sq, lit("POINT(2 2)"))))
    assert(!one[Boolean](sp.stIntersects(sq, lit("POINT(9 9)"))))
    assert(!one[Boolean](sp.stIntersects(sq, lit("POLYGON((5 5, 7 5, 7 7, 5 7, 5 5))"))))
    assert(one[Boolean](sp.stIntersects(
      lit("LINESTRING(0 0, 2 2)"), lit("LINESTRING(0 2, 2 0)"))))
    assert(one[Boolean](sp.stIntersects(lit("POINT(1 1)"), lit("POINT(1 1)"))))
    assert(!one[Boolean](sp.stIntersects(lit("POINT(1 1)"), lit("POINT(1 2)"))))
  }

  test("st_contains respects holes") {
    val donut = lit("POLYGON((0 0, 6 0, 6 6, 0 6, 0 0),(2 2, 4 2, 4 4, 2 4, 2 2))")
    assert(one[Boolean](sp.stContains(donut, lit("POINT(1 1)"))))
    assert(!one[Boolean](sp.stContains(donut, lit("POINT(3 3)")))) // in the hole
    assert(!one[Boolean](sp.stContains(donut, lit("POINT(9 9)"))))
    assert(one[Boolean](sp.stContains(
      lit("POLYGON((0 0, 6 0, 6 6, 0 6, 0 0))"),
      lit("POLYGON((1 1, 2 1, 2 2, 1 2, 1 1))"))))
  }

  test("geohash matches public test vectors and round-trips") {
    // wikipedia's canonical example: ezs42 ~ (42.6, -5.6)
    assert(one[String](sp.stGeoHash(lit(-5.6), lit(42.6), lit(5))) == "ezs42")
    assert(one[String](sp.stGeoHash(lit(-74.0059), lit(40.7128), lit(7))) == "dr5regw")
    assert(math.abs(one[Double](sp.stLatFromGeoHash(lit("ezs42"))) - 42.60498) < 0.001)
    assert(math.abs(one[Double](sp.stLongFromGeoHash(lit("ezs42"))) - (-5.60302)) < 0.001)
    assert(one[String](sp.stPointFromGeoHash(
      sp.stGeoHash(lit(0.0), lit(0.0), lit(1)))).startsWith("POINT("))
    assert(one[Any](sp.stGeoHash(lit(500.0), lit(0.0), lit(5))) == null)
    assert(one[Any](sp.stLatFromGeoHash(lit("ii"))) == null) // i not in base32
  }

  test("accessors: start/end/pointn/numpoints/isclosed/envelope/type/dim") {
    val line = lit("LINESTRING(0 0, 3 4, 6 8)")
    assert(one[String](sp.stStartPoint(line)) == "POINT(0 0)")
    assert(one[String](sp.stEndPoint(line)) == "POINT(6 8)")
    assert(one[String](sp.stPointN(line, lit(2))) == "POINT(3 4)")
    assert(one[Any](sp.stPointN(line, lit(9))) == null)
    assert(one[Int](sp.stNumPoints(line)) == 3)
    assert(!one[Boolean](sp.stIsClosed(line)))
    assert(one[Boolean](sp.stIsClosed(lit("LINESTRING(0 0, 1 0, 0 1, 0 0)"))))
    assert(one[String](sp.stEnvelope(lit("LINESTRING(1 5, 4 2)")))
      == "POLYGON((1 2,4 2,4 5,1 5,1 2))")
    assert(one[String](sp.stGeometryType(lit("POINT(1 1)"))) == "POINT")
    assert(one[Int](sp.stDimension(lit("POLYGON((0 0,1 0,1 1,0 0))"))) == 2)
    assert(one[Int](sp.stSrid(lit("POINT(1 1)"))) == 0)
    assert(one[String](sp.stSwapXY(lit("POINT(1 2)"))) == "POINT(2 1)")
    assert(one[String](sp.stExteriorRing(
      lit("POLYGON((0 0,2 0,2 2,0 2,0 0),(1 1,1.5 1,1.5 1.5,1 1.5,1 1))")))
      == "LINESTRING(0 0,2 0,2 2,0 2,0 0)")
    assert(one[Int](sp.stNumInteriorRings(
      lit("POLYGON((0 0,2 0,2 2,0 2,0 0),(1 1,1.5 1,1.5 1.5,1 1.5,1 1))"))) == 1)
    assert(one[Boolean](sp.stDisjoint(lit("POINT(9 9)"),
      lit("POLYGON((0 0,2 0,2 2,0 2,0 0))"))))
  }

  test("typed *fromtext constructors enforce their geometry type") {
    val e = new Engine(spark)
    val r = e.query(
      """SELECT st_pointfromtext('point( 1  2 )') AS p,
               st_linefromtext('POINT(1 2)') AS bad,
               st_polygonfromtext('polygon((0 0, 1 0, 1 1, 0 0))') AS poly,
               st_numpoints(st_exteriorring(
                 st_polyfromtext('POLYGON((0 0,1 0,1 1,0 0))'))) AS nring""")
      .collect()(0)
    assert(r.getString(0) == "POINT(1 2)")
    assert(r.isNullAt(1))
    assert(r.getString(2) == "POLYGON((0 0,1 0,1 1,0 0))")
    assert(r.getInt(3) == 4)
  }

  test("WKB round-trips through st_aswkb / st_geomfromwkb") {
    val e = new Engine(spark)
    val r = e.query(
      """SELECT st_geomfromwkb(st_aswkb('POINT(1.5 -2)')) AS p,
               st_geomfromwkb(st_aswkb('LINESTRING(0 0, 3 4, 6 8)')) AS l,
               st_geomfromwkb(st_aswkb(
                 'POLYGON((0 0,2 0,2 2,0 2,0 0),(1 1,1.5 1,1.5 1.5,1 1.5,1 1))')) AS poly,
               st_pointfromwkb(st_aswkb('POINT(7 9)')) AS tp,
               st_pointfromwkb(st_aswkb('LINESTRING(0 0, 1 1)')) AS bad,
               octet_length(st_asbinary('POINT(1 2)')) AS n
        """).collect()(0)
    assert(r.getString(0) == "POINT(1.5 -2)")
    assert(r.getString(1) == "LINESTRING(0 0,3 4,6 8)")
    assert(r.getString(2) ==
      "POLYGON((0 0,2 0,2 2,0 2,0 0),(1 1,1.5 1,1.5 1.5,1 1.5,1 1))")
    assert(r.getString(3) == "POINT(7 9)")
    assert(r.isNullAt(4))
    assert(r.getInt(5) == 21) // 1 + 4 + 16
    assert(one[Any](sp.stGeomFromText(lit("POINT(1 2)"))) != null)
  }

  test("geometry column types in DDL with expression defaults " +
      "(spatial_queries.go SpatialScriptTests)") {
    val e = new Engine(spark)
    e.runScript(
      """CREATE TABLE spddl1 (i int primary key, p point default (point(123.456, 7.89)));
        |insert into spddl1 (i) values (0);
        |""".stripMargin)
    assert(e.query("select st_aswkt(p) from spddl1").collect()(0)
      .getString(0) == "POINT(123.456 7.89)")
    e.query("drop table spddl1")
    e.runScript(
      """CREATE TABLE spddl2 (i int primary key, l linestring default (linestring(point(1,2), point(3,4))));
        |insert into spddl2 (i) values (0);
        |""".stripMargin)
    assert(e.query("select st_aswkt(l) from spddl2").collect()(0)
      .getString(0) == "LINESTRING(1 2,3 4)")
    e.query("drop table spddl2")
    // a bare GEOMETRY column accepts any constructed geometry
    e.runScript(
      """CREATE TABLE spddl3 (i int primary key, g geometry);
        |INSERT INTO spddl3 VALUES (1, ST_GEOMFROMTEXT(ST_ASWKT(POINT(1,2))));
        |INSERT INTO spddl3 VALUES (2, LINESTRING(POINT(0, 0),POINT(2, 2)));
        |""".stripMargin)
    assert(e.query("select i, ST_ASWKT(g) from spddl3 order by i").collect()
      .map(r => (r.getInt(0), r.getString(1))).toSeq ==
      Seq((1, "POINT(1 2)"), (2, "LINESTRING(0 0,2 2)")))
    e.query("drop table spddl3")
  }

  test("typed multi-geometry WKB constructors (registry.go st_m*fromwkb)") {
    val e = new Engine(spark)
    val r = e.query(
      """SELECT st_mpointfromwkb(st_aswkb('MULTIPOINT(1 2, 3 4)')) AS mp,
               st_multipointfromwkb(st_aswkb('MULTIPOINT(1 2)')) AS mp2,
               st_mlinefromwkb(st_aswkb('MULTILINESTRING((0 0,1 1),(2 2,3 3))')) AS ml,
               st_multilinestringfromwkb(st_aswkb('MULTILINESTRING((0 0,1 1))')) AS ml2,
               st_mpolyfromwkb(st_aswkb(
                 'MULTIPOLYGON(((0 0,1 0,1 1,0 0)),((2 2,3 2,3 3,2 2)))')) AS mpoly,
               st_multipolygonfromwkb(st_aswkb('MULTIPOLYGON(((0 0,1 0,1 1,0 0)))')) AS mpoly2,
               st_geomcollfromwkb(st_aswkb(
                 'GEOMETRYCOLLECTION(POINT(1 2),LINESTRING(0 0,1 1))')) AS gc,
               st_geometrycollectionfromwkb(st_aswkb('GEOMETRYCOLLECTION(POINT(1 2))')) AS gc2,
               st_mpointfromwkb(st_aswkb('POINT(1 2)')) AS bad_type,
               st_mlinefromwkb(st_aswkb('MULTIPOINT(1 2)')) AS bad_type2
        """).collect()(0)
    assert(r.getString(0) == "MULTIPOINT((1 2),(3 4))")
    assert(r.getString(1) == "MULTIPOINT((1 2))")
    assert(r.getString(2) == "MULTILINESTRING((0 0,1 1),(2 2,3 3))")
    assert(r.getString(3) == "MULTILINESTRING((0 0,1 1))")
    assert(r.getString(4) == "MULTIPOLYGON(((0 0,1 0,1 1,0 0)),((2 2,3 2,3 3,2 2)))")
    assert(r.getString(5) == "MULTIPOLYGON(((0 0,1 0,1 1,0 0)))")
    assert(r.getString(6) == "GEOMETRYCOLLECTION(POINT(1 2),LINESTRING(0 0,1 1))")
    assert(r.getString(7) == "GEOMETRYCOLLECTION(POINT(1 2))")
    assert(r.isNullAt(8))
    assert(r.isNullAt(9))
  }

  test("centroid / perimeter / equals / interiorringn / validate") {
    val e = new Engine(spark)
    val r = e.query(
      """SELECT st_centroid('POLYGON((0 0, 4 0, 4 4, 0 4, 0 0))') AS c_sq,
               st_centroid('LINESTRING(0 0, 4 0)') AS c_ln,
               st_centroid('POINT(2 3)') AS c_pt,
               st_perimeter('POLYGON((0 0, 3 0, 3 4, 0 4, 0 0))') AS per,
               st_equals('point( 1 2 )', 'POINT(1 2)') AS eq_t,
               st_equals('POINT(1 2)', 'POINT(2 1)') AS eq_f,
               st_interiorringn(
                 'POLYGON((0 0,4 0,4 4,0 4,0 0),(1 1,2 1,2 2,1 2,1 1))', 1)
                 AS hole,
               st_validate('POLYGON((0 0, 1 0, 1 1))') AS invalid,
               st_issimple('POINT(1 1)') AS simple""").collect()(0)
    assert(r.getString(0) == "POINT(2 2)")
    assert(r.getString(1) == "POINT(2 0)")
    assert(r.getString(2) == "POINT(2 3)")
    assert(r.getDouble(3) == 14.0)
    assert(r.getBoolean(4) && !r.getBoolean(5))
    assert(r.getString(6) == "LINESTRING(1 1,2 1,2 2,1 2,1 1)")
    assert(r.isNullAt(7))
    assert(r.getBoolean(8))
  }

  test("GeoJSON round-trips through st_asgeojson / st_geomfromgeojson") {
    val e = new Engine(spark)
    val r = e.query(
      """SELECT st_asgeojson('POINT(1.5 -2)') AS pj,
               st_geomfromgeojson(st_asgeojson('LINESTRING(0 0, 3 4)')) AS l,
               st_geomfromgeojson(st_asgeojson(
                 'POLYGON((0 0,2 0,2 2,0 2,0 0))')) AS poly,
               st_geomfromgeojson('{"type":"Point","coordinates":[7,9]}') AS p,
               st_geomfromgeojson('{"type":"Nope","coordinates":[]}') AS bad""")
      .collect()(0)
    assert(r.getString(0) == """{"type":"Point","coordinates":[1.5,-2]}""")
    assert(r.getString(1) == "LINESTRING(0 0,3 4)")
    assert(r.getString(2) == "POLYGON((0 0,2 0,2 2,0 2,0 0))")
    assert(r.getString(3) == "POINT(7 9)")
    assert(r.isNullAt(4))
  }

  test("SQL registration exposes st_* on the session") {
    val e = new Engine(spark)
    val r = e.query(
      "SELECT st_distance('POINT(0 0)', 'POINT(3 4)') AS d, st_area('POLYGON((0 0, 2 0, 2 2, 0 2, 0 0))') AS a")
      .collect()(0)
    assert(r.getDouble(0) == 5.0 && r.getDouble(1) == 4.0)
  }

  // Reference registry rows: sql/expression/function/registry.go:252
  // (st_endpoint), :295-297 (st_numinteriorrings, st_numpoints), :308
  // (st_startpoint) — these must resolve from SQL text, not just the DSL.
  test("SQL text resolves st_startpoint/st_endpoint/st_numpoints/st_numinteriorrings") {
    val e = new Engine(spark)
    val r = e.query(
      """SELECT ST_STARTPOINT(ST_GEOMFROMTEXT('LINESTRING(0 0,1 1)')) AS sp,
               ST_ENDPOINT(ST_GEOMFROMTEXT('LINESTRING(0 0,1 1)')) AS ep,
               ST_NUMPOINTS(ST_GEOMFROMTEXT('LINESTRING(0 0,1 1,2 2)')) AS np,
               ST_NUMINTERIORRINGS(ST_GEOMFROMTEXT(
                 'POLYGON((0 0,4 0,4 4,0 4,0 0),(1 1,2 1,2 2,1 2,1 1))')) AS nir""")
      .collect()(0)
    assert(r.getString(0) == "POINT(0 0)")
    assert(r.getString(1) == "POINT(1 1)")
    assert(r.getInt(2) == 3)
    assert(r.getInt(3) == 1)
  }

  test("st_isempty, st_convexhull, st_longitude/st_latitude") {
    val e = new Engine(spark)
    val r = e.query(
      """SELECT st_isempty('POINT(1 2)') AS ne,
               st_isempty('NOT A GEOM') AS bad,
               st_convexhull('POINT(5 5)') AS h_pt,
               st_convexhull('LINESTRING(0 0, 2 2, 1 1)') AS h_line,
               st_convexhull('LINESTRING(0 0, 1 3, 2 1, 3 4, 4 0)') AS h_poly,
               st_convexhull('POLYGON((0 0,4 0,4 4,0 4,0 0),(1 1,2 1,2 2,1 2,1 1))') AS h_sq,
               st_longitude(st_srid('POINT(12.5 -3)', 4326)) AS lon,
               st_latitude(st_srid('POINT(12.5 -3)', 4326)) AS lat""").collect()(0)
    assert(!r.getBoolean(0))
    assert(r.isNullAt(1))
    assert(r.getString(2) == "POINT(5 5)")
    // collinear points collapse to the extreme pair
    assert(r.getString(3) == "LINESTRING(0 0,2 2)")
    // interior point (2 1) dropped, upper-hull vertex (1 3) kept
    assert(r.getString(4) == "POLYGON((0 0,4 0,3 4,1 3,0 0))")
    // hole vertices are interior: hull is the outer square
    assert(r.getString(5) == "POLYGON((0 0,4 0,4 4,0 4,0 0))")
    assert(r.getDouble(6) == 12.5 && r.getDouble(7) == -3.0)
    // a cartesian point has no latitude (ErrNonGeographic,
    // x_y_latitude_longitude.go:316)
    assert(intercept[Exception] {
      e.query("SELECT st_latitude('POINT(1 2)') AS v").collect()
    }.getMessage.contains("geographic"))
  }

  test("SRID wave 1: st_srid read/re-tag, st_geomfromtext(wkt, srid) " +
      "range checks, st_distance SRID guards (st_srid.go, geometry.go:79, " +
      "st_distance.go:167-175)") {
    val e = new Engine(spark)
    val r = e.query(
      """SELECT st_srid('POINT(1 2)') AS s0,
               st_srid(st_srid('POINT(1 2)', 4326)) AS s1,
               st_srid(st_geomfromtext('POINT(10 20)', 4326)) AS s2,
               st_astext(st_srid('POINT(1 2)', 4326)) AS strip,
               st_x(st_srid('POINT(1 2)', 4326)) AS px,
               st_srid(st_srid(st_srid('POINT(1 2)', 4326), 0)) AS back""")
      .collect()(0)
    assert(r.getInt(0) == 0 && r.getInt(1) == 4326 && r.getInt(2) == 4326)
    assert(r.getString(3) == "POINT(1 2)") // WKT output drops the tag
    assert(r.getDouble(4) == 1.0)
    assert(r.getInt(5) == 0)
    // unknown SRID: MySQL error 3548
    assert(intercept[Exception] {
      e.query("SELECT st_srid('POINT(1 2)', 999) AS v").collect()
    }.getMessage.contains("3548"))
    // geographic construction validates ranges (lat=Y, lon=X)
    assert(intercept[Exception] {
      e.query("SELECT st_geomfromtext('POINT(10 91)', 4326) AS v").collect()
    }.getMessage.contains("latitude"))
    assert(intercept[Exception] {
      e.query("SELECT st_geomfromtext('POINT(181 10)', 4326) AS v").collect()
    }.getMessage.contains("longitude"))
    // st_srid re-tags WITHOUT validating (SetSRID does not re-project)
    assert(e.query("SELECT st_srid(st_srid('POINT(500 500)', 4326)) AS v")
      .collect()(0).getInt(0) == 4326)
    // distance: mixed SRIDs error; geographic SRID is unsupported, like
    // the reference (no geodesic path exists there either)
    assert(intercept[Exception] {
      e.query("SELECT st_distance(st_srid('POINT(0 0)', 4326), 'POINT(1 1)') AS v")
        .collect()
    }.getMessage.contains("3033"))
    assert(intercept[Exception] {
      e.query(
        """SELECT st_distance(st_srid('POINT(0 0)', 4326),
                              st_srid('POINT(1 1)', 4326)) AS v""").collect()
    }.getMessage.contains("unsupported SRID"))
  }

  test("multi-geometry WKT round-trip (multipoint.go/multilinestring.go/" +
      "multipolygon.go/geometrycollection.go canonical forms)") {
    // both MySQL MULTIPOINT spellings canonicalize to wrapped points
    assert(one[String](sp.stGeomFromText(lit("MULTIPOINT(1 2, 3 4)")))
      == "MULTIPOINT((1 2),(3 4))")
    assert(one[String](sp.stGeomFromText(lit("multipoint((1 2),(3 4))")))
      == "MULTIPOINT((1 2),(3 4))")
    assert(one[String](sp.stGeomFromText(
      lit("MULTILINESTRING((0 0,1 1),(2 2,3 3,4 4))")))
      == "MULTILINESTRING((0 0,1 1),(2 2,3 3,4 4))")
    assert(one[String](sp.stGeomFromText(
      lit("MULTIPOLYGON(((0 0,1 0,1 1,0 0)),((2 2,3 2,3 3,2 2)))")))
      == "MULTIPOLYGON(((0 0,1 0,1 1,0 0)),((2 2,3 2,3 3,2 2)))")
    assert(one[String](sp.stGeomFromText(
      lit("GEOMETRYCOLLECTION(POINT(1 1),LINESTRING(0 0,2 2))")))
      == "GEOMETRYCOLLECTION(POINT(1 1),LINESTRING(0 0,2 2))")
    assert(one[String](sp.stGeomFromText(lit("GEOMETRYCOLLECTION EMPTY")))
      == "GEOMETRYCOLLECTION EMPTY")
    // malformed multis -> null
    assert(one[Any](sp.stGeomFromText(lit("MULTIPOINT()"))) == null)
    assert(one[Any](sp.stGeomFromText(
      lit("MULTIPOLYGON(((0 0,1 0,1 1)))"))) == null) // unclosed ring
  }

  test("st_numgeometries / st_geometryn (st_numgeometries.go:93, " +
      "st_geometryn.go:114)") {
    val mp = lit("MULTIPOINT((1 2),(3 4),(5 6))")
    assert(one[Int](sp.stNumGeometries(mp)) == 3)
    assert(one[String](sp.stGeometryN(mp, lit(2))) == "POINT(3 4)")
    assert(one[Any](sp.stGeometryN(mp, lit(4))) == null) // out of range
    assert(one[Any](sp.stGeometryN(mp, lit(0))) == null) // 1-based
    val gc = lit("GEOMETRYCOLLECTION(POINT(1 1),POLYGON((0 0,2 0,2 2,0 2,0 0)))")
    assert(one[Int](sp.stNumGeometries(gc)) == 2)
    assert(one[String](sp.stGeometryN(gc, lit(2)))
      == "POLYGON((0 0,2 0,2 2,0 2,0 0))")
    // simple geometries: NULL per MySQL
    assert(one[Any](sp.stNumGeometries(lit("POINT(1 1)"))) == null)
    assert(one[Any](sp.stGeometryN(lit("POINT(1 1)"), lit(1))) == null)
  }

  test("multi-geometry constructors, accessors, relations, WKB/GeoJSON") {
    val e = new Engine(spark)
    val r = e.query(
      """SELECT st_astext(multipoint(point(1,2), point(3,4))) AS mp,
               st_astext(multilinestring(linestring(point(0,0), point(1,1)),
                                         linestring(point(2,2), point(3,3)))) AS ml,
               st_astext(geomcollection(point(5,5), linestring(point(0,0), point(9,9)))) AS gc,
               st_geometrytype('MULTIPOLYGON(((0 0,1 0,1 1,0 0)))') AS gt,
               st_geometrytype('GEOMETRYCOLLECTION(POINT(1 1))') AS gtc,
               st_dimension('GEOMETRYCOLLECTION(POINT(1 1),LINESTRING(0 0,1 1))') AS dim,
               st_numgeometries(st_mpointfromtext('MULTIPOINT(1 1, 2 2)')) AS ng,
               st_intersects('MULTIPOINT((1 1),(9 9))',
                             'POLYGON((0 0,2 0,2 2,0 2,0 0))') AS mi,
               st_astext(st_geomfromwkb(st_aswkb('MULTILINESTRING((0 0,1 1),(2 2,3 3))'))) AS wkb_rt,
               st_asgeojson('MULTIPOINT((1 2),(3 4))') AS gj,
               st_astext(st_geomfromgeojson(
                 '{"type":"MultiPolygon","coordinates":[[[[0,0],[1,0],[1,1],[0,0]]]]}')) AS gj_rt,
               st_isclosed('MULTILINESTRING((0 0,1 1,0 0),(2 2,3 3,2 2))') AS closed""")
      .collect()(0)
    assert(r.getString(0) == "MULTIPOINT((1 2),(3 4))")
    assert(r.getString(1) == "MULTILINESTRING((0 0,1 1),(2 2,3 3))")
    assert(r.getString(2) == "GEOMETRYCOLLECTION(POINT(5 5),LINESTRING(0 0,9 9))")
    assert(r.getString(3) == "MULTIPOLYGON")
    assert(r.getString(4) == "GEOMCOLLECTION")
    assert(r.getInt(5) == 1)
    assert(r.getInt(6) == 2)
    assert(r.getBoolean(7)) // (1 1) sits in the polygon
    assert(r.getString(8) == "MULTILINESTRING((0 0,1 1),(2 2,3 3))")
    assert(r.getString(9) ==
      """{"type":"MultiPoint","coordinates":[[1,2],[3,4]]}""")
    assert(r.getString(10) == "MULTIPOLYGON(((0 0,1 0,1 1,0 0)))")
    assert(r.getBoolean(11))
  }
}
