package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Spatial ST_* core subset — SURVEY.md §2.8 spatial bucket (reference:
  * sql/expression/function/spatial/, ~90 functions / 15k LoC over the
  * GEOMETRY types in sql/types/geometry.go:34, point.go, polygon.go ...).
  *
  * Geometries are WKT strings (`POINT(x y)`, `LINESTRING(...)`,
  * `POLYGON((ring))`) — the pure-math subset (constructors, accessors,
  * distance, area, length, point-in-polygon) re-expressed as interpreted
  * Catalyst expressions. Remaining ST_* surface (multi-geometries, set
  * operations, SRID transforms) is catalogued as descoped in SURVEY §2.8.
  */
object spatial {

  // ---- WKT parsing (tolerant of extra whitespace) ---------------------

  private def coords(body: String): Array[(Double, Double)] =
    body.split(",").map { pair =>
      val ps = pair.trim.split("\\s+")
      (ps(0).toDouble, ps(1).toDouble)
    }

  /** POINT(x y) -> (x, y) or null. */
  private[functions] def parsePoint(wkt: String): (Double, Double) = {
    val s = wkt.trim
    if (!s.toUpperCase.startsWith("POINT")) return null
    val open = s.indexOf('('); val close = s.lastIndexOf(')')
    if (open < 0 || close < open) return null
    try {
      val c = coords(s.substring(open + 1, close))
      if (c.length == 1) c(0) else null
    } catch { case _: Exception => null }
  }

  /** LINESTRING(x1 y1, x2 y2, ...) -> points or null. */
  private[functions] def parseLine(wkt: String): Array[(Double, Double)] = {
    val s = wkt.trim
    if (!s.toUpperCase.startsWith("LINESTRING")) return null
    val open = s.indexOf('('); val close = s.lastIndexOf(')')
    if (open < 0 || close < open) return null
    try coords(s.substring(open + 1, close))
    catch { case _: Exception => null }
  }

  /** POLYGON((x1 y1, ...)) -> outer ring or null. Inner rings (holes) are
    * not supported in this subset. */
  private[functions] def parseRing(wkt: String): Array[(Double, Double)] = {
    val s = wkt.trim
    if (!s.toUpperCase.startsWith("POLYGON")) return null
    val open = s.indexOf("((")
    val close = s.indexOf("))")
    if (open < 0 || close < open) return null
    try coords(s.substring(open + 2, close))
    catch { case _: Exception => null }
  }

  /** Shoelace area of a simple ring (closed or open input). */
  private[functions] def ringArea(ring: Array[(Double, Double)]): Double = {
    var acc = 0.0
    var i = 0
    val n = ring.length
    while (i < n) {
      val (x1, y1) = ring(i)
      val (x2, y2) = ring((i + 1) % n)
      acc += x1 * y2 - x2 * y1
      i += 1
    }
    math.abs(acc) / 2.0
  }

  /** Ray-casting point-in-polygon (boundary counts as inside for the
    * horizontal-edge crossing convention used by the reference). */
  private[functions] def pointInRing(px: Double, py: Double,
                                     ring: Array[(Double, Double)]): Boolean = {
    var inside = false
    var i = 0
    val n = ring.length
    var j = n - 1
    while (i < n) {
      val (xi, yi) = ring(i)
      val (xj, yj) = ring(j)
      if ((yi > py) != (yj > py) &&
          px < (xj - xi) * (py - yi) / (yj - yi) + xi) inside = !inside
      j = i; i += 1
    }
    inside
  }

  // ---- expressions ----------------------------------------------------

  /** ST_X(point-wkt). */
  case class StX(child: Expression) extends UnaryExpression with CodegenFallback {
    override def dataType: DataType = DoubleType
    override def nullable: Boolean = true
    override def nullSafeEval(v: Any): Any = {
      val p = parsePoint(v.asInstanceOf[UTF8String].toString)
      if (p == null) null else p._1
    }
    override protected def withNewChildInternal(c: Expression) = copy(c)
  }

  /** ST_Y(point-wkt). */
  case class StY(child: Expression) extends UnaryExpression with CodegenFallback {
    override def dataType: DataType = DoubleType
    override def nullable: Boolean = true
    override def nullSafeEval(v: Any): Any = {
      val p = parsePoint(v.asInstanceOf[UTF8String].toString)
      if (p == null) null else p._2
    }
    override protected def withNewChildInternal(c: Expression) = copy(c)
  }

  /** ST_DISTANCE(point, point) — planar euclidean (reference
    * spatial/distance.go ST_Distance for cartesian SRID 0). */
  case class StDistance(left: Expression, right: Expression)
      extends BinaryExpression with CodegenFallback {
    override def dataType: DataType = DoubleType
    override def nullable: Boolean = true
    override def nullSafeEval(a: Any, b: Any): Any = {
      val p1 = parsePoint(a.asInstanceOf[UTF8String].toString)
      val p2 = parsePoint(b.asInstanceOf[UTF8String].toString)
      if (p1 == null || p2 == null) null
      else math.sqrt((p1._1 - p2._1) * (p1._1 - p2._1) +
                     (p1._2 - p2._2) * (p1._2 - p2._2))
    }
    override protected def withNewChildrenInternal(l: Expression, r: Expression) =
      copy(l, r)
  }

  /** ST_AREA(polygon) — shoelace over the outer ring. */
  case class StArea(child: Expression) extends UnaryExpression with CodegenFallback {
    override def dataType: DataType = DoubleType
    override def nullable: Boolean = true
    override def nullSafeEval(v: Any): Any = {
      val ring = parseRing(v.asInstanceOf[UTF8String].toString)
      if (ring == null) null else ringArea(ring)
    }
    override protected def withNewChildInternal(c: Expression) = copy(c)
  }

  /** ST_LENGTH(linestring) — sum of segment lengths. */
  case class StLength(child: Expression) extends UnaryExpression with CodegenFallback {
    override def dataType: DataType = DoubleType
    override def nullable: Boolean = true
    override def nullSafeEval(v: Any): Any = {
      val pts = parseLine(v.asInstanceOf[UTF8String].toString)
      if (pts == null || pts.length < 2) null
      else {
        var acc = 0.0
        var i = 1
        while (i < pts.length) {
          val dx = pts(i)._1 - pts(i - 1)._1
          val dy = pts(i)._2 - pts(i - 1)._2
          acc += math.sqrt(dx * dx + dy * dy)
          i += 1
        }
        acc
      }
    }
    override protected def withNewChildInternal(c: Expression) = copy(c)
  }

  /** ST_WITHIN(point, polygon) — ray casting. */
  case class StWithin(left: Expression, right: Expression)
      extends BinaryExpression with CodegenFallback {
    override def dataType: DataType = BooleanType
    override def nullable: Boolean = true
    override def nullSafeEval(a: Any, b: Any): Any = {
      val p = parsePoint(a.asInstanceOf[UTF8String].toString)
      val ring = parseRing(b.asInstanceOf[UTF8String].toString)
      if (p == null || ring == null) null
      else pointInRing(p._1, p._2, ring)
    }
    override protected def withNewChildrenInternal(l: Expression, r: Expression) =
      copy(l, r)
  }

  // ---- Column wrappers ------------------------------------------------

  import org.apache.spark.sql.GraftBridge
  private def c(e: Expression): Column = GraftBridge.column(e)
  private def x(col: Column): Expression = GraftBridge.expression(col)

  /** ST_POINT(x, y) -> WKT (pure Column composition, codegen'd). */
  def stPoint(px: Column, py: Column): Column =
    org.apache.spark.sql.functions.concat(
      org.apache.spark.sql.functions.lit("POINT("), px,
      org.apache.spark.sql.functions.lit(" "), py,
      org.apache.spark.sql.functions.lit(")"))

  def stX(g: Column): Column = c(StX(x(g)))
  def stY(g: Column): Column = c(StY(x(g)))
  def stDistance(a: Column, b: Column): Column = c(StDistance(x(a), x(b)))
  def stArea(g: Column): Column = c(StArea(x(g)))
  def stLength(g: Column): Column = c(StLength(x(g)))
  def stWithin(p: Column, poly: Column): Column = c(StWithin(x(p), x(poly)))
  /** ST_GeomFromText / ST_AsText are identity on the WKT representation. */
  def stGeomFromText(s: Column): Column = s
  def stAsText(g: Column): Column = g

  def register(spark: SparkSession): Unit = {
    val reg = GraftBridge.functionRegistry(spark)
    reg.createOrReplaceTempFunction("st_x", es => StX(es.head), "scala_udf")
    reg.createOrReplaceTempFunction("st_y", es => StY(es.head), "scala_udf")
    reg.createOrReplaceTempFunction("st_distance", es => StDistance(es(0), es(1)), "scala_udf")
    reg.createOrReplaceTempFunction("st_area", es => StArea(es.head), "scala_udf")
    reg.createOrReplaceTempFunction("st_length", es => StLength(es.head), "scala_udf")
    reg.createOrReplaceTempFunction("st_within", es => StWithin(es(0), es(1)), "scala_udf")
  }
}
