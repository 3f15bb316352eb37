package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, Sqrt}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** VECTOR distance family — reference sql/types/vector.go:34 and
  * sql/expression/function/vector/distance.go:28 (L2², Euclidean, Cosine).
  *
  * Native expressions over `ArrayType(DoubleType)`: one tight primitive
  * loop per pair instead of the interpreted `zip_with`+`aggregate`
  * higher-order chain (which allocates a lambda frame per element). Both
  * expressions implement `doGenCode`, so the loop is inlined into
  * whole-stage codegen — the 100 TB similarity path never falls back to
  * interpreted eval. The summation order is the same sequential left
  * fold, so results are bit-identical to the HOF formulation and the
  * DuckDB oracle.
  */
object vector {

  private def dots(a: ArrayData, b: ArrayData): Double = {
    val x = a.toDoubleArray(); val y = b.toDoubleArray()
    val n = math.min(x.length, y.length)
    var acc = 0.0
    var i = 0
    while (i < n) { acc += x(i) * y(i); i += 1 }
    acc
  }

  /** VEC_DOT(a, b): sequential-fold dot product. */
  case class VecDot(left: Expression, right: Expression)
      extends BinaryExpression {
    override def dataType: DataType = DoubleType
    override def nullable: Boolean = true
    override def nullSafeEval(a: Any, b: Any): Any =
      dots(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, (a, b) => {
        val xs = ctx.freshName("xs"); val ys = ctx.freshName("ys")
        val n = ctx.freshName("n"); val i = ctx.freshName("i")
        val acc = ctx.freshName("acc")
        s"""
           |double[] $xs = $a.toDoubleArray();
           |double[] $ys = $b.toDoubleArray();
           |int $n = java.lang.Math.min($xs.length, $ys.length);
           |double $acc = 0.0;
           |for (int $i = 0; $i < $n; $i++) { $acc += $xs[$i] * $ys[$i]; }
           |${ev.value} = $acc;
         """.stripMargin
      })
    override protected def withNewChildrenInternal(l: Expression, r: Expression) =
      copy(l, r)
  }

  /** VEC_DISTANCE_L2_SQUARED(a, b). */
  case class VecL2Sq(left: Expression, right: Expression)
      extends BinaryExpression {
    override def dataType: DataType = DoubleType
    override def nullable: Boolean = true
    override def nullSafeEval(a: Any, b: Any): Any = {
      val x = a.asInstanceOf[ArrayData].toDoubleArray()
      val y = b.asInstanceOf[ArrayData].toDoubleArray()
      val n = math.min(x.length, y.length)
      var acc = 0.0
      var i = 0
      while (i < n) { val d = x(i) - y(i); acc += d * d; i += 1 }
      acc
    }
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, (a, b) => {
        val xs = ctx.freshName("xs"); val ys = ctx.freshName("ys")
        val n = ctx.freshName("n"); val i = ctx.freshName("i")
        val acc = ctx.freshName("acc"); val dv = ctx.freshName("d")
        s"""
           |double[] $xs = $a.toDoubleArray();
           |double[] $ys = $b.toDoubleArray();
           |int $n = java.lang.Math.min($xs.length, $ys.length);
           |double $acc = 0.0;
           |for (int $i = 0; $i < $n; $i++) {
           |  double $dv = $xs[$i] - $ys[$i];
           |  $acc += $dv * $dv;
           |}
           |${ev.value} = $acc;
         """.stripMargin
      })
    override protected def withNewChildrenInternal(l: Expression, r: Expression) =
      copy(l, r)
  }

  /** VEC_ARGMIN_L2SQ(v, cands): nearest candidate by squared L2 over a
    * (broadcast) candidate array `array<struct<cid: long, cv:
    * array<double>>>` — returns `struct<d2: double, cid: long>`, ties on
    * d2 broken by the smaller cid (the same (d2, cid) order a row_number
    * window / min(struct) argmin uses).
    *
    * This is the narrow centroid-assignment kernel for the IVF / k-means
    * / PQ operators: computing the argmin per row inside the scan stage
    * removes the explode-to-K-rows + exchange + sort (or window) the
    * join-based assignment needs — zero shuffle at any scale (guide
    * §2.4) — and the codegen'd primitive loop avoids the interpreted
    * per-element lambda frames of the equivalent
    * array_min(transform(...)) higher-order chain. */
  case class VecArgminL2Sq(left: Expression, right: Expression)
      extends BinaryExpression {
    override def dataType: DataType = StructType(Seq(
      StructField("d2", DoubleType, nullable = false),
      StructField("cid", LongType, nullable = false)))
    override def nullable: Boolean = true
    override def nullSafeEval(v: Any, cs: Any): Any = {
      val x = v.asInstanceOf[ArrayData].toDoubleArray()
      val cands = cs.asInstanceOf[ArrayData]
      val n = cands.numElements()
      if (n == 0) return null
      var bestD = 0.0; var bestC = 0L; var found = false
      var i = 0
      while (i < n) {
        val cand = cands.getStruct(i, 2)
        val cid = cand.getLong(0)
        val cv = cand.getArray(1).toDoubleArray()
        val m = math.min(x.length, cv.length)
        var acc = 0.0; var j = 0
        while (j < m) { val dd = x(j) - cv(j); acc += dd * dd; j += 1 }
        // total order via Double.compare so NaN distances sort LAST like
        // Spark's double ordering (a plain `<` is NaN-sticky: a NaN first
        // candidate would win every later comparison); identical on
        // finite inputs — d2 is a sum of squares, so -0.0 never occurs
        val cmp = java.lang.Double.compare(acc, bestD)
        if (!found || cmp < 0 || (cmp == 0 && cid < bestC)) {
          found = true; bestD = acc; bestC = cid
        }
        i += 1
      }
      new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
        Array[Any](bestD, bestC))
    }
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, (v, cs) => {
        val xs = ctx.freshName("xs"); val n = ctx.freshName("n")
        val i = ctx.freshName("i"); val j = ctx.freshName("j")
        val cand = ctx.freshName("cand"); val cid = ctx.freshName("cid")
        val cv = ctx.freshName("cv"); val m = ctx.freshName("m")
        val acc = ctx.freshName("acc"); val dv = ctx.freshName("d")
        val bestD = ctx.freshName("bestD"); val bestC = ctx.freshName("bestC")
        val found = ctx.freshName("found"); val cmp = ctx.freshName("cmp")
        s"""
           |double[] $xs = $v.toDoubleArray();
           |int $n = $cs.numElements();
           |double $bestD = 0.0; long $bestC = 0L; boolean $found = false;
           |for (int $i = 0; $i < $n; $i++) {
           |  InternalRow $cand = $cs.getStruct($i, 2);
           |  long $cid = $cand.getLong(0);
           |  double[] $cv = $cand.getArray(1).toDoubleArray();
           |  int $m = java.lang.Math.min($xs.length, $cv.length);
           |  double $acc = 0.0;
           |  for (int $j = 0; $j < $m; $j++) {
           |    double $dv = $xs[$j] - $cv[$j];
           |    $acc += $dv * $dv;
           |  }
           |  // NaN-safe total order (NaN sorts last, like Spark doubles)
           |  int $cmp = java.lang.Double.compare($acc, $bestD);
           |  if (!$found || $cmp < 0 || ($cmp == 0 && $cid < $bestC)) {
           |    $found = true; $bestD = $acc; $bestC = $cid;
           |  }
           |}
           |if ($found) {
           |  ${ev.value} = new org.apache.spark.sql.catalyst.expressions
           |    .GenericInternalRow(new Object[]{$bestD, $bestC});
           |} else {
           |  ${ev.isNull} = true;
           |}
         """.stripMargin
      })
    override protected def withNewChildrenInternal(l: Expression, r: Expression) =
      copy(l, r)
  }

  // ---- VECTOR binary form (reference sql/types/vector.go: packed
  // little-endian float32; STRING_TO_VECTOR / VECTOR_TO_STRING in
  // vector_function_queries.go operate on those bytes, so HEX/MD5/
  // TO_BASE64/BIT_LENGTH over a vector see the serialized form) -------

  private[functions] def parseVecText(s: String): Array[Double] = {
    val t = s.trim
    if (!t.startsWith("[") || !t.endsWith("]")) return null
    val body = t.substring(1, t.length - 1).trim
    if (body.isEmpty) return Array.empty
    try body.split(",").map(_.trim.toDouble)
    catch { case _: NumberFormatException => null }
  }

  private def anyToDoubles(v: Any, dt: DataType): Array[Double] = dt match {
    case BinaryType =>
      val bytes = v.asInstanceOf[Array[Byte]]
      if (bytes.length % 4 != 0) return null
      val bb = java.nio.ByteBuffer.wrap(bytes)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      Array.fill(bytes.length / 4)(bb.getFloat.toDouble)
    case _: StringType =>
      parseVecText(v.asInstanceOf[org.apache.spark.unsafe.types.UTF8String]
        .toString)
    case ArrayType(DoubleType, _) =>
      v.asInstanceOf[ArrayData].toDoubleArray()
    case ArrayType(FloatType, _) =>
      v.asInstanceOf[ArrayData].toFloatArray().map(_.toDouble)
    case _ => null
  }

  /** Normalize any vector spelling — packed float32 binary, '[…]' text,
    * array<float|double> — to array<double> for the distance loops. */
  case class VecCoerce(child: Expression)
      extends org.apache.spark.sql.catalyst.expressions.UnaryExpression
      with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {
    override def dataType: DataType = ArrayType(DoubleType)
    override def nullable: Boolean = true
    override def nullSafeEval(v: Any): Any = {
      val ds = anyToDoubles(v, child.dataType)
      if (ds == null) null
      else org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(ds)
    }
    override protected def withNewChildInternal(nc: Expression) = copy(nc)
  }

  /** Go %v float rendering for the strict-conversion error messages. */
  private def goNum(d: Double): String =
    if (d == d.toLong && math.abs(d) < 1e15) d.toLong.toString
    else {
      val s = java.lang.Double.toString(d)
      val e = s.indexOf('E')
      if (e < 0) s
      else {
        val m0 = s.substring(0, e)
        val m = if (m0.endsWith(".0")) m0.dropRight(2) else m0
        val ei = s.substring(e + 1).toInt
        m + "e" + (if (ei >= 0) "+" else "") + ei
      }
    }

  /** Strict JSON-text -> float32s (reference types/vector.go
    * ConvertToVector error taxonomy, vector_ddl_queries.go error rows). */
  private[functions] def parseVecStrict(s0: String): Array[Double] = {
    val s = s0.trim
    if (s.startsWith("\""))
      throw new IllegalArgumentException(
        "can't convert JSON to vector; expected array, got string")
    if (!s.startsWith("[") || !s.endsWith("]"))
      throw new IllegalArgumentException(
        s"can't convert JSON to vector: invalid character " +
        s"'${s.headOption.getOrElse(' ')}' looking for beginning of value")
    val body = s.substring(1, s.length - 1).trim
    if (body.isEmpty) return Array.empty
    body.split(",").map(_.trim).map { tok =>
      if (tok.startsWith("\""))
        throw new IllegalArgumentException("can't convert JSON to vector; " +
          "expected array of floats, but array contained string")
      val d =
        try tok.toDouble
        catch { case _: NumberFormatException =>
          throw new IllegalArgumentException(
            s"can't convert JSON to vector: invalid character " +
            s"'${tok.headOption.getOrElse(' ')}' looking for beginning " +
            s"of value")
        }
      // float32 range check: finite double overflowing float32
      if (!d.isInfinite && d.toFloat.isInfinite)
        throw new IllegalArgumentException(
          s"data cannot be converted to a valid vector: ${goNum(d)}")
      d
    }
  }

  /** STRING_TO_VECTOR / TO_VECTOR / VEC_FROMTEXT: '…' JSON text (or an
    * array) -> packed little-endian float32 bytes; malformed text is a
    * strict conversion ERROR, not NULL. */
  case class VecPack(child: Expression)
      extends org.apache.spark.sql.catalyst.expressions.UnaryExpression
      with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {
    override def dataType: DataType = BinaryType
    override def nullable: Boolean = true
    override def nullSafeEval(v: Any): Any = {
      val ds = child.dataType match {
        case _: StringType => parseVecStrict(
          v.asInstanceOf[org.apache.spark.unsafe.types.UTF8String].toString)
        case dt => anyToDoubles(v, dt)
      }
      if (ds == null) return null
      val bb = java.nio.ByteBuffer.allocate(ds.length * 4)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      ds.foreach(d => bb.putFloat(d.toFloat))
      bb.array()
    }
    override protected def withNewChildInternal(nc: Expression) = copy(nc)
  }

  /** VECTOR_TO_STRING / FROM_VECTOR / VEC_TOTEXT: any vector spelling
    * -> '[1, 2]' (integral float32 values render bare, like the
    * reference's Go %v formatting). */
  case class VecUnpackText(child: Expression)
      extends org.apache.spark.sql.catalyst.expressions.UnaryExpression
      with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {
    override def dataType: DataType = StringType
    override def nullable: Boolean = true
    override def nullSafeEval(v: Any): Any = {
      val ds = anyToDoubles(v, child.dataType)
      if (ds == null) return null
      def fmt(d: Double): String = {
        val f = d.toFloat
        if (f == f.toLong && math.abs(f) < 1e15) f.toLong.toString
        else {
          val s = f.toString
          if (s.endsWith(".0")) s.dropRight(2) else s
        }
      }
      org.apache.spark.unsafe.types.UTF8String
        .fromString(ds.map(fmt).mkString("[", ", ", "]"))
    }
    override protected def withNewChildInternal(nc: Expression) = copy(nc)
  }

  import org.apache.spark.sql.GraftBridge
  private def c(e: Expression): Column = GraftBridge.column(e)
  private def x(col: Column): Expression = GraftBridge.expression(col)

  def vecDot(a: Column, b: Column): Column = c(VecDot(x(a), x(b)))
  /** argmin over candidates: struct<d2: double, cid: long>, ties → min cid */
  def vecArgminL2Sq(v: Column, cands: Column): Column =
    c(VecArgminL2Sq(x(v), x(cands)))
  def vecL2Sq(a: Column, b: Column): Column = c(VecL2Sq(x(a), x(b)))
  def vecL2(a: Column, b: Column): Column = c(Sqrt(VecL2Sq(x(a), x(b))))
  def vecNorm(a: Column): Column = c(Sqrt(VecDot(x(a), x(a))))
  /** cosine DISTANCE (1 - similarity), the reference's VEC_DISTANCE_COSINE. */
  def vecCosineDist(a: Column, b: Column): Column = {
    val ax = x(a); val bx = x(b)
    org.apache.spark.sql.functions.lit(1.0) -
      c(VecDot(ax, bx)) / (c(Sqrt(VecDot(ax, ax))) * c(Sqrt(VecDot(bx, bx))))
  }

  /** TO_VECTOR / VEC_FROMTEXT: '[1.0,2.0]' -> array<double> (reference
    * vector/distance.go text forms) — from_json on an array schema. */
  def vecFromText(c: Column): Column =
    org.apache.spark.sql.functions.from_json(c, ArrayType(DoubleType))

  /** FROM_VECTOR / VEC_TOTEXT: array -> compact '[1.0,2.0]' text. */
  def vecToText(c: Column): Column =
    org.apache.spark.sql.functions.to_json(c)

  def register(spark: SparkSession): Unit = {
    val reg = GraftBridge.functionRegistry(spark)
    reg.createOrReplaceTempFunction("vec_dot", es => VecDot(es(0), es(1)), "scala_udf")
    reg.createOrReplaceTempFunction("vec_distance_l2_squared",
      es => VecL2Sq(es(0), es(1)), "scala_udf")
    reg.createOrReplaceTempFunction("vec_distance_euclidean",
      es => Sqrt(VecL2Sq(es(0), es(1))), "scala_udf")
  }
}
