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

  import org.apache.spark.sql.GraftBridge
  private def c(e: Expression): Column = GraftBridge.column(e)
  private def x(col: Column): Expression = GraftBridge.expression(col)

  def vecDot(a: Column, b: Column): Column = c(VecDot(x(a), x(b)))
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
