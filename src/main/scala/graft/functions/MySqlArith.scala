package graft.functions

import java.math.{BigDecimal => JBD, RoundingMode}

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** MySQL arithmetic semantics Spark lacks — SURVEY.md §2.2 predicate /
  * §2.8 math buckets (reference: sql/expression/div.go, arithmetic.go,
  * bit_ops.go; sql/types/decimal.go DecimalDiv).
  *
  * The three interlocking MySQL behaviors:
  *   1. `/` on exact types yields DECIMAL whose scale grows by
  *      div_precision_increment (4) per division in a chain, with the
  *      rounding applied ONCE at the outermost arithmetic node
  *      (div.go getFinalScale / isOutermostDiv). Internal divisions
  *      carry ceil((s1+s2+4)/9)*9 digits, truncated (DecimalDiv).
  *   2. Bit ops coerce every operand to a rounded integer and yield
  *      UNSIGNED 64-bit results (bit_ops.go): -1.5 & -3.3 is
  *      18446744073709551612.
  *   3. Arithmetic on temporals/booleans/strings coerces the operand
  *      to its numeric form (arithmetic.go convertLeftRight):
  *      NOW() - NOW() is 0, date & date works on yyyymmdd.
  *
  * [[MySqlArithRewrite]] installs these on the PARSED (pre-analysis)
  * plan, so Spark's analyzer type-checks the rewritten tree — no stale
  * attribute types, and Catalyst optimizations still apply. Wrappers
  * that turn out to be identity at analysis time are stripped by
  * [[MySqlArithRewrite.stripIdentity]] on the analyzed plan so
  * whole-stage codegen is unaffected for well-typed queries.
  */
object MySqlArith {

  private[functions] def isExactNumeric(dt: DataType): Boolean = dt match {
    case _: DecimalType | ByteType | ShortType | IntegerType | LongType |
        BooleanType | NullType => true
    case _ => false
  }
  private[functions] def isTemporal(dt: DataType): Boolean = dt match {
    case DateType | TimestampType | TimestampNTZType => true
    case _ => false
  }

  /** Static scale of an exact operand (decimal scale; integral 0). */
  private def scaleOf(dt: DataType): Int = dt match {
    case d: DecimalType => d.scale
    case _ => 0
  }

  /** MySQL prefix-number read of a string (my_strtod semantics). */
  private[functions] def strToDouble(s: String): Double = {
    val m = java.util.regex.Pattern
      .compile("^\\s*([+-]?(?:[0-9]+(?:\\.[0-9]*)?|\\.[0-9]+)(?:[eE][+-]?[0-9]+)?)")
      .matcher(s)
    if (m.find() && m.group(1).nonEmpty) m.group(1).toDouble else 0.0
  }

  /** Temporal value → MySQL numeric form (yyyymmdd / yyyymmddhhmmss). */
  private[functions] def temporalToJbd(v: Any, dt: DataType): JBD = dt match {
    case DateType =>
      val d = java.time.LocalDate.ofEpochDay(v.asInstanceOf[Int].toLong)
      new JBD(d.getYear * 10000L + d.getMonthValue * 100L + d.getDayOfMonth)
    case TimestampType | TimestampNTZType =>
      val micros = v.asInstanceOf[Long]
      val ldt = java.time.LocalDateTime.ofEpochSecond(
        Math.floorDiv(micros, 1000000L), 0, java.time.ZoneOffset.UTC)
      new JBD(
        ldt.getYear * 10000000000L + ldt.getMonthValue * 100000000L +
          ldt.getDayOfMonth * 1000000L + ldt.getHour * 10000L +
          ldt.getMinute * 100L + ldt.getSecond)
    case _ => JBD.ZERO
  }

  /** Any eval result → JBD for the exact-decimal paths. */
  private[functions] def toJbd(v: Any, dt: DataType): JBD = v match {
    case null => null
    case d: Decimal => d.toJavaBigDecimal
    case b: Boolean => if (b) JBD.ONE else JBD.ZERO
    case b: Byte => new JBD(b.toInt)
    case s: Short => new JBD(s.toInt)
    case i: Int if dt == DateType => temporalToJbd(i, dt)
    case i: Int => new JBD(i)
    case l: Long if isTemporal(dt) => temporalToJbd(l, dt)
    case l: Long => new JBD(l)
    case f: Float => new JBD(f.toString)
    case d: Double => JBD.valueOf(d)
    case u: UTF8String => JBD.valueOf(strToDouble(u.toString))
    case b: Array[Byte] => JBD.valueOf(strToDouble(new String(b, "UTF-8")))
    case _ => JBD.ZERO
  }

  private[functions] def toDoubleVal(v: Any, dt: DataType): Double = v match {
    case null => 0.0
    case b: Boolean => if (b) 1.0 else 0.0
    case u: UTF8String => strToDouble(u.toString)
    case b: Array[Byte] => strToDouble(new String(b, "UTF-8"))
    case n: Number if !isTemporal(dt) => n.doubleValue()
    case d: Decimal => d.toDouble
    case other if isTemporal(dt) => temporalToJbd(other, dt).doubleValue()
    case _ => 0.0
  }

  /** Reference getFinalScale (div.go:503): the display scale of a
    * division-bearing arithmetic tree — +4 per division down the left
    * spine, max() through +/-/%, sum through *. Computed statically
    * from types (value scale == type scale for literals, columns and
    * internal division results). */
  private[functions] def finalScale(e: Expression): Int = {
    val s = e match {
      case d: MySqlDiv if d.exactMode => divPrecInc + finalScale(d.left)
      case a: Add => math.max(finalScale(a.left), finalScale(a.right))
      case a: Subtract => math.max(finalScale(a.left), finalScale(a.right))
      case m: Multiply => finalScale(m.left) + finalScale(m.right)
      case m: Remainder => math.max(finalScale(m.left), finalScale(m.right))
      case _: IntegralDivide => 0
      case u: UnaryMinus => finalScale(u.child)
      case n: MySqlNeg => finalScale(n.child)
      case c: Cast => finalScale(c.child)
      // the analyzer wraps decimal arithmetic in CheckOverflow — look
      // through it or the Multiply/Add cases above never match
      case co: CheckOverflow => finalScale(co.child)
      case n: MySqlNumOperand => scaleOf(n.dataType)
      case other => scaleOf(other.dataType)
    }
    math.min(s, 30)
  }

  private val divPrecInc = 4
  private val divIntPrecInc = 9

  /** Internal division scale: ceil((s1+s2+4)/9)*9 with the dual-nonzero
    * bump (div.go:226), capped so DecimalType(38, s) keeps int digits. */
  private[functions] def internalScale(lS: Int, rS: Int): Int = {
    var inc = math.ceil((lS + rS + divPrecInc).toDouble / divIntPrecInc).toInt
    if (lS != 0 && rS != 0) {
      val inc2 = (lS + divIntPrecInc - 1) / divIntPrecInc +
        (rS + divIntPrecInc - 1) / divIntPrecInc
      if (inc2 > inc) inc = inc2
    }
    math.min(inc * divIntPrecInc, 30)
  }

  /** `/` with MySQL semantics (reference div.go). Exact operands →
    * DECIMAL at the chain's internal scale (no premature rounding —
    * [[MySqlDivRound]] rounds the outermost result); float/string
    * operands → DOUBLE. Division by zero is NULL. */
  case class MySqlDiv(left: Expression, right: Expression)
      extends BinaryExpression with CodegenFallback {
    def exactMode: Boolean =
      (isExactNumeric(left.dataType) || isTemporal(left.dataType)) &&
        (isExactNumeric(right.dataType) || isTemporal(right.dataType))
    private def childScale(e: Expression): Int =
      if (isTemporal(e.dataType)) 0 else scaleOf(e.dataType)
    override def dataType: DataType =
      if (!exactMode) DoubleType
      else DecimalType(38, internalScale(childScale(left), childScale(right)))
    override def nullable: Boolean = true
    override def nullSafeEval(l: Any, r: Any): Any =
      if (!exactMode) {
        val rv = toDoubleVal(r, right.dataType)
        if (rv == 0.0) null else toDoubleVal(l, left.dataType) / rv
      } else {
        val rb = toJbd(r, right.dataType)
        if (rb.signum() == 0) null
        else {
          val lb = toJbd(l, left.dataType)
          val scale = internalScale(childScale(left), childScale(right))
          // operands truncate to the working scale, quotient truncates
          // too (types/decimal.go DecimalDiv with truncate=true)
          val lt = if (lb.scale > scale) lb.setScale(scale, RoundingMode.DOWN) else lb
          val rt = if (rb.scale > scale) rb.setScale(scale, RoundingMode.DOWN) else rb
          val q = lt.divide(rt, scale, RoundingMode.DOWN)
          if (q.precision - q.scale > 38 - scale) null // overflow → NULL
          else Decimal(q, 38, scale)
        }
      }
    override protected def withNewChildrenInternal(l: Expression, r: Expression) =
      copy(l, r)
  }

  /** Outermost-arithmetic rounding of a division chain to its MySQL
    * display scale (div.go Eval's isOutermostArithmeticOp branch).
    * Identity for double-mode chains. */
  case class MySqlDivRound(child: Expression)
      extends UnaryExpression with CodegenFallback {
    private def fs: Int = finalScale(child)
    override def dataType: DataType = child.dataType match {
      case _: DecimalType => DecimalType(38, fs)
      case other => other
    }
    override def nullable: Boolean = true
    override def nullSafeEval(v: Any): Any = v match {
      case d: Decimal =>
        Decimal(d.toJavaBigDecimal.setScale(fs, RoundingMode.HALF_UP), 38, fs)
      case other => other
    }
    override protected def withNewChildInternal(c: Expression) = copy(c)
  }

  /** & | ^ with MySQL semantics (reference sql/expression/bit_ops.go):
    * every operand coerces to a rounded 64-bit integer (decimals round
    * half away from zero, temporals take their numeric form, strings
    * their numeric prefix) and the result displays as UNSIGNED. */
  case class MySqlBitOp(left: Expression, right: Expression, op: String)
      extends BinaryExpression with CodegenFallback {
    override def dataType: DataType = DecimalType(20, 0)
    override def nullable: Boolean = true
    private def toLongMySql(v: Any, dt: DataType): Long = {
      val b = toJbd(v, dt)
      if (b == null) 0L
      else b.setScale(0, RoundingMode.HALF_UP).longValue()
    }
    private val TwoTo64 = new JBD(java.math.BigInteger.ONE.shiftLeft(64))
    override def nullSafeEval(l: Any, r: Any): Any = {
      val lv = toLongMySql(l, left.dataType)
      val rv = toLongMySql(r, right.dataType)
      val res = op match {
        case "&" => lv & rv
        case "|" => lv | rv
        case "^" => lv ^ rv
        case "<<" => lv << rv
        case ">>" => lv >>> rv
      }
      val jb = new JBD(res)
      Decimal(if (res < 0) jb.add(TwoTo64) else jb, 20, 0)
    }
    override protected def withNewChildrenInternal(l: Expression, r: Expression) =
      copy(l, r)
  }

  /** ~x — MySQL bitwise NOT yields uint64 (~0 = 18446744073709551615). */
  case class MySqlBitNot(child: Expression)
      extends UnaryExpression with CodegenFallback {
    override def dataType: DataType = DecimalType(20, 0)
    override def nullable: Boolean = true
    private val TwoTo64 = new JBD(java.math.BigInteger.ONE.shiftLeft(64))
    override def nullSafeEval(v: Any): Any = {
      val b = toJbd(v, child.dataType)
      val lv = if (b == null) 0L else b.setScale(0, RoundingMode.HALF_UP).longValue()
      val res = ~lv
      val jb = new JBD(res)
      Decimal(if (res < 0) jb.add(TwoTo64) else jb, 20, 0)
    }
    override protected def withNewChildInternal(c: Expression) = copy(c)
  }

  /** Unary minus with MySQL's widening: negating an integral value
    * yields BIGINT (so -(-2147483648) is 2147483648, not an INT wrap),
    * and negating BIGINT MIN yields DECIMAL "9223372036854775808"
    * (script_queries.go:292-330 double-negation block). Non-integral
    * operands keep their type. */
  case class MySqlNeg(child: Expression)
      extends UnaryExpression with CodegenFallback {
    override def dataType: DataType = child.dataType match {
      case ByteType | ShortType | IntegerType | BooleanType => LongType
      case LongType => DecimalType(20, 0)
      case d: DecimalType => d
      case NullType => NullType
      case other => other
    }
    override def nullable: Boolean = true
    override def nullSafeEval(v: Any): Any = v match {
      case b: Boolean => if (b) -1L else 0L
      case b: Byte => -b.toLong
      case s: Short => -s.toLong
      case i: Int => -i.toLong
      case l: Long => Decimal(new JBD(l).negate(), 20, 0)
      case d: Decimal =>
        Decimal(d.toJavaBigDecimal.negate(), d.precision, d.scale)
      case f: Float => -f
      case d: Double => -d
      case other => other
    }
    override protected def withNewChildInternal(c: Expression) = copy(c)
  }

  /** Adaptive arithmetic-operand coercion: identity on numeric/null
    * operands (stripped from the analyzed plan — zero cost), MySQL
    * numeric form otherwise: temporal → yyyymmdd[hhmmss] DECIMAL,
    * boolean → 0/1, string/binary → prefix DOUBLE
    * (reference arithmetic.go convertLeftRight). */
  case class MySqlNumOperand(child: Expression)
      extends UnaryExpression with CodegenFallback {
    def isIdentity: Boolean = child.dataType match {
      case _: NumericType | NullType => true
      case _: StringType | BinaryType | BooleanType => false
      case dt if isTemporal(dt) => false
      case _ => true // arrays/structs/… pass through → same Spark error
    }
    override def dataType: DataType = child.dataType match {
      case dt if isIdentity => dt
      case BooleanType => IntegerType
      case DateType => DecimalType(8, 0)
      case TimestampType | TimestampNTZType => DecimalType(14, 0)
      case _ => DoubleType // string / binary
    }
    override def nullable: Boolean = child.nullable
    override def nullSafeEval(v: Any): Any = child.dataType match {
      case _ if isIdentity => v
      case BooleanType => if (v.asInstanceOf[Boolean]) 1 else 0
      case dt if isTemporal(dt) => Decimal(temporalToJbd(v, dt))
      case dt => toDoubleVal(v, dt)
    }
    override protected def withNewChildInternal(c: Expression) = copy(c)
  }
}

/** Pre-analysis rewrite installing the MySQL arithmetic expressions on
  * a freshly parsed plan, plus the post-analysis identity-wrapper
  * cleanup. Applied by Engine.query's SQL path only — DataFrame-API
  * pipelines (SparkEntry/TpcH/Dedup/…) never see these nodes. */
object MySqlArithRewrite {
  import MySqlArith._

  private def isArith(e: Expression): Boolean = e match {
    case _: Add | _: Subtract | _: Multiply | _: Divide | _: Remainder |
        _: IntegralDivide | _: UnaryMinus => true
    case _ => false
  }
  private def containsDiv(e: Expression): Boolean = e match {
    case _: Divide => true
    case a if isArith(a) => a.children.exists(containsDiv)
    case _ => false
  }
  /** Is this operand an INTERVAL construct (literal or make_interval)?
    * Interval arithmetic must keep Spark's native temporal semantics. */
  private def isIntervalOperand(e: Expression): Boolean = e match {
    case l: Literal => l.dataType match {
      case CalendarIntervalType | _: DayTimeIntervalType |
          _: YearMonthIntervalType => true
      case _ => false
    }
    case u: UnaryMinus => isIntervalOperand(u.child)
    case f: org.apache.spark.sql.catalyst.analysis.UnresolvedFunction =>
      f.nameParts.last.toLowerCase.contains("interval")
    case m: MakeInterval => true
    case _ => false
  }

  /** Rewrite one arithmetic spine: Divide → MySqlDiv, other arith
    * rebuilt with operand-coerced children, non-arith operands wrapped
    * in the adaptive coercion (skipped entirely when an interval
    * operand makes this node temporal arithmetic). Single-pass — spine
    * members are mapped exactly once, and non-arith interiors recurse
    * through [[rewriteExpr]] for nested chains (`floor(1/2) + 1`). */
  private def mapSpine(e: Expression): Expression = e match {
    case d: Divide => MySqlDiv(divOperand(d.left), divOperand(d.right))
    case a if isArith(a) && a.children.exists(isIntervalOperand) =>
      // temporal ± interval: native Spark semantics; interiors still
      // get their own rewrites
      a.withNewChildren(a.children.map(inner))
    case u: UnaryMinus => MySqlNeg(mapOperand(u.child))
    case a if isArith(a) => a.withNewChildren(a.children.map(mapOperand))
    case other => inner(other)
  }
  /** Divide coerces its own operands — no NumOperand wrap. */
  private def divOperand(e: Expression): Expression =
    if (isArith(e)) mapSpine(e) else inner(e)
  private def mapOperand(e: Expression): Expression =
    if (isArith(e)) mapSpine(e) else MySqlNumOperand(inner(e))
  /** Recurse into a non-spine subtree for independent nested rewrites. */
  private def inner(e: Expression): Expression = e.mapChildren(rewriteExpr)

  /** A division chain that is a DIRECT comparison operand keeps its
    * internal (unrounded) value — queries.go:2842-2868: `1/3*3 in
    * (0.999999999)` is TRUE and `0 in (1/100000)` is FALSE, so the
    * display rounding must not apply before comparing. */
  private def noRound(e: Expression): Expression =
    if (isArith(e)) mapSpine(e) else rewriteExpr(e)

  private def rewriteExpr(e: Expression): Expression = e match {
    case cmp: BinaryComparison =>
      cmp.withNewChildren(Seq(noRound(cmp.left), noRound(cmp.right)))
    case i: In => i.withNewChildren((i.value +: i.list).map(noRound))
    case i: InSubquery =>
      i.withNewChildren(i.values.map(noRound) :+ rewriteExpr(i.query))
    case a if isArith(a) =>
      val mapped = mapSpine(a)
      if (containsDiv(a)) MySqlDivRound(mapped) else mapped
    case b: BitwiseAnd =>
      MySqlBitOp(rewriteExpr(b.left), rewriteExpr(b.right), "&")
    case b: BitwiseOr =>
      MySqlBitOp(rewriteExpr(b.left), rewriteExpr(b.right), "|")
    case b: BitwiseXor =>
      MySqlBitOp(rewriteExpr(b.left), rewriteExpr(b.right), "^")
    case b: BitwiseNot => MySqlBitNot(rewriteExpr(b.child))
    case sub: org.apache.spark.sql.catalyst.expressions.SubqueryExpression =>
      sub.withNewPlan(apply(sub.plan))
    case other => other.mapChildren(rewriteExpr)
  }

  /** Apply to a parsed (unresolved) plan, descending into subquery
    * expressions and inner CTE definitions. */
  def apply(plan: LogicalPlan): LogicalPlan = {
    val withExprs = plan.transformDown {
      case p => p.mapExpressions(rewriteExpr)
    }
    // UnresolvedWith keeps CTE definitions in innerChildren, which
    // transformDown does not visit
    withExprs.transformDown {
      case w: org.apache.spark.sql.catalyst.plans.logical.UnresolvedWith =>
        w.copy(cteRelations = w.cteRelations.map { case (n, r, m) =>
          (n, apply(r).asInstanceOf[
            org.apache.spark.sql.catalyst.plans.logical.SubqueryAlias], m)
        })
    }
  }

  /** Post-analysis cleanup: identity wrappers disappear so well-typed
    * expressions keep whole-stage codegen. Same-type replacement only. */
  def stripIdentity(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressions {
      case n: MySqlNumOperand if n.isIdentity => n.child
      case r: MySqlDivRound if !r.child.dataType.isInstanceOf[DecimalType] =>
        r.child
    }
}
