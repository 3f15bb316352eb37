package graft.functions

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** MySQL DECIMAL reaches precision 65 / scale 30 (reference
  * sql/types/decimal.go:58); Spark's DecimalType caps at 38. Declared
  * DECIMAL(p, s) columns with p > 38 store canonical fixed-scale plain
  * text (StringType, flagged by the `graft_wide_dec` field-metadata
  * marker so the marker survives arbitrary plan shapes):
  *
  *   - [[WideDecCoerce]] is the single write coercion — parse, round
  *     HALF_UP to the declared scale (decimal.go:295 rounds, never
  *     truncates), range-check against p−s integer digits (strict mode
  *     errors like ErrConvertToDecimalLimit, decimal.go:303; non-strict
  *     clamps to the type bound like MySQL IGNORE), render
  *     `toPlainString` so storage text is canonical and deterministic.
  *   - [[WideDecCompareRule]] rewrites comparisons that touch a wide
  *     column to exact decimal arithmetic ([[WideDecNorm]] /
  *     [[WideDecCmp]]). Without it Spark coerces string-vs-numeric
  *     comparisons to DOUBLE, which folds values differing in the 16th+
  *     significant digit together — exactly what DECIMAL(40,16) exists
  *     to distinguish (script_queries.go "Ensure scale is not rounded").
  *
  * The expressions are interpreted (`CodegenFallback`) — wide decimals
  * are catalog-rare and never on the analytics hot path.
  */
object WideDecimal {
  /** StructField metadata key carrying "p,s" for a wide DECIMAL column. */
  val MetaKey = "graft_wide_dec"

  val MaxPrecision = 65
  val MaxScale = 30

  def metadata(p: Int, s: Int): Metadata =
    new MetadataBuilder().putString(MetaKey, s"$p,$s").build()

  def isWideAttr(e: Expression): Boolean = e match {
    case a: AttributeReference => a.metadata.contains(MetaKey)
    case _ => false
  }

  private val Prefix =
    java.util.regex.Pattern.compile(expressions.MySqlToNumber.PrefixRegex)

  /** MySQL-lenient text→decimal: full parse, else numeric-prefix parse
    * ('12abc' → 12), else null (the caller decides error vs zero). */
  def parseText(s: String): java.math.BigDecimal = {
    val t = s.trim
    try new java.math.BigDecimal(t)
    catch {
      case _: NumberFormatException =>
        val m = Prefix.matcher(t)
        if (m.find() && m.group(1).nonEmpty)
          new java.math.BigDecimal(m.group(1))
        else null
    }
  }

  /** Any runtime value → BigDecimal (null on unparsable text). */
  def parse(v: Any): java.math.BigDecimal = v match {
    case null => null
    case u: UTF8String => parseText(u.toString)
    case b: Array[Byte] => parseText(new String(b, "UTF-8"))
    case d: Decimal => d.toJavaBigDecimal
    case d: Double => new java.math.BigDecimal(java.lang.Double.toString(d))
    case f: Float => new java.math.BigDecimal(java.lang.Float.toString(f))
    case b: Boolean => if (b) java.math.BigDecimal.ONE
                       else java.math.BigDecimal.ZERO
    case n: Number => new java.math.BigDecimal(n.toString)
    case other => parseText(String.valueOf(other))
  }

  /** Zero-stripped canonical text ("1.50" → "1.5", "-0.0" → "0"). */
  def normText(bd: java.math.BigDecimal): String =
    if (bd.signum == 0) "0"
    else bd.stripTrailingZeros.toPlainString
}

/** Write coercion for a wide DECIMAL(p, s) column (see [[WideDecimal]]).
  * Returns the canonical fixed-scale text, or throws in strict mode on
  * overflow / unparsable input. */
case class WideDecCoerce(child: Expression, prec: Int, scale: Int,
                         strict: Boolean)
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = StringType
  override def nullable: Boolean = child.nullable
  override def nullSafeEval(v: Any): Any = {
    val bd0 = WideDecimal.parse(v)
    if (bd0 == null) {
      if (strict) throw new IllegalArgumentException(
        s"Incorrect decimal value: '$v' (MySQL error 1366)")
      return UTF8String.fromString(
        java.math.BigDecimal.ZERO.setScale(scale).toPlainString)
    }
    val bd = bd0.setScale(scale, java.math.RoundingMode.HALF_UP)
    val intDigits = bd.precision - bd.scale
    val out =
      if (intDigits > prec - scale) {
        if (strict) throw new IllegalArgumentException(
          "Out of range value for column of Decimal type " +
          s"(DECIMAL($prec,$scale) cannot hold $bd0 — MySQL error 1264)")
        // non-strict: clamp to the type bound (999…9.99… with the sign)
        val bound = new java.math.BigDecimal(
          "9" * (prec - scale) + (if (scale > 0) "." + "9" * scale else ""))
        if (bd.signum < 0) bound.negate else bound
      } else bd
    UTF8String.fromString(out.toPlainString)
  }
  override protected def withNewChildInternal(c: Expression) =
    copy(child = c)
}

/** Exact-decimal canonical text of any value — equality probe for
  * comparisons involving wide DECIMAL columns. Unparsable text → null
  * (the comparison is then NULL, like MySQL's 0-with-warning ≈ no
  * match for equality against a decimal column). */
case class WideDecNorm(child: Expression)
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = StringType
  override def nullable: Boolean = true
  override def nullSafeEval(v: Any): Any = {
    val bd = WideDecimal.parse(v)
    if (bd == null) null else UTF8String.fromString(WideDecimal.normText(bd))
  }
  override protected def withNewChildInternal(c: Expression) =
    copy(child = c)
}

/** Exact-decimal three-way compare (−1/0/1); null if either side is
  * null or unparsable. Ordering comparisons over wide columns rewrite
  * to `WideDecCmp(a, b) <op> 0`. */
case class WideDecCmp(left: Expression, right: Expression)
    extends BinaryExpression with CodegenFallback {
  override def dataType: DataType = IntegerType
  override def nullable: Boolean = true
  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = WideDecimal.parse(l); val b = WideDecimal.parse(r)
    if (a == null || b == null) null else Integer.valueOf(a.compareTo(b))
  }
  override protected def withNewChildrenInternal(l: Expression,
                                                 r: Expression) =
    copy(left = l, right = r)
}

/** Post-analysis rewrite: comparisons whose (cast-stripped) side is a
  * wide DECIMAL attribute become exact-decimal compares. Runs on the
  * ANALYZED plan (Engine.mysqlTrimSemantics) so it sees the Casts the
  * TypeCoercion rules inserted — string-vs-numeric compares have both
  * sides wrapped in Cast(… as double) by then, which is the lossy path
  * this rule exists to bypass. Idempotent: rewritten sides are
  * WideDecNorm/WideDecCmp nodes, not attributes. */
object WideDecCompareRule extends Rule[LogicalPlan] {
  private def bare(e: Expression): Expression = e match {
    case c: Cast => bare(c.child)
    case o => o
  }
  private def wide(e: Expression): Boolean =
    WideDecimal.isWideAttr(bare(e))

  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressions {
      case EqualTo(l, r) if wide(l) || wide(r) =>
        EqualTo(WideDecNorm(bare(l)), WideDecNorm(bare(r)))
      case EqualNullSafe(l, r) if wide(l) || wide(r) =>
        EqualNullSafe(WideDecNorm(bare(l)), WideDecNorm(bare(r)))
      case LessThan(l, r) if wide(l) || wide(r) =>
        LessThan(WideDecCmp(bare(l), bare(r)), Literal(0))
      case LessThanOrEqual(l, r) if wide(l) || wide(r) =>
        LessThanOrEqual(WideDecCmp(bare(l), bare(r)), Literal(0))
      case GreaterThan(l, r) if wide(l) || wide(r) =>
        GreaterThan(WideDecCmp(bare(l), bare(r)), Literal(0))
      case GreaterThanOrEqual(l, r) if wide(l) || wide(r) =>
        GreaterThanOrEqual(WideDecCmp(bare(l), bare(r)), Literal(0))
      case In(v, list) if wide(v) &&
          list.forall(_.isInstanceOf[Literal]) =>
        In(WideDecNorm(bare(v)), list.map(x => WideDecNorm(x)))
      // the MySQL truthiness/pair-domain comparison layer routes many
      // comparisons through MySqlCompare before this rule runs — the
      // wide-attr sides get the same exact-decimal treatment
      case MySqlArith.MySqlCompare(l, r, op) if wide(l) || wide(r) =>
        op match {
          case "=" => EqualTo(WideDecNorm(bare(l)), WideDecNorm(bare(r)))
          case "<=>" =>
            EqualNullSafe(WideDecNorm(bare(l)), WideDecNorm(bare(r)))
          case "!=" =>
            Not(EqualTo(WideDecNorm(bare(l)), WideDecNorm(bare(r))))
          case "<" => LessThan(WideDecCmp(bare(l), bare(r)), Literal(0))
          case "<=" =>
            LessThanOrEqual(WideDecCmp(bare(l), bare(r)), Literal(0))
          case ">" => GreaterThan(WideDecCmp(bare(l), bare(r)), Literal(0))
          case ">=" =>
            GreaterThanOrEqual(WideDecCmp(bare(l), bare(r)), Literal(0))
          case other => MySqlArith.MySqlCompare(l, r, other)
        }
    }
}
