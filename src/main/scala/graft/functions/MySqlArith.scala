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

  /** An explicit CAST(x AS JSON) operand (json_canon wrapper) — a typed
    * JSON document, compared with plain strings as documents. */
  private[functions] def isJsonCanonSide(e: Expression): Boolean = e match {
    case _: graft.functions.json.JsonCanon => true
    // NB: an explicit outer CAST (e.g. CAST(x AS CHAR) over the JSON)
    // converts the document to a plain string — do NOT look through it
    case s: MySqlStrOperand => isJsonCanonSide(s.child)
    case n: MySqlNumOperand => isJsonCanonSide(n.child)
    case _ => false
  }


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
    case f: Float =>
      if (java.lang.Float.isFinite(f)) new JBD(f.toString)
      else throw new ArithmeticException(
        s"BIGINT value is out of range: $f (MySQL error 1690)")
    case d: Double =>
      if (java.lang.Double.isFinite(d)) JBD.valueOf(d)
      else throw new ArithmeticException(
        s"BIGINT value is out of range: $d (MySQL error 1690)")
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
    /** Static integer-digit bound of an operand (MySQL result int digits
      * are ≤ (p1−s1)+s2). Declaring the tight precision — rather than a
      * blanket 38 — keeps downstream decimal arithmetic inside Spark's
      * 38-digit cap without scale-losing precision reduction
      * ((1/3)*(1/3) must keep 8 fractional digits). */
    private def intDigitsOf(dt: DataType): Int = dt match {
      case d: DecimalType => d.precision - d.scale
      case ByteType | BooleanType => 3
      case ShortType => 5
      case IntegerType => 10
      case LongType => 19
      case DateType => 8
      case TimestampType | TimestampNTZType => 14
      case _ => 10
    }
    private def resultScale: Int =
      internalScale(childScale(left), childScale(right))
    private def resultPrecision: Int = {
      val s = resultScale
      val ints = intDigitsOf(left.dataType) + childScale(right)
      math.min(38, math.max(s + 1, ints + s))
    }
    override def dataType: DataType =
      if (!exactMode) DoubleType
      else DecimalType(resultPrecision, resultScale)
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
          val prec = resultPrecision
          if (q.precision - q.scale > prec - scale) null // overflow → NULL
          else Decimal(q, prec, scale)
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
    private def toLongMySql(v: Any, dt: DataType): Long = v match {
      // hex/binary literals are their big-endian byte value in bit
      // context (script_queries.go: X'7F' | X'80' = 255), not a text
      // prefix parse
      case bytes: Array[Byte] if dt == BinaryType =>
        bytes.foldLeft(0L)((acc, x) => (acc << 8) | (x & 0xffL))
      case _ =>
        val b = toJbd(v, dt)
        if (b == null) 0L
        else {
          val r = b.setScale(0, RoundingMode.HALF_UP)
          // uint64 domain check (bit_ops.go via types.Uint64): a magnitude
          // past 2^64 is MySQL 1690, not a silent Java wrap
          if (r.abs.compareTo(TwoTo64) >= 0)
            throw new ArithmeticException(
              s"BIGINT UNSIGNED value is out of range: $r (MySQL error 1690)")
          r.longValue()
        }
    }
    private val TwoTo64 = new JBD(java.math.BigInteger.ONE.shiftLeft(64))
    override def nullSafeEval(l: Any, r: Any): Any = {
      val lv = toLongMySql(l, left.dataType)
      val rv = toLongMySql(r, right.dataType)
      val res = op match {
        case "&" => lv & rv
        case "|" => lv | rv
        case "^" => lv ^ rv
        // MySQL shifts are uint64 with a true count (bit_ops.go): any
        // count outside [0,63] yields 0, never Java's mod-64 wrap
        case "<<" => if (rv < 0 || rv > 63) 0L else lv << rv
        case ">>" => if (rv < 0 || rv > 63) 0L else lv >>> rv
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
      // negating a BIGINT LITERAL widens to DECIMAL (the reference folds
      // -(-9223372036854775808) to "9223372036854775808"); a bigint
      // COLUMN keeps its type and overflows with 1690 instead
      // (script_queries.go "double negation of integer minimum values":
      // SELECT -t0.c0 over the min value is sql.ErrValueOutOfRange)
      case LongType => if (child.foldable) DecimalType(20, 0) else LongType
      case d: DecimalType => d
      case NullType => NullType
      // -'' / -'3x' negate the string's double prefix (convert_value.go)
      case dt if isStringish(dt) => DoubleType
      case other => other
    }
    override def nullable: Boolean = true
    override def nullSafeEval(v: Any): Any = v match {
      case b: Boolean => if (b) -1L else 0L
      case b: Byte => -b.toLong
      case s: Short => -s.toLong
      case i: Int => -i.toLong
      case l: Long if dataType == LongType =>
        if (l == Long.MinValue) throw new ArithmeticException(
          "BIGINT value is out of range (MySQL error 1690)")
        -l
      case l: Long => Decimal(new JBD(l).negate(), 20, 0)
      case d: Decimal =>
        Decimal(d.toJavaBigDecimal.negate(), d.precision, d.scale)
      case f: Float => -f
      case d: Double => -d
      case u: UTF8String => -strToDouble(u.toString)
      case b: Array[Byte] => -strToDouble(new String(b, "UTF-8"))
      case other => other
    }
    override protected def withNewChildInternal(c: Expression) = copy(c)
  }

  private[functions] def isStringish(dt: DataType): Boolean = dt match {
    case _: StringType | BinaryType => true
    case _ => false
  }
  private[functions] def isNumericish(dt: DataType): Boolean = dt match {
    case _: NumericType | BooleanType => true
    case _ => false
  }

  /** CAST(boolean AS JSON) — rendered as 'true'/'false' text here — is a
    * JSON BOOLEAN document; MySQL's JSON comparison orders it apart from
    * any STRING. */
  private[functions] def isBoolJsonCast(e: Expression): Boolean = e match {
    case c: Cast => c.dataType.isInstanceOf[StringType] &&
      c.child.dataType == BooleanType
    case jc: graft.functions.json.JsonCanon => isBoolJsonCast(jc.child)
    case s: MySqlStrOperand => isBoolJsonCast(s.child)
    case n: MySqlNumOperand => isBoolJsonCast(n.child)
    case _ => false
  }

  /** MySQL truthiness of any value (reference sql/types/convert_value.go
    * ConvertToBool, used by logic.go AND/OR/XOR and boolean contexts):
    * numbers ≠ 0, strings by numeric prefix ('3bxu' → true, 'asdf' →
    * false), temporals by their packed numeric form. Identity (and
    * stripped post-analysis) on already-boolean operands. */
  case class MySqlBool(child: Expression)
      extends UnaryExpression with CodegenFallback {
    def isIdentity: Boolean = child.dataType == BooleanType
    override def dataType: DataType = BooleanType
    override def nullable: Boolean = true
    override def nullSafeEval(v: Any): Any = v match {
      case b: Boolean => b
      case d: Decimal => d.toJavaBigDecimal.signum != 0
      case n: Number => n.doubleValue() != 0.0
      case u: UTF8String => strToDouble(u.toString) != 0.0
      case b: Array[Byte] => strToDouble(new String(b, "UTF-8")) != 0.0
      case other if isTemporal(child.dataType) =>
        temporalToJbd(other, child.dataType).signum != 0
      case _ => true
    }
    override protected def withNewChildInternal(c: Expression) = copy(c)
  }

  /** MySQL string form of a value for string-typed argument positions
    * (LIKE operands, MD5/SHA inputs): booleans are '1'/'0' (tinyint
    * display), numbers their decimal form, temporals their display
    * form. Identity (stripped) on string/binary operands. */
  /** Display-type CLASS of a coalesce argument — used to decide when
    * MySQL's dynamically-typed COALESCE display diverges from Spark's
    * statically-unified type. */
  private[functions] def typeClass(dt: DataType): Int = dt match {
    case NullType => 0 // null joins any class
    case ByteType | ShortType | IntegerType | LongType => 1
    case _: DecimalType => 2
    case FloatType | DoubleType => 3
    case BooleanType => 4
    case DateType | TimestampType | TimestampNTZType => 5
    case _ => 6
  }

  /** COALESCE over heterogeneously-typed (resolved) arguments: the
    * reference evaluates lazily and renders the chosen value in its own
    * type's display form (coalesce.go; COALESCE(1, 0.0) is "1"). */
  case class MySqlCoalesceDyn(children: Seq[Expression])
      extends Expression with CodegenFallback {
    override def dataType: DataType = StringType
    override def nullable: Boolean = true
    override def eval(input: InternalRow): Any = {
      children.iterator.map(c => (c.eval(input), c.dataType))
        .find(_._1 != null) match {
        case None => null
        case Some((v, dt)) => UTF8String.fromString(display(v, dt))
      }
    }
    private def display(v: Any, dt: DataType): String = (v, dt) match {
      case (b: Boolean, _) => if (b) "1" else "0"
      case (d: Decimal, _) => d.toJavaBigDecimal.toPlainString
      case (i: Int, DateType) =>
        java.time.LocalDate.ofEpochDay(i.toLong).toString
      case (m: Long, TimestampType | TimestampNTZType) =>
        java.time.LocalDateTime.ofEpochSecond(
          Math.floorDiv(m, 1000000L), 0, java.time.ZoneOffset.UTC)
          .toString.replace('T', ' ')
      case (d: Double, _) =>
        if (d == math.floor(d) && math.abs(d) < 1e15) d.toLong.toString
        else d.toString
      case (f: Float, _) => display(f.toDouble, DoubleType)
      case (other, _) => String.valueOf(other)
    }
    override protected def withNewChildrenInternal(
        n: IndexedSeq[Expression]): Expression = copy(n)
  }

  /** CAST(string AS number) over column values — MySQL's prefix-number
    * read (strings.go / my_strtoll10): floats take the full numeric
    * prefix, SIGNED integer casts stop at the first non-digit, DECIMAL
    * takes the float prefix at the declared scale. */
  case class MySqlStrNumCast(child: Expression, override val dataType: DataType)
      extends UnaryExpression with CodegenFallback {
    override def nullable: Boolean = child.nullable
    override def nullSafeEval(v: Any): Any = {
      val s = v match {
        case u: UTF8String => u.toString
        case b: Array[Byte] => new String(b, "UTF-8")
        case o => String.valueOf(o)
      }
      dataType match {
        case DoubleType => strToDouble(s)
        case FloatType => strToDouble(s).toFloat
        case LongType | IntegerType =>
          // integer prefix: spaces/tabs, sign, digits — stops at '.'
          val m = java.util.regex.Pattern
            .compile("^[ \\t]*([+-]?\\d+)").matcher(s)
          val l = if (m.find()) m.group(1).toLong else 0L
          if (dataType == IntegerType) l.toInt else l
        case dt: DecimalType =>
          val m = java.util.regex.Pattern
            .compile("^[ \\t]*([+-]?(?:\\d+(?:\\.\\d*)?|\\.\\d+)(?:[eE][+-]?\\d+)?)")
            .matcher(s)
          val bd =
            if (m.find()) new java.math.BigDecimal(m.group(1))
            else java.math.BigDecimal.ZERO
          Decimal(bd.setScale(dt.scale, java.math.RoundingMode.HALF_UP),
            dt.precision, dt.scale)
        case _ => null
      }
    }
    override protected def withNewChildInternal(c: Expression) =
      copy(child = c)
  }

  case class MySqlStrOperand(child: Expression)
      extends UnaryExpression with CodegenFallback {
    def isIdentity: Boolean = child.dataType match {
      case _: StringType | BinaryType | NullType => true
      case _ => false
    }
    override def dataType: DataType =
      if (isIdentity) child.dataType else StringType
    override def nullable: Boolean = child.nullable
    override def nullSafeEval(v: Any): Any = v match {
      case b: Boolean => UTF8String.fromString(if (b) "1" else "0")
      case d: Decimal =>
        UTF8String.fromString(d.toJavaBigDecimal.toPlainString)
      case i: Int if child.dataType == DateType =>
        UTF8String.fromString(
          java.time.LocalDate.ofEpochDay(i.toLong).toString)
      case l: Long if isTemporal(child.dataType) =>
        // TIMESTAMP micros are an instant: display in the SESSION zone
        // (a UTC render made NOW() LIKE CONCAT('%',CURTIME(),'%') false
        // under an offset time_zone); NTZ micros are wall-clock already
        val zone = child.dataType match {
          case TimestampType => java.time.ZoneId.of(
            org.apache.spark.sql.internal.SQLConf.get.sessionLocalTimeZone)
          case _ => java.time.ZoneOffset.UTC
        }
        val ldt = java.time.Instant.ofEpochSecond(
          Math.floorDiv(l, 1000000L), Math.floorMod(l, 1000000L) * 1000L)
          .atZone(zone).toLocalDateTime
        UTF8String.fromString(ldt.toString.replace('T', ' '))
      case n: Number => UTF8String.fromString(n.toString)
      case other => other
    }
    override protected def withNewChildInternal(c: Expression) = copy(c)
  }

  /** MySQL date-argument coercion for temporal functions over numeric
    * operands (DAYNAME(20190101) reads the packed-digit date;
    * DAYNAME(123) is NULL + warning). Renders the number as its digit
    * string and canonicalizes MySQL-legal shapes — the downstream
    * implicit string→date cast yields NULL for the rest. Identity on
    * string/temporal operands. */
  case class MySqlDateOperand(child: Expression)
      extends UnaryExpression with CodegenFallback {
    def isIdentity: Boolean = child.dataType match {
      case _: StringType | NullType => true
      case dt if isTemporal(dt) => true
      case _ => false
    }
    override def dataType: DataType =
      if (isIdentity) child.dataType else StringType
    override def nullable: Boolean = child.nullable
    override def nullSafeEval(v: Any): Any = {
      val digits = v match {
        case d: Decimal => d.toJavaBigDecimal.stripTrailingZeros.toPlainString
        case b: Boolean => if (b) "1" else "0"
        case n: Number => n.toString
        case other => return other
      }
      UTF8String.fromString(DateTimeExt.mysqlDateStrNorm(digits))
    }
    override protected def withNewChildInternal(c: Expression) = copy(c)
  }

  /** Parse a string to comparison micros (datetime form) after MySQL
    * shape canonicalization; None when unparseable. */
  private[functions] def parseTemporalMicros(s: String): Option[Long] = {
    val n = DateTimeExt.mysqlDateStrNorm(s.trim).replace('T', ' ')
    val dt =
      try {
        if (n.length <= 10) Some(java.time.LocalDate.parse(n).atStartOfDay)
        else Some(java.time.LocalDateTime.parse(n.replace(' ', 'T')))
      } catch { case _: Exception => None }
    dt.map(d => d.toEpochSecond(java.time.ZoneOffset.UTC) * 1000000L +
      d.getNano / 1000L)
  }

  /** Value → comparison micros for a temporal-typed operand. */
  private[functions] def temporalMicros(v: Any, dt: DataType): Long = dt match {
    case DateType => v.asInstanceOf[Int].toLong * 86400000000L
    case _ => v.asInstanceOf[Long]
  }

  /** Pair-domain MySQL comparison (reference sql/types Compare via
    * promotion, expression/comparison.go): string-vs-number compares
    * numerically through the string's double prefix ('foo' = 0 is TRUE),
    * temporal-vs-string parses the string as a datetime (lenient MySQL
    * shapes), boolean-vs-number numerically. Pairs Spark already
    * compares identically are stripped back to the native operator
    * post-analysis ([[MySqlArithRewrite.stripIdentity]]). */
  case class MySqlCompare(left: Expression, right: Expression, op: String)
      extends BinaryExpression with CodegenFallback {
    override def dataType: DataType = BooleanType
    override def nullable: Boolean = op != "<=>"

    private def isBoolText(x: Any): Boolean = {
      val s = x match {
        case u: UTF8String => u.toString
        case b: Array[Byte] => new String(b, "UTF-8")
        case _ => return false
      }
      val t = s.trim
      t.equalsIgnoreCase("true") || t.equalsIgnoreCase("false")
    }

    /** Some(sign) or None for incomparable (NULL result). */
    private[functions] def cmp(l: Any, r: Any): Option[Int] = {
      val lt = left.dataType; val rt = right.dataType
      if ((isTemporal(lt) && isStringish(rt)) ||
          (isStringish(lt) && isTemporal(rt))) {
        val (tm, sv, flip) =
          if (isTemporal(lt)) (temporalMicros(l, lt), r, false)
          else (temporalMicros(r, rt), l, true)
        val s = sv match {
          case u: UTF8String => u.toString
          case b: Array[Byte] => new String(b, "UTF-8")
          case o => String.valueOf(o)
        }
        parseTemporalMicros(s).map { sm =>
          if (flip) java.lang.Long.compare(sm, tm)
          else java.lang.Long.compare(tm, sm)
        }
      } else if ((isStringish(lt) && rt == BooleanType &&
                  isBoolText(l)) ||
                 (lt == BooleanType && isStringish(rt) &&
                  isBoolText(r))) {
        // JSON boolean documents ('true'/'false' text — CAST(x AS JSON)
        // renders to text in this engine) compare with a boolean operand
        // as booleans (queries.go:8821)
        def b(x: Any, dt: DataType): Int = x match {
          case bo: Boolean => if (bo) 1 else 0
          case u: UTF8String => if (u.toString.trim.equalsIgnoreCase("true")) 1 else 0
          case bs: Array[Byte] =>
            if (new String(bs, "UTF-8").trim.equalsIgnoreCase("true")) 1 else 0
          case _ => 0
        }
        Some(Integer.compare(b(l, lt), b(r, rt)))
      } else if (isJsonCanonSide(left) != isJsonCanonSide(right)) {
        // explicit CAST(x AS JSON) vs a plain scalar: document
        // comparison — the scalar converts to its JSON type (string →
        // JSON string, number → JSON number, boolean → JSON boolean);
        // different JSON types never compare equal (rank order is
        // deterministic-only), same types compare by value
        def txt(x: Any): String = x match {
          case u: UTF8String => u.toString
          case b: Array[Byte] => new String(b, "UTF-8")
          case o => String.valueOf(o)
        }
        val flip = !isJsonCanonSide(left)
        val (dv, sv, svDt) = if (flip) (r, l, lt) else (l, r, rt)
        val docText = txt(dv)
        val (rank, strVal) = graft.functions.json.docTypeRank(docText)
        val svRank =
          if (svDt == BooleanType) 6
          else if (isNumericish(svDt) || isTemporal(svDt)) 2
          else 3
        val c =
          if (rank != svRank) Integer.compare(rank, svRank)
          else rank match {
            case 6 =>
              val db = docText.trim.equalsIgnoreCase("true")
              val sb = sv match {
                case b: Boolean => b
                case o => toDoubleVal(o, svDt) != 0.0
              }
              java.lang.Boolean.compare(db, sb)
            case 2 => java.lang.Double.compare(
              toDoubleVal(dv, StringType), toDoubleVal(sv, svDt))
            case _ => strVal.compareTo(txt(sv))
          }
        Some(if (flip) -c else c)
      } else if (isStringish(lt) && isStringish(rt) &&
                 (isBoolJsonCast(left) != isBoolJsonCast(right))) {
        // JSON BOOLEAN document vs STRING: different JSON types — never
        // equal; MySQL's JSON type order puts BOOLEAN above STRING
        Some(if (isBoolJsonCast(left)) 1 else -1)
      } else if (isStringish(lt) && isStringish(rt)) {
        // reached only through mixed-type IN lists (plain same-type
        // comparisons strip to the native operator); MySQL's default
        // collation is case-insensitive
        def str(x: Any) = x match {
          case u: UTF8String => u.toString
          case b: Array[Byte] => new String(b, "UTF-8")
          case o => String.valueOf(o)
        }
        Some(str(l).compareToIgnoreCase(str(r)))
      } else if ((isBoolJsonCast(left) && isNumericish(rt)) ||
                 (isBoolJsonCast(right) && isNumericish(lt))) {
        // JSON BOOLEAN document vs number: different JSON types — never
        // equal (BOOLEAN sorts above numbers in MySQL's JSON order)
        Some(if (isBoolJsonCast(left)) 1 else -1)
      } else if (isStringish(lt) || isStringish(rt) ||
                 lt == DoubleType || rt == DoubleType ||
                 lt == FloatType || rt == FloatType) {
        // + 0.0 folds IEEE negative zero into +0.0: MySQL compares
        // -'' (= -0.0) equal to 0 ("floats in tuple are properly
        // hashed"); Double.compare(0.0, -0.0) is 1, not 0
        Some(java.lang.Double.compare(
          toDoubleVal(l, lt) + 0.0, toDoubleVal(r, rt) + 0.0))
      } else if ((isNumericish(lt) || isTemporal(lt)) &&
                 (isNumericish(rt) || isTemporal(rt))) {
        Some(toJbd(l, lt).compareTo(toJbd(r, rt)))
      } else None // arrays/structs/… — incomparable here → NULL
    }

    private def applyOp(sign: Int): Boolean = op match {
      case "=" | "<=>" => sign == 0
      case "<" => sign < 0
      case "<=" => sign <= 0
      case ">" => sign > 0
      case ">=" => sign >= 0
      case "!=" => sign != 0
    }

    override def eval(input: InternalRow): Any = {
      val l = left.eval(input)
      val r = right.eval(input)
      if (op == "<=>") {
        if (l == null && r == null) true
        else if (l == null || r == null) false
        else cmp(l, r).exists(applyOp)
      } else if (l == null || r == null) null
      else cmp(l, r) match {
        case Some(sign) => applyOp(sign)
        case None => null
      }
    }
    override protected def withNewChildrenInternal(l: Expression, r: Expression) =
      copy(l, r, op)
  }

  /** IN over mixed-type operands with per-pair MySQL comparison domains
    * and 3VL (`1 IN (NULL >= 1)` is NULL; `0 IN ('hi','bye')` is TRUE —
    * 'hi' reads as 0). Stripped to native In when every pair is
    * Spark-compatible. */
  case class MySqlIn(children: Seq[Expression])
      extends Expression with CodegenFallback {
    def value: Expression = children.head
    def elems: Seq[Expression] = children.tail
    override def dataType: DataType = BooleanType
    override def nullable: Boolean = true
    override def foldable: Boolean = children.forall(_.foldable)
    override def eval(input: InternalRow): Any = {
      val v = value.eval(input)
      if (v == null) return null
      var sawNull = false
      elems.foreach { el =>
        val e = el.eval(input)
        if (e == null) sawNull = true
        else MySqlCompare(value, el, "=").cmp(v, e) match {
          case Some(0) => return true
          case None => sawNull = true
          case _ =>
        }
      }
      if (sawNull) null else false
    }
    override protected def withNewChildrenInternal(
        newChildren: IndexedSeq[Expression]) = copy(newChildren)
  }

  /** CAST(x AS UNSIGNED) — uint64 semantics over DECIMAL(20,0) storage:
    * negative values wrap mod 2^64 (CONVERT(-3, UNSIGNED) is
    * 18446744073709551613), strings read their numeric prefix
    * (reference sql/types/number.go convertToUint64). */
  case class MySqlUnsigned(child: Expression)
      extends UnaryExpression with CodegenFallback {
    override def dataType: DataType = DecimalType(20, 0)
    override def nullable: Boolean = true
    private val TwoTo64 = new JBD(java.math.BigInteger.ONE.shiftLeft(64))
    // string→uint is the reference's TruncateStringToInt path
    // (number.go:1179, round=false): INTEGER-digit prefix only — no
    // fraction, no rounding ('5.932887e+07' AS UNSIGNED is 5, '3.6' is
    // 3), sign kept (negatives wrap below); garbage reads 0
    private val IntPrefix =
      java.util.regex.Pattern.compile("^[ \\t]*([+-]?\\d+)")
    private def strToJbdExact(s: String): JBD = {
      val m = IntPrefix.matcher(s)
      if (m.find()) new JBD(m.group(1)) else JBD.ZERO
    }
    override def nullSafeEval(v: Any): Any = {
      val jb = v match {
        case u: UTF8String => strToJbdExact(u.toString)
        case b: Array[Byte] => strToJbdExact(new String(b, "UTF-8"))
        case other => toJbd(other, child.dataType)
      }
      if (jb == null) return null
      var r = jb.setScale(0, RoundingMode.HALF_UP)
      while (r.signum() < 0) r = r.add(TwoTo64)
      while (r.compareTo(TwoTo64) >= 0) r = r.subtract(TwoTo64)
      Decimal(r, 20, 0)
    }
    override protected def withNewChildInternal(c: Expression) = copy(c)
  }

  /** BIT_COUNT with MySQL's operand domains (reference bit_ops.go /
    * function registry): a BINARY operand counts the set bits of the
    * byte string (bit_count(binary '…21 bytes…') = 73), numbers count
    * bits of their uint64 form (bit_count(-1) = 64), strings read their
    * numeric prefix. */
  case class MySqlBitCount(child: Expression)
      extends UnaryExpression with CodegenFallback {
    override def dataType: DataType = IntegerType
    override def nullable: Boolean = true
    override def nullSafeEval(v: Any): Any = v match {
      case b: Array[Byte] =>
        var n = 0; var i = 0
        while (i < b.length) { n += Integer.bitCount(b(i) & 0xff); i += 1 }
        n
      case u: UTF8String =>
        java.lang.Long.bitCount(strToDouble(u.toString).round)
      case other =>
        val jb = toJbd(other, child.dataType)
        if (jb == null) null
        else java.lang.Long.bitCount(
          jb.setScale(0, RoundingMode.HALF_UP).longValue())
    }
    override protected def withNewChildInternal(c: Expression) = copy(c)
  }

  /** DIV-operand coercion (reference div.go IntDiv): inexact operands
    * (double/float/string/temporal) convert to DECIMAL so Spark's
    * integral division accepts them — 1.2 DIV 1 is 1, 'a1' DIV 'a1' is
    * 0 DIV 0 → NULL. Identity (stripped) on exact numerics. */
  case class MySqlIntOperand(child: Expression)
      extends UnaryExpression with CodegenFallback {
    def isIdentity: Boolean = isExactNumeric(child.dataType)
    override def dataType: DataType =
      if (isIdentity) child.dataType else DecimalType(38, 9)
    override def nullable: Boolean = child.nullable
    override def nullSafeEval(v: Any): Any =
      if (isIdentity) v
      else {
        val jb = toJbd(v, child.dataType)
        if (jb == null) null else Decimal(jb.setScale(9, RoundingMode.HALF_UP), 38, 9)
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

  /** The BOOLEAN expression under a CAST(x AS JSON) shape — either the
    * raw Cast(bool AS STRING) or the (still unresolved) json_canon
    * wrapper around it. */
  private def boolJsonInner(e: Expression): Option[Expression] = e match {
    case inner: Cast if inner.dataType.isInstanceOf[StringType] &&
        inner.child.resolved && inner.child.dataType == BooleanType =>
      Some(inner.child)
    case f: org.apache.spark.sql.catalyst.analysis.UnresolvedFunction
        if f.nameParts.last.equalsIgnoreCase("json_canon") &&
          f.arguments.size == 1 =>
      boolJsonInner(f.arguments.head)
    case jc: graft.functions.json.JsonCanon => boolJsonInner(jc.child)
    case _ => None
  }

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
    case d: IntegralDivide =>
      // DIV needs exact operands; MySqlIntOperand converts inexact ones
      d.withNewChildren(d.children.map(c => MySqlIntOperand(mapOperand(c))))
    case a if isArith(a) && a.children.exists(isIntervalOperand) =>
      // temporal ± interval: native Spark semantics; interiors still
      // get their own rewrites
      a.withNewChildren(a.children.map(inner))
    case u: UnaryMinus => MySqlNeg(mapOperand(u.child))
    case a if isArith(a) => a.withNewChildren(a.children.map(mapOperand))
    case other => inner(other)
  }
  /** Divide coerces its own operands — no NumOperand wrap. Non-arith
    * operands re-enter the FULL rewrite so node-level cases (function
    * coercions, comparisons) still fire inside an arithmetic spine
    * (`sqrt(-1) + 1` needs sqrt's NULL-domain wrap). */
  private def divOperand(e: Expression): Expression =
    if (isArith(e)) mapSpine(e) else rewriteExpr(e)
  private def mapOperand(e: Expression): Expression =
    if (isArith(e)) {
      val m = mapSpine(e)
      // an interval-arithmetic subtree stays temporal internally, but as
      // an operand of the ENCLOSING spine it takes its numeric form like
      // any temporal value (ts1 - (ts2 - INTERVAL 1 SECOND) is numeric)
      if (e.children.exists(isIntervalOperand)) MySqlNumOperand(m) else m
    } else e match {
      // a HEX literal (X'0a') is a NUMBER in numeric context — its
      // big-endian byte value, not a string parse of the bytes
      // (reference types/bit.go hexlit coercion; CONV(10+X'0a'...))
      case Literal(b: Array[Byte], BinaryType) if b.length <= 8 =>
        Literal(b.foldLeft(0L)((acc, x) => (acc << 8) | (x & 0xffL)))
      case _ => MySqlNumOperand(rewriteExpr(e))
    }
  /** Recurse into a non-spine subtree for independent nested rewrites. */
  private def inner(e: Expression): Expression = e.mapChildren(rewriteExpr)

  /** A division chain that is a DIRECT comparison operand keeps its
    * internal (unrounded) value — queries.go:2842-2868: `1/3*3 in
    * (0.999999999)` is TRUE and `0 in (1/100000)` is FALSE, so the
    * display rounding must not apply before comparing. */
  private def noRound(e: Expression): Expression =
    if (isArith(e)) mapSpine(e) else rewriteExpr(e)

  private def cmpOp(cmp: BinaryComparison): String = cmp match {
    case _: EqualNullSafe => "<=>"
    case _: EqualTo => "="
    case _: LessThan => "<"
    case _: LessThanOrEqual => "<="
    case _: GreaterThan => ">"
    case _: GreaterThanOrEqual => ">="
  }
  /** Truthiness wrap for a boolean-context operand (AND/OR/NOT, WHERE,
    * IF cond, searched-CASE conditions). */
  private def boolWrap(e: Expression): Expression = MySqlBool(rewriteExpr(e))

  private val strArgFns = Set("md5", "sha1", "sha", "sha2")

  private def rewriteExpr(e: Expression): Expression = e match {
    case cmp: BinaryComparison =>
      MySqlCompare(noRound(cmp.left), noRound(cmp.right), cmpOp(cmp))
    case i: In => MySqlIn((i.value +: i.list).map(noRound))
    case i: InSubquery =>
      i.withNewChildren(i.values.map(noRound) :+ rewriteExpr(i.query))
    case a: And => And(boolWrap(a.left), boolWrap(a.right))
    case o: Or => Or(boolWrap(o.left), boolWrap(o.right))
    case n: Not => Not(boolWrap(n.child))
    case cw: CaseWhen =>
      // mixed BOOLEAN/numeric branch values unify numerically in MySQL
      // (a boolean arm is its 0/1 value); Spark's casewhen rejects the
      // pair. Statically-typed (literal-shaped) arms only.
      val branches =
        cw.branches.map { case (c, v) => (boolWrap(c), rewriteExpr(v)) }
      val elseV = cw.elseValue.map(rewriteExpr)
      val values = branches.map(_._2) ++ elseV.toSeq
      def dtOf(e: Expression): Option[DataType] =
        scala.util.Try(e.dataType).toOption
      val dts = values.map(dtOf)
      val mixBool = dts.forall(_.isDefined) &&
        dts.exists(_.contains(BooleanType)) &&
        dts.flatten.exists(d =>
          d != BooleanType && d.isInstanceOf[NumericType])
      def arm(r: Expression): Expression =
        if (mixBool && dtOf(r).contains(BooleanType)) Cast(r, IntegerType)
        else r
      CaseWhen(branches.map { case (c, v) => (c, arm(v)) }, elseV.map(arm))
    case i: If =>
      If(boolWrap(i.predicate), rewriteExpr(i.trueValue),
        rewriteExpr(i.falseValue))
    case l: Like =>
      Like(MySqlStrOperand(rewriteExpr(l.left)),
        MySqlStrOperand(rewriteExpr(l.right)), l.escapeChar)
    case c: Concat =>
      // || under PIPES_AS_CONCAT concatenates MySQL string forms
      // (true || false is '10', not 'truefalse')
      c.withNewChildren(c.children.map(ch =>
        MySqlStrOperand(rewriteExpr(ch))))
    case f: org.apache.spark.sql.catalyst.analysis.UnresolvedFunction
        if f.arguments.nonEmpty &&
          f.nameParts.last.equalsIgnoreCase("concat") =>
      // CONCAT() calls too — including the pipesConcatTight fold of
      // high-precedence `||`, which reaches this rewrite unresolved
      f.copy(arguments = f.arguments.map(a =>
        MySqlStrOperand(rewriteExpr(a))))
    case b: Between =>
      // MySQL BETWEEN is (a >= lo AND a <= hi) with per-pair comparison
      // coercion; Spark's RuntimeReplaceable desugar would use native
      // comparisons that reject mixed operand types
      val in = noRound(b.input)
      And(MySqlCompare(in, noRound(b.lower), ">="),
        MySqlCompare(in, noRound(b.upper), "<="))
    case f: org.apache.spark.sql.catalyst.analysis.UnresolvedFunction
        if f.arguments.size == 3 &&
          f.nameParts.last.equalsIgnoreCase("between") =>
      // Spark 4 parses BETWEEN as the `between` function (resolved to a
      // With/CommonExpression) — same MySQL pairwise-coercion expansion
      // as the Between node above
      val in = noRound(f.arguments(0))
      And(MySqlCompare(in, noRound(f.arguments(1)), ">="),
        MySqlCompare(in, noRound(f.arguments(2)), "<="))
    case f: org.apache.spark.sql.catalyst.analysis.UnresolvedFunction
        if f.arguments.size == 3 && f.nameParts.last.equalsIgnoreCase("if") =>
      f.copy(arguments = Seq(boolWrap(f.arguments(0)),
        rewriteExpr(f.arguments(1)), rewriteExpr(f.arguments(2))))
    case f: org.apache.spark.sql.catalyst.analysis.UnresolvedFunction
        if f.arguments.nonEmpty &&
          strArgFns(f.nameParts.last.toLowerCase) =>
      f.copy(arguments = MySqlStrOperand(rewriteExpr(f.arguments.head)) +:
        f.arguments.tail.map(rewriteExpr))
    case f: org.apache.spark.sql.catalyst.analysis.UnresolvedFunction
        if f.arguments.size == 1 &&
          f.nameParts.last.equalsIgnoreCase("dayname") =>
      // MySQL DAYNAME is the full weekday name ("Tuesday"); Spark's
      // builtin dayname() abbreviates, so map to date_format 'EEEE'
      f.copy(nameParts = Seq("date_format"),
        arguments = Seq(MySqlDateOperand(rewriteExpr(f.arguments.head)),
          org.apache.spark.sql.catalyst.expressions.Literal("EEEE")))
    case f: org.apache.spark.sql.catalyst.analysis.UnresolvedFunction
        if f.arguments.size >= 2 && f.arguments.forall(_.resolved) &&
          Set("coalesce", "ifnull")(f.nameParts.last.toLowerCase) &&
          f.arguments.map(a => typeClass(a.dataType))
            .filter(_ != 0).distinct.size > 1 =>
      // heterogeneously-typed COALESCE: the reference evaluates
      // dynamically and displays the chosen value in its OWN type's
      // form (coalesce(1, 0.0) is "1", not decimal "1.0"). Resolved
      // (literal-shaped) arguments only — column exprs keep Spark's
      // native typed coalesce.
      MySqlCoalesceDyn(f.arguments.map(rewriteExpr))
    case f: org.apache.spark.sql.catalyst.analysis.UnresolvedFunction
        if f.arguments.size == 1 &&
          f.nameParts.last.equalsIgnoreCase("bit_count") =>
      MySqlBitCount(rewriteExpr(f.arguments.head))
    case f: org.apache.spark.sql.catalyst.analysis.UnresolvedFunction
        if f.arguments.size == 1 &&
          Set("sqrt", "asin", "acos")(f.nameParts.last.toLowerCase) =>
      // MySQL yields NULL outside the domain where Spark yields NaN
      // (sqrt(-1), asin(2)); NULL-safe via nanvl → null
      NaNvl(f.copy(arguments = Seq(rewriteExpr(f.arguments.head))),
        Literal(null, DoubleType))
    case f: org.apache.spark.sql.catalyst.analysis.UnresolvedFunction
        if f.arguments.size == 1 && !f.isDistinct &&
          Set("sum", "avg")(f.nameParts.last.toLowerCase) =>
      // SUM/AVG over strings aggregate the numeric prefix (sum('abc')
      // over n rows is 0, not NULL) — identity-stripped when numeric
      f.copy(arguments = Seq(MySqlNumOperand(rewriteExpr(f.arguments.head))))
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
    case s: ShiftLeft =>
      MySqlBitOp(rewriteExpr(s.left), rewriteExpr(s.right), "<<")
    case s: ShiftRight =>
      MySqlBitOp(rewriteExpr(s.left), rewriteExpr(s.right), ">>")
    case c: Cast if c.dataType == DecimalType(20, 0) =>
      // DECIMAL(20,0) casts only arise from the AS UNSIGNED mapping
      // (Dialect chain) — uint64 wrap semantics
      MySqlUnsigned(rewriteExpr(c.child))
    case c: Cast
        if (c.dataType == DoubleType || c.dataType == FloatType ||
            c.dataType == LongType || c.dataType == IntegerType ||
            c.dataType.isInstanceOf[DecimalType]) &&
          (!c.child.resolved ||
            (!c.child.isInstanceOf[Literal] &&
              isStringish(c.child.dataType))) &&
          boolJsonInner(c.child).isEmpty =>
      // CAST(string COLUMN AS number): MySQL prefix-parses the value
      // ('  3 12 4' -> 3, '-3.1a' -> -3.1, '5.9e7abc' -> 5.9e7; the
      // SIGNED form stops at the first non-digit). Column types are
      // unknown at parse, so every numeric cast wraps adaptively and
      // non-string children strip back to the native Cast post-analysis.
      // Literal casts keep the textual pass (lenientCastLiterals) with
      // its 1292 warnings.
      MySqlStrNumCast(rewriteExpr(c.child), c.dataType)
    case c: Cast
        if c.dataType.isInstanceOf[NumericType] &&
          (c.child match {
            case Literal(b: Array[Byte], BinaryType) => b.length <= 8
            case _ => false
          }) =>
      // CAST(X'20' AS DECIMAL/SIGNED): a hex literal is its big-endian
      // numeric value in numeric context (reference types coercion)
      val b = c.child.asInstanceOf[Literal].value.asInstanceOf[Array[Byte]]
      Cast(Literal(b.foldLeft(0L)((acc, x) => (acc << 8) | (x & 0xffL))),
        c.dataType)
    case c: Cast
        if (c.dataType.isInstanceOf[StringType] ||
            c.dataType.isInstanceOf[org.apache.spark.sql.types.CharType] ||
            c.dataType.isInstanceOf[org.apache.spark.sql.types.VarcharType]) &&
          c.child.isInstanceOf[Literal] && c.child.resolved &&
          c.child.dataType == BinaryType =>
      // CAST(X'...' AS CHAR(n)): bytes must decode as valid utf8mb4 or
      // the cast reads NULL with a 1300-shaped warning (reference
      // charset validation); Spark would emit replacement chars
      try {
        val b = c.child.asInstanceOf[Literal].value.asInstanceOf[Array[Byte]]
        val dec = java.nio.charset.StandardCharsets.UTF_8.newDecoder()
        val s = dec.decode(java.nio.ByteBuffer.wrap(b)).toString
        Cast(Literal(s), c.dataType)
      } catch {
        case _: java.nio.charset.CharacterCodingException =>
          Literal(null, StringType)
      }
    case c: Cast
        if (c.dataType == DateType || c.dataType == TimestampType ||
            c.dataType == TimestampNTZType) &&
          c.child.isInstanceOf[Literal] && c.child.resolved &&
          c.child.dataType.isInstanceOf[NumericType] =>
      // CAST(20090209 AS DATE): MySQL reads the DIGITS as a date shape;
      // non-date digit runs (CAST(1234 AS DATE)) read NULL
      Cast(graft.functions.DateTimeExt.MySqlDtNorm(
        Cast(rewriteExpr(c.child), StringType)), c.dataType)
    case c: Cast
        if c.dataType == BinaryType && c.child.resolved &&
          c.child.dataType.isInstanceOf[NumericType] =>
      // CAST(1 AS BINARY) is the DIGIT bytes "1" in MySQL, not the
      // machine int encoding Spark produces (types/strings.go)
      Cast(Cast(rewriteExpr(c.child), StringType), BinaryType)
    case c: Cast
        if c.dataType.isInstanceOf[NumericType] &&
          boolJsonInner(c.child).isDefined =>
      // CAST(CAST(bool AS JSON) AS SIGNED): the JSON boolean document is
      // its 0/1 value, not Spark's failed 'true'-string parse (the json
      // cast may appear as a raw string cast or the json_canon wrapper)
      Cast(rewriteExpr(boolJsonInner(c.child).get), c.dataType)
    case sub: org.apache.spark.sql.catalyst.expressions.SubqueryExpression =>
      sub.withNewPlan(apply(sub.plan))
    case other => other.mapChildren(rewriteExpr)
  }

  /** Apply to a parsed (unresolved) plan, descending into subquery
    * expressions and inner CTE definitions. */
  def apply(plan: LogicalPlan): LogicalPlan = {
    import org.apache.spark.sql.catalyst.plans.logical.{Filter, Join}
    val withExprs = plan.transformDown {
      // boolean-context plan conditions take MySQL truthiness (WHERE i,
      // HAVING cnt, ON 1) — identity-stripped when already boolean
      case f: Filter => f.copy(condition = boolWrap(f.condition))
      case j: Join if j.condition.isDefined =>
        j.copy(condition = j.condition.map(boolWrap))
      case h: org.apache.spark.sql.catalyst.analysis.UnresolvedHaving =>
        h.copy(havingCondition = boolWrap(h.havingCondition))
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

  /** Does this comparison pair need MySQL semantics, or does Spark's
    * native coercion already match? Mixed string/number, temporal/string
    * and boolean/number pairs stay custom; everything else (and any
    * JSON-producing side — JsonNumericCompareRule owns those) reverts to
    * the native operator so codegen/pushdown/equi-join extraction see
    * standard Catalyst nodes. */
  private def needsMySqlCmp(l: Expression, r: Expression): Boolean = {
    val (lt, rt) = (l.dataType, r.dataType)
    if (isBoolJsonCast(l) != isBoolJsonCast(r) &&
        isStringish(lt) && isStringish(rt)) true
    else if (isJsonSide(l) || isJsonSide(r))
      // JSON-vs-number double-compares natively (JsonNumericCompareRule
      // semantics, applied by nativeCmp); JSON-vs-boolean needs the
      // custom bool-text comparison ('true' doc = TRUE is 1, not NULL);
      // an explicit CAST(x AS JSON) vs a plain string compares as
      // documents (the string side is a JSON string scalar)
      lt == BooleanType || rt == BooleanType ||
        (isJsonCanonSide(l) != isJsonCanonSide(r))
    else if (isStringish(lt) && isNumericish(rt)) true
    else if (isNumericish(lt) && isStringish(rt)) true
    else if (isTemporal(lt) && isStringish(rt)) true
    else if (isStringish(lt) && isTemporal(rt)) true
    else if ((lt == BooleanType) != (rt == BooleanType) &&
      isNumericish(lt) && isNumericish(rt)) true
    else false
  }
  private def isJsonSide(e: Expression): Boolean = e match {
    case _: graft.functions.json.JsonExtractMySql => true
    case _: graft.functions.json.JsonValueFn => true
    case _: graft.functions.json.JsonCanon => true
    case c: Cast => isJsonSide(c.child)
    case s: MySqlStrOperand => isJsonSide(s.child)
    case n: MySqlNumOperand => isJsonSide(n.child)
    case _ => false
  }

  private def mkCmp(op: String, l: Expression, r: Expression): Expression =
    op match {
      case "=" => EqualTo(l, r)
      case "<=>" => EqualNullSafe(l, r)
      case "<" => LessThan(l, r)
      case "<=" => LessThanOrEqual(l, r)
      case ">" => GreaterThan(l, r)
      case ">=" => GreaterThanOrEqual(l, r)
    }

  /** Native comparison with the implicit casts the analyzer would have
    * inserted had it seen the pair (the custom node hid the types from
    * type coercion, so the strip re-derives them): null side casts to
    * the other, JSON-vs-numeric goes to double (JsonNumericCompareRule
    * semantics), string pairs prefer the collated side, the rest use
    * the standard widest type. Returns the original node when no sound
    * native form exists. */
  private def nativeCmp(c: MySqlCompare): Expression = {
    val (lt, rt) = (c.left.dataType, c.right.dataType)
    if (lt == rt) mkCmp(c.op, c.left, c.right)
    else if (lt == NullType) mkCmp(c.op, Cast(c.left, rt), c.right)
    else if (rt == NullType) mkCmp(c.op, c.left, Cast(c.right, lt))
    else if ((isJsonSide(c.left) || isJsonSide(c.right)) &&
             ((isNumericish(lt) && lt != BooleanType) ||
              (isNumericish(rt) && rt != BooleanType)))
      mkCmp(c.op, Cast(c.left, DoubleType), Cast(c.right, DoubleType))
    else (lt, rt) match {
      case (a: StringType, b: StringType) =>
        // collation coercion: the non-default-collated side wins
        val t = if (a == StringType) b else a
        mkCmp(c.op,
          if (lt == t) c.left else Cast(c.left, t),
          if (rt == t) c.right else Cast(c.right, t))
      case _ =>
        org.apache.spark.sql.catalyst.analysis.TypeCoercion
          .findWiderTypeForTwo(lt, rt) match {
          case Some(t) => mkCmp(c.op,
            if (lt == t) c.left else Cast(c.left, t),
            if (rt == t) c.right else Cast(c.right, t))
          case None => c
        }
    }
  }

  private def nativeIn(i: MySqlIn): Expression = {
    val types = i.children.map(_.dataType)
    if (types.distinct.size == 1) In(i.value, i.elems)
    else {
      val common = types.tail.foldLeft(Option(types.head)) { (acc, t) =>
        acc.flatMap(a =>
          if (a == t) Some(a)
          else org.apache.spark.sql.catalyst.analysis.TypeCoercion
            .findWiderTypeForTwo(a, t))
      }
      common match {
        case Some(t) =>
          def co(e: Expression) = if (e.dataType == t) e else Cast(e, t)
          In(co(i.value), i.elems.map(co))
        case None => i // custom eval is exact for the leftover mixes
      }
    }
  }

  private val stripRules: PartialFunction[Expression, Expression] = {
    case sub: SubqueryExpression => sub.withNewPlan(stripIdentity(sub.plan))
    case n: MySqlNumOperand if n.isIdentity => n.child
    case n: MySqlIntOperand if n.isIdentity => n.child
    case b: MySqlBool if b.isIdentity => b.child
    case b: MySqlBool if b.child.dataType == NullType =>
      Literal(null, BooleanType)
    case s: MySqlStrOperand if s.isIdentity => s.child
    case d: MySqlDateOperand if d.isIdentity => d.child
    case c: MySqlCompare if !needsMySqlCmp(c.left, c.right) => nativeCmp(c)
    case i: MySqlIn if !i.elems.exists(el => needsMySqlCmp(i.value, el)) =>
      nativeIn(i)
    case r: MySqlDivRound if !r.child.dataType.isInstanceOf[DecimalType] =>
      r.child
    case c: MySqlStrNumCast
        if !isStringish(c.child.dataType) && c.child.dataType != BinaryType =>
      Cast(c.child, c.dataType)
  }

  /** Post-analysis cleanup: identity wrappers disappear so well-typed
    * expressions keep whole-stage codegen; adaptive comparison nodes on
    * Spark-compatible pairs revert to native operators (with re-derived
    * implicit casts) so codegen/pushdown/equi-join extraction are
    * unaffected. Bottom-up so a wrapper sees its already-stripped child. */
  def stripIdentity(plan: LogicalPlan): LogicalPlan =
    plan.transformUp { case p => p.transformExpressionsUp(stripRules) }
}
