package graft.functions

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import com.fasterxml.jackson.databind.node.{ArrayNode, JsonNodeFactory, ObjectNode}
import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

import scala.jdk.CollectionConverters._

/** MySQL JSON function family — SURVEY.md §2.8 JSON bucket (reference:
  * sql/expression/function/json/, ~4.7k LoC over the jsonpath dep and the
  * JSONDocument value model in sql/types/json_value.go:125).
  *
  * Implemented as native Catalyst expressions over a Jackson value model.
  * Path syntax is the MySQL subset actually used by the reference tests:
  * `$`, `.key`, `."quoted key"`, `[N]`. Serialization is compact
  * (`{"a":1}`), matching DuckDB's JSON output so the oracle can use
  * DuckDB's native json functions; MySQL's cosmetic `", "` separators are
  * a documented divergence (values and structure are identical).
  */
object json {

  private val mapper = new ObjectMapper()
  private val F = JsonNodeFactory.instance

  // ---- path model -----------------------------------------------------
  // Full MySQL path grammar (reference sql/expression/function/json/ via
  // the dolthub/jsonpath dep): `$`, `.key`, `."quoted"`, `[N]`, plus the
  // multi-match forms `.*`, `[*]`, `**` (recursive descent), `[last]` /
  // `[last-N]`, and ranges `[M to N]` (bounds may be `last-N`).

  sealed private trait Step
  private case class Key(name: String) extends Step
  private case class Idx(i: Int) extends Step
  /** array index bound: `last - off` when fromLast, else plain `v`. */
  private case class Bound(v: Int, fromLast: Boolean) {
    def resolve(size: Int): Int = if (fromLast) size - 1 - v else v
  }
  private case class IdxLast(off: Int) extends Step
  private case class IdxRange(from: Bound, to: Bound) extends Step
  private case object KeyWild extends Step  // .*
  private case object IdxWild extends Step  // [*]
  private case object Descend extends Step  // **

  private def isMulti(s: Step): Boolean = s match {
    case KeyWild | IdxWild | Descend | _: IdxRange => true
    case _ => false
  }
  private def hasWildcard(steps: Seq[Step]): Boolean = steps.exists(isMulti)

  /** Parse `$`, `$.a`, `$."a b"`, `$.a[0].b`, `$.a[*].b`, `$**.c`,
    * `$.a[last-1]`, `$.a[0 to 2]` … Returns null on malformed paths
    * (callers surface that as SQL NULL, matching MySQL's error→null
    * behavior in read context). `**` must be followed by another leg
    * (MySQL rejects a trailing `**`). */
  private def parsePath(p: String): Seq[Step] = {
    if (p == null || !p.startsWith("$")) return null
    val steps = Seq.newBuilder[Step]
    var i = 1
    def bound(s: String): Bound = {
      val t = s.trim
      if (t == "last") Bound(0, fromLast = true)
      else if (t.startsWith("last")) {
        val rest = t.drop(4).trim
        if (!rest.startsWith("-")) return null
        Bound(rest.drop(1).trim.toInt, fromLast = true)
      } else Bound(t.toInt, fromLast = false)
    }
    while (i < p.length) {
      p.charAt(i) match {
        case '.' =>
          i += 1
          if (i < p.length && p.charAt(i) == '[') {
            // `$.[0]`: MySQL tolerates a dot before a bracket leg
            // (queries.go JSON_EXTRACT('[1, 2, 3]', '$.[0]'))
          } else if (i < p.length && p.charAt(i) == '"') {
            val end = p.indexOf('"', i + 1)
            if (end < 0) return null
            steps += Key(p.substring(i + 1, end)); i = end + 1
          } else if (i < p.length && p.charAt(i) == '*') {
            steps += KeyWild; i += 1
          } else {
            val start = i
            while (i < p.length && p.charAt(i) != '.' && p.charAt(i) != '[' &&
                   p.charAt(i) != '*') i += 1
            if (i == start) return null
            steps += Key(p.substring(start, i))
          }
        case '[' =>
          val end = p.indexOf(']', i)
          if (end < 0) return null
          val body = p.substring(i + 1, end).trim
          val step: Step =
            try {
              if (body == "*") IdxWild
              else if (body.contains(" to ")) {
                val Array(a, b) = body.split(" to ", 2)
                val (ba, bb) = (bound(a), bound(b))
                if (ba == null || bb == null) return null
                IdxRange(ba, bb)
              } else {
                val bd = bound(body)
                if (bd == null) return null
                if (bd.fromLast) IdxLast(bd.v) else Idx(bd.v)
              }
            } catch { case _: NumberFormatException => return null }
          steps += step; i = end + 1
        case '*' if i + 1 < p.length && p.charAt(i + 1) == '*' =>
          steps += Descend; i += 2
        case _ => return null
      }
    }
    val r = steps.result()
    if (r.nonEmpty && r.last == Descend) null else r
  }

  /** Single-match navigation (mutation sites; wildcard steps yield null —
    * MySQL rejects wildcard paths in write context). */
  private def navigate(root: JsonNode, steps: Seq[Step]): JsonNode = {
    var cur = root
    steps.foreach { s =>
      if (cur == null) return null
      cur = s match {
        case Key(k) => if (cur.isObject) cur.get(k) else null
        case Idx(i) => if (cur.isArray) cur.get(i) else null
        case IdxLast(off) => if (cur.isArray) cur.get(cur.size - 1 - off) else null
        case _ => null
      }
    }
    cur
  }

  /** Pre-order: the node itself, then descendants in document order. */
  private def collectDescend(n: JsonNode,
      acc: scala.collection.mutable.ArrayBuffer[JsonNode]): Unit = {
    acc += n
    if (n.isObject || n.isArray) n.elements().asScala.foreach(collectDescend(_, acc))
  }

  /** Multi-match navigation (read context). MySQL autowrap rule applies at
    * the `[N]` leg: a non-array behaves as a one-element array, so `$[0]`
    * (and `$[last]`) on a scalar selects the scalar. */
  private def navigateAll(root: JsonNode, steps: Seq[Step]): Seq[JsonNode] = {
    var cur: Seq[JsonNode] = if (root == null) Nil else Seq(root)
    steps.foreach { s =>
      cur = cur.flatMap { n =>
        s match {
          case Key(k) =>
            if (n.isObject) Option(n.get(k)).toSeq else Nil
          case Idx(i) =>
            if (n.isArray) Option(n.get(i)).toSeq
            else if (i == 0) Seq(n) else Nil
          case IdxLast(off) =>
            if (n.isArray) Option(n.get(n.size - 1 - off)).toSeq
            else if (off == 0) Seq(n) else Nil
          case IdxRange(a, b) =>
            val size = if (n.isArray) n.size else 1
            val (lo, hi) = (math.max(a.resolve(size), 0),
              math.min(b.resolve(size), size - 1))
            if (n.isArray) (lo to hi).flatMap(j => Option(n.get(j)))
            else if (lo <= 0 && hi >= 0) Seq(n) else Nil
          case KeyWild =>
            if (n.isObject) n.elements().asScala.toSeq else Nil
          case IdxWild =>
            if (n.isArray) n.elements().asScala.toSeq else Nil
          case Descend =>
            val buf = scala.collection.mutable.ArrayBuffer.empty[JsonNode]
            collectDescend(n, buf)
            buf.toSeq
        }
      }
    }
    cur
  }

  private def tryParse(s: String): JsonNode =
    try mapper.readTree(s) catch { case _: Exception => null }

  private def out(n: JsonNode): UTF8String = UTF8String.fromString(n.toString)

  /** (JSON type rank, string value when the document is a string
    * scalar) for document-vs-string comparisons; unparseable text reads
    * as a string scalar. Ranks only order deterministically. */
  def docTypeRank(text: String): (Int, String) = {
    val d = tryParse(text)
    if (d == null) (3, text)
    else if (d.isNull) (1, null)
    else if (d.isNumber) (2, null)
    else if (d.isTextual) (3, d.asText())
    else if (d.isObject) (4, null)
    else if (d.isArray) (5, null)
    else (6, null) // boolean
  }

  /** MySQL's JSON display form — ", " element and ": " key separators
    * (compact otherwise). Used when a document coerces to a STRING
    * (e.g. as a JSON_OBJECT key). */
  def mysqlJsonText(n: JsonNode): String = n match {
    case o: ObjectNode =>
      val it = o.fieldNames()
      val parts = Seq.newBuilder[String]
      while (it.hasNext) {
        val k = it.next()
        parts += F.textNode(k).toString + ": " + mysqlJsonText(o.get(k))
      }
      parts.result().mkString("{", ", ", "}")
    case a: ArrayNode =>
      (0 until a.size).map(i => mysqlJsonText(a.get(i)))
        .mkString("[", ", ", "]")
    case other => other.toString
  }

  /** MySQL's binary-JSON object layout sorts keys by LENGTH, then by
    * code point; display reflects it (json_scripts.go "json is formatted
    * correctly": '{"b":2,"a":1}' reads back '{"a": 1, "b": 2}').
    * Recursive over nested objects/arrays. */
  private def canonicalNode(n: JsonNode): JsonNode = n match {
    case o: ObjectNode =>
      val names = {
        val it = o.fieldNames()
        val b = Seq.newBuilder[String]
        while (it.hasNext) b += it.next()
        b.result().sortBy(k => (k.length, k))
      }
      val r = F.objectNode()
      names.foreach(k => r.set[JsonNode](k, canonicalNode(o.get(k))))
      r
    case a: ArrayNode =>
      val r = F.arrayNode()
      (0 until a.size).foreach(i => r.add(canonicalNode(a.get(i))))
      r
    case other => other
  }

  /** Canonical storage text for a JSON column write; null when the text
    * is not valid JSON. */
  def canonicalText(s: String): String = {
    val d = tryParse(s)
    if (d == null) null else canonicalNode(d).toString
  }

  /** Column-level canonicalizer for JSON-typed writes (declared JSON
    * columns only — the write path applies it). Invalid JSON passes
    * through unchanged (the strict-mode probe errors separately). */
  case class JsonCanon(child: Expression) extends JsonExpr {
    override def children: Seq[Expression] = Seq(child)
    override def dataType: DataType = StringType
    protected def evalNotNull(vs: Seq[Any]): Any = {
      val raw = str(vs(0))
      val c = canonicalText(raw)
      UTF8String.fromString(if (c == null) raw else c)
    }
    override protected def withNewChildrenInternal(n: IndexedSeq[Expression]) =
      copy(n.head)
  }

  /** SQL scalar → Jackson node (the value argument of set/insert/replace).
    * Strings become JSON strings (NOT parsed), mirroring MySQL. */
  private def toNode(v: Any): JsonNode = v match {
    case null => F.nullNode()
    case s: UTF8String => F.textNode(s.toString)
    case b: Boolean => F.booleanNode(b)
    case i: Int => F.numberNode(i)
    case l: Long => F.numberNode(l)
    case d: Double => F.numberNode(d)
    case f: Float => F.numberNode(f)
    case d: org.apache.spark.sql.types.Decimal => F.numberNode(d.toJavaBigDecimal)
    case other => F.textNode(other.toString)
  }

  /** Set/insert/replace at `steps` under MySQL mode rules:
    * set = create-or-overwrite; insert = create-only; replace = overwrite-only.
    * Mutates a deep copy; returns the new root. */
  private def mutate(root: JsonNode, steps: Seq[Step], value: JsonNode,
                     create: Boolean, overwrite: Boolean): JsonNode = {
    if (steps.isEmpty) return if (overwrite) value else root
    val copy = root.deepCopy[JsonNode]()
    val parent = navigate(copy, steps.init)
    if (parent == null) return copy
    (steps.last, parent) match {
      case (Key(k), o: ObjectNode) =>
        val exists = o.has(k)
        if ((exists && overwrite) || (!exists && create)) o.set[JsonNode](k, value)
      case (Idx(i), a: ArrayNode) =>
        if (i < a.size) { if (overwrite) a.set(i, value) }
        else if (create) a.add(value) // MySQL appends when index past end
      case _ => ()
    }
    copy
  }

  private def removeAt(root: JsonNode, steps: Seq[Step]): JsonNode = {
    if (steps.isEmpty) return root
    val copy = root.deepCopy[JsonNode]()
    val parent = navigate(copy, steps.init)
    (if (parent == null) None else Some(steps.last -> parent)) match {
      case Some((Key(k), o: ObjectNode)) => o.remove(k)
      case Some((Idx(i), a: ArrayNode)) => if (i < a.size) a.remove(i)
      case _ => ()
    }
    copy
  }

  /** RFC 7396 merge patch (MySQL JSON_MERGE_PATCH). */
  private def mergePatch(target: JsonNode, patch: JsonNode): JsonNode =
    if (!patch.isObject) patch.deepCopy[JsonNode]()
    else {
      val base: ObjectNode =
        if (target != null && target.isObject) target.deepCopy[ObjectNode]()
        else F.objectNode()
      patch.properties().asScala.foreach { e =>
        if (e.getValue.isNull) base.remove(e.getKey)
        else base.set[JsonNode](e.getKey, mergePatch(base.get(e.getKey), e.getValue))
      }
      base
    }

  /** MySQL JSON_MERGE_PRESERVE: arrays concatenate, objects merge
    * recursively, scalars wrap into arrays. */
  private def mergePreserve(a: JsonNode, b: JsonNode): JsonNode = (a, b) match {
    case (x: ArrayNode, y: ArrayNode) =>
      val r = x.deepCopy[ArrayNode](); r.addAll(y.deepCopy[ArrayNode]()); r
    case (x: ArrayNode, y) =>
      val r = x.deepCopy[ArrayNode](); r.add(y.deepCopy[JsonNode]()); r
    case (x, y: ArrayNode) =>
      val r = F.arrayNode(); r.add(x.deepCopy[JsonNode]())
      r.addAll(y.deepCopy[ArrayNode]()); r
    case (x: ObjectNode, y: ObjectNode) =>
      val r = x.deepCopy[ObjectNode]()
      y.properties().asScala.foreach { e =>
        if (r.has(e.getKey)) r.set[JsonNode](e.getKey, mergePreserve(r.get(e.getKey), e.getValue))
        else r.set[JsonNode](e.getKey, e.getValue.deepCopy[JsonNode]())
      }
      r
    case (x, y) =>
      val r = F.arrayNode(); r.add(x.deepCopy[JsonNode]()); r.add(y.deepCopy[JsonNode]()); r
  }

  private def depthOf(n: JsonNode): Int =
    if (n.isContainerNode && n.size() > 0)
      1 + n.elements().asScala.map(depthOf).max
    else 1

  /** MySQL JSON_TYPE names. */
  private def typeName(n: JsonNode): String =
    if (n.isObject) "OBJECT"
    else if (n.isArray) "ARRAY"
    else if (n.isTextual) "STRING"
    else if (n.isBoolean) "BOOLEAN"
    else if (n.isNull) "NULL"
    // integral values past uint32 report the unsigned type (reference
    // json type mapping: json_type('4294967296') is UNSIGNED INTEGER,
    // '4294967295' is INTEGER)
    else if (n.isIntegralNumber)
      if (n.asLong(0L) > 4294967295L) "UNSIGNED INTEGER" else "INTEGER"
    else "DOUBLE"

  /** MySQL JSON_CONTAINS semantics. */
  private def contains(target: JsonNode, cand: JsonNode): Boolean =
    if (target.isArray)
      if (cand.isArray) cand.elements().asScala.forall(c =>
        target.elements().asScala.exists(t => contains(t, c)))
      else target.elements().asScala.exists(t => contains(t, cand))
    else if (target.isObject && cand.isObject)
      cand.properties().asScala.forall(e =>
        target.has(e.getKey) && contains(target.get(e.getKey), e.getValue))
    else if (target.isNumber && cand.isNumber)
      target.decimalValue().compareTo(cand.decimalValue()) == 0
    else target == cand

  /** Depth-first search for string values LIKE `pat` (% and _ wildcards);
    * returns MySQL-style quoted path of the first match, or null. */
  private def searchAll(n: JsonNode, path: String, rx: String,
      acc: scala.collection.mutable.LinkedHashSet[String],
      stopAtOne: Boolean): Unit = {
    if (stopAtOne && acc.nonEmpty) return
    if (n.isTextual) {
      if (n.asText().matches(rx)) acc += "\"" + path + "\""
      return
    }
    if (n.isObject)
      n.properties().asScala.foreach(e =>
        searchAll(e.getValue, s"$path.${e.getKey}", rx, acc, stopAtOne))
    if (n.isArray)
      n.elements().asScala.zipWithIndex.foreach { case (c, i) =>
        searchAll(c, s"$path[$i]", rx, acc, stopAtOne) }
  }

  private def likeToRegex(pat: String): String =
    java.util.regex.Pattern.quote(pat)
      .replace("%", "\\E.*\\Q").replace("_", "\\E.\\Q")

  // ---- expressions ----------------------------------------------------

  /** Variadic base: evaluates all children, null-propagates. A trait (not
    * an abstract class with ctor params) so Java deserialization never needs
    * a no-arg constructor on it. */
  trait JsonExpr extends Expression with CodegenFallback {
    override def nullable: Boolean = true
    override def eval(input: InternalRow): Any = {
      val vs = children.map(_.eval(input))
      if (vs.contains(null)) null else evalNotNull(vs)
    }
    protected def evalNotNull(vs: Seq[Any]): Any
    protected def str(v: Any): String = v match {
      case u: UTF8String => u.toString
      // non-string inputs (CAST(decimal AS JSON) reaching the fn
      // unchanged, numeric literals) render as their JSON text
      case d: org.apache.spark.sql.types.Decimal => d.toBigDecimal.bigDecimal.toPlainString
      case b: Array[Byte] => new String(b, "UTF-8")
      case other => String.valueOf(other)
    }
    /** The DOCUMENT argument must be a JSON/text value — a numeric
      * column is MySQL's "Invalid data type for JSON data"
      * (json_scripts.go json_length over json_extract(int_col, …)). */
    protected def doc(v: Any): JsonNode = v match {
      case _: UTF8String | _: Array[Byte] => tryParse(str(v))
      case _ => throw new IllegalArgumentException(
        "Invalid data type for JSON data in argument 1 (MySQL 3144)")
    }
  }

  /** JSON_EXTRACT(doc, path, ...) — the JSON fragment(s) at the path(s).
    * MySQL one-vs-many rule: a single non-wildcard path returns the match
    * itself; wildcard paths or multiple path args return a JSON array of
    * every match (empty match set -> SQL NULL). */
  case class JsonExtractMySql(children: Seq[Expression]) extends JsonExpr {
    override def dataType: DataType = StringType
    protected def evalNotNull(vs: Seq[Any]): Any = {
      val d = doc(vs(0))
      if (d == null) return null
      val paths = vs.drop(1).map(v => parsePath(str(v)))
      if (paths.contains(null)) return null
      val matches = paths.flatMap(p => navigateAll(d, p))
      val wrap = paths.length > 1 || paths.exists(hasWildcard)
      if (matches.isEmpty) null
      else if (!wrap) out(matches.head)
      else {
        val arr = F.arrayNode()
        matches.foreach(arr.add)
        out(arr)
      }
    }
    override protected def withNewChildrenInternal(n: IndexedSeq[Expression]) = copy(n)
  }

  /** JSON matches of a (possibly wildcard) path as ARRAY<STRING> of
    * fragments, in document order — the row source for JSON_TABLE
    * (reference sql/plan/json_table.go rootPath iteration). Empty match
    * set -> empty array; malformed doc/path -> NULL. */
  case class JsonMatches(children: Seq[Expression]) extends JsonExpr {
    override def dataType: DataType = ArrayType(StringType)
    protected def evalNotNull(vs: Seq[Any]): Any = {
      val d = doc(vs(0)); val p = parsePath(str(vs(1)))
      if (d == null || p == null) return null
      new org.apache.spark.sql.catalyst.util.GenericArrayData(
        navigateAll(d, p).map(out).toArray[Any])
    }
    override protected def withNewChildrenInternal(n: IndexedSeq[Expression]) = copy(n)
  }

  /** One-parse column batch for a JSON_TABLE level (graft.plans.JsonTable):
    * parses the document ONCE and evaluates every path-driven column of
    * the level against the parsed tree, returning them as a struct.
    * `specs` pairs (field name, kind); children = doc +: one path literal
    * per spec. Kinds:
    *   0 = extract+unquote (JsonExtractMySql one-path + JsonUnquote chain),
    *   1 = exists (JsonContainsPath 'one', as INT 0/1),
    *   2 = matches (JsonMatches array of fragments, the NESTED PATH rows).
    * Field values are bit-identical to the per-column expression chain;
    * the batch replaces N interpreted parses of the same fragment per row
    * with one (guide §1.2 per-task work — JSON parse is the dominant
    * per-row cost of the operator). */
  case class JsonTableLevel(children: Seq[Expression],
      specs: Seq[(String, Int)]) extends JsonExpr {
    override def dataType: DataType = StructType(specs.map {
      case (name, 1) => StructField(name, IntegerType)
      case (name, 2) => StructField(name, ArrayType(StringType))
      case (name, _) => StructField(name, StringType)
    })
    /** Paths are foldable literals in every caller: parse each once per
      * (deserialized) instance instead of once per spec per row. None =
      * non-foldable child, fall back to per-row parsing. */
    @transient private lazy val cachedSteps: IndexedSeq[Option[Seq[Step]]] =
      children.drop(1).toIndexedSeq.map { e =>
        if (e.foldable) Some(parsePath(str(e.eval(null)))) else None
      }
    protected def evalNotNull(vs: Seq[Any]): Any = {
      val d = doc(vs(0))
      if (d == null) return null
      val fields = specs.zipWithIndex.map { case ((_, kind), i) =>
        val p = cachedSteps(i).getOrElse(parsePath(str(vs(i + 1))))
        kind match {
          case 1 => if (p != null && navigateAll(d, p).nonEmpty) 1 else 0
          case 2 =>
            if (p == null) null
            else new org.apache.spark.sql.catalyst.util.GenericArrayData(
              navigateAll(d, p).map(out).toArray[Any])
          case _ =>
            if (p == null) null
            else {
              val ms = navigateAll(d, p)
              if (ms.isEmpty) null
              else if (!hasWildcard(p)) {
                // single-path extract then unquote: textual node -> its text
                val n = ms.head
                if (n.isTextual) UTF8String.fromString(n.asText()) else out(n)
              } else {
                val arr = F.arrayNode()
                ms.foreach(arr.add)
                out(arr) // array text is never textual -> unquote is identity
              }
            }
        }
      }
      InternalRow.fromSeq(fields)
    }
    override protected def withNewChildrenInternal(n: IndexedSeq[Expression]) =
      copy(children = n)
  }

  /** JSON_TABLE column spec for [[JsonTableTree]]: kind 0 = extract+unquote,
    * 1 = exists (INT 0/1). Paths are constant strings (the plan builder
    * only ever emits literals), parsed once per operator instance. */
  case class JTreeCol(name: String, kind: Int, path: String)
  /** One JSON_TABLE level: the level's row-source path, its path-driven
    * columns, and the NESTED PATH sub-levels keyed by output field name. */
  case class JTreeLevel(path: String, cols: Seq[JTreeCol],
      nested: Seq[(String, JTreeLevel)])

  /** Whole-tree one-parse evaluation for JSON_TABLE (graft.plans.JsonTable):
    * parses the document ONCE per input row and evaluates the entire level
    * tree — root-path matches, every level's scalar/EXISTS columns and
    * every NESTED PATH's match tree — directly over the parsed Jackson
    * nodes, returning `array<struct<...>>` (one element per root match,
    * NESTED levels as nested array<struct> fields).
    *
    * Replaces the per-level JsonMatches + JsonTableLevel chain, which
    * re-serialized each match fragment and re-parsed it at the next level
    * (one parse per level per row; 6 fragment parses per event for the
    * nested two-level shape → 1 here). Field values are bit-identical:
    * fragment rendering still goes through the same Jackson `toString`,
    * so extract/unquote/EXISTS semantics and the empty-nested-array →
    * one all-NULL row behavior (via posexplode_outer) are unchanged. */
  case class JsonTableTree(children: Seq[Expression], spec: JTreeLevel)
      extends JsonExpr {
    private def levelType(l: JTreeLevel): ArrayType = ArrayType(StructType(
      l.cols.map {
        case JTreeCol(n, 1, _) => StructField(n, IntegerType)
        case JTreeCol(n, _, _) => StructField(n, StringType)
      } ++ l.nested.map { case (n, nl) => StructField(n, levelType(nl)) }))
    override def dataType: DataType = levelType(spec)

    /** Parsed-path mirror of the spec tree, built once per instance. */
    private case class PLevel(root: Seq[Step], cols: Seq[(Int, Seq[Step])],
        nested: Seq[PLevel])
    @transient private lazy val parsed: PLevel = parseLevel(spec)
    private def parseLevel(l: JTreeLevel): PLevel =
      PLevel(parsePath(l.path), l.cols.map(c => (c.kind, parsePath(c.path))),
        l.nested.map { case (_, nl) => parseLevel(nl) })

    protected def evalNotNull(vs: Seq[Any]): Any = {
      val d = doc(vs(0))
      if (d == null) return null
      evalLevel(d, parsed)
    }

    private def evalLevel(node: JsonNode, pl: PLevel): Any = {
      if (pl.root == null) return null // malformed path literal, like JsonMatches
      val matches = navigateAll(node, pl.root)
      new org.apache.spark.sql.catalyst.util.GenericArrayData(
        matches.map { m =>
          val fields = new Array[Any](pl.cols.length + pl.nested.length)
          var i = 0
          pl.cols.foreach { case (kind, p) =>
            fields(i) =
              if (kind == 1) { if (p != null && navigateAll(m, p).nonEmpty) 1 else 0 }
              else if (p == null) null
              else {
                val ms = navigateAll(m, p)
                if (ms.isEmpty) null
                else if (!hasWildcard(p)) {
                  // single-path extract then unquote: textual node -> its text
                  val n = ms.head
                  if (n.isTextual) UTF8String.fromString(n.asText()) else out(n)
                } else {
                  val arr = F.arrayNode()
                  ms.foreach(arr.add)
                  out(arr) // array text is never textual -> unquote is identity
                }
              }
            i += 1
          }
          pl.nested.foreach { nl => fields(i) = evalLevel(m, nl); i += 1 }
          new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(fields)
        }.toArray[Any])
    }
    override protected def withNewChildrenInternal(n: IndexedSeq[Expression]) =
      copy(children = n)
  }

  /** JSON_UNQUOTE(v) — strips quotes from a JSON string value. */
  case class JsonUnquote(child: Expression)
      extends UnaryExpression with CodegenFallback {
    override def dataType: DataType = StringType
    override def nullSafeEval(v: Any): Any = {
      val s = v.asInstanceOf[UTF8String].toString
      val n = tryParse(s)
      if (n != null && n.isTextual) UTF8String.fromString(n.asText())
      else UTF8String.fromString(s)
    }
    override protected def withNewChildInternal(c: Expression) = copy(c)
  }

  /** JSON_QUOTE(s) — wraps an SQL string as a JSON string literal. */
  case class JsonQuoteFn(child: Expression)
      extends UnaryExpression with CodegenFallback {
    override def dataType: DataType = StringType
    override def nullSafeEval(v: Any): Any =
      out(F.textNode(v.asInstanceOf[UTF8String].toString))
    override protected def withNewChildInternal(c: Expression) = copy(c)
  }

  /** mode: 0=set, 1=insert, 2=replace. Children: doc, path, value. */
  case class JsonMutate(children: Seq[Expression], mode: Int) extends JsonExpr {
    override def dataType: DataType = StringType
    protected def evalNotNull(vs: Seq[Any]): Any = {
      val d = doc(vs(0)); val p = parsePath(str(vs(1)))
      if (d == null || p == null || hasWildcard(p)) return null
      out(mutate(d, p, toNode(vs(2)),
        create = mode != 2, overwrite = mode != 1))
    }
    override protected def withNewChildrenInternal(n: IndexedSeq[Expression]) =
      copy(children = n)
  }

  /** JSON_REMOVE(doc, path). */
  case class JsonRemove(children: Seq[Expression]) extends JsonExpr {
    override def dataType: DataType = StringType
    protected def evalNotNull(vs: Seq[Any]): Any = {
      val d = doc(vs(0)); val p = parsePath(str(vs(1)))
      if (d == null || p == null || p.isEmpty || hasWildcard(p)) return null
      out(removeAt(d, p))
    }
    override protected def withNewChildrenInternal(n: IndexedSeq[Expression]) = copy(n)
  }

  /** JSON_ARRAY(v, ...) — array from SQL scalars (reference
    * json_array in registry.go). NULL arguments become JSON null. */
  case class JsonArrayFn(children: Seq[Expression]) extends JsonExpr {
    override def dataType: DataType = StringType
    override def eval(input: InternalRow): Any = {
      val arr = F.arrayNode()
      children.foreach(c => arr.add(toNode(c.eval(input))))
      out(arr)
    }
    protected def evalNotNull(vs: Seq[Any]): Any = null // unused: eval overridden
    override protected def withNewChildrenInternal(n: IndexedSeq[Expression]) = copy(n)
  }

  /** JSON_OBJECT(k1, v1, k2, v2, ...) — object from key/value pairs;
    * NULL keys error in MySQL (here: SQL NULL). */
  case class JsonObjectFn(children: Seq[Expression]) extends JsonExpr {
    override def dataType: DataType = StringType
    override def eval(input: InternalRow): Any = {
      if (children.length % 2 != 0) return null
      val o = F.objectNode()
      children.grouped(2).foreach { case Seq(k, v) =>
        val kv = k.eval(input)
        if (kv == null) return null
        // MySQL coerces the key to its string FORM per source type:
        // booleans are '1'/'0', temporals their display text, JSON
        // documents their spaced JSON rendering (json_queries.go
        // JSON_OBJECT(DATE(...)/JSON_OBJECT(...)/true blocks)
        val key = (k.dataType, kv) match {
          case (BooleanType, b: Boolean) => if (b) "1" else "0"
          case (DateType, d: Int) =>
            java.time.LocalDate.ofEpochDay(d.toLong).toString
          case (TimestampType | TimestampNTZType, m: Long) =>
            java.time.LocalDateTime.ofEpochSecond(
              Math.floorDiv(m, 1000000L), 0, java.time.ZoneOffset.UTC)
              .toString.replace('T', ' ')
          case _ if k.isInstanceOf[JsonExpr] =>
            val d = tryParse(kv.toString)
            if (d == null) kv.toString else mysqlJsonText(d)
          case _ => kv.toString
        }
        o.set[JsonNode](key, toNode(v.eval(input)))
      }
      out(o)
    }
    protected def evalNotNull(vs: Seq[Any]): Any = null // unused: eval overridden
    override protected def withNewChildrenInternal(n: IndexedSeq[Expression]) = copy(n)
  }

  /** JSON_VALUE(doc, path[, RETURNING type]) — extract + unquote (MySQL
    * default RETURNING CHAR; typed RETURNING casts apply at
    * registration). `asJson`: RETURNING JSON keeps the raw JSON text
    * (quoted strings, subtrees) instead of unquoting. */
  case class JsonValueFn(children: Seq[Expression], asJson: Boolean = false)
      extends JsonExpr {
    override def dataType: DataType = StringType
    protected def evalNotNull(vs: Seq[Any]): Any = {
      val d = doc(vs(0)); val p = parsePath(str(vs(1)))
      if (d == null || p == null) return null
      navigateAll(d, p) match {
        case Seq(one) =>
          UTF8String.fromString(
            if (!asJson && one.isTextual) one.asText() else one.toString)
        case _ => null // zero or many matches -> NULL (MySQL default ON EMPTY)
      }
    }
    override protected def withNewChildrenInternal(n: IndexedSeq[Expression]) =
      copy(children = n)
  }

  /** JSON_ARRAY_APPEND / JSON_ARRAY_INSERT (mode 0 = append to the array
    * at path, autowrapping scalars; mode 1 = insert at the path's [N]). */
  case class JsonArrayMutate(children: Seq[Expression], insert: Boolean)
      extends JsonExpr {
    override def dataType: DataType = StringType
    protected def evalNotNull(vs: Seq[Any]): Any = {
      val d = doc(vs(0)); val p = parsePath(str(vs(1)))
      if (d == null || p == null || hasWildcard(p)) return null
      val value = toNode(vs(2))
      val copy = d.deepCopy[JsonNode]()
      if (!insert) {
        // append: target = node at path; arrays append, scalars autowrap
        if (p.isEmpty) {
          if (copy.isArray) { copy.asInstanceOf[ArrayNode].add(value); return out(copy) }
          val w = F.arrayNode(); w.add(copy); w.add(value); return out(w)
        }
        val parent = navigate(copy, p.init)
        if (parent == null) return out(copy)
        (p.last, parent) match {
          case (Key(k), o: ObjectNode) if o.has(k) =>
            o.get(k) match {
              case a: ArrayNode => a.add(value)
              case other =>
                val w = F.arrayNode(); w.add(other); w.add(value)
                o.set[JsonNode](k, w)
            }
          case (Idx(i), a: ArrayNode) if i < a.size =>
            a.get(i) match {
              case inner: ArrayNode => inner.add(value)
              case other =>
                val w = F.arrayNode(); w.add(other); w.add(value)
                a.set(i, w)
            }
          case _ => ()
        }
        out(copy)
      } else {
        // insert: path must end in [N]; shifts elements right
        p.last match {
          case Idx(i) =>
            val parent = navigate(copy, p.init)
            parent match {
              case a: ArrayNode =>
                if (i >= a.size) a.add(value) else a.insert(i, value)
                out(copy)
              case _ => out(copy)
            }
          case _ => null // MySQL errors unless the path ends in an index
        }
      }
    }
    override protected def withNewChildrenInternal(n: IndexedSeq[Expression]) =
      copy(children = n)
  }

  /** JSON_MERGE_PATCH(doc, doc). */
  case class JsonMergePatch(children: Seq[Expression]) extends JsonExpr {
    override def dataType: DataType = StringType
    protected def evalNotNull(vs: Seq[Any]): Any = {
      val a = doc(vs(0)); val b = doc(vs(1))
      if (a == null || b == null) null else out(mergePatch(a, b))
    }
    override protected def withNewChildrenInternal(n: IndexedSeq[Expression]) = copy(n)
  }

  /** JSON_MERGE_PRESERVE(doc, doc). */
  case class JsonMergePreserve(children: Seq[Expression]) extends JsonExpr {
    override def dataType: DataType = StringType
    protected def evalNotNull(vs: Seq[Any]): Any = {
      val a = doc(vs(0)); val b = doc(vs(1))
      if (a == null || b == null) null else out(mergePreserve(a, b))
    }
    override protected def withNewChildrenInternal(n: IndexedSeq[Expression]) = copy(n)
  }

  /** JSON_KEYS(doc) — JSON array of top-level object keys. */
  case class JsonKeys(children: Seq[Expression]) extends JsonExpr {
    override def dataType: DataType = StringType
    protected def evalNotNull(vs: Seq[Any]): Any = {
      val d = doc(vs(0))
      if (d == null || !d.isObject) return null
      val a = F.arrayNode()
      d.fieldNames().asScala.foreach(k => a.add(F.textNode(k)))
      out(a)
    }
    override protected def withNewChildrenInternal(n: IndexedSeq[Expression]) = copy(n)
  }

  /** JSON_LENGTH(doc[, path]): scalars 1, arrays size, objects #keys;
    * the optional path measures the sub-document it selects
    * (json_scripts.go:312 `json_length(y, "$.a.b")`). */
  case class JsonLengthMySql(children: Seq[Expression]) extends JsonExpr {
    override def dataType: DataType = IntegerType
    protected def evalNotNull(vs: Seq[Any]): Any = {
      val d0 = doc(vs(0))
      if (d0 == null) return null
      val d =
        if (vs.length < 2) d0
        else {
          val p = parsePath(str(vs(1)))
          if (p == null) return null
          navigateAll(d0, p) match {
            case Seq(one) => one
            case _ => return null
          }
        }
      if (d.isContainerNode) d.size() else 1
    }
    override protected def withNewChildrenInternal(n: IndexedSeq[Expression]) = copy(n)
  }

  /** JSON_DEPTH(doc). */
  case class JsonDepth(children: Seq[Expression]) extends JsonExpr {
    override def dataType: DataType = IntegerType
    protected def evalNotNull(vs: Seq[Any]): Any = {
      val d = doc(vs(0)); if (d == null) null else depthOf(d)
    }
    override protected def withNewChildrenInternal(n: IndexedSeq[Expression]) = copy(n)
  }

  /** JSON_TYPE(doc) — MySQL type-name string. */
  case class JsonTypeOf(children: Seq[Expression]) extends JsonExpr {
    override def dataType: DataType = StringType
    // a NULL input reports the type string "NULL", not SQL NULL
    // (queries.go json_type(json_extract(..., null)) rows)
    override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
      val v = children.head.eval(input)
      if (v == null) return UTF8String.fromString("NULL")
      evalNotNull(Seq(v))
    }
    protected def evalNotNull(vs: Seq[Any]): Any = {
      val d = doc(vs(0))
      if (d == null) null else UTF8String.fromString(typeName(d))
    }
    override protected def withNewChildrenInternal(n: IndexedSeq[Expression]) = copy(n)
  }

  /** JSON_VALID(s). */
  case class JsonValid(child: Expression)
      extends UnaryExpression with CodegenFallback {
    override def dataType: DataType = BooleanType
    override def nullSafeEval(v: Any): Any =
      tryParse(v.asInstanceOf[UTF8String].toString) != null
    override protected def withNewChildInternal(c: Expression) = copy(c)
  }

  // ---- JSON Schema validation ----------------------------------------
  // JSON_SCHEMA_VALID / JSON_SCHEMA_VALIDATION_REPORT (MySQL 8.0.17
  // json-validation functions; draft-4 keyword subset). The reference
  // registers these names but stubs them unsupported
  // (sql/expression/function/json/json_unsupported.go:76,108) — here they
  // are implemented: type, enum, properties, patternProperties,
  // additionalProperties, required, items, min/maxItems, uniqueItems,
  // min/maxLength, pattern, minimum/maximum (draft-4 boolean exclusives
  // AND draft-6 numeric forms), multipleOf, allOf/anyOf/oneOf/not.

  private case class SchemaFailure(keyword: String, schemaLoc: String,
                                   docLoc: String)

  /** First failure of `doc` against `schema`, or None when valid. */
  private def schemaCheck(schema: JsonNode, doc: JsonNode,
                          sLoc: String, dLoc: String): Option[SchemaFailure] = {
    if (!schema.isObject) return None // a non-object schema accepts all
    def fail(kw: String) = Some(SchemaFailure(kw, sLoc, dLoc))
    def jsType(n: JsonNode): String =
      if (n.isObject) "object" else if (n.isArray) "array"
      else if (n.isTextual) "string" else if (n.isBoolean) "boolean"
      else if (n.isNull) "null"
      else if (n.isIntegralNumber) "integer" else "number"

    // type: string or array of strings ("number" admits integers)
    val t = schema.get("type")
    if (t != null) {
      val wanted =
        if (t.isArray) t.asScala.map(_.asText).toSeq else Seq(t.asText)
      val actual = jsType(doc)
      val okType = wanted.exists(w => w == actual ||
        (w == "number" && actual == "integer"))
      if (!okType) return fail("type")
    }
    val en = schema.get("enum")
    if (en != null && en.isArray &&
        !en.asScala.exists(_ == doc)) return fail("enum")

    if (doc.isNumber) {
      val v = doc.decimalValue()
      def num(k: String) = Option(schema.get(k)).filter(_.isNumber)
      def excl(k: String) =
        Option(schema.get(k)).exists(e => e.isBoolean && e.asBoolean)
      num("minimum").foreach { m =>
        val cmp = v.compareTo(m.decimalValue())
        if (cmp < 0 || (cmp == 0 && excl("exclusiveMinimum")))
          return fail("minimum")
      }
      num("maximum").foreach { m =>
        val cmp = v.compareTo(m.decimalValue())
        if (cmp > 0 || (cmp == 0 && excl("exclusiveMaximum")))
          return fail("maximum")
      }
      // draft-6 numeric exclusives also accepted
      num("exclusiveMinimum").foreach(m =>
        if (v.compareTo(m.decimalValue()) <= 0) return fail("exclusiveMinimum"))
      num("exclusiveMaximum").foreach(m =>
        if (v.compareTo(m.decimalValue()) >= 0) return fail("exclusiveMaximum"))
      num("multipleOf").foreach { m =>
        if (v.remainder(m.decimalValue()).compareTo(java.math.BigDecimal.ZERO) != 0)
          return fail("multipleOf")
      }
    }

    if (doc.isTextual) {
      val len = doc.asText.codePointCount(0, doc.asText.length)
      Option(schema.get("minLength")).foreach(m =>
        if (len < m.asInt) return fail("minLength"))
      Option(schema.get("maxLength")).foreach(m =>
        if (len > m.asInt) return fail("maxLength"))
      Option(schema.get("pattern")).foreach(p =>
        if (!java.util.regex.Pattern.compile(p.asText).matcher(doc.asText).find())
          return fail("pattern"))
    }

    if (doc.isArray) {
      val n = doc.size
      Option(schema.get("minItems")).foreach(m =>
        if (n < m.asInt) return fail("minItems"))
      Option(schema.get("maxItems")).foreach(m =>
        if (n > m.asInt) return fail("maxItems"))
      if (Option(schema.get("uniqueItems")).exists(_.asBoolean) &&
          doc.asScala.toSeq.distinct.size != n) return fail("uniqueItems")
      Option(schema.get("items")).foreach { items =>
        if (items.isObject)
          doc.asScala.zipWithIndex.foreach { case (el, i) =>
            val r = schemaCheck(items, el, s"$sLoc/items", s"$dLoc/$i")
            if (r.isDefined) return r
          }
        else if (items.isArray)
          items.asScala.zipWithIndex.foreach { case (sub, i) =>
            if (i < n) {
              val r = schemaCheck(sub, doc.get(i), s"$sLoc/items/$i", s"$dLoc/$i")
              if (r.isDefined) return r
            }
          }
      }
    }

    if (doc.isObject) {
      Option(schema.get("required")).filter(_.isArray).foreach(req =>
        req.asScala.foreach(k =>
          if (!doc.has(k.asText)) return fail("required")))
      Option(schema.get("minProperties")).foreach(m =>
        if (doc.size < m.asInt) return fail("minProperties"))
      Option(schema.get("maxProperties")).foreach(m =>
        if (doc.size > m.asInt) return fail("maxProperties"))
      val props = Option(schema.get("properties")).filter(_.isObject)
      val patProps = Option(schema.get("patternProperties")).filter(_.isObject)
      doc.properties().asScala.foreach { e =>
        val (k, v) = (e.getKey, e.getValue)
        var matched = false
        props.foreach { p =>
          if (p.has(k)) {
            matched = true
            val r = schemaCheck(p.get(k), v, s"$sLoc/properties/$k", s"$dLoc/$k")
            if (r.isDefined) return r
          }
        }
        patProps.foreach(pp => pp.properties().asScala.foreach { pe =>
          if (java.util.regex.Pattern.compile(pe.getKey).matcher(k).find()) {
            matched = true
            val r = schemaCheck(pe.getValue, v,
              s"$sLoc/patternProperties/${pe.getKey}", s"$dLoc/$k")
            if (r.isDefined) return r
          }
        })
        if (!matched) Option(schema.get("additionalProperties")).foreach { ap =>
          if (ap.isBoolean && !ap.asBoolean) return fail("additionalProperties")
          if (ap.isObject) {
            val r = schemaCheck(ap, v, s"$sLoc/additionalProperties", s"$dLoc/$k")
            if (r.isDefined) return r
          }
        }
      }
    }

    Option(schema.get("allOf")).filter(_.isArray).foreach(_.asScala.zipWithIndex
      .foreach { case (sub, i) =>
        val r = schemaCheck(sub, doc, s"$sLoc/allOf/$i", dLoc)
        if (r.isDefined) return r
      })
    Option(schema.get("anyOf")).filter(_.isArray).foreach { subs =>
      if (!subs.asScala.zipWithIndex.exists { case (sub, i) =>
            schemaCheck(sub, doc, s"$sLoc/anyOf/$i", dLoc).isEmpty })
        return fail("anyOf")
    }
    Option(schema.get("oneOf")).filter(_.isArray).foreach { subs =>
      val hits = subs.asScala.zipWithIndex.count { case (sub, i) =>
        schemaCheck(sub, doc, s"$sLoc/oneOf/$i", dLoc).isEmpty }
      if (hits != 1) return fail("oneOf")
    }
    Option(schema.get("not")).foreach(sub =>
      if (schemaCheck(sub, doc, s"$sLoc/not", dLoc).isEmpty) return fail("not"))
    None
  }

  private def runSchemaCheck(vs: Seq[Any]): Either[String, Option[SchemaFailure]] = {
    def s(v: Any): String = v.asInstanceOf[UTF8String].toString
    val schema = tryParse(s(vs(0)))
    val d = tryParse(s(vs(1)))
    if (schema == null || !schema.isObject)
      Left("Invalid JSON Schema: the schema must be a valid JSON object")
    else if (d == null) Left("Invalid JSON document")
    else Right(schemaCheck(schema, d, "#", "#"))
  }

  /** JSON_SCHEMA_VALID(schema, document) -> boolean. */
  case class JsonSchemaValid(children: Seq[Expression]) extends JsonExpr {
    override def dataType: DataType = BooleanType
    protected def evalNotNull(vs: Seq[Any]): Any = runSchemaCheck(vs) match {
      case Left(msg) => throw new IllegalArgumentException(msg)
      case Right(r) => r.isEmpty
    }
    override protected def withNewChildrenInternal(n: IndexedSeq[Expression]) = copy(n)
  }

  /** JSON_SCHEMA_VALIDATION_REPORT(schema, document) -> report object
    * ({"valid":true} or valid/reason/schema-location/document-location/
    * schema-failed-keyword, MySQL's report shape). */
  case class JsonSchemaValidationReport(children: Seq[Expression]) extends JsonExpr {
    override def dataType: DataType = StringType
    protected def evalNotNull(vs: Seq[Any]): Any = runSchemaCheck(vs) match {
      case Left(msg) => throw new IllegalArgumentException(msg)
      case Right(None) =>
        val o = F.objectNode(); o.put("valid", true); out(o)
      case Right(Some(f)) =>
        val o = F.objectNode()
        o.put("valid", false)
        o.put("reason",
          s"The JSON document location '${f.docLoc}' failed requirement " +
          s"'${f.keyword}' at JSON Schema location '${f.schemaLoc}'")
        o.put("schema-location", f.schemaLoc)
        o.put("document-location", f.docLoc)
        o.put("schema-failed-keyword", f.keyword)
        out(o)
    }
    override protected def withNewChildrenInternal(n: IndexedSeq[Expression]) = copy(n)
  }

  /** JSON_CONTAINS(target, candidate) — MySQL containment. */
  case class JsonContainsMySql(children: Seq[Expression]) extends JsonExpr {
    override def dataType: DataType = BooleanType
    protected def evalNotNull(vs: Seq[Any]): Any = {
      val t0 = doc(vs(0)); val c = doc(vs(1))
      if (t0 == null || c == null) return null
      // 3-arg form tests containment AT the path (reference
      // function/json_contains.go); no match at the path -> NULL
      val t =
        if (vs.length < 3) t0
        else {
          val p = parsePath(str(vs(2)))
          if (p == null) return null
          navigateAll(t0, p) match {
            case Seq(one) => one
            case _ => return null
          }
        }
      contains(t, c)
    }
    override protected def withNewChildrenInternal(n: IndexedSeq[Expression]) = copy(n)
  }

  /** JSON_CONTAINS_PATH(doc, one_or_all, path, ...). */
  case class JsonContainsPath(children: Seq[Expression]) extends JsonExpr {
    override def dataType: DataType = BooleanType
    protected def evalNotNull(vs: Seq[Any]): Any = {
      val d = doc(vs(0))
      if (d == null) return null
      val mode = str(vs(1))
      // MySQL rejects any one_or_all argument besides 'one'/'all'
      // (json_scripts.go "json_contains_path": 'other' errors)
      if (!mode.equalsIgnoreCase("all") && !mode.equalsIgnoreCase("one"))
        throw new IllegalArgumentException(
          s"The oneOrAll argument to json_contains_path may take these " +
          s"values: 'one' or 'all' (got '$mode')")
      val all = mode.equalsIgnoreCase("all")
      val hits = vs.drop(2).map { pv =>
        val p = parsePath(str(pv)); p != null && navigateAll(d, p).nonEmpty
      }
      if (all) hits.forall(identity) else hits.exists(identity)
    }
    override protected def withNewChildrenInternal(n: IndexedSeq[Expression]) = copy(n)
  }

  /** JSON_SEARCH(doc, 'one', pattern) — path of first matching string. */
  case class JsonSearch(children: Seq[Expression]) extends JsonExpr {
    override def dataType: DataType = StringType
    protected def evalNotNull(vs: Seq[Any]): Any = {
      val d = doc(vs(0))
      if (d == null) return null
      val mode = str(vs(1)).toLowerCase
      if (mode != "one" && mode != "all")
        throw new IllegalArgumentException(
          "The oneOrAll argument to json_search may take these values: " +
          "'one' or 'all' (MySQL ErrInvalidJsonOneOrAll)")
      val rx = likeToRegex(str(vs(2)))
      val acc = scala.collection.mutable.LinkedHashSet.empty[String]
      // args 5+: restrict the search to the given path subtrees, path
      // text prefixes the reported match (script_queries.go "test json
      // search": json_search(j,'all','abc','','$.a','$.b') never
      // reports $.c)
      if (vs.length <= 4) searchAll(d, "$", rx, acc, mode == "one")
      else vs.drop(4).foreach { pv =>
        val ptxt = str(pv).trim
        val p = parsePath(ptxt)
        if (p != null)
          navigateAll(d, p).foreach(n =>
            searchAll(n, ptxt, rx, acc, mode == "one"))
      }
      if (acc.isEmpty) null
      else if (acc.size == 1 || mode == "one")
        UTF8String.fromString(acc.head)
      else UTF8String.fromString(acc.mkString("[", ", ", "]"))
    }
    override protected def withNewChildrenInternal(n: IndexedSeq[Expression]) = copy(n)
  }

  /** JSON_OVERLAPS(a, b): true if the docs share any array element, any
    * key-value pair (objects), or are equal scalars (MySQL 8.0.17+). */
  case class JsonOverlaps(children: Seq[Expression]) extends JsonExpr {
    override def dataType: DataType = BooleanType
    protected def evalNotNull(vs: Seq[Any]): Any = {
      val a = doc(vs(0)); val b = doc(vs(1))
      if (a == null || b == null) return null
      (a, b) match {
        case (x: ArrayNode, y: ArrayNode) =>
          x.elements().asScala.exists(e => y.elements().asScala.exists(_ == e))
        case (x: ArrayNode, y) => x.elements().asScala.contains(y)
        case (x, y: ArrayNode) => y.elements().asScala.contains(x)
        case (x: ObjectNode, y: ObjectNode) =>
          x.properties().asScala.exists(e =>
            y.has(e.getKey) && y.get(e.getKey) == e.getValue)
        case (x, y) => x == y
      }
    }
    override protected def withNewChildrenInternal(n: IndexedSeq[Expression]) = copy(n)
  }

  /** JSON_PRETTY(doc) — MySQL 2-space-indent rendering. */
  case class JsonPretty(children: Seq[Expression]) extends JsonExpr {
    override def dataType: DataType = StringType
    protected def evalNotNull(vs: Seq[Any]): Any = {
      val d = doc(vs(0))
      if (d == null) return null
      val b = new StringBuilder
      def render(n: JsonNode, indent: Int): Unit = {
        val pad = "  " * (indent + 1); val end = "  " * indent
        if (n.isObject && n.size() > 0) {
          b.append("{\n")
          val es = n.properties().asScala.toSeq
          es.zipWithIndex.foreach { case (e, i) =>
            b.append(pad).append(out(F.textNode(e.getKey))).append(": ")
            render(e.getValue, indent + 1)
            if (i < es.size - 1) b.append(",")
            b.append("\n")
          }
          b.append(end).append("}")
        } else if (n.isArray && n.size() > 0) {
          b.append("[\n")
          val es = n.elements().asScala.toSeq
          es.zipWithIndex.foreach { case (e, i) =>
            b.append(pad); render(e, indent + 1)
            if (i < es.size - 1) b.append(",")
            b.append("\n")
          }
          b.append(end).append("]")
        } else b.append(n.toString)
      }
      render(d, 0)
      UTF8String.fromString(b.result())
    }
    override protected def withNewChildrenInternal(n: IndexedSeq[Expression]) = copy(n)
  }

  // ---- Column wrappers ------------------------------------------------

  import org.apache.spark.sql.GraftBridge
  private def c(e: Expression): Column = GraftBridge.column(e)
  private def x(col: Column): Expression = GraftBridge.expression(col)

  def jsonExtract(d: Column, paths: Column*): Column =
    c(JsonExtractMySql((d +: paths).map(x)))
  def jsonMatches(d: Column, p: Column): Column = c(JsonMatches(Seq(d, p).map(x)))
  def jsonArray(vs: Column*): Column = c(JsonArrayFn(vs.map(x)))
  def jsonObject(kvs: Column*): Column = c(JsonObjectFn(kvs.map(x)))
  def jsonValue(d: Column, p: Column): Column = c(JsonValueFn(Seq(d, p).map(x)))
  def jsonArrayAppend(d: Column, p: Column, v: Column): Column =
    c(JsonArrayMutate(Seq(d, p, v).map(x), insert = false))
  def jsonArrayInsert(d: Column, p: Column, v: Column): Column =
    c(JsonArrayMutate(Seq(d, p, v).map(x), insert = true))
  def jsonUnquote(v: Column): Column = c(JsonUnquote(x(v)))
  /** one-parse JSON_TABLE level batch: specs = (field, kind, path) */
  def jsonTableLevel(d: Column, specs: Seq[(String, Int, String)]): Column =
    c(JsonTableLevel(
      x(d) +: specs.map(s => x(org.apache.spark.sql.functions.lit(s._3))),
      specs.map(s => (s._1, s._2))))
  /** one-parse whole-tree JSON_TABLE evaluation (plans.JsonTable) */
  def jsonTableTree(d: Column, spec: JTreeLevel): Column =
    c(JsonTableTree(Seq(x(d)), spec))
  def jsonQuote(s: Column): Column = c(JsonQuoteFn(x(s)))
  def jsonSet(d: Column, p: Column, v: Column): Column =
    c(JsonMutate(Seq(d, p, v).map(x), 0))
  def jsonInsert(d: Column, p: Column, v: Column): Column =
    c(JsonMutate(Seq(d, p, v).map(x), 1))
  def jsonReplace(d: Column, p: Column, v: Column): Column =
    c(JsonMutate(Seq(d, p, v).map(x), 2))
  def jsonRemove(d: Column, p: Column): Column = c(JsonRemove(Seq(d, p).map(x)))
  def jsonMergePatch(a: Column, b: Column): Column = c(JsonMergePatch(Seq(a, b).map(x)))
  def jsonMergePreserve(a: Column, b: Column): Column =
    c(JsonMergePreserve(Seq(a, b).map(x)))
  def jsonKeys(d: Column): Column = c(JsonKeys(Seq(x(d))))
  def jsonLength(d: Column): Column = c(JsonLengthMySql(Seq(x(d))))
  def jsonDepth(d: Column): Column = c(JsonDepth(Seq(x(d))))
  def jsonType(d: Column): Column = c(JsonTypeOf(Seq(x(d))))
  def jsonValid(s: Column): Column = c(JsonValid(x(s)))
  def jsonContains(t: Column, cand: Column): Column =
    c(JsonContainsMySql(Seq(t, cand).map(x)))
  def jsonContainsPath(d: Column, mode: Column, paths: Column*): Column =
    c(JsonContainsPath((Seq(d, mode) ++ paths).map(x)))
  def jsonSearch(d: Column, mode: Column, pat: Column): Column =
    c(JsonSearch(Seq(d, mode, pat).map(x)))
  def jsonPretty(d: Column): Column = c(JsonPretty(Seq(x(d))))
  def jsonOverlaps(a: Column, b: Column): Column =
    c(JsonOverlaps(Seq(a, b).map(x)))
  def jsonSchemaValid(schema: Column, d: Column): Column =
    c(JsonSchemaValid(Seq(schema, d).map(x)))
  def jsonSchemaValidationReport(schema: Column, d: Column): Column =
    c(JsonSchemaValidationReport(Seq(schema, d).map(x)))

  /** SQL registration (FunctionProvider analog, mirrors registry.go names). */
  def register(spark: SparkSession): Unit = {
    val reg = GraftBridge.functionRegistry(spark)
    reg.createOrReplaceTempFunction("json_extract_mysql", es => JsonExtractMySql(es), "scala_udf")
    // plain MySQL names (Spark has no builtins with these names)
    reg.createOrReplaceTempFunction("json_extract", es => JsonExtractMySql(es), "scala_udf")
    reg.createOrReplaceTempFunction("json_length", es => JsonLengthMySql(es), "scala_udf")
    reg.createOrReplaceTempFunction("json_unquote", es => JsonUnquote(es.head), "scala_udf")
    reg.createOrReplaceTempFunction("json_quote", es => JsonQuoteFn(es.head), "scala_udf")
    reg.createOrReplaceTempFunction("json_set", es => JsonMutate(es, 0), "scala_udf")
    reg.createOrReplaceTempFunction("json_insert", es => JsonMutate(es, 1), "scala_udf")
    reg.createOrReplaceTempFunction("json_replace", es => JsonMutate(es, 2), "scala_udf")
    reg.createOrReplaceTempFunction("json_remove", es => JsonRemove(es), "scala_udf")
    reg.createOrReplaceTempFunction("json_merge_patch", es => JsonMergePatch(es), "scala_udf")
    reg.createOrReplaceTempFunction("json_array", es => JsonArrayFn(es), "scala_udf")
    reg.createOrReplaceTempFunction("json_object", es => JsonObjectFn(es), "scala_udf")
    reg.createOrReplaceTempFunction("json_value", es => {
      // 3-arg form carries the RETURNING type (json_scripts.go:274:
      // 'signed' -> BIGINT, 'json' -> raw JSON text)
      import org.apache.spark.sql.catalyst.expressions.{Cast, Literal}
      import org.apache.spark.unsafe.types.UTF8String
      val ret = es.lift(2).collect {
        case Literal(s: UTF8String, _) => s.toString.toLowerCase
      }
      val base = JsonValueFn(es.take(2), asJson = ret.contains("json"))
      ret match {
        case Some("signed") => Cast(base, org.apache.spark.sql.types.LongType)
        case Some("unsigned") =>
          Cast(base, org.apache.spark.sql.types.DecimalType(20, 0))
        case Some("double") | Some("float") =>
          Cast(base, org.apache.spark.sql.types.DoubleType)
        case Some(t) if t.startsWith("decimal") =>
          val args = """\((\d+)\s*,?\s*(\d*)\)""".r.findFirstMatchIn(t)
          val p = args.map(_.group(1).toInt).getOrElse(10)
          val sc = args.flatMap(m => Option(m.group(2)).filter(_.nonEmpty))
            .map(_.toInt).getOrElse(0)
          Cast(base, org.apache.spark.sql.types.DecimalType(p, sc))
        case _ => base
      }
    }, "scala_udf")
    reg.createOrReplaceTempFunction("json_array_append",
      es => JsonArrayMutate(es, insert = false), "scala_udf")
    reg.createOrReplaceTempFunction("json_array_insert",
      es => JsonArrayMutate(es, insert = true), "scala_udf")
    reg.createOrReplaceTempFunction("json_merge", es => JsonMergePreserve(es), "scala_udf")
    reg.createOrReplaceTempFunction("json_merge_preserve", es => JsonMergePreserve(es), "scala_udf")
    reg.createOrReplaceTempFunction("json_keys", es => JsonKeys(es), "scala_udf")
    reg.createOrReplaceTempFunction("json_length_mysql", es => JsonLengthMySql(es), "scala_udf")
    reg.createOrReplaceTempFunction("json_depth", es => JsonDepth(es), "scala_udf")
    reg.createOrReplaceTempFunction("json_type", es => {
      // CAST(x AS JSON) renders to text here, erasing the SOURCE type the
      // reference's json_type reports — recover it statically from the
      // cast chain (decimal -> DECIMAL, date/datetime -> DATE/DATETIME,
      // the unsigned marker DECIMAL(20,0) -> UNSIGNED INTEGER)
      import org.apache.spark.sql.catalyst.expressions.{Cast, Literal}
      import org.apache.spark.sql.types._
      import org.apache.spark.unsafe.types.UTF8String
      val static = es.headOption.map {
        case jc: JsonCanon => jc.child // CAST(x AS JSON) wrapper
        case o => o
      }.collect {
        case c: Cast if c.dataType.isInstanceOf[StringType] =>
          scala.util.Try(c.child.dataType).toOption.collect {
            case DecimalType() if c.child.dataType == DecimalType(20, 0) =>
              "UNSIGNED INTEGER"
            case _: DecimalType => "DECIMAL"
            case DateType => "DATE"
            case TimestampType | TimestampNTZType => "DATETIME"
          }
      }.flatten
      static match {
        case Some(t) => Literal(UTF8String.fromString(t), StringType)
        case None => JsonTypeOf(es)
      }
    }, "scala_udf")
    reg.createOrReplaceTempFunction("json_valid", es => JsonValid(es.head), "scala_udf")
    // CAST(x AS JSON) compiles to json_canon (Dialect jsonYearCasts):
    // canonical document text, and a JSON-typed marker for comparisons
    reg.createOrReplaceTempFunction("json_canon", es => JsonCanon(es.head), "scala_udf")
    reg.createOrReplaceTempFunction("mysql_year",
      es => graft.functions.expressions.MySqlYearCast(es.head), "scala_udf")
    reg.createOrReplaceTempFunction("json_contains", es => JsonContainsMySql(es), "scala_udf")
    reg.createOrReplaceTempFunction("json_contains_path", es => JsonContainsPath(es), "scala_udf")
    reg.createOrReplaceTempFunction("json_search", es => JsonSearch(es), "scala_udf")
    reg.createOrReplaceTempFunction("json_pretty", es => JsonPretty(es), "scala_udf")
    reg.createOrReplaceTempFunction("json_overlaps", es => JsonOverlaps(es), "scala_udf")
    reg.createOrReplaceTempFunction("json_schema_valid",
      es => JsonSchemaValid(es), "scala_udf")
    reg.createOrReplaceTempFunction("json_schema_validation_report",
      es => JsonSchemaValidationReport(es), "scala_udf")
    // path-match array (JSON_TABLE's row source; plans/JsonTableSql)
    reg.createOrReplaceTempFunction("json_matches",
      es => JsonMatches(es), "scala_udf")
  }
}
