package graft

/** Minimal reader for the reference's enginetest ScriptTest literals.
  *
  * Parses `var X = []ScriptTest{...}` blocks straight from the Go source
  * AT TEST TIME — queries and expected rows are consumed as data, never
  * copied into this repo. Handles the subset the corpora actually use:
  * double-quoted + backtick strings, line comments, nil, ints, floats,
  * int64/uint64/float64/int32 wrappers, []byte("..."), and OkResult
  * markers (write statements execute without row comparison).
  */
object GoCorpus {

  /** A single Query/Expected assertion. `expected` is None for write
    * results (OkResult/UpdateResult) — execute-only. */
  final case class Assert(query: String, expected: Option[Seq[Seq[Any]]],
                          skip: Boolean, expectErr: Boolean)

  final case class Script(name: String, setup: Seq[String],
                          asserts: Seq[Assert])

  private final class Cursor(val s: String, var i: Int) {
    def eof: Boolean = i >= s.length
    def ch: Char = s.charAt(i)
    def skipWsAndComments(): Unit = {
      var go = true
      while (go && !eof) {
        if (ch.isWhitespace) i += 1
        else if (ch == '/' && i + 1 < s.length && s.charAt(i + 1) == '/') {
          while (!eof && ch != '\n') i += 1
        } else go = false
      }
    }
    /** Reads a Go string literal (double-quoted or backtick) at the
      * cursor and returns its unescaped value. */
    def readString(): String = {
      skipWsAndComments()
      val q = ch
      require(q == '"' || q == '`', s"expected string at $i, got '$q'")
      i += 1
      val sb = new StringBuilder
      if (q == '`') {
        while (ch != '`') { sb.append(ch); i += 1 }
        i += 1
      } else {
        while (ch != '"') {
          if (ch == '\\') {
            i += 1
            sb.append(ch match {
              case 'n' => '\n'; case 't' => '\t'; case 'r' => '\r'
              case '\\' => '\\'; case '"' => '"'; case '\'' => '\''
              case o => o
            })
          } else sb.append(ch)
          i += 1
        }
        i += 1
      }
      sb.toString
    }
    /** Reads one balanced {...} group starting at '{'; returns the inner
      * text (quotes/comments respected). */
    def readBraceGroup(): String = {
      skipWsAndComments()
      require(ch == '{', s"expected '{' at $i, got '$ch'")
      val start = i + 1
      var depth = 0
      while (true) {
        if (ch == '"' || ch == '`') { readString(); }
        else if (ch == '/' && i + 1 < s.length && s.charAt(i + 1) == '/') {
          while (!eof && ch != '\n') i += 1
        } else {
          if (ch == '{') depth += 1
          else if (ch == '}') {
            depth -= 1
            if (depth == 0) { i += 1; return s.substring(start, i - 1) }
          }
          i += 1
        }
      }
      "" // unreachable
    }
  }

  /** Splits `body` on top-level commas (brace/paren/bracket + string
    * aware). */
  private def splitTopLevel(body: String): Seq[String] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    val cur = new StringBuilder
    var depth = 0; var i = 0
    while (i < body.length) {
      val c = body.charAt(i)
      c match {
        case '"' | '`' =>
          val cr = new Cursor(body, i)
          val raw = {
            val start = i
            cr.readString()
            body.substring(start, cr.i)
          }
          cur.append(raw); i = cr.i - 1
        case '/' if i + 1 < body.length && body.charAt(i + 1) == '/' =>
          while (i < body.length && body.charAt(i) != '\n') i += 1
          i -= 1
        case '{' | '(' | '[' => depth += 1; cur.append(c)
        case '}' | ')' | ']' => depth -= 1; cur.append(c)
        case ',' if depth == 0 => out += cur.toString; cur.clear()
        case _ => cur.append(c)
      }
      i += 1
    }
    if (cur.toString.trim.nonEmpty) out += cur.toString
    out.toSeq
  }

  /** One Go row value → comparable Scala value (numbers as BigDecimal). */
  def goValue(tok0: String): Any = {
    val tok = tok0.trim
    def inner(prefix: String): String =
      tok.stripPrefix(prefix).stripPrefix("(").stripSuffix(")")
    tok match {
      case "nil" => null
      case "true" => true
      case "false" => false
      case t if t.startsWith("\"") || t.startsWith("`") =>
        // Go string concatenation: "a" + "b" + `c` (multi-line SHOW
        // CREATE TABLE expectations are written this way)
        val c = new Cursor(t, 0)
        val sb = new StringBuilder(c.readString())
        var more = true
        while (more) {
          c.skipWsAndComments()
          if (!c.eof && c.ch == '+') {
            c.i += 1
            sb.append(c.readString())
          } else more = false
        }
        sb.toString
      case t if t.matches("-?\\d+") => BigDecimal(t)
      case t if t.matches("-?\\d*\\.\\d+(e-?\\d+)?") => BigDecimal(t)
      case t if t.startsWith("int64(") || t.startsWith("int32(") ||
          t.startsWith("int8(") || t.startsWith("int16(") ||
          t.startsWith("uint64(") || t.startsWith("uint32(") ||
          t.startsWith("uint8(") || t.startsWith("uint16(") ||
          t.startsWith("float64(") || t.startsWith("float32(") =>
        goValue(tok.substring(tok.indexOf('(') + 1, tok.length - 1))
      case t if t.startsWith("[]byte(") || t.startsWith("[]uint8(") ||
          t.startsWith("types.MustJSON(") =>
        goValue(tok.substring(tok.indexOf('(') + 1, tok.length - 1))
      case t => t // unknown marker: compared as its source text
    }
  }

  private def isWriteResult(rowsBody: String): Boolean =
    rowsBody.contains("OkResult") || rowsBody.contains("UpdateResult")

  /** Parses `Expected: []sql.Row{...}`'s inner body into rows; None for
    * write-result markers. */
  def parseRows(body: String): Option[Seq[Seq[Any]]] = {
    if (isWriteResult(body)) return None
    val rows = splitTopLevel(body).map(_.trim).filter(_.nonEmpty).map { r =>
      val t = r.stripPrefix("sql.Row").trim
      require(t.startsWith("{") && t.endsWith("}"), s"bad row literal: $r")
      splitTopLevel(t.substring(1, t.length - 1)).map(_.trim)
        .filter(_.nonEmpty).map(goValue)
    }
    Some(rows)
  }

  /** All ScriptTest entries of `varName` in the Go source at `path`. */
  def scripts(path: String, varName: String): Seq[Script] = {
    val src = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(path)),
      java.nio.charset.StandardCharsets.UTF_8)
    val start = src.indexOf(s"var $varName = ")
    require(start >= 0, s"$varName not found in $path")
    val cur = new Cursor(src, src.indexOf('{', start))
    val body = cur.readBraceGroup()
    splitTopLevel(body).map(_.trim).filter(_.nonEmpty).map { entry =>
      val t = entry.stripPrefix("{").stripSuffix("}")
      parseScript(t)
    }
  }

  private def field(body: String, name: String): Option[Int] = {
    // top-level field occurrence (depth 0, not inside a string)
    var depth = 0; var i = 0
    while (i < body.length) {
      val c = body.charAt(i)
      c match {
        case '"' | '`' =>
          val cr = new Cursor(body, i); cr.readString(); i = cr.i - 1
        case '/' if i + 1 < body.length && body.charAt(i + 1) == '/' =>
          while (i < body.length && body.charAt(i) != '\n') i += 1
        case '{' | '(' | '[' => depth += 1
        case '}' | ')' | ']' => depth -= 1
        case _ if depth == 0 && body.startsWith(name + ":", i) &&
            (i == 0 || !body.charAt(i - 1).isLetterOrDigit) =>
          return Some(i)
        case _ =>
      }
      i += 1
    }
    None
  }

  private def parseScript(body: String): Script = {
    val name = field(body, "Name").map { at =>
      new Cursor(body, at + "Name:".length).readString()
    }.getOrElse("unnamed")
    val setup = field(body, "SetUpScript").map { at =>
      val c = new Cursor(body, body.indexOf('{', at))
      splitTopLevel(c.readBraceGroup()).map(_.trim).filter(_.nonEmpty)
        .map(s => goValue(s).toString) // handles "a" + "b" concatenation
    }.getOrElse(Seq.empty)
    val asserts = field(body, "Assertions").map { at =>
      val c = new Cursor(body, body.indexOf('{', at))
      splitTopLevel(c.readBraceGroup()).map(_.trim).filter(_.nonEmpty)
        .map(parseAssert)
    }.getOrElse(Seq.empty)
    Script(name, setup, asserts)
  }

  private def parseAssert(entry: String): Assert = {
    val body = entry.stripPrefix("{").stripSuffix("}")
    val query = field(body, "Query").map { at =>
      // concat-aware: Query strings are sometimes built with "+"
      val c = new Cursor(body, at + "Query:".length)
      val sb = new StringBuilder(c.readString())
      var more = true
      while (more) {
        c.skipWsAndComments()
        if (!c.eof && c.ch == '+') { c.i += 1; sb.append(c.readString()) }
        else more = false
      }
      sb.toString
    }.getOrElse("")
    val skip = field(body, "Skip").exists { at =>
      body.substring(at + "Skip:".length).trim.startsWith("true")
    }
    val expectErr = field(body, "ExpectedErr").nonEmpty ||
      field(body, "ExpectedErrStr").nonEmpty
    val expected =
      if (expectErr) None
      else field(body, "Expected").flatMap { at =>
        val c = new Cursor(body, body.indexOf('{', at))
        parseRows(c.readBraceGroup())
      }
    Assert(query, expected, skip, expectErr)
  }
}
