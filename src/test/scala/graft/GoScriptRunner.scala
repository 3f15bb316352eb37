package graft

import org.scalatest.funsuite.AnyFunSuite

/** Shared driver for ScriptTest corpora parsed at test time by
  * [[GoCorpus]]: each Go block's SetUpScript runs through the Engine's
  * SQL front door, then every assertion's rows compare against the Go
  * literal `Expected` (unordered unless the query orders; numerics
  * widened to BigDecimal so Go int-width wrappers compare equal).
  *
  * Subclasses declare the Go source path, the variable names to run,
  * and a substring→reason map of pinned divergences (skipped with the
  * reason as documentation). Blocks the reference itself skips
  * (`Skip: true`) are skipped here too.
  */
abstract class GoScriptCorpusSpec extends AnyFunSuite {
  import SparkSpec.spark

  /** Fresh per block — the reference runs each ScriptTest in a fresh
    * session, so session state (sql_mode, time_zone, @vars) must not
    * leak across blocks. Engine construction is cheap (catalog maps +
    * function registration are idempotent). */
  protected def newEngine(): Engine = new Engine(spark)

  /** Absolute path of the Go corpus file. */
  def path: String
  /** `var X = []ScriptTest{...}` names to execute. */
  def varNames: Seq[String]
  /** query-text substring → documented reason to skip. */
  def divergences: Map[String, String] = Map.empty
  /** block name → reason: skip the whole script (e.g. setup needs an
    * unsupported feature). */
  def blockDivergences: Map[String, String] = Map.empty
  /** Vars the reference runs with ONE engine for the whole var
    * (TestScriptWithEngine): blocks see prior blocks' tables and session
    * state, so the runner shares an Engine and only cleans the catalog
    * before the var's first block. */
  def sharedEngineVars: Set[String] = Set.empty

  private val sharedEngines =
    scala.collection.mutable.Map.empty[String, Engine]

  protected def norm(v: Any): Any = v match {
    case null => null
    case b: Byte => BigDecimal(b.toInt)
    case s: Short => BigDecimal(s.toInt)
    case i: Int => BigDecimal(i)
    case l: Long => BigDecimal(l)
    case f: Float => BigDecimal(f.toDouble)
    case d: Double => BigDecimal(d)
    case d: java.math.BigDecimal =>
      BigDecimal(d) // trailing-zero-insensitive via BigDecimal equals? no:
      // scala BigDecimal equality is numeric (2.0 == 2), which is what the
      // loose corpus comparison wants
    case b: Array[Byte] => new String(b, "UTF-8")
    case s: String =>
      // JSON columns print with engine-specific whitespace; compare the
      // compact form (types.MustJSON prints {"a":1}, Spark {"a": 1})
      val t = s.trim
      if ((t.startsWith("{") && t.endsWith("}")) ||
          (t.startsWith("[") && t.endsWith("]"))) compactJson(s)
      else s
    case other => other
  }

  /** Strip whitespace outside string literals — a cheap JSON normalizer
    * for display-form comparison. */
  protected def compactJson(s: String): String = {
    val sb = new StringBuilder
    var inStr = false
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (inStr) {
        sb.append(c)
        if (c == '\\' && i + 1 < s.length) { sb.append(s.charAt(i + 1)); i += 1 }
        else if (c == '"') inStr = false
      } else if (c == '"') { inStr = true; sb.append(c) }
      else if (!c.isWhitespace) sb.append(c)
      i += 1
    }
    sb.toString
  }

  private def dropCreated(engine: Engine, setup: Seq[String]): Unit =
    setup.flatMap(s =>
      "(?i)CREATE\\s+(?:TABLE|VIEW)\\s+(?:IF\\s+NOT\\s+EXISTS\\s+)?`?\"?([A-Za-z0-9_]+)`?\"?"
        .r.findFirstMatchIn(s).map(_.group(1)))
      .distinct.foreach { t =>
        try engine.query(s"drop view if exists $t")
        catch { case _: Throwable => () }
        try engine.query(s"drop table if exists $t")
        catch { case _: Throwable => () }
      }

  /** Extra fixture statements run before each block's own setup. */
  def fixtures: Seq[String] = Seq.empty
  /** Per-var fixture override (mirrors the reference's harness.Setup). */
  def fixturesFor(varName: String): Seq[String] = fixtures

  protected def runBlock(varName: String, sc: GoCorpus.Script,
                         firstOfVar: Boolean = true): Seq[String] = {
    val shared = sharedEngineVars(varName)
    val engine =
      if (shared) sharedEngines.getOrElseUpdate(varName, newEngine())
      else newEngine()
    val fix = if (!shared || firstOfVar) fixturesFor(varName) else Seq.empty
    if (!shared || firstOfVar) {
      // Full isolation, mirroring the reference's fresh-session-per-script
      // harness: drop every temp view left over from earlier blocks/suites.
      // Safe because forked sbt tests run suites sequentially — no other
      // suite is mid-flight — and every suite (re)registers its own
      // fixtures. Catalog-persistent (db-qualified) leftovers are rarer;
      // dropCreated below catches the names this block touches.
      spark.catalog.listTables().collect()
        .filter(_.isTemporary).map(_.name)
        .foreach(n => try spark.catalog.dropTempView(n)
          catch { case _: Throwable => () })
      dropCreated(engine, fix ++ sc.setup ++ sc.asserts.map(_.query))
    }
    fix.foreach(engine.query)
    sc.setup.foreach(engine.query)
    sc.asserts.flatMap { a =>
      val pinned = divergences.keys.find(a.query.contains)
      if (a.skip) None
      else if (pinned.nonEmpty) {
        // pinned divergence: still EXECUTE (later asserts may depend on
        // the statement's side effects) but compare nothing
        try engine.query(a.query).collect() catch { case _: Throwable => () }
        None
      }
      else if (a.expectErr) {
        try {
          engine.query(a.query).collect()
          Some(s"${a.query}\n  expected an error, none thrown")
        } catch { case _: Throwable => None }
      } else {
        try {
          val got = engine.query(a.query).collect()
            .map(r => (0 until r.length).map(i => norm(r.get(i))).toSeq)
            .toSeq
          a.expected match {
            case None => None // write statement / plan-only assert: execute
            case Some(want0) =>
              val want = want0.map(_.map(norm))
              val ordered =
                "(?i)\\border\\s+by\\b".r.findFirstIn(a.query).isDefined
              val (g, w) =
                if (ordered) (got, want)
                else (got.sortBy(_.mkString("|")),
                  want.sortBy(_.mkString("|")))
              if (g == w) None
              else Some(s"${a.query}\n  got:  $g\n  want: $w")
          }
        } catch {
          case e: Throwable =>
            Some(s"${a.query}\n  threw ${String.valueOf(e.getMessage).take(300)}")
        }
      }
    }
  }

  protected def registerAll(): Unit = {
    for (varName <- varNames) {
      val blocks = GoCorpus.scripts(path, varName)
      val seen = scala.collection.mutable.Map.empty[String, Int]
      var first = true
      for (sc <- blocks) {
        val isFirst = first
        // ScalaTest requires unique test names; some corpora reuse a
        // block name ("error cases") within one var
        val n = seen.updateWith(sc.name)(c => Some(c.getOrElse(0) + 1)).get
        val label =
          if (n == 1) s"$varName: ${sc.name}"
          else s"$varName: ${sc.name} #$n"
        blockDivergences.get(sc.name) match {
          case Some(reason) =>
            ignore(s"$label [pinned: $reason]") {}
          case None =>
            test(label) {
              val failures = runBlock(varName, sc, isFirst)
              assert(failures.isEmpty,
                s"${failures.size} mismatches; first:\n" +
                  failures.take(3).mkString("\n"))
            }
        }
        first = false
      }
    }
  }
}
