package graft

import org.scalatest.funsuite.AnyFunSuite

/** Shared driver for QueryTest corpora (read-only Query/Expected pairs,
  * parsed at test time by [[GoCorpus.queryTests]]): fixtures load once,
  * one Engine serves every query, entries run in batches so a 1,000+
  * entry corpus doesn't become 1,000 ScalaTest cases. Comparison rules
  * match [[GoScriptCorpusSpec]] (unordered unless the query orders,
  * numerics as BigDecimal, temporals canonicalized). Entries whose
  * expectation contains a Go value the parser can't evaluate (struct
  * literal, helper call) are skipped and counted — the skip list prints
  * at the end of each batch's failure report for triage.
  */
abstract class GoQueryCorpusSpec extends AnyFunSuite {
  import SparkSpec.spark

  def path: String
  def varNames: Seq[String]
  /** Fixture SQL, run once before the first query. */
  def fixtures: Seq[String] = Seq.empty
  /** query-text substring → documented reason to skip. */
  def divergences: Map[String, String] = Map.empty
  def batchSize: Int = 25

  /** Optional divergence inventory: a file of exact query texts
    * (whitespace-normalized; '#' comments carry the category) pinned as
    * documented divergences. A failing assert whose query is listed
    * skips; the inventory is meant to SHRINK as fixes land — entries
    * that now pass are reported via info() so they can be pruned. */
  def divergenceFile: Option[String] = None
  protected def normQ(q: String): String =
    q.replaceAll("\\s+", " ").trim
  private lazy val pinnedQueries: Set[String] = divergenceFile.map { p =>
    val src = scala.io.Source.fromFile(p, "UTF-8")
    try src.getLines().map(_.trim)
      .filterNot(l => l.isEmpty || l.startsWith("#")).map(normQ).toSet
    finally src.close()
  }.getOrElse(Set.empty)

  private lazy val engine: Engine = {
    // full isolation from earlier suites' temp views, like the script
    // runner: the corpus expectations enumerate catalog contents (SHOW
    // TABLES LIKE, information_schema listings)
    spark.catalog.listTables().collect()
      .filter(_.isTemporary).map(_.name)
      .foreach(n => try spark.catalog.dropTempView(n)
        catch { case _: Throwable => () })
    val e = new Engine(spark)
    fixtures.foreach(e.query)
    e
  }

  private def hasOpaque(rows: Seq[Seq[Any]]): Boolean =
    rows.exists(_.exists(_.isInstanceOf[GoCorpus.Opaque]))

  /** Run one assert; Some(message) on mismatch, None on pass/skip. */
  protected def runOne(a: GoCorpus.Assert): Option[String] = {
    if (a.expectErr) {
      try {
        engine.query(a.query).collect()
        Some(s"${a.query}\n  expected an error, none thrown")
      } catch { case _: Throwable => None }
    } else {
      try {
        val got = engine.query(a.query).collect()
          .map(r => (0 until r.length).map(i => GoNorm.norm(r.get(i))).toSeq)
          .toSeq
        a.expected match {
          case None => None
          case Some(want0) =>
            val want = want0.map(_.map(GoNorm.norm))
            val ordered = "(?i)\\border\\s+by\\b".r
              .findFirstIn(GoNorm.stripParens(a.query)).isDefined
            val (g, w) =
              if (ordered) (got, want)
              else (got.sortBy(_.mkString("|")), want.sortBy(_.mkString("|")))
            if (g == w) None
            else Some(s"${a.query}\n  got:  ${g.take(8)}\n  want: ${w.take(8)}")
        }
      } catch {
        case e: Throwable =>
          Some(s"${a.query}\n  threw ${String.valueOf(e.getMessage).take(300)}")
      }
    }
  }

  protected def registerAll(): Unit = {
    for (varName <- varNames) {
      val entries = GoCorpus.queryTests(path, varName)
      val batches = entries.zipWithIndex.grouped(batchSize).toSeq
      for ((batch, bi) <- batches.zipWithIndex) {
        val lo = batch.head._2; val hi = batch.last._2
        test(s"$varName [$lo..$hi]") {
          var skipped = List.empty[String]
          var fixedPins = List.empty[String]
          val failures = batch.flatMap { case (a, _) =>
            val pinned = divergences.keys.find(a.query.contains)
            if (a.skip) None
            else if (pinned.nonEmpty) None // read-only: nothing to execute
            else if (a.expected.exists(hasOpaque)) {
              skipped ::= a.query; None
            } else runOne(a) match {
              case Some(msg) if pinnedQueries.contains(normQ(a.query)) =>
                None // inventoried divergence
              case None if pinnedQueries.contains(normQ(a.query)) =>
                fixedPins ::= a.query; None
              case Some(msg) =>
                // machine-readable marker: tools/gen_divergences.py
                // greps these to (re)build the inventory
                info("DIVERGE\t" + normQ(a.query) + "\t" +
                  msg.linesIterator.drop(1).mkString(" ").trim.take(60))
                Some(msg)
              case None => None
            }
          }
          if (fixedPins.nonEmpty)
            info(s"${fixedPins.size} inventoried divergences now PASS " +
              s"(prune from ${divergenceFile.getOrElse("?")}): " +
              fixedPins.take(3).map(normQ).mkString(" | "))
          assert(failures.isEmpty,
            s"${failures.size} mismatches (of ${batch.size}); first 5:\n" +
              failures.take(5).mkString("\n") +
              (if (skipped.nonEmpty)
                s"\n[${skipped.size} skipped: unparsed Go expectation]"
               else ""))
        }
      }
    }
  }
}
