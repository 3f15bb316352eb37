package graft

import graft.functions.FullText
import graft.functions.FullText.Term
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Boolean-mode MATCH...AGAINST grammar (reference fulltext.go semantics). */
class FullTextSpec extends AnyFunSuite {
  import SparkSpec.spark

  private def run(text: String, query: String): (Boolean, Int) = {
    val (m, r) = FullText.booleanMatch(lit(text), query)
    val row = spark.range(1).select(m.as("m"), r.as("r")).collect()(0)
    (row.getBoolean(0), row.getInt(1))
  }

  test("parse handles ops, phrases, and prefix wildcards") {
    assert(FullText.parse("""+data -quantum "Machine  Learning" learn*""") ==
      Seq(Term('+', "data", phrase = false, prefix = false),
        Term('-', "quantum", phrase = false, prefix = false),
        Term(' ', "machine learning", phrase = true, prefix = false),
        Term(' ', "learn", phrase = false, prefix = true)))
    assert(FullText.parse("""+"exact phrase"""") ==
      Seq(Term('+', "exact phrase", phrase = true, prefix = false)))
  }

  test("+required and -excluded terms gate the match") {
    assert(run("data is here", "+data") == (true, 1))
    assert(run("no match here", "+data") == (false, 0))
    assert(run("data and quantum", "+data -quantum") == (false, 0))
    assert(run("data data only", "+data -quantum") == (true, 2))
  }

  test("optional terms score without gating when a + term exists") {
    val (m, r) = run("data on machine learning to learn", // learning counts for learn*
      """+data "machine learning" learn*""")
    assert(m)
    assert(r == 1 + 1 + 2) // tf(data) + phrase + {learning, learn}
  }

  test("with only optional terms, any hit matches") {
    assert(run("just noise", "alpha beta") == (false, 0))
    assert(run("alpha here", "alpha beta") == (true, 1))
  }

  test("weight operators > < ~ adjust relevance without gating") {
    def runD(text: String, query: String): (Boolean, Double) = {
      val (m, r) = FullText.booleanMatch(lit(text), query)
      val row = spark.range(1).select(m.as("m"), r.as("r")).collect()(0)
      (row.getBoolean(0), row.getDouble(1))
    }
    assert(FullText.parse(">up <down ~soft") ==
      Seq(Term(' ', "up", phrase = false, prefix = false, 2.0),
        Term(' ', "down", phrase = false, prefix = false, 0.5),
        Term(' ', "soft", phrase = false, prefix = false, -1.0)))
    // up counts double, down half, soft subtracts but does not exclude
    assert(runD("up down soft", "+up >down <soft") == (true, 1.0 + 2.0 + 0.5))
    assert(runD("up up soft", "+up ~soft") == (true, 2.0 - 1.0))
    // ~term alone never gates the match
    assert(runD("only soft here", "+only ~soft")._1)
    // unweighted queries keep integer relevance
    assert(run("up down", "+up down") == (true, 2))
  }

  test("phrases match contiguous tokens across punctuation") {
    assert(run("big Machine, Learning rig", """+"machine learning"""")._1)
    assert(!run("machine of learning", """+"machine learning"""")._1)
  }
}
