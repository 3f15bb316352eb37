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

  test("phrases match contiguous tokens across punctuation") {
    assert(run("big Machine, Learning rig", """+"machine learning"""")._1)
    assert(!run("machine of learning", """+"machine learning"""")._1)
  }
}
