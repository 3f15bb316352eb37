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

  test("SQL-text MATCH(cols) AGAINST ('query' [mode]) front door " +
      "(fulltext_queries.go 'Basic matching 1 PK')") {
    val e = new Engine(spark)
    e.runScript(
      """CREATE TABLE fts (pk BIGINT PRIMARY KEY, v1 VARCHAR(200), v2 VARCHAR(200), FULLTEXT idx (v1, v2));
        |INSERT INTO fts VALUES (1, 'abc', 'def pqr'), (2, 'ghi', 'jkl'), (3, 'mno', 'mno'), (4, 'stu vwx', 'xyz zyx yzx'), (5, 'ghs', 'mno shg');
        |""".stripMargin)
    def ids(sql: String): Seq[Long] =
      e.query(sql).collect().map(_.getLong(0)).toSeq.sorted
    assert(ids("SELECT pk FROM fts WHERE MATCH(v1, v2) AGAINST ('ghi')") ==
      Seq(2L))
    assert(ids("SELECT pk FROM fts WHERE MATCH(v2, v1) AGAINST ('jkl')") ==
      Seq(2L))
    // relevance comparisons
    assert(ids("SELECT pk FROM fts WHERE MATCH(v2, v1) AGAINST ('jkl') = 0") ==
      Seq(1L, 3L, 4L, 5L))
    assert(ids("SELECT pk FROM fts WHERE MATCH(v2, v1) AGAINST ('jkl') > 0") ==
      Seq(2L))
    // multi-term natural mode: any term hits
    assert(ids("SELECT pk FROM fts WHERE MATCH(v2, v1) AGAINST ('jkl mno')") ==
      Seq(2L, 3L, 5L))
    assert(ids("SELECT pk FROM fts WHERE MATCH(v2, v1) AGAINST ('jkl mno') AND pk = 3") ==
      Seq(3L))
    assert(ids("SELECT pk FROM fts WHERE MATCH(v2, v1) AGAINST ('jkl mno') OR pk = 1") ==
      Seq(1L, 2L, 3L, 5L))
    // boolean mode: +required / -excluded gate the match
    assert(ids("SELECT pk FROM fts WHERE MATCH(v1, v2) AGAINST ('+mno -shg' IN BOOLEAN MODE)") ==
      Seq(3L))
    assert(ids("SELECT pk FROM fts WHERE MATCH(v1, v2) AGAINST ('mno' IN NATURAL LANGUAGE MODE)") ==
      Seq(3L, 5L))
    e.query("drop table fts")
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
