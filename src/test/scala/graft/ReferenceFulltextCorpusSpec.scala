package graft

import org.scalatest.funsuite.AnyFunSuite

/** Full-text ScriptTests ported verbatim from the reference corpus
  * (enginetest/queries/fulltext_queries.go "Basic matching" blocks):
  * FULLTEXT index declared in CREATE TABLE, MATCH(cols) AGAINST as a
  * WHERE predicate (truthy relevance), explicit =0/>0 comparisons, and
  * boolean combinations with key lookups. The matching SET must agree
  * with MySQL; absolute relevance diverges (documented) so assertions
  * only ever use the predicate form.
  */
class ReferenceFulltextCorpusSpec extends AnyFunSuite {
  import SparkSpec.spark

  private def freshEngine = new Engine(spark)

  private def rows(e: Engine, sql: String): Seq[Seq[Any]] =
    e.query(sql).collect()
      .map(r => (0 until r.length).map(i => r.get(i) match {
        case l: Long => l
        case i: Int => i.toLong
        case d: java.math.BigDecimal => d.longValueExact()
        case other => other
      }).toSeq).toSeq.sortBy(GoNorm.sortKeyRow)

  private def sorted(rs: Seq[Seq[Any]]): Seq[Seq[Any]] =
    rs.sortBy(GoNorm.sortKeyRow)

  test("basic matching over a FULLTEXT-indexed table (fulltext_queries.go:25)") {
    val e = freshEngine
    e.runScript(
      """CREATE TABLE ftt (pk BIGINT UNSIGNED PRIMARY KEY, v1 VARCHAR(200), v2 VARCHAR(200), FULLTEXT idx (v1, v2));
        |INSERT INTO ftt VALUES (1, 'abc', 'def pqr'), (2, 'ghi', 'jkl'), (3, 'mno', 'mno'), (4, 'stu vwx', 'xyz zyx yzx'), (5, 'ghs', 'mno shg');""".stripMargin)
    assert(rows(e, "SELECT * FROM ftt WHERE MATCH(v1, v2) AGAINST ('ghi')") ==
      sorted(Seq(Seq(2L, "ghi", "jkl"))))
    assert(rows(e, "SELECT pk, v1 FROM ftt WHERE MATCH(v1, v2) AGAINST ('ghi')") ==
      sorted(Seq(Seq(2L, "ghi"))))
    assert(rows(e, "SELECT v1, v2 FROM ftt WHERE MATCH(v1, v2) AGAINST ('ghi')") ==
      sorted(Seq(Seq("ghi", "jkl"))))
    assert(rows(e, "SELECT pk, v1, v2 FROM ftt WHERE MATCH(v2, v1) AGAINST ('jkl')") ==
      sorted(Seq(Seq(2L, "ghi", "jkl"))))
    assert(rows(e, "SELECT v1 FROM ftt WHERE MATCH(v2, v1) AGAINST ('jkl')") ==
      sorted(Seq(Seq("ghi"))))
    assert(rows(e, "SELECT * FROM ftt WHERE MATCH(v2, v1) AGAINST ('jkl') = 0") ==
      sorted(Seq(
        Seq(1L, "abc", "def pqr"), Seq(3L, "mno", "mno"),
        Seq(4L, "stu vwx", "xyz zyx yzx"), Seq(5L, "ghs", "mno shg"))))
    assert(rows(e, "SELECT * FROM ftt WHERE MATCH(v2, v1) AGAINST ('jkl') > 0") ==
      sorted(Seq(Seq(2L, "ghi", "jkl"))))
    assert(rows(e, "SELECT * FROM ftt WHERE MATCH(v2, v1) AGAINST ('jkl mno')") ==
      sorted(Seq(Seq(2L, "ghi", "jkl"), Seq(3L, "mno", "mno"),
        Seq(5L, "ghs", "mno shg"))))
    assert(rows(e, "SELECT * FROM ftt WHERE MATCH(v2, v1) AGAINST ('jkl mno') AND pk = 3") ==
      sorted(Seq(Seq(3L, "mno", "mno"))))
    assert(rows(e, "SELECT * FROM ftt WHERE MATCH(v2, v1) AGAINST ('jkl mno') OR pk = 1") ==
      sorted(Seq(Seq(1L, "abc", "def pqr"), Seq(2L, "ghi", "jkl"),
        Seq(3L, "mno", "mno"), Seq(5L, "ghs", "mno shg"))))
    e.query("drop table ftt")
  }

  test("matching without declared keys (fulltext_queries.go:123)") {
    val e = freshEngine
    e.runScript(
      """CREATE TABLE ftn (v1 VARCHAR(200), v2 VARCHAR(200), FULLTEXT idx (v1, v2));
        |INSERT INTO ftn VALUES ('abc', 'def pqr'), ('ghi', 'jkl'), ('mno', 'mno'), ('stu vwx', 'xyz zyx yzx'), ('ghs', 'mno shg');""".stripMargin)
    assert(rows(e, "SELECT * FROM ftn WHERE MATCH(v1, v2) AGAINST ('ghi')") ==
      sorted(Seq(Seq("ghi", "jkl"))))
    assert(rows(e, "SELECT v2, v1 FROM ftn WHERE MATCH(v1, v2) AGAINST ('ghi')") ==
      sorted(Seq(Seq("jkl", "ghi"))))
    assert(rows(e, "SELECT * FROM ftn WHERE MATCH(v2, v1) AGAINST ('jkl mno')") ==
      sorted(Seq(Seq("ghi", "jkl"), Seq("mno", "mno"), Seq("ghs", "mno shg"))))
    e.query("drop table ftn")
  }
}
