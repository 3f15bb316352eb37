package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Data-driven conformance suite over the reference's canonical fixtures
  * (FIXTURES.md §A; data mirrored from
  * enginetest/scriptgen/setup/setup_data.sg.go:3035,3063,3102,169). The
  * queries are our own, exercising the semantic domains the reference's
  * QueryTest corpus covers: NULL handling, 3-valued logic, join shapes,
  * implicit coercion, aggregate NULL-skipping. */
class CorpusSpec extends AnyFunSuite {
  import SparkSpec.spark
  import spark.implicits._

  private lazy val mytable = Seq(
    (1L, "first row"), (2L, "second row"), (3L, "third row"))
    .toDF("i", "s")
  private lazy val othertable = Seq(
    ("first", 3L), ("second", 2L), ("third", 1L)).toDF("s2", "i2")
  private lazy val niltable = Seq[(Long, Option[Long], Option[Int], Option[Double])](
    (1L, None, None, None), (2L, Some(2L), Some(1), None),
    (3L, None, Some(0), None), (4L, Some(4L), None, Some(4.0)),
    (5L, None, Some(1), Some(5.0)), (6L, Some(6L), Some(0), Some(6.0)))
    .toDF("i", "i2", "b", "f")
  private lazy val floattable = Seq(
    (1L, 1.0f, 1.0), (2L, 1.5f, 1.5), (3L, 2.0f, 2.0),
    (4L, 2.5f, 2.5), (-1L, -1.0f, -1.0), (-2L, -1.5f, -1.5))
    .toDF("i", "f32", "f64")

  test("mytable x othertable equi-join (reversed key order)") {
    val got = mytable.join(othertable, $"i" === $"i2")
      .select($"i", $"s", $"s2").orderBy($"i")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    assert(got.toSeq == Seq(
      (1L, "first row", "third"), (2L, "second row", "second"),
      (3L, "third row", "first")))
  }

  test("IS NULL / IS NOT NULL partition niltable") {
    assert(niltable.filter($"i2".isNull).select($"i")
      .collect().map(_.getLong(0)).sorted.toSeq == Seq(1L, 3L, 5L))
    assert(niltable.filter($"i2".isNotNull).select($"i")
      .collect().map(_.getLong(0)).sorted.toSeq == Seq(2L, 4L, 6L))
  }

  test("COUNT skips NULLs; COUNT(*) does not; AVG skips NULLs") {
    val r = niltable.agg(
      count($"i2").as("c2"), count(lit(1)).as("cstar"), avg($"f").as("af"))
      .collect()(0)
    assert(r.getLong(0) == 3 && r.getLong(1) == 6 && r.getDouble(2) == 5.0)
  }

  test("IS TRUE / IS FALSE on tinyint-boolean column") {
    assert(niltable.filter($"b" === 1).select($"i")
      .collect().map(_.getLong(0)).sorted.toSeq == Seq(2L, 5L))
    assert(niltable.filter($"b" === 0).select($"i")
      .collect().map(_.getLong(0)).sorted.toSeq == Seq(3L, 6L))
    assert(niltable.filter($"b".isNull).count() == 2)
  }

  test("IFNULL / null-safe equality <=>") {
    val vals = niltable.orderBy($"i")
      .select(coalesce($"i2", lit(-1L))).collect().map(_.getLong(0))
    assert(vals.toSeq == Seq(-1L, 2L, -1L, 4L, -1L, 6L))
    // i2 <=> NULL is TRUE exactly for the NULL rows
    assert(niltable.filter($"i2" <=> lit(null)).count() == 3)
    assert(niltable.filter($"i2" <=> $"i").select($"i")
      .collect().map(_.getLong(0)).sorted.toSeq == Seq(2L, 4L, 6L))
  }

  test("MySQL NULL ordering: NULLS FIRST on ASC") {
    val seq = niltable.orderBy($"i2".asc_nulls_first, $"i")
      .select($"i2").collect().map(r => if (r.isNullAt(0)) None else Some(r.getLong(0)))
    assert(seq.toSeq == Seq(None, None, None, Some(2L), Some(4L), Some(6L)))
  }

  test("left join with extra condition leaves unmatched rows NULL") {
    val got = mytable.join(othertable,
        $"i" === $"i2" && $"s2" === "second", "left")
      .orderBy($"i").select($"i", $"s2")
      .collect().map(r => (r.getLong(0), Option(r.getString(1))))
    assert(got.toSeq == Seq(
      (1L, None), (2L, Some("second")), (3L, None)))
  }

  test("implicit string->number coercion in comparisons") {
    assert(mytable.filter($"i" === "2").select($"s")
      .collect().map(_.getString(0)).toSeq == Seq("second row"))
    assert(floattable.filter($"f64" === "1.5").select($"i")
      .collect().map(_.getLong(0)).toSeq == Seq(2L))
  }

  test("float vs double representation: f32 widens exactly for .0/.5") {
    assert(floattable.filter($"f32".cast("double") === $"f64").count() == 6)
  }

  test("UNION distinct merges key spaces") {
    val got = mytable.select($"i").union(othertable.select($"i2"))
      .distinct().collect().map(_.getLong(0)).sorted
    assert(got.toSeq == Seq(1L, 2L, 3L))
  }

  test("GROUP BY over a nullable key keeps the NULL group") {
    val got = niltable.groupBy($"b").agg(count(lit(1)).as("n"))
      .collect().map(r => (if (r.isNullAt(0)) None else Some(r.getInt(0))) -> r.getLong(1))
      .toMap
    assert(got == Map(None -> 2L, Some(0) -> 2L, Some(1) -> 2L))
  }

  test("IN with NULL member matches only non-NULL hits (3VL)") {
    val got = niltable.filter($"i2".isin(2L, null).isNotNull &&
      $"i2".isin(2L, null)).select($"i").collect().map(_.getLong(0))
    assert(got.toSeq == Seq(2L))
  }

  test("MySQL LIKE is case-insensitive for non-binary collations -> ilike") {
    // MySQL: s LIKE 'FIRST%' matches 'first row' under *_ci collations
    assert(mytable.filter($"s".ilike("FIRST%")).count() == 1)
    assert(mytable.filter($"s".like("FIRST%")).count() == 0) // BINARY-collation behavior
    assert(mytable.filter($"s".ilike("%ROW")).count() == 3)
  }

  test("INTERVAL arithmetic in SQL and DSL") {
    val e = new Engine(spark)
    val r = e.query(
      """SELECT DATE '1998-12-01' - INTERVAL 90 DAY AS d,
               TIMESTAMP '2024-01-01 00:00:00' + INTERVAL 90 MINUTE AS t""")
      .collect()(0)
    assert(r.getDate(0).toString == "1998-09-02")
    assert(r.getTimestamp(1).toString == "2024-01-01 01:30:00.0")
  }

  test("NOT IN against a set containing NULL matches nothing (3VL)") {
    niltable.createOrReplaceTempView("niltable_v")
    val got = spark.sql(
      "SELECT i FROM niltable_v WHERE i2 NOT IN (2, NULL)").count()
    assert(got == 0)
  }
}
