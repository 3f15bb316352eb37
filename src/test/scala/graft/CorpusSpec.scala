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
    assert(String.valueOf(GoNorm.norm(r.get(0))).startsWith("1998-09-02"))
    assert(String.valueOf(GoNorm.norm(r.get(1))) == "2024-01-01 01:30:00")
  }

  test("NOT IN against a set containing NULL matches nothing (3VL)") {
    niltable.createOrReplaceTempView("niltable_v")
    val got = spark.sql(
      "SELECT i FROM niltable_v WHERE i2 NOT IN (2, NULL)").count()
    assert(got == 0)
  }

  // ---- datetime_table fixture (setup_data.sg.go:141) -------------------

  private def ts(s: String) = java.sql.Timestamp.valueOf(s)
  private def dt(s: String) = java.sql.Date.valueOf(s)
  private lazy val datetimeTable = Seq(
    (1L, dt("2019-12-31"), ts("2020-01-01 12:00:00"), ts("2020-01-02 12:00:00")),
    (2L, dt("2020-01-03"), ts("2020-01-04 12:00:00"), ts("2020-01-05 12:00:00")),
    (3L, dt("2020-01-07"), ts("2020-01-07 12:00:00"), ts("2020-01-07 12:00:01")))
    .toDF("i", "date_col", "datetime_col", "timestamp_col")

  test("date vs datetime comparisons promote correctly") {
    // date_col > '2020-01-01' — string literal coerces to date
    assert(datetimeTable.filter($"date_col" > "2020-01-01").select($"i")
      .collect().map(_.getLong(0)).sorted.toSeq == Seq(2L, 3L))
    // datetime equality against a date-only literal means midnight
    assert(datetimeTable.filter($"datetime_col" === "2020-01-04 12:00:00")
      .select($"i").collect().map(_.getLong(0)).toSeq == Seq(2L))
    // cross-column compare: timestamp_col is strictly after datetime_col
    assert(datetimeTable.filter($"timestamp_col" > $"datetime_col").count() == 3)
  }

  test("date arithmetic on the fixture rows") {
    val got = datetimeTable.orderBy($"i")
      .select(datediff($"timestamp_col".cast("date"), $"date_col"))
      .collect().map(_.getInt(0))
    assert(got.toSeq == Seq(2, 2, 0))
  }

  // ---- one_pk / two_pk fixtures (setup_data.sg.go:3135,3141) -----------

  private lazy val onePk = Seq(
    (0, 0, 1, 2, 3, 4), (1, 10, 11, 12, 13, 14),
    (2, 20, 21, 22, 23, 24), (3, 30, 31, 32, 33, 34))
    .toDF("pk", "c1", "c2", "c3", "c4", "c5")
  private lazy val twoPk = Seq(
    (0, 0, 0, 1, 2, 3, 4), (0, 1, 10, 11, 12, 13, 14),
    (1, 0, 20, 21, 22, 23, 24), (1, 1, 30, 31, 32, 33, 34))
    .toDF("pk1", "pk2", "c1", "c2", "c3", "c4", "c5")

  test("GROUP BY / ORDER BY ordinals and SELECT-alias HAVING") {
    mytable.createOrReplaceTempView("mytable_v")
    val e = new Engine(spark)
    val got = e.query(
      """SELECT substring(s, 1, 1) AS initial, count(*) AS n
         FROM mytable_v GROUP BY 1 HAVING n >= 1 ORDER BY 2 DESC, 1""")
      .collect().map(r => (r.getString(0), r.getLong(1)))
    assert(got.toSeq == Seq(("f", 1L), ("s", 1L), ("t", 1L)))
    // ORDER BY an expression absent from the SELECT list
    val ord = e.query(
      "SELECT s FROM mytable_v ORDER BY length(s) DESC, s")
      .collect().map(_.getString(0))
    assert(ord.toSeq == Seq("second row", "first row", "third row"))
  }

  test("DIV truncates toward zero; % keeps the dividend's sign") {
    val e = new Engine(spark)
    val r = e.query(
      """SELECT -7 DIV 2 AS d1, 7 DIV 2 AS d2,
               -7 % 2 AS m1, 7 % -2 AS m2""").collect()(0)
    assert(r.getLong(0) == -3 && r.getLong(1) == 3)
    assert(r.getInt(2) == -1 && r.getInt(3) == 1)
  }

  test("LEAST/GREATEST propagate NULL (MySQL), unlike Spark's builtins") {
    val e = new Engine(spark)
    val r = e.query(
      """SELECT LEAST(1, 2, NULL) AS l, GREATEST(3, NULL, 1) AS g,
               LEAST(4, 2, 9) AS l2, GREATEST('b', 'a', 'c') AS g2""")
      .collect()(0)
    assert(r.isNullAt(0) && r.isNullAt(1))
    assert(r.getInt(2) == 2 && r.getString(3) == "c")
  }

  test("BETWEEN on string-typed dates coerces to date compare") {
    assert(datetimeTable.filter(
      $"date_col".between("2020-01-01", "2020-01-05")).select($"i")
      .collect().map(_.getLong(0)).sorted.toSeq == Seq(2L))
  }

  test("CASE branches coerce to a common wider type") {
    val e = new Engine(spark)
    val r = e.query(
      """SELECT CASE WHEN 1 = 1 THEN 1 ELSE 2.5 END AS a,
               CASE WHEN 1 = 0 THEN 1 ELSE 2.5 END AS b""").collect()(0)
    assert(r.getDecimal(0).doubleValue == 1.0)
    assert(r.getDecimal(1).doubleValue == 2.5)
  }

  test("composite-key join one_pk x two_pk on (pk1, pk2) derivation") {
    // classic reference shape: one_pk.pk = two_pk.pk1 * 2 + two_pk.pk2
    val got = onePk.join(twoPk, $"pk" === $"pk1" * 2 + $"pk2")
      .select($"pk", $"pk1", $"pk2").orderBy($"pk")
      .collect().map(r => (r.getInt(0), r.getInt(1), r.getInt(2)))
    assert(got.toSeq == Seq((0, 0, 0), (1, 0, 1), (2, 1, 0), (3, 1, 1)))
  }

  test("self-join on one_pk with shifted keys") {
    val a = onePk.as("a"); val b = onePk.as("b")
    val got = a.join(b, col("a.pk") === col("b.pk") + 1)
      .select(col("a.pk"), col("b.c1")).orderBy(col("a.pk"))
      .collect().map(r => (r.getInt(0), r.getInt(1)))
    assert(got.toSeq == Seq((1, 0), (2, 10), (3, 20)))
  }

  test("aggregate over composite groups of two_pk") {
    val got = twoPk.groupBy($"pk1")
      .agg(sum($"c1").as("s"), max($"c5").as("m")).orderBy($"pk1")
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getInt(2)))
    assert(got.toSeq == Seq((0, 10L, 14), (1, 50L, 34)))
  }
}
