package graft

import org.scalatest.funsuite.AnyFunSuite

/** Join-shape Query/Expected pairs ported verbatim from the reference's
  * enginetest corpus (enginetest/queries/join_queries.go, fixtures from
  * enginetest/scriptgen/setup/setup_data.sg.go XyData / Pk_tablesData).
  * Each case pins a join-reordering / outer-join-null / subquery-in-join
  * behavior the reference's QueryTest suite pins. Same comparison rules
  * as ReferenceCorpusSpec: numerics type-loose, order-sensitive only when
  * the query orders.
  */
class ReferenceJoinCorpusSpec extends AnyFunSuite {
  import SparkSpec.spark
  import spark.implicits._

  private lazy val engine: Engine = {
    // setup_data.sg.go:3926 XyData
    Seq((1, 0), (2, 1), (0, 2), (3, 3)).toDF("x", "y")
      .createOrReplaceTempView("xy")
    Seq((0, 1), (1, 1), (2, 2), (3, 2)).toDF("u", "v")
      .createOrReplaceTempView("uv")
    Seq((0, 2), (1, 2), (2, 2), (3, 1)).toDF("a", "b")
      .createOrReplaceTempView("ab")
    Seq((0, 0), (1, 1), (2, 2), (3, 3)).toDF("p", "q")
      .createOrReplaceTempView("pq")
    // setup_data.sg.go:3156 Pk_tablesData
    Seq((0L, 0L, 0L), (1L, 1L, 1L), (2L, 2L, 2L), (3L, 3L, 3L),
      (4L, 4L, 4L), (5L, 5L, 5L), (6L, 6L, 6L), (7L, 7L, 7L))
      .toDF("pk", "v1", "v2").createOrReplaceTempView("one_pk_two_idx")
    Seq((0L, 0L, 0L, 0L), (1L, 0L, 0L, 1L), (2L, 0L, 1L, 0L),
      (3L, 0L, 2L, 2L), (4L, 1L, 0L, 0L), (5L, 2L, 0L, 3L),
      (6L, 3L, 3L, 0L), (7L, 4L, 4L, 4L))
      .toDF("pk", "v1", "v2", "v3").createOrReplaceTempView("one_pk_three_idx")
    // shared with ReferenceCorpusSpec (setup_data.sg.go MytableData etc.)
    Seq((1L, "first row"), (2L, "second row"), (3L, "third row"))
      .toDF("i", "s").createOrReplaceTempView("mytable")
    Seq(("first", 3L), ("second", 2L), ("third", 1L))
      .toDF("s2", "i2").createOrReplaceTempView("othertable")
    Seq[(Long, Option[Long], Option[Int], Option[Double])](
      (1L, None, None, None), (2L, Some(2L), Some(1), None),
      (3L, None, Some(0), None), (4L, Some(4L), None, Some(4.0)),
      (5L, None, Some(1), Some(5.0)), (6L, Some(6L), Some(0), Some(6.0)))
      .toDF("i", "i2", "b", "f").createOrReplaceTempView("niltable")
    Seq((0, 0, 1, 2, 3, 4), (1, 10, 11, 12, 13, 14),
      (2, 20, 21, 22, 23, 24), (3, 30, 31, 32, 33, 34))
      .toDF("pk", "c1", "c2", "c3", "c4", "c5")
      .createOrReplaceTempView("one_pk")
    Seq((0, 0, 0, 1, 2, 3, 4), (0, 1, 10, 11, 12, 13, 14),
      (1, 0, 20, 21, 22, 23, 24), (1, 1, 30, 31, 32, 33, 34))
      .toDF("pk1", "pk2", "c1", "c2", "c3", "c4", "c5")
      .createOrReplaceTempView("two_pk")
    new Engine(spark)
  }

  private def norm(v: Any): Any = v match {
    case null => null
    case b: Byte => BigDecimal(b.toInt)
    case s: Short => BigDecimal(s.toInt)
    case i: Int => BigDecimal(i)
    case l: Long => BigDecimal(l)
    case f: Float => BigDecimal(f.toDouble)
    case d: Double => BigDecimal(d)
    case d: java.math.BigDecimal => BigDecimal(d)
    case other => other
  }

  private def check(sql: String, expected: Seq[Seq[Any]]): Unit = {
    val got = engine.query(sql).collect()
      .map(r => (0 until r.length).map(i => norm(r.get(i))).toSeq).toSeq
    val want = expected.map(_.map(norm))
    val ordered = sql.toLowerCase.contains("order by")
    val (g, w) =
      if (ordered) (got, want)
      else (got.sortBy(GoNorm.sortKeyRow), want.sortBy(GoNorm.sortKeyRow))
    assert(g == w, s"\nquery: $sql\ngot:  $g\nwant: $w")
  }

  test("subquery-in-join-filter cases (join_queries.go:23-103)") {
    // DIVERGENCE: join_queries.go:23-48 correlate the INNERMOST subquery
    // to the OUTERMOST scope (`... where b = (select y from xy where y in
    // (select v from uv where v = b))` — `b` two nesting levels out).
    // Catalyst resolves correlation one level deep only
    // (UNRESOLVED_COLUMN); pinned here so the gap is tracked. The
    // equivalent one-level form returns the reference's rows.
    intercept[org.apache.spark.sql.AnalysisException] {
      engine.query("select * from ab where b in (select y from xy where y in (select v from uv where v = b))").collect()
    }
    check("select * from ab where b in (select y from xy where y in (select v from uv where v = y))",
      Seq(Seq(0, 2), Seq(1, 2), Seq(2, 2), Seq(3, 1)))
    check("SELECT (SELECT 1 FROM (SELECT x FROM xy INNER JOIN uv ON (x = u OR y = v) LIMIT 1) r) AS s FROM xy",
      Seq(Seq(1), Seq(1), Seq(1), Seq(1)))
    check("select a from ab where exists (select 1 from xy where a = x)",
      Seq(Seq(0), Seq(1), Seq(2), Seq(3)))
    check("select a from ab where exists (select 1 from xy where a = x and b = 2 and y = 2)",
      Seq(Seq(0)))
    check("select * from uv where exists (select 1, count(a) from ab where u = a group by a)",
      Seq(Seq(0, 1), Seq(1, 1), Seq(2, 2), Seq(3, 2)))
  }

  test("exists over join in derived tables (join_queries.go:107-180)") {
    check("""select * from
              (select * from ab left join uv on a = u
               where exists (select * from pq where u = p)) alias2
              inner join xy on a = x""",
      Seq(Seq(0, 2, 0, 1, 0, 2), Seq(1, 2, 1, 1, 1, 0),
        Seq(2, 2, 2, 2, 2, 1), Seq(3, 1, 3, 2, 3, 3)))
    check("""select * from ab where exists
              (select * from uv left join pq on u = p where a = u)""",
      Seq(Seq(0, 2), Seq(1, 2), Seq(2, 2), Seq(3, 1)))
    check("""select * from
              (select * from ab where not exists (select * from uv where a = v)) alias1
              where exists (select * from xy where a = x)""",
      Seq(Seq(0, 2), Seq(3, 1)))
    check("""select * from
              (select * from ab inner join xy on true) alias1
              inner join uv on true
              inner join pq on true order by 1,2,3,4,5,6,7,8 limit 5""",
      Seq(Seq(0, 2, 0, 2, 0, 1, 0, 0), Seq(0, 2, 0, 2, 0, 1, 1, 1),
        Seq(0, 2, 0, 2, 0, 1, 2, 2), Seq(0, 2, 0, 2, 0, 1, 3, 3),
        Seq(0, 2, 0, 2, 1, 1, 0, 0)))
    check("""select * from
              (select * from ab where not exists (select * from xy where a = y+1)) alias1
              left join pq on alias1.a = p
              where exists (select * from uv where a = u)""",
      Seq(Seq(0, 2, 0, 0)))
    check("""SELECT mytable.i FROM mytable
             INNER JOIN othertable ON (mytable.i = othertable.i2)
             LEFT JOIN othertable T4 ON (mytable.i = T4.i2)
             ORDER BY othertable.i2, T4.s2""",
      Seq(Seq(1), Seq(2), Seq(3)))
  }

  test("cross join as subquery expression / alias (join_queries.go:190-290)") {
    check("select 1, 2, 3, (select 1 + count(*) from one_pk_three_idx a cross join one_pk_three_idx b)",
      Seq(Seq(1, 2, 3, 65)))
    check("select pk, v1, v2 from one_pk_three_idx where v1 in (select max(a.v1) from one_pk_three_idx a cross join (select 'foo' from dual) b)",
      Seq(Seq(7, 4, 4)))
    check("select * from (select a.v1, b.v2 from one_pk_three_idx a cross join one_pk_three_idx b) dt order by 1 desc, 2 desc limit 5",
      Seq(Seq(4, 4), Seq(4, 3), Seq(4, 2), Seq(4, 1), Seq(4, 0)))
    check("select a.pk, c.v2 from one_pk_three_idx a cross join one_pk_three_idx b left join one_pk_three_idx c on b.pk = c.v2 where b.pk = 0 and a.v2 = 1",
      Seq(Seq(2, 0), Seq(2, 0), Seq(2, 0), Seq(2, 0)))
    check("select a.pk, c.v2 from one_pk_three_idx a cross join one_pk_three_idx b right join one_pk_three_idx c on b.pk = c.v3 where b.pk = 0 and c.v2 = 0 order by a.pk",
      (0 to 7).flatMap(i => Seq(Seq(i, 0), Seq(i, 0))))
    check("select a.pk, c.v2 from one_pk_three_idx a cross join one_pk_three_idx b inner join (select * from one_pk_three_idx where v2 = 0) c on b.pk = c.v3 where b.pk = 0 and c.v2 = 0 order by a.pk",
      (0 to 7).flatMap(i => Seq(Seq(i, 0), Seq(i, 0))))
    check("select a.pk, c.v2 from one_pk_three_idx a cross join one_pk_three_idx b left join one_pk_three_idx c on b.pk = c.v1+1 where b.pk = 0 order by a.pk",
      (0 to 7).map(i => Seq(i, null)))
    check("select a.pk, c.v2 from one_pk_three_idx a cross join one_pk_three_idx b right join one_pk_three_idx c on b.pk = c.v1 where b.pk = 0 and c.v2 = 0 order by a.pk",
      (0 to 7).flatMap(i => Seq(Seq(i, 0), Seq(i, 0))))
  }

  test("mixed cross/left/right join chains over mytable (join_queries.go:295-440)") {
    check("select * from mytable a CROSS JOIN mytable b RIGHT JOIN mytable c ON b.i = c.i + 1 order by 1,2,3,4,5,6",
      Seq(Seq(null, null, null, null, 3, "third row"),
        Seq(1, "first row", 2, "second row", 1, "first row"),
        Seq(1, "first row", 3, "third row", 2, "second row"),
        Seq(2, "second row", 2, "second row", 1, "first row"),
        Seq(2, "second row", 3, "third row", 2, "second row"),
        Seq(3, "third row", 2, "second row", 1, "first row"),
        Seq(3, "third row", 3, "third row", 2, "second row")))
    check("select * from mytable a CROSS JOIN mytable b LEFT JOIN mytable c ON b.i = c.i + 1 order by 1,2,3,4,5,6",
      Seq(Seq(1, "first row", 1, "first row", null, null),
        Seq(1, "first row", 2, "second row", 1, "first row"),
        Seq(1, "first row", 3, "third row", 2, "second row"),
        Seq(2, "second row", 1, "first row", null, null),
        Seq(2, "second row", 2, "second row", 1, "first row"),
        Seq(2, "second row", 3, "third row", 2, "second row"),
        Seq(3, "third row", 1, "first row", null, null),
        Seq(3, "third row", 2, "second row", 1, "first row"),
        Seq(3, "third row", 3, "third row", 2, "second row")))
    check("select a.i, b.i, c.i from mytable a CROSS JOIN mytable b LEFT JOIN mytable c ON b.i+1 = c.i order by 1,2,3",
      Seq(Seq(1, 1, 2), Seq(1, 2, 3), Seq(1, 3, null),
        Seq(2, 1, 2), Seq(2, 2, 3), Seq(2, 3, null),
        Seq(3, 1, 2), Seq(3, 2, 3), Seq(3, 3, null)))
    check("select * from mytable a LEFT JOIN mytable b on a.i = b.i LEFT JOIN mytable c ON b.i = c.i + 1 order by 1,2,3,4,5,6",
      Seq(Seq(1, "first row", 1, "first row", null, null),
        Seq(2, "second row", 2, "second row", 1, "first row"),
        Seq(3, "third row", 3, "third row", 2, "second row")))
    check("select * from mytable a LEFT JOIN  mytable b on a.i = b.i RIGHT JOIN mytable c ON b.i = c.i + 1 order by 1,2,3,4,5,6",
      Seq(Seq(null, null, null, null, 3, "third row"),
        Seq(2, "second row", 2, "second row", 1, "first row"),
        Seq(3, "third row", 3, "third row", 2, "second row")))
    check("select * from mytable a RIGHT JOIN mytable b on a.i = b.i RIGHT JOIN mytable c ON b.i = c.i + 1 order by 1,2,3,4,5,6",
      Seq(Seq(null, null, null, null, 3, "third row"),
        Seq(2, "second row", 2, "second row", 1, "first row"),
        Seq(3, "third row", 3, "third row", 2, "second row")))
    check("select * from mytable a RIGHT JOIN mytable b on a.i = b.i LEFT JOIN mytable c ON b.i = c.i + 1",
      Seq(Seq(1, "first row", 1, "first row", null, null),
        Seq(2, "second row", 2, "second row", 1, "first row"),
        Seq(3, "third row", 3, "third row", 2, "second row")))
    check("select * from mytable a LEFT JOIN mytable b on a.i = b.i LEFT JOIN mytable c ON b.i+1 = c.i",
      Seq(Seq(1, "first row", 1, "first row", 2, "second row"),
        Seq(2, "second row", 2, "second row", 3, "third row"),
        Seq(3, "third row", 3, "third row", null, null)))
    check("select * from mytable a LEFT JOIN  mytable b on a.i = b.i RIGHT JOIN mytable c ON b.i+1 = c.i order by 1,2,3,4,5,6",
      Seq(Seq(null, null, null, null, 1, "first row"),
        Seq(1, "first row", 1, "first row", 2, "second row"),
        Seq(2, "second row", 2, "second row", 3, "third row")))
    check("select * from mytable a RIGHT JOIN mytable b on a.i = b.i RIGHT JOIN mytable c ON b.i+1= c.i order by 1,2,3,4,5,6",
      Seq(Seq(null, null, null, null, 1, "first row"),
        Seq(1, "first row", 1, "first row", 2, "second row"),
        Seq(2, "second row", 2, "second row", 3, "third row")))
    check("select * from mytable a RIGHT JOIN mytable b on a.i = b.i LEFT JOIN mytable c ON b.i+1 = c.i order by 1,2,3,4,5,6",
      Seq(Seq(1, "first row", 1, "first row", 2, "second row"),
        Seq(2, "second row", 2, "second row", 3, "third row"),
        Seq(3, "third row", 3, "third row", null, null)))
    check("select * from mytable a CROSS JOIN mytable b RIGHT JOIN mytable c ON b.i+1 = c.i order by 1,2,3,4,5,6",
      Seq(Seq(null, null, null, null, 1, "first row"),
        Seq(1, "first row", 1, "first row", 2, "second row"),
        Seq(1, "first row", 2, "second row", 3, "third row"),
        Seq(2, "second row", 1, "first row", 2, "second row"),
        Seq(2, "second row", 2, "second row", 3, "third row"),
        Seq(3, "third row", 1, "first row", 2, "second row"),
        Seq(3, "third row", 2, "second row", 3, "third row")))
    check("with a as (select a.i, a.s from mytable a CROSS JOIN mytable b) select * from a RIGHT JOIN mytable c on a.i+1 = c.i-1",
      Seq(Seq(null, null, 1, "first row"), Seq(null, null, 2, "second row"),
        Seq(1, "first row", 3, "third row"), Seq(1, "first row", 3, "third row"),
        Seq(1, "first row", 3, "third row")))
    check("select a.* from mytable a RIGHT JOIN mytable b on a.i = b.i+1 LEFT JOIN mytable c on a.i = c.i-1 RIGHT JOIN mytable d on b.i = d.i",
      Seq(Seq(2, "second row"), Seq(3, "third row"), Seq(null, null)))
    check("select a.*,b.* from mytable a RIGHT JOIN othertable b on a.i = b.i2+1 LEFT JOIN mytable c on a.i = c.i-1 LEFT JOIN othertable d on b.i2 = d.i2",
      Seq(Seq(2, "second row", "third", 1), Seq(3, "third row", "second", 2),
        Seq(null, null, "first", 3)))
    check("select a.*,b.* from mytable a RIGHT JOIN othertable b on a.i = b.i2+1 RIGHT JOIN mytable c on a.i = c.i-1 LEFT JOIN othertable d on b.i2 = d.i2",
      Seq(Seq(null, null, null, null), Seq(null, null, null, null),
        Seq(2, "second row", "third", 1)))
  }

  test("parenthesized join trees over pk tables (join_queries.go:441-500)") {
    check("select i.pk, j.v3 from one_pk_two_idx i JOIN one_pk_three_idx j on i.v1 = j.pk",
      Seq(Seq(0, 0), Seq(1, 1), Seq(2, 0), Seq(3, 2),
        Seq(4, 0), Seq(5, 3), Seq(6, 0), Seq(7, 4)))
    check("select i.pk, j.v3, k.c1 from one_pk_two_idx i JOIN one_pk_three_idx j on i.v1 = j.pk JOIN one_pk k on j.v3 = k.pk",
      Seq(Seq(0, 0, 0), Seq(1, 1, 10), Seq(2, 0, 0), Seq(3, 2, 20),
        Seq(4, 0, 0), Seq(5, 3, 30), Seq(6, 0, 0)))
    check("select i.pk, j.v3 from (one_pk_two_idx i JOIN one_pk_three_idx j on((i.v1 = j.pk)))",
      Seq(Seq(0, 0), Seq(1, 1), Seq(2, 0), Seq(3, 2),
        Seq(4, 0), Seq(5, 3), Seq(6, 0), Seq(7, 4)))
    check("select i.pk, j.v3, k.c1 from ((one_pk_two_idx i JOIN one_pk_three_idx j on ((i.v1 = j.pk))) JOIN one_pk k on((j.v3 = k.pk)))",
      Seq(Seq(0, 0, 0), Seq(1, 1, 10), Seq(2, 0, 0), Seq(3, 2, 20),
        Seq(4, 0, 0), Seq(5, 3, 30), Seq(6, 0, 0)))
    check("select i.pk, j.v3, k.c1 from (one_pk_two_idx i JOIN one_pk_three_idx j on ((i.v1 = j.pk)) JOIN one_pk k on((j.v3 = k.pk)))",
      Seq(Seq(0, 0, 0), Seq(1, 1, 10), Seq(2, 0, 0), Seq(3, 2, 20),
        Seq(4, 0, 0), Seq(5, 3, 30), Seq(6, 0, 0)))
    check("select a.* from one_pk_two_idx a RIGHT JOIN (one_pk_two_idx i JOIN one_pk_three_idx j on i.v1 = j.pk) on a.pk = i.v1 LEFT JOIN (one_pk_two_idx k JOIN one_pk_three_idx l on k.v1 = l.pk) on a.pk = l.v2",
      Seq(Seq(0, 0, 0), Seq(0, 0, 0), Seq(0, 0, 0), Seq(0, 0, 0),
        Seq(1, 1, 1), Seq(2, 2, 2), Seq(3, 3, 3), Seq(4, 4, 4),
        Seq(5, 5, 5), Seq(6, 6, 6), Seq(7, 7, 7)))
  }

  test("join-condition filters against NULLs (join_queries.go:499-570)") {
    check("select a.* from mytable a join mytable b on a.i = b.i and a.i > 2",
      Seq(Seq(3, "third row")))
    check("select a.* from mytable a join mytable b on a.i = b.i and now() >= coalesce(NULL, NULL, now())",
      Seq(Seq(1, "first row"), Seq(2, "second row"), Seq(3, "third row")))
    check("select * from mytable a join niltable b on a.i = b.i and b <=> NULL",
      Seq(Seq(1, "first row", 1, null, null, null)))
    check("select * from mytable a join niltable b on a.i = b.i and s IS NOT NULL",
      Seq(Seq(1, "first row", 1, null, null, null),
        Seq(2, "second row", 2, 2, 1, null),
        Seq(3, "third row", 3, null, 0, null)))
    check("select * from mytable a join niltable b on a.i = b.i and b IS NOT NULL",
      Seq(Seq(2, "second row", 2, 2, 1, null),
        Seq(3, "third row", 3, null, 0, null)))
    check("select * from mytable a join niltable b on a.i = b.i and b != 0",
      Seq(Seq(2, "second row", 2, 2, 1, null)))
    check("select * from mytable a join niltable b on a.i <> b.i and b != 0",
      Seq(Seq(3, "third row", 2, 2, 1, null),
        Seq(1, "first row", 2, 2, 1, null),
        Seq(3, "third row", 5, null, 1, 5.0),
        Seq(2, "second row", 5, null, 1, 5.0),
        Seq(1, "first row", 5, null, 1, 5.0)))
    check("""SELECT pk as pk, nt.i as i, nt2.i as i FROM one_pk
             RIGHT JOIN niltable nt ON pk = nt.i
             RIGHT JOIN niltable nt2 ON pk = nt2.i - 1
             ORDER BY 3""",
      Seq(Seq(null, null, 1), Seq(1, 1, 2), Seq(2, 2, 3),
        Seq(3, 3, 4), Seq(null, null, 5), Seq(null, null, 6)))
  }

  test("FULL JOIN cases (join_queries.go:583-640)") {
    check("select * from ab full join pq on a = p order by 1,2,3,4",
      Seq(Seq(0, 2, 0, 0), Seq(1, 2, 1, 1), Seq(2, 2, 2, 2), Seq(3, 1, 3, 3)))
    check("""select * from ab
             inner join uv on a = u
             full join pq on a = p order by 1,2,3,4,5,6""",
      Seq(Seq(0, 2, 0, 1, 0, 0), Seq(1, 2, 1, 1, 1, 1),
        Seq(2, 2, 2, 2, 2, 2), Seq(3, 1, 3, 2, 3, 3)))
    check("""select * from ab
             full join pq on a = p
             left join xy on a = x order by 1,2,3,4,5,6""",
      Seq(Seq(0, 2, 0, 0, 0, 2), Seq(1, 2, 1, 1, 1, 0),
        Seq(2, 2, 2, 2, 2, 1), Seq(3, 1, 3, 3, 3, 3)))
    check("select * from (select a,v from ab join uv on a=u) av join (select x,q from xy join pq on x = p) xq on av.v = xq.x",
      Seq(Seq(0, 1, 1, 1), Seq(1, 1, 1, 1), Seq(2, 2, 2, 2), Seq(3, 2, 2, 2)))
    check("select x from xy join uv on y = v join ab on y = b and u = -1",
      Seq.empty)
  }

  test("window function cases (queries.go:6741-6935)") {
    check("select i, row_number() over (order by i desc), row_number() over (order by length(s),i) from mytable order by 1",
      Seq(Seq(1, 3, 1), Seq(2, 2, 3), Seq(3, 1, 2)))
    check("select i, row_number() over (order by i desc) from mytable where i = 2 order by 1",
      Seq(Seq(2, 1)))
    check("select row_number() over (order by i desc), row_number() over (order by length(s),i) from mytable order by i",
      Seq(Seq(3, 1), Seq(2, 3), Seq(1, 2)))
    check("select *, row_number() over (order by i desc), row_number() over (order by length(s),i) from mytable order by i",
      Seq(Seq(1, "first row", 3, 1), Seq(2, "second row", 2, 3),
        Seq(3, "third row", 1, 2)))
    check("""select row_number() over (order by i desc),
               row_number() over (order by length(s),i)
             from mytable mt join othertable ot on mt.i = ot.i2
             order by mt.i""",
      Seq(Seq(3, 1), Seq(2, 3), Seq(1, 2)))
    check("select i, row_number() over (order by i desc) as i_num, row_number() over (order by length(s),i) as s_num from mytable order by 1",
      Seq(Seq(1, 3, 1), Seq(2, 2, 3), Seq(3, 1, 2)))
    check("""select i, row_number() over (order by i desc) + 3,
               row_number() over (order by length(s),i) as s_asc,
               row_number() over (order by length(s) desc,i desc) as s_desc
             from mytable order by 1""",
      Seq(Seq(1, 6, 1, 3), Seq(2, 5, 3, 1), Seq(3, 4, 2, 2)))
    check("select pk1, pk2, row_number() over (partition by pk1 order by c1 desc) from two_pk order by 1,2",
      Seq(Seq(0, 0, 2), Seq(0, 1, 1), Seq(1, 0, 2), Seq(1, 1, 1)))
    check("""select pk1, pk2,
               row_number() over (partition by pk1 order by c1 desc),
               row_number() over (partition by pk2 order by 10 - c1)
             from two_pk order by 1,2""",
      Seq(Seq(0, 0, 2, 2), Seq(0, 1, 1, 2), Seq(1, 0, 2, 1), Seq(1, 1, 1, 1)))
    check("""select pk1, pk2,
               row_number() over (partition by pk1 order by c1 desc),
               row_number() over (partition by pk2 order by 10 - c1),
               max(c4) over ()
             from two_pk order by 1,2""",
      Seq(Seq(0, 0, 2, 2, 33), Seq(0, 1, 1, 2, 33),
        Seq(1, 0, 2, 1, 33), Seq(1, 1, 1, 1, 33)))
    check("SELECT pk, row_number() over (partition by v2 order by pk ), max(v3) over (partition by v2 order by pk) FROM one_pk_three_idx ORDER BY pk",
      Seq(Seq(0, 1, 0), Seq(1, 2, 1), Seq(2, 1, 0), Seq(3, 1, 2),
        Seq(4, 3, 1), Seq(5, 4, 3), Seq(6, 1, 0), Seq(7, 1, 4)))
    check("SELECT pk, count(*) over (order by v2) FROM one_pk_three_idx ORDER BY pk",
      Seq(Seq(0, 4), Seq(1, 4), Seq(2, 5), Seq(3, 6),
        Seq(4, 4), Seq(5, 4), Seq(6, 7), Seq(7, 8)))
    check("SELECT pk, count(*) over (partition by v2) FROM one_pk_three_idx ORDER BY pk",
      Seq(Seq(0, 4), Seq(1, 4), Seq(2, 1), Seq(3, 1),
        Seq(4, 4), Seq(5, 4), Seq(6, 1), Seq(7, 1)))
    check("SELECT pk, row_number() over (order by v2, pk), max(pk) over () from one_pk_three_idx ORDER BY pk",
      Seq(Seq(0, 1, 7), Seq(1, 2, 7), Seq(2, 5, 7), Seq(3, 6, 7),
        Seq(4, 3, 7), Seq(5, 4, 7), Seq(6, 7, 7), Seq(7, 8, 7)))
    check("""select i,
               row_number() over (partition by case when i > 2 then "under two" else "over two" end order by i desc) as s_asc
             from mytable order by 1""",
      Seq(Seq(1, 2), Seq(2, 1), Seq(3, 1)))
    check("SELECT ROW_NUMBER() OVER (ORDER BY s2 ASC) idx, i2, s2 FROM othertable WHERE s2 <> 'second' ORDER BY i2 ASC",
      Seq(Seq(2, 1, "third"), Seq(1, 3, "first")))
    check("SELECT * FROM (SELECT ROW_NUMBER() OVER (ORDER BY s2 ASC) idx, i2, s2 FROM othertable ORDER BY i2 ASC) a WHERE s2 <> 'second'",
      Seq(Seq(3, 1, "third"), Seq(1, 3, "first")))
    check("WITH mt (s,i) as (select i, row_number() over (order by i desc) FROM mytable) SELECT s,i FROM mt order by 1",
      Seq(Seq(1, 3), Seq(2, 2), Seq(3, 1)))
  }

  test("constant and parenthesized join conditions (join_queries.go:640-690)") {
    check("""select * from (
               (ab JOIN pq ON (1 = p))
               LEFT OUTER JOIN uv on (2 = u))""",
      Seq(Seq(0, 2, 1, 1, 2, 2), Seq(1, 2, 1, 1, 2, 2),
        Seq(2, 2, 1, 1, 2, 2), Seq(3, 1, 1, 1, 2, 2)))
    check("select * from (ab JOIN pq ON (a = 1)) where a in (1,2,3)",
      Seq(Seq(1, 2, 0, 0), Seq(1, 2, 1, 1), Seq(1, 2, 2, 2), Seq(1, 2, 3, 3)))
    check("select * from (ab JOIN pq ON (a = p)) where a in (select a from ab)",
      Seq(Seq(0, 2, 0, 0), Seq(1, 2, 1, 1), Seq(2, 2, 2, 2), Seq(3, 1, 3, 3)))
    check("select * from (ab JOIN pq ON (a = 1)) where a in (select a from ab)",
      Seq(Seq(1, 2, 0, 0), Seq(1, 2, 1, 1), Seq(1, 2, 2, 2), Seq(1, 2, 3, 3)))
  }
}
