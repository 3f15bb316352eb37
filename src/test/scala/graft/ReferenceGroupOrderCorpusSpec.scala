package graft

import org.scalatest.funsuite.AnyFunSuite

/** GROUP BY / ORDER BY resolution cases ported from the reference's
  * enginetest corpus (enginetest/queries/order_by_group_by_queries.go):
  * ordinal references, aliases in ORDER BY/GROUP BY, aggregates in ORDER
  * BY, HAVING over aliased aggregates, NULL group keys, and parenthesized
  * ORDER BY expressions. Divergences from MySQL's functional-dependency
  * grouping are pinned inline.
  */
class ReferenceGroupOrderCorpusSpec extends AnyFunSuite {
  import SparkSpec.spark
  import spark.implicits._

  private lazy val engine: Engine = {
    Seq((3L, "red"), (4L, "red"), (5L, "orange"), (6L, "orange"),
      (7L, "orange"), (8L, "purple"))
      .toDF("id", "team").createOrReplaceTempView("members")
    Seq((1, "u2"), (2, "u3"), (3, "u4"))
      .toDF("id", "username").createOrReplaceTempView("users")
    Seq((1, 1, "meow", 1647463727L), (2, 1, "purr", 1647463727L),
      (3, 2, "hiss", 1647463727L), (4, 3, "woof", 1647463727L))
      .toDF("id", "user_id", "content", "timestamp")
      .createOrReplaceTempView("tweet")
    Seq((1, Some("foo")), (2, Some("foo")), (3, None))
      .toDF("pk", "c1").createOrReplaceTempView("tnull")
    Seq((Some(1), None: Option[Int]), (None, Some(1)))
      .toDF("c0", "c1").createOrReplaceTempView("t0pair")
    Seq((1, Some(1), Some(1)), (2, None, None), (3, Some(1), None),
      (4, Some(2), Some(1)), (5, None, Some(1)))
      .map { case (a, b, c) => (a, b.map(_.toLong), c.map(_.toLong)) }
      .toDF("id", "c0", "c1").createOrReplaceTempView("t1pair")
    Seq((2, 4), (0, 7), (9, 10), (4, 3))
      .toDF("i", "j").createOrReplaceTempView("tij")
    Seq((3, 1, 3, 1), (4, 1, 7, 2), (5, 2, 9, 3), (6, 2, 1, 3),
      (7, 2, 2, 2), (8, 3, 2, 5))
      .toDF("c0", "c1", "c2", "c3").createOrReplaceTempView("t0quad")
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

  test("ORDER BY over union-of-joins derived table; unknown ORDER BY " +
      "column errors; strict grouping errors (order_by_group_by_queries" +
      ".go:53-131,180-280)") {
    // dolt issue 3016 shape: UNION of two inner joins, grouped and
    // ordered through the derived alias
    check(
      """SELECT t1.username, COUNT(t1.id) AS c FROM
        |  ((SELECT t2.id, t2.content, t3.username FROM tweet AS t2
        |     INNER JOIN users AS t3 ON (-t2.user_id = -t3.id)
        |     WHERE (t3.username = 'u3'))
        |   UNION
        |   (SELECT t4.id, t4.content, `t5`.`username` FROM `tweet` AS t4
        |     INNER JOIN users AS t5 ON (-t4.user_id = -t5.id)
        |     WHERE (t5.username IN ('u2', 'u4')))) AS t1
        |GROUP BY `t1`.`username` ORDER BY 1, 2 DESC""".stripMargin,
      Seq(Seq("u2", 2L), Seq("u3", 1L), Seq("u4", 1L)))
    // unknown ORDER BY column is an analysis error
    assert(intercept[Exception] {
      engine.query(
        "SELECT team, COUNT(*) FROM members GROUP BY team ORDER BY columndoesnotexist")
        .collect()
    }.getMessage.toUpperCase.contains("COLUMNDOESNOTEXIST"))
    // decimal group keys keep their scale through positional grouping
    check(
      "SELECT column_0, sum(column_1) AS s FROM (values row(1.00,1), " +
        "row(1.00,3), row(2,2), row(2,5), row(3,9)) a group by 1 order by 1",
      Seq(Seq(BigDecimal("1.00"), 4L), Seq(BigDecimal("2.00"), 7L),
        Seq(BigDecimal("3.00"), 9L)))
    // ONLY_FULL_GROUP_BY validation (the engine is always strict, like
    // the reference's default sql_mode): non-aggregated columns without
    // GROUP BY / outside the group key are errors
    assert(intercept[Exception] {
      engine.query("select AVG(j), i from tij").collect()
    }.getMessage.nonEmpty)
    assert(intercept[Exception] {
      engine.query("select id, team from members group by team").collect()
    }.getMessage.nonEmpty)
  }

  test("ordinal and alias resolution (order_by_group_by_queries.go:32-48)") {
    check("select team as f from members order by id, f",
      Seq(Seq("red"), Seq("red"), Seq("orange"), Seq("orange"),
        Seq("orange"), Seq("purple")))
    check("SELECT team, COUNT(*) FROM members GROUP BY team ORDER BY 2",
      Seq(Seq("purple", 1), Seq("red", 2), Seq("orange", 3)))
    check("SELECT team, COUNT(*) FROM members GROUP BY 1 ORDER BY 2",
      Seq(Seq("purple", 1), Seq("red", 2), Seq("orange", 3)))
    check("SELECT DISTINCT t1.id as id FROM members AS t1 JOIN members AS t2 ON t1.id = t2.id WHERE t2.id > 0 ORDER BY id",
      Seq(Seq(3), Seq(4), Seq(5), Seq(6), Seq(7), Seq(8)))
    // DIVERGENCE: MySQL resolves `ORDER BY t1.id` through the
    // DISTINCT+alias projection (order_by_group_by_queries.go:63); Spark
    // scopes post-DISTINCT ordering to the output columns only. Pinned.
    intercept[org.apache.spark.sql.AnalysisException] {
      engine.query("SELECT DISTINCT t1.id as id FROM members AS t1 JOIN members AS t2 ON t1.id = t2.id WHERE t2.id > 0 ORDER BY t1.id").collect()
    }
  }

  test("union derived-table group by (order_by_group_by_queries.go:131-165)") {
    check("SELECT t1.username, COUNT(t1.id) AS ct FROM ((SELECT t2.id, t2.content, t3.username FROM tweet AS t2 INNER JOIN users AS t3 ON (-t2.user_id = -t3.id) WHERE (t3.username = 'u3')) UNION (SELECT t4.id, t4.content, `t5`.`username` FROM `tweet` AS t4 INNER JOIN users AS t5 ON (-t4.user_id = -t5.id) WHERE (t5.username IN ('u2', 'u4')))) AS t1 GROUP BY `t1`.`username` ORDER BY 1,2 DESC",
      Seq(Seq("u2", 2), Seq("u3", 1), Seq("u4", 1)))
    check("SELECT COUNT(id) as ct, user_id as uid FROM tweet GROUP BY tweet.user_id ORDER BY COUNT(id), user_id",
      Seq(Seq(1, 2), Seq(1, 3), Seq(2, 1)))
    check("SELECT COUNT(tweet.id) as ct, user_id as uid FROM tweet GROUP BY tweet.user_id ORDER BY COUNT(id), user_id",
      Seq(Seq(1, 2), Seq(1, 3), Seq(2, 1)))
    check("SELECT COUNT(id) as ct, user_id as uid FROM tweet GROUP BY tweet.user_id HAVING COUNT(tweet.id) > 0 ORDER BY COUNT(tweet.id), user_id",
      Seq(Seq(1, 2), Seq(1, 3), Seq(2, 1)))
    check("SELECT COUNT(id) as ct, user_id as uid FROM tweet WHERE tweet.id is NOT NULL GROUP BY tweet.user_id HAVING COUNT(tweet.id) > 0 ORDER BY COUNT(tweet.id), user_id LIMIT 1",
      Seq(Seq(1, 2)))
  }

  test("NULL group keys (order_by_group_by_queries.go:282-305)") {
    check("select c1, count(pk) from tnull group by c1",
      Seq(Seq("foo", 2), Seq(null, 1)))
    check("select c1, count(c1) from tnull group by c1",
      Seq(Seq("foo", 2), Seq(null, 0)))
    // grouping on an alias of a NULL-producing comparison (dolt#9035)
    check("select t0pair.c0 = t0pair.c1 as ref0, sum(1) as ref1 from t0pair group by ref0",
      Seq(Seq(null, 2)))
    check("select t1pair.c0 = t1pair.c1 as ref0, sum(1) as ref1 from t1pair group by ref0",
      Seq(Seq(null, 3), Seq(true, 1), Seq(false, 1)))
  }

  test("parenthesized ORDER BY expressions (order_by_group_by_queries.go:332-352)") {
    check("with cte(i) as (select i from tij) select * from cte order by (i)",
      Seq(Seq(0), Seq(2), Seq(4), Seq(9)))
    check("with cte(i) as (select i from tij) select * from cte order by (((i)))",
      Seq(Seq(0), Seq(2), Seq(4), Seq(9)))
    check("select * from tij order by (i * 10 + j)",
      Seq(Seq(0, 7), Seq(2, 4), Seq(4, 3), Seq(9, 10)))
  }

  test("aggregates and aliases in ORDER BY (order_by_group_by_queries.go:355-405)") {
    check("select c1 from t0quad group by c1 order by min(c2)",
      Seq(Seq(2), Seq(3), Seq(1)))
    check("select c1 as col from t0quad group by c1 order by col",
      Seq(Seq(1), Seq(2), Seq(3)))
    check("select min(c0) as mn, c1 from t0quad group by c1 order by mn",
      Seq(Seq(3, 1), Seq(5, 2), Seq(8, 3)))
    check("select c1 from t0quad group by c1, c2, c3 order by c2, c3",
      Seq(Seq(2), Seq(2), Seq(3), Seq(1), Seq(1), Seq(2)))
    // DIVERGENCE: MySQL resolves `group by c0 order by c2` through
    // functional dependency on the primary key; Spark has no PK
    // metadata on views and requires grouped/aggregated ORDER BY —
    // rejected here (reference order_by_group_by_queries.go:358).
    intercept[org.apache.spark.sql.AnalysisException] {
      engine.query("select c1 from t0quad group by c0 order by c2").collect()
    }
  }

  test("any_value without GROUP BY keeps per-row semantics " +
      "(queries.go:9332, dolt issue 9699)") {
    val s = SparkSpec.spark
    import s.implicits._
    Seq(0, 1, 2, 3).toDF("pk").createOrReplaceTempView("one_pkav")
    val got = engine.query(
      "select any_value(pk), (select max(pk) from one_pkav where pk < opk.pk) as x " +
      "from one_pkav opk order by 1").collect()
      .map(r => (r.getInt(0), if (r.isNullAt(1)) null else r.getInt(1)))
      .toSeq
    assert(got == Seq((0, null), (1, 0), (2, 1), (3, 2)))
    // WITH a group by, any_value stays an aggregate
    val agg = engine.query(
      "select any_value(pk) a from one_pkav group by pk % 2 order by a")
      .collect().map(_.getInt(0)).toSeq
    assert(agg.size == 2)
  }

  test("group-by null handling: NULL is one group, count(col) skips " +
      "nulls (order_by_group_by_queries.go:279, issue 1503)") {
    engine.runScript(
      """create table gbn (pk int primary key, c1 varchar(10));
        |insert into gbn values (1, 'foo'), (2, 'foo'), (3, NULL);
        |""".stripMargin)
    def rows(sql: String): Set[Seq[Any]] =
      engine.query(sql).collect().toSet.map((r: org.apache.spark.sql.Row) => r.toSeq)
    assert(rows("select c1, count(pk) n from gbn group by c1") ==
      Set(Seq("foo", 2L), Seq(null, 1L)))
    assert(rows("select c1, count(c1) n from gbn group by c1") ==
      Set(Seq("foo", 2L), Seq(null, 0L)))
    engine.query("drop table gbn")
  }

  test("group by a 3VL comparison: NULL results form one group " +
      "(order_by_group_by_queries.go:318, issue 9035)") {
    engine.runScript(
      """create table gb3 (id int primary key, c0 int, c1 int);
        |insert into gb3 values (1,NULL,NULL),(2,1,1),(3,1,NULL),(4,2,1),(5,NULL,1);
        |""".stripMargin)
    val got = engine.query(
      "select gb3.c0 = gb3.c1 as ref0, sum(1) as ref1 from gb3 group by ref0")
      .collect().map(r => (if (r.isNullAt(0)) null else r.getBoolean(0),
        r.getLong(1))).toSet
    assert(got == Set((null, 3L), (true, 1L), (false, 1L)))
    engine.query("drop table gb3")
  }

  test("ORDER BY wrapped in parentheses (order_by_group_by_queries.go" +
      ":345, issue 9605)") {
    engine.runScript(
      """create table obp (i int, j int);
        |insert into obp values (2,4),(0,7),(9,10),(4,3);
        |""".stripMargin)
    def col0(sql: String): Seq[Int] =
      engine.query(sql).collect().map(_.getInt(0)).toSeq
    assert(col0("with cte(i) as (select i from obp) select * from cte order by (i)") ==
      Seq(0, 2, 4, 9))
    assert(col0("with cte(i) as (select i from obp) select * from cte order by (((i)))") ==
      Seq(0, 2, 4, 9))
    assert(col0("select * from obp order by (i * 10 + j)") ==
      Seq(0, 2, 4, 9))
    engine.query("drop table obp")
  }

  test("any_value over every projection without GROUP BY returns all " +
      "rows (order_by_group_by_queries.go:220 'group by with " +
      "any_value()')") {
    engine.runScript(
      """create table membersav (id bigint primary key, team text);
        |insert into membersav values (3,'red'), (4,'red'),(5,'orange'),(6,'orange'),(7,'orange'),(8,'purple');
        |""".stripMargin)
    val got = engine.query(
      "select any_value(id), any_value(team) from membersav order by id")
      .collect().map(r => (r.getLong(0), r.getString(1))).toSeq
    assert(got == Seq((3L, "red"), (4L, "red"), (5L, "orange"),
      (6L, "orange"), (7L, "orange"), (8L, "purple")))
    // strict ONLY_FULL_GROUP_BY error shape stays an error without it
    intercept[Exception] {
      engine.query("select id, team from membersav group by team").collect()
    }
    engine.query("drop table membersav")
  }

  test("unary BINARY in GROUP BY / ORDER BY " +
      "(order_by_group_by_queries.go:89, dolt issue 6179)") {
    val s = SparkSpec.spark
    import s.implicits._
    Seq("abc", "def", "abc").toDF("s").createOrReplaceTempView("tbin")
    val got = engine.query(
      "select binary s from tbin group by binary s order by binary s")
      .collect().map(r => new String(r.getAs[Array[Byte]](0))).toSeq
    assert(got == Seq("abc", "def"))
  }

  test("outer-scope aliases and columns in a FROM-less subquery's " +
      "HAVING; inner alias shadows (order_by_group_by_queries.go:70-84, " +
      "dolt issue 4723)") {
    engine.runScript(
      """create table memhav (id bigint primary key, team text);
        |insert into memhav values (3,'red'), (4,'red'),(5,'orange');
        |""".stripMargin)
    def rows(sql: String): Seq[Seq[Any]] =
      engine.query(sql).collect()
        .map(r => (0 until r.length).map(r.get).toSeq).toSeq
    // outer ALIAS visible in the subquery's having
    assert(rows("SELECT id as alias1, (SELECT alias1+1 group by alias1 " +
        "having alias1 > 0) FROM memhav where id < 6") ==
      Seq(Seq(3L, 4L), Seq(4L, 5L), Seq(5L, 6L)))
    // outer COLUMN visible; false HAVING yields NULL
    assert(rows("SELECT id, (SELECT UPPER(team) having id > 3) as " +
        "upper_team FROM memhav where id < 6") ==
      Seq(Seq(3L, null), Seq(4L, "RED"), Seq(5L, "ORANGE")))
    // inner alias shadows the outer column in the having
    assert(rows("SELECT id, (SELECT -1 as id having id < 10) as " +
        "upper_team FROM memhav where id < 6") ==
      Seq(Seq(3L, -1), Seq(4L, -1), Seq(5L, -1)))
    engine.query("drop table memhav")
  }

  test("group by decimal VALUES columns; IF(cond, TRUE, intcol) alias " +
      "grouping; 3VL comparison group keys (order_by_group_by_queries" +
      ".go:173,312,320-340)") {
    def rows(sql: String): Seq[Seq[Any]] =
      engine.query(sql).collect()
        .map(r => (0 until r.length).map(r.get).toSeq).toSeq
    // decimal unification across VALUES rows: 2 -> 2.00
    val dec = rows("SELECT column_0, sum(column_1) AS s FROM (values " +
      "row(1.00,1), row(1.00,3), row(2,2), row(2,5), row(3,9)) a " +
      "group by 1 order by 1")
    assert(dec.map(r => (r(0).toString, r(1))) ==
      Seq(("1.00", 4L), ("2.00", 7L), ("3.00", 9L)))
    // MySQL TRUE in an IF branch is the integer 1: both rows land in
    // group ref0 = 1
    engine.runScript(
      """create table tgb0(c0 int);
        |insert into tgb0(c0) values(1),(123);
        |""".stripMargin)
    assert(rows("select if(tgb0.c0 = 123, TRUE, tgb0.c0) AS ref0, " +
        "min(tgb0.c0) as ref1 from tgb0 group by ref0") ==
      Seq(Seq(1, 1)))
    // NULL-valued comparison keys form one group (dolt issue 9035)
    engine.runScript(
      """create table tgb1(c0 int, c1 int);
        |insert into tgb1(c0, c1) values(NULL,1),(1,NULL);
        |create table tgb2(id int primary key, c0 int, c1 int);
        |insert into tgb2(id, c0, c1) values(1,NULL,NULL),(2,1,1),(3,1,NULL),(4,2,1),(5,NULL,1);
        |""".stripMargin)
    assert(rows("select tgb1.c0 = tgb1.c1 as ref0, sum(1) as ref1 " +
        "from tgb1 group by ref0") == Seq(Seq(null, 2L)))
    assert(rows("select tgb2.c0 = tgb2.c1 as ref0, sum(1) as ref1 " +
        "from tgb2 group by ref0 order by ref0").map(_.toList) ==
      Seq(List(null, 3L), List(false, 1L), List(true, 1L)))
    // binary-typed group keys count and order bytewise (dolt 6179)
    engine.runScript(
      """create table tgbb (b binary(3));
        |insert into tgbb values ('abc'), ('abc'), ('def'), ('abc'), ('def');
        |""".stripMargin)
    assert(rows("select count(b) c, b from tgbb group by b order by b")
      .map { r => (r(0), new String(r(1).asInstanceOf[Array[Byte]])) } ==
      Seq((3L, "abc"), (2L, "def")))
    engine.runScript(
      "drop table tgb0; drop table tgb1; drop table tgb2; drop table tgbb;")
  }
}
