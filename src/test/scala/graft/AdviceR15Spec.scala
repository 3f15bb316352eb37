package graft

import org.scalatest.funsuite.AnyFunSuite

/** Regression tests for the round-15 ADVICE defects. */
class AdviceR15Spec extends AnyFunSuite {
  import SparkSpec.spark
  private lazy val engine = {
    val e = new Engine(spark); e.attachDir(SparkSpec.sfDir); e
  }

  test("FROM inside function calls is not a table factor (error 1066)") {
    // two EXTRACTs / SUBSTRINGs / TRIMs over the same operand are legal
    assert(SqlRewrite.duplicateUnaliasedTable(
      "SELECT EXTRACT(YEAR FROM d), EXTRACT(MONTH FROM d) FROM t").isEmpty)
    assert(SqlRewrite.duplicateUnaliasedTable(
      "SELECT substring(a FROM 2), substring(b FROM 2) FROM t").isEmpty)
    assert(SqlRewrite.duplicateUnaliasedTable(
      "SELECT TRIM(' ' FROM s), TRIM('x' FROM s) FROM t").isEmpty)
    // the real duplicate still errors
    assert(SqlRewrite.duplicateUnaliasedTable(
      "SELECT * FROM t JOIN t ON 1 = 1").contains("t"))
    // aliased repeats stay legal; subquery scopes stay independent
    assert(SqlRewrite.duplicateUnaliasedTable(
      "SELECT * FROM t a JOIN t b ON 1 = 1").isEmpty)
    assert(SqlRewrite.duplicateUnaliasedTable(
      "SELECT * FROM t WHERE x IN (SELECT x FROM t)").isEmpty)
    // end-to-end: twin EXTRACTs run
    val r = engine.query(
      "SELECT EXTRACT(YEAR FROM o_orderdate) AS y, " +
      "EXTRACT(MONTH FROM o_orderdate) AS m FROM orders LIMIT 1").collect()
    assert(r.length == 1)
  }

  test("quantifiedCompare wraps GROUP BY/HAVING/LIMIT/set-op subqueries") {
    // grouped/limited/set-op bodies must NOT have aggregates spliced
    // around their FROM tail (grouped scalar subquery = one row per
    // group); they aggregate over the body as a derived table instead
    for (shape <- Seq(
        "SELECT 1 WHERE 3 > ANY (SELECT y FROM s GROUP BY g)",
        "SELECT 1 WHERE 3 > ALL (SELECT y FROM s GROUP BY g HAVING max(w) > 0)",
        "SELECT 1 WHERE 3 < SOME (SELECT y FROM s LIMIT 1)",
        "SELECT 1 WHERE 3 >= ALL (SELECT y FROM s UNION SELECT z FROM u)")) {
      val out = SqlRewrite.quantifiedCompare(shape)
      assert(out != shape, shape)
      assert(out.contains("__graft_q"), out)
    }
    // plain subquery still rewrites with the direct splice (no wrap)
    val plain = SqlRewrite.quantifiedCompare(
      "SELECT 1 WHERE 3 > ANY (SELECT y FROM s)")
    assert(plain != "SELECT 1 WHERE 3 > ANY (SELECT y FROM s)")
    assert(!plain.contains("__graft_q"))
    // end-to-end: grouped quantifier evaluates the quantifier, not a
    // grouped scalar subquery (one row per group would throw).
    // group maxes by region are {20,21,22,23,24}; > ANY means key > 20.
    val rows = engine.query(
      "SELECT n_name FROM nation WHERE n_nationkey > ANY " +
      "(SELECT max(n_nationkey) FROM nation GROUP BY n_regionkey) " +
      "ORDER BY n_name").collect()
    assert(rows.length == 4)
    // ALL over a grouped body, and = ANY (grouped) via the native IN path
    assert(engine.query(
      "SELECT count(*) AS c FROM nation WHERE n_nationkey <= ALL " +
      "(SELECT max(n_nationkey) FROM nation GROUP BY n_regionkey)")
      .collect()(0).getLong(0) == 21)
    assert(engine.query(
      "SELECT count(*) AS c FROM nation WHERE n_nationkey = ANY " +
      "(SELECT max(n_nationkey) FROM nation GROUP BY n_regionkey)")
      .collect()(0).getLong(0) == 5)
  }

  test("validate_password_strength(column) is NULL on NULL input") {
    val r = engine.query(
      "SELECT validate_password_strength(v) AS s FROM " +
      "(SELECT CAST(NULL AS STRING) AS v UNION ALL SELECT 'abc') " +
      "ORDER BY s NULLS FIRST").collect()
    assert(r(0).isNullAt(0))
    assert(r(1).getInt(0) == 0)
  }

  test("group_concat DISTINCT ORDER BY other column: NULL keys sort first") {
    // MySQL: NULL keys first ASC — the NULL-key row's value wins the
    // duplicate and leads the output
    val gc = engine.query(
      """SELECT group_concat(DISTINCT v ORDER BY k) AS gc FROM (
           SELECT NULL AS k, 'z' AS v
           UNION ALL SELECT 2, 'a'
           UNION ALL SELECT 1, 'z'
           UNION ALL SELECT 3, 'b')""").collect()(0).getString(0)
    assert(gc == "z,a,b")
    // DESC: NULL keys last
    val gcd = engine.query(
      """SELECT group_concat(DISTINCT v ORDER BY k DESC) AS gc FROM (
           SELECT NULL AS k, 'z' AS v
           UNION ALL SELECT 2, 'a'
           UNION ALL SELECT 3, 'b')""").collect()(0).getString(0)
    assert(gcd == "b,a,z")
  }

  test("recursive CTE: expanding delta past the cap hands off, no driver OOM") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    // seed 1 row; each step multiplies by 40 via a cross join with a
    // 40-row local relation — 4 steps = 2.56M rows if collected; the
    // local loop must hand off distributed once a delta exceeds 64k
    val fan = spark.range(40).select(col("id").as("f"))
    val seed = spark.range(1).select(lit(0L).as("depth"))
    val out = graft.plans.RecursiveCte.unionAll(
      seed,
      d => d.filter(col("depth") < 4).crossJoin(fan)
            .select((col("depth") + 1).as("depth")),
      maxDepth = 10)
    // 1 + 40 + 1600 + 64000 + 2560000
    assert(out.count() == 1L + 40 + 1600 + 64000 + 2560000)
  }
}
