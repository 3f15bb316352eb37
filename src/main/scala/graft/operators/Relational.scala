package graft.operators

import graft.{Det, QueryDef, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Core relational operators: scans, projections, filters, aggregation,
  * sorting/limits, distinct — SURVEY.md §2.1, §2.2, §2.4, §2.6.
  *
  * Reference shapes: `Project` (sql/plan/project.go:27), `Filter`
  * (sql/plan/filter.go:22), `GroupBy` (sql/plan/group_by.go:31, hash agg in
  * sql/rowexec/agg.go:113), `Sort`/`TopN` (sql/plan/sort.go:30,132),
  * `Distinct` (sql/plan/distinct.go:23), `Limit`/`Offset`
  * (sql/plan/limit.go:22, offset.go:22), `Values` (sql/plan/values.go:173),
  * `Having`. All are declared via the DataFrame API so Catalyst handles
  * pushdown, pruning, partial aggregation and TakeOrderedAndProject.
  */
object Relational {
  import Det._

  private def li(s: SparkSession, d: String) = Tables.t(s, d, "lineitem")
  private def ord(s: SparkSession, d: String) = Tables.t(s, d, "orders")

  val defs: Seq[QueryDef] = Seq(

    // ---- scan + projection + filter pushdown (ResolvedTable + Project + Filter)
    QueryDef(
      "scan_project_filter",
      (s, d) =>
        li(s, d)
          .filter(col("l_quantity") > 45 && col("l_returnflag") === "R")
          .select(col("l_orderkey"), col("l_linenumber"), col("l_extendedprice"))
          .orderBy(col("l_orderkey"), col("l_linenumber"), col("l_extendedprice")),
      Some("""SELECT l_orderkey, l_linenumber, l_extendedprice
              FROM lineitem WHERE l_quantity > 45 AND l_returnflag = 'R'
              ORDER BY l_orderkey, l_linenumber, l_extendedprice""")),

    // ---- complex predicates: BETWEEN, IN, LIKE, CASE, boolean logic
    QueryDef(
      "filter_predicates",
      (s, d) =>
        li(s, d)
          .filter(
            col("l_quantity").between(10, 20) &&
              col("l_returnflag").isin("A", "N") &&
              col("l_linestatus").like("F%") &&
              !(col("l_discount") < lit(0.02)))
          .select(
            col("l_orderkey"), col("l_linenumber"),
            when(col("l_tax") > 0.04, lit("high"))
              .when(col("l_tax") > 0.02, lit("mid"))
              .otherwise(lit("low")).as("tax_band"))
          .orderBy(col("l_orderkey"), col("l_linenumber"), col("tax_band")),
      Some("""SELECT l_orderkey, l_linenumber,
                CASE WHEN l_tax > 0.04 THEN 'high'
                     WHEN l_tax > 0.02 THEN 'mid'
                     ELSE 'low' END AS tax_band
              FROM lineitem
              WHERE l_quantity BETWEEN 10 AND 20
                AND l_returnflag IN ('A','N')
                AND l_linestatus LIKE 'F%'
                AND NOT (l_discount < 0.02)
              ORDER BY l_orderkey, l_linenumber, tax_band""")),

    // ---- flagship: TPC-H Q1-style hash aggregation with exact-decimal sums
    QueryDef(
      "q1_agg",
      (s, d) =>
        li(s, d)
          .filter(col("l_shipdate") <= lit("1998-09-02"))
          .groupBy(col("l_returnflag"), col("l_linestatus"))
          .agg(
            dsum(col("l_quantity")).as("sum_qty"),
            dsum(col("l_extendedprice")).as("sum_base_price"),
            sum(col("l_extendedprice").cast(DecimalType(12, 2)) *
              (lit(1) - col("l_discount").cast(DecimalType(4, 2))))
              .cast("double").as("sum_disc_price"),
            davg(col("l_quantity")).as("avg_qty"),
            davg(col("l_extendedprice")).as("avg_price"),
            davg(col("l_discount")).as("avg_disc"),
            count(lit(1)).as("count_order"))
          .orderBy(col("l_returnflag"), col("l_linestatus")),
      Some(s"""SELECT l_returnflag, l_linestatus,
                 ${sqlSum("l_quantity")} AS sum_qty,
                 ${sqlSum("l_extendedprice")} AS sum_base_price,
                 CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) *
                          (1 - CAST(l_discount AS DECIMAL(4,2)))) AS DOUBLE)
                   AS sum_disc_price,
                 ${sqlAvg("l_quantity")} AS avg_qty,
                 ${sqlAvg("l_extendedprice")} AS avg_price,
                 ${sqlAvg("l_discount")} AS avg_disc,
                 COUNT(*) AS count_order
               FROM lineitem WHERE l_shipdate <= '1998-09-02'
               GROUP BY l_returnflag, l_linestatus
               ORDER BY l_returnflag, l_linestatus""".stripMargin),
      headline = true),

    // ---- global aggregation, no grouping keys (groupByIter path)
    QueryDef(
      "agg_global",
      (s, d) =>
        li(s, d).agg(
          count(lit(1)).as("n_rows"),
          countDistinct(col("l_orderkey")).as("n_orders"),
          dsum(col("l_quantity")).as("total_qty"),
          min(col("l_shipdate")).cast("date").as("min_ship"),
          max(col("l_shipdate")).cast("date").as("max_ship")),
      Some("""SELECT COUNT(*) AS n_rows,
                COUNT(DISTINCT l_orderkey) AS n_orders,
                CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS total_qty,
                CAST(MIN(l_shipdate) AS DATE) AS min_ship,
                CAST(MAX(l_shipdate) AS DATE) AS max_ship
              FROM lineitem""")),

    // ---- HAVING (post-aggregation filter)
    QueryDef(
      "having_filter",
      (s, d) =>
        ord(s, d)
          .groupBy(col("o_custkey"))
          .agg(count(lit(1)).as("n_orders"), dsum(col("o_totalprice")).as("spend"))
          .filter(col("n_orders") >= 3)
          .orderBy(col("o_custkey")),
      Some(s"""SELECT o_custkey, COUNT(*) AS n_orders,
                 ${sqlSum("o_totalprice")} AS spend
               FROM orders GROUP BY o_custkey HAVING COUNT(*) >= 3
               ORDER BY o_custkey""")),

    // ---- DISTINCT (hash dedupe)
    QueryDef(
      "distinct_op",
      (s, d) =>
        li(s, d).select(col("l_returnflag"), col("l_linestatus")).distinct()
          .orderBy(col("l_returnflag"), col("l_linestatus")),
      Some("""SELECT DISTINCT l_returnflag, l_linestatus FROM lineitem
              ORDER BY l_returnflag, l_linestatus""")),

    // ---- TopN (Sort+Limit fused -> TakeOrderedAndProject)
    QueryDef(
      "topn",
      (s, d) =>
        ord(s, d)
          .orderBy(col("o_totalprice").desc, col("o_orderkey"))
          .select(col("o_orderkey"), col("o_totalprice"))
          .limit(25),
      Some("""SELECT o_orderkey, o_totalprice FROM orders
              ORDER BY o_totalprice DESC, o_orderkey LIMIT 25"""),
      headline = true),

    // ---- LIMIT + OFFSET
    QueryDef(
      "limit_offset",
      (s, d) =>
        ord(s, d)
          .orderBy(col("o_orderkey"))
          .select(col("o_orderkey"), col("o_orderstatus"))
          .offset(10).limit(15),
      Some("""SELECT o_orderkey, o_orderstatus FROM orders
              ORDER BY o_orderkey LIMIT 15 OFFSET 10""")),

    // ---- multi-key sort with explicit null placement (MySQL: NULLs first ASC)
    QueryDef(
      "sort_multikey",
      (s, d) =>
        li(s, d)
          .select(
            col("l_orderkey"), col("l_linenumber"),
            when(col("l_quantity") > 48, lit(null).cast("double"))
              .otherwise(col("l_discount")).as("d_nullable"))
          .orderBy(
            col("d_nullable").asc_nulls_first,
            col("l_orderkey").desc,
            col("l_linenumber")),
      Some("""SELECT l_orderkey, l_linenumber,
                CASE WHEN l_quantity > 48 THEN NULL ELSE l_discount END AS d_nullable
              FROM lineitem
              ORDER BY d_nullable ASC NULLS FIRST, l_orderkey DESC, l_linenumber""")),

    // ---- Values / literal row source
    QueryDef(
      "values_inline",
      (s, _) => {
        import s.implicits._
        Seq((1, "a"), (2, "b"), (3, "c"))
          .toDF("id", "tag")
          .orderBy(col("id"))
      },
      Some("SELECT * FROM (VALUES (1,'a'),(2,'b'),(3,'c')) AS t(id, tag) ORDER BY id")),

    // ---- EmptyTable / dual: no-FROM SELECT (reference resolves a missing
    //      FROM to the 1-row dual table, sql/planbuilder/from.go; Spark's
    //      OneRowRelation is the same shape). `IF(1, …)` additionally
    //      exercises MySQL numeric truthiness through the Engine front door.
    QueryDef(
      "select_no_from",
      (s, _) => new graft.Engine(s).query(
        """SELECT CAST(1 + 1 AS BIGINT) AS two, CAST(7 DIV 2 AS BIGINT) AS quot,
             CONCAT('du', 'al') AS src, IF(1, 'y', 'n') AS truthy"""),
      Some("""SELECT CAST(2 AS BIGINT) AS two, CAST(3 AS BIGINT) AS quot,
                'dual' AS src, 'y' AS truthy""")),

    // ---- empty relation semantics: aggregates over zero rows (COUNT=0,
    //      SUM/MAX=NULL — reference sql/plan/emptytable.go feeding GroupBy).
    //      `WHERE 0` runs through the numeric-truthiness rewrite.
    QueryDef(
      "empty_relation",
      (s, d) => {
        Tables.register(s, d, "nation")
        new graft.Engine(s).query(
          """SELECT COUNT(*) AS n, CAST(SUM(n_nationkey) AS BIGINT) AS s,
               MAX(n_name) AS m
             FROM nation WHERE 0""")
      },
      Some("""SELECT COUNT(*) AS n, CAST(SUM(n_nationkey) AS BIGINT) AS s,
                MAX(n_name) AS m
              FROM nation WHERE 1 = 0""")),

    // ---- projection with alias chain (later exprs see earlier aliases,
    //      sql.EvalProjections sql/rows.go:69) -> sequential withColumn
    QueryDef(
      "project_alias_chain",
      (s, d) =>
        li(s, d)
          .withColumn("gross", col("l_extendedprice").cast(DecimalType(12, 2)) *
            (lit(1) - col("l_discount").cast(DecimalType(4, 2))))
          .withColumn("net", col("gross") *
            (lit(1) + col("l_tax").cast(DecimalType(4, 2))))
          .select(
            col("l_orderkey"), col("l_linenumber"),
            col("gross").cast("double").as("gross"),
            col("net").cast("double").as("net"))
          .orderBy(col("l_orderkey"), col("l_linenumber"), col("gross"))
          .limit(1000),
      Some("""SELECT l_orderkey, l_linenumber,
                CAST(gross AS DOUBLE) AS gross, CAST(net AS DOUBLE) AS net
              FROM (
                SELECT l_orderkey, l_linenumber,
                  CAST(l_extendedprice AS DECIMAL(12,2)) *
                    (1 - CAST(l_discount AS DECIMAL(4,2))) AS gross,
                  CAST(l_extendedprice AS DECIMAL(12,2)) *
                    (1 - CAST(l_discount AS DECIMAL(4,2))) *
                    (1 + CAST(l_tax AS DECIMAL(4,2))) AS net
                FROM lineitem)
              ORDER BY l_orderkey, l_linenumber, gross LIMIT 1000""")),

    // ---- COUNT(*) fast path (reference TableCountLookup via
    //      replaceCountStar sql/analyzer/replace_count_star.go:31 answers
    //      from table metadata). Spark's scan reads only parquet footers
    //      for a count-star: zero data columns are materialized.
    QueryDef(
      "count_star",
      (s, d) =>
        Tables.t(s, d, "lineitem").agg(count(lit(1)).as("n")),
      Some("SELECT COUNT(*) AS n FROM lineitem")),

    // ---- JSON_TABLE (reference sql/plan/json_table.go:113 — explode a
    //      JSON document into rows/columns by path). Spark-first: from_json
    //      to array<struct> + explode (a Generator, exactly the custom-UDTF
    //      slot SURVEY §2.11 reserves); schema projection happens inside
    //      the generator, so only the requested columns materialize.
    QueryDef(
      "json_table",
      (s, d) => {
        import org.apache.spark.sql.types._
        val ev = Tables.t(s, d, "events")
        val doc = concat(
          lit("""[{"n":1,"v":""""), col("event_type"),
          lit(""""},{"n":2,"v":""""), upper(col("event_type")), lit(""""}]"""))
        val schema = ArrayType(StructType(Seq(
          StructField("n", IntegerType), StructField("v", StringType))))
        ev.select(col("event_id"),
            explode(from_json(doc, schema)).as("j"))
          .select(col("event_id"), col("j.n").as("n"), col("j.v").as("v"))
          .orderBy(col("event_id"), col("n"))
      },
      Some("""SELECT event_id, n, v FROM (
                SELECT event_id, 1 AS n, event_type AS v FROM events
                UNION ALL
                SELECT event_id, 2 AS n, upper(event_type) AS v FROM events)
              ORDER BY event_id, n""")),

    // ---- JSON_TABLE full form (reference sql/plan/json_table.go
    //      JSONTableCol tree): COLUMNS with FOR ORDINALITY, typed PATH
    //      columns, DEFAULT ... ON EMPTY, EXISTS PATH, and NESTED PATH
    //      (empty nested match set emits one all-NULL nested row, MySQL
    //      semantics) — driven by the graft.plans.JsonTable operator.
    QueryDef(
      "json_table_nested",
      (s, d) => {
        import graft.plans.JsonTable
        val id = col("event_id")
        val doc = concat(
          lit("""{"id":"""), id,
          lit(""","rows":[{"a":"""), id % 7,
          lit(""","tags":["t"""), id % 3, lit("""","u"""), id % 4,
          lit(""""]},{"a":"""), id % 5 + 10, lit(""","tags":[]}]}"""))
        JsonTable(
          Tables.t(s, d, "events"), doc, "$.rows[*]",
          Seq(
            JsonTable.Col("rn", forOrdinality = true),
            JsonTable.Col("a", path = "$.a", colType = "int"),
            JsonTable.Col("has_tags", path = "$.tags[0]", exists = true),
            JsonTable.Col("b", path = "$.b", defaultOnEmpty = Some("none")),
            JsonTable.Col("tags", nestedPath = "$.tags[*]", nested = Seq(
              JsonTable.Col("tn", forOrdinality = true),
              JsonTable.Col("tag", path = "$")))),
          passThrough = Seq("event_id"))
          .orderBy(col("event_id"), col("rn"), col("tn").asc_nulls_last)
      },
      Some("""WITH e AS (
                SELECT event_id,
                       CAST(event_id % 7 AS INT) AS a1,
                       CAST(event_id % 5 + 10 AS INT) AS a2,
                       't' || (event_id % 3) AS t1,
                       'u' || (event_id % 4) AS t2
                FROM events)
              SELECT * FROM (
                SELECT event_id, CAST(1 AS BIGINT) AS rn, a1 AS a,
                       CAST(1 AS INT) AS has_tags, 'none' AS b,
                       CAST(1 AS BIGINT) AS tn, t1 AS tag FROM e
                UNION ALL
                SELECT event_id, 1, a1, 1, 'none', 2, t2 FROM e
                UNION ALL
                SELECT event_id, 2, a2, 0, 'none', NULL, NULL FROM e)
              ORDER BY event_id, rn, tn NULLS LAST"""))
  )
}
