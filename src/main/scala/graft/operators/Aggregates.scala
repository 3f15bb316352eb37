package graft.operators

import graft.{Det, QueryDef, Tables}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Aggregation functions — SURVEY.md §2.4 (reference GroupBy
  * sql/plan/group_by.go:31; function impls in
  * sql/expression/function/aggregation/unary_aggs.og.go: Avg:92, BitAnd:171,
  * BitOr:250, BitXor:329, Count:408, Max:724, Min:803, Sum:882,
  * StdDevPop:961..VarSamp:1198; count_distinct.go; group_concat.go).
  *
  * The reference runs a single-process one-pass hash agg; Spark gives
  * partial (map-side) + final aggregation with spill for free. Every money
  * column is aggregated as exact DECIMAL so results are merge-order
  * independent (see [[graft.Det]]).
  */
object Aggregates {
  import Det._

  val defs: Seq[QueryDef] = Seq(

    // ---- COUNT(DISTINCT), multiple distinct aggregates (count_distinct.go)
    QueryDef(
      "agg_count_distinct",
      (s, d) =>
        Tables.t(s, d, "lineitem")
          .groupBy(col("l_returnflag"))
          .agg(
            countDistinct(col("l_suppkey")).as("n_supp"),
            countDistinct(col("l_partkey")).as("n_part"),
            count(lit(1)).as("n_rows"))
          .orderBy(col("l_returnflag")),
      Some("""SELECT l_returnflag, COUNT(DISTINCT l_suppkey) AS n_supp,
                COUNT(DISTINCT l_partkey) AS n_part, COUNT(*) AS n_rows
              FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""")),

    // ---- GROUP_CONCAT(DISTINCT ... ORDER BY ... SEPARATOR)
    //      (group_concat.go) -> sorted collect_set + array_join
    QueryDef(
      "agg_group_concat",
      (s, d) =>
        Tables.t(s, d, "orders")
          .groupBy(col("o_orderpriority"))
          .agg(array_join(array_sort(collect_set(col("o_orderstatus"))), ",")
            .as("statuses"))
          .orderBy(col("o_orderpriority")),
      Some("""SELECT o_orderpriority,
                string_agg(DISTINCT o_orderstatus, ',' ORDER BY o_orderstatus)
                  AS statuses
              FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority""")),

    // ---- BIT_AND / BIT_OR / BIT_XOR (unary_aggs.og.go:171,250,329)
    QueryDef(
      "agg_bitops",
      (s, d) =>
        Tables.t(s, d, "lineitem")
          .groupBy(col("l_returnflag"))
          .agg(
            bit_and(col("l_orderkey")).as("band"),
            bit_or(col("l_orderkey")).as("bor"),
            bit_xor(col("l_orderkey")).as("bxor"))
          .orderBy(col("l_returnflag")),
      Some("""SELECT l_returnflag, BIT_AND(l_orderkey) AS band,
                BIT_OR(l_orderkey) AS bor, BIT_XOR(l_orderkey) AS bxor
              FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""")),

    // ---- STDDEV / VARIANCE (pop+samp) via exact decimal sums so the result
    //      is independent of Spark's partial-aggregate merge order.
    //      var_samp = (sum(x^2) - sum(x)^2/n) / (n-1), evaluated in double
    //      with identical expression shape on the DuckDB side.
    QueryDef(
      "agg_stats",
      (s, d) => {
        val x = col("l_quantity").cast(DecimalType(12, 2))
        val sx = sum(x).cast("double")
        val sxx = sum(x * x).cast("double")
        val n = count(col("l_quantity")).cast("double")
        Tables.t(s, d, "lineitem")
          .groupBy(col("l_returnflag"))
          .agg(
            ((sxx - sx * sx / n) / (n - 1)).as("var_samp"),
            ((sxx - sx * sx / n) / n).as("var_pop"),
            sqrt((sxx - sx * sx / n) / (n - 1)).as("stddev_samp"),
            sqrt((sxx - sx * sx / n) / n).as("stddev_pop"))
          .orderBy(col("l_returnflag"))
      },
      Some("""WITH m AS (
                SELECT l_returnflag,
                  CAST(SUM(CAST(l_quantity AS DECIMAL(12,2)) *
                           CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sxx,
                  CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sx,
                  CAST(COUNT(l_quantity) AS DOUBLE) AS n
                FROM lineitem GROUP BY l_returnflag)
              SELECT l_returnflag,
                (sxx - sx*sx/n) / (n-1) AS var_samp,
                (sxx - sx*sx/n) / n     AS var_pop,
                sqrt((sxx - sx*sx/n) / (n-1)) AS stddev_samp,
                sqrt((sxx - sx*sx/n) / n)     AS stddev_pop
              FROM m ORDER BY l_returnflag""")),

    // ---- MIN_BY / MAX_BY: deterministic stand-ins for the order-dependent
    //      FIRST/LAST/ANY_VALUE family (unary_aggs.og.go:13,487,645)
    QueryDef(
      "agg_min_max_by",
      (s, d) => {
        // composite integer ordering key (price cents, orderkey) so the
        // argmin/argmax is total even when two orders share a price
        val key = floor(col("o_totalprice") * 100).cast("long") * 10000000L +
          col("o_orderkey")
        Tables.t(s, d, "orders")
          .groupBy(col("o_orderpriority"))
          .agg(
            min_by(col("o_orderkey"), key).as("cheapest_order"),
            max_by(col("o_orderkey"), key).as("priciest_order"),
            min(col("o_totalprice")).as("min_price"),
            max(col("o_totalprice")).as("max_price"))
          .orderBy(col("o_orderpriority"))
      },
      Some("""SELECT o_orderpriority,
                arg_min(o_orderkey, CAST(FLOOR(o_totalprice*100) AS BIGINT)*10000000 + o_orderkey)
                  AS cheapest_order,
                arg_max(o_orderkey, CAST(FLOOR(o_totalprice*100) AS BIGINT)*10000000 + o_orderkey)
                  AS priciest_order,
                MIN(o_totalprice) AS min_price, MAX(o_totalprice) AS max_price
              FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority""")),

    // ---- AVG + SUM per group over a computed expression
    QueryDef(
      "agg_avg_expr",
      (s, d) =>
        Tables.t(s, d, "part")
          .groupBy(col("p_brand"))
          .agg(
            davg(col("p_retailprice")).as("avg_price"),
            dsum(col("p_retailprice")).as("sum_price"),
            min(col("p_size")).as("min_size"),
            max(col("p_size")).as("max_size"))
          .orderBy(col("p_brand")),
      Some(s"""SELECT p_brand, ${sqlAvg("p_retailprice")} AS avg_price,
                 ${sqlSum("p_retailprice")} AS sum_price,
                 MIN(p_size) AS min_size, MAX(p_size) AS max_size
               FROM part GROUP BY p_brand ORDER BY p_brand""")),

    // ---- PIVOT: wide conditional aggregation (Spark-native upgrade of
    //      the CASE-WHEN-per-column pattern the reference corpus uses).
    //      Pivot values are declared, so the plan is a single pass — no
    //      per-value scans.
    QueryDef(
      "agg_pivot",
      (s, d) =>
        Tables.t(s, d, "lineitem")
          .groupBy(col("l_returnflag"))
          .pivot("l_linestatus", Seq("F", "O"))
          .agg(dsum(col("l_quantity")))
          .na.fill(0.0)
          .orderBy(col("l_returnflag")),
      Some(s"""SELECT l_returnflag,
                 COALESCE(${sqlSum("CASE WHEN l_linestatus = 'F' THEN l_quantity END")}, 0)
                   AS F,
                 COALESCE(${sqlSum("CASE WHEN l_linestatus = 'O' THEN l_quantity END")}, 0)
                   AS O
               FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""")),

    // ---- approximate distinct (HLL++). The reference has no approx
    //      aggregates (SURVEY §2.4) — at 100 TB the sketch replaces the
    //      exact-distinct shuffle with a mergeable constant-size buffer.
    //      NOTE: this *verification* query deliberately pays the exact
    //      COUNT(DISTINCT) cost alongside the sketch, because sketch
    //      estimates differ across engines: the oracle can only check the
    //      engine-agnostic contract (exact distincts, which both engines
    //      compute identically, plus the HLL estimate landing within 3×rsd
    //      of exact — a boolean both sides agree on). The sketch-only
    //      100 TB pattern and its rsd bound are pinned by ApproxSpec,
    //      which runs approx_count_distinct without the exact columns.
    QueryDef(
      "agg_approx_distinct",
      (s, d) =>
        Tables.t(s, d, "lineitem")
          .groupBy(col("l_returnflag"))
          .agg(
            countDistinct(col("l_partkey")).as("exact_parts"),
            countDistinct(col("l_suppkey")).as("exact_supps"),
            (abs(approx_count_distinct(col("l_partkey"), 0.05).cast("double") /
              countDistinct(col("l_partkey")).cast("double") - 1.0) < 0.15)
              .as("parts_within_tol"),
            (abs(approx_count_distinct(col("l_suppkey"), 0.05).cast("double") /
              countDistinct(col("l_suppkey")).cast("double") - 1.0) < 0.15)
              .as("supps_within_tol"))
          .orderBy(col("l_returnflag")),
      Some("""SELECT l_returnflag,
                COUNT(DISTINCT l_partkey) AS exact_parts,
                COUNT(DISTINCT l_suppkey) AS exact_supps,
                TRUE AS parts_within_tol,
                TRUE AS supps_within_tol
              FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""")),

    // ---- salted two-stage aggregation — the 100 TB skew pattern. A
    //      3-value grouping key (l_returnflag) would funnel a third of the
    //      table through one reducer; salting spreads each hot key across
    //      16 partial groups, then a second (tiny) aggregation merges the
    //      partials. Result is identical to the direct groupBy, which is
    //      what the oracle verifies. (Spark's map-side partial agg already
    //      mitigates this for algebraic aggs; the explicit salt is the
    //      shape needed for holistic aggs or extreme cardinality skew.)
    QueryDef(
      "agg_salted",
      (s, d) => {
        val partial = Tables.t(s, d, "lineitem")
          .withColumn("salt", pmod(col("l_orderkey"), lit(16)))
          .groupBy(col("l_returnflag"), col("salt"))
          .agg(
            count(lit(1)).as("n_part"),
            sum(col("l_quantity").cast(DecimalType(18, 2))).as("qty_part"))
        partial.groupBy(col("l_returnflag"))
          .agg(
            sum(col("n_part")).as("n_rows"),
            sum(col("qty_part")).cast("double").as("sum_qty"))
          .orderBy(col("l_returnflag"))
      },
      Some(s"""SELECT l_returnflag, COUNT(*) AS n_rows,
                 ${sqlSum("l_quantity")} AS sum_qty
               FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""")),

    // ---- JSON aggregates (reference JSON_ARRAYAGG
    //      sql/expression/function/aggregation/unary_aggs.og.go:566,
    //      JSON_OBJECTAGG json_agg.go) + ANY_VALUE (:13). Spark-first:
    //      to_json over collect_list/map_from_entries — partial aggregation
    //      (map-side combine) still applies to the list buffers. Sorted
    //      inside each group for run-to-run determinism under parallel merge.
    QueryDef(
      "agg_json",
      (s, d) => {
        val counts = Tables.t(s, d, "orders")
          .groupBy(col("o_orderpriority"), col("o_orderstatus"))
          .agg(count(lit(1)).cast("int").as("cnt"),
            min(col("o_orderkey")).as("min_key"))
        counts.groupBy(col("o_orderpriority"))
          .agg(
            to_json(sort_array(collect_list(col("min_key")))).as("keys_arr"),
            to_json(map_from_entries(sort_array(
              collect_list(struct(col("o_orderstatus"), col("cnt"))))))
              .as("status_obj"),
            any_value(upper(col("o_orderpriority"))).as("any_upper"))
          .orderBy(col("o_orderpriority"))
      },
      Some("""WITH counts AS (
                SELECT o_orderpriority, o_orderstatus,
                       CAST(count(*) AS INT) AS cnt,
                       min(o_orderkey) AS min_key
                FROM orders GROUP BY o_orderpriority, o_orderstatus)
              SELECT o_orderpriority,
                to_json(list_sort(list(min_key))) AS keys_arr,
                '{' || string_agg('"' || o_orderstatus || '":' || cnt,
                                  ',' ORDER BY o_orderstatus) || '}'
                  AS status_obj,
                upper(o_orderpriority) AS any_upper
              FROM counts GROUP BY o_orderpriority
              ORDER BY o_orderpriority""")),

    // ---- ROLLUP: hierarchical subtotals. The reference has no grouping
    //      sets (SURVEY §2.4: planbuilder/aggregates.go:91 builds plain
    //      GROUP BY only) — this is the free Spark upgrade noted there.
    //      grouping_id() disambiguates subtotal rows (bit per column, first
    //      column = MSB, same encoding in Spark and DuckDB's grouping()).
    QueryDef(
      "agg_rollup",
      (s, d) =>
        Tables.t(s, d, "lineitem")
          .rollup(col("l_returnflag"), col("l_linestatus"))
          .agg(
            count(lit(1)).as("cnt"),
            dsum(col("l_quantity")).as("sum_qty"),
            grouping_id().as("gid"))
          .orderBy(col("gid"), asc_nulls_first("l_returnflag"),
            asc_nulls_first("l_linestatus")),
      Some(s"""SELECT l_returnflag, l_linestatus, COUNT(*) AS cnt,
                 ${sqlSum("l_quantity")} AS sum_qty,
                 2*GROUPING(l_returnflag) + GROUPING(l_linestatus) AS gid
               FROM lineitem GROUP BY ROLLUP(l_returnflag, l_linestatus)
               ORDER BY gid, l_returnflag NULLS FIRST,
                 l_linestatus NULLS FIRST""")),

    // ---- CUBE: all grouping combinations
    QueryDef(
      "agg_cube",
      (s, d) =>
        Tables.t(s, d, "orders")
          .cube(col("o_orderstatus"), col("o_orderpriority"))
          .agg(
            count(lit(1)).as("cnt"),
            dsum(col("o_totalprice")).as("sum_price"),
            grouping_id().as("gid"))
          .orderBy(col("gid"), asc_nulls_first("o_orderstatus"),
            asc_nulls_first("o_orderpriority")),
      Some(s"""SELECT o_orderstatus, o_orderpriority, COUNT(*) AS cnt,
                 ${sqlSum("o_totalprice")} AS sum_price,
                 2*GROUPING(o_orderstatus) + GROUPING(o_orderpriority) AS gid
               FROM orders GROUP BY CUBE(o_orderstatus, o_orderpriority)
               ORDER BY gid, o_orderstatus NULLS FIRST,
                 o_orderpriority NULLS FIRST""")),

    // ---- explicit GROUPING SETS (SQL form; arbitrary set list)
    QueryDef(
      "agg_grouping_sets",
      (s, d) => {
        Tables.register(s, d, "lineitem")
        s.sql(s"""SELECT l_returnflag, l_linestatus, COUNT(*) AS cnt,
                    ${Det.sqlSum("l_extendedprice")} AS sum_price,
                    grouping_id() AS gid
                  FROM lineitem
                  GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
                  ORDER BY gid, l_returnflag ASC NULLS FIRST,
                    l_linestatus ASC NULLS FIRST""")
      },
      Some(s"""SELECT l_returnflag, l_linestatus, COUNT(*) AS cnt,
                 ${sqlSum("l_extendedprice")} AS sum_price,
                 2*GROUPING(l_returnflag) + GROUPING(l_linestatus) AS gid
               FROM lineitem
               GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
               ORDER BY gid, l_returnflag NULLS FIRST,
                 l_linestatus NULLS FIRST""")),

    // ---- SQL-TEXT GROUP_CONCAT with the full MySQL clause set
    //      (DISTINCT / ORDER BY / SEPARATOR — reference grammar
    //      sql/planbuilder/aggregates.go, impl aggregation/group_concat.go:26).
    //      Exercises the whole front door: SqlRewrite.groupConcat token pass
    //      -> listagg WITHIN GROUP -> Catalyst aggregation.
    QueryDef(
      "fn_group_concat_sql",
      (s, d) => {
        Tables.register(s, d, "nation")
        new graft.Engine(s).query(
          """SELECT n_regionkey,
               GROUP_CONCAT(n_name ORDER BY n_name SEPARATOR ', ') AS names,
               GROUP_CONCAT(DISTINCT SUBSTRING(n_name, 1, 1)
                 ORDER BY SUBSTRING(n_name, 1, 1) SEPARATOR '|') AS initials
             FROM nation GROUP BY n_regionkey ORDER BY n_regionkey""")
      },
      Some("""SELECT n_regionkey,
                string_agg(n_name, ', ' ORDER BY n_name) AS names,
                string_agg(DISTINCT substr(n_name, 1, 1), '|'
                  ORDER BY substr(n_name, 1, 1)) AS initials
              FROM nation GROUP BY n_regionkey ORDER BY n_regionkey""")),

    // ---- SQL-TEXT JSON_ARRAYAGG (registry entry MiscFns json_arrayagg;
    //      reference aggregation/unary_aggs.og.go:566). Element values are
    //      constant within each group so the result is order-independent
    //      (MySQL guarantees no array order); the NULL column checks that
    //      null elements survive collection (unary_agg_buffers.go:702).
    QueryDef(
      "fn_json_arrayagg_sql",
      (s, d) => {
        Tables.register(s, d, "nation")
        new graft.Engine(s).query(
          """SELECT n_regionkey,
               JSON_ARRAYAGG(n_regionkey * 10) AS arr_const,
               JSON_ARRAYAGG(CASE WHEN n_regionkey = 2 THEN NULL
                                  ELSE n_regionkey END) AS arr_nulls
             FROM nation GROUP BY n_regionkey ORDER BY n_regionkey""")
      },
      Some("""SELECT n_regionkey,
                json_group_array(n_regionkey * 10) AS arr_const,
                json_group_array(CASE WHEN n_regionkey = 2 THEN NULL
                                      ELSE n_regionkey END) AS arr_nulls
              FROM nation GROUP BY n_regionkey ORDER BY n_regionkey""")),

    // ---- SQL-TEXT JSON_OBJECTAGG (MiscFns json_objectagg; reference
    //      aggregation/json_agg.go). Single-row groups keep the rendered
    //      member order engine-independent.
    QueryDef(
      "fn_json_objectagg_sql",
      (s, d) => {
        Tables.register(s, d, "nation")
        new graft.Engine(s).query(
          """SELECT n_nationkey, JSON_OBJECTAGG(n_name, n_regionkey) AS obj
             FROM nation GROUP BY n_nationkey ORDER BY n_nationkey""")
      },
      Some("""SELECT n_nationkey, json_group_object(n_name, n_regionkey) AS obj
              FROM nation GROUP BY n_nationkey ORDER BY n_nationkey"""))
  )
}
