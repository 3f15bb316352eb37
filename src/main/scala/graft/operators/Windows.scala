package graft.operators

import graft.{QueryDef, Tables}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Window functions — SURVEY.md §2.5 (reference `Window` sql/plan/window.go:28;
  * framers sql/expression/function/aggregation/window_framer.og.go; functions
  * window_functions.go: RowNumber:1148, Rank:1245, PercentRank:1260,
  * DenseRank:1290, NTile:1328 + lag/lead/first_value/last_value/nth_value).
  *
  * The reference materializes each partition and sorts it in memory
  * (window_partition.go:87); Spark's WindowExec does exactly that per
  * partition after a shuffle on the PARTITION BY keys — same semantics,
  * distributed. Order keys are made total (unique tiebreak column) so
  * results are deterministic for the oracle diff.
  */
object Windows {

  val defs: Seq[QueryDef] = Seq(

    // ---- ranking family over a non-unique order key (ties exercise
    //      rank vs dense_rank vs row_number differences)
    QueryDef(
      "win_ranking",
      (s, d) => {
        val w = Window.partitionBy(col("c_nationkey"))
          .orderBy(col("c_acctbal").desc, col("c_custkey"))
        val wTies = Window.partitionBy(col("c_nationkey"))
          .orderBy(col("c_mktsegment"))
        Tables.t(s, d, "customer")
          .select(
            col("c_nationkey"), col("c_custkey"),
            row_number().over(w).as("rn"),
            rank().over(wTies).as("rnk"),
            dense_rank().over(wTies).as("drnk"),
            percent_rank().over(wTies).as("prnk"))
          .orderBy(col("c_nationkey"), col("c_custkey"))
      },
      Some("""SELECT c_nationkey, c_custkey,
                ROW_NUMBER() OVER (PARTITION BY c_nationkey
                  ORDER BY c_acctbal DESC, c_custkey) AS rn,
                RANK() OVER (PARTITION BY c_nationkey ORDER BY c_mktsegment) AS rnk,
                DENSE_RANK() OVER (PARTITION BY c_nationkey ORDER BY c_mktsegment) AS drnk,
                PERCENT_RANK() OVER (PARTITION BY c_nationkey ORDER BY c_mktsegment) AS prnk
              FROM customer ORDER BY c_nationkey, c_custkey""")),

    // ---- ntile / lag / lead over unique ordering
    QueryDef(
      "win_ntile_lag_lead",
      (s, d) => {
        val w = Window.partitionBy(col("o_custkey"))
          .orderBy(col("o_orderdate"), col("o_orderkey"))
        Tables.t(s, d, "orders")
          .select(
            col("o_custkey"), col("o_orderkey"),
            ntile(4).over(w).as("quartile"),
            lag(col("o_totalprice"), 1).over(w).as("prev_price"),
            lead(col("o_totalprice"), 1).over(w).as("next_price"),
            lag(col("o_totalprice"), 2, -1.0).over(w).as("prev2_price"))
          .orderBy(col("o_custkey"), col("o_orderkey"))
      },
      Some("""SELECT o_custkey, o_orderkey,
                NTILE(4) OVER w AS quartile,
                LAG(o_totalprice, 1) OVER w AS prev_price,
                LEAD(o_totalprice, 1) OVER w AS next_price,
                LAG(o_totalprice, 2, -1.0) OVER w AS prev2_price
              FROM orders
              WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
              ORDER BY o_custkey, o_orderkey""")),

    // ---- ROWS frame: running sum / moving average
    //      (RowsNPrecedingToCurrentRowFramer window_framer.og.go:107)
    QueryDef(
      "win_rows_frame",
      (s, d) => {
        // o_orderkey is unique -> the window order is total and the running
        // sums are fully deterministic
        val w = Window.partitionBy(col("o_custkey"))
          .orderBy(col("o_orderdate"), col("o_orderkey"))
        Tables.t(s, d, "orders")
          .select(
            col("o_custkey"), col("o_orderkey"),
            sum(col("o_totalprice").cast(DecimalType(12, 2)))
              .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
              .cast("double").as("running_spend"),
            sum(col("o_totalprice").cast(DecimalType(12, 2)))
              .over(w.rowsBetween(-2, Window.currentRow))
              .cast("double").as("spend_3row"),
            count(lit(1))
              .over(w.rowsBetween(Window.currentRow, Window.unboundedFollowing))
              .as("n_remaining"))
          .orderBy(col("o_custkey"), col("o_orderkey"))
      },
      Some("""SELECT o_custkey, o_orderkey,
                CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) OVER
                  (w ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                  AS DOUBLE) AS running_spend,
                CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) OVER
                  (w ROWS BETWEEN 2 PRECEDING AND CURRENT ROW)
                  AS DOUBLE) AS spend_3row,
                COUNT(*) OVER
                  (w ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
                  AS n_remaining
              FROM orders
              WINDOW w AS (PARTITION BY o_custkey
                           ORDER BY o_orderdate, o_orderkey)
              ORDER BY o_custkey, o_orderkey""")),

    // ---- RANGE frame with numeric offsets
    //      (RangeUnboundedPrecedingToCurrentRowFramer window_framer.og.go:355)
    QueryDef(
      "win_range_frame",
      (s, d) => {
        val w = Window.partitionBy(col("p_brand")).orderBy(col("p_size"))
        Tables.t(s, d, "part")
          .select(
            col("p_brand"), col("p_partkey"), col("p_size"),
            count(lit(1)).over(w.rangeBetween(-5, 0)).as("n_within_5"),
            count(lit(1))
              .over(w.rangeBetween(Window.unboundedPreceding, Window.currentRow))
              .as("n_le_size"))
          .orderBy(col("p_brand"), col("p_partkey"), col("p_size"))
      },
      Some("""SELECT p_brand, p_partkey, p_size,
                COUNT(*) OVER (w RANGE BETWEEN 5 PRECEDING AND CURRENT ROW)
                  AS n_within_5,
                COUNT(*) OVER (w RANGE BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                  AS n_le_size
              FROM part
              WINDOW w AS (PARTITION BY p_brand ORDER BY p_size)
              ORDER BY p_brand, p_partkey, p_size""")),

    // ---- first_value / last_value / nth_value over explicit full frame
    QueryDef(
      "win_first_last_nth",
      (s, d) => {
        val w = Window.partitionBy(col("o_orderpriority"))
          .orderBy(col("o_totalprice"), col("o_orderkey"))
          .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
        Tables.t(s, d, "orders")
          .select(
            col("o_orderpriority"), col("o_orderkey"),
            first(col("o_orderkey")).over(w).as("cheapest"),
            last(col("o_orderkey")).over(w).as("priciest"),
            nth_value(col("o_orderkey"), 2).over(w).as("second_cheapest"))
          .orderBy(col("o_orderpriority"), col("o_orderkey"))
      },
      Some("""SELECT o_orderpriority, o_orderkey,
                FIRST_VALUE(o_orderkey) OVER w AS cheapest,
                LAST_VALUE(o_orderkey) OVER w AS priciest,
                NTH_VALUE(o_orderkey, 2) OVER w AS second_cheapest
              FROM orders
              WINDOW w AS (PARTITION BY o_orderpriority
                           ORDER BY o_totalprice, o_orderkey
                           ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
              ORDER BY o_orderpriority, o_orderkey"""),
      headline = true),

    // ---- named windows (reference NamedWindows node + buildNamedWindows:
    //      one WINDOW clause shared by several functions). Spark SQL parses
    //      the WINDOW clause natively; both ranking and frame aggs share it.
    QueryDef(
      "win_named",
      (s, d) => {
        Tables.register(s, d, "orders")
        s.sql("""SELECT o_orderkey,
                   row_number() OVER w AS rn,
                   rank() OVER w AS rk,
                   sum(CAST(o_totalprice AS DECIMAL(18,2))) OVER wf
                     AS running_dec
                 FROM orders
                 WINDOW w AS (PARTITION BY o_orderpriority
                              ORDER BY o_totalprice, o_orderkey),
                        wf AS (PARTITION BY o_orderpriority
                               ORDER BY o_totalprice, o_orderkey
                               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                 ORDER BY o_orderkey""")
          .withColumn("running", col("running_dec").cast("double"))
          .drop("running_dec")
      },
      Some("""SELECT o_orderkey, rn, rk, CAST(running_dec AS DOUBLE) AS running
              FROM (
                SELECT o_orderkey,
                  row_number() OVER w AS rn,
                  rank() OVER w AS rk,
                  sum(CAST(o_totalprice AS DECIMAL(18,2))) OVER wf
                    AS running_dec
                FROM orders
                WINDOW w AS (PARTITION BY o_orderpriority
                             ORDER BY o_totalprice, o_orderkey),
                       wf AS (PARTITION BY o_orderpriority
                              ORDER BY o_totalprice, o_orderkey
                              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))
              ORDER BY o_orderkey""")),

    // ---- frame EXCLUDE CURRENT ROW (SQL:2011; neither Spark nor MySQL
    //      implements frame exclusion) — emulated as frame-sum minus the
    //      current row's value, which is algebraically exact for SUM/COUNT.
    //      The oracle runs DuckDB's NATIVE `EXCLUDE CURRENT ROW`, proving
    //      the emulation equals the standard semantics. DECIMAL sums keep
    //      the subtraction merge-order deterministic.
    QueryDef(
      "win_exclude_current",
      (s, d) => {
        val w = Window.partitionBy(col("o_custkey"))
          .orderBy(col("o_orderkey"))
          .rowsBetween(-2, 2)
        val dec = col("o_totalprice").cast(DecimalType(18, 2))
        Tables.t(s, d, "orders")
          .select(
            col("o_orderkey"), col("o_custkey"),
            // empty excluded frame -> NULL (standard SUM-over-empty), not 0
            when(count(lit(1)).over(w) === 1, lit(null))
              .otherwise((sum(dec).over(w) - dec).cast("double"))
              .as("neighbor_sum"),
            (count(lit(1)).over(w) - 1).as("n_neighbors"))
          .orderBy(col("o_orderkey"))
      },
      Some("""SELECT o_orderkey, o_custkey,
                CAST(sum(CAST(o_totalprice AS DECIMAL(18,2)))
                  OVER (PARTITION BY o_custkey ORDER BY o_orderkey
                        ROWS BETWEEN 2 PRECEDING AND 2 FOLLOWING
                        EXCLUDE CURRENT ROW) AS DOUBLE) AS neighbor_sum,
                count(*) OVER (PARTITION BY o_custkey ORDER BY o_orderkey
                               ROWS BETWEEN 2 PRECEDING AND 2 FOLLOWING
                               EXCLUDE CURRENT ROW) AS n_neighbors
              FROM orders ORDER BY o_orderkey"""))
  )
}
