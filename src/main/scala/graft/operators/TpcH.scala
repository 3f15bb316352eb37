package graft.operators

import graft.{Det, QueryDef, Tables}
import graft.Tables.dim
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** TPC-H-shaped workload queries adapted to the driver testdata's reduced
  * schema (no partsupp; lineitem carries shipdate only). The reference
  * plan-pins all 22 TPC-H queries (enginetest/queries/tpch_plans.go,
  * 3.6k LoC) — these cover the same plan shapes on the columns available:
  * correlated-min supplier (Q2), EXISTS semi-join (Q4), scan-filter-agg
  * (Q6), two-role dimension joins (Q7), market share with nested
  * aggregation (Q8), 5-way star profit (Q9), revenue ranking (Q10),
  * global-fraction HAVING (Q11), fact-fact conditional counts (Q12),
  * left-outer double aggregation (Q13), conditional aggregation (Q14),
  * max-revenue view join-back (Q15), distinct-pair NOT IN (Q16),
  * decorrelated per-part average (Q17), group-having-subquery (Q18),
  * OR'd bracket predicates (Q19), aggregate-threshold semi join (Q20),
  * EXISTS/NOT-EXISTS waiting-supplier (Q21), and global-scalar threshold
  * + anti join (Q22) — with Q1/Q3/Q5 covered by q1_agg /
  * join_q3_shipping / join_q5_local_supplier, all 22 shapes run.
  *
  * Scale notes: every join declares the dimension side for broadcast;
  * revenue sums are exact DECIMAL (merge-order independent, graft.Det);
  * year() extraction stays in the scan's codegen stage.
  */
object TpcH {
  import Det._

  private def t(name: String)(s: org.apache.spark.sql.SparkSession, d: String) =
    Tables.t(s, d, name)

  /** l_extendedprice * (1 - l_discount) as exact decimal */
  private val revenue =
    col("l_extendedprice").cast(DecimalType(12, 2)) *
      (lit(1) - col("l_discount").cast(DecimalType(4, 2)))
  private val REV_SQL =
    "CAST(l_extendedprice AS DECIMAL(12,2)) * (1 - CAST(l_discount AS DECIMAL(4,2)))"

  val defs: Seq[QueryDef] = Seq(

    // ---- Q6: forecasting revenue change (pure scan-filter-agg; the
    //      filters all push into the parquet scan)
    QueryDef(
      "tpch_q6",
      (s, d) =>
        t("lineitem")(s, d)
          .filter(col("l_shipdate") >= "1996-01-01" && col("l_shipdate") < "1997-01-01" &&
            col("l_discount").between(0.05, 0.07) && col("l_quantity") < 24)
          .agg(sum(col("l_extendedprice").cast(DecimalType(12, 2)) *
            col("l_discount").cast(DecimalType(4, 2))).cast("double").as("revenue")),
      Some("""SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) *
                       CAST(l_discount AS DECIMAL(4,2))) AS DOUBLE) AS revenue
              FROM lineitem
              WHERE l_shipdate >= '1996-01-01' AND l_shipdate < '1997-01-01'
                AND l_discount BETWEEN 0.05 AND 0.07 AND l_quantity < 24"""),
      headline = true),

    // ---- Q7: volume shipping — nation appears in two roles (supplier
    //      nation vs customer nation); both dimension chains broadcast
    QueryDef(
      "tpch_q7",
      (s, d) => {
        val li = t("lineitem")(s, d)
          .filter(col("l_shipdate") >= "1995-01-01" && col("l_shipdate") <= "1996-12-31")
        val o = t("orders")(s, d)
        val c = t("customer")(s, d)
        val sp = t("supplier")(s, d)
        // the disjunctive nation-pair predicate only ever keeps these two
        // nations on EITHER side, so both nation dims pre-filter to them
        // (the pair filter below still applies) and the supplier chain
        // joins FIRST: lineitem shrinks to the ~2/25 of rows from those
        // nations' suppliers before the fact-fact orders join (guide §3
        // — reduce the big side before shuffling it). Inner joins
        // commute, so the result is unchanged.
        val twoNations = Seq("NATION_20", "NATION_11")
        val n1 = t("nation")(s, d).filter(col("n_name").isin(twoNations: _*))
          .select(col("n_nationkey").as("snk"), col("n_name").as("supp_nation"))
        val n2 = t("nation")(s, d).filter(col("n_name").isin(twoNations: _*))
          .select(col("n_nationkey").as("cnk"), col("n_name").as("cust_nation"))
        li.join(dim(sp), col("l_suppkey") === col("s_suppkey"))
          .join(broadcast(n1), col("s_nationkey") === col("snk"))
          .join(o, col("l_orderkey") === col("o_orderkey"))
          .join(dim(c), col("o_custkey") === col("c_custkey"))
          .join(broadcast(n2), col("c_nationkey") === col("cnk"))
          .filter((col("supp_nation") === "NATION_20" && col("cust_nation") === "NATION_11") ||
                  (col("supp_nation") === "NATION_11" && col("cust_nation") === "NATION_20"))
          .groupBy(col("supp_nation"), col("cust_nation"),
            year(col("l_shipdate")).as("l_year"))
          .agg(sum(revenue).cast("double").as("revenue"))
          .orderBy(col("supp_nation"), col("cust_nation"), col("l_year"))
      },
      Some(s"""SELECT supp_nation, cust_nation, l_year,
                 CAST(SUM(volume) AS DOUBLE) AS revenue
               FROM (
                 SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
                   CAST(year(l_shipdate) AS INT) AS l_year, $REV_SQL AS volume
                 FROM lineitem
                 JOIN orders ON l_orderkey = o_orderkey
                 JOIN customer ON o_custkey = c_custkey
                 JOIN supplier ON l_suppkey = s_suppkey
                 JOIN nation n1 ON s_nationkey = n1.n_nationkey
                 JOIN nation n2 ON c_nationkey = n2.n_nationkey
                 WHERE l_shipdate BETWEEN '1995-01-01' AND '1996-12-31'
                   AND ((n1.n_name = 'NATION_20' AND n2.n_name = 'NATION_11') OR
                        (n1.n_name = 'NATION_11' AND n2.n_name = 'NATION_20')))
               GROUP BY supp_nation, cust_nation, l_year
               ORDER BY supp_nation, cust_nation, l_year"""),
      headline = true),

    // ---- Q8: market share — share = conditional sum / total sum per year
    QueryDef(
      "tpch_q8",
      (s, d) => {
        val li = t("lineitem")(s, d)
        val o = t("orders")(s, d)
          .filter(col("o_orderdate") >= "1995-01-01" && col("o_orderdate") <= "1996-12-31")
        val c = t("customer")(s, d)
        val sp = t("supplier")(s, d)
        val p = t("part")(s, d).filter(col("p_type").contains("STANDARD"))
        val n1 = t("nation")(s, d)
          .select(col("n_nationkey").as("cnk"), col("n_regionkey"))
        val r = t("region")(s, d).filter(col("r_name") === "EUROPE")
        val n2 = t("nation")(s, d)
          .select(col("n_nationkey").as("snk"), col("n_name").as("supp_nation"))
        li.join(dim(p), col("l_partkey") === col("p_partkey"))
          .join(o, col("l_orderkey") === col("o_orderkey"))
          .join(dim(c), col("o_custkey") === col("c_custkey"))
          .join(broadcast(n1), col("c_nationkey") === col("cnk"))
          .join(broadcast(r), col("n_regionkey") === col("r_regionkey"))
          .join(dim(sp), col("l_suppkey") === col("s_suppkey"))
          .join(broadcast(n2), col("s_nationkey") === col("snk"))
          .groupBy(year(col("o_orderdate")).as("o_year"))
          .agg((sum(when(col("supp_nation") === "NATION_11", revenue)
              .otherwise(lit(0).cast(DecimalType(12, 2)))).cast("double") /
            sum(revenue).cast("double")).as("mkt_share"))
          .orderBy(col("o_year"))
      },
      Some(s"""SELECT o_year,
                 CAST(SUM(CASE WHEN supp_nation = 'NATION_11' THEN volume
                          ELSE CAST(0 AS DECIMAL(12,2)) END) AS DOUBLE) /
                   CAST(SUM(volume) AS DOUBLE) AS mkt_share
               FROM (
                 SELECT CAST(year(o_orderdate) AS INT) AS o_year,
                   $REV_SQL AS volume, n2.n_name AS supp_nation
                 FROM lineitem
                 JOIN part ON l_partkey = p_partkey
                 JOIN orders ON l_orderkey = o_orderkey
                 JOIN customer ON o_custkey = c_custkey
                 JOIN nation n1 ON c_nationkey = n1.n_nationkey
                 JOIN region ON n1.n_regionkey = r_regionkey
                 JOIN supplier ON l_suppkey = s_suppkey
                 JOIN nation n2 ON s_nationkey = n2.n_nationkey
                 WHERE r_name = 'EUROPE' AND p_type LIKE '%STANDARD%'
                   AND o_orderdate BETWEEN '1995-01-01' AND '1996-12-31')
               GROUP BY o_year ORDER BY o_year""")),

    // ---- Q10: returned-item reporting — top revenue-losing customers
    QueryDef(
      "tpch_q10",
      (s, d) => {
        val li = t("lineitem")(s, d).filter(col("l_returnflag") === "R")
        val o = t("orders")(s, d)
          .filter(col("o_orderdate") >= "1996-10-01" && col("o_orderdate") < "1997-10-01")
        val c = t("customer")(s, d)
        val n = t("nation")(s, d)
        li.join(o, col("l_orderkey") === col("o_orderkey"))
          .join(dim(c), col("o_custkey") === col("c_custkey"))
          .join(broadcast(n), col("c_nationkey") === col("n_nationkey"))
          .groupBy(col("c_custkey"), col("c_name"), col("n_name"))
          .agg(sum(revenue).cast("double").as("revenue"))
          .orderBy(col("revenue").desc, col("c_custkey"))
          .limit(20)
      },
      Some(s"""SELECT c_custkey, c_name, n_name,
                 CAST(SUM($REV_SQL) AS DOUBLE) AS revenue
               FROM lineitem
               JOIN orders ON l_orderkey = o_orderkey
               JOIN customer ON o_custkey = c_custkey
               JOIN nation ON c_nationkey = n_nationkey
               WHERE l_returnflag = 'R'
                 AND o_orderdate >= '1996-10-01' AND o_orderdate < '1997-10-01'
               GROUP BY c_custkey, c_name, n_name
               ORDER BY revenue DESC, c_custkey LIMIT 20"""),
      headline = true),

    // ---- Q14: promo revenue — conditional aggregation over a broadcast
    //      part join
    QueryDef(
      "tpch_q14",
      (s, d) => {
        val li = t("lineitem")(s, d)
          .filter(col("l_shipdate") >= "1996-09-01" && col("l_shipdate") < "1996-10-01")
        val p = t("part")(s, d)
        li.join(dim(p), col("l_partkey") === col("p_partkey"))
          .agg((sum(when(col("p_type").startsWith("PROMO"), revenue)
              .otherwise(lit(0).cast(DecimalType(12, 2)))).cast("double") * 100 /
            sum(revenue).cast("double")).as("promo_share"))
      },
      Some(s"""SELECT CAST(SUM(CASE WHEN p_type LIKE 'PROMO%' THEN $REV_SQL
                            ELSE CAST(0 AS DECIMAL(12,2)) END) AS DOUBLE) * 100 /
                       CAST(SUM($REV_SQL) AS DOUBLE) AS promo_share
               FROM lineitem JOIN part ON l_partkey = p_partkey
               WHERE l_shipdate >= '1996-09-01' AND l_shipdate < '1996-10-01'""")),

    // ---- Q18: large-volume customers — group-having via semi join on an
    //      aggregated subquery (no correlated re-execution)
    QueryDef(
      "tpch_q18",
      (s, d) => {
        val li = t("lineitem")(s, d)
        val big = li.groupBy(col("l_orderkey"))
          .agg(dsum(col("l_quantity")).as("sum_qty"))
          .filter(col("sum_qty") > 150)
        val o = t("orders")(s, d)
        val c = t("customer")(s, d)
        o.join(big, col("o_orderkey") === big("l_orderkey"))
          .join(dim(c), col("o_custkey") === col("c_custkey"))
          .select(col("c_custkey"), col("c_name"), col("o_orderkey"),
            col("o_orderdate"), col("o_totalprice"), col("sum_qty"))
          .orderBy(col("o_totalprice").desc, col("o_orderkey"))
          .limit(100)
      },
      Some(s"""SELECT c_custkey, c_name, o_orderkey, o_orderdate, o_totalprice,
                 sum_qty
               FROM orders
               JOIN (SELECT l_orderkey, ${sqlSum("l_quantity")} AS sum_qty
                     FROM lineitem GROUP BY l_orderkey
                     HAVING ${sqlSum("l_quantity")} > 150) big
                 ON o_orderkey = big.l_orderkey
               JOIN customer ON o_custkey = c_custkey
               ORDER BY o_totalprice DESC, o_orderkey LIMIT 100"""),
      headline = true),

    // ---- Q2 (adapted: lineitem bridges part<->supplier since the testdata
    //      has no partsupp): minimum-cost supplier per part — the
    //      correlated-min plan shape (reference tpch_plans.go Q2 resolves
    //      it as an aggregate join, not per-row re-execution)
    QueryDef(
      "tpch_q2",
      (s, d) => {
        val p = t("part")(s, d)
          .filter(col("p_size") === 15 && col("p_type").contains("STANDARD"))
        // NOT persisted (measured this round: 0.59 -> 0.87 s with a
        // cache): the per-part-minimum branch reads a 2-column pruned
        // link, and a cache boundary would force materializing all 5
        // columns and block pushdown — Catalyst's two pruned plans of
        // the subtree beat one unpruned cached copy here
        val link = t("lineitem")(s, d)
          .join(dim(t("supplier")(s, d)),
            col("l_suppkey") === col("s_suppkey"))
          .join(dim(p), col("l_partkey") === col("p_partkey"))
          .select(col("p_partkey"), col("p_type"), col("s_suppkey"),
            col("s_name"), col("s_acctbal"))
          .distinct()
        val minBal = link.groupBy(col("p_partkey").as("mb_pk"))
          .agg(min(col("s_acctbal")).as("min_bal"))
        link.join(minBal,
            col("p_partkey") === col("mb_pk") &&
              col("s_acctbal") === col("min_bal"))
          .select(col("s_suppkey"), col("s_name"), col("p_partkey"),
            col("p_type"), col("s_acctbal"))
          .orderBy(col("s_acctbal"), col("s_name"), col("p_partkey"))
          .limit(100)
      },
      Some("""WITH link AS (
                SELECT DISTINCT p_partkey, p_type, s_suppkey, s_name, s_acctbal
                FROM lineitem
                JOIN supplier ON l_suppkey = s_suppkey
                JOIN part ON l_partkey = p_partkey
                WHERE p_size = 15 AND p_type LIKE '%STANDARD%')
              SELECT s_suppkey, s_name, p_partkey, p_type, s_acctbal
              FROM link l
              WHERE s_acctbal = (SELECT MIN(s_acctbal) FROM link l2
                                 WHERE l2.p_partkey = l.p_partkey)
              ORDER BY s_acctbal, s_name, p_partkey LIMIT 100""")),

    // ---- Q4 (adapted: EXISTS marker is l_returnflag='R'; testdata has no
    //      commit/receipt dates): order-priority checking — EXISTS
    //      decorrelates to a left-semi join, then a tiny 5-group agg
    QueryDef(
      "tpch_q4",
      (s, d) => {
        val o = t("orders")(s, d)
          .filter(col("o_orderdate") >= "1996-07-01" &&
            col("o_orderdate") < "1996-10-01")
        val flagged = t("lineitem")(s, d).filter(col("l_returnflag") === "R")
          .select(col("l_orderkey"))
        o.join(flagged, col("o_orderkey") === col("l_orderkey"), "left_semi")
          .groupBy(col("o_orderpriority"))
          .agg(count(lit(1)).as("order_count"))
          .orderBy(col("o_orderpriority"))
      },
      Some("""SELECT o_orderpriority, COUNT(*) AS order_count
              FROM orders
              WHERE o_orderdate >= '1996-07-01' AND o_orderdate < '1996-10-01'
                AND EXISTS (SELECT 1 FROM lineitem
                            WHERE l_orderkey = o_orderkey AND l_returnflag = 'R')
              GROUP BY o_orderpriority ORDER BY o_orderpriority""")),

    // ---- Q13: customer order-count distribution — left outer join with an
    //      ON-clause filter, then a double aggregation (count per customer,
    //      histogram of counts)
    QueryDef(
      "tpch_q13",
      (s, d) => {
        val c = t("customer")(s, d)
        val o = t("orders")(s, d).filter(col("o_orderpriority") =!= "1-URGENT")
        val perCust = c.join(o, col("c_custkey") === col("o_custkey"), "left")
          .groupBy(col("c_custkey"))
          .agg(count(col("o_orderkey")).as("c_count"))
        perCust.groupBy(col("c_count"))
          .agg(count(lit(1)).as("custdist"))
          .orderBy(col("custdist").desc, col("c_count").desc)
      },
      Some("""SELECT c_count, COUNT(*) AS custdist FROM (
                SELECT c_custkey, COUNT(o_orderkey) AS c_count
                FROM customer LEFT OUTER JOIN orders
                  ON c_custkey = o_custkey AND o_orderpriority <> '1-URGENT'
                GROUP BY c_custkey)
              GROUP BY c_count ORDER BY custdist DESC, c_count DESC""")),

    // ---- Q17: small-quantity-order revenue — the correlated
    //      avg-per-part subquery decorrelates to ONE aggregate of lineitem
    //      joined back (no per-row re-scan)
    QueryDef(
      "tpch_q17",
      (s, d) => {
        val li = t("lineitem")(s, d)
        val p = t("part")(s, d).filter(col("p_brand") === "Brand#13")
        // the per-part average only matters for Brand#13 parts (the join
        // below discards every other partkey), so pre-filter the
        // aggregate's input with a semi join on the filtered part side —
        // the classic selective-build pre-filter (guide §3.2): the
        // per-part aggregation shuffles ~1/25 of lineitem instead of all
        // of it, at any scale. Joined rows are unchanged.
        val avgQty = li
          .join(dim(p.select(col("p_partkey"))),
            col("l_partkey") === col("p_partkey"), "left_semi")
          .groupBy(col("l_partkey").as("aq_pk"))
          .agg(avg(col("l_quantity")).as("avg_qty"))
        li.join(dim(p), col("l_partkey") === col("p_partkey"))
          .join(avgQty, col("l_partkey") === col("aq_pk"))
          .filter(col("l_quantity") < lit(0.2) * col("avg_qty"))
          .agg((sum(col("l_extendedprice").cast(DecimalType(12, 2)))
            .cast("double") / 7.0).as("avg_yearly"))
      },
      Some("""SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE)
                       / 7.0 AS avg_yearly
              FROM lineitem l JOIN part ON l_partkey = p_partkey
              WHERE p_brand = 'Brand#13'
                AND l_quantity < (SELECT 0.2 * AVG(l_quantity) FROM lineitem l2
                                  WHERE l2.l_partkey = l.l_partkey)""")),

    // ---- Q19 (adapted: brand/size brackets; testdata has no
    //      container/shipmode): discounted revenue over OR'd bracket
    //      predicates — the whole disjunction stays inside the scan stage
    //      after the broadcast part join
    QueryDef(
      "tpch_q19",
      (s, d) => {
        val li = t("lineitem")(s, d)
        val p = t("part")(s, d)
        li.join(dim(p), col("l_partkey") === col("p_partkey"))
          .filter(
            (col("p_brand") === "Brand#12" && col("p_size").between(1, 5) &&
              col("l_quantity").between(1, 11)) ||
            (col("p_brand") === "Brand#23" && col("p_size").between(1, 10) &&
              col("l_quantity").between(10, 20)) ||
            (col("p_brand") === "Brand#34" && col("p_size").between(1, 15) &&
              col("l_quantity").between(20, 30)))
          .agg(sum(revenue).cast("double").as("revenue"))
      },
      Some(s"""SELECT CAST(SUM($REV_SQL) AS DOUBLE) AS revenue
               FROM lineitem JOIN part ON l_partkey = p_partkey
               WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 5
                      AND l_quantity BETWEEN 1 AND 11)
                  OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 10
                      AND l_quantity BETWEEN 10 AND 20)
                  OR (p_brand = 'Brand#34' AND p_size BETWEEN 1 AND 15
                      AND l_quantity BETWEEN 20 AND 30)""")),

    // ---- Q9 (adapted: profit = revenue since the testdata has no
    //      ps_supplycost): product-type profit by supplier nation × order
    //      year — the 5-way star join; all dimensions broadcast, one
    //      lineitem scan, year() stays in the scan stage
    QueryDef(
      "tpch_q9",
      (s, d) => {
        val li = t("lineitem")(s, d)
        val p = t("part")(s, d).filter(col("p_name").contains("red"))
        val sp = t("supplier")(s, d)
        val o = t("orders")(s, d).select(col("o_orderkey"), col("o_orderdate"))
        val n = t("nation")(s, d)
        li.join(dim(p), col("l_partkey") === col("p_partkey"))
          .join(dim(sp), col("l_suppkey") === col("s_suppkey"))
          .join(o, col("l_orderkey") === col("o_orderkey"))
          .join(broadcast(n), col("s_nationkey") === col("n_nationkey"))
          .groupBy(col("n_name").as("nation"),
            year(col("o_orderdate")).as("o_year"))
          .agg(sum(revenue).cast("double").as("sum_profit"))
          .orderBy(col("nation"), col("o_year").desc)
      },
      Some(s"""SELECT nation, o_year, CAST(SUM(volume) AS DOUBLE) AS sum_profit
               FROM (
                 SELECT n_name AS nation,
                   CAST(year(o_orderdate) AS INT) AS o_year, $REV_SQL AS volume
                 FROM lineitem
                 JOIN part ON l_partkey = p_partkey
                 JOIN supplier ON l_suppkey = s_suppkey
                 JOIN orders ON l_orderkey = o_orderkey
                 JOIN nation ON s_nationkey = n_nationkey
                 WHERE p_name LIKE '%red%')
               GROUP BY nation, o_year ORDER BY nation, o_year DESC"""),
      headline = true),

    // ---- Q11 (adapted: part value from lineitem revenue; testdata has no
    //      partsupp): important-part identification — per-part aggregate
    //      vs a global-scalar threshold (computed once, broadcast; the
    //      classic "HAVING > global fraction" shape)
    QueryDef(
      "tpch_q11",
      (s, d) => {
        val li = t("lineitem")(s, d)
        val sp = t("supplier")(s, d)
        val n = t("nation")(s, d).filter(col("n_name") === "NATION_3")
        val perPart = li
          .join(dim(sp), col("l_suppkey") === col("s_suppkey"))
          .join(broadcast(n), col("s_nationkey") === col("n_nationkey"))
          .groupBy(col("l_partkey"))
          .agg(sum(col("l_extendedprice").cast(DecimalType(18, 2)))
            .as("value_dec"))
        val total = perPart.agg(sum(col("value_dec")).as("total_dec"))
        perPart.crossJoin(broadcast(total))
          .filter(col("value_dec").cast("double") >
            col("total_dec").cast("double") * 0.001)
          .select(col("l_partkey"),
            col("value_dec").cast("double").as("value"))
          .orderBy(col("value").desc, col("l_partkey"))
      },
      Some("""WITH perpart AS (
                SELECT l_partkey,
                  SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS value_dec
                FROM lineitem
                JOIN supplier ON l_suppkey = s_suppkey
                JOIN nation ON s_nationkey = n_nationkey
                WHERE n_name = 'NATION_3'
                GROUP BY l_partkey)
              SELECT l_partkey, CAST(value_dec AS DOUBLE) AS value
              FROM perpart
              WHERE CAST(value_dec AS DOUBLE) >
                (SELECT CAST(SUM(value_dec) AS DOUBLE) FROM perpart) * 0.001
              ORDER BY value DESC, l_partkey""")),

    // ---- Q12 (adapted: lateness = shipdate > orderdate + 60 days, classes
    //      from o_orderpriority; testdata has no shipmode/commit/receipt):
    //      shipping-mode priority counting — fact-fact join + conditional
    //      counts, date arithmetic in the scan stage
    QueryDef(
      "tpch_q12",
      (s, d) => {
        val li = t("lineitem")(s, d)
          .filter(col("l_shipdate") >= "1996-01-01" &&
            col("l_shipdate") < "1997-01-01")
        val o = t("orders")(s, d)
        val highPrio = col("o_orderpriority").isin("1-URGENT", "2-HIGH")
        li.join(o, col("l_orderkey") === col("o_orderkey"))
          .filter(datediff(col("l_shipdate"), col("o_orderdate")) > 60)
          .groupBy(col("l_linestatus"))
          .agg(
            count(when(highPrio, 1)).as("high_line_count"),
            count(when(!highPrio, 1)).as("low_line_count"))
          .orderBy(col("l_linestatus"))
      },
      Some("""SELECT l_linestatus,
                COUNT(CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH')
                           THEN 1 END) AS high_line_count,
                COUNT(CASE WHEN o_orderpriority NOT IN ('1-URGENT','2-HIGH')
                           THEN 1 END) AS low_line_count
              FROM lineitem JOIN orders ON l_orderkey = o_orderkey
              WHERE l_shipdate >= '1996-01-01' AND l_shipdate < '1997-01-01'
                AND date_diff('day', o_orderdate, l_shipdate) > 60
              GROUP BY l_linestatus ORDER BY l_linestatus""")),

    // ---- Q15: top supplier — quarterly revenue view, then the max-revenue
    //      scalar joined back (exact-decimal equality, no re-execution)
    QueryDef(
      "tpch_q15",
      (s, d) => {
        val rev = t("lineitem")(s, d)
          .filter(col("l_shipdate") >= "1996-01-01" &&
            col("l_shipdate") < "1996-04-01")
          .groupBy(col("l_suppkey"))
          .agg(sum(revenue).as("rev_dec"))
        val maxRev = rev.agg(max(col("rev_dec")).as("max_dec"))
        rev.crossJoin(broadcast(maxRev))
          .filter(col("rev_dec") === col("max_dec"))
          .join(dim(t("supplier")(s, d)),
            col("l_suppkey") === col("s_suppkey"))
          .select(col("s_suppkey"), col("s_name"),
            col("rev_dec").cast("double").as("total_revenue"))
          .orderBy(col("s_suppkey"))
      },
      Some(s"""WITH rev AS (
                 SELECT l_suppkey, SUM($REV_SQL) AS rev_dec
                 FROM lineitem
                 WHERE l_shipdate >= '1996-01-01' AND l_shipdate < '1996-04-01'
                 GROUP BY l_suppkey)
               SELECT s_suppkey, s_name, CAST(rev_dec AS DOUBLE) AS total_revenue
               FROM rev JOIN supplier ON l_suppkey = s_suppkey
               WHERE rev_dec = (SELECT MAX(rev_dec) FROM rev)
               ORDER BY s_suppkey""")),

    // ---- Q16 (adapted: supplier-part pairs come from lineitem; exclusion
    //      by s_name pattern instead of comment text): parts/supplier
    //      relationship — distinct pairs, NOT IN as broadcast anti join,
    //      count-distinct per brand/type/size
    QueryDef(
      "tpch_q16",
      (s, d) => {
        val p = t("part")(s, d)
          .filter(col("p_brand") =!= "Brand#13" &&
            !col("p_type").startsWith("PROMO") &&
            col("p_size").isin(1, 4, 9, 14, 19, 23, 36, 45))
        val excluded = t("supplier")(s, d)
          .filter(col("s_name").endsWith("7")).select(col("s_suppkey"))
        // the selective part filter and the supplier anti join apply
        // BEFORE the distinct-pairs aggregation, so its exchange carries
        // only the qualifying ~1/6 of lineitem's pairs (guide §2.3
        // "shuffle fewer bytes"); (p_brand, p_type, p_size) ride through
        // the distinct (functionally determined by l_partkey — the
        // distinct pair set is unchanged). Old shape aggregated ALL pairs
        // first and filtered after.
        val pairs = t("lineitem")(s, d)
          .select(col("l_partkey"), col("l_suppkey"))
          .join(dim(p), col("l_partkey") === col("p_partkey"))
          .join(dim(excluded),
            col("l_suppkey") === col("s_suppkey"), "left_anti")
          .select(col("l_partkey"), col("l_suppkey"),
            col("p_brand"), col("p_type"), col("p_size"))
          .distinct()
        pairs
          .groupBy(col("p_brand"), col("p_type"), col("p_size"))
          .agg(countDistinct(col("l_suppkey")).as("supplier_cnt"))
          .orderBy(col("supplier_cnt").desc, col("p_brand"), col("p_type"),
            col("p_size"))
      },
      Some("""SELECT p_brand, p_type, p_size,
                COUNT(DISTINCT l_suppkey) AS supplier_cnt
              FROM (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem) ps
              JOIN part ON p_partkey = l_partkey
              WHERE p_brand <> 'Brand#13' AND p_type NOT LIKE 'PROMO%'
                AND p_size IN (1, 4, 9, 14, 19, 23, 36, 45)
                AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier
                                      WHERE s_name LIKE '%7')
              GROUP BY p_brand, p_type, p_size
              ORDER BY supplier_cnt DESC, p_brand, p_type, p_size""")),

    // ---- Q20 (adapted: "excess supply" = per-(supplier, part) shipped
    //      quantity over a year; testdata has no partsupp): potential part
    //      promotion — IN-subquery chain decorrelated to aggregate + semi
    //      join
    QueryDef(
      "tpch_q20",
      (s, d) => {
        val qual = t("lineitem")(s, d)
          .filter(col("l_shipdate") >= "1996-01-01" &&
            col("l_shipdate") < "1997-01-01")
          .join(dim(t("part")(s, d)
              .filter(col("p_name").startsWith("b"))),
            col("l_partkey") === col("p_partkey"))
          .groupBy(col("l_suppkey"), col("l_partkey"))
          .agg(sum(col("l_quantity").cast(DecimalType(18, 2))).as("qty"))
          .filter(col("qty") > 30)
          .select(col("l_suppkey")).distinct()
        val n = t("nation")(s, d).filter(col("n_name") === "NATION_3")
        t("supplier")(s, d)
          .join(broadcast(n), col("s_nationkey") === col("n_nationkey"))
          .join(qual, col("s_suppkey") === col("l_suppkey"), "left_semi")
          .select(col("s_suppkey"), col("s_name"), col("s_acctbal"))
          .orderBy(col("s_suppkey"))
      },
      Some("""SELECT s_suppkey, s_name, s_acctbal
              FROM supplier JOIN nation ON s_nationkey = n_nationkey
              WHERE n_name = 'NATION_3'
                AND s_suppkey IN (
                  SELECT l_suppkey
                  FROM lineitem JOIN part ON l_partkey = p_partkey
                  WHERE p_name LIKE 'b%'
                    AND l_shipdate >= '1996-01-01' AND l_shipdate < '1997-01-01'
                  GROUP BY l_suppkey, l_partkey
                  HAVING SUM(CAST(l_quantity AS DECIMAL(18,2))) > 30)
              ORDER BY s_suppkey""")),

    // ---- Q21 (adapted: "problem" marker is l_returnflag='R'; testdata has
    //      no commit/receipt dates): suppliers who kept orders waiting —
    //      the EXISTS / NOT EXISTS pair decorrelates to one per-order
    //      distinct-supplier aggregate (nsupp > 1 ∧ exactly one flagged
    //      supplier), computed only over 'F' orders
    QueryDef(
      "tpch_q21",
      (s, d) => {
        val fOrders = t("orders")(s, d)
          .filter(col("o_orderstatus") === "F").select(col("o_orderkey"))
        // NULL suppkeys can never contribute: the reference shape joins
        // supplier on l_suppkey and its EXISTS/NOT-EXISTS predicates use
        // <>, which NULL never satisfies — and the two-level aggregate
        // below counts GROUPS, so an unfiltered (order, NULL) group would
        // inflate nsupp where the old countDistinct ignored it. The
        // filter pushes into the scan (free) and pins exact
        // countDistinct semantics for any future NULL-bearing data.
        val liF = t("lineitem")(s, d)
          .select(col("l_orderkey"), col("l_suppkey"), col("l_returnflag"))
          .filter(col("l_suppkey").isNotNull)
          .join(fOrders, col("l_orderkey") === col("o_orderkey"), "left_semi")
        // two-level aggregate replaces the old countDistinct pair + join
        // of the R rows back onto the per-order frame: level 1 collapses
        // lineitem to one row per (order, supplier) with its R-row count
        // (map-side partial agg, no Expand), level 2 derives nsupp /
        // nflag / the unique flagged supplier / its R-row total per
        // order. One lineitem pass instead of two, and the only
        // fact-sized exchange is the (order, supplier) aggregation —
        // the old plan shuffled lineitem twice and doubled the agg input
        // through countDistinct's Expand (guide §2.3/§2.4).
        val perOS = liF.groupBy(col("l_orderkey"), col("l_suppkey"))
          .agg(count(when(col("l_returnflag") === "R", 1)).as("r_rows"))
        val perOrder = perOS.groupBy(col("l_orderkey"))
          .agg(
            count(lit(1)).as("nsupp"),
            count(when(col("r_rows") > 0, 1)).as("nflag"),
            max(when(col("r_rows") > 0, col("l_suppkey"))).as("flag_supp"),
            sum(when(col("r_rows") > 0, col("r_rows"))).as("flag_rows"))
          .filter(col("nsupp") > 1 && col("nflag") === 1)
        val n = t("nation")(s, d).filter(col("n_name") === "NATION_3")
        perOrder
          .join(dim(t("supplier")(s, d)),
            col("flag_supp") === col("s_suppkey"))
          .join(broadcast(n), col("s_nationkey") === col("n_nationkey"))
          .groupBy(col("s_name"))
          .agg(sum(col("flag_rows")).as("numwait"))
          .orderBy(col("numwait").desc, col("s_name"))
          .limit(100)
      },
      Some("""SELECT s_name, COUNT(*) AS numwait
              FROM lineitem l1
              JOIN orders ON o_orderkey = l1.l_orderkey
              JOIN supplier ON l1.l_suppkey = s_suppkey
              JOIN nation ON s_nationkey = n_nationkey
              WHERE l1.l_returnflag = 'R' AND o_orderstatus = 'F'
                AND n_name = 'NATION_3'
                AND EXISTS (SELECT 1 FROM lineitem l2
                            WHERE l2.l_orderkey = l1.l_orderkey
                              AND l2.l_suppkey <> l1.l_suppkey)
                AND NOT EXISTS (SELECT 1 FROM lineitem l3
                                WHERE l3.l_orderkey = l1.l_orderkey
                                  AND l3.l_suppkey <> l1.l_suppkey
                                  AND l3.l_returnflag = 'R')
              GROUP BY s_name ORDER BY numwait DESC, s_name LIMIT 100""")),

    // ---- Q22 (adapted: country-code bucket from c_nationkey; testdata has
    //      no c_phone): global-acctbal scalar subquery (computed once,
    //      broadcast) + anti join against orders
    QueryDef(
      "tpch_q22",
      (s, d) => {
        val c = t("customer")(s, d)
        // q22's anti-join over ALL orders is vacuously empty at small SF
        // (every customer has orders); restrict to urgent orders so the
        // anti-join + global-scalar-subquery shape stays observable
        val o = t("orders")(s, d)
          .filter(col("o_orderpriority") === "1-URGENT")
          .select(col("o_custkey"))
        // exact-decimal sum / count -> deterministic double threshold
        val thresh = c.filter(col("c_acctbal") > 0.0)
          .agg((sum(col("c_acctbal").cast(DecimalType(12, 2))).cast("double") /
            count(lit(1))).as("avg_bal"))
        c.join(o, col("c_custkey") === col("o_custkey"), "left_anti")
          .crossJoin(broadcast(thresh))
          .filter(col("c_acctbal") > col("avg_bal"))
          .groupBy((col("c_nationkey") % 5).as("cc"))
          .agg(
            count(lit(1)).as("numcust"),
            sum(col("c_acctbal").cast(DecimalType(12, 2))).cast("double")
              .as("totacctbal"))
          .orderBy(col("cc"))
      },
      Some("""SELECT c_nationkey % 5 AS cc, COUNT(*) AS numcust,
                CAST(SUM(CAST(c_acctbal AS DECIMAL(12,2))) AS DOUBLE)
                  AS totacctbal
              FROM customer c
              WHERE c_acctbal > (SELECT CAST(SUM(CAST(c_acctbal AS DECIMAL(12,2)))
                                   AS DOUBLE) / COUNT(*)
                                 FROM customer WHERE c_acctbal > 0.0)
                AND NOT EXISTS (SELECT 1 FROM orders
                                WHERE o_orderpriority = '1-URGENT'
                                  AND o_custkey = c_custkey)
              GROUP BY cc ORDER BY cc"""))
  )
}
