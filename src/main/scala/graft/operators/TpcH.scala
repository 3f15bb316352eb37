package graft.operators

import graft.{Det, QueryDef, Tables}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** TPC-H-shaped workload queries adapted to the driver testdata's reduced
  * schema (no partsupp; lineitem carries shipdate only). The reference
  * plan-pins all 22 TPC-H queries (enginetest/queries/tpch_plans.go,
  * 3.6k LoC) — these cover the same plan shapes on the columns available:
  * scan-filter-agg (Q6), two-role dimension joins (Q7), market share with
  * nested aggregation (Q8), revenue ranking (Q10), conditional aggregation
  * (Q14), and group-having-subquery (Q18).
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
        val n1 = t("nation")(s, d)
          .select(col("n_nationkey").as("snk"), col("n_name").as("supp_nation"))
        val n2 = t("nation")(s, d)
          .select(col("n_nationkey").as("cnk"), col("n_name").as("cust_nation"))
        li.join(o, col("l_orderkey") === col("o_orderkey"))
          .join(broadcast(c), col("o_custkey") === col("c_custkey"))
          .join(broadcast(sp), col("l_suppkey") === col("s_suppkey"))
          .join(broadcast(n1), col("s_nationkey") === col("snk"))
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
        li.join(broadcast(p), col("l_partkey") === col("p_partkey"))
          .join(o, col("l_orderkey") === col("o_orderkey"))
          .join(broadcast(c), col("o_custkey") === col("c_custkey"))
          .join(broadcast(n1), col("c_nationkey") === col("cnk"))
          .join(broadcast(r), col("n_regionkey") === col("r_regionkey"))
          .join(broadcast(sp), col("l_suppkey") === col("s_suppkey"))
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
          .join(broadcast(c), col("o_custkey") === col("c_custkey"))
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
        li.join(broadcast(p), col("l_partkey") === col("p_partkey"))
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
          .join(broadcast(c), col("o_custkey") === col("c_custkey"))
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
      headline = true)
  )
}
