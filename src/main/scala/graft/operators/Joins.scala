package graft.operators

import graft.{Det, QueryDef, Tables}
import graft.Tables.dim
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Join operators — SURVEY.md §2.3 (reference `JoinNode` sql/plan/join.go:304,
  * 40 join types enumerated at join.go:27-70).
  *
  * The reference's physical flavors (nested-loop / hash / merge / lookup /
  * range-heap iterators in sql/rowexec/join_iters.go, merge_join.go,
  * range_heap_iter.go) are all strategy choices Catalyst makes automatically:
  * we declare the logical join, `broadcast()` constant-size dims
  * (region=5, nation=25 rows), and size-gate the hint via `Tables.dim` on
  * sf-linear dims (customer/supplier/part) — hinted while the estimate
  * fits the autoBroadcastJoinThreshold, unhinted (AQE/CBO chooses) past
  * it. At 100 TB: fact-fact joins shuffle on their equi-keys, which AQE
  * re-plans at runtime.
  */
object Joins {
  import Det._

  private def t(name: String) = (s: org.apache.spark.sql.SparkSession, d: String) =>
    Tables.t(s, d, name)

  val defs: Seq[QueryDef] = Seq(

    // ---- inner equi-join (hash/broadcast path; joinIter join_iters.go:300)
    QueryDef(
      "join_inner",
      (s, d) => {
        val o = t("orders")(s, d)
        val c = t("customer")(s, d)
        o.join(dim(c), o("o_custkey") === c("c_custkey"))
          .filter(col("o_totalprice") > 400000)
          .select(col("o_orderkey"), col("c_name"), col("o_totalprice"))
          .orderBy(col("o_orderkey"), col("c_name"), col("o_totalprice"))
      },
      Some("""SELECT o_orderkey, c_name, o_totalprice
              FROM orders JOIN customer ON o_custkey = c_custkey
              WHERE o_totalprice > 400000
              ORDER BY o_orderkey, c_name, o_totalprice""")),

    // ---- left outer join (NULL fill on probe misses)
    QueryDef(
      "join_left",
      (s, d) => {
        val c = t("customer")(s, d)
        val big = t("orders")(s, d).filter(col("o_totalprice") > 450000)
        c.join(big, c("c_custkey") === big("o_custkey"), "left")
          .groupBy(col("c_custkey"))
          .agg(count(col("o_orderkey")).as("n_big_orders"))
          .orderBy(col("c_custkey"))
      },
      Some("""SELECT c_custkey, COUNT(o_orderkey) AS n_big_orders
              FROM customer LEFT JOIN (
                SELECT * FROM orders WHERE o_totalprice > 450000) o
                ON c_custkey = o_custkey
              GROUP BY c_custkey ORDER BY c_custkey""")),

    // ---- right outer join
    QueryDef(
      "join_right",
      (s, d) => {
        val o = t("orders")(s, d).filter(col("o_orderstatus") === "F")
        val c = t("customer")(s, d)
        o.join(c, o("o_custkey") === c("c_custkey"), "right")
          .groupBy(col("c_nationkey"))
          .agg(count(col("o_orderkey")).as("n_f_orders"),
               count(lit(1)).as("n_rows"))
          .orderBy(col("c_nationkey"))
      },
      Some("""SELECT c_nationkey, COUNT(o_orderkey) AS n_f_orders,
                COUNT(*) AS n_rows
              FROM (SELECT * FROM orders WHERE o_orderstatus = 'F') o
                RIGHT JOIN customer ON o_custkey = c_custkey
              GROUP BY c_nationkey ORDER BY c_nationkey""")),

    // ---- full outer join (fullJoinIter join_iters.go:470)
    QueryDef(
      "join_full",
      (s, d) => {
        val cn = t("customer")(s, d).groupBy(col("c_nationkey"))
          .agg(count(lit(1)).as("n_cust"))
        val sn = t("supplier")(s, d).groupBy(col("s_nationkey"))
          .agg(count(lit(1)).as("n_supp"))
        cn.join(sn, cn("c_nationkey") === sn("s_nationkey"), "full")
          .select(
            coalesce(col("c_nationkey"), col("s_nationkey")).as("nationkey"),
            coalesce(col("n_cust"), lit(0L)).as("n_cust"),
            coalesce(col("n_supp"), lit(0L)).as("n_supp"))
          .orderBy(col("nationkey"))
      },
      Some("""SELECT COALESCE(c.k, s.k) AS nationkey,
                COALESCE(c.n_cust, 0) AS n_cust, COALESCE(s.n_supp, 0) AS n_supp
              FROM (SELECT c_nationkey AS k, COUNT(*) AS n_cust
                    FROM customer GROUP BY 1) c
              FULL JOIN (SELECT s_nationkey AS k, COUNT(*) AS n_supp
                    FROM supplier GROUP BY 1) s ON c.k = s.k
              ORDER BY nationkey""")),

    // ---- left semi join = EXISTS (existsIter join_iters.go:361)
    QueryDef(
      "join_semi",
      (s, d) => {
        val c = t("customer")(s, d)
        val big = t("orders")(s, d).filter(col("o_totalprice") > 400000)
        c.join(big, c("c_custkey") === big("o_custkey"), "left_semi")
          .select(col("c_custkey"), col("c_name"))
          .orderBy(col("c_custkey"))
      },
      Some("""SELECT c_custkey, c_name FROM customer c
              WHERE EXISTS (SELECT 1 FROM orders
                            WHERE o_custkey = c.c_custkey
                              AND o_totalprice > 400000)
              ORDER BY c_custkey""")),

    // ---- left anti join = NOT EXISTS
    QueryDef(
      "join_anti",
      (s, d) => {
        val c = t("customer")(s, d)
        val o = t("orders")(s, d).filter(col("o_orderstatus") === "P")
        c.join(o, c("c_custkey") === o("o_custkey"), "left_anti")
          .select(col("c_custkey"), col("c_mktsegment"))
          .orderBy(col("c_custkey"))
      },
      Some("""SELECT c_custkey, c_mktsegment FROM customer c
              WHERE NOT EXISTS (SELECT 1 FROM orders
                                WHERE o_custkey = c.c_custkey
                                  AND o_orderstatus = 'P')
              ORDER BY c_custkey""")),

    // ---- cross join (crossJoinIter join_iters.go:587)
    QueryDef(
      "join_cross",
      (s, d) => {
        val r = t("region")(s, d).select(col("r_name"))
        val st = t("orders")(s, d).select(col("o_orderstatus")).distinct()
        r.crossJoin(st).orderBy(col("r_name"), col("o_orderstatus"))
      },
      Some("""SELECT r_name, o_orderstatus
              FROM region CROSS JOIN (SELECT DISTINCT o_orderstatus FROM orders)
              ORDER BY r_name, o_orderstatus""")),

    // ---- non-equi / band join (rangeHeapJoinIter range_heap_iter.go:18):
    //      Catalyst plans broadcast-nested-loop; the small side is broadcast.
    QueryDef(
      "join_band",
      (s, d) => {
        val c = t("customer")(s, d)
        val sp = t("supplier")(s, d)
        c.join(dim(sp),
            c("c_acctbal").between(sp("s_acctbal") - 100, sp("s_acctbal") + 100))
          .groupBy(col("s_suppkey"))
          .agg(count(lit(1)).as("n_near"))
          .orderBy(col("s_suppkey"))
      },
      Some("""SELECT s_suppkey, COUNT(*) AS n_near
              FROM customer JOIN supplier
                ON c_acctbal BETWEEN s_acctbal - 100 AND s_acctbal + 100
              GROUP BY s_suppkey ORDER BY s_suppkey""")),

    // ---- bucketed band join — the SURVEY §2.3 "optional custom strategy"
    //      realized as plan composition instead of a SparkStrategy: map each
    //      build row onto the ≤3 width-100 buckets its ±100 band overlaps
    //      (explode), map each probe row to its own bucket, equi-join on the
    //      bucket key, then filter exact. Catalyst plans a HASH join on
    //      `bucket`, so at 100 TB this shuffles by bucket instead of
    //      broadcast-nested-loop scanning every pair — O(n + m·3) rows
    //      through a hash join vs O(n·m) comparisons.
    QueryDef(
      "join_band_bucketed",
      (s, d) => {
        val w = 100
        val c = t("customer")(s, d)
          .withColumn("bucket", floor(col("c_acctbal") / w).cast("long"))
        val sp = t("supplier")(s, d)
          .withColumn("bucket", explode(sequence(
            floor((col("s_acctbal") - 100) / w).cast("long"),
            floor((col("s_acctbal") + 100) / w).cast("long"))))
        c.join(sp, Seq("bucket"))
          .filter(col("c_acctbal")
            .between(col("s_acctbal") - 100, col("s_acctbal") + 100))
          .groupBy(col("s_suppkey"))
          .agg(count(lit(1)).as("n_near"))
          .orderBy(col("s_suppkey"))
      },
      Some("""SELECT s_suppkey, COUNT(*) AS n_near
              FROM customer JOIN supplier
                ON c_acctbal BETWEEN s_acctbal - 100 AND s_acctbal + 100
              GROUP BY s_suppkey ORDER BY s_suppkey""")),

    // ---- USING-style join (shared key name; natural-join family)
    QueryDef(
      "join_using",
      (s, d) => {
        val n = t("nation")(s, d)
          .select(col("n_regionkey").as("regionkey"), col("n_name"))
        val r = t("region")(s, d)
          .select(col("r_regionkey").as("regionkey"), col("r_name"))
        n.join(r, Seq("regionkey"))
          .orderBy(col("regionkey"), col("n_name"), col("r_name"))
      },
      Some("""SELECT regionkey, n_name, r_name
              FROM (SELECT n_regionkey AS regionkey, n_name FROM nation) n
              JOIN (SELECT r_regionkey AS regionkey, r_name FROM region) r
                USING (regionkey)
              ORDER BY regionkey, n_name, r_name""")),

    // ---- TPC-H Q3-style 3-way join + agg + top-k (headline)
    QueryDef(
      "join_q3_shipping",
      (s, d) => {
        val c = t("customer")(s, d).filter(col("c_mktsegment") === "BUILDING")
        val o = t("orders")(s, d).filter(col("o_orderdate") < lit("1995-03-15"))
        val l = t("lineitem")(s, d).filter(col("l_shipdate") > lit("1995-03-15"))
        l.join(o, l("l_orderkey") === o("o_orderkey"))
          .join(dim(c), o("o_custkey") === c("c_custkey"))
          .groupBy(col("l_orderkey"), col("o_orderdate").cast("date").as("o_orderdate"))
          .agg(sum(col("l_extendedprice").cast(DecimalType(12, 2)) *
            (lit(1) - col("l_discount").cast(DecimalType(4, 2))))
            .cast("double").as("revenue"))
          .orderBy(col("revenue").desc, col("l_orderkey"))
          .limit(10)
      },
      Some("""SELECT l_orderkey, CAST(o_orderdate AS DATE) AS o_orderdate,
                CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) *
                         (1 - CAST(l_discount AS DECIMAL(4,2)))) AS DOUBLE)
                  AS revenue
              FROM lineitem
              JOIN orders ON l_orderkey = o_orderkey
              JOIN customer ON o_custkey = c_custkey
              WHERE c_mktsegment = 'BUILDING'
                AND o_orderdate < '1995-03-15' AND l_shipdate > '1995-03-15'
              GROUP BY l_orderkey, CAST(o_orderdate AS DATE)
              ORDER BY revenue DESC, l_orderkey LIMIT 10"""),
      headline = true),

    // ---- TPC-H Q5-style 6-way join (headline): dims broadcast, facts shuffle
    QueryDef(
      "join_q5_local_supplier",
      (s, d) => {
        val r = t("region")(s, d).filter(col("r_name") === "ASIA")
        val n = t("nation")(s, d)
        val c = t("customer")(s, d)
        val o = t("orders")(s, d)
          .filter(col("o_orderdate") >= lit("1994-01-01") &&
                  col("o_orderdate") < lit("1996-01-01"))
        val l = t("lineitem")(s, d)
        val sp = t("supplier")(s, d)
        // the ASIA filter reaches the fact table through the supplier
        // chain BEFORE the fact-fact orders join: supplier ⋈ nation ⋈
        // region(ASIA) prunes lineitem to ~1/5 of its rows first (guide
        // §3 — reduce the big side before shuffling it); inner joins
        // commute, so the result is unchanged
        l.join(sp, l("l_suppkey") === sp("s_suppkey"))
          .join(broadcast(n), sp("s_nationkey") === n("n_nationkey"))
          .join(broadcast(r), n("n_regionkey") === r("r_regionkey"))
          .join(o, l("l_orderkey") === o("o_orderkey"))
          .join(dim(c),
            o("o_custkey") === c("c_custkey") &&
              c("c_nationkey") === sp("s_nationkey"))
          .groupBy(col("n_name"))
          .agg(sum(col("l_extendedprice").cast(DecimalType(12, 2)) *
            (lit(1) - col("l_discount").cast(DecimalType(4, 2))))
            .cast("double").as("revenue"))
          .orderBy(col("revenue").desc, col("n_name"))
      },
      Some("""SELECT n_name,
                CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) *
                         (1 - CAST(l_discount AS DECIMAL(4,2)))) AS DOUBLE)
                  AS revenue
              FROM lineitem
              JOIN orders ON l_orderkey = o_orderkey
              JOIN supplier ON l_suppkey = s_suppkey
              JOIN customer ON o_custkey = c_custkey
                           AND c_nationkey = s_nationkey
              JOIN nation ON c_nationkey = n_nationkey
              JOIN region ON n_regionkey = r_regionkey
              WHERE r_name = 'ASIA'
                AND o_orderdate >= '1994-01-01' AND o_orderdate < '1996-01-01'
              GROUP BY n_name ORDER BY revenue DESC, n_name"""),
      headline = true),

    // ---- LATERAL join (correlated FROM-clause subquery; reference
    //      JoinTypeLateral* sql/plan/join.go:63-66). Spark 3.4+ parses
    //      LATERAL natively; Catalyst decorrelates the aggregate subquery
    //      into a left outer aggregate join — no per-row re-execution, so
    //      it scales as one shuffle at 100 TB rather than N index probes.
    QueryDef(
      "join_lateral",
      (s, d) => {
        Tables.register(s, d, "customer", "orders")
        s.sql("""SELECT c.c_custkey, t.n_ord, t.max_price
                 FROM customer c
                 JOIN LATERAL (
                   SELECT count(o_orderkey) AS n_ord,
                          max(o_totalprice) AS max_price
                   FROM orders WHERE o_custkey = c.c_custkey) t
                 ORDER BY c.c_custkey""")
      },
      Some("""SELECT c.c_custkey, t.n_ord, t.max_price
              FROM customer c
              JOIN LATERAL (
                SELECT count(o_orderkey) AS n_ord,
                       max(o_totalprice) AS max_price
                FROM orders WHERE o_custkey = c.c_custkey) t ON TRUE
              ORDER BY c.c_custkey""")),

    // ---- salted JOIN — the 100 TB skew-join pattern (companion to
    //      agg_salted). l_returnflag has 3 values, so a plain shuffled join
    //      funnels a third of the fact table through one reducer; salting
    //      the fact side 8 ways and replicating the dimension row per salt
    //      spreads each hot key over 8 partitions. shuffle_hash hint keeps
    //      the join shuffled (a broadcast would hide the pattern); result
    //      is identical to the unsalted join, which the oracle verifies.
    //      (AQE's skewJoin handles this automatically for sort-merge joins;
    //      the explicit salt is the portable form.)
    QueryDef(
      "join_salted",
      (s, d) => {
        import s.implicits._
        val SALT = 8
        val dim = Seq(("A", "accepted"), ("N", "new"), ("R", "returned"))
          .toDF("flag", "label")
          .withColumn("d_salt", explode(sequence(lit(0), lit(SALT - 1))))
        val fact = Tables.t(s, d, "lineitem")
          .withColumn("salt", pmod(col("l_orderkey"), lit(SALT)).cast("int"))
        fact
          .join(dim.hint("shuffle_hash"), col("l_returnflag") === col("flag") &&
            col("salt") === col("d_salt"))
          .groupBy(col("label"))
          .agg(count(lit(1)).as("n"), dsum(col("l_quantity")).as("sum_qty"))
          .orderBy(col("label"))
      },
      Some(s"""SELECT label, COUNT(*) AS n, ${sqlSum("l_quantity")} AS sum_qty
               FROM lineitem
               JOIN (VALUES ('A', 'accepted'), ('N', 'new'), ('R', 'returned'))
                 AS t(flag, label) ON l_returnflag = flag
               GROUP BY label ORDER BY label"""))
  )
}
