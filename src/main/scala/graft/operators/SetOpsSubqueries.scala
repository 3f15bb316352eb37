package graft.operators

import graft.{Det, QueryDef, Tables}
import graft.plans.RecursiveCte
import org.apache.spark.sql.functions._

/** Set operations, subqueries and CTEs — SURVEY.md §2.7/§2.9.
  *
  * Reference: `SetOp` sql/plan/set_op.go:32 (UNION/INTERSECT/EXCEPT ×
  * DISTINCT/ALL, exec rel.go:817); subqueries sql/plan/subquery.go:31 and
  * insubquery.go:29 with decorrelation rules unnest_in_subqueries.go:42 /
  * unnest_exists_subqueries.go; CTEs sql/planbuilder/cte.go:28, recursive
  * plan/recursive_cte.go:45.
  *
  * Spark: all set ops native; IN/EXISTS/scalar subqueries are decorrelated
  * by Catalyst's RewritePredicateSubquery into semi/anti joins — the SQL
  * forms below go through `spark.sql` against registered views so the whole
  * subquery machinery is exercised. Recursive CTE uses the driver loop in
  * [[graft.plans.RecursiveCte]].
  */
object SetOpsSubqueries {
  import Det._

  /** register only the tables the statement touches, then run it */
  private def sql(tables: String*)(q: String)(
      s: org.apache.spark.sql.SparkSession, d: String) = {
    Tables.register(s, d, tables: _*)
    s.sql(q)
  }

  val defs: Seq[QueryDef] = Seq(

    // ---- UNION DISTINCT / UNION ALL
    QueryDef(
      "set_union",
      (s, d) => {
        val c = Tables.t(s, d, "customer")
          .select(col("c_nationkey").as("nationkey"))
        val sp = Tables.t(s, d, "supplier")
          .select(col("s_nationkey").as("nationkey"))
        c.union(sp).distinct().orderBy(col("nationkey"))
      },
      Some("""SELECT c_nationkey AS nationkey FROM customer
              UNION SELECT s_nationkey FROM supplier ORDER BY nationkey""")),

    QueryDef(
      "set_union_all",
      (s, d) => {
        val c = Tables.t(s, d, "customer")
          .select(col("c_nationkey").as("nationkey"))
        val sp = Tables.t(s, d, "supplier")
          .select(col("s_nationkey").as("nationkey"))
        c.unionAll(sp)
          .groupBy(col("nationkey")).agg(count(lit(1)).as("n"))
          .orderBy(col("nationkey"))
      },
      Some("""SELECT nationkey, COUNT(*) AS n FROM (
                SELECT c_nationkey AS nationkey FROM customer
                UNION ALL SELECT s_nationkey FROM supplier)
              GROUP BY nationkey ORDER BY nationkey""")),

    // ---- INTERSECT / EXCEPT (DISTINCT + ALL flavors)
    QueryDef(
      "set_intersect",
      (s, d) => {
        val cust = Tables.t(s, d, "customer").select(col("c_nationkey").as("k"))
        val supp = Tables.t(s, d, "supplier").select(col("s_nationkey").as("k"))
        cust.intersect(supp).orderBy(col("k"))
      },
      Some("""SELECT c_nationkey AS k FROM customer
              INTERSECT SELECT s_nationkey FROM supplier ORDER BY k""")),

    QueryDef(
      "set_except",
      (s, d) => {
        // customer nations ⊆ supplier nations at small SF, which left the
        // original customer-vs-supplier EXCEPT vacuously empty; except a
        // proper filtered subset so the operator's output is observable
        val cust = Tables.t(s, d, "customer").select(col("c_nationkey").as("k"))
        val low = Tables.t(s, d, "customer")
          .filter(col("c_nationkey") < 10)
          .select(col("c_nationkey").as("k"))
        cust.except(low).orderBy(col("k"))
      },
      Some("""SELECT c_nationkey AS k FROM customer
              EXCEPT SELECT c_nationkey FROM customer WHERE c_nationkey < 10
              ORDER BY k""")),

    QueryDef(
      "set_intersect_all",
      (s, d) => {
        val a = Tables.t(s, d, "orders").select(col("o_custkey").as("k"))
        val b = Tables.t(s, d, "customer").select(col("c_custkey").as("k"))
        a.intersectAll(b).groupBy(col("k")).agg(count(lit(1)).as("n"))
          .orderBy(col("k"))
      },
      Some("""SELECT k, COUNT(*) AS n FROM (
                SELECT o_custkey AS k FROM orders
                INTERSECT ALL SELECT c_custkey FROM customer)
              GROUP BY k ORDER BY k""")),

    QueryDef(
      "set_except_all",
      (s, d) => {
        val a = Tables.t(s, d, "orders").select(col("o_custkey").as("k"))
        val b = Tables.t(s, d, "customer").select(col("c_custkey").as("k"))
        a.exceptAll(b).groupBy(col("k")).agg(count(lit(1)).as("n"))
          .orderBy(col("k"))
      },
      Some("""SELECT k, COUNT(*) AS n FROM (
                SELECT o_custkey AS k FROM orders
                EXCEPT ALL SELECT c_custkey FROM customer)
              GROUP BY k ORDER BY k""")),

    // ---- scalar subquery (plan/subquery.go:31)
    QueryDef(
      "subq_scalar",
      sql("orders", "lineitem")("""SELECT o_orderkey, o_totalprice FROM orders
             WHERE o_totalprice > 1.5 * (
               SELECT CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
                      / COUNT(*) FROM orders)
             ORDER BY o_orderkey, o_totalprice"""),
      Some("""SELECT o_orderkey, o_totalprice FROM orders
              WHERE o_totalprice > 1.5 * (
                SELECT CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
                       / COUNT(*) FROM orders)
              ORDER BY o_orderkey, o_totalprice""")),

    // ---- IN subquery -> semi join (unnest_in_subqueries.go:42)
    QueryDef(
      "subq_in",
      sql("customer", "orders")("""SELECT c_custkey, c_name FROM customer
             WHERE c_custkey IN (
               SELECT o_custkey FROM orders WHERE o_totalprice > 400000)
             ORDER BY c_custkey"""),
      Some("""SELECT c_custkey, c_name FROM customer
              WHERE c_custkey IN (
                SELECT o_custkey FROM orders WHERE o_totalprice > 400000)
              ORDER BY c_custkey""")),

    // ---- correlated EXISTS -> decorrelated semi join
    QueryDef(
      "subq_exists_correlated",
      sql("supplier", "lineitem")("""SELECT s_suppkey, s_name FROM supplier
             WHERE EXISTS (
               SELECT 1 FROM lineitem
               WHERE l_suppkey = s_suppkey AND l_quantity >= 49)
             ORDER BY s_suppkey"""),
      Some("""SELECT s_suppkey, s_name FROM supplier
              WHERE EXISTS (
                SELECT 1 FROM lineitem
                WHERE l_suppkey = s_suppkey AND l_quantity >= 49)
              ORDER BY s_suppkey""")),

    // ---- correlated scalar subquery in projection
    QueryDef(
      "subq_scalar_correlated",
      sql("nation", "customer")("""SELECT n_nationkey, n_name,
               (SELECT COUNT(*) FROM customer WHERE c_nationkey = n_nationkey)
                 AS n_customers
             FROM nation ORDER BY n_nationkey"""),
      Some("""SELECT n_nationkey, n_name,
                (SELECT COUNT(*) FROM customer WHERE c_nationkey = n_nationkey)
                  AS n_customers
              FROM nation ORDER BY n_nationkey""")),

    // ---- NOT IN (null-aware anti join: inner side contains no NULLs here;
    //      the all-NULL poisoning case is covered in the spec suite)
    QueryDef(
      "subq_not_in",
      sql("customer", "orders")("""SELECT c_custkey FROM customer
             WHERE c_custkey NOT IN (
               SELECT o_custkey FROM orders WHERE o_totalprice > 300000)
             ORDER BY c_custkey"""),
      Some("""SELECT c_custkey FROM customer
              WHERE c_custkey NOT IN (
                SELECT o_custkey FROM orders WHERE o_totalprice > 300000)
              ORDER BY c_custkey""")),

    // ---- plain CTE (sql/planbuilder/cte.go:28)
    QueryDef(
      "cte_basic",
      sql("nation", "customer")("""WITH nat AS (
               SELECT n_nationkey, n_name FROM nation),
             cust_per_nat AS (
               SELECT c_nationkey, COUNT(*) AS n_cust
               FROM customer GROUP BY c_nationkey)
             SELECT n_name, COALESCE(n_cust, 0) AS n_cust
             FROM nat LEFT JOIN cust_per_nat ON n_nationkey = c_nationkey
             ORDER BY n_name"""),
      Some("""WITH nat AS (
                SELECT n_nationkey, n_name FROM nation),
              cust_per_nat AS (
                SELECT c_nationkey, COUNT(*) AS n_cust
                FROM customer GROUP BY c_nationkey)
              SELECT n_name, COALESCE(n_cust, 0) AS n_cust
              FROM nat LEFT JOIN cust_per_nat ON n_nationkey = c_nationkey
              ORDER BY n_name""")),

    // ---- recursive CTE (plan/recursive_cte.go:45) via driver iteration
    QueryDef(
      "cte_recursive",
      (s, _) => {
        import s.implicits._
        val seed = Seq(1L).toDF("n")
        val out = RecursiveCte.unionAll(
          seed, prev => prev.select((col("n") * 2).as("n")).filter(col("n") <= 1024))
        out.orderBy(col("n"))
      },
      Some("""WITH RECURSIVE t(n) AS (
                SELECT CAST(1 AS BIGINT)
                UNION ALL SELECT n*2 FROM t WHERE n*2 <= 1024)
              SELECT n FROM t ORDER BY n""")),

    // ---- WITH RECURSIVE as literal SQL TEXT (reference
    //      sql/planbuilder/cte.go:87): the dialect layer intercepts the
    //      statement (Spark's parser has no recursive CTEs) and drives the
    //      same semi-naive working-table loop as cte_recursive. This form
    //      exercises a table-sourced anchor, a column list, and UNION
    //      DISTINCT semantics; DuckDB runs the identical statement
    //      natively as the oracle.
    QueryDef(
      "cte_recursive_sql",
      (s, d) => {
        Tables.register(s, d, "nation")
        new graft.Engine(s).query(
          """WITH RECURSIVE walk (k) AS (
               SELECT n_nationkey FROM nation WHERE n_nationkey < 3
               UNION
               SELECT k + 5 FROM walk WHERE k < 20
             )
             SELECT k FROM walk ORDER BY k""")
      },
      Some("""WITH RECURSIVE walk (k) AS (
                SELECT n_nationkey FROM nation WHERE n_nationkey < 3
                UNION
                SELECT k + 5 FROM walk WHERE k < 20)
              SELECT k FROM walk ORDER BY k""")),

    // ---- set-op branch coercion (resolve_unions.go: MySQL promotion
    //      across UNION branches). Spark SQL's implicit-cast resolution
    //      widens int+double -> double and int+string per its own rules;
    //      we pin the MySQL-compatible cases (numeric widening).
    QueryDef(
      "set_union_coerce",
      (s, d) => {
        Tables.register(s, d, "nation", "region")
        s.sql("""SELECT k, v FROM (
                   SELECT n_nationkey AS k, n_nationkey AS v FROM nation
                   UNION ALL
                   SELECT r_regionkey AS k, r_regionkey + 0.5 AS v FROM region)
                 ORDER BY k, v""")
      },
      Some("""SELECT k, v FROM (
                SELECT n_nationkey AS k, CAST(n_nationkey AS DOUBLE) AS v FROM nation
                UNION ALL
                SELECT r_regionkey AS k, r_regionkey + 0.5 AS v FROM region)
              ORDER BY k, v"""))
  )
}
