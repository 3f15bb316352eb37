package graft.plans

import org.apache.spark.sql.DataFrame

/** Recursive CTE driver loop — SURVEY.md §2.1/§2.9.
  *
  * The reference implements `WITH RECURSIVE` as a working-table iteration
  * (`RecursiveCte`/`RecursiveTable`, sql/plan/recursive_cte.go:45, UNION
  * [DISTINCT] semantics with a depth limit). Spark has no native recursive
  * CTE, so we run the same semi-naive iteration on the driver: each step
  * evaluates the recursive term against the previous delta only, and the
  * accumulated result is the union of all deltas.
  *
  * Scale note: each iteration is a full distributed job; the loop count is
  * the recursion depth (bounded by `maxDepth`, like the reference's
  * @@max_cte_depth), not the data size — so this holds at 100 TB provided
  * the recursion is shallow (hierarchies, sequences), which is the only
  * workload recursive CTEs serve in the reference too.
  */
object RecursiveCte {

  /** UNION ALL variant (WITH RECURSIVE ... UNION ALL ...). `maxRows`
    * implements MySQL's LIMIT-in-recursive-member semantics: the cap is
    * on the CUMULATIVE row count (anchor included) and stops the
    * iteration (cte.go pushdown of the limit into the working-table
    * loop). The per-iteration count() only runs when a cap is set, so
    * uncapped recursions pay nothing. */
  def unionAll(seed: DataFrame, step: DataFrame => DataFrame,
               maxDepth: Int = 100,
               maxRows: Long = Long.MaxValue): DataFrame = {
    var acc = seed
    var total = if (maxRows == Long.MaxValue) 0L else seed.count()
    var delta = seed
    var depth = 0
    while (depth < maxDepth && total < maxRows && !delta.isEmpty) {
      delta = step(delta).localCheckpoint(eager = true)
      if (!delta.isEmpty) {
        acc = acc.unionAll(delta)
        if (maxRows != Long.MaxValue) total += delta.count()
      }
      depth += 1
    }
    if (maxRows != Long.MaxValue) acc.limit(maxRows.toInt) else acc
  }

  /** UNION DISTINCT variant: new rows already seen do not re-enter the
    * working table (the reference's default UNION semantics). */
  def unionDistinct(seed: DataFrame, step: DataFrame => DataFrame,
                    maxDepth: Int = 100,
                    maxRows: Long = Long.MaxValue): DataFrame = {
    var acc = seed.distinct().localCheckpoint(eager = true)
    var total = if (maxRows == Long.MaxValue) 0L else acc.count()
    var delta = acc
    var depth = 0
    while (depth < maxDepth && total < maxRows && !delta.isEmpty) {
      delta = step(delta).distinct().exceptAll(acc).localCheckpoint(eager = true)
      if (!delta.isEmpty) {
        acc = acc.unionAll(delta).localCheckpoint(eager = true)
        if (maxRows != Long.MaxValue) total += delta.count()
      }
      depth += 1
    }
    if (maxRows != Long.MaxValue) acc.limit(maxRows.toInt) else acc
  }
}
