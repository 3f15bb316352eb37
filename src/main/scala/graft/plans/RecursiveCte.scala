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
  * cteRecursionLimit, sql/rowexec/rel_iters.go:549), not the data size —
  * so this holds at 100 TB provided the recursion is shallow
  * (hierarchies, sequences), which is the only workload recursive CTEs
  * serve in the reference too.
  *
  * Deep-but-narrow recursions (`inputs(x) as (select 1 union select x+1
  * …)` counting to thousands) would pay several Spark jobs of fixed
  * overhead PER ROW in the distributed loop; the reference iterates them
  * row-at-a-time in memory. The local fast path below mirrors that: while
  * the working set stays under `LocalRowCap`, rows accumulate driver-side
  * and each step is one job over a local relation; the loop hands off to
  * the distributed form the moment the set outgrows the cap.
  */
object RecursiveCte {

  /** Working-set size up to which the driver-local loop runs; beyond it
    * the iteration continues distributed (checkpointed deltas). */
  private val LocalRowCap = 65536

  private def limitOf(df: DataFrame, maxRows: Long): DataFrame =
    if (maxRows != Long.MaxValue)
      df.limit(math.min(maxRows, Int.MaxValue.toLong).toInt)
    else df

  /** Collect a frame if it is small; None = keep distributed. */
  private def collectSmall(df: DataFrame): Option[Array[org.apache.spark.sql.Row]] = {
    val head = df.limit(LocalRowCap + 1).collect()
    if (head.length > LocalRowCap) None else Some(head)
  }

  private def localDF(spark: org.apache.spark.sql.SparkSession,
                      rows: Seq[org.apache.spark.sql.Row],
                      schema: org.apache.spark.sql.types.StructType): DataFrame = {
    import scala.jdk.CollectionConverters._
    spark.createDataFrame(rows.asJava, schema)
  }

  /** UNION ALL variant (WITH RECURSIVE ... UNION ALL ...). `maxRows`
    * implements MySQL's LIMIT-in-recursive-member semantics: the cap is
    * on the CUMULATIVE row count (anchor included) and stops the
    * iteration (cte.go pushdown of the limit into the working-table
    * loop). The per-iteration count() only runs when a cap is set, so
    * uncapped recursions pay nothing. */
  def unionAll(seed: DataFrame, step: DataFrame => DataFrame,
               maxDepth: Int = 100,
               maxRows: Long = Long.MaxValue): DataFrame = {
    val spark = seed.sparkSession
    val schema = seed.schema
    collectSmall(seed) match {
      case Some(seedRows) =>
        val acc = scala.collection.mutable.ArrayBuffer[org.apache.spark.sql.Row](seedRows: _*)
        var delta: Seq[org.apache.spark.sql.Row] = seedRows.toSeq
        var depth = 0
        // A single expanding iteration (join-shaped recursive member)
        // can fan a 64k working set into millions of rows; never
        // materialize that on the driver — collectSmall bounds the
        // fetch and a too-big delta hands off distributed immediately.
        var bigDelta: Option[DataFrame] = None
        while (bigDelta.isEmpty && depth < maxDepth && acc.length < maxRows &&
               delta.nonEmpty && acc.length <= LocalRowCap) {
          val stepDf = step(localDF(spark, delta, schema))
          collectSmall(stepDf) match {
            case Some(rows) =>
              delta = rows.toSeq
              acc ++= delta
            case None =>
              bigDelta = Some(stepDf.localCheckpoint(eager = true))
          }
          depth += 1
        }
        bigDelta match {
          case Some(dd) =>
            val accDf = localDF(spark, acc.toSeq, schema).unionAll(dd)
            unionAllDistributed(accDf, dd, step, maxDepth - depth, maxRows,
              if (maxRows == Long.MaxValue) 0L
              else acc.length.toLong + dd.count())
          case None =>
            if (delta.nonEmpty && depth >= maxDepth && acc.length < maxRows)
              throw new IllegalStateException(
                "recursive CTE exceeded iteration limit " + maxDepth)
            if (acc.length > LocalRowCap && delta.nonEmpty &&
                acc.length < maxRows)
              // outgrew the local cap: continue distributed from here
              unionAllDistributed(localDF(spark, acc.toSeq, schema),
                localDF(spark, delta, schema), step,
                maxDepth - depth, maxRows, acc.length.toLong)
            else limitOf(localDF(spark, acc.toSeq, schema), maxRows)
        }
      case None =>
        unionAllDistributed(seed, seed, step, maxDepth, maxRows,
          if (maxRows == Long.MaxValue) 0L else seed.count())
    }
  }

  private def unionAllDistributed(acc0: DataFrame, delta0: DataFrame,
      step: DataFrame => DataFrame, maxDepth: Int, maxRows: Long,
      total0: Long): DataFrame = {
    var acc = acc0
    var total = total0
    var delta = delta0
    var depth = 0
    while (depth < maxDepth && total < maxRows && !delta.isEmpty) {
      delta = step(delta).localCheckpoint(eager = true)
      if (!delta.isEmpty) {
        acc = acc.unionAll(delta)
        if (maxRows != Long.MaxValue) total += delta.count()
      }
      depth += 1
    }
    if (depth >= maxDepth && total < maxRows && !delta.isEmpty)
      throw new IllegalStateException(
        "recursive CTE exceeded iteration limit " + maxDepth)
    limitOf(acc, maxRows)
  }

  /** UNION DISTINCT variant: new rows already seen do not re-enter the
    * working table (the reference's default UNION semantics). */
  def unionDistinct(seed: DataFrame, step: DataFrame => DataFrame,
                    maxDepth: Int = 100,
                    maxRows: Long = Long.MaxValue): DataFrame = {
    val spark = seed.sparkSession
    val schema = seed.schema
    collectSmall(seed) match {
      case Some(seedRows) =>
        val seen = scala.collection.mutable.LinkedHashSet.empty[Seq[Any]]
        val acc = scala.collection.mutable.ArrayBuffer.empty[org.apache.spark.sql.Row]
        def add(r: org.apache.spark.sql.Row): Boolean =
          seen.add(r.toSeq) && { acc += r; true }
        var delta: Seq[org.apache.spark.sql.Row] =
          seedRows.toSeq.filter(add)
        var depth = 0
        // Bounded per-step fetch, like unionAll above: a delta that
        // alone exceeds the cap is never collected — hand off.
        var bigDelta: Option[DataFrame] = None
        while (bigDelta.isEmpty && depth < maxDepth && acc.length < maxRows &&
               delta.nonEmpty && acc.length <= LocalRowCap) {
          val stepDf = step(localDF(spark, delta, schema))
          collectSmall(stepDf) match {
            case Some(rows) => delta = rows.toSeq.filter(add)
            case None =>
              bigDelta = Some(stepDf.localCheckpoint(eager = true))
          }
          depth += 1
        }
        bigDelta match {
          case Some(dd) =>
            val accDf = localDF(spark, acc.toSeq, schema)
              .localCheckpoint(eager = true)
            val freshDelta = dd.distinct().exceptAll(accDf)
              .localCheckpoint(eager = true)
            val newAcc = accDf.unionAll(freshDelta)
              .localCheckpoint(eager = true)
            unionDistinctDistributed(newAcc, freshDelta, step,
              maxDepth - depth, maxRows,
              if (maxRows == Long.MaxValue) 0L
              else acc.length.toLong + freshDelta.count())
          case None =>
            if (delta.nonEmpty && depth >= maxDepth && acc.length < maxRows)
              throw new IllegalStateException(
                "recursive CTE exceeded iteration limit " + maxDepth)
            if (acc.length > LocalRowCap && delta.nonEmpty &&
                acc.length < maxRows)
              unionDistinctDistributed(
                localDF(spark, acc.toSeq, schema).localCheckpoint(eager = true),
                localDF(spark, delta, schema), step,
                maxDepth - depth, maxRows, acc.length.toLong)
            else limitOf(localDF(spark, acc.toSeq, schema), maxRows)
        }
      case None =>
        val acc0 = seed.distinct().localCheckpoint(eager = true)
        unionDistinctDistributed(acc0, acc0, step, maxDepth, maxRows,
          if (maxRows == Long.MaxValue) 0L else acc0.count())
    }
  }

  private def unionDistinctDistributed(acc0: DataFrame, delta0: DataFrame,
      step: DataFrame => DataFrame, maxDepth: Int, maxRows: Long,
      total0: Long): DataFrame = {
    var acc = acc0
    var total = total0
    var delta = delta0
    var depth = 0
    while (depth < maxDepth && total < maxRows && !delta.isEmpty) {
      delta = step(delta).distinct().exceptAll(acc).localCheckpoint(eager = true)
      if (!delta.isEmpty) {
        acc = acc.unionAll(delta).localCheckpoint(eager = true)
        if (maxRows != Long.MaxValue) total += delta.count()
      }
      depth += 1
    }
    if (depth >= maxDepth && total < maxRows && !delta.isEmpty)
      throw new IllegalStateException(
        "recursive CTE exceeded iteration limit " + maxDepth)
    limitOf(acc, maxRows)
  }
}
