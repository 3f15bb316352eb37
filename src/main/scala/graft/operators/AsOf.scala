package graft.operators

import graft.{QueryDef, Tables}
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** AS-OF (point-in-time) join — the canonical operator Spark lacks
  * (reference exposes `AS OF` only as Dolt time-travel; the dataflow
  * operator itself is the north-star training-pipeline need: join each
  * event to the most recent snapshot at-or-before its timestamp).
  *
  * Spark-first realization (preference (a) of SURVEY §7.3: compose
  * built-ins, no custom SparkStrategy): tag and union both sides, ONE
  * shuffle on (key, ts), then a running `last(..., ignoreNulls)` window
  * carries each snapshot forward to the events that follow it. At 100 TB
  * this is exactly one exchange + one in-partition sort — same cost shape
  * as a sort-merge join, with no per-row probing.
  */
object AsOf {

  /** Left rows joined to the latest right row with rightTs <= leftTs.
    * `payload` columns from the right side are carried forward; left rows
    * with no preceding right row get NULLs (ASOF LEFT JOIN semantics). */
  def join(left: DataFrame, right: DataFrame, key: String,
           leftTs: String, rightTs: String, payload: Seq[String]): DataFrame = {
    val l = left.withColumn("__snap", lit(0))
      .withColumn("__ts", col(leftTs))
    val r0 = right.withColumn("__snap", lit(1))
      .withColumn("__ts", col(rightTs))
    // align schemas: left gets null payload cols, right gets null left cols
    val leftOnly = left.columns.filterNot(c => c == key)
    val rightPayloadNulls = payload.foldLeft(l) { (df, c) =>
      df.withColumn(c, lit(null).cast(right.schema(c).dataType))
    }
    val leftColNulls = r0.select(
      (Seq(col(key), col("__snap"), col("__ts")) ++
        payload.map(col) ++
        leftOnly.map(c => lit(null).cast(left.schema(c).dataType).as(c))): _*)
    val unioned = rightPayloadNulls
      .select((Seq(col(key), col("__snap"), col("__ts")) ++
        payload.map(col) ++ leftOnly.map(col)): _*)
      .unionByName(leftColNulls)
    // snapshots sort before events at identical ts so ties are visible
    val w = Window.partitionBy(col(key))
      .orderBy(col("__ts").asc, col("__snap").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carried = payload.foldLeft(unioned) { (df, c) =>
      df.withColumn(s"asof_$c",
        last(when(col("__snap") === 1, col(c)), ignoreNulls = true).over(w))
    }.withColumn("asof_ts",
      last(when(col("__snap") === 1, col("__ts")), ignoreNulls = true).over(w))
    carried.filter(col("__snap") === 0)
      .drop("__snap", "__ts").drop(payload: _*)
  }

  val defs: Seq[QueryDef] = Seq(

    // ---- as-of join: each event joined to its user's most recent daily
    //      snapshot (snapshots exist only for days with >= 5 events, so
    //      the matched snapshot is often days old or absent). Oracle:
    //      DuckDB's native ASOF LEFT JOIN.
    QueryDef(
      "events_asof_join",
      (s, d) => {
        val ev = Tables.t(s, d, "events")
          .select(col("event_id"), col("user_id"), col("ts"), col("value"))
        val snaps = ev
          .groupBy(col("user_id"), date_trunc("day", col("ts")).as("snap_ts"))
          .agg(count(lit(1)).as("n_ev"),
            sum(col("value").cast("decimal(18,2)")).cast("double").as("day_sum"))
          .filter(col("n_ev") >= 5)
          .select(col("user_id"), col("snap_ts"), col("day_sum"))
        join(ev, snaps, "user_id", "ts", "snap_ts", Seq("day_sum"))
          .select(col("event_id"), col("user_id"),
            col("asof_day_sum"), col("asof_ts"))
          .orderBy(col("event_id"))
      },
      Some("""WITH snaps AS (
                SELECT user_id, CAST(date_trunc('day', ts) AS TIMESTAMP) AS snap_ts,
                       CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE)
                         AS day_sum
                FROM events GROUP BY 1, 2 HAVING COUNT(*) >= 5)
              SELECT e.event_id, e.user_id,
                     s.day_sum AS asof_day_sum, s.snap_ts AS asof_ts
              FROM events e
              ASOF LEFT JOIN snaps s
                ON e.user_id = s.user_id AND e.ts >= s.snap_ts
              ORDER BY e.event_id"""))
  )
}
