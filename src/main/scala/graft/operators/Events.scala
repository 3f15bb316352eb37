package graft.operators

import graft.{QueryDef, Tables}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Event-stream analytics over the `events` table, treated relationally
  * (the reference has no streaming subsystem — SURVEY.md §2.10; the
  * Structured Streaming variant of these shapes lives in graft.streaming).
  */
object Events {

  val defs: Seq[QueryDef] = Seq(

    // ---- tumbling-window aggregation (hourly buckets per event type)
    QueryDef(
      "events_hourly",
      (s, d) =>
        Tables.t(s, d, "events")
          .groupBy(
            date_trunc("hour", col("ts")).as("hour"),
            col("event_type"))
          .agg(
            count(lit(1)).as("n"),
            sum(col("value").cast(DecimalType(14, 2))).cast("double").as("total_value"),
            countDistinct(col("user_id")).as("n_users"))
          .orderBy(col("hour"), col("event_type")),
      Some("""SELECT date_trunc('hour', ts) AS hour, event_type,
                COUNT(*) AS n,
                CAST(SUM(CAST(value AS DECIMAL(14,2))) AS DOUBLE) AS total_value,
                COUNT(DISTINCT user_id) AS n_users
              FROM events GROUP BY 1, 2 ORDER BY hour, event_type""")),

    // ---- sessionization: 30-minute inactivity gap splits sessions
    //      (lag -> gap flag -> running sum = session id -> per-session agg)
    QueryDef(
      "events_sessionize",
      (s, d) => {
        val byUser = Window.partitionBy(col("user_id"))
          .orderBy(col("ts"), col("event_id"))
        val ev = Tables.t(s, d, "events")
          .withColumn("prev_ts", lag(col("ts"), 1).over(byUser))
          .withColumn("new_sess",
            when(col("prev_ts").isNull ||
              unix_micros(col("ts")) - unix_micros(col("prev_ts")) > 1800L * 1000000L,
              1).otherwise(0))
          .withColumn("session_id",
            sum(col("new_sess")).over(
              byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        ev.groupBy(col("user_id"), col("session_id"))
          .agg(
            count(lit(1)).as("n_events"),
            (unix_micros(max(col("ts"))) - unix_micros(min(col("ts"))))
              .as("duration_us"),
            sum(col("value").cast(DecimalType(14, 2))).cast("double")
              .as("session_value"))
          .orderBy(col("user_id"), col("session_id"))
      },
      // events.ts carries sub-µs (ns) components; the engine reads it at µs
      // precision, so the oracle compares epoch_us (floor-to-µs) throughout.
      Some("""WITH w AS (
                SELECT user_id, event_id, ts, value,
                  CASE WHEN LAG(ts) OVER u IS NULL OR
                            epoch_us(ts) - epoch_us(LAG(ts) OVER u) > 1800000000
                       THEN 1 ELSE 0 END AS new_sess
                FROM events
                WINDOW u AS (PARTITION BY user_id ORDER BY ts, event_id)),
              s AS (
                SELECT user_id, ts, value,
                  SUM(new_sess) OVER (PARTITION BY user_id ORDER BY ts, event_id
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
                FROM w)
              SELECT user_id, CAST(session_id AS BIGINT) AS session_id,
                COUNT(*) AS n_events,
                epoch_us(MAX(ts)) - epoch_us(MIN(ts)) AS duration_us,
                CAST(SUM(CAST(value AS DECIMAL(14,2))) AS DOUBLE) AS session_value
              FROM s GROUP BY 1, 2 ORDER BY user_id, session_id"""),
      headline = true),

    // ---- sliding top-N: most active user per event_type per day
    QueryDef(
      "events_daily_top_user",
      (s, d) => {
        val daily = Tables.t(s, d, "events")
          .groupBy(
            date_trunc("day", col("ts")).cast("date").as("day"),
            col("event_type"), col("user_id"))
          .agg(count(lit(1)).as("n"))
        val w = Window.partitionBy(col("day"), col("event_type"))
          .orderBy(col("n").desc, col("user_id"))
        daily.withColumn("rk", row_number().over(w))
          .filter(col("rk") === 1)
          .select(col("day"), col("event_type"), col("user_id"), col("n"))
          .orderBy(col("day"), col("event_type"))
      },
      Some("""WITH daily AS (
                SELECT CAST(date_trunc('day', ts) AS DATE) AS day, event_type,
                       user_id, COUNT(*) AS n
                FROM events GROUP BY 1, 2, 3)
              SELECT day, event_type, user_id, n FROM (
                SELECT *, row_number() OVER (PARTITION BY day, event_type
                  ORDER BY n DESC, user_id) AS rk FROM daily)
              WHERE rk = 1 ORDER BY day, event_type""")),

    // ---- sequential funnel: view -> click -> purchase, strictly ordered
    //      per user. Each stage is one hash aggregation on user_id plus a
    //      user_id equi-join against the previous stage's (user, min_ts)
    //      frame — stage frames are distinct-user-sized, never
    //      event-sized, and every join shares the user_id key, so at
    //      100 TB the stages co-partition instead of reshuffling events.
    QueryDef(
      "events_funnel",
      (s, d) => {
        val ev = Tables.t(s, d, "events")
          .select(col("user_id"), col("event_type"), col("ts"))
        val v = ev.filter(col("event_type") === "view")
          .groupBy("user_id").agg(min(col("ts")).as("t_view"))
        val c = ev.filter(col("event_type") === "click")
          .join(v, "user_id").filter(col("ts") > col("t_view"))
          .groupBy("user_id").agg(min(col("ts")).as("t_click"))
        val p = ev.filter(col("event_type") === "purchase")
          .join(c, "user_id").filter(col("ts") > col("t_click"))
          .groupBy("user_id").agg(min(col("ts")).as("t_purchase"))
        def stage(df: org.apache.spark.sql.DataFrame, n: Int, nm: String) =
          df.agg(count(lit(1)).as("users"))
            .select(lit(n).as("stage"), lit(nm).as("stage_name"),
              col("users"))
        stage(v, 1, "view").union(stage(c, 2, "click"))
          .union(stage(p, 3, "purchase")).orderBy(col("stage"))
      },
      Some("""WITH v AS (SELECT user_id, MIN(ts) AS t FROM events
                         WHERE event_type = 'view' GROUP BY 1),
                   c AS (SELECT e.user_id, MIN(e.ts) AS t FROM events e
                         JOIN v ON e.user_id = v.user_id AND e.ts > v.t
                         WHERE e.event_type = 'click' GROUP BY 1),
                   p AS (SELECT e.user_id, MIN(e.ts) AS t FROM events e
                         JOIN c ON e.user_id = c.user_id AND e.ts > c.t
                         WHERE e.event_type = 'purchase' GROUP BY 1)
              SELECT * FROM (
                SELECT 1 AS stage, 'view' AS stage_name,
                       (SELECT COUNT(*) FROM v) AS users
                UNION ALL SELECT 2, 'click', (SELECT COUNT(*) FROM c)
                UNION ALL SELECT 3, 'purchase', (SELECT COUNT(*) FROM p))
              ORDER BY stage""")),

    // ---- cohort retention: users grouped by first-seen day; how many
    //      are active again N days later (N in 0..7). Two exchanges —
    //      first-seen min per user, then (cohort, offset) count over the
    //      distinct (user, day) activity frame joined back on user_id.
    QueryDef(
      "events_retention",
      (s, d) => {
        val ev = Tables.t(s, d, "events")
          .select(col("user_id"),
            date_trunc("day", col("ts")).cast("date").as("day"))
        val firstSeen = ev.groupBy("user_id")
          .agg(min(col("day")).as("cohort"))
        val active = ev.distinct()
        active.join(firstSeen, "user_id")
          .withColumn("day_offset",
            datediff(col("day"), col("cohort")).cast("long"))
          .filter(col("day_offset").between(0, 7))
          .groupBy(col("cohort"), col("day_offset"))
          .agg(countDistinct(col("user_id")).as("active_users"))
          .orderBy(col("cohort"), col("day_offset"))
      },
      Some("""WITH f AS (SELECT user_id,
                     MIN(CAST(date_trunc('day', ts) AS DATE)) AS cohort
                   FROM events GROUP BY 1),
                   a AS (SELECT DISTINCT user_id,
                     CAST(date_trunc('day', ts) AS DATE) AS day FROM events)
              SELECT f.cohort,
                     datediff('day', f.cohort, a.day) AS day_offset,
                     COUNT(DISTINCT a.user_id) AS active_users
              FROM a JOIN f ON a.user_id = f.user_id
              WHERE datediff('day', f.cohort, a.day) BETWEEN 0 AND 7
              GROUP BY 1, 2 ORDER BY 1, 2""")),

    // ---- trailing z-score anomaly detection over hourly rates. The
    //      trailing mean/variance derive from EXACT integer window sums
    //      (sum, sum-of-squares of counts) so both engines compute
    //      bit-identical doubles — never stddev_samp over floats, whose
    //      accumulation order is engine-dependent. One exchange on
    //      event_type for the hourly agg + ordered window; at 100 TB the
    //      window state is 24 longs per partition.
    QueryDef(
      "events_anomaly",
      (s, d) => {
        import org.apache.spark.sql.expressions.Window
        val hourly = Tables.t(s, d, "events")
          .groupBy(
            date_trunc("hour", col("ts")).as("hour"), col("event_type"))
          .agg(count(lit(1)).as("n"))
        val w = Window.partitionBy(col("event_type")).orderBy(col("hour"))
          .rowsBetween(-24, -1)
        hourly
          .withColumn("k", count(col("n")).over(w))
          .withColumn("s", sum(col("n")).over(w))
          .withColumn("ss", sum(col("n") * col("n")).over(w))
          .filter(col("k") >= 12)
          .withColumn("mean", col("s").cast("double") / col("k"))
          .withColumn("variance",
            (col("ss").cast("double") -
              col("s").cast("double") * col("s") / col("k")) / (col("k") - 1))
          .withColumn("z",
            when(col("variance") > 0,
              (col("n") - col("mean")) / sqrt(col("variance"))))
          .select(col("hour"), col("event_type"), col("n"),
            col("mean"), col("z"))
          .filter(abs(col("z")) > lit(2.0))
          .orderBy(col("hour"), col("event_type"))
      },
      Some("""WITH hourly AS (
                SELECT date_trunc('hour', ts) AS hour, event_type,
                       COUNT(*) AS n
                FROM events GROUP BY 1, 2),
              win AS (
                SELECT hour, event_type, n,
                  COUNT(n) OVER w AS k,
                  SUM(n) OVER w AS s,
                  SUM(n * n) OVER w AS ss
                FROM hourly
                WINDOW w AS (PARTITION BY event_type ORDER BY hour
                  ROWS BETWEEN 24 PRECEDING AND 1 PRECEDING)),
              scored AS (
                SELECT hour, event_type, n,
                  CAST(s AS DOUBLE) / k AS mean,
                  CASE WHEN (CAST(ss AS DOUBLE) -
                             CAST(s AS DOUBLE) * s / k) / (k - 1) > 0
                       THEN (n - CAST(s AS DOUBLE) / k) /
                            sqrt((CAST(ss AS DOUBLE) -
                                  CAST(s AS DOUBLE) * s / k) / (k - 1))
                  END AS z
                FROM win WHERE k >= 12)
              SELECT hour, event_type, n, mean, z FROM scored
              WHERE abs(z) > 2.0 ORDER BY hour, event_type"""))
  )
}
