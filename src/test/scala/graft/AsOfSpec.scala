package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Edge cases of the as-of join composition: exact-tie timestamps (the
  * snapshot at t is visible to the event at t), no preceding snapshot
  * (NULLs), and snapshot selection strictly per key. */
class AsOfSpec extends AnyFunSuite {
  import SparkSpec.spark
  import spark.implicits._

  private def ts(s: String) = java.sql.Timestamp.valueOf(s)

  test("as-of picks latest at-or-before, per key, with NULL before first") {
    val events = Seq(
      (1L, 10L, ts("2024-01-01 08:00:00"), 1.0), // before any snapshot
      (2L, 10L, ts("2024-01-02 00:00:00"), 1.0), // exact tie with snap A
      (3L, 10L, ts("2024-01-05 12:00:00"), 1.0), // after snap B
      (4L, 20L, ts("2024-01-03 00:00:00"), 1.0)  // other key: only snap C
    ).toDF("event_id", "user_id", "ts", "value")
    val snaps = Seq(
      (10L, ts("2024-01-02 00:00:00"), 100.0), // A
      (10L, ts("2024-01-04 00:00:00"), 200.0), // B
      (20L, ts("2024-01-01 00:00:00"), 300.0)  // C
    ).toDF("user_id", "snap_ts", "day_sum")

    val got = operators.AsOf
      .join(events, snaps, "user_id", "ts", "snap_ts", Seq("day_sum"))
      .orderBy($"event_id")
      .select($"event_id", $"asof_day_sum")
      .collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(1)) None else Some(r.getDouble(1))))
    assert(got.toSeq == Seq(
      1L -> None, 2L -> Some(100.0), 3L -> Some(200.0), 4L -> Some(300.0)))
  }
}
