package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** HLL++ estimates must stay within the configured relative error of the
  * exact distinct counts. This pins the sketch itself (computed directly
  * here, independent of the verification query's tolerance booleans) AND
  * asserts the agg_approx_distinct query's own within-tolerance flags. */
class ApproxSpec extends AnyFunSuite {
  import SparkSpec.{spark, sfDir}

  test("approx_count_distinct is within 15% of exact per group") {
    val li = Tables.t(spark, sfDir, "lineitem")
    val both = li.groupBy(col("l_returnflag"))
      .agg(
        countDistinct(col("l_partkey")).as("exact"),
        approx_count_distinct(col("l_partkey"), 0.05).as("approx"))
      .collect()
    assert(both.nonEmpty)
    both.foreach { r =>
      val (k, n, a) = (r.getString(0), r.getLong(1), r.getLong(2))
      assert(math.abs(a - n).toDouble / n < 0.15, s"$k: exact=$n approx=$a")
    }
  }

  test("agg_approx_distinct tolerance booleans all hold") {
    val rows = SparkEntry.queries("agg_approx_distinct")(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getBoolean(3), s"${r.getString(0)}: parts_within_tol false")
      assert(r.getBoolean(4), s"${r.getString(0)}: supps_within_tol false")
    }
  }
}
