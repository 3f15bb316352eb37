package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** HLL++ estimates must stay within the configured relative error of the
  * exact distinct counts (the correctness contract for the no-oracle
  * agg_approx_distinct query). */
class ApproxSpec extends AnyFunSuite {
  import SparkSpec.{spark, sfDir}

  test("approx_count_distinct is within 5% rsd of exact") {
    val li = Tables.t(spark, sfDir, "lineitem")
    val exact = li.groupBy(col("l_returnflag"))
      .agg(countDistinct(col("l_partkey")).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val approx = SparkEntry.queries("agg_approx_distinct")(spark, sfDir)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    exact.foreach { case (k, n) =>
      val a = approx(k)
      assert(math.abs(a - n).toDouble / n < 0.15, s"$k: exact=$n approx=$a")
    }
  }
}
