package graft

import org.scalatest.funsuite.AnyFunSuite

/** The bucketed band join must (a) agree with the naive conditional join
  * and (b) actually plan as an equi hash/merge join, not a nested loop. */
class BandJoinSpec extends AnyFunSuite {
  import SparkSpec.{spark, sfDir}

  test("bucketed band join matches the nested-loop result") {
    val naive = SparkEntry.queries("join_band")(spark, sfDir).collect()
    val bucketed = SparkEntry.queries("join_band_bucketed")(spark, sfDir).collect()
    assert(naive.map(r => (r.getLong(0), r.getLong(1))).toSeq ==
      bucketed.map(r => (r.getLong(0), r.getLong(1))).toSeq)
  }

  test("bucketed band join plans as an equi join") {
    val plan = SparkEntry.queries("join_band_bucketed")(spark, sfDir)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan)
    assert(plan.contains("SortMergeJoin") || plan.contains("ShuffledHashJoin") ||
      plan.contains("BroadcastHashJoin"), plan)
  }
}
