package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Focused pins for the round-16 optimization rewrites: each test asserts
  * that an optimized kernel computes exactly what the shape it replaced
  * computed, or that the plan property the rewrite bought is still there.
  */
class OptimizationR16Spec extends AnyFunSuite {
  import SparkSpec.{spark, sfDir}
  import spark.implicits._

  // ---- VecArgminL2Sq: the narrow centroid-assignment kernel ------------

  test("VecArgminL2Sq picks the (d2, cid)-minimum candidate like the window argmin") {
    val vecs = Seq(
      (1L, Seq(0.0, 0.0)),
      (2L, Seq(3.0, 4.0)),
      (3L, Seq(1.0, 1.0))).toDF("vec_id", "v")
      .withColumn("v", expr("transform(v, x -> CAST(x AS DOUBLE))"))
    val cents = Seq(
      (10L, Seq(0.0, 0.0)),
      (11L, Seq(3.0, 4.0)),
      // duplicate of cid 11's position under a larger id: an exact
      // distance tie that must break to the SMALLER cid
      (12L, Seq(3.0, 4.0))).toDF("cid", "cv")
      .withColumn("cv", expr("transform(cv, x -> CAST(x AS DOUBLE))"))
    val cands = cents.agg(collect_list(struct(col("cid"), col("cv"))).as("cands"))
    val got = vecs.crossJoin(broadcast(cands))
      .withColumn("mn", graft.functions.vector.vecArgminL2Sq(col("v"), col("cands")))
      .select(col("vec_id"), col("mn.cid"), col("mn.d2"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(got === Set((1L, 10L, 0.0), (2L, 11L, 0.0), (3L, 10L, 2.0)))
  }

  test("VecArgminL2Sq: empty candidate array yields NULL, null vector propagates") {
    val df = Seq((1L, Some(Seq(1.0, 2.0))), (2L, None))
      .toDF("vec_id", "v")
      .withColumn("cands",
        expr("CAST(array() AS array<struct<cid: bigint, cv: array<double>>>)"))
      .withColumn("mn", graft.functions.vector.vecArgminL2Sq(col("v"), col("cands")))
    assert(df.select(col("mn")).collect().forall(_.isNullAt(0)))
  }

  test("VecArgminL2Sq matches the interpreted HOF argmin on real embeddings") {
    val e = Tables.t(spark, sfDir, "embeddings")
      .select(col("vec_id"), expr("transform(embedding, x -> CAST(x AS DOUBLE))").as("v"))
    val cents = e.filter(col("vec_id") < 8)
      .select(col("vec_id").as("cid"), col("v").as("cv"))
    val cands = cents.agg(collect_list(struct(col("cid"), col("cv"))).as("cands"))
    val joined = e.crossJoin(broadcast(cands))
    val fast = joined
      .withColumn("mn", graft.functions.vector.vecArgminL2Sq(col("v"), col("cands")))
      .select(col("vec_id"), col("mn.cid").as("cid"))
    val slow = joined
      .withColumn("mn", array_min(transform(col("cands"), k =>
        struct(
          aggregate(zip_with(col("v"), k.getField("cv"), (a, b) => (a - b) * (a - b)),
            lit(0.0), (acc, x) => acc + x).as("d2"),
          k.getField("cid").as("cid")))))
      .select(col("vec_id"), col("mn.cid").as("cid"))
    assert(fast.exceptAll(slow).isEmpty && slow.exceptAll(fast).isEmpty)
  }

  // ---- JsonTableLevel: one-parse JSON_TABLE level batch ----------------

  test("JsonTableLevel fields equal the per-column extract/exists/matches chain") {
    val docs = Seq(
      """{"a": 7, "s": "txt", "rows": [{"x": 1}, {"x": 2}]}""",
      """{"s": "o", "rows": []}""",
      """{"a": null, "rows": [{"x": 9}]}""").toDF("doc")
    val lvl = docs.withColumn("lvl", graft.functions.json.jsonTableLevel(col("doc"),
      Seq(("a", 0, "$.a"), ("s", 0, "$.s"), ("hasx", 1, "$.rows[0].x"),
        ("rows", 2, "$.rows[*]"))))
    val got = lvl.select(
      col("lvl.a"), col("lvl.s"), col("lvl.hasx"), col("lvl.rows")).collect()
    // row 1: a=7, s unquoted, exists=1, two row fragments
    assert(got(0).getString(0) == "7" && got(0).getString(1) == "txt"
      && got(0).getInt(2) == 1 && got(0).getSeq[String](3) == Seq("""{"x":1}""", """{"x":2}"""))
    // row 2: missing a -> null, exists=0, empty match array (not null)
    assert(got(1).isNullAt(0) && got(1).getInt(2) == 0
      && got(1).getSeq[String](3).isEmpty)
    // row 3: JSON null extracts as the literal "null" fragment, like
    // JSON_EXTRACT + JSON_UNQUOTE
    assert(got(2).getString(0) == "null" && got(2).getInt(2) == 1)
  }

  test("JsonTableLevel: null document yields a NULL struct (nested outer rows)") {
    val docs = Seq[Option[String]](None).toDF("doc")
    val lvl = docs.withColumn("lvl", graft.functions.json.jsonTableLevel(col("doc"),
      Seq(("a", 0, "$.a"))))
    assert(lvl.select(col("lvl")).collect()(0).isNullAt(0))
  }

  // ---- plan-shape pins for the restructured queries --------------------

  test("tpch_q21 plans no Expand and a single lineitem scan") {
    val plan = SparkEntry.queries("tpch_q21")(spark, sfDir).queryExecution
      .explainString(org.apache.spark.sql.execution.FormattedMode)
    assert(!plan.contains("Expand"), "countDistinct Expand is back in tpch_q21")
    val liScans = """Location.*lineitem""".r.findAllIn(plan).size
    assert(liScans <= 1, s"tpch_q21 scans lineitem $liScans times (expected 1)")
  }

  test("text_keywords tokenizes the corpus once (tf frame materialized)") {
    val scanId = """Scan parquet\s+\((\d+)\)""".r
    val plan = SparkEntry.queries("text_keywords")(spark, sfDir).queryExecution
      .explainString(org.apache.spark.sql.execution.FormattedMode)
    // distinct scans: the tf cache's captured build plan + the corpus
    // count — the uncached shape planned the tokenize+aggregate chain
    // twice
    val ids = scanId.findAllMatchIn(plan).map(_.group(1)).toSet
    assert(ids.size <= 2, s"text_keywords has ${ids.size} distinct parquet scans")
  }

  test("sim_ivf / sim_ivf_kmeans assignment stays narrow: no Window nodes") {
    Seq("sim_ivf", "sim_ivf_kmeans", "vec_pq_codebook").foreach { name =>
      val plan = SparkEntry.queries(name)(spark, sfDir).queryExecution
        .explainString(org.apache.spark.sql.execution.FormattedMode)
      val windows = """(?m)^\(\d+\) Window$""".r.findAllIn(plan).size
      val budget = if (name == "sim_ivf") 1 else 0 // sim_ivf keeps its top-k window
      assert(windows <= budget,
        s"$name plans $windows Window nodes (argmin regressed to a sort-window?)")
    }
  }
}
