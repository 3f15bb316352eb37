package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Focused pins for the round-17 optimization rewrites: each test asserts
  * that an optimized kernel computes exactly what the shape it replaced
  * computed, or that the plan property the rewrite bought is still there.
  */
class OptimizationR17Spec extends AnyFunSuite {
  import SparkSpec.{spark, sfDir}
  import spark.implicits._

  // ---- JsonTableTree: whole-tree one-parse JSON_TABLE -------------------

  /** The r16 per-level chain (jsonMatches root + jsonTableLevel per level)
    * rebuilt inline as the semantics oracle for the one-parse tree. */
  private def oldShape(df: org.apache.spark.sql.DataFrame) = {
    import graft.functions.{json => gjson}
    df.select(col("id"),
        posexplode(gjson.jsonMatches(col("doc"), lit("$.rows[*]")))
          .as(Seq("__ord0", "__row0")))
      .withColumn("__lvl_1", gjson.jsonTableLevel(col("__row0"),
        Seq(("a", 0, "$.a"), ("has_tags", 1, "$.tags[0]"),
          ("b", 0, "$.b"), ("wild", 0, "$.tags[*]"),
          ("__arr_1_0", 2, "$.tags[*]"))))
      .select(col("id"), (col("__ord0") + 1).cast("long").as("rn"),
        col("__lvl_1.a").cast("int").as("a"),
        col("__lvl_1.has_tags").as("has_tags"),
        coalesce(col("__lvl_1.b"), lit("none")).as("b"),
        col("__lvl_1.wild").as("wild"),
        col("__lvl_1.__arr_1_0").as("__arr"))
      .select(col("id"), col("rn"), col("a"), col("has_tags"), col("b"),
        col("wild"),
        posexplode_outer(col("__arr")).as(Seq("__ordt", "__rowt")))
      .withColumn("tag",
        gjson.jsonTableLevel(col("__rowt"), Seq(("tag", 0, "$"))).getField("tag"))
      .select(col("id"), col("rn"), col("a"), col("has_tags"), col("b"),
        col("wild"), (col("__ordt") + 1).cast("long").as("tn"), col("tag"))
  }

  private def newShape(df: org.apache.spark.sql.DataFrame) = {
    import graft.plans.JsonTable
    JsonTable(df, col("doc"), "$.rows[*]",
      Seq(
        JsonTable.Col("rn", forOrdinality = true),
        JsonTable.Col("a", path = "$.a", colType = "int"),
        JsonTable.Col("has_tags", path = "$.tags[0]", exists = true),
        JsonTable.Col("b", path = "$.b", defaultOnEmpty = Some("none")),
        JsonTable.Col("wild", path = "$.tags[*]"),
        JsonTable.Col("tags", nestedPath = "$.tags[*]", nested = Seq(
          JsonTable.Col("tn", forOrdinality = true),
          JsonTable.Col("tag", path = "$")))),
      passThrough = Seq("id"))
      .select(col("id"), col("rn"), col("a"), col("has_tags"), col("b"),
        col("wild"), col("tn"), col("tag"))
  }

  test("JsonTableTree row set equals the per-level jsonMatches/jsonTableLevel chain") {
    // edge soup: missing keys, JSON null, empty nested arrays, wildcard
    // scalar extract, nested objects/numbers as tags, malformed doc,
    // NULL doc, empty root match set
    val docs = Seq(
      (1L, """{"rows":[{"a":1,"b":"x","tags":["t1","u2"]},{"a":15,"tags":[]}]}"""),
      (2L, """{"rows":[{"a":2,"b":null,"tags":[{"k":1},2,"s"]}]}"""),
      (3L, """{"rows":[]}"""),
      (4L, """not json at all"""),
      (5L, """{"rows":[{"tags":["only"]}]}"""),
      (6L, null.asInstanceOf[String]))
      .toDF("id", "doc")
    val a = oldShape(docs).collect().map(_.toSeq).toSeq
    val b = newShape(docs).collect().map(_.toSeq).toSeq
    assert(a.toSet === b.toSet)
    assert(a.length === b.length)
  }

  test("json_table_nested plans exactly one JSON parse site (jsontabletree)") {
    val plan = SparkEntry.queries("json_table_nested")(spark, sfDir).queryExecution
      .explainString(org.apache.spark.sql.execution.FormattedMode)
    assert("jsontabletree".r.findAllIn(plan).size === 1,
      "expected exactly one jsontabletree evaluation")
    assert(!plan.contains("jsontablelevel") && !plan.contains("jsonmatches"),
      "per-level fragment re-parses are back in json_table_nested")
  }
}
