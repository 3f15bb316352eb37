package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every operator from SURVEY.md §2 is declared as a [[QueryDef]] in
  * `graft.operators.*`; this object assembles them into the maps the
  * driver's verify/bench harness consumes.
  */
object SparkEntry {

  /** All implemented operators, assembled from the per-area modules. */
  val all: Seq[QueryDef] =
    operators.Relational.defs ++
      operators.Joins.defs ++
      operators.Aggregates.defs ++
      operators.Windows.defs ++
      operators.SetOpsSubqueries.defs ++
      operators.Functions.defs ++
      operators.TextAnalysis.defs ++
      operators.Dedup.defs ++
      operators.Similarity.defs ++
      operators.Events.defs ++
      operators.Multimodal.defs ++
      operators.TpcH.defs ++
      operators.AsOf.defs

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    queries("q1_agg")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    all.map(q => q.name -> q.fn).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    all.flatMap(q => q.oracle.map(o => q.name -> normalize(o))).toMap

  /** Bench subset (headline queries). */
  def headline: Seq[String] = {
    val hs = all.filter(_.headline).map(_.name)
    if (hs.nonEmpty) hs else all.map(_.name)
  }

  /** collapse the triple-quoted indentation so the JSON stays readable */
  private def normalize(sql: String): String =
    sql.replaceAll("\\s+", " ").trim
}
