package graft.plans

import graft.functions.{json => gjson}
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** JSON_TABLE — the table function form (reference sql/plan/json_table.go:
  * JSONTable{RootPath, Cols}, each JSONTableCol carrying a path, a type,
  * FOR ORDINALITY, DEFAULT ... ON EMPTY, EXISTS, or NESTED PATH columns).
  *
  * Spark-first: the root path's matches become rows via a single
  * `posexplode` over [[gjson.jsonMatches]] (one Generate, no shuffle —
  * embarrassingly parallel at 100 TB); scalar columns are codegen-reachable
  * extract+cast projections over the row fragment; NESTED PATH is a
  * further outer posexplode (MySQL emits one all-NULL nested row when the
  * nested path has no matches, which is exactly `posexplode_outer` on a
  * NULLed-when-empty array). Nesting recurses, so NESTED PATH inside
  * NESTED PATH works like the reference's NestedCols tree.
  */
object JsonTable {

  /** One output column (reference JSONTableCol). Exactly one of
    * `forOrdinality`, `exists`, `nested.nonEmpty`, or a scalar path. */
  case class Col(
      name: String,
      path: String = "",
      colType: String = "string",
      forOrdinality: Boolean = false,
      exists: Boolean = false,
      defaultOnEmpty: Option[String] = None,
      nestedPath: String = "",
      nested: Seq[Col] = Nil)

  /** Expand `df` with the columns of one level rooted at (`row`, `ord`),
    * recursing into NESTED PATH columns.
    *
    * Every path-driven column of the level (scalar PATH, EXISTS PATH and
    * each NESTED PATH's match array) evaluates through ONE
    * [[gjson.jsonTableLevel]] batch: the row fragment parses once per row
    * instead of once per column. The batch lands in its own projection
    * (`__lvl_<depth>`) referenced several times, which CollapseProject
    * keeps un-inlined (non-cheap expression, multiple references), so the
    * single evaluation survives optimization. Empty nested match set ->
    * one all-NULL nested row: posexplode_outer already emits a NULL row
    * for an EMPTY (not just NULL) array. */
  private def expand(df: DataFrame, row: String, ord: String,
      cols: Seq[Col], depth: Int): (DataFrame, Seq[String]) = {
    val (nestedCols, plainCols) = cols.partition(_.nested.nonEmpty)
    val lvl = s"__lvl_$depth"
    val specs =
      plainCols.filter(c => !c.forOrdinality)
        .map(c => (c.name, if (c.exists) 1 else 0, c.path)) ++
      nestedCols.zipWithIndex
        .map { case (nc, i) => (s"__arr_${depth}_$i", 2, nc.nestedPath) }
    var out = df
    if (specs.nonEmpty)
      out = out.withColumn(lvl, gjson.jsonTableLevel(col(row), specs))
    plainCols.foreach { c =>
      val v =
        if (c.forOrdinality) (col(ord) + 1).cast("long")
        else if (c.exists) col(s"$lvl.${c.name}")
        else {
          val raw = col(s"$lvl.${c.name}")
          val withDefault = c.defaultOnEmpty match {
            case Some(d) => coalesce(raw, lit(d))
            case None => raw
          }
          withDefault.cast(c.colType)
        }
      out = out.withColumn(c.name, v.as(c.name))
    }
    var names = plainCols.map(_.name)
    nestedCols.zipWithIndex.foreach { case (nc, i) =>
      val arr = s"__arr_${depth}_$i"
      val nOrd = s"__ord_${depth}_$i"
      val nRow = s"__row_${depth}_$i"
      out = out
        .select(out.columns.map(col) :+
          posexplode_outer(col(s"$lvl.$arr")).as(Seq(nOrd, nRow)): _*)
      val (expanded, childNames) = expand(out, nRow, nOrd, nc.nested, depth + 1)
      out = expanded
      names ++= childNames
    }
    (out.drop(lvl), names)
  }

  /** Build the JSON_TABLE DataFrame: one output row per root-path match
    * per input row, plus `passThrough` columns from the source. */
  def apply(source: DataFrame, doc: Column, rootPath: String,
      cols: Seq[Col], passThrough: Seq[String] = Nil): DataFrame = {
    val rooted = source
      .select((passThrough.map(col) :+ doc.as("__doc")): _*)
      .select(passThrough.map(col) :+
        posexplode(gjson.jsonMatches(col("__doc"), lit(rootPath)))
          .as(Seq("__ord0", "__row0")): _*)
    val (expanded, names) = expand(rooted, "__row0", "__ord0", cols, 1)
    expanded.select((passThrough ++ names).map(col): _*)
  }
}
