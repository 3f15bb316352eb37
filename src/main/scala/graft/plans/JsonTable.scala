package graft.plans

import graft.functions.{json => gjson}
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** JSON_TABLE — the table function form (reference sql/plan/json_table.go:
  * JSONTable{RootPath, Cols}, each JSONTableCol carrying a path, a type,
  * FOR ORDINALITY, DEFAULT ... ON EMPTY, EXISTS, or NESTED PATH columns).
  *
  * Spark-first: the WHOLE column tree — root matches, every level's
  * scalar/EXISTS columns, every NESTED PATH match array — evaluates in a
  * single [[gjson.jsonTableTree]] expression, so the document parses
  * exactly ONCE per source row (the r16 shape parsed each level's row
  * fragment again: 1 root + N fragment parses per row). Rows then come
  * from plain `posexplode` over the precomputed array<struct> (one
  * Generate per level, no shuffle — embarrassingly parallel at 100 TB);
  * scalar columns are struct-field projections + casts. NESTED PATH is a
  * further outer posexplode (MySQL emits one all-NULL nested row when the
  * nested path has no matches, which is exactly `posexplode_outer` on an
  * empty array). Nesting recurses, so NESTED PATH inside NESTED PATH
  * works like the reference's NestedCols tree.
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

  /** The JsonTableTree spec mirroring the Col tree: path-driven columns
    * of each level plus its NESTED sub-levels (named __arr_<depth>_<i>,
    * the same field names the per-level shape used). */
  private def buildSpec(path: String, cols: Seq[Col], depth: Int): gjson.JTreeLevel = {
    val (nestedCols, plainCols) = cols.partition(_.nested.nonEmpty)
    gjson.JTreeLevel(
      path,
      plainCols.filter(c => !c.forOrdinality)
        .map(c => gjson.JTreeCol(c.name, if (c.exists) 1 else 0, c.path)),
      nestedCols.zipWithIndex.map { case (nc, i) =>
        (s"__arr_${depth}_$i", buildSpec(nc.nestedPath, nc.nested, depth + 1))
      })
  }

  /** Project the columns of one level out of its precomputed struct
    * (`row`), recursing into NESTED PATH columns via posexplode_outer of
    * the struct's nested match arrays. All JSON work already happened in
    * the root jsonTableTree expression — this is pure (codegen-friendly)
    * struct-field access. */
  private def expand(df: DataFrame, row: String, ord: String,
      cols: Seq[Col], depth: Int): (DataFrame, Seq[String]) = {
    val (nestedCols, plainCols) = cols.partition(_.nested.nonEmpty)
    var out = df
    plainCols.foreach { c =>
      val v =
        if (c.forOrdinality) (col(ord) + 1).cast("long")
        else if (c.exists) col(s"$row.${c.name}")
        else {
          val raw = col(s"$row.${c.name}")
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
      val nOrd = s"__ord_${depth}_$i"
      val nRow = s"__row_${depth}_$i"
      out = out
        .select(out.columns.map(col) :+
          posexplode_outer(col(s"$row.__arr_${depth}_$i")).as(Seq(nOrd, nRow)): _*)
      val (expanded, childNames) = expand(out, nRow, nOrd, nc.nested, depth + 1)
      out = expanded
      names ++= childNames
    }
    (out, names)
  }

  /** Build the JSON_TABLE DataFrame: one output row per root-path match
    * per input row, plus `passThrough` columns from the source. */
  def apply(source: DataFrame, doc: Column, rootPath: String,
      cols: Seq[Col], passThrough: Seq[String] = Nil): DataFrame = {
    val spec = buildSpec(rootPath, cols, 1)
    val rooted = source
      .select((passThrough.map(col) :+ doc.as("__doc")): _*)
      .select(passThrough.map(col) :+
        posexplode(gjson.jsonTableTree(col("__doc"), spec))
          .as(Seq("__ord0", "__row0")): _*)
    val (expanded, names) = expand(rooted, "__row0", "__ord0", cols, 1)
    expanded.select((passThrough ++ names).map(col): _*)
  }
}
