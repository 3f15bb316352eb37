package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** Production registration path for the custom function library —
  * SURVEY §2.11 (reference FunctionProvider, sql/functions.go:29).
  *
  * `spark.sql.extensions=graft.GraftExtensions` (or
  * `SparkSession.builder().withExtensions(new GraftExtensions)`) installs
  * every graft function into the session's FunctionRegistry at build time;
  * the `Engine` constructor's createOrReplaceTempFunction path remains for
  * attaching to an existing session.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  private def fn(name: String, build: Seq[Expression] => Expression) =
    (FunctionIdentifier(name),
      new ExpressionInfo("graft.functions", name),
      (es: Seq[Expression]) => build(es))

  override def apply(ext: SparkSessionExtensions): Unit = {
    import graft.functions.{expressions => ge, json => gj, spatial => gs, vector => gv}
    val fns: Seq[(FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression)] = Seq(
      fn("mysql_field", es => ge.MySqlField(es)),
      fn("mysql_insert", es => ge.MySqlInsertStr(es)),
      fn("inet_aton", es => ge.InetAton(es.head)),
      fn("inet_ntoa", es => ge.InetNtoa(es.head)),
      fn("export_set", es => ge.ExportSet(es)),
      fn("mysql_quote", es => ge.QuoteStr(es.head)),
      fn("make_set", es => ge.MakeSet(es)),
      fn("soundex", es => ge.MySqlSoundex(es.head)),
      fn("compress", es => ge.CompressExpr(es.head)),
      fn("uncompress", es => ge.UncompressExpr(es.head)),
      fn("uncompressed_length", es => ge.UncompressedLength(es.head)),
      fn("winnow_fingerprint", es => ge.WinnowFingerprint(es(0), es(1))),
      fn("mysql_to_number", es => ge.MySqlToNumber(es.head)),
      fn("ai_ci_fold", es => ge.AccentFold(es.head)),
      fn("json_extract_mysql", es => gj.JsonExtractMySql(es)),
      fn("json_set", es => gj.JsonMutate(es, 0)),
      fn("json_insert", es => gj.JsonMutate(es, 1)),
      fn("json_replace", es => gj.JsonMutate(es, 2)),
      fn("json_remove", es => gj.JsonRemove(es)),
      fn("json_merge_patch", es => gj.JsonMergePatch(es)),
      fn("json_array", es => gj.JsonArrayFn(es)),
      fn("json_object", es => gj.JsonObjectFn(es)),
      fn("json_value", es => gj.JsonValueFn(es)),
      fn("json_array_append", es => gj.JsonArrayMutate(es, insert = false)),
      fn("json_array_insert", es => gj.JsonArrayMutate(es, insert = true)),
      fn("json_merge", es => gj.JsonMergePreserve(es)),
      fn("json_merge_preserve", es => gj.JsonMergePreserve(es)),
      fn("json_keys", es => gj.JsonKeys(es)),
      fn("json_length_mysql", es => gj.JsonLengthMySql(es)),
      fn("json_depth", es => gj.JsonDepth(es)),
      fn("json_type", es => gj.JsonTypeOf(es)),
      fn("json_valid", es => gj.JsonValid(es.head)),
      fn("json_contains", es => gj.JsonContainsMySql(es)),
      fn("json_contains_path", es => gj.JsonContainsPath(es)),
      fn("json_search", es => gj.JsonSearch(es)),
      fn("json_pretty", es => gj.JsonPretty(es)),
      fn("json_overlaps", es => gj.JsonOverlaps(es)),
      fn("json_quote", es => gj.JsonQuoteFn(es.head)),
      fn("json_unquote", es => gj.JsonUnquote(es.head)),
      fn("json_schema_valid", es => gj.JsonSchemaValid(es)),
      fn("json_schema_validation_report", es => gj.JsonSchemaValidationReport(es)),
      fn("vec_dot", es => gv.VecDot(es(0), es(1))),
      fn("vec_distance_l2_squared", es => gv.VecL2Sq(es(0), es(1))),
      // MySQL %-pattern date formatting overrides the builtins (dispatch
      // by format shape; Java-pattern callers hit the builtin path)
      fn("date_format", es => graft.functions.MySqlFormat.dateFormatExpr(es)),
      fn("str_to_date", es => graft.functions.MySqlFormat.strToDateExpr(es)))
    fns.foreach(ext.injectFunction)
    // shared builder tables (same source as Engine registration; no drift)
    (graft.functions.MiscFns.builders ++ graft.functions.spatial.builders ++
      graft.functions.RegexpFns.builders)
      .foreach { case (name, b) => ext.injectFunction(fn(name, b)) }
    // MySQL substring-TRIM semantics — resolution-time, ahead of the
    // optimizer's constant folding (see expressions.MySqlTrimRule)
    ext.injectResolutionRule(_ => ge.MySqlTrimRule)
    // optimizer-stage: the json-vs-number repair must see the FINAL
    // coerced comparison (TypeCoercion's int cast), not the raw parse
    ext.injectOptimizerRule(_ => ge.JsonNumericCompareRule)
    // wide DECIMAL (p > 38) comparisons bypass the lossy double
    // coercion (see functions.WideDecimal)
    ext.injectOptimizerRule(_ => graft.functions.WideDecCompareRule)
    // LOCATE/POSITION/INSTR fold to case-insensitive matching (MySQL's
    // default *_ci collations)
    ext.injectOptimizerRule(_ => ge.MySqlCiLocateRule)
    ext.injectOptimizerRule(_ => ge.MySqlUnixTsScaleRule)
  }
}
