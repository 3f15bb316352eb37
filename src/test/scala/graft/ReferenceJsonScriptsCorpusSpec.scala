package graft

/** Mechanical run of enginetest/queries/json_scripts.go `JsonScripts`
  * (39 blocks): JSON_EXTRACT/SET/INSERT/REPLACE/REMOVE over paths with
  * quoting edge cases, JSON_TABLE interop, JSON comparison/sorting,
  * JSON_ARRAYAGG grouping, and blob/text interop. The reference runs
  * these over MydbData + BlobData
  * (enginetest/enginetests.go:5290, scriptgen/setup/setup_data.sg.go:33).
  */
class ReferenceJsonScriptsCorpusSpec extends GoScriptCorpusSpec {
  val path = "/root/reference/enginetest/queries/json_scripts.go"
  val varNames = Seq("JsonScripts")
  override def fixtures: Seq[String] = Seq(
    "create database if not exists mydb",
    "use mydb",
    "create table blobt (i bigint primary key, b longblob)",
    "create table textt (i bigint primary key, t text)",
    "insert into blobt values (1, 'first row'), (2, 'second row'), (3, 'third row')",
    "insert into textt values (1, 'first row'), (2, 'second row'), (3, 'third row')")
  override val blockDivergences = Map(
    // JSON numbers here are long/double (Jackson over StringType);
    // MySQL's binary JSON additionally distinguishes DECIMAL and
    // UNSIGNED — a documented type-taxonomy divergence
    "json_type scripts" -> "JSON numeric taxonomy (no DECIMAL/UNSIGNED)",
    "types survive round-trip into tables" ->
      "JSON numeric taxonomy (no DECIMAL/UNSIGNED)",
    "unsigned tinyint is still unsigned after round-trip into table" ->
      "JSON numeric taxonomy (no UNSIGNED INTEGER)",
    "json_object preserves types" ->
      "JSON numeric taxonomy (no DECIMAL/UNSIGNED)",
    "json_value preserves types" ->
      "JSON numeric taxonomy (no DECIMAL/UNSIGNED)",
    // JSON-typed values aggregate as raw fragments in MySQL; json
    // columns here are strings, so JSON_ARRAYAGG/JSON_OBJECTAGG re-quote
    // them — divergence pinned until json-ness is tracked through
    // aggregation
    "JSON_ARRAGG with simple and nested json objects." ->
      "json column raw-embedding through JSON_ARRAYAGG",
    "JSON_ARRAYAGG and group by use the same field." ->
      "expected array contents encode the reference's scan order",
    "JSON_OBJECTAGG and nested json values" ->
      "json column raw-embedding through JSON_OBJECTAGG",
    // MySQL orders JSON values by TYPE class (null < number < string <
    // object…); json columns here order textually — divergence
    "json is ordered correctly" -> "JSON ORDER BY type-class ordering")
  registerAll()
}
