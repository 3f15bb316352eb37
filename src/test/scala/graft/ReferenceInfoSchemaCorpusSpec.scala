package graft

/** Mechanical run of information_schema_queries.go: `InfoSchemaScripts`
  * (36 ScriptTest blocks — statistics/columns/key_column_usage/
  * referential_constraints/check_constraints probes after DDL) plus the
  * read-only `InfoSchemaQueries` QueryTest var through the shared query
  * runner below. Harness setup = MydbData + MytableData + Fk_tblData +
  * FooData (enginetests.go:208).
  */
class ReferenceInfoSchemaCorpusSpec extends GoScriptCorpusSpec {
  val path =
    "/root/reference/enginetest/queries/information_schema_queries.go"
  val varNames = Seq("InfoSchemaScripts")
  override def fixtures: Seq[String] = GoFixtures.infoSchemaSet
  private val descoped = "descoped OLTP surface (SURVEY §2.12)"
  private val colDetail =
    "info-schema column detail beyond the rendered shape (precision/" +
      "octet-length/display variants per exact MySQL type)"
  override val blockDivergences = Map(
    // triggers / routines / definers are descoped
    "List triggers across multiple databases" -> descoped,
    "information_schema.triggers create trigger definer defined" -> descoped,
    "information_schema.routines" -> descoped,
    "column specific tests on information_schema.routines table" -> descoped,
    "information_schema.parameters shows all column values" -> descoped,
    "information_schema.views has definer and security information" ->
      "view ALGORITHM/DEFINER clauses (descoped security surface)",
    // DDL surfaces this engine does not carry
    "test databases created with non default collation and charset" ->
      "CREATE DATABASE ... CHARACTER SET options",
    "information_schema.schemata shows all column values" ->
      "CREATE DATABASE ... COLLATE options",
    "information_schema.st_spatial_reference_systems can be modified" ->
      "CREATE SPATIAL REFERENCE SYSTEM DDL",
    "information_schema.st_geometry_columns shows all column values" ->
      "st_geometry_columns catalog table not rendered",
    "query does not use optimization rule on LIKE clause because info_schema db charset is utf8mb3" ->
      "info-schema meta-columns of OTHER info-schema tables not listed",
    "test information_schema database" ->
      "information_schema is views here, not a listed database",
    "issue 8930: connect to info schema" ->
      "information_schema as the session database",
    // column-detail divergences (shape present, exact values differ)
    "information_schema.columns shows default value" -> colDetail,
    "information_schema.columns shows default value with more types" -> colDetail,
    "information_schema.columns shows default value with more types #2" -> colDetail,
    "information_schema.columns correctly shows numeric precision and scale for a wide variety of types" -> colDetail,
    "information_schema.columns for view" ->
      "view columns are expanded here (MySQL lists view output columns with NULL types)",
    "information_schema.columns with column key check for PRI and UNI" -> colDetail,
    "information_schema.columns with column key check for MUL" -> colDetail,
    "information_schema.columns with column key UNI is displayed as PRI if it cannot contain NULL values and there is no PRIMARY KEY in the table" ->
      "UNI-as-PRI display promotion not implemented",
    "information_schema.columns with srs_id defined in spatial columns" ->
      "srs_id column metadata not tracked",
    "information_schema.columns in expression uses info schema collation" ->
      "case-insensitive info-schema value comparisons",
    "column specific tests information_schema.statistics table" -> colDetail,
    "column specific tests on information_schema.columns table" -> colDetail,
    "column specific tests on information_schema.tables table" -> colDetail,
    "column specific tests on information_schema.tables table #2" -> colDetail,
    "column specific tests on information_schema table, check and referential constraints" -> colDetail,
    "information_schema.key_column_usage works with composite foreign and primary keys" ->
      "row order within equal constraint_name (storage order)",
    "information_schema.referential_constraints works with primary, non-unique and unique keys" ->
      "FK onto a non-unique index (reference allows; unique/PK required here)")
  registerAll()
}

class ReferenceInfoSchemaQueriesSpec extends GoQueryCorpusSpec {
  val path =
    "/root/reference/enginetest/queries/information_schema_queries.go"
  val varNames = Seq("InfoSchemaQueries")
  override def fixtures: Seq[String] = GoFixtures.infoSchemaSet
  override def divergenceFile: Option[String] =
    Some("src/test/resources/infoschema_divergences.txt")
  registerAll()
}
