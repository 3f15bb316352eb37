package graft

/** Mechanical run of enginetest/queries/generated_columns.go
  * `GeneratedColumnTests` (48 ScriptTest blocks): STORED / VIRTUAL
  * generated columns across CREATE TABLE, ADD COLUMN (FIRST/AFTER),
  * indexes over generated columns surviving unrelated ALTERs, DML
  * through virtual columns, JSON-extract virtuals, and the
  * illegal-definition error taxonomy. Index-plan assertions
  * (ExpectedIndexes) execute without plan comparison — this engine
  * keeps declared-index metadata but plans through Catalyst.
  */
class ReferenceGeneratedColsCorpusSpec extends GoScriptCorpusSpec {
  val path = "/root/reference/enginetest/queries/generated_columns.go"
  val varNames = Seq("GeneratedColumnTests")
  override val blockDivergences = Map(
    "virtual column in triggers" -> "triggers descoped (BASELINE.json)",
    "update a virtual column with a trigger" -> "triggers descoped")
  registerAll()
}
