package graft

/** Mechanical run of enginetest/queries/insert_queries.go's ScriptTest
  * corpora — `InsertScripts` (57 blocks: auto_increment semantics, ON
  * DUPLICATE KEY UPDATE shapes, INSERT ... SELECT column mapping, CTE
  * sources, zero-date writes), `InsertDuplicateKeyKeyless` (ODKU over
  * keyless tables with unique indexes), `InsertErrorScripts`,
  * `InsertIgnoreScripts`, and
  * `IgnoreWithDuplicateUniqueKeyKeylessScripts`. The reference runs all
  * of these over a bare database (harness.Setup(setup.MydbData),
  * enginetest/enginetests.go:977-1004) — no fixture tables.
  * `InsertBrokenScripts` is excluded: the reference itself doesn't run
  * it green (TestBrokenInsertScripts is a t.Skip suite).
  */
class ReferenceInsertCorpusSpec extends GoScriptCorpusSpec {
  val path = "/root/reference/enginetest/queries/insert_queries.go"
  val varNames = Seq(
    "InsertScripts",
    "InsertDuplicateKeyKeyless",
    "InsertErrorScripts",
    "InsertIgnoreScripts",
    "IgnoreWithDuplicateUniqueKeyKeylessScripts")
  // harness.Setup(setup.MydbData): DATABASE() must answer 'mydb' for the
  // information_schema.tables probes
  override def fixtures: Seq[String] =
    Seq("create database if not exists mydb", "use mydb")
  override val blockDivergences = Map(
    // triggers are agreed-descoped OLTP surface (SURVEY §2.12)
    "insert...returning works with after triggers" ->
      "CREATE TRIGGER (descoped §2.12)",
    "insert...returning works with before triggers" ->
      "CREATE TRIGGER (descoped §2.12)",
    // zero dates store as NULL here (Spark has no zero-date value) —
    // documented type-layer divergence
    "inserting zero date" -> "zero dates read back NULL (no zero-date value)")
  registerAll()
}
