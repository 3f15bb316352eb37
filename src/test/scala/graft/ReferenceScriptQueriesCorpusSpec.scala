package graft

/** Mechanical run of enginetest/queries/script_queries.go `ScriptTests`
  * (~320 setup+assert blocks — the reference's long-tail behavioral
  * corpus, 15.7k LoC). Each block runs in a fresh Engine like the
  * reference's fresh-session harness. Failing blocks are inventoried in
  * scripttests_divergences.txt (label<TAB>reason) — the inventory is
  * meant to SHRINK as fixes land. ReferenceScriptCorpusSpec keeps the
  * curated hand-ported subset with richer assertions.
  */
class ReferenceScriptQueriesCorpusSpec extends GoScriptCorpusSpec {
  val path = "/root/reference/enginetest/queries/script_queries.go"
  val varNames = Seq("ScriptTests")
  override def blockDivergenceFile: Option[String] =
    Some("src/test/resources/scripttests_divergences.txt")
  registerAll()
}
