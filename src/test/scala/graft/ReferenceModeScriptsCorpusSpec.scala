package graft

/** Mechanical run of three small reference corpora through [[GoScriptCorpusSpec]]:
  *
  *  - enginetest/queries/time_queries.go `TimeQueryTests` — time_zone
  *    session-variable semantics (named zones, offsets, SYSTEM, error
  *    1298 on junk). The reference harness freezes the wall clock to
  *    compare `now()` output; this engine does not, so the absolute
  *    `select now()` rows are pinned and the set/validation rows run.
  *  - enginetest/queries/ansi_quotes_queries.go `AnsiQuotesTests` —
  *    ANSI_QUOTES sql_mode: double-quoted identifiers across SELECT /
  *    DDL / views / prepared statements, and restore-on-unset.
  *  - enginetest/queries/check_scripts.go — CHECK constraint DDL and
  *    enforcement on INSERT/UPDATE, DROP CONSTRAINT, and the
  *    disallowed-expression taxonomy.
  */
class ReferenceTimeCorpusSpec extends GoScriptCorpusSpec {
  val path = "/root/reference/enginetest/queries/time_queries.go"
  val varNames = Seq("TimeQueryTests")
  override val divergences = Map(
    "select now()" ->
      "reference harness freezes the clock; now() is wall time here")
  registerAll()
}

class ReferenceAnsiQuotesCorpusSpec extends GoScriptCorpusSpec {
  val path = "/root/reference/enginetest/queries/ansi_quotes_queries.go"
  val varNames = Seq("AnsiQuotesTests")
  override val blockDivergences = Map(
    "ANSI_QUOTES: triggers" -> "triggers descoped (BASELINE.json)",
    "ANSI_QUOTES: stored procedures" -> "procedures descoped",
    "ANSI_QUOTES: events" -> "events descoped")
  // this engine normalizes ANSI-quoted identifiers to backticks at parse
  // time, so the stored view text reads back backticked — behavior is
  // identical under every later sql_mode; only the catalog text differs
  // (the reference stores the original text + creating sql_mode)
  override val divergences = Map(
    "show create table view1" ->
      "view definition stored post-ANSI_QUOTES normalization",
    "view_definition from information_schema.views where table_name='view1'" ->
      "view definition stored post-ANSI_QUOTES normalization")
  registerAll()
}

class ReferenceCheckScriptsCorpusSpec extends GoScriptCorpusSpec {
  val path = "/root/reference/enginetest/queries/check_scripts.go"
  val varNames = Seq(
    "CreateCheckConstraintsScripts",
    "DropCheckConstraintsScripts",
    "ChecksOnInsertScripts",
    "ChecksOnUpdateScriptTests",
    "DisallowedCheckConstraintsScripts")
  // these three run under ONE engine in the reference
  // (enginetests.go TestScriptWithEngine), so later blocks see earlier
  // blocks' tables
  override val sharedEngineVars = Set(
    "DropCheckConstraintsScripts", "ChecksOnInsertScripts",
    "DisallowedCheckConstraintsScripts")
  // ChecksSetup fixture (scriptgen/setup/setup_data.sg.go:46) — only the
  // Create var runs under it (enginetests.go:3413); the other vars use
  // bare MydbData
  override def fixturesFor(varName: String): Seq[String] =
    if (varName == "CreateCheckConstraintsScripts") Seq(
      "CREATE TABLE checks (a INTEGER PRIMARY KEY, b INTEGER, c varchar(20))",
      "ALTER TABLE checks ADD CONSTRAINT chk1 CHECK (B > 0)",
      "ALTER TABLE checks ADD CONSTRAINT chk2 CHECK (b > 0) NOT ENFORCED",
      "ALTER TABLE checks ADD CONSTRAINT chk3 CHECK (B > 1)",
      "ALTER TABLE checks ADD CONSTRAINT chk4 CHECK (upper(C) = c)")
    else Seq.empty
  registerAll()
}
