package graft

/** Mechanical run of enginetest/queries/queries.go `QueryTests` (~1,370
  * read-only Query/Expected entries — the reference's main behavioral
  * corpus) plus `KeylessQueries` and `DateParseQueries`, over the
  * SimpleSetup fixture set (scriptgen/setup/helper.go:61), parsed from
  * setup_data.sg.go at test time. `myhistorytable`'s contents come from
  * the versioned-harness loader (enginetest/testdata.go:67-130): the
  * final 2019-01-03 state is (i, s, c) rows "… row, 3" / "1".."3".
  * ReferenceCorpusSpec keeps its curated hand-ported subset; this spec
  * is the breadth sweep.
  */
class ReferenceQueriesCorpusSpec extends GoQueryCorpusSpec {
  val path = "/root/reference/enginetest/queries/queries.go"
  val varNames = Seq("QueryTests", "KeylessQueries", "DateParseQueries")
  override def divergenceFile: Option[String] =
    Some("src/test/resources/querytests_divergences.txt")

  private val setupPath =
    "/root/reference/enginetest/scriptgen/setup/setup_data.sg.go"
  // helper.go:61 SimpleSetup, in order
  private val simpleSetup = Seq(
    "MydbData", "MytableData", "AutoincrementData", "BigtableData",
    "DatetimetableData", "EmptytableData", "Fk_tblData", "FloattableData",
    "NewlinetableData", "NiltableData", "OthertableData", "Invert_pkData",
    "SpecialtableData", "StringandtableData", "TabletestData",
    "TypestableData", "PeopleData", "Reserved_keywordsData",
    "Pk_tablesData", "Ordinals_ddlData", "JsontableData",
    "MyhistorytableData", "KeylessData", "FooData", "Graph_tablesData",
    "XyData")

  override def fixtures: Seq[String] =
    simpleSetup.flatMap(GoCorpus.setupScripts(setupPath, _)) ++ Seq(
      // versioned-harness final state (testdata.go:124-130); the CREATE
      // (with column c) comes from MyhistorytableData itself
      "insert into myhistorytable values " +
        "(1, 'first row, 3', '1'), (2, 'second row, 3', '2'), " +
        "(3, 'third row, 3', '3')")

  registerAll()
}
