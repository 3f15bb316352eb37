package graft

/** Triage helper: run every query pinned in querytests_divergences.txt
  * against the live engine and print the query, what we return (or
  * throw), and the reference's Expected rows — one report per entry.
  * `Test/runMain graft.DivergenceReport [substring-filter]`.
  */
object DivergenceReport extends GoQueryCorpusSpec {
  val path = "/root/reference/enginetest/queries/queries.go"
  val varNames = Seq("QueryTests", "KeylessQueries", "DateParseQueries")
  override def divergenceFile: Option[String] =
    Some("src/test/resources/querytests_divergences.txt")

  private val setupPath =
    "/root/reference/enginetest/scriptgen/setup/setup_data.sg.go"
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
      "insert into myhistorytable values " +
        "(1, 'first row, 3', '1'), (2, 'second row, 3', '2'), " +
        "(3, 'third row, 3', '3')")

  def main(args: Array[String]): Unit = {
    val filter = args.headOption.getOrElse("")
    val pins = {
      val src = scala.io.Source.fromFile(divergenceFile.get, "UTF-8")
      try src.getLines().map(_.trim)
        .filterNot(l => l.isEmpty || l.startsWith("#")).map(normQ).toSet
      finally src.close()
    }
    val entries = varNames.flatMap(v => GoCorpus.queryTests(path, v))
      .filter(a => pins.contains(normQ(a.query)))
      .filter(a => a.query.toLowerCase.contains(filter.toLowerCase))
    println(s"=== ${entries.size} pinned entries matched ===")
    entries.foreach { a =>
      println("== " + normQ(a.query))
      if (a.expectErr) println("   want: <error>")
      else a.expected match {
        case Some(w) => println("   want: " +
          w.take(12).map(_.map(GoNorm.norm).mkString("[", ", ", "]")).mkString(" "))
        case None => println("   want: <exec-only>")
      }
      runOne(a) match {
        case None => println("   NOW PASSES")
        case Some(msg) =>
          val got = msg.linesIterator.drop(1).mkString("\n   ")
          println("   " + got.take(800))
      }
      println()
    }
    SparkSpec.spark.stop()
  }
}
