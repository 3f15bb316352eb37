package graft

/** Ad-hoc query runner over the queries.go SimpleSetup fixtures —
  * `Test/runMain graft.DebugRun "<sql>" ["<sql>" ...]` (or a @file of
  * newline-separated queries). Prints normalized rows or the error for
  * each, mirroring GoQueryCorpusSpec's execution path exactly.
  */
object DebugRun {
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

  def main(args0: Array[String]): Unit = {
    val bare = args0.headOption.contains("--bare")
    val args = if (bare) args0.tail else args0
    val spark = SparkSpec.spark
    val e = new Engine(spark)
    if (!bare) {
      val fixtures = simpleSetup.flatMap(GoCorpus.setupScripts(setupPath, _)) ++ Seq(
        "insert into myhistorytable values " +
          "(1, 'first row, 3', '1'), (2, 'second row, 3', '2'), " +
          "(3, 'third row, 3', '3')")
      fixtures.foreach(e.query)
    }
    val queries: Seq[String] = args.toSeq.flatMap { a =>
      if (a.startsWith("@"))
        scala.io.Source.fromFile(a.drop(1)).getLines()
          .filterNot(l => l.trim.isEmpty || l.startsWith("#")).toList
      else Seq(a)
    }
    queries.foreach { q =>
      println(s"== $q")
      try {
        val rows = e.query(q).collect()
          .map(r => (0 until r.length).map(i => GoNorm.norm(r.get(i))).toSeq)
        rows.take(20).foreach(r => println("   " + r.mkString("[", ", ", "]")))
        if (rows.length > 20) println(s"   ... ${rows.length} rows total")
        if (rows.isEmpty) println("   (0 rows)")
      } catch {
        case ex: Throwable =>
          println("   THREW " + String.valueOf(ex.getMessage).take(500))
      }
    }
    spark.stop()
  }
}
