package graft

/** Mechanical run of enginetest/queries/script_queries.go
  * `CreateDatabaseScripts` / `DropDatabaseScripts` (the database-DDL
  * tail of the ScriptTests file). The reference harness starts every
  * script in a fresh session with `mydb` selected — mirrored by the
  * fixtures. (`BrokenScriptTests` in the same file is upstream's
  * intentionally-broken set and is excluded everywhere.)
  */
class ReferenceDatabaseScriptsSpec extends GoScriptCorpusSpec {
  val path = "/root/reference/enginetest/queries/script_queries.go"
  val varNames = Seq("CreateDatabaseScripts", "DropDatabaseScripts")
  override def fixtures: Seq[String] = Seq(
    // earlier suites may leave catalog databases behind (the info-schema
    // fixtures create `foo`); the scripts assert exact SHOW DATABASES
    // contents, so start from the reference harness's {mydb} state
    "DROP DATABASE IF EXISTS foo",
    "CREATE DATABASE IF NOT EXISTS mydb",
    "USE mydb")
  override def blockDivergenceFile: Option[String] =
    Some("src/test/resources/scripttests_divergences.txt")
  registerAll()

  // registered last (ScalaTest runs in registration order): the blocks
  // deliberately leave databases behind — drop them so the shared
  // SparkSession's catalog is clean for later suites
  test("cleanup: drop databases created by the scripts") {
    val e = newEngine()
    Seq("newdatabase", "testdb", "testdb2", "testdb3", "newtestdb",
      "newtest1db", "mydb").foreach { d =>
      try e.spark.sql(s"DROP DATABASE IF EXISTS `$d` CASCADE")
      catch { case _: Throwable => () }
    }
    e.spark.sql("USE default")
    assert(e.spark.catalog.currentDatabase == "default")
  }
}
