package graft

import org.scalatest.funsuite.AnyFunSuite

/** System-variable session surface, ported from the reference's
  * enginetest corpus (enginetest/queries/variable_queries.go): SET of
  * session/global system variables with every spelling (@@x,
  * @@session.x, SESSION x, bare x), ON/OFF/true/false normalization,
  * DEFAULT restore, mixed user+system SET lists, and the
  * scope-carrying column names for bare @@var reads.
  */
class ReferenceVariableCorpusSpec extends AnyFunSuite {
  import SparkSpec.spark

  private lazy val engine = new Engine(spark)

  private def row(sql: String): Seq[Any] = {
    val r = engine.query(sql).collect()(0)
    (0 until r.length).map(r.get)
  }

  private def cols(sql: String): Seq[String] =
    engine.query(sql).schema.fieldNames.toSeq

  test("set system variables (variable_queries.go:32-56)") {
    engine.query("set @@auto_increment_increment = 3, sql_select_limit = 1000")
    assert(row("SELECT @@auto_increment_increment, @@sql_select_limit") ==
      Seq(3, 1000))
    // mixed case spelling of the SET keyword path
    engine.query("sEt @@auto_increment_increment = 4, sql_select_limit = 2000")
    assert(row("SELECT @@auto_increment_increment, @@sql_select_limit") ==
      Seq(4, 2000))
    // DEFAULT restores the builtin
    engine.query("set @@auto_increment_increment = default, " +
      "sql_select_limit = default")
    assert(row("SELECT @@auto_increment_increment, @@sql_select_limit") ==
      Seq(1, 2147483647))
  }

  test("scope is included in the returned column name exactly as " +
      "written (variable_queries.go:59-101)") {
    assert(cols("select @@max_allowed_packet;") ==
      Seq("@@max_allowed_packet"))
    assert(cols("select @@session.max_allowed_packet;") ==
      Seq("@@session.max_allowed_packet"))
    assert(cols("select @@global.max_allowed_packet;") ==
      Seq("@@global.max_allowed_packet"))
    assert(cols("select @@GLoBAL.max_allowed_packet;") ==
      Seq("@@GLoBAL.max_allowed_packet"))
    assert(row("select @@max_allowed_packet") == Seq(67108864))
  }

  test("mixed user and system variables in one SET " +
      "(variable_queries.go:125-139)") {
    engine.query("set @myvar = 5, @@autocommit = 0, @myvar2 = 'hi', " +
      "@myvar3 = (select 2 + 2)")
    assert(row("select @myvar, @@autocommit, @myvar2, @myvar3") ==
      Seq(5, 0, "hi", 4))
    engine.query("set @@autocommit = default")
  }

  test("ON / OFF / true / false spellings normalize to 1/0 " +
      "(variable_queries.go:162-210)") {
    engine.query("set @@autocommit = ON, session default_table_encryption = off")
    assert(row("SELECT @@autocommit, @@session.default_table_encryption") ==
      Seq(1, 0))
    engine.query("set @@autocommit = OFF, session default_table_encryption = on")
    assert(row("SELECT @@autocommit, @@session.default_table_encryption") ==
      Seq(0, 1))
    engine.query("set @@autocommit = 'true', " +
      "session default_table_encryption = 'false'")
    assert(row("SELECT @@autocommit, @@session.default_table_encryption") ==
      Seq(1, 0))
    engine.query("set @@autocommit = true, " +
      "session default_table_encryption = false")
    assert(row("SELECT @@autocommit, @@session.default_table_encryption") ==
      Seq(1, 0))
    engine.query("set @@autocommit = default, " +
      "session default_table_encryption = default")
  }

  test("string foreign_key_checks spelling and expression values " +
      "(variable_queries.go:26, 212+)") {
    engine.query("set @@foreign_key_checks = off")
    assert(row("select @@foreign_key_checks") == Seq(0))
    engine.query("set @@foreign_key_checks = default")
    // expression value evaluates through the engine
    engine.query("set @@auto_increment_increment = 1 + 2")
    assert(row("select @@auto_increment_increment") == Seq(3))
    engine.query("set @@lc_messages = concat('en', '_US')")
    assert(row("select @@lc_messages") == Seq("en_US"))
    engine.query("set @@auto_increment_increment = default, " +
      "@@lc_messages = default")
  }

  test("SHOW VARIABLES reflects session overrides live") {
    engine.query("set @@auto_increment_increment = 7")
    assert(row("SHOW VARIABLES LIKE 'auto_increment_increment'") ==
      Seq("auto_increment_increment", "7"))
    engine.query("set @@auto_increment_increment = default")
    assert(row("SHOW VARIABLES LIKE 'auto_increment_increment'") ==
      Seq("auto_increment_increment", "1"))
    assert(row("SHOW VARIABLES LIKE 'version'") == Seq("version", "8.0.31"))
  }

  test("assigning an unknown system variable is MySQL 1193, and no " +
      "phantom variable leaks into SHOW VARIABLES " +
      "(variable_queries.go ErrUnknownSystemVariable)") {
    assert(intercept[IllegalArgumentException] {
      engine.query("SET @@no_such_var = 1")
    }.getMessage.contains("1193"))
    assert(intercept[IllegalArgumentException] {
      engine.query("SET no_such_var = 1")
    }.getMessage.contains("1193"))
    assert(engine.query("SHOW VARIABLES LIKE 'no_such_var'")
      .collect().isEmpty)
    // a known variable still assigns through the same dispatch
    engine.query("SET @@max_connections = 200")
    assert(row("SHOW VARIABLES LIKE 'max_connections'") ==
      Seq("max_connections", "200"))
    engine.query("SET @@max_connections = default")
  }

  test("sql_mode and time_zone keep their dedicated setters inside a " +
      "SET list") {
    engine.query("set @@sql_mode = 'ANSI_QUOTES', @@autocommit = 0")
    assert(row("select @@sql_mode") == Seq("ANSI_QUOTES"))
    engine.query("SET sql_mode = " +
      "'NO_ENGINE_SUBSTITUTION,ONLY_FULL_GROUP_BY,STRICT_TRANS_TABLES'")
    engine.query("set @@autocommit = default")
  }
}
