package graft

import org.scalatest.funsuite.AnyFunSuite

/** Ordinal-vs-declaration-order corpus ported from the reference
  * (enginetest/queries/ordinal_ddl_queries.go): a composite PRIMARY KEY's
  * SHOW KEYS order follows the KEY declaration, while
  * information_schema.columns ordinal_position follows the COLUMN
  * declaration — and ALTER ADD/MODIFY ... AFTER, RENAME COLUMN, DROP
  * PRIMARY KEY, and ADD PRIMARY KEY keep both surfaces consistent.
  */
class ReferenceOrdinalDdlCorpusSpec extends AnyFunSuite {
  import SparkSpec.spark

  private def freshEngine: Engine = {
    val e = new Engine(spark.newSession())
    // setup_data.sg.go ordinal fixtures
    e.runScript(
      """CREATE TABLE short_ord_pk (x int not null, y int not null, primary key (y,x));
        |CREATE TABLE long_ord_pk1 (u int, v int, w int, x int, y int, z int, PRIMARY KEY (y,v));
        |CREATE TABLE long_ord_pk2 (u int, v int, w int, x int, y int, z int, PRIMARY KEY (y,v,x,z,u));
        |CREATE TABLE ord_kl (u int, v int, w int, x int, y int, z int);""".stripMargin)
    e
  }

  private def keys(e: Engine, t: String): Seq[(Int, String)] =
    e.query(s"show keys from $t").collect()
      .map(r => (r.getInt(3), r.getString(4))).toSeq.sortBy(_._1)

  private def ordinals(e: Engine, t: String, pkOnly: Boolean): Seq[(String, Int)] = {
    e.enableInformationSchema()
    val filter = if (pkOnly) " and column_key = 'PRI'" else ""
    e.query(
      s"""SELECT column_name, ordinal_position FROM INFORMATION_SCHEMA.COLUMNS
          WHERE TABLE_NAME = '$t'$filter ORDER BY column_name""")
      .collect().map(r => (r.getString(0), r.getInt(1))).toSeq
  }

  test("SHOW KEYS follows key declaration; ordinal_position follows column order (ordinal_ddl_queries.go:24-80)") {
    val e = freshEngine
    assert(keys(e, "short_ord_pk") == Seq(1 -> "y", 2 -> "x"))
    assert(ordinals(e, "short_ord_pk", pkOnly = false) ==
      Seq("x" -> 1, "y" -> 2))
    assert(keys(e, "long_ord_pk1") == Seq(1 -> "y", 2 -> "v"))
    assert(ordinals(e, "long_ord_pk1", pkOnly = true) ==
      Seq("v" -> 2, "y" -> 5))
    assert(keys(e, "long_ord_pk2") ==
      Seq(1 -> "y", 2 -> "v", 3 -> "x", 4 -> "z", 5 -> "u"))
    assert(ordinals(e, "long_ord_pk2", pkOnly = true) ==
      Seq("u" -> 1, "v" -> 2, "x" -> 4, "y" -> 5, "z" -> 6))
    // keyless table: both surfaces empty
    assert(keys(e, "ord_kl").isEmpty)
    assert(ordinals(e, "ord_kl", pkOnly = true).isEmpty)
  }

  test("ALTER ADD/MODIFY ... AFTER shifts ordinals, not key order (ordinal_ddl_queries.go:103-175)") {
    val e = freshEngine
    e.query("ALTER TABLE long_ord_pk1 ADD COLUMN ww int AFTER v")
    assert(ordinals(e, "long_ord_pk1", pkOnly = true) ==
      Seq("v" -> 2, "y" -> 6))
    e.query("ALTER TABLE long_ord_pk1 MODIFY COLUMN w int AFTER y")
    assert(ordinals(e, "long_ord_pk1", pkOnly = true) ==
      Seq("v" -> 2, "y" -> 5))
    assert(keys(e, "long_ord_pk1") == Seq(1 -> "y", 2 -> "v"))
  }

  test("DROP / ADD PRIMARY KEY rewrite the key surface (ordinal_ddl_queries.go:125-150)") {
    val e = freshEngine
    e.query("ALTER TABLE long_ord_pk1 DROP PRIMARY KEY")
    assert(keys(e, "long_ord_pk1").isEmpty)
    assert(ordinals(e, "long_ord_pk1", pkOnly = true).isEmpty)
    e.query("ALTER TABLE ord_kl ADD PRIMARY KEY (y,v)")
    assert(keys(e, "ord_kl") == Seq(1 -> "y", 2 -> "v"))
    assert(ordinals(e, "ord_kl", pkOnly = true) ==
      Seq("v" -> 2, "y" -> 5))
  }

  test("RENAME COLUMN carries the key declaration (ordinal_ddl_queries.go:180-220)") {
    val e = freshEngine
    e.query("ALTER TABLE long_ord_pk1 RENAME COLUMN y to yy")
    assert(keys(e, "long_ord_pk1") == Seq(1 -> "yy", 2 -> "v"))
    assert(ordinals(e, "long_ord_pk1", pkOnly = true) ==
      Seq("v" -> 2, "yy" -> 5))
  }
}
