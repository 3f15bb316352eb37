package graft

import org.scalatest.funsuite.AnyFunSuite

/** Regression tests for the round-16 ADVICE defects. */
class AdviceR16Spec extends AnyFunSuite {
  import SparkSpec.spark
  private lazy val engine = {
    val e = new Engine(spark); e.attachDir(SparkSpec.sfDir); e
  }

  test("havingKeysToWhere parenthesizes an existing WHERE (OR precedence)") {
    val e = new Engine(spark)
    e.query("CREATE TABLE hkw (a INT, b INT, c INT)")
    e.query("INSERT INTO hkw VALUES (1, 0, 5), (0, 1, 5), (0, 0, 9)")
    // MySQL: HAVING c binds the grouped column; rows where (a OR b) then
    // HAVING c > 6 keeps only groups with c > 6 — i.e., none of the
    // first two rows. An unparenthesized splice `a OR b AND (c > 6)`
    // would wrongly keep (1, 0, 5).
    val got = SqlRewrite.havingKeysToWhere(
      "SELECT c FROM hkw WHERE a = 1 OR b = 1 GROUP BY c HAVING c > 6")
    assert(got.toLowerCase.contains("where ((a = 1 or b = 1) and (c > 6))"),
      got)
    val rows = e.query(got).collect()
    assert(rows.isEmpty, rows.mkString(","))
  }

  test("havingKeysToWhere requires whole GROUP BY items, not word matches") {
    // `a` is a word inside the key expression a+b but NOT constant per
    // group — the filter must stay a HAVING (no rewrite)
    val sql = "SELECT a+b FROM t GROUP BY a+b HAVING a > 1"
    assert(SqlRewrite.havingKeysToWhere(sql) == sql)
    // whole-item match still moves
    val moved = SqlRewrite.havingKeysToWhere(
      "SELECT a FROM t GROUP BY a HAVING a > 1")
    assert(moved.toLowerCase.contains("where (a > 1)"), moved)
  }

  test("stableTopN skips implicit aggregates and pk-shadowing aliases") {
    val pk = (_: String) => Some(Seq("pk"))
    // implicit aggregate, no GROUP BY: appending pk would be
    // MISSING_AGGREGATION — leave the text alone
    val agg = "SELECT count(*) FROM t ORDER BY 1 LIMIT 1"
    assert(SqlRewrite.stableTopN(agg, pk) == agg)
    // a select alias equal to the pk name would capture the appended
    // tiebreaker — skip
    val alias = "SELECT -x AS pk FROM t ORDER BY 1 LIMIT 1"
    assert(SqlRewrite.stableTopN(alias, pk) == alias)
    // the plain shape still gets the tiebreaker
    val plain = "SELECT y FROM t ORDER BY y LIMIT 1"
    assert(SqlRewrite.stableTopN(plain, pk)
      .toLowerCase.contains("`pk`"))
    // end-to-end: a previously-valid implicit aggregate on a pk'd table
    // must not error under the retry ladder
    val e = new Engine(spark)
    e.query("CREATE TABLE stn (pk INT PRIMARY KEY, v INT)")
    e.query("INSERT INTO stn VALUES (1, 10), (2, 20)")
    val r = e.query("SELECT count(*) FROM stn ORDER BY 1 LIMIT 1").collect()
    assert(r.length == 1 && r(0).getLong(0) == 2L)
    val r2 = e.query("SELECT -pk AS pk FROM stn ORDER BY 1 LIMIT 1").collect()
    assert(r2.length == 1 && r2(0).get(0).toString == "-2")
  }

  test("SELECT INTO OUTFILE/DUMPFILE: 1086 on existing file, raw bytes, " +
      "secure_file_priv") {
    val dir = java.nio.file.Files.createTempDirectory("graft_into").toString
    val e = new Engine(spark)
    e.query("CREATE TABLE intof (b BLOB)")
    e.query("INSERT INTO intof VALUES (X'DEADBEEF')")
    // DUMPFILE writes the BINARY cell raw (4 bytes, not a toString)
    e.query(s"SELECT b FROM intof INTO DUMPFILE '$dir/d.bin'")
    val bytes = java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(s"$dir/d.bin"))
    assert(bytes.toSeq == Seq(0xDE, 0xAD, 0xBE, 0xEF).map(_.toByte))
    // second write to the same path: MySQL error 1086
    val ex = intercept[IllegalArgumentException] {
      e.query(s"SELECT b FROM intof INTO DUMPFILE '$dir/d.bin'")
    }
    assert(ex.getMessage.contains("already exists"), ex.getMessage)
    // OUTFILE gets the same existence gate
    e.query(s"SELECT 1 INTO OUTFILE '$dir/o1'")
    val ex2 = intercept[IllegalArgumentException] {
      e.query(s"SELECT 1 INTO OUTFILE '$dir/o1'")
    }
    assert(ex2.getMessage.contains("already exists"), ex2.getMessage)
    // secure_file_priv restricts targets to the configured directory
    e.secureFilePriv = Some(dir)
    val ex3 = intercept[IllegalArgumentException] {
      e.query("SELECT 1 INTO OUTFILE '/tmp/graft_outside_priv'")
    }
    assert(ex3.getMessage.contains("secure-file-priv"), ex3.getMessage)
    e.query(s"SELECT 1 INTO OUTFILE '$dir/o2'") // inside: fine
    e.secureFilePriv = None
  }

  test("refreshViews keys on parsed table deps, not word matches") {
    assert(SqlRewrite.tableRefs(
      "SELECT * FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey")
      == Set("orders", "lineitem"))
    assert(SqlRewrite.tableRefs("SELECT * FROM a, b WHERE a.x = b.x")
      == Set("a", "b"))
    assert(SqlRewrite.tableRefs("SELECT * FROM db1.t1") ==
      Set("db1.t1", "t1"))
    // a COLUMN named like a table is not a dependency
    assert(!SqlRewrite.tableRefs(
      "SELECT customer FROM orders").contains("customer"))
    // end-to-end: a view selecting a column named like another table
    // must not refresh (and must not break) when that table changes
    val e = new Engine(spark)
    e.query("CREATE TABLE vd_base (other INT)")
    e.query("CREATE TABLE other (x INT)")
    e.query("INSERT INTO vd_base VALUES (7)")
    e.query("CREATE VIEW vd_v AS SELECT other FROM vd_base")
    e.query("INSERT INTO other VALUES (1)")
    assert(e.query("SELECT * FROM vd_v").collect().map(_.getInt(0)).toSeq
      == Seq(7))
    // a real dependency still refreshes
    e.query("INSERT INTO vd_base VALUES (8)")
    assert(e.query("SELECT * FROM vd_v ORDER BY other").collect()
      .map(_.getInt(0)).toSeq == Seq(7, 8))
  }

  test("refreshViews cascades through chained views") {
    val e = new Engine(spark)
    e.query("CREATE TABLE chain_t (x INT)")
    e.query("INSERT INTO chain_t VALUES (1)")
    e.query("CREATE VIEW chain_v1 AS SELECT x FROM chain_t")
    e.query("CREATE VIEW chain_v2 AS SELECT x FROM chain_v1")
    e.query("INSERT INTO chain_t VALUES (2)")
    assert(e.query("SELECT * FROM chain_v2 ORDER BY x").collect()
      .map(_.getInt(0)).toSeq == Seq(1, 2))
  }

  test("uuid_to_bin accepts X'…' binary literals spelling a UUID") {
    val e = new Engine(spark)
    // the hex bytes spell the TEXT '6ccd780c-baba-1026-9564-5b8c656024db'
    val hexText = "6ccd780cbaba102695645b8c656024db"
    val lit = "X'" + hexText.getBytes("UTF-8").map("%02X".format(_))
      .mkString + "'"
    val r = e.query(s"SELECT hex(uuid_to_bin($lit)) AS h").collect()
    assert(r(0).getString(0).equalsIgnoreCase(hexText))
    // numeric literals still error eagerly
    val ex = intercept[Exception] {
      e.query("SELECT uuid_to_bin(123)").collect()
    }
    assert(ex.getMessage.contains("UUID"), ex.getMessage)
  }

  test("selectInto API is bounded (no unbounded driver collect)") {
    val ex = intercept[IllegalArgumentException] {
      engine.selectInto("SELECT l_orderkey FROM lineitem", "six")
    }
    assert(ex.getMessage.contains("more than one"), ex.getMessage)
    engine.selectInto("SELECT 42", "six")
    assert(engine.query("SELECT @six AS v").collect()(0).get(0)
      .toString == "42")
  }
}
