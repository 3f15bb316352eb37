package graft

import org.scalatest.funsuite.AnyFunSuite

/** Diagnostics-area corpus, ported from the reference's enginetest
  * warning assertions (ExpectedWarning / ExpectedWarningsCount):
  * insert_queries.go "Try INSERT IGNORE with primary key, non null, and
  * single row violations" / "Test that INSERT IGNORE properly addresses
  * data conversion", update_queries.go UpdateIgnoreScripts, and the
  * SHOW WARNINGS lifecycle from queries.go:5181. The session feed is
  * reference sql/session.go:680 (Context.Warn).
  */
class WarningsSpec extends AnyFunSuite {
  import SparkSpec.spark

  private lazy val engine = new Engine(spark)

  private def rows(sql: String): Seq[Seq[Any]] =
    engine.query(sql).collect().toSeq.map(_.toSeq)

  /** (code, level) pairs currently in the diagnostics area. */
  private def warnRows(): Seq[(Int, String)] =
    engine.query("SHOW WARNINGS").collect().toSeq
      .map(r => (r.getInt(1), r.getString(0)))

  private def warningCount(): Int =
    engine.query("SHOW COUNT(*) WARNINGS").collect()(0).getInt(0)

  test("SHOW WARNINGS lifecycle: empty by default, LIMIT 0, cleared by " +
      "the next statement, preserved across SHOW WARNINGS reads " +
      "(queries.go:5181)") {
    engine.query("create table wlife (pk int primary key)")
    engine.query("insert into wlife values (1)")
    assert(rows("SHOW WARNINGS") == Seq.empty)
    assert(rows("SHOW WARNINGS LIMIT 0") == Seq.empty)
    assert(warningCount() == 0)
    // IGNORE dup produces one 1062 warning...
    engine.query("insert ignore into wlife values (1)")
    assert(warnRows() == Seq((1062, "Warning")))
    // ...which survives repeated SHOW WARNINGS / count reads...
    assert(warnRows() == Seq((1062, "Warning")))
    assert(warningCount() == 1)
    assert(rows("SELECT @@warning_count") == Seq(Seq(1)))
    // ...honors LIMIT...
    assert(rows("SHOW WARNINGS LIMIT 1").size == 1)
    // ...and is cleared by the next ordinary statement
    engine.query("select * from wlife")
    assert(warnRows() == Seq.empty)
    assert(warningCount() == 0)
    engine.query("drop table wlife")
  }

  test("INSERT IGNORE: duplicate-key skip warns 1062; NULL into NOT " +
      "NULL stores the zero value and warns 1048 (insert_queries.go " +
      "'Try INSERT IGNORE with primary key, non null, and single row " +
      "violations')") {
    engine.runScript(
      """CREATE TABLE y (pk int primary key, c1 int NOT NULL);
        |INSERT IGNORE INTO y VALUES (1, 1), (1,2), (2, 2), (3, 3);
        |""".stripMargin)
    assert(rows("SELECT * FROM y order by pk") ==
      Seq(Seq(1, 1), Seq(2, 2), Seq(3, 3)))
    assert(rows("INSERT IGNORE INTO y VALUES (1, 2), (4,4)") == Seq(Seq(1L)))
    assert(warnRows() == Seq((1062, "Warning")))
    assert(rows("INSERT IGNORE INTO y VALUES (5, NULL)") == Seq(Seq(1L)))
    assert(warnRows() == Seq((1048, "Warning")))
    assert(rows("SELECT * FROM y where pk = 5") == Seq(Seq(5, 0)))
    assert(rows("INSERT IGNORE INTO y VALUES (3, 8)") == Seq(Seq(0L)))
    assert(warnRows() == Seq((1062, "Warning")))
    engine.query("drop table y")
  }

  test("INSERT IGNORE data conversion: failed cast stores the type zero " +
      "value (1366); over-length VARCHAR truncates (1105) " +
      "(insert_queries.go 'Test that INSERT IGNORE properly addresses " +
      "data conversion')") {
    engine.runScript(
      """CREATE TABLE ict1 (pk int primary key, v1 int);
        |CREATE TABLE ict2 (pk int primary key, v2 varchar(1));
        |""".stripMargin)
    assert(rows("INSERT IGNORE INTO ict1 VALUES (1, 'dasd')") == Seq(Seq(1L)))
    assert(warnRows() == Seq((1366, "Warning")))
    assert(rows("SELECT * FROM ict1") == Seq(Seq(1, 0)))
    assert(rows("INSERT IGNORE INTO ict2 values (1, 'adsda')") == Seq(Seq(1L)))
    assert(warnRows() == Seq((1105, "Warning")))
    assert(rows("SELECT * FROM ict2") == Seq(Seq(1, "a")))
    // plain INSERT errors on over-length instead (strings.go:465)
    assert(intercept[IllegalArgumentException] {
      engine.query("INSERT INTO ict2 values (2, 'toolong')")
    }.getMessage.contains("too large"))
    engine.runScript("drop table ict1; drop table ict2;")
  }

  test("INSERT IGNORE vocabulary: bad ENUM value truncates to '' with a " +
      "1265 warning; unique-key skip warns once per skipped row " +
      "(insert_queries.go issue-8611 shape + unique-key block)") {
    engine.runScript(
      """CREATE TABLE xw (pk int primary key, v enum('a','b'));
        |CREATE TABLE one_uniqw (pk int PRIMARY KEY, col1 int UNIQUE);
        |INSERT INTO one_uniqw values (1, 1);
        |""".stripMargin)
    assert(rows("INSERT IGNORE INTO xw VALUES (1, 'c')") == Seq(Seq(1L)))
    assert(warnRows() == Seq((1265, "Warning")))
    assert(rows("SELECT * FROM xw") == Seq(Seq(1, "")))
    assert(rows(
      "INSERT IGNORE INTO one_uniqw VALUES (3, 2), (2, 1), (4, null), (5, null)")
      == Seq(Seq(3L)))
    assert(warnRows() == Seq((1062, "Warning")))
    assert(rows("SELECT * from one_uniqw order by pk") ==
      Seq(Seq(1, 1), Seq(3, 2), Seq(4, null), Seq(5, null)))
    engine.runScript("drop table xw; drop table one_uniqw;")
  }

  test("UPDATE IGNORE: key collisions warn 1062 per skipped row; NULL " +
      "into a key column zero-fills with 1048 per row " +
      "(update_queries.go UpdateIgnoreScripts)") {
    engine.runScript(
      """CREATE TABLE pkw (pk int, val int, primary key(pk, val));
        |CREATE TABLE idxw (pk int primary key, val int UNIQUE);
        |INSERT INTO pkw VALUES (1, 1), (2, 2), (3, 3);
        |INSERT INTO idxw VALUES (1, 1), (2, 2), (3, 3);
        |""".stripMargin)
    assert(rows("UPDATE IGNORE pkw set pk = pk + 1, val = val + 1") ==
      Seq(Seq(3L)))
    assert(warnRows() == Seq((1062, "Warning"), (1062, "Warning")))
    assert(rows("SELECT * FROM pkw order by pk") ==
      Seq(Seq(1, 1), Seq(2, 2), Seq(4, 4)))
    assert(rows("UPDATE IGNORE idxw set val = val + 1") == Seq(Seq(3L)))
    assert(warnRows() == Seq((1062, "Warning"), (1062, "Warning")))
    assert(rows("SELECT * FROM idxw order by pk") ==
      Seq(Seq(1, 1), Seq(2, 2), Seq(3, 4)))
    // NULL into the composite-PK column: zero value + 1048 per row
    engine.query("UPDATE IGNORE pkw set val = val + 1 where pk = 2")
    assert(rows("SELECT * FROM pkw order by pk") ==
      Seq(Seq(1, 1), Seq(2, 3), Seq(4, 4)))
    assert(rows("UPDATE IGNORE pkw SET pk = NULL") == Seq(Seq(3L)))
    assert(warnRows().forall(_ == ((1048, "Warning"))))
    assert(warningCount() == 3)
    assert(rows("SELECT * FROM pkw order by pk, val") ==
      Seq(Seq(0, 1), Seq(0, 3), Seq(0, 4)))
    engine.runScript("drop table pkw; drop table idxw;")
  }

  test("UPDATE IGNORE type conversion: failed cast stores the zero " +
      "value and warns 1366, not a row skip (update_queries.go 'UPDATE " +
      "IGNORE with type conversions')") {
    engine.runScript(
      """CREATE TABLE uct1 (pk int primary key, v1 int, v2 int);
        |INSERT INTO uct1 VALUES (1, 1, 1);
        |""".stripMargin)
    assert(rows("UPDATE IGNORE uct1 SET v1 = 'dsddads'") == Seq(Seq(1L)))
    assert(warnRows() == Seq((1366, "Warning")))
    assert(rows("SELECT * FROM uct1") == Seq(Seq(1, 0, 1)))
    assert(rows("UPDATE IGNORE uct1 SET pk = 'dasda', v2 = 'dsddads'") ==
      Seq(Seq(1L)))
    assert(warnRows() == Seq((1366, "Warning"), (1366, "Warning")))
    assert(rows("SELECT * FROM uct1") == Seq(Seq(0, 0, 0)))
    engine.query("drop table uct1")
  }

  test("UPDATE IGNORE FK / CHECK violations keep the old row and warn " +
      "1452 / 1105 (update_queries.go 'UPDATE IGNORE with foreign " +
      "keys' / 'with check constraints')") {
    engine.runScript(
      """CREATE TABLE colorsw (id INT NOT NULL, color VARCHAR(32) NOT NULL, PRIMARY KEY (id), INDEX color_index(color));
        |CREATE TABLE objectsw (id INT NOT NULL, name VARCHAR(64) NOT NULL, color VARCHAR(32), PRIMARY KEY(id), FOREIGN KEY (color) REFERENCES colorsw(color));
        |INSERT INTO colorsw (id,color) VALUES (1,'red'),(2,'green'),(3,'blue'),(4,'purple');
        |INSERT INTO objectsw (id,name,color) VALUES (1,'truck','red'),(2,'ball','green'),(3,'shoe','blue');
        |""".stripMargin)
    assert(rows("UPDATE IGNORE objectsw SET color = 'orange' where id = 2") ==
      Seq(Seq(1L)))
    assert(warnRows() == Seq((1452, "Warning")))
    assert(rows("SELECT * FROM objectsw ORDER BY id") ==
      Seq(Seq(1, "truck", "red"), Seq(2, "ball", "green"),
        Seq(3, "shoe", "blue")))
    engine.runScript("drop table objectsw; drop table colorsw;")

    engine.runScript(
      """CREATE TABLE checksw (pk int primary key);
        |ALTER TABLE checksw ADD CONSTRAINT mycx CHECK (pk < 5);
        |INSERT INTO checksw VALUES (1),(2),(3),(4);
        |""".stripMargin)
    assert(rows("UPDATE IGNORE checksw SET pk = pk + 1 where pk = 4") ==
      Seq(Seq(1L)))
    assert(warnRows() == Seq((1105, "Warning")))
    assert(rows("SELECT * from checksw ORDER BY pk") ==
      Seq(Seq(1), Seq(2), Seq(3), Seq(4)))
    engine.query("drop table checksw")
  }

  test("INSERT IGNORE + ON DUPLICATE KEY UPDATE: failed assignment " +
      "conversion zero-fills with 1366; CHECK-violating ODKU keeps the " +
      "old row (insert_queries.go 'Insert Ignore works correctly with " +
      "ON DUPLICATE UPDATE')") {
    engine.runScript(
      """CREATE TABLE odt1 (id INT PRIMARY KEY, v int);
        |INSERT INTO odt1 VALUES (1,1);
        |CREATE TABLE odt2 (pk int primary key, v2 varchar(1));
        |ALTER TABLE odt2 ADD CONSTRAINT cx CHECK (pk < 100);
        |""".stripMargin)
    assert(rows(
      "INSERT IGNORE INTO odt1 VALUES (1,2) ON DUPLICATE KEY UPDATE v='dsd'")
      == Seq(Seq(2L)))
    assert(warnRows() == Seq((1366, "Warning")))
    assert(rows("SELECT * FROM odt1") == Seq(Seq(1, 0)))
    assert(rows("INSERT IGNORE INTO odt2 values (1, 'adsda')") == Seq(Seq(1L)))
    assert(rows("SELECT * FROM odt2") == Seq(Seq(1, "a")))
    // CHECK-violating ODKU under IGNORE: row keeps old values, 0 affected
    assert(rows(
      "INSERT IGNORE INTO odt2 VALUES (1, 's') ON DUPLICATE KEY UPDATE pk = 1000")
      == Seq(Seq(0L)))
    assert(rows("SELECT * FROM odt2") == Seq(Seq(1, "a")))
    // strict (non-IGNORE) ODKU conversion failure errors 1366
    assert(intercept[IllegalArgumentException] {
      engine.query("INSERT INTO odt1 VALUES (1,2) ON DUPLICATE KEY UPDATE v='xx'")
    }.getMessage.contains("1366"))
    engine.runScript("drop table odt1; drop table odt2;")
  }

  test("out-of-range numeric writes clamp to the type bound and warn " +
      "1264 under IGNORE / non-strict mode (rowexec/insert.go " +
      "ConvertRound + ErrValueOutOfRange; update.go convert)") {
    engine.runScript(
      """CREATE TABLE oorw (pk int primary key, t tinyint, s smallint, i int);
        |INSERT INTO oorw VALUES (1, 1, 1, 1);
        |""".stripMargin)
    // INSERT IGNORE: 300 into TINYINT clamps to 127 (not Spark's
    // wrapped 44), -300 clamps to -128; 40000 into SMALLINT -> 32767
    assert(rows("INSERT IGNORE INTO oorw VALUES (2, 300, 40000, 5)") ==
      Seq(Seq(1L)))
    assert(warnRows().sorted == Seq((1264, "Warning"), (1264, "Warning")))
    assert(rows("SELECT t, s, i FROM oorw WHERE pk = 2") ==
      Seq(Seq(127, 32767, 5)))
    assert(rows("INSERT IGNORE INTO oorw VALUES (3, -300, -40000, 6)") ==
      Seq(Seq(1L)))
    assert(rows("SELECT t, s FROM oorw WHERE pk = 3") ==
      Seq(Seq(-128, -32768)))
    // string numeric over the range clamps too (ConvertRound parses
    // then range-checks), not the 1366 zero-value path
    assert(rows("INSERT IGNORE INTO oorw VALUES (4, '200', 7, 7)") ==
      Seq(Seq(1L)))
    assert(warnRows() == Seq((1264, "Warning")))
    assert(rows("SELECT t FROM oorw WHERE pk = 4") == Seq(Seq(127)))
    // non-strict plain INSERT takes the same path
    engine.query("SET sql_mode = ''")
    assert(rows("INSERT INTO oorw VALUES (5, 999, 8, 8)") == Seq(Seq(1L)))
    assert(warnRows() == Seq((1264, "Warning")))
    assert(rows("SELECT t FROM oorw WHERE pk = 5") == Seq(Seq(127)))
    // UPDATE (non-strict) clamps through the assignment cast
    assert(rows("UPDATE oorw SET t = 1000 WHERE pk = 1") == Seq(Seq(1L)))
    assert(warnRows() == Seq((1264, "Warning")))
    assert(rows("SELECT t FROM oorw WHERE pk = 1") == Seq(Seq(127)))
    engine.query("SET sql_mode = 'STRICT_TRANS_TABLES'")
    // in-range values stay silent
    engine.query("INSERT IGNORE INTO oorw VALUES (6, 99, 9, 9)")
    assert(warnRows() == Seq.empty)
    // strict plain INSERT errors 1264 instead of wrapping (insert.go
    // non-IGNORE ErrValueOutOfRange path)
    assert(intercept[IllegalArgumentException] {
      engine.query("INSERT INTO oorw VALUES (7, 300, 1, 1)")
    }.getMessage.contains("1264"))
    assert(rows("SELECT count(*) c FROM oorw WHERE pk = 7") == Seq(Seq(0L)))
    // strict UPDATE errors 1264 too, leaving the row untouched
    assert(intercept[IllegalArgumentException] {
      engine.query("UPDATE oorw SET t = 999 WHERE pk = 2")
    }.getMessage.contains("1264"))
    assert(rows("SELECT t FROM oorw WHERE pk = 2") == Seq(Seq(127)))
    // in-range strict UPDATE still flows
    engine.query("UPDATE oorw SET t = 99 WHERE pk = 2")
    assert(rows("SELECT t FROM oorw WHERE pk = 2") == Seq(Seq(99)))
    engine.query("drop table oorw")
  }

  test("strict UPDATE 1264 probe applies assignments left to right, " +
      "like the write itself (rowexec/update.go sequential SET)") {
    engine.runScript(
      """create table seq1264 (pk int primary key, a smallint, b tinyint);
        |insert into seq1264 values (1, 1000, 1);
        |""".stripMargin)
    // b = a must see the NEW a (=1), not the stale 1000 — a stale probe
    // would raise a spurious 1264 here
    engine.query("UPDATE seq1264 SET a = 1, b = a WHERE pk = 1")
    assert(rows("SELECT a, b FROM seq1264") == Seq(Seq(1, 1)))
    // and the converse: the new a (=1000) overflows tinyint b even
    // though the pre-update a (=1) would not — a stale probe would miss
    assert(intercept[IllegalArgumentException] {
      engine.query("UPDATE seq1264 SET a = 1000, b = a WHERE pk = 1")
    }.getMessage.contains("1264"))
    assert(rows("SELECT a, b FROM seq1264") == Seq(Seq(1, 1)))
    engine.query("drop table seq1264")
  }

  test("malformed datetime casts truncate at the junk boundary with " +
      "1292; bare CAST AS DATETIME is datetime(0) (queries.go:4206-4245, " +
      "dolt issue 9917)") {
    def one(sql: String): String =
      engine.query(sql).collect()(0).get(0).toString
    assert(one("select cast('2020-01-01 a' as datetime)")
      .startsWith("2020-01-01T00:00"))
    assert(warnRows() == Seq((1292, "Warning")))
    assert(one("select cast('2020-01-01 abc123' as datetime)")
      .startsWith("2020-01-01T00:00"))
    assert(one("select cast('2020-01-01 12:30asdf123' as datetime)")
      .startsWith("2020-01-01T12:30"))
    assert(one("select cast('2020-01-01 12:34:56abc' as datetime)")
      == "2020-01-01T12:34:56")
    assert(one("select cast('2020-01-01 12:34:56 abc' as datetime)")
      == "2020-01-01T12:34:56")
    // the fraction truncates: bare CAST AS DATETIME is datetime(0)
    assert(one("select cast('2020-01-01 12:34:56.1 abc' as datetime)")
      == "2020-01-01T12:34:56")
    assert(warnRows() == Seq((1292, "Warning")))
    engine.query("SELECT 1")
  }

  test("STR_TO_DATE parse failure evaluates NULL and warns 1411 " +
      "(str_to_date.go:128 ctx.Warn)") {
    val r = rows("SELECT STR_TO_DATE('invalid', '%d-%m-%Y') AS v")
    assert(r == Seq(Seq(null)))
    assert(warnRows() == Seq((1411, "Warning")))
    // two failing calls, two warnings
    rows("SELECT STR_TO_DATE('x', '%d,%m,%Y') AS a, " +
      "STR_TO_DATE('y', '%d,%m,%Y') AS b")
    assert(warnRows() == Seq((1411, "Warning"), (1411, "Warning")))
    // a successful parse stays silent
    assert(rows("SELECT STR_TO_DATE('01,5,2013','%d,%m,%Y') AS v") ==
      Seq(Seq(java.time.LocalDate.parse("2013-05-01"))))
    assert(warnRows() == Seq.empty)
    engine.query("SELECT 1")
  }

  test("sql_mode round-trip: recognized modes read back via @@sql_mode, " +
      "unknown tokens error 1231, STRICT toggles the write path " +
      "(sql_mode.go:28-53; script_queries.go strict-vs-non-strict)") {
    engine.query("create table smw (pk int primary key, v int)")
    // default is strict: a failed conversion errors... (value becomes
    // NULL under Spark's non-ANSI cast, surfaced as vocab-free insert
    // of NULL — strict write validation is the 1062/1406 family; the
    // conversion itself is exercised below via the toggle)
    engine.query("SET sql_mode = 'NO_ZERO_DATE,STRICT_TRANS_TABLES'")
    assert(rows("SELECT @@sql_mode") ==
      Seq(Seq("NO_ZERO_DATE,STRICT_TRANS_TABLES")))
    // unknown mode is MySQL error 1231
    assert(intercept[IllegalArgumentException] {
      engine.query("SET sql_mode = 'TOTALLY_BOGUS_MODE'")
    }.getMessage.contains("1231"))
    // ...and the session keeps its previous modes
    assert(rows("SELECT @@sql_mode") ==
      Seq(Seq("NO_ZERO_DATE,STRICT_TRANS_TABLES")))
    // non-strict: bad conversions coerce to the zero value with a 1366
    // warning instead of erroring; over-length strings truncate
    engine.query("SET sql_mode = ''")
    assert(rows("INSERT INTO smw VALUES (1, 'dasd')") == Seq(Seq(1L)))
    assert(warnRows() == Seq((1366, "Warning")))
    assert(rows("SELECT * FROM smw") == Seq(Seq(1, 0)))
    engine.query("UPDATE smw SET v = 'nope' where pk = 1")
    assert(warnRows() == Seq((1366, "Warning")))
    assert(rows("SELECT * FROM smw") == Seq(Seq(1, 0)))
    // constraint violations still error in non-strict mode
    assert(intercept[IllegalArgumentException] {
      engine.query("INSERT INTO smw VALUES (1, 2)")
    }.getMessage.contains("1062"))
    // TRADITIONAL restores strict writes
    engine.query("SET sql_mode = 'TRADITIONAL'")
    engine.query("create table smc (pk int primary key, v varchar(2))")
    assert(intercept[IllegalArgumentException] {
      engine.query("INSERT INTO smc VALUES (1, 'toolong')")
    }.getMessage.contains("too large"))
    engine.query(
      "SET sql_mode = 'NO_ENGINE_SUBSTITUTION,ONLY_FULL_GROUP_BY," +
      "STRICT_TRANS_TABLES'")
    engine.runScript("drop table smw; drop table smc;")
  }

  test("lenient literal CAST: truncated datetime/number parses the " +
      "prefix and warns 1292 (queries.go:4207+ cast block; " +
      "sql/errors.go ErrTruncatedIncorrect)") {
    def one(sql: String): Any = {
      val r = engine.query(sql).collect()(0)
      if (r.isNullAt(0)) null else r.get(0)
    }
    def ntz(s: String) = java.time.LocalDateTime.parse(s)
    assert(one("select cast('2020-01-01 a' as datetime)") ==
      ntz("2020-01-01T00:00:00"))
    assert(warnRows() == Seq((1292, "Warning")))
    assert(engine.query("SHOW WARNINGS").collect()(0).getString(2)
      .contains("Truncated incorrect datetime value: '2020-01-01 a'"))
    assert(one("select cast('2020-01-01 abc123' as datetime)") ==
      ntz("2020-01-01T00:00:00"))
    assert(one("select cast('2020-01-01 12:30asdf123' as datetime)") ==
      ntz("2020-01-01T12:30:00"))
    assert(one("select cast('2020-01-01 12:34:56abc' as datetime)") ==
      ntz("2020-01-01T12:34:56"))
    assert(one("select cast('2020-01-01 12:34:56 abc' as datetime)") ==
      ntz("2020-01-01T12:34:56"))
    assert(one("select cast('2020-01-01 12:34:56:123456 abc' as datetime)") ==
      ntz("2020-01-01T12:34:56"))
    assert(one("select cast('2020-01-01 12:34:56...123456 abc' as datetime)") ==
      ntz("2020-01-01T12:34:56"))
    assert(one("select cast('2020-01-01 12:34:56-123456 abc' as datetime)") ==
      ntz("2020-01-01T12:34:56"))
    assert(one("select cast('2020-01-01 12:34:56.123456abc' as datetime(0))") ==
      ntz("2020-01-01T12:34:56"))
    assert(one("select cast('2020-01-01 12:34:56.123456abc' as datetime(1))") ==
      ntz("2020-01-01T12:34:56.1"))
    assert(one("select cast('2020-01-01 12:34:56.123456abc' as datetime(2))") ==
      ntz("2020-01-01T12:34:56.12"))
    assert(warnRows() == Seq((1292, "Warning")))
    // numeric prefix casts
    assert(one("select cast('123abc' as double)") == 123.0)
    assert(warnRows() == Seq((1292, "Warning")))
    assert(one("select cast('1.5abc' as double)") == 1.5)
    assert(one("select cast('abc' as signed)") == 0L)
    // a CLEAN literal cast warns nothing
    assert(one("select cast('2020-01-01 12:34:56' as datetime)") ==
      ntz("2020-01-01T12:34:56"))
    assert(warnRows() == Seq.empty)
    assert(one("select cast('42' as signed)") == 42L)
    assert(warnRows() == Seq.empty)
  }

  test("INSERT IGNORE with a >1-row scalar subquery inserts nothing " +
      "and warns 1242 (insert_queries.go ERSubqueryNo1Row block; " +
      "statement-level warning, not per-row)") {
    engine.runScript(
      """CREATE TABLE sqw (pk int primary key, c1 int NOT NULL);
        |INSERT INTO sqw VALUES (1, 1), (2, 2), (3, 3);
        |""".stripMargin)
    // plain INSERT: error
    intercept[Exception] {
      engine.query(
        "INSERT INTO sqw SELECT 10, 0 WHERE 1=(SELECT 1 UNION SELECT 2)")
    }
    // IGNORE: 0 rows + 1242 warning
    assert(rows(
      "INSERT IGNORE INTO sqw SELECT 10, 0 WHERE 1=(SELECT 1 UNION SELECT 2)")
      == Seq(Seq(0L)))
    assert(warnRows() == Seq((1242, "Warning")))
    assert(rows("SELECT count(*) n FROM sqw") == Seq(Seq(3L)))
    engine.query("drop table sqw")
  }

  test("TRUNCATE() string-arg warnings: non-numeric input warns once " +
      "as double, string precision warns twice as int " +
      "(function_queries.go:165-235)") {
    def one(sql: String): Any = engine.query(sql).collect()(0).get(0)
    assert(one("SELECT TRUNCATE('123abc',1)") == 123.0)
    assert(warnRows() == Seq((1292, "Warning")))
    assert(engine.query("SHOW WARNINGS").collect()(0).getString(2)
      .contains("Truncated incorrect double value: '123abc'"))
    assert(one("SELECT TRUNCATE('1.5abc',1)") == 1.5)
    assert(warnRows() == Seq((1292, "Warning")))
    assert(one("SELECT TRUNCATE('999xyz',2)") == 999.0)
    assert(warnRows() == Seq((1292, "Warning")))
    assert(one("SELECT TRUNCATE(1.223,'1.5abc')").toString == "1.2")
    assert(warningCount() == 2)
    assert(engine.query("SHOW WARNINGS").collect()(0).getString(2)
      .contains("Truncated incorrect int value: '1.5abc'"))
    assert(one("SELECT TRUNCATE(1.223,'0.5')").toString == "1")
    assert(warningCount() == 2)
    assert(one("SELECT TRUNCATE(1.223,'2.7')").toString == "1.22")
    assert(warningCount() == 2)
    // clean numeric literals warn nothing
    assert(one("SELECT TRUNCATE(1.223, 1)").toString == "1.2")
    assert(warningCount() == 0)
  }

  test("zero-date literals in date arithmetic evaluate NULL with a 1292 " +
      "warning (function_queries.go:1788+ timestampadd/date_add/" +
      "datediff/dayname blocks)") {
    def isNull(sql: String): Boolean = engine.query(sql).collect()(0).isNullAt(0)
    assert(isNull("select timestampadd(day, 1, '0000-00-00')"))
    assert(warnRows() == Seq((1292, "Warning")))
    assert(isNull("select timestampadd(day, 1, 0)"))
    assert(warnRows() == Seq((1292, "Warning")))
    assert(isNull("select date_add(0, interval 1 day)"))
    assert(warnRows() == Seq((1292, "Warning")))
    assert(isNull("select date_sub(0, interval 1 day)"))
    assert(isNull("select datediff(0, '2020-10-10')"))
    assert(isNull("select datediff('2020-10-10', 0)"))
    assert(isNull("select datediff('0000-00-00', '2020-10-10')"))
    assert(isNull("select dayname(0)"))
    assert(isNull("select dayname(false)"))
    assert(warnRows() == Seq((1292, "Warning")))
    // bare 0 +/- INTERVAL arithmetic (function_queries.go:1868)
    assert(isNull("select 0 + interval 1 day"))
    assert(warnRows() == Seq((1292, "Warning")))
    assert(isNull("select 0 - interval 1 day"))
    assert(warnRows() == Seq((1292, "Warning")))
    // day/dayofmonth of the zero date is the day NUMBER 0, no warning;
    // a non-date boolean nulls + warns (function_queries.go:2010-2081)
    assert(engine.query("select day(false)").collect()(0).getInt(0) == 0)
    assert(warnRows() == Seq.empty)
    assert(engine.query("select day('0000-00-00')").collect()(0).getInt(0) == 0)
    assert(isNull("select day(true)"))
    assert(warnRows() == Seq((1292, "Warning")))
    assert(isNull("select dayofmonth(true)"))
    assert(engine.query("select dayofmonth(false)").collect()(0).getInt(0) == 0)
    assert(isNull("select dayname('0000-00-00')"))
    assert(warnRows() == Seq((1292, "Warning")))
    // clean args stay untouched and warn nothing
    assert(engine.query("SELECT DATE_ADD('2018-05-02', INTERVAL 1 day)")
      .collect()(0).get(0).toString.startsWith("2018-05-03"))
    assert(warnRows() == Seq.empty)
  }

  test("client-probe SHOW surface: TRIGGERS/EVENTS/ROUTINE STATUS/OPEN " +
      "TABLES/BINARY LOGS/PLUGINS answer with MySQL column shapes " +
      "(honest empties for §2.12 descopes); SHOW ENGINES lists the " +
      "default engine (planbuilder/show.go:942)") {
    def cols(sql: String): Seq[String] =
      engine.query(sql).columns.toSeq
    assert(cols("SHOW TRIGGERS").take(4) ==
      Seq("Trigger", "Event", "Table", "Statement"))
    assert(engine.query("SHOW TRIGGERS LIKE 'x%'").count() == 0)
    assert(cols("SHOW EVENTS").take(2) == Seq("Db", "Name"))
    assert(engine.query("SHOW PROCEDURE STATUS").count() == 0)
    assert(engine.query("SHOW FUNCTION STATUS LIKE 'f%'").count() == 0)
    assert(engine.query("SHOW OPEN TABLES").count() == 0)
    assert(engine.query("SHOW BINARY LOGS").count() == 0)
    assert(engine.query("SHOW PLUGINS").count() == 0)
    val eng = engine.query("SHOW ENGINES").collect()
    assert(eng.length == 1 && eng(0).getString(0) == "InnoDB" &&
      eng(0).getString(1) == "DEFAULT")
  }

  test("LOAD DATA column-count mismatch warns 1261 per short row " +
      "(load_data.go; r6 ADVICE fixture shape)") {
    val dir = java.nio.file.Files.createTempDirectory("graft_ld").toFile
    val f = new java.io.File(dir, "rows.csv")
    val w = new java.io.PrintWriter(f)
    w.println("1"); w.println("2"); w.close()
    engine.query("CREATE TABLE ldw (a int, b int)")
    engine.query(s"LOAD DATA INFILE '${f.getAbsolutePath}' INTO TABLE ldw " +
      "FIELDS TERMINATED BY ','")
    assert(warnRows() == Seq((1261, "Warning"), (1261, "Warning")))
    assert(warnRows().size == 2)
    assert(rows("SELECT * FROM ldw ORDER BY a") ==
      Seq(Seq(1, null), Seq(2, null)))
    engine.query("drop table ldw")
  }
}
