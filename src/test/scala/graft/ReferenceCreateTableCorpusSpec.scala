package graft

import org.scalatest.funsuite.AnyFunSuite

/** CREATE TABLE corner shapes ported from the reference's
  * enginetest/queries/create_table_queries.go (1,391 LoC): table/column
  * COMMENTs, charset/collation options and their validation, display
  * widths, datetime/timestamp precision, identifier-length and
  * duplicate-column errors, CREATE ... LIKE constraint copying,
  * mixed defs+SELECT CTAS, and auto-increment key requirements.
  *
  * Divergences documented inline; the SHOW CREATE TABLE tail
  * (ENGINE=InnoDB DEFAULT CHARSET/COLLATE) matches the reference's
  * rendering from sql/rowexec/show.go.
  */
class ReferenceCreateTableCorpusSpec extends AnyFunSuite {
  import SparkSpec.spark

  private lazy val engine = new Engine(spark)

  private def rows(sql: String): Seq[Seq[Any]] =
    engine.query(sql).collect()
      .map(r => (0 until r.length).map(r.get).toSeq).toSeq

  private def ddl(table: String): String = engine.showCreateTable(table)

  // ---- table comments (create_table_queries.go:25-90) -----------------

  test("table COMMENT renders in SHOW CREATE TABLE, with '' escaping " +
      "(create_table_queries.go tableWithComment rows)") {
    engine.query(
      "create table twc1 (pk int) COMMENT 'Table Comments Work!'")
    assert(ddl("twc1") ==
      "CREATE TABLE `twc1` (\n  `pk` int\n) ENGINE=InnoDB " +
      "DEFAULT CHARSET=utf8mb4 COLLATE=utf8mb4_0900_bin " +
      "COMMENT='Table Comments Work!'")
    // COMMENT= form, value containing '='
    engine.query(
      "create table twc2 (pk int) COMMENT='Table Comments=Still Work'")
    assert(ddl("twc2").endsWith("COMMENT='Table Comments=Still Work'"))
    // double-quoted comment with punctuation
    engine.query("""create table twc3 (pk int) COMMENT "~!@ #$ %^ &* ()"""")
    assert(ddl("twc3").endsWith("COMMENT='~!@ #$ %^ &* ()'"))
    // a single quote inside doubles on render
    engine.query("""create table twc4 (pk int) COMMENT "'"""")
    assert(ddl("twc4").endsWith("COMMENT=''''"))
    engine.runScript(
      "drop table twc1; drop table twc2; drop table twc3; drop table twc4;")
  }

  test("COMMENT survives alongside a multi-column PRIMARY KEY and KEY " +
      "(dolt issue 11163 rows)") {
    engine.query("create table twc5 (id int not null, r varchar(8) " +
      "not null, primary key (r, id)) COMMENT='c'")
    assert(ddl("twc5") ==
      "CREATE TABLE `twc5` (\n  `id` int NOT NULL,\n" +
      "  `r` varchar(8) NOT NULL,\n  PRIMARY KEY (`r`,`id`)\n" +
      ") ENGINE=InnoDB DEFAULT CHARSET=utf8mb4 COLLATE=utf8mb4_0900_bin " +
      "COMMENT='c'")
    engine.query("create table twc6 (id int not null, v int, " +
      "primary key (id), key k (v)) COMMENT='c'")
    assert(ddl("twc6").contains("  KEY `k` (`v`)\n"))
    assert(ddl("twc6").endsWith("COMMENT='c'"))
    // explicit charset + non-default collation render back
    engine.query("create table twc7 (id int not null, primary key (id)) " +
      "DEFAULT CHARSET=utf8mb4 COLLATE=utf8mb4_bin COMMENT='c'")
    assert(ddl("twc7").endsWith(
      "ENGINE=InnoDB DEFAULT CHARSET=utf8mb4 COLLATE=utf8mb4_bin " +
      "COMMENT='c'"))
    engine.runScript("drop table twc5; drop table twc6; drop table twc7;")
  }

  test("column COMMENT renders with quote escaping " +
      "(tableWithColumnComment rows)") {
    engine.query("""create table cwc1 (pk int COMMENT "'")""")
    assert(ddl("cwc1").contains("`pk` int COMMENT ''''"))
    engine.query("""create table cwc2 (pk int COMMENT 'plain words')""")
    assert(ddl("cwc2").contains("`pk` int COMMENT 'plain words'"))
    engine.runScript("drop table cwc1; drop table cwc2;")
  }

  // ---- type rendering (create_table_queries.go:105-120) ----------------

  test("float display args drop; the full scalar-type table renders " +
      "(floattypedefs + t1 rows)") {
    engine.query(
      "create table ftd (a float(10), b float(10, 2), c double(10, 2))")
    assert(ddl("ftd") ==
      "CREATE TABLE `ftd` (\n  `a` float,\n  `b` float,\n  `c` double\n" +
      ") ENGINE=InnoDB DEFAULT CHARSET=utf8mb4 COLLATE=utf8mb4_0900_bin")
    engine.query("CREATE TABLE allt (a INTEGER, b TEXT, c DATE, " +
      "d TIMESTAMP, e VARCHAR(20), f BLOB NOT NULL, b1 BOOL, " +
      "b2 BOOLEAN NOT NULL, g DATETIME, h CHAR(40))")
    val d = ddl("allt")
    assert(d.contains("`a` int,"))
    assert(d.contains("`b` text,"))
    assert(d.contains("`c` date,"))
    assert(d.contains("`d` timestamp,"))
    assert(d.contains("`e` varchar(20),"))
    assert(d.contains("`f` blob NOT NULL,"))
    assert(d.contains("`b1` tinyint(1),"))
    assert(d.contains("`b2` tinyint(1) NOT NULL,"))
    assert(d.contains("`g` datetime,"))
    assert(d.contains("`h` char(40)"))
    engine.runScript("drop table ftd; drop table allt;")
  }

  // ---- display width (create_table_queries.go:514-542) -----------------

  test("display width for numeric types: only tinyint(1) is preserved, " +
      "negative width is a syntax error (dolt issue 6682)") {
    engine.query("CREATE TABLE ndw (pk int primary key, b boolean, " +
      "ti tinyint, ti1 tinyint(1), ti2 tinyint(2), i1 int(1))")
    val d = ddl("ndw")
    assert(d.contains("`pk` int NOT NULL,"))
    assert(d.contains("`b` tinyint(1),"))
    assert(d.contains("`ti` tinyint,"))
    assert(d.contains("`ti1` tinyint(1),"))
    assert(d.contains("`ti2` tinyint,"))
    assert(d.contains("`i1` int,"))
    assert(intercept[IllegalArgumentException] {
      engine.query("CREATE TABLE ndwErr (pk int primary key, ti tinyint(-1))")
    }.getMessage.toLowerCase.contains("syntax"))
    engine.query("drop table ndw")
  }

  // ---- CREATE LIKE preserves checks (create_table_queries.go:544-559) --

  test("CREATE TABLE ... LIKE preserves CHECK constraints") {
    engine.runScript(
      """CREATE TABLE clk1 (pk int primary key, test_score int,
        |  height int CHECK (height < 10),
        |  CONSTRAINT mycheck CHECK (test_score >= 50));
        |CREATE TABLE clk2 LIKE clk1;
        |""".stripMargin)
    assert(intercept[IllegalArgumentException] {
      engine.query("INSERT INTO clk2 VALUES (1, 40, 5)")
    }.getMessage.toLowerCase.contains("check"))
    assert(intercept[IllegalArgumentException] {
      engine.query("INSERT INTO clk2 VALUES (1, 60, 15)")
    }.getMessage.toLowerCase.contains("check"))
    engine.query("INSERT INTO clk2 VALUES (1, 60, 5)")
    assert(rows("select count(*) c from clk2") == Seq(Seq(1L)))
    engine.runScript("drop table clk2; drop table clk1;")
  }

  // ---- datetime / timestamp precision (:561-712) -----------------------

  test("datetime precision: renders, truncates stored fractions, " +
      "rejects >6 and negative; CURRENT_TIMESTAMP default precision " +
      "must match the column's") {
    engine.runScript(
      """CREATE TABLE dtp1 (pk int primary key, d datetime);
        |CREATE TABLE dtp2 (pk int primary key, d datetime(3));
        |CREATE TABLE dtp3 (pk int primary key, d datetime(6));
        |""".stripMargin)
    assert(ddl("dtp1").contains("`d` datetime,"))
    assert(ddl("dtp2").contains("`d` datetime(3),"))
    assert(ddl("dtp3").contains("`d` datetime(6),"))
    engine.query("insert into dtp1 values (1, '2020-01-01 00:00:00.123456')")
    engine.query("insert into dtp2 values (1, '2020-01-01 00:00:00.123456')")
    engine.query("insert into dtp3 values (1, '2020-01-01 00:00:00.123456')")
    def one(t: String): String =
      engine.query(s"select cast(d as char) d from $t").collect()(0)
        .getString(0)
    assert(one("dtp1").startsWith("2020-01-01 00:00:00") &&
      !one("dtp1").contains(".123"))
    assert(one("dtp2").contains("00:00:00.123") &&
      !one("dtp2").contains(".1234"))
    assert(one("dtp3").contains("00:00:00.123456"))
    assert(intercept[IllegalArgumentException] {
      engine.query("create table dtp4 (pk int primary key, d datetime(-1))")
    }.getMessage.toLowerCase.contains("syntax"))
    assert(intercept[IllegalArgumentException] {
      engine.query("create table dtp4 (pk int primary key, d datetime(7))")
    }.getMessage.contains("DATETIME supports precision from 0 to 6"))
    assert(intercept[IllegalArgumentException] {
      engine.query("create table dtp4 (pk int primary key, d TIMESTAMP(7))")
    }.getMessage.contains("TIMESTAMP supports precision from 0 to 6"))
    // CURRENT_TIMESTAMP(p) default must match column precision (1067)
    assert(intercept[IllegalArgumentException] {
      engine.query("CREATE TABLE dtp5 (pk int primary key, " +
        "d datetime(3) default current_timestamp(6))")
    }.getMessage.contains("1067"))
    assert(intercept[IllegalArgumentException] {
      engine.query("CREATE TABLE dtp5 (pk int primary key, " +
        "d datetime(6) default current_timestamp(3))")
    }.getMessage.contains("1067"))
    engine.query("CREATE TABLE dtp5 (pk int primary key, " +
      "d datetime(6) default current_timestamp(6))")
    engine.runScript(
      "drop table dtp1; drop table dtp2; drop table dtp3; drop table dtp5;")
  }

  // ---- identifier lengths (:714-770) -----------------------------------

  test("identifiers cap at 64 characters: table, column, constraint, " +
      "key, FK names") {
    val id64 = "abcdefghijklmnopqrstuvwxyz" * 2 + "abcdefghijkl" // 64
    val id65 = id64 + "m"
    engine.query("create table idparent (a int primary key)")
    engine.query(s"create table $id64 (a int primary key)")
    assert(intercept[IllegalArgumentException] {
      engine.query(s"create table $id65 (a int primary key)")
    }.getMessage.toLowerCase.contains("identifier"))
    engine.query(s"create table idc (`$id64` int primary key)")
    assert(intercept[IllegalArgumentException] {
      engine.query(s"create table idc2 (`$id65` int primary key)")
    }.getMessage.toLowerCase.contains("identifier"))
    engine.query(
      s"create table idk (a int primary key, constraint $id64 check (a > 0))")
    assert(intercept[IllegalArgumentException] {
      engine.query(s"create table idk2 (a int primary key, " +
        s"constraint $id65 check (a > 0))")
    }.getMessage.toLowerCase.contains("identifier"))
    engine.query(
      s"create table idx1 (a int primary key, b int, key $id64 (b))")
    assert(intercept[IllegalArgumentException] {
      engine.query(s"create table idx2 (a int primary key, b int, " +
        s"key $id65 (b))")
    }.getMessage.toLowerCase.contains("identifier"))
    assert(intercept[IllegalArgumentException] {
      engine.query(s"create table idf (a int primary key, constraint " +
        s"$id65 foreign key (a) references idparent(a))")
    }.getMessage.toLowerCase.contains("identifier"))
    engine.runScript(s"drop table $id64; drop table idc; drop table idk; " +
      "drop table idx1; drop table idparent;")
  }

  // ---- case-insensitive duplicate columns (:772-790) -------------------

  test("column names are unique case-insensitively (MySQL 1060)") {
    for (defs <- Seq("abc int, abc int", "ABC int, ABC int",
        "a int, A int", "abc int, def int, Abc int"))
      assert(intercept[IllegalArgumentException] {
        engine.query(s"create table dupc ($defs)")
      }.getMessage.contains("1060"))
  }

  // ---- charset / collation validation (:793-830) -----------------------

  test("charset/collation options validate: binary collation, charset " +
      "on invalid type, charset-collation mismatch") {
    assert(intercept[IllegalArgumentException] {
      engine.query("CREATE TABLE csv1 (pk varbinary(10) primary key " +
        "collate utf8mb4_0900_bin)")
    }.getMessage.toLowerCase.contains("binary"))
    assert(intercept[IllegalArgumentException] {
      engine.query("CREATE TABLE csv1 (pk varbinary(10) primary key " +
        "character set utf8mb4)")
    }.getMessage.toLowerCase.contains("character set"))
    assert(intercept[IllegalArgumentException] {
      engine.query(
        "CREATE TABLE csv1 (pk int primary key character set utf8mb4)")
    }.getMessage.toLowerCase.contains("character set"))
    assert(intercept[IllegalArgumentException] {
      engine.query("create table csv1 (i int, primary key(i)) " +
        "charset=utf8mb4 collate=utf8mb3_esperanto_ci")
    }.getMessage.contains(
      "utf8mb4 is not a valid character set for utf8mb3_esperanto_ci"))
    // matching pair passes
    engine.query("create table csv1 (i int, primary key(i)) " +
      "charset=utf8mb4 collate=utf8mb4_esperanto_ci")
    engine.query("drop table csv1")
  }

  test("table charset options render with the charset's default " +
      "collation (:833-885)") {
    engine.query("create table tcs1 (i int) charset latin1")
    assert(ddl("tcs1").endsWith(
      ") ENGINE=InnoDB DEFAULT CHARSET=latin1 COLLATE=latin1_swedish_ci"))
    engine.query("create table tcs2 (i int) character set latin1")
    assert(ddl("tcs2").endsWith(
      "DEFAULT CHARSET=latin1 COLLATE=latin1_swedish_ci"))
    engine.query("create table tcs3 (i int) charset binary")
    assert(ddl("tcs3").endsWith("DEFAULT CHARSET=binary COLLATE=binary"))
    engine.runScript("drop table tcs1; drop table tcs2; drop table tcs3;")
  }

  // ---- if not exists blocks (:887-963) ---------------------------------

  test("IF NOT EXISTS no-ops keep the ORIGINAL definition, including " +
      "its unnamed KEY (named after its column)") {
    engine.query("create table ine1 (i int, index (i))")
    val expect = "CREATE TABLE `ine1` (\n  `i` int,\n  KEY `i` (`i`)\n" +
      ") ENGINE=InnoDB DEFAULT CHARSET=utf8mb4 COLLATE=utf8mb4_0900_bin"
    assert(ddl("ine1") == expect)
    engine.query("create table if not exists ine1 (i int, index (i))")
    assert(ddl("ine1") == expect)
    engine.query(
      "create table if not exists ine1 (i int, index notthesamename (i))")
    assert(ddl("ine1") == expect)
    engine.query("create table if not exists ine1 (i int, check (i > 10))")
    assert(ddl("ine1") == expect)
    engine.query("drop table ine1")
  }

  // ---- CTAS with constraints (:369-513) --------------------------------

  test("CREATE TABLE (constraints) SELECT merges keys with the select " +
      "result (dolt issue 9316)") {
    engine.runScript(
      """CREATE TABLE ctsrc (a int not null, b varchar(10));
        |INSERT INTO ctsrc VALUES (1, 'one'), (2, 'two'), (3, 'three');
        |""".stripMargin)
    engine.query("CREATE TABLE ctpk (PRIMARY KEY(a)) SELECT * FROM ctsrc")
    assert(rows("SELECT * FROM ctpk ORDER BY a") ==
      Seq(Seq(1, "one"), Seq(2, "two"), Seq(3, "three")))
    assert(engine.showIndex("ctpk")
      .exists(r => r._2 == "PRIMARY" && r._4 == "a"))
    // PK enforces on the result table
    assert(intercept[IllegalArgumentException] {
      engine.query("INSERT INTO ctpk VALUES (1, 'dup')")
    }.getMessage.contains("1062"))
    // KEY(name) variant
    engine.query("CREATE TABLE ctidx (KEY(b)) SELECT * FROM ctsrc")
    assert(rows("SELECT count(*) c FROM ctidx") == Seq(Seq(3L)))
    assert(engine.showIndex("ctidx").exists(r => r._2 == "b"))
    // UNIQUE KEY variant enforces
    engine.query("CREATE TABLE ctuq (UNIQUE KEY(a)) SELECT * FROM ctsrc")
    assert(intercept[IllegalArgumentException] {
      engine.query("INSERT INTO ctuq VALUES (1, 'dup')")
    }.getMessage.contains("1062"))
    engine.runScript(
      "drop table ctpk; drop table ctidx; drop table ctuq; drop table ctsrc;")
  }

  test("CREATE TABLE (column override) SELECT casts the select output " +
      "to the declared type") {
    engine.runScript(
      """CREATE TABLE ovsrc (a bigint, b int);
        |INSERT INTO ovsrc VALUES (100, 200);
        |""".stripMargin)
    engine.query(
      "CREATE TABLE ovr (a TINYINT NOT NULL) SELECT a, b FROM ovsrc")
    assert(ddl("ovr") ==
      "CREATE TABLE `ovr` (\n  `a` tinyint NOT NULL,\n  `b` int\n" +
      ") ENGINE=InnoDB DEFAULT CHARSET=utf8mb4 COLLATE=utf8mb4_0900_bin")
    assert(rows("SELECT * FROM ovr") == Seq(Seq(100.toByte, 200)))
    engine.runScript("drop table ovr; drop table ovsrc;")
  }

  test("CTAS without AS keyword works (create table t select ...)") {
    engine.runScript(
      """create table casrc (i int primary key, j int);
        |insert into casrc values (1, 100), (2, 200);
        |""".stripMargin)
    engine.query("create table cas1 select * from casrc")
    assert(rows("select * from cas1 order by i") ==
      Seq(Seq(1, 100), Seq(2, 200)))
    engine.query("create table cas2 select j from casrc")
    assert(rows("select * from cas2 order by j") == Seq(Seq(100), Seq(200)))
    engine.query("create table cas3 select j as i from casrc")
    assert(rows("select * from cas3 order by i") == Seq(Seq(100), Seq(200)))
    engine.runScript(
      "drop table cas1; drop table cas2; drop table cas3; drop table casrc;")
  }

  // ---- auto-increment blocks (:1244-1369) ------------------------------

  test("non-primary auto_increment column with UNIQUE works and renders " +
      "NOT NULL AUTO_INCREMENT + counter tail") {
    engine.query(
      "create table aiu (a int auto_increment unique, b int, primary key(b))")
    engine.query("insert into aiu (b) values (1), (2)")
    val d = ddl("aiu")
    assert(d.contains("`a` int NOT NULL AUTO_INCREMENT,"))
    assert(d.contains("PRIMARY KEY (`b`)"))
    assert(d.contains("ENGINE=InnoDB AUTO_INCREMENT=3 DEFAULT CHARSET"))
    assert(rows("select a, b from aiu order by b") ==
      Seq(Seq(1, 1), Seq(2, 2)))
    engine.query("drop table aiu")
    // separate unique key clause form
    engine.query("create table aiu2 (a int auto_increment, b int, " +
      "primary key(b), unique key(a))")
    engine.query("insert into aiu2 (b) values (1), (2)")
    assert(rows("select a, b from aiu2 order by b") ==
      Seq(Seq(1, 1), Seq(2, 2)))
    engine.query("drop table aiu2")
    // missing any key on the auto-inc column errors
    assert(intercept[IllegalArgumentException] {
      engine.query(
        "create table aiu3 (a int auto_increment, b int, primary key(b))")
    }.getMessage.toLowerCase.contains("auto_increment"))
  }

  test("AUTO_INCREMENT=n table option seeds the counter (ignored " +
      "without an auto-inc column)") {
    engine.query("create table aio1 (i int) auto_increment=10")
    assert(ddl("aio1") ==
      "CREATE TABLE `aio1` (\n  `i` int\n) ENGINE=InnoDB " +
      "DEFAULT CHARSET=utf8mb4 COLLATE=utf8mb4_0900_bin")
    engine.query(
      "create table aio2 (i int auto_increment primary key) auto_increment=10")
    assert(ddl("aio2").contains("ENGINE=InnoDB AUTO_INCREMENT=10 DEFAULT"))
    engine.query("insert into aio2 values (null), (null), (null)")
    assert(rows("select * from aio2 order by i") ==
      Seq(Seq(10), Seq(11), Seq(12)))
    engine.runScript("drop table aio1; drop table aio2;")
  }

  // ---- defaults render (:965-1060, behavioral subset) ------------------

  test("literal defaults render quoted in SHOW CREATE TABLE " +
      "(DEFAULT '100' form)") {
    engine.query(
      "create table dflt (i int primary key, j int default 100, " +
      "s varchar(5) default 'ab')")
    val d = ddl("dflt")
    assert(d.contains("`j` int DEFAULT '100'"))
    assert(d.contains("`s` varchar(5) DEFAULT 'ab'"))
    engine.query("drop table dflt")
    // DIVERGENCE: the reference also propagates source-column defaults
    // through plain CTAS (create table t1 select * from a keeps
    // j's DEFAULT '100'); this engine's CTAS derives schema from the
    // query result only — defaults don't survive expression provenance.
  }
}
