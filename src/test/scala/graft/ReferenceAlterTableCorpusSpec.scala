package graft

import org.scalatest.funsuite.AnyFunSuite

/** Second ALTER TABLE wave from the reference's enginetest/queries/
  * alter_table_queries.go (2,678 LoC; first wave lives in
  * ReferenceDdlCorpusSpec): table renames that MOVE the declared
  * metadata, the standalone RENAME TABLE statement (multi-rename, swap
  * chains, error cases), ALTER COMMENT, DISABLE/ENABLE KEYS, remove
  * AUTO_INCREMENT by MODIFY, MODIFY keeping UNIQUE/KEY declarations,
  * inline ADD COLUMN constraints, and case-insensitive duplicate adds.
  */
class ReferenceAlterTableCorpusSpec extends AnyFunSuite {
  import SparkSpec.spark

  private lazy val engine = new Engine(spark)

  private def rows(sql: String): Seq[Seq[Any]] =
    engine.query(sql).collect()
      .map(r => (0 until r.length).map(r.get).toSeq).toSeq

  test("simple rename table via RENAME TABLE; data and declared " +
      "metadata (PK, CHECK, defaults, comment) follow the new name") {
    engine.runScript(
      """drop table if exists rt1; drop table if exists rt2;
        |CREATE TABLE rt1 (pk int primary key, v int default 7
        |  CHECK (v < 100)) COMMENT='kept';
        |INSERT INTO rt1 VALUES (1, 10);
        |RENAME TABLE rt1 TO rt2;
        |""".stripMargin)
    assert(rows("select * from rt2") == Seq(Seq(1, 10)))
    assert(intercept[Exception] {
      engine.query("select * from rt1").collect()
    }.getMessage.toLowerCase.contains("rt1"))
    // PK still enforces under the new name
    assert(intercept[IllegalArgumentException] {
      engine.query("INSERT INTO rt2 VALUES (1, 20)")
    }.getMessage.contains("1062"))
    // CHECK still enforces
    assert(intercept[IllegalArgumentException] {
      engine.query("INSERT INTO rt2 VALUES (2, 500)")
    }.getMessage.toLowerCase.contains("check"))
    // declared default still applies, comment rendered
    engine.query("INSERT INTO rt2 (pk) VALUES (3)")
    assert(rows("select v from rt2 where pk = 3") == Seq(Seq(7)))
    assert(engine.showCreateTable("rt2").endsWith("COMMENT='kept'"))
    engine.query("drop table rt2")
  }

  test("RENAME TABLE processes pairs left to right: multi-rename and " +
      "swap chains work; errors for missing source / existing target") {
    engine.runScript(
      """drop table if exists ra; drop table if exists rb;
        |drop table if exists rc; drop table if exists rd;
        |CREATE TABLE ra (x int); INSERT INTO ra VALUES (1);
        |CREATE TABLE rb (x int); INSERT INTO rb VALUES (2);
        |""".stripMargin)
    // swap through a temp name, all in ONE statement
    engine.query("RENAME TABLE ra TO rtmp, rb TO ra, rtmp TO rb")
    assert(rows("select x from ra") == Seq(Seq(2)))
    assert(rows("select x from rb") == Seq(Seq(1)))
    // multi-rename in one statement
    engine.query("RENAME TABLE ra TO rc, rb TO rd")
    assert(rows("select x from rc") == Seq(Seq(2)))
    assert(rows("select x from rd") == Seq(Seq(1)))
    // missing source errors
    assert(intercept[IllegalArgumentException] {
      engine.query("RENAME TABLE nope TO whatever")
    }.getMessage.contains("doesn't exist"))
    // existing target errors
    assert(intercept[IllegalArgumentException] {
      engine.query("RENAME TABLE rc TO rd")
    }.getMessage.contains("1050"))
    engine.runScript("drop table rc; drop table rd;")
  }

  test("ALTER TABLE ... RENAME TO moves metadata the same way") {
    engine.runScript(
      """drop table if exists art1; drop table if exists art2;
        |CREATE TABLE art1 (pk int primary key auto_increment, v int);
        |INSERT INTO art1 (v) VALUES (5), (6);
        |ALTER TABLE art1 RENAME TO art2;
        |""".stripMargin)
    // auto-increment counter carried: next insert continues from 3
    engine.query("INSERT INTO art2 (v) VALUES (7)")
    assert(rows("select pk, v from art2 order by pk") ==
      Seq(Seq(1, 5), Seq(2, 6), Seq(3, 7)))
    engine.query("drop table art2")
  }

  test("ALTER TABLE COMMENT replaces the table comment; quotes escape " +
      "('alter table comment' / 'comments are escaped')") {
    engine.runScript(
      """drop table if exists atc;
        |CREATE TABLE atc (i int) COMMENT='original';
        |""".stripMargin)
    assert(engine.showCreateTable("atc").endsWith("COMMENT='original'"))
    engine.query("ALTER TABLE atc COMMENT = 'replaced'")
    assert(engine.showCreateTable("atc").endsWith("COMMENT='replaced'"))
    engine.query("""ALTER TABLE atc COMMENT = "it's"""")
    assert(engine.showCreateTable("atc").endsWith("COMMENT='it''s'"))
    engine.query("drop table atc")
  }

  test("DISABLE KEYS / ENABLE KEYS parse and no-op; declared keys keep " +
      "enforcing ('disable keys / enable keys')") {
    engine.runScript(
      """drop table if exists dk;
        |CREATE TABLE dk (pk int primary key);
        |INSERT INTO dk VALUES (1);
        |ALTER TABLE dk DISABLE KEYS;
        |""".stripMargin)
    // the reference keeps enforcing too (its memory backend has no
    // deferred index build)
    assert(intercept[IllegalArgumentException] {
      engine.query("INSERT INTO dk VALUES (1)")
    }.getMessage.contains("1062"))
    engine.query("ALTER TABLE dk ENABLE KEYS")
    engine.query("INSERT INTO dk VALUES (2)")
    assert(rows("select count(*) from dk") == Seq(Seq(2L)))
    engine.query("drop table dk")
  }

  test("ALTER TABLE remove AUTO_INCREMENT: MODIFY without the attribute " +
      "drops generation; explicit values still insert") {
    engine.runScript(
      """drop table if exists rmai;
        |CREATE TABLE rmai (pk int primary key auto_increment, v int);
        |INSERT INTO rmai (v) VALUES (10), (20);
        |ALTER TABLE rmai MODIFY COLUMN pk int;
        |""".stripMargin)
    // generation is gone: NULL pk is now a NOT NULL / key violation,
    // not a generated value
    assert(rows("select pk from rmai order by pk") == Seq(Seq(1), Seq(2)))
    engine.query("INSERT INTO rmai VALUES (10, 30)")
    assert(rows("select pk from rmai order by pk") ==
      Seq(Seq(1), Seq(2), Seq(10)))
    assert(engine.showCreateTable("rmai").contains("`pk` int NOT NULL,"))
    assert(!engine.showCreateTable("rmai").contains("AUTO_INCREMENT"))
    engine.query("drop table rmai")
  }

  test("ADD COLUMN pk PRIMARY KEY AUTO_INCREMENT backfills 1..n and " +
      "renders the counter; plain pk on non-empty data errors " +
      "('Add primary key column with auto increment' blocks)") {
    engine.runScript(
      """drop table if exists apk;
        |CREATE TABLE apk (i int, j int);
        |insert into apk values (1,1), (2,2), (3,3);
        |""".stripMargin)
    assert(intercept[IllegalArgumentException] {
      engine.query("alter table apk add column pk int primary key")
    }.getMessage.contains("1062"))
    engine.query(
      "alter table apk add column pk int primary key auto_increment first")
    val d = engine.showCreateTable("apk")
    assert(d.contains("`pk` int NOT NULL AUTO_INCREMENT,"))
    assert(d.contains("PRIMARY KEY (`pk`)"))
    assert(d.contains("ENGINE=InnoDB AUTO_INCREMENT=4 DEFAULT CHARSET"))
    // FIRST positions the new column leftmost; backfill is 1..n
    assert(engine.query("select * from apk order by pk").columns.head == "pk")
    assert(rows("select pk from apk order by pk") ==
      Seq(Seq(1), Seq(2), Seq(3)))
    engine.query("insert into apk (i, j) values (4, 4)")
    assert(rows("select pk from apk order by pk") ==
      Seq(Seq(1), Seq(2), Seq(3), Seq(4)))
    // non-primary auto-inc needs a key: UNIQUE works, bare errors
    engine.runScript(
      """drop table if exists apk2;
        |CREATE TABLE apk2 (i bigint primary key, s varchar(20));
        |INSERT INTO apk2 VALUES (1, 'a'), (2, 'b'), (3, 'c');
        |alter table apk2 add column j int auto_increment unique;
        |""".stripMargin)
    assert(rows("select i, j from apk2 order by i") ==
      Seq(Seq(1L, 1), Seq(2L, 2), Seq(3L, 3)))
    assert(engine.showCreateTable("apk2")
      .contains("`j` int NOT NULL AUTO_INCREMENT,"))
    assert(intercept[IllegalArgumentException] {
      engine.query("alter table apk2 add column k int auto_increment")
    }.getMessage.toLowerCase.contains("auto_increment"))
    engine.runScript("drop table apk; drop table apk2;")
  }

  test("multi-action ALTER resolves every action against the START " +
      "schema; error surface ('Error queries' / 'multi-alter ddl " +
      "column errors' / RenameColumnScripts error cases)") {
    engine.runScript(
      """drop table if exists erri; drop table if exists errij;
        |create table erri (i int primary key);
        |create table errij (i int primary key, j int);
        |""".stripMargin)
    // a column added in THIS statement is not visible to later actions
    assert(intercept[Exception] {
      engine.query("alter table erri add column j int, drop column j")
    }.getMessage.nonEmpty)
    assert(intercept[Exception] {
      engine.query("alter table erri add column j int, rename column j to k")
    }.getMessage.nonEmpty)
    assert(intercept[Exception] {
      engine.query(
        "alter table erri add column j int, modify column j varchar(10)")
    }.getMessage.nonEmpty)
    // a column dropped in THIS statement can't be renamed after
    assert(intercept[Exception] {
      engine.query("alter table errij drop column j, rename column j to k")
    }.getMessage.nonEmpty)
    assert(intercept[Exception] {
      engine.query("alter table errij drop column k, rename column j to k")
    }.getMessage.nonEmpty)
    // the statement failed whole: schemas unchanged
    assert(engine.query("select * from erri").columns.toSeq == Seq("i"))
    assert(engine.query("select * from errij").columns.toSeq ==
      Seq("i", "j"))
    // table / column resolution errors
    assert(intercept[Exception] {
      engine.query("ALTER TABLE err_not_exist ADD COLUMN i2 INT")
    }.getMessage.nonEmpty)
    assert(intercept[Exception] {
      engine.query(
        "ALTER TABLE errij ADD COLUMN b BIGINT AFTER err_no_such_col")
    }.getMessage.nonEmpty)
    // adding an existing (case-insensitive) column is 1060
    assert(intercept[IllegalArgumentException] {
      engine.query("ALTER TABLE errij ADD COLUMN I BIGINT")
    }.getMessage.contains("1060"))
    // duplicate adds inside one statement collide too
    assert(intercept[IllegalArgumentException] {
      engine.query("ALTER TABLE erri ADD COLUMN c int, add c int")
    }.getMessage.contains("1060"))
    // incompatible literal default for a numeric column is 1067
    assert(intercept[IllegalArgumentException] {
      engine.query(
        "ALTER TABLE erri ADD COLUMN b INT NOT NULL DEFAULT 'yes'")
    }.getMessage.contains("1067"))
    engine.runScript("drop table erri; drop table errij;")
  }

  test("add column with inline UNIQUE / CHECK; duplicate add is " +
      "case-insensitive 1060") {
    engine.runScript(
      """drop table if exists aci;
        |CREATE TABLE aci (pk int primary key);
        |INSERT INTO aci VALUES (1), (2);
        |ALTER TABLE aci ADD COLUMN u int UNIQUE;
        |""".stripMargin)
    engine.runScript(
      "UPDATE aci SET u = 10 WHERE pk = 1; UPDATE aci SET u = 20 WHERE pk = 2;")
    assert(intercept[IllegalArgumentException] {
      engine.query("UPDATE aci SET u = 10 WHERE pk = 2")
    }.getMessage.contains("1062"))
    engine.query("ALTER TABLE aci ADD COLUMN c int CHECK (c > 0)")
    assert(intercept[IllegalArgumentException] {
      engine.query("UPDATE aci SET c = -5 WHERE pk = 1")
    }.getMessage.toLowerCase.contains("check"))
    engine.query("drop table aci")
  }
}
