package graft

import org.scalatest.funsuite.AnyFunSuite

/** Port of the reference's enginetest/queries/blob_queries.go (256 LoC):
  * BLOB/TEXT reads (hex, ordering, binary comparison), the write surface
  * (insert/update/delete/ALTER over blob columns), and BlobErrors — the
  * MySQL 1170 blob/text-key-needs-prefix-length rule and the 1071
  * 3072-byte key cap. Fixtures follow setup_data.sg.go:34 (blobt/textt).
  * BlobUnsupported (CONVERT USING) is unsupported in the reference too.
  */
class ReferenceBlobCorpusSpec extends AnyFunSuite {
  import SparkSpec.spark

  private lazy val engine = new Engine(spark)

  private def fresh(): Unit = engine.runScript(
    """drop table if exists blobt; drop table if exists textt;
      |create table blobt (i bigint primary key, b longblob);
      |create table textt (i bigint primary key, t text);
      |insert into blobt values (1, 'first row'), (2, 'second row'),
      |  (3, 'third row');
      |insert into textt values (1, 'first row'), (2, 'second row'),
      |  (3, 'third row');
      |""".stripMargin)

  private def asStr(v: Any): Any = v match {
    case b: Array[Byte] => new String(b, "UTF-8")
    case o => o
  }

  private def rows(sql: String): Seq[Seq[Any]] =
    engine.query(sql).collect()
      .map(r => (0 until r.length).map(i => asStr(r.get(i))).toSeq).toSeq

  private def err(sql: String): String =
    intercept[Exception] { engine.query(sql).collect() }
      .getMessage.toLowerCase

  test("BlobQueries: hex, point lookup, blob ordering and comparison " +
      "(blob_queries.go:22-80)") {
    fresh()
    assert(rows("select i, hex(b) from blobt order by i") ==
      Seq(Seq(1L, "666972737420726F77"), Seq(2L, "7365636F6E6420726F77"),
        Seq(3L, "746869726420726F77")))
    assert(rows("select * from blobt where i = 1") ==
      Seq(Seq(1L, "first row")))
    assert(rows("select * from blobt order by b desc") ==
      Seq(Seq(3L, "third row"), Seq(2L, "second row"),
        Seq(1L, "first row")))
    assert(rows("select * from blobt where b <= 'second row' order by i") ==
      Seq(Seq(1L, "first row"), Seq(2L, "second row")))
    assert(rows("select i, hex(t) from textt order by i") ==
      Seq(Seq(1L, "666972737420726F77"), Seq(2L, "7365636F6E6420726F77"),
        Seq(3L, "746869726420726F77")))
    assert(rows("select * from textt where i = 1") ==
      Seq(Seq(1L, "first row")))
    assert(rows("select * from textt order by t desc") ==
      Seq(Seq(3L, "third row"), Seq(2L, "second row"),
        Seq(1L, "first row")))
    assert(rows("select * from textt where t <= 'second row' order by i") ==
      Seq(Seq(1L, "first row"), Seq(2L, "second row")))
  }

  test("BlobWriteQueries: insert/update/delete and ALTER over blob/text " +
      "columns (blob_queries.go:84-165)") {
    for (tbl <- Seq(("blobt", "b"), ("textt", "t"))) {
      val (t, c) = tbl
      fresh()
      engine.query(s"insert into $t values (4, '100000000')")
      assert(rows(s"select * from $t where i = 4") ==
        Seq(Seq(4L, "100000000")))
      fresh()
      engine.query(s"update $t set $c = '100000000' where i = 1")
      assert(rows(s"select * from $t where i = 1") ==
        Seq(Seq(1L, "100000000")))
      fresh()
      engine.query(s"delete from $t where i = 1")
      assert(rows(s"select * from $t order by i") ==
        Seq(Seq(2L, "second row"), Seq(3L, "third row")))
      fresh()
      engine.query(s"alter table $t rename column $c to v, add v1 int")
      assert(rows(s"select * from $t order by i") ==
        Seq(Seq(1L, "first row", null), Seq(2L, "second row", null),
          Seq(3L, "third row", null)))
      fresh()
      engine.query(
        s"ALTER TABLE $t ADD COLUMN v2 BIGINT DEFAULT (i + 2) AFTER $c")
      assert(rows(s"select * from $t order by i") ==
        Seq(Seq(1L, "first row", 3L), Seq(2L, "second row", 4L),
          Seq(3L, "third row", 5L)))
    }
  }

  test("BlobErrors: blob/text key parts need a prefix length (1170); " +
      "prefix bytes cap at 3072 (1071) (blob_queries.go:168-255)") {
    fresh()
    engine.runScript(
      """drop table if exists bmyt;
        |create table bmyt (i bigint primary key, s varchar(20),
        |  unique index bmyt_s (s));
        |insert into bmyt values (1, 'first row');
        |""".stripMargin)
    // MODIFY to blob/text while the column sits in a prefix-less key
    assert(err("alter table bmyt modify s blob").contains("1170"))
    assert(err("alter table bmyt modify s text").contains("1170"))
    for (q <- Seq(
        "alter table blobt add index bidx (b)",
        "alter table blobt add index tidx (i, b)",
        "alter table textt add index tidx (t)",
        "alter table textt add index tidx (i, t)",
        "create table bz (b blob primary key)",
        "create table bz (b tinyblob primary key)",
        "create table tz (t text primary key)",
        "create table tz (t text, primary key (t))",
        "create table bz (b blob, primary key (b))",
        "create table bz (i int primary key, b blob, index bidx(b))",
        "CREATE TABLE bz (pk BIGINT PRIMARY KEY, v1 TEXT, INDEX (v1))",
        "CREATE TABLE bz (pk BIGINT PRIMARY KEY, v1 TINYTEXT, INDEX (v1))"))
      assert(err(q).contains("1170"), q)
    for (q <- Seq(
        "alter table blobt add index bidx (b(3073))",
        "alter table textt add index tidx (t(769))",
        "create table bz (b blob, primary key (b(3073)))",
        "create table tz (t text, primary key (t(769)))",
        "create table bz (i int primary key, b blob, index bidx(b(3073)))"))
      assert(err(q).contains("3072"), q)
    // in-range prefixes stay accepted: blob 3072 bytes, text 768 chars
    engine.query("create table bok (i int primary key, b blob, " +
      "index bidx(b(3072)))")
    engine.query("create table tok (i int primary key, t text, " +
      "index tidx(t(768)))")
    engine.runScript(
      "drop table bok; drop table tok; drop table bmyt; " +
      "drop table blobt; drop table textt;")
  }
}
