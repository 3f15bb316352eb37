package graft

import org.scalatest.funsuite.AnyFunSuite

/** LOAD DATA clause-combination corpus ported from the reference's
  * enginetest/queries/load_queries.go (899 LoC): explicit column lists,
  * @var capture items (with session persistence of the last row),
  * SET col = expr clauses over columns / bound vars / static session
  * vars, REPLACE / IGNORE modes, and the error surface (missing table,
  * missing file, unknown columns, multi-char separators, @@sysvar
  * items). The data file mirrors the reference's testdata/test9.txt
  * (two tab-separated rows: abc def ghi / jkl mno pqr).
  */
class ReferenceLoadDataCorpusSpec extends AnyFunSuite {
  import SparkSpec.spark

  private lazy val engine = new Engine(spark)

  private def rows(sql: String): Seq[Seq[Any]] =
    engine.query(sql).collect()
      .map(r => (0 until r.length).map(r.get).toSeq).toSeq

  private lazy val dir =
    java.nio.file.Files.createTempDirectory("graft_ld").toString

  private lazy val test9: String = {
    val f = new java.io.File(dir, "test9.txt")
    val w = new java.io.PrintWriter(f)
    w.write("abc\tdef\tghi\njkl\tmno\tpqr\n")
    w.close()
    f.getAbsolutePath
  }

  private def freshLt(name: String, cols: String = "i text, j text, k text")
      : Unit = {
    engine.query(s"drop table if exists $name")
    engine.query(s"create table $name ($cols)")
  }

  test("SET columns without a projection list: fields bind positionally, " +
      "SET overrides (incl. repeated target, column-referencing expr)") {
    freshLt("lt1")
    engine.query(s"LOAD DATA INFILE '$test9' INTO TABLE lt1 " +
      "FIELDS TERMINATED BY '\\t' SET i = '123'")
    assert(rows("select * from lt1 order by i, j, k") ==
      Seq(Seq("123", "def", "ghi"), Seq("123", "mno", "pqr")))
    freshLt("lt2")
    engine.query(
      s"LOAD DATA INFILE '$test9' INTO TABLE lt2 set i = '123', j = '456'")
    assert(rows("select * from lt2 order by i, j, k") ==
      Seq(Seq("123", "456", "ghi"), Seq("123", "456", "pqr")))
    // repeated assignment to one column: last wins
    freshLt("lt4")
    engine.query(
      s"LOAD DATA INFILE '$test9' INTO TABLE lt4 set i = '123', i = '321'")
    assert(rows("select * from lt4 order by i, j, k") ==
      Seq(Seq("321", "def", "ghi"), Seq("321", "mno", "pqr")))
    // SET expression referencing the loaded column itself
    freshLt("lt5")
    engine.query(
      s"LOAD DATA INFILE '$test9' INTO TABLE lt5 set j = concat(j, j)")
    assert(rows("select * from lt5 order by i, j, k") ==
      Seq(Seq("abc", "defdef", "ghi"), Seq("jkl", "mnomno", "pqr")))
    engine.runScript(
      "drop table lt1; drop table lt2; drop table lt4; drop table lt5;")
  }

  test("SET columns with projections: reordered lists, short lists " +
      "(unmentioned columns NULL), SET on an unlisted column") {
    freshLt("ltp1")
    engine.query(
      s"LOAD DATA INFILE '$test9' INTO TABLE ltp1 (i, j, k) set i = '123'")
    assert(rows("select * from ltp1 order by i, j, k") ==
      Seq(Seq("123", "def", "ghi"), Seq("123", "mno", "pqr")))
    freshLt("ltp2")
    engine.query(
      s"LOAD DATA INFILE '$test9' INTO TABLE ltp2 (k, i, j) set i = '123'")
    assert(rows("select * from ltp2 order by i, j, k") ==
      Seq(Seq("123", "ghi", "abc"), Seq("123", "pqr", "jkl")))
    freshLt("ltp3")
    engine.query(
      s"LOAD DATA INFILE '$test9' INTO TABLE ltp3 (j, k) set i = '123'")
    assert(rows("select * from ltp3 order by i, j, k") ==
      Seq(Seq("123", "abc", "def"), Seq("123", "jkl", "mno")))
    freshLt("ltp4")
    engine.query(
      s"LOAD DATA INFILE '$test9' INTO TABLE ltp4 (k, i) set i = '123'")
    assert(rows("select * from ltp4 order by i, j, k") ==
      Seq(Seq("123", null, "abc"), Seq("123", null, "jkl")))
    engine.runScript("drop table ltp1; drop table ltp2; drop table ltp3; " +
      "drop table ltp4;")
  }

  test("SET from static session user variables") {
    engine.runScript("set @si = '123'; set @sj = '456'; set @sk = '789';")
    freshLt("lts")
    engine.query(
      s"LOAD DATA INFILE '$test9' INTO TABLE lts set i = @si, j = @sj")
    assert(rows("select * from lts order by k") ==
      Seq(Seq("123", "456", "ghi"), Seq("123", "456", "pqr")))
    engine.query("drop table lts")
  }

  test("@var items capture their field (column NULL), persist the LAST " +
      "row's value into the session, and discard extra fields") {
    freshLt("ltv1")
    engine.query(s"LOAD DATA INFILE '$test9' INTO TABLE ltv1 (@vi, j, k)")
    assert(rows("select * from ltv1 order by j") ==
      Seq(Seq(null, "def", "ghi"), Seq(null, "mno", "pqr")))
    assert(rows("select @vi") == Seq(Seq("jkl")))
    // a two-column table with a trailing @trash item drops field 3
    freshLt("ltv5", "i text, j text")
    engine.query(
      s"LOAD DATA INFILE '$test9' INTO TABLE ltv5 (i, j, @trash1)")
    assert(rows("select * from ltv5 order by i") ==
      Seq(Seq("abc", "def"), Seq("jkl", "mno")))
    assert(rows("select @trash1") == Seq(Seq("pqr")))
    // the same @var twice: the LAST binding wins
    freshLt("ltv6", "j text")
    engine.query(
      s"LOAD DATA INFILE '$test9' INTO TABLE ltv6 (@trash2, j, @trash2)")
    assert(rows("select * from ltv6 order by j") ==
      Seq(Seq("def"), Seq("mno")))
    assert(rows("select @trash2") == Seq(Seq("pqr")))
    engine.runScript(
      "drop table ltv1; drop table ltv5; drop table ltv6;")
  }

  test("user vars combine with SET expressions (reorder, concat of " +
      "bound vars and columns, swap via vars)") {
    freshLt("ltx1")
    engine.query(
      s"LOAD DATA INFILE '$test9' INTO TABLE ltx1 (k, @xj, i) set j = @xj")
    assert(rows("select * from ltx1 order by i") ==
      Seq(Seq("ghi", "def", "abc"), Seq("pqr", "mno", "jkl")))
    freshLt("ltx2", "i text, j text")
    engine.query(s"LOAD DATA INFILE '$test9' INTO TABLE ltx2 " +
      "(i, j, @xk) set j = concat(@xk, @xk)")
    assert(rows("select * from ltx2 order by i") ==
      Seq(Seq("abc", "ghighi"), Seq("jkl", "pqrpqr")))
    freshLt("ltx3", "i text, j text")
    engine.query(s"LOAD DATA INFILE '$test9' INTO TABLE ltx3 " +
      "(i, @yj, @yk) set j = concat(@yj, @yk)")
    assert(rows("select * from ltx3 order by i") ==
      Seq(Seq("abc", "defghi"), Seq("jkl", "mnopqr")))
    freshLt("ltx4", "i text, j text")
    engine.query(s"LOAD DATA INFILE '$test9' INTO TABLE ltx4 " +
      "(i, j, @zk) set j = concat(j, @zk)")
    assert(rows("select * from ltx4 order by i") ==
      Seq(Seq("abc", "defghi"), Seq("jkl", "mnopqr")))
    // swap through vars: SET sees the captured fields, not the columns
    freshLt("ltx5", "i text, j text")
    engine.query(s"LOAD DATA INFILE '$test9' INTO TABLE ltx5 " +
      "(@wi, @wj) set i = @wj, j = @wi")
    assert(rows("select * from ltx5 order by i") ==
      Seq(Seq("def", "abc"), Seq("mno", "jkl")))
    engine.runScript("drop table ltx1; drop table ltx2; drop table ltx3; " +
      "drop table ltx4; drop table ltx5;")
  }

  test("column list with declared defaults: unmentioned columns take " +
      "the DEFAULT, not NULL (loaddata t_defaults shape)") {
    engine.query("drop table if exists ltd")
    engine.query("create table ltd (id int primary key, " +
      "val varchar(255) default 'default')")
    val f = new java.io.File(dir, "ids.txt")
    val w = new java.io.PrintWriter(f); w.write("1\n2\n3\n"); w.close()
    engine.query(
      s"LOAD DATA INFILE '${f.getAbsolutePath}' INTO TABLE ltd (id)")
    assert(rows("select * from ltd order by id") ==
      Seq(Seq(1, "default"), Seq(2, "default"), Seq(3, "default")))
    engine.query("drop table ltd")
  }

  test("REPLACE / IGNORE modes against an existing primary key") {
    engine.query("drop table if exists ltm")
    engine.query(
      "create table ltm (pk int primary key, v varchar(10))")
    engine.query("insert into ltm values (1, 'old1'), (2, 'old2')")
    val f = new java.io.File(dir, "mode.txt")
    val w = new java.io.PrintWriter(f)
    w.write("1,new1\n3,new3\n"); w.close()
    // IGNORE: existing pk 1 keeps its row, pk 3 inserts
    engine.query(s"LOAD DATA INFILE '${f.getAbsolutePath}' IGNORE " +
      "INTO TABLE ltm FIELDS TERMINATED BY ','")
    assert(rows("select * from ltm order by pk") ==
      Seq(Seq(1, "old1"), Seq(2, "old2"), Seq(3, "new3")))
    // REPLACE: existing pk 1 is replaced
    engine.query("delete from ltm where pk = 3")
    engine.query(s"LOAD DATA INFILE '${f.getAbsolutePath}' REPLACE " +
      "INTO TABLE ltm FIELDS TERMINATED BY ','")
    assert(rows("select * from ltm order by pk") ==
      Seq(Seq(1, "new1"), Seq(2, "old2"), Seq(3, "new3")))
    engine.query("drop table ltm")
  }

  test("error surface: missing table, missing file, unknown column in " +
      "list and SET, multi-char separators, @@sysvar item") {
    assert(intercept[IllegalArgumentException] {
      engine.query(s"LOAD DATA INFILE '$test9' INTO TABLE no_such_ld")
    }.getMessage.contains("doesn't exist"))
    engine.query("drop table if exists lte")
    engine.query("create table lte (i text, j text, k text)")
    assert(intercept[IllegalArgumentException] {
      engine.query("LOAD DATA INFILE '/nope/missing.txt' INTO TABLE lte")
    }.getMessage.toLowerCase.contains("unable to open"))
    assert(intercept[IllegalArgumentException] {
      engine.query(s"LOAD DATA INFILE '$test9' INTO TABLE lte (i, notj)")
    }.getMessage.contains("1054"))
    assert(intercept[IllegalArgumentException] {
      engine.query(s"LOAD DATA INFILE '$test9' INTO TABLE lte set noti = '1'")
    }.getMessage.contains("1054"))
    assert(intercept[IllegalArgumentException] {
      engine.query(s"LOAD DATA INFILE '$test9' INTO TABLE lte " +
        "FIELDS TERMINATED BY ',' ENCLOSED BY 'xx'")
    }.getMessage.toLowerCase.contains("single character"))
    assert(intercept[IllegalArgumentException] {
      engine.query(s"LOAD DATA INFILE '$test9' INTO TABLE lte " +
        "FIELDS TERMINATED BY ',' ESCAPED BY 'xx'")
    }.getMessage.toLowerCase.contains("single character"))
    assert(intercept[IllegalArgumentException] {
      engine.query(s"LOAD DATA INFILE '$test9' INTO TABLE lte (@@k)")
    }.getMessage.contains("@@k"))
    engine.query("drop table lte")
  }
  test("REPLACE mode is statement-atomic: a failed insert-phase " +
      "validation leaves the pre-statement rows intact") {
    engine.query("drop table if exists lra")
    engine.query("create table lra (i varchar(30), j varchar(30), " +
      "k varchar(30), CHECK (j <> 'mno'))")
    engine.query("alter table lra add primary key (i)")
    engine.query("insert into lra values ('jkl', 'old', 'old')")
    // test9's second row (jkl, mno, pqr) matches the existing key AND
    // violates the CHECK: the statement must fail as a unit — the
    // key-matching delete phase must not survive the failed insert
    assert(intercept[Exception] {
      engine.query(s"LOAD DATA INFILE '$test9' REPLACE INTO TABLE lra " +
        "FIELDS TERMINATED BY '\\t'")
    }.getMessage.toLowerCase.contains("check"))
    assert(rows("select * from lra") == Seq(Seq("jkl", "old", "old")))
    engine.query("drop table lra")
  }

  test("scheme'd infile paths resolve through the Hadoop FileSystem " +
      "(file: URI loads; a missing scheme'd path still errors eagerly)") {
    engine.query("drop table if exists lsp")
    engine.query("create table lsp (i text, j text, k text)")
    engine.query(s"LOAD DATA INFILE 'file:$test9' INTO TABLE lsp " +
      "FIELDS TERMINATED BY '\\t'")
    assert(rows("select count(*) from lsp") == Seq(Seq(2L)))
    assert(intercept[IllegalArgumentException] {
      engine.query("LOAD DATA INFILE 'file:/nope/missing.txt' " +
        "INTO TABLE lsp")
    }.getMessage.toLowerCase.contains("unable to open"))
    engine.query("drop table lsp")
  }

}
