package graft

import org.scalatest.funsuite.AnyFunSuite

/** PREPARE / EXECUTE / DEALLOCATE corpus ported from the reference's
  * enginetest/queries/prepared_statement_queries.go (554 LoC):
  * re-execution sees data changes, bind-arity errors, unset-variable
  * NULL bindings, prepared INSERT/UPDATE through the DML path,
  * PREPARE FROM @uservar, and a complex UNION + IN(?) join body.
  */
class ReferencePreparedCorpusSpec extends AnyFunSuite {
  import SparkSpec.spark

  private lazy val engine = new Engine(spark)

  private def rows(sql: String): Seq[Seq[Any]] =
    engine.query(sql).collect()
      .map(r => (0 until r.length).map(r.get).toSeq).toSeq

  test("a prepared count re-executes against NEW data (re-use over " +
      "changing tables)") {
    engine.runScript(
      """drop table if exists pa;
        |create table pa (x int primary key);
        |insert into pa values (0), (1), (2);
        |prepare cnt from 'select count(*) from pa';
        |""".stripMargin)
    assert(rows("execute cnt") == Seq(Seq(3L)))
    engine.query("insert into pa values (3), (4)")
    assert(rows("execute cnt") == Seq(Seq(5L)))
    engine.runScript("deallocate prepare cnt; drop table pa;")
  }

  test("unknown handler errors: execute before prepare, deallocate of a " +
      "missing statement, execute after deallocate") {
    assert(intercept[Exception] {
      engine.query("execute no_such_stmt")
    }.getMessage.contains("1243"))
    assert(intercept[Exception] {
      engine.query("deallocate prepare idontexist")
    }.getMessage.toLowerCase.contains("idontexist"))
    engine.query("prepare s1 from 'select 1'")
    assert(rows("execute s1") == Seq(Seq(1)))
    engine.query("deallocate prepare s1")
    assert(intercept[Exception] {
      engine.query("execute s1")
    }.getMessage.contains("1243"))
  }

  test("one binding: missing binding and extra arguments error, an " +
      "unset @var binds NULL, values bind by type") {
    engine.runScript(
      "set @pa = 1; set @pb = 100; set @pc = 'abc';")
    engine.query("prepare sb from 'select ?'")
    assert(intercept[Exception] {
      engine.query("execute sb")
    }.getMessage.contains("bind variable not provided: 'v1'"))
    assert(intercept[Exception] {
      engine.query("execute sb using @pa, @pb, @pc, @unset_abc")
    }.getMessage.contains("invalid arguments. expected: 1, found: 4"))
    // an unset user variable binds NULL
    assert(rows("execute sb using @unset_abc") == Seq(Seq(null)))
    assert(String.valueOf(rows("execute sb using @pa").head.head) == "1")
    assert(String.valueOf(rows("execute sb using @pb").head.head) == "100")
    assert(rows("execute sb using @pc") == Seq(Seq("abc")))
    engine.query("deallocate prepare sb")
  }

  test("prepared INSERT with ? placeholders routes through the DML " +
      "path; literal prepared INSERT re-executes") {
    engine.runScript(
      """drop table if exists pi;
        |create table pi (i int primary key, s varchar(10));
        |set @pi1 = 1; set @ps1 = 'abc';
        |prepare ins from 'insert into pi values (?, ?)';
        |""".stripMargin)
    assert(intercept[Exception] {
      engine.query("execute ins using @pi1")
    }.getMessage.contains("bind variable not provided: 'v2'"))
    engine.query("execute ins using @pi1, @ps1")
    assert(rows("select * from pi order by i") == Seq(Seq(1, "abc")))
    engine.query("deallocate prepare ins")
    engine.query("prepare ins2 from 'insert into pi values (100, \"def\")'")
    engine.query("execute ins2")
    assert(rows("select * from pi order by i") ==
      Seq(Seq(1, "abc"), Seq(100, "def")))
    // a second execution hits the duplicate key
    assert(intercept[Exception] {
      engine.query("execute ins2")
    }.getMessage.contains("1062"))
    engine.runScript("deallocate prepare ins2; drop table pi;")
  }

  test("prepared UPDATE with ? placeholders") {
    engine.runScript(
      """drop table if exists pu;
        |create table pu (i int primary key, j varchar(10));
        |insert into pu values (1, 'a'), (2, 'b');
        |set @pj = 'zzz'; set @pk = 1;
        |prepare upd from 'update pu set j = ? where i = ?';
        |""".stripMargin)
    assert(intercept[Exception] {
      engine.query("execute upd using @pj")
    }.getMessage.contains("bind variable not provided"))
    engine.query("execute upd using @pj, @pk")
    assert(rows("select * from pu order by i") ==
      Seq(Seq(1, "zzz"), Seq(2, "b")))
    engine.query("prepare upd2 from 'update pu set j = \"def\" where i = 2'")
    engine.query("execute upd2")
    assert(rows("select * from pu order by i") ==
      Seq(Seq(1, "zzz"), Seq(2, "def")))
    engine.runScript(
      "deallocate prepare upd; deallocate prepare upd2; drop table pu;")
  }

  test("PREPARE FROM @uservar takes the statement text from the " +
      "variable (prepare using user vars block)") {
    engine.runScript(
      """set @stext = 'select 42';
        |prepare pv from @stext;
        |""".stripMargin)
    assert(rows("execute pv") == Seq(Seq(42)))
    // with a binding
    engine.runScript(
      """set @stext2 = 'select ? + 1';
        |set @pnum = 4;
        |prepare pv2 from @stext2;
        |""".stripMargin)
    assert(String.valueOf(rows("execute pv2 using @pnum").head.head) == "5")
    engine.runScript("deallocate prepare pv; deallocate prepare pv2;")
  }

  test("complex UNION + IN(?) join body with three bindings " +
      "(Complex join query with foreign key constraints)") {
    engine.runScript(
      """drop table if exists tweet; drop table if exists users;
        |create table users (id int primary key, username varchar(20));
        |create table tweet (id int primary key, user_id int,
        |  content varchar(50));
        |insert into users values (1,'u1'),(2,'u2'),(3,'u3'),(4,'u4');
        |insert into tweet values (1,1,'a'),(2,2,'b'),(3,3,'c'),
        |  (4,3,'d'),(5,4,'e');
        |set @u2 = 'u2'; set @u3 = 'u3'; set @u4 = 'u4';
        |""".stripMargin)
    engine.query("prepare cj from 'SELECT `t1`.`username`, " +
      "COUNT(`t1`.`id`) AS `ct` FROM ((SELECT `t2`.`id`, `t2`.`content`, " +
      "`t3`.`username` FROM `tweet` AS `t2` INNER JOIN `users` AS `t3` " +
      "ON (`t2`.`user_id` = `t3`.`id`) WHERE (`t3`.`username` = ?)) " +
      "UNION (SELECT `t4`.`id`, `t4`.`content`, `t5`.`username` FROM " +
      "`tweet` AS `t4` INNER JOIN `users` AS `t5` ON (`t4`.`user_id` = " +
      "`t5`.`id`) WHERE (`t5`.`username` IN (?, ?)))) AS `t1` GROUP BY " +
      "`t1`.`username` ORDER BY COUNT(`t1`.`id`) DESC, `t1`.`username`'")
    assert(rows("execute cj using @u3, @u2, @u4") ==
      Seq(Seq("u3", 2L), Seq("u2", 1L), Seq("u4", 1L)))
    engine.runScript(
      "deallocate prepare cj; drop table tweet; drop table users;")
  }
}
