package graft

import org.scalatest.funsuite.AnyFunSuite

/** Row-level BEFORE UPDATE triggers (reference sql/plan/triggers.go;
  * script_queries.go "update join with update trigger" family). The
  * supported body surface is SET NEW.col = expr layers, optionally
  * IF-gated, inside BEGIN…END or bare. */
class TriggerSpec extends AnyFunSuite {
  import SparkSpec.spark

  test("BEFORE UPDATE trigger overrides assignment on plain UPDATE") {
    val e = new Engine(spark)
    e.query("create table trg_t (i int primary key, j int, k int);")
    e.query("insert into trg_t values (1, 2, 3), (2, 5, 6);")
    e.query("create trigger trg1 before update on trg_t " +
      "for each row begin set new.k = 999; end;")
    e.query("update trg_t set k = 30 where i = 1;")
    assert(e.query("select * from trg_t order by i").collect()
      .map(r => (r.getInt(0), r.getInt(1), r.getInt(2))).toSeq ==
      Seq((1, 2, 999), (2, 5, 6))) // unmatched row untouched
  }

  test("IF-gated SET fires only when the condition holds") {
    val e = new Engine(spark)
    e.query("create table trg_u (id int primary key, pw varchar(10), " +
      "deleted tinyint(1));")
    e.query("insert into trg_u values (1, 'secret', 0);")
    e.query("CREATE TRIGGER trg2 BEFORE UPDATE ON trg_u FOR EACH ROW " +
      "BEGIN IF NEW.`deleted` THEN SET NEW.`pw` = ''; END IF; END")
    e.query("update trg_u set id = id where id = 1;")
    assert(e.query("select pw from trg_u").collect()(0).getString(0)
      == "secret")
    e.query("update trg_u set deleted = 1 where id = 1;")
    assert(e.query("select pw from trg_u").collect()(0).getString(0) == "")
  }

  test("DROP TRIGGER removes it; duplicate name and bad body error") {
    val e = new Engine(spark)
    e.query("create table trg_v (i int primary key, k int);")
    e.query("insert into trg_v values (1, 1);")
    e.query("create trigger trg3 before update on trg_v " +
      "for each row set new.k = 7;")
    val dup = intercept[Exception] {
      e.query("create trigger trg3 before update on trg_v " +
        "for each row set new.k = 8;") }
    assert(dup.getMessage.contains("already exists"))
    e.query("drop trigger trg3")
    e.query("update trg_v set k = 2;")
    assert(e.query("select k from trg_v").collect()(0).getInt(0) == 2)
    val bad = intercept[Exception] {
      e.query("create trigger trg4 before update on trg_v " +
        "for each row begin insert into trg_v values (9, 9); end;") }
    assert(bad.getMessage.contains("unsupported trigger body"),
      bad.getMessage)
    intercept[Exception] { e.query("drop trigger trg_nope") }
    e.query("drop trigger if exists trg_nope") // no error
  }
}
