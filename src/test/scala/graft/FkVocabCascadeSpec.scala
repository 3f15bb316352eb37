package graft

import org.scalatest.funsuite.AnyFunSuite

/** ENUM/SET foreign keys match and CASCADE by ordinal/bitmask, not by
  * member text (reference sql/types/enum.go:52 ordinal compare +
  * sql/rowexec/dml_iters.go FK actions; script_queries.go
  * "enums/set with foreign keys and cascade" — the enum block is
  * Skip:true upstream, so the intended semantics are pinned here). */
class FkVocabCascadeSpec extends AnyFunSuite {
  import SparkSpec.spark

  test("enum FK ON UPDATE CASCADE maps by ordinal") {
    val e = new Engine(spark)
    e.query("create table parent (e enum('a', 'b', 'c') primary key);")
    e.query("insert into parent values (1), (2);")
    e.query("create table child (e enum('x', 'y', 'z'), foreign key (e) " +
      "references parent (e) on update cascade on delete cascade);")
    e.query("insert into child values (1), (2);")
    e.query("update parent set e = 'c' where e = 'a';")
    assert(e.query("select * from child order by e").collect()
      .map(_.getString(0)).toSeq == Seq("y", "z"))
    e.query("delete from parent where e = 'b';")
    assert(e.query("select * from child order by e").collect()
      .map(_.getString(0)).toSeq == Seq("z"))
  }

  test("set FK ON UPDATE CASCADE maps by bitmask") {
    val e = new Engine(spark)
    e.query("create table parent2 (s set('a', 'b', 'c') primary key);")
    e.query("insert into parent2 values (1), (2);")
    e.query("create table child2 (s set('x', 'y', 'z'), foreign key (s) " +
      "references parent2 (s) on update cascade on delete cascade);")
    e.query("insert into child2 values (1), (2);")
    e.query("update parent2 set s = 'a,c' where s = 'a';")
    // SET columns order by bitmask: 'y' = 2 before 'x,z' = 5
    assert(e.query("select * from child2 order by s").collect()
      .map(_.getString(0)).toSeq == Seq("y", "x,z"))
  }
}
