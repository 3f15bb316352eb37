package graft

import org.scalatest.funsuite.AnyFunSuite

/** CREATE TABLE (column defs) + ALTER TABLE front-door coverage, driven
  * with the reference enginetest setup-script shapes (the statements
  * every ScriptTest opens with — order_by_group_by_queries.go:27,
  * alter_table_queries.go). Columns map through the MySQL type table
  * (sql/types); ENUM/SET vocabularies and PRIMARY KEYs land in the
  * engine's declared metadata.
  */
class ReferenceDdlCorpusSpec extends AnyFunSuite {
  import SparkSpec.spark

  private lazy val engine = new Engine(spark)

  private def rows(sql: String): Seq[Seq[Any]] =
    engine.query(sql).collect()
      .map(r => (0 until r.length).map(r.get).toSeq).toSeq

  test("create table + insert + select round-trip (ScriptTest setup shape)") {
    engine.runScript(
      """create table members (id bigint primary key, team text);
        |insert into members values (3,'red'), (4,'red'),(5,'orange'),(6,'orange'),(7,'orange'),(8,'purple');
        |""".stripMargin)
    assert(rows("select team, count(*) c from members group by team order by c") ==
      Seq(Seq("purple", 1L), Seq("red", 2L), Seq("orange", 3L)))
    // declared primary key surfaces through SHOW INDEX
    val idx = rows("SHOW INDEX FROM members")
    assert(idx.exists(r => r.contains("PRIMARY") && r.contains("id")))
    engine.query("drop table members")
  }

  test("column types map through the MySQL type table") {
    engine.runScript(
      """create table typed (
        |  a tinyint, b smallint, c int unsigned, d bigint,
        |  e decimal(10,2), f double, g varchar(20) not null,
        |  h date, i datetime, j blob, k json);
        |""".stripMargin)
    val schema = spark.table("typed").schema
    import org.apache.spark.sql.types._
    assert(schema("a").dataType == ByteType)
    assert(schema("b").dataType == ShortType)
    assert(schema("c").dataType == LongType)
    assert(schema("d").dataType == LongType)
    assert(schema("e").dataType == DecimalType(10, 2))
    assert(schema("f").dataType == DoubleType)
    assert(schema("g").dataType == StringType && !schema("g").nullable)
    assert(schema("h").dataType == DateType)
    assert(schema("i").dataType == TimestampNTZType)
    assert(schema("j").dataType == BinaryType)
    assert(schema("k").dataType == StringType)
    engine.query("drop table typed")
  }

  test("enum column rejects out-of-vocabulary writes (sql/types/enum.go:52)") {
    engine.runScript(
      "create table shirts (name varchar(40), size enum('x-small','small','medium','large','x-large'));")
    engine.query("insert into shirts values ('dress shirt','large')")
    val e = intercept[IllegalArgumentException] {
      engine.query("insert into shirts values ('bad shirt','huge')")
    }
    assert(e.getMessage.contains("Data truncated"))
    assert(rows("select size from shirts") == Seq(Seq("large")))
    engine.query("drop table shirts")
  }

  test("DEFAULT keyword in VALUES takes the declared default (column_default_queries.go)") {
    engine.runScript(
      """create table dk (pk int primary key, v int default 42, s varchar(10) default 'hi');
        |insert into dk values (1, DEFAULT, 'x'), (2, 7, DEFAULT);
        |insert into dk (pk, v) values (3, DEFAULT);
        |""".stripMargin)
    assert(rows("select * from dk order by pk") ==
      Seq(Seq(1, 42, "x"), Seq(2, 7, "hi"), Seq(3, 42, "hi")))
    // UPDATE ... SET col = DEFAULT restores the declared default
    engine.query("update dk set v = default where pk = 2")
    assert(rows("select v from dk where pk = 2") == Seq(Seq(42)))
    engine.query("drop table dk")
  }

  test("column DEFAULTs apply to unmentioned insert columns (column_default_queries.go shape)") {
    engine.runScript(
      """create table td (pk bigint primary key, v1 int default 42, v2 varchar(10) default 'x', v3 int);
        |insert into td (pk) values (1);
        |insert into td (pk, v1) values (2, 7);
        |""".stripMargin)
    assert(rows("select * from td order by pk") ==
      Seq(Seq(1L, 42, "x", null), Seq(2L, 7, "x", null)))
    engine.query("drop table td")
  }

  test("auto_increment fills omitted insert columns (insert_queries.go shape)") {
    engine.runScript(
      """CREATE TABLE users (id int NOT NULL AUTO_INCREMENT, username varchar(255) NOT NULL, PRIMARY KEY (id));
        |INSERT INTO users (username) VALUES ('u2');
        |INSERT INTO users (username) VALUES ('u3');
        |INSERT INTO users (id, username) VALUES (10, 'u10');
        |INSERT INTO users (username) VALUES ('u11');
        |""".stripMargin)
    assert(rows("select id, username from users order by id") ==
      Seq(Seq(1, "u2"), Seq(2, "u3"), Seq(10, "u10"), Seq(11, "u11")))
    engine.query("drop table users")
  }

  test("create table like copies schema and declared metadata") {
    engine.runScript(
      """create table src_t (id int NOT NULL AUTO_INCREMENT, v int default 5, PRIMARY KEY (id));
        |insert into src_t (v) values (1);
        |create table dst_t like src_t;
        |insert into dst_t (v) values (9);
        |""".stripMargin)
    assert(rows("select * from dst_t") == Seq(Seq(1, 9)))
    assert(rows("select count(*) c from src_t") == Seq(Seq(1L)))
    // auto-inc + default carried over: omitted id filled, omitted v defaults
    engine.query("insert into dst_t (id) values (10)")
    assert(rows("select * from dst_t order by id") ==
      Seq(Seq(1, 9), Seq(10, 5)))
    engine.runScript("drop table src_t; drop table dst_t;")
  }

  test("alter table add/drop/rename/modify (alter_table_queries.go shapes)") {
    engine.runScript(
      """create table t1 (pk bigint primary key, v1 int);
        |insert into t1 values (1, 10), (2, 20);
        |""".stripMargin)
    engine.query("alter table t1 add column v2 varchar(10)")
    assert(rows("select * from t1 order by pk") ==
      Seq(Seq(1L, 10, null), Seq(2L, 20, null)))
    engine.query("alter table t1 add column v3 int default 7")
    assert(rows("select v3 from t1 order by pk") == Seq(Seq(7), Seq(7)))
    engine.query("alter table t1 rename column v1 to score")
    assert(spark.table("t1").columns.toSeq ==
      Seq("pk", "score", "v2", "v3"))
    engine.query("alter table t1 modify column score bigint")
    assert(spark.table("t1").schema("score").dataType ==
      org.apache.spark.sql.types.LongType)
    engine.query("alter table t1 drop column v2")
    assert(spark.table("t1").columns.toSeq == Seq("pk", "score", "v3"))
    // positioned add
    engine.query("alter table t1 add column z int first")
    assert(spark.table("t1").columns.head == "z")
    engine.query("alter table t1 add column m int after pk")
    assert(spark.table("t1").columns.toSeq ==
      Seq("z", "pk", "m", "score", "v3"))
    // index DDL is metadata-only, must not throw
    engine.query("alter table t1 add index idx_s (score)")
    engine.query("alter table t1 drop index idx_s")
    // rename to
    engine.query("alter table t1 rename to t2")
    assert(rows("select count(*) n from t2") == Seq(Seq(2L)))
    engine.query("drop table t2")
  }

  test("nested parens in the LAST column-list item (balanced-scan extraction)") {
    // CHECK with nested parens as the final item: the old greedy-regex
    // extraction only worked by luck; the balanced scan is exact
    engine.runScript(
      """create table chk (a int, b varchar(10), check (a > (1)));
        |insert into chk values (5, 'ok');
        |""".stripMargin)
    assert(rows("select a, b from chk") == Seq(Seq(5, "ok")))
    engine.query("drop table chk")
    // DEFAULT (expression) with nested parens as the final item
    engine.runScript(
      "create table dflt (pk int primary key, v int default ((2 + (3))))")
    engine.query("insert into dflt (pk) values (1)")
    assert(rows("select v from dflt") == Seq(Seq(5)))
    engine.query("drop table dflt")
    // table options after the balanced close still recognized
    engine.runScript(
      """create table opts (a int, check (a in (1, (2))))
        |ENGINE=InnoDB DEFAULT CHARSET=utf8mb4""".stripMargin)
    assert(rows("select count(*) n from opts") == Seq(Seq(0L)))
    engine.query("drop table opts")
    // a quoted paren inside a DEFAULT string must not unbalance the scan
    engine.runScript(
      "create table qt (a int, s varchar(20) default 'a)b(')")
    engine.query("insert into qt (a) values (9)")
    assert(rows("select a, s from qt") == Seq(Seq(9, "a)b(")))
    engine.query("drop table qt")
  }

  test("column-declared collations: comparisons/ordering are collation-" +
      "aware without per-query COLLATE (charset_collation_engine.go shapes)") {
    engine.runScript(
      """create table nm_ci (id int, nm varchar(20) collate utf8mb4_0900_ai_ci);
        |insert into nm_ci values (1,'b'), (2,'A'), (3,'á'), (4,'B'), (5,'a');
        |""".stripMargin)
    // ai_ci groups {A, á, a} before {b, B}; ties break on id
    assert(rows("select nm from nm_ci order by nm, id").map(_.head) ==
      Seq("A", "á", "a", "b", "B"))
    // equality merges case and accent variants
    assert(rows("select count(*) n from nm_ci where nm = 'a'") == Seq(Seq(3L)))
    assert(rows("select count(distinct nm) n from nm_ci") == Seq(Seq(2L)))
    // binary column for contrast: 5 distinct
    engine.runScript(
      """create table nm_bin (id int, nm varchar(20));
        |insert into nm_bin select id, nm from nm_ci;
        |""".stripMargin)
    assert(rows("select count(distinct nm) n from nm_bin") == Seq(Seq(5L)))
    // ALTER MODIFY can change the collation after the fact
    engine.query(
      "alter table nm_bin modify column nm varchar(20) collate utf8mb4_0900_ai_ci")
    assert(rows("select count(distinct nm) n from nm_bin") == Seq(Seq(2L)))
    engine.query("drop table nm_ci")
    engine.query("drop table nm_bin")
  }

  test("blob/text round-trips and binary ordering (blob_queries.go:24-80)") {
    engine.runScript(
      """create table blobt (i bigint primary key, b longblob);
        |insert into blobt values (1, 'first row'), (2, 'second row'), (3, 'third row');
        |""".stripMargin)
    assert(engine.query("select i, hex(b) from blobt order by i").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSeq ==
      Seq((1L, "666972737420726F77"), (2L, "7365636F6E6420726F77"),
        (3L, "746869726420726F77")))
    assert(new String(engine.query("select * from blobt where i = 1")
      .collect()(0).getAs[Array[Byte]](1), "UTF-8") == "first row")
    assert(engine.query("select i from blobt order by b desc").collect()
      .map(_.getLong(0)).toSeq == Seq(3L, 2L, 1L))
    assert(engine.query("select i from blobt where b <= 'second row' order by i")
      .collect().map(_.getLong(0)).toSeq == Seq(1L, 2L))
    // write-side: UPDATE a blob column keeps binary type
    engine.query("update blobt set b = '100000000' where i = 1")
    assert(new String(engine.query("select b from blobt where i = 1")
      .collect()(0).getAs[Array[Byte]](0), "UTF-8") == "100000000")
    engine.query("drop table blobt")
  }

  test("NULL-range predicate planning (null_range_tests.go, full set)") {
    engine.runScript(
      """create table null_ranges (x int primary key, y int);
        |create index idx1 on null_ranges (y);
        |insert into null_ranges values (0,0), (1,1), (2,2), (3,null), (4,null);
        |""".stripMargin)
    def q(where: String): Seq[(Int, Any)] =
      engine.query(s"select * from null_ranges where $where order by x")
        .collect().map(r => (r.getInt(0), r.get(1))).toSeq
    assert(q("y IS NULL or y < 1") == Seq((0, 0), (3, null), (4, null)))
    assert(q("y IS NULL and y < 1").isEmpty)
    assert(q("y IS NULL or y IS NOT NULL").size == 5)
    assert(q("y IS NOT NULL") == Seq((0, 0), (1, 1), (2, 2)))
    assert(q("y IS NULL or y = 0 or y = 1") ==
      Seq((0, 0), (1, 1), (3, null), (4, null)))
    assert(q("y IS NULL or y < 1 or y > 1") ==
      Seq((0, 0), (2, 2), (3, null), (4, null)))
    assert(q("y IS NOT NULL and x > 1") == Seq((2, 2)))
    assert(q("y IS NULL and x = 4") == Seq((4, null)))
    assert(q("y IS NULL and x > 1") == Seq((3, null), (4, null)))
    assert(q("y IS NULL and y IS NOT NULL").isEmpty)
    assert(q("y is NULL and y > -1 and y > -2").isEmpty)
    assert(q("y > -1 and y < 7 and y IS NULL").isEmpty)
    assert(q("y > -1 and y > -2 and y IS NOT NULL") ==
      Seq((0, 0), (1, 1), (2, 2)))
    assert(q("y > -1 and y > 1 and y IS NOT NULL") == Seq((2, 2)))
    assert(q("y < 6 and y > -1 and y IS NOT NULL") ==
      Seq((0, 0), (1, 1), (2, 2)))
    engine.query("drop table null_ranges")
  }

  test("collation ordering + predicates (charset_collation_engine.go:122-232)") {
    engine.runScript(
      """CREATE TABLE ct1 (pk BIGINT PRIMARY KEY, v1 VARCHAR(255) COLLATE utf16_unicode_ci, INDEX(v1));
        |CREATE TABLE ct2 (pk BIGINT PRIMARY KEY, v1 VARCHAR(255) COLLATE utf8mb4_0900_bin, INDEX(v1));
        |INSERT INTO ct1 VALUES (1, 'abc'), (2, 'ABC'), (3, 'aBc'), (4, 'AbC');
        |INSERT INTO ct2 VALUES (1, 'abc'), (2, 'ABC'), (3, 'aBc'), (4, 'AbC');
        |""".stripMargin)
    def q(sql: String): Seq[(String, Long)] =
      engine.query(sql).collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    // ci collation: all four compare equal — ORDER BY v1,pk is pk order
    assert(q("SELECT v1, pk FROM ct1 ORDER BY v1, pk") ==
      Seq(("abc", 1L), ("ABC", 2L), ("aBc", 3L), ("AbC", 4L)))
    // binary collation: byte order ABC < AbC < aBc < abc
    assert(q("SELECT v1, pk FROM ct2 ORDER BY v1, pk") ==
      Seq(("ABC", 2L), ("AbC", 4L), ("aBc", 3L), ("abc", 1L)))
    // predicates against the ci column treat case variants as equal
    assert(q("SELECT v1, pk FROM ct1 WHERE v1 > 'AbC' ORDER BY v1, pk").isEmpty)
    assert(q("SELECT v1, pk FROM ct1 WHERE v1 >= 'AbC' ORDER BY v1, pk").size == 4)
    assert(q("SELECT v1, pk FROM ct1 WHERE v1 = 'ABC' ORDER BY v1, pk").size == 4)
    assert(q("SELECT v1, pk FROM ct1 WHERE v1 BETWEEN 'ABC' AND 'AbC' ORDER BY v1, pk").size == 4)
    assert(q("SELECT v1, pk FROM ct1 WHERE v1 IN ('abc') ORDER BY v1, pk").size == 4)
    // binary column: exact byte comparisons
    assert(q("SELECT v1, pk FROM ct2 WHERE v1 > 'AbC' ORDER BY v1, pk") ==
      Seq(("aBc", 3L), ("abc", 1L)))
    assert(q("SELECT v1, pk FROM ct2 WHERE v1 >= 'AbC' ORDER BY v1, pk") ==
      Seq(("AbC", 4L), ("aBc", 3L), ("abc", 1L)))
    assert(q("SELECT v1, pk FROM ct2 WHERE v1 <= 'aBc' ORDER BY v1, pk") ==
      Seq(("ABC", 2L), ("AbC", 4L), ("aBc", 3L)))
    assert(q("SELECT v1, pk FROM ct2 WHERE v1 = 'ABC' ORDER BY v1, pk") ==
      Seq(("ABC", 2L)))
    assert(q("SELECT v1, pk FROM ct2 WHERE v1 IN ('abc') ORDER BY v1, pk") ==
      Seq(("abc", 1L)))
    // MODIFY to a plain VARCHAR drops the declared collation -> binary
    engine.query("ALTER TABLE ct1 MODIFY COLUMN v1 VARCHAR(100)")
    assert(q("SELECT v1, pk FROM ct1 WHERE v1 <= 'aBc' ORDER BY v1, pk") ==
      Seq(("ABC", 2L), ("AbC", 4L), ("aBc", 3L)))
    engine.query("drop table ct1")
    engine.query("drop table ct2")
  }

  test("stored generated columns (generated_columns.go:25-100)") {
    engine.runScript(
      "create table gt1 (a int primary key, b int as (a + 1) stored)")
    // explicit values into a generated column: MySQL error 3105
    intercept[IllegalArgumentException] {
      engine.query("insert into gt1 values (1,2)")
    }
    intercept[IllegalArgumentException] {
      engine.query("insert into gt1(a,b) values (1,2)")
    }
    engine.query("insert into gt1(a) values (1), (2), (3)")
    assert(rows("select * from gt1 order by a") ==
      Seq(Seq(1, 2), Seq(2, 3), Seq(3, 4)))
    // direct UPDATE of a generated column: error 3105
    intercept[IllegalArgumentException] {
      engine.query("update gt1 set b = b + 1")
    }
    // updating a source column recomputes the generated one
    engine.query("update gt1 set a = 10 where a = 1")
    assert(rows("select * from gt1 order by a") ==
      Seq(Seq(2, 3), Seq(3, 4), Seq(10, 11)))
    engine.query("delete from gt1 where b = 11")
    assert(rows("select count(*) n from gt1") == Seq(Seq(2L)))
    // the DEFAULT keyword in VALUES / SET (generated_columns.go:61,88)
    engine.query("insert into gt1(a,b) values (20, DEFAULT)")
    assert(rows("select * from gt1 where a = 20") == Seq(Seq(20, 21)))
    engine.query("insert into gt1 values (21, DEFAULT)")
    assert(rows("select * from gt1 where a = 21") == Seq(Seq(21, 22)))
    engine.query("update gt1 set b = default") // recompute: values unchanged
    assert(rows("select * from gt1 where a = 20") == Seq(Seq(20, 21)))
    // chained generated columns compute in declaration order
    engine.runScript(
      """create table gt2 (a int, b int generated always as (a * 2) stored,
        |                  c int generated always as (b + 1) stored);
        |insert into gt2 (a) values (5);
        |""".stripMargin)
    assert(rows("select * from gt2") == Seq(Seq(5, 10, 11)))
    engine.query("drop table gt1")
    engine.query("drop table gt2")
  }

  test("CHECK constraints enforced on writes (check_scripts.go shapes)") {
    engine.runScript(
      """create table ck (pk int primary key, v int,
        |  constraint chk_big check (v > 0), check (v < 100));
        |""".stripMargin)
    engine.query("insert into ck values (1, 50)")
    // violating insert names the constraint (MySQL error 3819)
    val err = intercept[IllegalArgumentException] {
      engine.query("insert into ck values (2, -1)")
    }
    assert(err.getMessage.contains("chk_big"))
    intercept[IllegalArgumentException] {
      engine.query("insert into ck values (2, 200)")
    }
    // NULL passes a CHECK (MySQL 3VL)
    engine.query("insert into ck values (3, null)")
    assert(rows("select count(*) n from ck") == Seq(Seq(2L)))
    // UPDATE that would violate fails; valid UPDATE passes
    intercept[IllegalArgumentException] {
      engine.query("update ck set v = -5 where pk = 1")
    }
    engine.query("update ck set v = 60 where pk = 1")
    assert(rows("select v from ck where pk = 1") == Seq(Seq(60)))
    // ALTER ADD CHECK validates existing rows
    intercept[IllegalArgumentException] {
      engine.query("alter table ck add constraint chk_even check (v < 10)")
    }
    engine.query("alter table ck add constraint chk_room check (v < 1000)")
    intercept[IllegalArgumentException] {
      engine.query("insert into ck values (4, 5000)")
    }
    // DROP CHECK removes enforcement
    engine.query("alter table ck drop check chk_big")
    engine.query("insert into ck values (5, -7)")
    assert(rows("select count(*) n from ck") == Seq(Seq(3L)))
    // dropping the table clears its constraints for re-creates
    engine.query("drop table ck")
    engine.runScript(
      """create table ck (pk int primary key, v int);
        |insert into ck values (1, -999);
        |""".stripMargin)
    assert(rows("select v from ck") == Seq(Seq(-999)))
    engine.query("drop table ck")
  }

  test("PRIMARY KEY uniqueness: 1062 on plain INSERT; INSERT IGNORE skips " +
      "(insert_queries.go:1584, issue-8611 shape at :2930)") {
    engine.runScript(
      """create table pk_t (pk int primary key, v enum('hello','bye'));
        |insert into pk_t values (1, 'hello');
        |""".stripMargin)
    // duplicate against existing rows
    assert(intercept[IllegalArgumentException] {
      engine.query("insert into pk_t values (1, 'bye')")
    }.getMessage.contains("1062"))
    // duplicate inside one statement
    assert(intercept[IllegalArgumentException] {
      engine.query("insert into pk_t values (2, 'bye'), (2, 'hello')")
    }.getMessage.contains("1062"))
    // plain insert still rejects out-of-vocabulary ENUM values
    intercept[IllegalArgumentException] {
      engine.query("insert into pk_t values (3, 'invalid')")
    }
    // IGNORE: existing-dup and later-in-batch-dup rows skip; invalid
    // ENUM truncates to '' (MySQL warning semantics)
    val n = engine.query(
      "insert ignore into pk_t values (1, 'bye'), (4, 'invalid'), " +
      "(5, 'bye'), (5, 'hello')").collect()(0).getLong(0)
    assert(n == 2)
    assert(rows("select pk, v from pk_t order by pk") ==
      Seq(Seq(1, "hello"), Seq(4, ""), Seq(5, "bye")))
    engine.query("drop table pk_t")
  }

  test("UNIQUE keys: 1062 with NULL exemption; IGNORE; ADD UNIQUE validates " +
      "(index_queries.go unique shapes)") {
    engine.runScript(
      """create table uq_t (pk int primary key, email varchar(40) unique,
        |  a int, b int, unique key ab_key (a, b));
        |insert into uq_t values (1, 'x@y.z', 1, 1);
        |""".stripMargin)
    // single-column unique: duplicate errors with the key name
    val e1 = intercept[IllegalArgumentException] {
      engine.query("insert into uq_t values (2, 'x@y.z', 2, 2)")
    }
    assert(e1.getMessage.contains("1062") && e1.getMessage.contains("email"))
    // composite unique
    assert(intercept[IllegalArgumentException] {
      engine.query("insert into uq_t values (2, 'a@b.c', 1, 1)")
    }.getMessage.contains("ab_key"))
    // NULLs are exempt: several NULL-keyed rows coexist
    engine.query("insert into uq_t values (2, null, null, 9)")
    engine.query("insert into uq_t values (3, null, null, 9)")
    assert(rows("select count(*) n from uq_t") == Seq(Seq(3L)))
    // INSERT IGNORE skips the unique-violating row only
    val n = engine.query(
      "insert ignore into uq_t values (4, 'x@y.z', 5, 5), (5, 'n@w.v', 6, 6)")
      .collect()(0).getLong(0)
    assert(n == 1)
    // ADD UNIQUE validates existing rows (a=null rows exempt; dup on b=9
    // is two rows -> fails)
    assert(intercept[IllegalArgumentException] {
      engine.query("alter table uq_t add unique key b_key (b)")
    }.getMessage.contains("1062"))
    // and a clean one passes, then enforces
    engine.query("create unique index pk2 on uq_t (pk)")
    // SHOW CREATE TABLE renders the declared constraint surface
    val ddl = engine.showCreateTable("uq_t")
    assert(ddl.contains("PRIMARY KEY (`pk`)"))
    assert(ddl.contains("UNIQUE KEY `ab_key` (`a`,`b`)"))
    engine.query("drop table uq_t")
  }

  test("foreign keys: 1452/1451, CASCADE, SET NULL, ALTER/DROP guards " +
      "(foreign_key_queries.go shapes)") {
    engine.runScript(
      """create table fk_parent (pk int primary key, v int);
        |create table fk_child (id int primary key, fk int,
        |  constraint fk_cp foreign key (fk) references fk_parent (pk) on delete cascade);
        |insert into fk_parent values (1, 10), (2, 20), (3, 30);
        |insert into fk_child values (100, 1), (101, 1), (102, 2), (103, null);
        |""".stripMargin)
    // child insert with a missing parent key: error 1452
    val e1452 = intercept[IllegalArgumentException] {
      engine.query("insert into fk_child values (104, 9)")
    }
    assert(e1452.getMessage.contains("1452"))
    // a NULL FK is exempt from the constraint
    engine.query("insert into fk_child values (105, null)")
    // ON DELETE CASCADE removes the referencing children
    engine.query("delete from fk_parent where pk = 1")
    assert(rows("select id from fk_child order by id") ==
      Seq(Seq(102), Seq(103), Seq(105)))
    // RESTRICT (the default): blocking delete, update, drop, truncate
    engine.runScript(
      """create table fk_child_r (id int primary key, fk int,
        |  foreign key (fk) references fk_parent (pk));
        |insert into fk_child_r values (1, 2);
        |""".stripMargin)
    assert(intercept[IllegalArgumentException] {
      engine.query("delete from fk_parent where pk = 2")
    }.getMessage.contains("1451"))
    assert(intercept[IllegalArgumentException] {
      engine.query("update fk_parent set pk = 99 where pk = 2")
    }.getMessage.contains("1451"))
    assert(intercept[IllegalArgumentException] {
      engine.query("update fk_child_r set fk = 42")
    }.getMessage.contains("1452"))
    assert(intercept[IllegalArgumentException] {
      engine.query("drop table fk_parent")
    }.getMessage.contains("3730"))
    assert(intercept[IllegalArgumentException] {
      engine.query("truncate table fk_parent")
    }.getMessage.contains("1701"))
    // ON DELETE SET NULL nulls the orphaned FK columns
    engine.runScript(
      """create table fk_child_sn (id int primary key, fk int,
        |  foreign key (fk) references fk_parent (pk) on delete set null);
        |insert into fk_child_sn values (7, 3);
        |""".stripMargin)
    engine.query("delete from fk_parent where pk = 3")
    assert(rows("select fk from fk_child_sn where id = 7") == Seq(Seq(null)))
    // ALTER ADD FOREIGN KEY validates existing rows before registering
    assert(intercept[IllegalArgumentException] {
      engine.query(
        "alter table fk_child_r add foreign key (id) references fk_parent (pk)")
    }.getMessage.contains("1452"))
    // DROP FOREIGN KEY removes enforcement (auto-named child_ibfk_1)
    engine.query("alter table fk_child_r drop foreign key fk_child_r_ibfk_1")
    engine.query("delete from fk_parent where pk = 2") // cascades into fk_child
    assert(rows("select count(*) n from fk_child where fk is not null") ==
      Seq(Seq(0L)))
    engine.query("drop table fk_child")
    engine.query("drop table fk_child_r")
    engine.query("drop table fk_child_sn")
    engine.query("drop table fk_parent")
  }

  test("ENUM orders by member index, SET by bitmask; numeric inserts are " +
      "member indexes; member defs trim trailing spaces (enum.go Compare/" +
      "Convert:83, set.go Compare:79)") {
    engine.runScript(
      """create table shirts2 (id int, size enum('x-small','small','medium','large','x-large'));
        |insert into shirts2 values (1,'medium'), (2,'x-small'), (3,'x-large'), (4,'small');
        |""".stripMargin)
    // index order (x-small=1 … x-large=5), not lexical
    assert(rows("select size from shirts2 order by size") ==
      Seq(Seq("x-small"), Seq("small"), Seq("medium"), Seq("x-large")))
    assert(rows("select size from shirts2 order by size desc limit 2") ==
      Seq(Seq("x-large"), Seq("medium")))
    // range comparison by index: medium(3) > small(2), lexically it is not
    assert(rows("select id from shirts2 where size > 'small' order by id") ==
      Seq(Seq(1), Seq(3)))
    // a numeric value is the 1-based member index (enum.go Convert)
    engine.query("insert into shirts2 values (5, 2)")
    assert(rows("select size from shirts2 where id = 5") == Seq(Seq("small")))
    assert(intercept[IllegalArgumentException] {
      engine.query("insert into shirts2 values (6, 500)")
    }.getMessage.contains("Data truncated"))
    engine.query("drop table shirts2")
    // SET sorts by bitmask: ''=0, a=1, a,b=3, c=4, b,c=6
    engine.runScript(
      """create table souq (id int, s set('a','b','c'));
        |insert into souq values (1,'c'), (2,'a,b'), (3,'a'), (4,'b,c'), (5,'');
        |""".stripMargin)
    assert(rows("select id from souq order by s, id") ==
      Seq(Seq(5), Seq(3), Seq(2), Seq(1), Seq(4)))
    engine.query("drop table souq")
    // trailing spaces are deleted from member values at declaration
    // (script_queries.go enumtest2: enum('x ','X ','y','Y') -> x,X,y,Y)
    engine.query("create table etrim (pk int, e enum('x ', 'y'))")
    engine.query("insert into etrim values (1, 'x')")
    assert(rows("select e from etrim") == Seq(Seq("x")))
    // metadata surfaces render the declared (trimmed) vocabulary
    // (script_queries.go enum SHOW CREATE TABLE / DESCRIBE expectations)
    assert(engine.showCreateTable("etrim").contains("`e` enum('x','y')"))
    assert(rows("describe etrim").map(r => (r(0), r(1))) ==
      Seq(("pk", "int"), ("e", "enum('x','y')")))
    engine.query("drop table etrim")
    // PAD attribute surfaces in SHOW COLLATION; comparison itself is
    // NO PAD for every collation, like the reference's
    // StringType.Compare (strings.go:279 — no trailing-space trim)
    assert(rows("SHOW COLLATION LIKE 'utf8mb4_0900_ai_ci'")
      .head.last == "NO PAD")
    assert(rows("SHOW COLLATION LIKE 'utf8mb4_general_ci'")
      .head.last == "PAD SPACE")
  }

  test("trailing-space comparison is NO PAD, matching the reference's " +
      "StringType.Compare (sql/types/strings.go:279): 'a' and 'a ' are " +
      "distinct in equality, GROUP BY and DISTINCT") {
    engine.runScript(
      """create table padt (id int, v varchar(10));
        |insert into padt values (1, 'a'), (2, 'a '), (3, 'a');
        |""".stripMargin)
    // MySQL's legacy PAD SPACE collations would compare 'a' = 'a ' TRUE;
    // the reference (and this engine) compare NO PAD — pinned here as the
    // agreed behavior, not a divergence from the spec we implement
    assert(rows("select count(*) c from padt where v = 'a'") == Seq(Seq(2L)))
    assert(rows("select count(distinct v) c from padt") == Seq(Seq(2L)))
    assert(rows("select v, count(*) c from padt group by v order by c") ==
      Seq(Seq("a ", 1L), Seq("a", 2L)))
    // shorter strings sort before longer on the shared prefix
    assert(rows("select v from padt order by v, id limit 2") ==
      Seq(Seq("a"), Seq("a")))
    engine.query("drop table padt")
  }

  test("INSERT IGNORE keeps MySQL's first-row-wins under a combined FK " +
      "filter + duplicate key (sequence pinned before the skip filters)") {
    engine.runScript(
      """create table ii_p (pk int primary key);
        |create table ii_c (id int primary key, fk int,
        |  foreign key (fk) references ii_p (pk));
        |insert into ii_p values (1);
        |""".stripMargin)
    // batch has an FK-exempt NULL row AND a duplicate key: the FIRST row
    // of the statement (id=1, fk=1) must win, not the NULL-fk row the
    // FK filter's union reorders to the front
    val n = engine.query(
      "insert ignore into ii_c values (1, 1), (1, NULL)").collect()(0).getLong(0)
    assert(n == 1)
    assert(rows("select id, fk from ii_c") == Seq(Seq(1, 1)))
    engine.runScript("drop table ii_c; drop table ii_p;")
  }

  test("ON UPDATE CASCADE walks the FK graph with the old->new key mapping " +
      "(foreign_key_queries.go 'SQL CASCADE')") {
    engine.runScript(
      """CREATE TABLE one (pk BIGINT PRIMARY KEY, v1 BIGINT, v2 BIGINT, INDEX v1 (v1));
        |CREATE TABLE two (pk BIGINT PRIMARY KEY, v1 BIGINT, v2 BIGINT, INDEX v1v2 (v1, v2),
        |  CONSTRAINT fk_name_1 FOREIGN KEY (v1) REFERENCES one(v1) ON DELETE CASCADE ON UPDATE CASCADE);
        |CREATE TABLE three (pk BIGINT PRIMARY KEY, v1 BIGINT, v2 BIGINT,
        |  CONSTRAINT fk_name_2 FOREIGN KEY (v1, v2) REFERENCES two(v1, v2) ON DELETE CASCADE ON UPDATE CASCADE);
        |INSERT INTO one VALUES (1, 1, 4), (2, 2, 5), (3, 3, 6), (4, 4, 5);
        |INSERT INTO two VALUES (2, 1, 1), (3, 2, 2), (4, 3, 3), (5, 4, 4);
        |INSERT INTO three VALUES (3, 1, 1), (4, 2, 2), (5, 3, 3), (6, 4, 4);
        |UPDATE one SET v1 = v1 + v2;
        |DELETE one FROM one WHERE pk = 3;
        |UPDATE two SET v2 = v1 - 2;
        |""".stripMargin)
    assert(rows("SELECT * FROM one ORDER BY pk") ==
      Seq(Seq(1L, 5L, 4L), Seq(2L, 7L, 5L), Seq(4L, 9L, 5L)))
    // the row-triggered cascade: deleting one's pk=3 (v1=9) also removes
    // two's v1=9 rows even though one STILL holds a v1=9 row (pk=4)
    assert(rows("SELECT * FROM two ORDER BY pk") ==
      Seq(Seq(2L, 5L, 3L), Seq(3L, 7L, 5L)))
    assert(rows("SELECT * FROM three ORDER BY pk") ==
      Seq(Seq(3L, 5L, 3L), Seq(4L, 7L, 5L)))
    engine.runScript(
      "drop table three; drop table two; drop table one;")
  }

  test("ON UPDATE SET NULL nulls the children of every changed key " +
      "(foreign_key_queries.go 'SQL SET NULL')") {
    engine.runScript(
      """CREATE TABLE one (pk BIGINT PRIMARY KEY, v1 BIGINT, v2 BIGINT, INDEX v1 (v1));
        |CREATE TABLE two (pk BIGINT PRIMARY KEY, v1 BIGINT, v2 BIGINT,
        |  CONSTRAINT fk_name_1 FOREIGN KEY (v1) REFERENCES one(v1) ON DELETE SET NULL ON UPDATE SET NULL);
        |INSERT INTO one VALUES (1, 1, 1), (2, 2, 2), (3, 3, 3);
        |INSERT INTO two VALUES (1, 1, 1), (2, 2, 2), (3, 3, 3);
        |UPDATE one SET v1 = v1 * v2;
        |INSERT INTO one VALUES (4, 4, 4);
        |INSERT INTO two VALUES (4, 4, 4);
        |UPDATE one SET v2 = v1 * v2;
        |""".stripMargin)
    assert(rows("SELECT * FROM one ORDER BY pk") ==
      Seq(Seq(1L, 1L, 1L), Seq(2L, 4L, 8L), Seq(3L, 9L, 27L), Seq(4L, 4L, 16L)))
    assert(rows("SELECT * FROM two ORDER BY pk") ==
      Seq(Seq(1L, 1L, 1L), Seq(2L, null, 2L), Seq(3L, null, 3L), Seq(4L, 4L, 4L)))
    // multi-table DELETE fires ON DELETE SET NULL too
    assert(rows("DELETE one FROM one inner join two on one.pk=two.pk") ==
      Seq(Seq(4L)))
    assert(rows("select * from two ORDER BY pk") ==
      Seq(Seq(1L, null, 1L), Seq(2L, null, 2L), Seq(3L, null, 3L), Seq(4L, null, 4L)))
    engine.runScript("drop table two; drop table one;")
  }

  test("ON UPDATE RESTRICT blocks only key-changing updates " +
      "(foreign_key_queries.go 'SQL RESTRICT')") {
    engine.runScript(
      """CREATE TABLE one (pk BIGINT PRIMARY KEY, v1 BIGINT, v2 BIGINT, INDEX v1 (v1));
        |CREATE TABLE two (pk BIGINT PRIMARY KEY, v1 BIGINT, v2 BIGINT,
        |  CONSTRAINT fk_name_1 FOREIGN KEY (v1) REFERENCES one(v1) ON DELETE RESTRICT ON UPDATE RESTRICT);
        |INSERT INTO one VALUES (1, 1, 1), (2, 2, 2), (3, 3, 3);
        |INSERT INTO two VALUES (1, 1, 1), (2, 2, 2), (3, 3, 3);
        |""".stripMargin)
    assert(intercept[IllegalArgumentException] {
      engine.query("UPDATE one SET v1 = v1 + v2")
    }.getMessage.contains("1451"))
    // a no-op assignment never fires the action
    engine.query("UPDATE one SET v1 = v1")
    assert(intercept[IllegalArgumentException] {
      engine.query("DELETE FROM one")
    }.getMessage.contains("1451"))
    assert(intercept[IllegalArgumentException] {
      engine.query("DELETE one FROM one inner join two on one.pk=two.pk")
    }.getMessage.contains("1451"))
    engine.runScript("drop table two; drop table one;")
  }

  test("self-referential FK: deletes resolve against survivors; ON UPDATE " +
      "CASCADE acts like RESTRICT (foreign_key_queries.go self-referential blocks)") {
    // a reference CHAIN deleted together never errors under RESTRICT, and
    // CASCADE removes the transitive children of the deleted row
    engine.runScript(
      """CREATE TABLE selfr (id BIGINT PRIMARY KEY, ref BIGINT,
        |  CONSTRAINT fk_self FOREIGN KEY (ref) REFERENCES selfr(id) ON DELETE RESTRICT);
        |INSERT INTO selfr VALUES (1, NULL), (2, 1), (3, 2);
        |""".stripMargin)
    // deleting the whole chain together: no survivor references a deleted
    // key -> no spurious 1451
    engine.query("DELETE FROM selfr WHERE id >= 1")
    assert(rows("SELECT count(*) c FROM selfr") == Seq(Seq(0L)))
    engine.query("drop table selfr")
    // but a survivor referencing a deleted row blocks
    engine.runScript(
      """CREATE TABLE selfr2 (id BIGINT PRIMARY KEY, ref BIGINT,
        |  CONSTRAINT fk_self2 FOREIGN KEY (ref) REFERENCES selfr2(id) ON DELETE RESTRICT);
        |INSERT INTO selfr2 VALUES (1, NULL), (2, 1);
        |""".stripMargin)
    assert(intercept[IllegalArgumentException] {
      engine.query("DELETE FROM selfr2 WHERE id = 1")
    }.getMessage.contains("1451"))
    engine.query("drop table selfr2")
    // self-CASCADE removes the whole transitive chain below the deleted row
    engine.runScript(
      """CREATE TABLE selfc (id BIGINT PRIMARY KEY, ref BIGINT,
        |  CONSTRAINT fk_selfc FOREIGN KEY (ref) REFERENCES selfc(id) ON DELETE CASCADE);
        |INSERT INTO selfc VALUES (1, NULL), (2, 1), (3, 2), (4, 3), (10, NULL), (11, 10);
        |""".stripMargin)
    engine.query("DELETE FROM selfc WHERE id = 2")
    assert(rows("SELECT id FROM selfc ORDER BY id") ==
      Seq(Seq(1L), Seq(10L), Seq(11L)))
    engine.query("drop table selfc")
    // self-FK ON UPDATE CASCADE stops (InnoDB restrict behavior):
    // 'Self-referential child column follows parent CASCADE'
    engine.runScript(
      """CREATE TABLE selfu (id BIGINT PRIMARY KEY, v1 BIGINT, v2 BIGINT, INDEX v1 (v1),
        |  CONSTRAINT fk_named FOREIGN KEY (v2) REFERENCES selfu(v1) ON UPDATE CASCADE ON DELETE CASCADE);
        |INSERT INTO selfu VALUES (1, 1, 1), (2, 2, 1), (3, 3, NULL);
        |""".stripMargin)
    engine.query("UPDATE selfu SET v1 = 1 WHERE id = 1") // no-op change: ok
    engine.query("UPDATE selfu SET v1 = 4 WHERE id = 3") // unreferenced key: ok
    engine.query("DELETE FROM selfu WHERE id = 3")
    assert(intercept[IllegalArgumentException] {
      engine.query("UPDATE selfu SET v1 = 2") // v2=1 rows reference changed key 1
    }.getMessage.contains("1451"))
    assert(rows("SELECT * FROM selfu ORDER BY id") ==
      Seq(Seq(1L, 1L, 1L), Seq(2L, 2L, 1L)))
    // REPLACE's delete phase fires the self-CASCADE: replacing BOTH
    // rows leaves no survivor to cascade, the batch re-references its
    // own keys ('Self-referential child column follows parent CASCADE')
    engine.query("REPLACE INTO selfu VALUES (1, 1, 1), (2, 2, 2)")
    assert(rows("SELECT * FROM selfu ORDER BY id") ==
      Seq(Seq(1L, 1L, 1L), Seq(2L, 2L, 2L)))
    engine.query("drop table selfu")
    // ...and under RESTRICT a replaced key a survivor references is 1451
    // even though the key is about to be re-inserted
    // ('Self-referential child column follows parent RESTRICT')
    engine.runScript(
      """CREATE TABLE selfrr (id BIGINT PRIMARY KEY, v1 BIGINT, v2 BIGINT, INDEX v1 (v1),
        |  CONSTRAINT fk_r FOREIGN KEY (v2) REFERENCES selfrr(v1));
        |INSERT INTO selfrr VALUES (1, 1, 1), (2, 2, 1);
        |""".stripMargin)
    assert(intercept[IllegalArgumentException] {
      engine.query("REPLACE INTO selfrr VALUES (1, 1, 1)")
    }.getMessage.contains("1451"))
    engine.query("drop table selfrr")
  }

  test("UPDATE IGNORE skips key-colliding rows in visit order; plain " +
      "UPDATE errors 1062 on a collision (update_queries.go " +
      "UpdateIgnoreTests/UpdateIgnoreScripts)") {
    engine.runScript(
      """create table uig (i bigint primary key, s text);
        |insert into uig values (1, 'first row'), (2, 'second row'), (3, 'third row');
        |""".stripMargin)
    // a plain UPDATE that collides is error 1062
    assert(intercept[IllegalArgumentException] {
      engine.query("UPDATE uig SET i = 2 where i = 1")
    }.getMessage.contains("1062"))
    // IGNORE: the colliding row keeps its old values, affected = matched
    assert(rows("UPDATE IGNORE uig SET i = 2 where i = 1") == Seq(Seq(1L)))
    assert(rows("SELECT * FROM uig order by i") ==
      Seq(Seq(1L, "first row"), Seq(2L, "second row"), Seq(3L, "third row")))
    assert(rows("UPDATE IGNORE uig SET i = i+1 where i = 1") == Seq(Seq(1L)))
    assert(rows("SELECT * FROM uig order by i") ==
      Seq(Seq(1L, "first row"), Seq(2L, "second row"), Seq(3L, "third row")))
    engine.query("drop table uig")
    // composite primary key: rows visit in key order, so 1->2 and 2->3
    // collide with the NEXT row's still-old key, 3->4 applies
    engine.runScript(
      """create table pkt (pk int, val int, primary key(pk, val));
        |insert into pkt values (1, 1), (2, 2), (3, 3);
        |""".stripMargin)
    assert(rows("UPDATE IGNORE pkt set pk = pk + 1, val = val + 1") ==
      Seq(Seq(3L)))
    assert(rows("SELECT * FROM pkt order by pk") ==
      Seq(Seq(1, 1), Seq(2, 2), Seq(4, 4)))
    assert(rows("UPDATE IGNORE pkt set val = val + 1 where pk = 2") ==
      Seq(Seq(1L)))
    assert(rows("SELECT * FROM pkt order by pk") ==
      Seq(Seq(1, 1), Seq(2, 3), Seq(4, 4)))
    engine.query("drop table pkt")
    // UNIQUE key: same skip discipline
    engine.runScript(
      """create table idxt (pk int primary key, val int unique);
        |insert into idxt values (1, 1), (2, 2), (3, 3);
        |""".stripMargin)
    assert(rows("UPDATE IGNORE idxt set val = val + 1") == Seq(Seq(3L)))
    assert(rows("SELECT * FROM idxt order by pk") ==
      Seq(Seq(1, 1), Seq(2, 2), Seq(3, 4)))
    // two constraints at once: pk AND unique val both checked
    assert(rows("UPDATE IGNORE idxt set pk = pk + 1, val = val + 1") ==
      Seq(Seq(3L)))
    assert(rows("SELECT * FROM idxt order by pk") ==
      Seq(Seq(1, 1), Seq(2, 2), Seq(4, 5)))
    engine.query("drop table idxt")
  }

  test("UPDATE JOIN respects FK constraints atomically " +
      "(update_queries.go UpdateScriptTests FK blocks)") {
    engine.runScript(
      """CREATE TABLE ujcustomers (id INT PRIMARY KEY, name TEXT);
        |CREATE TABLE ujorders (id INT PRIMARY KEY, customer_id INT, amount INT,
        |  FOREIGN KEY (customer_id) REFERENCES ujcustomers(id));
        |INSERT INTO ujcustomers VALUES (1, 'Alice'), (2, 'Bob');
        |INSERT INTO ujorders VALUES (101, 1, 50), (102, 2, 75);
        |""".stripMargin)
    assert(intercept[IllegalArgumentException] {
      engine.query("UPDATE ujorders o JOIN ujcustomers c ON o.customer_id = c.id " +
        "SET o.customer_id = 123 where o.customer_id != 1")
    }.getMessage.contains("1452"))
    assert(rows("SELECT * FROM ujorders ORDER BY id") ==
      Seq(Seq(101, 1, 50), Seq(102, 2, 75)))
    // multi-target: EITHER failing target must leave BOTH untouched
    engine.runScript(
      """CREATE TABLE ujp1 (id INT PRIMARY KEY);
        |CREATE TABLE ujp2 (id INT PRIMARY KEY);
        |CREATE TABLE ujc1 (id INT PRIMARY KEY, p1_id INT,
        |  FOREIGN KEY (p1_id) REFERENCES ujp1(id));
        |CREATE TABLE ujc2 (id INT PRIMARY KEY, p2_id INT,
        |  FOREIGN KEY (p2_id) REFERENCES ujp2(id));
        |INSERT INTO ujp1 VALUES (1), (3);
        |INSERT INTO ujp2 VALUES (1), (3);
        |INSERT INTO ujc1 VALUES (10, 1);
        |INSERT INTO ujc2 VALUES (20, 1);
        |""".stripMargin)
    assert(intercept[IllegalArgumentException] {
      engine.query("UPDATE ujc1 c1 JOIN ujc2 c2 ON c1.id = 10 AND c2.id = 20 " +
        "SET c1.p1_id = 999, c2.p2_id = 3")
    }.getMessage.contains("1452"))
    assert(intercept[IllegalArgumentException] {
      engine.query("UPDATE ujc1 c1 JOIN ujc2 c2 ON c1.id = 10 AND c2.id = 20 " +
        "SET c1.p1_id = 3, c2.p2_id = 999")
    }.getMessage.contains("1452"))
    assert(rows("SELECT * FROM ujc1") == Seq(Seq(10, 1)))
    assert(rows("SELECT * FROM ujc2") == Seq(Seq(20, 1)))
    // and a valid multi-target update lands on both
    engine.query("UPDATE ujc1 c1 JOIN ujc2 c2 ON c1.id = 10 AND c2.id = 20 " +
      "SET c1.p1_id = 3, c2.p2_id = 3")
    assert(rows("SELECT * FROM ujc1") == Seq(Seq(10, 3)))
    assert(rows("SELECT * FROM ujc2") == Seq(Seq(20, 3)))
    engine.runScript(
      "drop table ujc1; drop table ujc2; drop table ujp1; drop table ujp2; " +
      "drop table ujorders; drop table ujcustomers;")
  }

  test("CREATE/DROP INDEX, ANALYZE TABLE, SHOW TABLE STATUS (index_queries.go, " +
      "show_table_status_queries.go shapes)") {
    engine.runScript(
      """create table idx_t (pk int primary key, v1 int, v2 text);
        |insert into idx_t values (1, 10, 'x'), (2, 20, 'y');
        |""".stripMargin)
    engine.query("create index v1_idx on idx_t (v1)")
    engine.query("create unique index v_pair on idx_t (v1, v2)")
    val idx = engine.query("show index from idx_t").collect()
      .map(r => (r.getString(2), r.getInt(3), r.getString(4))).toSeq
    assert(idx.contains(("PRIMARY", 1, "pk")))
    assert(idx.contains(("v1_idx", 1, "v1")))
    assert(idx.contains(("v_pair", 2, "v2")))
    engine.query("drop index v1_idx on idx_t")
    assert(!engine.query("show index from idx_t").collect()
      .exists(_.getString(2) == "v1_idx"))
    val an = engine.query("analyze table idx_t").collect()(0)
    assert(an.getString(0) == "idx_t" && an.getString(3) == "OK")
    val st = engine.query("show table status like 'idx_t'").collect()
    assert(st.length == 1 && st(0).getString(0) == "idx_t")
    engine.query("drop table idx_t")
  }

  test("SHOW COLLATION / SHOW CHARACTER SET (show.go over collations.go)") {
    val colls = engine.query("SHOW COLLATION").collect()
    assert(colls.length > 30)
    assert(colls.exists(r => r.getString(0) == "utf8mb4_0900_ai_ci" &&
      r.getString(3) == "Yes"))
    // full MySQL catalog: the ja collations are as_cs and as_cs_ks
    // (collations.go — there is no utf8mb4_ja_0900_ai_ci in MySQL)
    val ja = engine.query("SHOW COLLATION LIKE 'utf8mb4_ja%'").collect()
    assert(ja.map(_.getString(0)).toSet ==
      Set("utf8mb4_ja_0900_as_cs", "utf8mb4_ja_0900_as_cs_ks"))
    val cs = engine.query("SHOW CHARACTER SET").collect()
    assert(cs.map(_.getString(0)).toSet ==
      Set("utf8mb4", "latin1", "ascii", "binary"))
    assert(engine.query("SHOW CHARSET LIKE 'utf8%'").collect().length == 1)
    // information_schema view reflects the same catalog
    engine.enableInformationSchema()
    assert(engine.query(
      "SELECT count(*) n FROM information_schema_collations").collect()(0)
      .getLong(0).toInt == colls.length)
  }

  test("CHECK corpus edge shapes: keyword-named column, violating ADD " +
      "throws and registers nothing, NOT ENFORCED admits violations " +
      "(check_scripts.go:296,330,363)") {
    // keyword column through backticks
    engine.query(
      "create table ckw (`order` int primary key, constraint chk check (`order` > 0))")
    assert(intercept[Exception] {
      engine.query("insert into ckw values (0)")
    }.getMessage.toLowerCase.contains("check"))
    engine.query("insert into ckw values (100)")
    assert(engine.query("select * from ckw").collect()(0).getInt(0) == 100)
    engine.query("drop table ckw")
    // ADD CONSTRAINT that existing rows violate: error, nothing kept
    engine.runScript(
      """create table cbad (pk int);
        |insert into cbad values (1),(2),(300);
        |""".stripMargin)
    assert(intercept[Exception] {
      engine.query("ALTER TABLE cbad ADD CONSTRAINT bad_check CHECK (pk < 5)")
    }.getMessage.contains("3819"))
    engine.query("insert into cbad values (400)") // not enforced: add failed
    engine.query("drop table cbad")
    // NOT ENFORCED checks never validate writes
    engine.runScript(
      """create table cne (a int primary key, b int);
        |ALTER TABLE cne ADD CONSTRAINT chk1 CHECK (a > 0);
        |ALTER TABLE cne ADD CONSTRAINT chk2 CHECK (b > 0) NOT ENFORCED;
        |""".stripMargin)
    engine.query("insert into cne values (1, -5)") // violates chk2 only
    assert(engine.query("select * from cne").collect().length == 1)
    assert(intercept[Exception] {
      engine.query("insert into cne values (-1, 5)")
    }.getMessage.toLowerCase.contains("check"))
    engine.query("drop table cne")
  }

  test("ai_ci ENUM/SET columns match members case-insensitively and " +
      "store the DECLARED spelling; bin-collated columns stay " +
      "case-sensitive (enum.go:86 collation.HashToUint)") {
    engine.runScript(
      """create table cienum (pk int primary key,
        |  v enum('abc','XYZ') collate utf8mb4_0900_ai_ci,
        |  s set('a','B') collate utf8mb4_0900_ai_ci);
        |insert into cienum values (1, 'ABC', 'A,b');
        |insert into cienum values (2, 'xyz', 'b');
        |""".stripMargin)
    assert(rows("select * from cienum order by pk") ==
      Seq(Seq(1, "abc", "a,B"), Seq(2, "XYZ", "B")))
    // UPDATE maps through the same member lookup
    engine.query("update cienum set v = 'Abc' where pk = 2")
    assert(rows("select v from cienum where pk = 2") == Seq(Seq("abc")))
    // non-member still rejects with 1265 even case-insensitively
    assert(intercept[Exception] {
      engine.query("insert into cienum values (3, 'nope', 'a')")
    }.getMessage.contains("truncated"))
    engine.query("drop table cienum")
    // default collation (reference utf8mb4_0900_bin) stays sensitive
    engine.runScript(
      """create table csenum (pk int primary key, v enum('abc'));
        |""".stripMargin)
    assert(intercept[Exception] {
      engine.query("insert into csenum values (1, 'ABC')")
    }.getMessage.contains("truncated"))
    engine.query("drop table csenum")
  }

  test("multi-action ALTER in one statement (alter_table_queries.go:76)") {
    engine.runScript(
      """CREATE TABLE t32 (pk BIGINT PRIMARY KEY, v1 int, v2 int, v3 int default (v1), toRename int);
        |alter table t32 add column v4 int after pk, drop column v2, modify v1 varchar(100) not null, alter column v3 set default 100, rename column toRename to newName;
        |CREATE TABLE t32_2 (pk BIGINT PRIMARY KEY, v1 int, v2 int, v3 int);
        |alter table t32_2 drop v1, add v1 int;
        |CREATE TABLE t32_3 (pk BIGINT PRIMARY KEY, v1 int, v2 int, v3 int);
        |alter table t32_3 rename column v1 to v5, add v1 int;""".stripMargin)
    val cols = rows("SHOW FULL COLUMNS FROM t32")
    assert(cols.map(_.head) == Seq("pk", "v4", "v1", "v3", "newName"))
    // SET DEFAULT landed: the v3 row carries '100'
    assert(cols.find(_.head == "v3").get(5) == "100")
    // varchar column reports its collation in the FULL form
    assert(cols.find(_.head == "v1").get(2) == "utf8mb4_0900_bin")
    assert(cols.find(_.head == "pk").get(2) == null)
    assert(rows("SHOW FULL COLUMNS FROM t32_2").map(_.head) ==
      Seq("pk", "v2", "v3", "v1"))
    assert(rows("SHOW FULL COLUMNS FROM t32_3").map(_.head) ==
      Seq("pk", "v5", "v2", "v3", "v1"))
    // the new default applies on insert
    engine.query("insert into t32 (pk, v1) values (1, 'x')")
    assert(rows("select v3 from t32") == Seq(Seq(100)))
    // actions resolve against the statement-start schema
    assert(intercept[Exception] {
      engine.query("alter table t32 add column vnew int, drop column vnew")
    }.getMessage.contains("1054"))
    assert(intercept[Exception] {
      engine.query("alter table t32 rename column v3 to v9, drop column v9")
    }.getMessage.contains("1054"))
    assert(intercept[Exception] {
      engine.query("alter table t32 rename column v3 to v9, drop column v3")
    }.getMessage.contains("1054"))
    engine.runScript("drop table t32; drop table t32_2; drop table t32_3")
  }

  test("DROP COLUMN vs CHECK constraints (alter_table_queries.go:209-330)") {
    // single-column checks drop with the column
    engine.runScript(
      """create table t42c (i bigint primary key, s varchar(20));
        |ALTER TABLE t42c ADD COLUMN j int;
        |ALTER TABLE t42c ADD CONSTRAINT check1 CHECK (j < 12345);
        |ALTER TABLE t42c ADD CONSTRAINT check2 CHECK (j > 0);
        |ALTER TABLE t42c DROP COLUMN j;""".stripMargin)
    assert(!engine.checkConstraints.exists(_._1 == "t42c"))
    // only the dropped column's checks go; siblings stay
    engine.runScript(
      """create table t41c (i bigint primary key, s varchar(20));
        |ALTER TABLE t41c ADD COLUMN j int;
        |ALTER TABLE t41c ADD COLUMN k int;
        |ALTER TABLE t41c ADD CONSTRAINT j_check CHECK (j < 12345);
        |ALTER TABLE t41c ADD CONSTRAINT k_check CHECK (k < 123);
        |ALTER TABLE t41c DROP COLUMN j;""".stripMargin)
    assert(engine.checkConstraints.collect {
      case (t, n, _, _) if t == "t41c" => n
    } == Seq("k_check"))
    // a multi-column check blocks the drop (MySQL 3959)
    engine.runScript(
      """create table t43c (i bigint primary key, j int, k int);
        |ALTER TABLE t43c ADD CONSTRAINT test_check CHECK (j < k);""".stripMargin)
    assert(intercept[Exception] {
      engine.query("alter table t43c drop column j")
    }.getMessage.contains("3959"))
    // the constraint and the column both survive the failed drop
    assert(engine.checkConstraints.exists(c =>
      c._1 == "t43c" && c._2 == "test_check"))
    assert(engine.query("select * from t43c").columns.contains("j"))
    // drop check as part of an alter block
    engine.runScript(
      """create table t42d (i bigint primary key, j int, CONSTRAINT check1 CHECK (j < 12345), CONSTRAINT check2 CHECK (j > 0));
        |ALTER TABLE t42d ADD COLUMN s varchar(20), drop check check1;""".stripMargin)
    assert(engine.checkConstraints.collect {
      case (t, n, _, _) if t == "t42d" => n
    } == Seq("check2"))
    engine.runScript(
      "drop table t42c; drop table t41c; drop table t43c; drop table t42d")
  }

  test("auto_increment counter semantics (insert_queries.go:1037-1130)") {
    // explicit NULL generates; counter survives deletes
    engine.runScript(
      """create table auto_d (pk int primary key auto_increment);
        |insert into auto_d values (10);
        |delete from auto_d where pk = 10;
        |insert into auto_d values (NULL);""".stripMargin)
    assert(rows("select * from auto_d order by 1") == Seq(Seq(11)))
    // out-of-line PK def + NULL placeholders assign 1,2,3
    engine.runScript(
      """create table auto_o (pk int auto_increment, c0 int, primary key(pk));
        |insert into auto_o values (NULL,10), (NULL,20), (NULL,30);""".stripMargin)
    assert(rows("select * from auto_o order by 1") ==
      Seq(Seq(1, 10), Seq(2, 20), Seq(3, 30)))
    // ALTER ... AUTO_INCREMENT = n moves the counter forward (never back)
    engine.query("alter table auto_o auto_increment 9")
    engine.query("insert into auto_o values (NULL,90)")
    assert(rows("select * from auto_o order by 1") ==
      Seq(Seq(1, 10), Seq(2, 20), Seq(3, 30), Seq(9, 90)))
    engine.query("alter table auto_o auto_increment = 2") // below max: no-op
    engine.query("insert into auto_o values (NULL,100)")
    assert(rows("select pk from auto_o order by 1 desc limit 1") == Seq(Seq(10)))
    // float values truncate (insert_queries.go:1107)
    engine.query("alter table auto_o auto_increment = 19.9")
    engine.query("insert into auto_o values (NULL,190)")
    assert(rows("select pk from auto_o order by 1 desc limit 1") == Seq(Seq(19)))
    // zero triggers generation by default...
    engine.runScript(
      """create table auto_z (pk int primary key auto_increment, v int);
        |insert into auto_z values (0, 1);""".stripMargin)
    assert(rows("select * from auto_z") == Seq(Seq(1, 1)))
    // ...but NOT under NO_AUTO_VALUE_ON_ZERO (sql_mode.go)
    val s2 = spark.newSession()
    val e2 = new Engine(s2)
    e2.runScript(
      """set sql_mode = 'NO_AUTO_VALUE_ON_ZERO';
        |create table auto_nz (pk int primary key auto_increment, v int);
        |insert into auto_nz values (0, 1);
        |insert into auto_nz values (NULL, 2);""".stripMargin)
    assert(e2.query("select * from auto_nz order by pk").collect()
      .map(r => (r.getInt(0), r.getInt(1))).toSeq == Seq((0, 1), (1, 2)))
    e2.query("drop table auto_nz")
    // TRUNCATE resets the counter
    engine.query("truncate table auto_z")
    engine.query("insert into auto_z values (NULL, 5)")
    assert(rows("select * from auto_z") == Seq(Seq(1, 5)))
    engine.runScript("drop table auto_d; drop table auto_o; drop table auto_z")
  }

  test("LAST_INSERT_ID / ROW_COUNT session state (session.go lastQueryInfo)") {
    val s2 = spark.newSession()
    val e2 = new Engine(s2)
    def one(sql: String): Long =
      e2.query(sql).collect()(0).getLong(0)
    e2.runScript(
      """create table lii (pk int primary key auto_increment, v int);
        |insert into lii (v) values (10), (20);""".stripMargin)
    assert(one("select last_insert_id()") == 1L) // first id of the batch
    e2.query("insert into lii (v) values (30)")
    assert(one("select last_insert_id()") == 3L)
    // a non-generating insert leaves the value untouched
    e2.query("insert into lii values (100, 40)")
    assert(one("select last_insert_id()") == 3L)
    // ROW_COUNT reflects the last DML's affected rows
    e2.query("update lii set v = v + 1 where pk <= 3")
    assert(one("select row_count()") == 3L)
    e2.query("drop table lii")
  }

  test("ALTER COLUMN SET/DROP DEFAULT lifecycle (alter_table_queries.go:181)") {
    engine.runScript(
      """CREATE TABLE tad (pk int primary key, v1 int default 5);
        |INSERT INTO tad (pk) VALUES (1);
        |ALTER TABLE tad ALTER COLUMN v1 SET DEFAULT 9;
        |INSERT INTO tad (pk) VALUES (2);
        |ALTER TABLE tad ALTER v1 DROP DEFAULT;
        |INSERT INTO tad (pk) VALUES (3);""".stripMargin)
    assert(rows("select pk, v1 from tad order by pk") ==
      Seq(Seq(1, 5), Seq(2, 9), Seq(3, null)))
    engine.query("drop table tad")
  }

  test("auto-increment corner scripts (insert_queries.go:937-1310): " +
      "sparse seeds, negatives don't advance, empty-tuple inserts, " +
      "UNIQUE/index counters, ALTER AUTO_INCREMENT, typed counters, " +
      "NO_AUTO_VALUE_ON_ZERO with mixed tuples") {
    def rs(sql: String): Seq[Seq[Any]] =
      engine.query(sql).collect()
        .map(r => (0 until r.length).map(r.get).toSeq).toSeq
    // sparse: counter follows the max seen
    engine.runScript(
      """create table aic (pk int primary key auto_increment);
        |insert into aic values (10), (20), (30);
        |insert into aic values (NULL);
        |insert into aic values (40);
        |insert into aic values (0);
        |""".stripMargin)
    assert(rs("select * from aic order by 1") ==
      Seq(Seq(10), Seq(20), Seq(30), Seq(31), Seq(40), Seq(41)))
    engine.query("drop table aic")
    // negative values never advance the counter; `()` rows generate
    engine.runScript(
      """create table aic (pk int primary key auto_increment);
        |insert into aic values (10), (20), (30);
        |insert into aic values (-1), (-2), (-3);
        |insert into aic () values ();
        |insert into aic values (0), (0), (0);
        |""".stripMargin)
    assert(rs("select * from aic order by 1") ==
      Seq(Seq(-3), Seq(-2), Seq(-1), Seq(10), Seq(20), Seq(30),
        Seq(31), Seq(32), Seq(33), Seq(34)))
    engine.query("drop table aic")
    // auto-inc on a UNIQUE non-PK column / an indexed column
    engine.runScript(
      """create table aic (pk int primary key, npk int unique auto_increment);
        |insert into aic (pk) values (10), (20), (30);
        |""".stripMargin)
    assert(rs("select * from aic order by 1") ==
      Seq(Seq(10, 1), Seq(20, 2), Seq(30, 3)))
    engine.query("drop table aic")
    engine.runScript(
      """create table aicnp (i int auto_increment, index(i));
        |insert into aicnp (i) values (0), (0), (0);
        |""".stripMargin)
    assert(rs("select * from aicnp order by 1") ==
      Seq(Seq(1), Seq(2), Seq(3)))
    engine.query("drop table aicnp")
    // ALTER TABLE ... AUTO_INCREMENT n (and a float value truncating);
    // the counter surfaces through information_schema.tables
    engine.runScript(
      """create table aic (pk int auto_increment, c0 int, primary key(pk));
        |insert into aic values (NULL,10), (NULL,20), (NULL,30);
        |alter table aic auto_increment 9;
        |""".stripMargin)
    engine.enableInformationSchema()
    assert(rs("SELECT AUTO_INCREMENT FROM information_schema.tables " +
        "WHERE table_name = 'aic'") == Seq(Seq(9L)))
    engine.query("insert into aic values (NULL,90)")
    assert(rs("select * from aic order by 1") ==
      Seq(Seq(1, 10), Seq(2, 20), Seq(3, 30), Seq(9, 90)))
    engine.query("drop table aic")
    engine.runScript(
      """create table aic (pk int auto_increment, c0 int, primary key(pk));
        |insert into aic values (NULL,10), (NULL,20), (NULL,30);
        |alter table aic auto_increment = 19.9;
        |insert into aic values (NULL,190);
        |""".stripMargin)
    assert(rs("select * from aic order by 1") ==
      Seq(Seq(1, 10), Seq(2, 20), Seq(3, 30), Seq(19, 190)))
    engine.query("drop table aic")
    // typed counter: tinyint
    engine.runScript(
      """create table aict (pk tinyint primary key auto_increment);
        |insert into aict values (NULL),(10),(0);
        |""".stripMargin)
    assert(rs("select * from aict order by 1") ==
      Seq(Seq(1.toByte), Seq(10.toByte), Seq(11.toByte)))
    engine.query("drop table aict")
    // NO_AUTO_VALUE_ON_ZERO: zeros store as zeros; NULL and `()` rows
    // still generate (mixed-tuple statement)
    engine.query("SET sql_mode = 'NO_AUTO_VALUE_ON_ZERO'")
    engine.runScript(
      """create table aicz (i int auto_increment, index (i));
        |create table aicz_pk (i int auto_increment primary key);
        |insert into aicz values (0), (0), (1-1);
        |""".stripMargin)
    assert(rs("select * from aicz order by i") ==
      Seq(Seq(0), Seq(0), Seq(0)))
    engine.query("insert into aicz values (1)")
    engine.query("insert into aicz_pk values (0), (1), (NULL), ()")
    assert(rs("select * from aicz_pk order by i") ==
      Seq(Seq(0), Seq(1), Seq(2), Seq(3)))
    engine.query(
      "SET sql_mode = 'NO_ENGINE_SUBSTITUTION,ONLY_FULL_GROUP_BY,STRICT_TRANS_TABLES'")
    engine.runScript("drop table aicz; drop table aicz_pk;")
  }

  test("CREATE over an existing name is MySQL 1050; IF NOT EXISTS " +
      "no-ops; a live table's declared metadata survives the rejected " +
      "statement (ddl.go ErrTableAlreadyExists)") {
    engine.runScript(
      """CREATE TABLE dup1050 (pk int primary key, v varchar(5));
        |INSERT INTO dup1050 VALUES (1, 'a');
        |""".stripMargin)
    assert(intercept[IllegalArgumentException] {
      engine.query("CREATE TABLE dup1050 (x int)")
    }.getMessage.contains("1050"))
    // the failed CREATE must NOT have wiped the live table's metadata:
    // the PK still dups 1062, the varchar limit still enforces 1406
    assert(intercept[IllegalArgumentException] {
      engine.query("INSERT INTO dup1050 VALUES (1, 'b')")
    }.getMessage.contains("1062"))
    assert(intercept[IllegalArgumentException] {
      engine.query("INSERT INTO dup1050 VALUES (2, 'toolong')")
    }.getMessage.contains("1406"))
    // IF NOT EXISTS: silent no-op, data intact
    engine.query("CREATE TABLE IF NOT EXISTS dup1050 (x int)")
    assert(rows("SELECT * FROM dup1050") == Seq(Seq(1, "a")))
    engine.query("CREATE TABLE IF NOT EXISTS dup1050 LIKE dup1050")
    assert(rows("SELECT * FROM dup1050") == Seq(Seq(1, "a")))
    // CTAS over an existing name rejects too
    assert(intercept[IllegalArgumentException] {
      engine.query("CREATE TABLE dup1050 AS SELECT 1 AS a")
    }.getMessage.contains("1050"))
    // a view under the name blocks CREATE TABLE as well
    engine.query("CREATE VIEW dupv1050 AS SELECT 1 AS a")
    assert(intercept[IllegalArgumentException] {
      engine.query("CREATE TABLE dupv1050 (x int)")
    }.getMessage.contains("1050"))
    engine.runScript("drop view dupv1050; drop table dup1050;")
  }

  test("CREATE TEMPORARY TABLE shadows an existing base table instead " +
      "of 1050; DROP reveals the base again (ddl.go buildCreateTable " +
      "temp-table path)") {
    engine.runScript(
      """CREATE TABLE shad (pk int primary key, v varchar(10));
        |INSERT INTO shad VALUES (1, 'base');
        |""".stripMargin)
    // same name, different schema — no 1050 for TEMPORARY
    engine.query("CREATE TEMPORARY TABLE shad (x int)")
    engine.query("INSERT INTO shad VALUES (42)")
    assert(rows("SELECT * FROM shad") == Seq(Seq(42)))
    // DROP removes the temp table and un-shadows the base
    engine.query("DROP TABLE shad")
    assert(rows("SELECT * FROM shad") == Seq(Seq(1, "base")))
    // temp CTAS over an existing name also shadows
    engine.query("CREATE TEMPORARY TABLE shad AS SELECT 9 AS n")
    assert(rows("SELECT * FROM shad") == Seq(Seq(9)))
    engine.query("DROP TABLE shad")
    assert(rows("SELECT * FROM shad") == Seq(Seq(1, "base")))
    // plain temp create/drop over a fresh name leaves nothing behind
    engine.query("CREATE TEMPORARY TABLE tmponly (a int)")
    engine.query("DROP TABLE tmponly")
    assert(intercept[Exception] {
      engine.query("SELECT * FROM tmponly").collect()
    }.getMessage.toLowerCase.contains("tmponly"))
    engine.query("DROP TABLE shad")
  }

  test("failed multi-action ALTER rolls back ALL declared metadata, " +
      "not just char limits (advice: rename/key/default state must " +
      "match the rolled-back data)") {
    engine.runScript(
      """CREATE TABLE arb (pk int primary key, v1 varchar(5), v2 int not null default 7);
        |INSERT INTO arb VALUES (1, 'a', 2);
        |""".stripMargin)
    // RENAME COLUMN succeeds as action 1, then DROP of a never-existing
    // column fails the statement -> everything must roll back
    assert(intercept[Exception] {
      engine.query("ALTER TABLE arb RENAME COLUMN v1 TO vnew, DROP COLUMN nope")
    }.getMessage.nonEmpty)
    // data side kept the old name
    assert(rows("SELECT pk, v1, v2 FROM arb") == Seq(Seq(1, "a", 2)))
    // declared side did too: the char limit still lives under v1
    assert(intercept[IllegalArgumentException] {
      engine.query("INSERT INTO arb VALUES (2, 'toolong', 3)")
    }.getMessage.contains("1406"))
    // the PK and the v2 default survived
    assert(intercept[IllegalArgumentException] {
      engine.query("INSERT INTO arb VALUES (1, 'b', 3)")
    }.getMessage.contains("1062"))
    engine.query("INSERT INTO arb (pk, v1) VALUES (3, 'c')")
    assert(rows("SELECT v2 FROM arb WHERE pk = 3") == Seq(Seq(7)))
    engine.query("drop table arb")
  }

  test("RENAME COLUMN carries CHECK expressions, FK column lists, and " +
      "generated columns to the new name (MySQL rename semantics)") {
    engine.runScript(
      """CREATE TABLE rparent (id int primary key);
        |INSERT INTO rparent VALUES (1), (2);
        |CREATE TABLE rchild (pk int primary key, ref int,
        |  amt int, CHECK (amt > 0),
        |  FOREIGN KEY (ref) REFERENCES rparent (id));
        |INSERT INTO rchild VALUES (1, 1, 5);
        |""".stripMargin)
    // rename the CHECKed column: the constraint follows
    engine.query("ALTER TABLE rchild RENAME COLUMN amt TO amount")
    assert(intercept[Exception] {
      engine.query("INSERT INTO rchild VALUES (2, 2, -1)")
    }.getMessage.toLowerCase.contains("check"))
    engine.query("INSERT INTO rchild VALUES (2, 2, 9)")
    // rename the FK child column: enforcement still resolves
    engine.query("ALTER TABLE rchild RENAME COLUMN ref TO parent_id")
    assert(intercept[Exception] {
      engine.query("INSERT INTO rchild VALUES (3, 99, 1)")
    }.getMessage.contains("1452"))
    // rename the FK PARENT column: the parent role follows too
    engine.query("ALTER TABLE rparent RENAME COLUMN id TO pid")
    assert(intercept[Exception] {
      engine.query("INSERT INTO rchild VALUES (4, 98, 1)")
    }.getMessage.contains("1452"))
    engine.query("INSERT INTO rchild VALUES (5, 2, 3)")
    // generated column expression follows a source-column rename
    engine.runScript(
      """CREATE TABLE rgen (pk int primary key, a int, b int GENERATED ALWAYS AS (a * 2) STORED);
        |INSERT INTO rgen (pk, a) VALUES (1, 4);
        |""".stripMargin)
    engine.query("ALTER TABLE rgen RENAME COLUMN a TO base")
    engine.query("INSERT INTO rgen (pk, base) VALUES (2, 6)")
    assert(rows("SELECT pk, base, b FROM rgen ORDER BY pk") ==
      Seq(Seq(1, 4, 8), Seq(2, 6, 12)))
    engine.runScript("drop table rgen; drop table rchild; drop table rparent;")
  }

  test("REPLACE under non-strict sql_mode coerces NULL-into-NOT-NULL " +
      "to the implicit default with 1048, like INSERT (sql_mode strict " +
      "gating, rowexec ignore paths)") {
    engine.runScript(
      """CREATE TABLE rns (pk int primary key, v int NOT NULL);
        |INSERT INTO rns VALUES (1, 5);
        |""".stripMargin)
    // strict: REPLACE with NULL errors 1048
    assert(intercept[IllegalArgumentException] {
      engine.query("REPLACE INTO rns VALUES (1, NULL)")
    }.getMessage.contains("1048"))
    // non-strict: coerces to the type zero with a warning
    engine.query("SET sql_mode = ''")
    engine.query("REPLACE INTO rns VALUES (1, NULL)")
    val w = engine.query("SHOW WARNINGS").collect()
    assert(w.exists(_.getInt(1) == 1048))
    assert(rows("SELECT * FROM rns") == Seq(Seq(1, 0)))
    engine.query("SET sql_mode = 'STRICT_TRANS_TABLES'")
    engine.query("drop table rns")
  }

  test("SHOW TABLE STATUS clause surface: LIKE, WHERE, FROM db " +
      "(show_table_status_queries.go)") {
    engine.runScript(
      """create table stat_t1 (pk int primary key auto_increment);
        |insert into stat_t1 values (NULL), (NULL);
        |""".stripMargin)
    val like = engine.query("SHOW TABLE STATUS LIKE 'stat_%'").collect()
    assert(like.map(_.getString(0)).toSeq == Seq("stat_t1"))
    val where = engine.query("SHOW TABLE STATUS WHERE Name = 'stat_t1'")
      .collect()
    assert(where.length == 1 && where(0).getString(0) == "stat_t1")
    // Auto_increment surfaces the counter
    assert(where(0).getAs[Long]("Auto_increment") == 3L)
    assert(engine.query("SHOW TABLE STATUS WHERE Name = 'nope'")
      .collect().isEmpty)
    engine.query("drop table stat_t1")
  }

  test("row-size limit counts DECIMAL as min(precision,30) and ENUM as " +
      "2 bytes (memory/table.go maxRowStorageSize)") {
    // 16350 * 4-byte chars = 65400; a DECIMAL(30,5) adds 30 -> 65430 ok;
    // with a second one at 65460 ok; VARCHAR(16384)*4 = 65536 alone busts
    engine.query(
      "CREATE TABLE rsz1 (a varchar(16350), d decimal(30,5), e enum('x','y'))")
    engine.query("drop table rsz1")
    assert(intercept[IllegalArgumentException] {
      engine.query("CREATE TABLE rsz2 (a varchar(16350), b varchar(50))")
    }.getMessage.contains("1118"))
    // DECIMAL near the cap: 46 DECIMAL(30,0) columns = 1380 bytes; the
    // varchar budget shrinks accordingly
    assert(intercept[IllegalArgumentException] {
      engine.query("CREATE TABLE rsz3 (a varchar(16350), " +
        (1 to 46).map(i => s"d$i decimal(30,0)").mkString(", ") + ")")
    }.getMessage.contains("1118"))
    engine.query("SELECT 1")
  }
}
