package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** Type-layer conformance over the reference's `typestable` fixture
  * (FIXTURES.md; setup_data.sg.go:3907 — one column per supported MySQL
  * type) using the SURVEY §1.2 mapping, including the cases that need
  * care: UNSIGNED BIGINT -> DECIMAL(20,0), TIME -> day-time interval
  * semantics via seconds, ENUM/SET -> validated string / bitmask. */
class TypesTableSpec extends AnyFunSuite {
  import SparkSpec.spark

  /** SURVEY §1.2 mapping of the typestable DDL. */
  private val schema = StructType(Seq(
    StructField("id", LongType, nullable = false),
    StructField("i8", ByteType), StructField("i16", ShortType),
    StructField("i32", IntegerType), StructField("i64", LongType),
    StructField("u8", ShortType), StructField("u16", IntegerType),
    StructField("u32", LongType),
    StructField("u64", DecimalType(20, 0)), // exceeds Long range
    StructField("f32", FloatType), StructField("f64", DoubleType),
    StructField("ti", TimestampType), StructField("da", DateType),
    StructField("te", StringType), StructField("bo", ByteType),
    StructField("js", StringType),       // JSON as string + json fn family
    StructField("bl", BinaryType),
    StructField("e1", StringType),       // ENUM('','v1','v2') validated
    StructField("s1", LongType)))        // SET bitmask

  private val rows = Seq(
    Row(1L, 1.toByte, 2.toShort, 3, 4L, 5.toShort, 6, 7L,
      new java.math.BigDecimal("18446744073709551615"),
      1.5f, 2.5, java.sql.Timestamp.valueOf("2024-06-01 12:00:00"),
      java.sql.Date.valueOf("2024-06-01"), "text", 1.toByte,
      """{"a":1}""", Array[Byte](1, 2), "v1", 3L),
    Row(2L, null, null, null, null, null, null, null, null, null, null,
      null, null, null, null, null, null, null, null))

  test("typestable schema maps per SURVEY §1.2 and survives parquet") {
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(rows), schema)
    val dir = java.nio.file.Files.createTempDirectory("graft_types").toString
    df.write.mode("overwrite").parquet(dir)
    val back = spark.read.parquet(dir)
    assert(back.schema.fields.map(f => (f.name, f.dataType)).toSeq ==
      schema.fields.map(f => (f.name, f.dataType)).toSeq)
    assert(back.count() == 2)
    val r1 = back.filter(org.apache.spark.sql.functions.col("id") === 1L)
      .collect()(0)
    // u64 holds the full unsigned-bigint max exactly
    assert(r1.getDecimal(r1.fieldIndex("u64")).toPlainString
      == "18446744073709551615")
  }

  test("ENUM validation and SET render over the mapped columns") {
    import org.apache.spark.sql.functions._
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(rows), schema)
    val enumIdx = graft.functions.expressions.field(
      col("e1"), lit(""), lit("v1"), lit("v2"))
    val out = df.filter(col("id") === 1L).select(
      enumIdx.as("idx"),
      graft.functions.expressions.makeSet(col("s1"), lit(""), lit("v1"),
        lit("v2")).as("set_render")).collect()(0)
    assert(out.getInt(0) == 2)          // 'v1' is member 2 of the enum
    assert(out.getString(1) == ",v1")   // bits 1|2 -> '' and 'v1'
  }

  test("information_schema views reflect the catalog") {
    val e = new Engine(spark)
    e.attachDir(SparkSpec.sfDir)
    e.enableInformationSchema()
    val cols = e.query(
      """SELECT column_name, data_type, column_type, is_nullable
         FROM information_schema_columns
         WHERE table_name = 'region' ORDER BY ordinal_position""")
      .collect().map(r => (r.getString(0), r.getString(1), r.getString(2), r.getString(3)))
    // DATA_TYPE is the bare MySQL type keyword (columns_table.go):
    // an undeclared parquet string reports text, not Spark's "string"
    assert(cols.toSeq == Seq(
      ("r_regionkey", "int", "int", "YES"),
      ("r_name", "text", "text", "YES")))
    assert(e.query(
      "SELECT count(*) FROM information_schema_tables").collect()(0).getLong(0) >= 10)
    // MySQL-shaped metadata joins: columns per table via tables
    val joined = e.query(
      """SELECT t.table_name, count(*) AS n_cols
         FROM information_schema_tables t
         JOIN information_schema_columns c ON t.table_name = c.table_name
         WHERE t.table_name IN ('region', 'nation')
         GROUP BY t.table_name ORDER BY t.table_name""")
      .collect().map(r => (r.getString(0), r.getLong(1)))
    assert(joined.toSeq == Seq(("nation", 3L), ("region", 2L)))
  }

  test("information_schema breadth: schemata/collations/engines/routines/statistics") {
    val e = new Engine(spark)
    e.attachDir(SparkSpec.sfDir)
    e.enableInformationSchema()
    // reference schemata_table.go: schema default is utf8mb4_0900_bin
    assert(e.query(
      """SELECT default_collation_name FROM information_schema_schemata
         WHERE schema_name != 'information_schema' LIMIT 1""")
      .collect()(0).getString(0) == "utf8mb4_0900_bin")
    assert(e.query(
      """SELECT collation_name FROM information_schema_collations
         WHERE is_default = 'Yes' AND character_set_name = 'utf8mb4'""")
      .collect()(0).getString(0) == "utf8mb4_0900_ai_ci")
    assert(e.query("SELECT maxlen FROM information_schema_character_sets")
      .collect()(0).getInt(0) == 4)
    assert(e.query("SELECT engine FROM information_schema_engines")
      .collect()(0).getString(0) == "InnoDB")
    // registered graft functions appear as routines
    val routines = e.query(
      """SELECT routine_name FROM information_schema_routines
         WHERE routine_name IN ('json_extract', 'st_intersects', 'ai_ci_fold')""")
      .collect().map(_.getString(0)).toSet
    assert(routines == Set("json_extract", "st_intersects", "ai_ci_fold"))
    // index views are present with MySQL shapes (and honestly empty
    // when nothing is declared)
    assert(e.query("SELECT count(*) FROM information_schema_statistics")
      .collect()(0).getLong(0) == 0)
    assert(e.query("SELECT count(*) FROM information_schema_key_column_usage")
      .collect()(0).getLong(0) == 0)
  }

  test("statistics / key_column_usage reflect declared keys, indexes, FKs") {
    val e = new Engine(spark)
    e.runScript(
      """create table kcu_p (pk int primary key, v int unique);
        |create table kcu_c (id int primary key, fk int,
        |  constraint fk_kcu foreign key (fk) references kcu_p (pk));
        |alter table kcu_c add index idx_fk (fk);""".stripMargin)
    e.enableInformationSchema()
    val stats = e.query(
      """SELECT table_name, non_unique, index_name, column_name
         FROM information_schema_statistics
         WHERE table_name LIKE 'kcu_%' ORDER BY table_name, index_name""")
      .collect().map(r => (r.getString(0), r.getInt(1), r.getString(2),
        r.getString(3))).toSeq
    assert(stats.contains(("kcu_p", 0, "PRIMARY", "pk")))
    assert(stats.contains(("kcu_p", 0, "v", "v")))
    assert(stats.contains(("kcu_c", 1, "idx_fk", "fk")))
    val kcu = e.query(
      """SELECT constraint_name, table_name, column_name,
           referenced_table_name, referenced_column_name
         FROM information_schema_key_column_usage
         WHERE table_name LIKE 'kcu_%'""")
      .collect().map(r => (r.getString(0), r.getString(1), r.getString(2),
        r.getString(3), r.getString(4))).toSeq
    assert(kcu.contains(("PRIMARY", "kcu_p", "pk", null, null)))
    assert(kcu.contains(("fk_kcu", "kcu_c", "fk", "kcu_p", "pk")))
    e.runScript("drop table kcu_c; drop table kcu_p")
  }

  test("information_schema constraint views reflect declared metadata") {
    val e = new Engine(spark)
    e.runScript(
      """create table tc_p (pk int primary key, v int, check (v > 0));
        |create table tc_c (id int primary key, fk int,
        |  constraint fk_tc foreign key (fk) references tc_p (pk) on delete cascade);
        |""".stripMargin)
    e.enableInformationSchema()
    val tc = e.query(
      """SELECT constraint_name, table_name, constraint_type
         FROM information_schema_table_constraints ORDER BY constraint_type""")
      .collect().map(r => (r.getString(0), r.getString(1), r.getString(2)))
    assert(tc.exists(t => t._2 == "tc_p" && t._3 == "PRIMARY KEY"))
    assert(tc.exists(t => t._2 == "tc_p" && t._3 == "CHECK"))
    assert(tc.contains(("fk_tc", "tc_c", "FOREIGN KEY")))
    val rc = e.query(
      """SELECT constraint_name, table_name, referenced_table_name, delete_rule
         FROM information_schema_referential_constraints""").collect()
    assert(rc.length == 1 && rc(0).getString(2) == "tc_p" &&
      rc(0).getString(3) == "CASCADE")
    // MySQL's check_constraints has no table_name column; the clause
    // renders fully parenthesized with backticked identifiers
    val cc = e.query(
      """SELECT check_clause FROM information_schema_check_constraints
         WHERE constraint_name LIKE 'tc_p_chk%'""").collect()
    assert(cc.length == 1 && cc(0).getString(0) == "(`v` > 0)")
    e.query("drop table tc_c")
    e.query("drop table tc_p")
  }

  test("information_schema.views + SHOW GRANTS") {
    val e = new Engine(spark)
    e.attachDir(SparkSpec.sfDir)
    e.query("create view isv_demo as select r_regionkey from region")
    e.enableInformationSchema()
    val v = e.query(
      """SELECT view_definition FROM information_schema_views
         WHERE table_name = 'isv_demo'""").collect()
    assert(v.length == 1 && v(0).getString(0).contains("from region"))
    val g = e.query("SHOW GRANTS").collect()
    assert(g.length == 1 && g(0).getString(0).startsWith("GRANT ALL"))
    e.query("drop view isv_demo")
  }

  test("SHOW COLUMNS / SHOW INDEX shapes") {
    val e = new Engine(spark)
    e.attachDir(SparkSpec.sfDir)
    val cols = e.showColumns("region")
    assert(cols.map(c => (c._1, c._2, c._3)) ==
      Seq(("r_regionkey", "int", "YES"), ("r_name", "text", "YES")))
    assert(e.showIndex("region").isEmpty)
    intercept[Exception](e.showIndex("no_such_table"))
  }

  test("SHOW TABLES / SHOW COLUMNS filters (information_schema_queries.go:182-264)") {
    val e = new Engine(spark)
    e.runScript(
      """create table show_t1 (i bigint primary key, s varchar(20));
        |create view show_v1 as select i from show_t1;""".stripMargin)
    // MySQL single-column shape, LIKE and WHERE filters
    val st = e.query("SHOW TABLES").collect()
    assert(st.head.schema.fieldNames.head.startsWith("Tables_in_"))
    val names = st.map(_.getString(0)).toSeq
    assert(names.contains("show_t1") && names.contains("show_v1"))
    assert(e.query("SHOW TABLES LIKE 'show_%'").collect()
      .map(_.getString(0)).toSeq.sorted == Seq("show_t1", "show_v1"))
    val colName = st.head.schema.fieldNames.head
    assert(e.query(s"SHOW TABLES WHERE `$colName` = 'show_t1'").collect()
      .map(_.getString(0)).toSeq == Seq("show_t1"))
    // FULL adds Table_type with views marked
    val ft = e.query("SHOW FULL TABLES").collect()
      .map(r => (r.getString(0), r.getString(1))).toMap
    assert(ft("show_t1") == "BASE TABLE" && ft("show_v1") == "VIEW")
    // SHOW COLUMNS LIKE / WHERE narrow to one field row
    assert(e.query("SHOW COLUMNS FROM show_t1 LIKE 'i'").collect()
      .map(_.getString(0)).toSeq == Seq("i"))
    assert(e.query("SHOW COLUMNS FROM show_t1 WHERE Field = 's'").collect()
      .map(_.getString(0)).toSeq == Seq("s"))
    e.runScript("drop view show_v1; drop table show_t1")
  }

  test("JDBC driver metadata shapes over information_schema " +
      "(information_schema_queries.go:34-77)") {
    val e = new Engine(spark)
    e.runScript(
      """create table jmeta (i int primary key, s varchar(20));
        |create index idx_si on jmeta (s, i);
        |create index jmeta_i_s on jmeta (i, s);
        |""".stripMargin)
    e.enableInformationSchema()
    // the DatabaseMetaData.getTables CASE shape
    val t = e.query(
      """SELECT table_schema AS TABLE_CAT,
           NULL AS TABLE_SCHEM,
           table_name,
           CASE WHEN table_type = 'BASE TABLE' THEN
               CASE WHEN table_schema = 'mysql' OR table_schema = 'performance_schema' THEN 'SYSTEM TABLE'
               ELSE 'TABLE' END
           WHEN table_type = 'TEMPORARY' THEN 'LOCAL_TEMPORARY'
           ELSE table_type END AS TABLE_TYPE
         FROM information_schema.tables WHERE table_name = 'jmeta'""")
      .collect()
    assert(t.length == 1 && t(0).getString(2) == "jmeta" &&
      t(0).getString(3) == "TABLE")
    // the getIndexInfo GROUP_CONCAT shape over statistics
    val idx = e.query(
      """SELECT table_name, index_name, non_unique,
           GROUP_CONCAT(column_name ORDER BY seq_in_index) AS cols
         FROM information_schema.statistics
         WHERE table_name = 'jmeta' AND index_name != 'PRIMARY'
         GROUP BY table_name, index_name, non_unique
         ORDER BY index_name""")
      .collect().map(r => (r.getString(1), r.getString(3)))
    assert(idx.toSeq == Seq(("idx_si", "s,i"), ("jmeta_i_s", "i,s")))
    e.query("drop table jmeta")
  }
}
