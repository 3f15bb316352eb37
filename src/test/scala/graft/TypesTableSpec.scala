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
      """SELECT column_name, data_type FROM information_schema_columns
         WHERE table_name = 'region' ORDER BY ordinal_position""")
      .collect().map(r => (r.getString(0), r.getString(1)))
    assert(cols.toSeq == Seq(("r_regionkey", "int"), ("r_name", "string")))
    assert(e.query(
      "SELECT count(*) FROM information_schema_tables").collect()(0).getLong(0) >= 10)
  }
}
