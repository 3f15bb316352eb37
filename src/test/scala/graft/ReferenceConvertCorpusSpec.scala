package graft

import org.scalatest.funsuite.AnyFunSuite

/** TestConvert port (enginetest/enginetests.go:1760 over
  * convert_queries.go ConvertTests): comparisons of every numeric
  * column type against out-of-range integer literals, non-numeric
  * string literals, and a DATE value, over the typestable fixture
  * (setup_data one non-null row). MySQL saturates/coerces the operand
  * to the column type; the expected counts pin that semantics. */
class ReferenceConvertCorpusSpec extends AnyFunSuite {
  import SparkSpec.spark

  private lazy val engine = new Engine(spark)

  private def fixture(): Unit = {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types._
    val schema = StructType(Seq(
      StructField("id", LongType, nullable = false),
      StructField("i8", ByteType), StructField("i16", ShortType),
      StructField("i32", IntegerType), StructField("i64", LongType),
      StructField("u8", ShortType), StructField("u16", IntegerType),
      StructField("u32", LongType), StructField("u64", DecimalType(20, 0)),
      StructField("f32", FloatType), StructField("f64", DoubleType)))
    val rows = Seq(Row(1L, 1.toByte, 2.toShort, 3, 4L, 5.toShort, 6, 7L,
      new java.math.BigDecimal("8"), 9.5f, 10.5))
    spark.createDataFrame(spark.sparkContext.parallelize(rows), schema)
      .createOrReplaceTempView("typestable_cv")
  }

  private val fields = Seq("i8", "i16", "i32", "i64", "u8", "u16", "u32",
    "u64", "f32", "f64")

  private def cnt(pred: String): Long =
    engine.query(s"select count(*) from typestable_cv where $pred")
      .collect()(0).getLong(0)

  test("out-of-range huge literals saturate: = 0, <= 1, >= 0 for " +
      "positive; mirrored for negative (convert_queries.go)") {
    fixture()
    val pos = "3720481604718463778705849469618542795"
    val neg = "-3720481604718463778705849469618542795"
    fields.foreach { f =>
      assert(cnt(s"$f = $pos") == 0, s"$f = pos")
      assert(cnt(s"$f <= $pos") == 1, s"$f <= pos")
      assert(cnt(s"$f >= $pos") == 0, s"$f >= pos")
      assert(cnt(s"$f <> $pos") == 1, s"$f <> pos")
      assert(cnt(s"$f != $pos") == 1, s"$f != pos")
      assert(cnt(s"$f = $neg") == 0, s"$f = neg")
      assert(cnt(s"$f <= $neg") == 0, s"$f <= neg")
      assert(cnt(s"$f >= $neg") == 1, s"$f >= neg")
      assert(cnt(s"$f <> $neg") == 1, s"$f <> neg")
      assert(cnt(s"$f != $neg") == 1, s"$f != neg")
    }
  }

  test("non-numeric string operand coerces to 0 (convert_queries.go " +
      "'string' block)") {
    fixture()
    fields.foreach { f =>
      assert(cnt(s"$f = 'string'") == 0, s"$f = str")
      assert(cnt(s"$f <= 'string'") == 0, s"$f <= str")
      assert(cnt(s"$f >= 'string'") == 1, s"$f >= str")
      assert(cnt(s"$f <> 'string'") == 1, s"$f <> str")
      assert(cnt(s"$f != 'string'") == 1, s"$f != str")
    }
  }

  test("DATE operand compares numerically as yyyymmdd " +
      "(convert_queries.go STR_TO_DATE block)") {
    fixture()
    fields.foreach { f =>
      assert(cnt(s"$f = STR_TO_DATE('21,5,2013','%d,%m,%Y')") == 0, s"$f = dt")
      assert(cnt(s"$f <= STR_TO_DATE('21,5,2013','%d,%m,%Y')") == 1, s"$f <= dt")
      assert(cnt(s"$f >= STR_TO_DATE('21,5,2013','%d,%m,%Y')") == 0, s"$f >= dt")
      assert(cnt(s"$f <> STR_TO_DATE('21,5,2013','%d,%m,%Y')") == 1, s"$f <> dt")
    }
  }
}
