package graft

import graft.functions.MySqlFormat
import graft.plans.RecursiveCte
import org.scalatest.funsuite.AnyFunSuite

class MySqlFormatSpec extends AnyFunSuite {
  test("basic specifier translation") {
    assert(MySqlFormat.toJavaPattern("%Y-%m-%d") == "yyyy'-'MM'-'dd")
    assert(MySqlFormat.toJavaPattern("%d/%m/%Y %H:%i") == "dd'/'MM'/'yyyy' 'HH':'mm")
    assert(MySqlFormat.toJavaPattern("%H:%i:%s") == "HH':'mm':'ss")
  }
  test("literal text is quoted so pattern letters stay literal") {
    assert(MySqlFormat.toJavaPattern("year %Y") == "'year 'yyyy")
  }
  test("unsupported specifier raises") {
    intercept[IllegalArgumentException](MySqlFormat.toJavaPattern("%Q"))
  }
  test("formats through Spark end-to-end") {
    import SparkSpec.spark
    import org.apache.spark.sql.functions._
    val got = spark.range(1)
      .select(MySqlFormat.dateFormat(
        lit("1996-03-13 14:07:09").cast("timestamp"), "%Y/%m/%d %H:%i:%s"))
      .collect()(0).getString(0)
    assert(got == "1996/03/13 14:07:09")
  }
}

class RecursiveCteSpec extends AnyFunSuite {
  import SparkSpec.spark
  import org.apache.spark.sql.functions._
  import spark.implicits._

  test("unionAll accumulates until step is empty") {
    val out = RecursiveCte.unionAll(
      Seq(1).toDF("n"), p => p.select((col("n") + 1).as("n")).filter(col("n") <= 5))
    assert(out.orderBy("n").collect().map(_.getInt(0)).toSeq == (1 to 5))
  }

  test("unionDistinct terminates on cycles") {
    // step maps n -> (n+1) mod 3: cycles forever under UNION ALL semantics,
    // terminates under UNION DISTINCT (the reference's default)
    val out = RecursiveCte.unionDistinct(
      Seq(0).toDF("n"), p => p.select(((col("n") + 1) % 3).as("n")), maxDepth = 50)
    assert(out.orderBy("n").collect().map(_.getInt(0)).toSeq == Seq(0, 1, 2))
  }

  test("maxDepth errors on runaway recursion (reference cteRecursionLimit)") {
    // the reference errors past its cycle limit (sql/rowexec/
    // rel_iters.go:642 ErrCteRecursionLimitExceeded) instead of
    // silently truncating
    val e = intercept[IllegalStateException] {
      RecursiveCte.unionAll(
        Seq(1L).toDF("n"), p => p.select((col("n") + 1).as("n")),
        maxDepth = 7).count()
    }
    assert(e.getMessage.contains("iteration limit"))
  }

  test("maxDepth does not fire on recursion that converges at the limit") {
    val out = RecursiveCte.unionAll(
      Seq(1L).toDF("n"),
      p => p.select((col("n") + 1).as("n")).filter(col("n") <= 7),
      maxDepth = 7)
    assert(out.count() == 7)
  }
}

class DetSpec extends AnyFunSuite {
  test("decimal-sum determinism: permutation + partitioning invariant") {
    import SparkSpec.spark
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val rnd = new scala.util.Random(42)
    val xs = List.fill(500)(rnd.nextInt(1000000) / 100.0)
    val sums = Seq(
      (xs, 1), (xs.reverse, 7), (rnd.shuffle(xs), 3), (rnd.shuffle(xs), 13)
    ).map { case (data, parts) =>
      data.toDF("x").repartition(parts).agg(Det.dsum(col("x")))
        .collect()(0).getDouble(0)
    }
    assert(sums.distinct.size == 1, s"non-deterministic sums: $sums")
  }
}
