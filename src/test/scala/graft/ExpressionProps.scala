package graft

import graft.functions.{expressions => gfx, json => gj}
import org.apache.spark.sql.catalyst.expressions.Literal
import org.apache.spark.unsafe.types.UTF8String
import org.scalacheck.{Gen, Prop, Properties}
import org.scalacheck.Prop.forAll

/** Property-based tests for the custom expression layer (SURVEY §5: the
  * reference has no property testing; we add ScalaCheck for the
  * semantics-bearing custom code). Expressions are evaluated directly via
  * Catalyst Literal/eval — no Spark session, so thousands of cases run in
  * milliseconds. */
object ExpressionProps extends Properties("graft.expressions") {

  private def lit(v: Any): Literal = Literal(v)
  private def s(v: Any): String = v.asInstanceOf[UTF8String].toString

  // ---- inet ------------------------------------------------------------

  property("inet_ntoa . inet_aton = identity on [0, 2^32)") =
    forAll(Gen.chooseNum(0L, 0xFFFFFFFFL)) { n =>
      val ip = gfx.InetNtoa(lit(n)).eval(null)
      gfx.InetAton(Literal(ip, org.apache.spark.sql.types.StringType))
        .eval(null) == n
    }

  property("inet_aton rejects out-of-range octets") =
    forAll(Gen.chooseNum(256, 999)) { bad =>
      gfx.InetAton(lit(UTF8String.fromString(s"1.2.3.$bad"))).eval(null) == null
    }

  // ---- compress --------------------------------------------------------

  private val genText: Gen[String] = Gen.frequency(
    4 -> Gen.asciiPrintableStr,
    1 -> Gen.listOf(Gen.oneOf('é', 'ü', 'ş', '中', 'a', ' '))
      .map(_.mkString))

  property("uncompress . compress = identity") = forAll(genText) { t =>
    val c = gfx.CompressExpr(lit(UTF8String.fromString(t))).eval(null)
    s(gfx.UncompressExpr(Literal(c,
      org.apache.spark.sql.types.BinaryType)).eval(null)) == t
  }

  property("uncompressed_length reads the MySQL header") = forAll(genText) { t =>
    val c = gfx.CompressExpr(lit(UTF8String.fromString(t))).eval(null)
    val n = gfx.UncompressedLength(Literal(c,
      org.apache.spark.sql.types.BinaryType)).eval(null)
    n == UTF8String.fromString(t).numBytes()
  }

  // ---- make_set / export_set / field ----------------------------------

  private val genWords: Gen[List[String]] =
    Gen.listOfN(6, Gen.nonEmptyListOf(Gen.alphaChar).map(_.mkString))

  property("make_set picks exactly the set bits, in order") =
    forAll(Gen.chooseNum(0L, 63L), genWords) { (bits, ws) =>
      val out = s(gfx.MakeSet(lit(bits) +:
        ws.map(w => lit(UTF8String.fromString(w)))).eval(null))
      val expected = ws.zipWithIndex
        .collect { case (w, i) if ((bits >> i) & 1L) == 1L => w }
        .mkString(",")
      out == expected
    }

  property("field returns 1-based index of first match") =
    forAll(genWords, Gen.chooseNum(0, 5)) { (ws, pick) =>
      val target = ws(pick % ws.length)
      val res = gfx.MySqlField((target +: ws)
        .map(w => lit(UTF8String.fromString(w)))).eval(null)
      res == ws.indexOf(target) + 1
    }

  // ---- winnow fingerprint ---------------------------------------------

  private def naiveWinnow(t: String, k: Int): Option[Long] = {
    val M = BigInt((1L << 61) - 1)
    if (t.length < k) None
    else Some(t.sliding(k).map(w =>
      w.foldLeft(BigInt(0))((h, c) => (h * 31 + c.toInt) mod M).toLong).min)
  }

  property("winnowFingerprint equals the naive per-window fold") =
    forAll(Gen.chooseNum(8, 40).flatMap(n =>
      Gen.listOfN(n, Gen.asciiPrintableChar).map(_.mkString))) { t =>
      val got = gfx.WinnowFingerprint(
        lit(UTF8String.fromString(t)), lit(8)).eval(null)
      naiveWinnow(t, 8).contains(got)
    }

  // ---- json ------------------------------------------------------------

  private val genKey: Gen[String] = Gen.nonEmptyListOf(Gen.alphaLowerChar)
    .map(_.take(8).mkString)

  property("json_extract after json_set returns the written value") =
    forAll(genKey, Gen.chooseNum(-1000000, 1000000)) { (k, v) =>
      val doc = UTF8String.fromString("""{"existing":true}""")
      val set = gj.JsonMutate(Seq(lit(doc),
        lit(UTF8String.fromString(s"$$.$k")), lit(v)), 0).eval(null)
      val got = gj.JsonExtractMySql(Seq(
        Literal(set, org.apache.spark.sql.types.StringType),
        lit(UTF8String.fromString(s"$$.$k")))).eval(null)
      s(got) == v.toString
    }

  property("json_remove after json_set restores the original") =
    forAll(genKey.suchThat(_ != "existing"), Gen.chooseNum(0, 99)) { (k, v) =>
      val doc = UTF8String.fromString("""{"existing":true}""")
      val set = gj.JsonMutate(Seq(lit(doc),
        lit(UTF8String.fromString(s"$$.$k")), lit(v)), 0).eval(null)
      val rm = gj.JsonRemove(Seq(
        Literal(set, org.apache.spark.sql.types.StringType),
        lit(UTF8String.fromString(s"$$.$k")))).eval(null)
      s(rm) == """{"existing":true}"""
    }

  property("json_valid accepts everything json_set produces") =
    forAll(genKey, genText) { (k, v) =>
      val set = gj.JsonMutate(Seq(
        lit(UTF8String.fromString("{}")),
        lit(UTF8String.fromString(s"$$.$k")),
        lit(UTF8String.fromString(v))), 0).eval(null)
      gj.JsonValid(Literal(set,
        org.apache.spark.sql.types.StringType)).eval(null) == true
    }

  // ---- spatial ---------------------------------------------------------

  property("st_distance is symmetric and non-negative") =
    forAll(Gen.chooseNum(-100.0, 100.0), Gen.chooseNum(-100.0, 100.0),
           Gen.chooseNum(-100.0, 100.0), Gen.chooseNum(-100.0, 100.0)) {
      (x1, y1, x2, y2) =>
        import graft.functions.spatial
        def pt(x: Double, y: Double) = lit(UTF8String.fromString(s"POINT($x $y)"))
        val d1 = spatial.StDistance(pt(x1, y1), pt(x2, y2)).eval(null)
          .asInstanceOf[Double]
        val d2 = spatial.StDistance(pt(x2, y2), pt(x1, y1)).eval(null)
          .asInstanceOf[Double]
        d1 == d2 && d1 >= 0.0
    }

  property("points strictly inside an axis box are st_within it") =
    forAll(Gen.chooseNum(1.0, 9.0), Gen.chooseNum(1.0, 9.0)) { (x, y) =>
      import graft.functions.spatial
      val box = lit(UTF8String.fromString("POLYGON((0 0, 10 0, 10 10, 0 10, 0 0))"))
      spatial.StWithin(
        lit(UTF8String.fromString(s"POINT($x $y)")), box).eval(null) == true
    }

  property("shoelace area of a w*h rectangle is w*h") =
    forAll(Gen.chooseNum(0.5, 50.0), Gen.chooseNum(0.5, 50.0)) { (w, h) =>
      import graft.functions.spatial
      val poly = lit(UTF8String.fromString(
        s"POLYGON((0 0, $w 0, $w $h, 0 $h, 0 0))"))
      val a = spatial.StArea(poly).eval(null).asInstanceOf[Double]
      math.abs(a - w * h) < 1e-9 * w * h
    }
}
