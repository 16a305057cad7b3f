package graft

import org.apache.spark.sql.catalyst.expressions.Literal
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, LongType, StringType}
import org.scalacheck.{Gen, Prop, Properties}

import graft.functions.{Portable, ShingleHash60, ShinglePolyHash, WindowMin}

/** Property tests for the round-12 shingle/window expressions against
  * plain-Scala reference models (codepoint sliding windows, sliding min).
  * Generated strings include non-BMP codepoints (surrogate pairs) and
  * below-k lengths — the places a UTF-16-indexed window or an off-by-one
  * on the window count would hide. The Spark-side codegen == HOF
  * equivalence is pinned separately in ExpressionsSpec; this spec pins
  * the interpreted eval against the mathematical definition.
  */
object ShingleExprPropertySpec extends Properties("ShingleExpressions") {

  private val cp: Gen[Int] = Gen.frequency(
    8 -> Gen.chooseNum('a'.toInt, 'z'.toInt),
    2 -> Gen.chooseNum(0x20, 0x7e),
    1 -> Gen.oneOf(0x00e9, 0x4e2d, 0x1f600, 0x10348)) // é, 中, 😀, 𐍈 (non-BMP)

  private val text: Gen[String] = for {
    n <- Gen.chooseNum(0, 60)
    cps <- Gen.listOfN(n, cp)
  } yield new String(cps.toArray, 0, cps.length)

  private def refShingle(s: String, k: Int, base: Int, mod: Long): Seq[Long] = {
    val cps = s.codePoints().toArray
    (0 to cps.length - k).map { j =>
      cps.slice(j, j + k).foldLeft(0L)((acc, c) => (acc * base + c) % mod)
    }
  }

  private def evalLongs(e: org.apache.spark.sql.catalyst.expressions.Expression): Seq[Long] =
    e.eval(null).asInstanceOf[ArrayData].toLongArray().toSeq

  property("shingle poly hash == codepoint sliding-window fold") =
    Prop.forAll(text, Gen.chooseNum(1, 12)) { (s, k) =>
      val got = evalLongs(ShinglePolyHash(Literal.create(s, StringType), k, 31, Portable.P1))
      got == refShingle(s, k, 31, Portable.P1)
    }

  property("shingle hash60 == packed pair of window folds") =
    Prop.forAll(text, Gen.chooseNum(1, 12)) { (s, k) =>
      val h31 = refShingle(s, k, 31, Portable.P1)
      val h37 = refShingle(s, k, 37, Portable.P2)
      val want = h31.zip(h37).map { case (a, b) => a * 1073741824L + (b % 1073741824L) }
      evalLongs(ShingleHash60(Literal.create(s, StringType), k)) == want
    }

  private val longs: Gen[List[Long]] = Gen.chooseNum(0, 40)
    .flatMap(n => Gen.listOfN(n, Gen.chooseNum(Long.MinValue, Long.MaxValue)))

  property("window min == sliding(w).min, empty below w") =
    Prop.forAll(longs, Gen.chooseNum(1, 8)) { (xs, w) =>
      val want = if (xs.length < w) Seq.empty[Long]
        else xs.sliding(w).map(_.min).toSeq
      val in = Literal.create(ArrayData.toArrayData(xs.toArray),
        ArrayType(LongType, containsNull = false))
      evalLongs(WindowMin(in, w)) == want
    }

  property("window count is length − k + 1, clamped at zero") =
    Prop.forAll(text, Gen.chooseNum(1, 12)) { (s, k) =>
      val n = s.codePoints().count().toInt
      val got = evalLongs(ShinglePolyHash(Literal.create(s, StringType), k, 31, Portable.P1))
      got.length == math.max(n - k + 1, 0)
    }
}
