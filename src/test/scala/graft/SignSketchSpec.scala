package graft

import java.security.MessageDigest

import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.GraftFunctions.sign_sketch
import graft.functions.SignSketch

/** Golden tests for the 63-bit binary-quantization sketch (the q56 path):
  * the deterministic edge semantics (zero vector, NaN), a hand-computed
  * small-dim case against independently re-derived hyperplanes, and the
  * sign-function invariants (scale invariance, negation flip). */
class SignSketchSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  /** Independent re-derivation of hyperplane weight w[t][i]
    * (sha256("rp:t:i"), first 4 big-endian bytes mapped to [-1, 1)) — NOT
    * via RandProjBuckets.weights, so a regression there fails here too. */
  private def weight(t: Int, i: Int): Double = {
    val d = MessageDigest.getInstance("SHA-256")
      .digest(s"rp:$t:$i".getBytes("UTF-8"))
    val u = ((d(0) & 0xffL) << 24) | ((d(1) & 0xffL) << 16) |
      ((d(2) & 0xffL) << 8) | (d(3) & 0xffL)
    u / 4294967296.0 * 2.0 - 1.0
  }

  /** Sketch via the DataFrame path (exercises codegen). */
  private def sketchOf(v: Array[Float], numBits: Int = 63): Long =
    Seq(Tuple1(v)).toDF("e").select(sign_sketch($"e", numBits)).as[Long].head()

  test("zero vector: dot 0.0 against every hyperplane, 0.0 >= 0 -> all bits set") {
    assert(sketchOf(Array.fill(64)(0f)) == Long.MaxValue) // bits 0..62
    assert(sketchOf(Array.fill(8)(0f), 5) == 31L)         // bits 0..4
  }

  test("NaN component: every dot NaN, JVM NaN >= 0.0 is false -> all-zeros") {
    val v = Array.fill(64)(1f); v(7) = Float.NaN
    assert(sketchOf(v) == 0L)
    assert(sketchOf(v, 5) == 0L)
  }

  test("hand-computed 3-dim case vs independently derived hyperplanes") {
    val v = Array(0.5f, -1.25f, 2.0f)
    val numBits = 7
    var expected = 0L
    for (t <- 0 until numBits) {
      var dot = 0.0
      for (i <- 0 until 3) dot += v(i).toDouble * weight(t, i)
      if (dot >= 0.0) expected |= 1L << t
    }
    assert(sketchOf(v, numBits) == expected)
    // interpreted float and double paths agree with codegen
    assert(SignSketch.compute(new GenericArrayData(v), isDouble = false,
      numBits) == expected)
    assert(SignSketch.compute(new GenericArrayData(v.map(_.toDouble)),
      isDouble = true, numBits) == expected)
  }

  test("signs are scale-invariant; negation flips every decided bit") {
    val v = Array.tabulate(64)(i => math.sin(i + 1).toFloat)
    val a = sketchOf(v)
    assert(a != 0L && a != Long.MaxValue, "degenerate fixture")
    assert(sketchOf(v.map(x => x * 8f)) == a)
    // dot(-v, w) = -dot(v, w); sin-derived dots are never exactly 0 here,
    // so every bit flips
    assert((a ^ sketchOf(v.map(x => -x))) == Long.MaxValue)
  }

  test("numBits bounds enforced (bit 63 would overflow signed SQL shifts)") {
    val e = org.apache.spark.sql.GraftSqlBridge.expression(lit(Array(1f)))
    intercept[IllegalArgumentException](SignSketch(e, 64))
    intercept[IllegalArgumentException](SignSketch(e, 0))
  }
}
