package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.GraftFunctions.hash_embed
import graft.functions.HashEmbed

/** Golden vectors hand-derived from the reference `generate_embedding`
  * (/root/reference/main.py:129-147) via a Python replication — FIXTURES.md
  * §C1. SHA-256 is bit-identical across Python/JVM, so these are exact. */
class HashEmbedSpec extends AnyFunSuite {

  val goldens: Seq[(String, String, Int, Int)] = Seq(
    // (text, sha256 hex, sum of digest bytes, first byte)
    ("", "e3b0c44298fc1c149afbf4c8996fb92427ae41e4649b934ca495991b7852b855", 4399, 227),
    ("a", "ca978112ca1bbdcafac231b39a23dc4da786eff8147c4e72b9807785afee48bb", 4639, 202),
    ("transfer credits", "24d5640e053c73685372c0e102ea8935c1f158cd32938a421a7daf026712325c", 3406, 36),
    ("What are the articulation agreements for University of Florida?",
      "ea0c95e1cf2871cdd5d30dfeea868dc0e19935f54be9cdca5a79f8efc6c446ac", 5302, 234))

  test("digest matches reference sha256") {
    for ((text, hex, bsum, b0) <- goldens) {
      val d = HashEmbed.digest(org.apache.spark.unsafe.types.UTF8String.fromString(text))
      assert(d.map("%02x".format(_)).mkString == hex, text)
      assert(d.map(_ & 0xff).sum == bsum)
      assert((d(0) & 0xff) == b0)
    }
  }

  test("embedding values: v(i) = digest(i%32)/255*2-1, exact f64 goldens") {
    // First 8 values for "transfer credits", printed with %.17g from Python.
    val v = HashEmbed.embedText("transfer credits")
    val expected = Seq(-0.71764705882352942, 0.67058823529411771, -0.21568627450980393,
      -0.8901960784313725, -0.96078431372549022, -0.52941176470588236,
      -0.098039215686274495, -0.18431372549019609)
    for (i <- expected.indices)
      assert(v(i) == expected(i).toFloat, s"dim $i")
  }

  test("dim 1024, period 32, values in [-1,1]") {
    val v = HashEmbed.embedText("hello world")
    assert(v.length == 1024)
    assert(v.forall(x => x >= -1f && x <= 1f))
    for (i <- 0 until 1024) assert(v(i) == v(i % 32))
  }

  test("identical text => identical vector; different text => different") {
    assert(HashEmbed.embedText("abc").toSeq == HashEmbed.embedText("abc").toSeq)
    assert(HashEmbed.embedText("abc").toSeq != HashEmbed.embedText("abd").toSeq)
  }

  test("expression evaluates on DataFrame and agrees with driver impl") {
    val spark = TestSpark.spark
    import spark.implicits._
    val df = Seq("", "a", "transfer credits").toDF("t")
      .select($"t", hash_embed($"t").as("e"))
    val rows = df.as[(String, Array[Float])].collect().toMap
    for ((text, _, _, _) <- goldens.take(3))
      assert(rows(text).toSeq == HashEmbed.embedText(text).toSeq)
  }

  test("hash_embed(lit) constant-folds (query embedded once at plan time)") {
    val spark = TestSpark.spark
    val df = Tables.documents(spark, TestSpark.sf0001)
      .select(hash_embed(lit("transfer credits")).as("q"))
    val optimized = df.queryExecution.optimizedPlan
    val hasHashEmbed = optimized.expressions.exists(_.exists(_.isInstanceOf[HashEmbed]))
    assert(!hasHashEmbed, s"HashEmbed survived constant folding:\n$optimized")
  }

  test("SQL registration") {
    val spark = TestSpark.spark
    val r = spark.sql("SELECT hash_embed('a') AS e").collect()(0)
    assert(r.getSeq[Float](0).take(2) == Seq(HashEmbed.embedText("a")(0), HashEmbed.embedText("a")(1)))
    val r64 = spark.sql("SELECT size(hash_embed('a', 64)) AS n").collect()(0)
    assert(r64.getInt(0) == 64)
  }
}
