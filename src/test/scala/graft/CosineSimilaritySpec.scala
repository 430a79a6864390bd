package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.GraftFunctions.{cosine_similarity, hash_embed}
import graft.functions.{CosineSimilarity, HashEmbed}

class CosineSimilaritySpec extends AnyFunSuite {

  test("cosine(x, x) == 1 for hash embeddings (identical text => score 1.0)") {
    val v = HashEmbed.embedText("transfer credits")
    assert(math.abs(CosineSimilarity.cosine(v, v) - 1.0) < 1e-12)
  }

  test("symmetry and known values") {
    val a = Array(1f, 0f, 0f)
    val b = Array(0f, 1f, 0f)
    val c = Array(1f, 1f, 0f)
    assert(CosineSimilarity.cosine(a, b) == 0.0)
    assert(math.abs(CosineSimilarity.cosine(a, c) - 1.0 / math.sqrt(2)) < 1e-15)
    val x = HashEmbed.embedText("abc"); val y = HashEmbed.embedText("xyz")
    assert(CosineSimilarity.cosine(x, y) == CosineSimilarity.cosine(y, x))
  }

  test("zero-norm vector scores 0.0") {
    assert(CosineSimilarity.cosine(Array(0f, 0f), Array(1f, 2f)) == 0.0)
  }

  test("cosine of period-32 embedding equals cosine of its 32-dim core (math property)") {
    val x = HashEmbed.embedText("abc"); val y = HashEmbed.embedText("xyz")
    val full = CosineSimilarity.cosine(x, y)
    val core = CosineSimilarity.cosine(x.take(32), y.take(32))
    assert(math.abs(full - core) < 1e-12)
  }

  test("expression on real embeddings table agrees with driver compute") {
    val spark = TestSpark.spark
    import spark.implicits._
    val emb = Tables.embeddings(spark, TestSpark.sf0001)
    val q = emb.filter($"vec_id" === 0).select($"embedding")
      .as[Array[Float]].head()
    val got = emb
      .select($"vec_id", cosine_similarity($"embedding", typedLit(q)).as("score"))
      .as[(Long, Double)].collect().toMap
    val local = emb.select($"vec_id", $"embedding").as[(Long, Array[Float])]
      .collect().map { case (id, e) => id -> CosineSimilarity.cosine(e, q) }.toMap
    assert(got.size == local.size)
    for ((id, s) <- local) assert(got(id) == s, s"vec $id")
    assert(math.abs(got(0L) - 1.0) < 1e-12)
  }

  test("dimension mismatch raises") {
    intercept[IllegalArgumentException] {
      CosineSimilarity.cosine(Array(1f), Array(1f, 2f))
    }
  }

  test("SQL registration + works with hash_embed") {
    val spark = TestSpark.spark
    val r = spark.sql(
      "SELECT cosine_similarity(hash_embed('q'), hash_embed('q')) AS s").collect()(0)
    assert(math.abs(r.getDouble(0) - 1.0) < 1e-12)
  }
}
