package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}

import graft.functions._

/** `spark.sql.extensions` entry point — the idiomatic way to carry this
  * library into sessions the library never constructs (Thrift server,
  * Spark Connect, notebooks, spark-submit):
  *
  *   spark-submit --conf spark.sql.extensions=graft.GraftExtensions ...
  *
  * Injects every custom expression as a SQL function (persistent-registry
  * injection, unlike `GraftFunctions.register`'s temp functions) and the
  * `GroupedTopK` planner strategy, so a pure-SQL user gets the whole
  * engine surface: `SELECT cosine_similarity(hash_embed(text), ...)`.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    GraftExtensions.functionSpecs.foreach { case (name, builder) =>
      ext.injectFunction((FunctionIdentifier(name),
        new ExpressionInfo("graft.GraftExtensions", name), builder))
    }
    ext.injectPlannerStrategy(_ => graft.plans.GroupedTopKStrategy)
  }
}

object GraftExtensions {

  /** Evaluate a foldable numeric argument. SQL decimal literals parse as
    * `Decimal` (not `java.lang.Number`), and expressions like `512 + 512`
    * are foldable but not `Literal`s — both must work, as the temp-function
    * path always accepted them. */
  private def numArg(e: Expression, what: String): Double = {
    if (!e.foldable)
      throw new IllegalArgumentException(s"$what must be a constant, got $e")
    e.eval() match {
      case n: Number => n.doubleValue()
      case d: org.apache.spark.sql.types.Decimal => d.toDouble
      case other => throw new IllegalArgumentException(
        s"$what must be numeric, got $other")
    }
  }
  private def intArg(e: Expression, what: String): Int = numArg(e, what).toInt
  private def dblArg(e: Expression, what: String): Double = numArg(e, what)
  private def arity(name: String, expected: String): Nothing =
    throw new IllegalArgumentException(s"$name takes $expected arguments")

  /** One builder per custom expression — shared by the SQL-extensions
    * injection above and `GraftFunctions.register`'s temp-function path. */
  val functionSpecs: Seq[(String, Seq[Expression] => Expression)] = Seq(
    "hash_embed" -> {
      case Seq(t)    => HashEmbed(t)
      case Seq(t, d) => HashEmbed(t, intArg(d, "dim"))
      case _         => arity("hash_embed", "1-2")
    },
    "cosine_similarity" -> {
      case Seq(a, b) => CosineSimilarity(a, b)
      case _         => arity("cosine_similarity", "2")
    },
    "chunk_text" -> {
      case Seq(t)       => ChunkText(t, Literal(ChunkText.DefaultSize), Literal(ChunkText.DefaultOverlap))
      case Seq(t, s, o) => ChunkText(t, s, o)
      case _            => arity("chunk_text", "1 or 3")
    },
    "simhash_sig" -> {
      case Seq(t)    => SimHash(t, 32)
      case Seq(t, b) => SimHash(t, intArg(b, "bits"))
      case _         => arity("simhash_sig", "1-2")
    },
    "minhash_sig" -> {
      case Seq(sh) => MinHashSig(sh)
      case _       => arity("minhash_sig", "1")
    },
    "rand_proj_buckets" -> {
      case Seq(e)       => RandProjBuckets(e, 6, 1.0)
      case Seq(e, t, b) => RandProjBuckets(e, intArg(t, "numTables"), dblArg(b, "bucketLength"))
      case _            => arity("rand_proj_buckets", "1 or 3")
    },
    "byte_dot" -> {
      case Seq(a, b) => ByteDot(a, b)
      case _         => arity("byte_dot", "2")
    },
    "min_gram_hash" -> {
      case Seq(t)    => MinGramHash(t, 8)
      case Seq(t, g) => MinGramHash(t, intArg(g, "gram"))
      case _         => arity("min_gram_hash", "1-2")
    },
    "word_shingles" -> {
      case Seq(t)    => WordShingles(t, 3)
      case Seq(t, n) => WordShingles(t, intArg(n, "n"))
      case _         => arity("word_shingles", "1-2")
    },
    "sign_sketch" -> {
      case Seq(e)    => SignSketch(e, 63)
      case Seq(e, b) => SignSketch(e, intArg(b, "numBits"))
      case _         => arity("sign_sketch", "1-2")
    },
    "jaro_winkler" -> {
      case Seq(a, b) => JaroWinkler(a, b)
      case _         => arity("jaro_winkler", "2")
    },
    "term_counts" -> {
      case Seq(t, ts) if ts.foldable =>
        val data = ts.eval().asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
        TermCounts(t,
          (0 until data.numElements()).map(i => data.getUTF8String(i).toString))
      case _ => arity("term_counts", "2 (tokens, constant string array)")
    })
}
