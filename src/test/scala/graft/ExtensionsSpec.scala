package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The `GraftExtensions` injection path (what
  * `spark.sql.extensions=graft.GraftExtensions` runs at session build in a
  * fresh JVM — a static conf, so in this shared-context test JVM the same
  * object is applied through `Builder.withExtensions`): the session must
  * expose every custom function in SQL and plan GroupedTopKNode without
  * `GroupedTopK.install`. */
class ExtensionsSpec extends AnyFunSuite {

  /** A session with GraftExtensions applied. The shared SparkContext is
    * reused (never stopped); active/default sessions are restored after. */
  private def withExtSession[A](f: SparkSession => A): A = {
    TestSpark.spark // ensure the shared context exists first
    val prevDefault = SparkSession.getDefaultSession
    val prevActive = SparkSession.getActiveSession
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    try {
      val s = SparkSession.builder()
        .master("local[4]")
        .withExtensions(new GraftExtensions())
        .config("spark.sql.shuffle.partitions", "4")
        .getOrCreate()
      f(s)
    } finally {
      SparkSession.clearActiveSession()
      SparkSession.clearDefaultSession()
      prevDefault.foreach(SparkSession.setDefaultSession)
      prevActive.foreach(SparkSession.setActiveSession)
    }
  }

  test("config-injected session exposes the custom functions in SQL") {
    withExtSession { s =>
      val row = s.sql(
        """SELECT size(hash_embed('x')) AS dim,
          |  round(cosine_similarity(hash_embed('x'), hash_embed('x')), 4) AS self,
          |  size(word_shingles('a b c d')) AS n_sh,
          |  byte_dot(array(CAST(1 AS TINYINT), CAST(2 AS TINYINT)),
          |           array(CAST(3 AS TINYINT), CAST(4 AS TINYINT))) AS dot,
          |  simhash_sig(array('a', 'b')) AS sh,
          |  sign_sketch(array(CAST(0.0 AS FLOAT), CAST(0.0 AS FLOAT))) AS ss63,
          |  sign_sketch(array(CAST(0.0 AS FLOAT), CAST(0.0 AS FLOAT)), 5) AS ss5
          |""".stripMargin).collect()(0)
      assert(row.getAs[Int]("dim") == 1024)
      assert(row.getAs[Double]("self") == 1.0)
      assert(row.getAs[Int]("n_sh") == 2) // distinct 3-gram shingles of 4 tokens
      assert(row.getAs[Long]("dot") == 11L)
      val sig = row.getAs[Long]("sh")
      assert(sig >= 0 && sig < (1L << 32))
      // zero vector -> every `dot >= 0` bit set (SignSketch edge contract)
      assert(row.getAs[Long]("ss63") == Long.MaxValue)
      assert(row.getAs[Long]("ss5") == 31L)
      // generator function works in a generator position (2-column output)
      val chunks = s.sql(
        "SELECT chunk_text(repeat('ab', 700), 1000, 200) AS (chunk_idx, chunk)")
        .collect()
      assert(chunks.length == 2) // 1400 chars -> windows at 0 and 800
    }
  }

  test("config-injected session plans GroupedTopKNode without install()") {
    withExtSession { s =>
      import s.implicits._
      // bypass GroupedTopK.apply (which calls install) — build the node raw
      // so only the injected strategy can plan it
      val df = (1 to 100).map(i => (i % 5, i)).toDF("g", "v")
      val node = graft.plans.GroupedTopKNode(
        Seq(org.apache.spark.sql.GraftSqlBridge.convertedExpression(col("g"))),
        Seq(org.apache.spark.sql.GraftSqlBridge.convertedExpression(desc("v")))
          .map {
            case so: org.apache.spark.sql.catalyst.expressions.SortOrder => so
            case e => org.apache.spark.sql.catalyst.expressions.SortOrder(
              e, org.apache.spark.sql.catalyst.expressions.Ascending)
          },
        2,
        org.apache.spark.sql.GraftSqlBridge.logicalPlan(df))
      val out = org.apache.spark.sql.GraftSqlBridge.ofRows(s, node)
      assert(s.experimental.extraStrategies.isEmpty,
        "test must not rely on experimental strategies")
      val got = out.select($"g", $"v", $"rank").as[(Int, Int, Int)]
        .collect().toSet
      val expect = (1 to 100).map(i => (i % 5, i)).groupBy(_._1).toSeq.flatMap {
        case (g, rows) => rows.map(_._2).sorted(Ordering[Int].reverse).take(2)
          .zipWithIndex.map { case (v, r) => (g, v, r + 1) }
      }.toSet
      assert(got == expect)
    }
  }
}
