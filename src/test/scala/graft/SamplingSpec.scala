package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Sampling

class SamplingSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  lazy val docs = Tables.documents(spark, TestSpark.sf0001)

  test("splitByHash: deterministic, complete, proportions near weights") {
    val s1 = Sampling.splitByHash(docs).as[(Long, Long, String)].collect()
    val s2 = Sampling.splitByHash(docs).as[(Long, Long, String)].collect()
    assert(s1.sortBy(_._1).sameElements(s2.sortBy(_._1))) // stable across runs
    assert(s1.length == docs.count())
    val byClass = s1.groupBy(_._3).view.mapValues(_.length).toMap
    assert(byClass.keySet.subsetOf(Set("train", "val", "test")))
    // 98% +- sampling noise on 500 docs
    assert(byClass("train") > 450)
    assert(byClass.getOrElse("val", 0) + byClass.getOrElse("test", 0) < 50)
    // growing the corpus never reassigns an existing doc (hash is per-key)
    val subset = Sampling.splitByHash(docs.filter($"doc_id" < 100))
      .as[(Long, Long, String)].collect().map(r => r._1 -> r._3).toMap
    val full = s1.map(r => r._1 -> r._3).toMap
    assert(subset.forall { case (id, sp) => full(id) == sp })
  }

  test("splitByHash: custom weights respect cumulative thresholds") {
    val s = Sampling.splitByHash(docs, Seq("a" -> 0.5, "b" -> 0.5))
      .as[(Long, Long, String)].collect()
    assert(s.forall(r => if (r._2 < 5000) r._3 == "a" else r._3 == "b"))
  }

  test("packSequences: offsets are per-shard running sums; bins cover budget windows") {
    val packed = Sampling.packSequences(docs, budget = 100, nShards = 4)
      .as[(Long, Long, Int, Long, Long)].collect()
    assert(packed.length == docs.count())
    for ((_, rows) <- packed.groupBy(_._2)) {
      val inOrder = rows.sortBy(_._1)
      var offset = 0L
      for ((_, _, n, start, bin) <- inOrder) {
        assert(start == offset, "running offset must equal sum of prior docs' tokens")
        assert(bin == start / 100)
        offset += n
      }
    }
  }
}
