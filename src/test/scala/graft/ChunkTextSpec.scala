package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.functions.ChunkText

/** Edge semantics from the reference chunker (/root/reference/main.py:118-126)
  * — fixtures from FIXTURES.md §C2, verified against a Python replication of
  * the reference loop. */
class ChunkTextSpec extends AnyFunSuite {

  // (len, expected chunk count, expected chunk lengths)
  val edgeCases = Seq(
    (0, 0, Seq.empty[Int]),
    (1, 1, Seq(1)),
    (799, 1, Seq(799)),
    (800, 1, Seq(800)),
    (801, 2, Seq(801, 1)),
    (1000, 2, Seq(1000, 200)),
    (1001, 2, Seq(1000, 201)),
    (1800, 3, Seq(1000, 1000, 200)),
    (2600, 4, Seq(1000, 1000, 1000, 200)))

  test("driver impl matches reference edge cases") {
    for ((n, cnt, lens) <- edgeCases) {
      val cs = ChunkText.chunk("x" * n)
      assert(cs.length == cnt, s"len=$n")
      assert(cs.map(_.length) == lens, s"len=$n")
    }
  }

  test("overlap region duplicates previous chunk's tail; chunks reconstruct") {
    val text = (0 until 2600).map(i => ('a' + i % 26).toChar).mkString
    val cs = ChunkText.chunk(text)
    for (i <- 1 until cs.length)
      assert(cs(i).take(200) == cs(i - 1).takeRight(200).take(cs(i).length))
    assert((cs.head +: cs.tail.map(_.drop(200))).mkString == text)
  }

  test("code points, not UTF-16 units: astral chars count as 1") {
    val astral = new String(Character.toChars(0x1f600)) // 2 UTF-16 units
    val text = astral * 1001
    val cs = ChunkText.chunk(text)
    assert(cs.length == 2)
    assert(cs(0).codePointCount(0, cs(0).length) == 1000)
    assert(cs(1).codePointCount(0, cs(1).length) == 201)
  }

  test("property: count = ceil(len/800), lens <= 1000, reconstruction (random lengths)") {
    val rnd = new scala.util.Random(42)
    for (_ <- 0 until 200) {
      val n = rnd.nextInt(5000)
      val t = Iterator.continually(('a' + rnd.nextInt(27)).toChar).take(n).mkString
      val cs = ChunkText.chunk(t)
      val expected = if (n == 0) 0 else (n + 799) / 800
      assert(cs.length == expected, s"len=$n")
      assert(cs.forall(_.length <= 1000))
      if (n > 0) assert((cs.head +: cs.tail.map(_.drop(200))).mkString == t)
    }
  }

  test("generator produces same chunks as driver impl on real documents") {
    val spark = TestSpark.spark
    import spark.implicits._
    val docs = Tables.documents(spark, TestSpark.sf0001)
    val viaGen = Engine.chunks(docs)
      .select($"doc_id", $"chunk_idx", $"text").as[(Long, Int, String)]
      .collect().groupBy(_._1).view
      .mapValues(_.sortBy(_._2).map(_._3).toSeq).toMap
    val local = docs.select($"doc_id", $"text").as[(Long, String)].collect()
      .map { case (id, t) => id -> ChunkText.chunk(t) }.toMap
    assert(viaGen.keySet == local.filter(_._2.nonEmpty).keySet)
    for ((id, cs) <- local if cs.nonEmpty) assert(viaGen(id) == cs, s"doc $id")
  }

  test("generator via SQL registration") {
    val spark = TestSpark.spark
    val rows = spark.sql("SELECT chunk_text('abcdef', 3, 1) AS (ci, c)").collect()
    assert(rows.map(r => (r.getInt(0), r.getString(1))).toSeq ==
      Seq((0, "abc"), (1, "cde"), (2, "ef")))
  }
}
