package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.GraftFunctions.{cosine_similarity, hash_embed}
import graft.functions.{CosineSimilarity, HashEmbed}

/** Result re-ranking operators — transforms over an already-retrieved
  * candidate set (a shortlist of m rows per query), downstream of the
  * engine's retrieval paths.
  *
  * Scale shape: the expensive part (retrieval over the corpus) stays in the
  * declarative top-k machinery (broadcast queries, GroupedTopK bounded
  * heaps — the corpus never shuffles); the re-rank itself touches only
  * m rows per query, so it runs as per-group imperative logic with O(k*m)
  * work and O(m) state per query — bounded regardless of corpus size. */
object Rerank {

  // not `private`: the Dataset encoder's generated code instantiates these
  // from outside the enclosing object (janino rejects private access)
  case class Cand(query: String, id: String, source: String,
                  score: Double, embedding: Array[Float])
  case class MmrHit(query: String, rank: Int, id: String,
                    source: String, relevance: Double, mmr: Double)

  /** Late-interaction (ColBERT-style, Khattab & Zaharia 2020) retrieval:
    * score(q, d) = sum over QUERY tokens of the max cosine against any DOC
    * token — token-level semantic matching where single-vector retrieval
    * collapses the doc to one point. Token embeddings are the engine's
    * hash-embed (so the whole path stays deterministic and SQL-oracled);
    * with a learned encoder only the embedding column changes, not the
    * plan.
    *
    * The scale design is the part that matters: embeddings AND the
    * token-vs-query-token cosines are computed ONCE PER DISTINCT TOKEN
    * (vocabulary-bounded — Heaps'-law sublinear, never corpus-bounded; the
    * 1024-dim arithmetic never touches an incidence row), then the tiny
    * (token, qtok, cos) table joins the (doc, token) incidence list and
    * the MaxSim inner loop is one (doc, query-token)-keyed max aggregate
    * (map-side combined) over scalar rows; the final per-doc sum folds the
    * <= |query tokens| maxima in FIXED qidx order via a sorted-struct
    * aggregate, so the double sum is reduce-order-invariant. Top-k per
    * query through GroupedTopK. Output: (query, rank, doc_id, score). */
  def lateInteractionTopK(docs: DataFrame, queries: Seq[String],
                          k: Int = 5): DataFrame = {
    import graft.GraftFunctions.{cosine_similarity, hash_embed}
    require(queries.nonEmpty && queries.forall(_.trim.nonEmpty))
    val spark = docs.sparkSession
    import spark.implicits._
    val incidence = docs.selectExpr("doc_id",
      s"explode(array_distinct(${graft.operators.TextAnalysis.tokensExpr})) AS token")
    val tokEmb = graft.operators.PlanCache.memo(
      incidence.select("token").distinct()
        .withColumn("temb", hash_embed(col("token"))))
    val qtoks = queries.flatMap { q =>
      q.split(" ").filter(_.nonEmpty).distinct.zipWithIndex
        .map { case (t, i) => (q, i, t) }
    }.toDF("query", "qidx", "qtok")
    val qEmb = qtoks.withColumn("qemb", hash_embed(col("qtok")))
    // ALL vector arithmetic happens here, on vocab x |query tokens| rows
    val tokCos = tokEmb.crossJoin(broadcast(qEmb))
      .select(col("token"), col("query"), col("qidx"),
        cosine_similarity(col("temb"), col("qemb")).as("c"))
    val maxima = incidence
      .join(tokCos.hint("SHUFFLE_HASH"), Seq("token"))
      .groupBy("doc_id", "query", "qidx")
      .agg(max("c").as("m"))
    val scored = maxima.groupBy("doc_id", "query")
      .agg(sort_array(collect_list(struct(col("qidx"), col("m")))).as("ms"))
      .select(col("doc_id"), col("query"),
        expr("round(aggregate(ms, CAST(0.0 AS DOUBLE), (a, x) -> a + x.m), 4)")
          .as("score"))
    graft.plans.GroupedTopK(scored, Seq(col("query")),
        Seq(desc("score"), asc("doc_id")), k)
      .select("query", "rank", "doc_id", "score")
  }

  /** Maximal-marginal-relevance re-ranking (Carbonell & Goldstein 1998)
    * over a batch of queries: retrieve each query's top `m` by cosine, then
    * greedily select `k` of them trading relevance against redundancy —
    *
    *   mmr(d) = lambda * rel(d) - (1 - lambda) * max(0, max_{s in S} sim(d, s))
    *
    * where S is the already-selected set, rel is the query-document cosine
    * carried from retrieval, and sim is the document-document cosine. The
    * max(0, _) clamp means dissimilar-beyond-orthogonal candidates incur no
    * penalty rather than a bonus. Step 1 has S empty (penalty 0), so it is
    * the plain relevance argmax. Ties break to the lexically-lower id.
    *
    * Fully deterministic — both cosines are the engine's sequential-f64
    * scheme — so the whole greedy trace is hash-checkable in SQL (the q65
    * oracle unrolls the k selection steps). Output: (query, rank, id,
    * source, relevance, mmr) with rank = selection order 1..k.
    *
    * The per-query greedy runs in `flatMapGroups` — the one place imperative
    * logic is the right tool: MMR is inherently sequential in k, and each
    * group holds at most m rows (m defaults to 20; the shortlist bound is
    * enforced upstream by GroupedTopK, never here). */
  def mmrRerankMany(index: DataFrame, queries: Seq[String], k: Int = 5,
                    m: Int = 20, lambda: Double = 0.7,
                    dim: Int = HashEmbed.DefaultDim): DataFrame = {
    require(queries.nonEmpty && queries.forall(_.trim.nonEmpty))
    require(k >= 1 && m >= k, s"need m >= k >= 1, got k=$k m=$m")
    require(lambda >= 0.0 && lambda <= 1.0, s"lambda in [0,1], got $lambda")
    val spark = index.sparkSession
    import spark.implicits._
    val q = queries.distinct.toDF("query")
      .withColumn("qvec", hash_embed(col("query"), dim))
    val scored = index.crossJoin(broadcast(q))
      .withColumn("score", cosine_similarity(col("embedding"), col("qvec")))
      .filter(length(col("text")) > 0)
      .select(col("query"), col("id"), col("source"), col("score"),
        col("embedding"))
    val shortlist = graft.plans.GroupedTopK(scored,
        Seq(col("query")), Seq(desc("score"), asc("id")), m)
      .select(col("query"), col("id"), col("source"), col("score"),
        col("embedding"))
      .as[Cand]
    shortlist.groupByKey(_.query)
      .flatMapGroups { (query: String, it: Iterator[Cand]) =>
        val cands = it.toArray.sortBy(c => (-c.score, c.id))
        val selected = scala.collection.mutable.ArrayBuffer.empty[Cand]
        val used = scala.collection.mutable.HashSet.empty[String]
        val out = Vector.newBuilder[MmrHit]
        val take = math.min(k, cands.length)
        while (selected.length < take) {
          var best: Cand = null
          var bestMmr = 0.0
          for (c <- cands if !used.contains(c.id)) {
            var pen = 0.0 // max(0, max sim to selected); 0 when S is empty
            for (s <- selected) {
              val sim = CosineSimilarity.cosine(c.embedding, s.embedding)
              if (sim > pen) pen = sim
            }
            val mmr = lambda * c.score - (1.0 - lambda) * pen
            if (best == null || mmr > bestMmr ||
                (mmr == bestMmr && c.id < best.id)) {
              best = c
              bestMmr = mmr
            }
          }
          selected += best
          used += best.id
          out += MmrHit(query, selected.length, best.id, best.source,
            best.score, bestMmr)
        }
        out.result().iterator
      }
      .toDF()
      .select(col("query"), col("rank"), col("id"), col("source"),
        round(col("relevance"), 4).as("relevance"),
        round(col("mmr"), 6).as("mmr"))
  }

  /** Single-query MMR: the batch form over one query, without the query
    * column. Output: (rank, id, source, relevance, mmr). */
  def mmrRerank(index: DataFrame, query: String, k: Int = 5, m: Int = 20,
                lambda: Double = 0.7,
                dim: Int = HashEmbed.DefaultDim): DataFrame =
    mmrRerankMany(index, Seq(query), k, m, lambda, dim)
      .select(col("rank"), col("id"), col("source"), col("relevance"),
        col("mmr"))
}
