package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.Streams

class StreamingSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("streaming ingest: landing dir -> chunk+embed index, matches batch ingest") {
    val tmp = Files.createTempDirectory("graft-stream").toString
    val landing = s"$tmp/landing"
    val indexDir = s"$tmp/index"
    val ckpt = s"$tmp/ckpt"
    // stage the documents as the landing batch
    Tables.documents(spark, TestSpark.sf0001).write.parquet(landing)
    val q = Streams.streamingIngest(spark, landing, indexDir, ckpt)
    q.awaitTermination(120000)
    val streamed = spark.read.parquet(indexDir)
    val batch = Engine.ingest(Tables.documents(spark, TestSpark.sf0001))
    assert(streamed.count() == batch.count())
    // spot-check content equality on ids + embedding head
    val a = streamed.select($"id", element_at($"embedding", 1)).as[(String, Float)]
      .collect().toMap
    val b = batch.select($"id", element_at($"embedding", 1)).as[(String, Float)]
      .collect().toMap
    assert(a == b)
  }

  test("foreachBatch upsert ingest: re-streamed source replaces its partitions") {
    val tmp = Files.createTempDirectory("graft-upsert-stream").toString
    val landing = s"$tmp/landing"
    val indexDir = s"$tmp/index"
    // batch 1: two sources
    Seq((0L, "alpha " * 5, "en", "srcA", 30L), (1L, "beta " * 5, "en", "srcB", 25L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("append").parquet(landing)
    val q1 = Streams.streamingUpsertIngest(spark, landing, indexDir, s"$tmp/ck")
    q1.awaitTermination(120000)
    assert(Engine.readIndex(spark, indexDir).count() == 2)
    // batch 2: srcA re-ingested with new content -> replaces srcA partition only
    Seq((0L, "gamma " * 5, "en", "srcA", 30L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("append").parquet(landing)
    // same checkpoint -> only the newly-landed file is processed
    val q2 = Streams.streamingUpsertIngest(spark, landing, indexDir, s"$tmp/ck")
    q2.awaitTermination(120000)
    val after = Engine.readIndex(spark, indexDir)
      .select($"source", $"text").as[(String, String)].collect().toMap
    assert(after("srcA").startsWith("gamma"))
    assert(after("srcB").startsWith("beta"))
  }

  test("streamingIvfUpsert: streamed deltas converge to the in-memory upsert; probe parity") {
    import graft.operators.Similarity
    val tmp = Files.createTempDirectory("graft-ivf-stream").toString
    val landing = s"$tmp/landing"
    val indexDir = s"$tmp/ivf"
    val emb = Tables.embeddings(spark, TestSpark.sf0001)
      .select("vec_id", "embedding").cache()
    val base = emb.filter($"vec_id" % 5 =!= 0)
    val built = Similarity.ivfIndex(base, 8)
    built.save(indexDir)
    // two delta batches land separately; the same checkpoint carries over
    val delta = emb.filter($"vec_id" % 5 === 0)
    delta.filter($"vec_id" % 10 === 0).write.mode("append").parquet(landing)
    Streams.streamingIvfUpsert(spark, landing, indexDir, s"$tmp/ck")
      .awaitTermination(120000)
    delta.filter($"vec_id" % 10 =!= 0).write.mode("append").parquet(landing)
    Streams.streamingIvfUpsert(spark, landing, indexDir, s"$tmp/ck")
      .awaitTermination(120000)
    val loaded = Similarity.loadIvfIndex(spark, indexDir)
    assert(loaded.assignments.count() == emb.count())
    val queries = emb.filter($"vec_id" < 5)
      .select($"vec_id".as("query_id"), $"embedding".as("query_embedding"))
    val got = Similarity.ivfProbe(loaded, queries, 3).collect().map(_.toString).sorted
    val want = Similarity.ivfProbe(Similarity.upsertIvf(built, delta), queries, 3)
      .collect().map(_.toString).sorted
    assert(got.sameElements(want) && got.nonEmpty)
    emb.unpersist()
  }

  test("streamingCrossDedup: duplicates reported against the live corpus, only novel rows admitted") {
    import graft.operators.Similarity
    val tmp = Files.createTempDirectory("graft-xdedup-stream").toString
    val landing = s"$tmp/landing"
    val corpusDir = s"$tmp/corpus"
    val emb = Tables.embeddings(spark, TestSpark.sf0001)
      .select("vec_id", "embedding").cache()
    // seed corpus: vec_id % 10 != 0
    val seed = emb.filter($"vec_id" % 10 =!= 0)
    seed.write.mode("overwrite").parquet(corpusDir)
    val seedCount = seed.count()
    // batch 1: the % 10 == 0 slice — near-dups of the corpus are rejected,
    // the rest admitted; must match the batch operator's verdict exactly
    val b1 = emb.filter($"vec_id" % 10 === 0)
    val expectDupIds = Similarity.rpCrossNearDupPairs(b1, seed, 0.3)
      .select("vec_new").distinct().as[Long].collect().toSet
    val gotPairs = scala.collection.mutable.ArrayBuffer.empty[(Long, Long)]
    b1.write.mode("append").parquet(landing)
    Streams.streamingCrossDedup(spark, landing, corpusDir, s"$tmp/ck") {
      (d, _) => gotPairs ++= d.select($"vec_new", $"vec_old").as[(Long, Long)].collect()
    }.awaitTermination(120000)
    assert(gotPairs.map(_._1).toSet == expectDupIds)
    assert(expectDupIds.nonEmpty, "fixture must reject something")
    val afterB1 = spark.read.parquet(corpusDir)
    assert(afterB1.count() == seedCount + b1.count() - expectDupIds.size)
    // batch 2: re-deliver an ADMITTED batch-1 vector (now a corpus dup —
    // the corpus the check runs against has grown) plus nothing novel
    val admitted = b1.join(afterB1.select("vec_id"), Seq("vec_id"))
      .orderBy("vec_id").limit(1)
    val readmitId = admitted.select("vec_id").as[Long].head()
    gotPairs.clear()
    admitted.withColumn("vec_id", $"vec_id" + 1000000L)
      .write.mode("append").parquet(landing)
    Streams.streamingCrossDedup(spark, landing, corpusDir, s"$tmp/ck") {
      (d, _) => gotPairs ++= d.select($"vec_new", $"vec_old").as[(Long, Long)].collect()
    }.awaitTermination(120000)
    // the re-delivered copy collides with its original (cosine 1.0)
    assert(gotPairs.exists { case (n, o) => n == readmitId + 1000000L && o == readmitId })
    assert(spark.read.parquet(corpusDir).count() == afterB1.count(),
      "an exact duplicate must not be admitted")
    emb.unpersist()
  }

  test("streamingHybridSearch: per-batch results carry freshly-derived BM25 stats") {
    val tmp = Files.createTempDirectory("graft-hybrid-stream").toString
    val landing = s"$tmp/landing"
    val indexDir = s"$tmp/index"
    val queries = Seq("transfer credits", "!!!")
    val emitted = scala.collection.mutable.ArrayBuffer.empty[Array[String]]
    def runOnce(ck: String): Unit = {
      val q = Streams.streamingHybridSearch(spark, landing, indexDir, ck,
        queries, k = 5) { (df, _) => emitted += df.collect().map(_.toString).sorted }
      q.awaitTermination(120000)
    }
    // batch 1: half the corpus
    val docs = Tables.documents(spark, TestSpark.sf0001)
    docs.filter($"doc_id" % 2 === 0).write.mode("append").parquet(landing)
    runOnce(s"$tmp/ck")
    assert(emitted.size == 1)
    // the emitted result equals batch hybridSearchMany over the index so far
    val expect1 = Engine.hybridSearchMany(
        Engine.readIndex(spark, indexDir), queries, 5)
      .collect().map(_.toString).sorted
    assert(emitted(0).sameElements(expect1))
    // batch 2: the other half lands; stats (df, avgdl, N) must be derived
    // over the ENLARGED corpus, i.e. equal the batch run on the full index
    docs.filter($"doc_id" % 2 === 1).write.mode("append").parquet(landing)
    runOnce(s"$tmp/ck")
    assert(emitted.size == 2)
    val expect2 = Engine.hybridSearchMany(
        Engine.readIndex(spark, indexDir), queries, 5)
      .collect().map(_.toString).sorted
    assert(emitted(1).sameElements(expect2))
    // and the refreshed result genuinely differs from the stale one (the
    // corpus doubled; ranks and rrf shift) — stats are not frozen
    assert(!emitted(1).sameElements(emitted(0)))
  }

  test("tumbling window agg over a streamed events table matches batch groupBy") {
    val tmp = Files.createTempDirectory("graft-events").toString
    val src = s"$tmp/events"
    Tables.events(spark, TestSpark.sf0001).write.parquet(src)
    val stream = spark.readStream.schema(Streams.eventsSchema).parquet(src)
    val agg = Streams.tumblingCounts(stream)
    val q = agg.writeStream.format("memory").queryName("tumbling_out")
      .outputMode("append")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
    q.awaitTermination(120000)
    // with AvailableNow + append mode, only windows below the final watermark
    // emit; compare those against the batch computation
    val streamed = spark.table("tumbling_out")
      .select($"window_start", $"event_type", $"n").as[(java.sql.Timestamp, String, Long)]
      .collect().map(r => (r._1, r._2) -> r._3).toMap
    val batch = Tables.events(spark, TestSpark.sf0001)
      .groupBy(window($"ts", "10 minutes").as("w"), $"event_type")
      .agg(count(lit(1)).as("n"))
      .select($"w.start", $"event_type", $"n").as[(java.sql.Timestamp, String, Long)]
      .collect().map(r => (r._1, r._2) -> r._3).toMap
    assert(streamed.nonEmpty)
    for ((k, n) <- streamed) assert(batch(k) == n, s"window $k")
  }

  test("streamingTopK: running top-k over an appending index equals batch search") {
    val tmp = Files.createTempDirectory("graft-stream-topk").toString
    val landing = s"$tmp/landing"
    // land the corpus in two batches so state must merge across them
    val docs = Tables.documents(spark, TestSpark.sf0001)
    val all = Engine.ingest(docs).cache()
    all.filter($"doc_id" % 2 === 0).write.mode("append")
      .parquet(landing)
    all.filter($"doc_id" % 2 === 1).write.mode("append")
      .parquet(landing)
    val stream = spark.readStream.schema(all.schema)
      .option("maxFilesPerTrigger", "1").parquet(landing)
    val qs = Seq("transfer credits", "spark window agg")
    val q = graft.streaming.Streams.streamingTopK(stream, qs, 5)
      .writeStream.format("memory").queryName("topk_out").outputMode("update")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
    q.awaitTermination(120000)
    // the memory sink accumulates every micro-batch's update; the FINAL
    // top-k (the batch-search result over the full corpus) must appear
    // among the emissions with identical (query, rank, id)
    val streamed = spark.table("topk_out").select($"query", $"rank", $"id")
      .as[(String, Int, String)].collect().toSet
    val batch = Engine.searchMany(all, qs, 5)
      .select($"query", $"rank", $"id").as[(String, Int, String)].collect().toSet
    assert(batch.nonEmpty && batch.subsetOf(streamed),
      s"missing: ${batch.diff(streamed)}")
    all.unpersist()
  }

  test("streamingFunnel: accumulated emissions equal the batch funnel over the prefix") {
    val tmp = Files.createTempDirectory("graft-stream-funnel").toString
    val src = s"$tmp/events"
    val events = Tables.events(spark, TestSpark.sf0001).cache()
    // land in two event-time halves so per-user arrival stays in order
    // across micro-batches (the operator's in-order ingest contract)
    val cut = events.selectExpr("percentile_approx(ts, 0.5)").collect()(0)
      .getTimestamp(0)
    // one file per half: FileStreamSource orders new files by mtime, so a
    // single-file half cannot interleave ahead of the earlier half
    events.filter($"ts" <= cut).coalesce(1).write.mode("append").parquet(src)
    events.filter($"ts" > cut).coalesce(1).write.mode("append").parquet(src)
    val stream = spark.readStream.schema(Streams.eventsSchema)
      .option("maxFilesPerTrigger", "1").parquet(src)
    val steps = Seq("view", "click", "purchase")
    val q = Streams.streamingFunnel(stream, steps).writeStream
      .format("memory").queryName("funnel_out").outputMode("append")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
    q.awaitTermination(120000)
    val streamed = spark.table("funnel_out")
      .select($"user_id", $"step", $"step_ts")
      .as[(Long, Int, java.sql.Timestamp)].collect()
    val batch = graft.operators.EventAnalytics.funnel(events, steps)
      .as[(Long, Int, java.sql.Timestamp)].collect()
    assert(streamed.length == streamed.toSet.size) // each step emitted once
    assert(streamed.toSet == batch.toSet)
    events.unpersist()
  }

  test("streamingDedupBursts: accumulated kept set equals the batch operator") {
    val tmp = Files.createTempDirectory("graft-stream-burst").toString
    val src = s"$tmp/events"
    val events = Tables.events(spark, TestSpark.sf0001).cache()
    val cut = events.selectExpr("percentile_approx(ts, 0.5)").collect()(0)
      .getTimestamp(0)
    // two event-time halves, one file each: per-key arrival stays in order
    // across micro-batches (the operator's in-order ingest contract)
    events.filter($"ts" <= cut).coalesce(1).write.mode("append").parquet(src)
    events.filter($"ts" > cut).coalesce(1).write.mode("append").parquet(src)
    val stream = spark.readStream.schema(Streams.eventsSchema)
      .option("maxFilesPerTrigger", "1").parquet(src)
    val q = Streams.streamingDedupBursts(stream, 3600).writeStream
      .format("memory").queryName("burst_out").outputMode("append")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
    q.awaitTermination(120000)
    val streamed = spark.table("burst_out")
      .select($"event_id", $"user_id", $"event_type", $"ts_us")
      .as[(Long, Long, String, Long)].collect()
    val batch = graft.operators.EventAnalytics.dedupBursts(events, 3600)
      .as[(Long, Long, String, Long)].collect()
    assert(streamed.length == streamed.toSet.size)
    assert(streamed.toSet == batch.toSet)
    events.unpersist()
  }

  test("streaming dedup suppresses re-delivered event ids within the watermark") {
    val tmp = Files.createTempDirectory("graft-dedup").toString
    val src = s"$tmp/events"
    val base = Tables.events(spark, TestSpark.sf0001).limit(200)
    // re-deliver every event twice (the at-least-once ingest shape)
    base.unionByName(base).write.parquet(src)
    val stream = spark.readStream.schema(Streams.eventsSchema).parquet(src)
    val q = Streams.dedupEvents(stream).writeStream
      .format("memory").queryName("dedup_out").outputMode("append")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
    q.awaitTermination(120000)
    val out = spark.table("dedup_out").select($"event_id").as[Long].collect()
    assert(out.length == 200)
    assert(out.toSet.size == 200)
  }

  test("streamingEwmaDailySpend: final per-user state equals the batch operator across two micro-batches") {
    val tmp = Files.createTempDirectory("graft-stream-ewma").toString
    val src = s"$tmp/events"
    val events = Tables.events(spark, TestSpark.sf0001).cache()
    val cutDay = events.selectExpr("CAST(percentile_approx(ts, 0.5) AS DATE)")
      .collect()(0).getDate(0)
    // two DAY-ALIGNED event-time halves: every user touched by batch 1
    // gains strictly newer days, so its final emission has the max n_days
    events.filter($"ts".cast("date") <= cutDay).coalesce(1)
      .write.mode("append").parquet(src)
    events.filter($"ts".cast("date") > cutDay).coalesce(1)
      .write.mode("append").parquet(src)
    val stream = spark.readStream.schema(Streams.eventsSchema)
      .option("maxFilesPerTrigger", "1").parquet(src)
    val q = Streams.streamingEwmaDailySpend(stream).writeStream
      .format("memory").queryName("ewma_out").outputMode("update")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
    q.awaitTermination(120000)
    val streamed = spark.table("ewma_out")
      .withColumn("rn", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy($"user_id")
          .orderBy($"n_days".desc)))
      .filter($"rn" === 1).select($"user_id", $"n_days", $"ewma")
      .as[(Long, Long, Double)].collect().map(r => r._1 -> (r._2, r._3)).toMap
    val batch = graft.operators.EventAnalytics.ewmaDailySpend(events)
      .as[(Long, Long, Double)].collect().map(r => r._1 -> (r._2, r._3)).toMap
    assert(streamed.keySet == batch.keySet)
    for ((u, bv) <- batch) assert(streamed(u) == bv, s"user $u")
    events.unpersist()
  }

  test("streamingSceneCuts: transition rows equal the batch operator across two frame batches") {
    val tmp = Files.createTempDirectory("graft-stream-scenes").toString
    val src = s"$tmp/frames"
    val docs = Tables.documents(spark, TestSpark.sf0001)
    val media = graft.multimodal.Multimodal.asMedia(
      docs, "doc_id", "encode(text, 'utf-8')", "raw")
    val frames = graft.multimodal.Multimodal.sampleFrames(media, 48, 1)
      .withColumn("frame_idx", $"frame_idx".cast("long")).cache()
    // frame-idx halves: per-media arrival stays in frame order
    frames.filter($"frame_idx" <= 2).coalesce(1).write.mode("append").parquet(src)
    frames.filter($"frame_idx" > 2).coalesce(1).write.mode("append").parquet(src)
    val schema = frames.schema
    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1").parquet(src)
    val q = Streams.streamingSceneCuts(stream).writeStream
      .format("memory").queryName("scenes_out").outputMode("append")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
    q.awaitTermination(120000)
    val streamed = spark.table("scenes_out")
      .as[(Long, Long, Long, Long)].collect().toSet
    val batch = graft.multimodal.Multimodal.sceneCuts(media)
      .as[(Long, Long, Long, Long)].collect().toSet
    assert(streamed == batch && batch.nonEmpty)
    frames.unpersist()
  }

  test("mapGroupsWithState: per-user running totals match batch aggregation") {
    val tmp = Files.createTempDirectory("graft-state").toString
    val src = s"$tmp/events"
    Tables.events(spark, TestSpark.sf0001).write.parquet(src)
    val stream = spark.readStream.schema(Streams.eventsSchema).parquet(src)
    val q = Streams.userRunningTotals(stream).writeStream
      .format("memory").queryName("running_out").outputMode("update")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
    q.awaitTermination(120000)
    // last update per user = final running total = batch groupBy
    val streamed = spark.table("running_out")
      .groupBy($"user_id").agg(max($"n_events").as("n"), max($"total_value").as("v"))
      .as[(Long, Long, Double)].collect().map(r => r._1 -> (r._2, r._3)).toMap
    val batch = Tables.events(spark, TestSpark.sf0001)
      .groupBy($"user_id").agg(count(lit(1)).as("n"), sum($"value").as("v"))
      .as[(Long, Long, Double)].collect().map(r => r._1 -> (r._2, r._3)).toMap
    assert(streamed.keySet == batch.keySet)
    for ((u, (n, v)) <- batch) {
      assert(streamed(u)._1 == n, s"user $u count")
      assert(math.abs(streamed(u)._2 - v) < 1e-6, s"user $u sum")
    }
  }

  test("stream-stream interval join matches the batch banded interval join") {
    val tmp = Files.createTempDirectory("graft-ssjoin").toString
    val src = s"$tmp/events"
    // a dense fixture so in-window pairs actually exist
    val events = (0 until 300).map { i =>
      (i.toLong, new java.sql.Timestamp(1700000000000L + (i % 60) * 60000L + i),
        (i % 4).toLong, "click", 1.0, "{}")
    }.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    events.write.parquet(src)
    def stream() = spark.readStream.schema(Streams.eventsSchema).parquet(src)
    val joined = Streams.intervalJoin(stream(), stream(), windowSec = 300)
    val q = joined.writeStream.format("memory").queryName("ssjoin_out")
      .outputMode("append")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
    q.awaitTermination(120000)
    val streamed = spark.table("ssjoin_out")
      .select($"id_a", $"id_b", $"gap_us").as[(Long, Long, Long)]
      .collect().toSet
    val batch = graft.operators.Joins
      .intervalSelfJoin(events, "user_id", "ts", "event_id", 300)
      .select($"id_a", $"id_b", $"gap_us").as[(Long, Long, Long)]
      .collect().toSet
    assert(batch.nonEmpty)
    assert(streamed == batch)
  }

  test("session windows: append output matches the batch twin's closed sessions") {
    val tmp = Files.createTempDirectory("graft-sess").toString
    val src = s"$tmp/events"
    val events = Tables.events(spark, TestSpark.sf0001).cache()
    events.write.parquet(src)
    val stream = spark.readStream.schema(Streams.eventsSchema).parquet(src)
    val q = Streams.sessionCounts(stream).writeStream
      .format("memory").queryName("sessions_out").outputMode("append")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
    q.awaitTermination(120000)
    val streamed = spark.table("sessions_out")
      .select($"session_start", $"session_end", $"user_id", $"n_events", $"session_value")
      .as[(java.sql.Timestamp, java.sql.Timestamp, Long, Long, Double)]
      .collect().toSet
    // Append mode emits exactly the sessions the final watermark has closed:
    // watermark = max(ts) - 30min, a session closes once its end precedes it.
    // The batch twin (same session_window + gap) filtered to that horizon
    // must therefore match the streamed output EXACTLY — a partial-emission
    // bug can no longer hide behind a non-emptiness check.
    val maxTs = events.agg(max($"ts")).head().getTimestamp(0)
    val horizon = new java.sql.Timestamp(maxTs.getTime - 30 * 60000L)
    val batch = events
      .groupBy(session_window($"ts", "30 minutes").as("w"), $"user_id")
      .agg(count(lit(1)).as("n_events"), sum("value").as("session_value"))
      .select($"w.start".as("session_start"), $"w.end".as("session_end"),
        $"user_id", $"n_events", $"session_value")
      .filter($"session_end" <= lit(horizon))
      .as[(java.sql.Timestamp, java.sql.Timestamp, Long, Long, Double)]
      .collect().toSet
    assert(batch.nonEmpty, "batch twin produced no closed sessions — fixture too small")
    assert(streamed.size == batch.size,
      s"session count mismatch: streamed ${streamed.size} vs batch ${batch.size}")
    assert(streamed == batch)
    for ((start, end, _, n, _) <- streamed) {
      assert(n >= 1)
      assert(!start.after(end))
    }
    events.unpersist()
  }

  test("streamingBpeVocab: incremental vocab + merges match from-scratch training") {
    val tmp = Files.createTempDirectory("graft-stream-bpe").toString
    val (landing, vocabPath, ckpt) = (s"$tmp/landing", s"$tmp/vocab", s"$tmp/ckpt")
    val docs = Tables.documents(spark, TestSpark.sf0001).cache()
    // two arbitrary halves as separate micro-batches: word counts are
    // additive, so the split must not matter
    docs.filter($"doc_id" % 2 === 0).coalesce(1).write.mode("append").parquet(landing)
    docs.filter($"doc_id" % 2 === 1).coalesce(1).write.mode("append").parquet(landing)
    val stream = spark.readStream.schema(Streams.documentsSchema)
      .option("maxFilesPerTrigger", "1").parquet(landing)
    val q = Streams.streamingBpeVocab(stream, vocabPath, ckpt)
    q.awaitTermination(120000)
    // both files arrived as separate micro-batches (genuinely incremental)
    val epochs = spark.read.parquet(vocabPath).select("epoch").distinct().count()
    assert(epochs >= 2, s"expected >= 2 epoch partitions, got $epochs")
    // 1) maintained vocab == one-shot corpus scan
    val streamedVocab = Streams.bpeVocabAt(spark, vocabPath)
      .as[(String, Long)].collect().toMap
    val batchVocab = graft.operators.Bpe.wordCounts(docs)
      .as[(String, Long)].collect().toMap
    assert(streamedVocab == batchVocab)
    // 2) merge trajectory from the maintained vocab == from-scratch training
    val streamedMerges = graft.operators.Bpe
      .bpeMergesFromVocab(Streams.bpeVocabAt(spark, vocabPath))
      .as[(Int, String, String, Long)].collect().toSet
    val batchMerges = graft.operators.Bpe.bpeMerges(docs)
      .as[(Int, String, String, Long)].collect().toSet
    assert(streamedMerges == batchMerges && streamedMerges.nonEmpty)
    // 3) compaction collapses partitions and keeps totals identical
    Streams.compactBpeVocabAt(spark, vocabPath)
    assert(spark.read.parquet(vocabPath).select("epoch").distinct().count() == 1)
    val compacted = Streams.bpeVocabAt(spark, vocabPath)
      .as[(String, Long)].collect().toMap
    assert(compacted == batchVocab)
    docs.unpersist()
  }

  test("streamingCohortCells: folded state answers the same LTV triangle as batch; compaction preserves it") {
    val tmp = Files.createTempDirectory("graft-stream-ltv").toString
    val (landing, cPath, ckpt) = (s"$tmp/landing", s"$tmp/cells", s"$tmp/ckpt")
    val ev = Tables.events(spark, TestSpark.sf0001).cache()
    // split by EVENT id parity, not by user or time: each user's events
    // straddle both epochs in arbitrary time order, so a later epoch can
    // carry a user's EARLIER first event — the min-merge must still land
    // every user in the same cohort a batch rescan would
    ev.filter($"event_id" % 2 === 0).coalesce(1).write.mode("append").parquet(landing)
    ev.filter($"event_id" % 2 === 1).coalesce(1).write.mode("append").parquet(landing)
    val stream = spark.readStream.schema(Streams.eventsSchema)
      .option("maxFilesPerTrigger", "1").parquet(landing)
    Streams.streamingCohortCells(stream, cPath, ckpt).awaitTermination(120000)
    assert(spark.read.parquet(cPath).select("epoch").distinct().count() >= 2)
    val batch = graft.operators.EventAnalytics.cohortLtv(ev)
      .as[(Long, Long, Long, Long, Long, Long, Double)].collect().toSet
    assert(Streams.cohortLtvAt(spark, cPath)
      .as[(Long, Long, Long, Long, Long, Long, Double)].collect().toSet == batch)
    assert(batch.nonEmpty)
    Streams.compactCohortCellsAt(spark, cPath)
    assert(spark.read.parquet(cPath).select("epoch").distinct().count() == 1)
    assert(Streams.cohortLtvAt(spark, cPath)
      .as[(Long, Long, Long, Long, Long, Long, Double)].collect().toSet == batch)
    ev.unpersist()
  }

  test("streamingBenfordDigits: folded partials answer the same chi2 as batch; compaction preserves it") {
    val tmp = Files.createTempDirectory("graft-stream-benford").toString
    val (landing, bPath, ckpt) = (s"$tmp/landing", s"$tmp/counts", s"$tmp/ckpt")
    val ev = Tables.events(spark, TestSpark.sf0001).cache()
    ev.filter($"event_id" % 2 === 0).coalesce(1).write.mode("append").parquet(landing)
    ev.filter($"event_id" % 2 === 1).coalesce(1).write.mode("append").parquet(landing)
    val stream = spark.readStream.schema(Streams.eventsSchema)
      .option("maxFilesPerTrigger", "1").parquet(landing)
    Streams.streamingBenfordDigits(stream, bPath, ckpt).awaitTermination(120000)
    assert(spark.read.parquet(bPath).select("epoch").distinct().count() >= 2)
    val batch = graft.operators.EventAnalytics.benfordAudit(ev)
      .as[(String, Long, Double)].collect().toSet
    assert(Streams.benfordAuditAt(spark, bPath)
      .as[(String, Long, Double)].collect().toSet == batch)
    assert(batch.nonEmpty)
    Streams.compactBenfordDigitsAt(spark, bPath)
    assert(spark.read.parquet(bPath).select("epoch").distinct().count() == 1)
    assert(Streams.benfordAuditAt(spark, bPath)
      .as[(String, Long, Double)].collect().toSet == batch)
    ev.unpersist()
  }

  test("streamingCellCounts: folded cells answer chi-square and MI as batch; compaction preserves them") {
    val tmp = Files.createTempDirectory("graft-stream-cells").toString
    val (landing, cPath, ckpt) = (s"$tmp/landing", s"$tmp/cells", s"$tmp/ckpt")
    val docs = Tables.documents(spark, TestSpark.sf0001).cache()
    docs.filter($"doc_id" % 2 === 0).coalesce(1).write.mode("append").parquet(landing)
    docs.filter($"doc_id" % 2 === 1).coalesce(1).write.mode("append").parquet(landing)
    val stream = spark.readStream.schema(Streams.documentsSchema)
      .option("maxFilesPerTrigger", "1").parquet(landing)
    Streams.streamingCellCounts(stream, cPath, ckpt).awaitTermination(120000)
    assert(spark.read.parquet(cPath).select("epoch").distinct().count() >= 2)
    val ts = graft.operators.TableStats
    val chiBatch = ts.chiSquare(docs, "source", "lang")
      .as[(String, String, Long, Double, Double)].collect().toSet
    val miBatch = ts.mutualInformation(docs, "source", "lang")
      .as[(String, String, Long, Double)].collect().toSet
    assert(Streams.chiSquareStreamedAt(spark, cPath)
      .as[(String, String, Long, Double, Double)].collect().toSet == chiBatch)
    assert(Streams.mutualInformationStreamedAt(spark, cPath)
      .as[(String, String, Long, Double)].collect().toSet == miBatch)
    assert(chiBatch.nonEmpty && miBatch.nonEmpty)
    Streams.compactCellCountsAt(spark, cPath)
    assert(spark.read.parquet(cPath).select("epoch").distinct().count() == 1)
    assert(Streams.chiSquareStreamedAt(spark, cPath)
      .as[(String, String, Long, Double, Double)].collect().toSet == chiBatch)
    assert(Streams.mutualInformationStreamedAt(spark, cPath)
      .as[(String, String, Long, Double)].collect().toSet == miBatch)
    docs.unpersist()
  }

  test("ensureStreamedJsonlState (q257): two waves accumulate distinct epochs; state report equals the full-fixture batch report") {
    val docs = Tables.documents(spark, TestSpark.sf0001)
    val out = Streams.ensureStreamedJsonlState(spark, docs, TestSpark.sf0001)
    // the waves streamed as SEPARATE runs against one checkpoint with a
    // compactJsonlIngestAt run BETWEEN them, so the state must hold the
    // compacted epoch=-1 partition NEXT TO wave 1's epoch (the thing
    // q256's batch path cannot exercise)
    val jepochs = spark.read.parquet(out).select("epoch").distinct()
      .as[Long].collect().toSet
    assert(jepochs.contains(-1L), s"no compacted partition in $jepochs")
    assert(jepochs.exists(_ >= 0L), s"post-compaction epoch missing: $jepochs")
    // and answer exactly the FULL fixture's batch report
    val full = graft.sources.JsonlCorpusSource.ensureFixture(
      spark, docs, TestSpark.sf0001)
    val batchRaw = graft.sources.JsonlCorpusSource.read(
      spark, full, "doc_id BIGINT, lang STRING, source STRING")
    val batchReport = graft.sources.JsonlCorpusSource.ingestReport(batchRaw)
      .as[(Long, Long, String)].collect().head
    assert(Streams.jsonlIngestReportAt(spark, out)
      .as[(Long, Long, String)].collect().head == batchReport)
    assert(Streams.jsonlValidAt(spark, out).agg(sum("doc_id")).head().getLong(0)
      == graft.sources.JsonlCorpusSource.valid(batchRaw)
        .agg(sum("doc_id")).head().getLong(0))
    // idempotent: a second call short-circuits on the marker and the
    // state is unchanged
    assert(Streams.ensureStreamedJsonlState(spark, docs, TestSpark.sf0001) == out)
  }

  test("ensureStreamedDocState (q258): 4-wave lex index compacted mid-lifecycle; streamed BM25 equals batch indexed BM25") {
    val docs = Tables.documents(spark, TestSpark.sf0001)
    val terms = Seq("join", "hash", "customer")
    // the production lifecycle the declared queries use (lexStateOf):
    // four doc_id-mod-4 waves with compactLexIndexAt run between waves
    // 2 and 3, so the state dir ends up holding the compacted epoch=-1
    // partition NEXT TO the two post-compaction epochs
    val state = Streams.ensureStreamedDocState(
      spark, docs, TestSpark.sf0001, "lex", waves = 4, compactAfterWave = 2,
      compactor = Streams.compactLexIndexAt)(
      (sd, out, ckpt) => Streams.streamingLexIndex(sd, out, ckpt))
    val epochs = spark.read.parquet(state).select("epoch").distinct()
      .as[Long].collect().toSet
    assert(epochs.contains(-1L), s"no compacted partition in $epochs")
    assert(epochs.count(_ >= 0L) >= 2, s"post-compaction epochs missing: $epochs")
    val ta = graft.operators.TextAnalysis
    val batch = ta.bm25Indexed(ta.postings(docs), ta.docLengths(docs), terms)
      .collect().map(_.toSeq).toSet
    assert(Streams.bm25StreamedAt(spark, state, terms)
      .collect().map(_.toSeq).toSet == batch)
    // marker short-circuit: a second call must not re-stream
    assert(Streams.ensureStreamedDocState(
      spark, docs, TestSpark.sf0001, "lex", waves = 4, compactAfterWave = 2,
      compactor = Streams.compactLexIndexAt)((_, _, _) =>
      fail("state already materialized — start must not be invoked")) == state)
  }

  test("streamedStateBase stamps loudly; a regenerated source gets a fresh state dir, never the stale cache") {
    val docs = Tables.documents(spark, TestSpark.sf0001)
    // un-stattable source: the ensure* call must FAIL, not fall back to a
    // stampless key that a _STATE_READY marker could serve stale
    intercept[IllegalStateException] {
      Streams.ensureStreamedDocState(
        spark, docs, "/nonexistent-graft-sfdir", "stampfail")(
        (sd, out, ckpt) => Streams.streamingLexIndex(sd, out, ckpt))
    }
    // regenerated source: same path, new bytes -> new (len, mtime) stamp ->
    // a DIFFERENT cache dir is built, so the old state cannot be served
    val tmp = Files.createTempDirectory("graft-stamp-regen").toString
    def regen(n: Int): Unit = docs.limit(n).coalesce(1)
      .write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    regen(8)
    def build() = Streams.ensureStreamedDocState(
      spark, spark.read.parquet(s"$tmp/documents.parquet"), tmp, "stampregen")(
      (sd, out, ckpt) => Streams.streamingLexIndex(sd, out, ckpt))
    val first = build()
    Thread.sleep(1100) // coarsest-filesystem mtime granularity is 1 s
    regen(6)
    val second = build()
    assert(first != second,
      "regenerated source served the stale cached state dir")
  }

  test("streamingMinhashBands (q259): pairs from the maintained band index equal batch minhashPairs; compaction preserves them") {
    val docs = Tables.documents(spark, TestSpark.sf0001)
    // a SPEC-private state, dropped first: this test COMPACTS its state,
    // and compacting the shared q259 cache would leave 1 epoch behind for
    // the next run's >=2-epoch assertion (the r14 full-suite rerun failure)
    Streams.dropStreamedTableState(
      spark, TestSpark.sf0001, "mhband-spec", "documents.parquet")
    val state = Streams.ensureStreamedDocState(
      spark, docs, TestSpark.sf0001, "mhband-spec")(
      (sd, out, ckpt) => Streams.streamingMinhashBands(sd, out, ckpt))
    assert(spark.read.parquet(state).select("epoch").distinct().count() >= 2)
    val batch = graft.operators.Dedup.minhashPairs(docs, 0.5)
      .collect().map(_.toSeq).toSet
    assert(batch.nonEmpty)
    assert(Streams.minhashPairsStreamedAt(spark, state, 0.5)
      .collect().map(_.toSeq).toSet == batch)
    Streams.compactMinhashBandsAt(spark, state)
    assert(spark.read.parquet(state).select("epoch").distinct().count() == 1)
    assert(Streams.minhashPairsStreamedAt(spark, state, 0.5)
      .collect().map(_.toSeq).toSet == batch)
    // band-state takedown (q305): rows are per-doc projections, so the
    // row filter is the complete erasure — pairs from the post-delete
    // state equal batch pairs among the SURVIVING docs
    Streams.deleteDocsAt(spark, state, pmod($"doc_id", lit(5)) === 3)
    val survivorBatch = graft.operators.Dedup
      .minhashPairs(docs.filter($"doc_id" % 5 =!= 3), 0.5)
      .collect().map(_.toSeq).toSet
    assert(Streams.minhashPairsStreamedAt(spark, state, 0.5)
      .collect().map(_.toSeq).toSet == survivorBatch)
    // the state is spec-private and now deleted-from: drop it so the next
    // run's >=2-epoch assertion rebuilds from scratch
    Streams.dropStreamedTableState(
      spark, TestSpark.sf0001, "mhband-spec", "documents.parquet")
  }

  test("streamingScoredVectors via two waves (q260): AUC from the maintained state equals batch separabilityAuc") {
    val embT = Tables.embeddings(spark, TestSpark.sf0001)
      .select("vec_id", "embedding", "label")
    val state = Streams.ensureStreamedTableState(
      spark, embT, TestSpark.sf0001, "scored",
      idCol = "vec_id", srcFile = "embeddings.parquet")(
      (sv, out, ckpt) => Streams.streamingScoredVectors(sv, out, ckpt))
    assert(spark.read.parquet(state).select("epoch").distinct().count() >= 2)
    val batch = graft.operators.Similarity.separabilityAuc(embT)
      .collect().map(_.toSeq).toSet
    assert(Streams.aucStreamedAt(spark, state)
      .collect().map(_.toSeq).toSet == batch)
  }

  test("streamingJsonlIngest: valid rows and corrupt report match the batch source; compaction preserves them") {
    val tmp = Files.createTempDirectory("graft-stream-jsonl").toString
    val (landing, out, ckpt) = (s"$tmp/landing", s"$tmp/out", s"$tmp/ckpt")
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(landing))
    java.nio.file.Files.write(java.nio.file.Paths.get(landing, "a.jsonl"),
      java.util.Arrays.asList(
        """{"doc_id": 1, "text": "alpha beta", "lang": "en", "source": "s1"}""",
        """not json""",
        """{"doc_id": 2, "text": "gamma", "lang": "de", "source": "s2"}"""))
    java.nio.file.Files.write(java.nio.file.Paths.get(landing, "b.jsonl"),
      java.util.Arrays.asList(
        """{"doc_id": 3, "text": "delta", "lang": "en", "source": "s1"}""",
        """{"broken": """,
        "",
        """{"doc_id": 4, "text": "eps", "lang": "fr", "source": "s3"}"""))
    val stream = Streams.streamingJsonlIngest(spark, landing, out, ckpt)
    stream.awaitTermination(120000)
    assert(spark.read.parquet(out).select("epoch").distinct().count() >= 1)
    val src = graft.sources.JsonlCorpusSource
    val batchRaw = src.read(spark, landing)
    val batchValid = src.valid(batchRaw)
      .as[(Long, String, String, String)].collect().toSet
    val batchReport = src.ingestReport(batchRaw)
      .as[(Long, Long, String)].collect().head
    def checkAll(): Unit = {
      assert(Streams.jsonlValidAt(spark, out)
        .as[(Long, String, String, String)].collect().toSet == batchValid)
      assert(Streams.jsonlIngestReportAt(spark, out)
        .as[(Long, Long, String)].collect().head == batchReport)
    }
    assert(batchReport._1 == 4L && batchReport._2 == 2L)
    checkAll()
    Streams.compactJsonlIngestAt(spark, out)
    assert(spark.read.parquet(out).select("epoch").distinct().count() == 1)
    checkAll()
  }

  test("streamingScoredVectors: folded scores answer AUC, lift, and calibration as batch; compaction preserves them") {
    val tmp = Files.createTempDirectory("graft-stream-scored").toString
    val (landing, sPath, ckpt) = (s"$tmp/landing", s"$tmp/scored", s"$tmp/ckpt")
    val emb = Tables.embeddings(spark, TestSpark.sf0001)
      .select("vec_id", "embedding", "label").cache()
    // appended corpus: two batches split by vec_id parity
    emb.filter($"vec_id" % 2 === 0).coalesce(1).write.mode("append").parquet(landing)
    emb.filter($"vec_id" % 2 === 1).coalesce(1).write.mode("append").parquet(landing)
    val stream = spark.readStream.schema(Streams.labeledEmbeddingsSchema)
      .option("maxFilesPerTrigger", "1").parquet(landing)
    Streams.streamingScoredVectors(stream, sPath, ckpt).awaitTermination(120000)
    assert(spark.read.parquet(sPath).select("epoch").distinct().count() >= 2)
    val sim = graft.operators.Similarity
    val aucBatch = sim.separabilityAuc(emb)
      .as[(Int, Long, Long, Double)].collect().toSeq
    val liftBatch = sim.liftTable(emb)
      .as[(Int, Long, Long, Double, Option[Double], Option[Double])].collect().toSeq
    val calBatch = sim.calibrationTable(emb)
      .as[(Int, Long, Long, Double, Double, Double)].collect().toSeq
    def checkAll(): Unit = {
      assert(Streams.aucStreamedAt(spark, sPath)
        .as[(Int, Long, Long, Double)].collect().toSeq == aucBatch)
      assert(Streams.liftStreamedAt(spark, sPath)
        .as[(Int, Long, Long, Double, Option[Double], Option[Double])]
        .collect().toSeq == liftBatch)
      assert(Streams.calibrationStreamedAt(spark, sPath)
        .as[(Int, Long, Long, Double, Double, Double)].collect().toSeq == calBatch)
    }
    assert(aucBatch.nonEmpty && liftBatch.nonEmpty && calBatch.nonEmpty)
    checkAll()
    Streams.compactScoredVectorsAt(spark, sPath)
    assert(spark.read.parquet(sPath).select("epoch").distinct().count() == 1)
    checkAll()
    emb.unpersist()
  }

  test("streamingGroupTermCounts: folded counts answer zipf, entropy, and JSD as batch; compaction preserves them") {
    val tmp = Files.createTempDirectory("graft-stream-gtc").toString
    val (landing, cPath, ckpt) = (s"$tmp/landing", s"$tmp/counts", s"$tmp/ckpt")
    val docs = Tables.documents(spark, TestSpark.sf0001).cache()
    docs.filter($"doc_id" % 2 === 0).coalesce(1).write.mode("append").parquet(landing)
    docs.filter($"doc_id" % 2 === 1).coalesce(1).write.mode("append").parquet(landing)
    val stream = spark.readStream.schema(Streams.documentsSchema)
      .option("maxFilesPerTrigger", "1").parquet(landing)
    Streams.streamingGroupTermCounts(stream, cPath, ckpt).awaitTermination(120000)
    assert(spark.read.parquet(cPath).select("epoch").distinct().count() >= 2)
    val ta = graft.operators.TextAnalysis
    val zipfB = ta.zipfSlope(docs)
      .as[(String, Long, Double, Double)].collect().toSet
    val entB = ta.sourceEntropy(docs)
      .as[(String, Long, Long, Double, Double)].collect().toSet
    val jsdB = ta.jsdSources(docs)
      .as[(String, String, Long, Double)].collect().toSet
    def check(): Unit = {
      assert(Streams.zipfSlopeStreamedAt(spark, cPath)
        .as[(String, Long, Double, Double)].collect().toSet == zipfB)
      assert(Streams.sourceEntropyStreamedAt(spark, cPath)
        .as[(String, Long, Long, Double, Double)].collect().toSet == entB)
      assert(Streams.jsdSourcesStreamedAt(spark, cPath)
        .as[(String, String, Long, Double)].collect().toSet == jsdB)
    }
    assert(zipfB.nonEmpty && entB.nonEmpty && jsdB.nonEmpty)
    check()
    Streams.compactGroupTermCountsAt(spark, cPath)
    assert(spark.read.parquet(cPath).select("epoch").distinct().count() == 1)
    check()
    docs.unpersist()
  }

  test("streamingLexIndex: maintained BM25 matches a from-scratch index; compaction preserves it") {
    val tmp = Files.createTempDirectory("graft-stream-lex").toString
    val (landing, idxPath, ckpt) = (s"$tmp/landing", s"$tmp/lex", s"$tmp/ckpt")
    val docs = Tables.documents(spark, TestSpark.sf0001).cache()
    docs.filter($"doc_id" % 2 === 0).coalesce(1).write.mode("append").parquet(landing)
    docs.filter($"doc_id" % 2 === 1).coalesce(1).write.mode("append").parquet(landing)
    val stream = spark.readStream.schema(Streams.documentsSchema)
      .option("maxFilesPerTrigger", "1").parquet(landing)
    Streams.streamingLexIndex(stream, idxPath, ckpt).awaitTermination(120000)
    assert(spark.read.parquet(idxPath).select("epoch").distinct().count() >= 2)
    val terms = Seq("join", "hash", "customer") // the q110 term set
    val ta = graft.operators.TextAnalysis
    def rows(df: org.apache.spark.sql.DataFrame) = df
      .as[(Long, Long, Long, Long, Long, Double)].collect().toSet
    val batch = rows(ta.bm25Indexed(
      ta.postings(docs), ta.docLengths(docs), terms))
    val streamed = rows(Streams.bm25StreamedAt(spark, idxPath, terms))
    assert(streamed == batch && streamed.nonEmpty)
    // doc-length rows count EVERY doc (N/avgdl parity is part of the score)
    assert(Streams.lexDocLensAt(spark, idxPath).count() == docs.count())
    // the SAME maintained state answers TF-IDF — all-docs frame, byte-equal
    // to the full-scan scorer (q98's operator) over the union corpus
    val tfTerms = Seq("transfer", "credit", "university")
    val tfBatch = rows(ta.tfidf(docs, tfTerms))
    val tfStreamed = rows(Streams.tfidfStreamedAt(spark, idxPath, tfTerms))
    assert(tfStreamed == tfBatch && tfStreamed.size == docs.count())
    // ...and the vocabulary heavy-hitters (q72's operator) — ordered parity
    def tkRows(df: org.apache.spark.sql.DataFrame) =
      df.as[(String, Long, Long)].collect().toSeq
    val tkBatch = tkRows(ta.topTokens(docs, 20))
    assert(tkRows(Streams.topTokensStreamedAt(spark, idxPath, 20)) == tkBatch
      && tkBatch.nonEmpty)
    // ...and term burstiness (q184's operator) — same postings quantities
    def buRows(df: org.apache.spark.sql.DataFrame) =
      df.as[(String, Long, Long, Double)].collect().toSeq
    val buBatch = buRows(ta.termBurstiness(docs))
    assert(buRows(Streams.burstinessStreamedAt(spark, idxPath)) == buBatch
      && buBatch.nonEmpty)
    // compaction: one epoch partition left, scores unchanged
    Streams.compactLexIndexAt(spark, idxPath)
    assert(spark.read.parquet(idxPath).select("epoch").distinct().count() == 1)
    assert(rows(Streams.bm25StreamedAt(spark, idxPath, terms)) == batch)
    assert(rows(Streams.tfidfStreamedAt(spark, idxPath, tfTerms)) == tfBatch)
    assert(tkRows(Streams.topTokensStreamedAt(spark, idxPath, 20)) == tkBatch)
    docs.unpersist()
  }

  test("deleteDocsAt (q298): lex-state takedown shifts every corpus statistic; empty delete refused; epochs preserved") {
    val tmp = Files.createTempDirectory("graft-lex-del").toString
    val (landing, idxPath, ckpt) = (s"$tmp/landing", s"$tmp/lex", s"$tmp/ckpt")
    val docs = Tables.documents(spark, TestSpark.sf0001).cache()
    docs.filter($"doc_id" % 2 === 0).coalesce(1).write.mode("append").parquet(landing)
    docs.filter($"doc_id" % 2 === 1).coalesce(1).write.mode("append").parquet(landing)
    val stream = spark.readStream.schema(Streams.documentsSchema)
      .option("maxFilesPerTrigger", "1").parquet(landing)
    Streams.streamingLexIndex(stream, idxPath, ckpt).awaitTermination(120000)
    val epochsBefore = spark.read.parquet(idxPath)
      .select("epoch").distinct().count()
    assert(epochsBefore >= 2)
    Streams.deleteDocsAt(spark, idxPath, pmod($"doc_id", lit(5)) === 3)
    // layout preserved: the delete filters rows, it does not compact
    assert(spark.read.parquet(idxPath).select("epoch").distinct().count()
      == epochsBefore)
    // every reader equals the batch operator over the SURVIVING corpus —
    // the raw-row design means df/N/avgdl shift with the survivors, so
    // this checks the global statistics, not just row presence
    val survivors = docs.filter($"doc_id" % 5 =!= 3)
    val nDel = docs.count() - survivors.count()
    assert(nDel > 0)
    val terms = Seq("join", "hash", "customer")
    val ta = graft.operators.TextAnalysis
    def rows(df: org.apache.spark.sql.DataFrame) = df
      .as[(Long, Long, Long, Long, Long, Double)].collect().toSet
    val batch = rows(ta.bm25Indexed(
      ta.postings(survivors), ta.docLengths(survivors), terms))
    assert(rows(Streams.bm25StreamedAt(spark, idxPath, terms)) == batch
      && batch.nonEmpty)
    // the doc-length table (the N/avgdl source) dropped exactly the
    // deleted docs
    assert(Streams.lexDocLensAt(spark, idxPath).count() == survivors.count())
    // no deleted doc is reachable through ANY reader
    assert(Streams.tfidfStreamedAt(spark, idxPath,
        Seq("transfer", "credit", "university"))
      .filter(pmod($"doc_id", lit(5)) === 3).count() == 0)
    // deleting everything is refused, and the state stays readable
    intercept[IllegalArgumentException](
      Streams.deleteDocsAt(spark, idxPath, lit(true)))
    assert(rows(Streams.bm25StreamedAt(spark, idxPath, terms)) == batch)
    docs.unpersist()
  }

  test("upsertDocsAt (q302): readmit-after-delete is an identity; replace-by-id purges old rows; pure append adds one epoch") {
    val tmp = Files.createTempDirectory("graft-lex-upsert").toString
    val (landing, idxPath, ckpt) = (s"$tmp/landing", s"$tmp/lex", s"$tmp/ckpt")
    val docs = Tables.documents(spark, TestSpark.sf0001).cache()
    docs.filter($"doc_id" % 2 === 0).coalesce(1).write.mode("append").parquet(landing)
    docs.filter($"doc_id" % 2 === 1).coalesce(1).write.mode("append").parquet(landing)
    val stream = spark.readStream.schema(Streams.documentsSchema)
      .option("maxFilesPerTrigger", "1").parquet(landing)
    Streams.streamingLexIndex(stream, idxPath, ckpt).awaitTermination(120000)
    val terms = Seq("join", "hash", "customer")
    val ta = graft.operators.TextAnalysis
    def rows(df: org.apache.spark.sql.DataFrame) = df
      .as[(Long, Long, Long, Long, Long, Double)].collect().toSet
    val full = rows(ta.bm25Indexed(
      ta.postings(docs), ta.docLengths(docs), terms))
    // takedown then reingest: every reader returns to the never-deleted
    // answer, global statistics included
    val pred = pmod($"doc_id", lit(5)) === 3
    Streams.deleteDocsAt(spark, idxPath, pred)
    assert(rows(Streams.bm25StreamedAt(spark, idxPath, terms)) != full)
    Streams.upsertDocsAt(spark, idxPath, docs.filter(pred))
    assert(rows(Streams.bm25StreamedAt(spark, idxPath, terms)) == full)
    assert(Streams.lexDocLensAt(spark, idxPath).count() == docs.count())
    // a pure append lands exactly one new epoch partition (no rewrite)
    val epochsBefore = spark.read.parquet(idxPath)
      .select("epoch").distinct().count()
    // replace-by-id: upserting a CHANGED doc purges its old rows — the
    // state must score the new text, not the union of old and new
    val changedId = docs.filter(pred).select("doc_id").as[Long].head()
    val changed = docs.filter($"doc_id" === changedId)
      .withColumn("text", lit("join join join"))
    Streams.upsertDocsAt(spark, idxPath, changed)
    val scored = Streams.bm25StreamedAt(spark, idxPath, terms)
      .filter($"doc_id" === changedId)
      .as[(Long, Long, Long, Long, Long, Double)].collect()
    assert(scored.length == 1 && scored.head._2 == 3L,
      s"replaced doc must have dl=3 (the new text), got ${scored.toSeq}")
    assert(scored.head._3 == 3L, "tf(join) of the replaced doc must be 3")
    assert(Streams.lexDocLensAt(spark, idxPath).count() == docs.count())
    // restoring the original doc heals back to the full-corpus answer
    Streams.upsertDocsAt(spark, idxPath, docs.filter($"doc_id" === changedId))
    assert(rows(Streams.bm25StreamedAt(spark, idxPath, terms)) == full)
    assert(spark.read.parquet(idxPath).select("epoch").distinct().count()
      >= epochsBefore)
    docs.unpersist()
  }

  test("epoch-partition retry: re-writing an epoch's partial leaves the fold unchanged") {
    // The exactly-once contract every epoch-partition twin relies on
    // (BPE vocab, CMS grid, DDSketch buckets, KMV sketch): a RETRIED batch
    // re-derives the same partial and dynamic-overwrites exactly its own
    // epoch partition, so the folded state cannot double-count. Simulate
    // the retry by re-writing one epoch's rows through the same write path.
    val tmp = Files.createTempDirectory("graft-epoch-retry").toString
    val (landing, vocabPath, ckpt) = (s"$tmp/landing", s"$tmp/vocab", s"$tmp/ckpt")
    val docs = Tables.documents(spark, TestSpark.sf0001)
    docs.filter($"doc_id" % 2 === 0).coalesce(1).write.mode("append").parquet(landing)
    docs.filter($"doc_id" % 2 === 1).coalesce(1).write.mode("append").parquet(landing)
    val stream = spark.readStream.schema(Streams.documentsSchema)
      .option("maxFilesPerTrigger", "1").parquet(landing)
    Streams.streamingBpeVocab(stream, vocabPath, ckpt).awaitTermination(120000)
    val before = Streams.bpeVocabAt(spark, vocabPath)
      .as[(String, Long)].collect().toSet
    // retry epoch 0: its recomputed partial is byte-identical, and the
    // dynamic overwrite replaces only partition epoch=0
    val epoch0 = spark.read.parquet(vocabPath).filter($"epoch" === 0)
      .select("word", "n", "epoch").cache()
    assert(epoch0.count() > 0)
    epoch0.write.mode("overwrite")
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy("epoch").parquet(vocabPath)
    val after = Streams.bpeVocabAt(spark, vocabPath)
      .as[(String, Long)].collect().toSet
    assert(after == before, "retried epoch changed the folded vocab")
    epoch0.unpersist()
  }

  test("compaction crash window self-heals: staged copy renamed into place on next read") {
    // Simulate a crash BETWEEN compactEpochs' delete and rename: the
    // destination is gone and the only copy of the maintained state sits
    // in the staging dir. Any subsequent reader must complete the swap
    // (healCompaction) instead of failing or losing the vocab.
    val tmp = Files.createTempDirectory("graft-compact-crash").toString
    val vocabPath = s"$tmp/vocab"
    val docs = Tables.documents(spark, TestSpark.sf0001)
    def half(m: Int, epoch: Long) =
      graft.operators.Bpe.wordCounts(docs.filter($"doc_id" % 2 === m))
        .withColumn("epoch", lit(epoch))
    half(0, 0L).write.mode("overwrite")
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy("epoch").parquet(vocabPath)
    half(1, 1L).write.mode("overwrite")
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy("epoch").parquet(vocabPath)
    val expected = Streams.bpeVocabAt(spark, vocabPath)
      .as[(String, Long)].collect().toMap
    // stage the compacted copy exactly as compactEpochs does, then "crash":
    // delete the destination without renaming the staging dir into place
    Streams.bpeVocabAt(spark, vocabPath).withColumn("epoch", lit(-1L))
      .write.mode("overwrite").partitionBy("epoch")
      .parquet(s"$vocabPath.__compact_staging")
    val fs = org.apache.hadoop.fs.FileSystem.get(
      spark.sparkContext.hadoopConfiguration)
    assert(fs.delete(new org.apache.hadoop.fs.Path(vocabPath), true))
    // next read self-heals: staged copy becomes the destination, totals intact
    val healed = Streams.bpeVocabAt(spark, vocabPath)
      .as[(String, Long)].collect().toMap
    assert(healed == expected && healed.nonEmpty)
    assert(!fs.exists(new org.apache.hadoop.fs.Path(s"$vocabPath.__compact_staging")))
    // and a fresh compaction over the healed state still works
    Streams.compactBpeVocabAt(spark, vocabPath)
    assert(Streams.bpeVocabAt(spark, vocabPath)
      .as[(String, Long)].collect().toMap == expected)
  }

  test("streamingCmsGrid: folded partial grids equal the batch sketch; probe parity") {
    val tmp = Files.createTempDirectory("graft-stream-cms").toString
    val (landing, gridPath, ckpt) = (s"$tmp/landing", s"$tmp/grid", s"$tmp/ckpt")
    val docs = Tables.documents(spark, TestSpark.sf0001).cache()
    docs.filter($"doc_id" % 2 === 0).coalesce(1).write.mode("append").parquet(landing)
    docs.filter($"doc_id" % 2 === 1).coalesce(1).write.mode("append").parquet(landing)
    val stream = spark.readStream.schema(Streams.documentsSchema)
      .option("maxFilesPerTrigger", "1").parquet(landing)
    val q = Streams.streamingCmsGrid(stream, gridPath, ckpt)
    q.awaitTermination(120000)
    assert(spark.read.parquet(gridPath).select("epoch").distinct().count() >= 2)
    // additive partials fold to exactly the single-pass grid
    val streamedGrid = Streams.cmsGridAt(spark, gridPath)
      .as[(Int, Int, Long)].collect().toSet
    val tcnt = graft.operators.Sketches.tokenCounts(docs)
    val batchGrid = graft.operators.Sketches.cmsGrid(tcnt)
      .as[(Int, Int, Long)].collect().toSet
    assert(streamedGrid == batchGrid && streamedGrid.nonEmpty)
    // probing the maintained grid reproduces the batch heavy hitters
    val streamedTop = graft.operators.Sketches
      .cmsProbe(Streams.cmsGridAt(spark, gridPath), tcnt)
      .as[(String, Long, Long, Long)].collect().toSeq
    val batchTop = graft.operators.Sketches.cmsTopK(docs)
      .as[(String, Long, Long, Long)].collect().toSeq
    assert(streamedTop == batchTop && streamedTop.nonEmpty)
    docs.unpersist()
  }

  test("streamingDdBuckets: folded partials answer the same quantiles as batch") {
    val tmp = Files.createTempDirectory("graft-stream-dd").toString
    val (landing, bPath, ckpt) = (s"$tmp/landing", s"$tmp/buckets", s"$tmp/ckpt")
    val li = Tables.lineitem(spark, TestSpark.sf0001)
      .select("l_orderkey", "l_returnflag", "l_extendedprice").cache()
    li.filter($"l_orderkey" % 2 === 0).coalesce(1).write.mode("append").parquet(landing)
    li.filter($"l_orderkey" % 2 === 1).coalesce(1).write.mode("append").parquet(landing)
    val stream = spark.readStream
      .schema("l_orderkey BIGINT, l_returnflag STRING, l_extendedprice DOUBLE")
      .option("maxFilesPerTrigger", "1").parquet(landing)
    Streams.streamingDdBuckets(stream, "l_returnflag", "l_extendedprice", bPath, ckpt)
      .awaitTermination(120000)
    assert(spark.read.parquet(bPath).select("epoch").distinct().count() >= 2)
    val folded = Streams.ddBucketsAt(spark, bPath, "l_returnflag")
      .as[(String, Long, Long)].collect().toSet
    val batchBuckets = graft.operators.Sketches
      .ddBuckets(li, "l_returnflag", "l_extendedprice")
      .as[(String, Long, Long)].collect().toSet
    assert(folded == batchBuckets && folded.nonEmpty)
    val streamedQ = graft.operators.Sketches.ddQuantilesFromBuckets(
        Streams.ddBucketsAt(spark, bPath, "l_returnflag"), "l_returnflag")
      .as[(String, Double, Long, Long, Double)].collect().toSet
    val batchQ = graft.operators.Sketches.ddSketchQuantiles(
        li, "l_returnflag", "l_extendedprice")
      .as[(String, Double, Long, Long, Double)].collect().toSet
    assert(streamedQ == batchQ && streamedQ.nonEmpty)
    li.unpersist()
  }

  test("streamingKmvSketch: folded partials equal the batch sketch and its overlaps") {
    val tmp = Files.createTempDirectory("graft-stream-kmv").toString
    val (landing, skPath, ckpt) = (s"$tmp/landing", s"$tmp/sketch", s"$tmp/ckpt")
    val ev = Tables.events(spark, TestSpark.sf0001).cache()
    ev.filter($"event_id" % 2 === 0).coalesce(1).write.mode("append").parquet(landing)
    ev.filter($"event_id" % 2 === 1).coalesce(1).write.mode("append").parquet(landing)
    val stream = spark.readStream.schema(Streams.eventsSchema)
      .option("maxFilesPerTrigger", "1").parquet(landing)
    Streams.streamingKmvSketch(stream, "event_type", "user_id", skPath, ckpt)
      .awaitTermination(120000)
    assert(spark.read.parquet(skPath).select("epoch").distinct().count() >= 2)
    val folded = Streams.kmvSketchAt(spark, skPath)
      .as[(String, Long)].collect().toSet
    val batchSk = graft.operators.Sketches
      .kmvSketch(ev, "event_type", "user_id")
      .as[(String, Long)].collect().toSet
    assert(folded == batchSk && folded.nonEmpty)
    val streamedOv = graft.operators.Sketches
      .kmvOverlapFromSketches(Streams.kmvSketchAt(spark, skPath))
      .select($"g_a", $"g_b", $"k_used", $"union_est", $"jaccard", $"inter_est")
      .as[(String, String, Long, Double, Double, Double)].collect().toSet
    val batchOv = graft.operators.Sketches
      .kmvOverlap(ev, "event_type", "user_id")
      .select($"g_a", $"g_b", $"k_used", $"union_est", $"jaccard", $"inter_est")
      .as[(String, String, Long, Double, Double, Double)].collect().toSet
    assert(streamedOv == batchOv && streamedOv.nonEmpty)
    // compaction collapses the epoch partials into one partition and the
    // k-min-of-distinct fold keeps the sketch (hence overlaps) identical
    Streams.compactKmvSketchAt(spark, skPath)
    assert(spark.read.parquet(skPath).select("epoch").distinct().count() == 1)
    assert(Streams.kmvSketchAt(spark, skPath)
      .as[(String, Long)].collect().toSet == batchSk)
    ev.unpersist()
  }

  test("streamingKsCounts: folded partials answer the same KS drift as batch; compaction preserves it") {
    val tmp = Files.createTempDirectory("graft-stream-ks").toString
    val (landing, ksPath, ckpt) = (s"$tmp/landing", s"$tmp/counts", s"$tmp/ckpt")
    val ev = Tables.events(spark, TestSpark.sf0001).cache()
    ev.filter($"event_id" % 2 === 0).coalesce(1).write.mode("append").parquet(landing)
    ev.filter($"event_id" % 2 === 1).coalesce(1).write.mode("append").parquet(landing)
    val stream = spark.readStream.schema(Streams.eventsSchema)
      .option("maxFilesPerTrigger", "1").parquet(landing)
    Streams.streamingKsCounts(stream, ksPath, ckpt).awaitTermination(120000)
    assert(spark.read.parquet(ksPath).select("epoch").distinct().count() >= 2)
    val batchKs = graft.operators.EventAnalytics.ksDrift(ev)
      .as[(String, Long, Long, Long, Double)].collect().toSet
    assert(Streams.ksDriftAt(spark, ksPath)
      .as[(String, Long, Long, Long, Double)].collect().toSet == batchKs)
    assert(batchKs.nonEmpty)
    // the SAME maintained state answers PSI (band = f(stored value))
    val batchPsi = graft.operators.EventAnalytics.psiDrift(ev)
      .as[(String, Long, Long, Long, Double)].collect().toSet
    assert(Streams.psiDriftAt(spark, ksPath)
      .as[(String, Long, Long, Long, Double)].collect().toSet == batchPsi)
    assert(batchPsi.nonEmpty)
    Streams.compactKsCountsAt(spark, ksPath)
    assert(spark.read.parquet(ksPath).select("epoch").distinct().count() == 1)
    assert(Streams.ksDriftAt(spark, ksPath)
      .as[(String, Long, Long, Long, Double)].collect().toSet == batchKs)
    assert(Streams.psiDriftAt(spark, ksPath)
      .as[(String, Long, Long, Long, Double)].collect().toSet == batchPsi)
    ev.unpersist()
  }

  test("streamingLangCounts: folded partials answer the same mixture as batch; compaction preserves it") {
    val tmp = Files.createTempDirectory("graft-stream-mix").toString
    val (landing, mixPath, ckpt) = (s"$tmp/landing", s"$tmp/counts", s"$tmp/ckpt")
    val docs = Tables.documents(spark, TestSpark.sf0001).cache()
    docs.filter($"doc_id" % 2 === 0).coalesce(1).write.mode("append").parquet(landing)
    docs.filter($"doc_id" % 2 === 1).coalesce(1).write.mode("append").parquet(landing)
    val stream = spark.readStream.schema(Streams.documentsSchema)
      .option("maxFilesPerTrigger", "1").parquet(landing)
    Streams.streamingLangCounts(stream, mixPath, ckpt).awaitTermination(120000)
    assert(spark.read.parquet(mixPath).select("epoch").distinct().count() >= 2)
    val batchMix = graft.operators.Sampling.temperatureMixture(docs)
      .as[(String, Long, Long, Double, Long, Double)].collect().toSet
    assert(Streams.temperatureMixtureAt(spark, mixPath)
      .as[(String, Long, Long, Double, Long, Double)].collect().toSet == batchMix)
    assert(batchMix.nonEmpty)
    Streams.compactLangCountsAt(spark, mixPath)
    assert(spark.read.parquet(mixPath).select("epoch").distinct().count() == 1)
    assert(Streams.temperatureMixtureAt(spark, mixPath)
      .as[(String, Long, Long, Double, Long, Double)].collect().toSet == batchMix)
    docs.unpersist()
  }

  test("streamingRfmStats: folded partials answer the same segments as batch; compaction preserves it") {
    val tmp = Files.createTempDirectory("graft-stream-rfm").toString
    val (landing, rfmPath, ckpt) = (s"$tmp/landing", s"$tmp/stats", s"$tmp/ckpt")
    val ev = Tables.events(spark, TestSpark.sf0001).cache()
    // split by event id so one user's purchases straddle both batches —
    // the max/sum merge is what's under test
    ev.filter($"event_id" % 2 === 0).coalesce(1).write.mode("append").parquet(landing)
    ev.filter($"event_id" % 2 === 1).coalesce(1).write.mode("append").parquet(landing)
    val stream = spark.readStream.schema(Streams.eventsSchema)
      .option("maxFilesPerTrigger", "1").parquet(landing)
    Streams.streamingRfmStats(stream, rfmPath, ckpt).awaitTermination(120000)
    assert(spark.read.parquet(rfmPath).select("epoch").distinct().count() >= 2)
    val batchRfm = graft.operators.EventAnalytics.rfmSegments(ev)
      .as[(Long, Long, Long, Long, Int, Int, Int, String)].collect().toSet
    assert(Streams.rfmSegmentsAt(spark, rfmPath)
      .as[(Long, Long, Long, Long, Int, Int, Int, String)].collect().toSet == batchRfm)
    assert(batchRfm.nonEmpty)
    Streams.compactRfmStatsAt(spark, rfmPath)
    assert(spark.read.parquet(rfmPath).select("epoch").distinct().count() == 1)
    assert(Streams.rfmSegmentsAt(spark, rfmPath)
      .as[(Long, Long, Long, Long, Int, Int, Int, String)].collect().toSet == batchRfm)
    ev.unpersist()
  }

  test("streamingKnnAudit: folded candidate partials answer the same confusion and noise as batch; compaction preserves it") {
    val tmp = Files.createTempDirectory("graft-stream-knn").toString
    val (landing, statePath, ckpt) = (s"$tmp/landing", s"$tmp/cands", s"$tmp/ckpt")
    val emb = Tables.embeddings(spark, TestSpark.sf0001)
      .select("vec_id", "embedding", "label").cache()
    // split by vec_id parity so every probe's top-k straddles both
    // batches — the per-probe top-k MERGE is what's under test
    emb.filter($"vec_id" % 2 === 0).coalesce(1).write.mode("append").parquet(landing)
    emb.filter($"vec_id" % 2 === 1).coalesce(1).write.mode("append").parquet(landing)
    // pinned probe set = the batch audits' own hash-ordered sample; at
    // 500 < 4096 vectors it covers the collection, so the maintained
    // state must reproduce BOTH batch audits exactly
    val probes = operators.Similarity.knnProbes(emb, 4096).cache()
    val stream = spark.readStream.schema(Streams.labeledEmbeddingsSchema)
      .option("maxFilesPerTrigger", "1").parquet(landing)
    Streams.streamingKnnAudit(stream, probes, statePath, ckpt, k = 4)
      .awaitTermination(120000)
    assert(spark.read.parquet(statePath).select("epoch").distinct().count() >= 2)
    val batchConf = operators.Similarity.knnConfusion(emb, k = 4)
      .as[(Int, Int, Long, Double)].collect().toSet
    val batchNoise = operators.Similarity.knnLabelNoise(emb, k = 4)
      .as[(Long, Int, Long, Double, Boolean)].collect().toSet
    assert(batchConf.nonEmpty && batchNoise.nonEmpty)
    assert(Streams.knnConfusionAt(spark, statePath, k = 4)
      .as[(Int, Int, Long, Double)].collect().toSet == batchConf)
    assert(Streams.knnLabelNoiseAt(spark, statePath, k = 4)
      .as[(Long, Int, Long, Double, Boolean)].collect().toSet == batchNoise)
    // hubness rides the same state (fixed-point candidate ranks): parity
    // vs the fold over a one-shot candidate build on the union corpus
    val batchHubs = operators.Similarity.hubnessFromCandidates(
        operators.Similarity.knnCandidates(emb, probes, 4))
      .as[(Long, Long, Double)].collect().toSeq
    assert(batchHubs.nonEmpty)
    assert(Streams.knnHubnessAt(spark, statePath, k = 4)
      .as[(Long, Long, Double)].collect().toSeq == batchHubs)
    Streams.compactKnnAuditAt(spark, statePath, k = 4)
    assert(spark.read.parquet(statePath).select("epoch").distinct().count() == 1)
    assert(Streams.knnConfusionAt(spark, statePath, k = 4)
      .as[(Int, Int, Long, Double)].collect().toSet == batchConf)
    assert(Streams.knnHubnessAt(spark, statePath, k = 4)
      .as[(Long, Long, Double)].collect().toSeq == batchHubs)
    probes.unpersist(); emb.unpersist()
  }

  test("streamingCentroidDrift: folded partials answer the same drift as batch; compaction preserves it") {
    val tmp = Files.createTempDirectory("graft-stream-drift").toString
    val (landing, statePath, ckpt) = (s"$tmp/landing", s"$tmp/drift", s"$tmp/ckpt")
    val emb = Tables.embeddings(spark, TestSpark.sf0001)
      .select("vec_id", "embedding", "label").cache()
    // batches split by vec_id % 3 so both drift HALVES (vec_id % 2)
    // straddle both batches — the additive sum merge is what's under test
    emb.filter($"vec_id" % 3 === 0).coalesce(1).write.mode("append").parquet(landing)
    emb.filter($"vec_id" % 3 =!= 0).coalesce(1).write.mode("append").parquet(landing)
    val stream = spark.readStream.schema(Streams.labeledEmbeddingsSchema)
      .option("maxFilesPerTrigger", "1").parquet(landing)
    Streams.streamingCentroidDrift(stream, statePath, ckpt).awaitTermination(120000)
    assert(spark.read.parquet(statePath).select("epoch").distinct().count() >= 2)
    val batchDrift = operators.Similarity.centroidDrift(emb)
      .as[(Int, Long, Long, Double)].collect().toSet
    assert(batchDrift.nonEmpty)
    assert(Streams.centroidDriftAt(spark, statePath)
      .as[(Int, Long, Long, Double)].collect().toSet == batchDrift)
    Streams.compactCentroidDriftAt(spark, statePath)
    assert(spark.read.parquet(statePath).select("epoch").distinct().count() == 1)
    assert(Streams.centroidDriftAt(spark, statePath)
      .as[(Int, Long, Long, Double)].collect().toSet == batchDrift)
    emb.unpersist()
  }

  test("streamingNovelty: per-batch novelty over ordered arrival equals batch shingleNovelty") {
    val tmp = Files.createTempDirectory("graft-stream-novelty").toString
    val (landing, statePath, outPath, ckpt) =
      (s"$tmp/landing", s"$tmp/state", s"$tmp/out", s"$tmp/ckpt")
    val docs = Tables.documents(spark, TestSpark.sf0001).cache()
    // doc_id-ORDERED halves: novelty is an arrival-order semantics, so the
    // stream must see lower ids first for parity with the batch operator
    val mid = 250L
    docs.filter($"doc_id" < mid).coalesce(1).write.mode("append").parquet(landing)
    docs.filter($"doc_id" >= mid).coalesce(1).write.mode("append").parquet(landing)
    val stream = spark.readStream.schema(Streams.documentsSchema)
      .option("maxFilesPerTrigger", "1").parquet(landing)
    Streams.streamingNovelty(stream, statePath, outPath, ckpt)
      .awaitTermination(120000)
    assert(spark.read.parquet(outPath).select("epoch").distinct().count() >= 2)
    val streamed = Streams.noveltyAt(spark, outPath)
      .as[(Long, Long, Long, Double)].collect().toSet
    val batch = graft.operators.Dedup.shingleNovelty(docs)
      .as[(Long, Long, Long, Double)].collect().toSet
    assert(streamed == batch && streamed.nonEmpty)
    // the maintained state is exactly the corpus-wide first-occurrence table
    val state = spark.read.parquet(statePath)
      .as[(String, Long)].collect().toMap
    val expect = graft.operators.Dedup.shingles(docs)
      .groupBy("shingle").agg(min("doc_id").as("first_doc"))
      .as[(String, Long)].collect().toMap
    assert(state == expect)
    docs.unpersist()
  }

  test("streamingBlockDedup: ordered-arrival rewrites equal batch blockDedup") {
    val tmp = Files.createTempDirectory("graft-stream-blockdedup").toString
    val (landing, statePath, outPath, ckpt) =
      (s"$tmp/landing", s"$tmp/state", s"$tmp/out", s"$tmp/ckpt")
    val docs = Tables.documents(spark, TestSpark.sf0001).cache()
    val mid = 250L
    docs.filter($"doc_id" < mid).coalesce(1).write.mode("append").parquet(landing)
    docs.filter($"doc_id" >= mid).coalesce(1).write.mode("append").parquet(landing)
    val stream = spark.readStream.schema(Streams.documentsSchema)
      .option("maxFilesPerTrigger", "1").parquet(landing)
    Streams.streamingBlockDedup(stream, statePath, outPath, ckpt)
      .awaitTermination(120000)
    assert(spark.read.parquet(outPath).select("epoch").distinct().count() >= 2)
    val streamed = Streams.blockDedupAt(spark, outPath)
      .as[(Long, Long, Long, String)].collect().toSet
    val batch = graft.operators.Dedup.blockDedup(docs)
      .as[(Long, Long, Long, String)].collect().toSet
    assert(streamed == batch && streamed.nonEmpty)
    docs.unpersist()
  }

  test("streamingDsirFeatures: selection from maintained state matches batch dsirSelect on the appended pool") {
    val tmp = Files.createTempDirectory("graft-stream-dsir").toString
    val (landing, featPath, ckpt) = (s"$tmp/landing", s"$tmp/feat", s"$tmp/ckpt")
    val docs = Tables.documents(spark, TestSpark.sf0001).cache()
    val raw = docs.filter($"lang" =!= "en")
    val target = docs.filter($"lang" === "en")
    // the raw pool arrives in two appends — the corpus-refresh scenario
    raw.filter($"doc_id" % 2 === 0).coalesce(1).write.mode("append").parquet(landing)
    raw.filter($"doc_id" % 2 === 1).coalesce(1).write.mode("append").parquet(landing)
    val stream = spark.readStream.schema(Streams.documentsSchema)
      .option("maxFilesPerTrigger", "1").parquet(landing)
    Streams.streamingDsirFeatures(stream, featPath, ckpt).awaitTermination(120000)
    assert(spark.read.parquet(featPath).select("epoch").distinct().count() >= 2)
    // selection from the maintained state == batch operator on the full
    // pool (q172's oracled trajectory), bit-identical ranks and keys
    def asRows(df: org.apache.spark.sql.DataFrame) =
      df.as[(Long, Long, Double, Double)].collect().toSeq
    val batchSel = asRows(graft.operators.Sampling.dsirSelect(raw, target, 50, 256))
    val streamedSel = asRows(Streams.dsirSelectAt(spark, featPath, target, 50, 256))
    assert(streamedSel == batchSel && streamedSel.nonEmpty)
    // compaction keeps the state (hence the selection) identical
    Streams.compactDsirFeaturesAt(spark, featPath)
    assert(spark.read.parquet(featPath).select("epoch").distinct().count() == 1)
    assert(asRows(Streams.dsirSelectAt(spark, featPath, target, 50, 256)) == batchSel)
    docs.unpersist()
  }

  test("streamingMerkleLeaves: incremental manifest equals batch; re-delivery cannot drift digests") {
    val tmp = Files.createTempDirectory("graft-stream-merkle").toString
    val (l1, l2, leaves) = (s"$tmp/landing1", s"$tmp/landing2", s"$tmp/leaves")
    val docs = Tables.documents(spark, TestSpark.sf0001).cache()
    val half1 = docs.filter($"doc_id" % 2 === 0)
    docs.filter($"doc_id" % 2 === 0).coalesce(1).write.mode("append").parquet(l1)
    docs.filter($"doc_id" % 2 === 1).coalesce(1).write.mode("append").parquet(l1)
    val stream = spark.readStream.schema(Streams.documentsSchema)
      .option("maxFilesPerTrigger", "1").parquet(l1)
    Streams.streamingMerkleLeaves(stream, leaves, s"$tmp/ckpt1")
      .awaitTermination(120000)
    def manifest() = Streams.merkleManifestAt(spark, leaves)
      .as[(Int, Long, String, String)].collect().toSet
    val streamed = manifest()
    val batch = graft.operators.Sketches.merkleManifest(docs)
      .as[(Int, Long, String, String)].collect().toSet
    assert(streamed == batch && streamed.nonEmpty)
    // replaying half the corpus through a fresh stream (new checkpoint)
    // upserts identical leaves — the manifest must not move
    half1.coalesce(1).write.mode("append").parquet(l2)
    Streams.streamingMerkleLeaves(
        spark.readStream.schema(Streams.documentsSchema).parquet(l2),
        leaves, s"$tmp/ckpt2")
      .awaitTermination(120000)
    assert(manifest() == batch)
    // no duplicate leaves after the replay
    val leafRows = spark.read.parquet(leaves)
    assert(leafRows.count() == leafRows.select("doc_id").distinct().count())
    docs.unpersist()
  }

  test("streamingHllDistinct: final sketch state equals the batch operator") {
    val tmp = Files.createTempDirectory("graft-stream-hll").toString
    val src = s"$tmp/events"
    val events = Tables.events(spark, TestSpark.sf0001).cache()
    // arbitrary halves: register max-merge is order- and split-invariant
    events.filter($"event_id" % 2 === 0).coalesce(1).write.mode("append").parquet(src)
    events.filter($"event_id" % 2 === 1).coalesce(1).write.mode("append").parquet(src)
    val stream = spark.readStream.schema(Streams.eventsSchema)
      .option("maxFilesPerTrigger", "1").parquet(src)
    val q = Streams.streamingHllDistinct(stream).writeStream
      .format("memory").queryName("hll_out").outputMode("update")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
    q.awaitTermination(120000)
    val streamed = spark.table("hll_out")
      .withColumn("rn", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy($"event_type")
          .orderBy($"n_seen".desc)))
      .filter($"rn" === 1).select($"event_type", $"n_zero", $"est")
      .as[(String, Long, Double)].collect()
      .map(r => r._1 -> (r._2, r._3)).toMap
    val batch = graft.operators.Sketches
      .hllDistinct(events, "event_type", "user_id")
      .select($"event_type", $"n_zero", $"est")
      .as[(String, Long, Double)].collect()
      .map(r => r._1 -> (r._2, r._3)).toMap
    assert(streamed.keySet == batch.keySet)
    for ((k, bv) <- batch) assert(streamed(k) == bv, s"event_type $k")
    events.unpersist()
  }
}
