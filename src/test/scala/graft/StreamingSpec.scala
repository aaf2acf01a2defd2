package graft

import java.sql.Timestamp
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.streaming.{StatefulOps, TweetPipeline}
import graft.streaming.StatefulOps.Event

/** Streaming semantics via MemoryStream + processAllAvailable
  * (SURVEY.md §5 item 2): sliding-window contents, incremental updates,
  * stateful sessionization, watermark-bounded dedup.
  */
class StreamingSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  private def tweetAt(time: String, tags: String*): (String, Timestamp) =
    (s"""{"entities":{"hashtags":[${tags.map(t => s"""{"text":"$t"}""").mkString(",")}]}}""",
      ts(time))

  test("windowed aggregation runs on the RocksDB state store (at-scale state backend)") {
    // HDFS-backed state lives on executor heaps — at 100 TB of keyed state
    // that's an OOM; RocksDB spills to local disk with incremental
    // checkpointing. Same query semantics, swapped provider.
    val prev = spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    implicit val ctx = spark.sqlContext
    val in = MemoryStream[(String, Timestamp)]
    val counts = TweetPipeline.windowedCounts(
      in.toDF().toDF("value", "ts"), windowLen = "15 minutes", slide = "5 minutes")
    val q = counts.writeStream.format("memory").queryName("rocks_counts")
      .outputMode("complete").start()
    try {
      in.addData(tweetAt("2024-01-01 00:01:00", "A", "B"))
      q.processAllAvailable()
      in.addData(tweetAt("2024-01-01 00:06:00", "A"))
      q.processAllAvailable()
      val rows = spark.table("rocks_counts")
        .select(col("window.start").cast("string"), col("key"), col("count"))
        .as[(String, String, Long)].collect().toSet
      assert(rows.contains(("2024-01-01 00:00:00", "a", 2L)))
      assert(rows.contains(("2024-01-01 00:00:00", "b", 1L)))
      // The provider must actually be RocksDB, not a silent fallback.
      val usedRocks = q.lastProgress != null &&
        q.lastProgress.stateOperators.nonEmpty &&
        Option(q.lastProgress.stateOperators(0).customMetrics)
          .exists(m => !m.isEmpty && m.keySet.toString.toLowerCase.contains("rocksdb"))
      assert(usedRocks, s"RocksDB metrics absent: ${q.lastProgress}")
    } finally {
      q.stop()
      prev match {
        case Some(p) => spark.conf.set("spark.sql.streaming.stateStore.providerClass", p)
        case None => spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
      }
    }
  }

  test("sliding 15-minute window counts accumulate across micro-batches") {
    implicit val ctx = spark.sqlContext
    val in = MemoryStream[(String, Timestamp)]
    val counts = TweetPipeline.windowedCounts(
      in.toDF().toDF("value", "ts"), windowLen = "15 minutes", slide = "5 minutes")
    val q = counts.writeStream.format("memory").queryName("win_counts")
      .outputMode("complete").start()
    try {
      in.addData(tweetAt("2024-01-01 00:01:00", "A", "B"))
      q.processAllAvailable()
      in.addData(tweetAt("2024-01-01 00:06:00", "A"))
      q.processAllAvailable()
      val rows = spark.table("win_counts")
        .select(col("window.start").cast("string"), col("key"), col("count"))
        .as[(String, String, Long)].collect().toSet
      // 00:01 event lands in slides starting 23:50, 23:55, 00:00; 00:06 in 23:55..00:05.
      assert(rows.contains(("2024-01-01 00:00:00", "a", 2L))) // both events
      assert(rows.contains(("2024-01-01 00:05:00", "a", 1L))) // only the 00:06 event
      assert(rows.contains(("2024-01-01 00:00:00", "b", 1L)))
      assert(rows.contains(("2023-12-31 23:55:00", "a", 2L)))
    } finally q.stop()
  }

  test("append mode emits each window exactly once, after the watermark closes it") {
    implicit val ctx = spark.sqlContext
    val in = MemoryStream[(String, Timestamp)]
    val counts = TweetPipeline.windowedCounts(
      in.toDF().toDF("value", "ts"),
      windowLen = "5 minutes", slide = "5 minutes", watermark = "1 minute")
    val q = counts.writeStream.format("memory").queryName("closed_windows")
      .outputMode("append").start()
    try {
      in.addData(tweetAt("2024-01-01 00:01:00", "A"))
      q.processAllAvailable()
      // Window [00:00, 00:05) not closed yet -> nothing emitted.
      assert(spark.table("closed_windows").count() == 0)
      // Advance the watermark past 00:05 + 1 min.
      in.addData(tweetAt("2024-01-01 00:10:00", "B"))
      q.processAllAvailable()
      val rows = spark.table("closed_windows")
        .select(col("window.start").cast("string"), col("key"), col("count"))
        .as[(String, String, Long)].collect().toSet
      assert(rows == Set(("2024-01-01 00:00:00", "a", 1L))) // exactly once, final
    } finally q.stop()
  }

  test("run() in append mode publishes the newest CLOSED window's top-5 (bounded state)") {
    // The production variant of the dashboard (VERDICT r4 item 3): append +
    // watermark eviction instead of complete-mode state re-emission. The
    // published document comes from a window the watermark has CLOSED, so
    // its standings are final — and nothing is published while all windows
    // are still open.
    implicit val ctx = spark.sqlContext
    val dir = java.nio.file.Files.createTempDirectory("append-run").toString
    val resultPath = s"$dir/analytic.json"
    val in = MemoryStream[(String, Timestamp)]
    val q = TweetPipeline.run(spark, in.toDF().toDF("value", "ts"), resultPath,
      triggerInterval = "100 milliseconds",
      windowLen = "5 minutes", slide = "5 minutes", outputMode = "append")
    try {
      in.addData(tweetAt("2024-01-01 00:01:00", "A", "B"),
        tweetAt("2024-01-01 00:02:00", "A"))
      q.processAllAvailable()
      // Window [00:00, 00:05) still open -> nothing published.
      assert(!java.nio.file.Files.exists(java.nio.file.Paths.get(resultPath)),
        "append mode must not publish an open window")
      // Advance the watermark past 00:05 + 1 min -> the window closes and
      // its FINAL standings are published exactly once.
      in.addData(tweetAt("2024-01-01 00:10:00", "zzz"))
      q.processAllAvailable()
      val doc = java.nio.file.Files.readString(java.nio.file.Paths.get(resultPath))
      assert(doc.contains(""""items":[{"hashtag":"A","count":2},{"hashtag":"B","count":1}]"""), doc)
      assert(!doc.contains("zzz"), s"open-window state leaked into the publish: $doc")
      // run() ships with StreamHealth on by default (VERDICT r7 item 8):
      // the per-batch progress JSONL must appear next to the result doc.
      // Listener delivery is async on the listener bus — poll briefly.
      val health = java.nio.file.Paths.get(resultPath + ".health.jsonl")
      val deadline = System.nanoTime() + 10L * 1000 * 1000 * 1000
      while (!(java.nio.file.Files.exists(health) &&
               java.nio.file.Files.size(health) > 0) &&
             System.nanoTime() < deadline) Thread.sleep(50)
      assert(java.nio.file.Files.exists(health) && java.nio.file.Files.size(health) > 0,
        "default StreamHealth JSONL missing for run()")
      val line = java.nio.file.Files.readAllLines(health).get(0)
      assert(line.contains("\"batchId\""), line)
    } finally q.stop()
  }

  test("StreamHealth surfaces watermark drops and state size; planted late events are counted") {
    // The watermark path drops late rows silently (VERDICT r6 item 5);
    // plant events BEHIND an advanced watermark and assert the monitor
    // frame reports exactly them, alongside non-trivial state gauges.
    implicit val ctx = spark.sqlContext
    val dir = java.nio.file.Files.createTempDirectory("stream-health").toString
    val logPath = s"$dir/progress.jsonl"
    val hl = graft.streaming.StreamHealth.listener(logPath)
    spark.streams.addListener(hl)
    val in = MemoryStream[(String, Timestamp)]
    val counts = TweetPipeline.windowedCounts(
      in.toDF().toDF("value", "ts"),
      windowLen = "5 minutes", slide = "5 minutes", watermark = "1 minute")
    val q = counts.writeStream.format("memory").queryName("health_counts")
      .outputMode("append").start()
    try {
      in.addData(tweetAt("2024-01-01 00:01:00", "A"))
      q.processAllAvailable()
      // Advance the watermark to 00:09 (max event time 00:10 - 1 min).
      in.addData(tweetAt("2024-01-01 00:10:00", "B"))
      q.processAllAvailable()
      // Two tags arriving behind the watermark: both must be dropped by
      // the stateful operator AND counted — one tweet row explodes to two
      // tag rows, so the counter speaks post-explode row units.
      in.addData(tweetAt("2024-01-01 00:02:00", "late1", "late2"))
      q.processAllAvailable()
      assert(graft.streaming.StreamHealth.droppedByWatermark(q) == 2L,
        s"expected exactly the 2 planted late rows: ${q.recentProgress.toSeq.map(_.json)}")
      val f = graft.streaming.StreamHealth.frame(spark, q)
      val cols = f.columns.toSet
      assert(Set("batch_id", "input_rows", "watermark", "op",
        "dropped_by_watermark", "state_rows", "state_mem_bytes").subsetOf(cols), cols)
      val agg = f.filter(col("dropped_by_watermark").isNotNull)
      assert(agg.agg(sum("dropped_by_watermark")).first().getLong(0) == 2L)
      // State gauges are live: the open + closed windows hold rows, in
      // nonzero store memory.
      assert(agg.agg(max("state_rows")).first().getLong(0) >= 1L)
      assert(agg.agg(max("state_mem_bytes")).first().getLong(0) > 0L)
      // And none of the dropped rows made it into any window output.
      val out = spark.table("health_counts").select(col("key")).as[String].collect()
      assert(!out.exists(_.startsWith("late")), out.mkString(","))
      // Push surface: the JSONL log holds one line per progress event,
      // each a full engine-rendered progress document.
      val lines = java.nio.file.Files.readAllLines(
        java.nio.file.Paths.get(logPath))
      assert(lines.size() >= 3, s"expected >=3 progress lines, got ${lines.size()}")
      assert(lines.toArray.mkString.contains("numRowsDroppedByWatermark"))
    } finally {
      q.stop()
      spark.streams.removeListener(hl)
    }
  }

  test("flatMapGroupsWithState sessionization closes sessions on gap") {
    implicit val ctx = spark.sqlContext
    val in = MemoryStream[Event]
    val out = StatefulOps.sessionize(in.toDS(), gapSeconds = 600)
    val q = out.writeStream.format("memory").queryName("sessions")
      .outputMode("append").start()
    try {
      in.addData(
        Event(1L, ts("2024-01-01 00:00:00"), 1.0),
        Event(1L, ts("2024-01-01 00:05:00"), 2.0))
      q.processAllAvailable()
      // A >10-min gap: the first session closes inline when the next batch's
      // events arrive past the gap.
      in.addData(Event(1L, ts("2024-01-01 01:00:00"), 5.0))
      q.processAllAvailable()
      in.addData(Event(2L, ts("2024-01-01 02:00:00"), 0.0)) // advance watermark
      q.processAllAvailable()
      val sessions = spark.table("sessions").as[StatefulOps.SessionOut].collect()
        .filter(_.userId == 1L).sortBy(_.startMs)
      assert(sessions.length >= 1)
      assert(sessions.head.nEvents == 2 && sessions.head.total == 3.0)
      assert(sessions.head.endMs - sessions.head.startMs == 5 * 60 * 1000)
    } finally q.stop()
  }

  test("dropDuplicatesWithinWatermark removes same-key re-deliveries") {
    implicit val ctx = spark.sqlContext
    val in = MemoryStream[Event]
    val out = StatefulOps.dedupWithinWatermark(in.toDS(), watermark = "10 minutes")
    val q = out.writeStream.format("memory").queryName("deduped")
      .outputMode("append").start()
    try {
      val e = Event(7L, ts("2024-01-01 00:00:00"), 1.0)
      in.addData(e, e) // duplicate within one batch
      q.processAllAvailable()
      in.addData(e) // re-delivery in a later batch, still inside watermark
      q.processAllAvailable()
      assert(spark.table("deduped").count() == 1)
    } finally q.stop()
  }

  test("streaming near-dup sketch flags a planted pair across micro-batches") {
    implicit val ctx = spark.sqlContext
    val in = MemoryStream[StatefulOps.DocEvent]
    val out = StatefulOps.nearDupCandidates(in.toDS())
    val q = out.writeStream.format("memory").queryName("neardup")
      .outputMode("append").start()
    try {
      val dup = "the quick brown fox jumps over the lazy dog while the cat watches from the warm windowsill"
      val other = "completely different content about distributed state stores and incremental checkpointing"
      in.addData(StatefulOps.DocEvent(1L, dup), StatefulOps.DocEvent(3L, other))
      q.processAllAvailable()
      // The near-dup arrives in a LATER micro-batch: identical text means
      // identical signature, so every band bucket already holds doc 1.
      in.addData(StatefulOps.DocEvent(2L, dup))
      q.processAllAvailable()
      val pairs = spark.table("neardup").select("id1", "id2").distinct()
        .as[(Long, Long)].collect().toSet
      assert(pairs.contains((1L, 2L)), s"planted pair missing: $pairs")
      // The dissimilar doc must not collide with anything: band equality
      // needs 4 identical signature slots (~(1/P)^4 for unrelated text).
      assert(!pairs.exists(p => p._1 == 3L || p._2 == 3L), pairs.toString)
    } finally q.stop()
  }

  test("heavy-hitters monitor: stream report ⊇ exact heavy set, overestimates only, exactly-once replay") {
    implicit val ctx = spark.sqlContext
    val root = java.nio.file.Files.createTempDirectory("hh-monitor").toString
    val ckpt = java.nio.file.Files.createTempDirectory("hh-ckpt").toString
    val in = MemoryStream[String]
    val q = graft.streaming.HeavyHitters.monitor(
      in.toDF().toDF("tok"), root, ckpt, ratio = 10, k = 10)
    try {
      // 'hot' is heavy overall but appears ONLY in the first two batches —
      // the candidate-retention property (a true heavy hitter, once a
      // candidate, is never evicted by the rising threshold) is what keeps
      // it in the final report.
      in.addData(Seq.fill(30)("hot") ++ (1 to 10).map(i => s"a$i"): _*)
      q.processAllAvailable()
      in.addData(Seq.fill(10)("hot") ++ (11 to 20).map(i => s"a$i"): _*)
      q.processAllAvailable()
      in.addData(Seq.fill(25)("warm") ++ (21 to 35).map(i => s"a$i"): _*)
      q.processAllAvailable()
      val batches = new java.io.File(s"$root/report").listFiles()
        .map(_.getName).filter(_.startsWith("batch_id="))
        .map(_.stripPrefix("batch_id=").toLong).sorted
      assert(batches.length == 3, batches.mkString(","))
      val last = batches.max
      val report = spark.read.parquet(s"$root/report/batch_id=$last")
        .as[(String, Long)].collect().toMap
      // Exact heavy set over the full stream: hot 40/100, warm 25/100 at
      // ratio 10 (threshold 10); every a_i is 1.
      assert(report.contains("hot") && report.contains("warm"), report.toString)
      assert(report.keySet.intersect((1 to 35).map(i => s"a$i").toSet).isEmpty,
        s"light token leaked into the report: $report")
      // CM never underestimates.
      assert(report("hot") >= 40L && report("warm") >= 25L, report.toString)
      // Exactly-once: replaying the LAST batch through the exposed step
      // must leave the report byte-identical (reads only < batchId state).
      val before = spark.read.parquet(s"$root/report/batch_id=$last")
        .collect().map(_.toSeq).toSet
      val replayToks = (Seq.fill(25)("warm") ++ (21 to 35).map(i => s"a$i")).toDF("tok")
      graft.streaming.HeavyHitters.processBatch(replayToks, root, last, ratio = 10, k = 10)
      val after = spark.read.parquet(s"$root/report/batch_id=$last")
        .collect().map(_.toSeq).toSet
      assert(before == after, "replay changed the published report")
      // State retention: cells/cand keep only {last-1, last} (pruned —
      // a long-lived monitor must not grow one state dir per batch);
      // report keeps the full consumable log.
      def stateIds(sub: String) = new java.io.File(s"$root/$sub").listFiles()
        .map(_.getName).filter(_.startsWith("batch_id="))
        .map(_.stripPrefix("batch_id=").toLong).sorted.toSeq
      assert(stateIds("cells") == Seq(last - 1, last), stateIds("cells").toString)
      assert(stateIds("cand") == Seq(last - 1, last), stateIds("cand").toString)
      // Convergence with the batch operator: the stream's final cells
      // equal batch cmCells over the concatenated stream (same grid).
      val allToks = (Seq.fill(40)("hot") ++ Seq.fill(25)("warm")
        ++ (1 to 35).map(i => s"a$i")).toDF("tok")
      val batchCells = graft.ops.Sketches.cmCells(allToks)
        .collect().map(r => (r.getInt(0), r.getInt(1)) -> r.getLong(2)).toMap
      val streamCells = spark.read.parquet(s"$root/cells/batch_id=$last")
        .collect().map(r => (r.getInt(0), r.getInt(1)) -> r.getLong(2)).toMap
      assert(streamCells == batchCells, "stream cells diverged from batch cells")
    } finally q.stop()
  }

  test("streaming KMV sketch state runs on RocksDB (at-scale state backend), same estimates") {
    // The KmvAgg buffer must survive the RocksDB serialize/restore path
    // bit-for-bit — per-source state is ~k longs on local disk instead of
    // executor heap, the posture a 100 TB keyed-state deployment needs.
    val prev = spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    implicit val ctx = spark.sqlContext
    val in = MemoryStream[(Long, String, String)]
    val est = graft.streaming.HeavyHitters.kmvDistinctEstimates(
      in.toDF().toDF("doc_id", "source", "text"))
    val q = est.writeStream.format("memory").queryName("kmv_rocks")
      .outputMode("complete").start()
    try {
      def docs(lo: Int, hi: Int) = (lo to hi).map(i =>
        (i.toLong, "r", (1 to 40).map(j => s"r${(i * 13 + j) % 90}").mkString(" ")))
      in.addData(docs(1, 30): _*)
      q.processAllAvailable()
      in.addData(docs(31, 60): _*)
      q.processAllAvailable()
      val live = spark.table("kmv_rocks").select("source", "kk", "hk", "kmv_est")
        .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
      val batch = graft.ops.Sketches.kmvDistinctSketch(
        docs(1, 60).toDF("doc_id", "source", "text"))
        .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
      assert(live == batch, s"live=$live batch=$batch")
    } finally {
      q.stop()
      prev match {
        case Some(v) => spark.conf.set("spark.sql.streaming.stateStore.providerClass", v)
        case None => spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
      }
    }
  }

  test("streaming KMV distinct estimates are bit-identical to batch q128b over the same data") {
    implicit val ctx = spark.sqlContext
    val in = MemoryStream[(Long, String, String)] // (doc_id, source, text)
    val est = graft.streaming.HeavyHitters.kmvDistinctEstimates(
      in.toDF().toDF("doc_id", "source", "text"))
    val q = est.writeStream.format("memory").queryName("kmv_live")
      .outputMode("complete").start()
    try {
      def docs(src: String, lo: Int, hi: Int) = (lo to hi).map(i =>
        (i.toLong, src, (1 to 40).map(j => s"$src${(i * 13 + j) % 90}").mkString(" ")))
      in.addData(docs("a", 1, 30) ++ docs("b", 1, 10): _*)
      q.processAllAvailable()
      in.addData(docs("a", 31, 60) ++ docs("b", 11, 50): _*)
      q.processAllAvailable()
      val live = spark.table("kmv_live")
        .select("source", "kk", "hk", "kmv_est")
        .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
      // Batch q128b over the concatenated stream: order-invariance of
      // "k smallest distinct" makes the equality exact, and the engine's
      // state-store merge path is what produced the left side.
      val all = (docs("a", 1, 60) ++ docs("b", 1, 50))
        .toDF("doc_id", "source", "text")
      val batch = graft.ops.Sketches.kmvDistinctSketch(all)
        .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
      assert(live == batch, s"live=$live batch=$batch")
      // The sketches actually saturated (estimate, not trivial small-set).
      assert(live("a")._1 == 64L, live.toString)
    } finally q.stop()
  }

  test("mapGroupsWithState running totals update incrementally") {
    implicit val ctx = spark.sqlContext
    val in = MemoryStream[Event]
    val out = StatefulOps.runningTotals(in.toDS())
    val q = out.writeStream.format("memory").queryName("totals")
      .outputMode("update").start()
    try {
      in.addData(Event(1L, ts("2024-01-01 00:00:00"), 2.0))
      q.processAllAvailable()
      in.addData(Event(1L, ts("2024-01-01 00:01:00"), 3.0))
      q.processAllAvailable()
      val last = spark.table("totals").as[StatefulOps.KeyTotal].collect()
        .filter(_.userId == 1L).maxBy(_.n)
      assert(last.n == 2 && last.total == 5.0)
    } finally q.stop()
  }

  test("q118's classifier scores a stream identically to batch (same column expressions)") {
    // The scoring path is stateless per-row arithmetic + one keyed
    // aggregation, so the SAME library function must run over a stream
    // unchanged — the curation-filter-on-ingest deployment shape.
    implicit val ctx = spark.sqlContext
    val in = MemoryStream[(Long, String)]
    val scored = ops.TextAnalysis.classifierScore(in.toDF().toDF("doc_id", "text"))
    val q = scored.writeStream.format("memory").queryName("stream_scores")
      .outputMode("complete").start()
    try {
      val docs = Seq((1L, "the quick brown fox"), (2L, "merge window spark merge"),
        (3L, "single"), (4L, "a a a a a a"))
      in.addData(docs.take(2))
      q.processAllAvailable()
      in.addData(docs.drop(2))
      q.processAllAvailable()
      val streamed = spark.table("stream_scores")
        .select("doc_id", "margin_fx", "score_r", "keep")
        .as[(Long, Long, Double, Boolean)].collect().sortBy(_._1)
      val batch = ops.TextAnalysis.classifierScore(docs.toDF("doc_id", "text"))
        .select("doc_id", "margin_fx", "score_r", "keep")
        .as[(Long, Long, Double, Boolean)].collect().sortBy(_._1)
      assert(streamed.toSeq == batch.toSeq)
    } finally q.stop()
  }

  test("end-to-end streaming pipeline writes the analytic.json document") {
    implicit val ctx = spark.sqlContext
    val in = MemoryStream[(String, Timestamp)]
    val dir = java.nio.file.Files.createTempDirectory("stream_sink")
    val path = dir.resolve("analytic.json").toString
    val q = TweetPipeline.run(spark, in.toDF().toDF("value", "ts"), path,
      triggerInterval = "0 seconds")
    try {
      in.addData(tweetAt("2024-01-01 00:01:00", "Brexit", "Brexit", "Remain"))
      q.processAllAvailable()
      val content = java.nio.file.Files.readString(java.nio.file.Paths.get(path))
      assert(content.contains(""""hashtag":"Brexit","count":2"""))
      assert(content.contains(""""datetime":"""))
    } finally q.stop()
  }

  test("run() removes its health listener when start() throws (no leak across failed runs)") {
    // ADVICE r8: the scoped listener only self-removes on termination of a
    // run it saw start; a start() failure (bad checkpoint scheme here)
    // would otherwise leave it on spark.streams forever, and repeated
    // run() calls would accumulate leaked listeners.
    implicit val ctx = spark.sqlContext
    val in = MemoryStream[(String, Timestamp)]
    val dir = java.nio.file.Files.createTempDirectory("fail_start")
    val before = spark.streams.listListeners().length
    intercept[Exception] {
      TweetPipeline.run(spark, in.toDF().toDF("value", "ts"),
        dir.resolve("analytic.json").toString,
        checkpointDir = Some("nosuchfs://invalid/checkpoint"))
    }
    assert(spark.streams.listListeners().length == before,
      "failed start() leaked the scoped StreamHealth listener")
  }
}
