package graft

import java.nio.file.{Files, Paths}
import java.sql.Timestamp
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import graft.streaming.TweetPipeline

/** End-to-end event-to-file latency probe for the streaming path
  * (BASELINE.md cadence parity target: the reference refreshes its result
  * document every 10 s — SparkApplication.scala:37).
  *
  * Measures wall-clock from "new tweet enters the source" to "the atomic
  * result file visibly contains its hashtag", through the full pipeline:
  * parse → watermarked sliding-window aggregate → trailing-window top-5 →
  * AnalyticSink ATOMIC_MOVE publish. The first round is cold (stream init,
  * state store setup) and reported separately; steady-state rounds must
  * land well inside the reference's 10 s refresh budget even with this
  * suite's deliberately tight 100 ms trigger.
  */
class LatencySpec extends SparkSpec {
  import spark.implicits._

  private def tweetAt(time: String, tag: String): (String, Timestamp) =
    (s"""{"entities":{"hashtags":[{"text":"$tag"}]}}""", Timestamp.valueOf(time))

  test("steady-state event-to-published-file latency beats the 10 s refresh budget") {
    implicit val ctx = spark.sqlContext
    val dir = Files.createTempDirectory("latency").toString
    val resultPath = s"$dir/analytic.json"
    val in = MemoryStream[(String, Timestamp)]
    val q = TweetPipeline.run(spark, in.toDF().toDF("value", "ts"), resultPath,
      triggerInterval = "100 milliseconds")
    try {
      val rounds = 6
      val lats = (0 until rounds).map { i =>
        val tag = s"lat$i"
        val t0 = System.nanoTime()
        // Same event time each round, i+1 copies of round i's tag: the
        // newest tag always has the highest count in the shared trailing
        // window, so it must appear in the next top-5 publish.
        in.addData(Seq.fill(i + 1)(tweetAt("2024-01-01 00:00:05", tag)): _*)
        val deadline = t0 + 60L * 1000 * 1000 * 1000
        while ({
          val p = Paths.get(resultPath)
          !(Files.exists(p) && Files.readString(p).contains(s""""$tag"""")) &&
            System.nanoTime() < deadline
        }) Thread.sleep(10)
        val ms = (System.nanoTime() - t0) / 1e6
        assert(Files.readString(Paths.get(resultPath)).contains(s""""$tag""""),
          s"round $i: tag never reached the result file within 60 s")
        ms
      }
      val steady = lats.drop(1).sorted
      val p50 = steady(steady.size / 2)
      info(f"cold=${lats.head}%.0f ms, steady p50=$p50%.0f ms, max=${steady.last}%.0f ms")
      // Reference cadence budget is 10 s; steady-state must be far inside it.
      assert(p50 < 10000, f"steady-state p50 latency $p50%.0f ms exceeds the 10 s budget")
    } finally q.stop()
  }
}
