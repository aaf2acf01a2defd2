package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Checkpoint recovery: the reference loses its whole 15-minute window on
  * restart (no ssc.checkpoint, offsets never committed —
  * SparkApplication.scala:45-52, SURVEY.md §4 fault-tolerance row). The
  * rebuild's stateful aggregation + checkpointLocation must instead resume
  * with state intact and process each input exactly once.
  */
class RecoverySpec extends SparkSpec {
  import spark.implicits._

  test("windowed hashtag counts survive a streaming-query restart") {
    val srcDir = java.nio.file.Files.createTempDirectory("recov_src").toString
    val ckpt = java.nio.file.Files.createTempDirectory("recov_ckpt").toString
    val schema = StructType(Seq(
      StructField("value", StringType), StructField("ts", TimestampType)))
    def tweetLine(time: String, tag: String): String =
      s"""{"value": "{\\"entities\\":{\\"hashtags\\":[{\\"text\\":\\"$tag\\"}]}}", "ts": "$time"}"""

    def startQuery() =
      graft.streaming.TweetPipeline.windowedCounts(
        spark.readStream.schema(schema).json(srcDir))
        .writeStream.format("memory").queryName("recov_counts")
        .outputMode("complete")
        .option("checkpointLocation", ckpt)
        .start()

    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(srcDir, "batch0.json"),
      tweetLine("2024-01-01T00:01:00.000Z", "Brexit") + "\n")
    val q1 = startQuery()
    try { q1.processAllAvailable() } finally q1.stop()

    // Crash/restart boundary. New file arrives while "down".
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(srcDir, "batch1.json"),
      tweetLine("2024-01-01T00:02:00.000Z", "brexit") + "\n")
    val q2 = startQuery()
    try {
      q2.processAllAvailable()
      val rows = spark.table("recov_counts")
        .select(col("window.start").cast("string"), col("key"), col("count"))
        .as[(String, String, Long)].collect().toSet
      // The 00:00 window slide must count BOTH events (pre- and post-restart),
      // case-insensitively — state recovered, batch0 not reprocessed (count
      // is exactly 2, not 3).
      assert(rows.contains(("2024-01-01 00:00:00", "brexit", 2L)),
        s"state not recovered: $rows")
    } finally q2.stop()
  }
}
