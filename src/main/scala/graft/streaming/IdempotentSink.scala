package graft.streaming

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.streaming.StreamingQuery

/** Exactly-once parquet output for append-mode streams.
  *
  * Structured Streaming's contract is at-least-once at the sink: after a
  * failure between "sink wrote batch N" and "checkpoint committed batch N",
  * restart REPLAYS batch N into the sink. A plain `.format("parquet")`
  * append would duplicate those rows (the reference has the same class of
  * gap — no checkpointing at all, SparkApplication.scala:50-51 — so a
  * restart silently loses its window instead).
  *
  * The standard fix, packaged: every micro-batch lands in its own
  * `batch_id=N` directory with OVERWRITE semantics, so a replayed batch
  * rewrites its directory byte-for-byte instead of appending twice —
  * idempotence makes at-least-once delivery exactly-once output. Readers
  * see one partitioned parquet table at `root` (batch_id is just a
  * partition column) and can also use it for incremental consumption
  * ("give me batches > N" prunes on the partition value at the scan).
  *
  * Scale shape: the write is the batch's own parallelism — no extra
  * shuffle, no coordination; overwrite scopes to the one batch directory
  * (never the table root), so concurrent history is untouched. History
  * growth (one directory per batch for the stream's uptime) is what
  * [[compact]] reclaims.
  */
object IdempotentSink {

  /** The per-batch writer — exposed separately so replay idempotence is
    * directly testable: calling it twice with the same batchId must leave
    * the output identical to calling it once.
    *
    * Reader visibility (ADVICE r4): the batch is staged into a hidden
    * `.tmp-batch-N` directory (dot-prefixed → invisible to parquet table
    * scans of `root`) and swapped in with delete + rename — two metadata
    * operations, vs the round-4 delete-then-rewrite whose window spanned
    * the whole batch write. On HDFS/POSIX the rename is atomic; on
    * rename-as-copy object stores the residual window is the rename
    * itself (the usual caveat — production there fronts the table with a
    * manifest layer like Delta/Iceberg).
    *
    * The input must not carry a `batch_id` column: it would collide with
    * the partition-directory column readers reconstruct from the path.
    */
  def writeBatch(batch: DataFrame, root: String, batchId: Long): Unit = {
    require(!batch.columns.contains("batch_id"),
      "input column 'batch_id' would collide with the sink's partition column — rename it before writing")
    val fs = new Path(root).getFileSystem(
      batch.sparkSession.sparkContext.hadoopConfiguration)
    val tmp = new Path(root, s".tmp-batch-$batchId")
    if (fs.exists(tmp)) fs.delete(tmp, true)
    batch.write.mode(SaveMode.Overwrite).parquet(tmp.toString)
    val target = new Path(root, s"batch_id=$batchId")
    if (fs.exists(target)) fs.delete(target, true)
    if (!fs.rename(tmp, target))
      throw new java.io.IOException(s"rename $tmp -> $target failed")
  }

  /** Attach the sink to an append-mode stream. */
  def start(df: DataFrame, root: String, checkpointDir: String,
            queryName: String = "idempotent-sink"): StreamingQuery =
    df.writeStream
      .outputMode("append")
      .queryName(queryName)
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        writeBatch(batch, root, batchId)
      }
      .start()

  /** Compact history: fold every `batch_id <= upTo` directory into ONE
    * range-clustered batch directory (the newest absorbed id), rewriting
    * the data through [[graft.ops.Layout.writeRangeClustered]] so the
    * compacted segment gets the scan-friendly layout (disjoint file
    * ranges, monotone row-group stats) micro-batch-sized writes never
    * have. Returns the number of directories absorbed (0 = nothing to do).
    *
    * Exactly-once is preserved because compaction and replay can never
    * touch the same directory: Structured Streaming only ever replays the
    * LATEST uncommitted batch, and `upTo` is capped below the newest
    * on-disk id, so a replay arriving mid-compaction (or after) overwrites
    * a directory compaction ignores. The fold itself stages into a hidden
    * temp dir and swaps in with the same delete + rename discipline as
    * [[writeBatch]].
    *
    * Contract change for readers: DATA rows are untouched (spec-pinned
    * byte-identical), but the `batch_id` partition value of absorbed rows
    * collapses to the surviving id — incremental consumers must already be
    * past `upTo` before compacting (same watermark discipline as any log
    * compaction).
    */
  def compact(spark: SparkSession, root: String, upTo: Long, numFiles: Int,
              clusterCol: String, sortCols: String*): Int = {
    val rootPath = new Path(root)
    val fs = rootPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val all = fs.listStatus(rootPath).filter(_.isDirectory)
      .map(_.getPath).filter(_.getName.startsWith("batch_id="))
      .map(p => (p, p.getName.stripPrefix("batch_id=").toLong))
    if (all.isEmpty) return 0
    // Never absorb the newest batch — it is the only replay candidate.
    val cap = math.min(upTo, all.map(_._2).max - 1)
    val victims = all.filter(_._2 <= cap).sortBy(_._2)
    if (victims.length <= 1) return 0
    val keep = victims.last._2
    val rows = spark.read.parquet(victims.map(_._1.toString): _*)
    val tmp = new Path(root, s".tmp-compact-$keep")
    if (fs.exists(tmp)) fs.delete(tmp, true)
    graft.ops.Layout.writeRangeClustered(rows, tmp.toString, numFiles, clusterCol, sortCols: _*)
    victims.init.foreach { case (p, _) => fs.delete(p, true) }
    val keepDir = new Path(root, s"batch_id=$keep")
    fs.delete(keepDir, true)
    if (!fs.rename(tmp, keepDir))
      throw new java.io.IOException(s"rename $tmp -> $keepDir failed")
    victims.length
  }
}
