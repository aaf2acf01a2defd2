package graft.streaming

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery
import org.apache.spark.sql.types.{IntegerType, LongType, StringType, StructField, StructType}

/** Live frequent-terms monitor — the streaming surface of the q121
  * Count-Min heavy-hitters design (VERDICT r5 item 8).
  *
  * Per micro-batch, the monitor folds the batch's tokens into the running
  * d×w Count-Min cell grid, re-evaluates a bounded CANDIDATE set (tokens
  * of this batch + surviving prior candidates) against the sketch, and
  * publishes the top-k by estimate — the classic CM+heap heavy-hitters
  * loop (Cormode & Muthukrishnan, J.Alg 2005), with the heap generalized
  * to a re-scored candidate frame.
  *
  * Soundness carries over from the batch operator: CM never
  * underestimates, and a true heavy hitter clears the (rising) mass
  * threshold at every re-evaluation after its last occurrence — once a
  * candidate, it survives to the final report (StreamingSpec pins this
  * against the exact batch answer). False positives are possible
  * (overestimates), exactly as in any CM report.
  *
  * State is NOT in the state store: all three state frames are tiny
  * (cells ≤ d·w rows ≈ 1 KB; candidates are gate-bounded ≈ O(ratio)), so
  * they ride the [[IdempotentSink]] batch-directory discipline instead —
  * each batch N writes `cells/cand/report` under `batch_id=N`, computed
  * ONLY from `batch_id < N` state plus batch-N input. Replaying a batch
  * therefore rewrites byte-identical directories: at-least-once delivery
  * becomes exactly-once output, and the report history doubles as an
  * incremental-consumption log.
  *
  * Scale: the per-batch shuffle is the batch's own (row, bucket) partial
  * aggregate — ≤ d·w rows after map-side combine regardless of batch
  * size; candidate re-scoring is a broadcast-literal lookup over a
  * gate-bounded frame. The only driver materialization is the d·w-cell
  * sketch, same budget class as a broadcast variable (batch q121's
  * posture).
  */
object HeavyHitters {

  private val cellSchema = StructType(Seq(
    StructField("row", IntegerType), StructField("bucket", IntegerType),
    StructField("cnt", LongType)))
  private val candSchema = StructType(Seq(StructField("tok", StringType)))

  /** Latest `batch_id=M` directory with M strictly below `below` — replay
    * of batch N must never read state N wrote on a failed attempt.
    */
  private def readState(spark: SparkSession, root: String, below: Long,
                        schema: StructType): DataFrame = {
    val rootPath = new Path(root)
    val fs = rootPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val prior: Seq[Long] =
      if (!fs.exists(rootPath)) Seq.empty[Long]
      else fs.listStatus(rootPath).filter(_.isDirectory)
        .map(_.getPath.getName).filter(_.startsWith("batch_id="))
        .map(_.stripPrefix("batch_id=").toLong).filter(_ < below).toSeq
    if (prior.isEmpty) spark.createDataFrame(new java.util.ArrayList[Row](), schema)
    else spark.read.schema(schema).parquet(s"$root/batch_id=${prior.max}")
  }

  /** One micro-batch step, exposed for direct replay testing: calling it
    * twice with the same (input, batchId) must leave identical output —
    * it reads only `< batchId` state, so it does.
    */
  def processBatch(batch: DataFrame, root: String, batchId: Long,
                   ratio: Int, k: Int): Unit = {
    val spark = batch.sparkSession
    val toks = batch.select(col("tok")).filter(length(col("tok")) > 0)
    val prevCells = readState(spark, s"$root/cells", batchId, cellSchema)
    val newCells = prevCells
      .unionByName(graft.ops.Sketches.cmCells(toks))
      .groupBy(col("row"), col("bucket")).agg(sum(col("cnt")).as("cnt"))
    val cellRows = newCells.collect()
    val (total, est) = graft.ops.Sketches.cmEstimateCol(cellRows)
    val prevCand = readState(spark, s"$root/cand", batchId, candSchema)
    val newCand = toks.distinct().unionByName(prevCand).distinct()
      .withColumn("est", est)
      .filter(col("est") * lit(ratio.toLong) >= lit(total))
    val report = newCand
      .orderBy(col("est").desc, col("tok")).limit(k)
    // Cells first: if the writer dies mid-step, a replay of this batchId
    // recomputes everything from < batchId state anyway.
    // Both state frames are written in a canonical order (cells by
    // (row, bucket), candidates by tok) — collect() order is partition-
    // dependent, and without the sort a replay would be set-identical but
    // not byte-identical, undercutting the directory-replay guarantee the
    // scaladoc (and RecoverySpec) promise.
    val orderedCells = cellRows.toSeq.sortBy(r => (r.getInt(0), r.getInt(1)))
    IdempotentSink.writeBatch(
      spark.createDataFrame(spark.sparkContext.parallelize(orderedCells, 1), cellSchema),
      s"$root/cells", batchId)
    IdempotentSink.writeBatch(
      newCand.select(col("tok")).orderBy(col("tok")).coalesce(1),
      s"$root/cand", batchId)
    IdempotentSink.writeBatch(report, s"$root/report", batchId)
    // State retention: only the latest PRIOR state is ever read, and
    // Structured Streaming replays at most the latest uncommitted batch —
    // so batch N commits make state <= N-2 unreachable. Prune it, or a
    // long-lived monitor accumulates one directory per batch forever.
    // (report/ is the consumable log — never pruned here; IdempotentSink
    // .compact is its reclamation path.)
    pruneState(spark, s"$root/cells", batchId - 1)
    pruneState(spark, s"$root/cand", batchId - 1)
  }

  /** Delete `batch_id=M` state directories with M strictly below `keepFrom`. */
  private def pruneState(spark: SparkSession, root: String, keepFrom: Long): Unit = {
    val rootPath = new Path(root)
    val fs = rootPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(rootPath)) return
    fs.listStatus(rootPath).filter(_.isDirectory)
      .map(_.getPath).filter(_.getName.startsWith("batch_id="))
      .filter(_.getName.stripPrefix("batch_id=").toLong < keepFrom)
      .foreach(p => fs.delete(p, true))
  }

  /** Attach the monitor to a streaming token frame (column `tok`). */
  def monitor(toks: DataFrame, root: String, checkpointDir: String,
              ratio: Int = 30, k: Int = 10): StreamingQuery =
    toks.writeStream
      .outputMode("append")
      .queryName("graft-heavy-hitters")
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        processBatch(batch, root, batchId, ratio, k)
      }
      .start()

  /** Live per-source distinct-cardinality monitor — the streaming face of
    * q128b, and the proof that [[graft.functions.KmvAgg]] IS streaming
    * state: the same bounded typed Aggregator runs inside a streaming
    * groupBy, so the state store holds exactly one k-long sorted array
    * per source no matter how much stream passes through, incrementally
    * checkpointed like any other aggregation state. Because "k smallest
    * distinct" is order-invariant, the running estimate after N batches
    * is BIT-IDENTICAL to batch q128b over the concatenation of those
    * batches (StreamingSpec pins the equality) — the mergeability
    * property, exercised by the engine's own state-store merge path
    * instead of a hand-rolled union.
    *
    * Returns the running (source, kk, hk, kmv_est) frame; attach any sink
    * (complete mode — per-source rows, output is \|sources\|-bounded).
    */
  def kmvDistinctEstimates(docs: DataFrame, k: Int = 64): DataFrame = {
    val kmv = org.apache.spark.sql.functions.udaf(new graft.functions.KmvAgg(k))
    graft.ops.Sketches.kmvHashes(docs)
      .groupBy(col("source")).agg(kmv(col("u")).as("sk"))
      .select(col("source"),
        size(col("sk")).cast("long").as("kk"),
        element_at(col("sk"), size(col("sk"))).as("hk"))
      .withColumn("kmv_est",
        when(col("kk") < k, col("kk"))
          .otherwise(expr("(kk - 1) * 4294967296 DIV hk")))
  }
}
