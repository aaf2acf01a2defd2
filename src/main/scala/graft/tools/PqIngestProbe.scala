package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Measured scale grade for the streaming PQ ingest path (VERDICT r10
  * item 4): [[graft.streaming.AnnIngest.appendPqBatch]] is spec-proven
  * correct (stream-built == batch-built probe equality, AnnIngestSpec),
  * but its O(batch) append-cost claim — per-batch wall independent of
  * resident index size, because the append hashes/encodes ONLY the batch
  * and drops files into the existing (tbl, bgrp) tree — had no measured
  * datum, unlike every batch claim in BASELINE.md.
  *
  * The probe: bootstrap a PQ index (q163's 16×14 / PQ8 posture) on ~1/3
  * of the corpus — the recommended recipe, so the codebook is trained on
  * corpus-representative data — then append the remaining ~2/3 in
  * equal-row micro-batches through the SAME appendPqBatch the streaming
  * sink calls (foreachBatch adds only checkpoint plumbing around it, so
  * timing the appender IS timing the sink's per-batch work). Per batch:
  * wall + resident rows before the append. Every probeEvery batches: a
  * fixed 50-query [[graft.ops.Similarity.annPqIndexProbe]], timing
  * probe-latency drift as the index grows — the serving-side cost of
  * letting a stream grow the index (expected ~linear in resident rows
  * for a fixed bucket geometry: shortlist candidates ∝ n/2^b per probed
  * bucket).
  *
  * The claim is FALSIFIED if append wall trends up with resident rows at
  * constant batch rows (the JSON lines carry both, so the trend is
  * machine-checkable); probe growth is NOT a falsifier — it's the
  * documented n-dependence of serving, reported so the operating point
  * is known rather than argued.
  *
  * Usage: tools/run_local.sh graft.tools.PqIngestProbe \
  *          <corpusDir> <workDir> [nBatches=16] [probeEvery=4]
  */
object PqIngestProbe {
  def main(args: Array[String]): Unit = {
    val corpusDir = args(0)
    val workDir = args(1)
    val nBatches = args.lift(2).map(_.toInt).getOrElse(16)
    val probeEvery = args.lift(3).map(_.toInt).getOrElse(4)
    // q163's registered posture (Similarity.annPqGeometry/annPqBits).
    val (bits, tables, pqBits) = (14, 16, 8)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.functions.VectorExpressions.register(spark)

    val emb = spark.read.parquet(s"$corpusDir/embeddings.parquet")
      .select(col("vec_id"), expr("transform(embedding, x -> CAST(x AS DOUBLE))").as("emb"))
    val total = emb.count()
    // Thirds by modulus: (id%3==0) bootstraps; the rest splits into
    // nBatches equal-row micro-batches by id%(3·nBatches).
    val seed = emb.filter(col("vec_id") % 3 === 0)
    val queries = emb.filter(col("vec_id") % 3 === 0 && col("vec_id") % 1201 === 0)
      .limit(50).cache()
    val nQueries = queries.count()
    val indexPath = s"$workDir/idx"
    // Reset ONLY the probe's own subtree (workDir/idx) — never the whole
    // workDir: a mistyped argument (the corpus dir, the repo root) must
    // not be silently destroyed (ADVICE r11).
    graft.ops.Similarity.deleteTree(indexPath)

    def secs[T](f: => T): (T, Double) = {
      val t0 = System.nanoTime(); val r = f; (r, (System.nanoTime() - t0) / 1e9)
    }
    val (_, bootSec) = secs {
      graft.ops.Similarity.annPqIndexWrite(seed, indexPath,
        bitsPerTable = bits, numTables = tables, pqBits = pqBits)
    }
    var resident = seed.count()
    println(s"""{"corpus":"$corpusDir","total_rows":$total,"bootstrap_rows":$resident,""" +
      s""""bootstrap_sec":${f"$bootSec%.1f"},"geometry":"${tables}x$bits/pq$pqBits",""" +
      s""""n_batches":$nBatches,"probe_queries":$nQueries}""")

    def probeLine(afterBatch: Int): Unit = {
      val (n, sec) = secs {
        graft.ops.Similarity.annPqIndexProbe(spark, indexPath, queries, emb).count()
      }
      println(s"""{"probe_after_batch":$afterBatch,"index_rows":$resident,""" +
        s""""probe_rows":$n,"probe_sec":${f"$sec%.2f"}}""")
    }
    probeLine(0)
    (0 until nBatches).foreach { i =>
      val batch = emb.filter(col("vec_id") % 3 =!= 0 &&
        pmod(col("vec_id"), lit(3 * nBatches)).isin(
          (0 until 3 * nBatches).filter(m => m % 3 != 0).slice(2 * i, 2 * i + 2): _*))
      val rows = batch.count()
      val (_, sec) = secs {
        graft.streaming.AnnIngest.appendPqBatch(batch, indexPath, batchId = i + 1,
          bitsPerTable = bits, numTables = tables, pqBits = pqBits)
      }
      println(s"""{"batch":${i + 1},"batch_rows":$rows,"index_rows_before":$resident,""" +
        s""""append_sec":${f"$sec%.2f"}}""")
      resident += rows
      if ((i + 1) % probeEvery == 0) probeLine(i + 1)
      spark.catalog.clearCache()
      queries.cache(); queries.count()
    }
    spark.stop()
  }
}
