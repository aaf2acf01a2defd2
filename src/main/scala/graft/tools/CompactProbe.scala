package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Measured grade for index compaction ([[graft.ops.Similarity
  * .annPqIndexCompact]]) on a real post-ingest tree. [[AutoStepProbe]]'s
  * own measurement isolated the term compaction exists to collect: after
  * the mid-stream geometry step cut shortlist candidates 8×, probe
  * latency STILL grew with every append (1.79 → 3.86 s over batches 8–16
  * at sf10) because each append drops ~256 small files into the
  * partition tree and listing/opening them is now the dominant serving
  * term — the post-migration probe (on a freshly swapped, compact tree)
  * was that run's floor for exactly this reason.
  *
  * The probe reconstructs that end state (bootstrap ⅓ of the corpus at
  * the post-step geometry 16×17/PQ8, then append the rest through the
  * SAME `AnnIngest.appendPqBatch` the streaming sink calls, in 16
  * micro-batches), times the fixed-50-query probe on the messy tree,
  * compacts, and times it again — reporting data-file counts and
  * resident rows on both sides, so "the listing term is bounded by
  * ordinary compaction cadence" carries a number instead of an argument.
  * FALSIFIED if the post-compact probe does not return to ~the
  * fresh-tree floor or if the probe row count changes (the spec pins
  * row-identical results at fixture scale).
  *
  * The `float` family runs the same harness over [[graft.ops.Similarity
  * .annIndexCompact]] (VERDICT r12 item 5 — the float twin carries
  * numbers too): bootstrap with `annIndexWrite`, append through
  * `AnnIngest.appendBatch`, compact, re-probe.
  *
  * Usage: tools/run_local.sh graft.tools.CompactProbe \
  *          <corpusDir> <workDir> [nBatches=16] [family=pq|float]
  */
object CompactProbe {
  def main(args: Array[String]): Unit = {
    val corpusDir = args(0)
    val workDir = args(1)
    val nBatches = args.lift(2).map(_.toInt).getOrElse(16)
    val family = args.lift(3).getOrElse("pq")
    val (bits, tables, pqBits) = (17, 16, 8)
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
    val seed = emb.filter(col("vec_id") % 3 === 0)
    val queries = emb.filter(col("vec_id") % 3 === 0 && col("vec_id") % 1201 === 0)
      .limit(50).cache()
    val nQueries = queries.count()
    val indexPath = s"$workDir/idx_$family"
    val idxRoot = java.nio.file.Paths.get(indexPath)
    graft.ops.Similarity.deleteTree(indexPath)

    val isPq = family == "pq"
    def secs[T](f: => T): (T, Double) = {
      val t0 = System.nanoTime(); val r = f; (r, (System.nanoTime() - t0) / 1e9)
    }
    val (_, bootSec) = secs {
      if (isPq) graft.ops.Similarity.annPqIndexWrite(seed, indexPath,
        bitsPerTable = bits, numTables = tables, pqBits = pqBits)
      else graft.ops.Similarity.annIndexWrite(seed, indexPath,
        bitsPerTable = bits, numTables = tables)
    }
    println(s"""{"corpus":"$corpusDir","family":"$family",""" +
      s""""geometry":"${tables}x$bits${if (isPq) s"/pq$pqBits" else ""}",""" +
      s""""bootstrap_rows":${seed.count()},"bootstrap_sec":${f"$bootSec%.1f"},""" +
      s""""n_batches":$nBatches,"probe_queries":$nQueries}""")
    (0 until nBatches).foreach { i =>
      val batch = emb.filter(col("vec_id") % 3 =!= 0 &&
        pmod(col("vec_id"), lit(3 * nBatches)).isin(
          (0 until 3 * nBatches).filter(m => m % 3 != 0).slice(2 * i, 2 * i + 2): _*))
      if (isPq) graft.streaming.AnnIngest.appendPqBatch(batch, indexPath,
        batchId = i + 1, bitsPerTable = bits, numTables = tables, pqBits = pqBits)
      else graft.streaming.AnnIngest.appendBatch(batch, indexPath,
        batchId = i + 1, bitsPerTable = bits, numTables = tables)
    }

    def dataFiles(): Long = {
      val walk = java.nio.file.Files.walk(idxRoot)
      try {
        import scala.jdk.CollectionConverters._
        walk.iterator().asScala.count(p => p.getFileName.toString.endsWith(".parquet"))
      } finally walk.close()
    }
    def state(tag: String): Long = {
      spark.catalog.refreshByPath(indexPath)
      val files = dataFiles()
      val rows = spark.read.parquet(indexPath).count()
      val (n, sec) = secs {
        (if (isPq) graft.ops.Similarity.annPqIndexProbe(spark, indexPath, queries, emb)
         else graft.ops.Similarity.annIndexProbe(spark, indexPath, queries)).count()
      }
      println(s"""{"phase":"$tag","data_files":$files,"index_rows":$rows,""" +
        s""""probe_rows":$n,"probe_sec":${f"$sec%.2f"}}""")
      n
    }
    val before = state("pre_compact")
    val (_, cSec) = secs {
      if (isPq) graft.ops.Similarity.annPqIndexCompact(spark, indexPath, emb)
      else graft.ops.Similarity.annIndexCompact(spark, indexPath)
    }
    println(s"""{"phase":"compact","sec":${f"$cSec%.1f"}}""")
    val after = state("post_compact")
    println(s"""{"phase":"summary","probe_rows_equal":${before == after}}""")
    spark.stop()
  }
}
