package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Measured rebucket-vs-rebuild ratio for the PQ-coded ANN index's
  * geometry-step migration (VERDICT r11 item 1): the per-decade doctrine
  * says b steps with log₂(corpus), and
  * [[graft.ops.Similarity.annPqIndexRebucket]] is the migration that
  * makes the step operable on a LIVE index — hash + rewrite of the
  * bucket tree, skipping the codebook train and the Θ(n·M·56) beamed
  * encode that dominate a rebuild. This probe puts the number on that
  * claim at replica-corpus scale, per the BASELINE.md discipline that
  * every cost claim carries a measured datum.
  *
  * Per run: build the q163-posture index (16×14 / PQ8) on the corpus and
  * time it; time `annPqIndexRebucket` to the next decade's geometry
  * (16×17); time a from-scratch `annPqIndexWrite` at 16×17 (the rebuild
  * the migration replaces — same corpus, so the deterministic model
  * train yields the identical codebook and the two trees must serve
  * identically); then probe BOTH with a fixed 50-query batch and compare
  * collected results — the AnnIngestSpec equality pin re-proven at the
  * probe scale, so the speedup is of a VERIFIED-equivalent artifact.
  *
  * Emits JSONL: a header line, then one line per timed phase, then a
  * summary with the rebuild/rebucket ratio and the probe-equality bit.
  *
  * Usage: tools/run_local.sh graft.tools.RebucketProbe \
  *          <corpusDir> <workDir> [oldBits=14] [newBits=17]
  */
object RebucketProbe {
  def main(args: Array[String]): Unit = {
    val corpusDir = args(0)
    val workDir = args(1)
    val oldBits = args.lift(2).map(_.toInt).getOrElse(14)
    val newBits = args.lift(3).map(_.toInt).getOrElse(17)
    val (tables, pqBits) = (16, 8)
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
    val queries = emb.filter(col("vec_id") % 1201 === 0).limit(50).cache()
    val nQueries = queries.count()
    val migPath = s"$workDir/idx_mig"
    val refPath = s"$workDir/idx_ref"
    // Reset ONLY the probe's own subtrees (the PqIngestProbe guard).
    Seq(migPath, refPath).foreach { p =>
      val root = java.nio.file.Paths.get(p)
      if (java.nio.file.Files.exists(root))
        java.nio.file.Files.walk(root).sorted(java.util.Comparator.reverseOrder())
          .forEach(q => java.nio.file.Files.delete(q))
    }

    def secs[T](f: => T): (T, Double) = {
      val t0 = System.nanoTime(); val r = f; (r, (System.nanoTime() - t0) / 1e9)
    }
    println(s"""{"corpus":"$corpusDir","rows":$total,"tables":$tables,""" +
      s""""old_bits":$oldBits,"new_bits":$newBits,"pq_bits":$pqBits,""" +
      s""""probe_queries":$nQueries}""")

    val (_, buildSec) = secs {
      graft.ops.Similarity.annPqIndexWrite(emb, migPath,
        bitsPerTable = oldBits, numTables = tables, pqBits = pqBits)
    }
    println(s"""{"phase":"build_old","geometry":"${tables}x$oldBits","sec":${f"$buildSec%.1f"}}""")

    val (_, rebucketSec) = secs {
      graft.ops.Similarity.annPqIndexRebucket(spark, migPath, emb, newBits)
    }
    println(s"""{"phase":"rebucket","geometry":"${tables}x$newBits","sec":${f"$rebucketSec%.1f"}}""")

    val (_, rebuildSec) = secs {
      graft.ops.Similarity.annPqIndexWrite(emb, refPath,
        bitsPerTable = newBits, numTables = tables, pqBits = pqBits)
    }
    println(s"""{"phase":"rebuild","geometry":"${tables}x$newBits","sec":${f"$rebuildSec%.1f"}}""")

    // Equality of the two 16×newBits trees as probe servers — collected
    // and compared row-for-row (deterministic ordering from the probe's
    // orderBy tail), so the ratio above is for a verified artifact.
    val mig = graft.ops.Similarity.annPqIndexProbe(spark, migPath, queries, emb)
      .collect().toSeq
    val ref = graft.ops.Similarity.annPqIndexProbe(spark, refPath, queries, emb)
      .collect().toSeq
    val equal = mig.nonEmpty && mig == ref
    println(s"""{"phase":"summary","rebucket_sec":${f"$rebucketSec%.1f"},""" +
      s""""rebuild_sec":${f"$rebuildSec%.1f"},""" +
      s""""rebuild_over_rebucket":${f"${rebuildSec / rebucketSec}%.2f"},""" +
      s""""probe_rows":${mig.size},"probe_equal":$equal}""")
    require(equal, "migrated and rebuilt indexes diverged as probe servers")
    spark.stop()
  }
}
