package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Measured codebook-drift rebuild crossover for streaming PQ ingest
  * (VERDICT r11 item 4): [[graft.streaming.AnnIngest.appendPqBatch]]
  * deliberately never retrains — an append encoded against a retrained
  * codebook would silently shift every resident code's meaning — and the
  * rebuild policy ("when ADC recall on fresh batches degrades past the
  * deployment's floor, rebuild") lived in scaladoc prose with no number.
  * This probe produces the number.
  *
  * Shape: bootstrap the PQ index on UNSHIFTED seed data (vec_id % 3 == 0
  * of the corpus — the recommended recipe, codebook trained on
  * corpus-representative data), then stream the remaining rows through
  * `appendPqBatch` after a DISTRIBUTION SHIFT — the ScaleGen replica
  * transform (ScaleGen.scala:70-82) at k = 1: a signed orthogonal
  * permutation x'_i = ±x_{(3i+1) mod 64}, which preserves norms and
  * within-set geometry exactly but moves mass onto different axes, so the
  * per-subspace codebook trained on the seed axes mis-models the shifted
  * vectors. At every `probeEvery` batches, grade BOTH serving options on
  * a held-out 50-query set from the SHIFTED distribution against exact
  * brute-force top-5 truth over the current residents:
  *
  *   - `recall_appended`: the streamed index as-is (seed codebook).
  *   - `recall_rebuilt`: a from-scratch [[graft.ops.Similarity
  *     .annPqIndexWrite]] over the same residents (codebook retrained on
  *     the current seed+shifted mix), with its wall-clock — the price of
  *     the rebuild the gap would justify.
  *
  * Both indexes share the SAME bucket geometry, so their LSH candidate
  * sets are identical — the recall gap isolates the codebook, which is
  * the drifting structure. The drift point is the first checkpoint whose
  * gap exceeds 0.05 recall@5; BASELINE.md records it next to the
  * rebuild cost so the scaladoc policy has numbers instead of prose.
  * The bucket geometry defaults DENSER than the registered q163 posture
  * (16×10 vs 16×14) so shortlist selection — not LSH sparsity at the
  * probe corpus size — dominates the grade; the codebook, not the
  * geometry, is what drifts.
  *
  * Two shift classes, because the answer turned out to DEPEND on the
  * class (the round-12 measured finding):
  *   - `perm` (default): the orthogonal signed permutation. On this
  *     near-isotropic corpus it preserves the per-subspace marginals, so
  *     the seed codebook keeps fitting — measured gap 0.000 ± one pair
  *     at 67% shifted corpus, drift point NEVER REACHED. Appends are
  *     safe indefinitely under rotation/permutation-class drift.
  *   - `mean[:alpha]`: x' = normalize(x + α·μ̂) with μ̂ a fixed unit
  *     vector from the reserved plane block (pool row 460 — entangled
  *     with neither the LSH geometry in use nor the PQ seed rows). The
  *     classic new-domain drift: the shifted cloud concentrates toward
  *     μ̂, per-subspace mass moves off the seed codebook's dense cells,
  *     and ADC discrimination between the now-near-tied true neighbors
  *     decays — the shift class that DOES produce a rebuild crossover.
  *
  * Usage: tools/run_local.sh graft.tools.PqDriftProbe \
  *          <corpusDir> <workDir> [nBatches=8] [probeEvery=2] [bits=10] [shift=perm]
  */
object PqDriftProbe {
  def main(args: Array[String]): Unit = {
    val corpusDir = args(0)
    val workDir = args(1)
    val nBatches = args.lift(2).map(_.toInt).getOrElse(8)
    val probeEvery = args.lift(3).map(_.toInt).getOrElse(2)
    val bits = args.lift(4).map(_.toInt).getOrElse(10)
    val shift = args.lift(5).getOrElse("perm")
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
    val seed = emb.filter(col("vec_id") % 3 === 0)
    // The shifted stream over the non-seed rows (vec_ids stay disjoint
    // from the seed's): either ScaleGen's k=1 signed orthogonal
    // permutation, or the mean-shift toward a fixed unit vector.
    val nonSeed = emb.filter(col("vec_id") % 3 =!= 0)
    val shiftedAll =
      if (shift.startsWith("mean")) {
        val alpha = shift.split(":").lift(1).map(_.toDouble).getOrElse(1.0)
        val H = graft.functions.Hyperplanes
        val mu = H.planesAll(460)
        val n = math.sqrt(mu.map(x => x * x).sum)
        val muLit = mu.map(x => H.fpLit(alpha * x / n)).mkString("array(", ",", ")")
        nonSeed
          .select(col("vec_id"), expr(s"zip_with(emb, $muLit, (a, b) -> a + b)").as("raw"))
          .select(col("vec_id"), expr(
            "transform(raw, x -> x / sqrt(aggregate(raw, CAST(0 AS DOUBLE), (acc, v) -> acc + v * v)))")
            .as("emb"))
      } else nonSeed
        .select(col("vec_id"), expr(
          """transform(sequence(0, 63), i ->
               IF(pmod(xxhash64(i, 1), 2) = 0,
                  -element_at(emb, pmod(3 * i + 1, 64) + 1),
                  element_at(emb, pmod(3 * i + 1, 64) + 1)))""").as("emb"))
    val queries = shiftedAll.filter(col("vec_id") % 211 === 0).limit(50).cache()
    val queryIds = queries.select("vec_id").collect().map(_.getLong(0)).toSet
    val stream = shiftedAll.filter(!col("vec_id").isin(queryIds.toSeq: _*)).cache()
    val streamRows = stream.count()
    val seedRows = seed.count()

    val idxPath = s"$workDir/idx"
    val refPath = s"$workDir/idx_ref"
    Seq(idxPath, refPath).foreach(graft.ops.Similarity.deleteTree)
    def secs[T](f: => T): (T, Double) = {
      val t0 = System.nanoTime(); val r = f; (r, (System.nanoTime() - t0) / 1e9)
    }

    val (_, bootSec) = secs {
      graft.ops.Similarity.annPqIndexWrite(seed, idxPath,
        bitsPerTable = bits, numTables = tables, pqBits = pqBits)
    }
    // The LIVE drift proxy (round 13, VERDICT r12 item 3): the per-batch
    // occupancy-divergence statistic the PqDriftMonitor surfaces in
    // production, computed here alongside the ground-truth recall gap so
    // the log itself carries the proxy↔gap correlation — per-batch
    // `divergence_ratio`/`flagged` against the recall checkpoints' `gap`
    // series. The monitor is calibrated the recommended way: a held-out
    // CLEAN sample (the streamed vec_ids BEFORE the shift transform)
    // pins the noise floor. The residual-energy series rides along as
    // the measured FALSIFICATION record — DriftCalib measured it
    // non-separating (≤ 4% class gap), and this log shows it flat while
    // the divergence series moves with the recall gap.
    val monitor = new graft.streaming.PqDriftMonitor(idxPath)
    val cleanFloor = monitor.calibrate(
      nonSeed.filter(!col("vec_id").isin(queryIds.toSeq: _*)))
    val baseEnergy = graft.ops.Similarity.pqResidualEnergy(spark, seed, idxPath)
    println(s"""{"corpus":"$corpusDir","shift":"$shift","seed_rows":$seedRows,""" +
      s""""stream_rows":$streamRows,"geometry":"${tables}x$bits/pq$pqBits",""" +
      s""""n_batches":$nBatches,"probe_queries":${queries.count()},""" +
      s""""bootstrap_sec":${f"$bootSec%.1f"},""" +
      s""""clean_divergence_floor":${f"$cleanFloor%.4f"},""" +
      s""""baseline_residual_energy":${f"$baseEnergy%.5f"}}""")

    // Exact brute-force top-5 of the held-out shifted queries over the
    // given residents — the truth both serving options are graded on.
    def exactTop5(residents: DataFrame): Set[(Long, Long)] =
      broadcast(queries.select(col("vec_id").as("query_id"), col("emb").as("qemb")))
        .crossJoin(residents.select(col("vec_id").as("neighbor_id"), col("emb").as("nemb")))
        .filter(col("query_id") =!= col("neighbor_id"))
        .select(col("query_id"), col("neighbor_id"),
          expr("graft_dot(qemb, nemb)").as("cos"))
        .withColumn("rank", row_number().over(Window.partitionBy(col("query_id"))
          .orderBy(col("cos").desc, col("neighbor_id").asc)))
        .filter(col("rank") <= 5)
        .select("query_id", "neighbor_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet

    def probeTop5(path: String, residents: DataFrame): Set[(Long, Long)] =
      graft.ops.Similarity.annPqIndexProbe(spark, path, queries, residents)
        .select("query_id", "neighbor_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet

    var driftBatch: Option[Int] = None
    (0 until nBatches).foreach { i =>
      val batch = stream.filter(pmod(col("vec_id"), lit(nBatches)) === i)
      val rows = batch.count()
      val (_, sec) = secs {
        graft.streaming.AnnIngest.appendPqBatch(batch, idxPath, batchId = i + 1,
          bitsPerTable = bits, numTables = tables, pqBits = pqBits)
      }
      val obs = monitor.observe(batch, i + 1)
      val resE = graft.ops.Similarity.pqResidualEnergy(spark, batch, idxPath)
      println(s"""{"batch":${i + 1},"batch_rows":$rows,"append_sec":${f"$sec%.2f"},""" +
        s""""divergence":${f"${obs.divergence}%.4f"},""" +
        s""""divergence_ratio":${f"${obs.ratio}%.2f"},"flagged":${obs.flagged},""" +
        s""""residual_energy":${f"$resE%.5f"},""" +
        s""""residual_ratio":${f"${resE / baseEnergy}%.3f"}}""")
      if ((i + 1) % probeEvery == 0) {
        val residents = seed.unionByName(
          stream.filter(pmod(col("vec_id"), lit(nBatches)) <= i))
        val nRes = residents.count()
        val truth = exactTop5(residents)
        val appended = probeTop5(idxPath, residents)
        val (_, rebuildSec) = secs {
          graft.ops.Similarity.annPqIndexWrite(residents, refPath,
            bitsPerTable = bits, numTables = tables, pqBits = pqBits)
        }
        val rebuilt = probeTop5(refPath, residents)
        val rA = (appended & truth).size.toDouble / truth.size
        val rR = (rebuilt & truth).size.toDouble / truth.size
        if (driftBatch.isEmpty && rR - rA >= 0.05) driftBatch = Some(i + 1)
        println(f"""{"after_batch":${i + 1},"resident_rows":$nRes,""" +
          f""""shifted_fraction":${(nRes - seedRows).toDouble / nRes}%.2f,""" +
          f""""truth_pairs":${truth.size},"recall_appended":$rA%.3f,""" +
          f""""recall_rebuilt":$rR%.3f,"gap":${rR - rA}%.3f,""" +
          f""""rebuild_sec":$rebuildSec%.1f}""")
        spark.catalog.clearCache()
        queries.cache(); queries.count(); stream.cache(); stream.count()
      }
    }
    println(s"""{"summary":"drift_point","gap_floor":0.05,""" +
      s""""drift_batch":${driftBatch.map(_.toString).getOrElse("null")},""" +
      s""""proxy_flagged_fraction":${f"${monitor.flaggedFraction}%.2f"}}""")
    spark.stop()
  }
}
