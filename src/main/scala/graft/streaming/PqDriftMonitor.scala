package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Live codebook-drift signal for streaming PQ ingest (VERDICT r12
  * item 3). [[graft.tools.PqDriftProbe]] measured the rebuild crossover
  * OFFLINE — mean-shift-class drift crosses the 0.05 recall@5 floor at
  * ~60% shifted corpus, rotation/permutation-class drift never does
  * (probes/r12) — but a deployment only learned its codebook went stale
  * by running the probe by hand. This monitor makes the crossover class
  * detectable in production, per appended batch, through the
  * [[StreamHealth]] monitor-frame pattern.
  *
  * The statistic is per-subspace CODE-OCCUPANCY DIVERGENCE: encode a
  * bounded sample of the batch exactly as the append does, histogram its
  * codes per subspace, and take the smoothed KL divergence against the
  * occupancy of the resident codes the index already stores — averaged
  * over subspaces, normalized by a clean-data baseline. This targets the
  * drift MECHANISM by construction: ADC recall dies when per-subspace
  * mass moves off the codebook's trained cells (the probe's measured
  * failure narrative), and that is precisely an occupancy shift.
  *
  * Chosen by measurement, not argument (round 13, DriftCalib over two
  * SFs × PQ4/PQ8): the first-candidate statistic — mean quantization-
  * residual energy vs baseline, the shape VERDICT r12 suggested — was
  * measured NON-SEPARATING on this corpus family: clean held-out batches
  * read 1.49–1.53× the (overfit) train-resident baseline while α = 1.0
  * mean-shift batches read 1.51–1.58× — a ≤ 4% gap, inside noise
  * ([[graft.ops.Similarity.pqResidualEnergy]] stays available, and
  * PqDriftProbe logs it beside the gap as the falsification record).
  * Occupancy KL on the same fixtures: clean 0.056–0.203, permutation
  * 0.057–0.202 (≤ 1.04× clean — the measured-harmless class reads as
  * clean, exactly right), mean-shift α = 0.5 → 2.2–4.9× clean, α = 1.0
  * → 4.4–9.8× clean, α = 2.0 → 7.6–20× clean. A ratio threshold of 2.0
  * splits the classes with ≥ 2× margin on both sides at every measured
  * (SF, pq_bits) point.
  *
  * Baseline discipline: `ratio` normalizes the batch's divergence by a
  * CLEAN batch's divergence — the sampling-noise-plus-generalization
  * floor, which scales with 2^pq_bits and sample size and so must be
  * measured, not assumed. Call [[calibrate]] with a held-out clean
  * sample right after bootstrap (the recommended recipe — the stream
  * starts when the codebook is fresh, so clean data is at hand);
  * uncalibrated monitors self-seed from the FIRST observed batch, which
  * assumes the stream starts undrifted (true after any bootstrap or
  * rebuild — document the assumption, don't hide it).
  *
  * Reading the frame: `flagged` marks a mean-shift-class batch. The
  * REBUILD rule ties the flag rate to the measured crossover: recall
  * collapse arrives when shifted rows reach ~60% of residents, so
  * rebuild when flagged batches account for that fraction of the corpus
  * — [[flaggedFraction]] over the retained window is the stream-rate
  * estimator of it. BASELINE.md records the calibration run.
  *
  * Cost: one bounded-sample encode per appended batch plus a one-time
  * pruned resident-code scan at init — O(batch)-class, like the ingest
  * it rides; the index is never re-read per batch.
  */
final class PqDriftMonitor(indexPath: String,
                           threshold: Double = 2.0,
                           sampleN: Int = 1024,
                           keep: Int = 100) {
  require(threshold > 1.0 && sampleN > 0 && keep > 0)

  private var refCounts: Map[(Int, Int), Long] = null
  private var pqK = -1
  private var baseline = -1.0
  private val ring = scala.collection.mutable.ArrayDeque[PqDriftMonitor.Obs]()

  private def reference(s: SparkSession): Map[(Int, Int), Long] = {
    if (refCounts == null) {
      refCounts = graft.ops.Similarity.pqResidentCodeCounts(s, indexPath, sampleN)
      pqK = 1 << graft.ops.Similarity.pqIndexBits(s, indexPath)
    }
    refCounts
  }

  private def divergenceOf(batch: DataFrame): Double = {
    val s = batch.sparkSession
    val ref = reference(s)
    PqDriftMonitor.occupancyKl(
      graft.ops.Similarity.pqBatchCodeCounts(s, batch, indexPath, sampleN), ref, pqK)
  }

  /** Pin the clean-data baseline from a held-out clean sample (see class
    * doc); returns the measured floor. Idempotent re-calibration is
    * allowed — e.g. after a rebuild retrains the codebook, re-create or
    * re-calibrate the monitor.
    */
  def calibrate(clean: DataFrame): Double = {
    baseline = divergenceOf(clean)
    baseline
  }

  /** Score one appended batch; retains the observation for [[frame]].
    * Self-seeds the baseline from the first batch when uncalibrated.
    */
  def observe(batch: DataFrame, batchId: Long): PqDriftMonitor.Obs = {
    val d = divergenceOf(batch)
    if (baseline < 0) baseline = d
    val obs = PqDriftMonitor.Obs(batchId, d, baseline, d / baseline, threshold,
      d / baseline > threshold)
    ring.synchronized {
      ring.append(obs)
      while (ring.size > keep) ring.removeHead()
    }
    obs
  }

  /** The monitor frame — one row per retained observed batch, the
    * [[StreamHealth.frame]] pull surface: "is my codebook drifting?" is
    * a DataFrame query, not a probe run.
    */
  def frame(spark: SparkSession): DataFrame = {
    import spark.implicits._
    ring.synchronized { ring.toSeq }.toDF()
  }

  /** Fraction of retained observed batches flagged as drift-class — the
    * stream-rate estimator behind the rebuild rule (see class doc).
    */
  def flaggedFraction: Double = ring.synchronized {
    if (ring.isEmpty) 0.0 else ring.count(_.flagged).toDouble / ring.size
  }
}

object PqDriftMonitor {
  /** One appended batch's drift observation. */
  final case class Obs(
      batch_id: Long,
      divergence: Double,
      baseline_divergence: Double,
      ratio: Double,
      threshold: Double,
      flagged: Boolean)

  /** Smoothed per-subspace KL divergence KL(batch ‖ reference) averaged
    * over subspaces, on the full 2^pq_bits cell grid (add-½ smoothing so
    * unobserved cells are defined on both sides). Driver-side pure math
    * over ≤ M·2^pq_bits counts — the distributed work already happened
    * in the two count scans.
    */
  def occupancyKl(batch: Map[(Int, Int), Long], ref: Map[(Int, Int), Long],
                  k: Int): Double = {
    val ms = (batch.keys ++ ref.keys).map(_._1).toSet.toSeq
    val kls = ms.map { m =>
      val bTot = batch.collect { case ((`m`, _), n) => n }.sum.toDouble + 0.5 * k
      val rTot = ref.collect { case ((`m`, _), n) => n }.sum.toDouble + 0.5 * k
      (0 until k).map { c =>
        val pb = (batch.getOrElse((m, c), 0L) + 0.5) / bTot
        val pr = (ref.getOrElse((m, c), 0L) + 0.5) / rTot
        pb * math.log(pb / pr)
      }.sum
    }
    kls.sum / kls.size
  }
}
