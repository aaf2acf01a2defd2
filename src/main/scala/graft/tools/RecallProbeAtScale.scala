package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Recall grade of the registered at-scale LSH postures AT the corpus
  * size they claim (VERDICT r9 item 5: q157/q158's 16×17 recall was
  * asserted by arithmetic + planted clones, never measured at its own
  * decade).
  *
  * The bounded exact pass that makes this affordable: ScaleGen replicas
  * apply a signed orthogonal PERMUTATION per replica
  * (ScaleGen.scala:70-82), which preserves every within-replica pairwise
  * dot exactly and collapses cross-replica cosines toward 0 — so the
  * replica corpus's true near-dup pair set is EXACTLY the source SF's
  * truth translated by k·maxVec per replica k. One source-SF exact pass
  * (the dense 16×4 posture, the RecallProbe truth convention) therefore
  * grades recall at ANY factor: run the posture on the full replica
  * corpus, fold each kept pair back to (replica, source-pair), and score
  * against the translated truth. Candidate-pair counts are measured on
  * the same corpus — the cost axis of the frontier.
  *
  * Cross-replica keeps are reported separately and EXCLUDED from the
  * translated-truth denominator. They are NOT fixture leakage: the
  * round-10 factor-100 runs measured 22k–203k of them, every one having
  * passed embeddingNearDups' exact cosine ≥ 0.45 verify, and
  * BASELINE.md's round-10 adjudication records them as TRUE pairs —
  * replica truth is "linear-plus-a-tail" (the signed permutation
  * transform collapses cross-replica cosines TOWARD 0, but with 64-dim
  * vectors a real above-threshold tail survives at large factors). So
  * within-replica recall grades stay sound (their truth set is exact),
  * while the cross tail is a real part of the replica corpus's truth
  * that this tool cannot afford to enumerate exactly. To distinguish a
  * genuine tail from a verify-stage bug mechanically (VERDICT r10 item
  * 2), the tool re-verifies a bounded sample of cross-replica keeps
  * with an INDEPENDENT plain-Scala dot product and reports
  * `cross_replica_true_rate` (expect 1.0: the pairs already passed the
  * codegen'd exact verify; a lower rate would indict `graft_dot` or the
  * join, not the fixture).
  *
  * Usage: tools/run_local.sh graft.tools.RecallProbeAtScale \
  *          <srcSfDir> <replicaDir> [postures]
  * where postures defaults to "16x17,16x17+mp,16x14" (label format
  * LxB[+mp] — L tables × B bits, +mp = Hamming≤1 multi-probe).
  */
object RecallProbeAtScale {
  def main(args: Array[String]): Unit = {
    val srcDir = args(0)
    val repDir = args(1)
    val postures = args.lift(2).getOrElse("16x17,16x17+mp,16x14")
      .split(",").map(_.trim).filter(_.nonEmpty).toSeq
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.functions.VectorExpressions.register(spark)

    def emb(dir: String) = spark.read.parquet(s"$dir/embeddings.parquet")
      .select(col("vec_id"), expr("transform(embedding, x -> CAST(x AS DOUBLE))").as("emb"))

    val src = emb(srcDir)
    val maxVec = src.agg(max(col("vec_id"))).head().getLong(0) + 1
    val rep = emb(repDir)
    val nRep = rep.count()
    require(nRep % maxVec == 0,
      s"replica corpus rows ($nRep) not a multiple of source maxVec ($maxVec)")
    val factor = (nRep / maxVec).toInt

    // Source-SF exact truth (the dense 16×4 posture — RecallProbe's
    // convention; at the source SF its buckets are dense enough that it
    // IS the cosine ≥ 0.45 pair set).
    val truth = graft.ops.Dedup.embeddingNearDups(src,
        bitsPerTable = graft.functions.Hyperplanes.bits, numTables = -1)
      .select(col("id1"), col("id2")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    println(s"""{"src":"$srcDir","truth_pairs":${truth.size},"factor":$factor,"max_vec":$maxVec}""")

    postures.foreach { label =>
      val mp = label.endsWith("+mp")
      val Array(l, b) = label.stripSuffix("+mp").split("x").map(_.toInt)
      val t0 = System.nanoTime()
      val kept = graft.ops.Dedup.embeddingNearDups(rep,
          bitsPerTable = b, multiProbe = mp, numTables = l)
        .select(col("id1"), col("id2")).collect()
        .map(r => (r.getLong(0), r.getLong(1)))
      val sec = (System.nanoTime() - t0) / 1e9
      val (within, cross) = kept.partition(p => p._1 / maxVec == p._2 / maxVec)
      val hits = within.count(p => truth.contains((p._1 % maxVec, p._2 % maxVec)))
      val cand = graft.ops.Dedup.embeddingCandidates(rep, b, mp, l).count()
      val denom = truth.size.toLong * factor
      // Independent re-verify of a bounded cross-replica sample (see the
      // scaladoc): deterministic stride sample, plain-Scala dot.
      val sampleN = 1000
      // Long arithmetic stride i·len/N covers the WHOLE array at any
      // length > sampleN; the old ⌊len/N⌋ step degenerated to the first
      // 1000 pairs for 1000 ≤ len < 2000 (VERDICT r11 minor).
      val crossSample =
        if (cross.length <= sampleN) cross.toSeq
        else (0 until sampleN).map(i => cross((i.toLong * cross.length / sampleN).toInt))
      val crossRate =
        if (crossSample.isEmpty) 1.0
        else {
          val ids = crossSample.flatMap(p => Seq(p._1, p._2)).distinct
          val vecs = rep.filter(col("vec_id").isin(ids: _*))
            .collect()
            .map(r => r.getLong(0) -> r.getSeq[Double](1).toArray).toMap
          val ok = crossSample.count { case (a, bId) =>
            val (va, vb) = (vecs(a), vecs(bId))
            var dot = 0.0; var i = 0
            while (i < va.length) { dot += va(i) * vb(i); i += 1 }
            dot >= 0.45
          }
          ok.toDouble / crossSample.size
        }
      println(f"""{"posture":"$label","kept":$hits,"truth":$denom,""" +
        f""""recall":${hits.toDouble / denom}%.3f,"extra_within":${within.length - hits},""" +
        f""""cross_replica":${cross.length},"cross_replica_sampled":${crossSample.size},""" +
        f""""cross_replica_true_rate":$crossRate%.3f,""" +
        f""""candidate_pairs":$cand,"sec":$sec%.1f}""")
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
