package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Measured recall of every registered embedding-LSH geometry against the
  * dense 16×4-bit ground truth (q54's posture — at the probe SF its
  * buckets are dense enough that it IS the cosine ≥ 0.45 pair set; the
  * DedupSpec recall pin and the r8 exact-verification both confirmed its
  * outputs ⊆ exact with near-total recall at sf0.1).
  *
  * This is the instrument behind BASELINE.md's recall-frontier table
  * (VERDICT r8 items 1 and 6): one line per posture with kept/truth
  * pairs and the candidate-pair count the geometry paid for them — the
  * two axes of the L-vs-b trade. Runs on the RAW embeddings table (no
  * planted fixture: recall is about threshold-grazing real pairs, and
  * planted exact clones would inflate every posture equally).
  *
  * Usage: tools/run_local.sh graft.tools.RecallProbe <sfDir>
  */
object RecallProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.functions.VectorExpressions.register(spark)
    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
      .select(col("vec_id"), expr("transform(embedding, x -> CAST(x AS DOUBLE))").as("emb"))

    def pairs(bits: Int, tables: Int, mp: Boolean): Set[(Long, Long)] =
      graft.ops.Dedup.embeddingNearDups(emb, bitsPerTable = bits,
          multiProbe = mp, numTables = tables)
        .select(col("id1"), col("id2")).collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet

    def candidates(bits: Int, tables: Int, mp: Boolean): Long =
      graft.ops.Dedup.embeddingCandidates(emb, bits, mp, tables).count()

    val truth = pairs(graft.functions.Hyperplanes.bits, -1, mp = false)
    println(s"""{"truth_posture":"16x4","truth_pairs":${truth.size}}""")

    // (label, bits, tables (-1 = legacy ⌊64/bits⌋ pool), multiProbe)
    val postures = Seq(
      ("8x8", 8, -1, false), ("8x8+mp", 8, -1, true),
      ("5x11", 11, -1, false), ("5x11+mp", 11, -1, true),
      ("4x14", 14, -1, false), ("4x14+mp", 14, -1, true),
      ("16x11", 11, 16, false), ("16x11+mp", 11, 16, true),
      ("16x14", 14, 16, false), ("16x14+mp", 14, 16, true),
      ("32x11", 11, 32, false), ("32x11+mp", 11, 32, true),
      ("32x14", 14, 32, false), ("32x14+mp", 14, 32, true),
      ("16x17", 17, 16, false), ("16x17+mp", 17, 16, true),
      ("32x17", 17, 32, false), ("32x17+mp", 17, 32, true))
    postures.foreach { case (label, bits, tables, mp) =>
      val got = pairs(bits, tables, mp)
      val kept = (got & truth).size
      val extra = (got -- truth).size
      val cand = candidates(bits, tables, mp)
      println(s"""{"posture":"$label","kept":$kept,"truth":${truth.size},""" +
        s""""extra":$extra,"candidate_pairs":$cand}""")
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
