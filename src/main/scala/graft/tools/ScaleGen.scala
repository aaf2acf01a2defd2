package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Deterministic corpus replicator for scaling probes: writes `factor`
  * stitched copies of a source SF's `documents` and `embeddings` tables so
  * the dedup/ANN family can be timed beyond the largest driver-generated
  * SF (BASELINE.md's sf1 column).
  *
  * The replication preserves the problem SHAPE per replica while keeping
  * replicas mutually invisible — so the ground-truth result scales exactly
  * linearly and any super-linear wall-clock is the engine's fault, not the
  * data's:
  *   - documents: replica k shifts doc_id by k·(max+1) and prefixes every
  *     token with "r{k}" — shingles never collide across replicas, so the
  *     near-dup pair set is exactly `factor` disjoint copies of the
  *     source's (replica 0 is byte-identical to the source).
  *   - embeddings: replica k shifts vec_id and applies a signed affine
  *     PERMUTATION of the components: x'_i = ±x_{p_k(i)} with
  *     p_k(i) = ((2k+1)·i + k) mod 64 (odd multiplier ⇒ bijection) and
  *     the sign from the parity of xxhash64(i, k). This is an orthogonal
  *     transform, so norms and WITHIN-replica cosine geometry are exactly
  *     preserved, while a cross-replica pair's components land on
  *     mismatched axes with scrambled signs — cosine collapses toward 0
  *     even for spiky vectors. (Two rejected schemes, kept as warnings: a
  *     periodic sign mask makes same-phase replicas bit-identical; a
  *     sign-only mask preserves axis-aligned overlap, so spiky near-dup
  *     pairs stay above threshold across replicas — both plant
  *     cross-replica pairs that wreck the linear ground truth.)
  *
  * Usage: `runMain graft.tools.ScaleGen <srcDir> <outDir> <factor>`.
  * Writes only these two tables — the relational TPC-H-ish tables have
  * driver-generated SFs for their own scaling curve.
  */
object ScaleGen {
  def main(args: Array[String]): Unit = {
    val Array(srcDir, outDir, factorStr) = args
    val factor = factorStr.toInt
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // max() over an empty table is null; first().getLong would then NPE
    // with no context. Fail each table with an explicit message instead
    // (ADVICE r6 — the pattern was replicated three times below).
    def maxIdOrFail(df: org.apache.spark.sql.DataFrame, idCol: String,
                    table: String): Long = {
      val row = df.agg(max(col(idCol))).first()
      require(!row.isNullAt(0), s"ScaleGen: source table '$table' is empty — " +
        s"cannot derive a replica shift from max($idCol)")
      row.getLong(0) + 1
    }

    val docs = spark.read.parquet(s"$srcDir/documents.parquet")
    val maxDoc = maxIdOrFail(docs, "doc_id", "documents")
    (0 until factor).map { k =>
      docs.select((col("doc_id") + lit(k * maxDoc)).as("doc_id"),
        (if (k == 0) col("text")
         else concat_ws(" ", expr(s"transform(split(text, ' '), t -> concat('r$k', t))")))
          .as("text"),
        col("lang"), col("source"), col("n_chars"))
    }.reduce(_ unionByName _)
      .write.mode("overwrite").parquet(s"$outDir/documents.parquet")

    val emb = spark.read.parquet(s"$srcDir/embeddings.parquet")
    val maxVec = maxIdOrFail(emb, "vec_id", "embeddings")
    (0 until factor).map { k =>
      emb.select((col("vec_id") + lit(k * maxVec)).as("vec_id"),
        (if (k == 0) col("embedding")
         else expr(
           s"""transform(sequence(0, 63), i ->
                 IF(pmod(xxhash64(i, $k), 2) = 0,
                    -element_at(embedding, pmod(${2 * k + 1} * i + $k, 64) + 1),
                    element_at(embedding, pmod(${2 * k + 1} * i + $k, 64) + 1)))"""))
          .as("embedding"),
        col("label"))
    }.reduce(_ unionByName _)
      .write.mode("overwrite").parquet(s"$outDir/embeddings.parquet")

    // events (round 6, for the q132/q133/q136 probes): replica k shifts
    // event_id and user_id past the source maxima — replicas are disjoint
    // user populations over the same clock, so per-user analyses (SCD2,
    // sessions, EWMA) gain exactly `factor`× rows with identical per-user
    // shape, and cross-user aggregations (transition matrix) see `factor`×
    // evidence for the SAME answer. ts/type/value/props are untouched.
    val ev = spark.read.parquet(s"$srcDir/events.parquet")
    val maxEvent = maxIdOrFail(ev, "event_id", "events")
    val maxUser = maxIdOrFail(ev, "user_id", "events")
    (0 until factor).map { k =>
      ev.select((col("event_id") + lit(k * maxEvent)).as("event_id"),
        col("ts"), (col("user_id") + lit(k * maxUser)).as("user_id"),
        col("event_type"), col("value"), col("props"))
    }.reduce(_ unionByName _)
      .write.mode("overwrite").parquet(s"$outDir/events.parquet")

    println(s"SCALEGEN wrote $outDir at factor $factor")
    spark.stop()
  }
}
