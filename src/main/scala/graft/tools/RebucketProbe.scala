package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Measured rebucket-vs-rebuild ratio for the persisted ANN indexes'
  * geometry-step migration (VERDICT r11 item 1): the per-decade doctrine
  * says b steps with log₂(corpus), and
  * [[graft.ops.Similarity.annPqIndexRebucket]] /
  * [[graft.ops.Similarity.annIndexRebucket]] are the migrations that
  * make the step operable on a LIVE index — hash + rewrite of the
  * bucket tree, skipping (in the PQ family) the codebook train and the
  * Θ(n·M·56) beamed encode that dominate a rebuild. This probe puts the
  * number on that claim at replica-corpus scale, per the BASELINE.md
  * discipline that every cost claim carries a measured datum.
  *
  * Per family: build the old-geometry index on the corpus and time it;
  * time the rebucket to the next decade's geometry; time a from-scratch
  * build at that geometry (the rebuild the migration replaces — same
  * corpus, so the deterministic model train yields the identical
  * codebook and the two trees must serve identically); then probe BOTH
  * with a fixed 50-query batch and compare collected results — the
  * AnnIngestSpec equality pin re-proven at the probe scale, so the
  * speedup is of a VERIFIED-equivalent artifact.
  *
  * Families (VERDICT r12 item 5 added the float leg, so
  * `annIndexRebucket` carries numbers like its PQ twin): `pq` — the
  * q163 posture (PQ8 codes, rebucket needs the float store); `float` —
  * the q140 posture (rows carry vectors, rebucket is self-contained; its
  * rebuild pays no model train, so the expected ratio is the
  * hash+shuffle delta only — the honest number for that family).
  *
  * Emits JSONL: a header line, then one line per timed phase, then a
  * per-family summary with the rebuild/rebucket ratio and the
  * probe-equality bit.
  *
  * Usage: tools/run_local.sh graft.tools.RebucketProbe \
  *          <corpusDir> <workDir> [oldBits=14] [newBits=17] [family=pq|float|both]
  */
object RebucketProbe {
  def main(args: Array[String]): Unit = {
    val corpusDir = args(0)
    val workDir = args(1)
    val oldBits = args.lift(2).map(_.toInt).getOrElse(14)
    val newBits = args.lift(3).map(_.toInt).getOrElse(17)
    val families = args.lift(4).getOrElse("pq") match {
      case "both" => Seq("pq", "float")
      case f => Seq(f)
    }
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
    def secs[T](f: => T): (T, Double) = {
      val t0 = System.nanoTime(); val r = f; (r, (System.nanoTime() - t0) / 1e9)
    }
    println(s"""{"corpus":"$corpusDir","rows":$total,"tables":$tables,""" +
      s""""old_bits":$oldBits,"new_bits":$newBits,"pq_bits":$pqBits,""" +
      s""""families":"${families.mkString(",")}","probe_queries":$nQueries}""")

    families.foreach { fam =>
      val migPath = s"$workDir/idx_mig_$fam"
      val refPath = s"$workDir/idx_ref_$fam"
      // Reset ONLY the probe's own subtrees (the PqIngestProbe guard).
      Seq(migPath, refPath).foreach(graft.ops.Similarity.deleteTree)

      def build(path: String, bits: Int): Unit = fam match {
        case "pq" => graft.ops.Similarity.annPqIndexWrite(emb, path,
          bitsPerTable = bits, numTables = tables, pqBits = pqBits)
        case _ => graft.ops.Similarity.annIndexWrite(emb, path,
          bitsPerTable = bits, numTables = tables)
      }
      def rebucket(path: String): Unit = fam match {
        case "pq" => graft.ops.Similarity.annPqIndexRebucket(spark, path, emb, newBits)
        case _ => graft.ops.Similarity.annIndexRebucket(spark, path, newBits)
      }
      def probe(path: String): Seq[org.apache.spark.sql.Row] = (fam match {
        case "pq" => graft.ops.Similarity.annPqIndexProbe(spark, path, queries, emb)
        case _ => graft.ops.Similarity.annIndexProbe(spark, path, queries)
      }).collect().toSeq

      val (_, buildSec) = secs(build(migPath, oldBits))
      println(s"""{"family":"$fam","phase":"build_old","geometry":"${tables}x$oldBits","sec":${f"$buildSec%.1f"}}""")
      val (_, rebucketSec) = secs(rebucket(migPath))
      println(s"""{"family":"$fam","phase":"rebucket","geometry":"${tables}x$newBits","sec":${f"$rebucketSec%.1f"}}""")
      val (_, rebuildSec) = secs(build(refPath, newBits))
      println(s"""{"family":"$fam","phase":"rebuild","geometry":"${tables}x$newBits","sec":${f"$rebuildSec%.1f"}}""")

      // Equality of the two 16×newBits trees as probe servers — collected
      // and compared row-for-row (deterministic ordering from the probe's
      // orderBy tail), so the ratio above is for a verified artifact.
      val mig = probe(migPath)
      val ref = probe(refPath)
      val equal = mig.nonEmpty && mig == ref
      println(s"""{"family":"$fam","phase":"summary","rebucket_sec":${f"$rebucketSec%.1f"},""" +
        s""""rebuild_sec":${f"$rebuildSec%.1f"},""" +
        s""""rebuild_over_rebucket":${f"${rebuildSec / rebucketSec}%.2f"},""" +
        s""""probe_rows":${mig.size},"probe_equal":$equal}""")
      require(equal, s"$fam: migrated and rebuilt indexes diverged as probe servers")
    }
    spark.stop()
  }
}
