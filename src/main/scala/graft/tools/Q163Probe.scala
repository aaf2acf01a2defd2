package graft.ops

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.sources.Tables.t

/** Measurement tooling (guide §1): phase-level timing of q163's index
  * build — where do its ~10.5 s go? Replicates q163AnnPqIndexBuild's
  * exact steps with per-phase timers and A/B variants:
  *   baseline — the r13 sequence (tree write, then geometry + 3 model
  *              writes sequentially, then the summary re-read);
  *   pinsums  — pqHierModelOn(pinSums = true), same sequence;
  *   partail  — the 4 small writes submitted from a thread pool
  *              (guide §2.6) after the tree write;
  *   both     — pinsums + partail.
  * Lives in graft.ops to reach the private model builders. Usage:
  *   Q163Probe <sfDir> <reps> <variant>
  */
object Q163Probe {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val reps = if (args.length > 1) args(1).toInt else 2
    val variant = if (args.length > 2) args(2) else "baseline"
    val pinSums = variant == "pinsums" || variant == "both"
    val parTail = variant == "partail" || variant == "both"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val s = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    graft.functions.VectorExpressions.register(s)
    def ms[T](tag: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[q163probe] $tag: ${(System.nanoTime() - t0) / 1e9}%.3f s"); r
    }
    (1 to reps).foreach { rep =>
      println(s"[q163probe] === rep $rep ($variant) ===")
      StorageHandle.releaseDefaults(); s.catalog.clearCache()
      val corpus = t(s, sfDir, "embeddings")
        .select(col("vec_id"), expr("transform(embedding, x -> CAST(x AS DOUBLE))").as("emb"))
        .filter(col("vec_id") % 10 =!= 0)
      val path = "/tmp/q163probe_idx"
      val total0 = System.nanoTime()
      val (cents, groups, supCents) = Similarity.pqHierModelOn(corpus,
        Similarity.annPqBits,
        groupSize = math.min(Similarity.annPqGroupSize, 1 << Similarity.annPqBits),
        refine = true, pinSums = pinSums)
      val (bitsPerTable, numTables) = Similarity.annPqGeometry
      val grpBits = Similarity.indexGrpBits(bitsPerTable)
      if (variant == "phases") {
        // Decompose the tree write: (a) train + broadcast-model build
        // only, (b) + encode/explode compute (noop sink), then the full
        // write below gives (c) − (b) = write + commit cost.
        ms("  (a) model row materialize") {
          corpus.limit(1).crossJoin(broadcast(Similarity.pqHierModelRow(cents, groups, supCents)))
            .select(col("vec_id"))
            .write.mode("overwrite").format("noop").save()
        }
        ms("  (b) train+encode+explode noop") {
          corpus.crossJoin(broadcast(Similarity.pqHierModelRow(cents, groups, supCents)))
            .select(col("vec_id"), expr(Similarity.pqEncodeHierExprStr(Similarity.annPqBeam)).as("codes"),
              posexplode(expr(graft.functions.Hyperplanes.sparkBucketsExpr("emb", bitsPerTable, numTables)))
                .as(Seq("tbl", "bucket")))
            .select(col("vec_id"), col("codes"), col("tbl").cast("int").as("tbl"),
              col("bucket").cast("int").as("bucket"))
            .withColumn("bgrp", col("bucket").bitwiseAND(lit((1 << grpBits) - 1)))
            .write.mode("overwrite").format("noop").save()
        }
        ms("  (b2) + repartition+sort noop") {
          corpus.crossJoin(broadcast(Similarity.pqHierModelRow(cents, groups, supCents)))
            .select(col("vec_id"), expr(Similarity.pqEncodeHierExprStr(Similarity.annPqBeam)).as("codes"),
              posexplode(expr(graft.functions.Hyperplanes.sparkBucketsExpr("emb", bitsPerTable, numTables)))
                .as(Seq("tbl", "bucket")))
            .select(col("vec_id"), col("codes"), col("tbl").cast("int").as("tbl"),
              col("bucket").cast("int").as("bucket"))
            .withColumn("bgrp", col("bucket").bitwiseAND(lit((1 << grpBits) - 1)))
            .repartition(col("tbl"), col("bgrp"))
            .sortWithinPartitions(col("tbl"), col("bgrp"), col("bucket"))
            .write.mode("overwrite").format("noop").save()
        }
      }
      ms("tree write (train+encode+write)") {
        corpus.crossJoin(broadcast(Similarity.pqHierModelRow(cents, groups, supCents)))
          .select(col("vec_id"), expr(Similarity.pqEncodeHierExprStr(Similarity.annPqBeam)).as("codes"),
            posexplode(expr(graft.functions.Hyperplanes.sparkBucketsExpr("emb", bitsPerTable, numTables)))
              .as(Seq("tbl", "bucket")))
          .select(col("vec_id"), col("codes"), col("tbl").cast("int").as("tbl"),
            col("bucket").cast("int").as("bucket"))
          .withColumn("bgrp", col("bucket").bitwiseAND(lit((1 << grpBits) - 1)))
          .repartition(col("tbl"), col("bgrp"))
          .sortWithinPartitions(col("tbl"), col("bgrp"), col("bucket"))
          .write.mode("overwrite").partitionBy("tbl", "bgrp").parquet(path)
      }
      val tails: Seq[(String, () => Unit)] = Seq(
        ("_geometry", () =>
          s.range(1).select(lit(bitsPerTable).as("bits"), lit(numTables).as("tables"))
            .write.mode("overwrite").parquet(s"$path/_geometry")),
        ("_codebook", () =>
          cents.withColumn("pq_bits", lit(Similarity.annPqBits))
            .write.mode("overwrite").parquet(s"$path/_codebook")),
        ("_groups", () => groups.write.mode("overwrite").parquet(s"$path/_groups")),
        ("_supcent", () => supCents.write.mode("overwrite").parquet(s"$path/_supcent")))
      if (parTail) {
        ms("tail writes (parallel)") {
          import scala.concurrent.{Await, Future, ExecutionContext}
          import scala.concurrent.duration._
          implicit val ec: ExecutionContext = ExecutionContext.fromExecutorService(
            java.util.concurrent.Executors.newFixedThreadPool(4))
          Await.result(Future.sequence(tails.map { case (_, f) => Future(f()) }), 600.seconds)
        }
      } else {
        tails.foreach { case (tag, f) => ms(s"$tag write")(f()) }
      }
      ms("summary re-read agg") {
        s.read.parquet(path)
          .groupBy(col("tbl"))
          .agg(countDistinct(col("bucket")).as("n_buckets"), count(lit(1)).as("n_rows"),
            sum(expr(s"aggregate(sequence(0, ${graft.functions.Hyperplanes.pqM - 1}), CAST(0 AS BIGINT), (acc, mm) -> acc + codes[mm] * (mm + 1))")).as("code_sum"))
          .orderBy(col("tbl"))
          .write.mode("overwrite").format("noop").save()
      }
      println(f"[q163probe] TOTAL: ${(System.nanoTime() - total0) / 1e9}%.3f s")
    }
    s.stop()
  }
}
