package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** r13 optimization scratch probe: isolate where the PQ hier-encode time
  * goes — model training, model-row assembly, the encode projection, or
  * the index write tail. Times each leg with a noop sink (guide §1.4).
  * Usage: EncodeProbe <sfDir>
  */
object EncodeProbe {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.functions.VectorExpressions.register(spark)
    def time(name: String)(df: => DataFrame): Unit = {
      val t0 = System.nanoTime()
      df.write.mode("overwrite").format("noop").save()
      println(f"[probe] $name%-28s ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    val emb = graft.sources.Tables.t(spark, dir, "embeddings")
      .select(col("vec_id"), expr("transform(embedding, x -> CAST(x AS DOUBLE))").as("emb"))
      .filter(col("vec_id") % 10 =!= 0)
    (1 to 2).foreach { round =>
      println(s"[probe] === round $round ===")
      val t0 = System.nanoTime()
      val (cents, groups, supCents) = graft.ops.Similarity.pqHierModelOn(
        emb, 8, groupSize = 8, refine = true)
      time("model (cents count)") { cents }
      time("model groups") { groups }
      time("model supCents") { supCents }
      time("encode hier expr") {
        graft.ops.Similarity.pqEncodeHier(emb, cents, groups, supCents, 3) }
      time("encode hier expr x2") {
        graft.ops.Similarity.pqEncodeHier(emb, cents, groups, supCents, 3) }
      graft.ops.StorageHandle.releaseDefaults()
      spark.catalog.clearCache()
      println(f"[probe] round total ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    spark.stop()
  }
}
