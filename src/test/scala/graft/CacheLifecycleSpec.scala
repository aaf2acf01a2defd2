package graft

import org.apache.spark.sql.functions._

/** The StorageHandle contract (VERDICT r3 item 5): library operators that
  * cache intermediates register them with the caller's handle, and
  * release() reclaims exactly those — no lingering persistent RDDs, no
  * clearCache() sledgehammer.
  */
class CacheLifecycleSpec extends SparkSpec {
  import spark.implicits._

  test("released handles leave no persistent RDDs behind") {
    val docs = graft.sources.Tables.t(spark, sfDir, "documents")
    val before = spark.sparkContext.getPersistentRDDs.size

    val h1 = new ops.StorageHandle
    assert(ops.Dedup.jaccardNearDups(docs, handle = h1).count() > 0)
    val h2 = new ops.StorageHandle
    assert(ops.Dedup.minhashNearDups(docs, handle = h2).count() > 0)
    val h3 = new ops.StorageHandle
    assert(ops.Dedup.jaccardNearDupsPrefix(docs, handle = h3).count() > 0)
    val h4 = new ops.StorageHandle
    val pairs = Seq((1L, 2L), (2L, 3L)).toDF("id1", "id2")
    assert(ops.Curation.connectedComponents(
      docs.select(col("doc_id")), pairs, h4).count() > 0)
    val h5 = new ops.StorageHandle
    assert(ops.Pipeline.containmentPairs(docs, handle = h5).count() > 0)
    val h6 = new ops.StorageHandle
    assert(ops.Pipeline.q94IncrementalDedup(spark, sfDir, h6).count() > 0)
    val h7 = new ops.StorageHandle
    assert(ops.Pipeline.q96PairFeatures(spark, sfDir, h7).count() > 0)
    // Round-6 pinning operators: the consensus ensemble (pins all three
    // legs' intermediates) and the sketch-only overlap (pins the sketch
    // frame both pair sides read).
    val h8 = new ops.StorageHandle
    val emb = graft.sources.Tables.t(spark, sfDir, "embeddings")
      .select(col("vec_id"), expr("transform(embedding, x -> CAST(x AS DOUBLE))").as("emb"))
    assert(ops.Dedup.consensusNearDups(docs, emb, embBits = 8, handle = h8).count() >= 0)
    val h9 = new ops.StorageHandle
    assert(ops.Sketches.kmvOverlapSketch(docs, handle = h9).count() > 0)

    // While the handles are open the shared frames ARE cached (that's the
    // reuse the operators rely on)...
    assert(spark.sparkContext.getPersistentRDDs.size > before,
      "expected live caches while handles are open")
    h1.release(); h2.release(); h3.release(); h4.release()
    h5.release(); h6.release(); h7.release(); h8.release(); h9.release()
    // ...and releasing them restores the session exactly.
    assert(spark.sparkContext.getPersistentRDDs.size == before,
      s"leaked caches: ${spark.sparkContext.getPersistentRDDs.size} != $before")
  }
}
