package graft.ops

import org.apache.spark.sql.DataFrame

/** Cache-lifecycle contract for library operators (VERDICT r3 item 5).
  *
  * Several library functions cache intermediate frames that the RETURNED
  * (lazy) DataFrame still reads — shingle sets in the Jaccard/MinHash
  * miners, the final label frame in connected components. They cannot
  * unpersist those before returning without forfeiting the reuse, so the
  * caches used to outlive the call and leak into the caller's session
  * until `spark.catalog.clearCache()` (which is a sledgehammer: it drops
  * the CALLER's caches too).
  *
  * The contract: every caching library function takes a StorageHandle
  * (defaulting to a fresh one). Each frame it caches is registered here;
  * after the caller has materialized the result, `release()` unpersists
  * exactly those frames — nothing else in the session is touched.
  * CacheLifecycleSpec pins "no persistent RDDs survive a released call".
  * Callers that ignore the parameter get the round-3 behavior (caches
  * live until session cleanup), now as a documented choice.
  */
final class StorageHandle {
  private val frames = scala.collection.mutable.ArrayBuffer.empty[DataFrame]

  /** Cache `df` and register it for [[release]]. */
  private[graft] def pin(df: DataFrame): DataFrame = { frames += df; df.cache() }

  /** Register an already-cached (or checkpointed) frame for [[release]]
    * without touching its storage level.
    */
  private[graft] def adopt(df: DataFrame): DataFrame = { frames += df; df }

  /** Unpersist every frame this handle pinned, non-blocking. Idempotent;
    * safe while the returned DataFrames are still referenced (they will
    * recompute from source if re-executed afterwards).
    */
  def release(): Unit = { frames.foreach(_.unpersist(false)); frames.clear() }
}
