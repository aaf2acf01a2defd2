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

/** Session-level registry for DEFAULT handles (ADVICE r4): callers that
  * don't pass their own handle — the `queries` map entries the driver and
  * Bench invoke — used to leak pinned frames for the session lifetime.
  * `spark.catalog.clearCache()` reclaims catalog-cached ones but NOT
  * `localCheckpoint()` blocks (those persist at the RDD layer, outside the
  * CacheManager — connected components adopts such a frame). Every default
  * handle now self-registers here, and the harnesses (Bench, Verify) call
  * [[releaseDefaults]] after each query's materialization, freeing exactly
  * the library-pinned storage. Library users passing explicit handles are
  * untouched; ones relying on defaults can call releaseDefaults() at any
  * batch boundary.
  */
object StorageHandle {
  private val defaults = scala.collection.mutable.ArrayBuffer.empty[StorageHandle]

  /** A fresh handle registered for [[releaseDefaults]] cleanup. */
  def sessionDefault(): StorageHandle =
    defaults.synchronized { val h = new StorageHandle; defaults += h; h }

  /** Release every handle created by [[sessionDefault]] since the last
    * call. Idempotent, thread-safe.
    */
  def releaseDefaults(): Unit = defaults.synchronized {
    defaults.foreach(_.release()); defaults.clear()
  }
}
