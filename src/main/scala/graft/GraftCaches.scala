package graft

import java.util.concurrent.ConcurrentLinkedQueue

import org.apache.spark.sql.Dataset
import org.apache.spark.storage.StorageLevel

/**
 * Registry for the intermediate frames graft operators persist internally
 * (shingle sets, signature frames, prefix frames, bigram frames, ...).
 *
 * Operators return lazy DataFrames, so they cannot unpersist after "their"
 * action — the terminal action belongs to the caller, and unpersisting
 * before it would re-run the very subtree the persist exists to share.
 * Instead every internal persist registers here, and a long-lived session
 * (e.g. repeated [[graft.functions.Dedup.ingestDedup]] batches) reclaims
 * executor storage between batches with ONE call:
 *
 * {{{
 *   graft.GraftCaches.clearAll()   // unpersist every operator-owned frame
 * }}}
 *
 * Without it the caches accumulate MEMORY_AND_DISK entries until Spark's
 * LRU eviction churns — correct but wasteful. `clearAll` is safe at any
 * point: unpersisting only drops the cached blocks; any later reuse
 * recomputes from lineage.
 */
object GraftCaches {

  private val frames = new ConcurrentLinkedQueue[Dataset[_]]()

  /** Persist (MEMORY_AND_DISK) and register for [[clearAll]]. */
  private[graft] def cache[T](ds: Dataset[T]): Dataset[T] = {
    ds.persist(StorageLevel.MEMORY_AND_DISK)
    frames.add(ds)
    ds
  }

  /** Number of currently-registered operator caches (monitoring/tests). */
  def registered: Int = frames.size()

  /** Unpersist every operator-registered frame (non-blocking). */
  def clearAll(): Unit = {
    var f = frames.poll()
    while (f != null) {
      f.unpersist(blocking = false)
      f = frames.poll()
    }
  }

  /** `.graftCached` sugar so operator code reads as a plan annotation. */
  private[graft] implicit class Cacheable[T](private val ds: Dataset[T])
    extends AnyVal {
    def graftCached: Dataset[T] = cache(ds)
  }
}
