package graft.util

import scala.collection.mutable

import org.apache.spark.sql.DataFrame
import org.apache.spark.storage.StorageLevel

/**
 * Registry for DataFrames persisted inside operators whose plans are
 * evaluated more than once (e.g. a shingle projection feeding both a
 * document-frequency aggregate and the LSH band join). Operators register
 * the persist here instead of leaking it; entry points (Bench, Verify,
 * long-running streams) call `releaseAll()` between units of work so
 * cached blocks don't accumulate for the life of the JVM — disk-spilled
 * blocks are not LRU-evicted, so an unbounded registry grows executor
 * disk without bound in a stream.
 */
object Caches {

  private val registry = mutable.ArrayBuffer.empty[DataFrame]

  /** Persist `df` (idempotent per frame) and remember it for release. */
  def persist(df: DataFrame,
      level: StorageLevel = StorageLevel.MEMORY_AND_DISK): DataFrame =
    synchronized {
      registry += df.persist(level)
      df
    }

  /** Unpersist every registered frame (non-blocking) and clear. */
  def releaseAll(): Unit = synchronized {
    registry.foreach(_.unpersist(false))
    registry.clear()
  }
}
