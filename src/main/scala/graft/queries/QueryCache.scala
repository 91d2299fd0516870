package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.storage.StorageLevel
import java.nio.file.{Files, Paths}
import scala.jdk.CollectionConverters._

/** Session-scoped memoization of derived values, keyed on (session, dir)
  * and invalidated by a fingerprint of the source parquet (file names +
  * sizes + mtimes): reloading a dir whose data changed recomputes instead
  * of serving stale clusters, and every eviction or invalidation releases
  * the value so executor storage is bounded — entries never leak across
  * many dirs in one long-lived session.
  *
  * `acquire` runs on insert (e.g. persist a frame), `release` on
  * eviction/invalidation (e.g. unpersist).
  */
private[queries] class ValueCache[A](sourceFile: String, maxEntries: Int = 4)(
    acquire: A => A, release: A => Unit) {
  private case class Entry(fp: String, v: A)
  private val cache =
    scala.collection.mutable.LinkedHashMap.empty[(SparkSession, String), Entry]

  private def fingerprint(dir: String): String = {
    val p = Paths.get(dir, sourceFile)
    if (!Files.exists(p)) "absent"
    else if (Files.isDirectory(p)) {
      val s = Files.list(p)
      try s.iterator.asScala.toSeq.sortBy(_.toString)
        .map(f => s"$f:${Files.size(f)}:${Files.getLastModifiedTime(f).toMillis}")
        .mkString("|")
      finally s.close()
    } else s"$p:${Files.size(p)}:${Files.getLastModifiedTime(p).toMillis}"
  }

  def get(s: SparkSession, dir: String)
         (compute: (SparkSession, String) => A): A = synchronized {
    val key = (s, dir)
    val fp = fingerprint(dir)
    cache.get(key) match {
      case Some(e) if e.fp == fp =>
        // re-insert on hit so eviction is LRU, not FIFO — otherwise a
        // session cycling through > maxEntries dirs evicts the hottest
        // persisted frame (e.g. the expensive LSH cluster DataFrame)
        cache.remove(key)
        cache.put(key, e)
        e.v
      case stale =>
        stale.foreach(e => release(e.v))
        cache.remove(key)
        if (cache.size >= maxEntries) {
          val (k0, e0) = cache.head // eldest-inserted
          release(e0.v)
          cache.remove(k0)
        }
        val v = acquire(compute(s, dir))
        cache.put(key, Entry(fp, v))
        v
    }
  }
}

/** [[ValueCache]] specialized to persisted DataFrames — the common case. */
private[queries] final class QueryCache(sourceFile: String, maxEntries: Int = 4)
  extends ValueCache[DataFrame](sourceFile, maxEntries)(
    _.persist(StorageLevel.MEMORY_AND_DISK), _.unpersist())
