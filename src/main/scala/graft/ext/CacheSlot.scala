package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.storage.StorageLevel

/** A bounded persist slot for model-train helpers whose output is read
  * LAZILY by the caller (so the callee can never know when to
  * unpersist): each `swap` persists the new frame and releases the
  * previous occupant. The steady state is AT MOST ONE live cache per
  * call site instead of one per invocation — before this, every
  * `TextLm.train` / `TextClassifier.train` / `Mix.schedule` call leaked
  * a vocabulary- or selection-sized cache for the session lifetime, and
  * a 150-query × 3-repeat bench accumulated hundreds of them, bleeding
  * executor storage out from under the QueryCache-managed frames (the
  * standing suspect for the late-run elevation creep, PERFORMANCE.md
  * r14).
  *
  * Safety: all call sites are sequential-consume (bench/Verify
  * materialize each query before the next; the ingest chain checkpoints
  * per wave; the stream gate writes the model to parquet eagerly). If a
  * caller ever re-reads a frame after a later swap evicted it, Spark
  * recomputes from lineage — slower, never wrong.
  */
private[graft] final class CacheSlot {
  private val ref = new java.util.concurrent.atomic.AtomicReference[DataFrame](null)

  def swap(df: DataFrame,
           level: StorageLevel = StorageLevel.MEMORY_AND_DISK): DataFrame = {
    val prev = ref.getAndSet(df)
    // release BEFORE persisting the successor: CacheManager keys cache
    // entries by logical plan, and a repeat invocation's plan is
    // IDENTICAL to its predecessor's — persist-then-unpersist would
    // dedupe onto the old entry and then remove it, leaving the new
    // frame uncached. (Try: a stopped session's unpersist throws, and
    // the slot must never let teardown ordering break the next swap.)
    if (prev != null && (prev ne df)) scala.util.Try(prev.unpersist())
    df.persist(level)
  }
}
