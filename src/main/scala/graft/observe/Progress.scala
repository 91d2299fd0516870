package graft.observe

import java.util.concurrent.ConcurrentLinkedQueue
import scala.collection.concurrent.TrieMap
import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted, SparkListenerStageSubmitted, SparkListenerTaskEnd}

/** Progress observability (reference: `PROGRESS` sampling every 5% of
  * batches, src/download.py:10-11,178-187,304-313 — operational logging,
  * not a relational operator, SURVEY.md §2.2 `filter_progress`).
  *
  * Spark-native form: a `SparkListener` reporting whenever a stage crosses
  * another `everyPct` percent of completed tasks. Attach with
  * `spark.sparkContext.addSparkListener(new ProgressListener())`; messages
  * go to the provided sink (default stderr) and are retained in `events`
  * for tests/inspection.
  */
class ProgressListener(everyPct: Int = 5, sink: String => Unit = s => System.err.println(s))
    extends SparkListener {

  private final case class StageProg(total: Int, var done: Int, var lastPct: Int)
  private val stages = TrieMap.empty[Int, StageProg]

  /** Emitted progress lines, newest last; bounded (oldest dropped) so a
    * long-running continuous session cannot grow it without limit.
    */
  val events = new ConcurrentLinkedQueue[String]()
  private val MaxEvents = 10000

  override def onStageSubmitted(ev: SparkListenerStageSubmitted): Unit =
    stages.put(ev.stageInfo.stageId, StageProg(math.max(ev.stageInfo.numTasks, 1), 0, 0))

  override def onStageCompleted(ev: SparkListenerStageCompleted): Unit =
    stages.remove(ev.stageInfo.stageId) // bound memory across a long session

  override def onTaskEnd(ev: SparkListenerTaskEnd): Unit =
    // count only successful attempts: failed and killed attempts re-run,
    // and counting them would push `done` past `total`; speculative
    // duplicates that both succeed are caught by the clamp below
    if (ev.taskInfo != null && ev.taskInfo.successful)
    stages.get(ev.stageId).foreach { p =>
      p.synchronized {
        p.done += 1
        val pct = math.min(100, p.done * 100 / p.total)
        if (pct >= p.lastPct + everyPct || p.done == p.total) {
          p.lastPct = pct - pct % everyPct
          val msg = s"[stage ${ev.stageId}] ${p.done}/${p.total} tasks ($pct%)"
          events.add(msg)
          while (events.size > MaxEvents) events.poll()
          sink(msg)
        }
      }
    }
}
