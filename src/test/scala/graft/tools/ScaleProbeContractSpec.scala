package graft.tools

import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** Pins the [[ScaleProbe.MedianLegs]] contract (ADVICE r12): a
  * MedianLegs family re-runs the SAME probe several times in one child
  * session with cleanup only after all legs, so its gate is coherent
  * only for pure recompute. Three hazards would silently gut it:
  *  - QueryCache memoization — warm legs read a persisted frame and
  *    measure ~0, so the median drops to noise on both sides and the
  *    ratio gates nothing;
  *  - scratch-state writes — a second leg replays over (or collides
  *    with) the first leg's `target/qstate` layout;
  *  - a [[ScaleProbe.prepare]] fixture — [[ScaleProbe.preparedRoots]]
  *    is consumed once and cleaned once, so legs 2+ would read a
  *    missing root.
  * Rather than trusting a name list, this spec RE-DERIVES each property
  * from the query itself at the test fixture scale.
  */
class ScaleProbeContractSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def resolve(name: String) =
    ScaleProbe.ExtraProbes.getOrElse(name, graft.SparkEntry.queries(name))

  test("every MedianLegs name resolves to a probe or declared query") {
    ScaleProbe.MedianLegs.keys.foreach { name =>
      assert(ScaleProbe.ExtraProbes.contains(name) ||
             graft.SparkEntry.queries.contains(name),
        s"MedianLegs names unknown probe $name")
      assert(ScaleProbe.MedianLegs(name) >= 2,
        s"MedianLegs($name) < 2 legs is a no-op entry — remove it")
    }
  }

  test("MedianLegs families are not memoized (a warm leg must recompute)") {
    ScaleProbe.MedianLegs.keys.foreach { name =>
      val q = resolve(name)
      // leg 1: materialize exactly like the probe's timed body — if the
      // body populates any persisted cache, leg 2's plan will read it
      q(spark, TestSpark.Sf).write.format("noop").mode("overwrite").save()
      val warmPlan = q(spark, TestSpark.Sf)
        .queryExecution.executedPlan.toString
      assert(!warmPlan.contains("InMemoryTableScan") &&
             !warmPlan.contains("InMemoryRelation"),
        s"$name is cache-backed on a warm leg — its MedianLegs repeats " +
          "would measure the cache, not the operator")
    }
  }

  test("MedianLegs families are scratch-state-free and prepare-free") {
    ScaleProbe.MedianLegs.keys.foreach { name =>
      ScaleProbe.prepare(name, spark, TestSpark.Sf)
      assert(!ScaleProbe.preparedRoots.contains((name, TestSpark.Sf)),
        s"$name registers a prepare fixture — cleanupProbe runs once " +
          "after ALL legs, so legs 2+ would read a deleted root")
      q_scratch_check(name)
    }
  }

  /** Running the probe must not create a `target/qstate/<name>` layout —
    * the repo's one sanctioned scratch-write location (Catalog
    * `scratchDir`): state machines there are leg-order-dependent.
    */
  private def q_scratch_check(name: String): Unit = {
    val stateDir = java.nio.file.Paths.get(s"target/qstate/$name")
    resolve(name)(spark, TestSpark.Sf)
      .write.format("noop").mode("overwrite").save()
    assert(!java.nio.file.Files.exists(stateDir),
      s"$name wrote scratch state at $stateDir — a second identical leg " +
        "would collide with or replay over the first's state")
  }
}
