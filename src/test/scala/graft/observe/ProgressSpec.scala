package graft.observe

import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

class ProgressSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("listener reports stage progress") {
    val listener = new ProgressListener(everyPct = 5, sink = _ => ())
    spark.sparkContext.addSparkListener(listener)
    try {
      spark.range(0, 1000000, 1, 8).selectExpr("sum(id)").collect()
      // listener bus is async; poll briefly for delivery
      val deadline = System.currentTimeMillis() + 10000
      while (listener.events.isEmpty && System.currentTimeMillis() < deadline)
        Thread.sleep(50)
      assert(!listener.events.isEmpty)
      assert(listener.events.peek().matches("""\[stage \d+\] \d+/\d+ tasks \(\d+%\)"""))
    } finally spark.sparkContext.removeSparkListener(listener)
  }
}
