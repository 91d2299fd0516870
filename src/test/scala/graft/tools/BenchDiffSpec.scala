package graft.tools

import org.scalatest.funsuite.AnyFunSuite

class BenchDiffSpec extends AnyFunSuite {
  private def write(json: String): String = {
    val f = java.nio.file.Files.createTempFile("benchdiff", ".json")
    java.nio.file.Files.write(f, json.getBytes("UTF-8"))
    f.toString
  }

  test("flags a >2x regression on a non-trivial query; sub-second noise does not flag") {
    val old = write("""{"queries":{"a":2.0,"b":0.2,"gone":1.0},"single_run":[]}""")
    val neu = write("""{"queries":{"a":5.0,"b":0.6,"fresh":9.9},"single_run":[]}""")
    assert(BenchDiff.run(old, neu) == 1,
      "query a tripled (2 -> 5 s) and must flag; sub-second b must not")
  }

  test("cold single-run medians and new/removed queries never flag") {
    val old = write("""{"queries":{"a":2.0},"single_run":[]}""")
    val neu = write("""{"queries":{"a":9.0,"fresh":50.0},"single_run":["a"]}""")
    assert(BenchDiff.run(old, neu) == 0,
      "a is a cold single sample in the new record - advisory only")
  }

  test("the real r7 -> r8 records parse and show no regression") {
    assert(BenchDiff.run("BENCH_r07_full.json", "BENCH_r08_full.json") == 0)
  }

  test("a record with no parseable queries map ERRORS instead of passing silently") {
    // r8 advisory: regex-scraping an empty/renamed record yielded an
    // empty map, zero shared queries, and a clean exit — a false "no
    // regressions" from the very tool built to catch silent drift
    val good = write("""{"queries":{"a":2.0},"single_run":[]}""")
    val empty = write("""{"metric":"total","value":1.0}""")
    intercept[IllegalArgumentException] { BenchDiff.run(good, empty) }
    intercept[IllegalArgumentException] { BenchDiff.run(empty, good) }
  }
}
