package graft.sources

import org.scalatest.funsuite.AnyFunSuite

class JdbcSpec extends AnyFunSuite {
  test("partitioned read options carry range-split + batching + pushdown") {
    val p = Jdbc.PartitionedRead("jdbc:mysql://host/db", "player", "id",
      0L, 100000000L, numPartitions = 64, fetchSize = 5000,
      user = Some("u"), password = Some("p"))
    val o = Jdbc.options(p)
    assert(o("numPartitions") == "64" && o("partitionColumn") == "id")
    assert(o("lowerBound") == "0" && o("upperBound") == "100000000")
    assert(o("fetchsize") == "5000")
    assert(o("pushDownPredicate") == "true" && o("pushDownAggregate") == "true")
    assert(o("user") == "u" && o("password") == "p")
    val anon = Jdbc.options(p.copy(user = None, password = None))
    assert(!anon.contains("user") && !anon.contains("password"))
  }
}
