package graft.queries

import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

class CatalogSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("every oracle key has a query") {
    assert(Catalog.oracles.keySet.subsetOf(Catalog.queries.keySet))
  }

  test("entry names are unique") {
    assert(Catalog.entries.map(_.name).distinct.size == Catalog.entries.size)
  }

  test("flagship entry returns the four diff kinds") {
    val kinds = graft.SparkEntry.entry(spark).collect().map(_.getString(0)).toSet
    assert(kinds == Set("changed", "deleted", "new", "unchanged"))
  }
}
