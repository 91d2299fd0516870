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

/** Integration: the one source format the parquet harness can't exercise,
  * driven end-to-end through an in-process Derby database — a real
  * `format("jdbc")` load with range partitioning and predicate pushdown.
  */
class JdbcDerbySpec extends AnyFunSuite {
  private lazy val spark = graft.TestSpark.spark
  private lazy val dbPath = {
    val dir = java.nio.file.Files.createTempDirectory("graft_derby").toString
    s"$dir/cdc" // Derby creates the database directory itself
  }
  private lazy val url = s"jdbc:derby:$dbPath;create=true"

  private def seed(): Unit = {
    val conn = java.sql.DriverManager.getConnection(url)
    try {
      val st = conn.createStatement()
      st.executeUpdate("CREATE TABLE player (id BIGINT NOT NULL PRIMARY KEY, name VARCHAR(32), elo INT)")
      val ps = conn.prepareStatement("INSERT INTO player VALUES (?, ?, ?)")
      (1 to 100).foreach { i =>
        ps.setLong(1, i.toLong); ps.setString(2, s"p$i"); ps.setInt(3, 1000 + i)
        ps.addBatch()
      }
      ps.executeBatch()
      st.close(); ps.close()
    } finally conn.close()
  }

  test("partitioned JDBC read: N range queries, predicate pushed to the database") {
    seed()
    val p = Jdbc.PartitionedRead(url, "player", "id", 1L, 101L,
      numPartitions = 4, fetchSize = 50,
      driver = Some("org.apache.derby.iapi.jdbc.AutoloadedDriver"))
    val df = Jdbc.read(spark, p)
    // range split: exactly numPartitions parallel range queries
    assert(df.rdd.getNumPartitions == 4)
    assert(df.count() == 100)
    // predicate pushdown: the filter must reach the database, not Spark
    val filtered = df.filter("id <= 10")
    val plan = filtered.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters") && plan.contains("LessThanOrEqual"),
      s"filter not pushed to JDBC source:\n${plan.take(1500)}")
    assert(filtered.count() == 10)
    // the full CDC diff runs over a live JDBC source exactly as over
    // parquet: snapshot the old state FIRST (JDBC re-reads per action),
    // then perturb the table and classify against the pinned snapshot
    val internal = df.cache()
    internal.count() // materialize before mutating
    val conn = java.sql.DriverManager.getConnection(url)
    try {
      val st = conn.createStatement()
      st.executeUpdate("UPDATE player SET elo = 9999 WHERE id = 7")
      st.executeUpdate("DELETE FROM player WHERE id = 13")
      st.executeUpdate("INSERT INTO player VALUES (101, 'new', 1)")
      st.close()
    } finally conn.close()
    val external = Jdbc.read(spark, p.copy(upperBound = 102L))
    val kinds = graft.core.Diff.classify(internal, external,
        Seq("ID"), Seq("NAME", "ELO"))
      .groupBy("kind").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    internal.unpersist()
    assert(kinds == Map("unchanged" -> 98L, "changed" -> 1L,
      "deleted" -> 1L, "new" -> 1L))
  }
}
