package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Partitioned-JDBC source configuration for a live MySQL deployment —
  * the reference's actual topology (aiomysql against the `a801` source
  * and `cfm` replica, reference: src/start.py:26-39, src/utils.py:5-14).
  *
  * The harness testdata is parquet, so this module is configuration +
  * plan shape only (nothing to connect to here); it records the decisions
  * SURVEY.md §4 made for the live path:
  *  - numPartitions/partitionColumn split the scan into parallel range
  *    queries (the reference streams one server-side cursor; Spark reads
  *    N ranges concurrently);
  *  - fetchsize batches rows off each cursor (the reference's BATCH_SIZE,
  *    start.py:46);
  *  - signature/score computation happens Spark-side after the scan
  *    (SURVEY §4: JDBC pushdown covers filters/aggregates, not arbitrary
  *    expressions — accepted trade-off, no custom DSv2 source needed).
  */
object Jdbc {
  final case class PartitionedRead(
    url: String,
    table: String,
    partitionColumn: String,
    lowerBound: Long,
    upperBound: Long,
    numPartitions: Int = 32,
    fetchSize: Int = 10000,
    user: Option[String] = None,
    password: Option[String] = None,
    driver: Option[String] = None // explicit JDBC driver class when the
                                  // URL scheme isn't auto-registered
  )

  def options(p: PartitionedRead): Map[String, String] =
    Map(
      "url" -> p.url,
      "dbtable" -> p.table,
      "partitionColumn" -> p.partitionColumn,
      "lowerBound" -> p.lowerBound.toString,
      "upperBound" -> p.upperBound.toString,
      "numPartitions" -> p.numPartitions.toString,
      "fetchsize" -> p.fetchSize.toString,
      "pushDownPredicate" -> "true",
      "pushDownAggregate" -> "true"
    ) ++ p.user.map("user" -> _) ++ p.password.map("password" -> _) ++
      p.driver.map("driver" -> _)

  def read(spark: SparkSession, p: PartitionedRead): DataFrame =
    spark.read.format("jdbc").options(options(p)).load()
}
