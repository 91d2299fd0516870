package graft.core

import org.apache.spark.sql.{DataFrame, SaveMode}
import org.apache.spark.sql.functions.col

/** Output data layout for scan efficiency at scale.
  *
  * At 100 TB the snapshot's file layout decides every later scan's cost:
  * range-partitioning by the key gives globally sorted files whose
  * parquet min/max column statistics prune key-range scans to a handful
  * of files; `maxRecordsPerFile` keeps individual files within the
  * task-size sweet spot (the MyISAM "optimize for reads" intent of the
  * reference, README.md:14, done the columnar way).
  */
object Layout {
  /** Write `df` range-partitioned and sorted by `sortCols`, with at most
    * `maxRecordsPerFile` rows per file.
    */
  def writeSorted(df: DataFrame, dir: String, sortCols: Seq[String],
                  numFiles: Int, maxRecordsPerFile: Long = 5000000L): Unit =
    df.repartitionByRange(numFiles, sortCols.map(col): _*)
      .sortWithinPartitions(sortCols.map(col): _*)
      .write.mode(SaveMode.Overwrite)
      .option("maxRecordsPerFile", maxRecordsPerFile)
      .parquet(dir)
}
