package graft.core

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.TestSpark

class ChangelogCompactionSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val key = Seq("id")
  private val cols = Seq("name", "elo")

  private def df(rows: (Long, String, Int)*) = rows.toDF("id", "name", "elo")

  /** Commit a warm run moving `elo` of the given ids. */
  private def commitRun(dir: String, prev: org.apache.spark.sql.DataFrame,
                        next: org.apache.spark.sql.DataFrame): Long = {
    val r = Pipeline.warm(prev, next, key, cols)
    try Pipeline.commitVersioned(r, dir) finally r.release()
  }

  private def parquetFiles(dir: String): Int = {
    import scala.jdk.CollectionConverters._
    val root = java.nio.file.Paths.get(dir)
    val walk = java.nio.file.Files.walk(root)
    try walk.iterator.asScala.count(_.toString.endsWith(".parquet"))
    finally walk.close()
  }

  test("compaction: identical latest-per-key, fewer files, attribution preserved") {
    val dir = java.nio.file.Files.createTempDirectory("graft_compact").toString
    val v0 = df((1L, "a", 10), (2L, "b", 20), (3L, "c", 30))
    val v1 = df((1L, "a", 11), (2L, "b", 20), (3L, "c", 30)) // 1 changes @v2
    val v2 = df((1L, "a", 11), (2L, "b", 22), (3L, "c", 33)) // 2,3 change @v3
    val v3 = df((1L, "a", 13), (2L, "b", 22), (3L, "c", 33)) // 1 changes @v4
    commitRun(dir, v0.limit(0), v0) // v1: cold, empty changelog
    commitRun(dir, v0, v1)          // v2: old row of 1 (elo 10)
    commitRun(dir, v1, v2)          // v3: old rows of 2 (20), 3 (30)
    commitRun(dir, v2, v3)          // v4: old row of 1 (elo 11)

    def latest() = Changelog.latest(Pipeline.readChangelog(spark, dir), key, "v")
      .select(col("id"), col("name"), col("elo"), col("v").cast("long").as("v"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getInt(2), r.getLong(3)))
      .toSet

    val before = latest()
    // latest-per-key: 1 -> (elo 11, v4), 2 -> (elo 20, v3), 3 -> (elo 30, v3)
    assert(before == Set((1L, "a", 11, 4L), (2L, "b", 20, 3L), (3L, "c", 30, 3L)))
    val filesBefore = parquetFiles(s"$dir/changelog")

    Pipeline.compactChangelog(spark, dir, key)

    assert(latest() == before, "latest-per-key changed under compaction")
    val filesAfter = parquetFiles(s"$dir/changelog")
    assert(filesAfter < filesBefore,
      s"expected fewer changelog files after compaction ($filesAfter vs $filesBefore)")
    // exactly one retained version directory
    val dirs = new java.io.File(s"$dir/changelog").listFiles()
      .filter(f => f.isDirectory && f.getName.startsWith("v=")).map(_.getName).toSet
    assert(dirs == Set("v=4"))
    // full history row count collapsed to latest-per-key (3 keys, each
    // with its true version label — superseded v2 row of key 1 is gone)
    val all = Pipeline.readChangelog(spark, dir)
      .select(col("id"), col("elo"), col("v").cast("long"))
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    assert(all == Set((1L, 11, 4L), (2L, 20, 3L), (3L, 30, 3L)))

    // history keeps accruing after compaction and supersedes compacted rows
    val v4 = df((1L, "a", 13), (2L, "b", 24), (3L, "c", 33)) // 2 changes @v5
    commitRun(dir, v3, v4)
    val after = latest()
    // changelog rows are OLD versions: key 2's pre-update row (elo 22)
    // lands at v5; keys 1 and 3 keep their compacted entries
    assert(after == Set((1L, "a", 11, 4L), (2L, "b", 22, 5L), (3L, "c", 30, 3L)))

    // second compaction over mixed (compacted + fresh) layout
    Pipeline.compactChangelog(spark, dir, key)
    assert(latest() == after)
  }

  test("latest over a compacted multi-run directory READS few files (the payoff on the read path)") {
    val dir = java.nio.file.Files.createTempDirectory("graft_compact_read").toString
    // 8 warm runs, each changing one key: 8 changelog version dirs
    val states = (0 to 8).map(i => df(
      (1L, "a", 10 + (if (i >= 1) i else 0)),
      (2L, "b", 20 + (if (i >= 2) i else 0)),
      (3L, "c", 30 + (if (i >= 3) i else 0))))
    commitRun(dir, states(0).limit(0), states(0))
    (1 to 8).foreach(i => commitRun(dir, states(i - 1), states(i)))
    // files the latest() plan actually opens: distinct input_file_name
    // over the changelog scan — the read-path metric, not a directory walk
    def filesRead(): Long = Pipeline.readChangelog(spark, dir)
      .select(input_file_name()).distinct().count()
    val beforeRead = filesRead()
    assert(beforeRead >= 8, s"multi-run changelog should span many files ($beforeRead)")
    val latestBefore = Changelog.latest(Pipeline.readChangelog(spark, dir), key, "v")
      .select(col("id"), col("elo"), col("v").cast("long"))
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet

    Pipeline.compactChangelog(spark, dir, key)

    val afterRead = filesRead()
    assert(afterRead <= 2, s"compacted latest() should open one-ish file, read $afterRead")
    assert(afterRead < beforeRead / 4)
    val latestAfter = Changelog.latest(Pipeline.readChangelog(spark, dir), key, "v")
      .select(col("id"), col("elo"), col("v").cast("long"))
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    assert(latestAfter == latestBefore)
  }

  test("Runner.maintain: vacuum + compaction leave identical latest within the window") {
    val dir = java.nio.file.Files.createTempDirectory("graft_maintain").toString
    val v0 = df((1L, "a", 10), (2L, "b", 20))
    val v1 = df((1L, "a", 11), (2L, "b", 20))
    val v2 = df((1L, "a", 11), (2L, "b", 22))
    commitRun(dir, v0.limit(0), v0)
    commitRun(dir, v0, v1) // changelog v2: old row of 1
    commitRun(dir, v1, v2) // changelog v3: old row of 2
    val windowLatest = Changelog.latest(
      Pipeline.readChangelog(spark, dir).filter(col("v") >= 2), key, "v")
      .select("id", "elo").collect().map(r => (r.getLong(0), r.getInt(1))).toSet
    Runner.maintain(spark, dir, key, keepVersions = 2)
    // versions 1 dropped by vacuum; compaction over the retained window
    assert(Pipeline.currentVersion(dir).contains(3L))
    val after = Changelog.latest(Pipeline.readChangelog(spark, dir), key, "v")
      .select("id", "elo").collect().map(r => (r.getLong(0), r.getInt(1))).toSet
    assert(after == windowLatest)
    val dirs = new java.io.File(s"$dir/changelog").listFiles()
      .filter(f => f.isDirectory && f.getName.startsWith("v=")).map(_.getName).toSet
    assert(dirs == Set("v=3"))
  }

  test("compaction recovery: aside dir restored when target vanished mid-swap") {
    val dir = java.nio.file.Files.createTempDirectory("graft_compact_rec").toString
    val v0 = df((1L, "a", 10))
    val v1 = df((1L, "a", 11))
    commitRun(dir, v0.limit(0), v0)
    commitRun(dir, v0, v1)
    val before = Changelog.latest(Pipeline.readChangelog(spark, dir), key, "v")
      .select("id", "elo").collect().map(r => (r.getLong(0), r.getInt(1))).toSet
    // simulate the crash window: superseded dirs (v=current last) moved
    // under the aside parent, staging never swapped into v=current
    import java.nio.file.{Files, Paths, StandardCopyOption}
    val root = Paths.get(s"$dir/changelog")
    val aside = root.resolve(".compact_aside")
    Files.createDirectories(aside)
    Files.writeString(aside.resolve("_target"), "2")
    Files.move(root.resolve("v=2"), aside.resolve("v=2"),
      StandardCopyOption.ATOMIC_MOVE)
    Pipeline.compactChangelog(spark, dir, key) // recovery sweep runs first
    val after = Changelog.latest(Pipeline.readChangelog(spark, dir), key, "v")
      .select("id", "elo").collect().map(r => (r.getLong(0), r.getInt(1))).toSet
    assert(after == before)

    // post-swap crash window: aside still present AFTER the target landed.
    // History shows no duplicates (aside is invisible to discovery) and
    // the next invocation clears the leftover.
    Pipeline.compactChangelog(spark, dir, key)
    Files.createDirectories(aside.resolve("v=1"))
    Files.writeString(aside.resolve("_target"), "2")
    assert(Changelog.latest(Pipeline.readChangelog(spark, dir), key, "v")
      .select("id", "elo").collect().map(r => (r.getLong(0), r.getInt(1))).toSet == before)
    Pipeline.compactChangelog(spark, dir, key)
    assert(!Files.exists(aside))
  }

  test("recovery MID-aside-move must not delete un-restored history") {
    // the history-loss bug: older dirs moved aside, crash BEFORE
    // v=current moved — recovery sees root v=current (the ORIGINAL) and
    // must RESTORE the aside, never delete it
    val dir = java.nio.file.Files.createTempDirectory("graft_compact_mid").toString
    val v0 = df((1L, "a", 10), (2L, "b", 20))
    val v1 = df((1L, "a", 11), (2L, "b", 20)) // clog v2: old row of key 1
    val v2 = df((1L, "a", 11), (2L, "b", 22)) // clog v3: old row of key 2
    commitRun(dir, v0.limit(0), v0)
    commitRun(dir, v0, v1)
    commitRun(dir, v1, v2)
    val before = Changelog.latest(Pipeline.readChangelog(spark, dir), key, "v")
      .select("id", "elo").collect().map(r => (r.getLong(0), r.getInt(1))).toSet
    import java.nio.file.{Files, Paths, StandardCopyOption}
    val root = Paths.get(s"$dir/changelog")
    val aside = root.resolve(".compact_aside")
    Files.createDirectories(aside)
    Files.writeString(aside.resolve("_target"), "3")
    // v=2 moved aside; crash before v=3 (the current target) moved
    Files.move(root.resolve("v=2"), aside.resolve("v=2"),
      StandardCopyOption.ATOMIC_MOVE)
    Pipeline.compactChangelog(spark, dir, key)
    val after = Changelog.latest(Pipeline.readChangelog(spark, dir), key, "v")
      .select("id", "elo").collect().map(r => (r.getLong(0), r.getInt(1))).toSet
    assert(after == before, "history from the moved-aside version was lost")
    assert(!Files.exists(aside))
  }
}
