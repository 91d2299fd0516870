package graft.core

import org.apache.spark.sql.{DataFrame, SaveMode}
import org.apache.spark.sql.functions._

/** Cold/warm CDC topologies + ordered state commit — the composition the
  * reference's `extract` (src/download.py:22-87) and `post_download`
  * (download.py:532-604) perform.
  *
  * The reference picks one of two asyncio DAGs: cold 3-stage
  * `fetch → {update, hash}` for an empty target (download.py:29-42), warm
  * 5-stage `load → filter ⋈ fetch → {update, hash}` for incremental
  * (download.py:44-63). Here both are ONE logical plan each; the "two
  * sinks" fan-out (download.py:421-429) becomes two actions over a
  * persisted frame.
  *
  * Commit ordering (SURVEY §7.4.4, reference download.py:557-604): the
  * changelog must capture old rows BEFORE the snapshot swap (its join reads
  * `{t}` not `{t}_new`, download.py:585-595). Hence: write changelog →
  * write snapshot → write signature state.
  */
object Pipeline {
  /** Runaway-delete circuit breaker: the reference refuses to delete when
    * ≥100k ids vanished ("did tig's db update?", download.py:326-330).
    */
  val DefaultMaxDeletes = 100000L

  final case class WarmResult(
    kinds: DataFrame,        // (key*, kind) classification
    newSnapshot: DataFrame,  // post-apply table state
    changelog: DataFrame,    // old versions of changed rows
    newState: DataFrame      // (key*, sig) cache for the next run
  ) {
    /** Release the frames warm() pinned; call after committing. Repeated
      * warm runs (continuous apply) leak cache entries without this.
      */
    def release(): Unit = {
      kinds.unpersist()
      newSnapshot.unpersist()
    }
  }

  /** How a committed snapshot's files are laid out (reference:
    * README.md:14 stores replicas MyISAM "optimized for reads" — this is
    * the columnar form of that intent). `Plain` writes partitions as
    * produced; `Sorted` range-partitions + sorts so parquet min/max
    * statistics prune key-range scans to a handful of files; `Zordered`
    * clusters along the z-curve so filters on ANY curve column prune
    * ([[Layout]]). `numFiles = None` sizes from the session's default
    * parallelism. The layout pass costs one extra shuffle of the
    * snapshot at commit time — paid once per commit, repaid by every
    * subsequent selective scan.
    */
  sealed trait SnapshotLayout
  object SnapshotLayout {
    case object Plain extends SnapshotLayout
    final case class Sorted(cols: Seq[String], numFiles: Option[Int] = None)
      extends SnapshotLayout
    final case class Zordered(cols: Seq[String], numFiles: Option[Int] = None)
      extends SnapshotLayout
  }

  private def writeSnapshot(df: DataFrame, dir: String, layout: SnapshotLayout): Unit =
    layout match {
      case SnapshotLayout.Plain =>
        df.write.mode(SaveMode.Overwrite).parquet(dir)
      case SnapshotLayout.Sorted(cols, nf) =>
        Layout.writeSorted(df, dir, cols,
          nf.getOrElse(df.sparkSession.sparkContext.defaultParallelism))
      case SnapshotLayout.Zordered(cols, nf) =>
        Layout.writeZordered(df, dir, cols,
          nf.getOrElse(df.sparkSession.sparkContext.defaultParallelism))
    }

  /** Cold full load (reference download.py:29-42): scan the source once,
    * derive scores + signature in the same pass (table.py:79-93,
    * download.py:389-400), fan out to snapshot + signature state.
    */
  def cold(external: DataFrame, key: Seq[String], dataCols: Seq[String]): (DataFrame, DataFrame) = {
    val scored = Scores.withOverall(Scores.withScores(external))
    val state  = external.select(
      key.map(col) :+ Signatures.md5Sig(dataCols.map(col)).as(Diff.SigCol): _*)
    (scored, state)
  }

  /** Cold-load commit: one source pass fanned out to the two sinks
    * (reference's cold topology `fetch → {update, hash}`,
    * download.py:29-42, the `fanout_split` at download.py:421-429) —
    * persist once, write snapshot then signature state, release.
    */
  def commitCold(external: DataFrame, key: Seq[String], dataCols: Seq[String],
                 baseDir: String): Unit = {
    val (scored, _) = cold(external, key, dataCols)
    val cached = scored.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      cached.write.mode(SaveMode.Overwrite).parquet(s"$baseDir/snapshot")
      cached.select(key.map(col) :+
          Signatures.md5Sig(dataCols.map(col)).as(Diff.SigCol): _*)
        .write.mode(SaveMode.Overwrite).parquet(s"$baseDir/state")
    } finally cached.unpersist()
  }

  /** Warm incremental run (reference download.py:44-63 + post_download
    * 532-604). `internal` is the current snapshot, `external` the live
    * source; both share `key` + `dataCols`.
    *
    * `deriveFetched` re-applies the snapshot's derived columns (scores,
    * reference download.py:437-441 injects score exprs into the keyed
    * fetch) to incoming rows, so a snapshot written by [[commitCold]]
    * (which carries score columns) round-trips through warm runs:
    * pass `Scores.withOverall(Scores.withScores(_))` to match.
    *
    * `kinds` is persisted here: the classify join feeds four downstream
    * consumers (delete count, changelog, fetch, state) and is the
    * dominant cost — without the persist it re-executes per action.
    *
    * `state`: the committed (key, sig) signature cache from the previous
    * run. When provided, the diff runs against IT (the reference's hash
    * side-table protocol, download.py:89-111) — the snapshot's data
    * columns are never re-hashed, and the next state is maintained
    * incrementally from the RAW source rows of touched keys, so derived
    * columns (normalized names) never churn the diff. When absent
    * (legacy/cold), the snapshot itself is hashed and the next state is
    * derived from the new snapshot — only valid when `deriveFetched`
    * leaves `dataCols` untouched.
    */
  def warm(internal: DataFrame, external: DataFrame,
           key: Seq[String], dataCols: Seq[String],
           maxDeletes: Long = DefaultMaxDeletes,
           deriveFetched: DataFrame => DataFrame = identity,
           state: Option[DataFrame] = None,
           nullSafeKeys: Boolean = true): WarmResult = {
    val kinds = state.map(Diff.classifyState(_, external, key, dataCols, nullSafeKeys))
      .getOrElse(Diff.classify(internal, external, key, dataCols, nullSafeKeys))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val touched  = kinds.filter(col(Diff.KindCol).isin("changed", "new"))
    val rawFetch = Diff.semiJoinChanged(external, touched, key, nullSafeKeys)
    val fetched  = deriveFetched(rawFetch)
    val changedKeys = kinds.filter(col(Diff.KindCol) === "changed")
    val changelog   = Changelog.captureOld(internal, changedKeys, key, nullSafeKeys)

    // Deleted-rows circuit breaker (download.py:326-330): if the source
    // lost too many keys, treat it as a source fault and skip deletes.
    val deletedKeys  = kinds.filter(col(Diff.KindCol) === "deleted")
    val deleteCount  = deletedKeys.count()
    val skipDeletes  = deleteCount >= maxDeletes
    val afterDeletes =
      if (skipDeletes) internal
      else Diff.antiJoinDeleted(internal, deletedKeys, key, nullSafeKeys)

    val newSnapshot = Diff.upsertReplace(afterDeletes, fetched, key, nullSafeKeys)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val newState = state match {
      case Some(st) =>
        // incremental state maintenance ∝ delta: previous state minus
        // deleted keys, upserted with RAW-source sigs of touched keys
        // (the reference updates `{t}_hashes` from downloaded rows,
        // download.py:577-583 — never from the post-derive replica)
        val afterDelState =
          if (skipDeletes) st else Diff.antiJoinDeleted(st, deletedKeys, key, nullSafeKeys)
        Diff.upsertReplace(afterDelState, Diff.sigTable(rawFetch, key, dataCols), key, nullSafeKeys)
      case None =>
        Diff.sigTable(newSnapshot, key, dataCols)
    }
    WarmResult(kinds, newSnapshot, changelog, newState)
  }

  /** Ordered durable commit (reference download.py:557-604). Parquet
    * overwrite of separate directories stands in for the reference's
    * TRUNCATE/REPLACE double-buffer swap — readers of the old directory
    * are unaffected until each write completes.
    *
    * When `runVersion` is not supplied it comes from a monotonic
    * per-directory counter (NOT wall-clock time: two commits within one
    * millisecond, or a clock regression, would write duplicate or
    * out-of-order changelog versions and make Changelog.latest ambiguous).
    */
  def commit(r: WarmResult, baseDir: String,
             runVersion: Option[Long] = None,
             layout: SnapshotLayout = SnapshotLayout.Plain): Unit = {
    val v = runVersion.getOrElse(nextRunVersion(baseDir))
    // the version column makes Changelog.latest reconstructible from the
    // durable multi-run changelog (parquet append preserves no order)
    r.changelog.withColumn("version", lit(v))
      .write.mode(SaveMode.Append).parquet(s"$baseDir/changelog")
    writeSnapshot(r.newSnapshot, s"$baseDir/snapshot", layout)
    r.newState.write.mode(SaveMode.Overwrite).parquet(s"$baseDir/state")
  }

  /** Monotonic run-version counter, durable per directory: strictly
    * greater than any version this directory has seen, seeded from (and
    * usually tracking) wall-clock millis so versions stay human-readable.
    */
  private def nextRunVersion(baseDir: String): Long = synchronized {
    import java.nio.file.{Files, Paths}
    val p = Paths.get(s"$baseDir/_last_run_version")
    val last =
      if (Files.exists(p)) Files.readString(p).trim.toLongOption.getOrElse(0L)
      else 0L
    val next = math.max(System.currentTimeMillis(), last + 1)
    Files.createDirectories(Paths.get(baseDir))
    // tmp + ATOMIC_MOVE (same protocol as the VERSION pointer): a crash
    // mid-write must not corrupt the counter — toLongOption would fall
    // back to 0 and a regressed clock could then reissue a used version
    val tmp = Paths.get(s"$baseDir/_last_run_version.tmp")
    Files.writeString(tmp, next.toString)
    Files.move(tmp, p, java.nio.file.StandardCopyOption.ATOMIC_MOVE,
      java.nio.file.StandardCopyOption.REPLACE_EXISTING)
    next
  }

  /** Crash-consistent variant of [[commit]]: snapshot/state land in fresh
    * `v=N` directories and a VERSION pointer file is renamed into place
    * LAST — the faithful generalization of the reference's double-buffered
    * `_hashes_0/_hashes_1` + staging swap (download.py:572-604): readers
    * follow the pointer and never observe a half-written version.
    * Returns the committed version.
    */
  def commitVersioned(r: WarmResult, baseDir: String,
                      layout: SnapshotLayout = SnapshotLayout.Plain): Long =
    commitVersionedAt(r, baseDir, currentVersion(baseDir).getOrElse(0L) + 1, layout)

  /** Idempotent commit of a SPECIFIC version (e.g. streaming batchId+1):
    * if `version` is already committed, this is a no-op — a replayed
    * micro-batch cannot create a phantom extra version. Returns the
    * version in effect.
    */
  def commitVersionedAt(r: WarmResult, baseDir: String, version: Long,
                        layout: SnapshotLayout = SnapshotLayout.Plain): Long = {
    import java.nio.file.{Files, Paths, StandardCopyOption}
    val current = currentVersion(baseDir).getOrElse(0L)
    if (version <= current) return current // already committed: replay no-op
    // changelog also lands under v=N: a crash before the pointer move
    // leaves the orphan invisible to readChangelog (which filters v <=
    // pointer), and a retry overwrites rather than duplicating history
    r.changelog.write.mode(SaveMode.Overwrite).parquet(s"$baseDir/changelog/v=$version")
    writeSnapshot(r.newSnapshot, s"$baseDir/snapshot/v=$version", layout)
    r.newState.write.mode(SaveMode.Overwrite).parquet(s"$baseDir/state/v=$version")
    val tmp = Paths.get(s"$baseDir/VERSION.tmp")
    Files.createDirectories(Paths.get(baseDir))
    Files.writeString(tmp, version.toString)
    Files.move(tmp, Paths.get(s"$baseDir/VERSION"),
      StandardCopyOption.ATOMIC_MOVE, StandardCopyOption.REPLACE_EXISTING)
    version
  }

  def currentVersion(baseDir: String): Option[Long] = {
    val p = java.nio.file.Paths.get(s"$baseDir/VERSION")
    if (java.nio.file.Files.exists(p))
      Some(java.nio.file.Files.readString(p).trim.toLong)
    else None
  }

  /** Read the committed snapshot/state ("snapshot" | "state") at the
    * version the pointer names.
    */
  def readLatest(spark: org.apache.spark.sql.SparkSession, baseDir: String,
                 what: String): DataFrame = {
    val v = currentVersion(baseDir).getOrElse(
      throw new IllegalStateException(s"no committed version under $baseDir"))
    readVersion(spark, baseDir, what, v)
  }

  /** Time travel: read any still-retained committed version — every
    * `commitVersioned` leaves its `v=N` directory in place, giving
    * snapshot-level history on top of the row-level changelog.
    */
  def readVersion(spark: org.apache.spark.sql.SparkSession, baseDir: String,
                  what: String, version: Long): DataFrame =
    spark.read.parquet(s"$baseDir/$what/v=$version")

  /** Retention: drop snapshot/state/changelog versions older than the
    * newest `keepVersions` (never the current one). Time travel keeps
    * working within the retained window; changelog history beyond it is
    * gone — size the window to the audit requirement.
    */
  def vacuum(baseDir: String, keepVersions: Int): Unit = {
    require(keepVersions >= 1)
    val current = currentVersion(baseDir).getOrElse(return)
    val cutoff = current - keepVersions + 1
    for (what <- Seq("snapshot", "state", "changelog")) {
      val root = java.nio.file.Paths.get(s"$baseDir/$what")
      if (java.nio.file.Files.isDirectory(root)) {
        val listing = java.nio.file.Files.list(root)
        try {
          val it = listing.iterator()
          while (it.hasNext) {
            val p = it.next()
            val name = p.getFileName.toString
            if (name.startsWith("v=") && name.drop(2).toLongOption.exists(_ < cutoff))
              deleteRecursively(p)
          }
        } finally listing.close()
      }
    }
  }

  /** Committed changelog history: the `v=N` layout is read as a `v`
    * partition column; rows of versions past the pointer (orphans of a
    * crashed commit) are filtered out. `v` doubles as the version column
    * for [[Changelog.latest]].
    *
    * Compacted directories ([[compactChangelog]]) carry each row's TRUE
    * version in a `v_row` data column; it takes precedence over the
    * directory version, so version attribution survives compaction.
    */
  def readChangelog(spark: org.apache.spark.sql.SparkSession, baseDir: String): DataFrame = {
    val current = currentVersion(baseDir).getOrElse(0L)
    val raw = spark.read.option("mergeSchema", "true")
      .parquet(s"$baseDir/changelog").filter(col("v") <= current)
    if (raw.columns.contains("v_row"))
      raw.withColumn("v", coalesce(col("v_row"), col("v").cast("long"))).drop("v_row")
    else raw
  }

  /** Changelog compaction: rewrite every changelog version ≤ the pointer
    * into ONE latest-per-key partition at `v=current`, keeping each
    * surviving row's true version in `v_row`.
    *
    * Multi-run history grows one `v=N` directory per commit and
    * [[Changelog.latest]] over years of appends is a full scan of all of
    * them; after compaction it reads one directory whose row count is
    * bounded by the key cardinality, and [[readChangelog]] /
    * [[Changelog.latest]] results for the latest-per-key consumer are
    * IDENTICAL (superseded intermediate versions are dropped — that loss
    * of audit granularity is the point of compaction; vacuum already
    * bounds it in time). Run it after [[vacuum]], from the same
    * maintenance cadence. Reference analog: the `{t}_changelog` table
    * grows per-run with no compaction at all (download.py:585-595).
    *
    * Crash safety — no state ever shows DUPLICATED history, and no
    * recovery path can delete un-restored history: the rewrite lands in
    * a dot-prefixed staging dir (invisible to partition discovery); a
    * `_target` marker recording the compaction's target version is
    * written inside a dot-prefixed aside dir; every superseded version
    * dir is MOVED (renamed) under the aside, `v=$target` last; staging
    * moves into `v=$target`; aside is deleted. Readers mid-sequence may
    * see a temporarily incomplete history (this is an offline
    * maintenance op, like [[vacuum]]) but never a doubled row.
    *
    * Recovery at the start of the next invocation reads the marker's
    * target N (NOT the current pointer — a commit may have advanced it
    * since the crash): the swap completed iff root `v=N` exists AND the
    * aside ALSO holds a `v=N` (the original moves aside strictly before
    * staging moves in, so both-present can only mean root holds the
    * compacted result) — then the aside is deleted; in every other state
    * the swap never landed (root `v=N` is the original or still aside),
    * so every aside dir is restored and staging discarded. Both branches
    * are idempotent under repeated crashes mid-recovery: a partial
    * restore leaves the aside without `v=N` or the root without it,
    * which re-enters the restore branch.
    */
  def compactChangelog(spark: org.apache.spark.sql.SparkSession, baseDir: String,
                       key: Seq[String]): Unit = {
    import java.nio.file.{Files, Paths, StandardCopyOption}
    import scala.jdk.CollectionConverters._
    val current = currentVersion(baseDir).getOrElse(return)
    val clogRoot = Paths.get(s"$baseDir/changelog")
    if (!Files.isDirectory(clogRoot)) return
    val aside = clogRoot.resolve(".compact_aside")
    val staging = clogRoot.resolve(".compact_staging")
    if (Files.isDirectory(aside)) {
      val markerPath = aside.resolve("_target")
      val markerTarget =
        if (Files.exists(markerPath))
          Files.readString(markerPath).trim.toLongOption
        else None
      val swapDone = markerTarget.exists { n =>
        Files.isDirectory(clogRoot.resolve(s"v=$n")) &&
          Files.isDirectory(aside.resolve(s"v=$n"))
      }
      if (swapDone) deleteRecursively(aside)
      else { // swap never landed: restore every moved-aside version dir
        val l = Files.list(aside)
        try l.iterator.asScala.foreach { p =>
          if (p.getFileName.toString.startsWith("v="))
            Files.move(p, clogRoot.resolve(p.getFileName.toString),
              StandardCopyOption.ATOMIC_MOVE)
        } finally l.close()
        deleteRecursively(aside)
        deleteRecursively(staging)
      }
    }
    val versions = listVersionDirs(clogRoot).filter(_._1 <= current)
    if (versions.size <= 1) return
    val target = clogRoot.resolve(s"v=$current")
    val compacted = Changelog.latest(
      readChangelog(spark, baseDir).withColumn("v_row", col("v").cast("long")),
      key, "v_row").drop("v")
    deleteRecursively(staging)
    compacted.write.mode(SaveMode.Overwrite).parquet(staging.toString)
    Files.createDirectories(aside)
    Files.writeString(aside.resolve("_target"), current.toString)
    // v=current moved LAST: root-present + aside-absent v=current is the
    // recovery's completed-swap witness, so it must be the final move
    versions.sortBy(v => (v._1 == current, v._1)).foreach { case (_, p) =>
      Files.move(p, aside.resolve(p.getFileName.toString),
        StandardCopyOption.ATOMIC_MOVE)
    }
    Files.move(staging, target, StandardCopyOption.ATOMIC_MOVE)
    deleteRecursively(aside)
  }

  private def listVersionDirs(root: java.nio.file.Path): Seq[(Long, java.nio.file.Path)] = {
    import scala.jdk.CollectionConverters._
    if (!java.nio.file.Files.isDirectory(root)) return Seq.empty
    val listing = java.nio.file.Files.list(root)
    try listing.iterator.asScala.flatMap { p =>
      val n = p.getFileName.toString
      if (n.startsWith("v=")) n.drop(2).toLongOption.map(_ -> p) else None
    }.toVector
    finally listing.close()
  }

  private[graft] def deleteRecursively(p: java.nio.file.Path): Unit = {
    if (!java.nio.file.Files.exists(p)) return
    val walk = java.nio.file.Files.walk(p)
    try walk.sorted(java.util.Comparator.reverseOrder())
      .forEach(f => java.nio.file.Files.delete(f))
    finally walk.close()
  }

  /** Run per-table pipelines concurrently with fail-fast cancellation —
    * the reference runs its three table extracts in one event loop and
    * cancels the rest on first failure (start.py:55-59, download.py:38-42
    * `asyncio.wait(FIRST_EXCEPTION)`). Spark analog: one job group per
    * table on the fair scheduler; first failure cancels the group.
    */
  def runParallel(spark: org.apache.spark.sql.SparkSession,
                  jobs: Seq[(String, () => Unit)]): Unit = {
    import scala.concurrent.{Await, ExecutionContext, Future}
    import scala.concurrent.duration.Duration
    implicit val ec: ExecutionContext = ExecutionContext.global
    val groupId = s"graft-parallel-${System.nanoTime()}"
    val futures = jobs.map { case (name, job) =>
      Future {
        spark.sparkContext.setJobGroup(s"$groupId-$name", s"pipeline $name",
          interruptOnCancel = true)
        try job() finally spark.sparkContext.clearJobGroup()
      }
    }
    try Await.result(Future.sequence(futures), Duration.Inf)
    catch {
      case e: Throwable =>
        jobs.foreach { case (name, _) =>
          spark.sparkContext.cancelJobGroup(s"$groupId-$name") }
        throw e
    }
  }
}
