package graft.queries

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import graft.core.Tables

/** Benchmark-scale replication of the `documents`/`embeddings` fixtures.
  *
  * The driver testdata ships toy-sized docs/embeddings tables, so
  * dedup/text/ANN bench numbers measured fixed overhead, not data. This
  * derives a corpus that actually grows with sf — 500k docs / 200k
  * vectors at sf0.1 (base 5000/2000 × multiplier 100) — purely from the
  * driver's own tables (deterministic, no RNG), materialized once under
  * `target/scaled/` and reused while the source fingerprint matches.
  *
  * Replication preserves the fixture's dedup structure instead of
  * inflating it: replica 0 is the original corpus verbatim; replica
  * `r > 0` rewrites every word `w` to `md5(w|r)[0:8]`, so
  *  - within one replica, word-set relationships are isomorphic to the
  *    originals (planted exact dups stay exact, near-dups keep their
  *    exact Jaccard — a bijection on words preserves set overlap), and
  *  - across replicas, token sets are disjoint, so no spurious
  *    cross-replica near-dups appear and cluster sizes stay constant as
  *    the corpus grows — candidate-pair volume scales LINEARLY with m,
  *    the shape a real sharded corpus has, not quadratically.
  * Embeddings likewise: replica 0 verbatim; replicas get deterministic
  * per-(id, replica, dim) noise from xxhash64, spreading copies through
  * the space so ANN recall at 50k vectors is a real measurement, not
  * duplicate-collapse.
  *
  * CORRECTNESS is untouched: `Verify` runs the raw driver dir; only
  * `Bench` routes documents/embeddings queries here.
  */
object ScaledFixtures {
  /** Replicas per fixture row for a driver sf dir: sf0.001 → 1 (raw),
    * sf0.01 → 10 (5k docs), sf0.1 → 100 (50k docs). Unrecognized dir
    * names scale 1 (raw passthrough).
    */
  def multiplier(sfDir: String): Int = {
    val name = new java.io.File(sfDir).getName
    val m =
      if (name.startsWith("sf"))
        name.drop(2).toDoubleOption
          .map(sf => math.max(1L, math.round(sf * 1000))).getOrElse(1L)
      else 1L
    math.min(m, 1000L).toInt
  }

  /** Replica id stride: scaled ids are `id + replica * IdStride`, keeping
    * within-replica id adjacency (consecutive-pair queries) intact.
    */
  val IdStride = 10000000L

  /** Bump when the replication scheme changes (word bijection, noise
    * amplitude, IdStride, partitioning) — invalidates cached corpora.
    */
  private val SchemeVersion = 4

  /** Output file count for a scaled corpus: data-proportional, anchored
    * at defaultParallelism for the m=100 bench corpus (sf0.1 → 32 files,
    * unchanged from scheme v3 — bench continuity preserved) and growing
    * with m above that, so BYTES PER FILE stay constant as a probe
    * corpus scales. A real cluster gets this invariant for free from
    * 128 MB scan splits; the v3 flat `min(m, defaultParallelism)` pinned
    * every corpus to 32 files, which pinned the gram-explode map tasks
    * to 32 at ANY scale — the 4× probe leg ran each map-side shuffle
    * sorter over 4× the records in fixed memory, and its super-linear
    * spill merging read as a fake super-linear WORK ratio on linear
    * operators (VERDICT r13 #2: the winnowed-hub 5.19-vs-5.0 breach;
    * same mechanism dupSpanStats measured and spread away query-side in
    * r13). Fixing the LAYOUT fixes every scan-fed family at once and
    * measures the deployment posture instead of a file-count artifact.
    */
  private def nOutFiles(spark: SparkSession, m: Int): Int =
    math.min(m,
      spark.sparkContext.defaultParallelism * math.max(1, (m + 99) / 100))

  /** Fingerprint of everything the cached corpus derives from: scheme
    * version, multiplier, and the source parquet files' (name, size,
    * mtime). Regenerated driver testdata or a scheme change ⇒ different
    * string ⇒ the stale cache is rebuilt instead of silently served.
    */
  private def fingerprint(sfDir: String, m: Int): String = {
    val files = Seq("documents.parquet", "embeddings.parquet").flatMap { t =>
      val f = new java.io.File(sfDir, t)
      val parts =
        if (f.isDirectory) f.listFiles().toSeq.sortBy(_.getName) else Seq(f)
      parts.map(p => s"${t}/${p.getName}:${p.length}:${p.lastModified}")
    }
    s"v$SchemeVersion m$m stride$IdStride\n${files.mkString("\n")}"
  }

  /** Directory whose `documents.parquet`/`embeddings.parquet` are the
    * scaled fixtures for `sfDir` — materialized on first call and reused
    * while the marker's source fingerprint still matches; `sfDir` itself
    * when the multiplier is 1.
    */
  def ensure(spark: SparkSession, sfDir: String): String = synchronized {
    val m = multiplier(sfDir)
    if (m <= 1) return sfDir
    val out = s"target/scaled/${new java.io.File(sfDir).getName}"
    val marker = new java.io.File(s"$out/_SCALED_OK")
    val fp = fingerprint(sfDir, m)
    def fresh() = marker.exists() &&
      java.nio.file.Files.readString(marker.toPath) == fp
    if (!fresh()) {
      // `synchronized` only excludes THIS JVM; two concurrent processes
      // (Bench alongside a Verify) could interleave the marker-delete /
      // rebuild and one would read a torn corpus. An OS file lock on a
      // sibling lockfile makes the rebuild a cross-process critical
      // section; freshness is re-checked under the lock because the
      // other process may have completed the same rebuild while we
      // waited.
      new java.io.File(out).mkdirs()
      val ch = java.nio.channels.FileChannel.open(
        java.nio.file.Paths.get(out, "_SCALED_LOCK"),
        java.nio.file.StandardOpenOption.CREATE,
        java.nio.file.StandardOpenOption.WRITE)
      try {
        val lock = ch.lock()
        try {
          if (!fresh()) {
            marker.delete() // no marker while (re)building — crash ⇒ rebuild
            scaledDocs(spark, sfDir, m)
              .write.mode(SaveMode.Overwrite).parquet(s"$out/documents.parquet")
            scaledEmbeddings(spark, sfDir, m)
              .write.mode(SaveMode.Overwrite).parquet(s"$out/embeddings.parquet")
            java.nio.file.Files.writeString(marker.toPath, fp)
          }
        } finally lock.release()
      } finally ch.close()
    }
    out
  }

  private def replicas(spark: SparkSession, m: Int): DataFrame =
    spark.range(m).select(col("id").as("rep"))

  private[queries] def scaledDocs(spark: SparkSession, sfDir: String, m: Int): DataFrame = {
    val base = Tables.load(spark, sfDir, "documents")
    base.crossJoin(replicas(spark, m))
      .select(
        (col("doc_id") + col("rep") * lit(IdStride)).as("doc_id"),
        when(col("rep") === 0, col("text"))
          // 14 hex chars (56 bits) of the md5: at ~10^6 distinct words
          // per replica the birthday collision odds are ~10^-5, so the
          // word rewrite is a bijection in practice and set overlap —
          // hence planted Jaccard — is preserved exactly (8 chars / 32
          // bits had ~10% collision odds at that vocabulary)
          .otherwise(concat_ws(" ", transform(split(col("text"), " "),
            w => substring(md5(concat(w, lit("|"), col("rep").cast("string"))
              .cast("binary")), 1, 14))))
          .as("text"),
        col("lang"), col("source"))
      .withColumn("n_chars", length(col("text")).cast("long"))
      // spread replicas across files so the sketch/scan work actually
      // parallelizes (the raw 500-doc file is a single input split) —
      // data-proportionally, so per-file bytes hold constant with m
      .repartition(nOutFiles(spark, m), col("doc_id"))
  }

  private[queries] def scaledEmbeddings(spark: SparkSession, sfDir: String, m: Int): DataFrame = {
    val base = Tables.load(spark, sfDir, "embeddings")
    // replica 0 verbatim; replicas add per-(id, rep, dim) hash noise of
    // ±0.25 — TWICE the unit-vector component rms (0.125) — so a replica
    // sits near the data manifold (cos ≈ 0.65 to its source: a plausible
    // DISTRACTOR) without being a near-dup of anything: the scaled
    // corpus stresses candidate volume, not output volume. (Mild noise
    // here would manufacture ~m²/2 true near-dup pairs per base vector —
    // a quadratic OUTPUT no real corpus has.)
    base.crossJoin(replicas(spark, m))
      .select(
        (col("vec_id") + col("rep") * lit(IdStride)).as("vec_id"),
        when(col("rep") === 0, col("embedding"))
          .otherwise(transform(col("embedding"), (x, i) =>
            (x.cast("double") +
              (pmod(xxhash64(col("vec_id"), col("rep"), i), lit(2001L)) - lit(1000L))
                .cast("double") / lit(4000.0)).cast("float")))
          .as("embedding"),
        col("label"))
      .repartition(nOutFiles(spark, m), col("vec_id"))
  }

  /** Query names Bench routes to the scaled dir: everything whose inputs
    * are exclusively `documents`/`embeddings`.
    */
  def appliesTo(name: String): Boolean =
    Seq("dedup_", "text_", "sim_", "emb_", "mm_", "pack_", "corpus_", "join_fuzzy")
      .exists(name.startsWith) ||
      name == "sample_hash" || name == "sample_stratified"
}
