package graft.ext

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Training-sequence packing — the step between a cleaned corpus and a
  * token pipeline (SURVEY.md §7.5 extension; no reference analog).
  *
  * Two industry shapes:
  *  - [[packSequences]]: GPT-style "concatenate in order, chop every
  *    seqLen tokens" — documents may straddle sequence boundaries, so
  *    the result is a per-doc token interval and the sequence range it
  *    spans. Exactly reproducible in SQL (the oracle re-derives it with
  *    one window cumsum).
  *  - [[packBinsFFD]]: no-split bin packing (each doc must fit whole —
  *    instruction-tuning style). First-fit-decreasing within each
  *    partition, bin ids globally unique via partition-id prefixing.
  */
object Packing {
  /** Token intervals under order-preserving concatenation, distributed.
    *
    * The naive formulation — `sum(tokens) OVER (ORDER BY id)` with no
    * partition — is a scale-killer: an unpartitioned window serializes
    * the WHOLE corpus through one task. This is the classic two-phase
    * parallel prefix scan instead: range-partition by id, aggregate one
    * total per partition (a handful of longs to the driver), cumulate
    * those into per-partition start offsets, broadcast-join them back,
    * and run the running sum per partition in parallel — the global
    * window never exists, and every phase is ∝ corpus/parallelism.
    *
    * Output: (id, n_tokens, tok_start, tok_end, seq_first, seq_last)
    * where the doc occupies tokens [tok_start, tok_end) of the
    * concatenated stream and appears in training sequences seq_first..
    * seq_last of length `seqLen`. Empty docs pin seq_last = seq_first.
    */
  def packSequences(docs: DataFrame, idCol: String, tokenCol: String,
                    seqLen: Int): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val parted = docs.select(col(idCol).as("id"), col(tokenCol).cast("long").as("n_tokens"))
      .repartitionByRange(col("id"))
      .withColumn("__pid", spark_partition_id())
      // the partition layout must be IDENTICAL between the totals pass
      // and the window pass; the eager localCheckpoint freezes the range
      // boundaries so a re-evaluation can never re-sample them
      .localCheckpoint(true)
    val totals = parted.groupBy("__pid").agg(sum("n_tokens").as("t"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).sortBy(_._1)
    var acc = 0L
    val offsets = totals.map { case (pid, t) => val o = (pid, acc); acc += t; o }
    val offDf = broadcast(offsets.toSeq.toDF("__pid", "__off"))
    val w = Window.partitionBy("__pid").orderBy("id")
    val L = lit(seqLen.toLong)
    parted.join(offDf, "__pid")
      .withColumn("tok_end", sum("n_tokens").over(w) + col("__off"))
      .withColumn("tok_start", col("tok_end") - col("n_tokens"))
      .withColumn("seq_first", floor(col("tok_start") / L).cast("long"))
      .withColumn("seq_last",
        greatest(col("seq_first"), floor((col("tok_end") - 1) / L)).cast("long"))
      .select(col("id"), col("n_tokens"), col("tok_start"), col("tok_end"),
        col("seq_first"), col("seq_last"))
  }

  /** Global 1-based rank over a total order WITHOUT an unpartitioned
    * window (which would serialize the corpus through one task): the
    * same two-phase prefix scan as [[packSequences]] with n = 1 per row
    * — range-partition on the order key, one row count per partition to
    * the driver, cumulated start offsets broadcast back, per-partition
    * `row_number` in parallel. `orderCols` must totally order the rows
    * (include a unique tiebreaker) or ranks are nondeterministic.
    * Output: the input columns plus `rank`.
    */
  def distributedRank(df: DataFrame, orderCols: Seq[org.apache.spark.sql.Column])
      : DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val parted = df.repartitionByRange(orderCols: _*)
      .withColumn("__pid", spark_partition_id())
      // freeze the sampled range boundaries between the two passes
      .localCheckpoint(true)
    val counts = parted.groupBy("__pid").agg(count(lit(1)).as("c"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).sortBy(_._1)
    var acc = 0L
    val offsets = counts.map { case (pid, c) => val o = (pid, acc); acc += c; o }
    val offDf = broadcast(offsets.toSeq.toDF("__pid", "__off"))
    val w = Window.partitionBy("__pid").orderBy(orderCols: _*)
    parted.join(offDf, "__pid")
      .withColumn("rank", row_number().over(w).cast("long") + col("__off"))
      .drop("__pid", "__off")
  }

  /** No-split bin packing, first-fit-decreasing per partition.
    *
    * True FFD is inherently sequential; the distributed shape every
    * large pipeline uses is FFD WITHIN a partition with globally-unique
    * bin ids (`pid * 2^40 + local_bin`) — packing quality is within a
    * few percent of global FFD once partitions hold thousands of docs,
    * and the pack itself is embarrassingly parallel. Docs longer than
    * `budget` get a singleton bin (flagged `oversize`).
    *
    * Output: (id, n_tokens, bin_id, oversize).
    */
  def packBinsFFD(docs: DataFrame, idCol: String, tokenCol: String,
                  budget: Long): DataFrame = {
    val spark = docs.sparkSession
    val in = docs.select(col(idCol).cast("long").as("id"),
      col(tokenCol).cast("long").as("n_tokens"))
    val schema = StructType(Seq(
      StructField("id", LongType, nullable = false),
      StructField("n_tokens", LongType, nullable = false),
      StructField("bin_id", LongType, nullable = false),
      StructField("oversize", BooleanType, nullable = false)))
    val enc = org.apache.spark.sql.Encoders.row(schema)
    in.repartitionByRange(col("id")).mapPartitions { it =>
      val rows = it.map(r => (r.getLong(0), r.getLong(1))).toArray
      if (rows.isEmpty) Iterator.empty
      else {
        val pid = org.apache.spark.TaskContext.getPartitionId().toLong
        val base = pid << 40
        // first-fit-decreasing: sort by size desc (id asc tie-break for
        // determinism), drop each doc into the first bin with room
        val sorted = rows.sortBy { case (id, n) => (-n, id) }
        val binFree = scala.collection.mutable.ArrayBuffer.empty[Long]
        val out = sorted.map { case (id, n) =>
          if (n > budget) {
            binFree += -1L // burn a bin id slot for the oversize singleton
            Row(id, n, base + binFree.length - 1L, true)
          } else {
            var b = 0
            while (b < binFree.length && binFree(b) < n) b += 1
            if (b == binFree.length) binFree += budget
            binFree(b) -= n
            Row(id, n, base + b.toLong, false)
          }
        }
        out.iterator
      }
    }(enc)
  }

  /** Range-sharded NEXT-fit-decreasing packing — the DETERMINISTIC,
    * SQL-replayable member of the no-split family. [[packBinsFFD]] is
    * the better packer but its partition boundaries come from Spark's
    * range sampler, so no other engine can replay its assignment; this
    * variant derives everything from the data: shard = id / span (fixed
    * id ranges), docs packed within a shard in (n_tokens desc, id)
    * order by next-fit (fill the current bin until a doc doesn't fit,
    * then open a new one; a doc over `budget` forces its own bin and is
    * flagged `oversize` — by next-fit its bin starts with 0 free space,
    * so nothing else ever lands in it). Bin ids are `shard << 20 +
    * local_bin`, globally unique and stable under any partitioning —
    * enforced by `span <= 2^20` (local bins can't spill into the next
    * shard's range) and `shard < 2^43` (the shift can't overflow).
    *
    * Scale shape: one hash shuffle on `shard`, each group ≤ span docs
    * (dense ids) packed in bounded memory — embarrassingly parallel,
    * no global order, no driver state. The oracle replays the identical
    * fold as a DuckDB recursive CTE advancing every shard one doc per
    * iteration (Catalog `pack_bins_nextfit`).
    *
    * Output: (id, n_tokens, bin_id, oversize) — same contract as FFD.
    */
  def packBinsNextFit(docs: DataFrame, idCol: String, tokenCol: String,
                      budget: Long, span: Long): DataFrame = {
    require(budget > 0 && span > 0)
    // bin_id packs shard << 20 | local_bin: local_bin < span must fit
    // in the 20 low bits (worst case one bin per doc) and the shifted
    // shard must not overflow Long, or bin ids silently collide across
    // adjacent shards (r10 advisor finding)
    require(span <= (1L << 20),
      s"span $span exceeds 2^20: local bin ids would collide across shards")
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(col(idCol).cast("long").as("id"),
        col(tokenCol).cast("long").as("n_tokens"),
        // ids are non-negative in every corpus this packs (scaled
        // replicas stay positive: id + replica * IdStride); floor
        // matches DuckDB's `//` there, and both engines stay exact
        // while id < 2^53
        floor(col(idCol).cast("long") / span).cast("long").as("shard"))
      .as[(Long, Long, Long)]
      .groupByKey(_._3)
      .flatMapGroups { (shard, it) =>
        // shard << 20 must stay within Long: ids >= 2^43 * span would
        // wrap the packed bin id negative and collide
        require(shard < (1L << 43),
          s"shard $shard >= 2^43: shard << 20 would overflow Long")
        val items = it.map { case (id, n, _) => (id, n) }.toArray
          .sortBy { case (id, n) => (-n, id) }
        var bin = -1L; var free = -1L
        items.iterator.map { case (id, n) =>
          if (bin < 0 || n > free) { bin += 1; free = math.max(budget - n, 0L) }
          else free -= n
          (id, n, (shard << 20) + bin, n > budget)
        }
      }
      .toDF("id", "n_tokens", "bin_id", "oversize")
  }
}
