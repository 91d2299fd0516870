package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Deterministic training-epoch shard shuffle (extension beyond
  * reference parity, SURVEY.md §7.5) — the step between a curated
  * corpus and a dataloader: give every document a pseudo-random but
  * REPRODUCIBLE position for an epoch, split the permutation into
  * `nShards` equal shards (one per dataloader worker / file group), and
  * make both the assignment and the within-shard order a pure function
  * of (epoch, id) so any engine — or a re-run after a crash — derives
  * the identical plan. Real pipelines need this exact property: "epoch
  * 3, shard 17 of 64" must mean the same documents in the same order on
  * every attempt, with no stored permutation table.
  *
  * Semantics (closed-form, cross-engine):
  *  - shuffle key = md5("ep:" + epoch + ":" + id) — the house
  *    derandomization discipline ([[Dsir]] Gumbel keys, the sampler
  *    family): distinct epochs draw independent-looking permutations,
  *    same epoch replays exactly.
  *  - rank = position of (key, id) in the total lexicographic order
  *    (id is the tiebreaker; md5 collisions are ~2^-64 but determinism
  *    must not depend on their absence).
  *  - shard = (rank−1) mod nShards, pos = ⌊(rank−1)/nShards⌋ —
  *    round-robin by rank, so shard sizes are balanced to ±1 BY
  *    CONSTRUCTION (a `hash(id) mod n` assignment is only balanced in
  *    expectation; stragglers cost real wall time at 1000 workers).
  *
  * Scale shape: ranking is [[Packing.distributedRank]]'s two-phase
  * prefix scan — range-partition on the key, per-partition counts to
  * the driver (O(#partitions)), offsets broadcast back, per-partition
  * row_number in parallel. No global window, no corpus-sized driver
  * state; one exchange, linear at any corpus size.
  */
object Shard {

  /** Assign every row of `docs(idCol, …)` its epoch-shuffled shard and
    * within-shard position. Returns (idCol, shard INT, pos BIGINT).
    */
  def epochShards(docs: DataFrame, idCol: String,
                  nShards: Int, epoch: Int): DataFrame = {
    require(nShards > 0, s"nShards must be positive, got $nShards")
    val key = md5(concat(lit(s"ep:$epoch:"), col(idCol).cast("string"))
      .cast("binary"))
    val keyed = docs.select(col(idCol), key.as("__k"))
    Packing.distributedRank(keyed, Seq(col("__k").asc, col(idCol).asc))
      .select(col(idCol),
        pmod(col("rank") - 1, lit(nShards.toLong)).cast("int").as("shard"),
        // integer DIV, not floor(double division): doubles only represent
        // integers exactly below 2^53, and the scaladoc's any-corpus-size
        // claim must hold for the rank itself, not rank/2^11 (ADVICE r13)
        expr(s"(rank - 1L) DIV CAST($nShards AS BIGINT)").as("pos"))
  }
}
