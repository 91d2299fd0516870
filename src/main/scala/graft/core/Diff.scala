package graft.core

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** The CDC diff algebra — the reference's raison d'être (README.md:14-18).
  *
  * The reference hand-rolls a symmetric streaming full-outer join of two
  * `(id, hash)` streams with change classification (`filter_loop`,
  * src/download.py:113-336): matched ids with equal hash are dropped,
  * unequal hash → changed, external-only residue → new, internal-only
  * residue → deleted. Full rows are then fetched only for changed/new ids
  * (batched `WHERE IN`, download.py:435-476) and applied with REPLACE
  * semantics plus batched deletes (download.py:338-366, 489-506).
  *
  * Spark-first re-expression: the whole classification is ONE declarative
  * full-outer join on the key over `(key, sig)` projections — Catalyst
  * prunes both scans down to key+signature columns (the reference's
  * manual projection pushdown, download.py:95-98,131-141, for free), and
  * the shuffle-based join replaces the hand-managed symmetric-hash memory
  * protocol with spill-safe, partition-parallel execution. At 100 TB both
  * sides shuffle only ~(key + 16-byte sig) per row, never full rows; the
  * full-row fetch is a `left_semi` join against the (small) changed-key
  * set, which AQE broadcasts when it fits — exactly the reference's
  * semi-join-reduction intent (download.py:435 "waaaay faster").
  */
object Diff {
  val KindCol = "kind"
  val SigCol  = "sig"

  /** Key equi condition between `left`'s key columns and the
    * `__dk_`-renamed key columns of a right side built by [[rightKeys]].
    *
    * Null-safe (`<=>`, the default) keeps every operator in the algebra
    * consistent for nullable keys: a null-key row matches its null-key
    * counterpart (instead of an internal null-key row classifying
    * 'deleted' while the external null-key row appends as 'new', which
    * broke the documented apply(diff(i,e),i)==e round-trip).
    *
    * `nullSafe = false` (for keys declared non-null — every CDC primary
    * key in the reference is a MySQL NOT NULL PK) uses plain `===`. This
    * is not just cosmetic: Catalyst rewrites `a <=> b` join keys into
    * `(coalesce(a, d), isnull(a))`, whose hash partitioning a bucketed
    * table's layout does NOT satisfy — the planner disables the bucketed
    * scan and shuffles the 100 TB side. Plain `===` on the raw key keeps
    * the snapshot/state side of every warm-diff join exchange-free over
    * [[Bucketing]] tables (proven in WarmBucketedPlanSpec).
    */
  /** Fail-fast guard for the `nullSafe = false` contract: a null value in
    * a key declared non-null would silently mis-join on EVERY run under
    * `===` (null never equals) — classify 'deleted'+'new', never fetch,
    * never replace — breaking the apply(diff(i,e),i)==e round-trip
    * forever. Instead the job itself fails with a clear message. The
    * check is a per-row branch woven into the key expressions every
    * operator in the algebra joins on ([[nsCond]] guards the left side,
    * [[rightKeys]] the projected right side), so no operator can consume
    * a null key silently — distributed, codegen'd, no extra job — and it
    * folds away entirely when the column's schema already says
    * non-nullable.
    */
  private def requireKey(c: Column, k: String, nullSafe: Boolean): Column =
    if (nullSafe) c
    else when(c.isNotNull, c).otherwise(raise_error(lit(
      s"Diff: null value in key '$k' under nullSafe=false — use nullSafe=true " +
        "(null-safe <=>) for nullable keys or repair the input")))

  private[core] def nsCond(key: Seq[String], nullSafe: Boolean = true): Column =
    key.map(k =>
      if (nullSafe) col(k) <=> col(s"__dk_$k")
      else requireKey(col(k), k, nullSafe = false) === col(s"__dk_$k"))
      .reduce(_ && _)

  private[core] def rightKeys(df: DataFrame, key: Seq[String],
                              nullSafe: Boolean = true): DataFrame =
    df.select(key.map(k => requireKey(col(k), k, nullSafe).as(s"__dk_$k")): _*)

  /** (key, sig) projection — the persisted signature cache the reference
    * keeps in its `{t}_hashes_0/1` side tables (table.py:107-117).
    */
  def sigTable(df: DataFrame, key: Seq[String], dataCols: Seq[String]): DataFrame =
    df.select(key.map(col) :+ Signatures.md5Sig(dataCols.map(col)).as(SigCol): _*)

  /** hash_diff: classify every key as changed/new/deleted/unchanged.
    * Output: key columns + `kind` string.
    * internal = cached replica rows; external = live source
    * (download.py:130-141). Prefer [[classifyState]] for recurring runs.
    */
  def classify(internal: DataFrame, external: DataFrame,
               key: Seq[String], dataCols: Seq[String],
               nullSafe: Boolean = true): DataFrame =
    classifyState(sigTable(internal, key, dataCols), external, key, dataCols, nullSafe)

  /** [[classify]] against a PRECOMPUTED signature state (key, sig) — the
    * reference-faithful protocol: it diffs its persisted hash side-table
    * (`{t}_hashes_0`, download.py:89-111) against the live source, never
    * the replica's stored rows. Two properties matter at scale:
    * (a) the internal side of the join scans a 2-column table instead of
    * re-hashing the full snapshot; (b) derived columns written to the
    * snapshot (scores, normalized names — download.py:534-555) cannot
    * feed back into change detection, so a derivation that rewrites a
    * data column does not re-classify every row 'changed' forever.
    */
  def classifyState(state: DataFrame, external: DataFrame,
                    key: Seq[String], dataCols: Seq[String],
                    nullSafe: Boolean = true): DataFrame = {
    val i = state.select(key.map(k => requireKey(col(k), k, nullSafe).as(s"__ki_$k"))
      :+ col(SigCol).as("sig_i"): _*)
    val e = external.select(key.map(k => requireKey(col(k), k, nullSafe).as(s"__ke_$k"))
      :+ Signatures.md5Sig(dataCols.map(col)).as("sig_e"): _*)
    val cond = key.map(k =>
      if (nullSafe) col(s"__ki_$k") <=> col(s"__ke_$k")
      else col(s"__ki_$k") === col(s"__ke_$k")).reduce(_ && _)
    i.join(e, cond, "full_outer")
      .withColumn(KindCol,
        when(col("sig_i").isNull, "new")                 // download.py:276-315
          .when(col("sig_e").isNull, "deleted")          // download.py:326-336
          .when(col("sig_i") =!= col("sig_e"), "changed")// download.py:195-206
          .otherwise("unchanged"))                       // download.py:193-195
      .select(key.map(k =>
        coalesce(col(s"__ki_$k"), col(s"__ke_$k")).as(k)) :+ col(KindCol): _*)
  }

  /** semi_join_changed: fetch full rows only for the given key set
    * (reference: batched `WHERE pk IN (...)`, download.py:435-476).
    * `keys` is typically small (the delta) → AQE broadcast.
    */
  def semiJoinChanged(source: DataFrame, keys: DataFrame, key: Seq[String],
                      nullSafe: Boolean = true): DataFrame =
    source.join(rightKeys(keys, key, nullSafe).distinct(), nsCond(key, nullSafe), "left_semi")

  /** anti_join_deleted: rows present in `snapshot` but absent from
    * `source` (reference collects internal-only residue then issues
    * batched DELETEs, download.py:326-366).
    */
  def antiJoinDeleted(snapshot: DataFrame, source: DataFrame, key: Seq[String],
                      nullSafe: Boolean = true): DataFrame =
    snapshot.join(rightKeys(source, key, nullSafe), nsCond(key, nullSafe), "left_anti")

  /** upsert_replace: REPLACE INTO semantics — new rows supersede old by
    * key, unmatched old rows survive (reference: download.py:572-577,
    * 597-604). anti-join + union keeps this a pure column-pruned plan.
    */
  def upsertReplace(old: DataFrame, replacements: DataFrame, key: Seq[String],
                    nullSafe: Boolean = true): DataFrame =
    old.join(rightKeys(replacements, key, nullSafe), nsCond(key, nullSafe), "left_anti")
      .unionByName(replacements)

  /** diff_apply: the end-to-end CDC contract —
    * `apply(diff(internal, external), internal) == external`
    * (composition the reference's `extract` performs, download.py:22-87).
    * Pure function; commit ordering lives in [[Pipeline]].
    */
  def diffApply(internal: DataFrame, external: DataFrame,
                key: Seq[String], dataCols: Seq[String],
                nullSafe: Boolean = true): DataFrame =
    applyClassified(internal, external,
      classify(internal, external, key, dataCols, nullSafe), key, nullSafe)

  /** The apply half of [[diffApply]] with a PRECOMPUTED classification —
    * the compute-once-consume-many shape a real replicator runs (classify
    * once, then fetch/changelog/upsert/delete all read the same kinds
    * table). Callers that already hold a valid classification — the warm
    * pipeline's memoized kinds, or a schema-evolution apply whose diff
    * deliberately runs on the ORIGINAL columns so the existing kinds stay
    * valid — skip re-deriving both (key, sig) projections; `kinds` is
    * consumed twice below (fetch keys + delete keys), so a persisted
    * input avoids recomputing the classify join entirely.
    */
  def applyClassified(internal: DataFrame, external: DataFrame,
                      kinds: DataFrame, key: Seq[String],
                      nullSafe: Boolean = true): DataFrame = {
    val touched = kinds.filter(col(KindCol).isin("changed", "new"))
    val fetched = semiJoinChanged(external, touched, key, nullSafe)
    val deleted = kinds.filter(col(KindCol) === "deleted")
    val kept    = internal.join(rightKeys(deleted, key, nullSafe), nsCond(key, nullSafe), "left_anti")
    upsertReplace(kept, fetched, key, nullSafe)
  }
}
