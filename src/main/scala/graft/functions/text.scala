package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions.{coalesce, concat, lit, raise_error, when}
import org.apache.spark.sql.graft.{Bridge, CappedDistinctLongs, CharGramMinHashMd5, CharGramMinHashXx, DsirFeatureBuckets, GramFingerprintCounts, LangStopHits, Md5WinnowedFingerprints, MinHashSig, NgramShingles, NgramStats, SimHash64, TextProfile, WinnowedFingerprints}

/** Column-API wrappers over the codegen'd text-sketch expressions
  * (see org.apache.spark.sql.graft.TextExpressions).
  */
object text {
  /** k-permutation MinHash signature (array of lowercase md5 hex minima)
    * of the word `n`-gram shingle set; null when the text has fewer than
    * `n` words. Map-side, zero shuffle — see [[MinHashSig]].
    */
  def minhash_sig(textCol: Column, n: Int, k: Int): Column =
    Bridge.column(MinHashSig(Bridge.expression(textCol), n, k))

  /** DSIR hashed-n-gram feature buckets (unigrams ∪ bigrams, 12-bit md5
    * cells) — one long per feature. Map-side, zero shuffle; identical
    * multiset to the relational explode+md5+conv form. See
    * [[DsirFeatureBuckets]].
    */
  def dsir_feature_buckets(textCol: Column): Column =
    Bridge.column(DsirFeatureBuckets(Bridge.expression(textCol)))

  /** 64-bit SimHash of the whitespace token multiset; bit-compatible with
    * the xxhash64-based SQL derivation. Map-side, zero shuffle.
    */
  def simhash64(textCol: Column): Column =
    Bridge.column(SimHash64(Bridge.expression(textCol)))

  /** Word `n`-gram shingle stats `struct(n_ngrams, n_distinct)` in one
    * map-side pass — the single-evaluation kernel behind the repetition
    * filter. Map-side, zero shuffle — see [[NgramStats]].
    */
  def ngram_stats(textCol: Column, n: Int): Column =
    Bridge.column(NgramStats(Bridge.expression(textCol), n))

  /** Text-quality profile struct `(n_tokens_ws, n_chars, n_non_space,
    * n_punct, n_stop)` in one map-side pass — see [[TextProfile]].
    */
  def text_profile(textCol: Column, stopwords: Seq[String]): Column =
    Bridge.column(TextProfile(Bridge.expression(textCol), stopwords))

  /** Word `n`-gram shingle array in one map-side pass (empty array under
    * `n` words) — native replacement for the interpreted shingle HOF.
    */
  def ngram_shingles(textCol: Column, n: Int): Column =
    Bridge.column(NgramShingles(Bridge.expression(textCol), n))

  /** Per-language stopword hit counts (array in `langStopwords` order) in
    * one map-side pass — see [[LangStopHits]].
    */
  def lang_stop_hits(textCol: Column, langStopwords: Seq[Seq[String]]): Column =
    Bridge.column(LangStopHits(Bridge.expression(textCol), langStopwords))

  /** Distinct robust-winnowed xxhash64 fingerprints of every L-byte
    * window, w-window minima, in one map-side pass — see
    * [[WinnowedFingerprints]].
    */
  def winnowed_fingerprints(textCol: Column, l: Int, w: Int): Column =
    Bridge.column(WinnowedFingerprints(Bridge.expression(textCol), l, w))

  /** Distinct robust-winnowed md5 HEX fingerprints of every L-byte
    * window (the DuckDB-replayable encoding) in one map-side pass — see
    * [[Md5WinnowedFingerprints]].
    */
  def md5_winnowed_fingerprints(textCol: Column, l: Int, w: Int): Column =
    Bridge.column(Md5WinnowedFingerprints(Bridge.expression(textCol), l, w))

  /** Distinct L-byte-gram xxhash64 fingerprints with per-doc position
    * counts, `array<struct<h, cnt>>`, in one map-side pass — see
    * [[GramFingerprintCounts]].
    */
  def gram_fingerprint_counts(textCol: Column, l: Int): Column =
    Bridge.column(GramFingerprintCounts(Bridge.expression(textCol), l))

  /** Char-`gramLen`-gram salted-md5 minima (array of k lowercase hex
    * strings) of one row's string — the fuzzy-join blocking signature,
    * map-side (the relational `min(md5(...))` form sort-aggregated the
    * full gram volume). Null input → null. See [[CharGramMinHashMd5]]
    * for the exact gram semantics and the per-row (unique-id) contract.
    */
  def chargram_minhash_md5(strCol: Column, gramLen: Int, k: Int): Column =
    Bridge.column(CharGramMinHashMd5(Bridge.expression(strCol), gramLen, k))

  /** Char-`gramLen`-gram salted-xxhash64 minima (array of k longs) —
    * the production fuzzy-join blocking signature, map-side. See
    * [[CharGramMinHashXx]].
    */
  def chargram_minhash_xx(strCol: Column, gramLen: Int, k: Int): Column =
    Bridge.column(CharGramMinHashXx(Bridge.expression(strCol), gramLen, k))

  /** Aggregate: distinct longs per group as a SORTED array, or NULL once
    * the group exceeds `cap` distinct values — per-key aggregation state
    * is bounded by `cap` no matter how hot the key is. See
    * [[CappedDistinctLongs]].
    *
    * Ids are widened to long. A value the cast cannot represent (e.g. a
    * non-numeric string) RAISES instead of silently vanishing: an
    * earlier cut cast-to-null and the aggregate skipped nulls, so a
    * caller with string ids silently got an empty result. NULL inputs
    * still skip (aggregate convention).
    *
    * The one-pass hash aggregate is deliberately preferred over a
    * count-window pre-filter + plain collect_list for the posting-pair
    * path: the window form measured ~15% faster when it worked but its
    * fused sort+window+aggregate stage OOM'd nondeterministically at
    * bench scale — see [[graft.ext.SubstringDedup.postingPairs]] for
    * the full measurement history.
    */
  def capped_distinct_longs(v: Column, cap: Int): Column = {
    val widened = when(v.isNull, lit(null).cast("long"))
      .otherwise(coalesce(v.cast("long"),
        raise_error(concat(
          lit("capped_distinct_longs: id not representable as long: "),
          v.cast("string"))).cast("long")))
    Bridge.column(CappedDistinctLongs(Bridge.expression(widened), cap)
      .toAggregateExpression())
  }
}
