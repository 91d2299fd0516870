package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.graft.{Bridge, MinHashSig, NgramStats, SimHash64}

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
}
