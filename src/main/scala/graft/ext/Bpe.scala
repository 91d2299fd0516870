package graft.ext

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._

/** Byte-pair-encoding tokenizer training (extension beyond reference
  * parity, SURVEY.md §7.5): the standard public recipe (Sennrich et al.
  * 2016) — count adjacent symbol pairs over the vocabulary weighted by
  * word frequency, merge the most frequent pair, repeat. This is the op
  * a training-data pipeline runs to LEARN its tokenizer before token
  * counting / packing, so it belongs next to [[Packing]] and
  * [[TextStats.tokensBpeish]] (which APPLIES a fixed tokenization).
  *
  * Scale shape (the part that matters at 100 TB):
  *  - the corpus is scanned ONCE ([[wordCounts]]: explode + one
  *    aggregate). Everything after operates on the VOCABULARY table
  *    (distinct words × frequency), which is millions of rows when the
  *    corpus is billions of documents — merge rounds never touch the
  *    corpus again. This is also how the published trainers work: BPE
  *    state is the word-frequency dictionary, not the text.
  *  - each round is one map-side explode + one partial-agg shuffle over
  *    the vocabulary, then a narrow per-word regexp rewrite. The only
  *    driver-side value per round is the single argmax row.
  *  - the greedy merge application uses zero-width lookarounds so the
  *    regex consumes exactly the pair occurrence: leftmost-first,
  *    non-overlapping — the same greedy semantics as the reference
  *    implementations ("a a a a" + merge(a,a) → "aa aa", not "aa a a").
  */
object Bpe {

  /** One learned merge: round number, the pair, its joined form, and the
    * weighted count that made it the argmax.
    */
  final case class Merge(round: Int, lft: String, rgt: String,
                         merged: String, cnt: Long)

  /** Vocabulary with frequencies — the single corpus pass. */
  def wordCounts(docs: DataFrame, textCol: String): DataFrame =
    docs.select(explode(split(col(textCol), " ")).as("word"))
      .filter(length(col("word")) > 0)
      .groupBy("word").agg(count(lit(1)).as("freq"))

  /** Adjacent symbol pairs of the space-joined `sym` column, one row per
    * occurrence, carrying the word frequency. (i is 1-based:
    * element_at(t, i) / element_at(t, i+1) walks consecutive tokens.)
    */
  private def adjacentPairs(vocabSym: DataFrame): DataFrame = {
    val t = split(col("sym"), " ")
    vocabSym.filter(size(t) >= 2)
      .select(col("freq"), t.as("t"),
        explode(sequence(lit(1), size(t) - 1)).as("i"))
      .select(element_at(col("t"), col("i")).as("lft"),
        element_at(col("t"), col("i") + 1).as("rgt"), col("freq"))
  }

  /** Train `rounds` BPE merges over a (word, freq) vocabulary table.
    * Returns the merge table in learning order. The per-round argmax is
    * the one driver-side collect (exactly 1 row, bounded by
    * construction); ties break deterministically on (cnt desc, lft,
    * rgt) so two engines/runs learn the same merges.
    */
  def train(words: DataFrame, rounds: Int): Seq[Merge] = {
    // initial symbolization: one space between every adjacent char pair
    var sym = words.select(col("word"), col("freq"),
        regexp_replace(col("word"), "(?<=.)(?=.)", " ").as("sym"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    sym.count() // materialize before the loop mutates the var
    val merges = Seq.newBuilder[Merge]
    // exhaustion stops the loop, not just the merge: once no adjacent
    // pair remains (every word fully merged) the later rounds' vocabulary
    // aggregations would shuffle for nothing and still return fewer
    // merges than asked — a small corpus legitimately trains short
    var r = 1
    var exhausted = false
    while (r <= rounds && !exhausted) {
      val top = adjacentPairs(sym)
        .groupBy("lft", "rgt").agg(sum("freq").as("cnt"))
        .orderBy(desc("cnt"), col("lft"), col("rgt"))
        .limit(1).collect()
      if (top.isEmpty) exhausted = true
      else {
        val Row(lft: String, rgt: String, cnt: Long) = top.head
        val merged = lft + rgt
        // zero-width boundaries: the match consumes only "lft rgt", so
        // Java's left-to-right non-overlapping scan IS greedy BPE apply
        val pat = "(?<![^ ])" +
          java.util.regex.Pattern.quote(lft + " " + rgt) + "(?![^ ])"
        val next = sym.withColumn("sym",
            regexp_replace(col("sym"), pat,
              java.util.regex.Matcher.quoteReplacement(merged)))
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        next.count()
        sym.unpersist()
        sym = next
        merges += Merge(r, lft, rgt, merged, cnt)
      }
      r += 1
    }
    sym.unpersist()
    merges.result()
  }

  /** The merge table as a DataFrame, ordered by round. */
  def trainTable(docs: DataFrame, textCol: String, rounds: Int): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    train(wordCounts(docs, textCol), rounds).toDF()
      .select(col("round"), col("lft"), col("rgt"), col("merged"), col("cnt"))
  }
}
