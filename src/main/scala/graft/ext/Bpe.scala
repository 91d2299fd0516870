package graft.ext

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.functions._

/** Byte-pair-encoding tokenizer training AND application (extension
  * beyond reference parity, SURVEY.md §7.5): the standard public recipe
  * (Sennrich et al. 2016) — count adjacent symbol pairs over the
  * vocabulary weighted by word frequency, merge the most frequent pair,
  * repeat — plus [[applyMerges]], the corpus-side encode with a shipped
  * merge list (what actually touches every byte at 100 TB; see also
  * [[TextStats.tokensBpeish]] for the regex token COUNT heuristic).
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
    // initial symbolization: one space between every adjacent char pair.
    // (?s) so '.' crosses '\n' — without it a word containing a newline
    // is not split around it, while the DuckDB oracle's string_split
    // splits every character (encodeTokens already carries the flag for
    // the same reason)
    var sym = words.select(col("word"), col("freq"),
        regexp_replace(col("word"), "(?s)(?<=.)(?=.)", " ").as("sym"))
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

  // ---------------------------------------------------------------------
  // Tokenizer APPLICATION — the op a pipeline actually runs at 100 TB.
  // Training happens once on a sample; encoding happens on every byte of
  // the corpus, with a SHIPPED merge list (you tokenize with a released
  // tokenizer, you don't retrain it per run) — so `merges` here is a
  // fixed artifact, which is also what makes the DuckDB oracle possible:
  // both engines replay the same constant list.
  // ---------------------------------------------------------------------

  /** Sentinel wrapping each symbol: adjacent symbols a,b appear as
    * `␁a␁␁b␁`, so the merge (a,b)→ab is the LITERAL string replace
    * `␁a␁␁b␁` → `␁ab␁` — every symbol's delimiters are its own, so
    * leftmost non-overlapping replace (the semantics of both Spark's
    * `replace` and DuckDB's) IS the greedy BPE pass: "a a a" + (a,a)
    * merges to "aa a", never "a aa", and consecutive occurrences
    * "a b a b" both merge in one pass. Exhaustively applying each merge
    * in rank order is the textbook Sennrich encode.
    */
  private val Sep = "\u0001"

  /** Space marker (the sentencepiece-style visible word boundary): a
    * symbol no merge pair contains, so merges can never cross a word
    * boundary and no pre-splitting into words is needed — the whole doc
    * is one symbol string.
    */
  private val SpaceMark = "\u0002"

  /** Encode `textCol` with a fixed ranked merge list, entirely in
    * codegen'd string expressions (wrap chars in sentinels, fold the
    * merge cascade as nested literal `replace`, unwrap) — one map-side
    * pass per merge, no shuffle, no custom kernel, no UDF. Returns the
    * token string (tokens space-joined; the word-boundary marker is a
    * token like any other, as in sentencepiece).
    */
  def encodeTokens(textCol: Column, merges: Seq[(String, String)]): Column = {
    // (?s): wrap EVERY char (newlines included) so the result is always
    // exactly ␁c₁␁␁c₂␁…␁cₙ␁ and the outer trim below is positional —
    // no end-anchor regex, whose before-final-newline semantics differ
    // between Java and RE2
    val wrapped = regexp_replace(translate(textCol, " ", SpaceMark),
      "(?s)(.)", s"$Sep$$1$Sep")
    val merged = merges.foldLeft(wrapped) { case (s, (a, b)) =>
      replace(s, lit(s"$Sep$a$Sep$Sep$b$Sep"), lit(s"$Sep${a + b}$Sep"))
    }
    // inter-token `␁␁` → space, then strip the outer sentinels
    val joined = replace(merged, lit(Sep + Sep), lit(" "))
    substr(joined, lit(2), greatest(length(joined) - 2, lit(0)))
  }

  /** Tokenize the corpus with a fixed merge list: (id, n_tokens,
    * tokens_md5) — the count feeds packing/budgeting, the md5 makes the
    * FULL token sequence cross-engine checkable without shipping it.
    */
  def applyMerges(docs: DataFrame, idCol: String, textCol: String,
                  merges: Seq[(String, String)]): DataFrame =
    docs.select(col(idCol), encodeTokens(col(textCol), merges).as("__toks"))
      .select(col(idCol),
        when(length(col("__toks")) === 0, lit(0L))
          .otherwise(size(split(col("__toks"), " ")).cast("long")).as("n_tokens"),
        md5(col("__toks").cast("binary")).as("tokens_md5"))

  /** The fixed merge list the declared `text_bpe_apply` query ships —
    * ranked like a released tokenizer artifact: character pairs common in
    * both the English-ish base fixture and the hex-word scaled bench
    * corpus, plus second-order merges exercising merged-symbol pairs.
    * Order matters (rank = priority) and is part of the artifact.
    */
  val FixtureMerges: Seq[(String, String)] = Seq(
    "t" -> "h", "th" -> "e", "a" -> "n", "an" -> "d", "i" -> "n",
    "e" -> "r", "o" -> "n", "r" -> "e", "a" -> "t", "e" -> "n",
    "o" -> "r", "s" -> "t", "a" -> "b", "c" -> "d", "e" -> "f",
    "ab" -> "cd", "0" -> "1", "2" -> "3", "4" -> "5", "6" -> "7",
    "8" -> "9", "01" -> "23", "abcd" -> "ef", "d" -> "e")
}
