package graft.ext

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis operators for training-data pipelines (extension beyond
  * reference parity, SURVEY.md §7.5): language ID, quality scoring, token
  * counting, document fingerprinting. All pure `Column` expressions —
  * map-side, codegen'd, no shuffles, no UDFs — so they stream over a
  * 100 TB corpus at scan speed.
  */
object TextStats {
  /** Whitespace token count. */
  def tokensWs(text: Column): Column = size(split(trim(text), "\\s+"))

  /** BPE-ish token count: alpha runs, single digits, single punctuation —
    * a crude proxy for subword tokenizers' behavior on ASCII text.
    */
  val BpeishPattern = "[A-Za-z]+|[0-9]|[^A-Za-z0-9\\s]"
  def tokensBpeish(text: Column): Column = regexp_count(text, lit(BpeishPattern))

  /** Stopword hit count over whitespace tokens (n-gram-heuristic building
    * block for language ID).
    */
  def stopwordHits(text: Column, stopwords: Seq[String]): Column =
    size(filter(split(text, " "), w => w.isin(stopwords.map(x => x: Any): _*)))

  /** Per-language stopword lists for the language-ID heuristic. */
  val LangStopwords: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "a", "of", "and", "to", "in", "is", "it"),
    "es" -> Seq("el", "la", "de", "los", "las", "que", "y", "un"),
    "de" -> Seq("der", "die", "das", "und", "ist", "ein", "nicht", "mit"),
    "fr" -> Seq("le", "la", "les", "et", "est", "une", "dans", "pour")
  )

  /** Language ID: argmax of per-language stopword hits, ties broken by
    * list order (en > es > de > fr), 'und' when nothing hits. The CASE
    * shape is mirrored verbatim in the DuckDB oracle.
    */
  def langId(text: Column): Column = {
    // per-language hit counts from ONE native pass (the relational form
    // ran 4 interpreted filter-HOFs, each re-splitting the text); the
    // argmax CASE shape — mirrored in the DuckDB oracle — is unchanged
    val hits = graft.functions.text.lang_stop_hits(text, LangStopwords.map(_._2))
    val scores = LangStopwords.zipWithIndex.map { case ((l, _), i) =>
      l -> element_at(hits, i + 1)
    }
    val anyHit = scores.map(_._2).reduce(_ + _) > 0
    val argmax = scores.zipWithIndex.foldRight(lit("und")) {
      case (((lang, s), idx), elseCol) =>
        val beatsRest = scores.drop(idx + 1).map { case (_, s2) => s >= s2 }
          .foldLeft(lit(true))(_ && _)
        when(beatsRest, lit(lang)).otherwise(elseCol)
    }
    when(anyHit, argmax).otherwise(lit("und"))
  }

  /** Quality score in [0, 1]: rewards reasonable length and token shape,
    * penalizes punctuation-heavy and stopword-free text. Components:
    *  - len_score: min(1, tokens / 50)
    *  - avg token length in [3, 8] → 1, else decays
    *  - stopword ratio in [2%, 60%] → 1 else 0.5
    *  - punct ratio <= 20% → 1 else (1 - ratio)
    */
  def qualityScore(text: Column): Column =
    qualityFromProfile(graft.functions.text.text_profile(
      text, LangStopwords.flatMap(_._2)))

  /** Quality score from a pre-projected [[graft.functions.text.text_profile]]
    * struct — all inputs come from the single-pass native kernel (one
    * char walk + hash-set stopword lookups) instead of ~6 regex/split/
    * HOF passes per row; callers that need other profile fields project
    * the struct ONCE and derive everything from it. The score formula is
    * unchanged, so the DuckDB oracle is too.
    */
  def qualityFromProfile(st: Column): Column = {
    val toks = st.getField("n_tokens_ws").cast("double")
    val chars = st.getField("n_chars").cast("double")
    val punct = st.getField("n_punct").cast("double") / chars
    val avgTok = st.getField("n_non_space").cast("double") / toks
    val stopRatio = st.getField("n_stop").cast("double") / toks
    val lenScore = least(lit(1.0), toks / 50.0)
    val tokScore = when(avgTok.between(3.0, 8.0), 1.0).otherwise(0.6)
    val stopScore = when(stopRatio.between(0.02, 0.6), 1.0).otherwise(0.5)
    val punctScore = when(punct <= 0.2, 1.0).otherwise(lit(1.0) - punct)
    round(lenScore * tokScore * stopScore * punctScore, 6)
  }

  /** Content fingerprint: md5 of the sorted distinct word set — invariant
    * to word order and repetition (bag-of-words near-dup key).
    */
  def fingerprint(text: Column): Column =
    md5(array_join(array_sort(array_distinct(split(text, " "))), " ").cast("binary"))

  /** Rolling polynomial hash (Karp-Rabin style) over characters — the
    * "rolling hash" fingerprint variant; engine-internal (no oracle).
    */
  def rollingHash(text: Column): Column =
    aggregate(split(text, ""), lit(0L),
      (acc, c) => pmod(acc * 31 + coalesce(ascii(c), lit(0)), lit(1000000007L)))

  /** Within-document repetition ratio (Gopher-style repetition filter):
    * the fraction of word `n`-gram occurrences that repeat an earlier
    * occurrence — `1 - distinct/total`; 0 for docs under `n` words.
    * High values flag boilerplate / keyword-stuffed documents that a
    * pretraining pipeline drops. Pure map-side expression.
    */
  def repetitionRatio(text: Column, n: Int = 3): Column =
    repetitionFromStats(graft.functions.text.ngram_stats(text, n))

  /** Repetition ratio from a pre-projected [[graft.functions.text.ngram_stats]]
    * struct — lets callers compute the stats ONCE and derive the ratio
    * plus the raw counts from it (codegen CSE also dedupes repeated
    * kernels, but a single projection keeps the plan honest).
    */
  def repetitionFromStats(stats: Column): Column = {
    val total = stats.getField("n_ngrams")
    val distinct = stats.getField("n_distinct")
    when(total > 0,
      round(lit(1.0) - distinct.cast("double") / total.cast("double"), 6))
      .otherwise(lit(0.0))
  }

  /** C4-style text scrub: mask emails then URLs, collapse whitespace
    * runs, trim. Patterns stay in the Java∩RE2 common subset so the
    * DuckDB oracle replays them verbatim (with its 'g' flag).
    */
  val EmailPattern = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val UrlPattern = "https?://[^\\s]+"
  def cleanText(text: Column): Column =
    trim(regexp_replace(regexp_replace(regexp_replace(text,
      EmailPattern, "<EMAIL>"), UrlPattern, "<URL>"), "\\s+", " "))

  /** PII scrub beyond the C4 email/URL pass: US-shaped SSNs (3-2-4),
    * dashed phone numbers (3-3-4), dotted-quad IPv4. Patterns stay in the
    * Java∩RE2 common subset (`\b`, character classes, bounded repeats —
    * no lookaround) so the DuckDB oracle replays them verbatim. Scrub
    * order matters: SSN before phone (both are dashed digit runs; the
    * digit-group shapes are disjoint, but masking the more specific
    * pattern first keeps the composition order-insensitive if either
    * pattern is ever widened).
    */
  val SsnPattern = "\\b[0-9]{3}-[0-9]{2}-[0-9]{4}\\b"
  val PhonePattern = "\\b[0-9]{3}-[0-9]{3}-[0-9]{4}\\b"
  val Ipv4Pattern = "\\b[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\b"
  def scrubPii(text: Column): Column =
    regexp_replace(regexp_replace(regexp_replace(text,
      SsnPattern, "<SSN>"), PhonePattern, "<PHONE>"), Ipv4Pattern, "<IP>")

  /** Per-kind PII hit counts (the audit side of the scrub: a corpus
    * pipeline reports how much it redacted). Map-side `regexp_count`.
    */
  def piiCounts(text: Column): (Column, Column, Column) =
    (regexp_count(text, lit(SsnPattern)),
     regexp_count(text, lit(PhonePattern)),
     regexp_count(text, lit(Ipv4Pattern)))
}
