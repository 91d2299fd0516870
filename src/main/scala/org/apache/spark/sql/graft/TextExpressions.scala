package org.apache.spark.sql.graft

import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Codegen'd text-sketch kernels.
  *
  * [[MinHashSig]] computes a document's whole k-permutation MinHash
  * signature in ONE map-side pass: word n-gram shingles → per salt i the
  * lexicographic minimum of md5("i|" + shingle). Semantics are exactly
  * those of the SQL form `min(md5(concat('i|', shingle)))` over exploded
  * shingles (same hex-string ordering — lowercase hex is order-isomorphic
  * to the unsigned digest bytes), so the DuckDB oracle for
  * `dedup_minhash_lsh` reproduces it verbatim (reference for the overall
  * dedup pipeline shape: cheeseformice/updater keeps no dedup at all;
  * this is a §7.5 extension).
  *
  * Why an expression instead of the explode → groupBy(min×k) plan: the
  * relational form materializes words×1 shingle rows and shuffles k
  * partial minima per doc; this kernel touches each shingle's bytes once
  * per salt, allocates nothing per row beyond the k digests, and keeps
  * the whole dedup signature stage inside the scan's codegen stage —
  * zero shuffle at any corpus size. The md5 loop itself lives in a
  * static helper invoked from generated code (the JIT-compiled Scala
  * loop beats generated Java for digest-heavy code).
  */
case class MinHashSig(child: Expression, shingleN: Int, k: Int)
    extends UnaryExpression with ExpectsInputTypes {
  require(shingleN > 0 && k > 0)
  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullable: Boolean = true // null on < n words (no shingles)
  override def prettyName: String = "minhash_sig"

  override def nullSafeEval(input: Any): Any =
    MinHashSig.compute(input.asInstanceOf[UTF8String], shingleN, k)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cls = MinHashSig.getClass.getName.stripSuffix("$")
    nullSafeCodeGen(ctx, ev, t => {
      s"""
         |${ev.value} = (org.apache.spark.sql.catalyst.util.ArrayData)
         |  $cls.compute($t, $shingleN, $k);
         |if (${ev.value} == null) { ${ev.isNull} = true; }
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** 64-bit SimHash over whitespace tokens, one map-side pass: per word,
  * xxhash64 (Spark's own XXH64, seed 42 — bit-identical to the built-in
  * `xxhash64` function); per bit, a ±1 vote across words; output bit set
  * where the vote is positive. Replaces the explode(words) →
  * explode(64 bits) → two groupBy plan of the bulk form — a 64× row
  * blow-up and two shuffles — with zero shuffle. Same semantics as the
  * interpreted [[graft.ext.Dedup.simhash64]] HOF (DedupSpec parity).
  */
case class SimHash64(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {
  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = LongType
  override def prettyName: String = "simhash64"

  override def nullSafeEval(input: Any): Any =
    SimHash64.compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cls = SimHash64.getClass.getName.stripSuffix("$")
    nullSafeCodeGen(ctx, ev, t => s"${ev.value} = $cls.compute($t);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object SimHash64 {
  private val Seed = 42L // spark.sql.functions.xxhash64 default seed

  def compute(text: UTF8String): Long = {
    val words = text.toString.split(" ", -1)
    val votes = new Array[Int](64)
    var w = 0
    while (w < words.length) {
      val h = org.apache.spark.sql.catalyst.expressions.XXH64
        .hashUTF8String(UTF8String.fromString(words(w)), Seed)
      var b = 0
      while (b < 64) {
        if (((h >>> b) & 1L) == 1L) votes(b) += 1 else votes(b) -= 1
        b += 1
      }
      w += 1
    }
    var out = 0L
    var b = 0
    while (b < 64) {
      if (votes(b) > 0) out |= (1L << b)
      b += 1
    }
    out
  }
}

/** Word n-gram shingle statistics — `(n_ngrams, n_distinct)` — in ONE
  * map-side pass over the text. Powers the Gopher-style repetition
  * filter (`1 - n_distinct/n_ngrams`): the relational form evaluates the
  * interpreted `wordShingles` HOF (CodegenFallback, no common-
  * subexpression elimination) once per consumer — ~4× per row for the
  * repetition query — materializing the full shingle array each time.
  * This kernel builds each shingle once, counts distincts in a hash set,
  * allocates no output array, and stays inside the scan's codegen stage.
  * Shingle semantics are identical to [[graft.ext.Dedup.wordShingles]]
  * (split on single space, limit -1; fewer than `n` words → (0, 0)), so
  * the DuckDB oracle for `text_repetition` is unchanged.
  */
case class NgramStats(child: Expression, shingleN: Int)
    extends UnaryExpression with ExpectsInputTypes {
  require(shingleN > 0)
  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = StructType(Seq(
    StructField("n_ngrams", IntegerType, nullable = false),
    StructField("n_distinct", IntegerType, nullable = false)))
  override def prettyName: String = "ngram_stats"

  override def nullSafeEval(input: Any): Any =
    NgramStats.compute(input.asInstanceOf[UTF8String], shingleN)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cls = NgramStats.getClass.getName.stripSuffix("$")
    nullSafeCodeGen(ctx, ev, t =>
      s"${ev.value} = (org.apache.spark.sql.catalyst.InternalRow) $cls.compute($t, $shingleN);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object NgramStats {
  def compute(text: UTF8String, n: Int): org.apache.spark.sql.catalyst.InternalRow = {
    val words = text.toString.split(" ", -1)
    if (words.length < n)
      return new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
        Array[Any](0, 0))
    val nShingles = words.length - n + 1
    val seen = new java.util.HashSet[String](Integer.highestOneBit(nShingles) * 2)
    val sb = new java.lang.StringBuilder
    var s = 0
    while (s < nShingles) {
      sb.setLength(0)
      var o = 0
      while (o < n) {
        if (o > 0) sb.append(' ')
        sb.append(words(s + o))
        o += 1
      }
      seen.add(sb.toString)
      s += 1
    }
    new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
      Array[Any](nShingles, seen.size))
  }
}

/** Whole text-quality profile — `(n_tokens_ws, n_chars, n_non_space,
  * n_punct, n_stop, n_bpeish)` — in ONE map-side pass. The relational
  * quality score ran ~6 passes per row (trim+regex-split token count, two
  * regexp_replace scans, a split, and an interpreted `filter` HOF doing
  * a 32-way `isin` per token — the dominant cost at corpus scale); this
  * kernel walks the characters once and checks stopwords against a hash
  * set. Semantics match the SQL building blocks exactly, so the DuckDB
  * oracle for `text_quality` is unchanged:
  *  - n_tokens_ws  == size(split(trim(text), "\\s+"))   (space-trim only,
  *    Java regex split with limit -1 — including its [""] = 1 edge)
  *  - n_chars      == length(text)
  *  - n_non_space  == length(regexp_replace(text, "\\s", ""))
  *  - n_punct      == n of chars outside [A-Za-z0-9] and \s
  *  - n_stop       == size(filter(split(text, " "), w -> w in stopwords))
  *  - n_bpeish     == regexp_count(text, "[A-Za-z]+|[0-9]|[^A-Za-z0-9\\s]")
  *    (alpha RUNS + single digits + single punct code points — the
  *    alternation is anchored-free and each branch is code-point-wise,
  *    so run count + digit count + the punct count already computed)
  */
case class TextProfile(child: Expression, stopwords: Seq[String])
    extends UnaryExpression with ExpectsInputTypes {
  require(stopwords.forall(_.length <= TextProfile.MaxStopwordLen),
    s"stopwords must be <= ${TextProfile.MaxStopwordLen} chars (token probe cutoff)")
  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = StructType(Seq(
    StructField("n_tokens_ws", IntegerType, nullable = false),
    StructField("n_chars", IntegerType, nullable = false),
    StructField("n_non_space", IntegerType, nullable = false),
    StructField("n_punct", IntegerType, nullable = false),
    StructField("n_stop", IntegerType, nullable = false),
    StructField("n_bpeish", IntegerType, nullable = false)))
  override def prettyName: String = "text_profile"

  @transient private lazy val stopSet: java.util.HashSet[String] = {
    val s = new java.util.HashSet[String](stopwords.size * 2)
    stopwords.foreach(s.add)
    s
  }

  override def nullSafeEval(input: Any): Any =
    TextProfile.compute(input.asInstanceOf[UTF8String], stopSet)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cls = TextProfile.getClass.getName.stripSuffix("$")
    val setRef = ctx.addReferenceObj("stopSet", stopSet, "java.util.HashSet")
    nullSafeCodeGen(ctx, ev, t =>
      s"""${ev.value} = (org.apache.spark.sql.catalyst.InternalRow)
         |  $cls.compute($t, (java.util.HashSet) $setRef);""".stripMargin)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object TextProfile {
  /** Longest stopword any caller may register (enforced by the
    * constructors of [[TextProfile]] and [[LangStopHits]]) — bounds
    * substring allocation to candidate tokens only.
    */
  val MaxStopwordLen = 16

  private def isRegexWs(c: Char): Boolean = // Java regex \s class
    c == ' ' || c == '\t' || c == '\n' || c == '\u000B' || c == '\f' || c == '\r'

  def compute(text: UTF8String, stops: java.util.HashSet[String])
      : org.apache.spark.sql.catalyst.InternalRow = {
    val s = text.toString
    val len = s.length
    // Spark's trim() strips the space character only (not Java trim's
    // <= 0x20 range) — replicate exactly for the token-count window
    var st = 0
    var en = len
    while (st < en && s.charAt(st) == ' ') st += 1
    while (en > st && s.charAt(en - 1) == ' ') en -= 1
    // one fused walk, no regex engine: char-class counts over the whole
    // string; token count over the trimmed window with split("\s+", -1)
    // field semantics (fields = ws-runs + 1 — leading ws contributes a
    // leading "" field, empty input is the 1-element [""]); stopword
    // hits over single-space fields, allocating substrings only for
    // stopword-length tokens
    var nonSpace = 0
    var punct = 0
    var nTokens = 1
    var prevWs = false
    var nStop = 0
    var tokStart = 0
    var alphaRuns = 0
    var digits = 0
    var inAlphaRun = false
    var i = 0
    while (i <= len) {
      val c = if (i < len) s.charAt(i) else ' '
      // char-class counts are per CODE POINT (length()/regexp_replace
      // semantics): a supplementary character counts once, so skip the
      // low surrogate of a valid pair. \s and [A-Za-z0-9] are BMP-only,
      // so ws/alnum checks on the code unit are exact for the rest.
      val isLowOfPair = i < len && Character.isLowSurrogate(c) && i > 0 &&
        Character.isHighSurrogate(s.charAt(i - 1))
      if (i < len && !isRegexWs(c) && !isLowOfPair) {
        nonSpace += 1
        val alpha = (c >= 'A' && c <= 'Z') || (c >= 'a' && c <= 'z')
        val digit = c >= '0' && c <= '9'
        if (!alpha && !digit) punct += 1
        if (digit) digits += 1
        if (alpha && !inAlphaRun) alphaRuns += 1
        inAlphaRun = alpha
      } else if (!isLowOfPair) inAlphaRun = false
      if (i >= st && i < en) {
        val ws = isRegexWs(c)
        if (ws && !prevWs) nTokens += 1
        prevWs = ws
      }
      if (i == len || c == ' ') { // single-space field boundary (or end)
        if (i - tokStart <= MaxStopwordLen &&
            stops.contains(s.substring(tokStart, i))) nStop += 1
        tokStart = i + 1
      }
      i += 1
    }
    new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
      Array[Any](nTokens, text.numChars(), nonSpace, punct, nStop,
        alphaRuns + digits + punct))
  }
}

/** Per-language stopword hit counts in ONE map-side pass — the input to
  * the language-ID argmax. The relational form ran `size(filter(split(
  * text, " "), w -> w.isin(<8 words>)))` per language: 4 interpreted
  * HOF evaluations, each re-splitting the text and scanning an 8-way
  * isin per token. This kernel walks the single-space tokens once and
  * probes one hash set per language. Output: array of hit counts in
  * `langStopwords` order; semantics identical to the SQL form, so the
  * DuckDB langid oracle is unchanged.
  */
case class LangStopHits(child: Expression, langStopwords: Seq[Seq[String]])
    extends UnaryExpression with ExpectsInputTypes {
  require(langStopwords.nonEmpty)
  require(langStopwords.forall(_.forall(_.length <= TextProfile.MaxStopwordLen)),
    s"stopwords must be <= ${TextProfile.MaxStopwordLen} chars (token probe cutoff)")
  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "lang_stop_hits"

  @transient private lazy val sets: Array[java.util.HashSet[String]] =
    langStopwords.map { ws =>
      val s = new java.util.HashSet[String](ws.size * 2)
      ws.foreach(s.add)
      s
    }.toArray

  override def nullSafeEval(input: Any): Any =
    LangStopHits.compute(input.asInstanceOf[UTF8String], sets)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cls = LangStopHits.getClass.getName.stripSuffix("$")
    val setsRef = ctx.addReferenceObj("stopSets", sets, "java.util.HashSet[]")
    nullSafeCodeGen(ctx, ev, t =>
      s"""${ev.value} = (org.apache.spark.sql.catalyst.util.ArrayData)
         |  $cls.compute($t, (java.util.HashSet[]) $setsRef);""".stripMargin)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object LangStopHits {
  def compute(text: UTF8String, sets: Array[java.util.HashSet[String]]): ArrayData = {
    val s = text.toString
    val len = s.length
    val hits = new Array[Int](sets.length)
    var tokStart = 0
    var i = 0
    while (i <= len) {
      if (i == len || s.charAt(i) == ' ') {
        if (i - tokStart <= TextProfile.MaxStopwordLen) {
          val tok = s.substring(tokStart, i)
          var l = 0
          while (l < sets.length) {
            if (sets(l).contains(tok)) hits(l) += 1
            l += 1
          }
        }
        tokStart = i + 1
      }
      i += 1
    }
    new GenericArrayData(hits.map(h => h: Any))
  }
}

/** The word `n`-gram shingle ARRAY in one map-side pass — the native
  * replacement for the interpreted `wordShingles` HOF (split → sequence →
  * transform → concat_ws is CodegenFallback and re-evaluated per
  * consumer). Output matches the HOF exactly: fewer than `n` words → an
  * EMPTY array (unlike [[MinHashSig]]'s null, which mirrors the explode
  * form where such docs vanish).
  */
case class NgramShingles(child: Expression, shingleN: Int)
    extends UnaryExpression with ExpectsInputTypes {
  require(shingleN > 0)
  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "ngram_shingles"

  override def nullSafeEval(input: Any): Any =
    NgramShingles.compute(input.asInstanceOf[UTF8String], shingleN)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cls = NgramShingles.getClass.getName.stripSuffix("$")
    nullSafeCodeGen(ctx, ev, t =>
      s"""${ev.value} = (org.apache.spark.sql.catalyst.util.ArrayData)
         |  $cls.compute($t, $shingleN);""".stripMargin)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object NgramShingles {
  def compute(text: UTF8String, n: Int): ArrayData = {
    val words = text.toString.split(" ", -1)
    if (words.length < n) return new GenericArrayData(Array.empty[Any])
    val nShingles = words.length - n + 1
    val out = new Array[Any](nShingles)
    val sb = new java.lang.StringBuilder
    var s = 0
    while (s < nShingles) {
      sb.setLength(0)
      var o = 0
      while (o < n) {
        if (o > 0) sb.append(' ')
        sb.append(words(s + o))
        o += 1
      }
      out(s) = UTF8String.fromString(sb.toString)
      s += 1
    }
    new GenericArrayData(out)
  }
}

object MinHashSig {
  private val hexDigits = "0123456789abcdef".toCharArray

  private def hex(bytes: Array[Byte]): UTF8String = {
    val out = new Array[Byte](bytes.length * 2)
    var i = 0
    while (i < bytes.length) {
      out(2 * i) = hexDigits((bytes(i) >> 4) & 0xf).toByte
      out(2 * i + 1) = hexDigits(bytes(i) & 0xf).toByte
      i += 1
    }
    UTF8String.fromBytes(out)
  }

  /** Unsigned lexicographic compare of two 16-byte digests. */
  private def less(a: Array[Byte], b: Array[Byte]): Boolean = {
    var i = 0
    while (i < a.length) {
      val x = a(i) & 0xff
      val y = b(i) & 0xff
      if (x != y) return x < y
      i += 1
    }
    false
  }

  /** Returns the k-minhash signature as ArrayData of lowercase hex
    * strings, or null when the text has fewer than `n` words (no
    * shingles — matching the explode form, where such docs vanish).
    * Split semantics match Spark's `split(text, " ")` (regex, limit -1:
    * trailing empty strings kept).
    */
  def compute(text: UTF8String, n: Int, k: Int): ArrayData = {
    val words = text.toString.split(" ", -1)
    if (words.length < n) return null
    val md = java.security.MessageDigest.getInstance("MD5")
    val prefixes = Array.tabulate(k)(i => (i + "|").getBytes("UTF-8"))
    val mins = new Array[Array[Byte]](k)
    val sb = new java.lang.StringBuilder
    var s = 0
    val nShingles = words.length - n + 1
    while (s < nShingles) {
      sb.setLength(0)
      var o = 0
      while (o < n) {
        if (o > 0) sb.append(' ')
        sb.append(words(s + o))
        o += 1
      }
      val shingleBytes = sb.toString.getBytes("UTF-8")
      var i = 0
      while (i < k) {
        md.reset()
        md.update(prefixes(i))
        md.update(shingleBytes)
        val d = md.digest()
        if (mins(i) == null || less(d, mins(i))) mins(i) = d
        i += 1
      }
      s += 1
    }
    new GenericArrayData(mins.map(hex(_).asInstanceOf[Any]))
  }
}

/** Winnowed substring fingerprints in ONE map-side pass: for every byte
  * position, the xxhash64 of the L-byte window; a position's hash
  * survives iff it is the minimum of some w-consecutive-position window
  * (robust winnowing, Schleimer et al. 2003 — any shared run of
  * ≥ L+w−1 bytes keeps at least one common survivor). Returns the
  * DISTINCT survivors in scan order.
  *
  * Why an expression instead of the HOF pipeline
  * (`transform(sequence…, xxhash64(substring…))` → per-position
  * `array_min(slice(hs, i, w))`): the slice form copies a w-element
  * array per position — ~1 billion transient arrays at bench scale,
  * measured as the dominant cost of `dedup_substring_winnowed`. This
  * kernel keeps a monotonic deque over the rolling hash stream: O(n)
  * total, zero per-position allocation, and the explode downstream sees
  * only the ~2/(w+1) survivors. Rows-only path (no DuckDB oracle
  * mirrors xxhash64); SubstringDedupSpec pins the winnowing guarantee
  * against the exact variant.
  */
case class WinnowedFingerprints(child: Expression, l: Int, w: Int)
    extends UnaryExpression with ExpectsInputTypes {
  require(l > 0 && w > 0)
  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "winnowed_fingerprints"

  override def nullSafeEval(input: Any): Any =
    WinnowedFingerprints.compute(input.asInstanceOf[UTF8String], l, w)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cls = WinnowedFingerprints.getClass.getName.stripSuffix("$")
    nullSafeCodeGen(ctx, ev, t =>
      s"${ev.value} = (org.apache.spark.sql.catalyst.util.ArrayData) $cls.compute($t, $l, $w);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object WinnowedFingerprints {
  private val Seed = 42L // Spark's xxhash64 SQL default

  def compute(text: UTF8String, l: Int, w: Int): ArrayData = {
    val base = text.getBaseObject
    val off = text.getBaseOffset
    val n = text.numBytes()
    if (n < l) return new GenericArrayData(Array.emptyLongArray)
    val nGrams = n - l + 1
    // rolling hash stream: xxhash64 of each L-byte window (windows are
    // byte-indexed; the fixtures are ASCII so byte == char positions,
    // and the variant is self-consistent either way)
    val hs = new Array[Long](nGrams)
    var i = 0
    while (i < nGrams) {
      hs(i) = org.apache.spark.sql.catalyst.expressions.XXH64
        .hashUnsafeBytes(base, off + i, l, Seed)
      i += 1
    }
    val out = new java.util.LinkedHashSet[java.lang.Long]()
    if (nGrams <= w) {
      // single (short) window: emit its minimum
      var m = hs(0); i = 1
      while (i < nGrams) { if (hs(i) < m) m = hs(i); i += 1 }
      out.add(m)
    } else {
      // monotonic deque of indices, increasing hash values; `>=` pops
      // ties so the RIGHTMOST minimal position represents the window
      // (robust winnowing's tie rule)
      val dq = new Array[Int](nGrams)
      var head = 0; var tail = 0 // [head, tail) live
      i = 0
      while (i < nGrams) {
        while (tail > head && hs(dq(tail - 1)) >= hs(i)) tail -= 1
        dq(tail) = i; tail += 1
        if (dq(head) <= i - w) head += 1
        if (i >= w - 1) out.add(hs(dq(head)))
        i += 1
      }
    }
    val arr = new Array[Long](out.size)
    val it = out.iterator(); i = 0
    while (it.hasNext) { arr(i) = it.next(); i += 1 }
    new GenericArrayData(arr)
  }
}

/** Per-document L-byte-gram fingerprint COUNTS in one map-side pass:
  * `array<struct<h: bigint, cnt: int>>`, one entry per DISTINCT gram
  * xxhash64 with its position count. The first aggregation level of the
  * duplication-span metric happens inside the expression — the explode
  * downstream emits distinct-gram volume, not position volume, so the
  * gram stream crosses exactly one exchange already deduplicated (the
  * relational form shuffled every position once to count per-(doc,gram)
  * and the distinct volume a second time).
  */
case class GramFingerprintCounts(child: Expression, l: Int)
    extends UnaryExpression with ExpectsInputTypes {
  require(l > 0)
  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("h", LongType, nullable = false),
    StructField("cnt", IntegerType, nullable = false))), containsNull = false)
  override def prettyName: String = "gram_fingerprint_counts"

  override def nullSafeEval(input: Any): Any =
    GramFingerprintCounts.compute(input.asInstanceOf[UTF8String], l)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cls = GramFingerprintCounts.getClass.getName.stripSuffix("$")
    nullSafeCodeGen(ctx, ev, t =>
      s"${ev.value} = (org.apache.spark.sql.catalyst.util.ArrayData) $cls.compute($t, $l);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object GramFingerprintCounts {
  private val Seed = 42L

  def compute(text: UTF8String, l: Int): ArrayData = {
    val base = text.getBaseObject
    val off = text.getBaseOffset
    val n = text.numBytes()
    if (n < l) return new GenericArrayData(Array.empty[Any])
    val nGrams = n - l + 1
    val counts = new java.util.LinkedHashMap[java.lang.Long, Array[Int]]()
    var i = 0
    while (i < nGrams) {
      val h = org.apache.spark.sql.catalyst.expressions.XXH64
        .hashUnsafeBytes(base, off + i, l, Seed)
      val c = counts.get(h)
      if (c == null) counts.put(h, Array(1)) else c(0) += 1
      i += 1
    }
    val out = new Array[Any](counts.size)
    val it = counts.entrySet().iterator(); i = 0
    while (it.hasNext) {
      val e = it.next()
      out(i) = new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
        Array[Any](e.getKey.longValue(), e.getValue()(0)))
      i += 1
    }
    new GenericArrayData(out)
  }
}

/** The md5 form of [[WinnowedFingerprints]] — DISTINCT robust-winnowed
  * md5 hex fingerprints of every L-byte window, w-window minima, in one
  * map-side pass. Exists for the DuckDB-replayable oracle paths
  * (`dedup_substring_winnowed_md5`, the md5-mode streaming substring
  * gate): both engines hash the same gram bytes, and lowercase-hex
  * string ordering is order-isomorphic to the unsigned digest bytes, so
  * the window-min SELECTION — not just the hashes — matches the SQL
  * `min(h) OVER (ROWS BETWEEN CURRENT ROW AND w-1 FOLLOWING)` replay
  * exactly. Replaces the HOF formulation (gram array → per-position
  * slice-min), which allocated a w-element slice per position and
  * measured ~3× the xxhash kernel's wall at the 500k-doc bench corpus.
  */
case class Md5WinnowedFingerprints(child: Expression, l: Int, w: Int)
    extends UnaryExpression with ExpectsInputTypes {
  require(l > 0 && w > 0)
  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "md5_winnowed_fingerprints"

  override def nullSafeEval(input: Any): Any =
    Md5WinnowedFingerprints.compute(input.asInstanceOf[UTF8String], l, w)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cls = Md5WinnowedFingerprints.getClass.getName.stripSuffix("$")
    nullSafeCodeGen(ctx, ev, t =>
      s"${ev.value} = (org.apache.spark.sql.catalyst.util.ArrayData) $cls.compute($t, $l, $w);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object Md5WinnowedFingerprints {
  private val Hex = "0123456789abcdef".toCharArray

  def compute(text: UTF8String, l: Int, w: Int): ArrayData = {
    val bytes = text.getBytes
    val n = bytes.length
    if (n < l) return new GenericArrayData(Array.empty[Any])
    val nGrams = n - l + 1
    // digest RING of w+1 slots (16 B each), position i in slot i%(w+1):
    // the deque only ever compares/emits positions in the live w-window,
    // and after the previous iteration's eviction every live index is
    // > i-w-1, so slot reuse never clobbers a comparable digest. The r8
    // cut allocated all 16·nGrams digest bytes contiguously — ~1.6 GB in
    // ONE task for a pathological 100 MB document, and this kernel is on
    // the md5-mode ingest-gate path, not just oracle-scale fixtures.
    val ring = math.min(nGrams, w + 1)
    val md = java.security.MessageDigest.getInstance("MD5")
    val digs = new Array[Byte](ring * 16)
    def digestInto(i: Int): Unit = {
      md.reset()
      md.update(bytes, i, l)
      md.digest(digs, (i % ring) * 16, 16)
    }
    // unsigned lexicographic digest order — identical to lowercase-hex
    // string order (hex encoding preserves byte order nibble by nibble)
    def less(a: Int, b: Int): Boolean = {
      var k = 0
      while (k < 16) {
        val x = digs((a % ring) * 16 + k) & 0xff
        val y = digs((b % ring) * 16 + k) & 0xff
        if (x != y) return x < y
        k += 1
      }
      false
    }
    def hex(idx: Int): UTF8String = {
      val cs = new Array[Byte](32)
      var k = 0
      while (k < 16) {
        val b = digs((idx % ring) * 16 + k) & 0xff
        cs(2 * k) = Hex(b >>> 4).toByte
        cs(2 * k + 1) = Hex(b & 0xf).toByte
        k += 1
      }
      UTF8String.fromBytes(cs)
    }
    val out = new java.util.LinkedHashSet[UTF8String]()
    var i = 0
    if (nGrams <= w) {
      // single (short) window: its minimum (ring ≥ nGrams — all live)
      digestInto(0)
      var m = 0; i = 1
      while (i < nGrams) { digestInto(i); if (less(i, m)) m = i; i += 1 }
      out.add(hex(m))
    } else {
      // monotonic deque of indices; pop `>=` so the RIGHTMOST minimal
      // position represents the window — value-set semantics make the
      // tie rule invisible to the output, but it keeps the loop aligned
      // with the xxhash kernel
      // deque capacity w+1 suffices: entries are strictly increasing
      // indices within the live window [i-w+1, i] plus the incoming i
      val dq = new Array[Int](w + 1)
      // head/tail are absolute counters; slots are taken mod w+1 (the
      // live entries are strictly increasing indices within [i-w, i],
      // at most w+1 of them, so the circular buffer never overwrites a
      // live entry)
      val cap = w + 1
      var head = 0; var tail = 0
      var lastEmitted = -1 // same index ⇒ same value: skip the rebuild
      i = 0
      while (i < nGrams) {
        digestInto(i)
        while (tail > head && !less(dq((tail - 1) % cap), i)) tail -= 1
        dq(tail % cap) = i; tail += 1
        if (dq(head % cap) <= i - w) head += 1
        if (i >= w - 1 && dq(head % cap) != lastEmitted) {
          out.add(hex(dq(head % cap)))
          lastEmitted = dq(head % cap)
        }
        i += 1
      }
    }
    val arr = new Array[Any](out.size)
    val it = out.iterator(); i = 0
    while (it.hasNext) { arr(i) = it.next(); i += 1 }
    new GenericArrayData(arr)
  }
}

/** Per-row char-gram salted-md5 minima — the map-side kernel behind
  * [[graft.ext.FuzzyJoin.md5Buckets]]: the k lexicographic minima of
  * md5("i|" + gram) over the row's character `gramLen`-grams, where the
  * gram set is exactly `transform(sequence(1, greatest(length(s) -
  * (gramLen-1), 1)), i -> substring(s, i, gramLen))` — CHAR-based
  * substring (multibyte-correct), and a string shorter than `gramLen`
  * contributes its whole self as the single gram. Output ordering:
  * lowercase hex is order-isomorphic to the unsigned digest bytes, so
  * the minima equal SQL `min(md5(concat('i|', gram)))` per row
  * (FuzzyJoinSpec pins the equivalence).
  *
  * Why an expression instead of explode → groupBy(min×k): `min(string)`
  * is not hash-aggregable, so the relational form ran a SORT-aggregate
  * over the full gram volume with an exchange per side (r14 before-plan:
  * SortAggregate + Exchange under every bucketer) — this kernel keeps
  * the whole blocking signature inside the scan's codegen stage, zero
  * shuffle. Per-ROW semantics: callers must hold ids unique per row
  * (entity tables do), since the groupBy form would merge grams of
  * duplicate ids where this computes one signature per row.
  */
case class CharGramMinHashMd5(child: Expression, gramLen: Int, k: Int)
    extends UnaryExpression with ExpectsInputTypes {
  require(gramLen > 0 && k > 0)
  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "chargram_minhash_md5"

  override def nullSafeEval(input: Any): Any =
    CharGramMinHashMd5.compute(input.asInstanceOf[UTF8String], gramLen, k)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cls = CharGramMinHashMd5.getClass.getName.stripSuffix("$")
    nullSafeCodeGen(ctx, ev, t =>
      s"""${ev.value} = (org.apache.spark.sql.catalyst.util.ArrayData)
         |  $cls.compute($t, $gramLen, $k);""".stripMargin)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object CharGramMinHashMd5 {
  private val hexDigits = "0123456789abcdef".toCharArray

  private def hex(bytes: Array[Byte]): UTF8String = {
    val out = new Array[Byte](bytes.length * 2)
    var i = 0
    while (i < bytes.length) {
      out(2 * i) = hexDigits((bytes(i) >> 4) & 0xf).toByte
      out(2 * i + 1) = hexDigits(bytes(i) & 0xf).toByte
      i += 1
    }
    UTF8String.fromBytes(out)
  }

  private def less(a: Array[Byte], b: Array[Byte]): Boolean = {
    var i = 0
    while (i < a.length) {
      val x = a(i) & 0xff
      val y = b(i) & 0xff
      if (x != y) return x < y
      i += 1
    }
    false
  }

  def compute(text: UTF8String, gramLen: Int, k: Int): ArrayData = {
    val nChars = text.numChars()
    val nGrams = math.max(nChars - (gramLen - 1), 1)
    val md = java.security.MessageDigest.getInstance("MD5")
    val prefixes = Array.tabulate(k)(i => (i + "|").getBytes("UTF-8"))
    val mins = new Array[Array[Byte]](k)
    var pos = 0
    while (pos < nGrams) {
      // SQL substring semantics (1-based, char-counted, clipped at end)
      val gram = text.substringSQL(pos + 1, gramLen).getBytes
      var s = 0
      while (s < k) {
        md.reset()
        md.update(prefixes(s))
        md.update(gram)
        val d = md.digest()
        if (mins(s) == null || less(d, mins(s))) mins(s) = d
        s += 1
      }
      pos += 1
    }
    val out = new Array[Any](k)
    var s = 0
    while (s < k) { out(s) = hex(mins(s)); s += 1 }
    new GenericArrayData(out)
  }
}

/** Per-row char-gram salted-xxhash64 minima — the production twin of
  * [[CharGramMinHashMd5]] behind [[graft.ext.FuzzyJoin.xxBuckets]]: the
  * k signed minima of `xxhash64(i, gram)` (Spark's accumulating XXH64:
  * the int salt hashes with seed 42, the gram's UTF-8 bytes hash with
  * that as seed — bit-identical to the built-in) over the same char-gram
  * set. Same per-row contract and shuffle-elimination rationale.
  *
  * NULL-input scope (ADVICE r14): this expression is null-safe (null
  * string → null array), which DIVERGES from the relational
  * `min(xxhash64(k, gram))` form on null input — the built-in xxhash64
  * never returns null (a null child just skips), so the relational form
  * gave every null-string row the SAME constant minima (one degenerate
  * shared bucket) where this kernel yields null. The "kernel ≡
  * relational" equivalence (FuzzyJoinSpec) is therefore scoped to
  * non-null input; xxBuckets drops null rows up front, so both
  * fuzzy-join paths see only the agreeing domain.
  */
case class CharGramMinHashXx(child: Expression, gramLen: Int, k: Int)
    extends UnaryExpression with ExpectsInputTypes {
  require(gramLen > 0 && k > 0)
  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "chargram_minhash_xx"

  override def nullSafeEval(input: Any): Any =
    CharGramMinHashXx.compute(input.asInstanceOf[UTF8String], gramLen, k)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cls = CharGramMinHashXx.getClass.getName.stripSuffix("$")
    nullSafeCodeGen(ctx, ev, t =>
      s"""${ev.value} = (org.apache.spark.sql.catalyst.util.ArrayData)
         |  $cls.compute($t, $gramLen, $k);""".stripMargin)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object CharGramMinHashXx {
  private val Seed = 42L // spark.sql.functions.xxhash64 default seed

  def compute(text: UTF8String, gramLen: Int, k: Int): ArrayData = {
    val nChars = text.numChars()
    val nGrams = math.max(nChars - (gramLen - 1), 1)
    val mins = new Array[Long](k)
    java.util.Arrays.fill(mins, Long.MaxValue)
    val saltSeeds = Array.tabulate(k)(i =>
      org.apache.spark.sql.catalyst.expressions.XXH64.hashInt(i, Seed))
    var pos = 0
    while (pos < nGrams) {
      val gram = text.substringSQL(pos + 1, gramLen)
      var s = 0
      while (s < k) {
        val h = org.apache.spark.sql.catalyst.expressions.XXH64
          .hashUTF8String(gram, saltSeeds(s))
        if (h < mins(s)) mins(s) = h
        s += 1
      }
      pos += 1
    }
    new GenericArrayData(mins)
  }
}

/** Per-row DSIR hashed-n-gram feature buckets — the map-side kernel
  * behind [[graft.ext.Dsir.featureBuckets]]: one bucket per feature of
  * the unigram ∪ bigram stream, where bucket = the first 3 hex digits
  * of md5("b:" + feature) as an integer (the count-min cell rule the
  * DuckDB oracle replays). Output is one long per feature, unigrams
  * first then bigrams — exactly the multiset the relational
  * `explode(concat(ws, bigrams))` + conv(substring(md5(...),1,3),16,10)
  * form produced (DsirSpec pins the equivalence), with identical split
  * semantics (`split(text, " ", -1)`: consecutive/trailing separators
  * keep their empty tokens; a doc with one token has no bigrams).
  *
  * Why an expression: the relational form exploded FEATURE STRINGS and
  * computed a 32-char hex digest + string substring + conv per feature —
  * at the 500k-doc bench corpus its four map passes ran ~640 task-s
  * with ~22 s of GC EACH (r15 StageProf), nearly all of it feature/hex
  * allocation churn. This kernel hashes bytes in place (one shared
  * MessageDigest, no hex, no feature strings for bigrams — the digest
  * is fed token bytes + separator directly) and emits the 12-bit bucket
  * from the first two digest bytes.
  */
case class DsirFeatureBuckets(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {
  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "dsir_feature_buckets"

  override def nullSafeEval(input: Any): Any =
    DsirFeatureBuckets.compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cls = DsirFeatureBuckets.getClass.getName.stripSuffix("$")
    nullSafeCodeGen(ctx, ev, t =>
      s"""${ev.value} = (org.apache.spark.sql.catalyst.util.ArrayData)
         |  $cls.compute($t);""".stripMargin)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object DsirFeatureBuckets {
  private val Prefix = "b:".getBytes("UTF-8")

  // MessageDigest.getInstance does a provider lookup — once per thread,
  // not once per row (the relational Md5 expression paid it per FEATURE)
  private val mdLocal = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  /** First 3 hex digits of the digest as an integer: hex chars are the
    * nibbles of the digest bytes in order, so the value is the top 12
    * bits — (d0 << 4) | (d1 >>> 4).
    */
  private def bucket12(d: Array[Byte]): Long =
    (((d(0) & 0xff) << 4) | ((d(1) & 0xff) >>> 4)).toLong

  def compute(text: UTF8String): ArrayData = {
    // Tokenize on the raw UTF-8 bytes: 0x20 never occurs inside a
    // multibyte sequence, so byte-splitting IS split(text, " ", -1)
    // (consecutive/trailing separators keep their empty tokens). No
    // String decode, no per-token re-encode — the first cut went
    // through text.toString.split and measured SLOWER than the
    // relational form it replaces (a full UTF-16 decode + per-token
    // UTF-8 re-encode of the corpus).
    val bytes = text.getBytes
    val len = bytes.length
    var n = 1
    var i = 0
    while (i < len) { if (bytes(i) == ' '.toByte) n += 1; i += 1 }
    val starts = new Array[Int](n)
    val ends = new Array[Int](n)
    var t = 0
    var start = 0
    i = 0
    while (i < len) {
      if (bytes(i) == ' '.toByte) {
        starts(t) = start; ends(t) = i; t += 1; start = i + 1
      }
      i += 1
    }
    starts(t) = start; ends(t) = len
    val nBigrams = n - 1 // n >= 1 always (empty text = one empty token)
    val out = new Array[Long](n + nBigrams)
    val md = mdLocal.get()
    i = 0
    while (i < n) { // unigrams: "b:" + tok[i]
      md.reset()
      md.update(Prefix)
      md.update(bytes, starts(i), ends(i) - starts(i))
      out(i) = bucket12(md.digest())
      i += 1
    }
    i = 0
    while (i < nBigrams) { // bigrams: "b:" + tok[i] + " " + tok[i+1] —
      // tokens split on single spaces are ADJACENT in the source bytes,
      // so the bigram feature is the contiguous span [start_i, end_{i+1})
      md.reset()
      md.update(Prefix)
      md.update(bytes, starts(i), ends(i + 1) - starts(i))
      out(n + i) = bucket12(md.digest())
      i += 1
    }
    new GenericArrayData(out)
  }
}
