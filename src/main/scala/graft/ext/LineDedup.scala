package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Cross-document LINE-level boilerplate removal (extension beyond
  * reference parity, SURVEY.md §7.5) — the CCNet / RefinedWeb cleanup
  * step that runs before any doc-level dedup: a line of text occurring
  * in many DISTINCT documents is boilerplate (site headers, footers,
  * nav text, cookie banners, license blurbs), and dropping those lines
  * removes the cross-doc noise that would otherwise glue unrelated
  * documents together in MinHash space and pollute n-gram LMs.
  * Complements the house dedup family: [[Dedup]] drops whole near-dup
  * DOCUMENTS, [[SubstringDedup]] finds verbatim SPANS, this drops
  * repeated LINES from every document while keeping the documents.
  *
  * Semantics (declared, both engines replay them):
  *  - lines are `split(text, "\n")` verbatim; a line's identity is its
  *    TRIMMED content; whitespace-only lines are never counted and
  *    never dropped (they are layout, not content).
  *  - a line is boilerplate iff its trimmed content occurs in ≥ minDf
  *    distinct documents.
  *  - survivors reassemble in original position order; a document whose
  *    every content line is boilerplate stays in the output with
  *    text_clean = "" (removal must never drop the document row — the
  *    doc-level gates decide that).
  *
  * Scale shape (the 100 TB posture):
  *  - line identity crosses the wire as md5 hex of the trimmed line,
  *    never the line itself (the substring-gate lesson: key width is
  *    the shuffle bill; boilerplate lines are often hundreds of bytes).
  *  - document frequency is one hash aggregation over (key, id) with
  *    map-side combine (within-doc repeats of the same line collapse
  *    before the shuffle), then a count per key.
  *  - the drop is a broadcast-free LEFT ANTI join of the line stream
  *    against the boilerplate keys; reassembly is one aggregation by
  *    doc id with per-group state bounded by the document size.
  *    Three linear exchanges, no windows, no corpus-sized driver state.
  */
object LineDedup {

  /** Remove cross-document boilerplate lines from `docs(idCol, textCol)`.
    * Returns (idCol, n_lines, n_dropped, text_clean), one row per input
    * document: n_lines = total lines in the original split, n_dropped =
    * content lines removed as boilerplate, text_clean = the surviving
    * lines joined by "\n" in original order.
    *
    * `md5Mode` picks the wire key for a line's identity — the substring
    * family's oracle/production split: md5 hex (32 bytes, DuckDB-
    * replayable, the oracled `text_line_dedup` mode) vs xxhash64
    * (8 bytes — a 4× narrower df shuffle and anti-join key, the
    * production posture; 64-bit collisions at web scale cost a handful
    * of false boilerplate drops, the same trade the substring gate
    * made, and LineDedupSpec pins mode parity on the fixture).
    */
  def dropBoilerplate(docs: DataFrame, idCol: String, textCol: String,
                      minDf: Int = 3, md5Mode: Boolean = true): DataFrame = {
    // the xx key stays a BIGINT on the wire (8 bytes, not 32-hex)
    def keyOf(c: org.apache.spark.sql.Column) =
      if (md5Mode) md5(c.cast("binary")).as("k") else xxhash64(c).as("k")
    val lines = docs.select(col(idCol).as("id"),
        posexplode(split(col(textCol), "\n")).as(Seq("pos", "ln")))
      .withColumn("k", keyOf(trim(col("ln"))))
      .withColumn("content", trim(col("ln")) =!= "")
    // document frequency per line key: distinct (k, id) first (map-side
    // combine kills within-doc repeats), then a plain count per key
    val boiler = lines.filter(col("content"))
      .select("k", "id").distinct()
      .groupBy("k").agg(count(lit(1)).as("df"))
      .filter(col("df") >= minDf)
      .select("k")
    val kept = lines.join(boiler,
      lines("k") === boiler("k") && lines("content"), "left_anti")
    val rebuilt = kept.groupBy("id").agg(
      concat_ws("\n", transform(array_sort(
          collect_list(struct(col("pos"), col("ln")))),
        s => s.getField("ln"))).as("text_clean"),
      count(lit(1)).as("n_kept"))
    docs.select(col(idCol).as("id"),
        size(split(col(textCol), "\n")).cast("long").as("n_lines"))
      .join(rebuilt, Seq("id"), "left_outer")
      .select(col("id").as(idCol), col("n_lines"),
        (col("n_lines") - coalesce(col("n_kept"), lit(0L))).as("n_dropped"),
        coalesce(col("text_clean"), lit("")).as("text_clean"))
  }
}
