package graft.ext

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** BM25 full-text retrieval over a document corpus (extension beyond
  * reference parity, SURVEY.md §7.5): the classic probabilistic ranking
  * a training-data pipeline uses for targeted corpus queries ("find the
  * docs about X") and quality-weighted source selection.
  *
  * Scale shape (the part that matters at 100 TB):
  *  - the query-term set is TINY and broadcast — tokens are filtered
  *    against it map-side at the scan, so only matching postings ever
  *    enter a shuffle. The corpus-wide inverted index is never
  *    materialized for ad-hoc queries; `tf` IS the pruned posting list.
  *  - corpus stats (N, total token count) are one tiny aggregate; they
  *    ride into the score expression as literals, not joins.
  *  - document length is projected BEFORE the token explode and carried
  *    through the tf aggregate (max(len) — constant per doc), so no
  *    doc-length join is needed.
  *  - per-(query, doc) scores sum as DECIMAL(20,9): addition is exact
  *    and order-independent, so a single-node replay (the DuckDB oracle)
  *    reproduces the distributed sum bit-for-bit.
  *  - top-k per query runs through the bounded-heap
  *    [[graft.plans.TopK.perGroup]] operator — O(k) memory per query,
  *    no global sort.
  */
object Bm25 {
  val K1: Double = 1.2
  val B: Double = 0.75

  /** Top-k BM25 hits per query. `queries` is (qid, whitespace-separated
    * terms); IDF uses the Robertson ln(1 + (N - df + 0.5)/(df + 0.5))
    * form (always positive). Duplicate terms inside one query are
    * deduped (standard bag-of-query-terms semantics).
    */
  def searchTopK(docs: DataFrame, idCol: String, textCol: String,
                 queries: Seq[(Int, String)], k: Int = 10,
                 k1: Double = K1, b: Double = B): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val qt = queries.flatMap { case (qid, q) =>
      q.split("\\s+").toSeq.distinct.map(t => (qid, t))
    }.toDF("qid", "word")
    val allTerms = qt.select("word").as[String].collect().distinct.toSeq

    // (id, len, word): len projected once, before the explode
    val toks = docs.select(col(idCol).as("id"),
        size(split(col(textCol), " ")).as("len"),
        explode(split(col(textCol), " ")).as("word"))
      .filter(col("word").isin(allTerms.map(x => x: Any): _*))

    // pruned postings: tf per (doc, matching word); len carried via max
    val tf = toks.groupBy("id", "word")
      .agg(count(lit(1)).as("tf"), max("len").as("len"))

    // corpus stats: two driver scalars from one tiny agg (exact integer
    // sum → the avgdl division is bit-identical on any engine)
    val stats = docs.select(count(lit(1)).as("n"),
      sum(size(split(col(textCol), " ")).cast("long")).as("toks")).head()
    val n = stats.getLong(0)
    val avgdl = stats.getLong(1).toDouble / n

    val df = tf.groupBy("word").agg(count(lit(1)).as("df"))
    val idf = df.select(col("word"),
      log(lit(1.0) + (lit(n.toDouble) - col("df") + 0.5) / (col("df") + 0.5)).as("idf"))

    val tfd = col("tf").cast("double")
    val termScore = col("idf") * tfd * (k1 + 1.0) /
      (tfd + lit(k1) * (lit(1.0 - b) + lit(b) * col("len").cast("double") / avgdl))
    val scored = tf
      .join(broadcast(idf), Seq("word"))
      .join(broadcast(qt), Seq("word"))
      .select(col("qid"), col("id"),
        round(termScore, 9).cast("decimal(20,9)").as("ts"))
      .groupBy("qid", "id").agg(sum("ts").as("score_d"))

    graft.plans.TopK.perGroup(scored, Seq("qid"),
        Seq(("score_d", false), ("id", true)), k)
      .select(col("qid"), col("id").as("doc_id"),
        round(col("score_d").cast("double"), 6).as("score"))
  }

  /** The DuckDB oracle for [[searchTopK]]: the same formula with the
    * same DECIMAL(20,9) term-score discipline and the same top-k
    * tie-break, generated from the same constants so the two engines
    * share one definition.
    */
  def oracleSql(queries: Seq[(Int, String)], k: Int = 10,
                k1: Double = K1, b: Double = B): String = {
    val qvals = queries.flatMap { case (qid, q) =>
      q.split("\\s+").toSeq.distinct.map(t => s"($qid, '$t')")
    }.mkString(", ")
    val terms = queries.flatMap(_._2.split("\\s+")).distinct
      .map(t => s"'$t'").mkString(", ")
    s"""WITH qt(qid, word) AS (VALUES $qvals),
       |toks AS (SELECT doc_id AS id, len(string_split(text, ' ')) AS len,
       |                unnest(string_split(text, ' ')) AS word
       |         FROM documents),
       |tf AS (SELECT id, word, count(*) AS tf, max(len) AS len
       |       FROM toks WHERE word IN ($terms) GROUP BY 1, 2),
       |stats AS (SELECT count(*) AS n,
       |                 CAST(sum(len(string_split(text, ' '))) AS DOUBLE)
       |                   / count(*) AS avgdl
       |          FROM documents),
       |df AS (SELECT word, count(*) AS df FROM tf GROUP BY 1),
       |sc AS (SELECT q.qid, t.id,
       |   CAST(round(ln(1 + (s.n - d.df + 0.5) / (d.df + 0.5))
       |     * t.tf * ${k1 + 1.0}
       |     / (t.tf + $k1 * (${1.0 - b} + $b * t.len / s.avgdl)), 9)
       |     AS DECIMAL(20,9)) AS ts
       |   FROM tf t JOIN df d USING (word) JOIN qt q USING (word)
       |   CROSS JOIN stats s),
       |agg AS (SELECT qid, id, sum(ts) AS score_d FROM sc GROUP BY 1, 2),
       |rk AS (SELECT qid, id, score_d, row_number()
       |         OVER (PARTITION BY qid ORDER BY score_d DESC, id) AS r
       |       FROM agg)
       |SELECT qid, id AS doc_id, round(CAST(score_d AS DOUBLE), 6) AS score
       |FROM rk WHERE r <= $k ORDER BY qid, doc_id""".stripMargin
  }
}
