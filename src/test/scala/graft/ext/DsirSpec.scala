package graft.ext

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.TestSpark

class DsirSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString

  private def bucket(f: String): Int =
    Integer.parseInt(md5hex("b:" + f).substring(0, 3), 16)

  private def round9(x: Double): BigDecimal =
    BigDecimal(x).setScale(9, BigDecimal.RoundingMode.HALF_UP)

  /** Single-threaded replay of the whole DSIR chain: hashed features,
    * both smoothed multinomials, 9-dp decimal log-ratios, exact decimal
    * sums, derandomized Gumbel keys, the selection permutation.
    */
  private def reference(rows: Seq[(Long, String)], targetMod: Long)
      : Seq[(Long, Long, Double, Long, Int)] = {
    def feats(text: String): Seq[String] = {
      val ws = text.split(" ", -1).toSeq
      ws ++ ws.zip(ws.drop(1)).map { case (a, b) => s"$a $b" }
    }
    val fb = rows.map { case (id, t) => id -> feats(t).map(bucket) }
    val (tgt, raw) = fb.partition(_._1 % targetMod == 0)
    val cp = tgt.flatMap(_._2).groupBy(identity).view.mapValues(_.size.toLong).toMap
    val cq = raw.flatMap(_._2).groupBy(identity).view.mapValues(_.size.toLong).toMap
    val tp = cp.values.sum; val tq = cq.values.sum
    val w: Map[Int, BigDecimal] = cq.map { case (b, q) =>
      b -> round9(math.log((cp.getOrElse(b, 0L) + 1.0) / (tp + Dsir.Buckets).toDouble)
        - math.log((q + 1.0) / (tq + Dsir.Buckets).toDouble))
    }
    val scored = raw.map { case (id, bs) =>
      (id, bs.size.toLong, bs.map(w).foldLeft(BigDecimal(0))(_ + _))
    }
    val budget = scored.size.toLong / 4
    val keyed = scored.map { case (id, n, lw) =>
      val u = (java.lang.Long.parseLong(md5hex("g:" + id).substring(0, 6), 16) + 0.5) / 16777216.0
      (id, n, lw, lw + round9(-math.log(-math.log(u))))
    }
    val ranked = keyed.sortBy { case (id, _, _, key) => (key.unary_-, id) }.zipWithIndex
    ranked.map { case ((id, n, lw, _), i) =>
      (id, n, lw.setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble,
        i + 1L, if (i + 1L <= budget) 1 else 0)
    }.sortBy(_._1)
  }

  /** Two sub-populations keyed off the SAME residue the target slice
    * uses: i % 11 ≤ 4 speaks the target domain's vocabulary (so the
    * % 11 == 0 target corpus is domain-only), i % 11 ≥ 5 an alien one.
    */
  private def fixture: Seq[(Long, String)] = (1 to 180).map { i =>
    val vocab = if (i % 11 <= 4) Seq("data", "select", "spark", "scale", "corpus")
                else Seq("zeb", "quux", "wib", "florp", "snark")
    val text = (0 to i % 9).map(j => vocab((i + j) % vocab.size)).mkString(" ")
    (i.toLong, text)
  }

  private def run(df: org.apache.spark.sql.DataFrame) = {
    val target = df.filter(col("doc_id") % 11 === 0)
    val raw = df.filter(col("doc_id") % 11 =!= 0)
    val scored = Dsir.logWeights(Dsir.fit(target, raw, "doc_id", "text"),
      raw, "doc_id", "text")
    Dsir.select(scored, "doc_id", scored.count() / 4).orderBy("doc_id")
  }

  test("kernel featureBuckets equals the relational explode+md5+conv form (r15)") {
    // fixture texts PLUS the split-semantics edges the kernel must
    // reproduce: consecutive spaces (empty tokens), trailing space,
    // single word (no bigrams), empty string (one empty token),
    // multibyte words
    val docs = Seq(
      (1L, "the quick brown fox"),
      (2L, "double  space inside"),
      (3L, "trailing space "),
      (4L, "oneword"),
      (5L, ""),
      (6L, "añçé 漢字 mixé"),
      (7L, " leading"),
      (8L, "a b a b a")).toDF("doc_id", "text")
    def canon(df: org.apache.spark.sql.DataFrame) =
      df.groupBy("id", "b").count().collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sorted.toSeq
    assert(canon(Dsir.featureBuckets(docs, "doc_id", "text")) ==
      canon(Dsir.featureBucketsRelational(docs, "doc_id", "text")))
  }

  test("select equals the single-threaded reference replay exactly") {
    val got = run(fixture.toDF("doc_id", "text"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2),
        r.getLong(3), r.getInt(4))).toSeq
    assert(got == reference(fixture, 11L))
  }

  test("select resolves the caller's idCol end to end (ADVICE r11)") {
    // same data keyed by a different id column name: identical selection
    // values, schema keyed by the caller's name — the old code hardcoded
    // col("id") for the Gumbel uniform and blew up on any real idCol
    val df = fixture.toDF("doc_id", "text")
    val renamed = fixture.toDF("my_key", "text")
    def go(d: org.apache.spark.sql.DataFrame, idCol: String) = {
      val target = d.filter(col(idCol) % 11 === 0)
      val raw = d.filter(col(idCol) % 11 =!= 0)
      val scored = Dsir.logWeights(Dsir.fit(target, raw, idCol, "text"),
        raw, idCol, "text")
      Dsir.select(scored, idCol, scored.count() / 4).orderBy(idCol)
    }
    val a = go(df, "doc_id")
    val b = go(renamed, "my_key")
    assert(b.columns.head == "my_key")
    assert(a.collect().map(_.toSeq).toSeq == b.collect().map(_.toSeq).toSeq)
  }

  test("selection is partition-order independent") {
    val df = fixture.toDF("doc_id", "text")
    def go(d: org.apache.spark.sql.DataFrame) = run(d).collect().map(_.toSeq).toSeq
    assert(go(df.repartition(1)) == go(df.repartition(13)))
  }

  test("importance weights separate the target domain from the alien vocabulary") {
    val out = run(fixture.toDF("doc_id", "text"))
      .select("doc_id", "n_feats", "log_w").collect()
      .map(r => (r.getLong(0), r.getDouble(2) / r.getLong(1)))
    val domain = out.collect { case (id, w) if id % 11 <= 4 => w }
    val alien = out.collect { case (id, w) if id % 11 >= 5 => w }
    assert(domain.nonEmpty && alien.nonEmpty)
    // log_w scales with doc length (it is a full-doc log likelihood
    // ratio), so compare PER-FEATURE means: domain features were seen in
    // the target corpus, alien features never
    val dMean = domain.sum / domain.size; val aMean = alien.sum / alien.size
    assert(dMean > aMean + 1.0,
      s"per-feature weight means do not separate: domain $dMean vs alien $aMean")
  }

  test("exactly the budgeted quarter of the pool is picked, and ranks are a permutation") {
    val out = run(fixture.toDF("doc_id", "text")).collect()
    val n = out.length.toLong
    assert(out.count(_.getInt(4) == 1) == n / 4)
    assert(out.map(_.getLong(3)).sorted.toSeq == (1L to n).toSeq)
  }

  test("bucket-count state is additive: 3-way merge ≡ from-scratch exactly") {
    val df = fixture.toDF("doc_id", "text")
    def asMap(d: org.apache.spark.sql.DataFrame) =
      d.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val full = asMap(Dsir.bucketCounts(df, "doc_id", "text"))
    val merged = asMap(Seq(0, 1, 2)
      .map(k => Dsir.bucketCounts(df.filter(col("doc_id") % 3 === k), "doc_id", "text"))
      .reduce(Dsir.mergeCounts))
    assert(merged == full)
  }

  test("fitting from a merged state yields bit-identical weights to from-scratch") {
    val df = fixture.toDF("doc_id", "text")
    val tc = Dsir.bucketCounts(df.filter(col("doc_id") % 11 === 0), "doc_id", "text")
    val raw = df.filter(col("doc_id") % 11 =!= 0)
    def weights(rc: org.apache.spark.sql.DataFrame) =
      Dsir.fitFromCounts(tc, rc).weights.collect()
        .map(r => r.getLong(0) -> r.getDecimal(1)).toMap
    val full = weights(Dsir.bucketCounts(raw, "doc_id", "text"))
    val merged = weights(Dsir.mergeCounts(
      Dsir.bucketCounts(raw.filter(col("doc_id") % 2 === 0), "doc_id", "text"),
      Dsir.bucketCounts(raw.filter(col("doc_id") % 2 =!= 0), "doc_id", "text")))
    assert(full == merged)
  }

  test("bucketCountsBySlice: one labeled pass equals per-slice bucketCounts") {
    import spark.implicits._
    val df = fixture.toDF("doc_id", "text")
    val label = when(col("doc_id") % 11 === 0, lit("t"))
      .when(col("doc_id") % 2 === 0, lit("r0")).otherwise(lit("r1"))
    val sliced = Dsir.bucketCountsBySlice(df, "doc_id", "text", label)
    def got(s: String) = sliced.filter(col("slice") === s)
      .select("b", "cnt").collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    def want(f: org.apache.spark.sql.DataFrame) =
      Dsir.bucketCounts(f, "doc_id", "text").collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got("t") == want(df.filter(col("doc_id") % 11 === 0)))
    assert(got("r0") == want(df.filter(col("doc_id") % 11 =!= 0 && col("doc_id") % 2 === 0)))
    assert(got("r1") == want(df.filter(col("doc_id") % 11 =!= 0 && col("doc_id") % 2 =!= 0)))
  }

  test("real documents: model broadcasts and the budget holds") {
    val docs = spark.read.parquet(s"${TestSpark.Sf}/documents.parquet")
    val target = docs.filter(col("doc_id") % 11 === 0)
    val raw = docs.filter(col("doc_id") % 11 =!= 0)
    val model = Dsir.fit(target, raw, "doc_id", "text")
    assert(model.weights.count() <= Dsir.Buckets)
    val scored = Dsir.logWeights(model, raw, "doc_id", "text")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val n = scored.count()
    val sel = Dsir.select(scored, "doc_id", n / 4)
    assert(sel.filter(col("picked") === 1).count() == n / 4)
    // the scoring join is a broadcast (the model is ≤ 4096 rows)
    val plan = scored.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), "scoring join must broadcast the model")
    scored.unpersist()
  }
}
