package graft.queries

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.TestSpark

class ScaledFixturesSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("multiplier tracks sf: 0.001→1, 0.01→10, 0.1→100, unknown→1") {
    assert(ScaledFixtures.multiplier("/root/testdata/sf0.001") == 1)
    assert(ScaledFixtures.multiplier("/root/testdata/sf0.01") == 10)
    assert(ScaledFixtures.multiplier("/root/testdata/sf0.1") == 100)
    assert(ScaledFixtures.multiplier("/tmp/whatever") == 1)
  }

  test("scaled docs: m× rows, replica 0 verbatim, replicas token-disjoint, dup structure preserved") {
    val m = 3
    val base = graft.core.Tables.load(spark, TestSpark.Sf, "documents")
    val scaled = ScaledFixtures.scaledDocs(spark, TestSpark.Sf, m).persist()
    assert(scaled.count() == base.count() * m)
    // replica 0 is the original corpus
    val r0 = scaled.filter(col("doc_id") < ScaledFixtures.IdStride)
      .select("doc_id", "text")
    assert(r0.exceptAll(base.select("doc_id", "text")).isEmpty)
    // replicas share no tokens: every cross-replica word-set Jaccard is 0,
    // checked via distinct-token overlap between replica 0 and 1
    val toks = scaled.select((col("doc_id") / ScaledFixtures.IdStride).cast("int").as("rep"),
      explode(split(col("text"), " ")).as("w"))
    val overlap = toks.filter(col("rep") === 0).select("w").distinct()
      .join(toks.filter(col("rep") === 1).select("w").distinct(), "w").count()
    assert(overlap == 0)
    // exact-dup structure is preserved per replica: the count of docs
    // sharing a text with another doc is m× the base corpus's
    def exactDups(df: org.apache.spark.sql.DataFrame) =
      df.groupBy("text").count().filter(col("count") > 1)
        .agg(coalesce(sum("count"), lit(0L))).first().getLong(0)
    val baseDups = exactDups(base)
    assert(exactDups(scaled) == baseDups * m)
    // near-dup structure: NO cross-replica pairs ever (token-disjoint
    // replicas), and per-replica pair volume tracks the base corpus
    // (token bijection preserves true Jaccard; minhash banding is
    // hash-dependent, so borderline pairs may differ by a few — linear
    // scaling, never quadratic blow-up)
    val basePairs = graft.ext.Dedup.lshVerifiedPairs(
      base, "doc_id", "text", 0.5).count()
    val scaledPairsDf = graft.ext.Dedup.lshVerifiedPairs(
      scaled, "doc_id", "text", 0.5).persist()
    val cross = scaledPairsDf.filter(
      (col("id_a") / ScaledFixtures.IdStride).cast("long") =!=
        (col("id_b") / ScaledFixtures.IdStride).cast("long")).count()
    assert(cross == 0, "replicas must never pair across replica boundaries")
    val scaledPairs = scaledPairsDf.count()
    assert(scaledPairs >= basePairs * m * 8 / 10 && scaledPairs <= basePairs * m * 12 / 10,
      s"near-dup pairs must scale ~linearly: base=$basePairs scaled=$scaledPairs m=$m")
    scaledPairsDf.unpersist()
    scaled.unpersist()
  }

  test("ensure() rebuilds when the source fixtures change (stale-marker guard)") {
    // an sf name unused by real testdata so the cache dir can't collide
    val root = java.nio.file.Files.createTempDirectory("sfx").toFile
    val sfDir = new java.io.File(root, "sf0.004") // multiplier 4
    assert(ScaledFixtures.multiplier(sfDir.toString) == 4)
    val docs = graft.core.Tables.load(spark, TestSpark.Sf, "documents")
    val embs = graft.core.Tables.load(spark, TestSpark.Sf, "embeddings")
    def writeSrc(nDocs: Int): Unit = {
      docs.orderBy("doc_id").limit(nDocs).coalesce(1).write
        .mode("overwrite").parquet(s"$sfDir/documents.parquet")
      embs.orderBy("vec_id").limit(10).coalesce(1).write
        .mode("overwrite").parquet(s"$sfDir/embeddings.parquet")
    }
    writeSrc(50)
    val out = ScaledFixtures.ensure(spark, sfDir.toString)
    assert(spark.read.parquet(s"$out/documents.parquet").count() == 50 * 4)
    // same sources ⇒ served from cache (marker mtime unchanged)
    val markerPath = java.nio.file.Paths.get(out, "_SCALED_OK")
    val t1 = java.nio.file.Files.getLastModifiedTime(markerPath)
    ScaledFixtures.ensure(spark, sfDir.toString)
    assert(java.nio.file.Files.getLastModifiedTime(markerPath) == t1)
    // regenerated sources (different sizes/mtimes) ⇒ rebuilt, not stale
    writeSrc(30)
    val out2 = ScaledFixtures.ensure(spark, sfDir.toString)
    assert(spark.read.parquet(s"$out2/documents.parquet").count() == 30 * 4,
      "stale scaled corpus served after the source fixtures changed")
  }

  test("scaled embeddings: m× rows, replica 0 verbatim, replicas perturbed but close") {
    val m = 2
    val base = graft.core.Tables.load(spark, TestSpark.Sf, "embeddings")
    val scaled = ScaledFixtures.scaledEmbeddings(spark, TestSpark.Sf, m).persist()
    assert(scaled.count() == base.count() * m)
    val r0 = scaled.filter(col("vec_id") < ScaledFixtures.IdStride)
    assert(r0.exceptAll(base).isEmpty)
    // replica 1 is a DISTRACTOR of its source: perturbed within the
    // documented ±0.25 bound, and far enough that it is not a near-dup
    // (cos well below 0.9) — scaling must grow candidate volume, not
    // plant quadratic true-pair output
    val joined = scaled.filter(col("vec_id") >= ScaledFixtures.IdStride)
      .withColumn("src_id", col("vec_id") - ScaledFixtures.IdStride)
      .join(base.select(col("vec_id").as("src_id"), col("embedding").as("orig")), "src_id")
      .select(
        expr("aggregate(zip_with(embedding, orig, (a, b) -> abs(a - b)), " +
          "CAST(0.0 AS DOUBLE), (acc, x) -> greatest(acc, CAST(x AS DOUBLE)))").as("maxd"),
        graft.functions.vectors.float_cosine(col("embedding"), col("orig")).as("cos"))
    val mm = joined.agg(min("maxd"), max("maxd"), max("cos")).first()
    assert(mm.getDouble(0) > 0.0, "replica must actually be perturbed")
    assert(mm.getDouble(1) <= 0.25 + 1e-6, "noise must stay within the documented bound")
    assert(mm.getDouble(2) < 0.9, "replicas must be distractors, not near-dups")
    scaled.unpersist()
  }
}
