package graft.ext

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Entity-resolution join (ext/FuzzyJoin.scala). The md5 twin is gated
  * cross-engine by the Catalog oracle; this spec pins what the oracle
  * can't see: the production xxhash path against a brute-force
  * levenshtein join (verify + best-select exactness, blocking recall
  * bound), the hub cap, and determinism.
  */
class FuzzyJoinSpec extends AnyFunSuite {
  private lazy val spark = graft.TestSpark.spark
  import spark.implicits._

  // 200 clean "titles" with enough entropy that 3-gram blocks are sparse
  // (seeded-random strings — template-shaped titles share so many grams
  // that every doc lands in one hub block, which the cap rightly drops;
  // that behavior has its own test below), dirtied by a 1-char deletion
  // at a key-derived position
  private lazy val clean = (0 until 200).map { i =>
    val rnd = new scala.util.Random(i * 1337 + 7)
    (i.toLong, (0 until 40).map(_ => ('a' + rnd.nextInt(26)).toChar).mkString)
  }.toDF("doc_id", "s").cache()
  private lazy val dirty = clean
    .withColumn("p", (col("doc_id") % 17 + 4).cast("int"))
    .select(col("doc_id"),
      expr("concat(substring(s, 1, p - 1), substring(s, p + 1, 99))").as("s"))
    .cache()

  /** Brute-force truth: all-pairs levenshtein, best per dirty row. */
  private lazy val brute = {
    val pairs = dirty.select(col("doc_id").as("dirty_id"), col("s").as("d_str"))
      .crossJoin(clean.select(col("doc_id").as("clean_id"), col("s").as("c_str")))
      .withColumn("dist", levenshtein(col("d_str"), col("c_str")))
      .filter(col("dist") <= 2)
    val w = Window.partitionBy("dirty_id").orderBy(col("dist"), col("clean_id"))
    pairs.withColumn("rk", row_number().over(w)).filter(col("rk") === 1)
      .select(col("dirty_id"), col("clean_id"), col("dist").cast("int").as("dist"))
      .collect().map(r => (r.getLong(0), (r.getLong(1), r.getInt(2)))).toMap
  }

  private def run(bucketer: (org.apache.spark.sql.DataFrame, String, String) => org.apache.spark.sql.DataFrame) =
    FuzzyJoin.resolve(dirty, clean, "doc_id", "s", bucketer, maxDist = 2, maxBucket = 64)
      .collect().map(r => (r.getLong(0), (r.getLong(1), r.getInt(2)))).toMap

  test("production xx path: every match is the brute-force best; recall >= 0.95") {
    val got = run(FuzzyJoin.xxBuckets)
    got.foreach { case (d, m) => assert(brute(d) == m, s"dirty $d") }
    assert(got.size >= (brute.size * 0.95).toInt, s"${got.size} of ${brute.size}")
  }

  test("md5 twin path agrees with brute-force best on every returned row") {
    val got = run(FuzzyJoin.md5Buckets)
    got.foreach { case (d, m) => assert(brute(d) == m, s"dirty $d") }
    assert(got.size >= (brute.size * 0.95).toInt)
  }

  test("kernel bucketers equal the relational explode+groupBy form (r14)") {
    // the fixture strings PLUS the edge shapes the kernel must clip
    // identically: shorter than one gram, exactly one gram, empty, and
    // multibyte text (char-based substring, not byte-based)
    val edge = Seq((1000L, "ab"), (1001L, "abc"), (1002L, ""),
      (1003L, "añçé漢字x"), (1004L, "ñ"))
      .toDF("doc_id", "s")
    val probe = clean.unionByName(dirty
        .withColumn("doc_id", col("doc_id") + 500L))
      .unionByName(edge)
    def canon(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.get(1).toString)).sorted.toSeq
    assert(canon(FuzzyJoin.md5Buckets(probe, "doc_id", "s")) ==
      canon(FuzzyJoin.md5BucketsRelational(probe, "doc_id", "s")))
    assert(canon(FuzzyJoin.xxBuckets(probe, "doc_id", "s")) ==
      canon(FuzzyJoin.xxBucketsRelational(probe, "doc_id", "s")))
  }

  test("clean-side hub cap drops degenerate blocks instead of exploding") {
    // every clean row identical -> one block of size 300 > cap, so
    // blocking yields ZERO candidates (the O(n*m) blowup is refused, not
    // paid); a brute-force join would match all 300.
    val c = (0 until 300).map(i => (i.toLong, "same exact title every time"))
      .toDF("doc_id", "s")
    val d = Seq((0L, "same exact title every tim")).toDF("doc_id", "s")
    val out = FuzzyJoin.resolve(d, c, "doc_id", "s", FuzzyJoin.xxBuckets,
      maxDist = 2, maxBucket = 64)
    assert(out.count() == 0)
    // raising the cap above the block size restores the match
    val out2 = FuzzyJoin.resolve(d, c, "doc_id", "s", FuzzyJoin.xxBuckets,
      maxDist = 2, maxBucket = 512)
    assert(out2.count() == 1)
  }

  test("resolve is deterministic across runs") {
    assert(run(FuzzyJoin.xxBuckets) == run(FuzzyJoin.xxBuckets))
  }
}
