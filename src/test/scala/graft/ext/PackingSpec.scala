package graft.ext

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.TestSpark
import graft.core.Tables

class PackingSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("packSequences: intervals are contiguous, chop arithmetic matches a sequential replay") {
    val docs = Seq((1L, 100L), (2L, 2048L), (3L, 1L), (4L, 0L), (5L, 5000L))
      .toDF("doc_id", "n")
    val got = Packing.packSequences(docs, "doc_id", "n", seqLen = 2048)
      .orderBy("id").collect()
      .map(r => (r.getLong(0), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5)))
    // sequential replay: cumsum chop at 2048
    var cs = 0L
    val want = Seq((1L, 100L), (2L, 2048L), (3L, 1L), (4L, 0L), (5L, 5000L)).map {
      case (id, n) =>
        val s = cs; cs += n
        val sf = s / 2048
        val sl = if (n == 0) sf else (cs - 1) / 2048
        (id, s, cs, sf, math.max(sf, sl))
    }
    assert(got.toSeq == want)
  }

  test("packSequences: distributed scan equals the one-task global window on fixture docs") {
    val docs = Tables.load(spark, TestSpark.Sf, "documents")
      .select(col("doc_id"), size(split(col("text"), " ")).cast("long").as("n"))
    val got = Packing.packSequences(docs, "doc_id", "n", seqLen = 512)
      .select("id", "tok_start", "tok_end", "seq_first", "seq_last")
    val w = org.apache.spark.sql.expressions.Window.orderBy("doc_id")
    val ref = docs
      .withColumn("tok_end", sum("n").over(w))
      .withColumn("tok_start", col("tok_end") - col("n"))
      .withColumn("seq_first", floor(col("tok_start") / 512).cast("long"))
      .withColumn("seq_last",
        greatest(col("seq_first"), floor((col("tok_end") - 1) / 512)).cast("long"))
      .select(col("doc_id").as("id"), col("tok_start"), col("tok_end"),
        col("seq_first"), col("seq_last"))
    assert(got.exceptAll(ref).isEmpty && ref.exceptAll(got).isEmpty)

    // pinned plan shape: the distributed scan must contain NO
    // single-partition exchange (the global-window trap this operator
    // exists to avoid), while the reference form above contains exactly
    // that — so the assertion is meaningful, not vacuous
    import org.apache.spark.sql.execution.SparkPlan
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeLike
    import org.apache.spark.sql.catalyst.plans.physical.SinglePartition
    def countSP(p: SparkPlan): Int = p match {
      case a: AdaptiveSparkPlanExec => countSP(a.executedPlan)
      case qs: QueryStageExec => countSP(qs.plan)
      case other =>
        val self = other match {
          case e: ShuffleExchangeLike if e.outputPartitioning == SinglePartition => 1
          case _ => 0
        }
        self + other.children.map(countSP).sum
    }
    def singlePartitionExchanges(df: org.apache.spark.sql.DataFrame): Int = {
      df.count() // finalize the adaptive plan
      countSP(df.queryExecution.executedPlan)
    }
    assert(singlePartitionExchanges(got) == 0,
      "distributed prefix scan planned a single-partition exchange")
    assert(singlePartitionExchanges(ref) > 0,
      "expected the naive global window to show the single-partition shuffle")
  }

  test("packSequences property: random token counts — contiguity, totals, span arithmetic") {
    import org.scalacheck.{Gen, Prop, Test => SCTest}
    val countsGen = Gen.listOfN(40, Gen.chooseNum(0L, 5000L))
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(10),
      Prop.forAll(countsGen) { ns =>
        val docs = ns.zipWithIndex.map { case (n, i) => (i.toLong, n) }
          .toDF("doc_id", "n")
        val got = Packing.packSequences(docs, "doc_id", "n", seqLen = 1024)
          .orderBy("id").collect()
          .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
            r.getLong(4), r.getLong(5)))
        val contiguous = got.sliding(2).forall {
          case Array(a, b) => a._4 == b._3 // prev tok_end == next tok_start
          case _ => true
        }
        val total = got.lastOption.map(_._4).getOrElse(0L) == ns.sum
        val spans = got.forall { case (_, n, s, e, sf, sl) =>
          e - s == n && sf == s / 1024 &&
            sl == (if (n == 0) sf else math.max(sf, (e - 1) / 1024))
        }
        contiguous && total && spans && got.length == ns.length
      })
    assert(res.passed, res.status.toString)
  }

  test("distributedRank equals the one-task global window over a hash order") {
    val docs = Tables.load(spark, TestSpark.Sf, "documents")
      .select(col("doc_id"),
        md5(col("doc_id").cast("string").cast("binary")).as("__k"))
    val got = Packing.distributedRank(docs, Seq(col("__k"), col("doc_id")))
      .select("doc_id", "rank")
    val w = org.apache.spark.sql.expressions.Window.orderBy("__k", "doc_id")
    val ref = docs.withColumn("rank", row_number().over(w).cast("long"))
      .select("doc_id", "rank")
    assert(got.exceptAll(ref).isEmpty && ref.exceptAll(got).isEmpty)
    // ranks are a permutation of 1..n
    val n = docs.count()
    assert(got.agg(min("rank"), max("rank"), countDistinct("rank")).first()
      .toSeq == Seq(1L, n, n))
  }

  test("packBinsFFD: every doc in exactly one bin, budgets hold, count near optimal") {
    val docs = Tables.load(spark, TestSpark.Sf, "documents")
      .select(col("doc_id"), size(split(col("text"), " ")).cast("long").as("n"))
    val budget = 200L
    val packed = Packing.packBinsFFD(docs, "doc_id", "n", budget)
    assert(packed.count() == docs.count())
    assert(packed.select("id").distinct().count() == docs.count())
    // no non-oversize bin exceeds the budget; oversize bins are singletons
    val overfull = packed.filter(!col("oversize"))
      .groupBy("bin_id").agg(sum("n_tokens").as("t"))
      .filter(col("t") > budget).count()
    assert(overfull == 0)
    val fatSingletons = packed.filter(col("oversize"))
      .groupBy("bin_id").count().filter(col("count") =!= 1).count()
    assert(fatSingletons == 0)
    // quality: bins used ≤ 1.5 × the fractional lower bound + #partitions
    // slack (per-partition FFD cannot mix across partitions)
    val totalTok = packed.filter(!col("oversize")).agg(sum("n_tokens")).first().getLong(0)
    val bins = packed.filter(!col("oversize")).select("bin_id").distinct().count()
    val lower = math.max(1L, totalTok / budget)
    assert(bins <= (lower * 3) / 2 + 32, s"bins=$bins lower=$lower")
  }

  test("packBinsNextFit equals a sequential replay of the greedy fold, under any partitioning") {
    val budget = 512L; val span = 100L
    val base = Tables.load(spark, TestSpark.Sf, "documents")
      .select(col("doc_id"), size(split(col("text"), " ")).cast("long").as("n"))
      // plant ×30 giants on both sides of the oversize line, like the
      // oracled Catalog entry does (the raw fixture never exceeds budget)
      .select(col("doc_id"),
        when(col("doc_id") % 83 === 7, col("n") * 30).otherwise(col("n")).as("n"))
    val got = Packing.packBinsNextFit(base, "doc_id", "n", budget, span)
      .orderBy("id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getBoolean(3)))
    // driver-side replay of the documented semantics: shard by id range,
    // next-fit in (n desc, id) order
    val want = base.collect().map(r => (r.getLong(0), r.getLong(1)))
      .groupBy { case (id, _) => id / span }
      .toSeq.flatMap { case (shard, items) =>
        var bin = -1L; var free = -1L
        items.sortBy { case (id, n) => (-n, id) }.map { case (id, n) =>
          if (bin < 0 || n > free) { bin += 1; free = math.max(budget - n, 0L) }
          else free -= n
          (id, n, (shard << 20) + bin, n > budget)
        }
      }.sortBy(_._1)
    assert(got.toSeq == want)
    assert(got.exists(_._4), "plant failed: no oversize doc exercised")
    // determinism under a hostile input layout: same result from one
    // skewed partition (bin ids derive from the data, not the plan)
    val repacked = Packing.packBinsNextFit(base.repartition(1), "doc_id", "n", budget, span)
      .orderBy("id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getBoolean(3)))
    assert(repacked.toSeq == got.toSeq)
  }

  test("packBinsNextFit rejects a span that could collide bin ids across shards") {
    // worst case is one bin per doc: local_bin can reach span-1, which
    // must fit in the 20 low bits of the packed bin id
    val docs = Tables.load(spark, TestSpark.Sf, "documents")
      .select(col("doc_id"), lit(10L).as("n"))
    val e = intercept[IllegalArgumentException] {
      Packing.packBinsNextFit(docs, "doc_id", "n", budget = 512L, span = (1L << 20) + 1)
    }
    assert(e.getMessage.contains("2^20"))
  }

  test("packBinsNextFit rejects ids whose shard would overflow the shift") {
    val docs = spark.range(1).select(
      lit((1L << 43) * 100L).as("doc_id"), lit(10L).as("n"))
    val e = intercept[org.apache.spark.SparkException] {
      Packing.packBinsNextFit(docs, "doc_id", "n", budget = 512L, span = 100L).collect()
    }
    assert(e.getMessage.contains("2^43") ||
      Option(e.getCause).exists(_.getMessage.contains("2^43")))
  }
}
