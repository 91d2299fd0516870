package graft.queries

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.TestSpark

/** Pins `corpus_domain_cap` semantics beyond the DuckDB oracle: the cap
  * actually binds on the fixture (every source exceeds it), survivors
  * agree with a plain window-rank reference, and re-running selects the
  * identical subsample (deterministic hash rank, not rand()).
  */
class DomainCapSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("corpus_domain_cap: ≤10 per source, binding, window-rank-exact, deterministic") {
    val q = Catalog.queries("corpus_domain_cap")
    val got = q(spark, TestSpark.Sf)
    val perSource = got.groupBy("source").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(perSource.nonEmpty && perSource.values.forall(_ == 10L),
      s"cap must bind at exactly 10 on the fixture (25 docs/source): $perSource")
    // reference: the straightforward window rank over the same hash key
    val w = org.apache.spark.sql.expressions.Window.partitionBy("source")
      .orderBy(col("hk"), col("doc_id"))
    val ref = graft.core.Tables.load(spark, TestSpark.Sf, "documents")
      .select(col("doc_id"), col("source"),
        md5(concat(lit("cap:"), col("doc_id").cast("string"))
          .cast("binary")).as("hk"))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 10)
      .select("source", "doc_id").orderBy("source", "doc_id")
    assert(got.collect().toSeq == ref.collect().toSeq,
      "TopKPerGroup survivors must equal the window-rank reference")
    assert(q(spark, TestSpark.Sf).collect().toSeq == ref.collect().toSeq,
      "the subsample must be deterministic across runs")
  }
}
