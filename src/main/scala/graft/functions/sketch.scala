package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.graft.{Bridge, KllMergeAgg, KllN, KllQuantiles, KllSketchAgg, KllUnionPair}

/** Column-API wrappers over the KLL quantile-sketch aggregates and
  * scalars (see org.apache.spark.sql.graft.SketchExpressions).
  */
object sketch {
  /** Aggregate: KLL doubles sketch of `v` (cast to double), serialized. */
  def kll_agg(v: Column, k: Int = 200): Column =
    Bridge.column(KllSketchAgg(Bridge.expression(v.cast("double")), k)
      .toAggregateExpression())

  /** Aggregate: merge serialized sketches into one. */
  def kll_merge_agg(s: Column, k: Int = 200): Column =
    Bridge.column(KllMergeAgg(Bridge.expression(s), k).toAggregateExpression())

  /** Quantile values at `probs` from a serialized sketch. */
  def kll_quantiles(s: Column, probs: Seq[Double]): Column =
    Bridge.column(KllQuantiles(Bridge.expression(s), probs))

  /** Exact stream length recorded by a serialized sketch. */
  def kll_n(s: Column): Column = Bridge.column(KllN(Bridge.expression(s)))

  /** Pairwise merge of two serialized sketches (null-tolerant). */
  def kll_union(a: Column, b: Column): Column =
    Bridge.column(KllUnionPair(Bridge.expression(a), Bridge.expression(b)))
}
