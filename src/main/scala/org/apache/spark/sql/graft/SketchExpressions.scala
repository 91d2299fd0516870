package org.apache.spark.sql.graft

import org.apache.datasketches.kll.KllDoublesSketch
import org.apache.datasketches.memory.Memory
import org.apache.datasketches.quantilescommon.QuantileSearchCriteria

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.trees.{BinaryLike, UnaryLike}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** Mergeable QUANTILE sketches (Datasketches KLL) as native catalyst
  * aggregates — the percentile analog of the HLL distinct-count tables in
  * [[graft.ext.Sketches]]. Spark ships `percentile_approx`, but its
  * intermediate state is not exposed as a persistable column, so a
  * percentile table cannot be MAINTAINED — every run re-reads the corpus.
  * A KLL sketch is a few KB per group, aggregates with map-side partial
  * combine (this class IS the partial-combine: `merge` runs on executor-
  * local buffers before the exchange), serializes to a binary column, and
  * merges losslessly in rank-error terms — so a committed sketch table is
  * updated by sketching ONLY the delta and merging, the
  * [[graft.ext.Sketches.mergeSketchTables]] discipline.
  *
  * k=200 → normalized rank error ≈ 1.65% (two-sided), ~5 KB serialized.
  * KLL compaction is randomized (per Datasketches' design), so two runs'
  * sketch BYTES may differ while every answered quantile stays inside the
  * rank-error bound — specs pin the bound and the exact n, never bytes.
  */
case class KllSketchAgg(
    child: Expression,
    k: Int = 200,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[KllDoublesSketch] with UnaryLike[Expression] {

  override def prettyName: String = "kll_sketch_agg"
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false

  override def createAggregationBuffer(): KllDoublesSketch =
    KllDoublesSketch.newHeapInstance(k)

  override def update(buf: KllDoublesSketch, input: InternalRow): KllDoublesSketch = {
    val v = child.eval(input)
    if (v != null) buf.update(v.asInstanceOf[Double])
    buf
  }

  override def merge(buf: KllDoublesSketch, other: KllDoublesSketch): KllDoublesSketch = {
    buf.merge(other)
    buf
  }

  override def eval(buf: KllDoublesSketch): Any = buf.toByteArray

  override def serialize(buf: KllDoublesSketch): Array[Byte] = buf.toByteArray
  override def deserialize(bytes: Array[Byte]): KllDoublesSketch =
    KllDoublesSketch.heapify(Memory.wrap(bytes))

  override def withNewMutableAggBufferOffset(o: Int): KllSketchAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): KllSketchAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildInternal(c: Expression): KllSketchAgg =
    copy(child = c)
}

/** Re-aggregate SERIALIZED KLL sketches (binary column → merged binary):
  * the rollup step when a sketch table is re-grouped to a coarser key, or
  * when per-batch sketch rows are compacted into one row per group.
  */
case class KllMergeAgg(
    child: Expression,
    k: Int = 200,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[KllDoublesSketch] with UnaryLike[Expression] {

  override def prettyName: String = "kll_merge_agg"
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false

  override def createAggregationBuffer(): KllDoublesSketch =
    KllDoublesSketch.newHeapInstance(k)

  override def update(buf: KllDoublesSketch, input: InternalRow): KllDoublesSketch = {
    val v = child.eval(input)
    if (v != null)
      buf.merge(KllDoublesSketch.heapify(Memory.wrap(v.asInstanceOf[Array[Byte]])))
    buf
  }

  override def merge(buf: KllDoublesSketch, other: KllDoublesSketch): KllDoublesSketch = {
    buf.merge(other)
    buf
  }

  override def eval(buf: KllDoublesSketch): Any = buf.toByteArray

  override def serialize(buf: KllDoublesSketch): Array[Byte] = buf.toByteArray
  override def deserialize(bytes: Array[Byte]): KllDoublesSketch =
    KllDoublesSketch.heapify(Memory.wrap(bytes))

  override def withNewMutableAggBufferOffset(o: Int): KllMergeAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): KllMergeAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildInternal(c: Expression): KllMergeAgg =
    copy(child = c)
}

/** Scalar: quantile values at the given ranks from a serialized sketch.
  * Null for an empty sketch (no data ⇒ no quantiles). Off the hot path
  * (runs once per GROUP row, not per input row) — CodegenFallback is fine.
  */
case class KllQuantiles(child: Expression, probs: Seq[Double])
  extends Expression with CodegenFallback with UnaryLike[Expression] {
  require(probs.nonEmpty && probs.forall(p => p >= 0.0 && p <= 1.0),
    s"ranks must be within [0,1], got $probs")

  override def prettyName: String = "kll_quantiles"
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def nullable: Boolean = true

  override def eval(input: InternalRow): Any = {
    val v = child.eval(input)
    if (v == null) return null
    val sk = KllDoublesSketch.heapify(Memory.wrap(v.asInstanceOf[Array[Byte]]))
    if (sk.isEmpty) null
    else new GenericArrayData(
      probs.map(p => sk.getQuantile(p, QuantileSearchCriteria.INCLUSIVE)).toArray)
  }

  override protected def withNewChildInternal(c: Expression): KllQuantiles =
    copy(child = c)
}

/** Scalar: exact stream length recorded by a serialized sketch (KLL
  * tracks n exactly — the invariant maintenance specs pin).
  */
case class KllN(child: Expression)
  extends Expression with CodegenFallback with UnaryLike[Expression] {
  override def prettyName: String = "kll_n"
  override def dataType: DataType = LongType
  override def nullable: Boolean = true

  override def eval(input: InternalRow): Any = {
    val v = child.eval(input)
    if (v == null) null
    else KllDoublesSketch.heapify(Memory.wrap(v.asInstanceOf[Array[Byte]])).getN
  }

  override protected def withNewChildInternal(c: Expression): KllN = copy(child = c)
}

/** Scalar: merge two serialized sketches into one (the pairwise step in
  * a full-outer sketch-table merge, where one side may be null).
  */
case class KllUnionPair(left: Expression, right: Expression)
  extends BinaryExpression with CodegenFallback with BinaryLike[Expression] {
  override def prettyName: String = "kll_union"
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = left.nullable && right.nullable

  override def eval(input: InternalRow): Any = {
    val a = left.eval(input)
    val b = right.eval(input)
    if (a == null) return b
    if (b == null) return a
    val sa = KllDoublesSketch.heapify(Memory.wrap(a.asInstanceOf[Array[Byte]]))
    sa.merge(KllDoublesSketch.heapify(Memory.wrap(b.asInstanceOf[Array[Byte]])))
    sa.toByteArray
  }

  override protected def withNewChildrenInternal(l: Expression, r: Expression): KllUnionPair =
    copy(left = l, right = r)
}
