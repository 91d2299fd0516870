package graft.plans

import scala.collection.mutable

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, Descending, Expression, RowOrdering, SortOrder, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnaryNode}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.execution.{SparkPlan, UnaryExecNode}
import org.apache.spark.sql.execution.SparkStrategy
import org.apache.spark.sql.graft.Bridge

/** Custom whole-operator: top-k rows per group — the one operator shape in
  * this engine where Spark's built-ins genuinely can't express the right
  * physical plan (SURVEY.md §7.3 escape hatch (c)).
  *
  * The built-in formulation (`row_number().over(Window.partitionBy(g)
  * .orderBy(o)) <= k`) must SORT every partition fully: O(n log n) work
  * and O(n) sort buffer per partition, spilling at scale. This operator
  * keeps one bounded heap of k rows per group: O(n log k), memory
  * O(groups_per_partition × k) — independent of corpus size, which is
  * what a 100 TB ANN rerank needs.
  *
  * Pieces: logical node → planner strategy (injected via the public
  * `spark.experimental.extraStrategies`) → physical exec declaring
  * `ClusteredDistribution` so EnsureRequirements inserts the hash
  * exchange. Rows within a group are emitted heap-ordered (arbitrary);
  * callers wanting ranked output sort the (tiny) result.
  */
case class TopKPerGroup(groupExprs: Seq[Expression], order: Seq[SortOrder],
                        k: Int, child: LogicalPlan) extends UnaryNode {
  override def output: Seq[Attribute] = child.output
  override protected def withNewChildInternal(c: LogicalPlan): TopKPerGroup =
    copy(child = c)
}

case class TopKPerGroupExec(groupExprs: Seq[Expression], order: Seq[SortOrder],
                            k: Int, child: SparkPlan) extends UnaryExecNode {
  override def output: Seq[Attribute] = child.output

  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(groupExprs) :: Nil

  override def outputPartitioning: Partitioning = child.outputPartitioning

  override protected def doExecute(): RDD[InternalRow] = {
    val schema = child.output
    val groupE = groupExprs
    val orderE = order
    val kk = k
    child.execute().mapPartitions({ iter =>
      val keyProj = UnsafeProjection.create(groupE, schema)
      // BaseOrdering: row a "before" b  <=>  compare(a, b) < 0 under `order`
      val ord = RowOrdering.create(orderE, schema)
      // max-heap under ord: head = worst of the kept k → O(log k) evict
      implicit val rowOrd: Ordering[InternalRow] =
        (a: InternalRow, b: InternalRow) => ord.compare(a, b)
      val heaps = mutable.HashMap.empty[UnsafeRow, mutable.PriorityQueue[InternalRow]]
      iter.foreach { row =>
        val key = keyProj(row)
        val heap = heaps.get(key) match {
          case Some(h) => h
          case None =>
            val h = mutable.PriorityQueue.empty[InternalRow]
            heaps.put(key.copy(), h)
            h
        }
        if (heap.size < kk) heap.enqueue(row.copy())
        else if (ord.compare(row, heap.head) < 0) {
          heap.dequeue()
          heap.enqueue(row.copy())
        }
      }
      heaps.valuesIterator.flatMap(_.iterator)
    }, preservesPartitioning = true)
  }

  override protected def withNewChildInternal(c: SparkPlan): TopKPerGroupExec =
    copy(child = c)
}

object TopKStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case TopKPerGroup(g, o, k, child) =>
      TopKPerGroupExec(g, o, k, planLater(child)) :: Nil
    case _ => Nil
  }
}

/** Column-level API. */
object TopK {
  private def ensureStrategy(spark: SparkSession): Unit = {
    if (!spark.experimental.extraStrategies.contains(TopKStrategy))
      spark.experimental.extraStrategies =
        spark.experimental.extraStrategies :+ TopKStrategy
    if (!spark.experimental.extraOptimizations.contains(PushFilterThroughTopK))
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ PushFilterThroughTopK
  }

  /** First `k` rows of each group under `orderBy` (name, ascending?)
    * ordering — semantically `ORDER BY ... LIMIT k` per group. Always
    * include a unique tiebreaker column for deterministic results.
    */
  def perGroup(df: DataFrame, groupCols: Seq[String],
               orderBy: Seq[(String, Boolean)], k: Int): DataFrame = {
    val spark = df.sparkSession
    ensureStrategy(spark)
    val analyzed = df.queryExecution.analyzed
    def attr(n: String): Attribute = analyzed.output
      .find(_.name == n)
      .getOrElse(throw new IllegalArgumentException(
        s"column $n not in ${analyzed.output.map(_.name)}"))
    val g = groupCols.map(attr)
    val o = orderBy.map { case (n, asc) =>
      SortOrder(attr(n), if (asc) Ascending else Descending) }
    Bridge.ofRows(spark, TopKPerGroup(g, o, k, analyzed))
  }
}
