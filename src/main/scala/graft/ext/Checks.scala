package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Declarative data-quality constraint suite (extension beyond reference
  * parity, SURVEY.md §7.5) — the Deequ/"unit tests for data" shape: a
  * list of constraints over one table evaluated in a SINGLE aggregation
  * pass, each yielding a metric in [0, 1] and a pass/fail against its
  * threshold. The reference replicates tables on trust (updater's MySQL
  * rows are assumed well-formed); a 100 TB ingest can't — a constraint
  * sweep is the admission gate a production pipeline runs on every batch
  * before committing it.
  *
  * Scale shape:
  *  - ALL row-local constraints (completeness, bounds, value sets) fold
  *    into ONE `agg` over the table: one scan, one 1-row result, however
  *    many constraints. Adding a constraint adds a column to the partial
  *    aggregate, not a pass over the data.
  *  - [[Check.Unique]] adds a `count(distinct struct)` to the same agg —
  *    Spark plans it as one Expand + two-stage aggregate, still a single
  *    scan of the table.
  *  - [[Check.RefIn]] (referential containment) is the one join-shaped
  *    constraint: a left join against the DISTINCT reference keys,
  *    folded into the same scan's lineage before the aggregate. The
  *    reference side shrinks to its key cardinality before shuffling.
  *  - the long-format result is exploded from the single agg row on the
  *    driver side of the plan — constraint count is O(10), never data.
  *
  * Determinism (the oracle contract): every metric is
  * `round(sum(indicator)::double / count::double, 6)` — an IEEE division
  * of identical integers on any engine — and `passed` compares the
  * ROUNDED metric against the threshold, so the flag crosses engines too.
  */
object Checks {
  sealed trait Check {
    /** Stable constraint id — must render identically in the oracle SQL. */
    def name: String
    /** Minimum metric to pass (default: all rows satisfy it). */
    def threshold: Double
  }
  /** Completeness: fraction of non-null values. */
  final case class NotNull(column: String, threshold: Double = 1.0) extends Check {
    def name = s"not_null($column)"
  }
  /** Numeric range (inclusive, compared as doubles on both engines). */
  final case class Between(column: String, lo: Double, hi: Double,
                           threshold: Double = 1.0) extends Check {
    def name = s"between($column,$lo,$hi)"
  }
  /** Accepted-value set for a string column. */
  final case class InSet(column: String, values: Seq[String],
                         threshold: Double = 1.0) extends Check {
    def name = s"in_set($column)"
  }
  /** Key uniqueness: distinct(columns) / count. */
  final case class Unique(columns: Seq[String], threshold: Double = 1.0) extends Check {
    def name = s"unique(${columns.mkString(",")})"
  }
  /** Referential containment: fraction of rows whose `column` exists in
    * `ref.refColumn` (the foreign-key direction: child ⊆ parent).
    */
  final case class RefIn(column: String, ref: DataFrame, refColumn: String,
                         threshold: Double = 1.0) extends Check {
    def name = s"ref_in($column)"
  }

  /** Additive constraint STATE for one batch: long-format
    * (chk STRING, s BIGINT, n BIGINT) — the satisfied-row count and the
    * row count per constraint. Counts are additive, so a committed
    * state table is maintained by [[mergeStates]] over each delta's
    * state — the sketch-table discipline ([[Sketches]]) applied to data
    * quality: per-batch admission metrics at 100 TB without ever
    * re-scanning the corpus. [[Unique]] is NOT additive (distinctness
    * doesn't sum) and is rejected here — maintain it approximately with
    * an HLL register table instead (`profile_constraints_incremental`
    * composes [[Sketches.md5HllRegisters]] for exactly that).
    * [[RefIn]] indicators are evaluated against the parent AS OF the
    * batch — the honest CDC semantics (a parent key added later does
    * not retroactively bless an old orphan).
    */
  def state(df: DataFrame, checks: Seq[Check]): DataFrame = {
    require(!checks.exists(_.isInstanceOf[Unique]),
      "Unique is not additive — use an HLL register table for incremental uniqueness")
    val one = aggRow(df, checks)
    val rows = checks.zipWithIndex.map { case (chk, i) =>
      struct(lit(chk.name).as("chk"), col(s"__m_$i").cast("long").as("s"),
        col("__n").as("n"))
    }
    one.select(explode(array(rows: _*)).as("c"))
      .select(col("c.chk").as("chk"), col("c.s").as("s"), col("c.n").as("n"))
  }

  /** The maintenance step: committed ∪ delta, per-constraint SUM.
    * Exact and associative — merged ≡ from-scratch bit-for-bit.
    */
  def mergeStates(a: DataFrame, b: DataFrame): DataFrame =
    a.unionByName(b).groupBy("chk").agg(sum("s").as("s"), sum("n").as("n"))

  /** Metrics from a (possibly merged) state table: the same
    * (chk, metric, passed) contract as [[run]]. Thresholds join from the
    * check list by constraint id.
    */
  def metricsFromState(st: DataFrame, checks: Seq[Check]): DataFrame = {
    val thr = checks.foldRight(lit(null).cast("double")) { (c, acc) =>
      when(col("chk") === c.name, lit(c.threshold)).otherwise(acc)
    }
    val metric = round(col("s").cast("double") / col("n").cast("double"), 6)
    st.select(col("chk"), metric.as("metric"),
        (metric >= thr).cast("int").as("passed"))
      .orderBy("chk")
  }

  /** Evaluate `checks` over `df` in one pass: a long-format frame
    * (chk STRING, metric DOUBLE, passed INT), one row per constraint,
    * ordered by constraint id.
    */
  def run(df: DataFrame, checks: Seq[Check]): DataFrame = {
    val one = aggRow(df, checks)
    // explode the 1-row aggregate into long format
    val rows = checks.zipWithIndex.map { case (chk, i) =>
      val metric = round(col(s"__m_$i").cast("double") / col("__n").cast("double"), 6)
      struct(lit(chk.name).as("chk"), metric.as("metric"),
        (metric >= lit(chk.threshold)).cast("int").as("passed"))
    }
    one.select(explode(array(rows: _*)).as("c"))
      .select(col("c.chk").as("chk"), col("c.metric").as("metric"),
        col("c.passed").as("passed"))
      .orderBy("chk")
  }

  /** The shared single-pass aggregate: one row with `__n` (row count)
    * and `__m_i` (constraint i's numerator). RefIn joins fold into the
    * scanned frame first — each adds one found-flag column via a left
    * join against the DISTINCT ref keys.
    */
  private def aggRow(df: DataFrame, checks: Seq[Check]): DataFrame = {
    require(checks.nonEmpty, "empty constraint suite")
    val (joined, refFlags) = checks.zipWithIndex.foldLeft((df, Map.empty[String, String])) {
      case ((acc, flags), (RefIn(c, ref, rc, _), i)) =>
        val flag = s"__ref_$i"
        val keys = ref.select(col(rc).as(s"__refkey_$i")).distinct()
        (acc.join(keys, acc(c) === col(s"__refkey_$i"), "left_outer")
          .withColumn(flag, col(s"__refkey_$i").isNotNull.cast("long"))
          .drop(s"__refkey_$i"), flags + (s"ref_$i" -> flag))
      case ((acc, flags), _) => (acc, flags)
    }
    // ONE aggregate computes every constraint's numerator (plus the row
    // count); indicators sum as longs, ratios divide once at the end
    def ind(c: Column) = sum(c.cast("long"))
    val aggs = count(lit(1)).as("__n") +: checks.zipWithIndex.map {
      case (NotNull(c, _), i)        => ind(col(c).isNotNull).as(s"__m_$i")
      case (Between(c, lo, hi, _), i) =>
        ind(col(c).cast("double").between(lo, hi)).as(s"__m_$i")
      case (InSet(c, vs, _), i)      => ind(col(c).isin(vs: _*)).as(s"__m_$i")
      case (Unique(cols, _), i)      =>
        countDistinct(struct(cols.map(col): _*)).as(s"__m_$i")
      case (RefIn(_, _, _, _), i)    => sum(col(refFlags(s"ref_$i"))).as(s"__m_$i")
    }
    joined.agg(aggs.head, aggs.tail: _*)
  }
}
