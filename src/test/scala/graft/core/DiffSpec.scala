package graft.core

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.TestSpark

/** The CDC diff algebra invariants (SURVEY.md §5.2):
  *  - round trip: diffApply(diff(i, e), i) == e
  *  - diff(a, a) classifies everything unchanged
  *  - kinds partition the key space
  */
class DiffSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val key = Seq("id")
  private val cols = Seq("v", "w")

  private def df(rows: (Int, String, Double)*) =
    rows.toDF("id", "v", "w")

  test("classify: changed/new/deleted/unchanged") {
    val internal = df((1, "a", 1.0), (2, "b", 2.0), (3, "c", 3.0))
    val external = df((1, "a", 1.0), (2, "B", 2.0), (4, "d", 4.0))
    val kinds = Diff.classify(internal, external, key, cols)
      .collect().map(r => r.getInt(0) -> r.getString(1)).toMap
    assert(kinds == Map(1 -> "unchanged", 2 -> "changed", 3 -> "deleted", 4 -> "new"))
  }

  test("diff of a table with itself is all unchanged") {
    val a = df((1, "a", 1.0), (2, "b", 2.0))
    val kinds = Diff.classify(a, a, key, cols).select("kind").distinct().collect()
    assert(kinds.map(_.getString(0)).toSeq == Seq("unchanged"))
  }

  test("round trip: apply(diff(i, e), i) == e on the lineitem fixture") {
    val e = graft.queries.Fixture.external(spark, TestSpark.Sf)
    val i = graft.queries.Fixture.internal(spark, TestSpark.Sf)
    val applied = Diff.diffApply(i, e, graft.queries.Fixture.Key, graft.queries.Fixture.DataCols)
    assert(applied.exceptAll(e).isEmpty && e.exceptAll(applied).isEmpty)
  }

  test("null-position signatures do not collide") {
    val a = Seq((1, null.asInstanceOf[String], "x")).toDF("id", "v", "w")
    val b = Seq((1, "x", null.asInstanceOf[String])).toDF("id", "v", "w")
    val sa = a.select(Signatures.md5Sig(Seq(col("v"), col("w")))).first().getString(0)
    val sb = b.select(Signatures.md5Sig(Seq(col("v"), col("w")))).first().getString(0)
    assert(sa != sb)
  }

  test("null keys: round trip holds and null-key rows match null-safely") {
    // one null-key row on each side with the same payload: must classify
    // 'unchanged' (not deleted+new), and the round trip must hold
    val internal = Seq((Some(1), "a", 1.0), (None, "n", 5.0))
      .toDF("id", "v", "w")
    val external = Seq((Some(1), "a", 1.0), (None, "n2", 5.0))
      .toDF("id", "v", "w")
    val kinds = Diff.classify(internal, external, key, cols)
      .collect().map(r => (if (r.isNullAt(0)) -99 else r.getInt(0)) -> r.getString(1)).toMap
    assert(kinds == Map(1 -> "unchanged", -99 -> "changed"))
    val applied = Diff.diffApply(internal, external, key, cols)
    assert(applied.exceptAll(external).isEmpty && external.exceptAll(applied).isEmpty)
    // the changed null-key row's OLD version must land in the changelog:
    // captureOld joins null-safely like the rest of the algebra, or the
    // upsert overwrites it with no history trail
    val changed = Diff.classify(internal, external, key, cols)
      .filter(col("kind") === "changed")
    val old = Changelog.captureOld(internal, changed, key).collect()
    assert(old.length == 1 && old.head.isNullAt(0) && old.head.getString(1) == "n")
  }

  test("nullSafe=false fails fast on a null key instead of silently mis-classifying") {
    val internal = Seq((Some(1), "a", 1.0), (None, "n", 5.0)).toDF("id", "v", "w")
    val external = Seq((Some(1), "a", 1.0), (None, "n", 5.0)).toDF("id", "v", "w")
    val ex = intercept[Exception] {
      Diff.classify(internal, external, key, cols, nullSafe = false).collect()
    }
    def messages(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(e => Option(e.getMessage).toSeq ++ messages(e.getCause))
    assert(messages(ex).exists(_.contains("null value in key 'id'")))
  }

  test("nullSafe=false guard covers every join operator, both sides") {
    // the guard lives in nsCond (left keys) + rightKeys (right keys), so
    // upsertReplace/semiJoinChanged/antiJoinDeleted can't silently
    // mis-join a null key either (a null-key old row would otherwise
    // survive an upsert AND its replacement would append — duplicates)
    val withNull = Seq((Some(1), "a", 1.0), (None, "n", 5.0)).toDF("id", "v", "w")
    val clean    = Seq((Some(2), "b", 2.0)).toDF("id", "v", "w")
    def messages(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(e => Option(e.getMessage).toSeq ++ messages(e.getCause))
    for (q <- Seq(
        () => Diff.upsertReplace(withNull, clean, key, nullSafe = false),  // left
        () => Diff.upsertReplace(clean, withNull, key, nullSafe = false),  // right
        () => Diff.semiJoinChanged(withNull, clean, key, nullSafe = false),
        () => Diff.antiJoinDeleted(withNull, clean, key, nullSafe = false),
        () => Diff.antiJoinDeleted(clean, withNull, key, nullSafe = false))) {
      val ex = intercept[Exception](q().collect())
      assert(messages(ex).exists(_.contains("null value in key 'id'")),
        s"expected fail-fast, got: ${messages(ex).take(2).mkString(" | ")}")
    }
  }

  test("upsertReplace: new version wins, unmatched rows survive") {
    val old = df((1, "a", 1.0), (2, "b", 2.0))
    val repl = df((2, "B", 9.0), (3, "c", 3.0))
    val out = Diff.upsertReplace(old, repl, key)
      .collect().map(r => (r.getInt(0), r.getString(1))).toSet
    assert(out == Set((1, "a"), (2, "B"), (3, "c")))
  }
}
