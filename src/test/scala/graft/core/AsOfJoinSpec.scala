package graft.core

import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

class AsOfJoinSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("latest at-or-before match per key; no match yields nulls") {
    def t(s: String) = java.sql.Timestamp.valueOf(s)
    val quotes = Seq( // key, time, px
      (1L, t("2024-01-01 10:00:00"), 100.0),
      (1L, t("2024-01-01 10:05:00"), 101.0),
      (2L, t("2024-01-01 10:02:00"), 200.0)
    ).toDF("qk", "qt", "px")
    val trades = Seq( // key, time
      (1L, t("2024-01-01 10:03:00")), // after 10:00 quote -> 100.0
      (1L, t("2024-01-01 10:05:00")), // exactly at 10:05 -> inclusive, 101.0
      (2L, t("2024-01-01 10:01:00")), // before any quote of key 2 -> null
      (3L, t("2024-01-01 12:00:00"))  // key with no quotes at all -> null
    ).toDF("tk", "tt")
    val got = AsOfJoin.asofLE(trades, quotes, "tk", "qk", "tt", "qt", Seq("px"))
      .collect().map(r => (r.getLong(0), r.getTimestamp(1).toString, Option(r.get(2)))).toSet
    assert(got == Set(
      (1L, "2024-01-01 10:03:00.0", Some(100.0)),
      (1L, "2024-01-01 10:05:00.0", Some(101.0)),
      (2L, "2024-01-01 10:01:00.0", None),
      (3L, "2024-01-01 12:00:00.0", None)))
  }

  test("null keys never match (DuckDB ASOF equality semantics)") {
    def t(s: String) = java.sql.Timestamp.valueOf(s)
    val right = Seq(
      (Some(1L), t("2024-01-01 10:00:00"), 100.0),
      (None,     t("2024-01-01 09:00:00"), 666.0) // null-key right row
    ).toDF("qk", "qt", "px")
    val left = Seq(
      (Some(1L), t("2024-01-01 11:00:00")),
      (None,     t("2024-01-01 11:00:00")) // null-key left row: no match
    ).toDF("tk", "tt")
    val got = AsOfJoin.asofLE(left, right, "tk", "qk", "tt", "qt", Seq("px"))
      .collect().map(r => (Option(r.get(0)), Option(r.get(2)))).toSet
    assert(got == Set((Some(1L), Some(100.0)), (None, None)))
  }
}
