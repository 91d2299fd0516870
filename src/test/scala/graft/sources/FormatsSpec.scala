package graft.sources

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Cross-format round-trip fidelity (sources/Formats.scala). The Catalog
  * entries gate the aggregate view cross-engine; this spec pins the
  * row-level contracts the aggregates summarize — including the one
  * lossy corner a text format genuinely has.
  */
class FormatsSpec extends AnyFunSuite {
  private lazy val spark = graft.TestSpark.spark
  private def tmp(tag: String): String =
    java.nio.file.Files.createTempDirectory(s"graft_fmt_$tag").toString

  private def rows(df: org.apache.spark.sql.DataFrame): Set[Row] =
    df.collect().toSet

  test("orc round trip is row-exact on a real fixture slice") {
    val li = graft.core.Tables.load(spark, graft.TestSpark.Sf, "lineitem").limit(500)
    val rt = Formats.roundTrip(li, "orc", tmp("orc"))
    assert(rt.schema == li.schema)
    assert(rows(rt) == rows(li))
  }

  test("json round trip is row-exact including timestamps and doubles") {
    val o = graft.core.Tables.load(spark, graft.TestSpark.Sf, "orders").limit(300)
    val rt = Formats.roundTrip(o, "json", tmp("json"))
    assert(rows(rt) == rows(o))
  }

  test("csv round trip keeps NULL distinct from the empty string") {
    import spark.implicits._
    val df = Seq(
      (1L, Option("plain")),
      (2L, Option("")),       // empty string, NOT null
      (3L, Option.empty[String]),
      (4L, Option("x"))).toDF("id", "v")
    val rt = Formats.roundTrip(df, "csv", tmp("null")).orderBy("id")
    val got = rt.select("v").collect().map(r => Option(r.getString(0)))
    assert(got.toSeq == Seq(Some("plain"), Some(""), None, Some("x")))
  }

  test("csv round trip survives embedded delimiter, quote, and newline") {
    import spark.implicits._
    val nasty = Seq(
      (1L, "a,b"), (2L, "say \"hi\""), (3L, "line1\nline2"),
      (4L, "mix,\"q\"\nend"), (5L, "plain")).toDF("id", "v")
    val rt = Formats.roundTrip(nasty, "csv", tmp("nasty"))
    assert(rows(rt) == rows(nasty))
  }

  test("csv null sentinel collision is the documented lossy corner") {
    import spark.implicits._
    // a field whose VALUE is the two characters \N is indistinguishable
    // from the null sentinel on read — the known, documented ambiguity of
    // schema-less text (Formats scaladoc says: such data belongs in a
    // binary format). Pin the behavior so a silent change is caught.
    val df = Seq((1L, "\\N")).toDF("id", "v")
    val rt = Formats.roundTrip(df, "csv", tmp("sentinel"))
    assert(rt.collect().head.isNullAt(1))
  }

  test("permissive csv read captures malformed rows instead of failing") {
    val dir = tmp("dirty")
    val f = java.nio.file.Paths.get(dir, "d.csv")
    java.nio.file.Files.write(f,
      "id,v\n1,ok\nnot_a_long,boom\n3,fine\n".getBytes("UTF-8"))
    val schema = StructType(Seq(
      StructField("id", LongType), StructField("v", StringType),
      StructField("_corrupt_record", StringType)))
    val read = spark.read.option("header", "true").schema(schema)
      .option("mode", "PERMISSIVE").option("columnNameOfCorruptRecord", "_corrupt_record")
      .csv(dir).cache()
    try {
      assert(read.filter(col("_corrupt_record").isNotNull).count() == 1)
      assert(read.filter(col("_corrupt_record").isNull).count() == 2)
      // collect (not count): a bare count prunes every column, the CSV
      // parser then never parses `id`, and the malformed row is invisible
      val dropped = spark.read.option("header", "true")
        .schema(StructType(schema.dropRight(1)))
        .option("mode", "DROPMALFORMED").csv(dir)
      assert(dropped.collect().length == 2)
    } finally read.unpersist()
  }
}
