package graft.tools

/** Round-over-round bench comparison: reads two bench records (the JSON
  * line `graft.Bench` writes) and reports per-query median ratios,
  * flagging regressions past a threshold. Exists because of the r7
  * postmortem: a harness config change silently inflated the committed
  * CDC-family medians 4-10× and nothing in the toolchain compared the
  * new record against the previous one — the regression was only caught
  * by the round judge. `BenchDiff old.json new.json` makes that check a
  * one-liner before committing a record.
  *
  * Exit 1 on any flagged regression. Queries only in one record are
  * listed but never flagged (new queries are not regressions). Queries
  * whose single_run marker is set in EITHER record are reported with a
  * `~` (cold single samples, not medians — ratio is advisory). Pure JVM
  * — no Spark session; safe to run next to anything.
  */
object BenchDiff {
  private val FlagRatio = 2.0
  // below this many seconds a ratio is noise, not a signal: a 0.2 s
  // query tripling costs nothing and flags constantly on box heat
  private val MinSeconds = 1.0

  private def parse(path: String): (Map[String, Double], Set[String]) = {
    val txt = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(path)), "UTF-8")
    def objectOf(key: String): Map[String, Double] = {
      val m = s""""$key"\\s*:\\s*\\{([^}]*)\\}""".r.findFirstMatchIn(txt)
      m.map(_.group(1)).getOrElse("")
        .split(",").toSeq.map(_.trim).filter(_.nonEmpty)
        .flatMap { kv =>
          kv.split(":") match {
            case Array(k, v) =>
              v.trim.toDoubleOption.map(k.trim.stripPrefix("\"").stripSuffix("\"") -> _)
            case _ => None
          }
        }.toMap
    }
    def arrayOf(key: String): Set[String] = {
      val m = s""""$key"\\s*:\\s*\\[([^\\]]*)\\]""".r.findFirstMatchIn(txt)
      m.map(_.group(1)).getOrElse("")
        .split(",").toSeq.map(_.trim.stripPrefix("\"").stripSuffix("\""))
        .filter(_.nonEmpty).toSet
    }
    (objectOf("queries"), arrayOf("single_run"))
  }

  def main(args: Array[String]): Unit = {
    require(args.length == 2, "usage: BenchDiff <old.json> <new.json>")
    if (run(args(0), args(1)) > 0) sys.exit(1)
  }

  /** Compare two records, print the report, return the regression count
    * (separated from main so specs can drive it without sys.exit).
    */
  def run(oldPath: String, newPath: String): Int = {
    val (oldQ, oldSingle) = parse(oldPath)
    val (newQ, newSingle) = parse(newPath)
    // an unparseable record must be an ERROR, not a silent "0 shared
    // queries → no regressions": the whole point of this tool is that a
    // record-shape change cannot pass unnoticed
    require(oldQ.nonEmpty,
      s"$oldPath: no 'queries' map parsed — record missing or format changed")
    require(newQ.nonEmpty,
      s"$newPath: no 'queries' map parsed — record missing or format changed")
    val shared = (oldQ.keySet & newQ.keySet).toSeq.sorted
    val flagged = scala.collection.mutable.ListBuffer.empty[String]
    println(f"${"query"}%-34s ${"old"}%8s ${"new"}%8s ${"ratio"}%7s")
    shared.foreach { q =>
      val (o, n) = (oldQ(q), newQ(q))
      val ratio = if (o > 0) n / o else Double.PositiveInfinity
      val cold = if (oldSingle(q) || newSingle(q)) "~" else " "
      val flag =
        if (n >= MinSeconds && o >= MinSeconds / FlagRatio &&
            ratio > FlagRatio && cold == " ") { flagged += q; " <-- REGRESSION" }
        else ""
      println(f"$q%-34s $o%8.2f $n%8.2f $ratio%7.2f$cold$flag")
    }
    (newQ.keySet -- oldQ.keySet).toSeq.sorted
      .foreach(q => println(f"$q%-34s ${"-"}%8s ${newQ(q)}%8.2f   (new)"))
    (oldQ.keySet -- newQ.keySet).toSeq.sorted
      .foreach(q => println(f"$q%-34s ${oldQ(q)}%8.2f ${"-"}%8s   (removed)"))
    val oldSum = shared.map(oldQ).sum
    val newSum = shared.map(newQ).sum
    println(f"shared-query median sum: old $oldSum%.1f s, new $newSum%.1f s " +
      f"(${newSum / math.max(oldSum, 1e-9)}%.2fx)")
    if (flagged.nonEmpty)
      System.err.println(s"[benchdiff] ${flagged.size} regression(s) past " +
        s"${FlagRatio}x: ${flagged.mkString(", ")}")
    flagged.size
  }
}
