package org.apache.spark.sql.graft

import org.apache.spark.sql.SparkSessionExtensions

/** Test-support: inspect what a `SparkSessionExtensions => Unit` package
  * registered (the builders are `private[sql]`, hence this lives in the
  * sql package tree).
  */
object ExtensionProbe {
  def probe(ext: SparkSessionExtensions => Unit): Map[String, Boolean] = {
    val e = new SparkSessionExtensions
    ext(e)
    val session = org.apache.spark.sql.SparkSession.active
      .asInstanceOf[org.apache.spark.sql.classic.SparkSession]
    Map(
      "strategy" -> e.buildPlannerStrategies(session)
        .exists(_.getClass.getName.contains("TopKStrategy")),
      "rule" -> e.buildOptimizerRules(session)
        .exists(_.getClass.getName.contains("PushFilterThroughTopK")),
      "functions" -> {
        val fr = org.apache.spark.sql.catalyst.analysis.FunctionRegistry.builtin.clone()
        e.registerFunctions(fr)
        fr.functionExists(org.apache.spark.sql.catalyst.FunctionIdentifier("float_dot")) &&
          fr.functionExists(org.apache.spark.sql.catalyst.FunctionIdentifier("hyperplane_bucket"))
      }
    )
  }
}
