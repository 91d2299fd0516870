package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions.sqrt
import org.apache.spark.sql.graft.{Bridge, FloatArrayDot, HyperplaneBucket}

/** Column-API wrappers over the codegen'd vector expressions
  * (see org.apache.spark.sql.graft.VectorExpressions).
  */
object vectors {
  def float_dot(a: Column, b: Column): Column =
    Bridge.column(FloatArrayDot(Bridge.expression(a), Bridge.expression(b)))

  def float_norm(a: Column): Column = sqrt(float_dot(a, a))

  def float_cosine(a: Column, b: Column): Column =
    float_dot(a, b) / (float_norm(a) * float_norm(b))

  def hyperplane_bucket(v: Column, planes: Int): Column =
    Bridge.column(HyperplaneBucket(Bridge.expression(v), planes))
}
