package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions.{round, sqrt, transform}
import org.apache.spark.sql.graft.{Bridge, ByteArrayDot, FloatArrayDot, HyperplaneBucket, PqEncode, PqLutScore}

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

  /** Band `band`'s bucket from an independent hyperplane family — the
    * building block of banded (multi-table) hyperplane LSH, where a pair
    * is a candidate if ANY band agrees: recall 1-(1-p^planes)^bands
    * instead of the single-table p^planes.
    */
  def hyperplane_bucket_band(v: Column, planes: Int, band: Int): Column =
    Bridge.column(HyperplaneBucket(Bridge.expression(v), planes, band * planes))

  /** Symmetric int8 quantization of a unit-scale float vector:
    * q = round(x * 127) as tinyint — 4× smaller at rest and in shuffle.
    * Map-side HOF; runs once per row, off the pairwise hot path.
    */
  def quantize_int8(v: Column): Column =
    transform(v, x => round(x.cast("double") * 127).cast("tinyint"))

  /** Exact integer dot over int8-quantized vectors (codegen'd). */
  def int8_dot(a: Column, b: Column): Column =
    Bridge.column(ByteArrayDot(Bridge.expression(a), Bridge.expression(b)))

  /** Product-quantization encode: d-dim float vector → m-byte code
    * against the flat `codebook` (layout `[(j*ks+c)*dsub + t]`).
    */
  def pq_encode(v: Column, codebook: Array[Float], m: Int, ks: Int, dsub: Int): Column =
    Bridge.column(PqEncode(Bridge.expression(v), codebook, m, ks, dsub))

  /** ADC score of a PQ code against a query's precomputed lookup table
    * (array<float> of length m*ks): m lookups instead of d multiplies.
    */
  def pq_lut_score(lut: Column, code: Column, ks: Int): Column =
    Bridge.column(PqLutScore(Bridge.expression(lut), Bridge.expression(code), ks))

  /** Cosine over quantized vectors: integer dots, so bit-identical in
    * any engine with the same quantizer.
    */
  def int8_cosine(a: Column, b: Column): Column =
    int8_dot(a, b).cast("double") /
      (sqrt(int8_dot(a, a).cast("double")) * sqrt(int8_dot(b, b).cast("double")))
}
