package org.apache.spark.sql.graft

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Codegen'd product-quantization kernels (SURVEY.md §7.5 similarity
  * search). PQ splits a d-dim vector into `m` subvectors of `dsub` dims,
  * quantizing each against its own `ks`-centroid codebook: a vector
  * becomes `m` bytes (64-dim float32 → 8 bytes = 32× compression), and a
  * query scores a code with `m` table lookups instead of `d` multiplies
  * (asymmetric distance computation, ADC). The codebook rides into the
  * generated code as a plan-referenced float[] — no UDF, no boxing, and
  * both kernels stay inside whole-stage codegen.
  */

/** Encode a float vector to its `m`-byte PQ code. Codebook layout:
  * `codebook[(j*ks + c)*dsub + t]` = dim `t` of centroid `c` of subspace
  * `j`. Ties in the per-subspace argmin keep the lowest centroid id —
  * deterministic across runs and engines.
  */
case class PqEncode(child: Expression, codebook: Array[Float],
                    m: Int, ks: Int, dsub: Int)
    extends UnaryExpression with ExpectsInputTypes {
  require(m > 0 && ks > 0 && ks <= 256 && dsub > 0)
  require(codebook.length == m * ks * dsub)
  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(FloatType))
  override def dataType: DataType = BinaryType
  override def prettyName: String = "pq_encode"

  override def nullSafeEval(v: Any): Any = {
    val a = v.asInstanceOf[ArrayData]
    val out = new Array[Byte](m)
    var j = 0
    while (j < m) {
      var best = 0
      var bestD = Double.MaxValue
      var c = 0
      while (c < ks) {
        val base = (j * ks + c) * dsub
        var dist = 0.0
        var t = 0
        while (t < dsub) {
          val diff = a.getFloat(j * dsub + t).toDouble - codebook(base + t)
          dist += diff * diff
          t += 1
        }
        if (dist < bestD) { bestD = dist; best = c }
        c += 1
      }
      out(j) = best.toByte
      j += 1
    }
    out
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cb = ctx.addReferenceObj("pqCodebook", codebook, "float[]")
    nullSafeCodeGen(ctx, ev, a => {
      val out = ctx.freshName("out")
      val j = ctx.freshName("j")
      val c = ctx.freshName("c")
      val t = ctx.freshName("t")
      val best = ctx.freshName("best")
      val bestD = ctx.freshName("bestD")
      val dist = ctx.freshName("dist")
      val diff = ctx.freshName("diff")
      val base = ctx.freshName("base")
      s"""
         |byte[] $out = new byte[$m];
         |for (int $j = 0; $j < $m; $j++) {
         |  int $best = 0;
         |  double $bestD = Double.MAX_VALUE;
         |  for (int $c = 0; $c < $ks; $c++) {
         |    int $base = ($j * $ks + $c) * $dsub;
         |    double $dist = 0.0;
         |    for (int $t = 0; $t < $dsub; $t++) {
         |      double $diff = (double) $a.getFloat($j * $dsub + $t) - (double) $cb[$base + $t];
         |      $dist += $diff * $diff;
         |    }
         |    if ($dist < $bestD) { $bestD = $dist; $best = $c; }
         |  }
         |  $out[$j] = (byte) $best;
         |}
         |${ev.value} = $out;
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** ADC score: sum over subspaces of `lut[j*ks + code[j]]`, where `lut`
  * is the query's precomputed table of subspace partial dot products
  * (array<float>, length m*ks). `m` table lookups per (query, code) pair
  * — the PQ speedup over the d-multiply exact dot.
  */
case class PqLutScore(left: Expression, right: Expression, ks: Int)
    extends BinaryExpression with ExpectsInputTypes {
  require(ks > 0 && ks <= 256)
  override def inputTypes: Seq[AbstractDataType] =
    Seq(ArrayType(FloatType), BinaryType)
  override def dataType: DataType = DoubleType
  override def prettyName: String = "pq_lut_score"

  override def nullSafeEval(l: Any, r: Any): Any = {
    val lut = l.asInstanceOf[ArrayData]
    val code = r.asInstanceOf[Array[Byte]]
    var s = 0.0
    var j = 0
    while (j < code.length) {
      s += lut.getFloat(j * ks + (code(j) & 0xFF)).toDouble
      j += 1
    }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (lut, code) => {
      val s = ctx.freshName("s")
      val j = ctx.freshName("j")
      s"""
         |double $s = 0.0;
         |for (int $j = 0; $j < $code.length; $j++) {
         |  $s += (double) $lut.getFloat($j * $ks + ($code[$j] & 0xFF));
         |}
         |${ev.value} = $s;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}
