package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._
import org.apache.spark.sql.functions.sqrt

/** Codegen'd vector kernels for the similarity/dedup operators
  * (SURVEY.md §7.5). Spark's higher-order functions (`zip_with` /
  * `aggregate`) are CodegenFallback — interpreted, with per-element boxing
  * — which makes them the bottleneck of pairwise cosine at any scale.
  * These native expressions compile to a tight primitive loop inside
  * whole-stage codegen.
  *
  * Elements are assumed non-null (embedding vectors); a null ARRAY input
  * yields null (standard null-intolerant semantics).
  */
case class FloatArrayDot(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes {
  override def inputTypes: Seq[AbstractDataType] =
    Seq(ArrayType(FloatType), ArrayType(FloatType))
  override def dataType: DataType = DoubleType
  override def prettyName: String = "float_array_dot"

  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    val n = math.min(a.numElements(), b.numElements())
    var s = 0.0
    var i = 0
    while (i < n) { s += a.getFloat(i).toDouble * b.getFloat(i).toDouble; i += 1 }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val s = ctx.freshName("s")
      val i = ctx.freshName("i")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $s = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $s += (double) $a.getFloat($i) * (double) $b.getFloat($i);
         |}
         |${ev.value} = $s;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** Exact int8 dot product over quantized vectors (`array<tinyint>`):
  * integer arithmetic end-to-end, so results are bit-identical across
  * engines — and 4× less memory traffic than float32 at scan time, the
  * standard quantized-ANN trade (rerank survivors with full precision).
  */
case class ByteArrayDot(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes {
  override def inputTypes: Seq[AbstractDataType] =
    Seq(ArrayType(ByteType), ArrayType(ByteType))
  override def dataType: DataType = LongType
  override def prettyName: String = "byte_array_dot"

  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    val n = math.min(a.numElements(), b.numElements())
    var s = 0L
    var i = 0
    while (i < n) { s += a.getByte(i).toLong * b.getByte(i).toLong; i += 1 }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val s = ctx.freshName("s")
      val i = ctx.freshName("i")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |long $s = 0L;
         |for (int $i = 0; $i < $n; $i++) {
         |  $s += (long) $a.getByte($i) * (long) $b.getByte($i);
         |}
         |${ev.value} = $s;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** Random-hyperplane LSH bucket id: bit p of the result is the sign of the
  * dot product with a pseudo-random ±1 hyperplane derived from xxhash64 of
  * ((p + planeOffset) * 1000003 + dimension) with Spark's standard seed 42 —
  * deterministic, no RNG state, identical across runs/cluster layouts.
  * `planeOffset` selects an independent plane family per LSH band
  * (band b uses offset b*planes), enabling banded multi-probe schemes;
  * offset 0 reproduces the historical single-band buckets bit for bit.
  */
case class HyperplaneBucket(child: Expression, planes: Int, planeOffset: Int = 0)
    extends UnaryExpression with ExpectsInputTypes {
  require(planes > 0 && planes <= 30 && planeOffset >= 0)
  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(FloatType))
  override def dataType: DataType = IntegerType
  override def prettyName: String = "hyperplane_bucket"

  override def nullSafeEval(v: Any): Any = {
    val a = v.asInstanceOf[ArrayData]
    val n = a.numElements()
    var bucket = 0
    var p = 0
    while (p < planes) {
      var d = 0.0
      var i = 0
      while (i < n) {
        val h = org.apache.spark.sql.catalyst.expressions.XXH64
          .hashLong((p + planeOffset).toLong * 1000003L + i, 42L)
        val sign = if (((h % 2) + 2) % 2 == 0) 1.0 else -1.0
        d += a.getFloat(i).toDouble * sign
        i += 1
      }
      if (d >= 0) bucket |= (1 << p)
      p += 1
    }
    bucket
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val n = ctx.freshName("n")
      val bucket = ctx.freshName("bucket")
      val p = ctx.freshName("p")
      val i = ctx.freshName("i")
      val d = ctx.freshName("d")
      val h = ctx.freshName("h")
      s"""
         |int $n = $a.numElements();
         |int $bucket = 0;
         |for (int $p = 0; $p < $planes; $p++) {
         |  double $d = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    long $h = org.apache.spark.sql.catalyst.expressions.XXH64
         |      .hashLong((long) ($p + $planeOffset) * 1000003L + $i, 42L);
         |    $d += (double) $a.getFloat($i) * ((($h % 2L) + 2L) % 2L == 0L ? 1.0 : -1.0);
         |  }
         |  if ($d >= 0) $bucket |= (1 << $p);
         |}
         |${ev.value} = $bucket;
       """.stripMargin
    })

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}
