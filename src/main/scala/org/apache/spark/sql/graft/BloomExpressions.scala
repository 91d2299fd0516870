package org.apache.spark.sql.graft

import org.apache.spark.broadcast.Broadcast
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.util.sketch.BloomFilter

/** Codegen'd membership probe against a BROADCAST Bloom sketch — the
  * scan-stage prefilter behind `text_contamination_bloom` (SURVEY.md
  * §7.5 decontamination). The expression carries only the broadcast
  * HANDLE; each executor deserializes the sketch once, and the probe is
  * a handful of Murmur3 hashes over the value's UTF-8 bytes — no UDF,
  * no boxing, inside whole-stage codegen.
  *
  * Bloom guarantee the caller leans on: NO false negatives — every true
  * member passes — so filtering with this probe before an exact
  * verification join can never change the join's result, only shrink
  * its input by (1 - fpp) of the non-members.
  *
  * Hash-compat contract: the sketch must have been built with
  * `putBinary(utf8Bytes)` over the SAME byte encoding this probe uses
  * (`UTF8String.getBytes`) — [[graft.ext.BloomGate.build]] does exactly
  * that, keeping both sides on util.sketch's own Murmur3 path and
  * independent of any SQL-side hash function.
  */
case class BloomMightContainUtf8(child: Expression, bf: Broadcast[BloomFilter])
    extends UnaryExpression with ExpectsInputTypes {
  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = BooleanType
  override def prettyName: String = "bloom_might_contain"

  override def nullSafeEval(v: Any): Any =
    bf.value.mightContainBinary(v.asInstanceOf[UTF8String].getBytes)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bloomBcast", bf,
      "org.apache.spark.broadcast.Broadcast")
    // deserialize the broadcast once per operator instance, not per row
    val filt = ctx.addMutableState("org.apache.spark.util.sketch.BloomFilter",
      "bloomFilter",
      v => s"$v = (org.apache.spark.util.sketch.BloomFilter) $ref.value();")
    nullSafeCodeGen(ctx, ev, s =>
      s"${ev.value} = $filt.mightContainBinary($s.getBytes());")
  }

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}
