package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types.{AbstractDataType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** The leading 60 bits of `md5(child)` as a long — the arithmetic twin of
  * the portable-hash chain `CAST(conv(substr(md5(s),1,15),16,10) AS BIGINT)`
  * (graft.functions.PortableHash.h60), bit-identical on every input.
  *
  * Why it exists (optimization guide §1.2 "per-task work" / §4 "prefer
  * codegen-friendly expressions"): the public chain allocates a 32-char hex
  * string (md5), a 15-char substring, and a decimal string (conv) per hash,
  * and `conv` re-parses that string — all to extract 60 bits the digest
  * already holds. Every dedup/fingerprint operator hashes each shingle of
  * each document through this path, so the string churn is the dominant
  * per-task cost of the whole dedup family. This expression digests the
  * UTF-8 bytes directly and assembles the long from the first 7.5 bytes:
  * no intermediate strings, no base-16 re-parse, and a straight static call
  * in generated code.
  *
  * Semantics (null → null, UTF-8 bytes, 60-bit non-negative result) match
  * the chain exactly; equality is pinned by PortableHashSpec over ASCII,
  * multi-byte UTF-8, empty and long inputs.
  */
case class PortableH60(child: Expression)
  extends UnaryExpression with ExpectsInputTypes {
  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = LongType
  override def nullSafeEval(input: Any): Any =
    PortableMd5.h60(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"org.apache.spark.sql.graft.PortableMd5.h60($c)")
  override protected def withNewChildInternal(newChild: Expression): PortableH60 =
    copy(child = newChild)
  override def prettyName: String = "graft_h60"
}

object PortableMd5 {
  private val md = ThreadLocal.withInitial[java.security.MessageDigest](() =>
    java.security.MessageDigest.getInstance("MD5"))

  /** md5 of the UTF-8 bytes, leading 60 bits (15 hex chars) as a long. */
  def h60(s: UTF8String): Long = {
    val d = md.get()
    d.reset()
    val bytes = d.digest(s.getBytes)
    var v = 0L
    var i = 0
    while (i < 7) { v = (v << 8) | (bytes(i) & 0xffL); i += 1 }
    (v << 4) | ((bytes(7) & 0xf0L) >>> 4)
  }

  /** Column form — the drop-in body for PortableHash.h60. Lives here
    * because the Column↔Expression bridge (ExpressionUtils) is
    * private[sql]. Composes anywhere a built-in scalar does, including
    * inside higher-order-function lambdas. */
  def h60Col(c: Column): Column =
    ExpressionUtils.column(PortableH60(ExpressionUtils.expression(c)))
}
