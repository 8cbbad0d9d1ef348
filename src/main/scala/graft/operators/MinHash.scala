package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.{Bridge => ExpressionUtils}
import org.apache.spark.sql.types._

/** Single-pass MinHash kernel. A composed
  * `array_min(transform(tokens, xxhash64))` per hash is a higher-order
  * function — CodegenFallback, interpreted lambda per element, k passes
  * over the array. This expression computes ALL k mins in one tight loop
  * over the token bytes with seeded XXH64 — the measured difference on the
  * bench corpus is ~10x.
  */
object MinHashUtil {
  def signature(tokens: ArrayData, k: Int): ArrayData = {
    val mins = new Array[Long](k)
    java.util.Arrays.fill(mins, Long.MaxValue)
    val n = tokens.numElements()
    var t = 0
    while (t < n) {
      val s = tokens.getUTF8String(t)
      if (s != null) {
        var i = 0
        while (i < k) {
          val h = XXH64.hashUnsafeBytes(s.getBaseObject, s.getBaseOffset, s.numBytes(), i + 1L)
          if (h < mins(i)) mins(i) = h
          i += 1
        }
      }
      t += 1
    }
    new GenericArrayData(mins)
  }
}

/** Codegen'd `minhash(tokens, k) -> array<long>` of length k. */
case class MinHashSignature(child: Expression, numHashes: Int)
    extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override protected def nullSafeEval(v: Any): Any =
    MinHashUtil.signature(v.asInstanceOf[ArrayData], numHashes)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.operators.MinHashUtil.signature($c, $numHashes)")
  override protected def withNewChildInternal(c: Expression): MinHashSignature = copy(child = c)
  override def prettyName: String = "minhash_signature"
}

object MinHash {
  /** Column API: k-wide MinHash signature of a token/shingle array. */
  def signature(tokens: Column, numHashes: Int): Column =
    ExpressionUtils.column(MinHashSignature(ExpressionUtils.expression(tokens), numHashes))
}
