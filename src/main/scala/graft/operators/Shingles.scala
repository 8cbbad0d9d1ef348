package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode, FalseLiteral}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.{Bridge => ExpressionUtils}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Single-pass word-shingle kernel. The composed formula —
  * `array_distinct(transform(sequence(...), i => concat_ws(" ",
  * slice(toks, i, w))))` — is a higher-order function: CodegenFallback,
  * an interpreted lambda dispatch plus a fresh slice array and concat per
  * shingle per row. This kernel lowercases, splits, and builds the
  * distinct shingle set in one tight loop; it is the dominant per-row
  * cost of the MinHash-LSH dedup pipeline.
  *
  * Exact parity with the old formula (asserted in tests):
  * `split(lower(text), " ")` keeps interior AND trailing empty tokens
  * (Java regex split, limit -1), shingles are space-joined runs of `w`
  * consecutive tokens, de-duplicated keeping first occurrence, documents
  * with fewer than `w` tokens (and NULL text) shingle to `[]`.
  */
object ShingleUtil {
  def wordShingles(s: UTF8String, w: Int): ArrayData =
    wordShingles(s, w, distinct = true)

  /** `distinct = false` keeps EVERY w-gram occurrence in document order —
    * the repetition-measurement variant ([[graft.operators.TextAnalysis
    * .ngramRepetitionStats]] counts gram multiplicity, which a set
    * destroys). Same lower/split/join semantics as the distinct kernel. */
  def wordShingles(s: UTF8String, w: Int, distinct: Boolean): ArrayData = {
    if (s == null) return new GenericArrayData(Array.empty[Any])
    // UTF8String.toLowerCase == Spark's lower(); String.split(" ", -1)
    // == Spark's split(str, " ") (regex split, trailing empties KEPT)
    val toks = s.toLowerCase.toString.split(" ", -1)
    if (toks.length < w) return new GenericArrayData(Array.empty[Any])
    // LinkedHashSet for the distinct variant (keep-first order), ArrayList
    // for the multiplicity-preserving one — both emit in document order
    val seen: java.util.Collection[String] =
      if (distinct) new java.util.LinkedHashSet[String]()
      else new java.util.ArrayList[String](toks.length - w + 1)
    val sb = new java.lang.StringBuilder()
    var i = 0
    while (i <= toks.length - w) {
      sb.setLength(0)
      var j = 0
      while (j < w) {
        if (j > 0) sb.append(' ')
        sb.append(toks(i + j))
        j += 1
      }
      seen.add(sb.toString)
      i += 1
    }
    val out = new Array[Any](seen.size())
    val it = seen.iterator()
    var k = 0
    while (it.hasNext) { out(k) = UTF8String.fromString(it.next()); k += 1 }
    new GenericArrayData(out)
  }
}

/** Codegen'd `word_shingles(text, w) -> array<string>`: w-token shingles
  * of the lowercased, space-split text — distinct (keep-first) by default,
  * every occurrence when `distinct = false`. NULL text yields `[]` (never
  * NULL), matching the composed formula it replaces — hence the custom
  * eval/doGenCode instead of the null-propagating nullSafe pair. */
case class WordShingles(child: Expression, width: Int, distinct: Boolean = true)
    extends UnaryExpression {
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullable: Boolean = false
  override def eval(input: InternalRow): Any = {
    val v = child.eval(input)
    ShingleUtil.wordShingles(
      if (v == null) null else v.asInstanceOf[UTF8String], width, distinct)
  }
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val c = child.genCode(ctx)
    ev.copy(
      code = c.code + code"""
        org.apache.spark.sql.catalyst.util.ArrayData ${ev.value} =
          graft.operators.ShingleUtil.wordShingles(
            ${c.isNull} ? null : ${c.value}, $width, $distinct);""",
      isNull = FalseLiteral)
  }
  override protected def withNewChildInternal(c: Expression): WordShingles =
    copy(child = c)
  override def prettyName: String = "word_shingles"
}

object Shingles {
  /** Column API: distinct w-token shingles of the text. */
  def of(text: Column, w: Int): Column =
    ExpressionUtils.column(WordShingles(ExpressionUtils.expression(text), w))

  /** Multiplicity-preserving variant: EVERY w-gram occurrence, in document
    * order — the n-gram-repetition counting input. */
  def all(text: Column, w: Int): Column =
    ExpressionUtils.column(
      WordShingles(ExpressionUtils.expression(text), w, distinct = false))
}
