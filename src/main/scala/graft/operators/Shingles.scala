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

/** Single-pass winnowing kernel (gram md5 + sliding window minima +
  * distinct) — the composed formula it replaces ran THREE nested
  * interpreted higher-order lambdas per row (transform(md5) over grams,
  * transform(sequence) over windows, array_min over each slice) and was
  * the dominant cost of the t15/t24 fingerprint pipelines. Exact parity
  * with `array_distinct(transform(sequence(1, n-w+1), i =>
  * array_min(slice(transform(grams, g -> substr(md5(g),1,16)), i, w))))`
  * over `Shingles.all(text, k)` — same gram tokenization (the
  * [[ShingleUtil.wordShingles]] multiplicity kernel), same md5-hex
  * prefix-16 hash, lexicographic window minima (= `array_min` on hex
  * strings), keep-first distinct, and `[]` when the document has fewer
  * than w grams (the caller's explode then yields no rows, matching the
  * old `.filter(size(h) >= w)`). */
object WinnowUtil {
  private val md = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }
  private val HEX = "0123456789abcdef".toCharArray

  /** First 16 hex chars of md5(gram bytes) — matches Spark's
    * `substring(md5(g), 1, 16)`. */
  private def md5Prefix16(g: UTF8String): String = {
    val d = md.get()
    d.reset()
    val h = d.digest(g.getBytes)
    val out = new Array[Char](16)
    var i = 0
    while (i < 8) {
      out(2 * i) = HEX((h(i) >> 4) & 0xf)
      out(2 * i + 1) = HEX(h(i) & 0xf)
      i += 1
    }
    new String(out)
  }

  def winnowMd5(s: UTF8String, k: Int, w: Int): ArrayData = {
    val grams = ShingleUtil.wordShingles(s, k, distinct = false)
    val n = grams.numElements()
    if (n < w) return new GenericArrayData(Array.empty[Any])
    val hashes = new Array[String](n)
    var i = 0
    while (i < n) { hashes(i) = md5Prefix16(grams.getUTF8String(i)); i += 1 }
    val seen = new java.util.LinkedHashSet[String]()
    i = 0
    while (i <= n - w) {
      // O(n·w) window minima: w is small (4 in the declared queries) and
      // the strings are interned prefixes — a deque wouldn't pay for
      // itself at these widths
      var min = hashes(i)
      var j = 1
      while (j < w) {
        val h = hashes(i + j)
        if (h.compareTo(min) < 0) min = h
        j += 1
      }
      seen.add(min)
      i += 1
    }
    val out = new Array[Any](seen.size())
    val it = seen.iterator()
    var p = 0
    while (it.hasNext) { out(p) = UTF8String.fromString(it.next()); p += 1 }
    new GenericArrayData(out)
  }
}

/** Codegen'd `winnow_md5(text, k, w) -> array<string>`: the distinct
  * winnowing fingerprint set of the document (md5-prefix16 hash family).
  * NULL text yields `[]` (never NULL), like [[WordShingles]]. */
case class WinnowMd5(child: Expression, k: Int, w: Int)
    extends UnaryExpression {
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullable: Boolean = false
  override def eval(input: InternalRow): Any = {
    val v = child.eval(input)
    WinnowUtil.winnowMd5(
      if (v == null) null else v.asInstanceOf[UTF8String], k, w)
  }
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val c = child.genCode(ctx)
    ev.copy(
      code = c.code + code"""
        org.apache.spark.sql.catalyst.util.ArrayData ${ev.value} =
          graft.operators.WinnowUtil.winnowMd5(
            ${c.isNull} ? null : ${c.value}, $k, $w);""",
      isNull = FalseLiteral)
  }
  override protected def withNewChildInternal(c: Expression): WinnowMd5 =
    copy(child = c)
  override def prettyName: String = "winnow_md5"
}

/** Single-pass chunking kernel: non-overlapping `n`-token chunks of the
  * `\s+`-tokenized text (the [[graft.operators.TextAnalysis.tokens]]
  * semantics — strip the full Java `\s` class from both ends, split on
  * `\s+`, empty/whitespace-only text → no tokens), space-joined. The
  * composed formula (tokens → transform(sequence) → slice → concat_ws)
  * was three interpreted lambdas per row and ~40% of the chunk-dedup
  * pipeline. Empty text yields `[]` (caller's explode emits no rows). */
object TokenChunksUtil {
  def chunks(s: UTF8String, n: Int): ArrayData = {
    if (s == null) return new GenericArrayData(Array.empty[Any])
    val stripped = s.toString.replaceAll("^\\s+|\\s+$", "")
    if (stripped.isEmpty) return new GenericArrayData(Array.empty[Any])
    val toks = stripped.split("\\s+")
    val nChunks = (toks.length + n - 1) / n
    val out = new Array[Any](nChunks)
    val sb = new java.lang.StringBuilder()
    var c = 0
    while (c < nChunks) {
      sb.setLength(0)
      var j = c * n
      val end = math.min(j + n, toks.length)
      while (j < end) {
        if (j > c * n) sb.append(' ')
        sb.append(toks(j))
        j += 1
      }
      out(c) = UTF8String.fromString(sb.toString)
      c += 1
    }
    new GenericArrayData(out)
  }
}

/** Codegen'd `token_chunks(text, n) -> array<string>`; NULL text yields
  * `[]` (never NULL), like [[WordShingles]]. */
case class TokenChunks(child: Expression, n: Int) extends UnaryExpression {
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullable: Boolean = false
  override def eval(input: InternalRow): Any = {
    val v = child.eval(input)
    TokenChunksUtil.chunks(
      if (v == null) null else v.asInstanceOf[UTF8String], n)
  }
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val c = child.genCode(ctx)
    ev.copy(
      code = c.code + code"""
        org.apache.spark.sql.catalyst.util.ArrayData ${ev.value} =
          graft.operators.TokenChunksUtil.chunks(
            ${c.isNull} ? null : ${c.value}, $n);""",
      isNull = FalseLiteral)
  }
  override protected def withNewChildInternal(c: Expression): TokenChunks =
    copy(child = c)
  override def prettyName: String = "token_chunks"
}

object Shingles {
  /** Column API: distinct w-token shingles of the text. */
  def of(text: Column, w: Int): Column =
    ExpressionUtils.column(WordShingles(ExpressionUtils.expression(text), w))

  /** Non-overlapping n-token chunks (single-pass kernel). */
  def tokenChunks(text: Column, n: Int): Column =
    ExpressionUtils.column(TokenChunks(ExpressionUtils.expression(text), n))

  /** Multiplicity-preserving variant: EVERY w-gram occurrence, in document
    * order — the n-gram-repetition counting input. */
  def all(text: Column, w: Int): Column =
    ExpressionUtils.column(
      WordShingles(ExpressionUtils.expression(text), w, distinct = false))

  /** Winnowing fingerprint set (single-pass kernel; see [[WinnowUtil]]). */
  def winnow(text: Column, k: Int, w: Int): Column =
    ExpressionUtils.column(WinnowMd5(ExpressionUtils.expression(text), k, w))
}
