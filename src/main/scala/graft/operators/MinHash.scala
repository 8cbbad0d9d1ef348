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

/** Single-pass md5-family MinHash kernel — the fast form of the
  * oracle-parity composition `array_min(transform(tokens,
  * md5(concat("i#", t))))` per hash i (k interpreted lambdas per row,
  * each allocating an intermediate hex array). Emits the IDENTICAL
  * 32-hex-char minimum per seed (UTF8 byte compare on lowercase hex ==
  * `array_min` string ordering), so the DuckDB oracle keeps rebuilding
  * the value relationally while the Spark side computes it in one loop.
  * Empty token arrays yield an all-NULL signature (= `array_min([])`). */
object Md5MinHashUtil {
  private val md = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }
  private val HEX = "0123456789abcdef".toCharArray

  // the k seed-prefix byte arrays ("1#".."k#") are a pure function of k —
  // cache them once per k instead of allocating O(tokens × k) throwaway
  // strings inside the kernel loop
  private val prefixCache =
    new java.util.concurrent.ConcurrentHashMap[Integer, Array[Array[Byte]]]()
  private def seedPrefixes(k: Int): Array[Array[Byte]] =
    prefixCache.computeIfAbsent(
      k, _ => Array.tabulate(k)(i => s"${i + 1}#".getBytes("UTF-8")))

  /** Lexicographic compare of two 32-char lowercase-hex buffers — equals
    * String.compareTo (all ASCII), without materializing a String per
    * candidate. */
  private def hexLt(a: Array[Char], b: Array[Char]): Boolean = {
    var i = 0
    while (i < 32) {
      if (a(i) != b(i)) return a(i) < b(i)
      i += 1
    }
    false
  }

  def signature(tokens: ArrayData, k: Int): ArrayData = {
    val prefixes = seedPrefixes(k)
    val mins = new Array[Array[Char]](k)
    val hex = new Array[Char](32) // scratch, cloned only on new-min
    val n = tokens.numElements()
    val d = md.get()
    var t = 0
    while (t < n) {
      val tok = tokens.getUTF8String(t)
      if (tok != null) {
        val tokBytes = tok.getBytes
        var i = 0
        while (i < k) {
          d.reset()
          d.update(prefixes(i))
          d.update(tokBytes)
          val h = d.digest()
          var b = 0
          while (b < 16) {
            hex(2 * b) = HEX((h(b) >> 4) & 0xf)
            hex(2 * b + 1) = HEX(h(b) & 0xf)
            b += 1
          }
          if (mins(i) == null || hexLt(hex, mins(i))) mins(i) = hex.clone()
          i += 1
        }
      }
      t += 1
    }
    new GenericArrayData(mins.map(c =>
      if (c == null) null
      else org.apache.spark.unsafe.types.UTF8String.fromString(new String(c))): Array[Any])
  }
}

/** Codegen'd `md5_minhash(tokens, k) -> array<string>` of length k. */
case class Md5MinHashSignature(child: Expression, numHashes: Int)
    extends UnaryExpression {
  override def dataType: DataType = ArrayType(StringType, containsNull = true)
  override protected def nullSafeEval(v: Any): Any =
    Md5MinHashUtil.signature(v.asInstanceOf[ArrayData], numHashes)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.operators.Md5MinHashUtil.signature($c, $numHashes)")
  override protected def withNewChildInternal(c: Expression): Md5MinHashSignature =
    copy(child = c)
  override def prettyName: String = "md5_minhash_signature"
}

object MinHash {
  /** Column API: k-wide MinHash signature of a token/shingle array. */
  def signature(tokens: Column, numHashes: Int): Column =
    ExpressionUtils.column(MinHashSignature(ExpressionUtils.expression(tokens), numHashes))

  /** Column API: md5-family (oracle-parity) signature — see
    * [[Md5MinHashUtil]]. */
  def md5Signature(tokens: Column, numHashes: Int): Column =
    ExpressionUtils.column(
      Md5MinHashSignature(ExpressionUtils.expression(tokens), numHashes))
}
