package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode, FalseLiteral}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.graft.{Bridge => ExpressionUtils}
import org.apache.spark.sql.types.{DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** Aho–Corasick multi-pattern matcher — ONE pass over the text counts
  * every occurrence of every pattern (all end positions, overlaps and
  * duplicate patterns included), where the naive `k × contains()` plan
  * is O(n·k) per row and misses occurrence counts entirely. At corpus
  * scale a blocklist is hundreds-to-thousands of phrases; this is the
  * kernel that keeps that scan single-pass.
  *
  * The automaton is built ONCE on the driver (goto trie with
  * binary-searched child arrays, BFS failure links, and fail-chain
  * aggregated output counts — so matching never walks the fail chain to
  * count, one O(1) lookup per char after amortized-constant fallback
  * steps) and ships to executors inside the expression as a plain
  * serialized object of primitive arrays. */
final class AcAutomaton(patterns: Array[String]) extends Serializable {

  // flat trie, frozen to primitive arrays after the mutable build
  private val (childChars, childNodes, failArr, outArr) = {
    import scala.collection.mutable
    val kids = mutable.ArrayBuffer(mutable.TreeMap.empty[Char, Int])
    val ends = mutable.ArrayBuffer(0L)
    for (p <- patterns if p.nonEmpty) {
      var node = 0
      var i = 0
      while (i < p.length) {
        val c = p.charAt(i)
        node = kids(node).getOrElse(c, {
          kids += mutable.TreeMap.empty[Char, Int]
          ends += 0L
          val fresh = kids.length - 1
          kids(node)(c) = fresh
          fresh
        })
        i += 1
      }
      ends(node) += 1L // duplicate patterns count with multiplicity
    }
    val n = kids.length
    val fail = new Array[Int](n)
    val out = ends.toArray
    val queue = mutable.Queue.empty[Int]
    kids(0).values.foreach { v => fail(v) = 0; queue += v }
    while (queue.nonEmpty) {
      val u = queue.dequeue()
      for ((c, v) <- kids(u)) {
        var f = fail(u)
        while (f != 0 && !kids(f).contains(c)) f = fail(f)
        fail(v) = if (kids(f).contains(c) && kids(f)(c) != v) kids(f)(c) else 0
        out(v) += out(fail(v)) // fail-chain totals pre-aggregated
        queue += v
      }
    }
    val cc = Array.tabulate(n)(i => kids(i).keys.toArray)
    val cn = Array.tabulate(n)(i => kids(i).values.toArray)
    (cc, cn, fail, out)
  }

  private def step(node: Int, c: Char): Int = {
    var cur = node
    while (true) {
      val chars = childChars(cur)
      var lo = 0
      var hi = chars.length - 1
      var found = -1
      while (lo <= hi) {
        val mid = (lo + hi) >>> 1
        if (chars(mid) == c) { found = mid; lo = hi + 1 }
        else if (chars(mid) < c) lo = mid + 1
        else hi = mid - 1
      }
      if (found >= 0) return childNodes(cur)(found)
      if (cur == 0) return 0
      cur = failArr(cur)
    }
    0 // unreachable
  }

  /** Total occurrences of all patterns at all end positions. */
  def countAll(text: UTF8String): Long = {
    if (text == null) return 0L
    val s = text.toString
    var node = 0
    var total = 0L
    var i = 0
    while (i < s.length) {
      node = step(node, s.charAt(i))
      total += outArr(node)
      i += 1
    }
    total
  }
}

/** Codegen'd total-occurrence count of a pattern set in a string column
  * (Aho–Corasick, see [[AcAutomaton]]). NULL text counts 0 hits (never
  * NULL) — the expression is non-nullable like [[WordShingles]], matching
  * [[AcAutomaton.countAll]]'s explicit null→0 handling, so downstream
  * `flagged = n_hits > k` stays a real boolean on null rows. */
case class AcCountMatches(child: Expression, patterns: Seq[String])
    extends UnaryExpression {
  @transient private lazy val ac = new AcAutomaton(patterns.toArray)
  override def dataType: DataType = LongType
  override def nullable: Boolean = false
  override def eval(input: InternalRow): Any = {
    val v = child.eval(input)
    ac.countAll(if (v == null) null else v.asInstanceOf[UTF8String])
  }
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val acRef = ctx.addReferenceObj("ac", ac, classOf[AcAutomaton].getName)
    val c = child.genCode(ctx)
    ev.copy(
      code = c.code + code"""
        long ${ev.value} = $acRef.countAll(${c.isNull} ? null : ${c.value});""",
      isNull = FalseLiteral)
  }
  override protected def withNewChildInternal(c: Expression): AcCountMatches =
    copy(child = c)
  override def prettyName: String = "ac_count_matches"
}

object MultiMatch {
  /** Column API: total occurrences of `patterns` in `text` — one pass
    * whatever the pattern count. */
  def countMatches(text: Column, patterns: Seq[String]): Column = {
    require(patterns.nonEmpty, "countMatches needs at least one pattern")
    ExpressionUtils.column(
      AcCountMatches(ExpressionUtils.expression(text), patterns))
  }
}
