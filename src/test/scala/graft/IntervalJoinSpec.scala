package graft

import graft.operators.IntervalJoin
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The bucketed interval join must equal the naive inequality join on
  * every input — including bucket-boundary points, inclusive endpoints,
  * negative values, and intervals spanning many buckets — and must never
  * emit a (point, interval) pair twice. */
class IntervalJoinSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  test("bucketed join ≡ naive inequality join, no duplicate pairs") {
    import spark.implicits._
    val rnd = new scala.util.Random(42)
    val points = (0 until 400)
      .map(i => (i.toLong, rnd.nextDouble() * 200 - 100))
      .toDF("p_id", "p")
    // widths from 0 (degenerate single-point interval) to ~30 (spans
    // many width-5 buckets); a few inverted lo>hi rows must drop silently
    val intervals = (0 until 300).map { i =>
      val lo = rnd.nextDouble() * 200 - 100
      val hi = if (i % 50 == 49) lo - 1 else lo + rnd.nextDouble() * 30
      (i.toLong, lo, hi)
    }.toDF("iv_id", "lo", "hi")
    val bucketed = IntervalJoin
      .pointInInterval(points, "p", intervals, "lo", "hi", bucketWidth = 5.0)
      .select("p_id", "iv_id").collect().map(r => (r.getLong(0), r.getLong(1)))
    val naive = points.crossJoin(intervals)
      .filter(col("p") >= col("lo") && col("p") <= col("hi"))
      .select("p_id", "iv_id").collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(bucketed.length == bucketed.distinct.length, "duplicate pairs emitted")
    assert(bucketed.sorted.toSeq == naive.sorted.toSeq)
  }

  test("intervalOverlap ≡ naive overlap join, exactly-once across shared buckets") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    def gen(n: Int, idBase: Int) = (0 until n).map { i =>
      val lo = rnd.nextDouble() * 100 - 50
      (idBase + i.toLong, lo, lo + rnd.nextDouble() * 25) // spans many width-5 buckets
    }
    val left = gen(250, 0).toDF("l_id", "l_lo", "l_hi")
    val right = gen(250, 1000).toDF("r_id", "r_lo", "r_hi")
    val bucketed = IntervalJoin
      .intervalOverlap(left, "l_lo", "l_hi", right, "r_lo", "r_hi", bucketWidth = 5.0)
      .select("l_id", "r_id").collect().map(r => (r.getLong(0), r.getLong(1)))
    val naive = left.crossJoin(right)
      .filter(col("l_lo") <= col("r_hi") && col("r_lo") <= col("l_hi"))
      .select("l_id", "r_id").collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(bucketed.length == bucketed.distinct.length,
      "pair emitted in more than one shared bucket")
    assert(bucketed.sorted.toSeq == naive.sorted.toSeq)
  }

  test("skew guard: planted hot bucket triggers the salt grid, result set unchanged") {
    import spark.implicits._
    // 60k points AT ONE VALUE (the classic zero/epoch pile-up) plus a
    // uniform tail — the probe must fire and the grid must return the
    // same pair SET the clean path would, exactly once each
    val rnd = new scala.util.Random(11)
    val points = ((0 until 60000).map(i => (i.toLong, 42.0)) ++
      (60000 until 60400).map(i => (i.toLong, rnd.nextDouble() * 200 - 100)))
      .toDF("p_id", "p")
    val intervals = (0 until 120).map { i =>
      val lo = rnd.nextDouble() * 200 - 100
      (i.toLong, lo, lo + rnd.nextDouble() * 30)
    }.toDF("iv_id", "lo", "hi")
    // tiny ceiling forces the guarded path even for the uniform tail
    val guarded = IntervalJoin
      .pointInInterval(points, "p", intervals, "lo", "hi",
        bucketWidth = 5.0, bucketCeiling = 256)
      .select("p_id", "iv_id").collect().map(r => (r.getLong(0), r.getLong(1)))
    val naive = points.crossJoin(intervals)
      .filter(col("p") >= col("lo") && col("p") <= col("hi"))
      .select("p_id", "iv_id").collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(guarded.length == guarded.distinct.length, "grid duplicated a pair")
    assert(guarded.sorted.toSeq == naive.sorted.toSeq)
  }

  test("skew guard on intervalOverlap: hot stack of identical intervals, exactly-once") {
    import spark.implicits._
    val rnd = new scala.util.Random(13)
    // 3k identical left intervals over one bucket + a uniform right side
    val left = ((0 until 3000).map(i => (i.toLong, 10.0, 12.0)) ++
      (3000 until 3050).map { i =>
        val lo = rnd.nextDouble() * 100 - 50
        (i.toLong, lo, lo + rnd.nextDouble() * 25)
      }).toDF("l_id", "l_lo", "l_hi")
    val right = (0 until 200).map { i =>
      val lo = rnd.nextDouble() * 100 - 50
      (1000000 + i.toLong, lo, lo + rnd.nextDouble() * 25)
    }.toDF("r_id", "r_lo", "r_hi")
    val guarded = IntervalJoin
      .intervalOverlap(left, "l_lo", "l_hi", right, "r_lo", "r_hi",
        bucketWidth = 5.0, bucketCeiling = 128)
      .select("l_id", "r_id").collect().map(r => (r.getLong(0), r.getLong(1)))
    val naive = left.crossJoin(right)
      .filter(col("l_lo") <= col("r_hi") && col("r_lo") <= col("l_hi"))
      .select("l_id", "r_id").collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(guarded.length == guarded.distinct.length,
      "pair emitted in more than one (bucket, cell)")
    assert(guarded.sorted.toSeq == naive.sorted.toSeq)
  }

  test("inclusive endpoints and exact bucket boundaries match") {
    import spark.implicits._
    val points = Seq((1L, 10.0), (2L, 15.0), (3L, 20.0), (4L, 20.0000001))
      .toDF("p_id", "p")
    val intervals = Seq((7L, 10.0, 20.0)).toDF("iv_id", "lo", "hi")
    val got = IntervalJoin
      .pointInInterval(points, "p", intervals, "lo", "hi", bucketWidth = 10.0)
      .select("p_id").collect().map(_.getLong(0)).sorted.toSeq
    assert(got == Seq(1L, 2L, 3L)) // both endpoints in, just-outside out
  }
}
