package graft.operators

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._

/** EXACT isotonic regression (pool-adjacent-violators) — the score
  * CALIBRATION primitive: map a raw classifier/quality score to the
  * best monotone fit of an observed target (label rate, value), the
  * L2-optimal monotone calibrator (Barlow et al. 1972; the same fit
  * behind sklearn's IsotonicRegression and Spark MLlib's). Data
  * pipelines use it to turn arbitrary model scores into calibrated
  * keep-probabilities without assuming a sigmoid shape.
  *
  * EXACTNESS is the design driver, because the fit must survive the
  * cross-engine hash gate: targets enter as integer `cents` (the w12
  * convention for 2-decimal values), every pooled block is the exact
  * rational (Σcents, Σcnt), and every PAV merge decision is the exact
  * integer cross-multiplication `num_t·den_p < num_p·den_t` — no float
  * ever decides a pool. The fitted value is the ONE division at the
  * end, and since PAV's block average per position equals the minimax
  * value `max_{j≤i} min_{k≥i} avg(j..k)` (a closed form any engine can
  * replay over pooled prefix sums), an independent SQL oracle computes
  * the identical rationals and lands on the identical doubles.
  *
  * Distributed shape: one groupBy pools duplicate scores (equal scores
  * MUST share a fitted value — pooling first makes the fit
  * order-independent), one range exchange sorts the pooled grid, a
  * per-partition PAV stack reduces each partition to its blocks, and a
  * driver-side stack merge stitches partition boundaries (PAV over a
  * concatenation = PAV of the whole, because the stack only ever looks
  * at adjacent averages). The collect is bounded by the TOTAL BLOCK
  * COUNT — worst case the pooled-score cardinality (already-isotonic
  * data never merges), which is why production calibration pools
  * scores into a bounded grid first (the histogram-first convention
  * used by a11/t26); this is also exactly MLlib's contract, stated
  * rather than hidden. Fitted values broadcast back as a tiny range
  * table — the pooled frame never shuffles again.
  */
object Isotonic {

  /** PAV fit of `centsCol` (exact integer target, e.g. value·100)
    * against `scoreCol` (integral scores; the calibration grid).
    * Returns one row per distinct score: (x, n, cents, fitted) with
    * `fitted` = its block's exact rational mean as the one double.
    *
    * `maxBlocks` ENFORCES the driver-collect contract: each partition's
    * residual PAV stack (and the stitched total) must stay within it,
    * or the fit fails loudly instead of silently collecting an
    * unbounded pooled grid — pool high-cardinality raw scores into a
    * bounded grid first (the a27/t26 histogram convention). */
  def isotonicFit(
      df: DataFrame, scoreCol: String, centsCol: String,
      maxBlocks: Int = 1 << 20): DataFrame = {
    val spark = df.sparkSession
    val pooled = df
      .groupBy(col(scoreCol).cast("long").as("x"))
      .agg(sum(col(centsCol).cast("long")).as("cents"),
        count(lit(1)).as("cnt"))
    val p = math.max(1, spark.sessionState.conf.numShufflePartitions)
    val sorted = pooled.repartitionByRange(p, col("x").asc)
      .sortWithinPartitions(col("x").asc)
      .persist()
    // (minX, maxX, num, den) blocks per partition, in partition order
    val collected: Array[(Int, Array[(Long, Long, Long, Long)])] =
      sorted.rdd.mapPartitionsWithIndex { (pi, it) =>
        val stack = new scala.collection.mutable.ArrayBuffer[(Long, Long, Long, Long)]()
        it.foreach { r =>
          push(stack, (r.getLong(0), r.getLong(0), r.getLong(1), r.getLong(2)))
          require(stack.length <= maxBlocks,
            s"isotonicFit: partition $pi holds > $maxBlocks PAV blocks — " +
              "pool scores into a bounded grid before fitting " +
              "(or raise maxBlocks)")
        }
        Iterator.single((pi, stack.toArray))
      }.collect()
    sorted.unpersist(blocking = false)
    // boundary stitch: PAV the concatenated block lists (same stack rule)
    val all = new scala.collection.mutable.ArrayBuffer[(Long, Long, Long, Long)]()
    collected.sortBy(_._1).foreach { case (_, blocks) =>
      blocks.foreach(b => push(all, b))
    }
    require(all.length <= maxBlocks,
      s"isotonicFit: stitched fit holds ${all.length} > $maxBlocks PAV " +
        "blocks — pool scores into a bounded grid before fitting")
    val outSchema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("min_x",
        org.apache.spark.sql.types.LongType, nullable = false),
      org.apache.spark.sql.types.StructField("max_x",
        org.apache.spark.sql.types.LongType, nullable = false),
      org.apache.spark.sql.types.StructField("num",
        org.apache.spark.sql.types.LongType, nullable = false),
      org.apache.spark.sql.types.StructField("den",
        org.apache.spark.sql.types.LongType, nullable = false)))
    val blockRows: java.util.List[Row] = java.util.Arrays.asList(
      all.map(b => Row(b._1, b._2, b._3, b._4)).toSeq: _*)
    val blocks = spark.createDataFrame(blockRows, outSchema)
    // fitted per distinct score: broadcast block-range lookup; the one
    // double division happens on the block's exact (num, den)
    pooled
      .join(broadcast(blocks),
        col("x") >= col("min_x") && col("x") <= col("max_x"))
      .select(col("x"), col("cnt").as("n"), col("cents"),
        (col("num").cast("double") / col("den").cast("double")).as("fitted"))
  }

  /** PAV stack step: append a block, then merge while the top's mean is
    * BELOW its predecessor's — the comparison is the exact integer
    * cross-multiplication via [[Math.multiplyExact]], falling back to
    * BigInt when a product would overflow Long (huge Σcents × block
    * counts), so a merge decision can never flip on a silent wrap. */
  private def push(
      stack: scala.collection.mutable.ArrayBuffer[(Long, Long, Long, Long)],
      b: (Long, Long, Long, Long)): Unit = {
    stack += b
    var done = false
    while (!done && stack.length >= 2) {
      val t = stack(stack.length - 1)
      val s = stack(stack.length - 2)
      // merge iff avg(top) < avg(prev): num_t·den_s < num_s·den_t
      if (meanLess(t._3, t._4, s._3, s._4)) {
        stack.remove(stack.length - 1)
        stack(stack.length - 1) = (s._1, t._2, s._3 + t._3, s._4 + t._4)
      } else done = true
    }
  }

  /** Exact `num_a/den_a < num_b/den_b` for positive denominators:
    * long cross-multiplication when it fits, BigInt otherwise. */
  private[graft] def meanLess(
      numA: Long, denA: Long, numB: Long, denB: Long): Boolean =
    try Math.multiplyExact(numA, denB) < Math.multiplyExact(numB, denA)
    catch {
      case _: ArithmeticException =>
        BigInt(numA) * BigInt(denB) < BigInt(numB) * BigInt(denA)
    }
}
