package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Range / interval join — "which intervals contain this point" — as a
  * BUCKETED EQUI-JOIN, the only shape that survives corpus scale.
  *
  * Spark plans a raw `p >= lo AND p <= hi` join condition as a nested-loop
  * (broadcast if one side is small, cartesian otherwise): every point
  * rescans every interval, quadratic at 100 TB. The standard fix, same
  * family as the LSH band trick: quantize the number line into
  * `bucketWidth`-wide buckets, explode each interval to the buckets it
  * overlaps (`sequence(floor(lo/w), floor(hi/w))`), tag each point with
  * its single bucket, EQUI-join on the bucket id, then refine with the
  * exact predicate. The equi-join hashes/broadcasts like any other join —
  * no rescan — and each (point, interval) pair meets in EXACTLY one
  * bucket (the point's), so no distinct pass is needed afterwards.
  *
  * `bucketWidth` tuning is the one scale knob: expansion factor per
  * interval is `(hi-lo)/w + 1` rows, so pick w near the typical interval
  * width — too small explodes the interval side, too large degrades the
  * bucket join toward all-pairs within a bucket. Degenerate inputs
  * (lo > hi) are dropped rather than fed to `sequence` (whose inferred
  * negative step would silently emit a DESCENDING bucket range).
  */
object IntervalJoin {

  /** Inner-join `points` to the `intervals` rows whose [lo, hi] contains
    * the point (both bounds inclusive). Output: every points column plus
    * every intervals column (caller guarantees disjoint names). */
  def pointInInterval(
      points: DataFrame, pointCol: String,
      intervals: DataFrame, loCol: String, hiCol: String,
      bucketWidth: Double): DataFrame = {
    require(bucketWidth > 0, s"bucketWidth must be positive, got $bucketWidth")
    val w = lit(bucketWidth)
    val ivBuckets = intervals
      .filter(col(loCol) <= col(hiCol))
      .withColumn("__bucket",
        explode(sequence(
          floor(col(loCol) / w).cast("long"),
          floor(col(hiCol) / w).cast("long"))))
    val ptBuckets = points
      .withColumn("__bucket", floor(col(pointCol) / w).cast("long"))
    ptBuckets
      .join(ivBuckets, Seq("__bucket"))
      .filter(col(pointCol) >= col(loCol) && col(pointCol) <= col(hiCol))
      .drop("__bucket")
  }

  /** Interval × interval OVERLAP join (`lLo ≤ rHi AND rLo ≤ lHi`, both
    * inclusive) — same bucketed equi-join, plus the exactly-once trick:
    * an overlapping pair co-occupies every bucket their intersection
    * touches, so a naive bucket join emits it once PER shared bucket.
    * Instead each pair is claimed only in the bucket of
    * `max(lLo, rLo)` — the intersection's first bucket, which (floor
    * being monotone) equals `max(floor(lLo/w), floor(rLo/w))` and is
    * covered by BOTH sides whenever they overlap — so no distinct pass
    * and no lost pairs. Column names must be disjoint across sides. */
  def intervalOverlap(
      left: DataFrame, lLoCol: String, lHiCol: String,
      right: DataFrame, rLoCol: String, rHiCol: String,
      bucketWidth: Double): DataFrame = {
    require(bucketWidth > 0, s"bucketWidth must be positive, got $bucketWidth")
    val w = lit(bucketWidth)
    def expand(df: DataFrame, lo: String, hi: String) = df
      .filter(col(lo) <= col(hi))
      .withColumn("__bucket",
        explode(sequence(
          floor(col(lo) / w).cast("long"),
          floor(col(hi) / w).cast("long"))))
    expand(left, lLoCol, lHiCol)
      .join(expand(right, rLoCol, rHiCol), Seq("__bucket"))
      .filter(
        col(lLoCol) <= col(rHiCol) && col(rLoCol) <= col(lHiCol) &&
          col("__bucket") === greatest(
            floor(col(lLoCol) / w).cast("long"),
            floor(col(rLoCol) / w).cast("long")))
      .drop("__bucket")
  }
}
