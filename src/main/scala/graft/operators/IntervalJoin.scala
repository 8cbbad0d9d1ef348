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
  *
  * SKEW GUARD: a bucket holding k rows of one side and m of the other
  * emits k·m rows IN ONE TASK — the same quadratic family the near-dup
  * hot-bucket guard (`Dedup.sampledHotProbe`) exists for, and real
  * numeric columns pile up on popular values (epoch boundaries, price
  * points, zero). Both joins here gate on a seeded 2%-sampled existence
  * probe per side: the clean path is the untouched single-shuffle
  * equi-join (no extra exchange, ~2% probe tax); when a sampled bucket
  * crosses the ceiling, the join switches to a SALT-GRID — per hot
  * bucket, each side is cut into `ceil(n/ceiling)` salt cells (own salt
  * from a uniform row hash) and replicated across the OTHER side's
  * cells, so the equi-join key becomes (bucket, saltL, saltR) and every
  * qualifying pair still meets exactly once, at (own, own). Per-task
  * input is bounded by ~2·ceiling rows per cell whatever the skew; cold
  * buckets ride the same join with both salts pinned to 0 and factor-1
  * replication (no row growth). The sizing aggregation (narrow,
  * map-side combined, hot rows only broadcast back) is paid ONLY on the
  * guarded path.
  */
object IntervalJoin {

  /** Default per-(bucket, cell) row ceiling for the skew grid: 4096
    * keeps a worst-case cell's all-pairs output at ~16M rows — minutes
    * of CPU, not hours — while leaving cold buckets (the common case)
    * entirely on the clean path. */
  val DefaultBucketCeiling = 4096

  /** Seeded 2%-sampled hot-bucket EXISTENCE probe ([[graft.operators
    * Dedup]]'s guard family): bucket a sample of `df`, ask whether any
    * sampled bucket crosses `ceiling · fraction / 2` (floor 8). A true
    * mega-bucket (10⁴–10⁵ rows) crosses with probability ~1; a marginal
    * bucket the sample misses just runs its complete all-pairs join in
    * one task — never a wrong ANSWER, because the salt grid only
    * redistributes rows. Fixed seed → deterministic verdict per input. */
  private def sampledHotProbe(
      mkBuckets: DataFrame => DataFrame, df: DataFrame, ceiling: Int): Boolean = {
    val fraction = math.min(1.0, math.max(0.02, 12.0 / ceiling))
    val threshold = math.max(8.0, ceiling * fraction / 2)
    !mkBuckets(df.sample(withReplacement = false, fraction, 38L))
      .groupBy("__bucket").agg(count(lit(1)).as("__n"))
      .filter(col("__n") > threshold)
      .isEmpty
  }

  /** One side of the salt grid: every HOT row gets its OWN salt
    * (uniform spread; exact balance is not needed, only boundedness)
    * and is REPLICATED across the other side's `repFactor` cells. Cold
    * rows (no hot entry) pin both to 0 with factor-1 replication — a
    * fully deterministic branch with zero row growth.
    *
    * SALT DETERMINISM is the subtle part. A content hash
    * (`xxhash64(own columns)`) would be retry-stable but collapses
    * byte-identical rows into ONE cell — and identical join values ARE
    * the pile-up the guard exists for (measured: the planted 4M-equal-
    * points SCALE stage degenerated to a single 2,048M-pair task,
    * slower than no guard at all). A bare
    * `monotonically_increasing_id()` spreads perfectly but is task-
    * layout-dependent: a retried/speculated task could recompute
    * DIFFERENT salts for rows whose copies already shuffled — silently
    * dropping/duplicating pairs (the SPARK-23207 class). Resolution:
    * spread with the nondeterministic id, then PIN the salted hot
    * subset with an eager `localCheckpoint` — every consumer (both
    * shuffle reads, any retry) replays the materialized blocks, and if
    * an executor dies and blocks are lost the job FAILS LOUDLY
    * (checkpoint truncates lineage) instead of recomputing fresh salts.
    * Wrong answers are off the table; the failure mode is a rerun.
    * The checkpoint materializes only the hot-bucket rows after
    * replication — the same volume the grid join must shuffle anyway;
    * cold rows stay a pure streaming branch. */
  private def gridSide(
      df: DataFrame, hot: DataFrame,
      ownSalt: String, ownFactor: String,
      repSalt: String, repFactor: String): DataFrame = {
    val joined = df.join(broadcast(hot), Seq("__bucket"), "left")
    val cold = joined.filter(col(ownFactor).isNull)
      .withColumn(ownSalt, lit(0L))
      .withColumn(repSalt, lit(0L))
      .drop("__fl", "__fr")
    val hotRows = joined.filter(col(ownFactor).isNotNull)
      .withColumn(ownSalt,
        pmod(xxhash64(monotonically_increasing_id()), col(ownFactor)))
      .withColumn(repSalt,
        explode(sequence(lit(0L), col(repFactor) - 1L)))
      .drop("__fl", "__fr")
      .localCheckpoint(true)
    cold.unionByName(hotRows)
  }

  /** Skew-bounded inner equi-join of two already-bucketed frames on
    * `__bucket` (+ the salt grid for hot buckets). Exactly-once: a pair
    * co-located in a bucket meets at precisely (left's own salt, right's
    * own salt) — the left row carries one `__gl` and all `__gr`s, the
    * right row one `__gr` and all `__gl`s.
    *
    * The hot list is COLLECTED (tiny by definition — skewed keys are
    * few) and re-ships as a local broadcast frame: the sizing aggs run
    * exactly once, and when the exact counts clear every bucket (the
    * probe is deliberately conservative — it fires from ~half the
    * ceiling so a true mega-bucket is never missed) the join falls back
    * to the untouched clean plan instead of paying the degenerate
    * factor-1 grid (explode + 3-key join), which measured ~4× on j10. */
  private def gridJoin(lhs: DataFrame, rhs: DataFrame, ceiling: Int): DataFrame = {
    val ln = lhs.groupBy("__bucket").agg(count(lit(1)).as("__ln"))
    val rn = rhs.groupBy("__bucket").agg(count(lit(1)).as("__rn"))
    val hotRows = ln.join(rn, Seq("__bucket"))
      .filter(col("__ln") > ceiling || col("__rn") > ceiling)
      .select(col("__bucket"),
        ceil(col("__ln") / ceiling).cast("long").as("__fl"),
        ceil(col("__rn") / ceiling).cast("long").as("__fr"))
      .collect()
    if (hotRows.isEmpty) lhs.join(rhs, Seq("__bucket"))
    else {
      val spark = lhs.sparkSession
      import spark.implicits._
      val hot = hotRows.toSeq
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
        .toDF("__bucket", "__fl", "__fr")
      gridSide(lhs, hot, "__gl", "__fl", "__gr", "__fr")
        .join(gridSide(rhs, hot, "__gr", "__fr", "__gl", "__fl"),
          Seq("__bucket", "__gl", "__gr"))
        .drop("__gl", "__gr")
    }
  }

  /** Inner-join `points` to the `intervals` rows whose [lo, hi] contains
    * the point (both bounds inclusive). Output: every points column plus
    * every intervals column (caller guarantees disjoint names). */
  def pointInInterval(
      points: DataFrame, pointCol: String,
      intervals: DataFrame, loCol: String, hiCol: String,
      bucketWidth: Double,
      bucketCeiling: Int = DefaultBucketCeiling): DataFrame = {
    require(bucketWidth > 0, s"bucketWidth must be positive, got $bucketWidth")
    require(bucketCeiling > 0, s"bucketCeiling must be positive, got $bucketCeiling")
    val w = lit(bucketWidth)
    def mkIv(df: DataFrame) = df
      .filter(col(loCol) <= col(hiCol))
      .withColumn("__bucket",
        explode(sequence(
          floor(col(loCol) / w).cast("long"),
          floor(col(hiCol) / w).cast("long"))))
    def mkPt(df: DataFrame) =
      df.withColumn("__bucket", floor(col(pointCol) / w).cast("long"))
    val ivBuckets = mkIv(intervals)
    val ptBuckets = mkPt(points)
    val hot = sampledHotProbe(mkPt, points, bucketCeiling) ||
      sampledHotProbe(mkIv, intervals, bucketCeiling)
    val joined =
      if (!hot) ptBuckets.join(ivBuckets, Seq("__bucket"))
      else gridJoin(ptBuckets, ivBuckets, bucketCeiling)
    joined
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
    * and no lost pairs. Column names must be disjoint across sides.
    * The skew grid composes cleanly: it only redistributes bucket
    * co-location, and the claim filter runs downstream of the join. */
  def intervalOverlap(
      left: DataFrame, lLoCol: String, lHiCol: String,
      right: DataFrame, rLoCol: String, rHiCol: String,
      bucketWidth: Double,
      bucketCeiling: Int = DefaultBucketCeiling): DataFrame = {
    require(bucketWidth > 0, s"bucketWidth must be positive, got $bucketWidth")
    require(bucketCeiling > 0, s"bucketCeiling must be positive, got $bucketCeiling")
    val w = lit(bucketWidth)
    def expand(lo: String, hi: String)(df: DataFrame) = df
      .filter(col(lo) <= col(hi))
      .withColumn("__bucket",
        explode(sequence(
          floor(col(lo) / w).cast("long"),
          floor(col(hi) / w).cast("long"))))
    val lB = expand(lLoCol, lHiCol)(left)
    val rB = expand(rLoCol, rHiCol)(right)
    val hot = sampledHotProbe(expand(lLoCol, lHiCol), left, bucketCeiling) ||
      sampledHotProbe(expand(rLoCol, rHiCol), right, bucketCeiling)
    val joined =
      if (!hot) lB.join(rB, Seq("__bucket"))
      else gridJoin(lB, rB, bucketCeiling)
    joined
      .filter(
        col(lLoCol) <= col(rHiCol) && col(rLoCol) <= col(lHiCol) &&
          col("__bucket") === greatest(
            floor(col(lLoCol) / w).cast("long"),
            floor(col(rLoCol) / w).cast("long")))
      .drop("__bucket")
  }
}
