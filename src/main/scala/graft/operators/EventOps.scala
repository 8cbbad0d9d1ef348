package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Event-log operators Spark has no primitive for, each built as the
  * MERGE shape: one exchange on the key, ordered windows inside the
  * partition, never a range join or a per-row rescan.
  */
object EventOps {

  /** As-of join: for every `left` row, the LATEST `right` row with the
    * same `keyCol` strictly before it — "before" meaning
    * `(rightTs, rightTie) < (leftTs, leftTie)` lexicographically, so
    * same-timestamp ordering is deterministic. Returns every left column
    * plus `rightValueCols` (null when no right row precedes).
    *
    * Built as a union-merge, not a join: both sides ride ONE exchange on
    * `keyCol`, and an ignore-nulls `last()` over the preceding-rows frame
    * picks the match — linear in partition size. The textbook
    * inequality-join formulation rescans the right side per left row
    * (quadratic per key, and Spark plans it as a nested loop); at corpus
    * scale the merge is the only shape that holds. Rows from the two
    * inputs that tie on BOTH ts and tie-breaker resolve right-before-left
    * (callers with a shared id space never hit this).
    *
    * `rightValueCols` must be disjoint from left's column names (the
    * IntervalJoin convention). */
  def asofJoin(
      left: DataFrame, right: DataFrame, keyCol: String,
      leftTsCol: String, rightTsCol: String,
      leftTieCol: String, rightTieCol: String,
      rightValueCols: Seq[String]): DataFrame = {
    require(rightValueCols.nonEmpty, "rightValueCols must be non-empty")
    val leftCols = left.columns.toSeq
    require(rightValueCols.forall(!leftCols.contains(_)),
      s"rightValueCols ${rightValueCols.mkString(",")} must be disjoint from left columns")
    val r = right.select(
      col(keyCol), col(rightTsCol).as("__ts"), col(rightTieCol).as("__tie"),
      lit(0).as("__side"),
      struct(rightValueCols.map(col): _*).as("__rv"))
    val l = left.select(
      col("*"), col(leftTsCol).as("__ts"), col(leftTieCol).as("__tie"),
      lit(1).as("__side"))
    val w = Window.partitionBy(keyCol)
      .orderBy(col("__ts").asc, col("__tie").asc, col("__side").asc)
      .rowsBetween(Window.unboundedPreceding, -1)
    l.unionByName(r, allowMissingColumns = true)
      .withColumn("__match", last(col("__rv"), ignoreNulls = true).over(w))
      .filter(col("__side") === 1)
      .select(
        leftCols.map(col) ++
          rightValueCols.map(c => col(s"__match.$c").as(c)): _*)
  }

  /** [[asofJoin]] with a STALENESS TOLERANCE — the sensor-fusion /
    * quote-matching variant: the latest preceding right row counts only
    * while it is at most `toleranceSeconds` old; a staler match is as
    * good as none (a trade must not pair with yesterday's quote).
    * Same single-exchange merge; the tolerance is a scan-side
    * post-projection that nulls every right value on stale matches, so
    * the staleness gate costs nothing at any scale. `rightSecCol` must
    * be one of `rightValueCols` (the matched row's epoch seconds);
    * `leftSecCol` is the left row's epoch seconds. */
  def asofJoinWithin(
      left: DataFrame, right: DataFrame, keyCol: String,
      leftTsCol: String, rightTsCol: String,
      leftTieCol: String, rightTieCol: String,
      rightValueCols: Seq[String],
      leftSecCol: String, rightSecCol: String,
      toleranceSeconds: Long): DataFrame = {
    require(rightValueCols.contains(rightSecCol),
      s"rightSecCol $rightSecCol must ride in rightValueCols")
    val joined = asofJoin(left, right, keyCol,
      leftTsCol, rightTsCol, leftTieCol, rightTieCol, rightValueCols)
    val stale = col(rightSecCol).isNull ||
      (col(leftSecCol) - col(rightSecCol) > toleranceSeconds)
    rightValueCols.foldLeft(joined) { (acc, c) =>
      acc.withColumn(c, when(stale, lit(null)).otherwise(col(c)))
    }
  }

  /** Gap-based sessionization: a session starts at any row ≥ `gapSeconds`
    * after its key's previous row (boundary-inclusive: a gap of EXACTLY
    * `gapSeconds` continues the session). Emits one row per session:
    * key, session_idx (1-based per key), n_events, start_s, end_s, dur_s
    * — all epoch-second longs, exact. The windows and the final
    * aggregation all reuse the single `keyCol` exchange
    * (hashpartitioning(key) satisfies the (key, session_idx) clustering
    * requirement — plan-gated in PlanSpec via w4). */
  def sessionize(
      df: DataFrame, keyCol: String, tsCol: String, tieCol: String,
      gapSeconds: Long = 1800L): DataFrame = {
    val wOrd = Window.partitionBy(keyCol).orderBy(col(tsCol).asc, col(tieCol).asc)
    val sec = unix_timestamp(col(tsCol))
    df.select(col(keyCol), col(tsCol), col(tieCol))
      .withColumn("__sec", sec)
      .withColumn("__prev", lag(col("__sec"), 1).over(wOrd))
      .withColumn("__new",
        when(col("__prev").isNull || col("__sec") - col("__prev") > gapSeconds, 1L)
          .otherwise(0L))
      .withColumn("session_idx",
        sum(col("__new")).over(
          wOrd.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy(col(keyCol), col("session_idx"))
      .agg(
        count(lit(1)).as("n_events"),
        min(col("__sec")).as("start_s"),
        max(col("__sec")).as("end_s"))
      .withColumn("dur_s", col("end_s") - col("start_s"))
  }

  /** Exponentially time-decayed counts — the freshness-weighted
    * frequency every trending/recency feature wants: each event
    * contributes `0.5^(age / halfLife)` with age quantized to whole
    * `halfLifeDays`-day units as of `asOfDate`. The quantized weights
    * are SCALED TO EXACT LONGS — `2^(maxUnits − k)` for k half-lives —
    * so the aggregation is pure integer arithmetic (order-independent,
    * map-side partials, bit-reproducible across engines and partition
    * orders; a double sum here would hash-differently per run), and the
    * decayed total is ONE correctly-rounded IEEE division at the end:
    * `decayed_count = Σ 2^(maxUnits−k) / 2^maxUnits`. Events older than
    * `maxUnits` half-lives contribute 0; future events clamp to weight
    * 1. Emits `n_events`, the exact `decayed_scaled` long, and the
    * derived `decayed_count` double. */
  def decayedCounts(
      df: DataFrame, keyCol: String, tsCol: String,
      asOfDate: String, halfLifeDays: Int = 7, maxUnits: Int = 18): DataFrame = {
    require(halfLifeDays >= 1, s"halfLifeDays must be >= 1: $halfLifeDays")
    // scaled weights must stay clear of Long overflow under the sum:
    // 2^maxUnits per row * rows; 40 leaves 2^23 rows of headroom even
    // for a single all-fresh key per partition-free integer sum
    require(maxUnits >= 1 && maxUnits <= 40, s"maxUnits out of range: $maxUnits")
    val units = floor(
      datediff(lit(asOfDate).cast("date"), to_date(col(tsCol))) /
        lit(halfLifeDays)).cast("long")
    val scale = 1L << maxUnits
    // exact CASE chain: k half-lives -> the long literal 2^(maxUnits-k)
    df.withColumn("__units", when(units < 0L, lit(0L)).otherwise(units))
      .withColumn("__w",
        when(col("__units") > maxUnits.toLong, lit(0L))
          .otherwise((0 to maxUnits).foldLeft(lit(0L)) { (acc, k) =>
            when(col("__units") === k.toLong, lit(1L << (maxUnits - k)))
              .otherwise(acc)
          }))
      .groupBy(col(keyCol))
      .agg(
        count(lit(1)).as("n_events"),
        sum(col("__w")).as("decayed_scaled"))
      .withColumn("decayed_count",
        col("decayed_scaled").cast("double") / lit(scale.toDouble))
  }
}
