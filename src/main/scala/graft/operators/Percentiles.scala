package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Per-key discrete percentiles WITHOUT sorting the corpus — DuckDB
  * `quantile_disc` parity: p-th percentile = the smallest value v whose
  * cumulative count reaches ⌈p/100 · n⌉.
  *
  * The construction reduces the fact table to its per-key DISTINCT-VALUE
  * histogram first (`groupBy(key, value).count()` — partial-agg +
  * one exchange), then runs the cumulative window over histogram rows
  * only. At 100 TB the window input is the value cardinality, not the
  * row count; for genuinely continuous values quantize first (bucket to
  * cents / fixed decimals — the `Sampling.scoreBuckets` discussion) and
  * the percentile is exact at that quantization. The threshold test
  * `cum·100 ≥ tot·p` stays in integer arithmetic — no ceil, no doubles,
  * so the result is oracle-exact (a11 in the driver gate). */
object Percentiles {

  /** One row per key: `n` (count) plus a `p<q>` column per requested
    * percent (1..100). Values pass through MIN untouched — no float
    * arithmetic on the measure itself. */
  def perKey(
      df: DataFrame, keyCol: String, valueCol: String,
      percents: Seq[Int],
      /** For genuinely continuous values: bucket to multiples of this
        * width BEFORE the histogram (reported percentile = its bucket's
        * lower bound, exact at that quantization). Bounds the histogram
        * cardinality to range/width per key — the knob that keeps the
        * cumulative window off corpus-sized input at 100 TB. */
      quantize: Option[Double] = None): DataFrame = {
    require(percents.nonEmpty && percents.forall(p => p >= 1 && p <= 100),
      s"percents must be within [1,100], got $percents")
    require(quantize.forall(_ > 0), s"quantize must be positive, got $quantize")
    val v = quantize match {
      case Some(q) => floor(col(valueCol) / q) * q
      case None => col(valueCol)
    }
    val hist = df.groupBy(col(keyCol), v.as("__v"))
      .agg(count(lit(1)).as("__cnt"))
    val wCum = Window.partitionBy(keyCol).orderBy(col("__v").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wTot = Window.partitionBy(keyCol)
    val cum = hist
      .withColumn("__cum", sum("__cnt").over(wCum))
      .withColumn("__tot", sum("__cnt").over(wTot))
    cum.groupBy(col(keyCol))
      .agg(
        max("__tot").as("n"),
        percents.map(p =>
          min(when(col("__cum") * 100 >= col("__tot") * p, col("__v")))
            .as(s"p$p")): _*)
  }

  /** Per-key WEIGHTED discrete quantiles — [[perKey]] where each row
    * carries a weight (token counts, byte sizes, sampling multiplicities):
    * the p-th weighted percentile is the smallest value whose cumulative
    * WEIGHT reaches p% of the key's total weight — what mixture
    * calibration actually needs ("the median token lives in which
    * quality band", not "the median document"). Same scale shape as
    * [[perKey]]: the fact reduces to its (key, value) histogram with
    * SUM(weight) partials, the cumulative window runs over histogram
    * rows only, and the threshold compare `cum·100 ≥ tot·p` stays exact
    * integer arithmetic for integer weights. */
  def weightedPerKey(
      df: DataFrame, keyCol: String, valueCol: String, weightCol: String,
      percents: Seq[Int]): DataFrame = {
    require(percents.nonEmpty && percents.forall(p => p >= 1 && p <= 100),
      s"percents must be within [1,100], got $percents")
    val hist = df.groupBy(col(keyCol), col(valueCol).as("__v"))
      .agg(sum(weightCol).as("__w"))
    val wCum = Window.partitionBy(keyCol).orderBy(col("__v").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wTot = Window.partitionBy(keyCol)
    hist
      .withColumn("__cum", sum("__w").over(wCum))
      .withColumn("__tot", sum("__w").over(wTot))
      .groupBy(col(keyCol))
      .agg(
        max("__tot").as("total_w"),
        percents.map(p =>
          min(when(col("__cum") * 100 >= col("__tot") * p, col("__v")))
            .as(s"p$p")): _*)
  }

  /** Per-key WINSORIZATION — clamp the value column into its key's
    * [pLo, pHi] discrete-percentile band: the standard robustification
    * for heavy-tailed score columns before they feed sampling weights or
    * mixture rates (a wild scraper score would otherwise own the whole
    * budget). Returns the input rows plus `<valueCol>_w` (clamped) and
    * `clamped` (-1 low / 0 inside / +1 high). Same scale shape as
    * [[madOutliers]]: one histogram agg + one broadcast join back; the
    * fact never shuffles. */
  def winsorize(
      df: DataFrame, keyCol: String, valueCol: String,
      pLo: Int, pHi: Int): DataFrame = {
    require(pLo < pHi, s"winsorize: need pLo < pHi, got [$pLo, $pHi]")
    val bounds = perKey(df, keyCol, valueCol, Seq(pLo, pHi))
      .select(col(keyCol), col(s"p$pLo").as("__lo"), col(s"p$pHi").as("__hi"))
    df.join(broadcast(bounds), keyCol)
      .withColumn(s"${valueCol}_w",
        least(greatest(col(valueCol), col("__lo")), col("__hi")))
      .withColumn("clamped",
        when(col(valueCol) < col("__lo"), -1)
          .when(col(valueCol) > col("__hi"), 1).otherwise(0))
      .drop("__lo", "__hi")
  }

  /** Per-key ROBUST outlier detection — median / MAD (median absolute
    * deviation), the estimator that survives the contamination a mean/
    * stddev z-score does not (one wild value drags a mean arbitrarily;
    * the median moves one rank). Both medians are the DISCRETE
    * `quantile_disc` definition above, so there is no interpolation
    * anywhere: the only float ops are one subtraction (|x − med|, exact
    * IEEE, identical in any engine) and the final `k·mad` compare.
    *
    * Plan shape: two histogram aggregations (each partial-agg + one
    * exchange over (key, value) cardinality) and two BROADCAST joins of
    * the tiny per-key stats frame back onto the fact — the fact itself
    * never shuffles, so the construction holds at 100 TB where a
    * per-key sort of the raw rows would not. */
  def madOutliers(
      df: DataFrame, keyCol: String, valueCol: String,
      k: Double = 3.0): DataFrame = {
    val med = perKey(df, keyCol, valueCol, Seq(50))
      .select(col(keyCol), col("p50").as("__med"))
    val dev = df.join(broadcast(med), keyCol)
      .withColumn("__dev", abs(col(valueCol) - col("__med")))
    val mad = perKey(dev, keyCol, "__dev", Seq(50))
      .select(col(keyCol), col("p50").as("__mad"))
    dev.join(broadcast(mad), keyCol)
      .groupBy(keyCol)
      .agg(
        count(lit(1)).as("n"),
        max("__med").as("med"),
        max("__mad").as("mad"),
        sum(when(col("__dev") > lit(k) * col("__mad"), 1L).otherwise(0L))
          .as("n_outliers"))
  }
}
