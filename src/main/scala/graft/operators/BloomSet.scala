package graft.operators

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame}

/** A relational Bloom filter: an m-bit membership structure built from a
  * reference value set and probed with a broadcast join — the cheap
  * "have we seen this before?" pre-filter a dedup or decontamination
  * pass runs before anything expensive (one-sided error: no false
  * negatives, tunable false-positive rate ≈ (1-e^(-kn/m))^k).
  *
  * Scale shape: the filter itself is ≤ ⌈m/63⌉ rows of (word, mask) —
  * kilobytes for millions of reference values — so the probe side joins
  * it broadcast with NO shuffle of the corpus; building it is one
  * explode + one tiny aggregation on the SMALL reference side. The same
  * layout writes to parquet for reuse across runs.
  *
  * Word packing is 63 bits, not 64: the oracle engine's checked `<<`
  * refuses the sign bit, and 63-bit words keep every mask value
  * positive so `>>`/`&` arithmetic is identical across engines. The md5
  * position family makes the filter contents — and therefore every
  * flagged probe — reproducible in ANSI SQL.
  */
object BloomSet {

  /** Bits per mask word (sign bit unused — see class doc). */
  val WordBits = 63

  /** Bit position of `value` for hash function `seed` in an m-bit
    * filter: md5-prefix hash mod m (md5-parity across engines). */
  def position(seed: Int, value: Column, m: Int): Column =
    conv(substring(md5(concat(lit(s"$seed#"), value)), 1, 15), 16, 10)
      .cast("long") % m

  /** Build the (word, mask) filter table from the DISTINCT values of
    * `valueCol`: k md5 hash functions, positions packed 63/word. */
  def build(ref: DataFrame, valueCol: String, m: Int, k: Int): DataFrame = {
    require(m >= 1 && k >= 1, s"need m, k >= 1; got m=$m k=$k")
    ref
      .select(explode(array(
        (1 to k).map(s => position(s, col(valueCol), m)): _*)).as("pos"))
      .distinct()
      .groupBy(expr(s"pos div $WordBits").as("word"))
      .agg(expr(s"bit_or(shiftleft(cast(1 as bigint), cast(pos % $WordBits as int)))")
        .as("mask"))
  }

  /** Probe: appends boolean `flagCol` — true iff ALL k bits for
    * `valueCol` are set (value possibly in the reference set; false is
    * definitive absence). One broadcast left-join per hash function
    * against the ≤⌈m/63⌉-row filter — the corpus side never shuffles. */
  def mightContain(
      df: DataFrame, valueCol: String, bloom: DataFrame, m: Int, k: Int,
      flagCol: String = "might_contain"): DataFrame = {
    val withBits = (1 to k).foldLeft(df) { (acc, s) =>
      acc.withColumn(s"__pos$s", position(s, col(valueCol), m))
        .join(
          broadcast(bloom.select(
            col("word").as(s"__word$s"), col("mask").as(s"__mask$s"))),
          expr(s"__pos$s div $WordBits") === col(s"__word$s"), "left")
    }
    val flag = (1 to k)
      .map(s => expr(
        s"(shiftright(coalesce(__mask$s, cast(0 as bigint)), " +
          s"cast(__pos$s % $WordBits as int)) & 1) = 1"))
      .reduce(_ && _)
    withBits
      .withColumn(flagCol, flag)
      .drop((1 to k).flatMap(s => Seq(s"__pos$s", s"__word$s", s"__mask$s")): _*)
  }
}
