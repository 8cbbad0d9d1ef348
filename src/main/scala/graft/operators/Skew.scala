package graft.operators

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame}

/** Skew-mitigation utilities for hot-key joins and aggregations.
  *
  * AQE's skew-join split (on by default in the session factory) handles
  * most cases at runtime; explicit salting remains for the pathological
  * hot keys AQE can't split — a broadcast-too-big dimension joined on a
  * key where one value holds >>1 partition of rows.
  */
object Skew {

  /** Salted equi-join: the skewed (large) side gets a random salt in
    * [0, factor); the small side is replicated `factor` times with
    * `explode`. Join key becomes (key, salt) → the hot key spreads over
    * `factor` reducers. Result equals a plain inner join on `key`.
    */
  def saltedJoin(
      skewed: DataFrame, other: DataFrame, key: String, factor: Int): DataFrame = {
    val salted = skewed.withColumn("__salt", (rand(seed = 42) * factor).cast("int"))
    val replicated = other.withColumn(
      "__salt", explode(sequence(lit(0), lit(factor - 1))))
    salted.join(replicated, Seq(key, "__salt")).drop("__salt")
  }

  /** One aggregate expressed as a (partial over the value column, final
    * over the partial results) pair — e.g. count = (count, sum),
    * sum = (sum, sum), max = (max, max). */
  final case class TwoPhase(
      alias: String, partial: Column => Column, combine: Column => Column)

  object TwoPhase {
    def sumOf(alias: String): TwoPhase = TwoPhase(alias, sum, sum)
    def countOf(alias: String): TwoPhase = TwoPhase(alias, c => count(c), sum)
    def maxOf(alias: String): TwoPhase = TwoPhase(alias, max, max)
    def minOf(alias: String): TwoPhase = TwoPhase(alias, min, min)
  }

  /** Two-phase (salted) aggregation for a hot-key groupBy: a RANDOM salt
    * spreads the hot key over `factor` reducers for the partial phase (a
    * value-derived salt would collapse when hot rows share one value),
    * then the final phase combines partials per key. */
  def twoPhaseAgg(
      df: DataFrame, key: String, valueCol: String, factor: Int,
      aggs: Seq[TwoPhase]): DataFrame =
    twoPhaseAgg(df, Seq(key), valueCol, factor, aggs)

  /** Multi-key variant — functionally-dependent attribute columns ride
    * along in the group key instead of needing a post-agg re-join. */
  def twoPhaseAgg(
      df: DataFrame, keys: Seq[String], valueCol: String, factor: Int,
      aggs: Seq[TwoPhase]): DataFrame = {
    val salted = df.withColumn("__salt", (rand(seed = 42) * factor).cast("int"))
    val phase1 = salted
      .groupBy(keys.map(col) :+ col("__salt"): _*)
      .agg(
        aggs.head.partial(col(valueCol)).as(aggs.head.alias),
        aggs.tail.map(a => a.partial(col(valueCol)).as(a.alias)): _*)
    phase1.groupBy(keys.map(col): _*)
      .agg(
        aggs.head.combine(col(aggs.head.alias)).as(aggs.head.alias),
        aggs.tail.map(a => a.combine(col(a.alias)).as(a.alias)): _*)
  }
}
