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

  /** Two-phase (salted) aggregation for a hot-key groupBy: partial agg on
    * (key, salt) then final agg on key. Works for associative aggregates —
    * the caller supplies both phases. */
  def twoPhaseAgg(
      df: DataFrame, key: String, factor: Int,
      partial: Seq[(String, Column => Column)],
      valueCol: String): DataFrame = {
    val salted = df.withColumn("__salt", pmod(xxhash64(col(valueCol)), lit(factor)))
    val phase1 = salted
      .groupBy(col(key), col("__salt"))
      .agg(
        partial.head._2(col(valueCol)).as(partial.head._1),
        partial.tail.map(p => p._2(col(valueCol)).as(p._1)): _*)
    phase1.groupBy(col(key))
      .agg(
        partial.head._2(col(partial.head._1)).as(partial.head._1),
        partial.tail.map(p => p._2(col(p._1)).as(p._1)): _*)
  }
}
