package graft.beacon

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Foundation bootstrap (D9): genesis + specs + time_helpers, the three
  * driver-side config tables everything else derives timing from
  * (reference: src/loaders/{genesis,specs}.py, migrations/001,002).
  */
object Foundation {

  /** P23: genesis payload → 1-row table. `genesis_time` arrives either as
    * a unix-seconds digit string or ISO-8601 `Z` (reference:
    * src/loaders/genesis.py:61-84 — C13). */
  def genesis(spark: SparkSession, payloadJson: String): DataFrame = {
    import spark.implicits._
    val schema = StructType(Seq(
      StructField("data", StructType(Seq(
        StructField("genesis_time", StringType),
        StructField("genesis_validators_root", StringType),
        StructField("genesis_fork_version", StringType))))))
    Seq(payloadJson).toDF("payload")
      .withColumn("p", from_json(col("payload"), schema))
      .select(
        when(col("p.data.genesis_time").rlike("^\\d+$"),
          timestamp_seconds(col("p.data.genesis_time").cast("long")))
          .otherwise(to_timestamp(col("p.data.genesis_time")))
          .as("genesis_time"),
        coalesce(col("p.data.genesis_validators_root"), lit("")).as("genesis_validators_root"),
        coalesce(col("p.data.genesis_fork_version"), lit("")).as("genesis_fork_version"))
  }

  /** P24a: specs object → k/v unpivot (`explode` of the parsed map — the
    * reference's dict→rows melt, src/loaders/specs.py:24-91). */
  def specs(spark: SparkSession, payloadJson: String): DataFrame = {
    import spark.implicits._
    Seq(payloadJson).toDF("payload")
      .withColumn("m", from_json(
        get_json_object(col("payload"), "$.data"), MapType(StringType, StringType)))
      .select(explode(col("m")).as(Seq("parameter_name", "parameter_value")))
      .withColumn("updated_at", current_timestamp())
  }

  /** P24b: time_helpers — 1-row compose of specs timing + genesis time
    * (driver-side crossJoin of two 1-row frames, J7). */
  def timeHelpers(genesisDf: DataFrame, specsDf: DataFrame): DataFrame = {
    val timing = specsDf
      .groupBy()
      .agg(
        max(when(col("parameter_name") === "SECONDS_PER_SLOT", col("parameter_value")))
          .cast("long").as("seconds_per_slot"),
        max(when(col("parameter_name") === "SLOTS_PER_EPOCH", col("parameter_value")))
          .cast("long").as("slots_per_epoch"))
      .na.fill(Map("seconds_per_slot" -> 12L, "slots_per_epoch" -> 32L))
    genesisDf
      .select(unix_timestamp(col("genesis_time")).as("genesis_time_unix"))
      .crossJoin(timing)
  }

  /** Assemble a [[ChainConfig]] from materialized foundation tables
    * (reference D8 flow: specs rows → fork epochs; genesis → timing). */
  def chainConfig(genesisDf: DataFrame, specsDf: DataFrame, network: String): ChainConfig = {
    val g = genesisDf.select(unix_timestamp(col("genesis_time"))).head().getLong(0)
    ChainConfig.fromSpecs(
      specsDf.select(col("parameter_name"), col("parameter_value")), g, network)
  }
}
