package graft.beacon

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, SparkSession}

/** The reference's documented analytics surface (docs/CLICKHOUSE_GUIDE.md:
  * 270-376, docs/pending-queues.md:113-128) as DataFrame functions over the
  * structured tables. Every function takes *already-loaded* frames so the
  * caller controls `latest()` collapsing and slot-range pruning.
  */
object Analytics {

  /** Recent blocks (GUIDE:275-281): `ORDER BY slot DESC LIMIT n` —
    * TakeOrdered, no full sort. */
  def recentBlocks(blocks: DataFrame, sinceSlot: Long, n: Int = 10): DataFrame =
    blocks
      .filter(col("slot") > sinceSlot)
      .select("slot", "proposer_index", "version", "slot_timestamp")
      .orderBy(col("slot").desc)
      .limit(n)

  /** Fork distribution (GUIDE:282-287). */
  def forkDistribution(blocks: DataFrame): DataFrame =
    blocks.groupBy("version")
      .agg(count(lit(1)).as("n_blocks"), min("slot").as("min_slot"), max("slot").as("max_slot"))
      .orderBy("min_slot")

  /** Top proposers with HAVING floor (GUIDE:288-295). */
  def topProposers(blocks: DataFrame, minBlocks: Long = 10L, limit: Int = 20): DataFrame =
    blocks.groupBy("proposer_index")
      .agg(count(lit(1)).as("n_blocks"))
      .filter(col("n_blocks") >= minBlocks)
      .orderBy(col("n_blocks").desc, col("proposer_index").asc)
      .limit(limit)

  /** J4: blocks ⋈ blob_commitments per-slot blob counts (GUIDE:300-312).
    * blob side aggregated BEFORE the join → the join input is one row per
    * slot on both sides. */
  def blobCountsPerBlock(blocks: DataFrame, blobCommitments: DataFrame): DataFrame = {
    val counts = blobCommitments.groupBy("slot").agg(count(lit(1)).as("n_blobs"))
    blocks.select("slot", "proposer_index")
      .join(counts, Seq("slot"), "left")
      .na.fill(0, Seq("n_blobs"))
  }

  /** J5: daily withdrawal rollup via blocks ⋈ withdrawals (GUIDE:314-337). */
  def dailyWithdrawals(withdrawals: DataFrame): DataFrame =
    withdrawals
      .groupBy(to_date(col("slot_timestamp")).as("day"))
      .agg(
        count(lit(1)).as("n_withdrawals"),
        sum("amount").as("total_gwei"),
        countDistinct("validator_index").as("n_validators"))
      .orderBy("day")

  /** A7: hourly block production (GUIDE:355-364). */
  def hourlyBlockProduction(blocks: DataFrame): DataFrame =
    blocks
      .groupBy(date_trunc("hour", col("slot_timestamp")).as("hour"))
      .agg(count(lit(1)).as("n_blocks"),
        avg("sync_aggregate_participation").as("avg_participation"))
      .orderBy("hour")

  /** X2: monitoring union of per-table row counts (GUIDE:541-553).
    * Name-sorted for deterministic row order; empty input → empty frame
    * (monitoring may run before any table materializes). */
  def tableStats(tables: Map[String, DataFrame]): DataFrame =
    tables.toSeq.sortBy(_._1).map { case (name, df) =>
      df.agg(count(lit(1)).as("n_rows"), max("slot").as("max_slot"))
        .select(lit(name).as("table"), col("n_rows"), col("max_slot"))
    }.reduceOption(_ unionByName _).getOrElse {
      val spark = org.apache.spark.sql.SparkSession.active
      spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
        org.apache.spark.sql.types.StructType(Seq(
          org.apache.spark.sql.types.StructField("table", org.apache.spark.sql.types.StringType),
          org.apache.spark.sql.types.StructField("n_rows", org.apache.spark.sql.types.LongType),
          org.apache.spark.sql.types.StructField("max_slot", org.apache.spark.sql.types.LongType))))
    }

  /** J6/X1: pending-queue day-over-day diff — entries present in the D-1
    * snapshot but absent in D = applied on D
    * (docs/pending-queues.md:113-128). */
  def appliedConsolidations(
      pendingConsolidations: DataFrame, dayPrev: java.sql.Date, day: java.sql.Date,
      cfg: ChainConfig, rawPending: Option[DataFrame] = None): DataFrame = {
    def snapshotAt(d: java.sql.Date) = {
      val lastSlot = cfg.lastSlotOfDay(d.toLocalDate)
      pendingConsolidations
        .filter(col("slot") === lastSlot)
        .select("source_index", "target_index")
    }
    val cur = snapshotAt(day)
    // a MISSING day-D snapshot (ingest hasn't reached it / fetch failed)
    // must not report the entire previous queue as "applied" — but an
    // empty parsed snapshot is AMBIGUOUS: the queue may legitimately have
    // drained to empty (common for pending_consolidations), in which case
    // the full D-1 set really was applied. A non-empty parsed snapshot is
    // always unambiguous. For the empty case, the raw table disambiguates
    // — but only a raw payload whose data[] is itself EMPTY proves the
    // drained queue: a raw row with entries merely means the transformer
    // has not landed that chunk yet, and diffing against it would
    // over-report the whole D-1 queue (the original bug).
    val snapshotPresent = !cur.isEmpty || (rawPending match {
      case Some(raw) =>
        !raw.filter(col("slot") === cfg.lastSlotOfDay(day.toLocalDate) &&
          get_json_object(col("payload"), "$.data[0]").isNull).isEmpty
      case None => false
    })
    if (!snapshotPresent) cur.limit(0)
    else snapshotAt(dayPrev).except(cur)
  }

  /** Proposer reward leaderboard via blocks ⋈ rewards (GUIDE:343-353). */
  def proposerRewards(blocks: DataFrame, rewards: DataFrame, limit: Int = 20): DataFrame =
    blocks.select("slot", "proposer_index")
      .join(rewards.select("slot", "total"), Seq("slot"))
      .groupBy("proposer_index")
      .agg(count(lit(1)).as("n_blocks"), sum("total").as("total_reward"))
      .orderBy(col("total_reward").desc, col("proposer_index").asc)
      .limit(limit)

  /** Validator balance deltas between two snapshot slots — windowed lag
    * over per-validator snapshots. */
  def balanceDeltas(validators: DataFrame, slotA: Long, slotB: Long): DataFrame = {
    val w = Window.partitionBy("validator_index").orderBy("slot")
    validators
      .filter(col("slot").isin(slotA, slotB))
      .withColumn("prev_balance", lag("balance", 1).over(w))
      .filter(col("slot") === slotB && col("prev_balance").isNotNull)
      .select(
        col("validator_index"), col("balance"),
        (col("balance") - col("prev_balance")).as("delta"))
  }

  /** Participation-rate time series from sync aggregates (Altair+). */
  def participationSeries(syncAggregates: DataFrame, cfg: ChainConfig): DataFrame =
    syncAggregates
      .groupBy(cfg.epochOf(col("slot")).as("epoch"))
      .agg(avg("participation_count").as("avg_participation"),
        count(lit(1)).as("n_slots"))
      .orderBy("epoch")
}
