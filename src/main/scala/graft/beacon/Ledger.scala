package graft.beacon

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** The work ledgers: `load_state_chunks` + `transformer_progress`
  * (reference: migrations/004_state_tables.sql, SURVEY §2.10).
  *
  * Storage model = the reference's insert-as-update exactly: status changes
  * are APPENDED rows with a monotonically increasing `insert_version`;
  * readers collapse to latest-per-key with a window (the
  * ReplacingMergeTree-FINAL equivalent, F3). Append-only parquet keeps the
  * ledger write path contention-free for many concurrent writers — the
  * same reason the reference never UPDATEs.
  */
object Ledger {

  /** Engine-wide FINAL view: latest row per key by version (F2/F3;
    * reference: src/services/transformer.py:356-367). */
  def latest(df: DataFrame, keys: Seq[String], versionCol: String): DataFrame = {
    val w = Window.partitionBy(keys.map(col): _*).orderBy(col(versionCol).desc)
    df.withColumn("__rn", row_number().over(w)).filter(col("__rn") === 1).drop("__rn")
  }

  def chunkId(loader: String, start: Long, end: Long): String = s"${loader}_${start}_${end}"

  /** D1: smart chunk planning — align to CHUNK_SIZE multiples, truncate the
    * last chunk (reference: src/services/loader.py:487-758). Pure
    * `spark.range`, no data scan. */
  def planChunks(
      spark: SparkSession, startSlot: Long, endSlot: Long, chunkSize: Long,
      loader: String): DataFrame = {
    val alignedStart = (startSlot / chunkSize) * chunkSize
    spark.range(alignedStart, endSlot + 1, chunkSize)
      .select(
        col("id").as("start_slot"),
        least(col("id") + (chunkSize - 1), lit(endSlot)).as("end_slot"))
      .select(
        concat_ws("_", lit(loader), col("start_slot"), col("end_slot")).as("chunk_id"),
        col("start_slot"), col("end_slot"),
        lit(loader).as("loader_name"),
        lit("pending").as("status"),
        lit(null).cast("string").as("worker_id"),
        current_timestamp().as("created_at"),
        current_timestamp().as("updated_at"),
        lit(0L).as("insert_version"))
  }

  /** D1 daily mode: single-slot chunks at each last-slot-of-UTC-day in
    * [startSlot, endSlot] — the validators/pending-queue snapshot cadence
    * (reference: src/services/loader.py:547-558 plans validators as
    * per-day single-slot chunks). Pure `spark.range` over epoch days +
    * the C12 closed form; no data scan, no window. */
  def planDailyChunks(
      spark: SparkSession, startSlot: Long, endSlot: Long, cfg: ChainConfig,
      loader: String): DataFrame = {
    val day0 = (cfg.genesisTimeUnix + startSlot * cfg.secondsPerSlot) / 86400
    val dayN = (cfg.genesisTimeUnix + endSlot * cfg.secondsPerSlot) / 86400
    spark.range(day0, dayN + 1)
      // last slot with genesis + slot*sps < (day+1)*midnight (C12)
      .select((((col("id") + 1) * 86400 - cfg.genesisTimeUnix - 1)
        .cast("long") / cfg.secondsPerSlot).cast("long").as("slot"))
      .filter(col("slot").between(startSlot, endSlot))
      .select(
        concat_ws("_", lit(loader), col("slot"), col("slot")).as("chunk_id"),
        col("slot").as("start_slot"), col("slot").as("end_slot"),
        lit(loader).as("loader_name"),
        lit("pending").as("status"),
        lit(null).cast("string").as("worker_id"),
        current_timestamp().as("created_at"),
        current_timestamp().as("updated_at"),
        lit(0L).as("insert_version"))
  }

  /** One EXACT chunk row (no alignment) — for recording the ledger state
    * of a specific already-decided range (ingest, streaming batches).
    * `planChunks` is for PLANNING and floor-aligns; using it to record an
    * arbitrary range would corrupt chunk identity. */
  def chunkRow(
      spark: SparkSession, loader: String, startSlot: Long, endSlot: Long): DataFrame = {
    import org.apache.spark.sql.Row
    val now = new java.sql.Timestamp(System.currentTimeMillis())
    spark.createDataFrame(
      java.util.Arrays.asList(Row(
        chunkId(loader, startSlot, endSlot), startSlot, endSlot, loader,
        "pending", null, now, now, 0L)),
      Schemas.loadStateChunks)
  }

  /** Bulk form of [[chunkRow]]: one EXACT ledger row per (start, end)
    * range — the single-append shape for fused multi-chunk ingest. */
  def chunkRows(
      spark: SparkSession, loader: String, ranges: Seq[(Long, Long)]): DataFrame = {
    import org.apache.spark.sql.Row
    val now = new java.sql.Timestamp(System.currentTimeMillis())
    val rows: java.util.List[Row] = java.util.Arrays.asList(
      ranges.map { case (s, e) =>
        Row(chunkId(loader, s, e), s, e, loader, "pending", null, now, now, 0L)
      }: _*)
    spark.createDataFrame(rows, Schemas.loadStateChunks)
  }

  /** Chunks not yet planned: anti-join against the existing ledger (the
    * reference's bulk completed-set cache, loader.py:492-528 — the
    * anti-join IS the bulk form). */
  def newChunks(planned: DataFrame, ledger: DataFrame): DataFrame =
    planned.join(
      ledger.select("chunk_id").distinct(),
      Seq("chunk_id"), "left_anti")

  /** Ledger-specific FINAL with a DETERMINISTIC tie-break: insert_version
    * is wall-clock millis from concurrent writers, so two workers can
    * collide on the same version for one key — a version-only window
    * would then pick an arbitrary row per query execution and the chunk
    * state could flap between reads. Ties order by updated_at desc, then
    * status/worker_id (any stable order works; determinism is the point). */
  private def latestLedgerRow(df: DataFrame, keys: Seq[String]): DataFrame = {
    val w = Window.partitionBy(keys.map(col): _*).orderBy(
      col("insert_version").desc, col("updated_at").desc,
      col("status").asc, col("worker_id").asc_nulls_last)
    df.withColumn("__rn", row_number().over(w)).filter(col("__rn") === 1).drop("__rn")
  }

  /** Current chunk states (latest version per chunk). */
  def chunkStates(ledger: DataFrame): DataFrame =
    latestLedgerRow(ledger, Seq("chunk_id"))

  /** Status-transition rows (claimed/completed/failed) to append. */
  def transition(
      chunks: DataFrame, newStatus: String, workerId: String,
      version: Long): DataFrame =
    chunks.select(
      col("chunk_id"), col("start_slot"), col("end_slot"), col("loader_name"),
      lit(newStatus).as("status"),
      lit(workerId).as("worker_id"),
      col("created_at"),
      current_timestamp().as("updated_at"),
      lit(version).as("insert_version"))

  /** A1: per-loader chunk overview with conditional status counts
    * (reference: src/services/clickhouse.py:266-284). */
  def overview(ledger: DataFrame): DataFrame =
    chunkStates(ledger)
      .groupBy("loader_name")
      .agg(
        count(lit(1)).as("total_chunks"),
        sum(when(col("status") === "pending", 1).otherwise(0)).as("pending_chunks"),
        sum(when(col("status") === "claimed", 1).otherwise(0)).as("claimed_chunks"),
        sum(when(col("status") === "completed", 1).otherwise(0)).as("completed_chunks"),
        sum(when(col("status") === "failed", 1).otherwise(0)).as("failed_chunks"))

  /** A2: counts by (loader, status). */
  def statusCounts(ledger: DataFrame): DataFrame =
    chunkStates(ledger).groupBy("loader_name", "status").agg(count(lit(1)).as("n"))

  /** A6: failed-chunk summary ordered by count desc
    * (reference: scripts/maintenance.py:64-80). */
  def failedSummary(ledger: DataFrame): DataFrame =
    chunkStates(ledger)
      .filter(col("status") === "failed")
      .groupBy("loader_name")
      .agg(
        count(lit(1)).as("n_failed"),
        min("start_slot").as("min_slot"),
        max("end_slot").as("max_slot"))
      .orderBy(col("n_failed").desc)

  /** J1: untransformed-chunk discovery — completed load chunks with no
    * completed transform row; left anti join + ordered limit
    * (reference: src/services/transformer.py:240-268). */
  /** Progress-ledger FINAL with the same deterministic tie-break rationale
    * as [[chunkStates]] (wall-clock versions from concurrent writers). */
  def progressStates(progress: DataFrame): DataFrame = {
    val w = Window
      .partitionBy("raw_table_name", "start_slot", "end_slot")
      .orderBy(col("insert_version").desc, col("processed_at").desc, col("status").asc)
    progress.withColumn("__rn", row_number().over(w)).filter(col("__rn") === 1).drop("__rn")
  }

  def untransformedChunks(
      ledger: DataFrame, progress: DataFrame, loader: String, limit: Int = 50): DataFrame = {
    val completed = chunkStates(ledger)
      .filter(col("loader_name") === loader && col("status") === "completed")
    val done = progressStates(progress)
      .filter(col("raw_table_name") === s"raw_$loader" && col("status") === "completed")
      .select("start_slot", "end_slot")
    completed
      .join(done, Seq("start_slot", "end_slot"), "left_anti")
      .orderBy("start_slot")
      .limit(limit)
  }

  /** A3: transform status rollup (reference: transformer.py:620-662). */
  def transformStatus(progress: DataFrame): DataFrame =
    progressStates(progress)
      .groupBy("raw_table_name")
      .agg(
        count(lit(1)).as("total"),
        sum(when(col("status") === "completed", 1).otherwise(0)).as("completed"),
        sum(when(col("status") === "failed", 1).otherwise(0)).as("failed"),
        sum(when(col("status") === "processing", 1).otherwise(0)).as("processing"),
        sum("processed_count").as("rows_processed"),
        sum("failed_count").as("rows_failed"),
        max(when(col("status") === "completed", col("end_slot"))).as("max_completed_slot"))

  /** J3/A4: slot-gap detection + stats over a raw table
    * (reference: scripts/maintenance.py:95-146). */
  def gaps(spark: SparkSession, raw: DataFrame, startSlot: Long, endSlot: Long,
      sampleLimit: Int = 20): DataFrame =
    spark.range(startSlot, endSlot + 1)
      .withColumnRenamed("id", "slot")
      .join(raw.select("slot").distinct(), Seq("slot"), "left_anti")
      .orderBy("slot")
      .limit(sampleLimit)

  def gapStats(raw: DataFrame, startSlot: Long, endSlot: Long): DataFrame =
    raw
      .filter(col("slot").between(startSlot, endSlot))
      .agg(
        min("slot").as("min_slot"),
        max("slot").as("max_slot"),
        countDistinct("slot").as("present_slots"))
      .withColumn("expected_slots", lit(endSlot - startSlot + 1))
      .withColumn(
        "missing_pct",
        round((lit(1.0) - col("present_slots") / col("expected_slots")) * 100, 2))

  /** A5: resume point — max(slot) per raw table
    * (reference: src/services/loader.py:349-374). */
  def maxSlot(raw: DataFrame): Option[Long] = {
    val r = raw.agg(max("slot")).head()
    if (r.isNullAt(0)) None else Some(r.getLong(0))
  }
}

/** Append-only parquet persistence for a ledger directory. */
final case class LedgerStore(path: String) {
  def append(df: DataFrame): Unit =
    df.write.mode(SaveMode.Append).parquet(path)

  def read(spark: SparkSession, schema: org.apache.spark.sql.types.StructType): DataFrame =
    if (graft.core.Fs.exists(spark, path))
      spark.read.schema(schema).parquet(path)
    else spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)
}
