package graft

import graft.beacon._
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.scalatest.funsuite.AnyFunSuite

import java.nio.file.Files

/** `maintain compact` e2e (the ReplacingMergeTree merge analogue —
  * reference: migrations/005_fork_phase0.sql:30-33 background merges):
  * N small appends with duplicate versions → compact → file count
  * collapses, latest() results identical, dead versions physically gone,
  * an interrupted swap self-heals, and the log records the rewrite.
  */
class CompactionSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkTestSession.spark
  import spark.implicits._

  private def tmp(): String = Files.createTempDirectory("graft-compact").toString

  /** Five overlapping appends of `blocks` rows: slots 0..149 across two
    * months, each append re-writing a sliding window at a higher
    * insert_version — the accumulation pattern a realtime tail produces. */
  private def buildStructured(base: String): Unit = {
    val dir = s"$base/tables/blocks"
    (1 to 5).foreach { v =>
      val lo = (v - 1) * 20
      spark.range(lo, lo + 70)
        .select(
          col("id").as("slot"),
          (col("id") * v).as("body_count"),
          lit(v.toLong).as("insert_version"),
          when(col("id") < 100, "2024-01").otherwise("2024-02").as("month"))
        .repartition(4)
        .write.mode(SaveMode.Append).partitionBy("month").parquet(dir)
    }
  }

  private def latestBlocks(base: String): Seq[(Long, Long, Long)] =
    Transformer.latestTable(spark, s"$base/tables", "blocks", Seq("slot"))
      .select("slot", "body_count", "insert_version")
      .as[(Long, Long, Long)].collect().toSeq.sorted

  test("compact structured: files collapse, latest() byte-identical, dead versions gone") {
    val base = tmp()
    buildStructured(base)
    val dir = s"$base/tables/blocks"
    val before = latestBlocks(base)
    val (filesBefore, _) = graft.core.Fs.dataFileStats(spark, dir)
    assert(filesBefore >= 10) // the small-file problem is actually present

    val results = Compaction.compactStructured(spark, base, "blocks")
    assert(results.map(_.month).sorted === Seq("2024-01", "2024-02"))

    val (filesAfter, _) = graft.core.Fs.dataFileStats(spark, dir)
    assert(filesAfter < filesBefore)
    assert(filesAfter === results.map(_.filesAfter).sum)
    // FINAL view unchanged by the rewrite
    assert(latestBlocks(base) === before)
    // dead superseded versions are physically gone: raw scan == FINAL view
    assert(spark.read.parquet(dir).count() === before.size.toLong)
    // stats are coherent: every key survived, duplicates were dropped
    assert(results.map(_.rowsAfter).sum === before.size.toLong)
    assert(results.map(_.rowsBefore).sum === 5L * 70)
    // month partition column still discoverable after the swap
    assert(spark.read.parquet(dir).select("month").distinct().as[String]
      .collect().sorted === Array("2024-01", "2024-02"))
    // in-flight roots left clean
    assert(!graft.core.Fs.exists(spark, s"$dir/.compact-tmp"))
    assert(!graft.core.Fs.exists(spark, s"$dir/.compact-old"))

    // idempotent: single-file months are already merged → nothing to do
    assert(Compaction.compactStructured(spark, base, "blocks").isEmpty ===
      (filesAfter === 2))
  }

  test("compact is recorded to the compaction log like the other ledgers") {
    val base = tmp()
    buildStructured(base)
    val results = Compaction.compactStructured(spark, base, "blocks")
    val log = LedgerStore(s"$base/compaction_log")
    Compaction.record(spark, log, results, version = 42L)
    val rows = log.read(spark, Schemas.compactionLog).collect()
    assert(rows.length === results.length)
    assert(rows.forall(_.getAs[Long]("insert_version") === 42L))
    assert(rows.map(_.getAs[String]("month")).sorted === results.map(_.month).sorted.toArray)
  }

  test("interrupted compact: table stays readable, recovery restores the parked month") {
    val base = tmp()
    buildStructured(base)
    val dir = s"$base/tables/blocks"
    val before = latestBlocks(base)

    // simulate a crash between the two swap renames: the month is parked,
    // nothing has replaced it, and stale tmp output is lying around
    assert(graft.core.Fs.rename(spark, s"$dir/month=2024-01", s"$dir/.compact-old/month=2024-01"))
    spark.range(3).select(col("id").as("slot"))
      .write.mode(SaveMode.Overwrite).parquet(s"$dir/.compact-tmp/month=2024-02")

    // mid-crash the table is still a valid parquet dir ('.'-prefixed roots
    // are invisible to Spark's file index) — just missing the parked month
    val midCrash = spark.read.parquet(dir).select("month").distinct().as[String].collect()
    assert(midCrash === Array("2024-02"))

    // any subsequent compact heals first, then rewrites
    val results = Compaction.compactStructured(spark, base, "blocks")
    assert(results.map(_.month).sorted === Seq("2024-01", "2024-02"))
    assert(latestBlocks(base) === before)
    assert(!graft.core.Fs.exists(spark, s"$dir/.compact-tmp"))
    assert(!graft.core.Fs.exists(spark, s"$dir/.compact-old"))
  }

  test("concurrent month rewrites: same results as sequential, clean roots") {
    val base = tmp()
    buildStructured(base) // months 2024-01, 2024-02, each with many files
    val dir = s"$base/tables/blocks"
    val before = latestBlocks(base)
    val results = Compaction.compactStructured(
      spark, base, "blocks", maxConcurrentMonths = 4)
    assert(results.map(_.month).sorted === Seq("2024-01", "2024-02"))
    assert(latestBlocks(base) === before)
    assert(spark.read.parquet(dir).count() === before.size.toLong)
    assert(results.map(_.rowsAfter).sum === before.size.toLong)
    assert(!graft.core.Fs.exists(spark, s"$dir/.compact-tmp"))
    assert(!graft.core.Fs.exists(spark, s"$dir/.compact-old"))
  }

  test("hot-month floor: frontier month is refused, concurrent append survives") {
    val base = tmp()
    buildStructured(base) // months 2024-01 (cold), 2024-02 (hot)
    val dir = s"$base/tables/blocks"
    // a tail appends to the hot month while compact runs with the guard
    spark.range(140, 141)
      .select(col("id").as("slot"), lit(999L).as("body_count"),
        lit(9L).as("insert_version"), lit("2024-02").as("month"))
      .write.mode(SaveMode.Append).partitionBy("month").parquet(dir)
    val hotFilesBefore = graft.core.Fs.dataFileStats(spark, s"$dir/month=2024-02")

    val results = Compaction.compactStructured(
      spark, base, "blocks", hotMonthFloor = Some("2024-02"))
    // only the cold month is rewritten — even though both were eligible
    assert(results.map(_.month) === Seq("2024-01"))
    // the hot month's files are untouched and the appended row is intact
    assert(graft.core.Fs.dataFileStats(spark, s"$dir/month=2024-02") === hotFilesBefore)
    assert(latestBlocks(base).contains((140L, 999L, 9L)))
    // an explicit months= request cannot bypass the guard either
    assert(Compaction.compactStructured(spark, base, "blocks",
      months = Seq("2024-02"), hotMonthFloor = Some("2024-02")).isEmpty)
    // floor=None (the CLI's --force) compacts it
    assert(Compaction.compactStructured(spark, base, "blocks",
      months = Seq("2024-02")).map(_.month) === Seq("2024-02"))
    assert(latestBlocks(base).contains((140L, 999L, 9L)))
  }

  test("frontierMonth: ledger max end_slot over non-failed states, writer-consistent months") {
    val cfg = ChainConfig.gnosis
    // monthOfSlot must agree with the writers' partition derivation
    // (date_format(cfg.slotTimestamp(slot), 'yyyy-MM')) — a mismatch would
    // guard the wrong month
    val slots = Seq(0L, 12345L, 777777L, 7777777L)
    val viaColumn = slots.toDF("slot")
      .select(date_format(cfg.slotTimestamp(col("slot")), "yyyy-MM"))
      .as[String].collect().toSeq
    assert(viaColumn === slots.map(Compaction.monthOfSlot(cfg, _)))

    val base = tmp()
    val ledger = LedgerStore(s"$base/load_state_chunks")
    assert(Compaction.frontierMonth(spark, ledger, cfg).isEmpty) // cold store
    ledger.append(Ledger.transition(
      Ledger.chunkRow(spark, "blocks", 0L, 1000L), "completed", "w", 1L))
    ledger.append(Ledger.transition(
      Ledger.chunkRow(spark, "blocks", 1001L, 500000L), "claimed", "w", 2L))
    // failed chunks don't advance the frontier: nothing is appending there
    ledger.append(Ledger.transition(
      Ledger.chunkRow(spark, "blocks", 500001L, 9000000L), "failed", "w", 3L))
    assert(Compaction.frontierMonth(spark, ledger, cfg) ===
      Some(Compaction.monthOfSlot(cfg, 500000L)))
  }

  test("compact raw: split-safe latest-retrieval dedup, orphaned parts dropped") {
    val base = tmp()
    val dir = s"$base/raw_blocks"
    val t1 = new java.sql.Timestamp(1700000000000L)
    val t2 = new java.sql.Timestamp(1700000100000L)
    // retrieval 1 of slot 10 split into 3 parts; retrieval 2 into 2 parts.
    // A naive per-(slot,part) latest would keep retrieval 2's parts PLUS
    // retrieval 1's orphaned part 2 — compact must keep exactly retrieval 2.
    val old = Seq(
      (10L, "old-a", "h1", t1, 0, 3), (10L, "old-b", "h1", t1, 1, 3), (10L, "old-c", "h1", t1, 2, 3),
      (11L, "keep", "h2", t1, 0, 1))
    val nu = Seq((10L, "new-a", "h3", t2, 0, 2), (10L, "new-b", "h3", t2, 1, 2))
    Seq(old, nu).foreach { rows =>
      rows.toDF("slot", "payload", "payload_hash", "retrieved_at", "part_index", "part_count")
        .withColumn("month", lit("2024-01"))
        .write.mode(SaveMode.Append).partitionBy("month").parquet(dir)
    }
    val results = Compaction.compactRaw(spark, base, "raw_blocks")
    assert(results.map(_.month) === Seq("2024-01"))
    val after = spark.read.parquet(dir)
      .select("slot", "payload").as[(Long, String)].collect().toSeq.sorted
    assert(after === Seq((10L, "new-a"), (10L, "new-b"), (11L, "keep")))
  }
}
