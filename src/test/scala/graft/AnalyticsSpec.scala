package graft

import graft.beacon._
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Analytics over a small transformed corpus built through the real
  * pipeline (parse fixtures → tables → queries). */
class AnalyticsSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkTestSession.spark
  import spark.implicits._

  private val cfg = ChainConfig.gnosis

  private lazy val tables: Map[String, org.apache.spark.sql.DataFrame] = {
    val raw = (0L until 50L)
      .map { s =>
        val p = BeaconFixtures.electraBlock
          .replace("\"slot\": \"21405700\"", s"\"slot\": \"$s\"")
          .replace("\"proposer_index\": \"12345\"", s"\"proposer_index\": \"${s % 4}\"")
        (s, p, graft.functions.CanonicalJson.payloadHash16(p),
          new java.sql.Timestamp(1700000000000L))
      }
      .toDF("slot", "payload", "payload_hash", "retrieved_at")
    BlockParser.parseAll(raw, cfg)
  }

  test("recentBlocks: top-k desc by slot") {
    val r = Analytics.recentBlocks(tables("blocks"), 10, 5).collect()
    assert(r.map(_.getAs[Long]("slot")).toSeq === Seq(49L, 48L, 47L, 46L, 45L))
  }

  test("forkDistribution + topProposers") {
    val fd = Analytics.forkDistribution(tables("blocks")).collect()
    assert(fd.length === 1 && fd(0).getAs[Long]("n_blocks") === 50L)
    val tp = Analytics.topProposers(tables("blocks"), minBlocks = 10L).collect()
    assert(tp.length === 4) // 4 proposers x ~12-13 blocks
    assert(tp.map(_.getAs[Long]("n_blocks")).sum === 50L)
  }

  test("blobCountsPerBlock left join keeps blockless-blob slots at 0") {
    val bc = Analytics.blobCountsPerBlock(
      tables("blocks"), tables("blob_commitments").filter(col("slot") < 10))
    assert(bc.count() === 50)
    assert(bc.filter(col("slot") < 10).agg(sum("n_blobs")).head().getLong(0) === 20L)
    assert(bc.filter(col("slot") >= 10).agg(sum("n_blobs")).head().getLong(0) === 0L)
  }

  test("dailyWithdrawals rollup") {
    val dw = Analytics.dailyWithdrawals(tables("withdrawals")).collect()
    assert(dw.map(_.getAs[Long]("n_withdrawals")).sum === 100L) // 2 per block
  }

  test("tableStats union") {
    val st = Analytics.tableStats(
      Map("blocks" -> tables("blocks"), "attestations" -> tables("attestations")))
      .collect()
    assert(st.length === 2)
    assert(st.forall(_.getAs[Long]("max_slot") === 49L))
  }

  test("participationSeries epochs") {
    val ps = Analytics.participationSeries(tables("sync_aggregates"), cfg).collect()
    // 50 slots / 16 per epoch -> epochs 0..3
    assert(ps.map(_.getAs[Long]("epoch")).toSeq === Seq(0L, 1L, 2L, 3L))
    assert(ps.forall(_.getAs[Double]("avg_participation") === 16.0))
  }

  test("appliedConsolidations day-over-day EXCEPT") {
    val d1 = java.sql.Date.valueOf("2021-12-09")
    val d2 = java.sql.Date.valueOf("2021-12-10")
    val s1 = cfg.lastSlotOfDay(d1.toLocalDate)
    val s2 = cfg.lastSlotOfDay(d2.toLocalDate)
    val pending = Seq(
      (s1, 100L, 200L), (s1, 101L, 200L), // day-1 snapshot
      (s2, 101L, 200L) // 100→200 applied between snapshots
    ).toDF("slot", "source_index", "target_index")
    val applied = Analytics.appliedConsolidations(pending, d1, d2, cfg).collect()
    assert(applied.length === 1)
    assert(applied(0).getAs[Long]("source_index") === 100L)
  }

  test("appliedConsolidations: drained-to-empty queue vs missing snapshot (raw disambiguation)") {
    val d1 = java.sql.Date.valueOf("2021-12-09")
    val d2 = java.sql.Date.valueOf("2021-12-10")
    val s1 = cfg.lastSlotOfDay(d1.toLocalDate)
    val s2 = cfg.lastSlotOfDay(d2.toLocalDate)
    // day-2 parsed snapshot is EMPTY — ambiguous on its own
    val pending = Seq((s1, 100L, 200L), (s1, 101L, 200L))
      .toDF("slot", "source_index", "target_index")
    // without the raw table: conservative empty (can't tell missing from drained)
    assert(Analytics.appliedConsolidations(pending, d1, d2, cfg).count() === 0)
    // a raw payload row at the day-2 slot proves the snapshot WAS ingested
    // with an empty queue → the full day-1 set really was applied
    val raw = Seq((s2, "{}")).toDF("slot", "payload")
    val applied = Analytics.appliedConsolidations(pending, d1, d2, cfg, Some(raw))
      .orderBy("source_index").collect()
    assert(applied.map(_.getAs[Long]("source_index")).toSeq === Seq(100L, 101L))
    // raw row absent for day-2 → still suppressed
    val rawOther = Seq((s1, "{}")).toDF("slot", "payload")
    assert(Analytics.appliedConsolidations(pending, d1, d2, cfg, Some(rawOther)).count() === 0)
    // transform lag: the day-2 raw payload still HAS entries (the
    // transformer just hasn't landed it) → NOT proof of a drained queue
    val rawLag = Seq((s2, """{"data":[{"source_index":"101","target_index":"200"}]}"""))
      .toDF("slot", "payload")
    assert(Analytics.appliedConsolidations(pending, d1, d2, cfg, Some(rawLag)).count() === 0)
    // a NON-empty parsed day-2 snapshot is unambiguous even when the raw
    // row is missing — the diff must be computed
    val pendingBoth = Seq((s1, 100L, 200L), (s1, 101L, 200L), (s2, 101L, 200L))
      .toDF("slot", "source_index", "target_index")
    val diffed = Analytics.appliedConsolidations(pendingBoth, d1, d2, cfg, Some(rawOther))
      .collect()
    assert(diffed.map(_.getAs[Long]("source_index")).toSeq === Seq(100L))
  }

  test("balanceDeltas windowed lag") {
    val v = Seq(
      (100L, 1, 32000000000L), (200L, 1, 32001000000L),
      (100L, 2, 31000000000L), (200L, 2, 30999000000L))
      .toDF("slot", "validator_index", "balance")
    val d = Analytics.balanceDeltas(v, 100L, 200L).orderBy("validator_index").collect()
    assert(d(0).getAs[Long]("delta") === 1000000L)
    assert(d(1).getAs[Long]("delta") === -1000000L)
  }
}
