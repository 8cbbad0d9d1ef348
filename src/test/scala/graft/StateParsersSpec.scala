package graft

import graft.beacon._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.scalatest.funsuite.AnyFunSuite

class StateParsersSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkTestSession.spark
  import spark.implicits._

  private val cfg = ChainConfig.gnosis

  private def rawOf(rows: (Long, String)*): DataFrame =
    rows.toSeq
      .map { case (s, p) =>
        (s, p, graft.functions.CanonicalJson.payloadHash16(p),
          new java.sql.Timestamp(1700000000000L))
      }
      .toDF("slot", "payload", "payload_hash", "retrieved_at")

  test("validators: explode, bool→0/1, UInt64 sentinel clamp (P19)") {
    val v = StateParsers
      .validators(rawOf(1000L -> BeaconFixtures.validatorsPayload), cfg)
      .orderBy("validator_index").collect()
    assert(v.length === 2)
    assert(v(0).getAs[Int]("validator_index") === 0)
    assert(v(0).getAs[Long]("balance") === 32004567890L)
    assert(v(0).getAs[Int]("slashed") === 0)
    assert(v(0).getAs[Long]("exit_epoch") === Long.MaxValue) // FAR_FUTURE clamped
    assert(v(1).getAs[Int]("slashed") === 1)
    assert(v(1).getAs[Long]("withdrawable_epoch") === 200L)
  }

  test("rewards: single object → 1 row (P20)") {
    val r = StateParsers.rewards(rawOf(2000L -> BeaconFixtures.rewardsPayload), cfg).collect()
    assert(r.length === 1)
    assert(r(0).getAs[Long]("proposer_index") === 12345L)
    assert(r(0).getAs[Long]("total") === 45000000L)
    assert(r(0).getAs[Long]("attester_slashings") === 0L)
  }

  test("pending queues: unpack, deposit_slot rename, empty → 0 rows (P15-17)") {
    val pc = StateParsers.pendingConsolidations(
      rawOf(3000L -> BeaconFixtures.pendingConsolidationsPayload), cfg).collect()
    assert(pc.length === 2)
    assert(pc.map(_.getAs[Long]("source_index")).sorted.toSeq === Seq(100L, 101L))

    val pd = StateParsers.pendingDeposits(
      rawOf(3000L -> BeaconFixtures.pendingDepositsPayload), cfg).collect()
    assert(pd.length === 1)
    assert(pd(0).getAs[Long]("slot") === 3000L)          // snapshot slot
    assert(pd(0).getAs[Long]("deposit_slot") === 27400000L) // entry's own slot

    val pw = StateParsers.pendingPartialWithdrawals(
      rawOf(3000L -> BeaconFixtures.pendingPartialWithdrawalsPayload), cfg).collect()
    assert(pw(0).getAs[Long]("withdrawable_epoch") === 1500000L)

    assert(StateParsers.pendingConsolidations(
      rawOf(3000L -> BeaconFixtures.emptyQueuePayload), cfg).count() === 0)
  }

  test("malformed JSON → 0 rows, not an exception (tests/test_pending_queues.py parity)") {
    assert(StateParsers.pendingConsolidations(rawOf(1L -> "not json"), cfg).count() === 0)
    assert(StateParsers.validators(rawOf(1L -> "{broken"), cfg).count() === 0)
  }

  test("data_column_sidecars: cells/bytes/counts + canonical JSON hashes (P21)") {
    val d = StateParsers.dataColumnSidecars(
      rawOf(27435008L -> BeaconFixtures.dataColumnSidecarsPayload), cfg).collect()
    assert(d.length === 1)
    val r = d(0)
    assert(r.getAs[Long]("column_index") === 3L)
    assert(r.getAs[Long]("column_cells") === 2L)
    // 0xaabb → 2 bytes, 0xccddee → 3 bytes
    assert(r.getAs[Long]("column_bytes") === 5L)
    assert(r.getAs[Long]("kzg_commitments_count") === 2L)
    assert(r.getAs[Long]("kzg_proofs_count") === 1L)
    assert(r.getAs[Long]("signed_block_slot") === 27435008L)
    // sha256 of '["0xaabb","0xccddee"]' — CPython json.dumps canonical
    assert(r.getAs[String]("column_hash") ===
      "7e6ca02f8510d2c36eec015cc2a3ef1f40ad4623e0865a745fb9e6fedb511dd0")
  }

  test("blob_sidecars: blob_size + stable placeholder hash (P13)") {
    val payload =
      """{"data": [{"index": "0", "kzg_commitment": "0xc", "kzg_proof": "0xp",
                    "blob": "0xdeadbeef"}]}"""
    val b = StateParsers.blobSidecars(rawOf(900000L -> payload), cfg).collect()
    assert(b.length === 1)
    assert(b(0).getAs[Long]("blob_size") === 10L) // len("0xdeadbeef")
    assert(b(0).getAs[String]("blob_hash").matches("blob_hash_[0-9a-f]{8}"))
  }

  test("foundation: genesis both time formats, specs unpivot, time_helpers (P23/P24)") {
    val gUnix = Foundation.genesis(spark,
      """{"data": {"genesis_time": "1638993340", "genesis_validators_root": "0xgvr",
                   "genesis_fork_version": "0x00000064"}}""")
    assert(gUnix.head().getAs[java.sql.Timestamp]("genesis_time").getTime / 1000 === 1638993340L)
    val gIso = Foundation.genesis(spark,
      """{"data": {"genesis_time": "2021-12-08T19:55:40Z", "genesis_validators_root": "x",
                   "genesis_fork_version": "y"}}""")
    assert(gIso.head().getAs[java.sql.Timestamp]("genesis_time").getTime / 1000 === 1638993340L)

    val sp = Foundation.specs(spark,
      """{"data": {"SECONDS_PER_SLOT": "5", "SLOTS_PER_EPOCH": "16",
                   "ALTAIR_FORK_EPOCH": "512"}}""")
    assert(sp.count() === 3)
    val th = Foundation.timeHelpers(gUnix, sp).head()
    assert(th.getAs[Long]("genesis_time_unix") === 1638993340L)
    assert(th.getAs[Long]("seconds_per_slot") === 5L)
    assert(th.getAs[Long]("slots_per_epoch") === 16L)
  }

  test("ChainConfig.fromSpecs: epochs override, FAR_FUTURE skipped (D8)") {
    val sp = Foundation.specs(spark,
      """{"data": {"SECONDS_PER_SLOT": "5", "SLOTS_PER_EPOCH": "16",
                   "ALTAIR_FORK_EPOCH": "512",
                   "FULU_FORK_EPOCH": "18446744073709551615"}}""")
    val c = ChainConfig.fromSpecs(sp, 1638993340L, "gnosis")
    assert(c.forks.find(_.name == "altair").get.epoch === 512L)
    // FAR_FUTURE spec row ignored → static gnosis default kept
    assert(c.forks.find(_.name == "fulu").get.epoch === 1714688L)
  }

  test("fromSpecs adds spec-announced forks MISSING from the preset (D8 self-heal)") {
    // mainnet's static preset has no fulu — a node that schedules it must
    // win; a FAR_FUTURE announcement for an unknown fork must not
    val sp = Foundation.specs(spark,
      """{"data": {"FULU_FORK_EPOCH": "400000", "FULU_FORK_VERSION": "0x06000000",
                   "GLOAS_FORK_EPOCH": "18446744073709551615"}}""")
    val c = ChainConfig.fromSpecs(sp, 1606824023L, "mainnet")
    val fulu = c.forks.find(_.name == "fulu")
    assert(fulu.exists(f => f.epoch === 400000L && f.version === "0x06000000"))
    assert(!c.forks.exists(_.name == "gloas"))
    assert(c.forks === c.forks.sortBy(_.epoch)) // schedule stays ordered
  }

  test("fetch gate: a NAMED fork absent from the schedule gates everything OUT (F5)") {
    // mainnet has no fulu → the data_column_sidecars gate must fetch
    // NOTHING, not every slot since genesis (getOrElse(0) inversion)
    val mainnet = ChainConfig.mainnet
    assert(ChainConfig.mainnet.activationSlot("fulu").isEmpty)
    assert(RawIngest.gateSlots(mainnet, Seq(0L, 1000000L, 12000000L),
      activationFork = Some("fulu")) === Seq.empty)
    val g = RawIngest.slotGate(mainnet, Some("fulu"), dailyOnly = false)
    assert(!Seq(0L, 1000000L, 12000000L).exists(g))
    // scheduled fork still gates normally
    val g2 = RawIngest.slotGate(mainnet, Some("electra"), dailyOnly = false)
    val floor = mainnet.activationSlot("electra").get
    assert(g2(floor) && !g2(floor - 1))
  }

  test("fromSpecs also overrides fork VERSION strings (D8)") {
    val sp = Foundation.specs(spark,
      """{"data": {"ALTAIR_FORK_VERSION": "0x01000099"}}""")
    val c = ChainConfig.fromSpecs(sp, 1638993340L, "gnosis")
    assert(c.forks.find(_.name == "altair").get.version === "0x01000099")
    assert(c.forks.find(_.name == "deneb").get.version === "0x04000064") // preset kept
  }

  test("gnosis fulu boundary: slot 27435007 electra, 27435008 fulu (test_fulu_support parity)") {
    val c = ChainConfig.gnosis
    assert(c.forkAtSlotValue(27435007L).name === "electra")
    assert(c.forkAtSlotValue(27435008L).name === "fulu")
    assert(c.forkAtSlotValue(27435008L).version === "0x06000064")
  }
}
