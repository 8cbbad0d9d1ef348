package graft

import graft.beacon.{ChainConfig, Fork, ForkDetect}
import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Sampling-based fork detection (reference fork.py:253-361): recover the
  * schedule from raw payload `version` transitions when specs are broken. */
class ForkDetectSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkTestSession.spark
  import spark.implicits._

  // compact synthetic network: 16 slots/epoch, three scheduled forks
  private val cfg = ChainConfig("testnet", 0L, 5L, 16L, Seq(
    Fork("phase0", 0L, "0x00000064"),
    Fork("altair", 100L, "0x01000064"),
    Fork("bellatrix", 500L, "0x02000064")))

  private def nameAt(slot: Long): String = cfg.forkAtSlotValue(slot).name
  private def versionAt(slot: Long): String = cfg.forkAtSlotValue(slot).version

  /** Raw rows every 500 slots over [0, 50000] — sampling (interval 1000)
    * hits every other row. */
  private def rawOf(payload: Long => String) =
    (0L to 50000L by 500L).map(s => (s, payload(s))).toDF("slot", "payload")

  test("named-version payloads: transitions recovered at sample resolution") {
    val raw = rawOf(s => s"""{"version": "${nameAt(s)}", "data": {}}""")
    val epochs = ForkDetect.detectForkEpochs(raw, cfg)
    assert(epochs("phase0") === 0L)
    // altair activates at slot 1600; first sampled slot >= 1600 is 2000 ->
    // epoch 125 (the reference's documented <= interval overshoot)
    assert(epochs("altair") === 125L)
    // bellatrix activates at slot 8000 — exactly on a sample point
    assert(epochs("bellatrix") === 500L)
  }

  test("hex-version payloads map back through the preset's fork versions") {
    val raw = rawOf(s => s"""{"version": "${versionAt(s)}", "data": {}}""")
    val epochs = ForkDetect.detectForkEpochs(raw, cfg)
    assert(epochs("altair") === 125L)
    assert(epochs("bellatrix") === 500L)
    // clients differ on 0X / hex-digit case — matching is case-insensitive
    val shouty = rawOf(s => s"""{"version": "${versionAt(s).toUpperCase}", "data": {}}""")
    val fromShouty = ForkDetect.detectForkEpochs(shouty, cfg)
    assert(fromShouty("altair") === 125L)
    assert(fromShouty("bellatrix") === 500L)
  }

  test("empty table and single-fork tables fall back to the preset schedule") {
    val empty = Seq.empty[(Long, String)].toDF("slot", "payload")
    assert(ForkDetect.detectForkEpochs(empty, cfg) ===
      Map("phase0" -> 0L, "altair" -> 100L, "bellatrix" -> 500L))
    // a table that never leaves phase0 detects <3 forks -> supplemented
    val flat = rawOf(_ => """{"version": "phase0", "data": {}}""")
    val epochs = ForkDetect.detectForkEpochs(flat, cfg)
    assert(epochs("altair") === 100L) // preset value, not a phantom detection
    assert(epochs("bellatrix") === 500L)
  }

  test("configFromDetection overrides epochs, keeps names/versions/timing") {
    val raw = rawOf(s => s"""{"version": "${nameAt(s)}", "data": {}}""")
    val detected = ForkDetect.configFromDetection(raw, cfg)
    assert(detected.network === "testnet")
    assert(detected.forks.map(_.name) === Seq("phase0", "altair", "bellatrix"))
    assert(detected.forks.find(_.name == "altair").get.epoch === 125L)
    assert(detected.forks.find(_.name == "altair").get.version === "0x01000064")
    // malformed payloads are skipped, not crashed on
    val noisy = rawOf(s =>
      if (s % 2000L == 0L) "not json at all"
      else s"""{"version": "${nameAt(s)}", "data": {}}""")
    val fromNoisy = ForkDetect.detectForkEpochs(noisy, cfg)
    assert(fromNoisy("bellatrix") >= 500L) // still detected from clean samples
  }
}
