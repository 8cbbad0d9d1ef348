package graft.beacon

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame}

/** One fork activation: name, activation epoch, 4-byte version string.
  * (Reference: config/forks.yaml, src/services/fork.py:104-251.) */
final case class Fork(name: String, epoch: Long, version: String)

/** Broadcast-as-literals network configuration: genesis timing + fork
  * schedule. The reference resolves this from the `specs`/`genesis` tables
  * at startup (D8/D9); we do the same via [[ChainConfig.fromSpecs]] and keep
  * static presets for the two production networks.
  *
  * Fork lookup (C10) compiles to a pure-Catalyst CASE WHEN chain over the
  * slot column — constant-folded, codegen'd, zero shuffle — instead of a
  * per-row dictionary probe.
  */
final case class ChainConfig(
    network: String,
    genesisTimeUnix: Long,
    secondsPerSlot: Long,
    slotsPerEpoch: Long,
    forks: Seq[Fork]) {

  require(forks.nonEmpty && forks.sortBy(_.epoch) == forks, "forks must be epoch-sorted")

  def startSlot(f: Fork): Long = f.epoch * slotsPerEpoch

  // C8/C9/C11 delegate to the static-parameter forms in GraftFunctions so
  // the slot-time arithmetic exists exactly once
  /** C9: slot → epoch. */
  def epochOf(slot: Column): Column =
    graft.functions.GraftFunctions.slot_epoch(slot, slotsPerEpoch)

  /** C8: slot → UTC timestamp. */
  def slotTimestamp(slot: Column): Column =
    graft.functions.GraftFunctions.slot_timestamp(slot, genesisTimeUnix, secondsPerSlot)

  /** C11: last slot of its UTC day. */
  def isLastSlotOfDay(slot: Column): Column =
    graft.functions.GraftFunctions.is_last_slot_of_day(slot, genesisTimeUnix, secondsPerSlot)

  /** C12 closed form: the last slot whose timestamp falls on `date`
    * (reference scans backward ≤200 slots; the arithmetic form is exact). */
  def lastSlotOfDay(date: java.time.LocalDate): Long = {
    val nextMidnight = date.plusDays(1).atStartOfDay(java.time.ZoneOffset.UTC).toEpochSecond
    // last slot with genesis + slot*sps < nextMidnight
    (nextMidnight - genesisTimeUnix - 1) / secondsPerSlot
  }

  /** C10: fork name at slot — descending CASE WHEN chain. */
  def forkAtSlot(slot: Column): Column =
    forks.sortBy(-_.epoch).foldRight(lit(forks.head.name): Column) { (f, acc) =>
      when(slot >= lit(startSlot(f)), lit(f.name)).otherwise(acc)
    }

  /** Fork version string at slot (`blocks.version` column). */
  def forkVersionAtSlot(slot: Column): Column =
    forks.sortBy(-_.epoch).foldRight(lit(forks.head.version): Column) { (f, acc) =>
      when(slot >= lit(startSlot(f)), lit(f.version)).otherwise(acc)
    }

  def forkAtSlotValue(slot: Long): Fork =
    forks.reverse.find(f => slot >= startSlot(f)).getOrElse(forks.head)

  def activationSlot(forkName: String): Option[Long] =
    forks.find(_.name == forkName).map(startSlot)
}

object ChainConfig {
  val FarFutureEpoch: BigInt = BigInt("18446744073709551615")

  private def versions(suffix: String): Map[String, String] = Map(
    "phase0" -> s"0x00000$suffix", "altair" -> s"0x01000$suffix",
    "bellatrix" -> s"0x02000$suffix", "capella" -> s"0x03000$suffix",
    "deneb" -> s"0x04000$suffix", "electra" -> s"0x05000$suffix",
    "fulu" -> s"0x06000$suffix")

  /** Mainnet defaults (reference: src/services/fork.py:363-388; Fulu not yet
    * scheduled on mainnet at snapshot time → omitted). */
  val mainnet: ChainConfig = {
    val v = versions("000")
    ChainConfig("mainnet", 1606824023L, 12L, 32L, Seq(
      Fork("phase0", 0L, v("phase0")),
      Fork("altair", 74240L, v("altair")),
      Fork("bellatrix", 144896L, v("bellatrix")),
      Fork("capella", 194048L, v("capella")),
      Fork("deneb", 269568L, v("deneb")),
      Fork("electra", 364032L, v("electra"))))
  }

  /** Gnosis defaults incl. the Fulu override epoch 1714688
    * (reference: src/services/fork.py:7, tests/test_fulu_support.py). */
  val gnosis: ChainConfig = {
    val v = versions("064")
    ChainConfig("gnosis", 1638993340L, 5L, 16L, Seq(
      Fork("phase0", 0L, v("phase0")),
      Fork("altair", 512L, v("altair")),
      Fork("bellatrix", 385536L, v("bellatrix")),
      Fork("capella", 648704L, v("capella")),
      Fork("deneb", 889856L, v("deneb")),
      Fork("electra", 1337856L, v("electra")),
      Fork("fulu", 1714688L, v("fulu"))))
  }

  /** D8: build the schedule from the `specs` k/v table + genesis time.
    * `%_FORK_EPOCH` rows beyond FAR_FUTURE are skipped; static defaults fill
    * gaps (reference: src/services/fork.py:104-251,363-388).
    */
  def fromSpecs(specs: DataFrame, genesisTimeUnix: Long, network: String): ChainConfig = {
    val base = if (network == "gnosis") gnosis else mainnet
    val kv = specs
      .select(lower(col("parameter_name")).as("k"), col("parameter_value").as("v"))
      .collect()
      .map(r => r.getString(0) -> r.getString(1))
      .toMap
    def longOf(k: String): Option[Long] =
      kv.get(k).flatMap(v => scala.util.Try(BigInt(v)).toOption)
        .filter(_ < FarFutureEpoch).map(_.toLong)
    val sps = longOf("seconds_per_slot").getOrElse(base.secondsPerSlot)
    val spe = longOf("slots_per_epoch").getOrElse(base.slotsPerEpoch)
    val updated = base.forks.map { f =>
      val withEpoch = longOf(s"${f.name}_fork_epoch").map(e => f.copy(epoch = e)).getOrElse(f)
      // version strings also arrive as `%_FORK_VERSION` spec rows
      kv.get(s"${f.name}_fork_version").filter(_.startsWith("0x"))
        .map(v => withEpoch.copy(version = v)).getOrElse(withEpoch)
    }
    // forks the spec announces that the STATIC preset lacks (e.g. fulu
    // once it is scheduled on mainnet): the derived schedule must
    // self-heal, not be capped at the preset's snapshot-time knowledge.
    // longOf already drops FAR_FUTURE placeholders.
    val known = updated.map(_.name).toSet
    val announced = kv.keys.collect {
      case k if k.endsWith("_fork_epoch") => k.stripSuffix("_fork_epoch")
    }.filterNot(known).toSeq.sorted
    val added = announced.flatMap { name =>
      longOf(s"${name}_fork_epoch").map { e =>
        Fork(name, e,
          kv.get(s"${name}_fork_version").filter(_.startsWith("0x")).getOrElse(""))
      }
    }
    val forks = (updated ++ added).sortBy(_.epoch)
    ChainConfig(network, genesisTimeUnix, sps, spe, forks)
  }
}
