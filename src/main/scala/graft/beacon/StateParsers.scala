package graft.beacon

import graft.functions.GraftFunctions.{hex_byte_length, safe_long}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame}

/** Parsers for the non-block raw tables: validator snapshots, block
  * rewards, Electra pending-state queues and sidecars (reference:
  * src/parsers/{validators,rewards,electra,deneb,data_column_sidecars}.py).
  *
  * Scale note (SURVEY §7.4): a validators payload is ONE JSON string with
  * 400k–2M entries. `from_json` + `explode` runs on executors and streams
  * the array out row-by-row — the driver never materializes it — so the
  * only knob is partition count of the raw scan (one payload per task is
  * the worst case, which is exactly what the reference tunes around).
  */
object StateParsers {

  import Schemas._
  // one definition of the safe_str/safe_int defaults and the
  // slot_timestamp/insert_version meta contract, shared with the block
  // parsers — two drifting copies once covered 20 output tables
  import ParseHelpers.{s, l, withMeta}

  /** P19: validators snapshot explode — the big-payload stress case.
    * UInt64 sentinel epochs (FAR_FUTURE = 2^64-1) clamp to Long.MaxValue
    * via `safe_long` (engine sentinel policy). `slashed` bool → 0/1. */
  def validators(raw: DataFrame, cfg: ChainConfig, insertVersion: Long = 0L): DataFrame =
    withMeta(
      raw
        .withColumn("p", from_json(col("payload"), validatorsPayload))
        .select(col("slot"), explode(col("p.data")).as("v"))
        .select(
          col("slot"),
          l(col("v.index")).cast("int").as("validator_index"),
          l(col("v.balance")).as("balance"),
          s(col("v.status")).as("status"),
          s(col("v.validator.pubkey")).as("pubkey"),
          s(col("v.validator.withdrawal_credentials")).as("withdrawal_credentials"),
          l(col("v.validator.effective_balance")).as("effective_balance"),
          when(col("v.validator.slashed"), 1).otherwise(0).as("slashed"),
          l(col("v.validator.activation_eligibility_epoch")).as("activation_eligibility_epoch"),
          l(col("v.validator.activation_epoch")).as("activation_epoch"),
          l(col("v.validator.exit_epoch")).as("exit_epoch"),
          l(col("v.validator.withdrawable_epoch")).as("withdrawable_epoch")),
      cfg, insertVersion)

  /** P20: rewards — `data` is a single object → 1 row of 7 components
    * (reference: rewards.py:11-40). */
  def rewards(raw: DataFrame, cfg: ChainConfig, insertVersion: Long = 0L): DataFrame =
    withMeta(
      raw
        .withColumn("p", from_json(col("payload"), rewardsPayload))
        .filter(col("p.data").isNotNull)
        .select(
          col("slot"),
          l(col("p.data.proposer_index")).as("proposer_index"),
          l(col("p.data.total")).as("total"),
          l(col("p.data.attestations")).as("attestations"),
          l(col("p.data.sync_aggregate")).as("sync_aggregate"),
          l(col("p.data.proposer_slashings")).as("proposer_slashings"),
          l(col("p.data.attester_slashings")).as("attester_slashings")),
      cfg, insertVersion)

  /** P15: pending_consolidations (reference: electra.py:98-111). */
  def pendingConsolidations(raw: DataFrame, cfg: ChainConfig, insertVersion: Long = 0L): DataFrame =
    withMeta(
      raw
        .withColumn("p", from_json(col("payload"), pendingConsolidationsPayload))
        .select(col("slot"), explode(col("p.data")).as("e"))
        .select(
          col("slot"),
          l(col("e.source_index")).as("source_index"),
          l(col("e.target_index")).as("target_index")),
      cfg, insertVersion)

  /** P16: pending_deposits — the queue entry's own `slot` becomes
    * `deposit_slot` (reference: electra.py:113-129). */
  def pendingDeposits(raw: DataFrame, cfg: ChainConfig, insertVersion: Long = 0L): DataFrame =
    withMeta(
      raw
        .withColumn("p", from_json(col("payload"), pendingDepositsPayload))
        .select(col("slot"), explode(col("p.data")).as("e"))
        .select(
          col("slot"),
          s(col("e.pubkey")).as("pubkey"),
          s(col("e.withdrawal_credentials")).as("withdrawal_credentials"),
          l(col("e.amount")).as("amount"),
          s(col("e.signature")).as("signature"),
          l(col("e.slot")).as("deposit_slot")),
      cfg, insertVersion)

  /** P17: pending_partial_withdrawals (reference: electra.py:131-145). */
  def pendingPartialWithdrawals(raw: DataFrame, cfg: ChainConfig, insertVersion: Long = 0L): DataFrame =
    withMeta(
      raw
        .withColumn("p", from_json(col("payload"), pendingPartialWithdrawalsPayload))
        .select(col("slot"), explode(col("p.data")).as("e"))
        .select(
          col("slot"),
          l(col("e.validator_index")).as("validator_index"),
          l(col("e.amount")).as("amount"),
          l(col("e.withdrawable_epoch")).as("withdrawable_epoch")),
      cfg, insertVersion)

  /** P13: blob_sidecars — sizes + STABLE placeholder hash (xxhash64-based,
    * replacing the reference's process-salted Python hash; deneb.py:45-67). */
  def blobSidecars(raw: DataFrame, cfg: ChainConfig, insertVersion: Long = 0L): DataFrame =
    withMeta(
      raw
        .withColumn("p", from_json(col("payload"), blobSidecarsPayload))
        .select(col("slot"), explode(col("p.data")).as("b"))
        .select(
          col("slot"),
          l(col("b.index")).as("blob_index"),
          s(col("b.kzg_commitment")).as("kzg_commitment"),
          s(col("b.kzg_proof")).as("kzg_proof"),
          coalesce(length(col("b.blob")), lit(0)).cast("long").as("blob_size"),
          format_string("blob_hash_%08x",
            xxhash64(coalesce(col("b.blob"), lit(""))).bitwiseAND(lit(0xffffffffL)))
            .as("blob_hash")),
      cfg, insertVersion)

  /** P21: Fulu data-column sidecars — cell counts, recursive hex byte
    * length (custom expression C5 aggregated over the array), and full
    * sha256 of the canonical JSON of each sub-list. For ASCII hex-string
    * arrays, Spark's `to_json` IS the Python canonical form (compact
    * separators, no non-ASCII), so `sha2(to_json(...))` matches the
    * reference byte-for-byte (data_column_sidecars.py:62-74). */
  def dataColumnSidecars(raw: DataFrame, cfg: ChainConfig, insertVersion: Long = 0L): DataFrame = {
    def arrOrEmpty(c: Column): Column = coalesce(c, array())
    def jsonHash(c: Column): Column = sha2(to_json(arrOrEmpty(c)), 256)
    withMeta(
      raw
        .withColumn("p", from_json(col("payload"), dataColumnSidecarsPayload))
        .select(col("slot"), explode(col("p.data")).as("sc"))
        .select(
          col("slot"),
          l(col("sc.index")).as("column_index"),
          coalesce(size(col("sc.column")), lit(0)).cast("long").as("column_cells"),
          // per-element coalesce: ONE null cell must not null the whole
          // fold (column_bytes=0 while column_cells counts the cell would
          // be internally inconsistent) — a null cell contributes 0 bytes
          coalesce(
            aggregate(col("sc.column"), lit(0L),
              (acc, x) => acc + coalesce(hex_byte_length(x).cast("long"), lit(0L))),
            lit(0L)).as("column_bytes"),
          coalesce(size(col("sc.kzg_commitments")), lit(0)).cast("long").as("kzg_commitments_count"),
          coalesce(size(col("sc.kzg_proofs")), lit(0)).cast("long").as("kzg_proofs_count"),
          l(col("sc.signed_block_header.message.slot")).as("signed_block_slot"),
          l(col("sc.signed_block_header.message.proposer_index")).as("proposer_index"),
          s(col("sc.signed_block_header.message.body_root")).as("body_root"),
          jsonHash(col("sc.column")).as("column_hash"),
          jsonHash(col("sc.kzg_commitments")).as("commitments_hash"),
          jsonHash(col("sc.kzg_proofs")).as("proofs_hash")),
      cfg, insertVersion)
  }
}
