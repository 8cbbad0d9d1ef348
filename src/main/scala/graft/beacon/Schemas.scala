package graft.beacon

import org.apache.spark.sql.types._

/** Explicit `StructType`s for every beacon payload shape (never inferred —
  * SURVEY §1.3). One MAXIMAL block schema covers all forks: `from_json`
  * yields null for absent fields, and the projection layer applies per-fork
  * defaults. This replaces the reference's per-fork parser-class dispatch
  * (src/parsers/fork_base.py inheritance chain) with a single parse pass —
  * at 100 TB that's one JSON scan instead of a fork-grouped shuffle + N
  * parse passes.
  *
  * All numeric beacon-API fields arrive as JSON *strings* (hex or decimal),
  * so the schema keeps them StringType and the projection uses the
  * hex-aware `safe_long` expression (C1).
  */
object Schemas {

  /** Raw slot-keyed table (reference: migrations/003_raw_tables.sql). */
  val rawTable: StructType = StructType(Seq(
    StructField("slot", LongType, nullable = false),
    StructField("payload", StringType, nullable = true),
    StructField("payload_hash", StringType, nullable = true),
    StructField("retrieved_at", TimestampType, nullable = true)))

  private def S(name: String) = StructField(name, StringType, nullable = true)
  private def arr(e: DataType) = ArrayType(e, containsNull = true)

  val checkpoint: StructType = StructType(Seq(S("epoch"), S("root")))

  val attestationData: StructType = StructType(Seq(
    S("slot"), S("index"), S("beacon_block_root"),
    StructField("source", checkpoint), StructField("target", checkpoint)))

  val attestation: StructType = StructType(Seq(
    S("aggregation_bits"), S("signature"),
    StructField("data", attestationData)))

  val signedHeader: StructType = StructType(Seq(
    StructField("message", StructType(Seq(
      S("slot"), S("proposer_index"), S("parent_root"), S("state_root"), S("body_root")))),
    S("signature")))

  val indexedAttestation: StructType = StructType(Seq(
    StructField("attesting_indices", arr(StringType)),
    S("signature"),
    StructField("data", attestationData)))

  val withdrawal: StructType = StructType(Seq(
    S("index"), S("validator_index"), S("address"), S("amount")))

  val executionPayload: StructType = StructType(Seq(
    S("parent_hash"), S("fee_recipient"), S("state_root"), S("receipts_root"),
    S("logs_bloom"), S("prev_randao"), S("block_number"), S("gas_limit"),
    S("gas_used"), S("timestamp"), S("extra_data"), S("base_fee_per_gas"),
    S("block_hash"),
    StructField("transactions", arr(StringType)),
    StructField("withdrawals", arr(withdrawal)),    // Capella+
    S("blob_gas_used"), S("excess_blob_gas")))      // Deneb+

  val executionRequests: StructType = StructType(Seq(
    StructField("deposits", arr(StructType(Seq(
      S("pubkey"), S("withdrawal_credentials"), S("amount"), S("signature"), S("index"))))),
    StructField("withdrawals", arr(StructType(Seq(
      S("source_address"), S("validator_pubkey"), S("amount"))))),
    StructField("consolidations", arr(StructType(Seq(
      S("source_address"), S("source_pubkey"), S("target_pubkey")))))))

  val blockBody: StructType = StructType(Seq(
    S("randao_reveal"), S("graffiti"),
    StructField("eth1_data", StructType(Seq(
      S("deposit_root"), S("deposit_count"), S("block_hash")))),
    StructField("attestations", arr(attestation)),
    StructField("deposits", arr(StructType(Seq(
      StructField("proof", arr(StringType)),
      StructField("data", StructType(Seq(
        S("pubkey"), S("withdrawal_credentials"), S("amount"), S("signature")))))))),
    StructField("voluntary_exits", arr(StructType(Seq(
      S("signature"),
      StructField("message", StructType(Seq(S("epoch"), S("validator_index")))))))),
    StructField("proposer_slashings", arr(StructType(Seq(
      StructField("signed_header_1", signedHeader),
      StructField("signed_header_2", signedHeader))))),
    StructField("attester_slashings", arr(StructType(Seq(
      StructField("attestation_1", indexedAttestation),
      StructField("attestation_2", indexedAttestation))))),
    StructField("sync_aggregate", StructType(Seq(            // Altair+
      S("sync_committee_bits"), S("sync_committee_signature")))),
    StructField("execution_payload", executionPayload),      // Bellatrix+
    StructField("bls_to_execution_changes", arr(StructType(Seq( // Capella+
      S("signature"),
      StructField("message", StructType(Seq(
        S("validator_index"), S("from_bls_pubkey"), S("to_execution_address")))))))),
    StructField("blob_kzg_commitments", arr(StringType)),    // Deneb+
    StructField("execution_requests", executionRequests)))   // Electra+

  /** Variant view for the reference's `_parse_attesting_indices`
    * tolerance (phase0.py:87-190): some CL clients emit attesting_indices
    * as a CSV string or scalar instead of an array. This minimal schema
    * re-reads ONLY the slashing indices as strings; the parser coalesces
    * array → CSV-split. */
  val attesterSlashingsCsvVariant: StructType = {
    val indexed = StructType(Seq(S("attesting_indices")))
    val slashing = StructType(Seq(
      StructField("attestation_1", indexed),
      StructField("attestation_2", indexed)))
    StructType(Seq(StructField("data", StructType(Seq(
      StructField("message", StructType(Seq(
        StructField("body", StructType(Seq(
          StructField("attester_slashings", arr(slashing)))))))))))))
  }

  /** Full signed-block envelope `/eth/v2/beacon/blocks/{slot}`
    * (reference: src/parsers/fork_base.py:86-139, FIXTURES.md §2). */
  val blockPayload: StructType = StructType(Seq(
    S("version"),
    StructField("data", StructType(Seq(
      StructField("message", StructType(Seq(
        S("slot"), S("proposer_index"), S("parent_root"), S("state_root"),
        StructField("body", blockBody)))),
      S("signature")))),
    // PERMISSIVE from_json parses malformed JSON to the SAME all-null
    // struct as a legitimately sparse `{}` — this corrupt-record capture
    // (populated only on parse failure) is the only way to tell them
    // apart, and blocks() uses it to refuse phantom default rows
    S("_corrupt_record")))

  /** `/eth/v1/beacon/states/{id}/validators` (reference:
    * src/parsers/validators.py:11-47, FIXTURES.md §3). */
  val validatorsPayload: StructType = StructType(Seq(
    StructField("data", arr(StructType(Seq(
      S("index"), S("balance"), S("status"),
      StructField("validator", StructType(Seq(
        S("pubkey"), S("withdrawal_credentials"), S("effective_balance"),
        StructField("slashed", BooleanType, nullable = true),
        S("activation_eligibility_epoch"), S("activation_epoch"),
        S("exit_epoch"), S("withdrawable_epoch"))))))))))

  /** `/eth/v1/beacon/rewards/blocks/{slot}` (reference:
    * src/parsers/rewards.py:11-40). */
  val rewardsPayload: StructType = StructType(Seq(
    StructField("data", StructType(Seq(
      S("proposer_index"), S("total"), S("attestations"), S("sync_aggregate"),
      S("proposer_slashings"), S("attester_slashings"))))))

  /** Electra pending-state queues (reference: src/parsers/electra.py:98-145). */
  val pendingConsolidationsPayload: StructType = StructType(Seq(
    StructField("data", arr(StructType(Seq(S("source_index"), S("target_index")))))))

  val pendingDepositsPayload: StructType = StructType(Seq(
    StructField("data", arr(StructType(Seq(
      S("pubkey"), S("withdrawal_credentials"), S("amount"), S("signature"), S("slot")))))))

  val pendingPartialWithdrawalsPayload: StructType = StructType(Seq(
    StructField("data", arr(StructType(Seq(
      S("validator_index"), S("amount"), S("withdrawable_epoch")))))))

  /** Fulu PeerDAS data column sidecars (reference:
    * src/parsers/data_column_sidecars.py:15-74). */
  val dataColumnSidecarsPayload: StructType = StructType(Seq(
    StructField("data", arr(StructType(Seq(
      S("index"),
      StructField("column", arr(StringType)),
      StructField("kzg_commitments", arr(StringType)),
      StructField("kzg_proofs", arr(StringType)),
      StructField("signed_block_header", StructType(Seq(
        StructField("message", StructType(Seq(
          S("slot"), S("proposer_index"), S("body_root")))),
        S("signature"))))))))))

  /** Deneb blob sidecars `/eth/v1/beacon/blobs/{slot}`. */
  val blobSidecarsPayload: StructType = StructType(Seq(
    StructField("data", arr(StructType(Seq(
      S("index"), S("kzg_commitment"), S("kzg_proof"), S("blob")))))))

  /** Chunk work ledger (reference: migrations/004_state_tables.sql:1-12). */
  val loadStateChunks: StructType = StructType(Seq(
    StructField("chunk_id", StringType, nullable = false),
    StructField("start_slot", LongType, nullable = false),
    StructField("end_slot", LongType, nullable = false),
    StructField("loader_name", StringType, nullable = false),
    StructField("status", StringType, nullable = false), // pending|claimed|completed|failed
    StructField("worker_id", StringType, nullable = true),
    StructField("created_at", TimestampType, nullable = true),
    StructField("updated_at", TimestampType, nullable = true),
    StructField("insert_version", LongType, nullable = false)))

  /** Transform progress ledger (reference: migrations/004_state_tables.sql:14-27). */
  val transformerProgress: StructType = StructType(Seq(
    StructField("raw_table_name", StringType, nullable = false),
    StructField("start_slot", LongType, nullable = false),
    StructField("end_slot", LongType, nullable = false),
    StructField("status", StringType, nullable = false), // processing|completed|failed
    StructField("processed_count", LongType, nullable = false),
    StructField("failed_count", LongType, nullable = false),
    StructField("error_message", StringType, nullable = true),
    StructField("processed_at", TimestampType, nullable = true),
    StructField("insert_version", LongType, nullable = false)))

  /** Compaction log — one row per month partition rewritten by
    * `maintain compact` (the MergeTree merge analogue; Compaction.scala).
    * Append-only with insert_version like the other ledgers. */
  val compactionLog: StructType = StructType(Seq(
    StructField("table_name", StringType, nullable = false),
    StructField("month", StringType, nullable = false),
    StructField("files_before", LongType, nullable = false),
    StructField("files_after", LongType, nullable = false),
    StructField("rows_before", LongType, nullable = false),
    StructField("rows_after", LongType, nullable = false),
    StructField("bytes_before", LongType, nullable = false),
    StructField("bytes_after", LongType, nullable = false),
    StructField("compacted_at", TimestampType, nullable = false),
    StructField("insert_version", LongType, nullable = false)))
}
