package graft.beacon

import graft.functions.GraftFunctions.{hex_popcount, safe_long, safe_long_null}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame}

/** The fork-aware block parse layer (reference: src/parsers P1–P17), as a
  * single `from_json` pass with one MAXIMAL schema + per-table column
  * projections. Fork awareness is declarative: fields absent in older forks
  * parse as null and default at projection; the `version` column is the
  * constant-folded fork-schedule CASE chain (C10). No per-row dispatch, no
  * fork-grouped shuffle (the reference's D3 step disappears).
  *
  * Every projection is codegen-friendly (`explode`/`posexplode`, nested
  * field access, the custom `safe_long`/`hex_popcount` expressions) so the
  * whole parse of one output table is a single WholeStageCodegen span over
  * the raw scan.
  */
object BlockParser {

  import Schemas._

  /** Attach the parsed payload struct. Callers fanning out to many tables
    * should `.persist()` the result so the JSON parse happens once
    * (SURVEY §7.4 multi-output transform). */
  def withParsed(raw: DataFrame): DataFrame =
    raw.withColumn("p", from_json(col("payload"), blockPayload,
      Map("mode" -> "PERMISSIVE", "columnNameOfCorruptRecord" -> "_corrupt_record")))

  /** Nested-path field access on a struct Column (`Column.apply` treats
    * "a.b" as one field name, so split and chain getField). */
  private def field(c: Column, path: String): Column =
    path.split("\\.").foldLeft(c)(_.getField(_))

  private def msg(path: String): Column = field(col("p").getField("data").getField("message"), path)
  private def body(path: String): Column = msg("body." + path)
  private def bodyCol: Column = col("p").getField("data").getField("message").getField("body")

  import ParseHelpers.{s, l, withMeta}

  // counts are UInt64 in the reference schema → LongType uniformly (a
  // mixed int/long landscape breaks schema-sensitive unions downstream)
  private def sizeOr0(c: Column): Column = coalesce(size(c), lit(0)).cast("long")

  /** P1: blocks — header/eth1 projection + derived counts + popcount
    * participation (reference: fork_base.py:86-139). Valid-but-sparse
    * JSON (`{}`) yields a defaults row — the reference's dict.get
    * defaults — but an UNPARSEABLE payload (from_json → NULL) must not
    * fabricate a phantom block with proposer 0 and empty roots; the
    * reference raises there. We skip the row (documented divergence:
    * skip vs fail-the-chunk), so every emitted row came from real JSON.
    *
    * "Unparseable" must mean the JSON DOCUMENT failed, not any schema
    * mismatch: PERMISSIVE from_json sets `_corrupt_record` for a single
    * mistyped field too (e.g. the CSV-string attesting_indices variant
    * this engine deliberately tolerates — see [[attesterSlashings]]),
    * while still parsing every other field. Dropping on `_corrupt_record`
    * alone would silently lose the whole block row for a payload whose
    * slashings we DO parse. A parsed field (like `message.slot`) is NOT
    * proof either: partial-results mode keeps every field parsed BEFORE
    * the failure, so a TRUNCATED body (proxy cut mid-stream) carries a
    * real slot and all-null body fields — the exact phantom. The
    * discriminator is a STRUCTURAL probe of the document envelope:
    * `get_json_object(payload, '$.data')` returns null for
    * malformed/truncated JSON and for well-formed NON-block documents (a
    * bare JSON scalar/array from a misbehaving proxy — probing just `'$'`
    * would echo those and fabricate the phantom), but answers normally on
    * a valid enveloped document with a mistyped field — including one
    * legitimately missing `data.message.slot` (probing the slot path
    * would drop that row, stricter than "the block document parses").
    * Evaluated only on corrupt rows (rare), so the second parse is off
    * the hot path. */
  def blocks(parsed: DataFrame, cfg: ChainConfig): DataFrame =
    parsed
      .filter(col("p").isNotNull &&
        (col("p").getField("_corrupt_record").isNull ||
          get_json_object(col("payload"), "$.data").isNotNull))
      .select(
      col("slot"),
      l(msg("proposer_index")).as("proposer_index"),
      s(msg("parent_root")).as("parent_root"),
      s(msg("state_root")).as("state_root"),
      s(col("p.data.signature")).as("signature"),
      cfg.forkVersionAtSlot(col("slot")).as("version"),
      s(body("randao_reveal")).as("randao_reveal"),
      s(body("graffiti")).as("graffiti"),
      s(body("eth1_data.deposit_root")).as("eth1_deposit_root"),
      l(body("eth1_data.deposit_count")).as("eth1_deposit_count"),
      s(body("eth1_data.block_hash")).as("eth1_block_hash"),
      coalesce(hex_popcount(body("sync_aggregate.sync_committee_bits")), lit(0))
        .cast("long").as("sync_aggregate_participation"),
      sizeOr0(body("execution_payload.withdrawals")).as("withdrawals_count"),
      sizeOr0(body("blob_kzg_commitments")).as("blob_kzg_commitments_count"),
      (sizeOr0(body("execution_requests.deposits")) +
        sizeOr0(body("execution_requests.withdrawals")) +
        sizeOr0(body("execution_requests.consolidations"))).as("execution_requests_count"))

  /** P2: attestations — posexplode + checkpoint flattening
    * (reference: fork_base.py:163-186). */
  def attestations(parsed: DataFrame): DataFrame =
    parsed
      .select(col("slot"), posexplode(body("attestations")).as(Seq("pos", "att")))
      .select(
        col("slot"),
        col("pos").cast("long").as("attestation_index"),
        s(col("att.aggregation_bits")).as("aggregation_bits"),
        s(col("att.signature")).as("signature"),
        // reference `safe_int(att_data.get("slot", slot), slot)`: BOTH a
        // missing field AND an unparseable value fall back to the block
        // slot — safe_long (garbage → 0) would turn garbage into slot 0
        coalesce(safe_long_null(col("att.data.slot")), col("slot")).as("attestation_slot"),
        l(col("att.data.index")).as("committee_index"),
        s(col("att.data.beacon_block_root")).as("beacon_block_root"),
        l(col("att.data.source.epoch")).as("source_epoch"),
        s(col("att.data.source.root")).as("source_root"),
        l(col("att.data.target.epoch")).as("target_epoch"),
        s(col("att.data.target.root")).as("target_root"))

  /** P3: deposits (reference: phase0.py:29-44). */
  def deposits(parsed: DataFrame): DataFrame =
    parsed
      .select(col("slot"), posexplode(body("deposits")).as(Seq("pos", "d")))
      .select(
        col("slot"),
        col("pos").cast("long").as("deposit_index"),
        s(col("d.data.pubkey")).as("pubkey"),
        s(col("d.data.withdrawal_credentials")).as("withdrawal_credentials"),
        l(col("d.data.amount")).as("amount"),
        s(col("d.data.signature")).as("signature"),
        coalesce(col("d.proof"), array()).as("proof"))

  /** P4: voluntary_exits (reference: phase0.py:46-59). */
  def voluntaryExits(parsed: DataFrame): DataFrame =
    parsed
      .select(col("slot"), posexplode(body("voluntary_exits")).as(Seq("pos", "e")))
      .select(
        col("slot"),
        col("pos").cast("long").as("exit_index"),
        s(col("e.signature")).as("signature"),
        l(col("e.message.epoch")).as("epoch"),
        l(col("e.message.validator_index")).as("validator_index"))

  /** P5: proposer_slashings — two signed headers flattened to 12 columns
    * (reference: phase0.py:61-85). */
  def proposerSlashings(parsed: DataFrame): DataFrame = {
    def header(prefix: String, h: Column) = Seq(
      l(field(h, "message.slot")).as(s"${prefix}_slot"),
      l(field(h, "message.proposer_index")).as(s"${prefix}_proposer_index"),
      s(field(h, "message.parent_root")).as(s"${prefix}_parent_root"),
      s(field(h, "message.state_root")).as(s"${prefix}_state_root"),
      s(field(h, "message.body_root")).as(s"${prefix}_body_root"),
      s(h("signature")).as(s"${prefix}_signature"))
    parsed
      .select(col("slot"), posexplode(body("proposer_slashings")).as(Seq("pos", "ps")))
      .select(
        (col("slot") +: col("pos").cast("long").as("slashing_index") +:
          (header("header_1", col("ps.signed_header_1")) ++
            header("header_2", col("ps.signed_header_2")))): _*)
  }

  /** P6: attester_slashings — indexed attestations + derived validator
    * counts and distinct-union total (reference: phase0.py:87-190). */
  def attesterSlashings(parsed: DataFrame): DataFrame = {
    // CSV/scalar fallback (reference _parse_attesting_indices): the main
    // maximal schema nulls a non-array attesting_indices; re-read just
    // those fields as strings and split on ','. `av` = the variant struct
    // for the SAME exploded slashing (element_at by pos).
    def indices(a: Column, av: Column): Column =
      coalesce(
        transform(a("attesting_indices"), x => l(x)),
        transform(split(av("attesting_indices"), ","), x => l(trim(x))),
        array().cast("array<long>"))
    def att(prefix: String, a: Column, av: Column) = Seq(
      l(field(a, "data.slot")).as(s"${prefix}_slot"),
      l(field(a, "data.index")).as(s"${prefix}_committee_index"),
      s(field(a, "data.beacon_block_root")).as(s"${prefix}_beacon_block_root"),
      l(field(a, "data.source.epoch")).as(s"${prefix}_source_epoch"),
      s(field(a, "data.source.root")).as(s"${prefix}_source_root"),
      l(field(a, "data.target.epoch")).as(s"${prefix}_target_epoch"),
      s(field(a, "data.target.root")).as(s"${prefix}_target_root"),
      s(a("signature")).as(s"${prefix}_signature"),
      indices(a, av).as(s"${prefix}_attesting_indices"),
      size(indices(a, av)).cast("long").as(s"${prefix}_validator_count"))
    val variant = from_json(col("payload"), Schemas.attesterSlashingsCsvVariant)
      .getField("data").getField("message").getField("body")
      .getField("attester_slashings")
    parsed
      .select(
        col("slot"), col("payload"),
        posexplode(body("attester_slashings")).as(Seq("pos", "as")))
      .select(
        col("slot"), col("pos"), col("as"),
        // the CSV fallback re-parse of the whole payload is gated per row:
        // only when the maximal schema nulled an attesting_indices array
        // (the rare scalar/CSV variant) does the second from_json run —
        // the common path never pays a double payload parse
        when(
          col("as.attestation_1.attesting_indices").isNull ||
            col("as.attestation_2.attesting_indices").isNull,
          element_at(variant, col("pos") + 1)).as("asv"))
      .select(
        (col("slot") +: col("pos").cast("long").as("slashing_index") +:
          (att("att_1", col("as.attestation_1"), col("asv.attestation_1")) ++
            att("att_2", col("as.attestation_2"), col("asv.attestation_2")) :+
            size(array_union(
              indices(col("as.attestation_1"), col("asv.attestation_1")),
              indices(col("as.attestation_2"), col("asv.attestation_2"))))
              .cast("long").as("total_slashed_validators"))): _*)
  }

  /** P7: sync_aggregates (Altair+; null-gated, no fork branch needed)
    * (reference: altair.py:15-60). */
  def syncAggregates(parsed: DataFrame): DataFrame =
    parsed
      .filter(bodyCol.getField("sync_aggregate").isNotNull)
      .select(
        col("slot"),
        s(body("sync_aggregate.sync_committee_bits")).as("sync_committee_bits"),
        s(body("sync_aggregate.sync_committee_signature")).as("sync_committee_signature"),
        coalesce(hex_popcount(body("sync_aggregate.sync_committee_bits")), lit(0))
          .cast("long").as("participation_count"),
        coalesce(hex_popcount(body("sync_aggregate.sync_committee_bits")), lit(0))
          .cast("long").as("participating_validators"))

  /** P8: execution_payloads (Bellatrix+, Deneb blob-gas and Capella
    * withdrawal-count fields default to 0 on older forks)
    * (reference: bellatrix.py:15-58, deneb.py:36-41, capella.py:41-43). */
  def executionPayloads(parsed: DataFrame): DataFrame = {
    val ep = bodyCol.getField("execution_payload")
    parsed
      .filter(ep.isNotNull)
      .select(
        col("slot"),
        s(ep("parent_hash")).as("parent_hash"),
        s(ep("fee_recipient")).as("fee_recipient"),
        s(ep("state_root")).as("state_root"),
        s(ep("receipts_root")).as("receipts_root"),
        s(ep("logs_bloom")).as("logs_bloom"),
        s(ep("prev_randao")).as("prev_randao"),
        l(ep("block_number")).as("block_number"),
        l(ep("gas_limit")).as("gas_limit"),
        l(ep("gas_used")).as("gas_used"),
        l(ep("timestamp")).as("timestamp"),
        s(ep("base_fee_per_gas")).as("base_fee_per_gas"),
        s(ep("block_hash")).as("block_hash"),
        s(ep("extra_data")).as("extra_data"),
        coalesce(size(ep("transactions")), lit(0)).cast("long").as("transactions_count"),
        l(ep("blob_gas_used")).as("blob_gas_used"),
        l(ep("excess_blob_gas")).as("excess_blob_gas"),
        coalesce(size(ep("withdrawals")), lit(0)).cast("long").as("withdrawals_count"))
  }

  /** P9: transactions — raw tx hex list exploded with block-level columns
    * broadcast onto each row. `transaction_hash` is a STABLE placeholder
    * (xxhash64 masked to 32 bits) replacing the reference's
    * process-salted Python `hash()` (bellatrix.py:93-96) — documented
    * divergence, the reference itself is non-reproducible here. */
  def transactions(parsed: DataFrame): DataFrame = {
    val ep = bodyCol.getField("execution_payload")
    parsed
      .filter(ep.isNotNull)
      .select(
        col("slot"),
        l(ep("block_number")).as("block_number"),
        s(ep("block_hash")).as("block_hash"),
        s(ep("fee_recipient")).as("fee_recipient"),
        l(ep("gas_limit")).as("gas_limit"),
        l(ep("gas_used")).as("gas_used"),
        s(ep("base_fee_per_gas")).as("base_fee_per_gas"),
        posexplode(ep("transactions")).as(Seq("pos", "tx")))
      .select(
        col("slot"), col("block_number"), col("block_hash"),
        col("pos").cast("long").as("transaction_index"),
        format_string("tx_hash_%08x", xxhash64(col("tx")).bitwiseAND(lit(0xffffffffL)))
          .as("transaction_hash"),
        col("fee_recipient"), col("gas_limit"), col("gas_used"),
        col("base_fee_per_gas"),
        lit("").as("from_address"), lit("").as("to_address"),
        lit("").as("value"), lit(0L).as("gas_price"), lit(0L).as("nonce"),
        lit("").as("input"))
  }

  /** P10: withdrawals (Capella+) (reference: capella.py:22-43). */
  def withdrawals(parsed: DataFrame): DataFrame = {
    val ep = bodyCol.getField("execution_payload")
    parsed
      .select(
        col("slot"),
        l(ep("block_number")).as("block_number"),
        s(ep("block_hash")).as("block_hash"),
        posexplode(ep("withdrawals")).as(Seq("pos", "w")))
      .select(
        col("slot"), col("block_number"), col("block_hash"),
        l(col("w.index")).as("withdrawal_index"),
        l(col("w.validator_index")).as("validator_index"),
        s(col("w.address")).as("address"),
        l(col("w.amount")).as("amount"))
  }

  /** P11: bls_changes (Capella+) (reference: capella.py:46-60). */
  def blsChanges(parsed: DataFrame): DataFrame =
    parsed
      .select(col("slot"), posexplode(body("bls_to_execution_changes")).as(Seq("pos", "c")))
      .select(
        col("slot"),
        col("pos").cast("long").as("change_index"),
        s(col("c.signature")).as("signature"),
        l(col("c.message.validator_index")).as("validator_index"),
        s(col("c.message.from_bls_pubkey")).as("from_bls_pubkey"),
        s(col("c.message.to_execution_address")).as("to_execution_address"))

  /** P12: blob_commitments (Deneb+) (reference: deneb.py:22-33). */
  def blobCommitments(parsed: DataFrame): DataFrame =
    parsed
      .select(col("slot"), posexplode(body("blob_kzg_commitments")).as(Seq("pos", "c")))
      .select(
        col("slot"),
        col("pos").cast("long").as("commitment_index"),
        s(col("c")).as("commitment"))

  /** P14: execution_requests (Electra+) — whole object kept as a JSON
    * string + counts; row emitted only when any count > 0
    * (reference: electra.py:53-84). */
  def executionRequestsTable(parsed: DataFrame): DataFrame = {
    val er = bodyCol.getField("execution_requests")
    parsed
      .filter(er.isNotNull)
      .select(
        col("slot"),
        coalesce(get_json_object(col("payload"), "$.data.message.body.execution_requests"),
          lit("")).as("payload"),
        sizeOr0(er("deposits")).as("deposits_count"),
        sizeOr0(er("withdrawals")).as("withdrawals_count"),
        sizeOr0(er("consolidations")).as("consolidations_count"))
      .filter(
        col("deposits_count") > 0 || col("withdrawals_count") > 0 ||
          col("consolidations_count") > 0)
  }

  /** All block-derived tables (the 1-raw-source → 13-table fan-out of
    * SURVEY §3.2). Pass `persist = true` when materializing more than a
    * couple of tables so the JSON parse runs once. */
  def parseAll(
      raw: DataFrame, cfg: ChainConfig, insertVersion: Long = 0L,
      allowedTables: Option[Set[String]] = None): Map[String, DataFrame] = {
    // accept either raw rows or an already-parsed (possibly persisted) frame
    val parsed = if (raw.columns.contains("p")) raw else withParsed(raw)
    val all = Map(
      "blocks" -> blocks(parsed, cfg),
      "attestations" -> attestations(parsed),
      "deposits" -> deposits(parsed),
      "voluntary_exits" -> voluntaryExits(parsed),
      "proposer_slashings" -> proposerSlashings(parsed),
      "attester_slashings" -> attesterSlashings(parsed),
      "sync_aggregates" -> syncAggregates(parsed),
      "execution_payloads" -> executionPayloads(parsed),
      "transactions" -> transactions(parsed),
      "withdrawals" -> withdrawals(parsed),
      "bls_changes" -> blsChanges(parsed),
      "blob_commitments" -> blobCommitments(parsed),
      "execution_requests" -> executionRequestsTable(parsed))
    val kept = allowedTables match { // F8 allowed-tables filter
      case Some(allow) => all.view.filterKeys(allow).toMap
      case None => all
    }
    kept.map { case (k, v) => k -> withMeta(v, cfg, insertVersion) }
  }
}
