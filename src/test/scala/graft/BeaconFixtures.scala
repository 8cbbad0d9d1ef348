package graft

/** Fixture payloads per FIXTURES.md — shapes from the reference's tests and
  * parsers (tests/test_pending_queues.py, src/parsers). */
object BeaconFixtures {

  /** Electra-era block with every body list populated (gnosis slot numbers:
    * electra starts at epoch 1337856 * 16 = 21405696). */
  val electraBlock: String =
    """{
      "version": "electra",
      "data": {
        "message": {
          "slot": "21405700", "proposer_index": "12345",
          "parent_root": "0xparent", "state_root": "0xstate",
          "body": {
            "randao_reveal": "0xrandao", "graffiti": "0x677261666669746900",
            "eth1_data": {"deposit_root": "0xdr", "deposit_count": "567", "block_hash": "0xbh"},
            "attestations": [
              {"aggregation_bits": "0xff01", "signature": "0xsig0",
               "data": {"slot": "21405699", "index": "3", "beacon_block_root": "0xbbr",
                        "source": {"epoch": "1337855", "root": "0xsrc"},
                        "target": {"epoch": "1337856", "root": "0xtgt"}}},
              {"aggregation_bits": "0x0f", "signature": "0xsig1",
               "data": {"slot": "21405698", "index": "7", "beacon_block_root": "0xbbr2",
                        "source": {"epoch": "1337855", "root": "0xsrc2"},
                        "target": {"epoch": "1337856", "root": "0xtgt2"}}}],
            "deposits": [
              {"proof": ["0xp1", "0xp2"],
               "data": {"pubkey": "0xpub1", "withdrawal_credentials": "0x00wc",
                        "amount": "32000000000", "signature": "0xdsig"}}],
            "voluntary_exits": [
              {"signature": "0xvsig", "message": {"epoch": "1337900", "validator_index": "42"}}],
            "proposer_slashings": [
              {"signed_header_1": {"signature": "0xh1sig",
                 "message": {"slot": "100", "proposer_index": "9", "parent_root": "0xh1p",
                             "state_root": "0xh1s", "body_root": "0xh1b"}},
               "signed_header_2": {"signature": "0xh2sig",
                 "message": {"slot": "100", "proposer_index": "9", "parent_root": "0xh2p",
                             "state_root": "0xh2s", "body_root": "0xh2b"}}}],
            "attester_slashings": [
              {"attestation_1": {"attesting_indices": ["1", "2", "3"], "signature": "0xa1sig",
                 "data": {"slot": "99", "index": "0", "beacon_block_root": "0xa1r",
                          "source": {"epoch": "10", "root": "0xa1sr"},
                          "target": {"epoch": "11", "root": "0xa1tr"}}},
               "attestation_2": {"attesting_indices": ["2", "3", "4", "5"], "signature": "0xa2sig",
                 "data": {"slot": "99", "index": "0", "beacon_block_root": "0xa2r",
                          "source": {"epoch": "10", "root": "0xa2sr"},
                          "target": {"epoch": "11", "root": "0xa2tr"}}}}],
            "sync_aggregate": {"sync_committee_bits": "0xffff", "sync_committee_signature": "0xscs"},
            "execution_payload": {
              "parent_hash": "0xeph", "fee_recipient": "0xfee", "state_root": "0xesr",
              "receipts_root": "0xerr", "logs_bloom": "0xbloom", "prev_randao": "0xpr",
              "block_number": "35000000", "gas_limit": "30000000", "gas_used": "12345678",
              "timestamp": "1746000000", "extra_data": "0xed",
              "base_fee_per_gas": "18446744073709551616",
              "block_hash": "0xebh",
              "transactions": ["0xtx0", "0xtx1", "0xtx2"],
              "withdrawals": [
                {"index": "9000", "validator_index": "77", "address": "0xaddr1", "amount": "123456"},
                {"index": "9001", "validator_index": "78", "address": "0xaddr2", "amount": "234567"}],
              "blob_gas_used": "131072", "excess_blob_gas": "0"},
            "bls_to_execution_changes": [
              {"signature": "0xblssig",
               "message": {"validator_index": "55", "from_bls_pubkey": "0xfbp",
                           "to_execution_address": "0xtea"}}],
            "blob_kzg_commitments": ["0xkzg1", "0xkzg2"],
            "execution_requests": {
              "deposits": [{"pubkey": "0xqp", "withdrawal_credentials": "0xqwc",
                            "amount": "1000000000", "signature": "0xqs", "index": "0"}],
              "withdrawals": [{"source_address": "0xsa", "validator_pubkey": "0xvp", "amount": "1"}],
              "consolidations": []}
          }
        },
        "signature": "0xblocksig"
      }
    }""".stripMargin

  /** Phase0-era minimal block (gnosis slot 5): no sync aggregate, no
    * execution payload — maximal-schema fields must default. */
  val phase0Block: String =
    """{
      "version": "phase0",
      "data": {
        "message": {
          "slot": "5", "proposer_index": "1",
          "parent_root": "0xp", "state_root": "0xs",
          "body": {
            "randao_reveal": "0xr", "graffiti": "0x00",
            "eth1_data": {"deposit_root": "0xd", "deposit_count": "1", "block_hash": "0xb"},
            "attestations": [],
            "deposits": [],
            "voluntary_exits": [],
            "proposer_slashings": [],
            "attester_slashings": []
          }
        },
        "signature": "0xsig"
      }
    }"""

  /** Validators snapshot with UInt64 sentinel epochs (FIXTURES.md §3). */
  val validatorsPayload: String =
    """{"data": [
      {"index": "0", "balance": "32004567890", "status": "active_ongoing",
       "validator": {"pubkey": "0xv0", "withdrawal_credentials": "0x02wc",
         "effective_balance": "32000000000", "slashed": false,
         "activation_eligibility_epoch": "0", "activation_epoch": "0",
         "exit_epoch": "18446744073709551615",
         "withdrawable_epoch": "18446744073709551615"}},
      {"index": "1", "balance": "31000000000", "status": "exited_slashed",
       "validator": {"pubkey": "0xv1", "withdrawal_credentials": "0x01wc",
         "effective_balance": "31000000000", "slashed": true,
         "activation_eligibility_epoch": "1", "activation_epoch": "2",
         "exit_epoch": "100", "withdrawable_epoch": "200"}}
    ]}"""

  val rewardsPayload: String =
    """{"data": {"proposer_index": "12345", "total": "45000000",
        "attestations": "40000000", "sync_aggregate": "3000000",
        "proposer_slashings": "2000000", "attester_slashings": "0"}}"""

  val pendingConsolidationsPayload: String =
    """{"data": [{"source_index": "100", "target_index": "200"},
                 {"source_index": "101", "target_index": "200"}]}"""

  val pendingDepositsPayload: String =
    """{"data": [{"pubkey": "0xabc123", "withdrawal_credentials": "0x0200deadbeef",
                  "amount": "1000000000", "signature": "0xsig", "slot": "27400000"}]}"""

  val pendingPartialWithdrawalsPayload: String =
    """{"data": [{"validator_index": "5001", "amount": "50000000",
                  "withdrawable_epoch": "1500000"}]}"""

  val emptyQueuePayload: String = """{"data": []}"""

  val dataColumnSidecarsPayload: String =
    """{"data": [
      {"index": "3",
       "column": ["0xaabb", "0xccddee"],
       "kzg_commitments": ["0xc1", "0xc2"],
       "kzg_proofs": ["0xp1"],
       "signed_block_header": {
         "message": {"slot": "27435008", "proposer_index": "88", "body_root": "0xbr"},
         "signature": "0xhs"}}
    ]}"""
}
