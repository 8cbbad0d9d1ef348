package graft

import graft.sources.ClickHouseSink
import org.apache.spark.sql.{SaveMode, SparkSession}
import org.scalatest.funsuite.AnyFunSuite

/** Wiring test for the ClickHouse-style JDBC sink against embedded Derby
  * (the only JDBC engine in this environment — the sink's option surface
  * is driver-agnostic; see ClickHouseSink scaladoc).
  */
class JdbcSinkSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkTestSession.spark
  import spark.implicits._

  private val url = "jdbc:derby:memory:graftdb;create=true"

  test("write + partitioned read-back roundtrip with per-table batch sizes") {
    val blocks = (0L until 500L)
      .map(s => (s, s % 64, s"0xroot$s"))
      .toDF("slot", "proposer_index", "parent_root")
    ClickHouseSink.write(blocks, url, "blocks_jdbc",
      mode = SaveMode.Overwrite, maxConnections = 4)
    // parallel partitioned read-back slices the slot range
    val back = ClickHouseSink.read(spark, url, "blocks_jdbc", "slot", 0L, 499L, 4)
    assert(back.rdd.getNumPartitions === 4)
    assert(back.count() === 500L)
    assert(back.agg(org.apache.spark.sql.functions.sum("proposer_index")).head().getLong(0)
      === (0L until 500L).map(_ % 64).sum)
    // append mode accumulates (the ledger, not transactions, provides
    // idempotency — R4)
    ClickHouseSink.write(blocks.limit(10), url, "blocks_jdbc")
    assert(ClickHouseSink.read(spark, url, "blocks_jdbc", "slot", 0L, 499L, 2)
      .count() === 510L)
  }

  test("K1 parity: parsed structured tables round-trip through the sink (insert_batch normalization)") {
    import graft.beacon._
    val cfg = ChainConfig.gnosis
    val raw = Seq(
      (21405700L, BeaconFixtures.electraBlock),
      (5L, BeaconFixtures.phase0Block))
      .map { case (s, p) =>
        (s, p, graft.functions.CanonicalJson.payloadHash16(p),
          new java.sql.Timestamp(1700000000000L))
      }
      .toDF("slot", "payload", "payload_hash", "retrieved_at")
    val tables = BlockParser.parseAll(raw, cfg, insertVersion = 7L)

    // deposits carries an ARRAY column (proof) — the reference stores
    // lists as json.dumps strings (clickhouse.py:456-461); blocks is the
    // all-scalar K1 shape. Both must survive write → partitioned read.
    Seq("blocks", "deposits").foreach { t =>
      val df = tables(t).drop("month")
      ClickHouseSink.write(df, url, s"k1_$t", mode = SaveMode.Overwrite,
        maxConnections = 2)
      val back = ClickHouseSink.read(spark, url, s"k1_$t", "slot", 0L, 21405700L, 2)
      val expect = ClickHouseSink.normalize(df)
      assert(back.columns.sorted === expect.columns.sorted)
      val key = if (t == "blocks") Seq("slot") else Seq("slot", "deposit_index")
      def rows(d: org.apache.spark.sql.DataFrame) = {
        val cols = d.columns.sorted.toSeq
        d.select(cols.head, cols.tail: _*).collect()
          .map(_.toSeq.map(String.valueOf).mkString("|")).sorted.toSeq
      }
      assert(rows(back) === rows(expect), s"$t did not round-trip")
    }
    // the array column really became a JSON string, with its values intact
    val proof = ClickHouseSink.read(spark, url, "k1_deposits", "slot", 0L, 21405700L, 1)
      .select("proof").collect().map(_.getString(0))
    assert(proof.forall(_.startsWith("[")))
    assert(proof.exists(_.contains("0x")))
  }

  test("per-table write chunks follow the reference's sizing") {
    assert(ClickHouseSink.writeChunk("transactions") === 100)
    assert(ClickHouseSink.writeChunk("attestations") === 500)
    assert(ClickHouseSink.writeChunk("validators") === 1000)
    assert(ClickHouseSink.writeChunk("blocks") === 10000)
  }
}
