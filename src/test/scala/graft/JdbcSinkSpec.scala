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

  test("per-table write chunks follow the reference's sizing") {
    assert(ClickHouseSink.writeChunk("transactions") === 100)
    assert(ClickHouseSink.writeChunk("attestations") === 500)
    assert(ClickHouseSink.writeChunk("validators") === 1000)
    assert(ClickHouseSink.writeChunk("blocks") === 10000)
  }
}
