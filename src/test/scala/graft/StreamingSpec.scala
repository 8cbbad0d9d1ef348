package graft

import graft.beacon._
import graft.streaming.StreamingJobs
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, Trigger}
import org.scalatest.funsuite.AnyFunSuite

import java.nio.file.Files

/** Per-slot fetch tally for the restart e2e — static so executor-side
  * fetcher instances (same JVM in local mode) all hit one map. */
object RestartFetchCounter {
  val counts = new java.util.concurrent.ConcurrentHashMap[
    Long, java.util.concurrent.atomic.AtomicLong]()
}

final case class CountingSlotFetcher(payloads: Map[Long, String]) extends SlotFetcher {
  def fetch(slot: Long): Option[String] = {
    RestartFetchCounter.counts
      .computeIfAbsent(slot, _ => new java.util.concurrent.atomic.AtomicLong())
      .incrementAndGet()
    payloads.get(slot)
  }
}

class StreamingSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkTestSession.spark
  import spark.implicits._

  private val cfg = ChainConfig.gnosis

  test("rawIngestStream: foreachBatch ingest with checkpoint + ledger (R1/R4)") {
    implicit val sq = spark.sqlContext
    val base = Files.createTempDirectory("graft_stream").toString
    val mem = MemoryStream[java.lang.Long]
    val payload = (s: Long) => s"""{"version":"phase0","data":{"message":{"slot":"$s"}}}"""
    val fetcher = MapSlotFetcher((0L until 50L).map(s => s -> payload(s)).toMap)
    mem.addData((0L until 50L).map(java.lang.Long.valueOf): _*)

    val q = StreamingJobs.rawIngestStream(
      mem.toDS(), cfg, fetcher, s"$base/raw", LedgerStore(s"$base/ledger"),
      "blocks", s"$base/ckpt")
    q.awaitTermination(60000)

    val raw = spark.read.parquet(s"$base/raw")
    assert(raw.count() === 50)
    val states = Ledger.chunkStates(
      LedgerStore(s"$base/ledger").read(spark, Schemas.loadStateChunks))
    assert(states.filter(col("status") === "completed").count() >= 1)
  }

  test("streamingExactDedup: first occurrence wins across batches (unbounded mode)") {
    implicit val sq = spark.sqlContext
    val mem = MemoryStream[(Long, String)]
    val out = StreamingJobs.streamingExactDedup(
      mem.toDF().toDF("doc_id", "text"), "text")
    val q = out.writeStream.format("memory").queryName("dedup_unbounded")
      .outputMode(OutputMode.Append).start()
    try {
      mem.addData((1L, "doc-a"), (2L, "doc-a"), (3L, "doc-b"))
      q.processAllAvailable()
      // cross-batch: the state store remembers doc-a and doc-b
      mem.addData((4L, "doc-b"), (5L, "doc-c"))
      q.processAllAvailable()
      val got = spark.table("dedup_unbounded")
        .select("doc_id").collect().map(_.getLong(0)).sorted.toSeq
      assert(got === Seq(1L, 3L, 5L))
      // the dedup column is internal — it must not leak into the output
      assert(!spark.table("dedup_unbounded").columns.contains("__content_hash"))
    } finally q.stop()
  }

  test("streamingExactDedup: watermarked mode drops in-window dups, evicts old state") {
    implicit val sq = spark.sqlContext
    val mem = MemoryStream[(Long, String, java.sql.Timestamp)]
    def ts(sec: Long) = new java.sql.Timestamp(sec * 1000L)
    val out = StreamingJobs.streamingExactDedup(
      mem.toDF().toDF("doc_id", "text", "ts"), "text",
      tsCol = Some("ts"), lateness = "10 seconds")
    val q = out.writeStream.format("memory").queryName("dedup_wm")
      .outputMode(OutputMode.Append).start()
    try {
      mem.addData((1L, "doc-a", ts(10)), (2L, "doc-a", ts(11)), (3L, "doc-b", ts(12)))
      q.processAllAvailable()
      // watermark is now 12s - 10s = 2s; doc-a's state is still live
      mem.addData((4L, "doc-c", ts(100)))
      q.processAllAvailable()
      // watermark is now 90s: doc-a's seen-hash (expiry 10s + 10s = 20s)
      // has been EVICTED — the same content passes again, which is the
      // bounded-state contract (in-window exact, out-of-window best-effort)
      mem.addData((5L, "doc-a", ts(200)))
      q.processAllAvailable()
      val got = spark.table("dedup_wm")
        .select("doc_id").collect().map(_.getLong(0)).sorted.toSeq
      assert(got === Seq(1L, 3L, 4L, 5L))
    } finally q.stop()
  }

  test("streamingHeavyHitters capacity=1: Boyer-Moore majority survives adversarial interleavings") {
    implicit val sq = spark.sqlContext
    val mem = MemoryStream[String]
    val out = StreamingJobs.streamingHeavyHitters(
      mem.toDF().toDF("k"), "k", capacity = 1, shards = 1)
    val q = out.writeStream.format("memory").queryName("hh_maj")
      .outputMode(OutputMode.Update).start()
    try {
      // 3 batches, each a different hostile shape: noise first (squatter
      // holds the slot), majority flood, then alternation — M has 16 of
      // 26 total arrivals (strict majority), so the final summary must
      // hold exactly M no matter how trims interleaved
      mem.addData("n1", "n2", "n3", "M", "n4")
      q.processAllAvailable()
      mem.addData(Seq.fill(12)("M"): _*)
      q.processAllAvailable()
      mem.addData("n5", "M", "n6", "M", "n7", "M", "n8", "n9")
      q.processAllAvailable()
      val rows = spark.table("hh_maj").collect()
        .map(r => (r.getString(1), r.getLong(2), r.getLong(3)))
      val maxSeq = rows.map(_._3).max
      assert(maxSeq === 3L, "every batch must bump the shard's seq")
      val fin = rows.filter(_._3 == maxSeq)
      assert(fin.map(_._1).toSeq === Seq("M"),
        s"majority key must be the unique survivor, got ${fin.toSeq}")
      assert(fin.head._2 >= 1L && fin.head._2 <= 16L,
        "held count is a positive lower bound")
    } finally q.stop()
  }

  test("streamingHeavyHitters: exact in the under-capacity regime; MG bounds under trim") {
    implicit val sq = spark.sqlContext
    val mem = MemoryStream[String]
    val out = StreamingJobs.streamingHeavyHitters(
      mem.toDF().toDF("k"), "k", capacity = 4, shards = 2)
    val q = out.writeStream.format("memory").queryName("hh")
      .outputMode(OutputMode.Update).start()
    try {
      // phase 1: few distinct keys — every shard under capacity → EXACT
      mem.addData("a", "a", "b", "a", "c")
      q.processAllAvailable()
      mem.addData("b", "a", "c", "c")
      q.processAllAvailable()
      // no trim in this phase → counts only grow, so max = the latest
      // emission per key (robust to the memory sink's row order)
      val snap = spark.table("hh")
        .groupBy("shard", "key").agg(org.apache.spark.sql.functions.max("countLb").as("c"))
        .collect().map(r => r.getString(1) -> r.getLong(2)).toMap
      assert(snap === Map("a" -> 4L, "b" -> 2L, "c" -> 3L))

      // phase 2: flood one shard past capacity with singletons plus a
      // heavy key — MG guarantees: counts are lower bounds, error per
      // shard ≤ n_shard/(capacity+1), the true heavy hitter survives
      val heavy = Seq.fill(40)("a")
      val noise = (0 until 20).map(i => s"n$i")
      mem.addData(heavy ++ noise: _*)
      q.processAllAvailable()
      // 'a' only ever gains mass faster than any trim decrement here, so
      // its max emission is its final count
      val snap2 = spark.table("hh")
        .groupBy("shard", "key").agg(org.apache.spark.sql.functions.max("countLb").as("c"))
        .collect().map(r => r.getString(1) -> r.getLong(2)).toMap
      val trueA = 44L // 4 from phase 1 + 40
      assert(snap2.contains("a"), s"heavy hitter evicted: $snap2")
      assert(snap2("a") <= trueA, "MG counts must be lower bounds")
      // total stream length bounds the error for ANY shard split
      val n = 9L + 60L
      assert(snap2("a") >= trueA - n / 5, s"error bound violated: ${snap2("a")}")
    } finally q.stop()
  }

  test("CountMinCounters streams: complete-mode sketch across batches equals the batch sketch") {
    implicit val sq = spark.sqlContext
    import graft.operators.Sketches
    val dep = 4; val w = 64
    val mem = MemoryStream[String]
    val agg = mem.toDF().toDF("tok")
      .agg(Sketches.countMinCounters(
        Sketches.cmPositions(col("tok"), dep, w), dep, w).as("cm"))
    val q = agg.writeStream.format("memory").queryName("cms")
      .outputMode(OutputMode.Complete).start()
    try {
      mem.addData("a", "b", "a")
      q.processAllAvailable()
      mem.addData("c", "a", "b")
      q.processAllAvailable()
      // complete mode: the memory table holds the latest global snapshot —
      // the sketch state survived the batch boundary and kept merging
      val streamed = spark.table("cms").collect().last.getSeq[Long](0)
      val batch = Seq("a", "b", "a", "c", "a", "b").toDF("tok")
        .agg(Sketches.countMinCounters(
          Sketches.cmPositions(col("tok"), dep, w), dep, w).as("cm"))
        .head().getSeq[Long](0)
      assert(streamed === batch,
        "streaming CM snapshot must equal the batch sketch of the whole stream")
      (0 until dep).foreach { r =>
        assert(streamed.slice(r * w, (r + 1) * w).sum === 6L, s"row $r mass")
      }
    } finally q.stop()
  }

  test("streamingSimhashDedup: near-dups flagged across batches, uniques admitted") {
    implicit val sq = spark.sqlContext
    val mem = MemoryStream[(Long, String)]
    val band = StreamingJobs.streamingSimhashDedup(
      mem.toDF().toDF("doc_id", "text"), "doc_id", "text")
    // foreachBatch folds band rows to per-doc verdicts and appends them —
    // the production wiring (second aggregation stays OUTSIDE the stream)
    val sink = scala.collection.mutable.ArrayBuffer[(Long, Long, Boolean)]()
    val q = band.writeStream
      .outputMode(OutputMode.Update)
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[StreamingJobs.BandVerdict], _: Long) =>
        StreamingJobs.nearDupVerdicts(batch.toDF()).collect().foreach { r =>
          sink.synchronized {
            sink += ((r.getAs[Long]("docId"),
              if (r.isNullAt(1)) -1L else r.getAs[Long]("dup_of"),
              r.getAs[Boolean]("is_dup")))
          }
        }
        ()
      }
      .start()
    try {
      val base = (1 to 60).map(i => s"w$i").mkString(" ")
      val nearDup = base.replace(" w30 ", " w30x ") // one-token edit
      val distinct = (1 to 60).map(i => s"z$i").mkString(" ")
      mem.addData((1L, base), (2L, distinct))
      q.processAllAvailable()
      // cross-batch: doc 3 is a near-dup of doc 1 (state remembers batch 1)
      mem.addData((3L, nearDup), (4L, (1 to 60).map(i => s"q$i").mkString(" ")))
      q.processAllAvailable()
      val verdicts = sink.synchronized(sink.toList).groupBy(_._1)
        .map { case (id, vs) => id -> vs.last }
      assert(!verdicts(1L)._3 && !verdicts(2L)._3 && !verdicts(4L)._3)
      assert(verdicts(3L)._3 && verdicts(3L)._2 === 1L,
        s"doc 3 should be flagged as near-dup of doc 1, got ${verdicts(3L)}")
      // identical content in the SAME batch also resolves (doc order), and
      // a re-arrival of an already-flagged variant matches the ADMITTED
      // representative (doc 1), not the dropped doc 3
      mem.addData((5L, base), (6L, nearDup))
      q.processAllAvailable()
      val v2 = sink.synchronized(sink.toList).groupBy(_._1)
        .map { case (id, vs) => id -> vs.last }
      assert(v2(5L)._3 && v2(5L)._2 === 1L) // matches the batch-1 signature
      assert(v2(6L)._3 && v2(6L)._2 === 1L) // doc 3 was never admitted
    } finally q.stop()
  }

  test("streamingMinhashDedup: batch-family near-dups flagged across batches") {
    implicit val sq = spark.sqlContext
    val mem = MemoryStream[(Long, String)]
    val band = StreamingJobs.streamingMinhashDedup(
      mem.toDF().toDF("doc_id", "text"), "doc_id", "text")
    val sink = scala.collection.mutable.ArrayBuffer[(Long, Long, Boolean)]()
    val q = band.writeStream
      .outputMode(OutputMode.Update)
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[StreamingJobs.BandVerdict], _: Long) =>
        StreamingJobs.nearDupVerdicts(batch.toDF()).collect().foreach { r =>
          sink.synchronized {
            sink += ((r.getAs[Long]("docId"),
              if (r.isNullAt(1)) -1L else r.getAs[Long]("dup_of"),
              r.getAs[Boolean]("is_dup")))
          }
        }
        ()
      }
      .start()
    try {
      val base = (1 to 60).map(i => s"w$i").mkString(" ")
      // one-token edit: 3-shingle Jaccard ≈ 0.90, probed to collide in a
      // band with 7/8 signature components equal (≥ minMatch 6) — the
      // recall ADVANTAGE over SimHash is measured statistically in the
      // SCALE streamdedup stage (0.99 vs 0.59 at 1M planted pairs); a
      // unit test pins the mechanism on a known-colliding pair
      val nearDup = base.replace(" w30 ", " w30x ")
      val distinct = (1 to 60).map(i => s"z$i").mkString(" ")
      mem.addData((1L, base), (2L, distinct))
      q.processAllAvailable()
      // cross-batch: doc 3 matches doc 1's admitted signature
      mem.addData((3L, nearDup), (4L, (1 to 60).map(i => s"q$i").mkString(" ")))
      q.processAllAvailable()
      val verdicts = sink.synchronized(sink.toList).groupBy(_._1)
        .map { case (id, vs) => id -> vs.last }
      assert(!verdicts(1L)._3 && !verdicts(2L)._3 && !verdicts(4L)._3)
      assert(verdicts(3L)._3 && verdicts(3L)._2 === 1L,
        s"doc 3 should be flagged as near-dup of doc 1, got ${verdicts(3L)}")
      // a re-arrival of a flagged variant matches the ADMITTED
      // representative (doc 1) — doc 3 was never admitted to state
      mem.addData((5L, base), (6L, nearDup))
      q.processAllAvailable()
      val v2 = sink.synchronized(sink.toList).groupBy(_._1)
        .map { case (id, vs) => id -> vs.last }
      assert(v2(5L)._3 && v2(5L)._2 === 1L)
      assert(v2(6L)._3 && v2(6L)._2 === 1L)
    } finally q.stop()
  }

  test("streamingMinhashDedup: state survives a checkpoint restart") {
    implicit val sq = spark.sqlContext
    val ckpt = java.nio.file.Files.createTempDirectory("graft_mhdedup_ckpt").toString
    val base = (1 to 60).map(i => s"w$i").mkString(" ")
    val sink = scala.collection.mutable.ArrayBuffer[(Long, Long)]()
    def start(mem: MemoryStream[(Long, String)]) =
      StreamingJobs.streamingMinhashDedup(
        mem.toDF().toDF("doc_id", "text"), "doc_id", "text")
        .writeStream
        .option("checkpointLocation", ckpt)
        .outputMode(OutputMode.Update)
        .foreachBatch { (batch: org.apache.spark.sql.Dataset[StreamingJobs.BandVerdict], _: Long) =>
          StreamingJobs.nearDupVerdicts(batch.toDF()).collect().foreach { r =>
            sink.synchronized {
              sink += ((r.getAs[Long]("docId"),
                if (r.isNullAt(1)) -1L else r.getAs[Long]("dup_of")))
            }
          }
          ()
        }
        .start()
    val mem1 = MemoryStream[(Long, String)]
    val q1 = start(mem1)
    try { mem1.addData((1L, base)); q1.processAllAvailable() } finally q1.stop()
    // run 2: fresh source on the same checkpoint — the admitted signature
    // must come back from the state store
    val mem2 = MemoryStream[(Long, String)]
    mem2.addData((1L, base))
    val q2 = start(mem2)
    try {
      mem2.addData((2L, base.replace(" w30 ", " w30x ")))
      q2.processAllAvailable()
    } finally q2.stop()
    val verdicts = sink.synchronized(sink.toList).toMap
    assert(verdicts(1L) === -1L)
    assert(verdicts(2L) === 1L,
      s"post-restart near-dup must match the pre-restart admitted doc, got $verdicts")
  }

  test("streamingSimhashDedup: bucket state survives a checkpoint restart") {
    implicit val sq = spark.sqlContext
    val ckpt = java.nio.file.Files.createTempDirectory("graft_simdedup_ckpt").toString
    // same (base, one-token-edit) pair as the cross-batch test above —
    // a pair KNOWN to collide in at least one 16-bit band
    val base = (1 to 60).map(i => s"w$i").mkString(" ")
    val sink = scala.collection.mutable.ArrayBuffer[(Long, Long)]()
    def start(mem: MemoryStream[(Long, String)]) =
      StreamingJobs.streamingSimhashDedup(
        mem.toDF().toDF("doc_id", "text"), "doc_id", "text")
        .writeStream
        .option("checkpointLocation", ckpt)
        .outputMode(OutputMode.Update)
        .foreachBatch { (batch: org.apache.spark.sql.Dataset[StreamingJobs.BandVerdict], _: Long) =>
          StreamingJobs.nearDupVerdicts(batch.toDF()).collect().foreach { r =>
            sink.synchronized {
              sink += ((r.getAs[Long]("docId"),
                if (r.isNullAt(1)) -1L else r.getAs[Long]("dup_of")))
            }
          }
          ()
        }
        .start()
    // run 1: admit the base document, then STOP (simulated crash/restart)
    val mem1 = MemoryStream[(Long, String)]
    val q1 = start(mem1)
    try { mem1.addData((1L, base)); q1.processAllAvailable() } finally q1.stop()
    // run 2: a NEW source on the same checkpoint — the band buckets must
    // remember doc 1's signature from the state store, not recompute it.
    // The fresh MemoryStream's offset 0 is already committed in the
    // checkpoint, so batch 0 is a replay filler the restart skips; the
    // real post-restart data rides offset 1.
    val mem2 = MemoryStream[(Long, String)]
    mem2.addData((1L, base))
    val q2 = start(mem2)
    try {
      mem2.addData((2L, base.replace(" w30 ", " w30x ")))
      q2.processAllAvailable()
    } finally q2.stop()
    val verdicts = sink.synchronized(sink.toList).toMap
    assert(verdicts(1L) === -1L)
    assert(verdicts(2L) === 1L,
      s"post-restart near-dup must match the pre-restart admitted doc, got $verdicts")
  }

  test("slotStream pacing law: never emits slots faster than the chain (R1 fix)") {
    // mainnet cadence: 12 s per slot. Simulate 120 s of rate-source ticks —
    // exactly slots start..start+10 may be emitted, one per period, and at
    // any elapsed T the max emitted slot is start + T/12 (never ahead).
    val start = 9000000L
    val emitted = (0L to 120L).flatMap(StreamingJobs.slotAtTick(start, 12L, _))
    assert(emitted === (start to start + 10L))
    (0L to 120L).foreach { t =>
      val maxSoFar = (0L to t).flatMap(StreamingJobs.slotAtTick(start, 12L, _)).maxOption
      assert(maxSoFar.forall(_ <= start + t / 12L), s"slot ahead of chain at t=$t")
    }
    // gnosis cadence 5 s: 1/5 would truncate to rowsPerSecond=0→1 in the old
    // code (12 slots emitted in 12 s); the law emits only 3
    assert((0L to 12L).flatMap(StreamingJobs.slotAtTick(0L, 5L, _)).length === 3)
  }

  test("dataCursor law: poll cursor capped below the earliest unrepaired hole") {
    import graft.streaming.ChunkedTail.dataCursor
    assert(dataCursor(499L, Set.empty) === 499L)
    assert(dataCursor(499L, Set((300L, 399L))) === 299L) // later success must not mask the hole
    assert(dataCursor(499L, Set((300L, 399L), (100L, 199L))) === 99L) // earliest hole wins
    assert(dataCursor(250L, Set((300L, 399L))) === 250L) // hole above the cursor: no cap
  }

  test("healHoles law: coverage by the union of completed ranges, any granularity") {
    import graft.streaming.ChunkedTail.healHoles
    val hole = Set((100L, 199L))
    // exact tuple still heals
    assert(healHoles(hole, Set((100L, 199L))) === Set.empty)
    // repaired at a DIFFERENT granularity: two half-chunks cover the hole
    assert(healHoles(hole, Set((100L, 149L), (150L, 199L))) === Set.empty)
    // overhanging coverage heals too
    assert(healHoles(hole, Set((0L, 249L))) === Set.empty)
    // partial coverage does NOT heal
    assert(healHoles(hole, Set((100L, 149L))) === hole)
    assert(healHoles(hole, Set((100L, 149L), (151L, 199L))) === hole) // 1-slot gap
    // unrelated completions leave the hole alone; other holes unaffected
    assert(healHoles(hole + ((300L, 399L)), Set((100L, 199L), (0L, 99L))) ===
      Set((300L, 399L)))
    assert(healHoles(Set.empty[(Long, Long)], Set((0L, 99L))) === Set.empty)
  }

  test("TailChunkSource laws: chunk-aligned offsets, head-delay watermark, monotone") {
    import graft.streaming.TailChunkSource._
    // resume -1 (empty) -> first boundary 0; mid-chunk resume rounds up
    assert(boundaryAfter(-1L, 100L) === 0L)
    assert(boundaryAfter(99L, 100L) === 100L)
    assert(boundaryAfter(100L, 100L) === 200L)
    // latest = head - delay aligned DOWN to a complete chunk (R2 + R3)
    assert(completeBoundary(350L, 50L, 100L) === 300L) // target 300 -> [0,299] complete
    assert(completeBoundary(349L, 50L, 100L) === 300L) // target 299 still completes [200,299]
    assert(completeBoundary(348L, 50L, 100L) === 200L) // target 298 does not
    assert(completeBoundary(99L, 100L, 100L) === 0L)   // nothing complete yet
  }

  test("MicroBatchStream tail e2e: readStream produces IDENTICAL ledger rows to the driver loop") {
    import graft.streaming.{ChunkedTail, HeadProbe, StreamingJobs, TailChunkSource}
    val baseA = Files.createTempDirectory("graft_mbs_loop").toString
    val baseB = Files.createTempDirectory("graft_mbs_stream").toString
    @volatile var head = 350L
    val probe = new HeadProbe { def headSlot(): Long = head }
    val payload = (s: Long) => s"""{"version":"phase0","data":{"message":{"slot":"$s"}}}"""
    val fetcher = MapSlotFetcher( // every 5th slot 404-empty, like production
      (0L until 500L).collect { case s if s % 5 != 4 => s -> payload(s) }.toMap)
    def ledgerRows(base: String) = Ledger.chunkStates(
      LedgerStore(s"$base/cl").read(spark, Schemas.loadStateChunks))
      .select("loader_name", "start_slot", "end_slot", "status")
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getString(3))).toSet
    def rawSlots(base: String) = spark.read.parquet(s"$base/raw")
      .select("slot").collect().map(_.getLong(0)).sorted.toSeq

    // A: the driver loop (the reference-shaped path)
    val tail = new ChunkedTail(spark, cfg, fetcher, probe, s"$baseA/raw",
      LedgerStore(s"$baseA/cl"), chunkSize = 100L, slotDelay = 50L)
    val lastA = tail.run(1) // target 300 -> chunks [0,99] [100,199] [200,299]

    // B: the same scenario through spark.readStream
    TailChunkSource.registerProbe("mbs-e2e", probe)
    val q = StreamingJobs.chunkTailStream(spark, cfg, fetcher, "mbs-e2e",
      s"$baseB/raw", LedgerStore(s"$baseB/cl"), "blocks", s"$baseB/ckpt",
      chunkSize = 100L, slotDelay = 50L)
    q.awaitTermination(60000)
    assert(ledgerRows(baseB) === ledgerRows(baseA))
    assert(rawSlots(baseB) === rawSlots(baseA))
    assert(rawSlots(baseB).last === 298L) // nothing past head - delay (299 is 404-empty)

    // the head advances: a RESTART from the same checkpoint resumes at the
    // committed offset and ingests exactly the newly complete chunk
    head = 460L // target 410 -> [300,399] newly due
    tail.processAvailable(lastA)
    val q2 = StreamingJobs.chunkTailStream(spark, cfg, fetcher, "mbs-e2e",
      s"$baseB/raw", LedgerStore(s"$baseB/cl"), "blocks", s"$baseB/ckpt",
      chunkSize = 100L, slotDelay = 50L)
    q2.awaitTermination(60000)
    assert(ledgerRows(baseB) === ledgerRows(baseA))
    assert(rawSlots(baseB) === rawSlots(baseA))
    assert(rawSlots(baseB).last === 398L) // 399 is 404-empty
    // gauges follow the same law as the driver loop (head re-probed,
    // cursor at the last ingested chunk end, no holes)
    val g = graft.core.Observability.gaugeValues
    assert(g("chain_head_slot") === 460L)
    assert(g("ingest_last_slot_blocks") === 399L)
    assert(g("ingest_lag_slots_blocks") === 61L)
  }

  test("chunkTailStream: a failed chunk becomes a hole pinned in the lag gauges, then heals") {
    import graft.streaming.{HeadProbe, StreamingJobs, TailChunkSource}
    val base = Files.createTempDirectory("graft_mbs_hole").toString
    @volatile var head = 350L
    val probe = new HeadProbe { def headSlot(): Long = head }
    val payload = (s: Long) => s"""{"version":"phase0","data":{"message":{"slot":"$s"}}}"""
    val good = MapSlotFetcher((0L until 600L).map(s => s -> payload(s)).toMap)
    val holey = new SlotFetcher {
      def fetch(slot: Long): Option[String] =
        if (slot >= 100 && slot <= 199) throw new RuntimeException("node down for 100s")
        else good.fetch(slot)
    }
    val ledger = LedgerStore(s"$base/cl")
    TailChunkSource.registerProbe("mbs-hole", probe)
    val q = StreamingJobs.chunkTailStream(spark, cfg, holey, "mbs-hole",
      s"$base/raw", ledger, "blocks", s"$base/ckpt",
      chunkSize = 100L, slotDelay = 50L)
    q.awaitTermination(60000) // target 300: [0,99] ok, [100,199] FAILS, [200,299] ok
    val g = graft.core.Observability.gaugeValues
    assert(g("ingest_last_slot_blocks") === 99L) // pinned below the hole
    assert(g("ingest_lag_slots_blocks") === 251L)
    // repair out-of-band (maintain-fix shape), head advances -> next run
    // heals the hole via the completed set and the gauge jumps forward
    assert(RawIngest.ingestChunk(spark, cfg, good, s"$base/raw", ledger,
      "blocks", 100L, 199L))
    head = 460L // [300,399] newly due
    val q2 = StreamingJobs.chunkTailStream(spark, cfg, holey, "mbs-hole",
      s"$base/raw", ledger, "blocks", s"$base/ckpt",
      chunkSize = 100L, slotDelay = 50L)
    q2.awaitTermination(60000)
    val g2 = graft.core.Observability.gaugeValues
    assert(g2("ingest_last_slot_blocks") === 399L)
    assert(g2("ingest_lag_slots_blocks") === 61L)
  }

  test("chunkTailStream daily mode: validators last-slot-of-day chunks match CompositeTail") {
    import graft.streaming.{CompositeTail, HeadProbe, StreamingJobs, TailChunkSource, TailLoader}
    val baseA = Files.createTempDirectory("graft_daily_loop").toString
    val baseB = Files.createTempDirectory("graft_daily_stream").toString
    @volatile var head = 3050L
    val probe = new HeadProbe { def headSlot(): Long = head }
    val validatorsPayload =
      """{"data":[{"index":"1","balance":"32","status":"active_ongoing",
        |"validator":{"pubkey":"0xv1","effective_balance":"32","slashed":false,
        |"activation_epoch":"0","exit_epoch":"100","withdrawal_credentials":"0x00"}}]}"""
        .stripMargin.replaceAll("\n", "")
    val valFetcher = MapSlotFetcher(
      (0L to 25000L).map(s => s -> validatorsPayload).toMap)
    def ledgerRows(p: String) = Ledger.chunkStates(
      LedgerStore(p).read(spark, Schemas.loadStateChunks))
      .select("loader_name", "start_slot", "end_slot", "status")
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getString(3))).toSet
    def rawSlots(p: String) = spark.read.parquet(p)
      .select("slot").distinct().collect().map(_.getLong(0)).sorted.toSeq

    // A: the composite driver loop, validators only (daily cadence)
    val tailA = new CompositeTail(spark, cfg, probe, baseA,
      LedgerStore(s"$baseA/chunks"),
      Seq(TailLoader(Loaders.validators, valFetcher)),
      chunkSize = 1000L, slotDelay = 50L, pollMillis = 1L)
    val lastA = tailA.run(1) // target 3000 -> daily slot 2931 only

    // B: the same cadence through spark.readStream (daily mode)
    TailChunkSource.registerProbe("mbs-daily", probe)
    val q = StreamingJobs.chunkTailStream(spark, cfg, valFetcher, "mbs-daily",
      s"$baseB/raw_validators", LedgerStore(s"$baseB/cl"), "validators",
      s"$baseB/ckpt", chunkSize = 1000L, slotDelay = 50L)
    q.awaitTermination(60000)
    assert(ledgerRows(s"$baseB/cl") === ledgerRows(s"$baseA/chunks"))
    assert(rawSlots(s"$baseB/raw_validators") === Seq(2931L))
    assert(rawSlots(s"$baseB/raw_validators") === rawSlots(s"$baseA/raw_validators"))

    // a day later (gnosis: 86400/5 = 17280 slots) both paths pick up
    // exactly the next day boundary
    head = 3050L + 17280L
    tailA.processAvailable(lastA)
    val q2 = StreamingJobs.chunkTailStream(spark, cfg, valFetcher, "mbs-daily",
      s"$baseB/raw_validators", LedgerStore(s"$baseB/cl"), "validators",
      s"$baseB/ckpt", chunkSize = 1000L, slotDelay = 50L)
    q2.awaitTermination(60000)
    assert(ledgerRows(s"$baseB/cl") === ledgerRows(s"$baseA/chunks"))
    assert(rawSlots(s"$baseB/raw_validators") === rawSlots(s"$baseA/raw_validators"))
    assert(rawSlots(s"$baseB/raw_validators").last === 20211L)
  }

  test("checkpoint restart: mid-batch kill + reorged-back head → no refetch, no offset regression") {
    import graft.streaming.{HeadProbe, StreamingJobs, TailChunkSource}
    val base = Files.createTempDirectory("graft_restart").toString
    @volatile var head = 350L
    val probe = new HeadProbe { def headSlot(): Long = head }
    val payload = (s: Long) => s"""{"version":"phase0","data":{"message":{"slot":"$s"}}}"""
    RestartFetchCounter.counts.clear()
    val fetcher = CountingSlotFetcher((0L until 500L).map(s => s -> payload(s)).toMap)
    TailChunkSource.registerProbe("mbs-restart", probe)
    val ledger = LedgerStore(s"$base/cl")
    def run(): Unit = {
      val q = StreamingJobs.chunkTailStream(spark, cfg, fetcher, "mbs-restart",
        s"$base/raw", ledger, "blocks", s"$base/ckpt",
        chunkSize = 100L, slotDelay = 50L)
      q.awaitTermination(60000)
    }
    def ledgerRows() = Ledger.chunkStates(ledger.read(spark, Schemas.loadStateChunks))
      .select("chunk_id", "status").collect()
      .map(r => (r.getString(0), r.getString(1))).toSet
    def fetchCounts() = {
      import scala.jdk.CollectionConverters._
      RestartFetchCounter.counts.asScala.map { case (s, n) => (s, n.get) }.toMap
    }
    def newestCheckpointBoundary(): Long = {
      val dir = new java.io.File(s"$base/ckpt/offsets")
      val f = dir.listFiles.filter(_.getName.forall(_.isDigit)).maxBy(_.getName.toLong)
      // HDFSOffsetLog: version line, metadata line, then one offset json
      // per source — ours is the bare boundary
      scala.io.Source.fromFile(f).getLines().toSeq.last.trim.toLong
    }

    run() // target 300 → chunks [0,99] [100,199] [200,299]
    val rows1 = ledgerRows()
    val counts1 = fetchCounts()
    assert(counts1.keySet === (0L until 300L).toSet)
    assert(counts1.values.forall(_ === 1L), "a slot was fetched more than once")
    assert(newestCheckpointBoundary() === 300L)

    // kill between the offset write and the batch commit: drop the newest
    // commit marker, so the restart must REPLAY that batch from the offset
    // log (the R4 case Spark's checkpoint contract guarantees can happen)
    val commitsDir = new java.io.File(s"$base/ckpt/commits")
    val newestCommit = commitsDir.listFiles
      .filter(_.getName.forall(_.isDigit)).maxBy(_.getName.toLong)
    assert(newestCommit.delete())
    // the local FS keeps a Hadoop checksum shadow; a stale one blocks the
    // re-commit rename on restart
    new java.io.File(commitsDir, s".${newestCommit.getName}.crc").delete()
    // ...and while we're down, the chain reorgs BACK below our offset
    head = 250L

    run() // replayed batch: ledger short-circuits — zero refetches
    assert(ledgerRows() === rows1, "replay mutated the ledger")
    assert(fetchCounts() === counts1, "replay refetched a committed chunk")
    // the reorged head must not regress the offset log (monotonicity guard)
    assert(newestCheckpointBoundary() === 300L)
    assert(spark.read.parquet(s"$base/raw").select("slot").distinct().count() === 300L)

    // the head recovers past the old offset: exactly the newly complete
    // chunk is planned — nothing before it is re-delivered or re-fetched
    head = 460L
    run() // target 410 → [300,399] only
    val counts3 = fetchCounts()
    assert(counts3.keySet === (0L until 400L).toSet)
    assert(counts3.values.forall(_ === 1L),
      "recovery re-fetched a slot from a committed chunk")
    assert(newestCheckpointBoundary() === 400L)
    assert(ledgerRows().size === rows1.size + 1)
  }

  test("auto-compact: behind-frontier months stay bounded across a long tail, latest() unchanged") {
    import graft.streaming.{HeadProbe, StreamingJobs, TailChunkSource}
    val base = Files.createTempDirectory("graft_autocompact").toString
    // 1 slot = 1 UTC day → a month rolls every ~30 slots; 5-slot chunks
    // give each month ~6 separate appends — the small-files regime a
    // months-long tail produces, scaled down to seconds
    val dayCfg = cfg.copy(secondsPerSlot = 86400L)
    @volatile var head = 100L
    val probe = new HeadProbe { def headSlot(): Long = head }
    val payload = (s: Long) => s"""{"version":"phase0","data":{"message":{"slot":"$s"}}}"""
    val fetcher = MapSlotFetcher((0L until 200L).map(s => s -> payload(s)).toMap)
    TailChunkSource.registerProbe("mbs-compact", probe)
    val ledger = LedgerStore(s"$base/cl")
    val clog = LedgerStore(s"$base/compaction_log")
    def run(): Unit = {
      val q = StreamingJobs.chunkTailStream(spark, dayCfg, fetcher, "mbs-compact",
        s"$base/raw", ledger, "blocks", s"$base/ckpt",
        chunkSize = 5L, slotDelay = 5L,
        chainedTransform = Some((s"$base/tables", LedgerStore(s"$base/tp"))),
        autoCompactMinFiles = 2, compactionLog = Some(clog))
      // AvailableNow stops itself once drained; under a loaded machine the
      // 19-chunk fetch+transform+compact chain can exceed 2 min — fail
      // HERE with a clear message rather than in a downstream month assert
      assert(q.awaitTermination(300000), "tail did not drain within 300 s")
    }
    def monthFiles(dir: String): Map[String, Int] =
      graft.core.Fs.listDirNames(spark, dir).filter(_.startsWith("month="))
        .map(m => m.stripPrefix("month=") ->
          graft.core.Fs.dataFileStats(spark, s"$dir/$m")._1).toMap
    run() // target 95 → chunks [0,4]..[90,94]

    val frontier1 = Compaction.frontierMonth(spark, ledger, dayCfg).get
    assert(frontier1 === Compaction.monthOfSlot(dayCfg, 94L))
    // every month strictly behind the frontier collapsed to one file, in
    // the raw table AND the chained structured table; the frontier month
    // was refused (still holds its per-chunk appends)
    Seq(s"$base/raw", s"$base/tables/blocks").foreach { dir =>
      val files = monthFiles(dir)
      assert(files.size >= 3, s"$dir spans $files") // the fixture really crosses months
      files.foreach { case (m, n) =>
        if (m < frontier1) assert(n === 1, s"$dir month $m not compacted: $n files")
        else assert(n >= 2, s"$dir frontier month $m was compacted under live ingest")
      }
    }
    // correctness unchanged: every ingested slot exactly once through FINAL
    assert(spark.read.parquet(s"$base/raw").select("slot").as[Long]
      .collect().sorted.toSeq === (0L to 94L))
    assert(Transformer.latestTable(spark, s"$base/tables", "blocks", Seq("slot"))
      .select("slot").as[Long].collect().sorted.toSeq === (0L to 94L))
    // the merge history landed in the compaction log
    assert(clog.read(spark, Schemas.compactionLog).count() >= 3)

    // the tail keeps running: head advances ~3 months, a restart on the
    // same checkpoint drains the new chunks and compacts what fell behind
    head = 200L
    run() // target 195 → chunks [95,99]..[190,194]
    val frontier2 = Compaction.frontierMonth(spark, ledger, dayCfg).get
    assert(frontier2 === Compaction.monthOfSlot(dayCfg, 194L))
    assert(frontier2 > frontier1)
    monthFiles(s"$base/raw").foreach { case (m, n) =>
      if (m < frontier2) assert(n === 1, s"raw month $m not compacted: $n files")
    }
    assert(spark.read.parquet(s"$base/raw").select("slot").as[Long]
      .collect().sorted.toSeq === (0L to 194L))
    assert(Transformer.latestTable(spark, s"$base/tables", "blocks", Seq("slot"))
      .select("slot").as[Long].collect().sorted.toSeq === (0L to 194L))
  }

  test("auto-compact: the driver-loop tail applies the same policy as the stream") {
    import graft.streaming.{ChunkedTail, HeadProbe}
    val base = Files.createTempDirectory("graft_autocompact_loop").toString
    val dayCfg = cfg.copy(secondsPerSlot = 86400L)
    val probe = new HeadProbe { def headSlot(): Long = 100L }
    val payload = (s: Long) => s"""{"version":"phase0","data":{"message":{"slot":"$s"}}}"""
    val fetcher = MapSlotFetcher((0L until 100L).map(s => s -> payload(s)).toMap)
    val ledger = LedgerStore(s"$base/cl")
    new ChunkedTail(spark, dayCfg, fetcher, probe, s"$base/raw", ledger,
      chunkSize = 5L, slotDelay = 5L, autoCompactMinFiles = 2,
      compactionLog = Some(LedgerStore(s"$base/compaction_log")))
      .run(1)
    val frontier = Compaction.frontierMonth(spark, ledger, dayCfg).get
    val months = graft.core.Fs.listDirNames(spark, s"$base/raw")
      .filter(_.startsWith("month=")).map(_.stripPrefix("month="))
    assert(months.count(_ < frontier) >= 2) // multiple cold months existed
    months.foreach { m =>
      val n = graft.core.Fs.dataFileStats(spark, s"$base/raw/month=$m")._1
      if (m < frontier) assert(n === 1, s"month $m not compacted: $n files")
    }
    assert(spark.read.parquet(s"$base/raw").select("slot").as[Long]
      .collect().sorted.toSeq === (0L to 94L))
    assert(LedgerStore(s"$base/compaction_log")
      .read(spark, Schemas.compactionLog).count() >= 2)
  }

  test("TailChunkSource.dailySlots: the shared daily-cadence law") {
    import graft.streaming.TailChunkSource.dailySlots
    val cfg = ChainConfig.gnosis
    // from the CompositeTail fixture: target 3000 -> 2931 only
    assert(dailySlots(cfg, 0L, 3000L) === Seq(2931L))
    // a full day later the next boundary appears
    assert(dailySlots(cfg, 0L, 21000L) === Seq(2931L, 20211L))
    // fromSlot excludes already-processed boundaries
    assert(dailySlots(cfg, 2932L, 21000L) === Seq(20211L))
    // floor skips pre-activation days; empty when nothing is due
    assert(dailySlots(cfg, 0L, 21000L, floor = 3000L) === Seq(20211L))
    assert(dailySlots(cfg, 0L, 2930L) === Seq.empty)
  }

  test("TailChunkMicroBatchStream: latestOffset never regresses on a reorged-back head") {
    import graft.streaming.{ChunkBoundaryOffset, HeadProbe, TailChunkMicroBatchStream}
    @volatile var head = 350L
    val stream = new TailChunkMicroBatchStream(
      new HeadProbe { def headSlot(): Long = head },
      chunkSize = 100L, slotDelay = 50L, resumeSlot = -1L)
    assert(stream.latestOffset() === ChunkBoundaryOffset(300L))
    head = 250L // probe reorgs back: target 200, but 300 was already returned
    assert(stream.latestOffset() === ChunkBoundaryOffset(300L))
    head = 500L // recovery advances past the mark again
    assert(stream.latestOffset() === ChunkBoundaryOffset(400L))
    // restart path: a checkpoint-restored offset seeds the high-water mark
    val restarted = new TailChunkMicroBatchStream(
      new HeadProbe { def headSlot(): Long = 250L },
      chunkSize = 100L, slotDelay = 50L, resumeSlot = -1L)
    restarted.deserializeOffset("300")
    assert(restarted.latestOffset() === ChunkBoundaryOffset(300L))
  }

  test("virtual-clock e2e: paceTicks → rawIngestStream at mainnet cadence (R1/R4)") {
    // 120 virtual seconds of rate-source ticks at 12 s/slot: the paced
    // stream must ingest EXACTLY slots 9000000..9000010, once each, and
    // ledger-complete the exact run — no wall-clock sleeps, no flakiness
    implicit val sq = spark.sqlContext
    val base = Files.createTempDirectory("graft_vclock").toString
    val start = 9000000L
    val mem = MemoryStream[Long]
    mem.addData(0L to 120L: _*)
    val ticks = mem.toDS().toDF("value")
    val paced = StreamingJobs.paceTicks(ticks, start, 12L)
    val payload = (s: Long) => s"""{"version":"phase0","data":{"message":{"slot":"$s"}}}"""
    val fetcher = MapSlotFetcher(
      (start to start + 100L).map(s => s -> payload(s)).toMap)
    val q = StreamingJobs.rawIngestStream(
      paced, cfg, fetcher, s"$base/raw", LedgerStore(s"$base/ledger"),
      "blocks", s"$base/ckpt")
    q.awaitTermination(60000)
    val slots = spark.read.parquet(s"$base/raw")
      .select("slot").collect().map(_.getLong(0)).sorted.toSeq
    assert(slots === (start to start + 10L)) // one row per slot, none ahead
    val states = Ledger.chunkStates(
      LedgerStore(s"$base/ledger").read(spark, Schemas.loadStateChunks))
      .filter(col("status") === "completed").collect()
    assert(states.map(r =>
      (r.getAs[Long]("start_slot"), r.getAs[Long]("end_slot"))).toSet
      === Set((start, start + 10L))) // one exact contiguous run
  }

  test("slotStream: rate source emits at most elapsed/secondsPerSlot slots (R1 fix)") {
    val q = StreamingJobs.slotStream(spark, 100L, 3L)
      .writeStream.outputMode(OutputMode.Append)
      .format("memory").queryName("slots_paced").start()
    val t0 = System.nanoTime()
    try {
      Thread.sleep(4000)
      q.processAllAvailable()
      val elapsedSec = (System.nanoTime() - t0) / 1e9
      val slots = spark.sql("SELECT * FROM slots_paced").as[Long].collect().sorted
      // upper bound is the pacing contract (robust under machine load, which
      // only slows emission); +1 covers the tick at t=0
      assert(slots.length <= elapsedSec / 3 + 1.5,
        s"emitted ${slots.length} slots in $elapsedSec s at 3 s/slot")
      assert(slots.headOption.forall(_ === 100L))
      assert(slots.toSeq === slots.toSeq.distinct, "duplicate slots emitted")
    } finally q.stop()
  }

  test("ledger version domain: maintenance and streaming transitions interleave correctly (R4 fix)") {
    implicit val sq = spark.sqlContext
    val base = Files.createTempDirectory("graft_verdom").toString
    val ledger = LedgerStore(s"$base/ledger")
    // 1) maintenance resets a chunk to pending with an epoch-millis version
    val chunk = Ledger.chunkRow(spark, "blocks", 0L, 4L)
    Maintenance.resetChunks(ledger, chunk, "pending")
    Thread.sleep(5) // strictly later millis for the stream's completion
    // 2) a LATER streaming batch completes the same range — its epoch-millis
    //    insert_version must outrank the maintenance row (a batchId 0,1,2…
    //    version could never win and the chunk would look pending forever)
    val mem = MemoryStream[java.lang.Long]
    val payload = (s: Long) => s"""{"version":"phase0","data":{"message":{"slot":"$s"}}}"""
    val fetcher = MapSlotFetcher((0L until 5L).map(s => s -> payload(s)).toMap)
    mem.addData((0L until 5L).map(java.lang.Long.valueOf): _*)
    val q = StreamingJobs.rawIngestStream(
      mem.toDS(), cfg, fetcher, s"$base/raw", ledger, "blocks", s"$base/ckpt")
    q.awaitTermination(60000)
    val state = Ledger.chunkStates(ledger.read(spark, Schemas.loadStateChunks))
      .filter(col("chunk_id") === Ledger.chunkId("blocks", 0L, 4L)).collect()
    assert(state.length === 1)
    assert(state(0).getAs[String]("status") === "completed")
  }

  test("windowedActivity: watermark + tumbling window over event-time (R2/R3)") {
    implicit val sq = spark.sqlContext
    val mem = MemoryStream[(java.sql.Timestamp, Long, Double)]
    val t0 = 1700000000000L
    val df = mem.toDF().toDF("ts", "user_id", "value")
    val agg = StreamingJobs.windowedActivity(df, "ts", "user_id")
    val q = agg.writeStream.outputMode(OutputMode.Append)
      .format("memory").queryName("wa").start()
    // batch 1: two rows in the first 5-minute window
    mem.addData((new java.sql.Timestamp(t0), 1L, 10.0),
      (new java.sql.Timestamp(t0 + 60000), 1L, 5.0))
    q.processAllAvailable()
    // batch 2: an event 30 minutes on advances the watermark past window 1
    mem.addData((new java.sql.Timestamp(t0 + 30 * 60000), 2L, 7.0))
    q.processAllAvailable()
    // batch 3: triggers emission of windows sealed by batch 2's watermark
    mem.addData((new java.sql.Timestamp(t0 + 40 * 60000), 2L, 1.0))
    q.processAllAvailable()
    val out = spark.sql("SELECT * FROM wa").collect()
    q.stop()
    // append mode emits only watermark-sealed windows: window 1 (2 rows,
    // user 1) must be out; the still-open latest window must NOT be
    assert(out.exists(r => r.getAs[Long]("user_id") == 1L && r.getAs[Long]("n") == 2L))
    assert(!out.exists(r => r.getAs[Long]("user_id") == 2L && r.getAs[Double]("total_value") == 1.0))
  }

  test("sessionWindows: native session_window matches batch w4_sessionization") {
    // same corpus, two constructions: the w4 lag/running-sum merge shape
    // and the engine's session_window — at gap = 1800+1 they must agree
    // on every (user, session) start time and event count
    val d = "/root/testdata/sf0.001"
    val w4 = graft.queries.Inventory.w4Sessionization(spark, d)
      .select("user_id", "start_s", "n_events").collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    val ev = graft.core.Tables.events(spark, d)
    val tsCol = ev.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        org.apache.spark.sql.functions.timestamp_micros(
          org.apache.spark.sql.functions.expr("ts div 1000"))
      case _ => org.apache.spark.sql.functions.col("ts")
    }
    val sw = StreamingJobs.sessionWindows(
      ev.withColumn("ts2", tsCol), "ts2", "user_id", gapSeconds = 1801L)
      .select(
        org.apache.spark.sql.functions.col("user_id"),
        org.apache.spark.sql.functions.unix_timestamp(
          org.apache.spark.sql.functions.col("session_start")).as("start_s"),
        org.apache.spark.sql.functions.col("n_events"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(sw == w4, s"native=${sw.size} w4=${w4.size}")
  }

  test("sessionWindows: streaming — watermark seals a session, open ones stay in state") {
    implicit val sq = spark.sqlContext
    val mem = MemoryStream[(java.sql.Timestamp, Long)]
    val t0 = 1700000000000L
    val df = mem.toDF().toDF("ts", "user_id")
    val out = StreamingJobs.sessionWindows(df, "ts", "user_id",
      gapSeconds = 60L, lateness = "0 seconds")
    val q = out.writeStream.outputMode(OutputMode.Append)
      .format("memory").queryName("sw").start()
    // user 1: two events 30 s apart — one session
    mem.addData((new java.sql.Timestamp(t0), 1L),
      (new java.sql.Timestamp(t0 + 30000), 1L))
    q.processAllAvailable()
    // an event far ahead advances the watermark past user 1's session end
    mem.addData((new java.sql.Timestamp(t0 + 10 * 60000), 2L))
    q.processAllAvailable()
    mem.addData((new java.sql.Timestamp(t0 + 20 * 60000), 2L))
    q.processAllAvailable()
    val rows = spark.sql("SELECT * FROM sw").collect()
    q.stop()
    val u1 = rows.filter(_.getAs[Long]("user_id") == 1L)
    assert(u1.length == 1 && u1.head.getAs[Long]("n_events") == 2L, rows.mkString(";"))
    // session end = last event + gap
    assert(u1.head.getAs[java.sql.Timestamp]("session_end").getTime == t0 + 30000 + 60000)
    // user 2's latest session is still open (watermark has not passed it)
    assert(!rows.exists(r => r.getAs[Long]("user_id") == 2L &&
      r.getAs[java.sql.Timestamp]("session_start").getTime == t0 + 20 * 60000))
  }

  test("attributionJoin: stream-stream join matches within the window, evicts beyond it") {
    implicit val sq = spark.sqlContext
    val t0 = 1700000000000L
    val clicks = MemoryStream[(Long, Long, java.sql.Timestamp)]
    val purchases = MemoryStream[(Long, Long, java.sql.Timestamp)]
    val out = StreamingJobs.attributionJoin(
      clicks.toDF().toDF("c_user", "click_id", "click_ts"),
      purchases.toDF().toDF("p_user", "purchase_id", "purchase_ts"),
      withinSeconds = 600L, lateness = "10 seconds")
    val q = out.writeStream.outputMode(OutputMode.Append)
      .format("memory").queryName("attr").start()
    clicks.addData((1L, 100L, new java.sql.Timestamp(t0)))
    q.processAllAvailable()
    purchases.addData(
      (1L, 200L, new java.sql.Timestamp(t0 + 300 * 1000)),  // in window
      (1L, 201L, new java.sql.Timestamp(t0 + 900 * 1000)),  // beyond 600 s
      (2L, 202L, new java.sql.Timestamp(t0 + 100 * 1000)))  // other user
    q.processAllAvailable()
    val rows = spark.sql("SELECT * FROM attr").collect()
    q.stop()
    assert(rows.length == 1, rows.mkString(";"))
    assert(rows.head.getAs[Long]("click_id") == 100L &&
      rows.head.getAs[Long]("purchase_id") == 200L &&
      rows.head.getAs[Long]("lag_s") == 300L)
  }

  test("attributionJoin left_outer: unmatched click emits with NULL once provably matchless") {
    implicit val sq = spark.sqlContext
    val t0 = 1700000000000L
    val clicks = MemoryStream[(Long, Long, java.sql.Timestamp)]
    val purchases = MemoryStream[(Long, Long, java.sql.Timestamp)]
    val out = StreamingJobs.attributionJoin(
      clicks.toDF().toDF("c_user", "click_id", "click_ts"),
      purchases.toDF().toDF("p_user", "purchase_id", "purchase_ts"),
      withinSeconds = 60L, lateness = "10 seconds", joinType = "left_outer")
    val q = out.writeStream.outputMode(OutputMode.Append)
      .format("memory").queryName("attr_lo").start()
    clicks.addData((1L, 100L, new java.sql.Timestamp(t0)))
    q.processAllAvailable()
    // no emission yet: a purchase inside the 60 s window could still come
    assert(spark.sql("SELECT * FROM attr_lo").count() == 0)
    // watermark advances far past click_ts + 60 s on BOTH streams
    clicks.addData((2L, 101L, new java.sql.Timestamp(t0 + 600 * 1000)))
    purchases.addData((2L, 200L, new java.sql.Timestamp(t0 + 601 * 1000)))
    q.processAllAvailable()
    clicks.addData((2L, 102L, new java.sql.Timestamp(t0 + 1200 * 1000)))
    purchases.addData((2L, 201L, new java.sql.Timestamp(t0 + 1201 * 1000)))
    q.processAllAvailable()
    val rows = spark.sql("SELECT * FROM attr_lo").collect()
    q.stop()
    val unmatched = rows.filter(_.getAs[Long]("click_id") == 100L)
    assert(unmatched.length == 1, rows.mkString(";"))
    assert(unmatched.head.isNullAt(unmatched.head.fieldIndex("purchase_id")))
    // the matched pair from user 2 also flows through
    assert(rows.exists(r => r.getAs[Long]("click_id") == 101L &&
      r.getAs[Long]("purchase_id") == 200L))
  }

  test("attributionJoin: batch parity — same construction on static frames") {
    import spark.implicits._
    val t0 = 1700000000000L
    val clicks = Seq((1L, 100L, new java.sql.Timestamp(t0)))
      .toDF("c_user", "click_id", "click_ts")
    val purchases = Seq(
      (1L, 200L, new java.sql.Timestamp(t0 + 300 * 1000)),
      (1L, 201L, new java.sql.Timestamp(t0 + 900 * 1000)))
      .toDF("p_user", "purchase_id", "purchase_ts")
    val got = StreamingJobs.attributionJoin(clicks, purchases, withinSeconds = 600L)
      .select("purchase_id").collect().map(_.getLong(0)).toSeq
    assert(got == Seq(200L))
  }

  test("streaming ANN index maintenance: foreachBatch append ≡ batch rebuild") {
    import graft.operators.Similarity
    // an embedding stream (e.g. freshly-ingested docs) keeps the serving
    // index current: each micro-batch appends with the FROZEN trained
    // params — the exactly-once-per-batch parquet append + manifest
    // rewrite is idempotent at the file level, and append ≡ rebuild
    // (RecallSpec) makes the maintained index canonical
    val corpus = Scale.genClusteredEmbCorpus(spark, 3000L, nClusters0 = 8).persist()
    val cents = Similarity.kmeansCentroids(corpus, "embedding", k = 8,
      iters = 3, seed = 42L, sampleN = 1000)
    val dir = java.nio.file.Files.createTempDirectory("ann_stream").toString
    // bootstrap: first 1000 vectors indexed as a batch
    Similarity.writeIvfIndex(corpus.filter(col("vec_id") < 1000), "embedding",
      cents, s"$dir/idx", withSq8Codes = true)
    // the remaining 2000 arrive as a 4-file parquet stream
    corpus.filter(col("vec_id") >= 1000).repartition(4)
      .write.parquet(s"$dir/in")
    val schema = spark.read.parquet(s"$dir/in").schema
    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", 1).parquet(s"$dir/in")
    val q = stream.writeStream
      .option("checkpointLocation", s"$dir/ckpt")
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        Similarity.appendToIvfIndex(batch, "embedding", cents, s"$dir/idx",
          withSq8Codes = true)
        ()
      }
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(120000)
    q.stop()
    assert(spark.read.parquet(s"$dir/idx").count() === 3000L)
    // probe parity against a one-shot rebuild over everything
    Similarity.writeIvfIndex(corpus, "embedding", cents, s"$dir/full",
      withSq8Codes = true)
    val qv = corpus.filter(col("vec_id") === 2500L)
      .select("embedding").head().getSeq[Float](0)
    def top(d: String) = Similarity.ivfSq8TopKIndexed(
      spark, d, "vec_id", "embedding", qv, k = 5, cents, nProbe = 4)
      .collect().map(_.getLong(0)).toSeq
    assert(top(s"$dir/idx") == top(s"$dir/full"))
    corpus.unpersist(blocking = false)
  }

  test("streaming drift tripwire: per-batch chi-squared vs frozen at-rest counts — zero for in-distribution, positive for drifted") {
    import graft.operators.Importance
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("drift_stream").toString
    val atRestDocs = (0L until 20L)
      .map(i => (i, "alpha beta gamma delta")).toDF("doc_id", "text")
    // the at-rest side is counted ONCE and frozen; each micro-batch
    // contributes only its own 32-row count table
    val atRest = Importance.bucketCounts(atRestDocs, "text", buckets = 32).persist()
    atRest.count()
    // batch files: one in-distribution (same text, same arity), one drifted
    (0L until 20L).map(i => (100L + i, "alpha beta gamma delta"))
      .toDF("doc_id", "text").coalesce(1).write.parquet(s"$dir/in/b0")
    (0L until 20L).map(i => (200L + i, "omega psi chi phi"))
      .toDF("doc_id", "text").coalesce(1).write.parquet(s"$dir/in/b1")
    val schema = spark.read.parquet(s"$dir/in/b0").schema
    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", 1).parquet(s"$dir/in/*")
    val q = stream.writeStream
      .option("checkpointLocation", s"$dir/ckpt")
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, batchId: Long) =>
        val drift = Importance.chiSquaredShiftFromCounts(
          atRest, Importance.bucketCounts(batch, "text", buckets = 32), 32)
          .agg(org.apache.spark.sql.functions.sum("contrib")).head().getDouble(0)
        val marker = batch.agg(org.apache.spark.sql.functions.min("doc_id"))
          .head().getLong(0)
        Seq((batchId, marker, drift)).toDF("batch_id", "min_doc", "chi2")
          .write.mode("append").parquet(s"$dir/out")
        ()
      }
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(120000)
    q.stop()
    val out = spark.read.parquet(s"$dir/out").collect()
      .map(r => r.getLong(1) -> r.getDouble(2)).toMap
    assert(out.size === 2)
    // identical distribution AND identical totals → every a·Nb == b·Na → exactly 0
    assert(out(100L) === 0.0, s"in-distribution batch drifted: ${out(100L)}")
    assert(out(200L) > 0.01, s"drifted batch not flagged: ${out(200L)}")
    atRest.unpersist(blocking = false)
  }

  test("streaming DSIR scoring: per-batch applyWeights with a frozen ratio table ≡ batch") {
    import graft.operators.Importance
    import spark.implicits._
    // the ingest-path curation shape: the ratio table is trained ONCE
    // offline (or merged incrementally), then every arriving micro-batch
    // is scored in one scan inside foreachBatch — no streaming aggregate,
    // no state store, verdicts appended exactly-once per batch
    val dir = java.nio.file.Files.createTempDirectory("dsir_stream").toString
    // background vocabulary is SHARED (8 words) so its source counts are
    // high and its ratios low; the target sample is large enough that
    // +B smoothing doesn't drown the signal (a 1-doc target would)
    val off = Array("zulu", "yankee", "xray", "whiskey",
      "victor", "uniform", "tango", "sierra")
    val docs = (0L until 40L).map { i =>
      val t =
        if (i % 4 == 0) "alpha beta gamma alpha"
        else (0 until 4).map(j => off(((i + j) % 8).toInt)).mkString(" ")
      (i, t)
    }.toDF("doc_id", "text")
    val target = (0L until 20L)
      .map(i => (1000L + i, "alpha beta gamma delta"))
      .toDF("doc_id", "text")
    val ratios = Importance.ratioTable(target, docs, "text", buckets = 64)
      .persist()
    ratios.count()
    docs.repartition(4).write.parquet(s"$dir/in")
    val schema = spark.read.parquet(s"$dir/in").schema
    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", 1).parquet(s"$dir/in")
    val q = stream.writeStream
      .option("checkpointLocation", s"$dir/ckpt")
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        Importance.applyWeights(batch, ratios, "doc_id", "text", buckets = 64)
          .write.mode("append").parquet(s"$dir/scored")
        ()
      }
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(120000)
    q.stop()
    val streamed = spark.read.parquet(s"$dir/scored")
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    val batch = Importance.applyWeights(docs, ratios, "doc_id", "text", buckets = 64)
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(streamed == batch, "per-batch scoring must equal the one-shot batch scoring")
    // and the weights separate: target-like docs above the background
    val tgt = streamed.filter(_._1 % 4 == 0).values.min
    val bg = streamed.filter(_._1 % 4 != 0).values.max
    assert(tgt > bg, s"target-like floor $tgt must exceed background ceiling $bg")
    ratios.unpersist(blocking = false)
  }

  test("sessionize: flatMapGroupsWithState keyed running state") {
    implicit val sq = spark.sqlContext
    val mem = MemoryStream[StreamingJobs.SessionInput]
    mem.addData(
      StreamingJobs.SessionInput(7L, new java.sql.Timestamp(1700000000000L), 1.5),
      StreamingJobs.SessionInput(7L, new java.sql.Timestamp(1700000001000L), 2.5),
      StreamingJobs.SessionInput(9L, new java.sql.Timestamp(1700000002000L), 4.0))
    val out = StreamingJobs.sessionize(mem.toDS())
    val q = out.writeStream.outputMode(OutputMode.Append)
      .format("memory").queryName("sess").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(60000)
    val rows = spark.sql("SELECT * FROM sess").collect()
    val u7 = rows.find(_.getAs[Long]("userId") == 7L).get
    assert(u7.getAs[Long]("n") === 2L)
    assert(u7.getAs[Double]("total") === 4.0)
    assert(!u7.getAs[Boolean]("closed"))
  }
}
