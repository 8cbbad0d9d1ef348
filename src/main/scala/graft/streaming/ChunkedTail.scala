package graft.streaming

import graft.beacon._
import org.apache.spark.sql.SparkSession

/** Head-slot probe (S6: `/eth/v1/beacon/headers/head`). */
trait HeadProbe extends Serializable { def headSlot(): Long }

/** R1–R5: realtime chunk-aligned tailing (reference:
  * src/services/loader.py:44-241).
  *
  * Semantics preserved from the reference:
  *  - R2 reorg guard: target = head − `slotDelay` (fixed lateness
  *    allowance — the source-side watermark).
  *  - R3 tumbling windows: only COMPLETE chunk-size-aligned windows are
  *    processed (`((last/cs)+1)*cs` boundary math).
  *  - R4 exactly-once: the chunk ledger is offset store + commit log;
  *    sinks are replace-keyed (payload-hash dedup + latest() reads) so
  *    re-delivery is idempotent.
  *  - R5 late data: a 404 slot is success-with-no-row; failed chunks are
  *    replayed by `Maintenance.fixChunks`.
  *
  * Implemented as a micro-batch driver loop (each iteration = one
  * `Trigger.AvailableNow`-style batch over the newly complete chunks).
  * This is deliberately NOT a custom `MicroBatchStream`: the fetch is the
  * latency bottleneck, batches are chunk-granular, and the ledger already
  * provides restart/exactly-once semantics — a V2 source would add
  * machinery without adding behavior.
  */
final class ChunkedTail(
    spark: SparkSession,
    cfg: ChainConfig,
    fetcher: SlotFetcher,
    probe: HeadProbe,
    rawDir: String,
    chunkLedger: LedgerStore,
    /** when set, each ingested chunk is transformed in the same
      * micro-batch (low-latency structured tables, SURVEY §3.3):
      * (outDir, progress ledger). */
    chainedTransform: Option[(String, LedgerStore)] = None,
    loader: String = "blocks",
    chunkSize: Long = 100L,
    slotDelay: Long = 100L,
    pollMillis: Long = 6000L,
    errorBackoffMillis: Long = 12000L) {

  /** Resume point: max ingested slot (A5), falling back to ledger state. */
  def resumeSlot(): Long = {
    val fromRaw =
      if (graft.core.Fs.exists(spark, rawDir))
        Ledger.maxSlot(spark.read.parquet(rawDir))
      else None
    fromRaw.getOrElse(-1L)
  }

  /** Process every complete chunk in (lastSlot, head − delay]. Returns the
    * new last processed slot. One call = one micro-batch. */
  def processAvailable(lastSlot: Long): Long = {
    val target = probe.headSlot() - slotDelay
    var last = lastSlot
    var nextBoundary = ((last / chunkSize) + 1) * chunkSize
    while (nextBoundary + chunkSize - 1 <= target) {
      val start = nextBoundary
      val end = nextBoundary + chunkSize - 1
      if (!isChunkCompleted(start, end)) {
        val ok = RawIngest.ingestChunk(spark, cfg, fetcher, rawDir, chunkLedger,
          loader, start, end)
        if (ok) chainedTransform.foreach { case (outDir, progress) =>
          Transformer.transformChunk(spark, cfg, Loaders.byName(loader),
            rawDir, outDir, progress, start, end)
        }
      }
      last = end
      nextBoundary += chunkSize
    }
    last
  }

  /** Idempotency probe (reference `_is_chunk_completed` FINAL lookup,
    * loader.py:264-278). */
  def isChunkCompleted(start: Long, end: Long): Boolean = {
    import org.apache.spark.sql.functions._
    val states = Ledger.chunkStates(chunkLedger.read(spark, Schemas.loadStateChunks))
    !states.filter(
      col("loader_name") === loader && col("start_slot") === start &&
        col("end_slot") === end && col("status") === "completed").isEmpty
  }

  /** R1: the poll loop. Runs `maxIterations` micro-batches (use
    * Int.MaxValue for a production tail; tests pass small numbers). */
  def run(maxIterations: Int): Long = {
    var last = resumeSlot()
    var i = 0
    while (i < maxIterations) {
      try {
        val newLast = processAvailable(last)
        if (newLast == last && i + 1 < maxIterations) Thread.sleep(pollMillis)
        last = newLast
      } catch {
        case scala.util.control.NonFatal(_) =>
          if (i + 1 < maxIterations) Thread.sleep(errorBackoffMillis)
      }
      i += 1
    }
    last
  }
}
