package graft.streaming

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset}
import org.apache.spark.sql.connector.read.{InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder}
import org.apache.spark.sql.types.{LongType, StructField, StructType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** True `MicroBatchStream` realtime source (SURVEY §7.2 step 9): the
  * chunk-tail offset log as a DataSource V2 stream.
  *
  * `latestOffset = head − slotDelay`, aligned DOWN to a complete
  * chunk-size boundary (R2 reorg guard + R3 tumbling windows as offset
  * arithmetic); each micro-batch's rows are the chunk ranges
  * `(start_slot, end_slot)` due in (startOffset, endOffset]. The sink
  * (see [[StreamingJobs.chunkTailStream]]) runs the EXISTING
  * `RawIngest.ingestChunk` per range — fetch contract (gate, split),
  * ledger transitions, and metrics are byte-identical to the
  * [[ChunkedTail]] driver loop, which remains the recommended path (the
  * file's header explains why); this source exists so `spark.readStream`
  * users get the same semantics behind the standard streaming API, with
  * Spark's checkpoint as the offset store ON TOP of the ledger's
  * commit-log idempotency (R4).
  *
  * Offsets are EXCLUSIVE chunk boundaries (multiples of chunkSize): offset
  * b means "every chunk ending < b is in some batch". Head probes happen
  * ONLY driver-side (latestOffset); partition readers emit literal ranges
  * and never touch the network.
  *
  * Reference: the realtime loop this re-expresses is
  * /root/reference/src/services/loader.py:44-118.
  */
object TailChunkSource {
  val schema: StructType = StructType(Seq(
    StructField("start_slot", LongType, nullable = false),
    StructField("end_slot", LongType, nullable = false)))

  /** Driver-side probe registry: a [[HeadProbe]] is live state (virtual
    * clocks in tests, an HTTP client in production) and cannot ride a
    * string option; daily-cadence streams also need the network timing
    * ([[graft.beacon.ChainConfig]]) for day-boundary math. Offsets are
    * computed on the driver, so the registry never needs to exist on
    * executors. */
  private val probes = new java.util.concurrent.ConcurrentHashMap[
    String, (HeadProbe, Option[graft.beacon.ChainConfig])]()

  def registerProbe(key: String, probe: HeadProbe): Unit =
    probes.put(key, (probe, None))

  /** Daily-mode registration: the config drives last-slot-of-UTC-day
    * enumeration (C12 closed form). */
  def registerProbe(key: String, probe: HeadProbe, cfg: graft.beacon.ChainConfig): Unit =
    probes.put(key, (probe, Some(cfg)))

  private[streaming] def probeOf(key: String): HeadProbe = entryOf(key)._1

  private[streaming] def entryOf(key: String): (HeadProbe, Option[graft.beacon.ChainConfig]) = {
    val p = probes.get(key)
    require(p != null, s"no HeadProbe registered under '$key' — call " +
      "TailChunkSource.registerProbe(key, probe[, cfg]) before starting the stream")
    p
  }

  /** First boundary at or after `resumeSlot + 1` (floorDiv handles the
    * empty-resume −1 exactly like ChunkedTail.processAvailable). */
  def boundaryAfter(resumeSlot: Long, chunkSize: Long): Long =
    (Math.floorDiv(resumeSlot, chunkSize) + 1) * chunkSize

  /** Largest exclusive boundary whose last chunk is fully ≤ head − delay. */
  def completeBoundary(head: Long, slotDelay: Long, chunkSize: Long): Long =
    Math.floorDiv(head - slotDelay + 1, chunkSize) * chunkSize

  /** Daily-cadence chunk law, shared with [[CompositeTail.planFor]]: every
    * last-slot-of-UTC-day in [max(fromSlot, floor), toSlotInclusive].
    * Recomputed from the DATE each step — a fixed slots-per-day stride
    * would drift on leap seconds. */
  def dailySlots(
      cfg: graft.beacon.ChainConfig, fromSlot: Long, toSlotInclusive: Long,
      floor: Long = 0L): Seq[Long] = {
    val start = math.max(math.max(fromSlot, floor), 0L)
    if (toSlotInclusive < start) return Seq.empty
    Iterator.iterate(cfg.lastSlotOfDay(
        java.time.Instant.ofEpochSecond(
          cfg.genesisTimeUnix + start * cfg.secondsPerSlot)
          .atZone(java.time.ZoneOffset.UTC).toLocalDate))(s =>
        cfg.lastSlotOfDay(java.time.Instant.ofEpochSecond(
          cfg.genesisTimeUnix + (s + 1) * cfg.secondsPerSlot)
          .atZone(java.time.ZoneOffset.UTC).toLocalDate))
      .dropWhile(_ < start)
      .takeWhile(_ <= toSlotInclusive)
      .toSeq
  }
}

/** Exclusive chunk boundary as a streaming offset. */
case class ChunkBoundaryOffset(boundary: Long) extends Offset {
  override def json(): String = boundary.toString
}

class TailChunkSourceProvider extends TableProvider {
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    TailChunkSource.schema
  override def getTable(
      schema: StructType, partitioning: Array[Transform],
      properties: java.util.Map[String, String]): Table =
    new TailChunkTable(new CaseInsensitiveStringMap(properties))
}

class TailChunkTable(options: CaseInsensitiveStringMap) extends Table with SupportsRead {
  override def name(): String = "graft_tail_chunks"
  override def schema(): StructType = TailChunkSource.schema
  override def capabilities(): java.util.Set[TableCapability] =
    java.util.EnumSet.of(TableCapability.MICRO_BATCH_READ)
  override def newScanBuilder(caseInsensitiveOptions: CaseInsensitiveStringMap): ScanBuilder =
    new ScanBuilder {
      override def build(): Scan = new Scan {
        override def readSchema(): StructType = TailChunkSource.schema
        override def toMicroBatchStream(checkpointLocation: String): MicroBatchStream = {
          val (probe, cfg) = TailChunkSource.entryOf(options.get("probe"))
          val daily = Option(options.get("mode")).contains("daily")
          if (daily) require(cfg.isDefined,
            "daily mode needs the network timing — register with " +
              "TailChunkSource.registerProbe(key, probe, cfg)")
          new TailChunkMicroBatchStream(
            probe,
            chunkSize = Option(options.get("chunk-size")).map(_.toLong).getOrElse(100L),
            slotDelay = Option(options.get("slot-delay")).map(_.toLong).getOrElse(100L),
            resumeSlot = Option(options.get("start-slot")).map(_.toLong).getOrElse(-1L),
            daily = if (daily) Some((cfg.get,
              Option(options.get("floor-slot")).map(_.toLong).getOrElse(0L))) else None)
        }
      }
    }
}

/** Windowed mode: offsets are exclusive multiples of `chunkSize`. Daily
  * mode (`daily = Some((cfg, floor))`): offsets are exclusive SLOT
  * boundaries and each batch's rows are the single-slot
  * last-slot-of-UTC-day chunks due — the validators/pending-queues
  * cadence ([[CompositeTail]]'s planFor law, same enumeration). */
class TailChunkMicroBatchStream(
    probe: HeadProbe, chunkSize: Long, slotDelay: Long, resumeSlot: Long,
    daily: Option[(graft.beacon.ChainConfig, Long)] = None)
    extends MicroBatchStream {
  import TailChunkSource._

  private val startBoundary =
    if (daily.isDefined) math.max(resumeSlot + 1, 0L)
    else boundaryAfter(resumeSlot, chunkSize)

  /** High-water mark of every boundary this stream has returned OR
    * restored from the checkpoint — the monotonicity guard. A probe
    * reporting a reorged-back head must not regress the offset log:
    * without the clamp, Spark would record the smaller boundary and
    * re-plan (and re-deliver) already-committed chunks once the head
    * recovers. Seeded from deserializeOffset too, so the guard holds
    * across restarts before the first probe. */
  private val maxBoundary = new java.util.concurrent.atomic.AtomicLong(startBoundary)

  override def initialOffset(): Offset = ChunkBoundaryOffset(startBoundary)

  /** R2 + R3 as offset arithmetic: never past head − delay, never a
    * partial chunk, never backwards. */
  override def latestOffset(): Offset = {
    val head = probe.headSlot()
    val probed = daily match {
      case Some((cfg, floor)) =>
        dailySlots(cfg, startBoundary, head - slotDelay, floor)
          .lastOption.map(_ + 1).getOrElse(startBoundary)
      case None => completeBoundary(head, slotDelay, chunkSize)
    }
    ChunkBoundaryOffset(maxBoundary.accumulateAndGet(probed, math.max(_, _)))
  }

  override def deserializeOffset(json: String): Offset = {
    val b = json.trim.toLong
    maxBoundary.accumulateAndGet(b, math.max(_, _))
    ChunkBoundaryOffset(b)
  }

  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
    val lo = start.asInstanceOf[ChunkBoundaryOffset].boundary
    val hi = end.asInstanceOf[ChunkBoundaryOffset].boundary
    daily match {
      case Some((cfg, floor)) =>
        dailySlots(cfg, lo, hi - 1, floor)
          .map(s => ChunkRangePartition(s, s): InputPartition).toArray
      case None =>
        (lo until hi by chunkSize)
          .map(b => ChunkRangePartition(b, b + chunkSize - 1): InputPartition)
          .toArray
    }
  }

  override def createReaderFactory(): PartitionReaderFactory = ChunkRangeReaderFactory

  /** The ledger is the commit log (R4); Spark's checkpoint already stores
    * the offset — nothing extra to commit. */
  override def commit(end: Offset): Unit = ()
  override def stop(): Unit = ()
}

case class ChunkRangePartition(start: Long, end: Long) extends InputPartition

object ChunkRangeReaderFactory extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val p = partition.asInstanceOf[ChunkRangePartition]
    new PartitionReader[InternalRow] {
      private var emitted = false
      override def next(): Boolean = if (emitted) false else { emitted = true; true }
      override def get(): InternalRow =
        new GenericInternalRow(Array[Any](p.start, p.end))
      override def close(): Unit = ()
    }
  }
}
