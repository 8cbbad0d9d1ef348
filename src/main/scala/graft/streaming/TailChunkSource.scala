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
    * string option. Offsets are computed on the driver, so the registry
    * never needs to exist on executors. */
  private val probes = new java.util.concurrent.ConcurrentHashMap[String, HeadProbe]()

  def registerProbe(key: String, probe: HeadProbe): Unit = probes.put(key, probe)

  private[streaming] def probeOf(key: String): HeadProbe = {
    val p = probes.get(key)
    require(p != null, s"no HeadProbe registered under '$key' — call " +
      "TailChunkSource.registerProbe(key, probe) before starting the stream")
    p
  }

  /** First boundary at or after `resumeSlot + 1` (floorDiv handles the
    * empty-resume −1 exactly like ChunkedTail.processAvailable). */
  def boundaryAfter(resumeSlot: Long, chunkSize: Long): Long =
    (Math.floorDiv(resumeSlot, chunkSize) + 1) * chunkSize

  /** Largest exclusive boundary whose last chunk is fully ≤ head − delay. */
  def completeBoundary(head: Long, slotDelay: Long, chunkSize: Long): Long =
    Math.floorDiv(head - slotDelay + 1, chunkSize) * chunkSize
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
        override def toMicroBatchStream(checkpointLocation: String): MicroBatchStream =
          new TailChunkMicroBatchStream(
            TailChunkSource.probeOf(options.get("probe")),
            chunkSize = Option(options.get("chunk-size")).map(_.toLong).getOrElse(100L),
            slotDelay = Option(options.get("slot-delay")).map(_.toLong).getOrElse(100L),
            resumeSlot = Option(options.get("start-slot")).map(_.toLong).getOrElse(-1L))
      }
    }
}

class TailChunkMicroBatchStream(
    probe: HeadProbe, chunkSize: Long, slotDelay: Long, resumeSlot: Long)
    extends MicroBatchStream {
  import TailChunkSource._

  private val startBoundary = boundaryAfter(resumeSlot, chunkSize)

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
    val probed = completeBoundary(probe.headSlot(), slotDelay, chunkSize)
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
    (lo until hi by chunkSize)
      .map(b => ChunkRangePartition(b, b + chunkSize - 1): InputPartition)
      .toArray
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
