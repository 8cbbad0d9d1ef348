package graft.operators

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.apache.spark.sql.{Column, DataFrame, Row}

/** Multimodal-column plumbing: image/audio/video payloads are opaque
  * `BinaryType` columns travelling with typed metadata, processed in
  * batches on executors. The actual codec calls are STUBBED (no
  * image/audio libraries in this environment) behind `decodeStub` — a
  * deterministic fake — but the Spark-side contract (schema, batch shape,
  * partition sizing) is real and tested.
  */
object Multimodal {

  /** Canonical schema for a multimodal asset table. */
  val assetSchema: StructType = StructType(Seq(
    StructField("asset_id", LongType, nullable = false),
    StructField("modality", StringType, nullable = false), // image|audio|video
    StructField("mime", StringType, nullable = true),
    StructField("bytes", BinaryType, nullable = true),
    StructField("width", IntegerType, nullable = true),
    StructField("height", IntegerType, nullable = true),
    StructField("duration_ms", LongType, nullable = true),
  ))

  /** Byte length + content hash of the raw payload — cheap scan-side
    * metadata every multimodal pipeline derives first. */
  def withBinaryMeta(df: DataFrame, binCol: String): DataFrame =
    df.withColumn("n_bytes", length(col(binCol)))
      .withColumn("content_sha", sha2(col(binCol), 256))

  /** Deterministic fake "decode → feature vector": hashes byte slices into
    * a fixed-width float vector. STUB for a real image/audio decoder — the
    * signature (binary in, Array[Float] out, per-row, executor-side) is the
    * real contract a codec UDF would honor.
    */
  def decodeStub(binCol: Column, dim: Int): Column =
    transform(
      sequence(lit(0), lit(dim - 1)),
      i => (pmod(xxhash64(binCol, i), lit(2000)) - 1000).cast("float") / 1000.0f)

  /** "Frame sampling" stub: one row per sampled byte-window standing in for
    * decoded video frames — real plumbing (posexplode → row per frame). */
  def frameWindows(df: DataFrame, idCol: String, binCol: String, n: Int): DataFrame = {
    val frameBytes = floor(length(col(binCol)) / n).cast("long")
    df.select(
        col(idCol),
        posexplode(
          transform(
            sequence(lit(0), lit(n - 1)),
            i => struct(
              i.cast("long").as("frame_idx"),
              (i.cast("long") * frameBytes + 1).as("offset"),
              frameBytes.as("frame_bytes")))))
      .select(
        col(idCol),
        col("col.frame_idx").as("frame_idx"),
        col("col.offset").as("offset"),
        col("col.frame_bytes").as("frame_bytes"))
  }

  /** Partition sizing guard for wide binary rows: repartition so each
    * output partition targets ~`targetMb` of payload (the 100 TB knob —
    * binary tables must never concentrate in few tasks). */
  def repartitionByPayload(df: DataFrame, binCol: String, targetMb: Int): DataFrame = {
    val stats = df.select(sum(length(col(binCol))).cast("long")).head()
    val totalBytes = if (stats.isNullAt(0)) 0L else stats.getLong(0)
    val parts = math.max(1, (totalBytes / (targetMb.toLong * 1024 * 1024)).toInt)
    df.repartition(parts)
  }
}
