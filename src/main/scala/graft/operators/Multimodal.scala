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

  /** Batched executor-side decode: the Scala analog of `mapInPandas` —
    * rows stream through `mapPartitions` in fixed-size batches so a real
    * codec (image decoder, audio resampler, ML feature extractor) can
    * amortize its per-BATCH init instead of paying it per row. The codec
    * here is the deterministic STUB (no media libs in this environment);
    * the signature — binary in, float vector out, batch-at-a-time on
    * executors — is the production contract.
    */
  def decodeBatched(
      df: DataFrame, idCol: String, binCol: String, dim: Int,
      batchSize: Int = 64): DataFrame = {
    val idIdx = df.schema.fieldIndex(idCol)
    val binIdx = df.schema.fieldIndex(binCol)
    // id passes through with its ORIGINAL type (int/long/string ids all
    // valid) — a hard-coded getLong would ClassCastException on int32 ids
    val outSchema = org.apache.spark.sql.types.StructType(Seq(
      df.schema(idCol),
      org.apache.spark.sql.types.StructField("features",
        org.apache.spark.sql.types.ArrayType(
          org.apache.spark.sql.types.FloatType, containsNull = false))))
    implicit val enc: org.apache.spark.sql.Encoder[org.apache.spark.sql.Row] =
      org.apache.spark.sql.Encoders.row(outSchema)
    df.mapPartitions { rows =>
      rows.grouped(batchSize).flatMap { batch =>
        // per-batch "codec init" happens here in a real implementation
        batch.iterator.map { r =>
          val bytes = r.getAs[Array[Byte]](binIdx)
          org.apache.spark.sql.Row(r.get(idIdx), stubDecodeBytes(bytes, dim))
        }
      }
    }
  }

  /** Deterministic fake feature extraction over raw bytes (FNV-mixed). */
  private[operators] def stubDecodeBytes(bytes: Array[Byte], dim: Int): Array[Float] = {
    val out = new Array[Float](dim)
    var h = 0xcbf29ce484222325L
    if (bytes != null) {
      var i = 0
      while (i < bytes.length) { h ^= bytes(i) & 0xffL; h *= 0x100000001b3L; i += 1 }
    }
    var j = 0
    while (j < dim) {
      val v = h ^ (j * 0x9e3779b97f4a7c15L)
      out(j) = ((v % 2000 + 2000) % 2000 - 1000) / 1000.0f
      j += 1
    }
    out
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
