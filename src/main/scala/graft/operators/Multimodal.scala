package graft.operators

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.apache.spark.sql.{Column, DataFrame, Row}

/** Multimodal-column plumbing: image/audio/video payloads are opaque
  * `BinaryType` columns travelling with typed metadata, processed in
  * batches on executors. The image (PNG/JPEG via `javax.imageio`), audio
  * (PCM WAV via `javax.sound.sampled`) and video (animated GIF via the
  * `javax.imageio` sequence API) paths run REAL JDK codecs; only
  * `decodeStub` remains as the deterministic stand-in for external ML
  * feature extractors, documenting the batch contract they would honor.
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
    * decoded video frames — real plumbing (posexplode → row per frame).
    * The REAL-codec sibling is [[decodeGifFramesBatched]], which iterates
    * actual stored frames of an animated-GIF container; this expression
    * form remains for containers with fixed-size frames (raw YUV, some
    * MJPEG) where byte windows ARE the frames and no decoder is needed. */
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

  // -------------------------------------------------------------------
  // REAL codecs (JDK-only: javax.imageio for PNG/JPEG/GIF pixels,
  // javax.sound.sampled for WAV PCM) behind the same batched
  // mapPartitions plumbing as [[decodeBatched]] — the decode step is no
  // longer a stub for these container formats. The oracle-able invariant:
  // stats computed from DECODED pixels/samples must equal the closed
  // forms the payloads were generated from, so the only path from
  // formula to matched value goes through a real encode → decode cycle.
  // -------------------------------------------------------------------

  private def outRow(df: DataFrame, idCol: String, fields: Seq[StructField]) =
    StructType(df.schema(idCol) +: fields)

  /** Real PNG ENCODE executor-side: `pixelsCol` is a row-major
    * `array<int>` of packed 0xRRGGBB pixels (built declaratively with
    * `sequence`/`transform` expressions), `widthCol`/`heightCol` its
    * shape. Batched like [[decodeBatched]]; rows whose pixel count ≠
    * width·height yield a NULL payload rather than a crooked image. */
  def encodePngBatched(
      df: DataFrame, idCol: String, widthCol: String, heightCol: String,
      pixelsCol: String, batchSize: Int = 64): DataFrame =
    encodeImageBatched(df, idCol, widthCol, heightCol, pixelsCol,
      format = "png", outCol = "png", batchSize = batchSize)

  /** Format-generic real image ENCODE (any `ImageIO.write` format name —
    * "png", "jpg", "gif", "bmp"): `pixelsCol` is a row-major `array<int>`
    * of packed 0xRRGGBB pixels built declaratively with
    * `sequence`/`transform`, `widthCol`/`heightCol` its shape. Rows whose
    * pixel count ≠ width·height yield a NULL payload rather than a
    * crooked image. Lossy formats (JPEG) preserve dimensions exactly and
    * pixels approximately — the m10 gate checks the former in the hard
    * oracle and the latter under a tolerance in MultimodalSpec. */
  def encodeImageBatched(
      df: DataFrame, idCol: String, widthCol: String, heightCol: String,
      pixelsCol: String, format: String, outCol: String,
      batchSize: Int = 64): DataFrame = {
    val (idI, wI, hI, pI) = (df.schema.fieldIndex(idCol),
      df.schema.fieldIndex(widthCol), df.schema.fieldIndex(heightCol),
      df.schema.fieldIndex(pixelsCol))
    val schema = outRow(df, idCol, Seq(StructField(outCol, BinaryType, nullable = true)))
    implicit val enc: org.apache.spark.sql.Encoder[Row] =
      org.apache.spark.sql.Encoders.row(schema)
    df.mapPartitions { rows =>
      rows.grouped(batchSize).flatMap { batch =>
        batch.iterator.map { r =>
          val (w, h) = (r.getInt(wI), r.getInt(hI))
          val px = r.getSeq[Int](pI)
          val bytes =
            if (px == null || px.length != w * h || w <= 0 || h <= 0) null
            else {
              val img = new java.awt.image.BufferedImage(
                w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
              var i = 0
              while (i < px.length) { img.setRGB(i % w, i / w, px(i)); i += 1 }
              val bos = new java.io.ByteArrayOutputStream()
              // write returns false when no writer is registered for the
              // format — that must be a NULL payload, not an empty file.
              if (javax.imageio.ImageIO.write(img, format, bos)) bos.toByteArray
              else null
            }
          Row(r.get(idI), bytes)
        }
      }
    }
  }

  /** Real image DECODE (PNG/JPEG/GIF — whatever the JDK's ImageIO
    * readers handle): width, height, and EXACT integer per-channel sums
    * over all pixels — deterministic, so the stats are hash-comparable
    * against the pixel-formula closed form. Undecodable payloads yield
    * NULL stats (the row survives for accounting, like the metadata
    * parsers' null contract). */
  def decodeImageStatsBatched(
      df: DataFrame, idCol: String, binCol: String,
      batchSize: Int = 64): DataFrame = {
    val (idI, bI) = (df.schema.fieldIndex(idCol), df.schema.fieldIndex(binCol))
    val schema = outRow(df, idCol, Seq(
      StructField("width", IntegerType, nullable = true),
      StructField("height", IntegerType, nullable = true),
      StructField("sum_r", LongType, nullable = true),
      StructField("sum_g", LongType, nullable = true),
      StructField("sum_b", LongType, nullable = true)))
    implicit val enc: org.apache.spark.sql.Encoder[Row] =
      org.apache.spark.sql.Encoders.row(schema)
    df.mapPartitions { rows =>
      rows.grouped(batchSize).flatMap { batch =>
        batch.iterator.map { r =>
          val bytes = r.getAs[Array[Byte]](bI)
          val img =
            if (bytes == null) null
            else
              try javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
              catch { case _: Throwable => null }
          if (img == null) Row(r.get(idI), null, null, null, null, null)
          else {
            var (sr, sg, sb) = (0L, 0L, 0L)
            var y = 0
            while (y < img.getHeight) {
              var x = 0
              while (x < img.getWidth) {
                val p = img.getRGB(x, y)
                sr += (p >> 16) & 0xFF; sg += (p >> 8) & 0xFF; sb += p & 0xFF
                x += 1
              }
              y += 1
            }
            Row(r.get(idI), img.getWidth, img.getHeight, sr, sg, sb)
          }
        }
      }
    }
  }

  /** Perceptual AVERAGE HASH (aHash) from REAL decoded pixels — the
    * image-dedup signature: per-pixel grayscale `r+g+b`, each pixel's
    * bit set when `gray·N > Σgray` (the integer-exact form of
    * "above the mean" — no division, no float), packed row-major into a
    * long. Images here are ≤ 40 px so the native grid IS the hash grid
    * (production-size images resize to 8×8 first — a fixed integer
    * box-filter keeps the determinism). Near-duplicate images then
    * dedup via [[Similarity.hamming64]] on the hash column, exactly
    * like SimHash text dedup. Returns (id, width, height, ahash,
    * n_bits); undecodable bytes → nulls. */
  def decodeImageAHashBatched(
      df: DataFrame, idCol: String, binCol: String,
      batchSize: Int = 64): DataFrame = {
    val (idI, bI) = (df.schema.fieldIndex(idCol), df.schema.fieldIndex(binCol))
    val schema = outRow(df, idCol, Seq(
      StructField("width", IntegerType, nullable = true),
      StructField("height", IntegerType, nullable = true),
      StructField("ahash", LongType, nullable = true),
      StructField("n_bits", LongType, nullable = true)))
    implicit val enc: org.apache.spark.sql.Encoder[Row] =
      org.apache.spark.sql.Encoders.row(schema)
    df.mapPartitions { rows =>
      rows.grouped(batchSize).flatMap { batch =>
        batch.iterator.map { r =>
          val bytes = r.getAs[Array[Byte]](bI)
          val img =
            if (bytes == null) null
            else
              try javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
              catch { case _: Throwable => null }
          if (img == null || img.getWidth.toLong * img.getHeight > 64)
            Row(r.get(idI), null, null, null, null)
          else {
            val (w, h) = (img.getWidth, img.getHeight)
            val n = w * h
            val gray = new Array[Long](n)
            var total = 0L
            var y = 0
            while (y < h) {
              var x = 0
              while (x < w) {
                val p = img.getRGB(x, y)
                val g = ((p >> 16) & 0xFF) + ((p >> 8) & 0xFF) + (p & 0xFF)
                gray(y * w + x) = g; total += g
                x += 1
              }
              y += 1
            }
            var hash = 0L
            var bits = 0L
            var i = 0
            while (i < n) {
              if (gray(i) * n > total) { hash |= 1L << i; bits += 1 }
              i += 1
            }
            Row(r.get(idI), w, h, hash, bits)
          }
        }
      }
    }
  }

  /** Integer BOX-FILTER downsample from REAL decoded pixels — the
    * resize step of every image-dedup / thumbnail pipeline, in the
    * exact-arithmetic form that keeps it oracle-provable: the image
    * divides into `factor`×`factor` cells (dims must divide exactly —
    * else the row nulls out, the strict mode a deterministic pipeline
    * wants), each output cell carries the integer SUM of its pixels'
    * grayscale `r+g+b` (no division → no rounding policy to disagree
    * on; the mean is `sum / factor²` whenever a caller wants it).
    * Instead of an array column the cells fold into
    * `cell_checksum = Σ cellSum·(cellIdx+1)` — order-sensitive, so a
    * transposed or shifted kernel cannot hash-match — next to the
    * plain `gray_total` (= Σ cellSum, the checksum's sanity twin).
    * Same batched-mapPartitions plumbing as [[decodeImageAHashBatched]];
    * undecodable bytes → nulls. */
  def decodeImageResizeBatched(
      df: DataFrame, idCol: String, binCol: String,
      factor: Int = 2, batchSize: Int = 64): DataFrame = {
    require(factor >= 1, s"factor must be >= 1: $factor")
    val (idI, bI) = (df.schema.fieldIndex(idCol), df.schema.fieldIndex(binCol))
    val schema = outRow(df, idCol, Seq(
      StructField("width", IntegerType, nullable = true),
      StructField("height", IntegerType, nullable = true),
      StructField("out_w", IntegerType, nullable = true),
      StructField("out_h", IntegerType, nullable = true),
      StructField("gray_total", LongType, nullable = true),
      StructField("cell_checksum", LongType, nullable = true)))
    implicit val enc: org.apache.spark.sql.Encoder[Row] =
      org.apache.spark.sql.Encoders.row(schema)
    df.mapPartitions { rows =>
      rows.grouped(batchSize).flatMap { batch =>
        batch.iterator.map { r =>
          val bytes = r.getAs[Array[Byte]](bI)
          val img =
            if (bytes == null) null
            else
              try javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
              catch { case _: Throwable => null }
          if (img == null || img.getWidth % factor != 0 || img.getHeight % factor != 0)
            Row(r.get(idI), null, null, null, null, null, null)
          else {
            val (w, h) = (img.getWidth, img.getHeight)
            val (ow, oh) = (w / factor, h / factor)
            val cells = new Array[Long](ow * oh)
            var total = 0L
            var y = 0
            while (y < h) {
              var x = 0
              while (x < w) {
                val p = img.getRGB(x, y)
                val g = (((p >> 16) & 0xFF) + ((p >> 8) & 0xFF) + (p & 0xFF)).toLong
                cells((y / factor) * ow + (x / factor)) += g
                total += g
                x += 1
              }
              y += 1
            }
            var checksum = 0L
            var c = 0
            while (c < cells.length) { checksum += cells(c) * (c + 1L); c += 1 }
            Row(r.get(idI), w, h, ow, oh, total, checksum)
          }
        }
      }
    }
  }

  /** Real multi-frame VIDEO ENCODE — animated GIF through the
    * `javax.imageio` sequence API, the one multi-frame container the JDK
    * writes natively. `framesCol` is `array<array<int>>`: each inner
    * array one row-major GRAYSCALE frame (values 0..255) of
    * `widthCol`×`heightCol` pixels. Grayscale is deliberate: GIF is
    * 256-color indexed, and the 256-gray palette round-trips EXACTLY
    * (an RGB source would be quantized, losing the closed-form oracle).
    * Frames are written full-size (no delta/disposal compression), so
    * the decode side reads each stored frame as a complete image. Rows
    * with no frames, a shape mismatch, or out-of-range samples yield a
    * NULL payload (the strict-mode null contract). */
  def encodeGifAnimatedBatched(
      df: DataFrame, idCol: String, widthCol: String, heightCol: String,
      framesCol: String, outCol: String = "gif",
      batchSize: Int = 64): DataFrame = {
    val (idI, wI, hI, fI) = (df.schema.fieldIndex(idCol),
      df.schema.fieldIndex(widthCol), df.schema.fieldIndex(heightCol),
      df.schema.fieldIndex(framesCol))
    val schema = outRow(df, idCol, Seq(StructField(outCol, BinaryType, nullable = true)))
    implicit val enc: org.apache.spark.sql.Encoder[Row] =
      org.apache.spark.sql.Encoders.row(schema)
    df.mapPartitions { rows =>
      rows.grouped(batchSize).flatMap { batch =>
        batch.iterator.map { r =>
          val (w, h) = (r.getInt(wI), r.getInt(hI))
          val frames = r.getSeq[scala.collection.Seq[Int]](fI)
          val bad = frames == null || frames.isEmpty || w <= 0 || h <= 0 ||
            frames.exists(f => f == null || f.length != w * h ||
              f.exists(v => v < 0 || v > 255))
          val bytes =
            if (bad) null
            else {
              val writers = javax.imageio.ImageIO.getImageWritersByFormatName("gif")
              if (!writers.hasNext) null
              else {
                val writer = writers.next()
                val bos = new java.io.ByteArrayOutputStream()
                val ios = javax.imageio.ImageIO.createImageOutputStream(bos)
                // finally-close: createImageOutputStream defaults to a
                // FileCache stream backed by a temp file — a throw from
                // writeToSequence on a bad payload would otherwise leak
                // one fd + temp file PER bad row until JVM exit
                try {
                writer.setOutput(ios)
                writer.prepareWriteSequence(null)
                // interlace OFF: the JDK writer defaults to interlaced
                // GIF, and its own reader mis-reassembles interlaced
                // images shorter than 5 rows (rows after the first pass
                // come back empty) — probed empirically in
                // ExtensionsSpec; plain raster order round-trips at
                // every size
                val p = writer.getDefaultWriteParam
                p.setProgressiveMode(javax.imageio.ImageWriteParam.MODE_DISABLED)
                // an EXPLICIT identity 256-gray palette: TYPE_BYTE_GRAY
                // would be treated as LINEAR gray and color-converted to
                // sRGB on write (warping every value); an IndexColorModel
                // with r=g=b=index is already sRGB, so the palette — and
                // therefore every pixel — round-trips exactly
                val grays = Array.tabulate[Byte](256)(i => i.toByte)
                val icm = new java.awt.image.IndexColorModel(
                  8, 256, grays, grays, grays)
                frames.foreach { f =>
                  val img = new java.awt.image.BufferedImage(
                    w, h, java.awt.image.BufferedImage.TYPE_BYTE_INDEXED, icm)
                  val raster = img.getRaster
                  var i = 0
                  while (i < f.length) {
                    raster.setSample(i % w, i / w, 0, f(i))
                    i += 1
                  }
                  writer.writeToSequence(
                    new javax.imageio.IIOImage(img, null, null), p)
                }
                writer.endWriteSequence()
                } finally {
                  writer.dispose()
                  // close BEFORE reading bos: the image output stream
                  // caches writes and only flushes them down on close
                  try ios.close() catch { case _: Throwable => () }
                }
                bos.toByteArray
              }
            }
          Row(r.get(idI), bytes)
        }
      }
    }
  }

  /** Real VIDEO FRAME decode — the frame-sampling primitive over a real
    * container: `javax.imageio`'s GIF reader iterates the stored frames
    * (`getNumImages(true)` → `read(i)`), one OUTPUT ROW PER FRAME with
    * `(frame_idx, width, height, gray_sum)`, `gray_sum` the exact
    * integer sum of the decoded gray levels (for a grayscale GIF the
    * decoded RGB has r=g=b, so the blue channel IS the gray value).
    * Undecodable payloads survive as one all-null row — the accounting
    * contract the image/audio parsers follow. Frames are assumed
    * full-size (the [[encodeGifAnimatedBatched]] contract); a delta-
    * compressed GIF from elsewhere would need compositing, which is a
    * policy decision, not plumbing. */
  def decodeGifFramesBatched(
      df: DataFrame, idCol: String, binCol: String,
      batchSize: Int = 64): DataFrame = {
    val (idI, bI) = (df.schema.fieldIndex(idCol), df.schema.fieldIndex(binCol))
    val schema = outRow(df, idCol, Seq(
      StructField("frame_idx", IntegerType, nullable = true),
      StructField("width", IntegerType, nullable = true),
      StructField("height", IntegerType, nullable = true),
      StructField("gray_sum", LongType, nullable = true)))
    implicit val enc: org.apache.spark.sql.Encoder[Row] =
      org.apache.spark.sql.Encoders.row(schema)
    df.mapPartitions { rows =>
      rows.grouped(batchSize).flatMap { batch =>
        batch.iterator.flatMap { r =>
          val bytes = r.getAs[Array[Byte]](bI)
          val frames: Seq[(Int, Int, Int, Long)] =
            if (bytes == null) null
            else {
              // finally-close: the input stream defaults to a FileCache
              // variant (temp file + fd); the old return-null-from-catch
              // path leaked both on every undecodable row — a corpus with
              // many bad payloads would exhaust fds/disk before JVM exit
              var iis: javax.imageio.stream.ImageInputStream = null
              var reader: javax.imageio.ImageReader = null
              try {
                iis = javax.imageio.ImageIO.createImageInputStream(
                  new java.io.ByteArrayInputStream(bytes))
                val readers = javax.imageio.ImageIO.getImageReaders(iis)
                if (!readers.hasNext) null
                else {
                  reader = readers.next()
                  reader.setInput(iis)
                  val n = reader.getNumImages(true)
                  (0 until n).map { i =>
                    val img = reader.read(i)
                    val (w, h) = (img.getWidth, img.getHeight)
                    var sum = 0L
                    var y = 0
                    while (y < h) {
                      var x = 0
                      while (x < w) { sum += (img.getRGB(x, y) & 0xFF); x += 1 }
                      y += 1
                    }
                    (i, w, h, sum)
                  }
                }
              } catch { case _: Throwable => null }
              finally {
                if (reader != null) try reader.dispose() catch { case _: Throwable => () }
                if (iis != null) try iis.close() catch { case _: Throwable => () }
              }
            }
          if (frames == null) Iterator.single(Row(r.get(idI), null, null, null, null))
          else frames.iterator.map { case (i, w, h, sm) =>
            Row(r.get(idI), i, w, h, sm)
          }
        }
      }
    }
  }

  /** Real WAV ENCODE: canonical RIFF/fmt/data header + the `array<int>`
    * `samplesCol` as interleaved 16-bit little-endian PCM. Pure byte
    * assembly — no codec needed to WRITE canonical PCM WAV; the decode
    * side goes through the real `javax.sound.sampled` parser. */
  def encodeWavPcm16Batched(
      df: DataFrame, idCol: String, samplesCol: String,
      sampleRate: Int, channels: Int, batchSize: Int = 64): DataFrame = {
    require(channels >= 1 && sampleRate > 0, "bad WAV shape")
    val (idI, sI) = (df.schema.fieldIndex(idCol), df.schema.fieldIndex(samplesCol))
    val schema = outRow(df, idCol, Seq(StructField("wav", BinaryType, nullable = true)))
    implicit val enc: org.apache.spark.sql.Encoder[Row] =
      org.apache.spark.sql.Encoders.row(schema)
    df.mapPartitions { rows =>
      rows.grouped(batchSize).flatMap { batch =>
        batch.iterator.map { r =>
          val samples = r.getSeq[Int](sI)
          val bytes =
            if (samples == null) null
            else {
              val dataSize = samples.length * 2
              val bb = java.nio.ByteBuffer.allocate(44 + dataSize)
                .order(java.nio.ByteOrder.LITTLE_ENDIAN)
              bb.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataSize)
                .put("WAVE".getBytes("US-ASCII"))
                .put("fmt ".getBytes("US-ASCII")).putInt(16)
                .putShort(1.toShort) // PCM
                .putShort(channels.toShort)
                .putInt(sampleRate)
                .putInt(sampleRate * channels * 2) // byte rate
                .putShort((channels * 2).toShort)  // block align
                .putShort(16.toShort)              // bits/sample
                .put("data".getBytes("US-ASCII")).putInt(dataSize)
              samples.foreach(v => bb.putShort(v.toShort))
              bb.array()
            }
          Row(r.get(idI), bytes)
        }
      }
    }
  }

  /** Real WAV DECODE via `javax.sound.sampled.AudioSystem`: the parsed
    * format (channels, sample rate), the decoded FRAME count, and the
    * exact integer sum of all 16-bit samples — the invariant that ties
    * the decode to the generator formula. NULL stats on undecodable
    * payloads. */
  def decodeWavStatsBatched(
      df: DataFrame, idCol: String, binCol: String,
      batchSize: Int = 64): DataFrame = {
    val (idI, bI) = (df.schema.fieldIndex(idCol), df.schema.fieldIndex(binCol))
    val schema = outRow(df, idCol, Seq(
      StructField("channels", IntegerType, nullable = true),
      StructField("sample_rate", IntegerType, nullable = true),
      StructField("n_frames", LongType, nullable = true),
      StructField("sum_samples", LongType, nullable = true)))
    implicit val enc: org.apache.spark.sql.Encoder[Row] =
      org.apache.spark.sql.Encoders.row(schema)
    df.mapPartitions { rows =>
      rows.grouped(batchSize).flatMap { batch =>
        batch.iterator.map { r =>
          val bytes = r.getAs[Array[Byte]](bI)
          val parsed =
            try {
              val ais = javax.sound.sampled.AudioSystem.getAudioInputStream(
                new java.io.ByteArrayInputStream(bytes))
              val fmt = ais.getFormat
              val pcm = ais.readAllBytes()
              val bb = java.nio.ByteBuffer.wrap(pcm).order(
                if (fmt.isBigEndian) java.nio.ByteOrder.BIG_ENDIAN
                else java.nio.ByteOrder.LITTLE_ENDIAN)
              var sum = 0L
              while (bb.remaining() >= 2) sum += bb.getShort()
              Some((fmt.getChannels, fmt.getSampleRate.toInt,
                pcm.length.toLong / (2L * fmt.getChannels), sum))
            } catch { case _: Throwable => None }
          parsed match {
            case Some((ch, rate, frames, sum)) =>
              Row(r.get(idI), ch, rate, frames, sum)
            case None => Row(r.get(idI), null, null, null, null)
          }
        }
      }
    }
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
