package graft

import graft.functions._
import graft.operators.{Md5MinHashSignature, MinHashSignature, SimHash64}
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import org.apache.spark.sql.types.{ArrayType, DoubleType}

/** SparkSessionExtensions entry point: registers every custom Catalyst
  * expression as a SQL function, so
  * `--conf spark.sql.extensions=graft.GraftExtensions` (or
  * `.withExtensions(new GraftExtensions)`) exposes the full scalar pack to
  * pure-SQL users:
  *
  * {{{
  * SELECT hex_popcount(sync_committee_bits), safe_long(amount),
  *        canonical_json_hash16(payload), vec_cosine(a, b),
  *        simhash64(tokens), minhash_signature(tokens, 8)
  * }}}
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  private def info(name: String, usage: String) = {
    val _ = usage // ExpressionInfo's usage-bearing constructor is deprecated
    new ExpressionInfo(classOf[GraftExtensions].getName, name)
  }

  /** Clear plan-time error instead of the opaque eval/cast failure a bad
    * static argument would otherwise throw from inside the builder. */
  private def fail(msg: String): Nothing =
    throw new org.apache.spark.sql.AnalysisException(
      "USER_RAISED_EXCEPTION", Map("errorMessage" -> msg), None)

  /** Static (foldable, non-null) argument of a SQL function — `k` in
    * `minhash_signature(tokens, k)` must be a literal the builder can
    * evaluate at registration time; a column reference has no plan-time
    * value. */
  private def staticArg(es: Seq[Expression], idx: Int, fn: String, what: String): Any = {
    val e = es(idx)
    if (!e.foldable)
      fail(s"$fn: argument ${idx + 1} ($what) must be a literal, got ${e.sql}")
    val v = e.eval()
    if (v == null) fail(s"$fn: argument ${idx + 1} ($what) must not be NULL")
    v
  }

  private def staticInt(es: Seq[Expression], idx: Int, fn: String, what: String): Int =
    staticArg(es, idx, fn, what) match {
      case i: Int => i
      case other =>
        fail(s"$fn: argument ${idx + 1} ($what) must be an INT literal, " +
          s"got ${other.getClass.getSimpleName}")
    }

  private def staticBoolean(es: Seq[Expression], idx: Int, fn: String, what: String): Boolean =
    staticArg(es, idx, fn, what) match {
      case b: Boolean => b
      case other =>
        fail(s"$fn: argument ${idx + 1} ($what) must be a BOOLEAN literal, " +
          s"got ${other.getClass.getSimpleName}")
    }

  override def apply(e: SparkSessionExtensions): Unit = {
    e.injectFunction((
      FunctionIdentifier("hex_popcount"),
      info("hex_popcount", "popcount of an arbitrary-length 0x-hex bitfield"),
      (es: Seq[Expression]) => HexPopcount(es.head)))
    e.injectFunction((
      FunctionIdentifier("hex_byte_length"),
      info("hex_byte_length", "len(hex)//2 after 0x strip"),
      (es: Seq[Expression]) => HexByteLength(es.head)))
    e.injectFunction((
      FunctionIdentifier("cjk_codepoint_count"),
      info("cjk_codepoint_count", "count of codepoints in [U+4E00,U+9FFF]"),
      (es: Seq[Expression]) => CjkCodepointCount(es.head)))
    e.injectFunction((
      FunctionIdentifier("safe_long"),
      info("safe_long", "hex-aware tolerant int parse, UInt64-clamped"),
      (es: Seq[Expression]) => SafeLong(es.head)))
    e.injectFunction((
      FunctionIdentifier("canonical_json_hash16"),
      info("canonical_json_hash16", "sha256[:16] of Python-canonical JSON"),
      (es: Seq[Expression]) => CanonicalJsonHash16(es.head)))
    e.injectFunction((
      FunctionIdentifier("vec_dot"),
      info("vec_dot", "float-vector dot product (double)"),
      (es: Seq[Expression]) => FloatVectorDot(es(0), es(1))))
    e.injectFunction((
      FunctionIdentifier("vec_cosine"),
      info("vec_cosine", "float-vector cosine similarity (double)"),
      (es: Seq[Expression]) => FloatVectorCosine(es(0), es(1))))
    e.injectFunction((
      FunctionIdentifier("simhash64"),
      info("simhash64", "64-bit SimHash of a token array"),
      (es: Seq[Expression]) => SimHash64(es.head)))
    e.injectFunction((
      FunctionIdentifier("sq8_encode"),
      info("sq8_encode", "normalize + scalar-quantize a float vector to signed-byte codes"),
      (es: Seq[Expression]) => Sq8Encode(es.head)))
    e.injectFunction((
      FunctionIdentifier("sq8_dot"),
      info("sq8_dot", "exact integer dot product of two SQ8 code vectors"),
      (es: Seq[Expression]) => Sq8Dot(es(0), es(1))))
    e.injectFunction((
      FunctionIdentifier("image_format"),
      info("image_format", "png|gif|jpeg|unknown from container magic bytes"),
      (es: Seq[Expression]) => ImageFormat(es.head)))
    e.injectFunction((
      FunctionIdentifier("image_width"),
      info("image_width", "PNG IHDR / GIF logical-screen / JPEG SOF width; -1 unknown"),
      (es: Seq[Expression]) => ImageWidth(es.head)))
    e.injectFunction((
      FunctionIdentifier("image_height"),
      info("image_height", "PNG IHDR / GIF logical-screen / JPEG SOF height; -1 unknown"),
      (es: Seq[Expression]) => ImageHeight(es.head)))
    e.injectFunction((
      FunctionIdentifier("audio_format"),
      info("audio_format", "wav|unknown from RIFF/WAVE magic bytes"),
      (es: Seq[Expression]) => AudioFormat(es.head)))
    e.injectFunction((
      FunctionIdentifier("audio_channels"),
      info("audio_channels", "WAV fmt-chunk channel count; -1 unknown"),
      (es: Seq[Expression]) => AudioChannels(es.head)))
    e.injectFunction((
      FunctionIdentifier("audio_sample_rate"),
      info("audio_sample_rate", "WAV fmt-chunk sample rate (Hz); -1 unknown"),
      (es: Seq[Expression]) => AudioSampleRate(es.head)))
    e.injectFunction((
      FunctionIdentifier("audio_duration_ms"),
      info("audio_duration_ms", "WAV data-size/byte-rate duration in ms; -1 unknown"),
      (es: Seq[Expression]) => AudioDurationMs(es.head)))
    e.injectFunction((
      FunctionIdentifier("video_format"),
      info("video_format", "mp4|unknown from the ISO-BMFF ftyp box"),
      (es: Seq[Expression]) => VideoFormat(es.head)))
    e.injectFunction((
      FunctionIdentifier("video_duration_ms"),
      info("video_duration_ms", "MP4 mvhd duration in ms; -1 unknown"),
      (es: Seq[Expression]) => VideoDurationMs(es.head)))
    e.injectFunction((
      FunctionIdentifier("video_width"),
      info("video_width", "MP4 first-track tkhd pixel width; -1 unknown"),
      (es: Seq[Expression]) => VideoWidth(es.head)))
    e.injectFunction((
      FunctionIdentifier("video_height"),
      info("video_height", "MP4 first-track tkhd pixel height; -1 unknown"),
      (es: Seq[Expression]) => VideoHeight(es.head)))
    e.injectFunction((
      FunctionIdentifier("morton_interleave"),
      info("morton_interleave",
        "62-bit Z-order key from two 31-bit coordinates (file-layout clustering)"),
      (es: Seq[Expression]) => {
        if (es.length != 2)
          fail(s"morton_interleave(a, b) takes exactly 2 arguments, got ${es.length}")
        MortonInterleave(es.head, es(1))
      }))
    e.injectFunction((
      FunctionIdentifier("nfc_normalize"),
      info("nfc_normalize",
        "Unicode NFC canonical composition (tokenizer/dedup preprocessing)"),
      (es: Seq[Expression]) => {
        if (es.length != 1)
          fail(s"nfc_normalize(text) takes exactly 1 argument, got ${es.length}")
        NfcNormalize(es.head)
      }))
    e.injectFunction((
      FunctionIdentifier("range_bucket"),
      info("range_bucket",
        "static-interval lookup: bucket index of a double over a sorted " +
          "literal boundary array (zero-join broadcast-dim range lookup)"),
      (es: Seq[Expression]) => {
        if (es.length != 2)
          fail(s"range_bucket(v, bounds) takes exactly 2 arguments, got ${es.length}")
        val bounds = staticArg(es, 1, "range_bucket", "bounds") match {
          case a: org.apache.spark.sql.catalyst.util.ArrayData =>
            es(1).dataType match {
              case ArrayType(DoubleType, _) => a.toDoubleArray()
              case other => fail("range_bucket: bounds must be an " +
                s"ARRAY<DOUBLE> literal, got ${other.simpleString}")
            }
          case other =>
            fail("range_bucket: bounds must be an ARRAY<DOUBLE> literal, " +
              s"got ${other.getClass.getSimpleName}")
        }
        RangeBucket(es.head, bounds)
      }))
    e.injectFunction((
      FunctionIdentifier("minhash_signature"),
      info("minhash_signature", "k-wide MinHash signature of a token array"),
      (es: Seq[Expression]) => {
        if (es.length != 2)
          fail(s"minhash_signature(tokens, k) takes exactly 2 arguments, got ${es.length}")
        MinHashSignature(es.head, staticInt(es, 1, "minhash_signature", "k"))
      }))
    e.injectFunction((
      FunctionIdentifier("md5_minhash_signature"),
      info("md5_minhash_signature",
        "k-wide md5-family MinHash signature (oracle-parity hex mins)"),
      (es: Seq[Expression]) => {
        if (es.length != 2)
          fail(s"md5_minhash_signature(tokens, k) takes exactly 2 arguments, got ${es.length}")
        Md5MinHashSignature(es.head, staticInt(es, 1, "md5_minhash_signature", "k"))
      }))
    e.injectFunction((
      FunctionIdentifier("md5_simhash_hex"),
      info("md5_simhash_hex",
        "16-hex md5-family simhash of a token array (oracle-parity)"),
      (es: Seq[Expression]) => {
        if (es.length != 1)
          fail(s"md5_simhash_hex(tokens) takes exactly 1 argument, got ${es.length}")
        graft.operators.Md5SimHashHex(es.head)
      }))
    e.injectFunction((
      FunctionIdentifier("winnow_md5"),
      info("winnow_md5",
        "distinct winnowing fingerprint set of text (k-gram md5 prefixes, " +
          "w-window minima)"),
      (es: Seq[Expression]) => {
        if (es.length != 3)
          fail(s"winnow_md5(text, k, w) takes exactly 3 arguments, got ${es.length}")
        graft.operators.WinnowMd5(es.head,
          staticInt(es, 1, "winnow_md5", "k"), staticInt(es, 2, "winnow_md5", "w"))
      }))
    e.injectFunction((
      FunctionIdentifier("word_shingles"),
      info("word_shingles",
        "w-token shingles of lowercased text; optional 3rd arg distinct " +
          "(default true) — false keeps every occurrence (repetition counting)"),
      (es: Seq[Expression]) => {
        if (es.length < 2 || es.length > 3)
          fail(s"word_shingles(text, w[, distinct]) takes 2 or 3 arguments, got ${es.length}")
        graft.operators.WordShingles(
          es.head,
          staticInt(es, 1, "word_shingles", "w"),
          distinct =
            if (es.length > 2) staticBoolean(es, 2, "word_shingles", "distinct") else true)
      }))
    e.injectFunction((
      FunctionIdentifier("kmv_min_hashes"),
      info("kmv_min_hashes",
        "aggregate: ascending array of the k smallest distinct long hashes " +
          "(KMV distinct-count sketch state)"),
      (es: Seq[Expression]) => {
        if (es.length != 2)
          fail(s"kmv_min_hashes(hash, k) takes exactly 2 arguments, got ${es.length}")
        graft.operators.Sketches.KmvMinHashes(
          es.head, staticInt(es, 1, "kmv_min_hashes", "k"))
          .toAggregateExpression()
      }))
    e.injectFunction((
      FunctionIdentifier("misra_gries"),
      info("misra_gries",
        "aggregate: Misra-Gries heavy-hitters summary — array of " +
          "(token, count) structs, count desc; counts are lower bounds, " +
          "exact when the vocabulary fits the capacity"),
      (es: Seq[Expression]) => {
        if (es.length != 2)
          fail(s"misra_gries(value, capacity) takes exactly 2 arguments, got ${es.length}")
        graft.operators.Sketches.MisraGries(
          es.head, staticInt(es, 1, "misra_gries", "capacity"))
          .toAggregateExpression()
      }))
  }
}
