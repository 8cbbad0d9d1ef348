package graft.functions

import org.apache.spark.unsafe.types.UTF8String

/** Static helpers invoked from generated code (doGenCode) — keep them
  * allocation-free on the hot path.
  */
object HexUtil {
  /** Popcount of an arbitrary-length hex bitfield string, `0x`-prefixed or
    * not. Mirrors the reference's sync-committee-bits participation count
    * (reference: src/parsers/fork_base.py:141-161): per hex digit, add its
    * 4-bit popcount. Non-hex characters contribute 0.
    */
  def popcountHex(s: UTF8String): Int = {
    if (s == null) return 0
    val bytes = s.getBytes
    var i = 0
    val n = bytes.length
    if (n >= 2 && bytes(0) == '0' && (bytes(1) == 'x' || bytes(1) == 'X')) i = 2
    var acc = 0
    while (i < n) {
      val c = bytes(i)
      val v =
        if (c >= '0' && c <= '9') c - '0'
        else if (c >= 'a' && c <= 'f') c - 'a' + 10
        else if (c >= 'A' && c <= 'F') c - 'A' + 10
        else 0
      acc += Integer.bitCount(v)
      i += 1
    }
    acc
  }

  /** Byte length of a hex string (`len(hex)//2` after stripping `0x`) —
    * reference: src/parsers/data_column_sidecars.py:67-74. */
  def hexByteLen(s: UTF8String): Int = {
    if (s == null) return 0
    val n = s.numBytes()
    val prefixed =
      n >= 2 && s.getByte(0) == '0' && (s.getByte(1) == 'x' || s.getByte(1) == 'X')
    val eff = if (prefixed) n - 2 else n
    eff / 2
  }

  /** Null-on-failure variant of [[safeLong]] (boxed so generated code can
    * branch on null): null/empty/garbage → null, overflow still clamps.
    * Backs the `coalesce(safe_long_null(x), fallback)` pattern that
    * mirrors the reference's `safe_int(x, fallback)` — a plain default-0
    * parse would swallow the fallback on garbage input. */
  def safeLongBoxed(s: UTF8String): java.lang.Long = {
    if (s == null) return null
    val str = s.toString.trim
    if (str.isEmpty) return null
    try {
      if (str.startsWith("0x") || str.startsWith("0X"))
        java.lang.Long.valueOf(java.lang.Long.parseLong(str.substring(2), 16))
      else java.lang.Long.valueOf(str.toLong)
    } catch {
      case _: NumberFormatException =>
        try {
          val hex = str.startsWith("0x") || str.startsWith("0X")
          val bi = new java.math.BigInteger(
            if (hex) str.substring(2) else str, if (hex) 16 else 10)
          if (bi.bitLength() > 63) java.lang.Long.valueOf(Long.MaxValue)
          else java.lang.Long.valueOf(bi.longValue())
        } catch { case _: NumberFormatException => null }
    }
  }

  /** Hex-aware integer parse mirroring the reference's `safe_int`
    * (src/parsers/fork_base.py:210-222): null/empty → default, `0x…` parsed
    * base-16, otherwise base-10; unparseable → default.
    */
  def safeLong(s: UTF8String, default: Long): Long = {
    if (s == null) return default
    val str = s.toString.trim
    if (str.isEmpty) return default
    try {
      if (str.startsWith("0x") || str.startsWith("0X"))
        java.lang.Long.parseLong(str.substring(2), 16)
      else str.toLong
    } catch {
      case _: NumberFormatException =>
        // UInt64 beyond Long.MaxValue (e.g. FAR_FUTURE_EPOCH) → clamp to
        // Long.MaxValue, matching the engine-wide sentinel policy (SURVEY §7.4).
        try {
          val bi = new java.math.BigInteger(
            if (str.startsWith("0x") || str.startsWith("0X")) str.substring(2) else str,
            if (str.startsWith("0x") || str.startsWith("0X")) 16 else 10)
          if (bi.bitLength() > 63) Long.MaxValue else bi.longValue()
        } catch { case _: NumberFormatException => default }
    }
  }

  /** Count of codepoints in the CJK Unified Ideographs block
    * [U+4E00, U+9FFF] — the language-ID script vote. Walks the UTF-8 bytes
    * directly (every codepoint in the block is a 3-byte sequence), so it is
    * one allocation-free pass instead of the full-text
    * `regexp_replace("[^\\x{4e00}-\\x{9fff}]", "")` rewrite it replaces.
    * Malformed trailing sequences are skipped, matching how UTF8String
    * itself advances by lead byte.
    */
  def cjkCodepointCount(s: UTF8String): Int = {
    if (s == null) return 0
    val n = s.numBytes()
    var i = 0
    var acc = 0
    while (i < n) {
      val b0 = s.getByte(i) & 0xFF
      if (b0 < 0x80) i += 1 // ASCII
      else if (b0 < 0xE0) i += 2 // 2-byte seq: codepoint < 0x800 < 0x4E00
      else if (b0 < 0xF0) { // 3-byte seq: codepoint in [0x800, 0xFFFF]
        if (i + 2 < n) {
          val cp = ((b0 & 0x0F) << 12) |
            ((s.getByte(i + 1) & 0x3F) << 6) | (s.getByte(i + 2) & 0x3F)
          if (cp >= 0x4E00 && cp <= 0x9FFF) acc += 1
        }
        i += 3
      } else i += 4 // 4-byte seq: supplementary plane, > 0xFFFF
    }
    acc
  }

  /** Unicode NFC normalization — the canonical-composition pass every
    * tokenizer pipeline runs before hashing/dedup (é as U+00E9 vs
    * e+U+0301 must collide, or the same text dedups differently by
    * source encoding). ASCII fast path: `Normalizer.isNormalized` on a
    * pure-ASCII string is a cheap scan and the common crawl case, so the
    * expensive normalize+re-encode only runs on rows that need it. */
  def nfcNormalize(s: UTF8String): UTF8String = {
    if (s == null) return null
    val str = s.toString
    if (java.text.Normalizer.isNormalized(str, java.text.Normalizer.Form.NFC)) s
    else UTF8String.fromString(
      java.text.Normalizer.normalize(str, java.text.Normalizer.Form.NFC))
  }

  /** 1 if the string is already NFC-normal, else 0. */
  def isNfc(s: UTF8String): Int = {
    if (s == null) return 1
    if (java.text.Normalizer.isNormalized(
        s.toString, java.text.Normalizer.Form.NFC)) 1 else 0
  }

  /** Character-distribution stats in ONE codepoint walk —
    * `[n_codepoints, n_distinct, top_count, collision_sum]` where
    * `collision_sum = Σ c·(c−1)` over per-codepoint counts. The quality
    * signals every curation pass derives from these are rational:
    * top-char fraction (`top/n`, boilerplate and ASCII-art pages) and
    * the Simpson repeat probability (`Σc(c−1) / n(n−1)`, the
    * entropy-class repetition gate without the cross-engine libm hazard
    * of an actual `log`) — all-integer numerators, ONE IEEE division
    * each downstream, so the whole report is engine-bit-reproducible.
    * Scan-side kernel: no per-char explode row blowup (the composed
    * alternative shuffles one row per CHARACTER — at 100 TB that is the
    * difference between a projection and a corpus-sized exchange). */
  def charStats(s: UTF8String): org.apache.spark.sql.catalyst.util.ArrayData = {
    val counts = new java.util.HashMap[Integer, Array[Int]]()
    var n = 0L
    if (s != null) {
      val str = s.toString
      var i = 0
      val len = str.length
      while (i < len) {
        val cp = str.codePointAt(i)
        i += Character.charCount(cp)
        n += 1
        val slot = counts.get(cp)
        if (slot == null) counts.put(cp, Array(1)) else slot(0) += 1
      }
    }
    var top = 0L
    var coll = 0L
    val it = counts.values().iterator()
    while (it.hasNext) {
      val c = it.next()(0).toLong
      if (c > top) top = c
      coll += c * (c - 1L)
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(
      Array(n, counts.size.toLong, top, coll))
  }

  /** Spread the low 31 bits of `x` into the even bit positions of a long
    * (the Morton/Z-order bit dilation). */
  def mortonSpread(x0: Long): Long = {
    var x = x0 & 0x7FFFFFFFL
    x = (x | (x << 16)) & 0x0000FFFF0000FFFFL
    x = (x | (x << 8)) & 0x00FF00FF00FF00FFL
    x = (x | (x << 4)) & 0x0F0F0F0F0F0F0F0FL
    x = (x | (x << 2)) & 0x3333333333333333L
    x = (x | (x << 1)) & 0x5555555555555555L
    x
  }

  /** Morton interleave of two 31-bit coordinates: a's bits land in the
    * even positions, b's in the odd — a 62-bit Z-order key, always
    * non-negative. */
  def morton2(a: Long, b: Long): Long =
    mortonSpread(a) | (mortonSpread(b) << 1)
}
