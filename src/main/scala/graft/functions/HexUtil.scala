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
}
