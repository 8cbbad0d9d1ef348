package graft

import graft.functions.{CanonicalJson, HexUtil}
import org.apache.spark.unsafe.types.UTF8String
import org.scalatest.funsuite.AnyFunSuite

class FunctionsSpec extends AnyFunSuite {

  private def u(s: String) = UTF8String.fromString(s)

  test("popcountHex matches Long.bitCount over seeded random longs") {
    val rnd = new scala.util.Random(42)
    (1 to 500).foreach { _ =>
      val v = rnd.nextLong() & Long.MaxValue
      val hex = java.lang.Long.toHexString(v)
      assert(HexUtil.popcountHex(u("0x" + hex)) === java.lang.Long.bitCount(v))
      assert(HexUtil.popcountHex(u(hex)) === java.lang.Long.bitCount(v))
    }
  }

  test("popcountHex edge cases (reference fork_base.py:141-161 semantics)") {
    assert(HexUtil.popcountHex(u("")) === 0)
    assert(HexUtil.popcountHex(u("0x")) === 0)
    assert(HexUtil.popcountHex(null) === 0)
    assert(HexUtil.popcountHex(u("0xff")) === 8)
    assert(HexUtil.popcountHex(u("0xFF")) === 8)
    // non-hex chars contribute 0 (reference raises → 0 via except)
    assert(HexUtil.popcountHex(u("0xzz")) === 0)
    // long bitfield (512-bit sync committee = 128 hex chars)
    assert(HexUtil.popcountHex(u("0x" + "f" * 128)) === 512)
  }

  test("cjkCodepointCount matches the regex it replaced on seeded mixed text") {
    // oracle = the old per-row expression: count chars surviving
    // regexp_replace(text, "[^\x{4e00}-\x{9fff}]", "")
    def oracle(s: String): Int =
      s.codePoints().toArray.count(cp => cp >= 0x4E00 && cp <= 0x9FFF)
    val rnd = new scala.util.Random(7)
    // alphabet spanning ASCII, Latin-1, CJK block edges, Hangul (adjacent
    // block, must NOT count), 4-byte emoji, and in-block ideographs
    val alphabet: Array[String] = Array(
      "a", "Z", "é", "ß", "䷿", "一", "鿿", "ꀀ",
      "中", "文", "的", "一", "가", "😀", " ", "\n", "0")
    (1 to 300).foreach { _ =>
      val s = (0 until rnd.nextInt(80)).map(_ => alphabet(rnd.nextInt(alphabet.length))).mkString
      assert(HexUtil.cjkCodepointCount(u(s)) === oracle(s), s"on ${s.take(40)}")
    }
    assert(HexUtil.cjkCodepointCount(null) === 0)
    assert(HexUtil.cjkCodepointCount(u("")) === 0)
    assert(HexUtil.cjkCodepointCount(u("中文全部都是汉字")) === 8)
  }

  test("hexByteLen = len//2 after 0x strip (data_column_sidecars.py:67-74)") {
    assert(HexUtil.hexByteLen(u("0xaabb")) === 2)
    assert(HexUtil.hexByteLen(u("aabb")) === 2)
    assert(HexUtil.hexByteLen(u("0x")) === 0)
    assert(HexUtil.hexByteLen(u("0xabc")) === 1) // odd length floors
    assert(HexUtil.hexByteLen(null) === 0)
  }

  test("safeLong: hex, decimal, garbage, UInt64 clamp (fork_base.py:210-222)") {
    assert(HexUtil.safeLong(u("123"), 0L) === 123L)
    assert(HexUtil.safeLong(u("0x10"), 0L) === 16L)
    assert(HexUtil.safeLong(u("0X10"), 0L) === 16L)
    assert(HexUtil.safeLong(u(""), 7L) === 7L)
    assert(HexUtil.safeLong(u("nope"), 7L) === 7L)
    assert(HexUtil.safeLong(null, 7L) === 7L)
    // FAR_FUTURE_EPOCH = 2^64-1 clamps to Long.MaxValue (SURVEY §7.4)
    assert(HexUtil.safeLong(u("18446744073709551615"), 0L) === Long.MaxValue)
  }

  test("safeLongBoxed: garbage/empty/null → null, valid parses, overflow clamps") {
    assert(HexUtil.safeLongBoxed(u("123")) === java.lang.Long.valueOf(123L))
    assert(HexUtil.safeLongBoxed(u("0x10")) === java.lang.Long.valueOf(16L))
    assert(HexUtil.safeLongBoxed(u("nope")) === null)
    assert(HexUtil.safeLongBoxed(u("")) === null)
    assert(HexUtil.safeLongBoxed(null) === null)
    assert(HexUtil.safeLongBoxed(u("18446744073709551615")) ===
      java.lang.Long.valueOf(Long.MaxValue))
  }

  test("canonical JSON hash matches Python json.dumps(sort_keys, separators) sha256[:16]") {
    // expected values computed with CPython json + hashlib
    assert(CanonicalJson.payloadHash16("""{"b": 1, "a": "ü"}""") === "9e638ba662cf3592")
    assert(CanonicalJson.payloadHash16(
      """{"slot": "123", "nested": {"z": [1, 2, 3], "a": null, "t": true}}""") === "b0df9031656391f5")
    // astral-plane emoji → surrogate-pair 🚀 escaping
    assert(CanonicalJson.payloadHash16(
      "{\"graffiti\": \"héllo 🚀\", \"x\": \"0xdead\"}") === "fb1a1b2562851190")
    assert(CanonicalJson.payloadHash16("""{"data": []}""") === "8fe32e407a1038ee")
  }

  test("canonicalize sorts keys recursively with compact separators") {
    assert(CanonicalJson.canonicalize("""{"b": 1, "a": {"d": 2, "c": 3}}""") ===
      """{"a":{"c":3,"d":2},"b":1}""")
  }

  test("payloadHash16 on invalid JSON falls back to raw-string hash, 16 hex") {
    val h = CanonicalJson.payloadHash16("not json at all")
    assert(h.length === 16 && h.matches("[0-9a-f]{16}"))
  }

  test("canonicalize matches Python's accept/reject envelope (NaN, trailing, astral keys)") {
    // python: json.dumps(json.loads('{"v": NaN, ...}'), sort_keys=True,
    // separators=(',',':')) == '{"v":NaN,"w":Infinity,"x":-Infinity}'
    assert(CanonicalJson.canonicalize("""{"v": NaN, "w": Infinity, "x": -Infinity}""")
      === """{"v":NaN,"w":Infinity,"x":-Infinity}""")
    assert(CanonicalJson.payloadHash16("""{"v": NaN, "w": Infinity, "x": -Infinity}""")
      === "72fc2a4f64ecde5d")
    // python json.loads REJECTS trailing tokens → the reference hashes the
    // raw string; Jackson's default leniency would canonicalize '{}'
    assert(CanonicalJson.payloadHash16("{}garbage") === "7eb696333c2056fc")
    // python sorts keys by CODE POINT: U+FFFF before U+1F600; UTF-16
    // code-unit comparison would order the surrogate pair first
    val astral = "{\"\uD83D\uDE00\": 2, \"\uFFFF\": 1}"
    assert(CanonicalJson.canonicalize(astral)
      === "{\"\\uffff\":1,\"\\ud83d\\ude00\":2}")
    assert(CanonicalJson.payloadHash16(astral) === "7399aff294a6b56f")
  }

  test("non-Python non-finite literals (-INF) fall back to raw-string hash") {
    // Jackson accepts -INF; python json.loads rejects it → reference
    // hashes the raw string, so we must too
    intercept[Exception] { CanonicalJson.canonicalize("""{"v": -INF}""") }
    val raw = """{"v": -INF}"""
    assert(CanonicalJson.payloadHash16(raw) ===
      java.security.MessageDigest.getInstance("SHA-256")
        .digest(raw.getBytes("UTF-8")).map(b => f"${b & 0xff}%02x").mkString.take(16))
    // a STRING value containing "INF" is ordinary JSON on both sides
    assert(CanonicalJson.canonicalize("""{"x": "INF"}""") === """{"x":"INF"}""")
  }

  test("tokens strips ALL whitespace classes before splitting") {
    import org.apache.spark.sql.SparkSession
    val spark: SparkSession = SparkTestSession.spark
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val df = Seq((1L, "\nSome doc"), (2L, "\t"), (3L, " a\tb ")).toDF("id", "t")
    val out = df.select(col("id"),
      graft.operators.TextAnalysis.tokenCount(col("t")).as("n"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(out === Map(1L -> 2, 2L -> 0, 3L -> 2))
  }

  test("codePointCompare orders astral keys like Python") {
    assert(CanonicalJson.codePointCompare("\uFFFF", "\uD83D\uDE00") < 0)
    assert(CanonicalJson.codePointCompare("a", "ab") < 0)
    assert(CanonicalJson.codePointCompare("b", "a") > 0)
    assert(CanonicalJson.codePointCompare("same", "same") === 0)
  }
}
