package graft.functions

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}

import java.nio.charset.StandardCharsets
import java.security.MessageDigest

/** Canonical-JSON serialization byte-compatible with Python's
  * `json.dumps(obj, sort_keys=True, separators=(',', ':'))` (default
  * `ensure_ascii=True`), which the reference uses for its write-side dedup
  * key `payload_hash` (reference: src/loaders/base.py:17-31). Keys sorted
  * code-point ascending; no whitespace; non-ASCII escaped as `\uXXXX`
  * (surrogate pairs for astral planes); `/` NOT escaped.
  */
object CanonicalJson {
  private val mapper = new ObjectMapper()

  def canonicalize(json: String): String = {
    val node = mapper.readTree(json)
    val sb = new java.lang.StringBuilder(json.length)
    write(node, sb)
    sb.toString
  }

  private def write(node: JsonNode, sb: java.lang.StringBuilder): Unit = {
    if (node.isObject) {
      sb.append('{')
      val names = new java.util.ArrayList[String]()
      val it = node.fieldNames()
      while (it.hasNext) names.add(it.next())
      java.util.Collections.sort(names)
      var first = true
      val ni = names.iterator()
      while (ni.hasNext) {
        val name = ni.next()
        if (!first) sb.append(',')
        first = false
        writeString(name, sb)
        sb.append(':')
        write(node.get(name), sb)
      }
      sb.append('}')
    } else if (node.isArray) {
      sb.append('[')
      var first = true
      val it = node.elements()
      while (it.hasNext) {
        if (!first) sb.append(',')
        first = false
        write(it.next(), sb)
      }
      sb.append(']')
    } else if (node.isTextual) {
      writeString(node.textValue(), sb)
    } else if (node.isNull) {
      sb.append("null")
    } else if (node.isBoolean) {
      sb.append(if (node.booleanValue()) "true" else "false")
    } else if (node.isIntegralNumber) {
      sb.append(node.bigIntegerValue().toString)
    } else {
      // Python repr of floats: shortest round-trip. Java's Double.toString
      // matches for common cases; beacon payloads carry no floats in
      // practice (all quantities are strings/ints).
      val d = node.doubleValue()
      if (d == Math.floor(d) && !d.isInfinite && Math.abs(d) < 1e16)
        sb.append(d.toLong).append(".0")
      else sb.append(d)
    }
  }

  /** Python json escaping with ensure_ascii=True. */
  private def writeString(s: String, sb: java.lang.StringBuilder): Unit = {
    sb.append('"')
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      c match {
        case '"'  => sb.append("\\\"")
        case '\\' => sb.append("\\\\")
        case '\n' => sb.append("\\n")
        case '\r' => sb.append("\\r")
        case '\t' => sb.append("\\t")
        case '\b' => sb.append("\\b")
        case '\f' => sb.append("\\f")
        case c if c < 0x20 || c > 0x7e =>
          sb.append(f"\\u${c.toInt}%04x")
        case c => sb.append(c)
      }
      i += 1
    }
    sb.append('"')
  }

  private def sha256Hex(s: String): String = {
    val md = MessageDigest.getInstance("SHA-256")
    val digest = md.digest(s.getBytes(StandardCharsets.UTF_8))
    val sb = new java.lang.StringBuilder(64)
    digest.foreach(b => sb.append(f"${b & 0xff}%02x"))
    sb.toString
  }

  /** First 16 hex chars of sha256(canonical JSON) — the reference's
    * `calculate_payload_hash` (src/loaders/base.py:17-31). Falls back to
    * hashing the raw string when the payload is not valid JSON.
    */
  def payloadHash16(json: String): String = {
    val canonical =
      try canonicalize(json)
      catch { case _: Exception => json }
    sha256Hex(canonical).substring(0, 16)
  }
}
