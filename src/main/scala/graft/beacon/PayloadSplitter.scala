package graft.beacon

import com.fasterxml.jackson.core.{JsonFactory, JsonToken}

import java.io.StringWriter

/** SURVEY §7.4 hard part: a validators snapshot is ONE JSON string holding
  * 400k–2M records (~100s of MB). A single parquet cell that large wrecks
  * row-group sizing and task balance, so ingest splits the `data[]` array
  * into bounded parts — with a *streaming* Jackson parse (token cursor, no
  * DOM): memory stays O(entriesPerPart), not O(payload).
  *
  * `payload_hash` parity: the hash is computed on the INTACT payload
  * before splitting (reference dedup identity, src/loaders/base.py:17-31);
  * parts carry (part_index, part_count) so the original identity is
  * reconstructible and F4 dedup keys on (slot, payload_hash, part_index).
  */
object PayloadSplitter {

  private val factory = new JsonFactory()

  /** Split `{"data": [e1, e2, ...]}` into parts of ≤ entriesPerPart
    * elements, each re-serialized as `{"data":[...]}`. Non-conforming
    * payloads (no top-level `data` array) return a single intact part.
    */
  def split(payload: String, entriesPerPart: Int): Seq[String] = {
    require(entriesPerPart > 0)
    try {
      val parser = factory.createParser(payload)
      try {
        if (parser.nextToken() != JsonToken.START_OBJECT) return Seq(payload)
        var dataFound = false
        while (!dataFound && parser.nextToken() != null && parser.currentToken() != JsonToken.END_OBJECT) {
          val name = parser.currentName()
          parser.nextToken()
          if (name == "data" && parser.currentToken() == JsonToken.START_ARRAY) dataFound = true
          else parser.skipChildren()
        }
        if (!dataFound) return Seq(payload)

        val parts = Seq.newBuilder[String]
        var writer: StringWriter = null
        var gen: com.fasterxml.jackson.core.JsonGenerator = null
        var inPart = 0

        def open(): Unit = {
          writer = new StringWriter()
          gen = factory.createGenerator(writer)
          gen.writeStartObject()
          gen.writeArrayFieldStart("data")
          inPart = 0
        }
        def close(): Unit = {
          gen.writeEndArray()
          gen.writeEndObject()
          gen.close()
          parts += writer.toString
        }

        open()
        while (parser.nextToken() != JsonToken.END_ARRAY) {
          if (inPart == entriesPerPart) { close(); open() }
          gen.copyCurrentStructure(parser)
          inPart += 1
        }
        close()
        parts.result()
      } finally parser.close()
    } catch {
      case _: Exception => Seq(payload) // malformed → keep intact (parser will 0-row it)
    }
  }
}
