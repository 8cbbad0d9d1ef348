package graft

import graft.beacon.Loaders
import graft.core.Observability
import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import java.net.http.{HttpClient, HttpRequest, HttpResponse}

/** /metrics + /health HTTP surface (D11) and the validators `id`-filter
  * query param (S3).
  */
class ObservabilitySpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkTestSession.spark

  private def get(port: Int, path: String): HttpResponse[String] =
    HttpClient.newHttpClient().send(
      HttpRequest.newBuilder(java.net.URI.create(s"http://127.0.0.1:$port$path"))
        .GET().build(),
      HttpResponse.BodyHandlers.ofString())

  test("metrics server: Prometheus counters, health JSON, 503 on failure, 404 elsewhere") {
    val port = Observability.start(spark, 0, () => Map("ingest_lag_slots" -> 42L))
    try {
      graft.core.Metrics.of(spark).chunksCompleted.add(3)
      val m = get(port, "/metrics")
      assert(m.statusCode() === 200)
      assert(m.body().contains("# TYPE graft_chunks_completed_total counter"))
      assert(m.body().contains("graft_api_fetched_total"))
      assert(m.body().contains("# TYPE graft_ingest_lag_slots gauge"))
      assert(m.body().contains("graft_ingest_lag_slots 42"))
      val h = get(port, "/health")
      assert(h.statusCode() === 200)
      assert(h.body().contains("\"status\": \"ok\""))
      Observability.updateHealth("status" -> "failed", "last_error" -> "boom \"x\"")
      val bad = get(port, "/health")
      assert(bad.statusCode() === 503)
      assert(bad.body().contains("\\\"x\\\"")) // JSON escaping
      Observability.updateHealth("status" -> "ok")
      assert(get(port, "/nope").statusCode() === 404)
      // idempotent start returns the same bound port
      assert(Observability.start(spark, 0) === port)
    } finally Observability.stop()
  }

  test("normalizeApiEndpoint collapses dynamic paths to bounded routes (C16)") {
    import graft.core.Observability.normalizeApiEndpoint
    assert(normalizeApiEndpoint("/eth/v2/beacon/blocks/123456")
      === "/eth/v2/beacon/blocks/{block_id}")
    assert(normalizeApiEndpoint("/eth/v1/beacon/states/98765/validators?id=1,2")
      === "/eth/v1/beacon/states/{state_id}/validators")
    assert(normalizeApiEndpoint("/eth/v1/beacon/states/head/pending_deposits")
      === "/eth/v1/beacon/states/{state_id}/pending_deposits")
    assert(normalizeApiEndpoint("/eth/v1/debug/beacon/data_column_sidecars/42")
      === "/eth/v1/debug/beacon/data_column_sidecars/{slot}")
    assert(normalizeApiEndpoint("/eth/v1/beacon/blobs/42")
      === "/eth/v1/beacon/blobs/{block_id}")
    assert(normalizeApiEndpoint("/eth/v1/beacon/rewards/blocks/7")
      === "/eth/v1/beacon/rewards/blocks/{block_id}")
    // unknown routes pass through query-stripped
    assert(normalizeApiEndpoint("/eth/v1/node/health?x=1") === "/eth/v1/node/health")
  }

  test("per-endpoint request counters surface in /metrics with route labels (C16)") {
    import graft.beacon._
    val port = Observability.start(spark, 0)
    try {
      val rawDir = java.nio.file.Files.createTempDirectory("graft_obs").toString + "/raw"
      RawIngest.fetchSlots(spark, 0L to 9L,
        MapSlotFetcher((0L to 9L).map(s => s -> "{}").toMap), 2).count()
      val m = get(port, "/metrics").body()
      assert(m.contains("""graft_api_requests_total{endpoint="offline"}"""), m)
    } finally Observability.stop()
  }

  test("validators fetcher sends the comma-joined id filter (beacon_api.py:173-181)") {
    @volatile var seenQuery: String = null
    val server = com.sun.net.httpserver.HttpServer.create(
      new java.net.InetSocketAddress(0), 0)
    server.createContext("/", (ex: com.sun.net.httpserver.HttpExchange) => {
      seenQuery = ex.getRequestURI.getQuery
      val body = """{"data":[]}""".getBytes("UTF-8")
      ex.sendResponseHeaders(200, body.length.toLong)
      val os = ex.getResponseBody
      try os.write(body) finally os.close()
    })
    server.start()
    try {
      val port = server.getAddress.getPort
      val f = Loaders.validatorsFetcher(
        s"http://127.0.0.1:$port", ids = Seq("1", "17", "0xabc"), apiKey = Some("k1"))
      assert(f.fetch(1234L).contains("""{"data":[]}"""))
      assert(seenQuery === "id=1,17,0xabc&api_key=k1")
      // no ids → no id param, key only
      Loaders.validatorsFetcher(s"http://127.0.0.1:$port", apiKey = Some("k1")).fetch(9L)
      assert(seenQuery === "api_key=k1")
      // neither → no query at all
      Loaders.validatorsFetcher(s"http://127.0.0.1:$port").fetch(9L)
      assert(seenQuery === null)
    } finally server.stop(0)
  }
}
