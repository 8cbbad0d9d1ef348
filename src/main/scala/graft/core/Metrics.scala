package graft.core

import org.apache.spark.sql.SparkSession
import org.apache.spark.util.LongAccumulator

/** D11 observability, Spark-native: the reference's Prometheus counters
  * (API requests, rows written, chunk transitions, ingest lag;
  * src/observability.py:20-198) become named `LongAccumulator`s — visible
  * in the Spark UI/REST metrics per stage, aggregated across executors,
  * and exportable to any sink via [[report]].
  */
object Metrics {

  final case class EngineMetrics(
      apiFetched: LongAccumulator,
      apiEmpty: LongAccumulator,
      rowsWritten: LongAccumulator,
      chunksCompleted: LongAccumulator,
      chunksFailed: LongAccumulator)

  private val cache = new java.util.WeakHashMap[SparkSession, EngineMetrics]()

  def of(spark: SparkSession): EngineMetrics = cache.synchronized {
    Option(cache.get(spark)).getOrElse {
      val sc = spark.sparkContext
      val m = EngineMetrics(
        sc.longAccumulator("graft.api.fetched"),
        sc.longAccumulator("graft.api.empty404"),
        sc.longAccumulator("graft.rows.written"),
        sc.longAccumulator("graft.chunks.completed"),
        sc.longAccumulator("graft.chunks.failed"))
      cache.put(spark, m)
      m
    }
  }

  def report(spark: SparkSession): Map[String, Long] = {
    val m = of(spark)
    Map(
      "api_fetched" -> m.apiFetched.value,
      "api_empty404" -> m.apiEmpty.value,
      "rows_written" -> m.rowsWritten.value,
      "chunks_completed" -> m.chunksCompleted.value,
      "chunks_failed" -> m.chunksFailed.value)
  }

  // Per-endpoint request counters (reference labels its API counters by
  // normalized route, observability.py:124-145 — C16). Accumulators are
  // registered lazily per (session, route) on the driver and captured in
  // the fetch closures.
  private val endpointCache =
    new java.util.WeakHashMap[SparkSession, scala.collection.concurrent.TrieMap[String, LongAccumulator]]()

  def endpoint(spark: SparkSession, route: String): LongAccumulator =
    endpointCache.synchronized {
      val perSession = Option(endpointCache.get(spark)).getOrElse {
        val m = scala.collection.concurrent.TrieMap.empty[String, LongAccumulator]
        endpointCache.put(spark, m)
        m
      }
      perSession.getOrElseUpdate(route,
        spark.sparkContext.longAccumulator(s"graft.api.requests.$route"))
    }

  def endpointReport(spark: SparkSession): Map[String, Long] =
    endpointCache.synchronized {
      Option(endpointCache.get(spark))
        .map(_.view.mapValues(_.value.longValue()).toMap).getOrElse(Map.empty)
    }

  /** Realtime ingest lag in slots (reference gauge: loader.py:106-112). */
  def ingestLag(headSlot: Long, maxIngestedSlot: Option[Long]): Long =
    headSlot - maxIngestedSlot.getOrElse(-1L)
}
