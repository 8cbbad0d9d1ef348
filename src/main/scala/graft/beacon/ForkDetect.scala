package graft.beacon

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Legacy sampling-based fork detection — the fallback for beacon nodes
  * whose `/eth/v1/config/spec` is broken or absent, recovering the fork
  * schedule from the raw block payloads themselves (reference:
  * /root/reference/src/services/fork.py:253-361).
  *
  * Spark shape: ONE aggregate for the slot range (partial, no shuffle of
  * data), then one scan that filters `slot % interval = 0` BEFORE probing
  * the payload, so the JSON extraction runs on ~`targetSamples` rows
  * instead of every block — the reference's "sampling instead of full
  * table scan" strategy, expressed as a codegen'd filter + projection.
  * The sample set (≤ `maxSamples` rows) is collected and walked
  * driver-side exactly like the reference: first sighting of each new
  * `version` value marks that fork's activation epoch.
  *
  * Known imprecision, inherited deliberately: the transition is recorded
  * at the SAMPLE slot where the new version was first seen, which
  * overshoots the true activation by up to `interval` slots (the
  * reference accepts the same error, fork.py:322-347). Spec-derived
  * schedules ([[ChainConfig.fromSpecs]]) remain the primary path.
  */
object ForkDetect {

  /** Detected fork → activation epoch from sampled `$.version` transitions.
    * Returns the base schedule's epochs when the raw table is empty or the
    * sampling sees fewer than 3 forks (the reference's supplement rule). */
  def detectForkEpochs(
      rawBlocks: DataFrame, base: ChainConfig,
      targetSamples: Long = 1000L, maxSamples: Int = 2000): Map[String, Long] = {
    val defaults = base.forks.map(f => f.name -> f.epoch).toMap
    val range = rawBlocks.agg(
      min("slot").as("lo"), max("slot").as("hi")).head()
    if (range.isNullAt(0)) return defaults // no raw blocks yet
    val (lo, hi) = (range.getLong(0), range.getLong(1))
    // ~targetSamples points, never denser than one per 1000 slots
    val interval = math.max(1000L, (hi - lo) / math.max(1L, targetSamples))
    val samples = rawBlocks
      .filter(col("slot") % interval === 0)
      .select(col("slot"),
        get_json_object(col("payload"), "$.version").as("version"))
      .orderBy("slot")
      .limit(maxSamples)
      .collect()
    val forkOrder = base.forks.map(_.name)
    val versionOf = base.forks.map(f => f.name -> f.version).toMap
    val detected = scala.collection.mutable.LinkedHashMap("phase0" -> 0L)
    var last: String = null
    samples.foreach { r =>
      val v = if (r.isNullAt(1)) null else r.getString(1)
      if (v != null && v != last) {
        val epoch = r.getLong(0) / base.slotsPerEpoch
        val norm = v.toLowerCase
        if (forkOrder.contains(norm)) {
          // payload names the fork directly (post-Altair API shape)
          if (!detected.contains(norm)) detected(norm) = epoch
        } else {
          // payload carries the 4-byte hex fork version — map it back
          // (case-insensitively: clients differ on 0X / hex-digit case)
          forkOrder.drop(1) // phase0 is pinned at epoch 0
            .find(n => versionOf(n).equalsIgnoreCase(v) && !detected.contains(n))
            .foreach(n => detected(n) = epoch)
        }
        last = v
      }
    }
    // sampling over a short or single-fork table proves little: supplement
    // with the preset (reference fork.py:349-356)
    if (detected.size < 3)
      base.forks.foreach(f =>
        if (!detected.contains(f.name)) detected(f.name) = f.epoch)
    detected.toMap
  }

  /** Full config rebuilt from detection: detected epochs override the
    * preset's, names/versions/timing keep the preset's values. */
  def configFromDetection(
      rawBlocks: DataFrame, base: ChainConfig,
      targetSamples: Long = 1000L, maxSamples: Int = 2000): ChainConfig = {
    val epochs = detectForkEpochs(rawBlocks, base, targetSamples, maxSamples)
    base.copy(forks = base.forks
      .map(f => epochs.get(f.name).map(e => f.copy(epoch = e)).getOrElse(f))
      .sortBy(_.epoch))
  }
}
