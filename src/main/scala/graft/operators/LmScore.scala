package graft.operators

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame}

/** N-gram language-model scoring for corpus quality filtering — the
  * CCNet/KenLM shape: score each document against a reference-corpus LM
  * and gate on the score (docs whose n-grams the reference has never seen
  * are out-of-domain or noise). The score here is the hash-checkable
  * integer core of that filter: the fraction of a document's token
  * bigrams ABSENT from the reference corpus's bigram vocabulary — exact
  * integer counts with ONE final IEEE division, so the whole gate
  * hash-matches a SQL oracle (true log-prob scoring differs in libm
  * last-ulps across engines and could not be driver-verified; the ranking
  * behavior — "how familiar is this text to the reference domain" — is
  * the same).
  *
  * Scale shape mirrors [[Decontam]]: the reference vocabulary (distinct
  * bigrams of a curated slice — wiki-sized, not corpus-sized) is the
  * SMALL side and is broadcast; the 100 TB corpus side is a per-row
  * codegen shingle kernel + broadcast hash join + map-side partial
  * count. The only corpus shuffle is the final per-doc aggregation.
  */
object LmScore {

  /** Multiplicity-preserving token bigrams ("w1 w2"), document order —
    * the [[Shingles.all]] codegen kernel at w=2. */
  def bigrams(text: Column): Column = Shingles.all(text, 2)

  /** Per-document bigram novelty against a reference corpus:
    * `(idCol, n_bigrams, n_unseen, novelty)` where `novelty` =
    * n_unseen / n_bigrams ∈ [0,1]. Documents with fewer than two tokens
    * have no bigrams and drop out (same as the oracle's empty unnest).
    *
    * Broadcast guard follows [[Decontam.contaminationHits]]: measured
    * via Catalyst's optimized-plan stats (×2 — each token lands in ≤2
    * bigrams), overridable with `broadcastReference`; unknown stats
    * estimate to Long.Max and take the never-fatal shuffle side. */
  def bigramNovelty(
      corpus: DataFrame, reference: DataFrame,
      idCol: String, textCol: String,
      broadcastReference: Option[Boolean] = None,
      maxBroadcastBytes: Long = 1L << 30): DataFrame = {
    val refVocab = reference
      .select(explode(bigrams(col(textCol))).as("bg"))
      .distinct()
      .withColumn("seen", lit(1))
    val doBroadcast = broadcastReference.getOrElse {
      val textBytes = reference.select(col(textCol))
        .queryExecution.optimizedPlan.stats.sizeInBytes
      textBytes * 2 <= maxBroadcastBytes
    }
    val refSide = if (doBroadcast) broadcast(refVocab) else refVocab
    corpus
      .select(col(idCol), explode(bigrams(col(textCol))).as("bg"))
      .join(refSide, Seq("bg"), "left")
      .groupBy(idCol)
      .agg(
        count(lit(1)).as("n_bigrams"),
        sum(when(col("seen").isNull, 1L).otherwise(0L)).as("n_unseen"))
      .withColumn("novelty",
        col("n_unseen").cast("double") / col("n_bigrams"))
  }

  /** Per-document AVERAGE reference-corpus frequency of its bigrams:
    * `(idCol, n_bigrams, ref_total, familiarity)` where `ref_total` is
    * the exact integer sum of each bigram's occurrence count in the
    * reference and `familiarity` = ref_total / n_bigrams. The
    * frequency-weighted companion of [[bigramNovelty]] (novelty only asks
    * seen/unseen; this is the KenLM-flavored signal — text built from
    * COMMON reference phrasing scores high, rare-but-seen phrasing low).
    * Exact integers + one final IEEE division, same oracle story; same
    * broadcast-vocabulary scale shape (counts ride the broadcast). */
  def bigramFamiliarity(
      corpus: DataFrame, reference: DataFrame,
      idCol: String, textCol: String,
      broadcastReference: Option[Boolean] = None,
      maxBroadcastBytes: Long = 1L << 30): DataFrame = {
    val refCounts = reference
      .select(explode(bigrams(col(textCol))).as("bg"))
      .groupBy("bg")
      .agg(count(lit(1)).as("ref_n"))
    val doBroadcast = broadcastReference.getOrElse {
      val textBytes = reference.select(col(textCol))
        .queryExecution.optimizedPlan.stats.sizeInBytes
      textBytes * 2 <= maxBroadcastBytes
    }
    val refSide = if (doBroadcast) broadcast(refCounts) else refCounts
    corpus
      .select(col(idCol), explode(bigrams(col(textCol))).as("bg"))
      .join(refSide, Seq("bg"), "left")
      .groupBy(idCol)
      .agg(
        count(lit(1)).as("n_bigrams"),
        sum(coalesce(col("ref_n"), lit(0L))).as("ref_total"))
      .withColumn("familiarity",
        col("ref_total").cast("double") / col("n_bigrams"))
  }

  /** The gate: corpus rows whose novelty is ≤ `maxNovelty` (docs the
    * reference LM finds familiar enough to keep). Documents with no
    * bigrams are KEPT — too short to judge, same policy as the quality
    * filter's length gate handling them explicitly. */
  def familiarityFiltered(
      corpus: DataFrame, reference: DataFrame,
      idCol: String, textCol: String, maxNovelty: Double,
      broadcastReference: Option[Boolean] = None): DataFrame = {
    val scored = bigramNovelty(
      corpus, reference, idCol, textCol, broadcastReference)
      .filter(col("novelty") > maxNovelty)
      .select(idCol)
    corpus.join(scored, Seq(idCol), "left_anti")
  }
}
