package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Benchmark decontamination — the train/test-overlap detector every
  * training-data pipeline runs before a corpus ships: find corpus
  * documents that share verbatim w-token shingles with a benchmark
  * (evaluation) set, so they can be dropped or audited.
  *
  * Scale shape: the benchmark side is SMALL (eval suites are thousands of
  * documents; the corpus is the 100 TB side), so its distinct shingle set
  * is broadcast and the corpus-side explode joins it with a broadcast hash
  * join — no shuffle of the corpus, no sort. The corpus side then
  * aggregates matched shingles per document (map-side partial count).
  */
object Decontam {

  /** Corpus documents sharing ≥ `minHits` distinct w-token shingles with
    * ANY benchmark document. Returns `(idCol, n_hits)` where `n_hits` is
    * the count of DISTINCT contaminated shingles in the document (the
    * per-doc shingle sets are already distinct — [[Shingles.of]]).
    *
    * `w` trades precision for recall exactly like published
    * decontamination setups (8–13-gram windows on real corpora); pick the
    * smallest `w` whose shingles are rare enough to be evidence of
    * copying rather than chance collision.
    *
    * Broadcast guard: an explicit `broadcast()` bypasses
    * `autoBroadcastJoinThreshold`, and a huge eval suite's shingle set
    * (tens of millions of multi-word strings) would OOM the driver or hit
    * the broadcast hard limit. By default the decision is MEASURED, not
    * assumed: Catalyst's `optimizedPlan.stats.sizeInBytes` for the
    * benchmark text (free — file statistics or literal sizes, no job),
    * multiplied by `w` (each token lands in ≤ w shingles), compared
    * against `maxBroadcastBytes`. Unknown stats estimate as
    * `defaultSizeInBytes` = Long.Max → shuffle, the never-fatal side.
    * `broadcastBenchmark = Some(...)` overrides the estimate either way. */
  def contaminationHits(
      corpus: DataFrame, benchmark: DataFrame,
      idCol: String, textCol: String, w: Int, minHits: Long = 1L,
      broadcastBenchmark: Option[Boolean] = None,
      maxBroadcastBytes: Long = 1L << 30): DataFrame = {
    require(w >= 1, s"shingle width must be >= 1, got $w")
    val benchShingles = benchmark
      .select(explode(Shingles.of(col(textCol), w)).as("shingle"))
      .distinct()
    val doBroadcast = broadcastBenchmark.getOrElse {
      val textBytes = benchmark.select(col(textCol))
        .queryExecution.optimizedPlan.stats.sizeInBytes
      textBytes * w <= maxBroadcastBytes
    }
    val benchSide =
      if (doBroadcast) broadcast(benchShingles) else benchShingles
    val corpusShingles = corpus
      .select(col(idCol), explode(Shingles.of(col(textCol), w)).as("shingle"))
    corpusShingles
      .join(benchSide, Seq("shingle"))
      .groupBy(idCol)
      .agg(count(lit(1)).as("n_hits"))
      .filter(col("n_hits") >= minHits)
  }

  /** The gate most pipelines actually apply: the corpus MINUS contaminated
    * documents (left-anti against [[contaminationHits]]). */
  def decontaminated(
      corpus: DataFrame, benchmark: DataFrame,
      idCol: String, textCol: String, w: Int, minHits: Long = 1L,
      broadcastBenchmark: Option[Boolean] = None,
      maxBroadcastBytes: Long = 1L << 30): DataFrame = {
    val hits = contaminationHits(
      corpus, benchmark, idCol, textCol, w, minHits, broadcastBenchmark,
      maxBroadcastBytes)
    corpus.join(hits.select(idCol), Seq(idCol), "left_anti")
  }

  /** SEMANTIC decontamination — the embedding-side complement of the
    * shingle overlap: a corpus item is contaminated when its cosine
    * against ANY benchmark embedding exceeds `threshold` (paraphrased or
    * reformatted test items that share no n-grams still land next to
    * their source in embedding space). Benchmark broadcasts (benchmarks
    * are small by nature); the corpus never shuffles — per-row codegen'd
    * cosines and a map-side MAX aggregate, which is order-independent
    * and exact, so the double score itself is oracle-checkable. */
  def semanticContamination(
      corpus: org.apache.spark.sql.DataFrame, idCol: String, vecCol: String,
      benchmark: org.apache.spark.sql.DataFrame, benchVecCol: String,
      threshold: Double): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.functions._
    import graft.functions.GraftFunctions.vec_cosine
    corpus
      .crossJoin(broadcast(benchmark.select(col(benchVecCol).as("__b_vec"))))
      .withColumn("__cos", vec_cosine(col(vecCol), col("__b_vec")))
      .groupBy(col(idCol))
      .agg(max(col("__cos")).as("max_benchmark_cosine"))
      .withColumn("is_contaminated", col("max_benchmark_cosine") > threshold)
  }
}
