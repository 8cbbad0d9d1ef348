package graft.operators

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame}

/** Hashed-linear document classifier — the fastText shape (Joulin et al.
  * 2016) that production pipelines use as the learned quality gate
  * (e.g. "does this look like reference-quality prose"): embed each token
  * through a HASHED weight table (no vocabulary file — the hash IS the
  * lookup), average the weights, threshold the score.
  *
  * The weight table here is derived from md5 rather than learned, which
  * keeps the operator DETERMINISTIC and oracle-checkable while exercising
  * the exact runtime shape a trained model would: per-token hash → weight
  * lookup → mean-pool → linear decision. Swapping in trained weights is a
  * one-line change (replace [[tokenHash]] with a broadcast map lookup);
  * the plan shape — a per-row scan-side expression with NO shuffle and no
  * UDF — is the part that matters at 100 TB.
  *
  * Hash-check design: the score keeps an exact integer core (a Long sum
  * of uint32 token hashes) and applies ONE IEEE division + subtraction at
  * the end, so DuckDB reproduces it bit-for-bit (same md5, same integer
  * sum, same two float ops in the same order).
  */
object Classifier {

  /** Token weight hash: first 8 md5 hex digits of `"<seed>#<token>"` as a
    * uint32 in [0, 2^32). The implied weight is `h/2^31 − 1 ∈ [−1, 1)` —
    * uniform, zero-mean, deterministic. */
  def tokenHash(tok: Column, seed: String): Column =
    conv(substring(md5(concat(lit(s"$seed#"), tok)), 1, 8), 16, 10).cast("long")

  /** Per-document linear score, entirely scan-side (one `aggregate` over
    * the token array — no explode, no shuffle):
    *
    *   `score = (Σ_t h(t)) / (n · 2^31) − 1  =  mean_t(h(t)/2^31 − 1)`
    *
    * Output: `(id, n_tokens, hash_sum, score, keep)` with
    * `keep = score > threshold`. Empty documents score NULL and are never
    * kept (no tokens → no evidence → fail closed, matching the quality
    * filter's stance on empty text). */
  def scored(
      df: DataFrame, idCol: String, textCol: String,
      seed: String = "w", threshold: Double = 0.0): DataFrame = {
    val toks = TextAnalysis.tokens(col(textCol))
    df.select(col(idCol), toks.as("_toks"))
      .withColumn("n_tokens", size(col("_toks")).cast("long"))
      .withColumn(
        "hash_sum",
        aggregate(col("_toks"), lit(0L), (acc, t) => acc + tokenHash(t, seed)))
      .withColumn(
        "score",
        when(col("n_tokens") > 0,
          col("hash_sum").cast("double") / (col("n_tokens") * lit(2.147483648e9)) - 1))
      .withColumn("keep", coalesce(col("score") > threshold, lit(false)))
      .drop("_toks")
  }

  /** The gate itself: rows whose score clears the threshold — the score
    * recomputed INLINE in the filter predicate so the gate is a pure
    * scan-side filter (no join, no shuffle; Catalyst pushes it to the
    * parquet scan boundary). */
  def filtered(
      df: DataFrame, textCol: String,
      seed: String = "w", threshold: Double = 0.0): DataFrame = {
    val toks = TextAnalysis.tokens(col(textCol))
    val n = size(toks)
    val hs = aggregate(toks, lit(0L), (acc, t) => acc + tokenHash(t, seed))
    df.filter(n > 0 && (hs.cast("double") / (n * lit(2.147483648e9)) - 1) > threshold)
  }
}
