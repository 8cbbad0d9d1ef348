package graft.operators

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame}

/** BPE-style merge learning over a distributed corpus — the
  * tokenizer-training primitive (Sennrich et al. 2016, "Neural Machine
  * Translation of Rare Words with Subword Units"): repeatedly count
  * adjacent symbol pairs and merge the most frequent. Here the symbol
  * alphabet starts at whitespace tokens (the corpus-statistics half of
  * BPE training — the same machinery applies to character alphabets by
  * pre-splitting differently).
  *
  * 100 TB shape: ONE pass per learned merge — pair counting is an
  * explode + map-side-combined groupBy (the only shuffle, keyed on the
  * pair), the argmax is a 1-row `limit(1)` fetch, and the rewrite is a
  * zero-shuffle scan-side fold per document. The corpus stays
  * distributed throughout; the driver holds only the merge table
  * (k rows). k merges = k such passes — the textbook trade; production
  * trainers batch several disjoint merges per pass, which this loop
  * supports by construction (the rewrite is per-row).
  */
object BpeTrain {

  /** Whitespace tokens with empties dropped (doc with < 2 tokens
    * contributes no pairs). */
  private def toks(text: Column): Column =
    filter(split(text, " "), t => t =!= "")

  /** Adjacent-pair counts over the corpus: `(left, right, n)`.
    * Per-row zip of the token array against its own tail (scan-side),
    * then one count aggregation keyed on the pair. */
  def pairCounts(df: DataFrame, textCol: String): DataFrame =
    pairCountsOfTokens(df.select(toks(col(textCol)).as("__toks")))

  private def pairCountsOfTokens(tokenized: DataFrame): DataFrame =
    tokenized
      .filter(size(col("__toks")) >= 2)
      .select(explode(
        zip_with(
          slice(col("__toks"), lit(1), size(col("__toks")) - 1),
          slice(col("__toks"), lit(2), size(col("__toks")) - 1),
          (a, b) => struct(a.as("left"), b.as("right")))).as("p"))
      .select(col("p.left").as("left"), col("p.right").as("right"))
      .groupBy("left", "right")
      .agg(count(lit(1)).as("n"))

  /** One BPE rewrite: merge every non-overlapping adjacent occurrence of
    * `(l, r)` left-to-right into the single symbol `l+joiner+r` — a
    * scan-side fold carrying (done, pending) state, zero shuffle. */
  private def mergeOnce(tokens: Column, l: String, r: String, joiner: String): Column = {
    val folded = aggregate(
      tokens,
      struct(array().cast("array<string>").as("done"), lit("").as("pend"),
        lit(false).as("hasPend")),
      (acc, t) => {
        val pendIsL = acc.getField("hasPend") && acc.getField("pend") === lit(l)
        val mergeNow = pendIsL && (t === lit(r))
        struct(
          when(mergeNow, array_append(acc.getField("done"), lit(l + joiner + r)))
            .when(acc.getField("hasPend"),
              array_append(acc.getField("done"), acc.getField("pend")))
            .otherwise(acc.getField("done")).as("done"),
          when(mergeNow, lit("")).otherwise(t).as("pend"),
          when(mergeNow, lit(false)).otherwise(lit(true)).as("hasPend"))
      },
      acc => when(acc.getField("hasPend"),
        array_append(acc.getField("done"), acc.getField("pend")))
        .otherwise(acc.getField("done")))
    folded
  }

  final case class Merge(left: String, right: String, count: Long)

  /** APPLY a learned merge table — the tokenize-the-corpus half of the
    * tokenizer story ([[learnMerges]] trains on corpus A; this encodes
    * corpus B with the frozen table, the train/apply split every
    * production tokenizer has). The merges fold in TABLE ORDER, each one
    * the same scan-side left-to-right [[mergeOnce]] rewrite learning
    * used — so apply(train_corpus) reproduces the training trajectory
    * exactly. Pure per-row expressions: zero shuffle, the corpus is
    * read once whatever the table length. Adds `outCol` (the token
    * array) and `n_tokens`. */
  def applyMerges(
      df: DataFrame, textCol: String, merges: Seq[(String, String)],
      joiner: String = "▁", outCol: String = "bpe_tokens"): DataFrame = {
    val tokenized = merges.foldLeft(toks(col(textCol))) {
      case (acc, (l, r)) => mergeOnce(acc, l, r, joiner)
    }
    df.withColumn(outCol, tokenized)
      .withColumn("n_tokens", size(col(outCol)).cast("long"))
  }

  /** Learn `k` merges: per iteration, ONE distributed pair-count pass,
    * the argmax pair by `(count desc, left, right)` (deterministic
    * tie-break), and ONE scan-side rewrite. Returns the learned merge
    * table in order. The working token frame is persisted per iteration
    * and the superseded one released — k iterations hold exactly one
    * tokenized corpus copy, like the PageRank loop's checkpoint
    * discipline.
    *
    * INTENDED REGIME — k in the tens to low hundreds (domain vocab
    * extensions, collocation tables): the loop is exact greedy BPE at
    * one full corpus pass per merge, so a 32k production vocabulary
    * would be 32k passes — wrong tool. The production path at that
    * scale is: train on a small deterministic SAMPLE (merge tables are
    * stable under sampling — frequency ranks, not counts, drive the
    * trajectory; [[graft.operators.Sampling]] has the hash-sampler),
    * then encode the FULL corpus with [[applyMerges]], which is one
    * zero-shuffle scan whatever the table length. Batching merges
    * between recounts was considered and rejected: a merge can create
    * emergent pairs (joined-token adjacencies) whose count exceeds the
    * batch's next pick, so batched selection silently leaves the exact
    * greedy trajectory — no cheap post-hoc verification bounds
    * mid-trajectory counts without per-position deltas. */
  def learnMerges(
      df: DataFrame, textCol: String, k: Int,
      joiner: String = "▁", minCount: Long = 2L): Seq[Merge] = {
    var cur = df.select(toks(col(textCol)).as("__toks")).persist()
    cur.count()
    val merges = scala.collection.mutable.ArrayBuffer.empty[Merge]
    var i = 0
    var done = false
    while (i < k && !done) {
      val top = pairCountsOfTokens(cur)
        .filter(col("n") >= minCount)
        .orderBy(col("n").desc, col("left"), col("right"))
        .limit(1).collect()
      if (top.isEmpty) done = true
      else {
        val (l, r, n) = (top(0).getString(0), top(0).getString(1), top(0).getLong(2))
        merges += Merge(l, r, n)
        val next = cur.select(mergeOnce(col("__toks"), l, r, joiner).as("__toks"))
          .persist()
        next.count()
        cur.unpersist(blocking = false)
        cur = next
      }
      i += 1
    }
    cur.unpersist(blocking = false)
    merges.toSeq
  }
}
