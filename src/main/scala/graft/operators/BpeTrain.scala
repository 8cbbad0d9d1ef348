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
  * 100 TB shape: pair counting is an explode + map-side-combined
  * groupBy (the only shuffle, keyed on the pair), the candidate fetch
  * is a `limit(batch+1)` top-k, and the rewrite is a zero-shuffle
  * scan-side fold per document. The corpus stays distributed
  * throughout; the driver holds only the merge table (k rows). Several
  * merges are learned per corpus pass — [[learnMerges]] accepts the
  * longest ranked prefix of pairwise symbol-disjoint candidates, which
  * provably stays on the exact one-merge-at-a-time greedy trajectory
  * (proof on the method).
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

  /** Learn `k` merges on the EXACT greedy trajectory (argmax pair by
    * `(count desc, left, right)`, deterministic tie-break) while
    * amortizing several merges per corpus pass. Per iteration: ONE
    * distributed pair-count pass fetching the top `batch+1` candidates,
    * a driver-side acceptance scan (below), and ONE scan-side rewrite
    * folding every accepted merge. Returns the merge table in order —
    * byte-identical to the one-merge-per-pass loop (`batch = 1` IS that
    * loop), only cheaper. The working token frame is persisted per
    * iteration and the superseded one released — the loop holds exactly
    * one tokenized corpus copy, like the PageRank checkpoint discipline.
    *
    * WHY BATCHING STAYS EXACT — the acceptance rule and its proof.
    * Scan the ranked candidate list `c₁, c₂, …` in order, accepting
    * while each cᵢ is symbol-disjoint from every candidate accepted
    * before it; STOP the batch at the first candidate that shares a
    * symbol (or at the fetch horizon), calling its count `n_stop`
    * (`minCount − 1` if the filtered list was exhausted first); finally
    * keep c₁ unconditionally plus the accepted tail with count
    * STRICTLY above `n_stop`. Each kept cᵢ is then the true greedy
    * argmax at its step, because after applying c₁‥cᵢ₋₁:
    *  - cᵢ's own count is unchanged — a merge (l,r) only touches
    *    adjacencies involving l or r, and cᵢ shares neither;
    *  - every pre-existing pair that could outrank cᵢ is already
    *    accepted above it — we stop at the FIRST sharing candidate, so
    *    the accepted set is a contiguous ranked prefix with no skips;
    *  - every EMERGENT pair (x, l⋈r) or (l⋈r, y) needs a pre-merge
    *    (x,l) / (r,y) adjacency per occurrence, so its count is
    *    bounded by a pair SHARING a symbol with an accepted merge —
    *    such pairs are never accepted, hence rank at/below the stop
    *    point, hence count ≤ n_stop < count(cᵢ) after the trim. (An
    *    emergent name like `a⋈b` can compare lexically BELOW a kept
    *    candidate, which is why the trim is strict, not ≥.)
    * c₁ needs no trim: it is the global argmax of the exact table.
    * SELF-pairs (a,a) break the emergent bound — (a⋈a,a) is enabled by
    * the accepted merge itself, not by a rejected sharing candidate —
    * so the scan also ends the batch at any self-pair, accepting it
    * only when it is c₁ (a run-heavy corpus degrades to batch = 1,
    * which is exactly the trajectory the claim promises).
    *
    * INTENDED REGIME — k in the tens to low hundreds (domain vocab
    * extensions, collocation tables): even batched, a 32k production
    * vocabulary is the wrong tool here. The production path at that
    * scale is: train on a small deterministic SAMPLE (merge tables are
    * stable under sampling — frequency ranks, not counts, drive the
    * trajectory; [[graft.operators.Sampling]] has the hash-sampler),
    * then encode the FULL corpus with [[applyMerges]], which is one
    * zero-shuffle scan whatever the table length. */
  def learnMerges(
      df: DataFrame, textCol: String, k: Int,
      joiner: String = "▁", minCount: Long = 2L, batch: Int = 16): Seq[Merge] =
    learnMergesStats(df, textCol, k, joiner, minCount, batch)._1

  /** [[learnMerges]] plus the number of corpus passes spent — the
    * batching payoff, reported by the SCALE stage ("k merges in p
    * passes") instead of asserted blind. */
  def learnMergesStats(
      df: DataFrame, textCol: String, k: Int,
      joiner: String = "▁", minCount: Long = 2L, batch: Int = 16): (Seq[Merge], Int) = {
    require(batch >= 1, s"batch must be >= 1: got $batch")
    var cur = df.select(toks(col(textCol)).as("__toks")).persist()
    cur.count()
    val merges = scala.collection.mutable.ArrayBuffer.empty[Merge]
    var passes = 0
    var done = false
    while (merges.size < k && !done) {
      passes += 1
      val want = math.min(batch, k - merges.size)
      val top = pairCountsOfTokens(cur)
        .filter(col("n") >= minCount)
        .orderBy(col("n").desc, col("left"), col("right"))
        .limit(want + 1).collect()
        .map(r => Merge(r.getString(0), r.getString(1), r.getLong(2)))
      if (top.isEmpty) done = true
      else {
        // acceptance scan: ranked prefix of pairwise symbol-disjoint
        // candidates, n_stop = count at the first rejection / horizon
        val used = scala.collection.mutable.HashSet.empty[String]
        val accepted = scala.collection.mutable.ArrayBuffer.empty[Merge]
        var stopN = minCount - 1 // list exhausted => emergents < minCount
        var i = 0
        var stopped = false
        while (i < top.length && !stopped) {
          val c = top(i)
          if (i >= want || used(c.left) || used(c.right)) {
            stopped = true; stopN = c.count
          } else if (c.left == c.right) {
            // SELF-pair (a,a): its emergent pairs (a⋈a,a)/(a,a⋈a)/
            // (a⋈a,a⋈a) are enabled by the ACCEPTED merge itself, so
            // they are bounded by c.count — NOT by a rejected
            // symbol-sharing candidate — and no later-ranked candidate
            // can be proven safe in the same pass. End the batch here:
            // accept only as c₁ (the global argmax needs no proof);
            // at i > 0 leave it for the next pass, where stopN = its
            // count still bounds emergents of the earlier accepts.
            if (i == 0) accepted += c
            stopped = true; stopN = c.count
          } else {
            accepted += c; used += c.left; used += c.right; i += 1
          }
        }
        // counts are non-increasing, so the strict trim is a takeWhile
        val kept = accepted.head +: accepted.tail.takeWhile(_.count > stopN)
        merges ++= kept
        val rewritten = kept.foldLeft(col("__toks")) { (t, m) =>
          mergeOnce(t, m.left, m.right, joiner)
        }
        val next = cur.select(rewritten.as("__toks")).persist()
        next.count()
        cur.unpersist(blocking = false)
        cur = next
      }
    }
    cur.unpersist(blocking = false)
    (merges.toSeq, passes)
  }
}
