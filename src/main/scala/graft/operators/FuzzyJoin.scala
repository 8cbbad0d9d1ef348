package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Approximate string self-join under edit distance — the entity/vocab
  * fuzzy-matching primitive (spell-candidate generation, near-identical
  * field linkage) that a naive formulation writes as an O(n²) cross join
  * with a `levenshtein` predicate, which Spark would plan as a
  * BroadcastNestedLoopJoin and which is unrunnable at corpus vocabulary
  * scale.
  *
  * This is the deletion-neighborhood rewrite (the FastSS construction,
  * Bocek et al. 2007): for ED ≤ 1, two words match iff they share an
  * element of D(w) = {w} ∪ {w with one character deleted} — substitution
  * at i shares the delete-at-i string, insertion/deletion shares the
  * shorter word itself, equality shares w. Membership is COMPLETE, so
  * the signature equi-join loses nothing; the exact `levenshtein` check
  * afterwards removes the false positives the intersection admits (e.g.
  * "ab"/"ba" share "a" at distance 2). ED ≤ 2 extends with two-deletion
  * signatures (L²/2 fan-out) — not implemented until something needs it.
  */
object FuzzyJoin {

  /** All edit-distance ≤ 1 pairs within `words` (one string column),
    * output `(w1, w2)` with `w1 < w2`, each pair once.
    *
    * Plan shape at scale: one generate (≤ len+1 signatures per word, a
    * HOF over the string — no UDF), one hash shuffle on the signature,
    * one equi self-join, then the codegen'd `levenshtein` verify on the
    * surviving candidates only. Per-signature fan-out is bounded by the
    * alphabet: a signature of length L can only come from the ~|Σ|·(L+1)
    * words within one edit of it, so no bucket goes quadratic the way a
    * band bucket can in MinHash LSH — the join needs no hot-key guard. */
  def editDistance1Pairs(words: DataFrame, wordCol: String): DataFrame = {
    val w = col(wordCol)
    // delete-at-i strings, i = 1..len (1-based); array_union with the
    // word itself also dedups repeated-character deletions ("aab" →
    // "ab" once), so a pair is found at most once per shared signature
    val dels = transform(sequence(lit(1), length(w)),
      i => concat(w.substr(lit(1), i - 1), w.substr(i + 1, length(w) - i)))
    // empty strings are excluded: Spark's sequence(1, 0) runs BACKWARDS
    // ([1, 0]) rather than empty, and an empty word's only ED-1 partners
    // are single characters — callers wanting those can special-case
    val sigs = words.filter(length(w) > 0)
      .select(w.as("__w"), explode(array_union(array(w), dels)).as("__sig"))
    sigs.as("a")
      .join(sigs.as("b"), col("a.__sig") === col("b.__sig"))
      .filter(col("a.__w") < col("b.__w"))
      .select(col("a.__w").as("w1"), col("b.__w").as("w2"))
      .dropDuplicates("w1", "w2")
      .filter(levenshtein(col("w1"), col("w2")) <= 1)
  }
}
