package graft.operators

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame}

/** Text-analysis operators for large-scale training-data pipelines. All are
  * per-row column expressions (no shuffle, full whole-stage codegen) — they
  * scale linearly with partitions at 100 TB.
  */
object TextAnalysis {

  /** Whitespace tokenization (the `\s+`-split token count every data
    * pipeline starts from). Empty / whitespace-only text tokenizes to []
    * — a bare `split` yields [""], a phantom token that inflates counts
    * and ratio denominators. Stripping uses the SAME `\s` class as the
    * split (`trim` strips only 0x20 spaces, so a leading tab/newline
    * would reintroduce the phantom token). All codegen'd built-ins. */
  def tokens(text: Column): Column = {
    val stripped = regexp_replace(text, "^\\s+|\\s+$", "")
    when(length(stripped) === 0, array().cast("array<string>"))
      .otherwise(split(stripped, "\\s+"))
  }

  def tokenCount(text: Column): Column = size(tokens(text))

  /** RAG/retrieval passage chunker: sliding token windows of
    * `chunkTokens` starting every `stride` tokens (stride < chunkTokens ⇒
    * overlapping passages, the retrieval-context shape; stride ==
    * chunkTokens ⇒ disjoint packing prep). One row per passage:
    * (id, chunk_idx, token_start, chunk_text); a document shorter than
    * one window yields a single truncated passage, an empty document
    * yields none. Pure scan-side explode — tokens, window starts, and
    * slices are all codegen'd array ops; no shuffle, no UDF. */
  def passageChunks(
      df: DataFrame, idCol: String, textCol: String,
      chunkTokens: Int, stride: Int): DataFrame = {
    require(chunkTokens > 0 && stride > 0,
      s"chunkTokens/stride must be positive, got $chunkTokens/$stride")
    df.select(col(idCol), tokens(col(textCol)).as("__toks"))
      .withColumn("__n", size(col("__toks")))
      .filter(col("__n") > 0)
      .select(col(idCol), col("__toks"),
        posexplode(sequence(lit(0), col("__n") - 1, lit(stride))))
      .select(
        col(idCol),
        col("pos").cast("long").as("chunk_idx"),
        col("col").cast("long").as("token_start"),
        array_join(slice(col("__toks"), col("col") + 1, lit(chunkTokens)), " ")
          .as("chunk_text"))
  }

  /** BPE-ish sub-word proxy — the GPT-2 pre-tokenizer regex shape as an
    * EXTRACTION pattern: letter runs, digit runs, and each remaining
    * non-space symbol are one pre-token each (real BPE then merges
    * within these; their count upper-bounds and tracks the BPE token
    * count). Extraction instead of lookaround-split so the identical
    * RE2-compatible pattern runs in DuckDB for the oracle (RE2 has no
    * lookbehind, and its `\s` lacks vertical tab — the whitespace class
    * is spelled out, as everywhere else in the oracle surface). NULL
    * text stays NULL. */
  def bpeishTokenCount(text: Column): Column =
    size(regexp_extract_all(text,
      lit("\\p{L}+|\\p{N}+|[^\\p{L}\\p{N} \\t\\n\\x0b\\f\\r]"), lit(0)))

  /** Crude syllable estimate: the number of maximal `[aeiouy]+` runs in
    * the lowercased text — the standard cheap heuristic readability
    * formulas are defined over. Computed WHOLE-TEXT (run count equals
    * the per-word sum, since whitespace never extends a vowel run) as
    * two codegen'd regexp_replace lengths, no tokenize, no explode. */
  def syllableEstimate(text: Column): Column = {
    val s0 = lower(text)
    (length(regexp_replace(s0, "[aeiouy]+", "V")) -
      length(regexp_replace(s0, "[aeiouy]+", ""))).cast("long")
  }

  /** Terminal-punctuation sentence count (`.` `!` `?` occurrences). */
  def sentenceCount(text: Column): Column =
    (length(text) - length(regexp_replace(text, "[.!?]", ""))).cast("long")

  /** Flesch reading-ease per row: `206.835 − 1.015·(words/sentences) −
    * 84.6·(syllables/words)`, with words and sentences clamped to ≥1 so
    * empty or terminator-free docs (one-sentence convention) stay
    * finite. Every term is a fixed-order IEEE double chain over exact
    * integer counts — bitwise-mirrorable in an oracle. Pure scan-side:
    * three regexp passes, zero shuffles. */
  def readability(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val t = col(textCol)
    val words = tokenCount(t).cast("long")
    val sents = sentenceCount(t)
    val syll = syllableEstimate(t)
    val w = greatest(words, lit(1L)).cast("double")
    val sd = greatest(sents, lit(1L)).cast("double")
    df.select(col(idCol), words.as("n_words"), sents.as("n_sentences"),
      syll.as("n_syllables"),
      (lit(206.835) - lit(1.015) * (w / sd) -
        lit(84.6) * (syll.cast("double") / w)).as("flesch"))
  }

  /** Quality signals: length, token count, mean token length, punctuation
    * ratio, stopword ratio. Composable score in [0,1]. Tokenizes ONCE into
    * a hidden column (same CollapseProject-resistant shape as
    * [[withLangId]]): the token array feeds four of the five signals, and
    * inlining it would re-run the tokenizer per signal per row. */
  def qualityStats(df: DataFrame, textCol: String): DataFrame = {
    val t = col(textCol)
    val tmp = "__quality_toks"
    require(!df.columns.contains(tmp),
      s"input already has a column named $tmp — rename it before qualityStats")
    val toks = col(tmp)
    val stop = typedLit(Seq("the", "a", "of", "and", "to", "in", "is"))
    df.withColumn(tmp, tokens(t))
      .withColumn("n_chars_q", length(t))
      .withColumn("n_tokens_q", size(toks))
      .withColumn(
        "mean_token_len",
        // sum of token lengths == length of the empty-sep join — same
        // exact integer, but array_join is codegen'd where the
        // aggregate(...) lambda it replaces was interpreted per element
        when(size(toks) > 0,
          length(array_join(toks, "")).cast("double") / size(toks))
          .otherwise(lit(0.0)))
      .withColumn(
        "punct_ratio",
        when(length(t) > 0,
          (length(t) - length(regexp_replace(t, "\\p{Punct}", ""))).cast("double") / length(t))
          .otherwise(lit(0.0)))
      .withColumn(
        "stopword_ratio",
        when(size(toks) > 0,
          size(filter(toks, x => array_contains(stop, lower(x)))).cast("double") / size(toks))
          .otherwise(lit(0.0)))
      .drop(tmp)
  }

  /** Language-ID heuristic: score each candidate language by its stopword
    * hit count over the document's tokens; argmax wins, ties broken by
    * profile order. Pure array expressions — no UDF, no shuffle.
    */
  val langProfiles: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "and", "of", "to", "a", "in", "is", "it", "you", "that"),
    "de" -> Seq("der", "die", "das", "und", "ist", "nicht", "ein", "ich", "mit", "zu"),
    "fr" -> Seq("le", "la", "les", "et", "est", "pas", "un", "une", "je", "que"),
    "es" -> Seq("el", "la", "los", "las", "es", "no", "un", "una", "yo", "que"),
    "zh" -> Seq("的", "了", "是", "我", "不", "在", "有", "他", "这", "就"),
  )

  /** Per-profile hit counts over an already-computed distinct-token array:
    * array_intersect is a codegen'd intrinsic — no interpreted
    * higher-order lambdas in the per-document hot path. The single source
    * of the scoring expression for both [[langIdScores]] and
    * [[langIdFromTokens]]. */
  private def scoresFromTokens(toks: Column): Seq[(String, Column)] =
    langProfiles.map { case (lang, words) =>
      lang -> size(array_intersect(toks, typedLit(words)))
    }

  def langIdScores(text: Column): Seq[(String, Column)] =
    scoresFromTokens(array_distinct(tokens(lower(text))))

  /** Argmax + CJK-override verdict over an ALREADY-COMPUTED distinct-token
    * array (see [[withLangId]] for why the tokens are materialized
    * separately). */
  private def langIdFromTokens(text: Column, toks: Column): Column = {
    val scores = scoresFromTokens(toks)
    // argmax via greatest() over (score, -profileOrder, lang) structs:
    // field-by-field comparison gives highest score, ties to the earliest
    // profile — all codegen'd, no fold
    val structs = scores.zipWithIndex.map { case ((lang, s), i) =>
      struct(s.as("score"), lit(-i).as("negOrd"), lit(lang).as("lang"))
    }
    val best = greatest(structs: _*)
    // CJK text is unsegmented: whitespace tokens never intersect the
    // single-character zh profile, so detect it by script — ≥25% CJK
    // codepoints wins before the stopword vote. Codegen'd single-pass
    // counter; the regexp_replace it replaced was a per-row CPU tax.
    val cjkChars = graft.functions.GraftFunctions.cjk_codepoint_count(text)
    when(length(text) > 0 && cjkChars * 4 >= length(text), lit("zh"))
      .when(best.getField("score") > 0, best.getField("lang"))
      .otherwise(lit("und"))
  }

  def langId(text: Column): Column =
    langIdFromTokens(text, array_distinct(tokens(lower(text))))

  /** The scale path for language-ID: tokenize ONCE into a hidden column in
    * a lower projection, then score. The Column-level [[langId]] embeds the
    * token-array subtree in every profile intersect, and because the final
    * `when` chain makes those branches conditional they are excluded from
    * whole-stage-codegen subexpression elimination — the tokenizer (the
    * dominant cost) runs once per profile, a ~5× per-row tax. Catalyst's
    * CollapseProject keeps the two projections separate (it refuses to
    * duplicate non-trivial expressions referenced more than once), so the
    * array really is computed once per row. */
  def withLangId(df: DataFrame, textCol: String, out: String = "lang_pred"): DataFrame = {
    val t = col(textCol)
    val tmp = "__langid_toks"
    require(!df.columns.contains(tmp),
      s"input already has a column named $tmp — rename it before withLangId")
    df.withColumn(tmp, array_distinct(tokens(lower(t))))
      .withColumn(out, langIdFromTokens(t, col(tmp)))
      .drop(tmp)
  }

  /** Corpus quality filter: the standard pre-training gate composed from
    * the signals above. Returns the input plus (quality_ok, drop_reason) —
    * callers either filter or audit the drops. Thresholds follow common
    * published heuristics (length window, mean token length window,
    * symbol/punct ceiling). */
  def qualityFilter(
      df: DataFrame, textCol: String,
      minChars: Int = 50, maxChars: Int = 100000,
      minMeanTokenLen: Double = 2.0, maxMeanTokenLen: Double = 12.0,
      maxPunctRatio: Double = 0.3): DataFrame = {
    val stats = qualityStats(df, textCol)
    stats
      .withColumn(
        "drop_reason",
        when(col("n_chars_q") < minChars, "too_short")
          .when(col("n_chars_q") > maxChars, "too_long")
          .when(col("mean_token_len") < minMeanTokenLen, "tokens_too_short")
          .when(col("mean_token_len") > maxMeanTokenLen, "tokens_too_long")
          .when(col("punct_ratio") > maxPunctRatio, "too_much_punct")
          .otherwise(lit(null).cast("string")))
      .withColumn("quality_ok", col("drop_reason").isNull)
  }

  /** Gopher-style n-gram repetition signals (Rae et al. 2021, app. A1.1:
    * "fraction of characters in the most frequent n-gram" family, counted
    * over gram occurrences): per document, the total/most-frequent/distinct
    * w-gram counts and the two derived fractions —
    * `top_frac` (repetition: how much of the document is its single most
    * frequent gram) and `distinct_frac` (diversity: type/token ratio).
    * `n = 1` measures word repetition, `n = 2..4` phrase repetition.
    *
    * Distributed shape, not a per-row mode: grams explode into rows and
    * aggregate twice — (id, gram) counts shuffle once with map-side
    * partial aggregation, then roll up per id. Linear in corpus size,
    * skew-free (gram cardinality per doc is bounded by doc length); a
    * per-row array-mode expression would be O(tokens log tokens) per row
    * interpreted, and this is the plan that scales to 100 TB.
    *
    * Documents with fewer than `n` tokens produce no grams and are absent
    * from the output (exactly the rows a repetition gate cannot judge).
    * Fractions are one IEEE division of exact ints → oracle-checkable. */
  def ngramRepetitionStats(
      df: DataFrame, idCol: String, textCol: String, n: Int): DataFrame = {
    require(n >= 1, s"n-gram width must be >= 1, got $n")
    val grams = df.select(
      col(idCol), explode(graft.operators.Shingles.all(col(textCol), n)).as("gram"))
    grams.groupBy(idCol, "gram").agg(count(lit(1)).as("cnt"))
      .groupBy(idCol)
      .agg(
        sum("cnt").as("n_grams"),
        max("cnt").as("top_cnt"),
        count(lit(1)).as("n_distinct"))
      .select(
        col(idCol), col("n_grams"),
        (col("top_cnt").cast("double") / col("n_grams")).as("top_frac"),
        (col("n_distinct").cast("double") / col("n_grams")).as("distinct_frac"))
  }

  /** Document fingerprint: hash of the sorted distinct lower-cased token
    * set (an order-insensitive content signature). `md5` variant is
    * oracle-checkable; `xxhash64` variant is the cheap scale path. */
  def fingerprintMd5(text: Column): Column =
    md5(concat_ws(" ", array_sort(array_distinct(split(lower(text), " ")))))

  def fingerprintXx(text: Column): Column =
    xxhash64(concat_ws(" ", array_sort(array_distinct(split(lower(text), " ")))))

  /** Rolling-hash document fingerprints by winnowing (Schleimer/
    * Wilkerson/Aiken, "Winnowing: Local Algorithms for Document
    * Fingerprinting", SIGMOD 2003 — the MOSS algorithm): hash every
    * k-gram OCCURRENCE in document order, slide a w-window over the hash
    * sequence, keep each window's minimum, emit the distinct minima as
    * the document's fingerprint set. Guarantee: any match of at least
    * w + k − 1 consecutive tokens between two documents shares at least
    * one fingerprint, at ~2/(w+1) the storage of the full gram-hash set —
    * the partial-overlap detector whole-document hashes (t5) cannot be.
    * Because the output is the distinct value SET, robust winnowing's
    * rightmost-minimum tie rule cannot change it. All array ops are
    * executor-side higher-order functions over the codegen'd
    * [[Shingles.all]] kernel; the hash is the md5-parity family (d5/d6
    * technique) so the whole operator is DuckDB-oracle-checkable. Docs
    * with fewer than k + w − 1 tokens emit no rows.
    *
    * Computed by the single-pass [[Shingles.winnow]] codegen kernel —
    * the composed higher-order formula it replaced (transform(md5) →
    * transform(sequence) → array_min(slice)) was three interpreted
    * lambda dispatches per row and dominated the t15/t24 pipelines;
    * kernel-vs-formula parity is asserted in FunctionsSpec. */
  def winnowFingerprints(
      df: DataFrame, idCol: String, textCol: String,
      k: Int = 3, w: Int = 4): DataFrame =
    df
      .select(col(idCol), Shingles.winnow(col(textCol), k, w).as("fps"))
      .filter(size(col("fps")) > 0)
      .select(col(idCol), explode(col("fps")).as("fp"))

  /** Partial-overlap candidate pairs via winnowing fingerprints — the
    * MOSS detector's second half: documents sharing ≥ `minShared`
    * fingerprints contain (with the winnowing guarantee) runs of at
    * least w + k − 1 identical consecutive tokens, i.e. copied passages
    * that whole-document similarity misses. Same inverted-index shape as
    * the token-overlap join, with the same quadratic-blowup guard: a
    * fingerprint appearing in more than `maxDf` documents (boilerplate)
    * is dropped BEFORE the self-join via a broadcast anti-join — it
    * carries no plagiarism signal and would contribute O(df²) pairs.
    *
    * Returns a PERSISTED frame (caller-owned, the chunkDedup contract):
    * unpersist it when done, or use [[withWinnowOverlapPairs]] for a
    * structural release. */
  def winnowOverlapPairs(
      df: DataFrame, idCol: String, textCol: String,
      k: Int = 3, w: Int = 4, minShared: Long = 2L,
      maxDf: Long = 1000L): DataFrame = {
    // persisted: the fingerprint explode (the dominant per-row cost) is
    // consumed three times — the DF census and BOTH self-join sides.
    // Released before returning; the result arrives materialized+persisted
    // (caller-owned), the chunkDedup contract.
    val fps = winnowFingerprints(df, idCol, textCol, k, w)
      .select(col(idCol).as("id"), col("fp"))
      .persist()
    val hot = fps.groupBy("fp").agg(count(lit(1)).as("df"))
      .filter(col("df") > maxDf)
      .select("fp")
    val posting = fps.join(broadcast(hot), Seq("fp"), "left_anti")
    val a = posting.select(col("id").as("d1"), col("fp"))
    val b = posting.select(col("id").as("d2"), col("fp"))
    val out = a.join(b, Seq("fp"))
      .filter(col("d1") < col("d2"))
      .groupBy("d1", "d2")
      .agg(count(lit(1)).as("shared_fps"))
      .filter(col("shared_fps") >= minShared)
    out.persist()
    out.count()
    fps.unpersist(blocking = false)
    out
  }

  /** Loan-pattern wrapper for [[winnowOverlapPairs]]: the pair frame is
    * caller-owned persisted (the chunkDedup contract), and a long-lived
    * driver that forgets the release accumulates cached blocks until LRU
    * eviction. This makes the release structural — use the frame inside
    * `f`, never let it escape. */
  def withWinnowOverlapPairs[T](
      df: DataFrame, idCol: String, textCol: String,
      k: Int = 3, w: Int = 4, minShared: Long = 2L,
      maxDf: Long = 1000L)(f: DataFrame => T): T = {
    val pairs = winnowOverlapPairs(df, idCol, textCol, k, w, minShared, maxDf)
    try f(pairs) finally pairs.unpersist(blocking = false)
  }

  /** Corpus TF-IDF top-`k` terms per document — the keyword-extraction /
    * doc-representation primitive, with the exact-arithmetic core that
    * makes it oracle-checkable: `tf` (term occurrences in the doc) and
    * `df` (documents containing the term) are exact integers, and the
    * rarity weighting is the reciprocal `tf/df` (ONE IEEE division —
    * monotone in df exactly like the classical `tf·log(N/df)`, without
    * the cross-engine libm hazard). Ranking ties break on the term
    * string.
    *
    * Output: `(idCol, term, tf, df, score, rnk)`, `rnk ≤ k`.
    *
    * 100 TB shape: one shuffle on (doc, term) for tf, one on term for the
    * df dimension (vocabulary-sized — Catalyst broadcasts it when stats
    * allow), one on the doc id for the per-doc rank window; no
    * corpus-sized window (partitionBy is the doc id, never a constant). */
  def tfidfTopTerms(
      df: DataFrame, idCol: String, textCol: String, k: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val tf = df
      .select(col(idCol), explode(tokens(col(textCol))).as("term"))
      .groupBy(col(idCol), col("term"))
      .agg(count(lit(1)).as("tf"))
    val dfreq = tf.groupBy("term").agg(count(lit(1)).as("df"))
    val w = Window.partitionBy(col(idCol))
      .orderBy(col("score").desc, col("term").asc)
    tf.join(dfreq, "term")
      .withColumn("score", col("tf").cast("double") / col("df"))
      .withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= k)
      .select(col(idCol), col("term"), col("tf"), col("df"), col("score"), col("rnk"))
  }

  /** BM25 ranked retrieval (Robertson & Spärck Jones; the Lucene-default
    * scoring) for a FIXED small query-term set — the corpus-search
    * primitive behind targeted-subset mining ("find the docs about X to
    * upsample") and retrieval-based decontamination.
    *
    * Scale shape is the whole point: the query terms are a handful, so
    * per-term TF becomes k SCAN-SIDE columns (`size(filter(tokens, =t))`)
    * — the corpus is never exploded and never shuffled. The global stats
    * (N, avg length, per-term document frequencies) reduce to ONE row of
    * k+2 numbers (map-side partial agg), broadcast back as a 1-row cross
    * join, and the only ordering work is the final top-k (TakeOrdered,
    * no full sort). idf = ln(1 + (N−df+0.5)/(df+0.5)) — the Lucene
    * non-negative form.
    *
    * Output is RANK-ONLY (rnk, id) plus the integer tf vector: scores
    * are IEEE doubles whose last ulp may differ across engines, ranks do
    * not (the s1 convention); ties break by id. */
  def bm25TopK(
      df: DataFrame, idCol: String, textCol: String,
      queryTerms: Seq[String], k: Int,
      k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    val scored = bm25Scored(df, idCol, textCol, queryTerms, k, k1, b)
    // rank assigned driver-side over the already-reduced k rows (no
    // single-partition window); the id is read GENERICALLY and its
    // original field type is preserved in the output schema — a caller
    // with int/string ids must not hit a collect-time ClassCastException
    val sel = scored.select(
      (col(idCol) +: queryTerms.indices.map(i => col(s"__tf_$i"))): _*)
    val top = sel.collect()
    val outSchema = org.apache.spark.sql.types.StructType(
      org.apache.spark.sql.types.StructField("rnk",
        org.apache.spark.sql.types.LongType, nullable = false) +:
        sel.schema.fields.head +:
        queryTerms.indices.map(i => org.apache.spark.sql.types.StructField(
          s"tf_$i", org.apache.spark.sql.types.LongType, nullable = false)))
    val rows: java.util.List[org.apache.spark.sql.Row] =
      java.util.Arrays.asList(top.zipWithIndex.map { case (r, i) =>
        org.apache.spark.sql.Row.fromSeq(
          (i + 1).toLong +: r.get(0) +:
            queryTerms.indices.map(j => r.getInt(j + 1).toLong))
      }: _*)
    df.sparkSession.createDataFrame(rows, outSchema)
  }

  /** The distributed subtree of [[bm25TopK]] — everything up to and
    * including the TakeOrdered top-k, before ranks are stamped driver
    * side (exposed so the plan shape is testable: scan-side TFs, one
    * broadcast stats row, no explode, no window). */
  private[graft] def bm25Scored(
      df: DataFrame, idCol: String, textCol: String,
      queryTerms: Seq[String], k: Int,
      k1: Double, b: Double): DataFrame = {
    require(queryTerms.nonEmpty && queryTerms.size <= 32,
      s"bm25TopK wants a small fixed term set, got ${queryTerms.size}")
    val toks = tokens(col(textCol))
    def tfCol(t: String) = s"__tf_${queryTerms.indexOf(t)}"
    val perDoc = df.select(
      (col(idCol) +: size(toks).cast("double").as("__len") +:
        queryTerms.map(t =>
          size(filter(toks, x => x === lit(t))).as(tfCol(t)))): _*)
      // docs matching no term can't score — drop them BEFORE the agg join
      .filter(queryTerms.map(t => col(tfCol(t)) > 0).reduce(_ || _))
    val stats = df.select(
      (lit(1L).as("__one") +: size(tokens(col(textCol))).cast("double").as("__l") +:
        queryTerms.map(t =>
          when(array_contains(tokens(col(textCol)), t), 1L).otherwise(0L)
            .as(s"__has_${queryTerms.indexOf(t)}"))): _*)
      .agg(sum("__one").as("n"),
        (avg("__l").as("avglen") +:
          queryTerms.indices.map(i => sum(s"__has_$i").as(s"df_$i"))): _*)
    perDoc.crossJoin(broadcast(stats))
      .withColumn("score",
        queryTerms.indices.map { i =>
          val tf = col(tfCol(queryTerms(i))).cast("double")
          val idf = log(lit(1.0) +
            (col("n").cast("double") - col(s"df_$i") + 0.5) / (col(s"df_$i") + 0.5))
          idf * tf * (k1 + 1.0) /
            (tf + lit(k1) * (lit(1.0 - b) + lit(b) * col("__len") / col("avglen")))
        }.reduce(_ + _))
      .orderBy(col("score").desc, col(idCol).asc)
      .limit(k)
  }

  /** Multi-pattern BLOCKLIST statistics — the NSFW/spam/boilerplate
    * token filter every crawl-curation pipeline runs first. Exact
    * whole-token matches against a fixed list (substring matching flags
    * "class" for "ass"; token matching is the defensible default):
    * per-doc hit count for each blocked token plus the total, all
    * scan-side `size(filter(tokens, =t))` — no explode, no shuffle, no
    * UDF; at 100 TB this is a free rider on whatever scan reads the
    * text. `flagged` = total > maxHits (0 ⇒ any hit flags). */
  def blocklistStats(
      df: DataFrame, idCol: String, textCol: String,
      blocked: Seq[String], maxHits: Int = 0): DataFrame = {
    require(blocked.nonEmpty && blocked.size <= 64,
      s"blocklistStats wants a bounded list, got ${blocked.size}")
    val toks = tokens(col(textCol))
    val hitCols = blocked.indices.map(i =>
      size(filter(toks, x => x === lit(blocked(i)))).cast("long").as(s"hits_$i"))
    df.select((col(idCol) +: hitCols): _*)
      .withColumn("total_hits",
        blocked.indices.map(i => col(s"hits_$i")).reduce(_ + _))
      .withColumn("flagged", col("total_hits") > maxHits)
  }

  /** Multi-pattern SUBSTRING blocklist via Aho–Corasick
    * ([[MultiMatch]]) — the phrase-level complement to
    * [[blocklistStats]]'s whole-token matches: blocked PHRASES
    * ("click here to", "lorem ipsum") and intra-word fragments need
    * substring semantics, and the naive k×`contains` plan is O(n·k)
    * per row with no occurrence counts. One automaton pass per row
    * counts every occurrence of every pattern (overlaps and duplicate
    * patterns included); pure scan-side, no explode, no shuffle —
    * at 100 TB a free rider on the text scan whatever the blocklist
    * size. Matching is case-sensitive on the lowered text (patterns
    * are lowered to match). */
  def substringBlocklistHits(
      df: DataFrame, idCol: String, textCol: String,
      patterns: Seq[String], maxHits: Long = 0L): DataFrame =
    df.select(col(idCol),
        MultiMatch.countMatches(lower(col(textCol)),
          patterns.map(_.toLowerCase)).as("n_hits"))
      .withColumn("flagged", col("n_hits") > maxHits)

  /** Consecutive duplicate-token RUN removal — the span-level sibling of
    * document-level repetition filtering (Gopher-style curation rewrites
    * "the the the" to "the" instead of dropping the doc). Keep token i
    * iff i == 0 or it differs from token i−1: one index-aware `filter`
    * over the token array, so the op is PURE SCAN-SIDE — no explode, no
    * window, no shuffle; at 100 TB it rides the scan like the quality
    * stats do. Returns the rewritten text + how many tokens the runs
    * lost (the audit column). */
  def dedupTokenRuns(
      df: DataFrame, idCol: String, textCol: String,
      outCol: String = "text_dedup"): DataFrame = {
    // materialize the token array into a projected column FIRST: a lambda
    // that captures the raw tokens() expression would re-run the regex
    // strip + split on every element_at probe — O(n²·regex) per doc,
    // measured 10× the whole kernel at 1M docs. Over an attribute the
    // probe is an array index.
    val kept = filter(col("__toks"),
      // filter's index is 0-based, element_at is 1-based: element_at(t, i)
      // IS the previous element of position i
      (x, i) => i === 0 || x =!= element_at(col("__toks"), i))
    df.withColumn("__toks", tokens(col(textCol)))
      .withColumn("__kept", kept)
      .withColumn(outCol, array_join(col("__kept"), " "))
      .withColumn("n_removed",
        (size(col("__toks")) - size(col("__kept"))).cast("long"))
      .drop("__toks", "__kept")
  }

  /** Pointwise mutual information for adjacent token pairs — the
    * collocation detector ("new york", "machine learning") behind
    * phrase-aware tokenization and compound-term mining. PMI =
    * log(p(ab) / (p(a)·p(b))) ranks the same as the EXACT rational
    * `n_ab·N_tok² / (N_pair·n_a·n_b)`, so no log is taken: num and den
    * are exact BIGProducts and the one IEEE division is engine-identical
    * (the t46 exactness convention). Composes [[graft.operators.BpeTrain
    * .pairCounts]] (scan-side zip + one count agg) with unigram counts;
    * the unigram table is vocabulary-sized, so its joins broadcast. Top
    * `k` pairs with `n_pair ≥ minCount` by ratio, ties by pair. */
  def pmiPairs(
      df: DataFrame, textCol: String, minCount: Long, k: Int): DataFrame = {
    // the SAME tokenization pairCounts uses (single-space split, empties
    // dropped) — a \s+ variant would disagree on counts
    val toksArr = filter(split(col(textCol), " "), t => t =!= "")
    val pairsAll = graft.operators.BpeTrain.pairCounts(df, textCol)
    val uni = df.select(explode(toksArr).as("tok"))
      .groupBy("tok").agg(count(lit(1)).as("n_tok"))
    val nt = uni.agg(sum("n_tok").as("nt"))
    val np = pairsAll.agg(sum("n").as("np"))
    // Exactness bound: n·nt² wraps BIGINT silently (non-ANSI) once the
    // corpus token total nt reaches ~2-3M for frequent pairs. Products
    // are computed in Decimal(38,0) (exact to ~1e38, i.e. nt ~1e12) and
    // asserted to fit the BIGINT output contract — the
    // chiSquaredShiftFromCounts guard pattern: the assert rides the
    // value itself so column pruning can't drop it.
    val dec = org.apache.spark.sql.types.DecimalType(38, 0)
    val num = col("n").cast(dec) * col("nt").cast(dec) * col("nt").cast(dec)
    val den = col("np").cast(dec) * col("n_left").cast(dec) * col("n_right").cast(dec)
    def asLong(c: Column, name: String): Column =
      (c + coalesce(
        assert_true(c <= lit(Long.MaxValue).cast(dec), lit(
          s"pmi_pairs: $name exceeds BIGINT — corpus token total too " +
            "large for exact integer PMI output; shard or subsample")),
        lit(0))).cast("long")
    pairsAll.filter(col("n") >= minCount)
      .join(uni.select(col("tok").as("left"), col("n_tok").as("n_left")), "left")
      .join(uni.select(col("tok").as("right"), col("n_tok").as("n_right")), "right")
      .crossJoin(broadcast(nt)).crossJoin(broadcast(np))
      .select(col("left"), col("right"), col("n").as("n_pair"),
        col("n_left"), col("n_right"),
        asLong(num, "pmi_num").as("pmi_num"),
        asLong(den, "pmi_den").as("pmi_den"))
      .withColumn("pmi_ratio",
        col("pmi_num").cast("double") / col("pmi_den").cast("double"))
      .orderBy(col("pmi_ratio").desc, col("left").asc, col("right").asc)
      .limit(k)
  }

  /** First `http(s)` URL host in free text — the C4-curation key (URL
    * blocklists, per-domain caps, domain mixing weights all key on it).
    * Lookaround-free character-class regex, so the identical pattern
    * runs under Java regex and RE2 (the t38 convention); no match → ''
    * (regexp_extract's convention), surfaced as NULL by [[domainStats]]. */
  def urlHost(text: Column): Column =
    lower(regexp_extract(text, "https?://([A-Za-z0-9.-]+)", 1))

  /** Registrable domain of a host — the LAST TWO dot-labels ("a.b.c.com"
    * → "c.com"), the per-site aggregation key. Public-suffix lists
    * ("co.uk") are a lookup-table refinement on top of the same shape. */
  def registrableDomain(host: Column): Column =
    regexp_extract(host, "([A-Za-z0-9-]+\\.[A-Za-z0-9-]+)$", 1)

  /** Per-domain corpus statistics: docs and distinct hosts per
    * registrable domain — what per-domain caps, domain mixing weights,
    * and blocklist audits aggregate first. Scan-side regex extraction +
    * one map-side-combined aggregation over domain cardinality (tiny vs
    * the corpus); rows with no URL drop (no-domain docs are a different
    * audit). */
  def domainStats(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val host = urlHost(col(textCol))
    df.select(col(idCol), host.as("host"))
      .filter(col("host") =!= "")
      .withColumn("domain", registrableDomain(col("host")))
      .groupBy("domain")
      .agg(count(lit(1)).as("n_docs"),
        countDistinct("host").as("n_hosts"))
  }

  /** HTML boilerplate strip — the web-extraction pass crawl corpora run
    * before any text statistic (tags and scripts otherwise dominate
    * token counts, dedup shingles, and quality gates): script/style
    * blocks drop whole, remaining tags become spaces (word boundaries
    * survive `</p><p>`), the six ubiquitous entities decode (innermost
    * first, `&amp;` LAST — the single-pass order that leaves `&amp;lt;`
    * as the literal `&lt;` its author wrote), and whitespace runs
    * collapse. A composition of codegen'd `regexp_replace`/`replace`
    * built-ins — scan-side, no UDF, no parser state; every regex is
    * lookaround-free so the identical patterns run under Java regex and
    * RE2 (the whitespace class is spelled out, the t38 convention). */
  def stripHtml(c: Column): Column = {
    val noScript = regexp_replace(c,
      "(?is)<(script|style)[^>]*>.*?</(script|style)>", " ")
    val noTags = regexp_replace(noScript, "(?s)<[^>]*>", " ")
    val decoded = Seq(
      "&lt;" -> "<", "&gt;" -> ">", "&quot;" -> "\"",
      "&#39;" -> "'", "&nbsp;" -> " ", "&amp;" -> "&")
      .foldLeft(noTags) { case (acc, (e, v)) => replace(acc, lit(e), lit(v)) }
    trim(regexp_replace(decoded, "[ \\t\\n\\x0B\\f\\r]+", " "))
  }
}
