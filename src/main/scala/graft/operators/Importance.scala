package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Data Selection via Importance Resampling (the DSIR shape, Xie et al.
  * 2023): score every document in a raw corpus by how much its hashed
  * n-gram feature profile looks like a small high-quality TARGET corpus
  * (vs the raw corpus itself), then sample/filter by that weight. The
  * canonical pretraining-data recipe for "give me Wikipedia-like pages
  * out of Common Crawl" — upstream of quality classifiers, because it
  * needs no labels, only the target sample.
  *
  * Design (100 TB shape): features are HASHED into a fixed bucket space
  * (`buckets`, default 4096), so both distribution tables are bounded at
  * `buckets` rows regardless of corpus size — they broadcast. Scoring is
  * then scan-side: tokenize → bucket → per-doc bucket counts (one
  * shuffle, keyed by doc id, map-side combined) → broadcast-join the
  * ratio table → one ordered fold per doc. Per-doc state is bounded by
  * `buckets`. No driver-side row data; the only actions are the two
  * scalar token totals.
  *
  * Arithmetic is oracle-exact by construction:
  *  - bucketing is the first 8 hex chars of md5(feature) read as an
  *    integer, mod `buckets` — both engines agree bit-for-bit;
  *  - smoothed probabilities use ONE division each,
  *    `p = (cnt+1) / (total+buckets)`, and the per-bucket importance
  *    ratio is one more division `p_target / p_raw` — three IEEE ops in
  *    a fixed order, no libm;
  *  - the per-document weight folds `tf_b * ratio_b` left-to-right in
  *    bucket order (`aggregate(array_sort(collect_list(...)))` ≡ DuckDB
  *    `list_reduce(list(... ORDER BY bucket))`).
  * The classical DSIR weight is the LOG-likelihood ratio sum; `log` is a
  * cross-engine libm hazard (Java Math.log and DuckDB's libm disagree in
  * the last ulp), so the weight here is the linearized form
  * Σ_b tf_b · (p_t(b)/p_s(b)) — same "which features pull toward the
  * target" signal, exactly reproducible in any engine. Callers wanting
  * the log form for resampling temperature can post-hoc `log` the
  * per-bucket ratios; the bucket counts exposed by [[bucketCounts]] are
  * the sufficient statistic either way.
  */
object Importance {

  /** Stable feature bucket: first 8 hex chars of md5 as an integer, mod
    * `buckets`. Positive (8 hex chars < 2^32 < Long.Max) and identical
    * across engines — the md5-family convention every d/s-series oracle
    * already rides. */
  def featureBucket(feature: Column, buckets: Int): Column =
    conv(substring(md5(feature), 1, 8), 16, 10).cast("long") % buckets

  /** Per-bucket token counts of a corpus: (bucket, cnt) with every one of
    * the `buckets` rows present (zero-count buckets included, so the
    * +1-smoothing downstream is total-preserving). Unigram features. */
  def bucketCounts(
      df: DataFrame, textCol: String, buckets: Int): DataFrame = {
    val s = df.sparkSession
    val counts = df
      .select(explode(TextAnalysis.tokens(col(textCol))).as("token"))
      .select(featureBucket(col("token"), buckets).as("bucket"))
      .groupBy("bucket").agg(count(lit(1)).as("cnt"))
    s.range(buckets).select(col("id").as("bucket"))
      .join(counts, Seq("bucket"), "left")
      .select(col("bucket"), coalesce(col("cnt"), lit(0L)).as("cnt"))
  }

  /** Merge bucket-count tables — the incremental-corpus path: when a new
    * crawl shard lands, count ITS tokens alone and fold into the at-rest
    * table instead of recounting the world. Counts are exact integers,
    * so merge ≡ recount (spec-asserted), and the result is again exactly
    * `buckets` rows. */
  def mergeBucketCounts(at_rest: DataFrame, delta: DataFrame): DataFrame =
    at_rest.union(delta)
      .groupBy("bucket").agg(sum("cnt").as("cnt"))

  /** The broadcastable per-bucket importance-ratio table:
    * (bucket, ratio) where
    * `ratio = ((t_b+1)/(T+B)) / ((s_b+1)/(S+B))`, each division one IEEE
    * op. `target` is the small exemplar corpus, `raw` the corpus being
    * scored. Exactly `buckets` rows. */
  def ratioTable(
      target: DataFrame, raw: DataFrame, textCol: String,
      buckets: Int): DataFrame = {
    val t = bucketCounts(target, textCol, buckets)
      .select(col("bucket"), col("cnt").as("t_cnt"))
    val sDf = bucketCounts(raw, textCol, buckets)
      .select(col("bucket"), col("cnt").as("s_cnt"))
    ratioFromCounts(t, sDf, buckets)
  }

  /** Smoothed ratio table from precomputed (bucket, t_cnt) / (bucket,
    * s_cnt) frames. r17: the totals ride a whole-frame WINDOW over the
    * B-row joined table instead of two `agg().head()` driver actions —
    * the old form was 2 extra actions per call and, worse, EXECUTED each
    * count subtree twice (once for its total, once in the join), so
    * `dsirWeights` paid 3 corpus scans and 2 target scans for a
    * 2-scan-plus-broadcast computation. The window's single partition
    * holds exactly `buckets` rows (≤ 4096 by practice) — never corpus
    * data. Arithmetic is bit-identical: totals are exact longs either
    * way, cast to double at the same point in the same expression. */
  private def ratioFromCounts(
      t: DataFrame, sDf: DataFrame, buckets: Int): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy().rowsBetween(Long.MinValue, Long.MaxValue)
    t.join(sDf, Seq("bucket"))
      .select(col("bucket"), col("t_cnt"), col("s_cnt"),
        (sum("t_cnt").over(w) + lit(buckets.toLong)).cast("double").as("__totT"),
        (sum("s_cnt").over(w) + lit(buckets.toLong)).cast("double").as("__totS"))
      .select(col("bucket"),
        (((col("t_cnt") + lit(1L)).cast("double") / col("__totT")) /
          ((col("s_cnt") + lit(1L)).cast("double") / col("__totS")))
          .as("ratio"))
  }

  /** Score `raw` against a PRECOMPUTED ratio table — the production
    * apply path: at 100 TB the ratio table is trained once (or merged
    * incrementally via [[mergeBucketCounts]]) and every new shard is
    * scored with this ONE corpus scan; only [[dsirWeights]]'s
    * train-and-score convenience pays the extra distribution pass.
    * Output: (id, n_tokens, weight). */
  def applyWeights(
      raw: DataFrame, ratios: DataFrame, idCol: String, textCol: String,
      buckets: Int): DataFrame =
    scoreTf(docBucketTf(raw, idCol, textCol, buckets), ratios, idCol)

  /** Per-doc per-bucket term frequencies — the one corpus-sized pass
    * behind [[applyWeights]]/[[dsirWeights]]. */
  private def docBucketTf(
      raw: DataFrame, idCol: String, textCol: String,
      buckets: Int): DataFrame =
    raw
      .select(col(idCol), explode(TextAnalysis.tokens(col(textCol))).as("token"))
      .select(col(idCol), featureBucket(col("token"), buckets).as("bucket"))
      .groupBy(idCol, "bucket").agg(count(lit(1)).as("tf"))

  /** Score a precomputed tf frame against a ratio table (the second,
    * bucket-joined half of [[applyWeights]]). */
  private def scoreTf(
      tf: DataFrame, ratios: DataFrame, idCol: String): DataFrame =
    tf.join(broadcast(ratios), Seq("bucket"))
      .select(col(idCol), col("tf"),
        (col("tf").cast("double") * col("ratio")).as("term"),
        col("bucket"))
      .groupBy(idCol)
      .agg(
        sum("tf").as("n_tokens"),
        aggregate(
          array_sort(collect_list(struct(col("bucket"), col("term")))),
          lit(0.0),
          (acc: Column, x: Column) => acc + x.getField("term"))
          .as("weight"))

  /** DSIR importance weight per document of `raw` against `target`:
    * (id, n_tokens, weight) with `weight = Σ_b tf_b · ratio_b` folded in
    * bucket order — [[ratioTable]] + [[applyWeights]] composed. The
    * ratio table broadcasts; the corpus shuffles ONCE (per-doc bucket
    * counts, map-side combined).
    *
    * r17: the corpus is also SCANNED once — the raw-side bucket counts
    * the ratio table needs are derived from the SAME per-doc tf frame
    * that scores the documents (`s_cnt_b = Σ_id tf(id, b)`, exact
    * integers both ways), so the plan's two consumers share one
    * (id, bucket) exchange (ReusedExchange) instead of tokenizing and
    * exploding the whole corpus a second time; the old form scanned the
    * corpus 3× and the target 2× (the eager totals in ratioTable
    * re-executed every count subtree). Only `target` is tokenized
    * separately — it is the small exemplar corpus by contract. */
  def dsirWeights(
      raw: DataFrame, target: DataFrame, idCol: String, textCol: String,
      buckets: Int = 4096): DataFrame = {
    val s = raw.sparkSession
    val tf = docBucketTf(raw, idCol, textCol, buckets)
    val sCounts = s.range(buckets).select(col("id").as("bucket"))
      .join(tf.groupBy("bucket").agg(sum("tf").as("__s")), Seq("bucket"), "left")
      .select(col("bucket"), coalesce(col("__s"), lit(0L)).as("s_cnt"))
    val t = bucketCounts(target, textCol, buckets)
      .select(col("bucket"), col("cnt").as("t_cnt"))
    scoreTf(tf, ratioFromCounts(t, sCounts, buckets), idCol)
  }

  /** Top-fraction selection by importance weight — the "resampling" step
    * as a filter: keep the `keepFraction` highest-weighted documents
    * (deterministic id tie-break). Selection rides
    * [[Sampling.tokenBudgetSelect]]'s distributed prefix sum with unit
    * cost — a range exchange over two narrow columns plus per-partition
    * offsets, never a global sort-and-limit funnel into one partition. */
  def dsirSelect(
      raw: DataFrame, target: DataFrame, idCol: String, textCol: String,
      keepFraction: Double, buckets: Int = 4096): DataFrame =
    selectTopFraction(raw,
      dsirWeights(raw, target, idCol, textCol, buckets), idCol, keepFraction)

  /** [[dsirSelect]] against a precomputed ratio table — the sharded
    * production form: ONE corpus scan for the weights, then the
    * prefix-sum cut. */
  def dsirSelectWithRatios(
      raw: DataFrame, ratios: DataFrame, idCol: String, textCol: String,
      keepFraction: Double, buckets: Int = 4096): DataFrame =
    selectTopFraction(raw,
      applyWeights(raw, ratios, idCol, textCol, buckets), idCol, keepFraction)

  private def selectTopFraction(
      raw: DataFrame, w: DataFrame, idCol: String,
      keepFraction: Double): DataFrame = {
    require(keepFraction > 0 && keepFraction <= 1, "keepFraction in (0,1]")
    val total = w.count()
    val keep = math.max(1L, math.floor(total * keepFraction).toLong)
    // pin only the survivor ID LIST (one narrow column, disk-spillable)
    // across the loan release — the returned semi-join then recomputes
    // nothing and the corpus itself is never materialized here
    val ids = Sampling.withTokenBudgetSelect(
      w.select(col(idCol), lit(1L).as("__cost"), col("weight")),
      idCol, "__cost", "weight", keep) { sel =>
      sel.select(col(idCol)).localCheckpoint(eager = true)
    }
    raw.join(ids, Seq(idCol), "left_semi")
  }

  /** Distribution-SHIFT detector between two corpora — the per-bucket
    * symmetric chi-squared decomposition over the same hashed-unigram
    * space as DSIR: with +1-smoothed counts a_b, b_b and totals Na, Nb,
    * each bucket contributes `(a·Nb − b·Na)² / (Na·Nb·(a·Nb + b·Na))`
    * (the ½·Σ(p−q)²/(p+q) distance, cross-multiplied so EVERYTHING up to
    * the final cast is exact integer arithmetic — no p/q divisions, no
    * log, no accumulation-order hazard). The standard curation tripwire:
    * "did this crawl shard drift from the at-rest corpus?", ranked by
    * per-bucket contribution to see WHERE.
    *
    * Scale shape: both corpora reduce to `buckets` rows (map-side
    * partials), the two totals ride 1-row crossJoin broadcasts, and the
    * output is exactly `buckets` rows whatever the corpus size. The
    * num/den pair is emitted as DOUBLE (each one correctly-rounded cast
    * of an exact ≤1e24 integer — engine-identical) alongside the one
    * IEEE division per bucket. */
  def chiSquaredShift(
      a: DataFrame, b: DataFrame, textCol: String,
      buckets: Int = 4096): DataFrame =
    chiSquaredShiftFromCounts(
      bucketCounts(a, textCol, buckets),
      bucketCounts(b, textCol, buckets), buckets)

  /** [[chiSquaredShift]] over ALREADY-COUNTED (bucket, cnt) frames — the
    * streaming/incremental entry point: the at-rest side is counted once
    * (or maintained via [[mergeBucketCounts]]) and each arriving shard
    * brings only its own `buckets`-row count table; nothing rescans. */
  def chiSquaredShiftFromCounts(
      aCounts: DataFrame, bCounts: DataFrame, buckets: Int): DataFrame = {
    import org.apache.spark.sql.types.DecimalType
    val dec = DecimalType(38, 0)
    val ca = aCounts.select(col("bucket"), col("cnt").as("cnt_a"))
    val cb = bCounts.select(col("bucket"), col("cnt").as("cnt_b"))
    // Exactness bound: num ≤ (na·nb)² and den ≤ 2·(na·nb)², so
    // Decimal(38,0) is exact only while na·nb < ~7e18. Guard each side at
    // 2e9 smoothed tokens (product ≤ 4e18) — beyond that the non-ANSI
    // decimal would silently NULL out, which is worse than failing loud.
    // The assert rides the total itself (coalesce(assert_true, 0) adds 0
    // on the happy path) so column pruning can't drop it.
    val maxTotal = 2000000000L
    def guarded(total: Column, side: String): Column =
      total + coalesce(
        assert_true(total <= maxTotal, lit(
          s"chi_squared_shift: smoothed token total of side '$side' exceeds " +
            s"$maxTotal; Decimal(38,0) intermediates would overflow — " +
            "pre-aggregate to coarser shards or subsample")),
        lit(0L))
    val ta = ca.agg(guarded(sum("cnt_a") + buckets, "a").as("na"))
    val tb = cb.agg(guarded(sum("cnt_b") + buckets, "b").as("nb"))
    val x = (col("cnt_a") + 1).cast(dec) * col("nb") // a·Nb, exact
    val y = (col("cnt_b") + 1).cast(dec) * col("na") // b·Na, exact
    ca.join(cb, Seq("bucket"))
      .crossJoin(broadcast(ta)).crossJoin(broadcast(tb))
      .select(
        col("bucket"), col("cnt_a"), col("cnt_b"),
        ((x - y) * (x - y)).cast("double").as("num"),
        (col("na").cast(dec) * col("nb") * (x + y)).cast("double").as("den"))
      .withColumn("contrib", col("num") / col("den"))
  }

  /** EXACT two-sample Kolmogorov–Smirnov statistic between groups `a`
    * and `b` of `groupCol` — the nonparametric companion to
    * [[chiSquaredShift]] for NUMERIC columns (score drift between two
    * corpus shards, "did the quality distribution move?"). One row:
    * (n_a, n_b, d_num, d) where D = d_num / (n_a·n_b) EXACTLY —
    * d_num = max over values of |F_a·n_a·n_b − F_b·n_a·n_b| =
    * max |cum_a·n_b − cum_b·n_a| stays in integer arithmetic
    * (Decimal(38,0) cross-products, the chi² convention), so the gate
    * hashes an integer; the one IEEE division producing `d` is
    * fixed-order on both engines. Ties are handled exactly: the ECDF
    * jumps at each DISTINCT value with its full multiplicity.
    *
    * Scale shape (the [[Percentiles]] contract): the corpus reduces to
    * its distinct-value histogram first (map-side partials + one
    * exchange), the cumulative window runs over HISTOGRAM rows only,
    * and the totals ride a 1-row broadcast. For genuinely continuous
    * values quantize first (the `Percentiles.perKey` knob) — D is then
    * exact at that quantization. Guarded loud at 2e9 rows per side
    * (beyond that the decimal cross-product could overflow). */
  def ksTwoSample(
      df: DataFrame, valueCol: String, groupCol: String,
      a: String, b: String): DataFrame = {
    import org.apache.spark.sql.types.DecimalType
    val dec = DecimalType(38, 0)
    val maxSide = 2000000000L
    val base = df.filter(col(groupCol).isin(a, b))
      .select(col(valueCol).as("v"),
        when(col(groupCol) === a, 1L).otherwise(0L).as("ia"))
    val hist = base.groupBy("v")
      .agg(sum("ia").as("da"), (count(lit(1)) - sum("ia")).as("db"))
    def guarded(total: Column, side: String): Column =
      total + coalesce(
        assert_true(total <= maxSide, lit(
          s"ks_two_sample: side '$side' exceeds $maxSide rows; the exact " +
            "integer cross-products would overflow — quantize or subsample")),
        lit(0L))
    val tot = hist.agg(guarded(sum("da"), "a").as("na"),
      guarded(sum("db"), "b").as("nb"))
    val wCum = Window.orderBy("v")
      .rowsBetween(Window.unboundedPreceding, 0)
    hist
      .select(col("v"), sum("da").over(wCum).as("ca"),
        sum("db").over(wCum).as("cb"))
      .crossJoin(broadcast(tot))
      .agg(max(col("na")).as("n_a"), max(col("nb")).as("n_b"),
        max(abs(col("ca").cast(dec) * col("nb") -
          col("cb").cast(dec) * col("na"))).cast("long").as("d_num"))
      .withColumn("d", col("d_num").cast("double") /
        (col("n_a").cast("double") * col("n_b").cast("double")))
  }

  /** EXACT Mann–Whitney U (rank-sum) between groups `a` and `b` — the
    * ordinal companion to [[ksTwoSample]] ("did the scores shift UP?",
    * where KS asks "did the distribution change at all?"). Ties get
    * midranks, handled exactly by carrying DOUBLED rank sums:
    * u2_a = 2·U_a = Σ_v da_v·(2·cum_prev_v + cnt_v + 1) − n_a(n_a+1)
    * stays integer end to end (Decimal(38,0) cross-products, loud 2e9
    * guard); `u_a` is the one halving division in IEEE. One row:
    * (n_a, n_b, u2_a, u_a). U_b needs no second pass: U_a+U_b = n_a·n_b.
    * Scale shape identical to KS: distinct-value histogram, cumulative
    * window over histogram rows only, 1-row broadcast totals. */
  def mannWhitney(
      df: DataFrame, valueCol: String, groupCol: String,
      a: String, b: String): DataFrame = {
    import org.apache.spark.sql.types.DecimalType
    val dec = DecimalType(38, 0)
    val maxSide = 2000000000L
    val base = df.filter(col(groupCol).isin(a, b))
      .select(col(valueCol).as("v"),
        when(col(groupCol) === a, 1L).otherwise(0L).as("ia"))
    val hist = base.groupBy("v")
      .agg(sum("ia").as("da"), (count(lit(1)) - sum("ia")).as("db"))
    def guarded(total: Column, side: String): Column =
      total + coalesce(
        assert_true(total <= maxSide, lit(
          s"mann_whitney: side '$side' exceeds $maxSide rows; the exact " +
            "integer rank sums would overflow — quantize or subsample")),
        lit(0L))
    val tot = hist.agg(guarded(sum("da"), "a").as("na"),
      guarded(sum("db"), "b").as("nb"))
    val wCum = Window.orderBy("v")
      .rowsBetween(Window.unboundedPreceding, 0)
    hist
      .withColumn("cum", sum(col("da") + col("db")).over(wCum))
      .withColumn("term",
        col("da").cast(dec) *
          (lit(2L) * (col("cum") - col("da") - col("db")) +
            col("da") + col("db") + 1L))
      .crossJoin(broadcast(tot))
      .agg(max(col("na")).as("n_a"), max(col("nb")).as("n_b"),
        (sum(col("term")) -
          max(col("na")).cast(dec) * (max(col("na")) + 1L))
          .cast("long").as("u2_a"))
      .withColumn("u_a", col("u2_a").cast("double") / 2.0)
  }

  /** Exact Kendall rank correlation τ-b between two discrete numeric
    * columns — the ordinal-association audit ("do longer docs really
    * score higher?") that, unlike Pearson, needs no distributional
    * assumptions. The fact reduces to its JOINT (x, y) cell histogram,
    * then one O(cells²) broadcast cell-pair sweep counts concordant and
    * discordant pairs exactly (each cell pair classified by pure
    * comparisons — no subtraction that could overflow, products in
    * Decimal(38,0)); ties split into x-only / y-only / both via three
    * cell-level aggregates. τ-b = (C−D)/√((n0−n1)(n0−n2)) with one
    * correctly-rounded sqrt each side — IEEE sqrt is exact-deterministic
    * cross-engine, unlike log/exp. Loud `maxCells` guard: the sweep is
    * quadratic in DISTINCT cells by design — quantize continuous values
    * first (the [[Percentiles.perKey]] contract). One row:
    * (n, conc, disc, tau_b). */
  def kendallTauB(
      df: DataFrame, xCol: String, yCol: String,
      maxCells: Int = 1 << 14): DataFrame = {
    import org.apache.spark.sql.types.DecimalType
    val dec = DecimalType(38, 0)
    val cells = df.groupBy(col(xCol).as("x"), col(yCol).as("y"))
      .agg(count(lit(1)).as("c"))
      .persist()
    val nCells = cells.count()
    if (nCells > maxCells) {
      // release the cache before throwing — callers catch this and
      // retry with quantized input, and a leaked frame would pin memory
      cells.unpersist(blocking = false)
      throw new IllegalArgumentException(
        s"requirement failed: kendall_tau_b: $nCells distinct (x,y) " +
          s"cells exceed maxCells=$maxCells; the cell-pair sweep is " +
          "quadratic — quantize the values first (the Percentiles " +
          "contract) or raise maxCells")
    }
    val tot = cells.agg(
      sum("c").as("n"),
      sum(col("c").cast(dec) * (col("c") - 1) / 2).as("n3")) // tied both
    val tx = cells.groupBy("x").agg(sum("c").as("t"))
      .agg(sum(col("t").cast(dec) * (col("t") - 1) / 2).as("n1")) // tied x
    val ty = cells.groupBy("y").agg(sum("c").as("t"))
      .agg(sum(col("t").cast(dec) * (col("t") - 1) / 2).as("n2")) // tied y
    val a = cells.select(col("x").as("ax"), col("y").as("ay"), col("c").as("ac"))
    val b = cells.select(col("x").as("bx"), col("y").as("by"), col("c").as("bc"))
    // ordered-pair double count: each unordered cell pair meets twice
    val sweep = a.crossJoin(broadcast(b))
      .agg(
        coalesce(sum(when(
          (col("ax") < col("bx") && col("ay") < col("by")) ||
            (col("ax") > col("bx") && col("ay") > col("by")),
          col("ac").cast(dec) * col("bc"))), lit(0L).cast(dec)).as("c2"),
        coalesce(sum(when(
          (col("ax") < col("bx") && col("ay") > col("by")) ||
            (col("ax") > col("bx") && col("ay") < col("by")),
          col("ac").cast(dec) * col("bc"))), lit(0L).cast(dec)).as("d2"))
    val out = sweep.crossJoin(broadcast(tot))
      .crossJoin(broadcast(tx)).crossJoin(broadcast(ty))
      .select(col("n"),
        (col("c2") / 2).cast("long").as("conc"),
        (col("d2") / 2).cast("long").as("disc"),
        (col("n").cast(dec) * (col("n") - 1) / 2).as("n0"),
        col("n1"), col("n2"))
      .select(col("n"), col("conc"), col("disc"),
        ((col("conc") - col("disc")).cast("double") /
          (sqrt((col("n0") - col("n1")).cast("double")) *
            sqrt((col("n0") - col("n2")).cast("double")))).as("tau_b"))
    out.persist().count()
    cells.unpersist(blocking = false)
    out
  }

  /** Exact Spearman rank correlation ρ — Pearson over DOUBLED midranks,
    * so every rank is an integer even under ties and every moment sum
    * is exact (Decimal(38,0); loud 1e8-row guard keeps n·Σr² inside 38
    * digits). Ranks come from per-column value histograms + cumulative
    * windows (histogram rows only, the KS shape), broadcast-joined back
    * to the fact; the single final division and two correctly-rounded
    * sqrts are the only IEEE steps. One row: (n, num, den_x, den_y,
    * rho) with num/den emitted as correctly-rounded doubles of exact
    * integers (the chi² convention). */
  def spearmanRho(
      df: DataFrame, xCol: String, yCol: String): DataFrame = {
    import org.apache.spark.sql.types.DecimalType
    val dec = DecimalType(38, 0)
    val maxN = 100000000L
    val base = df.select(col(xCol).as("x"), col(yCol).as("y"))
    def rankMap(c: String): DataFrame = {
      val hist = base.groupBy(c).agg(count(lit(1)).as("cnt"))
      val w = Window.orderBy(c).rowsBetween(Window.unboundedPreceding, 0)
      hist.select(col(c),
        (lit(2L) * (sum("cnt").over(w) - col("cnt")) + col("cnt") + 1L)
          .as(s"r_$c")) // doubled midrank: 2·cum_prev + cnt + 1
    }
    val ranked = base
      .join(rankMap("x"), Seq("x"))
      .join(rankMap("y"), Seq("y"))
    val m = ranked.agg(
      (count(lit(1)) + coalesce(
        assert_true(count(lit(1)) <= maxN, lit(
          s"spearman_rho: more than $maxN rows; n·Σr² would leave " +
            "Decimal(38,0) — subsample or shard")),
        lit(0L))).as("n"),
      sum(col("r_x").cast(dec)).as("sx"),
      sum(col("r_y").cast(dec)).as("sy"),
      sum(col("r_x").cast(dec) * col("r_x")).as("sxx"),
      sum(col("r_y").cast(dec) * col("r_y")).as("syy"),
      sum(col("r_x").cast(dec) * col("r_y")).as("sxy"))
    m.select(col("n"),
        (col("n") * col("sxy") - col("sx") * col("sy")).as("num0"),
        (col("n") * col("sxx") - col("sx") * col("sx")).as("dx0"),
        (col("n") * col("syy") - col("sy") * col("sy")).as("dy0"))
      .select(col("n"),
        col("num0").cast("double").as("num"),
        col("dx0").cast("double").as("den_x"),
        col("dy0").cast("double").as("den_y"))
      .withColumn("rho",
        col("num") / (sqrt(col("den_x")) * sqrt(col("den_y"))))
  }

  /** Cohen's kappa between two label columns — chance-corrected
    * agreement for labeled training data (two annotators, or an
    * LLM-judge vs a heuristic rater: "is the agreement better than the
    * marginals predict?"). One row: (n, agree, pe_num, kappa) with
    * κ = (p_o − p_e)/(1 − p_e) computed as the exact integer rational
    * (agree·n − Σ_k m_ak·m_bk) / (n² − Σ_k m_ak·m_bk) — Decimal(38,0)
    * cross-products, one final fixed-order IEEE division. Scale shape:
    * one count-agg over the fact, two marginal aggs (label-cardinality
    * rows), the marginal product joined on the label — nothing bigger
    * than the label set leaves the map side. Guarded loud at 2e9 rows
    * (n² must stay exact). */
  def cohenKappa(
      df: DataFrame, raterACol: String, raterBCol: String): DataFrame = {
    import org.apache.spark.sql.types.DecimalType
    val dec = DecimalType(38, 0)
    val maxN = 2000000000L
    val base = df.select(col(raterACol).as("ra"), col(raterBCol).as("rb"))
    val stats = base.agg(
      (count(lit(1)) + coalesce(
        assert_true(count(lit(1)) <= maxN, lit(
          s"cohen_kappa: more than $maxN rows; n² would overflow the " +
            "exact integer path — subsample or shard")),
        lit(0L))).as("n"),
      sum(when(col("ra") === col("rb"), 1L).otherwise(0L)).as("agree"))
    val ma = base.groupBy("ra").agg(count(lit(1)).as("ma"))
    val mb = base.groupBy("rb").agg(count(lit(1)).as("mb"))
    val pe = ma.join(mb, col("ra") === col("rb"))
      .agg(coalesce(sum(col("ma").cast(dec) * col("mb")), lit(0L).cast(dec))
        .as("pe_num"))
    stats.crossJoin(broadcast(pe))
      .select(col("n"), col("agree"),
        col("pe_num").cast("long").as("pe_num"),
        ((col("agree").cast(dec) * col("n") - col("pe_num"))
          .cast("double") /
          (col("n").cast(dec) * col("n") - col("pe_num")).cast("double"))
          .as("kappa"))
  }
}
