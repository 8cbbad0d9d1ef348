package graft.operators

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame}

/** Deterministic sampling / split assignment for training-data pipelines.
  *
  * Train/val/test membership must be a PURE FUNCTION of the record id —
  * reproducible across runs, engines, and re-shards (no RNG state, no
  * `rand()` whose result depends on partitioning). The key is the first
  * 16 bits of md5(id) rendered as 4 hex chars: uniformly distributed,
  * identical in any engine with a standard md5, and thresholdable by
  * plain string comparison (hex is lexicographically ordered at fixed
  * width). Entirely codegen'd built-ins — no UDF, no shuffle.
  */
object Sampling {

  /** 16-bit hex bucket of a record id — stable across engines and runs. */
  def hashKey(id: Column): Column = substring(md5(id.cast("string")), 1, 4)

  /** Threshold for fraction `p` as a string literal compared against the
    * 4-hex-char key (p of the 65536 buckets fall below it). p = 1.0 must
    * include bucket 0xffff too — "g" sorts after every hex digit, so
    * `key < "g"` is all-inclusive (a clamped "ffff" would silently drop
    * ~1/65536 of rows from a "100%" sample). */
  def boundaryHex(p: Double): String = {
    require(p >= 0.0 && p <= 1.0, s"fraction out of range: $p")
    val b = math.round(p * 65536.0)
    if (b >= 65536L) "g" else f"$b%04x"
  }

  /** Deterministic corpus SHUFFLE — the training-order primitive: a
    * reproducible global permutation as a pure function of (seed, id),
    * no RNG state, no partition dependence. `shuffle_key =
    * md5(seed || id)` gives the order; writing the corpus range-
    * partitioned + sorted by it IS the shuffled dataset, and epoch N is
    * just seed N — re-shuffling is one sort, never a random state to
    * snapshot. Adds `shuffle_key` (callers sort/write by it) and
    * `shuffle_rank` stays derivable downstream via a window when a
    * dense position is genuinely needed. */
  def deterministicShuffle(
      df: DataFrame, idCol: String, seed: String): DataFrame =
    df.withColumn("shuffle_key",
      md5(concat(lit(seed), lit("|"), col(idCol).cast("string"))))

  /** CURRICULUM training order — easy→hard as a pure function of the
    * corpus: per-stratum exact quantile buckets of a difficulty score
    * ([[scoreBuckets]] — length, perplexity proxy, classifier score),
    * deterministically shuffled WITHIN each bucket
    * ([[deterministicShuffle]]). The curriculum IS the sort order
    * `(bucket ASC, shuffle_key ASC, id)`: write the corpus
    * range-partitioned + sorted by it and training reads easy buckets
    * first with a reproducible permutation inside each — no global
    * window, no RNG state, epoch N = seed N (the t58 convention).
    * Adds `bucket` and `shuffle_key`. */
  def curriculumOrder(
      df: DataFrame, idCol: String, stratumCol: String, scoreCol: String,
      buckets: Int = 3, seed: String = "epoch1"): DataFrame =
    deterministicShuffle(
      scoreBuckets(df, stratumCol, scoreCol, buckets), idCol, seed)

  /** Deterministic train/val/test label: `trainPct` of ids → train, next
    * `valPct` → val, rest → test. */
  def splitLabel(id: Column, trainPct: Double, valPct: Double): Column =
    when(hashKey(id) < lit(boundaryHex(trainPct)), "train")
      .when(hashKey(id) < lit(boundaryHex(trainPct + valPct)), "val")
      .otherwise("test")

  /** Deterministic `pct` sample: the SAME rows come back on every run and
    * every engine (unlike `df.sample`, which draws per-partition). */
  def deterministicSample(df: DataFrame, idCol: String, pct: Double): DataFrame =
    df.filter(hashKey(col(idCol)) < lit(boundaryHex(pct)))

  /** Stratified deterministic sampling — the domain-mixing primitive: each
    * stratum (source, domain, language, …) keeps its own fraction; strata
    * not in `rates` keep `defaultPct`. For the dozens-of-domains case the
    * per-row boundary is a literal CASE chain over the stratum column, so
    * the filter is still a pure codegen'd row predicate: no shuffle, no
    * join, no RNG. Above `caseChainMaxStrata` the chain would blow past
    * Janino's 64 KB method limit (the same hazard [[tokenBudgetSelect]]
    * documents for its offsets), so the boundary switches to a broadcast
    * rate-lookup join — one O(1) hash probe per row, still zero shuffles
    * of the data side.
    *
    * Selection hashes the id ALONE (not (stratum, id)), which buys the
    * nesting property mixture tuning needs: a row kept at rate p is kept
    * at every rate ≥ p, so re-weighting a domain never churns the rest of
    * its sample (and upsampling is a superset of the old sample). Strata
    * are disjoint by construction, so sharing one hash stream across them
    * costs nothing. */
  def stratifiedSample(
      df: DataFrame, idCol: String, stratumCol: String,
      rates: Map[String, Double], defaultPct: Double = 0.0,
      caseChainMaxStrata: Int = 100): DataFrame = {
    if (rates.size <= caseChainMaxStrata) {
      val boundary = rates.toSeq.sortBy(_._1).foldLeft(lit(boundaryHex(defaultPct))) {
        case (acc, (stratum, p)) =>
          when(col(stratumCol) === stratum, lit(boundaryHex(p))).otherwise(acc)
      }
      df.filter(hashKey(col(idCol)) < boundary)
    } else {
      Seq("__stratum", "__boundary").foreach(t => require(!df.columns.contains(t),
        s"input already has a column named $t — rename it before stratifiedSample"))
      import df.sparkSession.implicits._
      val rateDf = rates.toSeq.map { case (s, p) => (s, boundaryHex(p)) }
        .toDF("__stratum", "__boundary")
      // left join: a NULL or unlisted stratum misses and falls back to the
      // default boundary — identical to the CASE chain's otherwise branch
      df.join(broadcast(rateDf), df(stratumCol) === col("__stratum"), "left")
        .filter(hashKey(col(idCol)) <
          coalesce(col("__boundary"), lit(boundaryHex(defaultPct))))
        .drop("__stratum", "__boundary")
    }
  }

  /** Mixture up-sampling — repeat each row toward its stratum's target
    * weight, the other half of mixture construction (down-weighting is
    * [[stratifiedSample]]). Weight w yields floor(w) copies plus one
    * extra for the deterministic [[hashKey]] slice of size frac(w), so
    * expected copies per row = w exactly and the extra-copy set NESTS
    * with [[deterministicSample]]'s (same hash stream: the docs that get
    * the extra epoch are the ones a frac(w) sample would keep). Weight 0
    * drops the stratum. Emits 1-based `repCol` so downstream
    * shard-writers can keep copies apart. Pure codegen'd CASE chain +
    * explode — no shuffle, no join, no RNG. */
  def upsampleByWeight(
      df: DataFrame, idCol: String, stratumCol: String,
      weights: Map[String, Double], defaultWeight: Double = 1.0,
      repCol: String = "rep"): DataFrame = {
    require((weights.values ++ Seq(defaultWeight)).forall(_ >= 0.0),
      "negative mixture weight")
    def base(w: Double): Int = math.floor(w).toInt
    def bound(w: Double): String = boundaryHex(w - math.floor(w))
    val baseCol = weights.toSeq.sortBy(_._1).foldLeft(lit(base(defaultWeight))) {
      case (acc, (s, w)) => when(col(stratumCol) === s, lit(base(w))).otherwise(acc)
    }
    val boundCol = weights.toSeq.sortBy(_._1).foldLeft(lit(bound(defaultWeight))) {
      case (acc, (s, w)) => when(col(stratumCol) === s, lit(bound(w))).otherwise(acc)
    }
    df.withColumn("__n_copies",
        baseCol + when(hashKey(col(idCol)) < boundCol, 1).otherwise(0))
      .filter(col("__n_copies") > 0)
      .withColumn(repCol, explode(sequence(lit(1), col("__n_copies"))))
      .drop("__n_copies")
  }

  /** Per-key frequency cap — the "at most N documents per domain /
    * source / site" curation primitive (over-represented hosts otherwise
    * dominate a crawl-derived corpus). Deterministic: within a key, rows
    * rank by (md5(id), id) — a stable pseudo-random total order
    * independent of partitioning and engine — and ranks past `cap` drop,
    * so re-runs and re-shards keep the SAME winners (and lowering the
    * cap keeps a prefix of them, the nesting property
    * [[stratifiedSample]] documents for rates).
    *
    * Plan: a per-key window, which shuffles each key's rows to one
    * reducer — the right shape while no key dominates a partition's
    * memory. For a pathological mega-key, pre-thin candidates with
    * [[deterministicSample]] at rate ~ `cap * safety / est_count` first
    * (hash nesting makes the two filters consistent: the cap's md5 order
    * ranks the sample's survivors identically), or two-phase it via the
    * count+threshold shape in [[graft.operators.Skew]]. Output keeps the
    * input columns plus the 1-based `rankCol`. */
  def perKeyCap(
      df: DataFrame, idCol: String, keyCol: String, cap: Int,
      rankCol: String = "rk"): DataFrame = {
    val w = Window.partitionBy(col(keyCol))
      .orderBy(md5(col(idCol).cast("string")), col(idCol))
    df.withColumn(rankCol, row_number().over(w).cast("long"))
      .filter(col(rankCol) <= cap)
  }

  /** Histogram-based per-key quantile bucketing — the CCNet head/middle/
    * tail split shape generalized: assign each row to one of `buckets`
    * per-key quantile buckets of `scoreCol` WITHOUT sorting the corpus.
    * CCNet splits each language's documents into perplexity terciles and
    * samples them at different rates; the same shape serves
    * length-stratified splits and any score-balanced mixture.
    *
    * 100 TB shape: the corpus never sorts. A (key, score) histogram
    * aggregates with map-side partials (one exchange of distinct pairs),
    * the cumulative window runs over the HISTOGRAM (rows bounded by
    * distinct scores per key, not corpus rows — no single-partition
    * funnel, no per-key row sort), and the bucket per (key, score) joins
    * back on the same keys (exchange-reusable with the histogram
    * aggregation). Ties share a bucket by construction: the bucket is
    * decided by the score group's first cumulative position —
    * `floor(cum_before * buckets / n) + 1` — exact integer/IEEE
    * arithmetic, so the assignment is deterministic and
    * oracle-reproducible.
    *
    * `scoreCol` must be discrete (ints/longs — token counts, quantized
    * scores): the histogram trick trades a continuous sort for group
    * arithmetic, which is exactly the right trade for the integer
    * quality signals this codebase emits. */
  def scoreBuckets(
      df: DataFrame, keyCol: String, scoreCol: String,
      buckets: Int = 3): DataFrame = {
    require(buckets >= 1, s"buckets must be >= 1, got $buckets")
    Seq("__c", "__cum", "__n", "bucket").foreach(t => require(!df.columns.contains(t),
      s"input already has a column named $t — rename it before scoreBuckets"))
    val hist = df.groupBy(col(keyCol), col(scoreCol)).agg(count(lit(1)).as("__c"))
    val wk = Window.partitionBy(col(keyCol))
    val assignment = hist
      .withColumn("__cum", sum("__c").over(wk.orderBy(col(scoreCol))) - col("__c"))
      .withColumn("__n", sum("__c").over(wk))
      .withColumn("bucket",
        least(floor(col("__cum") * lit(buckets) / col("__n")) + 1, lit(buckets.toLong))
          .cast("int"))
      .select(col(keyCol), col(scoreCol), col("bucket"))
    df.join(assignment, Seq(keyCol, scoreCol))
  }

  /** Token-budget selection — "take the best documents until N tokens":
    * rows in (priorityCol DESC, idCol ASC) order whose RUNNING `costCol`
    * total (inclusive) stays ≤ `budget`. The order must be total —
    * idCol breaks priority ties — so the selected set is a deterministic
    * prefix, independent of partitioning and engine.
    *
    * Scalable distributed prefix sum, NOT `Window.orderBy(...)` over the
    * whole frame (that plans a single-partition exchange — the one shape
    * this codebase bans at 100 TB): range-repartition on the order key,
    * running-sum WITHIN each partition (window partitioned by the
    * materialized partition id → parallel), then add each partition's
    * driver-computed offset (the cumulative total of all partitions
    * before it — |partitions| values, broadcast as a literal map).
    *
    * The result is caller-owned persisted (the partition-id → offset
    * mapping must not be recomputed under a different range sampling);
    * unpersist when done. */
  def tokenBudgetSelect(
      df: DataFrame, idCol: String, costCol: String, priorityCol: String,
      budget: Long): DataFrame = {
    Seq("__pid", "__run", "__offset").foreach(t => require(!df.columns.contains(t),
      s"input already has a column named $t — rename it before tokenBudgetSelect"))
    val ord = Seq(col(priorityCol).desc, col(idCol).asc)
    // NULL costs count as 0 (documented): SUM skips nulls asymmetrically
    // between engines/positions, so normalize before any arithmetic
    val cost = coalesce(col(costCol).cast("long"), lit(0L))
    val parts = df.sparkSession.sparkContext.defaultParallelism
    // no sortWithinPartitions here: __pid depends only on the range
    // exchange, the totals groupBy ignores order, and the running-sum
    // window below re-sorts after its own __pid exchange anyway — a
    // pre-sort would be a wasted full sort of the dataset
    val parted = df
      .repartitionByRange(parts, ord: _*)
      .withColumn("__pid", spark_partition_id())
      .persist()
    try {
      // per-partition totals: |partitions| rows to the driver
      val totals = parted.groupBy("__pid")
        .agg(sum(cost).as("t"))
        .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
      val offsets = (0 until parts).scanLeft(0L) {
        case (acc, p) => acc + totals.getOrElse(p, 0L)
      }
      // offsets ride a broadcast-joined 2-column frame: an O(1) hash probe
      // per row, where a literal CreateMap would plan a CaseKeyWhen chain
      // with one branch per partition (thousands on a real cluster —
      // past Janino's method limit, silently interpreted)
      import df.sparkSession.implicits._
      val offsetDf = (0 until parts).map(p => (p, offsets(p))).toDF("__pid", "__offset")
      val w = Window.partitionBy("__pid").orderBy(ord: _*)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val out = parted
        .join(broadcast(offsetDf), Seq("__pid"))
        .withColumn("__run", col("__offset") + sum(cost).over(w))
        .filter(col("__run") <= budget)
        .drop("__pid", "__run", "__offset")
        .persist()
      // materialize while the partitioning is still pinned; a failed
      // count must release the cache entry it just registered, or retries
      // in a long-lived driver accumulate orphans
      try out.count()
      catch { case e: Throwable => out.unpersist(blocking = false); throw e }
      out
    } finally parted.unpersist(blocking = false)
  }

  /** GPT-style sequence packing ("concatenate and cut"): documents
    * concatenate in `idCol` order into one global token stream, which
    * training cuts into `windowTokens`-sized contexts. Each doc gets its
    * `start_offset` in the stream, the `window_id` its first token lands
    * in, and `crosses` — whether it straddles a window boundary (the
    * fraction worth monitoring: boundary-crossing docs lose attention
    * context). The global running sum is the t13 DISTRIBUTED prefix sum —
    * range partition on the order key, per-partition totals to the driver
    * (one row per partition), broadcast offsets, in-partition window —
    * never a single-partition funnel. NULL costs count as 0.
    *
    * The returned frame is CALLER-OWNED PERSISTED (the tokenBudgetSelect
    * contract): unpersist it when done, or use [[withPackWindows]] for
    * structural release. */
  def packWindows(
      df: DataFrame, idCol: String, costCol: String,
      windowTokens: Long): DataFrame = {
    require(windowTokens > 0, s"windowTokens must be positive, got $windowTokens")
    Seq("__pid", "__offset").foreach(t => require(!df.columns.contains(t),
      s"input already has a column named $t — rename it before packWindows"))
    val cost = coalesce(col(costCol).cast("long"), lit(0L))
    val parts = df.sparkSession.sparkContext.defaultParallelism
    val parted = df
      .repartitionByRange(parts, col(idCol).asc)
      .withColumn("__pid", spark_partition_id())
      .persist()
    try {
      val totals = parted.groupBy("__pid")
        .agg(sum(cost).as("t"))
        .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
      val offsets = (0 until parts).scanLeft(0L) {
        case (acc, p) => acc + totals.getOrElse(p, 0L)
      }
      import df.sparkSession.implicits._
      val offsetDf = (0 until parts).map(p => (p, offsets(p))).toDF("__pid", "__offset")
      val w = Window.partitionBy("__pid").orderBy(col(idCol).asc)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      // result is caller-owned persisted (the tokenBudgetSelect contract):
      // materialize while the range partitioning is pinned, then release
      // the intermediate
      val out = parted
        .join(broadcast(offsetDf), Seq("__pid"))
        .withColumn("start_offset", col("__offset") + sum(cost).over(w) - cost)
        .withColumn("window_id", expr(s"start_offset div $windowTokens"))
        .withColumn("crosses",
          cost > 0 &&
            expr(s"(start_offset + $costCol - 1) div $windowTokens") =!= col("window_id"))
        .drop("__pid", "__offset")
        .persist()
      try out.count()
      catch { case e: Throwable => out.unpersist(blocking = false); throw e }
      out
    } finally parted.unpersist(blocking = false)
  }

  /** Loan-pattern wrapper for [[packWindows]] — structural release of the
    * caller-owned persisted packing frame. */
  def withPackWindows[T](
      df: DataFrame, idCol: String, costCol: String, windowTokens: Long)(
      f: DataFrame => T): T = {
    val packed = packWindows(df, idCol, costCol, windowTokens)
    try f(packed) finally packed.unpersist(blocking = false)
  }

  /** Loan-pattern wrapper for [[tokenBudgetSelect]]: the selection frame is
    * caller-owned persisted, and a caller that projects before unpersisting
    * (unpersist on a projection is a no-op) or forgets entirely leaks cache
    * entries in a long-lived driver. This makes the release structural —
    * use the frame inside `f`, never let it escape. */
  def withTokenBudgetSelect[T](
      df: DataFrame, idCol: String, costCol: String, priorityCol: String,
      budget: Long)(f: DataFrame => T): T = {
    val sel = tokenBudgetSelect(df, idCol, costCol, priorityCol, budget)
    try f(sel) finally sel.unpersist(blocking = false)
  }

  /** Single-exchange [[tokenBudgetSelect]]: same contract and identical
    * output (equivalence-tested), for when the selection shows up in a
    * profile. The window version moves the data twice (range exchange,
    * then the window's hash exchange on `__pid`); here the data moves ONCE
    * — range exchange + in-partition sort — and the running sum is a
    * sequential `mapPartitions` pass over the cached sorted partitions
    * with the same driver-computed offsets. mapPartitions costs codegen
    * fusion, but a row-counter running sum is exactly the case where that
    * trade wins: one narrow pass versus a full second shuffle.
    *
    * The window version remains the default: its plan is pure Catalyst
    * (optimizer-visible end to end) and it is the shape the driver's SQL
    * oracle mirrors. */
  def tokenBudgetSelectSinglePass(
      df: DataFrame, idCol: String, costCol: String, priorityCol: String,
      budget: Long): DataFrame = {
    require(!df.columns.contains("__cost"),
      "input already has a column named __cost — rename it before tokenBudgetSelectSinglePass")
    val ord = Seq(col(priorityCol).desc, col(idCol).asc)
    val parts = df.sparkSession.sparkContext.defaultParallelism
    val parted = df
      .withColumn("__cost", coalesce(col(costCol).cast("long"), lit(0L)))
      .repartitionByRange(parts, ord: _*)
      .sortWithinPartitions(ord: _*)
      .persist()
    try {
      val costIdx = parted.schema.fieldIndex("__cost")
      // per-partition totals: a narrow projection over the cached frame,
      // |partitions| longs to the driver — no extra exchange
      val totals = parted.select(col("__cost")).rdd
        .mapPartitionsWithIndex { case (pid, it) =>
          var s = 0L
          it.foreach(s += _.getLong(0))
          Iterator.single(pid -> s)
        }.collect().toMap
      val offsets = (0 until parts).scanLeft(0L) {
        case (acc, p) => acc + totals.getOrElse(p, 0L)
      }
      val selected = parted.mapPartitions { it =>
        // cached partition indices line up with the range partitioning the
        // offsets were computed under (narrow chain over the same cache)
        var run = offsets(org.apache.spark.TaskContext.getPartitionId())
        it.filter { row => run += row.getLong(costIdx); run <= budget }
      }(org.apache.spark.sql.Encoders.row(parted.schema))
      val out = selected.drop("__cost").persist()
      try out.count()
      catch { case e: Throwable => out.unpersist(blocking = false); throw e }
      out
    } finally parted.unpersist(blocking = false)
  }

  /** Temperature-flattened (α) mixture rates — the multilingual /
    * multi-source balancing primitive behind mC4 / XLM-R "exponential
    * smoothing": sample stratum s with probability ∝ count_s^α, α < 1
    * flattening the head so low-resource strata survive. Expressed as
    * PER-ROW keep rates with max-retention normalization — the smallest
    * stratum keeps everything, rate_s = (c_min / c_s)^(1−α) — so the
    * flattened corpus is as large as the target composition allows (any
    * further global down-scaling composes via [[deterministicSample]]
    * thanks to hash nesting). Counts aggregate with map-side partials to
    * |strata| rows before the collect — bounded by the stratum
    * vocabulary (languages, sources), never the corpus. NULL strata are
    * skipped and fall to [[stratifiedSample]]'s default rate.
    *
    * α = 0.5 takes a bit-stable path: rate = sqrt(c_min/c_s) is one IEEE
    * division + one IEEE sqrt, both correctly rounded on every platform,
    * so the rates (and the 16-bit [[boundaryHex]] thresholds derived
    * from them) are engine-reproducible — the path the driver oracle
    * checks. General α goes through `math.pow`, whose last ulp is
    * libm-specific: fine for production sampling, not for cross-engine
    * bit-parity. */
  def alphaMixtureRates(
      df: DataFrame, stratumCol: String, alpha: Double): Map[String, Double] = {
    require(alpha >= 0.0 && alpha <= 1.0, s"alpha out of [0,1]: $alpha")
    val counts = df.groupBy(col(stratumCol))
      .agg(count(lit(1)).as("__n"))
      .collect()
      .filterNot(_.isNullAt(0))
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    require(counts.nonEmpty, "no non-null strata to mix")
    val cmin = counts.values.min.toDouble
    counts.map { case (s, c) =>
      s -> (if (alpha == 0.5) math.sqrt(cmin / c.toDouble)
            else math.pow(cmin / c.toDouble, 1.0 - alpha))
    }
  }

  /** [[alphaMixtureRates]] composed with [[stratifiedSample]]: one
    * bounded count aggregation, then a pure codegen'd per-row predicate
    * — no shuffle of the data side, no join below the CASE-chain
    * threshold, no RNG. */
  def alphaMixtureSample(
      df: DataFrame, idCol: String, stratumCol: String,
      alpha: Double): DataFrame =
    stratifiedSample(df, idCol, stratumCol,
      alphaMixtureRates(df, stratumCol, alpha))

  /** Deterministic WEIGHTED sampling without replacement — "pick the k
    * docs, favoring high quality scores, the same way every run": each
    * row draws `weight` hashes (md5 of `id#rep`) and keeps the MINIMUM
    * as its priority key; the k smallest keys win. Pairwise this is
    * exactly proportional selection — P(min of w uniforms < min of v
    * uniforms) = w/(w+v) — the integer-arithmetic cousin of
    * Efraimidis–Spirakis exponential keys, chosen here because every
    * comparison is an exact 60-bit integer (E-S needs `ln`, whose last
    * ulp is libm-specific — the one arithmetic class this codebase
    * keeps out of oracle-checked paths). Weights clamp to
    * [1, `maxWeight`]; the key is a per-row `array_min` over a
    * `transform(sequence(...))` of codegen'd hashes — scan-side, no
    * shuffle, no RNG, and the global top-k is a TakeOrdered, not a
    * sort. Emits the key (`wkey`) for oracle replay. */
  def weightedSample(
      df: DataFrame, idCol: String, weightCol: String, k: Int,
      maxWeight: Int = 16): DataFrame = {
    require(k >= 1, s"k must be >= 1: $k")
    require(maxWeight >= 1 && maxWeight <= 64, s"maxWeight out of range: $maxWeight")
    require(!df.columns.contains("wkey"),
      "input already has a column named wkey — rename it before weightedSample")
    val w = least(greatest(coalesce(col(weightCol).cast("long"), lit(1L)), lit(1L)),
      lit(maxWeight.toLong))
    val key = array_min(transform(
      sequence(lit(1L), w),
      r => conv(substring(md5(
        concat(col(idCol).cast("string"), lit("#"), r.cast("string"))), 1, 15),
        16, 10).cast("long")))
    df.withColumn("wkey", key)
      .orderBy(col("wkey").asc, col(idCol).asc)
      .limit(k)
  }
}
