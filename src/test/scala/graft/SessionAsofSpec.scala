package graft

import graft.queries.Inventory
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Semantics of the merge-shaped event operators (j8 as-of join, w4
  * sessionization) on a handcrafted corpus where every edge case is
  * planted: ties on ts, boundary-exact gaps, users with no match. The
  * sf0.01 DuckDB oracle checks the same constructions statistically;
  * this spec pins the INTENDED tie/boundary rules so an oracle-and-code
  * drift (both sides wrong the same way) can't slip through.
  */
class SessionAsofSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  /** Write a tiny events.parquet into a temp dir shaped like testdata. */
  private def eventsDir(rows: Seq[(Long, Long, Long, String)]): String = {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_ev").toString
    rows.toDF("event_id", "sec", "user_id", "event_type")
      .select(
        col("event_id"),
        timestamp_seconds(col("sec")).as("ts"),
        col("user_id"),
        col("event_type"),
        lit(1.0).as("value"),
        lit("{}").as("props"))
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/events.parquet")
    dir
  }

  test("j8: latest strictly-preceding purchase; ts ties break by event_id") {
    val d = eventsDir(Seq(
      // user 1: click before any purchase → null match
      (0L, 50L, 1L, "click"),
      // purchase at t=100 with SMALLER id than the same-ts click: precedes it
      (1L, 100L, 1L, "purchase"),
      (2L, 100L, 1L, "click"),
      // later purchase must NOT be picked by the t=150 click
      (4L, 150L, 1L, "click"),
      (3L, 200L, 1L, "purchase"),
      // same-ts purchase with LARGER id does NOT precede the click
      (5L, 300L, 2L, "click"),
      (6L, 300L, 2L, "purchase"),
      (7L, 400L, 2L, "click")))
    val out = Inventory.j8AsofJoin(spark, d)
      .collect().map(r => r.getLong(0) -> ((
        if (r.isNullAt(2)) -1L else r.getLong(2),
        if (r.isNullAt(3)) -1L else r.getLong(3)))).toMap
    assert(out(0L) == ((-1L, -1L)))          // nothing precedes
    assert(out(2L) == ((1L, 0L)))            // same-ts smaller-id purchase, gap 0
    assert(out(4L) == ((1L, 50L)))           // not the future purchase
    assert(out(5L) == ((-1L, -1L)))          // same-ts larger-id does not precede
    assert(out(7L) == ((6L, 100L)))          // now it does
  }

  test("j21: a match older than the tolerance nulls out; a fresh one survives") {
    val d = eventsDir(Seq(
      (1L, 100L, 1L, "purchase"),
      (2L, 3700L, 1L, "click"),   // gap 3600 — boundary-inclusive, kept
      (3L, 3701L, 1L, "click"),   // gap 3601 — stale, nulled
      (4L, 4000L, 1L, "purchase"),
      (5L, 4010L, 1L, "click")))  // gap 10 — fresh again
    val out = Inventory.j21AsofTolerance(spark, d)
      .collect().map(r => r.getLong(0) -> ((
        if (r.isNullAt(2)) -1L else r.getLong(2),
        if (r.isNullAt(3)) -1L else r.getLong(3)))).toMap
    assert(out(2L) == ((1L, 3600L)))
    assert(out(3L) == ((-1L, -1L)))
    assert(out(5L) == ((4L, 10L)))
  }

  test("EventOps.asofJoin ≡ naive max-lookup join on random data with ts collisions") {
    import spark.implicits._
    val rnd = new scala.util.Random(42)
    // small ts range FORCES timestamp collisions so the tie-break path runs
    val left = (0 until 300).map(i =>
      (i.toLong, rnd.nextInt(6).toLong, rnd.nextInt(40).toLong))
      .toDF("l_id", "k", "l_sec")
      .withColumn("l_ts", timestamp_seconds(col("l_sec")))
    val right = (1000 until 1300).map(i =>
      (i.toLong, rnd.nextInt(6).toLong, rnd.nextInt(40).toLong, rnd.nextDouble()))
      .toDF("r_id", "k2", "r_sec", "payload")
      .withColumn("r_ts", timestamp_seconds(col("r_sec")))
    val got = graft.operators.EventOps.asofJoin(
      left, right.withColumnRenamed("k2", "k"), "k",
      leftTsCol = "l_ts", rightTsCol = "r_ts",
      leftTieCol = "l_id", rightTieCol = "r_id",
      rightValueCols = Seq("r_id", "payload"))
      .select("l_id", "r_id").collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(1)) -1L else r.getLong(1))).toMap
    val naive = left.join(right,
        col("k") === col("k2") &&
          (col("r_ts") < col("l_ts") ||
            (col("r_ts") === col("l_ts") && col("r_id") < col("l_id"))),
        "left_outer")
      .groupBy("l_id")
      .agg(max(struct(col("r_sec"), col("r_id"))).as("m"))
      .select(col("l_id"), col("m.r_id"))
      .collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(1)) -1L else r.getLong(1))).toMap
    assert(got == naive)
  }

  test("Percentiles.perKey: quantile_disc semantics, quantized variant bounds cardinality") {
    import spark.implicits._
    val df = (1 to 100).map(i => ("k", i.toDouble + 0.5)).toDF("key", "v")
    val exact = graft.operators.Percentiles.perKey(df, "key", "v", Seq(50, 90))
      .head()
    // smallest v with cum >= ceil(q*n): p50 -> 50th value (50.5), p90 -> 90.5
    assert(exact.getAs[Double]("p50") == 50.5 && exact.getAs[Double]("p90") == 90.5)
    val quant = graft.operators.Percentiles
      .perKey(df, "key", "v", Seq(50, 90), quantize = Some(10.0))
      .head()
    // bucket lower bounds at width 10: 50.5 -> 50.0, 90.5 -> 90.0
    assert(quant.getAs[Double]("p50") == 50.0 && quant.getAs[Double]("p90") == 90.0)
  }

  test("new operators tolerate empty and degenerate inputs") {
    import spark.implicits._
    import org.apache.spark.sql.functions.{col, timestamp_seconds}
    val emptyEv = Seq.empty[(Long, Long, Long)].toDF("id", "k", "sec")
      .withColumn("ts", timestamp_seconds(col("sec")))
    // sessionize: no rows -> no sessions
    assert(graft.operators.EventOps
      .sessionize(emptyEv, "k", "ts", "id").count() == 0)
    // asofJoin: empty right -> every left row matches null
    val left = Seq((1L, 5L, 10L)).toDF("id", "k", "sec")
      .withColumn("ts", timestamp_seconds(col("sec")))
    val right = Seq.empty[(Long, Long, Long)].toDF("r_id", "k", "r_sec")
      .withColumn("r_ts", timestamp_seconds(col("r_sec")))
    val m = graft.operators.EventOps.asofJoin(
      left, right, "k", "ts", "r_ts", "id", "r_id", Seq("r_id"))
    assert(m.count() == 1 && m.head().isNullAt(m.columns.indexOf("r_id")))
    // asofJoin: empty LEFT -> empty output
    assert(graft.operators.EventOps.asofJoin(
      emptyEv.withColumnRenamed("id", "l_id"), right,
      "k", "ts", "r_ts", "l_id", "r_id", Seq("r_id")).count() == 0)
    // packWindows: empty corpus -> empty packing
    val emptyDocs = Seq.empty[(Long, Long)].toDF("doc_id", "n_tokens")
    assert(graft.operators.Sampling
      .packWindows(emptyDocs, "doc_id", "n_tokens", 2048L).count() == 0)
    // packWindows: zero/NULL-cost docs take zero stream space, never cross
    val zeroes = Seq((1L, Some(0L)), (2L, None), (3L, Some(5L)))
      .toDF("doc_id", "n_tokens")
    val packed = graft.operators.Sampling
      .packWindows(zeroes, "doc_id", "n_tokens", 4L)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(2), r.getLong(3), r.getBoolean(4)))).toMap
    assert(packed(1L) == ((0L, 0L, false)))
    assert(packed(2L) == ((0L, 0L, false)))
    assert(packed(3L) == ((0L, 0L, true))) // 5 tokens cross the 4-token window
    // percentiles: empty frame -> no keys
    assert(graft.operators.Percentiles
      .perKey(emptyDocs.withColumnRenamed("n_tokens", "v"), "doc_id", "v", Seq(50))
      .count() == 0)
    // passageChunks: empty and whitespace-only docs yield no passages
    val docs = Seq((1L, ""), (2L, "   "), (3L, "a b")).toDF("doc_id", "text")
    val ch = graft.operators.TextAnalysis
      .passageChunks(docs, "doc_id", "text", chunkTokens = 2, stride = 1)
      .collect()
    assert(ch.forall(_.getLong(0) == 3L) && ch.length == 2)
  }

  test("w4: gap of exactly 1800 s continues a session; 1801 starts a new one") {
    val d = eventsDir(Seq(
      (0L, 0L, 1L, "view"),
      (1L, 1800L, 1L, "view"),     // == 1800 → same session
      (2L, 3601L, 1L, "view"),     // 1801 → new session
      (3L, 3700L, 1L, "view"),
      (4L, 0L, 2L, "view")))       // second user: independent numbering
    val out = Inventory.w4Sessionization(spark, d)
      .collect()
      .map(r => ((r.getLong(0), r.getLong(1)), (r.getLong(2), r.getLong(5))))
      .toMap
    assert(out(((1L, 1L))) == ((2L, 1800L)))  // 2 events, 1800 s duration
    assert(out(((1L, 2L))) == ((2L, 99L)))
    assert(out(((2L, 1L))) == ((1L, 0L)))
    assert(out.size == 3)
  }

  test("EventOps.decayedCounts: 0.5^k per whole half-life, future clamps to 1, stale to 0") {
    import spark.implicits._
    import graft.operators.EventOps
    // as-of 2024-02-01, half-life 2 days: ages 0,1 -> unit 0 (w=1);
    // 2,3 -> unit 1 (w=.5); 4 -> unit 2 (w=.25); future -> clamp w=1;
    // 100 days (unit 50 > maxUnits 18) -> w=0
    val rows = Seq(
      ("a", "2024-02-01"), ("a", "2024-01-31"), // unit 0 ×2
      ("a", "2024-01-30"),                      // unit 1
      ("a", "2024-01-28"),                      // unit 2
      ("a", "2024-02-05"),                      // future → 1
      ("b", "2023-10-24"))                      // ancient → 0
      .toDF("k", "dt").select(col("k"), col("dt").cast("timestamp").as("ts"))
    val got = EventOps.decayedCounts(rows, "k", "ts",
      asOfDate = "2024-02-01", halfLifeDays = 2)
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getDouble(3)))).toMap
    assert(got("a") === ((5L, 1.0 + 1.0 + 0.5 + 0.25 + 1.0)))
    assert(got("b") === ((1L, 0.0)))
  }

  test("w12 twap: µs-tie ordering matches the oracle (nanos never decide) and the value is exact") {
    import spark.implicits._
    // long-typed ts = NANOSECONDS; ids 1 and 2 share the same microsecond
    // (differ only in nanos, in the OPPOSITE order of event_id) — the
    // window must order by (µs, event_id) like the DuckDB oracle, never
    // by raw nanos. Ordered correctly: id1(v=1) dt=0, id2(v=3) dt=1s,
    // id3 holds nothing → twap = 3.0; raw-ns ordering would yield 1.0.
    val ev = Seq(
      (1L, 1L, 1_000_000_900L, 1.00), // later in nanos, FIRST by (µs, id)
      (1L, 2L, 1_000_000_500L, 3.00),
      (1L, 3L, 2_000_000_000L, 5.00))
      .toDF("user_id", "event_id", "ts", "value")
    val r = Inventory.twapOf(ev).collect()
    assert(r.length === 1)
    val row = r.head
    assert(row.getLong(1) === 2L)        // n_intervals
    assert(row.getLong(2) === 1_000_000L) // den_us
    assert(row.getDouble(3) === 3.0)
  }

  test("w12 twap: numerator past 2^63 fails LOUD instead of wrapping") {
    import spark.implicits._
    // 5-digit-dollar value held over ~10 years: cents·µs ≈ 3.15e21 > 2^63
    val tenYearsNs = 315_360_000L * 1_000_000_000L
    val ev = Seq(
      (1L, 1L, 0L, 99999.99),
      (1L, 2L, tenYearsNs, 99999.99))
      .toDF("user_id", "event_id", "ts", "value")
    val ex = intercept[Throwable] { Inventory.twapOf(ev).collect() }
    def chain(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x => Option(x.getMessage).toSeq ++ chain(x.getCause))
    assert(chain(ex).exists(_.contains("TWAP numerator exceeds BIGINT")))
  }
}
