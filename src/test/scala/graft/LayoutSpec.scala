package graft

import graft.functions.HexUtil
import graft.operators.Layout
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class LayoutSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  test("morton2: bit-exact interleave, monotone per coordinate at fixed other") {
    assert(HexUtil.morton2(0L, 0L) == 0L)
    assert(HexUtil.morton2(1L, 0L) == 1L)    // a → even bits
    assert(HexUtil.morton2(0L, 1L) == 2L)    // b → odd bits
    assert(HexUtil.morton2(3L, 1L) == (1 | 4 | 2))       // 0b111
    assert(HexUtil.morton2(0x7FFFFFFFL, 0x7FFFFFFFL) == 0x3FFFFFFFFFFFFFFFL)
    assert(HexUtil.morton2(0x7FFFFFFFL, 0x7FFFFFFFL) > 0) // 62 bits, no sign flip
    // z-curve locality precondition: key grows with either coordinate
    for (b <- Seq(0L, 5L, 100L); a <- 1L until 20L)
      assert(HexUtil.morton2(a, b) > HexUtil.morton2(a - 1, b))
  }

  test("z-ordered layout gives BOTH columns file-pruning power; linear only one") {
    import spark.implicits._
    // 100k rows on a 1000 × 100 grid, uniformly occupied
    val df = spark.range(100000).toDF("id")
      .withColumn("a", col("id") % 1000)
      .withColumn("b", expr("id div 1000"))
    val base = java.nio.file.Files.createTempDirectory("graft_layout").toString
    val nFiles = 64
    // linear layout: clustered on `a` alone (what a naive pipeline writes)
    df.repartitionByRange(nFiles, col("a")).sortWithinPartitions("a")
      .write.mode("overwrite").parquet(s"$base/linear")
    Layout.writeZOrdered(df, "a", "b", s"$base/zorder", nFiles)
    val linStats = Layout.fileStats(spark, s"$base/linear", "a", "b").cache()
    val zStats = Layout.fileStats(spark, s"$base/zorder", "a", "b").cache()
    val nLin = linStats.count(); val nZ = zStats.count()
    assert(nLin >= nFiles / 2 && nZ >= nFiles / 2, s"files: linear=$nLin z=$nZ")
    // predicate on a (10% of range): both layouts prune well
    val linA = Layout.filesOverlapping(linStats, "a", 100, 199)
    val zA = Layout.filesOverlapping(zStats, "a", 100, 199)
    assert(linA <= nLin / 4, s"linear a-prune read $linA/$nLin")
    assert(zA <= nZ / 2, s"z a-prune read $zA/$nZ")
    // predicate on b (10% of range): linear layout reads EVERYTHING,
    // z-order still prunes
    val linB = Layout.filesOverlapping(linStats, "b", 20, 29)
    val zB = Layout.filesOverlapping(zStats, "b", 20, 29)
    assert(linB >= (nLin * 9) / 10, s"linear b-prune unexpectedly pruned: $linB/$nLin")
    assert(zB * 2 <= linB, s"z-order b-prune not better: z=$zB linear=$linB")
    linStats.unpersist(); zStats.unpersist()
  }

  test("day-partitioned layout: date slice becomes a PartitionFilter — skipped days cost zero I/O") {
    import spark.implicits._
    val base = java.nio.file.Files.createTempDirectory("graft_daypart").toString
    val df = spark.range(30000).toDF("id")
      .withColumn("day", date_add(lit("2024-01-01").cast("date"),
        (col("id") % 30).cast("int")))
      .withColumn("v", col("id") * 2)
    Layout.writeDayPartitioned(df, s"$base/t", "day")
    val read = spark.read.parquet(s"$base/t")
      .filter(col("day") === lit("2024-01-05").cast("date"))
    // planning-time pruning: the day predicate rides PartitionFilters on
    // the scan, NOT PushedFilters (no footer/stat reads for other days)
    val plan = read.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") && plan.contains("day"), plan.take(2000))
    // only the one directory's rows flow
    assert(read.count() === 1000L)
    // value parity with an unpartitioned write of the same frame
    df.write.mode("overwrite").parquet(s"$base/flat")
    val expect = spark.read.parquet(s"$base/flat")
      .filter(col("day") === lit("2024-01-05").cast("date"))
      .agg(sum("v")).head().getLong(0)
    assert(read.agg(sum("v")).head().getLong(0) === expect)
    // the physical layout really is one directory per day
    val dirs = new java.io.File(s"$base/t").listFiles().count(_.getName.startsWith("day="))
    assert(dirs === 30, s"expected 30 day= dirs, got $dirs")
  }

  test("dynamic partition pruning: a dim-side filter prunes fact partitions at RUNTIME") {
    import spark.implicits._
    val base = java.nio.file.Files.createTempDirectory("graft_dpp").toString
    // fact partitioned by day; the filter arrives via a DIM attribute the
    // planner can't see statically — only DPP can skip directories
    val fact = spark.range(30000).toDF("id")
      .withColumn("day_id", (col("id") % 30).cast("int"))
      .withColumn("v", col("id") * 2)
    Layout.writeDayPartitioned(fact, s"$base/fact", "day_id")
    val dim = (0 until 30).map(d => (d, if (d == 7) "pick" else "skip"))
      .toDF("day_id", "tag")
    dim.coalesce(1).write.parquet(s"$base/dim")
    val f = spark.read.parquet(s"$base/fact")
    val dimR = spark.read.parquet(s"$base/dim").filter($"tag" === "pick")
    val joined = f.join(dimR, Seq("day_id"))
    val plan = joined.queryExecution.executedPlan.toString
    // the fact scan's partition filter must carry the runtime subquery
    assert(plan.contains("dynamicpruning"), plan.take(3000))
    assert(joined.count() === 1000L)
  }

  test("bucketed co-located join: no Exchange on either side, results match the plain join") {
    import spark.implicits._
    val base = java.nio.file.Files.createTempDirectory("graft_bucket").toString
    val left = (0L until 4000L).map(i => (i, i % 7)).toDF("id", "lv")
    val right = (0L until 4000L by 2L).map(i => (i, i % 5)).toDF("id", "rv")
    Layout.writeBucketed(left, "bk_left", s"$base/l", "id", buckets = 8)
    Layout.writeBucketed(right, "bk_right", s"$base/r", "id", buckets = 8)
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val joined = spark.table("bk_left").join(spark.table("bk_right"), "id")
      val plan = joined.queryExecution.executedPlan.toString
      // the point of the layout: co-located buckets join in place — a
      // SortMergeJoin with NO shuffle of either fact side
      assert(plan.contains("SortMergeJoin"), plan)
      assert(!plan.contains("Exchange"), s"bucketed join still shuffles:\n$plan")
      // and it is still the same join
      val got = joined.select("id", "lv", "rv").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sorted.toSeq
      val expect = (0L until 4000L by 2L).map(i => (i, i % 7, i % 5)).sorted
      assert(got === expect)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      spark.sql("DROP TABLE IF EXISTS bk_left")
      spark.sql("DROP TABLE IF EXISTS bk_right")
    }
  }
}
