package graft

import graft.beacon._
import graft.operators.{Dedup, Skew}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class ExtensionsSpec extends AnyFunSuite {
  // extensions install at session BUILD time: clear the suite-shared
  // active/default session so getOrCreate builds a fresh SparkSession
  // (reusing the JVM's SparkContext) with the extensions applied
  lazy val spark: SparkSession = {
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .withExtensions(new GraftExtensions)
      .getOrCreate()
  }
  import spark.implicits._

  test("SQL users reach every custom expression via SparkSessionExtensions") {
    val r = spark.sql(
      """SELECT hex_popcount('0xff') AS pc, hex_byte_length('0xaabb') AS hb,
        |       safe_long('0x10') AS sl,
        |       canonical_json_hash16('{"b": 1, "a": "\u00fc"}') AS h,
        |       vec_cosine(array(cast(1.0 as float), cast(0.0 as float)),
        |                  array(cast(1.0 as float), cast(0.0 as float))) AS cos,
        |       simhash64(array('a', 'b')) AS sh,
        |       minhash_signature(array('a', 'b'), 4) AS mh""".stripMargin).head()
    assert(r.getAs[Int]("pc") === 8)
    assert(r.getAs[Int]("hb") === 2)
    assert(r.getAs[Long]("sl") === 16L)
    assert(r.getAs[String]("h") === "9e638ba662cf3592")
    assert(math.abs(r.getAs[Double]("cos") - 1.0) < 1e-12)
    assert(r.getAs[Seq[Long]]("mh").length === 4)
    // word_shingles: 2-arg distinct default; 3-arg multiplicity variant
    val sh = spark.sql(
      """SELECT word_shingles('a b a b', 2) AS d,
        |       word_shingles('a b a b', 2, false) AS all""".stripMargin).head()
    assert(sh.getAs[Seq[String]]("d") === Seq("a b", "b a"))
    assert(sh.getAs[Seq[String]]("all") === Seq("a b", "b a", "a b"))
    // morton_interleave: a in even bits, b in odd
    val mz = spark.sql(
      "SELECT morton_interleave(3L, 1L) AS z, morton_interleave(0L, 1L) AS z2").head()
    assert(mz.getAs[Long]("z") === 7L && mz.getAs[Long]("z2") === 2L)
    // container-metadata families (image/audio/video) reach SQL too
    val m = spark.sql(
      """SELECT image_format(unhex('474946383961' || '2C01' || 'F000' || 'F70000')) AS gif,
        |       image_width(unhex('474946383961' || '2C01' || 'F000' || 'F70000')) AS gw,
        |       audio_format(unhex('52494646' || '24500000' || '57415645'
        |         || '666D7420' || '10000000' || '0100' || '0200'
        |         || '803E0000' || '00FA0000' || '0400' || '1000'
        |         || '64617461' || '00F40100')) AS wav,
        |       audio_duration_ms(unhex('52494646' || '24500000' || '57415645'
        |         || '666D7420' || '10000000' || '0100' || '0200'
        |         || '803E0000' || '00FA0000' || '0400' || '1000'
        |         || '64617461' || '00F40100')) AS ms,
        |       video_format(unhex('0000001066747970' || '69736F6D00000200')) AS mp4,
        |       image_format(cast('nope' as binary)) AS unk""".stripMargin).head()
    assert(m.getAs[String]("gif") === "gif" && m.getAs[Int]("gw") === 300)
    assert(m.getAs[String]("wav") === "wav")
    assert(m.getAs[Long]("ms") === 2000L) // 128000 bytes / 64000 B/s
    assert(m.getAs[String]("mp4") === "mp4")
    assert(m.getAs[String]("unk") === "unknown")
    // SQ8 quantization family: a unit basis vector encodes to one 127 code
    // and its self-dot is 127^2 exactly
    val s = spark.sql(
      """SELECT sq8_dot(
        |         sq8_encode(array(cast(1.0 as float), cast(0.0 as float))),
        |         sq8_encode(array(cast(1.0 as float), cast(0.0 as float)))) AS d,
        |       sq8_encode(array(cast(0.0 as float), cast(0.0 as float))) AS z""".stripMargin)
      .head()
    assert(s.getAs[Long]("d") === 127L * 127L)
    assert(s.getAs[Array[Byte]]("z").toSeq === Seq(0.toByte, 0.toByte))
    // kmv_min_hashes: SQL aggregate — k smallest distinct, ascending,
    // grouped like any built-in agg
    val kmv = spark.sql(
      """SELECT g, kmv_min_hashes(h, 2) AS mins FROM VALUES
        |  ('a', 30L), ('a', 10L), ('a', 20L), ('a', 10L), ('b', 5L)
        |  AS t(g, h) GROUP BY g ORDER BY g""".stripMargin).collect()
    assert(kmv(0).getAs[Seq[Long]]("mins") === Seq(10L, 20L))
    assert(kmv(1).getAs[Seq[Long]]("mins") === Seq(5L))
    // misra_gries: SQL aggregate — heavy-hitters summary, count desc
    val hh = spark.sql(
      """SELECT misra_gries(w, 4) AS hh FROM VALUES
        |  ('x'), ('x'), ('y'), ('x'), ('z'), ('y') AS t(w)""".stripMargin)
      .head().getSeq[org.apache.spark.sql.Row](0)
      .map(r => (r.getString(0), r.getLong(1)))
    assert(hh === Seq(("x", 3L), ("y", 2L), ("z", 1L)))
    // the md5-parity kernels reach SQL and agree with their formulas
    val kz = spark.sql(
      """SELECT md5_minhash_signature(array('a', 'b'), 2) AS mh,
        |       md5_simhash_hex(array('a', 'b')) AS sh,
        |       winnow_md5('a b c d e f g', 3, 4) AS fp""".stripMargin).head()
    assert(kz.getSeq[String](0).length === 2)
    assert(kz.getSeq[String](0).forall(_.matches("[0-9a-f]{32}")))
    assert(kz.getString(1).matches("[0-9a-f]{16}"))
    assert(kz.getSeq[String](2).nonEmpty &&
      kz.getSeq[String](2).forall(_.matches("[0-9a-f]{16}")))
  }

  test("range_bucket reaches SQL; bounds must be a sorted ARRAY<DOUBLE> literal") {
    val r = spark.sql(
      """SELECT range_bucket(cast(5.0 as double), array(0.0d, 1.5d, 10.0d)) AS t,
        |       range_bucket(cast(-1.0 as double), array(0.0d, 1.5d, 10.0d)) AS below,
        |       range_bucket(cast(99.0 as double), array(0.0d, 1.5d, 10.0d)) AS top""".stripMargin)
      .head()
    assert(r.getAs[Int]("t") === 1)
    assert(r.getAs[Int]("below") === -1)
    assert(r.getAs[Int]("top") === 2)
    def err(sql: String): String =
      intercept[Exception](spark.sql(sql).collect()).getMessage
    // nfc_normalize reaches SQL through the same injection
    // Spark's chr() is ASCII-mod-256 (not codepoint like DuckDB's), so
    // the decomposed input rides a \u escape instead
    val nfc = spark.sql(
      "SELECT nfc_normalize('e\u0301') AS c, length(nfc_normalize('e\u0301')) AS l")
      .head()
    assert(nfc.getString(0) === "\u00e9" && nfc.getInt(1) === 1)
    assert(err("SELECT nfc_normalize('a', 'b')").contains("exactly 1 argument"))
    assert(err("SELECT range_bucket(1.0d)").contains("exactly 2 arguments"))
    assert(err("SELECT range_bucket(v, b) FROM (SELECT 1.0d AS v, array(0.0d) AS b)")
      .contains("must be a literal"))
    assert(err("SELECT range_bucket(1.0d, array(1, 2))").contains("ARRAY<DOUBLE>"))
    // unsorted bounds rejected at plan time (expression constructor guard)
    assert(intercept[Exception](
      spark.sql("SELECT range_bucket(1.0d, array(2.0d, 1.0d))").collect())
      .getMessage.toLowerCase.contains("sorted"))
  }

  test("SQL static args: clear plan-time errors for bad word_shingles/minhash_signature calls") {
    def err(sql: String): String =
      intercept[Exception](spark.sql(sql).collect()).getMessage
    // arity
    assert(err("SELECT word_shingles('a b c')").contains("2 or 3 arguments"))
    assert(err("SELECT word_shingles('a b c', 2, false, true)").contains("2 or 3 arguments"))
    assert(err("SELECT minhash_signature(array('a'), 4, 5)").contains("exactly 2 arguments"))
    // non-literal static arg (column reference has no plan-time value)
    assert(err("SELECT word_shingles(t, w) FROM (SELECT 'a b' AS t, 2 AS w)")
      .contains("must be a literal"))
    assert(err("SELECT minhash_signature(array(t), n) FROM (SELECT 'a' AS t, 4 AS n)")
      .contains("must be a literal"))
    // wrong literal type / NULL
    assert(err("SELECT word_shingles('a b', 'two')").contains("INT literal"))
    assert(err("SELECT word_shingles('a b', 2, 1)").contains("BOOLEAN literal"))
    assert(err("SELECT minhash_signature(array('a'), cast(null as int))")
      .contains("must not be NULL"))
  }

  test("BeaconCatalog: <table> and <table>_latest views registered") {
    val base = java.nio.file.Files.createTempDirectory("graft_cat").toString
    val raw = Seq((1L, BeaconFixtures.phase0Block.replace("\"slot\": \"5\"", "\"slot\": \"1\""),
      "h", new java.sql.Timestamp(0L))).toDF("slot", "payload", "payload_hash", "retrieved_at")
    Transformer.transformChunk(spark, ChainConfig.gnosis, Loaders.blocks,
      writeTmpRaw(raw, base), s"$base/tables", LedgerStore(s"$base/p"), 0, 10, version = 1L)
    // second write at higher version to exercise latest()
    Transformer.transformChunk(spark, ChainConfig.gnosis, Loaders.blocks,
      writeTmpRaw(raw, base + "2"), s"$base/tables", LedgerStore(s"$base/p"), 0, 10, version = 2L)
    // foundation tables register as plain views (no _latest)
    Foundation.bootstrap(spark, MapFoundationFetcher(
      """{"data":{"genesis_time":"1638993340","genesis_validators_root":"0x","genesis_fork_version":"0x00000064"}}""",
      """{"data":{"SECONDS_PER_SLOT":"5","SLOTS_PER_EPOCH":"16"}}"""), base, "gnosis")
    val views = BeaconCatalog.registerViews(spark, s"$base/tables")
    assert(views.contains("blocks") && views.contains("blocks_latest"))
    assert(spark.sql("SELECT count(*) FROM blocks").head().getLong(0) === 2L)
    val latest = spark.sql("SELECT insert_version FROM blocks_latest").collect()
    assert(latest.length === 1 && latest(0).getLong(0) === 2L)
    assert(views.contains("genesis") && views.contains("specs") && views.contains("time_helpers"))
    assert(!views.contains("genesis_latest"))
    assert(spark.sql("SELECT seconds_per_slot FROM time_helpers").head().getLong(0) === 5L)
    assert(spark.sql(
      "SELECT parameter_value FROM specs WHERE parameter_name = 'SLOTS_PER_EPOCH'")
      .head().getString(0) === "16")
  }

  private def writeTmpRaw(df: org.apache.spark.sql.DataFrame, base: String): String = {
    val dir = s"$base/raw"
    df.withColumn("month", lit("2021-12"))
      .write.mode("append").partitionBy("month").parquet(dir)
    dir
  }

  test("editDistance1Pairs: complete + sound vs brute force on seeded random vocabs") {
    import spark.implicits._
    // small alphabet + short words maximize ED-1 collisions AND the
    // false-positive shared-signature cases the verify must reject
    for (seed <- Seq(1, 7, 42)) {
      val rnd = new scala.util.Random(seed)
      val vocab = Seq.fill(80)(
        (1 to (1 + rnd.nextInt(4))).map(_ => ('a' + rnd.nextInt(3)).toChar).mkString)
        .distinct
      def lev(a: String, b: String): Int = {
        val d = Array.tabulate(a.length + 1, b.length + 1)((i, j) => if (j == 0) i else if (i == 0) j else 0)
        for (i <- 1 to a.length; j <- 1 to b.length)
          d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
            d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
        d(a.length)(b.length)
      }
      val expect = (for {
        a <- vocab; b <- vocab if a < b && lev(a, b) <= 1
      } yield (a, b)).toSet
      val got = graft.operators.FuzzyJoin
        .editDistance1Pairs(vocab.toDF("w"), "w")
        .collect().map(r => (r.getString(0), r.getString(1))).toSet
      assert(got === expect, s"seed=$seed vocab=${vocab.size}")
    }
  }

  test("saltedJoin equals plain join on a hot key") {
    val skewed = (1 to 1000).map(i => (if (i % 10 == 0) 1L else i.toLong, i)).toDF("k", "v")
    val dim = Seq((1L, "hot"), (2L, "b"), (3L, "c")).toDF("k", "name")
    val plain = skewed.join(dim, Seq("k")).agg(count(lit(1)), sum("v")).head()
    val salted = Skew.saltedJoin(skewed, dim, "k", factor = 8)
      .agg(count(lit(1)), sum("v")).head()
    assert(plain === salted)
  }

  test("multi-band embedding LSH: more bands never lose pairs, only gain recall") {
    val em = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    def pairs(bands: Int) = Dedup.embeddingNearDupPairs(
      em, "vec_id", "embedding", planes = 8, seed = 42L, threshold = 0.3, bands = bands)
      .select("d1", "d2").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val one = pairs(1)
    val three = pairs(3)
    assert(one.subsetOf(three))
    assert(three.size >= one.size)
  }

  test("WordShingles kernel matches the composed transform/slice formula exactly") {
    import graft.operators.Dedup
    // the old formula, kept as the oracle
    def oldShingles(text: org.apache.spark.sql.Column, w: Int) = {
      val toks = split(lower(text), " ")
      when(size(toks) >= w,
        array_distinct(transform(
          sequence(lit(1), size(toks) - (w - 1)),
          i => concat_ws(" ", slice(toks, i, lit(w))))))
        .otherwise(array().cast("array<string>"))
    }
    val tricky = Seq(
      "The quick brown Fox jumps over the lazy dog",
      "a  b   c d", // interior empty tokens
      " leading and trailing ", // edge empties
      "tiny", "two words", "", "   ",
      "rep rep rep rep rep", // duplicate shingles collapse
      "中文 混合 tokens here 中文 混合 tokens") ++
      (1 to 50).map(i => (0 to i % 13).map(j => s"w${(i * j) % 7}").mkString(" "))
    val df = tricky.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("id", "t")
    for (w <- Seq(1, 2, 3, 5)) {
      val got = df.select(col("id"), Dedup.shingles(col("t"), w).as("s"))
        .collect().map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
      val want = df.select(col("id"), oldShingles(col("t"), w).as("s"))
        .collect().map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
      assert(got === want, s"w=$w")
    }
    // null text → [] (the formula's otherwise-branch), never NULL
    val withNull = Seq((1L, "a b c"), (2L, null)).toDF("id", "t")
    val n = withNull.select(col("id"), Dedup.shingles(col("t"), 2).as("s"))
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
    assert(n(2L) === Seq.empty)
    assert(n(1L) === Seq("a b", "b c"))
  }

  test("multi-probe LSH: superset of the single bucket, recall never drops") {
    val em = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val query = em.filter(col("vec_id") === 0).select("embedding").head().getSeq[Float](0)
    val corpus = em.filter(col("vec_id") =!= 0)
    def ids(multiProbe: Boolean) = graft.operators.Similarity
      .lshTopK(corpus, "vec_id", "embedding", query, k = 10,
        planes = 4, seed = 42L, multiProbe = multiProbe)
      .collect().map(_.getLong(0)).toSet
    val single = ids(multiProbe = false)
    val multi = ids(multiProbe = true)
    val brute = graft.operators.Similarity
      .bruteForceTopK(corpus, "vec_id", "embedding", query, 10)
      .collect().map(_.getLong(0)).toSet
    // Hamming-1 probing widens the candidate set → top-k recall vs brute
    // force can only improve (candidate superset + same exact re-rank)
    assert(multi.intersect(brute).size >= single.intersect(brute).size)
    assert(multi.intersect(brute).size >= 5, s"multi-probe recall too low: $multi vs $brute")
  }

  test("IVF ANN: nProbe=all equals brute force; nProbe=3 has usable recall") {
    val em = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val query = em.filter(col("vec_id") === 0).select("embedding").head().getSeq[Float](0)
    val corpus = em.filter(col("vec_id") =!= 0)
    val brute = graft.operators.Similarity
      .bruteForceTopK(corpus, "vec_id", "embedding", query, 10)
      .collect().map(_.getLong(0)).toSet
    val centroids = graft.operators.Similarity
      .kmeansCentroids(em, "embedding", k = 8, iters = 5, seed = 42L)
    val full = graft.operators.Similarity
      .ivfTopK(corpus, "vec_id", "embedding", query, 10, centroids, nProbe = 8)
      .collect().map(_.getLong(0)).toSet
    assert(full === brute) // probing every list == exact
    val probed = graft.operators.Similarity
      .ivfTopK(corpus, "vec_id", "embedding", query, 10, centroids, nProbe = 3)
      .collect().map(_.getLong(0)).toSet
    assert(probed.intersect(brute).size >= 5, s"recall too low: $probed vs $brute")

    // the materialized index path: identical results, partition-pruned scan
    val dir = java.nio.file.Files.createTempDirectory("graft_ivf_index").toString
    graft.operators.Similarity.writeIvfIndex(corpus, "embedding", centroids, dir)
    val indexed = graft.operators.Similarity
      .ivfTopKIndexed(spark, dir, "vec_id", "embedding", query, 10, centroids, nProbe = 3)
    assert(indexed.collect().map(_.getLong(0)).toSet === probed)
    // the probe reads ONLY the probed list_id directories — partition
    // pruning must show in the scan, not a post-scan filter
    val scan = indexed.queryExecution.executedPlan.toString
    val pf = scan.linesIterator.find(_.contains("PartitionFilters")).getOrElse("")
    assert(pf.contains("list_id"), scan.take(2000))

    // IVF-SQ8: code-materialized index, quantized prefilter + exact
    // rerank recovers the SAME probed answer (the prefilter's 40
    // candidates out of ~3 lists always contain the true top-10 here)
    val sqDir = java.nio.file.Files.createTempDirectory("graft_ivf_sq8").toString
    graft.operators.Similarity.writeIvfIndex(
      corpus, "embedding", centroids, sqDir, withSq8Codes = true)
    assert(spark.read.parquet(sqDir).columns.contains("sq8_code"))
    val sq = graft.operators.Similarity.ivfSq8TopKIndexed(
      spark, sqDir, "vec_id", "embedding", query, 10, centroids, nProbe = 3)
    assert(sq.collect().map(_.getLong(0)).toSet === probed)
    val sqScan = sq.queryExecution.executedPlan.toString
    val sqPf = sqScan.linesIterator.find(_.contains("PartitionFilters")).getOrElse("")
    assert(sqPf.contains("list_id"), sqScan.take(2000))

    // IVF-PQ: m-byte-code index, ADC prefilter + exact rerank. With
    // overfetch covering the probed lists the rerank sees every probed
    // row, so the answer must EQUAL the float probed answer
    val codebooks = graft.operators.Similarity
      .pqCodebooksResidual(em, "embedding", centroids, m = 16, ksub = 16, iters = 5, seed = 42L)
    val pqDir = java.nio.file.Files.createTempDirectory("graft_ivf_pq").toString
    graft.operators.Similarity.writeIvfIndex(
      corpus, "embedding", centroids, pqDir, pqCodebooksOpt = Some(codebooks))
    assert(spark.read.parquet(pqDir).columns.contains("pq_code"))
    val pq = graft.operators.Similarity.ivfPqTopKIndexed(
      spark, pqDir, "vec_id", "embedding", query, 10, centroids, codebooks,
      nProbe = 3, overfetch = 50)
    assert(pq.collect().map(_.getLong(0)).toSet === probed)
    val pqScan = pq.queryExecution.executedPlan.toString
    val pqPf = pqScan.linesIterator.find(_.contains("PartitionFilters")).getOrElse("")
    assert(pqPf.contains("list_id"), pqScan.take(2000))
    // tight overfetch still recovers most of the probed answer
    val pqTight = graft.operators.Similarity.ivfPqTopKIndexed(
      spark, pqDir, "vec_id", "embedding", query, 10, centroids, codebooks,
      nProbe = 3, overfetch = 4)
    assert(pqTight.collect().map(_.getLong(0)).toSet.intersect(probed).size >= 8,
      "IVF-PQ tight-overfetch recall regressed")
  }

  test("mmrSelect: duplicates are demoted, diverse candidates promoted; ids break ties") {
    import spark.implicits._
    // q = (1,0); ids 1 and 2 are the SAME vector (rel ~0.90, mutual sim 1.0);
    // id 3 mirrors it across the axis (same rel, sim ~0.62). Pure relevance
    // top-3 is [1, 2, 3] (id tiebreak); MMR must demote the duplicate:
    // pick 1 (tie -> lower id), then 3 (diverse), then 2.
    val df = Seq(
      (1L, Seq(0.9f, 0.436f)),
      (2L, Seq(0.9f, 0.436f)),
      (3L, Seq(0.9f, -0.436f))).toDF("vec_id", "embedding")
    val out = graft.operators.Similarity
      .mmrSelect(df, "vec_id", "embedding", Seq(1.0f, 0.0f),
        k = 3, poolSize = 3, lambda = 0.7, mu = 0.3)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(out.toSeq === Seq((1L, 1L), (2L, 3L), (3L, 2L)))
    // k > available pool: returns every candidate once, no crash
    val all = graft.operators.Similarity
      .mmrSelect(df, "vec_id", "embedding", Seq(1.0f, 0.0f), k = 3, poolSize = 10)
      .collect().map(_.getLong(1))
    assert(all.sorted.toSeq === Seq(1L, 2L, 3L))
  }

  test("nearDupGroups: LSH -> jaccard -> connected components finds chains") {
    // 100 distinct words: a single-word edit changes only ~3 of ~98
    // shingles -> jaccard ~0.94, well above threshold
    val base = (1 to 100).map(i => s"w$i").mkString(" ")
    val docs = Seq(
      (0L, base),                                  // group 0
      (1L, base.replace(" w50 ", " w50x ")),       // near-dup of 0
      (2L, base.replace(" w20 ", " w20x ")),       // near-dup of 0 (chain via 0)
      (3L, "completely different words " * 20),    // group 3
      (4L, "completely different words " * 20),    // exact dup of 3
      (5L, ("unrelated content here now " * 20) + "tail") // alone
    ).toDF("doc_id", "text")
    val groups = Dedup.nearDupGroups(docs, "doc_id", "text", jaccardThreshold = 0.6)
      .orderBy("doc_id").collect()
    assert(groups.map(_.getAs[Long]("group")).toSeq === Seq(0L, 0L, 0L, 3L, 3L, 5L))
    assert(groups.map(_.getAs[Boolean]("is_representative")).toSeq ===
      Seq(true, false, false, true, false, true))
  }

  test("shingles: documents shorter than the shingle width yield empty sets") {
    val docs = Seq((0L, "only two"), (1L, "a b c d e")).toDF("doc_id", "text")
    val sh = docs.select(col("doc_id"), graft.operators.Dedup.shingles(col("text"), 3).as("s"))
      .orderBy("doc_id").collect()
    assert(sh(0).getAs[Seq[String]]("s") === Seq.empty)
    assert(sh(1).getAs[Seq[String]]("s") === Seq("a b c", "b c d", "c d e"))
    // and the full pipeline survives short docs
    val pairs = graft.operators.Dedup.minhashCandidatePairs(docs, "doc_id", "text", 8, 4, 3)
    assert(pairs.count() === 0)
  }

  test("minhashCandidatePairs: empty-shingle docs never pair with each other") {
    // every below-width doc used to get the SAME degenerate signature
    // (empty-set sentinel in every hash slot) — a corpus of short docs
    // would go quadratic in the bucket self-join. They are dropped now.
    val docs = Seq(
      (0L, "one two"), (1L, "three four"), (2L, "five six"),
      (3L, "a b c d e f g"), (4L, "a b c d e f g")).toDF("doc_id", "text")
    for (parity <- Seq(false, true)) {
      val pairs = graft.operators.Dedup
        .minhashCandidatePairs(docs, "doc_id", "text", 8, 4, 3, md5Parity = parity)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(pairs === Set((3L, 4L)), s"md5Parity=$parity: $pairs")
    }
  }

  test("nearDupGroups: md5-parity hash family groups like the xxhash64 scale path") {
    // different hash families -> possibly different CANDIDATE sets, but on
    // unambiguous near-dups (jaccard >> threshold) both must confirm the
    // same groups; md5 parity exists so the driver oracle can hash-check
    // the full pipeline, xxhash64 stays the scale default.
    val base = (1 to 100).map(i => s"w$i").mkString(" ")
    val docs = Seq(
      (0L, base),
      (1L, base.replace(" w50 ", " w50x ")),
      (2L, base.replace(" w20 ", " w20x ")),
      (3L, "completely different words " * 20),
      (4L, "completely different words " * 20),
      (5L, ("unrelated content here now " * 20) + "tail")
    ).toDF("doc_id", "text")
    def groups(parity: Boolean) =
      Dedup.nearDupGroups(docs, "doc_id", "text", jaccardThreshold = 0.6, md5Parity = parity)
        .orderBy("doc_id").collect()
        .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("group"),
          r.getAs[Boolean]("is_representative"))).toSeq
    val expected = Seq((0L, 0L, true), (1L, 0L, false), (2L, 0L, false),
      (3L, 3L, true), (4L, 3L, false), (5L, 5L, true))
    assert(groups(parity = false) === expected)
    assert(groups(parity = true) === expected)
  }

  test("simhashMd5Parity: vote construction checks out against a driver-side reference") {
    import graft.operators.Similarity
    def sigOf(docs: Seq[(Long, String)]): Map[Long, String] =
      Similarity.simhashMd5Parity(docs.toDF("doc_id", "text"), "doc_id",
          graft.operators.Dedup.tokenSet(col("text")))
        .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    // single token: every bit's vote is that token's bit -> sig IS the
    // token's md5-derived 64-bit hash (chars 1-8 high, 9-16 low)
    val md5hex = java.security.MessageDigest.getInstance("MD5")
      .digest("hello".getBytes("UTF-8")).map("%02x".format(_)).mkString
    val expected = (java.lang.Long.parseLong(md5hex.substring(0, 8), 16) << 32) |
      java.lang.Long.parseLong(md5hex.substring(8, 16), 16)
    assert(sigOf(Seq((1L, "hello")))(1L) === f"$expected%016x")
    // the SimHash property: a one-word edit of a 100-word doc stays close
    // in hamming distance; an unrelated doc does not
    val base = (1 to 100).map(i => s"w$i").mkString(" ")
    val sigs = sigOf(Seq(
      (1L, base), (2L, base.replace(" w50 ", " w50x ")),
      (3L, "entirely different vocabulary here " * 25)))
    def hamming(a: String, b: String): Int =
      java.lang.Long.bitCount(
        java.lang.Long.parseUnsignedLong(a, 16) ^ java.lang.Long.parseUnsignedLong(b, 16))
    assert(hamming(sigs(1L), sigs(2L)) < hamming(sigs(1L), sigs(3L)))
    assert(hamming(sigs(1L), sigs(2L)) <= 8, s"near-dup drifted: ${hamming(sigs(1L), sigs(2L))}")
  }

  test("twoPhaseAgg (salted) equals plain groupBy for sum/count on a hot key") {
    val df = (1 to 2000).map(i => (if (i % 3 == 0) 1L else i.toLong, 1.0)).toDF("k", "v")
    val plain = df.groupBy("k")
      .agg(sum("v").as("s"), count(lit(1)).as("n"))
      .orderBy("k").collect()
    val salted = Skew.twoPhaseAgg(df, "k", "v", factor = 8,
      Seq(Skew.TwoPhase.sumOf("s"), Skew.TwoPhase.countOf("n")))
      .orderBy("k").collect()
    assert(plain.map(r => (r.getLong(0), r.getDouble(1), r.getLong(2))).toSeq ===
      salted.map(r => (r.getLong(0), r.getDouble(1), r.getLong(2))).toSeq)
  }

  test("vec_cosine rejects non-float arrays at analysis time") {
    val bad = Seq((Seq(1.0, 2.0), Seq(1.0, 2.0))).toDF("a", "b")
    val e = intercept[Exception] {
      bad.select(graft.functions.GraftFunctions.vec_cosine(col("a"), col("b"))).collect()
    }
    assert(e.getMessage.contains("array<float>") || e.getMessage.contains("DATATYPE"))
  }

  test("decodeBatched: mapPartitions batch contract, deterministic features") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select(col("doc_id"), col("text").cast("binary").as("payload"))
      .limit(100)
    val a = graft.operators.Multimodal.decodeBatched(docs, "doc_id", "payload", dim = 8)
    val b = graft.operators.Multimodal.decodeBatched(docs, "doc_id", "payload", dim = 8, batchSize = 7)
    assert(a.count() === 100)
    val fa = a.orderBy("doc_id").collect().map(_.getSeq[Float](1))
    val fb = b.orderBy("doc_id").collect().map(_.getSeq[Float](1))
    assert(fa.toSeq === fb.toSeq) // batch size never changes results
    assert(fa.head.length === 8)
    assert(fa.forall(_.forall(f => f >= -1.0f && f <= 1.0f)))
  }

  test("real PNG codec: encode→decode round-trips pixels bit-exactly; bad shapes null") {
    val rows = Seq(
      (1L, 3, 2, Seq(0xFF0000, 0x00FF00, 0x0000FF, 0x102030, 0x405060, 0x708090)),
      (2L, 2, 2, Seq(0, 0xFFFFFF, 0x123456, 0xABCDEF)),
      (3L, 3, 2, Seq(1, 2, 3)) // pixel count ≠ w*h → NULL payload
    ).toDF("id", "w", "h", "px")
    val png = graft.operators.Multimodal.encodePngBatched(rows, "id", "w", "h", "px")
    val stats = graft.operators.Multimodal.decodeImageStatsBatched(png, "id", "png")
      .orderBy("id").collect()
    // id 1: sums over the exact pixels
    assert(stats(0).getInt(1) === 3 && stats(0).getInt(2) === 2)
    assert(stats(0).getLong(3) === (0xFF + 0x10 + 0x40 + 0x70).toLong)
    assert(stats(0).getLong(4) === (0xFF + 0x20 + 0x50 + 0x80).toLong)
    assert(stats(0).getLong(5) === (0xFF + 0x30 + 0x60 + 0x90).toLong)
    assert(stats(1).getLong(3) === (0xFF + 0x12 + 0xAB).toLong)
    // id 3: crooked shape never produced an image → null stats
    assert(stats(2).isNullAt(1) && stats(2).isNullAt(3))
    // non-image bytes decode to null stats, row survives
    val junk = Seq((9L, "definitely not a png".getBytes)).toDF("id", "payload")
    val j = graft.operators.Multimodal.decodeImageStatsBatched(junk, "id", "payload").head()
    assert(j.isNullAt(1) && j.isNullAt(3))
  }

  test("aHash: mean-threshold bits from decoded pixels, hand-checked; oversize/junk null") {
    // 2×2 grays (r=g=b): 10,10,10,250 — mean 70: only pixel 3 above →
    // hash = 1<<3 = 8, n_bits = 1
    def g(v: Int) = v * 65536 + v * 256 + v
    val rows = Seq(
      (1L, 2, 2, Seq(g(10), g(10), g(10), g(250))),
      // uniform image: no pixel is STRICTLY above the mean → hash 0
      (2L, 2, 2, Seq(g(7), g(7), g(7), g(7))),
      // 9×8 = 72 px > 64-bit capacity → null hash, row survives
      (3L, 9, 8, Seq.tabulate(72)(i => g(i % 256)))
    ).toDF("id", "w", "h", "px")
    val png = graft.operators.Multimodal.encodePngBatched(rows, "id", "w", "h", "px")
    val out = graft.operators.Multimodal.decodeImageAHashBatched(png, "id", "png")
      .orderBy("id").collect()
    assert(out(0).getLong(3) === 8L && out(0).getLong(4) === 1L)
    assert(out(1).getLong(3) === 0L && out(1).getLong(4) === 0L)
    assert(out(2).isNullAt(3))
    val junk = Seq((9L, "not a png".getBytes)).toDF("id", "payload")
    val j = graft.operators.Multimodal.decodeImageAHashBatched(junk, "id", "payload").head()
    assert(j.isNullAt(1) && j.isNullAt(3))
  }

  test("multi-format sources: CSV and JSONL reads agree with the parquet truth") {
    import org.apache.spark.sql.functions._
    val base = java.nio.file.Files.createTempDirectory("graft_formats").toString
    val truth = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
      .select(col("event_id"), col("user_id"), col("event_type"), col("value"))
    truth.write.mode("overwrite").option("header", "true").csv(s"$base/csv")
    truth.write.mode("overwrite").json(s"$base/json")
    // schema declared, never inferred — the production contract (an
    // inference pass over 100 TB of text is a full extra scan)
    val schema = truth.schema
    val csv = spark.read.schema(schema).option("header", "true").csv(s"$base/csv")
    val jsonl = spark.read.schema(schema).json(s"$base/json")
    def fingerprint(df: org.apache.spark.sql.DataFrame): (Long, Long, Double) = {
      val r = df.agg(count(lit(1)), sum(col("event_id") * col("user_id")),
        sum(col("value").cast("decimal(18,2)")).cast("double")).head()
      (r.getLong(0), r.getLong(1), r.getDouble(2))
    }
    assert(fingerprint(csv) === fingerprint(truth))
    assert(fingerprint(jsonl) === fingerprint(truth))
    // and a filter pushes into both scans (PushedFilters appears)
    val p = csv.filter(col("event_id") === 5L).queryExecution.executedPlan.toString
    assert(p.contains("PushedFilters") && p.contains("event_id"), p.take(1500))
  }

  test("AQE skew join: a hot key splits at runtime (skew=true), result parity with broadcast") {
    import org.apache.spark.sql.functions._
    // independent SQL conf over the shared context: force a sort-merge
    // join and make AQE's skew thresholds reachable at test size
    val s2 = spark.newSession()
    s2.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    // AQE would otherwise CONVERT the SMJ to broadcast at runtime (the
    // 100-row side) and never reach the skew logic — pin both paths off
    s2.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
    s2.conf.set("spark.sql.adaptive.enabled", "true")
    s2.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
    s2.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2.0")
    s2.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "262144")
    s2.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "65536")
    s2.conf.set("spark.sql.shuffle.partitions", "8")
    // 400k fact rows, 85% on ONE key — the t14 salting scenario, this
    // time handled by the engine's runtime re-plan instead of a rewrite
    val left = s2.range(400000)
      .select(when(col("id") % 100 < 85, 0L).otherwise(col("id") % 100).as("k"),
        concat(lit("pad_pad_pad_pad_pad_"), col("id")).as("payload"))
    val right = s2.range(100).select(col("id").as("k"), (col("id") * 7).as("dim"))
    val joined = left.join(right, "k")
    // execute THIS dataset's own QueryExecution (count() would spawn a
    // separate one and leave this plan isFinalPlan=false)
    var n = 0L
    val it = joined.toLocalIterator()
    while (it.hasNext) { it.next(); n += 1 }
    assert(n === 400000L)
    val plan = joined.queryExecution.executedPlan.toString
    assert(plan.contains("skew=true"),
      s"AQE did not split the hot partition:\n${plan.take(2500)}")
    // value parity against the broadcast plan on the default session
    val expect = left.join(org.apache.spark.sql.functions.broadcast(right), "k")
      .agg(sum(col("dim"))).head().getLong(0)
    assert(joined.agg(sum(col("dim"))).head().getLong(0) === expect)
  }

  test("madOutliers: hand-checked discrete median/MAD; shift invariance") {
    import spark.implicits._
    // {1..9, 100}: disc-median 5, deviations sorted {0,1,1,2,2,3,3,4,4,95}
    // → MAD 2; only the 100 exceeds |x−5| > 3·2
    val df = ((1 to 9).map(_.toDouble) :+ 100.0).map(("k", _)).toDF("k", "v")
    val r = graft.operators.Percentiles.madOutliers(df, "k", "v").head()
    assert(r.getAs[Long]("n") === 10L)
    assert(r.getAs[Double]("med") === 5.0)
    assert(r.getAs[Double]("mad") === 2.0)
    assert(r.getAs[Long]("n_outliers") === 1L)
    // adding a constant shifts the median, never the MAD or the verdicts
    val shifted = graft.operators.Percentiles
      .madOutliers(df.withColumn("v", $"v" + 1000.0), "k", "v").head()
    assert(shifted.getAs[Double]("med") === 1005.0)
    assert(shifted.getAs[Double]("mad") === 2.0)
    assert(shifted.getAs[Long]("n_outliers") === 1L)
  }

  test("winsorize: clamp counts and bounds hand-checked; clamped data re-winsorizes as a no-op") {
    import spark.implicits._
    val df = (1 to 100).map(i => ("k", i.toDouble)).toDF("k", "v")
    val w = graft.operators.Percentiles.winsorize(df, "k", "v", 10, 90)
    // discrete p10 = 10, p90 = 90 on 1..100
    assert(w.agg(min("v_w"), max("v_w")).head() === org.apache.spark.sql.Row(10.0, 90.0))
    assert(w.filter($"clamped" === -1).count() === 9L)  // 1..9
    assert(w.filter($"clamped" === 1).count() === 10L)  // 91..100
    // idempotence: winsorizing the already-clamped column clamps nothing
    val again = graft.operators.Percentiles
      .winsorize(w.select($"k", $"v_w".as("v")), "k", "v", 10, 90)
    assert(again.filter($"clamped" =!= 0).count() === 0L)
    assert(again.filter($"v" =!= $"v_w").count() === 0L)
  }

  test("chiSquaredShift: identical corpora → zero everywhere; disjoint vocab → mass on both sides") {
    import spark.implicits._
    val a = Seq("alpha beta gamma", "alpha beta").toDF("text")
    val same = graft.operators.Importance.chiSquaredShift(a, a, "text", buckets = 16)
    assert(same.count() === 16L)
    assert(same.agg(sum("contrib")).head().getDouble(0) === 0.0)
    val b = Seq("delta epsilon", "delta zeta").toDF("text")
    val diff = graft.operators.Importance.chiSquaredShift(a, b, "text", buckets = 16)
    // some bucket must light up, and every contribution is a valid fraction
    assert(diff.agg(max("contrib")).head().getDouble(0) > 0.0)
    assert(diff.filter($"contrib" < 0.0 || $"contrib" > 1.0).count() === 0L)
  }

  test("real JPEG codec: dims exact, smooth-content pixels within lossy tolerance") {
    // a smooth horizontal gradient (JPEG's best case) on a 16×8 canvas:
    // dims must survive exactly; per-channel MEAN error stays small
    val w0 = 16; val h0 = 8
    val px = Seq.tabulate(w0 * h0) { i =>
      val v = (i % w0) * 16 // 0..240 gradient, same in all channels
      v * 65536 + v * 256 + v
    }
    val rows = Seq((1L, w0, h0, px)).toDF("id", "w", "h", "px")
    val jpg = graft.operators.Multimodal
      .encodeImageBatched(rows, "id", "w", "h", "px", format = "jpg", outCol = "img")
    // payload really is JFIF/JPEG, not a re-labeled PNG
    val bytes = jpg.head().getAs[Array[Byte]]("img")
    assert((bytes(0) & 0xFF) === 0xFF && (bytes(1) & 0xFF) === 0xD8, "missing SOI marker")
    val st = graft.operators.Multimodal.decodeImageStatsBatched(jpg, "id", "img").head()
    assert(st.getInt(1) === w0 && st.getInt(2) === h0)
    val exact = px.map(p => (p >> 16) & 0xFF).map(_.toLong).sum
    val meanErr = math.abs(st.getLong(3) - exact).toDouble / (w0 * h0)
    assert(meanErr < 8.0, s"mean per-pixel error $meanErr too large for smooth content")
  }

  test("real WAV codec: PCM round-trips through AudioSystem; format fields parsed") {
    val rows = Seq(
      (1L, Seq(0, 1000, -1000, 32767, -32768, 5)),
      (2L, Seq.empty[Int])
    ).toDF("id", "smp")
    val wav = graft.operators.Multimodal.encodeWavPcm16Batched(rows, "id", "smp", 8000, 1)
    val stats = graft.operators.Multimodal.decodeWavStatsBatched(wav, "id", "wav")
      .orderBy("id").collect()
    assert(stats(0).getInt(1) === 1 && stats(0).getInt(2) === 8000)
    assert(stats(0).getLong(3) === 6L)
    assert(stats(0).getLong(4) === (0L + 1000 - 1000 + 32767 - 32768 + 5))
    assert(stats(1).getLong(3) === 0L && stats(1).getLong(4) === 0L)
    // stereo: frame count halves, channels parsed
    val st = Seq((3L, Seq(10, 20, 30, 40))).toDF("id", "smp")
    val s2 = graft.operators.Multimodal.decodeWavStatsBatched(
      graft.operators.Multimodal.encodeWavPcm16Batched(st, "id", "smp", 44100, 2),
      "id", "wav").head()
    assert(s2.getInt(1) === 2 && s2.getInt(2) === 44100)
    assert(s2.getLong(3) === 2L && s2.getLong(4) === 100L)
    // junk bytes → null stats
    val junk = Seq((9L, "not audio".getBytes)).toDF("id", "payload")
    val j = graft.operators.Multimodal.decodeWavStatsBatched(junk, "id", "payload").head()
    assert(j.isNullAt(1) && j.isNullAt(3))
  }

  test("decodeImageResizeBatched strict mode: garbage bytes and odd dims null out, not crash") {
    // 3 rows through factor=2: a valid 4×2 PNG, garbage bytes, and a 3×3
    // image whose dims don't divide — the latter two must produce the
    // documented all-null row (7 fields!) instead of an encoder failure
    val px4x2 = Seq.tabulate(8)(i => i * 0x010101) // gray ramp
    val good = Seq((1L, 4, 2, px4x2)).toDF("id", "w", "h", "px")
    val png = graft.operators.Multimodal
      .encodeImageBatched(good, "id", "w", "h", "px", format = "png", outCol = "img")
    val odd = Seq((2L, 3, 3, Seq.fill(9)(0xFFFFFF))).toDF("id", "w", "h", "px")
    val oddPng = graft.operators.Multimodal
      .encodeImageBatched(odd, "id", "w", "h", "px", format = "png", outCol = "img")
    val garbage = Seq((3L, "definitely not an image".getBytes)).toDF("id", "img")
    val all = png.union(oddPng).union(garbage)
    val out = graft.operators.Multimodal
      .decodeImageResizeBatched(all, "id", "img", factor = 2)
      .orderBy("id").collect()
    assert(out.length === 3)
    // good row: 4×2 → 2×1, gray_total = Σ 3·ramp
    assert(out(0).getInt(1) === 4 && out(0).getInt(2) === 2)
    assert(out(0).getInt(3) === 2 && out(0).getInt(4) === 1)
    assert(out(0).getLong(5) === px4x2.map(p => 3L * (p & 0xFF)).sum)
    // odd-dim and garbage rows: every stat field null, row survives
    for (i <- Seq(1, 2); f <- 1 to 6) assert(out(i).isNullAt(f),
      s"row $i field $f should be null in strict mode")
  }

  test("encodeImageBatched: unregistered format → null payload, not empty bytes") {
    val rows = Seq((1L, 2, 2, Seq(0, 0, 0, 0))).toDF("id", "w", "h", "px")
    val out = graft.operators.Multimodal
      .encodeImageBatched(rows, "id", "w", "h", "px",
        format = "no_such_format", outCol = "img").head()
    assert(out.isNullAt(1), "unsupported format must yield NULL, not a 0-byte payload")
  }

  test("countMin positions bounds: mismatched depth/width fails loud, not corrupt") {
    import graft.operators.Sketches
    // positions built for depth=2,width=8 fed to an aggregate expecting
    // depth=4 (too few) — must throw with a shape message, not AIOOBE
    val df = Seq("a", "b").toDF("t")
      .withColumn("pos", Sketches.cmPositions(col("t"), 2, 8))
    val err = intercept[Exception] {
      df.agg(Sketches.countMinCounters(col("pos"), 4, 8)).collect()
    }
    assert(err.getMessage != null)
    // width mismatch: positions in [0,1024) against a width-8 table
    val wide = Seq("a", "b").toDF("t")
      .withColumn("pos", Sketches.cmPositions(col("t"), 2, 1024))
    val err2 = intercept[Exception] {
      wide.agg(Sketches.countMinCounters(col("pos"), 2, 8)).collect()
    }
    assert(err2.getMessage != null)
  }

  test("metrics: accumulators track fetch/ingest/transform") {
    val base = java.nio.file.Files.createTempDirectory("graft_m").toString
    val fetcher = MapSlotFetcher((0L until 10L).collect {
      case s if s % 2 == 0 => s -> BeaconFixtures.phase0Block
    }.toMap)
    RawIngest.ingestChunk(spark, ChainConfig.gnosis, fetcher, s"$base/raw",
      LedgerStore(s"$base/l"), "blocks", 0, 9)
    val m = graft.core.Metrics.report(spark)
    assert(m("api_fetched") >= 5L)
    assert(m("api_empty404") >= 5L)
    assert(m("chunks_completed") >= 1L)
  }
}
