package graft

import graft.operators.{Classifier, Dedup}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Unit coverage for the round-7 additions: the hashed-linear quality
  * classifier ([[graft.operators.Classifier]]) and the sub-document
  * chunk-level exact dedup ([[graft.operators.Dedup.chunkDedup]]).
  */
class ClassifierChunkSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkTestSession.spark
  import spark.implicits._

  // --- Classifier -------------------------------------------------------

  test("Classifier.scored: score is the mean of per-token weights") {
    val df = Seq((1L, "alpha beta gamma")).toDF("id", "text")
    val row = Classifier.scored(df, "id", "text").collect().head
    assert(row.getAs[Long]("n_tokens") === 3L)
    // independent recomputation: weight(t) = h(t)/2^31 - 1, score = mean
    val hs = Seq("alpha", "beta", "gamma").map { t =>
      val md5 = java.security.MessageDigest.getInstance("MD5")
        .digest(s"w#$t".getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
      java.lang.Long.parseLong(md5.take(8), 16)
    }
    assert(row.getAs[Long]("hash_sum") === hs.sum)
    val expected = hs.sum.toDouble / (3L * 2.147483648e9) - 1
    assert(row.getAs[Double]("score") === expected)
    assert(row.getAs[Boolean]("keep") === (expected > 0.0))
  }

  test("Classifier.scored: empty text → NULL score, keep=false") {
    val df = Seq((1L, ""), (2L, "   \t ")).toDF("id", "text")
    val rows = Classifier.scored(df, "id", "text").collect()
    rows.foreach { r =>
      assert(r.getAs[Long]("n_tokens") === 0L)
      assert(r.isNullAt(r.fieldIndex("score")))
      assert(r.getAs[Boolean]("keep") === false)
    }
  }

  test("Classifier.filtered: inline gate equals scored().filter(keep)") {
    val docs = (1L to 200L).map(i => (i, s"tok$i " * (i % 7 + 1).toInt)).toDF("id", "text")
    val viaScored = Classifier.scored(docs, "id", "text")
      .filter(col("keep")).select("id").as[Long].collect().sorted
    val viaFiltered = Classifier.filtered(docs, "text")
      .select("id").as[Long].collect().sorted
    assert(viaFiltered === viaScored)
    assert(viaScored.nonEmpty && viaScored.length < 200,
      "hashed weights should split the corpus, not pass/reject everything")
  }

  // --- Chunk-level dedup ------------------------------------------------

  test("docChunks: non-overlapping chunks in order, short tail kept") {
    val df = Seq((1L, "a b c d e f g")).toDF("id", "text")
    val ch = Dedup.docChunks(df, "id", "text", chunkTokens = 3)
      .orderBy("chunk_idx").collect()
    assert(ch.map(_.getAs[String]("chunk")).toSeq === Seq("a b c", "d e f", "g"))
    assert(ch.map(_.getAs[Int]("chunk_idx")).toSeq === Seq(0, 1, 2))
  }

  test("docChunks: empty document yields no rows") {
    val df = Seq((1L, ""), (2L, "x y")).toDF("id", "text")
    val ch = Dedup.docChunks(df, "id", "text", chunkTokens = 2)
    assert(ch.select("id").as[Long].collect().toSeq === Seq(2L))
  }

  test("chunkDedup: repeated chunk survives only at its first occurrence") {
    // doc 1 and doc 2 share the chunk "x y"; doc 2 keeps its unique tail
    val df = Seq(
      (1L, "x y a b"),
      (2L, "x y c d"),
      (3L, "e f")).toDF("id", "text")
    val out = Dedup.chunkDedup(df, "id", "text", chunkTokens = 2)
      .orderBy("id").collect()
    assert(out.map(_.getAs[String]("text_dedup")).toSeq ===
      Seq("x y a b", "c d", "e f"))
    assert(out.map(_.getAs[Long]("n_chunks")).toSeq === Seq(2L, 2L, 1L))
    assert(out.map(_.getAs[Long]("n_kept")).toSeq === Seq(2L, 1L, 1L))
  }

  test("chunkDedup: fully-duplicated document → NULL text_dedup") {
    val df = Seq((1L, "p q"), (2L, "p q")).toDF("id", "text")
    val out = Dedup.chunkDedup(df, "id", "text", chunkTokens = 2)
      .orderBy("id").collect()
    assert(out(0).getAs[String]("text_dedup") === "p q")
    assert(out(1).isNullAt(out(1).fieldIndex("text_dedup")))
    assert(out(1).getAs[Long]("n_kept") === 0L)
  }

  test("groupCentroids: per-group mean vectors, 2^-20 fixed-point exactness") {
    val df = Seq(
      (0, Seq(1.0f, 0.0f)), (0, Seq(3.0f, 1.0f)),
      (1, Seq(-2.0f, 4.0f))).toDF("label", "embedding")
    val out = graft.operators.Similarity.groupCentroids(df, "label", "embedding")
      .orderBy("label").collect()
    // integers are exact under the 2^20 quantization: means are exact
    assert(out(0).getAs[Seq[Double]]("centroid") === Seq(2.0, 0.5))
    assert(out(0).getAs[Long]("n_vectors") === 2L)
    assert(out(1).getAs[Seq[Double]]("centroid") === Seq(-2.0, 4.0))
    // non-dyadic components quantize with bias < 2^-20
    val q = Seq((0, Seq(0.1f)), (0, Seq(0.2f))).toDF("label", "embedding")
    val m = graft.operators.Similarity.groupCentroids(q, "label", "embedding")
      .collect().head.getAs[Seq[Double]]("centroid").head
    assert(math.abs(m - 0.15) < 1e-5 && m != 0.15)
  }

  test("winnowOverlapPairs: planted copied passage found; boilerplate ceiling holds") {
    // docs 1/2 share an 8-token run (≥ w+k−1 = 6 → ≥1 shared fingerprint
    // guaranteed; 8 tokens give ≥2); docs 3..12 share only a boilerplate
    // sentence that the DF ceiling must drop
    val passage = "the quick brown fox jumps over lazy dogs"
    val boiler = "standard legal disclaimer text appears here verbatim always"
    val rows =
      Seq(
        (1L, s"alpha one two $passage tail1 end1"),
        (2L, s"beta three four $passage tail2 end2")) ++
        (3L to 12L).map(i => (i, s"unique${i}a unique${i}b $boiler unique${i}c"))
    val df = rows.toDF("doc_id", "text")
    val pairs = graft.operators.TextAnalysis
      .winnowOverlapPairs(df, "doc_id", "text", k = 3, w = 4,
        minShared = 2L, maxDf = 5L)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs === Set((1L, 2L)),
      s"only the copied-passage pair should survive the DF ceiling, got $pairs")
  }

  test("nearestCentroidLabels: planted mislabeled vector is flagged") {
    // label 0 clusters near (1,0), label 1 near (0,1); vec 99 carries
    // label 0 but sits in label 1's cluster → is_noise
    val rows = (0L until 20L).map(i =>
      (i, 0, Seq(1.0f + (i % 5) * 0.01f, 0.02f * (i % 3)))) ++
      (20L until 40L).map(i =>
        (i, 1, Seq(0.02f * (i % 3), 1.0f + (i % 5) * 0.01f))) ++
      Seq((99L, 0, Seq(0.0f, 1.0f)))
    val df = rows.toDF("vec_id", "label", "embedding")
    val out = graft.operators.Similarity
      .nearestCentroidLabels(df, "vec_id", "label", "embedding")
      .collect().map(r => r.getAs[Long]("vec_id") ->
        (r.getAs[Int]("pred_label"), r.getAs[Boolean]("is_noise"))).toMap
    assert(out(99L) === ((1, true)), s"planted noise not flagged: ${out(99L)}")
    assert(out.count { case (id, (_, noise)) => id != 99L && noise } === 0,
      "clean vectors misflagged")
  }

  test("chunkDedup: intra-document repetition is also deduplicated") {
    val df = Seq((1L, "r s r s t u")).toDF("id", "text")
    val out = Dedup.chunkDedup(df, "id", "text", chunkTokens = 2).collect().head
    assert(out.getAs[String]("text_dedup") === "r s t u")
    assert(out.getAs[Long]("n_chunks") === 3L)
    assert(out.getAs[Long]("n_kept") === 2L)
  }
}
