package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Animated-GIF video plumbing ([[graft.operators.Multimodal
  * .encodeGifAnimatedBatched]] / [[decodeGifFramesBatched]]): per-pixel
  * exact round-trip through the real `javax.imageio` sequence codec,
  * including the SMALL-IMAGE regression (the JDK's default interlaced
  * writing mis-decodes heights < 5 — the encoder pins interlace off) and
  * the strict-mode null contract. */
class GifFramesSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  test("multi-frame roundtrip: exact gray values per frame, small heights included") {
    import spark.implicits._
    // heights 2 and 4 are the interlace-bug regression sizes
    val shapes = Seq((1L, 4, 2, 3), (2L, 9, 4, 2), (3L, 16, 8, 1), (4L, 5, 13, 4))
    val rows = shapes.map { case (id, w, h, nf) =>
      (id, w, h, (0 until nf).map(f => (0 until w * h).map(i => (id.toInt * 7 + f * 11 + i * 13) % 256)))
    }.toDF("id", "w", "h", "frames")
    val gif = graft.operators.Multimodal
      .encodeGifAnimatedBatched(rows, "id", "w", "h", "frames")
    val out = graft.operators.Multimodal
      .decodeGifFramesBatched(gif, "id", "gif")
      .orderBy("id", "frame_idx").collect()
    val expected = shapes.flatMap { case (id, w, h, nf) =>
      (0 until nf).map { f =>
        (id, f, w, h,
          (0 until w * h).map(i => ((id.toInt * 7 + f * 11 + i * 13) % 256).toLong).sum)
      }
    }
    assert(out.length === expected.length)
    out.zip(expected).foreach { case (r, (id, f, w, h, sum)) =>
      assert(r.getLong(0) === id)
      assert(r.getInt(1) === f)
      assert(r.getInt(2) === w && r.getInt(3) === h)
      assert(r.getLong(4) === sum, s"gray_sum for id=$id frame=$f")
    }
  }

  test("strict mode: garbage bytes, shape mismatch, out-of-range samples → null rows") {
    import spark.implicits._
    val bad = Seq(
      (1L, 2, 2, Seq(Seq(0, 1, 2))),        // 3 px for a 2x2 frame
      (2L, 2, 2, Seq(Seq(0, 1, 2, 999))),   // sample out of 0..255
      (3L, 2, 2, Seq.empty[Seq[Int]])       // no frames
    ).toDF("id", "w", "h", "frames")
    val enc = graft.operators.Multimodal
      .encodeGifAnimatedBatched(bad, "id", "w", "h", "frames").collect()
    enc.foreach(r => assert(r.isNullAt(1), s"id=${r.getLong(0)} should be NULL"))
    val junk = Seq((9L, "not a gif".getBytes)).toDF("id", "gif")
    val dec = graft.operators.Multimodal
      .decodeGifFramesBatched(junk, "id", "gif").collect()
    assert(dec.length === 1)
    (1 to 4).foreach(f => assert(dec(0).isNullAt(f)))
  }
}
