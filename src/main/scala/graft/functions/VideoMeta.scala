package graft.functions

import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Video-container metadata over opaque `binary` payloads — the MP4
  * (ISO-BMFF) member of the [[ImageMetaUtil]]/[[AudioMetaUtil]] family.
  * An MP4 is a tree of length-prefixed boxes (`size` u32 BE + 4cc type);
  * presentation duration lives in `moov.mvhd` (timescale u32 +
  * duration u32/u64 by version) and the first track's pixel dimensions in
  * `moov.trak.tkhd` as 16.16 fixed-point u32s at the end of the box. The
  * walker steps sibling boxes at each level (any box order, unknown boxes
  * skipped by their declared size), so files with `free`/`udta` boxes
  * ahead of the ones we need still parse. 64-bit (`size == 1`) and
  * to-end-of-file (`size == 0`) boxes stop the walk — profile passes see
  * header-early files where `moov` precedes the media data. */
object VideoMetaUtil {
  private def u(b: Array[Byte], i: Int): Int = b(i) & 0xff
  private def be32(b: Array[Byte], o: Int): Long =
    (u(b, o).toLong << 24) | (u(b, o + 1).toLong << 16) |
      (u(b, o + 2).toLong << 8) | u(b, o + 3).toLong

  def isMp4(b: Array[Byte]): Boolean =
    b.length >= 12 && b(4) == 'f' && b(5) == 't' && b(6) == 'y' && b(7) == 'p'

  /** (payloadStart, boxEnd) of the first box typed `t` among the siblings
    * in [from, to); (-1, -1) when absent or malformed. */
  private def box(b: Array[Byte], from: Int, to: Int, t: String): (Int, Int) = {
    var i = from
    while (i + 8 <= to) {
      val size = be32(b, i)
      if (size < 8 || i + size > to) return (-1, -1) // 0/1 sizes unsupported
      if (b(i + 4) == t.charAt(0) && b(i + 5) == t.charAt(1) &&
          b(i + 6) == t.charAt(2) && b(i + 7) == t.charAt(3))
        return (i + 8, (i + size).toInt)
      i = (i + size).toInt
    }
    (-1, -1)
  }

  /** mvhd duration in whole milliseconds; −1 when absent/unsupported. */
  def durationMs(b: Array[Byte]): Long = {
    if (!isMp4(b)) return -1L
    val (moov, moovEnd) = box(b, 0, b.length, "moov")
    if (moov < 0) return -1L
    val (mvhd, mvhdEnd) = box(b, moov, moovEnd, "mvhd")
    if (mvhd < 0) return -1L
    val version = u(b, mvhd)
    if (version == 0) {
      if (mvhd + 20 > mvhdEnd) return -1L
      val timescale = be32(b, mvhd + 12)
      val duration = be32(b, mvhd + 16)
      if (timescale <= 0) -1L else duration * 1000L / timescale
    } else if (version == 1) {
      if (mvhd + 32 > mvhdEnd) return -1L
      val timescale = be32(b, mvhd + 20)
      val duration = (be32(b, mvhd + 24) << 32) | be32(b, mvhd + 28)
      if (timescale <= 0) -1L else duration * 1000L / timescale
    } else -1L
  }

  /** First track's pixel width/height (tkhd 16.16 fixed point, integer
    * part); −1 when absent/unsupported. */
  private def tkhdDim(b: Array[Byte], heightNotWidth: Boolean): Int = {
    if (!isMp4(b)) return -1
    val (moov, moovEnd) = box(b, 0, b.length, "moov")
    if (moov < 0) return -1
    val (trak, trakEnd) = box(b, moov, moovEnd, "trak")
    if (trak < 0) return -1
    val (tkhd, tkhdEnd) = box(b, trak, trakEnd, "tkhd")
    if (tkhd < 0) return -1
    val base = u(b, tkhd) match {
      case 0 => tkhd + 76
      case 1 => tkhd + 88
      case _ => return -1
    }
    val o = if (heightNotWidth) base + 4 else base
    if (o + 4 > tkhdEnd) return -1
    (be32(b, o) >> 16).toInt // integer part of 16.16
  }

  def width(b: Array[Byte]): Int = tkhdDim(b, heightNotWidth = false)
  def height(b: Array[Byte]): Int = tkhdDim(b, heightNotWidth = true)

  private val MP4 = UTF8String.fromString("mp4")
  private val UNKNOWN = UTF8String.fromString("unknown")

  def format(b: Array[Byte]): UTF8String = if (isMp4(b)) MP4 else UNKNOWN
}

/** Container format of a binary video payload: 'mp4' | 'unknown'. */
case class VideoFormat(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StringType
  override protected def nullSafeEval(v: Any): Any =
    VideoMetaUtil.format(v.asInstanceOf[Array[Byte]])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.VideoMetaUtil.format($c)")
  override protected def withNewChildInternal(c: Expression): VideoFormat = copy(c)
  override def prettyName: String = "video_format"
}

/** mvhd presentation duration in whole ms; −1 if unknown. */
case class VideoDurationMs(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override protected def nullSafeEval(v: Any): Any =
    VideoMetaUtil.durationMs(v.asInstanceOf[Array[Byte]])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.VideoMetaUtil.durationMs($c)")
  override protected def withNewChildInternal(c: Expression): VideoDurationMs = copy(c)
  override def prettyName: String = "video_duration_ms"
}

/** First track's tkhd pixel width; −1 if unknown. */
case class VideoWidth(child: Expression) extends UnaryExpression {
  override def dataType: DataType = IntegerType
  override protected def nullSafeEval(v: Any): Any =
    VideoMetaUtil.width(v.asInstanceOf[Array[Byte]])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.VideoMetaUtil.width($c)")
  override protected def withNewChildInternal(c: Expression): VideoWidth = copy(c)
  override def prettyName: String = "video_width"
}

/** First track's tkhd pixel height; −1 if unknown. */
case class VideoHeight(child: Expression) extends UnaryExpression {
  override def dataType: DataType = IntegerType
  override protected def nullSafeEval(v: Any): Any =
    VideoMetaUtil.height(v.asInstanceOf[Array[Byte]])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.VideoMetaUtil.height($c)")
  override protected def withNewChildInternal(c: Expression): VideoHeight = copy(c)
  override def prettyName: String = "video_height"
}
