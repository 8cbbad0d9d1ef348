package graft.functions

import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Real container-metadata extraction over opaque image payloads — no
  * codec library required: PNG stores width/height at fixed big-endian
  * offsets in the IHDR chunk (bytes 16–23 after the 8-byte signature +
  * 8-byte chunk header) and GIF stores the logical-screen size as two
  * little-endian uint16s at bytes 6–9. This replaces the multimodal
  * DECODE stub for the metadata step: scan-side, codegen'd, zero
  * dependencies — the shape a 100 TB image-corpus profile pass needs
  * (pixel decoding proper remains behind the batched-codec contract in
  * [[graft.operators.Multimodal.decodeBatched]]).
  */
object ImageMetaUtil {
  private def u(b: Array[Byte], i: Int): Int = b(i) & 0xff

  def isPng(b: Array[Byte]): Boolean =
    b.length >= 24 &&
      u(b, 0) == 0x89 && b(1) == 'P' && b(2) == 'N' && b(3) == 'G' &&
      u(b, 4) == 0x0d && u(b, 5) == 0x0a && u(b, 6) == 0x1a && u(b, 7) == 0x0a &&
      b(12) == 'I' && b(13) == 'H' && b(14) == 'D' && b(15) == 'R'

  def isGif(b: Array[Byte]): Boolean =
    b.length >= 10 &&
      b(0) == 'G' && b(1) == 'I' && b(2) == 'F' && b(3) == '8' &&
      (b(4) == '7' || b(4) == '9') && b(5) == 'a'

  def isJpeg(b: Array[Byte]): Boolean =
    b.length >= 4 && u(b, 0) == 0xff && u(b, 1) == 0xd8

  /** JPEG stores dimensions inside a Start-Of-Frame segment at a VARIABLE
    * offset — walk the marker segments (each `FF mm` + big-endian length)
    * until SOFn (C0–CF except the DHT/JPG/DAC pseudo-markers C4/C8/CC):
    * height u16 BE at +5, width at +7. (-1, -1) on malformed streams,
    * entropy-coded data, or EOI before any SOF. */
  private def jpegDims(b: Array[Byte]): (Int, Int) = {
    var i = 2
    while (i + 3 < b.length) {
      if (u(b, i) != 0xff) return (-1, -1)
      val m = u(b, i + 1)
      // standalone markers carry no length: padding/TEM/RSTn
      if (m == 0xff || m == 0x01 || (m >= 0xd0 && m <= 0xd7)) i += 2
      else if (m == 0xd9 || m == 0xda) return (-1, -1) // EOI / scan data before SOF
      else {
        val len = (u(b, i + 2) << 8) | u(b, i + 3)
        if (len < 2) return (-1, -1)
        if (m >= 0xc0 && m <= 0xcf && m != 0xc4 && m != 0xc8 && m != 0xcc) {
          if (i + 8 >= b.length) return (-1, -1)
          return (((u(b, i + 7) << 8) | u(b, i + 8), (u(b, i + 5) << 8) | u(b, i + 6)))
        }
        i += 2 + len
      }
    }
    (-1, -1)
  }

  private def be32(b: Array[Byte], o: Int): Int =
    (u(b, o) << 24) | (u(b, o + 1) << 16) | (u(b, o + 2) << 8) | u(b, o + 3)

  private def le16(b: Array[Byte], o: Int): Int = u(b, o) | (u(b, o + 1) << 8)

  private val PNG = UTF8String.fromString("png")
  private val GIF = UTF8String.fromString("gif")
  private val JPEG = UTF8String.fromString("jpeg")
  private val UNKNOWN = UTF8String.fromString("unknown")

  def format(b: Array[Byte]): UTF8String =
    if (isPng(b)) PNG else if (isGif(b)) GIF
    else if (isJpeg(b)) JPEG else UNKNOWN

  /** −1 = not a recognized container (mapped to NULL at the Column API). */
  def width(b: Array[Byte]): Int =
    if (isPng(b)) be32(b, 16) else if (isGif(b)) le16(b, 6)
    else if (isJpeg(b)) jpegDims(b)._1 else -1

  def height(b: Array[Byte]): Int =
    if (isPng(b)) be32(b, 20) else if (isGif(b)) le16(b, 8)
    else if (isJpeg(b)) jpegDims(b)._2 else -1
}

/** Container format of a binary image payload: 'png' | 'gif' | 'unknown'. */
case class ImageFormat(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StringType
  override protected def nullSafeEval(v: Any): Any =
    ImageMetaUtil.format(v.asInstanceOf[Array[Byte]])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.ImageMetaUtil.format($c)")
  override protected def withNewChildInternal(c: Expression): ImageFormat = copy(c)
  override def prettyName: String = "image_format"
}

/** Pixel width from PNG IHDR / GIF logical screen; −1 if unrecognized. */
case class ImageWidth(child: Expression) extends UnaryExpression {
  override def dataType: DataType = IntegerType
  override protected def nullSafeEval(v: Any): Any =
    ImageMetaUtil.width(v.asInstanceOf[Array[Byte]])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.ImageMetaUtil.width($c)")
  override protected def withNewChildInternal(c: Expression): ImageWidth = copy(c)
  override def prettyName: String = "image_width"
}

/** Pixel height from PNG IHDR / GIF logical screen; −1 if unrecognized. */
case class ImageHeight(child: Expression) extends UnaryExpression {
  override def dataType: DataType = IntegerType
  override protected def nullSafeEval(v: Any): Any =
    ImageMetaUtil.height(v.asInstanceOf[Array[Byte]])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.ImageMetaUtil.height($c)")
  override protected def withNewChildInternal(c: Expression): ImageHeight = copy(c)
  override def prettyName: String = "image_height"
}
