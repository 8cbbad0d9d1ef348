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

  private def be32(b: Array[Byte], o: Int): Int =
    (u(b, o) << 24) | (u(b, o + 1) << 16) | (u(b, o + 2) << 8) | u(b, o + 3)

  private def le16(b: Array[Byte], o: Int): Int = u(b, o) | (u(b, o + 1) << 8)

  private val PNG = UTF8String.fromString("png")
  private val GIF = UTF8String.fromString("gif")
  private val UNKNOWN = UTF8String.fromString("unknown")

  def format(b: Array[Byte]): UTF8String =
    if (isPng(b)) PNG else if (isGif(b)) GIF else UNKNOWN

  /** −1 = not a recognized container (mapped to NULL at the Column API). */
  def width(b: Array[Byte]): Int =
    if (isPng(b)) be32(b, 16) else if (isGif(b)) le16(b, 6) else -1

  def height(b: Array[Byte]): Int =
    if (isPng(b)) be32(b, 20) else if (isGif(b)) le16(b, 8) else -1
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
