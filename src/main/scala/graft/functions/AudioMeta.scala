package graft.functions

import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Audio-container metadata over opaque `binary` payloads, no codec
  * library required — the audio counterpart of [[ImageMetaUtil]]: WAV
  * (RIFF) stores its format description in a `fmt ` chunk (channels
  * little-endian u16 at +2, sample rate LE u32 at +4, byte rate LE u32 at
  * +8) and its payload length as the `data` chunk size, from which
  * duration follows. The walker steps real RIFF chunks (id + LE u32 size,
  * padded to even), so non-canonical files with LIST/fact chunks ahead of
  * `fmt ` still parse. Scan-side, codegen'd, zero dependencies — the
  * metadata-profile pass of an audio corpus; sample decoding proper stays
  * behind the batched-codec contract
  * ([[graft.operators.Multimodal.decodeBatched]]).
  */
object AudioMetaUtil {
  private def u(b: Array[Byte], i: Int): Int = b(i) & 0xff
  private def le16(b: Array[Byte], o: Int): Int = u(b, o) | (u(b, o + 1) << 8)
  private def le32(b: Array[Byte], o: Int): Long =
    u(b, o).toLong | (u(b, o + 1).toLong << 8) |
      (u(b, o + 2).toLong << 16) | (u(b, o + 3).toLong << 24)

  def isWav(b: Array[Byte]): Boolean =
    b.length >= 12 &&
      b(0) == 'R' && b(1) == 'I' && b(2) == 'F' && b(3) == 'F' &&
      b(8) == 'W' && b(9) == 'A' && b(10) == 'V' && b(11) == 'E'

  /** (channels, sampleRate, byteRate, dataSize); −1 for anything absent.
    * The `data` chunk's declared size counts even when the payload is
    * truncated (headers-only files are the profile-pass common case). */
  private def walk(b: Array[Byte]): (Int, Long, Long, Long) = {
    var i = 12
    var ch = -1; var rate = -1L; var byteRate = -1L; var dataSize = -1L
    while (i + 8 <= b.length) {
      val size = le32(b, i + 4)
      if (size < 0 || size > Int.MaxValue - 9) return (ch, rate, byteRate, dataSize)
      if (b(i) == 'f' && b(i + 1) == 'm' && b(i + 2) == 't' && b(i + 3) == ' '
          && i + 8 + 16 <= b.length) {
        ch = le16(b, i + 10)
        rate = le32(b, i + 12)
        byteRate = le32(b, i + 16)
      }
      if (b(i) == 'd' && b(i + 1) == 'a' && b(i + 2) == 't' && b(i + 3) == 'a')
        dataSize = size
      i += 8 + size.toInt + (size.toInt & 1) // RIFF chunks pad to even
    }
    (ch, rate, byteRate, dataSize)
  }

  private val WAV = UTF8String.fromString("wav")
  private val UNKNOWN = UTF8String.fromString("unknown")

  def format(b: Array[Byte]): UTF8String = if (isWav(b)) WAV else UNKNOWN

  /** −1 = not WAV / chunk absent (mapped to NULL at the Column API). */
  def channels(b: Array[Byte]): Int = if (isWav(b)) walk(b)._1 else -1

  def sampleRate(b: Array[Byte]): Long = if (isWav(b)) walk(b)._2 else -1L

  /** `data` bytes over the byte rate, floored to whole milliseconds. */
  def durationMs(b: Array[Byte]): Long = {
    if (!isWav(b)) return -1L
    val (_, _, byteRate, dataSize) = walk(b)
    if (byteRate <= 0 || dataSize < 0) -1L else dataSize * 1000L / byteRate
  }
}

/** Container format of a binary audio payload: 'wav' | 'unknown'. */
case class AudioFormat(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StringType
  override protected def nullSafeEval(v: Any): Any =
    AudioMetaUtil.format(v.asInstanceOf[Array[Byte]])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.AudioMetaUtil.format($c)")
  override protected def withNewChildInternal(c: Expression): AudioFormat = copy(c)
  override def prettyName: String = "audio_format"
}

/** Channel count from the WAV fmt chunk; −1 if unrecognized. */
case class AudioChannels(child: Expression) extends UnaryExpression {
  override def dataType: DataType = IntegerType
  override protected def nullSafeEval(v: Any): Any =
    AudioMetaUtil.channels(v.asInstanceOf[Array[Byte]])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.AudioMetaUtil.channels($c)")
  override protected def withNewChildInternal(c: Expression): AudioChannels = copy(c)
  override def prettyName: String = "audio_channels"
}

/** Sample rate (Hz) from the WAV fmt chunk; −1 if unrecognized. */
case class AudioSampleRate(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override protected def nullSafeEval(v: Any): Any =
    AudioMetaUtil.sampleRate(v.asInstanceOf[Array[Byte]])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.AudioMetaUtil.sampleRate($c)")
  override protected def withNewChildInternal(c: Expression): AudioSampleRate = copy(c)
  override def prettyName: String = "audio_sample_rate"
}

/** Whole-millisecond duration (data size / byte rate); −1 if unknown. */
case class AudioDurationMs(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override protected def nullSafeEval(v: Any): Any =
    AudioMetaUtil.durationMs(v.asInstanceOf[Array[Byte]])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.AudioMetaUtil.durationMs($c)")
  override protected def withNewChildInternal(c: Expression): AudioDurationMs = copy(c)
  override def prettyName: String = "audio_duration_ms"
}
