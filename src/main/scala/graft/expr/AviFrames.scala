package graft.expr

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** REAL video frame decode for AVI payloads — every `stride`-th video
  * chunk in the RIFF `movi` list reduces to per-frame stats
  * `array<struct<frame_idx, width, height, r_mean, g_mean, b_mean>>`,
  * the same shape as [[GifFrames]].
  *
  * Two codec tiers, both dependency-free:
  *  - `..db` (uncompressed DIB): 24-bit BGR, bottom-up, 4-byte-aligned
  *    rows — a fixed-layout integer format, parsed exactly; this is the
  *    lossless tier the gate oracle pins analytically;
  *  - `..dc` (compressed): MJPEG — each chunk is a standalone JPEG the
  *    JDK's own `javax.imageio` decodes; real lossy codec output, so
  *    tests assert tolerance, not bit-equality.
  *
  * NULL when the payload doesn't sniff as RIFF/AVI, carries no video
  * stream, or uses a compression the JDK can't decode — the visible
  * stub-tier routing shared by the whole multimodal family. Frame
  * dimensions come from the stream's BITMAPINFOHEADER (`strf`), the
  * authoritative source in AVI.
  */
case class AviFrames(child: Expression, stride: Int)
    extends UnaryExpression with CodegenFallback {
  require(stride > 0, "stride must be positive")

  override def prettyName: String = "avi_frames"

  // null in => null out (nullSafeEval): declaring it lets the optimizer

  // infer IsNotNull on the child attribute instead of wrapping this whole

  // kernel in an interpreted isnotnull(<kernel>) filter (r18 optimization)

  override def nullIntolerant: Boolean = true

  private val frameStruct = StructType(Seq(
    StructField("frame_idx", IntegerType, nullable = false),
    StructField("width", IntegerType, nullable = false),
    StructField("height", IntegerType, nullable = false),
    StructField("r_mean", DoubleType, nullable = false),
    StructField("g_mean", DoubleType, nullable = false),
    StructField("b_mean", DoubleType, nullable = false)))

  override def dataType: DataType = ArrayType(frameStruct, containsNull = false)
  override def nullable: Boolean = true

  override def nullSafeEval(input: Any): Any = {
    val b = input.asInstanceOf[Array[Byte]]
    if (b.length < 16 || b(0) != 'R' || b(1) != 'I' || b(2) != 'F' ||
        b(3) != 'F' || b(8) != 'A' || b(9) != 'V' || b(10) != 'I' ||
        b(11) != ' ') return null
    def le32(i: Int): Int = (b(i) & 0xff) | ((b(i + 1) & 0xff) << 8) |
      ((b(i + 2) & 0xff) << 16) | ((b(i + 3) & 0xff) << 24)
    def le16(i: Int): Int = (b(i) & 0xff) | ((b(i + 1) & 0xff) << 8)
    def fourcc(i: Int): String =
      new String(b, i, 4, java.nio.charset.StandardCharsets.US_ASCII)
    // walk: collect the first video stream's strf (dimensions,
    // compression) and every movi frame chunk offset
    var strfW = 0; var strfH = 0; var strfComp = -1; var strfBits = 0
    val frames = scala.collection.mutable.Buffer[(Int, Int)]() // (off, len)
    def walk(start: Int, end: Int, depth: Int): Unit = {
      // depth bound: a crafted payload can nest a LIST every ~12 bytes;
      // unbounded recursion would StackOverflowError (an Error escapes
      // the Exception handler and kills the task instead of degrading
      // to the NULL stub tier). Real AVI nests 2-3 deep; 64 is generous.
      if (depth > 64) return
      var pos = start
      while (pos + 8 <= end) {
        val id = fourcc(pos)
        val size = le32(pos + 4)
        if (size < 0 || pos + 8 + size > end) return // truncated: stop
        if (id == "LIST") {
          walk(pos + 12, pos + 8 + size, depth + 1) // skip the 4-byte list type
        } else if (id == "strf" && strfComp < 0 && size >= 40) {
          strfW = le32(pos + 8 + 4)
          strfH = math.abs(le32(pos + 8 + 8))
          strfBits = le16(pos + 8 + 14) // biBitCount
          strfComp = le32(pos + 8 + 16) // biCompression
        } else if (id.length == 4 && id(0).isDigit && id(1).isDigit &&
            (id.substring(2) == "db" || id.substring(2) == "dc") && size > 0) {
          frames += ((pos + 8, size))
        }
        pos += 8 + size + (size & 1) // word alignment
      }
    }
    walk(12, b.length, 0)
    if (frames.isEmpty || strfComp < 0 || strfW <= 0 || strfH <= 0)
      return null
    val isRaw = strfComp == 0
    val isMjpg = strfComp == 0x47504a4d // 'MJPG' little-endian
    if (!isRaw && !isMjpg) return null
    if (isRaw && strfBits != 24) return null
    try {
      val rows = (0 until frames.length by stride).map { fi =>
        val (off, len) = frames(fi)
        var rSum = 0L; var gSum = 0L; var bSum = 0L
        var w = strfW; var h = strfH
        if (isRaw) {
          // bottom-up BGR rows padded to 4 bytes; means don't care
          // about row order, so accumulate straight through
          val rowBytes = (strfW * 3 + 3) & ~3
          if (len < rowBytes * strfH) return null
          var y = 0
          while (y < strfH) {
            var x = 0
            val base = off + y * rowBytes
            while (x < strfW) {
              bSum += b(base + x * 3) & 0xff
              gSum += b(base + x * 3 + 1) & 0xff
              rSum += b(base + x * 3 + 2) & 0xff
              x += 1
            }
            y += 1
          }
        } else {
          val img = javax.imageio.ImageIO.read(
            new java.io.ByteArrayInputStream(b, off, len))
          if (img == null) return null
          w = img.getWidth; h = img.getHeight
          var y = 0
          while (y < h) {
            var x = 0
            while (x < w) {
              val p = img.getRGB(x, y)
              rSum += (p >>> 16) & 0xff; gSum += (p >>> 8) & 0xff
              bSum += p & 0xff
              x += 1
            }
            y += 1
          }
        }
        val np = w.toLong * h
        InternalRow(fi, w, h, rSum.toDouble / np / 255.0,
          gSum.toDouble / np / 255.0, bSum.toDouble / np / 255.0)
      }
      new GenericArrayData(rows.toArray[Any])
    } catch { case _: Exception => null } // corrupt stream → stub tier
  }

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}
