package graft.expr

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** REAL multi-frame decode for animated GIF — the one multi-frame format
  * the JDK decodes natively ([[MediaFeatures]] reads only frame 0 of an
  * animation). Every `stride`-th stored frame is decoded and reduced to
  * per-frame stats: `array<struct<frame_idx, width, height, r_mean,
  * g_mean, b_mean>>`, means in [0,1] over the frame's own raster.
  *
  * NULL for payloads that don't sniff as GIF (or fail to decode) — the
  * caller coalesces in its stub tier, the same routing as [[MediaResize]].
  * Frames are read as STORED (not composited over prior frames): exact
  * for full-frame animations, which is what the generators produce;
  * delta-frame GIFs would need disposal-method compositing — a bounded
  * extension, not plumbed yet.
  *
  * Same scale rationale as the other media expressions: the decode stays
  * inside the scan pipeline (pruning/pushdown intact), no RDD round-trip,
  * and the output is narrow stats — payloads never survive the explode.
  */
case class GifFrames(child: Expression, stride: Int)
    extends UnaryExpression with CodegenFallback {
  require(stride > 0, "stride must be positive")

  override def prettyName: String = "gif_frames"

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
    val payload = input.asInstanceOf[Array[Byte]]
    if (payload.length < 4 || payload(0) != 'G' || payload(1) != 'I' ||
        payload(2) != 'F' || payload(3) != '8') return null
    var reader: javax.imageio.ImageReader = null
    var iis: javax.imageio.stream.MemoryCacheImageInputStream = null
    try {
      iis = new javax.imageio.stream.MemoryCacheImageInputStream(
        new java.io.ByteArrayInputStream(payload))
      val readers = javax.imageio.ImageIO.getImageReaders(iis)
      if (!readers.hasNext) return null
      reader = readers.next()
      reader.setInput(iis)
      val n = reader.getNumImages(true)
      val rows = (0 until n by stride).map { i =>
        val img = reader.read(i)
        val w = img.getWidth; val h = img.getHeight
        var r = 0L; var g = 0L; var b = 0L
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w) {
            val p = img.getRGB(x, y)
            r += (p >>> 16) & 0xff; g += (p >>> 8) & 0xff; b += p & 0xff
            x += 1
          }
          y += 1
        }
        val np = w.toLong * h
        InternalRow(i, w, h,
          r.toDouble / np / 255.0, g.toDouble / np / 255.0,
          b.toDouble / np / 255.0)
      }
      new GenericArrayData(rows.toArray[Any])
    } catch { case _: Exception => null } // corrupt stream → stub tier
    finally {
      // close the cache stream too: dispose() frees the reader but not
      // the MemoryCache buffers, which would otherwise pile up until GC
      // across a large scan
      if (reader != null) reader.dispose()
      if (iis != null) scala.util.Try(iis.close())
    }
  }

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}
