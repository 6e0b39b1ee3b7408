package graft.expr

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** Media decode as a Catalyst expression — struct(n_bytes, byte_hash,
  * width, height, features[4]).
  *
  * Payloads that ARE images in a format the JDK decodes (PNG/JPEG/GIF/BMP
  * via `javax.imageio` — zero extra dependencies) get REAL pixel stats:
  * width, height, and per-channel means `features = [r, g, b, a]`, each
  * `(Σ channel / n_pixels) / 255` in [0, 1]. Non-image payloads (and
  * codecs the JDK lacks) take the deterministic byte-hash fallback —
  * width/height NULL, features derived from the hash — so the column is
  * total either way. A cheap magic-byte sniff gates the codec: text
  * corpora never pay ImageIO's cost.
  *
  * An expression is the right vehicle: the decode stays inside the
  * columnar scan pipeline with pruning/filter pushdown intact, instead of
  * an `.rdd.mapPartitions` round-trip that de/re-serializes every row and
  * blocks codegen around it. For codec families needing native libraries
  * (video, audio), the batch-amortized `mapPartitions` path in
  * operators/Multimodal is the swap-in point.
  */
case class MediaFeatures(child: Expression)
    extends UnaryExpression with CodegenFallback {

  override def prettyName: String = "media_features"

  // null in => null out (nullSafeEval): declaring it lets the optimizer

  // infer IsNotNull on the child attribute instead of wrapping this whole

  // kernel in an interpreted isnotnull(<kernel>) filter (r18 optimization)

  override def nullIntolerant: Boolean = true

  override def dataType: DataType = StructType(Seq(
    StructField("n_bytes", IntegerType, nullable = false),
    StructField("byte_hash", LongType, nullable = false),
    StructField("width", IntegerType, nullable = true),
    StructField("height", IntegerType, nullable = true),
    StructField("features", ArrayType(DoubleType, containsNull = false), nullable = false)))

  override def nullSafeEval(input: Any): Any = {
    val payload = input.asInstanceOf[Array[Byte]]
    val nBytes = payload.length
    var h = 0L
    var i = 0
    while (i < nBytes) { h = (h * 31 + (payload(i) & 0xff)) % 2147483647L; i += 1 }
    MediaFeatures.decodeImage(payload) match {
      case Some((w, ht, means)) =>
        InternalRow(nBytes, h, w, ht, new GenericArrayData(means))
      case None =>
        val feat = Array.tabulate(4)(j => ((h >> (j * 8)) & 0xff) / 255.0)
        InternalRow(nBytes, h, null, null, new GenericArrayData(feat))
    }
  }

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

object MediaFeatures {

  /** Magic-byte sniff for the formats the JDK ships decoders for; keeps
    * ImageIO entirely off the non-image hot path. A false positive (text
    * starting with "BM") still decodes to None safely, just slower.
    */
  private def looksLikeImage(p: Array[Byte]): Boolean =
    p.length >= 4 && (
      (p(0) == 0x89.toByte && p(1) == 'P' && p(2) == 'N' && p(3) == 'G') || // PNG
      (p(0) == 0xFF.toByte && p(1) == 0xD8.toByte && p(2) == 0xFF.toByte) || // JPEG
      (p(0) == 'G' && p(1) == 'I' && p(2) == 'F' && p(3) == '8') ||          // GIF
      (p(0) == 'B' && p(1) == 'M'))                                          // BMP

  /** Decode the payload to a BufferedImage when it sniffs as (and really
    * is) a JDK-decodable image; None otherwise. Shared by the feature
    * and resize expressions so both tiers gate on the same sniff.
    */
  private[graft] def readImage(payload: Array[Byte])
      : Option[java.awt.image.BufferedImage] = {
    if (!looksLikeImage(payload)) return None
    try {
      // explicit in-memory stream: no ImageIO temp-file cache per row.
      // NOTE: read(ImageInputStream) CLOSES the stream itself (javadoc);
      // closing it again throws IOException("closed")
      Option(javax.imageio.ImageIO.read(
        new javax.imageio.stream.MemoryCacheImageInputStream(
          new java.io.ByteArrayInputStream(payload))))
    } catch { case _: Exception => None } // corrupt stream → fallback tier
  }

  /** Decode → (width, height, [r̄, ḡ, b̄, ā] channel means in [0,1]), or
    * None when the payload isn't a JDK-decodable image. Means are
    * computed as `(sum / n_pixels) / 255` — the order the gate's
    * analytic oracle mirrors literally.
    */
  private[graft] def decodeImage(payload: Array[Byte])
      : Option[(Int, Int, Array[Double])] =
    readImage(payload).map { img =>
      {
        val w = img.getWidth
        val ht = img.getHeight
        var r = 0L; var g = 0L; var b = 0L; var a = 0L
        var y = 0
        while (y < ht) {
          var x = 0
          while (x < w) {
            val p = img.getRGB(x, y) // packed ARGB, format-independent
            a += (p >>> 24) & 0xff
            r += (p >>> 16) & 0xff
            g += (p >>> 8) & 0xff
            b += p & 0xff
            x += 1
          }
          y += 1
        }
        val n = w.toLong * ht
        (w, ht, Array(
          r.toDouble / n / 255.0, g.toDouble / n / 255.0,
          b.toDouble / n / 255.0, a.toDouble / n / 255.0))
      }
    }
}
