package graft.expr

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types.{BinaryType, DataType}

/** Real image resize as a Catalyst expression: payloads that decode as
  * JDK images (PNG/JPEG/GIF/BMP — the same `javax.imageio` tier and
  * magic-byte sniff as [[MediaFeatures]]) are rescaled to `targetW` ×
  * `targetH` with Java2D (`Graphics2D.drawImage` under a
  * nearest-neighbor interpolation hint — deterministic software
  * rendering, no native codec) and re-encoded as PNG (lossless, so the
  * resampled pixels survive the round-trip bit-exactly and the gate can
  * pin them by decoding back through [[MediaFeatures]]). Non-image and
  * corrupt payloads evaluate to NULL so the caller can coalesce onto
  * its fallback tier.
  *
  * Expression (not mapPartitions) for the same reason as
  * [[MediaFeatures]]: the decode/resample/encode stays inside the scan
  * pipeline with pruning intact, no RDD round-trip. The reference
  * stores media columns as opaque blobs only (risinglight
  * `src/types/blob.rs:15`); the resize tier is an extension.
  */
case class MediaResize(child: Expression, targetW: Int, targetH: Int)
    extends UnaryExpression with CodegenFallback {

  require(targetW > 0 && targetH > 0, "target dimensions must be positive")

  override def prettyName: String = "media_resize"

  // null in => null out (nullSafeEval): declaring it lets the optimizer

  // infer IsNotNull on the child attribute instead of wrapping this whole

  // kernel in an interpreted isnotnull(<kernel>) filter (r18 optimization)

  override def nullIntolerant: Boolean = true

  override def dataType: DataType = BinaryType

  override def nullable: Boolean = true

  override def nullSafeEval(input: Any): Any =
    MediaFeatures.readImage(input.asInstanceOf[Array[Byte]]) match {
      case None => null
      case Some(src) =>
        // ARGB target: opaque sources stay opaque, alpha survives for
        // sources that carry it; PNG encodes both
        val dst = new java.awt.image.BufferedImage(
          targetW, targetH, java.awt.image.BufferedImage.TYPE_INT_ARGB)
        val g = dst.createGraphics()
        try {
          g.setRenderingHint(java.awt.RenderingHints.KEY_INTERPOLATION,
            java.awt.RenderingHints.VALUE_INTERPOLATION_NEAREST_NEIGHBOR)
          g.drawImage(src, 0, 0, targetW, targetH, null)
        } finally g.dispose()
        val bos = new java.io.ByteArrayOutputStream()
        javax.imageio.ImageIO.write(dst, "png", bos)
        bos.toByteArray
    }

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}
