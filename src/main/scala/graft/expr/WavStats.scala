package graft.expr

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types._

/** REAL audio decode for RIFF/WAVE PCM payloads — the codec itself is a
  * fixed-layout integer format, so the parse IS the decode, and it needs
  * no library at all (the reference's multimodal story stops at opaque
  * blobs; this is the audio analogue of [[MediaFeatures]]' image tier).
  *
  * Output: `struct<sample_rate, channels, bits, n_frames, duration_ms,
  * rms, peak>` — amplitude stats normalized to [0, 1] full-scale
  * (16-bit: v/32768; 8-bit unsigned: (v-128)/128). The sum of squares
  * accumulates in a Long (exact for any real payload < ~2^33 samples),
  * so the result is partition- and order-invariant — the determinism
  * contract every gate row relies on.
  *
  * NULL for payloads that don't sniff as RIFF/WAVE or use a codec other
  * than integer PCM (format tag 1, 8/16-bit) — compressed WAV variants
  * (ADPCM, float, mp3-in-wav) would need real codec libraries; the
  * caller's stub tier coalesces them, same routing as [[GifFrames]].
  */
case class WavStats(child: Expression)
    extends UnaryExpression with CodegenFallback {

  override def prettyName: String = "wav_stats"

  override def dataType: DataType = StructType(Seq(
    StructField("sample_rate", IntegerType, nullable = false),
    StructField("channels", IntegerType, nullable = false),
    StructField("bits", IntegerType, nullable = false),
    StructField("n_frames", LongType, nullable = false),
    StructField("duration_ms", DoubleType, nullable = false),
    StructField("rms", DoubleType, nullable = false),
    StructField("peak", DoubleType, nullable = false)))

  override def nullable: Boolean = true

  override def nullSafeEval(input: Any): Any = {
    val b = input.asInstanceOf[Array[Byte]]
    if (b.length < 44 || b(0) != 'R' || b(1) != 'I' || b(2) != 'F' ||
        b(3) != 'F' || b(8) != 'W' || b(9) != 'A' || b(10) != 'V' ||
        b(11) != 'E') return null
    def le16(i: Int): Int = (b(i) & 0xff) | ((b(i + 1) & 0xff) << 8)
    def le32(i: Int): Int = (b(i) & 0xff) | ((b(i + 1) & 0xff) << 8) |
      ((b(i + 2) & 0xff) << 16) | ((b(i + 3) & 0xff) << 24)
    // chunk walk: fmt must precede data (true of every real writer)
    var pos = 12
    var fmtTag = -1; var channels = 0; var rate = 0; var bits = 0
    var blockAlign = 0
    var dataOff = -1; var dataLen = 0
    while (pos + 8 <= b.length && dataOff < 0) {
      val size = le32(pos + 4)
      if (size < 0 || pos + 8 + size > b.length) return null // truncated
      val id = new String(b, pos, 4, java.nio.charset.StandardCharsets.US_ASCII)
      if (id == "fmt " && size >= 16) {
        fmtTag = le16(pos + 8)
        channels = le16(pos + 10)
        rate = le32(pos + 12)
        blockAlign = le16(pos + 20)
        bits = le16(pos + 22)
      } else if (id == "data") {
        dataOff = pos + 8; dataLen = size
      }
      pos += 8 + size + (size & 1) // chunks are word-aligned
    }
    if (dataOff < 0 || fmtTag != 1 || channels <= 0 || rate <= 0 ||
        (bits != 8 && bits != 16)) return null
    val bytesPerSample = bits / 8
    val nSamples = dataLen / bytesPerSample
    if (nSamples == 0) return null
    var sumSq = 0L
    var peakAbs = 0L
    var i = 0
    if (bits == 16) {
      while (i < nSamples) {
        val v = le16(dataOff + i * 2).toShort.toLong
        sumSq += v * v
        val a = math.abs(v)
        if (a > peakAbs) peakAbs = a
        i += 1
      }
    } else {
      while (i < nSamples) {
        val v = ((b(dataOff + i) & 0xff) - 128).toLong
        sumSq += v * v
        val a = math.abs(v)
        if (a > peakAbs) peakAbs = a
        i += 1
      }
    }
    val full = if (bits == 16) 32768.0 else 128.0
    val nFrames = nSamples.toLong / channels
    InternalRow(rate, channels, bits, nFrames,
      nFrames * 1000.0 / rate,
      math.sqrt(sumSq.toDouble / nSamples) / full,
      peakAbs / full)
  }

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}
