package graft.expr

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types._

/** REAL audio decode for the dependency-free codec families — the
  * audio analogue of [[MediaFeatures]]' image tier (the reference's
  * multimodal story stops at opaque blobs):
  *
  *  - RIFF/WAVE integer PCM (little-endian, 8-bit unsigned / 16-bit
  *    signed) — the fixed-layout format where the parse IS the decode;
  *  - RIFF/WAVE IEEE float (fmt 3, 32/64-bit little-endian) — also a
  *    fixed-layout parse; samples clamp to [-1, 1] full-scale;
  *  - WAVE_FORMAT_EXTENSIBLE (fmt 0xFFFE — the standard container for
  *    >2-channel audio): the real format is the SubFormat GUID's Data1
  *    once the 14-byte KSDATAFORMAT media-subtype tail checks out;
  *  - AU (".snd", big-endian): 8-bit signed / 16-bit signed linear PCM
  *    AND G.711 μ-law, expanded with the standard segment formula — a
  *    real (if tiny) codec;
  *  - AIFF ("FORM…AIFF", big-endian PCM 8/16-bit, sample rate decoded
  *    from the COMM chunk's 80-bit extended float).
  *
  * Output: `struct<sample_rate, channels, bits, n_frames, duration_ms,
  * rms, peak>` — amplitude stats normalized to [0, 1] full-scale.
  *
  * The integer tiers accumulate the sum of squares in a Long (exact
  * for any real payload); the float tier uses Kahan-compensated
  * Doubles — either way the per-payload loop order is fixed, so the
  * result is partition- and order-invariant — the determinism contract
  * every gate row relies on.
  *
  * NULL for payloads that sniff as none of the above, or use codecs
  * needing real libraries (ADPCM, mp3, AAC…) — the caller's stub
  * tier coalesces them, same routing as [[GifFrames]]/[[AviFrames]].
  * Any decode failure on a corrupt/crafted payload also degrades to
  * NULL (never a task failure), matching the sibling decoders.
  */
case class AudioStats(child: Expression)
    extends UnaryExpression with CodegenFallback {

  override def prettyName: String = "audio_stats"

  // null in => null out (nullSafeEval): declaring it lets the optimizer

  // infer IsNotNull on the child attribute instead of wrapping this whole

  // kernel in an interpreted isnotnull(<kernel>) filter (r18 optimization)

  override def nullIntolerant: Boolean = true

  override def dataType: DataType = StructType(Seq(
    StructField("sample_rate", IntegerType, nullable = false),
    StructField("channels", IntegerType, nullable = false),
    StructField("bits", IntegerType, nullable = false),
    StructField("n_frames", LongType, nullable = false),
    StructField("duration_ms", DoubleType, nullable = false),
    StructField("rms", DoubleType, nullable = false),
    StructField("peak", DoubleType, nullable = false)))

  override def nullable: Boolean = true

  /** Fold `nSamples` decoded values (already sign-centered, in the
    * scale whose full range is `full`) into the output row.
    */
  private def stats(rate: Int, channels: Int, bits: Int, full: Double,
      nSamples: Int, sample: Int => Long): Any = {
    if (nSamples <= 0 || channels <= 0 || rate <= 0) return null
    var sumSq = 0L
    var peakAbs = 0L
    var i = 0
    while (i < nSamples) {
      val v = sample(i)
      sumSq += v * v
      val a = math.abs(v)
      if (a > peakAbs) peakAbs = a
      i += 1
    }
    val nFrames = nSamples.toLong / channels
    InternalRow(rate, channels, bits, nFrames,
      nFrames * 1000.0 / rate,
      math.sqrt(sumSq.toDouble / nSamples) / full,
      peakAbs / full)
  }

  /** Float-sample variant of [[stats]]: Kahan-compensated Double sum
    * of squares (the float tier can't use the integer-exact Long path,
    * but the per-payload loop order is fixed, so the result is still
    * deterministic). Samples clamp to [-1, 1]; NaN reads as silence.
    */
  private def statsD(rate: Int, channels: Int, bits: Int,
      nSamples: Int, sample: Int => Double): Any = {
    if (nSamples <= 0 || channels <= 0 || rate <= 0) return null
    var sumSq = 0.0; var comp = 0.0
    var peak = 0.0
    var i = 0
    while (i < nSamples) {
      val raw = sample(i)
      val v =
        if (raw.isNaN) 0.0
        else if (raw > 1.0) 1.0
        else if (raw < -1.0) -1.0
        else raw
      val y = v * v - comp
      val t = sumSq + y
      comp = (t - sumSq) - y
      sumSq = t
      val a = math.abs(v)
      if (a > peak) peak = a
      i += 1
    }
    val nFrames = nSamples.toLong / channels
    InternalRow(rate, channels, bits, nFrames,
      nFrames * 1000.0 / rate,
      math.sqrt(sumSq / nSamples), peak)
  }

  // One corrupt/crafted payload must degrade to the NULL stub tier,
  // never fail the task — same contract as GifFrames/AviFrames.
  override def nullSafeEval(input: Any): Any =
    try decode(input.asInstanceOf[Array[Byte]])
    catch { case _: Exception => null }

  private def decode(b: Array[Byte]): Any = {
    if (b.length < 16) return null
    def le16(i: Int): Int = (b(i) & 0xff) | ((b(i + 1) & 0xff) << 8)
    def le32(i: Int): Int = le16(i) | (le16(i + 2) << 16)
    def le64(i: Int): Long =
      (le32(i) & 0xffffffffL) | (le32(i + 4).toLong << 32)
    def be16(i: Int): Int = ((b(i) & 0xff) << 8) | (b(i + 1) & 0xff)
    def be32(i: Int): Int = (be16(i) << 16) | be16(i + 2)

    if (b(0) == 'R' && b(1) == 'I' && b(2) == 'F' && b(3) == 'F' &&
        b.length >= 44 && b(8) == 'W' && b(9) == 'A' && b(10) == 'V' &&
        b(11) == 'E') {
      // ---- RIFF/WAVE (little-endian) ----
      var pos = 12
      var fmtTag = -1; var channels = 0; var rate = 0; var bits = 0
      var dataOff = -1; var dataLen = 0
      while (pos + 8 <= b.length && dataOff < 0) {
        val size = le32(pos + 4)
        if (size < 0 || pos + 8 + size > b.length) return null // truncated
        val id = new String(b, pos, 4, java.nio.charset.StandardCharsets.US_ASCII)
        if (id == "fmt " && size >= 16) {
          fmtTag = le16(pos + 8)
          channels = le16(pos + 10)
          rate = le32(pos + 12)
          bits = le16(pos + 22)
          if (fmtTag == 0xfffe && size >= 40) {
            // WAVE_FORMAT_EXTENSIBLE: the real format is the SubFormat
            // GUID's Data1 (LE at +24 into the fmt body); the remaining
            // 14 bytes must be the fixed KSDATAFORMAT media-subtype
            // tail {0000}-0000-0010-8000-00AA00389B71, else reject.
            val g = pos + 32
            val tail = Array[Int](0, 0, 0, 0, 0x10, 0, 0x80, 0,
              0, 0xaa, 0, 0x38, 0x9b, 0x71)
            var k = 0; var ok = true
            while (k < 14) { if ((b(g + 2 + k) & 0xff) != tail(k)) ok = false; k += 1 }
            fmtTag = if (ok) le16(g) else -1
          }
        } else if (id == "data") {
          dataOff = pos + 8; dataLen = size
        }
        pos += 8 + size + (size & 1) // chunks are word-aligned
      }
      if (dataOff < 0) return null
      (fmtTag, bits) match {
        case (1, 16) => // integer PCM, signed little-endian
          stats(rate, channels, 16, 32768.0, dataLen / 2,
            i => le16(dataOff + i * 2).toShort.toLong)
        case (1, 8) => // integer PCM, 8-bit UNSIGNED (WAV convention)
          stats(rate, channels, 8, 128.0, dataLen,
            i => ((b(dataOff + i) & 0xff) - 128).toLong)
        case (3, 32) => // IEEE float32, nominal full-scale [-1, 1]
          statsD(rate, channels, 32, dataLen / 4,
            i => java.lang.Float.intBitsToFloat(le32(dataOff + i * 4)).toDouble)
        case (3, 64) => // IEEE float64
          statsD(rate, channels, 64, dataLen / 8,
            i => java.lang.Double.longBitsToDouble(le64(dataOff + i * 8)))
        case _ => null // compressed/unknown codec → honest stub tier
      }
    } else if (b(0) == '.' && b(1) == 's' && b(2) == 'n' && b(3) == 'd' &&
        b.length >= 24) {
      // ---- AU (big-endian) ----
      val dataOff = be32(4)
      val declLen = be32(8) // may be -1 = unknown → rest of payload
      val enc = be32(12)
      val rate = be32(16)
      val channels = be32(20)
      if (dataOff < 24 || dataOff > b.length) return null
      // overflow-safe: declLen near 2^31 would wrap `dataOff + declLen`
      // negative and pass a naive `<= b.length` check
      val dataLen = if (declLen >= 0 && declLen <= b.length - dataOff) declLen
        else b.length - dataOff
      enc match {
        case 1 => // G.711 μ-law: standard segment expansion to 16-bit scale
          stats(rate, channels, 8, 32768.0, dataLen, { i =>
            val u = ~b(dataOff + i) & 0xff
            val v = ((((u & 0xf) << 3) + 0x84) << ((u >> 4) & 7)) - 0x84
            if ((u & 0x80) != 0) -v.toLong else v.toLong
          })
        case 2 => // 8-bit signed linear
          stats(rate, channels, 8, 128.0, dataLen,
            i => b(dataOff + i).toLong)
        case 3 => // 16-bit signed linear, big-endian
          stats(rate, channels, 16, 32768.0, dataLen / 2,
            i => be16(dataOff + i * 2).toShort.toLong)
        case _ => null
      }
    } else if (b(0) == 'F' && b(1) == 'O' && b(2) == 'R' && b(3) == 'M' &&
        b.length >= 12 && b(8) == 'A' && b(9) == 'I' && b(10) == 'F' &&
        b(11) == 'F') {
      // ---- AIFF (big-endian IFF) ----
      var pos = 12
      var channels = 0; var bits = 0; var rate = 0
      var dataOff = -1; var dataLen = 0
      while (pos + 8 <= b.length) {
        val size = be32(pos + 4)
        if (size < 0 || pos + 8 + size > b.length) return null
        val id = new String(b, pos, 4, java.nio.charset.StandardCharsets.US_ASCII)
        if (id == "COMM" && size >= 18) {
          channels = be16(pos + 8)
          bits = be16(pos + 14)
          // 80-bit extended float: seeeeeee eeeeeeee mmm... — value is
          // mantissa × 2^(exp − 16383 − 63); exact for integer rates
          val exp = be16(pos + 16) & 0x7fff
          val mantHi = (be32(pos + 18).toLong << 32) >>> 32
          val mantLo = (be32(pos + 22).toLong << 32) >>> 32
          val mant = (mantHi << 32) | mantLo
          val shift = exp - 16383 - 63
          rate =
            if (shift <= 0 && shift > -64) (mant >>> -shift).toInt
            else if (in63(shift)) (mant << shift).toInt
            else 0
        } else if (id == "SSND" && size >= 8) {
          val off = be32(pos + 8)
          dataOff = pos + 16 + off
          dataLen = size - 8 - off
        }
        pos += 8 + size + (size & 1)
      }
      if (dataOff < 0 || dataOff + dataLen > b.length ||
          (bits != 8 && bits != 16)) return null
      if (bits == 16)
        stats(rate, channels, 16, 32768.0, dataLen / 2,
          i => be16(dataOff + i * 2).toShort.toLong)
      else
        stats(rate, channels, 8, 128.0, dataLen,
          i => b(dataOff + i).toLong) // AIFF 8-bit is SIGNED
    } else null
  }

  private def in63(shift: Int): Boolean = shift > 0 && shift < 63

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}
