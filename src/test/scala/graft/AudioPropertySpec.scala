package graft

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Literal
import org.scalacheck.{Gen, Properties}
import org.scalacheck.Prop.forAll

/** Cross-container invariant for the real audio decoders: the SAME
  * samples encoded as WAV (little-endian), AU (big-endian) and AIFF
  * (big-endian, 80-bit extended sample rate) must decode to identical
  * stats — any endianness or header-arithmetic bug in one container
  * breaks the agreement. Direct expression eval (no Spark job), so the
  * property runs in milliseconds per case.
  */
object AudioPropertySpec extends Properties("AudioStats") {

  private val samples =
    Gen.nonEmptyListOf(Gen.chooseNum(-32768, 32767)).map(_.take(200))
  private val rate = Gen.oneOf(8000, 11025, 16000, 22050, 44100, 48000)
  private val chans = Gen.oneOf(1, 2)

  private def decode(payload: Array[Byte]): InternalRow = {
    val e = graft.expr.AudioStats(Literal(payload))
    e.nullSafeEval(payload).asInstanceOf[InternalRow]
  }

  property("WAV/AU/AIFF PCM-16 of the same samples decode identically") =
    forAll(samples, rate, chans) { (vs, r, ch) =>
      val nFrames = vs.length / ch
      nFrames == 0 || {
        val used = vs.take(nFrames * ch)
        val wav = operators.Multimodal.encodeWavPcm16(r, ch, nFrames)(used(_))
        val au = operators.Multimodal.encodeAu(3, r, ch, nFrames)(used(_))
        val aif = operators.Multimodal.encodeAiffPcm16(r, ch, nFrames)(used(_))
        val expectedRms = math.sqrt(
          used.map(v => v.toLong * v).sum.toDouble / used.length) / 32768.0
        val expectedPeak = used.map(v => math.abs(v.toLong)).max / 32768.0
        Seq(wav, au, aif).map(decode).forall { row =>
          row != null &&
            row.getInt(0) == r && row.getInt(1) == ch &&
            row.getInt(2) == 16 && row.getLong(3) == nFrames.toLong &&
            math.abs(row.getDouble(5) - expectedRms) < 1e-12 &&
            row.getDouble(6) == expectedPeak
        }
      }
    }

  property("PCM-16 and float32 of the same samples agree to 1e-6") =
    forAll(samples, rate, chans) { (vs, r, ch) =>
      val nFrames = vs.length / ch
      nFrames == 0 || {
        val used = vs.take(nFrames * ch)
        val pcm = operators.Multimodal.encodeWavPcm16(r, ch, nFrames)(used(_))
        val f32 = operators.Multimodal.encodeWavFloat(r, ch, nFrames, 32)(
          i => used(i) / 32768.0)
        val f64 = operators.Multimodal.encodeWavFloat(r, ch, nFrames, 64)(
          i => used(i) / 32768.0)
        val ext = operators.Multimodal.encodeWavExtensible(r, ch, nFrames,
          float32 = true)(i => used(i) / 32768.0)
        val rp = decode(pcm)
        // v/32768 is dyadic and exact in float32, so the float tiers
        // should agree with the integer-exact tier to fp rounding
        Seq(decode(f32), decode(f64), decode(ext)).forall { rf =>
          rf != null && rp != null &&
            rf.getInt(0) == r && rf.getInt(1) == ch &&
            rf.getLong(3) == nFrames.toLong &&
            math.abs(rf.getDouble(5) - rp.getDouble(5)) < 1e-6 &&
            math.abs(rf.getDouble(6) - rp.getDouble(6)) < 1e-6
        }
      }
    }

  property("EXTENSIBLE PCM-16 decodes identically to plain PCM-16") =
    forAll(samples, rate, Gen.oneOf(1, 2, 4, 6)) { (vs, r, ch) =>
      val nFrames = vs.length / ch
      nFrames == 0 || {
        val used = vs.take(nFrames * ch)
        val plainCh = decode(operators.Multimodal.encodeWavExtensible(
          r, ch, nFrames, float32 = false)(i => used(i).toDouble))
        plainCh != null && plainCh.getInt(1) == ch &&
          plainCh.getInt(2) == 16 && plainCh.getLong(3) == nFrames.toLong && {
            // vs the plain container on the same flattened samples
            val mono = decode(operators.Multimodal.encodeWavPcm16(
              r, 1, used.length)(used(_)))
            plainCh.getDouble(5) == mono.getDouble(5) &&
              plainCh.getDouble(6) == mono.getDouble(6)
          }
      }
    }

  property("corrupt AU declared length degrades to null, never throws") =
    forAll(Gen.chooseNum(Int.MaxValue - 64, Int.MaxValue)) { declLen =>
      // a declared data length near 2^31 must not wrap the bounds check
      val bb = java.nio.ByteBuffer.allocate(64)
      bb.put(".snd".getBytes("US-ASCII"))
        .putInt(24).putInt(declLen).putInt(3).putInt(8000).putInt(1)
      val row = decode(bb.array())
      // whole-buffer fallback: 40 data bytes = 20 big-endian samples
      row == null || row.getLong(3) == 20L
    }

  property("AU 8-bit signed and mu-law stay in range and sniff cleanly") =
    forAll(Gen.nonEmptyListOf(Gen.chooseNum(-128, 127)).map(_.take(100))) { vs =>
      val au8 = operators.Multimodal.encodeAu(2, 8000, 1, vs.length)(vs(_))
      val mu = operators.Multimodal.encodeAu(1, 8000, 1, vs.length)(
        i => vs(i) & 0xff)
      val r8 = decode(au8)
      val rm = decode(mu)
      r8 != null && rm != null &&
        r8.getDouble(6) <= 1.0 && rm.getDouble(6) <= 1.0 &&
        r8.getLong(3) == vs.length.toLong && rm.getLong(3) == vs.length.toLong
    }

  property("non-audio payloads decode to null, never throw") =
    forAll(Gen.listOf(Gen.chooseNum(Byte.MinValue, Byte.MaxValue))) { bs =>
      val payload = bs.toArray
      payload.length < 16 || // expression's own null-safe floor
        (decode(payload) match {
          case null => true
          case _: InternalRow => true // a random buffer that sniffed: fine
        })
    }
}
