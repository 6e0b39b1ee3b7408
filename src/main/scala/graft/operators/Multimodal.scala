package graft.operators

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing: treat image/audio/video payloads as opaque
  * `binary` columns with typed metadata, and run decode / feature-extract
  * as partition-wise batch transforms.
  *
  * IMAGE decode is REAL for the formats the JDK ships decoders for
  * (PNG/JPEG/GIF/BMP via `javax.imageio` — see [[graft.expr.MediaFeatures]]):
  * width/height and per-channel pixel means come from actual pixels.
  * Audio/video decoding (codec libraries the JDK lacks) stays STUBBED
  * with a deterministic fake so the plumbing — schema, partitioning,
  * batch iteration shape — is verified end-to-end; on a real cluster the
  * stub body is replaced by the codec call (e.g. JNI/FFI decode or a
  * Pandas-UDF in the Python surface) and nothing else changes.
  *
  * Scale notes: `mapPartitions` keeps the decode batched per-partition
  * (amortizes codec init), the binary column is never shuffled except by
  * explicit repartition on the id, and feature outputs are narrow columns
  * so downstream pruning drops the payload immediately.
  */
object Multimodal {

  /** Media row schema: id + opaque payload + typed metadata. */
  val mediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("payload", BinaryType, nullable = true),
    StructField("media_type", StringType, nullable = false),
    StructField("width", IntegerType, nullable = true),
    StructField("height", IntegerType, nullable = true)))

  /** Wrap a text table as fake media rows (payload = utf-8 bytes) so the
    * pipeline can be exercised on the driver testdata.
    */
  // NB deliberately NO Spread here (measured r19): repartitioning the
  // binary payloads costs more than the per-row decode it parallelizes at
  // this corpus size (features 0.46 -> 0.75 s, frame_sample 0.49 -> 0.64,
  // resize 0.42 -> 0.67 fresh-JVM; r18's 0.7-2 s estimates for this
  // family came from a contaminated one-JVM sweep). At warehouse scale
  // the scan parallelizes on its own row groups, which is also the case
  // where a Spread would be a pass-through anyway.
  def asMedia(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(
      col(idCol).cast("long").as("media_id"),
      col(textCol).cast("binary").as("payload"),
      lit("text/plain").as("media_type"),
      lit(null).cast("int").as("width"),
      lit(null).cast("int").as("height"))

  /** Frame sampling over an opaque video/audio payload: treat the payload
    * as `ceil(n_bytes / frameBytes)` fixed-size frames and emit every
    * `stride`-th one as (media_id, frame_idx, byte_offset, frame_hash).
    * The plumbing — per-row frame-count arithmetic, `sequence`+`explode`
    * with a stride, offset computation, payload dropped immediately after
    * the per-frame transform — is the real distributed shape; the frame
    * "decode" is the STUBBED deterministic hash of the frame's byte slice
    * (a real codec call replaces exactly that expression). Output is
    * narrow (4 numeric columns), so nothing downstream carries payloads.
    */
  def sampleFrames(media: DataFrame, frameBytes: Int, stride: Int): DataFrame = {
    require(frameBytes > 0 && stride > 0, "frameBytes and stride must be positive")
    media.select(col("media_id"), col("payload"))
      .withColumn("n_frames",
        ceil(length(col("payload")).cast("double") / frameBytes).cast("int"))
      .filter(col("n_frames") > 0)
      .select(col("media_id"), col("payload"), col("n_frames"),
        explode(sequence(lit(0), col("n_frames") - 1, lit(stride))).as("frame_idx"))
      .withColumn("byte_offset", (col("frame_idx") * frameBytes).cast("long"))
      // stub decode: hash the frame's byte slice (ASCII corpus ⇒ byte
      // slice == character slice, mirrored exactly by the oracle)
      .withColumn("frame_hash", graft.functions.Hashing.polyHash(
        col("payload").cast("string")
          .substr((col("frame_idx") * frameBytes) + 1, lit(frameBytes))))
      .select(col("media_id"), col("frame_idx"), col("byte_offset"), col("frame_hash"))
  }

  /** REAL frame sampling for animated GIF — the one multi-frame format
    * the JDK decodes natively. Every `stride`-th stored frame decodes to
    * per-frame pixel stats ([[graft.expr.GifFrames]], an expression
    * inside the scan pipeline); non-GIF payloads keep a row with NULL
    * frame columns via `explode_outer`, so the output is total and the
    * tier routing is visible in the result. Video/audio stay with the
    * synthetic [[sampleFrames]] (no JDK codec — honestly stubbed).
    */
  def sampleGifFrames(media: DataFrame, stride: Int): DataFrame = {
    import org.apache.spark.sql.graftbridge.Bridge
    val frames = Bridge.column(
      graft.expr.GifFrames(Bridge.expression(col("payload")), stride))
    media.select(col("media_id"), frames.as("_frames"))
      .select(col("media_id"), explode_outer(col("_frames")).as("_f"))
      .select(col("media_id"),
        col("_f.frame_idx").as("frame_idx"),
        col("_f.width").as("width"), col("_f.height").as("height"),
        col("_f.r_mean").as("r_mean"), col("_f.g_mean").as("g_mean"),
        col("_f.b_mean").as("b_mean"))
  }

  /** REAL audio decode tier: RIFF/WAVE integer-PCM payloads get exact
    * amplitude stats (sample_rate/channels/bits/n_frames/duration_ms/
    * rms/peak) via [[graft.expr.AudioStats]] inside the scan pipeline;
    * anything else (non-audio payloads, compressed codecs the JDK
    * can't decode) surfaces as NULL columns — the visible stub tier,
    * same routing contract as [[sampleGifFrames]].
    */
  def audioStats(media: DataFrame): DataFrame = {
    import org.apache.spark.sql.graftbridge.Bridge
    val stats = Bridge.column(
      graft.expr.AudioStats(Bridge.expression(col("payload"))))
    media.select(col("media_id"), stats.as("_a"))
      .select(col("media_id"),
        col("_a.sample_rate").as("sample_rate"),
        col("_a.channels").as("channels"),
        col("_a.bits").as("bits"),
        col("_a.n_frames").as("n_frames"),
        col("_a.duration_ms").as("duration_ms"),
        col("_a.rms").as("rms"),
        col("_a.peak").as("peak"))
  }

  /** REAL video tier: AVI payloads decode every `stride`-th frame to
    * per-frame pixel stats via [[graft.expr.AviFrames]] — uncompressed
    * 24-bit DIB frames exactly, MJPEG frames through the JDK's own JPEG
    * codec. Non-AVI payloads (and compressions the JDK lacks) keep a
    * NULL-stats row, the same visible stub routing as
    * [[sampleGifFrames]].
    */
  def sampleAviFrames(media: DataFrame, stride: Int): DataFrame = {
    import org.apache.spark.sql.graftbridge.Bridge
    val frames = Bridge.column(
      graft.expr.AviFrames(Bridge.expression(col("payload")), stride))
    media.select(col("media_id"), frames.as("_frames"))
      .select(col("media_id"), explode_outer(col("_frames")).as("_f"))
      .select(col("media_id"),
        col("_f.frame_idx").as("frame_idx"),
        col("_f.width").as("width"), col("_f.height").as("height"),
        col("_f.r_mean").as("r_mean"), col("_f.g_mean").as("g_mean"),
        col("_f.b_mean").as("b_mean"))
  }

  /** Deterministic AU (".snd") encoder — big-endian header, `encoding`
    * 1 = μ-law bytes, 2 = 8-bit signed PCM, 3 = 16-bit signed PCM.
    * `sample` yields the RAW stored unit for the encoding (a μ-law
    * byte, an 8-bit value, or a 16-bit value).
    */
  def encodeAu(encoding: Int, sampleRate: Int, channels: Int,
      nFrames: Int)(sample: Int => Int): Array[Byte] = {
    val unit = if (encoding == 3) 2 else 1
    val n = nFrames * channels
    val bb = java.nio.ByteBuffer.allocate(24 + n * unit)
      .order(java.nio.ByteOrder.BIG_ENDIAN)
    bb.put(".snd".getBytes("US-ASCII")).putInt(24).putInt(n * unit)
      .putInt(encoding).putInt(sampleRate).putInt(channels)
    (0 until n).foreach { i =>
      if (unit == 2) bb.putShort(sample(i).toShort)
      else bb.put(sample(i).toByte)
    }
    bb.array()
  }

  /** Deterministic AIFF PCM-16 encoder — big-endian IFF with the COMM
    * chunk's 80-bit extended-float sample rate encoded exactly for
    * integer rates.
    */
  def encodeAiffPcm16(sampleRate: Int, channels: Int, nFrames: Int)
      (sample: Int => Int): Array[Byte] = {
    require(sampleRate > 0)
    val n = nFrames * channels
    val dataLen = n * 2
    // 80-bit extended: exp = 16383 + floor(log2 rate), mantissa left-
    // aligned to bit 63
    val hi = 63 - java.lang.Long.numberOfLeadingZeros(sampleRate.toLong).toInt
    val exp = 16383 + hi
    val mant = sampleRate.toLong << (63 - hi)
    val bb = java.nio.ByteBuffer.allocate(12 + 8 + 18 + 8 + 8 + dataLen)
      .order(java.nio.ByteOrder.BIG_ENDIAN)
    bb.put("FORM".getBytes("US-ASCII")).putInt(4 + 26 + 16 + dataLen)
      .put("AIFF".getBytes("US-ASCII"))
      .put("COMM".getBytes("US-ASCII")).putInt(18)
      .putShort(channels.toShort).putInt(nFrames).putShort(16)
      .putShort(exp.toShort).putLong(mant)
      .put("SSND".getBytes("US-ASCII")).putInt(8 + dataLen)
      .putInt(0).putInt(0)
    (0 until n).foreach(i => bb.putShort(sample(i).toShort))
    bb.array()
  }

  /** Minimal but structurally complete AVI writer shared by the two
    * frame encoders: RIFF('AVI ' LIST('hdrl' avih LIST('strl' strh
    * strf)) LIST('movi' frames)). Enough header truth (rates, counts,
    * dimensions, compression fourcc) that a real demuxer accepts it.
    */
  private def buildAvi(w: Int, h: Int, comp: Int, bits: Int,
      chunkId: String, frames: Seq[Array[Byte]]): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    def le32(v: Int): Array[Byte] = Array(
      (v & 0xff).toByte, ((v >> 8) & 0xff).toByte,
      ((v >> 16) & 0xff).toByte, ((v >> 24) & 0xff).toByte)
    def le16(v: Int): Array[Byte] =
      Array((v & 0xff).toByte, ((v >> 8) & 0xff).toByte)
    def chunk(id: String, body: Array[Byte]): Array[Byte] = {
      val pad = if (body.length % 2 == 1) Array(0.toByte) else Array.empty[Byte]
      id.getBytes("US-ASCII") ++ le32(body.length) ++ body ++ pad
    }
    def list(tpe: String, body: Array[Byte]): Array[Byte] =
      chunk("LIST", tpe.getBytes("US-ASCII") ++ body)
    val avih = le32(40000) ++ le32(w * h * 3 * 25) ++ le32(0) ++ le32(0x10) ++
      le32(frames.length) ++ le32(0) ++ le32(1) ++ le32(0) ++
      le32(w) ++ le32(h) ++ le32(0) ++ le32(0) ++ le32(0) ++ le32(0)
    val strh = "vids".getBytes("US-ASCII") ++
      (if (comp == 0) le32(0) else "MJPG".getBytes("US-ASCII")) ++
      le32(0) ++ le16(0) ++ le16(0) ++ le32(0) ++ le32(1) ++ le32(25) ++
      le32(0) ++ le32(frames.length) ++ le32(frames.map(_.length).max) ++
      le32(-1) ++ le32(0) ++ le16(0) ++ le16(0) ++ le16(w) ++ le16(h)
    val strf = le32(40) ++ le32(w) ++ le32(h) ++ le16(1) ++ le16(bits) ++
      le32(comp) ++ le32(w * h * 3) ++ le32(0) ++ le32(0) ++ le32(0) ++ le32(0)
    val hdrl = list("hdrl", chunk("avih", avih) ++
      list("strl", chunk("strh", strh) ++ chunk("strf", strf)))
    val movi = list("movi",
      frames.toArray.flatMap(f => chunk(chunkId, f)))
    val payload = "AVI ".getBytes("US-ASCII") ++ hdrl ++ movi
    bos.write("RIFF".getBytes("US-ASCII"))
    bos.write(le32(payload.length))
    bos.write(payload)
    bos.toByteArray
  }

  /** Deterministic uncompressed-DIB AVI (24-bit BGR, bottom-up, 4-byte
    * row alignment — the lossless video tier the gate oracle pins
    * analytically). `rgb(frame, x, y)` with y in TOP-DOWN coordinates.
    */
  def encodeRawAvi(w: Int, h: Int, nFrames: Int)
      (rgb: (Int, Int, Int) => (Int, Int, Int)): Array[Byte] = {
    val rowBytes = (w * 3 + 3) & ~3
    val frames = (0 until nFrames).map { f =>
      val body = new Array[Byte](rowBytes * h)
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          val (r, g, bl) = rgb(f, x, h - 1 - y) // DIB rows are bottom-up
          body(y * rowBytes + x * 3) = bl.toByte
          body(y * rowBytes + x * 3 + 1) = g.toByte
          body(y * rowBytes + x * 3 + 2) = r.toByte
          x += 1
        }
        y += 1
      }
      body
    }
    buildAvi(w, h, comp = 0, bits = 24, chunkId = "00db", frames)
  }

  /** MJPEG AVI: each frame is a standalone JPEG written by the JDK's
    * own encoder — the REAL lossy-codec tier (tests assert tolerance,
    * not bit-equality).
    */
  def encodeMjpegAvi(w: Int, h: Int, nFrames: Int)
      (rgb: (Int, Int, Int) => (Int, Int, Int)): Array[Byte] = {
    val frames = (0 until nFrames).map { f =>
      val img = new java.awt.image.BufferedImage(
        w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          val (r, g, bl) = rgb(f, x, y)
          img.setRGB(x, y, (r << 16) | (g << 8) | bl)
          x += 1
        }
        y += 1
      }
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "jpg", bos)
      bos.toByteArray
    }
    buildAvi(w, h, comp = 0x47504a4d, bits = 24, chunkId = "00dc", frames)
  }

  /** Deterministic RIFF/WAVE PCM-16 encoder — the payload generator the
    * wav gate decodes back through [[graft.expr.AudioStats]]. `sample`
    * maps the global sample index (channel-interleaved) to a signed
    * 16-bit value.
    */
  def encodeWavPcm16(sampleRate: Int, channels: Int, nFrames: Int)
      (sample: Int => Int): Array[Byte] = {
    val nSamples = nFrames * channels
    val dataLen = nSamples * 2
    val bos = java.nio.ByteBuffer.allocate(44 + dataLen)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bos.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataLen)
      .put("WAVE".getBytes("US-ASCII"))
      .put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(1).putShort(channels.toShort).putInt(sampleRate)
      .putInt(sampleRate * channels * 2).putShort((channels * 2).toShort)
      .putShort(16)
      .put("data".getBytes("US-ASCII")).putInt(dataLen)
    (0 until nSamples).foreach(i => bos.putShort(sample(i).toShort))
    bos.array()
  }

  /** Encode IEEE-float WAV (fmt 3, 32- or 64-bit little-endian) — the
    * deterministic payload generator for the float tier of
    * [[graft.expr.AudioStats]]. Samples are nominal full-scale [-1, 1].
    */
  def encodeWavFloat(sampleRate: Int, channels: Int, nFrames: Int,
      bits: Int)(sample: Int => Double): Array[Byte] = {
    require(bits == 32 || bits == 64, "float WAV is 32- or 64-bit")
    val nSamples = nFrames * channels
    val bytesPer = bits / 8
    val dataLen = nSamples * bytesPer
    val bos = java.nio.ByteBuffer.allocate(44 + dataLen)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bos.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataLen)
      .put("WAVE".getBytes("US-ASCII"))
      .put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(3).putShort(channels.toShort).putInt(sampleRate)
      .putInt(sampleRate * channels * bytesPer)
      .putShort((channels * bytesPer).toShort).putShort(bits.toShort)
      .put("data".getBytes("US-ASCII")).putInt(dataLen)
    if (bits == 32) (0 until nSamples).foreach(i => bos.putFloat(sample(i).toFloat))
    else (0 until nSamples).foreach(i => bos.putDouble(sample(i)))
    bos.array()
  }

  /** Encode WAVE_FORMAT_EXTENSIBLE (fmt 0xFFFE) carrying integer PCM-16
    * or float32 in the SubFormat GUID — the standard container for
    * >2-channel audio, and the fixture proving AudioStats resolves the
    * real format through the GUID indirection.
    */
  def encodeWavExtensible(sampleRate: Int, channels: Int, nFrames: Int,
      float32: Boolean)(sample: Int => Double): Array[Byte] = {
    val bytesPer = if (float32) 4 else 2
    val bits = bytesPer * 8
    val nSamples = nFrames * channels
    val dataLen = nSamples * bytesPer
    val bos = java.nio.ByteBuffer.allocate(12 + 8 + 40 + 8 + dataLen)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bos.put("RIFF".getBytes("US-ASCII")).putInt(4 + 48 + 8 + dataLen)
      .put("WAVE".getBytes("US-ASCII"))
      .put("fmt ".getBytes("US-ASCII")).putInt(40)
      .putShort(0xfffe.toShort).putShort(channels.toShort).putInt(sampleRate)
      .putInt(sampleRate * channels * bytesPer)
      .putShort((channels * bytesPer).toShort).putShort(bits.toShort)
      .putShort(22) // cbSize
      .putShort(bits.toShort) // wValidBitsPerSample
      .putInt(0) // dwChannelMask (unpositioned)
      // SubFormat GUID: Data1 = real format tag, then the fixed
      // KSDATAFORMAT media-subtype tail
      .putShort(if (float32) 3 else 1).putShort(0)
      .putShort(0).putShort(0x0010)
      .put(Array[Byte](0x80.toByte, 0, 0, 0xaa.toByte, 0, 0x38,
        0x9b.toByte, 0x71))
      .put("data".getBytes("US-ASCII")).putInt(dataLen)
    if (float32) (0 until nSamples).foreach(i => bos.putFloat(sample(i).toFloat))
    else (0 until nSamples).foreach(i =>
      bos.putShort(math.round(sample(i)).toShort))
    bos.array()
  }

  /** Encode per-pixel-defined RGB frames as an ANIMATED GIF with the
    * JDK's own sequence writer — the deterministic multi-frame payload
    * generator the gif-frame gate decodes back through
    * [[graft.expr.GifFrames]]. Full frames, default disposal.
    */
  def encodeAnimatedGif(w: Int, h: Int, nFrames: Int)
      (rgb: (Int, Int, Int) => (Int, Int, Int)): Array[Byte] = {
    val writer = javax.imageio.ImageIO.getImageWritersByFormatName("gif").next()
    val bos = new java.io.ByteArrayOutputStream()
    val ios = new javax.imageio.stream.MemoryCacheImageOutputStream(bos)
    try {
      writer.setOutput(ios)
      writer.prepareWriteSequence(null)
      (0 until nFrames).foreach { f =>
        val img = new java.awt.image.BufferedImage(
          w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w) {
            val (r, g, b) = rgb(f, x, y)
            img.setRGB(x, y, (r << 16) | (g << 8) | b)
            x += 1
          }
          y += 1
        }
        writer.writeToSequence(
          new javax.imageio.IIOImage(img, null, null), null)
      }
      writer.endWriteSequence()
      ios.flush()
    } finally { writer.dispose(); ios.close() }
    bos.toByteArray
  }

  /** Resize: payloads that decode as JDK images (PNG/JPEG/GIF/BMP, the
    * same tier as [[graft.expr.MediaFeatures]]) are REALLY resampled to
    * `w`×`h` with Java2D and re-encoded as lossless PNG
    * ([[graft.expr.MediaResize]]) — decode the output back and you get
    * the rescaled pixels. Non-image payloads (codecs the JDK lacks)
    * fall back to the deterministic byte truncation/pad stub (w·h
    * bytes, 1 "byte per pixel") so the column stays total and the
    * schema flow — payload replaced in place, metadata updated, output
    * size bounded regardless of input — holds for every media type.
    */
  def resize(media: DataFrame, w: Int, h: Int): DataFrame = {
    require(w > 0 && h > 0, "target dimensions must be positive")
    import org.apache.spark.sql.graftbridge.Bridge
    val target = w * h
    val imageTier = Bridge.column(
      graft.expr.MediaResize(Bridge.expression(col("payload")), w, h))
    val stubTier =
      rpad(col("payload").cast("string").substr(lit(1), lit(target)), target, " ")
        .cast("binary")
    media
      .withColumn("payload", coalesce(imageTier, stubTier))
      .withColumn("width", lit(w))
      .withColumn("height", lit(h))
  }

  /** Encode a per-pixel-defined RGB image with the JDK's own encoders —
    * the deterministic payload generator the image-stats gate and specs
    * decode back through [[graft.expr.MediaFeatures]]. `fmt` is any
    * writer the JDK ships ("png", "gif", "bmp", "jpg").
    */
  def encodeImage(w: Int, h: Int, fmt: String)
      (rgb: (Int, Int) => (Int, Int, Int)): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val (r, g, b) = rgb(x, y)
        img.setRGB(x, y, (r << 16) | (g << 8) | b)
        x += 1
      }
      y += 1
    }
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, fmt, bos)
    bos.toByteArray
  }

  val featureSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("n_bytes", IntegerType, nullable = false),
    StructField("byte_hash", LongType, nullable = false),
    StructField("width", IntegerType, nullable = true),
    StructField("height", IntegerType, nullable = true),
    StructField("features", ArrayType(DoubleType, containsNull = false), nullable = false)))

  /** Feature extraction over the opaque payload column.
    *
    * The decode ([[graft.expr.MediaFeatures]]) is a native expression that
    * stays inside the scan pipeline (pruning and pushdown intact, no RDD
    * round-trip): JDK-decodable images (PNG/JPEG/GIF/BMP via javax.imageio)
    * yield REAL width/height and per-channel pixel means; everything else
    * takes the deterministic byte-hash fallback with NULL dimensions. For
    * codec families needing native libraries, move the call behind
    * `mapInPandas`/`mapPartitions` to amortize codec init per batch; the
    * schema and callers don't change.
    */
  def extractFeatures(media: DataFrame): DataFrame = {
    import org.apache.spark.sql.graftbridge.Bridge
    val payload = coalesce(col("payload"), lit(Array.empty[Byte]))
    media.select(col("media_id"),
      Bridge.column(graft.expr.MediaFeatures(Bridge.expression(payload))).as("_f"))
      .select(col("media_id"), col("_f.n_bytes").as("n_bytes"),
        col("_f.byte_hash").as("byte_hash"),
        col("_f.width").as("width"), col("_f.height").as("height"),
        col("_f.features").as("features"))
  }
}
