package graft.operators

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing: opaque binary payloads + typed metadata,
  * with per-partition feature extraction.
  *
  * The decode step is REAL for images and audio: the default
  * [[mediaDecoder]] sniffs the payload magic and decodes PNG/BMP through
  * the pure-JVM `javax.imageio` codecs and PCM WAV through
  * `javax.sound.sampled` (both present in every JRE — no new dependency)
  * into deterministic byte layouts. Payloads that are not a supported
  * format (e.g. the text/plain fixtures, video) fall back to the
  * identity mapping, so byte-level plumbing keeps working for arbitrary
  * media; no video codec ships with the JRE, so a production pipeline
  * passes its own as the `decode` parameter. Everything around the
  * decode is the real Spark plumbing a 100 TB pipeline needs and is
  * tested:
  *  - `binary` payload column + `struct` metadata through scan/shuffle/sink;
  *  - batched per-partition extraction via `mapPartitions` (one iterator
  *    per task — the Scala analogue of `mapInPandas`: amortizes model/codec
  *    init per partition instead of per row, the pattern a real decoder
  *    plugs into);
  *  - fixed-width feature vectors (`array<float>`) out, ready for the
  *    Similarity operators.
  */
object Multimodal {

  /** documents -> multimodal layout: (doc_id, payload binary, meta struct).
    * Text bytes stand in for media bytes. */
  def toMultimodal(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id"),
      encode(col("text"), "UTF-8").as("payload"),
      struct(
        lit("text/plain").as("kind"),
        octet_length(encode(col("text"), "UTF-8")).cast("long").as("n_bytes"),
        col("source").as("origin")).as("meta"))

  private val featureSchema = StructType(Seq(
    StructField("doc_id", LongType, nullable = false),
    StructField("features", ArrayType(FloatType, containsNull = false))))

  /** A payload decoder: raw stored bytes -> decoded media bytes. Runs on
    * executors, so implementations must be serializable (a plain function
    * literal or a static method reference is). */
  type Decoder = Array[Byte] => Array[Byte]

  /** Identity decoder — the fallback for payload formats without a JRE
    * codec (plain text, video). A real pipeline passes its codec call as
    * the `decode` parameter of [[sampleFrames]]/[[resizePayloads]]/
    * [[extractFeatures]] and keeps everything else unchanged. */
  val identityDecoder: Decoder = payload => payload

  private def isPng(b: Array[Byte]): Boolean =
    b.length > 8 && b(0) == 0x89.toByte && b(1) == 'P' && b(2) == 'N' &&
      b(3) == 'G' && b(4) == 0x0d && b(5) == 0x0a && b(6) == 0x1a && b(7) == 0x0a
  private def isBmp(b: Array[Byte]): Boolean =
    b.length > 2 && b(0) == 'B' && b(1) == 'M'
  private def isJpeg(b: Array[Byte]): Boolean =
    b.length > 3 && b(0) == 0xFF.toByte && b(1) == 0xD8.toByte &&
      b(2) == 0xFF.toByte
  private def isGif(b: Array[Byte]): Boolean =
    b.length > 6 && b(0) == 'G' && b(1) == 'I' && b(2) == 'F' &&
      b(3) == '8' && (b(4) == '7' || b(4) == '9') && b(5) == 'a'

  /** REAL image decoder (the default `decode`): payloads carrying a PNG,
    * BMP, GIF, or JPEG magic number decode through the pure-JVM
    * `javax.imageio` codecs into the deterministic layout
    * `[width int32 BE][height int32 BE][R G B per pixel, row-major]` —
    * PNG/BMP decoding is lossless, so the pixel bytes are identical on any
    * JVM and the correctness oracle can predict them exactly. JPEG —
    * the dominant format of any real web image corpus — is lossy: its
    * decoded pixels are deterministic for a given JPEG library but NOT
    * analytically predictable, so JPEG gates use the measured-verdict
    * pattern (exact dimensions + pixel statistics within a pinned
    * tolerance) instead of exact pixel prediction, and the dHash
    * fingerprint — built on block MEANS, which JPEG's DCT quantization
    * preserves — carries near-dup detection across the lossy boundary.
    * Anything else (unsupported format, corrupt image) falls back to the
    * identity mapping rather than failing the task: at corpus scale a few
    * broken payloads must not kill a 10-hour job, and the fallback keeps
    * the byte-level plumbing total. */
  val imageDecoder: Decoder = payload => {
    if (!isPng(payload) && !isBmp(payload) && !isJpeg(payload) &&
      !isGif(payload)) payload
    else {
      val img =
        try javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(payload))
        catch { case _: java.io.IOException => null }
      if (img == null) payload
      else {
        val w = img.getWidth
        val h = img.getHeight
        val out = new Array[Byte](8 + 3 * w * h)
        out(0) = (w >> 24).toByte; out(1) = (w >> 16).toByte
        out(2) = (w >> 8).toByte; out(3) = w.toByte
        out(4) = (h >> 24).toByte; out(5) = (h >> 16).toByte
        out(6) = (h >> 8).toByte; out(7) = h.toByte
        var idx = 8
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w) {
            val rgb = img.getRGB(x, y)
            out(idx) = ((rgb >> 16) & 0xFF).toByte
            out(idx + 1) = ((rgb >> 8) & 0xFF).toByte
            out(idx + 2) = (rgb & 0xFF).toByte
            idx += 3
            x += 1
          }
          y += 1
        }
        out
      }
    }
  }

  /** Deterministic grayscale PNG encoder for fixtures/gates: pixel index
    * `i = y*w + x` gets gray level `gray(i)` (masked to 0..255) in all
    * three channels. Uses the JRE's own PNG writer, so the
    * [[imageDecoder]] round-trip exercises the real codec path end to
    * end. */
  def synthPng(w: Int, h: Int, gray: Int => Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val v = gray(y * w + x) & 0xFF
        img.setRGB(x, y, (v << 16) | (v << 8) | v)
        x += 1
      }
      y += 1
    }
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  /** Deterministic grayscale GIF encoder for fixtures/gates: same pixel
    * contract as [[synthPng]] through the JRE's own GIF writer. The
    * image is built TYPE_BYTE_INDEXED over an explicit 256-level gray
    * palette, so the writer emits the palette as-is (no quantization) —
    * GIF is lossless here like PNG/BMP and the oracle predicts decoded
    * pixels exactly. Caveat pinned by GifSpec: the JRE codec scrambles
    * row order for images under 5 rows tall (measured: h<=4 wrong, h>=5
    * exact at every probed width) — fixtures must use h >= 5. */
  def synthGif(w: Int, h: Int, gray: Int => Int): Array[Byte] = {
    val grays = Array.tabulate(256)(_.toByte)
    val cm = new java.awt.image.IndexColorModel(8, 256, grays, grays, grays)
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_BYTE_INDEXED, cm)
    val raster = img.getRaster
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        raster.setSample(x, y, 0, gray(y * w + x) & 0xFF)
        x += 1
      }
      y += 1
    }
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "gif", bos)
    bos.toByteArray
  }

  /** Deterministic grayscale JPEG encoder for fixtures/gates: same pixel
    * contract as [[synthPng]] but through the JRE's own lossy JPEG writer
    * at an explicit `quality`, so the [[imageDecoder]] JPEG leg exercises
    * the real encode→decode round trip a web corpus would (chroma is zero
    * on gray pixels, so subsampling costs nothing; the luma loss is what
    * the tolerance gates measure). */
  def synthJpeg(w: Int, h: Int, gray: Int => Int,
                quality: Float = 0.95f): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val v = gray(y * w + x) & 0xFF
        img.setRGB(x, y, (v << 16) | (v << 8) | v)
        x += 1
      }
      y += 1
    }
    val writer = javax.imageio.ImageIO.getImageWritersByFormatName("jpeg").next()
    val param = writer.getDefaultWriteParam
    param.setCompressionMode(javax.imageio.ImageWriteParam.MODE_EXPLICIT)
    param.setCompressionQuality(quality)
    val bos = new java.io.ByteArrayOutputStream()
    val ios = javax.imageio.ImageIO.createImageOutputStream(bos)
    try {
      writer.setOutput(ios)
      writer.write(null, new javax.imageio.IIOImage(img, null, null), param)
    } finally { writer.dispose(); ios.close() }
    bos.toByteArray
  }

  private def isWav(b: Array[Byte]): Boolean =
    b.length > 12 && b(0) == 'R' && b(1) == 'I' && b(2) == 'F' && b(3) == 'F' &&
      b(8) == 'W' && b(9) == 'A' && b(10) == 'V' && b(11) == 'E'

  /** REAL audio decoder: payloads carrying a RIFF/WAVE magic decode
    * through the JRE's own `javax.sound.sampled` codec into the
    * deterministic layout
    * `[sampleRate int32 BE][channels int32 BE][PCM frames as stored]`.
    * PCM WAV is lossless, so the sample bytes are identical on any JVM.
    * Non-WAV or corrupt payloads fall back to the identity mapping (same
    * rationale as [[imageDecoder]]). */
  val wavDecoder: Decoder = payload => {
    if (!isWav(payload)) payload
    else {
      val in =
        try javax.sound.sampled.AudioSystem.getAudioInputStream(
          new java.io.ByteArrayInputStream(payload))
        catch {
          case _: javax.sound.sampled.UnsupportedAudioFileException => null
          case _: java.io.IOException => null
        }
      if (in == null) payload
      else
        try {
          val fmt = in.getFormat
          val pcm = in.readAllBytes()
          val rate = math.round(fmt.getSampleRate)
          val ch = fmt.getChannels
          val out = new Array[Byte](8 + pcm.length)
          out(0) = (rate >> 24).toByte; out(1) = (rate >> 16).toByte
          out(2) = (rate >> 8).toByte; out(3) = rate.toByte
          out(4) = (ch >> 24).toByte; out(5) = (ch >> 16).toByte
          out(6) = (ch >> 8).toByte; out(7) = ch.toByte
          System.arraycopy(pcm, 0, out, 8, pcm.length)
          out
        } finally in.close()
    }
  }

  /** Default decode: sniffs the payload magic and routes to the real JRE
    * codec — PNG/BMP via [[imageDecoder]], PCM WAV via [[wavDecoder]] —
    * with identity as the unknown-format fallback. Video stays identity:
    * no video codec ships with the JRE, so a production pipeline injects
    * its own (the `decode` parameter exists for exactly that). */
  val mediaDecoder: Decoder = payload =>
    if (isWav(payload)) wavDecoder(payload) else imageDecoder(payload)

  /** Deterministic mono 16-bit-LE PCM WAV encoder for fixtures/gates:
    * sample i is `samples(i)`. Uses the JRE's own WAV writer, so the
    * [[wavDecoder]] round-trip exercises the real codec path. */
  def synthWav(sampleRate: Int, samples: Array[Short]): Array[Byte] = {
    val pcm = new Array[Byte](2 * samples.length)
    var i = 0
    while (i < samples.length) {
      pcm(2 * i) = (samples(i) & 0xFF).toByte
      pcm(2 * i + 1) = ((samples(i) >> 8) & 0xFF).toByte
      i += 1
    }
    val fmt = new javax.sound.sampled.AudioFormat(sampleRate.toFloat, 16, 1, true, false)
    val stream = new javax.sound.sampled.AudioInputStream(
      new java.io.ByteArrayInputStream(pcm), fmt, samples.length.toLong)
    val bos = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(stream,
      javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
    bos.toByteArray
  }

  private val audioStatsSchema = StructType(Seq(
    StructField("doc_id", LongType, nullable = false),
    StructField("sample_rate", LongType, nullable = false),
    StructField("channels", LongType, nullable = false),
    StructField("n_samples", LongType, nullable = false),
    StructField("sum_samples", LongType, nullable = false)))

  /** Decoded-audio statistics: runs [[wavDecoder]] on each payload,
    * parses the `[rate][channels][PCM]` layout (16-bit LE signed
    * samples), and emits rate/channels/sample count/exact sample sum —
    * the oracle-checkable core of audio feature extraction. Payloads that
    * did not decode emit -1 rates with zero counts. */
  def decodeAudioStats(spark: SparkSession, mm: DataFrame,
                       decode: Decoder = wavDecoder): DataFrame = {
    val rows = mm.select(col("doc_id"), col("payload")).rdd.mapPartitions { it =>
      it.map { r =>
        val id = r.getLong(0)
        val raw = r.getAs[Array[Byte]](1)
        val dec = decode(raw)
        val decoded = !(dec eq raw) && dec.length >= 8 && (dec.length - 8) % 2 == 0
        if (!decoded) Row(id, -1L, -1L, 0L, 0L)
        else {
          val rate = ((dec(0) & 0xFF) << 24) | ((dec(1) & 0xFF) << 16) |
            ((dec(2) & 0xFF) << 8) | (dec(3) & 0xFF)
          val ch = ((dec(4) & 0xFF) << 24) | ((dec(5) & 0xFF) << 16) |
            ((dec(6) & 0xFF) << 8) | (dec(7) & 0xFF)
          val n = (dec.length - 8) / 2
          var sum = 0L
          var i = 0
          while (i < n) {
            sum += ((dec(8 + 2 * i) & 0xFF) | (dec(9 + 2 * i) << 8)).toShort
            i += 1
          }
          Row(id, rate.toLong, ch.toLong, n.toLong, sum)
        }
      }
    }
    spark.createDataFrame(rows, audioStatsSchema)
  }

  private val imageStatsSchema = StructType(
    StructField("doc_id", LongType, nullable = false) +:
      StructField("width", LongType, nullable = false) +:
      StructField("height", LongType, nullable = false) +:
      (0 until 16).map(b => StructField(s"c$b", LongType, nullable = false)))

  private val dhashSchema = StructType(Seq(
    StructField("doc_id", LongType, nullable = false),
    StructField("dhash", StringType, nullable = true)))

  /** dHash (difference hash) perceptual image fingerprint over the REAL
    * decoded pixel stream — the image leg of near-duplicate detection
    * (re-encodes, slight crops and brightness shifts keep ~the same
    * fingerprint; distinct images differ in ~half the bits). 9x8
    * block-mean grid with integer floor boundaries (cell of pixel x =
    * x*9/w), one bit per horizontally adjacent cell pair, row-major —
    * 64 bits emitted as a '0'/'1' string (engine-portable; no signed-64
    * construction pitfalls in the oracle).
    *
    * Determinism is EXACT, not approximate: block means are never
    * divided — the comparison mean_l > mean_r is evaluated as
    * sum_l * n_r > sum_r * n_l in integer arithmetic, so the fingerprint
    * is bit-identical on any engine, partitioning, or FPU. Grayscale
    * reads the R channel of the decoded [w][h][RGB] layout (the synth
    * fixtures are R=G=B; a real color pipeline would luma-convert first
    * — same plumbing). Images smaller than the 9x8 grid, or payloads
    * that did not decode, emit a null dhash (excluded from pairing). */
  def imageDHash(spark: SparkSession, mm: DataFrame,
                 decode: Decoder = imageDecoder): DataFrame = {
    val rows = mm.select(col("doc_id"), col("payload")).rdd.mapPartitions { it =>
      it.map { r =>
        Row(r.getLong(0), dhashOfDecoded(decode(r.getAs[Array[Byte]](1))))
      }
    }
    spark.createDataFrame(rows, dhashSchema)
  }

  /** dHash of an already-decoded `[w][h][RGB]` buffer (see [[imageDHash]]
    * for the contract); null when the buffer is not that layout or the
    * image is smaller than the 9x8 grid. Shared by the single-image and
    * per-video-frame paths. */
  private def dhashOfDecoded(dec: Array[Byte]): String = {
    var res: String = null
    if (dec.length >= 8) {
      val w = ((dec(0) & 0xFF) << 24) | ((dec(1) & 0xFF) << 16) |
        ((dec(2) & 0xFF) << 8) | (dec(3) & 0xFF)
      val h = ((dec(4) & 0xFF) << 24) | ((dec(5) & 0xFF) << 16) |
        ((dec(6) & 0xFF) << 8) | (dec(7) & 0xFF)
      // Bound check in Long: a corrupt header's large w*h overflows Int
      // arithmetic and could pass an Int-typed bound, then blow up the
      // pixel loop — undecodable payloads must yield null, not a task
      // failure. (Negative w/h are already excluded by the >= checks;
      // any w*h the Long bound admits genuinely fits the buffer.)
      if (w >= 9 && h >= 8 && dec.length.toLong >= 8L + 3L * w * h) {
        val sums = Array.ofDim[Long](8, 9)
        val cnts = Array.ofDim[Long](8, 9)
        var y = 0
        while (y < h) {
          val cy = y * 8 / h
          var x = 0
          while (x < w) {
            val cx = x * 9 / w
            sums(cy)(cx) += (dec(8 + 3 * (y * w + x)) & 0xFF).toLong
            cnts(cy)(cx) += 1L
            x += 1
          }
          y += 1
        }
        val sb = new StringBuilder(64)
        var cy = 0
        while (cy < 8) {
          var cx = 0
          while (cx < 8) {
            val l = sums(cy)(cx) * cnts(cy)(cx + 1)
            val rr = sums(cy)(cx + 1) * cnts(cy)(cx)
            sb.append(if (l > rr) '1' else '0')
            cx += 1
          }
          cy += 1
        }
        res = sb.toString
      }
    }
    res
  }

  /** Pigeonhole-blocked hamming pairs over a (doc_id, fingerprint) frame
    * of 64-char '0'/'1' strings: 64 bits split into 8 blocks of 8 —
    * hamming <= 7 forces at least one identical block, so candidates come
    * from an equi-join on (block index, block bits) instead of all-pairs
    * — then exact hamming verify on the survivors. The [[Dedup
    * .simhashPairs]] blocking discipline, shared by the image and audio
    * fingerprint pair generators. */
  private def hammingPairs(hashed: DataFrame, hashCol: String,
                           maxDist: Int): DataFrame = {
    require(maxDist >= 0 && maxDist <= 7,
      s"maxDist=$maxDist outside the 8-block pigeonhole bound [0, 7]")
    val dh = hashed.select(col("doc_id"), col(hashCol).as("h"))
      .filter(col("h").isNotNull)
    val blocks = dh.select(col("doc_id"), col("h"),
      explode(expr(
        "transform(sequence(0, 7), b -> struct(b AS bi, substring(h, b*8 + 1, 8) AS bits))"))
        .as("blk"))
      .select(col("doc_id"), col("h"), col("blk.bi"), col("blk.bits"))
    val cand = blocks.as("a").join(blocks.as("b"),
        col("a.bi") === col("b.bi") && col("a.bits") === col("b.bits") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("a_id"), col("a.h").as("a_h"),
        col("b.doc_id").as("b_id"), col("b.h").as("b_h"))
      .distinct()
    cand
      .withColumn("hamming", expr(
        "aggregate(zip_with(split(a_h, ''), split(b_h, ''), (x, y) -> IF(x = y, 0, 1)), 0, (acc, v) -> acc + v)")
        .cast("long"))
      .filter(col("hamming") <= maxDist)
      .select(col("a_id"), col("b_id"), col("hamming"))
  }

  /** Perceptual near-dup image pairs: [[imageDHash]] fingerprints through
    * the shared pigeonhole + exact-hamming funnel.
    * Output: (a_id, b_id, hamming), a_id < b_id, hamming <= maxDist. */
  def dhashPairs(spark: SparkSession, mm: DataFrame, maxDist: Int = 6,
                 decode: Decoder = imageDecoder): DataFrame =
    hammingPairs(imageDHash(spark, mm, decode), "dhash", maxDist)

  private val afpSchema = StructType(Seq(
    StructField("doc_id", LongType, nullable = false),
    StructField("afp", StringType, nullable = true)))

  /** Audio envelope fingerprint over the REAL decoded PCM stream — the
    * audio leg of perceptual near-dup detection. The sample stream splits
    * into 65 equal frames (integer boundaries f = i*65/n), each frame's
    * loudness is the exact integer sum of |sample|, and each of the 64
    * bits compares adjacent frame MEANS by cross-multiplication
    * (sum_l * n_r > sum_r * n_l — no division, no floats), so the
    * fingerprint is bit-identical on any engine and VOLUME-INVARIANT by
    * construction: scaling every sample scales both sides of every
    * comparison equally. Re-encodes and level changes keep the
    * fingerprint; different material differs in ~half the bits.
    * Null for payloads that did not decode or carry < 65 samples. */
  def audioFingerprint(spark: SparkSession, mm: DataFrame,
                       decode: Decoder = wavDecoder): DataFrame = {
    val rows = mm.select(col("doc_id"), col("payload")).rdd.mapPartitions { it =>
      it.map { r =>
        val id = r.getLong(0)
        val raw = r.getAs[Array[Byte]](1)
        val dec = decode(raw)
        val decoded = !(dec eq raw) && dec.length >= 8 && (dec.length - 8) % 2 == 0
        var res: String = null
        if (decoded) {
          val n = (dec.length - 8) / 2
          if (n >= 65) {
            val e = new Array[Long](65)
            val c = new Array[Long](65)
            var i = 0
            while (i < n) {
              val s = ((dec(8 + 2 * i) & 0xFF) | (dec(9 + 2 * i) << 8)).toShort
              val f = (i.toLong * 65 / n).toInt
              e(f) += math.abs(s.toLong)
              c(f) += 1L
              i += 1
            }
            val sb = new StringBuilder(64)
            var j = 0
            while (j < 64) {
              sb.append(if (e(j) * c(j + 1) > e(j + 1) * c(j)) '1' else '0')
              j += 1
            }
            res = sb.toString
          }
        }
        Row(id, res)
      }
    }
    spark.createDataFrame(rows, afpSchema)
  }

  /** Perceptual near-dup audio pairs: [[audioFingerprint]] through the
    * shared pigeonhole + exact-hamming funnel. */
  def audioPairs(spark: SparkSession, mm: DataFrame, maxDist: Int = 4,
                 decode: Decoder = wavDecoder): DataFrame =
    hammingPairs(audioFingerprint(spark, mm, decode), "afp", maxDist)

  // ------------------------------------------------------------------
  // GFV1 video container
  // ------------------------------------------------------------------

  /** Synthesize a GFV1 container: `GFV1` magic + frame count (int32 BE) +
    * per frame `[length int32 BE][PNG bytes]`. GFV1 is this library's
    * own demo container: no video codec or container parser ships with
    * the JRE, so the DEMUX layer here is real library code and every
    * frame decodes through the REAL PNG codec — the honest upgrade over
    * the identity fallback while staying dependency-free. A production
    * pipeline swaps [[demuxVideo]] + the frame `decode` for its
    * ffmpeg-backed equivalents; every operator above the seam is
    * unchanged. */
  def synthVideo(frames: Seq[Array[Byte]]): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    val out = new java.io.DataOutputStream(bos)
    out.write(Array[Byte]('G', 'F', 'V', '1'))
    out.writeInt(frames.length)
    frames.foreach { f => out.writeInt(f.length); out.write(f) }
    out.flush()
    bos.toByteArray
  }

  /** Demux a video container into its frame payloads: GFV1 (exact-oracle
    * demo container) or MJPEG-in-AVI (the real-world RIFF container —
    * see [[demuxAvi]]); None unless the payload is a well-formed
    * instance of either (truncated lengths reject the whole container
    * rather than yielding partial frames). */
  def demuxVideo(payload: Array[Byte]): Option[Seq[Array[Byte]]] =
    if (isAvi(payload)) demuxAvi(payload) else demuxGfv1(payload)

  private def demuxGfv1(payload: Array[Byte]): Option[Seq[Array[Byte]]] = {
    if (payload.length < 8 || payload(0) != 'G' || payload(1) != 'F' ||
      payload(2) != 'V' || payload(3) != '1') return None
    val in = new java.io.DataInputStream(new java.io.ByteArrayInputStream(payload))
    try {
      in.skipBytes(4)
      val n = in.readInt()
      if (n < 0) return None
      val frames = Vector.newBuilder[Array[Byte]]
      var i = 0
      while (i < n) {
        val len = in.readInt()
        if (len < 0 || len > in.available()) return None
        val buf = new Array[Byte](len)
        in.readFully(buf)
        frames += buf
        i += 1
      }
      Some(frames.result())
    } catch { case _: java.io.IOException => None }
  }

  // ------------------------------------------------------------------
  // MJPEG-in-AVI: the real-world video container
  // ------------------------------------------------------------------

  private def isAvi(b: Array[Byte]): Boolean =
    b.length > 12 && b(0) == 'R' && b(1) == 'I' && b(2) == 'F' && b(3) == 'F' &&
      b(8) == 'A' && b(9) == 'V' && b(10) == 'I' && b(11) == ' '

  private def fourcc(b: Array[Byte], off: Int): String =
    new String(b, off, 4, java.nio.charset.StandardCharsets.US_ASCII)

  private def u32le(b: Array[Byte], off: Int): Long =
    ((b(off) & 0xFFL)) | ((b(off + 1) & 0xFFL) << 8) |
      ((b(off + 2) & 0xFFL) << 16) | ((b(off + 3) & 0xFFL) << 24)

  /** Demux an MJPEG-in-AVI payload into its per-frame JPEG bytes — a
    * pure-JRE RIFF walker (the same chunk grammar the WAV decoder rides):
    * finds the `LIST movi` chunk and collects every `##dc`/`##db` video
    * chunk's body in stream order, honoring RIFF even-byte padding.
    * Returns None for anything that is not a structurally sound AVI
    * (bad magic, truncated chunk, movi list missing) — a corrupt file
    * rejects whole rather than yielding partial frames. The frames then
    * decode through the real JPEG leg of [[imageDecoder]], so the whole
    * video near-dup path runs on a container and codec a production
    * corpus actually contains. */
  def demuxAvi(payload: Array[Byte]): Option[Seq[Array[Byte]]] = {
    if (!isAvi(payload)) return None
    val fileEnd = math.min(payload.length.toLong, 8L + u32le(payload, 4)).toInt
    var p = 12
    while (p + 8 <= fileEnd) {
      val id = fourcc(payload, p)
      val sz = u32le(payload, p + 4)
      if (p + 8 + sz > fileEnd) return None
      if (id == "LIST" && sz >= 4 && fourcc(payload, p + 8) == "movi") {
        val moviEnd = p + 8 + sz.toInt
        val frames = Vector.newBuilder[Array[Byte]]
        var q = p + 12
        while (q + 8 <= moviEnd) {
          val cid = fourcc(payload, q)
          val csz = u32le(payload, q + 4)
          if (q + 8 + csz > moviEnd) return None
          val isVideoChunk = cid.length == 4 &&
            cid(0).isDigit && cid(1).isDigit &&
            (cid.endsWith("dc") || cid.endsWith("db"))
          if (isVideoChunk)
            frames += java.util.Arrays.copyOfRange(payload, q + 8,
              q + 8 + csz.toInt)
          q += 8 + csz.toInt + (csz & 1L).toInt
        }
        return Some(frames.result())
      }
      p += 8 + sz.toInt + (sz & 1L).toInt
    }
    None
  }

  /** Synthesize a structurally complete MJPEG-in-AVI container for
    * fixtures/gates: RIFF header, `hdrl` list (avih main header + one
    * `vids`/`MJPG` stream with its BITMAPINFOHEADER), and the `movi`
    * list with one `00dc` chunk per JPEG frame (even-byte padded) — the
    * layout any AVI-writing tool produces, so [[demuxAvi]] is exercised
    * against the real grammar rather than a shortcut. */
  def synthAvi(frames: Seq[Array[Byte]], w: Int, h: Int,
               fps: Int = 25): Array[Byte] = {
    require(frames.nonEmpty, "synthAvi needs at least one frame")
    val bos = new java.io.ByteArrayOutputStream()
    def w16(o: java.io.ByteArrayOutputStream, v: Int): Unit = {
      o.write(v & 0xFF); o.write((v >> 8) & 0xFF)
    }
    def w32(o: java.io.ByteArrayOutputStream, v: Long): Unit = {
      o.write((v & 0xFF).toInt); o.write(((v >> 8) & 0xFF).toInt)
      o.write(((v >> 16) & 0xFF).toInt); o.write(((v >> 24) & 0xFF).toInt)
    }
    def cc(o: java.io.ByteArrayOutputStream, s: String): Unit =
      o.write(s.getBytes(java.nio.charset.StandardCharsets.US_ASCII))
    val maxFrame = frames.map(_.length).max.toLong

    // strh: 'vids'/'MJPG' stream header (56 bytes)
    val strh = new java.io.ByteArrayOutputStream()
    cc(strh, "vids"); cc(strh, "MJPG")
    w32(strh, 0); w16(strh, 0); w16(strh, 0) // flags, priority, language
    w32(strh, 0) // initial frames
    w32(strh, 1); w32(strh, fps.toLong) // scale, rate
    w32(strh, 0); w32(strh, frames.length.toLong) // start, length
    w32(strh, maxFrame); w32(strh, 0xFFFFFFFFL); w32(strh, 0) // bufsize, quality, samplesize
    w16(strh, 0); w16(strh, 0); w16(strh, w); w16(strh, h) // rcFrame

    // strf: BITMAPINFOHEADER (40 bytes)
    val strf = new java.io.ByteArrayOutputStream()
    w32(strf, 40); w32(strf, w.toLong); w32(strf, h.toLong)
    w16(strf, 1); w16(strf, 24) // planes, bit count
    cc(strf, "MJPG"); w32(strf, w.toLong * h * 3)
    w32(strf, 0); w32(strf, 0); w32(strf, 0); w32(strf, 0)

    val strl = new java.io.ByteArrayOutputStream()
    cc(strl, "strl")
    cc(strl, "strh"); w32(strl, strh.size().toLong); strl.write(strh.toByteArray)
    cc(strl, "strf"); w32(strl, strf.size().toLong); strl.write(strf.toByteArray)

    // avih: MainAVIHeader (56 bytes = 14 u32)
    val avih = new java.io.ByteArrayOutputStream()
    w32(avih, 1000000L / fps); w32(avih, 0); w32(avih, 0)
    w32(avih, 0x10) // AVIF_HASINDEX off, AVIF_WASCAPTUREFILE-style flags kept 0x10
    w32(avih, frames.length.toLong); w32(avih, 0); w32(avih, 1)
    w32(avih, maxFrame); w32(avih, w.toLong); w32(avih, h.toLong)
    w32(avih, 0); w32(avih, 0); w32(avih, 0); w32(avih, 0)

    val hdrl = new java.io.ByteArrayOutputStream()
    cc(hdrl, "hdrl")
    cc(hdrl, "avih"); w32(hdrl, avih.size().toLong); hdrl.write(avih.toByteArray)
    cc(hdrl, "LIST"); w32(hdrl, strl.size().toLong); hdrl.write(strl.toByteArray)

    val movi = new java.io.ByteArrayOutputStream()
    cc(movi, "movi")
    frames.foreach { f =>
      cc(movi, "00dc"); w32(movi, f.length.toLong); movi.write(f)
      if ((f.length & 1) == 1) movi.write(0)
    }

    val body = new java.io.ByteArrayOutputStream()
    cc(body, "AVI ")
    cc(body, "LIST"); w32(body, hdrl.size().toLong); body.write(hdrl.toByteArray)
    cc(body, "LIST"); w32(body, movi.size().toLong); body.write(movi.toByteArray)

    cc(bos, "RIFF"); w32(bos, body.size().toLong); bos.write(body.toByteArray)
    bos.toByteArray
  }

  private val videoDhashSchema = StructType(Seq(
    StructField("doc_id", LongType, nullable = false),
    StructField("frame_idx", LongType, nullable = false),
    StructField("dhash", StringType, nullable = true)))

  /** Per-frame dHash fingerprints of GFV1 videos: real container demux,
    * real per-frame PNG decode, shared dhash core. Non-video payloads
    * contribute no rows; an undecodable or sub-grid frame yields a null
    * dhash row (its video is excluded from pairing). */
  def videoFrameDHash(spark: SparkSession, mm: DataFrame,
                     decode: Decoder = imageDecoder): DataFrame = {
    val rows = mm.select(col("doc_id"), col("payload")).rdd.mapPartitions { it =>
      it.flatMap { r =>
        val id = r.getLong(0)
        demuxVideo(r.getAs[Array[Byte]](1)).toSeq.flatMap { frames =>
          frames.iterator.zipWithIndex.map { case (f, idx) =>
            Row(id, idx.toLong, dhashOfDecoded(decode(f)))
          }
        }
      }
    }
    spark.createDataFrame(rows, videoDhashSchema)
  }

  /** Perceptual near-dup VIDEO pairs: same frame count and EVERY aligned
    * frame within `maxDist` hamming (strict alignment — trims/reorders
    * are different videos here; sampling-tolerant matching would compare
    * [[sampleFrames]] output instead). Candidates come from the frame-0
    * pigeonhole block join — a true pair's first frames are within
    * maxDist <= 7, so they share an 8-bit block — and the aligned-frame
    * verify joins per-frame fingerprints only for surviving pairs.
    * Output: (a_id, b_id, n_frames, max_hamming). */
  def videoPairs(spark: SparkSession, mm: DataFrame, maxDist: Int = 6,
                 decode: Decoder = imageDecoder): DataFrame = {
    require(maxDist >= 0 && maxDist <= 7,
      s"maxDist=$maxDist outside the 8-block pigeonhole bound [0, 7]")
    // localCheckpoint (r18, guide §1.2/§5): the per-frame fingerprint
    // frame feeds FOUR differently-keyed exchanges below (ok, frame-0
    // blocks, fa, fb), none of which ReuseExchange can dedupe — without
    // it the RDD-backed demux + per-frame decode chain (and the caller's
    // payload source) re-executes once per consumer. The checkpointed
    // frame is per-frame fingerprints only — tiny relative to the
    // payload bytes it derives from, the right thing to pin at any scale.
    val fh = videoFrameDHash(spark, mm, decode).localCheckpoint()
    val ok = fh.groupBy(col("doc_id"))
      .agg(count(lit(1)).as("nf"),
        sum(col("dhash").isNull.cast("long")).as("bad"))
      .filter(col("bad") === 0).select(col("doc_id"), col("nf"))
    val f0 = fh.filter(col("frame_idx") === 0).join(ok, Seq("doc_id"))
    val blocks = f0.select(col("doc_id"),
      explode(expr(
        "transform(sequence(0, 7), b -> struct(b AS bi, substring(dhash, b*8 + 1, 8) AS bits))"))
        .as("blk"))
      .select(col("doc_id"), col("blk.bi"), col("blk.bits"))
    val cand = blocks.as("a").join(blocks.as("b"),
        col("a.bi") === col("b.bi") && col("a.bits") === col("b.bits") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("a_id"), col("b.doc_id").as("b_id"))
      .distinct()
    val fa = fh.select(col("doc_id").as("a_id"), col("frame_idx"),
      col("dhash").as("ha"))
    val fb = fh.select(col("doc_id").as("b_id"), col("frame_idx"),
      col("dhash").as("hb"))
    cand
      .join(ok.select(col("doc_id").as("a_id"), col("nf").as("nfa")), Seq("a_id"))
      .join(ok.select(col("doc_id").as("b_id"), col("nf").as("nfb")), Seq("b_id"))
      .filter(col("nfa") === col("nfb"))
      .join(fa, Seq("a_id"))
      .join(fb, Seq("b_id", "frame_idx"))
      .withColumn("hd", expr(
        "aggregate(zip_with(split(ha, ''), split(hb, ''), (x, y) -> IF(x = y, 0, 1)), 0, (acc, v) -> acc + v)")
        .cast("long"))
      .groupBy(col("a_id"), col("b_id"), col("nfa"))
      .agg(max(col("hd")).as("max_hamming"))
      .filter(col("max_hamming") <= maxDist)
      .select(col("a_id"), col("b_id"), col("nfa").as("n_frames"),
        col("max_hamming"))
  }

  /** Decoded-image statistics: runs [[imageDecoder]] on each payload,
    * parses the `[w][h][RGB...]` layout, and emits the dimensions plus the
    * exact 16-bin high-nibble histogram of the PIXEL bytes — the
    * oracle-checkable core of image feature extraction (the gate
    * synthesizes formulaic PNGs whose pixel distribution SQL can predict).
    * Rows whose payload did not decode to the image layout (identity
    * fallback) emit width = height = -1 with the histogram over the raw
    * payload bytes. */
  def decodeImageStats(spark: SparkSession, mm: DataFrame,
                       decode: Decoder = imageDecoder): DataFrame = {
    val rows = mm.select(col("doc_id"), col("payload")).rdd.mapPartitions { it =>
      it.map { r =>
        val id = r.getLong(0)
        val raw = r.getAs[Array[Byte]](1)
        val dec = decode(raw)
        val decoded = !(dec eq raw) && dec.length >= 8
        val (w, h, from) =
          if (decoded) {
            val w0 = ((dec(0) & 0xFF) << 24) | ((dec(1) & 0xFF) << 16) |
              ((dec(2) & 0xFF) << 8) | (dec(3) & 0xFF)
            val h0 = ((dec(4) & 0xFF) << 24) | ((dec(5) & 0xFF) << 16) |
              ((dec(6) & 0xFF) << 8) | (dec(7) & 0xFF)
            (w0.toLong, h0.toLong, 8)
          } else (-1L, -1L, 0)
        val hist = new Array[Long](16)
        var i = from
        while (i < dec.length) { hist((dec(i) & 0xFF) >> 4) += 1L; i += 1 }
        Row.fromSeq(id +: w +: h +: hist.toSeq)
      }
    }
    spark.createDataFrame(rows, imageStatsSchema)
  }

  private val frameSchema = StructType(Seq(
    StructField("doc_id", LongType, nullable = false),
    StructField("frame_idx", IntegerType, nullable = false),
    StructField("frame", BinaryType, nullable = false)))

  /** STUB FRAME SAMPLER — stands in for video keyframe extraction. Emits
    * up to `maxFrames` consecutive `frameBytes`-wide windows of the
    * decoded payload as one row per frame (empty payloads emit none); a
    * real pipeline replaces the window slicing with the codec's keyframe
    * calls and keeps the row shape (doc_id, frame_idx, frame binary) and
    * per-partition batching unchanged. Frame math is pure arithmetic on
    * byte counts, so the correctness gate mirrors it in SQL. */
  def sampleFrames(spark: SparkSession, mm: DataFrame,
                   frameBytes: Int = 256, maxFrames: Int = 8,
                   decode: Decoder = mediaDecoder): DataFrame = {
    require(frameBytes > 0 && maxFrames > 0)
    val rows = mm.select(col("doc_id"), col("payload")).rdd.mapPartitions { it =>
      it.flatMap { r =>
        val id = r.getLong(0)
        val bytes = decode(r.getAs[Array[Byte]](1))
        val nFrames = math.min(maxFrames.toLong,
          (bytes.length + frameBytes - 1L) / frameBytes).toInt
        (0 until nFrames).iterator.map { f =>
          val from = f * frameBytes
          val until = math.min(bytes.length, from + frameBytes)
          Row(id, f, java.util.Arrays.copyOfRange(bytes, from, until))
        }
      }
    }
    spark.createDataFrame(rows, frameSchema)
  }

  /** STUB RESIZER — stands in for image resizing. Normalizes every decoded
    * payload to exactly `targetBytes` (truncate, or cycle the payload to
    * pad; empty payloads become zero bytes) and rewrites `meta.n_bytes`
    * to match — the metadata-consistency contract a real resizer must
    * keep. Deterministic, so the spec pins outputs across runs. */
  def resizePayloads(spark: SparkSession, mm: DataFrame, targetBytes: Int,
                     decode: Decoder = mediaDecoder): DataFrame = {
    require(targetBytes >= 0)
    // output shape == input shape: derive the schema from the input so the
    // meta struct contract lives in ONE place (toMultimodal); only the
    // n_bytes field is rewritten, positionally by name
    val proj = mm.select(col("doc_id"), col("payload"), col("meta"))
    val schema = proj.schema
    val nBytesIdx = schema("meta").dataType.asInstanceOf[StructType].fieldIndex("n_bytes")
    val rows = proj.rdd.mapPartitions { it =>
      it.map { r =>
        val bytes = decode(r.getAs[Array[Byte]](1))
        val out = new Array[Byte](if (bytes.isEmpty) 0 else targetBytes)
        var i = 0
        while (i < out.length) { out(i) = bytes(i % bytes.length); i += 1 }
        val meta = r.getStruct(2)
        val newMeta =
          if (meta == null) null
          else Row.fromSeq(meta.toSeq.updated(nBytesIdx, out.length.toLong))
        Row(r.get(0), out, newMeta)
      }
    }
    spark.createDataFrame(rows, schema)
  }

  private val histSchema = StructType(
    StructField("doc_id", LongType, nullable = false) +:
      StructField("n_bytes", LongType, nullable = false) +:
      (0 until 16).map(b => StructField(s"c$b", LongType, nullable = false)))

  /** Exact 16-bin byte histogram (high nibble) per decoded payload as
    * SCALAR count columns — the oracle-checkable integer core of
    * [[extractFeatures]], which normalizes the same counts to floats.
    * Integer counts hash-match across engines; normalized float32 division
    * would drift in the last ulp. */
  def byteHistogram(spark: SparkSession, mm: DataFrame,
                    decode: Decoder = mediaDecoder): DataFrame = {
    val rows = mm.select(col("doc_id"), col("payload")).rdd.mapPartitions { it =>
      it.map { r =>
        val bytes = decode(r.getAs[Array[Byte]](1))
        val hist = new Array[Long](16)
        var i = 0
        while (i < bytes.length) { hist((bytes(i) & 0xFF) >> 4) += 1L; i += 1 }
        Row.fromSeq(r.getLong(0) +: bytes.length.toLong +: hist.toSeq)
      }
    }
    spark.createDataFrame(rows, histSchema)
  }

  /** Batched per-partition feature extraction: 16-bin normalized byte
    * histogram per payload (a deterministic fake "embedding" with the same
    * shape/cost profile as a features head). */
  def extractFeatures(spark: SparkSession, mm: DataFrame,
                      decode: Decoder = mediaDecoder): DataFrame = {
    val rows = mm.select(col("doc_id"), col("payload")).rdd.mapPartitions { it =>
      // per-partition init happens here (codec/model load in a real pipeline)
      it.map { r =>
        val id = r.getLong(0)
        val bytes = decode(r.getAs[Array[Byte]](1))
        val hist = new Array[Float](16)
        var i = 0
        while (i < bytes.length) { hist((bytes(i) & 0xFF) >> 4) += 1f; i += 1 }
        val total = math.max(bytes.length, 1).toFloat
        var b = 0
        while (b < 16) { hist(b) /= total; b += 1 }
        Row(id, hist.toSeq)
      }
    }
    spark.createDataFrame(rows, featureSchema)
  }
}
