package graft.multimodal

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Multimodal column plumbing (SURVEY.md §2c, m01).
  *
  * Media (image/audio/video) is carried as an opaque `binary` payload
  * column next to a typed metadata struct — the lakehouse-standard
  * shape for multimodal training data. Decode / feature-extraction runs
  * batch-wise inside `mapPartitions` on a typed Dataset, which is
  * exactly how a real codec UDF would be deployed (per-partition
  * library init, per-batch amortized calls, executor-local CPU work —
  * no shuffle, no driver involvement, arbitrary horizontal scale).
  *
  * Decode is a two-path dispatch: payloads that parse as a complete
  * binary P6 PPM image get REAL features from a pure-JVM decoder
  * (`decodePpm` — header parse, per-channel means, luminance moments,
  * dark/bright histogram fractions); everything else falls back to
  * `stubDecode`, which derives deterministic pseudo-features from the
  * raw bytes so the DuckDB oracle (whose synthetic payloads are text)
  * stays byte-exact. A production JPEG/audio codec would slot into the
  * same dispatch. The Spark-side contract — schema, binary payload
  * batching, partition-local decode, output shape — is real and tested.
  */
object Multimodal {

  /** Typed row for the decode stage: id + raw payload + metadata. */
  case class MediaRow(doc_id: Long, payload: Array[Byte], mime: String, n_bytes: Long)

  case class MediaFeatures(doc_id: Long, mime: String, n_bytes: Long,
      checksum: Long, feat: Array[Double])

  /** STUB decoder — stands in for e.g. JPEG decode + embedding.
    * Deterministic function of the payload so tests (and the DuckDB
    * oracle) can reproduce it exactly:
    *  - checksum: polynomial rolling hash of the unsigned bytes,
    *    seed 17, base 31, mod 1e9+7 — the modulus keeps every
    *    intermediate below 2^63 so a checked-arithmetic SQL engine
    *    computes the identical value (no wrap-around to replicate);
    *  - features: per-slot (i mod 8) integer byte sums, divided by
    *    255.0 once at the end — exact integer accumulation, so the
    *    doubles are bit-identical across engines.
    * Replace the body with a real codec call in production; the
    * signature (bytes → fixed-width features) is the contract.
    */
  def stubDecode(payload: Array[Byte]): (Long, Array[Double]) = {
    var checksum = 17L
    var i = 0
    while (i < payload.length) {
      checksum = (checksum * 31 + (payload(i) & 0xff)) % 1000000007L
      i += 1
    }
    val sums = new Array[Long](8)
    i = 0
    while (i < payload.length) { sums(i % 8) += (payload(i) & 0xff); i += 1 }
    (checksum, sums.map(_ / 255.0))
  }

  /** Real decoder for binary P6 PPM images (pure JVM, zero external
    * deps): parses the header (magic, optional `#` comments, width,
    * height, maxval ≤ 255) and the packed RGB payload, and extracts 8
    * deterministic image features:
    *
    *   feat_0..2  mean R / G / B               (normalized to [0,1])
    *   feat_3     mean luminance               (integer 299/587/114 weights)
    *   feat_4     luminance variance
    *   feat_5     dark-pixel fraction          (luma < 64/255)
    *   feat_6     bright-pixel fraction        (luma ≥ 192/255)
    *   feat_7     aspect ratio w/h
    *
    * All accumulation is exact integer arithmetic (sums and sums of
    * squares of 299R+587G+114B stay far below 2^63 for any image this
    * pipeline would batch); division happens once at the end, so the
    * emitted doubles are bit-reproducible. Returns None unless the
    * payload is a COMPLETE well-formed P6 (magic + parseable header +
    * exactly 3·w·h sample bytes) — anything else falls back to the
    * checksum stub path, which keeps the DuckDB oracle (which sees only
    * text payloads) byte-exact.
    */
  def decodePpm(payload: Array[Byte]): Option[Array[Double]] = {
    val (w, h, off) = ppmRaster(payload) match {
      case Some(t) => t
      case None    => return None
    }
    var i = off
    val n = w.toLong * h
    var sumR = 0L; var sumG = 0L; var sumB = 0L
    var sumLuma = 0L; var sumLumaSq = 0L
    var nDark = 0L; var nBright = 0L
    var p = i
    while (p < payload.length) {
      val r = payload(p) & 0xff; val g = payload(p + 1) & 0xff; val b = payload(p + 2) & 0xff
      sumR += r; sumG += g; sumB += b
      val luma = 299L * r + 587L * g + 114L * b // ×1000 fixed-point
      sumLuma += luma; sumLumaSq += luma * luma
      if (luma < 64000L) nDark += 1
      if (luma >= 192000L) nBright += 1
      p += 3
    }
    val meanLuma = sumLuma.toDouble / n
    val varLuma = (sumLumaSq.toDouble / n - meanLuma * meanLuma) / (1000.0 * 255.0 * 1000.0 * 255.0)
    Some(Array(
      sumR.toDouble / (255.0 * n), sumG.toDouble / (255.0 * n), sumB.toDouble / (255.0 * n),
      meanLuma / (1000.0 * 255.0), varLuma,
      nDark.toDouble / n, nBright.toDouble / n,
      w.toDouble / h))
  }

  /** P6 header parse shared by [[decodePpm]] and the m05 frame walk:
    * returns (width, height, raster offset) for a COMPLETE well-formed
    * binary PPM (magic, optional `#` comments, maxval 255, exactly
    * 3·w·h raster bytes), None otherwise.
    */
  private[graft] def ppmRaster(payload: Array[Byte]): Option[(Int, Int, Int)] = {
    if (payload.length < 2 || payload(0) != 'P' || payload(1) != '6') return None
    var i = 2
    def isWs(b: Byte) = b == ' ' || b == '\t' || b == '\n' || b == '\r'
    // whitespace + '#'-to-end-of-line comments between header tokens
    def skipWs(): Boolean = {
      var progressed = false
      var moving = true
      while (moving && i < payload.length) {
        if (isWs(payload(i))) { i += 1; progressed = true }
        else if (payload(i) == '#') {
          while (i < payload.length && payload(i) != '\n') i += 1
          progressed = true
        } else moving = false
      }
      progressed
    }
    def readInt(): Int = {
      if (!skipWs()) return -1 // tokens must be whitespace-separated
      var v = 0L
      var any = false
      while (i < payload.length && payload(i) >= '0' && payload(i) <= '9') {
        v = v * 10 + (payload(i) - '0'); i += 1; any = true
        if (v > Int.MaxValue) return -1
      }
      if (any) v.toInt else -1
    }
    val w = readInt(); val h = readInt(); val maxval = readInt()
    // 8-bit samples only (maxval 255, the universal case): the fixed-
    // point luminance weights and dark/bright thresholds assume it
    if (w <= 0 || h <= 0 || maxval != 255) return None
    // exactly ONE whitespace byte separates maxval from the raster
    if (i >= payload.length || !isWs(payload(i))) return None
    i += 1
    if (payload.length - i != 3L * w * h) return None
    Some((w, h, i))
  }

  /** Real decoder for uncompressed 24-bit BMP images (the other
    * zero-dependency container): parses the BITMAPFILEHEADER +
    * BITMAPINFOHEADER, walks the padded bottom-up BGR raster, and
    * emits the same 8 features as [[decodePpm]]. Returns None unless
    * the payload is a complete well-formed BMP of exactly that shape
    * (magic, header size 40, planes 1, 24 bpp, BI_RGB, positive dims,
    * raster fits) — anything else falls back to the stub path.
    */
  def decodeBmp(payload: Array[Byte]): Option[Array[Double]] = {
    def u16(i: Int): Int =
      (payload(i) & 0xff) | ((payload(i + 1) & 0xff) << 8)
    def i32(i: Int): Int =
      (payload(i) & 0xff) | ((payload(i + 1) & 0xff) << 8) |
        ((payload(i + 2) & 0xff) << 16) | ((payload(i + 3) & 0xff) << 24)
    if (payload.length < 54 || payload(0) != 'B' || payload(1) != 'M') return None
    val dataOffset = i32(10)
    if (i32(14) != 40) return None // BITMAPINFOHEADER only
    val w = i32(18); val h = i32(22)
    if (w <= 0 || h <= 0) return None // top-down (negative h) not supported
    if (u16(26) != 1 || u16(28) != 24 || i32(30) != 0) return None // planes/24bpp/BI_RGB
    val rowSize = (3 * w + 3) / 4 * 4 // rows padded to 4 bytes
    if (dataOffset < 54 || dataOffset.toLong + rowSize.toLong * h > payload.length) return None
    val n = w.toLong * h
    var sumR = 0L; var sumG = 0L; var sumB = 0L
    var sumLuma = 0L; var sumLumaSq = 0L
    var nDark = 0L; var nBright = 0L
    var row = 0
    while (row < h) {
      var p = dataOffset + row * rowSize
      var x = 0
      while (x < w) {
        val b = payload(p) & 0xff; val g = payload(p + 1) & 0xff; val r = payload(p + 2) & 0xff
        sumR += r; sumG += g; sumB += b
        val luma = 299L * r + 587L * g + 114L * b
        sumLuma += luma; sumLumaSq += luma * luma
        if (luma < 64000L) nDark += 1
        if (luma >= 192000L) nBright += 1
        x += 1; p += 3
      }
      row += 1
    }
    val meanLuma = sumLuma.toDouble / n
    val varLuma = (sumLumaSq.toDouble / n - meanLuma * meanLuma) / (1000.0 * 255.0 * 1000.0 * 255.0)
    Some(Array(
      sumR.toDouble / (255.0 * n), sumG.toDouble / (255.0 * n), sumB.toDouble / (255.0 * n),
      meanLuma / (1000.0 * 255.0), varLuma,
      nDark.toDouble / n, nBright.toDouble / n,
      w.toDouble / h))
  }

  /** The shared 8-feature accumulation over any pixel source (PPM/BMP
    * walk their rasters directly; the ImageIO path feeds packed ARGB
    * ints through this): exact integer sums, one division at the end —
    * the same contract and normalization as [[decodePpm]].
    */
  private def featuresOfRgb(w: Int, h: Int, rgb: Array[Int]): Array[Double] = {
    val n = w.toLong * h
    var sumR = 0L; var sumG = 0L; var sumB = 0L
    var sumLuma = 0L; var sumLumaSq = 0L
    var nDark = 0L; var nBright = 0L
    var i = 0
    while (i < rgb.length) {
      val px = rgb(i)
      val r = (px >> 16) & 0xff; val g = (px >> 8) & 0xff; val b = px & 0xff
      sumR += r; sumG += g; sumB += b
      val luma = 299L * r + 587L * g + 114L * b
      sumLuma += luma; sumLumaSq += luma * luma
      if (luma < 64000L) nDark += 1
      if (luma >= 192000L) nBright += 1
      i += 1
    }
    val meanLuma = sumLuma.toDouble / n
    val varLuma = (sumLumaSq.toDouble / n - meanLuma * meanLuma) / (1000.0 * 255.0 * 1000.0 * 255.0)
    Array(
      sumR.toDouble / (255.0 * n), sumG.toDouble / (255.0 * n), sumB.toDouble / (255.0 * n),
      meanLuma / (1000.0 * 255.0), varLuma,
      nDark.toDouble / n, nBright.toDouble / n,
      w.toDouble / h)
  }

  /** Real decoder for JPEG and PNG via `javax.imageio` — the codecs a
    * web corpus actually contains, shipped in the JDK (zero new
    * dependencies, headless-safe: pure raster work, no display).
    * Dispatch is on magic bytes (JPEG FF D8 FF; PNG 89 'PNG' …), so the
    * expensive ImageIO probe is never paid by the text payloads the
    * oracle checks. Features are the same 8-slot contract as
    * [[decodePpm]], computed from the packed sRGB raster. A truncated
    * or corrupt stream returns None (→ stub fallback) rather than
    * throwing — codec failure must not kill an ingestion batch.
    */
  def decodeImageIo(payload: Array[Byte]): Option[Array[Double]] = {
    val isJpeg = payload.length >= 3 &&
      (payload(0) & 0xff) == 0xff && (payload(1) & 0xff) == 0xd8 && (payload(2) & 0xff) == 0xff
    val isPng = payload.length >= 8 &&
      (payload(0) & 0xff) == 0x89 && payload(1) == 'P' && payload(2) == 'N' && payload(3) == 'G'
    if (!isJpeg && !isPng) return None
    try {
      val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(payload))
      if (img == null) return None
      val w = img.getWidth; val h = img.getHeight
      if (w <= 0 || h <= 0) return None
      val rgb = img.getRGB(0, 0, w, h, null, 0, w)
      Some(featuresOfRgb(w, h, rgb))
    } catch { case scala.util.control.NonFatal(_) => None }
  }

  /** Decode dispatch: a payload whose magic + structure parses as P6
    * PPM, 24-bit BMP, JPEG or PNG gets REAL features; everything else
    * (incl. every text payload the oracle checks) takes the
    * deterministic stub. The checksum is always the rolling payload
    * hash — identity, either path.
    */
  def decode(payload: Array[Byte]): (Long, Array[Double]) = {
    val (checksum, stubFeat) = stubDecode(payload)
    decodePpm(payload).orElse(decodeBmp(payload)).orElse(decodeImageIo(payload))
      .orElse(decodeWav(payload).map(wavFeatures)) match {
      case Some(feat) => (checksum, feat)
      case None       => (checksum, stubFeat)
    }
  }

  /** Project decoded PCM into the pipeline's 8-wide feature shape:
    * sample rate, length, duration, mean, RMS, zero-cross rate,
    * min, max — the audio analogue of the image channel moments.
    */
  private[graft] def wavFeatures(wav: (Int, Array[Int])): Array[Double] = {
    val (rate, s) = wav
    val n = s.length
    if (n == 0) return Array(rate.toDouble, 0, 0, 0, 0, 0, 0, 0)
    var sum = 0L; var ss = 0L; var flips = 0L
    var mn = s(0); var mx = s(0)
    var i = 0
    while (i < n) {
      val v = s(i)
      sum += v; ss += v.toLong * v
      if (i > 0 && s(i - 1) * v < 0) flips += 1
      if (v < mn) mn = v
      if (v > mx) mx = v
      i += 1
    }
    Array(rate.toDouble, n.toDouble, n.toDouble / rate,
      sum.toDouble / n, math.sqrt(ss.toDouble / n),
      flips.toDouble / n, mn.toDouble, mx.toDouble)
  }

  /** REAL pure-JVM WAV decoder (RIFF container, PCM): walks the chunk
    * list, reads `fmt ` (requires uncompressed PCM, mono, 8 or 16
    * bit), then decodes `data` into signed sample values. Returns
    * (sampleRate, samples); None for anything that is not a complete
    * well-formed PCM WAV, so the caller falls through to the stub —
    * exactly the PPM/BMP contract. Cites the RIFF/WAVE layout:
    * little-endian chunk sizes, 8-bit samples stored unsigned biased
    * +128, 16-bit signed little-endian.
    */
  def decodeWav(payload: Array[Byte]): Option[(Int, Array[Int])] = {
    def le32(o: Int): Long =
      (payload(o) & 0xffL) | (payload(o + 1) & 0xffL) << 8 |
        (payload(o + 2) & 0xffL) << 16 | (payload(o + 3) & 0xffL) << 24
    def le16(o: Int): Int = (payload(o) & 0xff) | (payload(o + 1) & 0xff) << 8
    def tag(o: Int): String = new String(payload.slice(o, o + 4), "US-ASCII")
    if (payload.length < 44 || tag(0) != "RIFF" || tag(8) != "WAVE") return None
    var o = 12
    var rate = -1; var bits = -1
    var samples: Array[Int] = null
    while (o + 8 <= payload.length) {
      val id = tag(o)
      val sz = le32(o + 4).toInt
      if (sz < 0 || o + 8 + sz > payload.length) return None
      id match {
        case "fmt " =>
          if (sz < 16) return None
          val fmt = le16(o + 8)
          val ch = le16(o + 10)
          if (fmt != 1 || ch != 1) return None // PCM mono only
          rate = le32(o + 12).toInt
          bits = le16(o + 22)
          if (rate <= 0 || (bits != 8 && bits != 16)) return None
        case "data" =>
          if (rate < 0) return None // fmt must precede data
          samples =
            if (bits == 8) Array.tabulate(sz)(i => (payload(o + 8 + i) & 0xff) - 128)
            else {
              if (sz % 2 != 0) return None
              Array.tabulate(sz / 2)(i => le16(o + 8 + 2 * i).toShort.toInt)
            }
        case _ => // skip unknown chunks (LIST, fact, ...)
      }
      o += 8 + sz + (sz & 1) // chunks are word-aligned
    }
    if (rate > 0 && samples != null) Some((rate, samples)) else None
  }

  /** Encode mono PCM as a WAV byte array (the decoder's inverse);
    * 8-bit samples in [-128, 127] stored biased unsigned.
    */
  private[graft] def encodeWav(rate: Int, samples: Array[Int]): Array[Byte] = {
    val n = samples.length
    val bb = java.nio.ByteBuffer.allocate(44 + n)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put("RIFF".getBytes("US-ASCII")).putInt(36 + n)
      .put("WAVE".getBytes("US-ASCII"))
    bb.put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(1).putShort(1) // PCM, mono
      .putInt(rate).putInt(rate) // byte rate = rate × 1 byte/sample
      .putShort(1).putShort(8) // block align, bits
    bb.put("data".getBytes("US-ASCII")).putInt(n)
    samples.foreach(s => bb.put((s + 128).toByte))
    bb.array()
  }

  /** Typed row for the audio stage. */
  case class AudioFeatures(doc_id: Long, sample_rate: Long, n_samples: Long,
      sum_sq: Long, n_sign_flips: Long)

  /** The deterministic PCM test signal for doc_id: n = 100 + id % 50
    * samples, s_t = ((id·31 + t·7) mod 256) − 128 — integer-exact, so
    * the DuckDB oracle regenerates the SIGNAL from the formula while
    * Spark round-trips it through a real WAV encode → decode: any
    * header mis-parse or sample bias error breaks the hash match.
    */
  private[graft] def synthSamples(id: Long): Array[Int] = {
    val n = 100 + (id % 50).toInt
    Array.tabulate(n)(t => (((id * 31 + t.toLong * 7) % 256) - 128).toInt)
  }

  /** m04: audio feature extraction — the audio modality of the media
    * pipeline: per-document WAV payloads decoded partition-locally by
    * the REAL RIFF/PCM codec (no external libs — the container ships
    * none, and none are needed), reduced to integer-exact signal
    * features (energy as sum of squares, sign-flip count) that
    * hash-compare across engines. Same mapPartitions codec shape as
    * m01: at 100 TB the payload bytes never shuffle — features only.
    */
  def m04AudioFeatures(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val ids = Tables.documents(spark, dir).select(col("doc_id")).as[Long]
    ids.mapPartitions { it =>
      it.map { id =>
        val wav = encodeWav(8000, synthSamples(id))
        val (rate, s) = decodeWav(wav).getOrElse(
          throw new IllegalStateException(s"WAV round-trip failed for doc $id"))
        var ss = 0L; var flips = 0L
        var i = 0
        while (i < s.length) {
          ss += s(i).toLong * s(i)
          if (i > 0 && s(i - 1) * s(i) < 0) flips += 1
          i += 1
        }
        AudioFeatures(id, rate.toLong, s.length.toLong, ss, flips)
      }
    }.toDF()
  }

  /** m10 voice-activity geometry: a clip is 5 + id % 5 spans of 40
    * samples; span s is VOICED iff (id + s) % 3 ≠ 0. Voiced spans
    * carry the m04 wideband signal (frame energy ≥ ~25 000 for any
    * phase — the 20-sample stride-7 run always covers large residues);
    * silent spans carry |amplitude| ≤ 2 dither (frame energy ≤ 80).
    * The 2 000-threshold sits orders of magnitude from both, so the
    * energy detector recovers the span structure EXACTLY — which is
    * what lets the DuckDB oracle work at the formula level while Spark
    * works at the decoded-signal level.
    */
  private[graft] def synthVoiceSamples(id: Long): Array[Int] = {
    val nSpans = (5 + id % 5).toInt
    Array.tabulate(nSpans * 40) { t =>
      val span = t / 40
      if ((id + span) % 3 != 0) (((id * 31 + t.toLong * 7) % 256) - 128).toInt
      else (t % 5) - 2
    }
  }

  /** Typed row for the m10 segmentation census. */
  case class VadRow(doc_id: Long, n_frames: Long, n_voiced: Long,
      n_segments: Long, longest_voiced: Long)

  /** m10: voice-activity segmentation — the audio-curation pass before
    * ASR/captioning (silence trimming, per-utterance splitting: the
    * model sees SEGMENTS, not raw clips): the real WAV round-trip
    * (m04's RIFF/PCM codec), 20-sample frame energies as exact integer
    * sums of squares, a 2 000 threshold that cleanly separates the
    * voiced wideband signal from silence dither, and a gaps-and-islands
    * walk over the frame flags — per clip: voiced-frame count, segment
    * count, longest segment.
    *
    * Scale shape: the m04 contract — the whole clip decodes and
    * segments INSIDE the codec task (signal bytes never shuffle), the
    * cluster sees 5-long census rows. No shuffle before the final
    * frame.
    */
  def m10AudioSegmentation(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val ids = Tables.documents(spark, dir).select(col("doc_id")).as[Long]
    ids.mapPartitions { it =>
      it.map { id =>
        val wav = encodeWav(8000, synthVoiceSamples(id))
        val (_, s) = decodeWav(wav).getOrElse(
          throw new IllegalStateException(s"WAV round-trip failed for doc $id"))
        val nFrames = s.length / 20
        var nVoiced = 0L; var nSegments = 0L
        var longest = 0L; var run = 0L
        var f = 0
        while (f < nFrames) {
          var e = 0L
          var i = f * 20
          while (i < (f + 1) * 20) { e += s(i).toLong * s(i); i += 1 }
          if (e > 2000L) {
            nVoiced += 1
            if (run == 0) nSegments += 1
            run += 1
            if (run > longest) longest = run
          } else run = 0
          f += 1
        }
        VadRow(id, nFrames.toLong, nVoiced, nSegments, longest)
      }
    }.toDF()
  }

  /** m05 video container geometry: every frame is an 8×6 binary P6
    * PPM; a document's clip has 6 + id % 7 frames and every 3rd frame
    * is sampled (the standard stride-sampling a vision-language
    * pipeline does before the expensive per-frame model).
    */
  val VideoW = 8
  val VideoH = 6
  val VideoStride = 3

  private[graft] def videoFrameCount(id: Long): Int = (6 + id % 7).toInt

  /** Deterministic raster for frame `f` of doc `id`: channel values
    * are mod-256 affine forms of (id, frame, pixel), so the DuckDB
    * oracle regenerates the SIGNAL from the formula while Spark
    * round-trips it through the real container + PPM codec.
    */
  private[graft] def synthFrameRaster(id: Long, f: Int): Array[Byte] = {
    val out = new Array[Byte]((VideoW * VideoH * 3))
    var p = 0
    while (p < VideoW * VideoH) {
      out(p * 3) = (((id * 7 + f.toLong * 13 + p.toLong * 3) % 256)).toByte
      out(p * 3 + 1) = (((id * 11 + f.toLong * 5 + p.toLong * 7) % 256)).toByte
      out(p * 3 + 2) = (((id * 13 + f.toLong * 3 + p.toLong * 11) % 256)).toByte
      p += 1
    }
    out
  }

  /** Encode doc `id`'s clip into the GVF1 container: a 20-byte header
    * (magic, frame count, width, height, fps·1000), then a fixed-width
    * frame INDEX of (offset, length) pairs, then the concatenated
    * P6 PPM frame payloads — the moov-atom idea in miniature: a reader
    * resolves the index and seeks straight to the frames it wants.
    */
  private[graft] def encodeVideo(id: Long): Array[Byte] =
    encodeVideoWith(id, synthFrameRaster)

  /** m09 two-scene clip geometry: a clip cuts to its second scene at
    * frame 2 + id % 3, except every 4th doc which is single-scene.
    * Channel values stay in [0, 250) by construction (%120 base +
    * 0/1 parity jitter + 128 scene shift) so NO mod-256 wrap ever
    * occurs and the scene shift moves every frame's weighted luminance
    * sum by exactly 128·1000·px — crisply separated from the ±1000·px
    * parity jitter between same-scene sampled frames.
    */
  private[graft] def sceneCutAt(id: Long): Int =
    if (id % 4 == 0) Int.MaxValue else (2 + id % 3).toInt

  private[graft] def synthSceneRaster(id: Long, f: Int): Array[Byte] = {
    val shift = if (f >= sceneCutAt(id)) 128 else 0
    val jit = f % 2
    val out = new Array[Byte](VideoW * VideoH * 3)
    var p = 0
    while (p < VideoW * VideoH) {
      out(p * 3) = (((id * 5 + p.toLong * 7) % 120) + jit + shift).toByte
      out(p * 3 + 1) = (((id * 9 + p.toLong * 5) % 120) + jit + shift).toByte
      out(p * 3 + 2) = (((id * 3 + p.toLong * 13) % 120) + jit + shift).toByte
      p += 1
    }
    out
  }

  /** Encode doc `id`'s clip into GVF1 from an arbitrary per-frame
    * raster synthesizer (shared by the m05 smooth clips and the m09
    * two-scene clips).
    */
  private[graft] def encodeVideoWith(
      id: Long, raster: (Long, Int) => Array[Byte]): Array[Byte] =
    encodeVideoWith(id, videoFrameCount(id), raster)

  /** [[encodeVideoWith]] with an explicit frame count — m13's trimmed
    * twins are shorter than their own id's [[videoFrameCount]].
    */
  private[graft] def encodeVideoWith(
      id: Long, nf: Int, raster: (Long, Int) => Array[Byte]): Array[Byte] = {
    val header = s"P6\n$VideoW $VideoH\n255\n".getBytes("US-ASCII")
    val frames = Array.tabulate(nf)(f => header ++ raster(id, f))
    val indexBytes = 12 * nf
    val bb = java.nio.ByteBuffer.allocate(
        20 + indexBytes + frames.map(_.length).sum)
      .order(java.nio.ByteOrder.BIG_ENDIAN)
    bb.put("GVF1".getBytes("US-ASCII"))
      .putInt(nf).putInt(VideoW).putInt(VideoH).putInt(24000)
    var off = 20L + indexBytes
    frames.foreach { fr => bb.putLong(off).putInt(fr.length); off += fr.length }
    frames.foreach(bb.put)
    bb.array()
  }

  /** Parse the container and return ONLY the stride-sampled frames as
    * (frame_no, n_frames, ppm payload): the header and index are read,
    * then each sampled frame is sliced at its index offset — the bytes
    * of unsampled frames are never touched (on an FS-backed container
    * this is a seek, and the spec pins it by tampering an unsampled
    * frame and asserting identical output).
    */
  private[graft] def sampleFrames(c: Array[Byte]): Seq[(Int, Int, Array[Byte])] = {
    val bb = java.nio.ByteBuffer.wrap(c).order(java.nio.ByteOrder.BIG_ENDIAN)
    val magic = new Array[Byte](4)
    bb.get(magic)
    if (!java.util.Arrays.equals(magic, "GVF1".getBytes("US-ASCII")))
      throw new IllegalStateException("not a GVF1 video container")
    val nf = bb.getInt
    val w = bb.getInt; val h = bb.getInt; bb.getInt // fps·1000, unused here
    if (nf < 0 || w != VideoW || h != VideoH)
      throw new IllegalStateException(s"corrupt GVF1 header: nf=$nf ${w}x$h")
    val index = Array.tabulate(nf)(_ => (bb.getLong, bb.getInt))
    (0 until nf by VideoStride).map { f =>
      val (off, len) = index(f)
      if (off < 0 || len < 0 || off + len > c.length)
        throw new IllegalStateException(s"frame $f index out of bounds")
      (f, nf, java.util.Arrays.copyOfRange(c, off.toInt, off.toInt + len))
    }
  }

  /** Typed row for the video stage: integer-exact per-frame features. */
  case class VideoFrame(doc_id: Long, frame_no: Long, n_frames: Long,
      sum_r: Long, sum_g: Long, sum_b: Long, n_dark: Long)

  /** m06 image geometry: a 16×12 source raster thumbnailed to 8×6 —
    * the 2× nearest-neighbor downsample every vision pipeline runs
    * before the expensive per-image model.
    */
  val ImgW = 16
  val ImgH = 12
  val ThumbW = 8
  val ThumbH = 6

  /** Deterministic source image for doc `id`: binary P6 whose channel
    * values are mod-256 affine forms of (id, pixel) — the m05 device,
    * so the DuckDB oracle regenerates the signal from the formula
    * while Spark round-trips it through the real codec + resize
    * kernel.
    */
  private[graft] def synthImage(id: Long): Array[Byte] = {
    val header = s"P6\n$ImgW $ImgH\n255\n".getBytes("US-ASCII")
    val raster = new Array[Byte](ImgW * ImgH * 3)
    var p = 0
    while (p < ImgW * ImgH) {
      raster(p * 3) = ((id * 5 + p.toLong * 7) % 256).toByte
      raster(p * 3 + 1) = ((id * 9 + p.toLong * 5) % 256).toByte
      raster(p * 3 + 2) = ((id * 3 + p.toLong * 13) % 256).toByte
      p += 1
    }
    header ++ raster
  }

  /** Nearest-neighbor resize of a packed RGB raster: output pixel
    * (x, y) copies source pixel (⌊x·w0/w1⌋, ⌊y·h0/h1⌋). The kernel
    * READS only the w1·h1 sampled source pixels — cost ∝ output size,
    * not input size (the property that matters when the source is a
    * 10⁸-pixel scan and the pipeline wants a 256² thumbnail; the spec
    * pins it by tampering an unsampled pixel).
    */
  private[graft] def nearestResize(raster: Array[Byte], w0: Int, h0: Int,
      w1: Int, h1: Int): Array[Byte] = {
    val out = new Array[Byte](w1 * h1 * 3)
    var y = 0
    while (y < h1) {
      val sy = (y.toLong * h0 / h1).toInt
      var x = 0
      while (x < w1) {
        val sx = (x.toLong * w0 / w1).toInt
        val sp = (sy * w0 + sx) * 3
        val dp = (y * w1 + x) * 3
        out(dp) = raster(sp); out(dp + 1) = raster(sp + 1); out(dp + 2) = raster(sp + 2)
        x += 1
      }
      y += 1
    }
    out
  }

  /** Typed row for the resize stage: integer-exact thumbnail stats. */
  case class ThumbFeatures(doc_id: Long, src_px: Long, thumb_px: Long,
      sum_r: Long, sum_g: Long, sum_b: Long, n_dark: Long)

  /** m06: image resize / thumbnailing — the preprocessing step every
    * multimodal training pipeline runs between ingestion (m01/m02)
    * and feature extraction: decode with the REAL P6 parser
    * ([[ppmRaster]], the m01 codec), nearest-neighbor downsample with
    * a kernel whose cost ∝ OUTPUT pixels, and reduce to integer-exact
    * channel stats that hash-compare across engines. Same
    * mapPartitions codec shape as m01/m04/m05: at 100 TB the rasters
    * never shuffle — per-image stats only.
    */
  def m06ImageResize(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val ids = Tables.documents(spark, dir).select(col("doc_id")).as[Long]
    ids.mapPartitions { it =>
      it.map { id =>
        val ppm = synthImage(id)
        val (w, h, off) = ppmRaster(ppm).getOrElse(
          throw new IllegalStateException(s"doc $id synth image is not a valid P6"))
        val raster = java.util.Arrays.copyOfRange(ppm, off, ppm.length)
        val thumb = nearestResize(raster, w, h, ThumbW, ThumbH)
        var sr = 0L; var sg = 0L; var sb = 0L; var nd = 0L
        var p = 0
        while (p < thumb.length) {
          val r = thumb(p) & 0xff; val g = thumb(p + 1) & 0xff; val b = thumb(p + 2) & 0xff
          sr += r; sg += g; sb += b
          if (299L * r + 587L * g + 114L * b < 64000L) nd += 1
          p += 3
        }
        ThumbFeatures(id, w.toLong * h, ThumbW.toLong * ThumbH, sr, sg, sb, nd)
      }
    }.toDF()
  }

  /** m08 device: a crawl's image inventory varies in SIZE and
    * EXPOSURE — dimensions and brightness are per-doc formulas so the
    * quality gates below have real populations on every side:
    * w ∈ {8..48}, h ∈ {8..32}, per-image brightness lift
    * (doc_id % 12)·12 on a mod-120 channel base (max 251 — never
    * wraps, so the lift shifts mean luminance exactly).
    */
  private[graft] def synthQualImage(id: Long): Array[Byte] = {
    val w = 8 + (id % 6).toInt * 8
    val h = 8 + (id % 4).toInt * 8
    val lift = (id % 12) * 12
    val header = s"P6\n$w $h\n255\n".getBytes("US-ASCII")
    val raster = new Array[Byte](w * h * 3)
    var p = 0
    while (p < w * h) {
      raster(p * 3) = (((id * 5 + p.toLong * 7) % 120) + lift).toByte
      raster(p * 3 + 1) = (((id * 9 + p.toLong * 5) % 120) + lift).toByte
      raster(p * 3 + 2) = (((id * 3 + p.toLong * 13) % 120) + lift).toByte
      p += 1
    }
    header ++ raster
  }

  /** Typed row for the quality stage: dimensions + the exact luminance
    * sum (1000×-scaled integer — no division anywhere).
    */
  case class ImgQual(doc_id: Long, w: Int, h: Int, sum_lum: Long)

  /** m08: image quality gates — the multimodal curation pass (the
    * LAION recipe) every image corpus runs before training: decode
    * with the REAL P6 parser, then gate on integer-exact signals —
    * minimum resolution (w·h ≥ 256), aspect ratio (neither side more
    * than 3× the other, integer cross-multiply), and exposure (mean
    * luminance inside [80, 180] of the 0-255.999 scale, compared as
    * sum_lum vs 1000·lum·px so no division or float ever happens).
    * Per-source admit/reject census — the d18 funnel shape for the
    * image modality.
    *
    * Scale shape: the m01/m06 mapPartitions codec contract — rasters
    * decode and reduce partition-locally, 32 bytes/image shuffle to
    * the source rollup; gates are column predicates AFTER the typed
    * decode, so the census is one map-side-combined aggregation.
    */
  def m08ImageQualityGate(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val feats = Tables.documents(spark, dir).select(col("doc_id")).as[Long]
      .mapPartitions { it =>
        it.map { id =>
          val ppm = synthQualImage(id)
          val (w, h, off) = ppmRaster(ppm).getOrElse(
            throw new IllegalStateException(s"doc $id synth image is not a valid P6"))
          var lum = 0L
          var p = off
          while (p < ppm.length) {
            lum += 299L * (ppm(p) & 0xff) + 587L * (ppm(p + 1) & 0xff) +
              114L * (ppm(p + 2) & 0xff)
            p += 3
          }
          ImgQual(id, w, h, lum)
        }
      }.toDF()
    val px = col("w").cast("long") * col("h")
    val small = px < 256L
    val stretched = col("w") > col("h") * 3 || col("h") > col("w") * 3
    val badlum = col("sum_lum") < px * 80000L || col("sum_lum") > px * 180000L
    feats.join(Tables.documents(spark, dir).select("doc_id", "source"), Seq("doc_id"))
      .select(col("source"), small.as("small"), stretched.as("stretched"),
        badlum.as("badlum"))
      .groupBy("source")
      .agg(count(lit(1)).as("n_images"),
        sum(when(col("small"), 1L).otherwise(0L)).as("n_small"),
        sum(when(col("stretched"), 1L).otherwise(0L)).as("n_stretched"),
        sum(when(col("badlum"), 1L).otherwise(0L)).as("n_badlum"),
        sum(when(!col("small") && !col("stretched") && !col("badlum"), 1L)
          .otherwise(0L)).as("n_admitted"))
  }

  /** m07 device: re-posted images. gid = doc_id % 97 picks the image
    * CONTENT (97 distinct images recur across the corpus — the
    * web-scale reality that the same meme/product shot is re-hosted
    * thousands of times); brightness = (doc_id / 97) % 5 · 3 models
    * per-host re-encoding drift. Channel base is mod-200 so base + 12
    * never clamps/wraps — the brightness shift is exactly uniform.
    */
  private[graft] def synthDupImage(id: Long): Array[Byte] = {
    val gid = id % 97
    val bright = (id / 97) % 5 * 3
    val header = s"P6\n$ImgW $ImgH\n255\n".getBytes("US-ASCII")
    val raster = new Array[Byte](ImgW * ImgH * 3)
    var p = 0
    while (p < ImgW * ImgH) {
      raster(p * 3) = (((gid * 5 + p.toLong * 7) % 200) + bright).toByte
      raster(p * 3 + 1) = (((gid * 9 + p.toLong * 5) % 200) + bright).toByte
      raster(p * 3 + 2) = (((gid * 3 + p.toLong * 13) % 200) + bright).toByte
      p += 1
    }
    header ++ raster
  }

  /** aHash of a packed RGB raster: nearest-resize to 8×8 (reads only
    * sampled pixels — m06's kernel), integer luminance per cell, bit p
    * set iff lum(p)·64 > Σlum (strictly above the mean, in exact
    * integer arithmetic). Split (hi, lo) 32-bit halves so the packing
    * stays inside signed-64 range in every engine. A UNIFORM luminance
    * shift Δ changes lum·64 and Σlum by the same 64Δ, so the hash is
    * exactly invariant under brightness drift — the property that makes
    * it a perceptual hash rather than a byte hash.
    */
  private[graft] def aHash(raster: Array[Byte], w0: Int, h0: Int): (Long, Long) = {
    val t = nearestResize(raster, w0, h0, 8, 8)
    val lum = new Array[Long](64)
    var s = 0L
    var p = 0
    while (p < 64) {
      lum(p) = 299L * (t(p * 3) & 0xff) + 587L * (t(p * 3 + 1) & 0xff) +
        114L * (t(p * 3 + 2) & 0xff)
      s += lum(p)
      p += 1
    }
    var hi = 0L; var lo = 0L
    p = 0
    while (p < 64) {
      if (lum(p) * 64 > s) {
        if (p < 32) lo |= (1L << p) else hi |= (1L << (p - 32))
      }
      p += 1
    }
    (hi, lo)
  }

  /** Typed row for the perceptual-hash stage. */
  case class AHashRow(doc_id: Long, hash_hi: Long, hash_lo: Long)

  /** m07: perceptual image dedup — the image-modality near-dup pass a
    * multimodal training pipeline runs that BYTE dedup (d01) cannot:
    * re-hosted copies of the same image differ in encoding (here: a
    * uniform brightness shift, so every payload is byte-distinct) but
    * share an aHash — decode with the real P6 codec, 8×8 mean-threshold
    * average hash, group by hash, keep the smallest doc_id as
    * canonical. Exactly the shape of production image dedup (aHash /
    * pHash bucketing, e.g. the LAION pipeline).
    *
    * Scale shape: the m01/m04/m05 mapPartitions codec contract —
    * rasters never shuffle, each doc reduces to 16 bytes of hash on
    * the map side; the dedup is then d01's digest groupBy + join-back.
    * At 100 TB the exchange carries (doc_id, hi, lo) rows only.
    */
  def m07ImageDedup(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val ids = Tables.documents(spark, dir).select(col("doc_id")).as[Long]
    val hashes = ids.mapPartitions { it =>
      it.map { id =>
        val ppm = synthDupImage(id)
        val (w, h, off) = ppmRaster(ppm).getOrElse(
          throw new IllegalStateException(s"doc $id synth image is not a valid P6"))
        val (hi, lo) = aHash(java.util.Arrays.copyOfRange(ppm, off, ppm.length), w, h)
        AHashRow(id, hi, lo)
      }
    }.toDF()
    val clusters = hashes.groupBy("hash_hi", "hash_lo")
      .agg(min(col("doc_id")).as("canonical_id"), count(lit(1)).as("n_members"))
    hashes.join(clusters, Seq("hash_hi", "hash_lo"))
      .select(col("doc_id"), col("hash_hi"), col("hash_lo"),
        col("canonical_id"), col("n_members"))
  }

  /** m05: video frame sampling — the video modality of the media
    * pipeline: per-document clips in a real indexed container (GVF1 —
    * header + frame index + P6 PPM frames), stride-sampled via the
    * index so unsampled frames are NEVER read, each sampled frame
    * decoded by the real PPM parser ([[ppmRaster]] — the same codec
    * m01 uses) and reduced to integer-exact channel statistics. Same
    * mapPartitions codec shape as m01/m04: at 100 TB the frame bytes
    * never shuffle — per-frame features only, and the index walk makes
    * per-clip decode cost proportional to SAMPLED frames, not clip
    * length (the property that matters when a clip is 10⁵ frames and
    * the pipeline wants 10²).
    */
  def m05VideoFrames(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val ids = Tables.documents(spark, dir).select(col("doc_id")).as[Long]
    ids.flatMap { id =>
      sampleFrames(encodeVideo(id)).map { case (f, nf, ppm) =>
        val (w, h, off) = ppmRaster(ppm).getOrElse(
          throw new IllegalStateException(s"frame $f of doc $id is not a valid P6 PPM"))
        var sr = 0L; var sg = 0L; var sb = 0L; var nd = 0L
        var p = off
        while (p < ppm.length) {
          val r = ppm(p) & 0xff; val g = ppm(p + 1) & 0xff; val b = ppm(p + 2) & 0xff
          sr += r; sg += g; sb += b
          if (299L * r + 587L * g + 114L * b < 64000L) nd += 1
          p += 3
        }
        require(w == VideoW && h == VideoH)
        VideoFrame(id, f.toLong, nf.toLong, sr, sg, sb, nd)
      }
    }.toDF()
  }

  /** Typed row for the m09 scene census. */
  case class SceneRow(doc_id: Long, n_frames: Long, n_sampled: Long,
      n_cuts: Long, first_cut_frame: Long)

  /** m09: scene-change detection — the shot-boundary pass every
    * video-curation pipeline runs before captioning/embedding (one
    * caption per SHOT, not per clip; shot boundaries are also where
    * frame-sampling should anchor). Clips are two-scene GVF1
    * containers ([[synthSceneRaster]] — scene B lifts every channel by
    * exactly +128 with no mod wrap; every 4th doc is single-scene, so
    * both populations are real). Detection: consecutive STRIDE-SAMPLED
    * frames' integer weighted-luminance sums are compared — a jump
    * above 64·1000·px (half the scene shift, far above the ±1000·px
    * same-scene parity jitter) is a cut. Per clip: cut count and the
    * first sampled frame AFTER the cut (−1 when single-scene).
    *
    * Scale shape: the m05 contract verbatim — the index walk reads
    * only sampled frames, rasters reduce to one luminance long per
    * frame INSIDE the codec task (the whole clip's walk is local), and
    * the cluster only ever sees the 5-long census row per clip. No
    * shuffle touches pixels; there is no shuffle at all before the
    * final frame.
    */
  def m09SceneChange(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val threshold = 64000L * (VideoW * VideoH)
    val ids = Tables.documents(spark, dir).select(col("doc_id")).as[Long]
    ids.map { id =>
      val frames = sampleFrames(encodeVideoWith(id, synthSceneRaster))
      var prev = -1L
      var prevSet = false
      var nCuts = 0L
      var firstCut = -1L
      var nf = 0L
      frames.foreach { case (f, n, ppm) =>
        nf = n.toLong
        val (w, h, off) = ppmRaster(ppm).getOrElse(
          throw new IllegalStateException(s"frame $f of doc $id is not a valid P6 PPM"))
        require(w == VideoW && h == VideoH)
        var ls = 0L
        var p = off
        while (p < ppm.length) {
          ls += 299L * (ppm(p) & 0xff) + 587L * (ppm(p + 1) & 0xff) +
            114L * (ppm(p + 2) & 0xff)
          p += 3
        }
        if (prevSet && math.abs(ls - prev) > threshold) {
          nCuts += 1
          if (firstCut < 0) firstCut = f.toLong
        }
        prev = ls
        prevSet = true
      }
      SceneRow(id, nf, frames.length.toLong, nCuts, firstCut)
    }.toDF()
  }

  /** m11 near-dup geometry: every document gets a UNIQUE base image
    * (channel formulas keyed by the raw doc_id — no shared-gid classes,
    * so distinct documents hash apart and the pair space stays linear);
    * every 3rd document also yields a NOISY twin (id + 1 000 000) whose
    * raster whites out the two sampled source pixels behind hash bits
    * (id % 64) and ((id·7 + 13) % 64) — a localized edit that moves a
    * few aHash bits, the thing m07's exact-equality dedup cannot see.
    */
  private[graft] def m11WhiteBits(id: Long): Seq[Int] =
    Seq((id % 64).toInt, ((id * 7 + 13) % 64).toInt).distinct

  /** The 16×12 source pixel the 8×8 aHash cell `b` samples (the m06
    * nearest-resize map: sy = (y·12)/8, sx = 2x).
    */
  private[graft] def m11BitToSrcPixel(b: Int): Int =
    ((b / 8) * ImgH / 8) * ImgW + 2 * (b % 8)

  /** Unique base raster for doc `id`: per-image mod-prime phase AND
    * stride per channel — a fixed stride would give every image the
    * same per-cell bias and park ~1% of arbitrary pairs inside the
    * hamming radius; varying both decorrelates backgrounds so the
    * near-dup structure (planted twins) dominates the pair space.
    */
  private[graft] def synthUniqueImage(id: Long, white: Set[Int]): Array[Byte] = {
    val P = 1000000007L
    val m1 = id % P * 616318177L % P
    val m2 = id % P * 777000037L % P
    val m3 = id % P * 888000131L % P
    val k1 = 1 + m1 % 97; val k2 = 1 + m2 % 89; val k3 = 1 + m3 % 83
    val header = s"P6\n$ImgW $ImgH\n255\n".getBytes("US-ASCII")
    val raster = new Array[Byte](ImgW * ImgH * 3)
    var p = 0
    while (p < ImgW * ImgH) {
      if (white.contains(p)) {
        raster(p * 3) = 255.toByte; raster(p * 3 + 1) = 255.toByte
        raster(p * 3 + 2) = 255.toByte
      } else {
        raster(p * 3) = ((m1 + p * k1) % 200).toByte
        raster(p * 3 + 1) = ((m2 + p * k2) % 200).toByte
        raster(p * 3 + 2) = ((m3 + p * k3) % 200).toByte
      }
      p += 1
    }
    header ++ raster
  }

  /** m11: hamming-tolerant perceptual image NEAR-dup — the d07 SimHash
    * recipe applied to m07's aHash (m07 groups EXACT hash equality;
    * real re-hosted images differ by crops/watermarks/noise that move
    * a FEW bits, which equality can never catch): the 64-bit aHash
    * splits into 4×16-bit bands, and the smaller-id side probes each
    * band value plus its 16 one-bit flips (the e03 hamming-1
    * multi-probe) — by pigeonhole a pair within hamming 7 < 2·4 has
    * SOME band differing in ≤ 1 bit, so candidate recall is GUARANTEED
    * at the radius, not probabilistic. Degenerate band values above
    * the stop cap drop out of both sides (the d06 MaxBucket device),
    * and exact popcount hamming ≤ 7 decides membership — the band tier
    * affects cost only.
    *
    * Scale shape: rasters reduce to 16 hash bytes inside the codec
    * task; the band join shuffles 24-byte rows; the cap bounds any
    * bucket's pair space; popcount runs codegen'd (`bit_count`).
    */
  def m11ImageNearDup(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val HamMax = 7
    val BandCap = 64
    val ids = Tables.documents(spark, dir).select(col("doc_id")).as[Long]
    val hashes = ids.flatMap { id =>
      def row(docId: Long, white: Set[Int]) = {
        val ppm = synthUniqueImage(id, white)
        val (w, h, off) = ppmRaster(ppm).getOrElse(
          throw new IllegalStateException(s"doc $docId synth image is not a valid P6"))
        val (hi, lo) = aHash(java.util.Arrays.copyOfRange(ppm, off, ppm.length), w, h)
        AHashRow(docId, hi, lo)
      }
      val base = row(id, Set.empty)
      if (id % 3 == 0)
        Seq(base, row(id + 1000000L,
          m11WhiteBits(id).map(m11BitToSrcPixel).toSet))
      else Seq(base)
    }.toDF()
    val bands = hashes.select(col("doc_id"), col("hash_hi"), col("hash_lo"),
      explode(expr(
        """array(
          |  struct(0 AS bi, hash_lo & 65535 AS bv),
          |  struct(1 AS bi, shiftright(hash_lo, 16) & 65535 AS bv),
          |  struct(2 AS bi, hash_hi & 65535 AS bv),
          |  struct(3 AS bi, shiftright(hash_hi, 16) & 65535 AS bv))""".stripMargin))
        .as("b"))
      .select(col("doc_id"), col("hash_hi"), col("hash_lo"),
        col("b.bi").as("bi"), col("b.bv").as("bv"))
    val hot = bands.groupBy("bi", "bv")
      .agg(count(lit(1)).as("c")).where(col("c") > BandCap)
      .select("bi", "bv")
    val ok = bands.join(hot, Seq("bi", "bv"), "left_anti")
    // hamming-1 multi-probe on the probing side: the band value itself
    // plus its 16 one-bit flips (17 probes per band, 68 per document)
    val probes = ok
      .select(col("doc_id"), col("hash_hi"), col("hash_lo"), col("bi"),
        explode(expr(
          "array_union(array(bv), transform(sequence(0, 15), k -> bv ^ shiftleft(1L, k)))"))
          .as("bv"))
      .join(hot, Seq("bi", "bv"), "left_anti")
    val pairs = probes.as("a").join(ok.as("b"),
        col("a.bi") === col("b.bi") && col("a.bv") === col("b.bv") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("a_id"), col("b.doc_id").as("b_id"),
        (expr("bit_count(a.hash_hi ^ b.hash_hi)") +
          expr("bit_count(a.hash_lo ^ b.hash_lo)")).cast("long").as("hamming"))
      .dropDuplicates("a_id", "b_id")
      .where(col("hamming") <= HamMax)
    pairs
  }

  /** The `documents` table re-shaped as a media table: text bytes stand
    * in for an encoded image; metadata struct alongside.
    */
  def mediaTable(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir).select(
      col("doc_id"),
      // null payloads become empty bytes: the typed decode row has a
      // non-nullable n_bytes, and a codec should see "no media", not
      // crash the encoder (RobustnessSpec)
      coalesce(col("text"), lit("")).cast("binary").as("payload"),
      concat(lit("application/x-graft-"), coalesce(col("lang"), lit("und"))).as("mime"),
      coalesce(length(col("text")).cast("long"), lit(0L)).as("n_bytes"))

  /** m01: end-to-end multimodal pipeline — binary column in, partition-
    * local batched decode, feature columns out. The feature vector is
    * flattened to scalar `feat_0..feat_7` columns so the result is
    * hashable/orderable by any downstream comparer (an array column is
    * not), and DuckDB-oracle-checkable.
    */
  def m01Multimodal(spark: SparkSession, dir: String): DataFrame =
    decodeFrame(mediaTable(spark, dir))

  /** Staging dir for the m02 binary-file source, keyed by (dir, appId,
    * corpus fingerprint) so concurrent sessions/dirs never collide AND
    * a corpus that changes between calls restages instead of silently
    * serving stale payloads from the `_STAGED` marker (the fingerprint
    * is a 2-column agg — row count ⊕ max doc_id ⊕ total bytes — one
    * cheap columnar scan, not a read of the payloads). Point
    * `spark.graft.media.stagingDir` at shared storage on a cluster.
    */
  private[graft] def mediaStageDir(spark: SparkSession, dir: String): String = {
    val root = spark.conf.get("spark.graft.media.stagingDir", "/tmp")
    val key = Integer.toHexString(dir.hashCode)
    val app = Integer.toHexString(spark.sparkContext.applicationId.hashCode)
    val r = Tables.documents(spark, dir)
      .agg(count(lit(1)), coalesce(max(col("doc_id")), lit(0L)),
        coalesce(sum(col("n_chars")), lit(0L))).head()
    val fp = java.lang.Long.toHexString(r.getLong(0) ^ (r.getLong(1) * 1000003L)
      ^ java.lang.Long.rotateLeft(r.getLong(2), 32))
    s"$root/graft_media_src_${key}_${app}_$fp"
  }

  /** Write one `doc_<id>.bin` file per document through the Hadoop
    * FileSystem API — executor-side, partition-parallel, no driver
    * collection — so the staged directory is honest on any
    * Hadoop-compatible store. Idempotent via a `_STAGED` marker.
    */
  private def stageMediaFiles(spark: SparkSession, dir: String, stage: String): Unit = {
    import org.apache.hadoop.fs.{Path => HPath}
    val fs = new HPath(stage).getFileSystem(spark.sessionState.newHadoopConf())
    val marker = new HPath(stage, "_STAGED")
    if (fs.exists(marker)) return
    fs.mkdirs(new HPath(stage))
    // ship the DRIVER's Hadoop conf (spark.hadoop.*, object-store
    // credentials) to the executors — a bare `new Configuration()`
    // there could resolve the same scheme differently on a real
    // cluster. SerializableConfiguration is the public Spark utility
    // for exactly this.
    val serConf = new org.apache.spark.util.SerializableConfiguration(
      spark.sessionState.newHadoopConf())
    mediaTable(spark, dir).select(col("doc_id"), col("payload"))
      .foreachPartition { rows: Iterator[org.apache.spark.sql.Row] =>
        val pfs = new HPath(stage).getFileSystem(serConf.value)
        rows.foreach { r =>
          val out = pfs.create(new HPath(stage, s"doc_${r.getLong(0)}.bin"), true)
          try out.write(r.getAs[Array[Byte]](1)) finally out.close()
        }
      }
    fs.create(marker, true).close()
  }

  /** m02: multimodal ingestion from a DIRECTORY OF FILES — the other
    * half of the m01 pipeline. m01 assumes media already sits in a
    * binary column; real corpora start as millions of image files in
    * object storage. The payloads are staged as one `.bin` file per
    * document (executor-parallel Hadoop FS writes), ingested with
    * Spark's `binaryFile` source (path/length/content schema,
    * `pathGlobFilter` pushdown), keyed by the id parsed from the file
    * name, re-joined to the catalog metadata, and decoded by the same
    * dispatch as m01 — so the end-to-end result is byte-identical to
    * m01 and shares its oracle.
    */
  def m02BinarySource(spark: SparkSession, dir: String): DataFrame = {
    val stage = mediaStageDir(spark, dir)
    stageMediaFiles(spark, dir, stage)
    val bin = spark.read.format("binaryFile")
      .option("pathGlobFilter", "*.bin").load(stage)
      .select(
        regexp_extract(col("path"), "doc_(\\d+)\\.bin$", 1).cast("long").as("doc_id"),
        col("content").as("payload"))
    val meta = Tables.documents(spark, dir).select(
      col("doc_id"),
      concat(lit("application/x-graft-"), coalesce(col("lang"), lit("und"))).as("mime"),
      coalesce(length(col("text")).cast("long"), lit(0L)).as("n_bytes"))
    decodeFrame(bin.join(meta, Seq("doc_id"))
      .select(col("doc_id"), coalesce(col("payload"), lit(Array.empty[Byte])).as("payload"),
        col("mime"), col("n_bytes")))
  }

  /** Container location for m03, keyed like the media stage (dir,
    * appId, corpus fingerprint) so a changed corpus re-compacts.
    */
  private[graft] def mediaContainerDir(spark: SparkSession, dir: String): String =
    mediaStageDir(spark, dir) + "_container"

  /** Compact the media table into a few container files — the w03
    * mechanics (range-repartition on doc_id + sort within files) so
    * each container file covers a tight id range and parquet min/max
    * stats prune point reads. Build-once via a `_STAGED` marker
    * committed after the write.
    */
  private def stageMediaContainer(spark: SparkSession, dir: String, out: String): Unit = {
    import org.apache.hadoop.fs.{Path => HPath}
    val fs = new HPath(out).getFileSystem(spark.sessionState.newHadoopConf())
    val marker = new HPath(out, "_STAGED")
    if (fs.exists(marker)) return
    mediaTable(spark, dir)
      .repartitionByRange(ContainerFiles, col("doc_id"))
      .sortWithinPartitions("doc_id")
      .write.mode("overwrite").parquet(out)
    fs.create(marker, true).close()
  }

  /** Target container file count. Locally 4; production would derive
    * it from bytes (a few hundred MB per container file), exactly like
    * w03's compaction target.
    */
  val ContainerFiles = 4

  /** m03: multimodal ingestion from a COMPACTED CONTAINER — the layout
    * production corpora actually use. m02 measured the honest cost of
    * a directory-of-small-files source (8.9× at sf1 — one open/read
    * per document); the standard fix is to batch millions of payloads
    * into a few container files (tar/WebDataset/parquet-of-binaries).
    * Here the container is parquet-of-binaries written by the w03
    * compaction mechanics, and ingestion is a plain columnar scan —
    * split by row group, no per-file cost, pruned by doc_id stats —
    * feeding the same decode dispatch as m01/m02, so the end-to-end
    * result is byte-identical to m01 and shares its oracle. The
    * file-count contrast with m02's staging is spec-pinned.
    */
  def m03ContainerSource(spark: SparkSession, dir: String): DataFrame = {
    val out = mediaContainerDir(spark, dir)
    stageMediaContainer(spark, dir, out)
    decodeFrame(spark.read
      .schema("doc_id BIGINT, payload BINARY, mime STRING, n_bytes BIGINT")
      .parquet(out))
  }

  /** Packed-shard root for m12, keyed like the other media stages. */
  private[graft] def packedShardDir(spark: SparkSession, dir: String): String =
    mediaStageDir(spark, dir) + "_packed"

  /** Build the packed shards: payloads concatenated into one raw
    * `shard_<p>.bin` per doc_id range partition (executor-parallel —
    * each task streams ITS shard through the Hadoop FS and emits the
    * (doc_id, shard, offset, len, mime) index rows as its output, so
    * packing and indexing are ONE distributed job, no driver bytes),
    * plus an `index/` parquet. Idempotent via `_STAGED`; a retried
    * task rewrites its shard with identical bytes (deterministic
    * content, create-overwrite).
    */
  private def stagePackedShards(spark: SparkSession, dir: String, root: String): Unit = {
    import org.apache.hadoop.fs.{Path => HPath}
    val fs = new HPath(root).getFileSystem(spark.sessionState.newHadoopConf())
    val marker = new HPath(root, "_STAGED")
    if (fs.exists(marker)) return
    fs.mkdirs(new HPath(root))
    val serConf = new org.apache.spark.util.SerializableConfiguration(
      spark.sessionState.newHadoopConf())
    val packed = mediaTable(spark, dir)
      .repartitionByRange(ContainerFiles, col("doc_id"))
      .sortWithinPartitions("doc_id")
      .select("doc_id", "payload", "mime", "n_bytes")
    val idxRdd = packed.rdd.mapPartitions { rows =>
      if (rows.isEmpty) Iterator.empty
      else {
        val pid = org.apache.spark.TaskContext.getPartitionId()
        val pfs = new HPath(root).getFileSystem(serConf.value)
        val shard = s"shard_$pid.bin"
        val out = pfs.create(new HPath(root, shard), true)
        var off = 0L
        val recs = rows.map { r =>
          val payload = r.getAs[Array[Byte]](1)
          out.write(payload)
          val rec = org.apache.spark.sql.Row(
            r.getLong(0), shard, off, payload.length.toLong, r.getString(2))
          off += payload.length
          rec
        }.toVector
        out.close()
        recs.iterator
      }
    }
    val idxSchema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("doc_id", org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("shard", org.apache.spark.sql.types.StringType),
      org.apache.spark.sql.types.StructField("offset", org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("len", org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("mime", org.apache.spark.sql.types.StringType)))
    spark.createDataFrame(idxRdd, idxSchema)
      .write.mode("overwrite").parquet(s"$root/index")
    fs.create(marker, true).close()
  }

  /** Read ONLY the requested members from the packed shards:
    * positioned `readFully(offset, …)` per index row, one shard open
    * per task (rows route to their shard first, sorted by offset so
    * reads are sequential within the file).
    */
  private[graft] def rangeReadMembers(
      spark: SparkSession, root: String, want: DataFrame): DataFrame = {
    import org.apache.hadoop.fs.{Path => HPath}
    val serConf = new org.apache.spark.util.SerializableConfiguration(
      spark.sessionState.newHadoopConf())
    val rdd = want.repartition(col("shard")).rdd.mapPartitions { rows =>
      rows.toVector.groupBy(_.getString(1)).iterator.flatMap { case (shard, rs) =>
        val pfs = new HPath(root).getFileSystem(serConf.value)
        val in = pfs.open(new HPath(root, shard))
        val out = rs.sortBy(_.getLong(2)).map { r =>
          val len = r.getLong(3).toInt
          val b = new Array[Byte](len)
          in.readFully(r.getLong(2), b, 0, len)
          org.apache.spark.sql.Row(r.getLong(0), b, r.getString(4), r.getLong(3))
        }
        in.close()
        out.iterator
      }
    }
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("doc_id", org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("payload", org.apache.spark.sql.types.BinaryType),
      org.apache.spark.sql.types.StructField("mime", org.apache.spark.sql.types.StringType),
      org.apache.spark.sql.types.StructField("n_bytes", org.apache.spark.sql.types.LongType)))
    spark.createDataFrame(rdd, schema)
  }

  case class VideoSig(vid: Long, ls: Long, ws: Long)

  /** m13 clip raster: m09's two-scene structure on m11's unique-phase
    * channels. m09's plain affine phases are mod-120 PERIODIC in the
    * id — ids 120 apart render byte-identical rasters, so a corpus of
    * N docs carries ~N²/120 true-duplicate pairs and the near-dup
    * pair space goes quadratic with corpus size (observed: docs 90
    * and 450 at Jaccard 1 before this raster existed). Mod-prime
    * phase AND stride per channel (the m11 linearity lesson) keep
    * distinct docs' signature sets disjoint, so the pair space is the
    * planted twins — linear. Channel values stay ≤ 119 + jit + 128 <
    * 256: no byte wrap, so the luminance closed form the oracle
    * replays is exact.
    */
  private[graft] def m13ClipRaster(id: Long, f: Int): Array[Byte] = {
    val P = 1000000007L
    val m1 = id % P * 616318177L % P
    val m2 = id % P * 777000037L % P
    val m3 = id % P * 888000131L % P
    val k1 = 1 + m1 % 97; val k2 = 1 + m2 % 89; val k3 = 1 + m3 % 83
    val shift = if (f >= sceneCutAt(id)) 128 else 0
    val jit = f % 2
    val out = new Array[Byte](VideoW * VideoH * 3)
    var p = 0
    while (p < VideoW * VideoH) {
      out(p * 3) = (((m1 + p * k1) % 120) + jit + shift).toByte
      out(p * 3 + 1) = (((m2 + p * k2) % 120) + jit + shift).toByte
      out(p * 3 + 2) = (((m3 + p * k3) % 120) + jit + shift).toByte
      p += 1
    }
    out
  }

  /** m13: VIDEO near-dup — completing the multimodal dedup matrix
    * (m07 exact image, m11 hamming-tolerant image, this row clip
    * level): re-uploaded clips are rarely byte-identical — they are
    * TRIMMED (intro cut), so per-container equality and even m11-style
    * whole-file hashing miss them. The standard fingerprint is the SET
    * of per-frame signatures (frame-sampled perceptual hashes; here
    * the m09 weighted-luminance long per sampled frame — exact
    * integers through the same codec walk) compared by Jaccard:
    * J(A,B) = |A∩B|/|A∪B| ≥ ½ declares a near-dup pair. Twin
    * geometry: every 3rd doc also yields a HEAD-TRIMMED re-upload
    * (id + 2 000 000, first 2 frames dropped, same underlying scene
    * raster) — most trims survive the stride-sampled signature set
    * (the spec pins the measured detection census); heavily-trimmed
    * 2-sample clips whose cut straddles the trim legitimately evade,
    * exactly as real fingerprinting does.
    *
    * Scale shape: rasters reduce to ONE long per sampled frame inside
    * the codec task (no shuffle touches pixels); the candidate stage
    * is a bucket join on exact signature values with the d06 MaxBucket
    * cap (a hot signature — black frames, test cards — cannot
    * quadratically explode any task), and Jaccard is exact integer
    * arithmetic from map-side-combined set sizes, one division at the
    * end.
    */
  def m13VideoNearDup(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val SigCap = 64
    val ids = Tables.documents(spark, dir).select(col("doc_id")).as[Long]
    val tokens = ids.flatMap { base =>
      def sigSet(vid: Long, nf: Int, trim: Int): Seq[VideoSig] = {
        val c = encodeVideoWith(vid, nf,
          (_, f) => m13ClipRaster(base, f + trim))
        sampleFrames(c).map { case (_, _, ppm) =>
          val (w, h, off) = ppmRaster(ppm).getOrElse(
            throw new IllegalStateException(s"clip $vid: invalid P6 frame"))
          require(w == VideoW && h == VideoH)
          // two independent exact moments per frame: plain weighted
          // luminance (concentrates by CLT — 1%+ of distinct docs
          // collide on it alone, measured) and the position-weighted
          // second projection; a cross-doc token collision needs BOTH
          // sums to coincide (0 in 5 000 synthetic docs, measured)
          var ls = 0L
          var ws = 0L
          var p = off
          var px = 0L
          while (p < ppm.length) {
            val lum = 299L * (ppm(p) & 0xff) + 587L * (ppm(p + 1) & 0xff) +
              114L * (ppm(p + 2) & 0xff)
            ls += lum
            ws += (2 * px + 1) * lum
            p += 3
            px += 1
          }
          (ls, ws)
        }.distinct.map { case (ls, ws) => VideoSig(vid, ls, ws) }
      }
      val nf = videoFrameCount(base)
      val b = sigSet(base, nf, 0)
      if (base % 3 == 0) b ++ sigSet(base + 2000000L, nf - 2, 2) else b
    }.toDF("vid", "ls", "ws")
    val sizes = tokens.groupBy("vid").agg(count(lit(1)).as("sz"))
    val hot = tokens.groupBy("ls", "ws").agg(count(lit(1)).as("c"))
      .where(col("c") > SigCap).select("ls", "ws")
    val ok = tokens.join(hot, Seq("ls", "ws"), "left_anti")
    ok.as("a").join(ok.as("b"),
        col("a.ls") === col("b.ls") && col("a.ws") === col("b.ws") &&
          col("a.vid") < col("b.vid"))
      .groupBy(col("a.vid").as("id_a"), col("b.vid").as("id_b"))
      .agg(count(lit(1)).as("n_common"))
      .join(sizes.select(col("vid").as("id_a"), col("sz").as("sz_a")), "id_a")
      .join(sizes.select(col("vid").as("id_b"), col("sz").as("sz_b")), "id_b")
      .withColumn("jaccard", col("n_common").cast("double") /
        (col("sz_a") + col("sz_b") - col("n_common")))
      .where(col("jaccard") >= 0.5)
      .select("id_a", "id_b", "n_common", "jaccard")
  }

  case class AudioSig(vid: Long, pos: Long, neg: Long)

  /** Encode mono PCM as a 16-BIT WAV byte array — the transcode target
    * for m14's re-encoded twins ([[decodeWav]] already reads both
    * depths; this is the writer for the second one). Samples are
    * signed 16-bit little-endian per the RIFF/WAVE layout.
    */
  private[graft] def encodeWav16(rate: Int, samples: Array[Int]): Array[Byte] = {
    val n = samples.length
    val bb = java.nio.ByteBuffer.allocate(44 + 2 * n)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put("RIFF".getBytes("US-ASCII")).putInt(36 + 2 * n)
      .put("WAVE".getBytes("US-ASCII"))
    bb.put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(1).putShort(1) // PCM, mono
      .putInt(rate).putInt(rate * 2) // byte rate = rate × 2 bytes/sample
      .putShort(2).putShort(16) // block align, bits
    bb.put("data".getBytes("US-ASCII")).putInt(2 * n)
    samples.foreach(s => bb.putShort(s.toShort))
    bb.array()
  }

  /** m14 clip signal: QUADRATIC residues mod a large prime —
    * s_t = ((u + t)² mod P) mod 232 − 115 with u a per-doc mod-prime
    * phase and t the ABSOLUTE stream position (so a trimmed twin's
    * samples are position-identical to the base's). The m13 affine
    * recipe is NOT enough here: a sign-of-difference pattern over an
    * affine-mod track is a Sturmian word — for a fixed slope the
    * 63-step pattern takes at most ~2·63 distinct values over the
    * whole phase circle, so docs sharing a slope phase-lock (measured:
    * docs 53/369 shared k1=82 and collided 8 of 10 windows even with a
    * second summed track, because one track's wrap dominates the
    * sign). ONE squaring round is not enough either: for x < √P ≈
    * 31 623 the mod P never wraps and x² mod 232 is PERIODIC with
    * period 116 — and the id→u map is near-rational to P (Δid = 80 ⇒
    * Δu = 10 248 ≡ 0 mod 232), so structured ids land in the
    * unwrapped regime and share whole segments (measured: 34 extra
    * pairs at Δid ∈ {80, 160}). TWO rounds — z = (x² mod P)² mod P —
    * wrap P for any x ≥ 178, and since −1 is a non-residue mod P
    * (P ≡ 3 mod 4) the composition is injective up to x → ±x: a
    * segment collision needs exact ±x alignment, which Δid·c mod P
    * cannot produce within a window span at any tested corpus size.
    * Both squarings stay exact in BIGINT/Long (≤ (P−1)² ≈ 1.0e18);
    * values lie in [-115, 116]: 8-bit clean, and ×256 stays 16-bit
    * clean for the transcoded twin.
    */
  private[graft] def m14Samples(id: Long, nw: Int, trim: Int): Array[Int] = {
    val P = 1000000007L
    val u = id % P * 700000133L % P
    Array.tabulate(64 * nw) { i =>
      val x = u + i + 64L * trim
      val y = x * x % P
      (y * y % P % 232 - 115).toInt
    }
  }

  /** m14: AUDIO near-dup — the last cell of the multimodal dedup
    * matrix (m07/m11 image, m13 video, this row audio): a re-uploaded
    * track is rarely byte-identical — it is head-trimmed AND
    * re-encoded (bit depth / gain change), so whole-file hashing and
    * even sample-equality fingerprints miss it. The robust-hash family
    * (Philips audio hash, chromaprint) fingerprints SHAPE, not level:
    * per 64-sample window, the sign pattern of successive differences
    * — two packed 63-bit masks (rises, falls) — which is EXACTLY
    * invariant under any positive gain, including the ×256 of an
    * 8→16-bit transcode. Twin geometry: every 3rd doc also yields a
    * head-trimmed (2 windows) 16-BIT re-encode of itself — the decoder
    * walks a genuinely different byte layout (biased bytes vs signed
    * LE shorts) and must land on the identical signature set; windows
    * compare as sets by Jaccard ≥ ½ (trim costs 2 of ≥ 6 windows, so
    * J = (nw−2)/nw ≥ ⅔ and every planted twin is recoverable).
    *
    * Scale shape: the m04 contract — PCM decodes and fingerprints
    * inside the codec task, the cluster shuffles 3-long signature
    * rows, never samples; candidates come from a bucket join on exact
    * signature values behind the d06 MaxBucket cap (a hot signature —
    * digital silence, test tones — cannot quadratically explode a
    * task); Jaccard is exact integer arithmetic from
    * map-side-combined distinct set sizes.
    */
  def m14AudioNearDup(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val SigCap = 64
    val ids = Tables.documents(spark, dir).select(col("doc_id")).as[Long]
    val tokens = ids.flatMap { base =>
      def sigSet(vid: Long, nw: Int, trim: Int, bits16: Boolean): Seq[AudioSig] = {
        val raw = m14Samples(base, nw, trim)
        val wav =
          if (bits16) encodeWav16(8000, raw.map(_ * 256))
          else encodeWav(8000, raw)
        val (_, s) = decodeWav(wav).getOrElse(
          throw new IllegalStateException(s"WAV round-trip failed for clip $vid"))
        (0 until nw).map { w =>
          var pos = 0L; var neg = 0L
          var j = 0
          while (j < 63) {
            val d = s(64 * w + j + 1) - s(64 * w + j)
            if (d > 0) pos |= 1L << j
            else if (d < 0) neg |= 1L << j
            j += 1
          }
          (pos, neg)
        }.distinct.map { case (p, n) => AudioSig(vid, p, n) }
      }
      val nw = (6 + base % 7).toInt
      val b = sigSet(base, nw, 0, bits16 = false)
      if (base % 3 == 0) b ++ sigSet(base + 3000000L, nw - 2, 2, bits16 = true)
      else b
    }.toDF("vid", "pos", "neg")
    val sizes = tokens.groupBy("vid").agg(count(lit(1)).as("sz"))
    val hot = tokens.groupBy("pos", "neg").agg(count(lit(1)).as("c"))
      .where(col("c") > SigCap).select("pos", "neg")
    val ok = tokens.join(hot, Seq("pos", "neg"), "left_anti")
    ok.as("a").join(ok.as("b"),
        col("a.pos") === col("b.pos") && col("a.neg") === col("b.neg") &&
          col("a.vid") < col("b.vid"))
      .groupBy(col("a.vid").as("id_a"), col("b.vid").as("id_b"))
      .agg(count(lit(1)).as("n_common"))
      .join(sizes.select(col("vid").as("id_a"), col("sz").as("sz_a")), "id_a")
      .join(sizes.select(col("vid").as("id_b"), col("sz").as("sz_b")), "id_b")
      .withColumn("jaccard", col("n_common").cast("double") /
        (col("sz_a") + col("sz_b") - col("n_common")))
      .where(col("jaccard") >= 0.5)
      .select("id_a", "id_b", "n_common", "jaccard")
  }

  /** m12: RANDOM-ACCESS container reads — the WebDataset/tar-index
    * serving pattern m03 deliberately does not cover: m03's columnar
    * container is the right layout for FULL scans, but a training-data
    * service is constantly asked for a SUBSET ("these 10k doc_ids for
    * the eval slice") and must not pay a container scan for it. The
    * corpus packs into a few raw byte shards with a parquet offset
    * index (build is one distributed job — each task writes its shard
    * and emits its index rows); a point read resolves the index
    * (columnar, doc_id-prunable), routes to shards, and positioned-
    * reads exactly the requested byte ranges. The operator reads the
    * doc_id % 7 slice and decodes it through the same dispatch as
    * m01/m03 — identical features, shared (filtered) oracle; the spec
    * pins the byte economy: bytes read = the subset's payload bytes,
    * ~1/7 of the container, never the whole file.
    */
  def m12ContainerRandomAccess(spark: SparkSession, dir: String): DataFrame = {
    val root = packedShardDir(spark, dir)
    stagePackedShards(spark, dir, root)
    val want = spark.read.parquet(s"$root/index").where(col("doc_id") % 7 === 0)
    decodeFrame(rangeReadMembers(spark, root, want))
  }

  /** The decode stage on any media-shaped frame (doc_id, payload, mime,
    * n_bytes): partition-local batched decode, scalar features out.
    */
  def decodeFrame(media: DataFrame): DataFrame = {
    import media.sparkSession.implicits._
    val decoded = media.as[MediaRow].mapPartitions { rows =>
      // per-partition init would go here (codec handles, model weights)
      rows.map { r =>
        val (checksum, feat) = decode(r.payload)
        MediaFeatures(r.doc_id, r.mime, r.n_bytes, checksum, feat)
      }
    }.toDF()
    decoded.select(
      col("doc_id") +: col("mime") +: col("n_bytes") +: col("checksum") +:
        (0 until 8).map(i => col("feat").getItem(i).as(s"feat_$i")): _*)
  }
}
