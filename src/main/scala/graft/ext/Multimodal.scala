package graft.ext

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** A multimodal record: an opaque binary payload plus typed metadata.
  * At 100 TB the payload column stays opaque to the planner (never
  * decoded during relational work) and metadata carries the prunable,
  * filterable attributes. */
final case class MediaRecord(
    doc_id: Long,
    payload: Array[Byte],
    mime: String,
    n_bytes: Long)

/** Deterministic per-record features produced by the (stubbed) decoder. */
final case class MediaFeatures(
    doc_id: Long,
    n_bytes: Long,
    width: Int,
    height: Int,
    features: Array[Float])

/** Output of the (stubbed) resize stage: source dims from the decoder,
  * target dims, and a checksum over the stride-resampled payload. */
final case class ResizedMedia(
    doc_id: Long,
    src_w: Int,
    src_h: Int,
    target_w: Int,
    target_h: Int,
    checksum: Long)

/** One sampled frame of a media payload treated as fixed-size-frame video. */
final case class MediaFrame(
    doc_id: Long,
    frame_idx: Int,
    n_frame_bytes: Int,
    checksum: Long)

/** Multimodal-column plumbing for the LLM-data-pipeline layer (SURVEY.md
  * §2.11): image/audio/video as opaque `binary` columns with typed metadata,
  * and a decode/feature-extract stage. The Spark-side shape (schema,
  * partition-parallel batched execution, typed output) is real everywhere;
  * the codec itself is REAL for image mimes (javax.imageio: PNG/BMP/GIF/
  * JPEG) and WAV audio (javax.sound.sampled — both pure-JDK), and STUBBED
  * only for mimes with no JDK codec (mp4/mp3/webp — media libraries are
  * not in this container), with an honest deterministic fallback.
  */
object Multimodal {

  /** Lift a text corpus into a media table: the UTF-8 bytes stand in for an
    * opaque payload; metadata (mime, byte length) is typed and prunable. */
  def mediaTable(docs: DataFrame, idCol: String = "doc_id",
                 textCol: String = "text"): DataFrame =
    docs.select(
      col(idCol).as("doc_id"),
      col(textCol).cast("binary").as("payload"),
      lit("application/octet-stream").as("mime"),
      octet_length(col(textCol).cast("binary")).cast("long").as("n_bytes"))

  /** STUB decoder for OPAQUE payloads (mime we have no codec for):
    * deterministic function of the payload bytes so tests and the driver
    * see stable output. Real image mimes take [[decodeImage]] instead —
    * see [[decode]] for the dispatch. */
  private def decodeStub(payload: Array[Byte]): (Int, Int, Array[Float]) = {
    val w = 1 + (payload.length % 640)
    val h = 1 + (if (payload.isEmpty) 0 else (payload(0) & 0xff) % 480)
    val feats = Array.tabulate(8) { i =>
      if (payload.length > i) (payload(i) & 0xff) / 255.0f else 0.0f
    }
    (w, h, feats)
  }

  /** Image mimes [[decode]] routes to the REAL decoder. All four readers
    * ship with the JDK (javax.imageio) — no external dependency. */
  private val imageMimes =
    Set("image/png", "image/bmp", "image/gif", "image/jpeg")

  /** REAL image decoder (javax.imageio — pure JVM, in every Java 17
    * runtime): decodes the payload and computes an 8-float feature vector
    * over the pixels in raster order —
    * [meanR, meanG, meanB, meanLuma, stdLuma, minLuma, maxLuma, aspect]
    * (channels normalized to [0,1], aspect = w/(w+h), luma = the exact
    * integer (r+g+b)/3 per pixel before normalization). For the lossless
    * formats (PNG/BMP/GIF) the decoded raster is bit-exact, so every
    * feature is a deterministic function of the payload. Returns None when
    * the bytes do not decode (truncated file, wrong mime) — the caller
    * falls back to the stub rather than failing the partition. */
  /** ImageIO's default stream cache is a DISK-backed temp file per read —
    * one file create/delete per record across 32 decode threads. Keep the
    * cache in memory (process-wide, set once; MemoryCacheImageInputStream
    * replaces FileCacheImageInputStream). */
  private lazy val imageIoMemCache: Unit =
    javax.imageio.ImageIO.setUseCache(false)

  def decodeImage(payload: Array[Byte]): Option[(Int, Int, Array[Float])] = {
    imageIoMemCache
    try {
      val img = javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(payload))
      if (img == null) None
      else {
        val (w, h) = (img.getWidth, img.getHeight)
        var (sr, sg, sb, sl, sll) = (0L, 0L, 0L, 0L, 0L)
        var minL = 255L
        var maxL = 0L
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w) {
            val rgb = img.getRGB(x, y)
            val r = (rgb >> 16) & 0xff
            val g = (rgb >> 8) & 0xff
            val b = rgb & 0xff
            val l = (r + g + b) / 3
            sr += r; sg += g; sb += b; sl += l; sll += l.toLong * l
            if (l < minL) minL = l
            if (l > maxL) maxL = l
            x += 1
          }
          y += 1
        }
        val n = w.toLong * h
        val meanL = sl.toDouble / n
        val varL = sll.toDouble / n - meanL * meanL
        Some((w, h, Array(
          (sr.toDouble / n / 255.0).toFloat,
          (sg.toDouble / n / 255.0).toFloat,
          (sb.toDouble / n / 255.0).toFloat,
          (meanL / 255.0).toFloat,
          (math.sqrt(math.max(varL, 0.0)) / 255.0).toFloat,
          (minL / 255.0).toFloat,
          (maxL / 255.0).toFloat,
          (w.toDouble / (w + h)).toFloat)))
      }
    } catch { case _: Exception => None }
  }

  /** Audio mimes [[decode]] routes to the REAL decoder — the WAV/PCM
    * container family javax.sound.sampled parses out of the box (the JDK
    * audio analog of the imageio precedent above). Compressed codecs
    * (mp3/aac/ogg) have no JDK decoder and stay on the stub. */
  private val audioMimes = Set("audio/wav", "audio/x-wav", "audio/wave")

  /** REAL audio decoder (javax.sound.sampled — pure JVM, in every Java 17
    * runtime): parses the WAV container and returns (format, decoded PCM
    * samples as Ints, frame-major with channels interleaved). Only the
    * uncompressed signed-16-bit PCM shape is accepted — that is what
    * [[encodePcmWav]] writes and what "WAV" means in a data pipeline;
    * anything else returns None and the caller falls back to the stub
    * rather than failing the partition. */
  /** The JVM's registered audio-container parsers, materialized ONCE:
    * `AudioSystem.getAudioInputStream` re-resolves providers through a
    * SYNCHRONIZED, TTL-cached JDK lookup on EVERY call, which convoys 32
    * decode threads behind one lock (measured: mm_decode_wav went
    * superlinear, 25×/decade, purely on that lock). The public
    * ServiceLoader SPI yields the same stateless reader instances
    * (WaveFileReader et al.) without the per-call global lock. */
  private lazy val audioReaders: Seq[javax.sound.sampled.spi.AudioFileReader] = {
    import scala.jdk.CollectionConverters._
    val all = java.util.ServiceLoader
      .load(classOf[javax.sound.sampled.spi.AudioFileReader])
      .asScala.toSeq
    // order by a one-time probe so the WAV-matching reader is tried FIRST:
    // every non-matching probe THROWS (fillInStackTrace on a deep codegen'd
    // task stack), and paying 2-3 exception constructions per record
    // dominates the actual header parse
    val probe = encodePcmWav(Array(0))
    val (ok, rest) = all.partition { r =>
      try {
        r.getAudioInputStream(new java.io.ByteArrayInputStream(probe)).close()
        true
      } catch { case _: Exception => false }
    }
    ok ++ rest
  }

  def decodeAudio(payload: Array[Byte])
      : Option[(javax.sound.sampled.AudioFormat, Array[Int])] = {
    try {
      val in = audioReaders.view
        .flatMap { r =>
          try Some(r.getAudioInputStream(
            new java.io.ByteArrayInputStream(payload)))
          catch { case _: Exception => None }
        }
        .headOption
        .getOrElse(throw new javax.sound.sampled
          .UnsupportedAudioFileException("no reader matched"))
      try {
        val fmt = in.getFormat
        if (fmt.getEncoding !=
              javax.sound.sampled.AudioFormat.Encoding.PCM_SIGNED ||
            fmt.getSampleSizeInBits != 16) None
        else {
          val bytes = in.readAllBytes()
          val n = bytes.length / 2
          val out = new Array[Int](n)
          var j = 0
          while (j < n) {
            out(j) =
              if (fmt.isBigEndian)
                (bytes(2 * j) << 8) | (bytes(2 * j + 1) & 0xff)
              else
                (bytes(2 * j + 1) << 8) | (bytes(2 * j) & 0xff)
            j += 1
          }
          Some((fmt, out))
        }
      } finally in.close()
    } catch { case _: Exception => None }
  }

  /** [[decodeAudio]] mapped onto the dispatch's (w, h, feats) shape:
    * w = decoded sample count, h = channels, feats =
    * [meanAmp, stdAmp, minS, maxS, zeroCrossRate, rate/48k, channels/8, 0]
    * with sample values normalized by 32768 — deterministic functions of
    * the decoded PCM, so a WAV built from known bytes oracles exactly. */
  private def audioFeatures(payload: Array[Byte])
      : Option[(Int, Int, Array[Float])] =
    decodeAudio(payload).map { case (fmt, s) =>
      val n = s.length
      var (sa, sll) = (0L, 0L)
      var mn = if (n == 0) 0 else Int.MaxValue
      var mx = if (n == 0) 0 else Int.MinValue
      var zc = 0
      var j = 0
      while (j < n) {
        val v = s(j)
        sa += math.abs(v); sll += v.toLong * v
        if (v < mn) mn = v
        if (v > mx) mx = v
        if (j > 0 && ((s(j - 1) >= 0) != (v >= 0))) zc += 1
        j += 1
      }
      val meanA = if (n == 0) 0.0 else sa.toDouble / n
      val varA = if (n == 0) 0.0 else sll.toDouble / n - meanA * meanA
      (n, fmt.getChannels, Array(
        (meanA / 32768.0).toFloat,
        (math.sqrt(math.max(varA, 0.0)) / 32768.0).toFloat,
        (mn / 32768.0).toFloat,
        (mx / 32768.0).toFloat,
        (if (n <= 1) 0.0 else zc.toDouble / (n - 1)).toFloat,
        (fmt.getSampleRate / 48000.0).toFloat,
        (fmt.getChannels / 8.0).toFloat,
        0.0f))
    }

  /** Decode dispatch: real codec for image and WAV-audio mimes (stub
    * fallback when the bytes do not decode), stub for everything else.
    * The mapPartitions plumbing, batch shape, and output schema are
    * identical either way — adding a codec for a new mime touches only
    * this function. */
  private[graft] def decode(payload: Array[Byte],
                            mime: String): (Int, Int, Array[Float]) =
    if (imageMimes.contains(mime))
      decodeImage(payload).getOrElse(decodeStub(payload))
    else if (audioMimes.contains(mime))
      audioFeatures(payload).getOrElse(decodeStub(payload))
    else decodeStub(payload)

  /** Encode a grayscale w×h image as a real BMP via javax.imageio —
    * `gray(j)` gives pixel j's luma in raster order. The fixture
    * generator for the real-decoder path (mm_decode_bmp and
    * MultimodalSpec): BMP is uncompressed, so encode→decode round-trips
    * every byte exactly. */
  def encodeGrayBmp(w: Int, h: Int, gray: Int => Int): Array[Byte] = {
    require(w > 0 && h > 0, s"bad dims ${w}x$h")
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_3BYTE_BGR)
    var j = 0
    while (j < w * h) {
      val g = gray(j) & 0xff
      img.setRGB(j % w, j / w, (g << 16) | (g << 8) | g)
      j += 1
    }
    val out = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "bmp", out)
    out.toByteArray
  }

  /** Decode / feature-extract stage: partition-parallel over the media
    * table, one typed output row per record. `mapPartitions` (not per-row
    * `map`) so a real codec can amortize model/codec init per partition —
    * the standard batched-UDF shape. */
  def extractFeatures(spark: SparkSession, media: DataFrame): Dataset[MediaFeatures] = {
    import spark.implicits._
    media.select("doc_id", "payload", "mime", "n_bytes").as[MediaRecord]
      .mapPartitions { it =>
        // per-partition init of a heavier codec/model would go here
        it.map { rec =>
          val (w, h, feats) = decode(rec.payload, rec.mime)
          MediaFeatures(rec.doc_id, rec.n_bytes, w, h, feats)
        }
      }
  }

  /** The real-decoder round trip, fixture included: render each record's
    * payload bytes into a w×h grayscale image, ENCODE it as a real BMP,
    * then run the same [[decode]] path production media takes. Emitted
    * per record: decoded dims plus the exact integer luma sum — pixel j's
    * luma is payload byte (j mod len), so the whole encode→decode→measure
    * pipeline is replayable from the payload bytes alone (the oracle
    * never needs a BMP codec). Dims derive from the record: w = 1 +
    * n_bytes mod 16, h = 1 + doc_id mod 16. Empty payloads pass through
    * with dims 0 and sum 0 (nothing to render). */
  def bmpRoundTrip(spark: SparkSession, media: DataFrame): DataFrame = {
    import spark.implicits._
    media.select("doc_id", "payload", "mime", "n_bytes").as[MediaRecord]
      .mapPartitions { it =>
        it.map { rec =>
          val len = rec.payload.length
          if (len == 0) (rec.doc_id, 0, 0, 0L)
          else {
            val w = 1 + (rec.n_bytes % 16).toInt
            val h = 1 + (rec.doc_id % 16).toInt
            val bmp = encodeGrayBmp(w, h,
              j => rec.payload(j % len) & 0xff)
            val (dw, dh, _) = decode(bmp, "image/bmp")
            var sum = 0L
            var j = 0
            while (j < w * h) { sum += rec.payload(j % len) & 0xff; j += 1 }
            // the DECODED dims are reported (proving the real codec ran);
            // the luma sum is recomputed from the decoded raster
            val img = javax.imageio.ImageIO.read(
              new java.io.ByteArrayInputStream(bmp))
            var decSum = 0L
            var y = 0
            while (y < dh) {
              var x = 0
              while (x < dw) {
                decSum += img.getRGB(x, y) & 0xff
                x += 1
              }
              y += 1
            }
            assert(decSum == sum,
              s"BMP round-trip luma drift for doc ${rec.doc_id}")
            (rec.doc_id, dw, dh, decSum)
          }
        }
      }.toDF("doc_id", "width", "height", "luma_sum")
      .select(col("doc_id"), col("width").cast("long").as("width"),
        col("height").cast("long").as("height"), col("luma_sum"))
  }

  /** Encode mono signed-16-bit PCM samples as a real WAV via
    * javax.sound.sampled — the audio fixture generator mirroring
    * [[encodeGrayBmp]]: PCM is uncompressed, so encode→decode round-trips
    * every sample exactly. */
  def encodePcmWav(samples: Array[Int],
                   sampleRate: Float = 8000f): Array[Byte] = {
    require(samples.nonEmpty, "empty sample array")
    val fmt = new javax.sound.sampled.AudioFormat(
      sampleRate, 16, 1, true, false) // mono, signed, little-endian
    val bytes = new Array[Byte](samples.length * 2)
    var j = 0
    while (j < samples.length) {
      bytes(2 * j) = (samples(j) & 0xff).toByte
      bytes(2 * j + 1) = ((samples(j) >> 8) & 0xff).toByte
      j += 1
    }
    val ais = new javax.sound.sampled.AudioInputStream(
      new java.io.ByteArrayInputStream(bytes), fmt, samples.length.toLong)
    val out = new java.io.ByteArrayOutputStream()
    // same per-call synchronized provider lookup as the read side
    // (AudioSystem.write → getAudioFileWriters) — use the cached SPI
    val w = audioWriters.find(
        _.isFileTypeSupported(javax.sound.sampled.AudioFileFormat.Type.WAVE))
      .getOrElse(throw new IllegalStateException("no WAVE writer SPI"))
    w.write(ais, javax.sound.sampled.AudioFileFormat.Type.WAVE, out)
    out.toByteArray
  }

  /** Write-side twin of [[audioReaders]] — see the lock-convoy note there. */
  private lazy val audioWriters: Seq[javax.sound.sampled.spi.AudioFileWriter] = {
    import scala.jdk.CollectionConverters._
    java.util.ServiceLoader
      .load(classOf[javax.sound.sampled.spi.AudioFileWriter])
      .asScala.toSeq
  }

  /** The real-audio-decoder round trip, fixture included — the WAV twin
    * of [[bmpRoundTrip]]: render each record's payload bytes into
    * n = 1 + n_bytes mod 64 mono PCM samples (sample j =
    * (byte(j mod len) − 128) << 8, a full-scale signed 16-bit value),
    * ENCODE as a real WAV, then run the same [[decode]] dispatch
    * production media takes. Emitted per record: the DECODED sample and
    * channel counts plus Σ|decoded_j| >> 8 = Σ|byte − 128| — recomputed
    * from the decoded PCM, so a hash match proves the real codec ran and
    * round-tripped every sample while the oracle replays only byte
    * arithmetic (ASCII corpus: byte = ord(char), as all mm_* oracles
    * assume). Empty payloads pass through as zeros. */
  def wavRoundTrip(spark: SparkSession, media: DataFrame): DataFrame = {
    import spark.implicits._
    media.select("doc_id", "payload", "mime", "n_bytes").as[MediaRecord]
      .mapPartitions { it =>
        it.map { rec =>
          val len = rec.payload.length
          if (len == 0) (rec.doc_id, 0L, 0L, 0L)
          else {
            val n = 1 + (rec.n_bytes % 64).toInt
            val wav = encodePcmWav(Array.tabulate(n)(j =>
              ((rec.payload(j % len) & 0xff) - 128) << 8))
            // production dispatch (proves the mime routing runs the
            // real codec), then the decoded PCM for the measurements
            val (dn, dch, _) = decode(wav, "audio/wav")
            val dec = decodeAudio(wav).getOrElse(
              throw new IllegalStateException(
                s"WAV round-trip undecodable for doc ${rec.doc_id}"))
            var sum = 0L
            dec._2.foreach(v => sum += math.abs(v >> 8))
            assert(dn == n && dch == 1,
              s"WAV round-trip frame drift for doc ${rec.doc_id}")
            (rec.doc_id, dn.toLong, dch.toLong, sum)
          }
        }
      }.toDF("doc_id", "n_samples", "channels", "amp_sum")
  }

  /** Audio feature-extraction stage over DECODED PCM — the signal stats a
    * training pipeline gates audio on (silence/clipping/noise filters),
    * kept exact-integer so a SQL oracle replays them bit-for-bit. Same
    * encode→[[decodeAudio]] fixture as [[wavRoundTrip]] (sample j =
    * (byte(j mod len) − 128) << 8), but the measurements are the gating
    * features: mean-crossing count (DC-offset-corrected zero-crossing
    * rate — the plain ZCR is degenerate on an all-ASCII corpus whose
    * samples never change sign; crossings of the per-clip mean are the
    * standard correction and stay exact via the integer cross-multiply
    * s·n vs Σs), Σ s² energy (silence gate; ≤ 64·2^30, BIGINT-exact),
    * and peak |s| (clipping gate). All three recompute from the
    * decoder's output samples, so a hash match proves the real codec's
    * PCM — not the input bytes — fed the features. Per-record work is
    * O(samples); the stage is partition-parallel with no shuffle. */
  def wavAudioStats(spark: SparkSession, media: DataFrame): DataFrame = {
    import spark.implicits._
    media.select("doc_id", "payload", "mime", "n_bytes").as[MediaRecord]
      .mapPartitions { it =>
        it.map { rec =>
          val len = rec.payload.length
          if (len == 0) (rec.doc_id, 0L, 0L, 0L, 0L)
          else {
            val n = 1 + (rec.n_bytes % 64).toInt
            val wav = encodePcmWav(Array.tabulate(n)(j =>
              ((rec.payload(j % len) & 0xff) - 128) << 8))
            val s = decodeAudio(wav).getOrElse(
              throw new IllegalStateException(
                s"WAV stats undecodable for doc ${rec.doc_id}"))._2
            var (sum, energy, peak) = (0L, 0L, 0L)
            s.foreach { v =>
              sum += v; energy += v.toLong * v
              if (math.abs(v) > peak) peak = math.abs(v)
            }
            // mean crossings: sign of (s_j − mean) via s_j·n − Σs (exact)
            var (mc, j) = (0L, 1)
            while (j < s.length) {
              val prev = s(j - 1).toLong * s.length - sum >= 0
              val cur = s(j).toLong * s.length - sum >= 0
              if (prev != cur) mc += 1
              j += 1
            }
            (rec.doc_id, s.length.toLong, mc, energy, peak)
          }
        }
      }.toDF("doc_id", "n_samples", "mean_crossings", "energy", "peak")
  }

  /** Resize stage (STUB resampler): a real image resize keeps one sample
    * per target pixel; the stub keeps one payload byte per target cell at
    * a fixed stride and checksums them — deterministic, so the whole
    * partition-parallel pipeline is oracle-checkable. Same swap-only-the-
    * kernel contract as [[extractFeatures]]. */
  def resize(spark: SparkSession, media: DataFrame,
             targetW: Int, targetH: Int): Dataset[ResizedMedia] = {
    import spark.implicits._
    media.select("doc_id", "payload", "mime", "n_bytes").as[MediaRecord]
      .mapPartitions { it =>
        val n = targetW * targetH
        it.map { rec =>
          val (w, h, _) = decode(rec.payload, rec.mime)
          val stride = math.max(rec.payload.length / n, 1)
          var sum = 0L
          var j = 0
          while (j < n) {
            val p = j * stride
            if (p < rec.payload.length) sum += rec.payload(p) & 0xff
            j += 1
          }
          ResizedMedia(rec.doc_id, w, h, targetW, targetH, sum)
        }
      }
  }

  /** Average-hash perceptual signature (STUB sampler): 64 payload bytes at
    * fixed stride stand in for the 8×8 downsampled luma grid; bit i is set
    * when sample i exceeds the sample mean (strictly — equal-to-mean is 0).
    * Near-identical payloads differ in few bits, so Hamming distance is the
    * duplicate metric. A real pHash swaps the sampler for decoded-pixel
    * DCT; the 64-bit signature and everything downstream stay. */
  def perceptualHashes(spark: SparkSession, media: DataFrame): DataFrame = {
    import spark.implicits._
    media.select("doc_id", "payload", "mime", "n_bytes").as[MediaRecord]
      .mapPartitions { it =>
        it.map { rec =>
          val len = rec.payload.length
          val stride = math.max(len / 64, 1)
          val v = Array.tabulate(64) { i =>
            val p = i * stride
            if (p < len) rec.payload(p) & 0xff else 0
          }
          val total = v.sum
          var sig = 0L
          var i = 0
          while (i < 64) {
            if (v(i).toLong * 64 > total) sig |= 1L << i
            i += 1
          }
          (rec.doc_id, sig)
        }
      }.toDF("id", "sim")
  }

  /** Media near-dup pairs: banded join on the perceptual hash + exact
    * Hamming verify ([[graft.ext.Dedup.signaturePairs]] — the same
    * machinery as SimHash text dedup, over the media signature). */
  def phashPairs(spark: SparkSession, media: DataFrame,
                 maxDist: Int = 3, bands: Int = 8): DataFrame =
    Dedup.signaturePairs(perceptualHashes(spark, media), maxDist, 64, bands)

  /** Frame-sampling stage: the payload viewed as fixed-`frameBytes` frames,
    * keeping every `every`-th frame — the video-keyframe shape (one output
    * row per kept frame, row growth bounded by len/frameBytes/every).
    * Checksum stands in for the decoded frame tensor. */
  def sampleFrames(spark: SparkSession, media: DataFrame,
                   frameBytes: Int = 16, every: Int = 2): Dataset[MediaFrame] = {
    import spark.implicits._
    media.select("doc_id", "payload", "mime", "n_bytes").as[MediaRecord]
      .mapPartitions { it =>
        it.flatMap { rec =>
          val len = rec.payload.length
          val nFrames = (len + frameBytes - 1) / frameBytes
          (0 until nFrames by every).iterator.map { f =>
            val from = f * frameBytes
            val until = math.min(from + frameBytes, len)
            var sum = 0L
            var i = from
            while (i < until) { sum += rec.payload(i) & 0xff; i += 1 }
            MediaFrame(rec.doc_id, f, until - from, sum)
          }
        }
      }
  }
}
