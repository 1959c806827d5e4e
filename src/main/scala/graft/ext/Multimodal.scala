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
  * and a decode/feature-extract stage whose Spark-side shape (schema,
  * partition-parallel batched execution, typed output) is real while the
  * actual codec is STUBBED — media libraries are not in this container.
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

  /** STUB decoder: stands in for a real image/audio codec (not available in
    * this container). Deterministic function of the payload bytes so tests
    * and the driver see stable output. A real deployment swaps only this
    * function — the mapPartitions plumbing, batch shape, and output schema
    * stay as-is. */
  private def decodeStub(payload: Array[Byte]): (Int, Int, Array[Float]) = {
    val w = 1 + (payload.length % 640)
    val h = 1 + (if (payload.isEmpty) 0 else (payload(0) & 0xff) % 480)
    val feats = Array.tabulate(8) { i =>
      if (payload.length > i) (payload(i) & 0xff) / 255.0f else 0.0f
    }
    (w, h, feats)
  }

  /** Decode / feature-extract stage: partition-parallel over the media
    * table, one typed output row per record. `mapPartitions` (not per-row
    * `map`) so a real codec can amortize model/codec init per partition —
    * the standard batched-UDF shape. */
  def extractFeatures(spark: SparkSession, media: DataFrame): Dataset[MediaFeatures] = {
    import spark.implicits._
    media.select("doc_id", "payload", "mime", "n_bytes").as[MediaRecord]
      .mapPartitions { it =>
        // per-partition init of the (stub) codec would go here
        it.map { rec =>
          val (w, h, feats) = decodeStub(rec.payload)
          MediaFeatures(rec.doc_id, rec.n_bytes, w, h, feats)
        }
      }
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
          val (w, h, _) = decodeStub(rec.payload)
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
