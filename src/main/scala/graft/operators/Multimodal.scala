package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing (north-star operator).
  *
  * Media (image/audio/video) are opaque `binary` columns travelling next
  * to typed metadata; decode/feature-extraction runs per partition so any
  * native decoding library is initialized once per task, not per row —
  * the Scala analog of PySpark's `mapInPandas` batching. The decode step
  * itself is STUBBED deterministically (no media libs in this container,
  * by design); everything around it — schema, batching, partitioning —
  * is real.
  *
  * Scale notes: blobs never become shuffle keys; all keys here are the
  * (small) id/metadata columns. Feature extraction is a narrow map — at
  * 100 TB it scales linearly with input splits, and column pruning means
  * metadata-only queries never read the blob column from parquet.
  */
object Multimodal {

  final case class MediaFeature(doc_id: Long, n_bytes: Long, feat0: Double, feat1: Double)

  /** Attach an opaque blob column (here synthesized from text — the
    * fixtures carry no real media) plus typed metadata. */
  def asMedia(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"), col("text").cast("binary").as("blob"),
      col("lang"), col("source"))

  final case class Frame(doc_id: Long, frame_no: Int, offset: Long, frame_bytes: Array[Byte])

  /** Frame sampling: explode each media blob into fixed-stride frames
    * with positional metadata — the video/audio analog of `explode` for
    * text tokens. The "frame boundary" here is a byte stride
    * (DETERMINISTIC STUB for a container-format parser; the Spark shape —
    * one blob row in, N typed frame rows out, blob never a shuffle key —
    * is the part under test). */
  def sampleFrames(spark: SparkSession, media: DataFrame,
                   frameLen: Int = 64, stride: Int = 128): Dataset[Frame] = {
    import spark.implicits._
    media.select("doc_id", "blob").as[(Long, Array[Byte])]
      .flatMap { case (id, blob) =>
        // a container parser would locate keyframes here
        Iterator.range(0, math.max(blob.length, 1), stride).zipWithIndex.map {
          case (off, no) =>
            Frame(id, no, off.toLong,
              java.util.Arrays.copyOfRange(blob, off, math.min(off + frameLen, blob.length)))
        }
      }
  }

  final case class MediaVec(doc_id: Long, mvec: Array[Double])

  /** Media-tower encoder: a fixed-dim embedding per blob — the image
    * half of a CLIP-style cross-modal filter. DETERMINISTIC STUB (dim
    * evenly-strided byte samples scaled to [0,1]) for a real encoder;
    * the real parts are the per-partition batching (a model would
    * initialize once per task, exactly here), the typed fixed-width
    * schema, and the blob never becoming a shuffle key — downstream
    * joins move `dim` doubles per row, never the media bytes. */
  def embedStub(spark: SparkSession, media: DataFrame,
                dim: Int = 8): Dataset[MediaVec] = {
    import spark.implicits._
    media.select("doc_id", "blob").as[(Long, Array[Byte])]
      .mapPartitions { batch =>
        // a real encoder (CLIP image tower) loads HERE, once per task
        batch.map { case (id, blob) =>
          val n = blob.length
          MediaVec(id, Array.tabulate(dim)(j =>
            if (n == 0) 0.0
            else (blob(((j.toLong * n) / dim).toInt) & 0xff) / 255.0))
        }
      }
  }

  final case class Thumb(doc_id: Long, n_bytes: Long, thumb_len: Long,
                         thumb_sum: Long, thumb_head: Long, thumb_tail: Long)

  /** Resize: nearest-neighbor resampling of each blob to `target` bytes —
    * the 1-D form of the image-resize kernel (source index =
    * `i * n / target`, floor). DETERMINISTIC STUB for a real resampler
    * (same contract as [[decodeFeatures]]: swap the body for an image
    * library; the per-partition batching, typed schema, and
    * blob-never-a-key plan shape are the parts under test). Returns
    * summary scalars of the thumbnail so the result is oracle-comparable
    * without binary columns in the output. */
  def resizeStub(spark: SparkSession, media: DataFrame,
                 target: Int = 16): Dataset[Thumb] = {
    import spark.implicits._
    media.select("doc_id", "blob").as[(Long, Array[Byte])]
      .mapPartitions { batch =>
        batch.map { case (id, blob) =>
          val n = blob.length
          if (n == 0) Thumb(id, 0L, 0L, 0L, -1L, -1L)
          else {
            var sum = 0L; var i = 0
            while (i < target) {
              sum += blob((i.toLong * n / target).toInt) & 0xff
              i += 1
            }
            Thumb(id, n.toLong, target.toLong, sum,
              (blob(0) & 0xff).toLong,
              (blob(((target - 1).toLong * n / target).toInt) & 0xff).toLong)
          }
        }
      }
  }

  /** Partition-batched "decode": DETERMINISTIC STUB for the media decoder
    * (a real deployment swaps the body for e.g. JPEG decode + model
    * features; the Spark-side contract — one initialization per partition,
    * typed output schema — is what's under test). */
  def decodeFeatures(spark: SparkSession, media: DataFrame): Dataset[MediaFeature] = {
    import spark.implicits._
    media.select("doc_id", "blob").as[(Long, Array[Byte])]
      .mapPartitions { batch =>
        // per-partition init happens here (codec tables, model weights, …)
        batch.map { case (id, blob) =>
          val n = blob.length.toLong
          // stub features: byte-sum and alternating-sum — deterministic
          var s0 = 0L; var s1 = 0L; var i = 0
          while (i < blob.length) {
            s0 += blob(i) & 0xff
            s1 += (if (i % 2 == 0) 1 else -1) * (blob(i) & 0xff)
            i += 1
          }
          MediaFeature(id, n, s0.toDouble / math.max(n, 1), s1.toDouble / math.max(n, 1))
        }
      }
  }
}
