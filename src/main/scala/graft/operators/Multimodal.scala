package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: image/audio/video as opaque `binary` columns
  * with typed metadata, and partition-batched feature extraction.
  *
  * The decode step is a clearly-marked deterministic STUB (no image/audio
  * codecs in this container — builder prompt). Everything around it is the
  * real Spark shape a production pipeline needs:
  *  - schema: (id, media: binary, meta: struct<mime,n_bytes>)
  *  - partition-batched processing via typed `mapPartitions` (the Scala
  *    analogue of mapInPandas: one iterator per partition, amortized
  *    per-batch model setup, no per-row driver round-trips)
  *  - deterministic frame sampling producing 1→N rows (flatMap).
  */
object Multimodal {

  final case class MediaRow(id: Long, media: Array[Byte], mime: String)
  final case class MediaFeatures(
      id: Long, width: Int, height: Int, channels: Int, features: Array[Float])
  final case class MediaFrame(id: Long, frame_idx: Int, frame: Array[Byte])

  /** Pack a string column as fake media bytes + metadata — the schema/
    * plumbing used by tests and the verify query (real pipelines would read
    * binaryFile sources here: `spark.read.format("binaryFile")`).
    */
  def packText(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(
      col(idCol).cast("long").as("id"),
      col(textCol).cast("binary").as("media"),
      struct(
        lit("text/plain").as("mime"),
        length(col(textCol).cast("binary")).as("n_bytes")).as("meta"))

  /** STUB decoder ??? — stands in for a real image/audio decode.
    * Deterministic fake: "dimensions" derived from byte length, "pixels"
    * from a rolling hash of the payload. Replace with a codec in prod.
    */
  def decodeStub(bytes: Array[Byte]): (Int, Int, Int) = {
    val w = 16 + (bytes.length % 64)
    val h = 16 + ((bytes.length / 64) % 64)
    (w, h, 3)
  }

  /** Partition-batched feature extraction. The per-partition iterator is
    * the batch: decoder state (in prod: a model/codec handle) is created
    * once per partition, then streamed — identical execution shape to
    * mapInPandas batches.
    */
  def extractFeatures(ds: Dataset[MediaRow], dim: Int = 8)(
      implicit spark: SparkSession): Dataset[MediaFeatures] = {
    import spark.implicits._
    ds.mapPartitions { rows =>
      // per-partition setup happens HERE (once), not per row
      rows.map { r =>
        val bytes = if (r.media == null) Array.emptyByteArray else r.media
        val (w, h, c) = decodeStub(bytes)
        // STUB feature vector: deterministic rolling hash per bucket
        val feats = new Array[Float](dim)
        var i = 0
        var acc = 1469598103934665603L // FNV offset basis
        while (i < bytes.length) {
          acc = (acc ^ bytes(i)) * 1099511628211L
          feats(i % dim) += (acc % 1000L).toFloat / 1000f
          i += 1
        }
        MediaFeatures(r.id, w, h, c, feats)
      }
    }
  }

  final case class MediaResized(
      id: Long, width: Int, height: Int, channels: Int, media: Array[Byte])

  /** Resize to `outW`×`outH` by nearest-neighbor over the stub-decoded
    * byte grid — the payload-size normalization step of an image
    * pipeline (real codecs replace [[decodeStub]] + the byte indexing;
    * the Spark shape — partition-batched map, output payload bounded by
    * outW·outH·c regardless of input size — is the production one).
    * Indexing is total for any payload length (modulo wrap), so the stub
    * stays deterministic on arbitrary bytes.
    */
  def resize(ds: Dataset[MediaRow], outW: Int, outH: Int)(
      implicit spark: SparkSession): Dataset[MediaResized] = {
    require(outW > 0 && outH > 0, "target dims must be positive")
    // c is at most 3 (decodeStub); 4 leaves margin so outW*outH*c can
    // never wrap Int and corrupt the index arithmetic below
    require(outW.toLong * outH <= Int.MaxValue / 4,
      s"target payload $outW x $outH exceeds array addressing")
    import spark.implicits._
    ds.mapPartitions { rows =>
      rows.map { r =>
        val bytes = if (r.media == null) Array.emptyByteArray else r.media
        val (w, h, c) = decodeStub(bytes)
        val out = new Array[Byte](outW * outH * c)
        val len = bytes.length
        if (len > 0) {
          var y = 0
          while (y < outH) {
            val srcY = (y.toLong * h / outH).toInt
            var x = 0
            while (x < outW) {
              val srcX = (x.toLong * w / outW).toInt
              var ch = 0
              while (ch < c) {
                out((y * outW + x) * c + ch) =
                  bytes(((srcY * w + srcX) * c + ch) % len)
                ch += 1
              }
              x += 1
            }
            y += 1
          }
        }
        MediaResized(r.id, outW, outH, c, out)
      }
    }
  }

  /** Deterministic frame sampling: n evenly-spaced fixed-size slices of the
    * payload (stands in for video frame extraction; 1→N via flatMap).
    */
  def sampleFrames(ds: Dataset[MediaRow], n: Int, frameBytes: Int = 256)(
      implicit spark: SparkSession): Dataset[MediaFrame] = {
    import spark.implicits._
    ds.flatMap { r =>
      val len = if (r.media == null) 0 else r.media.length
      if (len == 0) Iterator.empty
      else (0 until n).iterator.map { k =>
        val start = ((len.toLong * k) / n).toInt.min(math.max(0, len - 1))
        val end = math.min(len, start + frameBytes)
        MediaFrame(r.id, k, java.util.Arrays.copyOfRange(r.media, start, end))
      }
    }
  }
}
