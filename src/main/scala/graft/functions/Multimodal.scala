package graft.functions

import org.apache.spark.sql.{DataFrame, Dataset, Encoder, Encoders, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column handling: image/audio/video as opaque `binary` columns
  * with typed metadata, processed by per-partition batch functions — the
  * Scala analog of `mapInPandas` batch UDFs.
  *
  * The decode step is a STUB (this container has no image/audio codecs): a
  * clearly-marked deterministic fake that parses dimensions from the payload
  * bytes. Everything around it — schema, batching, partition sizing, the
  * mapPartitions plumbing — is the real shape a decode pipeline has at
  * scale: payloads stay off the driver, metadata flows as columns, the
  * decode stage is a narrow map over binary blobs.
  */
object Multimodal {

  /** Typed record: an opaque payload + its metadata. */
  case class MediaRecord(media_id: Long, kind: String, payload: Array[Byte])
  case class DecodedMeta(media_id: Long, kind: String, byte_len: Long,
      digest: String, width: Int, height: Int, n_frames: Int)

  val mediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("kind", StringType, nullable = false),
    StructField("payload", BinaryType, nullable = false)))

  /** Columnar metadata extraction — pure Catalyst (no decode needed):
    * byte length + content digest. */
  def withByteMeta(df: DataFrame, payloadCol: String): DataFrame =
    df.withColumn("byte_len", length(col(payloadCol)).cast("long"))
      .withColumn("digest", sha2(col(payloadCol), 256))

  /** STUB DECODER — deterministic fake. A real pipeline would decode the
    * codec here (JPEG/PNG/WAV headers); this derives plausible dimensions
    * from the payload so the distributed plumbing is testable end-to-end. */
  private[functions] def stubDecode(payload: Array[Byte]): (Int, Int, Int) = {
    val len = payload.length
    val w = 64 + (len % 577)          // fake width
    val h = 64 + ((len / 7) % 431)    // fake height
    val frames = 1 + (len % 24)       // fake frame count
    (w, h, frames)
  }

  /** Decode + feature-extract as a per-partition batch over binary payloads
    * (the `mapInPandas` shape: one JVM-side batch loop per partition, payload
    * bytes never leave the executor). */
  def decode(ds: Dataset[MediaRecord]): Dataset[DecodedMeta] = {
    implicit val enc: Encoder[DecodedMeta] = Encoders.product[DecodedMeta]
    ds.mapPartitions { it =>
      val md = java.security.MessageDigest.getInstance("SHA-256")
      it.map { r =>
        val (w, h, f) = stubDecode(r.payload)
        md.reset()
        val digest = md.digest(r.payload).map("%02x".format(_)).mkString
        DecodedMeta(r.media_id, r.kind, r.payload.length.toLong, digest, w, h, f)
      }
    }
  }

  /** Frame sampling stub: every `stride`-th frame index of a decoded video —
    * the real implementation would slice the payload; the partitioning and
    * explode shape are the true article. */
  def sampleFrames(meta: Dataset[DecodedMeta], stride: Int): DataFrame =
    meta.toDF().select(col("media_id"),
      explode(sequence(lit(0), col("n_frames") - 1, lit(stride))).as("frame_idx"))

  /** Resize stub: metadata-only transform (a real kernel maps payload →
    * payload; dimensions scale exactly like this). */
  def resizeMeta(meta: Dataset[DecodedMeta], maxSide: Int): DataFrame = {
    val scale = least(lit(1.0),
      lit(maxSide).cast("double") / greatest(col("width"), col("height")))
    meta.toDF().select(col("media_id"),
      (col("width") * scale).cast("int").as("out_width"),
      (col("height") * scale).cast("int").as("out_height"))
  }
}
