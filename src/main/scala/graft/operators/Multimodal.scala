package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing: image/audio/video as opaque `binary`
  * columns with typed metadata, and batched decode / feature-extract
  * / resize / frame-sample stages.
  *
  * The decode itself is STUBBED (this container carries no
  * image/audio codecs): [[StubCodec]] produces deterministic fake
  * metadata/features from the bytes. Everything around it — the
  * schema contract, the per-partition batched iterator shape (the
  * Scala analogue of a vectorized UDF), partitioning, and null
  * handling — is the real production plumbing and is tested.
  */
object Multimodal {

  /** Canonical decoded-media schema. */
  case class MediaMeta(n_bytes: Long, mime: String, width: Int, height: Int,
      channels: Int)
  case class Decoded(id: Long, meta: MediaMeta, features: Array[Float])

  /** Attach a binary payload column (here: the UTF-8 text bytes, as a
    * stand-in for image/audio payloads) plus byte-level metadata.
    */
  def attachBinary(df: DataFrame, id: Column, payload: Column,
      mime: String = "application/octet-stream"): DataFrame =
    df.select(id.as("id"), encode(payload, "UTF-8").as("bytes"))
      .withColumn("n_bytes", length(col("bytes")).cast(LongType))
      .withColumn("mime", lit(mime))

  /** The deterministic fake decoder: dimensions and features derived
    * from an md5 of the payload. Replace with a real codec binding in
    * production; the call shape (bytes → meta + feature vector) is
    * the contract.
    */
  object StubCodec {
    def decode(id: Long, bytes: Array[Byte], mime: String): Decoded =
      decode(id, bytes, mime, java.security.MessageDigest.getInstance("MD5"))

    /** Reusable-digest variant for the batched per-partition path. */
    def decode(id: Long, bytes: Array[Byte], mime: String,
        digest: java.security.MessageDigest): Decoded = {
      digest.reset()
      val md = digest.digest(bytes)
      def u16(i: Int): Int = ((md(i) & 0xff) << 8) | (md(i + 1) & 0xff)
      val meta = MediaMeta(bytes.length, mime,
        width = 64 + u16(0) % 1024, height = 64 + u16(2) % 1024, channels = 3)
      val features = Array.tabulate(4)(j => u16(4 + 2 * j).toFloat / 65535f)
      Decoded(id, meta, features)
    }
  }

  /** Batched decode over partitions — the mapInPandas/mapPartitions
    * shape: one iterator in, one iterator out, no per-row task
    * overhead, executor-local codec state initialized once per
    * partition (here: the MessageDigest).
    */
  def decodeBatch(df: DataFrame): Dataset[Decoded] = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col("id").cast(LongType), col("bytes"), col("mime"))
      .as[(Long, Array[Byte], String)]
      .mapPartitions { it =>
        // per-partition init (codec contexts, model handles): one
        // digest instance reused across the partition's rows
        val digest = java.security.MessageDigest.getInstance("MD5")
        it.map { case (id, bytes, mime) => StubCodec.decode(id, bytes, mime, digest) }
      }
  }

  /** Expression-level twin of the stub decode (pure Catalyst, used by
    * the SQL oracle): same md5-derived dimensions.
    */
  def stubWidth(payload: Column): Column =
    lit(64) + (conv(substring(md5(payload), 1, 4), 16, 10).cast(LongType) % 1024)
  def stubHeight(payload: Column): Column =
    lit(64) + (conv(substring(md5(payload), 5, 4), 16, 10).cast(LongType) % 1024)

  /** "Resize": rescale stub dimensions preserving aspect —
    * deterministic integer math on metadata (a real impl would
    * transform pixels; the metadata contract is identical).
    */
  def resizeMeta(width: Column, height: Column, targetWidth: Int): Column =
    struct(lit(targetWidth).as("width"),
      (height * targetWidth / width).cast(IntegerType).as("height"))

  /** Frame-sample offsets for a "video" of `nFrames` frames: k evenly
    * spaced indices — the plan-side shape of frame extraction.
    */
  def frameSampleOffsets(nFrames: Column, k: Int): Column =
    F2.transform(sequence(lit(0), lit(k - 1)),
      i => (i * nFrames / k).cast(IntegerType))

  private object F2 {
    def transform(c: Column, f: Column => Column): Column =
      org.apache.spark.sql.functions.transform(c, f)
  }
}
