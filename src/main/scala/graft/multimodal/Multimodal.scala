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
  * The actual byte decode is a STUB (no image/audio libs in this
  * container): `stubDecode` derives deterministic pseudo-features from
  * the payload bytes. The Spark-side contract — schema, binary payload
  * batching, partition-local decode, output shape — is real and tested.
  */
object Multimodal {

  /** Typed row for the decode stage: id + raw payload + metadata. */
  case class MediaRow(doc_id: Long, payload: Array[Byte], mime: String, n_bytes: Long)

  case class MediaFeatures(doc_id: Long, mime: String, n_bytes: Long,
      checksum: Long, feat: Array[Double])

  /** STUB decoder — stands in for e.g. JPEG decode + embedding.
    * Deterministic function of the payload so tests can oracle it.
    * Replace the body with a real codec call in production; the
    * signature (bytes → fixed-width features) is the contract.
    */
  def stubDecode(payload: Array[Byte]): (Long, Array[Double]) = {
    var checksum = 1125899906842597L
    var i = 0
    while (i < payload.length) { checksum = checksum * 31 + payload(i); i += 1 }
    val feat = new Array[Double](8)
    i = 0
    while (i < payload.length) { feat(i % 8) += (payload(i) & 0xff) / 255.0; i += 1 }
    (checksum, feat)
  }

  /** The `documents` table re-shaped as a media table: text bytes stand
    * in for an encoded image; metadata struct alongside.
    */
  def mediaTable(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir).select(
      col("doc_id"),
      col("text").cast("binary").as("payload"),
      concat(lit("application/x-graft-"), col("lang")).as("mime"),
      length(col("text")).cast("long").as("n_bytes"))

  /** m01: end-to-end multimodal pipeline — binary column in, partition-
    * local batched decode, feature columns out.
    */
  def m01Multimodal(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val media = mediaTable(spark, dir).as[MediaRow]
    media.mapPartitions { rows =>
      // per-partition init would go here (codec handles, model weights)
      rows.map { r =>
        val (checksum, feat) = stubDecode(r.payload)
        MediaFeatures(r.doc_id, r.mime, r.n_bytes, checksum, feat)
      }
    }.toDF()
  }
}
