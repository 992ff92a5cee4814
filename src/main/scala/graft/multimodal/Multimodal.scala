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
    * local batched decode, feature columns out. The feature vector is
    * flattened to scalar `feat_0..feat_7` columns so the result is
    * hashable/orderable by any downstream comparer (an array column is
    * not), and DuckDB-oracle-checkable.
    */
  def m01Multimodal(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val media = mediaTable(spark, dir).as[MediaRow]
    val decoded = media.mapPartitions { rows =>
      // per-partition init would go here (codec handles, model weights)
      rows.map { r =>
        val (checksum, feat) = stubDecode(r.payload)
        MediaFeatures(r.doc_id, r.mime, r.n_bytes, checksum, feat)
      }
    }.toDF()
    decoded.select(
      col("doc_id") +: col("mime") +: col("n_bytes") +: col("checksum") +:
        (0 until 8).map(i => col("feat").getItem(i).as(s"feat_$i")): _*)
  }
}
