package graft.text

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables

/** Training-shard packing (SURVEY.md §2c, d21).
  *
  * A training pipeline's last step before the data loader: lay the
  * curated corpus out as contiguous shards of ~`budget` tokens each, in
  * a deterministic document order, so every epoch reads the same bytes
  * in the same sequence. The assignment is a prefix sum: a document
  * starts at the cumulative token count of everything before it, and
  * its shard is `start_token div budget` (a document straddling a
  * boundary belongs to the shard where it starts).
  *
  * The naive formulation — one cumulative window over the global
  * document order — plans a SINGLE-partition sort at any scale: a
  * 100 TB corpus funnels through one task. This is the classic
  * two-level distributed prefix sum instead:
  *
  *   1. bucket documents by `doc_id div W` (W = `bucketWidth` conf) —
  *      deterministic, layout-invariant, contiguous in the order key;
  *   2. one map-side-combined aggregate → per-bucket token totals
  *      (range/W rows — tiny by construction when W is sized so bucket
  *      count is O(10⁴–10⁵));
  *   3. an exclusive cumulative window over THAT tiny frame gives each
  *      bucket its global starting offset (the only unpartitioned sort
  *      in the plan runs on bucket-count rows, never on documents);
  *   4. broadcast the offsets back and add a per-bucket exclusive
  *      cumulative window (partitioned by bucket — full parallelism).
  *
  * Every document's `start_token` is exact and global, with no global
  * sort of the corpus anywhere. Tokens are d02's whitespace tokens, so
  * the count is pinned by an already-green oracle.
  */
object Pack {

  /** Tokens per shard; the default is sized for the verification corpus
    * (500 docs × ~50 tokens → ~13 shards). Production: ~10⁸ (a few
    * hundred MB of text per shard file).
    */
  private def budget(spark: SparkSession): Long =
    spark.conf.getOption("spark.graft.pack.budget").map(_.toLong).getOrElse(2000L)

  /** Prefix-sum bucket width in doc_ids. Size so (id range / W) is
    * O(10⁴–10⁵) buckets: the bucket-offset window then runs over at
    * most ~10⁵ rows regardless of corpus size.
    */
  private def bucketWidth(spark: SparkSession): Long =
    spark.conf.getOption("spark.graft.pack.bucketWidth").map(_.toLong).getOrElse(64L)

  def d21PackShards(spark: SparkSession, dir: String): DataFrame =
    packShards(
      Tables.documents(spark, dir).select(
        col("doc_id"),
        size(Text.wsTokens(col("text"))).cast("long").as("n_tokens")),
      budget(spark), bucketWidth(spark))

  /** The packing kernel over any (doc_id, n_tokens) frame. */
  private[graft] def packShards(docs: DataFrame, budget: Long, width: Long): DataFrame = {
    val withBucket = docs.withColumn("bucket", expr(s"doc_id div $width"))
    // exclusive prefix over the tiny per-bucket totals (the ONLY
    // global-ordered window, and it runs on range/W rows)
    val offsetW = Window.orderBy("bucket").rowsBetween(Window.unboundedPreceding, -1)
    val offsets = withBucket.groupBy("bucket")
      .agg(sum("n_tokens").as("bucket_tokens"))
      .select(col("bucket"),
        coalesce(sum("bucket_tokens").over(offsetW), lit(0L)).as("bucket_offset"))
    // exclusive prefix within each bucket — partitioned, fully parallel
    val localW = Window.partitionBy("bucket").orderBy("doc_id")
      .rowsBetween(Window.unboundedPreceding, -1)
    withBucket.join(broadcast(offsets), Seq("bucket"))
      .withColumn("start_token",
        col("bucket_offset") + coalesce(sum("n_tokens").over(localW), lit(0L)))
      .select(col("doc_id"), col("n_tokens"), col("start_token"),
        expr(s"start_token div $budget").as("shard_id"))
  }
}
