package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver-generated TPC-H-ish star schema (see TESTDATA.md).
  *
  * Plain parquet reads: Catalyst handles column pruning + predicate
  * pushdown, so every downstream query declares filters/projections
  * declaratively and lets the scan do the work.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  /** Plain scan. (Measured: the testdata ships one row group per
    * table, so scans are single-task locally; a compensating
    * `repartition` after load was tried and REGRESSED the bench ~40% —
    * exchange + task overhead outweighs the extra scan parallelism at
    * these sizes. Production inputs have many splits and parallelize
    * the scan naturally.)
    */
  def load(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def region(spark: SparkSession, dir: String): DataFrame     = load(spark, dir, "region")
  def nation(spark: SparkSession, dir: String): DataFrame     = load(spark, dir, "nation")
  def customer(spark: SparkSession, dir: String): DataFrame   = load(spark, dir, "customer")
  def supplier(spark: SparkSession, dir: String): DataFrame   = load(spark, dir, "supplier")
  def part(spark: SparkSession, dir: String): DataFrame       = load(spark, dir, "part")
  def orders(spark: SparkSession, dir: String): DataFrame     = load(spark, dir, "orders")
  def lineitem(spark: SparkSession, dir: String): DataFrame   = load(spark, dir, "lineitem")
  /** `events.ts` arrives in one of several physical layouts: TIMESTAMP
    * (NANOS) parquet (which Spark's vectorized reader only accepts as
    * long via nanosAsLong — the ScaleUp replicas use this), a naive µs
    * timestamp (reads as TIMESTAMP_NTZ — current driver testdata), or a
    * tz-aware µs timestamp. Normalize all three to TimestampType so
    * downstream `unix_micros`/watermark/`Row.getTimestamp` code sees one
    * type: nanos→µs is lossless (generator emits whole µs), and the
    * NTZ cast is deterministic because every session runs in UTC.
    */
  def events(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val df = load(spark, dir, "events")
    df.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        df.withColumn("ts", org.apache.spark.sql.functions.expr("timestamp_micros(ts div 1000)"))
      case org.apache.spark.sql.types.TimestampType => df
      case _ =>
        df.withColumn("ts",
          org.apache.spark.sql.functions.col("ts").cast(org.apache.spark.sql.types.TimestampType))
    }
  }
  def documents(spark: SparkSession, dir: String): DataFrame  = load(spark, dir, "documents")
  def embeddings(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "embeddings")
}
