package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.Tables

/** Event-stream analytics over the `events` table (batch forms; the
  * streaming equivalents live in graft.streaming).
  *
  * Sessionization uses integer microsecond arithmetic (`unix_micros`)
  * rather than interval/epoch comparisons so the gap predicate is exact
  * and engine-independent.
  */
object Events {

  /** q16: tumbling 1-hour bucket aggregation. */
  def q16EventsBucket(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.events(spark, dir)
      .groupBy(date_trunc("hour", $"ts").as("bucket"), $"event_type")
      .agg(count(lit(1)).as("n_events"), sum($"value").as("sum_value"))
  }

  /** q17: sessionization — 30-minute-gap sessions per user via
    * lag + cumulative-sum-of-boundaries. One shuffle (by user_id);
    * both windows share the same partitioning so Catalyst plans a
    * single exchange.
    */
  def q17Sessionize(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val byUser = Window.partitionBy($"user_id").orderBy($"ts", $"event_id")
    val gapUs  = 30L * 60 * 1000 * 1000
    Tables.events(spark, dir)
      .select($"user_id", $"event_id", $"ts", unix_micros($"ts").as("ts_us"))
      .withColumn("prev_us", lag($"ts_us", 1).over(byUser))
      .withColumn("boundary",
        when($"prev_us".isNull || $"ts_us" - $"prev_us" > gapUs, 1L).otherwise(0L))
      .withColumn("session_id",
        sum($"boundary").over(byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy($"user_id", $"session_id")
      .agg(count(lit(1)).as("n_events"),
        min($"ts").as("session_start"),
        max($"ts").as("session_end"))
  }

  /** q18: pivot event counts per user into one column per event type. */
  def q18EventsPivot(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val types = Seq("click", "error", "purchase", "signup", "view")
    val pivoted = Tables.events(spark, dir)
      .groupBy($"user_id")
      .pivot("event_type", types)
      .count()
    types.foldLeft(pivoted)((df, t) =>
      df.withColumn(t, coalesce(col(t), lit(0L))))
  }
}
