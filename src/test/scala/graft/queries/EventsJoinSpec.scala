package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** q23 (as-of) and q24 (range) joins checked against their naive
  * formulations at sf0.001 — the naive inequality joins are fine at
  * test scale and define the semantics; the operators implement the
  * same semantics with the scale-correct plan shape.
  */
class EventsJoinSpec extends SparkSpec {

  test("q23 as-of join matches the naive argmax-per-error formulation") {
    import spark.implicits._
    val ev = graft.Tables.events(spark, sfDir)
    val clicks = ev.where($"event_type" === "click")
      .groupBy($"user_id", $"ts").agg(max($"event_id").as("click_id"))
      .select($"user_id".as("c_user"), $"ts".as("c_ts"), $"click_id")
    val errors = ev.where($"event_type" === "error")
      .select($"user_id", $"event_id".as("error_id"), $"ts".as("e_ts"))
    val w = Window.partitionBy($"error_id").orderBy($"c_ts".desc)
    val naive = errors.join(clicks,
        $"user_id" === $"c_user" && $"c_ts" <= $"e_ts")
      .withColumn("rn", row_number().over(w))
      .where($"rn" === 1)
      .select($"user_id", $"error_id", $"click_id",
        (unix_micros($"e_ts") - unix_micros($"c_ts")).as("gap_us"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .sortBy(identity).toSeq
    val fast = Events.q23AsofJoin(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .sortBy(identity).toSeq
    assert(fast.nonEmpty)
    assert(fast == naive)
  }

  test("q26 native session_window agrees with q17's lag-based sessions") {
    import spark.implicits._
    // no exact-30-min gap exists in the testdata, so the two boundary
    // rules (>= vs >) coincide and the session sets must match exactly
    val native = Events.q26SessionWindow(spark, sfDir)
      .select("user_id", "session_start", "n_events").collect()
      .map(r => (r.getLong(0), r.getTimestamp(1).getTime, r.getLong(2)))
      .sortBy(identity).toSeq
    val lagged = Events.q17Sessionize(spark, sfDir)
      .select("user_id", "session_start", "n_events").collect()
      .map(r => (r.getLong(0), r.getTimestamp(1).getTime, r.getLong(2)))
      .sortBy(identity).toSeq
    assert(native.nonEmpty)
    assert(native == lagged)
  }

  test("q24 binned range join matches the naive inequality join") {
    import spark.implicits._
    val ev = graft.Tables.events(spark, sfDir)
    val binUs = 5L * 60 * 1000 * 1000
    val clicks = ev.where($"event_type" === "click")
      .select($"user_id".as("c_user"), unix_micros($"ts").as("c_us"))
    val errors = ev.where($"event_type" === "error")
      .select($"user_id", $"event_id".as("error_id"), unix_micros($"ts").as("e_us"))
    val naive = errors.join(clicks,
        $"user_id" === $"c_user" && $"c_us" >= $"e_us" - binUs && $"c_us" < $"e_us")
      .groupBy($"user_id")
      .agg(count(lit(1)).as("n_pairs"), countDistinct($"error_id").as("n_errors"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .sortBy(identity).toSeq
    val fast = Events.q24RangeJoin(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .sortBy(identity).toSeq
    assert(fast.nonEmpty)
    assert(fast == naive)
  }
}
