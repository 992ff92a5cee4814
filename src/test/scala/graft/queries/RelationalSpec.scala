package graft.queries

import org.apache.spark.sql.functions._

import graft.{SparkSpec, Tables}

/** Relational-pack specs beyond the DuckDB oracles. */
class RelationalSpec extends SparkSpec {

  test("approx_count_distinct tracks the exact distinct counts (q09 approx leg)") {
    import spark.implicits._
    val both = Tables.lineitem(spark, sfDir)
      .groupBy($"l_returnflag")
      .agg(
        countDistinct($"l_partkey").as("exact_parts"),
        approx_count_distinct($"l_partkey", 0.02).as("approx_parts"),
        countDistinct($"l_suppkey").as("exact_supps"),
        approx_count_distinct($"l_suppkey", 0.02).as("approx_supps"))
      .collect()
    assert(both.nonEmpty)
    both.foreach { r =>
      val (ep, ap) = (r.getLong(1), r.getLong(2))
      val (es, as_) = (r.getLong(3), r.getLong(4))
      assert(math.abs(ap - ep).toDouble / ep < 0.05, s"parts approx $ap vs exact $ep")
      assert(math.abs(as_ - es).toDouble / es < 0.05, s"supps approx $as_ vs exact $es")
    }
  }

  test("q03 top-N is stable: deterministic tiebreak ordering") {
    val a = Relational.q03RevenueTopN(spark, sfDir).collect().map(_.toString).toSeq
    val b = Relational.q03RevenueTopN(spark, sfDir).collect().map(_.toString).toSeq
    assert(a == b)
    assert(a.size <= 10)
  }

  test("q25b approx percentiles track exact q25 within the declared rank-error envelope") {
    import spark.implicits._
    val exact = Relational.q25Percentiles(spark, sfDir).collect()
      .map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2))).toMap
    // full-retention accuracy: the sketch IS the exact discrete
    // percentile — within one inter-element gap of the interpolated
    // exact value, and here simply very close in relative terms
    Relational.q25bApproxPercentiles(spark, sfDir).collect().foreach { r =>
      val (p50e, p90e) = exact(r.getString(0))
      assert(math.abs(r.getDouble(1) - p50e) / p50e < 0.01, s"p50 ${r.getDouble(1)} vs $p50e")
      assert(math.abs(r.getDouble(2) - p90e) / p90e < 0.01, s"p90 ${r.getDouble(2)} vs $p90e")
    }
    // coarse accuracy=100 exercises REAL approximation: GK guarantees
    // rank error ≤ n/100, so each approx percentile must land inside
    // the exact [p−2%, p+2%] quantile envelope
    val envelope = graft.Tables.lineitem(spark, sfDir)
      .groupBy($"l_returnflag")
      .agg(
        expr("percentile(l_extendedprice, 0.48D)").as("p50_lo"),
        expr("percentile(l_extendedprice, 0.52D)").as("p50_hi"),
        expr("percentile(l_extendedprice, 0.88D)").as("p90_lo"),
        expr("percentile(l_extendedprice, 0.92D)").as("p90_hi"))
      .collect()
      .map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2), r.getDouble(3), r.getDouble(4)))
      .toMap
    Relational.q25bWithAccuracy(spark, sfDir, 100).collect().foreach { r =>
      val (lo50, hi50, lo90, hi90) = envelope(r.getString(0))
      val (a50, a90) = (r.getDouble(1), r.getDouble(2))
      assert(a50 >= lo50 && a50 <= hi50, s"p50 $a50 outside [$lo50,$hi50]")
      assert(a90 >= lo90 && a90 <= hi90, s"p90 $a90 outside [$lo90,$hi90]")
    }
  }
}
