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
}
