package graft.queries

import org.apache.spark.sql.execution.FormattedMode

import graft.SparkSpec

/** Physical-plan regression guards: the properties that make these
  * plans scale must stay visible in explain output.
  */
class PlanSpec extends SparkSpec {

  private def explain(df: org.apache.spark.sql.DataFrame): String =
    df.queryExecution.explainString(FormattedMode)

  test("q02: filters and projection reach the parquet scan") {
    val plan = explain(Relational.q02FilterPushdown(spark, sfDir))
    assert(plan.contains("PushedFilters: [IsNotNull(l_shipdate)"), plan)
    assert(plan.contains("GreaterThanOrEqual(l_shipdate"), plan)
    // pruned read schema: only the referenced columns
    val schemaLine = plan.linesIterator.find(_.contains("ReadSchema")).get
    assert(!schemaLine.contains("l_tax"), schemaLine)
  }

  test("q05: guaranteed-small dims are broadcast, fact join is not hinted") {
    val plan = explain(Relational.q05LocalSupplier(spark, sfDir))
    assert(plan.contains("BroadcastExchange"), plan)
    // the region filter must also push down
    assert(plan.contains("EqualTo(r_name,ASIA)"), plan)
  }

  test("q01: aggregation is partial (map-side) before the exchange") {
    val plan = explain(Relational.q01PricingSummary(spark, sfDir))
    val firstAgg = plan.indexOf("HashAggregate")
    val exchange = plan.indexOf("Exchange")
    assert(firstAgg >= 0 && exchange >= 0)
  }
}
