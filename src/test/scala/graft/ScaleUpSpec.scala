package graft

import org.apache.spark.sql.functions._

/** The sfN replica generator must preserve the invariants the scaling
  * bench depends on: exact row multiples, key-domain-consistent shifts
  * (referential integrity survives), and replica text that is
  * exact-hash-distinct.
  */
class ScaleUpSpec extends SparkSpec {

  private val outDir = "/tmp/graft_scaleup_spec"

  test("factor-2 replica: row multiples, disjoint keys, intact joins, distinct text") {
    ScaleUp.run(spark, sfDir, outDir, 2)
    def src(n: String) = spark.read.parquet(s"$sfDir/$n.parquet")
    def out(n: String) = spark.read.parquet(s"$outDir/$n.parquet")

    // dims copied, facts exactly doubled
    assert(out("region").count() == src("region").count())
    assert(out("nation").count() == src("nation").count())
    for (f <- Seq("customer", "orders", "lineitem", "documents", "embeddings"))
      assert(out(f).count() == 2 * src(f).count(), f)

    // key shift keeps key sets disjoint between replicas
    assert(out("customer").select("c_custkey").distinct().count()
      == 2 * src("customer").select("c_custkey").distinct().count())

    // the custkey domain shifts CONSISTENTLY in customer and orders:
    // no order may dangle
    val dangling = out("orders").join(out("customer"),
      col("o_custkey") === col("c_custkey"), "left_anti").count()
    assert(dangling == 0, s"$dangling orders reference a missing customer")

    // replica documents are exact-hash-distinct (the near-dup corpus
    // shape, not an exact-dup explosion)
    assert(out("documents").select("text").distinct().count()
      == 2 * src("documents").select("text").distinct().count())

    // events stream-readable through the same loader path as testdata
    assert(Tables.events(spark, outDir).select(max(col("ts"))).head().get(0)
      == Tables.events(spark, sfDir).select(max(col("ts"))).head().get(0))
  }
}
