package graft.queries

import graft.SparkSpec
import graft.dedup.Dedup
import graft.Tables

/** Round-5 pins: eager cache release in the dedup/ANN family and the
  * fused-kernel A/B toggle.
  */
class Round5Spec extends SparkSpec {

  test("d06/d07/d08/d11/e03/e05 leave no cacheManager entry behind") {
    val cm = spark.sharedState.cacheManager
    spark.catalog.clearCache()
    assert(cm.isEmpty)
    // each operator persists an intermediate (signature table, per-chunk
    // frame, bucketed corpus); the contract is that the operator itself
    // releases it — localCheckpoint the survivor set, unpersist — so a
    // long-lived session embedding these never accumulates cache entries
    val ops: Seq[(String, () => Long)] = Seq(
      "d06" -> (() => Dedup.d06MinHashLsh(spark, sfDir).count()),
      "d07" -> (() => Dedup.d07SimHash(spark, sfDir).count()),
      "d08" -> (() => Dedup.d08NgramJaccard(spark, sfDir).count()),
      "d11" -> (() => Dedup.d11DupClusters(spark, sfDir).count()),
      "e03" -> (() => graft.sim.Sim.e03EmbedDedup(spark, sfDir).count()),
      "e05" -> (() => graft.sim.Sim.e05KnnJoin(spark, sfDir).count()))
    for ((name, run) <- ops) {
      run()
      assert(cm.isEmpty, s"$name left a persisted plan in the cacheManager")
    }
  }

  test("spark.graft.fusedKernels=false routes signatures to the two-step native path") {
    val sh = Dedup.shingled(Dedup.nearDupCorpus(Tables.documents(spark, sfDir)))
    spark.conf.set("spark.graft.fusedKernels", "false")
    try {
      val plan = Dedup.withSignature(sh).queryExecution.analyzed.toString
      assert(!plan.contains("graft_minhash_str"), "fused kernel used despite toggle off")
      assert(plan.contains("graft_minhash"), "two-step native path not used")
      val sim = sh.select(Dedup.simhash(sh, "toks")).queryExecution.analyzed.toString
      assert(!sim.contains("graft_simhash_str"), "fused simhash used despite toggle off")
    } finally spark.conf.unset("spark.graft.fusedKernels")
    // default (unset) prefers the fused kernels
    val plan2 = Dedup.withSignature(sh).queryExecution.analyzed.toString
    assert(plan2.contains("graft_minhash_str"))
  }

  test("fused and two-step signature paths are bit-identical end-to-end (d06)") {
    val fused = Dedup.d06MinHashLsh(spark, sfDir).collect().map(_.toString).sorted
    spark.conf.set("spark.graft.fusedKernels", "false")
    try {
      val twoStep = Dedup.d06MinHashLsh(spark, sfDir).collect().map(_.toString).sorted
      assert(fused.sameElements(twoStep))
    } finally spark.conf.unset("spark.graft.fusedKernels")
  }
}
