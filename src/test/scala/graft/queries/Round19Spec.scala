package graft.queries

import graft.SparkSpec
import graft.graph.Graph

/** Round-14 pins: the convergence-gated damped-LPA round budget (the
  * r13 verdict's headline — g05b's sf1 residual), measured to be a
  * propagation-depth wave rather than an oscillation, and the
  * anti-freeze guard that killed the keep-current hysteresis
  * candidate fix.
  */
class Round19Spec extends SparkSpec {

  test("g05b must MERGE, not freeze: damped LPA finds real communities") {
    // the anti-freeze pin: a keep-current-on-tie hysteresis (the
    // obvious remedy for the sf1 residual) measurably deadlocks at the
    // singleton init — every round-1 neighbor vote is a single edge
    // weight <= the self-vote (the max incident edge), so every node
    // keeps its own label forever and the "communities" are 100%
    // singletons. Any future tie-break change must keep this red.
    val out = Graph.g05bLpaDamped(spark, sfDir).collect()
    val n = out.length
    val distinct = out.map(_.getLong(1)).distinct.length
    assert(n > 0)
    assert(distinct < n,
      s"damped LPA produced all-singleton communities ($distinct of $n) — frozen kernel")
  }

  test("g05b stops at a TRUE fixpoint and extra rounds are no-ops") {
    val (lbl, sig) = Graph.g05bLpaDampedTracked(spark, sfDir)
    val row = sig.collect().head
    assert(row.getLong(1) == 0L, "not a fixpoint certificate")
    val rounds = row.getInt(0)
    assert(rounds <= Graph.LpaMaxRounds)
    // idempotence at the fixpoint — the property that lets the oracle
    // unroll the full cap while Spark stops early: running MORE fixed
    // damped rounds from scratch lands on the same labels
    val (nodes, sym) = Graph.userHandoffLpaInputs(spark, sfDir)
    val more = Graph.lpaFromTracked(nodes, sym, rounds + 3, damped = true)._1
    val a = lbl.collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
    val b = more.collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
    assert(a == b, "post-fixpoint rounds moved labels — kernel not idempotent")
  }

  test("gated rounds adapt to the label diameter on a replica-chain graph") {
    // ScaleUp x8 of sf0.001: the replica corpus's twin chains (8
    // key-shifted copies of each user, tied by strong handoff edges)
    // relabel toward the chain minimum one hop per round — the r13
    // sf1 residual reproduced in miniature. The historical fixed
    // 5-round budget CANNOT be at fixpoint here; the gated kernel
    // must run past it and certify changed_last_round == 0.
    val out = java.nio.file.Files.createTempDirectory("graft_r19_lpa_").toString
    graft.ScaleUp.run(spark, sfDir, out, 8)
    val (nodes, sym) = Graph.userHandoffLpaInputs(spark, out)
    val (lbl, sig) = Graph.lpaConvergedTracked(nodes, sym)
    val row = sig.collect().head
    val rounds = row.getInt(0)
    assert(row.getLong(1) == 0L,
      s"gated kernel not at fixpoint after $rounds rounds on the replica graph")
    assert(rounds > Graph.LpaRounds,
      s"replica graph converged within the historical budget ($rounds rounds) — " +
        "the depth-wave motif is gone and this pin needs a deeper chain")
    // and it merged: twin chains collapse toward one community per chain
    val labels = lbl.collect()
    val distinct = labels.map(_.getLong(1)).distinct.length
    assert(distinct < labels.length / 2,
      s"replica graph did not merge: $distinct communities over ${labels.length} nodes")
  }

  test("quant-gated power iteration certifies fixpoints in the census") {
    // r13 VERDICT #5: the fixed 10-round budget left residuals at
    // both ends (sf0.001: 5 pagerank + 14 ppr keys; sf1: 1172 + 91).
    // The gated kernels must now run PAST the historical budget here
    // and certify changed_last_round == 0 at the output quantization.
    val census = graft.graph.Graph.convergenceCensus(spark, sfDir).collect()
      .map(r => r.getString(0) -> ((r.getInt(1), r.getLong(2)))).toMap
    assert(census("pagerank")._2 == 0L, s"pagerank residual: $census")
    assert(census("ppr")._2 == 0L, s"ppr residual: $census")
    assert(census("pagerank")._1 > graft.graph.Graph.PrIters,
      "the sf0.001 graph converged within the fixed budget — the gate " +
        "did not extend and this pin needs a deeper graph")
    assert(census("pagerank")._1 <= graft.graph.Graph.PrMaxIters)
    assert(census("ppr")._1 <= graft.graph.Graph.PprMaxIters)
  }

  test("clustered recall tier: e31 serves what the flat walk cannot reach") {
    // r13 VERDICT #4: every prior recall number rode orthogonal-noise
    // (+ exact-twin) embeddings — no cosine gradient, the measured
    // worst case. The clustered generator plants the regime real
    // corpora live in (within-cluster cos ≈ 0.85, cross ≈ 0), where
    // the NN-descent graph is near-perfect but DISCONNECTED per
    // cluster: e25's global hash entries strand the walk (recall
    // 0.000 measured at n=2000 and n=20000) and e29's 4-entry descent
    // fades as clusters outgrow the entry budget (0.60 -> 0.085).
    // e31's IVF-elected entries land inside the right clique; the
    // walk refines. Floors sit below the measured band (e31 1.00,
    // e30 1.00, e29 0.60 at n=2000).
    import graft.sim.Sim
    val out = java.nio.file.Files.createTempDirectory("graft_r19_clu_").toString
    graft.sim.ClusteredEmbeddings.run(spark, out, 2000L,
      graft.sim.ClusteredEmbeddings.DefaultCentroids)
    val exact = Sim.e01KnnCosine(spark, out)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    def recall(df: org.apache.spark.sql.DataFrame): Double = {
      val got = df.collect().map(r => (r.getLong(0), r.getLong(1)))
        .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
      exact.map { case (q, ex) => (ex intersect got.getOrElse(q, Set.empty)).size }.sum
        .toDouble / exact.values.map(_.size).sum
    }
    val r25 = recall(Sim.e25GraphServe(spark, out))
    val r29 = recall(Sim.e29HnswServe(spark, out))
    val r31 = recall(Sim.e31IvfSeededServe(spark, out))
    val r30 = recall(Sim.e30DedupServe(spark, out))
    info(f"clustered n=2000 recall@10: e25=$r25%.3f e29=$r29%.3f e30=$r30%.3f e31=$r31%.3f")
    assert(r31 >= 0.90, f"e31 under the clustered floor: $r31%.3f")
    assert(r30 >= 0.90, f"e30 under the clustered (dup-free) floor: $r30%.3f")
    assert(r29 >= 0.45, f"e29 under the clustered floor: $r29%.3f")
    assert(r31 > r25 + 0.5,
      f"e31 no longer beats the flat walk on clustered data ($r25%.3f -> $r31%.3f) — " +
        "either e25 grew cluster-aware entries (update this pin) or e31 broke")
  }

  test("g05b oracle unrolls the full cap with a materialized frontier") {
    val sql = graft.SparkEntry.oracleSql("g05b_lpa_damped")
    assert(sql.contains(s"l${Graph.LpaMaxRounds} AS MATERIALIZED"))
    assert(sql.contains(s"FROM l${Graph.LpaMaxRounds}"))
    // the frontier is materialized: a plain CTE re-expands 3^rounds
    // ways under DuckDB 1.0 inlining (measured: fd exhaustion)
    assert(sql.contains("l0 AS MATERIALIZED"))
  }
}
