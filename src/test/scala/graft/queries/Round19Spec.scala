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

  test("g05b oracle unrolls the full cap with a materialized frontier") {
    val sql = graft.SparkEntry.oracleSql("g05b_lpa_damped")
    assert(sql.contains(s"l${Graph.LpaMaxRounds} AS MATERIALIZED"))
    assert(sql.contains(s"FROM l${Graph.LpaMaxRounds}"))
    // the frontier is materialized: a plain CTE re-expands 3^rounds
    // ways under DuckDB 1.0 inlining (measured: fd exhaustion)
    assert(sql.contains("l0 AS MATERIALIZED"))
  }
}
