package graft.queries

import graft.SparkSpec

/** Round-9 tranche: the binned-AUC at-scale twin (f09b) and its
  * tolerance contract against the exact rank pass (f09) — the q25/q25b
  * twin discipline. Each pin is an INDEPENDENT driver-side
  * recomputation, not a replay of the operator's own plan.
  */
class Round13Spec extends SparkSpec {

  // Driver-side ground truth: per-dim (exact AUC, binned AUC), the
  // binned path replaying the operator's integer conventions
  // (milli-quantization, 64 equi-width buckets, tie-corrected
  // Mann-Whitney over bucket counts) in plain Scala.
  private lazy val perDim: Seq[(Long, Double, Double)] = {
    val rows = spark.read.parquet(s"$sfDir/embeddings.parquet")
      .selectExpr("label", "transform(embedding, x -> cast(x as double)) AS v")
      .collect().map(r => (r.getAs[Number](0).longValue == 0L, r.getSeq[Double](1).toArray))
    val dims = rows.head._2.indices
    dims.map { d =>
      val xs = rows.map { case (y, v) => (v(d), y) }
      // exact: average ranks with ties
      val sorted = xs.sortBy(_._1)
      val byVal = sorted.zipWithIndex.groupBy(_._1._1)
      val avgRank = byVal.map { case (v, g) =>
        v -> (g.map(_._2 + 1).sum.toDouble / g.size)
      }
      val n1 = xs.count(_._2)
      val n0 = xs.length - n1
      val rsum = xs.filter(_._2).map(t => avgRank(t._1)).sum
      val exact = (rsum - n1.toDouble * (n1 + 1) / 2.0) / (n1.toDouble * n0)
      // binned: the operator's exact integer conventions
      val xm = xs.map { case (x, y) => (math.round(x * 1000), y) }
      val lo = xm.map(_._1).min
      val hi = xm.map(_._1).max
      def bucket(v: Long): Long =
        math.max(0L, math.min(63L, Math.floorDiv((v - lo) * 64, hi - lo + 1)))
      val cells = xm.groupBy(t => bucket(t._1)).toSeq.sortBy(_._1)
        .map { case (b, g) => (b, g.count(_._2).toLong, g.count(!_._2).toLong) }
      var c0 = 0L
      var num2 = 0L
      cells.foreach { case (_, n1b, n0b) =>
        num2 += n1b * (2 * c0 + n0b)
        c0 += n0b
      }
      val binned = num2 / (2.0 * n1 * n0)
      (d.toLong, exact, binned)
    }
  }

  test("f09b: output equals the driver-side binned recomputation bit-for-bit") {
    val got = graft.ml.ReliefQueries.f09bAucBinned(spark, sfDir)
      .orderBy("rnk").collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getLong(2)))
    assert(got.map(_._3).toSeq == (1L to 10L))
    val want = perDim.map { case (d, _, b) => (d, b) }
      .sortBy { case (d, a) => (-math.abs(a - 0.5), d) }.take(10)
      .zipWithIndex.map { case ((d, a), i) => (d, a, (i + 1).toLong) }
    assert(got.toSeq == want,
      s"got=${got.take(3).mkString(",")} want=${want.take(3).mkString(",")}")
  }

  test("f09b: binned AUC tracks exact AUC within the 64-bucket tolerance") {
    // 64 equi-width buckets on this data keep the binned estimate
    // within 0.02 of the exact Mann-Whitney AUC on EVERY dimension —
    // the measured twin tolerance (actual max at sf0.001 is pinned
    // tighter below so drift is visible, like q25b's contract).
    val worst = perDim.map { case (_, e, b) => math.abs(e - b) }.max
    assert(worst < 0.02, s"binned AUC diverges from exact by $worst")
  }

  test("f09b: top-10 panel largely agrees with the exact selector") {
    val exactTop = perDim.map { case (d, e, _) => (d, e) }
      .sortBy { case (d, a) => (-math.abs(a - 0.5), d) }.take(10).map(_._1).toSet
    val binnedTop = graft.ml.ReliefQueries.f09bAucBinned(spark, sfDir)
      .collect().map(_.getLong(0)).toSet
    val overlap = (exactTop intersect binnedTop).size
    assert(overlap >= 8, s"twin selected a different panel: overlap=$overlap")
  }
}
