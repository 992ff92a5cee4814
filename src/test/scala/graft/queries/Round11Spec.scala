package graft.queries

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Round-8 final tranche: BPE merge mining (d42), temperature-scaled
  * sampling weights (d43), cluster-balanced panel sampling (e20), and
  * the zero-copy shallow clone (w24). Each operator is pinned against
  * an INDEPENDENT driver-side recomputation (not its own plan), plus
  * the structural invariants that must survive any scale.
  */
class Round11Spec extends SparkSpec {

  // ---------------------------------------------------------------- d42

  test("d42: top-20 BPE pairs equal a pure-Scala recomputation") {
    val got = graft.text.Text.d42BpePairs(spark, sfDir)
      .orderBy("rank").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))

    // independent recomputation: whitespace words, adjacent char pairs,
    // exact counts, (count desc, pair asc) rank
    val texts = spark.read.parquet(s"$sfDir/documents.parquet")
      .select("text").collect().map(_.getString(0))
    val counts = scala.collection.mutable.HashMap[String, Long]()
    for (t <- texts; w <- t.trim.split("\\s+") if w.length >= 2;
         i <- 0 until w.length - 1)
      counts(w.substring(i, i + 2)) = counts.getOrElse(w.substring(i, i + 2), 0L) + 1
    val want = counts.toSeq.sortBy { case (p, n) => (-n, p) }.take(20)
      .zipWithIndex.map { case ((p, n), i) => (p, n, (i + 1).toLong) }

    assert(got.toSeq == want,
      s"spark=${got.take(5).mkString(",")} scala=${want.take(5).mkString(",")}")
  }

  test("d42: rank is dense 1..20 and counts are non-increasing") {
    val rows = graft.text.Text.d42BpePairs(spark, sfDir)
      .orderBy("rank").collect()
    assert(rows.map(_.getLong(2)).toSeq == (1L to 20L))
    val ns = rows.map(_.getLong(1))
    assert(ns.zip(ns.tail).forall { case (a, b) => a >= b })
    assert(rows.forall(_.getString(0).length == 2))
  }

  // ---------------------------------------------------------------- d43

  test("d43: shares sum to 1, boost is monotone-decreasing in corpus share and crosses 1") {
    val rows = graft.text.Corpus.d43TemperatureMix(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2), r.getDouble(3), r.getDouble(4)))
    assert(rows.nonEmpty)
    assert(math.abs(rows.map(_._3).sum - 1.0) < 1e-9, "p_raw must sum to 1")
    assert(math.abs(rows.map(_._4).sum - 1.0) < 1e-9, "p_temp must sum to 1")
    // temperature flattening: smaller corpus share → strictly larger boost
    val byN = rows.sortBy(_._2)
    byN.map(_._5).zip(byN.tail.map(_._5)).zip(byN.zip(byN.tail)).foreach {
      case ((b1, b2), ((_, n1, _, _, _), (_, n2, _, _, _))) =>
        if (n1 < n2) assert(b1 > b2, s"boost must decrease with n: $n1->$b1 vs $n2->$b2")
    }
    // α < 1 up-samples the tail and down-samples the head
    assert(byN.head._5 > 1.0, "smallest lang must be boosted above parity")
    assert(byN.last._5 < 1.0, "largest lang must be damped below parity")
    // independent recomputation of the weights from raw counts
    val n = rows.map(_._2.toDouble)
    val total = n.sum
    val z = n.map(math.pow(_, 0.7)).sum
    rows.foreach { case (_, nd, pRaw, pTemp, boost) =>
      assert(math.abs(pRaw - nd / total) < 1e-12)
      assert(math.abs(pTemp - math.pow(nd.toDouble, 0.7) / z) < 1e-12)
      assert(math.abs(boost - pTemp / pRaw) < 1e-9)
    }
  }

  // ---------------------------------------------------------------- e20

  /** Driver-side reference: the same deterministic codebook (16 lowest
    * by mod-prime vec_id hash), nearest-centroid assignment on
    * −2·v·c + |c|² with ties on centroid id, then per cluster the
    * cap-lowest by the mod-prime permutation of vec_id.
    */
  private def e20Reference(): Set[(Long, Long, Long)] = {
    val P = 1000000007L
    val rows = spark.read.parquet(s"$sfDir/embeddings.parquet")
      .selectExpr("vec_id", "transform(embedding, x -> cast(x as double)) AS v")
      .collect()
      .map(r => (r.getLong(0), r.getSeq[Double](1).toArray))
    val cents = rows.sortBy { case (id, _) => (id % P * 616318177L % P, id) }
      .take(16).zipWithIndex.map { case ((_, v), i) => (i.toLong, v) }
    def d2(v: Array[Double], c: Array[Double]): Double =
      -2.0 * v.zip(c).map { case (a, b) => a * b }.sum +
        c.map(x => x * x).sum
    val assigned = rows.map { case (id, v) =>
      val cid = cents.map { case (ci, cv) => (d2(v, cv), ci) }.min._2
      (cid, id)
    }
    assigned.groupBy(_._1).toSeq.flatMap { case (cid, members) =>
      members.map(_._2).sortBy(id => (id % P * 888000131L % P, id))
        .take(graft.sim.Sim.SampleCap)
        .zipWithIndex.map { case (id, i) => (cid, id, (i + 1).toLong) }
    }.toSet
  }

  test("e20: salted two-phase panel equals the naive driver-side reference exactly") {
    val got = graft.sim.Sim.e20ClusterSample(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val want = e20Reference()
    assert(got == want,
      s"got ${got.size} rows, want ${want.size}; diff=${(got diff want).take(3)} / ${(want diff got).take(3)}")
  }

  test("e20: no cluster exceeds the cap and ranks are dense from 1") {
    val rows = graft.sim.Sim.e20ClusterSample(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(2)))
    rows.groupBy(_._1).foreach { case (cid, rs) =>
      val rks = rs.map(_._2).sorted.toSeq
      assert(rks.size <= graft.sim.Sim.SampleCap, s"cluster $cid over cap")
      assert(rks == (1L to rks.size.toLong), s"cluster $cid ranks not dense: $rks")
    }
  }

  // ---------------------------------------------------------------- e21

  test("e21: shard-and-merge equals the unsharded exact answer row for row") {
    val got = graft.sim.Sim.e21ShardedKnn(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val want = graft.sim.Sim.e01KnnCosine(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(got == want,
      s"sharded serving diverged: ${(got diff want).take(3)} / ${(want diff got).take(3)}")
    assert(got.nonEmpty)
  }

  // ---------------------------------------------------------------- e22

  test("e22: skew audit shares sum to 1, ratios average 1, flags agree with ratios") {
    val rows = graft.sim.Sim.e22IvfSkewAudit(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getDouble(3), r.getBoolean(4)))
    assert(rows.nonEmpty && rows.length <= 16)
    assert(math.abs(rows.map(_._3).sum - 1.0) < 1e-9)
    assert(math.abs(rows.map(_._4).sum / rows.length - 1.0) < 1e-9,
      "skew ratios must average exactly 1 over the populated lists")
    rows.foreach { case (cid, n, share, ratio, flag) =>
      assert(n > 0)
      assert(flag == (ratio > 2.0), s"flag inconsistent for list $cid")
    }
  }

  // ---------------------------------------------------------------- w24

  test("w24: clone is zero-copy at clone time and tables diverge independently") {
    import graft.sources.Sinks
    import org.apache.hadoop.fs.{Path => HPath}
    val docs = graft.Tables.documents(spark, sfDir)
    val nAll = docs.count()
    val root = s"/tmp/graft_w24_spec_${System.nanoTime()}"
    val src = s"$root/src"
    val dst = s"$root/dst"
    try {
      Sinks.publishSnapshot(spark, docs, src, 1)
      Sinks.commitManifest(spark, dst, 1, Sinks.manifestLines(spark, src))
      val fs = new HPath(dst).getFileSystem(spark.sessionState.newHadoopConf())
      // zero-copy: the clone owns NO data files — its read is served
      // entirely by source-owned files
      assert(!fs.exists(new HPath(s"$dst/data")),
        "clone must not copy any data bytes")
      assert(Sinks.readPublished(spark, sfDir, dst).count() == nAll)
      // diverge the clone; the source must not observe it
      Sinks.publishSnapshot(spark, docs.where(col("doc_id") % 3 === 0), dst, 2)
      val nFiltered = docs.where(col("doc_id") % 3 === 0).count()
      assert(Sinks.readPublished(spark, sfDir, dst).count() == nFiltered)
      assert(Sinks.readPublished(spark, sfDir, src).count() == nAll,
        "source table must be unaffected by clone commits")
      // and the clone's PAST is still served: time travel to the
      // clone's snapshot 1 reads the full corpus through shared files
      assert(Sinks.readPublished(spark, sfDir, dst, asOf = Some(1)).count() == nAll)
    } finally {
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(root))
    }
  }

  // ---------------------------------------------------------------- d45

  test("d45: novelty curve matches a driver-side recomputation") {
    val P = 1000000007L
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val lo = docs.map(_._1).min; val hi = docs.map(_._1).max
    def decile(id: Long): Long = (id - lo) * 10 / (hi - lo + 1)
    def hash(s: String): Long =
      s.foldLeft(17L)((b, c) => (b * 31 + c.toLong) % P)
    val g1 = scala.collection.mutable.HashMap[(Long, Long), Long]()
    for ((id, text) <- docs) {
      val toks = text.trim.toLowerCase.split("\\s+")
      if (toks.length >= 3) {
        val shingles = (0 to toks.length - 3)
          .map(i => s"${toks(i)} ${toks(i + 1)} ${toks(i + 2)}").distinct
        for (s <- shingles) {
          val k = (hash(s), decile(id))
          g1(k) = g1.getOrElse(k, 0L) + 1
        }
      }
    }
    val occ = g1.groupBy(_._1._2).map { case (d, m) =>
      d -> (m.values.sum, m.size.toLong)
    }
    val novel = g1.keys.groupBy(_._1).map { case (_, ks) => ks.map(_._2).min }
      .groupBy(identity).map { case (d, xs) => d -> xs.size.toLong }
    val want = occ.map { case (d, (nOcc, nDist)) =>
      (d, nOcc, nDist, novel.getOrElse(d, 0L))
    }.toSet
    val got = graft.dedup.Dedup.d45NoveltyCurve(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    assert(got == want, s"diff: ${(got diff want).take(3)} / ${(want diff got).take(3)}")
    // structural: the earliest populated decile introduces everything it holds
    val first = got.minBy(_._1)
    assert(first._4 == first._3, "first decile must be 100% novel")
    assert(got.toSeq.map(_._4).sum == g1.keys.map(_._1).toSeq.distinct.size,
      "novel counts must partition the global distinct-gram set")
  }

  // ---------------------------------------------------------------- w25

  test("w25: append adds without removing; rewrite removes everything prior") {
    val m = graft.sources.Sinks.w25ManifestDiff(spark, sfDir).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    val (a12, r12, k12) = m("1_to_2")
    val (a23, r23, k23) = m("2_to_3")
    assert(r12 == 0L, "an append must remove nothing")
    assert(a12 > 0L && k12 > 0L)
    assert(k23 == 0L, "a full rewrite keeps nothing")
    assert(r23 == a12 + k12, "the rewrite must remove exactly what snapshot 2 served")
    assert(a23 > 0L)
  }

  test("f09: top-10 AUC dims equal a driver-side Mann-Whitney recomputation") {
    val got = graft.ml.ReliefQueries.f09AucSelect(spark, sfDir)
      .orderBy("rnk").collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getLong(2)))
    assert(got.map(_._3).toSeq == (1L to 10L))
    got.foreach { case (_, auc, _) => assert(auc >= 0.0 && auc <= 1.0) }
    val rows = spark.read.parquet(s"$sfDir/embeddings.parquet")
      .selectExpr("label", "transform(embedding, x -> cast(x as double)) AS v")
      .collect().map(r => (r.getAs[Number](0).longValue == 0L, r.getSeq[Double](1).toArray))
    val dims = rows.head._2.indices
    val aucs = dims.map { d =>
      val xs = rows.map { case (y, v) => (v(d), y) }.sortBy(_._1)
      // average ranks with ties
      val byVal = xs.zipWithIndex.groupBy(_._1._1)
      val avgRank = byVal.map { case (v, g) =>
        v -> (g.map(_._2 + 1).sum.toDouble / g.size)
      }
      val n1 = xs.count(_._2)
      val n0 = xs.length - n1
      val rsum = xs.filter(_._2).map(t => avgRank(t._1)).sum
      val auc = (rsum - n1.toDouble * (n1 + 1) / 2.0) / (n1.toDouble * n0)
      (d.toLong, auc)
    }
    val want = aucs.sortBy { case (d, a) => (-math.abs(a - 0.5), d) }.take(10)
      .zipWithIndex.map { case ((d, a), i) => (d, a, (i + 1).toLong) }
    assert(got.map(_._1).toSeq == want.map(_._1),
      s"dim order: got=${got.map(_._1).toSeq} want=${want.map(_._1)}")
    got.zip(want).foreach { case ((_, a, _), (_, b, _)) =>
      assert(math.abs(a - b) < 1e-12, s"auc $a != $b")
    }
  }

  // ---------------------------------------------------------------- s26

  test("s26: live weight table equals d43's batch projection exactly") {
    val live = graft.streaming.Streams.s26StreamTemperatureMix(spark, sfDir)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2),
        r.getDouble(3), r.getDouble(4))).sortBy(_._1)
    val batch = graft.text.Corpus.d43TemperatureMix(spark, sfDir)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2),
        r.getDouble(3), r.getDouble(4))).sortBy(_._1)
    assert(live.length == batch.length && live.nonEmpty)
    live.zip(batch).foreach { case ((ll, ln, lp, lt, lb), (bl, bn, bp, bt, bb)) =>
      assert(ll == bl && ln == bn)
      assert(math.abs(lp - bp) < 1e-12 && math.abs(lt - bt) < 1e-12 &&
        math.abs(lb - bb) < 1e-12, s"weights diverge for $ll")
    }
  }

  test("s27: live group mode equals q46's batch election exactly") {
    val live = graft.streaming.Streams.s27StreamGroupMode(spark, sfDir)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getDouble(3))).toSet
    val batch = Relational.q46GroupMode(spark, sfDir)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getDouble(3))).toSet
    assert(live == batch && live.nonEmpty,
      s"live/batch modes diverge: ${(live diff batch).take(2)} / ${(batch diff live).take(2)}")
  }

  // ---------------------------------------------------------------- f08

  test("f08: stability curve matches a driver-side recomputation and its invariants") {
    val got = graft.ml.ReliefQueries.f08SelectionStability(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      .sortBy(_._1)
    assert(got.map(_._1).toSeq == (1L to 10L))
    got.foreach { case (k, n, j) =>
      assert(n >= 0 && n <= k, s"overlap $n out of range at k=$k")
      assert(j >= 0.0 && j <= 1.0 + 1e-12, s"jaccard $j out of range at k=$k")
    }
    // independent recomputation: variance ranking per vec_id-parity half
    val rows = spark.read.parquet(s"$sfDir/embeddings.parquet")
      .selectExpr("vec_id", "transform(embedding, x -> cast(x as double)) AS v")
      .collect().map(r => (r.getLong(0), r.getSeq[Double](1).toArray))
    def top(half: Int): Array[Long] = {
      val vs = rows.filter(_._1 % 2 == half).map(_._2)
      val dims = vs.head.indices.map { d =>
        val xs = vs.map(_(d))
        val n = xs.length.toDouble
        val sx = xs.sum; val sxx = xs.map(x => x * x).sum
        (d.toLong, (sxx - sx * sx / n) / n)
      }
      dims.sortBy { case (d, v) => (-v, d) }.map(_._1).toArray
    }
    val (a, b) = (top(0), top(1))
    got.foreach { case (k, n, _) =>
      val want = a.take(k.toInt).toSet.intersect(b.take(k.toInt).toSet).size
      assert(n == want, s"k=$k: spark overlap $n != driver $want")
    }
  }

  // ---------------------------------------------------------------- d44

  test("d44: leakage census matches a recomputation from the d06 pair list") {
    val P = 1000000007L
    def split(id: Long): String =
      if (id % P * 888000131L % P % 5 == 0) "val" else "train"
    val pairs = graft.dedup.Dedup.d06MinHashLsh(spark, sfDir)
      .select("doc_a", "doc_b").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(pairs.nonEmpty, "near-dup corpus must produce pairs")
    val wantCensus = pairs.groupBy { case (x, y) =>
      val Seq(lo, hi) = Seq(split(x), split(y)).sorted
      s"pairs_${lo}_$hi"
    }.view.mapValues(_.length.toLong).toMap
    val wantLeaked = pairs.filter { case (x, y) => split(x) != split(y) }
      .map { case (x, y) => if (split(x) == "val") x else y }.distinct.length.toLong
    val got = graft.dedup.Dedup.d44SplitLeakage(spark, sfDir).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got.filter(_._1.startsWith("pairs_")) == wantCensus,
      s"census mismatch: got $got want $wantCensus")
    assert(got("val_docs_leaked") == wantLeaked)
    // the audit must find real leakage on this corpus (the split is
    // independent of twin construction, so cross pairs must exist)
    assert(got.getOrElse("pairs_train_val", 0L) > 0, "no cross-split pairs found")
    assert(wantLeaked > 0)
  }

  test("w24: operator census matches the corpus and its rewrite") {
    val rows = graft.sources.Sinks.w24ShallowClone(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getLong(1))).toMap
    val docs = graft.Tables.documents(spark, sfDir)
    assert(rows("source") == docs.count())
    assert(rows("clone") == docs.where(col("doc_id") % 3 === 0).count())
  }
}
