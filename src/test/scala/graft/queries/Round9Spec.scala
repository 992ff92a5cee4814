package graft.queries

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Round-7 third-tranche operators: d36 first-occurrence span dedup. */
class Round9Spec extends SparkSpec {

  test("d36 equals a driver first-occurrence walk; twins lose every complete span to their original") {
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .select("doc_id", "text").collect().map(r => (r.getLong(0), r.getString(1)))
    // nearDupCorpus: originals + truncated twins (≥12 tokens, drop last 3)
    val corpus = docs ++ docs.collect {
      case (id, t) if t.trim.split("\\s+").length >= 12 =>
        (id + 1000000L, t.trim.split("\\s+").dropRight(3).mkString(" "))
    }
    val spans = corpus.flatMap { case (id, t) =>
      t.trim.split("\\s+").grouped(8).zipWithIndex.map {
        case (g, i) => (id, i.toLong, g.mkString(" "))
      }
    }
    val winner = spans.groupBy(_._3).map { case (txt, occ) =>
      txt -> occ.map(s => s._1 * 1048576L + s._2).min
    }
    val want = spans.groupBy(_._1).map { case (id, sp) =>
      val ordered = sp.sortBy(_._2)
      val kept = ordered.filter(s => winner(s._3) == s._1 * 1048576L + s._2)
      (id, kept.map(_._3).mkString(" "), ordered.length.toLong,
        (ordered.length - kept.length).toLong)
    }.toSeq.sortBy(_._1)
    val got = graft.text.Corpus.d36SpanDedup(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
      .sortBy(_._1).toSeq
    assert(got == want)
    assert(want.exists(_._4 > 0), "no span was ever dropped — degenerate corpus")
    // first-occurrence semantics, observed on the planted twins: every
    // COMPLETE twin span also occurs (earlier) in its original, so a
    // twin drops at least all but its final (possibly partial) span —
    // while d26 would have scrubbed the originals too
    val twins = got.filter(_._1 >= 1000000L)
    assert(twins.nonEmpty)
    twins.foreach { t =>
      assert(t._4 >= t._3 - 1, s"twin ${t._1}: only ${t._4} of ${t._3} spans dropped")
    }
    // the complement property vs d26: the span winners keep their text —
    // some original doc retains a span its twin lost
    val origWithKept = got.filter(t => t._1 < 1000000L && t._2.nonEmpty)
    assert(origWithKept.nonEmpty)
  }

  test("q40 two-level sweep equals the naive global window and a driver walk; no global sort of deltas") {
    val out = graft.queries.Events.q40PeakConcurrency(spark, sfDir)
    val got = out.collect()
      .map(r => (r.getTimestamp(0).getTime, r.getLong(1), r.getLong(2)))
      .sortBy(_._1).toSeq

    // driver walk: the textbook sweep, ends before starts at equal t
    val ts = graft.Tables.events(spark, sfDir)
      .select(expr("unix_micros(ts)")).collect().map(_.getLong(0))
    val deltas = (ts.map(t => (t, 1L)) ++ ts.map(t => (t + 600000000L, -1L)))
      .sortBy(identity)
    var conc = 0L
    val perHour = collection.mutable.Map[Long, (Long, Long)]()
    deltas.foreach { case (t, d) =>
      conc += d
      val b = t / 3600000000L
      val (m, n) = perHour.getOrElse(b, (Long.MinValue, 0L))
      perHour(b) = (math.max(m, conc), n + 1)
    }
    val want = perHour.toSeq.map { case (b, (m, n)) => (b * 3600L * 1000L, m, n) }
      .sortBy(_._1)
    assert(got == want)
    assert(got.nonEmpty)
    assert(got.exists(_._2 > 1), "concurrency never exceeded 1 — degenerate")
    // concurrency is conserved: the final running value returns to 0
    assert(deltas.map(_._2).sum == 0L)

    // scale pin: the within-bucket window is keyed (hash-partitioned by
    // bucket), never a single global sort of the full delta frame
    val plan = out.queryExecution.executedPlan.toString
    assert(plan.contains("hashpartitioning(bucket"), plan.take(3000))
  }

  test("e17 hybrid RRF equals a driver walk; fusion really mixes the two modalities") {
    val out = graft.sim.Sim.e17HybridSearch(spark, sfDir)
    val got = out.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4)))
      .sortBy(t => (t._1, t._2)).toSeq

    // driver walk of both rankings and the fusion
    val embs = spark.read.parquet(s"$sfDir/embeddings.parquet")
      .selectExpr("vec_id", "cast(embedding as array<double>) as v").collect()
      .map(r => (r.getLong(0), r.getSeq[Double](1).toArray))
      .filter { case (_, v) => math.sqrt(v.map(x => x * x).sum) > 0.0 }
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1).toLowerCase.trim.split("\\s+").distinct.toSet))
    def cos(a: Array[Double], b: Array[Double]) = {
      var i = 0; var d = 0.0; var na = 0.0; var nb = 0.0
      while (i < a.length) { d += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i); i += 1 }
      d / (math.sqrt(na) * math.sqrt(nb))
    }
    val queries = embs.filter(_._1 < 20)
    val want = queries.flatMap { case (qid, qv) =>
      val vl = embs.filter(_._1 != qid)
        .map { case (id, v) => (id, cos(qv, v)) }
        .sortBy { case (id, c) => (-c, id) }.take(100).zipWithIndex
        .map { case ((id, _), i) => id -> (i + 1L) }.toMap
      val qt = docs.find(_._1 == qid).get._2
      val ll = docs.filter(_._1 != qid)
        .map { case (id, t) => (id, (t & qt).size.toLong) }
        .filter(_._2 > 0)
        .sortBy { case (id, n) => (-n, id) }.take(100).zipWithIndex
        .map { case ((id, _), i) => id -> (i + 1L) }.toMap
      (vl.keySet ++ ll.keySet).toSeq.map { id =>
        val rv = vl.getOrElse(id, 0L); val rl = ll.getOrElse(id, 0L)
        val rrf = (if (rv > 0) 1.0 / (60 + rv) else 0.0) +
          (if (rl > 0) 1.0 / (60 + rl) else 0.0)
        (qid, id, rv, rl, rrf)
      }.sortBy(t => (-t._5, t._2)).take(10)
    }.sortBy(t => (t._1, t._2)).toSeq
    assert(got == want)
    assert(got.nonEmpty)
    // fusion mixes: some served row came from ONE list only, and some
    // row was boosted by both modalities
    assert(got.exists(t => t._3 == 0L || t._4 == 0L), "no single-modality row served")
    assert(got.exists(t => t._3 > 0L && t._4 > 0L), "no dual-modality row served")
    // the query-term side broadcasts; the corpus never cross-joins itself
    val plan = out.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), plan.take(3000))
    assert(!plan.contains("CartesianProduct"), plan.take(3000))
  }

  test("w21 branch isolation + metadata-only fast-forward; tags pin bytes") {
    import graft.sources.Sinks
    import graft.Tables
    import org.apache.hadoop.fs.{Path => HPath}
    // operator end-to-end: main full corpus, staging the filtered snap 2
    val got = Sinks.w21TableBranches(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).sortBy(_._1).toSeq
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val full = (docs.count(), docs.agg(sum("n_chars")).head().getLong(0))
    val filt = docs.where(col("doc_id") % 3 === 0)
    val sub = (filt.count(), filt.agg(sum("n_chars")).head().getLong(0))
    assert(got == Seq(("main", full._1, full._2), ("staging", sub._1, sub._2)))

    // primitives on a private root: fast-forward is one ref rewrite —
    // no new manifest, no new data file
    val root = "/tmp/graft_w21_spec"
    val fs = new HPath(root).getFileSystem(spark.sessionState.newHadoopConf())
    fs.delete(new HPath(root), true)
    val d = Tables.documents(spark, sfDir)
    Sinks.publishSnapshot(spark, d, root, 1)
    Sinks.setRef(spark, root, "main", 1)
    Sinks.setRef(spark, root, "tags/run-a", 1)
    Sinks.publishSnapshot(spark, d.where(col("doc_id") % 3 === 0), root, 2)
    Sinks.setRef(spark, root, "staging", 2)
    val manifestsBefore = fs.globStatus(new HPath(s"$root/manifest-*")).length
    val dataBefore = fs.globStatus(new HPath(s"$root/data/*/part-*.parquet")).length
    Sinks.setRef(spark, root, "main", Sinks.refAt(spark, root, "staging"))
    assert(fs.globStatus(new HPath(s"$root/manifest-*")).length == manifestsBefore)
    assert(fs.globStatus(new HPath(s"$root/data/*/part-*.parquet")).length == dataBefore)
    // after the fast-forward main serves the branch's snapshot...
    assert(Sinks.readRef(spark, sfDir, root, "main").count() ==
      Sinks.readRef(spark, sfDir, root, "staging").count())
    // ...while the tag still pins snapshot 1's bytes
    assert(Sinks.refAt(spark, root, "tags/run-a") == 1)
    assert(Sinks.readRef(spark, sfDir, root, "tags/run-a").count() == d.count())
  }

  test("s20 streaming attribution equals q41 in one batch AND on a time-ordered two-batch split") {
    import graft.streaming.Streams
    import java.nio.file.{Files, Paths}
    def rows(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2),
        if (r.isNullAt(3)) -1L else r.getLong(3)))
      .sortBy(_._1).toSeq
    val want = rows(graft.queries.Events.q41LastTouchAttribution(spark, sfDir))
    assert(want.nonEmpty)
    def close(a: Seq[(String, Long, Double, Long)], b: Seq[(String, Long, Double, Long)]) = {
      assert(a.map(t => (t._1, t._2, t._4)) == b.map(t => (t._1, t._2, t._4)))
      a.zip(b).foreach { case (x, y) =>
        assert(math.abs(x._3 - y._3) < 1e-6 * math.max(1.0, math.abs(y._3))) }
    }
    close(rows(Streams.s20StreamAttribution(spark, sfDir)), want)

    // two micro-batches split at the median timestamp: per-user
    // time-ordered arrival must reproduce the batch rule, with the
    // carried last-touch state crossing the batch boundary
    val src = graft.Tables.events(spark, sfDir)
    val mid = src.agg(expr("percentile_approx(unix_micros(ts), 0.5)")).head().getLong(0)
    val stage = "/tmp/graft_stream_s20_split"
    val d = Paths.get(stage)
    if (Files.exists(d))
      Files.walk(d).sorted(java.util.Comparator.reverseOrder())
        .forEach(p => Files.delete(p))
    Files.createDirectories(d)
    src.where(expr("unix_micros(ts)") <= mid).coalesce(1)
      .write.mode("overwrite").parquet(s"$stage/p1")
    Thread.sleep(1100)
    src.where(expr("unix_micros(ts)") > mid).coalesce(1)
      .write.mode("overwrite").parquet(s"$stage/p2")
    val stream = spark.readStream.schema(src.schema)
      .option("maxFilesPerTrigger", "1").parquet(s"$stage/p*")
    close(rows(Streams.runAttribution(stream)), want)
  }

  test("f01 chi2 ranking equals a driver contingency walk; counts exact; selection non-degenerate") {
    val rows = spark.read.parquet(s"$sfDir/embeddings.parquet")
      .selectExpr("cast(label as long) as label", "embedding").collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).toArray))
    val dims = rows.head._2.length
    val labels = rows.map(_._1).distinct.sorted
    val want = (0 until dims).map { d =>
      val n = Array.ofDim[Long](2, labels.length)
      rows.foreach { case (l, v) =>
        n(if (v(d) > 0.0f) 1 else 0)(labels.indexOf(l)) += 1
      }
      val tot = rows.length.toDouble
      var chi2 = 0.0
      for (s <- 0 to 1; li <- labels.indices) {
        val row = n(s).sum.toDouble
        val col = (n(0)(li) + n(1)(li)).toDouble
        val e = row * col / tot
        if (e > 0) chi2 += (n(s)(li) - e) * (n(s)(li) - e) / e
      }
      (d.toLong, chi2)
    }.sortBy { case (d, c) => (-c, d) }.take(10).zipWithIndex
      .map { case ((d, c), i) => (d, c, i + 1L) }
    val got = graft.ml.ReliefQueries.f01Chi2Select(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getLong(2))).sortBy(_._3).toSeq
    assert(got.map(t => (t._1, t._3)) == want.map(t => (t._1, t._3)))
    got.zip(want).foreach { case (g, w) =>
      assert(math.abs(g._2 - w._2) < 1e-9 * math.max(1.0, w._2), s"dim ${g._1}")
    }
    // non-degenerate: ten distinct dims, strictly ordered scores
    assert(got.map(_._1).distinct.length == 10)
    assert(got.map(_._2).zip(got.map(_._2).drop(1)).forall { case (a, b) => a >= b })
    assert(got.head._2 > 0.0)
  }

  test("s21 streaming funnel equals batch q33 in one batch AND on a time-ordered two-batch split") {
    import graft.streaming.Streams
    import java.nio.file.{Files, Paths}
    def rows(df: org.apache.spark.sql.DataFrame) = {
      val r = df.collect().head
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3), r.getDouble(4))
    }
    val want = rows(graft.queries.Events.q33Funnel(spark, sfDir))
    assert(want._1 > 0 && want._2 > 0 && want._3 > 0)
    def close(a: (Long, Long, Long, Double, Double)) = {
      assert((a._1, a._2, a._3) == ((want._1, want._2, want._3)))
      assert(math.abs(a._4 - want._4) < 1e-6 * math.max(1.0, math.abs(want._4)))
      assert(math.abs(a._5 - want._5) < 1e-6 * math.max(1.0, math.abs(want._5)))
    }
    close(rows(Streams.s21StreamFunnel(spark, sfDir)))

    val src = graft.Tables.events(spark, sfDir)
    val mid = src.agg(expr("percentile_approx(unix_micros(ts), 0.5)")).head().getLong(0)
    val stage = "/tmp/graft_stream_s21_split"
    val d = Paths.get(stage)
    if (Files.exists(d))
      Files.walk(d).sorted(java.util.Comparator.reverseOrder())
        .forEach(p => Files.delete(p))
    Files.createDirectories(d)
    src.where(expr("unix_micros(ts)") <= mid).coalesce(1)
      .write.mode("overwrite").parquet(s"$stage/p1")
    Thread.sleep(1100)
    src.where(expr("unix_micros(ts)") > mid).coalesce(1)
      .write.mode("overwrite").parquet(s"$stage/p2")
    val stream = spark.readStream.schema(src.schema)
      .option("maxFilesPerTrigger", "1").parquet(s"$stage/p*")
    close(rows(Streams.runStreamFunnel(stream)))
  }

  test("f02 variance ranking equals a driver moment walk; near-tie-free ordering") {
    val rows = spark.read.parquet(s"$sfDir/embeddings.parquet")
      .select("embedding").collect().map(_.getSeq[Float](0).toArray)
    val dims = rows.head.length
    val want = (0 until dims).map { d =>
      val xs = rows.map(_(d).toDouble)
      val n = xs.length.toDouble
      val sx = xs.sum; val sxx = xs.map(x => x * x).sum
      (d.toLong, (sxx - sx * sx / n) / n)
    }.sortBy { case (d, v) => (-v, d) }.take(10).zipWithIndex
      .map { case ((d, v), i) => (d, v, i + 1L) }
    val got = graft.ml.ReliefQueries.f02VarianceSelect(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getLong(2))).sortBy(_._3).toSeq
    assert(got.map(t => (t._1, t._3)) == want.map(t => (t._1, t._3)))
    got.zip(want).foreach { case (g, w) =>
      assert(math.abs(g._2 - w._2) < 1e-9 * math.max(1e-12, w._2), s"dim ${g._1}")
    }
    assert(got.head._2 > 0.0)
  }

  test("w22 metadata census is exact and readable from metadata alone (no data directory)") {
    import graft.sources.Sinks
    import org.apache.hadoop.fs.{Path => HPath, FileUtil}
    val got = Sinks.w22MetadataTables(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sortBy(_._1).toSeq
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val full = docs.count()
    val app = docs.where(col("doc_id") % 3 === 0).count()
    assert(got == Seq((1L, 4L, full), (2L, 6L, full + app)))

    // the pin: copy ONLY manifests + sidecars to a bare root — the same
    // census must come back without any data directory existing at all
    val conf = spark.sessionState.newHadoopConf()
    val srcRoot = s"/tmp/graft_sink_metatable_${Integer.toHexString(sfDir.hashCode)}_" +
      Integer.toHexString(spark.sparkContext.applicationId.hashCode)
    val bare = "/tmp/graft_w22_bare"
    val fs = new HPath(bare).getFileSystem(conf)
    fs.delete(new HPath(bare), true)
    fs.mkdirs(new HPath(bare))
    for (n <- 1 to 2) {
      FileUtil.copy(fs, new HPath(s"$srcRoot/manifest-$n"),
        fs, new HPath(s"$bare/manifest-$n"), false, conf)
      FileUtil.copy(fs, new HPath(Sinks.statsSidecar(srcRoot, n)),
        fs, new HPath(Sinks.statsSidecar(bare, n)), false, conf)
    }
    assert(!fs.exists(new HPath(s"$bare/data")))
    val bareRows = Sinks.metadataTable(spark, bare, Seq(1, 2)).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sortBy(_._1).toSeq
    assert(bareRows == got)
  }

  test("f03 top correlations equal a driver Gramian walk; pairs ordered and in range") {
    val rows = spark.read.parquet(s"$sfDir/embeddings.parquet")
      .select("embedding").collect().map(_.getSeq[Float](0).map(_.toDouble).toArray)
    val d = rows.head.length
    val n = rows.length.toDouble
    def mom(i: Int) = (rows.map(_(i)).sum, rows.map(v => v(i) * v(i)).sum)
    val want = (for { i <- 0 until d; j <- (i + 1) until d } yield {
      val (sx, sxx) = mom(i); val (sy, syy) = mom(j)
      val sxy = rows.map(v => v(i) * v(j)).sum
      val den = math.sqrt(n * sxx - sx * sx) * math.sqrt(n * syy - sy * sy)
      (i.toLong, j.toLong, if (den > 0) (n * sxy - sx * sy) / den else 0.0)
    }).sortBy { case (i, j, c) => (-math.abs(c), i, j) }.take(10).zipWithIndex
      .map { case ((i, j, c), r) => (i, j, c, r + 1L) }
    val got = graft.ml.ReliefQueries.f03TopCorrelations(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getLong(3)))
      .sortBy(_._4).toSeq
    assert(got.map(t => (t._1, t._2, t._4)) == want.map(t => (t._1, t._2, t._4)))
    got.zip(want).foreach { case (g, w) =>
      assert(math.abs(g._3 - w._3) < 1e-9, s"pair (${g._1},${g._2})")
    }
    assert(got.forall(t => t._3.abs <= 1.0 && t._1 < t._2))
    assert(got.map(_._3.abs).zip(got.map(_._3.abs).drop(1)).forall { case (a, b) => a >= b })
  }

  test("q42 SCD-2 join equals a driver version walk; every event matches exactly one version") {
    val evs = graft.Tables.events(spark, sfDir)
      .select(col("event_type"), expr("unix_micros(ts)").as("ts_us"),
        expr("cast(round(value * 1000) as bigint)").as("vmil"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val t0 = evs.map(_._2).min
    val t3 = evs.map(_._2).max + 1
    val want = evs.map { case (ty, ts, vm) =>
      val k = (0 until 3).find { k =>
        ts >= t0 + (t3 - t0) * k / 3 && ts < t0 + (t3 - t0) * (k + 1) / 3
      }.get.toLong
      ((ty, k), vm * (ty.length + k))
    }.groupBy(_._1).map { case ((ty, k), l) =>
      (ty, k, l.size.toLong, l.map(_._2).sum)
    }.toSeq.sortBy(t => (t._1, t._2))
    val got = graft.queries.Events.q42Scd2Join(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .sortBy(t => (t._1, t._2)).toSeq
    assert(got == want)
    // windows partition the range: totals reconcile exactly and more
    // than one version is live for some type
    assert(got.map(_._3).sum == evs.length.toLong)
    assert(got.groupBy(_._1).values.exists(_.size > 1))
    // the dim side broadcasts; no shuffle of facts beyond the rollup
    val plan = graft.queries.Events.q42Scd2Join(spark, sfDir)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), plan.take(3000))
  }

  test("m10 segmentation equals a driver span walk; detector recovers span structure exactly") {
    import graft.multimodal.Multimodal
    val got = Multimodal.m10AudioSegmentation(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
      .sortBy(_._1).toSeq
    val ids = spark.read.parquet(s"$sfDir/documents.parquet")
      .select("doc_id").collect().map(_.getLong(0))
    val want = ids.map { id =>
      val nSpans = (5 + id % 5).toInt
      val voiced = (0 until nSpans * 2).map(f => (id + f / 2) % 3 != 0)
      var nSeg = 0L; var longest = 0L; var run = 0L
      voiced.foreach { v =>
        if (v) { if (run == 0) nSeg += 1; run += 1; longest = math.max(longest, run) }
        else run = 0
      }
      (id, nSpans * 2L, voiced.count(identity).toLong, nSeg, longest)
    }.sortBy(_._1).toSeq
    assert(got == want)
    // both frame populations and multi-segment clips are real
    assert(got.forall(t => t._3 > 0 && t._3 < t._2))
    assert(got.exists(_._4 >= 2))
    // the energy detector (codec path) never misclassifies a frame:
    // n_voiced == formula voiced count for every clip, checked above by
    // equality; additionally the longest run bounds hold
    got.foreach(t => assert(t._5 <= t._3 && t._4 <= t._3))
  }

  test("s22 streaming SCD-2 enrichment equals batch q42 in one pass AND on a two-batch split") {
    import graft.streaming.Streams
    import java.nio.file.{Files, Paths}
    def rows(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .sortBy(t => (t._1, t._2)).toSeq
    val want = rows(graft.queries.Events.q42Scd2Join(spark, sfDir))
    assert(want.nonEmpty)
    assert(rows(Streams.s22StreamScd2(spark, sfDir)) == want)

    // arbitrary two-batch split: the rollup is additive, so batching
    // cannot change it — the dimension is static across batches
    val src = graft.Tables.events(spark, sfDir)
    val stage = "/tmp/graft_stream_s22_split"
    val d = Paths.get(stage)
    if (Files.exists(d))
      Files.walk(d).sorted(java.util.Comparator.reverseOrder())
        .forEach(p => Files.delete(p))
    Files.createDirectories(d)
    src.where(col("event_id") % 2 === 0).coalesce(1)
      .write.mode("overwrite").parquet(s"$stage/p1")
    Thread.sleep(1100)
    src.where(col("event_id") % 2 =!= 0).coalesce(1)
      .write.mode("overwrite").parquet(s"$stage/p2")
    val stream = spark.readStream.schema(src.schema)
      .option("maxFilesPerTrigger", "1").parquet(s"$stage/p*")
    val dimSource = src.select(col("event_type"), expr("unix_micros(ts)").as("ts_us"))
    val dim = graft.queries.Events.scd2Dim(dimSource)
    assert(rows(Streams.runStreamScd2(stream, dim)) == want)
  }

  test("e18 drift report equals a driver centroid walk; populations and drift all live") {
    val rows = spark.read.parquet(s"$sfDir/embeddings.parquet")
      .selectExpr("vec_id", "cast(label as long) as label",
        "cast(embedding as array<double>) as v").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getSeq[Double](2).toArray))
    val want = rows.groupBy(_._2).map { case (label, l) =>
      val old = l.filter(_._1 % 2 == 0); val neu = l.filter(_._1 % 2 == 1)
      val d = l.head._3.length
      def centroid(xs: Array[(Long, Long, Array[Double])]) =
        (0 until d).map(i => xs.map(_._3(i)).sum / xs.length).toArray
      val co = centroid(old); val cn = centroid(neu)
      val drift = (0 until d).map(i => (co(i) - cn(i)) * (co(i) - cn(i))).sum
      (label, old.length.toLong, neu.length.toLong, drift)
    }.toSeq.sortBy(_._1)
    val got = graft.sim.Sim.e18EmbeddingDrift(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
      .sortBy(_._1).toSeq
    assert(got.map(t => (t._1, t._2, t._3)) == want.map(t => (t._1, t._2, t._3)))
    got.zip(want).foreach { case (g, w) =>
      assert(math.abs(g._4 - w._4) < 1e-9 * math.max(1e-12, w._4), s"label ${g._1}")
    }
    assert(got.forall(t => t._2 > 0 && t._3 > 0 && t._4 > 0.0))
    assert(got.map(_._1).distinct.length == got.length)
  }

  test("d37 template mining equals a driver dictionary walk; shares and ranks consistent") {
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .select("doc_id", "text").collect().map(r => (r.getLong(0), r.getString(1)))
    val corpus = docs ++ docs.collect {
      case (id, t) if t.trim.split("\\s+").length >= 12 =>
        (id + 1000000L, t.trim.split("\\s+").dropRight(3).mkString(" "))
    }
    val lines = corpus.flatMap { case (id, t) =>
      t.trim.split("\\s+").grouped(8).map(g => (id, g.mkString(" ")))
    }
    def md5hex(s: String) = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    val want = lines.groupBy(_._2)
      .map { case (t, l) => (t, l.map(_._1).distinct.length.toLong) }
      .filter(_._2 >= 2).toSeq
      .sortBy { case (t, n) => (-n, md5hex(t)) }.take(20).zipWithIndex
      .map { case ((t, n), i) =>
        (t, n, i + 1L, n.toDouble / corpus.length) }
    val got = graft.text.Corpus.d37TemplateMining(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
      .sortBy(_._3).toSeq
    assert(got == want.toSeq)
    assert(got.nonEmpty)
    assert(got.map(_._2).zip(got.map(_._2).drop(1)).forall { case (a, b) => a >= b })
    assert(got.forall(t => t._4 > 0.0 && t._4 <= 1.0))
  }

  test("e19 tuning curve: recall monotone in nprobe; top setting reproduces e04; bounds hold") {
    import graft.sim.Sim
    val got = Sim.e19IvfTuningCurve(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sortBy(_._1).toSeq
    assert(got.map(_._1) == Seq(1L, 2L, 4L))
    // same exact-panel denominator everywhere; hits within bounds
    assert(got.map(_._2).distinct.length == 1)
    got.foreach(t => assert(t._3 >= 0 && t._3 <= t._2))
    // more probed cells can only add candidates: recall is monotone
    assert(got(0)._3 <= got(1)._3 && got(1)._3 <= got(2)._3)
    // the sweep's top setting IS e04: recompute its hits from the
    // operator outputs directly
    val exact = Sim.e01KnnCosine(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val e04 = Sim.e04AnnIvf(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got(2)._3 == exact.count(e04.contains).toLong)
    assert(got(2)._2 == exact.size.toLong)
    // the curve is non-degenerate: nprobe=1 misses something nprobe=4 finds
    assert(got(0)._3 < got(2)._3, "sweep is flat — tuning curve degenerate")
  }

  test("q43 growth equals a driver walk; first day NULL; days contiguous frame") {
    val evs = graft.Tables.events(spark, sfDir)
      .select(date_trunc("day", col("ts")).as("day"),
        expr("cast(round(value * 1000) as bigint)").as("vmil"))
      .collect().map(r => (r.getTimestamp(0).getTime, r.getLong(1)))
    val daily = evs.groupBy(_._1).map { case (d, l) =>
      (d, l.size.toLong, l.map(_._2).sum) }.toSeq.sortBy(_._1)
    val want = daily.zipWithIndex.map { case ((d, n, s), i) =>
      val prev = if (i == 0) -1L else daily(i - 1)._2
      val g = if (i == 0) Double.NaN else (n - prev).toDouble / prev
      (d, n, s, prev, g)
    }
    val got = graft.queries.Events.q43PeriodGrowth(spark, sfDir).collect()
      .map(r => (r.getTimestamp(0).getTime, r.getLong(1), r.getLong(2),
        if (r.isNullAt(3)) -1L else r.getLong(3),
        if (r.isNullAt(4)) Double.NaN else r.getDouble(4)))
      .sortBy(_._1).toSeq
    assert(got.map(t => (t._1, t._2, t._3, t._4)) == want.map(t => (t._1, t._2, t._3, t._4)))
    got.zip(want).foreach { case (g, w) =>
      assert((g._5.isNaN && w._5.isNaN) || math.abs(g._5 - w._5) < 1e-12)
    }
    assert(got.head._4 == -1L && got.head._5.isNaN)
    assert(got.drop(1).forall(t => t._4 >= 0))
    assert(got.length > 2)
  }

  test("d38 priority election equals a driver walk; winners always have the group's best priority") {
    val P = 1000000007L
    def prio(s: String) = s.foldLeft(7L)((a, c) => (a * 31 + c.toInt) % P) % 5
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .select("doc_id", "source", "text").collect()
      .map(r => (r.getLong(0), r.getString(1), Option(r.getString(2)).getOrElse("")))
    val want = docs.groupBy(_._3).map { case (_, grp) =>
      val w = grp.minBy(d => (prio(d._2), d._1))
      (w._1, w._2, prio(w._2), grp.size.toLong)
    }.toSeq.sortBy(_._1)
    val got = graft.text.Corpus.d38PriorityDedup(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
      .sortBy(_._1).toSeq
    assert(got == want)
    assert(got.nonEmpty && got.map(_._3).distinct.length > 1,
      "only one priority class — election untested")
    // every winner's priority is minimal within its duplicate group
    val byText = docs.groupBy(_._3)
    got.foreach { case (id, _, p, n) =>
      val grp = byText(docs.find(_._1 == id).get._3)
      assert(n == grp.size.toLong)
      assert(p == grp.map(d => prio(d._2)).min, s"doc $id not best-priority")
    }
  }

  test("q44 histogram equals a driver bucket walk; buckets partition the range exactly") {
    val vms = graft.Tables.lineitem(spark, sfDir)
      .select(expr("cast(round(l_extendedprice * 1000) as bigint)")).collect()
      .map(_.getLong(0))
    val lo = vms.min; val hi = vms.max
    val want = vms.groupBy(v => (v - lo) * 20 / (hi - lo + 1))
      .map { case (b, l) => (b, l.size.toLong, l.sum) }.toSeq.sortBy(_._1)
    val got = graft.queries.Relational.q44EquiwidthHistogram(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sortBy(_._1).toSeq
    assert(got == want)
    // totals conserve; all buckets in [0, 19]; min and max land at the ends
    assert(got.map(_._2).sum == vms.length.toLong)
    assert(got.forall(t => t._1 >= 0 && t._1 <= 19))
    assert(got.head._1 == 0L && got.last._1 == 19L)
  }

  test("q45 SQL formulation equals a driver walk; the EXISTS is decorrelated to a semi join") {
    // dates are TIMESTAMP_NTZ in the testdata: ISO strings compare
    // chronologically, so the walk stays type-agnostic
    val orders = graft.Tables.orders(spark, sfDir)
      .selectExpr("o_orderkey", "o_orderpriority",
        "cast(o_orderdate as string) as od").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    val late = graft.Tables.lineitem(spark, sfDir)
      .selectExpr("l_orderkey", "cast(l_shipdate as string) as sd").collect()
      .map(r => (r.getLong(0), r.getString(1)))
      .groupBy(_._1).view.mapValues(_.map(_._2).max).toMap
    val want = orders
      .filter { case (ok, _, od) => late.get(ok).exists(_ > od) }
      .groupBy(_._2).map { case (p, l) => (p, l.size.toLong) }.toSeq.sortBy(_._1)
    val out = graft.queries.Relational.q45SqlOrderPriority(spark, sfDir)
    val got = out.collect().map(r => (r.getString(0), r.getLong(1))).sortBy(_._1).toSeq
    assert(got == want)
    assert(got.map(_._2).sum > 0)
    val plan = out.queryExecution.executedPlan.toString
    assert(plan.contains("LeftSemi"), plan.take(3000))
  }

  test("d39 pressure report equals a driver walk and reconciles with d14's crawl-side view") {
    val P = 1000000007L
    def isBench(id: Long) = ((id % P) * 777000037L % P + 4242L) % P < 20000000L
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    def grams(t: String): Set[String] = {
      val toks = t.trim.toLowerCase.split("\\s+")
      if (toks.length < 5) Set.empty
      else (0 to toks.length - 5).map(i => toks.slice(i, i + 5).mkString(" ")).toSet
    }
    val bench = docs.filter(d => isBench(d._1)).map(d => (d._1, grams(d._2)))
    val crawl = docs.filter(d => !isBench(d._1)).map(d => (d._1, grams(d._2)))
    val want = bench.flatMap { case (bid, bg) =>
      val hits = crawl.map { case (cid, cg) => (cid, (bg & cg).size.toLong) }
        .filter(_._2 > 0)
      if (hits.isEmpty) None
      else Some((bid, hits.length.toLong, hits.map(_._2).sum))
    }.sortBy(_._1).toSeq
    val got = graft.text.Corpus.d39ContaminationPressure(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sortBy(_._1).toSeq
    assert(got == want)
    assert(got.nonEmpty, "no contamination pressure — degenerate corpus")
    // hit volume dominates doc count; the report is bench-side only
    got.foreach(t => assert(t._3 >= t._2 && isBench(t._1)))
  }

  test("f04 mRMR picks equal an independent greedy walk; redundancy really reorders pure relevance") {
    import graft.ml.ReliefQueries
    val got = ReliefQueries.f04MrmrSelect(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).sortBy(_._1).toSeq
    assert(got.map(_._1) == Seq(1L, 2L, 3L, 4L, 5L))
    assert(got.map(_._2).distinct.length == 5, "a dim was picked twice")
    // independent walk straight from the kernels
    val chi = ReliefQueries.chi2Frame(spark, sfDir).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val corr = ReliefQueries.corrPairs(spark, sfDir)
      .flatMap { case (i, j, c) => Seq((i, j) -> c, (j, i) -> c) }.toMap
    var sel = List.empty[Long]
    val want = (1 to 5).map { step =>
      val (d, s) = chi.keys.toSeq.filterNot(sel.contains).map { d =>
        val red = if (sel.isEmpty) 0.0
          else sel.map(x => math.abs(corr((d, x)))).sum / sel.length
        (d, chi(d) - red)
      }.minBy { case (d, s) => (-s, d) }
      sel = sel :+ d
      (step.toLong, d, s)
    }
    assert(got.map(t => (t._1, t._2)) == want.map(t => (t._1, t._2)))
    got.zip(want).foreach { case (g, w) => assert(math.abs(g._3 - w._3) < 1e-9) }
    // step 1 is the pure-relevance champion; scores carry the penalty
    val topChi = chi.toSeq.minBy { case (d, c) => (-c, d) }._1
    assert(got.head._2 == topChi)
    assert(got.tail.forall(t => t._3 <= chi(t._2)), "no redundancy penalty applied")
  }

  test("s23 streaming histogram equals batch q44 on an AvailableNow pass") {
    import graft.streaming.Streams
    def rows(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sortBy(_._1).toSeq
    val want = rows(graft.queries.Relational.q44EquiwidthHistogram(spark, sfDir))
    assert(want.nonEmpty)
    assert(rows(Streams.s23StreamHistogram(spark, sfDir)) == want)
  }

  test("f05 drift ranking equals a driver histogram walk; all-integer scores") {
    val rows = spark.read.parquet(s"$sfDir/embeddings.parquet")
      .selectExpr("vec_id", "transform(embedding, x -> cast(round(cast(x as double) * 1000) as bigint)) as xm")
      .collect().map(r => (r.getLong(0), r.getSeq[Long](1).toArray))
    val dims = rows.head._2.length
    val want = (0 until dims).map { d =>
      val old = rows.filter(_._1 % 2 == 0).map(_._2(d))
      val neu = rows.filter(_._1 % 2 == 1).map(_._2(d))
      val lo = old.min; val hi = old.max
      def bucket(x: Long) = math.max(0L, math.min(7L, (x - lo) * 8 / (hi - lo + 1)))
      val no = old.groupBy(bucket).view.mapValues(_.length.toLong).toMap
      val nn = neu.groupBy(bucket).view.mapValues(_.length.toLong).toMap
      val drift = (no.keySet ++ nn.keySet).toSeq.map { b =>
        math.abs(no.getOrElse(b, 0L) * neu.length - nn.getOrElse(b, 0L) * old.length)
      }.sum
      (d.toLong, drift)
    }.sortBy { case (d, v) => (-v, d) }.take(10).zipWithIndex
      .map { case ((d, v), i) => (d, v, i + 1L) }
    val got = graft.ml.ReliefQueries.f05HistogramDrift(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sortBy(_._3).toSeq
    assert(got == want)
    assert(got.head._2 > 0L)
  }

  test("m11 near-dup pairs: every in-radius twin found with exact hamming; precision total") {
    import graft.multimodal.Multimodal
    val got = Multimodal.m11ImageNearDup(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sortBy(t => (t._1, t._2)).toSeq
    val ids = spark.read.parquet(s"$sfDir/documents.parquet")
      .select("doc_id").collect().map(_.getLong(0))
    val planted = ids.filter(_ % 3 == 0)
    assert(planted.nonEmpty)
    // driver replica of the aHash formula for expected twin hammings
    def hashBits(img: Long, noisy: Boolean): Set[Int] = {
      val P = 1000000007L
      val m1 = img % P * 616318177L % P
      val m2 = img % P * 777000037L % P
      val m3 = img % P * 888000131L % P
      val k1 = 1 + m1 % 97; val k2 = 1 + m2 % 89; val k3 = 1 + m3 % 83
      val lums = (0 until 64).map { bit =>
        val p = ((bit / 8) * 12 / 8) * 16 + 2 * (bit % 8)
        val l =
          if (noisy && (bit == (img % 64).toInt || bit == ((img * 7 + 13) % 64).toInt))
            255000L
          else 299L * ((m1 + p * k1) % 200) + 587L * ((m2 + p * k2) % 200) +
            114L * ((m3 + p * k3) % 200)
        bit -> l
      }.toMap
      val s = lums.values.sum
      (0 until 64).filter(b => lums(b) * 64 > s).toSet
    }
    var inRadius = 0
    planted.foreach { id =>
      val whites = Multimodal.m11WhiteBits(id).map(Multimodal.m11BitToSrcPixel).toSet
      assert(!java.util.Arrays.equals(
        Multimodal.synthUniqueImage(id, Set.empty),
        Multimodal.synthUniqueImage(id, whites)), s"doc $id twin not byte-distinct")
      val expected = (hashBits(id, noisy = false) -- hashBits(id, noisy = true)).size +
        (hashBits(id, noisy = true) -- hashBits(id, noisy = false)).size
      val pair = got.find(t => t._1 == id && t._2 == id + 1000000L)
      if (expected <= 7) {
        inRadius += 1
        assert(pair.isDefined, s"in-radius twin of $id (hamming $expected) not found")
        assert(pair.get._3 == expected.toLong, s"doc $id hamming ${pair.get._3} != $expected")
      } else assert(pair.isEmpty, s"out-of-radius twin of $id served")
    }
    assert(inRadius > 0, "no twin inside the radius — degenerate synthesis")
    // the near-dup tier does real work: some found pair is byte-distinct
    // AND hash-distinct (m07's exact equality would have missed it)
    assert(got.exists(_._3 > 0), "every pair at hamming 0 — equality would suffice")
    // precision: radius bound holds; pair space stayed linear
    assert(got.forall(t => t._3 <= 7))
    assert(got.length < ids.length * 3)
  }

  test("d40 recall harness: truth from a driver shingle walk; found never exceeds true; twins measured") {
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .select("doc_id", "text").collect().map(r => (r.getLong(0), r.getString(1)))
    val corpus = docs ++ docs.collect {
      case (id, t) if t.trim.split("\\s+").length >= 12 =>
        (id + 1000000L, t.trim.split("\\s+").dropRight(3).mkString(" "))
    }
    def shingles(t: String): Set[String] = {
      val toks = t.trim.toLowerCase.split("\\s+")
      if (toks.length < 3) Set.empty
      else (0 to toks.length - 3).map(i => toks.slice(i, i + 3).mkString(" ")).toSet
    }
    val sh = corpus.map { case (id, t) => (id, shingles(t)) }.filter(_._2.nonEmpty)
    val wantTruth = sh.filter(_._1 < 50).map { case (pid, ps) =>
      val partners = sh.filter { case (oid, os) =>
        oid != pid && {
          val j = (ps & os).size.toDouble / (ps | os).size
          j >= 0.6
        }
      }
      (pid, partners.length.toLong)
    }.filter(_._2 > 0).sortBy(_._1).toSeq
    val got = graft.dedup.Dedup.d40DedupEval(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sortBy(_._1).toSeq
    assert(got.map(t => (t._1, t._2)) == wantTruth)
    assert(got.nonEmpty)
    // found is a subset of truth, and the harness measures something
    // real: at least one panel doc's truncated twin is surfaced
    got.foreach(t => assert(t._3 >= 0 && t._3 <= t._2))
    assert(got.map(_._3).sum > 0, "the LSH tier surfaced nothing — recall 0 everywhere")
  }

  test("s24 streaming pressure equals batch d39 on an AvailableNow pass") {
    import graft.streaming.Streams
    def rows(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sortBy(_._1).toSeq
    val want = rows(graft.text.Corpus.d39ContaminationPressure(spark, sfDir))
    assert(want.nonEmpty)
    assert(rows(Streams.s24StreamPressure(spark, sfDir)) == want)
  }

  test("m09 scene census equals a driver formula walk; cut law holds; stride really gates detection") {
    import graft.multimodal.Multimodal
    val got = Multimodal.m09SceneChange(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
      .sortBy(_._1).toSeq
    val ids = spark.read.parquet(s"$sfDir/documents.parquet")
      .select("doc_id").collect().map(_.getLong(0))
    val want = ids.map { id =>
      val nf = (6 + id % 7).toInt
      val cut = if (id % 4 == 0) Int.MaxValue else (2 + id % 3).toInt
      val sampled = 0 until nf by 3
      def lum(f: Int): Long = (0 until 48).map { p =>
        val sh = if (f >= cut) 128L else 0L
        299L * ((id * 5 + p * 7) % 120 + f % 2 + sh) +
          587L * ((id * 9 + p * 5) % 120 + f % 2 + sh) +
          114L * ((id * 3 + p * 13) % 120 + f % 2 + sh)
      }.sum
      val cuts = sampled.sliding(2).filter(w => w.length == 2 &&
        math.abs(lum(w(1)) - lum(w(0))) > 3072000L).map(_(1)).toSeq
      (id, nf.toLong, sampled.length.toLong, cuts.length.toLong,
        cuts.headOption.map(_.toLong).getOrElse(-1L))
    }.sortBy(_._1).toSeq
    assert(got == want)
    // the cut law: a sampled frame at or after the cut exists → the cut
    // is detected exactly at the first such frame (3·⌈cut/3⌉)
    got.foreach { case (id, nf, _, nCuts, firstCut) =>
      val cut = if (id % 4 == 0) Int.MaxValue else (2 + id % 3).toInt
      val expected = (0 until nf.toInt by 3).find(_ >= cut)
      assert(nCuts == (if (expected.isDefined) 1L else 0L), s"doc $id")
      assert(firstCut == expected.map(_.toLong).getOrElse(-1L), s"doc $id")
    }
    // populations: cuts detected, single-scene clips clean, and the
    // honest stride trade-off visible — a late cut in a short clip
    // falls between samples and is missed
    assert(got.exists(_._4 == 1L))
    assert(got.filter(t => t._1 % 4 == 0).forall(_._4 == 0L))
    assert(got.exists(t => t._1 % 4 != 0 && t._4 == 0L),
      "no missed-late-cut case in the corpus")
  }

  test("q41 attribution equals a driver walk; all three buckets live; gaps inside the hour") {
    val evs = graft.Tables.events(spark, sfDir)
      .select(col("user_id"), col("event_id"), col("event_type"), col("value"),
        expr("unix_micros(ts)").as("ts_us"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getDouble(3), r.getLong(4)))
    val want = evs.groupBy(_._1).toSeq.flatMap { case (_, rows) =>
      val ordered = rows.sortBy(e => (e._5, e._2))
      var lt: Option[(Long, String)] = None
      val out = collection.mutable.ArrayBuffer[(String, Double, Option[Long])]()
      ordered.foreach { e =>
        if (e._3 == "purchase") {
          val attr = lt.filter(t => e._5 - t._1 <= 3600000000L)
          out += ((attr.map(_._2).getOrElse("none"), e._4, attr.map(t => e._5 - t._1)))
        }
        if (e._3 == "click" || e._3 == "view") lt = Some((e._5, e._3))
      }
      out
    }.groupBy(_._1).map { case (t, l) =>
      (t, l.size.toLong, l.map(_._2).sum,
        if (l.exists(_._3.isDefined)) l.flatMap(_._3).sum else -1L)
    }.toSeq.sortBy(_._1)
    val got = graft.queries.Events.q41LastTouchAttribution(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2),
        if (r.isNullAt(3)) -1L else r.getLong(3)))
      .sortBy(_._1).toSeq
    assert(got.map(t => (t._1, t._2, t._4)) == want.map(t => (t._1, t._2, t._4)))
    got.zip(want).foreach { case (g, w) =>
      assert(math.abs(g._3 - w._3) < 1e-6 * math.max(1.0, math.abs(w._3)), s"${g._1} sum_value")
    }
    // all three buckets exist and attributed gaps are inside the hour
    assert(got.map(_._1).toSet == Set("click", "view", "none"))
    got.filter(_._1 != "none").foreach { t =>
      assert(t._4 >= 0 && t._4 <= t._2 * 3600000000L)
    }
  }
}
