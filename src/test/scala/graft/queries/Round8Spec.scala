package graft.queries

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Round-7 second-tranche operators: d33 fuzzy decontamination, d34
  * sketch-guided heavy hitters, e16 range search, s18 streaming domain
  * cap, w19 snapshot rollback, q39 transition matrix.
  */
class Round8Spec extends SparkSpec {

  test("d33 flags every long planted twin against its bench original at containment 1.0") {
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val P = 1000000007L
    def isBench(id: Long) = ((id % P) * 777000037L % P + 4242L) % P < 20000000L
    // bench docs long enough that the truncated twin's Jaccard vs its
    // original makes an LSH band collision overwhelmingly certain
    val longBench = docs.filter { case (id, t) =>
      isBench(id) && t.trim.split("\\s+").length >= 24
    }.map(_._1).toSet
    assert(longBench.nonEmpty, "testdata has no long bench docs")

    val got = graft.text.Corpus.d33FuzzyDecontam(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    for (b <- longBench) {
      val hit = got.find(g => g._1 == b + 1000000L && g._2 == b)
      assert(hit.isDefined, s"planted twin of bench doc $b not flagged")
      // the twin's shingles are a subset of the original's: exactly 1.0
      assert(hit.get._3 == 1.0, s"twin of $b contamination ${hit.get._3} != 1.0")
    }
    // every flagged row satisfies the threshold
    assert(got.forall(_._3 >= 0.8))
  }

  test("d34 equals the naive exact heavy-hitter groupBy; sketch prunes without false negatives") {
    import graft.text.Text
    val naive = spark.read.parquet(s"$sfDir/documents.parquet")
      .select(explode(Text.wsTokens(lower(col("text")))).as("term"))
    val n = naive.count()
    val t = n / 500L + 1L
    val want = naive.groupBy("term").agg(count(lit(1)).as("freq"))
      .where(col("freq") >= t)
      .collect().map(r => (r.getString(0), r.getLong(1))).sortBy(_._1).toSeq
    assert(want.nonEmpty, "no heavy hitters in testdata — threshold too high")
    val got = Text.d34HeavyHitters(spark, sfDir)
      .collect().map(r => (r.getString(0), r.getLong(1))).sortBy(_._1).toSeq
    assert(got == want)

    // the CMS over-estimate guarantee, observed live: every true heavy
    // hitter survives the candidate filter, and the filter really
    // prunes the vocabulary (strictly fewer candidate terms than vocab)
    val (cand, t2) = Text.d34Candidates(spark, sfDir)
    assert(t2 == t)
    val candTerms = cand.select("term").distinct().count()
    val vocab = naive.select("term").distinct().count()
    assert(candTerms < vocab, s"no pruning: $candTerms candidates of $vocab vocab")
    assert(candTerms >= want.length.toLong)
    // candidate probe is a literal lookup in the scan — no join anywhere
    // before the exact-count aggregation
    val plan = cand.queryExecution.executedPlan.toString
    assert(!plan.contains("Join"), plan.take(2000))
  }

  test("w19 rollback is metadata-only: live == snapshot 1, history intact, zero new data files") {
    import graft.sources.Sinks
    import graft.Tables
    import org.apache.hadoop.fs.{Path => HPath}
    // the operator end-to-end: after the bad snapshot 2 and the
    // rollback commit, the live read rolls up to the full corpus
    val live = Sinks.w19SnapshotRollback(spark, sfDir)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).sortBy(_._1).toSeq
    val want = spark.read.parquet(s"$sfDir/documents.parquet")
      .groupBy("lang").agg(count(lit(1)).as("n"), sum("n_chars").as("s"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).sortBy(_._1).toSeq
    assert(live == want)

    // the primitives on a private root: manifest history and file reuse
    val root = "/tmp/graft_w19_spec"
    val fs = new HPath(root).getFileSystem(spark.sessionState.newHadoopConf())
    fs.delete(new HPath(root), true)
    val docs = Tables.documents(spark, sfDir)
    Sinks.publishSnapshot(spark, docs, root, 1)
    Sinks.publishSnapshot(spark, docs.where(col("doc_id") % 3 === 0), root, 2)
    Sinks.rollbackTo(spark, root, asOf = 1, next = 3)
    val manifests = fs.globStatus(new HPath(s"$root/manifest-*")).map(_.getPath.getName).sorted
    assert(manifests.toSeq == Seq("manifest-1", "manifest-2", "manifest-3"))
    // manifest-3's list is byte-identical to manifest-1's and points
    // only at snap1's directory: the rollback wrote no data of its own
    assert(Sinks.manifestFilesAt(spark, root, 3) == Sinks.manifestFilesAt(spark, root, 1))
    assert(Sinks.manifestFilesAt(spark, root, 3).forall(_.contains("/data/snap1/")))
    // forensics: the bad snapshot is still readable as-of-2
    val bad = Sinks.readPublished(spark, sfDir, root, asOf = Some(2)).count()
    val full = Sinks.readPublished(spark, sfDir, root, asOf = Some(1)).count()
    assert(bad < full && bad > 0)
    assert(Sinks.readPublished(spark, sfDir, root).count() == full)
  }

  test("s18 streaming cap equals d27 in one batch AND on an id-ordered two-batch split") {
    import graft.streaming.Streams
    import java.nio.file.{Files, Paths}
    def rows(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getLong(3), r.getLong(4)))
      .sortBy(_._1).toSeq
    val want = rows(graft.text.Corpus.d27DomainCap(spark, sfDir))
    assert(want.nonEmpty)
    assert(rows(Streams.s18StreamDomainCap(spark, sfDir)) == want)

    // two micro-batches split at the median id, low ids first: ordered
    // arrival must reproduce the batch rule at any batch size
    val src = spark.read.parquet(s"$sfDir/documents.parquet")
    val mid = src.agg(expr("percentile_approx(doc_id, 0.5)")).head().getLong(0)
    val stage = "/tmp/graft_stream_s18_split"
    val d = Paths.get(stage)
    if (Files.exists(d))
      Files.walk(d).sorted(java.util.Comparator.reverseOrder())
        .forEach(p => Files.delete(p))
    Files.createDirectories(d)
    src.where(col("doc_id") <= mid).coalesce(1).write.mode("overwrite").parquet(s"$stage/p1")
    Thread.sleep(1100) // distinct mtimes: the file source orders batches by mtime
    src.where(col("doc_id") > mid).coalesce(1).write.mode("overwrite").parquet(s"$stage/p2")
    val stream = spark.readStream.schema(src.schema)
      .option("maxFilesPerTrigger", "1").parquet(s"$stage/p*")
    assert(rows(Streams.runDomainCap(stream)) == want)
  }

  test("e16 range search finds every planted twin inside the radius; no cartesian anywhere") {
    import graft.sim.Sim
    val out = Sim.e16RangeSearch(spark, sfDir)
    val rows = out.collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(rows.nonEmpty)
    // radius semantics: every returned neighbor is inside the radius
    assert(rows.forall(_._3 >= 0.99))
    // recall on the planted twins: each of the 20 queries' perturbed
    // copy sits at cosine ≈ 1 and must be found through the multi-probe
    val nQueries = spark.read.parquet(s"$sfDir/embeddings.parquet")
      .where(col("vec_id") < 20).count()
    for (q <- 0L until nQueries) {
      val twin = rows.find(r => r._1 == q && r._2 == q + 100000L)
      assert(twin.isDefined, s"query $q's planted twin not inside the radius result")
    }
    val plan = out.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"), plan.take(2000))
    assert(plan.contains("BroadcastHashJoin"), plan.take(2000))
  }

  test("q39 transition matrix equals a driver-side walk; rows are conditional distributions") {
    val evs = graft.Tables.events(spark, sfDir)
      .select(col("user_id"), col("event_type"), col("event_id"), expr("unix_micros(ts)").as("ts_us"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
    val want = evs.groupBy(_._1).toSeq.flatMap { case (_, rows) =>
      val ordered = rows.sortBy(e => (e._4, e._3)).map(_._2)
      ordered.zip(ordered.drop(1))
    }.groupBy(identity).map { case ((a, b), l) => (a, b, l.size.toLong) }.toSeq
    val totals = want.groupBy(_._1).map { case (a, l) => a -> l.map(_._3).sum }
    val wantFull = want.map { case (a, b, n) => (a, b, n, n.toDouble / totals(a)) }
      .sortBy(t => (t._1, t._2))
    val got = graft.queries.Events.q39EventTransitions(spark, sfDir)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getDouble(3)))
      .sortBy(t => (t._1, t._2)).toSeq
    assert(got == wantFull)
    assert(got.nonEmpty)
    // each prev-type row of the matrix is a probability distribution
    got.groupBy(_._1).values.foreach { row =>
      assert(math.abs(row.map(_._4).sum - 1.0) < 1e-9)
    }
  }

  test("s19 streaming trending equals the batch hourly top-3; every window cut at 3") {
    import graft.streaming.Streams
    val got = Streams.s19StreamTrending(spark, sfDir).collect()
      .map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2), r.getLong(3)))
      .sortBy(t => (t._1.getTime, t._4)).toSeq
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("bucket").orderBy(col("n_events").desc, col("event_type"))
    val want = graft.Tables.events(spark, sfDir)
      .groupBy(date_trunc("hour", col("ts")).as("bucket"), col("event_type"))
      .agg(count(lit(1)).as("n_events"))
      .withColumn("rnk", row_number().over(w).cast("long"))
      .where(col("rnk") <= 3)
      .collect().map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2), r.getLong(3)))
      .sortBy(t => (t._1.getTime, t._4)).toSeq
    assert(got == want)
    assert(got.nonEmpty)
    assert(got.groupBy(_._1).values.forall(_.length <= 3))
  }

  test("w20 merged per-file sketches equal a direct whole-column sketch; sidecar has one row per (file, column)") {
    import graft.sources.Sinks
    val out = Sinks.w20AnalyzeStats(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).sortBy(_._1).toSeq
    assert(out.map(_._1) == Seq("doc_id", "lang", "source"))
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val nRows = docs.count()
    assert(out.forall(_._2 == nRows))
    // lang/source sit below K=64 distinct → the "estimate" is EXACT
    val langs = docs.select("lang").distinct().count()
    val sources = docs.select("source").distinct().count()
    assert(out.find(_._1 == "lang").get._3 == langs)
    assert(out.find(_._1 == "source").get._3 == sources)
    // doc_id saturates the estimator: within the ~1/sqrt(K) envelope
    val idEst = out.find(_._1 == "doc_id").get._3.toDouble
    assert(math.abs(idEst - nRows) / nRows < 0.5, s"doc_id NDV est $idEst vs $nRows")

    // the sidecar really carries per-(file, column) rows, and the merge
    // reads ONLY the sidecar: re-merging without any data scan agrees
    val root = s"/tmp/graft_sink_analyze_${Integer.toHexString(sfDir.hashCode)}_" +
      Integer.toHexString(spark.sparkContext.applicationId.hashCode)
    val st = spark.read.parquet(Sinks.statsSidecar(root, 1))
    val nFiles = Sinks.manifestFilesAt(spark, root, 1).size
    assert(st.count() == nFiles.toLong * 3)
    val remerged = Sinks.statsMerge(spark, root, 1).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).sortBy(_._1).toSeq
    assert(remerged == out)
  }

  test("m08 quality census equals a driver formula walk; every gate has a real population") {
    import graft.multimodal.Multimodal
    val got = Multimodal.m08ImageQualityGate(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5))).sortBy(_._1).toSeq
    // drive the whole pipeline in plain Scala from the formulas
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .select("doc_id", "source").collect().map(r => (r.getLong(0), r.getString(1)))
    val want = docs.map { case (id, src) =>
      val w = 8 + (id % 6).toInt * 8; val h = 8 + (id % 4).toInt * 8
      val lift = (id % 12) * 12
      val px = w.toLong * h
      var lum = 0L
      for (p <- 0L until px)
        lum += 299L * ((id * 5 + p * 7) % 120 + lift) +
          587L * ((id * 9 + p * 5) % 120 + lift) +
          114L * ((id * 3 + p * 13) % 120 + lift)
      val small = px < 256L
      val stretched = w > 3 * h || h > 3 * w
      val badlum = lum < px * 80000L || lum > px * 180000L
      (src, small, stretched, badlum)
    }.groupBy(_._1).map { case (src, l) =>
      (src, l.length.toLong, l.count(_._2).toLong, l.count(_._3).toLong,
        l.count(_._4).toLong, l.count(t => !t._2 && !t._3 && !t._4).toLong)
    }.toSeq.sortBy(_._1)
    assert(got == want)
    // each gate rejects something, and the funnel still admits: the
    // thresholds sit inside the synthesized populations
    assert(got.map(_._3).sum > 0, "resolution gate never fired")
    assert(got.map(_._4).sum > 0, "aspect gate never fired")
    assert(got.map(_._5).sum > 0, "exposure gate never fired")
    assert(got.map(_._6).sum > 0, "nothing admitted")
  }

  test("d35 tier census: all three tiers populated, rates honored, short docs in tier 0") {
    val got = graft.text.Corpus.d35QualityMix(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .sortBy(_._1).toSeq
    // the 0.55/0.35 cuts sit inside sf0.001's coverage distribution:
    // every tier has documents, and every tier sampled something
    assert(got.map(_._1) == Seq(0L, 1L, 2L), got.toString)
    assert(got.forall(t => t._2 > 0 && t._3 > 0))
    // rates: tier 2 keeps everything; tier 0 keeps well under half
    val t2 = got.find(_._1 == 2L).get
    assert(t2._3 == t2._2, "high tier must keep every doc")
    val t0 = got.find(_._1 == 0L).get
    assert(t0._3 * 2 < t0._2, s"low tier kept ${t0._3} of ${t0._2}")
    // census covers exactly the crawl (non-bench) side
    val P = 1000000007L
    val nCrawl = spark.read.parquet(s"$sfDir/documents.parquet")
      .where(!(((col("doc_id") % P) * 777000037L % P + 4242L) % P < 20000000L))
      .count()
    assert(got.map(_._2).sum == nCrawl)
  }

  test("d33 candidate plan has no cartesian product and broadcasts the bench side") {
    val (pipeline, sigB, sigC) = graft.text.Corpus.d33Pipeline(spark, sfDir)
    try {
      val plan = pipeline.queryExecution.executedPlan.toString
      assert(!plan.contains("CartesianProduct"), plan.take(2000))
      assert(!plan.contains("BroadcastNestedLoopJoin"), plan.take(2000))
      assert(plan.contains("BroadcastHashJoin"), plan.take(2000))
    } finally { sigB.unpersist(); sigC.unpersist() }
  }
}
