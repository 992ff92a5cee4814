package graft.queries

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Round-8 additions: LSH cap behavior under boilerplate skew, the
  * nominal-assembly operator, and empty/edge coverage for the new
  * relief recomputation surface.
  */
class Round10Spec extends SparkSpec {

  /** Synthetic skew corpus: `nFam` documents sharing one long
    * boilerplate template (50 tokens) with a 5-token unique tail —
    * every family pair is a true near-dup and every family doc lands
    * in the same LSH buckets — plus `nSolo` unrelated documents with
    * no near-dup partner. Deterministic (pure function of the counts).
    */
  private def skewCorpus(nFam: Int, nSolo: Int): DataFrame = {
    val fam = spark.range(nFam.toLong).selectExpr(
      "id AS doc_id",
      // 50 shared tokens then 5 unique ones: Jaccard between any two
      // family docs ≈ 48/(48+2·7) ≈ 0.77 on 3-gram shingles — all true
      // near-dups at the 0.6 bar
      "concat(concat_ws(' ', transform(sequence(1, 50), i -> concat('boiler', i))), " +
        " ' ', concat_ws(' ', transform(sequence(1, 5), j -> concat('tail', id, 'x', j)))) AS text")
    val solo = spark.range(nSolo.toLong).selectExpr(
      s"id + 500000 AS doc_id",
      // every token depends on the doc id: no shared shingles at all
      "concat_ws(' ', transform(sequence(1, 40), i -> concat('solo', id, 'w', i))) AS text")
    fam.unionByName(solo)
  }

  test("LSH MaxBucket cap under boilerplate skew: drops only degenerate-bucket recall, at quadratic-cost savings") {
    import graft.dedup.Dedup
    val corpus = skewCorpus(nFam = 150, nSolo = 100)
    val sigs = Dedup.signatureTable(corpus)
    try {
      val capped = Dedup.lshCandidates(sigs).select("doc_a", "doc_b").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      val uncapped = Dedup.lshCandidates(sigs, Int.MaxValue)
        .select("doc_a", "doc_b").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      val famPairs = (for {
        a <- 0L until 150L; b <- (a + 1) until 150L
      } yield (a, b)).toSet

      // ground truth: every family pair is a true near-dup; no solo
      // pair is. Banding is probabilistic — for this geometry a pair
      // agrees on a band iff both docs drew all 4 minima from the
      // shared boilerplate (≈0.57² per band), so P(miss all 16 bands)
      // ≈ 0.2%. Uncapped recall must clear 99%.
      val uncappedFam = uncapped.intersect(famPairs)
      assert(uncappedFam.size >= famPairs.size * 99 / 100,
        s"uncapped LSH recall ${uncappedFam.size}/${famPairs.size} below 99%")
      // the pure-boilerplate bucket in each band holds ~57% of the 150
      // docs (~86 > MaxBucket=64) and is capped; pairs survive only
      // through the smaller mixed buckets. THIS is the recall the cap
      // costs under degenerate skew — measured, not asserted away:
      val cappedFam = capped.intersect(famPairs)
      assert(cappedFam.size < uncappedFam.size,
        "cap dropped nothing under 150-doc boilerplate skew — not exercising the cap")
      info(s"family recall: uncapped ${uncappedFam.size}/${famPairs.size}, " +
        s"capped ${cappedFam.size}/${famPairs.size}; " +
        s"candidate pairs: uncapped ${uncapped.size}, capped ${capped.size}")
      // the cap is SURGICAL: outside the family's degenerate buckets
      // the candidate sets are identical
      assert(capped -- famPairs == uncapped -- famPairs,
        "cap changed candidates outside the degenerate buckets")
      // no false candidates among solo docs either way (distinct tokens
      // ⇒ distinct band signatures, mod-P collisions aside)
      assert(capped.forall { case (a, b) => a < 150L && b < 150L || a >= 500000L == b >= 500000L })
    } finally sigs.unpersist()
  }

  test("d38-style priority survives: template family handled by span/template tier, not LSH") {
    // the documented mitigation for what the cap drops: boilerplate
    // families are exactly what d37_template_mining exists to find —
    // its (template signature → census) pass has no per-pair cost and
    // flags the 150-doc family as ONE template cluster.
    import graft.text.Corpus
    val corpus = skewCorpus(nFam = 150, nSolo = 100)
    val templates = Corpus.boilerplateLines(corpus)
      .where(col("n_docs") >= 100)
    assert(templates.count() >= 1L,
      "template tier failed to surface the boilerplate family the LSH cap dropped")
  }

  test("vector_assemble_nominal: StringIndexer indices follow frequencyDesc with alphabetic ties") {
    val got = graft.ml.ReliefQueries.vectorAssembleNominal(spark, sfDir)
    assert(got.count() > 0)
    // recompute the expected index for o_orderstatus on the same data
    val orders = graft.Tables.orders(spark, sfDir)
    val expIdx = orders.groupBy("o_orderstatus").count()
      .collect().map(r => (r.getString(0), r.getLong(1)))
      .sortBy { case (v, n) => (-n, v) }.map(_._1).zipWithIndex.toMap
    val joined = got.join(orders, "o_orderkey")
      .select(col("o_orderstatus"), col("f0")).collect()
    assert(joined.forall(r => r.getDouble(1) == expIdx(r.getString(0)).toDouble),
      "f0 does not match frequencyDesc StringIndexer semantics")
  }

  test("m12 random-access container: point reads equal m01 on the slice; bytes read ~ slice only") {
    import graft.multimodal.Multimodal
    val got = Multimodal.m12ContainerRandomAccess(spark, sfDir)
      .orderBy("doc_id").collect()
    val exp = Multimodal.m01Multimodal(spark, sfDir)
      .where(col("doc_id") % 7 === 0).orderBy("doc_id").collect()
    assert(got.length == exp.length && got.length > 0)
    got.zip(exp).foreach { case (g, e) => assert(g == e, s"row differs: $g vs $e") }
    // byte economy: the point reads touch the slice's payload bytes
    // (sum of index len over the slice), a small fraction of the
    // packed container — never a full scan
    val idx = spark.read.parquet(
      s"${Multimodal.packedShardDir(spark, sfDir)}/index")
    val total = idx.agg(sum("len")).head().getLong(0)
    val slice = idx.where(col("doc_id") % 7 === 0).agg(sum("len")).head().getLong(0)
    assert(slice * 3 < total, s"slice $slice not a small fraction of $total")
    // the index must resolve every member exactly once, contiguously
    // within each shard (offsets partition the shard's byte range)
    val byShard = idx.collect().groupBy(_.getString(1))
    byShard.values.foreach { rs =>
      val sorted = rs.sortBy(_.getLong(2))
      sorted.sliding(2).foreach {
        case Array(a, b) =>
          assert(a.getLong(2) + a.getLong(3) == b.getLong(2),
            "shard offsets are not contiguous")
        case _ =>
      }
    }
  }

  test("s25 backfill stitch: legs are key-disjoint at the seam and merge to the batch rollup") {
    val legs = graft.streaming.Streams.s25Legs(spark, sfDir).collect()
    val byLeg = legs.groupBy(_.getString(4))
    val backKeys = byLeg.getOrElse("backfill", Array.empty)
      .map(r => (r.getTimestamp(0), r.getString(1))).toSet
    val liveKeys = byLeg.getOrElse("live", Array.empty)
      .map(r => (r.getTimestamp(0), r.getString(1))).toSet
    // exactly-once by PARTITION: the hour-aligned cutover means no
    // (bucket, type) key can come from both legs
    assert(backKeys.intersect(liveKeys).isEmpty,
      s"seam overlap: ${backKeys.intersect(liveKeys).take(3)}")
    assert(backKeys.nonEmpty && liveKeys.nonEmpty,
      "both legs must carry data at this corpus (cutover is the midpoint)")
    // the stitched view equals the pure-batch hourly rollup
    val got = graft.streaming.Streams.s25StreamBackfill(spark, sfDir)
      .collect().map(r => (r.getTimestamp(0), r.getString(1)) ->
        (r.getLong(2), r.getDouble(3))).toMap
    val exp = graft.Tables.events(spark, sfDir)
      .groupBy(date_trunc("hour", col("ts")).as("bucket"), col("event_type"))
      .agg(count(lit(1)).as("n"), sum("value").as("sv"))
      .collect().map(r => (r.getTimestamp(0), r.getString(1)) ->
        (r.getLong(2), r.getDouble(3))).toMap
    assert(got.keySet == exp.keySet)
    got.foreach { case (k, (n, sv)) =>
      assert(n == exp(k)._1, s"$k count differs")
      assert(math.abs(sv - exp(k)._2) <= 1e-6 * math.max(1.0, math.abs(exp(k)._2)))
    }
  }

  test("d41 token-vote quality classifier equals a driver NB walk; all-integer decisions") {
    val docs = graft.Tables.documents(spark, sfDir)
      .select("doc_id", "text").collect()
      .map(r => (r.getLong(0), Option(r.getString(1)).getOrElse("")))
    val toked = docs.map { case (id, text) =>
      (id, text.trim.toLowerCase.split("\\s+").toSeq)
    }
    val jargon = Set("spark", "query", "table", "join")
    def weak(toks: Seq[String]) = {
      val n = toks.length.toLong
      20L * toks.count(jargon).toLong >= 3L * n && n >= 20
    }
    def bitLen(x: Long) = java.lang.Long.toBinaryString(x).length.toLong
    val train = toked.filter(_._1 % 2 == 0)
    val vocab = train.flatMap { case (id, ts) => ts.map(t => (t, weak(ts))) }
      .groupBy(_._1).map { case (t, vs) =>
        t -> (vs.count(_._2).toLong, vs.count(!_._2).toLong) }
    val nGood = vocab.values.map(_._1).sum
    val nBad = vocab.values.map(_._2).sum
    val v = vocab.size.toLong
    val exp = toked.filter(_._1 % 2 == 1).map { case (id, ts) =>
      val wk = weak(ts)
      val score = ts.map { t =>
        val (cg, cb) = vocab.getOrElse(t, (0L, 0L))
        bitLen((cg + 1) * (nBad + v)) - bitLen((cb + 1) * (nGood + v))
      }.sum
      (wk, score > 0, score)
    }.groupBy(t => (t._1, t._2)).map { case (k, rows) =>
      k -> (rows.size.toLong, rows.map(_._3).sum) }
    val got = graft.text.Corpus.d41QualityVotes(spark, sfDir).collect()
      .map(r => (r.getBoolean(0), r.getBoolean(1)) ->
        (r.getLong(2), r.getLong(3))).toMap
    assert(got == exp, s"census differs:\n got $got\n exp $exp")
    // the classifier must actually learn the weak signal: agreement on
    // the scored half beats coin flip
    val agree = exp.collect { case ((w, p), (n, _)) if w == p => n }.sum
    val total = exp.values.map(_._1).sum
    assert(agree * 2 > total, s"classifier no better than chance: $agree/$total")
  }

  test("w23 orphan cleanup: sweeps exactly the unreferenced files, readers untouched") {
    import org.apache.hadoop.fs.{Path => HPath}
    val out = graft.sources.Sinks.w23OrphanCleanup(spark, sfDir)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // after the sweep the filesystem holds EXACTLY the referenced
    // files: no unreferenced part file, no _tmp_ upload anywhere
    val root = graft.sources.Sinks.stage(spark, sfDir, "orphans")
    val fs = new HPath(root).getFileSystem(spark.sessionState.newHadoopConf())
    val listed = fs.globStatus(new HPath(s"$root/data/*/*")).map(_.getPath.getName)
      .filterNot(_.startsWith("."))
    assert(!listed.exists(_.startsWith("_tmp_")), "stray _tmp_ upload survived the sweep")
    val live = fs.globStatus(new HPath(s"$root/manifest-*"))
      .map(_.getPath.getName.stripPrefix("manifest-").toInt).toSeq
      .flatMap(n => graft.sources.Sinks.manifestFilesAt(spark, root, n))
      .map(p => new HPath(p).getName).toSet
    val strayParts = listed.filter(n => n.startsWith("part-") && !live.contains(n))
    assert(strayParts.isEmpty, s"unreferenced parts survived: ${strayParts.mkString(",")}")
    // the published read still serves snapshot 2 exactly
    val expect = graft.Tables.documents(spark, sfDir)
      .where(col("doc_id") % 3 === 0).count()
    assert(out("n_rows_after") == expect)
    assert(out("n_orphans_removed") >= 1L) // at least the planted _tmp_
  }

  test("f06 ANOVA F equals a driver moment walk; ranking strict") {
    val rows = graft.Tables.embeddings(spark, sfDir)
      .select("label", "embedding").collect()
      .map(r => (r.getInt(0), r.getSeq[Float](1).map(_.toDouble).toArray))
    val dims = rows.head._2.length
    val exp = (0 until dims).map { d =>
      val byClass = rows.groupBy(_._1).values.map(_.map(_._2(d)))
      val n = rows.length.toDouble; val k = byClass.size.toDouble
      val s = rows.map(_._2(d)).sum
      val sb = byClass.map(g => math.pow(g.sum, 2) / g.length).sum
      val q = rows.map(v => v._2(d) * v._2(d)).sum
      val ssb = sb - s * s / n; val ssw = q - sb
      d.toLong -> (ssb / (k - 1)) / (ssw / (n - k))
    }.sortBy { case (d, f) => (-f, d) }.take(10)
    val got = graft.ml.ReliefQueries.f06AnovaF(spark, sfDir)
      .orderBy("rnk").collect().map(r => (r.getLong(0), r.getDouble(1)))
    assert(got.map(_._1).toSeq == exp.map(_._1).toSeq,
      s"F ranking differs: got ${got.map(_._1).mkString(",")} want ${exp.map(_._1).mkString(",")}")
    got.zip(exp).foreach { case ((_, gf), (_, ef)) =>
      assert(math.abs(gf - ef) <= 1e-9 * math.max(1.0, math.abs(ef))) }
  }

  test("f07 info gain equals a driver entropy walk; IG within [0, log2(classes)]") {
    val rows = graft.Tables.embeddings(spark, sfDir)
      .select("label", "embedding").collect()
      .map(r => (r.getInt(0), r.getSeq[Float](1).map(_.toDouble).toArray))
    val dims = rows.head._2.length
    def log2(x: Double) = math.log(x) / math.log(2.0)
    val exp = (0 until dims).map { d =>
      val cells = rows.groupBy(r => (r._2(d) > 0, r._1)).map { case (k, v) => k -> v.length.toDouble }
      val n = rows.length.toDouble
      val nb = cells.groupBy(_._1._1).map { case (b, m) => b -> m.values.sum }
      val ny = cells.groupBy(_._1._2).map { case (y, m) => y -> m.values.sum }
      val ig = cells.map { case ((b, y), c) => (c / n) * log2(c * n / (nb(b) * ny(y))) }.sum
      d.toLong -> ig
    }.sortBy { case (d, g) => (-g, d) }.take(10)
    val got = graft.ml.ReliefQueries.f07InfoGain(spark, sfDir)
      .orderBy("rnk").collect().map(r => (r.getLong(0), r.getDouble(1)))
    assert(got.map(_._1).toSeq == exp.map(_._1).toSeq,
      s"IG ranking differs: got ${got.map(_._1).mkString(",")} want ${exp.map(_._1).mkString(",")}")
    val nClasses = rows.map(_._1).distinct.length
    got.foreach { case (_, ig) =>
      assert(ig >= -1e-12 && ig <= log2(nClasses.toDouble) + 1e-12) }
  }

  test("relief instanceIdCol fit: partition-invariant and id-keyed") {
    import graft.ml.ReliefFRSelector
    val base = graft.ml.ReliefQueries.assembled(spark, sfDir)
    def fit(df: DataFrame) = new ReliefFRSelector()
      .setInputCol("features").setLabelCol("label").setOutputCol("out")
      .setInstanceIdCol("vec_id")
      .setNumTopFeatures(10).setNumNeighbors(3)
      .setEstimationRatio(0.25).setBatchSize(0.5).setSeed(20260812L)
      .fit(df)
    val m1 = fit(base)
    val m2 = fit(base.repartition(7))
    assert(m1.stdSelection.toSeq == m2.stdSelection.toSeq,
      "idCol fit not partition-invariant")
    // renumbering the ids changes the sample ⇒ (almost surely) the fit:
    // identity really is keyed off the id column, not content
    val m3 = fit(base.withColumn("vec_id", col("vec_id") + lit(1L)))
    assert(m3.featureWeights.toSeq != m1.featureWeights.toSeq,
      "id renumbering did not affect the id-keyed sample (suspicious)")
  }
}
