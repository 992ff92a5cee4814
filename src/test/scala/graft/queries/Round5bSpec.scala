package graft.queries

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

import graft.SparkSpec

/** Round-5 additions: shard packing (d21), corpus profile (d22), and
  * the trailing time-RANGE window (q32).
  */
class Round5bSpec extends SparkSpec {

  test("d21 two-level prefix sum equals the naive global-window packing") {
    import spark.implicits._
    val got = graft.text.Pack.d21PackShards(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .sortBy(_._1).toSeq
    // naive semantics: one global cumulative window (fine on a spec
    // corpus; the operator exists because this plans a single-partition
    // sort at scale)
    val naiveW = Window.orderBy("doc_id").rowsBetween(Window.unboundedPreceding, -1)
    val naive = graft.Tables.documents(spark, sfDir)
      .select($"doc_id", size(graft.text.Text.wsTokens($"text")).cast("long").as("n_tokens"))
      .withColumn("start_token", coalesce(sum("n_tokens").over(naiveW), lit(0L)))
      .select($"doc_id", $"n_tokens", $"start_token", expr("start_token div 2000").as("shard_id"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .sortBy(_._1).toSeq
    assert(got.nonEmpty)
    assert(got == naive)
    // shard assignment is monotone in the order key and starts at 0
    assert(got.map(_._4) == got.map(_._4).sorted)
    assert(got.head._3 == 0L)
  }

  test("d21 packing is invariant to the prefix-sum bucket width (the decomposition knob)") {
    def run(): Seq[(Long, Long, Long, Long)] =
      graft.text.Pack.d21PackShards(spark, sfDir)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
        .sortBy(_._1).toSeq
    val default = run()
    for (w <- Seq("8", "1024")) {
      spark.conf.set("spark.graft.pack.bucketWidth", w)
      try assert(run() == default, s"bucketWidth=$w changed the packing")
      finally spark.conf.unset("spark.graft.pack.bucketWidth")
    }
  }

  test("d21 plan: the per-document window is bucket-partitioned (no global sort of the corpus)") {
    val plan = graft.text.Pack.d21PackShards(spark, sfDir)
      .queryExecution.executedPlan.toString
    // the only windows over document rows partition by the prefix-sum
    // bucket; the global-ordered window runs on the tiny bucket
    // aggregate after a HashAggregate, never on the corpus
    assert(plan.contains("hashpartitioning(bucket"), plan.take(2000))
  }

  test("d22 corpus profile: shares sum to 1 per language, counts cover the corpus") {
    val rows = graft.text.Text.d22CorpusProfile(spark, sfDir).collect()
    assert(rows.nonEmpty)
    val total = rows.map(_.getLong(2)).sum
    assert(total == graft.Tables.documents(spark, sfDir).count())
    rows.groupBy(_.getString(0)).foreach { case (lang, rs) =>
      val share = rs.map(_.getDouble(4)).sum
      assert(math.abs(share - 1.0) < 1e-12, s"lang=$lang share=$share")
    }
    // buckets are clamped to [0, 11]
    assert(rows.forall(r => r.getLong(1) >= 0 && r.getLong(1) <= 11))
  }

  test("s09 streaming decontamination reproduces the d14 batch result") {
    def rows(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
      df.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // one AvailableNow pass over the document stream must flag exactly
    // the docs the nightly batch pass flags (both may be empty on a
    // word-soup spec corpus — the 5-gram machinery is pinned below)
    assert(rows(graft.streaming.Streams.s09StreamDecontam(spark, sfDir)) ==
      rows(graft.text.Corpus.d14Decontaminate(spark, sfDir)))
  }

  test("the shared 5-gram projection explodes distinct sliding grams") {
    import spark.implicits._
    val docs = Seq(
      (1L, "a b c d e f"),      // two sliding 5-grams
      (2L, "a b c d"),          // under 5 tokens -> excluded
      (3L, "x x x x x x")       // repeated gram deduped per doc
    ).toDF("doc_id", "text")
    val grams = graft.text.Corpus.fiveGrams(docs)
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(grams == Set(
      (1L, "a b c d e"), (1L, "b c d e f"),
      (3L, "x x x x x")))
  }

  test("m02 binaryFile-directory ingestion decodes to exactly m01's feature table") {
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3),
        (4 until 12).map(r.getDouble).toSeq)).sortBy(_._1).toSeq
    val fromColumn = rows(graft.multimodal.Multimodal.m01Multimodal(spark, sfDir))
    val fromFiles  = rows(graft.multimodal.Multimodal.m02BinarySource(spark, sfDir))
    assert(fromFiles.nonEmpty)
    assert(fromFiles == fromColumn)
    // staging is idempotent: a second serve reuses the staged directory
    assert(rows(graft.multimodal.Multimodal.m02BinarySource(spark, sfDir)) == fromColumn)
  }

  test("d23 survivors agree with d11's clusters and full docs beat their truncated twins") {
    val clusters = graft.dedup.Dedup.d11DupClusters(spark, sfDir)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val survivors = graft.dedup.Dedup.d23ClusterSurvivors(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(survivors.nonEmpty)
    // same clusters, same member counts
    assert(survivors.map(s => s._1 -> s._2).toMap == clusters)
    // the synthetic near-dup corpus pairs every truncated twin
    // (doc_id >= 1e6) with its strictly-longer base document, so a
    // truncated twin must never win survivorship
    assert(survivors.forall(_._3 < 1000000L), survivors.filter(_._3 >= 1000000L).take(3).toSeq)
    assert(survivors.forall(_._4 > 0L))
  }

  test("s10 streaming ANN serving returns exactly e02's results") {
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
        .sortBy(t => (t._1, t._2)).toSeq
    val batch  = rows(graft.sim.Sim.e02AnnLsh(spark, sfDir))
    val stream = rows(graft.streaming.Streams.s10StreamAnnServe(spark, sfDir))
    assert(stream.nonEmpty)
    assert(stream == batch)
  }

  test("q33 funnel matches a driver-side brute-force stage chain") {
    import spark.implicits._
    val ev = graft.Tables.events(spark, sfDir)
      .select($"user_id", $"event_type", unix_micros($"ts").as("ts_us"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    val byUser = ev.groupBy(_._1)
    val stages = byUser.values.flatMap { rows =>
      val v = rows.collect { case (_, "view", t) => t }.minOption
      val c = v.flatMap(tv => rows.collect { case (_, "click", t) if t > tv => t }.minOption)
      val p = c.flatMap(tc => rows.collect { case (_, "purchase", t) if t > tc => t }.minOption)
      v.map(tv => (tv, c, p))
    }.toSeq
    val got = Events.q33Funnel(spark, sfDir).head()
    assert(got.getLong(0) == stages.size)
    assert(got.getLong(1) == stages.count(_._2.isDefined))
    assert(got.getLong(2) == stages.count(_._3.isDefined))
    val gaps1 = stages.collect { case (tv, Some(tc), _) => tc - tv }
    assert(math.abs(got.getDouble(3) - gaps1.sum.toDouble / gaps1.size) < 1e-9)
    // ordering constraint is live: the funnel must be monotone
    assert(got.getLong(0) >= got.getLong(1) && got.getLong(1) >= got.getLong(2))
  }

  test("d24 rarity statistics match a driver-side document-frequency count") {
    val docs = graft.Tables.documents(spark, sfDir)
      .selectExpr("doc_id", "coalesce(text, '') AS text")
      .collect().map(r => (r.getLong(0), r.getString(1)))
    val termsOf = (t: String) => t.trim.toLowerCase.split("\\s+").distinct.toSeq
    val df = docs.flatMap(d => termsOf(d._2)).groupBy(identity).view.mapValues(_.size.toLong).toMap
    val got = graft.text.Text.d24DocRarity(spark, sfDir)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    assert(got.size == docs.length)
    docs.foreach { case (id, text) =>
      val ts = termsOf(text).map(df)
      val (n, mn, mean) = got(id)
      assert(n == ts.size && mn == ts.min, s"doc $id")
      assert(math.abs(mean - ts.sum.toDouble / ts.size) < 1e-12, s"doc $id")
    }
  }

  test("e07 PQ-ADC serves ranked exact-cosine top-k with honest recall vs e01") {
    def byQuery(df: org.apache.spark.sql.DataFrame): Map[Long, Seq[(Long, Double)]] =
      df.collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
        .groupBy(_._1).view.mapValues(_.map(t => (t._2, t._3)).toSeq).toMap
    val exact = byQuery(graft.sim.Sim.e01KnnCosine(spark, sfDir))
    val pq    = byQuery(graft.sim.Sim.e07AnnPq(spark, sfDir))
    assert(pq.nonEmpty && pq.keySet == exact.keySet)
    // reranked output: exact cosines, 10 per query, properly ordered
    pq.values.foreach { ns =>
      assert(ns.size == 10)
      val cos = ns.sortBy(t => (-t._2, t._1)).map(_._2)
      assert(cos == cos.sorted.reverse)
    }
    // recall@10 vs brute force: deterministic for this data; the
    // PqCand-candidate ADC cut over the PqM 16-entry codebooks must
    // find most of the true neighborhood
    val recalls = exact.map { case (q, ns) =>
      val truth = ns.map(_._1).toSet
      pq(q).map(_._1).count(truth) / 10.0
    }
    val mean = recalls.sum / recalls.size
    assert(mean >= 0.5, s"mean recall@10 = $mean")
  }

  test("s11 streaming sampler selects exactly the d13 batch sample") {
    def rows(df: org.apache.spark.sql.DataFrame): Set[(String, Long)] =
      df.collect().map(r => (r.getString(0), r.getLong(1))).toSet
    val batch  = rows(graft.text.Text.d13StratifiedSample(spark, sfDir))
    val stream = rows(graft.streaming.Streams.s11StreamSampler(spark, sfDir))
    assert(stream.nonEmpty)
    assert(stream == batch)
  }

  test("d25 corpus diff classifies every document into exactly one bucket") {
    import spark.implicits._
    val ids = graft.Tables.documents(spark, sfDir).select($"doc_id").as[Long].collect()
    val got = graft.text.Corpus.d25CorpusDiff(spark, sfDir).collect()
      .map(r => (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    val (added, removed, changed, unchanged) =
      (got.map(_._1).sum, got.map(_._2).sum, got.map(_._3).sum, got.map(_._4).sum)
    // derived versions: old = id % 7 != 0; new = all, every 11th revised
    assert(added == ids.count(_ % 7 == 0))
    assert(removed == 0L) // old is a subset of new by id
    assert(changed == ids.count(id => id % 7 != 0 && id % 11 == 0))
    assert(unchanged == ids.count(id => id % 7 != 0 && id % 11 != 0))
    assert(added + changed + unchanged == ids.length)
  }

  test("q34 retention matches a driver-side day/user walk") {
    import spark.implicits._
    val dayUs = 86400L * 1000 * 1000
    val act = graft.Tables.events(spark, sfDir)
      .select(unix_micros(date_trunc("day", $"ts")).as("d"), $"user_id")
      .distinct().collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val expected = act.groupBy(_._1).map { case (d, rows) =>
      d -> (rows.size.toLong, rows.count { case (_, u) => act.contains((d + dayUs, u)) }.toLong)
    }
    val got = Events.q34Retention(spark, sfDir).select(
        unix_micros($"day"), $"n_active", $"n_retained_next_day")
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(got.nonEmpty)
    assert(got == expected)
  }

  test("w07 mergeSchema read reconstructs the generation split exactly") {
    import spark.implicits._
    val docs = graft.Tables.documents(spark, sfDir)
      .select($"lang", $"doc_id", $"n_chars")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val got = graft.sources.Sinks.w07SchemaEvolution(spark, sfDir).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    docs.groupBy(_._1).foreach { case (lang, rows) =>
      val (n, g1, g2) = got(lang)
      assert(n == rows.size)
      assert(g1 == rows.count(_._2 % 2 == 0))
      assert(g2 == rows.count(_._2 % 2 != 0))
    }
  }

  test("q33's repeated stage aggregate is deduplicated at execution (ReusedExchange)") {
    // the funnel references the first-view aggregate twice (as the
    // click stage's filter and in the final rollup); AQE must reuse
    // the exchange rather than recompute it — at corpus scale a
    // regression here silently doubles a whole stage
    val df = Events.q33Funnel(spark, sfDir)
    df.collect()
    assert(df.queryExecution.executedPlan.toString.contains("ReusedExchange"))
  }

  test("q32 trailing window matches a brute-force self-join on a sample") {
    import spark.implicits._
    val got = Events.q32TrailingWindow(spark, sfDir)
      .collect().map(r => (r.getLong(0), (r.getLong(3), r.getLong(4)))).toMap
    // brute force: for each event, count/sum same-user events in
    // [ts-1h, ts] via an explicit range self-join
    val ev = graft.Tables.events(spark, sfDir)
      .select($"event_id", $"user_id", unix_micros($"ts").as("ts_us"),
        expr("cast(round(value * 1000) as bigint)").as("v_mil"))
    val brute = ev.as("a").join(ev.as("b"),
        $"a.user_id" === $"b.user_id" &&
          $"b.ts_us" >= $"a.ts_us" - lit(3600L * 1000 * 1000) &&
          $"b.ts_us" <= $"a.ts_us")
      .groupBy($"a.event_id")
      .agg(count(lit(1)).as("n"), sum($"b.v_mil").as("s"))
      .collect().map(r => (r.getLong(0), (r.getLong(1), r.getLong(2)))).toMap
    assert(got.nonEmpty)
    assert(got == brute)
  }
}
