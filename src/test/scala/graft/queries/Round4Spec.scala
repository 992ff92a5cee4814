package graft.queries

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Round-4 operators: the curation funnel (d18), its streaming
  * ingestion gate (s07), and ntile decile segmentation (q31).
  */
class Round4Spec extends SparkSpec {

  test("d18 funnel counts are internally consistent and agree with the source operators") {
    import spark.implicits._
    val f = graft.text.Corpus.d18CurationFunnel(spark, sfDir).collect()
    assert(f.nonEmpty)
    f.foreach { r =>
      val n = r.getAs[Long]("n_docs")
      val clean = r.getAs[Long]("n_clean")
      for (g <- Seq("n_pass_len", "n_pass_stop", "n_pass_upper", "n_pass_rep", "n_pass_pii")) {
        val v = r.getAs[Long](g)
        assert(v <= n && v >= clean, s"$g=$v outside [clean=$clean, n=$n]")
      }
    }
    // the PII gate must agree with d16's counts exactly
    val piiClean = graft.text.Corpus.d16PiiScrub(spark, sfDir)
      .where($"n_emails" + $"n_ips" + $"n_phones" === 0L).count()
    assert(f.map(_.getAs[Long]("n_pass_pii")).sum == piiClean)
    // and the funnel covers every document exactly once
    assert(f.map(_.getAs[Long]("n_docs")).sum ==
      graft.Tables.documents(spark, sfDir).count())
  }

  test("s07 streaming gate equals the batch scalar-gate formulation") {
    val stream = graft.streaming.Streams.s07StreamQualityGate(spark, sfDir)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
      .sortBy(_._1).toSeq
    assert(stream.nonEmpty)
    // batch formulation of the same gates over the same table
    import graft.text.{Corpus, Text}
    import spark.implicits._
    val t = col("text")
    val toks = Text.wsTokens(lower(t))
    val batch = graft.Tables.documents(spark, sfDir)
      .select(col("source"),
        (size(toks).cast("long").between(50L, 100000L) &&
          (size(filter(toks, tok => tok.isin(Text.StopEn: _*))).cast("double") /
            size(toks).cast("double") >= 0.05) &&
          (length(regexp_replace(t, "[^A-Z]", "")).cast("double") /
            length(t).cast("double") <= 0.3) &&
          (size(regexp_extract_all(t, lit(Corpus.EmailRe), lit(0))) +
            size(regexp_extract_all(t, lit(Corpus.Ipv4Re), lit(0))) +
            size(regexp_extract_all(t, lit(Corpus.PhoneRe), lit(0))) === 0)).as("admitted"))
      .groupBy("source")
      .agg(count(lit(1)).as("n_docs"),
        sum(when($"admitted", 1L).otherwise(0L)).as("n_admitted"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
      .sortBy(_._1).toSeq
    assert(stream == batch)
  }

  test("d19 incremental dedup is consistent and s08's streaming counts agree") {
    import spark.implicits._
    val d = graft.text.Corpus.d19IncrementalDedup(spark, sfDir).collect()
    assert(d.nonEmpty)
    d.foreach { r =>
      val (n, dup, adm) =
        (r.getAs[Long]("n_incoming"), r.getAs[Long]("n_dup_vs_existing"), r.getAs[Long]("n_admitted"))
      assert(dup >= 0 && adm >= 0 && adm + dup <= n, r.toString)
    }
    val nIncoming = d.map(_.getAs[Long]("n_incoming")).sum
    assert(nIncoming == graft.Tables.documents(spark, sfDir)
      .where($"doc_id" % 5 === 0).count())
    // the streaming half sees the same batch: identical incoming count
    // and the same number of distinct new digests
    val s = graft.streaming.Streams.s08StreamIncrementalDedup(spark, sfDir).head()
    assert(s.getAs[Long]("n_incoming") == nIncoming)
    assert(s.getAs[Long]("n_distinct_new") == d.map(_.getAs[Long]("n_admitted")).sum)
  }

  test("d20 corpus mix: realized rates track the per-source targets") {
    val m = graft.text.Corpus.d20CorpusMix(spark, sfDir).collect()
    assert(m.nonEmpty)
    m.foreach { r =>
      val (n, samp, f) =
        (r.getAs[Long]("n_docs"), r.getAs[Long]("n_sampled"), r.getAs[Double]("target_frac"))
      assert(Set(0.25, 0.5, 0.75).contains(f), r.toString)
      // binomial tolerance at small n: |realized - target| within 4 sigma
      val sigma = math.sqrt(f * (1 - f) / n)
      assert(math.abs(samp.toDouble / n - f) <= 4 * sigma + 1.0 / n,
        s"source=${r.getString(0)} realized=${samp.toDouble / n} target=$f n=$n")
    }
  }

  test("w05 dynamic partition overwrite rewrites ONLY the batch's partitions") {
    import graft.sources.Sinks
    def snapshot(d: String): Map[String, Long] = {
      val f = new java.io.File(d)
      if (!f.exists()) Map.empty
      else f.listFiles().filter(_.getName.endsWith(".parquet"))
        .map(x => x.getName -> x.lastModified()).toMap
    }
    val out = Sinks.upsertInitialLoad(spark, sfDir)
    val esBefore = snapshot(s"$out/lang=es")
    val enBefore = snapshot(s"$out/lang=en")
    assert(esBefore.nonEmpty && enBefore.nonEmpty)
    Sinks.upsertApplyIncrement(spark, sfDir)
    // untouched partition: identical files, byte-for-byte same mtimes
    assert(snapshot(s"$out/lang=es") == esBefore)
    // rewritten partition: the old files are gone
    assert(snapshot(s"$out/lang=en").keySet.intersect(enBefore.keySet).isEmpty)
    // and the merged state contains the corrections + the new docs
    import spark.implicits._
    val en = spark.read.parquet(out).where($"lang" === "en")
    assert(en.where($"doc_id" >= 2000000L).count() > 0)
    val base = graft.Tables.documents(spark, sfDir)
      .where($"lang" === "en" && $"doc_id" % 7 === 0)
      .select($"doc_id", ($"n_chars" + 1000L).as("expected"))
    val joined = en.join(base, Seq("doc_id"))
    assert(joined.where($"n_chars" =!= $"expected").count() == 0)
  }

  test("e05 kNN join: every vector gets at most k ranked neighbors, deterministically") {
    import spark.implicits._
    val res = graft.sim.Sim.e05KnnJoin(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(res.nonEmpty)
    // per-query: ≤3 rows, unique neighbors, never self
    res.groupBy(_._1).foreach { case (q, rows) =>
      assert(rows.length <= 3, s"query $q has ${rows.length} rows")
      assert(rows.map(_._2).distinct.length == rows.length)
      assert(!rows.exists(_._2 == q))
    }
    assert(res.forall(r => r._3 >= -1.0000001 && r._3 <= 1.0000001))
    // deterministic under re-evaluation (bucket hashing, ranking and
    // tie-breaks are all pure functions)
    val again = graft.sim.Sim.e05KnnJoin(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(res.sortBy(t => (t._1, t._2)).toSeq == again.sortBy(t => (t._1, t._2)).toSeq)
  }

  test("q31 deciles: balanced bands, full coverage, monotone revenue") {
    import spark.implicits._
    val d = Relational.q31NtileDeciles(spark, sfDir)
      .orderBy($"decile").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(d.map(_._1).toSeq == (1L to 10L))
    // ntile balance: band sizes differ by at most 1
    val sizes = d.map(_._2)
    assert(sizes.max - sizes.min <= 1, sizes.mkString(","))
    assert(sizes.sum == graft.Tables.orders(spark, sfDir)
      .select($"o_custkey").distinct().count())
    // revenue-ordered bands: average revenue per customer strictly
    // decreases from decile 1 to 10
    val avg = d.map(t => t._3 / t._2)
    assert(avg.sliding(2).forall { case Array(a, b) => a > b }, avg.mkString(","))
  }
}
