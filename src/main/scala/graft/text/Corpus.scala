package graft.text

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.Checkpoints.CutOps

/** Corpus-hygiene operators for a training-data pipeline
  * (SURVEY.md §2c additions, round 2): benchmark decontamination,
  * repetition / Gopher-style quality signals, and PII scrubbing.
  * All pure column algebra + one broadcast join — no UDFs.
  */
object Corpus {

  /** d14: benchmark decontamination — flag training documents that
    * share any 5-gram with a held-out "benchmark" slice (here: a
    * deterministic ~2% hash split of the corpus, standing in for an
    * eval set like a real pipeline's benchmark suite).
    *
    * Scale shape: the benchmark n-gram set is the SMALL side and is
    * `broadcast()` — training n-grams never shuffle; each training doc
    * pays one projection + a broadcast-hash-join probe. This is the
    * standard contamination check (e.g. GPT-3 App. C / PaLM style:
    * n-gram overlap against eval sets) expressed Spark-first.
    */
  /** d17: sub-document (chunk-level) dedup — near-identical documents
    * that differ only in wrappers/suffixes still share most sliding
    * chunks, so dedup at chunk granularity catches what doc-level exact
    * dedup misses. Runs over the near-dup corpus (each long document
    * plus a truncated twin) so the operator has real positives; per
    * document it reports how many of its chunks also occur elsewhere.
    *
    * Scale shape: chunks are reduced to 16-byte digests before any
    * shuffle (the chunk text never leaves the map side); one groupBy on
    * the digest + one digest-keyed join back. Same cost envelope as
    * exact dedup (d01), ~n_chunks/doc times the rows.
    */
  def d17ChunkDedup(spark: SparkSession, dir: String): DataFrame = {
    val corpus = graft.dedup.Dedup.nearDupCorpus(Tables.documents(spark, dir))
    val ch = Text.chunks(corpus)
      .select(col("doc_id"), md5(col("chunk_text")).as("h"))
    val occ = ch.groupBy("h").agg(count(lit(1)).as("n_occ"))
    ch.join(occ, Seq("h"))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_chunks"),
        sum(when(col("n_occ") > 1, 1L).otherwise(0L)).as("n_dup_chunks"))
  }

  /** The deterministic ~2% "benchmark" hash split and the distinct
    * per-doc 5-gram projection — shared by the batch decontamination
    * pass (d14) and its at-ingestion streaming deployment (s09).
    */
  private[graft] def isBenchCol: Column = {
    val P = 1000000007L
    ((col("doc_id") % P) * 777000037L % P + 4242L) % P < math.floor(0.02 * P).toLong
  }

  private[graft] def fiveGrams(df: DataFrame): DataFrame = df
    .select(col("doc_id"), Text.wsTokens(lower(col("text"))).as("toks"))
    .where(size(col("toks")) >= 5)
    .select(col("doc_id"), explode(expr(
      "array_distinct(transform(sequence(0, size(toks)-5), " +
        "i -> concat_ws(' ', slice(toks, i+1, 5))))")).as("gram"))

  def d14Decontaminate(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
    val benchGrams = fiveGrams(docs.where(isBenchCol)).select("gram").distinct()
    fiveGrams(docs.where(!isBenchCol))
      .join(broadcast(benchGrams), Seq("gram"))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_contaminated_ngrams"))
  }

  /** d39: contamination PRESSURE — d14's join aggregated from the
    * BENCHMARK's point of view (the report the eval team reads: "which
    * of our held-out documents leak most into the training corpus, and
    * how widely?"): per bench document, how many distinct crawl
    * documents share at least one 5-gram with it, and the total
    * (crawl doc, shared gram) hit volume. A bench doc with high
    * pressure invalidates its eval rows regardless of which crawl docs
    * get filtered — the decision d14/d29/d33 feed operates per crawl
    * doc; this one decides which EVAL rows survive.
    *
    * Scale shape: d14's exact join (benchmark grams broadcast — the
    * small side by definition), then the pair frame reduces by
    * bench_id: count_distinct over crawl ids and an exact hit count,
    * both map-side-combinable. Nothing new shuffles at scale beyond
    * d14's own probe.
    */
  def d39ContaminationPressure(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
    val bench = fiveGrams(docs.where(isBenchCol))
      .select(col("doc_id").as("bench_id"), col("gram"))
    val crawl = fiveGrams(docs.where(!isBenchCol))
      .select(col("doc_id").as("crawl_id"), col("gram"))
    crawl.join(broadcast(bench), Seq("gram"))
      .groupBy("bench_id")
      .agg(count_distinct(col("crawl_id")).as("n_crawl_docs"),
        count(lit(1)).as("n_gram_hits"))
  }

  /** d29: Bloom-pre-filtered decontamination — d14's exact semantics
    * with the at-scale candidate path: the benchmark gram set (the
    * SMALL side by definition — it's the held-out eval data) is folded
    * once into a bit array, and every corpus gram tests k=2 xxhash64
    * probes against that bitset BEFORE anything shuffles — all native
    * codegen'd expressions (element_at + shiftright + bitand), no UDF.
    * Only might-contain survivors enter the exact broadcast verify
    * join (which removes Bloom's false positives; false negatives are
    * impossible by construction), so the result is row-identical to
    * d14 and shares its oracle. At 100 TB the difference is the
    * shuffle/probe volume: a 100 TB corpus explodes to ~10^13 grams,
    * and the bitset turns "join every gram" into "join the ~0 that
    * might match". `spark.graft.bloom.bits` sizes the array (default
    * 2^17 bits = 16 KiB riding the plan as one literal; size to
    * ~10 bits per benchmark gram in production).
    */
  def d29BloomDecontam(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
    val bench = fiveGrams(docs.where(isBenchCol)).select("gram").distinct()
    bloomSurvivors(spark, dir)
      .join(broadcast(bench), Seq("gram"))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_contaminated_ngrams"))
  }

  /** Fold the (small) gram frame into a Bloom bit array: two xxhash64
    * probes per gram, positions collected once on the driver — the
    * build side is eval data, bounded by construction.
    */
  private[graft] def bloomBits(grams: DataFrame, mBits: Int): Array[Long] = {
    val words = new Array[Long](mBits / 64)
    grams.select(
        pmod(xxhash64(col("gram")), lit(mBits.toLong)).as("p1"),
        pmod(xxhash64(col("gram"), lit(1)), lit(mBits.toLong)).as("p2"))
      .collect()
      .foreach { r =>
        Seq(r.getLong(0), r.getLong(1)).foreach { p =>
          words(p.toInt / 64) |= (1L << (p.toInt % 64))
        }
      }
    words
  }

  /** The Bloom-survivor gram frame alone (pre-verify) — exposed for
    * the pruning spec: survivors must be a strict subset of all grams
    * and a superset of the true matches.
    */
  private[graft] def bloomSurvivors(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
    val bench = fiveGrams(docs.where(isBenchCol)).select("gram").distinct()
    val mBits = spark.conf.get("spark.graft.bloom.bits", (1 << 17).toString).toInt
    val bits = typedLit(bloomBits(bench, mBits).toSeq)
    fiveGrams(docs.where(!isBenchCol))
      .withColumn("h1", pmod(xxhash64(col("gram")), lit(mBits.toLong)))
      .withColumn("h2", pmod(xxhash64(col("gram"), lit(1)), lit(mBits.toLong)))
      .withColumn("bm", bits)
      .where(expr("(shiftright(element_at(bm, CAST(h1 DIV 64 AS INT) + 1), " +
          "CAST(h1 % 64 AS INT)) & 1) = 1")
        && expr("(shiftright(element_at(bm, CAST(h2 DIV 64 AS INT) + 1), " +
          "CAST(h2 % 64 AS INT)) & 1) = 1"))
      .select("doc_id", "gram")
  }

  /** The contaminated crawl for fuzzy decontamination: the non-bench
    * documents plus a truncated twin (last 3 tokens dropped, offset
    * ids — the d06 twin formula) of every long-enough BENCH document,
    * modeling a crawl that ingested lightly-edited copies of benchmark
    * pages. The edits break d14's exact 5-grams at the cut point, which
    * is precisely the contamination mode fuzzy matching exists for.
    */
  private[graft] def fuzzyCrawl(docs: DataFrame): DataFrame = {
    val toks = graft.text.Text.wsTokens(col("text"))
    val twins = docs.where(isBenchCol)
      .where(size(toks) >= 12)
      .withColumn("text", concat_ws(" ", slice(toks, lit(1), size(toks) - 3)))
      .withColumn("doc_id", col("doc_id") + lit(1000000L))
    docs.where(!isBenchCol).unionByName(twins)
  }

  /** d33: FUZZY benchmark decontamination — near-duplicate matching
    * between the crawl and the held-out benchmark slice (the
    * Llama/GPT-4-report style complement to d14/d29's exact n-gram
    * overlap: a benchmark page that was reflowed, retitled, or lightly
    * edited before the crawler saw it shares few exact 5-grams but
    * nearly all of its shingle set). Both sides go through the shared
    * MinHash signature kernel; candidates come from the LSH band join
    * of crawl bands against BENCH bands; survivors verify with exact
    * shingle sets and flag on contamination = |S_doc ∩ S_bench| /
    * |S_doc| ≥ 0.8 — "at least 80% of this crawl document is benchmark
    * material" (the asymmetric d28 ratio, pointed at the crawl side, so
    * a benchmark quoted inside a larger page scores by the page, not
    * the quote).
    *
    * Scale shape (100 TB crawl, bounded benchmark): the bench side is
    * small BY DEFINITION (it is the eval suite), so its band rows
    * broadcast; each crawl band row meets at most MaxBucket bench rows
    * (bench-side bucket cap), keeping candidates linear in crawl size;
    * only candidate pairs pay the exact shingle intersect, and the only
    * crawl-wide work is the one signature projection every other dedup
    * operator already pays. Text never shuffles — band rows are 24
    * bytes; shingle arrays join back only for the surviving candidates.
    */
  def d33FuzzyDecontam(spark: SparkSession, dir: String): DataFrame = {
    val (pipeline, sigB, sigC) = d33Pipeline(spark, dir)
    // eager-release (s05 pattern): survivors are tiny; checkpoint them
    // and drop both persisted signature tables before returning
    val out = pipeline.cutLineage
    sigB.unpersist(); sigC.unpersist()
    out
  }

  /** The un-checkpointed d33 pipeline plus both persisted signature
    * tables — exposed so the plan spec can pin the join strategy
    * (a checkpointed frame's plan is just an RDD scan).
    */
  private[graft] def d33Pipeline(
      spark: SparkSession, dir: String): (DataFrame, DataFrame, DataFrame) = {
    import graft.dedup.Dedup
    val docs = Tables.documents(spark, dir)
    val bench = docs.where(isBenchCol)
    val sigB = Dedup.signatureTable(bench)
    val sigC = Dedup.signatureTable(fuzzyCrawl(docs))
    val bb = Dedup.bandRows(sigB)
      .select(col("doc_id").as("bench_id"), col("band_id"), col("band_sig"))
    // stop-bucket cap on the BENCH side: a boilerplate band shared by
    // many bench docs would otherwise multiply every matching crawl row
    val benchOk = bb.groupBy("band_id", "band_sig").count()
      .where(col("count") <= Dedup.MaxBucket).select("band_id", "band_sig")
    val cand = Dedup.bandRows(sigC)
      .join(broadcast(bb.join(benchOk, Seq("band_id", "band_sig"))),
        Seq("band_id", "band_sig"))
      .select("doc_id", "bench_id").distinct()
    val shC = sigC.select(col("doc_id"), col("shingles").as("sh_c"))
    val shB = sigB.select(col("doc_id").as("bench_id"), col("shingles").as("sh_b"))
    val out = cand
      .join(shC, Seq("doc_id"))
      .join(broadcast(shB), Seq("bench_id"))
      .select(col("doc_id"), col("bench_id"),
        size(array_intersect(col("sh_c"), col("sh_b"))).cast("double").as("inter"),
        size(col("sh_c")).as("nc"),
        // |A∪B| = |A|+|B|−|A∩B| on distinct'd shingles — same integer,
        // no per-pair union allocation
        (size(col("sh_c")) + size(col("sh_b"))).as("nab"))
      .withColumn("nu", col("nab") - col("inter"))
      .select(col("doc_id"), col("bench_id"),
        (col("inter") / col("nc")).as("contamination"),
        (col("inter") / col("nu")).as("jaccard"))
      .where(col("contamination") >= 0.8)
    (out, sigB, sigC)
  }

  /** d35: quality-stratified corpus mixing — the DCLM/FineWeb recipe
    * that closes the curation loop: score every crawl document with
    * the reference-LM fluency signal (d31's bigram coverage), bucket
    * into quality tiers, and sample each tier at its own rate (keep
    * all of the best material, thin the middle, keep a trace of the
    * tail so the model still sees it). Tiers cut at coverage ≥ 0.55 /
    * ≥ 0.35 by integer cross-multiply (no float compare can flip
    * cross-engine; docs too short to have bigrams land in the bottom
    * tier); the sampling predicate is d13/d20's pure (doc_id) hash
    * threshold — reproducible, layout-invariant, no RNG state. Note
    * the tiers are measured against the reference model, so a larger
    * bench slice legitimately lifts the whole corpus into higher
    * tiers (observed: sf0.1's model covers every doc at ≥ 0.55).
    *
    * Scale shape: d31's broadcast model join is the only corpus-wide
    * work (the model is bench-sized by construction); tier and
    * admission are pure row predicates; the census map-side-combines
    * to 3 rows.
    */
  def d35QualityMix(spark: SparkSession, dir: String): DataFrame = {
    val P = 1000000007L
    val docs = Tables.documents(spark, dir)
    val model = tokenBigrams(docs.where(isBenchCol))
      .groupBy("gram").agg(count(lit(1)).as("ref_freq"))
    val scored = tokenBigrams(docs.where(!isBenchCol))
      .join(broadcast(model), Seq("gram"), "left")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_bigrams"),
        count(when(col("ref_freq").isNull, 1)).as("n_unseen"))
    val covered = col("n_bigrams") - col("n_unseen")
    val tier = when(col("n_bigrams").isNull, 0L)
      .when(covered * 20L >= col("n_bigrams") * 11L, 2L)
      .when(covered * 20L >= col("n_bigrams") * 7L, 1L)
      .otherwise(0L)
    val keep10 = when(col("tier") === 2L, 10L)
      .when(col("tier") === 1L, 5L).otherwise(1L)
    val u = ((col("doc_id") % P) * lit(888000131L) % lit(P) + lit(99L)) % lit(P)
    docs.where(!isBenchCol).select("doc_id", "n_chars")
      .join(scored, Seq("doc_id"), "left")
      .withColumn("tier", tier)
      .withColumn("adm", when(u * lit(10L) < keep10 * lit(P), 1L).otherwise(0L))
      .groupBy("tier")
      .agg(count(lit(1)).as("n_docs"),
        sum(col("adm")).as("n_sampled"),
        sum(when(col("adm") === 1L, col("n_chars")).otherwise(0L)).as("sampled_chars"))
  }

  /** d25: corpus snapshot diff — the data-versioning primitive: given
    * two corpus versions, report per source how many documents were
    * added, removed, changed, or untouched. Versions are derived
    * deterministically from the one verification table (old = doc_id
    * not divisible by 7; new = all docs, with every 11th's text
    * revised) the same way d19 derives its incremental batch.
    *
    * Scale shape: each side reduces to a 16-byte digest BEFORE the
    * shuffle (text never moves), one full-outer join on doc_id, one
    * ~|sources|-row rollup. At 100 TB both snapshots are bucketed by
    * doc_id and the join is exchange-free.
    */
  def d25CorpusDiff(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
    // null-safe digest: a null-text doc present in both snapshots must
    // compare EQUAL (null md5 never equals anything and would
    // misclassify the doc as added — RobustnessSpec)
    val t = coalesce(col("text"), lit(""))
    val old = docs.where(col("doc_id") % 7 =!= 0)
      .select(col("doc_id"), col("source").as("src_old"), md5(t).as("h_old"))
    val neu = docs
      .select(col("doc_id"), col("source").as("src_new"),
        md5(when(col("doc_id") % 11 === 0, concat(t, lit(" v2")))
          .otherwise(t)).as("h_new"))
    old.join(neu, Seq("doc_id"), "full_outer")
      .groupBy(coalesce(col("src_new"), col("src_old")).as("source"))
      .agg(
        sum(when(col("h_old").isNull, 1L).otherwise(0L)).as("n_added"),
        sum(when(col("h_new").isNull, 1L).otherwise(0L)).as("n_removed"),
        sum(when(col("h_old").isNotNull && col("h_new").isNotNull &&
          col("h_old") =!= col("h_new"), 1L).otherwise(0L)).as("n_changed"),
        sum(when(col("h_old") === col("h_new"), 1L).otherwise(0L)).as("n_unchanged"))
  }

  /** d15: repetition / quality signals (Gopher-style document filters:
    * word-count bounds, mean word length, most-repeated-bigram mass).
    * One projection for the per-doc stats; the bigram mode is a
    * (doc_id, bigram) count → per-doc max — two map-side-combined
    * aggregations keyed by doc, no row ever leaves its doc group.
    */
  def d15Repetition(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
      .select(col("doc_id"), Text.wsTokens(lower(col("text"))).as("toks"))
      .where(size(col("toks")) >= 2)
    val stats = docs.select(
      col("doc_id"),
      size(col("toks")).cast("long").as("n_words"),
      (expr("aggregate(toks, 0L, (a, t) -> a + length(t))").cast("double") /
        size(col("toks")).cast("double")).as("mean_word_len"))
    val bigrams = docs.select(col("doc_id"),
      explode(expr("transform(sequence(0, size(toks)-2), " +
        "i -> concat(toks[i], ' ', toks[i+1]))")).as("bigram"))
    val topBigram = bigrams
      .groupBy("doc_id", "bigram").agg(count(lit(1)).as("c"))
      .groupBy("doc_id")
      .agg(max(col("c")).as("top_c"), sum(col("c")).as("total_c"))
      .select(col("doc_id"),
        (col("top_c").cast("double") / col("total_c").cast("double")).as("top_bigram_frac"))
    stats.join(topBigram, Seq("doc_id"))
      .select(col("doc_id"), col("n_words"), col("mean_word_len"), col("top_bigram_frac"),
        (col("n_words").between(50, 100000) &&
          col("mean_word_len").between(3.0, 10.0) &&
          (col("top_bigram_frac") <= 0.2)).as("passes_quality"))
  }

  /** d18: the curation funnel — every per-document quality gate a
    * corpus pipeline actually applies (token-count bounds, stopword
    * density, uppercase shouting, repetition, PII), composed into ONE
    * pass, reported as per-source survivor counts. This is the nightly
    * corpus-health dashboard: which sources are losing documents, and
    * at which gate.
    *
    * Scale shape: the scalar gates (length / stopword / upper / PII)
    * are a single codegen'd projection — no shuffle. The repetition
    * gate reuses d15's shape: a (doc_id, bigram) count → per-doc max,
    * both map-side combined and keyed by doc. The final rollup is a
    * ~|sources|-row aggregate. Nothing here grows super-linearly.
    *
    * Gate thresholds mirror d03/d15/d16's published metrics, so every
    * input to every comparison is a value those oracles already pin
    * bit-exactly — the funnel's booleans can't flip cross-engine.
    */
  def d18CurationFunnel(spark: SparkSession, dir: String): DataFrame = {
    val t = col("text")
    val toks = Text.wsTokens(lower(t))
    // null-safe divisors: empty/null text fails the gates as null →
    // not admitted, instead of crashing the whole pass under ANSI mode
    val nchars = when(length(t) === 0, lit(null)).otherwise(length(t)).cast("double")
    val scalarGates = Tables.documents(spark, dir).select(
      col("doc_id"), col("source"),
      size(toks).cast("long").as("n_words"),
      (size(filter(toks, tok => tok.isin(Text.StopEn: _*))).cast("double") /
        when(size(toks) === 0, lit(null)).otherwise(size(toks)).cast("double")).as("stop_ratio"),
      (length(regexp_replace(t, "[^A-Z]", "")).cast("double") / nchars).as("upper_ratio"),
      (size(regexp_extract_all(t, lit(EmailRe), lit(0))) +
        size(regexp_extract_all(t, lit(Ipv4Re), lit(0))) +
        size(regexp_extract_all(t, lit(PhoneRe), lit(0)))).cast("long").as("n_pii"))
    val docs2 = Tables.documents(spark, dir)
      .select(col("doc_id"), Text.wsTokens(lower(col("text"))).as("toks"))
      .where(size(col("toks")) >= 2)
    val topBigram = docs2.select(col("doc_id"),
      explode(expr("transform(sequence(0, size(toks)-2), " +
        "i -> concat(toks[i], ' ', toks[i+1]))")).as("bigram"))
      .groupBy("doc_id", "bigram").agg(count(lit(1)).as("c"))
      .groupBy("doc_id")
      .agg((max(col("c")).cast("double") / sum(col("c")).cast("double")).as("top_bigram_frac"))
    val gated = scalarGates
      .join(topBigram, Seq("doc_id"), "left")
      .select(col("source"),
        col("n_words").between(50L, 100000L).as("g_len"),
        (col("stop_ratio") >= 0.05).as("g_stop"),
        (col("upper_ratio") <= 0.3).as("g_upper"),
        (coalesce(col("top_bigram_frac"), lit(0.0)) <= 0.2).as("g_rep"),
        (col("n_pii") === 0L).as("g_pii"))
    def n(c: Column): Column = sum(when(c, 1L).otherwise(0L))
    gated.groupBy("source").agg(
      count(lit(1)).as("n_docs"),
      n(col("g_len")).as("n_pass_len"),
      n(col("g_stop")).as("n_pass_stop"),
      n(col("g_upper")).as("n_pass_upper"),
      n(col("g_rep")).as("n_pass_rep"),
      n(col("g_pii")).as("n_pass_pii"),
      n(col("g_len") && col("g_stop") && col("g_upper") && col("g_rep") && col("g_pii"))
        .as("n_clean"))
  }

  /** d19: incremental dedup — the daily-increment pattern: a new batch
    * (here the deterministic doc_id%5==0 slice stands in for today's
    * crawl) deduplicated against the EXISTING corpus and within itself.
    * Per source it reports how many incoming docs were dropped as
    * already-known vs admitted (one per distinct new digest, min doc_id
    * wins — a deterministic tie-break).
    *
    * Scale shape: both sides reduce to 16-byte md5 digests before any
    * shuffle; "vs existing" is a digest left-anti join (at 100 TB the
    * existing side is a bucketed digest table, making the probe
    * co-located), within-batch is one digest groupBy. Document text
    * never shuffles.
    */
  def d19IncrementalDedup(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
    val incoming = docs.where(col("doc_id") % 5 === 0)
      .select(col("doc_id"), col("source"), md5(col("text")).as("h"))
    val existingDigests = docs.where(col("doc_id") % 5 =!= 0)
      .select(md5(col("text")).as("h")).distinct()
    val fresh = incoming.join(existingDigests, Seq("h"), "left_anti")
    val admitted = fresh.groupBy("h").agg(min(col("doc_id")).as("doc_id"))
      .join(incoming.select("doc_id", "source"), Seq("doc_id"))
    val perSourceIncoming = incoming.groupBy("source")
      .agg(count(lit(1)).as("n_incoming"))
    val perSourceFresh = fresh.groupBy("source")
      .agg(count(lit(1)).as("n_fresh"))
    val perSourceAdmitted = admitted.groupBy("source")
      .agg(count(lit(1)).as("n_admitted"))
    perSourceIncoming
      .join(perSourceFresh, Seq("source"), "left")
      .join(perSourceAdmitted, Seq("source"), "left")
      .select(col("source"), col("n_incoming"),
        (col("n_incoming") - coalesce(col("n_fresh"), lit(0L))).as("n_dup_vs_existing"),
        coalesce(col("n_admitted"), lit(0L)).as("n_admitted"))
  }

  /** d20: weighted corpus mixing — every source gets a target mixture
    * fraction (here a deterministic function of the source name, 25/50/
    * 75%, standing in for curated Pile-style weights) and documents are
    * admitted by the same layout-invariant mod-prime threshold d13
    * uses, so the realized sample is an exact deterministic function of
    * (doc_id, source) — reproducible on any cluster layout, no RNG
    * state. One codegen'd projection + a |sources|-row rollup.
    */
  def d20CorpusMix(spark: SparkSession, dir: String): DataFrame = {
    val P = 1000000007L
    // per-source target fraction: hash the source name to 1..3 quarters
    def srcHash = aggregate(split(col("source"), ""), lit(7L),
      (a, c) => (a * 31 + ascii(c)) % P)
    val u = ((col("doc_id") % P) * 888000131L % P + 99L) % P
    val admit = u < floor((srcHash % 3 + 1).cast("double") * 0.25 * P).cast("long")
    Tables.documents(spark, dir)
      .select(col("source"), when(admit, 1L).otherwise(0L).as("adm"))
      .groupBy("source")
      .agg(count(lit(1)).as("n_docs"), sum(col("adm")).as("n_sampled"))
      .withColumn("target_frac", (srcHash % 3 + 1).cast("double") * 0.25)
  }

  /** d43: temperature-scaled sampling weights — the multilingual mixing
    * rule (mBERT/XLM-R/mT5: p_l^α / Σ p^α with α < 1) that up-samples
    * tail languages and down-samples the head so low-resource languages
    * are not drowned by English. Output per language: the raw corpus
    * share p_raw, the temperature-scaled target share p_temp, and the
    * boost ratio p_temp/p_raw an epoch sampler multiplies into its
    * admission rate (tail langs get boost > 1, the head < 1).
    *
    * Scale shape: one |langs|-row groupBy count (map-side combine to a
    * handful of rows), a 1-row global sum broadcast back — the weight
    * table is O(|languages|) at any corpus size and rides into the
    * admission scan (d20's threshold device) as a broadcast literal.
    * No float enters any ranking — weights are OUTPUT, so cross-engine
    * pow() ulp noise lands inside the compare tolerance instead of
    * flipping a selection.
    */
  def d43TemperatureMix(spark: SparkSession, dir: String): DataFrame =
    temperatureProject(Tables.documents(spark, dir)
      .groupBy("lang").agg(count(lit(1)).as("n_docs")))

  /** The temperature projection over a (lang, n_docs) census — shared
    * by d43 (batch) and s26 (the same weights maintained live on the
    * ingest stream), so both derive bit-identical weights from the
    * same column algebra.
    */
  private[graft] def temperatureProject(l: DataFrame): DataFrame = {
    val alpha = 0.7
    val t = l.agg(sum("n_docs").cast("double").as("total"),
      sum(pow(col("n_docs"), alpha)).as("z"))
    l.crossJoin(broadcast(t)).select(
      col("lang"), col("n_docs"),
      (col("n_docs") / col("total")).as("p_raw"),
      (pow(col("n_docs"), alpha) / col("z")).as("p_temp"),
      ((pow(col("n_docs"), alpha) / col("z")) * col("total") / col("n_docs")).as("boost"))
  }

  /** Line span width for d26/s17: documents split into consecutive
    * LineTok-token "lines" (the corpus carries no newlines, so fixed
    * token spans stand in for the line/sentence granularity a real
    * boilerplate scrubber works at).
    */
  private[graft] val LineTok = 8

  /** The per-document line frame: (doc_id, line_idx, line_text) for
    * consecutive LineTok-token spans, built as ONE array expression so
    * the batch operator (d26) and its streaming deployment (s17) derive
    * bit-identical lines from the same column algebra.
    */
  private[graft] def lineArray: Column = expr(
    s"""transform(sequence(0, cast(ceil(size(toks) / $LineTok.0) as int) - 1),
       | i -> struct(cast(i as bigint) AS line_idx,
       |             concat_ws(' ', slice(toks, i*$LineTok + 1, $LineTok)) AS line_text))"""
      .stripMargin)

  /** d26: corpus-level line dedup / boilerplate stripping (the C4 and
    * CCNet recipe: a line that recurs across many documents is nav
    * text, cookie banners, license headers — template, not content —
    * and is removed from EVERY document it appears in). A line here is
    * a LineTok-token span; a line is boilerplate when it occurs in ≥ 2
    * distinct documents (the near-dup corpus's truncated twins
    * guarantee real positives at every SF). Output per document: the
    * scrubbed text with surviving lines re-joined in order, plus
    * line/drop counts — an all-boilerplate document survives with
    * empty text, it is never silently lost.
    *
    * Scale shape: occurrence counting shuffles 16-byte md5 digests
    * only (line text never leaves the map side); the boilerplate
    * dictionary — frequent lines, small by construction, the web's
    * template set — broadcasts back; the only text-bearing exchange is
    * the per-document reassembly groupBy, ∝ corpus size with no skew
    * (keys are doc_ids). At 100 TB this is two digest aggregations
    * plus one broadcast-probe scan.
    */
  def d26LineDedup(spark: SparkSession, dir: String): DataFrame = {
    val corpus = graft.dedup.Dedup.nearDupCorpus(Tables.documents(spark, dir))
    val lines = lineFrame(corpus)
    val boiler = boilerplateLines(corpus).select(col("h"), lit(1).as("bp"))
    scrubAgg(lines.join(broadcast(boiler), Seq("h"), "left"))
  }

  /** The per-document reassembly over a flagged line frame
    * (doc_id, line_idx, line_text, bp∈{1,null}) — shared by d26 and
    * the per-micro-batch scrub in s17 so both produce bit-identical
    * rows: surviving lines re-join in order; collect_list skips the
    * null-ed boilerplate entries.
    */
  private[graft] def scrubAgg(flagged: DataFrame): DataFrame =
    flagged.groupBy("doc_id")
      .agg(
        concat_ws(" ", transform(
          array_sort(collect_list(when(col("bp").isNull,
            struct(col("line_idx"), col("line_text"))))),
          x => x.getField("line_text"))).as("clean_text"),
        count(lit(1)).as("n_lines"),
        count(col("bp")).as("n_dropped"))

  /** The exploded line frame: (doc_id, line_idx, line_text, h). */
  private[graft] def lineFrame(corpus: DataFrame): DataFrame = corpus
    .select(col("doc_id"), Text.wsTokens(col("text")).as("toks"))
    .select(col("doc_id"), explode(lineArray).as("l"))
    .select(col("doc_id"), col("l.line_idx"), col("l.line_text"),
      md5(col("l.line_text")).as("h"))

  /** The boilerplate dictionary: digests of lines occurring in ≥ 2
    * distinct documents, with their document frequency. Shared by the
    * batch scrub (d26) and the nightly build of the streaming
    * scrubber's literal dictionary (s17).
    */
  private[graft] def boilerplateLines(corpus: DataFrame): DataFrame =
    lineFrame(corpus).groupBy("h")
      .agg(count_distinct(col("doc_id")).as("n_docs"))
      .where(col("n_docs") >= 2)

  /** d36: first-occurrence span dedup — the "deduplicating training
    * data" recipe (Lee et al. 2022's ExactSubstr, at span granularity):
    * any LineTok-token span occurring more than once in the corpus
    * keeps only its FIRST occurrence (smallest (doc_id, line_idx));
    * every later occurrence is scrubbed from its document. The
    * complement of d26: d26 removes template lines from EVERY document
    * including the first — d36 preserves one canonical copy, the right
    * rule when the repeated span is content (a quoted paragraph, a
    * syndicated article) rather than boilerplate.
    *
    * Scale shape: the winner election shuffles (digest, packed-id)
    * pairs only — 24-byte rows, map-side-combined min, no window over
    * a hot digest anywhere (a span occurring 10⁹ times folds to one
    * row per map task before the exchange). The drop-list join back to
    * the election is digest-keyed on the same 24-byte rows; the
    * per-document drop lists then aggregate on doc_id (no skew — keys
    * are documents) and join the corpus once. Reassembly is entirely
    * ROW-LOCAL: each document re-derives its spans from its own text
    * and filters by its drop list — text never enters a digest-keyed
    * exchange and there is no text-bearing groupBy at all (one step
    * leaner than d26's reassembly shape). Packed ids are
    * doc_id·2²⁰+line_idx — exact while line_idx < 2²⁰; production
    * corpora with longer documents widen the shift or elect min by
    * struct ordering.
    */
  def d36SpanDedup(spark: SparkSession, dir: String): DataFrame = {
    val corpus = graft.dedup.Dedup.nearDupCorpus(Tables.documents(spark, dir))
    val spans = lineFrame(corpus)
      .select(col("h"), (col("doc_id") * lit(1048576L) + col("line_idx")).as("pk"))
    val winner = spans.groupBy("h").agg(min(col("pk")).as("w"))
    val dropIdx = spans.join(winner, Seq("h"))
      .where(col("pk") =!= col("w"))
      .select(expr("pk div 1048576").as("doc_id"),
        pmod(col("pk"), lit(1048576L)).as("line_idx"))
      .groupBy("doc_id")
      .agg(sort_array(collect_list(col("line_idx"))).as("drop_idx"))
    corpus
      .select(col("doc_id"), Text.wsTokens(col("text")).as("toks"))
      .join(dropIdx, Seq("doc_id"), "left")
      .withColumn("drop_idx", coalesce(col("drop_idx"), array()))
      .withColumn("lines", lineArray)
      .select(
        col("doc_id"),
        concat_ws(" ", expr(
          "transform(filter(lines, l -> NOT array_contains(drop_idx, l.line_idx)), l -> l.line_text)"))
          .as("clean_text"),
        size(col("lines")).cast("long").as("n_lines"),
        size(col("drop_idx")).cast("long").as("n_dropped"))
  }

  /** d37: template MINING — the d26 boilerplate dictionary promoted to
    * a deliverable (what a curation engineer actually reviews before
    * turning the scrubber on: WHICH nav bars / cookie banners / license
    * headers dominate the crawl, and how much of the corpus they
    * touch): the top-20 template lines by document frequency, with
    * their corpus share. Rank ties cut on the line DIGEST so the
    * boundary is deterministic cross-engine.
    *
    * Scale shape: the dictionary build is d26's digest-only count
    * shuffle; the rank window orders the DICTIONARY (small by
    * construction — it IS the template set), never the corpus; line
    * text joins back against the broadcast top-20 only.
    */
  def d37TemplateMining(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val corpus = graft.dedup.Dedup.nearDupCorpus(Tables.documents(spark, dir))
    val total = corpus.count()
    val top = boilerplateLines(corpus)
      .withColumn("rnk", row_number()
        .over(Window.orderBy(col("n_docs").desc, col("h"))).cast("long"))
      .where(col("rnk") <= 20)
    lineFrame(corpus).join(broadcast(top), Seq("h"))
      .groupBy("h", "n_docs", "rnk")
      .agg(min(col("line_text")).as("template"))
      .select(col("template"), col("n_docs"), col("rnk"),
        (col("n_docs").cast("double") / lit(total.toDouble)).as("doc_share"))
  }

  /** d38: PRIORITY cross-corpus dedup — the multi-source union rule
    * every pre-training mix applies (The Pile / Dolma recipe): when the
    * same document appears in several sources, keep ONE copy from the
    * most trusted source (curated beats crawled), ties to the smaller
    * doc_id. Sources rank by a deterministic priority = the source
    * name's polynomial hash mod 5 (standing in for the curator's
    * wiki > books > crawl ordering — the mechanism, not the taxonomy,
    * is the operator). Output: every kept document with its source,
    * priority and the duplicate count it absorbed.
    *
    * Scale shape: text reduces to a 16-byte digest map-side; the
    * election is ONE digest-keyed min_by over a packed
    * (priority, doc_id) key — map-side-combined, no window over hot
    * digests (the d36 lesson); the winner set joins back by doc_id.
    * Document text never shuffles.
    */
  def d38PriorityDedup(spark: SparkSession, dir: String): DataFrame = {
    val P = 1000000007L
    def srcPrio(name: String) =
      expr(s"aggregate(split($name, ''), 7L, (a, c) -> (a * 31 + ascii(c)) % $P) % 5")
    val docs = Tables.documents(spark, dir)
      .select(col("doc_id"), col("source"),
        md5(coalesce(col("text"), lit(""))).as("h"),
        srcPrio("source").as("prio"))
    val elected = docs
      .groupBy("h")
      .agg(min_by(col("doc_id"), struct(col("prio"), col("doc_id"))).as("doc_id"),
        count(lit(1)).as("n_copies"))
    elected.join(docs.select("doc_id", "source", "prio"), Seq("doc_id"))
      .select(col("doc_id"), col("source"), col("prio"), col("n_copies"))
  }

  /** d27: per-domain document caps (the Common-Crawl curation rule:
    * no single domain may dominate the corpus — keep at most K
    * documents per source, deterministically the K smallest doc_ids).
    *
    * Scale shape: the naive formulation is one row_number window per
    * source — a hot domain (10⁹ pages of the same news site) then
    * sorts in a single task. Instead the cap applies twice: stage 1
    * ranks within (source, doc_id mod S) salt cells — S× smaller than
    * the hottest domain — and keeps K per cell; stage 2 ranks the
    * ≤ S·K survivors per source. K-smallest per source is a subset of
    * the union of per-cell K-smallest, so the result is EXACTLY the
    * naive window's (spec-pinned); S is the skew knob
    * (`spark.graft.domaincap.salt`, default 8 — size to hottest-domain
    * rows / executor memory in production).
    */
  def d27DomainCap(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val k = 15
    val s = spark.conf.getOption("spark.graft.domaincap.salt").map(_.toInt).getOrElse(8)
    val docs = Tables.documents(spark, dir)
      .select("doc_id", "source", "lang", "n_chars")
    val stage1 = docs
      .withColumn("salt", pmod(col("doc_id"), lit(s.toLong)))
      .withColumn("r1", row_number().over(
        Window.partitionBy("source", "salt").orderBy("doc_id")))
      .where(col("r1") <= k)
      .drop("salt", "r1")
    stage1
      .withColumn("rnk", row_number().over(
        Window.partitionBy("source").orderBy("doc_id")).cast("long"))
      .where(col("rnk") <= k)
  }

  /** PII patterns shared by the operator and its oracle — restricted to
    * syntax both Java regex and RE2 (DuckDB) support identically.
    */
  val EmailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val Ipv4Re = "\\b[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\b"
  val PhoneRe = "\\b[0-9]{3}[- ][0-9]{3,4}[- ][0-9]{4}\\b"

  /** d16: PII scrub — redact emails / IPv4s / phone-shaped numbers and
    * count what was removed. Pure codegen'd regexp projection: one
    * scan, no shuffle, trivially linear at any scale.
    */
  def d16PiiScrub(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir).select(
      col("doc_id"),
      size(regexp_extract_all(col("text"), lit(EmailRe), lit(0))).cast("long").as("n_emails"),
      size(regexp_extract_all(col("text"), lit(Ipv4Re), lit(0))).cast("long").as("n_ips"),
      size(regexp_extract_all(col("text"), lit(PhoneRe), lit(0))).cast("long").as("n_phones"),
      regexp_replace(
        regexp_replace(
          regexp_replace(col("text"), EmailRe, "[EMAIL]"),
          Ipv4Re, "[IP]"),
        PhoneRe, "[PHONE]").as("scrubbed"))

  /** Token bigrams WITH multiplicity (no array_distinct — a language
    * model counts occurrences, not presence) for every doc with ≥ 2
    * tokens. Same tokenizer as every other text operator.
    */
  private[graft] def tokenBigrams(df: DataFrame): DataFrame = df
    .select(col("doc_id"), Text.wsTokens(lower(col("text"))).as("toks"))
    .where(size(col("toks")) >= 2)
    .select(col("doc_id"), explode(expr(
      "transform(sequence(0, size(toks)-2), i -> concat_ws(' ', slice(toks, i+1, 2)))")).as("gram"))

  /** d31: reference-LM fluency scoring — the CCNet/Gopher filter
    * shape: a language model trained on a TRUSTED reference slice
    * scores the crawl, and gibberish / non-language / boilerplate
    * scores poorly. The "LM" here is the token-bigram count table of
    * the bench slice (d14's reference split), broadcast into one agg
    * over the crawl's bigram stream — the exact plan a perplexity
    * filter runs at 100 TB (model broadcast, data scanned once, no
    * shuffle wider than the per-doc rollup).
    *
    * Integer-exact by design: per crawl doc we emit total bigrams,
    * bigrams UNSEEN by the reference, the summed reference frequency,
    * and a coverage ratio of two exact integers. No log-probs on
    * purpose — ln() differs across libms in the last ulp, while
    * integer counts (and therefore the induced quality RANKING)
    * reproduce on any engine; a production deployment would bin
    * log-probs on top of the same plan.
    */
  /** d41: token-vote QUALITY CLASSIFIER — the fastText-style learned
    * quality filter every production curation stack layers on top of
    * its heuristics (CCNet / Llama-recipe shape: train a cheap linear
    * model on weak labels, score the crawl), built so every step is
    * EXACT integer arithmetic an external engine reproduces:
    *
    *  - weak labels from a deterministic rational rule (≥ 15% of a
    *    doc's ≥ 20 tokens are engine jargon), cross-multiplied — no
    *    float division anywhere;
    *  - the even-doc_id half trains: per-token class counts under
    *    Laplace smoothing; the odd half is scored;
    *  - each scored token contributes the exact Naive-Bayes evidence
    *    (c_good+1)·(N_bad+V) vs (c_bad+1)·(N_good+V), log₂-QUANTIZED
    *    TO INTEGERS as length(bin(lhs)) − length(bin(rhs)) — the f05
    *    cross-multiply plus integer bit-length, so the weighting is
    *    magnitude-aware (a 64× likelihood ratio outvotes six 2×
    *    tokens) with no log()/libm in any decision, and tokens whose
    *    ratio is within one octave of even mute to 0 — automatic
    *    noise suppression an unweighted vote lacks (measured: the
    *    majority-vote variant scored chance on this corpus);
    *  - a document's prediction is score > 0; output is the
    *    (weak_label × predicted) confusion census with score mass —
    *    the report a curation team reads before trusting the filter.
    *
    * Scale shape: one explode per half; the vocabulary join carries NO
    * broadcast hint — vocab is data-sized, so Catalyst picks broadcast
    * at small SF and a token-keyed shuffle join at scale (counts
    * map-side-combine either way); scores fold per doc and
    * the census is ≤ 4 rows. Long arithmetic holds to ~3·10⁹ tokens
    * per class ((c+1)·(N+V) < 2⁶³); past that the two product columns
    * switch to decimal(38) — the documented headroom path.
    */
  def d41QualityVotes(spark: SparkSession, dir: String): DataFrame = {
    val toks = Tables.documents(spark, dir)
      .select(col("doc_id"), Text.wsTokens(lower(col("text"))).as("toks"))
      .withColumn("n_toks", size(col("toks")).cast("long"))
      .withColumn("n_jargon", expr(
        "size(filter(toks, t -> t IN ('spark', 'query', 'table', 'join')))").cast("long"))
      // weak label, cross-multiplied: ≥ 15% jargon share AND n ≥ 20
      .withColumn("weak_good",
        lit(20L) * col("n_jargon") >= lit(3L) * col("n_toks") && col("n_toks") >= 20)
    val tok = toks.select(col("doc_id"), col("weak_good"),
      explode(col("toks")).as("token"))
    val train = tok.where(col("doc_id") % 2 === 0)
    val vocab = train.groupBy("token")
      .agg(count(when(col("weak_good"), 1)).as("c_good"),
        count(when(!col("weak_good"), 1)).as("c_bad"))
    val tot = vocab.agg(sum("c_good").as("n_good"), sum("c_bad").as("n_bad"),
      count(lit(1)).as("v")).head()
    // empty training half: sums are null — zero counts, not an NPE
    val nGood = if (tot.isNullAt(0)) 0L else tot.getLong(0)
    val nBad = if (tot.isNullAt(1)) 0L else tot.getLong(1)
    val v = tot.getLong(2)
    val votes = tok.where(col("doc_id") % 2 === 1)
      .join(vocab, Seq("token"), "left")
      .withColumn("cg", coalesce(col("c_good"), lit(0L)))
      .withColumn("cb", coalesce(col("c_bad"), lit(0L)))
      .withColumn("lhs", (col("cg") + 1) * lit(nBad + v))
      .withColumn("rhs", (col("cb") + 1) * lit(nGood + v))
      // integer log2 quantization: bit length via length(bin(x))
      .withColumn("w", (length(expr("bin(lhs)")) - length(expr("bin(rhs)"))).cast("long"))
      .groupBy("doc_id", "weak_good")
      .agg(sum("w").as("score"))
    votes
      .withColumn("pred_good", col("score") > 0)
      .groupBy("weak_good", "pred_good")
      .agg(count(lit(1)).as("n_docs"), sum("score").as("sum_score"))
  }

  def d31ReferenceLm(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
    val model = tokenBigrams(docs.where(isBenchCol))
      .groupBy("gram").agg(count(lit(1)).as("ref_freq"))
    tokenBigrams(docs.where(!isBenchCol))
      .join(broadcast(model), Seq("gram"), "left")
      .groupBy("doc_id")
      .agg(
        count(lit(1)).as("n_bigrams"),
        count(when(col("ref_freq").isNull, 1)).as("n_unseen"),
        sum(coalesce(col("ref_freq"), lit(0L))).as("sum_ref_freq"))
      .withColumn("coverage",
        (col("n_bigrams") - col("n_unseen")).cast("double") /
          col("n_bigrams").cast("double"))
  }
}
