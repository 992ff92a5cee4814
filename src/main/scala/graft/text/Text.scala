package graft.text

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.Checkpoints.CutOps

/** Text-analysis operators over the `documents` table (SURVEY.md §2c).
  *
  * Everything here is pure `org.apache.spark.sql.functions._` column
  * algebra — whole-stage-codegen'd, no UDFs — so filters/projections
  * still push down to the parquet scan and the operators cost one pass
  * at any scale.
  */
object Text {

  /** Whitespace tokens (matches DuckDB `regexp_split_to_array(trim(x),'\s+')`). */
  def wsTokens(c: Column): Column = split(trim(c), "\\s+")

  /** English stopword list shared by the quality score and language ID.
    * Small on purpose: broadcast as a literal into codegen.
    */
  val StopEn: Seq[String] = Seq("the", "a", "an", "and", "or", "of", "to", "in", "is", "it")

  private def countIn(tokens: Column, words: Seq[String]): Column =
    size(filter(tokens, t => t.isin(words: _*)))

  /** d02: token counting — whitespace tokens, punct-aware regex tokens,
    * and a BPE-ish estimate (chars/4, the usual subword rule of thumb).
    */
  def d02TokenCount(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir).select(
      col("doc_id"),
      size(wsTokens(col("text"))).cast("long").as("n_ws_tokens"),
      size(regexp_extract_all(col("text"), lit("[A-Za-z0-9']+"), lit(0))).cast("long").as("n_re_tokens"),
      ceil(col("n_chars") / 4.0).cast("long").as("n_bpe_est"))

  /** d03: per-document quality scoring from cheap surface statistics
    * (alpha/upper/punct ratios + stopword density), combined into one
    * linear score. One projection, no shuffle.
    */
  def d03TextQuality(spark: SparkSession, dir: String): DataFrame = {
    val t = col("text")
    // null-safe divisor: empty text must yield null ratios, not a
    // DIVIDE_BY_ZERO crash under ANSI mode (RobustnessSpec)
    val nchars = when(length(t) === 0, lit(null)).otherwise(length(t)).cast("double")
    val toks = wsTokens(lower(t))
    val alphaRatio = length(regexp_replace(t, "[^A-Za-z]", "")).cast("double") / nchars
    val upperRatio = length(regexp_replace(t, "[^A-Z]", "")).cast("double") / nchars
    val punctRatio = length(regexp_replace(t, "[^.,;:!?]", "")).cast("double") / nchars
    val stopRatio = countIn(toks, StopEn).cast("double") /
      when(size(toks) === 0, lit(null)).otherwise(size(toks)).cast("double")
    Tables.documents(spark, dir).select(
      col("doc_id"),
      alphaRatio.as("alpha_ratio"),
      upperRatio.as("upper_ratio"),
      punctRatio.as("punct_ratio"),
      stopRatio.as("stop_ratio"),
      (alphaRatio * 0.5 + stopRatio * 0.3 + (lit(1.0) - punctRatio) * 0.1
        + (lit(1.0) - upperRatio) * 0.1).as("quality_score"))
  }

  /** Per-language stopword lists for the n-gram/stopword language-ID
    * heuristic (d04). Tiny lists → literal IN expressions in codegen.
    */
  val StopLists: Seq[(String, Seq[String])] = Seq(
    "en" -> StopEn,
    "es" -> Seq("el", "la", "los", "de", "que", "y", "en", "un", "una", "es"),
    "de" -> Seq("der", "die", "und", "das", "ein", "eine", "ist", "zu", "den", "mit"),
    "fr" -> Seq("le", "la", "les", "et", "des", "un", "une", "est", "que", "dans"),
    "zh" -> Seq("de", "shi", "le", "zai", "he", "you", "wo", "ta", "men", "zhe"))

  /** d04: language ID — score = stopword hits per language, argmax wins,
    * 'und' when nothing matches. A real system would use char n-gram
    * profiles; the *distributed shape* is identical (single projection).
    */
  def d04LangId(spark: SparkSession, dir: String): DataFrame = {
    val toks = wsTokens(lower(col("text")))
    val scored = Tables.documents(spark, dir)
      .select(col("doc_id") +: col("lang").as("lang_actual") +:
        StopLists.map { case (l, ws) => countIn(toks, ws).as(s"score_$l") }: _*)
    val best = greatest(StopLists.map { case (l, _) => col(s"score_$l") }: _*)
    // First language (in StopLists order) achieving the max score wins.
    val pred = StopLists.foldRight(lit("und")) { case ((l, _), acc) =>
      when(col(s"score_$l") === best && best > 0, lit(l)).otherwise(acc)
    }
    scored.select(col("doc_id"), col("lang_actual"), pred.as("lang_pred"),
      best.cast("long").as("best_score"))
  }

  /** d05: rolling document fingerprint — two independent polynomial
    * rolling hashes over the whitespace tokens (each token itself a
    * polynomial hash of its characters), mod 1e9+7, packed into one
    * ~60-bit value as `h1 * P + h2`. Order-sensitive and whitespace-
    * normalization-invariant like the usual xxhash chain, but chosen so
    * every intermediate stays below 2^63: a checked-arithmetic SQL
    * engine (the DuckDB oracle) computes the identical value — no
    * wrap-around semantics to replicate. `aggregate` fold, no UDFs.
    */
  val FpMod = 1000000007L

  def fingerprint(text: Column, native: Boolean = false): Column = {
    val P = lit(FpMod)
    def tokHash(seed: Long, m: Long)(t: Column): Column =
      if (native) call_function("graft_polyhash", t, lit(seed), lit(m))
      else aggregate(split(t, ""), lit(seed), (b, c) => (b * lit(m) + ascii(c)) % P)
    def docHash(seed: Long, mDoc: Long, mTok: Long): Column =
      aggregate(wsTokens(text), lit(seed),
        (a, t) => (a * lit(mDoc) + tokHash(seed, mTok)(t)) % P)
    docHash(17L, 131L, 31L) * P + docHash(19L, 137L, 37L)
  }

  def d05Fingerprint(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir).select(
      col("doc_id"),
      fingerprint(col("text"),
        native = spark.catalog.functionExists("graft_polyhash")).as("fingerprint"))

  /** d09: document chunking — sliding token windows (window 50,
    * stride 10), the standard shape for embedding/RAG prep. One
    * projection + explode; chunk count and boundaries are pure
    * arithmetic so the DuckDB oracle reproduces them exactly.
    */
  def d09Chunk(spark: SparkSession, dir: String): DataFrame =
    chunks(Tables.documents(spark, dir))

  /** Sliding-window chunking of any (doc_id, text) frame — shared by
    * d09 and the chunk-level dedup (d17).
    */
  def chunks(docs: DataFrame): DataFrame = {
    val window = 50
    val stride = 10
    docs
      .select(col("doc_id"), wsTokens(col("text")).as("toks"))
      .withColumn("n", size(col("toks")))
      .select(col("doc_id"),
        explode(expr(
          s"""transform(sequence(0, cast(floor(greatest(n - $window, 0) / $stride) as int)),
             | i -> struct(cast(i as bigint) AS chunk_id,
             |             concat_ws(' ', slice(toks, i*$stride + 1, $window)) AS chunk_text,
             |             least($window, n - i*$stride) AS n_tokens))""".stripMargin)).as("c"))
      .select(col("doc_id"), col("c.chunk_id"), col("c.chunk_text"),
        col("c.n_tokens").cast("long").as("n_tokens"))
  }

  /** d12: TF-IDF — top-3 terms per document by tf·idf with
    * idf = ln((N+1)/(df+1)) + 1 (smoothed). Two hash aggregations
    * (term counts per doc, document frequency per term) + one join on
    * term; ranking ties break on the term itself so the result is
    * deterministic and matches the DuckDB oracle bit-for-bit.
    */
  def d12TfIdf(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val docs = Tables.documents(spark, dir)
    val terms = docs.select(col("doc_id"),
      explode(wsTokens(lower(col("text")))).as("term"))
    val tf = terms.groupBy("doc_id", "term").agg(count(lit(1)).as("tf"))
    val df = terms.select("doc_id", "term").distinct()
      .groupBy("term").agg(count(lit(1)).as("df"))
    val n = docs.count()
    val scored = tf.join(df, Seq("term"))
      .withColumn("tfidf",
        col("tf") * (log((lit(n.toDouble) + 1.0) / (col("df") + lit(1.0))) + 1.0))
    val w = Window.partitionBy("doc_id").orderBy(col("tfidf").desc, col("term"))
    scored.withColumn("rn", row_number().over(w)).where(col("rn") <= 3)
      .select(col("doc_id"), col("term"), col("tf"), col("df"), col("tfidf"))
  }

  /** d13: stratified sampling — per-language fractions (the standard
    * corpus-mixing primitive: upweight rare languages, downsample the
    * dominant one) via a DETERMINISTIC per-row hash threshold:
    * u(id) = (id mod P)·A + B mod P, keep iff u < frac(lang)·P.
    *
    * Unlike `sampleBy` (per-partition RNG), this is a pure function of
    * the row — the sample is identical under any partitioning, cluster
    * layout, or retry, which is what a reproducible training-data
    * pipeline needs; and the arithmetic stays below 2^63 so the DuckDB
    * oracle reproduces the exact row set. One scan, one projection,
    * map-side-combined roll-up.
    */
  val SampleMod = 1000000007L
  val SampleMulA = 900000011L
  val SampleAddB = 20260812L

  /** The deterministic keep-predicate shared by the batch sample (d13)
    * and its at-ingestion streaming deployment (s11): a pure function
    * of (doc_id, lang), so both must select the identical row set.
    */
  private[graft] def sampleKeepCol: Column = {
    val fractions = Seq("en" -> 0.5, "es" -> 0.3, "de" -> 0.3, "fr" -> 0.3, "zh" -> 0.1)
    val u = (col("doc_id") % SampleMod) * SampleMulA % SampleMod + SampleAddB
    val thr = fractions.foldLeft(lit(-1L)) { case (acc, (l, f)) =>
      when(col("lang") === l, lit(math.floor(f * SampleMod).toLong)).otherwise(acc)
    }
    u % SampleMod < thr
  }

  def d13StratifiedSample(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .where(sampleKeepCol)
      .groupBy("lang").agg(count(lit(1)).as("n_sampled"))

  /** d22: corpus profile — the per-language length-distribution
    * dashboard a corpus owner reads before every training run: document
    * counts and character volume per (language, length bucket), plus
    * each bucket's share of its language. The histogram buckets are
    * fixed-width (50 chars, clamped at bucket 11) so the profile is
    * comparable across snapshots.
    *
    * Scale shape: one map-side-combined groupBy to a ~|langs × 12|-row
    * aggregate; the share window runs over that tiny frame (partitioned
    * by language), never over the corpus. The share is a ratio of two
    * exact integer counts — one double division, bit-identical on any
    * engine.
    */
  def d22CorpusProfile(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val bucket = least(floor(col("n_chars") / lit(50)), lit(11L)).cast("long")
    val byLang = Window.partitionBy(col("lang"))
    Tables.documents(spark, dir)
      .groupBy(col("lang"), bucket.as("len_bucket"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_chars")).as("sum_chars"))
      .select(col("lang"), col("len_bucket"), col("n_docs"), col("sum_chars"),
        (col("n_docs").cast("double") / sum(col("n_docs")).over(byLang).cast("double"))
          .as("lang_share"))
  }

  /** d24: document rarity scoring — a vocabulary-statistics quality
    * signal (the cheap stand-in for an LM perplexity filter): for each
    * document, the mean and minimum DOCUMENT FREQUENCY of its distinct
    * terms. Documents full of corpus-rare terms (low mean_df) are
    * gibberish/OCR-noise candidates; documents of only ubiquitous
    * terms (high mean_df) are boilerplate candidates. All-integer
    * statistics + one exact division — no log/float accumulation to
    * diverge cross-engine.
    *
    * Scale shape: explode → two map-side-combined aggregates (df per
    * term, stats per doc) + one join keyed by term. The df table is
    * vocabulary-sized; no global sort or rank anywhere (rank-based
    * rarity would need one — df-based rarity deliberately doesn't).
    */
  def d24DocRarity(spark: SparkSession, dir: String): DataFrame = {
    val terms = Tables.documents(spark, dir)
      .select(col("doc_id"), explode(array_distinct(wsTokens(lower(col("text"))))).as("term"))
    val df = terms.groupBy("term").agg(count(lit(1)).as("df"))
    terms.join(df, Seq("term"))
      .groupBy("doc_id")
      .agg(
        count(lit(1)).as("n_terms"),
        min(col("df")).as("min_df"),
        (sum(col("df")).cast("double") / count(lit(1)).cast("double")).as("mean_df"))
  }

  /** d10: corpus vocabulary — global term frequencies, top 100 terms.
    * Explode + hash groupBy (map-side combined); the classic vocab
    * build. Deterministic tie-break by term.
    */
  def d10TermFreq(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .select(explode(wsTokens(lower(col("text")))).as("term"))
      .groupBy("term")
      .agg(count(lit(1)).as("freq"))
      .orderBy(col("freq").desc, col("term"))
      .limit(100)

  /** d05's token hash as a standalone column (seed 17, mult 31,
    * mod 1e9+7): native fused loop when the extension is present,
    * bit-identical `aggregate` fold otherwise.
    */
  private def polyTermHash(t: Column, native: Boolean): Column =
    if (native) call_function("graft_polyhash", t, lit(17L), lit(31L))
    else aggregate(split(t, ""), lit(17L), (b, c) => (b * lit(31L) + ascii(c)) % lit(FpMod))

  /** The d32 count-min layout: d=4 hash rows × w=1024 counters. Each
    * row maps a token hash to a bucket through its own mod-prime
    * affine map; the per-row maps share nothing, so a collision in one
    * row is independent of the others and min-over-rows debiases the
    * estimate.
    */
  private val CmsRows = Seq((1000003L, 17L), (999983L, 7919L), (1000033L, 101L), (999979L, 271L))
  private val CmsWidth = 1024

  private def cmsBuckets(th: Column): Column = array(
    CmsRows.zipWithIndex.map { case ((a, b), r) =>
      struct(lit(r).as("r"), (((th * lit(a) + lit(b)) % lit(FpMod)) % lit(CmsWidth)).as("bucket"))
    }: _*)

  /** d32: count-min term-frequency sketch — the bounded-state at-scale
    * twin of d10's exact vocabulary (the q09↔q36 pattern for term
    * counts). An exact vocab build shuffles every distinct term; the
    * CMS build shuffles at most d·w = 4096 counter rows no matter how
    * large the vocabulary is (the token stream map-side-combines into
    * per-partition counter partials — the sketch is mergeable by
    * construction, the property that lets every shard of a 100 TB
    * corpus build its own and sum them). Point queries then never
    * rescan the corpus: a term's estimate is the MIN over its d row
    * counters (always ≥ the true count, biased only by collisions).
    * Served here for a fixed panel — the distinct terms of the first
    * 20 documents — ranked by estimate: everything is exact integer
    * counts and deterministic bucket arithmetic, so the DuckDB oracle
    * reproduces the whole sketch bit-for-bit.
    */
  def d32CmsTermfreq(spark: SparkSession, dir: String): DataFrame = {
    val native = spark.catalog.functionExists("graft_polyhash")
    val docs = Tables.documents(spark, dir)
    val counters = docs
      .select(explode(wsTokens(lower(col("text")))).as("term"))
      .select(polyTermHash(col("term"), native).as("th"))
      .select(explode(cmsBuckets(col("th"))).as("rb"))
      .groupBy(col("rb.r").as("r"), col("rb.bucket").as("bucket"))
      .agg(count(lit(1)).as("cnt"))
    val panel = docs.where(col("doc_id") < 20)
      .select(explode(wsTokens(lower(col("text")))).as("term")).distinct()
      .select(col("term"), polyTermHash(col("term"), native).as("th"))
      .select(col("term"), explode(cmsBuckets(col("th"))).as("rb"))
      .select(col("term"), col("rb.r").as("r"), col("rb.bucket").as("bucket"))
    panel.join(broadcast(counters), Seq("r", "bucket"))
      .groupBy("term").agg(min(col("cnt")).as("est_freq"))
      .orderBy(col("est_freq").desc, col("term"))
      .limit(50)
  }

  /** Heavy-hitter threshold: a term is heavy when it covers more than
    * ~0.2% of the token stream (N div 500 + 1 occurrences — strict
    * integer arithmetic shared with the oracle).
    */
  private def hhThreshold(n: Long): Long = n / 500L + 1L

  /** The d34 candidate filter: the CMS counters collected into one
    * flat (d·w)-long literal and probed per token — exposed separately
    * so the spec can pin the superset guarantee (candidates ⊇ true
    * heavy hitters, est ≥ truth) and the strict vocabulary pruning.
    * Returns (filtered token frame, threshold).
    */
  private[graft] def d34Candidates(
      spark: SparkSession, dir: String): (DataFrame, Long) = {
    val native = spark.catalog.functionExists("graft_polyhash")
    val toks = Tables.documents(spark, dir)
      .select(explode(wsTokens(lower(col("text")))).as("term"))
    // pass 1: the mergeable counter build (d32's kernel) — at most
    // d·w = 4096 rows reach the driver no matter the vocabulary size
    val counters = new Array[Long](CmsRows.length * CmsWidth)
    toks.select(polyTermHash(col("term"), native).as("th"))
      .select(explode(cmsBuckets(col("th"))).as("rb"))
      .groupBy(col("rb.r").as("r"), col("rb.bucket").as("bucket"))
      .agg(count(lit(1)).as("cnt"))
      .collect()
      .foreach(r => counters(r.getInt(0) * CmsWidth + r.getLong(1).toInt) = r.getLong(2))
    // every token lands in exactly one bucket per row: row 0's counter
    // sum IS the stream length — no separate counting scan
    val n = counters.take(CmsWidth).sum
    val t = hhThreshold(n)
    val cs = typedLit(counters.toSeq)
    val est = least(CmsRows.zipWithIndex.map { case ((a, b), r) =>
      element_at(cs,
        (((polyTermHash(col("term"), native) * lit(a) + lit(b)) % lit(FpMod)) % lit(CmsWidth))
          .cast("int") + lit(r * CmsWidth + 1))
    }: _*)
    (toks.where(est >= lit(t)), t)
  }

  /** d34: sketch-guided EXACT heavy hitters — "every term above 0.2%
    * of the token stream, with its exact count" (the d32↔d10 bridge:
    * d10's exact vocabulary shuffles every distinct term, d32's sketch
    * never rescans but only estimates; production trending/stopword
    * detection wants exact counts WITHOUT the vocabulary-sized
    * shuffle). Two passes: (1) build the CMS counters — mergeable,
    * bounded at d·w rows, the only full-vocabulary reduction; (2)
    * rescan the token stream probing the counters as a plan literal
    * (the d29 Bloom pattern — 32 KB riding the scan, no join) and keep
    * only tokens whose estimate clears the threshold, then exact-count
    * the survivors. CMS estimates dominate true counts, so the
    * candidate set provably contains every true heavy hitter (no false
    * negatives), and the final exact filter removes collision-inflated
    * impostors: the result is bit-identical to the naive full groupBy.
    *
    * Scale shape (100 TB): the exact-count shuffle carries only
    * candidate terms — |heavy hitters| + collision false positives
    * (tunable via sketch width) — instead of the ~10⁹-term web
    * vocabulary; all occurrences of a term share one estimate, so a
    * term either survives whole or is pruned whole.
    */
  def d34HeavyHitters(spark: SparkSession, dir: String): DataFrame = {
    val (cand, t) = d34Candidates(spark, dir)
    cand.groupBy("term").agg(count(lit(1)).as("freq"))
      .where(col("freq") >= lit(t))
  }

  /** d42: BPE merge-candidate mining — the distributed heart of
    * byte-pair-encoding tokenizer training (Sennrich et al. 2016): the
    * corpus-wide frequency of every adjacent symbol pair, ranked, is
    * exactly what one BPE merge round consumes (the top pair becomes
    * the next merge rule). Counting pairs over word OCCURRENCES equals
    * the textbook sum over word TYPES weighted by type frequency, so
    * the whole round is one codegen'd explode (each word emits its
    * len−1 adjacent char pairs) + one map-side-combined count — no
    * word-type table, no second shuffle. Output: the top-20 merge
    * candidates with exact counts and a dense rank (ties break on the
    * pair string, so the ranking is total and engine-independent).
    *
    * Scale shape (100 TB): the only exchange carries (pair, partial
    * count) — the key space is bounded by the ALPHABET squared (a few
    * thousand rows for any corpus, any size), so map-side combine
    * collapses each task's stream to a constant-size frame before the
    * shuffle, and the final rank sorts a table whose size is
    * independent of corpus size. Subsequent merge rounds re-run the
    * same plan over re-segmented symbols; the per-round cost never
    * grows past alphabet'² where alphabet' = chars + learned merges.
    */
  def d42BpePairs(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val words = Tables.documents(spark, dir)
      .select(explode(wsTokens(col("text"))).as("w"))
      .where(length(col("w")) >= 2)
    val pairs = words.select(explode(expr(
      "transform(sequence(1, length(w) - 1), i -> substring(w, i, 2))")).as("pair"))
    pairs.groupBy("pair").agg(count(lit(1)).as("n_pair"))
      // global window over the aggregated pair table: bounded by
      // |alphabet|² rows at ANY corpus size — never a data-sized sort
      .withColumn("rank", row_number().over(
        Window.orderBy(col("n_pair").desc, col("pair"))).cast("long"))
      .where(col("rank") <= 20)
  }

  /** Number of BPE merge rounds d42b trains. */
  val BpeMerges = 5

  /** d42b: the FULL BPE training loop (Sennrich et al. 2016) — d42
    * mined round 1's candidates; this runs [[BpeMerges]] actual merge
    * rounds with re-counting, the e13/f04 unrolled-declarative-loop
    * discipline. Per round: (1) adjacent-pair counts over the word-TYPE
    * table weighted by type frequency (map-side combine to ≤ alphabet'²
    * rows); (2) the argmax pair (count desc, pair asc — a total,
    * engine-independent order) broadcast to every word; (3) the merge
    * applied as a left fold over each word's symbol list — greedy
    * LEFTMOST non-overlapping, the reference BPE semantics ("aaa" with
    * rule a+a → ["aa","a"]). Output: the learned merge table — rank,
    * the two sides, the merged symbol, and the pair's corpus frequency
    * at selection time (exact integers).
    *
    * Scale shape (100 TB): the corpus is touched ONCE (word census →
    * (word, n) types); every merge round then runs on the TYPE table —
    * vocabulary-bounded, corpus-size-independent — with a constant-size
    * pair census and a 1-row broadcast per round. Each round's type
    * table is materialized (localCheckpoint — the e23 iterative-lineage
    * discipline). The fold itself is a higher-order function
    * (CodegenFallback) applied per word TYPE, not per occurrence — the
    * one place the non-codegen cost is provably off the hot path.
    *
    * Oracle independence: the Spark side merges via the left fold; the
    * DuckDB side replays greedy-leftmost as gaps-and-islands alternation
    * over match positions — two independent formulations of the same
    * semantics that must (and do) agree bit-for-bit.
    */
  def d42bBpeTrain(spark: SparkSession, dir: String): DataFrame =
    bpeLoop(spark, dir, minLen = 2)._2.reduce(_ unionByName _)

  /** The shared BPE merge loop: word-TYPE table → [[BpeMerges]] rounds
    * of (pair census → argmax → greedy-leftmost merge). Returns the
    * final merged type table and the per-round merge-rule layers.
    * `minLen` filters the word census: d42b trains on ≥ 2-char words
    * (1-char words generate no pairs, so the LEARNED RULES are
    * identical either way — only the type table differs); d42c
    * tokenizes the whole corpus, 1-char words included.
    */
  private[graft] def bpeLoop(spark: SparkSession, dir: String, minLen: Int)
      : (DataFrame, List[DataFrame]) = {
    val types0 = Tables.documents(spark, dir)
      .select(explode(wsTokens(col("text"))).as("w"))
      .where(length(col("w")) >= minLen)
      .groupBy("w").agg(count(lit(1)).as("n"))
      .select(expr("transform(sequence(1, length(w)), i -> substring(w, i, 1))").as("syms"),
        col("n"))
      .cutLineage
    val layers = (1 to BpeMerges).foldLeft(
        (types0, List.empty[DataFrame])) { case ((types, acc), rank) =>
      // 1-symbol types contribute no pairs; drop them BEFORE the
      // explode (sequence(1, 0) is Spark's DESCENDING [1,0], not
      // empty — unguarded it indexes past the array).
      val counts = types
        .where(size(col("syms")) >= 2)
        .select(explode(expr(
          "transform(sequence(1, size(syms) - 1), " +
            "i -> struct(element_at(syms, i) AS a, element_at(syms, i + 1) AS b))")).as("p"),
          col("n"))
        .groupBy(col("p.a").as("ma"), col("p.b").as("mb"))
        .agg(sum("n").as("n_pair"))
      val best = counts
        .orderBy(col("n_pair").desc, col("ma"), col("mb")).limit(1)
      val merged = types.crossJoin(broadcast(best.select("ma", "mb")))
        .select(expr(
          "aggregate(syms, cast(array() as array<string>), (acc, x) -> " +
            "if(size(acc) > 0 and element_at(acc, size(acc)) = ma and x = mb, " +
            "   concat(slice(acc, 1, size(acc) - 1), array(concat(ma, mb))), " +
            "   concat(acc, array(x))))").as("syms"),
          col("n"))
        .cutLineage
      val layer = best.select(lit(rank.toLong).as("merge_rank"),
        col("ma").as("left_sym"), col("mb").as("right_sym"),
        concat(col("ma"), col("mb")).as("merged_sym"), col("n_pair"))
      (merged, layer :: acc)
    }
    (layers._1, layers._2.reverse)
  }

  /** d42c: the corpus TOKENIZED with the learned merge table — the
    * pass a training pipeline actually ships after d42b trains: every
    * word (1-char words included — they just never merge) encoded by
    * the [[BpeMerges]] rules in rank order, reduced to the corpus
    * token census (token, occurrences, rank; top-20 — the vocabulary
    * head a tokenizer report leads with).
    *
    * Scale shape: the corpus is touched once for the word census;
    * encoding runs per word TYPE (vocabulary-bounded, the d42b
    * discipline), and the census aggregates occurrence-weighted
    * symbol counts to a frame bounded by |alphabet| + [[BpeMerges]]
    * rows before the final constant-size rank.
    */
  def d42cBpeTokenize(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val (types, _) = bpeLoop(spark, dir, minLen = 1)
    types.select(explode(col("syms")).as("token"), col("n"))
      .groupBy("token").agg(sum("n").as("n_occ"))
      .withColumn("rank", row_number().over(
        Window.orderBy(col("n_occ").desc, col("token"))).cast("long"))
      .where(col("rank") <= 20)
  }

  /** d47: trainable language ID — a multinomial Naive Bayes unigram
    * classifier (the fastText-style linear text classifier's exact
    * probabilistic ancestor), trained on the corpus's own (lang, token)
    * census and evaluated by self-classification. Per doc and language:
    * `score = ln P(l) + Σ_tok cnt·ln(c(l,tok)+1) − n_toks·ln(n_l + V)`
    * (Laplace-1 smoothing; the unseen-token term folds into the
    * per-language constant, so only OBSERVED (lang, token) cells ever
    * join). Argmax on the RAW double score (ties to the smaller
    * language id): scores for different languages differ by O(n_toks)
    * nats, so cross-engine summation ulps (~1e-11) cannot flip the
    * winner. Output: the confusion census (lang_actual, lang_pred,
    * n_docs) — integers only, bounded by |langs|².
    *
    * Contrast with [[d04LangId]]: d04 is the fixed-stoplist heuristic
    * (zero training); d47 is the learned model a real curation
    * pipeline fits on labeled seed data and applies to the firehose.
    *
    * Scale shape: one token-explode census with map-side combine
    * (vocabulary-keyed, text never shuffles); scoring joins the
    * per-doc token MULTISET (doc_id, tok, cnt) to the census on the
    * token key (fan-out ≤ |langs|); priors and per-language constants
    * are |langs|-row broadcast frames; the argmax window partitions by
    * doc over |langs| rows.
    */
  def d47NbLangid(spark: SparkSession, dir: String): DataFrame =
    nbLangidFrom(Tables.documents(spark, dir))

  /** The NB train + self-classify kernel over any (doc_id, lang, text)
    * frame — d47 feeds it the documents table; specs feed it synthetic
    * disjoint-vocabulary corpora where the Bayes-optimal answer is
    * known exactly.
    */
  private[graft] def nbLangidFrom(docs: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val toks = docs.select(col("doc_id"), col("lang"),
      explode(wsTokens(lower(col("text")))).as("tok"))
    val census = toks.groupBy(col("lang").as("model_lang"), col("tok"))
      .agg(count(lit(1)).as("c")).cutLineage
    val v = census.agg(countDistinct("tok").cast("double").as("v"))
    val nDocs = docs.agg(count(lit(1)).cast("double").as("n_docs"))
    val priors = docs.groupBy(col("lang").as("model_lang"))
      .agg(count(lit(1)).as("n_lang_docs"))
      .crossJoin(broadcast(nDocs))
      .select(col("model_lang"),
        log(col("n_lang_docs") / col("n_docs")).as("log_prior"))
    val langConst = census.groupBy("model_lang")
      .agg(sum("c").as("n_l"))
      .crossJoin(broadcast(v))
      .select(col("model_lang"),
        log(col("n_l").cast("double") + col("v")).as("log_denom"))
    val dt = toks.groupBy("doc_id", "tok").agg(count(lit(1)).as("cnt"))
    val contrib = dt.join(census, Seq("tok"))
      .groupBy("doc_id", "model_lang")
      .agg(sum(col("cnt") * log(col("c").cast("double") + lit(1.0)))
        .as("sum_log_c"))
    val docLen = dt.groupBy("doc_id")
      .agg(sum("cnt").cast("double").as("n_toks"))
    val scored = docs.select(col("doc_id"), col("lang").as("lang_actual"))
      .join(docLen, Seq("doc_id"))
      .crossJoin(broadcast(priors))
      .join(contrib, Seq("doc_id", "model_lang"), "left")
      .join(broadcast(langConst), Seq("model_lang"))
      .select(col("doc_id"), col("lang_actual"), col("model_lang"),
        (col("log_prior") + coalesce(col("sum_log_c"), lit(0.0)) -
          col("n_toks") * col("log_denom")).as("score"))
    scored
      .withColumn("rn", row_number().over(Window.partitionBy("doc_id")
        .orderBy(col("score").desc, col("model_lang"))))
      .where(col("rn") === 1)
      .groupBy(col("lang_actual"), col("model_lang").as("lang_pred"))
      .agg(count(lit(1)).as("n_docs"))
  }
}
