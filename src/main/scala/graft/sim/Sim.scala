package graft.sim

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables
import graft.Checkpoints.CutOps

/** Similarity search over the `embeddings` table (SURVEY.md §2c).
  *
  * Scale design (100 TB):
  *  - the query set is always the small side and is `broadcast()`;
  *  - dot products / norms run through the native codegen'd
  *    [[graft.functions.DotProduct]] expression when installed (plain
  *    fused loop, no per-pair allocation), falling back to the
  *    composable zip_with+aggregate fold; both keep the deterministic
  *    left-to-right sum the DuckDB oracle (`list_dot_product`) uses;
  *  - e01 is the exact brute-force baseline (linear scan per query —
  *    correct at any scale but O(N·Q));
  *  - e02/e03 use random-hyperplane LSH buckets so candidate generation
  *    is a hash join on bucket ids instead of a cross join: this is the
  *    scale path, with the hyperplanes derived from xxhash64 so every
  *    executor regenerates them deterministically — nothing to ship.
  */
object Sim {

  /** Number of sign bits in the hyperplane signature for e02 ANN: 256
    * buckets keeps buckets non-degenerate at test scale; at 100 TB you
    * would raise it (more, smaller buckets) and multi-probe.
    */
  val SigBits = 8

  /** e03 embed-dedup uses a wider 16-bit signature (65 536 buckets) so
    * buckets stay small enough for a within-bucket self-join, with
    * hamming-1 multi-probe recovering pairs that straddle one sign flip.
    */
  val DedupSigBits = 16

  /** Stop-bucket cap for the e03 self-join, same idea as
    * [[graft.dedup.Dedup.MaxBucket]]: a degenerate bucket (all-zero /
    * boilerplate embeddings at web scale) would make the within-bucket
    * join quadratic; buckets above the cap are dropped from candidate
    * generation.
    */
  val MaxBucketE = 64

  /** Dot product: the native codegen'd [[graft.functions.DotProduct]]
    * when the graft extensions are installed in this session, otherwise
    * the composable zip_with/aggregate fold (bit-identical results —
    * same left-to-right summation).
    */
  private[graft] def dotOf(spark: SparkSession, a: String, b: String): Column =
    if (spark.catalog.functionExists("graft_dot")) expr(s"graft_dot($a, $b)")
    else expr(s"aggregate(zip_with($a, $b, (x, y) -> x*y), 0D, (acc, x) -> acc + x)")

  /** Embeddings with the float vector cast to double (`v`) plus its
    * norm. `cast` (not `transform(.., x -> cast(..))`): element-wise
    * array casts codegen, higher-order functions are CodegenFallback
    * and would drop the whole projection out of codegen.
    */
  private[graft] def emb(spark: SparkSession, dir: String): DataFrame =
    Tables.embeddings(spark, dir)
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
      .withColumn("nrm", sqrt(dotOf(spark, "v", "v")))
      // a zero/corrupt vector has no cosine direction — and its zero
      // norm would crash every cosine division under ANSI mode. Drop
      // it here so all five similarity operators are covered at once.
      .where(col("nrm") > 0.0)

  /** e01: exact brute-force cosine top-k for the first 20 vectors as
    * queries. Query side broadcast; data side scanned once.
    */
  def e01KnnCosine(spark: SparkSession, dir: String): DataFrame = {
    val e = emb(spark, dir)
    val q = e.where(col("vec_id") < 20)
      .select(col("vec_id").as("query_id"), col("v").as("qv"), col("nrm").as("qn"))
    val scored = e.crossJoin(broadcast(q))
      .where(col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id").as("neighbor_id"),
        (dotOf(spark, "qv", "v") / (col("qn") * col("nrm"))).as("cosine"))
    val w = Window.partitionBy("query_id").orderBy(col("cosine").desc, col("neighbor_id"))
    scored.withColumn("rn", row_number().over(w)).where(col("rn") <= 10)
      .select("query_id", "neighbor_id", "cosine")
  }

  /** e22: IVF SKEW AUDIT — the health check an index operator runs
    * before (and after) every re-train: inverted-list sizes against the
    * balanced ideal. A hot list (clustered embedding mass — near-dup
    * floods, template pages) makes every probe that touches it pay
    * list-size work, so serving latency follows the MAX list, not the
    * mean; the audit reports each list's share, its ratio to the
    * balanced mean, and the operational flag (ratio > 2 ⇒ split/re-seed
    * this cell — FAISS's imbalance_factor discipline). Output k rows.
    *
    * Scale shape: e04's assignment (broadcast centroids, map-side
    * argmin) followed by a k-row census — the audit itself touches no
    * vector after the one assignment pass.
    */
  def e22IvfSkewAudit(spark: SparkSession, dir: String): DataFrame = {
    val e = emb(spark, dir)
    val centsDf = centroidsDf(spark, fitCentroids(e))
    val census = assignToNearest(spark, e, centsDf)
      .groupBy(col("centroid_id")).agg(count(lit(1)).as("n_vecs"))
    val tot = census.agg(sum("n_vecs").cast("double").as("total"),
      count(lit(1)).cast("double").as("k"))
    census.crossJoin(broadcast(tot))
      .select(col("centroid_id").cast("long").as("centroid_id"),
        col("n_vecs"),
        (col("n_vecs") / col("total")).as("list_share"),
        (col("n_vecs") * col("k") / col("total")).as("skew_ratio"),
        (col("n_vecs") * col("k") / col("total") > 2.0).as("needs_split"))
  }

  /** e21: SHARDED kNN serving — the scale-OUT topology every
    * production vector store runs (FAISS/Milvus shard-and-merge): the
    * corpus is hash-sharded, every query fans out to all shards, each
    * shard answers its LOCAL exact top-k over corpus/S vectors, and the
    * coordinator merges S small top-k lists. Because every shard
    * returns its full local top-k, the merged top-k provably equals the
    * unsharded answer (any global top-k member is top-k within its own
    * shard) — spec-pinned equal to e01, and the oracle IS e01's.
    *
    * Scale shape: the per-shard window buffers only k rows per (query,
    * shard) group (WindowGroupLimit); the merge ranks S·k ≈ 40 rows per
    * query regardless of corpus size. The brute-force local scan stands
    * in for each shard's index (e04/e07 plug in per shard unchanged);
    * what this operator adds is the routing + merge contract.
    */
  val KnnShards = 4

  def e21ShardedKnn(spark: SparkSession, dir: String): DataFrame = {
    val e = emb(spark, dir).withColumn("shard", pmod(col("vec_id"), lit(KnnShards.toLong)))
    val q = e.where(col("vec_id") < 20)
      .select(col("vec_id").as("query_id"), col("v").as("qv"), col("nrm").as("qn"))
    val scored = e.crossJoin(broadcast(q))
      .where(col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("shard"), col("vec_id").as("neighbor_id"),
        (dotOf(spark, "qv", "v") / (col("qn") * col("nrm"))).as("cosine"))
    // each shard's LOCAL top-k: the only window that sees corpus-sized
    // input, group-limited to k rows per (query, shard)
    val local = Window.partitionBy("query_id", "shard")
      .orderBy(col("cosine").desc, col("neighbor_id"))
    val perShard = scored.withColumn("rn", row_number().over(local))
      .where(col("rn") <= 10).drop("rn")
    // coordinator merge: S·k rows per query, constant at any corpus size
    val merge = Window.partitionBy("query_id")
      .orderBy(col("cosine").desc, col("neighbor_id"))
    perShard.withColumn("rn", row_number().over(merge)).where(col("rn") <= 10)
      .select("query_id", "neighbor_id", "cosine")
  }

  /** Random-hyperplane signature: bit j = sign(v · h_j) where
    * h_j[d] = ±1 from the parity of ((a_j·(d+1) + b_j) mod P)² mod P
    * (a_j, b_j from the same universal-hash family as the MinHash
    * permutations; the squaring wraps mod P so the parity mixes).
    * Mod-prime arithmetic keeps every intermediate below 2^63, so the
    * DuckDB oracle regenerates identical hyperplanes — and so does
    * every executor, in codegen: the "model" is free to distribute.
    */
  def bucketCol: Column = bucketColOf(SigBits)

  /** Native fused loop ([[graft.functions.HyperplaneSig]]) when the
    * extension is registered — the composable chain below is
    * CodegenFallback and is paid per corpus row in every ANN operator.
    * Bit-identical either way (same weights, same left-to-right
    * per-bit summation), so buckets and oracles are unchanged.
    */
  def bucketColOf(bits: Int): Column = bucketColOf(bits, None)

  def bucketColOf(bits: Int, session: Option[SparkSession]): Column =
    if (session.exists(_.catalog.functionExists("graft_hypersig")))
      expr(s"graft_hypersig(v, $bits)")
    else bucketColFallback(bits)

  def bucketColFallback(bits: Int): Column = {
    val P = 1000000007L
    val h1 = s"((((j+1) * 906150257L) % $P * (d + 1) + (j * 741103597L + 13L) % $P) % $P)"
    expr(
      s"""aggregate(zip_with(
         |   transform(sequence(0, ${bits - 1}), j ->
         |     aggregate(zip_with(v, transform(sequence(0, size(v)-1), d ->
         |         cast(($h1 * $h1 % $P % 2) * 2 - 1 as double)),
         |       (x, w) -> x * w), 0D, (a, x) -> a + x)),
         |   sequence(0, ${bits - 1}),
         |   (s, j) -> if(s > 0D, shiftleft(1L, j), 0L)),
         | 0L, (a, x) -> a | x)""".stripMargin)
  }

  /** Hamming-≤2 multi-probe set over a `bucket` column: the bucket
    * itself, every 1-bit flip, every 2-bit flip (1 + b + b(b−1)/2
    * probes). Shared by e02 (in-memory index) and e06 (persisted
    * index) so the two paths probe identically by construction.
    */
  private[graft] def probeExprOf(b: Int): String =
    s"array_union(array_union(array(bucket), " +
      s"transform(sequence(0, ${b - 1}), j -> bucket ^ shiftleft(1L, j))), " +
      s"flatten(transform(sequence(0, ${b - 2}), j -> " +
      s"transform(sequence(j + 1, ${b - 1}), k -> " +
      s"bucket ^ shiftleft(1L, j) ^ shiftleft(1L, k)))))"

  /** e02: LSH-bucketed approximate NN — hash join on bucket id, cosine
    * rank within the probed buckets. Multi-probe: each query also
    * probes every bucket within hamming distance 2 of its own signature
    * (1 + 8 + 28 probes) — the standard recall lever that costs probe
    * fan-out on the tiny query side only, never a wider scan of the
    * corpus. Same queries/top-k contract as e01.
    */
  def e02AnnLsh(spark: SparkSession, dir: String): DataFrame = {
    val e = emb(spark, dir).withColumn("bucket", bucketColOf(SigBits, Some(spark)))
    val q = e.where(col("vec_id") < 20)
      .select(col("vec_id").as("query_id"), col("v").as("qv"),
        col("nrm").as("qn"),
        explode(expr(probeExprOf(SigBits))).as("bucket"))
    val scored = e.join(broadcast(q), Seq("bucket"))
      .where(col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id").as("neighbor_id"),
        (dotOf(spark, "qv", "v") / (col("qn") * col("nrm"))).as("cosine"))
      .dropDuplicates("query_id", "neighbor_id")
    val w = Window.partitionBy("query_id").orderBy(col("cosine").desc, col("neighbor_id"))
    scored.withColumn("rn", row_number().over(w)).where(col("rn") <= 10)
      .select("query_id", "neighbor_id", "cosine")
  }

  /** e16: approximate RANGE search (FAISS `range_search`) — "every
    * corpus vector within cosine ≥ 0.99 of each query", no k: the
    * radius query that powers near-duplicate lookup, copyright
    * matching, and dedup-at-serve-time, where the answer SIZE is the
    * signal (top-k would pad misses with irrelevant neighbors and
    * truncate dense hits). Corpus = the embeddings plus e03's planted
    * perturbed twins (byte-distinct, cosine ≈ 1), so radius hits are
    * real. Candidates come from the e02 bucket join (8-bit hyperplane
    * signature, hamming-≤2 multi-probe on the tiny query side); every
    * candidate is scored exactly and the radius predicate — not a
    * rank — decides membership.
    *
    * Scale shape: identical to e02 — the corpus never cross-joins
    * anything; probes fan out on the query side only; the per-bucket
    * hash join is the only corpus-wide contact. The radius filter is
    * applied AFTER exact scoring, so the LSH tier only affects recall
    * (which the spec measures via the planted twins), never precision.
    */
  def e16RangeSearch(spark: SparkSession, dir: String): DataFrame = {
    val base = emb(spark, dir)
    val perturbed = base
      .select((col("vec_id") + 100000L).as("vec_id"),
        expr("transform(v, x -> x * 1.0005d + 0.0001d)").as("v")) // corpus construction only — not a hot path
      .withColumn("nrm", sqrt(dotOf(spark, "v", "v")))
    val corpus = base.unionByName(perturbed)
      .withColumn("bucket", bucketColOf(SigBits, Some(spark)))
    val q = base.where(col("vec_id") < 20)
      .withColumn("bucket", bucketColOf(SigBits, Some(spark)))
      .select(col("vec_id").as("query_id"), col("v").as("qv"),
        col("nrm").as("qn"), explode(expr(probeExprOf(SigBits))).as("bucket"))
    corpus.join(broadcast(q), Seq("bucket"))
      .where(col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id").as("neighbor_id"),
        (dotOf(spark, "qv", "v") / (col("qn") * col("nrm"))).as("cosine"))
      .dropDuplicates("query_id", "neighbor_id")
      .where(col("cosine") >= 0.99)
  }

  /** e17: HYBRID lexical + vector retrieval with reciprocal-rank
    * fusion — the production RAG/search serving shape (Elasticsearch
    * "hybrid query", Vespa, Weaviate): a lexical inverted-index
    * ranking and a dense-vector ranking each produce a top-100 list
    * per query, and RRF (`Σ 1/(60+rank)`) fuses them so documents that
    * score well under EITHER modality surface — rank fusion needs no
    * score calibration between BM25-scale and cosine-scale numbers,
    * which is why it is the industry default. Corpus = the documents
    * table joined 1:1 with its embeddings (doc_id = vec_id); queries
    * are the id < 20 panel; the lexical score is exact distinct-term
    * overlap with the query document.
    *
    * Scale shape: the lexical list IS an inverted-index join — terms
    * explode once (the d10 shape), the 20-query term table broadcasts,
    * exact overlap counts map-side-combine on (query, doc), and the
    * top-100 cut is a keyed window. The vector list here is e01's
    * exact kernel (the oracle-able baseline; any e-family ANN plugs
    * into the same contract). Fusion then touches ≤ 2·100 rows per
    * query: a full-outer join on (query_id, id) — absent ranks
    * contribute 0, the standard RRF-over-union rule — and a keyed
    * top-10 window. All rank arithmetic is integer; the only doubles
    * are the final `1/(60+r)` terms, bit-reproducible cross-engine.
    */
  def e17HybridSearch(spark: SparkSession, dir: String): DataFrame = {
    val TopList = 100
    val e = emb(spark, dir)
    val q = e.where(col("vec_id") < 20)
      .select(col("vec_id").as("query_id"), col("v").as("qv"), col("nrm").as("qn"))
    val vecScored = e.crossJoin(broadcast(q))
      .where(col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id").as("id"),
        (dotOf(spark, "qv", "v") / (col("qn") * col("nrm"))).as("cosine"))
    val wV = Window.partitionBy("query_id").orderBy(col("cosine").desc, col("id"))
    val vecList = vecScored.withColumn("r_vec", row_number().over(wV).cast("long"))
      .where(col("r_vec") <= TopList).select("query_id", "id", "r_vec")

    val terms = Tables.documents(spark, dir)
      .select(col("doc_id"),
        explode(array_distinct(graft.text.Text.wsTokens(lower(col("text"))))).as("term"))
    val qTerms = terms.where(col("doc_id") < 20)
      .select(col("doc_id").as("query_id"), col("term"))
    val overlap = terms.join(broadcast(qTerms), Seq("term"))
      .where(col("doc_id") =!= col("query_id"))
      .groupBy(col("query_id"), col("doc_id").as("id"))
      .agg(count(lit(1)).as("n_shared"))
    val wL = Window.partitionBy("query_id").orderBy(col("n_shared").desc, col("id"))
    val lexList = overlap.withColumn("r_lex", row_number().over(wL).cast("long"))
      .where(col("r_lex") <= TopList).select("query_id", "id", "r_lex")

    val fused = vecList.join(lexList, Seq("query_id", "id"), "full_outer")
      .withColumn("rrf",
        coalesce(lit(1.0) / (lit(60L) + col("r_vec")), lit(0.0)) +
          coalesce(lit(1.0) / (lit(60L) + col("r_lex")), lit(0.0)))
    val wF = Window.partitionBy("query_id").orderBy(col("rrf").desc, col("id"))
    fused.withColumn("rn", row_number().over(wF)).where(col("rn") <= 10)
      .select(col("query_id"), col("id").as("neighbor_id"),
        coalesce(col("r_vec"), lit(0L)).as("r_vec"),
        coalesce(col("r_lex"), lit(0L)).as("r_lex"), col("rrf"))
  }

  /** e18: embedding DRIFT monitoring — the ML-ops check between corpus
    * generations ("did the upstream encoder / data mix shift?"): the
    * corpus splits into an OLD and NEW half by vec_id parity
    * (standing in for two nightly snapshots), per-label centroids are
    * computed on each half, and the per-label report carries both
    * populations and the squared L2 centroid displacement. Rising
    * drift on a stable label is the retrain/re-embed alarm; a label
    * whose population collapses is a data-mix regression.
    *
    * Scale shape: ONE pass — per-(half, label) vector sums via a
    * single `aggregate`-free posexplode + groupBy that map-side-
    * combines to ≤ 2·|labels|·dims rows; centroids and displacement
    * are arithmetic over that constant frame. Nothing row-wise
    * shuffles except the per-dim partial sums.
    */
  def e18EmbeddingDrift(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables.embeddings(spark, dir)
      .select(col("vec_id"), col("label").cast("long").as("label"),
        col("embedding"))
    val half = e.withColumn("is_new",
      (col("vec_id") % 2 === 1).cast("long"))
    val sums = half
      .select(col("is_new"), col("label"),
        posexplode(col("embedding").cast("array<double>")).as(Seq("dim", "x")))
      .groupBy("is_new", "label", "dim")
      .agg(count(lit(1)).as("n"), sum("x").as("sx"))
      .withColumn("mean", col("sx") / col("n"))
    val old = sums.where(col("is_new") === 0)
      .select(col("label"), col("dim"), col("mean").as("m_old"), col("n").as("n_old"))
    val neu = sums.where(col("is_new") === 1)
      .select(col("label"), col("dim"), col("mean").as("m_new"), col("n").as("n_new"))
    old.join(neu, Seq("label", "dim"))
      .groupBy("label")
      .agg(first(col("n_old")).as("n_old"), first(col("n_new")).as("n_new"),
        sum((col("m_old") - col("m_new")) * (col("m_old") - col("m_new")))
          .as("drift_sq"))
  }

  /** Version token of the embeddings input under `dir`: a fold over
    * the sorted (relative path, length, mtime) of its parquet DATA
    * files — a RECURSIVE listing, so a partitioned/nested layout
    * hashes the leaf files rather than the top-level directory
    * entries. Keys every persisted index path so (a) two dirs can
    * never collide the way a bare 32-bit `dir.hashCode` could, and
    * (b) if the data under `dir` is REPLACED across application runs
    * the token changes and the index rebuilds instead of serving the
    * stale graph. Memoized per (applicationId, dir): the serving
    * operators (annIndexPath/knnGraphIndex/mergedGraphIndex) resolve
    * the token per query, and an FS listing per lookup is a real
    * round-trip tax on remote stores — within one app lifetime the
    * input is assumed immutable (the same contract every Spark scan
    * holds once planned).
    */
  private val versionTokenCache =
    new java.util.concurrent.ConcurrentHashMap[(String, String), String]()

  /** Test hook: drop the memoized version token for (this app, dir) so
    * the next lookup re-lists the input — what a freshly started
    * application does with its empty memo. Specs use it to exercise
    * the cross-application boundary (shared-index reuse, replaced-
    * input rebuild) without paying a second SparkContext.
    */
  private[graft] def invalidateVersionToken(spark: SparkSession, dir: String): Unit = {
    versionTokenCache.remove((spark.sparkContext.applicationId, dir))
    // the corpus count memo keys the BUDGET tier (graphKOf /
    // maxBucketOf): after an in-app input replacement it must be
    // re-elected from the live count or the Spark side builds at a
    // stale K while the oracle elects from count(*) over the new data
    invalidateCorpusN(spark, dir)
  }

  private[graft] def dataVersionToken(spark: SparkSession, dir: String): String =
    versionTokenCache.computeIfAbsent(
      (spark.sparkContext.applicationId, dir),
      { _ =>
        import org.apache.hadoop.fs.{Path => HPath}
        val p = new HPath(s"$dir/embeddings.parquet")
        val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
        val base = p.toUri.getPath
        val files = scala.collection.mutable.ArrayBuffer
          .empty[(String, Long, Long)]
        if (fs.exists(p)) {
          val it = fs.listFiles(p, /* recursive = */ true)
          while (it.hasNext) {
            val s = it.next()
            val rel = s.getPath.toUri.getPath.stripPrefix(base)
            // Hadoop FS bookkeeping files don't version the data
            if (!rel.contains("/_") && !rel.contains("/."))
              files += ((rel, s.getLen, s.getModificationTime))
          }
        }
        val h = files.sortBy(_._1).foldLeft(1125899906842597L) {
          case (acc, (rel, len, mtime)) =>
            ((acc * 31 + rel.hashCode) * 31 + len) * 31 + mtime
        }
        java.lang.Long.toHexString(h)
      })

  /** Cross-application index sharing (`spark.graft.ann.indexShared`,
    * default false): when true the persisted serving artifacts (e06
    * ANN index, e23 k-NN graph, e27 merged graph) drop the appId
    * component from their path, so every application serving the same
    * (input dir, data version) reuses ONE artifact instead of each
    * app rebuilding its own — the production posture, where serving
    * apps restart daily but the nightly index does not. Staleness is
    * still covered: the data-version token in the path changes when
    * the input is replaced, so a new application rebuilds exactly
    * when the data moved and ONLY then. Default false keeps the
    * historical per-app isolation (no cross-app write races possible
    * at all, useful for throwaway local runs against mutable dirs).
    */
  private[graft] def indexShared(spark: SparkSession): Boolean =
    spark.conf.get("spark.graft.ann.indexShared", "false").toBoolean

  /** Resolve the persisted-artifact path for `prefix` under the index
    * root: sanitized dir (no 32-bit collision) + data-version token
    * (replaced input rebuilds, never stale) + — only when sharing is
    * OFF — the appId, so unshared concurrent sessions never clobber
    * each other's layout. The root defaults to /tmp; point
    * `spark.graft.ann.indexDir` at shared storage (anything the
    * Hadoop FileSystem API resolves) on a cluster.
    */
  private[graft] def indexArtifactPath(
      spark: SparkSession, dir: String, prefix: String): String = {
    val root = spark.conf.get("spark.graft.ann.indexDir", "/tmp")
    val key = dir.replaceAll("[^A-Za-z0-9._-]", "_")
    val base = s"$root/${prefix}_${key}_${dataVersionToken(spark, dir)}"
    if (indexShared(spark)) base
    else base + "_" + Integer.toHexString(spark.sparkContext.applicationId.hashCode)
  }

  private[graft] def annIndexPath(spark: SparkSession, dir: String): String =
    indexArtifactPath(spark, dir, "graft_ann_index")

  private val indexLock = new Object

  /** Build-once commit protocol shared by the three persisted serving
    * artifacts. Unshared mode: the path is app-private, so build in
    * place and commit the `_BUILT` marker after the write (a failed
    * build never serves half an artifact). Shared mode adds the
    * cross-APPLICATION race: two fresh apps can both see no marker
    * and both build. Each then builds into an app-private staging dir
    * and commits with a single directory rename — the first rename
    * wins; a loser sees the winner's marker, discards its staging,
    * and serves the winner's artifact. The marker is written INSIDE
    * staging before the rename, so the committed directory is
    * complete-with-marker atomically (no window where a reader sees
    * the directory but not the marker and double-builds over it).
    */
  private def buildOnce(spark: SparkSession, path: String)(
      build: String => Unit): Unit = {
    import org.apache.hadoop.fs.{Path => HPath}
    indexLock.synchronized {
      val dest = new HPath(path)
      val fs = dest.getFileSystem(spark.sessionState.newHadoopConf())
      val marker = new HPath(path, "_BUILT")
      if (!fs.exists(marker)) {
        if (indexShared(spark)) {
          val stage = new HPath(path + "_stage_" +
            Integer.toHexString(spark.sparkContext.applicationId.hashCode))
          build(stage.toString)
          fs.create(new HPath(stage, "_BUILT"), true).close()
          // Commit = rename(stage, dest). RENAME FIRST, delete only
          // after a failed/nested rename AND an immediate marker
          // re-check (r12 ADVICE: the old delete-then-rename order had
          // a check-then-act window where a loser could delete a
          // racer's JUST-committed artifact that other sessions were
          // already lazily reading). Hadoop rename() into an EXISTING
          // directory NESTS the source instead of replacing it, so a
          // true return still needs the top-level marker verified and
          // the nested-move shape unwound before the stale-destination
          // delete is even considered.
          var committed = false
          var attempts = 0
          while (!committed && attempts < 3) {
            attempts += 1
            if (fs.exists(marker)) {
              // another application committed a complete artifact —
              // concede and serve it
              fs.delete(stage, true)
              committed = true
            } else if (fs.rename(stage, dest)) {
              if (fs.exists(marker)) {
                // the marker may be a RACER's: if the racer committed
                // dest+marker between our marker check and our rename,
                // Hadoop rename(stage, dest) NESTED our staging dir
                // inside the served artifact and still returned true.
                // Unwind it before conceding, or every reader of the
                // shared artifact sees duplicate rows (or a listing /
                // partition-inference failure) from the leftover
                // stage-dir parquet. Our stage name is app-unique, so
                // the delete can only touch our own leftovers; after a
                // CLEAN rename (dest was absent) the nested path does
                // not exist and this is a no-op.
                val nested = new HPath(dest, stage.getName)
                if (fs.exists(nested)) fs.delete(nested, true)
                committed = true
              } else {
                // nested-move shape: dest already existed, rename put
                // stage INSIDE it. Unwind, then — only with the marker
                // re-checked absent this instant — clear the stale
                // marker-less destination and retry the rename.
                val nested = new HPath(dest, stage.getName)
                if (fs.exists(nested)) fs.rename(nested, stage)
                if (!fs.exists(marker) && fs.exists(dest)) fs.delete(dest, true)
              }
            } else {
              // rename refused (object-store/HDFS semantics: dest
              // exists). Re-check the marker IMMEDIATELY before
              // treating the destination as a stale half-write — a
              // racer may have committed inside the window.
              if (fs.exists(marker)) { fs.delete(stage, true); committed = true }
              else if (fs.exists(dest)) fs.delete(dest, true)
            }
          }
          if (!committed) {
            fs.delete(stage, true)
            // surface the failure AT the commit (r12 ADVICE: a silent
            // return made the caller's read fail later with an
            // unrelated-looking missing-path error)
            throw new IllegalStateException(
              s"buildOnce: artifact commit to $dest failed after " +
                s"$attempts attempts (marker never observed)")
          }
        } else {
          build(path)
          fs.create(marker, true).close()
        }
      }
    }
  }

  /** The persisted ANN index: the e02 signature table written ONCE as
    * parquet partitioned by bucket id — one directory per bucket, so a
    * serving read that probes k buckets lists k directories and never
    * touches the rest (partition pruning, pinned in PlanSpec). At
    * 100 TB this is the nightly index build; vectors land hash-
    * partitioned across ≤2^SigBits directories and queries are served
    * from the layout without recomputing a single corpus signature.
    *
    * Build-once is decided through the Hadoop FileSystem API against a
    * `_BUILT` marker committed AFTER the write (the m02 staging
    * pattern) — a local-only `java.nio.file` probe would always
    * rebuild on an object store, and a bare directory-exists check
    * would serve a half-written index after a failed build.
    */
  private[graft] def annIndex(spark: SparkSession, dir: String): DataFrame = {
    val path = annIndexPath(spark, dir)
    buildOnce(spark, path) { p =>
      emb(spark, dir)
        .withColumn("bucket", bucketColOf(SigBits, Some(spark)))
        .write.mode("overwrite").partitionBy("bucket").parquet(p)
    }
    spark.read
      .schema("vec_id BIGINT, v ARRAY<DOUBLE>, nrm DOUBLE, bucket BIGINT")
      .parquet(path)
  }

  /** e06: ANN serving from the persisted index — e02's exact search
    * (same signatures, same hamming-≤2 probes, same ranking) but the
    * corpus side is the partition-pruned read of [[annIndex]] instead
    * of an in-session signature scan. Only the tiny query batch
    * computes signatures at serving time; the index scan reads ONLY
    * probed bucket directories via dynamic partition pruning (the
    * broadcast probe set doubles as the pruning filter — nothing is
    * collected to the driver). Results are identical to e02 by
    * construction, which is what the oracle checks.
    */
  def e06AnnIndexServe(spark: SparkSession, dir: String): DataFrame = {
    val idx = annIndex(spark, dir)
    val q = emb(spark, dir)
      .withColumn("bucket", bucketColOf(SigBits, Some(spark)))
      .where(col("vec_id") < 20)
      .select(col("vec_id").as("query_id"), col("v").as("qv"),
        col("nrm").as("qn"),
        explode(expr(probeExprOf(SigBits))).as("bucket"))
    val scored = idx.join(broadcast(q), Seq("bucket"))
      .where(col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id").as("neighbor_id"),
        (dotOf(spark, "qv", "v") / (col("qn") * col("nrm"))).as("cosine"))
    // r15: dropDuplicates + row_number window → topKScored (one
    // partial-aggregating exchange; same rows by the same total order)
    topKScored(scored, 10)
  }

  /** e11: tombstoned ANN serving — row-level deletes applied to the
    * persisted index WITHOUT a rebuild: erasure (GDPR, takedowns,
    * opt-outs — the w15 story) reaches the vector store too, and
    * rebuilding a 10¹¹-vector index per delete batch is not an
    * option. The delete delta since the last nightly build is tiny,
    * so it broadcasts as an anti-join applied to the index rows
    * BEFORE candidate ranking — a deleted vector can never resurface,
    * and the top-k still fills from the surviving candidates (deletes
    * applied AFTER the cut would silently shrink k). The nightly
    * rebuild (e06) folds tombstones into the layout and resets the
    * set. Tombstones here: vec_id % 10 == 7, a ~10% erasure batch.
    */
  def e11AnnTombstones(spark: SparkSession, dir: String): DataFrame = {
    val idx = annIndex(spark, dir)
    val tomb = emb(spark, dir).where(col("vec_id") % 10 === 7)
      .select(col("vec_id"))
    val q = emb(spark, dir)
      .withColumn("bucket", bucketColOf(SigBits, Some(spark)))
      .where(col("vec_id") < 20)
      .select(col("vec_id").as("query_id"), col("v").as("qv"),
        col("nrm").as("qn"),
        explode(expr(probeExprOf(SigBits))).as("bucket"))
    val scored = idx.join(broadcast(tomb), Seq("vec_id"), "left_anti")
      .join(broadcast(q), Seq("bucket"))
      .where(col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id").as("neighbor_id"),
        (dotOf(spark, "qv", "v") / (col("qn") * col("nrm"))).as("cosine"))
    // r15: dropDuplicates + row_number window → topKScored (see e06)
    topKScored(scored, 10)
  }

  /** e12: delta-serving ANN — the other half of e11's index-freshness
    * story: vectors ingested AFTER the nightly build must be
    * searchable before the next rebuild, and rebuilding per ingest
    * batch is as unaffordable as rebuilding per delete. The serving
    * read unions two sides: the persisted index scan with the stale
    * cut pushed down (here `vec_id % 10 != 3` stands in for
    * `ingest_day < build_day` — the predicate reaches the parquet
    * scan), and the small fresh delta, which computes its signatures
    * at serve time (delta cost ∝ delta size, never corpus size).
    * Union BEFORE probing means fresh vectors compete for top-k on
    * equal terms, so the answer equals the full-index search exactly —
    * e02's oracle verbatim. The nightly e06 rebuild folds the delta
    * into the layout and resets it.
    */
  def e12AnnDeltaServe(spark: SparkSession, dir: String): DataFrame = {
    val stale = annIndex(spark, dir).where(col("vec_id") % 10 =!= 3)
      .select("vec_id", "v", "nrm", "bucket")
    val delta = emb(spark, dir).where(col("vec_id") % 10 === 3)
      .withColumn("bucket", bucketColOf(SigBits, Some(spark)))
      .select("vec_id", "v", "nrm", "bucket")
    val q = emb(spark, dir)
      .withColumn("bucket", bucketColOf(SigBits, Some(spark)))
      .where(col("vec_id") < 20)
      .select(col("vec_id").as("query_id"), col("v").as("qv"),
        col("nrm").as("qn"),
        explode(expr(probeExprOf(SigBits))).as("bucket"))
    val scored = stale.unionByName(delta).join(broadcast(q), Seq("bucket"))
      .where(col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id").as("neighbor_id"),
        (dotOf(spark, "qv", "v") / (col("qn") * col("nrm"))).as("cosine"))
    // r15: dropDuplicates + row_number window → topKScored (see e06;
    // the stale/delta sides are id-disjoint, so pairs stay unique)
    topKScored(scored, 10)
  }

  /** e13: MMR diversity re-rank — the serving-layer step after any
    * ANN search: raw top-k is often near-duplicate-heavy (the corpus
    * contains near-identical vectors; e03 exists for a reason), and
    * retrieval-augmented pipelines want RELEVANT AND DIVERSE context,
    * so the industry-standard fix is maximal marginal relevance:
    * iteratively pick argmax λ·rel(c) − (1−λ)·max_{s∈S} sim(c, s).
    * MMR is sequential per query but each step is a KEYED agg over the
    * query's ≤k candidates, so the 5 picks unroll into 5 declarative
    * DataFrame stages — at 10⁶ concurrent queries every stage is an
    * embarrassingly parallel shuffle on query_id, and the pairwise sim
    * matrix (≤ k² rows/query) is computed once and reused across
    * steps. All double arithmetic is the same left-to-right expression
    * in both engines (0.7/0.3 literals, cosine exactly as e01), ties
    * broken by neighbor_id, so the oracle reproduces every pick
    * bit-for-bit through 5 generated CTE layers.
    */
  def e13MmrRerank(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.storage.StorageLevel
    val cand = e01KnnCosine(spark, dir).withColumnRenamed("cosine", "rel")
      .persist(StorageLevel.MEMORY_AND_DISK) // read once per MMR step
    val vecs = emb(spark, dir).select(col("vec_id"), col("v"), col("nrm"))
    val cv = cand.select(col("query_id"), col("neighbor_id"))
      .join(vecs.withColumnRenamed("vec_id", "neighbor_id"), Seq("neighbor_id"))
    val a = cv.select(col("query_id"), col("neighbor_id").as("a_id"),
      col("v").as("av"), col("nrm").as("an"))
    val b = cv.select(col("query_id"), col("neighbor_id").as("b_id"),
      col("v").as("bv"), col("nrm").as("bn"))
    val sim = a.join(b, Seq("query_id")).where(col("a_id") =!= col("b_id"))
      .select(col("query_id"), col("a_id"), col("b_id"),
        (dotOf(spark, "av", "bv") / (col("an") * col("bn"))).as("sim"))
      .persist(StorageLevel.MEMORY_AND_DISK) // read once per MMR step
    val wPick = Window.partitionBy("query_id")
      .orderBy(col("mmr_score").desc, col("neighbor_id"))
    // Each pick is ≤ 1 row/query; eager-checkpoint it so step t+1's
    // anti-join reads materialized rows instead of re-embedding the
    // plans of picks 1..t (selected is referenced twice per step, so
    // un-checkpointed lineage duplicates every prior window shuffle
    // ~2^t times — measured 12.9 s vs 2 s at sf0.1).
    var selected = cand.withColumn("mmr_score", col("rel"))
      .withColumn("rn", row_number().over(wPick)).where(col("rn") === 1)
      .select(col("query_id"), lit(1L).as("rank"), col("neighbor_id"), col("mmr_score"))
      .cutLineage
    for (t <- 2 to 5) {
      val selIds = selected.select(col("query_id"), col("neighbor_id").as("b_id"))
      val rem = cand.join(selected.select("query_id", "neighbor_id"),
        Seq("query_id", "neighbor_id"), "left_anti")
      val pick = rem
        .join(sim.join(selIds, Seq("query_id", "b_id"))
            .select(col("query_id"), col("a_id").as("neighbor_id"), col("sim")),
          Seq("query_id", "neighbor_id"))
        .groupBy("query_id", "neighbor_id")
        .agg(max(col("rel")).as("rel"), max(col("sim")).as("max_sim"))
        .select(col("query_id"), col("neighbor_id"),
          (col("rel") * lit(0.7) - col("max_sim") * lit(0.3)).as("mmr_score"))
        .withColumn("rn", row_number().over(wPick)).where(col("rn") === 1)
        .select(col("query_id"), lit(t.toLong).as("rank"),
          col("neighbor_id"), col("mmr_score"))
      selected = selected.unionByName(pick.cutLineage)
    }
    // every pick is already materialized, so the union no longer
    // references cand/sim — release both eagerly (the e05 pattern)
    cand.unpersist(); sim.unpersist()
    selected
  }

  /** e04: IVF approximate NN — the scale path for very large corpora.
    *  - coarse quantizer: the k corpus vectors with the smallest
    *    mod-prime hash of vec_id serve as centroids (KMeans‖-style
    *    sampled seeding without Lloyd iterations — the inverted-list /
    *    nprobe structure is identical, and the fit is deterministic so
    *    a second engine reproduces it exactly; a trained KMeans plugs
    *    in by swapping `fitCentroids` when recall matters more than
    *    cross-engine verification). The model is tiny (k × dim
    *    doubles) and ships inside the plan, never as a closure;
    *  - inverted lists: every vector is assigned to its nearest
    *    centroid by a single codegen'd argmin projection — array_min
    *    over (−2·v·c + |c|², centroid_id) structs. NO shuffle: the
    *    |v|² term is constant per row and drops out of the argmin;
    *  - search: each query probes its `nprobe` nearest centroids and
    *    ranks only those lists — a hash join on centroid_id, so work
    *    per query is corpus/k × nprobe instead of the full scan e01
    *    pays. Recall improves with nprobe; plan shape is unchanged.
    */
  val IvfK = 16
  val IvfNprobe = 4
  val IvfHashMul = 616318177L

  /** Coarse quantizer. Default: deterministic sampled centroids — the
    * k corpus vectors with the smallest mod-prime vec_id hash, ordered
    * (KMeans‖-style seeding without Lloyd iterations; cross-engine
    * reproducible, which is what keeps e04 oracle-checkable). Set
    * `spark.graft.ivf.quantizer=kmeans` to train a real KMeans instead
    * when recall matters more than verification — the inverted-list /
    * nprobe structure downstream is identical either way. Both fits
    * are driver-side k×dim doubles.
    */
  private def fitCentroids(e: DataFrame): Array[(Int, Array[Double])] =
    if (e.sparkSession.conf.getOption("spark.graft.ivf.quantizer").contains("kmeans")) {
      import org.apache.spark.ml.clustering.KMeans
      import org.apache.spark.ml.functions.array_to_vector
      val fitted = new KMeans().setK(IvfK).setSeed(42L).setMaxIter(10)
        .setFeaturesCol("fv").setPredictionCol("cid")
        .fit(e.withColumn("fv", array_to_vector(col("v"))))
      fitted.clusterCenters.zipWithIndex.map { case (c, i) => (i, c.toArray) }
    } else {
      val P = 1000000007L
      e.select(col("vec_id"), col("v"))
        .withColumn("ch", col("vec_id") % P * IvfHashMul % P)
        .orderBy(col("ch"), col("vec_id"))
        .limit(IvfK)
        .collect()
        .zipWithIndex
        .map { case (r, i) => (i, r.getSeq[Double](1).toArray) }
    }

  /** k-row broadcast dimension table for a fitted coarse quantizer:
    * (centroid_id, cv, |cv|²). |v|² is constant per row and drops out
    * of any per-row argmin, so ranking uses d2 = −2·v·c + |c|² — the
    * same quantity the oracles rank on.
    */
  private def centroidsDf(
      spark: SparkSession, cents: Array[(Int, Array[Double])]): DataFrame =
    spark.createDataFrame(
        cents.toSeq.map { case (i, cv) =>
          (i, cv.toSeq, cv.foldLeft(0.0)((a, x) => a + x * x))
        })
      .toDF("centroid_id", "cv", "c2")

  /** Nearest-centroid assignment: broadcast-nested-loop over the k
    * centroids, then a map-side-combined min_by per vec_id (k candidate
    * rows collapse to 1 before the exchange; ties break on
    * centroid_id). At cluster scale this is one vector-carrying
    * shuffle; a model-broadcast scalar argmin would avoid it at the
    * cost of a giant literal plan.
    */
  private def assignToNearest(
      spark: SparkSession, e: DataFrame, centsDf: DataFrame): DataFrame = {
    val d2 = dotOf(spark, "v", "cv") * lit(-2.0) + col("c2")
    e.crossJoin(broadcast(centsDf))
      .withColumn("d2", d2)
      .groupBy(col("vec_id"))
      .agg(
        min_by(col("centroid_id"), struct(col("d2"), col("centroid_id"))).as("centroid_id"),
        first(col("v")).as("v"), first(col("nrm")).as("nrm"))
  }

  def e04AnnIvf(spark: SparkSession, dir: String): DataFrame =
    e04Search(spark, dir, IvfNprobe)

  /** e04's search parameterized by `nprobe` — shared by the operator
    * (at [[IvfNprobe]]) and the e19 tuning curve (which sweeps it).
    */
  private[graft] def e04Search(
      spark: SparkSession, dir: String, nprobe: Int): DataFrame = {
    val e = emb(spark, dir)
    val centsDf = centroidsDf(spark, fitCentroids(e))
    val d2 = dotOf(spark, "v", "cv") * lit(-2.0) + col("c2")
    val assigned = assignToNearest(spark, e, centsDf)
    // each query probes its nprobe nearest centroids (tiny side)
    val q = e.where(col("vec_id") < 20)
      .select(col("vec_id").as("query_id"), col("v"), col("nrm").as("qn"))
      .crossJoin(broadcast(centsDf))
      .withColumn("d2", d2)
      .withColumn("pr", row_number().over(
        Window.partitionBy("query_id").orderBy(col("d2"), col("centroid_id"))))
      .where(col("pr") <= nprobe)
      .select(col("query_id"), col("v").as("qv"), col("qn"), col("centroid_id"))
    val scored = assigned.join(q, Seq("centroid_id"))
      .where(col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id").as("neighbor_id"),
        (dotOf(spark, "qv", "v") / (col("qn") * col("nrm"))).as("cosine"))
    val w = Window.partitionBy("query_id").orderBy(col("cosine").desc, col("neighbor_id"))
    scored.withColumn("rn", row_number().over(w)).where(col("rn") <= 10)
      .select("query_id", "neighbor_id", "cosine")
  }

  /** e25 serve parameters: entry-point count, beam width, hop count. */
  val ServeEntries = 8
  val ServeBeam = 12
  val ServeHops = 3

  /** e25: GRAPH-BASED ANN SERVING — greedy beam search over e23's
    * k-NN graph (the HNSW layer-0 walk, distributed): each query
    * starts from [[ServeEntries]] deterministic entry points (the
    * mod-prime-hash-smallest nodes — HNSW's fixed entry set), then
    * [[ServeHops]] rounds of "expand the beam's out-neighbors, score,
    * keep the best [[ServeBeam]]". Together with e23 this completes
    * the graph family: construction (NN-descent) + serving (beam
    * walk), next to {LSH, IVF} × {PQ, SQ8}.
    *
    * Scale shape: the graph is K·n tiny edge rows (already
    * materialized by e23); each hop joins a |queries|·beam frontier
    * against it — the corpus's VECTORS are touched only to score the
    * ≤ |queries|·beam·K candidates a hop surfaces, never scanned. The
    * hop loop is unrolled (3 keyed join+window stages), per-query
    * top-k is a keyed window, and the only corpus-sized work happened
    * once, inside e23. Recall is graded in Round13Spec through e10's
    * harness: beam-walk recall ≥ entry-only recall, both measured.
    */
  def e25GraphServe(spark: SparkSession, dir: String): DataFrame =
    e25GraphServeHops(spark, dir, ServeHops)

  /** The persisted k-NN graph index — e23's construction written ONCE
    * per (dir, data version[, appId unless shared]) behind a `_BUILT`
    * marker (the e06/annIndex
    * build-once discipline: marker committed through the Hadoop FS API
    * AFTER the write, so a failed build never serves half a graph).
    * This is the production split serving assumes: the graph is the
    * nightly artifact, the beam walk is the always-on cheap part —
    * e23 measures construction, e25 measures serving.
    */
  private[graft] def knnGraphIndex(spark: SparkSession, dir: String): DataFrame = {
    // keyed like annIndexPath: sanitized dir (no 32-bit collision) +
    // data-version token (replaced input rebuilds, never stale) +,
    // when sharing is off, the appId. The elected build budget is in
    // the key too: a budget-tier change (code upgrade, corpus growth
    // across a threshold) must rebuild, never serve a graph built at
    // a different K.
    val n = corpusN(spark, dir)
    val path = indexArtifactPath(spark, dir,
      s"graft_knn_graph_k${graphKOf(n)}c${maxBucketOf(n)}")
    buildOnce(spark, path) { p =>
      e23KnnGraph(spark, dir).select("node_id", "neighbor_id")
        .write.mode("overwrite").parquet(p)
    }
    spark.read.schema("node_id BIGINT, neighbor_id BIGINT").parquet(path)
  }

  /** [[e25GraphServe]] with the walk depth exposed — hops = 0 is the
    * bare entry-point scan; Round13Spec grades recall at 0 vs
    * [[ServeHops]] to pin that the walk, not the entry set, finds the
    * neighbors.
    */
  def e25GraphServeHops(spark: SparkSession, dir: String, hops: Int): DataFrame =
    beamServeOver(spark, dir, knnGraphIndex(spark, dir), hops)

  /** e28: SERVING THROUGH THE MERGED GRAPH — the freshness story's
    * last leg (e23 builds nightly → e27 merges the delta → e28 serves
    * it): the identical e25 beam walk (same entry election, hops,
    * beam) runs over [[e27Merged]]'s edge set instead of the nightly
    * artifact, so vectors ingested AFTER the nightly build are
    * reachable as results without waiting for the next rebuild. The
    * spec pins that e28's recall matches e25's (whose index happened
    * to include everything) and that delta vectors actually surface
    * in result lists.
    */
  def e28GraphServeDelta(spark: SparkSession, dir: String): DataFrame =
    beamServeOver(spark, dir, mergedGraphIndex(spark, dir), ServeHops)

  /** The PERSISTED merged graph — the same nightly-artifact split the
    * e23/e25 pair established (construction is the expensive artifact,
    * the walk is the always-on cheap part), applied to the merge: e27
    * measures the merge, e28 serves from its persisted result. Keyed
    * and build-once like [[knnGraphIndex]] (sanitized dir +
    * data-version token [+ appId unless shared] behind a `_BUILT`
    * marker).
    */
  private[graft] def mergedGraphIndex(spark: SparkSession, dir: String): DataFrame = {
    val n = corpusN(spark, dir)
    val path = indexArtifactPath(spark, dir,
      s"graft_knn_graph_merged_k${graphKOf(n)}c${maxBucketOf(n)}")
    buildOnce(spark, path) { p =>
      e27Merged(spark, dir).select("node_id", "neighbor_id")
        .write.mode("overwrite").parquet(p)
    }
    spark.read.schema("node_id BIGINT, neighbor_id BIGINT").parquet(path)
  }

  /** e29 upper-layer parameters: 1-in-[[UpperEvery]] deterministic
    * level election (HNSW's exponential level assignment at one
    * level, hash-derandomized), [[UpperK]] out-degree in the upper
    * graph, [[UpperEntries]] fixed upper entry points,
    * [[UpperHops]] greedy-descent rounds keeping [[ServeEntries]]
    * per query — so the descent hands layer 0 EXACTLY as many entry
    * points as e25's global election does: equal layer-0 beam,
    * equal hops, the recall delta is pure entry quality.
    */
  val UpperEvery = 8
  val UpperK = 6
  val UpperEntries = 2
  val UpperHops = 2

  /** Corpus-scaled DESCENT budget (r13, with [[graphKOf]]): the upper
    * walk's entry count and per-hop keep width grow with n — HNSW's
    * ef-search discipline applied to the level the budget is allowed
    * to grow on (layer 0 stays at the FIXED beam 12 × 3 hops; the
    * descent always hands layer 0 exactly [[ServeEntries]] rows per
    * query). Small-corpus tier keeps the historical (2, 8) so the
    * sf0.001/sf0.01 chains are bit-stable; the scaled tier (4, 16)
    * measured e29 recall@10 at sf0.1: 0.49 → 0.51 (RecallProbe, K=14
    * substrate). Hop count stays structural (2) — it is the one knob
    * the SQL replay cannot elect dynamically.
    */
  def upperEntriesOf(n: Long): Int = if (n <= 1000L) UpperEntries else 4
  def upperKeepOf(n: Long): Int = if (n <= 1000L) ServeEntries else 16

  /** The upper-layer edge set: among the 1-in-[[UpperEvery]] elected
    * nodes, each node's top-[[UpperK]] neighbors by cosine, candidates
    * from the SAME capped-bucket + hamming-≤2 probe substrate as
    * e23's init (the discipline every pair generator in this file
    * follows — bucketed, capped, never all-pairs, so the upper build
    * is a strictly smaller replay of the layer-0 one).
    */
  private[graft] def hnswUpperEdges(spark: SparkSession, dir: String): DataFrame = {
    val cap = maxBucketOf(corpusN(spark, dir) / UpperEvery)
    hnswUpperEdgesOn(spark,
      emb(spark, dir).withColumn("bucket", bucketColOf(SigBits, Some(spark))), cap)
  }

  /** The upper-edge construction with the corpus pluggable — e29
    * feeds the full corpus, e30 the canonicalized one. The cap scales
    * with the UPPER layer's own size (n/UpperEvery), same reasoning
    * as [[maxBucketOf]]; the caller elects it.
    */
  private[graft] def hnswUpperEdgesOn(
      spark: SparkSession, corpus: DataFrame, cap: Int): DataFrame = {
    val P = 1000000007L
    val upper = corpus
      .where(col("vec_id") % P * lit(888000131L) % P % UpperEvery === 0)
    val useful = upper.groupBy("bucket").count()
      .where(col("count") <= cap).select("bucket")
    val in = upper.join(useful, Seq("bucket"))
    val probes = in.select(col("vec_id").as("node_id"),
      explode(expr(probeExprOf(SigBits))).as("bucket"))
    val cand = probes
      .join(in.select(col("bucket"), col("vec_id").as("neighbor_id")), Seq("bucket"))
      .where(col("node_id") =!= col("neighbor_id"))
      .select("node_id", "neighbor_id").distinct()
    val nodeV = upper.select(col("vec_id").as("node_id"), col("v").as("av"), col("nrm").as("an"))
    val nbrV = upper.select(col("vec_id").as("neighbor_id"), col("v").as("bv"), col("nrm").as("bn"))
    cand.join(nodeV, Seq("node_id")).join(nbrV, Seq("neighbor_id"))
      .select(col("node_id"), col("neighbor_id"),
        (dotOf(spark, "av", "bv") / (col("an") * col("bn"))).as("cosine"))
      .withColumn("rn", row_number().over(
        Window.partitionBy("node_id").orderBy(col("cosine").desc, col("neighbor_id"))))
      .where(col("rn") <= UpperK)
      .select("node_id", "neighbor_id")
  }

  /** The persisted upper-layer graph — built once per (dir, data
    * version[, appId unless shared]) like [[knnGraphIndex]]; the
    * upper layer is part of the same nightly artifact family.
    */
  private[graft] def hnswUpperIndex(spark: SparkSession, dir: String): DataFrame = {
    val path = indexArtifactPath(spark, dir,
      s"graft_hnsw_upper_c${maxBucketOf(corpusN(spark, dir) / UpperEvery)}")
    buildOnce(spark, path) { p =>
      hnswUpperEdges(spark, dir).write.mode("overwrite").parquet(p)
    }
    spark.read.schema("node_id BIGINT, neighbor_id BIGINT").parquet(path)
  }

  /** e29: TWO-LEVEL HNSW SERVING — the r11 verdict's one named
    * ANN-capability gap closed: e25's entry election is a hashed
    * random sample, so its beam starts COLD and the measured recall
    * band (0.33-0.41 at sf0.1) tracks how lucky the fixed entries are
    * per query. e29 runs the standard production shape instead
    * (Malkov & Yashunin 2016, two levels): greedy descent over the
    * sparse persisted upper graph ([[hnswUpperIndex]] — [[UpperHops]]
    * rounds from [[UpperEntries]] fixed entries, keep the best
    * [[ServeEntries]] upper nodes per query), then EXACTLY e25's
    * layer-0 beam walk ([[beamWalk]]: same graph, same [[ServeBeam]],
    * same [[ServeHops]], same final top-10) seeded with those
    * descent-chosen entries. Equal layer-0 candidate budget by
    * construction; Round17Spec grades recall ≥ e25 through e10's
    * harness and pins the equal-entry-count claim.
    *
    * Scale shape: the upper graph is (n/[[UpperEvery]])·[[UpperK]]
    * edge rows; descent joins a |queries|·[[ServeEntries]] frontier
    * against it — every stage keyed, vectors touched only to score
    * surfaced candidates, nothing corpus-sized at serve time.
    */
  def e29HnswServe(spark: SparkSession, dir: String): DataFrame = {
    val n = corpusN(spark, dir)
    e29ServeOver(spark, dir, hnswUpperIndex(spark, dir), knnGraphIndex(spark, dir),
      upperEntriesOf(n), UpperHops, upperKeepOf(n))
  }

  /** The two-level serve with both graphs pluggable — e29 feeds the
    * persisted artifacts; [[RecallProbe]] feeds candidate builds so a
    * budget experiment measures the serve path that actually ships.
    */
  private[graft] def e29ServeOver(
      spark: SparkSession, dir: String, gu: DataFrame, g0: DataFrame): DataFrame =
    e29ServeOver(spark, dir, gu, g0, UpperEntries, UpperHops, ServeEntries)

  private[graft] def e29ServeOver(
      spark: SparkSession, dir: String, gu: DataFrame, g0: DataFrame,
      uEntries: Int, uHops: Int, uKeep: Int): DataFrame = {
    val q = serveQueries(spark, dir)
    val P = 1000000007L
    val upperIds = emb(spark, dir).select(col("vec_id").as("node_id"))
      .where(col("node_id") % P * lit(888000131L) % P % UpperEvery === 0)
    val entries = upperIds
      .withColumn("perm", col("node_id") % P * lit(888000131L) % P)
      .orderBy("perm", "node_id").limit(uEntries).select("node_id")
    val u0 = serveTopB(serveScore(spark, dir, q)(
      q.select("query_id").crossJoin(broadcast(entries))
        .where(col("query_id") =!= col("node_id"))), uKeep)
    def uhop(beam: DataFrame): DataFrame = {
      val expanded = beam.select("query_id", "node_id")
        .join(gu, Seq("node_id"))
        .select(col("query_id"), col("neighbor_id").as("node_id"))
        .unionByName(beam.select("query_id", "node_id"))
        .where(col("query_id") =!= col("node_id"))
      serveTopB(serveScore(spark, dir, q)(expanded), uKeep)
    }
    // cut between the levels (the e23 per-round discipline): the
    // descent result is ≤ |queries|·ServeEntries tiny rows, and
    // without the cut the final plan nests SIX join+window stages
    // (u0→u2→h1→h3) into one analysis tree. The final keep is always
    // ServeEntries — layer 0 starts from exactly as many scored rows
    // as e25's election hands it, whatever the descent explored.
    val descended = serveTopB(
      (1 to uHops).foldLeft(u0)((b, _) => uhop(b)), ServeEntries).cutLineage
    beamWalk(spark, dir, g0, ServeHops, descended)
  }

  /** e30: DEDUP-AWARE two-level serving — the measured sf1 remedy for
    * the graph-ANN family (§18.2): on a near-dup-heavy corpus every
    * adjacency list spends most of its degree on verbatim twins (at
    * the sf1 replica 9 of 14 edges per node), the walk circles twin
    * cliques, and NO build budget fixes it (RecallProbe: graph-direct
    * 0.935, walk 0.00). The production composition is the SemDeDup
    * discipline applied to SERVING: canonicalize exact-duplicate
    * vectors (group by the raw embedding, keep min vec_id — e03/d30's
    * cheapest tier), build the graph index over CANONICAL vectors
    * only, walk it with SELF-hits allowed and the query's own
    * canonical node SEEDED into the descent (for an in-corpus query
    * the duplicate map already names its portal; out-of-corpus
    * queries have no map entry and keep the plain entry seed), and
    * expand result ids through the duplicate map at the end — exact
    * duplicates share the canonical's cosine bit-for-bit, so the
    * expansion is a pure keyed join, no rescoring. Measured at sf1
    * (RecallProbe): e29 0.000 → e30 0.965 recall@10 at the SAME
    * layer-0 serve budget, because the walk runs over the 2 000-node
    * canonical space where the elected budget holds (§18.1) instead
    * of the 20 000-node twin swamp, and the twin set itself is
    * structural. On the ×3 dup corpus Round18Spec pins: e29 0.30 →
    * e30 0.69.
    *
    * Scale shape: canonicalization is one groupBy on the vector bytes
    * (map-side combinable); the canonical graph is the (smaller)
    * nightly artifact, persisted build-once under its own key; the
    * member map shuffles bare (vec_id, canon_id) ids; expansion is a
    * keyed join of |queries|·beam rows against it. When the corpus is
    * already duplicate-free (canonN == n) the op reuses e29's
    * persisted artifacts outright — dedup-aware serving costs nothing
    * on a clean corpus.
    */
  def e30DedupServe(spark: SparkSession, dir: String): DataFrame = {
    val raw = Tables.embeddings(spark, dir).select(col("vec_id"), col("embedding"))
    val members = raw
      .withColumn("canon_id",
        min("vec_id").over(Window.partitionBy(col("embedding"))))
      .select("vec_id", "canon_id").cutLineage
    val n = corpusN(spark, dir)
    val canonN = members.where(col("vec_id") === col("canon_id")).count()
    val (g0, gu) =
      if (canonN == n) (knnGraphIndex(spark, dir), hnswUpperIndex(spark, dir))
      else {
        val k = graphKOf(canonN)
        val cap = maxBucketOf(canonN)
        val gPath = indexArtifactPath(spark, dir, s"graft_knn_graph_dedup_k${k}c$cap")
        buildOnce(spark, gPath) { p =>
          val canonCorpus = emb(spark, dir)
            .join(members.where(col("vec_id") === col("canon_id"))
              .select("vec_id"), Seq("vec_id"))
            .withColumn("bucket", bucketColOf(SigBits, Some(spark)))
            .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
          e23GraphPlanOn(spark, canonCorpus, rounds = 2, k, cap)
            .select("node_id", "neighbor_id")
            .write.mode("overwrite").parquet(p)
          canonCorpus.unpersist()
        }
        val uCap = maxBucketOf(canonN / UpperEvery)
        val uPath = indexArtifactPath(spark, dir, s"graft_hnsw_upper_dedup_c$uCap")
        buildOnce(spark, uPath) { p =>
          val canonCorpus = emb(spark, dir)
            .join(members.where(col("vec_id") === col("canon_id"))
              .select("vec_id"), Seq("vec_id"))
            .withColumn("bucket", bucketColOf(SigBits, Some(spark)))
          hnswUpperEdgesOn(spark, canonCorpus, uCap)
            .write.mode("overwrite").parquet(p)
        }
        (spark.read.schema("node_id BIGINT, neighbor_id BIGINT").parquet(gPath),
          spark.read.schema("node_id BIGINT, neighbor_id BIGINT").parquet(uPath))
      }
    val q = serveQueries(spark, dir)
    val P = 1000000007L
    val canonIds = members.where(col("vec_id") === col("canon_id"))
      .select(col("vec_id").as("node_id"))
    val entries = canonIds
      .where(col("node_id") % P * lit(888000131L) % P % UpperEvery === 0)
      .withColumn("perm", col("node_id") % P * lit(888000131L) % P)
      .orderBy("perm", "node_id").limit(upperEntriesOf(canonN)).select("node_id")
    // SELF-ALLOWED hops: a query's own canonical node is a legitimate
    // (indeed the best possible) waypoint — its expansion is the twin
    // set the exact answer is made of
    def hop(g: DataFrame, keep: Int)(beam: DataFrame): DataFrame = {
      val expanded = beam.select("query_id", "node_id")
        .join(g, Seq("node_id"))
        .select(col("query_id"), col("neighbor_id").as("node_id"))
        .unionByName(beam.select("query_id", "node_id"))
      serveTopB(serveScore(spark, dir, q)(expanded), keep)
    }
    val uKeep = upperKeepOf(canonN)
    // seed the descent with the query's OWN canonical node next to the
    // global entries: for an in-corpus query the duplicate map already
    // names its portal (cosine 1.0 by construction), so its twin set
    // can never be lost to walk luck; out-of-corpus queries simply
    // have no map entry and keep the plain entry seed
    val selfSeed = q.select("query_id")
      .join(members.select(col("vec_id").as("query_id"),
        col("canon_id").as("node_id")), Seq("query_id"))
      .select("query_id", "node_id")
    val u0 = serveTopB(serveScore(spark, dir, q)(
      q.select("query_id").crossJoin(broadcast(entries))
        .unionByName(selfSeed)), uKeep)
    val descended = serveTopB(
      (1 to UpperHops).foldLeft(u0)((b, _) => hop(gu, uKeep)(b)), ServeEntries)
      .cutLineage
    val walked = (1 to ServeHops).foldLeft(descended)((b, _) => hop(g0, ServeBeam)(b))
    walked
      .join(members.select(col("canon_id").as("node_id"),
        col("vec_id").as("neighbor_id")), Seq("node_id"))
      .where(col("query_id") =!= col("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"), col("cosine"))
      .withColumn("rn", row_number().over(Window.partitionBy("query_id")
        .orderBy(col("cosine").desc, col("neighbor_id"))))
      .where(col("rn") <= 10)
      .select("query_id", "neighbor_id", "cosine")
  }

  /** e31: IVF-SEEDED graph serving — the measured answer for
    * CLUSTERED corpora (r13 VERDICT #4's realistic-embedding tier).
    * On a planted-Gaussian-mixture corpus the NN-descent graph is
    * near-perfect (graph-direct recall 0.99-1.0) but becomes one
    * DISCONNECTED clique per cluster — every top-K slot is
    * within-cluster, so e25's hash-elected global entries strand the
    * walk in whatever handful of clusters they landed in (measured:
    * e25 recall 0.000 at both clustered tiers; e29's 4-entry descent
    * 0.60 at n=2 000 and 0.085 at n=20 000 as the cluster count
    * outgrows the entry budget). No walk budget fixes entry
    * SELECTION — the remedy is cluster-aware entries: elect each
    * query's entry points through the e04 coarse quantizer (nearest
    * [[IvfNprobe]] of the [[IvfK]] hash-elected medoids, score their
    * inverted lists, keep the top [[ServeEntries]]), then run EXACTLY
    * e25's layer-0 beam walk over the persisted [[knnGraphIndex]].
    * The walk refines what the probe started: the probe lands inside
    * the right clique and the graph hops collect its best members —
    * the DiskANN/IVF-hybrid composition, built from two artifacts
    * this library already ships. Same layer-0 serve budget as
    * e25/e29 (ServeEntries scored seeds, ServeBeam per hop, final
    * top-10); out-of-corpus queries work unchanged (the quantizer
    * probe needs no corpus membership, unlike e30's duplicate-map
    * portal).
    *
    * Scale shape: the medoid frame is a 16-row broadcast; the probe
    * scores nprobe inverted lists per query (id-keyed joins, one
    * vector join-back — e04's own serving cost, paid from the
    * partitioned IVF layout at 100 TB); the walk is e25's (beam-bound
    * candidate frontier, per-query windows only).
    */
  def e31IvfSeededServe(spark: SparkSession, dir: String): DataFrame = {
    val e = emb(spark, dir)
    val centsDf = centroidsDf(spark, fitCentroids(e))
    val assigned = assignToNearest(spark, e, centsDf)
    val q = serveQueries(spark, dir)
    val d2q = dotOf(spark, "qv", "cv") * lit(-2.0) + col("c2")
    val probed = q.crossJoin(broadcast(centsDf))
      .withColumn("d2", d2q)
      .withColumn("pr", row_number().over(
        Window.partitionBy("query_id").orderBy(col("d2"), col("centroid_id"))))
      .where(col("pr") <= IvfNprobe)
      .select(col("query_id"), col("centroid_id"))
    val cand = assigned.select(col("centroid_id"), col("vec_id").as("node_id"))
      .join(probed, Seq("centroid_id"))
      .where(col("query_id") =!= col("node_id"))
      .select("query_id", "node_id")
    val beam0 = serveTopB(serveScore(spark, dir, q)(cand), ServeEntries)
    beamWalk(spark, dir, knnGraphIndex(spark, dir), ServeHops, beam0)
  }

  /** The HNSW layer-0 beam walk with the GRAPH pluggable — e25 feeds
    * it the persisted nightly artifact, e28 the delta-merged graph;
    * entry election, scoring, beam width and final top-10 are shared,
    * so the two serve paths differ ONLY through the edge set.
    */
  /** The serve-time query frame and its candidate scorer — shared by
    * the layer-0 beam walk and e29's upper-layer descent so every
    * level scores candidates through the identical expression.
    */
  private def serveQueries(spark: SparkSession, dir: String): DataFrame =
    emb(spark, dir).where(col("vec_id") < 20)
      .select(col("vec_id").as("query_id"), col("v").as("qv"), col("nrm").as("qn"))

  private def serveScore(
      spark: SparkSession, dir: String, q: DataFrame)(cand: DataFrame): DataFrame = {
    val nodeV = emb(spark, dir)
      .select(col("vec_id").as("node_id"), col("v"), col("nrm"))
    cand.join(nodeV, Seq("node_id")).join(q, Seq("query_id"))
      .select(col("query_id"), col("node_id"),
        (dotOf(spark, "qv", "v") / (col("qn") * col("nrm"))).as("cosine"))
  }

  /** Per-query top-b of a scored (query_id, node_id, cosine) frame in
    * ONE keyed aggregate (r14, guide §2.3/§2.4): collect_set dedups
    * candidate rows (the hop expansions surface the same node through
    * several edges — scoring is deterministic, so duplicates are
    * bit-identical structs), array_sort over struct(-cosine, node_id)
    * is exactly the old row_number total order (cosine desc, node_id
    * asc), slice keeps b. Replaces the per-hop `distinct()` exchange +
    * row_number window (2 exchanges + a sort per hop) with one
    * partial-aggregating exchange; the serve chains are ~5 of these
    * per query, all on beam-bounded frames.
    */
  /** Per-query top-k of a scored (query_id, neighbor_id, cosine) frame
    * — the serveTopB device applied to the probe-join serves (r15, r14
    * VERDICT #6; guide §2.3/§2.4): collect_set dedups re-surfaced
    * candidates (the probe set is array_union'd distinct and an index
    * vector lives in exactly ONE bucket, so a (query, neighbor) pair
    * occurs once per frame — and if a caller ever re-surfaces one,
    * scoring is deterministic so the duplicate structs are
    * bit-identical), array_sort over struct(-cosine, neighbor_id)
    * reproduces the old row_number total order (cosine desc,
    * neighbor_id asc) exactly, slice keeps k. Replaces the old
    * dropDuplicates + row_number window tail (2 exchanges + a sort)
    * with ONE partial-aggregating exchange. Per-query candidate sets
    * here are probe-bounded (≤ probes × bucket occupancy), so the
    * per-group aggregate buffer is bounded — do NOT reuse this on
    * corpus-sized candidate frames (e14/e15's ranking window stays a
    * window for exactly that reason, guide §5). NaN cosines would sort
    * last instead of first under the negated key — unreachable today
    * because [[emb]] drops zero-norm vectors.
    */
  private def topKScored(scored: DataFrame, k: Int): DataFrame =
    scored.groupBy("query_id")
      .agg(slice(array_sort(collect_set(
        struct(negate(col("cosine")).as("nc"), col("neighbor_id")))), 1, k).as("top"))
      .select(col("query_id"), explode(col("top")).as("t"))
      .select(col("query_id"), col("t.neighbor_id").as("neighbor_id"),
        negate(col("t.nc")).as("cosine"))

  private def serveTopB(scored: DataFrame, b: Int): DataFrame =
    scored.groupBy("query_id")
      .agg(slice(array_sort(collect_set(
        struct(negate(col("cosine")).as("nc"), col("node_id")))), 1, b).as("top"))
      .select(col("query_id"), explode(col("top")).as("t"))
      .select(col("query_id"), col("t.node_id").as("node_id"),
        negate(col("t.nc")).as("cosine"))

  /** The beam walk proper, entry frame pluggable: `beam0` is a scored
    * (query_id, node_id, cosine) frame — e25/e28 seed it from the
    * global hashed entry set, e29 from the upper-layer descent.
    */
  private def beamWalk(
      spark: SparkSession, dir: String, g: DataFrame, hops: Int,
      beam0: DataFrame): DataFrame = {
    val q = serveQueries(spark, dir)
    def hop(beam: DataFrame): DataFrame = {
      // no distinct: serveTopB's collect_set dedups the multi-edge
      // re-surfacings (identical scored structs), one exchange instead
      // of two
      val expanded = beam.select("query_id", "node_id")
        .join(g, Seq("node_id"))
        .select(col("query_id"), col("neighbor_id").as("node_id"))
        .unionByName(beam.select("query_id", "node_id"))
        .where(col("query_id") =!= col("node_id"))
      serveTopB(serveScore(spark, dir, q)(expanded), ServeBeam)
    }
    val beamN = (1 to hops).foldLeft(beam0)((b, _) => hop(b))
    serveTopB(beamN, 10)
      .select(col("query_id"), col("node_id").as("neighbor_id"), col("cosine"))
  }

  private[graft] def beamServeOver(
      spark: SparkSession, dir: String, g: DataFrame, hops: Int): DataFrame = {
    val e = emb(spark, dir)
    val q = serveQueries(spark, dir)
    val P = 1000000007L
    val entries = e.select(col("vec_id").as("node_id"))
      .withColumn("perm", col("node_id") % P * lit(888000131L) % P)
      .orderBy("perm", "node_id").limit(ServeEntries).select("node_id")
    val beam0 = serveTopB(serveScore(spark, dir, q)(
      q.select("query_id").crossJoin(broadcast(entries))
        .where(col("query_id") =!= col("node_id"))), ServeBeam)
    beamWalk(spark, dir, g, hops, beam0)
  }

  /** e24's demonstration flood size and the repair threshold (the
    * same ratio-2 bar e22 flags on — FAISS's imbalance_factor
    * discipline).
    */
  val RepairFloodN = 250
  val RepairThreshold = 2.0

  /** e24: IVF LIST REPAIR — e22's audit wired into ACTION (VERDICT r8
    * #7: "the audit stops being read-only"): every inverted list whose
    * skew ratio exceeds [[RepairThreshold]] is split into ⌈ratio⌉
    * sub-lists in ONE maintenance pass, restoring every list to ≈ the
    * balanced mean. Because the sf0.01 corpus is organically balanced
    * (e22: max ratio 1.6, nothing flagged), the operator builds the
    * demonstration the audit exists for — the e03/d30 device: corpus ∪
    * a deterministic near-dup FLOOD ([[RepairFloodN]] jittered clones
    * of the first vector — the template-page pile-up Round10Spec
    * measured killing the capped LSH path), which lands one genuinely
    * hot list (ratio ≈ 6).
    *
    * The split is sub = perm(vec_id) mod ⌈ratio⌉ on the d13/d20
    * mod-prime permutation — NOT a geometric 2-means (a near-dup flood
    * is geometrically DEGENERATE: all members sit at one point, so any
    * distance-based split is ill-conditioned and collapses to one
    * side) and NOT a ranked round-robin (that would sort the hot list
    * in one task — the exact d27 failure). Hash-mod needs no per-list
    * sort anywhere, is layout-invariant, and balances to binomial
    * noise. Sub-list ids are parent + k·sub, so parent = id mod k and
    * serving probes every sub of a probed parent — the candidate set
    * is provably identical to pre-repair, which is why repair cannot
    * change search results (spec-pinned structurally).
    *
    * Output: the post-repair census in e22's vocabulary — one row per
    * final list with its parent, size, the parent's pre-repair ratio,
    * the post-repair ratio (against the NEW list count) and the split
    * flag.
    */
  def e24IvfRepair(spark: SparkSession, dir: String): DataFrame = {
    val census = e24Repaired(spark, dir)
      .groupBy("new_id")
      .agg(count(lit(1)).as("n_vecs"), min("ratio_before").as("ratio_before"),
        (min("n_subs") > 1L).as("was_split"))
    val tot2 = census.agg(sum("n_vecs").cast("double").as("total2"),
      count(lit(1)).cast("double").as("k2"))
    census.crossJoin(broadcast(tot2))
      .select(col("new_id").cast("long").as("centroid_id"),
        (col("new_id") % IvfK).cast("long").as("parent_id"),
        col("n_vecs"), col("ratio_before"),
        (col("n_vecs") * col("k2") / col("total2")).as("skew_ratio"),
        col("was_split"))
  }

  /** The flood corpus, its assignment, and the per-vector repaired
    * list id — shared by [[e24IvfRepair]] and its spec (which asserts
    * membership preservation per parent, the property that makes
    * repair invisible to search).
    */
  private[graft] def e24Repaired(spark: SparkSession, dir: String): DataFrame = {
    val base = emb(spark, dir)
    val v0 = base.orderBy("vec_id").limit(1).select(col("v").as("v0"))
    val flood = spark.range(RepairFloodN).crossJoin(broadcast(v0))
      .select((col("id") + 100000L).as("vec_id"),
        expr("transform(v0, x -> x * (1.0d + 0.0002d * id))").as("v"))
      .withColumn("nrm", sqrt(dotOf(spark, "v", "v")))
    val corpus = base.unionByName(flood)
    // fit on the BASE corpus, assign the flooded one: the production
    // sequence that CREATES a hot list — the quantizer was trained,
    // then a template flood arrived, and every clone lands in the one
    // cell nearest the template (fitting on the flooded corpus would
    // instead elect flood members as centroids and hide the skew —
    // observed directly before this ordering was pinned)
    val assigned = assignToNearest(spark, corpus, centroidsDf(spark, fitCentroids(base)))
    val cen = assigned.groupBy("centroid_id").agg(count(lit(1)).as("n"))
    val tot = cen.agg(sum("n").cast("double").as("total"),
      count(lit(1)).cast("double").as("k"))
    val fl = cen.crossJoin(broadcast(tot))
      .select(col("centroid_id"),
        (col("n") * col("k") / col("total")).as("ratio_before"))
      .withColumn("n_subs",
        when(col("ratio_before") > RepairThreshold,
          ceil(col("ratio_before"))).otherwise(1L))
    val P = 1000000007L
    assigned.select("vec_id", "centroid_id")
      .join(broadcast(fl), Seq("centroid_id"))
      .withColumn("perm", col("vec_id") % P * lit(888000131L) % P)
      .withColumn("sub", col("perm") % col("n_subs"))
      .withColumn("new_id", col("centroid_id") + lit(IvfK.toLong) * col("sub"))
  }

  /** e19: the IVF TUNING CURVE — recall@10 vs nprobe (the artifact an
    * index operator actually reads before picking the serving config;
    * FAISS's `nprobe` sweep): e04's search at nprobe ∈ {1, 2, 4}
    * left-joined against the e01 exact panel (the e10 device, swept),
    * reduced to integer hit counts per setting. More probed cells →
    * monotonically more candidates → recall can only rise (spec-pinned
    * along with nprobe=IvfNprobe agreeing with e04 exactly).
    *
    * Scale shape: e10's — ground truth costs panel × corpus once; each
    * sweep point re-probes with a different cell budget; the join and
    * rollup touch 200-row frames.
    */
  def e19IvfTuningCurve(spark: SparkSession, dir: String): DataFrame = {
    val exact = e01KnnCosine(spark, dir).select("query_id", "neighbor_id")
    Seq(1, 2, 4).map { np =>
      val approx = e04Search(spark, dir, np)
        .select(col("query_id"), col("neighbor_id"), lit(1L).as("hit"))
      exact.join(approx, Seq("query_id", "neighbor_id"), "left")
        .agg(count(lit(1)).as("n_exact"), count(col("hit")).as("n_hit"))
        .select(lit(np.toLong).as("nprobe"), col("n_exact"), col("n_hit"))
    }.reduce(_.unionByName(_))
  }

  /** e20: cluster-balanced panel sampling — draw an equal-budget sample
    * from every coarse cluster (the DataComp/SemDeDup curation draw,
    * and exactly how IVF/PQ codebook-training and eval panels are taken
    * at scale: per-cell, never uniform — a uniform draw over a skewed
    * corpus hands the head cluster the whole budget and the tail
    * nothing). Clusters are e04's deterministic coarse quantizer;
    * admission per cluster is "the [[SampleCap]] lowest by a mod-prime
    * permutation of vec_id" — a deterministic, layout-invariant stand-in
    * for a uniform draw (d13/d20's device), reproducible on any engine.
    *
    * Scale shape (100 TB): the cap is CONSTANT, so the d27 salted
    * two-phase election applies verbatim — stage 1 keeps the cap-lowest
    * per (cluster, salt) shard (map-heavy, each window sees ~1/s of a
    * cluster), stage 2 re-elects over ≤ salt·cap ≈ 200 survivors per
    * cluster. The global cap-lowest provably survive stage 1 (the
    * permutation is a total order), so the result is bit-identical to
    * the naive single-window sort this device replaces — no hot-cluster
    * task ever sorts corpus/k rows. Output ≤ k·cap rows, bounded at any
    * corpus size.
    */
  val SampleCap = 24

  def e20ClusterSample(spark: SparkSession, dir: String): DataFrame = {
    val e = emb(spark, dir)
    val centsDf = centroidsDf(spark, fitCentroids(e))
    val assigned = assignToNearest(spark, e, centsDf)
      .select(col("vec_id"), col("centroid_id"))
    val P = 1000000007L
    val s = 8
    val stage1 = assigned
      .withColumn("u", col("vec_id") % P * lit(888000131L) % P)
      .withColumn("salt", pmod(col("vec_id"), lit(s.toLong)))
      .withColumn("r1", row_number().over(
        Window.partitionBy("centroid_id", "salt").orderBy("u", "vec_id")))
      .where(col("r1") <= SampleCap)
      .drop("salt", "r1")
    stage1
      .withColumn("rk", row_number().over(
        Window.partitionBy("centroid_id").orderBy("u", "vec_id")).cast("long"))
      .where(col("rk") <= SampleCap)
      .select(col("centroid_id").cast("long").as("centroid_id"),
        col("vec_id"), col("rk"))
  }

  /** e07: product-quantized ANN with asymmetric distance (ADC) — the
    * memory-compression path of the family: at 10¹¹ vectors the floats
    * (256 B each) do not fit anywhere, so every vector is stored as
    * M=[[PqM]] sub-codes (1 byte each) into per-subspace codebooks,
    * and search scans the CODES, not the vectors. [[PqM]] subspaces,
    * 16 codes each:
    *
    *  - codebooks: the same deterministic sampled rows as e04's coarse
    *    quantizer (cross-engine reproducible; a trained sub-KMeans
    *    plugs in identically), each sampled vector's M slices forming
    *    one entry per subspace;
    *  - encoding: M 16-row broadcast argmin assignments (map-side
    *    combined, ties on code id) — no shuffle of vectors;
    *  - search: each query precomputes its M×16 dot-product lookup
    *    table (the ADC trick); candidate scoring is then M broadcast
    *    LUT probes + adds per code row — the scan, the LUT joins and
    *    the top-[[PqCand]] window touch ONLY
    *    (vec_id, code_0..M−1, anrm): no float vector rides the
    *    approximate phase (pinned in PlanSpec);
    *  - rerank: the top-[[PqCand]] by approximate cosine JOIN their
    *    full vectors back by vec_id (the e05 join-back shape: the tiny
    *    20×[[PqCand]] candidate set broadcasts, the corpus is probed,
    *    never the reverse) and rank by exact cosine (top-10 out) — only
    *    20×[[PqCand]] rows ever touch floats again.
    *
    * All doubles on both engines come from the identical left-to-right
    * folds, so the candidate cut and final ranking cannot diverge —
    * e07 is oracle-checkable like the rest of the family.
    */
  val PqM = 8
  val PqCand = 64

  /** The approximate (code-only) phase of e07/e08: encode, ADC-score,
    * cut to the top-[[PqCand]] candidates per query. Output is bare
    * (query_id, neighbor_id) — by construction nothing downstream of
    * the per-subspace encoding aggregates carries a float vector,
    * which PlanSpec pins.
    *
    * With `ivf = true` (e08) the scored candidates are first
    * restricted to each query's `IvfNprobe` nearest coarse cells:
    * every vector gets e04's argmin centroid assignment at encode
    * time (one more byte next to the M codes — the classic IVF+PQ
    * layout), and the ADC scan touches only the probed lists instead
    * of the whole code table — corpus/IvfK × IvfNprobe code rows per
    * query.
    */
  private[graft] def e07CandidateStage(spark: SparkSession, dir: String,
      ivf: Boolean = false): DataFrame = {
    val e = emb(spark, dir)
    val P = 1000000007L
    val sampled = e.select(col("vec_id"), col("v"))
      .withColumn("ch", col("vec_id") % P * IvfHashMul % P)
      .orderBy(col("ch"), col("vec_id"))
      .limit(IvfK)
      .collect()
      .zipWithIndex
      .map { case (r, i) => (i, r.getSeq[Double](1).toArray) }
    // empty corpus → no codebook to fit; the serving contract is an
    // empty result, not a NoSuchElementException (EmptyInputSpec)
    if (sampled.isEmpty) {
      import org.apache.spark.sql.types._
      return spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
        StructType(Seq(StructField("query_id", LongType), StructField("neighbor_id", LongType))))
    }
    val subLen = sampled.head._2.length / PqM
    val subs = 0 until PqM
    // per-subspace codebook: (code id, sub-centroid, its |·|²)
    def cb(s: Int) = spark.createDataFrame(
        sampled.toSeq.map { case (i, cv) =>
          val cs = cv.slice(s * subLen, (s + 1) * subLen)
          (i, cs.toSeq, cs.foldLeft(0.0)((a, x) => a + x * x))
        })
      .toDF(s"code$s", s"cs$s", s"c2_$s")
    val sliced = e.select(
      col("vec_id") +: col("nrm") +:
        subs.map(s => expr(s"slice(v, ${s * subLen + 1}, $subLen)").as(s"x$s")): _*)
    // encoding: ALL M subspace argmins in ONE pass — (vec_id, s, x_s)
    // rows join the broadcast 128-row (s, code, cs, |cs|²) codebook
    // union on s, a single map-side-combined min_by per (vec_id, s)
    // picks each sub-code, and one more keyed aggregate pivots the M
    // rows back to columns. Two exchanges total, vs an M-deep chain of
    // per-subspace joins re-shuffling the growing code row M times —
    // the difference between encoding in one pass and M passes at
    // 10¹¹ vectors. Argmin semantics per subspace are unchanged
    // (same d2, same (d2, code) tie-break), so codes cannot move.
    val cbAll = spark.createDataFrame(
        subs.flatMap(s => sampled.toSeq.map { case (i, cv) =>
          val cs = cv.slice(s * subLen, (s + 1) * subLen)
          (s, i, cs.toSeq, cs.foldLeft(0.0)((a, x) => a + x * x))
        }).toSeq)
      .toDF("s", "code", "cs", "c2")
    val exploded = sliced.select(col("vec_id"),
      posexplode(array(subs.map(s => col(s"x$s")): _*)).as(Seq("s", "x")))
    val assigned = exploded.join(broadcast(cbAll), Seq("s"))
      .withColumn("d2", dotOf(spark, "x", "cs") * lit(-2.0) + col("c2"))
      .groupBy(col("vec_id"), col("s"))
      .agg(min_by(struct(col("code"), col("c2")), struct(col("d2"), col("code"))).as("m"))
    // the compressed table a production pipeline would persist:
    // (vec_id, code_0..M-1) — M bytes per vector — plus the
    // code-derived approximate norm. NO float vector: this is the
    // whole point of PQ, and everything from here to the candidate
    // cut stays code-width.
    val pivotCols =
      subs.map(s => first(when(col("s") === s, col("m.code")), ignoreNulls = true).as(s"code$s")) ++
        subs.map(s => first(when(col("s") === s, col("m.c2")), ignoreNulls = true).as(s"c2_$s"))
    val codesPq = assigned.groupBy(col("vec_id"))
      .agg(pivotCols.head, pivotCols.tail: _*)
      .withColumn("anrm", sqrt(subs.map(s => col(s"c2_$s")).reduce(_ + _)))
    // IVF side (e08): the 16 sampled vectors double as e04's coarse
    // centroids (same rows, same argmin, same oracle CTE); assignment
    // happens at encode time and rides the code row as one more small
    // column. The probe list is the tiny query side.
    val centsDf = spark.createDataFrame(
        sampled.toSeq.map { case (i, cv) =>
          (i, cv.toSeq, cv.foldLeft(0.0)((a, x) => a + x * x))
        })
      .toDF("cid", "cv", "cc2")
    def d2full = dotOf(spark, "v", "cv") * lit(-2.0) + col("cc2")
    lazy val asg = e.crossJoin(broadcast(centsDf))
      .withColumn("d2", d2full)
      .groupBy(col("vec_id"))
      .agg(min_by(col("cid"), struct(col("d2"), col("cid"))).as("cid"))
    lazy val probes = e.where(col("vec_id") < 20)
      .crossJoin(broadcast(centsDf))
      .withColumn("d2", d2full)
      .withColumn("pr", row_number().over(
        Window.partitionBy("vec_id").orderBy(col("d2"), col("cid"))))
      .where(col("pr") <= IvfNprobe)
      .select(col("vec_id").as("pqid"), col("cid").as("pcid"))
    val codes = if (ivf) codesPq.join(asg, Seq("vec_id")) else codesPq
    // per-query ADC lookup tables: M×16 sub-dot-products per query —
    // candidate scoring is then M LUT probes + adds per CODE row
    val q = sliced.where(col("vec_id") < 20)
    def lut(s: Int) = q
      .select(col("vec_id").as(s"qid$s"), col(s"x$s"))
      .crossJoin(broadcast(cb(s)))
      .select(col(s"qid$s"), col(s"code$s"), dotOf(spark, s"x$s", s"cs$s").as(s"a$s"))
    val fanned = subs.foldLeft(codes) { (acc, s) =>
      val l = lut(s)
      val cond = if (s == 0) acc(s"code$s") === l(s"code$s")
        else acc(s"code$s") === l(s"code$s") && acc("qid0") === l(s"qid$s")
      acc.join(broadcast(l), cond).drop(l(s"code$s"))
    }
    // query norms only (scalars) — the query VECTORS stay out of the
    // approximate phase too; they join back at rerank like the corpus'
    val qn = q.select(col("vec_id").as("qid0"), col("nrm").as("qn"))
    // e08: keep only candidates whose coarse cell is in the query's
    // probe list — the inverted-list restriction, applied as a tiny
    // broadcast semi-join on (cell, query) before the ranking window
    val restricted =
      if (ivf) fanned.join(broadcast(probes),
        col("cid") === col("pcid") && col("qid0") === col("pqid"))
        .drop("pcid", "pqid")
      else fanned
    val approx = restricted
      .where(col("vec_id") =!= col("qid0"))
      .withColumn("adot", subs.map(s => col(s"a$s")).reduce(_ + _))
      .join(broadcast(qn), Seq("qid0"))
      .withColumn("approx_cos", col("adot") / (col("qn") * col("anrm")))
    val wA = Window.partitionBy("qid0").orderBy(col("approx_cos").desc, col("vec_id"))
    approx.withColumn("rn", row_number().over(wA)).where(col("rn") <= PqCand)
      .select(col("qid0").as("query_id"), col("vec_id").as("neighbor_id"))
  }

  /** Exact rerank over a bare (query_id, neighbor_id) candidate cut:
    * the surviving 20×PqCand pairs broadcast against the corpus to
    * fetch full vectors — e05's join-back shape (e05KnnJoin); floats
    * move only for survivors. Norms are recomputed AFTER the join
    * (survivors + the 20 queries pay the dot product, not the whole
    * corpus — candidate ids came from [[emb]], so the nrm>0 filter
    * already held; the fold is the same left-to-right sum,
    * bit-identical).
    */
  private def exactRerank(spark: SparkSession, dir: String, cut: DataFrame): DataFrame = {
    val raw = Tables.embeddings(spark, dir)
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
    val qv = raw.where(col("vec_id") < 20)
      .withColumn("qn", sqrt(dotOf(spark, "v", "v")))
      .where(col("qn") > 0.0)
      .select(col("vec_id").as("query_id"), col("v").as("qv"), col("qn"))
    val w = Window.partitionBy("query_id").orderBy(col("cosine").desc, col("neighbor_id"))
    raw.select(col("vec_id").as("neighbor_id"), col("v"))
      .join(broadcast(cut), Seq("neighbor_id"))
      .withColumn("nrm", sqrt(dotOf(spark, "v", "v")))
      .join(broadcast(qv), Seq("query_id"))
      .select(col("query_id"), col("neighbor_id"),
        (dotOf(spark, "qv", "v") / (col("qn") * col("nrm"))).as("cosine"))
      .withColumn("rn", row_number().over(w)).where(col("rn") <= 10)
      .select("query_id", "neighbor_id", "cosine")
  }

  def e07AnnPq(spark: SparkSession, dir: String): DataFrame =
    exactRerank(spark, dir, e07CandidateStage(spark, dir))

  /** e08: IVF + PQ — the production serving shape for very large
    * corpora, composing e04's inverted lists with e07's code
    * compression: vectors are stored as (centroid_id, code_0..M−1) —
    * M+1 bytes — search probes IvfNprobe coarse cells, ADC-scores
    * ONLY the probed lists' code rows (corpus/IvfK × IvfNprobe per
    * query instead of e07's full code scan), and the top-[[PqCand]]
    * survivors rerank exactly from their fetched vectors. Both
    * approximations share e04/e07's deterministic fits, so the cut and
    * ranking reproduce in DuckDB — e08 is oracle-checkable like the
    * rest of the family.
    */
  def e08AnnIvfPq(spark: SparkSession, dir: String): DataFrame =
    exactRerank(spark, dir, e07CandidateStage(spark, dir, ivf = true))

  /** Candidate cut width for e14 — same as [[PqCand]]. */
  val SqCand = 64

  /** The approximate (code-only) phase of e14: per-dimension scalar
    * quantization (SQ8). The "model" is 2·dim doubles — per-dim
    * (min, range) from one map-side-combined aggregate — shipped as
    * plan literals; each vector stores dim byte codes PACKED 8-per-long
    * (8 longs for dim=64: 8× smaller than the doubles) plus its scalar
    * dequantized norm. Scoring unpacks codes arithmetically in the scan
    * projection (shiftright/&255, codegen'd) and reduces immediately to
    * (query_id, neighbor_id, approx_cos) — the candidate shuffle and
    * top-[[SqCand]] window carry scalars only (PlanSpec pin, e07's
    * contract). adot decomposes as Σq·mn + Σ(q·scale)·code, so the
    * query side pre-computes one scalar + one premultiplied weight
    * array and the per-candidate cost is one fused dot fold.
    */
  private[graft] def e14CandidateStage(spark: SparkSession, dir: String,
      ivf: Boolean = false): DataFrame = {
    import org.apache.spark.sql.types._
    val P = 1000000007L
    val e = emb(spark, dir)
    val mm = e.select(posexplode(col("v")).as(Seq("d", "x")))
      .groupBy("d").agg(min(col("x")).as("mn"), max(col("x")).as("mx"))
      .orderBy("d").collect()
    // empty corpus → nothing to quantize; serve empty, don't throw
    if (mm.isEmpty)
      return spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
        StructType(Seq(StructField("query_id", LongType), StructField("neighbor_id", LongType))))
    val dim = mm.length
    val minArr = mm.map(_.getDouble(1))
    val rangeArr = mm.map(r => r.getDouble(2) - r.getDouble(1))
    val nw = (dim + 7) / 8
    def withModel(df: DataFrame): DataFrame =
      df.withColumn("mnA", lit(minArr)).withColumn("rgA", lit(rangeArr))
    // Encode with straight-line scalar expressions — the per-dim model
    // rides as double LITERALS (Double.toString round-trips exactly),
    // so every op is a codegen'd primitive. The earlier transform/
    // zip_with/aggregate formulation evaluated interpreted 64-element
    // lambdas per corpus row (higher-order functions are
    // CodegenFallback) and dominated the sf1 profile. A zero-range dim
    // quantizes to 0 and dequantizes to its min. Byte value, dequant
    // formula and summation order are unchanged, so codes, norms and
    // the oracle cannot move.
    def dl(x: Double): String = s"(${x}D)"
    def byteSql(d: Int): String =
      if (rangeArr(d) > 0)
        s"greatest(0L, least(255L, floor((element_at(v, ${d + 1}) - ${dl(minArr(d))})" +
          s" * 255D / ${dl(rangeArr(d))})))"
      else "0L"
    val packed0 = e.select(
      col("vec_id") +: col("v") +:
        (0 until nw).map { w =>
          (0 until math.min(8, dim - w * 8)).map { k =>
            expr(s"shiftleft(cast(${byteSql(w * 8 + k)} as bigint), ${k * 8})")
          }.reduce(_.bitwiseOR(_)).as(s"cw$w")
        }: _*)
    // dequantized norm from the packed words (bytes re-read via
    // shift/&255 — integer ops): Σ dq_d² in the same left-to-right
    // order as the replaced fold
    val packed = packed0.withColumn("anrm", sqrt(
        (0 until dim).map { d =>
          val dq = s"(${dl(minArr(d))} + cast(shiftright(cw${d / 8}, ${(d % 8) * 8})" +
            s" & 255L as double) * (${dl(rangeArr(d))} / 255D))"
          expr(s"$dq * $dq")
        }.reduce(_ + _)))
      .drop("v")
    val q = withModel(e).where(col("vec_id") < 20).select(
      col("vec_id").as("query_id"),
      expr("aggregate(zip_with(v, mnA, (x, m) -> x*m), 0D, (a, x) -> a + x)").as("qmin"),
      expr("zip_with(v, rgA, (x, r) -> x * (r / 255D))").as("qsc"),
      col("nrm").as("qn"))
    // IVF side (e15): e04's deterministic sampled coarse centroids;
    // the assignment rides the packed code row as one small column —
    // the classic IVF-SQ layout (FAISS IVF-SQ8) — and the ADC scan
    // touches only the probed lists, same restriction shape as e08
    val (codes, probesOpt) =
      if (!ivf) (packed, None)
      else {
        val sampled = e.select(col("vec_id"), col("v"))
          .withColumn("ch", col("vec_id") % P * IvfHashMul % P)
          .orderBy(col("ch"), col("vec_id"))
          .limit(IvfK)
          .collect()
          .zipWithIndex
          .map { case (r, i) => (i, r.getSeq[Double](1).toArray) }
        val centsDf = spark.createDataFrame(
            sampled.toSeq.map { case (i, cv) =>
              (i, cv.toSeq, cv.foldLeft(0.0)((a, x) => a + x * x))
            })
          .toDF("cid", "cv", "cc2")
        def d2full = dotOf(spark, "v", "cv") * lit(-2.0) + col("cc2")
        val asg = e.crossJoin(broadcast(centsDf))
          .withColumn("d2", d2full)
          .groupBy(col("vec_id"))
          .agg(min_by(col("cid"), struct(col("d2"), col("cid"))).as("cid"))
        val probes = e.where(col("vec_id") < 20)
          .crossJoin(broadcast(centsDf))
          .withColumn("d2", d2full)
          .withColumn("pr", row_number().over(
            Window.partitionBy("vec_id").orderBy(col("d2"), col("cid"))))
          .where(col("pr") <= IvfNprobe)
          .select(col("vec_id").as("pqid"), col("cid").as("pcid"))
        (packed.join(asg, Seq("vec_id")), Some(probes))
      }
    // straight-line codegen'd scoring: one shiftright/&255/multiply
    // chain per dimension instead of transform+aggregate lambdas
    // (higher-order functions are CodegenFallback and were paying an
    // interpreted 64-element fold PER CANDIDATE ROW — measured 18.0 s
    // at sf1, 4.4 s after this rewrite). The + chain associates left
    // like the fold, so every double is bit-identical and the oracle
    // is untouched.
    val sumExpr = (0 until dim).map { d =>
      expr(s"element_at(qsc, ${d + 1}) * " +
        s"cast(shiftright(cw${d / 8}, ${(d % 8) * 8}) & 255L as double)")
    }.reduce(_ + _)
    val cand0 = codes.crossJoin(broadcast(q))
      .where(col("vec_id") =!= col("query_id"))
    val restricted = probesOpt match {
      case Some(p) => cand0.join(broadcast(p),
          col("cid") === col("pcid") && col("query_id") === col("pqid"))
        .drop("pcid", "pqid")
      case None => cand0
    }
    val cand = restricted
      .select(col("query_id"), col("vec_id").as("neighbor_id"),
        ((col("qmin") + sumExpr) / (col("qn") * col("anrm"))).as("approx_cos"))
    val w = Window.partitionBy("query_id").orderBy(col("approx_cos").desc, col("neighbor_id"))
    cand.withColumn("rn", row_number().over(w)).where(col("rn") <= SqCand)
      .select("query_id", "neighbor_id")
  }

  /** e14: scalar-quantized (SQ8) ANN — the third compression scheme of
    * the serving family, between e02's buckets and e07's PQ: per-dim
    * 8-bit affine codes (FAISS SQ8's shape) give exact-ish per-dim
    * reconstruction at 8× memory compression with NO codebook fit —
    * the model is per-dim (min, range), trivially mergeable across
    * shards at 100 TB. Approximate scores scan packed code words only;
    * the top-[[SqCand]] survivors rerank exact via the e05/e07
    * join-back. Same 20-query/top-10 contract as e01/e02/e07.
    */
  def e14AnnSq8(spark: SparkSession, dir: String): DataFrame =
    exactRerank(spark, dir, e14CandidateStage(spark, dir))

  /** e15: IVF + SQ8 — the most widely deployed production vector-store
    * layout (FAISS IVF-SQ8): e04's inverted lists over e14's per-dim
    * byte codes. Vectors store as (centroid_id, 8 packed code words,
    * norm) ≈ dim+1 bytes + 8; search probes IvfNprobe coarse cells and
    * ADC-scores ONLY the probed lists' code rows — corpus/IvfK ×
    * IvfNprobe rows per query instead of e14's flat scan — then the
    * top-[[SqCand]] survivors rerank exact via join-back. Completes
    * the compression matrix: {flat, IVF} × {PQ, SQ} = e07/e08/e14/e15.
    */
  def e15AnnIvfSq8(spark: SparkSession, dir: String): DataFrame =
    exactRerank(spark, dir, e14CandidateStage(spark, dir, ivf = true))

  /** e05: k-NN JOIN — top-3 neighbors for EVERY vector, not for a
    * broadcastable query batch. This is the retrieval-for-every-
    * training-example shape (kNN-LM / RETRO-style pipelines, embedding-
    * space alignment): both sides are the full corpus, so nothing can
    * broadcast — candidate generation must be a SHUFFLE hash join on
    * LSH bucket ids, and that is exactly the plan (bucket census cap
    * bounds any degenerate bucket, hamming-1 probes pay recall as
    * probe fan-out on 16-byte id rows, vectors join back only for
    * surviving candidates, per-query top-k is a keyed window — never a
    * global sort). 8-bit buckets: at n vectors a bucket holds ~n/256,
    * so the per-bucket join cost is (n/256)² · 256 = n²/256 — the
    * brute-force cross join divided by the bucket count, with the cap
    * as the skew backstop.
    */
  def e05KnnJoin(spark: SparkSession, dir: String): DataFrame = {
    val corpus = emb(spark, dir).withColumn("bucket", bucketColOf(SigBits, Some(spark)))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK) // read 4×: census, probe side, join side, vector join-back
    val useful = corpus.groupBy("bucket").count()
      .where(col("count") <= MaxBucketE).select("bucket")
    val in = corpus.join(useful, Seq("bucket"))
    val probes = in.select(col("vec_id").as("query_id"),
      explode(expr(
        s"array_union(array(bucket), transform(sequence(0, ${SigBits - 1}), " +
          "j -> bucket ^ shiftleft(1L, j)))")).as("bucket"))
    val cand = probes
      .join(in.select(col("bucket"), col("vec_id").as("neighbor_id")), Seq("bucket"))
      .where(col("query_id") =!= col("neighbor_id"))
      .select("query_id", "neighbor_id")
      .distinct()
    val scored = cand
      .join(corpus.select(col("vec_id").as("query_id"), col("v").as("qv"), col("nrm").as("qn")), Seq("query_id"))
      .join(corpus.select(col("vec_id").as("neighbor_id"), col("v"), col("nrm")), Seq("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"),
        (dotOf(spark, "qv", "v") / (col("qn") * col("nrm"))).as("cosine"))
    val w = Window.partitionBy("query_id").orderBy(col("cosine").desc, col("neighbor_id"))
    // eager-release (s05 pattern): the top-k result is tiny; checkpoint
    // it and release the persisted corpus before returning so the cache
    // entry doesn't outlive the operator in a long-lived session
    val out = scored.withColumn("rn", row_number().over(w)).where(col("rn") <= 3)
      .select("query_id", "neighbor_id", "cosine")
      .cutLineage
    corpus.unpersist()
    out
  }

  /** i01: ENN noise filtering (Wilson 1972's Edited Nearest Neighbor,
    * the classical instance-selection pass the reference's author
    * ships a distributed framework for — the ENN-BD shape): every
    * instance is classified by the PLURALITY label of its k=3 nearest
    * neighbors; instances some OTHER label strictly outvotes are
    * flagged as label noise. Ties keep the row (not strictly
    * misclassified), so the rule is order-free. Output = the flagged
    * census: (vec_id, label, n_neighbors, n_same, other_label = the
    * outvoting label with the most votes, ties to the smaller label,
    * n_other).
    *
    * Scale shape: the kNN substrate IS [[e05KnnJoin]] (capped LSH
    * buckets, hamming-1 multi-probe, id-only candidate shuffle, top-3
    * window) — ENN adds one broadcast-size label join and two
    * |flagged|-bounded aggregations on the K·n-row top-k frame; no
    * new all-pairs surface. Instances in over-cap buckets get no
    * vote and are conservatively kept, exactly as the substrate
    * documents its cap.
    */
  def i01EnnFilter(spark: SparkSession, dir: String): DataFrame = {
    val lbls = Tables.embeddings(spark, dir)
      .select(col("vec_id"), col("label").cast("long").as("lbl"))
    val votes = e05KnnJoin(spark, dir)
      .join(lbls.select(col("vec_id").as("neighbor_id"),
        col("lbl").as("nlbl")), "neighbor_id")
      .groupBy("query_id", "nlbl").agg(count(lit(1)).as("c"))
    val own = votes.join(
      lbls.select(col("vec_id").as("query_id"), col("lbl")), "query_id")
    val agg = own.groupBy(col("query_id"), col("lbl"))
      .agg(sum("c").as("n_neighbors"),
        sum(when(col("nlbl") === col("lbl"), col("c")).otherwise(0L)).as("n_same"))
    val other = own.where(col("nlbl") =!= col("lbl"))
      .withColumn("rn", row_number().over(
        Window.partitionBy("query_id").orderBy(col("c").desc, col("nlbl"))))
      .where(col("rn") === 1)
      .select(col("query_id"), col("nlbl").as("other_label"), col("c").as("n_other"))
    agg.join(other, "query_id")
      .where(col("n_other") > col("n_same"))
      .select(col("query_id").as("vec_id"), col("lbl").as("label"),
        col("n_neighbors"), col("n_same"), col("other_label"), col("n_other"))
  }

  /** i02: Tomek-link cleaning (Tomek 1976) — b01's undersampling
    * complement and i01's pairwise sibling: a Tomek link is a pair of
    * OPPOSITE-label instances that are each other's 1-NN — the
    * tightest possible class-boundary conflict; the cleaning pass
    * removes the majority-class member (class counts from the corpus
    * census; equal counts break to the larger id — total order).
    * Output: one row per link (vec_id_a < vec_id_b, both labels, the
    * removed id).
    *
    * Scale shape: 1-NN is a re-rank of [[e05KnnJoin]]'s 3-row groups
    * (no new pair surface); mutuality is one self-join of the n-row
    * 1-NN frame on the reversed key; the class census is |labels|
    * rows broadcast.
    */
  /** The bucketed-substrate projection (vec_id, bucket, v, nrm, lbl)
    * — exposed for e26's driver-side replay spec so the spec shares
    * the hash/norm EXPRESSIONS but none of the join/vote plan.
    */
  private[graft] def embWithBucket(spark: SparkSession, dir: String): DataFrame =
    emb(spark, dir).withColumn("bucket", bucketColOf(SigBits, Some(spark)))
      .join(Tables.embeddings(spark, dir)
        .select(col("vec_id"), col("label").cast("long").as("lbl")), "vec_id")
      .select(col("vec_id"), col("bucket"), col("v"), col("nrm"), col("lbl"))

  def i02TomekLinks(spark: SparkSession, dir: String): DataFrame = {
    val lbls = Tables.embeddings(spark, dir)
      .select(col("vec_id"), col("label").cast("long").as("lbl"))
    val nn1 = e05KnnJoin(spark, dir)
      .withColumn("rn", row_number().over(
        Window.partitionBy("query_id").orderBy(col("cosine").desc, col("neighbor_id"))))
      .where(col("rn") === 1)
      .select(col("query_id"), col("neighbor_id"))
    val mutual = nn1.as("f")
      .join(nn1.as("g"),
        col("f.query_id") === col("g.neighbor_id") &&
          col("f.neighbor_id") === col("g.query_id"))
      .where(col("f.query_id") < col("f.neighbor_id"))
      .select(col("f.query_id").as("vec_id_a"), col("f.neighbor_id").as("vec_id_b"))
    val census = lbls.groupBy("lbl").agg(count(lit(1)).as("n_class"))
    mutual
      .join(lbls.select(col("vec_id").as("vec_id_a"), col("lbl").as("label_a")), "vec_id_a")
      .join(lbls.select(col("vec_id").as("vec_id_b"), col("lbl").as("label_b")), "vec_id_b")
      .where(col("label_a") =!= col("label_b"))
      .join(broadcast(census.select(col("lbl").as("label_a"), col("n_class").as("na"))), "label_a")
      .join(broadcast(census.select(col("lbl").as("label_b"), col("n_class").as("nb"))), "label_b")
      .select(col("vec_id_a"), col("vec_id_b"), col("label_a"), col("label_b"),
        when(col("na") > col("nb"), col("vec_id_a"))
          .when(col("nb") > col("na"), col("vec_id_b"))
          .otherwise(greatest(col("vec_id_a"), col("vec_id_b"))).as("removed_id"))
  }

  /** i05: All-kNN editing (Tomek 1976's extension of Wilson's ENN —
    * the third member of the editing family next to i01/i02): an
    * instance is flagged when the kNN rule misclassifies it for ANY
    * k ∈ {1,2,3} — strictly outvoted by some other label among its
    * top-k neighbors (ties keep, the i01 order-free discipline). The
    * union-over-k rule is more aggressive than single-k ENN at
    * boundary noise while still conservative at ties. Output: one row
    * per flagged instance (vec_id, label, n_ks_flagged = how many of
    * the three k values flag it, first_flag_k = the smallest).
    *
    * Scale shape: the kNN substrate IS [[e05KnnJoin]] (capped LSH
    * buckets, id-only candidate shuffle, top-3 window) — All-kNN adds
    * a 3-way explode of the K·n-row top-k frame (bounded fan-out 3)
    * and two flagged-bounded aggregations; no new pair surface.
    */
  def i05AllKnn(spark: SparkSession, dir: String): DataFrame = {
    val lbls = Tables.embeddings(spark, dir)
      .select(col("vec_id"), col("label").cast("long").as("lbl"))
    val ranked = e05KnnJoin(spark, dir)
      .withColumn("rn", row_number().over(
        Window.partitionBy("query_id").orderBy(col("cosine").desc, col("neighbor_id"))))
      .join(lbls.select(col("vec_id").as("neighbor_id"),
        col("lbl").as("nlbl")), "neighbor_id")
    val votes = ranked
      .select(col("query_id"), col("nlbl"), col("rn"))
      .withColumn("k", explode(array(lit(1), lit(2), lit(3))))
      .where(col("rn") <= col("k"))
      .groupBy("query_id", "k", "nlbl").agg(count(lit(1)).as("c"))
    val own = votes.join(
      lbls.select(col("vec_id").as("query_id"), col("lbl")), "query_id")
    val perQK = own.groupBy("query_id", "k", "lbl")
      .agg(
        sum(when(col("nlbl") === col("lbl"), col("c")).otherwise(0L)).as("n_same"),
        max(when(col("nlbl") =!= col("lbl"), col("c")).otherwise(0L)).as("n_other_max"))
    perQK.where(col("n_other_max") > col("n_same"))
      .groupBy(col("query_id").as("vec_id"), col("lbl").as("label"))
      .agg(count(lit(1)).as("n_ks_flagged"),
        min("k").cast("long").as("first_flag_k"))
  }

  /** e26: distributed kNN CLASSIFICATION with a held-out split — the
    * evaluation loop instance-based pipelines ship (and the reference
    * family's end purpose: RELIEF weights exist to feed a kNN
    * classifier): vec_id % 5 == 0 is the query fold (20 %), the rest
    * the train fold; each query votes over its k=3 nearest TRAIN
    * neighbors on the e05 bucket substrate (capped buckets, hamming-1
    * probes, id-only candidate shuffle), plurality with ties to the
    * smaller label. Output: the confusion census
    * (true_label, pred_label, n) — queries whose buckets yield no
    * train candidate are excluded and the census says how many
    * predictions were made (the i01 conservative-abstain discipline).
    *
    * Scale shape: identical to e05 — candidates are id pairs from
    * capped bucket joins, vectors join back only for scoring; the
    * vote and census are ≤ |labels|² rows.
    */
  def e26KnnClassify(spark: SparkSession, dir: String): DataFrame = {
    val lbls = Tables.embeddings(spark, dir)
      .select(col("vec_id"), col("label").cast("long").as("lbl"))
    val corpus = emb(spark, dir).withColumn("bucket", bucketColOf(SigBits, Some(spark)))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val useful = corpus.groupBy("bucket").count()
      .where(col("count") <= MaxBucketE).select("bucket")
    val in = corpus.join(useful, Seq("bucket"))
    val train = in.where(col("vec_id") % 5 =!= 0)
    val probes = in.where(col("vec_id") % 5 === 0)
      .select(col("vec_id").as("query_id"),
        explode(expr(
          s"array_union(array(bucket), transform(sequence(0, ${SigBits - 1}), " +
            "j -> bucket ^ shiftleft(1L, j)))")).as("bucket"))
    val cand = probes
      .join(train.select(col("bucket"), col("vec_id").as("neighbor_id")), Seq("bucket"))
      .select("query_id", "neighbor_id").distinct()
    val scored = cand
      .join(corpus.select(col("vec_id").as("query_id"), col("v").as("qv"),
        col("nrm").as("qn")), Seq("query_id"))
      .join(corpus.select(col("vec_id").as("neighbor_id"), col("v"), col("nrm")),
        Seq("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"),
        (dotOf(spark, "qv", "v") / (col("qn") * col("nrm"))).as("cosine"))
    val w = Window.partitionBy("query_id").orderBy(col("cosine").desc, col("neighbor_id"))
    val top = scored.withColumn("rn", row_number().over(w)).where(col("rn") <= 3)
      .select("query_id", "neighbor_id")
      .cutLineage
    corpus.unpersist()
    val votes = top
      .join(lbls.select(col("vec_id").as("neighbor_id"), col("lbl").as("nlbl")),
        "neighbor_id")
      .groupBy("query_id", "nlbl").agg(count(lit(1)).as("c"))
    val pred = votes
      .withColumn("rn", row_number().over(
        Window.partitionBy("query_id").orderBy(col("c").desc, col("nlbl"))))
      .where(col("rn") === 1)
      .select(col("query_id"), col("nlbl").as("pred_label"))
    pred.join(lbls.select(col("vec_id").as("query_id"), col("lbl").as("true_label")),
        "query_id")
      .groupBy("true_label", "pred_label").agg(count(lit(1)).as("n"))
  }

  /** b02: SMOTE synthesis plan (Chawla et al. 2002, made
    * deterministic) — b01 rebalanced by REPLICATION; SMOTE
    * interpolates: every minority-class instance is paired with its
    * same-class 1-NN on the capped-bucket substrate and the synthetic
    * point is their midpoint (the k=1, λ=0.5 SMOTE special case — no
    * RNG state, layout-invariant). Output: the per-class synthesis
    * audit (label, n_minority, n_synth, synth_mass = Σ over synthetic
    * points of the component sum, round 6) — the mass ties the plan
    * to the actual interpolated VALUES, not just counts. Instances
    * whose probed buckets hold no same-class neighbor abstain (the
    * i01 conservative discipline); the majority class synthesizes
    * nothing by definition.
    *
    * Scale shape: e05's discipline end-to-end — id-only candidate
    * shuffle filtered to same-class pairs, vectors join back only for
    * the 1-NN scoring and the midpoint fold (one pass, no synthetic
    * FRAME materialized here — downstream generates rows from the
    * (query, neighbor) plan).
    */
  def b02SmotePlan(spark: SparkSession, dir: String): DataFrame = {
    val lbls = Tables.embeddings(spark, dir)
      .select(col("vec_id"), col("label").cast("long").as("lbl"))
    val censusAll = lbls.groupBy("lbl").agg(count(lit(1)).as("n_minority"))
    val mj = censusAll
      .orderBy(col("n_minority").desc, col("lbl")).limit(1)
      .select(col("lbl").as("mjlbl"))
    val corpus = emb(spark, dir).withColumn("bucket", bucketColOf(SigBits, Some(spark)))
      .join(lbls, "vec_id")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val useful = corpus.groupBy("bucket").count()
      .where(col("count") <= MaxBucketE).select("bucket")
    val in = corpus.join(useful, Seq("bucket"))
    val mino = in.crossJoin(broadcast(mj)).where(col("lbl") =!= col("mjlbl"))
    val probes = mino
      .select(col("vec_id").as("query_id"), col("lbl").as("qlbl"),
        explode(expr(
          s"array_union(array(bucket), transform(sequence(0, ${SigBits - 1}), " +
            "j -> bucket ^ shiftleft(1L, j)))")).as("bucket"))
    val cand = probes
      .join(in.select(col("bucket"), col("vec_id").as("neighbor_id"),
        col("lbl").as("nlbl")), Seq("bucket"))
      .where(col("nlbl") === col("qlbl") && col("neighbor_id") =!= col("query_id"))
      .select("query_id", "qlbl", "neighbor_id").distinct()
    val scored = cand
      .join(corpus.select(col("vec_id").as("query_id"), col("v").as("qv"),
        col("nrm").as("qn")), Seq("query_id"))
      .join(corpus.select(col("vec_id").as("neighbor_id"), col("v"), col("nrm")),
        Seq("neighbor_id"))
      .select(col("query_id"), col("qlbl"), col("neighbor_id"),
        (dotOf(spark, "qv", "v") / (col("qn") * col("nrm"))).as("cosine"),
        expr("aggregate(zip_with(qv, v, (x, y) -> (x + y) / 2.0D), " +
          "0D, (acc, x) -> acc + x)").as("mass"))
    val nn1 = scored.withColumn("rn", row_number().over(
        Window.partitionBy("query_id").orderBy(col("cosine").desc, col("neighbor_id"))))
      .where(col("rn") === 1)
      .cutLineage
    corpus.unpersist()
    val synth = nn1.groupBy(col("qlbl").as("lbl"))
      .agg(count(lit(1)).as("n_synth"), sum("mass").as("mass"))
    censusAll.crossJoin(broadcast(mj)).where(col("lbl") =!= col("mjlbl"))
      .join(synth, Seq("lbl"), "left")
      .select(col("lbl").as("label"), col("n_minority"),
        coalesce(col("n_synth"), lit(0L)).as("n_synth"),
        round(coalesce(col("mass"), lit(0.0)), 6).as("synth_mass"))
  }

  /** i03's unrolled FCNN round count (set bounded by
    * |classes|·2^rounds, so 3 rounds ⇒ ≤ 8·|classes| prototypes).
    */
  val FcnnRounds = 3

  /** i03: FCNN condensation (Angiulli, ICML 2005 / TPAMI 2007) — the
    * instance-SELECTION side of the i-family (i01/i02 REMOVE noise,
    * FCNN keeps the minimal consistent prototype set): seed one
    * prototype per class (smallest id — total order), then each round
    * classifies every point by its nearest prototype (cosine, ties to
    * smaller prototype id) and, per Voronoi cell, ADDS the
    * misclassified point closest to the cell's prototype. Three
    * unrolled rounds (the e13/f04/g01 precedent), prototypes
    * materialized per round. Output: the per-round audit
    * (round, n_prototypes, n_misclassified, added_id_sum) — round 0
    * is the seed census.
    *
    * Scale shape: the prototype set is bounded (≤ |classes|·2^r ≈ 80
    * rows) and BROADCAST to the corpus each round — the per-round
    * cost is one n × |S| broadcast-join scan + two bounded
    * aggregations; no all-pairs surface, nothing driver-looped over
    * the corpus.
    */
  def i03FcnnCondense(spark: SparkSession, dir: String): DataFrame = {
    val pts = emb(spark, dir)
      .join(Tables.embeddings(spark, dir)
        .select(col("vec_id"), col("label").cast("long").as("lbl")), "vec_id")
      .select(col("vec_id"), col("v"), col("nrm"), col("lbl"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    var protos = pts.groupBy("lbl").agg(min("vec_id").as("vec_id"))
      .select("vec_id").cutLineage
    val audits = scala.collection.mutable.ArrayBuffer[DataFrame]()
    audits += protos.agg(count(lit(1)).as("n_prototypes"))
      .select(lit(0L).as("round"), col("n_prototypes"),
        lit(null).cast("long").as("n_misclassified"),
        lit(null).cast("long").as("added_id_sum"))
    for (r <- 1 to FcnnRounds) {
      val pv = protos
        .join(pts.select(col("vec_id"), col("v").as("pv"), col("nrm").as("pn"),
          col("lbl").as("plbl")), "vec_id")
        .select(col("vec_id").as("proto_id"), col("pv"), col("pn"), col("plbl"))
      val scoredAll = pts.crossJoin(broadcast(pv))
        .select(col("vec_id"), col("lbl"), col("proto_id"), col("plbl"),
          (dotOf(spark, "v", "pv") / (col("nrm") * col("pn"))).as("cos"))
      val nearest = scoredAll
        .withColumn("rn", row_number().over(
          Window.partitionBy("vec_id").orderBy(col("cos").desc, col("proto_id"))))
        .where(col("rn") === 1)
      val mis = nearest.where(col("lbl") =!= col("plbl"))
        .cutLineage
      val reps = mis
        .withColumn("rp", row_number().over(
          Window.partitionBy("proto_id").orderBy(col("cos").desc, col("vec_id"))))
        .where(col("rp") === 1)
        .select(col("vec_id")).cutLineage
      audits += reps.agg(
          coalesce(sum("vec_id"), lit(0L)).as("added_id_sum"))
        .crossJoin(mis.agg(count(lit(1)).as("n_misclassified")))
        .crossJoin(protos.agg(count(lit(1)).as("np")))
        .crossJoin(reps.agg(count(lit(1)).as("nr")))
        .select(lit(r.toLong).as("round"),
          (col("np") + col("nr")).as("n_prototypes"),
          col("n_misclassified"), col("added_id_sum"))
      protos = protos.unionByName(reps).cutLineage
    }
    val out = audits.reduce(_ unionByName _).cutLineage
    pts.unpersist()
    out
  }

  /** k-NN-graph degree for e23 (K) at the SMALL-corpus tier: the
    * per-node out-degree of the graph under construction, and the
    * reverse-neighbor cap per round (NN-descent's ρ·K sample with
    * ρ = 1 — deterministic: top-K reverse edges by (cosine desc, id),
    * never a random sample). The effective degree is corpus-scaled —
    * see [[graphKOf]]; this constant is the n ≤ 1000 tier.
    */
  val GraphK = 5

  /** CORPUS-SCALED NN-descent build budget (r13 — the r12 verdict's
    * headline defect): a FIXED out-degree is the measured recall
    * cliff. The beam walk explores ≤ beam·K candidates per hop, so at
    * fixed K the explored fraction of the corpus shrinks linearly in
    * n and serve recall collapsed 0.35 → 0.125 between sf0.01 and
    * sf0.1. HNSW/NN-descent practice (Malkov & Yashunin §4: ef_c and
    * M are raised with corpus size; Dong et al. §4.3: K controls the
    * convergence basin) scales the CONSTRUCTION budget, not the serve
    * budget — the walk stays beam 12 × 3 hops. Staircase, not a
    * continuous function, so (a) the n ≤ 1000 tier reproduces the
    * historical K = 5 graph bit-for-bit (sf0.001/sf0.01 oracles
    * unchanged) and (b) the DuckDB replay mirrors it with one CASE
    * over count(*). Tier elected by RecallProbe measurement at sf0.1
    * (n = 2000, serve fixed at beam 12 × 3 hops):
    * K=5 → e29 0.125, K=10 → 0.300, K=14 → 0.490 — K=14 is the
    * HNSW-M-class production degree (Malkov & Yashunin use M 16-48)
    * and the elected top tier.
    */
  def graphKOf(n: Long): Int =
    if (n <= 1000L) GraphK else 14

  /** The init-substrate stop-bucket cap, corpus-scaled the same way:
    * a fixed cap silently DROPS every typical bucket once mean
    * occupancy n/2^SigBits approaches it (at the sf1 replica the mean
    * is 78 > 64 — the whole init would vanish). Keep the cap at ≈ 8×
    * the balanced mean, floored at the historical 64 so small-SF
    * graphs are unchanged; degenerate pile-ups (the cap's reason to
    * exist) sit far above 8× mean regardless of n.
    */
  def maxBucketOf(n: Long): Int = math.max(MaxBucketE, (n / 32L).toInt)

  /** Corpus size for budget election — the RAW embeddings row count
    * (parquet metadata, one cheap job, cached per app×dir), exactly
    * `SELECT count(*) FROM embeddings` so the oracle elects the same
    * tier from the same number.
    */
  private val corpusNCache =
    new java.util.concurrent.ConcurrentHashMap[(String, String), java.lang.Long]
  private[graft] def corpusN(spark: SparkSession, dir: String): Long =
    corpusNCache.computeIfAbsent(
      (spark.sparkContext.applicationId, dir),
      _ => java.lang.Long.valueOf(Tables.embeddings(spark, dir).count())).longValue()

  private[graft] def invalidateCorpusN(spark: SparkSession, dir: String): Unit =
    corpusNCache.remove((spark.sparkContext.applicationId, dir))

  /** e23: distributed k-NN GRAPH construction via NN-descent (Dong,
    * Moses, Li — WWW 2011) — the missing graph-based ANN family next
    * to the {LSH, IVF} × {PQ, SQ8} compression matrix, and the
    * distributed precursor to HNSW-style serving: build the top-K
    * neighbor graph for EVERY vector by iterating "my neighbors'
    * neighbors are probably my neighbors".
    *
    *  - INIT: e05's LSH-bucket substrate (capped buckets, the
    *    hamming-≤2 multi-probe set shared with e02/e06, id-only
    *    candidate shuffle, vector join-back), top-K per node — a
    *    deterministic, already-better-than-random seed graph at
    *    hash-join cost.
    *  - ROUND (×2, unrolled — the e13/f04 declarative-loop precedent):
    *    adjacency B(v) = out-neighbors ∪ top-K reverse neighbors
    *    (the reverse cap bounds hub fan-in, NN-descent's sample
    *    discipline made deterministic), candidate edges = all ordered
    *    pairs (a, b) co-adjacent to some v — a keyed self-join on v,
    *    ≤ (2K)² pairs per node — union the current edges, re-score,
    *    keep top-K per node by (cosine desc, id).
    *
    * Scale shape: no stage is all-pairs — candidates/round ≤ 4K²·n
    * edges, shuffled as bare (node, nbr) id pairs; vectors join back
    * once per round for scoring; per-node top-K is a keyed window
    * (WindowGroupLimit), never a global sort; every round's graph is
    * materialized (≤ K·n rows) so lineage does not grow with the
    * iteration count. Convergence is graded in Round13Spec through
    * e10's recall harness: round-2 recall > round-0 recall against the
    * exact top-K panel, the monotone-improvement property NN-descent
    * exists for. (On THIS synthetic corpus recall plateaus ≈ 0.41 —
    * near-random 64-dim vectors have high intrinsic dimension, the
    * regime Dong et al. §5 document as NN-descent's hard case; the
    * spec pins the measured trajectory, not a fantasy 0.95.)
    */
  def e23KnnGraph(spark: SparkSession, dir: String): DataFrame =
    e23KnnGraphRounds(spark, dir, rounds = 2)

  /** [[e23KnnGraph]] with the descent depth exposed — rounds = 0 is
    * the bare LSH init; Round13Spec grades recall at 0 vs 2 to pin the
    * monotone-improvement property the iteration exists for.
    */
  def e23KnnGraphRounds(spark: SparkSession, dir: String, rounds: Int): DataFrame = {
    val (corpus, plan) = e23GraphPlan(spark, dir, rounds)
    // eager-release (e05 pattern): checkpoint the tiny graph, drop the
    // persisted corpus before returning
    val out = plan.cutLineage
    corpus.unpersist()
    out
  }

  /** The un-checkpointed e23 pipeline plus its persisted corpus —
    * split out so PlanSpec-style assertions can inspect the REAL
    * executed plan (localCheckpoint materializes eagerly and leaves
    * only a LogicalRDD behind). Budget (K, bucket cap) is elected
    * from the corpus size — [[graphKOf]]/[[maxBucketOf]].
    */
  private[graft] def e23GraphPlan(
      spark: SparkSession, dir: String, rounds: Int): (DataFrame, DataFrame) = {
    val n = corpusN(spark, dir)
    val corpus = emb(spark, dir).withColumn("bucket", bucketColOf(SigBits, Some(spark)))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK) // read per round: scoring join-backs
    (corpus, e23GraphPlanOn(spark, corpus, rounds, graphKOf(n), maxBucketOf(n)))
  }

  /** The e23 construction with the corpus pluggable — e23 feeds it the
    * full corpus, e27 the pre-delta BASE corpus (the nightly-artifact
    * replay). The caller owns persisting/unpersisting the corpus and
    * elects the budget (both from the FULL corpus count, so the two
    * builds and their oracles share one tier election).
    */
  private[graft] def e23GraphPlanOn(
      spark: SparkSession, corpus: DataFrame, rounds: Int): DataFrame =
    e23GraphPlanOn(spark, corpus, rounds, GraphK, MaxBucketE)

  private[graft] def e23GraphPlanOn(
      spark: SparkSession, corpus: DataFrame, rounds: Int,
      k: Int, cap: Int): DataFrame = {
    val nodeV = corpus.select(col("vec_id").as("node_id"), col("v").as("av"), col("nrm").as("an"))
    val nbrV = corpus.select(col("vec_id").as("neighbor_id"), col("v").as("bv"), col("nrm").as("bn"))
    def score(edges: DataFrame): DataFrame =
      edges.join(nodeV, Seq("node_id")).join(nbrV, Seq("neighbor_id"))
        .select(col("node_id"), col("neighbor_id"),
          (dotOf(spark, "av", "bv") / (col("an") * col("bn"))).as("cosine"))
    val wNode = Window.partitionBy("node_id").orderBy(col("cosine").desc, col("neighbor_id"))
    def topK(scored: DataFrame): DataFrame =
      scored.withColumn("rn", row_number().over(wNode))
        .where(col("rn") <= k).select("node_id", "neighbor_id", "cosine")

    // INIT — e05's candidate substrate at K = k
    val useful = corpus.groupBy("bucket").count()
      .where(col("count") <= cap).select("bucket")
    val in = corpus.join(useful, Seq("bucket"))
    val probes = in.select(col("vec_id").as("node_id"),
      explode(expr(probeExprOf(SigBits))).as("bucket"))
    val init = topK(score(probes
      .join(in.select(col("bucket"), col("vec_id").as("neighbor_id")), Seq("bucket"))
      .where(col("node_id") =!= col("neighbor_id"))
      .select("node_id", "neighbor_id")
      .distinct()))

    def round(g: DataFrame): DataFrame = {
      val fwd = g.select("node_id", "neighbor_id")
      val revcap = g.select(col("neighbor_id").as("node_id"),
          col("node_id").as("neighbor_id"), col("cosine"))
        .withColumn("rn", row_number().over(wNode))
        .where(col("rn") <= k).select("node_id", "neighbor_id")
      val b = fwd.unionByName(revcap).distinct()
      val pairs = b.as("x").join(b.as("y"),
          col("x.node_id") === col("y.node_id") &&
            col("x.neighbor_id") =!= col("y.neighbor_id"))
        .select(col("x.neighbor_id").as("node_id"), col("y.neighbor_id").as("neighbor_id"))
      topK(score(pairs.unionByName(fwd).distinct()))
    }

    // Per-round materialization (localCheckpoint, eager): each round's
    // graph is ≤ K·n tiny rows, but the DECLARATIVE lineage would
    // otherwise nest windows+joins+distincts per round and Catalyst
    // re-analyzes the whole stack at every depth — the standard
    // iterative-algorithm discipline (convergeForest does the same):
    // cut lineage at each iteration, keep the final round declarative
    // so its plan stays inspectable.
    // Lazy cuts (r14): plan truncation without a per-round blocking
    // job — every consumer materializes the final frame (eager cut or
    // parquet write) BEFORE unpersisting the corpus, so the deferred
    // rounds always compute while the corpus is still cached.
    val seed = if (rounds == 0) init else init.cutLineageLazy
    (1 to rounds).foldLeft(seed)((g, i) =>
        if (i == rounds) round(g) else round(g).cutLineageLazy)
      .withColumn("rnk", row_number().over(wNode).cast("long"))
  }

  /** e27's delta split: vec_id % DeltaMod == 0 is the newly-ingested
    * 5% (the e12 freshness convention), the rest the corpus the
    * nightly e23 build saw.
    */
  val DeltaMod = 20

  /** e27: DELTA MAINTENANCE of the k-NN graph — e12's freshness story
    * reaching the graph index (VERDICT r9 #6): newly-ingested vectors
    * merge into the nightly e23 artifact WITHOUT a full rebuild, via
    * the HNSW insertion discipline made set-at-a-time:
    *
    *  1. SEED — delta nodes LSH-probe the CURRENT corpus (hamming-≤2,
    *     capped buckets — e23's own init substrate) and take their
    *     top-K lists. Cost ∝ |delta| · probes.
    *  2. REVERSE ATTACH — every seed edge d→b nominates d for b's
    *     list (cosine is symmetric: scores are REUSED, not
    *     recomputed); only the ≤ K·|delta| AFFECTED base nodes
    *     re-rank (old K edges ∪ new nominees), every other base list
    *     is carried VERBATIM — the "touch only affected
    *     neighborhoods" property, provable from the provenance
    *     column.
    *  3. ONE bounded local NN-descent round for delta nodes only:
    *     candidates = 2-hop neighbors through the merged lists
    *     (≤ 2K·K per delta node), re-score, final top-K.
    *
    * Output: the FULL merged graph (node_id, neighbor_id, cosine,
    * rnk) + src provenance ('kept' | 'repaired' | 'delta'). Delta
    * nodes in over-cap buckets conservatively get no list (the
    * substrate's documented cap discipline — they enter at the next
    * full build).
    *
    * Scale shape: base build is the nightly artifact — persisted
    * build-once under its own (dir, data-version, tier) key like
    * [[knnGraphIndex]], so repeated merges pay ∝ delta, never the
    * build; every MERGE stage is
    * ∝ delta size (spec-pinned candidate counts), keyed joins and
    * per-node windows only, id-only shuffles with one vector
    * join-back per scoring pass. The bucket census is the one
    * corpus-∝ read; in production it is the maintained count-per-
    * bucket sidecar (w09's stats discipline), not a rescan.
    */
  def e27GraphDelta(spark: SparkSession, dir: String): DataFrame = {
    val wNode = Window.partitionBy("node_id").orderBy(col("cosine").desc, col("neighbor_id"))
    e27Merged(spark, dir)
      .withColumn("rnk", row_number().over(wNode).cast("long"))
  }

  /** The e27 merged graph (node_id, neighbor_id, cosine, src) without
    * the rank column — e27's output adds rnk; e28 serves beam walks
    * over it directly. Materialized (checkpointed) before return.
    */
  private[graft] def e27Merged(spark: SparkSession, dir: String): DataFrame = {
    // one tier election for the nightly replay AND the merge stages
    // (from the FULL corpus count — the number the oracle computes)
    val n = corpusN(spark, dir)
    val k = graphKOf(n)
    val cap = maxBucketOf(n)
    val full = emb(spark, dir).withColumn("bucket", bucketColOf(SigBits, Some(spark)))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val base = full.where(col("vec_id") % DeltaMod =!= 0)

    // the nightly artifact: e23's full 2-round build over the base
    // corpus, PERSISTED build-once behind its own (dir, data-version,
    // tier) key — the knnGraphIndex discipline (r13 VERDICT #2: the
    // inline replay made every e27 invocation re-pay the nightly
    // build, 47.8 s of the 54.5 s sf1 cost; in production the build
    // is a separate nightly job and the merge must cost ∝ delta).
    // Cosine is persisted with the edges because the repair stage
    // re-ranks affected lists against the delta nominations without
    // re-scoring the kept edges.
    val basePath = indexArtifactPath(spark, dir, s"graft_knn_graph_base_k${k}c$cap")
    buildOnce(spark, basePath) { p =>
      e23GraphPlanOn(spark, base, rounds = 2, k, cap)
        .select("node_id", "neighbor_id", "cosine")
        .write.mode("overwrite").parquet(p)
    }
    val baseGraph = spark.read
      .schema("node_id BIGINT, neighbor_id BIGINT, cosine DOUBLE")
      .parquet(basePath)

    val nodeV = full.select(col("vec_id").as("node_id"), col("v").as("av"), col("nrm").as("an"))
    val nbrV = full.select(col("vec_id").as("neighbor_id"), col("v").as("bv"), col("nrm").as("bn"))
    def score(edges: DataFrame): DataFrame =
      edges.join(nodeV, Seq("node_id")).join(nbrV, Seq("neighbor_id"))
        .select(col("node_id"), col("neighbor_id"),
          (dotOf(spark, "av", "bv") / (col("an") * col("bn"))).as("cosine"))
    val wNode = Window.partitionBy("node_id").orderBy(col("cosine").desc, col("neighbor_id"))
    def topK(scored: DataFrame): DataFrame =
      scored.withColumn("rn", row_number().over(wNode))
        .where(col("rn") <= k).select("node_id", "neighbor_id", "cosine")

    // 1. SEED against the current (base ∪ delta) capped buckets
    val useful = full.groupBy("bucket").count()
      .where(col("count") <= cap).select("bucket")
    val inn = full.join(useful, Seq("bucket"))
    val probesD = inn.where(col("vec_id") % DeltaMod === 0)
      .select(col("vec_id").as("node_id"), explode(expr(probeExprOf(SigBits))).as("bucket"))
    val seed = topK(score(probesD
        .join(inn.select(col("bucket"), col("vec_id").as("neighbor_id")), Seq("bucket"))
        .where(col("node_id") =!= col("neighbor_id"))
        .select("node_id", "neighbor_id").distinct()))
      .cutLineage

    // 2. REVERSE ATTACH — scores reused (cosine symmetric)
    val rev = seed.select(col("neighbor_id").as("node_id"),
      col("node_id").as("neighbor_id"), col("cosine"))
    val revBase = rev.where(col("node_id") % DeltaMod =!= 0)
    val affected = revBase.select("node_id").distinct()
    val repaired = topK(baseGraph.join(affected, Seq("node_id"))
      .unionByName(revBase))
    val kept = baseGraph.join(affected, Seq("node_id"), "left_anti")

    // 3. one bounded local round for the delta nodes: 2-hop through
    // the merged lists, re-score, final top-K
    val adjD = seed.select("node_id", "neighbor_id")
      .unionByName(rev.where(col("node_id") % DeltaMod === 0)
        .select("node_id", "neighbor_id"))
      .distinct()
    val mergedLists = kept.unionByName(repaired).select("node_id", "neighbor_id")
      .unionByName(seed.select("node_id", "neighbor_id"))
    val hop2 = adjD.as("x")
      .join(mergedLists.as("y"), col("x.neighbor_id") === col("y.node_id"))
      .select(col("x.node_id").as("node_id"), col("y.neighbor_id").as("neighbor_id"))
      .where(col("node_id") =!= col("neighbor_id"))
    val deltaLists = topK(score(hop2.unionByName(adjD).distinct()))

    val out = kept.withColumn("src", lit("kept"))
      .unionByName(repaired.withColumn("src", lit("repaired")))
      .unionByName(deltaLists.withColumn("src", lit("delta")))
      .cutLineage
    full.unpersist()
    out
  }

  /** e03: embedding near-duplicate pairs — corpus ∪ a deterministically
    * perturbed copy (id+100000), LSH-bucketed candidate join, cosine
    * threshold verify.
    *
    * Scale shape (the r1 version was an uncapped 256-bucket self-join —
    * O((N/256)²) per bucket, quadratic at 100 TB):
    *  - 16-bit signatures (65 536 buckets) keep buckets small;
    *  - census + `MaxBucketE` cap drops degenerate stop-buckets, so the
    *    within-bucket join is bounded at MaxBucketE² per bucket;
    *  - hamming-1 multi-probe (17 probes/vector, ids only — 16 bytes a
    *    row, never vectors) recovers pairs that straddle one sign flip,
    *    paying the recall cost on probe fan-out instead of bucket size;
    *  - candidate pairs are deduped as bare (vec_a, vec_b) ids; vectors
    *    are joined back only for surviving candidates, so no shuffle
    *    ever moves an embedding for a pair that gets dropped.
    */
  def e03EmbedDedup(spark: SparkSession, dir: String): DataFrame = {
    val base = emb(spark, dir)
    val perturbed = base
      .select((col("vec_id") + 100000L).as("vec_id"),
        expr("transform(v, x -> x * 1.0005d + 0.0001d)").as("v")) // corpus construction only — not a hot path
      .withColumn("nrm", sqrt(dotOf(spark, "v", "v")))
    val corpus = base.unionByName(perturbed)
      .withColumn("bucket", bucketColOf(DedupSigBits, Some(spark)))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK) // read 4×: census, probe side, join side, vector join-back
    val useful = corpus.groupBy("bucket").count()
      .where(col("count") <= MaxBucketE).select("bucket")
    val in = corpus.join(useful, Seq("bucket"))
    val probes = in.select(col("vec_id").as("vec_a"),
      explode(expr(
        s"array_union(array(bucket), transform(sequence(0, ${DedupSigBits - 1}), " +
          "j -> bucket ^ shiftleft(1L, j)))")).as("bucket"))
    val cand = probes
      .join(in.select(col("bucket"), col("vec_id").as("vec_b")), Seq("bucket"))
      .where(col("vec_a") < col("vec_b"))
      .select("vec_a", "vec_b")
      .distinct()
    // eager-release (s05 pattern): survivors are few; release the
    // persisted corpus before returning
    val out = cand
      .join(corpus.select(col("vec_id").as("vec_a"), col("v").as("va"), col("nrm").as("na")), Seq("vec_a"))
      .join(corpus.select(col("vec_id").as("vec_b"), col("v").as("vb"), col("nrm").as("nb")), Seq("vec_b"))
      .select(col("vec_a"), col("vec_b"),
        (dotOf(spark, "va", "vb") / (col("na") * col("nb"))).as("cosine"))
      .where(col("cosine") >= 0.995)
      .cutLineage
    corpus.unpersist()
    out
  }

  /** e09: metadata-filtered ANN — "nearest neighbors WHERE lang='en'",
    * the shape every production vector store serves (RAG over one
    * tenant, retrieval within a language/license slice). Semantics are
    * PRE-filter: the predicate cuts the corpus BEFORE candidate
    * generation, so top-k always comes from the filtered set —
    * post-filtering an unfiltered top-k collapses recall whenever the
    * predicate is selective (k results shrink to k·selectivity). The
    * metadata join (embeddings ↔ documents on id) happens on the
    * bucketed corpus rows BEFORE any query fan-out, so the filter is
    * paid once per corpus row, not once per (probe × row); the rest is
    * e02's multi-probe LSH verbatim — same buckets, same probes, same
    * ranking, so the oracle is e02's with one extra join.
    */
  def e09FilteredAnn(spark: SparkSession, dir: String): DataFrame = {
    val meta = Tables.documents(spark, dir)
      .where(col("lang") === "en")
      .select(col("doc_id").as("vec_id"))
    val e = emb(spark, dir).withColumn("bucket", bucketColOf(SigBits, Some(spark)))
    val filtered = e.join(meta, Seq("vec_id"))
    val q = e.where(col("vec_id") < 20)
      .select(col("vec_id").as("query_id"), col("v").as("qv"),
        col("nrm").as("qn"),
        explode(expr(probeExprOf(SigBits))).as("bucket"))
    val scored = filtered.join(broadcast(q), Seq("bucket"))
      .where(col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id").as("neighbor_id"),
        (dotOf(spark, "qv", "v") / (col("qn") * col("nrm"))).as("cosine"))
      .dropDuplicates("query_id", "neighbor_id")
    val w = Window.partitionBy("query_id").orderBy(col("cosine").desc, col("neighbor_id"))
    scored.withColumn("rn", row_number().over(w)).where(col("rn") <= 10)
      .select("query_id", "neighbor_id", "cosine")
  }

  /** e10: ANN recall evaluation — the monitoring primitive every
    * production vector-serving tier runs: ground truth is computed
    * brute-force for a SAMPLED query panel only (cost ∝ panel ×
    * corpus, one embarrassingly-parallel scan — never all-pairs), and
    * the index's answers are joined against it to report per-query
    * hit counts. At 10¹¹ vectors this is the nightly job that catches
    * recall drift after re-sharding, quantizer refits or corpus churn
    * — the panel stays fixed, so the number is comparable run over
    * run. Integer counts (n_exact, n_hit) rather than a float ratio
    * so the result hashes identically cross-engine; recall@10 is
    * n_hit/n_exact downstream. Reuses e01 (exact baseline) and e02
    * (the index under test) verbatim, so this evaluates exactly what
    * serves.
    */
  def e10AnnRecall(spark: SparkSession, dir: String): DataFrame = {
    val exact = e01KnnCosine(spark, dir).select("query_id", "neighbor_id")
    val approx = e02AnnLsh(spark, dir)
      .select(col("query_id"), col("neighbor_id"), lit(1).as("hit"))
    exact.join(approx, Seq("query_id", "neighbor_id"), "left")
      .groupBy("query_id")
      .agg(count(lit(1)).as("n_exact"), count(col("hit")).as("n_hit"))
  }

  /** Cosine threshold for a semantic duplicate: the perturbed twins in
    * the d30 corpus sit above 0.999 while unrelated pairs top out near
    * 0.51 — a wide margin on both sides, so the cut can never flip
    * cross-engine.
    */
  val SemThresh = 0.99

  /** d30: semantic deduplication (the SemDeDup recipe — Abbas et al.
    * 2023, arXiv:2303.09540): exact and lexical near-duplicates are
    * caught by d01/d06-d08; semantically identical re-encodings
    * (paraphrases, re-crawls through different boilerplate,
    * translations round-tripped) only show up in embedding space. The
    * published pipeline, Spark-first:
    *
    *   1. coarse-cluster every embedding with e04's deterministic
    *      quantizer ([[IvfK]] clusters; in production k scales ∝ N so
    *      cluster size — and with it the per-cluster pair count, the
    *      quadratic term — stays CONSTANT as the corpus grows; the
    *      `spark.graft.ivf.quantizer=kmeans` toggle trades the
    *      cross-engine-verifiable fit for a trained one, same as e04);
    *   2. score exact pairwise cosine WITHIN each cluster only and
    *      keep edges ≥ [[SemThresh]] — the cross-cluster pair space
    *      is never generated, which is the entire scale story;
    *   3. converge the edges to a star forest with the shared CC
    *      kernel ([[graft.dedup.Dedup.convergeForest]] — the same
    *      kernel d11/d23 run on text near-dup edges);
    *   4. census per semantic cluster: keep the minimum vec_id, drop
    *      the rest.
    *
    * The corpus is base ∪ two deterministic perturbed generations
    * (double-precision scale + shift — re-encoding stand-ins, the e03
    * device), so every base vector anchors a live 3-member semantic
    * cluster and the oracle verifies real positives, not an empty
    * result. `n_base` counts members from the original table per
    * cluster — in production the cross-generation containment signal.
    */
  def d30SemanticDedup(spark: SparkSession, dir: String): DataFrame = {
    val base = emb(spark, dir).select("vec_id", "v")
    val g1 = base.select((col("vec_id") + 100000L).as("vec_id"),
      expr("transform(v, x -> x * 1.0005d + 0.0001d)").as("v")) // corpus construction only — not a hot path
    val g2 = base.select((col("vec_id") + 200000L).as("vec_id"),
      expr("transform(v, x -> x * 0.9995d - 0.0001d)").as("v"))
    val corpus = base.unionByName(g1).unionByName(g2)
      .withColumn("nrm", sqrt(dotOf(spark, "v", "v")))
      .where(col("nrm") > 0.0)
    val centsDf = centroidsDf(spark, fitCentroids(corpus))
    // persisted because BOTH sides of the within-cluster pair join read
    // it; released eagerly once the forest is materialized (s05 pattern)
    val assigned = assignToNearest(spark, corpus, centsDf)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val a = assigned.select(col("centroid_id"), col("vec_id").as("vec_a"),
      col("v").as("va"), col("nrm").as("na"))
    val b = assigned.select(col("centroid_id"), col("vec_id").as("vec_b"),
      col("v").as("vb"), col("nrm").as("nb"))
    val edges = a.join(b, Seq("centroid_id"))
      .where(col("vec_a") < col("vec_b") &&
        dotOf(spark, "va", "vb") / (col("na") * col("nb")) >= SemThresh)
      .select(col("vec_a").as("u"), col("vec_b").as("v"))
    // convergeForest materializes its input eagerly, so the release
    // below never recomputes the pair join
    val forest = graft.dedup.Dedup.convergeForest(spark, edges, "d30")
    assigned.unpersist()
    val labels = forest.select(col("u").as("node"), col("v").as("cluster_id"))
      .union(forest.select(col("v").as("node"), col("v").as("cluster_id")))
      .distinct()
    labels.groupBy("cluster_id")
      .agg(count(lit(1)).as("n_members"),
        count(when(col("node") < 100000L, 1)).as("n_base"))
      .where(col("n_members") >= 2)
  }
}
