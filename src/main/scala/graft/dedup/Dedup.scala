package graft.dedup

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.text.Text

/** Deduplication operators (SURVEY.md §2c): exact, MinHash+LSH, SimHash,
  * and n-gram-Jaccard verification.
  *
  * Scale design (100 TB):
  *  - exact dedup is a single hash-groupBy on a 128-bit digest (never on
  *    raw text) — map-side partial aggregation, one shuffle of digests;
  *  - MinHash/SimHash signatures are computed in one codegen'd projection
  *    (no UDFs, no explode of shingles);
  *  - candidate pairs come from bucket joins on (band, band-signature)
  *    keys, with a bucket-size cap (`MaxBucket`) so a degenerate bucket
  *    (boilerplate text at web scale) cannot blow up the self-join —
  *    the standard "stop bucket" guard;
  *  - only candidates ever pay the exact-verification cost.
  */
object Dedup {

  val NumHashes = 64
  val Bands = 16
  val RowsPerBand = 4

  /** Buckets larger than this are dropped from candidate generation:
    * they are boilerplate-heavy and would make the within-bucket join
    * quadratic. At 100 TB this cap is what keeps LSH near-linear.
    */
  val MaxBucket = 64

  /** d01: exact dedup — group by content digest, keep the smallest id.
    * Digest, not raw text, is the shuffle key: 16 bytes/row regardless
    * of document size.
    */
  def d01DedupExact(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .groupBy(md5(col("text")).as("h"))
      .agg(min("doc_id").as("keep_id"), count(lit(1)).as("n_copies"))

  /** Deterministic near-duplicate corpus: the documents plus a copy of
    * each long-enough document with its last 3 tokens dropped
    * (offset ids). Gives the near-dup operators real positives to find
    * while staying a pure function of the driver-provided testdata.
    */
  def nearDupCorpus(docs: DataFrame): DataFrame = {
    val toks = Text.wsTokens(col("text"))
    val trunc = docs
      .where(size(toks) >= 12)
      .withColumn("text", concat_ws(" ", slice(toks, lit(1), size(toks) - 3)))
      .withColumn("doc_id", col("doc_id") + lit(1000000L))
    docs.unionByName(trunc)
  }

  /** (doc_id, toks, shingles): distinct word 3-gram shingles. */
  def shingled(docs: DataFrame): DataFrame =
    docs
      .select(col("doc_id"), Text.wsTokens(lower(col("text"))).as("toks"))
      .where(size(col("toks")) >= 3)
      .withColumn("shingles", expr(
        "array_distinct(transform(sequence(0, size(toks)-3), " +
          "i -> concat(toks[i], ' ', toks[i+1], ' ', toks[i+2])))"))

  /** MinHash signature: NumHashes seeded xxhash64 minima over shingles.
    * One projection, fully codegen'd.
    */
  def withSignature(sh: DataFrame): DataFrame =
    sh.withColumn("sig", expr(
      s"transform(sequence(0, ${NumHashes - 1}), " +
        "s -> array_min(transform(shingles, sh -> xxhash64(s, sh))))"))

  /** LSH banding: one row per (doc, band) with the band's signature hash. */
  private def banded(sigs: DataFrame): DataFrame =
    sigs.select(col("doc_id"), col("sig"),
      explode(expr(
        s"transform(sequence(0, ${Bands - 1}), b -> " +
          s"struct(b AS band_id, xxhash64(slice(sig, b*$RowsPerBand + 1, $RowsPerBand)) AS band_sig))")).as("b"))
      .select(col("doc_id"), col("sig"), col("b.band_id"), col("b.band_sig"))

  /** Candidate pairs from LSH buckets (doc_a < doc_b, deduped across
    * bands), with both signatures attached. Bucket-size cap applied.
    */
  def lshCandidates(docs: DataFrame): DataFrame = {
    val bd = banded(withSignature(shingled(docs)))
    val useful = bd.groupBy("band_id", "band_sig").count()
      .where(col("count").between(2, MaxBucket))
      .select("band_id", "band_sig")
    val in = bd.join(useful, Seq("band_id", "band_sig"))
    val a = in.select(col("band_id"), col("band_sig"),
      col("doc_id").as("doc_a"), col("sig").as("sig_a"))
    val b = in.select(col("band_id"), col("band_sig"),
      col("doc_id").as("doc_b"), col("sig").as("sig_b"))
    a.join(b, Seq("band_id", "band_sig"))
      .where(col("doc_a") < col("doc_b"))
      .select("doc_a", "doc_b", "sig_a", "sig_b")
      .distinct()
  }

  /** d06: MinHash+LSH near-dup pairs with the signature-agreement
    * Jaccard estimate.
    */
  def d06MinHashLsh(spark: SparkSession, dir: String): DataFrame = {
    val corpus = nearDupCorpus(Tables.documents(spark, dir))
    lshCandidates(corpus)
      .withColumn("est_jaccard",
        expr(s"size(filter(zip_with(sig_a, sig_b, (x, y) -> x = y), v -> v)) / cast($NumHashes as double)"))
      .where(col("est_jaccard") >= 0.5)
      .select("doc_a", "doc_b", "est_jaccard")
  }

  /** 64-bit SimHash over whitespace tokens: per-bit ±1 vote sums packed
    * into one long. Codegen'd fold — no UDF, no explode.
    */
  def simhash(toksCol: String): Column = {
    val bitVotes =
      s"""aggregate($toksCol, transform(sequence(0, 63), b -> 0L),
         |  (acc, t) -> zip_with(acc,
         |     transform(sequence(0, 63), b -> if(((xxhash64(t) >> b) & 1) = 1, 1L, -1L)),
         |     (x, y) -> x + y))""".stripMargin
    expr(
      s"""aggregate(zip_with($bitVotes, sequence(0, 63),
         |  (c, b) -> if(c > 0, shiftleft(1L, b), 0L)), 0L, (a, x) -> a | x)""".stripMargin)
  }

  /** d07: SimHash near-dup — bucket by 16-bit chunks (any pair within
    * hamming distance 4 shares at least one identical chunk of the 4),
    * verify with bit_count(xor).
    */
  def d07SimHash(spark: SparkSession, dir: String): DataFrame = {
    val corpus = nearDupCorpus(Tables.documents(spark, dir))
    val sh = corpus
      .select(col("doc_id"), Text.wsTokens(lower(col("text"))).as("toks"))
      .where(size(col("toks")) >= 1)
      .withColumn("simhash", simhash("toks"))
      .select(col("doc_id"), col("simhash"),
        explode(expr("transform(sequence(0, 3), c -> " +
          "struct(c AS chunk_id, shiftright(simhash, c*16) & 65535 AS chunk_val))")).as("c"))
      .select(col("doc_id"), col("simhash"), col("c.chunk_id"), col("c.chunk_val"))
    val useful = sh.groupBy("chunk_id", "chunk_val").count()
      .where(col("count").between(2, MaxBucket)).select("chunk_id", "chunk_val")
    val in = sh.join(useful, Seq("chunk_id", "chunk_val"))
    val a = in.select(col("chunk_id"), col("chunk_val"),
      col("doc_id").as("doc_a"), col("simhash").as("sim_a"))
    val b = in.select(col("chunk_id"), col("chunk_val"),
      col("doc_id").as("doc_b"), col("simhash").as("sim_b"))
    a.join(b, Seq("chunk_id", "chunk_val"))
      .where(col("doc_a") < col("doc_b"))
      .select(col("doc_a"), col("doc_b"),
        expr("bit_count(sim_a ^ sim_b)").as("hamming"))
      .distinct()
      .where(col("hamming") <= 6)
  }

  /** d08: exact n-gram Jaccard verification of the LSH candidates —
    * only candidate pairs (not the cross product) pay the set-intersect
    * cost.
    */
  def d08NgramJaccard(spark: SparkSession, dir: String): DataFrame = {
    val corpus = nearDupCorpus(Tables.documents(spark, dir))
    val sh = shingled(corpus).select(col("doc_id"), col("shingles"))
    lshCandidates(corpus).select("doc_a", "doc_b")
      .join(sh.select(col("doc_id").as("doc_a"), col("shingles").as("sh_a")), Seq("doc_a"))
      .join(sh.select(col("doc_id").as("doc_b"), col("shingles").as("sh_b")), Seq("doc_b"))
      .select(col("doc_a"), col("doc_b"),
        (size(array_intersect(col("sh_a"), col("sh_b"))).cast("double") /
          size(array_union(col("sh_a"), col("sh_b"))).cast("double")).as("jaccard"))
      .where(col("jaccard") >= 0.6)
  }
}
