package graft.queries

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Production-shaped inputs the synthetic corpus never exercises:
  * null / empty / whitespace-only text, and two operators sharing one
  * session across different data dirs concurrently (the dir-keyed
  * view/table naming this exists to protect).
  */
class RobustnessSpec extends SparkSpec {

  /** documents table with a null-text row, an empty-text row, a
    * whitespace-only row and one normal row.
    */
  private lazy val nullDir: String = {
    val out = "/tmp/graft_null_docs_v2"
    val marker = new java.io.File(s"$out/_STAGED")
    if (!marker.exists()) {
      import spark.implicits._
      Seq(
        (1L, None: Option[String], "en", "src0", 0L),
        (2L, Some(""), "en", "src0", 0L),
        (3L, Some("   "), "en", "src1", 3L),
        (4L, Some("the quick brown fox jumps over the lazy dog"), "en", "src1", 44L),
        // multi-byte UTF-8: the hash kernels read bytes — must not
        // crash or disagree with themselves on non-ASCII text
        (5L, Some("víctor naïve café 中文 текст — déjà vu"), "und", "src2", 37L))
        .toDF("doc_id", "text", "lang", "source", "n_chars")
        .write.mode("overwrite").parquet(s"$out/documents.parquet")
      marker.createNewFile()
    }
    out
  }

  test("text/dedup operators tolerate null, empty and whitespace-only text") {
    val failures = Seq[(String, () => Array[org.apache.spark.sql.Row])](
      "d02" -> (() => graft.text.Text.d02TokenCount(spark, nullDir).collect()),
      "d03" -> (() => graft.text.Text.d03TextQuality(spark, nullDir).collect()),
      "d05" -> (() => graft.text.Text.d05Fingerprint(spark, nullDir).collect()),
      "d16" -> (() => graft.text.Corpus.d16PiiScrub(spark, nullDir).collect()),
      "d18" -> (() => graft.text.Corpus.d18CurationFunnel(spark, nullDir).collect()),
      "d01" -> (() => graft.dedup.Dedup.d01DedupExact(spark, nullDir).collect()),
      "m01" -> (() => graft.multimodal.Multimodal.m01Multimodal(spark, nullDir).collect()),
      "d21" -> (() => graft.text.Pack.d21PackShards(spark, nullDir).collect()),
      "d22" -> (() => graft.text.Text.d22CorpusProfile(spark, nullDir).collect()),
      "d24" -> (() => graft.text.Text.d24DocRarity(spark, nullDir).collect()),
      "d25" -> (() => graft.text.Corpus.d25CorpusDiff(spark, nullDir).collect())
    ).flatMap { case (name, run) =>
      try {
        val rows = run()
        // every doc must be represented or deliberately filtered —
        // never dropped by an exception mid-pipeline
        assert(rows.nonEmpty, s"$name returned nothing")
        None
      } catch {
        case e: org.scalatest.exceptions.TestFailedException => throw e
        case e: Throwable => Some(s"$name threw ${e.getClass.getSimpleName}: ${e.getMessage}")
      }
    }
    assert(failures.isEmpty, failures.mkString("\n"))
    // the normal row's token count must be unaffected by its neighbors
    // (the null-text row's counts are null — skip it)
    val d02 = graft.text.Text.d02TokenCount(spark, nullDir).collect()
      .filter(r => !r.isNullAt(1)).map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(d02(4L) == 9L, d02.toString)
    // d25: a null-text doc present in both snapshots must classify as
    // unchanged (null-safe digest), never as added
    val d25 = graft.text.Corpus.d25CorpusDiff(spark, nullDir).collect()
      .map(r => (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    // ids 1..5: none divisible by 7 or 11 -> old == new for every doc
    assert(d25.map(_._1).sum == 0L, s"added=${d25.map(_._1).sum}")
    assert(d25.map(_._4).sum == 5L, s"unchanged=${d25.map(_._4).sum}")
  }

  test("similarity operators tolerate zero (corrupt) embedding vectors") {
    // a zero vector has norm 0 — under ANSI mode its cosine division
    // would kill the whole job; the operators must drop it instead
    val out = "/tmp/graft_zero_vec"
    val marker = new java.io.File(s"$out/_STAGED")
    if (!marker.exists()) {
      import spark.implicits._
      val real = graft.Tables.embeddings(spark, sfDir).limit(40)
        .collect().map(r => (r.getLong(0), r.getSeq[Float](1)))
      (real :+ (999999L, Seq.fill(real.head._2.length)(0.0f))).toSeq
        .toDF("vec_id", "embedding")
        .write.mode("overwrite").parquet(s"$out/embeddings.parquet")
      marker.createNewFile()
    }
    for ((name, res) <- Seq(
        "e01" -> graft.sim.Sim.e01KnnCosine(spark, out),
        "e05" -> graft.sim.Sim.e05KnnJoin(spark, out))) {
      val rows = res.collect()
      assert(rows.nonEmpty, s"$name empty")
      assert(!rows.exists(r => r.getLong(0) == 999999L || r.getLong(1) == 999999L),
        s"$name emitted the zero vector")
      assert(rows.forall(r => !r.isNullAt(2)), s"$name emitted a null cosine")
    }
  }

  test("one session runs the same dir-keyed operators over two dirs concurrently") {
    import scala.concurrent.{Await, Future}
    import scala.concurrent.duration._
    import scala.concurrent.ExecutionContext.Implicits.global
    val dirs = Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01")
    // q28 registers a temp view keyed by dir (its per-priority counts
    // DIFFER across dirs — 1.5k vs 15k orders — so a view collision
    // would surface as a wrong result); w02 a metastore table keyed by
    // (dir, appId). Concurrent runs over DIFFERENT dirs on ONE session
    // must not clobber each other.
    val expectedQ28 = dirs.map(d =>
      Relational.q28CorrelatedSubquery(spark, d).collect()
        .map(r => (r.getString(0), r.getLong(1))).sortBy(_._1).toSeq)
    assert(expectedQ28(0) != expectedQ28(1)) // distinguishable: a swap would be caught
    val expectedW02 = dirs.map(d =>
      graft.sources.Sinks.w02SinkBucketed(spark, d).collect()
        .map(r => (r.getString(0), r.getLong(1))).sortBy(_._1).toSeq)
    val fut = Future.sequence(dirs.map(d => Future {
      (Relational.q28CorrelatedSubquery(spark, d).collect()
        .map(r => (r.getString(0), r.getLong(1))).sortBy(_._1).toSeq,
        graft.sources.Sinks.w02SinkBucketed(spark, d).collect()
          .map(r => (r.getString(0), r.getLong(1))).sortBy(_._1).toSeq)
    }))
    val results = Await.result(fut, 5.minutes)
    results.zip(expectedQ28.zip(expectedW02)).foreach { case ((q28, w02), (eq, ew)) =>
      assert(q28 == eq)
      assert(w02 == ew)
    }
  }
}
