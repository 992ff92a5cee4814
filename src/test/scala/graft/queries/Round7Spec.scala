package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Round-7 operators: d26 line dedup, d27 domain caps, s17 streaming
  * line scrub.
  */
class Round7Spec extends SparkSpec {

  /** Driver-side brute-force replay of the whole d26 pipeline (corpus
    * twins, 8-token lines, ≥2-distinct-doc boilerplate, ordered
    * reassembly) over plain Scala collections.
    */
  private def bruteForceLineDedup(): Map[Long, (String, Long, Long)] = {
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val corpus = docs.flatMap { case (id, text) =>
      val toks = text.trim.split("\\s+")
      val self = Seq(id -> text)
      if (toks.length >= 12)
        self :+ ((id + 1000000L) -> toks.take(toks.length - 3).mkString(" "))
      else self
    }
    val lines = corpus.flatMap { case (id, text) =>
      text.trim.split("\\s+").grouped(8).zipWithIndex
        .map { case (g, i) => (id, i.toLong, g.mkString(" ")) }
    }
    val boiler = lines.groupBy(_._3)
      .filter { case (_, occ) => occ.map(_._1).distinct.length >= 2 }.keySet
    corpus.map { case (id, _) =>
      val ls = lines.filter(_._1 == id).sortBy(_._2)
      val kept = ls.filterNot(l => boiler(l._3))
      id -> (kept.map(_._3).mkString(" "), ls.length.toLong,
        (ls.length - kept.length).toLong)
    }.toMap
  }

  test("d26 equals the driver brute-force line-dedup walk, with real drops") {
    val got = graft.text.Corpus.d26LineDedup(spark, sfDir).collect()
      .map(r => r.getLong(0) -> ((r.getString(1), r.getLong(2), r.getLong(3)))).toMap
    val want = bruteForceLineDedup()
    assert(got == want)
    // real positives: the truncated twins guarantee shared lines, so
    // some docs must actually lose lines — and no doc may vanish
    assert(got.values.exists(_._3 > 0), "no boilerplate was dropped")
    assert(got.keySet == want.keySet)
  }

  test("d26's boilerplate dictionary joins broadcast (lines never build-side)") {
    val plan = graft.text.Corpus.d26LineDedup(spark, sfDir)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), plan.take(2000))
  }

  test("d27 two-phase salted cap equals the naive per-source window, at any salt") {
    def naive = {
      val docs = spark.read.parquet(s"$sfDir/documents.parquet")
        .select("doc_id", "source", "lang", "n_chars")
      docs.withColumn("rnk", row_number().over(
          Window.partitionBy("source").orderBy("doc_id")).cast("long"))
        .where(col("rnk") <= 15)
        .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2),
          r.getLong(3), r.getLong(4))).sortBy(_._1).toSeq
    }
    def capped = graft.text.Corpus.d27DomainCap(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2),
        r.getLong(3), r.getLong(4))).sortBy(_._1).toSeq
    val want = naive
    assert(want.nonEmpty)
    assert(capped == want) // default salt (8)
    spark.conf.set("spark.graft.domaincap.salt", "3")
    try assert(capped == want) // salt must not change results
    finally spark.conf.unset("spark.graft.domaincap.salt")
  }

  test("s17 streaming line scrub equals the d26 batch output") {
    val got = graft.streaming.Streams.s17StreamLineScrub(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
      .sortBy(_._1).toSeq
    val batch = graft.text.Corpus.d26LineDedup(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
      .sortBy(_._1).toSeq
    assert(got.nonEmpty && got == batch)
  }
}
