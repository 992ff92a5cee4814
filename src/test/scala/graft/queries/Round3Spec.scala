package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Round-3 operators: salted skew join, correlated-subquery
  * decorrelation, chunk-level dedup, streaming session_window, and the
  * compaction sink.
  */
class Round3Spec extends SparkSpec {

  test("q27 salted join equals the plain (unsalted) join and stays a shuffle join") {
    import spark.implicits._
    val naive = Events.skewedFact(spark, sfDir)
      .join(Events.skewedDim(spark, sfDir), Seq("k"))
      .groupBy($"k_label")
      .agg(count(lit(1)).as("n_events"), sum($"value").as("sum_value"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
      .sortBy(_._1).toSeq
    val salted = Events.q27SaltedJoin(spark, sfDir)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
      .sortBy(_._1).toSeq
    assert(salted.nonEmpty)
    assert(salted.map(t => (t._1, t._2)) == naive.map(t => (t._1, t._2)))
    salted.zip(naive).foreach { case (s, n) =>
      assert(math.abs(s._3 - n._3) < 1e-6 * math.max(1.0, math.abs(n._3)))
    }
    // the demo must exercise the salted SHUFFLE path — a broadcast
    // would make the salt a no-op
    val plan = Events.q27SaltedJoin(spark, sfDir)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastHashJoin"), plan)
    assert(plan.contains("ShuffledHashJoin") || plan.contains("SortMergeJoin"), plan)
  }

  test("q28 correlated subquery decorrelates to agg+join and matches a window formulation") {
    import spark.implicits._
    // same multiply-through exact arithmetic as q28 itself (price*cnt >
    // sum over DECIMAL), expressed as windows instead of subqueries
    val byCust = Window.partitionBy($"o_custkey")
    val windowed = graft.Tables.orders(spark, sfDir)
      .withColumn("p_dec", $"o_totalprice".cast("decimal(18,2)"))
      .withColumn("cust_cnt", count(lit(1)).over(byCust))
      .withColumn("cust_sum", sum($"p_dec").over(byCust))
      .where($"p_dec" * $"cust_cnt" > $"cust_sum")
      .groupBy($"o_orderpriority")
      .agg(count(lit(1)).as("n_above_avg"))
      .collect().map(r => (r.getString(0), r.getLong(1))).sortBy(_._1).toSeq
    val decorrelated = Relational.q28CorrelatedSubquery(spark, sfDir)
      .select("o_orderpriority", "n_above_avg")
      .collect().map(r => (r.getString(0), r.getLong(1))).sortBy(_._1).toSeq
    assert(decorrelated.nonEmpty)
    assert(decorrelated == windowed)
    // decorrelation means NO per-row subquery remains in the plan
    val plan = Relational.q28CorrelatedSubquery(spark, sfDir)
      .queryExecution.executedPlan.toString
    assert(!plan.toLowerCase.contains("subquery"), plan)
  }

  test("d17 chunk dedup: every truncated twin shares its full chunks with the original") {
    import spark.implicits._
    val res = graft.text.Corpus.d17ChunkDedup(spark, sfDir)
    // twins (doc_id >= 1000000) of long docs share every full 50-token
    // chunk with their original, so any twin long enough to have >1
    // chunk must report dup chunks
    val twins = res.where($"doc_id" >= 1000000L && $"n_chunks" > lit(1))
    assert(twins.count() > 0)
    assert(twins.where($"n_dup_chunks" === 0L).count() == 0)
  }

  test("s06 streaming session_window equals batch q26") {
    val stream = graft.streaming.Streams.s06StreamSessionWindow(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getTimestamp(1).getTime, r.getLong(2)))
      .sortBy(identity).toSeq
    val batch = Events.q26SessionWindow(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getTimestamp(1).getTime, r.getLong(2)))
      .sortBy(identity).toSeq
    assert(stream.nonEmpty)
    assert(stream == batch)
  }

  test("w03 compaction: 64 small files in, 4 range-sorted files out") {
    def dataFiles(d: String): Seq[java.io.File] =
      new java.io.File(d).listFiles().toSeq
        .filter(f => f.getName.endsWith(".parquet") && !f.getName.startsWith("."))
    val small = graft.sources.Sinks.smallFilesDir(spark, sfDir)
    val out = graft.sources.Sinks.compactedDir(spark, sfDir)
    assert(dataFiles(small).size == 64)
    assert(dataFiles(out).size == 4)
    // range partitioning: per-file doc_id ranges must not overlap, so
    // point reads prune to one file via parquet min/max stats
    val ranges = dataFiles(out).map { f =>
      val df = spark.read.parquet(f.getAbsolutePath)
        .agg(min("doc_id"), max("doc_id")).head()
      (df.getLong(0), df.getLong(1))
    }.sortBy(_._1)
    ranges.sliding(2).foreach {
      case Seq((_, hi), (lo2, _)) => assert(hi < lo2, ranges.toString)
      case _ =>
    }
  }
}
