package graft.streaming

import java.nio.file.{Files, Paths}

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.functions._

import graft.{SparkSpec, Tables}

/** Streaming specs beyond the single-batch driver path: state must
  * carry correctly across micro-batches.
  */
class StreamsSpec extends SparkSpec {

  test("copy-mode staging stages real bytes and leaves s01 results unchanged") {
    def s01Rows() = Streams.s01StreamTumbling(spark, sfDir).collect()
      .map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2), r.getDouble(3)))
      .sortBy(t => (t._1.getTime, t._2)).toSeq
    val viaSymlink = s01Rows()
    spark.conf.set("spark.graft.stream.staging", "copy")
    try {
      val staged = Paths.get(Streams.stageStreamSource(spark, sfDir, "events.parquet"))
      val f = staged.resolve("events.parquet")
      // a real byte copy, not a symlink — what a cluster filesystem needs
      assert(Files.exists(f) && !Files.isSymbolicLink(f))
      assert(Files.size(f) == Files.size(Paths.get(sfDir, "events.parquet")))
      // the conf survives the operator's private stream session and the
      // copied source produces the identical result
      assert(s01Rows() == viaSymlink)
    } finally spark.conf.unset("spark.graft.stream.staging")
  }

  test("w06 file sink is exactly-once: a resumed run with no new data adds nothing") {
    def rollup() = Streams.w06SinkStreamed(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).sortBy(_._1).toSeq
    def dataFiles(out: String): Set[String] = {
      val root = Paths.get(out)
      val s = Files.walk(root)
      try s.iterator().asScala
        .filter(p => p.toString.endsWith(".parquet")).map(_.toString).toSet
      finally s.close()
    }
    val first = rollup()
    assert(first.nonEmpty)
    val out = Streams.sinkPaths(spark, sfDir)._1
    val committed = dataFiles(out)
    assert(committed.nonEmpty)
    // resume from the checkpoint: same rollup, not one new file
    assert(rollup() == first)
    assert(dataFiles(out) == committed)
    // and the landed row counts agree with s07's admitted counts
    val admitted = Streams.s07StreamQualityGate(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getLong(2))).filter(_._2 > 0).sortBy(_._1).toSeq
    assert(first.map(t => (t._1, t._2)) == admitted)
  }

  test("stream results are partition-count invariant (shufflePartitions knob)") {
    def rows() = Streams.s01StreamTumbling(spark, sfDir).collect()
      .map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2), r.getDouble(3)))
      .sortBy(t => (t._1.getTime, t._2)).toSeq
    val base = rows()
    spark.conf.set("spark.graft.stream.shufflePartitions", "3")
    try assert(rows() == base)
    finally spark.conf.unset("spark.graft.stream.shufflePartitions")
  }

  test("s02 session state carries across multiple micro-batches") {
    // Stage the events as TWO time-ordered files and force one file per
    // micro-batch: sessions spanning the split boundary exercise the
    // open-session state hand-off.
    val ev = Tables.events(spark, sfDir).select("user_id", "event_id", "ts")
    val median = ev.stat.approxQuantile("event_id", Array(0.5), 0.0).head.toLong
    val stage = "/tmp/graft_stream_twofiles"
    val d = Paths.get(stage)
    if (Files.exists(d)) {
      Files.walk(d).sorted(java.util.Comparator.reverseOrder())
        .forEach(p => Files.delete(p))
    }
    Files.createDirectories(d)
    // file source orders batches by modification time: write early half first
    ev.where(col("event_id") <= median).coalesce(1)
      .write.mode("overwrite").parquet(s"$stage/p1")
    Thread.sleep(1100) // distinct mtimes (file source timestamps are ms)
    ev.where(col("event_id") > median).coalesce(1)
      .write.mode("overwrite").parquet(s"$stage/p2")

    // event_id is assigned in ts order by the generator, so the split is
    // also a time split — verify that
    val maxTs1 = ev.where(col("event_id") <= median).agg(max("ts")).head().getTimestamp(0)
    val minTs2 = ev.where(col("event_id") > median).agg(min("ts")).head().getTimestamp(0)
    assert(!maxTs1.after(minTs2), "event_id split is not a time split")

    val schema = spark.read.parquet(s"$stage/p1").schema
    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1")
      .parquet(s"$stage/p*")
    val got = Streams.runSessionize(stream)
      .select("user_id", "session_id", "n_events").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sortBy(identity).toSeq

    val expected = graft.queries.Events.q17Sessionize(spark, sfDir)
      .select("user_id", "session_id", "n_events").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sortBy(identity).toSeq

    assert(got == expected, s"multi-batch sessions diverge: got ${got.size}, expected ${expected.size}")
  }
}
