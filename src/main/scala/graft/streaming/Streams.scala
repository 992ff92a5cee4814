package graft.streaming

import java.util.concurrent.atomic.AtomicInteger

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode, Trigger}

/** Structured Streaming operators over the `events` table (SURVEY.md §2c).
  *
  * Locally these run the file source to completion with
  * `Trigger.AvailableNow` into a memory sink so the result is a
  * deterministic DataFrame the driver can oracle-check; on a cluster the
  * same plans run unbounded (swap source/sink, keep the transforms).
  * The testdata is a single parquet file → exactly one micro-batch, so
  * update-mode emissions are exact.
  */
object Streams {

  private val nameCounter = new AtomicInteger(0)

  /** Stream a single-file parquet table: the file stream source
    * requires a directory, but the testdata ships bare files — stage a
    * directory of symlinks (idempotent, /tmp).
    */
  private def fileStream(spark: SparkSession, dir: String, fileName: String): DataFrame = {
    val src = java.nio.file.Paths.get(dir, fileName).toAbsolutePath
    val stageDir = java.nio.file.Paths.get(
      "/tmp", s"graft_stream_src_${Integer.toHexString(src.toString.hashCode)}")
    java.nio.file.Files.createDirectories(stageDir)
    val link = stageDir.resolve(fileName)
    if (!java.nio.file.Files.exists(link)) java.nio.file.Files.createSymbolicLink(link, src)
    val schema = spark.read.parquet(src.toString).schema
    spark.readStream.schema(schema).parquet(stageDir.toString)
  }

  /** Raw events as a stream: TIMESTAMP(NANOS) parquet must be read with
    * nanosAsLong (same gotcha as the batch path in [[graft.Tables]]),
    * then converted to a µs timestamp (generator emits whole µs).
    */
  private def eventsStream(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    fileStream(spark, dir, "events.parquet")
      .withColumn("ts", expr("timestamp_micros(ts div 1000)"))
  }

  /** Stateful operators allocate one state store per shuffle partition,
    * and the micro-batch pays per-store setup/commit/maintenance every
    * trigger — with 32 partitions that fixed cost dominates small
    * batches. Streaming state is keyed, so results are partition-count
    * invariant: plan the stream narrow (8) and restore the session conf
    * after start. On a real cluster size this to the state volume, not
    * to the CPU count.
    */
  private val StreamShufflePartitions = "8"

  private def runToCompletion(out: DataFrame, mode: OutputMode): (SparkSession, String) = {
    val spark = out.sparkSession
    val name = s"graft_stream_${nameCounter.incrementAndGet()}"
    val prev = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", StreamShufflePartitions)
    try {
      val q = out.writeStream.format("memory").queryName(name)
        .outputMode(mode).trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
    } finally spark.conf.set("spark.sql.shuffle.partitions", prev)
    (spark, name)
  }

  /** s01: tumbling 1-hour window aggregation with a watermark — the
    * canonical streaming groupBy. Watermark bounds state at scale;
    * complete output mode makes the local memory-sink result total, so
    * it matches the batch `date_trunc('hour')` oracle exactly.
    */
  def s01StreamTumbling(spark: SparkSession, dir: String): DataFrame = {
    val agg = eventsStream(spark, dir)
      .withWatermark("ts", "2 hours")
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n_events"), sum("value").as("sum_value"))
      .select(col("window.start").as("bucket"), col("event_type"),
        col("n_events"), col("sum_value"))
    val (s, name) = runToCompletion(agg, OutputMode.Complete())
    s.table(name)
  }

  /** s03: streaming exact dedup — the stream unioned with itself (every
    * event arrives twice) is deduplicated on event_id with watermarked
    * state, then aggregated. The final counts must equal the batch
    * aggregation of the original (un-duplicated) events — the oracle.
    * At scale the watermark bounds dedup state to the lateness horizon.
    */
  def s03StreamDedup(spark: SparkSession, dir: String): DataFrame = {
    val s = eventsStream(spark, dir)
    val deduped = s.union(eventsStream(spark, dir))
      .withWatermark("ts", "2 hours")
      .dropDuplicates("event_id")
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_events"))
    val (sess, name) = runToCompletion(deduped, OutputMode.Complete())
    sess.table(name)
  }

  /** s04: stream-stream interval join — each error event joined to the
    * same user's click events in the preceding 5 minutes. Watermarks on
    * both sides + the time-range predicate bound the join state (the
    * canonical Structured Streaming two-stream pattern). The joined
    * pairs land append-mode in the memory sink; the per-user rollup on
    * the sink table is batch, so the streaming query stays a single
    * stateful operator. Oracle: the identical batch interval join.
    */
  def s04StreamJoin(spark: SparkSession, dir: String): DataFrame = {
    val clicks = eventsStream(spark, dir)
      .where(col("event_type") === "click")
      .select(col("user_id").as("c_user"), col("event_id").as("click_id"),
        col("ts").as("c_ts"))
      .withWatermark("c_ts", "1 hour")
    val errors = eventsStream(spark, dir)
      .where(col("event_type") === "error")
      .select(col("user_id").as("e_user"), col("event_id").as("error_id"),
        col("ts").as("e_ts"))
      .withWatermark("e_ts", "1 hour")
    val joined = errors.join(clicks,
      col("e_user") === col("c_user") &&
        col("c_ts") >= col("e_ts") - expr("INTERVAL 5 MINUTES") &&
        col("c_ts") < col("e_ts"))
      .select(col("e_user").as("user_id"), col("error_id"), col("click_id"))
    val (sess, name) = runToCompletion(joined, OutputMode.Append())
    sess.table(name)
      .groupBy("user_id")
      .agg(count(lit(1)).as("n_pairs"), countDistinct(col("error_id")).as("n_errors"))
  }

  // public: encoder-generated code must be able to reach these
  case class BandDoc(doc_id: Long, sig: Array[Long], band_id: Int, band_sig: Long)
  case class BucketState(docIds: Array[Long], sigs: Array[Array[Long]], overflowed: Boolean)
  case class PairOut(doc_a: Long, doc_b: Long, est_jaccard: Double)

  /** s05: STREAMING near-duplicate detection — online MinHash LSH at
    * ingestion time. The signature/band projection is the exact batch
    * pipeline (Dedup.withSignature / bandRows — stateless, codegen'd);
    * the stateful half keys by (band_id, band_sig) bucket and keeps the
    * docs seen in that bucket as state, emitting candidate pairs the
    * moment a new document collides with a stored one.
    *
    * State is bounded by the same `MaxBucket` stop-bucket cap as batch:
    * a bucket that overflows is poisoned (emits nothing, stores only a
    * flag), so boilerplate floods cannot grow state or output — the cap
    * IS the watermark here, since near-dup buckets have no event time.
    * The per-group iterator is drained without materializing past the
    * cap, so memory per bucket is MaxBucket × signature, always.
    *
    * On the single AvailableNow batch the emitted pair set equals the
    * batch census exactly, so the oracle is d06's; under continuous
    * ingestion the cap applies at arrival order — the only semantic a
    * streaming dedup can offer.
    */
  def s05StreamNearDup(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    import graft.dedup.Dedup
    val corpus = Dedup.nearDupCorpus(fileStream(spark, dir, "documents.parquet"))
    val sigs = Dedup.withSignature(Dedup.shingled(corpus)).select("doc_id", "sig")
    val bands = Dedup.bandRows(sigs, "sig").as[BandDoc]

    def estJaccard(a: Array[Long], b: Array[Long]): Double = {
      var eq = 0; var i = 0
      while (i < a.length) { if (a(i) == b(i)) eq += 1; i += 1 }
      eq / 64.0
    }

    val pairs = bands
      .groupByKey(r => (r.band_id, r.band_sig))
      .flatMapGroupsWithState[BucketState, PairOut](
        OutputMode.Update(), GroupStateTimeout.NoTimeout()) {
        case (_, it, state: GroupState[BucketState]) =>
          var st = state.getOption.getOrElse(BucketState(Array.empty, Array.empty, overflowed = false))
          // collect at most cap+1 rows; never materialize a flood
          val buf = scala.collection.mutable.ArrayBuffer.empty[BandDoc]
          var over = st.overflowed
          while (it.hasNext) {
            val r = it.next()
            if (!over) {
              buf += r
              if (st.docIds.length + buf.length > Dedup.MaxBucket) over = true
            }
          }
          if (over) {
            state.update(BucketState(Array.empty, Array.empty, overflowed = true))
            Iterator.empty
          } else {
            val out = scala.collection.mutable.ArrayBuffer.empty[PairOut]
            var i = 0
            while (i < buf.length) {
              val d = buf(i)
              var j = 0
              while (j < st.docIds.length) {
                out += PairOut(math.min(st.docIds(j), d.doc_id),
                  math.max(st.docIds(j), d.doc_id), estJaccard(st.sigs(j), d.sig))
                j += 1
              }
              j = 0
              while (j < i) {
                out += PairOut(math.min(buf(j).doc_id, d.doc_id),
                  math.max(buf(j).doc_id, d.doc_id), estJaccard(buf(j).sig, d.sig))
                j += 1
              }
              i += 1
            }
            state.update(BucketState(st.docIds ++ buf.map(_.doc_id),
              st.sigs ++ buf.map(_.sig), overflowed = false))
            out.iterator
          }
      }
    val (sess, name) = runToCompletion(pairs.toDF(), OutputMode.Update())
    sess.table(name)
      .dropDuplicates("doc_a", "doc_b")
      .where(col("est_jaccard") >= 0.5)
  }

  case class Ev(user_id: Long, event_id: Long, tsUs: Long)
  case class SessionState(sessions: Long, startUs: Long, endUs: Long, n: Long)
  case class SessionOut(user_id: Long, session_id: Long, n_events: Long,
      start_us: Long, end_us: Long)

  /** s02: per-user sessionization with `flatMapGroupsWithState` — gap
    * > 30 min closes a session. State carries the open session across
    * micro-batches; every batch emits the sessions it completed plus the
    * currently-open one (update mode), so after the final batch the sink
    * holds exactly the gap-sessionization of the whole stream — the same
    * result as the batch lag+cumsum query (q17), which is the oracle.
    */
  def s02StreamStateful(spark: SparkSession, dir: String): DataFrame =
    runSessionize(eventsStream(spark, dir))

  /** Wire a (streaming) events frame through the stateful sessionizer,
    * run to completion, and collapse re-emitted open sessions to their
    * final state. Exposed so specs can drive it with a multi-file /
    * multi-batch source.
    */
  private[graft] def runSessionize(eventsDf: DataFrame): DataFrame = {
    val spark = eventsDf.sparkSession
    import spark.implicits._
    val gapUs = 30L * 60 * 1000 * 1000

    val events = eventsDf
      .select(col("user_id"), col("event_id"),
        expr("unix_micros(ts)").as("tsUs")).as[Ev]

    val sessions = events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[SessionState, SessionOut](
        OutputMode.Update(), GroupStateTimeout.NoTimeout()) {
        case (uid, it, state: GroupState[SessionState]) =>
          val evs = it.toArray.sortBy(e => (e.tsUs, e.event_id))
          var st = state.getOption.getOrElse(SessionState(0L, Long.MinValue, Long.MinValue, 0L))
          val out = scala.collection.mutable.ArrayBuffer.empty[SessionOut]
          def emit(s: SessionState): SessionOut =
            SessionOut(uid, s.sessions, s.n, s.startUs, s.endUs)
          for (e <- evs) {
            if (st.n == 0L) {
              st = SessionState(st.sessions + 1, e.tsUs, e.tsUs, 1L)
            } else if (e.tsUs - st.endUs > gapUs) {
              out += emit(st) // close previous session
              st = SessionState(st.sessions + 1, e.tsUs, e.tsUs, 1L)
            } else {
              st = st.copy(endUs = e.tsUs, n = st.n + 1)
            }
          }
          if (st.n > 0) out += emit(st) // open session: re-emitted (updated) next batch
          state.update(st)
          out.iterator
      }
    val (s, name) = runToCompletion(sessions.toDF(), OutputMode.Update())
    s.table(name)
      .groupBy("user_id", "session_id") // collapse re-emissions of open sessions across batches: keep final
      .agg(max("n_events").as("n_events"), min("start_us").as("start_us"),
        max("end_us").as("end_us"))
      .select(col("user_id"), col("session_id"), col("n_events"),
        expr("timestamp_micros(start_us)").as("session_start"),
        expr("timestamp_micros(end_us)").as("session_end"))
  }
}
