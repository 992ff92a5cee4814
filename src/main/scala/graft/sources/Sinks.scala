package graft.sources

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Writer-side operators (SURVEY.md §2c additions, round 2): the
  * layout-authoring half of a pipeline. Each operator WRITES a real
  * layout, reads it back, and returns a round-trip summary the DuckDB
  * oracle checks against the source table — so the oracle pins
  * write→read integrity, not just the final aggregation.
  */
object Sinks {

  private def hex(s: String): String = Integer.toHexString(s.hashCode)

  private[graft] def bucketedTableName(appId: String, dir: String): String =
    s"graft_docs_bucketed_${hex(dir)}_${hex(appId)}"

  private[graft] def bucketedStagePath(appId: String, dir: String): String =
    s"/tmp/graft_sink_bucket_${hex(dir)}_${hex(appId)}"

  /** Every sink stages under (data dir, application id): the dir hash
    * stops one session racing itself across dirs, the appId stops two
    * concurrent sessions over the SAME dir overwriting each other's
    * files mid-read (mergeSchema reads of w07's generations are the
    * sharpest case).
    */
  private[graft] def stage(spark: SparkSession, dir: String, name: String): String =
    s"/tmp/graft_sink_${name}_${hex(dir)}_${hex(spark.sparkContext.applicationId)}"

  /** w01: partitioned parquet sink — documents written partitioned by
    * language (the standard corpus layout: per-language directories,
    * partition pruning for free on read), read back, rolled up. At
    * 100 TB this is exactly how a corpus lands: one directory per
    * partition value, scans of one language never touch the rest.
    */
  def w01SinkPartitioned(spark: SparkSession, dir: String): DataFrame = {
    val out = stage(spark, dir, "part")
    val docs = Tables.documents(spark, dir)
    docs.write.mode("overwrite").partitionBy("lang").parquet(out)
    // explicit schema: a partitionBy write of ZERO rows creates no
    // files, and a schema-less read of that layout throws instead of
    // returning the empty frame an empty ingest day should produce
    spark.read.schema(docs.schema).parquet(out)
      .groupBy("lang")
      .agg(count(lit(1)).as("n_docs"), sum("n_chars").as("sum_chars"))
  }

  /** Read-back frame for the partition-pruning plan pin: a single-
    * language scan of the w01 layout must show partition filters, not
    * a full-table read.
    */
  def w01ReadOneLang(spark: SparkSession, dir: String): DataFrame = {
    val out = stage(spark, dir, "part")
    spark.read.schema(Tables.documents(spark, dir).schema).parquet(out)
      .where(col("lang") === "en")
  }

  /** w02: bucketed table sink — documents written bucketed+sorted by
    * doc_id, then self-joined on the bucket key. Bucketing is the
    * co-located-join primitive: both sides hash-land in the same
    * bucket files, so the join plans with NO shuffle exchange (pinned
    * in PlanSpec) — at 100 TB this is the difference between a join
    * that moves nothing and one that moves both tables. The `merge`
    * hint forces the sort-merge path so the pin is about bucketing,
    * not broadcast luck.
    */
  def w02SinkBucketed(spark: SparkSession, dir: String): DataFrame = {
    val t = bucketedTable(spark, dir)
    t.as("a").hint("merge")
      .join(t.as("b").hint("merge"), Seq("doc_id"))
      .groupBy(col("a.lang").as("lang"))
      .agg(count(lit(1)).as("n_docs"))
  }

  /** w03: small-file compaction — the table is first written as 64
    * shards (simulating the small-files problem a streaming ingest
    * leaves behind), then compacted: range-repartitioned on doc_id to
    * the target file count and sorted within files, so each output
    * file covers a tight doc_id range and parquet min/max stats prune
    * point/range reads. At 100 TB this is the nightly compaction job
    * verbatim — target file count would derive from bytes, not a
    * constant. The returned rollup pins round-trip integrity (the
    * oracle checks it against the source table); the file-count and
    * ordering claims are pinned by spec.
    */
  def w03SinkCompacted(spark: SparkSession, dir: String): DataFrame = {
    spark.read.parquet(compactedDir(spark, dir))
      .groupBy("source")
      .agg(count(lit(1)).as("n_docs"), sum("n_chars").as("sum_chars"),
        min("doc_id").as("min_id"), max("doc_id").as("max_id"))
  }

  private[graft] def smallFilesDir(spark: SparkSession, dir: String): String = {
    val small = stage(spark, dir, "small")
    Tables.documents(spark, dir).repartition(64)
      .write.mode("overwrite").parquet(small)
    small
  }

  private[graft] def compactedDir(spark: SparkSession, dir: String): String = {
    val out = stage(spark, dir, "compact")
    spark.read.parquet(smallFilesDir(spark, dir))
      .repartitionByRange(4, col("doc_id"))
      .sortWithinPartitions("doc_id")
      .write.mode("overwrite").parquet(out)
    out
  }

  /** w04: text source formats — the same documents round-tripped
    * through line-delimited JSON, then headered CSV, then ORC (the
    * other columnar format Spark ships), each read back with an
    * explicit schema (schema inference is a full extra pass at
    * scale — never rely on it in a pipeline). The rollup includes
    * `sum(length(text))` and a distinct-text count so quoting/escaping
    * damage in any format would show up as a mismatch against the
    * parquet-sourced oracle.
    */
  def w04SourceFormats(spark: SparkSession, dir: String): DataFrame = {
    val jsonDir = stage(spark, dir, "json")
    val csvDir = stage(spark, dir, "csv")
    val orcDir = stage(spark, dir, "orc")
    val docs = Tables.documents(spark, dir)
    docs.write.mode("overwrite").json(jsonDir)
    val fromJson = spark.read.schema(docs.schema).json(jsonDir)
    // quote-escape by doubling ("" inside a quoted field) and read with
    // multiLine so text containing quotes or embedded newlines survives
    // the round-trip — without these the defaults silently misparse any
    // document whose text contains a newline
    fromJson.write.mode("overwrite")
      .option("header", "true").option("escape", "\"")
      .csv(csvDir)
    val fromCsv = spark.read.schema(docs.schema)
      .option("header", "true").option("escape", "\"")
      .option("multiLine", "true")
      .csv(csvDir)
    fromCsv.write.mode("overwrite").orc(orcDir)
    spark.read.schema(docs.schema).orc(orcDir)
      .groupBy("lang")
      .agg(count(lit(1)).as("n_docs"), sum("n_chars").as("sum_chars"),
        sum(length(col("text"))).as("sum_text_len"),
        countDistinct(col("text")).as("n_distinct_texts"))
  }

  /** w07: schema evolution across file generations — the lakehouse
    * reality that old files never get rewritten: generation 1 landed
    * with a narrow schema (doc_id, lang, text), generation 2 added
    * columns (source, n_chars). A `mergeSchema` read unions the
    * generations — absent columns surface as nulls — and the rollup
    * proves the widened read is correct (null source counted per
    * generation, n_chars summed only where it exists).
    *
    * At 100 TB the same read works because parquet footers carry each
    * file's own schema; the merge is planning-time only, and column
    * pruning/pushdown still reach every generation's scan. (For
    * steady-state reads you'd pin the union schema explicitly and skip
    * the footer sampling — documented here, demonstrated with the
    * option on.)
    */
  def w07SchemaEvolution(spark: SparkSession, dir: String): DataFrame = {
    val out = stage(spark, dir, "evolve")
    val docs = Tables.documents(spark, dir)
    // generation 1: the narrow v1 schema (old files, never rewritten)
    docs.where(col("doc_id") % 2 === 0)
      .select(col("doc_id"), col("lang"), col("text"))
      .write.mode("overwrite").parquet(s"$out/gen=1")
    // generation 2: the widened schema
    docs.where(col("doc_id") % 2 =!= 0)
      .select(col("doc_id"), col("lang"), col("text"), col("source"), col("n_chars"))
      .write.mode("overwrite").parquet(s"$out/gen=2")
    spark.read.option("mergeSchema", "true").parquet(out)
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n_docs"),
        sum(when(col("source").isNull, 1L).otherwise(0L)).as("n_gen1"),
        sum(when(col("source").isNotNull, 1L).otherwise(0L)).as("n_gen2"),
        sum(col("n_chars")).as("sum_chars_gen2"))
  }

  /** w05: partition-level upsert — the parquet-lake MERGE pattern
    * without a table format: the corpus lands partitioned by lang, then
    * an incremental batch (updates to some `en` documents + brand-new
    * `en` documents) is merged and written back with DYNAMIC partition
    * overwrite, which rewrites ONLY the partitions present in the batch
    * and leaves every other language's files untouched (pinned by
    * spec). At 100 TB this is the nightly upsert job: the rewrite cost
    * is proportional to the touched partitions, not the table.
    * Returned rollup = full read-back per-lang stats, oracle-checked
    * against the expected merged state computed from the source table.
    */
  def w05SinkUpsert(spark: SparkSession, dir: String): DataFrame = {
    val out = upsertDir(spark, dir)
    // explicit schema for the same empty-day reason as w01
    spark.read.schema(Tables.documents(spark, dir).schema).parquet(out)
      .groupBy("lang")
      .agg(count(lit(1)).as("n_docs"), sum("n_chars").as("sum_chars"))
  }

  private[graft] def upsertDir(spark: SparkSession, dir: String): String = {
    val out = upsertInitialLoad(spark, dir)
    upsertApplyIncrement(spark, dir)
    out
  }

  private[graft] def upsertInitialLoad(spark: SparkSession, dir: String): String = {
    val out = stage(spark, dir, "upsert")
    Tables.documents(spark, dir)
      .write.mode("overwrite").partitionBy("lang").parquet(out)
    out
  }

  /** The incremental batch: every 7th en doc gets a metadata
    * correction, plus new en docs derived from the doc_id%7==1 slice.
    * Written with DYNAMIC partition overwrite — only lang=en rewrites.
    */
  private[graft] def upsertApplyIncrement(spark: SparkSession, dir: String): Unit = {
    val out = stage(spark, dir, "upsert")
    val docs = Tables.documents(spark, dir)
    val updated = docs.where(col("lang") === "en")
      .withColumn("n_chars",
        when(col("doc_id") % 7 === 0, col("n_chars") + 1000L).otherwise(col("n_chars")))
    val fresh = docs.where(col("lang") === "en" && col("doc_id") % 7 === 1)
      .withColumn("doc_id", col("doc_id") + 2000000L)
    updated.unionByName(fresh)
      .write.mode("overwrite")
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy("lang")
      .parquet(out)
  }

  /** w08: atomic snapshot publish — the manifest-commit primitive
    * every table format builds on: a snapshot's data files land FIRST
    * (any number of writers, any duration), then ONE manifest file —
    * the committed file list — is renamed into place LAST. Readers
    * resolve the highest committed manifest and read exactly its
    * files, never the directory listing, so a half-written snapshot is
    * invisible until its single-file commit and a reader can never see
    * a torn write. Rename-as-commit is atomic on HDFS and on object
    * stores with atomic rename semantics; at 100 TB the manifest is
    * the only serialization point — data file writes stay massively
    * parallel.
    *
    * The operator bakes the guarantee into its ORACLE: it publishes
    * snapshot 1 (the full corpus), then writes snapshot 2's data files
    * WITHOUT committing their manifest — the returned read-back rollup
    * must be exactly snapshot 1's, which DuckDB checks against the
    * source table. The spec then commits manifest 2 and pins the
    * atomic flip.
    */
  def w08AtomicPublish(spark: SparkSession, dir: String): DataFrame = {
    val root = stage(spark, dir, "publish")
    val docs = Tables.documents(spark, dir)
    publishSnapshot(spark, docs, root, 1)
    // snapshot 2's data files exist but its manifest is NOT committed:
    // readers must keep serving snapshot 1
    writeSnapshotData(spark, docs.where(col("doc_id") % 3 === 0), root, 2)
    readPublished(spark, dir, root)
      .groupBy("lang")
      .agg(count(lit(1)).as("n_docs"), sum("n_chars").as("sum_chars"))
  }

  private[graft] def writeSnapshotData(
      spark: SparkSession, df: DataFrame, root: String, n: Int): Seq[String] = {
    import org.apache.hadoop.fs.{Path => HPath}
    val out = s"$root/data/snap$n"
    df.write.mode("overwrite").parquet(out)
    val fs = new HPath(out).getFileSystem(spark.sessionState.newHadoopConf())
    fs.globStatus(new HPath(s"$out/part-*.parquet"))
      .map(_.getPath.toUri.getPath).toIndexedSeq.sorted
  }

  /** Commit a manifest atomically: write the file list to a temp name,
    * then rename into place (rename is the atomic primitive).
    */
  private[graft] def commitManifest(
      spark: SparkSession, root: String, n: Int, files: Seq[String]): Unit = {
    import org.apache.hadoop.fs.{Path => HPath}
    val fs = new HPath(root).getFileSystem(spark.sessionState.newHadoopConf())
    val tmp = new HPath(root, s"_tmp_manifest_$n")
    val out = fs.create(tmp, true)
    try out.write(files.mkString("\n").getBytes("UTF-8")) finally out.close()
    if (!fs.rename(tmp, new HPath(root, s"manifest-$n")))
      throw new IllegalStateException(s"manifest-$n commit rename failed")
  }

  private[graft] def publishSnapshot(
      spark: SparkSession, df: DataFrame, root: String, n: Int): Unit =
    commitManifest(spark, root, n, writeSnapshotData(spark, df, root, n))

  /** Read the published table: resolve the HIGHEST committed manifest
    * (or, for a time-travel read, exactly snapshot `asOf`), read
    * exactly its files. The directory listing is never trusted — that
    * is the whole contract.
    */
  private[graft] def readPublished(
      spark: SparkSession, dir: String, root: String,
      asOf: Option[Int] = None): DataFrame = {
    import org.apache.hadoop.fs.{Path => HPath}
    val fs = new HPath(root).getFileSystem(spark.sessionState.newHadoopConf())
    val manifests = fs.globStatus(new HPath(s"$root/manifest-*"))
    require(manifests.nonEmpty, s"no committed manifest under $root")
    val chosen = asOf match {
      case Some(n) =>
        manifests.map(_.getPath).find(_.getName == s"manifest-$n")
          .getOrElse(throw new IllegalArgumentException(
            s"snapshot $n was never committed under $root"))
      case None =>
        manifests.map(_.getPath).maxBy(_.getName.stripPrefix("manifest-").toInt)
    }
    val in = fs.open(chosen)
    val files = try scala.io.Source.fromInputStream(in, "UTF-8").getLines()
        .filter(_.nonEmpty).toList
      finally in.close()
    val schema = Tables.documents(spark, dir).schema
    // an empty snapshot commits an empty manifest (the w01 lesson: an
    // empty ingest day is an empty frame, not a read error)
    if (files.isEmpty)
      spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)
    else spark.read.schema(schema).parquet(files: _*)
  }

  /** w10: time-travel read — the other read primitive a manifest table
    * gives for free: every committed manifest is an immutable snapshot
    * forever (data files are never rewritten in place, superseded ones
    * just stop being referenced), so "the table as of snapshot N" is
    * resolving manifest-N instead of the highest. The operator commits
    * snapshot 1 = the full corpus, then commits snapshot 2 = a
    * filtered rewrite; the CURRENT read serves snapshot 2, and the
    * as-of-1 read — what the operator returns — must still roll up to
    * exactly the source table even though a newer committed snapshot
    * has long since superseded it. Reproducibility at 100 TB: a
    * training run pinned to snapshot N reads identical bytes months
    * later, regardless of how many snapshots landed since.
    */
  def w10TimeTravel(spark: SparkSession, dir: String): DataFrame = {
    val root = stage(spark, dir, "travel")
    val docs = Tables.documents(spark, dir)
    publishSnapshot(spark, docs, root, 1)
    publishSnapshot(spark, docs.where(col("doc_id") % 3 === 0), root, 2)
    readPublished(spark, dir, root, asOf = Some(1))
      .groupBy("lang")
      .agg(count(lit(1)).as("n_docs"), sum("n_chars").as("sum_chars"))
  }

  /** w09: manifest zone maps + data-skipping reads — the second half
    * of the w08 manifest contract and the reason real table formats
    * carry per-file column stats: the publish step range-lays-out the
    * corpus on doc_id (disjoint per-file ranges, the w03 mechanics)
    * and records each file's (min, max) doc_id IN the manifest; a
    * predicate read then resolves the manifest and opens ONLY the
    * files whose [min, max] window intersects the predicate — the
    * planner never lists the directory and never opens a file it can
    * prove empty. At 100 TB this is the difference between a full
    * 100 TB scan and reading one file: partition pruning for
    * predicates that aren't partition columns.
    *
    * The returned rollup is over `doc_id <= min + (max-min)/8` (an
    * eighth of the id range), which the pruned read must answer from
    * a strict subset of the files — the spec pins files-opened <
    * files-total and equality with the unpruned scan.
    */
  def w09StatsPruning(spark: SparkSession, dir: String): DataFrame = {
    val root = stage(spark, dir, "zonemap")
    val docs = Tables.documents(spark, dir)
    publishWithStats(spark, docs, root)
    val schema = docs.schema
    idRangeThreshold(docs) match {
      case None => // empty corpus: empty frame with the rollup schema
        spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)
          .groupBy("lang")
          .agg(count(lit(1)).as("n_docs"), sum("n_chars").as("sum_chars"))
      case Some(hi) =>
        val files = pruneFiles(spark, root, Long.MinValue, hi)
        val base =
          if (files.isEmpty)
            spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)
          else spark.read.schema(schema).parquet(files: _*)
        base.where(col("doc_id") <= hi)
          .groupBy("lang")
          .agg(count(lit(1)).as("n_docs"), sum("n_chars").as("sum_chars"))
    }
  }

  /** The read predicate's bound: an eighth of the observed id range —
    * one tiny 1-row agg on the driver, the same scalar a catalog
    * would resolve before planning the file list.
    */
  private[graft] def idRangeThreshold(docs: DataFrame): Option[Long] = {
    val r = docs.agg(min("doc_id"), max("doc_id")).head()
    if (r.isNullAt(0)) None
    else Some(r.getLong(0) + (r.getLong(1) - r.getLong(0)) / 8)
  }

  /** Publish the corpus range-sorted on doc_id with per-file
    * (min, max) doc_id stats in the manifest. Stats come from one
    * per-file agg over the freshly written layout (8 rows), the
    * moral equivalent of reading back the parquet footers.
    */
  private[graft] def publishWithStats(
      spark: SparkSession, docs: DataFrame, root: String): Unit = {
    val out = s"$root/data/snap1"
    docs.repartitionByRange(8, col("doc_id"))
      .sortWithinPartitions("doc_id")
      .write.mode("overwrite").parquet(out)
    val stats = spark.read.schema(docs.schema).parquet(out)
      .groupBy(input_file_name().as("f"))
      .agg(min("doc_id").as("lo"), max("doc_id").as("hi"))
      .collect()
      .map(r => s"${new java.net.URI(r.getString(0)).getPath}\t${r.getLong(1)}\t${r.getLong(2)}")
      .toIndexedSeq.sorted
    commitManifest(spark, root, 1, stats)
  }

  /** Resolve the manifest and return only the files whose [lo, hi]
    * zone intersects the query's [qlo, qhi] — file-level skipping
    * from stats alone, no directory listing, no file opens.
    */
  private[graft] def pruneFiles(
      spark: SparkSession, root: String, qlo: Long, qhi: Long): Seq[String] =
    manifestLines(spark, root).flatMap { line =>
      val Array(path, lo, hi) = line.split('\t')
      if (lo.toLong <= qhi && hi.toLong >= qlo) Some(path) else None
    }

  private[graft] def manifestLines(spark: SparkSession, root: String): Seq[String] = {
    import org.apache.hadoop.fs.{Path => HPath}
    val fs = new HPath(root).getFileSystem(spark.sessionState.newHadoopConf())
    val manifests = fs.globStatus(new HPath(s"$root/manifest-*"))
    require(manifests.nonEmpty, s"no committed manifest under $root")
    val latest = manifests.map(_.getPath).maxBy(_.getName.stripPrefix("manifest-").toInt)
    val in = fs.open(latest)
    try scala.io.Source.fromInputStream(in, "UTF-8").getLines()
      .filter(_.nonEmpty).toList
    finally in.close()
  }

  /** Append-publish ONE micro-batch into a manifest table: the batch's
    * data files land under their own directory, then manifest-(id+1) =
    * previous manifest's files + the new ones commits via the same
    * rename. Idempotent on batch replay: foreachBatch is at-least-once,
    * so a retried batch id finds its manifest already committed and
    * does nothing — the manifest check upgrades the sink to
    * exactly-once publish, and a reader mid-stream only ever sees
    * whole committed batches.
    */
  private[graft] def publishBatch(
      spark: SparkSession, batch: DataFrame, root: String, id: Long): Unit = {
    import org.apache.hadoop.fs.{Path => HPath}
    val fs = new HPath(root).getFileSystem(spark.sessionState.newHadoopConf())
    val n = id.toInt + 1
    if (fs.exists(new HPath(root, s"manifest-$n"))) return // replayed batch
    val prev = if (n == 1) Seq.empty[String]
      else manifestLines(spark, root) // serial batches: highest == n-1
    val fresh = writeSnapshotData(spark, batch, root, n)
    commitManifest(spark, root, n, prev ++ fresh)
  }

  /** w11: snapshot compaction — the maintenance primitive (OPTIMIZE)
    * a manifest table needs once streams land many small files: read
    * the LIVE snapshot through its manifest, rewrite it as few
    * range-sorted files, and commit the result as a NEW manifest. The
    * flip is the same one-rename commit as any other snapshot, so
    * readers switch atomically from many files to few; the superseded
    * manifest and its files are untouched — every older snapshot
    * stays byte-identical for time travel (w10), and the compacted
    * rewrite is just another entry in the table's history. At 100 TB
    * compaction is continuous background work, and THIS is why it can
    * be: it never blocks or breaks a reader.
    */
  def w11CompactSnapshots(spark: SparkSession, dir: String): DataFrame = {
    val root = stage(spark, dir, "compact")
    val docs = Tables.documents(spark, dir)
    // a streamed landing leaves one file-set per batch: simulate with
    // a 3-way split published as 3 snapshots (s12's layout shape)
    val parts = Seq(0, 1, 2).map(i => docs.where(col("doc_id") % 3 === i))
    publishSnapshot(spark, parts(0), root, 1)
    parts.zipWithIndex.drop(1).foreach { case (p, i) =>
      publishBatch(spark, p, root, i.toLong)
    }
    compactLive(spark, dir, root)
    readPublished(spark, dir, root)
      .groupBy("lang")
      .agg(count(lit(1)).as("n_docs"), sum("n_chars").as("sum_chars"))
  }

  /** Rewrite the live snapshot as a handful of range-sorted files and
    * commit them as the next manifest. Returns the new snapshot id.
    */
  private[graft] def compactLive(
      spark: SparkSession, dir: String, root: String): Int = {
    import org.apache.hadoop.fs.{Path => HPath}
    val fs = new HPath(root).getFileSystem(spark.sessionState.newHadoopConf())
    val live = fs.globStatus(new HPath(s"$root/manifest-*"))
      .map(_.getPath.getName.stripPrefix("manifest-").toInt).max
    val n = live + 1
    val out = s"$root/data/snap$n"
    readPublished(spark, dir, root)
      .repartitionByRange(2, col("doc_id"))
      .sortWithinPartitions("doc_id")
      .write.mode("overwrite").parquet(out)
    val files = fs.globStatus(new HPath(s"$out/part-*.parquet"))
      .map(_.getPath.toUri.getPath).toIndexedSeq.sorted
    commitManifest(spark, root, n, files)
    n
  }

  /** w12: snapshot expiry + garbage collection — the VACUUM half of
    * the manifest lifecycle: compaction (w11) supersedes snapshots but
    * deletes nothing, so storage only grows until expiry removes (a)
    * manifests older than the retention horizon and (b) every data
    * file no SURVIVING manifest references. Deletion order is the
    * safety: manifests first (readers can no longer resolve the
    * expired snapshot), then the orphaned files — a crash between the
    * two leaves unreferenced files (harmless, re-collectable), never a
    * manifest pointing at deleted data. At 100 TB expiry is the only
    * thing standing between a busy table and unbounded storage, and
    * it must be provably unable to break the live table — the spec
    * pins the live read byte-identical across the GC.
    */
  def w12ExpireSnapshots(spark: SparkSession, dir: String): DataFrame = {
    val root = stage(spark, dir, "expire")
    val docs = Tables.documents(spark, dir)
    // history: full corpus → filtered rewrite → compaction (3 snapshots)
    publishSnapshot(spark, docs.where(col("doc_id") % 3 === 0), root, 1)
    publishSnapshot(spark, docs, root, 2)
    compactLive(spark, dir, root)
    expireSnapshots(spark, root, keepFrom = 3)
    readPublished(spark, dir, root)
      .groupBy("lang")
      .agg(count(lit(1)).as("n_docs"), sum("n_chars").as("sum_chars"))
  }

  /** Expire every snapshot below `keepFrom`, then delete data files no
    * surviving manifest references. Returns (manifests deleted, data
    * files deleted).
    */
  private[graft] def expireSnapshots(
      spark: SparkSession, root: String, keepFrom: Int): (Int, Int) = {
    import org.apache.hadoop.fs.{Path => HPath}
    val fs = new HPath(root).getFileSystem(spark.sessionState.newHadoopConf())
    val all = fs.globStatus(new HPath(s"$root/manifest-*")).map(_.getPath)
    val (expired, kept) = all.partition(_.getName.stripPrefix("manifest-").toInt < keepFrom)
    require(kept.nonEmpty, s"expiry must keep at least one snapshot under $root")
    // 1. manifests first: the expired snapshots stop being resolvable
    expired.foreach(p => fs.delete(p, false))
    // 2. then any data file only the expired snapshots referenced
    val live = kept.flatMap { m =>
      val in = fs.open(m)
      try scala.io.Source.fromInputStream(in, "UTF-8").getLines()
        .filter(_.nonEmpty).map(_.split('\t')(0)).toList
      finally in.close()
    }.toSet
    val orphans = fs.globStatus(new HPath(s"$root/data/*/part-*.parquet"))
      .map(_.getPath).filterNot(p => live.contains(p.toUri.getPath))
    orphans.foreach(p => fs.delete(p, false))
    (expired.length, orphans.length)
  }

  /** w16: partition evolution — the table re-partitions WITHOUT
    * rewriting history: generation 1 landed partitioned by `lang`
    * (the original curation axis), generation 2 lands partitioned by
    * `source` (the new one), and the read path unions both layouts.
    * The contract at 100 TB: re-partitioning a table must never mean
    * rewriting 100 TB — old files keep their old directory pruning,
    * new files get the new pruning, and each generation's reads prune
    * by ITS OWN layout (spec pins partition filters on both). The
    * partition column is recovered from directory names on read (the
    * standard Hive layout), so the union is loss-free.
    */
  def w16PartitionEvolution(spark: SparkSession, dir: String): DataFrame = {
    val out = stage(spark, dir, "pevolve")
    val docs = Tables.documents(spark, dir)
    docs.where(col("doc_id") % 2 === 0)
      .write.mode("overwrite").partitionBy("lang").parquet(s"$out/gen1")
    docs.where(col("doc_id") % 2 =!= 0)
      .write.mode("overwrite").partitionBy("source").parquet(s"$out/gen2")
    w16Union(spark, dir, out)
      .groupBy("lang")
      .agg(count(lit(1)).as("n_docs"), sum("n_chars").as("sum_chars"),
        countDistinct(col("source")).as("n_sources"))
  }

  /** The evolution-aware read: each generation is read with its own
    * partition layout (its partition column recovered from directory
    * names), then aligned by name. Explicit per-generation schemas: a
    * zero-row generation must read as empty, not throw (the w01
    * lesson), and schema inference is a full extra pass at scale.
    */
  private[graft] def w16Union(
      spark: SparkSession, dir: String, out: String): DataFrame = {
    val full = Tables.documents(spark, dir).schema
    def gen(sub: String, partCol: String): DataFrame = {
      val dataCols = org.apache.spark.sql.types.StructType(
        full.filterNot(_.name == partCol))
      val df = spark.read.schema(dataCols).option("basePath", s"$out/$sub")
        .parquet(s"$out/$sub")
      // A zero-row generation has no partition directories, so the
      // partition column is never discovered — back-fill it typed-null
      // so the union stays schema-aligned.
      if (df.columns.contains(partCol)) df
      else df.withColumn(partCol, lit(null).cast(full(partCol).dataType))
    }
    val g1 = gen("gen1", "lang")
    val g2 = gen("gen2", "source")
    val cols = full.map(f => col(f.name))
    g1.select(cols: _*).unionByName(g2.select(cols: _*))
  }

  /** One generation of the w16 layout filtered on its OWN partition
    * column — exposed for the pruning plan pin.
    */
  private[graft] def w16GenRead(
      spark: SparkSession, dir: String, sub: String, partCol: String,
      value: String): DataFrame = {
    val out = stage(spark, dir, "pevolve")
    val full = Tables.documents(spark, dir).schema
    val dataCols = org.apache.spark.sql.types.StructType(
      full.filterNot(_.name == partCol))
    spark.read.schema(dataCols).option("basePath", s"$out/$sub")
      .parquet(s"$out/$sub").where(col(partCol) === value)
  }

  /** w15: copy-on-write row-level deletes — the compliance primitive
    * (GDPR erasure, takedown requests, per-user opt-out) a training
    * corpus cannot ship without. Deleting rows from an immutable
    * layout means REWRITING files — and the zone-map stats make that
    * surgical: only files whose (min,max) doc_id window intersects
    * the delete predicate are opened and rewritten; every other file
    * is carried into the new manifest untouched, byte-identical. The
    * new manifest commits with the same one-rename atomicity as any
    * snapshot, so readers flip from "rows present" to "rows gone" in
    * one step — and the SUPERSEDED snapshot still serves the deleted
    * rows for as-of reads until expiry (w12) garbage-collects it:
    * erasure becomes durable exactly when retention policy says so.
    * At 100 TB the delete cost is proportional to the files the
    * predicate touches, never to the table.
    */
  def w15RowDeletes(spark: SparkSession, dir: String): DataFrame = {
    val root = stage(spark, dir, "rowdel")
    val docs = Tables.documents(spark, dir)
    publishWithStats(spark, docs, root) // snapshot 1: range layout + stats
    idRangeThreshold(docs).foreach { thr =>
      deleteIdRange(spark, docs.schema, root, Long.MinValue, thr) // snapshot 2
    }
    readStatsPublished(spark, docs.schema, root)
      .groupBy("lang")
      .agg(count(lit(1)).as("n_docs"), sum("n_chars").as("sum_chars"))
  }

  /** Copy-on-write delete of doc_id ∈ [qlo, qhi] from the live stats
    * manifest: affected files (zone intersection) are read, filtered
    * and rewritten under the next snapshot; untouched files carry
    * over verbatim. Returns (files rewritten, files carried).
    */
  private[graft] def deleteIdRange(
      spark: SparkSession, schema: org.apache.spark.sql.types.StructType,
      root: String, qlo: Long, qhi: Long): (Int, Int) = {
    import org.apache.hadoop.fs.{Path => HPath}
    val fs = new HPath(root).getFileSystem(spark.sessionState.newHadoopConf())
    val live = fs.globStatus(new HPath(s"$root/manifest-*"))
      .map(_.getPath.getName.stripPrefix("manifest-").toInt).max
    val lines = manifestLines(spark, root)
    val (affected, untouched) = lines.partition { line =>
      val p = line.split('\t')
      p(1).toLong <= qhi && p(2).toLong >= qlo
    }
    val n = live + 1
    val rewrittenStats =
      if (affected.isEmpty) Seq.empty[String]
      else {
        val out = s"$root/data/snap$n"
        spark.read.schema(schema).parquet(affected.map(_.split('\t')(0)): _*)
          .where(!(col("doc_id") >= qlo && col("doc_id") <= qhi))
          .repartitionByRange(math.max(1, affected.size), col("doc_id"))
          .sortWithinPartitions("doc_id")
          .write.mode("overwrite").parquet(out)
        dataFileStats(spark, schema, out)
      }
    commitManifest(spark, root, n, untouched ++ rewrittenStats)
    (affected.length, untouched.length)
  }

  /** Re-derive true per-file (min,max) doc_id stats for every parquet
    * file just written under `out` — one distributed pass grouped by
    * `input_file_name()`, the manifest line format of w09.
    */
  private[graft] def dataFileStats(
      spark: SparkSession, schema: org.apache.spark.sql.types.StructType,
      out: String): Seq[String] = {
    import org.apache.hadoop.fs.{Path => HPath}
    val fs = new HPath(out).getFileSystem(spark.sessionState.newHadoopConf())
    val written = fs.globStatus(new HPath(s"$out/part-*.parquet"))
    if (written == null || written.isEmpty) Seq.empty[String]
    else spark.read.schema(schema)
      .parquet(written.map(_.getPath.toUri.getPath).toIndexedSeq: _*)
      .groupBy(input_file_name().as("f"))
      .agg(min("doc_id").as("lo"), max("doc_id").as("hi"))
      .collect()
      .map(r => s"${new java.net.URI(r.getString(0)).getPath}\t${r.getLong(1)}\t${r.getLong(2)}")
      .toIndexedSeq.sorted
  }

  /** w17: row-level MERGE / CDC apply — the write primitive that
    * completes the lakehouse surface next to w05 (partition upsert)
    * and w15 (deletes): one changeset carrying DELETEs, UPDATEs and
    * INSERTs lands in a single atomic commit. The changeset here is
    * confined to the lower-eighth doc_id range (a CDC batch touches a
    * key range, not the whole table): within it, `doc_id % 4 == 1`
    * rows are deleted and re-land under new ids (`mx + doc_id`,
    * source `cdc_ins` — the delete-then-reinsert shape real CDC
    * streams produce), and `doc_id % 4 == 2` rows are updated in
    * place (`n_chars + 1000`, source `cdc_upd`). Zone maps confine
    * the rewrite to files whose (min,max) window intersects the
    * changeset's key range; INSERTs never rewrite anything — they
    * land as brand-new files appended to the manifest. One manifest
    * rename commits all three change kinds atomically, and the
    * superseded snapshot still serves the pre-merge rows as-of-1.
    * At 100 TB: merge cost ∝ files the changeset touches + new bytes,
    * never table size.
    */
  /** w18: write-audit-publish — the governance pattern the manifest
    * family exists to enable (Iceberg/Netflix "WAP"): a batch's data
    * files land in the staging area, an audit runs ON THE STAGED
    * FILES (what was actually written, not what the job meant to
    * write), and only a clean batch gets its manifest commit — the
    * one-rename publish of w08. A failing batch aborts with NO
    * manifest: readers keep serving the last good snapshot, and the
    * orphaned staged files are exactly what w12's GC sweeps. Two
    * deterministic candidate batches exercise both paths: a metadata
    * refresh whose extractor nulled half its texts (audit fails,
    * abort), then a clean append (audit passes, publish). The ledger
    * the operator returns — per-batch staged rows, audit failures,
    * published flag — is pure integer arithmetic over deterministic
    * slices, so DuckDB recomputes it exactly; the published TABLE
    * state is pinned in the spec (base ∪ clean batch, two manifests,
    * dirty files orphaned).
    */
  def w18WriteAuditPublish(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val root = stage(spark, dir, "wap")
    val docs = Tables.documents(spark, dir)
    val files1 = writeSnapshotData(spark, docs, root, 1)
    commitManifest(spark, root, 1, files1)
    val dirty = docs.where(col("doc_id") % 7 === 3)
      .withColumn("text", when(col("doc_id") % 14 === 3, lit(null).cast("string"))
        .otherwise(col("text")))
    val clean = docs.where(col("doc_id") % 7 === 5)
      .withColumn("doc_id", col("doc_id") + 3000000L)
    var committed = files1
    var nextManifest = 2
    val ledger = Seq((1L, dirty, 2), (2L, clean, 3)).map { case (bid, df, sn) =>
      val files = writeSnapshotData(spark, df, root, sn)
      val staged =
        if (files.isEmpty)
          spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], docs.schema)
        else spark.read.schema(docs.schema).parquet(files: _*)
      val audit = staged.agg(
        count(lit(1)),
        count_if(col("text").isNull || length(trim(col("text"))) === 0)).head()
      val (n, bad) = (audit.getLong(0), audit.getLong(1))
      if (bad == 0 && n > 0) {
        committed = committed ++ files
        commitManifest(spark, root, nextManifest, committed)
        nextManifest += 1
      }
      (bid, n, bad, if (bad == 0 && n > 0) 1L else 0L)
    }
    ledger.toDF("batch", "n_rows", "n_bad", "published")
  }

  def w17MergeCdc(spark: SparkSession, dir: String): DataFrame = {
    val root = stage(spark, dir, "merge")
    val docs = Tables.documents(spark, dir)
    publishWithStats(spark, docs, root) // snapshot 1: range layout + stats
    idRangeThreshold(docs).foreach { thr =>
      val mx = docs.agg(max("doc_id")).head().getLong(0)
      applyMergeCdc(spark, docs.schema, root, thr, mx) // snapshot 2
    }
    readStatsPublished(spark, docs.schema, root)
      .groupBy("lang")
      .agg(count(lit(1)).as("n_docs"), sum("n_chars").as("sum_chars"),
        count(when(col("source").isin("cdc_upd", "cdc_ins"), 1)).as("n_cdc"))
  }

  /** Apply the w17 changeset (deletes + updates on doc_id ∈
    * (-∞, thr], inserts keyed above `mx`) copy-on-write: affected
    * files (zone intersection with the changeset's key range) are
    * read, merged and rewritten under the next snapshot; untouched
    * files carry over verbatim; inserts land as new files. Returns
    * (files rewritten, files carried, insert files added).
    */
  private[graft] def applyMergeCdc(
      spark: SparkSession, schema: org.apache.spark.sql.types.StructType,
      root: String, thr: Long, mx: Long): (Int, Int, Int) = {
    import org.apache.hadoop.fs.{Path => HPath}
    val fs = new HPath(root).getFileSystem(spark.sessionState.newHadoopConf())
    val live = fs.globStatus(new HPath(s"$root/manifest-*"))
      .map(_.getPath.getName.stripPrefix("manifest-").toInt).max
    val lines = manifestLines(spark, root)
    // the changeset's keys all lie in (-∞, thr]: a file intersects
    // iff its min doc_id does
    val (affected, untouched) = lines.partition(_.split('\t')(1).toLong <= thr)
    val n = live + 1
    val touched = col("doc_id") <= thr
    val outCols = schema.map(f => col(f.name))
    val (rewrittenStats, insertStats) =
      if (affected.isEmpty) (Seq.empty[String], Seq.empty[String])
      else {
        val src = spark.read.schema(schema)
          .parquet(affected.map(_.split('\t')(0)): _*)
        val rwOut = s"$root/data/snap${n}rw"
        src.where(!(touched && col("doc_id") % 4 === 1))
          .withColumn("n_chars",
            when(touched && col("doc_id") % 4 === 2, col("n_chars") + 1000L)
              .otherwise(col("n_chars")))
          .withColumn("source",
            when(touched && col("doc_id") % 4 === 2, lit("cdc_upd"))
              .otherwise(col("source")))
          .select(outCols: _*)
          .repartitionByRange(math.max(1, affected.size), col("doc_id"))
          .sortWithinPartitions("doc_id")
          .write.mode("overwrite").parquet(rwOut)
        val insOut = s"$root/data/snap${n}ins"
        src.where(touched && col("doc_id") % 4 === 1)
          .select((col("doc_id") + mx).as("doc_id"), col("text"),
            col("lang"), lit("cdc_ins").as("source"), col("n_chars"))
          .select(outCols: _*)
          .repartitionByRange(math.max(1, affected.size / 2), col("doc_id"))
          .sortWithinPartitions("doc_id")
          .write.mode("overwrite").parquet(insOut)
        (dataFileStats(spark, schema, rwOut), dataFileStats(spark, schema, insOut))
      }
    commitManifest(spark, root, n, untouched ++ rewrittenStats ++ insertStats)
    (affected.length, untouched.length, insertStats.length)
  }

  /** One micro-batch of the s14 streaming MERGE: the batch's rows in
    * the changeset key range are its CDC records (w17's rules —
    * doc_id%4==1 delete + reinsert above `mx`, %4==2 update in
    * place). Zone maps confine the rewrite to files the BATCH's key
    * span touches, and the rewrite joins on the batch's key set, so
    * keys owned by other batches pass through untouched. foreachBatch
    * is at-least-once; the manifest-(id+2) existence guard (manifest-1
    * is the base load) makes a replayed batch a no-op, so the merge
    * commits exactly once per batch — the s12 protocol carried from
    * append-only publish to full MERGE.
    */
  private[graft] def applyMergeBatch(
      spark: SparkSession, batch: DataFrame, root: String,
      id: Long, thr: Long, mx: Long): Unit = {
    import org.apache.hadoop.fs.{Path => HPath}
    val fs = new HPath(root).getFileSystem(spark.sessionState.newHadoopConf())
    val n = id.toInt + 2
    if (fs.exists(new HPath(root, s"manifest-$n"))) return // replayed batch
    val schema = batch.schema
    val outCols = schema.map(f => col(f.name))
    val recs = batch.where(col("doc_id") <= thr &&
        (col("doc_id") % 4 === 1 || col("doc_id") % 4 === 2))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      val b = recs.agg(min("doc_id"), max("doc_id")).head()
      if (b.isNullAt(0)) {
        // a batch with no CDC records still commits (a carry manifest):
        // the replay guard needs one manifest per batch id
        commitManifest(spark, root, n, manifestLines(spark, root))
        return
      }
      val (lo, hi) = (b.getLong(0), b.getLong(1))
      val lines = manifestLines(spark, root)
      val (affected, untouched) = lines.partition { l =>
        val p = l.split('\t'); p(1).toLong <= hi && p(2).toLong >= lo
      }
      val delKeys = recs.where(col("doc_id") % 4 === 1)
        .select(col("doc_id"), lit(1).as("del"))
      val updKeys = recs.where(col("doc_id") % 4 === 2)
        .select(col("doc_id"), lit(1).as("upd"))
      val rwStats =
        if (affected.isEmpty) Seq.empty[String]
        else {
          val rwOut = s"$root/data/snap${n}rw"
          spark.read.schema(schema).parquet(affected.map(_.split('\t')(0)): _*)
            .join(broadcast(delKeys), Seq("doc_id"), "left")
            .where(col("del").isNull)
            .join(broadcast(updKeys), Seq("doc_id"), "left")
            .withColumn("n_chars",
              when(col("upd").isNotNull, col("n_chars") + 1000L)
                .otherwise(col("n_chars")))
            .withColumn("source",
              when(col("upd").isNotNull, lit("cdc_upd")).otherwise(col("source")))
            .select(outCols: _*)
            .repartitionByRange(math.max(1, affected.size), col("doc_id"))
            .sortWithinPartitions("doc_id")
            .write.mode("overwrite").parquet(rwOut)
          dataFileStats(spark, schema, rwOut)
        }
      val insOut = s"$root/data/snap${n}ins"
      recs.where(col("doc_id") % 4 === 1)
        .select((col("doc_id") + mx).as("doc_id"), col("text"),
          col("lang"), lit("cdc_ins").as("source"), col("n_chars"))
        .select(outCols: _*)
        .repartitionByRange(math.max(1, affected.size), col("doc_id"))
        .sortWithinPartitions("doc_id")
        .write.mode("overwrite").parquet(insOut)
      commitManifest(spark, root, n,
        untouched ++ rwStats ++ dataFileStats(spark, schema, insOut))
    } finally recs.unpersist()
  }

  /** Read a stats-manifest table (latest, or as-of `asOf`): resolve
    * the manifest, strip the stats columns, read exactly those files.
    */
  private[graft] def readStatsPublished(
      spark: SparkSession, schema: org.apache.spark.sql.types.StructType,
      root: String, asOf: Option[Int] = None): DataFrame = {
    import org.apache.hadoop.fs.{Path => HPath}
    val lines = asOf match {
      case Some(n) => manifestFilesAt(spark, root, n)
      case None    => manifestLines(spark, root)
    }
    val files = lines.map(_.split('\t')(0))
    if (files.isEmpty)
      spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)
    else spark.read.schema(schema).parquet(files: _*)
  }

  /** w14: Z-order compaction — multi-dimensional clustering, the
    * OPTIMIZE ZORDER BY primitive: w09's range layout prunes doc_id
    * predicates, but a predicate on any OTHER column intersects every
    * file. Interleaving the bits of per-dimension range buckets
    * (16×16 grid → 8-bit Z value, all integer bit arithmetic inside
    * codegen) and range-laying the files on Z gives every file a
    * tight bounding BOX in both dimensions, so the manifest's
    * per-file (min,max) stats prune a predicate on EITHER column. At
    * 100 TB this is the difference between "fast on the cluster key,
    * full scan on everything else" and file-skipping on every
    * dimension the table is curated by. The operator publishes the
    * corpus Z-ordered with 2-D stats and answers an n_chars-range
    * rollup — the dimension w09's layout cannot prune — from only the
    * intersecting files; the spec pins strict-subset opens on BOTH
    * dimensions.
    */
  def w14ZorderCompact(spark: SparkSession, dir: String): DataFrame = {
    val root = stage(spark, dir, "zorder")
    val docs = Tables.documents(spark, dir)
    publishZordered(spark, docs, root)
    val schema = docs.schema
    dimThreshold(docs, "n_chars") match {
      case None => // empty corpus: empty frame with the rollup schema
        spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)
          .groupBy("lang")
          .agg(count(lit(1)).as("n_docs"), sum("n_chars").as("sum_chars"))
      case Some(hi) =>
        val files = pruneFilesDim(spark, root, dim = 1, Long.MinValue, hi)
        val base =
          if (files.isEmpty)
            spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)
          else spark.read.schema(schema).parquet(files: _*)
        base.where(col("n_chars") <= hi)
          .groupBy("lang")
          .agg(count(lit(1)).as("n_docs"), sum("n_chars").as("sum_chars"))
    }
  }

  /** Lower-eighth value threshold for a dimension (w09's device). */
  private[graft] def dimThreshold(docs: DataFrame, c: String): Option[Long] = {
    val r = docs.agg(min(c), max(c)).head()
    if (r.isNullAt(0)) None
    else Some(r.getLong(0) + (r.getLong(1) - r.getLong(0)) / 8)
  }

  /** Publish the corpus Z-ordered on (doc_id, n_chars) with per-file
    * (min,max) stats for BOTH dimensions in the manifest. The Z value
    * interleaves the bits of each dimension's 16-bucket range index —
    * pure integer shifts/masks, fully inside whole-stage codegen.
    */
  private[graft] def publishZordered(
      spark: SparkSession, docs: DataFrame, root: String): Unit = {
    val out = s"$root/data/snap1"
    val r = docs.agg(min("doc_id"), max("doc_id"), min("n_chars"), max("n_chars")).head()
    val (loI, hiI, loC, hiC) =
      if (r.isNullAt(0)) (0L, 0L, 0L, 0L)
      else (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))
    val wI = (hiI - loI) / 16 + 1
    val wC = (hiC - loC) / 16 + 1
    val z = expr(
      s"""(((doc_id - $loI) div $wI) & 1)
         | | (((n_chars - $loC) div $wC) & 1) << 1
         | | (((doc_id - $loI) div $wI) & 2) << 1
         | | (((n_chars - $loC) div $wC) & 2) << 2
         | | (((doc_id - $loI) div $wI) & 4) << 2
         | | (((n_chars - $loC) div $wC) & 4) << 3
         | | (((doc_id - $loI) div $wI) & 8) << 3
         | | (((n_chars - $loC) div $wC) & 8) << 4""".stripMargin.replace("\n", " "))
    docs.withColumn("zv", z)
      .repartitionByRange(8, col("zv"))
      .sortWithinPartitions("zv")
      .drop("zv")
      .write.mode("overwrite").parquet(out)
    val stats = spark.read.schema(docs.schema).parquet(out)
      .groupBy(input_file_name().as("f"))
      .agg(min("doc_id").as("lo_i"), max("doc_id").as("hi_i"),
        min("n_chars").as("lo_c"), max("n_chars").as("hi_c"))
      .collect()
      .map(r => s"${new java.net.URI(r.getString(0)).getPath}\t${r.getLong(1)}\t${r.getLong(2)}\t${r.getLong(3)}\t${r.getLong(4)}")
      .toIndexedSeq.sorted
    commitManifest(spark, root, 1, stats)
  }

  /** Resolve the 2-D stats manifest and return only files whose zone
    * for dimension `dim` (0 = doc_id, 1 = n_chars) intersects
    * [qlo, qhi].
    */
  private[graft] def pruneFilesDim(
      spark: SparkSession, root: String, dim: Int, qlo: Long, qhi: Long): Seq[String] =
    manifestLines(spark, root).flatMap { line =>
      val parts = line.split('\t')
      val (lo, hi) = (parts(1 + 2 * dim).toLong, parts(2 + 2 * dim).toLong)
      if (lo <= qhi && hi >= qlo) Some(parts(0)) else None
    }

  /** w13: incremental (CDC-style) read — "exactly the rows that landed
    * between snapshot A and snapshot B". Data files are immutable and
    * every manifest is the complete file list of its snapshot, so the
    * increment is a pure manifest set difference — files(B) \ files(A) —
    * resolved from two small manifest reads: no directory listing, no
    * row-level diff, no re-read of old data. At 100 TB this is how
    * every downstream consumer (nightly tokenization, index refresh,
    * stats rollup) keeps up with an append-only table: a catch-up read
    * costs the NEW bytes, never the table size. The operator lands the
    * corpus as snapshot 1 plus two appended batches and reads the
    * 1→3 increment; the rollup must equal exactly the batches' rows.
    */
  def w13IncrementalRead(spark: SparkSession, dir: String): DataFrame = {
    val root = stage(spark, dir, "incr")
    val docs = Tables.documents(spark, dir)
    publishSnapshot(spark, docs.where(col("doc_id") % 3 === 0), root, 1)
    publishBatch(spark, docs.where(col("doc_id") % 3 === 1), root, 1L) // → manifest-2
    publishBatch(spark, docs.where(col("doc_id") % 3 === 2), root, 2L) // → manifest-3
    readIncrement(spark, dir, root, from = 1, to = 3)
      .groupBy("lang")
      .agg(count(lit(1)).as("n_docs"), sum("n_chars").as("sum_chars"))
  }

  /** w19: snapshot rollback — revert the table to an earlier snapshot
    * as a NEW commit (Iceberg `rollback_to_snapshot` semantics): a bad
    * deploy published snapshot 2 dropping two-thirds of the corpus;
    * recovery commits manifest-3 whose file list IS manifest-1's. No
    * data file is written, copied, or deleted — rollback cost is
    * O(manifest) regardless of table size — readers flip atomically on
    * the one manifest rename, history stays intact (the as-of-2 read
    * still serves the bad snapshot for forensics, pinned in the spec),
    * and the rolled-back files become w12's GC feed once the retention
    * horizon passes snapshot 2.
    */
  def w19SnapshotRollback(spark: SparkSession, dir: String): DataFrame = {
    val root = stage(spark, dir, "rollback")
    val docs = Tables.documents(spark, dir)
    publishSnapshot(spark, docs, root, 1)
    publishSnapshot(spark, docs.where(col("doc_id") % 3 === 0), root, 2)
    rollbackTo(spark, root, asOf = 1, next = 3)
    readPublished(spark, dir, root)
      .groupBy("lang")
      .agg(count(lit(1)).as("n_docs"), sum("n_chars").as("sum_chars"))
  }

  /** Commit snapshot `asOf`'s exact file list as manifest `next` —
    * the rollback primitive (metadata-only, one atomic rename).
    */
  private[graft] def rollbackTo(
      spark: SparkSession, root: String, asOf: Int, next: Int): Unit =
    commitManifest(spark, root, next, manifestFilesAt(spark, root, asOf))

  /** w20: ANALYZE TABLE — table statistics collected per data file and
    * committed as a stats sidecar next to the manifest (the
    * Iceberg-puffin shape), then MERGED at read time: row counts add,
    * and per-column NDV comes from per-file KMV sketches (the q36/q38
    * kernel — ≤ K retained hashes per file per column) whose union's
    * K smallest ARE the column's K smallest, so the merged estimate is
    * bit-identical to a direct whole-column sketch. That merge-
    * exactness is the whole point at 100 TB: each file (or each
    * shard's nightly ANALYZE) sketches independently in one scan, and
    * table-level NDV for the optimizer never needs a global distinct —
    * re-ANALYZE after appending a file touches ONE file. Below K
    * distinct the sketch is the exact value set and the NDV is exact
    * (lang/source land here; doc_id exercises the saturated
    * estimator). All integer arithmetic — the estimates reproduce
    * bit-for-bit cross-engine.
    */
  def w20AnalyzeStats(spark: SparkSession, dir: String): DataFrame = {
    val root = stage(spark, dir, "analyze")
    val docs = Tables.documents(spark, dir)
    publishSnapshot(spark, docs, root, 1)
    analyzeSnapshot(spark, dir, root, 1)
    statsMerge(spark, root, 1)
  }

  private[graft] def statsSidecar(root: String, n: Int): String = s"$root/stats-$n"

  private val StatsK = 64
  private val StatsP = 1000000007L

  private def statsRound(c: Column): Column =
    ((c * lit(1000003L) + lit(17L)) % lit(StatsP) * lit(999983L) + lit(7919L)) % lit(StatsP)

  private def statsStrHash(spark: SparkSession, name: String): Column =
    if (spark.catalog.functionExists("graft_polyhash"))
      expr(s"graft_polyhash($name, 17, 31)")
    else
      expr(s"aggregate(split($name, ''), 17L, (b, c) -> (b * 31 + ascii(c)) % $StatsP)")

  /** One scan of snapshot `n`'s files → per-(file, column) stats rows
    * (n_rows + the KMV retained-hash set), written as the snapshot's
    * stats sidecar. Uses the native bounded-state `graft_kmv_set`
    * aggregate when registered; the exact window formulation otherwise
    * (identical retained sets).
    */
  private[graft] def analyzeSnapshot(
      spark: SparkSession, dir: String, root: String, n: Int): Unit = {
    val files = manifestFilesAt(spark, root, n)
    val df = spark.read.schema(Tables.documents(spark, dir).schema)
      .parquet(files: _*)
      .withColumn("file", input_file_name())
    val rows = df.select(col("file"), explode(array(
        struct(lit("doc_id").as("col_name"), statsRound(col("doc_id")).as("hv")),
        struct(lit("lang").as("col_name"),
          statsRound(statsStrHash(spark, "lang")).as("hv")),
        struct(lit("source").as("col_name"),
          statsRound(statsStrHash(spark, "source")).as("hv")))).as("x"))
      .select(col("file"), col("x.col_name").as("col_name"), col("x.hv").as("hv"))
    val perFile =
      if (spark.catalog.functionExists("graft_kmv_set"))
        rows.groupBy("file", "col_name")
          .agg(count(lit(1)).as("n_rows"),
            array_sort(call_function("graft_kmv_set", col("hv"), lit(StatsK))).as("skv"))
      else {
        import org.apache.spark.sql.expressions.Window
        val w = Window.partitionBy("file", "col_name").orderBy("hv")
        val retained = rows.distinct()
          .withColumn("rn", row_number().over(w)).where(col("rn") <= StatsK)
          .groupBy("file", "col_name").agg(array_sort(collect_list("hv")).as("skv"))
        rows.groupBy("file", "col_name").agg(count(lit(1)).as("n_rows"))
          .join(retained, Seq("file", "col_name"))
      }
    perFile.write.mode("overwrite").parquet(statsSidecar(root, n))
  }

  /** Merge the committed per-file stats into table-level statistics —
    * reads ONLY the sidecar (no data file is opened): row counts sum;
    * the per-file retained sets union, and the K smallest of the union
    * give θ and the NDV estimate (exact below K distinct).
    */
  private[graft] def statsMerge(
      spark: SparkSession, root: String, n: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val st = spark.read.parquet(statsSidecar(root, n))
    val totals = st.groupBy("col_name").agg(sum("n_rows").as("n_rows"))
    val hvs = st.select(col("col_name"), explode(col("skv")).as("hv")).distinct()
    val w = Window.partitionBy("col_name").orderBy("hv")
    val agg = hvs.withColumn("rn", row_number().over(w))
      .where(col("rn") <= StatsK)
      .groupBy("col_name")
      .agg(max(when(col("rn") === StatsK, col("hv"))).as("theta"),
        count(lit(1)).as("n_d"))
    totals.join(agg, Seq("col_name"))
      .select(col("col_name"), col("n_rows"),
        when(col("n_d") < StatsK, col("n_d"))
          .otherwise(expr(s"${(StatsK - 1).toLong * StatsP}L div theta")).as("est_ndv"))
  }

  /** w21: named table BRANCHES and tags over the manifest family (the
    * Iceberg ref story): a ref is one tiny file `refs/<name>` holding a
    * committed snapshot number, updated by the same tmp-write + atomic
    * rename as a manifest commit. Branch writes advance ONLY their own
    * ref — `main` keeps serving its pinned snapshot through any number
    * of staging commits (isolation, the WAP pattern generalized to
    * long-lived lines of development), and promoting a branch is a
    * FAST-FORWARD: rewrite main's ref file to the branch's number —
    * O(one rename) regardless of table size, no data or manifest
    * touched (the w19 economics applied to refs). Tags are refs nobody
    * advances: a training run pins `tags/run-2026-08` and reads
    * identical bytes forever.
    *
    * The operator publishes snapshot 1, points `main` and `staging` at
    * it, lands snapshot 2 as a staging-only commit, and returns the
    * per-ref census — main must still roll up to the FULL corpus while
    * staging serves the filtered snapshot 2, which is exactly what the
    * oracle checks. The spec then fast-forwards main and pins the
    * metadata-only promotion.
    */
  def w21TableBranches(spark: SparkSession, dir: String): DataFrame = {
    val root = stage(spark, dir, "branches")
    val docs = Tables.documents(spark, dir)
    publishSnapshot(spark, docs, root, 1)
    setRef(spark, root, "main", 1)
    setRef(spark, root, "staging", 1)
    // the branch commit: snapshot 2's data + manifest land, and ONLY
    // the staging ref advances — main is not touched
    publishSnapshot(spark, docs.where(col("doc_id") % 3 === 0), root, 2)
    setRef(spark, root, "staging", 2)
    def census(ref: String) =
      readRef(spark, dir, root, ref)
        .agg(count(lit(1)).as("n_docs"), sum("n_chars").as("sum_chars"))
        .select(lit(ref).as("ref"), col("n_docs"), col("sum_chars"))
    census("main").unionByName(census("staging"))
  }

  /** w24: SHALLOW CLONE — zero-copy table forking (Delta `CLONE`,
    * Iceberg snapshot-ref forks): because manifests reference immutable
    * data files by absolute path and files are never rewritten in
    * place, cloning a 100 TB table is ONE metadata write — commit the
    * source's current file list as the clone's manifest-1 — after which
    * the two tables evolve independently: the clone's next snapshot
    * lands new files under the CLONE's root and only the clone's
    * manifest advances; the source never observes it. The dev/staging
    * workflow this enables at scale (fork prod, run the risky rewrite,
    * diff, throw away) costs bytes proportional to the DIVERGENCE, not
    * the table.
    *
    * The operator publishes the corpus as the source table, clones it
    * (spec-pinned: zero data files under the clone root at clone time —
    * the clone read is served entirely by source-owned files), then
    * commits a filtered rewrite to the clone only, and returns both
    * tables' censuses: source must still roll up to the full corpus,
    * the clone to the rewrite.
    */
  /** Read the file list of a SPECIFIC committed manifest (manifestLines
    * resolves the latest) — the w25 diff primitive.
    */
  private[graft] def manifestLinesAt(
      spark: SparkSession, root: String, n: Int): Seq[String] = {
    import org.apache.hadoop.fs.{Path => HPath}
    val fs = new HPath(root).getFileSystem(spark.sessionState.newHadoopConf())
    val p = new HPath(root, s"manifest-$n")
    require(fs.exists(p), s"manifest-$n was never committed under $root")
    val in = fs.open(p)
    try scala.io.Source.fromInputStream(in, "UTF-8").getLines()
      .filter(_.nonEmpty).toList
    finally in.close()
  }

  /** w25: SNAPSHOT DIFF — "what did this commit change", answered from
    * manifests alone (Iceberg's snapshot summary / Delta's commit info,
    * the audit primitive behind incremental consumers and debugging
    * "who rewrote my table"): for each consecutive snapshot pair, the
    * files added, removed and kept, computed as set differences of the
    * two file lists — no data file is ever opened. The operator commits
    * an APPEND (snapshot 2 = snapshot 1's files + a new batch: added
    * grows, nothing removed — w13's shape) and then a REWRITE (snapshot
    * 3 = fresh files only: everything prior removed — w11's shape), and
    * must report exactly those shapes from metadata.
    *
    * Scale note: the diff is ∝ manifest length (file count, not bytes)
    * — the same planning cost every table format pays per commit; at
    * millions of files the lists partition by path prefix and the diff
    * becomes an anti-join, same semantics.
    */
  def w25ManifestDiff(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val root = stage(spark, dir, "snapdiff")
    val docs = Tables.documents(spark, dir)
    val m1 = writeSnapshotData(spark,
      docs.where(col("doc_id") % 3 =!= 0).repartition(3), root, 1)
    commitManifest(spark, root, 1, m1)
    val extra = writeSnapshotData(spark,
      docs.where(col("doc_id") % 3 === 0).repartition(2), root, 2)
    commitManifest(spark, root, 2, m1 ++ extra)
    val m3 = writeSnapshotData(spark,
      docs.where(col("doc_id") % 5 === 0).repartition(1), root, 3)
    commitManifest(spark, root, 3, m3)
    val diffs = (1 to 2).map { n =>
      val a = manifestLinesAt(spark, root, n).toSet
      val b = manifestLinesAt(spark, root, n + 1).toSet
      (s"${n}_to_${n + 1}", (b diff a).size.toLong,
        (a diff b).size.toLong, (a intersect b).size.toLong)
    }
    diffs.toDF("step", "n_added", "n_removed", "n_kept")
  }

  def w24ShallowClone(spark: SparkSession, dir: String): DataFrame = {
    val src = stage(spark, dir, "clonesrc")
    val dst = stage(spark, dir, "clonedst")
    val docs = Tables.documents(spark, dir)
    publishSnapshot(spark, docs, src, 1)
    // the clone: the source's file list committed under the clone root
    // — no data bytes move
    commitManifest(spark, dst, 1, manifestLines(spark, src))
    // diverge the CLONE only
    publishSnapshot(spark, docs.where(col("doc_id") % 3 === 0), dst, 2)
    def census(label: String, root: String) =
      readPublished(spark, dir, root)
        .agg(count(lit(1)).as("n_docs"), sum("n_chars").as("sum_chars"))
        .select(lit(label).as("table_ref"), col("n_docs"), col("sum_chars"))
    census("source", src).unionByName(census("clone", dst))
  }

  /** Point ref `name` at committed snapshot `n` (tmp + atomic
    * rename-with-OVERWRITE — the commitManifest primitive applied to a
    * one-line ref file). `FileSystem.rename` refuses an existing
    * destination on most implementations, and delete-then-rename opens
    * a window where a concurrent `refAt` sees "ref does not exist", so
    * the overwrite goes through `FileContext.rename(..., OVERWRITE)`:
    * POSIX-atomic on local/HDFS — a reader sees the old snapshot number
    * or the new one, never an absent ref.
    */
  private[graft] def setRef(
      spark: SparkSession, root: String, name: String, n: Int): Unit = {
    import org.apache.hadoop.fs.{FileContext, Options, Path => HPath}
    val conf = spark.sessionState.newHadoopConf()
    val fs = new HPath(root).getFileSystem(conf)
    val tmp = new HPath(root, s"refs/_tmp_${name.replace('/', '_')}")
    val out = fs.create(tmp, true)
    try out.write(n.toString.getBytes("UTF-8")) finally out.close()
    val dst = new HPath(root, s"refs/$name")
    // FileContext.rename (unlike FileSystem.rename) does not create the
    // destination's parent — ref names may be nested ("tags/x")
    fs.mkdirs(dst.getParent)
    val fc = FileContext.getFileContext(fs.getUri, conf)
    fc.rename(fc.makeQualified(tmp), fc.makeQualified(dst), Options.Rename.OVERWRITE)
  }

  /** The snapshot number ref `name` currently points at. */
  private[graft] def refAt(spark: SparkSession, root: String, name: String): Int = {
    import org.apache.hadoop.fs.{Path => HPath}
    val fs = new HPath(root).getFileSystem(spark.sessionState.newHadoopConf())
    val p = new HPath(root, s"refs/$name")
    if (!fs.exists(p))
      throw new IllegalArgumentException(s"ref $name does not exist under $root")
    val in = fs.open(p)
    try scala.io.Source.fromInputStream(in, "UTF-8").mkString.trim.toInt
    finally in.close()
  }

  /** Read the table AS OF ref `name`'s snapshot. */
  private[graft] def readRef(
      spark: SparkSession, dir: String, root: String, name: String): DataFrame =
    readPublished(spark, dir, root, asOf = Some(refAt(spark, root, name)))

  /** w22: METADATA TABLES — the `table.files` / `table.snapshots`
    * introspection surface a manifest table gives for free (Iceberg's
    * metadata tables, Delta's DESCRIBE DETAIL): per snapshot, the file
    * count from its manifest and the row count from its w20 stats
    * sidecar — answered WITHOUT opening a single data file, which is
    * the whole point when the table is 100 TB and the question is "how
    * big is it / how fragmented is it / what did the last append add".
    * The operator publishes snapshot 1 as 4 range files, appends a
    * 2-file batch as snapshot 2 (manifest 2 = manifest 1's files + the
    * new ones, the w13 append shape), ANALYZEs both, and reads the
    * census from metadata only (spec-pinned: the same census read from
    * a root holding ONLY manifests + sidecars — no data directory —
    * is identical).
    */
  def w22MetadataTables(spark: SparkSession, dir: String): DataFrame = {
    val root = stage(spark, dir, "metatable")
    val docs = Tables.documents(spark, dir)
    publishSnapshot(spark, docs.repartition(4), root, 1)
    analyzeSnapshot(spark, dir, root, 1)
    val newFiles = writeSnapshotData(spark,
      docs.where(col("doc_id") % 3 === 0).repartition(2), root, 2)
    commitManifest(spark, root, 2, manifestFilesAt(spark, root, 1) ++ newFiles)
    analyzeSnapshot(spark, dir, root, 2)
    metadataTable(spark, root, Seq(1, 2))
  }

  /** w23: ORPHAN-file cleanup — Iceberg's `remove_orphan_files` /
    * Delta VACUUM for the manifest table: data files that NO committed
    * manifest references (a writer that crashed after landing its
    * parquet but before its manifest rename, an abandoned `_tmp_`
    * upload) are dead weight a directory listing can't distinguish
    * from live data — except through the manifests, which are the only
    * source of truth. The operator commits snapshots 1 and 2, plants a
    * crashed snapshot-3 write (data files, no manifest) plus a stray
    * `_tmp_` upload, then sweeps: every `part-*.parquet` under the
    * data root that no committed manifest references, and every
    * `_tmp_*` file, is deleted; `_SUCCESS` markers and hidden files
    * are left alone. Readers are untouched by construction — the sweep
    * removes only what no manifest can resolve (spec-pinned: the
    * published read returns identical rows before and after). In
    * production the sweep would also age-gate candidates against a
    * retention window so an in-flight commit's files survive the race;
    * with no concurrent writers here, retention is zero.
    *
    * Scale shape: the candidate list is a file LISTING (namespace
    * metadata, never data bytes) diffed against the manifest union —
    * at 100 TB that is millions of names vs a few manifest reads, a
    * driver-side set difference on strings exactly like the
    * manifest-commit machinery itself; no data file is ever opened.
    */
  def w23OrphanCleanup(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.hadoop.fs.{Path => HPath}
    val root = stage(spark, dir, "orphans")
    val docs = Tables.documents(spark, dir)
    publishSnapshot(spark, docs.repartition(3), root, 1)
    publishSnapshot(spark, docs.where(col("doc_id") % 3 === 0).repartition(2), root, 2)
    // the crashed writer: snapshot 3's data landed, manifest never did
    writeSnapshotData(spark, docs.where(col("doc_id") % 5 === 0).repartition(2), root, 3)
    val fs = new HPath(root).getFileSystem(spark.sessionState.newHadoopConf())
    val stray = new HPath(root, "data/snap1/_tmp_crashed_upload.parquet")
    val out = fs.create(stray, true)
    try out.write("junk".getBytes("UTF-8")) finally out.close()

    val live: Set[String] = fs.globStatus(new HPath(s"$root/manifest-*"))
      .map(_.getPath.getName.stripPrefix("manifest-").toInt).toSeq
      .flatMap(n => manifestFilesAt(spark, root, n)).toSet
    val listed = fs.globStatus(new HPath(s"$root/data/*/*"))
      .map(_.getPath).filterNot(_.getName.startsWith("."))
    val orphans = listed.filter { p =>
      (p.getName.startsWith("part-") && p.getName.endsWith(".parquet") &&
        !live.contains(p.toUri.getPath)) || p.getName.startsWith("_tmp_")
    }
    orphans.foreach(p => fs.delete(p, false))

    val after = readPublished(spark, dir, root).count()
    import spark.implicits._
    Seq(
      ("n_live_files", live.size.toLong),
      ("n_orphans_removed", orphans.length.toLong),
      ("n_rows_after", after)
    ).toDF("metric", "n")
  }

  /** The snapshot census from metadata only: manifest line counts and
    * sidecar row sums — no data file is ever opened.
    */
  private[graft] def metadataTable(
      spark: SparkSession, root: String, snaps: Seq[Int]): DataFrame = {
    import spark.implicits._
    snaps.map { n =>
      val files = manifestFilesAt(spark, root, n)
      val nRows = spark.read.parquet(statsSidecar(root, n))
        .where(col("col_name") === "doc_id")
        .agg(coalesce(sum("n_rows"), lit(0L))).head().getLong(0)
      (n.toLong, files.size.toLong, nRows)
    }.toDF("snapshot", "n_files", "n_rows")
  }

  /** File list of committed manifest `n` (bare-path manifest lines). */
  private[graft] def manifestFilesAt(
      spark: SparkSession, root: String, n: Int): Seq[String] = {
    import org.apache.hadoop.fs.{Path => HPath}
    val fs = new HPath(root).getFileSystem(spark.sessionState.newHadoopConf())
    val m = new HPath(root, s"manifest-$n")
    if (!fs.exists(m))
      throw new IllegalArgumentException(s"snapshot $n was never committed under $root")
    val in = fs.open(m)
    try scala.io.Source.fromInputStream(in, "UTF-8").getLines()
      .filter(_.nonEmpty).toList
    finally in.close()
  }

  /** The rows added between committed snapshots `from` and `to`: read
    * ONLY the files manifest-`to` references and manifest-`from` does
    * not. Append-only histories (publishBatch) make this the exact
    * row-level increment; a compaction inside the window would surface
    * rewritten rows as "new", which is why w11 keeps every superseded
    * manifest — an incremental consumer diffs against the last
    * pre-compaction ancestor it has actually processed.
    */
  private[graft] def readIncrement(
      spark: SparkSession, dir: String, root: String,
      from: Int, to: Int): DataFrame = {
    val before = manifestFilesAt(spark, root, from).toSet
    val fresh = manifestFilesAt(spark, root, to).filterNot(before)
    val schema = Tables.documents(spark, dir).schema
    if (fresh.isEmpty)
      spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)
    else spark.read.schema(schema).parquet(fresh: _*)
  }

  private[graft] def bucketedTable(spark: SparkSession, dir: String): DataFrame = {
    // table name AND stage path keyed by (data dir, application id):
    // the dir hash stops two threads of one session racing across
    // dirs, the appId stops two concurrent SESSIONS over the SAME dir
    // racing on one metastore entry / staging directory
    val table = bucketedTableName(spark.sparkContext.applicationId, dir)
    val out = bucketedStagePath(spark.sparkContext.applicationId, dir)
    spark.sql(s"DROP TABLE IF EXISTS $table")
    Tables.documents(spark, dir)
      .write.mode("overwrite")
      .bucketBy(8, "doc_id").sortBy("doc_id")
      .option("path", out)
      .saveAsTable(table)
    spark.table(table)
  }

  /** w27: compaction PLANNER — the bin-packing step that decides which
    * micro-partitions coalesce into which target file before w11's
    * compaction executes: micro-partitions are (lang, doc_id mod 8)
    * cells with exact char-volume stats (the manifest column-stats
    * proxy — at a real lakehouse the identical plan runs over
    * manifest byte sizes; w11 owns the FS-real rewrite), the target
    * bin volume is ⌈total/4⌉, and assignment is next-fit over
    * (volume DESC, lang, bucket) by exclusive-cumsum division — the
    * deterministic, shuffle-free formulation of greedy packing (a
    * straddling cell spills its bin past target rather than splitting,
    * exactly like file-level OPTIMIZE). Output: one row per planned
    * bin (bin, n_parts, bin_volume, max_part_volume). All integers —
    * no float anywhere.
    *
    * Scale shape: the planning frame is manifest-sized (|langs|·8
    * cells here; |files| at a lakehouse), one map-side stats rollup
    * from the corpus; the global cumsum runs over THAT bounded frame
    * (at true manifest scale: d21's two-level distributed prefix sum),
    * never over rows.
    */
  def w27CompactionPlanner(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val parts = Tables.documents(spark, dir)
      .groupBy(col("lang"), pmod(col("doc_id"), lit(8L)).as("bucket"))
      .agg(sum("n_chars").as("vol"), count(lit(1)).as("n_docs"))
    val total = parts.agg(coalesce(sum("vol"), lit(0L)).as("tv"))
    // greatest(…, 1): an empty corpus plans zero bins, not a ÷0
    val target = total.select(greatest(expr("(tv + 3) div 4"), lit(1L)).as("t"))
    val ordered = parts.crossJoin(broadcast(target))
      .withColumn("cum", coalesce(sum("vol").over(
        Window.orderBy(col("vol").desc, col("lang"), col("bucket"))
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .withColumn("bin", expr("cum div t"))
    ordered.groupBy("bin")
      .agg(count(lit(1)).as("n_parts"), sum("vol").as("bin_volume"),
        max("vol").as("max_part_volume"))
  }

  /** w26's shard count and per-shard Bloom width (2¹⁴ bits / 2 probes
    * per key: at ≤ ~1k keys per shard the false-positive rate is
    * ≈ (2k/m)² ≈ 1.5 % — one wasted shard read per ~70 probes).
    */
  private[graft] val W26Shards = 8
  private[graft] val W26Bits = 1 << 14

  /** w26: Bloom-index data skipping — the complement of w09's min/max
    * zones for HIGH-CARDINALITY point lookups where range stats are
    * useless (the key is a content fingerprint, uncorrelated with any
    * sort order): the corpus lands hash-sharded on doc_id, each shard
    * gets a Bloom sidecar over its fingerprint column (md5(text) —
    * the Delta/Iceberg bloom-filter-index shape), and a point lookup
    * probes the sidecars first, reading ONLY the shards whose filter
    * admits the key. False positives cost a wasted shard scan; false
    * negatives are impossible, so the exact fp equality filter on the
    * survivors returns the complete answer. Output: every corpus row
    * whose fingerprint matches a probe (the probe panel = fingerprints
    * of the doc_id % 97 == 0 docs — lookups-by-content, including
    * duplicate texts under OTHER ids, which is the point of looking
    * up by fingerprint).
    *
    * Scale shape: the sidecar build is one map-side-combining
    * distinct over (shard, bit-position) — bounded by
    * min(2·keys, shards·m) rows, collected like w09's per-FILE
    * manifest stats. Probing is INVERTED relative to the sidecar's
    * size asymmetry: the panel (which grows with the corpus) stays a
    * distributed frame, the bounded sidecar bitsets are broadcast to
    * it, admission is an executor-side bit test, and the final exact
    * filter is a semi-join of the admitted shard scan against the
    * distributed panel. Only the admitted SHARD IDS (≤ W26Shards; at
    * a lakehouse ≤ |manifest|) ever reach the driver — needed to
    * enumerate the scan paths, same mechanics as file pruning.
    */
  def w26BloomSkipping(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
      .withColumn("fp", md5(col("text")))
    val schema = docs.schema // shard dirs read directly: no partition col
    // an empty corpus writes no partition dirs at all — nothing to
    // index, nothing to probe; return the empty lookup frame
    if (docs.head(1).isEmpty)
      return spark.createDataFrame(
          spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)
        .select(col("fp"), col("doc_id"), col("lang"), col("n_chars"))
    val (out, sidecar) = w26Index(spark, dir, docs)
    // the shard id list is the ONLY thing that reaches the driver from
    // the probe side — bounded by W26Shards (at a lakehouse: by the
    // manifest), never by the panel
    val admitted = w26Admission(w26Probes(docs), sidecar)
      .select("shard").distinct().collect().map(_.getInt(0)).sorted
    if (admitted.isEmpty)
      spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
          schema)
        .select(col("fp"), col("doc_id"), col("lang"), col("n_chars"))
    else
      spark.read.schema(schema)
        .parquet(admitted.map(s => s"$out/shard=$s").toIndexedSeq: _*)
        .join(w26Probes(docs).select("fp"), Seq("fp"), "left_semi")
        .select(col("fp"), col("doc_id"), col("lang"), col("n_chars"))
  }

  /** w26's index build, shared with the spec census: stages the corpus
    * hash-sharded on doc_id and assembles the per-shard Bloom sidecar
    * as a W26Shards-row frame (shard, words: array of W26Bits/64
    * longs). The sidecar is the only collected object anywhere in the
    * w26 path, and it is bounded BY CONSTRUCTION (shards × 2 KiB) —
    * the r10 verdict's scale flag was the inverse shape, a probe panel
    * that grew with the corpus landing on the driver.
    */
  private[graft] def w26Index(
      spark: SparkSession, dir: String,
      docsWithFp: DataFrame): (String, DataFrame) = {
    val root = stage(spark, dir, "bloomidx")
    val out = s"$root/data"
    docsWithFp.withColumn("shard", pmod(xxhash64(col("doc_id")), lit(W26Shards)))
      .write.mode("overwrite").partitionBy("shard").parquet(out)
    // distinct (shard, position) pairs: map-side-combining, bounded by
    // min(2·keys, shards·W26Bits) rows; folded into bitset words
    val words = scala.collection.mutable.Map.empty[Int, Array[Long]]
    spark.read.parquet(out)
      .select(col("shard").cast("int").as("shard"),
        explode(array(
          pmod(xxhash64(col("fp")), lit(W26Bits.toLong)),
          pmod(xxhash64(col("fp"), lit(1)), lit(W26Bits.toLong)))).as("p"))
      .distinct().collect().foreach { r =>
        val w = words.getOrElseUpdate(r.getInt(0), new Array[Long](W26Bits / 64))
        val p = r.getLong(1).toInt
        w(p / 64) |= (1L << (p % 64))
      }
    import spark.implicits._
    val sidecar = words.toSeq.map { case (s, w) => (s, w.toSeq) }
      .toDF("shard", "words")
    (out, sidecar)
  }

  /** The probe panel as a DataFrame — fingerprints of the
    * doc_id % 97 == 0 docs with their two Bloom bit positions,
    * computed by the SAME expressions the sidecar build uses. Stays
    * distributed end to end: the panel grows with the corpus.
    */
  private[graft] def w26Probes(docsWithFp: DataFrame): DataFrame =
    docsWithFp.where(col("doc_id") % 97 === 0)
      .select(col("fp"),
        pmod(xxhash64(col("fp")), lit(W26Bits.toLong)).as("p1"),
        pmod(xxhash64(col("fp"), lit(1)), lit(W26Bits.toLong)).as("p2"))
      .distinct()

  /** Distributed probe admission: every (fp, shard) pair whose Bloom
    * test passes both bits — the tiny sidecar is broadcast to the
    * probes (the r10-verdict inversion), each probe tests
    * element_at(words, p/64) bits in place, and no probe row ever
    * leaves the executors. shiftright is arithmetic but (w >> n) & 1
    * extracts any bit 0..63 correctly regardless of sign.
    */
  private[graft] def w26Admission(
      probes: DataFrame, sidecar: DataFrame): DataFrame =
    probes.crossJoin(broadcast(sidecar))
      .where(
        expr(s"(shiftright(element_at(words, cast(p1 div 64 as int) + 1), " +
          s"cast(p1 % 64 as int)) & 1) = 1") &&
        expr(s"(shiftright(element_at(words, cast(p2 div 64 as int) + 1), " +
          s"cast(p2 % 64 as int)) & 1) = 1"))
      .select(col("fp"), col("shard"))

  /** The admitted-shard census for the skipping spec: per probe
    * fingerprint, which shards its Bloom test admits — must always
    * contain the key's true shard and, for the panel overall, skip
    * at least one shard (the demonstration that the sidecar prunes).
    * Spec-side diagnostic: the collected maps are bounded by the SPEC
    * corpus; the operator itself ([[w26BloomSkipping]]) collects only
    * shard ids.
    */
  private[graft] def w26AdmittedShards(
      spark: SparkSession, dir: String): (Map[String, Seq[Int]], Map[String, Seq[Int]]) = {
    val docs = Tables.documents(spark, dir)
      .withColumn("fp", md5(col("text")))
    val (_, sidecar) = w26Index(spark, dir, docs)
    val perProbe = w26Admission(w26Probes(docs), sidecar)
      .collect().map(r => (r.getString(0), r.getInt(1)))
      .groupBy(_._1)
      .map { case (fp, g) => fp -> g.map(_._2).distinct.sorted.toSeq }
    val trueShards = docs
      .withColumn("shard", pmod(xxhash64(col("doc_id")), lit(W26Shards)))
      .join(docs.where(col("doc_id") % 97 === 0).select(col("fp")).distinct(),
        Seq("fp"))
      .select(col("fp"), col("shard").cast("int"))
      .collect().map(r => (r.getString(0), r.getInt(1)))
      .groupBy(_._1)
      .map { case (fp, g) => fp -> g.map(_._2).distinct.sorted.toSeq }
    (perProbe, trueShards)
  }
}
