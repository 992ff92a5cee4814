package graft

import org.apache.spark.sql.functions._

import graft.dedup.Dedup
import graft.sim.Sim
import graft.text.Text
import graft.multimodal.Multimodal

/** Specs for the text / dedup / similarity / multimodal packs on the
  * sf0.001 testdata.
  */
class TextDedupSimSpec extends SparkSpec {

  test("d05 fingerprint: equal text ⇒ equal hash, whitespace-normalized") {
    import spark.implicits._
    val df = Seq(
      (1L, "the quick brown fox"),
      (2L, "the quick  brown   fox"), // extra whitespace — same tokens
      (3L, "the quick brown dog")
    ).toDF("doc_id", "text")
    val fps = df.select(Text.fingerprint(col("text"))).collect().map(_.getLong(0))
    assert(fps(0) == fps(1))
    assert(fps(0) != fps(2))
  }

  test("d04 lang id predicts 'en' for English stopword text") {
    import spark.implicits._
    val toks = Text.wsTokens(lower(col("text")))
    val df = Seq((1L, "the cat is in the hat and it is a cat")).toDF("doc_id", "text")
    val hits = df.select(size(filter(toks, t => t.isin(Text.StopEn: _*)))).head().getInt(0)
    assert(hits >= 5)
    val pred = Text.d04LangId(spark, sfDir)
    assert(pred.count() > 0)
    assert(pred.select("lang_pred").distinct().collect().map(_.getString(0)).forall(
      l => Set("en", "es", "de", "fr", "zh", "und").contains(l)))
  }

  test("d01 exact dedup finds a manufactured duplicate") {
    import spark.implicits._
    val docs = graft.Tables.documents(spark, sfDir)
    val dup = docs.limit(10).withColumn("doc_id", col("doc_id") + 5000L)
    val corpus = docs.unionByName(dup)
    val groups = corpus.groupBy(md5(col("text")).as("h"))
      .agg(count(lit(1)).as("n"), min("doc_id").as("keep"))
    assert(groups.where(col("n") >= 2).count() == 10)
    // kept id is always the original (smaller) one
    assert(groups.where(col("n") >= 2).where(col("keep") >= 5000L).count() == 0)
  }

  test("d06 MinHash LSH finds the truncated near-duplicates") {
    val pairs = Dedup.d06MinHashLsh(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(pairs.nonEmpty)
    // the corpus pairs each doc with its 3-token-truncated twin at id+1e6:
    // most candidates must be exactly those (some short docs drop out)
    val planted = pairs.count { case (a, b) => b == a + 1000000L }
    assert(planted >= pairs.length / 2, s"planted=$planted of ${pairs.length}")
  }

  test("d07 SimHash: identical docs have hamming 0, truncated twins small hamming") {
    val pairs = Dedup.d07SimHash(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    assert(pairs.nonEmpty)
    assert(pairs.forall(_._3 <= 6))
    assert(pairs.exists { case (a, b, _) => b == a + 1000000L })
  }

  test("d08 n-gram Jaccard verification keeps only high-overlap pairs") {
    val rows = Dedup.d08NgramJaccard(spark, sfDir).collect()
    assert(rows.nonEmpty)
    assert(rows.forall(_.getDouble(2) >= 0.6))
  }

  test("d13 stratified sample hits the per-language fractions approximately") {
    val totals = graft.Tables.documents(spark, sfDir)
      .groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val sampled = graft.text.Text.d13StratifiedSample(spark, sfDir).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val fractions = Map("en" -> 0.5, "es" -> 0.3, "de" -> 0.3, "fr" -> 0.3, "zh" -> 0.1)
    fractions.foreach { case (lang, f) =>
      val expect = totals(lang) * f
      val got = sampled.getOrElse(lang, 0L).toDouble
      // Bernoulli: allow ±4 sigma
      val sigma = math.sqrt(totals(lang) * f * (1 - f))
      assert(math.abs(got - expect) <= 4 * sigma + 1,
        s"$lang: got $got expect ~$expect (±${4 * sigma})")
    }
  }

  test("d14 decontamination flags only non-benchmark docs, every hit has overlap") {
    val out = graft.text.Corpus.d14Decontaminate(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    // every flagged doc carries at least one overlapping 5-gram
    assert(out.forall(_._2 >= 1))
    // no benchmark doc may appear in the output (same hash split as the operator)
    val P = 1000000007L
    def isBench(id: Long) = ((id % P) * 777000037L % P + 4242L) % P < 20000000L
    assert(out.forall { case (id, _) => !isBench(id) })
  }

  test("d15 repetition stats match a local recomputation for one document") {
    val out = graft.text.Corpus.d15Repetition(spark, sfDir)
      .where(col("doc_id") === 0L).collect()
    assert(out.length == 1)
    val row = out.head
    val text = graft.Tables.documents(spark, sfDir)
      .where(col("doc_id") === 0L).select("text").head().getString(0)
    val toks = text.trim.toLowerCase.split("\\s+")
    assert(row.getLong(1) == toks.length)
    assert(math.abs(row.getDouble(2) - toks.map(_.length).sum.toDouble / toks.length) < 1e-12)
    val bigrams = toks.sliding(2).map(_.mkString(" ")).toSeq
    val topFrac = bigrams.groupBy(identity).values.map(_.size).max.toDouble / bigrams.size
    assert(math.abs(row.getDouble(3) - topFrac) < 1e-12)
  }

  test("d16 PII scrub redacts emails, IPs, and phone-shaped numbers") {
    import spark.implicits._
    import graft.text.Corpus._
    val df = Seq((1L, "mail me at jo.doe+x@test-site.org or 10.0.0.1 or 555-123-4567 ok"))
      .toDF("doc_id", "text")
    val scrubbed = df.select(
      regexp_replace(regexp_replace(regexp_replace(col("text"),
        EmailRe, "[EMAIL]"), Ipv4Re, "[IP]"), PhoneRe, "[PHONE]"))
      .head().getString(0)
    assert(scrubbed == "mail me at [EMAIL] or [IP] or [PHONE] ok", scrubbed)
    // corpus run: row-preserving, counts non-negative
    val out = graft.text.Corpus.d16PiiScrub(spark, sfDir)
    assert(out.count() == graft.Tables.documents(spark, sfDir).count())
  }

  test("d11 dup clusters: planted twins land in one cluster keyed by min doc_id") {
    val clusters = Dedup.d11DupClusters(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(clusters.nonEmpty)
    // cluster ids are original doc ids (< 1e6): every cluster of a
    // (doc, truncated-twin) pair is keyed by the original
    assert(clusters.count(_._1 < 1000000L) == clusters.length)
    assert(clusters.forall(_._2 >= 2))
    // determinism across runs
    val again = Dedup.d11DupClusters(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(clusters.sorted.toSeq == again.sorted.toSeq)
  }

  test("LSH stop-bucket cap bounds boilerplate skew (no quadratic bucket)") {
    import spark.implicits._
    // 300 byte-identical boilerplate docs (web-scale reality) + 20 unique
    val boiler = (0 until 300).map(i =>
      (i.toLong, "terms of service all rights reserved contact us about privacy policy"))
    val unique = (0 until 20).map(i =>
      (1000L + i, s"unique document body number $i with distinct content tokens alpha$i beta$i gamma$i"))
    val corpus = (boiler ++ unique).toDF("doc_id", "text")
    val pairs = Dedup.lshCandidates(Dedup.signatureTable(corpus))
      .select("doc_a", "doc_b").collect().map(r => (r.getLong(0), r.getLong(1)))
    // identical docs share every band -> one bucket of 300 > MaxBucket,
    // dropped from candidate generation: the 300² self-join never happens
    // (exact duplicates are d01's job — one hash groupBy, no pairs)
    assert(!pairs.exists { case (a, b) => a < 300 && b < 300 },
      s"boilerplate bucket leaked ${pairs.count { case (a, b) => a < 300 && b < 300 }} pairs")
  }

  test("e01 cosine top-k: 10 neighbors per query, cosine in [-1,1]") {
    val rows = Sim.e01KnnCosine(spark, sfDir).collect()
    val byQuery = rows.groupBy(_.getLong(0))
    assert(byQuery.size == 20)
    assert(byQuery.values.forall(_.length == 10))
    assert(rows.forall(r => math.abs(r.getDouble(2)) <= 1.0 + 1e-12))
  }

  test("e02 ANN recalls mostly-correct neighbors from its own buckets") {
    val ann = Sim.e02AnnLsh(spark, sfDir).collect()
    assert(ann.nonEmpty)
    // every ANN hit's cosine must match e01's exact cosine for that pair
    val exactTop = Sim.e01KnnCosine(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    val agree = ann.count(r => exactTop.get((r.getLong(0), r.getLong(1)))
      .exists(c => math.abs(c - r.getDouble(2)) < 1e-9))
    assert(agree > 0)
    // multi-probe recall@10 over the query set: well above single-bucket
    val recall = agree.toDouble / exactTop.size
    assert(recall >= 0.15, s"recall@10 = $recall")
  }

  test("e04 IVF ANN: probed-list hits carry exact cosines, decent recall@10") {
    val ivf = Sim.e04AnnIvf(spark, sfDir).collect()
    assert(ivf.nonEmpty)
    val byQuery = ivf.groupBy(_.getLong(0))
    assert(byQuery.values.forall(_.length <= 10))
    val exact = Sim.e01KnnCosine(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    // every IVF hit that is also in the exact top-10 must agree on cosine
    val overlap = ivf.filter(r => exact.contains((r.getLong(0), r.getLong(1))))
    assert(overlap.nonEmpty)
    assert(overlap.forall(r => math.abs(exact((r.getLong(0), r.getLong(1))) - r.getDouble(2)) < 1e-9))
    // recall@10 over the 20 queries should be well above random
    val recall = overlap.length.toDouble / exact.size
    assert(recall >= 0.2, s"recall@10 = $recall")
  }

  test("e04 with the KMeans quantizer (conf toggle) keeps exact cosines and recall") {
    spark.conf.set("spark.graft.ivf.quantizer", "kmeans")
    try {
      val ivf = Sim.e04AnnIvf(spark, sfDir).collect()
      assert(ivf.nonEmpty)
      val exact = Sim.e01KnnCosine(spark, sfDir).collect()
        .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
      val overlap = ivf.filter(r => exact.contains((r.getLong(0), r.getLong(1))))
      assert(overlap.nonEmpty)
      assert(overlap.forall(r =>
        math.abs(exact((r.getLong(0), r.getLong(1))) - r.getDouble(2)) < 1e-9))
      assert(overlap.length.toDouble / exact.size >= 0.2)
    } finally spark.conf.unset("spark.graft.ivf.quantizer")
  }

  test("d11 with a reliable checkpoint dir (conf toggle) yields identical clusters") {
    val base = Dedup.d11DupClusters(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
    val dir = java.nio.file.Files.createTempDirectory("graft_cc_ck").toString
    spark.conf.set("spark.graft.cc.checkpointDir", dir)
    try {
      val ck = Dedup.d11DupClusters(spark, sfDir).collect()
        .map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
      assert(ck == base)
    } finally spark.conf.unset("spark.graft.cc.checkpointDir")
  }

  test("e03 embedding dedup finds every perturbed twin pair") {
    val pairs = Sim.e03EmbedDedup(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val n = graft.Tables.embeddings(spark, sfDir).count()
    val planted = pairs.count { case (a, b) => b == a + 100000L }
    // perturbation preserves hyperplane signs for most vectors; expect
    // the vast majority of the n planted twins to be found
    assert(planted >= (n * 0.9).toInt, s"planted=$planted of $n")
  }

  test("m01 multimodal decode is deterministic and row-preserving") {
    val out = Multimodal.m01Multimodal(spark, sfDir)
    val n = graft.Tables.documents(spark, sfDir).count()
    assert(out.count() == n)
    val a = out.orderBy("doc_id").collect().map(r => (r.getLong(0), r.getLong(3)))
    val b = Multimodal.m01Multimodal(spark, sfDir)
      .orderBy("doc_id").collect().map(r => (r.getLong(0), r.getLong(3)))
    assert(a.toSeq == b.toSeq)
    // stub decode matches the hand-computed fold:
    // "abc" = [97,98,99]; ((17*31+97)*31+98)*31+99 = 602801 (< mod)
    val (checksum, feat) = Multimodal.stubDecode("abc".getBytes("UTF-8"))
    assert(checksum == 602801L)
    assert(feat.length == 8)
    assert(feat(0) == 97.0 / 255.0 && feat(1) == 98.0 / 255.0 && feat(2) == 99.0 / 255.0)
    assert(feat(3) == 0.0)
  }

  test("m01 PPM decode extracts real image features; non-image payloads take the stub path") {
    // 2×2 P6 image, maxval 255, with a header comment: pixels
    // (255,0,0) (0,255,0) / (0,0,255) (255,255,255)
    val header = "P6\n# test image\n2 2\n255\n".getBytes("US-ASCII")
    val raster = Array[Int](
      255, 0, 0, 0, 255, 0,
      0, 0, 255, 255, 255, 255).map(_.toByte)
    val ppm = header ++ raster
    val feat = Multimodal.decodePpm(ppm).get
    // channel means: R = (255+0+0+255)/4, G = (0+255+0+255)/4, B = (0+0+255+255)/4
    assert(feat(0) == 510.0 / (255.0 * 4) && feat(1) == 510.0 / (255.0 * 4) &&
      feat(2) == 510.0 / (255.0 * 4))
    // luminance (×1000 fixed-point): 299·255, 587·255, 114·255, 1000·255
    val lumas = Seq(299L * 255, 587L * 255, 114L * 255, 1000L * 255)
    assert(feat(3) == lumas.sum.toDouble / 4 / (1000.0 * 255.0))
    assert(feat(5) == 0.25) // only the blue pixel is below 64/255
    assert(feat(6) == 0.25) // only the white pixel is at/above 192/255
    assert(feat(7) == 1.0)  // square
    // decode() dispatches: the PPM gets the real features...
    assert(Multimodal.decode(ppm)._2.toSeq == feat.toSeq)
    // ...while a truncated PPM (bad raster length) and plain text fall
    // back to the stub, and the checksum is the same either way
    assert(Multimodal.decodePpm(ppm.dropRight(1)).isEmpty)
    val txt = "P6 but not an image".getBytes("US-ASCII")
    val (ck, stubFeat) = Multimodal.stubDecode(txt)
    val (dck, dfeat) = Multimodal.decode(txt)
    assert(dck == ck && dfeat.toSeq == stubFeat.toSeq)
    // end-to-end through the Spark pipeline shape: a one-row media
    // frame with the PPM payload produces the real features
    import spark.implicits._
    val media = Seq(Multimodal.MediaRow(1L, ppm, "image/x-portable-pixmap", ppm.length.toLong))
      .toDS().toDF()
    val row = Multimodal.decodeFrame(media).head()
    assert(row.getAs[Double]("feat_5") == 0.25 && row.getAs[Double]("feat_7") == 1.0)
  }

  test("m01 BMP decode matches the PPM features for the same image") {
    // the same 2×2 image as the PPM test, as an uncompressed 24-bit
    // BMP (bottom-up BGR rows padded to 4 bytes): identical integer
    // histograms → bit-identical features
    def le16(v: Int) = Array[Byte](v.toByte, (v >> 8).toByte)
    def le32(v: Int) = Array[Byte](v.toByte, (v >> 8).toByte, (v >> 16).toByte, (v >> 24).toByte)
    val rowSize = 8 // 2 pixels × 3 bytes, padded to 4
    val header =
      Array[Byte]('B', 'M') ++ le32(54 + rowSize * 2) ++ le32(0) ++ le32(54) ++
        le32(40) ++ le32(2) ++ le32(2) ++ le16(1) ++ le16(24) ++ le32(0) ++
        le32(rowSize * 2) ++ le32(0) ++ le32(0) ++ le32(0) ++ le32(0)
    // bottom row first: (0,0,255) (255,255,255); top row: (255,0,0) (0,255,0)
    val raster = Array[Int](
      255, 0, 0, 255, 255, 255, 0, 0, // BGR BGR + 2 pad
      0, 0, 255, 0, 255, 0, 0, 0).map(_.toByte)
    val bmp = header ++ raster
    assert(header.length == 54)
    val ppm = "P6\n2 2\n255\n".getBytes("US-ASCII") ++ Array[Int](
      255, 0, 0, 0, 255, 0, 0, 0, 255, 255, 255, 255).map(_.toByte)
    val bmpFeat = Multimodal.decodeBmp(bmp).get
    val ppmFeat = Multimodal.decodePpm(ppm).get
    assert(bmpFeat.toSeq == ppmFeat.toSeq)
    // dispatch picks the real decoder; truncated raster falls back
    assert(Multimodal.decode(bmp)._2.toSeq == bmpFeat.toSeq)
    assert(Multimodal.decodeBmp(bmp.dropRight(1)).isEmpty)
  }

  test("m01 JPEG/PNG decode via javax.imageio matches the raster features") {
    import java.awt.image.BufferedImage
    import java.io.ByteArrayOutputStream
    import javax.imageio.ImageIO
    // the same 2×2 image as the PPM/BMP tests
    val img = new BufferedImage(2, 2, BufferedImage.TYPE_INT_RGB)
    img.setRGB(0, 0, 0xff0000); img.setRGB(1, 0, 0x00ff00)
    img.setRGB(0, 1, 0x0000ff); img.setRGB(1, 1, 0xffffff)
    def encode(fmt: String): Array[Byte] = {
      val bos = new ByteArrayOutputStream()
      assert(ImageIO.write(img, fmt, bos), s"no $fmt writer in this JVM")
      bos.toByteArray
    }
    val png = encode("png")
    val jpg = encode("jpg")
    val ppm = "P6\n2 2\n255\n".getBytes("US-ASCII") ++ Array[Int](
      255, 0, 0, 0, 255, 0, 0, 0, 255, 255, 255, 255).map(_.toByte)
    val ref = Multimodal.decodePpm(ppm).get
    // PNG is lossless: bit-identical features to the raster reference
    val pngFeat = Multimodal.decodeImageIo(png).get
    assert(pngFeat.toSeq == ref.toSeq)
    // JPEG is lossy: same structure, means within codec tolerance
    val jpgFeat = Multimodal.decodeImageIo(jpg).get
    assert(jpgFeat(7) == 1.0) // aspect ratio survives exactly
    (0 to 3).foreach(i => assert(math.abs(jpgFeat(i) - ref(i)) < 0.15,
      s"feat_$i ${jpgFeat(i)} vs ${ref(i)}"))
    // dispatch picks the real decoder for both; corrupt streams fall
    // back to the stub instead of throwing
    assert(Multimodal.decode(png)._2.toSeq == pngFeat.toSeq)
    assert(Multimodal.decode(jpg)._2.toSeq == jpgFeat.toSeq)
    assert(Multimodal.decodeImageIo(png.take(20)).isEmpty)
    assert(Multimodal.decodeImageIo("plain text".getBytes("US-ASCII")).isEmpty)
    // end-to-end through the Spark decode stage
    import spark.implicits._
    val media = Seq(
      Multimodal.MediaRow(1L, png, "image/png", png.length.toLong),
      Multimodal.MediaRow(2L, jpg, "image/jpeg", jpg.length.toLong)).toDS().toDF()
    val rows = Multimodal.decodeFrame(media).orderBy("doc_id").collect()
    assert(rows(0).getAs[Double]("feat_7") == 1.0 && rows(1).getAs[Double]("feat_7") == 1.0)
    assert(rows(0).getAs[Double]("feat_5") == 0.25) // PNG: exactly the blue pixel is dark
  }

  test("s05 streaming near-dup emits exactly the batch d06 pair set") {
    val stream = graft.streaming.Streams.s05StreamNearDup(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).sortBy(identity).toSeq
    val batch = Dedup.d06MinHashLsh(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).sortBy(identity).toSeq
    assert(stream.nonEmpty)
    assert(stream == batch)
  }

  test("s02 stateful sessionization agrees with the batch q17 oracle") {
    val stream = graft.streaming.Streams.s02StreamStateful(spark, sfDir)
      .select("user_id", "session_id", "n_events").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sortBy(identity).toSeq
    val batch = graft.queries.Events.q17Sessionize(spark, sfDir)
      .select("user_id", "session_id", "n_events").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sortBy(identity).toSeq
    assert(stream == batch)
  }
}
