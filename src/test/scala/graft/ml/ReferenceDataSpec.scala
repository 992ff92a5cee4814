package graft.ml

import org.apache.spark.ml.feature.VectorAssembler
import org.apache.spark.ml.linalg.{Vector, Vectors}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Parity runs on the reference's own test datasets (reference
  * ReliefSelectorSuite.scala:25-39 lung, :42-53 colon): same params
  * (numTopFeatures=10, discreteData=true, estimationRatio=1.0,
  * seed=123456789, +2 pad).
  *
  * Our selections deliberately deviate from the reference's published
  * lists in three documented ways (per-class neighborhoods, clean
  * joint votes, partition-invariant randomness), so each assertion
  * pins the shared feature core plus full determinism — including
  * under re-partitioning, which the reference's own selection is NOT
  * stable under.
  */
class ReferenceDataSpec extends SparkSpec {

  /** Reference TestHelper path: CSV → cast double → assemble → +2 pad. */
  private def loadReferenceCsv(name: String): DataFrame = {
    val df = spark.read.option("header", "true").option("inferSchema", "true")
      .csv(s"/root/reference/src/test/resources/data/$name")
    val featCols = df.columns.drop(1)
    val assembled = new VectorAssembler().setInputCols(featCols).setOutputCol("raw")
      .transform(df.select(col("class").cast("double").as("label") +:
        featCols.map(c => col(c).cast("double").as(c)): _*))
    import spark.implicits._
    assembled.select(col("label"), col("raw")).rdd
      .map(r => (r.getDouble(0), Vectors.dense(r.getAs[Vector](1).toArray.map(_ + 2))))
      .toDF("label", "features")
  }

  private def fit(df: DataFrame): ReliefFRSelectorModel =
    new ReliefFRSelector()
      .setInputCol("features").setLabelCol("label").setOutputCol("out")
      .setNumTopFeatures(10).setNumNeighbors(10)
      .setEstimationRatio(1.0).setBatchSize(0.25)
      .setDiscreteData(true).setSeed(123456789L)
      .fit(df)

  test("lung: reference-params run selects the shared feature core, invariant to partitioning") {
    val df = loadReferenceCsv("test_lung_s3.csv")
    val m = fit(df)
    assert(m.stdSelection.length == 10)
    // reference's published lung selection: {29,223,10,19,172,55,183,23,35,56};
    // features both engines agree on for this data (observed stable core)
    val sharedCore = Set(29, 10, 19, 23, 35)
    assert(sharedCore.subsetOf(m.stdSelection.toSet),
      s"shared core missing from ${m.stdSelection.mkString(",")}")
    // partition invariance: identical result on a different layout
    val m2 = fit(df.repartition(3))
    assert(m2.stdSelection.toSeq == m.stdSelection.toSeq)
    val m3 = fit(df.coalesce(1))
    assert(m3.stdSelection.toSeq == m.stdSelection.toSeq)
    // the EXPLAINED delta (SURVEY §13.3): the 5 reference picks we
    // don't select are not "lost" — they sit just below our top-10
    // boundary. Under per-class neighborhoods (the documented
    // semantics; the reference's single global top-(k·nClasses) queue
    // starves miss groups when classes separate well) the miss-group
    // contributions differ, which nudges near-boundary features across
    // the cut. Pin the quantified claim: every reference-published
    // feature ranks within our top 12% (top 40 of 325) — ordering
    // noise at the boundary, not disagreement about what is relevant.
    val rankOf = m.featureWeights.zipWithIndex
      .sortBy { case (w, f) => (-w, f) }.zipWithIndex
      .map { case ((_, f), r) => f -> (r + 1) }.toMap
    val refPublished = Seq(29, 223, 10, 19, 172, 55, 183, 23, 35, 56)
    val ranks = refPublished.map(f => f -> rankOf(f))
    info(s"reference lung picks → our ranks: ${ranks.mkString(", ")}")
    assert(ranks.forall(_._2 <= 40),
      s"a reference pick fell far outside our ranking: ${ranks.mkString(", ")}")
  }

  test("libsvm input path: the reference's sparse-data entry point works end-to-end") {
    // the reference README's other input format (spark.read.format("libsvm"));
    // verifies the estimator consumes MLlib's libsvm-sourced frame as-is
    val f = java.nio.file.Files.createTempFile("graft_libsvm", ".txt")
    val rnd = new scala.util.Random(3)
    val lines = (0 until 120).map { i =>
      val label = i % 2
      val f1 = (if (label == 0) 1.0 else 3.0) + rnd.nextGaussian() * 0.2
      // f3 sporadic noise; f5 always present noise
      val noise = if (rnd.nextDouble() < 0.4) f" 3:${rnd.nextDouble()}%.4f" else ""
      f"$label 1:$f1%.4f$noise 5:${rnd.nextDouble()}%.4f"
    }
    java.nio.file.Files.write(f, String.join("\n", lines: _*).getBytes)
    val df = spark.read.format("libsvm").option("numFeatures", "6").load(f.toString)
    val m = new ReliefFRSelector()
      .setInputCol("features").setLabelCol("label").setOutputCol("out")
      .setNumTopFeatures(2).setNumNeighbors(5)
      .setEstimationRatio(0.5).setBatchSize(0.5).setSeed(7L)
      .fit(df)
    assert(m.stdSelection.contains(0),
      s"libsvm informative feature not recovered: ${m.stdSelection.mkString(",")}")
    val out = m.transform(df)
    assert(out.count() == 120)
    java.nio.file.Files.delete(f)
  }

  test("nci9: highest-dim reference dataset fits deterministically, invariant to partitioning") {
    // test_nci9_s3.csv ships with the reference suite (60×9712, 9-class
    // discrete — its highest-dimensional dataset; no published
    // selection to compare against). Pins: the full frozen selection
    // (the fit is a pure function of (seed, content)) and invariance
    // under re-partitioning — the properties the content-hash row
    // identity exists to provide, at 5× colon's dimensionality.
    val df = loadReferenceCsv("test_nci9_s3.csv")
    val m = fit(df)
    assert(m.stdSelection.toSeq ==
      Seq(6290, 443, 1915, 9575, 9587, 8362, 4937, 6933, 9576, 7811),
      s"selection drifted: ${m.stdSelection.mkString(",")}")
    val m2 = fit(df.repartition(3))
    assert(m2.stdSelection.toSeq == m.stdSelection.toSeq)
    val m3 = fit(df.coalesce(1))
    assert(m3.stdSelection.toSeq == m.stdSelection.toSeq)
  }

  test("lymphoma and leukemia: remaining reference datasets fit deterministically") {
    // the last two datasets shipped with the reference suite (no
    // published selections, like nci9): pin the frozen deterministic
    // selection and partition invariance. lymphoma 96×4026 (9-class),
    // leukemia 72×7129 (binary) — together with lung/colon/nci9 every
    // reference-suite dataset now has a parity pin.
    val expected = Map(
      "test_lymphoma_s3.csv" ->
        Seq(3783, 3782, 3753, 3762, 3804, 3785, 3803, 3774, 3792, 3794),
      "test_leukemia_s3.csv" ->
        Seq(3192, 4787, 4136, 5981, 1960, 2228, 1719, 2582, 6141, 6795))
    for ((name, exp) <- expected) {
      val df = loadReferenceCsv(name)
      val m = fit(df)
      assert(m.stdSelection.toSeq == exp,
        s"$name selection drifted: ${m.stdSelection.mkString(",")}")
      val m2 = fit(df.repartition(3))
      assert(m2.stdSelection.toSeq == exp, s"$name not partition-invariant")
    }
  }

  test("kddcup: nominal-column ingestion (StringIndexer wiring) fits deterministically") {
    // the one reference ingestion path previously uncovered: a CSV with
    // CATEGORICAL feature columns (kddcup protocol/service/flag —
    // TestHelper's StringIndexer convention). assembleNominal
    // string-indexes the nominals (frequencyDesc) and assembles them
    // with the numerics; the fit must be deterministic and
    // partition-invariant like every other path.
    import org.apache.spark.ml.feature.StringIndexer
    val raw = spark.read.option("inferSchema", "true")
      .csv("/root/reference/src/test/resources/data/kddcup_100.csv")
    val cols = raw.columns
    val nominal = Array(cols(1), cols(2), cols(3))
    val numeric = cols.dropRight(1).filterNot(nominal.contains)
    val withLabel = new StringIndexer().setInputCol(cols.last).setOutputCol("label")
      .setStringOrderType("frequencyDesc").fit(raw).transform(raw)
    val assembled = ReliefQueries
      .assembleNominal(withLabel, numeric, nominal)
      .select(col("label"), col("features"))
    def fitK(df: DataFrame) = new ReliefFRSelector()
      .setInputCol("features").setLabelCol("label").setOutputCol("out")
      .setNumTopFeatures(10).setNumNeighbors(10)
      .setEstimationRatio(1.0).setBatchSize(0.25)
      .setDiscreteData(true).setSeed(123456789L)
      .fit(df)
    val m = fitK(assembled)
    assert(m.stdSelection.toSeq ==
      Seq(5, 22, 23, 4, 32, 31, 3, 1, 11, 2),
      s"kddcup selection drifted: ${m.stdSelection.mkString(",")}")
    assert(fitK(assembled.repartition(3)).stdSelection.toSeq == m.stdSelection.toSeq,
      "kddcup fit not partition-invariant")
  }

  test("kddcup: README-prescribed one-hot + scaled geometry vs the ordinal path") {
    // the reference README's preprocessing prescription (README.md:
    // 41-46): standard-scale the continuous columns, ONE-HOT the
    // nominals — ordinal StringIndexer indices impose a fake order on
    // unordered categories (|http−smtp| = 2 means nothing), and
    // unscaled wide-range numerics (src_bytes spans orders of
    // magnitude) drown every other dimension in the hit/miss
    // distances. This pin shows the geometry MOVING the selection:
    // the two fits run identical params/seed on the same rows, and
    // differ only through assembleNominal vs assembleScaledOneHot.
    // (kddcup is the fixture with true nominals; covtype's categorical
    // columns ship already one-hot in the raw data.)
    import org.apache.spark.ml.feature.StringIndexer
    val raw = spark.read.option("inferSchema", "true")
      .csv("/root/reference/src/test/resources/data/kddcup_100.csv")
    val cols = raw.columns
    val nominal = Array(cols(1), cols(2), cols(3))
    val numeric = cols.dropRight(1).filterNot(nominal.contains)
    val withLabel = new StringIndexer().setInputCol(cols.last).setOutputCol("label")
      .setStringOrderType("frequencyDesc").fit(raw).transform(raw)
    def fitK(df: DataFrame, discrete: Boolean) = new ReliefFRSelector()
      .setInputCol("features").setLabelCol("label").setOutputCol("out")
      .setNumTopFeatures(10).setNumNeighbors(10)
      .setEstimationRatio(1.0).setBatchSize(0.25)
      .setDiscreteData(discrete).setSeed(123456789L)
      .fit(df)
    // ordinal path (the existing pin's geometry)
    val ordinal = fitK(ReliefQueries.assembleNominal(withLabel, numeric, nominal)
      .select(col("label"), col("features")), discrete = true).stdSelection.toSeq
    // README path: one-hot blocks first, then the scaled numeric block
    // (continuous after scaling → discreteData=false)
    val oneHot = ReliefQueries.assembleScaledOneHot(withLabel, numeric, nominal)
      .select(col("label"), col("features"))
    val m = fitK(oneHot, discrete = false)
    // map selected vector positions back to source columns: one-hot
    // blocks expand each nominal to (card-1) slots
    val cards = nominal.map(c =>
      withLabel.agg(countDistinct(col(c))).head().getLong(0).toInt - 1)
    val blocks: Seq[(String, Int, Int)] = {
      val starts = cards.scanLeft(0)(_ + _)
      nominal.indices.map(i => (nominal(i), starts(i), starts(i) + cards(i)))
    }
    def sourceOf(dim: Int): String =
      blocks.find { case (_, lo, hi) => dim >= lo && dim < hi }
        .map(_._1)
        .getOrElse(numeric(dim - cards.sum))
    val got = m.stdSelection.toSeq
    val gotCols = got.map(sourceOf)
    info(s"kddcup one-hot selection: ${got.mkString(",")} -> cols ${gotCols.mkString(",")}")
    info(s"kddcup ordinal  selection: ${ordinal.mkString(",")}")
    // the pinned README-geometry selection: individual protocol
    // one-hot slots (dims 0,1 = _c1's two hot categories) rank inside
    // the top-10 next to the scaled numerics (_c22, _c11, _c23, _c35,
    // _c31, _c36, _c4) — under the ordinal geometry the protocol
    // column's single ordinal dim never splits that way, and the
    // unscaled numerics' raw magnitudes rank a different set entirely
    assert(got == Seq(29, 18, 30, 42, 38, 2, 0, 43, 1, 11),
      s"one-hot selection drifted: ${got.mkString(",")}")
    // the geometry must actually move the ranking — if both paths
    // produced the same top-10 the README's prescription would be a
    // no-op on this data
    val ordinalCols = ordinal.map { d =>
      if (d < nominal.length) nominal(d) else numeric(d - nominal.length)
    }
    assert(gotCols.toSet != ordinalCols.toSet,
      s"one-hot geometry selected the same source columns as ordinal: $gotCols")
    assert(fitK(oneHot.repartition(3), discrete = false).stdSelection.toSeq == got,
      "one-hot fit not partition-invariant")
  }

  test("ECBDL14: the reference's flagship-scale dataset fits deterministically under a query budget") {
    // the reference README's headline dataset (protein structure
    // prediction, 631 features; the 1K test slice ships in its
    // resources). Headerless CSV, binary label LAST. Fit under a
    // bounded estimation ratio — the production posture for a dataset
    // whose full version is 64M rows — and pin determinism +
    // partition invariance. Closes the last reference-shipped dataset
    // family the repo never loaded.
    val raw = spark.read
      .csv("/root/reference/src/test/resources/data/ECBDL14-test-1K.data")
    val cols = raw.columns
    val feats = cols.dropRight(1)
    val df = raw.select(
      col(cols.last).cast("double").as("label") +:
        feats.map(c => col(c).cast("double").as(c)): _*)
    val assembled = new VectorAssembler()
      .setInputCols(feats).setOutputCol("features")
      .transform(df).select("label", "features")
    def fitE(d: DataFrame) = new ReliefFRSelector()
      .setInputCol("features").setLabelCol("label").setOutputCol("out")
      .setNumTopFeatures(10).setNumNeighbors(5)
      .setEstimationRatio(0.1).setBatchSize(0.5)
      .setDiscreteData(true).setSeed(123456789L)
      .fit(d)
    val m = fitE(assembled)
    assert(m.stdSelection.length == 10)
    assert(fitE(assembled.repartition(3)).stdSelection.toSeq == m.stdSelection.toSeq,
      "ECBDL14 fit not partition-invariant")
    info(s"ECBDL14 selection: ${m.stdSelection.mkString(",")}")
  }

  test("kddcup 10K: nominal ingestion at 100x rows under a bounded query budget") {
    // the largest kddcup slice the reference ships (10 000 rows):
    // same nominal wiring as the 100-row spec, fit with a bounded
    // estimation ratio (200 queries — the linear-in-corpus production
    // posture for a dataset whose real version is millions of rows).
    // Pins determinism; the interesting property at this scale is that
    // the id-free content-hash identity still dedupes the MANY exact
    // duplicate rows kddcup contains into single instances with
    // multiplicity, and the fit completes in spec time.
    import org.apache.spark.ml.feature.StringIndexer
    val raw = spark.read.option("inferSchema", "true")
      .csv("/root/reference/src/test/resources/data/kddcup_10K.csv")
    val cols = raw.columns
    val nominal = Array(cols(1), cols(2), cols(3))
    val numeric = cols.dropRight(1).filterNot(nominal.contains)
    val withLabel = new StringIndexer().setInputCol(cols.last).setOutputCol("label")
      .setStringOrderType("frequencyDesc").fit(raw).transform(raw)
    val assembled = ReliefQueries
      .assembleNominal(withLabel, numeric, nominal)
      .select(col("label"), col("features"))
    def fitK(df: DataFrame) = new ReliefFRSelector()
      .setInputCol("features").setLabelCol("label").setOutputCol("out")
      .setNumTopFeatures(10).setNumNeighbors(5)
      .setEstimationRatio(0.02).setBatchSize(0.5)
      .setDiscreteData(true).setSeed(123456789L)
      .fit(df)
    val m = fitK(assembled)
    assert(m.stdSelection.length == 10)
    assert(fitK(assembled.repartition(5)).stdSelection.toSeq == m.stdSelection.toSeq,
      "kddcup-10K fit not partition-invariant")
    info(s"kddcup-10K selection: ${m.stdSelection.mkString(",")}")
  }

  test("colon: reference-params run selects the shared feature core, invariant to partitioning") {
    val df = loadReferenceCsv("test_colon_s3.csv")
    val m = fit(df)
    assert(m.stdSelection.length == 10)
    // reference's published colon selection (reference
    // ReliefSelectorSuite.scala:51): {1422,248,74,244,266,764,1413,1771,1152,779};
    // 7 of 10 are stable across both engines on this data (62×2000,
    // sparse-ish discrete — exercises class priors the lung data doesn't)
    val sharedCore = Set(1422, 248, 244, 266, 764, 1413, 779)
    assert(sharedCore.subsetOf(m.stdSelection.toSet),
      s"shared core missing from ${m.stdSelection.mkString(",")}")
    val m2 = fit(df.repartition(3))
    assert(m2.stdSelection.toSeq == m.stdSelection.toSeq)
    val m3 = fit(df.coalesce(1))
    assert(m3.stdSelection.toSeq == m.stdSelection.toSeq)
    // quantified divergence, same treatment as lung: where do the
    // reference's published picks land in OUR ranking? (2000 features)
    val rankOf = m.featureWeights.zipWithIndex
      .sortBy { case (w, f) => (-w, f) }.zipWithIndex
      .map { case ((_, f), r) => f -> (r + 1) }.toMap
    val refPublished = Seq(1422, 248, 74, 244, 266, 764, 1413, 1771, 1152, 779)
    val ranks = refPublished.map(f => f -> rankOf(f))
    info(s"reference colon picks → our ranks: ${ranks.mkString(", ")}")
    assert(ranks.forall(_._2 <= 60),
      s"a reference pick fell far outside our ranking: ${ranks.mkString(", ")}")
  }

  /** Headerless CSV with the class LAST (covtype/dna/DatasetsKAIS
    * convention — readme.txt: "each column corresponds with a feature,
    * being the last column the class label"). Label string-indexed
    * frequencyDesc (TestHelper's convertLabelToIndex convention), all
    * features cast double, assembled.
    */
  private def loadClassLastCsv(path: String): DataFrame = {
    import org.apache.spark.ml.feature.StringIndexer
    val raw = spark.read.option("inferSchema", "true").csv(path)
    val cols = raw.columns
    val feats = cols.dropRight(1)
    val withLabel = new StringIndexer()
      .setInputCol(cols.last).setOutputCol("label")
      .setStringOrderType("frequencyDesc")
      .fit(raw.withColumn(cols.last, col(cols.last).cast("string")))
      .transform(raw.withColumn(cols.last, col(cols.last).cast("string")))
    new VectorAssembler().setInputCols(feats).setOutputCol("features")
      .transform(withLabel.select(col("label") +:
        feats.map(c => col(c).cast("double").as(c)): _*))
      .select("label", "features")
  }

  test("covtype 1K: 7-class nominal dataset fits deterministically, invariant to partitioning") {
    // covtype_1K.csv (1000×54, 7 classes via StringIndexer at real
    // cardinality: 10 numeric terrain features + 44 one-hot soil/
    // wilderness indicators — the nominal multi-class shape a real
    // reference user migrates first). Frozen deterministic pin +
    // partition invariance, the nci9 treatment.
    val df = loadClassLastCsv("/root/reference/src/test/resources/data/covtype_1K.csv")
    def fitC(d: DataFrame) = new ReliefFRSelector()
      .setInputCol("features").setLabelCol("label").setOutputCol("out")
      .setNumTopFeatures(10).setNumNeighbors(10)
      .setEstimationRatio(0.25).setBatchSize(0.5)
      .setDiscreteData(true).setSeed(123456789L)
      .fit(d)
    val m = fitC(df)
    info(s"covtype-1K selection: ${m.stdSelection.mkString(",")}")
    assert(m.stdSelection.toSeq == Seq(0, 5, 9, 3, 1, 8, 4, 6, 7, 2),
      s"covtype-1K selection drifted: ${m.stdSelection.mkString(",")}")
    assert(fitC(df.repartition(3)).stdSelection.toSeq == m.stdSelection.toSeq,
      "covtype-1K fit not partition-invariant")
    // ground-truth shape, not just a pin: the top-10 is EXACTLY the
    // terrain block (features 0-9: elevation, aspect, slope, distances,
    // hillshades) — covtype's signal lives there, and the selector
    // ranks all ten above every sparse one-hot indicator
    assert(m.stdSelection.toSet == (0 until 10).toSet)
  }

  test("dna 1K: categorical genomic dataset (rare-class) fits deterministically") {
    // dna_1K.csv (1000×200 nucleotide codes 1-4, binary class with 6
    // positives — the rare-class categorical shape; the shipped
    // subSetROS_1K.csv is this family's oversampled companion).
    // Frozen pin + partition invariance.
    val df = loadClassLastCsv("/root/reference/src/test/resources/data/dna_1K.csv")
    def fitD(d: DataFrame) = new ReliefFRSelector()
      .setInputCol("features").setLabelCol("label").setOutputCol("out")
      .setNumTopFeatures(10).setNumNeighbors(5)
      .setEstimationRatio(0.25).setBatchSize(0.5)
      .setDiscreteData(true).setSeed(123456789L)
      .fit(d)
    val m = fitD(df)
    info(s"dna-1K selection: ${m.stdSelection.mkString(",")}")
    assert(m.stdSelection.toSeq ==
      Seq(137, 172, 120, 47, 98, 99, 13, 8, 100, 68),
      s"dna-1K selection drifted: ${m.stdSelection.mkString(",")}")
    assert(fitD(df.repartition(3)).stdSelection.toSeq == m.stdSelection.toSeq,
      "dna-1K fit not partition-invariant")
  }

  test("Madelon-UCI: continuous synthetic benchmark fits deterministically under a query budget") {
    // DatasetsKAIS/Madelon-UCI.csv (2000×500 continuous, balanced
    // binary — the KAIS review's hardest non-linear benchmark:
    // 5 relevant + 15 redundant features hidden in 480 noise dims,
    // built to defeat univariate filters). discreteData=false — the
    // continuous ramp-distance path none of the other reference
    // datasets exercise. Frozen pin + partition invariance.
    val df = loadClassLastCsv(
      "/root/reference/src/test/resources/data/DatasetsKAIS/Madelon-UCI.csv")
    def fitM(d: DataFrame) = new ReliefFRSelector()
      .setInputCol("features").setLabelCol("label").setOutputCol("out")
      .setNumTopFeatures(10).setNumNeighbors(10)
      .setEstimationRatio(0.1).setBatchSize(0.5)
      .setDiscreteData(false).setSeed(123456789L)
      .fit(d)
    val m = fitM(df)
    info(s"madelon selection: ${m.stdSelection.mkString(",")}")
    assert(m.stdSelection.toSeq ==
      Seq(105, 442, 378, 318, 48, 338, 475, 153, 472, 493),
      s"madelon selection drifted: ${m.stdSelection.mkString(",")}")
    assert(fitM(df.repartition(3)).stdSelection.toSeq == m.stdSelection.toSeq,
      "madelon fit not partition-invariant")
    // GROUND-TRUTH recovery, not just a frozen pin: Madelon's 20
    // informative+redundant features are identifiable from the DATA —
    // they are mutually correlated (built from the same 5 latent
    // dims), noise features are independent. Measured on the raw
    // file: 20 features have max |corr| to another feature ≥ 0.686
    // (18 at ~0.99), then a cliff to 0.094 — an unambiguous spectral
    // gap. Our entire top-10 lands inside that 20-member set.
    val informative = Set(28, 48, 64, 105, 128, 153, 241, 281, 318, 336,
      338, 378, 433, 442, 451, 453, 455, 472, 475, 493)
    assert(m.stdSelection.forall(informative.contains),
      s"a noise feature entered the madelon top-10: ${m.stdSelection.mkString(",")}")
  }

  test("Monk3: the rule-relevant attribute triple is recovered despite 5% label noise") {
    // Monk3 (122×6, class = (a5=3 ∧ a4=1) ∨ (a5≠4 ∧ a2≠3), 5% label
    // noise in the training sample — Thrun et al.'s canonical noisy
    // rule-learning benchmark): relevant attributes are a2/a4/a5 =
    // features {1, 3, 4}; the other three never appear in the rule.
    val df = loadClassLastCsv(
      "/root/reference/src/test/resources/data/DatasetsKAIS/Monk3.csv")
    def fitMk(d: DataFrame) = new ReliefFRSelector()
      .setInputCol("features").setLabelCol("label").setOutputCol("out")
      .setNumTopFeatures(3).setNumNeighbors(10)
      .setEstimationRatio(1.0).setBatchSize(0.5)
      .setDiscreteData(true).setSeed(123456789L)
      .fit(d)
    val m = fitMk(df)
    info(s"monk3 selection: ${m.stdSelection.mkString(",")}")
    assert(m.stdSelection.toSet == Set(1, 3, 4),
      s"monk3 relevant triple not recovered: ${m.stdSelection.mkString(",")}")
    assert(fitMk(df.repartition(3)).stdSelection.toSeq == m.stdSelection.toSeq,
      "monk3 fit not partition-invariant")
  }

  test("XOR100: RELIEF recovers the interacting pair no univariate filter can see") {
    // DatasetsKAIS/XOR100.csv (50×99 binary, class = f4 XOR f6 —
    // verified against the raw file): each feature is marginally
    // independent of the class, so χ²/IG/AUC all score the true pair
    // at noise level; RELIEF's nearest-neighbor margin is the one
    // filter family that sees the interaction. GROUND-TRUTH recovery,
    // not a frozen pin: the top-2 must be exactly {4, 6}. Neighborhood
    // size matters on 50 samples: k=7..10 recovers the pair exactly
    // (k=3/5 lets one 99-bit-noise neighbor outvote the margin, k=15
    // over-smooths — the Robnik-Šikonja/Kononenko sensitivity, observed
    // here directly); k=10 is the reference suite's own setting.
    val df = loadClassLastCsv(
      "/root/reference/src/test/resources/data/DatasetsKAIS/XOR100.csv")
    def fitX(d: DataFrame) = new ReliefFRSelector()
      .setInputCol("features").setLabelCol("label").setOutputCol("out")
      .setNumTopFeatures(2).setNumNeighbors(10)
      .setEstimationRatio(1.0).setBatchSize(0.5)
      .setDiscreteData(true).setSeed(123456789L)
      .fit(d)
    val m = fitX(df)
    assert(m.stdSelection.toSet == Set(4, 6),
      s"XOR pair not recovered: ${m.stdSelection.mkString(",")}")
    assert(fitX(df.repartition(3)).stdSelection.toSet == Set(4, 6))
  }

  /** Fit for the DatasetsKAIS ground-truth family (class-last CSVs):
    * reference-suite params (k=10 neighbors, full estimation) with the
    * discreteness of the data supplied per dataset.
    */
  private def fitKais(df: DataFrame, top: Int, discrete: Boolean,
      k: Int = 10): ReliefFRSelectorModel =
    new ReliefFRSelector()
      .setInputCol("features").setLabelCol("label").setOutputCol("out")
      .setNumTopFeatures(top).setNumNeighbors(k)
      .setEstimationRatio(1.0).setBatchSize(0.5)
      .setDiscreteData(discrete).setSeed(123456789L)
      .fit(df)

  test("LED noise ladder: segment recovery degrades gracefully, never collapses") {
    // Led{25,100}n{0,10,20}: 7 LED segments (features 0-6) + 17/92
    // noise features, 10 digit classes, 50 rows, n% noise — the KAIS
    // review's robustness-under-noise curve, the property the RELIEF
    // family exists to demonstrate. Measure |top-7 ∩ segments| at
    // each (dimensionality, noise) cell and pin the curve.
    val cells = for {
      dim <- Seq("25", "100")
      noise <- Seq("0", "10", "20")
    } yield {
      val df = loadClassLastCsv("/root/reference/src/test/resources/data/" +
        s"DatasetsKAIS/Led${dim}n$noise.csv")
      val m = fitKais(df, top = 7, discrete = true)
      val rec = m.stdSelection.count(_ < 7)
      info(s"Led${dim}n$noise: top-7 = ${m.stdSelection.mkString(",")} → $rec/7 segments")
      ((dim, noise), rec, m)
    }
    val recovery = cells.map { case (k, r, _) => k -> r }.toMap
    info(s"recovery curve: $recovery")
    // the MEASURED degradation curve, pinned exactly (deterministic
    // fit): at 24 features the segment panel survives 20% noise
    // untouched (6/7 at every level — segment 5 sits just under the
    // cut even clean, a 50-row sampling artifact); at 99 features the
    // same noise erodes recovery 6 → 5 → 4 — noise hurts more where
    // there are more dims to confuse it with, the KAIS review's
    // dimensionality × noise interaction observed directly
    assert(recovery == Map(
      ("25", "0") -> 6, ("25", "10") -> 6, ("25", "20") -> 6,
      ("100", "0") -> 6, ("100", "10") -> 5, ("100", "20") -> 4),
      s"degradation curve drifted: $recovery")
    for (dim <- Seq("25", "100"))
      assert(Seq("0", "10", "20").map(n => recovery((dim, n)))
        .sliding(2).forall(w => w(0) >= w(1)),
        s"recovery must not improve with noise: $recovery")
    // partition invariance on the hardest cell
    val hard = loadClassLastCsv(
      "/root/reference/src/test/resources/data/DatasetsKAIS/Led100n20.csv")
    val m1 = fitKais(hard, top = 7, discrete = true)
    assert(fitKais(hard.repartition(3), top = 7, discrete = true)
      .stdSelection.toSeq == m1.stdSelection.toSeq,
      "LED fit not partition-invariant")
  }

  test("Corral: the relevant block is recovered; the 75%-correlated trap is measured") {
    // Corral (32×6, class = (A0∧A1)∨(B0∧B1)): features 0-3 relevant,
    // 4 irrelevant, 5 correlated with the class 75% of the time — the
    // John/Kohavi/Pfleger trap feature most filters rank FIRST.
    val df = loadClassLastCsv(
      "/root/reference/src/test/resources/data/DatasetsKAIS/Corral.csv")
    val m = fitKais(df, top = 6, discrete = true, k = 5)
    val ranking = m.stdSelection.toSeq
    info(s"Corral ranking: ${ranking.mkString(",")}")
    // the MEASURED full ranking, pinned: the 75%-correlated trap
    // feature ranks FIRST (nearest neighbors mostly agree with a
    // feature that is right 75% of the time — RELIEF falls into the
    // John/Kohavi/Pfleger trap exactly as the review reports for
    // every filter), the full relevant block fills ranks 2-5, and the
    // irrelevant feature is dead last. The trap is the documented
    // behavior, not a defect: detecting that f5 is a proxy needs a
    // wrapper, not a filter.
    assert(ranking == Seq(5, 3, 2, 1, 0, 4),
      s"Corral ranking drifted: $ranking")
    assert(fitKais(df.repartition(3), top = 6, discrete = true, k = 5)
      .stdSelection.toSeq == ranking, "Corral fit not partition-invariant")
  }

  test("SD1/SD2/SD3: relevant-gene prefix recovery at 4000+ dims") {
    // Zhu et al.'s 3-class synthetic microarrays (75 rows each):
    // SD1 = genes 0-19 relevant of 4020, SD2 = 0-39 of 4040,
    // SD3 = 0-59 of 4060 (verified against per-gene ANOVA F on the
    // raw files), the rest N(0,1) noise. Pin the fraction of the
    // top-prefix panel our fit places inside the true prefix.
    val specs = Seq(("SD1", 4020, 20), ("SD2", 4040, 40), ("SD3", 4060, 60))
    for ((name, nf, prefix) <- specs) {
      val df = loadClassLastCsv(
        s"/root/reference/src/test/resources/data/DatasetsKAIS/$name.csv")
      val m = fitKais(df, top = prefix, discrete = false)
      val inPrefix = m.stdSelection.count(_ < prefix)
      info(s"$name: $inPrefix/$prefix of top-$prefix inside the true prefix")
      // measured: PERFECT prefix recovery on all three (20/20, 40/40,
      // 60/60) — at 25 samples/class the relevant blocks separate
      // cleanly from 4000 N(0,1) noise genes under the kNN margin
      assert(inPrefix == prefix,
        s"$name recovery regressed: $inPrefix/$prefix (${m.stdSelection.take(20).mkString(",")})")
    }
    // partition invariance at the highest dimensionality
    val sd3 = loadClassLastCsv(
      "/root/reference/src/test/resources/data/DatasetsKAIS/SD3.csv")
    val m1 = fitKais(sd3, top = 10, discrete = false)
    assert(fitKais(sd3.repartition(3), top = 10, discrete = false)
      .stdSelection.toSeq == m1.stdSelection.toSeq,
      "SD3 fit not partition-invariant")
  }

  test("null-label CSV ingestion: the reference cleanLabelCol/cleanNumericCols contract") {
    // the reference's dirty-CSV path (TestHelper.scala:91-104 +
    // readNullLabelTestData): null labels become the
    // __MISSING_VALUE__ class through a frequencyDesc StringIndexer
    // (NOT dropped, NOT a crash), null numerics become NaN (visible
    // dirt, not silent zero). Build the fixture the reference models:
    // a CSV with empty label and numeric cells.
    val f = java.nio.file.Files.createTempFile("graft_null_label", ".csv")
    val rnd = new scala.util.Random(11)
    val lines = "label,f0,f1,f2" +: (0 until 60).map { i =>
      val lbl = if (i % 10 == 7) "" else (i % 2).toString // 6 null labels
      val f0 = if (lbl == "1") 3.0 + rnd.nextGaussian() * 0.1
               else 1.0 + rnd.nextGaussian() * 0.1
      val f1 = if (i == 13) "" else f"${rnd.nextDouble()}%.4f" // 1 null numeric
      f"$lbl,$f0%.4f,$f1,${rnd.nextDouble()}%.4f"
    }
    java.nio.file.Files.write(f, String.join("\n", lines: _*).getBytes)
    val raw = spark.read.option("header", "true").csv(f.toString)

    // label contract: null → MISSING class, frequencyDesc indexing
    val cleaned = ReliefQueries.cleanLabelCol(raw, "label")
    val census = cleaned.groupBy("label_CLEAN", "label_IDX").count()
      .collect().map(r => (r.getString(0), r.getDouble(1), r.getLong(2))).toSet
    assert(census.exists(_._1 == ReliefQueries.MissingLabel),
      s"missing-label class absent: $census")
    assert(census.size == 3, s"expected 3 classes (0, 1, MISSING): $census")
    val missIdx = census.find(_._1 == ReliefQueries.MissingLabel).get._2
    assert(missIdx == 2.0, // 6 rows — least frequent of the three
      s"MISSING should index last under frequencyDesc: $census")

    // numeric contract: null → NaN, visible, assembly survives
    val nums = ReliefQueries.cleanNumericCols(cleaned, Seq("f0", "f1", "f2"))
    assert(nums.where(isnan(col("f1"))).count() == 1)
    assert(nums.where(col("f1").isNull).count() == 0)

    // the fit consumes the cleaned label as its own class: drop the
    // one NaN-feature row (the documented upstream-gate step — NaN
    // distances are undefined in BOTH engines), fit, and pin
    // determinism + that all three classes participate
    val assembled = new VectorAssembler()
      .setInputCols(Array("f0", "f1", "f2")).setOutputCol("features")
      .transform(nums.where(!isnan(col("f1")))
        .select(col("label_IDX").as("label"),
          col("f0").cast("double"), col("f1").cast("double"),
          col("f2").cast("double")))
      .select("label", "features")
    def fitN(d: org.apache.spark.sql.DataFrame) = new ReliefFRSelector()
      .setInputCol("features").setLabelCol("label").setOutputCol("out")
      .setNumTopFeatures(1).setNumNeighbors(3)
      .setEstimationRatio(1.0).setBatchSize(0.5)
      .setDiscreteData(false).setSeed(123456789L)
      .fit(d)
    val m = fitN(assembled)
    assert(m.stdSelection.toSeq == Seq(0),
      s"informative feature not recovered on the cleaned frame: ${m.stdSelection.mkString(",")}")
    assert(fitN(assembled.repartition(3)).stdSelection.toSeq == m.stdSelection.toSeq,
      "null-label fit not partition-invariant")
    java.nio.file.Files.delete(f)
  }

  test("Parity3+3: RELIEF recovers the relevant+redundant block over the noise") {
    // DatasetsKAIS/Parity3+3.csv (64×12, class = parity(f0,f1,f2);
    // f3-f5 are exact duplicates of f0-f2, f6-f11 noise — verified
    // against the raw file). Parity is the canonical univariate-
    // filter-killer; the top-6 must be exactly the relevant+redundant
    // block {0..5}.
    val df = loadClassLastCsv(
      "/root/reference/src/test/resources/data/DatasetsKAIS/Parity3+3.csv")
    def fitP(d: DataFrame) = new ReliefFRSelector()
      .setInputCol("features").setLabelCol("label").setOutputCol("out")
      .setNumTopFeatures(6).setNumNeighbors(5)
      .setEstimationRatio(1.0).setBatchSize(0.5)
      .setDiscreteData(true).setSeed(123456789L)
      .fit(d)
    val m = fitP(df)
    info(s"parity selection: ${m.stdSelection.mkString(",")}")
    assert(m.stdSelection.toSet == Set(0, 1, 2, 3, 4, 5),
      s"parity block not recovered: ${m.stdSelection.mkString(",")}")
    assert(fitP(df.repartition(3)).stdSelection.toSeq == m.stdSelection.toSeq,
      "parity fit not partition-invariant")
  }
}
