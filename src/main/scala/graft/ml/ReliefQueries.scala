package graft.ml

import org.apache.spark.ml.feature.VectorAssembler
import org.apache.spark.ml.functions.{array_to_vector, vector_to_array}
import org.apache.spark.ml.linalg.{Vector, Vectors}
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Driver-contract glue for the ML surface (SURVEY.md §2a): each
  * reference capability exposed as a `(SparkSession, sfDir) => DataFrame`
  * over the `embeddings` table (label + 64-dim float vector — the same
  * DataFrame[label, features] shape the reference consumes).
  */
object ReliefQueries {

  /** embeddings → (vec_id, label: double, features: Vector). */
  def assembled(spark: SparkSession, dir: String): DataFrame =
    Tables.embeddings(spark, dir).select(
      col("vec_id"),
      col("label").cast("double").as("label"),
      array_to_vector(col("embedding")).as("features"))

  private def fitSelector(spark: SparkSession, dir: String,
      redundancy: Boolean): ReliefFRSelectorModel = {
    val sel = new ReliefFRSelector()
      .setInputCol("features").setLabelCol("label").setOutputCol("selected")
      .setNumTopFeatures(10).setNumNeighbors(3)
      .setEstimationRatio(0.25).setBatchSize(0.5)
      .setRedundancyRemoval(redundancy).setSeed(20260812L)
    // estimationRatio grows the query set WITH the corpus, making the
    // kNN pass quadratic in corpus size at a fixed ratio; this conf
    // pins an ABSOLUTE query budget instead (ratio = budget/n) — the
    // linear-in-corpus production posture. Affects weights only
    // through which queries are sampled, so it's a bench/scale knob,
    // not a correctness one (leave unset for oracle runs).
    val data = assembled(spark, dir)
    spark.conf.getOption("spark.graft.relief.queryBudget").foreach { v =>
      val n = data.count()
      if (n > 0) sel.setEstimationRatio(math.min(1.0, v.toDouble / n))
    }
    sel.fit(data)
  }

  /** relief_weights: normalized RELIEF-F relevance per feature. */
  def reliefWeights(spark: SparkSession, dir: String): DataFrame = {
    val m = fitSelector(spark, dir, redundancy = false)
    import spark.implicits._
    m.featureWeights.zipWithIndex
      .map { case (w, f) => (f, w) }.toSeq.toDF("feature", "weight")
  }

  /** relief_select: both rankings side by side (rank → feature). */
  def reliefSelect(spark: SparkSession, dir: String): DataFrame = {
    val m = fitSelector(spark, dir, redundancy = true)
    import spark.implicits._
    m.stdSelection.zip(m.redundancySelection).zipWithIndex
      .map { case ((std, red), r) => (r + 1, std, red) }.toSeq
      .toDF("rank", "std_feature", "redundancy_feature")
  }

  /** relief_transform: vectors compressed to the selected indices. */
  def reliefTransform(spark: SparkSession, dir: String): DataFrame = {
    val m = fitSelector(spark, dir, redundancy = false)
    m.transform(assembled(spark, dir))
      .select(col("vec_id"), vector_to_array(col("selected")).as("selected"))
      .select(col("vec_id"), expr("size(selected)").as("n_selected"),
        expr("round(aggregate(selected, 0D, (a, x) -> a + x), 6)").as("sum_selected"))
  }

  /** relief_persist: fit → save → load → selections from the loaded model. */
  def reliefPersist(spark: SparkSession, dir: String): DataFrame = {
    val m = fitSelector(spark, dir, redundancy = true)
    val path = s"/tmp/graft_relief_model_${m.uid.replaceAll("[^A-Za-z0-9_]", "")}"
    m.write.overwrite().save(path)
    val loaded = ReliefFRSelectorModel.load(path)
    import spark.implicits._
    loaded.stdSelection.zip(loaded.redundancySelection).zipWithIndex
      .map { case ((std, red), r) => (r + 1, std, red) }.toSeq
      .toDF("rank", "std_feature", "redundancy_feature")
  }

  /** relief_knn: the distributed kNN pass exposed directly — queries are
    * vec_id < 5, k = 10, euclidean. Oracle-checked against DuckDB.
    */
  def reliefKnn(spark: SparkSession, dir: String): DataFrame = {
    val df = assembled(spark, dir)
    val data = df.select("vec_id", "features").rdd
      .map { case Row(id: Long, v: Vector) => (id, v) }
    val queries: Array[(Long, Vector)] = data.filter(_._1 < 5).collect().sortBy(_._1)
    val bQ = spark.sparkContext.broadcast(queries)
    val k = 10
    val topk = data.mapPartitions { it =>
      val qs = bQ.value
      val heaps = Array.fill(qs.length)(new TopK(k))
      it.foreach { case (id, v) =>
        var j = 0
        while (j < qs.length) {
          if (qs(j)._1 != id) heaps(j).add(math.sqrt(Vectors.sqdist(qs(j)._2, v)), id)
          j += 1
        }
      }
      Iterator.tabulate(qs.length)(j => (j, heaps(j)))
    }.reduceByKey(_.merge(_)).collect()
    import spark.implicits._
    topk.flatMap { case (qIdx, heap) =>
      heap.sorted.map { case (d, id) => (queries(qIdx)._1, id, d) }
    }.toSeq.toDF("query_id", "neighbor_id", "dist")
  }

  /** vector_assemble: the reference's CSV→VectorAssembler input path
    * (reference TestHelper.scala), over the orders table's numerics.
    */
  def vectorAssemble(spark: SparkSession, dir: String): DataFrame = {
    val assembler = new VectorAssembler()
      .setInputCols(Array("o_totalprice", "o_custkey"))
      .setOutputCol("features")
    assembler.transform(
        Tables.orders(spark, dir)
          .select(col("o_orderkey"), col("o_totalprice"),
            col("o_custkey").cast("double").as("o_custkey")))
      .select(col("o_orderkey"), vector_to_array(col("features")).as("features"))
      .select(col("o_orderkey"), expr("size(features)").as("dim"),
        expr("features[0]").as("f0"))
  }
}
