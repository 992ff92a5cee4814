package graft.ml

import org.apache.spark.ml.Model
import org.apache.spark.ml.linalg.{DenseVector, SparseVector, Vector, Vectors}
import org.apache.spark.ml.param.{ParamMap, Params}
import org.apache.spark.ml.util.{Identifiable, MLReadable, MLReader, MLWritable, MLWriter}
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types.{StructField, StructType}

/** Model fitted by [[ReliefFRSelector]]: the two rankings (plain
  * RELIEF-F and relevance−redundancy) plus the normalized per-feature
  * relevance weights. `transform` compresses the feature vector to the
  * selected indices (reference FeatureSelectionUtils.scala:38-73
  * semantics — sparse stays sparse, dense stays dense).
  *
  * Weights are stored SPARSELY: only features some (query, neighbor)
  * pair actually touched carry a weight (`weightedFeatures` ascending
  * / `weightedValues`), every absent feature shares `defaultWeight`
  * (the min-max image of zero relevance). At reference-CSV dims the
  * dense [[featureWeights]] view densifies lazily and nothing
  * changes; at kddb dims (reference README.md:19 — "nearly 30M of
  * features") the model, its persistence, and the fit that builds it
  * are all bounded by ACTIVE dims, never nFeat (ReliefSpec pins a
  * 20k×30M fit).
  */
final class ReliefFRSelectorModel private[ml] (
    override val uid: String,
    val stdSelection: Array[Int],
    val redundancySelection: Array[Int],
    val numFeatures: Int,
    val defaultWeight: Double,
    val weightedFeatures: Array[Int],
    val weightedValues: Array[Double])
    extends Model[ReliefFRSelectorModel] with ReliefFRParams with MLWritable {

  /** Normalized weight of one feature — O(log activeDims) lookup. */
  def weightOf(f: Int): Double = {
    val i = java.util.Arrays.binarySearch(weightedFeatures, f)
    if (i >= 0) weightedValues(i) else defaultWeight
  }

  /** Dense weight view — O(numFeatures) driver memory. Right at
    * reference-CSV dims; at kddb-scale dims read
    * [[weightedFeatures]]/[[weightOf]] instead.
    */
  lazy val featureWeights: Array[Double] = {
    val a = Array.fill(numFeatures)(defaultWeight)
    var i = 0
    while (i < weightedFeatures.length) {
      a(weightedFeatures(i)) = weightedValues(i); i += 1
    }
    a
  }

  def setInputCol(v: String): this.type = set(inputCol, v)
  def setOutputCol(v: String): this.type = set(outputCol, v)
  def setRedundancyRemoval(v: Boolean): this.type = set(redundancyRemoval, v)

  private var selectionSize: Int = -1

  /** Restrict the transform to the best `s` of the selected features. */
  def setReducedSubset(s: Int): this.type = {
    require(s > 0 && s <= getSelectedFeatures().length,
      s"subset size must be in [1, ${getSelectedFeatures().length}]")
    selectionSize = s
    this
  }

  def getReducedSubsetParam(): Int =
    if (selectionSize > 0) selectionSize else getSelectedFeatures().length

  def getSelectedFeatures(): Array[Int] = {
    val sel = if ($(redundancyRemoval)) redundancySelection else stdSelection
    if (selectionSize > 0) sel.take(selectionSize) else sel
  }

  override def transform(dataset: Dataset[_]): DataFrame = {
    // codegen'd Catalyst projection (graft.functions.VectorCompress) —
    // the per-row UDF this replaced paid a VectorUDT deserialize →
    // closure → re-serialize round trip on the one operator every
    // downstream pipeline runs per row; [[ReliefFRSelectorModel.compress]]
    // remains as the semantic reference and spec cross-check
    val selection = getSelectedFeatures().sorted // compress requires ascending
    import graft.functions.ColumnBridge
    val compressed = ColumnBridge.column(graft.functions.VectorCompress(
      ColumnBridge.expression(col($(inputCol))), selection))
    dataset.withColumn($(outputCol), compressed)
      .withMetadata($(outputCol), prepOutputField(dataset.schema, selection).metadata)
  }

  /** Output-column ML attribute metadata: the input's per-feature
    * attributes filtered down to the selection (reference
    * ReliefFRSelector.scala:828-840), so downstream stages keep names
    * and slot counts.
    */
  private def prepOutputField(schema: StructType, selection: Array[Int]): StructField = {
    import org.apache.spark.ml.attribute.{Attribute, AttributeGroup, NumericAttribute}
    val orig = AttributeGroup.fromStructField(schema($(inputCol)))
    val attrs: Array[Attribute] = orig.attributes match {
      case Some(as) => selection.filter(_ < as.length).map(as(_))
      case None => Array.fill[Attribute](selection.length)(NumericAttribute.defaultAttr)
    }
    new AttributeGroup($(outputCol), attrs).toStructField()
  }

  override def transformSchema(schema: StructType): StructType =
    StructType(schema.fields :+
      prepOutputField(schema, getSelectedFeatures().sorted).copy(name = $(outputCol)))

  override def copy(extra: ParamMap): ReliefFRSelectorModel = {
    val copied = new ReliefFRSelectorModel(uid, stdSelection, redundancySelection,
      numFeatures, defaultWeight, weightedFeatures, weightedValues)
    copyValues(copied, extra).setParent(parent)
  }

  override def write: MLWriter = new ReliefFRSelectorModel.Writer(this)
}

object ReliefFRSelectorModel extends MLReadable[ReliefFRSelectorModel] {

  /** Project a vector onto `selection` (ascending feature indices),
    * re-indexed to 0..selection.length-1.
    */
  def compress(v: Vector, selection: Array[Int]): Vector = v match {
    case d: DenseVector =>
      Vectors.dense(selection.map(d.values(_)))
    case s: SparseVector =>
      val idx = new scala.collection.mutable.ArrayBuffer[Int]
      val vals = new scala.collection.mutable.ArrayBuffer[Double]
      var a = 0; var b = 0
      while (a < selection.length && b < s.indices.length) {
        if (selection(a) == s.indices(b)) {
          idx += a; vals += s.values(b); a += 1; b += 1
        } else if (selection(a) < s.indices(b)) a += 1
        else b += 1
      }
      Vectors.sparse(selection.length, idx.toArray, vals.toArray)
  }

  // persisted sparsely too: the weight payload is bounded by active
  // dims, so a kddb-scale model round-trips in KBs, not hundreds of MB
  private case class ModelData(
      stdSelection: Seq[Int], redundancySelection: Seq[Int],
      numFeatures: Int, defaultWeight: Double,
      weightedFeatures: Seq[Int], weightedValues: Seq[Double])

  private[ml] class Writer(instance: ReliefFRSelectorModel) extends MLWriter {
    override protected def saveImpl(path: String): Unit = {
      GraftPersist.saveMetadata(instance, path, sparkSession)
      val data = ModelData(instance.stdSelection.toSeq,
        instance.redundancySelection.toSeq, instance.numFeatures,
        instance.defaultWeight, instance.weightedFeatures.toSeq,
        instance.weightedValues.toSeq)
      sparkSession.createDataFrame(Seq(data)).repartition(1)
        .write.mode("overwrite").parquet(GraftPersist.dataPath(path))
    }
  }

  private class Reader extends MLReader[ReliefFRSelectorModel] {
    override def load(path: String): ReliefFRSelectorModel = {
      val row = sparkSession.read.parquet(GraftPersist.dataPath(path))
        .select("stdSelection", "redundancySelection", "numFeatures",
          "defaultWeight", "weightedFeatures", "weightedValues").head()
      val model = new ReliefFRSelectorModel(
        GraftPersist.loadUid(path, sparkSession),
        row.getAs[Seq[Int]](0).toArray,
        row.getAs[Seq[Int]](1).toArray,
        row.getInt(2), row.getDouble(3),
        row.getAs[Seq[Int]](4).toArray,
        row.getAs[Seq[Double]](5).toArray)
      GraftPersist.applyParams(model, path, sparkSession)
      model
    }
  }

  override def read: MLReader[ReliefFRSelectorModel] = new Reader
}

/** Hand-rolled metadata persistence (uid + explicitly-set params as
  * param-encoded JSON strings). Spark's DefaultParamsWriter/Reader are
  * private[ml], so a graft-local equivalent: one parquet row of
  * (uid, map<paramName, jsonValue>) — works on any Hadoop filesystem,
  * no driver-local file I/O.
  */
private[ml] object GraftPersist {
  def dataPath(path: String): String = s"$path/data"
  private def metaPath(path: String): String = s"$path/graft_metadata"

  def saveMetadata(instance: Params with Identifiable, path: String,
      spark: SparkSession): Unit = {
    val params: Map[String, String] = instance.params.flatMap { p =>
      instance.get(p).map(v => p.name -> p.asInstanceOf[org.apache.spark.ml.param.Param[Any]].jsonEncode(v))
    }.toMap
    spark.createDataFrame(Seq((instance.uid, params)))
      .toDF("uid", "params").repartition(1)
      .write.mode("overwrite").parquet(metaPath(path))
  }

  def loadUid(path: String, spark: SparkSession): String =
    spark.read.parquet(metaPath(path)).select("uid").head().getString(0)

  def applyParams(instance: Params, path: String, spark: SparkSession): Unit = {
    val params = spark.read.parquet(metaPath(path))
      .select("params").head().getAs[Map[String, String]](0)
    params.foreach { case (name, json) =>
      if (instance.hasParam(name)) {
        val p = instance.getParam(name)
        instance.set(p, p.jsonDecode(json))
      }
    }
  }
}

/** Writer/Reader for params-only instances (the estimator). */
private[ml] class GraftParamsWriter(instance: Params with Identifiable) extends MLWriter {
  override protected def saveImpl(path: String): Unit =
    GraftPersist.saveMetadata(instance, path, sparkSession)
}

private[ml] class GraftParamsReader[T <: Params](ctor: String => T) extends MLReader[T] {
  override def load(path: String): T = {
    val inst = ctor(GraftPersist.loadUid(path, sparkSession))
    GraftPersist.applyParams(inst, path, sparkSession)
    inst
  }
}
