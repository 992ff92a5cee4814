package graft.ml

import org.apache.spark.ml.linalg.Vectors
import org.apache.spark.sql.SparkSession

/** Manual scale smoke for the RELIEF core: 20k rows × 100 features.
  * Usage: sbt "runMain graft.ml.ReliefStress"
  */
object ReliefStress {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    val nRows = 20000; val nFeat = 100
    val df = spark.range(nRows).map { i =>
      val rnd = new scala.util.Random(i)
      val label = (i % 2).toDouble
      val f0 = (if (label == 0.0) -1.0 else 1.0) + rnd.nextGaussian() * 0.3
      val arr = Array(f0) ++ Array.fill(nFeat - 1)(rnd.nextGaussian())
      (label, Vectors.dense(arr))
    }.toDF("label", "features").repartition(32).cache()
    df.count()
    val t0 = System.nanoTime()
    val m = new ReliefFRSelector()
      .setInputCol("features").setLabelCol("label").setOutputCol("out")
      .setNumTopFeatures(10).setNumNeighbors(5)
      .setEstimationRatio(0.05).setBatchSize(0.25)
      .setRedundancyRemoval(true).setSeed(1L)
      .fit(df)
    println(s"fit took ${(System.nanoTime() - t0) / 1e9}s; top=${m.stdSelection.take(5).mkString(",")}")
    assert(m.stdSelection.head == 0, "informative feature not recovered at 20k x 100")

    // ---- row-bounded batching: absolute cap forces more, smaller
    // batches (here: ~1000 query rows / 200 cap → ≥5 batches instead of
    // 4) — the driver-collected batch stays bounded at ANY data size
    val t0b = System.nanoTime()
    val mb = new ReliefFRSelector()
      .setInputCol("features").setLabelCol("label").setOutputCol("out")
      .setNumTopFeatures(10).setNumNeighbors(5)
      .setEstimationRatio(0.05).setBatchSize(0.25)
      .setMaxQueryRowsPerBatch(200)
      .setRedundancyRemoval(true).setSeed(1L)
      .fit(df)
    println(s"row-capped fit took ${(System.nanoTime() - t0b) / 1e9}s; top=${mb.stdSelection.take(5).mkString(",")}")
    assert(mb.stdSelection.head == 0, "informative feature not recovered with row-capped batches")

    // ---- high-dim sparse: 5k rows × 2M features (~50 active each) ----
    // above DenseFeatureLimit → feature-keyed sparse accumulation
    val bigFeat = 2000000
    val hd = spark.range(5000).map { i =>
      val rnd = new scala.util.Random(i)
      val label = (i % 2).toDouble
      val active = scala.collection.mutable.TreeMap[Int, Double](
        7 -> ((if (label == 0.0) -1.0 else 1.0) + rnd.nextGaussian() * 0.2))
      (0 until 50).foreach { _ => active(rnd.nextInt(bigFeat)) = rnd.nextGaussian() }
      (label, Vectors.sparse(bigFeat, active.toSeq))
    }.toDF("label", "features").repartition(32).cache()
    hd.count()
    val t1 = System.nanoTime()
    val mh = new ReliefFRSelector()
      .setInputCol("features").setLabelCol("label").setOutputCol("out")
      .setNumTopFeatures(10).setNumNeighbors(5)
      .setEstimationRatio(0.05).setBatchSize(0.5)
      .setRedundancyRemoval(true).setSeed(2L)
      .fit(hd)
    println(s"high-dim fit took ${(System.nanoTime() - t1) / 1e9}s; top=${mh.stdSelection.take(5).mkString(",")}")
    assert(mh.stdSelection.head == 7, "informative feature not recovered at 5k x 2M sparse")
    spark.stop()
  }
}
