package graft.queries

import java.nio.file.{Files, Paths}

import graft.SparkSpec

/** Round-11 additions: the reliable-checkpoint durability knob, w26
  * probe inversion (PlanSpec carries the plan pin), g06 oriented
  * triangles, and the README preprocessing parity path.
  */
class Round15Spec extends SparkSpec {

  // ------------------------------------------- reliable checkpointing

  private def withReliableCheckpoints[A](body: => A): A = {
    val dir = "/tmp/graft_ckpt_spec"
    val d = Paths.get(dir)
    if (Files.exists(d)) {
      Files.walk(d).sorted(java.util.Comparator.reverseOrder())
        .forEach(p => Files.delete(p))
    }
    spark.conf.set("spark.graft.checkpoint.reliable", "true")
    spark.conf.set("spark.graft.checkpoint.dir", dir)
    try body
    finally {
      spark.conf.unset("spark.graft.checkpoint.reliable")
      spark.conf.unset("spark.graft.checkpoint.dir")
    }
  }

  private def reliableDirHasData: Boolean = {
    val d = Paths.get("/tmp/graft_ckpt_spec")
    Files.exists(d) && {
      val s = Files.walk(d)
      try s.anyMatch(p => Files.isRegularFile(p))
      finally s.close()
    }
  }

  test("g02: reliable-checkpoint mode writes durable rounds and yields identical communities") {
    val default = graft.graph.Graph.g02LabelPropagation(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getString(1))).sortBy(_._1).toSeq
    val reliable = withReliableCheckpoints {
      graft.graph.Graph.g02LabelPropagation(spark, sfDir).collect()
        .map(r => (r.getString(0), r.getString(1))).sortBy(_._1).toSeq
    }
    assert(default.nonEmpty && reliable == default,
      s"modes differ:\nreliable=$reliable\ndefault=$default")
    // the knob actually engaged: rounds were written to the configured
    // filesystem, which is what survives an executor loss
    assert(reliableDirHasData, "no reliable checkpoint files were written")
  }

  test("e23 descent: reliable-checkpoint mode yields the identical kNN graph") {
    def graph() = graft.sim.Sim.e23KnnGraphRounds(spark, sfDir, 2).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getLong(3)))
      .sortBy(t => (t._1, t._4)).toSeq
    val default = graph()
    val reliable = withReliableCheckpoints(graph())
    assert(default.nonEmpty && reliable == default)
    assert(reliableDirHasData, "no reliable checkpoint files were written")
  }
}
