package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** The native expressions must be drop-in replacements: bit-identical
  * to the composable formulations they shortcut.
  */
class FunctionsSpec extends SparkSpec {

  test("graft_dot is bit-identical to the zip_with/aggregate fold") {
    val df = graft.Tables.embeddings(spark, sfDir)
      .select(expr("transform(embedding, x -> cast(x as double))").as("v"))
      .limit(100)
      .select(
        expr("graft_dot(v, v)").as("native"),
        expr("aggregate(zip_with(v, v, (x, y) -> x*y), 0D, (acc, x) -> acc + x)").as("fold"))
    assert(df.where(col("native") =!= col("fold")).count() == 0)
  }

  test("graft_minhash is bit-identical to the transform/array_min form") {
    val k = graft.dedup.Dedup.NumHashes
    val P = graft.dedup.Dedup.P
    val df = graft.Tables.documents(spark, sfDir)
      .select(split(trim(lower(col("text"))), "\\s+").as("toks"))
      .where(size(col("toks")) >= 3)
      .select(expr("transform(toks, t -> graft_polyhash(t, 17, 31))").as("shash"))
      .select(
        expr(s"graft_minhash(shash, $k)").as("native"),
        expr(s"transform(sequence(0, ${k - 1}), s -> array_min(transform(shash, h -> " +
          s"(((s+1) * 906150257L) % $P * pmod(h, $P) + (s * 741103597L + 13L) % $P) % $P)))").as("fold"))
    assert(df.count() > 0)
    assert(df.where(not(col("native") <=> col("fold"))).count() == 0)
  }

  test("graft_polyhash is bit-identical to the split/ascii aggregate fold") {
    val P = graft.dedup.Dedup.P
    val df = graft.Tables.documents(spark, sfDir)
      .select(
        expr("graft_polyhash(text, 17, 31)").as("native"),
        expr(s"aggregate(split(text, ''), 17L, (b, c) -> (b * 31 + ascii(c)) % $P)").as("fold"))
    assert(df.count() > 0)
    assert(df.where(col("native") =!= col("fold")).count() == 0)
  }

  test("graft_simhash is bit-identical to the aggregate/zip_with form") {
    val df = graft.Tables.documents(spark, sfDir)
      .select(split(trim(lower(col("text"))), "\\s+").as("toks"))
      .where(size(col("toks")) >= 1)
      .select(expr("transform(toks, t -> xxhash64(t))").as("thash"))
      .select(
        expr("graft_simhash(thash)").as("native"),
        expr(
          """aggregate(zip_with(
            |  aggregate(thash, transform(sequence(0, 63), b -> 0L),
            |    (acc, h) -> zip_with(acc,
            |       transform(sequence(0, 63), b -> shiftright(h, b) & 1),
            |       (x, y) -> x + 2*y - 1)),
            |  sequence(0, 63),
            |  (c, b) -> if(c > 0, shiftleft(1L, b), 0L)), 0L, (a, x) -> a | x)""".stripMargin).as("fold"))
    assert(df.count() > 0)
    assert(df.where(col("native") =!= col("fold")).count() == 0)
  }

  test("graft_sigmatch is bit-identical to the zip_with/filter form") {
    val k = graft.dedup.Dedup.NumHashes
    val docs = graft.dedup.Dedup.withSignature(graft.dedup.Dedup.shingled(
      graft.Tables.documents(spark, sfDir))).select("doc_id", "sig")
    // self-join a small sample so pairs have both agreements and not
    val a = docs.limit(30).select(col("doc_id").as("ida"), col("sig").as("sig_a"))
    val b = docs.limit(30).select(col("doc_id").as("idb"), col("sig").as("sig_b"))
    val df = a.crossJoin(b).select(
      expr("graft_sigmatch(sig_a, sig_b)").as("native"),
      expr("size(filter(zip_with(sig_a, sig_b, (x, y) -> x = y), v -> v))").as("fold"))
    assert(df.count() > 0)
    assert(df.where(col("native") =!= col("fold")).count() == 0)
    // identity pairs must count every position
    assert(df.where(col("native") === k).count() >= 30)
  }

  test("graft_sigmatch runs inside whole-stage codegen") {
    val docs = graft.dedup.Dedup.withSignature(graft.dedup.Dedup.shingled(
      graft.Tables.documents(spark, sfDir))).select(col("sig"))
    val plan = docs
      .select(col("sig").as("sig_a"), col("sig").as("sig_b"))
      .select(expr("graft_sigmatch(sig_a, sig_b)"))
      .queryExecution.executedPlan.toString
    assert("""\*\(\d+\) Project \[graft_sigmatch""".r.findFirstIn(plan).isDefined,
      s"not codegen'd:\n$plan")
  }

  test("graft_minhash_str is bit-identical to the two-step polyhash+minhash path") {
    val k = graft.dedup.Dedup.NumHashes
    val df = graft.Tables.documents(spark, sfDir)
      .select(split(trim(lower(col("text"))), "\\s+").as("toks"))
      .where(size(col("toks")) >= 3)
      .withColumn("shingles", expr(
        "array_distinct(transform(sequence(0, size(toks)-3), " +
          "i -> concat(toks[i], ' ', toks[i+1], ' ', toks[i+2])))"))
      .select(
        expr(s"graft_minhash_str(shingles, $k)").as("fused"),
        expr(s"graft_minhash(transform(shingles, s -> graft_polyhash(s, 17, 31)), $k)").as("twostep"))
    assert(df.count() > 0)
    assert(df.where(not(col("fused") <=> col("twostep"))).count() == 0)
  }

  test("graft_minhash_str runs inside whole-stage codegen") {
    // split() is codegen-able, so the whole projection stays in the
    // generated stage (tokens are a valid array<string> input)
    val plan = graft.Tables.documents(spark, sfDir)
      .select(expr("graft_minhash_str(split(trim(lower(text)), '\\\\s+'), 8)"))
      .queryExecution.executedPlan.toString
    assert("""\*\(\d+\) Project \[graft_minhash_str""".r.findFirstIn(plan).isDefined,
      s"not codegen'd:\n$plan")
  }

  test("graft_simhash_str is bit-identical to the two-step polyhash+simhash path") {
    val P = graft.dedup.Dedup.P
    val df = graft.Tables.documents(spark, sfDir)
      .select(split(trim(lower(col("text"))), "\\s+").as("toks"))
      .where(size(col("toks")) >= 1)
      .select(
        expr("graft_simhash_str(toks)").as("fused"),
        expr(s"graft_simhash(transform(toks, t -> " +
          s"graft_polyhash(t, 17, 31) * ${P}L + graft_polyhash(t, 19, 37)))").as("twostep"))
    assert(df.count() > 0)
    assert(df.where(col("fused") =!= col("twostep")).count() == 0)
  }

  test("graft_simhash_str runs inside whole-stage codegen") {
    val plan = graft.Tables.documents(spark, sfDir)
      .select(expr("graft_simhash_str(split(trim(lower(text)), '\\\\s+'))"))
      .queryExecution.executedPlan.toString
    assert("""\*\(\d+\) Project \[graft_simhash_str""".r.findFirstIn(plan).isDefined,
      s"not codegen'd:\n$plan")
  }

  test("graft_hypersig is bit-identical to the composable hyperplane fold") {
    for (bits <- Seq(8, 16)) {
      val df = graft.Tables.embeddings(spark, sfDir)
        .select(col("embedding").cast("array<double>").as("v"))
        .select(
          expr(s"graft_hypersig(v, $bits)").as("native"),
          graft.sim.Sim.bucketColFallback(bits).as("fold"))
      assert(df.count() > 0)
      assert(df.where(col("native") =!= col("fold")).count() == 0, s"bits=$bits")
    }
  }

  test("graft_hypersig runs inside whole-stage codegen") {
    val plan = graft.Tables.embeddings(spark, sfDir)
      .select(col("embedding").cast("array<double>").as("v"))
      .select(expr("graft_hypersig(v, 16)"))
      .queryExecution.executedPlan.toString
    assert("""\*\(\d+\) Project \[graft_hypersig""".r.findFirstIn(plan).isDefined,
      s"not codegen'd:\n$plan")
  }

  test("native expressions run inside whole-stage codegen") {
    // cast (codegen-able), NOT transform (CodegenFallback — would push
    // the whole projection to interpreted mode)
    val plan = graft.Tables.embeddings(spark, sfDir)
      .select(col("embedding").cast("array<double>").as("v"))
      .select(expr("graft_dot(v, v)"))
      .queryExecution.executedPlan.toString
    // "*(n)" prefixes mark operators inside WholeStageCodegen stage n
    assert("""\*\(\d+\) Project \[graft_dot""".r.findFirstIn(plan).isDefined,
      s"not codegen'd:\n$plan")
  }
}
