package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** HLL sketch invariants: accuracy envelope, exact mergeability
  * (merge(sketch(A), sketch(B)) == sketch(A ∪ B) register-for-
  * register — what lets the reference store and later merge sketch
  * bytes, users_reporter.go:104-190), and the Spark udaf surface.
  */
class HllSpec extends SparkSpec {

  private val agg = new HllAggregator(12)

  // densified REGISTERS of a fold — sparse/dense buffering is an
  // internal layout; every invariant here is about the registers
  private def sketch(values: Seq[String]) =
    agg.registersOf(values.foldLeft(agg.zero)(agg.reduce))

  test("estimate within 5% at 50k distinct") {
    val est = HllAggregator.estimate(sketch((1 to 50000).map("v" + _)))
    assert(math.abs(est - 50000.0) / 50000.0 < 0.05, s"estimate $est")
  }

  test("small-range linear counting is near-exact") {
    val est = HllAggregator.estimate(sketch((1 to 100).map("v" + _)))
    assert(math.abs(est - 100.0) <= 3, s"estimate $est")
  }

  test("merge is exact: sketch(A union B) == merge(sketch(A), sketch(B))") {
    val a = (1 to 10000).map("a" + _)
    val b = (1 to 10000).map("b" + _) ++ (1 to 5000).map("a" + _) // overlap
    def buf(vs: Seq[String]) = vs.foldLeft(agg.zero)(agg.reduce)
    val merged = agg.registersOf(agg.merge(buf(a), buf(b)))
    val direct = sketch(a ++ b)
    assert(merged.toSeq === direct.toSeq, "register-wise max must be associative/idempotent")
  }

  test("sparse buffers: every merge combination densifies to the same registers") {
    // small sets stay in the sparse entry-log regime; a 1k set is
    // dense — all four merge arms must agree with the direct sketch
    def buf(vs: Seq[String]) = vs.foldLeft(agg.zero)(agg.reduce)
    val tiny1 = (1 to 20).map("x" + _)
    val tiny2 = (10 to 40).map("x" + _) // overlap
    val big = (1 to 5000).map("y" + _)
    assert(buf(tiny1)(0) === 0.toByte, "a 20-id group must stay sparse")
    assert(buf(big)(0) === 1.toByte, "a 5k-id group must have switched dense")
    // sparse + sparse
    assert(agg.registersOf(agg.merge(buf(tiny1), buf(tiny2))).toSeq ===
      sketch(tiny1 ++ tiny2).toSeq)
    // sparse + dense and dense + sparse
    assert(agg.registersOf(agg.merge(buf(tiny1), buf(big))).toSeq ===
      sketch(tiny1 ++ big).toSeq)
    assert(agg.registersOf(agg.merge(buf(big), buf(tiny1))).toSeq ===
      sketch(big ++ tiny1).toSeq)
    // the log keeps duplicate idx entries and densify maxes them
    val dup = (1 to 20).flatMap(i => Seq.fill(5)("x" + i))
    assert(sketch(dup).toSeq === sketch(tiny1).toSeq)
    // crossing the switch threshold mid-fold is lossless
    val crossing = (1 to 600).map("z" + _)
    assert(buf(crossing)(0) === 1.toByte)
    assert(HllAggregator.estimate(sketch(crossing)) ===
      agg.finish(buf(crossing)))
  }

  test("duplicates don't move the estimate") {
    val once = sketch((1 to 1000).map("v" + _))
    val thrice = sketch((1 to 1000).flatMap(i => Seq.fill(3)("v" + i)))
    assert(once.toSeq === thrice.toSeq)
  }

  test("second level: merging STORED sketch bytes equals sketching the raw union") {
    // the flusher path (a2d): level 1 persists registers per minute,
    // level 2 merges the stored bytes — the estimate must be the one
    // a single sketch over all the window's ids would give
    val sess = spark
    import sess.implicits._
    val df = (1 to 30000).map(i => (s"m${i % 7}", s"k${i % 5}", s"user_${i % 4000}"))
      .toDF("minute", "key", "uid")
    val sk = udaf(new HllSketchAggregator(12))
    val mg = udaf(new HllMergeAggregator(12))
    val store = java.nio.file.Files.createTempDirectory("graft_hll2").toString
    df.groupBy("minute", "key").agg(sk(col("uid")).as("registers"))
      .write.mode("overwrite").parquet(store)
    val twoLevel = spark.read.parquet(store)
      .groupBy("key").agg(mg(col("registers")).as("est"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val one = udaf(new HllAggregator(12))
    val oneLevel = df.groupBy("key").agg(one(col("uid")).as("est"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(twoLevel === oneLevel,
      "stored-sketch merge must be lossless vs the direct sketch")
  }

  test("second level: a precision-mismatched stored sketch fails fast, not silently") {
    // a sketch written at p=11 (1024 registers) reaching a p=12
    // merger must surface as a clear error — previously a longer
    // input was silently prefix-merged (under-count) and a shorter
    // one threw ArrayIndexOutOfBounds mid-loop
    val mg = new HllMergeAggregator(12)
    val short = new Array[Byte](1 << 11)
    val long = new Array[Byte](1 << 13)
    val e1 = intercept[IllegalArgumentException](mg.reduce(mg.zero, short))
    assert(e1.getMessage.contains("precision mismatch"))
    val e2 = intercept[IllegalArgumentException](mg.merge(mg.zero, long))
    assert(e2.getMessage.contains("precision mismatch"))
    // null stored rows still skip (a group with no sketch yet)
    assert(mg.reduce(mg.zero, null).toSeq === mg.zero.toSeq)
  }

  test("udaf surface: groupBy sketch counts track exact distincts") {
    val sess = spark
    import sess.implicits._
    val df = (1 to 20000).map(i => (s"g${i % 4}", s"user_${i % 3000}")).toDF("g", "uid")
    val hll = udaf(new HllAggregator(12))
    val rows = df.groupBy("g").agg(hll(col("uid")).as("est"), countDistinct(col("uid")).as("exact"))
      .collect()
    assert(rows.length === 4)
    rows.foreach { r =>
      val (est, exact) = (r.getLong(1), r.getLong(2))
      assert(math.abs(est - exact.toDouble) / exact < 0.05, s"group ${r.getString(0)}: $est vs $exact")
    }
  }
}
