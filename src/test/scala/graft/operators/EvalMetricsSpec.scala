package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Independent reference folds for the threshold-free classifier
  * metrics (ev9 AUC, ev10 lift/gain) and hand-computed cases for the
  * changepoint/interpolation analytics (q45, q46).
  *
  * ev9/ev10 never see a per-document global rank — they run the
  * two-level (4096-wide coarse bucket) histogram algebra — so the
  * reference here is the NAIVE driver-side computation over the same
  * (score, actual) pairs (obtained from ta10's scorer + ta2's verdict,
  * the exact inputs the queries consume): tie-aware Mann-Whitney AUC
  * and a literal sorted-rank decile pass. Every integer truncation is
  * reproduced, so equality is exact, not approximate.
  */
class EvalMetricsSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"
  private def haveData = new java.io.File(s"$dir/documents.parquet").exists()

  /** (doc_id, score, actual) for every doc — the shared input of ev9/ev10. */
  private def pairs(): Seq[(Long, Long, Long)] = {
    val scores = TextAnalysis.defs("ta10_quality_classifier")(spark, dir)
      .select(col("doc_id"), col("score"))
    val truth = TextAnalysis.withQualityVerdict(
        graft.Tables.documents(spark, dir)
          .withColumn("ws", split(col("text"), " ")))
      .select(col("doc_id"),
        when(col("verdict") === "keep", 1L).otherwise(0L).as("actual"))
    scores.join(truth, "doc_id").select(col("doc_id"), col("score"), col("actual"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
  }

  test("ev9 AUC equals the naive tie-aware Mann-Whitney over the same pairs") {
    assume(haveData)
    val ps = pairs()
    // naive: group by distinct score ascending, half-unit average ranks
    var cumBefore = 0L
    var rpos2 = BigInt(0)
    ps.groupBy(_._2).toSeq.sortBy(_._1).foreach { case (_, xs) =>
      val n = xs.size.toLong
      val p = xs.map(_._3).sum
      rpos2 += BigInt(p) * (2 * cumBefore + n + 1)
      cumBefore += n
    }
    val npos = ps.map(_._3).sum
    val nneg = ps.size - npos
    val expected =
      if (npos == 0 || nneg == 0) 0L
      else ((rpos2 - BigInt(npos) * (npos + 1)) * 1000000 /
        (2 * BigInt(npos) * nneg)).toLong
    val out = TextAnalysis.defs("ev9_auc")(spark, dir).collect()
    assert(out.length == 1)
    val r = out.head
    assert(r.getAs[Long]("npos") == npos)
    assert(r.getAs[Long]("nneg") == nneg)
    assert(r.getAs[Long]("auc_ppm") == expected)
    // a classifier trained against the verdict should beat coin-flip
    assert(r.getAs[Long]("auc_ppm") > 500000L)
  }

  test("ev10 lift table equals a literal sorted-rank decile pass") {
    assume(haveData)
    val ps = pairs()
    val n = ps.size.toLong
    val totPos = ps.map(_._3).sum
    // literal: rank ascending by (score, actual, doc_id) — the
    // query's exact tie order (negatives before positives within a
    // score, which is what makes the engine side histogram-pure);
    // it matters when a decile boundary cuts a tie group
    val ranked = ps.sortBy(p => (p._2, p._3, p._1)).zipWithIndex
      .map { case ((_, _, actual), i) => (i + 1L, actual) }
    val byDecile = ranked.groupBy { case (rank, _) => (n - rank) * 10 / n }
    val expect = byDecile.map { case (d, xs) =>
      d -> (xs.size.toLong, xs.map(_._2).sum)
    }
    val out = TextAnalysis.defs("ev10_lift_gain")(spark, dir)
      .orderBy("decile").collect()
    assert(out.length == expect.size)
    var cumDocs = 0L
    var cumPos = 0L
    out.foreach { r =>
      val d = r.getAs[Long]("decile")
      val (nd, np) = expect(d)
      assert(r.getAs[Long]("n_docs") == nd, s"decile $d n_docs")
      assert(r.getAs[Long]("n_pos") == np, s"decile $d n_pos")
      cumDocs += nd; cumPos += np
      assert(r.getAs[Long]("cum_docs") == cumDocs)
      assert(r.getAs[Long]("cum_pos") == cumPos)
      assert(r.getAs[Long]("gain_permille") == cumPos * 1000 / totPos)
    }
    // the last decile closes the books: all docs, all positives
    assert(cumDocs == n && cumPos == totPos)
  }

  test("q45 CUSUM: a planted level shift pinpoints the last pre-shift day") {
    val day = 86400000000L
    // counts per day: 1,1,1,1,5,5,5,5 -> mean 3, max |cusum| at day 3
    val rows = (0 until 8).flatMap { d =>
      val k = if (d < 4) 1 else 5
      (0 until k).map(i => (d * 10L + i, d * day + i * 1000L, 7L, "view", 1.0))
    }
    val sfDir = writeEvents(rows)
    val out = Sessions.defs("q45_cusum_changepoint")(spark, sfDir).collect()
    assert(out.length == 1)
    val r = out.head
    assert(r.getAs[String]("event_type") == "view")
    assert(r.getAs[Long]("change_day") == 3L)
    // s_scaled = n_days*cum - idx*total = 8*4 - 4*24 = -64
    assert(r.getAs[Long]("s_scaled") == -64L)
    assert(r.getAs[Long]("abs_s") == 64L)
    assert(r.getAs[Long]("n_days") == 8L)
    assert(r.getAs[Long]("total") == 24L)
  }

  test("q46 interpolation: events between two purchases take the exact linear value") {
    val rows = Seq(
      (1L, 1000000L, 7L, "purchase", 10.0),            // anchor: 1000c at t=1s
      (2L, 1250000L, 7L, "view", 0.0),                 // 25% of the way
      (3L, 1500000L, 7L, "click", 0.0),                // 50% of the way
      (4L, 2000000L, 7L, "purchase", 30.0),            // anchor: 3000c at t=2s
      (5L, 500000L, 7L, "view", 0.0),                  // before first anchor: dropped
      (6L, 2500000L, 7L, "view", 0.0))                 // after last anchor: dropped
    val sfDir = writeEvents(rows)
    val out = Sessions.defs("q46_interp_join")(spark, sfDir)
      .orderBy("event_type").collect()
    // 1000 + 2000 * 250000/1000000 = 1500 (view), = 2000 (click)
    assert(out.map(r => (r.getAs[String]("event_type"),
      r.getAs[Long]("n_events"), r.getAs[Long]("sum_interp_cents"))).toSeq ==
      Seq(("click", 1L, 2000L), ("view", 1L, 1500L)))
  }

  /** Minimal events-only sfDir (ts as raw nanos, the legacy loader branch). */
  private def writeEvents(events: Seq[(Long, Long, Long, String, Double)]): String = {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types._
    val schema = StructType(Seq(
      StructField("event_id", LongType), StructField("ts", LongType),
      StructField("user_id", LongType), StructField("event_type", StringType),
      StructField("value", DoubleType), StructField("props", StringType)))
    val d = java.nio.file.Files.createTempDirectory("graft-evalmetrics").toString
    val rows = events.map { case (id, tsUs, uid, tpe, v) =>
      Row(id, tsUs * 1000L, uid, tpe, v, "{}")
    }
    spark.createDataFrame(spark.sparkContext.parallelize(rows, 2), schema)
      .write.parquet(s"$d/events.parquet")
    d
  }
}
