package graft.streaming

import java.nio.file.Files

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** The ReleaseStream end-to-end pins, split out of StreamingSpec so
  * the suite's three heaviest tests (the cp6-equivalence fold, replay
  * idempotence, and state compaction — ~5.5 min together) ride their
  * own forked test-group JVM; see build.sbt's testGrouping. Content is
  * verbatim from StreamingSpec — nothing weakened, only relocated.
  */
class StreamingReleaseSpec extends SparkSpec with ReleaseFixtures {

  test("streaming pretraining release: the fold equals batch cp6 at EVERY batch " +
    "boundary, including retro re-cuts across release boundaries") {
    assume(new java.io.File(releaseSfDir).exists())
    val rows = releaseRows()
    val slices = Seq(rows.slice(0, 333), rows.slice(333, 666), rows.slice(666, rows.length))
    val sess = spark
    import sess.implicits._
    implicit val sq = spark.sqlContext
    val input = MemoryStream[(Long, String, Seq[Float])]
    val base = Files.createTempDirectory("release_stream").toString
    val state = s"$base/state"
    val q = ReleaseStream.start(
      input.toDF().toDF("doc_id", "text", "embedding"),
      releaseSfDir, state, s"$base/ckpt")
    try {
      var hi = 0L
      slices.foreach { slice =>
        input.addData(slice.toIndexedSeq)
        q.processAllAvailable()
        hi = slice.last._1
        val got = releaseSet(ReleaseStream.readRelease(spark, state))
        // the batch pipeline on the union of everything arrived so far
        val prefixCor = graft.operators.Pipeline.cp6Corpus(spark, releaseSfDir)
          .filter(col("doc_id") <= hi)
        val prefixVecs = graft.operators.Pipeline.cp5TwinVecs(spark, releaseSfDir)
          .filter(col("vec_id") <= hi)
        val want = releaseSet(graft.operators.Pipeline.cp5ReleaseOf(spark, releaseSfDir,
          graft.operators.Pipeline.cp6AttributionOf(
            spark, releaseSfDir, prefixCor, prefixVecs), withCut = true))
        assert(got === want,
          s"stream fold diverged from batch-on-union at boundary id<=$hi: " +
            s"stream-only=${(got -- want).take(5)} batch-only=${(want -- got).take(5)}")
        assert(got.exists(_._1 == "cut:substr"), "the cut row must be present")
        assertReleaseConservation(got, s"at boundary id<=$hi")
      }
      // the retro case actually crossed a release boundary: some doc
      // that arrived (and was designed into a release) in an EARLIER
      // batch gained a cut version in a LATER batch — the planted
      // passage holders straddle the slice boundaries
      val cutVersions = spark.read.parquet(s"$state/cuts")
        .select(col("doc_id"), col("batch_id").cast("long").as("b")).collect()
        .map(r => (r.getLong(0), r.getLong(1)))
      val arrivalBatch = slices.zipWithIndex.flatMap { case (sl, i) =>
        sl.map(r => r._1 -> i.toLong)
      }.toMap
      assert(cutVersions.exists { case (d, b) => arrivalBatch(d) < b },
        "a retro re-cut must have crossed at least one release boundary")
      // the final boundary IS the batch cp6 release on the full corpus
      val cp6 = releaseSet(
        graft.SparkEntry.queries("cp6_release_substr")(spark, releaseSfDir))
      assert(releaseSet(ReleaseStream.readRelease(spark, state)) === cp6,
        "after the full crawl, the stream's release must equal the cp6 query")
    } finally q.stop()
  }

  test("release stream replay is idempotent: crash re-delivery and late re-delivery change nothing") {
    assume(new java.io.File(releaseSfDir).exists())
    val rows = releaseRows()
    val sess = spark
    import sess.implicits._
    val b1 = rows.slice(0, 400).toIndexedSeq.toDF("doc_id", "text", "embedding")
    val b2 = rows.slice(400, 700).toIndexedSeq.toDF("doc_id", "text", "embedding")
    val base = Files.createTempDirectory("release_replay").toString
    val state = s"$base/state"
    ReleaseStream.processBatch(spark, b1, releaseSfDir, state, 0L)
    ReleaseStream.processBatch(spark, b2, releaseSfDir, state, 1L)
    val release = releaseSet(ReleaseStream.readRelease(spark, state))
    val att = ReleaseStream.readAttrition(spark, state)
      .collect().map(r => (r.getLong(0), r.getLong(1), Option(r.getString(2)))).toSet
    // crash window: batch 1 re-delivered under the SAME id (foreachBatch
    // at-least-once) — every output overwrites its own partition
    ReleaseStream.processBatch(spark, b2, releaseSfDir, state, 1L)
    assert(releaseSet(ReleaseStream.readRelease(spark, state)) === release)
    assert(ReleaseStream.readAttrition(spark, state)
      .collect().map(r => (r.getLong(0), r.getLong(1), Option(r.getString(2)))).toSet === att,
      "same-batch replay must not duplicate or re-gate attrition rows")
    // source-level re-delivery in a LATER batch: first-write-wins
    ReleaseStream.processBatch(spark, b2, releaseSfDir, state, 2L)
    assert(releaseSet(ReleaseStream.readRelease(spark, state)) === release,
      "a late re-delivered batch must not change the release design")
    assert(ReleaseStream.readAttrition(spark, state)
      .collect().map(r => (r.getLong(0), r.getLong(1), Option(r.getString(2)))).toSet === att,
      "a late re-delivered batch must not re-attribute any document")
  }

  test("release-stream state compaction: readers see identical state through fewer " +
    "files, the fold continues correctly, and pre-compaction replay is a no-op") {
    assume(new java.io.File(releaseSfDir).exists())
    val rows = releaseRows()
    val sess = spark
    import sess.implicits._
    val b1 = rows.slice(0, 333).toIndexedSeq.toDF("doc_id", "text", "embedding")
    val b2 = rows.slice(333, 666).toIndexedSeq.toDF("doc_id", "text", "embedding")
    val b3 = rows.slice(666, rows.length).toIndexedSeq.toDF("doc_id", "text", "embedding")
    val base = Files.createTempDirectory("release_compact").toString
    val state = s"$base/state"
    ReleaseStream.processBatch(spark, b1, releaseSfDir, state, 0L)
    ReleaseStream.processBatch(spark, b2, releaseSfDir, state, 1L)
    def attSet() = ReleaseStream.readAttrition(spark, state)
      .collect().map(r => (r.getLong(0), r.getLong(1), Option(r.getString(2)))).toSet
    def partFiles(store: String): Int = {
      val d = new java.io.File(s"$state/$store")
      def walk(f: java.io.File): Seq[java.io.File] =
        if (f.isDirectory) f.listFiles().toSeq.flatMap(walk) else Seq(f)
      walk(d).count(_.getName.endsWith(".parquet"))
    }
    val release = releaseSet(ReleaseStream.readRelease(spark, state))
    val att = attSet()
    val filesBefore = ReleaseStream.stores.map(s => s -> partFiles(s)).toMap
    ReleaseStream.compactState(spark, state, targetFiles = 1)
    // the compacted state is byte-equivalent to every reader…
    assert(releaseSet(ReleaseStream.readRelease(spark, state)) === release,
      "compaction must not change the latest release design")
    assert(attSet() === att, "compaction must not change the attrition ledger")
    // …through a BOUNDED file count (the small-file tax is the point)
    ReleaseStream.stores.foreach { s =>
      assert(partFiles(s) <= math.max(2, filesBefore(s)),
        s"store $s must not gain files under compaction")
    }
    assert(partFiles("att") <= 2 && partFiles("rollup") <= 2,
      s"2-batch stores must compact to ~1 file, got att=${partFiles("att")} " +
        s"rollup=${partFiles("rollup")}")
    // retro deltas collapse to one row per doc under the fold — the
    // adj store is bounded by docs ever retro-cut, not retro events
    val adjRows = spark.read.parquet(s"$state/adj")
    assert(adjRows.count() === adjRows.select("doc_id").distinct().count(),
      "compaction must sum a doc's retro deltas to one row")
    // the fold continues over compacted state: the next boundary still
    // equals the batch release on the union of everything arrived
    ReleaseStream.processBatch(spark, b3, releaseSfDir, state, 2L)
    val want = releaseSet(graft.SparkEntry.queries("cp6_release_substr")(
      spark, releaseSfDir))
    assert(releaseSet(ReleaseStream.readRelease(spark, state)) === want,
      "post-compaction fold diverged from the batch release")
    // a replay of a PRE-compaction batch finds its docs in the
    // compacted ledger and anti-joins to a no-op
    val afterB3 = attSet()
    ReleaseStream.processBatch(spark, b2, releaseSfDir, state, 1L)
    assert(attSet() === afterB3 &&
      releaseSet(ReleaseStream.readRelease(spark, state)) === want,
      "replaying a compacted batch must be a no-op")
  }

  test("release stream FAILS LOUDLY on an out-of-order crawl: a fresh doc below " +
    "the ledger max breaks the fold contract") {
    assume(new java.io.File(releaseSfDir).exists())
    val rows = releaseRows()
    val sess = spark
    import sess.implicits._
    // deliver everything except one mid-range doc, then deliver it late
    val holdOut = rows(200)
    val b1 = rows.slice(0, 400).filterNot(_._1 == holdOut._1)
      .toIndexedSeq.toDF("doc_id", "text", "embedding")
    val late = Seq(holdOut).toDF("doc_id", "text", "embedding")
    val state = Files.createTempDirectory("release_ooo").toString + "/state"
    ReleaseStream.processBatch(spark, b1, releaseSfDir, state, 0L)
    val ex = intercept[IllegalStateException] {
      ReleaseStream.processBatch(spark, late, releaseSfDir, state, 1L)
    }
    assert(ex.getMessage.contains("out-of-order"),
      s"the failure must name the broken contract: ${ex.getMessage}")
  }

}
