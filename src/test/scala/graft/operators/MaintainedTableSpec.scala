package graft.operators

import java.nio.file.Files

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._

/** The maintained-table REFRESH CONTRACT (round-16 item #2): the
  * session-memoized index tables key on a content watermark of their
  * source corpus, so a corpus mutated at `dir` mid-session — exactly
  * what cd1/jd2/ll14 model — can never serve a stale index; and the
  * incremental splice (Dedup.refreshIncrementally) must land the SAME
  * table a full rebuild would, at delta cost.
  */
class MaintainedTableSpec extends SparkSpec {

  private def writeDocs(dir: String, rows: Seq[(Long, String)]): Unit = {
    val s = spark
    import s.implicits._
    rows.toDF("doc_id", "text").coalesce(1)
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
  }

  private def rowSet(df: DataFrame): Set[Row] = df.collect().toSet

  private val baseDocs = Seq(
    1L -> "the quick brown fox jumps over the lazy dog tonight",
    2L -> "pack my box with five dozen liquor jugs for delivery",
    3L -> "how vexingly quick daft zebras jump over fences daily",
    4L -> "sphinx of black quartz judge my vow before the dawn",
    5L -> "the five boxing wizards jump quickly over lazy hounds")

  test("snapshotVersion: file-metadata watermark moves on append and rewrite, not on re-read") {
    val dir = Files.createTempDirectory("graft-ver").toString
    writeDocs(dir, baseDocs)
    val v1 = Tables.snapshotVersion(spark, dir, "documents")
    assert(v1 == Tables.snapshotVersion(spark, dir, "documents"),
      "re-listing an untouched table must yield the same version")
    // append a file into the parquet directory (the incremental-crawl shape)
    val s = spark
    import s.implicits._
    Seq(6L -> "bright vixens jump dozy fowl quack and run away fast")
      .toDF("doc_id", "text")
      .write.mode("append").parquet(s"$dir/documents.parquet")
    val v2 = Tables.snapshotVersion(spark, dir, "documents")
    assert(v2 != v1, "an appended file must move the watermark")
    writeDocs(dir, baseDocs) // in-place rewrite back to the old CONTENT
    assert(Tables.snapshotVersion(spark, dir, "documents") != v2,
      "a rewrite must move the watermark even when row content repeats")
  }

  test("planner statistics refresh when the table behind them changes") {
    val dir = Files.createTempDirectory("graft-stat").toString
    writeDocs(dir, baseDocs)
    assert(Tables.maxIdStat(spark, dir, "documents", "doc_id") == 5L)
    assert(Tables.countStat(spark, dir, "documents") == 5L)
    val s = spark
    import s.implicits._
    Seq(9L -> "a new crawl arrived and the statistics must follow it")
      .toDF("doc_id", "text")
      .write.mode("append").parquet(s"$dir/documents.parquet")
    assert(Tables.maxIdStat(spark, dir, "documents", "doc_id") == 9L,
      "maxIdStat must not serve the pre-append memo")
    assert(Tables.countStat(spark, dir, "documents") == 6L,
      "countStat must not serve the pre-append memo")
  }

  test("a mutated corpus makes the next query read FRESH maintained indexes") {
    val dir = Files.createTempDirectory("graft-fresh").toString
    writeDocs(dir, baseDocs)
    // touch all three index tables so the session caches them
    val sh1 = rowSet(Dedup.shingleTable(spark, dir))
    val sg1 = rowSet(Dedup.signatureTable(spark, dir))
    val sm1 = rowSet(Dedup.simhashTable(spark, dir))
    // the corpus moves: doc 2 re-crawled with new content, doc 6 added,
    // doc 5 removed
    val moved = Seq(
      1L -> "the quick brown fox jumps over the lazy dog tonight",
      2L -> "an entirely rewritten page with different words inside it",
      3L -> "how vexingly quick daft zebras jump over fences daily",
      4L -> "sphinx of black quartz judge my vow before the dawn",
      6L -> "bright vixens jump dozy fowl quack and run away fast")
    writeDocs(dir, moved)
    val shFresh = rowSet(Dedup.shingleTable(spark, dir))
    val sgFresh = rowSet(Dedup.signatureTable(spark, dir))
    val smFresh = rowSet(Dedup.simhashTable(spark, dir))
    // truth: the per-doc derivations over the CURRENT corpus
    assert(shFresh == rowSet(Dedup.shingles(Dedup.corpus(spark, dir, perturb = true))),
      "shingle table served stale rows after the corpus moved")
    assert(sgFresh == rowSet(Dedup.minhashSignatures(
      Dedup.shingles(Dedup.corpus(spark, dir, perturb = true)))),
      "signature table served stale rows after the corpus moved")
    assert(smFresh == rowSet(Dedup.simhash(Dedup.corpus(spark, dir, perturb = true))),
      "simhash table served stale rows after the corpus moved")
    assert(shFresh != sh1 && sgFresh != sg1 && smFresh != sm1,
      "the fixture mutation must actually change every index")
  }

  test("incremental splice lands the exact table a full rebuild would") {
    val dir = Files.createTempDirectory("graft-incr").toString
    writeDocs(dir, baseDocs)
    // build the session caches on snapshot A
    Dedup.shingleTable(spark, dir).count()
    Dedup.signatureTable(spark, dir).count()
    Dedup.simhashTable(spark, dir).count()
    Search.postingsTable(spark, dir).count()
    Dedup.cdcChunkTable(spark, dir).count()
    // snapshot B: doc 2 changed, doc 5 removed, docs 6+7 added
    val movedDocs = Seq(
      1L -> "the quick brown fox jumps over the lazy dog tonight",
      2L -> "an entirely rewritten page with different words inside it",
      3L -> "how vexingly quick daft zebras jump over fences daily",
      4L -> "sphinx of black quartz judge my vow before the dawn",
      6L -> "bright vixens jump dozy fowl quack and run away fast",
      7L -> "jinxed wizards pluck ivy from the big quilt at noon")
    writeDocs(dir, movedDocs)
    // cd1-shaped manifest of A -> B
    val s = spark
    import s.implicits._
    val delta = Seq((2L, "changed"), (5L, "removed"), (6L, "added"), (7L, "added"))
      .toDF("doc_id", "status")
    assert(Dedup.refreshIncrementally(spark, dir, delta) == 5,
      "all five cached index tables must take the splice path (not a rebuild)")
    // the spliced tables must be row-for-row the full rebuild over B
    val corB = Dedup.corpus(spark, dir, perturb = true)
    assert(rowSet(Dedup.shingleTable(spark, dir)) == rowSet(Dedup.shingles(corB)),
      "spliced shingle table diverged from a full rebuild")
    assert(rowSet(Dedup.signatureTable(spark, dir)) ==
      rowSet(Dedup.minhashSignatures(Dedup.shingles(corB))),
      "spliced signature table diverged from a full rebuild")
    assert(rowSet(Dedup.simhashTable(spark, dir)) == rowSet(Dedup.simhash(corB)),
      "spliced simhash table diverged from a full rebuild")
    // the postings and CDC chunk indexes splice from RAW documents (no twins)
    assert(rowSet(Search.postingsTable(spark, dir)) ==
      rowSet(Search.postingsOf(Tables.documents(spark, dir))),
      "spliced postings table diverged from a full rebuild")
    assert(rowSet(Dedup.cdcChunkTable(spark, dir)) ==
      rowSet(Dedup.cdcChunks(Tables.documents(spark, dir))),
      "spliced CDC chunk table diverged from a full rebuild")
  }

  test("cp5's maintained attribution follows the watermark: a re-crawled corpus re-gates") {
    val s = spark
    import s.implicits._
    val dir = Files.createTempDirectory("graft-cp5att").toString
    // needs embeddings too: cp5att watermarks on documents AND embeddings
    val dim = 64
    def writeVecs(ids: Seq[Long]): Unit =
      ids.map(i => (i, Seq.tabulate(dim)(d => (((i * 31 + d) % 7).toFloat - 3f))))
        .toDF("vec_id", "embedding").coalesce(1)
        .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    writeDocs(dir, baseDocs)
    writeVecs(baseDocs.map(_._1))
    val before = rowSet(graft.SparkEntry.queries("cp5_pretraining_release")(spark, dir))
    // the corpus re-crawls: one doc's text changes entirely
    writeDocs(dir, baseDocs.map {
      case (2L, _) => 2L -> "a completely different page replaces the old one here today now truly"
      case other => other
    })
    val after = rowSet(graft.SparkEntry.queries("cp5_pretraining_release")(spark, dir))
    assert(after != before,
      "cp5 must re-attribute after the corpus moves — a stale cp5att means " +
        "the release ships gate verdicts for text that no longer exists")
    // and the fresh run equals a cold rebuild over the current corpus
    val cold = rowSet(graft.operators.Pipeline.cp5ReleaseOf(spark, dir,
      graft.operators.Pipeline.cp5AttributionOf(spark, dir,
        graft.operators.Pipeline.cp5TwinCorpus(spark, dir),
        graft.operators.Pipeline.cp5TwinVecs(spark, dir))))
    assert(after == cold, "the watermark rebuild must equal a cold attribution")
  }

  test("a superseded snapshot's scratch parquet is reclaimed; the live one stays") {
    val dir = Files.createTempDirectory("graft-reclaim").toString
    writeDocs(dir, baseDocs)
    def exists(p: String): Boolean = Files.exists(java.nio.file.Paths.get(p))
    Dedup.shingleTable(spark, dir).count()
    val p1 = Dedup.registeredScratchPath(spark, dir, "shtable").get
    assert(exists(p1), "the registered scratch path must exist after a build")
    // mutation 1: full rebuild path (materializedTable's version miss)
    writeDocs(dir, baseDocs :+ (6L -> "bright vixens jump dozy fowl quack and run away fast"))
    Dedup.shingleTable(spark, dir).count()
    val p2 = Dedup.registeredScratchPath(spark, dir, "shtable").get
    assert(p2 != p1 && exists(p2), "a rebuild registers a fresh versioned path")
    assert(!exists(p1), "the superseded scratch parquet must be deleted (r16 ADVICE)")
    // mutation 2: the splice path (refreshIncrementally) reclaims too
    writeDocs(dir, baseDocs :+ (6L -> "bright vixens jump dozy fowl quack and run away fast")
      :+ (7L -> "jinxed wizards pluck ivy from the big quilt at noon"))
    val s = spark
    import s.implicits._
    Dedup.refreshIncrementally(spark, dir, Seq((7L, "added")).toDF("doc_id", "status"))
    val p3 = Dedup.registeredScratchPath(spark, dir, "shtable").get
    assert(p3 != p2 && exists(p3), "a splice registers a fresh versioned path")
    assert(!exists(p2), "the spliced-over scratch parquet must be deleted (r16 ADVICE)")
  }

  test("refreshIncrementally on an untouched corpus is a no-op; unbuilt tables stay unbuilt") {
    val dir = Files.createTempDirectory("graft-noop").toString
    writeDocs(dir, baseDocs)
    val before = rowSet(Dedup.shingleTable(spark, dir))
    val s = spark
    import s.implicits._
    val empty = Seq.empty[(Long, String)].toDF("doc_id", "status")
    assert(Dedup.refreshIncrementally(spark, dir, empty) == 0,
      "an unchanged corpus must not splice anything")
    assert(rowSet(Dedup.shingleTable(spark, dir)) == before)
    // a dir whose tables were never built: refresh must not create them
    val coldDir = Files.createTempDirectory("graft-cold").toString
    writeDocs(coldDir, baseDocs)
    assert(Dedup.refreshIncrementally(spark, coldDir, empty) == 0)
  }
}
