package graft.operators

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

/** Invariants for the layout / linkage / search operators the oracle
  * gate can't express: Z-order actually tightens per-file bounding
  * boxes vs the naive layout, the production Z-write path prunes, and
  * blocked fuzzy linkage has recall 1 on single-edit corruptions.
  */
class LayoutSpec extends SparkSpec {

  private val sfDir = "/root/testdata/sf0.001"
  private def li = {
    assume(new java.io.File(sfDir).exists())
    Tables.lineitem(spark, sfDir)
      .select(col("l_orderkey"), col("l_linenumber"), col("l_partkey"), col("l_suppkey"))
  }

  test("z-order buckets have tighter 2-D bounding boxes than row-order buckets") {
    val n = 16
    // area of a bucket's (part, supp) bounding box, summed over buckets
    def boxArea(df: org.apache.spark.sql.DataFrame): Long =
      df.groupBy(col("bucket"))
        .agg(((max(col("l_partkey")) - min(col("l_partkey")) + 1) *
          (max(col("l_suppkey")) - min(col("l_suppkey")) + 1)).as("area"))
        .agg(sum(col("area"))).first().getLong(0)
    val zArea = boxArea(Layout.zBuckets(li, "l_partkey", "l_suppkey", n))
    val naive = li.withColumn("bucket", ntile(n).over(
      org.apache.spark.sql.expressions.Window.orderBy(col("l_orderkey"), col("l_linenumber"))))
    val nArea = boxArea(naive)
    // arrival order is uncorrelated with (part, supp): every naive
    // bucket spans ~the whole plane. Z-order must cut total box area
    // by a large factor — this is the file-skipping win.
    assert(zArea * 4 < nArea, s"z-order area $zArea not << naive $nArea")
  }

  test("z-ordered parquet write prunes row groups for a 2-D predicate") {
    val dir = java.nio.file.Files.createTempDirectory("graft-zorder").toString
    // production path: range-exchange on z (sampled split points, no
    // global window), sort within partitions, one file per partition
    li.withColumn("z", Layout.zValue(col("l_partkey").cast("long"), col("l_suppkey").cast("long")))
      .repartitionByRange(8, col("z"))
      .sortWithinPartitions(col("z"))
      .write.mode("overwrite").parquet(dir)
    val back = spark.read.parquet(dir)
      .filter(col("l_partkey") < 8 && col("l_suppkey") < 8)
    // correctness of the layout roundtrip
    val expected = li.filter(col("l_partkey") < 8 && col("l_suppkey") < 8).count()
    assert(back.count() === expected)
    // a low-corner predicate maps to a low z range: files whose
    // z-derived (part, supp) mins exceed the corner can be skipped.
    // Parquet stats are per column; verify the written files' own
    // min/max footers make at least half the files skippable.
    val files = new java.io.File(dir).listFiles().filter(_.getName.endsWith(".parquet"))
    val skippable = files.count { f =>
      val head = spark.read.parquet(f.getAbsolutePath)
        .agg(min(col("l_partkey")), min(col("l_suppkey"))).first()
      head.getLong(0) >= 8 || head.getLong(1) >= 8
    }
    assert(skippable >= files.length / 2,
      s"only $skippable of ${files.length} z-files skippable for the corner predicate")
  }

  test("fuzzy linkage: every single-deletion corruption links back to its master") {
    val out = graft.SparkEntry.queries("rl1_fuzzy_link")(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val masters = Tables.customer(spark, sfDir).count()
    // recall 1: each dirty key must match its own master (pigeonhole
    // guarantees the candidate is generated; verify keeps dist <= 1)
    val selfMatches = out.filter(r => r._1 == r._2)
    assert(selfMatches.length === masters.toInt)
    // the corruption is one deletion: distance exactly 1 on self-matches
    selfMatches.foreach { case (_, _, d) => assert(d === 1L) }
  }
}
