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

  test("hilbert index: bijective and continuous on the full order-4 curve; 16-bit form matches the twin") {
    val sess = spark
    import sess.implicits._
    // the full 16x16 grid through the SAME fold expression at 4 bits:
    // exhaustive bijectivity + continuity
    val grid = (for (i <- 0 until 16; j <- 0 until 16)
      yield (i.toLong, j.toLong)).toDF("sx", "sy")
    val d = grid.withColumn("d", expr(Layout.hilbertSql("sx", "sy", bits = 4)))
      .select("sx", "sy", "d").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val order = d.map { case (i, j, v) => (v, (i, j)) }.sortBy(_._1)
    assert(order.map(_._1).toSeq === (0L until 256L).toSeq,
      "hilbert4 must be a bijection onto 0..255")
    // continuity: each step of the curve moves to a 4-adjacent cell —
    // the property Morton order lacks (its seam jumps) and the reason
    // hilbert files have tighter boxes on range scans
    order.map(_._2).toSeq.sliding(2).foreach {
      case Seq((i1, j1), (i2, j2)) =>
        assert((i1 - i2).abs + (j1 - j2).abs === 1L,
          s"curve jumps from ($i1,$j1) to ($i2,$j2)")
      case _ =>
    }
    // production 16-bit forms: the interpreted fold expression, the
    // codegen'd native expression and the driver twin must agree on a
    // deterministic point sample across the full domain
    val pts = (0 until 500).map { k =>
      val x = (k * 2654435761L) & 0xffffL
      val y = (k * 40503L + 17L) & 0xffffL
      (x, y)
    }
    graft.functions.HilbertIndexExpr.register(spark)
    val got = pts.toDF("sx", "sy")
      .withColumn("d", expr(Layout.hilbertSql("sx", "sy")))
      .withColumn("dn", expr("hilbert_index(sx, sy)"))
      .collect().map(r => ((r.getLong(0), r.getLong(1)), (r.getLong(2), r.getLong(3)))).toMap
    pts.foreach { case (x, y) =>
      val twin = Layout.hilbertAt(x, y)
      assert(got((x, y)) === ((twin, twin)),
        s"hilbert($x,$y): fold/native/twin disagree: ${got((x, y))} vs $twin")
    }
  }

  test("hilbert buckets cut total bounding-box area like z-order does") {
    val n = 16
    def boxArea(df: org.apache.spark.sql.DataFrame): Long =
      df.groupBy(col("bucket"))
        .agg(((max(col("l_partkey")) - min(col("l_partkey")) + 1) *
          (max(col("l_suppkey")) - min(col("l_suppkey")) + 1)).as("area"))
        .agg(sum(col("area"))).first().getLong(0)
    val hArea = boxArea(Layout.hBuckets(li, "l_partkey", "l_suppkey", n))
    val naive = li.withColumn("bucket", ntile(n).over(
      org.apache.spark.sql.expressions.Window.orderBy(col("l_orderkey"), col("l_linenumber"))))
    assert(hArea * 4 < boxArea(naive), s"hilbert area $hArea not << naive")
  }
}
