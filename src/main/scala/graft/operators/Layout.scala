package graft.operators

import graft.{Q, Tables}
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Multi-dimensional data layout — Z-order (Morton) clustering for
  * scan pruning. The reference's only layout lever is single-column
  * date partitioning of archives (archiver + datalake sinks); a 100 TB
  * analytics table queried by MORE THAN ONE dimension (user × time,
  * part × supplier) needs a space-filling-curve sort so parquet
  * row-group min/max stats stay tight on BOTH keys: files then prune
  * for predicates on either dimension, which one-column sorting gives
  * only to the leading key.
  *
  * zValue interleaves the low 16 bits of two keys into one long with
  * pure shift/mask/add arithmetic — the expression is a flat
  * codegen'd tree (no UDF), and the identical arithmetic runs in the
  * oracle. Writing `df.repartitionByRange(col("z")).sortWithinPartitions("z")`
  * then gives every output file a tight Morton range = a tight
  * rectangle in (x, y) space; LayoutSpec proves the resulting
  * per-file bounding boxes shrink vs the naive layout.
  */
object Layout {

  /** Morton/Z-value of the low 16 bits of x and y: bit i of x lands at
    * position 2i, bit i of y at 2i+1. Disjoint target bits → the
    * combination is a plain sum, all codegen-friendly integer ops.
    */
  def zValue(x: Column, y: Column): Column =
    (0 until 16).map { i =>
      shiftleft(shiftright(x, i).bitwiseAND(lit(1L)), 2 * i) +
        shiftleft(shiftright(y, i).bitwiseAND(lit(1L)), 2 * i + 1)
    }.reduce(_ + _)

  /** The same arithmetic as DuckDB SQL text. */
  def zValueSql(x: String, y: String): String =
    (0 until 16).map { i =>
      s"((($x >> $i) & 1) << ${2 * i}) + ((($y >> $i) & 1) << ${2 * i + 1})"
    }.mkString(" + ")

  /** Assign rows to Z-ordered buckets (files, at write time). The
    * tie-break columns make the ntile order TOTAL — equal z values
    * otherwise land in engine-dependent buckets at the boundaries.
    */
  def zBuckets(df: DataFrame, x: String, y: String, buckets: Int,
               tieBreak: Seq[String]): DataFrame =
    df.withColumn("z", zValue(col(x).cast("long"), col(y).cast("long")))
      .withColumn("bucket", ntile(buckets).over(
        org.apache.spark.sql.expressions.Window.orderBy(
          col("z") +: tieBreak.map(col): _*)))

  val defs: Map[String, Q] = Map(

    // Z-order lineitem by (partkey, suppkey) into 16 equal buckets and
    // report each bucket's bounding box in BOTH dimensions — the
    // figure of merit for multi-dimensional pruning (each bucket is
    // one file's min/max stats; tight boxes = skipped files for 2-D
    // predicates). The global ntile window is ONLY the verification
    // view: the production write path is repartitionByRange(z) (range
    // exchange by sampled split points, no single-partition window) +
    // sortWithinPartitions, demonstrated in LayoutSpec.
    "zo1_zorder_layout" -> ((s, dir) => {
      val li = Tables.lineitem(s, dir)
        .select(col("l_orderkey"), col("l_linenumber"), col("l_partkey"), col("l_suppkey"))
      zBuckets(li, "l_partkey", "l_suppkey", 16, Seq("l_orderkey", "l_linenumber"))
        .groupBy(col("bucket").cast("long").as("bucket"))
        .agg(count(lit(1)).as("n_rows"),
          min(col("l_partkey")).as("min_part"), max(col("l_partkey")).as("max_part"),
          min(col("l_suppkey")).as("min_supp"), max(col("l_suppkey")).as("max_supp"),
          min(col("z")).as("min_z"), max(col("z")).as("max_z"))
    })
  )

  val oracles: Map[String, String] = Map(
    "zo1_zorder_layout" -> {
      val z = zValueSql("l_partkey", "l_suppkey")
      s"""WITH zt AS (SELECT l_orderkey, l_linenumber, l_partkey, l_suppkey,
                        CAST($z AS BIGINT) AS z FROM lineitem),
          bt AS (SELECT *, CAST(NTILE(16) OVER (ORDER BY z, l_orderkey, l_linenumber) AS BIGINT)
                   AS bucket FROM zt)
          SELECT bucket, COUNT(*) AS n_rows,
            MIN(l_partkey) AS min_part, MAX(l_partkey) AS max_part,
            MIN(l_suppkey) AS min_supp, MAX(l_suppkey) AS max_supp,
            MIN(z) AS min_z, MAX(z) AS max_z
          FROM bt GROUP BY bucket"""
    }
  )
}
