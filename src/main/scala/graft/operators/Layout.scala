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

  /** Assign rows to Z-ordered buckets (files, at write time) by FIXED
    * split points: each key is rescaled to the 16-bit Morton domain
    * using its column min/max — the maintained table stats every
    * catalog already has (here one metadata-sized 4-value aggregate) —
    * then bucket = (z >> (32 - log2(buckets))) + 1, an equal-WIDTH
    * grid of Morton ranges, each a rectangle in (x, y) space. Pure
    * per-row arithmetic after the stats lookup: no sampling pass, no
    * global window, every executor assigns its rows independently —
    * the property that matters at 100 TB (the previous ntile form
    * moved the whole corpus through one WindowExec partition to get
    * equal-COUNT buckets; equal-width is what static split points
    * give, and skewed buckets are then a write-time AQE concern, not
    * an assignment concern). The rescale uses integer DIV only, so
    * the identical arithmetic runs in the oracle.
    */
  def zBuckets(df: DataFrame, x: String, y: String, buckets: Int): DataFrame = {
    require(buckets > 0 && (buckets & (buckets - 1)) == 0,
      s"buckets must be a power of two, got $buckets")
    val shift = 32 - java.lang.Integer.numberOfTrailingZeros(buckets)
    val st = df.agg(min(col(x)).cast("long"), max(col(x)).cast("long"),
      min(col(y)).cast("long"), max(col(y)).cast("long")).first()
    if (st.isNullAt(0)) // empty input: no rows to bucket
      return df.withColumn("z", lit(0L)).withColumn("bucket", lit(1L))
    val (xLo, xHi, yLo, yHi) = (st.getLong(0), st.getLong(1), st.getLong(2), st.getLong(3))
    def scale16(c: String, lo: Long, hi: Long): Column =
      expr(s"CAST((($c - $lo) * 65535) DIV ${math.max(1L, hi - lo)} AS BIGINT)")
    df.withColumn("z", zValue(scale16(x, xLo, xHi), scale16(y, yLo, yHi)))
      .withColumn("bucket", shiftright(col("z"), shift) + lit(1L))
  }

  val defs: Map[String, Q] = Map(

    // Z-order lineitem by (partkey, suppkey) into 16 fixed-width
    // Morton-range buckets and report each bucket's bounding box in
    // BOTH dimensions — the figure of merit for multi-dimensional
    // pruning (each bucket is one file's min/max stats; tight boxes =
    // skipped files for 2-D predicates). This checked plan IS the
    // production assignment: per-row shift arithmetic, no global
    // window, no sampling — the write side then just
    // repartition("bucket") + sortWithinPartitions("z") (LayoutSpec
    // demonstrates the file-level pruning payoff).
    "zo1_zorder_layout" -> ((s, dir) => {
      val li = Tables.lineitem(s, dir)
        .select(col("l_orderkey"), col("l_linenumber"), col("l_partkey"), col("l_suppkey"))
      zBuckets(li, "l_partkey", "l_suppkey", 16)
        .groupBy(col("bucket").cast("long").as("bucket"))
        .agg(count(lit(1)).as("n_rows"),
          min(col("l_partkey")).as("min_part"), max(col("l_partkey")).as("max_part"),
          min(col("l_suppkey")).as("min_supp"), max(col("l_suppkey")).as("max_supp"),
          min(col("z")).as("min_z"), max(col("z")).as("max_z"))
    })
  )

  val oracles: Map[String, String] = Map(
    "zo1_zorder_layout" -> {
      val z = zValueSql("sx", "sy")
      s"""WITH st AS (SELECT MIN(l_partkey) AS xlo, MAX(l_partkey) AS xhi,
                             MIN(l_suppkey) AS ylo, MAX(l_suppkey) AS yhi FROM lineitem),
          sc AS (SELECT l_partkey, l_suppkey,
                   ((l_partkey - st.xlo) * 65535) // GREATEST(1, st.xhi - st.xlo) AS sx,
                   ((l_suppkey - st.ylo) * 65535) // GREATEST(1, st.yhi - st.ylo) AS sy
                 FROM lineitem, st),
          zt AS (SELECT l_partkey, l_suppkey, CAST($z AS BIGINT) AS z FROM sc),
          bt AS (SELECT *, CAST((z >> 28) + 1 AS BIGINT) AS bucket FROM zt)
          SELECT bucket, COUNT(*) AS n_rows,
            MIN(l_partkey) AS min_part, MAX(l_partkey) AS max_part,
            MIN(l_suppkey) AS min_supp, MAX(l_suppkey) AS max_supp,
            MIN(z) AS min_z, MAX(z) AS max_z
          FROM bt GROUP BY bucket"""
    }
  )
}
