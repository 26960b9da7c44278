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

  /** Hilbert index of a 16-bit (x, y) cell — the standard xy2d walk
    * (16 iterations of quadrant-accumulate + reflect/swap), expressed
    * as ONE `aggregate()` higher-order fold over `sequence(15, 0,
    * -1)` so the expression tree stays linear in the bit width (a
    * naive column composition would duplicate the x/y subtrees
    * exponentially). The quadrant number (3·rx) XOR ry is written
    * arithmetically as 3·rx + ry − 2·rx·ry — identical exact integer
    * ops in both engines, no bitwise-XOR dialect differences. Inputs
    * must already be scaled to [0, 65535].
    */
  def hilbertSql(sx: String, sy: String, bits: Int = 16): String = {
    def rx(x: String) = s"(shiftright($x, i) & 1)"
    val s1 = "shiftleft(CAST(1 AS BIGINT), i)"
    s"""aggregate(
          sequence(${bits - 1}, 0, -1),
          named_struct('x', CAST($sx AS BIGINT), 'y', CAST($sy AS BIGINT), 'd', CAST(0 AS BIGINT)),
          (acc, i) -> named_struct(
            'x', CASE WHEN ${rx("acc.y")} = 0
                   THEN CASE WHEN ${rx("acc.x")} = 1 THEN $s1 - 1 - acc.y ELSE acc.y END
                   ELSE acc.x END,
            'y', CASE WHEN ${rx("acc.y")} = 0
                   THEN CASE WHEN ${rx("acc.x")} = 1 THEN $s1 - 1 - acc.x ELSE acc.x END
                   ELSE acc.y END,
            'd', acc.d + $s1 * $s1 *
              (3 * ${rx("acc.x")} + ${rx("acc.y")} - 2 * ${rx("acc.x")} * ${rx("acc.y")})),
          acc -> acc.d)"""
  }

  /** Driver-side twin of [[hilbertSql]] — the same xy2d walk in plain
    * Scala, used by LayoutSpec to cross-check the column expression
    * point-for-point.
    */
  def hilbertAt(x0: Long, y0: Long, bits: Int = 16): Long = {
    var (x, y, d) = (x0, y0, 0L)
    var i = bits - 1
    while (i >= 0) {
      val s = 1L << i
      val rx = (x >> i) & 1L
      val ry = (y >> i) & 1L
      d += s * s * (3L * rx + ry - 2L * rx * ry)
      if (ry == 0L) {
        val (nx, ny) =
          if (rx == 1L) (s - 1L - y, s - 1L - x) else (y, x)
        x = nx; y = ny
      }
      i -= 1
    }
    d
  }

  /** zBuckets with the Hilbert index instead of the Morton code. Same
    * fixed-split scaffolding: stats rescale to the 16-bit domain,
    * bucket = (h >> 28) + 1. Hilbert's continuity (consecutive cells
    * are always grid neighbors — no Morton "seam" jumps) gives
    * strictly tighter per-file bounding boxes on range-heavy key
    * pairs; LayoutSpec pins the curve properties.
    */
  def hBuckets(df: DataFrame, x: String, y: String, buckets: Int): DataFrame = {
    require(buckets > 0 && (buckets & (buckets - 1)) == 0,
      s"buckets must be a power of two, got $buckets")
    val shift = 32 - java.lang.Integer.numberOfTrailingZeros(buckets)
    val st = df.agg(min(col(x)).cast("long"), max(col(x)).cast("long"),
      min(col(y)).cast("long"), max(col(y)).cast("long")).first()
    if (st.isNullAt(0))
      return df.withColumn("h", lit(0L)).withColumn("bucket", lit(1L))
    val (xLo, xHi, yLo, yHi) = (st.getLong(0), st.getLong(1), st.getLong(2), st.getLong(3))
    def scale16(c: String, lo: Long, hi: Long): String =
      s"CAST((($c - $lo) * 65535) DIV ${math.max(1L, hi - lo)} AS BIGINT)"
    // production path: the codegen'd native expression (the fold form
    // runs interpreted — 16 allocated structs per row — and measured
    // 11.5 s vs sub-second over sf0.1 lineitem; LayoutSpec pins the
    // two forms equal point-for-point)
    graft.functions.HilbertIndexExpr.register(df.sparkSession)
    df.withColumn("h",
        expr(s"hilbert_index(${scale16(x, xLo, xHi)}, ${scale16(y, yLo, yHi)})"))
      .withColumn("bucket", shiftright(col("h"), shift) + lit(1L))
  }

  val defs: Map[String, Q] = Map(

    // Hilbert-order lineitem by (partkey, suppkey) into 16 fixed-width
    // curve-range buckets — zo1's figure of merit on the
    // locality-superior curve. Same per-row-arithmetic plan contract:
    // no global window, no sampling, write side is
    // repartition("bucket") + sortWithinPartitions("h").
    "zo2_hilbert_layout" -> ((s, dir) => {
      val li = Tables.lineitem(s, dir)
        .select(col("l_orderkey"), col("l_linenumber"), col("l_partkey"), col("l_suppkey"))
      hBuckets(li, "l_partkey", "l_suppkey", 16)
        .groupBy(col("bucket").cast("long").as("bucket"))
        .agg(count(lit(1)).as("n_rows"),
          min(col("l_partkey")).as("min_part"), max(col("l_partkey")).as("max_part"),
          min(col("l_suppkey")).as("min_supp"), max(col("l_suppkey")).as("max_supp"),
          min(col("h")).as("min_h"), max(col("h")).as("max_h"))
    }),

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
    // the 16-step fold replayed as a 16-level recursive CTE; each
    // source row walks the recursion independently (UNION ALL), the
    // i = -1 generation carries the finished index
    "zo2_hilbert_layout" ->
      s"""WITH RECURSIVE
          st AS (SELECT MIN(l_partkey) AS xlo, MAX(l_partkey) AS xhi,
                        MIN(l_suppkey) AS ylo, MAX(l_suppkey) AS yhi FROM lineitem),
          sc AS (SELECT l_partkey, l_suppkey,
                   ((l_partkey - st.xlo) * 65535) // GREATEST(1, st.xhi - st.xlo) AS sx,
                   ((l_suppkey - st.ylo) * 65535) // GREATEST(1, st.yhi - st.ylo) AS sy
                 FROM lineitem, st),
          hil(l_partkey, l_suppkey, x, y, d, i) AS (
            SELECT l_partkey, l_suppkey, sx, sy, CAST(0 AS BIGINT), 15 FROM sc
            UNION ALL
            SELECT l_partkey, l_suppkey,
              CASE WHEN ((y >> i) & 1) = 0
                THEN CASE WHEN ((x >> i) & 1) = 1 THEN (CAST(1 AS BIGINT) << i) - 1 - y ELSE y END
                ELSE x END,
              CASE WHEN ((y >> i) & 1) = 0
                THEN CASE WHEN ((x >> i) & 1) = 1 THEN (CAST(1 AS BIGINT) << i) - 1 - x ELSE x END
                ELSE y END,
              d + (CAST(1 AS BIGINT) << i) * (CAST(1 AS BIGINT) << i) *
                (3 * ((x >> i) & 1) + ((y >> i) & 1) - 2 * ((x >> i) & 1) * ((y >> i) & 1)),
              i - 1
            FROM hil WHERE i >= 0),
          bt AS (SELECT l_partkey, l_suppkey, d,
                   CAST((d >> 28) + 1 AS BIGINT) AS bucket
                 FROM hil WHERE i = -1)
          SELECT bucket, COUNT(*) AS n_rows,
            MIN(l_partkey) AS min_part, MAX(l_partkey) AS max_part,
            MIN(l_suppkey) AS min_supp, MAX(l_suppkey) AS max_supp,
            MIN(d) AS min_h, MAX(d) AS max_h
          FROM bt GROUP BY bucket""",
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
