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
    "zo4_bloom_skip" -> bloomSkipDef,

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
    }),

    // ZO3: ZONE-MAP SKIPPING EFFECTIVENESS — the metric zo1/zo2
    // optimize FOR, measured directly: model ingest-ordered data
    // files as 4096-row l_orderkey slabs, build each file's
    // (min, max) ship-day zone map (exactly the parquet row-group /
    // Delta file stats a lakehouse prunes on), and replay 8
    // deterministic ship-day range predicates (derived from the
    // global min/max — each an eighth-width slice) against the maps.
    // A file is skipped iff max < lo OR min > hi; the report pairs
    // rows_scanned with rows_matching, so (scanned − matching) is the
    // false-positive scan cost that layout clustering exists to
    // remove. Plan shape: ONE file-stats aggregate + ONE predicate
    // probe, both against an 8-row broadcast of the predicate set —
    // file count is corpus/4096, never joined to itself.
    "zo3_zonemap_skip" -> ((s, dir) => {
      val day = 86400000000L
      val li = Tables.lineitem(s, dir)
        .select(expr("l_orderkey DIV 4096").as("file_id"),
          expr(s"unix_micros(CAST(l_shipdate AS TIMESTAMP)) DIV $day")
            .as("ship_day"))
      val zones = li.groupBy(col("file_id"))
        .agg(min(col("ship_day")).as("f_min"), max(col("ship_day")).as("f_max"),
          count(lit(1)).as("f_rows"))
      val mm = li.agg(min(col("ship_day")).as("lo"), max(col("ship_day")).as("hi"))
      val preds = s.range(8).select(col("id").as("pred_id"))
        .crossJoin(broadcast(mm)) // 1-row scalar, rule (b)'s shape
        .withColumn("span", col("hi") - col("lo") + 1)
        .select(col("pred_id"),
          expr("lo + pred_id * span DIV 8").as("p_lo"),
          expr("lo + pred_id * span DIV 8 + span DIV 16").as("p_hi"))
      val probed = zones.crossJoin(broadcast(preds)) // 8-row predicate set
        .withColumn("pruned",
          when(col("f_max") < col("p_lo") || col("f_min") > col("p_hi"), 1L)
            .otherwise(0L))
      val matches = li.crossJoin(broadcast(preds))
        .filter(col("ship_day") >= col("p_lo") && col("ship_day") <= col("p_hi"))
        .groupBy(col("pred_id")).agg(count(lit(1)).as("rows_matching"))
      probed.groupBy(col("pred_id"), col("p_lo"), col("p_hi"))
        .agg(count(lit(1)).as("n_files"), sum(col("pruned")).as("n_pruned"),
          sum(expr("IF(pruned = 1, 0L, f_rows)")).as("rows_scanned"))
        .join(matches, Seq("pred_id"), "left")
        .withColumn("rows_matching", coalesce(col("rows_matching"), lit(0L)))
        .withColumn("skip_permille", expr("n_pruned * 1000 DIV n_files"))
    })
  )

  // ZO4: BLOOM FILE-SKIP AUDIT — the point-predicate complement of
  // zo3's zone maps (range metadata skips range predicates; a
  // per-file Bloom over a high-NDV column skips EQUALITY probes, the
  // Parquet bloom_filter_enabled / Delta BLOOMFILTER INDEX shape).
  // Each 2000-event file gets a 16 Kib 4-hash Bloom over user_id
  // (ll20's exact md5⊕seed arithmetic, so the oracle replays false
  // positives included); a 7-probe lookup workload (6 present ids
  // spread over the domain + 1 absent) is then audited per probe:
  // files the Bloom would read (n_maybe), files that truly hold the
  // user (n_actual), the skip rate, and the false-positive read tax.
  // Plan: ONE scan builds the distinct (file, bit) set; probes are a
  // broadcast 28-row position table; the audit join is
  // bit-position-keyed — file count × probe count is metadata-scale.
  private def bloomSkipDef: Q = (s, dir) => {
    val m = 16384L
    val maxUid = Tables.maxIdStat(s, dir, "events", "user_id")
    val sess = s
    import sess.implicits._
    val probeDf = ((0 to 5).map(k => k * maxUid / 6) :+ (maxUid + 1000L))
      .toDF("probe_user")
    def posCols(c: Column): Seq[Column] = {
      val base = conv(substring(md5(c.cast("string")), 1, 15), 16, 10).cast("long")
      (0 until 4).map(j => pmod(base.bitwiseXOR(lit(Dedup.sigSeeds(j))), lit(m)))
    }
    val ev = Tables.events(s, dir)
      .select(expr("event_id DIV 2000").as("file"), col("user_id"))
    val bits = ev.select(col("file"),
      explode(array(posCols(col("user_id")): _*)).as("p")).distinct()
    val nFiles = ev.agg(countDistinct(col("file")).as("n_files"))
    val ppos = probeDf.select(col("probe_user"),
      posexplode(array(posCols(col("probe_user")): _*)).as(Seq("j", "p")))
    val maybe = ppos.join(bits, Seq("p"))
      .groupBy(col("probe_user"), col("file"))
      .agg(count(lit(1)).as("nset"))
      .filter(col("nset") === 4L)
      .groupBy(col("probe_user")).agg(count(lit(1)).as("n_maybe"))
    val actual = ev.join(probeDf, col("user_id") === col("probe_user"))
      .select(col("probe_user"), col("file")).distinct()
      .groupBy(col("probe_user")).agg(count(lit(1)).as("n_actual"))
    probeDf.join(maybe, Seq("probe_user"), "left")
      .join(actual, Seq("probe_user"), "left")
      .crossJoin(broadcast(nFiles)) // 1-row scalar, rule (b)'s shape
      .withColumn("n_maybe", coalesce(col("n_maybe"), lit(0L)))
      .withColumn("n_actual", coalesce(col("n_actual"), lit(0L)))
      .withColumn("n_skipped", col("n_files") - col("n_maybe"))
      .withColumn("skip_ppm", expr("n_skipped * 1000000L DIV n_files"))
      .withColumn("false_pos_files", col("n_maybe") - col("n_actual"))
  }

  val oracles: Map[String, String] = Map(
    // replays the exact Bloom arithmetic — same seeds, same modulus,
    // same false positives (ll20's contract, per file)
    "zo4_bloom_skip" -> {
      val seedRows = (0 until 4)
        .map(j => s"($j, CAST(${Dedup.sigSeeds(j)} AS BIGINT))").mkString(", ")
      s"""WITH seeds(j, sd) AS (VALUES $seedRows),
          f AS (SELECT event_id // 2000 AS file, user_id FROM events),
          mx AS (SELECT MAX(user_id) AS mu FROM events),
          probes AS (SELECT k * mu // 6 AS probe_user
                     FROM generate_series(0, 5) t(k) CROSS JOIN mx
                     UNION ALL SELECT mu + 1000 FROM mx),
          bits AS (SELECT DISTINCT file,
                     xor(CAST('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 15)
                       AS BIGINT), sd) % 16384 AS p
                   FROM f, seeds),
          ppos AS (SELECT probe_user, j,
                     xor(CAST('0x' || substr(md5(CAST(probe_user AS VARCHAR)), 1, 15)
                       AS BIGINT), sd) % 16384 AS p
                   FROM probes, seeds),
          mb AS (SELECT probe_user, file FROM ppos JOIN bits USING (p)
                 GROUP BY 1, 2 HAVING COUNT(*) = 4),
          nmay AS (SELECT probe_user, COUNT(*) AS n_maybe FROM mb GROUP BY 1),
          act AS (SELECT probe_user, COUNT(DISTINCT file) AS n_actual
                  FROM f JOIN probes ON user_id = probe_user GROUP BY 1),
          nf AS (SELECT CAST(COUNT(DISTINCT file) AS BIGINT) AS n_files FROM f)
          SELECT probe_user, COALESCE(n_maybe, 0) AS n_maybe,
            COALESCE(n_actual, 0) AS n_actual, n_files,
            n_files - COALESCE(n_maybe, 0) AS n_skipped,
            (n_files - COALESCE(n_maybe, 0)) * 1000000 // n_files AS skip_ppm,
            COALESCE(n_maybe, 0) - COALESCE(n_actual, 0) AS false_pos_files
          FROM probes LEFT JOIN nmay USING (probe_user)
          LEFT JOIN act USING (probe_user) CROSS JOIN nf"""
    },
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
    },
    // same slab/zone-map model and eighth-width predicate derivation;
    // all bounds integer so the prune decision is bit-identical
    "zo3_zonemap_skip" ->
      """WITH li AS (SELECT l_orderkey // 4096 AS file_id,
             CAST(epoch_us(l_shipdate) // 86400000000 AS BIGINT) AS ship_day
           FROM lineitem),
          z AS (SELECT file_id, MIN(ship_day) AS f_min, MAX(ship_day) AS f_max,
                  COUNT(*) AS f_rows
                FROM li GROUP BY 1),
          mm AS (SELECT MIN(ship_day) AS lo, MAX(ship_day) AS hi FROM li),
          p AS (SELECT CAST(pred_id AS BIGINT) AS pred_id,
                  CAST(lo + pred_id * (hi - lo + 1) // 8 AS BIGINT) AS p_lo,
                  CAST(lo + pred_id * (hi - lo + 1) // 8
                    + (hi - lo + 1) // 16 AS BIGINT) AS p_hi
                FROM range(8) t(pred_id) CROSS JOIN mm),
          pr AS (SELECT pred_id, p_lo, p_hi,
                   CASE WHEN f_max < p_lo OR f_min > p_hi THEN 1 ELSE 0 END
                     AS pruned,
                   f_rows
                 FROM z CROSS JOIN p),
          mt AS (SELECT pred_id, COUNT(*) AS rows_matching
                 FROM li CROSS JOIN p
                 WHERE ship_day BETWEEN p_lo AND p_hi
                 GROUP BY 1),
          ag AS (SELECT pred_id, p_lo, p_hi, COUNT(*) AS n_files,
                   CAST(SUM(pruned) AS BIGINT) AS n_pruned,
                   CAST(SUM(CASE WHEN pruned = 1 THEN 0 ELSE f_rows END)
                     AS BIGINT) AS rows_scanned
                 FROM pr GROUP BY 1, 2, 3)
          SELECT ag.pred_id, p_lo, p_hi, n_files, n_pruned, rows_scanned,
            COALESCE(rows_matching, 0) AS rows_matching,
            n_pruned * 1000 // n_files AS skip_permille
          FROM ag LEFT JOIN mt ON ag.pred_id = mt.pred_id"""
  )
}
