package graft.operators

import graft.{Q, Tables}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Table statistics profiler — the ANALYZE-TABLE step a warehouse
  * loader runs after L5/L6 loads so the downstream optimizer (and the
  * pipeline's own health checks) see per-column null counts, NDVs and
  * value ranges. The reference tracks only row counts per load
  * (upload stats); per-column profiling is the natural extension once
  * the store is columnar.
  *
  * Plan shape: one independent single-DISTINCT aggregate per column,
  * unioned. Each branch scans ONLY its column (columnar pruning makes
  * the extra scans nearly free) and plans as a plain two-phase
  * aggregate — measured 6x faster than the tempting single-agg
  * multi-DISTINCT form, whose Expand duplicates every row once per
  * DISTINCT column before the shuffle. At 100 TB the exact
  * COUNT(DISTINCT) swaps for approx_count_distinct / the a2c
  * mergeable sketch, collapsing each branch to a partial-agg scan.
  */
object Profile {

  /** prof7's streaming input/state: one sketch ROW (hash function j)
    * per group; per-micro-batch (cell, count) partial aggregates
    * arrive, the w-bounded counter map lives in the state store.
    */
  case class CmsCell(j: Int, cell: Int, c: Long)
  case class CmsRowState(ver: Long, counts: Map[Int, Long])

  /** Streaming twin of prof7's CMS build — the "incrementally
    * maintainable" claim made concrete: counters ONLY ADD, so the
    * state-store merge of per-batch partial aggregates equals the
    * batch build EXACTLY (not an envelope — StreamingSpec pins
    * equality). Keyed by hash row j (d=4 groups), state ≤ w counters
    * per group at any corpus size; input rows are the upstream
    * watermarked (j, cell) micro-batch aggregates, never raw events.
    * Emits a full w-bounded snapshot per batch tagged with a
    * monotone version, so the latest version IS the live sketch.
    */
  def cmsStream(updates: org.apache.spark.sql.Dataset[CmsCell])
    : org.apache.spark.sql.Dataset[(Int, Long, Int, Long)] = {
    import updates.sparkSession.implicits._
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    updates.groupByKey(_.j)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout)(
        (j: Int, it: Iterator[CmsCell], state: GroupState[CmsRowState]) => {
          val st = state.getOption.getOrElse(CmsRowState(0L, Map.empty))
          val merged = it.foldLeft(st.counts) { (m, u) =>
            m.updated(u.cell, m.getOrElse(u.cell, 0L) + u.c)
          }
          val next = CmsRowState(st.ver + 1, merged)
          state.update(next)
          merged.iterator.map { case (cell, v) => (j, next.ver, cell, v) }
        })
  }

  val defs: Map[String, Q] = Map(

    // PROF16: PAIRWISE PEARSON CORRELATION, exact integers — the
    // numeric sibling of prof14's φ² (categorical) and a12's
    // autocorrelation (temporal): r² in ppm plus the sign, never a
    // float accumulation. Two passes per table (prof13's shape):
    // pass 1 takes integer means (one documented truncation, SUM DIV
    // n — both engines truncate toward zero on the non-negative
    // sums), pass 2 sums centered cross-products in DECIMAL(38)/
    // HUGEINT (per-row products are range-bounded; the SUMS are what
    // overflow a long at web scale), then r²_ppm = Sxy²·1e6 DIV
    // (Sxx·Syy) with a clamped divisor (ta26's rule: a constant
    // column yields Sxx = 0 and must read r² = 0, not NULL/throw).
    // The three lineitem pairs are INDEPENDENCE reads (the synthetic
    // columns draw independently — the profiler must report ≈ 0, not
    // invent structure); documents (n_words, n_chars) is the
    // structural POSITIVE anchor (chars ≈ Σ word lengths) proving the
    // statistic detects real dependence.
    "prof16_correlation" -> ((s, dir) => {
      def corrLegs(df: org.apache.spark.sql.DataFrame,
                   pairs: Seq[(String, String, String)]) = {
        val cols = pairs.flatMap { case (_, x, y) => Seq(x, y) }.distinct
        def m(c: String) = expr(
          s"CAST(SUM(CAST($c AS DECIMAL(38,0))) DIV COUNT(1) AS BIGINT)").as(s"m_$c")
        val meanCols = count(lit(1)).as("n") +: cols.map(m)
        val means = df.agg(meanCols.head, meanCols.tail: _*)
        // One factor is promoted to DECIMAL(38,0) BEFORE each per-row
        // multiply: ID-valued pairs (part_supp) scale with SF and the
        // centered product wraps silently in LONG past 2^63 — the
        // oracle already casts one operand to HUGEINT first.
        val aggs = pairs.flatMap { case (tag, x, y) => Seq(
          sum(expr(s"CAST($x - m_$x AS DECIMAL(38,0)) * ($y - m_$y)")).as(s"sxy_$tag"),
          sum(expr(s"CAST($x - m_$x AS DECIMAL(38,0)) * ($x - m_$x)")).as(s"sxx_$tag"),
          sum(expr(s"CAST($y - m_$y AS DECIMAL(38,0)) * ($y - m_$y)")).as(s"syy_$tag"))
        } :+ max(col("n")).as("n")
        val wide = df.crossJoin(broadcast(means)) // 1-row scalar, rule (b)
          .agg(aggs.head, aggs.tail: _*)
        // magnitude normalization BEFORE the cross-multiplication:
        // Sxy²·1e6 needs ~43 digits at web scale (6e12 rows of
        // cent-grain prices), past DECIMAL(38)/HUGEINT — dividing all
        // three sums by the same sc leaves the ratio exact up to a
        // ≤ 1e-15 relative quantization (sc > 1 only once |Sxy| tops
        // 1e15), mirrored bit-for-bit in the oracle
        val legs = pairs.map { case (tag, _, _) =>
          s"named_struct('pair', '$tag', " +
            s"'sign_r', CAST(CASE WHEN sxy_$tag > 0 THEN 1 WHEN sxy_$tag < 0 " +
            s"THEN -1 ELSE 0 END AS BIGINT), " +
            s"'r2_ppm', CAST(CAST(sxy_$tag DIV sc_$tag AS DECIMAL(38,0)) " +
            s"* (sxy_$tag DIV sc_$tag) " + // Spark DIV yields LONG — promote before squaring
            s"* 1000000 DIV greatest(CAST(1 AS DECIMAL(38,0)), " +
            s"CAST(sxx_$tag DIV sc_$tag AS DECIMAL(38,0)) " +
            s"* (syy_$tag DIV sc_$tag)) AS BIGINT))"
        }.mkString(", ")
        // sc keys off max(|Sxy|,|Sxx|,|Syy|), not |Sxy| alone: for a
        // weakly-correlated pair Sxy ≈ 0 forces sc = 1 while Sxx/Syy
        // still top a LONG, and Spark's DIV-returns-LONG would NULL —
        // greatest() then swallows the NULL into a divisor of 1 and a
        // garbage r2_ppm. Keyed to the max, every quotient ≤ ~1e15
        // fits a LONG. (sc itself stays a LONG: it would need a sum
        // past 9.2e33 to overflow — 6e12 rows of deviations > 1e10,
        // outside even the 100 TB cent-grain domain.)
        val scaled = pairs.foldLeft(wide) { case (df, (tag, _, _)) =>
          df.withColumn(s"sc_$tag", expr(
            s"greatest(CAST(1 AS DECIMAL(38,0)), " +
              s"greatest(abs(sxy_$tag), abs(sxx_$tag), abs(syy_$tag)) " +
              s"DIV 1000000000000000)"))
        }
        scaled.select(col("n"), explode(expr(s"array($legs)")).as("x"))
          .select(col("x.pair"), col("n"), col("x.sign_r"), col("x.r2_ppm"))
      }
      val li = Tables.lineitem(s, dir).select(
        expr("CAST(l_quantity AS BIGINT)").as("qty"),
        expr("CAST(round(l_extendedprice * 100) AS BIGINT)").as("price_c"),
        expr("CAST(round(l_discount * 100) AS BIGINT)").as("disc_c"),
        col("l_partkey").as("pk"), col("l_suppkey").as("sk"))
      val docs = Tables.documents(s, dir).select(
        size(split(col("text"), " ")).cast("long").as("nw"),
        length(col("text")).cast("long").as("nc"))
      corrLegs(li, Seq(("qty_price", "qty", "price_c"),
          ("qty_disc", "qty", "disc_c"), ("part_supp", "pk", "sk")))
        .unionByName(corrLegs(docs, Seq(("words_chars", "nw", "nc"))))
    }),

    "prof1_table_stats" -> ((s, dir) => {
      val li = Tables.lineitem(s, dir)
      // (name, numeric?) — quantity is whole-valued double, profiled as int
      val cols = Seq("l_orderkey" -> true, "l_partkey" -> true,
        "l_quantity" -> true, "l_returnflag" -> false)
      cols.map { case (c, num) =>
        val minMax =
          if (num) Seq(min(col(c)).cast("long").cast("string").as("min_s"),
            max(col(c)).cast("long").cast("string").as("max_s"))
          else Seq(min(col(c)).as("min_s"), max(col(c)).as("max_s"))
        val aggs = Seq(
          sum(when(col(c).isNull, 1L).otherwise(0L)).as("n_nulls"),
          countDistinct(col(c)).as("ndv")) ++ minMax
        li.agg(aggs.head, aggs.tail: _*)
          .select(lit(c).as("column_name"), col("n_nulls"), col("ndv"),
            col("min_s"), col("max_s"))
      }.reduce(_ unionByName _)
    }),

    // Sketch-based NDV profiling — prof1's "at 100 TB the exact
    // COUNT(DISTINCT) swaps for the mergeable sketch" made real: the
    // same bit-mirrored HLL++ aggregator a2c verifies (p=12, exact
    // HUGEINT harmonic path in the oracle) profiles each column in a
    // single partial-agg scan — no distinct shuffle at all — with the
    // exact NDV alongside to show calibration. Values hash through
    // their canonical string form so numeric and string columns share
    // one sketch.
    "prof4_sketch_ndv" -> ((s, dir) => {
      val hll = udaf(new graft.functions.HllAggregator(12))
      val li = Tables.lineitem(s, dir)
      Seq("l_orderkey", "l_partkey", "l_returnflag").map { c =>
        li.agg(hll(col(c).cast("string")).as("ndv_sketch"),
            countDistinct(col(c)).as("ndv_exact"))
          .select(lit(c).as("column_name"), col("ndv_sketch"), col("ndv_exact"))
      }.reduce(_ unionByName _)
    }),

    // Heavy hitters (frequent items) — EXACT, at 100 TB cost: phase 1
    // runs a Misra-Gries(k) summary per partition inside mapPartitions
    // (k counters of bounded memory no matter the partition size); the
    // union of summaries is a guaranteed SUPERSET of every key with
    // global frequency > n/k (a globally-heavy key is partition-heavy
    // somewhere, and MG retains any key with partition count above
    // n_p/k), so one broadcast semi-join recount of the candidates
    // yields the exact answer. The full groupBy this replaces shuffles
    // EVERY key; this shuffles <= k rows per partition plus the
    // candidate recount. The summary's content depends on partition
    // layout, the OUTPUT does not — the superset guarantee plus the
    // exact recount make it deterministic, which is what lets a plain
    // HAVING oracle check it.
    "prof3_heavy_hitters" -> ((s, dir) => {
      import s.implicits._
      val k = 20
      // skewed derived key: 3 hot buckets (~10% of rows each) over a
      // long tail of per-user cold keys
      val keys = Tables.events(s, dir)
        .select(when(col("user_id") % 10 < 3, col("user_id") % 10)
          .otherwise(col("user_id") + 1000L).as("hot_key"))
      val nTotal = keys.count() // one metadata-cheap count, also in the oracle
      val candidates = keys.as[Long].mapPartitions { it =>
        val counters = scala.collection.mutable.HashMap.empty[Long, Long]
        it.foreach { x =>
          if (counters.contains(x)) counters(x) += 1L
          else if (counters.size < k) counters(x) = 1L
          else {
            counters.mapValuesInPlace((_, v) => v - 1L)
            counters.filterInPlace((_, v) => v > 0L)
          }
        }
        counters.keysIterator
      }.toDF("hot_key").distinct()
      keys.join(broadcast(candidates), "hot_key")
        .groupBy(col("hot_key"))
        .agg(count(lit(1)).as("cnt"))
        .filter(col("cnt") > lit(nTotal / k))
    }),

    // Equi-width HISTOGRAM profiling — the optimizer-statistics
    // histograms an ANALYZE pass collects beyond prof1's min/max/NDV
    // (selectivity estimation needs the shape of the distribution,
    // not just its range). One scan fans each profiled column into a
    // (col_name, value) stream, a 3-row min/max aggregate rides back
    // on a BROADCAST join, and the bucketed count groups on
    // (col_name, bucket) — 48 output rows. At 100 TB: a single
    // columnar scan of the profiled columns + two tiny aggregates; no
    // per-row state, no distinct, no window. Bucket arithmetic is the
    // same IEEE-double expression in both engines ((v-lo)*16/(hi-lo),
    // floored, capped at 15), so boundaries land identically.
    "prof5_histograms" -> ((s, dir) => {
      val cols = Seq("l_quantity", "l_extendedprice", "l_discount")
      val long = Tables.lineitem(s, dir).select(expr(
        "explode(array(" + cols.map(c =>
          s"named_struct('col_name', '$c', 'v', CAST($c AS DOUBLE))").mkString(", ") + "))")
        .as("x"))
        .select(col("x.col_name").as("col_name"), col("x.v").as("v"))
      val mm = long.groupBy(col("col_name"))
        .agg(min(col("v")).as("lo"), max(col("v")).as("hi"))
      long.join(broadcast(mm), "col_name")
        .withColumn("bucket",
          when(col("hi") === col("lo"), lit(0L))
            .otherwise(least(
              floor((col("v") - col("lo")) * lit(16.0) / (col("hi") - col("lo"))),
              lit(15L))))
        .groupBy(col("col_name"), col("bucket"))
        .agg(count(lit(1)).as("n"),
          min(col("v")).as("bucket_min"), max(col("v")).as("bucket_max"))
    }),

    // EQUI-DEPTH histogram profiling — the other half of prof5's
    // equi-width ANALYZE stats (optimizers keep both: equi-width for
    // range cardinality, equi-depth for skew-robust selectivity).
    // The 7 interior cut points (8 buckets) come from
    // Percentiles.exact's two-level integer-cent histogram — state
    // bounded by the cent RANGE, never the row count (interpreted
    // percentile() here would be the r10 one-reducer value-map) —
    // and ride back over the corpus as a broadcast 1-row cross join
    // (rule (b)'s sanctioned shape); bucket id = how many cuts the
    // value exceeds, one codegen'd comparison chain. At 100 TB: two
    // bounded-state scans, no sort, no distinct.
    "prof12_equidepth" -> ((s, dir) => {
      val sess12 = s
      import sess12.implicits._
      val qs = (1 to 7).map(i => (s"q$i", i / 8.0))
      val c = Tables.events(s, dir)
        .select(expr("CAST(round(value * 100) AS BIGINT)").as("cents"))
      // 7-double model collect (prof13's plan-nesting lesson): keeps
      // the header's two-scan claim true in the EXECUTED plan — the
      // percentile machinery otherwise re-reads the scan ~5x
      val cuts = Percentiles.exact(c, Nil, "cents", qs)
        .select(qs.map { case (a, _) => col(a) }: _*)
        .collect().map(r => Tuple7(r.getDouble(0), r.getDouble(1), r.getDouble(2),
          r.getDouble(3), r.getDouble(4), r.getDouble(5), r.getDouble(6))).toSeq
        .toDF(qs.map(_._1): _*)
      c.crossJoin(broadcast(cuts))
        .withColumn("bucket",
          qs.map { case (a, _) =>
            when(col("cents") > col(a), 1L).otherwise(0L)
          }.reduce(_ + _))
        .groupBy(col("bucket"))
        .agg(count(lit(1)).as("n"),
          min(col("cents")).as("lo_cents"), max(col("cents")).as("hi_cents"))
    }),

    // Approximate QUANTILE profiling — the 100 TB path is the
    // mergeable KLL-style sketch behind percentile_approx
    // (partial-agg scan, no sort, no per-group materialization).
    // Verified the a2b way: the Spark side checks each sketch value
    // sits inside an exact-percentile envelope widened to 2x the
    // sketch's rank-error bound (1/accuracy = 1%) and outputs the
    // booleans; the oracle pins them TRUE, so an out-of-bound sketch
    // breaks the hash. The envelope anchor itself comes from
    // Percentiles.exact's bounded two-level cent histogram (the
    // interpreted percentile() it replaced was itself a one-reducer
    // value-map — r10 verdict finding #1); cents are lossless on this
    // 2-decimal domain and the band is 2 rank-percent wide, so the
    // gate semantics are unchanged. percentile_approx is
    // deterministic on fixed data, so the gate cannot flake.
    "prof6_approx_quantiles" -> ((s, dir) => {
      val qs = Seq(0.5, 0.95, 0.99)
      val acc = 100
      val ev = Tables.events(s, dir).select(col("event_type"), col("value"),
        expr("CAST(round(value * 100) AS BIGINT)").as("cents"))
      val sketchAggs = qs.map { q =>
        expr(s"percentile_approx(value, $q, $acc)").as(s"aq${(q * 100).toInt}")
      } :+ count(lit(1)).as("n")
      val sketch = ev.groupBy(col("event_type"))
        .agg(sketchAggs.head, sketchAggs.tail: _*)
      val bandQs = qs.flatMap { q =>
        val tag = (q * 100).toInt
        Seq(s"lo$tag" -> math.max(0.0, q - 2.0 / acc),
          s"hi$tag" -> math.min(1.0, q + 2.0 / acc))
      }
      val bands = Percentiles.exact(ev, Seq("event_type"), "cents", bandQs)
        .drop("n_rows")
      sketch.join(broadcast(bands), "event_type")
        .select(col("event_type") +: col("n") +: qs.map { q =>
          val tag = (q * 100).toInt
          (col(s"aq$tag") >= col(s"lo$tag") / 100.0 &&
            col(s"aq$tag") <= col(s"hi$tag") / 100.0).as(s"p${tag}_ok")
        }: _*)
    }),

    // COUNT-MIN SKETCH frequency estimation (Cormode & Muthukrishnan
    // 2005) — the mergeable point-query summary that answers "how
    // often does key X occur" without ever shuffling keys: the sketch
    // is d=4 hash rows x w=1024 cells (4096 counters TOTAL regardless
    // of corpus size — vs prof3's exact path which still recounts
    // candidates corpus-wide), built in one explode + (j, cell)
    // aggregate; a point estimate is the MIN over the key's d cells.
    // Estimates are deterministic given the hash (md5-derived, the
    // repo's standard), so the oracle replays build + probe exactly —
    // stronger than an envelope gate — and the CMS lower-bound
    // invariant (estimate >= true count, never under) rides along as
    // a pinned boolean. At 100 TB: the sketch is a 4096-row aggregate
    // a streaming job maintains incrementally (counters only add), and
    // probes are broadcast-joined against it.
    "prof7_cms_freq" -> ((s, dir) => {
      val d = 4; val w = 1024
      val keys = Tables.events(s, dir).select((col("user_id") % 100).as("key"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK) // sketch build + exact recount anchor
      def cellOf(j: String, key: String) =
        pmod(conv(substring(md5(concat(expr(s"CAST($j AS STRING)"), lit(":"),
          expr(s"CAST($key AS STRING)"))), 1, 8), 16, 10).cast("long"), lit(w.toLong))
      val cells = keys
        .select(col("key"), explode(expr(s"sequence(0, ${d - 1})")).as("j"))
        .withColumn("cell", cellOf("j", "key"))
        .groupBy(col("j"), col("cell")).agg(count(lit(1)).as("c"))
      val probes = keys.filter(col("key") < 10).distinct()
      val probeCells = probes
        .select(col("key"), explode(expr(s"sequence(0, ${d - 1})")).as("j"))
        .withColumn("cell", cellOf("j", "key"))
      val est = probeCells.join(cells, Seq("j", "cell"), "left")
        .groupBy(col("key")).agg(min(coalesce(col("c"), lit(0L))).as("est"))
      val exact = keys.filter(col("key") < 10)
        .groupBy(col("key")).agg(count(lit(1)).as("exact_n"))
      est.join(exact, "key")
        .select(col("key"), col("est"), col("exact_n"),
          (col("est") >= col("exact_n")).as("lower_bound_ok"))
    }),

    // MOST-COMMON-VALUES profiling — the third leg of the ANALYZE
    // statistics set (prof1 min/max/NDV, prof5 histograms, prof8
    // correlations): per profiled column, the top-5 values with their
    // frequency share, which is what a cost model uses for equality-
    // predicate selectivity on skewed columns. One explode fans the
    // profiled columns into a (col_name, value) stream; the count
    // aggregate's cardinality is bounded by the columns' combined NDV
    // and the per-column top-5 is a tiny ranked filter over it. At
    // 100 TB: one scan, one NDV-bounded aggregate, no sort of the
    // corpus.
    "prof9_mcv_values" -> ((s, dir) => {
      val cols = Seq("l_returnflag", "l_linestatus", "l_quantity")
      val li = Tables.lineitem(s, dir)
      val total = li.count()
      val long = li.select(expr(
        "explode(array(" + cols.map(c =>
          s"named_struct('col_name', '$c', 'v', CAST($c AS STRING))").mkString(", ") + "))")
        .as("x"))
        .select(col("x.col_name").as("col_name"), col("x.v").as("v"))
      val counts = long.groupBy(col("col_name"), col("v"))
        .agg(count(lit(1)).as("cnt"))
      val w = Window.partitionBy(col("col_name"))
        .orderBy(col("cnt").desc, col("v").asc)
      counts.withColumn("rank", row_number().over(w).cast("long"))
        .filter(col("rank") <= 5)
        .select(col("col_name"), col("rank"), col("v").as("value"),
          col("cnt").as("n_rows"), (col("cnt") / lit(total)).as("share"))
    }),

    // CORRELATION-MATRIX profiling — the extended statistics an
    // ANALYZE pass collects for correlated-column cardinality
    // estimation (and a feature-selection primitive for training
    // pipelines). Pearson r for each column pair from the five
    // classic power sums — ONE scan, one partial aggregate, no joins.
    // Values quantize to cent-integers and the sums accumulate in
    // DECIMAL(38,0), so n*Sxy - Sx*Sy is EXACT on both engines;
    // doubles appear only at the final sqrt/division edge (the a7
    // discipline), making r bit-comparable. At 100 TB: still one
    // scan + a 1-row aggregate per pair set.
    "prof8_corr_matrix" -> ((s, dir) => {
      val cols = Seq("l_quantity", "l_extendedprice", "l_discount")
      val dec = "DECIMAL(38,0)"
      val q = Tables.lineitem(s, dir).select(cols.map(c =>
        expr(s"CAST(CAST(round(CAST($c AS DOUBLE) * 100) AS BIGINT) AS $dec)").as(c)): _*)
      val aggs = cols.map(c => sum(col(c)).as(s"s_$c")) ++
        cols.map(c => sum(expr(s"$c * $c")).as(s"ss_$c")) ++
        cols.combinations(2).map { case Seq(a, b) =>
          sum(expr(s"$a * $b")).as(s"sp_${a}_$b")
        }.toSeq :+ count(lit(1)).cast(dec).as("n")
      val stats = q.agg(aggs.head, aggs.tail: _*)
      val pairs = cols.combinations(2).map { case Seq(a, b) =>
        stats.select(
          lit(a).as("col_x"), lit(b).as("col_y"),
          col("n").cast("long").as("n_rows"),
          (expr(s"CAST(n * sp_${a}_$b - s_$a * s_$b AS DOUBLE)") /
            (sqrt(expr(s"CAST(n * ss_$a - s_$a * s_$a AS DOUBLE)")) *
              sqrt(expr(s"CAST(n * ss_$b - s_$b * s_$b AS DOUBLE)")))).as("pearson_r"))
      }.toSeq
      pairs.reduce(_ unionByName _)
    }),

    // Join-key SKEW diagnostic — the pre-flight check before shuffling
    // on a key at scale (whale users / hot shingles are what q13's
    // salting and AQE skew-join exist for; this measures WHERE they
    // are). One count aggregate + a TakeOrdered head; share arithmetic
    // is long/long at the output edge.
    "prof2_key_skew" -> ((s, dir) => {
      val ev = Tables.events(s, dir)
      val total = ev.count()
      val top = ev.groupBy(col("user_id")).agg(count(lit(1)).as("c"))
        .orderBy(col("c").desc, col("user_id").asc).limit(10)
      top.withColumn("rank",
        row_number().over(org.apache.spark.sql.expressions.Window
          .orderBy(col("c").desc, col("user_id").asc)).cast("long"))
        .select(col("rank"), col("user_id"), col("c").as("n_rows"),
          (col("c") / lit(total)).as("share"))
    }),

    // REFERENTIAL-INTEGRITY profile — the FK health check a warehouse
    // runs across its star schema: per declared child→parent
    // relationship, child row count, orphan rows (no parent), distinct
    // parents actually referenced, and the max fan-out (hottest
    // parent). One row per relationship. Plan per pair: the child
    // aggregates per key FIRST (so the join and the orphan test see
    // one row per key, not per child row), then left-joins the parent
    // key set — dimension-sized parents broadcast; fact-sized ones
    // (orders) shuffle once on the key. No distinct-on-child, no
    // row-level parent join.
    "prof10_fk_integrity" -> ((s, dir) => {
      def rel(name: String, child: org.apache.spark.sql.DataFrame, ck: String,
              parent: org.apache.spark.sql.DataFrame, pk: String,
              broadcastParent: Boolean) = {
        val perKey = child.groupBy(col(ck).as("k")).agg(count(lit(1)).as("c"))
        val pkeys = parent.select(col(pk).as("k")).distinct()
          .withColumn("present", lit(1L))
        val joined = perKey.join(
          if (broadcastParent) broadcast(pkeys) else pkeys, Seq("k"), "left")
        joined.agg(
            sum(col("c")).as("n_child"),
            sum(when(col("present").isNull, col("c")).otherwise(0L)).as("n_orphan"),
            sum(when(col("present").isNotNull, 1L).otherwise(0L)).as("n_parents_used"),
            max(col("c")).as("max_fanout"))
          .select(lit(name).as("rel"), col("n_child"), col("n_orphan"),
            col("n_parents_used"), col("max_fanout"))
      }
      rel("lineitem.orderkey->orders", Tables.lineitem(s, dir), "l_orderkey",
          Tables.orders(s, dir), "o_orderkey", broadcastParent = false)
        .unionByName(rel("orders.custkey->customer", Tables.orders(s, dir), "o_custkey",
          Tables.customer(s, dir), "c_custkey", broadcastParent = true))
        .unionByName(rel("customer.nationkey->nation", Tables.customer(s, dir), "c_nationkey",
          Tables.nation(s, dir), "n_nationkey", broadcastParent = true))
        .unionByName(rel("events.user_id->customer", Tables.events(s, dir), "user_id",
          Tables.customer(s, dir), "c_custkey", broadcastParent = true))
    }),

    // CROSS-TABLE RECONCILIATION — dq1's row rules extended to the
    // relationship a finance close actually audits: does each order's
    // stored total equal its lines' recomputed total
    // (extendedprice × (1−discount) × (1+tax))? Money is quantized to
    // integer cents PER ROW (identical double expression tree, then
    // floor/round — so the cross-row sums are order-free integers),
    // and the report is one aggregate: orders checked, orders with no
    // lines, mismatches beyond 1 cent, and the worst absolute drift.
    "dq2_reconciliation" -> ((s, dir) => {
      val li = Tables.lineitem(s, dir)
        .withColumn("cents", expr(
          "CAST(floor(((l_extendedprice * (1.0D - l_discount)) * (1.0D + l_tax)) * 100.0D) AS BIGINT)"))
        .groupBy(col("l_orderkey"))
        .agg(sum(col("cents")).as("recomputed_cents"))
      Tables.orders(s, dir)
        .select(col("o_orderkey"),
          expr("CAST(round(o_totalprice * 100.0D) AS BIGINT)").as("stored_cents"))
        .join(li, col("o_orderkey") === col("l_orderkey"), "left")
        .agg(count(lit(1)).as("n_orders"),
          sum(when(col("recomputed_cents").isNull, 1L).otherwise(0L)).as("n_no_lines"),
          sum(when(col("recomputed_cents").isNotNull &&
              abs(col("stored_cents") - col("recomputed_cents")) > 1L, 1L)
            .otherwise(0L)).as("n_mismatched"),
          max(when(col("recomputed_cents").isNotNull,
            abs(col("stored_cents") - col("recomputed_cents")))).as("max_abs_diff_cents"))
    }),

    // FUNCTIONAL-DEPENDENCY discovery — does column A determine column
    // B? The schema-inference profiling a warehouse runs to find
    // candidate keys and denormalization opportunities. Per candidate
    // FD the plan is the two-level form: groupBy(A) with a single
    // per-group countDistinct(B), then a one-row rollup — violations =
    // Σ (ndv_B_in_group − 1), so fd_holds ⇔ zero extra pairs. The
    // intermediate is keyspace-sized, each branch carries exactly ONE
    // DISTINCT (prof1's lesson: multi-DISTINCT Expand duplicates the
    // corpus per column), and the five relations union into one
    // 5-row report.
    "prof11_fd_discovery" -> ((s, dir) => {
      def fd(name: String, df: org.apache.spark.sql.DataFrame, a: String, b: String) =
        df.groupBy(col(a)).agg(countDistinct(col(b)).as("nb"))
          .agg(count(lit(1)).as("n_groups"),
            sum(when(col("nb") > 1L, 1L).otherwise(0L)).as("n_violating_groups"),
            sum(col("nb") - 1L).as("n_extra_pairs"))
          .select(lit(name).as("fd"), col("n_groups"), col("n_violating_groups"),
            col("n_extra_pairs"), (col("n_extra_pairs") === 0L).as("fd_holds"))
      fd("nation.nationkey->name", Tables.nation(s, dir), "n_nationkey", "n_name")
        .unionByName(fd("orders.orderkey->custkey", Tables.orders(s, dir),
          "o_orderkey", "o_custkey"))
        .unionByName(fd("events.event_id->user_id", Tables.events(s, dir),
          "event_id", "user_id"))
        .unionByName(fd("lineitem.orderkey->partkey", Tables.lineitem(s, dir),
          "l_orderkey", "l_partkey"))
        .unionByName(fd("customer.nationkey->mktsegment", Tables.customer(s, dir),
          "c_nationkey", "c_mktsegment"))
    }),

    // DATA-QUALITY RULE EVALUATION — a declarative constraint registry
    // (not-null / range / set-membership / key-uniqueness) evaluated
    // against lineitem in ONE aggregate pass: every row-level rule is
    // a sum(violation) branch of the same scan, uniqueness rides the
    // identical aggregate as count − countDistinct(key), and the
    // 7-row report explodes from the single result row. The
    // registry-drives-the-plan pattern of t14b/s3c/val1 applied to
    // quality monitoring (Deequ-style); at 100 TB this is one
    // map-side-combined scan, never a pass per rule.
    "dq1_quality_rules" -> ((s, dir) => {
      val li = Tables.lineitem(s, dir)
      val rowRules: Seq[(Long, String, String, org.apache.spark.sql.Column)] = Seq(
        (1L, "not_null", "l_orderkey", col("l_orderkey").isNull),
        (2L, "not_null", "l_returnflag", col("l_returnflag").isNull),
        (3L, "range", "l_quantity",
          !(col("l_quantity") >= 1.0 && col("l_quantity") <= 50.0)),
        (4L, "range", "l_discount",
          !(col("l_discount") >= 0.0 && col("l_discount") <= 0.1)),
        (5L, "in_set", "l_returnflag", !col("l_returnflag").isin("A", "N", "R")),
        (6L, "in_set", "l_linestatus", !col("l_linestatus").isin("O", "F")))
      val aggs =
        rowRules.map { case (id, _, _, bad) =>
          sum(when(bad, 1L).otherwise(0L)).as(s"v$id")
        } ++ Seq(
          count(lit(1)).as("n_rows"),
          countDistinct(concat_ws("|", col("l_orderkey"), col("l_linenumber")))
            .as("n_distinct_keys"))
      val one = li.agg(aggs.head, aggs.tail: _*)
      val reportCols = rowRules.map { case (id, typ, c, _) =>
        s"named_struct('rule_id', ${id}L, 'rule_type', '$typ', 'column_name', '$c', " +
          s"'n_violations', v$id)"
      } :+ ("named_struct('rule_id', 7L, 'rule_type', 'unique', " +
        "'column_name', 'l_orderkey|l_linenumber', " +
        "'n_violations', n_rows - n_distinct_keys)")
      one.select(col("n_rows"),
          explode(expr(reportCols.mkString("array(", ", ", ")"))).as("r"))
        .select(col("r.rule_id"), col("r.rule_type"), col("r.column_name"),
          col("n_rows"), col("r.n_violations"),
          (col("r.n_violations") === 0L).as("passed"))
    }),

    // DQ3: k-ANONYMITY audit (Sweeney 2002) — the privacy gate a
    // training-data release runs before shipping records containing
    // quasi-identifiers: every (nation, segment, balance-band)
    // equivalence class of the customer table is sized, and a class
    // under k = 5 members is re-identifiable (its records are the
    // suppression/generalization work queue). One hash aggregate over
    // the QI tuple — class cardinality is QI-domain-bounded, never
    // corpus-bounded, so the report stays small at any scale. The
    // balance band quantizes through DECIMAL cents then integer DIV
    // (trunc parity on negative balances verified this round).
    "dq3_k_anonymity" -> ((s, dir) => {
      val k = 5L
      Tables.customer(s, dir)
        .select(col("c_nationkey").cast("long").as("nation"),
          col("c_mktsegment").as("segment"),
          expr("CAST(CAST(c_acctbal AS DECIMAL(12,2)) * 100 AS BIGINT) DIV 100000")
            .as("bal_band"))
        .groupBy(col("nation"), col("segment"), col("bal_band"))
        .agg(count(lit(1)).as("n_records"))
        .withColumn("k_anonymous", col("n_records") >= k)
    }),

    // DQ6: L-DIVERSITY — the re-identification audit k-anonymity
    // alone misses (Machanavajjhala et al., ICDE'06): a
    // quasi-identifier group can be k-large yet expose everyone in it
    // if they all share one SENSITIVE value. Same dq3 QI grouping
    // (nation, segment, balance band); the sensitive attribute is the
    // customer's order priority profile — per group, the number of
    // DISTINCT top priorities among its members must be >= l = 3.
    // Plan shape: one join customer→latest-order (the q05 latest-per-
    // key window, user-keyed so partitions are order-count bounded),
    // then ONE two-level aggregate: distinct sensitive values per
    // group via (group, value) pre-aggregation — map-side combinable,
    // no countDistinct shuffle of raw rows.
    "dq6_l_diversity" -> ((s, dir) => {
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_orderdate").desc, col("o_orderkey").desc)
      val latest = Tables.orders(s, dir)
        .withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
        .select(col("o_custkey"), col("o_orderpriority").as("sensitive"))
      Tables.customer(s, dir)
        .select(col("c_custkey"), col("c_nationkey").cast("long").as("nation"),
          col("c_mktsegment").as("segment"),
          expr("CAST(CAST(c_acctbal AS DECIMAL(12,2)) * 100 AS BIGINT) DIV 100000")
            .as("bal_band"))
        .join(latest, col("c_custkey") === col("o_custkey"))
        .groupBy(col("nation"), col("segment"), col("bal_band"), col("sensitive"))
        .agg(count(lit(1)).as("nv"))
        .groupBy(col("nation"), col("segment"), col("bal_band"))
        .agg(sum(col("nv")).as("n_records"), count(lit(1)).as("n_sensitive"))
        .withColumn("l_diverse", col("n_sensitive") >= 3L)
    }),

    // DQ4: BENFORD FIRST-DIGIT AUDIT (Benford 1938; Nigrini's fraud-
    // detection use) — the anomaly screen an ingest-quality gate runs
    // over monetary amounts: naturally-occurring multi-magnitude
    // amounts follow P(d) = log10(1 + 1/d); a synthetic or tampered
    // feed doesn't. One scan, one 9-row aggregate; the expected
    // distribution is 9 plan literals computed once at build (the
    // SAME integer ppm constants are interpolated into the oracle, so
    // no transcendental runs in either engine) and the observed share
    // divides by the memoized order-count statistic — no second scan,
    // no window.
    "dq4_benford" -> ((s, dir) => {
      val sess = s
      import sess.implicits._
      val nOrders = Tables.countStat(s, dir, "orders")
      val expected = (1L to 9L)
        .map(d => (d, math.floor(math.log10(1.0 + 1.0 / d) * 1e6).toLong))
      val expDf = expected.toDF("digit", "expected_ppm")
      Tables.orders(s, dir)
        .select(expr("CAST(substring(CAST(CAST(round(o_totalprice * 100) AS BIGINT)" +
          " AS STRING), 1, 1) AS BIGINT)").as("digit"))
        .groupBy(col("digit")).agg(count(lit(1)).as("n_orders"))
        .withColumn("observed_ppm", expr(s"n_orders * 1000000L DIV ${nOrders}L"))
        .join(broadcast(expDf), "digit")
        .withColumn("deviation_ppm", abs(col("observed_ppm") - col("expected_ppm")))
    }),

    // DQ5: FRESHNESS / SLA AUDIT — the staleness leg the dq family
    // lacked (dq1 rules, dq2 reconciliation, dq3 k-anon, dq4 Benford):
    // per event stream, when did data LAST arrive and is the recent
    // arrival RATE collapsing? Staleness = lag behind the freshest
    // stream's max day, bucketed into the classic fresh ≤ 1d /
    // stale ≤ 7d / dead tiers; the rate check compares the final-day
    // volume against the stream's lifetime daily average in ppm (a
    // silent-upstream detector that fires BEFORE staleness does).
    // One daily aggregate; everything else runs on the
    // (streams × days)-domain table with a 1-row watermark scalar.
    "dq5_freshness_sla" -> ((s, dir) => {
      val day = 86400000000L
      val daily = Tables.events(s, dir)
        .groupBy(col("event_type"),
          expr(s"unix_micros(ts) DIV $day").as("d"))
        .agg(count(lit(1)).as("n"))
      val perStream = daily.groupBy(col("event_type"))
        .agg(max(col("d")).as("last_day"), sum(col("n")).as("n_total"),
          count(lit(1)).as("n_days"),
          max(struct(col("d"), col("n"))).as("last")) // (max day, its count)
        .select(col("event_type"), col("last_day"), col("n_total"),
          col("n_days"), col("last.n").as("last_day_n"))
      val wm = perStream.agg(max(col("last_day")).as("watermark"))
      perStream.crossJoin(broadcast(wm)) // 1-row scalar, rule (b)
        .withColumn("staleness_days", col("watermark") - col("last_day"))
        .withColumn("sla_tier", expr(
          "CASE WHEN watermark - last_day <= 1 THEN 'fresh' " +
            "WHEN watermark - last_day <= 7 THEN 'stale' ELSE 'dead' END"))
        .withColumn("avg_daily_n", expr("n_total DIV n_days"))
        .withColumn("last_rate_ppm", expr(
          "IF(n_total = 0, 0L, last_day_n * n_days * 1000000L DIV n_total)"))
        .withColumn("rate_collapsed", col("last_rate_ppm") < 500000L)
        .select(col("event_type"), col("last_day"), col("staleness_days"),
          col("sla_tier"), col("n_days"), col("avg_daily_n"),
          col("last_day_n"), col("last_rate_ppm"), col("rate_collapsed"))
    }),

    // PROF13: ROBUST OUTLIERS BY MEDIAN ABSOLUTE DEVIATION — the
    // skew-immune sibling of ll11's z-score outliers (one whale
    // shifts a mean+stddev fence; the median/MAD fence doesn't move,
    // Hampel's classic estimator). Both location and spread come from
    // Percentiles.exact, so every stage is the bounded bucket-count
    // machinery (no corpus-sized percentile buffer — the r10 verdict
    // item that machinery exists to prevent); deviations stay in
    // doubled integer cents (2·cents keeps the x.5 medians exact) and
    // the 3·MAD fence compares 2·dev2 > 3·round(2·mad2) — all-integer
    // arithmetic both engines reproduce bit-for-bit. The nation-keyed
    // joins broadcast a 25-row model table back over the scan.
    // The median→MAD chain is broken at NATION-GRAIN MODEL TABLES:
    // each percentile pass lands as a 25-row driver-side collect
    // (the centroid/mmdb model-sized-collect precedent) re-emitted as
    // a literal broadcast, because feeding one percentile pipeline's
    // OUTPUT into another as a plan subtree re-expands the inner
    // pipeline ~5x inside the outer's machinery (the executed plan hit
    // 40 parquet scans of a 15k-row table — the r16 board's slowest
    // query). Downstream of the collects everything is value-grain:
    // the median reads the (nation, cents) histogram, the deviation
    // histogram derives from it per-value (dev2 = |2·cents −
    // round(2·med)|, counts re-merge), the MAD reads that, and the
    // outlier rollup weighs histogram counts — ONE corpus scan per
    // executed action instead of three, bit-identical output (same
    // oracle; doubles survive the collect round-trip exactly).
    "prof13_mad_outliers" -> ((s, dir) => {
      val sess = s
      import sess.implicits._
      // r21 measurement note: the (nation, cents) histogram feeds both
      // percentile collects and the returned rollup (~5 subtree
      // executions), but PINNING it measured +1.5 s per construction —
      // the cache-manager re-planning tax on every dependent plan
      // exceeds the rescan at this scale (the Identity CC code carries
      // the same finding for eager checkpoints). Left unpinned.
      val hist = Tables.customer(s, dir)
        .select(col("c_nationkey").cast("long").as("nation"),
          expr("CAST(CAST(c_acctbal AS DECIMAL(12,2)) * 100 AS BIGINT)").as("cents"))
        .groupBy(col("nation"), col("cents")).agg(count(lit(1)).as("cnt"))
      val med = Percentiles.exactWeighted(hist, Seq("nation"), "cents", "cnt",
          Seq("medc" -> 0.5), merged = true) // hist IS the (nation, cents) groupBy
        .select(col("nation"), col("medc"))
        .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq // 25 rows
        .toDF("nation", "medc")
      val devHist = hist.join(broadcast(med), "nation")
        .withColumn("dev2",
          abs(col("cents") * 2 - expr("CAST(round(medc * 2) AS BIGINT)")))
      val mad = Percentiles.exactWeighted(devHist, Seq("nation"), "dev2", "cnt",
          Seq("mad2" -> 0.5))
        .select(col("nation"), col("mad2"))
        .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq // 25 rows
        .toDF("nation", "mad2")
      devHist.join(broadcast(mad), "nation")
        .groupBy(col("nation"))
        .agg(sum(col("cnt")).as("n_customers"),
          (max(col("medc")) / lit(100.0)).as("median_bal"),
          (max(col("mad2")) / lit(200.0)).as("mad"),
          sum(when(col("dev2") * 2 > expr("CAST(round(mad2 * 2) AS BIGINT)") * 3,
            col("cnt")).otherwise(0L)).as("n_outliers"))
    }),

    // PROF14: φ² INDEPENDENCE AUDIT (normalized chi-squared) — are
    // two categorical columns associated? Pearson's raw χ² DIVERGES
    // with N (any microscopic dependence is "significant" at corpus
    // scale, and its (oN−rc)² term overflows even DECIMAL(38) there),
    // so the profiled statistic is the scale-INVARIANT effect size
    // φ² = χ²/N, per cell in ppb: every term is a bounded ppm ratio
    // (obs ≤ 1e6, exp ≤ 1e6) whatever the corpus size — exact integer
    // with ONE documented truncation per ratio, identical in both
    // engines. Cells = event_type × epoch-weekday domain (the
    // engine-independent integer weekday, no calendar functions).
    // Corpus-scale work is one cell-count aggregate; the row/col
    // margins are cell-domain rollups.
    "prof14_independence" -> ((s, dir) => {
      val day = 86400000000L
      val cells = Tables.events(s, dir)
        .select(col("event_type"),
          expr(s"unix_micros(ts) DIV $day % 7").as("dow"))
        .groupBy(col("event_type"), col("dow"))
        .agg(count(lit(1)).as("o"))
      val rt = cells.groupBy(col("event_type")).agg(sum(col("o")).as("r"))
      val ct = cells.groupBy(col("dow")).agg(sum(col("o")).as("c"))
      val n = cells.agg(sum(col("o")).as("n_total"))
      cells.join(broadcast(rt), "event_type").join(broadcast(ct), "dow")
        .crossJoin(broadcast(n)) // 1-row scalar, rule (b)'s shape
        .withColumn("obs_ppm", expr("o * 1000000L DIV n_total"))
        .withColumn("exp_ppm", expr(
          "CAST(CAST(r AS DECIMAL(38,0)) * c * 1000000 " +
            "DIV (CAST(n_total AS DECIMAL(38,0)) * n_total) AS BIGINT)"))
        .withColumn("phi2_contrib_ppb", expr(
          "IF(exp_ppm = 0, 0L, (obs_ppm - exp_ppm) * (obs_ppm - exp_ppm) " +
            "* 1000 DIV exp_ppm)"))
        .select(col("event_type"), col("dow"), col("o"), col("r"), col("c"),
          col("n_total"), col("obs_ppm"), col("exp_ppm"),
          col("phi2_contrib_ppb"))
    }),

    // KMV1: BOTTOM-K DISTINCT SKETCH PROFILING — prof4's NDV column
    // re-profiled through the KMV/theta sketch (Beyer et al.
    // SIGMOD'07): per event type plus the merged ALL row, the k=64
    // smallest md5 hashes of user_id. Unlike HLL the sketch content
    // is a deterministic function of the input SET, so the oracle
    // replays it with a rank-k window and checks VALUE equality, not
    // an envelope. One partial-agg scan per grouping (k longs per
    // group on the shuffle — never the distinct set); the exact NDV
    // rides alongside to show estimator calibration.
    "kmv1_sketch_ndv" -> ((s, dir) => {
      val k = 64
      val kmv = udaf(new graft.functions.KmvAggregator(k))
      val hashed = Tables.events(s, dir).select(col("event_type"),
        conv(substring(md5(col("user_id").cast("string")), 1, 8), 16, 10)
          .cast("long").as("hv"),
        col("user_id"))
      val perType = hashed.groupBy(col("event_type").as("grp"))
        .agg(kmv(col("hv")).as("sk"), countDistinct(col("user_id")).as("ndv_exact"))
      val all = hashed
        .agg(kmv(col("hv")).as("sk"), countDistinct(col("user_id")).as("ndv_exact"))
        .select(lit("ALL").as("grp"), col("sk"), col("ndv_exact"))
      perType.unionByName(all).select(col("grp"),
        size(col("sk")).cast("long").as("n_sketch"),
        expr("sk[size(sk) - 1]").as("kth_hash"),
        expr(s"CAST(CASE WHEN size(sk) < $k THEN size(sk) " +
          s"ELSE ${k - 1}L * 4294967296L DIV sk[size(sk) - 1] END AS BIGINT)")
          .as("ndv_est"),
        col("ndv_exact"))
    }),

    // PROF15: SHUFFLE-SKEW ADVISOR — the plan-time profile a 100 TB
    // groupBy/join needs BEFORE it runs: for each candidate grouping
    // key, the heavy-hitter share, the skew factor (how many times
    // the mean the heaviest key holds), and the SALT factor that
    // would level the heaviest key across a 32-partition shuffle —
    // ceil(max_key_rows / (rows/32)), the number the ll2/gw1-style
    // salted pipelines take as their `salt` parameter and AQE's
    // skew-join split emulates at runtime. Each key costs one
    // map-side-combinable count aggregate + a 3-number rollup; the
    // cross-multiplications (max·n_keys, max·1e6) run in DECIMAL(38)
    // because both factors are corpus-sized at web scale. event_type
    // (NDV 5) is the planted pathology: its advisor row recommends a
    // real salt while user-grain keys come back salt-free.
    "prof15_skew_advisor" -> ((s, dir) => {
      val ev = Tables.events(s, dir)
      def diag(name: String, key: Column) =
        ev.groupBy(key.cast("string").as("k")).agg(count(lit(1)).as("c"))
          .agg(count(lit(1)).as("n_keys"), sum(col("c")).as("n_rows"),
            max(col("c")).as("max_key_rows"))
          .withColumn("key_name", lit(name))
      Seq(
        diag("user_id", col("user_id")),
        diag("event_type", col("event_type")),
        diag("user_day", concat(col("user_id").cast("string"), lit("|"),
          expr("CAST(unix_micros(ts) DIV 86400000000L AS STRING)"))))
        .reduce(_ unionByName _)
        .withColumn("hh_share_ppm", expr(
          "CAST(CAST(max_key_rows AS DECIMAL(38,0)) * 1000000 DIV n_rows AS BIGINT)"))
        .withColumn("skew_x_permille", expr(
          "CAST(CAST(max_key_rows AS DECIMAL(38,0)) * n_keys * 1000 DIV n_rows AS BIGINT)"))
        .withColumn("rec_salt", expr(
          "greatest(1L, CAST((CAST(max_key_rows AS DECIMAL(38,0)) * 32 + n_rows - 1) " +
            "DIV n_rows AS BIGINT))"))
        .select(col("key_name"), col("n_keys"), col("n_rows"), col("max_key_rows"),
          col("hh_share_ppm"), col("skew_x_permille"), col("rec_salt"))
    }),

    // KMV2: SKETCH SET OPERATIONS — the capability HLL registers
    // cannot give (a2c can only union): |A ∪ B| from the merged
    // sketch and |A ∩ B| from the inclusion fraction — the k smallest
    // union hashes are computable from the two k-bounded sketches
    // alone, and the share of them present in BOTH sketches estimates
    // Jaccard (the DataSketches theta-intersection rule). Three
    // bounded aggregates over one scan + a 1-row broadcast assembly;
    // exact counts ride alongside. All arithmetic is integer DIV on
    // plan-literal k and the 2^32 hash domain, so the estimate itself
    // is oracle-exact.
    "kmv2_sketch_setops" -> ((s, dir) => {
      val k = 64
      val kmv = udaf(new graft.functions.KmvAggregator(k))
      val hashed = Tables.events(s, dir)
        .filter(col("event_type").isin("click", "purchase"))
        .select(col("event_type"),
          conv(substring(md5(col("user_id").cast("string")), 1, 8), 16, 10)
            .cast("long").as("hv"),
          col("user_id"))
      val skA = hashed.filter(col("event_type") === "click")
        .agg(kmv(col("hv")).as("ska"))
      val skB = hashed.filter(col("event_type") === "purchase")
        .agg(kmv(col("hv")).as("skb"))
      val skU = hashed.agg(kmv(col("hv")).as("sku"))
      val exact = hashed.groupBy(col("user_id"))
        .agg(max(when(col("event_type") === "click", 1L).otherwise(0L)).as("ia"),
          max(when(col("event_type") === "purchase", 1L).otherwise(0L)).as("ib"))
        .agg(count(lit(1)).as("exact_union"),
          sum(when(col("ia") === 1L && col("ib") === 1L, 1L).otherwise(0L))
            .as("exact_intersection"))
      skU.crossJoin(broadcast(skA)).crossJoin(broadcast(skB))
        .crossJoin(broadcast(exact))
        .withColumn("est_union",
          expr(s"CAST(CASE WHEN size(sku) < $k THEN size(sku) " +
            s"ELSE ${k - 1}L * 4294967296L DIV sku[size(sku) - 1] END AS BIGINT)"))
        .withColumn("n_common",
          size(array_intersect(col("sku"), array_intersect(col("ska"), col("skb"))))
            .cast("long"))
        .select(col("est_union"), col("n_common"),
          expr("CAST(n_common * est_union DIV size(sku) AS BIGINT)")
            .as("est_intersection"),
          col("exact_union"), col("exact_intersection"))
    })
  )

  val oracles: Map[String, String] = Map(
    // same two-pass centered sums; HUGEINT carries what Spark holds
    // in DECIMAL(38)
    "prof16_correlation" -> {
      val pairs = Seq(("qty_price", "qty", "m_qty", "price_c", "m_price_c"),
        ("qty_disc", "qty", "m_qty", "disc_c", "m_disc_c"),
        ("part_supp", "pk", "m_pk", "sk", "m_sk"))
      val sums = pairs.flatMap { case (tag, x, mx, y, my) => Seq(
        s"CAST(SUM(CAST(($x - $mx) AS HUGEINT) * ($y - $my)) AS HUGEINT) AS sxy_$tag",
        s"CAST(SUM(CAST(($x - $mx) AS HUGEINT) * ($x - $mx)) AS HUGEINT) AS sxx_$tag",
        s"CAST(SUM(CAST(($y - $my) AS HUGEINT) * ($y - $my)) AS HUGEINT) AS syy_$tag")
      }.mkString(", ")
      val legs = pairs.map { case (tag, _, _, _, _) =>
        s"SELECT '$tag' AS pair, n, " +
          s"CAST(CASE WHEN sxy_$tag > 0 THEN 1 WHEN sxy_$tag < 0 THEN -1 " +
          s"ELSE 0 END AS BIGINT) AS sign_r, " +
          s"CAST((sxy_$tag // sc_$tag) * (sxy_$tag // sc_$tag) * 1000000 " +
          s"// greatest(CAST(1 AS HUGEINT), " +
          s"(sxx_$tag // sc_$tag) * (syy_$tag // sc_$tag)) AS BIGINT) " +
          s"AS r2_ppm FROM scaled"
      }.mkString(" UNION ALL ")
      val scs = pairs.map { case (tag, _, _, _, _) =>
        s"greatest(CAST(1 AS HUGEINT), " +
          s"greatest(abs(sxy_$tag), abs(sxx_$tag), abs(syy_$tag)) " +
          s"// 1000000000000000) AS sc_$tag"
      }.mkString(", ")
      s"""WITH li AS (SELECT CAST(l_quantity AS BIGINT) AS qty,
              CAST(round(l_extendedprice * 100) AS BIGINT) AS price_c,
              CAST(round(l_discount * 100) AS BIGINT) AS disc_c,
              l_partkey AS pk, l_suppkey AS sk FROM lineitem),
          means AS (SELECT COUNT(*) AS n,
              CAST(SUM(qty) // COUNT(*) AS BIGINT) AS m_qty,
              CAST(SUM(price_c) // COUNT(*) AS BIGINT) AS m_price_c,
              CAST(SUM(disc_c) // COUNT(*) AS BIGINT) AS m_disc_c,
              CAST(SUM(pk) // COUNT(*) AS BIGINT) AS m_pk,
              CAST(SUM(sk) // COUNT(*) AS BIGINT) AS m_sk
            FROM li),
          wide AS (SELECT MAX(n) AS n, $sums FROM li CROSS JOIN means),
          scaled AS (SELECT *, $scs FROM wide),
          d AS (SELECT CAST(len(string_split(text, ' ')) AS BIGINT) AS nw,
                  CAST(length(text) AS BIGINT) AS nc FROM documents),
          dmeans AS (SELECT COUNT(*) AS n,
              CAST(SUM(nw) // COUNT(*) AS BIGINT) AS m_nw,
              CAST(SUM(nc) // COUNT(*) AS BIGINT) AS m_nc FROM d),
          dwide AS (SELECT MAX(n) AS n,
              CAST(SUM(CAST((nw - m_nw) AS HUGEINT) * (nc - m_nc)) AS HUGEINT) AS sxy_wc,
              CAST(SUM(CAST((nw - m_nw) AS HUGEINT) * (nw - m_nw)) AS HUGEINT) AS sxx_wc,
              CAST(SUM(CAST((nc - m_nc) AS HUGEINT) * (nc - m_nc)) AS HUGEINT) AS syy_wc
            FROM d CROSS JOIN dmeans),
          dscaled AS (SELECT *,
              greatest(CAST(1 AS HUGEINT),
                greatest(abs(sxy_wc), abs(sxx_wc), abs(syy_wc))
                  // 1000000000000000) AS sc_wc
            FROM dwide),
          dleg AS (SELECT 'words_chars' AS pair, n,
              CAST(CASE WHEN sxy_wc > 0 THEN 1 WHEN sxy_wc < 0 THEN -1
                ELSE 0 END AS BIGINT) AS sign_r,
              CAST((sxy_wc // sc_wc) * (sxy_wc // sc_wc) * 1000000
                // greatest(CAST(1 AS HUGEINT),
                  (sxx_wc // sc_wc) * (syy_wc // sc_wc)) AS BIGINT)
                AS r2_ppm
            FROM dscaled)
          SELECT pair, n, sign_r, r2_ppm FROM ($legs UNION ALL
            SELECT pair, n, sign_r, r2_ppm FROM dleg)"""
    },
    // the per-row money expression is pinned parenthesis-for-
    // parenthesis; sums happen over the quantized integers only
    "dq2_reconciliation" ->
      """WITH li AS (
           SELECT l_orderkey,
             CAST(SUM(CAST(floor(((l_extendedprice * (CAST(1 AS DOUBLE) - l_discount))
                  * (CAST(1 AS DOUBLE) + l_tax)) * CAST(100 AS DOUBLE)) AS BIGINT)) AS BIGINT)
               AS recomputed_cents
           FROM lineitem GROUP BY 1),
         o AS (SELECT o_orderkey,
                 CAST(round(o_totalprice * CAST(100 AS DOUBLE)) AS BIGINT) AS stored_cents
               FROM orders)
         SELECT COUNT(*) AS n_orders,
           CAST(SUM(CASE WHEN recomputed_cents IS NULL THEN 1 ELSE 0 END) AS BIGINT)
             AS n_no_lines,
           CAST(SUM(CASE WHEN recomputed_cents IS NOT NULL
                         AND abs(stored_cents - recomputed_cents) > 1
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_mismatched,
           CAST(MAX(CASE WHEN recomputed_cents IS NOT NULL
                         THEN abs(stored_cents - recomputed_cents) END) AS BIGINT)
             AS max_abs_diff_cents
         FROM o LEFT JOIN li ON o.o_orderkey = li.l_orderkey""",
    "prof11_fd_discovery" -> {
      val fds = Seq(
        ("nation.nationkey->name", "nation", "n_nationkey", "n_name"),
        ("orders.orderkey->custkey", "orders", "o_orderkey", "o_custkey"),
        ("events.event_id->user_id", "events", "event_id", "user_id"),
        ("lineitem.orderkey->partkey", "lineitem", "l_orderkey", "l_partkey"),
        ("customer.nationkey->mktsegment", "customer", "c_nationkey", "c_mktsegment"))
      fds.map { case (name, t, a, b) =>
        s"""SELECT '$name' AS fd, COUNT(*) AS n_groups,
              CAST(SUM(CASE WHEN nb > 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_violating_groups,
              CAST(SUM(nb - 1) AS BIGINT) AS n_extra_pairs,
              CAST(SUM(nb - 1) AS BIGINT) = 0 AS fd_holds
            FROM (SELECT $a, COUNT(DISTINCT $b) AS nb FROM $t GROUP BY $a)"""
      }.mkString(" UNION ALL ")
    },
    "dq1_quality_rules" -> {
      val rules = Seq(
        (1, "not_null", "l_orderkey", "l_orderkey IS NULL"),
        (2, "not_null", "l_returnflag", "l_returnflag IS NULL"),
        (3, "range", "l_quantity", "NOT (l_quantity >= 1.0 AND l_quantity <= 50.0)"),
        (4, "range", "l_discount", "NOT (l_discount >= 0.0 AND l_discount <= 0.1)"),
        (5, "in_set", "l_returnflag", "l_returnflag NOT IN ('A', 'N', 'R')"),
        (6, "in_set", "l_linestatus", "l_linestatus NOT IN ('O', 'F')"))
      val rows = rules.map { case (id, typ, c, bad) =>
        s"""SELECT CAST($id AS BIGINT) AS rule_id, '$typ' AS rule_type,
              '$c' AS column_name, COUNT(*) AS n_rows,
              CAST(SUM(CASE WHEN $bad THEN 1 ELSE 0 END) AS BIGINT) AS n_violations
            FROM lineitem"""
      } :+
        s"""SELECT CAST(7 AS BIGINT), 'unique', 'l_orderkey|l_linenumber', COUNT(*),
              COUNT(*) - COUNT(DISTINCT concat_ws('|', l_orderkey, l_linenumber))
            FROM lineitem"""
      s"""SELECT rule_id, rule_type, column_name, n_rows, n_violations,
            n_violations = 0 AS passed
          FROM (${rows.mkString(" UNION ALL ")})"""
    },
    "prof10_fk_integrity" -> {
      val rels = Seq(
        ("lineitem.orderkey->orders", "lineitem", "l_orderkey", "orders", "o_orderkey"),
        ("orders.custkey->customer", "orders", "o_custkey", "customer", "c_custkey"),
        ("customer.nationkey->nation", "customer", "c_nationkey", "nation", "n_nationkey"),
        ("events.user_id->customer", "events", "user_id", "customer", "c_custkey"))
      rels.map { case (name, child, ck, parent, pk) =>
        s"""SELECT '$name' AS rel,
              CAST(SUM(c) AS BIGINT) AS n_child,
              CAST(SUM(CASE WHEN p.k IS NULL THEN c ELSE 0 END) AS BIGINT) AS n_orphan,
              CAST(SUM(CASE WHEN p.k IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_parents_used,
              CAST(MAX(c) AS BIGINT) AS max_fanout
            FROM (SELECT $ck AS k, COUNT(*) AS c FROM $child GROUP BY 1) ch
            LEFT JOIN (SELECT DISTINCT $pk AS k FROM $parent) p ON ch.k = p.k"""
      }.mkString(" UNION ALL ")
    },
    "prof1_table_stats" -> {
      val cols = Seq("l_orderkey" -> true, "l_partkey" -> true,
        "l_quantity" -> true, "l_returnflag" -> false)
      cols.map { case (c, num) =>
        val mn = if (num) s"CAST(CAST(MIN($c) AS BIGINT) AS VARCHAR)" else s"MIN($c)"
        val mx = if (num) s"CAST(CAST(MAX($c) AS BIGINT) AS VARCHAR)" else s"MAX($c)"
        s"""SELECT '$c' AS column_name,
              CAST(SUM(CASE WHEN $c IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_nulls,
              CAST(COUNT(DISTINCT $c) AS BIGINT) AS ndv,
              $mn AS min_s, $mx AS max_s
            FROM lineitem"""
      }.mkString(" UNION ALL ")
    },
    // per-column replay of the a2c register math (ungrouped form):
    // same hash, same rank split, same exact-HUGEINT harmonic sum and
    // linear-counting correction — see Transforms.scala's a2c oracle
    // for the derivation
    "prof4_sketch_ndv" -> {
      val rankCase = (1 to 52)
        .map(r => s"WHEN rest >= ${BigInt(1) << (64 - r)} THEN $r").mkString(" ")
      val rawEst = """(0.7213 / (1 + 1.079 / 4096.0)) * 4096 * 4096 /
                      (CAST(num AS DOUBLE) / 18446744073709551616.0)"""
      def branch(c: String) =
        s"""SELECT '$c' AS column_name,
              (WITH h AS (SELECT CAST('0x' || substr(md5(CAST($c AS VARCHAR)), 1, 16)
                            AS UBIGINT) AS h
                          FROM lineitem WHERE $c IS NOT NULL),
                 rk AS (SELECT h >> 52 AS idx,
                          CASE WHEN rest = 0 THEN 53 $rankCase END AS rank
                        FROM (SELECT h, (h % 4503599627370496) * 4096 AS rest FROM h)),
                 reg AS (SELECT idx, MAX(rank) AS reg FROM rk GROUP BY 1),
                 est AS (SELECT SUM(1::HUGEINT << (64 - reg))
                             + (4096 - COUNT(*)) * (1::HUGEINT << 64) AS num,
                           4096 - COUNT(*) AS zeros FROM reg)
               SELECT CAST(round(CASE WHEN $rawEst <= 2.5 * 4096 AND zeros > 0
                            THEN 4096 * ln(4096.0 / zeros)
                            ELSE $rawEst END) AS BIGINT) FROM est) AS ndv_sketch,
              (SELECT COUNT(DISTINCT $c) FROM lineitem) AS ndv_exact"""
      Seq("l_orderkey", "l_partkey", "l_returnflag")
        .map(branch).mkString(" UNION ALL ")
    },
    // identical bucket arithmetic via scalar min/max per column; both
    // engines derive lo/hi from the same data, no literal embedding
    "prof5_histograms" -> {
      val branches = Seq("l_quantity", "l_extendedprice", "l_discount")
        .map(c => s"SELECT '$c' AS col_name, CAST($c AS DOUBLE) AS v FROM lineitem")
        .mkString(" UNION ALL ")
      s"""WITH long AS ($branches),
         mm AS (SELECT col_name, MIN(v) AS lo, MAX(v) AS hi FROM long GROUP BY col_name)
         SELECT l.col_name,
           CASE WHEN mm.hi = mm.lo THEN 0
                ELSE CAST(LEAST(floor((l.v - mm.lo) * 16.0 / (mm.hi - mm.lo)), 15) AS BIGINT)
           END AS bucket,
           COUNT(*) AS n, MIN(l.v) AS bucket_min, MAX(l.v) AS bucket_max
         FROM long l JOIN mm USING (col_name)
         GROUP BY 1, 2"""
    },
    "prof9_mcv_values" -> {
      val branches = Seq("l_returnflag", "l_linestatus", "l_quantity")
        .map(c => s"SELECT '$c' AS col_name, CAST($c AS VARCHAR) AS v FROM lineitem")
        .mkString(" UNION ALL ")
      s"""WITH long AS ($branches),
         counts AS (SELECT col_name, v, COUNT(*) AS cnt FROM long GROUP BY 1, 2),
         tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS t FROM lineitem),
         r AS (SELECT col_name, v, cnt,
                 ROW_NUMBER() OVER (PARTITION BY col_name ORDER BY cnt DESC, v) AS rank
               FROM counts)
         SELECT col_name, CAST(rank AS BIGINT) AS rank, v AS value,
                CAST(cnt AS BIGINT) AS n_rows,
                CAST(cnt AS DOUBLE) / t AS share
         FROM r, tot WHERE rank <= 5"""
    },
    // identical power sums in HUGEINT (exact), doubles only at the
    // sqrt/division edge
    "prof8_corr_matrix" -> {
      val cols = Seq("l_quantity", "l_extendedprice", "l_discount")
      val qdefs = cols.map(c =>
        s"CAST(CAST(round(CAST($c AS DOUBLE) * 100) AS BIGINT) AS HUGEINT) AS $c").mkString(", ")
      val sums = cols.map(c => s"SUM($c) AS s_$c").mkString(", ") + ", " +
        cols.map(c => s"SUM($c * $c) AS ss_$c").mkString(", ") + ", " +
        cols.combinations(2).map { case Seq(a, b) =>
          s"SUM($a * $b) AS sp_${a}_$b"
        }.mkString(", ") + ", CAST(COUNT(*) AS HUGEINT) AS n"
      val pairSelects = cols.combinations(2).map { case Seq(a, b) =>
        s"""SELECT '$a' AS col_x, '$b' AS col_y, CAST(n AS BIGINT) AS n_rows,
              CAST(n * sp_${a}_$b - s_$a * s_$b AS DOUBLE) /
                (sqrt(CAST(n * ss_$a - s_$a * s_$a AS DOUBLE)) *
                 sqrt(CAST(n * ss_$b - s_$b * s_$b AS DOUBLE))) AS pearson_r
            FROM stats"""
      }.mkString(" UNION ALL ")
      s"""WITH q AS (SELECT $qdefs FROM lineitem),
          stats AS (SELECT $sums FROM q)
          $pairSelects"""
    },
    // full CMS replay: same md5-derived (j, cell) hashing, same 4x1024
    // build aggregate, same min-over-rows point estimate — plus the
    // exact recount; the lower-bound boolean is computed (not pinned)
    // on both sides and must agree
    "prof7_cms_freq" ->
      """WITH keys AS (SELECT user_id % 100 AS key FROM events),
         js AS (SELECT unnest(range(0, 4)) AS j),
         cells AS (SELECT j,
             CAST(CAST('0x' || substr(md5(CAST(j AS VARCHAR) || ':' || CAST(key AS VARCHAR)), 1, 8)
               AS UBIGINT) % 1024 AS BIGINT) AS cell,
             COUNT(*) AS c
           FROM keys, js GROUP BY 1, 2),
         probes AS (SELECT DISTINCT key FROM keys WHERE key < 10),
         pc AS (SELECT key, j,
             CAST(CAST('0x' || substr(md5(CAST(j AS VARCHAR) || ':' || CAST(key AS VARCHAR)), 1, 8)
               AS UBIGINT) % 1024 AS BIGINT) AS cell
           FROM probes, js),
         est AS (SELECT key, CAST(MIN(COALESCE(c, 0)) AS BIGINT) AS est
                 FROM pc LEFT JOIN cells USING (j, cell) GROUP BY key),
         ex AS (SELECT key, COUNT(*) AS exact_n FROM keys WHERE key < 10 GROUP BY key)
         SELECT key, est, exact_n, est >= exact_n AS lower_bound_ok
         FROM est JOIN ex USING (key)""",
    // the same DECIMAL-cents quantization and trunc division
    "dq3_k_anonymity" ->
      """SELECT CAST(c_nationkey AS BIGINT) AS nation, c_mktsegment AS segment,
           CAST(CAST(c_acctbal AS DECIMAL(12,2)) * 100 AS BIGINT) // 100000 AS bal_band,
           COUNT(*) AS n_records,
           COUNT(*) >= 5 AS k_anonymous
         FROM customer GROUP BY 1, 2, 3""",
    // same QI grouping, sensitive = latest order's priority (q05's
    // latest-per-key tie order: date desc, orderkey desc)
    "dq6_l_diversity" ->
      """WITH latest AS (SELECT o_custkey, o_orderpriority AS sensitive
           FROM (SELECT o_custkey, o_orderpriority,
                   ROW_NUMBER() OVER (PARTITION BY o_custkey
                     ORDER BY o_orderdate DESC, o_orderkey DESC) AS rn
                 FROM orders) t WHERE rn = 1)
         SELECT CAST(c_nationkey AS BIGINT) AS nation,
           c_mktsegment AS segment,
           CAST(CAST(c_acctbal AS DECIMAL(12,2)) * 100 AS BIGINT) // 100000 AS bal_band,
           COUNT(*) AS n_records,
           CAST(COUNT(DISTINCT sensitive) AS BIGINT) AS n_sensitive,
           COUNT(DISTINCT sensitive) >= 3 AS l_diverse
         FROM customer JOIN latest ON c_custkey = o_custkey
         GROUP BY 1, 2, 3""",
    // quantile_cont == Percentiles.exact bit-for-bit on the integer
    // cent domain (the PercentilesSpec contract), so the cut points —
    // and therefore every bucket count — land identically
    "prof12_equidepth" -> {
      val cutDefs = (1 to 7)
        .map(i => s"quantile_cont(cents, ${i / 8.0}) AS q$i").mkString(", ")
      val bucketSum = (1 to 7)
        .map(i => s"(CASE WHEN cents > cut.q$i THEN 1 ELSE 0 END)").mkString(" + ")
      s"""WITH c AS (SELECT CAST(round(value * 100) AS BIGINT) AS cents FROM events),
          cut AS (SELECT $cutDefs FROM c)
          SELECT CAST($bucketSum AS BIGINT) AS bucket, COUNT(*) AS n,
            MIN(cents) AS lo_cents, MAX(cents) AS hi_cents
          FROM c, cut GROUP BY 1"""
    },
    // the oracle pins the envelope booleans TRUE (the Spark side
    // computes them from the live sketch) and recomputes n exactly
    "prof6_approx_quantiles" ->
      """SELECT event_type, COUNT(*) AS n,
           TRUE AS p50_ok, TRUE AS p95_ok, TRUE AS p99_ok
         FROM events GROUP BY event_type""",
    // plain exact frequency + HAVING over the same derived key and the
    // same integer n/k threshold — the two-phase plan must reproduce it
    "prof3_heavy_hitters" ->
      """WITH keys AS (
           SELECT CASE WHEN user_id % 10 < 3 THEN user_id % 10
                       ELSE user_id + 1000 END AS hot_key
           FROM events),
         t AS (SELECT COUNT(*) AS n FROM keys)
         SELECT hot_key, COUNT(*) AS cnt
         FROM keys CROSS JOIN t
         GROUP BY hot_key, t.n
         HAVING COUNT(*) > t.n // 20""",
    "prof2_key_skew" ->
      """WITH c AS (SELECT user_id, COUNT(*) AS c FROM events GROUP BY user_id),
         t AS (SELECT CAST(COUNT(*) AS BIGINT) AS total FROM events)
         SELECT CAST(ROW_NUMBER() OVER (ORDER BY c DESC, user_id) AS BIGINT) AS rank,
           user_id, CAST(c AS BIGINT) AS n_rows,
           CAST(c AS DOUBLE) / total AS share
         FROM c CROSS JOIN t
         ORDER BY c DESC, user_id LIMIT 10""",
    // same floor(log10(1+1/d)·1e6) plan literals as the Spark side —
    // both engines compare against identical integer constants
    // arg-max day count via (day, n) struct-max on the Spark side =
    // the window-free MAX pair; the oracle reads it with arg_max-like
    // self-join-free ordering
    "dq5_freshness_sla" ->
      """WITH daily AS (SELECT event_type,
             CAST(epoch_us(ts) // 86400000000 AS BIGINT) AS d,
             COUNT(*) AS n
           FROM events GROUP BY 1, 2),
          ps AS (SELECT event_type, MAX(d) AS last_day,
                   CAST(SUM(n) AS BIGINT) AS n_total, COUNT(*) AS n_days
                 FROM daily GROUP BY 1),
          ln AS (SELECT daily.event_type, CAST(n AS BIGINT) AS last_day_n
                 FROM daily JOIN ps ON daily.event_type = ps.event_type
                   AND daily.d = ps.last_day),
          wm AS (SELECT MAX(last_day) AS watermark FROM ps)
          SELECT ps.event_type, last_day,
            CAST(watermark - last_day AS BIGINT) AS staleness_days,
            CASE WHEN watermark - last_day <= 1 THEN 'fresh'
                 WHEN watermark - last_day <= 7 THEN 'stale'
                 ELSE 'dead' END AS sla_tier,
            CAST(n_days AS BIGINT) AS n_days,
            n_total // n_days AS avg_daily_n,
            last_day_n,
            CASE WHEN n_total = 0 THEN 0
                 ELSE last_day_n * n_days * 1000000 // n_total END
              AS last_rate_ppm,
            (CASE WHEN n_total = 0 THEN 0
                  ELSE last_day_n * n_days * 1000000 // n_total END) < 500000
              AS rate_collapsed
          FROM ps JOIN ln ON ps.event_type = ln.event_type CROSS JOIN wm""",
    "dq4_benford" -> {
      val values = (1L to 9L)
        .map(d => s"($d, ${math.floor(math.log10(1.0 + 1.0 / d) * 1e6).toLong})")
        .mkString(", ")
      s"""WITH d AS (SELECT CAST(substr(CAST(CAST(round(o_totalprice * 100) AS BIGINT)
                  AS VARCHAR), 1, 1) AS BIGINT) AS digit FROM orders),
          g AS (SELECT digit, COUNT(*) AS n_orders FROM d GROUP BY 1),
          t AS (SELECT COUNT(*) AS n FROM orders),
          e AS (SELECT * FROM (VALUES $values) v(digit, expected_ppm))
          SELECT g.digit, n_orders,
            CAST(n_orders * 1000000 // t.n AS BIGINT) AS observed_ppm,
            CAST(expected_ppm AS BIGINT) AS expected_ppm,
            CAST(abs(n_orders * 1000000 // t.n - expected_ppm) AS BIGINT)
              AS deviation_ppm
          FROM g JOIN e ON g.digit = e.digit CROSS JOIN t"""
    },
    // quantile_cont == Percentiles.exact (the PercentilesSpec
    // contract) at both the location and the spread stage; all
    // comparisons in doubled integer cents
    "prof13_mad_outliers" ->
      """WITH c AS (SELECT CAST(c_nationkey AS BIGINT) AS nation,
             CAST(CAST(c_acctbal AS DECIMAL(12,2)) * 100 AS BIGINT) AS cents
           FROM customer),
         med AS (SELECT nation, quantile_cont(cents, 0.5) AS medc FROM c GROUP BY 1),
         dev AS (SELECT nation, cents, medc,
                   abs(cents * 2 - CAST(round(medc * 2) AS BIGINT)) AS dev2
                 FROM c JOIN med USING (nation)),
         mad AS (SELECT nation, quantile_cont(dev2, 0.5) AS mad2 FROM dev GROUP BY 1)
         SELECT dev.nation, COUNT(*) AS n_customers,
           MAX(medc) / 100.0 AS median_bal,
           MAX(mad2) / 200.0 AS mad,
           CAST(SUM(CASE WHEN dev2 * 2 > CAST(round(mad2 * 2) AS BIGINT) * 3
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers
         FROM dev JOIN mad ON dev.nation = mad.nation
         GROUP BY 1""",
    // bounded ppm ratios make φ² exact integer: HUGEINT margins
    // mirror the Spark side's DECIMAL(38) cross-multiplication
    "prof14_independence" ->
      """WITH cells AS (SELECT event_type,
             CAST(epoch_us(ts) // 86400000000 % 7 AS BIGINT) AS dow,
             COUNT(*) AS o
           FROM events GROUP BY 1, 2),
          rt AS (SELECT event_type, CAST(SUM(o) AS BIGINT) AS r
                 FROM cells GROUP BY 1),
          ct AS (SELECT dow, CAST(SUM(o) AS BIGINT) AS c FROM cells GROUP BY 1),
          n AS (SELECT CAST(SUM(o) AS BIGINT) AS n_total FROM cells),
          j AS (SELECT cells.event_type, cells.dow, o, r, c, n_total,
                  o * 1000000 // n_total AS obs_ppm,
                  CAST(CAST(r AS HUGEINT) * c * 1000000
                    // (CAST(n_total AS HUGEINT) * n_total) AS BIGINT) AS exp_ppm
                FROM cells JOIN rt USING (event_type) JOIN ct USING (dow)
                CROSS JOIN n)
          SELECT event_type, dow, o, r, c, n_total,
            CAST(obs_ppm AS BIGINT) AS obs_ppm, exp_ppm,
            CAST(CASE WHEN exp_ppm = 0 THEN 0
                      ELSE (obs_ppm - exp_ppm) * (obs_ppm - exp_ppm) * 1000
                           // exp_ppm END AS BIGINT) AS phi2_contrib_ppb
          FROM j""",
    // the sketch is a deterministic function of the input set: the
    // rank-k window over distinct hashes reproduces it exactly
    "kmv1_sketch_ndv" ->
      """WITH h AS (SELECT DISTINCT event_type AS grp,
             CAST(CAST('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 8)
               AS UBIGINT) AS BIGINT) AS hv
           FROM events),
         ha AS (SELECT * FROM h UNION ALL SELECT DISTINCT 'ALL' AS grp, hv FROM h),
         r AS (SELECT grp, hv,
                 ROW_NUMBER() OVER (PARTITION BY grp ORDER BY hv) AS rn
               FROM ha),
         sk AS (SELECT grp, COUNT(*) AS n_sketch, MAX(hv) AS kth_hash
                FROM r WHERE rn <= 64 GROUP BY 1),
         ex AS (SELECT event_type AS grp, COUNT(DISTINCT user_id) AS ndv_exact
                FROM events GROUP BY 1
                UNION ALL
                SELECT 'ALL', COUNT(DISTINCT user_id) FROM events)
         SELECT grp, CAST(n_sketch AS BIGINT) AS n_sketch, kth_hash,
           CAST(CASE WHEN n_sketch < 64 THEN n_sketch
                     ELSE 63 * 4294967296 // kth_hash END AS BIGINT) AS ndv_est,
           CAST(ndv_exact AS BIGINT) AS ndv_exact
         FROM sk JOIN ex USING (grp)""",
    // the advisor arithmetic restated per key; HUGEINT stands in for
    // the engine's DECIMAL(38) cross-multiplications
    "prof15_skew_advisor" ->
      """WITH d AS (
           SELECT 'user_id' AS key_name, COUNT(*) AS n_keys,
             CAST(SUM(c) AS BIGINT) AS n_rows,
             CAST(MAX(c) AS BIGINT) AS max_key_rows
           FROM (SELECT COUNT(*) AS c FROM events
                 GROUP BY CAST(user_id AS VARCHAR)) t1
           UNION ALL
           SELECT 'event_type', COUNT(*), CAST(SUM(c) AS BIGINT),
             CAST(MAX(c) AS BIGINT)
           FROM (SELECT COUNT(*) AS c FROM events GROUP BY event_type) t2
           UNION ALL
           SELECT 'user_day', COUNT(*), CAST(SUM(c) AS BIGINT),
             CAST(MAX(c) AS BIGINT)
           FROM (SELECT COUNT(*) AS c FROM events
                 GROUP BY CAST(user_id AS VARCHAR) || '|' ||
                          CAST(epoch_us(ts) // 86400000000 AS VARCHAR)) t3)
         SELECT key_name, n_keys, n_rows, max_key_rows,
           CAST(CAST(max_key_rows AS HUGEINT) * 1000000 // n_rows AS BIGINT)
             AS hh_share_ppm,
           CAST(CAST(max_key_rows AS HUGEINT) * n_keys * 1000 // n_rows AS BIGINT)
             AS skew_x_permille,
           CAST(greatest(1, (CAST(max_key_rows AS HUGEINT) * 32 + n_rows - 1)
             // n_rows) AS BIGINT) AS rec_salt
         FROM d""",
    "kmv2_sketch_setops" ->
      """WITH h AS (SELECT DISTINCT event_type,
             CAST(CAST('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 8)
               AS UBIGINT) AS BIGINT) AS hv
           FROM events WHERE event_type IN ('click', 'purchase')),
         ska AS (SELECT hv FROM (SELECT hv, ROW_NUMBER() OVER (ORDER BY hv) AS rn
                                 FROM h WHERE event_type = 'click') WHERE rn <= 64),
         skb AS (SELECT hv FROM (SELECT hv, ROW_NUMBER() OVER (ORDER BY hv) AS rn
                                 FROM h WHERE event_type = 'purchase') WHERE rn <= 64),
         hu AS (SELECT DISTINCT hv FROM h),
         sku AS (SELECT hv FROM (SELECT hv, ROW_NUMBER() OVER (ORDER BY hv) AS rn
                                 FROM hu) WHERE rn <= 64),
         su AS (SELECT COUNT(*) AS nu, MAX(hv) AS kth FROM sku),
         com AS (SELECT COUNT(*) AS n_common FROM sku
                 WHERE hv IN (SELECT hv FROM ska) AND hv IN (SELECT hv FROM skb)),
         ex AS (SELECT COUNT(DISTINCT user_id) AS exact_union,
                  (SELECT COUNT(*) FROM
                    (SELECT user_id FROM events WHERE event_type = 'click'
                     INTERSECT
                     SELECT user_id FROM events WHERE event_type = 'purchase'))
                    AS exact_intersection
                FROM events WHERE event_type IN ('click', 'purchase'))
         SELECT
           CAST(CASE WHEN nu < 64 THEN nu ELSE 63 * 4294967296 // kth END
             AS BIGINT) AS est_union,
           CAST(n_common AS BIGINT) AS n_common,
           CAST(n_common * (CASE WHEN nu < 64 THEN nu
                                 ELSE 63 * 4294967296 // kth END) // nu
             AS BIGINT) AS est_intersection,
           CAST(exact_union AS BIGINT) AS exact_union,
           CAST(exact_intersection AS BIGINT) AS exact_intersection
         FROM su CROSS JOIN com CROSS JOIN ex"""
  )
}
