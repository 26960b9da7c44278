package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Scale-safe EXACT interpolated percentiles over a NON-NEGATIVE
  * integer domain (cents, day counts, event counts).
  *
  * Why this exists: Spark's interpreted `percentile()` aggregate
  * buffers a value→count map whose size is the input's distinct-value
  * count, and the global/no-group form materializes that whole map on
  * the ONE final reducer task. Over corpus-cardinality input (per-user
  * monetary totals, raw event values) that is a single-task memory
  * bomb at 100 TB even though the answer itself is one row — the
  * round-10 verdict's top scale finding against q37/q38/q26/a7.
  *
  * Design — a two-level histogram where every stage's state is bounded
  * by the integer VALUE RANGE, never the row count:
  *
  *   1. value histogram `GROUP BY v`: a fully distributed hash-agg;
  *      at most `range` rows, spread across the cluster (map-side
  *      partial aggregation collapses duplicates before the shuffle);
  *   2. coarse buckets `v DIV width`: at most `range/width` rows; the
  *      only per-key running-sum window runs HERE, so its partition
  *      holds ~range/width rows no matter how many input rows exist;
  *   3. each requested order statistic lands in exactly one coarse
  *      bucket; the fine running-sum window is partitioned per
  *      (key, bucket) and sees at most `width` histogram rows
  *      REGARDLESS of skew — inside an integer bucket the
  *      distinct-value count is capped by the bucket width itself,
  *      however many duplicates pile onto each value.
  *
  * Interpolation replicates Spark's `Percentile.getPercentile`
  * symmetric form `(⌈pos⌉−pos)·lower + (pos−⌊pos⌋)·upper` at
  * `pos = (n−1)·q` over the sorted values (PercentilesSpec pins
  * bit-equality against the interpreted aggregate; the naive
  * `lo + frac·(hi−lo)` drifts a ULP), computed on exact-in-double
  * integer values — so results keep agreeing bit-for-bit with the
  * `quantile_cont` oracle that has hash-matched `percentile()` since
  * round 1.
  *
  * Used by q37/q38/q26/a7/prof6; ScaleGuardSpec rule (f) keeps any
  * NEW interpreted exact-percentile off corpus-cardinality input.
  */
object Percentiles {

  /** Exact percentiles of `valueCol` (a non-negative integral column)
    * per `partKeys` group (empty = one global row).
    *
    * Returns one row per group: `partKeys…, <alias>: DOUBLE per
    * requested quantile, n_rows: BIGINT` (the group's input row
    * count). Groups are dense — every input group yields a row.
    *
    * `bucketWidth` trades the two bounded window sizes against each
    * other: coarse sees ~range/width rows per group, fine sees
    * ≤ width rows per (group, bucket). 4096 keeps both comfortably
    * sub-million for any realistic integer-cent range.
    */
  def exact(df: DataFrame, partKeys: Seq[String], valueCol: String,
            qs: Seq[(String, Double)], bucketWidth: Long = 4096L): DataFrame = {
    require(qs.nonEmpty && qs.forall { case (_, q) => q >= 0.0 && q <= 1.0 })
    // Global (no-key) percentiles run through a constant group key so
    // the bucket-locate joins below stay broadcast-HASH equi-joins
    // (a keyless range join would plan as a nested loop — harmless at
    // these sizes but rule (b)'s sweep rightly refuses the shape).
    // Only the FINAL assembly aggregate drops the synthetic key and
    // goes group-free, so callers' broadcast(cut) cross joins stay
    // 1-row-by-construction for rule (b).
    val (keyed, joinKeys) =
      if (partKeys.isEmpty) (df.withColumn("__gk", lit(0L)), Seq("__gk"))
      else (df, partKeys)
    // percentile() skips NULL inputs; without this filter a null value
    // would form its own histogram row (sorting first under the
    // coarse/fine window order), inflating n_rows and shifting every
    // target rank — the one divergence from the interpreted aggregate
    // this header promises bit-equality with (PercentilesSpec pins
    // the null case). NOTE: a group whose values are ALL null then
    // vanishes entirely, same as percentile()'s null result dropping
    // out of a dense-group join.
    val hist = keyed.filter(col(valueCol).isNotNull)
      .groupBy((joinKeys.map(col) :+ col(valueCol).as("__v")): _*)
      .agg(count(lit(1)).as("__c"))
    exactKeyed(hist, joinKeys, partKeys.map(col), qs, bucketWidth)
  }

  /** [[exact]] over a PRE-AGGREGATED value histogram: `histDf` is
    * (partKeys…, valueCol, countCol) — one row per (group, value) with
    * its occurrence count, null values already excluded. The row-grain
    * scan+groupBy is the only corpus-sized stage of the machinery, so
    * a caller that already HAS the histogram (or derives a second
    * percentile's values from the first's histogram, prof13's
    * median→MAD chain) skips the corpus entirely. Duplicate value rows
    * are merged here, so value transforms that collide (|dev|) need no
    * pre-grouping.
    */
  def exactWeighted(histDf: DataFrame, partKeys: Seq[String], valueCol: String,
                    countCol: String, qs: Seq[(String, Double)],
                    bucketWidth: Long = 4096L, merged: Boolean = false): DataFrame = {
    require(qs.nonEmpty && qs.forall { case (_, q) => q >= 0.0 && q <= 1.0 })
    val (keyed, joinKeys) =
      if (partKeys.isEmpty) (histDf.withColumn("__gk", lit(0L)), Seq("__gk"))
      else (histDf, partKeys)
    val filtered = keyed.filter(col(valueCol).isNotNull)
    // merged=true: the caller GUARANTEES one row per (group, value) —
    // e.g. the input is itself a groupBy on exactly these keys — and
    // the merging exchange is skipped
    val hist =
      if (merged) filtered.select((joinKeys.map(col) :+
        col(valueCol).as("__v") :+ col(countCol).cast("long").as("__c")): _*)
      else filtered
        .groupBy((joinKeys.map(col) :+ col(valueCol).as("__v")): _*)
        .agg(sum(col(countCol)).as("__c"))
    exactKeyed(hist, joinKeys, partKeys.map(col), qs, bucketWidth)
  }

  private def exactKeyed(hist0: DataFrame, partKeys: Seq[String],
                         outKeys: Seq[org.apache.spark.sql.Column],
                         qs: Seq[(String, Double)],
                         bucketWidth: Long): DataFrame = {
    val pk = partKeys.map(col)

    // 1. the distributed value histogram (≤ range rows, cluster-
    //    spread), built by the public entry points; bucketed here
    val hist = hist0.withColumn("__b", expr(s"__v DIV ${bucketWidth}L"))

    // 2. coarse bucket totals + running counts (≤ range/width rows/key)
    val wCum = Window.partitionBy(pk: _*).orderBy(col("__b"))
    val wAll = Window.partitionBy(pk: _*)
    val coarse = hist
      .groupBy((pk :+ col("__b")): _*).agg(sum(col("__c")).as("__bc"))
      .withColumn("__chi", sum(col("__bc")).over(wCum))
      .withColumn("__clo", col("__chi") - col("__bc"))
      .withColumn("__n", sum(col("__bc")).over(wAll))

    // 3. the 2·|qs| target order statistics per group: for quantile q,
    //    pos = (n−1)·q and the lower/upper indices ⌊pos⌋ / ⌈pos⌉
    val targetDefs = array(qs.flatMap { case (a, q) =>
      Seq(0, 1).map(side =>
        struct(lit(a).as("alias"), lit(q).as("q"), lit(side).as("side")))
    }: _*)
    val targets = coarse
      .select((pk :+ col("__n")): _*).distinct()
      .select((pk ++ Seq(col("__n"), explode(targetDefs).as("__t"))): _*)
      .withColumn("__pos", (col("__n") - 1).cast("double") * col("__t.q"))
      .withColumn("__idx",
        when(col("__t.side") === 0, floor(col("__pos")))
          .otherwise(ceil(col("__pos"))).cast("long"))
      .select((partKeys.map(k => col(k).as(s"__tk_$k")) ++ Seq(
        col("__t.alias").as("__alias"), col("__t.side").as("__side"),
        col("__pos"), col("__idx"))): _*)

    // locate each target's coarse bucket (both sides group-bounded;
    // the target side is 2·|qs| rows per group — broadcast). In the
    // global case the constant key folds away, so a row-set join
    // would plan as an unpinned nested loop — instead the 2·|qs|
    // targets collapse to ONE row (config-sized collect_list) and the
    // locate becomes a 1-row-by-construction broadcast cross join.
    val located =
      if (outKeys.isEmpty) {
        val one = targets.agg(collect_list(struct(col("__alias"),
          col("__side"), col("__pos"), col("__idx"))).as("__ts"))
        coarse.crossJoin(broadcast(one))
          .select((pk ++ Seq(col("__b"), col("__clo"), col("__chi"),
            col("__n"), explode(col("__ts")).as("__t"))): _*)
          .filter(col("__clo") <= col("__t.__idx") &&
            col("__t.__idx") < col("__chi"))
          .select((pk ++ Seq(col("__t.__alias").as("__alias"),
            col("__t.__side").as("__side"), col("__t.__pos").as("__pos"),
            col("__n"), col("__b"),
            (col("__t.__idx") - col("__clo")).as("__off"))): _*)
      } else coarse
        .join(broadcast(targets),
          partKeys.map(k => col(k) === col(s"__tk_$k")).foldLeft(
            col("__clo") <= col("__idx") && col("__idx") < col("__chi"))(_ && _))
        .select((pk ++ Seq(col("__alias"), col("__side"), col("__pos"),
          col("__n"), col("__b"), (col("__idx") - col("__clo")).as("__off"))): _*)

    // 4. fine stage: only the ≤ 2·|qs| needed buckets' histogram rows,
    //    running counts within (key, bucket) — ≤ width rows/partition
    val needed = located.select((pk ++ Seq(col("__b"), col("__off"),
      col("__alias"), col("__side"), col("__pos"), col("__n"))): _*)
    val wFine = Window.partitionBy((pk :+ col("__b")): _*).orderBy(col("__v"))
    val picked = hist
      .join(broadcast(needed.select((pk :+ col("__b")): _*).distinct()),
        partKeys :+ "__b")
      .withColumn("__fhi", sum(col("__c")).over(wFine))
      .withColumn("__flo", col("__fhi") - col("__c"))
      .join(broadcast(needed), partKeys :+ "__b")
      .filter(col("__flo") <= col("__off") && col("__off") < col("__fhi"))

    // 5. assemble: lower + (pos − ⌊pos⌋)·(upper − lower) per alias
    val aggCols = qs.flatMap { case (a, _) =>
      Seq(
        max(when(col("__alias") === a && col("__side") === 0, col("__v")))
          .as(s"__lo_$a"),
        max(when(col("__alias") === a && col("__side") === 1, col("__v")))
          .as(s"__hi_$a"),
        max(when(col("__alias") === a, col("__pos"))).as(s"__pos_$a"))
    } :+ max(col("__n")).as("n_rows")
    val wide = picked.groupBy(outKeys: _*).agg(aggCols.head, aggCols.tail: _*)
    wide.select((outKeys ++ qs.map { case (a, _) =>
      val (pos, lo, hi) =
        (col(s"__pos_$a"), col(s"__lo_$a").cast("double"),
          col(s"__hi_$a").cast("double"))
      // Spark's Percentile.getPercentile symmetric form, replicated
      // bit-for-bit (it is NOT lo + frac·(hi−lo) — that drifts a ULP):
      // integral pos short-circuits to lo, else
      // (⌈pos⌉−pos)·lo + (pos−⌊pos⌋)·hi.
      when(floor(pos) === ceil(pos), lo)
        .otherwise((ceil(pos) - pos) * lo + (pos - floor(pos)) * hi)
        .as(a)
    } :+ col("n_rows")): _*)
  }
}
