package graft.operators

import graft.{Q, Tables}
import org.apache.spark.sql.functions._

/** Table statistics profiler — the ANALYZE-TABLE step a warehouse
  * loader runs after L5/L6 loads so the downstream optimizer (and the
  * pipeline's own health checks) see per-column null counts, NDVs and
  * value ranges. The reference tracks only row counts per load
  * (upload stats); per-column profiling is the natural extension once
  * the store is columnar.
  *
  * One pass over the table: all columns' aggregates run in a single
  * scan (Catalyst plans multi-DISTINCT via one Expand), then a
  * constant-width `stack` unpivots the single aggregate row into the
  * (column, stats) ledger. At 100 TB the exact COUNT(DISTINCT) is
  * swapped for approx_count_distinct / the a2c mergeable sketch — the
  * plan shape (one scan, no per-column passes) is the part that
  * matters.
  */
object Profile {

  val defs: Map[String, Q] = Map(
    "prof1_table_stats" -> ((s, dir) => {
      val li = Tables.lineitem(s, dir)
      // (name, numeric?) — quantity is whole-valued double, profiled as int
      val cols = Seq("l_orderkey" -> true, "l_partkey" -> true,
        "l_quantity" -> true, "l_returnflag" -> false)
      val aggs = cols.zipWithIndex.flatMap { case ((c, num), i) =>
        val minMax =
          if (num) Seq(min(col(c)).cast("long").cast("string").as(s"mn$i"),
            max(col(c)).cast("long").cast("string").as(s"mx$i"))
          else Seq(min(col(c)).as(s"mn$i"), max(col(c)).as(s"mx$i"))
        Seq(sum(when(col(c).isNull, 1L).otherwise(0L)).as(s"n$i"),
          countDistinct(col(c)).as(s"d$i")) ++ minMax
      }
      val stacked = cols.zipWithIndex.map { case ((c, _), i) =>
        s"'$c', n$i, d$i, mn$i, mx$i"
      }.mkString(", ")
      li.agg(aggs.head, aggs.tail: _*)
        .selectExpr(s"stack(${cols.size}, $stacked) AS " +
          "(column_name, n_nulls, ndv, min_s, max_s)")
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
    })
  )

  val oracles: Map[String, String] = Map(
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
    "prof2_key_skew" ->
      """WITH c AS (SELECT user_id, COUNT(*) AS c FROM events GROUP BY user_id),
         t AS (SELECT CAST(COUNT(*) AS BIGINT) AS total FROM events)
         SELECT CAST(ROW_NUMBER() OVER (ORDER BY c DESC, user_id) AS BIGINT) AS rank,
           user_id, CAST(c AS BIGINT) AS n_rows,
           CAST(c AS DOUBLE) / total AS share
         FROM c CROSS JOIN t
         ORDER BY c DESC, user_id LIMIT 10"""
  )
}
