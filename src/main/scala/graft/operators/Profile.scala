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
    }
  )
}
