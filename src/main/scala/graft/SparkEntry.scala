package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` aggregates every implemented operator from SURVEY.md §2;
  * `oracleSql` carries the DuckDB-equivalent SQL for the driver's
  * differential correctness check (omitted only for ops DuckDB can't
  * express — those get a rows-only check).
  */
object SparkEntry {

  private def modules: Seq[(Map[String, Q], Map[String, String])] = Seq(
    (operators.Relational.defs, operators.Relational.oracles),
    (operators.Warehouse.defs, operators.Warehouse.oracles),
    (operators.Identity.defs, operators.Identity.oracles),
    (operators.WarehouseNested.defs, operators.WarehouseNested.oracles),
    (operators.WarehouseRows.defs, operators.WarehouseRows.oracles),
    (operators.Transforms.defs, operators.Transforms.oracles),
    (operators.Coercion.defs, operators.Coercion.oracles),
    (operators.Lifecycle.defs, operators.Lifecycle.oracles),
    (operators.Ingest.defs, operators.Ingest.oracles),
    (operators.Router.defs, operators.Router.oracles),
    (operators.Multimodal.defs, operators.Multimodal.oracles),
    (operators.Dedup.defs, operators.Dedup.oracles),
    (operators.Similarity.defs, operators.Similarity.oracles),
    (operators.TextAnalysis.defs, operators.TextAnalysis.oracles),
    (operators.Sessions.defs, operators.Sessions.oracles),
    (operators.Search.defs, operators.Search.oracles),
    (operators.Linkage.defs, operators.Linkage.oracles),
    (operators.Layout.defs, operators.Layout.oracles),
    (operators.Pipeline.defs, operators.Pipeline.oracles),
    (operators.Profile.defs, operators.Profile.oracles),
    (operators.Errors.defs, operators.Errors.oracles),
    (operators.Adaptive.defs, operators.Adaptive.oracles),
    (operators.Activation.defs, operators.Activation.oracles),
    (operators.Scheduling.defs, operators.Scheduling.oracles)
  )

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    queries("q01_pricing_agg")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    modules.map(_._1).reduce(_ ++ _)

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    modules.map(_._2).reduce(_ ++ _)
}
