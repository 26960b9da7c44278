package graft.operators

import java.nio.file.Files
import java.sql.Timestamp

import graft.{Q, Tables}
import graft.sinks.Sinks
import graft.sources.Readers
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, StructType}

/** Load-lifecycle roundtrip operators: the correctness gate drives the
  * actual write→read encoder paths (L5 + S6/S7), then aggregates the
  * read-back rows and checks them against the DuckDB oracle computed
  * on the ORIGINAL table — any loss/corruption in the encoder,
  * compression, partition split, or reader breaks the hash.
  */
object Lifecycle {

  private val dec = DecimalType(18, 2)
  private val loadTs = Timestamp.valueOf("2024-06-01 00:00:00")

  val defs: Map[String, Q] = Map(

    // L5+S7: per-table CSV.gz load files with load-time columns,
    // written partitioned by table and read back through the CSV
    // reader.
    "l5_load_file_roundtrip" -> ((s, dir) => {
      val tmp = Files.createTempDirectory("graft_l5").toString
      val ev = Tables.events(s, dir).select(
        col("event_type").as("table_name"),
        col("event_id"), col("user_id"), col("value"))
      Sinks.writeLoadFiles(ev, tmp, "csv", loadTs)
      Readers.csvLoadFiles(s, tmp,
          StructType.fromDDL(
            "event_id BIGINT, user_id BIGINT, value DOUBLE, uuid_ts TIMESTAMP, loaded_at TIMESTAMP"))
        .groupBy(col("table_name"))
        .agg(count(lit(1)).as("n"),
          sum(col("value").cast(dec)).cast("double").as("sum_value"),
          min(col("event_id")).as("min_id"), max(col("event_id")).as("max_id"))
    }),

    // S6: gzip JSON-lines staging file scan — events serialized to
    // the staging shape, written .json.gz, scanned back.
    "s6_staging_scan" -> ((s, dir) => {
      val tmp = Files.createTempDirectory("graft_s6").toString
      Tables.events(s, dir)
        .select(col("event_id"), col("user_id"), col("event_type"), col("value"))
        .write.mode("overwrite").option("compression", "gzip").json(tmp)
      Readers.stagingScan(s, tmp,
          Some(StructType.fromDDL(
            "event_id BIGINT, user_id BIGINT, event_type STRING, value DOUBLE")))
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n"),
          sum(col("value").cast(dec)).cast("double").as("sum_value"))
    })
  )

  val oracles: Map[String, String] = Map(
    "l5_load_file_roundtrip" ->
      """SELECT event_type AS table_name, COUNT(*) AS n,
           CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value,
           MIN(event_id) AS min_id, MAX(event_id) AS max_id
         FROM events GROUP BY 1""",
    "s6_staging_scan" ->
      """SELECT event_type, COUNT(*) AS n,
           CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
         FROM events GROUP BY 1"""
  )
}
