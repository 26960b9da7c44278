package graft

import java.nio.file.Files
import java.sql.Timestamp

import org.apache.spark.sql.functions._

/** End-to-end slice in the spirit of the reference's docker
  * integration suites: gateway envelopes → per-event rows (S1) →
  * multi-table warehouse rows with column rules (W7) → per-table load
  * files (L5) → read back (S7) and assert table contents.
  */
class PipelineIntegrationSpec extends SparkSpec {

  test("ingest -> transform -> load -> query round trip") {
    val dirIgnored = "/root/testdata/sf0.001"

    // S1: envelopes explode into events with filled message ids
    val events = SparkEntry.queries("s1_batch_ingest")(spark, dirIgnored)
    assert(events.count() === 6)
    assert(events.filter(col("message_id").startsWith("gen_")).count() === 3)

    // W7: canonical table rows with per-type rules
    val rows = SparkEntry.queries("w7b_table_rows")(spark, dirIgnored)
    val tables = rows.select("table_name").distinct()
      .collect().map(_.getString(0)).toSet
    assert(tables.contains("tracks"))
    assert(tables.contains("order_completed")) // safe-named event table
    assert(tables.contains("identifies"))
    assert(tables.contains("users"))
    assert(tables.contains("pages"))

    // users row only for the identified user
    val users = rows.filter(col("table_name") === "users").collect()
    assert(users.map(_.getAs[String]("row_id")).toSeq === Seq("u3"))

    // context_ip rule: context.ip wins over request_ip when present
    val track1 = rows.filter(col("table_name") === "tracks" && col("row_id") === "m1")
      .collect()(0)
    assert(track1.getAs[String]("context_ip") === "1.2.3.4")
    val track2 = rows.filter(col("table_name") === "tracks" && col("row_id") === "m2")
      .collect()(0)
    assert(track2.getAs[String]("context_ip") === "8.8.8.8") // request_ip fallback

    // L5 + S7: write per-table load files, read them back
    val out = Files.createTempDirectory("pipeline_e2e").toString
    graft.sinks.Sinks.writeLoadFiles(rows, out, "parquet",
      Timestamp.valueOf("2024-06-01 00:00:00"))
    val back = graft.sources.Readers.parquetLoadFiles(spark, out)
    assert(back.count() === rows.count())
    assert(back.select("table_name").distinct().count() === tables.size)
    // the loaded tracks table still answers the canonical query
    val n = back.filter(col("table_name") === "tracks").count()
    assert(n === 2) // two track events in the fixture set
  }
}
