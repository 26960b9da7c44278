package graft

import java.nio.file.Files
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch micro-benchmark for the object-sink write path (round-21
  * measurement only — times each phase of d8's pipeline and the two
  * batchObjectSink forms in isolation, N reps each).
  */
object ProbeSink {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.codegen.cache.maxEntries", "10000")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1000000).selectExpr("sum(id)").collect()

    def t[T](label: String, reps: Int = 3)(f: => T): Unit = {
      val times = (1 to reps).map { _ =>
        val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
      }
      println(f"PROBE $label min=${times.min}%.3f all=[${times.map(x => f"$x%.3f").mkString(",")}]")
    }

    val cutoffDate = "2024-01-15"
    val ev = Tables.events(spark, sfDir)
      .select(col("event_id"), col("user_id"), col("event_type"),
        col("ts").cast("string").as("ts_str"),
        (col("user_id") % 20).cast("string").as("source_id"),
        col("event_type").as("destination_id"),
        date_trunc("week", col("ts")).cast("date").cast("string").as("event_week"))
    println("events rows = " + ev.count())

    t("live parquet write (repartition week + partitionBy)") {
      val live = Files.createTempDirectory("probe_live").toString + "/t"
      ev.repartition(col("event_week"))
        .write.mode("overwrite").partitionBy("event_week").parquet(live)
    }
    val liveDir = Files.createTempDirectory("probe_live_fixed").toString + "/t"
    ev.repartition(col("event_week"))
      .write.mode("overwrite").partitionBy("event_week").parquet(liveDir)
    val archSrc = spark.read.parquet(liveDir)
      .filter(col("event_week") < cutoffDate).drop("event_week")
    println("archive rows = " + archSrc.count())

    t("gz json write, NO repartition (old batchObjectSink)") {
      val d = Files.createTempDirectory("probe_a").toString
      archSrc.write.mode("append").partitionBy("source_id", "destination_id")
        .option("compression", "gzip").json(d)
    }
    t("gz json write, repartition(pairs) (new batchObjectSink)") {
      val d = Files.createTempDirectory("probe_b").toString
      archSrc.repartition(col("source_id"), col("destination_id"))
        .write.mode("append").partitionBy("source_id", "destination_id")
        .option("compression", "gzip").json(d)
    }
    t("gz json write, NO partitionBy (1 dir, 2 files)") {
      val d = Files.createTempDirectory("probe_d").toString
      archSrc.write.mode("append").option("compression", "gzip").json(d)
    }
    t("plain json write (no gz), partitionBy") {
      val d = Files.createTempDirectory("probe_e").toString
      archSrc.write.mode("append").partitionBy("source_id", "destination_id").json(d)
    }
    t("parquet write, partitionBy") {
      val d = Files.createTempDirectory("probe_f").toString
      archSrc.write.mode("append").partitionBy("source_id", "destination_id").parquet(d)
    }
    t("gz json write partitionBy, commit algo v2") {
      spark.sparkContext.hadoopConfiguration.setInt("mapreduce.fileoutputcommitter.algorithm.version", 2)
      val d = Files.createTempDirectory("probe_g").toString
      archSrc.write.mode("append").partitionBy("source_id", "destination_id")
        .option("compression", "gzip").json(d)
      spark.sparkContext.hadoopConfiguration.setInt("mapreduce.fileoutputcommitter.algorithm.version", 1)
    }
    t("gz json write partitionBy, concurrent writers=128") {
      spark.conf.set("spark.sql.maxConcurrentOutputFileWriters", "128")
      val d = Files.createTempDirectory("probe_h").toString
      archSrc.write.mode("append").partitionBy("source_id", "destination_id")
        .option("compression", "gzip").json(d)
      spark.conf.set("spark.sql.maxConcurrentOutputFileWriters", "0")
    }
    t("gz json write repartition(pairs)+v2") {
      spark.sparkContext.hadoopConfiguration.setInt("mapreduce.fileoutputcommitter.algorithm.version", 2)
      val d = Files.createTempDirectory("probe_i").toString
      archSrc.repartition(col("source_id"), col("destination_id"))
        .write.mode("append").partitionBy("source_id", "destination_id")
        .option("compression", "gzip").json(d)
      spark.sparkContext.hadoopConfiguration.setInt("mapreduce.fileoutputcommitter.algorithm.version", 1)
    }
    t("gz json 1-dir baseline rep2", 2) {
      val d = Files.createTempDirectory("probe_j").toString
      archSrc.write.mode("append").option("compression", "gzip").json(d)
    }
    // the read-back side
    val dBack = Files.createTempDirectory("probe_back").toString
    archSrc.repartition(col("source_id"), col("destination_id"))
      .write.mode("append").partitionBy("source_id", "destination_id")
      .option("compression", "gzip").json(dBack)
    t("staging scan read-back + agg") {
      graft.sources.Readers.stagingScan(spark, dBack,
          Some(org.apache.spark.sql.types.StructType.fromDDL(
            "event_id BIGINT, user_id BIGINT, event_type STRING, ts_str STRING")))
        .groupBy(col("source_id")).agg(count(lit(1))).collect()
    }
    spark.stop()
  }
}
