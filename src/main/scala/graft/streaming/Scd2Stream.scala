package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

/** STREAMING SCD TYPE-2 sink — w11's history-keeping merge applied
  * continuously: each micro-batch of attribute updates
  * (id, value, ts) closes the table's current version where the value
  * really changed and opens a new one, keeping every prior version
  * with its validity interval. The version state lives IN the table,
  * so exactly-once comes from the same
  * at-least-once-plus-idempotent-load contract as mergeIntoTracks: a
  * replayed batch finds value == current and no-ops (no spurious
  * version row), and the bucket-swap tail (shared helpers in
  * EventStream) makes each commit crash-atomic per bucket.
  *
  * Scale: the table is id-hash bucketed; a micro-batch reads and
  * rewrites ONLY its touched buckets (partition-pruned), and the only
  * per-key state materialized is that key's version rows.
  */
object Scd2Stream {

  /** One SCD2 merge step. Batch schema: (id string, value double,
    * ts long). Table schema: (id, value, valid_from, valid_to
    * nullable, is_current, id_bucket).
    */
  def scd2Merge(spark: SparkSession, path: String, batch: DataFrame): Unit = {
    import org.apache.hadoop.fs.Path
    val fs = new Path(path).getFileSystem(spark.sparkContext.hadoopConfiguration)
    EventStream.healCrashedSwaps(fs, path)
    // collapse replays/in-batch churn to the latest update per id;
    // value desc breaks same-id same-ts ties DETERMINISTICALLY so a
    // crash-replayed batch always merges the same winner (the
    // exactly-once contract is at-least-once + idempotent)
    val wB = Window.partitionBy(col("id"))
      .orderBy(col("ts").desc, col("value").desc)
    val b = batch
      // NULL values are rejected at the merge boundary: the merge
      // below uses value-nullness to recognize brand-new keys, so a
      // NULL-valued update would silently replace a current row
      // without closing its version (history loss)
      .withColumn("value",
        when(assert_true(col("value").isNotNull,
          lit("SCD2 merge requires non-null values: NULL cannot " +
            "distinguish a new key from a NULL-valued update")).isNull,
          col("value")))
      .withColumn("id_bucket", pmod(xxhash64(col("id")), lit(EventStream.trackBuckets.toLong)))
      .withColumn("rn", row_number().over(wB)).filter(col("rn") === 1).drop("rn")
    val touched = b.select("id_bucket").distinct()
      .collect().map(_.getLong(0)).sorted.toSeq
    val existing = EventStream.readTouchedBuckets(spark, fs, path, touched)
    val (history, current) = existing match {
      case Some(t) => (t.filter(!col("is_current")), t.filter(col("is_current")))
      case None =>
        val empty = spark.createDataFrame(
          spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
          org.apache.spark.sql.types.StructType.fromDDL(
            "id string, value double, valid_from bigint, valid_to bigint, " +
              "is_current boolean, id_bucket bigint"))
        (empty, empty)
    }
    val upd = b.select(col("id"), col("value").as("new_value"), col("ts"),
      col("id_bucket").as("b_bucket"))
    val merged = current.join(upd, Seq("id"), "full_outer")
      .select(col("id"), coalesce(col("id_bucket"), col("b_bucket")).as("id_bucket"),
        explode(
          // no update for this key -> current row passes through;
          // value unchanged (replay / no-op) -> ditto
          when(col("new_value").isNull ||
              (col("value").isNotNull && col("new_value") === col("value")),
            array(struct(col("value").as("value"), col("valid_from").as("valid_from"),
              lit(null).cast("long").as("valid_to"), lit(true).as("is_current"))))
            // brand-new key -> open its first version
            .when(col("value").isNull,
              array(struct(col("new_value").as("value"), col("ts").as("valid_from"),
                lit(null).cast("long").as("valid_to"), lit(true).as("is_current"))))
            // real change -> close current at the update ts, open new
            .otherwise(array(
              struct(col("value").as("value"), col("valid_from").as("valid_from"),
                col("ts").as("valid_to"), lit(false).as("is_current")),
              struct(col("new_value").as("value"), col("ts").as("valid_from"),
                lit(null).cast("long").as("valid_to"), lit(true).as("is_current"))))
        ).as("r"))
      .select(col("id"), col("r.value").as("value"), col("r.valid_from").as("valid_from"),
        col("r.valid_to").as("valid_to"), col("r.is_current").as("is_current"),
        col("id_bucket"))
    val out = history.select(merged.columns.map(col): _*).unionByName(merged)
    val staging = path + "__staging"
    fs.delete(new Path(staging), true)
    out.write.partitionBy("id_bucket").parquet(staging)
    EventStream.swapBuckets(fs, path, staging, touched)
  }

  /** updates stream -> continuously maintained SCD2 table. */
  def startScd2Pipeline(updates: DataFrame, tablePath: String,
                        checkpoint: String): StreamingQuery =
    updates.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], _: Long) =>
        scd2Merge(batch.sparkSession, tablePath, batch.toDF())
      }
      .start()
}
