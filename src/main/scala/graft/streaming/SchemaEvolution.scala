package graft.streaming

import graft.functions.JsonFlatten
import graft.sinks.Sinks
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

/** Streaming schema evolution end-to-end — SURVEY §7.3's "single
  * trickiest semantic": a stream whose payload schema grows mid-flight
  * drives, per micro-batch, the L3 schema consolidation
  * (warehouse/schema/schema.go:294-342 first-seen-wins, text>string),
  * the L11 registry diff (adds + string→text upgrades), and the L4
  * coercion matrix with a rudder_discards side output
  * (warehouse/slave/worker.go:637-696) — then lands typed rows in a
  * parquet table whose schema grows via mergeSchema.
  *
  * The registry is a tiny parquet table updated crash-atomically
  * (staging + rename swap); per-batch schema decisions collect only
  * schema-sized metadata on the driver, exactly like the reference's
  * in-memory ColumnMap — event data never leaves the executors.
  *
  * Crash contract (the upload state machine's resumability,
  * warehouse/router/upload.go:285-493, recast for foreachBatch):
  * foreachBatch is at-least-once, so every write here must be
  * idempotent under batch replay. Typed rows and discards land in a
  * per-batch partition directory (`batch_id=N`) written with
  * overwrite mode — a replay of batch N rewrites exactly that
  * directory and nothing else, so a crash between the data append and
  * the checkpoint commit cannot duplicate rows. The registry swap
  * runs BEFORE the data write on purpose: a crash in between leaves a
  * registered column with no data yet (benign — the replay lands it),
  * whereas the reverse order could land typed data whose column the
  * registry then re-infers differently from a later batch, making the
  * table's parquet types diverge from the registry. The registry
  * update itself is idempotent too: a replay recomputes the same map
  * and skips the swap.
  */
object SchemaEvolution {

  /** Current registry (column → warehouse type), empty if absent.
    * Self-heals a crashed registry swap first — a silently-empty
    * registry would re-register every column from this batch alone
    * and could flip a column's established type.
    */
  def readRegistry(spark: SparkSession, registryDir: String): Map[String, String] = {
    Sinks.recoverSwap(spark, registryDir)
    val fs = new org.apache.hadoop.fs.Path(registryDir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(new org.apache.hadoop.fs.Path(registryDir))) Map.empty
    else spark.read.parquet(registryDir)
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
  }

  /** L3 within one batch: first-seen type wins (by row id order),
    * except text dominates string. Returns (column → type).
    */
  private def consolidate(kv: DataFrame): Seq[(String, String)] = {
    val w = Window.partitionBy(col("key")).orderBy(col("id").asc)
    val first = kv.withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
      .select(col("key"), col("typ"))
    val sawText = kv.filter(col("typ") === "text").select(col("key")).distinct()
      .withColumn("saw_text", lit(true))
    first.join(sawText, Seq("key"), "left")
      .select(col("key"),
        when(col("typ") === "string" && col("saw_text"), lit("text"))
          .otherwise(col("typ")).as("typ"))
      .collect().map(r => r.getString(0) -> r.getString(1)).toSeq // schema-sized
  }

  /** L4 coercion of one flattened value into the registry type of its
    * column; null = incompatible (→ discard). Subset of the l4b matrix
    * that applies to JSON-sourced values: same-type loads, int←float
    * truncation, float←int widening, string/text absorb any scalar.
    */
  private def coerce(whType: String, v: Column, inferred: Column): Column = whType match {
    case "int" =>
      when(inferred === "int", v.cast("long"))
        .when(inferred === "float", v.cast("double").cast("long"))
    case "float" => when(inferred.isin("int", "float"), v.cast("double"))
    case "boolean" => when(inferred === "boolean", v.cast("boolean"))
    case "datetime" =>
      // Spark's timestamp cast accepts the full shape family the
      // inference regex classifies as datetime (T or space separator,
      // optional seconds/fraction/zone) — an explicit format list
      // here silently discarded valid ISO-8601 values the regex had
      // accepted (e.g. '2024-03-05T10:11:12' with no zone)
      when(inferred === "datetime", v.cast("timestamp"))
    case _ => v // string/text/json absorb every scalar's string form
  }

  /** Read back an evolved table (typed rows or discards): merge the
    * per-batch schemas and hide the `batch_id` bookkeeping directories.
    * recursiveFileLookup (rather than partition discovery) makes the
    * read layout-agnostic: a table whose history began before the
    * per-batch directories existed mixes root-level files with
    * `batch_id=N/` subdirectories at different depths, which partition
    * discovery rejects as conflicting but a recursive listing reads
    * fine — the batch directories are write-side idempotency
    * bookkeeping, not a partition column.
    */
  def readTable(spark: SparkSession, dir: String): DataFrame =
    spark.read.option("mergeSchema", "true")
      .option("recursiveFileLookup", "true").parquet(dir)

  /** One micro-batch of (id, js): consolidate → diff → evolve registry
    * → coerce → land typed rows + discards idempotently under
    * `batch_id=<batchId>`. Returns the actions the batch executed
    * (adds/upgrades) for observability.
    */
  def processBatch(spark: SparkSession, batch: DataFrame, tableDir: String,
                   registryDir: String, discardsDir: String,
                   batchId: Long): Seq[String] = {
    JsonFlatten.register(spark)
    val flat = batch.select(col("id"),
      callUDF("flatten_json", col("js")).as("vals"),
      callUDF("flatten_json_types_redshift", col("js")).as("typs"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      val kv = flat.select(col("id"), explode(col("typs")).as(Seq("key", "typ")))
      val batchSchema = consolidate(kv)
      val registry = readRegistry(spark, registryDir)
      // L11 diff: new columns + string→text upgrades
      val adds = batchSchema.filterNot { case (k, _) => registry.contains(k) }
      val upgrades = batchSchema.collect {
        case (k, "text") if registry.get(k).contains("string") => k -> "text"
      }
      val next = registry ++ adds ++ upgrades
      if (next != registry) {
        val sess = spark
        import sess.implicits._
        val reg = next.toSeq.sortBy(_._1).toDF("column_name", "wh_type")
        Sinks.atomicSwap(spark, registryDir)(staging => reg.write.parquet(staging))
      }
      val cols = next.toSeq.sortBy(_._1)
      if (cols.isEmpty) return Seq.empty // empty batch, nothing to land
      // typed projection: one narrow map, schema decided driver-side
      val typed = flat.select(col("id") +: cols.map { case (c, t) =>
        coerce(t, col("vals")(c), col("typs")(c)).as(c)
      }: _*)
      // overwrite of the batch's own partition dir = idempotent append
      typed.write.mode("overwrite").parquet(s"$tableDir/batch_id=$batchId")
      // rudder_discards: value present but incompatible with the
      // registry type (utils.go:176-184 shape). Same scan, filtered.
      val whTypeOf: Column = cols.map { case (c, t) =>
        when(col("key") === c, lit(t))
      }.reduce((a, b) => coalesce(a, b))
      val discards = flat
        .select(col("id"), col("typs"), explode(col("vals")).as(Seq("key", "value")))
        .withColumn("typ", element_at(col("typs"), col("key")))
        .withColumn("wh_type", whTypeOf)
        .withColumn("ok", coalesce(
          cols.map { case (c, t) =>
            when(col("key") === c, coerce(t, col("value"), col("typ")).isNotNull)
          }: _*))
        .filter(!col("ok"))
        .select(col("id").as("row_id"), col("key").as("column_name"),
          col("value"),
          concat(lit("incompatible schema conversion from "), col("wh_type"),
            lit(" to "), col("typ")).as("reason"))
      discards.write.mode("overwrite").parquet(s"$discardsDir/batch_id=$batchId")
      (adds.map { case (k, t) => s"add:$k:$t" } ++
        upgrades.map { case (k, _) => s"upgrade:$k:text" }).sorted
    } finally flat.unpersist()
  }

  /** The streaming entry: (id, js) stream → evolving typed table. */
  def start(events: DataFrame, tableDir: String, registryDir: String,
            discardsDir: String, checkpointDir: String): StreamingQuery =
    events.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        processBatch(batch.sparkSession, batch, tableDir, registryDir, discardsDir, batchId)
        ()
      }
      .start()
}
