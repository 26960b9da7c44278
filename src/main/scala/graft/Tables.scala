package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver's deterministic testdata (TESTDATA.md).
  *
  * All operator queries take `(spark, sfDir)` and read tables through
  * here, so the scan is a plain columnar parquet read that Catalyst can
  * prune/push into. At 100 TB the same call points at a partitioned
  * table; nothing else changes.
  */
object Tables {
  val all: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  /** Memoized parquet relations: `spark.read.parquet` builds a fresh
    * file index (driver listing) and re-infers the schema (footer
    * read) on EVERY call, and a bench pass performs ~2,000 loads —
    * pure fixed driver overhead repeated per query. One DataFrame per
    * (application, dir, table, content watermark) reuses the resolved
    * relation; the watermark key is the same staleness contract the
    * planner-stat cache and every maintained index use, so a table
    * mutated mid-session re-lists and re-resolves under its new
    * version (and the superseded entry is dropped). This memoizes the
    * LOGICAL relation only — no rows are cached; every execution still
    * scans the parquet.
    */
  private val dfCache = new java.util.concurrent.ConcurrentHashMap[String, DataFrame]()

  def load(spark: SparkSession, sfDir: String, name: String): DataFrame = {
    // every query path enters through a table load, so this is the
    // one choke point that guarantees the native vector kernels
    // (dot_native/sqdist_native) are registered before any expression
    // referencing them resolves — idempotent map-put, same
    // session-local mechanism as hilbert_index (production installs
    // them via GraftExtensions instead)
    graft.functions.VectorExprs.register(spark)
    val prefix = Seq(spark.sparkContext.applicationId, sfDir, name, "#df").mkString("|")
    val key = prefix + "|" + snapshotVersion(spark, sfDir, name)
    if (!dfCache.containsKey(key)) {
      val it = dfCache.keySet.iterator()
      while (it.hasNext) {
        val k = it.next()
        if (k.startsWith(prefix + "|") && k != key) it.remove()
      }
    }
    dfCache.computeIfAbsent(key, _ => spark.read.parquet(s"$sfDir/$name.parquet"))
  }

  /** The canonical loader for a table name — `events` (and any future
    * table with a normalizing loader) routes through it, everything
    * else is a plain parquet read. Use this instead of `load` whenever
    * the table name is data, so normalization can't be bypassed.
    */
  def loader(name: String): (SparkSession, String) => DataFrame = name match {
    case "events" => events
    case other    => load(_, _, other)
  }

  def lineitem(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "lineitem")
  def orders(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "orders")
  def customer(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "customer")
  def supplier(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "supplier")
  def part(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "part")
  def nation(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "nation")
  def region(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "region")
  /** `events.ts` has shipped in two physical encodings across testdata
    * regenerations: parquet TIMESTAMP(NANOS) (readable by Spark 4 only
    * as a long under `nanosAsLong`) and plain timestamp[us]. Branch on
    * the loaded dtype so either works and both normalize to the session
    * TimestampType at microsecond precision — the same value DuckDB
    * reads — so orderings/bucketings agree bit-for-bit with the oracle.
    * (All entry points pin `spark.sql.session.timeZone=UTC`, so the
    * NTZ→LTZ cast is identity on the wall-clock micros.)
    */
  def events(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.functions.{col, expr, timestamp_micros}
    import org.apache.spark.sql.types.{LongType, TimestampType}
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = load(spark, dir, "events")
    raw.schema("ts").dataType match {
      case LongType => // TIMESTAMP(NANOS) read as nanos-since-epoch long
        raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case TimestampType => raw
      case _ => // TIMESTAMP_NTZ (timestamp[us] with isAdjustedToUTC=false)
        raw.withColumn("ts", col("ts").cast(TimestampType))
    }
  }
  def documents(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "documents")
  def embeddings(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "embeddings")

  /** Memoized planner statistic: max(idCol) of a table, used to derive
    * size-adaptive bucket counts (l1's and ta6's two-level prefix
    * sums). One scalar parquet aggregate per (application, dir,
    * table) — NOT per query construction: ScaleGuardSpec alone builds
    * every query several times, and an eager per-construction job
    * would bill a corpus scan each time. Null-safe: an empty table
    * yields 0 (callers clamp bucket size to >= 1).
    */
  private val statCache = new java.util.concurrent.ConcurrentHashMap[String, java.lang.Long]()

  /** Memo-with-eviction: one live entry per (app, dir, table, stat)
    * — a superseded snapshot's entry is dropped when the stat is first
    * requested under a newer content watermark, so a long session over
    * a frequently-mutating corpus holds O(stats), not O(stats ×
    * versions), driver memory (r16 ADVICE).
    */
  private def memoStat(prefix: String, ver: String)(compute: => Long): Long = {
    val key = prefix + "|" + ver
    if (!statCache.containsKey(key)) {
      val it = statCache.keySet.iterator()
      while (it.hasNext) {
        val k = it.next()
        if (k.startsWith(prefix + "|") && k != key) it.remove()
      }
    }
    statCache.computeIfAbsent(key, _ => java.lang.Long.valueOf(compute))
  }

  /** Memoized planner statistic: row count of a table. The sampling
    * rate ll4b's trainer needs must come from the COUNT, not the max
    * id — id-keyed stepping silently undersamples any table whose id
    * space is sparse (sharded / offset ids), which is exactly the
    * 100 TB layout. Same cache discipline as [[maxIdStat]].
    */
  def countStat(spark: SparkSession, dir: String, table: String): Long = {
    val prefix = Seq(spark.sparkContext.applicationId, dir, table, "#count").mkString("|")
    memoStat(prefix, snapshotVersion(spark, dir, table))(
      loader(table)(spark, dir).count())
  }

  /** Memoized planner statistic: sum of a row expression over a table
    * (e.g. ts3's corpus token count). Same cache discipline as
    * [[maxIdStat]]; null (empty table) yields 0.
    */
  def sumStat(spark: SparkSession, dir: String, table: String, exprSql: String): Long = {
    val prefix = Seq(spark.sparkContext.applicationId, dir, table, "#sum", exprSql).mkString("|")
    memoStat(prefix, snapshotVersion(spark, dir, table)) {
      val row = loader(table)(spark, dir)
        .agg(org.apache.spark.sql.functions.sum(
          org.apache.spark.sql.functions.expr(exprSql).cast("long"))).first()
      if (row.isNullAt(0)) 0L else row.getLong(0)
    }
  }

  def maxIdStat(spark: SparkSession, dir: String, table: String, idCol: String): Long = {
    val prefix = Seq(spark.sparkContext.applicationId, dir, table, idCol).mkString("|")
    memoStat(prefix, snapshotVersion(spark, dir, table)) {
      // route through the canonical loader so timestamp stats (e.g.
      // dbg1's "now") see normalized types whatever the file encoding
      val row = loader(table)(spark, dir)
        .agg(org.apache.spark.sql.functions.max(
          org.apache.spark.sql.functions.col(idCol).cast("long"))).first()
      if (row.isNullAt(0)) 0L else row.getLong(0)
    }
  }

  /** CONTENT WATERMARK of a table at `dir`: an MD5 over the sorted
    * (path, length, mtime) listing of `$dir/$table.parquet`. Pure
    * driver-side filesystem METADATA — no data scan — so it is cheap
    * enough to evaluate on every memoized-artifact lookup, and it
    * changes whenever the table gains, loses, or rewrites a file
    * (append, compaction, in-place re-crawl — exactly the mutations
    * cd1/jd2/ll14 model). Every session-memoized artifact (the
    * maintained index tables, the planner statistics) keys on it, so
    * a corpus updated mid-session can never serve a stale index: the
    * next lookup sees a new version and rebuilds (or, for the
    * per-doc index tables, splices the delta — Dedup.refreshIncrementally).
    * On a real deployment this is the table format's snapshot id
    * (Delta/Iceberg version); the file-listing fingerprint is the
    * plain-parquet equivalent.
    */
  def snapshotVersion(spark: SparkSession, dir: String, table: String): String = {
    val p = new org.apache.hadoop.fs.Path(s"$dir/$table.parquet")
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val md = java.security.MessageDigest.getInstance("MD5")
    if (fs.exists(p)) {
      val it = fs.listFiles(p, true)
      val entries = scala.collection.mutable.ArrayBuffer.empty[String]
      while (it.hasNext) {
        val st = it.next()
        entries += s"${st.getPath.toUri.getPath}|${st.getLen}|${st.getModificationTime}"
      }
      entries.sorted.foreach(e => md.update(e.getBytes("UTF-8")))
    }
    md.digest().map("%02x".format(_)).mkString
  }
}
