package graft.sinks

import java.nio.file.{Files, Paths}
import java.sql.Timestamp

import graft.SparkSpec
import graft.sources.Readers
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

class SinksSpec extends SparkSpec {

  private def tmp(prefix: String) = Files.createTempDirectory(prefix).toString

  test("observe(): load-time counters come from the write pass itself, no second scan") {
    // The reference's gateway/warehouse stats (requests in, rows
    // written, bytes) are side outputs of the SAME pass that moves the
    // data. Spark's Observation metrics are that facility: attach
    // named aggregates to the write plan, read them after the action —
    // zero extra jobs at any scale (a separate count() would re-scan
    // 100 TB to report on it).
    val sess = spark
    import sess.implicits._
    val obs = new org.apache.spark.sql.Observation("load_stats")
    val df = Seq((1L, "click", 1.5), (2L, "error", 0.0), (3L, "view", 2.5))
      .toDF("event_id", "event_type", "value")
      .observe(obs,
        count(lit(1)).as("n_rows"),
        sum(when(col("event_type") === "error", 1L).otherwise(0L)).as("n_errors"),
        sum(col("value")).as("sum_value"))
    val dir = tmp("observe") + "/t"
    df.write.parquet(dir) // the ONLY action — metrics ride it
    val m = obs.get
    assert(m("n_rows") === 3L)
    assert(m("n_errors") === 1L)
    assert(m("sum_value") === 4.0)
    assert(spark.read.parquet(dir).count() === 3L) // data landed too
  }

  test("L5 encoders roundtrip across csv/json/parquet") {
    val sess = spark
    import sess.implicits._
    val df = Seq(("tracks", 1L, 1.5), ("tracks", 2L, 2.5), ("pages", 3L, 3.5))
      .toDF("table_name", "id", "value")
    val ts = Timestamp.valueOf("2024-06-01 00:00:00")
    for (fmt <- Seq("csv", "json", "parquet")) {
      val dir = tmp(s"l5_$fmt")
      Sinks.writeLoadFiles(df, dir, fmt, ts)
      val back = fmt match {
        case "csv" => Readers.csvLoadFiles(spark, dir,
          StructType.fromDDL("id BIGINT, value DOUBLE, uuid_ts TIMESTAMP, loaded_at TIMESTAMP"))
        case "json" => Readers.jsonLoadFiles(spark, dir,
          StructType.fromDDL("id BIGINT, value DOUBLE, uuid_ts TIMESTAMP, loaded_at TIMESTAMP"))
        case _ => Readers.parquetLoadFiles(spark, dir)
      }
      assert(back.count() === 3, fmt)
      assert(back.select("table_name").distinct().count() === 2, fmt)
      assert(back.select("uuid_ts").distinct().collect().map(_.getTimestamp(0)).toSeq === Seq(ts), fmt)
      assert(back.agg(sum("value")).first().getDouble(0) === 7.5, fmt)
    }
  }

  test("S6 staging scan reads gzip json-lines") {
    val sess = spark
    import sess.implicits._
    val dir = tmp("s6")
    Seq((1L, "a"), (2L, "b")).toDF("id", "v")
      .write.mode("overwrite").option("compression", "gzip").json(dir)
    assert(Files.list(Paths.get(dir)).toArray.map(_.toString).exists(_.endsWith(".json.gz")))
    val back = Readers.stagingScan(spark, dir, Some(StructType.fromDDL("id BIGINT, v STRING")))
    assert(back.as[(Long, String)].collect().toSet === Set((1L, "a"), (2L, "b")))
  }

  test("D4 batch object sink partitions by (source, destination) as json.gz") {
    val sess = spark
    import sess.implicits._
    val dir = tmp("d4")
    Seq(("s1", "d1", "p1"), ("s1", "d2", "p2"), ("s2", "d1", "p3"))
      .toDF("source_id", "destination_id", "payload")
    .transform { df => Sinks.batchObjectSink(df, dir); df }
    assert(Files.exists(Paths.get(s"$dir/source_id=s1/destination_id=d1")))
    assert(Files.exists(Paths.get(s"$dir/source_id=s2/destination_id=d1")))
    val back = spark.read.json(dir)
    assert(back.count() === 3)
  }

  test("D6 streaming object sink delivers micro-batches to the partitioned layout") {
    val sess = spark
    import sess.implicits._
    implicit val sq = spark.sqlContext
    val dir = tmp("d6")
    val ckpt = tmp("d6ckpt")
    val input = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(String, String, String)]
    val q = Sinks.startStreamingObjectSink(
      input.toDF().toDF("source_id", "destination_id", "payload"), dir, ckpt)
    try {
      input.addData(("s1", "d1", "p1"), ("s1", "d2", "p2"))
      q.processAllAvailable()
      input.addData(("s2", "d1", "p3"))
      q.processAllAvailable()
      assert(Files.exists(Paths.get(s"$dir/source_id=s1/destination_id=d1")))
      assert(Files.exists(Paths.get(s"$dir/source_id=s2/destination_id=d1")))
      assert(spark.read.json(dir).count() === 3)
    } finally q.stop()
  }

  test("D7 error stash partitions by failed_date") {
    val sess = spark
    import sess.implicits._
    val dir = tmp("d7")
    val df = Seq(
      ("e1", Timestamp.valueOf("2024-01-01 10:00:00"), "2024-01-01"),
      ("e2", Timestamp.valueOf("2024-01-01 09:00:00"), "2024-01-01"),
      ("e3", Timestamp.valueOf("2024-01-02 08:00:00"), "2024-01-02"))
      .toDF("error", "failed_at", "failed_date")
    Sinks.errorStash(df, dir)
    assert(Files.exists(Paths.get(s"$dir/failed_date=2024-01-01")))
    assert(spark.read.parquet(dir).count() === 3)
  }

  test("L9 retention delete rewrites without matching rows") {
    val sess = spark
    import sess.implicits._
    val dir = tmp("l9") + "/t"
    Seq((1L, "2024-01-01"), (2L, "2024-02-01"), (3L, "2024-03-01"))
      .toDF("id", "d").write.parquet(dir)
    val kept = Sinks.retentionDelete(spark, dir, "d < '2024-02-01'")
    assert(kept === 2)
    assert(spark.read.parquet(dir).select("id").as[Long].collect().toSet === Set(2L, 3L))
  }

  test("L9 partition drop: retention on the partition column is metadata-only") {
    val sess = spark
    import sess.implicits._
    val dir = tmp("l9part") + "/t"
    Seq((1L, "2024-01-01"), (2L, "2024-01-02"), (3L, "2024-02-01"))
      .toDF("id", "d").write.partitionBy("d").parquet(dir)
    def files(part: String) = Files.list(Paths.get(s"$dir/d=$part")).toArray
      .map(_.toString).filter(_.endsWith(".parquet")).toSet
    val keepBefore = files("2024-02-01")
    val dropped = Sinks.retentionDropPartitions(spark, dir, "d")(_ < "2024-02-01")
    assert(dropped === 2)
    assert(spark.read.parquet(dir).select("id").as[Long].collect().toSet === Set(3L))
    assert(files("2024-02-01") === keepBefore,
      "retained partition's files must be byte-untouched (no rewrite)")
  }

  test("retention delete is crash-atomic: a mid-write failure leaves the live table intact") {
    val sess = spark
    import sess.implicits._
    val dir = tmp("l9crash") + "/t"
    Seq((1L, "2024-01-01"), (2L, "2024-02-01"), (3L, "2024-03-01"))
      .toDF("id", "d").write.parquet(dir)
    // predicate that detonates during the staged write — simulates an
    // executor/driver failure after the rewrite has started
    intercept[Exception] {
      Sinks.retentionDelete(spark, dir, "id = CAST(raise_error('mid-write failure') AS BIGINT)")
    }
    assert(spark.read.parquet(dir).select("id").as[Long].collect().toSet === Set(1L, 2L, 3L),
      "failed rewrite must not touch the live table")
    // the table is still fully operational: a good delete now succeeds
    // (leftover staging from the crash is cleaned up automatically)
    assert(Sinks.retentionDelete(spark, dir, "d < '2024-02-01'") === 2)
    assert(spark.read.parquet(dir).select("id").as[Long].collect().toSet === Set(2L, 3L))
  }

  test("retention delete self-heals a table stranded in the swap window") {
    val sess = spark
    import sess.implicits._
    val base = tmp("l9heal")
    val dir = base + "/t"
    Seq((1L, "2024-01-01"), (2L, "2024-02-01"), (3L, "2024-03-01"))
      .toDF("id", "d").write.parquet(dir)
    // simulate a crash between the two swap renames: committed table
    // sits at __old, nothing live
    Files.move(Paths.get(dir), Paths.get(dir + "__old"))
    val kept = Sinks.retentionDelete(spark, dir, "d < '2024-02-01'")
    assert(kept === 2, "recovery must restore __old before reading")
    assert(spark.read.parquet(dir).select("id").as[Long].collect().toSet === Set(2L, 3L))
    assert(!Files.exists(Paths.get(dir + "__old")))
  }

  private def rg1Corpus(prefix: String): String = {
    val sess = spark
    import sess.implicits._
    val dir = tmp(prefix) + "/corpus"
    Seq((1L, 10L, "a"), (2L, 11L, "a"), (3L, 10L, "b"), (4L, 12L, "b"),
      (5L, 10L, "c"), (6L, 13L, "c"))
      .toDF("id", "uid", "obj").write.partitionBy("obj").parquet(dir)
    dir
  }

  test("RG1 regulation delete: cleans every object once, ledger makes the re-run a no-op") {
    val sess = spark
    import sess.implicits._
    val dir = rg1Corpus("rg1")
    val forget = Seq(10L).toDF("uid")
    assert(Sinks.regulationDelete(spark, dir, forget, "uid", "j1") === ((3L, 3L)))
    assert(spark.read.parquet(dir).select("id").as[Long].collect().toSet === Set(2L, 4L, 6L))
    // same job id again: fully-populated ledger, zero objects rewritten
    assert(Sinks.regulationDelete(spark, dir, forget, "uid", "j1") === ((3L, 0L)))
  }

  test("RG1 regulation delete: mid-rewrite crash leaves objects intact, job resumes from the ledger") {
    val sess = spark
    import sess.implicits._
    val dir = rg1Corpus("rg1crash")
    // forget list that detonates when the first object's staged
    // rewrite evaluates it — simulates a crash mid-clean
    val boom = spark.range(1)
      .select(expr("CAST(raise_error('mid-clean failure') AS BIGINT)").as("uid"))
    intercept[Exception] { Sinks.regulationDelete(spark, dir, boom, "uid", "j1") }
    assert(spark.read.parquet(dir).select("id").as[Long].collect().toSet ===
      Set(1L, 2L, 3L, 4L, 5L, 6L), "crashed clean must not touch any live object")
    // resume under the SAME job id finishes the remaining objects
    val forget = Seq(10L).toDF("uid")
    val (_, cleaned) = Sinks.regulationDelete(spark, dir, forget, "uid", "j1")
    assert(cleaned === 3L, "nothing was ledgered before the crash, so all 3 remain")
    assert(spark.read.parquet(dir).select("id").as[Long].collect().toSet === Set(2L, 4L, 6L))
  }

  test("RG1 regulation delete: a half-done ledger skips exactly the ledgered objects") {
    val sess = spark
    import sess.implicits._
    val dir = rg1Corpus("rg1resume")
    // fake a prior run of j1 that cleaned obj=a then crashed: the
    // resumed job must NOT re-touch obj=a (its suppressed rows stay —
    // proving the skip is real) and must clean b and c
    Files.write(Paths.get(dir, "_regulation_tracker.txt"), "j1\nobj=a\n".getBytes)
    val forget = Seq(10L).toDF("uid")
    assert(Sinks.regulationDelete(spark, dir, forget, "uid", "j1") === ((3L, 2L)))
    assert(spark.read.parquet(dir).select("id").as[Long].collect().toSet ===
      Set(1L, 2L, 4L, 6L), "obj=a skipped (id 1 kept), b/c cleaned (3, 5 deleted)")
  }

  test("RG1 regulation delete: heals an object stranded in the swap window, then cleans it") {
    val sess = spark
    import sess.implicits._
    val dir = rg1Corpus("rg1strand")
    // crash between atomicSwap's renames: only obj=b__old remains — a
    // live-dir-only listing would skip this object FOREVER (its
    // suppressed rows surviving = GDPR under-deletion)
    Files.move(Paths.get(dir, "obj=b"), Paths.get(dir, "obj=b__old"))
    val forget = Seq(10L).toDF("uid")
    assert(Sinks.regulationDelete(spark, dir, forget, "uid", "j1") === ((3L, 3L)),
      "the stranded object must be healed, inventoried, and cleaned")
    assert(spark.read.parquet(dir).select("id").as[Long].collect().toSet === Set(2L, 4L, 6L))
    assert(!Files.exists(Paths.get(dir, "obj=b__old")))
  }

  test("RG1 regulation delete: a DIFFERENT job id restarts the ledger and re-cleans") {
    val sess = spark
    import sess.implicits._
    val dir = rg1Corpus("rg1stale")
    assert(Sinks.regulationDelete(spark, dir, Seq(10L).toDF("uid"), "uid", "j1")._2 === 3L)
    // a new regulation job must not inherit the old job's ledger
    // (batch.go:255-286 truncates on job-id mismatch)
    assert(Sinks.regulationDelete(spark, dir, Seq(11L).toDF("uid"), "uid", "j2") === ((3L, 3L)))
    assert(spark.read.parquet(dir).select("id").as[Long].collect().toSet === Set(4L, 6L))
  }

  test("vacuum: removes swap leftovers, restores a table stranded in the swap window") {
    val sess = spark
    import sess.implicits._
    val parent = tmp("vacuum")
    def write(dir: String) = Seq(1L, 2L).toDF("id").write.mode("overwrite").parquet(dir)
    // table a: healthy, with both kinds of leftover
    write(s"$parent/a"); write(s"$parent/a__staging"); write(s"$parent/a__old")
    // table b: crashed inside the swap window — only __old exists
    write(s"$parent/b__old")
    // table c: untouched healthy table
    write(s"$parent/c")
    // default grace window: everything here was JUST written, so a
    // default-config vacuum must touch nothing — the guard that keeps
    // a concurrent writer's live staging dir safe.
    val guarded = Sinks.vacuum(spark, parent)
    assert(guarded.map(_._1).toSet === Set("skipped_recent"))
    assert(guarded.size === 3)
    // quiesced maintenance window (graceMs = 0): full cleanup
    val actions = Sinks.vacuum(spark, parent, graceMs = 0L).toSet
    assert(actions.map(_._1) === Set("removed_staging", "removed_old", "restored"))
    val left = new java.io.File(parent).listFiles().map(_.getName).toSet
    assert(left === Set("a", "b", "c"))
    // restored table reads back whole
    assert(spark.read.parquet(s"$parent/b").count() === 2)
    // idempotent: a second vacuum is a no-op
    assert(Sinks.vacuum(spark, parent, graceMs = 0L).isEmpty)
  }

  test("provider shaping: ClickHouse booleans become 0/1") {
    val sess = spark
    import sess.implicits._
    val df = Seq((1L, true), (2L, false)).toDF("id", "flag")
    val ch = Sinks.shapeForProvider(df, "CLICKHOUSE")
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(ch === Map(1L -> 1, 2L -> 0))
    val pg = Sinks.shapeForProvider(df, "POSTGRES")
    assert(pg.schema("flag").dataType === org.apache.spark.sql.types.BooleanType)
  }

  test("compaction rewrites small files into the target count, preserving rows") {
    val sess = spark
    import sess.implicits._
    val dir = tmp("compact") + "/t"
    (1 to 1000).toDF("id").repartition(20).write.parquet(dir)
    def parquetFiles = Files.list(Paths.get(dir)).toArray
      .map(_.toString).count(_.endsWith(".parquet"))
    assert(parquetFiles === 20)
    val n = Sinks.compact(spark, dir, 2)
    assert(n === 1000)
    assert(parquetFiles === 2)
    assert(spark.read.parquet(dir).count() === 1000)
  }

  test("L10 datalake write partitions by event date") {
    val sess = spark
    import sess.implicits._
    val dir = tmp("l10")
    val df = Seq(
      (1L, Timestamp.valueOf("2024-01-01 10:00:00")),
      (2L, Timestamp.valueOf("2024-01-02 10:00:00")))
      .toDF("id", "ts")
    Sinks.datalakeWrite(df, dir)
    assert(Files.exists(Paths.get(s"$dir/event_date=2024-01-01")))
    assert(Files.exists(Paths.get(s"$dir/event_date=2024-01-02")))
    // partition pruning: reading one date touches one partition
    val one = spark.read.parquet(dir).filter(col("event_date") === "2024-01-01")
    assert(one.count() === 1)
  }

  test("versioned commits are crash-atomic and versions are immutable time travel") {
    val sess = spark
    import sess.implicits._
    val dir = Files.createTempDirectory("graft-versioned").toString + "/t"
    val v0 = Sinks.versionedWrite(Seq((1L, 10.0), (2L, 20.0)).toDF("k", "v"), dir)
    assert(v0 === 0L)
    // a commit that dies mid-write must leave v0 the readable latest
    val poison = Seq((1L, 10.0)).toDF("k", "v")
      .withColumn("v", expr("v + CAST(raise_error('mid-write failure') AS DOUBLE)"))
    intercept[Exception] { Sinks.versionedWrite(poison, dir) }
    assert(Sinks.latestVersion(spark, dir) === Some(0L))
    assert(Sinks.readVersion(spark, dir).count() === 2)
    // the next good commit publishes v1; v0 stays byte-identical
    val v1 = Sinks.versionedWrite(Seq((1L, 11.0), (2L, 20.0)).toDF("k", "v"), dir)
    assert(v1 === 1L)
    val asOf0 = Sinks.readVersion(spark, dir, Some(0L))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(asOf0 === Map(1L -> 10.0, 2L -> 20.0), "old snapshot unchanged by new commits")
    val latest = Sinks.readVersion(spark, dir)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(latest === Map(1L -> 11.0, 2L -> 20.0))
    // retention: vacuum to the newest 1 keeps only the latest
    val v2 = Sinks.versionedWrite(Seq((3L, 30.0)).toDF("k", "v"), dir)
    assert(Sinks.vacuumVersions(spark, dir, keep = 1) === Seq(0L, 1L))
    assert(Sinks.latestVersion(spark, dir) === Some(v2))
    intercept[Exception] { Sinks.readVersion(spark, dir, Some(0L)).collect() }
    assert(Sinks.readVersion(spark, dir).count() === 1)
  }

  /** live staging-file ledger with 4 uploads × 5 files each. */
  private def wa1Ledger(prefix: String): (String, String) = {
    val sess = spark
    import sess.implicits._
    val base = tmp(prefix)
    (0L to 19L).map(i => (i, i / 5)).toDF("staging_file_id", "upload")
      .repartition(col("upload"))
      .write.partitionBy("upload").parquet(s"$base/live")
    (s"$base/live", s"$base/archive")
  }

  private def archivedIds(archive: String): Set[Long] =
    spark.read.schema(StructType.fromDDL("staging_file_id BIGINT, upload BIGINT"))
      .json(s"$archive/part_*")
      .select("staging_file_id").collect().map(_.getLong(0)).toSet

  test("WA1 warehouse archive: backs up + deletes each upload once; tracker makes re-run a no-op") {
    val (live, archive) = wa1Ledger("wa1")
    assert(Sinks.warehouseArchive(spark, live, archive, Seq(0L, 1L, 2L), "j1")
      === ((3L, 3L)))
    assert(archivedIds(archive) === (0L to 14L).toSet)
    assert(spark.read.parquet(live).select("staging_file_id")
      .collect().map(_.getLong(0)).toSet === (15L to 19L).toSet,
      "only the unarchived upload stays live")
    // same job id: complete tracker, nothing re-archived
    assert(Sinks.warehouseArchive(spark, live, archive, Seq(0L, 1L, 2L), "j1")
      === ((3L, 0L)))
    assert(archivedIds(archive) === (0L to 14L).toSet)
  }

  test("WA1 warehouse archive: crash between backup and delete re-runs idempotently") {
    val sess = spark
    import sess.implicits._
    val (live, archive) = wa1Ledger("wa1crashA")
    // simulate the crash window: upload 1's backup committed (with
    // stale garbage from a half-written attempt being overwritten on
    // resume), live dir still present, no tracker entry
    Seq((999L, 1L)).toDF("staging_file_id", "upload")
      .write.mode("overwrite").option("compression", "gzip")
      .json(s"$archive/part_1")
    assert(Sinks.warehouseArchive(spark, live, archive, Seq(0L, 1L), "j1")
      === ((2L, 2L)))
    assert(archivedIds(archive) === (0L to 9L).toSet,
      "resume must overwrite the stale backup, never merge with it")
  }

  test("WA1 warehouse archive: crash between delete and flag heals the flag without re-backup") {
    val (live, archive) = wa1Ledger("wa1crashB")
    assert(Sinks.warehouseArchive(spark, live, archive, Seq(0L, 1L), "j1")
      === ((2L, 2L)))
    // rewind the watermark to upload 0 — the state a crash leaves
    // after fs.delete(live) of upload 1 but before the flag commit
    val trackerPath = Paths.get(archive, "_archive_tracker.txt")
    val lines = Files.readAllLines(trackerPath)
    assert(lines.get(1) === "1", "watermark should have committed through upload 1")
    Files.write(trackerPath, java.util.List.of(lines.get(0), "0"))
    // the direct edit bypasses Hadoop's LocalFS checksum sidecar
    Files.deleteIfExists(Paths.get(archive, "._archive_tracker.txt.crc"))
    val (_, archived) = Sinks.warehouseArchive(spark, live, archive, Seq(0L, 1L), "j1")
    assert(archived === 0L, "live dir gone means the backup had committed — flag-only heal")
    assert(archivedIds(archive) === (0L to 9L).toSet)
    // and the healed tracker makes the next run a full no-op
    assert(Sinks.warehouseArchive(spark, live, archive, Seq(0L, 1L), "j1")
      === ((2L, 0L)))
  }

  test("WA1 warehouse archive: maxLimit pages the eligible set, same result, bounded collects") {
    val sess = spark
    import sess.implicits._
    val (live, archive) = wa1Ledger("wa1page")
    // maxLimit=1 forces 3 pages; outcome must match the one-page run
    assert(Sinks.warehouseArchivePaged(spark, live, archive,
      Seq(0L, 1L, 2L).toDF("upload"), "j1", maxLimit = 1) === ((3L, 3L)))
    assert(archivedIds(archive) === (0L to 14L).toSet)
    assert(spark.read.parquet(live).select("staging_file_id")
      .collect().map(_.getLong(0)).toSet === (15L to 19L).toSet)
    // resume across the SAME pages is a watermark-gated no-op
    assert(Sinks.warehouseArchivePaged(spark, live, archive,
      Seq(0L, 1L, 2L).toDF("upload"), "j1", maxLimit = 1) === ((3L, 0L)))
    // a staging leftover must not pollute the part_* glob
    assert(!Files.exists(Paths.get(archive, "_page_staging")))
  }

  private def sjJobs(n: Int) = {
    val sess = spark
    import sess.implicits._
    (0 until n).map(i => (i.toLong, s"jr_${i % 3}", s"table_$i"))
      .toDF("job_id", "job_run_id", "table_name")
  }

  private def sjStates(ledger: String): Map[Long, (String, Long)] = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("job_id")).orderBy(col("seq").desc)
    spark.read.parquet(ledger)
      .withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
      .select("job_id", "status", "attempt")
      .collect().map(r => r.getLong(0) -> ((r.getString(1), r.getLong(2)))).toMap
  }

  // succeeds on try 2 for even jobs, try 3 for jobs % 3 == 1, never otherwise
  private def sjOutcome(run: String, tbl: String, tryNo: Long): Boolean = {
    val id = tbl.stripPrefix("table_").toLong
    (id % 2 == 0 && tryNo == 2) || (id % 3 == 1 && tryNo == 3)
  }

  test("source jobs: terminal states follow the pre-increment attempt cap") {
    val ledger = tmp("graft_sj_cap") + "/ledger"
    // maxAttempt = 1 -> 3 tries; job 0,2,4.. succeed on try 2 with
    // attempts=1; 1,7 succeed on try 3 with attempts=2; 3,5 abort at 3
    val (executed, terminal) =
      Sinks.sourceJobsRun(spark, ledger, sjJobs(8), 1, 3, sjOutcome)
    val st = sjStates(ledger)
    assert(st(0L) === (("succeeded", 1L)) && st(4L) === (("succeeded", 1L)))
    assert(st(1L) === (("succeeded", 2L)) && st(7L) === (("succeeded", 2L)))
    assert(st(3L) === (("aborted", 3L)) && st(5L) === (("aborted", 3L)))
    assert(terminal === 8L)
    assert(executed === st.values.map {
      case ("succeeded", a) => a + 1; case (_, a) => a }.sum)
  }

  test("source jobs: crash after the first claim batch resumes to identical terminals") {
    val clean = tmp("graft_sj_clean") + "/ledger"
    Sinks.sourceJobsRun(spark, clean, sjJobs(7), 1, 3, sjOutcome)
    val ledger = tmp("graft_sj_crash") + "/ledger"
    // crash: batch 1's executing rows committed, outcomes never return
    val (e0, t0) = Sinks.sourceJobsRun(spark, ledger, sjJobs(7), 1, 3, sjOutcome,
      crashAfterBatches = 1)
    assert(e0 === 0L && t0 === 0L)
    val dangling = sjStates(ledger).values.count(_._1 == "executing")
    assert(dangling === 3, "the crashed batch must leave executing rows")
    // resume: Reset requeues the executing claims WITHOUT counting a
    // failure, and the deterministic outcomes converge to the clean run
    Sinks.sourceJobsRun(spark, ledger, sjJobs(7), 1, 3, sjOutcome)
    assert(sjStates(ledger) === sjStates(clean))
    // a second resume finds everything terminal and does nothing
    assert(Sinks.sourceJobsRun(spark, ledger, sjJobs(7), 1, 3, sjOutcome)
      === ((0L, 0L)))
  }

  test("source jobs: every job aborts under an always-failing notifier, in pages") {
    val ledger = tmp("graft_sj_abort") + "/ledger"
    val (executed, terminal) =
      Sinks.sourceJobsRun(spark, ledger, sjJobs(5), 1, 2, (_, _, _) => false)
    assert(executed === 15L && terminal === 5L) // 3 tries each, batchSize 2
    assert(sjStates(ledger).values.toSet === Set(("aborted", 3L)))
  }

  // ---- notifier queue (services/notifier) ----

  private def ntJobs(n: Int) = {
    val sess = spark
    import sess.implicits._
    (0 until n).map(i => (i.toLong, s"b_${i % 3}", (i % 2).toLong + 1))
      .toDF("job_id", "batch_id", "priority")
  }

  // job succeeds on try 2 iff even, on try 1 iff id % 5 == 1
  private def ntOutcome(batch: String, job: Long, tryNo: Long): Boolean =
    (job % 2 == 0 && tryNo == 2) || (job % 5 == 1 && tryNo == 1)

  private def ntStates(ledger: String): Map[Long, (String, Long)] =
    graft.sinks.Notifier.returnedJobs(spark, ledger)
      .collect().map(r => r.getLong(0) -> ((r.getString(3), r.getLong(4)))).toMap

  test("notifier: pre-increment attempt cap, claim algebra, batch completion") {
    val ledger = tmp("graft_nt_cap") + "/ledger"
    // maxAttempt = 0 -> 2 tries; even jobs succeed on try 2
    // (attempts=1), job 1 on try 1 (attempts=0), odd non-%5==1 abort
    val (executed, orphans, refreshes, batches) = graft.sinks.Notifier.run(
      spark, ledger, ntJobs(6), maxAttempt = 0, nWorkers = 4,
      orphanTimeoutRounds = 2, outcome = ntOutcome)
    val st = ntStates(ledger)
    assert(st(0L) === (("succeeded", 1L)) && st(4L) === (("succeeded", 1L)))
    assert(st(1L) === (("succeeded", 0L)))
    assert(st(3L) === (("aborted", 2L)) && st(5L) === (("aborted", 2L)))
    assert(orphans === 0L && refreshes === 0L)
    assert(batches === 3L, "all three batches drain terminal and delete")
    assert(executed === st.values.map {
      case ("succeeded", a) => a + 1; case (_, a) => a }.sum)
    // the deletion tombstone is the LAST word in the raw ledger
    val raw = spark.read.parquet(ledger)
    assert(raw.filter(col("status") === "deleted").count() === 6L)
  }

  test("notifier: claims follow (priority, id) order") {
    val ledger = tmp("graft_nt_prio") + "/ledger"
    // 1 worker, everything succeeds on try 1: the succeeded rows'
    // seq order IS the claim order
    graft.sinks.Notifier.run(spark, ledger, ntJobs(6), 0, 1, 2, (_, _, _) => true)
    val order = spark.read.parquet(ledger)
      .filter(col("status") === "succeeded")
      .orderBy("seq").select("priority", "job_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(order === order.sorted, s"claim order violated: $order")
    assert(order.head._1 === 1L && order.last._1 === 2L)
  }

  test("notifier: a dead worker's claim orphan-requeues without costing an attempt") {
    val clean = tmp("graft_nt_clean") + "/ledger"
    graft.sinks.Notifier.run(spark, clean, ntJobs(8), 0, 3, 2, ntOutcome)
    val ledger = tmp("graft_nt_dead") + "/ledger"
    // worker 0 dies holding its first claim (job 0, the lowest
    // (priority, id)); maintenance requeues it after 2 rounds and the
    // terminals converge to the clean run's
    val (_, orphans, _, batches) = graft.sinks.Notifier.run(
      spark, ledger, ntJobs(8), 0, 3, 2, ntOutcome,
      deadAfterFirstClaim = Set(0))
    assert(orphans === 1L, "exactly the dead worker's claim requeues")
    assert(batches === 3L)
    assert(ntStates(ledger) === ntStates(clean),
      "an orphan requeue must not change any terminal state")
    // the requeue row preserved the attempt (crash is not a failure)
    val requeued = spark.read.parquet(ledger)
      .filter(col("status") === "waiting" && col("seq") > 0)
    assert(requeued.count() === 1L && requeued.head.getLong(5) === 0L)
  }

  test("notifier: crash mid-claim resumes to identical terminals") {
    val clean = tmp("graft_nt_clean2") + "/ledger"
    graft.sinks.Notifier.run(spark, clean, ntJobs(7), 0, 3, 2, ntOutcome)
    val ledger = tmp("graft_nt_crash") + "/ledger"
    // crash after round 1: three executing claims committed, no
    // outcomes reported
    val (e0, o0, _, b0) = graft.sinks.Notifier.run(
      spark, ledger, ntJobs(7), 0, 3, 2, ntOutcome, crashAfterRounds = 1)
    assert(e0 === 0L && o0 === 0L && b0 === 0L)
    assert(ntStates(ledger).values.count(_._1 == "executing") === 3,
      "the crashed round must leave executing rows")
    // resume: the round clock continues, the stale claims age into
    // the orphan sweep, and the deterministic outcomes converge
    val (_, orphans, _, batches) = graft.sinks.Notifier.run(
      spark, ledger, ntJobs(7), 0, 3, 2, ntOutcome)
    assert(orphans === 3L, "every stranded claim must requeue")
    assert(batches === 3L)
    assert(ntStates(ledger) === ntStates(clean))
    // a second resume is a no-op on the drained queue
    assert(graft.sinks.Notifier.run(spark, ledger, ntJobs(7), 0, 3, 2, ntOutcome)
      === ((0L, 0L, 0L, 0L)))
  }

  test("notifier: a fully-dead worker pool terminates instead of spinning, " +
    "and the stranded ledger recovers on the next run") {
    val ledger = tmp("graft_nt_allgone") + "/ledger"
    // both workers die holding their first claims: the run must
    // RETURN (no progress is possible), leaving a recoverable ledger
    val (e0, _, _, b0) = graft.sinks.Notifier.run(
      spark, ledger, ntJobs(5), 0, 2, 2, ntOutcome,
      deadAfterFirstClaim = Set(0, 1))
    assert(e0 === 0L && b0 === 0L)
    // a later run with live workers sweeps the orphans and drains
    val (_, orphans, _, batches) = graft.sinks.Notifier.run(
      spark, ledger, ntJobs(5), 0, 2, 2, ntOutcome)
    assert(orphans === 2L && batches === 3L)
    val clean = tmp("graft_nt_allgone_clean") + "/ledger"
    graft.sinks.Notifier.run(spark, clean, ntJobs(5), 0, 2, 2, ntOutcome)
    assert(ntStates(ledger) === ntStates(clean))
  }

  test("notifier: a slow worker's RefreshClaim heartbeat defeats the orphan sweep") {
    val ledger = tmp("graft_nt_slow") + "/ledger"
    // worker 0 holds its claim 4 rounds (>> the 2-round timeout) but
    // heartbeats every round — it must resolve itself, never requeue
    val (executed, orphans, refreshes, batches) = graft.sinks.Notifier.run(
      spark, ledger, ntJobs(4), 0, 2, 2, (_, _, _) => true,
      slowHold = Some((0, 4)))
    assert(orphans === 0L, "a refreshed claim must never orphan")
    assert(refreshes >= 3L, "the heartbeat must fire while holding")
    assert(executed === 4L && batches === 3L)
    assert(ntStates(ledger).values.forall(_._1 == "succeeded"))
  }

  test("suppression backup: restore-and-resume converges to the live store") {
    val sess = spark
    import sess.implicits._
    def feedOf(n: Int) = (1 to n).map { i =>
      (i.toLong, "ws0", s"user_${i % 5}", i % 7 == 0,
        1000000L * i, if (i % 4 == 0) Seq.empty[String] else Seq(s"src_${i % 3}"))
    }.toDF("seq", "workspace_id", "user_id", "canceled", "created_at_us", "source_ids")
    val base = tmp("graft_t1c_spec")
    // live instance syncs 12 of an eventual 20 regulations, in pages of 5
    assert(Suppression.sync(spark, s"$base/live", feedOf(12), 5) === 12L)
    assert(Suppression.token(spark, s"$base/live") === 12L)
    Suppression.backupFull(spark, s"$base/live", s"$base/full")
    // live moves on
    assert(Suppression.sync(spark, s"$base/live", feedOf(20), 5) === 8L)
    // fresh instance: restore carries the token, resume pulls ONLY the delta
    assert(Suppression.restore(spark, s"$base/full", s"$base/boot") === 12L)
    assert(Suppression.sync(spark, s"$base/boot", feedOf(20), 5) === 8L)
    val live = Suppression.effectiveSet(spark, s"$base/live")
      .orderBy("user_id").collect().toSeq
    val boot = Suppression.effectiveSet(spark, s"$base/boot")
      .orderBy("user_id").collect().toSeq
    assert(live === boot, "restored+resumed store must equal the live store")
    assert(live.nonEmpty, "fixture must suppress someone")
    // latest export windows by regulation time and keeps the token:
    // window = 8 ticks -> entries 12-8=4..12, i.e. seq >= 4
    Suppression.backupLatest(spark, s"$base/live", s"$base/latest", 8000000L)
    assert(Suppression.token(spark, s"$base/latest") === 20L)
    assert(spark.read.parquet(s"$base/latest").agg(min("seq")).first().getLong(0) === 12L)
    // crash window: a stale token re-pulls the last page; duplicate seq
    // rows are identical, so the effective set is unchanged
    Suppression.sync(spark, s"$base/crash", feedOf(20), 5)
    val before = Suppression.effectiveSet(spark, s"$base/crash")
      .orderBy("user_id").collect().toSeq
    val fs = new org.apache.hadoop.fs.Path(s"$base/crash")
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val out = fs.create(new org.apache.hadoop.fs.Path(s"$base/crash/_token.txt"), true)
    out.write("15\n".getBytes("UTF-8")); out.close()
    assert(Suppression.sync(spark, s"$base/crash", feedOf(20), 5) === 5L)
    val after = Suppression.effectiveSet(spark, s"$base/crash")
      .orderBy("user_id").collect().toSeq
    assert(before === after, "a re-pulled page must not change the effective set")
  }

  test("read-excluded partitions: add/remove ledger is idempotent and ordered") {
    val ledger = tmp("graft_jd2") + "/ledger"
    // empty ledger reads as no exclusions
    assert(Sinks.readExcludedPartitionIDs(spark, ledger) === Seq.empty)
    // add dedups the batch (lo.Uniq) and returns the newly-excluded count
    assert(Sinks.addReadExcludedPartitionIDs(spark, ledger,
      Seq("ws0-3", "ws0-1", "ws0-3")) === 2L)
    assert(Sinks.readExcludedPartitionIDs(spark, ledger) === Seq("ws0-1", "ws0-3"))
    // re-adding an excluded id is ON CONFLICT DO NOTHING: no new rows
    val rowsBefore = spark.read.parquet(ledger).count()
    assert(Sinks.addReadExcludedPartitionIDs(spark, ledger, Seq("ws0-1")) === 0L)
    assert(spark.read.parquet(ledger).count() === rowsBefore)
    // removing an absent id is a no-op DELETE; a live one un-excludes
    assert(Sinks.removeReadExcludedPartitionIDs(spark, ledger,
      Seq("ws9-9", "ws0-3")) === 1L)
    assert(Sinks.readExcludedPartitionIDs(spark, ledger) === Seq("ws0-1"))
    // an id can cycle: re-add after remove re-excludes it
    assert(Sinks.addReadExcludedPartitionIDs(spark, ledger, Seq("ws0-3")) === 1L)
    assert(Sinks.readExcludedPartitionIDs(spark, ledger) === Seq("ws0-1", "ws0-3"))
    // empty batch is a no-op (the reference early-returns)
    assert(Sinks.addReadExcludedPartitionIDs(spark, ledger, Seq.empty) === 0L)
    assert(Sinks.removeReadExcludedPartitionIDs(spark, ledger, Seq.empty) === 0L)
  }
}
