package graft

import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}

/** Guards against driver-side testdata regenerations silently changing
  * physical schemas (round 9 lost 75 queries to events.ts flipping from
  * parquet TIMESTAMP(NANOS) to timestamp[us]). Every loader must
  * ANALYZE — eager `withColumn` resolution means construction alone
  * catches dtype drift — and `events.ts` must normalize to the session
  * TimestampType whichever encoding the parquet carries.
  */
class TablesSpec extends SparkSpec {
  private val sfDir = "/root/testdata/sf0.001"
  private def requireData(): Unit = assume(new java.io.File(sfDir).exists())

  for (name <- Tables.all) {
    test(s"$name loader analyzes and is non-empty at sf0.001") {
      requireData()
      val df = Tables.loader(name)(spark, sfDir)
      // force analysis + one row; any dtype drift dies here with the
      // table name in the test title instead of 75 opaque query errors
      assert(df.limit(1).count() == 1L, s"$name is empty or unreadable")
    }
  }

  test("events.ts normalizes to session TimestampType at µs precision") {
    requireData()
    val ev = Tables.events(spark, sfDir)
    assert(ev.schema("ts").dataType == TimestampType,
      s"ts is ${ev.schema("ts").dataType}; loader must normalize nanos-long / NTZ / LTZ")
    assert(!ev.columns.contains("ts_ns"), "ts_ns was removed (zero consumers)")
  }

  test("events loader handles all three historical ts encodings") {
    requireData()
    import org.apache.spark.sql.functions._
    val ev = Tables.events(spark, sfDir)
    // micros derived from the raw file must round-trip: whatever the
    // physical encoding, unix_micros(ts) equals the file's µs value.
    // The nanos branch uses INTEGER div — `/` would go through double
    // and can be off by 1 µs on ~1.7e18 nanosecond epochs (> 2^53).
    val raw = spark.read.parquet(s"$sfDir/events.parquet")
    val rawMicros = raw.schema("ts").dataType match {
      case LongType          => raw.select(expr("ts div 1000").as("us"), col("event_id"))
      case TimestampNTZType  => raw.select(unix_micros(col("ts").cast(TimestampType)).as("us"), col("event_id"))
      case _                 => raw.select(unix_micros(col("ts")).as("us"), col("event_id"))
    }
    val mismatches = ev.select(unix_micros(col("ts")).as("got"), col("event_id"))
      .join(rawMicros, "event_id")
      .filter(col("got") =!= col("us")).count()
    assert(mismatches == 0L, s"$mismatches rows lost µs fidelity through the loader")
  }
}
