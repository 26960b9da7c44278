package graft

import org.apache.spark.sql.SparkSession

/** One-call session setup: registers every canonical table as a view
  * and all engine functions (UDF and native), so a user points the
  * engine at a data directory and immediately queries it — the
  * "switch from the reference and run every query" entry point.
  *
  *   Catalog.register(spark, "/data/sf100")
  *   spark.sql("SELECT event, count(*) FROM events GROUP BY 1")
  */
object Catalog {
  def register(spark: SparkSession, dir: String): Unit = {
    Tables.all.foreach { name =>
      try Tables.load(spark, dir, name).createOrReplaceTempView(name)
      catch { case _: Exception => () } // tolerate missing optional tables
    }
    // events needs its nanosecond-timestamp normalization
    try Tables.events(spark, dir).createOrReplaceTempView("events")
    catch { case _: Exception => () }
    functions.JsonFlatten.register(spark)
    functions.SafeNames.register(spark)
    functions.FlattenJsonExpr.register(spark)
    functions.NameExprs.register(spark)
  }
}
