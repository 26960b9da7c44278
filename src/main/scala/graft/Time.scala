package graft

import org.apache.spark.sql.SparkSession

/** Single-query timing harness for perf iteration (the full Bench
  * gauntlet is ~100s; this times just the named queries with the same
  * session config and min-of-N protocol):
  *
  *   SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 \
  *     sbt "runMain graft.Time t7b_delayed_events ll18_cdc_dedup"
  */
object Time {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val passes = sys.env.getOrElse("SPARK_GRAFT_PASSES", "2").toInt
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000000).selectExpr("sum(id)", "count(distinct id % 100)").collect()
    args.foreach { name =>
      val fn = SparkEntry.queries(name)
      val times = (1 to passes).map { _ =>
        val t0 = System.nanoTime()
        val rows = fn(spark, sfDir).count()
        ((System.nanoTime() - t0) / 1e9, rows)
      }
      println(f"TIME $name best=${times.map(_._1).min}%.3f s " +
        f"all=[${times.map(t => f"${t._1}%.3f").mkString(", ")}] rows=${times.head._2}")
    }
    spark.stop()
  }
}
