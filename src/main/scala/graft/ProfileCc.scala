package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch profiler for the CC engine (not part of the library). */
object ProfileCc {
  def main(args: Array[String]): Unit = {
    sys.props("graft.cc.profile") = "1"
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000000).selectExpr("sum(id)").collect()
    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[prof] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    val ev = Tables.events(spark, sfDir)
    val edges =
      if (args.contains("numeric")) {
        // the l8 shape: numeric ids, two hub families per user
        val e1 = ev.select((col("user_id") + 100000L).as("src"), (col("user_id") % 37).as("dst"))
        val e2 = ev.select((col("user_id") + 100000L).as("src"), (col("user_id") % 53 + 1000L).as("dst"))
        e1.union(e2).distinct()
      } else ev
        .select(
          concat(lit("anon_"), (col("user_id") % 37).cast("string")).as("src"),
          concat(lit("user_"), col("user_id").cast("string")).as("dst"))
        .distinct()
    time("edges materialize")(edges.count())
    val (labels, iters) = time("cc total")(
      operators.Identity.connectedComponentsWithStats(edges))
    println(s"[prof] iterations: $iters")
    time("final agg")(labels.groupBy(col("comp")).agg(count(lit(1))).count())
    spark.stop()
  }
}
