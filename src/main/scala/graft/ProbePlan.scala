package graft

import org.apache.spark.sql.SparkSession

/** Scratch probe (round-21 measurement): split a query's wall time
  * into construction / analysis+optimization+planning / execution —
  * identifies queries whose cost is the driver's Catalyst work on an
  * oversized expression tree rather than data movement (guide §7.3).
  *
  *   sbt "runMain graft.ProbePlan ev16_index_rebuild_check"
  */
object ProbePlan {
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
    def secs(t0: Long) = (System.nanoTime() - t0) / 1e9
    args.foreach { name =>
      (1 to 3).foreach { i =>
        val t0 = System.nanoTime()
        val df = SparkEntry.queries(name)(spark, sfDir)
        val tBuild = secs(t0)
        val t1 = System.nanoTime()
        df.queryExecution.executedPlan // forces analysis + optimization + planning
        val tPlan = secs(t1)
        val t2 = System.nanoTime()
        val n = df.count()
        val tExec = secs(t2)
        println(f"PROBEPLAN $name pass$i rows=$n construct=$tBuild%.3f plan=$tPlan%.3f exec=$tExec%.3f")
      }
    }
    spark.stop()
  }
}
