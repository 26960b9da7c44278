package graft
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.cleaner.referenceTracking.cleanCheckpoints", "true")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // Warm the session (JIT, codegen compiler, shuffle service) so the
    // alphabetically-first query isn't billed ~5s of startup.
    spark.range(1000000).selectExpr("sum(id)", "count(distinct id % 100)").collect()
    try SparkEntry.entry(spark).count()
    catch { case _: Throwable => () } // warmup only; absence of the smoke dir is not a bench failure
    // (time, rows, error) per query — a query that throws is reported
    // as an error, never silently benched green.
    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      val t0 = System.nanoTime()
      val (rows, err) =
        try (fn(spark, sfDir).count(), None)
        catch { case e: Throwable => (-1L, Some(e.toString.takeWhile(_ != '\n').take(200))) }
      (name, (System.nanoTime() - t0) / 1e9, rows, err)
    }
    def esc(s: String) = s.flatMap { case '"' => "\\\""; case '\\' => "\\\\"; case c if c < ' ' => " "; case c => c.toString }
    // Millisecond precision keeps the contract line well inside the
    // driver's tail-capture window even as the query count grows.
    def ms(v: Double) = f"$v%.3f"
    val qs = results.map { case (k, v, _, _) => "\"" + k + "\":" + ms(v) }.mkString("{", ",", "}")
    val rowCounts = results.map { case (k, _, r, _) => "\"" + k + "\":" + r }.mkString("{", ",", "}")
    val errors = results.collect { case (k, _, _, Some(e)) => "\"" + k + "\":\"" + esc(e) + "\"" }.mkString("{", ",", "}")
    val total = results.map(_._2).sum
    // Row counts go on their own line FIRST: the driver's tail-capture
    // keeps the end of the output, and the contract line below (with
    // the per-query timings) is the one that must survive truncation.
    println(s"""{"rows":$rowCounts}""")
    println(s"""{"metric":"total","value":${ms(total)},"unit":"sec","queries":$qs,"errors":$errors,"sf":"$sfDir"}""")
    spark.stop()
  }
}
