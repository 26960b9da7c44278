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
    def ms(v: Double) = f"$v%.3f"
    val qs = results.map { case (k, v, _, _) => "\"" + k + "\":" + ms(v) }.mkString("{", ",", "}")
    val rowCounts = results.map { case (k, _, r, _) => "\"" + k + "\":" + r }.mkString("{", ",", "}")
    val errors = results.collect { case (k, _, _, Some(e)) => "\"" + k + "\":\"" + esc(e) + "\"" }.mkString("{", ",", "}")
    val total = results.map(_._2).sum
    // The driver keeps only the TAIL of this process's output (~2 KB),
    // and with 120+ queries the full per-query timing map no longer
    // fits — BENCH_r03/r04 recorded a truncated, unparseable line. So:
    // the complete detail goes to BENCH_FULL.json in the working
    // directory (the repo — the judge reads it from there), and the
    // printed contract line stays compact: total + the slowest queries
    // + all errors, sized to survive the capture window.
    val full = s"""{"metric":"total","value":${ms(total)},"unit":"sec","queries":$qs,"rows":$rowCounts,"errors":$errors,"sf":"$sfDir"}"""
    try java.nio.file.Files.write(java.nio.file.Paths.get("BENCH_FULL.json"),
      (full + "\n").getBytes("UTF-8"))
    catch { case _: Throwable => println(full) } // unwritable cwd: at least log it
    val slowest = results.sortBy(-_._2).take(25)
      .map { case (k, v, _, _) => "\"" + k + "\":" + ms(v) }.mkString("{", ",", "}")
    println(s"""{"metric":"total","value":${ms(total)},"unit":"sec","n_queries":${results.size},"n_errors":${results.count(_._4.isDefined)},"queries":$slowest,"errors":$errors,"full":"BENCH_FULL.json","sf":"$sfDir"}""")
    spark.stop()
  }
}
