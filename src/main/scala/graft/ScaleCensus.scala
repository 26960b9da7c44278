package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Driver-side CANDIDATE-VOLUME census for the adaptive exact-Jaccard
  * operator (ll6) — the r14 verdict's adjudication tool for its K=16
  * exponent wobble (0.74–1.10 across same-code runs): instead of
  * timing wall-clock (which carries K=16 memory pressure), count the
  * WORK directly. For the x1 and xK corpora (BenchScale's replicator,
  * so the df distribution is preserved) this measures:
  *
  *   - the jaccardStrategy statistic (rare-occurrence share, Σdf²/occ)
  *     and the branch it picks;
  *   - the inverted-index candidate volume Σdf² (what the budget
  *     reroute bounds);
  *   - the LSH arm's actual candidate-stream size: Σ_buckets C(n,2)
  *     over the 4×4 band buckets (what the verify join carries).
  *
  * If candidates/occ is flat from x1 to xK, the operator's work grows
  * LINEARLY and any above-1.0 timing exponent is environment, not
  * plan. One JSON line; also written to BENCH_SCALE_CENSUS.json.
  */
object ScaleCensus {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")
    val k = sys.env.getOrElse("SPARK_GRAFT_SCALE_K", "16").toInt
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      // workload-sized codegen cache (see Bench)
      .config("spark.sql.codegen.cache.maxEntries", "10000")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val base = java.nio.file.Files.createTempDirectory("graft_census").toString
    def censusOf(dir: String, rep: Int): String = {
      BenchScale.replicate(spark, sfDir, dir, rep)
      // ll6's exact input: the perturbed two-crawl corpus' shingles
      val docs = spark.read.parquet(s"$dir/documents.parquet")
        .select(col("doc_id"), col("text"))
      val cor = docs.unionByName(docs.select(
        (col("doc_id") + 100000000L).as("doc_id"),
        expr("substring(text, instr(text, ' ') + 1)").as("text")))
      val sh = operators.Dedup.shingles(cor)
      val dfstats = sh.groupBy(col("sh")).agg(count(lit(1)).as("df"))
        .agg(sum(when(col("df") <= 2, col("df")).otherwise(0L)).as("rare_occ"),
          sum(col("df")).as("occ"),
          sum(col("df") * col("df")).as("sum_df2")).head()
      val (rareOcc, occ, sumDf2) =
        (dfstats.getLong(0), dfstats.getLong(1), dfstats.getLong(2))
      val share = rareOcc.toDouble / math.max(1L, occ)
      val branch =
        if (share >= 0.25) "prefix-filtered"
        else if (sumDf2 <= 16L * occ) "inverted-index"
        else "lsh-verified"
      // the LSH arm's candidate stream: sum over 4x4 band buckets of
      // C(n, 2) — the exact row count the verify join processes
      val cand = operators.Dedup
        .bandRowsOf(operators.Dedup.minhashSignatures(sh))
        .groupBy(col("band"), col("bkey")).agg(count(lit(1)).as("n"))
        .agg(sum(expr("n * (n - 1) DIV 2"))).head().getLong(0)
      f"""{"rep":$rep,"occ":$occ,"sum_df2":$sumDf2,"rare_share":$share%.4f,""" +
        f""""branch":"$branch","band_candidates":$cand,""" +
        f""""candidates_per_occ":${cand.toDouble / math.max(1L, occ)}%.4f}"""
    }
    val c1 = censusOf(s"$base/x1", 1)
    val ck = censusOf(s"$base/x$k", k)
    val json = s"""{"metric":"ll6_candidate_census","k":$k,"x1":$c1,"xk":$ck}"""
    java.nio.file.Files.write(java.nio.file.Paths.get("BENCH_SCALE_CENSUS.json"),
      (json + "\n").getBytes("UTF-8"))
    println(json)
    spark.stop()
  }
}
