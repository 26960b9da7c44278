package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Bucketing = the co-located-join layout for repeated big joins at
  * 100 TB: both sides pre-hashed into the same bucket count on the
  * join key, so the join plans with NO shuffle exchange on either
  * side — the jobs/status join (S5) and users∪identifies load (L7)
  * run this way in production.
  */
class BucketingSpec extends SparkSpec {

  test("bucketed-by-key tables join without a shuffle exchange") {
    val sess = spark
    import sess.implicits._
    spark.sql("DROP TABLE IF EXISTS b_jobs")
    spark.sql("DROP TABLE IF EXISTS b_status")
    (1 to 5000).map(i => (i.toLong % 500, s"payload_$i"))
      .toDF("user_id", "payload")
      .write.bucketBy(8, "user_id").sortBy("user_id").saveAsTable("b_jobs")
    (1 to 2000).map(i => (i.toLong % 500, if (i % 3 == 0) "failed" else "ok"))
      .toDF("user_id", "state")
      .write.bucketBy(8, "user_id").sortBy("user_id").saveAsTable("b_status")

    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force the merge path
      val joined = spark.table("b_jobs").join(spark.table("b_status"), "user_id")
      val joinPlan = joined.queryExecution.executedPlan.toString
      assert(joinPlan.contains("SortMergeJoin"), joinPlan)
      assert(!joinPlan.contains("Exchange"),
        s"bucketed join must not shuffle either side:\n$joinPlan")
      val rows = joined.groupBy(col("state")).agg(count(lit(1)).as("n"))
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(rows("ok") + rows("failed") === 2000L * 10) // 500-key overlap, 10 jobs/key
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }
}
