package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Adaptive Query Execution behaviors the engine leans on at scale:
  * runtime skew-join splitting (the automatic form of q13's manual
  * salting) and post-shuffle partition coalescing.
  */
class AqeSpec extends SparkSpec {

  private def withConfs(pairs: (String, String)*)(body: => Unit): Unit = {
    val olds = pairs.map { case (k, _) => k -> spark.conf.getOption(k) }
    try { pairs.foreach { case (k, v) => spark.conf.set(k, v) }; body }
    finally olds.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  test("AQE splits a skewed join partition at runtime") {
    val sess = spark
    import sess.implicits._
    withConfs(
      "spark.sql.adaptive.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "2",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "8192",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "4096",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.shuffle.partitions" -> "64") {
      // one whale key carrying a third of a wide-payload table
      val left = spark.range(150000)
        .select(when(col("id") % 3 === 0, lit(1L)).otherwise(col("id")).as("k"),
          expr("md5(cast(id as string))").as("p")) // non-foldable payload
      val right = spark.range(500).select(col("id").as("k"), col("id").as("v"))
      val joined = left.join(right, "k").agg(sum(length(col("p"))).as("bytes"))
      // materialize THIS execution (count() would plan separately)
      assert(joined.collect().length > 0)
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("isFinalPlan=true"))
      assert(plan.contains("skew=true"),
        s"expected AQE to mark the skewed join:\n${plan.take(2000)}")
    }
  }

  test("runtime bloom filter prunes the probe-side scan of a selective join") {
    assume(new java.io.File("/root/testdata/sf0.001").exists())
    withConfs(
      "spark.sql.optimizer.runtime.bloomFilter.enabled" -> "true",
      "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold" -> "10MB",
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold" -> "1KB",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1") {
      val orders = spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
        .filter(col("o_totalprice") > 400000) // selective build side
      val lineitem = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
      val joined = lineitem.join(orders,
        lineitem("l_orderkey") === orders("o_orderkey"))
      val plan = joined.queryExecution.optimizedPlan.toString
      assert(plan.contains("might_contain") && plan.contains("bloom_filter_agg"),
        s"expected a runtime bloom filter on the probe side:\n${plan.take(1500)}")
    }
  }

  test("AQE coalesces small post-shuffle partitions") {
    val sess = spark
    import sess.implicits._
    withConfs(
      "spark.sql.adaptive.enabled" -> "true",
      "spark.sql.adaptive.coalescePartitions.enabled" -> "true",
      "spark.sql.shuffle.partitions" -> "64") {
      val agg = spark.range(1000).groupBy((col("id") % 10).as("g")).count()
      agg.collect()
      val plan = agg.queryExecution.executedPlan.toString
      assert(plan.contains("AQEShuffleRead coalesced"),
        s"expected coalesced shuffle read:\n${plan.take(2000)}")
    }
  }
}
