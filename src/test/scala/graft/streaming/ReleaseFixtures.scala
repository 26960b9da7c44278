package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The cp6/cp5 release fixture helpers shared by StreamingSpec and
  * StreamingReleaseSpec (the release pins were split into their own
  * suite purely for test-group parallelism — see build.sbt).
  */
trait ReleaseFixtures { this: SparkSpec =>

  protected val releaseSfDir = "/root/testdata/sf0.001"

  /** cp6's planted twin corpus joined to its crawl-aligned embeddings,
    * as the (doc_id, text, embedding) rows the release stream
    * consumes, sorted by doc_id — the crawl-frontier contract.
    */
  protected def releaseRows(): Array[(Long, String, Seq[Float])] = {
    val cor = graft.operators.Pipeline.cp6Corpus(spark, releaseSfDir)
    val vecs = graft.operators.Pipeline.cp5TwinVecs(spark, releaseSfDir)
      .withColumnRenamed("vec_id", "doc_id")
    cor.join(vecs, "doc_id").orderBy(col("doc_id"))
      .collect() // test-grain: sf0.001 is 1000 twin-corpus rows
      .map(r => (r.getLong(0), r.getString(1), r.getSeq[Float](2)))
  }

  protected def releaseSet(df: org.apache.spark.sql.DataFrame): Set[(String, Long, Long)] =
    df.collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet

  /** cp6's conservation shape: tokens conserve over gates + cut +
    * sampled_out + shards; docs conserve over the same MINUS the cut
    * row (a cut doc still ships — see cp5ReleaseOf's withCut note). */
  protected def assertReleaseConservation(got: Set[(String, Long, Long)],
                                        ctx: String): Unit = {
    val input_ = got.find(_._1 == "input").get
    val parts = got.filter(_._1 != "input")
    assert(parts.toSeq.map(_._3).sum === input_._3,
      s"tokens must conserve (gates + cut + sampled_out + shards) $ctx")
    assert(parts.filterNot(_._1 == "cut:substr").toSeq.map(_._2).sum === input_._2,
      s"docs must conserve (cut:substr excluded) $ctx")
  }

}
