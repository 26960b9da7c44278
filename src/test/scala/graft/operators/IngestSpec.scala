package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Ingest-edge invariants the oracle can't express: the TRUE
  * byte-level HMAC-SHA256 column expression (DuckDB can't hash blobs,
  * so s3b's differential gate uses the hex-intermediate keyed hash;
  * this spec pins the binary chain against javax.crypto.Mac).
  */
class IngestSpec extends SparkSpec {

  test("hmacSha256 expression matches javax.crypto.Mac for assorted keys/bodies") {
    val sess = spark
    import sess.implicits._
    val cases = Seq(
      ("whsec_shopfront", """{"customer":{"id":"c1"}}"""),
      ("k", ""), // empty body, 1-byte key
      ("a-much-longer-secret-key-0123456789", "payload with spaces & unicode: éλ"),
      ("whsec_adnet", """{"click":{"uid":"c7"},"type":"ad_click","bid":0.03}"""))
    cases.foreach { case (secret, body) =>
      val mac = javax.crypto.Mac.getInstance("HmacSHA256")
      mac.init(new javax.crypto.spec.SecretKeySpec(secret.getBytes("UTF-8"), "HmacSHA256"))
      val expected = mac.doFinal(body.getBytes("UTF-8")).map("%02x".format(_)).mkString
      val got = Seq(body).toDF("body")
        .select(Ingest.hmacSha256(secret, col("body")).as("sig"))
        .first().getString(0)
      assert(got === expected, s"HMAC mismatch for key=$secret")
    }
  }

  test("s3b covers 16 single-event providers plus 2 batched shapes, forged sig flagged") {
    val out = graft.SparkEntry.queries("s3b_webhook_providers")(spark, "unused")
      .collect()
    val providers = out.map(_.getString(1)).toSet
    assert(providers.size === 18, s"expected 18 providers, got ${providers.size}")
    // every genuine hook verifies; only the forged replay fails
    val invalid = out.filter(!_.getBoolean(4)).map(_.getLong(0)).toSet
    assert(invalid === Set(19L))
    // batched providers exploded to per-event rows
    assert(out.count(_.getString(1) == "pushsvc") === 3)
    assert(out.count(_.getString(1) == "cartly") === 2)
  }
}
