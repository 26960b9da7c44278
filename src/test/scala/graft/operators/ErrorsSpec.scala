package graft.operators

import graft.SparkSpec
import scala.collection.mutable.ArrayBuffer

/** er1/er2 unit coverage: the bit-parallel LCS against a naive DP,
  * the bounded-set fold's exact/similar/cap behavior, and spot checks
  * of the extraction branches.
  */
class ErrorsSpec extends SparkSpec {

  private def naiveLcs(a: Array[String], b: Array[String]): Int = {
    val dp = Array.ofDim[Int](a.length + 1, b.length + 1)
    for (i <- 1 to a.length; j <- 1 to b.length)
      dp(i)(j) =
        if (a(i - 1) == b(j - 1)) dp(i - 1)(j - 1) + 1
        else math.max(dp(i - 1)(j), dp(i)(j - 1))
    dp(a.length)(b.length)
  }

  test("bit-parallel LCS matches the naive DP") {
    val words = Array("alpha", "beta", "gamma", "delta", "alpha", "eps")
    val rnd = new scala.util.Random(7)
    for (_ <- 1 to 200) {
      val a = Array.fill(rnd.nextInt(12))(words(rnd.nextInt(words.length)))
      val b = Array.fill(rnd.nextInt(12))(words(rnd.nextInt(words.length)))
      assert(Errors.lcsWords(a, b) === naiveLcs(a, b), s"${a.toSeq} vs ${b.toSeq}")
    }
  }

  test("bounded-set fold: exact, similar, admission cap, redaction") {
    val canon = ArrayBuffer.empty[String]
    assert(Errors.normalizeOne(canon, "connection timed out to endpoint a", 2) ===
      "connection timed out to endpoint a") // admitted
    assert(Errors.normalizeOne(canon, "connection timed out to endpoint b", 2) ===
      "connection timed out to endpoint a") // similar -> canonical
    assert(Errors.normalizeOne(canon, "totally different failure class here", 2) ===
      "totally different failure class here") // second admission
    assert(Errors.normalizeOne(canon, "yet another unrelated breakage kind", 2) ===
      "RedactedError") // cap reached
    assert(Errors.normalizeOne(canon, "connection timed out to endpoint a", 2) ===
      "connection timed out to endpoint a") // exact hit still resolves
    assert(canon.size === 2)
  }

  test("er1 extraction branches") {
    val rows = Errors.defs("er1_error_extract")(spark, "")
      .collect().map(r => r.getLong(0) -> (r.getString(1), r.getString(2))).toMap
    assert(rows(1L) === ("connection refused dial tcp", "network:timeout"))
    assert(rows(4L) === ("Invalid API key", ""))
    assert(rows(5L) === ("event rejected by destination", ""))
    assert(rows(6L) === ("Bad Gateway upstream connect error", ""))
    assert(rows(8L) === ("load failed schema mismatch", ""))
    assert(rows(13L) === ("returned contact", ""))
    assert(rows(14L)._2 === "deprecation")
    assert(rows(16L)._2 === "") // warehouse destinations skip deprecation detection
    assert(rows(15L)._1.endsWith("...") && rows(15L)._1.length === 203)
  }

  test("er2 greedy normalization groups and redacts") {
    val out = Errors.defs("er2_error_groups")(spark, "")
      .collect().map(r => (r.getString(0), r.getString(4)) -> (r.getLong(5), r.getLong(6))).toMap
    assert(out(("s1", "connection timed out after ms to endpoint")) === (18L, 3L))
    assert(out(("s1", "invalid api key provided for destination")) === (8L, 2L))
    assert(out(("s1", "rate limit exceeded retry later please")) === (6L, 2L))
    assert(out(("s1", "RedactedError")) === (9L, 2L))
    assert(out(("s2", "warehouse load failed due to schema mismatch")) === (10L, 2L))
    assert(out.size === 5)
  }
}
