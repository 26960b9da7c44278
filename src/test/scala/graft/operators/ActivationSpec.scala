package graft.operators

import graft.SparkSpec

/** Activation-records semantics: grain merge with first-origin-wins,
  * 256-rune truncation, case-insensitive rETL category classification,
  * and the fail-closed skip ledger (records_reporter.go:139-227).
  */
class ActivationSpec extends SparkSpec {

  test("ar1: grains merge across jobs, first origin wins, truncation at 256") {
    val rows = Activation.defs("ar1_activation_records")(spark, "")
      .collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2),
        r.getString(3), r.getLong(4)))
    assert(rows.length === 3)
    val byGrain = rows.map(r => (r._1, r._2, r._3) -> ((r._4, r._5))).toMap
    // jobs 1, 2 and 10 share the grain; distinct fingerprints f1..f5;
    // job 1 created the accumulator so its origin sticks
    val (o1, n1) = byGrain(("ws1", "src_retl", "d1"))
    assert(o1 === "salesforce")
    assert(n1 === 5L) // linear-counting range: estimate is exact
    // 300-rune origin lands truncated to exactly 256
    val (o2, _) = byGrain(("ws1", "src_retl2", "d2"))
    assert(o2 === "o" * 256)
    // "WAREHOUSE" category classifies as rETL case-insensitively
    val (_, n3) = byGrain(("ws2", "src_retl_ci", "d3"))
    assert(n3 === 2L)
  }

  test("ar2: every stat-tracked skip class appears once; non-rETL skips stay silent") {
    val skips = Activation.defs("ar2_activation_skips")(spark, "")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(skips === Map(
      "missing_workspace" -> 1L, "missing_destination" -> 1L,
      "missing_batch" -> 1L, "invalid_batch" -> 1L,
      "missing_fingerprint" -> 1L, "missing_origin" -> 1L,
      "origin_truncated" -> 1L))
  }
}
