package graft

/** Every SparkEntry query must plan and execute on the smallest scale
  * factor — catches regressions in operators whose oracle check only
  * runs in the driver harness, and guarantees the driver's smoke
  * contract (entry rows > 0) locally.
  */
class QueriesSmokeSpec extends SparkSpec {

  private val sfDir = "/root/testdata/sf0.001"

  test("entry returns rows") {
    assume(new java.io.File(sfDir).exists())
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every query in the oracle map has a definition") {
    val missing = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(missing.isEmpty, s"oracle SQL without a query: $missing")
  }

  for (name <- SparkEntry.queries.keys.toSeq.sorted)
    test(s"$name executes at sf0.001") {
      assume(new java.io.File(sfDir).exists())
      val df = SparkEntry.queries(name)(spark, sfDir)
      assert(df.columns.nonEmpty)
      assert(df.count() >= 0) // executes without throwing
    }
}
