package graft

class CatalogSpec extends SparkSpec {

  test("register exposes tables and functions for plain SQL") {
    assume(new java.io.File("/root/testdata/sf0.001").exists())
    Catalog.register(spark, "/root/testdata/sf0.001")
    val rows = spark.sql(
      """SELECT safe_name_native(event_type) AS t,
                count(*) AS n,
                count(distinct flatten_json_native(props)['k']) AS vals
         FROM events GROUP BY 1""").collect()
    assert(rows.nonEmpty)
    assert(rows.forall(_.getLong(1) > 0))
    assert(spark.sql("SELECT count(*) FROM lineitem").first().getLong(0) > 0)
  }
}
