package graft.sinks

import java.sql.DriverManager

import graft.SparkSpec
import graft.sources.Readers
import org.apache.spark.sql.functions._

/** Real JDBC warehouse I/O against embedded Derby (ships with Spark):
  * the reverse-ETL read path (L12) with predicate pushdown into the
  * remote WHERE clause, the DDL-diff execution path (L11) issuing
  * CREATE/ALTER over a live connection, and the load path (L5/L6)
  * writing through Spark's JDBC sink and reading back. Production
  * swaps the Derby url for postgres/snowflake — plans are identical.
  */
class JdbcSpec extends SparkSpec {

  test("L12: reverse-ETL source reads a JDBC warehouse, predicate pushed down") {
    val url = "jdbc:derby:memory:graft_retl;create=true"
    val conn = DriverManager.getConnection(url)
    try {
      val st = conn.createStatement()
      st.execute("CREATE TABLE contacts (id BIGINT, email VARCHAR(64), score DOUBLE)")
      (1 to 5).foreach(i =>
        st.execute(s"INSERT INTO contacts VALUES ($i, 'u$i@x.io', ${i * 1.5})"))
    } finally conn.close()
    val df = Readers.jdbcTable(spark, url, "contacts").filter(col("ID") >= 3)
    assert(df.count() === 3)
    assert(df.agg(sum(col("SCORE"))).first().getDouble(0) === (3 + 4 + 5) * 1.5)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters") && plan.contains("GreaterThanOrEqual"),
      s"the >= predicate must reach the remote WHERE clause: $plan")
  }

  test("L11+L5: DDL diff executes over JDBC, then Spark loads and reads back") {
    val sess = spark
    import sess.implicits._
    val url = "jdbc:derby:memory:graft_ddl;create=true"
    // round 1: empty warehouse — CREATE from the staging schema
    val v1 = Seq(
      ("tracks", "id", "string", "add"), ("tracks", "event", "string", "add"),
      ("tracks", "n", "int", "add"))
      .toDF("table_name", "column_name", "column_type", "action")
    val s1 = Ddl.applySchemaDiffJdbc(url, v1)
    assert(s1.exists(_.startsWith("CREATE TABLE tracks")))
    // load through Spark's JDBC sink (the L5 load-file → warehouse hop)
    Seq(("m1", "click", 1L), ("m2", "view", 2L))
      .toDF("id", "event", "n")
      .write.mode("append").format("jdbc")
      .option("url", url).option("dbtable", "tracks").save()
    // round 2: schema grows — ALTER ADD COLUMN over the live connection
    val v2 = Seq(("tracks", "plan", "string", "add"))
      .toDF("table_name", "column_name", "column_type", "action")
    val s2 = Ddl.applySchemaDiffJdbc(url, v2)
    assert(s2 === Seq("ALTER TABLE tracks ADD COLUMN plan VARCHAR(512)"))
    Seq(("m3", "click", 3L, "pro"))
      .toDF("id", "event", "n", "plan")
      .write.mode("append").format("jdbc")
      .option("url", url).option("dbtable", "tracks").save()
    val back = Readers.jdbcTable(spark, url, "tracks")
    assert(back.count() === 3)
    assert(back.columns.map(_.toLowerCase).toSet === Set("id", "event", "n", "plan"))
    // pre-evolution rows read back with null in the new column
    assert(back.filter(col("ID") === "m1").select("PLAN").first().isNullAt(0))
    assert(back.filter(col("ID") === "m3").select("PLAN").first().getString(0) === "pro")
    // round 3: string→text upgrade — the column physically widens AND
    // the logical type lands in the graft_column_types registry
    val v3 = Seq(("tracks", "plan", "text", "alter_to_text"))
      .toDF("table_name", "column_name", "column_type", "action")
    val s3 = Ddl.applySchemaDiffJdbc(url, v3)
    assert(s3.head === "ALTER TABLE tracks ALTER COLUMN plan SET DATA TYPE VARCHAR(32672)")
    assert(Ddl.jdbcColumnTypes(url) === Map(("tracks", "plan") -> "text"))
    // the reason the upgrade exists: a >512-char value now loads
    val longPlan = "p" * 600
    Seq(("m4", "click", 4L, longPlan))
      .toDF("id", "event", "n", "plan")
      .write.mode("append").format("jdbc")
      .option("url", url).option("dbtable", "tracks").save()
    assert(Readers.jdbcTable(spark, url, "tracks")
      .filter(col("ID") === "m4").select("PLAN").first().getString(0) === longPlan)
    // upgrades are idempotent in the registry (re-apply = same row)
    Ddl.applySchemaDiffJdbc(url, v3)
    assert(Ddl.jdbcColumnTypes(url) === Map(("tracks", "plan") -> "text"))
  }

  test("L11 JDBC: alter-only diff for a missing table refuses up front") {
    val sess = spark
    import sess.implicits._
    val url = "jdbc:derby:memory:graft_ddl_validate;create=true"
    val good = Seq(("t_ok", "id", "string", "add"))
      .toDF("table_name", "column_name", "column_type", "action")
    val bad = good.union(Seq(("t_missing", "c", "text", "alter_to_text"))
      .toDF("table_name", "column_name", "column_type", "action"))
    val e = intercept[IllegalArgumentException](Ddl.applySchemaDiffJdbc(url, bad))
    assert(e.getMessage.contains("t_missing"))
    // nothing from the refused diff may have executed — not even the
    // valid t_ok CREATE that sorts before the bad entry
    val conn = DriverManager.getConnection(url)
    try {
      val rs = conn.getMetaData.getTables(null, null, "T_OK", null)
      try assert(!rs.next(), "refused diff must execute no statement") finally rs.close()
    } finally conn.close()
    // column-level refusals: an upgrade naming a missing column, or a
    // column whose physical type cannot widen in place, refuses up
    // front instead of throwing mid-apply
    Ddl.applySchemaDiffJdbc(url,
      Seq(("t_cols", "s", "string", "add"), ("t_cols", "big", "text", "add"))
        .toDF("table_name", "column_name", "column_type", "action"))
    val missingCol = Seq(("t_ok2", "id", "string", "add"),
      ("t_cols", "nope", "text", "alter_to_text"))
      .toDF("table_name", "column_name", "column_type", "action")
    val e2 = intercept[IllegalArgumentException](Ddl.applySchemaDiffJdbc(url, missingCol))
    assert(e2.getMessage.contains("does not exist"))
    val unwidenable = Seq(("t_cols", "big", "text", "alter_to_text"))
      .toDF("table_name", "column_name", "column_type", "action")
    val e3 = intercept[IllegalArgumentException](Ddl.applySchemaDiffJdbc(url, unwidenable))
    assert(e3.getMessage.contains("cannot widen in place"))
  }
}
