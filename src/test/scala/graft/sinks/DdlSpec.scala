package graft.sinks

import graft.SparkSpec
import org.apache.spark.sql.types.LongType

/** L11 as an executor: the schema diff drives real catalog DDL —
  * tables are created from the first staging schema, then evolved
  * (ADD COLUMNS + text-upgrade property) by the next diff, and the
  * evolved table stays writable.
  */
class DdlSpec extends SparkSpec {

  test("schema diff executes as catalog DDL: create, evolve, string→text upgrade") {
    val sess = spark
    import sess.implicits._
    val db = "graft_ddl_spec"

    // round 1: empty warehouse — the whole first staging schema is adds
    val v1 = Seq(
      ("tracks", "id", "string", "add"), ("tracks", "event", "string", "add"),
      ("tracks", "bio", "string", "add"), ("users", "id", "string", "add"))
      .toDF("table_name", "column_name", "column_type", "action")
    val s1 = Ddl.applySchemaDiff(spark, db, v1)
    assert(spark.catalog.tableExists(s"$db.tracks"))
    assert(spark.catalog.tableExists(s"$db.users"))
    assert(spark.table(s"$db.tracks").columns.toSet === Set("id", "event", "bio"))
    assert(s1.exists(_.startsWith(s"CREATE TABLE $db.tracks")))

    // round 2: apply the ACTUAL l11_schema_diff operator output
    // (staging adds tracks.plan / users.age, upgrades tracks.bio→text)
    val diff = graft.SparkEntry.queries("l11_schema_diff")(spark, "")
    val s2 = Ddl.applySchemaDiff(spark, db, diff)
    assert(spark.table(s"$db.tracks").columns.toSet === Set("id", "event", "bio", "plan"))
    assert(spark.table(s"$db.users").columns.toSet === Set("id", "age"))
    assert(spark.table(s"$db.users").schema("age").dataType === LongType)
    assert(s2.exists(_.startsWith(s"ALTER TABLE $db.tracks ADD COLUMNS")))

    // the string→text upgrade is recorded as a table property
    // (physically STRING on Spark, like the reference's Redshift
    // VARCHAR→TEXT distinction lives in its schema registry)
    val props = spark.sql(s"SHOW TBLPROPERTIES $db.tracks")
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(props.get("graft.coltype.bio") === Some("text"))

    // the evolved table is live: insert + read back through the catalog
    spark.sql(s"INSERT INTO $db.tracks VALUES ('i1', 'ev', 'b', 'p')")
    assert(spark.table(s"$db.tracks").count() === 1)
    assert(spark.table(s"$db.tracks").select("plan").first().getString(0) === "p")
  }
}
