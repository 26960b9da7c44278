package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

class NameExprsSpec extends SparkSpec {

  test("safe_name_native agrees with the Scala implementation") {
    val sess = spark
    import sess.implicits._
    NameExprs.register(spark)
    val inputs = Seq("userId", "HTMLParser", "abc123", "1invalid", "select",
      "Order Completed", "revenue($)", "")
    val got = inputs.toDF("raw")
      .selectExpr("raw", "safe_name_native(raw) AS safe")
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    inputs.foreach(i => assert(got(i) === SafeNames.toSafeName(i), s"for $i"))
  }

  test("utf16_length counts code units, not code points") {
    val sess = spark
    import sess.implicits._
    NameExprs.register(spark)
    val rows = Seq("abc", "éé", "a😀b") // é's; astral emoji = 2 units
      .toDF("s")
      .selectExpr("s", "utf16_length(s) AS u16", "length(s) AS codepoints")
      .collect().map(r => (r.getString(0), r.getInt(1), r.getInt(2)))
    val m = rows.map(r => r._1 -> (r._2, r._3)).toMap
    assert(m("abc") === ((3, 3)))
    assert(m("éé") === ((2, 2)))
    assert(m("a😀b") === ((4, 3)), "emoji counts 2 UTF-16 units but 1 code point")
  }

  test("both expressions stay inside whole-stage codegen") {
    NameExprs.register(spark)
    val plan = spark.range(5)
      .selectExpr("safe_name_native(concat('Key', id)) AS s",
        "utf16_length(cast(id AS STRING)) AS l")
      .queryExecution.executedPlan.toString
    assert("""\*\(\d+\) Project \[safe_name_native""".r.findFirstIn(plan).isDefined, plan)
  }
}
