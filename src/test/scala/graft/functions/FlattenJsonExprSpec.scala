package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The native Catalyst FlattenJsonExpr must agree with the reference
  * Scala implementation on the full nested corpus, and must appear
  * inside a WholeStageCodegen span (no stage break at the flatten).
  */
class FlattenJsonExprSpec extends SparkSpec {

  private val corpus = Seq(
    """{"a":1,"b":{"c":2.5,"d":{"e":"x","f":{"deep":true}}},"empty":"","arr":[1,2,3]}""",
    """{"t":"2024-03-05T10:11:12Z","d":"2024-03-05","n":"not a date","num":"123"}""",
    """{"i":42,"f":4.51,"g":2.0,"big":10000000000000000,"neg":-3.5,"zero":0.0}""",
    """{"b1":true,"b2":false,"mix":{"":"skipme","ok":1},"nul":null}""",
    """{"":9,"only":"kept"}""",
    """{"l1":{"l2":{"l3":{"l4":1},"x":"y"}}}""",
    """{broken""",
    """[1,2]""")

  test("native expression == Scala flatten on the nested corpus") {
    val sess = spark
    import sess.implicits._
    FlattenJsonExpr.register(spark)
    val got = corpus.toDF("js")
      .select(col("js"), expr("flatten_json_native(js)").as("m"))
      .collect()
      .map(r => r.getString(0) -> r.getMap[String, String](1).toMap).toMap
    corpus.foreach { js =>
      assert(got(js) === JsonFlatten.flatten(js), s"for $js")
    }
  }

  test("GraftExtensions injection point applies cleanly") {
    val ext = new org.apache.spark.sql.SparkSessionExtensions
    new graft.GraftExtensions().apply(ext) // builder-time injection path
  }

  test("null input yields null map") {
    val sess = spark
    import sess.implicits._
    FlattenJsonExpr.register(spark)
    val r = Seq(Option.empty[String]).toDF("js")
      .select(expr("flatten_json_native(js)")).collect()(0)
    assert(r.isNullAt(0))
  }

  test("flatten stays inside a WholeStageCodegen span") {
    FlattenJsonExpr.register(spark)
    val df = spark.range(10)
      .selectExpr("""flatten_json_native(concat('{"a":', id, '}')) AS m""")
    val plan = df.queryExecution.executedPlan.toString
    // the Project carrying the flatten must be codegen'd (starred)
    assert("""\*\(\d+\) Project \[flatten_json_native""".r.findFirstIn(plan).isDefined, plan)
    assert(df.selectExpr("m['a']").collect().map(_.getString(0)).toSet
      === (0 until 10).map(_.toString).toSet)
  }
}
