package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The native vector kernels replace `aggregate(zip_with(...))` folds
  * inside every ANN/dedup/clustering query, whose DuckDB oracles
  * replay the fold as list_sum — so the two forms must agree
  * BIT-FOR-BIT, not approximately.
  */
class VectorExprsSpec extends SparkSpec {
  import spark.implicits._

  VectorExprs.register(spark)

  private val rnd = new scala.util.Random(7)
  private val vecs = (1 to 200).map { i =>
    (i.toLong,
      Seq.fill(64)(rnd.nextFloat() * 2f - 1f),
      Seq.fill(64)(rnd.nextFloat() * 2f - 1f))
  }

  test("dot_native == the zip_with fold bit-for-bit on float arrays") {
    val df = vecs.toDF("id", "a", "b")
      .withColumn("nat", expr("dot_native(a, b)"))
      .withColumn("hof", expr(
        "aggregate(zip_with(a, b, (x, y) -> CAST(x AS DOUBLE) * CAST(y AS DOUBLE)), CAST(0 AS DOUBLE), (acc, v) -> acc + v)"))
    df.collect().foreach { r =>
      assert(java.lang.Double.doubleToLongBits(r.getDouble(3)) ===
        java.lang.Double.doubleToLongBits(r.getDouble(4)), s"id ${r.getLong(0)}")
    }
  }

  test("dot_native handles the float-array x int-literal-array hyperplane shape") {
    val hv = (0 until 64).map(i => if (i % 3 == 0) 1 else -1)
    val df = vecs.toDF("id", "a", "b")
      .withColumn("nat", expr(s"dot_native(a, array(${hv.mkString(",")}))"))
      .withColumn("hof", expr(
        s"aggregate(zip_with(a, array(${hv.mkString(",")}), (x, y) -> CAST(x AS DOUBLE) * CAST(y AS DOUBLE)), CAST(0 AS DOUBLE), (acc, v) -> acc + v)"))
    df.collect().foreach { r =>
      assert(java.lang.Double.doubleToLongBits(r.getDouble(3)) ===
        java.lang.Double.doubleToLongBits(r.getDouble(4)), s"id ${r.getLong(0)}")
    }
  }

  test("sqdist_native == the integer zip_with fold exactly, long and mixed int arrays") {
    val ints = (1 to 200).map { i =>
      (i.toLong, Seq.fill(64)(rnd.nextInt(8001) - 4000L),
        Seq.fill(64)(rnd.nextInt(8001) - 4000L))
    }
    val df = ints.toDF("id", "a", "b")
      .withColumn("nat", expr("sqdist_native(a, b)"))
      .withColumn("hof", expr(
        "aggregate(zip_with(a, b, (x, y) -> (x - y) * (x - y)), CAST(0 AS BIGINT), (acc, v) -> acc + v)"))
      .withColumn("natLit", expr(s"sqdist_native(a, array(${(1 to 64).mkString(",")}))"))
      .withColumn("hofLit", expr(
        s"aggregate(zip_with(a, array(${(1 to 64).mkString(",")}), (x, y) -> (x - y) * (x - y)), CAST(0 AS BIGINT), (acc, v) -> acc + v)"))
    df.collect().foreach { r =>
      assert(r.getLong(3) === r.getLong(4), s"id ${r.getLong(0)}")
      assert(r.getLong(5) === r.getLong(6), s"lit id ${r.getLong(0)}")
    }
  }

  test("null array -> null; length mismatch -> null (the fold's null-pad poisoning)") {
    val df = Seq((Some(Seq(1f, 2f)), Some(Seq(1f, 2f, 3f))), (None, Some(Seq(1f))))
      .toDF("a", "b")
      .withColumn("d", expr("dot_native(a, b)"))
    assert(df.select("d").collect().forall(_.isNullAt(0)))
  }

  test("the kernels stay inside WholeStageCodegen (the point of going native)") {
    // a Range source so the projection actually plans (a local
    // relation would constant-fold to LocalTableScan)
    val df = spark.range(200).select(col("id"),
        expr("transform(sequence(1, 64), i -> CAST(pmod(id * i, 97) AS FLOAT))").as("a"),
        expr("transform(sequence(1, 64), i -> CAST(pmod(id + i, 89) AS FLOAT))").as("b"))
      .withColumn("d", expr("dot_native(a, b)"))
    val plan = df.queryExecution.executedPlan.toString
    // the '*' prefix marks a WholeStageCodegen stage; the projection
    // carrying dot_native must be inside one
    assert(plan.linesIterator.exists(l =>
      l.trim.matches("""\*\(\d+\) Project .*dot_native.*""")), plan)
    // the generated code must call the static kernel, not fall back
    val code = org.apache.spark.sql.execution.debug.codegenString(df.queryExecution.executedPlan)
    assert(code.contains("VectorExprs$.MODULE$.dot"),
      "generated code should call the native kernel")
  }
}
