package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class AsOfNativeSpec extends SparkSpec {

  test("native as-of join: tiny fixture matches hand semantics") {
    val sess = spark
    import sess.implicits._
    val ev = Seq((1L, 10L, 100L), (1L, 20L, 101L), (2L, 5L, 102L), (3L, 7L, 103L))
      .toDF("k", "t", "event_id")
    val ord = Seq((1L, 10L, 900L), (1L, 15L, 901L), (2L, 6L, 902L))
      .toDF("rk", "rt", "okey")
    val out = graft.plans.AsOfJoins.asof(ev, ord)
      .select(col("event_id"), col("okey"))
      .collect().map(r => r.getLong(0) -> (if (r.isNullAt(1)) -1L else r.getLong(1)))
      .toMap
    assert(out === Map(100L -> 900L, 101L -> 901L, 102L -> -1L, 103L -> -1L))
  }

  test("native as-of join equals the union-trick window formulation on real data") {
    val sfDir = "/root/testdata/sf0.001"
    assume(new java.io.File(sfDir).exists())
    def key(r: org.apache.spark.sql.Row) =
      (r.getLong(0), r.getLong(1), r.getLong(2),
        if (r.isNullAt(3)) -1L else r.getLong(3),
        if (r.isNullAt(4)) -1.0 else r.getDouble(4))
    val native = graft.SparkEntry.queries("q17b_asof_native")(spark, sfDir)
      .collect().map(key).toSet
    val union = graft.SparkEntry.queries("q17_asof_join")(spark, sfDir)
      .collect().map(key).toSet
    assert(native === union)
  }
}
