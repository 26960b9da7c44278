package graft.operators

import graft.SparkSpec

/** The FIXTURES.md §4 coercion matrix, asserted cell by cell against
  * the l4b operator output (HandleSchemaChange semantics,
  * warehouse/slave/worker.go:637-696).
  */
class CoercionSpec extends SparkSpec {

  private lazy val rows: Map[Long, (String, String, String)] =
    Coercion.defs("l4b_coercion_matrix")(spark, "unused")
      .collect()
      .map(r => r.getLong(0) -> ((r.getString(3), r.getString(4), r.getString(5))))
      .toMap

  private def loaded(id: Long, expected: String): Unit = {
    val (status, value, reason) = rows(id)
    assert(status === "loaded", s"row $id")
    assert(value === expected, s"row $id")
    assert(reason === null, s"row $id")
  }

  private def discarded(id: Long, reasonContains: String): Unit = {
    val (status, value, reason) = rows(id)
    assert(status === "discarded", s"row $id")
    assert(value === null, s"row $id")
    assert(reason.contains(reasonContains), s"row $id: $reason")
  }

  test("string <- float/int/boolean stringifies with Go %v semantics") {
    loaded(1, "49.99"); loaded(2, "5"); loaded(3, "true")
    loaded(17, "5") // float 5.0 renders without the decimal point
  }

  test("float <- int widens; int <- float truncates toward zero") {
    loaded(4, "5.0"); loaded(5, "5"); loaded(6, "-5"); loaded(18, "7")
  }

  test("json <- scalars render, arrays pass, strings get quoted") {
    loaded(7, "7"); loaded(8, "true"); loaded(9, "\"x\"")
    loaded(10, "[1,2]"); loaded(16, "2.5")
  }

  test("text <- datetime stringifies") {
    loaded(15, "2024-01-01")
  }

  test("incompatible conversions route to discards with the Go error text") {
    discarded(11, "from datetime to string")
    discarded(12, "from int to string")
    discarded(13, "from int to boolean")
    discarded(14, "from float to boolean")
  }
}
