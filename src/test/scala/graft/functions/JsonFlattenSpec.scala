package graft.functions

import org.scalatest.funsuite.AnyFunSuite

/** Golden corpus for the recursive flatten + type inference —
  * reference semantics: set.go:15-156 (walk), datatype.go:11-103
  * (inference). Pure functions, no Spark session needed.
  */
class JsonFlattenSpec extends AnyFunSuite {

  test("flat object") {
    assert(JsonFlatten.flatten("""{"a":1,"b":"x"}""") === Map("a" -> "1", "b" -> "x"))
  }

  test("nested objects get underscore-joined prefixes") {
    assert(JsonFlatten.flatten("""{"a":{"b":{"c":1}}}""") === Map("a_b_c" -> "1"))
  }

  test("depth cap: objects at depth 3 pass through as JSON strings") {
    val m = JsonFlatten.flatten("""{"l1":{"l2":{"l3":{"l4":1},"x":"y"}}}""")
    assert(m === Map("l1_l2_l3" -> """{"l4":1}""", "l1_l2_x" -> "y"))
  }

  test("arrays pass through as JSON strings at any depth") {
    assert(JsonFlatten.flatten("""{"arr":[1,2,3],"n":{"a":[true]}}""") ===
      Map("arr" -> "[1,2,3]", "n_a" -> "[true]"))
  }

  test("empty keys are skipped at every level, null values dropped") {
    val m = JsonFlatten.flatten("""{"":1,"a":{"":2,"ok":3},"nul":null}""")
    assert(m === Map("a_ok" -> "3"))
  }

  test("malformed JSON and non-object roots yield empty maps") {
    assert(JsonFlatten.flatten("{oops") === Map.empty)
    assert(JsonFlatten.flatten("[1,2]") === Map.empty)
    assert(JsonFlatten.flatten("42") === Map.empty)
    assert(JsonFlatten.flatten(null) === null)
  }

  test("deeper cap flattens further") {
    assert(JsonFlatten.flatten("""{"l1":{"l2":{"l3":{"l4":1}}}}""", maxDepth = 4) ===
      Map("l1_l2_l3_l4" -> "1"))
  }

  private def types(js: String) = JsonFlatten.flattenTypes(js)

  test("type inference: six warehouse types") {
    val m = types(
      """{"i":5,"f":2.5,"b":true,"s":"hi","t":"2024-03-05T10:11:12Z","j":[1],"o":{"x":{"y":{"z":1}}}}""")
    assert(m("i") === "int")
    assert(m("f") === "float")
    assert(m("b") === "boolean")
    assert(m("s") === "string")
    assert(m("t") === "datetime")
    assert(m("j") === "json")
    assert(m("o_x_y") === "json") // depth-capped object
  }

  test("integral floats reclassify as int with no magnitude cap (getFloatType)") {
    assert(types("""{"a":2.0}""")("a") === "int")
    assert(types("""{"a":1e16}""")("a") === "int")
    assert(types("""{"a":-3.0}""")("a") === "int")
    assert(types("""{"a":0.1}""")("a") === "float")
  }

  test("datetime shapes: date-only, space and T separators, offsets") {
    for (v <- Seq("2024-01-02", "2024-01-02 03:04", "2024-01-02T03:04:05",
      "2024-01-02T03:04:05.123Z", "2024-01-02T03:04:05+05:30"))
      assert(types(s"""{"a":"$v"}""")("a") === "datetime", s"for $v")
    for (v <- Seq("2024-13-02x", "not a date", "20240102", "2024-01-02garbage"))
      assert(types(s"""{"a":"$v"}""")("a") === "string", s"for $v")
  }

  test("redshift text override: strings over 512 UTF-16 units") {
    val long = "x" * 513
    assert(JsonFlatten.flattenTypes(s"""{"a":"$long"}""", redshiftText = true)("a") === "text")
    assert(JsonFlatten.flattenTypes(s"""{"a":"$long"}""")("a") === "string")
    val exactly = "x" * 512
    assert(JsonFlatten.flattenTypes(s"""{"a":"$exactly"}""", redshiftText = true)("a") === "string")
  }
}
