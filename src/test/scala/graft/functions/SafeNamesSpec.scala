package graft.functions

import org.scalatest.funsuite.AnyFunSuite

/** Table-driven cases mirroring the reference's safe_test.go /
  * internal/snakecase behavior (safe.go:33-277).
  */
class SafeNamesSpec extends AnyFunSuite {

  private val cases = Seq(
    "userId" -> "user_id",
    "camelCaseColumn" -> "camel_case_column",
    "HTMLParser" -> "html_parser",
    "XMLHttpRequest" -> "xml_http_request",
    "abc123" -> "abc_123",
    "v2Test" -> "v_2_test",
    "mixedUPPERCase" -> "mixed_upper_case",
    "UPPERCASE" -> "uppercase",
    "SCREAMING_SNAKE" -> "screaming_snake",
    "context.screen.density" -> "context_screen_density",
    "with  spaces" -> "with_spaces",
    "email-address" -> "email_address",
    "revenue($)" -> "revenue_",
    "1invalid" -> "_1_invalid",
    "42" -> "_42",
    "a" -> "a",
    "select" -> "_select",
    "group" -> "_group",
    "order" -> "_order",
    "Order Completed" -> "order_completed",
    "cartViewed" -> "cart_viewed",
    "sync_event" -> "sync_event")

  for ((in, out) <- cases)
    test(s"toSafeName($in) == $out") {
      assert(SafeNames.toSafeName(in) === out)
    }

  test("null passes through") {
    assert(SafeNames.toSafeName(null) === null)
  }

  test("table names cap at 127 chars") {
    val long = "a" * 300
    assert(SafeNames.toSafeTableName(long).length === 127)
  }

  test("underscoreDivideNumbers=false keeps letter-digit runs together") {
    assert(SafeNames.toSafeName("abc123", divideNumbers = false) === "abc123")
    assert(SafeNames.toSafeName("v2Test", divideNumbers = false) === "v2_test")
    assert(SafeNames.toSafeName("HTMLParser", divideNumbers = false) === "html_parser")
    assert(SafeNames.toSafeName("abc123", divideNumbers = true) === "abc_123")
  }

  test("provider pass: case rules, per-provider reserved words, length caps") {
    assert(SafeNames.safeNameFor("SNOWFLAKE", "event") === "EVENT")
    assert(SafeNames.safeNameFor("SNOWFLAKE", "qualify") === "_QUALIFY")
    assert(SafeNames.safeNameFor("POSTGRES", "qualify") === "qualify")
    assert(SafeNames.safeNameFor("POSTGRES", "ilike") === "_ilike")
    assert(SafeNames.safeNameFor("BQ", "range") === "_range")
    assert(SafeNames.safeNameFor("POSTGRES", "range") === "range")
    assert(SafeNames.safeNameFor("POSTGRES", "select") === "_select")
    // postgres truncates to its 63-byte identifier limit pre-lowercase
    assert(SafeNames.safeNameFor("POSTGRES", "A" * 70) === "a" * 63)
    // datalakes skip the 127 cap, warehouses apply it
    assert(SafeNames.safeNameFor("S3_DATALAKE", "b" * 140).length === 140)
    assert(SafeNames.safeNameFor("DELTALAKE", "b" * 140).length === 127)
  }
}
