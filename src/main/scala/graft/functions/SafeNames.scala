package graft.functions

import org.apache.spark.sql.SparkSession

/** Warehouse-safe identifier mangling, re-expressing the semantics of
  * the reference's safe-name rules (reference: processor/internal/
  * transformer/destination_transformer/embedded/warehouse/safe.go:33-277
  * and internal/snakecase/): snake_case conversion, digit-start
  * prefixing, reserved-word escaping.
  *
  * Pure string functions so they can run inside codegen'd expressions
  * (registered as a UDF) and be mirrored exactly by the DuckDB oracle's
  * regexp chain.
  */
object SafeNames {

  /** Reserved words that get a leading underscore (subset of the
    * reference's internal/reservedkeywords list common to warehouses).
    */
  val reserved: Set[String] = Set(
    "select", "from", "where", "group", "order", "by", "table", "column",
    "insert", "update", "delete", "join", "union", "all", "and", "or",
    "not", "null", "true", "false", "case", "when", "then", "else", "end",
    "user", "partition", "default", "primary", "key", "index", "view")

  /** camelCase / free-text → snake_case identifier, with the lodash
    * snakecase boundary rules the reference uses (internal/snakecase +
    * safe.go): "HTMLParser"→"html_parser", "abc123"→"abc_123",
    * "v2Test"→"v_2_test". Steps mirror the oracle SQL exactly:
    *   1. boundary between [a-z] and [A-Z]           (camelCase)
    *   2. boundary between ALLCAPS run and Word       (HTMLParser)
    *   3. boundary between letter and digit           (abc123)
    *   4. boundary between digit and letter           (2Test / 2test)
    *   5. non-alphanumeric runs → '_'
    *   6. lowercase
    *   7. digit-start → '_' prefix
    *   8. reserved word → '_' prefix
    */
  def toSafeName(raw: String): String = toSafeName(raw, divideNumbers = true)

  /** @param divideNumbers the reference's `underscoreDivideNumbers`
    *   destination option (safe.go transformTableName: snakecase.
    *   ToSnakeCase vs ToSnakeCaseWithNumbers): when false, letter↔digit
    *   boundaries do NOT split — "abc123" stays "abc123".
    */
  def toSafeName(raw: String, divideNumbers: Boolean): String = {
    if (raw == null) return null
    var s = raw.trim
    // when numbers don't divide, a digit still ends a lowercase run
    // before an uppercase boundary ("v2Test" -> v2_test)
    s = s.replaceAll(if (divideNumbers) "([a-z])([A-Z])" else "([a-z0-9])([A-Z])", "$1_$2")
    s = s.replaceAll("([A-Z]+)([A-Z][a-z])", "$1_$2")
    if (divideNumbers) {
      s = s.replaceAll("([A-Za-z])([0-9])", "$1_$2")
      s = s.replaceAll("([0-9])([A-Za-z])", "$1_$2")
    }
    s = s.replaceAll("[^a-zA-Z0-9]+", "_")
    s = s.toLowerCase
    if (s.nonEmpty && s.charAt(0).isDigit) s = "_" + s
    if (reserved.contains(s)) s = "_" + s
    s
  }

  /** Table name from an event name — same mangling, the reference also
    * caps length (safe.go name-length rules); we cap at 127.
    */
  def toSafeTableName(raw: String): String = {
    val s = toSafeName(raw)
    if (s != null && s.length > 127) s.substring(0, 127) else s
  }

  /** ANSI-core reserved words common to the per-provider lists
    * (internal/reservedkeywords/tablescolumns.json — full lists are
    * drop-in data; this carries the shared core).
    */
  private val ansiCore: Set[String] = reserved.map(_.toUpperCase)

  /** Provider-specific additions beyond the ANSI core (subset of the
    * reference's per-provider lists, enough to exercise divergence).
    */
  val providerExtra: Map[String, Set[String]] = Map(
    "POSTGRES" -> Set("ANALYZE", "FREEZE", "ILIKE", "LATERAL", "VERBOSE"),
    "SNOWFLAKE" -> Set("CONNECT", "GSCLUSTER", "ISSUE", "MINUS", "QUALIFY", "REGEXP"),
    "BQ" -> Set("ASSERT_ROWS_MODIFIED", "HASH", "RANGE", "STRUCT", "WINDOW"),
    "RS" -> Set("AES128", "BACKUP", "DELTA", "ENCODE", "GLOBALDICT256", "WALLET"),
    "S3_DATALAKE" -> Set("PREORDER", "OVERLAY"),
    "DELTALAKE" -> Set("ANTI", "SEMI", "MINUS"))

  private val datalakeProviders = Set("S3_DATALAKE", "GCS_DATALAKE", "AZURE_DATALAKE")

  /** Provider-aware final name pass — safe.go:140-157 `safeName`:
    * Snowflake uppercases; Postgres truncates to its 63-byte
    * identifier limit BEFORE lowercasing; everyone else lowercases;
    * reserved keywords (per-provider list) get a '_' prefix; datalake
    * providers skip the final 127 cap.
    */
  def safeNameFor(provider: String, name: String): String = {
    if (name == null) return null
    var s = provider match {
      case "SNOWFLAKE" => name.toUpperCase
      case "POSTGRES" => (if (name.length > 63) name.substring(0, 63) else name).toLowerCase
      case _ => name.toLowerCase
    }
    val words = ansiCore ++ providerExtra.getOrElse(provider, Set.empty)
    if (words.contains(s.toUpperCase)) s = "_" + s
    if (!datalakeProviders.contains(provider) && s.length > 127) s = s.substring(0, 127)
    s
  }

  def register(spark: SparkSession): Unit = {
    spark.udf.register("safe_name", (s: String) => toSafeName(s))
    spark.udf.register("safe_table_name", (s: String) => toSafeTableName(s))
    spark.udf.register("safe_name_for", (p: String, s: String) => safeNameFor(p, s))
    spark.udf.register("safe_name_nodivide",
      (s: String) => toSafeName(s, divideNumbers = false))
  }
}
