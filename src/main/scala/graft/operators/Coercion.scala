package graft.operators

import graft.Q
import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** L4 load-file coercion: the full HandleSchemaChange matrix
  * (warehouse/slave/worker.go:637-696) as declarative when/otherwise
  * casts, with incompatible values routed to a `rudder_discards`-shaped
  * side-output (discards schema warehouse/utils/utils.go:176-184)
  * instead of silently dropped.
  *
  * Matrix (existing ← inferred):
  *   - string/text ← non-(string|text|json): stringify with Go `%v`
  *     semantics (integral floats render without the decimal point)
  *   - string/text ← string/text/json: pass through
  *   - float ← int/bigint: widen to double
  *   - int/bigint ← float: truncate toward zero (Go int(float64))
  *   - json ← int/float/boolean: render as text; json ← array: pass;
  *     json ← other: strconv.Quote
  *   - anything else: error → discard with the Go error string
  *
  * One narrow projection — at 100 TB this fuses into the load-file
  * scan; the discards side-output is the same scan filtered on
  * status, no second pass.
  */
object Coercion {

  /** (row_id, table, column, existing_type, inferred_type, raw). */
  private val fixture: Seq[(Long, String, String, String, String, String)] = Seq(
    (1L, "tracks", "amount", "string", "float", "49.99"),
    (2L, "tracks", "amount", "string", "int", "5"),
    (3L, "tracks", "flag", "string", "boolean", "true"),
    (4L, "tracks", "price", "float", "int", "5"),
    (5L, "tracks", "qty", "int", "float", "5.9"),
    (6L, "tracks", "qty", "int", "float", "-5.9"),
    (7L, "tracks", "meta", "json", "int", "7"),
    (8L, "tracks", "meta", "json", "boolean", "true"),
    (9L, "tracks", "meta", "json", "string", "x"),
    (10L, "tracks", "meta", "json", "array", "[1,2]"),
    (11L, "tracks", "ts", "datetime", "string", "not-a-date"),
    (12L, "tracks", "n", "int", "string", "abc"),
    (13L, "tracks", "n", "int", "boolean", "true"),
    (14L, "users", "age", "float", "boolean", "false"),
    (15L, "tracks", "s", "text", "datetime", "2024-01-01"),
    (16L, "tracks", "j", "json", "float", "2.5"),
    (17L, "tracks", "s2", "string", "float", "5.0"),
    (18L, "tracks", "b", "bigint", "float", "7.2"))

  private val fixtureSql: String = fixture.map { case (id, t, c, e, i, r) =>
    s"($id, '$t', '$c', '$e', '$i', '$r')"
  }.mkString("(VALUES ", ", ", ")")

  private val matrixDefs: Map[String, Q] = Map(
    "l4b_coercion_matrix" -> ((s, dir) => {
      val sess = s
      import sess.implicits._
      val df = fixture.toDF(
        "row_id", "table_name", "column_name", "existing_type", "inferred_type", "raw")
      val ex = col("existing_type")
      val in = col("inferred_type")
      val raw = col("raw")
      val d = raw.cast("double")
      // Go %v of a float64: integral values render without ".0"
      val goFloatStr = when(d === d.cast("long").cast("double"),
        d.cast("long").cast("string")).otherwise(raw)
      val stringLike = ex.isin("string", "text")
      val intLike = ex.isin("int", "bigint")
      val loaded: Column =
        when(stringLike && in.isin("string", "text", "json"), raw)
          .when(stringLike && in === "float", goFloatStr)
          .when(stringLike, raw) // int/boolean/datetime %v = raw form
          .when(ex === "float" && in.isin("int", "bigint"),
            d.cast("double").cast("string"))
          .when(intLike && in === "float",
            d.cast("long").cast("string")) // Spark double→long truncates toward 0
          .when(ex === "json" && in.isin("int", "float", "boolean"), raw)
          .when(ex === "json" && in === "array", raw)
          .when(ex === "json", concat(lit("\""), raw, lit("\"")))
      df.withColumn("loaded_value", loaded)
        .withColumn("status",
          when(col("loaded_value").isNull, lit("discarded")).otherwise(lit("loaded")))
        .withColumn("reason",
          when(col("loaded_value").isNull,
            concat(lit("incompatible schema conversion from "), ex, lit(" to "), in)))
        .select(col("row_id"), col("table_name"), col("column_name"),
          col("status"), col("loaded_value"), col("reason"))
    })
  )

  /** Datetime-shaped strings for the convertValIfDateTime path. */
  private val dtFixture: Seq[(Long, String)] = Seq(
    (1L, "2024-03-05T10:11:12Z"),
    (2L, "2024-03-05 10:11:12"),
    (3L, "2024-03-05"),
    (4L, "2024-03-05T10:11:12.500Z"),
    (5L, "2024-03-05T10:11:12+05:30"),
    (6L, "not a date"))

  private val dtSql = dtFixture.map { case (id, v) => s"($id, '$v')" }
    .mkString("(VALUES ", ", ", ")")

  private val dtDefs: Map[String, Q] = Map(
    // W5 convertValIfDateTime (datatype.go:98-103): values inferred as
    // datetime are normalized to a canonical instant on load. Output
    // as unix micros so timezone rendering can't diverge; unparseable
    // values stay strings (type inference already routed them).
    "l4c_datetime_convert" -> ((s, dir) => {
      val sess = s
      import sess.implicits._
      dtFixture.toDF("id", "raw")
        // canonicalize the Zulu suffix: strptime-style parsers take
        // numeric offsets only (mirrored in the oracle)
        .withColumn("norm", regexp_replace(col("raw"), "Z$", "+00:00"))
        .withColumn("parsed_us", unix_micros(coalesce(
          try_to_timestamp(col("norm"), lit("yyyy-MM-dd'T'HH:mm:ss.SSSXXX")),
          try_to_timestamp(col("norm"), lit("yyyy-MM-dd'T'HH:mm:ssXXX")),
          try_to_timestamp(col("norm"), lit("yyyy-MM-dd HH:mm:ss")),
          try_to_timestamp(col("norm"), lit("yyyy-MM-dd")))))
        .withColumn("status",
          when(col("parsed_us").isNotNull, lit("datetime")).otherwise(lit("string")))
        .select(col("id"), col("parsed_us"), col("status"))
    })
  )

  val defs: Map[String, Q] = matrixDefs ++ dtDefs

  val oracles: Map[String, String] = Map(
    "l4c_datetime_convert" ->
      s"""SELECT id,
            epoch_us(COALESCE(
              try_strptime(norm, '%Y-%m-%dT%H:%M:%S.%g%z'),
              try_strptime(norm, '%Y-%m-%dT%H:%M:%S%z'),
              try_strptime(norm, '%Y-%m-%d %H:%M:%S'),
              try_strptime(norm, '%Y-%m-%d'))) AS parsed_us,
            CASE WHEN COALESCE(
              try_strptime(norm, '%Y-%m-%dT%H:%M:%S.%g%z'),
              try_strptime(norm, '%Y-%m-%dT%H:%M:%S%z'),
              try_strptime(norm, '%Y-%m-%d %H:%M:%S'),
              try_strptime(norm, '%Y-%m-%d')) IS NOT NULL
                 THEN 'datetime' ELSE 'string' END AS status
          FROM (SELECT id, regexp_replace(raw, 'Z$$', '+00:00') AS norm
                FROM $dtSql AS f(id, raw))""",
    "l4b_coercion_matrix" ->
      s"""WITH f(row_id, table_name, column_name, existing_type, inferred_type, raw) AS $fixtureSql,
          c AS (
            SELECT *,
              CASE
                WHEN existing_type IN ('string', 'text') AND inferred_type IN ('string', 'text', 'json')
                  THEN raw
                WHEN existing_type IN ('string', 'text') AND inferred_type = 'float'
                  THEN (CASE WHEN CAST(raw AS DOUBLE) = trunc(CAST(raw AS DOUBLE))
                             THEN CAST(CAST(trunc(CAST(raw AS DOUBLE)) AS BIGINT) AS VARCHAR)
                             ELSE raw END)
                WHEN existing_type IN ('string', 'text') THEN raw
                WHEN existing_type = 'float' AND inferred_type IN ('int', 'bigint')
                  THEN CAST(CAST(raw AS DOUBLE) AS VARCHAR)
                WHEN existing_type IN ('int', 'bigint') AND inferred_type = 'float'
                  THEN CAST(CAST(trunc(CAST(raw AS DOUBLE)) AS BIGINT) AS VARCHAR)
                WHEN existing_type = 'json' AND inferred_type IN ('int', 'float', 'boolean')
                  THEN raw
                WHEN existing_type = 'json' AND inferred_type = 'array' THEN raw
                WHEN existing_type = 'json' THEN '"' || raw || '"'
              END AS loaded_value
            FROM f)
          SELECT row_id, table_name, column_name,
            CASE WHEN loaded_value IS NULL THEN 'discarded' ELSE 'loaded' END AS status,
            loaded_value,
            CASE WHEN loaded_value IS NULL
              THEN 'incompatible schema conversion from ' || existing_type || ' to ' || inferred_type
            END AS reason
          FROM c"""
  )
}
