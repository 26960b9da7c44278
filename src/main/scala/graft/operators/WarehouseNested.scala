package graft.operators

import graft.Q
import graft.functions.JsonFlatten
import org.apache.spark.sql.functions._

/** Warehouse flatten / type-inference / consolidation operators driven
  * by a gnarly inline nested-JSON fixture — the depth cap, array and
  * deep-object passthrough, empty-key skip, null skip, and all six
  * inferred types (int/float/boolean/datetime/string/json, plus the
  * Redshift `text` override) are exercised for real here, unlike the
  * single-key `props` of the generated events table.
  *
  * The DuckDB oracle is an independent implementation: a recursive CTE
  * over json_keys/json_extract (DuckDB renders extracted JSON minified
  * with shortest-round-trip doubles, exactly like Jackson's re-render,
  * so values are string-identical by construction, not by fixture
  * degeneracy).
  *
  * Reference: set.go:15-156 (flatten walk), datatype.go:11-103 (type
  * inference), transformer.go:251-277 (column guard),
  * warehouse/schema/schema.go:294-313 (consolidation precedence).
  */
object WarehouseNested {

  /** Inline fixture: minified JSON, key order preserved, values chosen
    * to be render-stable (no trailing-zero decimals beyond x.0, no
    * scientific notation). Mirrored verbatim in the oracle VALUES.
    */
  private val fixture: Seq[(Long, String)] = Seq(
    1L -> """{"a":1,"b":{"c":2.5,"d":{"e":"x","f":{"deep":true}}},"empty":"","arr":[1,2,3]}""",
    2L -> """{"t":"2024-03-05T10:11:12Z","d":"2024-03-05","n":"not a date","num":"123"}""",
    3L -> """{"i":42,"f":4.51,"g":2.0,"big":10000000000000000,"neg":-3.5,"zero":0.0}""",
    4L -> """{"b1":true,"b2":false,"mix":{"":"skipme","ok":1},"nul":null}""",
    5L -> """{"":9,"only":"kept"}""",
    6L -> """{"l1":{"l2":{"l3":{"l4":1},"x":"y"}}}""")

  private val fixtureSql: String =
    fixture.map { case (id, js) => s"($id, '${js.replace("'", "''")}')" }
      .mkString("(VALUES ", ", ", ")")

  /** Two staging "files" with per-key type conflicts for L3
    * consolidation: col_a string→text upgrade, col_b first-seen int
    * beats float, col_c first-seen datetime beats string.
    */
  private val stagingFixture: Seq[(Long, String)] = Seq(
    1L -> """{"col_a":"hello","col_b":1,"col_c":"2024-01-01"}""",
    2L -> ("""{"col_a":"""" + "y" * 600 + """","col_b":2.5,"col_c":"plain"}"""))

  private val stagingSql: String =
    s"""(VALUES (1, '{"col_a":"hello","col_b":1,"col_c":"2024-01-01"}'),
                (2, '{"col_a":"' || repeat('y', 600) || '","col_b":2.5,"col_c":"plain"}'))"""

  // recursive-CTE flatten shared by the oracle SQLs below
  private val flatCte =
    s"""fixture(id, js) AS $fixtureSql,
        flat AS (
          SELECT id, k AS path, json_extract(js, '$$."' || k || '"') AS v, 1 AS depth
          FROM (SELECT id, js, unnest(json_keys(js)) AS k FROM fixture)
          WHERE k <> ''
          UNION ALL
          SELECT id, path || '_' || k, json_extract(v, '$$."' || k || '"'), depth + 1
          FROM (SELECT id, path, v, depth, unnest(json_keys(v)) AS k FROM flat
                WHERE json_type(v) = 'OBJECT' AND depth < 3)
          WHERE k <> ''),
        leaves AS (
          SELECT id, path, v, depth FROM flat
          WHERE NOT (json_type(v) = 'OBJECT' AND depth < 3)
            AND json_type(v) <> 'NULL')"""

  private val timestampReSql =
    """^\d{4}-\d{2}-\d{2}([ T]\d{2}:\d{2}(:\d{2}(\.\d+)?)?(Z|[+-]\d{2}:?\d{2})?)?$"""

  /** DuckDB re-implementation of datatype.go inference over a leaf
    * json value `v` (mirrors JsonFlatten.inferType incl. integral-
    * float reclassification and optional text override).
    */
  private def typeSql(redshift: Boolean): String = {
    val textCase =
      if (redshift) s"CASE WHEN regexp_matches(json_extract_string(v, '$$'), '$timestampReSql') THEN 'datetime' WHEN length(json_extract_string(v, '$$')) > 512 THEN 'text' ELSE 'string' END"
      else s"CASE WHEN regexp_matches(json_extract_string(v, '$$'), '$timestampReSql') THEN 'datetime' ELSE 'string' END"
    s"""CASE json_type(v)
         WHEN 'BOOLEAN' THEN 'boolean'
         WHEN 'UBIGINT' THEN 'int'
         WHEN 'BIGINT' THEN 'int'
         WHEN 'DOUBLE' THEN (CASE WHEN CAST(v AS DOUBLE) = floor(CAST(v AS DOUBLE)) THEN 'int' ELSE 'float' END)
         WHEN 'VARCHAR' THEN $textCase
         ELSE 'json' END"""
  }

  val defs: Map[String, Q] = Map(

    // W2 on real nesting: recursion to the depth-3 cap, array and
    // too-deep-object JSON passthrough, empty-key and null skips.
    "w2b_flatten_nested" -> ((s, dir) => {
      val sess = s
      import sess.implicits._
      JsonFlatten.register(s)
      fixture.toDF("id", "js")
        .select(col("id"), explode(callUDF("flatten_json", col("js"))).as(Seq("key", "val")))
    }),

    // W5/E1 on real nesting: all six inferred types incl. integral-
    // float→int reclassification and datetime detection.
    "e1b_type_inference" -> ((s, dir) => {
      val sess = s
      import sess.implicits._
      JsonFlatten.register(s)
      fixture.toDF("id", "js")
        .select(col("id"), explode(callUDF("flatten_json_types", col("js"))).as(Seq("key", "type")))
    }),

    // L3 consolidation precedence: first-seen type wins per key except
    // text upgrades string (schema.go:294-313); text arises from the
    // Redshift >512-char rule.
    "l3b_consolidation_text" -> ((s, dir) => {
      val sess = s
      import sess.implicits._
      JsonFlatten.register(s)
      stagingFixture.toDF("file_id", "js")
        .select(col("file_id"),
          explode(callUDF("flatten_json_types_redshift", col("js"))).as(Seq("key", "type")))
        .groupBy(col("key"))
        .agg(expr("min_by(type, file_id)").as("first_type"),
          max(col("type") === "text").as("has_text"))
        .select(col("key"),
          when(col("first_type") === "string" && col("has_text"), lit("text"))
            .otherwise(col("first_type")).as("final_type"))
    }),

    // E1 caps: the schema forwarder truncates identifiers to 100
    // chars and drops events past 500 keys (schema-forwarder/internal/
    // transformer/transformer.go:35-36). The long-key fixture row
    // exercises the truncation; key counting exercises the guard.
    "e1c_schema_caps" -> ((s, dir) => {
      val sess = s
      import sess.implicits._
      JsonFlatten.register(s)
      val longKey = "k" * 120
      val capped = Seq(
        1L -> s"""{"$longKey":1,"ok":2}""",
        2L -> """{"a":{"b":{"c":"x"}}}""").toDF("id", "js")
      capped
        .select(col("id"), explode(callUDF("flatten_json_types", col("js"))).as(Seq("key", "type")))
        .select(col("id"),
          substring(col("key"), 1, 100).as("identifier"),
          length(col("key")).cast("long").as("raw_len"),
          col("type"))
    }),

    // W9 column guard with a real reject path: events flattening to
    // more than 4 columns are rejected (cap 1600 in the reference;
    // 4 here so the fixture exercises both branches).
    "w9b_column_guard_reject" -> ((s, dir) => {
      val sess = s
      import sess.implicits._
      JsonFlatten.register(s)
      fixture.toDF("id", "js")
        .select(col("id"),
          size(map_keys(callUDF("flatten_json", col("js")))).cast("long").as("n_cols"))
        .withColumn("status",
          when(col("n_cols") > 4, lit("rejected")).otherwise(lit("loaded")))
    })
  )

  val oracles: Map[String, String] = Map(
    "w2b_flatten_nested" ->
      s"""WITH RECURSIVE $flatCte
          SELECT id, path AS key,
            CASE WHEN json_type(v) IN ('OBJECT', 'ARRAY') THEN CAST(v AS VARCHAR)
                 ELSE json_extract_string(v, '$$') END AS val
          FROM leaves""",
    "e1b_type_inference" ->
      s"""WITH RECURSIVE $flatCte
          SELECT id, path AS key, ${typeSql(redshift = false)} AS type
          FROM leaves""",
    "l3b_consolidation_text" ->
      s"""WITH staging(file_id, js) AS $stagingSql,
          vals AS (
            SELECT file_id, k AS key, json_extract(js, '$$."' || k || '"') AS v
            FROM (SELECT file_id, js, unnest(json_keys(js)) AS k FROM staging)
            WHERE k <> ''),
          typed AS (
            SELECT file_id, key, ${typeSql(redshift = true)} AS type
            FROM vals WHERE json_type(v) <> 'NULL')
          SELECT key,
            CASE WHEN arg_min(type, file_id) = 'string' AND bool_or(type = 'text')
                 THEN 'text' ELSE arg_min(type, file_id) END AS final_type
          FROM typed GROUP BY key""",
    "e1c_schema_caps" -> {
      val longKey = "k" * 120
      s"""SELECT id, substr(k, 1, 100) AS identifier,
            CAST(length(k) AS BIGINT) AS raw_len,
            CASE WHEN k = 'a_b_c' THEN 'string' ELSE 'int' END AS type
          FROM (
            SELECT 1 AS id, unnest(['$longKey', 'ok']) AS k
            UNION ALL
            SELECT 2, 'a_b_c')"""
    },
    "w9b_column_guard_reject" ->
      s"""WITH RECURSIVE $flatCte
          SELECT id, COUNT(*) AS n_cols,
            CASE WHEN COUNT(*) > 4 THEN 'rejected' ELSE 'loaded' END AS status
          FROM leaves GROUP BY id"""
  )
}
