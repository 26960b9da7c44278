package graft.operators

import graft.Q
import graft.functions.{JsonFlatten, SafeNames}
import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Real W7 multi-table fan-out: canonical gateway events (track /
  * identify / page / screen / group / alias / extract) → actual typed
  * rows per canonical table with the per-event-type column rules —
  * not (table, count) pairs.
  *
  * Rules re-expressed from the reference (events.go:17-638,
  * internal/rules/rules.go:19-172):
  *   - defaults: id←messageId, anonymous_id, user_id,
  *     context_ip←firstValid(context.ip, request_ip), received_at
  *   - track → `tracks` row (event_text←event) + `<safe(event)>` row
  *   - identify → `identifies` + `users` (users only when userId
  *     present, users.id←userId — events.go:357-415)
  *   - page/screen → name←firstValid(name, properties.name)
  *   - group → group_id←groupId; alias → previous_id←previousId
  *   - extract → `<safe(event)>` with id←recordId
  *
  * The whole fan-out is one narrow projection + explode (map-side,
  * no shuffle): at 100 TB each event row expands to 1–3 table rows
  * inside a single codegen stage, then a `partitionBy(table_name)`
  * write splits tables without a shuffle per table.
  */
object WarehouseRows {

  /** Inline canonical-event fixture (FIXTURES.md §1 shape). */
  private val gw: Seq[(Long, String)] = Seq(
    1L -> """{"type":"track","event":"Order Completed","messageId":"m1","anonymousId":"a1","userId":"u1","channel":"web","request_ip":"9.9.9.9","context":{"ip":"1.2.3.4","locale":"en-US"},"properties":{"plan":"pro","amount":49.99,"received_at":"boom","category":"","nested":{"a":{"b":2}}},"receivedAt":"2024-01-01T00:00:01Z"}""",
    2L -> """{"type":"track","event":"cartViewed","messageId":"m2","anonymousId":"a2","request_ip":"8.8.8.8","receivedAt":"2024-01-01T00:00:02Z"}""",
    3L -> """{"type":"identify","messageId":"m3","anonymousId":"a3","userId":"u3","traits":{"email":"x@y.z","age":33},"context":{"ip":"2.3.4.5"},"receivedAt":"2024-01-01T00:00:03Z"}""",
    4L -> """{"type":"identify","messageId":"m4","anonymousId":"a4","traits":{"email":"q@r.s"},"receivedAt":"2024-01-01T00:00:04Z"}""",
    5L -> """{"type":"page","name":"Home","messageId":"m5","userId":"u5","properties":{"path":"/"},"receivedAt":"2024-01-01T00:00:05Z"}""",
    6L -> """{"type":"screen","messageId":"m6","userId":"u6","properties":{"name":"Main Screen"},"receivedAt":"2024-01-01T00:00:06Z"}""",
    7L -> """{"type":"group","groupId":"g7","messageId":"m7","userId":"u7","traits":{"tier":"gold"},"receivedAt":"2024-01-01T00:00:07Z"}""",
    8L -> """{"type":"alias","previousId":"old8","messageId":"m8","userId":"u8","receivedAt":"2024-01-01T00:00:08Z"}""",
    9L -> """{"type":"extract","event":"sync_event","recordId":"r9","receivedAt":"2024-01-01T00:00:09Z"}""",
    10L -> """{"type":"merge","messageId":"m10","mergeProperties":[{"type":"email","value":"a@b.c"},{"type":"mobile","value":"+1555"}],"receivedAt":"2024-01-01T00:00:10Z"}""")

  private val gwSql: String =
    gw.map { case (id, js) => s"($id, '${js.replace("'", "''")}')" }
      .mkString("(VALUES ", ", ", ")")

  /** DuckDB mirror of SafeNames.toSafeName (w6 oracle chain). */
  private def sqlSafe(e: String): String =
    s"""lower(regexp_replace(regexp_replace(regexp_replace(regexp_replace(regexp_replace(trim($e),
        '([a-z])([A-Z])', '\\1_\\2', 'g'),
        '([A-Z]+)([A-Z][a-z])', '\\1_\\2', 'g'),
        '([A-Za-z])([0-9])', '\\1_\\2', 'g'),
        '([0-9])([A-Za-z])', '\\1_\\2', 'g'),
        '[^a-zA-Z0-9]+', '_', 'g'))"""

  val defs: Map[String, Q] = Map(

    "w7b_table_rows" -> ((s, dir) => {
      val sess = s
      import sess.implicits._
      SafeNames.register(s)
      val df = gw.toDF("msg", "js")
      def j(path: String): Column = get_json_object(col("js"), s"$$.$path")
      def nz(c: Column): Column = when(c =!= "", c) // firstValidValue skips ""
      val t = j("type")
      val mid = j("messageId")
      val uid = j("userId")
      val anon = j("anonymousId")
      val cip = coalesce(nz(j("context.ip")), nz(j("request_ip")))
      val rcv = j("receivedAt")
      val ev = j("event")
      val safeEv = callUDF("safe_name", ev)
      def row(table: Column, rowId: Column, altName: String, altVal: Column): Column =
        struct(table.as("table_name"), rowId.as("row_id"), uid.as("user_id"),
          anon.as("anonymous_id"), cip.as("context_ip"), rcv.as("received_at"),
          lit(altName).as("alt_name"), altVal.as("alt_val"))
      val rows = array(
        when(t === "track", row(lit("tracks"), mid, "event_text", ev)),
        when(t === "track", row(safeEv, mid, "event", safeEv)),
        when(t === "identify", row(lit("identifies"), mid, "traits_email", j("traits.email"))),
        when(t === "identify" && uid.isNotNull,
          row(lit("users"), uid, "traits_email", j("traits.email"))),
        when(t === "page", row(lit("pages"), mid, "name",
          coalesce(nz(j("name")), nz(j("properties.name"))))),
        when(t === "screen", row(lit("screens"), mid, "name",
          coalesce(nz(j("name")), nz(j("properties.name"))))),
        when(t === "group", row(lit("groups"), mid, "group_id", j("groupId"))),
        when(t === "alias", row(lit("aliases"), mid, "previous_id", j("previousId"))),
        when(t === "extract", row(safeEv, j("recordId"), "record_id", j("recordId"))))
      df.withColumn("rows", rows)
        .select(col("msg"),
          explode(filter(col("rows"), r => r.isNotNull)).as("r"))
        .select(col("msg"), col("r.*"))
    }),

    // W7 property columns: flattened payload columns per target table
    // with the reference's prefix rules (events.go prefixInfo usage):
    // track properties → BARE column names in the <event> table,
    // track context → context_* in tracks, identify traits → bare in
    // identifies, identify context.traits → context_traits_*.
    // Values colliding with rule-reserved columns are DROPPED
    // (rules.go:128-142 — e.g. properties.received_at, context.ip),
    // and empty-string values are skipped (set.go IsEmptyString).
    "w7c_event_properties" -> ((s, dir) => {
      val sess = s
      import sess.implicits._
      JsonFlatten.register(s)
      SafeNames.register(s)
      val df = gw.toDF("msg", "js")
      val t = get_json_object(col("js"), "$.type")
      val safeEv = callUDF("safe_name", get_json_object(col("js"), "$.event"))
      def rows(cond: org.apache.spark.sql.Column, table: org.apache.spark.sql.Column,
               path: String, prefix: String) =
        df.filter(cond)
          .select(col("msg"), table.as("target_table"),
            explode(expr(
              s"""map_zip_with(flatten_json(get_json_object(js, '$$.$path')),
                              flatten_json_types(get_json_object(js, '$$.$path')),
                              (k, v, ty) -> named_struct('v', v, 'ty', ty))"""))
              .as(Seq("k", "vt")))
          .select(col("msg"), col("target_table"),
            concat(lit(prefix), col("k")).as("column_name"),
            col("vt.v").as("column_value"), col("vt.ty").as("col_type"))
      val reservedCols = Seq("id", "anonymous_id", "user_id", "sent_at", "timestamp",
        "received_at", "original_timestamp", "channel", "context_ip",
        "context_request_ip", "context_passed_ip", "event_text", "record_id")
      rows(t === "track", safeEv, "properties", "")
        .unionByName(rows(t === "track", lit("tracks"), "context", "context_"))
        .unionByName(rows(t === "identify", lit("identifies"), "traits", ""))
        .unionByName(rows(t === "identify", lit("identifies"), "context.traits", "context_traits_"))
        .filter(col("column_value") =!= "")
        .filter(!col("column_name").isin(reservedCols: _*))
    }),

    // W8 event-side merge-rule emission (idresolution.go:15-141):
    // merge events use mergeProperties[0]/[1]; alias pairs
    // userId<->previousId; every other type pairs anonymousId<->userId
    // (userId alone when no anonymousId); rows with an empty first
    // property are not emitted at all.
    "w7d_merge_rule_rows" -> ((s, dir) => {
      val sess = s
      import sess.implicits._
      val df = gw.toDF("msg", "js")
      def j(p: String) = get_json_object(col("js"), s"$$.$p")
      def nz(c: org.apache.spark.sql.Column) = when(c =!= "", c)
      val t = j("type")
      val anon = nz(j("anonymousId"))
      val uid = nz(j("userId"))
      val rule = when(t === "merge",
          struct(nz(j("mergeProperties[0].type")).as("t1"),
            nz(j("mergeProperties[0].value")).as("v1"),
            nz(j("mergeProperties[1].type")).as("t2"),
            nz(j("mergeProperties[1].value")).as("v2")))
        .when(t === "alias",
          struct(lit("user_id").as("t1"), uid.as("v1"),
            lit("user_id").as("t2"), nz(j("previousId")).as("v2")))
        .when(anon.isNotNull,
          struct(lit("anonymous_id").as("t1"), anon.as("v1"),
            when(uid.isNotNull, lit("user_id")).as("t2"), uid.as("v2")))
        .otherwise(
          struct(when(uid.isNotNull, lit("user_id")).as("t1"), uid.as("v1"),
            lit(null).cast("string").as("t2"), lit(null).cast("string").as("v2")))
      df.withColumn("r", rule)
        .filter(col("r.v1").isNotNull) // empty first property -> no rule
        .select(col("msg"),
          col("r.t1").as("merge_property_1_type"), col("r.v1").as("merge_property_1_value"),
          col("r.t2").as("merge_property_2_type"), col("r.v2").as("merge_property_2_value"))
    }),

    // T17: PII strip — drop configured trait keys (here: email) from
    // the flattened traits map (processor.go:1010-1024 shape;
    // map_filter in Spark terms).
    "t17_pii_strip" -> ((s, dir) => {
      val sess = s
      import sess.implicits._
      JsonFlatten.register(s)
      gw.toDF("msg", "js")
        .filter(get_json_object(col("js"), "$.type") === "identify")
        .select(col("msg"),
          explode(expr(
            "map_filter(flatten_json(get_json_object(js, '$.traits')), (k, v) -> k NOT IN ('email'))"))
            .as(Seq("key", "val")))
    })
  )

  val oracles: Map[String, String] = Map(
    "w7b_table_rows" -> {
      val base =
        s"""SELECT msg, js,
              json_extract_string(js, '$$.type') AS t,
              json_extract_string(js, '$$.messageId') AS mid,
              json_extract_string(js, '$$.userId') AS uid,
              json_extract_string(js, '$$.anonymousId') AS anon,
              COALESCE(nullif(json_extract_string(js, '$$.context.ip'), ''),
                       nullif(json_extract_string(js, '$$.request_ip'), '')) AS cip,
              json_extract_string(js, '$$.receivedAt') AS rcv,
              json_extract_string(js, '$$.event') AS ev
            FROM $gwSql AS g(msg, js)"""
      s"""WITH e AS ($base)
          SELECT msg, 'tracks' AS table_name, mid AS row_id, uid AS user_id,
                 anon AS anonymous_id, cip AS context_ip, rcv AS received_at,
                 'event_text' AS alt_name, ev AS alt_val
          FROM e WHERE t = 'track'
          UNION ALL
          SELECT msg, ${sqlSafe("ev")}, mid, uid, anon, cip, rcv, 'event', ${sqlSafe("ev")}
          FROM e WHERE t = 'track'
          UNION ALL
          SELECT msg, 'identifies', mid, uid, anon, cip, rcv, 'traits_email',
                 json_extract_string(js, '$$.traits.email')
          FROM e WHERE t = 'identify'
          UNION ALL
          SELECT msg, 'users', uid, uid, anon, cip, rcv, 'traits_email',
                 json_extract_string(js, '$$.traits.email')
          FROM e WHERE t = 'identify' AND uid IS NOT NULL
          UNION ALL
          SELECT msg, 'pages', mid, uid, anon, cip, rcv, 'name',
                 COALESCE(nullif(json_extract_string(js, '$$.name'), ''),
                          nullif(json_extract_string(js, '$$.properties.name'), ''))
          FROM e WHERE t = 'page'
          UNION ALL
          SELECT msg, 'screens', mid, uid, anon, cip, rcv, 'name',
                 COALESCE(nullif(json_extract_string(js, '$$.name'), ''),
                          nullif(json_extract_string(js, '$$.properties.name'), ''))
          FROM e WHERE t = 'screen'
          UNION ALL
          SELECT msg, 'groups', mid, uid, anon, cip, rcv, 'group_id',
                 json_extract_string(js, '$$.groupId')
          FROM e WHERE t = 'group'
          UNION ALL
          SELECT msg, 'aliases', mid, uid, anon, cip, rcv, 'previous_id',
                 json_extract_string(js, '$$.previousId')
          FROM e WHERE t = 'alias'
          UNION ALL
          SELECT msg, ${sqlSafe("ev")}, json_extract_string(js, '$$.recordId'), uid, anon,
                 cip, rcv, 'record_id', json_extract_string(js, '$$.recordId')
          FROM e WHERE t = 'extract'"""
    },
    "w7c_event_properties" -> {
      val timestampReSql =
        """^\d{4}-\d{2}-\d{2}([ T]\d{2}:\d{2}(:\d{2}(\.\d+)?)?(Z|[+-]\d{2}:?\d{2})?)?$"""
      val typeSql =
        s"""CASE json_type(v)
             WHEN 'BOOLEAN' THEN 'boolean'
             WHEN 'UBIGINT' THEN 'int' WHEN 'BIGINT' THEN 'int'
             WHEN 'DOUBLE' THEN (CASE WHEN CAST(v AS DOUBLE) = floor(CAST(v AS DOUBLE)) THEN 'int' ELSE 'float' END)
             WHEN 'VARCHAR' THEN (CASE WHEN regexp_matches(json_extract_string(v, '$$'), '$timestampReSql') THEN 'datetime' ELSE 'string' END)
             ELSE 'json' END"""
      val reservedSql = Seq("id", "anonymous_id", "user_id", "sent_at", "timestamp",
        "received_at", "original_timestamp", "channel", "context_ip",
        "context_request_ip", "context_passed_ip", "event_text", "record_id")
        .map(w => s"'$w'").mkString("(", ", ", ")")
      s"""WITH RECURSIVE g(msg, js) AS $gwSql,
          srcs AS (
            SELECT msg, ${sqlSafe("json_extract_string(js, '$.event')")} AS target_table,
                   '' AS prefix, json_extract(js, '$$.properties') AS obj
            FROM g WHERE json_extract_string(js, '$$.type') = 'track'
            UNION ALL
            SELECT msg, 'tracks', 'context_', json_extract(js, '$$.context')
            FROM g WHERE json_extract_string(js, '$$.type') = 'track'
            UNION ALL
            SELECT msg, 'identifies', '', json_extract(js, '$$.traits')
            FROM g WHERE json_extract_string(js, '$$.type') = 'identify'
            UNION ALL
            SELECT msg, 'identifies', 'context_traits_', json_extract(js, '$$.context.traits')
            FROM g WHERE json_extract_string(js, '$$.type') = 'identify'),
          flat AS (
            SELECT msg, target_table, prefix, k AS path,
                   json_extract(obj, '$$."' || k || '"') AS v, 1 AS depth
            FROM (SELECT msg, target_table, prefix, obj, unnest(json_keys(obj)) AS k
                  FROM srcs WHERE obj IS NOT NULL AND json_type(obj) = 'OBJECT')
            WHERE k <> ''
            UNION ALL
            SELECT msg, target_table, prefix, path || '_' || k,
                   json_extract(v, '$$."' || k || '"'), depth + 1
            FROM (SELECT msg, target_table, prefix, path, v, depth, unnest(json_keys(v)) AS k
                  FROM flat WHERE json_type(v) = 'OBJECT' AND depth < 3)
            WHERE k <> '')
          SELECT msg, target_table, prefix || path AS column_name,
            CASE WHEN json_type(v) IN ('OBJECT', 'ARRAY') THEN CAST(v AS VARCHAR)
                 ELSE json_extract_string(v, '$$') END AS column_value,
            $typeSql AS col_type
          FROM flat
          WHERE NOT (json_type(v) = 'OBJECT' AND depth < 3)
            AND json_type(v) <> 'NULL'
            AND (json_type(v) <> 'VARCHAR' OR json_extract_string(v, '$$') <> '')
            AND prefix || path NOT IN $reservedSql"""
    },
    "w7d_merge_rule_rows" ->
      s"""SELECT msg, t1 AS merge_property_1_type, v1 AS merge_property_1_value,
            t2 AS merge_property_2_type, v2 AS merge_property_2_value
          FROM (
            SELECT msg,
              CASE
                WHEN ty = 'merge' THEN nullif(json_extract_string(js, '$$.mergeProperties[0].type'), '')
                WHEN ty = 'alias' THEN 'user_id'
                WHEN anon IS NOT NULL THEN 'anonymous_id'
                WHEN uid IS NOT NULL THEN 'user_id'
              END AS t1,
              CASE
                WHEN ty = 'merge' THEN nullif(json_extract_string(js, '$$.mergeProperties[0].value'), '')
                WHEN ty = 'alias' THEN uid
                WHEN anon IS NOT NULL THEN anon
                ELSE uid
              END AS v1,
              CASE
                WHEN ty = 'merge' THEN nullif(json_extract_string(js, '$$.mergeProperties[1].type'), '')
                WHEN ty = 'alias' THEN 'user_id'
                WHEN anon IS NOT NULL AND uid IS NOT NULL THEN 'user_id'
              END AS t2,
              CASE
                WHEN ty = 'merge' THEN nullif(json_extract_string(js, '$$.mergeProperties[1].value'), '')
                WHEN ty = 'alias' THEN nullif(json_extract_string(js, '$$.previousId'), '')
                WHEN anon IS NOT NULL THEN uid
              END AS v2
            FROM (
              SELECT msg, js, json_extract_string(js, '$$.type') AS ty,
                nullif(json_extract_string(js, '$$.anonymousId'), '') AS anon,
                nullif(json_extract_string(js, '$$.userId'), '') AS uid
              FROM $gwSql AS g(msg, js)))
          WHERE v1 IS NOT NULL""",
    "t17_pii_strip" ->
      s"""SELECT msg, k AS key,
            json_extract_string(js, '$$.traits.' || k) AS val
          FROM (SELECT msg, js, unnest(json_keys(js, '$$.traits')) AS k
                FROM $gwSql AS g(msg, js)
                WHERE json_extract_string(js, '$$.type') = 'identify')
          WHERE k NOT IN ('email')"""
  )
}
