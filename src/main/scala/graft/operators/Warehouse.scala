package graft.operators

import graft.{Q, Tables}
import graft.functions.{JsonFlatten, SafeNames}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Warehouse transformation operators — SURVEY.md §2.4/§2.5: the
  * event→relational core of the reference (processor/internal/
  * transformer/destination_transformer/embedded/warehouse/ and
  * warehouse/slave/worker.go).
  *
  * Everything here is a narrow map/projection (no shuffle) except the
  * schema-inference aggregate, exactly like the reference's per-event
  * Go loop — but declarative, so at 100 TB it fuses into one
  * whole-stage-codegen pass over the scan.
  */
object Warehouse {

  private val dec = DecimalType(18, 2)

  /** Shared inline fixture of gnarly identifiers for the name-mangling
    * op — mirrored verbatim in the oracle SQL VALUES list.
    */
  private val nameFixture = Seq(
    "userId", "camelCaseColumn", "context.screen.density", "1invalid",
    "select", "group", "with  spaces", "trailing-dash-", "UPPERCASE",
    "mixedUPPERCase", "a", "42", "email-address", "revenue($)",
    "HTMLParser", "abc123", "v2Test", "XMLHttpRequest", "SCREAMING_SNAKE",
    "order")

  val defs: Map[String, Q] = Map(

    // SCD TYPE-2 dimension maintenance — the history-keeping merge a
    // warehouse runs when dimension attributes change (q11's users
    // table is the SCD1 latest-wins form; this keeps every version
    // with validity intervals). One key-equi join of the current
    // dimension against the change batch, then a per-row explode
    // emits closed-old + opened-new rows for real changes and passes
    // unchanged/no-op rows through — no window, no self-join, and at
    // 100 TB the change batch is the small side of a broadcast. The
    // value-equality guard makes re-delivered no-op updates idempotent
    // (no spurious version row), which the oracle's <> filter mirrors.
    "w11_scd2_merge" -> ((s, dir) => {
      val t = 1000L
      val dim = Tables.customer(s, dir)
        .select(col("c_custkey"), col("c_mktsegment"), col("c_acctbal").as("acctbal"))
      val upd = dim.filter(col("c_custkey") % 7 === 3)
        .select(col("c_custkey"), (col("acctbal") + 100.5).as("new_acctbal"))
      dim.join(upd, Seq("c_custkey"), "left")
        .select(col("c_custkey"), col("c_mktsegment"), explode(
          when(col("new_acctbal").isNotNull && col("new_acctbal") =!= col("acctbal"),
            array(
              struct(col("acctbal").as("acctbal"), lit(0L).as("valid_from"),
                lit(t).cast("long").as("valid_to"), lit(false).as("is_current")),
              struct(col("new_acctbal").as("acctbal"), lit(t).as("valid_from"),
                lit(null).cast("long").as("valid_to"), lit(true).as("is_current"))))
            .otherwise(array(
              struct(col("acctbal").as("acctbal"), lit(0L).as("valid_from"),
                lit(null).cast("long").as("valid_to"), lit(true).as("is_current"))))
        ).as("r"))
        .select(col("c_custkey"), col("c_mktsegment"), col("r.acctbal").as("acctbal"),
          col("r.valid_from").as("valid_from"), col("r.valid_to").as("valid_to"),
          col("r.is_current").as("is_current"))
    }),

    // W1+W7: event-type dispatch + multi-table fan-out — track events
    // produce a `tracks` row AND a per-event-name table row
    // (events.go:17-164). One scan → explode of (table, id) structs;
    // map-side only, no shuffle before the final count.
    "w7_multitable_fanout" -> ((s, dir) => {
      val ev = Tables.events(s, dir)
      ev.select(explode(array(
          struct(lit("tracks").as("table_name"), col("event_id")),
          struct(col("event_type").as("table_name"), col("event_id"))))
          .as("row"))
        .select(col("row.table_name"), col("row.event_id"))
        .groupBy(col("table_name"))
        .agg(count(lit(1)).as("n"), min(col("event_id")).as("min_id"),
          max(col("event_id")).as("max_id"))
    }),

    // W2: recursive JSON flatten of the event payload (set.go:15-156).
    // Flatten UDF → explode map → typed columns.
    "w2_flatten_props" -> ((s, dir) => {
      JsonFlatten.register(s)
      Tables.events(s, dir)
        .select(col("event_id"), explode(callUDF("flatten_json", col("props"))).as(Seq("key", "val")))
        .select(col("event_id"), col("key"), col("val"), col("val").cast("long").as("val_int"))
    }),

    // W2 via the native Catalyst expression (FlattenJsonExpr): same
    // semantics as w2, but the flatten participates in whole-stage
    // codegen instead of breaking the stage at a UDF boundary.
    "w2c_flatten_native" -> ((s, dir) => {
      graft.functions.FlattenJsonExpr.register(s)
      Tables.events(s, dir)
        .select(col("event_id"), explode(expr("flatten_json_native(props)")).as(Seq("key", "val")))
        .select(col("event_id"), col("key"), col("val"), col("val").cast("long").as("val_int"))
    }),

    // W4: column-rule projection — reserved column extraction
    // (internal/rules/rules.go:19-172): id←messageId, received_at,
    // event_text←event, context_ip←coalesce(...).
    "w4_column_rules" -> ((s, dir) => {
      Tables.events(s, dir).select(
        col("event_id").as("id"),
        col("user_id"),
        unix_micros(col("ts")).as("received_at_us"),
        col("event_type").as("event_text"),
        coalesce(col("value"), lit(0.0)).as("value"))
    }),

    // W5/E1: type inference over flattened payload + schema capture
    // aggregate (datatype.go:11-48; schema-forwarder/internal/
    // transformer/transformer.go:69-163). groupBy(event key) over the
    // inferred (key, type) pairs — the shuffle carries only the tiny
    // schema tuples, never payloads.
    "e1_schema_inference" -> ((s, dir) => {
      JsonFlatten.register(s)
      Tables.events(s, dir)
        .select(col("event_type"), explode(callUDF("flatten_json_types", col("props"))).as(Seq("key", "type")))
        .groupBy(col("event_type"), col("key"), col("type"))
        .agg(count(lit(1)).as("n"))
    }),

    // W13: SCHEMA COMPATIBILITY CLASSIFIER — the governance verdict
    // layered over L3's consolidation and L11's DDL diff: given a
    // column's (v1, v2) type pair, is the evolution backward-
    // compatible or breaking? Classes: added (new nullable column —
    // compatible), removed (breaking), unchanged, widened (type rank
    // moves UP the l4 coercion direction boolean→int→float→datetime→
    // string→json — compatible, the warehouse can coerce old rows),
    // narrowed (breaking — existing rows can't demote losslessly).
    // Registry-fixture shape (w6/t14's pattern): the version pair
    // table is config-sized; against a live ledger the input is l3's
    // consolidated schema at two uploads.
    "w13_schema_compat" -> ((s, dir) => {
      val sess = s
      import sess.implicits._
      val fixture = Seq(
        ("identifies", "user_id", "int", "int"),
        ("identifies", "email", "string", "string"),
        ("identifies", "age", "int", "float"),
        ("identifies", "plan", "string", "int"),
        ("tracks", "event", "string", "string"),
        ("tracks", "revenue", "float", "string"),
        ("tracks", "ts", "datetime", "string"),
        ("tracks", "legacy_flag", "boolean", ""),
        ("tracks", "context_ip", "", "string"),
        ("pages", "url", "string", "string"),
        ("pages", "referrer", "string", ""),
        ("pages", "load_ms", "", "int"),
        ("pages", "is_bounce", "boolean", "int"),
        ("users", "received_at", "datetime", "datetime"),
        ("users", "raw_payload", "json", "string"))
      def rk(c: String) = s"CASE $c WHEN 'boolean' THEN 1 WHEN 'int' THEN 2 " +
        "WHEN 'float' THEN 3 WHEN 'datetime' THEN 4 WHEN 'string' THEN 5 " +
        "WHEN 'json' THEN 6 ELSE 0 END"
      fixture.toDF("tbl", "col_name", "old_type", "new_type")
        .withColumn("change", expr(
          "CASE WHEN old_type = '' THEN 'added' " +
            "WHEN new_type = '' THEN 'removed' " +
            "WHEN old_type = new_type THEN 'unchanged' " +
            s"WHEN ${rk("new_type")} > ${rk("old_type")} THEN 'widened' " +
            "ELSE 'narrowed' END"))
        .withColumn("verdict", expr(
          "CASE change WHEN 'removed' THEN 'breaking' " +
            "WHEN 'narrowed' THEN 'breaking' " +
            "WHEN 'added' THEN 'backward_compatible' " +
            "ELSE 'compatible' END"))
    }),

    // W6: safe name mangling (safe.go:33-277) on an inline fixture of
    // hostile identifiers, mirrored by the oracle's regexp chain.
    "w6_safe_names" -> ((s, dir) => {
      val sess = s
      import sess.implicits._
      SafeNames.register(s)
      nameFixture.toDF("raw")
        .select(col("raw"), callUDF("safe_name", col("raw")).as("safe"))
    }),

    // W6 provider pass: case rules (Snowflake upper, Postgres
    // truncate-63-then-lower), per-provider reserved lists, datalake
    // no-truncation (safe.go:140-157 safeName).
    "w6b_safe_names_provider" -> ((s, dir) => {
      val sess = s
      import sess.implicits._
      SafeNames.register(s)
      val providers = Seq("POSTGRES", "SNOWFLAKE", "BQ", "RS", "S3_DATALAKE", "DELTALAKE")
        .toDF("provider")
      val names = Seq("event", "select", "range", "qualify", "ilike", "UserProfile",
        "a" * 70, "b" * 140).toDF("raw")
      providers.crossJoin(names)
        .select(col("provider"), col("raw"),
          callUDF("safe_name_for", col("provider"), col("raw")).as("safe"))
    }),

    // W8: merge-rule emission — identity edges from (anonId, userId)
    // pairs (idresolution.go:15-141). Deterministic synthetic anon id
    // derived from the event row.
    "w8_merge_rules" -> ((s, dir) => {
      Tables.events(s, dir)
        .select(
          concat(lit("anon_"), (col("user_id") % 37).cast("string")).as("merge_property_1"),
          concat(lit("user_"), col("user_id").cast("string")).as("merge_property_2"))
        .distinct()
    }),

    // W8b: per-provider INDEX-LENGTH constraints on merge rules
    // (warehouse/constraints/constraint.go:36-96: BQ and Snowflake cap
    // the concatenated merge-property type+value index columns at 512
    // chars; violators route to the discards table with a reason, the
    // rest load). The constraint table is a broadcast fixture keyed by
    // provider; synthetic long anon values (user_id % 11 == 0 pads the
    // property past the cap) exercise the violation path. One scan,
    // per-provider fan-out by crossJoin with the 2-row provider
    // config — the reference's per-event constraint check expressed as
    // a column predicate.
    "w8b_merge_rule_constraints" -> ((s, dir) => {
      val sess = s
      import sess.implicits._
      val providers = Seq(("BQ", 512), ("SNOWFLAKE", 512), ("POSTGRES", 0))
        .toDF("provider", "idx_limit") // 0 = provider enforces no cap
      val rules = Tables.events(s, dir)
        .select(
          lit("anonymous_id").as("merge_property_1_type"),
          concat(lit("anon_"), (col("user_id") % 37).cast("string"),
            when(col("user_id") % 11 === 0, lit("_" + "x" * 520)).otherwise(lit("")))
            .as("merge_property_1_value"),
          lit("user_id").as("merge_property_2_type"),
          concat(lit("user_"), col("user_id").cast("string")).as("merge_property_2_value"))
        .distinct()
      rules.crossJoin(broadcast(providers))
        .withColumn("idx1_len",
          length(col("merge_property_1_type")) + length(col("merge_property_1_value")))
        .withColumn("idx2_len",
          length(col("merge_property_2_type")) + length(col("merge_property_2_value")))
        .withColumn("violated",
          col("idx_limit") > 0 &&
            (col("idx1_len") > col("idx_limit") || col("idx2_len") > col("idx_limit")))
        .groupBy(col("provider"))
        .agg(count(lit(1)).as("n_rules"),
          sum(when(col("violated"), 1L).otherwise(0L)).as("n_discarded"),
          sum(when(!col("violated"), 1L).otherwise(0L)).as("n_loaded"),
          max(when(col("violated"), col("idx1_len"))).cast("long").as("max_violated_len"))
    }),

    // W9: column-count guard — reject events whose schema exceeds the
    // column cap (transformer.go:251-277; cap 1600, here 2 to exercise
    // the reject path on the small fixture).
    // The fixture's props are single-key, which would degenerate the
    // oracle to a COUNT — so the guard runs on a synthesized payload
    // whose width varies per event (event_id % 4 extra keys under a
    // nested object). Both engines construct the SAME JSON text and
    // independently parse it back (Spark: recursive flatten UDF;
    // DuckDB: json_keys over the subobjects), so the differential
    // check covers the flatten-count itself, and the cap decision has
    // both outcomes populated.
    "w9_column_guard" -> ((s, dir) => {
      JsonFlatten.register(s)
      val extras = when(col("event_id") % 4 === 0, lit("")).otherwise(expr(
        """array_join(transform(sequence(1, CAST(event_id % 4 AS INT)),
           i -> concat('"e', CAST(i AS STRING), '":', CAST(i AS STRING))), ',')"""))
      Tables.events(s, dir)
        .withColumn("payload", concat(
          lit("""{"p":"""), col("props"), lit(""","extra":{"""), extras, lit("}}")))
        .select(size(map_keys(callUDF("flatten_json", col("payload")))).as("n_cols"))
        .withColumn("status",
          when(col("n_cols") <= 2, "ok").otherwise("rejected"))
        .groupBy(col("n_cols"), col("status")).agg(count(lit(1)).as("n_events"))
    }),

    // L4: load-file type coercion with discards side-output
    // (warehouse/slave/worker.go:404-448 + HandleSchemaChange :637-696):
    // values that can't coerce to the target schema type are routed to
    // rudder_discards instead of silently dropped. Here: `value` must
    // coerce to int (integral doubles pass, fractional discard).
    "l4_coercion_discards" -> ((s, dir) => {
      Tables.events(s, dir)
        .select(col("event_id"), col("event_type"), col("value"),
          when(col("value") === floor(col("value")), col("value").cast("long")).as("value_int"))
        .withColumn("status", when(col("value_int").isNull, lit("discarded")).otherwise(lit("loaded")))
        .groupBy(col("event_type"), col("status"))
        .agg(count(lit(1)).as("n"))
    }),

    // L3: schema consolidation — first-seen-type-wins merge across
    // staging schemas (warehouse/schema/schema.go:294-313): per key,
    // the type of the earliest event wins; text dominates string.
    // "First wins" is a min_by AGGREGATE, not an ordered window: key
    // cardinality is schema-sized (constant) while each key's rows are
    // corpus-sized, so a per-key window would funnel the corpus
    // through a handful of tasks at 100 TB — min_by folds map-side.
    "l3_schema_consolidation" -> ((s, dir) => {
      JsonFlatten.register(s)
      Tables.events(s, dir)
        .select(col("event_id"), explode(callUDF("flatten_json_types", col("props"))).as(Seq("key", "type")))
        .groupBy(col("key"))
        .agg(min_by(col("type"), col("event_id")).as("winning_type"),
          min(col("event_id")).as("first_seen_event"))
    }),

    // L3+L11 folded across micro-batches — the batch-expressible
    // equivalent of streaming/SchemaEvolution.scala's registry fold
    // (schema.go:294-342): per column, the type of the first batch
    // that saw it wins, except a later text observation upgrades
    // string→text. The streaming form (with L4 coercion + discards)
    // is exercised end-to-end in StreamingSpec.
    "l3c_streaming_evolution" -> ((s, dir) => {
      val sess = s
      import sess.implicits._
      JsonFlatten.register(s)
      val longS = "x" * 600
      val batches = Seq(
        (0L, 1L, """{"a":1,"s":"hi"}"""),
        (0L, 2L, """{"a":2.5}"""),
        (1L, 3L, s"""{"b":2.5,"s":"$longS"}"""),
        (2L, 4L, """{"c":"2024-01-01","a":"oops"}"""))
        .toDF("batch_no", "id", "js")
      val kv = batches.select(col("batch_no"), col("id"),
        explode(callUDF("flatten_json_types_redshift", col("js"))).as(Seq("key", "typ")))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("key")).orderBy(col("batch_no").asc, col("id").asc)
      val first = kv.withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
        .select(col("key").as("column_name"), col("typ"),
          col("batch_no").as("first_batch"))
      val sawText = kv.filter(col("typ") === "text")
        .select(col("key").as("column_name")).distinct()
        .withColumn("saw_text", lit(true))
      first.join(sawText, Seq("column_name"), "left")
        .select(col("column_name"),
          when(col("typ") === "string" && col("saw_text"), lit("text"))
            .otherwise(col("typ")).as("wh_type"),
          col("first_batch"))
    }),

    // W10: full-event capture — rudder_event JSON column
    // (set.go:189-228): canonical JSON of selected fields.
    "w10_full_event" -> ((s, dir) => {
      Tables.events(s, dir)
        .select(col("event_id"),
          concat(lit("{\"event_id\":"), col("event_id").cast("string"),
            lit(",\"event_type\":\""), col("event_type"), lit("\"}")).as("rudder_event"))
        .orderBy(col("event_id")).limit(100)
    })
  )

  val oracles: Map[String, String] = Map(
    "w11_scd2_merge" ->
      """WITH upd AS (SELECT c_custkey, c_acctbal + 100.5 AS new_acctbal
                      FROM customer WHERE c_custkey % 7 = 3)
         SELECT c_custkey, c_mktsegment, c_acctbal AS acctbal,
                CAST(0 AS BIGINT) AS valid_from, CAST(1000 AS BIGINT) AS valid_to,
                FALSE AS is_current
         FROM customer JOIN upd USING (c_custkey) WHERE new_acctbal <> c_acctbal
         UNION ALL
         SELECT c_custkey, c_mktsegment, new_acctbal,
                CAST(1000 AS BIGINT), CAST(NULL AS BIGINT), TRUE
         FROM customer JOIN upd USING (c_custkey) WHERE new_acctbal <> c_acctbal
         UNION ALL
         SELECT c_custkey, c_mktsegment, c_acctbal,
                CAST(0 AS BIGINT), CAST(NULL AS BIGINT), TRUE
         FROM customer LEFT JOIN upd USING (c_custkey)
         WHERE new_acctbal IS NULL OR new_acctbal = c_acctbal""",
    "w7_multitable_fanout" ->
      """SELECT table_name, COUNT(*) AS n, MIN(event_id) AS min_id, MAX(event_id) AS max_id
         FROM (
           SELECT 'tracks' AS table_name, event_id FROM events
           UNION ALL
           SELECT event_type AS table_name, event_id FROM events) t
         GROUP BY table_name""",
    "w2_flatten_props" ->
      """SELECT event_id, 'k' AS key, CAST(regexp_extract(props, '"k":\s*(-?\d+)', 1) AS BIGINT) AS val_int,
                regexp_extract(props, '"k":\s*(-?\d+)', 1) AS val
         FROM events WHERE props LIKE '%"k"%'""",
    "w2c_flatten_native" ->
      """SELECT event_id, 'k' AS key, CAST(regexp_extract(props, '"k":\s*(-?\d+)', 1) AS BIGINT) AS val_int,
                regexp_extract(props, '"k":\s*(-?\d+)', 1) AS val
         FROM events WHERE props LIKE '%"k"%'""",
    "w4_column_rules" ->
      """SELECT event_id AS id, user_id, epoch_us(ts) AS received_at_us,
                event_type AS event_text, COALESCE(value, 0.0) AS value
         FROM events""",
    "e1_schema_inference" ->
      """SELECT event_type, 'k' AS key,
                CASE WHEN TRY_CAST(regexp_extract(props, '"k":\s*(-?\d+(\.\d+)?)', 1) AS DOUBLE)
                       = floor(TRY_CAST(regexp_extract(props, '"k":\s*(-?\d+(\.\d+)?)', 1) AS DOUBLE))
                     THEN 'int' ELSE 'float' END AS type,
                COUNT(*) AS n
         FROM events WHERE props LIKE '%"k"%'
         GROUP BY 1, 2, 3""",
    // same rank chain and class rules over the shared fixture
    "w13_schema_compat" ->
      """WITH f(tbl, col_name, old_type, new_type) AS (VALUES
           ('identifies', 'user_id', 'int', 'int'),
           ('identifies', 'email', 'string', 'string'),
           ('identifies', 'age', 'int', 'float'),
           ('identifies', 'plan', 'string', 'int'),
           ('tracks', 'event', 'string', 'string'),
           ('tracks', 'revenue', 'float', 'string'),
           ('tracks', 'ts', 'datetime', 'string'),
           ('tracks', 'legacy_flag', 'boolean', ''),
           ('tracks', 'context_ip', '', 'string'),
           ('pages', 'url', 'string', 'string'),
           ('pages', 'referrer', 'string', ''),
           ('pages', 'load_ms', '', 'int'),
           ('pages', 'is_bounce', 'boolean', 'int'),
           ('users', 'received_at', 'datetime', 'datetime'),
           ('users', 'raw_payload', 'json', 'string')),
          c AS (SELECT *,
              CASE WHEN old_type = '' THEN 'added'
                   WHEN new_type = '' THEN 'removed'
                   WHEN old_type = new_type THEN 'unchanged'
                   WHEN (CASE new_type WHEN 'boolean' THEN 1 WHEN 'int' THEN 2
                          WHEN 'float' THEN 3 WHEN 'datetime' THEN 4
                          WHEN 'string' THEN 5 WHEN 'json' THEN 6 ELSE 0 END)
                      > (CASE old_type WHEN 'boolean' THEN 1 WHEN 'int' THEN 2
                          WHEN 'float' THEN 3 WHEN 'datetime' THEN 4
                          WHEN 'string' THEN 5 WHEN 'json' THEN 6 ELSE 0 END)
                     THEN 'widened'
                   ELSE 'narrowed' END AS change
            FROM f)
          SELECT tbl, col_name, old_type, new_type, change,
            CASE change WHEN 'removed' THEN 'breaking'
                 WHEN 'narrowed' THEN 'breaking'
                 WHEN 'added' THEN 'backward_compatible'
                 ELSE 'compatible' END AS verdict
          FROM c""",
    "w6_safe_names" ->
      """SELECT raw,
           CASE WHEN mangled IN ('select','from','where','group','order','by','table','column',
                                 'insert','update','delete','join','union','all','and','or',
                                 'not','null','true','false','case','when','then','else','end',
                                 'user','partition','default','primary','key','index','view')
                  OR regexp_matches(mangled, '^[0-9]')
                THEN '_' || mangled ELSE mangled END AS safe
         FROM (
           SELECT raw, lower(regexp_replace(regexp_replace(regexp_replace(regexp_replace(regexp_replace(trim(raw),
                    '([a-z])([A-Z])', '\1_\2', 'g'),
                    '([A-Z]+)([A-Z][a-z])', '\1_\2', 'g'),
                    '([A-Za-z])([0-9])', '\1_\2', 'g'),
                    '([0-9])([A-Za-z])', '\1_\2', 'g'),
                    '[^a-zA-Z0-9]+', '_', 'g')) AS mangled
           FROM (VALUES ('userId'),('camelCaseColumn'),('context.screen.density'),('1invalid'),
                        ('select'),('group'),('with  spaces'),('trailing-dash-'),('UPPERCASE'),
                        ('mixedUPPERCase'),('a'),('42'),('email-address'),('revenue($)'),
                        ('HTMLParser'),('abc123'),('v2Test'),('XMLHttpRequest'),('SCREAMING_SNAKE'),
                        ('order')) v(raw)) t""",
    "w6b_safe_names_provider" -> {
      import graft.functions.SafeNames.{providerExtra, reserved}
      def inList(ws: Iterable[String]) = ws.toSeq.sorted.map(w => s"'$w'").mkString("(", ", ", ")")
      val core = inList(reserved.map(_.toUpperCase))
      val extraCond = providerExtra.map { case (p, ws) =>
        s"(provider = '$p' AND upper(cased) IN ${inList(ws)})"
      }.mkString(" OR ")
      s"""WITH providers(provider) AS (VALUES ('POSTGRES'), ('SNOWFLAKE'), ('BQ'), ('RS'),
                                              ('S3_DATALAKE'), ('DELTALAKE')),
          names(raw) AS (VALUES ('event'), ('select'), ('range'), ('qualify'), ('ilike'),
                                ('UserProfile'), (repeat('a', 70)), (repeat('b', 140))),
          pn AS (SELECT provider, raw,
                   CASE provider WHEN 'SNOWFLAKE' THEN upper(raw)
                                 WHEN 'POSTGRES' THEN lower(substr(raw, 1, 63))
                                 ELSE lower(raw) END AS cased
                 FROM providers CROSS JOIN names),
          esc AS (SELECT provider, raw,
                    CASE WHEN upper(cased) IN $core OR $extraCond
                         THEN '_' || cased ELSE cased END AS e
                  FROM pn)
          SELECT provider, raw,
            CASE WHEN provider IN ('S3_DATALAKE', 'GCS_DATALAKE', 'AZURE_DATALAKE')
                 THEN e ELSE substr(e, 1, 127) END AS safe
          FROM esc"""
    },
    "w8_merge_rules" ->
      """SELECT DISTINCT 'anon_' || CAST(user_id % 37 AS VARCHAR) AS merge_property_1,
                         'user_' || CAST(user_id AS VARCHAR) AS merge_property_2
         FROM events""",
    "w8b_merge_rule_constraints" -> {
      val pad = "x" * 520
      s"""WITH providers(provider, idx_limit) AS
            (VALUES ('BQ', 512), ('SNOWFLAKE', 512), ('POSTGRES', 0)),
          rules AS (
            SELECT DISTINCT
              'anonymous_id' AS t1,
              'anon_' || CAST(user_id % 37 AS VARCHAR) ||
                CASE WHEN user_id % 11 = 0 THEN '_$pad' ELSE '' END AS v1,
              'user_id' AS t2,
              'user_' || CAST(user_id AS VARCHAR) AS v2
            FROM events),
          checked AS (
            SELECT provider,
              length(t1) + length(v1) AS idx1_len,
              length(t2) + length(v2) AS idx2_len,
              idx_limit > 0 AND (length(t1) + length(v1) > idx_limit
                OR length(t2) + length(v2) > idx_limit) AS violated
            FROM rules CROSS JOIN providers)
          SELECT provider, COUNT(*) AS n_rules,
            CAST(SUM(CASE WHEN violated THEN 1 ELSE 0 END) AS BIGINT) AS n_discarded,
            CAST(SUM(CASE WHEN NOT violated THEN 1 ELSE 0 END) AS BIGINT) AS n_loaded,
            CAST(MAX(CASE WHEN violated THEN idx1_len END) AS BIGINT) AS max_violated_len
          FROM checked GROUP BY provider"""
    },
    "w9_column_guard" ->
      """WITH p AS (
           SELECT '{"p":' || props || ',"extra":{' ||
                  CASE WHEN event_id % 4 = 0 THEN ''
                       ELSE list_aggregate(
                              list_transform(range(CAST(1 AS BIGINT), CAST(event_id % 4 + 1 AS BIGINT)),
                                             i -> '"e' || i || '":' || i),
                              'string_agg', ',') END || '}}' AS payload
           FROM events),
         n AS (
           SELECT CAST(len(json_keys(payload, '$.p')) + len(json_keys(payload, '$.extra')) AS INT) AS n_cols
           FROM p)
         SELECT n_cols, CASE WHEN n_cols <= 2 THEN 'ok' ELSE 'rejected' END AS status,
                COUNT(*) AS n_events
         FROM n GROUP BY 1, 2""",
    "l4_coercion_discards" ->
      """SELECT event_type,
                CASE WHEN value = floor(value) THEN 'loaded' ELSE 'discarded' END AS status,
                COUNT(*) AS n
         FROM events GROUP BY 1, 2""",
    "l3_schema_consolidation" ->
      """SELECT 'k' AS key,
                CASE WHEN TRY_CAST(regexp_extract(props, '"k":\s*(-?\d+(\.\d+)?)', 1) AS DOUBLE)
                       = floor(TRY_CAST(regexp_extract(props, '"k":\s*(-?\d+(\.\d+)?)', 1) AS DOUBLE))
                     THEN 'int' ELSE 'float' END AS winning_type,
                event_id AS first_seen_event
         FROM events WHERE props LIKE '%"k"%'
         ORDER BY event_id LIMIT 1""",
    "w10_full_event" ->
      """SELECT event_id,
                '{"event_id":' || CAST(event_id AS VARCHAR) || ',"event_type":"' || event_type || '"}' AS rudder_event
         FROM events ORDER BY event_id LIMIT 100""",
    // independent recomputation of the registry fold: DuckDB re-infers
    // the warehouse type of every key from the raw JSON (same datatype
    // rules as W5, incl. the >512-char text threshold), then replays
    // first-batch-wins + text-upgrade
    "l3c_streaming_evolution" ->
      """WITH batches(batch_no, id, js) AS (VALUES
           (0, 1, '{"a":1,"s":"hi"}'),
           (0, 2, '{"a":2.5}'),
           (1, 3, '{"b":2.5,"s":"' || repeat('x', 600) || '"}'),
           (2, 4, '{"c":"2024-01-01","a":"oops"}')),
         kv AS (
           SELECT batch_no, id, k AS key,
             CASE json_type(json_extract(js, '$.' || k))
               WHEN 'BOOLEAN' THEN 'boolean'
               WHEN 'UBIGINT' THEN 'int' WHEN 'BIGINT' THEN 'int'
               WHEN 'DOUBLE' THEN (CASE WHEN CAST(json_extract(js, '$.' || k) AS DOUBLE)
                     = floor(CAST(json_extract(js, '$.' || k) AS DOUBLE)) THEN 'int' ELSE 'float' END)
               WHEN 'VARCHAR' THEN (CASE
                     WHEN regexp_matches(json_extract_string(js, '$.' || k),
                       '^\d{4}-\d{2}-\d{2}([ T]\d{2}:\d{2}(:\d{2}(\.\d+)?)?(Z|[+-]\d{2}:?\d{2})?)?$')
                       THEN 'datetime'
                     WHEN length(json_extract_string(js, '$.' || k)) > 512 THEN 'text'
                     ELSE 'string' END)
               ELSE 'json' END AS typ
           FROM (SELECT batch_no, id, js, unnest(json_keys(js)) AS k FROM batches)),
         f AS (SELECT key, typ, batch_no FROM (
                 SELECT key, typ, batch_no,
                   ROW_NUMBER() OVER (PARTITION BY key ORDER BY batch_no, id) AS rn
                 FROM kv)
               WHERE rn = 1),
         saw AS (SELECT DISTINCT key FROM kv WHERE typ = 'text')
         SELECT f.key AS column_name,
           CASE WHEN f.typ = 'string' AND saw.key IS NOT NULL THEN 'text' ELSE f.typ END AS wh_type,
           CAST(f.batch_no AS BIGINT) AS first_batch
         FROM f LEFT JOIN saw ON f.key = saw.key"""
  )
}
