package graft.operators

import graft.Q
import org.apache.spark.sql.functions._

/** Ingest-edge operators — SURVEY §2.1 S1/S2/S3: gateway batch
  * envelope unwrapping with messageId fill, pixel query-param lifting,
  * and webhook source normalization. Each is a narrow per-row map +
  * explode (one codegen stage); at scale these sit directly on the
  * streaming source before any shuffle.
  */
object Ingest {

  /** Gateway batch envelopes (gateway/handle.go:301-553 shape):
    * `batch` array of events + request metadata; one event lacks a
    * messageId to exercise fillMessageID (handle.go:320-328 — the
    * reference generates a UUID; here the fill is deterministic from
    * (envelope, position) so the oracle can mirror it).
    */
  private val envelopes: Seq[(Long, String)] = Seq(
    1L -> """{"batch":[{"type":"track","messageId":"m1","userId":"u1","event":"Order Completed"},{"type":"identify","userId":"u2"}],"requestIP":"1.2.3.4","receivedAt":"2024-01-01T00:00:01Z"}""",
    2L -> """{"batch":[{"type":"page","anonymousId":"a3","messageId":"m3"}],"requestIP":"5.6.7.8","receivedAt":"2024-01-01T00:00:02Z"}""",
    3L -> """{"batch":[{"type":"track","userId":"u4","event":"cartViewed"},{"type":"alias","messageId":"m5","userId":"u5"},{"type":"screen","anonymousId":"a6"}],"requestIP":"9.9.9.9","receivedAt":"2024-01-01T00:00:03Z"}""")

  private val envelopesSql: String =
    envelopes.map { case (id, js) => s"($id, '${js.replace("'", "''")}')" }
      .mkString("(VALUES ", ", ", ")")

  /** GET /pixel/v1/track query strings (gateway/handle_http_pixel.go). */
  private val pixels: Seq[(Long, String)] = Seq(
    1L -> "e=click&u=u1&v=2",
    2L -> "e=view&u=u2",
    3L -> "e=purchase&u=u1&v=49",
    4L -> "u=u9") // no event param

  private val pixelsSql: String =
    pixels.map { case (id, qs) => s"($id, '$qs')" }.mkString("(VALUES ", ", ", ")")

  /** Webhook payloads from seven third-party providers
    * (gateway/webhook/webhook.go: 40+ per-sourceType transformations
    * to canonical rudder events — here the registry IS a broadcast
    * mapping table of JSON paths, so adding a provider is a data
    * change, not a code change). `pushsvc` is array-batched: one
    * webhook request carries N events, the shape the reference's
    * batch webhook transformers handle.
    */
  private val webhooks: Seq[(Long, String, String)] = Seq(
    (1L, "shopfront", """{"customer":{"id":"c1"},"event_name":"order_paid","total":"49.99"}"""),
    (2L, "shopfront", """{"customer":{"id":"c2"},"event_name":"cart_add","total":"5.00"}"""),
    (3L, "payproc", """{"data":{"object":{"customer":"c3"}},"kind":"invoice.paid"}"""),
    (4L, "payproc", """{"data":{"object":{"customer":"c1"}},"kind":"charge.refunded"}"""),
    (5L, "mailer", """{"recipient":"c4","event":"email_open","campaign":"summer"}"""),
    (6L, "pushsvc", """{"events":[{"user":"c5","name":"push_open"},{"user":"c6","name":"push_dismiss"},{"user":"c5","name":"push_click"}]}"""),
    (7L, "adnet", """{"click":{"uid":"c7"},"type":"ad_click","bid":0.03}"""),
    (8L, "crmx", """{"contact":{"email_id":"c8"},"action":"contact_created"}"""),
    (9L, "surveyr", """{"respondent":"c9","survey":{"status":"completed","id":"s1"}}"""))

  private val webhooksSql: String =
    webhooks.map { case (id, p, js) => s"($id, '$p', '${js.replace("'", "''")}')" }
      .mkString("(VALUES ", ", ", ")")

  /** Single-event provider registry: provider → (user-id path, event
    * path). Declarative like the reference's sourceType map; batched
    * providers (pushsvc) are handled by the explode branch.
    */
  private val webhookRules: Seq[(String, String, String)] = Seq(
    ("shopfront", "$.customer.id", "$.event_name"),
    ("payproc", "$.data.object.customer", "$.kind"),
    ("mailer", "$.recipient", "$.event"),
    ("adnet", "$.click.uid", "$.type"),
    ("crmx", "$.contact.email_id", "$.action"),
    ("surveyr", "$.respondent", "$.survey.status"))

  private val webhookRulesSql: String =
    webhookRules.map { case (p, u, e) => s"('$p', '$u', '$e')" }
      .mkString("(VALUES ", ", ", ")")

  val defs: Map[String, Q] = Map(

    // S1: envelope → per-event rows; messageId filled deterministically
    // when absent; request metadata stamped onto every event.
    "s1_batch_ingest" -> ((s, dir) => {
      val sess = s
      import sess.implicits._
      envelopes.toDF("envelope_id", "js")
        .select(col("envelope_id"),
          get_json_object(col("js"), "$.requestIP").as("request_ip"),
          get_json_object(col("js"), "$.receivedAt").as("received_at"),
          posexplode(from_json(get_json_object(col("js"), "$.batch"),
            org.apache.spark.sql.types.DataTypes.createArrayType(
              org.apache.spark.sql.types.DataTypes.createMapType(
                org.apache.spark.sql.types.DataTypes.StringType,
                org.apache.spark.sql.types.DataTypes.StringType))))
            .as(Seq("pos", "ev")))
        .select(
          col("envelope_id"), col("pos"),
          col("ev")("type").as("type"),
          coalesce(col("ev")("messageId"),
            concat(lit("gen_"), col("envelope_id"), lit("_"), col("pos"))).as("message_id"),
          col("ev")("userId").as("user_id"),
          col("ev")("anonymousId").as("anonymous_id"),
          col("request_ip"), col("received_at"))
    }),

    // S2: pixel GET — query params lifted into an event row.
    "s2_pixel_parse" -> ((s, dir) => {
      val sess = s
      import sess.implicits._
      pixels.toDF("pixel_id", "qs")
        .withColumn("params", expr("str_to_map(qs, '&', '=')"))
        .select(col("pixel_id"),
          coalesce(col("params")("e"), lit("page_view")).as("event"),
          col("params")("u").as("user_id"),
          col("params")("v").as("value_str"))
    }),

    // S3: webhook source normalization — per-provider path mapping
    // into canonical (user_id, event) form via a broadcast rule
    // registry; the array-batched provider explodes one request into
    // its N carried events.
    "s3_webhook_normalize" -> ((s, dir) => {
      val sess = s
      import sess.implicits._
      import org.apache.spark.sql.types.{ArrayType, MapType, StringType}
      val hooks = webhooks.toDF("hook_id", "provider", "js")
      val rules = webhookRules.toDF("provider", "user_path", "event_path")
      val single = hooks.join(broadcast(rules), Seq("provider"))
        .select(col("hook_id"), col("provider"),
          expr("get_json_object(js, user_path)").as("user_id"),
          expr("get_json_object(js, event_path)").as("event"))
      val batched = hooks.filter(col("provider") === "pushsvc")
        .select(col("hook_id"), col("provider"),
          explode(from_json(get_json_object(col("js"), "$.events"),
            ArrayType(MapType(StringType, StringType)))).as("ev"))
        .select(col("hook_id"), col("provider"),
          col("ev")("user").as("user_id"), col("ev")("name").as("event"))
      single.unionByName(batched)
    })
  )

  val oracles: Map[String, String] = Map(
    "s1_batch_ingest" ->
      s"""SELECT envelope_id, i AS pos,
            json_extract_string(js, '$$.batch[' || i || '].type') AS type,
            COALESCE(json_extract_string(js, '$$.batch[' || i || '].messageId'),
                     'gen_' || envelope_id || '_' || i) AS message_id,
            json_extract_string(js, '$$.batch[' || i || '].userId') AS user_id,
            json_extract_string(js, '$$.batch[' || i || '].anonymousId') AS anonymous_id,
            json_extract_string(js, '$$.requestIP') AS request_ip,
            json_extract_string(js, '$$.receivedAt') AS received_at
          FROM (SELECT envelope_id, js,
                  unnest(range(0, CAST(json_array_length(js, '$$.batch') AS BIGINT))) AS i
                FROM $envelopesSql AS e(envelope_id, js))""",
    "s2_pixel_parse" ->
      s"""SELECT pixel_id,
            COALESCE(nullif(regexp_extract(qs, '(^|&)e=([^&]*)', 2), ''),
                     'page_view') AS event,
            nullif(regexp_extract(qs, '(^|&)u=([^&]*)', 2), '') AS user_id,
            nullif(regexp_extract(qs, '(^|&)v=([^&]*)', 2), '') AS value_str
          FROM $pixelsSql AS p(pixel_id, qs)""",
    "s3_webhook_normalize" ->
      s"""WITH rules(provider, user_path, event_path) AS $webhookRulesSql,
          hooks(hook_id, provider, js) AS $webhooksSql
          SELECT hook_id, h.provider,
                 json_extract_string(js, user_path) AS user_id,
                 json_extract_string(js, event_path) AS event
          FROM hooks h JOIN rules r ON h.provider = r.provider
          UNION ALL
          SELECT hook_id, provider,
                 json_extract_string(e, '$$.user') AS user_id,
                 json_extract_string(e, '$$.name') AS event
          FROM (SELECT hook_id, provider,
                       unnest(CAST(js->'$$.events' AS JSON[])) AS e
                FROM hooks WHERE provider = 'pushsvc')"""
  )
}
