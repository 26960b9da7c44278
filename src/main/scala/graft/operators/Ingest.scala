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

  // ---------------------------------------------------- s3b: breadth + auth

  private def sha256Hex(s: String): String =
    java.security.MessageDigest.getInstance("SHA-256")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  /** HMAC-structured keyed hash over the raw body, with HEX-STRING
    * intermediates: sig = H(secret ':' H(secret ':' body)). The
    * two-pass keyed structure is HMAC's; the hex intermediate (instead
    * of raw digest bytes) keeps every value VARCHAR so DuckDB's
    * sha256(VARCHAR) replays it — the true byte-level HMAC-SHA256 is
    * the same expression shape over binary concat (IngestSpec pins the
    * Spark sha2/unhex/concat chain against javax.crypto.Mac).
    */
  private def keyedSigHex(secret: String, body: String): String =
    sha256Hex(secret + ":" + sha256Hex(secret + ":" + body))

  /** Spark column form of keyedSigHex — a pure codegen'd sha2 chain. */
  private[operators] def keyedSig(secret: org.apache.spark.sql.Column,
                                  body: org.apache.spark.sql.Column) =
    sha2(concat(secret, lit(":"), sha2(concat(secret, lit(":"), body), 256)), 256)

  /** True HMAC-SHA256 as a Spark expression over binary: the standard
    * H(K⊕opad ‖ H(K⊕ipad ‖ m)) with the key pre-padded/xored driver-
    * side (it is config, not data). Used by signature-verifying
    * sources where the provider mandates real HMAC; oracle-checked
    * flows use keyedSig above only because DuckDB cannot hash blobs.
    */
  private[operators] def hmacSha256(secret: String, body: org.apache.spark.sql.Column) = {
    val key = secret.getBytes("UTF-8").padTo(64, 0.toByte)
    val ipad = key.map(b => (b ^ 0x36).toByte)
    val opad = key.map(b => (b ^ 0x5c).toByte)
    sha2(concat(lit(opad), unhex(sha2(concat(lit(ipad), body.cast("binary")), 256))), 256)
  }

  /** 16-provider registry (single-event shapes): provider →
    * (user path, event path, webhook secret). Adding a provider stays
    * a data change. The reference routes 40+ sourceTypes through
    * exactly this kind of per-provider mapping
    * (gateway/webhook/webhook.go:127).
    */
  private val webhookRules2: Seq[(String, String, String)] = Seq(
    ("shopfront", "$.customer.id", "$.event_name"),
    ("payproc", "$.data.object.customer", "$.kind"),
    ("mailer", "$.recipient", "$.event"),
    ("adnet", "$.click.uid", "$.type"),
    ("crmx", "$.contact.email_id", "$.action"),
    ("surveyr", "$.respondent", "$.survey.status"),
    ("chatops", "$.actor.id", "$.event_type"),
    ("vidhost", "$.viewer", "$.action"),
    ("bookly", "$.booking.user_email", "$.status"),
    ("shipfast", "$.shipment.recipient_id", "$.milestone"),
    ("paywall", "$.subscriber.uid", "$.notification"),
    ("gamehub", "$.player.tag", "$.achievement.kind"),
    ("docsign", "$.signer.email", "$.envelope_status"),
    ("schedly", "$.invitee.email", "$.event"),
    ("formz", "$.submission.respondent", "$.form_event"),
    ("newsly", "$.reader_id", "$.interaction"))

  private def secretOf(provider: String) = s"whsec_$provider"

  private val singleHooks2: Seq[(Long, String, String)] = Seq(
    (1L, "shopfront", """{"customer":{"id":"c1"},"event_name":"order_paid","total":"49.99"}"""),
    (2L, "payproc", """{"data":{"object":{"customer":"c3"}},"kind":"invoice.paid"}"""),
    (3L, "mailer", """{"recipient":"c4","event":"email_open","campaign":"summer"}"""),
    (4L, "adnet", """{"click":{"uid":"c7"},"type":"ad_click","bid":0.03}"""),
    (5L, "crmx", """{"contact":{"email_id":"c8"},"action":"contact_created"}"""),
    (6L, "surveyr", """{"respondent":"c9","survey":{"status":"completed","id":"s1"}}"""),
    (7L, "chatops", """{"actor":{"id":"c10"},"event_type":"message_posted","channel":"ops"}"""),
    (8L, "vidhost", """{"viewer":"c11","action":"video_play","video":"v42"}"""),
    (9L, "bookly", """{"booking":{"user_email":"c12@x.io","room":"r9"},"status":"confirmed"}"""),
    (10L, "shipfast", """{"shipment":{"recipient_id":"c13","track":"T1"},"milestone":"delivered"}"""),
    (11L, "paywall", """{"subscriber":{"uid":"c14"},"notification":"renewal_upcoming"}"""),
    (12L, "gamehub", """{"player":{"tag":"c15"},"achievement":{"kind":"level_up","level":7}}"""),
    (13L, "docsign", """{"signer":{"email":"c16@x.io"},"envelope_status":"signed"}"""),
    (14L, "schedly", """{"invitee":{"email":"c17@x.io"},"event":"meeting_booked"}"""),
    (15L, "formz", """{"submission":{"respondent":"c18"},"form_event":"submitted"}"""),
    (16L, "newsly", """{"reader_id":"c19","interaction":"article_like"}"""))

  /** Array-batched shapes: a push service carrying N events, and a
    * Shopify-like order with nested line items exploding to one
    * canonical event per item.
    */
  private val pushHook2: (Long, String, String) =
    (17L, "pushsvc", """{"events":[{"user":"c5","name":"push_open"},{"user":"c6","name":"push_dismiss"},{"user":"c5","name":"push_click"}]}""")
  private val cartHook2: (Long, String, String) =
    (18L, "cartly", """{"order":{"customer_id":"c20"},"line_items":[{"sku":"SKU-1","qty":2},{"sku":"SKU-7","qty":1}]}""")

  /** hook 19 is hook 4's body re-sent with a FORGED signature — it
    * must normalize but flag sig_valid = false.
    */
  private val forgedHook2: (Long, String, String, String) =
    (19L, "adnet", """{"click":{"uid":"c7"},"type":"ad_click","bid":0.03}""",
      "deadbeef" * 8)

  /** (hook_id, provider, body, provided signature) — signatures are
    * generated with the same keyed construction both engines verify,
    * except the forged one.
    */
  private val hooks2: Seq[(Long, String, String, String)] =
    (singleHooks2 :+ pushHook2 :+ cartHook2).map { case (id, p, js) =>
      (id, p, js, keyedSigHex(secretOf(p), js))
    } :+ forgedHook2

  private val hooks2Sql: String =
    hooks2.map { case (id, p, js, sig) =>
      s"($id, '$p', '${js.replace("'", "''")}', '$sig')"
    }.mkString("(VALUES ", ", ", ")")

  private val rules2Sql: String =
    webhookRules2.map { case (p, u, e) => s"('$p', '$u', '$e', '${secretOf(p)}')" }
      .mkString("(VALUES ", ", ", ")")

  /** s3c: the registry at the reference's full 40+ sourceType breadth
    * (gateway/webhook/webhook.go:127) — 38 single-event JSON shapes,
    * two array-batched shapes, one form-encoded shape. Rows are
    * (provider, kind, user path, event path); kind picks the decode
    * branch, so breadth stays a data change.
    */
  private val webhookRules3Extra: Seq[(String, String, String)] = Seq(
    ("ticketly", "$.attendee.id", "$.ticket_event"),
    ("streamcast", "$.subscriber_id", "$.notification_type"),
    ("helpdesky", "$.requester.email", "$.ticket.status"),
    ("referralx", "$.referrer.code", "$.milestone"),
    ("loyaltyhub", "$.member.card", "$.reward_event"),
    ("webinarly", "$.registrant.email", "$.session_event"),
    ("podcastr", "$.listener", "$.playback_event"),
    ("fitnessapp", "$.athlete.uid", "$.workout.kind"),
    ("travelbook", "$.traveler.pid", "$.itinerary_status"),
    ("foodorder", "$.diner.id", "$.order_stage"),
    ("rideshare", "$.rider", "$.trip_event"),
    ("bankfeed", "$.account.holder", "$.txn_type"),
    ("insurely", "$.policy.holder_id", "$.claim_status"),
    ("learnhub", "$.student.sid", "$.course_event"),
    ("jobboard", "$.applicant.email", "$.application_stage"),
    ("realtyx", "$.buyer.contact", "$.listing_event"),
    ("petcare", "$.owner_id", "$.appointment_status"),
    ("weatherpush", "$.subscriber.key", "$.alert_kind"),
    ("iotgrid", "$.device.owner", "$.telemetry_event"),
    ("photoshare", "$.uploader", "$.media_event"),
    ("musicsync", "$.listener.uid", "$.playlist_action"),
    ("newskiosk", "$.subscriber.num", "$.edition_event"))

  private val rules3: Seq[(String, String, String, String)] =
    (webhookRules2 ++ webhookRules3Extra).map { case (p, u, e) => (p, "json", u, e) } ++
      Seq(("pushsvc", "push", "", ""), ("cartly", "cart", "", ""),
        ("formsvc", "form", "u", "e"))

  private val extraHooks3: Seq[(Long, String, String)] = Seq(
    (20L, "ticketly", """{"attendee":{"id":"c21"},"ticket_event":"checked_in"}"""),
    (21L, "streamcast", """{"subscriber_id":"c22","notification_type":"live_start"}"""),
    (22L, "helpdesky", """{"requester":{"email":"c23@x.io"},"ticket":{"status":"solved"}}"""),
    (23L, "referralx", """{"referrer":{"code":"c24"},"milestone":"first_referral"}"""),
    (24L, "loyaltyhub", """{"member":{"card":"c25"},"reward_event":"points_earned"}"""),
    (25L, "webinarly", """{"registrant":{"email":"c26@x.io"},"session_event":"joined"}"""),
    (26L, "podcastr", """{"listener":"c27","playback_event":"episode_done"}"""),
    (27L, "fitnessapp", """{"athlete":{"uid":"c28"},"workout":{"kind":"run_completed"}}"""),
    (28L, "travelbook", """{"traveler":{"pid":"c29"},"itinerary_status":"ticketed"}"""),
    (29L, "foodorder", """{"diner":{"id":"c30"},"order_stage":"out_for_delivery"}"""),
    (30L, "rideshare", """{"rider":"c31","trip_event":"trip_end"}"""),
    (31L, "bankfeed", """{"account":{"holder":"c32"},"txn_type":"deposit"}"""),
    (32L, "insurely", """{"policy":{"holder_id":"c33"},"claim_status":"approved"}"""),
    (33L, "learnhub", """{"student":{"sid":"c34"},"course_event":"module_done"}"""),
    (34L, "jobboard", """{"applicant":{"email":"c35@x.io"},"application_stage":"interview"}"""),
    (35L, "realtyx", """{"buyer":{"contact":"c36"},"listing_event":"tour_booked"}"""),
    (36L, "petcare", """{"owner_id":"c37","appointment_status":"reminder_sent"}"""),
    (37L, "weatherpush", """{"subscriber":{"key":"c38"},"alert_kind":"storm_warning"}"""),
    (38L, "iotgrid", """{"device":{"owner":"c39"},"telemetry_event":"threshold_breach"}"""),
    (39L, "photoshare", """{"uploader":"c40","media_event":"album_shared"}"""),
    (40L, "musicsync", """{"listener":{"uid":"c41"},"playlist_action":"track_saved"}"""),
    (41L, "newskiosk", """{"subscriber":{"num":"c42"},"edition_event":"edition_read"}"""))

  /** A form-encoded webhook body (the reference's form-payload
    * sources): parsed with the pixel machinery but routed — and
    * signature-verified — through the same registry.
    */
  private val formHook3: (Long, String, String) =
    (42L, "formsvc", "u=c43&e=form_submit&src=landing")

  private val hooks3: Seq[(Long, String, String, String)] =
    hooks2 ++ (extraHooks3 :+ formHook3).map { case (id, p, js) =>
      (id, p, js, keyedSigHex(secretOf(p), js))
    }

  private val hooks3Sql: String =
    hooks3.map { case (id, p, js, sig) =>
      s"($id, '$p', '${js.replace("'", "''")}', '$sig')"
    }.mkString("(VALUES ", ", ", ")")

  private val rules3Sql: String =
    rules3.map { case (p, k, u, e) => s"('$p', '$k', '$u', '$e', '${secretOf(p)}')" }
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
    }),

    // S3b: the provider registry at production breadth — 16
    // single-event shapes + 2 array-batched ones (push events,
    // Shopify-like nested line items) — with per-provider webhook
    // SIGNATURE verification: every request's keyed-hash signature is
    // recomputed from the raw body as a codegen'd sha2 expression
    // chain and compared to the provided header value (the
    // reference's webhook auth step). A forged request still
    // normalizes but carries sig_valid = false for the gateway to
    // reject/stash. Secrets live in the broadcast rule registry —
    // config, not data.
    "s3b_webhook_providers" -> ((s, dir) => {
      val sess = s
      import sess.implicits._
      import org.apache.spark.sql.types.{ArrayType, MapType, StringType}
      val hooks = hooks2.toDF("hook_id", "provider", "js", "sig")
      val rules = webhookRules2.map { case (p, u, e) => (p, u, e, secretOf(p)) }
        .toDF("provider", "user_path", "event_path", "secret")
      val single = hooks.join(broadcast(rules), Seq("provider"))
        .select(col("hook_id"), col("provider"),
          expr("get_json_object(js, user_path)").as("user_id"),
          expr("get_json_object(js, event_path)").as("event"),
          (keyedSig(col("secret"), col("js")) === col("sig")).as("sig_valid"))
      val push = hooks.filter(col("provider") === "pushsvc")
        .select(col("hook_id"), col("provider"), col("js"),
          (keyedSig(lit(secretOf("pushsvc")), col("js")) === col("sig")).as("sig_valid"))
        .select(col("hook_id"), col("provider"), col("sig_valid"),
          explode(from_json(get_json_object(col("js"), "$.events"),
            ArrayType(MapType(StringType, StringType)))).as("ev"))
        .select(col("hook_id"), col("provider"),
          col("ev")("user").as("user_id"), col("ev")("name").as("event"),
          col("sig_valid"))
      val cart = hooks.filter(col("provider") === "cartly")
        .select(col("hook_id"), col("provider"),
          get_json_object(col("js"), "$.order.customer_id").as("user_id"), col("js"),
          (keyedSig(lit(secretOf("cartly")), col("js")) === col("sig")).as("sig_valid"))
        .select(col("hook_id"), col("provider"), col("user_id"), col("sig_valid"),
          explode(from_json(get_json_object(col("js"), "$.line_items"),
            ArrayType(MapType(StringType, StringType)))).as("item"))
        .select(col("hook_id"), col("provider"), col("user_id"),
          concat(lit("order_item_"), col("item")("sku")).as("event"),
          col("sig_valid"))
      single.unionByName(push).unionByName(cart)
    }),

    // S3c: the registry at the reference's FULL sourceType breadth —
    // 41 providers (38 single-event JSON shapes, the push-array and
    // nested-line-item array shapes, and a form-encoded shape), every
    // request signature-verified with its provider secret. The decode
    // branch is picked by the registry's `kind` column, so provider
    // #42 is one data row; the forged adnet request still flows
    // through with sig_valid = false.
    "s3c_webhook_registry40" -> ((s, dir) => {
      val sess = s
      import sess.implicits._
      import org.apache.spark.sql.types.{ArrayType, MapType, StringType}
      val hooks = hooks3.toDF("hook_id", "provider", "js", "sig")
      val rules = rules3.map { case (p, k, u, e) => (p, k, u, e, secretOf(p)) }
        .toDF("provider", "kind", "user_path", "event_path", "secret")
      val jsonSide = hooks.join(broadcast(rules.filter(col("kind") === "json")), Seq("provider"))
        .select(col("hook_id"), col("provider"),
          expr("get_json_object(js, user_path)").as("user_id"),
          expr("get_json_object(js, event_path)").as("event"),
          (keyedSig(col("secret"), col("js")) === col("sig")).as("sig_valid"))
      val push = hooks.filter(col("provider") === "pushsvc")
        .select(col("hook_id"), col("provider"), col("js"),
          (keyedSig(lit(secretOf("pushsvc")), col("js")) === col("sig")).as("sig_valid"))
        .select(col("hook_id"), col("provider"), col("sig_valid"),
          explode(from_json(get_json_object(col("js"), "$.events"),
            ArrayType(MapType(StringType, StringType)))).as("ev"))
        .select(col("hook_id"), col("provider"),
          col("ev")("user").as("user_id"), col("ev")("name").as("event"),
          col("sig_valid"))
      val cart = hooks.filter(col("provider") === "cartly")
        .select(col("hook_id"), col("provider"),
          get_json_object(col("js"), "$.order.customer_id").as("user_id"), col("js"),
          (keyedSig(lit(secretOf("cartly")), col("js")) === col("sig")).as("sig_valid"))
        .select(col("hook_id"), col("provider"), col("user_id"), col("sig_valid"),
          explode(from_json(get_json_object(col("js"), "$.line_items"),
            ArrayType(MapType(StringType, StringType)))).as("item"))
        .select(col("hook_id"), col("provider"), col("user_id"),
          concat(lit("order_item_"), col("item")("sku")).as("event"),
          col("sig_valid"))
      val form = hooks.join(broadcast(rules.filter(col("kind") === "form")), Seq("provider"))
        .withColumn("params", expr("str_to_map(js, '&', '=')"))
        .select(col("hook_id"), col("provider"),
          expr("params[user_path]").as("user_id"),
          expr("params[event_path]").as("event"),
          (keyedSig(col("secret"), col("js")) === col("sig")).as("sig_valid"))
      jsonSide.unionByName(push).unionByName(cart).unionByName(form)
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
                FROM hooks WHERE provider = 'pushsvc')""",
    "s3b_webhook_providers" ->
      s"""WITH rules(provider, user_path, event_path, secret) AS $rules2Sql,
          hooks(hook_id, provider, js, sig) AS $hooks2Sql
          SELECT hook_id, h.provider,
                 json_extract_string(js, user_path) AS user_id,
                 json_extract_string(js, event_path) AS event,
                 sha256(secret || ':' || sha256(secret || ':' || js)) = sig AS sig_valid
          FROM hooks h JOIN rules r ON h.provider = r.provider
          UNION ALL
          SELECT hook_id, provider,
                 json_extract_string(e, '$$.user') AS user_id,
                 json_extract_string(e, '$$.name') AS event,
                 sha256('whsec_pushsvc' || ':' || sha256('whsec_pushsvc' || ':' || js)) = sig
          FROM (SELECT hook_id, provider, js, sig,
                       unnest(CAST(js->'$$.events' AS JSON[])) AS e
                FROM hooks WHERE provider = 'pushsvc')
          UNION ALL
          SELECT hook_id, provider,
                 json_extract_string(js, '$$.order.customer_id') AS user_id,
                 'order_item_' || json_extract_string(item, '$$.sku') AS event,
                 sha256('whsec_cartly' || ':' || sha256('whsec_cartly' || ':' || js)) = sig
          FROM (SELECT hook_id, provider, js, sig,
                       unnest(CAST(js->'$$.line_items' AS JSON[])) AS item
                FROM hooks WHERE provider = 'cartly')""",
    "s3c_webhook_registry40" ->
      s"""WITH rules(provider, kind, user_path, event_path, secret) AS $rules3Sql,
          hooks(hook_id, provider, js, sig) AS $hooks3Sql
          SELECT hook_id, h.provider,
                 json_extract_string(js, user_path) AS user_id,
                 json_extract_string(js, event_path) AS event,
                 sha256(secret || ':' || sha256(secret || ':' || js)) = sig AS sig_valid
          FROM hooks h JOIN rules r ON h.provider = r.provider AND r.kind = 'json'
          UNION ALL
          SELECT hook_id, provider,
                 json_extract_string(e, '$$.user') AS user_id,
                 json_extract_string(e, '$$.name') AS event,
                 sha256('whsec_pushsvc' || ':' || sha256('whsec_pushsvc' || ':' || js)) = sig
          FROM (SELECT hook_id, provider, js, sig,
                       unnest(CAST(js->'$$.events' AS JSON[])) AS e
                FROM hooks WHERE provider = 'pushsvc')
          UNION ALL
          SELECT hook_id, provider,
                 json_extract_string(js, '$$.order.customer_id') AS user_id,
                 'order_item_' || json_extract_string(item, '$$.sku') AS event,
                 sha256('whsec_cartly' || ':' || sha256('whsec_cartly' || ':' || js)) = sig
          FROM (SELECT hook_id, provider, js, sig,
                       unnest(CAST(js->'$$.line_items' AS JSON[])) AS item
                FROM hooks WHERE provider = 'cartly')
          UNION ALL
          SELECT hook_id, h.provider,
                 nullif(regexp_extract(js, '(^|&)' || user_path || '=([^&]*)', 2), '') AS user_id,
                 nullif(regexp_extract(js, '(^|&)' || event_path || '=([^&]*)', 2), '') AS event,
                 sha256(secret || ':' || sha256(secret || ':' || js)) = sig AS sig_valid
          FROM hooks h JOIN rules r ON h.provider = r.provider AND r.kind = 'form'"""
  )
}
