package graft.operators

import graft.Q
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ArrayType, StringType}

/** Error-detail analytics — the reference's error extraction /
  * normalization / grouping subsystem behind its error-detail reports
  * API:
  *
  *  - er1: canonical-message EXTRACTION from raw error payloads plus
  *    cleanup and error-code classification
  *    (enterprise/reporting/error_extractor.go:122-249,376-444): a
  *    key-priority walk over reason / Error / response / error /
  *    warehouse keys, then the message-key priority list
  *    (error_message > message > description > detail > error >
  *    title) at depth <= 2 (destinationResponse, then top level — the
  *    reference recurses unboundedly; payloads are depth <= 2 in
  *    practice and the cap keeps the walk a fixed coalesce chain),
  *    errors-array joins (deduped for the warehouse branch, raw
  *    otherwise), HTML tag stripping, then the URL / IP / email /
  *    id-token / non-word redaction chain and 200-char truncation
  *    (error_extractor.go:29-36,376-389,232-243).
  *  - er2: bounded per-connection NORMALIZATION via LCS similarity +
  *    metric-group merge (error_normalizer.go:153-197,
  *    error_grouper.go:9-25): per (source, destination, PU,
  *    eventType) key a bounded canonical set (cap K, LRU order); each
  *    message maps to an exact-match canonical, else the first
  *    >=75%-similar canonical, else becomes a new canonical while
  *    |set| < K, else "RedactedError"; metric groups then merge
  *    counts by normalized message.
  *
  * LCS similarity is word-level bit-parallel (Allison & Dix, IPL
  * 1986: row' = x & ~(x - ((row<<1)|1)) with x = row | PM[word]),
  * capped at 60 words so the DP row fits one 64-bit integer — EXACT
  * integer arithmetic the DuckDB oracle replays verbatim as a
  * recursive-CTE DP, with 2*lcs/(|a|+|b|) >= 0.75 tested as an
  * integer cross-multiply (no floats anywhere).
  *
  * Scale shape: er1 is one codegen'd narrow map. er2 repartitions by
  * the connection key and streams each connection's events through a
  * sequential fold with O(K) state — the fold is order-dependent by
  * the reference's own semantics (a mutex-guarded in-memory set per
  * key, error_normalizer.go:156), so per-key sequential processing IS
  * the operator; parallelism comes from the key space (the reference
  * caps it at maxGroups=10000 connections), and per-row work is a
  * <=K-entry scan, so one hot connection streams in O(rows * K).
  */
object Errors {

  /** Per-connection error metric event (streaming input). */
  case class ErrEvent(source_id: String, destination_id: String, pu: String,
                      event_type: String, seq: Long, error_message: String, n: Long)

  // ---- shared constants (Spark + oracle use the same strings) ----

  private val msgKeys = Seq("error_message", "message", "description", "detail", "error", "title")
  private val whKeys =
    Seq("internal_processing_failed", "fetching_remote_schema_failed", "exporting_data_failed")
  private val warehouseTypes = Seq("RS", "POSTGRES", "BQ", "SNOWFLAKE", "CLICKHOUSE", "DELTALAKE")

  // CleanUpErrorMessage regex chain (error_extractor.go:29-36) —
  // identical pattern text runs through Spark (Java regex) and DuckDB
  // (RE2); every construct used (\b \S \d \W \s {m,n} (?:..)) means
  // the same thing in both.
  private val reUrl = """\b((?:https?://|www\.)\S+)\b"""
  private val reIp = """\b(?:\d{1,3}\.){3}\d{1,3}\b"""
  private val reEmail = """\b[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Z|a-z]{2,}\b"""
  private val reId = """\b([a-zA-Z0-9-_]*\d[a-zA-Z0-9-_]*)\b"""
  private val reNotWord = """\W+"""
  private val reSpace = """\s+"""
  private val reTag = """<[^>]*>"""
  private val maxLen = 200

  private val simNum = 75 // similarityThreshold 0.75 as an integer ratio
  // LCS word cap: both inputs are truncated to their first 60 words so
  // the Allison-Dix bit-parallel DP row fits one 64-bit word in BOTH
  // engines (the oracle replays the row arithmetic exactly). A pair of
  // >60-word messages therefore compares on prefixes — a DOCUMENTED
  // determinism trade vs the reference's uncapped lcs.Similarity; in
  // practice er1's CleanUpErrorMessage caps messages at 200 chars
  // upstream, so only pathological short-word messages reach the cap.
  // Full fidelity would swap in a multi-word DP (array of 64-bit rows)
  // beyond 60 words at the cost of a far hairier oracle replay.
  private val wordCap = 60
  private val maxPerGroupDefault = 3 // maxErrorsPerGroup (20 in the reference config)

  // ---- er1 fixture: raw error payloads exercising every branch ----

  private val longTail = ("critically long failure explanation " * 8) + "tail"

  /** (err_id, dest_type, error_category, error_type, payload). */
  private val errPayloads: Seq[(Long, String, String, String, String)] = Seq(
    (1L, "WEBHOOK", "network", "timeout", "connection refused: dial tcp 10.0.0.1:443"),
    (2L, "WEBHOOK", "", "", """{"reason": "quota exceeded for project abc123"}"""),
    (3L, "WEBHOOK", "", "", """{"Error": "context deadline exceeded\nat frame one"}"""),
    (4L, "BRAZE", "", "", """{"response": "{\"message\": \"Invalid API key\", \"code\": 400}"}"""),
    (5L, "BRAZE", "", "",
      """{"response": "{\"destinationResponse\": {\"error_message\": \"event rejected by destination\"}}"}"""),
    (6L, "BRAZE", "", "",
      """{"response": "<html><head><title>502 Bad Gateway</title></head><body>upstream connect error</body></html>"}"""),
    (7L, "BRAZE", "", "", """{"response": "service unavailable try again"}"""),
    (8L, "RS", "", "",
      """{"internal_processing_failed": {"errors": ["load failed", "load failed", "schema mismatch"]}}"""),
    (9L, "POSTGRES", "", "", """{"fetching_remote_schema_failed": {"errors": ["connection reset by peer"]}}"""),
    (10L, "WEBHOOK", "", "", """{"message": "user does not exist in workspace"}"""),
    (11L, "WEBHOOK", "", "", """{"errors": ["invalid event type", "missing user id"]}"""),
    (12L, "WEBHOOK", "", "", """{"response": "{\"msg\": \"too many requests\"}"}"""),
    (13L, "AM", "", "", "https://api.example.com/v1/track returned 429 contact ops@example.com"),
    (14L, "WEBHOOK", "", "", """{"reason": "api version v1 deprecated please upgrade"}"""),
    (15L, "WEBHOOK", "", "", s"""{"message": "$longTail"}"""),
    (16L, "RS", "", "", """{"reason": "api version v1 deprecated please upgrade"}"""))

  private def sqlStr(s: String): String = "'" + s.replace("'", "''") + "'"

  private val errPayloadsSql: String = errPayloads
    .map { case (i, d, c, t, p) => s"($i, ${sqlStr(d)}, ${sqlStr(c)}, ${sqlStr(t)}, ${sqlStr(p)})" }
    .mkString("(VALUES ", ", ", ")")

  // ---- er2 fixture: per-connection error metric stream ----

  /** (source_id, destination_id, pu, event_type, seq, error_message, n).
    * Designed so similarity clusters are cliques well separated from
    * each other (each message is >=75%-similar to exactly one
    * canonical), the 4th cluster arrives after the canonical set is
    * full (exercising RedactedError), and exact repeats land on an
    * established canonical.
    */
  private val edEvents: Seq[(String, String, String, String, Long, String, Long)] = Seq(
    ("s1", "d1", "router", "track", 1L, "connection timed out after ms to endpoint", 5L),
    ("s1", "d1", "router", "track", 2L, "connection timed out after ms to host", 3L),
    ("s1", "d1", "router", "track", 3L, "invalid api key provided for destination", 7L),
    ("s1", "d1", "router", "track", 4L, "connection timed out after ms to server", 2L),
    ("s1", "d1", "router", "track", 5L, "rate limit exceeded retry later please", 4L),
    ("s1", "d1", "router", "track", 6L, "invalid api key provided for endpoint", 1L),
    ("s1", "d1", "router", "track", 7L, "unexpected response status from gateway worker", 6L),
    ("s1", "d1", "router", "track", 8L, "rate limit exceeded retry later soon", 2L),
    ("s1", "d1", "router", "track", 9L, "unexpected response status from gateway handler", 3L),
    ("s1", "d1", "router", "track", 10L, "connection timed out after ms to endpoint", 8L),
    ("s2", "d2", "proc", "identify", 1L, "warehouse load failed due to schema mismatch", 5L),
    ("s2", "d2", "proc", "identify", 2L, "warehouse load failed due to type mismatch", 3L),
    ("s2", "d2", "proc", "identify", 3L, "warehouse load failed due to schema mismatch", 2L))

  private val edEventsSql: String = edEvents
    .map { case (s, d, p, e, q, m, n) =>
      s"(${sqlStr(s)}, ${sqlStr(d)}, ${sqlStr(p)}, ${sqlStr(e)}, $q, ${sqlStr(m)}, $n)"
    }
    .mkString("(VALUES ", ", ", ")")

  // ---- er1: extraction expressions ----

  /** getErrorMessageFromResponse (error_extractor.go:304-344): msg
    * direct hit, destinationResponse walk, top-level walk, errors
    * array joined with ".".
    */
  private def msgWalk(v: Column): Column = {
    val parts = Seq(get_json_object(v, "$.msg")) ++
      msgKeys.map(k => get_json_object(v, "$.destinationResponse." + k)) ++
      msgKeys.map(k => get_json_object(v, "$." + k)) :+
      array_join(from_json(get_json_object(v, "$.errors"), ArrayType(StringType)), ".")
    coalesce(parts: _*)
  }

  /** handleResponseOrErrorKey (error_extractor.go:189-205): embedded
    * JSON gets the message walk, HTML gets tag-stripped, plain strings
    * pass through.
    */
  private def respOrErr(v: Column): Column =
    when(v.startsWith("{") && get_json_object(v, "$").isNotNull, msgWalk(v))
      .when(lower(v).contains("<html") || lower(v).contains("<body"),
        trim(regexp_replace(v, reTag, " ")))
      .otherwise(v)

  private def cleanup(c: Column): Column = {
    val chained = Seq(reUrl, reIp, reEmail, reId, reNotWord, reSpace)
      .foldLeft(c)((acc, re) => regexp_replace(acc, re, " "))
    trim(chained)
  }

  /** GetErrorMessage + GetErrorCode as one projection. */
  def extractErrors(df: DataFrame): DataFrame = {
    val p = col("payload")
    val isJson = ltrim(p).startsWith("{") && get_json_object(p, "$").isNotNull
    val whArr = coalesce(whKeys.map(k => get_json_object(p, "$." + k + ".errors")): _*)
    val whMsg = array_join(array_distinct(from_json(whArr, ArrayType(StringType))), ".")
    val extracted = when(!isJson, p).otherwise(coalesce(
      get_json_object(p, "$.reason"),
      substring_index(get_json_object(p, "$.Error"), "\n", 1),
      respOrErr(get_json_object(p, "$.response")),
      respOrErr(get_json_object(p, "$.error")),
      whMsg,
      msgWalk(p),
      lit("")))
    val cleaned = cleanup(extracted)
    val message = when(length(cleaned) > maxLen,
      concat(substring(cleaned, 1, maxLen), lit("..."))).otherwise(cleaned)
    val lm = lower(message)
    def ckey(k: String) = lm.startsWith(k) || lm.contains(" " + k)
    val kwHit = ckey("deprecated") || ckey("sunset") || ckey("unsupported") ||
      lm.contains("no longer supported") || lm.contains("end of life") ||
      lm.contains("please upgrade")
    val isDep = (ckey("version") || ckey("endpoint") || ckey("api")) && kwHit
    val statCode = when(col("error_category") =!= "" || col("error_type") =!= "",
      concat_ws(":",
        when(col("error_category") =!= "", col("error_category")),
        when(col("error_type") =!= "", col("error_type"))))
    val code = when(statCode.isNotNull, statCode)
      .when(col("dest_type").isin(warehouseTypes: _*), lit(""))
      .when(isDep, lit("deprecation"))
      .otherwise(lit(""))
    df.select(col("err_id"), message.as("message"), code.as("error_code"))
  }

  // ---- er2: bit-parallel LCS + the bounded-set fold ----

  /** Word-level LCS length via the Allison-Dix bit-vector recurrence;
    * both inputs capped at [[wordCap]] words.
    */
  private[operators] def lcsWords(a: Array[String], b: Array[String]): Int = {
    val nb = math.min(b.length, wordCap)
    val pm = new java.util.HashMap[String, java.lang.Long]()
    var j = 0
    while (j < nb) {
      pm.merge(b(j), java.lang.Long.valueOf(1L << j), (x, y) => java.lang.Long.valueOf(x | y))
      j += 1
    }
    var row = 0L
    val na = math.min(a.length, wordCap)
    var i = 0
    while (i < na) {
      val m = pm.get(a(i))
      val x = row | (if (m == null) 0L else m.longValue())
      row = x & ~(x - ((row << 1) | 1L))
      i += 1
    }
    java.lang.Long.bitCount(row)
  }

  /** lcs.Similarity >= 0.75, computed as an exact integer cross-
    * multiply over capped word counts.
    */
  private[operators] def similar(a: String, b: String): Boolean = {
    val aw = a.split(" ")
    val bw = b.split(" ")
    val na = math.min(aw.length, wordCap)
    val nb = math.min(bw.length, wordCap)
    2 * lcsWords(aw, bw) * 100 >= simNum * (na + nb)
  }

  /** One NormalizeError step (error_normalizer.go:153-197): exact hit
    * returns the message (LRU touch), then first similar canonical
    * (LRU touch), then admission while below cap, else RedactedError.
    */
  private[operators] def normalizeOne(
      canon: scala.collection.mutable.ArrayBuffer[String],
      msg: String,
      cap: Int): String = {
    val exact = canon.indexOf(msg)
    if (exact >= 0) { canon.remove(exact); canon += msg; msg }
    else {
      val si = canon.indexWhere(c => similar(msg, c))
      if (si >= 0) { val c = canon.remove(si); canon += c; c }
      else if (canon.size >= cap) "RedactedError"
      else { canon += msg; msg }
    }
  }

  /** Normalize per-connection error messages through the bounded
    * canonical set (the sequential fold). Input columns: source_id,
    * destination_id, pu, event_type, seq, error_message, n; output
    * adds raw_message/normalized.
    */
  def normalize(df: DataFrame, maxPerGroup: Int): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val sorted = df
      .select("source_id", "destination_id", "pu", "event_type", "seq", "error_message", "n")
      .as[(String, String, String, String, Long, String, Long)]
      .repartition(col("source_id"), col("destination_id"), col("pu"), col("event_type"))
      .sortWithinPartitions("source_id", "destination_id", "pu", "event_type", "seq")
    sorted.mapPartitions { it =>
      var key: (String, String, String, String) = null
      val canon = scala.collection.mutable.ArrayBuffer.empty[String]
      it.map { case (src, dst, pu, et, _, msg, n) =>
        val k = (src, dst, pu, et)
        if (k != key) { key = k; canon.clear() }
        (src, dst, pu, et, msg, normalizeOne(canon, msg, maxPerGroup), n)
      }
    }.toDF("source_id", "destination_id", "pu", "event_type", "raw_message", "normalized", "n")
  }

  /** Streaming twin of [[normalize]]: the same fold as a
    * flatMapGroupsWithState keyed by the connection, with the bounded
    * canonical set (in LRU order) in the state store — the reference
    * holds exactly this set in a mutex-guarded per-key map
    * (error_normalizer.go:156), so cross-batch carry reproduces its
    * long-running-process behavior: a canonical admitted in one
    * micro-batch keeps absorbing similar messages in all later ones.
    * State is <= maxPerGroup strings per live connection (the
    * reference caps connections at maxGroups=10000).
    */
  def normalizeStream(
      events: org.apache.spark.sql.Dataset[Errors.ErrEvent],
      maxPerGroup: Int)
    : org.apache.spark.sql.Dataset[(String, String, String, String, String, String, Long)] = {
    import events.sparkSession.implicits._
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    events
      .groupByKey(e => (e.source_id, e.destination_id, e.pu, e.event_type))
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout)(
        (key: (String, String, String, String), it: Iterator[Errors.ErrEvent],
         state: GroupState[List[String]]) => {
          val canon = scala.collection.mutable.ArrayBuffer[String](
            state.getOption.getOrElse(Nil): _*)
          val out = it.toSeq.sortBy(_.seq).map { e =>
            (key._1, key._2, key._3, key._4, e.error_message,
              normalizeOne(canon, e.error_message, maxPerGroup), e.n)
          }
          state.update(canon.toList)
          out.iterator
        })
  }

  /** [[normalize]] + metric-group merge by normalized message
    * (error_grouper.go:9-25).
    */
  def normalizeAndGroup(df: DataFrame, maxPerGroup: Int): DataFrame =
    normalize(df, maxPerGroup)
      .groupBy("source_id", "destination_id", "pu", "event_type", "normalized")
      .agg(sum("n").as("total_n"), countDistinct("raw_message").as("n_messages"))
      .withColumnRenamed("normalized", "error_message")

  val defs: Map[String, Q] = Map(
    // ER3: dead-letter REPLAY planner — the drain half of the stash
    // loop (processor stash unstash + router/utils Drain +
    // router backoff, the dr1/d1 decision classes applied to the
    // error stash): each failed delivery carries a status code and an
    // attempt count; terminal 4xx aborts, exhausted retries (>= 3
    // attempts) abort, everything else lands in an exponential-
    // backoff replay slot (1 << attempts minutes, the router's
    // doubling schedule). Output = the per-day replay work list a
    // scheduler drains — one scan with the error filter PUSHED, one
    // (date, decision, slot)-keyed rollup; slot cardinality is the
    // attempt cap, so the plan is calendar × classes sized.
    "er3_error_replay" -> ((s, dir) => {
      graft.Tables.events(s, dir)
        .filter(col("event_type") === "error")
        .select(col("event_id"),
          to_date(col("ts")).cast("string").as("failed_date"),
          (lit(400L) + (col("event_id") % 8) * 25L).as("status_code"),
          (col("event_id") % 5 + 1L).as("attempts"))
        .withColumn("decision",
          when(col("status_code") < 500L, lit("aborted_4xx"))
            .when(col("attempts") >= 3L, lit("aborted_max_attempts"))
            .otherwise(lit("replay")))
        .withColumn("backoff_min",
          when(col("decision") === "replay",
            expr("shiftleft(CAST(1 AS BIGINT), CAST(attempts AS INT))"))
            .otherwise(lit(null).cast("long")))
        .groupBy(col("failed_date"), col("decision"), col("backoff_min"))
        .agg(count(lit(1)).as("n_jobs"),
          min(col("event_id")).as("min_id"), max(col("event_id")).as("max_id"))
    }),
    // ER4: ERROR-BUDGET BURN-RATE ALERTS — the multi-window SRE read
    // of the error stash (dq5 gates freshness; this gates delivery
    // HEALTH): per destination and hour, the failure share in ppm
    // over the 1-hour and trailing-6-hour windows, expressed as a
    // burn MULTIPLE of the 5% error budget (permille). The
    // two-window rule is the standard fast-burn/slow-burn alert
    // ladder: page only when BOTH windows burn hot (a lone hot hour
    // is noise; a hot 6-hour window with a cool current hour is
    // already recovering), warn on a sustained slow burn. All exact
    // integer DIV. Plan shape: ONE corpus aggregate to (destination,
    // hour) — everything after runs on the calendar-bounded hour
    // series, destination-partitioned RANGE frame (q42's active-hour
    // lesson: a rows-frame would silently widen across gaps).
    "er4_burn_rate" -> ((s, dir) => {
      val budget = 50000L // 5% of deliveries may fail, ppm
      val hourUs = 3600000000L
      val hours = graft.Tables.events(s, dir)
        .select(concat(lit("dest_"), col("event_id") % 4).as("destination"),
          expr(s"unix_micros(ts) DIV ${hourUs}L").as("h"),
          when(col("event_type") === "error", 1L).otherwise(0L).as("err"))
        .groupBy(col("destination"), col("h"))
        .agg(count(lit(1)).as("n"), sum(col("err")).as("n_err"))
      val w6 = Window.partitionBy(col("destination")).orderBy(col("h"))
        .rangeBetween(-5, 0)
      hours
        .withColumn("rate_ppm", expr("n_err * 1000000L DIV n"))
        .withColumn("n6", sum(col("n")).over(w6))
        .withColumn("err6", sum(col("n_err")).over(w6))
        .withColumn("rate6_ppm", expr("err6 * 1000000L DIV n6"))
        .withColumn("burn_short_pm", expr(s"rate_ppm * 1000L DIV ${budget}L"))
        .withColumn("burn_long_pm", expr(s"rate6_ppm * 1000L DIV ${budget}L"))
        .withColumn("tier",
          when(col("burn_short_pm") >= 8000L && col("burn_long_pm") >= 5000L, "page")
            .when(col("burn_long_pm") >= 4000L, "warn")
            .otherwise("ok"))
        .select(col("destination"), col("h"), col("n"), col("n_err"),
          col("rate_ppm"), col("rate6_ppm"),
          col("burn_short_pm"), col("burn_long_pm"), col("tier"))
    }),

    "er1_error_extract" -> ((s, dir) => {
      val sess = s
      import sess.implicits._
      extractErrors(errPayloads.toDF("err_id", "dest_type", "error_category", "error_type", "payload"))
    }),
    "er2_error_groups" -> ((s, dir) => {
      val sess = s
      import sess.implicits._
      normalizeAndGroup(
        edEvents.toDF("source_id", "destination_id", "pu", "event_type", "seq", "error_message", "n"),
        maxPerGroupDefault)
    }))

  // ---- oracle SQL (built by concatenation — no interpolation of $ paths) ----

  private def sqlJes(v: String, path: String): String =
    "json_extract_string(" + v + ", '$." + path + "')"

  private def sqlWalk(v: String): String = {
    val parts = Seq(sqlJes(v, "msg")) ++
      msgKeys.map(k => sqlJes(v, "destinationResponse." + k)) ++
      msgKeys.map(k => sqlJes(v, k)) :+
      ("CASE WHEN json_extract(" + v + ", '$.errors') IS NOT NULL THEN " +
        "array_to_string(CAST(json_extract(" + v + ", '$.errors') AS VARCHAR[]), '.') END")
    parts.mkString("COALESCE(", ", ", ")")
  }

  private val sqlWhArr: String =
    whKeys.map(k => "json_extract(payload, '$." + k + ".errors')").mkString("COALESCE(", ", ", ")")

  private def sqlCleanup(v: String): String = {
    val chained = Seq(reUrl, reIp, reEmail, reId, reNotWord, reSpace)
      .foldLeft(v)((acc, re) => "regexp_replace(" + acc + ", '" + re + "', ' ', 'g')")
    "trim(" + chained + ")"
  }

  private def sqlRespOrErr(v: String): String =
    "CASE WHEN " + v + " LIKE '{%' AND json_valid(" + v + ") THEN " + sqlWalk(v) +
      " WHEN lower(" + v + ") LIKE '%<html%' OR lower(" + v + ") LIKE '%<body%'" +
      " THEN trim(regexp_replace(" + v + ", '" + reTag + "', ' ', 'g'))" +
      " ELSE " + v + " END"

  private val er1Sql: String = {
    val guard = "ltrim(payload) LIKE '{%' AND json_valid(payload)"
    def jcase(path: String) = "CASE WHEN " + guard + " THEN " + sqlJes("payload", path) + " END"
    val whList = warehouseTypes.map(sqlStr).mkString("(", ", ", ")")
    def likeKey(k: String) = "(lower(message) LIKE '" + k + "%' OR lower(message) LIKE '% " + k + "%')"
    "WITH raw AS (SELECT * FROM " + errPayloadsSql +
      " AS t(err_id, dest_type, error_category, error_type, payload)),\n" +
      "j AS (SELECT *, (" + guard + ") AS is_json, " +
      jcase("reason") + " AS reason, " + jcase("Error") + " AS err_raw, " +
      jcase("response") + " AS resp_raw, " + jcase("error") + " AS errk_raw FROM raw),\n" +
      "x AS (SELECT *, CASE WHEN NOT is_json THEN payload ELSE COALESCE(reason, " +
      // DuckDB split_part(NULL, ..) yields '' not NULL, so guard the Error branch
      "CASE WHEN err_raw IS NOT NULL THEN split_part(err_raw, chr(10), 1) END, " +
      sqlRespOrErr("resp_raw") + ", " + sqlRespOrErr("errk_raw") + ", " +
      "CASE WHEN " + sqlWhArr + " IS NOT NULL THEN array_to_string(" +
      "list_filter(CAST(" + sqlWhArr + " AS VARCHAR[]), " +
      "(v, i) -> list_position(CAST(" + sqlWhArr + " AS VARCHAR[]), v) = i), '.') END, " +
      sqlWalk("payload") + ", '') END AS extracted FROM j),\n" +
      "c AS (SELECT *, " + sqlCleanup("extracted") + " AS cleaned FROM x),\n" +
      "f AS (SELECT *, CASE WHEN length(cleaned) > " + maxLen +
      " THEN substr(cleaned, 1, " + maxLen + ") || '...' ELSE cleaned END AS message FROM c)\n" +
      "SELECT CAST(err_id AS BIGINT) AS err_id, message, " +
      "CASE WHEN error_category <> '' OR error_type <> ''" +
      " THEN concat_ws(':', nullif(error_category, ''), nullif(error_type, ''))" +
      " WHEN dest_type IN " + whList + " THEN ''" +
      " WHEN (" + Seq("version", "endpoint", "api").map(likeKey).mkString(" OR ") + ")" +
      " AND (" + Seq("deprecated", "sunset", "unsupported").map(likeKey).mkString(" OR ") +
      " OR lower(message) LIKE '%no longer supported%'" +
      " OR lower(message) LIKE '%end of life%'" +
      " OR lower(message) LIKE '%please upgrade%') THEN 'deprecation'" +
      " ELSE '' END AS error_code FROM f"
  }

  /** The er2 oracle exploits the fixture's clique structure (each
    * message similar to exactly one cluster) to compute the greedy
    * fold's result without sequential state: a message is canonical
    * iff no earlier message is similar to it; its normalized form is
    * the earliest similar message (the clique head), subject to the
    * per-group canonical cap. The LCS itself is the SAME bit-parallel
    * integer DP the Scala side runs, as a recursive CTE over word
    * positions.
    */
  private val er2Sql: String =
    "WITH RECURSIVE\n" +
      "ee AS (SELECT * FROM " + edEventsSql +
      " AS t(source_id, destination_id, pu, event_type, seq, error_message, n)),\n" +
      "msgs AS (SELECT source_id, destination_id, pu, event_type, error_message, MIN(seq) AS fs" +
      " FROM ee GROUP BY 1, 2, 3, 4, 5),\n" +
      "mw AS (SELECT *, list_slice(string_split(error_message, ' '), 1, " + wordCap + ") AS wl FROM msgs),\n" +
      "pairs AS (SELECT m1.source_id, m1.destination_id, m1.pu, m1.event_type," +
      " m1.error_message AS msg, m2.error_message AS cand, m1.fs AS fs, m2.fs AS cfs," +
      " m1.wl AS aw, m2.wl AS bw," +
      " ROW_NUMBER() OVER (ORDER BY m1.source_id, m1.destination_id, m1.pu, m1.event_type, m1.fs, m2.fs) AS pid" +
      " FROM mw m1 JOIN mw m2 USING (source_id, destination_id, pu, event_type)" +
      " WHERE m2.fs < m1.fs),\n" +
      "apos AS (SELECT pid, unnest(aw) AS w, generate_subscripts(aw, 1) AS i FROM pairs),\n" +
      "bpos AS (SELECT pid, unnest(bw) AS w, generate_subscripts(bw, 1) AS j FROM pairs),\n" +
      "am AS (SELECT a.pid, a.i, COALESCE(CAST(SUM(CAST(1 AS BIGINT) << CAST(b.j - 1 AS INTEGER)) AS BIGINT)," +
      " CAST(0 AS BIGINT)) AS pm" +
      " FROM apos a LEFT JOIN bpos b ON a.pid = b.pid AND a.w = b.w GROUP BY a.pid, a.i),\n" +
      "dp AS (SELECT pid, 0 AS i, CAST(0 AS BIGINT) AS vrow FROM pairs" +
      " UNION ALL SELECT d.pid, d.i + 1," +
      " (d.vrow | a.pm) & ~((d.vrow | a.pm) - ((d.vrow << 1) | 1))" +
      " FROM dp d JOIN am a ON a.pid = d.pid AND a.i = d.i + 1),\n" +
      "lcs AS (SELECT p.pid, MAX(CASE WHEN d.i = len(p.aw) THEN CAST(bit_count(d.vrow) AS BIGINT) END) AS lcs_len" +
      " FROM pairs p JOIN dp d USING (pid) GROUP BY p.pid),\n" +
      "simp AS (SELECT p.* FROM pairs p JOIN lcs USING (pid)" +
      " WHERE 2 * lcs_len * 100 >= " + simNum + " * (len(aw) + len(bw))),\n" +
      "firstsim AS (SELECT source_id, destination_id, pu, event_type, msg, MIN(cfs) AS canon_fs" +
      " FROM simp GROUP BY 1, 2, 3, 4, 5),\n" +
      "canon AS (SELECT m.source_id, m.destination_id, m.pu, m.event_type, m.error_message, m.fs," +
      " (f.msg IS NULL) AS is_canon, f.canon_fs" +
      " FROM mw m LEFT JOIN firstsim f ON f.source_id = m.source_id" +
      " AND f.destination_id = m.destination_id AND f.pu = m.pu" +
      " AND f.event_type = m.event_type AND f.msg = m.error_message),\n" +
      "ranked AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY source_id, destination_id, pu, event_type, is_canon" +
      " ORDER BY fs) AS crank FROM canon),\n" +
      "norm AS (SELECT m.source_id, m.destination_id, m.pu, m.event_type, m.error_message," +
      " CASE WHEN m.is_canon AND m.crank <= " + maxPerGroupDefault + " THEN m.error_message" +
      " WHEN m.is_canon THEN 'RedactedError'" +
      " WHEN c.crank <= " + maxPerGroupDefault + " THEN c.error_message" +
      " ELSE 'RedactedError' END AS normalized" +
      " FROM ranked m LEFT JOIN ranked c ON c.source_id = m.source_id" +
      " AND c.destination_id = m.destination_id AND c.pu = m.pu AND c.event_type = m.event_type" +
      " AND c.fs = m.canon_fs AND c.is_canon)\n" +
      "SELECT e.source_id, e.destination_id, e.pu, e.event_type, nm.normalized AS error_message," +
      " CAST(SUM(e.n) AS BIGINT) AS total_n, COUNT(DISTINCT e.error_message) AS n_messages" +
      " FROM ee e JOIN norm nm ON nm.source_id = e.source_id" +
      " AND nm.destination_id = e.destination_id AND nm.pu = e.pu" +
      " AND nm.event_type = e.event_type AND nm.error_message = e.error_message" +
      " GROUP BY 1, 2, 3, 4, 5"

  val oracles: Map[String, String] = Map(
    "er1_error_extract" -> er1Sql,
    "er2_error_groups" -> er2Sql,
    // same derivations; DuckDB's integer RANGE frame matches Spark's
    // rangeBetween(-5, 0) on the hour index
    "er4_burn_rate" ->
      """WITH hrs AS (SELECT 'dest_' || CAST(event_id % 4 AS VARCHAR) AS destination,
             epoch_us(ts) // 3600000000 AS h,
             COUNT(*) AS n,
             CAST(SUM(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END)
               AS BIGINT) AS n_err
           FROM events GROUP BY 1, 2),
         win AS (SELECT *,
             CAST(SUM(n) OVER (PARTITION BY destination ORDER BY h
               RANGE BETWEEN 5 PRECEDING AND CURRENT ROW) AS BIGINT) AS n6,
             CAST(SUM(n_err) OVER (PARTITION BY destination ORDER BY h
               RANGE BETWEEN 5 PRECEDING AND CURRENT ROW) AS BIGINT) AS err6
           FROM hrs),
         rates AS (SELECT *,
             n_err * 1000000 // n AS rate_ppm,
             err6 * 1000000 // n6 AS rate6_ppm
           FROM win)
         SELECT destination, h, n, n_err, rate_ppm, rate6_ppm,
           rate_ppm * 1000 // 50000 AS burn_short_pm,
           rate6_ppm * 1000 // 50000 AS burn_long_pm,
           CASE WHEN rate_ppm * 1000 // 50000 >= 8000
                 AND rate6_ppm * 1000 // 50000 >= 5000 THEN 'page'
                WHEN rate6_ppm * 1000 // 50000 >= 4000 THEN 'warn'
                ELSE 'ok' END AS tier
         FROM rates""",
    // same integer code/attempt derivations; << agrees across engines
    "er3_error_replay" ->
      """SELECT CAST(CAST(ts AS DATE) AS VARCHAR) AS failed_date,
           CASE WHEN 400 + (event_id % 8) * 25 < 500 THEN 'aborted_4xx'
                WHEN event_id % 5 + 1 >= 3 THEN 'aborted_max_attempts'
                ELSE 'replay' END AS decision,
           CAST(CASE WHEN 400 + (event_id % 8) * 25 >= 500 AND event_id % 5 + 1 < 3
                     THEN 1 << (event_id % 5 + 1) END AS BIGINT) AS backoff_min,
           COUNT(*) AS n_jobs, MIN(event_id) AS min_id, MAX(event_id) AS max_id
         FROM events WHERE event_type = 'error'
         GROUP BY 1, 2, 3""")
}
