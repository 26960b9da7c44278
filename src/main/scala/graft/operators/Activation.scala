package graft.operators

import graft.Q
import org.apache.spark.sql.functions._

/** Activation-records (MAR — monthly active records) reporter — the
  * reference's newest enterprise metering subsystem
  * (enterprise/activationrecords/records_reporter.go:112-249):
  * reverse-ETL jobs carry `context.activation.{fingerprint, origin}`
  * per batch element; the reporter keeps ONE HLL sketch of
  * fingerprints per (workspace, source, destination) grain, with
  * fail-closed skip accounting.
  *
  * Semantics mirrored exactly:
  *  - job-level precedence (records_reporter.go:139-192): empty
  *    workspace → missing_workspace; source whose backend-config
  *    category is not "warehouse" (CASE-INSENSITIVE, and looked up by
  *    source_id — never the job's source_category param) → silent
  *    skip, no stat; empty destination → missing_destination; absent
  *    batch → missing_batch; batch present but not a JSON array →
  *    invalid_batch;
  *  - element-level (:193-204): empty fingerprint →
  *    missing_fingerprint (checked FIRST), then empty origin →
  *    missing_origin;
  *  - the grain's origin column is the FIRST qualifying element's
  *    origin (set once at accumulator creation, :204-227), truncated
  *    to 256 runes with a truncation counter.
  *
  * The sketch is the library's HllAggregator (md5-keyed; the
  * reference seeds murmur3, which DuckDB cannot replay — the register
  * structure, merge rule and estimator are what the oracle mirrors
  * register-for-register, as in a2c). Scale shape: one narrow
  * explode + one hash aggregation whose state is a fixed 4 KiB sketch
  * per grain — partial aggregation merges sketches map-side, so the
  * shuffle carries grains, never fingerprints.
  */
object Activation {

  private val originCap = 256

  /** Backend-config source categories (source_id -> category). */
  private val categories: Seq[(String, String)] = Seq(
    ("src_retl", "warehouse"), ("src_retl2", "warehouse"),
    ("src_retl_ci", "WAREHOUSE"), ("src_event", "webhook"))

  private val longOrigin = "o" * 300

  private def batch(elems: String*): String = s"""{"batch":[${elems.mkString(",")}]}"""
  private def el(fp: String, origin: String): String = {
    val f = if (fp == null) "{}" else s"""{"fingerprint":"$fp","origin":"$origin"}"""
    val a = if (origin == null && fp != null) s"""{"fingerprint":"$fp"}""" else f
    s"""{"context":{"activation":$a}}"""
  }

  /** (job_id, workspace_id, source_id, destination_id, payload) —
    * every skip class and merge behavior is exercised.
    */
  private val jobs: Seq[(Long, String, String, String, String)] = Seq(
    (1L, "ws1", "src_retl", "d1", batch(el("f1", "salesforce"), el("f2", "salesforce"), el("f3", "salesforce"))),
    (2L, "ws1", "src_retl", "d1", batch(el("f2", "other-origin"), el("f4", "other-origin"))), // merges into job 1's grain; first origin wins
    (3L, "ws1", "src_retl2", "d2", batch(el("f1", longOrigin))), // origin truncated to 256
    (4L, "", "src_retl", "d1", batch(el("f9", "x"))), // missing_workspace
    (5L, "ws1", "src_event", "d1", batch(el("f9", "x"))), // non-rETL category: silent skip
    (6L, "ws1", "src_unknown", "d1", batch(el("f9", "x"))), // unknown source: silent skip
    (7L, "ws1", "src_retl", "", batch(el("f9", "x"))), // missing_destination
    (8L, "ws1", "src_retl", "d1", """{"other":1}"""), // missing_batch
    (9L, "ws1", "src_retl", "d1", """{"batch":42}"""), // invalid_batch
    (10L, "ws1", "src_retl", "d1", batch(el(null, null), el("f5", null), el("f5", "salesforce"))), // missing_fingerprint, missing_origin, one counted
    (11L, "ws2", "src_retl_ci", "d3", batch(el("f1", "retl-ci"), el("f6", "retl-ci")))) // case-insensitive category

  private def sqlStr(s: String): String = "'" + s.replace("'", "''") + "'"
  private val jobsSql: String = jobs
    .map { case (j, w, s, d, p) => s"($j, ${sqlStr(w)}, ${sqlStr(s)}, ${sqlStr(d)}, ${sqlStr(p)})" }
    .mkString("(VALUES ", ", ", ")")
  private val categoriesSql: String = categories
    .map { case (s, c) => s"(${sqlStr(s)}, ${sqlStr(c)})" }
    .mkString("(VALUES ", ", ", ")")

  private val elemType = "array<struct<context:struct<activation:struct<fingerprint:string,origin:string>>>>"

  private def staged(s: org.apache.spark.sql.SparkSession) = {
    val sess = s
    import sess.implicits._
    val cat = categories.toDF("source_id", "category")
    val base = jobs.toDF("job_id", "workspace_id", "source_id", "destination_id", "payload")
      .join(broadcast(cat), Seq("source_id"), "left")
      .withColumn("batch_raw", get_json_object(col("payload"), "$.batch"))
      .withColumn("job_skip",
        when(col("workspace_id") === "", "missing_workspace")
          .when(lower(coalesce(col("category"), lit(""))) =!= "warehouse", "non_retl")
          .when(col("destination_id") === "", "missing_destination")
          .when(col("batch_raw").isNull, "missing_batch")
          .when(!col("batch_raw").startsWith("["), "invalid_batch"))
    val elems = base.filter(col("job_skip").isNull)
      .select(col("job_id"), col("workspace_id"), col("source_id"), col("destination_id"),
        posexplode(from_json(col("batch_raw"),
          org.apache.spark.sql.types.DataType.fromDDL(elemType))).as(Seq("pos", "e")))
      .withColumn("fingerprint", col("e.context.activation.fingerprint"))
      .withColumn("origin", col("e.context.activation.origin"))
      .withColumn("elem_skip",
        when(col("fingerprint").isNull || col("fingerprint") === "", "missing_fingerprint")
          .when(col("origin").isNull || col("origin") === "", "missing_origin"))
    (base, elems)
  }

  /** Qualifying elements with the per-grain first-origin order key:
    * zero-padded (job_id, pos) as a fixed-width string, so
    * lexicographic order IS (job_id, pos) order with no collision at
    * any batch size and no overflow at any job_id (an arithmetic key
    * job_id * K + pos collides once a batch reaches K elements; both
    * engines order fixed-width digit strings identically).
    */
  private def qualifying(elems: org.apache.spark.sql.DataFrame) =
    elems.filter(col("elem_skip").isNull)
      .withColumn("ord", concat(lpad(col("job_id").cast("string"), 19, "0"),
        lpad(col("pos").cast("string"), 10, "0")))

  val defs: Map[String, Q] = Map(
    "ar1_activation_records" -> ((s, dir) => {
      val (_, elems) = staged(s)
      val hll = udaf(new graft.functions.HllAggregator(12))
      qualifying(elems)
        .groupBy(col("workspace_id"), col("source_id"), col("destination_id"))
        .agg(
          substring(expr("min_by(origin, ord)"), 1, originCap).as("origin"),
          hll(col("fingerprint")).as("mar_estimate"))
    }),
    "ar2_activation_skips" -> ((s, dir) => {
      val (base, elems) = staged(s)
      val jobSkips = base
        .filter(col("job_skip").isNotNull && col("job_skip") =!= "non_retl")
        .select(col("job_skip").as("reason"))
      val elemSkips = elems.filter(col("elem_skip").isNotNull)
        .select(col("elem_skip").as("reason"))
      val truncs = qualifying(elems)
        .groupBy(col("workspace_id"), col("source_id"), col("destination_id"))
        .agg(length(expr("min_by(origin, ord)")).as("olen"))
        .filter(col("olen") > originCap)
        .select(lit("origin_truncated").as("reason"))
      jobSkips.unionByName(elemSkips).unionByName(truncs)
        .groupBy(col("reason")).agg(count(lit(1)).as("n"))
    }))

  // ---- oracle: same staging in DuckDB SQL; HLL mirrored register-
  // for-register over the (ws, src, dst) grain like a2c ----

  private val stagedSql: String =
    s"""jobs AS (SELECT * FROM $jobsSql
          AS t(job_id, workspace_id, source_id, destination_id, payload)),
        cats AS (SELECT * FROM $categoriesSql AS c(source_id, category)),
        base AS (
          SELECT j.*, c.category,
            json_extract(j.payload, '$$.batch') AS batch_raw,
            CASE WHEN j.workspace_id = '' THEN 'missing_workspace'
                 WHEN lower(COALESCE(c.category, '')) <> 'warehouse' THEN 'non_retl'
                 WHEN j.destination_id = '' THEN 'missing_destination'
                 WHEN json_extract(j.payload, '$$.batch') IS NULL THEN 'missing_batch'
                 WHEN json_type(json_extract(j.payload, '$$.batch')) <> 'ARRAY' THEN 'invalid_batch'
            END AS job_skip
          FROM jobs j LEFT JOIN cats c ON c.source_id = j.source_id),
        lists AS (
          SELECT job_id, workspace_id, source_id, destination_id,
                 CAST(batch_raw AS JSON[]) AS l
          FROM base WHERE job_skip IS NULL),
        elems AS (
          SELECT job_id, workspace_id, source_id, destination_id,
                 generate_subscripts(l, 1) - 1 AS pos, unnest(l) AS e
          FROM lists),
        checked AS (
          SELECT *,
            json_extract_string(e, '$$.context.activation.fingerprint') AS fingerprint,
            json_extract_string(e, '$$.context.activation.origin') AS origin,
            CASE WHEN COALESCE(json_extract_string(e, '$$.context.activation.fingerprint'), '') = ''
                   THEN 'missing_fingerprint'
                 WHEN COALESCE(json_extract_string(e, '$$.context.activation.origin'), '') = ''
                   THEN 'missing_origin'
            END AS elem_skip
          FROM elems),
        ok AS (SELECT *, lpad(CAST(job_id AS VARCHAR), 19, '0') ||
                 lpad(CAST(pos AS VARCHAR), 10, '0') AS ord
               FROM checked WHERE elem_skip IS NULL)"""

  private val hllMirror: String = {
    val rankCase = (1 to 52)
      .map(r => s"WHEN rest >= ${BigInt(1) << (64 - r)} THEN $r").mkString(" ")
    val rawEst = """(0.7213 / (1 + 1.079 / 4096.0)) * 4096 * 4096 /
                    (CAST(num AS DOUBLE) / 18446744073709551616.0)"""
    s"""h AS (SELECT workspace_id, source_id, destination_id,
              CAST('0x' || substr(md5(fingerprint), 1, 16) AS UBIGINT) AS h
            FROM ok),
       rk AS (SELECT workspace_id, source_id, destination_id, h >> 52 AS idx,
                CASE WHEN rest = 0 THEN 53 $rankCase END AS rank
              FROM (SELECT *, (h % 4503599627370496) * 4096 AS rest FROM h)),
       reg AS (SELECT workspace_id, source_id, destination_id, idx, MAX(rank) AS reg
               FROM rk GROUP BY 1, 2, 3, 4),
       est AS (SELECT workspace_id, source_id, destination_id,
                 SUM(1::HUGEINT << (64 - reg)) + (4096 - COUNT(*)) * (1::HUGEINT << 64) AS num,
                 4096 - COUNT(*) AS zeros
               FROM reg GROUP BY 1, 2, 3),
       mar AS (SELECT workspace_id, source_id, destination_id,
                 CAST(round(CASE WHEN $rawEst <= 2.5 * 4096 AND zeros > 0
                            THEN 4096 * ln(4096.0 / zeros)
                            ELSE $rawEst END) AS BIGINT) AS mar_estimate
               FROM est)"""
  }

  val oracles: Map[String, String] = Map(
    "ar1_activation_records" ->
      s"""WITH $stagedSql,
          $hllMirror,
          firsts AS (SELECT workspace_id, source_id, destination_id,
                       substr(arg_min(origin, ord), 1, $originCap) AS origin
                     FROM ok GROUP BY 1, 2, 3)
          SELECT f.workspace_id, f.source_id, f.destination_id, f.origin, m.mar_estimate
          FROM firsts f JOIN mar m USING (workspace_id, source_id, destination_id)""",
    "ar2_activation_skips" ->
      s"""WITH $stagedSql
          SELECT reason, COUNT(*) AS n FROM (
            SELECT job_skip AS reason FROM base
            WHERE job_skip IS NOT NULL AND job_skip <> 'non_retl'
            UNION ALL
            SELECT elem_skip FROM checked WHERE elem_skip IS NOT NULL
            UNION ALL
            SELECT 'origin_truncated' FROM (
              SELECT workspace_id, source_id, destination_id
              FROM ok GROUP BY 1, 2, 3
              HAVING length(arg_min(origin, ord)) > $originCap))
          GROUP BY reason""")
}
