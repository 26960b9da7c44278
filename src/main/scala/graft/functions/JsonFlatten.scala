package graft.functions

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import org.apache.spark.sql.SparkSession

import scala.collection.mutable
import scala.jdk.CollectionConverters._

/** Recursive JSON flattening with a depth cap — the reference's core
  * warehouse transform (reference: processor/internal/transformer/
  * destination_transformer/embedded/warehouse/set.go:15-156, W2):
  * nested objects become `prefix_key` entries, empty keys are skipped,
  * values keep a scalar string form (arrays/deep objects are kept as
  * JSON strings, mirroring the reference's JSON-path passthrough W3).
  *
  * Type inference follows datatype.go:11-48 (§1.2): whole numbers →
  * int, other numbers → float, booleans → boolean, timestamp-shaped
  * strings → datetime, everything else → string; non-scalars → json.
  *
  * Exposed as UDFs returning MapType — per-row work is pure and
  * allocation-light, so it distributes trivially; at 100 TB this runs
  * map-side with no shuffle.
  */
object JsonFlatten {

  private val mapper = new ObjectMapper()

  private val timestampRe =
    ("^\\d{4}-\\d{2}-\\d{2}([ T]\\d{2}:\\d{2}(:\\d{2}(\\.\\d+)?)?" +
      "(Z|[+-]\\d{2}:?\\d{2})?)?$").r

  /** Flatten a JSON object string to path→scalar-string map.
    * @param keepJsonPaths configured JSON-path passthrough (W3,
    *   jsonpaths.go:1-42 / set.go:103-120): subtrees rooted at these
    *   underscore-joined paths stay single JSON-string values instead
    *   of being flattened.
    */
  def flatten(json: String, maxDepth: Int = 3,
              keepJsonPaths: Set[String] = Set.empty): Map[String, String] = {
    if (json == null) return null
    val root =
      try mapper.readTree(json)
      catch { case _: Exception => return Map.empty }
    if (root == null || !root.isObject) return Map.empty
    val out = mutable.LinkedHashMap[String, String]()
    def walk(node: JsonNode, prefix: String, depth: Int): Unit = {
      node.properties().asScala.foreach { e =>
        val key = e.getKey
        if (key.nonEmpty) {
          val path = if (prefix.isEmpty) key else s"${prefix}_$key"
          val v = e.getValue
          if (keepJsonPaths.contains(path)) out(path) = v.toString
          else if (v.isObject && depth < maxDepth) walk(v, path, depth + 1)
          else if (v.isNull) ()
          else if (v.isValueNode) out(path) = v.asText()
          else out(path) = v.toString // array / too-deep object → JSON passthrough
        }
      }
    }
    walk(root, "", 1)
    out.toMap
  }

  /** Flatten with inferred warehouse types (path → type).
    * @param redshiftText apply the Redshift `text` override: strings
    *   longer than 512 UTF-16 units become `text` (datatype.go:68-96,
    *   limit transformer.go:32).
    */
  def flattenTypes(json: String, maxDepth: Int = 3,
                   redshiftText: Boolean = false): Map[String, String] = {
    if (json == null) return null
    val root =
      try mapper.readTree(json)
      catch { case _: Exception => return Map.empty }
    if (root == null || !root.isObject) return Map.empty
    val out = mutable.LinkedHashMap[String, String]()
    def walk(node: JsonNode, prefix: String, depth: Int): Unit = {
      node.properties().asScala.foreach { e =>
        val key = e.getKey
        if (key.nonEmpty) {
          val path = if (prefix.isEmpty) key else s"${prefix}_$key"
          val v = e.getValue
          if (v.isObject && depth < maxDepth) walk(v, path, depth + 1)
          else if (v.isNull) ()
          else out(path) = inferType(v, redshiftText)
        }
      }
    }
    walk(root, "", 1)
    out.toMap
  }

  /** Warehouse type of a JSON value — datatype.go:11-48 semantics. */
  def inferType(v: JsonNode, redshiftText: Boolean = false): String = {
    if (v.isBoolean) "boolean"
    else if (v.isIntegralNumber) "int"
    else if (v.isNumber) {
      // JSON numbers are float64 in the reference; integral floats
      // reclassify as int via an exact big-decimal integrality test
      // with no magnitude cap (datatype.go getFloatType :39-48 uses
      // big.Float.IsInt — 1e16 is int there, so it is here too).
      val bd = v.decimalValue().stripTrailingZeros()
      if (bd.scale() <= 0) "int" else "float"
    } else if (v.isTextual) {
      val s = v.asText()
      if (timestampRe.findFirstIn(s).isDefined) "datetime"
      else if (redshiftText && s.length > 512) "text"
      else "string"
    } else "json"
  }

  /** Deep flatten INCLUDING array elements — the shape tracking-plan
    * item validation needs (reference processor/trackingplan.go:69-168
    * validates arbitrary nested schemas incl. array items via JSON
    * Schema). Returns (path, idx, value, jtype) rows:
    *   - object properties: path `a_b`, idx -1, raw JSON type;
    *   - an array itself: path `items`, idx -1, value = length,
    *     jtype `array`;
    *   - scalar array elements: path `items[]`, idx = position;
    *   - object array elements: a presence marker (`items[]`, idx,
    *     null, `object`) — so a REQUIRED item property can be flagged
    *     per element — plus one row per property (`items[]_sku`, idx);
    *   - deeper nesting inside elements stays a `json` passthrough.
    * jtype is the RAW JSON type (int/float/boolean/string/object/
    * array/json) with no datetime/text heuristics: plan type checks
    * replay exactly against DuckDB's json_type().
    */
  def flattenDeep(json: String, maxDepth: Int = 3): Seq[(String, Int, String, String)] = {
    if (json == null) return null
    val root =
      try mapper.readTree(json)
      catch { case _: Exception => return Seq.empty }
    if (root == null || !root.isObject) return Seq.empty
    val out = mutable.ArrayBuffer[(String, Int, String, String)]()
    def rawType(v: JsonNode): String =
      if (v.isBoolean) "boolean"
      else if (v.isIntegralNumber) "int"
      else if (v.isNumber) {
        val bd = v.decimalValue().stripTrailingZeros()
        if (bd.scale() <= 0) "int" else "float"
      } else if (v.isTextual) "string"
      else "json"
    def leaf(path: String, idx: Int, v: JsonNode): Unit =
      if (!v.isNull) out += ((path, idx, v.asText(), rawType(v)))
    def walk(node: JsonNode, prefix: String, depth: Int): Unit = {
      node.properties().asScala.foreach { e =>
        val key = e.getKey
        if (key.nonEmpty) {
          val path = if (prefix.isEmpty) key else s"${prefix}_$key"
          val v = e.getValue
          if (v.isObject && depth < maxDepth) walk(v, path, depth + 1)
          else if (v.isArray) {
            out += ((path, -1, v.size().toString, "array"))
            (0 until v.size()).foreach { i =>
              val el = v.get(i)
              if (el.isObject) {
                out += ((s"$path[]", i, null, "object"))
                el.properties().asScala.foreach { p =>
                  val pv = p.getValue
                  if (p.getKey.nonEmpty && !pv.isNull)
                    out += ((s"$path[]_${p.getKey}", i,
                      if (pv.isValueNode) pv.asText() else pv.toString,
                      if (pv.isValueNode) rawType(pv) else "json"))
                }
              } else if (el.isValueNode) leaf(s"$path[]", i, el)
              else out += ((s"$path[]", i, el.toString, "json"))
            }
          }
          else if (v.isNull) ()
          else if (v.isValueNode) leaf(path, -1, v)
          else out += ((path, -1, v.toString, "json"))
        }
      }
    }
    walk(root, "", 1)
    out.toSeq
  }

  def register(spark: SparkSession): Unit = {
    spark.udf.register("flatten_json", (s: String) => flatten(s))
    spark.udf.register("flatten_json_deep", (s: String) =>
      flattenDeep(s).map { case (p, i, v, t) => (p, i, v, t) })
    spark.udf.register("flatten_json_types", (s: String) => flattenTypes(s))
    spark.udf.register("flatten_json_types_redshift",
      (s: String) => flattenTypes(s, redshiftText = true))
    spark.udf.register("flatten_json_paths",
      (s: String, keep: Seq[String]) =>
        flatten(s, keepJsonPaths = Option(keep).map(_.toSet).getOrElse(Set.empty)))
  }
}
