package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.StructType

/** Source scans — SURVEY §2.1.
  *
  * S6 staging-file scan: the reference's slave workers stream gzip
  * JSON-lines staging files line by line
  * (warehouse/slave/worker.go:246-313); Spark's json source reads
  * .gz transparently and splits files across executors.
  * S7 load-file readers: CSV/JSON/Parquet
  * (warehouse/encoding/{csvreader,jsonreader}.go).
  *
  * Always pass an explicit schema in production: schema inference
  * costs a full extra pass over 100 TB and can widen types
  * inconsistently between files; the schema registry (L3) is the
  * source of truth, exactly like the reference resolves the upload
  * schema before generating load files.
  */
object Readers {

  /** S6: gzip JSON-lines staging scan. */
  def stagingScan(spark: SparkSession, path: String, schema: Option[StructType] = None): DataFrame = {
    val r = spark.read
    schema.fold(r)(r.schema).json(path)
  }

  /** S7: CSV load files (header row, explicit schema). */
  def csvLoadFiles(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.read.option("header", "true").schema(schema).csv(path)

  /** S7: JSON load files. */
  def jsonLoadFiles(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.read.schema(schema).json(path)

  /** S7: Parquet load files (schema from footer). */
  def parquetLoadFiles(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path)

  def orcLoadFiles(spark: SparkSession, path: String): DataFrame =
    spark.read.orc(path)

  /** L12 over real JDBC: the reverse-ETL extract reading a warehouse
    * table through Spark's JDBC source (warehouse/source/source.go
    * reads the customer's warehouse over database/sql the same way).
    * Predicates push down into the remote WHERE clause; at scale pass
    * partitionColumn/lowerBound/upperBound/numPartitions so the read
    * shards across executors instead of a single connection.
    * Exercised against embedded Derby in JdbcSpec; production swaps
    * the url for postgres/snowflake — the plan is identical.
    */
  def jdbcTable(spark: SparkSession, url: String, table: String): DataFrame =
    spark.read.format("jdbc").option("url", url).option("dbtable", table).load()

  /** L12: reverse-ETL source job — reads a warehouse table and lifts
    * each row into an extract event carrying a recordId
    * (warehouse/source/source.go; gateway /internal/v1/retl). The
    * local stand-in reads parquet; against a live warehouse this is
    * `jdbcTable` above with the same downstream.
    */
  def retlSource(spark: SparkSession, path: String,
                 recordIdCol: String): DataFrame = {
    import org.apache.spark.sql.functions._
    spark.read.parquet(path)
      .withColumn("record_id", concat(lit("rec_"), col(recordIdCol)))
      .withColumn("event_type", lit("extract"))
  }
}
