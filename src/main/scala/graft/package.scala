import org.apache.spark.sql.{DataFrame, SparkSession}

package object graft {
  /** Driver-contract query: (session, scale-factor dir) => result. */
  type Q = (SparkSession, String) => DataFrame
}
