package org.apache.spark.sql.classic

import org.apache.spark.sql.SparkSessionExtensions

/** Test-only access point for the package-private SparkSession
  * constructor that takes explicit extensions — see
  * GraftPlanProbe.sessionWithExtensions.
  */
object GraftSessionFactory {
  def withExtensions(base: SparkSession,
                     f: SparkSessionExtensions => Unit): SparkSession = {
    val ext = new SparkSessionExtensions
    f(ext)
    // the 6-arg constructor is pickled private even package-locally;
    // test-only reflection is acceptable here
    val ctor = classOf[SparkSession].getDeclaredConstructors
      .find(_.getParameterCount == 6)
      .getOrElse(sys.error("SparkSession 6-arg constructor not found"))
    ctor.setAccessible(true)
    ctor.newInstance(base.sparkContext, None, None, ext,
        Map.empty[String, String], Map.empty[String, String])
      .asInstanceOf[SparkSession]
  }
}
