package graft

import org.apache.spark.sql.SparkSession

/** One shared local session for the whole suite (sbt forks a single
  * test JVM; creating a session per spec would dominate runtime).
  */
object TestSpark {
  lazy val spark: SparkSession =
    Flaco.session(master = "local[4]", shufflePartitions = 4,
      appName = "graft-test")

  /** Smallest corpus — specs are about semantics, not scale. */
  val sf: String = "/root/testdata/sf0.001"
}
