package graft

import org.apache.spark.sql.SparkSession

/** One local session shared by all suites (scalatest runs suites in one JVM). */
object SparkTestSession {
  lazy val spark: SparkSession = {
    graft.util.Sessions.build("graft-tests", "4",
      Map("spark.sql.shuffle.partitions" -> "8"))
  }
}
