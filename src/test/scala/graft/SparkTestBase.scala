package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import graft.util.GraftSession

/** Shared local session for Spark-backed specs (one JVM-wide session —
  * sbt forks a single test JVM, so getOrCreate dedupes).
  */
trait SparkTestBase extends AnyFunSuite {
  lazy val spark: SparkSession = GraftSession.local(cores = 4, appName = "graft-test")
}
