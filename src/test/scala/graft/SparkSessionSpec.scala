package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Shared session: one local session per JVM, >1 shuffle partition so
  * real exchanges are exercised (SURVEY §5 "adopt for our engine").
  */
trait SparkSessionSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkSessionSpec.shared
  val sfDir = "/root/testdata/sf0.001"
}

object SparkSessionSpec {
  lazy val shared: SparkSession = Engine.session(master = "local[4]", shufflePartitions = 4)
}
