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
  // GRAFT_TEST_MASTER lets the suite run on constrained runners
  // (e.g. local[2]); plan gates that depend on parallelism pin their
  // width via conf instead of reading the master (see PlanSpec's widen
  // gate), so the suite is green at any setting
  lazy val shared: SparkSession = Engine.session(
    master = sys.env.getOrElse("GRAFT_TEST_MASTER", "local[4]"),
    shufflePartitions = 4)
}
